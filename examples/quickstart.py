"""End-to-end tour of the engine on the bundled test data.

Run:  python examples/quickstart.py [sf_dir]      (default /root/testdata/sf0.001)

Walks the whole public surface in one session: register base tables,
CREATE SAMPLE TABLE, approximate SQL with WITH ERROR + error functions,
HAC behaviors, EXPLAIN AQP introspection, the opt-in sketch routes
(COUNT DISTINCT via HLL, APPROX_PERCENTILE via histogram), a TopK table,
the multi-sample single-scan build, and two pipeline operators
(MinHash-LSH dedup, BM25 retrieval). Every block prints a small result.
"""

from __future__ import annotations

import os
import sys
import tempfile

# runnable from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             # the TopK sketch build runs Arrow applyInPandas batches;
             # Spark's 1g default heap is too tight for local mode (and
             # 4g OOMs on the sf0.01 events table)
             .config("spark.driver.memory", "8g")
             .appName("snappy-aqp-spark-quickstart").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from snappy_aqp_spark.api import AQPSession

    aqp = AQPSession(spark, error=0.2, confidence=0.95,
                     behavior="do_nothing", data_token=sf_dir)
    aqp.load_tables(sf_dir, ("lineitem", "orders", "events", "documents"))

    print("== 1. sample table + approximate aggregation ==")
    aqp.sql("CREATE SAMPLE TABLE li_sample ON lineitem OPTIONS ("
            "qcs 'l_returnflag', fraction '0.1', strataReservoirSize '25')")
    aqp.sql("SELECT l_returnflag, SUM(l_quantity) AS sum_qty, "
            "       absolute_error(sum_qty) AS err, "
            "       lower_bound(sum_qty) AS lb, upper_bound(sum_qty) AS ub "
            "FROM lineitem GROUP BY l_returnflag "
            "ORDER BY l_returnflag WITH ERROR").show()

    print("== 2. routing introspection + HAC behavior ==")
    aqp.sql("EXPLAIN AQP SELECT AVG(l_extendedprice) AS avg_price "
            "FROM lineitem WITH ERROR 0.1 BEHAVIOR 'run_on_full_table'"
            ).show(truncate=False)

    print("== 3. opt-in sketch routes (off by default) ==")
    aqp.sql("SET spark.sql.aqp.hllCountDistinct=true")
    aqp.sql("SET spark.sql.aqp.hllPrecision=6")
    aqp.sql("SELECT COUNT(DISTINCT l_orderkey) AS n_orders, "
            "       relative_error(n_orders) AS rel "
            "FROM lineitem WITH ERROR").show()
    aqp.sql("SET spark.sql.aqp.histogramQuantile=true")
    aqp.sql("SELECT APPROX_PERCENTILE(n_chars, 0.5) AS med_len, "
            "       lower_bound(med_len) AS lb, upper_bound(med_len) AS ub "
            "FROM documents WITH ERROR").show()

    print("== 4. approximate time-series TopK ==")
    # size the bucket interval to the data's time span: each bucket holds
    # a depth x width CMS, so a 60s interval over a month of events would
    # be ~43k sketches (GBs) — 3-day buckets match the 30-day test range
    aqp.sql("CREATE TOPK TABLE top_users ON events OPTIONS ("
            "key 'user_id', timeSeriesColumn 'ts', "
            "timeInterval '259200s', size '5', intKey 'true')")
    aqp.sql("SELECT * FROM top_users LIMIT 5").show()

    print("== 5. multi-sample single-scan build ==")
    from snappy_aqp_spark.specs import SampleSpec
    keys = ("l_orderkey", "l_linenumber")
    built = aqp.create_sample_tables(
        [("mb_rf", SampleSpec("lineitem", keys, ("l_returnflag",),
                              method="hash", fraction=0.2, seed=7)),
         ("mb_ls", SampleSpec("lineitem", keys, ("l_linestatus",),
                              method="hash", fraction=0.1, seed=11))],
        tempfile.mkdtemp(prefix="aqp_quickstart_"))
    aqp.sql("SHOW SAMPLE TABLES").show(truncate=False)
    print({n: df.count() for n, df in built.items()})

    print("== 6. pipeline operators: near-dup pairs + BM25 retrieval ==")
    from snappy_aqp_spark.dialect import SPARK
    from snappy_aqp_spark.pipeline import dual
    from snappy_aqp_spark.pipeline.dedup import minhash_lsh_stages
    from snappy_aqp_spark.pipeline.retrieval import bm25_topk_stages
    st, fin = minhash_lsh_stages(SPARK, threshold=0.5, k=7)
    dual.run_stages(spark, st, fin).show(5)
    st, fin = bm25_topk_stages(SPARK, query_pred="doc_id % 100 = 0", topk=3)
    dual.run_stages(spark, st, fin).show(6)

    print("quickstart complete")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
