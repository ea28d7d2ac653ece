"""sf1-scale spot verification of the heaviest pipeline fixtures.

Replicates the sf0.1 documents/embeddings tables 10x (ids shifted, text
perturbed with a per-replica suffix so replicas are NEAR-duplicates, the
hard case for the dedup family) into a scratch dir, then runs the 5
heaviest fixtures on Spark AND their DuckDB oracles over the same scratch
tables and asserts bit-match. This exercises AQE re-planning and spill
paths at ~10x the per-round gate volume — the reproducible-mode contract
says results are invariant under partitioning/scale, and this is the
direct check of that claim (the sf0.1 version of this gate caught the
CMS hash-correlation bug in round 3).

Usage: python scripts/stress_sf1.py [--keep] [fixture ...]
Writes scratch under /tmp/aqp_sf1_stress; prints per-fixture wall times
and MATCH/FAIL. Exit 0 iff all match.
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

from stress_common import (frames_bitmatch, oracle_connect,
                           register_scratch_views)

SRC = "/root/testdata/sf0.1"
SCRATCH = "/tmp/aqp_sf1_stress"
REPLICAS = 10
FIXTURES = [a for a in sys.argv[1:] if not a.startswith("--")] or [
    "decontamination", "semantic_dedup", "bm25_retrieval",
    "dedup_ngram_jaccard", "cross_corpus_dedup",
    # AQP quant-lattice family: closed-form two-level lattice, bootstrap
    # trials, HAC partial/full routing, and the two-sample product-weight
    # estimator — their oracles replay exactly, so the 10x run checks
    # AQE re-planning + spill invariance of the lattice itself
    "cf_group_multi", "bs_sum_group", "cf_partial_route",
    "cf_full_route", "two_sample_self_join",
    # round-6 additions: z-prefix layout analysis, HLL set algebra,
    # mergeable + weighted-sample quantiles, streaming register merge
    "zorder_layout", "hll_set_ops", "histogram_quantile",
    "histogram_quantile_grouped", "sample_weighted_quantile",
    "sample_weighted_quantile_grouped", "streaming_hll_distinct",
    # round-7 additions: the opt-in WITH ERROR sketch routes — register
    # lattice and bin lattice must stay bit-exact under 10x volume + AQE
    "sql_count_distinct_hll", "sql_count_distinct_hll_grouped",
    "sql_histogram_quantile_route", "sql_histogram_quantile_route_grouped",
    # two-scan multi-sample fan-out vs the spec-replayed DDL oracle
    "sql_multi_sample_build"]


def build_scratch(spark) -> None:
    if os.path.exists(os.path.join(SCRATCH, "events.parquet")):
        return                      # events is copied LAST: all built
    os.makedirs(SCRATCH, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = None
    for k in range(REPLICAS):
        r = (docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * n))
                 .withColumn("text", F.concat(F.col("text"),
                                              F.lit(f" r{k}"))))
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(f"{SCRATCH}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    eid = [c for c in emb.columns if c.endswith("id")][0]
    m = emb.agg(F.max(eid)).collect()[0][0] + 1
    reps = None
    for k in range(REPLICAS):
        r = emb.withColumn(eid, F.col(eid) + F.lit(k * m))
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(f"{SCRATCH}/embeddings.parquet")
    # TPC-H fact tables for the AQP lattice fixtures: replicate 10x with
    # o_orderkey shifted per replica (lineitem shifts l_orderkey by the
    # same stride, so (l_orderkey, l_linenumber) stays unique and the
    # order->lineitem relationship is preserved replica-by-replica)
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    okmax = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    reps = None
    for k in range(REPLICAS):
        r = orders.withColumn("o_orderkey",
                              F.col("o_orderkey") + F.lit(k * okmax))
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(f"{SCRATCH}/orders.parquet")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    reps = None
    for k in range(REPLICAS):
        r = li.withColumn("l_orderkey",
                          F.col("l_orderkey") + F.lit(k * okmax))
        reps = r if reps is None else reps.unionByName(r)
    reps.write.mode("overwrite").parquet(f"{SCRATCH}/lineitem.parquet")
    # remaining tables: copy the small ones the fixtures might touch
    # (driver testdata ships single-file parquet; customer is the
    # unreplicated dim side for the salted-join fixture)
    for t in ("events", "customer"):
        src = f"{SRC}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, f"{SCRATCH}/{t}.parquet",
                            dirs_exist_ok=True)
        else:
            shutil.copy(src, f"{SCRATCH}/{t}.parquet")


def main() -> int:
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "12g")
             .appName("sf1-stress").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    build_scratch(spark)

    import __spark_entry__ as entrymod
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = oracle_connect("24GB")
    register_scratch_views(
        con, SCRATCH,
        ("documents", "embeddings", "events", "orders", "lineitem",
         "customer"))
    fails = []
    for name in FIXTURES:
        t0 = time.time()
        sp = qs[name](spark, SCRATCH).toPandas()
        t_sp = time.time() - t0
        t0 = time.time()
        dk = con.sql(oracles[name]).df()
        t_dk = time.time() - t0
        ok = frames_bitmatch(sp, dk)
        fails += [] if ok else [name]
        print(f"{name:24s} rows={len(sp):8d} {'MATCH' if ok else 'FAIL'} "
              f"spark={t_sp:6.1f}s duck={t_dk:6.1f}s", flush=True)
    if "--keep" not in sys.argv:
        shutil.rmtree(SCRATCH, ignore_errors=True)
    print(f"\n{len(FIXTURES) - len(fails)}/{len(FIXTURES)} match at "
          f"{REPLICAS}x sf0.1")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
