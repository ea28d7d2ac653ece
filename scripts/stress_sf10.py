"""100x-sf0.1 spot verification of the lattice + heaviest pipeline ops.

Round-8 VERDICT #3 (the 1B-row PerfRun protocol analog, scaled to the
box): replicate the sf0.1 tables 100x — ~60M lineitem rows, ~600k
documents whose replicas are NEAR-duplicates (per-replica text suffix,
the hard case for dedup) — and run the named fixtures on Spark AND their
DuckDB oracles over the same scratch tables, asserting bit-match. This
is one more decade past scripts/stress_sf1.py: AQE re-planning, spill
paths, and the quant-lattice integer headroom all get exercised at the
scale where a silent overflow or partition cliff would show.

Replication is a single broadcast cross join with a replica-index
relation (not a 100-way union): one scan per table, ids shifted by
replica * stride so key uniqueness and the orders->lineitem relationship
are preserved replica-by-replica.

Usage: python scripts/stress_sf10.py [--keep] [fixture ...]
Writes scratch under /tmp/aqp_sf10_stress; prints per-fixture wall times
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
SCRATCH = "/tmp/aqp_sf10_stress"
REPLICAS = 100
FIXTURES = [a for a in sys.argv[1:] if not a.startswith("--")] or [
    # quant-lattice family: closed-form two-level lattice, HAC partial
    # routing (exact base-remainder join at 60M rows), the trial-unrolled
    # bootstrap, and the two-scan multi-sample fan-out
    "cf_group_multi", "cf_partial_route", "bs_sum_group",
    "sql_multi_sample_build",
    # round-10 VERDICT #4 additions: the two-sided Poisson-bootstrap join
    # (iterative/join-heavy — the shape a decade jump can cliff) and the
    # CLT error-limit sampler build (per-stratum sizing over 60M rows)
    "two_sample_join_sum", "cf_error_limit_sample",
    # pipeline: banded-LSH cross-corpus dedup over 600k near-duplicate
    # docs (bounded by the round-9 per-doc verify budget — green at this
    # scale since then), the mergeable-histogram quantiles, and the
    # grouped HLL route (round-9: integer avalanche row hash)
    "cross_corpus_dedup", "histogram_quantile",
    "sql_count_distinct_hll_grouped"]


def _replicate(spark, df, shift_cols: dict[str, int], suffix_col: str | None,
               out: str) -> None:
    k = F.col("__k")
    reps = df.crossJoin(F.broadcast(
        spark.range(REPLICAS).select(F.col("id").alias("__k"))))
    for c, stride in shift_cols.items():
        reps = reps.withColumn(c, F.col(c) + k * F.lit(stride))
    if suffix_col:
        reps = reps.withColumn(
            suffix_col, F.concat(F.col(suffix_col), F.lit(" r"),
                                 k.cast("string")))
    reps.drop("__k").write.mode("overwrite").parquet(out)


def build_scratch(spark) -> None:
    if os.path.exists(os.path.join(SCRATCH, "events.parquet")):
        return                      # events is copied LAST: all built
    os.makedirs(SCRATCH, exist_ok=True)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    _replicate(spark, docs, {"doc_id": n}, "text",
               f"{SCRATCH}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    eid = [c for c in emb.columns if c.endswith("id")][0]
    m = emb.agg(F.max(eid)).collect()[0][0] + 1
    _replicate(spark, emb, {eid: m}, None, f"{SCRATCH}/embeddings.parquet")
    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    okmax = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    _replicate(spark, orders, {"o_orderkey": okmax},
               None, f"{SCRATCH}/orders.parquet")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    _replicate(spark, li, {"l_orderkey": okmax},
               None, f"{SCRATCH}/lineitem.parquet")
    for t in ("events",):
        src = f"{SRC}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, f"{SCRATCH}/{t}.parquet",
                            dirs_exist_ok=True)
        else:
            shutil.copy(src, f"{SCRATCH}/{t}.parquet")


def main() -> int:
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "48g")
             .appName("sf10-stress").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    build_scratch(spark)
    print(f"scratch ready in {time.time() - t0:.0f}s", flush=True)

    import __spark_entry__ as entrymod
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = oracle_connect("56GB")
    register_scratch_views(
        con, SCRATCH,
        ("documents", "embeddings", "events", "orders", "lineitem"))
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
