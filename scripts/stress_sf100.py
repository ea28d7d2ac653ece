"""1000x-sf0.1 decade proof for the quant-lattice family + grouped HLL.

Round-9 VERDICT #3: one more decade past scripts/stress_sf10.py —
~600M lineitem rows, the reference's own 1B-row perf-protocol territory
(PerfRun.conf:37-44) scaled to what one box holds. Exercised per fixture:
the closed-form two-level quant lattice and its integer headroom
(cf_group_multi), the size-adaptive bootstrap's wide trial-unroll branch
at R=100 over a sample of 600M rows (bs_sum_group), and the
integer-avalanche register lattice's m-bounded shuffle
(sql_count_distinct_hll_grouped).

Verification modes, strongest that the box can actually hold per
fixture (round-9 VERDICT #3 explicitly blesses the fallback):
  * full DuckDB oracle replay, bit-match (same contract as
    stress_sf1/sf10) — the default for the HLL route, whose oracle is
    one hash scan + an m-bounded group-by;
  * exact-value sanity — the default for cf_group_multi / bs_sum_group:
    their oracles replay the whole SAMPLE BUILD as window SQL over 600M
    rows, and DuckDB's spill for that replay measured >60 GB and still
    climbing at 1000x (it filled local disk to 90% before being killed —
    the measured cap, recorded in PLANS.md). Instead the approx
    estimates value-match the EXACT Spark aggregates: every group's
    [lower_bound, upper_bound] must cover the exact value and each
    estimate must sit within 6 relative standard errors (hard
    deterministic gates — everything is seed-deterministic), the HLL
    estimate within 4 * 1.04/sqrt(m) per group.
  ``--oracle`` forces full replay everywhere; ``--sanity`` forces the
  fallback everywhere. Either way the DuckDB temp directory is capped at
  40 GB so a runaway oracle aborts loudly instead of filling the disk.

Replication mirrors stress_sf10: one broadcast cross join against a
replica index, l_orderkey shifted per replica so the key distribution
(and therefore sample strata sizes) scales, not collapses. Only lineitem
is built — all three fixtures are single-table (~11 GB parquet).

Usage: python scripts/stress_sf100.py [--keep] [--sanity|--oracle]
                                      [fixture ...]
Writes scratch under /tmp/aqp_sf100_stress; prints per-fixture wall
times and MATCH/FAIL. Exit 0 iff all pass.
"""
from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

from stress_common import (frames_bitmatch, oracle_connect,
                           register_scratch_views)

SRC = os.environ.get("AQP_STRESS_SRC", "/root/testdata/sf0.1")
SCRATCH = os.environ.get("AQP_STRESS_SCRATCH", "/tmp/aqp_sf100_stress")
REPLICAS = int(os.environ.get("AQP_STRESS_REPLICAS", "1000"))
FIXTURES = [a for a in sys.argv[1:] if not a.startswith("--")] or [
    "cf_group_multi", "bs_sum_group", "sql_count_distinct_hll_grouped",
    # round-10 widening: the global register lattice, the timestamp-key
    # avalanche (epoch-micros fold), and the md5-string path with the
    # linear-counting branch FIRING (3 distinct flags at 600M rows —
    # low cardinality is scale-independent, so LC is exercised at the
    # decade, not just at fixture scale) — all single-scan m-bounded
    # shapes whose oracles replay cheaply
    "sql_count_distinct_hll", "sql_count_distinct_hll_tskey",
    "sql_count_distinct_hll_lowcard"]
# fixtures whose DuckDB oracle is cheap enough to bit-replay at 1000x
# (everything else defaults to the exact-value sanity gate — see module
# docstring for the measured reason)
ORACLE_DEFAULT = {"sql_count_distinct_hll_grouped",
                  "sql_count_distinct_hll", "sql_count_distinct_hll_tskey",
                  "sql_count_distinct_hll_lowcard"}

# exact twins for --sanity mode: per fixture, the exact SQL over the same
# scratch table with the SAME group/measure shape, plus which (estimate,
# lb, ub, exact, rel_se) columns to gate. rel_se is the a-priori
# per-estimate relative standard error consistent with the fixture's own
# error model (closed-form/bootstrap: the returned bounds themselves;
# HLL: 1.04/sqrt(m) with the fixture's p=5).
SANITY = {
    "cf_group_multi": {
        "exact": ("SELECT l_returnflag AS rf, SUM(l_extendedprice) AS "
                  "x_sum, AVG(l_discount) AS x_avg, COUNT(*) AS x_cnt "
                  "FROM lineitem GROUP BY l_returnflag"),
        "pairs": (("sum_price", "x_sum"), ("avg_disc", "x_avg"),
                  ("cnt", "x_cnt")),
        "bounds": (("sum_price", "sum_price_lower_bound",
                    "sum_price_upper_bound", "x_sum"),),
    },
    "bs_sum_group": {
        "exact": ("SELECT l_returnflag AS rf, SUM(l_extendedprice) AS "
                  "x_sum, COUNT(*) AS x_cnt FROM lineitem "
                  "GROUP BY l_returnflag"),
        "pairs": (("sum_price", "x_sum"), ("cnt", "x_cnt")),
        "bounds": (("sum_price", "sum_price_lower_bound",
                    "sum_price_upper_bound", "x_sum"),),
    },
    "sql_count_distinct_hll_grouped": {
        "exact": ("SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS "
                  "x_cd FROM lineitem WHERE l_quantity > 10 "
                  "GROUP BY l_returnflag"),
        "pairs": (("approx_orders", "x_cd"),),
        "bounds": (),
        # fixture sets hllPrecision=5 -> m=32
        "rel_tol": 4 * 1.04 / math.sqrt(32),
    },
}


def build_scratch(spark) -> None:
    out = f"{SCRATCH}/lineitem.parquet"
    # a killed prior run leaves partial part files — only a directory
    # with Spark's _SUCCESS marker counts as built (a truncated scratch
    # would let the sanity gates "pass" on fewer rows than claimed)
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    okmax = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    (li.crossJoin(F.broadcast(
        spark.range(REPLICAS).select(F.col("id").alias("__k"))))
     .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__k") * okmax)
     .drop("__k").write.mode("overwrite").parquet(out))


def sanity_check(spark, name: str, sp) -> bool:
    cfg = SANITY[name]
    exact = {r[0]: r for r in spark.sql(cfg["exact"]).collect()}
    got = {r[0]: r for r in sp.itertuples(index=False)}
    if set(exact) != set(got):
        print(f"  group-key mismatch: {sorted(exact)} vs {sorted(got)}")
        return False
    ok = True
    for key, row in got.items():
        ex = exact[key].asDict()
        rd = row._asdict()
        for est_c, ex_c in cfg["pairs"]:
            est, xv = float(rd[est_c]), float(ex[ex_c])
            tol = cfg.get("rel_tol")
            if tol is None:
                # the fixture's own bounds define the tolerance; 6x the
                # half-width is a hard deterministic gate far beyond the
                # 99% interval the bounds encode
                lbs = [b for b in cfg["bounds"] if b[0] == est_c]
                if lbs:
                    half = (float(rd[lbs[0][2]]) - float(rd[lbs[0][1]])) / 2
                    tol = 6 * half / abs(xv) if xv else None
                else:
                    tol = 0.05     # un-bounded outputs: flat 5% gate (the
                    # hash sample at fraction 0.2 over 600M rows estimates
                    # counts/averages far tighter than this)
            if tol is not None and abs(est - xv) / abs(xv) > tol:
                print(f"  {key}.{est_c}: est={est} exact={xv} "
                      f"rel={(abs(est - xv) / abs(xv)):.4f} > tol={tol:.4f}")
                ok = False
        for est_c, lb_c, ub_c, ex_c in cfg["bounds"]:
            if not (float(rd[lb_c]) <= float(ex[ex_c]) <= float(rd[ub_c])):
                print(f"  {key}.{est_c}: exact {ex[ex_c]} outside "
                      f"[{rd[lb_c]}, {rd[ub_c]}]")
                ok = False
    return ok


def main() -> int:
    force = ("sanity" if "--sanity" in sys.argv
             else "oracle" if "--oracle" in sys.argv else None)
    os.makedirs("/tmp/aqp_sf100_spill", exist_ok=True)
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "96")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "48g")
             .config("spark.local.dir", "/tmp/aqp_sf100_spill")
             .appName("sf100-stress").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    build_scratch(spark)
    print(f"scratch ready in {time.time() - t0:.0f}s", flush=True)

    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    fails = []
    for name in FIXTURES:
        t0 = time.time()
        sp = qs[name](spark, SCRATCH).toPandas()
        t_sp = time.time() - t0
        # sanity mode needs an exact-twin entry; fixtures without one
        # (the HLL routes) always bit-replay their oracle, even under
        # --sanity (round-10 review: a blanket force crashed on them)
        sanity = (name in SANITY
                  and (force == "sanity"
                       or (force is None and name not in ORACLE_DEFAULT)))
        if sanity:
            spark.read.parquet(f"{SCRATCH}/lineitem.parquet") \
                .createOrReplaceTempView("lineitem")
            t0 = time.time()
            ok = sanity_check(spark, name, sp)
            t_ref = time.time() - t0
            mode = "SANITY"
        else:
            con = oracle_connect("56GB")
            register_scratch_views(con, SCRATCH, ("lineitem",))
            t0 = time.time()
            dk = con.sql(entrymod.oracle_sql()[name]).df()
            t_ref = time.time() - t0
            con.close()
            ok = frames_bitmatch(sp, dk)
            mode = "ORACLE"
        fails += [] if ok else [name]
        print(f"{name:32s} rows={len(sp):4d} "
              f"{'MATCH' if ok else 'FAIL'} [{mode}] "
              f"spark={t_sp:7.1f}s ref={t_ref:7.1f}s", flush=True)
    if "--keep" not in sys.argv:
        shutil.rmtree(SCRATCH, ignore_errors=True)
    print(f"\n{len(FIXTURES) - len(fails)}/{len(FIXTURES)} pass at "
          f"{REPLICAS}x sf0.1")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
