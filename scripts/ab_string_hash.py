"""A/B: md5 row hash vs the polynomial code-point fold for STRING keys
on the HLL route (round-9 VERDICT #7).

The round-9 avalanche fix took integral/temporal keys off md5; string
keys still pay md5(CAST(col AS STRING)) + 15 substring/instr hex-digit
extractions per scanned row — the remaining 100-TB scan-cost question.
The only other engine-portable deterministic string hash in reach is a
polynomial fold over the character code points in the Mersenne field
(dual.to_bigint_key kind 'string_poly', feeding the same avalanche
chain). This script measures both paths end-to-end on a ~30M-row string
scan, Spark AND DuckDB, and verifies each path's Spark==DuckDB
bit-equality first — a faster hash that broke the replay contract would
be worthless. PLANS.md records the verdict; the md5 default only
changes if the fold wins decisively on BOTH engines.

Usage: python scripts/ab_string_hash.py [n_rows] [reps]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

from snappy_aqp_spark.dialect import DUCKDB, SPARK
from snappy_aqp_spark.pipeline.distinct import hll_count_distinct_query_sql

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
# N in the path: a rerun with a different row count must regenerate, not
# silently time the stale file under a mislabeled n=
PARQ = f"/tmp/ab_strhash_strings_{N}.parquet"


def main() -> int:
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "24g")
             .appName("ab-string-hash").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(PARQ):
        # url-shaped ~45-char keys, ~N/3 distinct: the pipeline-telemetry
        # shape the string path actually scans at corpus scale
        spark.sql(
            f"SELECT concat('https://crawl.example.org/path/',"
            f" CAST((id * 2654435761) % {N // 3} AS STRING), '/doc.html')"
            f" AS s FROM range({N})"
        ).write.mode("overwrite").parquet(PARQ)
    spark.read.parquet(PARQ).createOrReplaceTempView("strings")
    con = duckdb.connect()
    con.sql("SET memory_limit='40GB'")
    con.sql(f"CREATE VIEW strings AS SELECT * FROM "
            f"read_parquet('{PARQ}/*.parquet')")

    results: dict[str, dict] = {}
    for kind in ("string", "string_poly"):
        sqls = {d: hll_count_distinct_query_sql(
            d, col="s", table="strings", p=12, alias="a", key_kind=kind)
            for d in (SPARK, DUCKDB)}
        est_sp = spark.sql(sqls[SPARK]).collect()[0][0]      # warm + value
        est_dk = con.sql(sqls[DUCKDB]).fetchone()[0]
        assert est_sp == est_dk, (kind, est_sp, est_dk)      # replay gate
        t_sp, t_dk = [], []
        for _ in range(REPS):
            t0 = time.time()
            spark.sql(sqls[SPARK]).collect()
            t_sp.append(time.time() - t0)
            t0 = time.time()
            con.sql(sqls[DUCKDB]).fetchall()
            t_dk.append(time.time() - t0)
        results[kind] = {"est": est_sp,
                         "spark_med": round(statistics.median(t_sp), 2),
                         "spark_min": round(min(t_sp), 2),
                         "duck_med": round(statistics.median(t_dk), 2),
                         "duck_min": round(min(t_dk), 2)}
        print(f"{kind:12s} {results[kind]}", flush=True)
    md5_s = results["string"]["spark_min"]
    fold_s = results["string_poly"]["spark_min"]
    print(f"\nn={N} reps={REPS} spark min md5={md5_s}s fold={fold_s}s "
          f"-> fold is {md5_s / fold_s:.2f}x the md5 speed on Spark; "
          f"duck md5={results['string']['duck_min']}s "
          f"fold={results['string_poly']['duck_min']}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
