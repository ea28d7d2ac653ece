"""Force the connected-components DISTRIBUTED pointer-doubling path at
10x scale and prove it agrees bit-exactly with the driver-local
union-find path (round-10 VERDICT item 7: every fixture takes the small
path, so the big path had never executed at stress scale).

Builds the same 10x near-duplicate documents scratch as stress_sf1
(replicas are near-dups — the hard case: a dense pair graph), detects
pairs once with the production minhash-LSH stages, then:

  * BIG path:   connected_components(pairs, small_graph_edges=0) —
                symmetrize + distinct + pointer doubling + localCheckpoint
                all execute for real;
  * SMALL path: connected_components(pairs) — driver union-find
                (the production default at this edge count).

Asserts the two label tables are identical, and records wall time and
job counts for each strategy. Also exercises the round-11 fix (pairs
persisted BEFORE the strategy probe): with the fix, the big path's
symmetrize pass reads the cached pair partitions instead of re-running
the whole LSH detection pipeline.

Usage: python scripts/stress_cc_bigpath.py [--keep]
Exit 0 iff the label tables bit-match.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

SCRATCH = "/tmp/aqp_sf1_stress"   # shared with stress_sf1.build_scratch


def main() -> int:
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "12g")
             .appName("cc-bigpath-stress").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import stress_sf1
    stress_sf1.build_scratch(spark)
    spark.read.parquet(f"{SCRATCH}/documents.parquet") \
        .createOrReplaceTempView("documents")

    from snappy_aqp_spark.dialect import SPARK as _SP
    from snappy_aqp_spark.pipeline import dual
    from snappy_aqp_spark.pipeline.clusters import connected_components
    from snappy_aqp_spark.pipeline.dedup import minhash_lsh_stages

    stages, final = minhash_lsh_stages(_SP, threshold=0.5, k=7,
                                       n_hashes=32, bands=8)
    tracker = sc.statusTracker()
    out = {}

    def run(tag: str, **kw):
        # fresh pair DataFrame per strategy so each run pays (or caches)
        # its own detection; dual's pipeline caches persist across the
        # two runs exactly as production repeat calls would
        pairs = dual.run_stages(spark, stages, final)
        sc.setJobGroup(f"cc_{tag}", tag)
        t0 = time.time()
        lab = connected_components(pairs, **kw)
        rows = sorted((r["doc_id"], r["cluster_id"]) for r in lab.collect())
        wall = time.time() - t0
        jobs = len(tracker.getJobIdsForGroup(f"cc_{tag}"))
        sc.setJobGroup("", "")
        out[tag] = {"wall_sec": round(wall, 2), "jobs": jobs,
                    "n_labels": len(rows),
                    "n_clusters": len({c for _, c in rows})}
        print(f"{tag:10s} wall={wall:7.2f}s jobs={jobs} "
              f"labels={len(rows)} clusters={out[tag]['n_clusters']}",
              flush=True)
        return rows

    big = run("big", small_graph_edges=0)
    small = run("small")
    ok = big == small
    out["bitmatch"] = ok
    print(json.dumps(out))
    print("MATCH" if ok else "FAIL", flush=True)
    if "--keep" not in sys.argv:
        import shutil
        shutil.rmtree(SCRATCH, ignore_errors=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
