"""Round-10 optimization profiler: per-query wall time + job count +
physical plan capture for the bench's pipeline queries.

Usage:
    python scripts/profile_r10.py [query ...]        # default: the heavy set
    PROF_ITERS=4 PROF_PLANS=1 python scripts/profile_r10.py semantic_dedup

Environment mirrors bench.py ($SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS) so the
numbers are comparable with BENCH_full.json. Plans go to plans/r10/<q>_<tag>.txt
when PROF_PLANS is set (tag via PROF_TAG, default 'before').
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ITERS = int(os.environ.get("PROF_ITERS", "5"))
PLANS = os.environ.get("PROF_PLANS", "")
TAG = os.environ.get("PROF_TAG", "before")

HEAVY = ["cluster_labels_build", "compact_small_files", "dedup_ngram_jaccard",
         "semantic_dedup", "cross_corpus_dedup", "decontamination",
         "corpus_diversity", "ann_ivf_topk", "dedup_minhash_lsh", "pii_scan",
         "gopher_quality", "ann_pq_topk", "corpus_clean", "bm25_retrieval",
         "repetition_signals", "bloom_semi_join"]


def main() -> None:
    names = sys.argv[1:] or HEAVY
    b = (SparkSession.builder.master(f"local[{CPUS}]")
         .config("spark.sql.shuffle.partitions", CPUS)
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.driver.memory", "8g"))
    # conf experiments: PROF_CONF="key=val;key=val"
    for kv in filter(None, os.environ.get("PROF_CONF", "").split(";")):
        k, _, v = kv.partition("=")
        b = b.config(k.strip(), v.strip())
    spark = b.appName("profile-r10").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import __spark_entry__ as entry
    qs = entry.queries()
    tracker = sc.statusTracker()

    out = {}
    for name in names:
        if name == "cluster_labels_build":
            from snappy_aqp_spark.pipeline import clusters as _cl

            def once():
                for df in _cl._LABEL_CACHE.values():
                    df.unpersist()
                _cl._LABEL_CACHE.clear()
                spark.read.parquet(f"{SF_DIR}/documents.parquet") \
                    .createOrReplaceTempView("documents")
                _cl.cluster_labels(spark, data_token=SF_DIR).count()
            df_fn = None
        else:
            def once(name=name):
                qs[name](spark, SF_DIR).collect()
            df_fn = lambda name=name: qs[name](spark, SF_DIR)
        # warm
        sc.setJobDescription(f"warm:{name}")
        once()
        times = []
        jobs = []
        for i in range(ITERS):
            group = f"prof_{name}_{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            once()
            times.append(time.time() - t0)
            jobs.append(len(tracker.getJobIdsForGroup(group)))
        sc.setJobGroup("", "")
        med = statistics.median(times)
        out[name] = {"med": round(med, 3), "min": round(min(times), 3),
                     "jobs": jobs[-1]}
        print(f"{name:28s} med={med:7.3f} min={min(times):7.3f} "
              f"jobs/iter={jobs}", flush=True)
        if PLANS and df_fn is not None:
            os.makedirs("plans/r10", exist_ok=True)
            import io
            import contextlib
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df_fn().explain("formatted")
            txt = buf.getvalue()
            with open(f"plans/r10/{name}_{TAG}.txt", "w") as f:
                f.write(txt)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
