"""Benchmark harness (driver contract): runs headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line.

Protocol scaled down from the reference harness (PerfRun.conf:42-44 — median
over many iterations after warm-ups): median of ITERS after WARMUP runs.
Reports each approx query, its exact counterpart (the speedup story the
reference pitches), and the total.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

from snappy_aqp_spark.fixtures import APPROX_SPECS
from snappy_aqp_spark.plans.approx_query import (load_tables, run_approx_query,
                                                 run_exact_query,
                                                 set_interactive_latency_mode)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")
WARMUP = int(os.environ.get("BENCH_WARMUP", "2"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))

HEADLINE = ["cf_sum_global", "cf_group_multi", "cf_where", "cf_join_orders",
            "cf_local_omit", "bypass_weighted_sum",
            # bootstrap estimator timing alongside closed-form — the
            # reference perf protocol reports both (BASELINE.md row 3/6)
            "bs_sum_group"]


def _time(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", CPUS)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "8g")
             .appName("snappy-aqp-spark-bench").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    table_names = set()
    for q in HEADLINE:
        spec = APPROX_SPECS[q]
        table_names.add(spec.sample.base_table)
        table_names.update(j.table for j in spec.joins)
    tables = load_tables(spark, SF_DIR, tuple(sorted(table_names)))
    for df in tables.values():
        df.cache().count()  # park in memory: bench measures compute, not disk

    results: dict[str, float] = {}
    # interactive serving profile for the cached-sample section: AQE's
    # per-stage re-planning only adds latency here (PLANS.md A/B); applied
    # to approx AND exact columns alike, restored for the pipeline section
    set_interactive_latency_mode(spark, True)
    for name in HEADLINE:
        spec = APPROX_SPECS[name]
        # exact_cached reuses one prepared plan across iterations — the
        # honest mirror of the approx side's _PLAN_CACHE, so the
        # approx-vs-exact margin excludes plan-build asymmetry
        exact_prepared = run_exact_query(spark, spec, tables)
        runners = (
            ("", lambda s=spec: run_approx_query(
                spark, s, tables, cache_token=SF_DIR).collect()),
            ("exact:", lambda s=spec: run_exact_query(
                spark, s, tables).collect()),
            ("exact_cached:", lambda df=exact_prepared: df.collect()),
        )
        for label, once in runners:
            for _ in range(WARMUP):
                once()
            times = [_time(once) for _ in range(ITERS)]
            results[f"{label}{name}"] = round(statistics.median(times), 4)

    # --- TopK / pipeline operators ---------------------------------------
    set_interactive_latency_mode(spark, False)   # ETL section: AQE back on
    import __spark_entry__ as entry
    qs = entry.queries()
    for name in ("topk_cms_full", "topk_streamsummary", "dedup_minhash_lsh",
                 "dedup_ngram_jaccard",     # exact prefix-filtered join
                 "dedup_lines", "pii_scan",
                 "dedup_simhash", "ann_cosine_topk", "ann_ivf_topk",
                 "ann_pq_topk", "approx_distinct_hll", "approx_quantiles",
                 "approx_quantiles_grouped", "text_analysis",
                 "sessionize_events", "asof_join_clicks",
                 "range_join_activity", "bloom_semi_join",
                 "skew_salted_join", "grouped_topk",
                 "stratified_split", "text_top_terms",
                 "pps_weighted_sample", "source_quota_cap",
                 "decontamination", "chunk_documents", "join_cardinality",
                 "event_funnel", "cohort_retention", "sequence_pack",
                 "mixture_resample", "repetition_signals",
                 "duplicate_spans", "cross_corpus_dedup",
                 "bm25_retrieval", "token_stats",
                 "lm_surprise", "dsir_select", "hard_negative_mining",
                 "semantic_dedup", "gopher_quality", "c4_filters",
                 "bpe_pair_counts",
                 # storage layout: first call writes the bucketed/partitioned
                 # copies (cached per session), iterations time the
                 # exchange-free join / pruned scan itself
                 "bucketed_colocated_join", "partition_pruned_scan",
                 # ingest layer (jsonl write cached per session) + the
                 # source-level diversity rollup; compaction re-writes its
                 # files every iteration by design (it IS a write job)
                 "jsonl_ingest_quarantine", "schema_merge_scan",
                 "compact_small_files", "corpus_diversity",
                 # clustering family: consumers share one converged label
                 # table (pipeline/clusters.cluster_labels) — these time the
                 # derive-from-labels passes; cluster_labels_build below
                 # times the convergence itself
                 "dedup_clusters", "corpus_clean", "leakage_safe_split"):
        def once():
            qs[name](spark, SF_DIR).collect()
        for _ in range(max(1, WARMUP - 1)):
            once()
        times = [_time(once) for _ in range(max(3, ITERS - 2))]
        results[name] = round(statistics.median(times), 4)

    # cold label convergence: pair detection + connected components, cache
    # cleared each iteration (the one number the clustering family amortizes)
    from snappy_aqp_spark.pipeline import clusters as _cl

    def labels_cold():
        for df in _cl._LABEL_CACHE.values():
            df.unpersist()
        _cl._LABEL_CACHE.clear()
        spark.read.parquet(f"{SF_DIR}/documents.parquet") \
            .createOrReplaceTempView("documents")
        _cl.cluster_labels(spark, data_token=SF_DIR).count()
    labels_cold()
    times = [_time(labels_cold) for _ in range(max(3, ITERS - 2))]
    results["cluster_labels_build"] = round(statistics.median(times), 4)

    total = round(sum(v for k, v in results.items()
                      if not k.startswith(("exact:", "exact_cached:"))), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "aqp_headline_median_total",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": float(sf),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
