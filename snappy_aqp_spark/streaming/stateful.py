"""Custom stateful streaming operator: per-partition Space-Saving top-k
maintained by ``applyInPandasWithState``.

The foreachBatch maintainers (maintenance.py) rebuild/merge persisted state
tables; this is the other Structured-Streaming shape the reference's
executor-pinned ``RDD[(Int, TopK)]`` maps to (SnappyContextAQPFunctions
.scala:122, streamsummary/StreamSummaryAggregation.scala:35-131): the
summary lives IN the streaming state store, keyed by the key-hash
partition, updated incrementally per micro-batch, checkpointed and
restored by Spark itself — no external parquet state, no driver loop.

Determinism: within a micro-batch the per-pid rows are pre-aggregated and
fed to the summary in (count desc, key) order — the same convention as the
batch build (topk/api.py), so with capacity >= distinct keys the streamed
summary is EXACTLY the batch ``groupBy(key).count()`` at every trigger, and
with bounded capacity estimates stay conservative (est >= true count).

Each update emits the pid's full current top-k with a monotonically
increasing ``ver`` so an update-mode sink can be reduced to the final
state (max ver per pid) without knowing trigger boundaries.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..topk.sketches import SpaceSaving

_OUT_SCHEMA = ("pid long, ver long, key string, EstimatedValue long, "
               "DeltaError long")
_STATE_SCHEMA = ("ks array<string>, cs array<long>, es array<long>, "
                 "ver long")


def stateful_space_saving(stream_df: DataFrame, key: str,
                          capacity: int = 64, k: int | None = None,
                          num_partitions: int = 8,
                          frequency_col: str | None = None,
                          int_key: bool = False) -> DataFrame:
    """stream -> per-pid Space-Saving summaries in the streaming state
    store. Returns the update-mode output DataFrame (start it with
    ``.writeStream.outputMode("update")``); use :func:`final_topk` to
    reduce a sink to the end-of-stream top-k."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyc = F.expr(key).cast("string").alias("__key")
    freq = (F.expr(frequency_col).cast("long") if frequency_col
            else F.lit(1).cast("long")).alias("__freq")
    if int_key:
        pid = F.pmod(F.expr(key).cast("long"), F.lit(num_partitions))
    else:
        pid = F.pmod(F.xxhash64(keyc, F.lit(42)), F.lit(num_partitions))
    keyed = stream_df.select(pid.alias("pid"), keyc, freq)
    out_k = k or capacity

    def update(pkey, pdfs, state):
        ss = SpaceSaving(capacity)
        ver = 0
        if state.exists:
            ks, cs, es, ver = state.get
            for kk, cc, ee in zip(ks, cs, es):
                ss.counts[kk] = (int(cc), int(ee))
        agg: dict[str, int] = {}
        for pdf in pdfs:
            for kk, ff in zip(pdf["__key"], pdf["__freq"]):
                agg[kk] = agg.get(kk, 0) + int(ff)
        for kk, cc in sorted(agg.items(), key=lambda kv: (-kv[1], kv[0])):
            ss.add(kk, cc)
        ver += 1
        items = ss.topk(capacity)
        state.update(([t[0] for t in items], [int(t[1]) for t in items],
                      [int(t[2]) for t in items], ver))
        top = ss.topk(out_k)
        yield pd.DataFrame({
            "pid": [int(pkey[0])] * len(top),
            "ver": [ver] * len(top),
            "key": [t[0] for t in top],
            "EstimatedValue": [int(t[1]) for t in top],
            "DeltaError": [int(t[2]) for t in top]})

    return keyed.groupBy("pid").applyInPandasWithState(
        update, _OUT_SCHEMA, _STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)


def final_topk(sink_df: DataFrame, k: int) -> DataFrame:
    """reduce an update-mode sink to the end-of-stream global top-k:
    keep each pid's latest emission (max ver), merge across pids."""
    # rename the aggregate side: a memory-sink view self-join otherwise
    # fails attribute dedup ("Conflicting attributes: pid")
    latest = (sink_df.groupBy("pid").agg(F.max("ver").alias("__mver"))
              .withColumnRenamed("pid", "__mpid"))
    return (sink_df.join(latest,
                         (F.col("pid") == F.col("__mpid"))
                         & (F.col("ver") == F.col("__mver")))
            .orderBy(F.col("EstimatedValue").desc(), F.col("key").asc())
            .limit(k)
            .select("key", "EstimatedValue", "DeltaError"))
