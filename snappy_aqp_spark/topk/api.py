"""Approximate time-series TopK tables over Spark.

Rebuilds the reference surface ``createApproxTSTopK`` / ``insertIntoTopK`` /
``queryApproxTSTopK`` (execution/SnappyContextAQPFunctions.scala:107-356,
approximate/TopKUtil.scala:58-262, topk/TopKRelation.scala:33-198):

  * state = a Spark DataFrame of per-(key-partition, time-bucket) sketch
    blobs + per-bucket candidate lists — the Spark-native replacement for
    the reference's executor-pinned ``RDD[(Int, TopK)]``. Persisting state
    as data (not pinned JVM objects) is what survives executor loss and
    scales: partitions hold disjoint key sets, so a query never merges
    sketches across partitions, only across time buckets.
  * build/query run as Arrow-batched ``applyInPandas`` over the key
    partition — one sketch-partition per group, exactly the reference's
    ``rowToTupleConverter`` shuffle (TopKWrapper.scala:157-209).
  * per-key range estimates merge the ``Approximate`` monoid across buckets
    (lower bounds add; Approximate.scala:29-33).
  * ``stream_summary=True`` switches to Space-Saving summaries per bucket
    with a DeltaError output column (StreamSummaryAggregation.scala:35-131).

Batch semantics note: within a micro-batch/bucket the Space-Saving summary
processes keys in aggregated (count desc, key) order — deterministic, unlike
the reference's arrival order, and exact whenever capacity >= distinct keys.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .sketches import CountMinSketch, SpaceSaving

_STATE_SCHEMA = ("pid long, bucket long, sketch binary, "
                 "cand_keys array<string>, cand_counts array<long>")


@dataclass(frozen=True)
class TopKSpec:
    name: str
    key: str
    time_col: str | None = None
    time_interval_us: int = 5_000_000          # reference default 5s (stream)
    epoch_us: int | None = None                # origin; None -> min(time_col)
    size: int = 100                            # k (TopKWrapper default)
    depth: int = 7
    width: int = 4096
    frequency_col: str | None = None
    stream_summary: bool = False
    capacity: int = 4096                       # candidates kept per bucket
    num_partitions: int = 8
    int_key: bool = False                      # integer keys partition by mod
                                               # (engine-portable, see oracle.py)


@dataclass
class TopKTable:
    spec: TopKSpec
    state: DataFrame
    epoch_us: int


class TopKRegistry:
    def __init__(self):
        self.tables: dict[str, TopKTable] = {}

    def get(self, name: str) -> TopKTable:
        return self.tables[name.lower()]

    def drop(self, name: str) -> None:
        t = self.tables.pop(name.lower(), None)
        if t is not None:
            t.state.unpersist()


def _time_us(df: DataFrame, time_col: str):
    """timestamp -> epoch microseconds; LONG columns are nanosecond ticks
    (Spark reads TIMESTAMP(NANOS) parquet via legacy nanosAsLong)."""
    if dict(df.dtypes).get(time_col) == "bigint":
        return F.expr(f"({time_col}) DIV 1000")
    return F.unix_micros(F.expr(time_col))


def min_time_us(df: DataFrame, time_col: str) -> int:
    return int(df.select(F.min(_time_us(df, time_col)).alias("m"))
               .collect()[0]["m"])


def _bucketed(df: DataFrame, spec: TopKSpec, epoch_us: int) -> DataFrame:
    key = F.expr(spec.key).cast("string").alias("__key")
    if spec.time_col is not None:
        bucket = F.floor((_time_us(df, spec.time_col) - F.lit(epoch_us))
                         / F.lit(spec.time_interval_us)).cast("long")
    else:
        bucket = F.lit(0).cast("long")
    freq = (F.expr(spec.frequency_col).cast("long") if spec.frequency_col
            else F.lit(1).cast("long"))
    if spec.int_key:
        pid = F.pmod(F.expr(spec.key).cast("long"), F.lit(spec.num_partitions))
    else:
        pid = F.pmod(F.xxhash64(key, F.lit(42)), F.lit(spec.num_partitions))
    return df.select(pid.alias("pid"), bucket.alias("bucket"), key,
                     freq.alias("__freq"))


def _build_state(spec: TopKSpec):
    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        pid = int(pdf["pid"].iloc[0]) if len(pdf) else 0
        for bucket, grp in pdf.groupby("bucket"):
            counts = grp.groupby("__key")["__freq"].sum()
            # deterministic feed order: count desc, then key
            items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            if spec.stream_summary:
                ss = SpaceSaving(spec.capacity)
                for k, c in items:
                    ss.add(k, int(c))
                top = ss.topk(spec.capacity)
                rows.append((pid, int(bucket), b"",
                             [t[0] for t in top],
                             [int(t[1]) for t in top]))
            else:
                cms = CountMinSketch(spec.depth, spec.width)
                for k, c in items:
                    cms.add(k, int(c))
                cand = items[: spec.capacity]
                rows.append((pid, int(bucket), cms.to_bytes(),
                             [k for k, _ in cand], [int(c) for _, c in cand]))
        return pd.DataFrame(rows, columns=["pid", "bucket", "sketch",
                                           "cand_keys", "cand_counts"])
    return build


def create_approx_ts_topk(spark: SparkSession, registry: TopKRegistry,
                          df: DataFrame, spec: TopKSpec) -> TopKTable:
    epoch = spec.epoch_us
    if epoch is None and spec.time_col is not None:
        epoch = min_time_us(df, spec.time_col)
    epoch = int(epoch or 0)
    bucketed = _bucketed(df, spec, epoch)
    state = (bucketed.groupBy("pid")
             .applyInPandas(_build_state(spec), schema=_STATE_SCHEMA)
             .persist())
    state.count()
    table = TopKTable(spec, state, epoch)
    registry.tables[spec.name.lower()] = table
    return table


def insert_into_topk(spark: SparkSession, registry: TopKRegistry,
                     name: str, df: DataFrame) -> TopKTable:
    """Append rows: rebuild state for the new data and merge per
    (pid, bucket) — sketch merge is counter addition
    (CountMinSketch.scala merge semantics)."""
    table = registry.get(name)
    spec = table.spec
    new_state = (_bucketed(df, spec, table.epoch_us).groupBy("pid")
                 .applyInPandas(_build_state(spec), schema=_STATE_SCHEMA))
    both = table.state.unionByName(new_state)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 1:
            return pdf
        pid, bucket = int(pdf["pid"].iloc[0]), int(pdf["bucket"].iloc[0])
        if spec.stream_summary:
            ss = SpaceSaving(spec.capacity)
            agg = {}
            for _, r in pdf.iterrows():
                for k, c in zip(r["cand_keys"], r["cand_counts"]):
                    agg[k] = agg.get(k, 0) + int(c)
            for k, c in sorted(agg.items(), key=lambda kv: (-kv[1], kv[0])):
                ss.add(k, c)
            top = ss.topk(spec.capacity)
            return pd.DataFrame([(pid, bucket, b"", [t[0] for t in top],
                                  [int(t[1]) for t in top])],
                                columns=pdf.columns)
        cms = None
        agg = {}
        for _, r in pdf.iterrows():
            s = CountMinSketch.from_bytes(bytes(r["sketch"]))
            cms = s if cms is None else cms.merge(s)
            for k, c in zip(r["cand_keys"], r["cand_counts"]):
                agg[k] = agg.get(k, 0) + int(c)
        cand = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))[: spec.capacity]
        return pd.DataFrame([(pid, bucket, cms.to_bytes(),
                              [k for k, _ in cand], [int(c) for _, c in cand])],
                            columns=pdf.columns)

    merged = (both.groupBy("pid", "bucket")
              .applyInPandas(merge, schema=_STATE_SCHEMA).persist())
    merged.count()
    table.state.unpersist()
    table.state = merged
    return table


def decay_topk(spark: SparkSession, registry: TopKRegistry, name: str,
               older_than_bucket: int, levels: int = 1) -> TopKTable:
    """Hokusai item aggregation: halve the CMS width of buckets older than
    a cutoff (``levels`` times), bounding historical memory at the cost of
    estimate resolution (Hokusai.scala:68-1017; CountMinSketch ``compress``).

    Width-halving keeps estimates conservative (counts of column i and
    i + w/2 merge), so range queries stay upper bounds after decay."""
    table = registry.get(name)
    spec = table.spec
    if spec.stream_summary:
        raise ValueError("decay applies to CMS-backed TopK tables")

    def decay(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.copy()
        for idx, r in out.iterrows():
            if int(r["bucket"]) < older_than_bucket:
                s = CountMinSketch.from_bytes(bytes(r["sketch"]))
                for _ in range(levels):
                    if s.width >= 2:
                        s = s.compress()
                out.at[idx, "sketch"] = s.to_bytes()
        return out

    new_state = (table.state.groupBy("pid")
                 .applyInPandas(decay, schema=_STATE_SCHEMA).persist())
    new_state.count()
    table.state.unpersist()
    table.state = new_state
    return table


def query_approx_ts_topk(spark: SparkSession, registry: TopKRegistry,
                         name: str, start_us: int | None = None,
                         end_us: int | None = None,
                         k: int | None = None) -> DataFrame:
    """Top-k keys over the time range, with BUCKET-INCLUSIVE endpoints: the
    whole interval containing ``start_us`` and the whole interval containing
    ``end_us`` contribute (matching the reference's interval resolution —
    TopKHokusai answers at time-bucket granularity). Result schemas
    (SnappyContextAQPFunctions.scala:315-351): (key, EstimatedValue,
    LowerBound) for CMS tables, (key, EstimatedValue, DeltaError) for stream
    summaries."""
    table = registry.get(name)
    spec = table.spec
    k = k or spec.size
    state = table.state
    if spec.time_col is not None:
        if start_us is not None:
            state = state.where(
                F.col("bucket") >= (start_us - table.epoch_us) // spec.time_interval_us)
        if end_us is not None:
            state = state.where(
                F.col("bucket") <= (end_us - table.epoch_us) // spec.time_interval_us)

    if spec.stream_summary:
        def query(pdf: pd.DataFrame) -> pd.DataFrame:
            agg: dict[str, list[int]] = {}
            for _, r in pdf.iterrows():
                for key, c in zip(r["cand_keys"], r["cand_counts"]):
                    cur = agg.setdefault(key, [0, 0])
                    cur[0] += int(c)
            rows = [(key, v[0], v[1]) for key, v in agg.items()]
            return pd.DataFrame(rows, columns=["key", "EstimatedValue",
                                               "DeltaError"])
        out_schema = "key string, EstimatedValue long, DeltaError long"
    else:
        def query(pdf: pd.DataFrame) -> pd.DataFrame:
            sketches = [CountMinSketch.from_bytes(bytes(r))
                        for r in pdf["sketch"]]
            cands: set[str] = set()
            for ck in pdf["cand_keys"]:
                cands.update(ck)
            rows = []
            for key in sorted(cands):
                est, lower = 0, 0
                for s in sketches:
                    a = s.estimate_approximate(key)
                    est += a.estimate
                    lower += a.lower
                rows.append((key, est, lower))
            return pd.DataFrame(rows, columns=["key", "EstimatedValue",
                                               "LowerBound"])
        out_schema = "key string, EstimatedValue long, LowerBound long"

    per_part = state.groupBy("pid").applyInPandas(query, schema=out_schema)
    return (per_part.orderBy(F.col("EstimatedValue").desc(), F.col("key").asc())
            .limit(k))
