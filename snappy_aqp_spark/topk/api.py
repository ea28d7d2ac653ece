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

from .sketches import CountMinSketch, IntervalTracker, SpaceSaving

# level: Hokusai dyadic time-aggregation level — level l rows hold one
# sketch per aligned span of 2^l time buckets (level 0 = raw buckets)
_STATE_SCHEMA = ("pid long, level long, bucket long, sketch binary, "
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
    num_partitions: int = 32
    int_key: bool = False                      # integer keys partition by mod
                                               # (engine-portable, see oracle.py)
    dyadic: bool = True                        # Hokusai time-aggregation levels
    # automatic Hokusai aging (TopKHokusai.scala:287-300): with a horizon
    # set, every ingest pass compresses buckets older than the newest
    # `decay_horizon` by `decay_levels` width-halvings (exactly once per
    # bucket — decay_topk tracks the watermark). None -> manual decay only.
    decay_horizon: int | None = None
    decay_levels: int = 1


@dataclass
class TopKTable:
    spec: TopKSpec
    state: DataFrame                           # all levels (level 0 = raw)
    epoch_us: int
    max_level: int = 0
    max_bucket: int = 0                        # newest level-0 bucket seen
    decayed_before: int = 0                    # buckets < this are compressed


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
    (Spark reads TIMESTAMP(NANOS) parquet via legacy nanosAsLong).
    TIMESTAMP_NTZ (naive parquet timestamps) uses timestampdiff from the
    NTZ epoch — timezone-independent and identical to DuckDB epoch_us()."""
    dt = dict(df.dtypes).get(time_col)
    if dt == "bigint":
        return F.expr(f"({time_col}) DIV 1000")
    if dt == "date":
        # via NTZ, NOT cast-to-timestamp: the latter interprets midnight in
        # the session timezone, shifting buckets vs DuckDB's naive
        # epoch_us(date) and breaking the TZ-independent replay contract
        return F.expr(f"timestampdiff(MICROSECOND, "
                      f"TIMESTAMP_NTZ'1970-01-01 00:00:00', "
                      f"CAST({time_col} AS TIMESTAMP_NTZ))")
    if dt == "timestamp_ntz":
        return F.expr(f"timestampdiff(MICROSECOND, "
                      f"TIMESTAMP_NTZ'1970-01-01 00:00:00', ({time_col}))")
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


_STATE_COLS = ["pid", "level", "bucket", "sketch", "cand_keys", "cand_counts"]


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
                rows.append((pid, 0, int(bucket), b"",
                             [t[0] for t in top],
                             [int(t[1]) for t in top]))
            else:
                cms = CountMinSketch(spec.depth, spec.width)
                for k, c in items:
                    cms.add(k, int(c))
                cand = items[: spec.capacity]
                rows.append((pid, 0, int(bucket), cms.to_bytes(),
                             [k for k, _ in cand], [int(c) for _, c in cand]))
        return pd.DataFrame(rows, columns=_STATE_COLS)
    return build


def _merge_rows(spec: TopKSpec, pdf: pd.DataFrame, level: int,
                bucket: int) -> pd.DataFrame:
    """merge the sketch rows of ``pdf`` into ONE (level, bucket) row —
    counter addition for CMS, count-summed candidate union (capped)."""
    pid = int(pdf["pid"].iloc[0])
    agg: dict[str, int] = {}
    for ck, cc in zip(pdf["cand_keys"], pdf["cand_counts"]):
        for k, c in zip(ck, cc):
            agg[k] = agg.get(k, 0) + int(c)
    cand = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))[: spec.capacity]
    if spec.stream_summary:
        return pd.DataFrame([(pid, level, bucket, b"",
                              [k for k, _ in cand], [int(c) for _, c in cand])],
                            columns=_STATE_COLS)
    cms = None
    for r in pdf["sketch"]:
        s = CountMinSketch.from_bytes(bytes(r))
        if cms is None:
            cms = s
        else:
            # width-align decayed (compressed) siblings before counter add
            while s.width > cms.width:
                s = s.compress()
            while cms.width > s.width:
                cms = cms.compress()
            cms = cms.merge(s)
    return pd.DataFrame([(pid, level, bucket, cms.to_bytes(),
                          [k for k, _ in cand], [int(c) for _, c in cand])],
                        columns=_STATE_COLS)


def _pyramid_rows(spec: TopKSpec, level0_rows: pd.DataFrame,
                  max_level: int) -> list[pd.DataFrame]:
    """Build the complete dyadic pyramid (levels 1..max_level) for ONE pid's
    level-0 rows, bottom-up in plain pandas. Returns one merged row per
    (level, parent bucket)."""
    outs: list[pd.DataFrame] = []
    cur = level0_rows
    for lvl in range(1, max_level + 1):
        if len(cur) == 0:
            break
        rows = [_merge_rows(spec, grp, lvl, int(pb))
                for pb, grp in cur.groupby(cur["bucket"] // 2)]
        cur = pd.concat(rows, ignore_index=True)
        outs.append(cur)
    return outs


def _with_levels(state0: DataFrame, spec: TopKSpec) -> tuple[DataFrame, int]:
    """Attach Hokusai dyadic time-aggregation levels on top of the level-0
    buckets (Hokusai.scala:394-432 taAggregates): level l+1 merges sketch
    PAIRS of level l, so the whole pyramid costs O(buckets) tiny sketch-row
    merges and range queries touch O(log n) rows. Used at CREATE time only;
    insert/decay maintain the pyramid incrementally via
    ``_incremental_levels`` (only touched buckets' ancestors rebuild).

    The whole pyramid for one pid is built in ONE Arrow round-trip (pids
    hold disjoint key sets, so per-pid build is embarrassingly parallel);
    a per-level shuffle cascade would cost max_level stage barriers for the
    same sketch merges."""
    if (spec.stream_summary or not spec.dyadic or spec.time_col is None):
        return state0, 0
    mx = state0.select(F.max("bucket").alias("m")).collect()[0]["m"]
    max_level = int(mx).bit_length() if mx else 0
    if max_level == 0:
        return state0, 0

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        outs = _pyramid_rows(spec, pdf, max_level)
        if not outs:
            return pdf.iloc[0:0]
        return pd.concat(outs, ignore_index=True)

    pyramid = state0.groupBy("pid").applyInPandas(build, schema=_STATE_SCHEMA)
    return state0.unionByName(pyramid), max_level


# pack (pid, bucket) into one BIGINT for literal-set filters; buckets stay
# far below 2^48 for any real epoch/interval combination (asserted below)
_PACK_SHIFT = 48


def _packed(pairs) -> list[int]:
    out = []
    for pid, bucket in pairs:
        assert 0 <= bucket < (1 << _PACK_SHIFT), bucket
        out.append((int(pid) << _PACK_SHIFT) | int(bucket))
    return out


def _pack_col():
    return F.shiftleft(F.col("pid"), _PACK_SHIFT).bitwiseOR(F.col("bucket"))


# touched sets larger than this fall back to the join-based per-level path
# (decay over a huge history); micro-batch inserts stay far below it
_SMALL_TOUCHED = 20_000


def _incremental_levels(spec: TopKSpec, old_state: DataFrame,
                        old_max_level: int, level0: DataFrame,
                        touched_pairs: list[tuple[int, int]]
                        ) -> tuple[DataFrame, int]:
    """Rebuild ONLY the dyadic ancestors of touched level-0 buckets
    (reference incremental shape: Hokusai.scala:172-196 — an append to
    bucket b invalidates its O(log n) ancestors, nothing else).

    ``level0``: the complete new level-0 relation. ``touched_pairs``:
    distinct (pid, bucket) level-0 keys whose rows changed. Untouched rows
    at every level are reused from ``old_state`` byte-identical (literal-set
    anti-filter, no Python round-trip). Levels that did not exist before
    (an insert extended the time range) are rebuilt COMPLETELY from the
    full previous level — ancestors of untouched old buckets exist there
    too, so dyadic covers over the old range stay answerable.

    All rebuilt rows are produced in ONE per-pid ``applyInPandas`` pass:
    the driver knows the touched set, so it ships exactly the needed
    children (touched rows + their reused siblings + the full previous
    top level when the pyramid grows) and the Python side walks the
    ancestor chain locally."""
    if spec.stream_summary or not spec.dyadic or spec.time_col is None:
        return level0, 0
    mx = level0.select(F.max("bucket").alias("m")).collect()[0]["m"]
    max_level = int(mx).bit_length() if mx else 0
    if max_level == 0:
        return level0, 0
    assert max_level >= old_max_level, (max_level, old_max_level)
    if len(touched_pairs) > _SMALL_TOUCHED:
        return _incremental_levels_large(spec, old_state, old_max_level,
                                         level0, touched_pairs, max_level)

    grows = max_level > old_max_level
    touched_by_pid: dict[int, set[int]] = {}
    for pid, b in touched_pairs:
        touched_by_pid.setdefault(int(pid), set()).add(int(b))

    # driver-side ancestor sets: T[l] = touched (pid, bucket) at level l
    t_levels: list[set[tuple[int, int]]] = [set(
        (int(p), int(b)) for p, b in touched_pairs)]
    for lvl in range(1, max_level + 1):
        t_levels.append({(p, b >> 1) for p, b in t_levels[lvl - 1]})

    # ship: level-0 children of touched level-1 parents (touched + sibling)
    need0 = {(p, c) for p, b in t_levels[1] for c in (2 * b, 2 * b + 1)}
    ship0 = level0.where(_pack_col().isin(_packed(need0))) if need0 \
        else level0.limit(0)
    ships = [ship0]
    if old_max_level >= 1:
        # untouched siblings at levels 1..old_max_level feeding a rebuilt
        # parent, plus (when the pyramid grows) the FULL old top level
        cond = None
        for lvl in range(1, old_max_level + 1):
            # siblings at level lvl feed rebuilt parents at lvl+1 (none
            # when lvl is already the top level)
            sib = set() if lvl + 1 > max_level else \
                {(p, c) for p, b in t_levels[lvl + 1]
                 for c in (2 * b, 2 * b + 1)} - t_levels[lvl]
            c_l = (F.col("level") == lvl) & _pack_col().isin(_packed(sib)) \
                if sib else None
            if grows and lvl == old_max_level:
                full = F.col("level") == lvl
                c_l = full if c_l is None else (c_l | full)
            if c_l is not None:
                cond = c_l if cond is None else (cond | c_l)
        if cond is not None:
            ships.append(old_state.where(cond))
    elif grows:
        ships = [level0]        # no old levels: whole level 0 feeds level 1

    inp = ships[0]
    for s in ships[1:]:
        inp = inp.unionByName(s)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["pid"].iloc[0])
        by_level: dict[int, dict[int, pd.DataFrame]] = {}
        for lvl, grp in pdf.groupby("level"):
            by_level[int(lvl)] = {int(b): g for b, g in grp.groupby("bucket")}
        outs: list[pd.DataFrame] = []
        prev_touched = touched_by_pid.get(pid, set())
        for lvl in range(1, max_level + 1):
            children = by_level.get(lvl - 1, {})
            if lvl <= old_max_level:
                parents = {b >> 1 for b in prev_touched}
            else:                       # new level: build it completely
                parents = {b >> 1 for b in children}
            built: dict[int, pd.DataFrame] = {}
            for p in sorted(parents):
                kids = [children[c] for c in (2 * p, 2 * p + 1)
                        if c in children]
                if not kids:
                    continue
                built[p] = _merge_rows(spec, pd.concat(kids,
                                                       ignore_index=True),
                                       lvl, p)
            lvl_map = by_level.setdefault(lvl, {})
            lvl_map.update(built)
            outs.extend(built.values())
            prev_touched = set(built)
        if not outs:
            return pdf.iloc[0:0]
        return pd.concat(outs, ignore_index=True)

    rebuilt = inp.groupBy("pid").applyInPandas(build, schema=_STATE_SCHEMA)
    out = level0.unionByName(rebuilt)
    # reuse untouched old rows at the levels that already existed
    reuse_cond = None
    for lvl in range(1, old_max_level + 1):
        c_l = F.col("level") == lvl
        t_l = t_levels[lvl]
        if t_l:
            c_l = c_l & ~_pack_col().isin(_packed(t_l))
        reuse_cond = c_l if reuse_cond is None else (reuse_cond | c_l)
    if reuse_cond is not None:
        out = out.unionByName(old_state.where(reuse_cond))
    return out, max_level


def _incremental_levels_large(spec: TopKSpec, old_state: DataFrame,
                              old_max_level: int, level0: DataFrame,
                              touched_pairs: list[tuple[int, int]],
                              max_level: int) -> tuple[DataFrame, int]:
    """Join-based per-level fallback for very large touched sets (e.g. a
    decay sweep over deep history): same induction, one shuffle round per
    level, no driver-side sets."""
    spark = level0.sparkSession
    touched = spark.createDataFrame(
        [(int(p), int(b)) for p, b in touched_pairs], "pid long, bucket long")

    def merge_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        lvl = int(pdf["level"].iloc[0]) + 1
        return _merge_rows(spec, pdf, lvl, int(pdf["bucket"].iloc[0]) // 2)

    out = level0
    cur_level = level0                  # complete rows at level l-1
    cur_touched = touched               # changed (pid, bucket) at level l-1
    for lvl in range(1, max_level + 1):
        par = cur_level.withColumn("__pb", F.expr("bucket DIV 2"))
        if lvl <= old_max_level:
            t_l = (cur_touched
                   .select("pid", F.expr("bucket DIV 2").alias("bucket"))
                   .distinct())
            # children feeding a touched parent (touched child + sibling)
            children = par.join(
                F.broadcast(t_l.withColumnRenamed("bucket", "__pb")),
                on=["pid", "__pb"], how="leftsemi").drop("__pb")
        else:
            # the level did not exist before: rebuild it COMPLETELY
            t_l = par.select("pid", F.col("__pb").alias("bucket")).distinct()
            children = par.drop("__pb")
        rebuilt = (children
                   .groupBy("pid", F.expr("bucket DIV 2").alias("__pb"))
                   .applyInPandas(lambda pdf: merge_pairs(pdf),
                                  schema=_STATE_SCHEMA))
        if lvl <= old_max_level:
            untouched = old_state.where(F.col("level") == lvl).join(
                F.broadcast(t_l), on=["pid", "bucket"], how="leftanti")
            level_l = untouched.unionByName(rebuilt)
        else:
            level_l = rebuilt
        out = out.unionByName(level_l)
        cur_level = level_l
        cur_touched = t_l
    return out, max_level


def create_approx_ts_topk(spark: SparkSession, registry: TopKRegistry,
                          df: DataFrame, spec: TopKSpec) -> TopKTable:
    epoch = spec.epoch_us
    if epoch is None and spec.time_col is not None:
        epoch = min_time_us(df, spec.time_col)
    epoch = int(epoch or 0)
    # JVM-side pre-aggregation: Python receives one row per DISTINCT
    # (pid, bucket, key), never raw events — at stream scale the Arrow
    # transfer is bounded by key cardinality, not event volume
    # (rowToTupleConverter's combine, TopKWrapper.scala:157-209)
    preagg = (_bucketed(df, spec, epoch)
              .groupBy("pid", "bucket", "__key")
              .agg(F.sum("__freq").alias("__freq")))
    state0 = (preagg.groupBy("pid")
              .applyInPandas(_build_state(spec), schema=_STATE_SCHEMA)
              .persist())
    state0.count()
    mx = state0.agg(F.max("bucket").alias("m")).collect()[0]["m"]
    state, max_level = _with_levels(state0, spec)
    if max_level > 0:
        state = state.persist()
        state.count()
        state0.unpersist()
    table = TopKTable(spec, state, epoch, max_level,
                      max_bucket=int(mx or 0))
    registry.tables[spec.name.lower()] = table
    return _maybe_decay(spark, registry, table)


TOPK_SIDECAR = "_aqp_topk_spec.json"


def save_topk(registry: TopKRegistry, name: str, path: str) -> None:
    """Persist a TopK table — sketch-state parquet + a self-describing
    sidecar (spec fields and the scalar registry state) — so a FRESH
    session restores it with ``load_topk(path)`` and queries answer
    byte-identically, no rebuild scan (reference: TopK structures live in
    the store and survive restart, TopKRelation.scala:33-198 buildScan
    over persisted rows). Sketch blobs are engine-neutral bytes already
    (deterministic numpy serialization), so parquet IS the wire format."""
    import dataclasses
    import json
    import os
    import shutil
    import uuid
    t = registry.get(name)
    # write-then-rename (round-6 ADVICE): saving back to the very path
    # the state was LOADED from would have Spark overwrite the parquet
    # files its own input DataFrame reads (persist() does not pin every
    # partition) — staging to a sibling temp dir makes attach-then-save-
    # back safe on any path
    tmp = f"{path.rstrip('/')}.__tmp_{uuid.uuid4().hex[:8]}"
    t.state.write.mode("overwrite").parquet(tmp)
    meta = {"format": "snappy-aqp-topk/1",
            "spec": dataclasses.asdict(t.spec),
            "epoch_us": t.epoch_us, "max_level": t.max_level,
            "max_bucket": t.max_bucket,
            "decayed_before": t.decayed_before}
    with open(os.path.join(tmp, TOPK_SIDECAR), "w") as f:
        json.dump(meta, f, indent=1)
    shutil.rmtree(path, ignore_errors=True)
    os.rename(tmp, path)
    # the in-registry DataFrame may still lazily reference the REPLACED
    # files (when this save went back to the load path) — rebind it to
    # the fresh parquet so later ingests/queries read live data
    t.state = t.state.sparkSession.read.parquet(path)


def load_topk(spark: SparkSession, registry: TopKRegistry,
              path: str, name: str | None = None) -> TopKTable:
    """Restore a ``save_topk`` table into ``registry`` (optionally under a
    new name). The state DataFrame reads straight from the persisted
    parquet — no base-table scan, no sketch rebuild."""
    import json
    import os
    with open(os.path.join(path, TOPK_SIDECAR)) as f:
        meta = json.load(f)
    if meta.get("format") != "snappy-aqp-topk/1":
        raise ValueError(f"unrecognized TopK sidecar at {path}: "
                         f"format={meta.get('format')!r}")
    sd = dict(meta["spec"])
    if name:
        sd["name"] = name
    spec = TopKSpec(**sd)
    state = spark.read.parquet(path).persist()
    state.count()
    table = TopKTable(spec, state, int(meta["epoch_us"]),
                      int(meta["max_level"]),
                      max_bucket=int(meta["max_bucket"]),
                      decayed_before=int(meta["decayed_before"]))
    registry.tables[spec.name.lower()] = table
    return table


def _maybe_decay(spark: SparkSession, registry: TopKRegistry,
                 table: TopKTable) -> TopKTable:
    """spec-driven aging: run inside every create/insert maintenance pass
    when the spec carries a decay_horizon (Hokusai timeEpoch.increment)."""
    spec = table.spec
    if spec.decay_horizon is None or spec.stream_summary:
        return table
    cutoff = table.max_bucket - spec.decay_horizon + 1
    if cutoff > table.decayed_before:
        return decay_topk(spark, registry, spec.name,
                          older_than_bucket=cutoff,
                          levels=spec.decay_levels)
    return table


def insert_into_topk(spark: SparkSession, registry: TopKRegistry,
                     name: str, df: DataFrame) -> TopKTable:
    """Append rows: rebuild state for the new data and merge per
    (pid, bucket) — sketch merge is counter addition
    (CountMinSketch.scala merge semantics)."""
    table = registry.get(name)
    spec = table.spec
    preagg = (_bucketed(df, spec, table.epoch_us)
              .groupBy("pid", "bucket", "__key")
              .agg(F.sum("__freq").alias("__freq")))
    new_state = (preagg.groupBy("pid")
                 .applyInPandas(_build_state(spec), schema=_STATE_SCHEMA)
                 .persist())
    touched_pairs = [(int(r["pid"]), int(r["bucket"])) for r in
                     new_state.select("pid", "bucket").distinct().collect()]
    old0 = table.state.where(F.col("level") == 0)
    # untouched buckets pass through JVM-side (no Python, byte-identical);
    # only buckets the append actually hits re-enter the merge
    if touched_pairs and len(touched_pairs) <= _SMALL_TOUCHED:
        hit = _pack_col().isin(_packed(touched_pairs))
        untouched0 = old0.where(~hit)
        both = old0.where(hit).unionByName(new_state)
    else:
        touched = new_state.select("pid", "bucket").distinct()
        untouched0 = old0.join(F.broadcast(touched),
                               on=["pid", "bucket"], how="leftanti")
        both = old0.join(F.broadcast(touched), on=["pid", "bucket"],
                         how="leftsemi").unionByName(new_state)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 1:
            return pdf
        if spec.stream_summary:
            # Space-Saving re-feed in deterministic (count desc, key) order
            pid, bucket = int(pdf["pid"].iloc[0]), int(pdf["bucket"].iloc[0])
            ss = SpaceSaving(spec.capacity)
            agg: dict[str, int] = {}
            for ck, cc in zip(pdf["cand_keys"], pdf["cand_counts"]):
                for k, c in zip(ck, cc):
                    agg[k] = agg.get(k, 0) + int(c)
            for k, c in sorted(agg.items(), key=lambda kv: (-kv[1], kv[0])):
                ss.add(k, c)
            top = ss.topk(spec.capacity)
            return pd.DataFrame([(pid, 0, bucket, b"", [t[0] for t in top],
                                  [int(t[1]) for t in top])],
                                columns=_STATE_COLS)
        return _merge_rows(spec, pdf, 0, int(pdf["bucket"].iloc[0]))

    merged0 = (untouched0.unionByName(
        both.groupBy("pid", "bucket")
        .applyInPandas(merge, schema=_STATE_SCHEMA)).persist())
    merged0.count()
    merged, max_level = _incremental_levels(spec, table.state,
                                            table.max_level, merged0,
                                            touched_pairs)
    if max_level > 0:
        # localCheckpoint (eager) rather than persist: the per-level
        # anti-join/union lattice references the PREVIOUS state's plan, so
        # repeated micro-batch inserts would chain logical plans without
        # bound (driver OOM after a few dozen batches even though each
        # state is materialized) — checkpointing truncates the lineage to
        # the materialized blocks. The repartition bounds the state's
        # partition count: each batch unions reused blocks with new shuffle
        # output, and without it task counts grow linearly with batches.
        merged = merged.repartition(spec.num_partitions, "pid") \
            .localCheckpoint(eager=True)
        merged0.unpersist()
    new_state.unpersist()
    table.state.unpersist()
    table.state = merged
    table.max_level = max_level
    if touched_pairs:
        table.max_bucket = max(table.max_bucket,
                               max(b for _, b in touched_pairs))
    return _maybe_decay(spark, registry, table)


def decay_topk(spark: SparkSession, registry: TopKRegistry, name: str,
               older_than_bucket: int, levels: int = 1) -> TopKTable:
    """Hokusai item aggregation: halve the CMS width of buckets older than
    a cutoff (``levels`` times), bounding historical memory at the cost of
    estimate resolution (Hokusai.scala:68-1017; CountMinSketch ``compress``).

    Width-halving keeps estimates conservative (counts of column i and
    i + w/2 merge), so range queries stay upper bounds after decay.

    Idempotent over repeated calls with an advancing cutoff: the table
    tracks ``decayed_before`` and only buckets in
    [decayed_before, older_than_bucket) compress — each bucket is halved
    exactly ``levels`` times once, no matter how many maintenance passes
    run (the automatic decay-on-ingest path calls this per micro-batch,
    TopKHokusai.scala:287-300 ``timeEpoch.increment``)."""
    table = registry.get(name)
    spec = table.spec
    if spec.stream_summary:
        raise ValueError("decay applies to CMS-backed TopK tables")
    not_before = table.decayed_before
    if older_than_bucket <= not_before:
        return table

    def decay(pdf: pd.DataFrame) -> pd.DataFrame:
        # input rows are pre-filtered to [not_before, older_than_bucket):
        # compress EVERY sketch ``levels`` times, batched — one numpy
        # slice-add per (depth, width) shape group per level instead of a
        # per-row Python fold; the only per-row work left is blob
        # (de)serialization (CountMinSketch.to_bytes layout: 24-byte
        # <i8 header (depth, width, size) + depth*width <i8 table)
        import numpy as np
        out = pdf.copy()
        blobs = [bytes(b) for b in out["sketch"]]
        by_shape: dict[tuple[int, int], list[int]] = {}
        for i, b in enumerate(blobs):
            d, w, _ = np.frombuffer(b[:24], dtype="<i8")
            by_shape.setdefault((int(d), int(w)), []).append(i)
        new = list(blobs)
        for (d, w), idxs in by_shape.items():
            tables = np.frombuffer(
                b"".join(blobs[i][24:] for i in idxs),
                dtype="<i8").reshape(len(idxs), d, w)
            for _ in range(levels):
                if w >= 2:
                    w2 = w // 2
                    tables = tables[:, :, :w2] + tables[:, :, w2:2 * w2]
                    w = w2
            for j, i in enumerate(idxs):
                head = blobs[i][:8] + np.array([w], dtype="<i8").tobytes() \
                    + blobs[i][16:24]
                new[i] = head + tables[j].astype("<i8").tobytes()
        out["sketch"] = new
        return out

    old0 = table.state.where(F.col("level") == 0)
    in_range = ((F.col("bucket") >= not_before) &
                (F.col("bucket") < older_than_bucket))
    untouched0 = old0.where(~in_range)
    decayed = (old0.where(in_range).groupBy("pid")
               .applyInPandas(decay, schema=_STATE_SCHEMA))
    touched_pairs = [(int(r["pid"]), int(r["bucket"])) for r in
                     (old0.where(in_range)
                      .select("pid", "bucket").distinct().collect())]
    decayed0 = untouched0.unionByName(decayed).persist()
    decayed0.count()
    new_state, max_level = _incremental_levels(spec, table.state,
                                               table.max_level, decayed0,
                                               touched_pairs)
    if max_level > 0:
        # lineage truncation — same rationale as insert_into_topk
        new_state = new_state.localCheckpoint(eager=True)
        decayed0.unpersist()
    table.state.unpersist()
    table.state = new_state
    table.max_level = max_level
    table.decayed_before = older_than_bucket
    return table


def query_approx_ts_topk(spark: SparkSession, registry: TopKRegistry,
                         name: str, start_us: int | None = None,
                         end_us: int | None = None,
                         k: int | None = None) -> DataFrame:
    """Top-k keys over the time range, with BUCKET-INCLUSIVE endpoints: the
    whole interval containing ``start_us`` and the whole interval containing
    ``end_us`` contribute (matching the reference's interval resolution —
    TopKHokusai answers at time-bucket granularity). Result schemas
    (SnappyContextAQPFunctions.scala:315-351): CMS tables emit the full
    ErrorBoundsInfo (key, EstimatedValue, LowerBound, MaxBound, Probability)
    — the ``Approximate`` monoid fields (Approximate.scala:25-60) — stream
    summaries (key, EstimatedValue, DeltaError).

    Bounded two-sided ranges on a dyadic table touch the O(log n) Hokusai
    cover (IntervalTracker; Hokusai.scala:394-432) instead of one sketch
    row per raw bucket — months of 5-second intervals stay cheap."""
    table = registry.get(name)
    spec = table.spec
    k = k or spec.size
    iv = spec.time_interval_us
    state = table.state
    if (not spec.stream_summary and spec.time_col is not None
            and start_us is not None and end_us is not None
            and table.max_level > 0):
        b0 = max(0, (start_us - table.epoch_us) // iv)
        b1 = (end_us - table.epoch_us) // iv
        cover = IntervalTracker(table.max_level).cover(int(b0), int(b1))
        cond = None
        for lvl, idx in cover:
            c = (F.col("level") == lvl) & (F.col("bucket") == idx)
            cond = c if cond is None else cond | c
        state = state.where(cond)
    elif spec.time_col is not None:
        state = state.where(F.col("level") == 0)
        if start_us is not None:
            state = state.where(
                F.col("bucket") >= (start_us - table.epoch_us) // iv)
        if end_us is not None:
            state = state.where(
                F.col("bucket") <= (end_us - table.epoch_us) // iv)
    else:
        state = state.where(F.col("level") == 0)

    if spec.stream_summary:
        # candidate-count merge is pure counter addition over the bounded
        # (buckets x capacity) candidate lists — stays entirely JVM-side:
        # explode the zipped candidate arrays and sum per key (each key
        # lives in exactly one pid, so the global groupBy equals the old
        # per-pid merge). No Python in the query path.
        per = (state.select(F.explode(F.arrays_zip(
                   F.col("cand_keys").alias("k"),
                   F.col("cand_counts").alias("c"))).alias("kc"))
               .select(F.col("kc.k").alias("key"), F.col("kc.c").alias("c"))
               .groupBy("key")
               .agg(F.sum("c").cast("long").alias("EstimatedValue"))
               .withColumn("DeltaError", F.lit(0).cast("long")))
        return (per.orderBy(F.col("EstimatedValue").desc(),
                            F.col("key").asc()).limit(k))
    else:
        def query(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np
            from .sketches import key_hash
            sketches = [CountMinSketch.from_bytes(bytes(r))
                        for r in pdf["sketch"]]
            cands: set[str] = set()
            for ck in pdf["cand_keys"]:
                cands.update(ck)
            keys = sorted(cands)
            # vectorized Approximate fold (round 11, guide §4.2): hash
            # each candidate ONCE, estimate whole key arrays per sketch
            # (estimate_many is bit-identical to the scalar estimate),
            # and sum the monoid fields as arrays. Identities mirrored
            # from Approximate.__add__: EstimatedValue and MaxBound are
            # the estimate sum, LowerBound sums (est - floor(size*eps))
            # per sketch, Probability is the LEFT operand's — the first
            # sketch's confidence (all sketches share the depth).
            rows = []
            if keys and sketches:
                hs = np.array([key_hash(k) for k in keys], dtype=np.uint64)
                est = np.zeros(len(keys), dtype=np.int64)
                low = np.zeros(len(keys), dtype=np.int64)
                for s in sketches:
                    e = s.estimate_many(hs)
                    est += e
                    low += e - int(s.size * s.eps)
                prob = sketches[0].confidence
                rows = [(k, int(est[i]), int(low[i]), int(est[i]), prob)
                        for i, k in enumerate(keys)]
            return pd.DataFrame(rows, columns=["key", "EstimatedValue",
                                               "LowerBound", "MaxBound",
                                               "Probability"])
        out_schema = ("key string, EstimatedValue long, LowerBound long, "
                      "MaxBound long, Probability double")
        # ship only the columns the function reads (guide §4.1): level /
        # bucket / cand_counts would otherwise cross the Arrow boundary
        # for nothing
        state = state.select("pid", "sketch", "cand_keys")

    per_part = state.groupBy("pid").applyInPandas(query, schema=out_schema)
    return (per_part.orderBy(F.col("EstimatedValue").desc(), F.col("key").asc())
            .limit(k))
