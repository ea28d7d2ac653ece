"""Structured-Streaming maintenance of sample tables and TopK structures.

The reference populates samples and TopK sketches from DStreams
(``collectSamples`` / ``aqpTablePopulator``,
execution/SnappyContextAQPFunctions.scala:81-105, 390-442 — per-RDD inserts
into every dependent AQP structure). The rebuild attaches the same fan-out
to Structured Streaming via ``foreachBatch``; queries then run as batch
reads over the maintained state, exactly the reference's model.

Key design — weights are computed at *read* time, not write time:
sample rows persist without weight columns; a tiny per-stratum stats table
(QCS -> rows seen / rows kept) is updated each micro-batch and broadcast-
joined at read time to attach ``snappy_sampler_weightage``. This is how the
reference stays correct under growth (``fillWeightage`` at scan,
stratifiedSampling.scala:456-464) and it makes streaming maintenance
*exactly* equal to a batch re-sample of the accumulated data:

  * hash method: membership depends only on the row key -> append-only rows
  * reservoir method: the reservoir is the k smallest key-hashes per
    stratum -> incremental top-k merge reproduces the batch pick
    bit-for-bit (Algorithm-R analog with deterministic priorities)

State commits through a SINGLE-MANIFEST protocol (the minimal form of an
Iceberg/Delta-style table commit): each micro-batch writes its outputs
under a fresh epoch directory, then atomically replaces one MANIFEST file
pointing at the consistent (rows, stats) pair. A crash anywhere before the
manifest flip leaves the previous epoch fully intact — there is no window
where rows and stats disagree. At scale the same protocol runs on shared
storage with a conditional-put for the manifest.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..detrng import hash_sql, threshold_for_fraction
from ..specs import (STRATA_SAMPLED_COL, STRATA_TOTAL_COL, WEIGHT_COL,
                     SampleSpec)
from ..topk.api import (TopKRegistry, TopKSpec, create_approx_ts_topk,
                        decay_topk, insert_into_topk)


class StreamingSampleMaintainer:
    """``retain_slots``: with the spec's timeSeriesColumn/timeInterval set,
    keep only the newest N time slots — older slots AGE OUT of both the
    kept rows and the stats, exactly the reference's per-slot reservoir
    reset (StratifiedSamplerCached timeSlot handling,
    stratifiedSampling.scala:270,342-357). None -> no aging (slots still
    stratify, nothing is dropped). The maintained sample stays bit-equal
    to a batch re-sample of the retained window."""

    def __init__(self, spark: SparkSession, spec: SampleSpec, state_dir: str,
                 retain_slots: int | None = None):
        if spec.method not in ("hash", "reservoir", "reservoir_rand"):
            raise ValueError("streaming maintenance supports hash/reservoir")
        if retain_slots is not None and not spec.time_series_col:
            raise ValueError("retain_slots needs the spec's "
                             "timeSeriesColumn/timeInterval options")
        self.spark, self.spec = spark, spec
        self.retain_slots = retain_slots
        self.state_dir = state_dir
        self.manifest_path = os.path.join(state_dir, "MANIFEST")
        self._qcs = [f"__q{i}" for i in range(len(spec.qcs))]
        if spec.time_series_col:
            # the time slot is an extra stratification dimension: weights,
            # reservoirs and aging all act per (QCS x slot)
            self._qcs.append("__slot")

    # -- helpers ------------------------------------------------------------

    def _tag(self, df: DataFrame) -> DataFrame:
        from ..sampling.samplers import priority_sql
        out = df.withColumn("__h", F.expr(priority_sql(self.spec)))
        for i, q in enumerate(self.spec.qcs):
            out = out.withColumn(f"__q{i}", F.expr(q))
        if self.spec.time_series_col:
            from ..topk.api import _time_us
            out = out.withColumn(
                "__slot",
                F.floor(_time_us(df, self.spec.time_series_col)
                        / F.lit(self.spec.time_interval_us)).cast("long"))
        return out

    # -- manifest commit protocol -------------------------------------------

    def _manifest(self) -> dict | None:
        try:
            with open(self.manifest_path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _read_dirs(self, dirs: list[str]) -> DataFrame | None:
        paths = [os.path.join(self.state_dir, d) for d in dirs
                 if os.path.isdir(os.path.join(self.state_dir, d))]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def _epoch_dir(self, epoch: int, kind: str) -> str:
        # uuid suffix: a retried epoch after a pre-commit crash must not
        # collide with the orphaned half-written directory
        return os.path.join("epochs", f"{epoch:08d}_{uuid.uuid4().hex[:8]}",
                            kind)

    def _commit(self, manifest: dict) -> None:
        """the ONE atomic step: everything referenced by ``manifest`` is
        fully written before this replace; a crash before it leaves the
        previous manifest (and its files) untouched."""
        tmp = self.manifest_path + f".{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self.manifest_path)
        self._gc(manifest)

    def _gc(self, manifest: dict) -> None:
        """post-commit cleanup: epoch dirs no longer referenced. Safe to
        crash mid-way — unreferenced files are invisible to readers."""
        live = {os.path.normpath(d).split(os.sep)[1]
                for d in manifest.get("rows", []) + [manifest.get("stats")]
                if d}
        root = os.path.join(self.state_dir, "epochs")
        if not os.path.isdir(root):
            return
        for d in os.listdir(root):
            if d not in live:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)

    # -- the foreachBatch hook ----------------------------------------------

    # delta-dir count above which the hash method's row deltas compact
    # into one directory (bounds manifest size AND expired-slot storage)
    _COMPACT_AFTER = 16

    def process_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> None:
        spec = self.spec
        tagged = self._tag(batch_df)
        man = self._manifest() or {"epoch": -1, "rows": [], "stats": None,
                                   "cutoff": None}
        epoch = int(man["epoch"]) + 1

        # 1. accumulate per-stratum totals (global, not per-batch — the
        #    incremental-weights pitfall called out in SURVEY §7)
        batch_stats = tagged.groupBy(*self._qcs).agg(
            F.count(F.lit(1)).alias("__seen"))
        old = self._read_dirs([man["stats"]]) if man["stats"] else None
        if old is not None:
            batch_stats = (batch_stats.unionByName(old)
                           .groupBy(*self._qcs)
                           .agg(F.sum("__seen").alias("__seen")))

        # aging cutoff: only the newest retain_slots slots survive, in the
        # stats AND the kept rows (late rows behind the cutoff are dropped,
        # which is the point of aging)
        cutoff = man.get("cutoff")
        if self.retain_slots is not None:
            mx = batch_stats.agg(F.max("__slot").alias("m")).collect()[0]["m"]
            if mx is not None:
                cutoff = int(mx) - self.retain_slots + 1
                batch_stats = batch_stats.where(F.col("__slot") >= cutoff)
        stats_rel = self._epoch_dir(epoch, "stats")
        batch_stats.write.parquet(os.path.join(self.state_dir, stats_rel))

        # 2. maintain kept rows
        rows_rel = self._epoch_dir(epoch, "rows")
        rows_abs = os.path.join(self.state_dir, rows_rel)
        if spec.method == "hash":
            # membership is key-determined -> append-only: each batch adds
            # ONE delta dir; expired slots are filtered at read time by the
            # manifest cutoff, and deltas periodically compact into one dir
            thr = threshold_for_fraction(spec.fraction)
            kept = tagged.where(F.col("__h") < F.lit(thr))
            if cutoff is not None:
                kept = kept.where(F.col("__slot") >= cutoff)
            kept.write.parquet(rows_abs)
            new_rows = list(man["rows"]) + [rows_rel]
            if len(new_rows) > self._COMPACT_AFTER:
                live = self._read_dirs(new_rows)
                if cutoff is not None:
                    live = live.where(F.col("__slot") >= cutoff)
                compact_rel = self._epoch_dir(epoch, "rows_compact")
                live.write.parquet(os.path.join(self.state_dir, compact_rel))
                new_rows = [compact_rel]
        else:
            merged = tagged
            old_rows = self._read_dirs(man["rows"]) if man["rows"] else None
            if old_rows is not None:
                merged = old_rows.select(*merged.columns).unionByName(merged)
            if cutoff is not None:
                merged = merged.where(F.col("__slot") >= cutoff)
            order = ([F.col("__h").asc()] +
                     [F.col(c).asc() for c in batch_df.columns])
            w = Window.partitionBy(*self._qcs).orderBy(*order)
            kept = (merged.withColumn("__rn", F.row_number().over(w))
                    .where(F.col("__rn") <= spec.reservoir_size).drop("__rn"))
            kept.write.parquet(rows_abs)
            new_rows = [rows_rel]

        # everything above is invisible until this single atomic flip
        self._commit({"epoch": epoch, "rows": new_rows, "stats": stats_rel,
                      "cutoff": cutoff})

    # -- read side ----------------------------------------------------------

    def sample_df(self) -> DataFrame:
        """rows ⨝ current stats -> weight columns (read-time fillWeightage)."""
        man = self._manifest()
        rows = self._read_dirs(man["rows"]) if man else None
        stats = (self._read_dirs([man["stats"]])
                 if man and man["stats"] else None)
        if rows is None or stats is None:
            raise RuntimeError("no streaming state yet")
        if man.get("cutoff") is not None:
            rows = rows.where(F.col("__slot") >= int(man["cutoff"]))
        n_kept = rows.groupBy(*self._qcs).agg(F.count(F.lit(1)).alias("__kept"))
        joined = (rows.join(F.broadcast(stats), on=self._qcs)
                  .join(F.broadcast(n_kept), on=self._qcs))
        base_cols = [c for c in rows.columns
                     if c not in self._qcs and c != "__h"]
        return joined.select(
            *base_cols,
            F.col("__kept").cast("bigint").alias(STRATA_SAMPLED_COL),
            F.col("__seen").cast("bigint").alias(STRATA_TOTAL_COL),
            (F.col("__seen").cast("double") /
             F.col("__kept").cast("double")).alias(WEIGHT_COL))

    def attach(self, stream_df: DataFrame, **write_kwargs):
        """stream_df.writeStream.foreachBatch(self.process_batch)..."""
        return (stream_df.writeStream.foreachBatch(self.process_batch)
                .options(**write_kwargs))


class StreamingTopKMaintainer:
    """foreachBatch fan-in to a TopK table (reference aqpTablePopulator).

    ``decay_horizon``: with a CMS-backed (non stream-summary) spec, keep
    only the newest N time buckets at full sketch width — as ingestion
    advances the newest bucket, older buckets automatically compress
    (width-halving, ``decay_levels`` times) inside the same maintenance
    pass. This is the reference's bounded-memory aging: ``Hokusai``
    item aggregation runs on ``timeEpoch.increment`` as stream time
    advances (Hokusai.scala:172-196; TopKHokusai.scala:287-300), so a
    long-running stream's historical state stays bounded instead of
    growing linearly with history. ``decay_topk`` tracks a per-table
    watermark, so each bucket compresses exactly once."""

    def __init__(self, spark: SparkSession, registry: TopKRegistry,
                 spec: TopKSpec, decay_horizon: int | None = None,
                 decay_levels: int = 1):
        import dataclasses as _dc
        if decay_horizon is not None:
            spec = _dc.replace(spec, decay_horizon=decay_horizon,
                               decay_levels=decay_levels)
        if spec.decay_horizon is not None:
            if spec.stream_summary:
                raise ValueError("decay_horizon applies to CMS-backed "
                                 "TopK tables")
            if spec.decay_horizon < 1:
                raise ValueError("decay_horizon must be >= 1 bucket")
        self.spark, self.registry, self.spec = spark, registry, spec

    def process_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> None:
        # create/insert run the spec-driven aging (_maybe_decay) themselves
        if self.spec.name.lower() not in self.registry.tables:
            create_approx_ts_topk(self.spark, self.registry, batch_df, self.spec)
        else:
            insert_into_topk(self.spark, self.registry, self.spec.name, batch_df)

    def attach(self, stream_df: DataFrame):
        return stream_df.writeStream.foreachBatch(self.process_batch)
