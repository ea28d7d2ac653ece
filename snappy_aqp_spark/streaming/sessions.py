"""Gap-based session aggregation on Structured Streaming's native
``session_window`` — the engine-managed counterpart of the batch SQL
sessionization in ``pipeline/sessions.py``.

Two formulations of the same semantics, cross-validated by test:

* batch (``pipeline/sessions.py``): LAG + running-sum windows, one
  shuffle, DuckDB-replayable — the declarative form for bounded data;
* streaming (here): ``groupBy(session_window(ts, gap), key)`` with an
  event-time watermark — Spark's state store merges/expires sessions
  incrementally, append mode emits a session exactly once when the
  watermark passes its end. This is the form for unbounded data: state is
  bounded by open sessions, late rows beyond the watermark are dropped by
  the engine, and no custom state function is needed.

Boundary fine print: a gap of exactly G keeps the session open in the
batch formulation (``t - prev > G`` splits) and closes it in
``session_window`` (windows touch but do not overlap). With
microsecond-resolution event time the boundary set has measure zero; the
cross-validation test runs on real data where the two agree row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def session_rollup(df: DataFrame, gap_minutes: int = 720,
                   time_col: str = "ts", key: str = "user_id",
                   value_col: str = "value",
                   watermark: str | None = None) -> DataFrame:
    """per-(key, session) aggregate over batch OR streaming input:
    (user_id, start_us, n_events, value_cents). ``watermark`` (e.g.
    "0 seconds") is required for append-mode streaming."""
    # watermarks accept TIMESTAMP only (not NTZ) — go through tz-free
    # epoch micros (the TopK path's conversion) so the emitted start_us
    # is the naive epoch value regardless of session timezone
    from ..topk.api import _time_us
    df = df.withColumn("__evt", F.timestamp_micros(_time_us(df, time_col)))
    if watermark is not None:
        df = df.withWatermark("__evt", watermark)
    win = F.session_window(F.col("__evt"), f"{gap_minutes} minutes")
    cents = F.expr(f"CAST(ROUND({value_col} * 100) AS BIGINT)")
    return (df.groupBy(win, F.col(key))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.sum(cents).cast("bigint").alias("value_cents"))
            .select(
                F.col(key),
                F.unix_micros(F.col("session_window.start")).alias("start_us"),
                "n_events", "value_cents"))
