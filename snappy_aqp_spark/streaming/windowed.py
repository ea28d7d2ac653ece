"""Event-time windowed aggregation with watermark-based late-data handling.

The Structured-Streaming-native path for time-bucketed stream analytics
(the reference's time-interval slots in StratifiedSamplerCached and the
TopK time buckets are the batch analogs): built-in ``window()`` +
``withWatermark`` — state is bounded by the watermark delay, late rows
beyond it are dropped by the ENGINE (not application code), and append
mode emits each window exactly once, when it finalizes.

At scale this is the canonical plan: the windowed groupBy is one shuffle
on (window, key); state store size = open windows x keys; no Python in
the path at all (whole-stage codegen aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def event_time(df: DataFrame, time_col: str):
    """timestamp-typed event time from the table's time column (LONG
    nanosecond ticks or native timestamps — same convention as
    topk/api._time_us)."""
    dt = dict(df.dtypes).get(time_col)
    if dt == "bigint":
        return F.timestamp_micros(F.expr(f"({time_col}) DIV 1000"))
    return F.expr(time_col)


def windowed_event_counts(stream_df: DataFrame, time_col: str = "ts",
                          window: str = "5 minutes",
                          watermark: str = "2 minutes",
                          key: str | None = None) -> DataFrame:
    """windowed counts with late-data drop; start with
    ``.writeStream.outputMode("append")`` — each window emits once, after
    the watermark passes its end."""
    out = stream_df.withColumn("__t", event_time(stream_df, time_col)) \
        .withWatermark("__t", watermark)
    keys = [F.window("__t", window).alias("win")]
    if key is not None:
        keys.append(F.expr(key).alias("key"))
    return (out.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    *(["key"] if key is not None else []), "n"))
