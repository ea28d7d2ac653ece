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


def windowed_counts_micros(stream_df: DataFrame, time_col: str,
                           window_us: int, watermark_us: int,
                           key: str) -> DataFrame:
    """Driver-fixture variant of ``windowed_event_counts``: tumbling
    event-time windows emitted as epoch-MICROSECOND bounds (BIGINT), so
    the result is engine-portable (no timestamp-timezone comparisons).

    Append-mode semantics make the batch replay exact: a window appears in
    the output iff the final watermark (global max event time minus the
    delay) has passed its end, and every window emits exactly once. With
    time-ordered micro-batches nothing is ever late, so the closed
    windows' counts equal the batch tumbling-window counts — the DuckDB
    side of that contract is ``windowed_counts_oracle_sql``.
    """
    assert window_us % 1_000_000 == 0 and watermark_us % 1_000_000 == 0
    # watermarks require TIMESTAMP; go through epoch micros (TZ-independent
    # for NTZ/naive inputs — the timestampdiff convention of topk._time_us)
    # so the instant, the window alignment and the output bounds never see
    # the session timezone
    from snappy_aqp_spark.topk.api import _time_us
    if time_col == "__t":
        # upstream already defined the watermark on __t (e.g. a chained
        # dedup_within_watermark(keep_event_time=True)); a second
        # withWatermark above a stateful operator is disallowed
        # ("Redefining watermark"), so reuse the propagated one.
        out = stream_df
    else:
        out = (stream_df
               .withColumn("__t", F.timestamp_micros(_time_us(stream_df,
                                                              time_col)))
               .withWatermark("__t", f"{watermark_us // 1_000_000} seconds"))
    win = F.window("__t", f"{window_us // 1_000_000} seconds")
    return (out.groupBy(win.alias("win"), F.expr(key).alias("key"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.unix_micros("win.start").alias("win_start_us"),
                    F.unix_micros("win.end").alias("win_end_us"),
                    "key", "n"))


def windowed_counts_oracle_sql(table: str, time_col: str, window_us: int,
                               watermark_us: int, key: str) -> str:
    """DuckDB replay of the append-mode stream output: tumbling-window
    counts restricted to windows the final watermark closed
    (win_end <= max(ts) - delay; Spark's eviction predicate is
    window.end <= eventTimeWatermark, verified empirically in the
    fixture)."""
    w = int(window_us)
    return (
        "SELECT win_start_us, win_start_us + {w} AS win_end_us, key, n "
        "FROM (SELECT (epoch_us({t}) // {w}) * {w} AS win_start_us, "
        "{k} AS key, CAST(COUNT(*) AS BIGINT) AS n FROM {tab} "
        "GROUP BY 1, 2) __w, "
        "(SELECT MAX(epoch_us({t})) - {d} AS wm FROM {tab}) __m "
        "WHERE win_start_us + {w} <= wm "
        "ORDER BY win_start_us, key"
        .format(w=w, d=int(watermark_us), t=time_col, k=key, tab=table))


def sliding_counts_micros(stream_df: DataFrame, time_col: str,
                          window_us: int, slide_us: int, watermark_us: int,
                          key: str) -> DataFrame:
    """Hopping-window variant of ``windowed_counts_micros``: each event
    contributes to window_us/slide_us overlapping windows (Spark expands
    the row into one per window BEFORE the aggregate — map-side, no extra
    shuffle), and append mode still emits each window exactly once when
    the watermark closes it."""
    assert window_us % slide_us == 0, "slide must divide the window"
    assert slide_us % 1_000_000 == 0 and watermark_us % 1_000_000 == 0
    from snappy_aqp_spark.topk.api import _time_us
    out = (stream_df
           .withColumn("__t", F.timestamp_micros(_time_us(stream_df,
                                                          time_col)))
           .withWatermark("__t", f"{watermark_us // 1_000_000} seconds"))
    win = F.window("__t", f"{window_us // 1_000_000} seconds",
                   f"{slide_us // 1_000_000} seconds")
    return (out.groupBy(win.alias("win"), F.expr(key).alias("key"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.unix_micros("win.start").alias("win_start_us"),
                    F.unix_micros("win.end").alias("win_end_us"),
                    "key", "n"))


def sliding_counts_oracle_sql(table: str, time_col: str, window_us: int,
                              slide_us: int, watermark_us: int,
                              key: str) -> str:
    """DuckDB replay of the hopping-window append output: every event maps
    to the window_us/slide_us slide-aligned starts covering it (expanded
    with a small UNION of shifted floor-divisions — window/slide is a
    constant), restricted to watermark-closed windows."""
    assert window_us % slide_us == 0
    n_win = window_us // slide_us
    w, s = int(window_us), int(slide_us)
    t = f"epoch_us({time_col})"
    branches = " UNION ALL ".join(
        f"SELECT ({t} // {s}) * {s} - {k * s} AS win_start_us, "
        f"{key} AS key FROM {table}"
        for k in range(n_win))
    return (
        "SELECT win_start_us, win_start_us + {w} AS win_end_us, key, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM ({branches}) __e, "
        "(SELECT MAX({t}) - {d} AS wm FROM {tab}) __m "
        "WHERE win_start_us + {w} <= wm "
        "GROUP BY win_start_us, key "
        "ORDER BY win_start_us, key"
        .format(w=w, d=int(watermark_us), t=t, tab=table,
                branches=branches))


def dedup_within_watermark(stream_df: DataFrame, time_col: str,
                           key: str, delay_us: int,
                           keep_event_time: bool = False) -> DataFrame:
    """Streaming ingest dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key's dedup state only until
    the watermark passes its event time + delay, so state size is
    O(arrival rate x delay) instead of O(total keys ever seen) — the only
    formulation that survives an unbounded 100 TB ingest. Re-sent rows
    are eliminated either by the dedup state (arrived within the delay)
    or by the watermark's late-row drop (arrived after it); with every
    FIRST occurrence on time, the output is exactly one row per key.

    ``keep_event_time=True`` retains the watermarked ``__t`` column so a
    downstream stateful operator (e.g. ``windowed_counts_micros`` with
    ``time_col="__t"``) can chain onto the SAME watermark — Spark 4
    supports multiple stateful operators per query but forbids redefining
    the watermark between them.
    """
    assert delay_us % 1_000_000 == 0
    from snappy_aqp_spark.topk.api import _time_us
    out = (stream_df
           .withColumn("__t", F.timestamp_micros(_time_us(stream_df,
                                                          time_col)))
           .withWatermark("__t", f"{delay_us // 1_000_000} seconds"))
    out = out.dropDuplicatesWithinWatermark([key])
    return out if keep_event_time else out.drop("__t")
