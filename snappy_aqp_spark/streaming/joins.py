"""Watermarked stream-stream interval joins.

The reference joins a stream against sampled/reference relations inside its
CQ pipeline (AQPStreamingSuite's windowed stream joins); Structured
Streaming generalizes that to full stream x stream joins where BOTH sides
are unbounded. The engine buffers each side in the state store and evicts
by watermark + the join's time-range condition, so state is bounded by
(arrival rate x allowed lag) — the only join formulation that survives an
unbounded 100 TB/day event feed.

For an INNER join with time-ordered micro-batches nothing is ever dropped
(eviction only removes rows whose match window the watermark has fully
passed), so the drained sink equals the plain batch interval join — which
is exactly the DuckDB replay used by the fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(left: DataFrame, right: DataFrame, key: str,
                         time_col: str, max_lag_us: int,
                         delay_us: int, how: str = "inner") -> DataFrame:
    """Pairs (l, r) with ``l.key = r.key`` and ``r.ts`` in
    ``(l.ts, l.ts + max_lag]`` over two streams.

    Both sides get the SAME watermark delay on an epoch-micros timestamp
    (portable NTZ convention, topk.api._time_us); the range condition lets
    the engine size each side's state retention: left rows are kept until
    the watermark passes ``l.ts + max_lag``, right rows until it passes
    ``r.ts`` — bounded state on both sides.

    Output columns: key, l_us, r_us, r_value (epoch micros + the right
    side's measure), one row per qualifying pair, append mode.

    ``how="left_outer"`` additionally emits one null-extended row per left
    row that found NO pair — but only once the watermark has passed the
    row's entire match window (``l.ts + max_lag``), i.e. once the engine
    can PROVE no match will ever arrive. The emission rides the state-store
    eviction pass, so a trailing watermark-advancing batch (or the
    engine's no-data finalization batch) flushes the last stragglers.
    """
    assert max_lag_us % 1_000_000 == 0 and delay_us % 1_000_000 == 0
    from snappy_aqp_spark.topk.api import _time_us
    delay = f"{delay_us // 1_000_000} seconds"
    lhs = (left
           .withColumn("__lt", F.timestamp_micros(_time_us(left, time_col)))
           .withWatermark("__lt", delay)
           .select(F.col(key).alias("l_key"), F.col("__lt")))
    rhs = (right
           .withColumn("__rt", F.timestamp_micros(_time_us(right, time_col)))
           .withWatermark("__rt", delay)
           .select(F.col(key).alias("r_key"), F.col("__rt"),
                   F.col("value").alias("r_value")))
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("__rt") > F.col("__lt"))
        & (F.col("__rt") <= F.col("__lt")
           + F.expr(f"INTERVAL {max_lag_us // 1_000_000} SECONDS")))
    return (lhs.join(rhs, cond, how)
            .select(F.col("l_key").alias("key"),
                    F.unix_micros("__lt").alias("l_us"),
                    F.unix_micros("__rt").alias("r_us"), "r_value"))


def interval_join_pairs_oracle_sql(table: str, key: str, time_col: str,
                                   left_pred: str, right_pred: str,
                                   max_lag_us: int) -> str:
    """DuckDB replay of the drained inner-join sink, aggregated per key:
    pair count and the cents-sum of the right side's measure."""
    return (
        "SELECT l.{k} AS key, CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(SUM(CAST(ROUND(r.value * 100) AS BIGINT)) AS BIGINT) "
        "AS r_value_cents "
        "FROM {tab} l JOIN {tab} r ON l.{k} = r.{k} "
        "AND epoch_us(r.{t}) > epoch_us(l.{t}) "
        "AND epoch_us(r.{t}) <= epoch_us(l.{t}) + {lag} "
        "WHERE ({lp}) AND ({rp}) "
        "GROUP BY l.{k} ORDER BY key"
        .format(tab=table, k=key, t=time_col, lag=int(max_lag_us),
                lp=left_pred.replace("event_type", "l.event_type"),
                rp=right_pred.replace("event_type", "r.event_type")))


def stream_static_enrich(stream_df: DataFrame, static_dim: DataFrame,
                         key: str) -> DataFrame:
    """Stream-static enrichment join: the static side is a plain batch
    DataFrame joined into every micro-batch (broadcast when small — the
    standard dimension-enrichment path). No state store involved: the
    static side is re-resolved per batch, so at scale it can also be a
    slowly-refreshed dimension snapshot without restarting the query."""
    from pyspark.sql.functions import broadcast
    return stream_df.join(broadcast(static_dim), key, "left")


def stream_static_enrich_oracle_sql(table: str = "events") -> str:
    """Replay of the fixture's enrichment summary: the derived user-tier
    dimension is id-derived, so the whole stream output replays as one
    batch aggregate."""
    return (
        "SELECT CAST(user_id % 3 AS BIGINT) AS tier, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) "
        f"AS value_cents FROM {table} GROUP BY tier ORDER BY tier")


def left_join_summary_oracle_sql(table: str, key: str, time_col: str,
                                 left_pred: str, right_pred: str,
                                 max_lag_us: int) -> str:
    """DuckDB replay of the drained LEFT OUTER sink, aggregated per key:
    matched-pair count, unmatched-left count (the watermark-proved nulls)
    and the cents-sum of the matched right measure. The streaming side
    flushes every provable non-match via a watermark-advancing trailing
    batch, so the replay is the plain batch left join."""
    return (
        "SELECT l.{k} AS key, "
        "CAST(COUNT(r.{k}) AS BIGINT) AS n_matched, "
        "CAST(SUM(CASE WHEN r.{k} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_unmatched, "
        "CAST(COALESCE(SUM(CAST(ROUND(r.value * 100) AS BIGINT)), 0) "
        "AS BIGINT) AS r_value_cents "
        "FROM (SELECT * FROM {tab} WHERE {lp}) l "
        "LEFT JOIN (SELECT * FROM {tab} WHERE {rp}) r ON l.{k} = r.{k} "
        "AND epoch_us(r.{t}) > epoch_us(l.{t}) "
        "AND epoch_us(r.{t}) <= epoch_us(l.{t}) + {lag} "
        "GROUP BY l.{k} ORDER BY key"
        .format(tab=table, k=key, t=time_col, lag=int(max_lag_us),
                lp=left_pred, rp=right_pred))
