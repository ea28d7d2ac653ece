"""Sessionization: gap-based session assignment + per-session rollups over
an event stream, as one declarative SQL plan.

The reference module has no session operator (its streaming surface is
sample/TopK population, SnappyContextAQPFunctions.scala:390-442); a
training-data pipeline over clickstream/event logs needs one constantly —
"split each user's events into sessions separated by > G of silence, then
aggregate per session".

Plan shape (the one you want at 100 TB):
  1. one hash shuffle on ``user_id`` for the LAG window;
  2. the running-sum window and the per-(user_id, session_seq) aggregate
     both reuse that exchange (HashPartitioning(user_id) satisfies the
     clustered distribution of any key set containing user_id), so the
     whole operator is ONE shuffle + one partition-local sort.

Determinism: event ordering is pinned by (t, event_id) — unique per user —
and the monetary rollup sums integer cents, so the result is bit-identical
on any engine / partitioning (the DuckDB oracle replays the same stages).
"""

from __future__ import annotations

from ..dialect import epoch_us_ntz


def sessionize_stages(dialect: str, gap_minutes: int = 720,
                      table: str = "events"
                      ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per (user_id, session_seq):
    (user_id, session_seq, n_events, start_us, end_us, duration_us,
    value_cents)."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    t = epoch_us_ntz(dialect, "ts")
    w = "(PARTITION BY user_id ORDER BY t, event_id)"
    stages = [
        ("__sev",
         f"SELECT user_id, event_id, {t} AS t, "
         f"CAST(ROUND(value * 100) AS BIGINT) AS cents FROM {table}"),
        # session boundary: first event of the user, or silence > gap
        ("__sfl",
         f"SELECT user_id, event_id, t, cents, "
         f"CASE WHEN LAG(t) OVER {w} IS NULL "
         f"       OR t - LAG(t) OVER {w} > {gap_us} "
         f"     THEN 1 ELSE 0 END AS new_sess "
         f"FROM __sev"),
        ("__ssq",
         f"SELECT user_id, event_id, t, cents, "
         f"SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t, event_id "
         f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq "
         f"FROM __sfl"),
        # _mz (round 11): the final's global ORDER BY range-samples its
        # child before sorting, and everything from the user_id exchange
        # up (sort + both windows + the aggregate) sits between the last
        # exchange and the Sort — so it EXECUTED TWICE per call. The
        # materialized relation is the output-sized per-session rollup.
        ("__ssa_mz",
         "SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, "
         "CAST(COUNT(*) AS BIGINT) AS n_events, "
         "MIN(t) AS start_us, MAX(t) AS end_us, "
         "MAX(t) - MIN(t) AS duration_us, "
         "CAST(SUM(cents) AS BIGINT) AS value_cents "
         "FROM __ssq GROUP BY user_id, session_seq"),
    ]
    final = ("SELECT user_id, session_seq, n_events, start_us, end_us, "
             "duration_us, value_cents FROM __ssa_mz "
             "ORDER BY user_id, session_seq")
    return stages, final
