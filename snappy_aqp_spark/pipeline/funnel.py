"""Event-sequence analytics: ordered conversion funnels and cohort
retention — the two queries every product/behavior dataset gets asked
first, in shuffle-bounded form.

* **funnel**: how many users performed step1 -> step2 -> ... IN ORDER
  within a time window. Computed per user with a cascade of conditional
  MINs over one (user)-partitioned pass: stage k's timestamp is the
  earliest event of type k at-or-after the user's stage-(k-1) timestamp.
  ONE shuffle on the user key; no self-joins, no explosion (a naive
  k-way self-join is O(events^k) — the cascade is O(events · k)).
* **cohort retention**: users grouped by first-activity period, counted
  by activity in each later period. Two narrow aggregates (first period
  per user, distinct user-period activity) + one join on the user key.

All-integer outputs; bit-exact replay oracles.
"""

from __future__ import annotations

from ..dialect import epoch_us_ntz
from .dual import idiv

_DAY_US = 24 * 3600 * 1_000_000
_WEEK_US = 7 * _DAY_US


def funnel_stages(dialect: str,
                  steps: tuple[str, ...] = ("signup", "click", "purchase"),
                  within_days: int = 30, table: str = "events"
                  ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per funnel stage: (stage, step_name,
    n_users) — users whose ordered step-k event happened within
    ``within_days`` of their stage-1 entry. Monotone by construction
    (stage k counts a subset of stage k-1)."""
    t = epoch_us_ntz(dialect, "ts")
    win_us = int(within_days) * _DAY_US
    # earliest stage-1 entry per user, then each later stage = earliest
    # qualifying event at-or-after the previous stage's timestamp
    sel = ["user_id", f"MIN(CASE WHEN event_type = '{steps[0]}' "
                      f"THEN t END) AS t1"]
    stages = [
        ("__fev", f"SELECT user_id, event_type, {t} AS t FROM {table}"),
        ("__ft1", f"SELECT {', '.join(sel)} FROM __fev GROUP BY user_id"),
    ]
    prev = "t1"
    for k, step in enumerate(steps[1:], start=2):
        stages.append((
            f"__ft{k}",
            f"SELECT p.user_id, p.t1, "
            + ", ".join(f"p.t{i}" for i in range(2, k))
            + (", " if k > 2 else "")
            + f"MIN(CASE WHEN e.event_type = '{step}' "
              f"AND e.t >= p.{prev} AND e.t < p.t1 + {win_us} "
              f"THEN e.t END) AS t{k} "
              f"FROM __ft{k - 1} p LEFT JOIN __fev e "
              f"ON e.user_id = p.user_id "
              f"GROUP BY p.user_id, p.t1"
            + ("".join(f", p.t{i}" for i in range(2, k)))))
        prev = f"t{k}"
    last = len(steps)
    counts = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS stage, '{step}' AS step_name, "
        f"CAST(COUNT(t{k}) AS BIGINT) AS n_users FROM __ft{last}"
        for k, step in enumerate(steps, start=1))
    final = f"SELECT * FROM ({counts}) __f ORDER BY stage"
    return stages, final


def cohort_retention_stages(dialect: str, period_us: int = _WEEK_US,
                            max_offset: int = 4, table: str = "events"
                            ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per (cohort_period, period_offset):
    (cohort_period, period_offset, n_active, cohort_size) for offsets
    0..max_offset — the classic retention triangle. n_active at offset 0
    equals cohort_size by definition."""
    t = epoch_us_ntz(dialect, "ts")
    p = idiv(dialect, t, str(period_us))
    stages = [
        ("__cre", f"SELECT user_id, {p} AS pd FROM {table}"),
        ("__cra", "SELECT DISTINCT user_id, pd FROM __cre"),
        # per-user cohort = window MIN over the deduplicated activity —
        # replaces a separate groupBy(user) relation + a user-keyed
        # re-join of both streams (two exchanges gone). One row per
        # (user, pd), so `pd = cohort` marks each user exactly once.
        ("__crw",
         "SELECT user_id, pd, MIN(pd) OVER (PARTITION BY user_id) "
         "AS cohort FROM __cra"),
        ("__crm",
         f"SELECT cohort, pd - cohort AS off_p, user_id FROM __crw "
         f"WHERE pd - cohort <= {max_offset}"),
        ("__crs",
         "SELECT cohort, CAST(COUNT(*) AS BIGINT) AS size "
         "FROM __crw WHERE pd = cohort GROUP BY cohort"),
    ]
    # (cohort, off_p, user_id) rows are UNIQUE by construction (cohort and
    # off_p are functions of (user_id, pd), and (user_id, pd) is distinct),
    # so COUNT(*) equals the former COUNT(DISTINCT user_id) row for row —
    # without the Expand+double-aggregate plan; sizes join AFTER the
    # aggregation, so the join touches offset-table-sized relations only
    final = ("SELECT g.cohort AS cohort_period, g.off_p AS period_offset, "
             "g.n_active, s.size AS cohort_size "
             "FROM (SELECT cohort, off_p, CAST(COUNT(*) AS BIGINT) "
             "AS n_active FROM __crm GROUP BY cohort, off_p) g "
             "JOIN __crs s ON g.cohort = s.cohort "
             "ORDER BY cohort_period, period_offset")
    return stages, final
