"""Temporal joins the built-in operator set lacks: as-of join and
interval (range) join, both in shuffle-bounded formulations.

The reference engine has neither (its join surface is Spark 2.1's equi
joins constrained by sample routing, QueryProcessingRules.scala:504-515);
event-log feature pipelines need both constantly — "attach the most recent
click at or before each purchase" (as-of attribution) and "count the
activity inside the window following each error" (range join).

Naive formulations are O(n·m) BroadcastNestedLoopJoins — a 100 TB
scale-killer. These are the relational rewrites:

* **as-of** = union probe+build rows, one window sorted by (t, side, key)
  per join key, carry the last non-null build key forward. ONE shuffle on
  the join key, one partition-local sort — the distributed merge-join
  formulation of as-of.
* **range** = bucketize time at a grain on the order of the window length:
  each probe row lands in exactly one bucket, each interval explodes into
  the buckets it overlaps (window/grain + 1 of them), and the join becomes
  an equi-join on (key, bucket) + a residual range filter.
  Candidate-complete by construction; the explosion factor is a constant
  you pick, not a data property.

Determinism: ordering keys are unique integers, monetary sums are integer
cents — bit-identical across engines and partitionings.
"""

from __future__ import annotations

from ..dialect import epoch_us_ntz, last_value_ignore_nulls
from .dual import explode, idiv, sequence

_DAY_US = 24 * 3600 * 1_000_000


def asof_join_stages(dialect: str, probe_type: str = "purchase",
                     build_type: str = "click"
                     ) -> tuple[list[tuple[str, str]], str]:
    """For every ``probe_type`` event, the most recent ``build_type`` event
    of the same user with ``t_build <= t_probe`` (ties broken toward the
    largest build event_id — pinned, unlike bare ASOF JOIN semantics).
    -> one row per probe event: (event_id, user_id, matched_event_id
    nullable, matched_value_cents nullable, age_us nullable)."""
    et = epoch_us_ntz(dialect, "ts")
    # probe and build rows in one relation; is_probe sorts build rows first
    # at equal t so "at or before" is inclusive. The order key is non-null
    # and unique within each (k, t, is_probe) slice, sidestepping
    # engine-specific NULL ordering.
    w = ("(PARTITION BY k ORDER BY t, is_probe, ord "
         "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    lv = last_value_ignore_nulls(dialect, "bkey", w)
    stages = [
        ("__aou",
         f"SELECT user_id AS k, {et} AS t, event_id, "
         f"CAST(NULL AS BIGINT) AS bkey, 1 AS is_probe, event_id AS ord "
         f"FROM events WHERE event_type = '{probe_type}' "
         f"UNION ALL "
         f"SELECT user_id AS k, {et} AS t, CAST(NULL AS BIGINT) AS event_id, "
         f"event_id AS bkey, 0 AS is_probe, event_id AS ord "
         f"FROM events WHERE event_type = '{build_type}'"),
        ("__aom",
         f"SELECT k, t, event_id, is_probe, {lv} AS asof_bkey FROM __aou"),
        ("__aob",
         f"SELECT event_id AS bkey, {et} AS bt, "
         f"CAST(ROUND(value * 100) AS BIGINT) AS bcents "
         f"FROM events WHERE event_type = '{build_type}'"),
        # _mz (round 11): the final's global ORDER BY range-samples its
        # child, re-executing the window + join subtree above the last
        # exchange a second time per call; the materialized relation is
        # output-sized (one row per probe event)
        ("__aoj_mz",
         "SELECT m.event_id, m.k AS user_id, b.bkey AS matched_event_id, "
         "b.bcents AS matched_value_cents, m.t - b.bt AS age_us "
         "FROM __aom m LEFT JOIN __aob b ON m.asof_bkey = b.bkey "
         "WHERE m.is_probe = 1"),
    ]
    final = ("SELECT event_id, user_id, matched_event_id, "
             "matched_value_cents, age_us FROM __aoj_mz ORDER BY event_id")
    return stages, final


def range_join_stages(dialect: str, anchor_type: str = "error",
                      window_days: int = 1, grain_us: int = _DAY_US
                      ) -> tuple[list[tuple[str, str]], str]:
    """Events of the same user inside ``[t_anchor, t_anchor + window)``
    after each ``anchor_type`` event -> one row per anchor:
    (event_id, n_follow, value_cents). The anchor itself qualifies (its
    timestamp is in the half-open window).

    Each event sits in exactly one time bucket and each interval lists all
    buckets it overlaps, so every qualifying (anchor, event) pair meets in
    exactly one (key, bucket) cell — no post-join dedup."""
    et = epoch_us_ntz(dialect, "ts")
    win_us = int(window_days) * _DAY_US
    buckets = sequence(dialect, idiv(dialect, "t0", str(grain_us)),
                       idiv(dialect, f"t0 + {win_us} - 1", str(grain_us)))
    # __rja is a named stage since round 11: it is referenced by the
    # interval explode AND the final's left side, so naming it lets the
    # stage runner materialize the (small) anchor list once instead of
    # scanning the events table a third time for the final's anchor keys
    anchors = (f"SELECT event_id AS akey, user_id AS k, {et} AS t0 "
               f"FROM events WHERE event_type = '{anchor_type}'")
    expl = (f"SELECT akey, k, t0, t0 + {win_us} AS t1, "
            f"{explode(dialect, buckets, 'bucket')} FROM __rja")
    stages = [
        ("__rja", anchors),
        ("__rje",
         f"SELECT user_id AS k, event_id, {et} AS t, "
         f"{idiv(dialect, et, str(grain_us))} AS bucket, "
         f"CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events"),
        ("__rji", expl),
        ("__rjm",
         f"SELECT i.akey, e.cents FROM __rji i "
         f"JOIN __rje e ON i.k = e.k AND i.bucket = e.bucket "
         f"AND e.t >= i.t0 AND e.t < i.t1"),
        # _mz (round 11): the final's global ORDER BY range-samples its
        # child, re-executing the aggregate + join subtree above the last
        # exchange a second time per call; the materialized relation is
        # output-sized (one row per anchor event)
        ("__rjc_mz",
         "SELECT a.akey AS event_id, "
         "CAST(COUNT(m.cents) AS BIGINT) AS n_follow, "
         "CAST(COALESCE(SUM(m.cents), 0) AS BIGINT) AS value_cents "
         "FROM __rja a "
         "LEFT JOIN __rjm m ON a.akey = m.akey "
         "GROUP BY a.akey"),
    ]
    final = ("SELECT event_id, n_follow, value_cents FROM __rjc_mz "
             "ORDER BY event_id")
    return stages, final
