"""Grouped top-k: the k heaviest members of every group, rank-limit
pushed into the shuffle.

The naive plan for "top k users per event type" sorts EVERY group member
inside a window — at 100 TB that is a full shuffle of the fact table plus
an O(n log n) per-partition sort dominated by rows that can never rank.
The scale-correct plan aggregates first (one combine-enabled groupBy:
partial sums map-side, so the shuffle carries one row per (group, member)
pair, not per event), then applies ``row_number() <= k``, which Spark's
WindowGroupLimit optimization rewrites into a per-partition top-k
(a bounded heap in the partial stage — only k candidates per group leave
each mapper). The pytest asserts WindowGroupLimit actually appears in
the physical plan, so a Spark regression to the sort-everything plan is
caught.

The tie-break chain (total DESC, member ASC) is total-ordering, so the
result is deterministic and the DuckDB replay (same SQL shape) is exact.
"""

from __future__ import annotations


def grouped_topk_stages(dialect: str, k: int = 3
                        ) -> tuple[list[tuple[str, str]], str]:
    """Top ``k`` users by summed event value per event type ->
    (event_type, user_id, total_cents, rnk)."""
    stages = [
        # combine-enabled pre-aggregation: the ONLY full-fact shuffle,
        # keyed (event_type, user_id) with map-side partial sums
        ("__gt_agg",
         "SELECT event_type, user_id, "
         "CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) "
         "AS total_cents FROM events GROUP BY event_type, user_id"),
        # rank-limit: row_number over a total order; Spark pushes the
        # limit into the shuffle via WindowGroupLimit
        ("__gt_rank",
         "SELECT event_type, user_id, total_cents, "
         "CAST(ROW_NUMBER() OVER (PARTITION BY event_type "
         "ORDER BY total_cents DESC, user_id ASC) AS BIGINT) AS rnk "
         "FROM __gt_agg"),
        # rank filter in-stage (same plan as the window, so the
        # WindowGroupLimit pushdown the pytest pins stays) + _mz: the
        # final's global ORDER BY otherwise re-evaluates the
        # aggregate+window subtree a second time for range-bound
        # sampling; the materialized relation is the output-sized
        # top-k-per-group table
        ("__gt_top_mz",
         f"SELECT event_type, user_id, total_cents, rnk "
         f"FROM __gt_rank WHERE rnk <= {int(k)}"),
    ]
    final = ("SELECT event_type, user_id, total_cents, rnk "
             "FROM __gt_top_mz ORDER BY event_type, rnk")
    return stages, final
