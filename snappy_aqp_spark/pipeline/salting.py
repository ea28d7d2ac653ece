"""Skew-salted equi-join: split heavy join keys across S shuffle
partitions by salting, with bit-identical results to the plain join.

The 100 TB problem: a shuffle join partitions both sides by the join key,
so one hot key (a celebrity user, a default/placeholder id, a boilerplate
document hash) lands its entire fact-side volume in ONE reducer — the
stage runs at the speed of its worst partition. Spark's AQE can split
skewed partitions for sort-merge joins it planned itself, but it cannot
help when the join is bucketed/pre-partitioned, when stats hide the skew
from the planner, or when the operator runs inside a staged pipeline that
pins its own partitioning. Explicit salting is the deterministic fix:

- detect heavy keys with one cheap fact-side aggregate
  (``count(*) > heavy_threshold``; the result is a tiny relation),
- replicate the DIM rows of heavy keys ``salt_factor`` times
  (dim-side fan-out is bounded by |heavy| x S — broadcastable),
- give each FACT row of a heavy key a deterministic salt in [0, S)
  derived from its primary key (``detrng.hash_sql`` — engine-portable),
  light keys use the sentinel salt -1 on both sides,
- join on (key, salt): each heavy key now spreads over S reducers.

Fact rows are never duplicated and every fact row matches exactly the
dim rows it matched before (heavy rows match the one replica carrying
their salt), so the salted join is row-for-row the plain join — the
pytest pins that equality on Spark, and the driver fixture replays the
same staged SQL in DuckDB.

Reference scope note: the reference engine partitions samples by QCS and
inherits this exact hot-stratum hazard at scale (SURVEY §2.9 joins); the
operator is the Spark-first mitigation, also reusable under the AQP
join path.
"""

from __future__ import annotations

from ..detrng import hash_sql
from .dual import explode, sequence

_FACT_KEY = ["o_orderkey"]          # primary key -> near-uniform salt


def salted_join_stages(dialect: str, salt_factor: int = 4,
                       heavy_threshold: int = 15, seed: int = 42
                       ) -> tuple[list[tuple[str, str]], str]:
    """Orders (fact, skew-prone ``o_custkey``) ⋈ customer (dim), salted:
    -> (c_mktsegment, n_orders, total_cents), exactly the plain join's
    aggregate. ``heavy_threshold`` is tuned so the heavy branch is
    non-empty on the driver tables at every SF (orders-per-customer p99
    ≈ 18)."""
    s = int(salt_factor)
    fact_salt = f"({hash_sql(_FACT_KEY, seed)} % {s})"
    # each side takes ONE broadcast LEFT JOIN against the tiny heavy-key
    # relation (an IN/NOT IN formulation would expand to three separate
    # semi/anti joins, re-aggregating the fact side each time)
    stages = [
        # heavy keys: one fact-side aggregate, tiny output
        ("__hv",
         f"SELECT o_custkey AS k FROM orders GROUP BY o_custkey "
         f"HAVING COUNT(*) > {int(heavy_threshold)}"),
        # dim replicas: light keys once (salt -1), heavy keys x S via a
        # per-row variable-length sequence explode
        ("__dim_rep",
         f"SELECT c_custkey, c_mktsegment, "
         f"CASE WHEN k IS NULL THEN CAST(-1 AS BIGINT) "
         f"ELSE CAST(sv AS BIGINT) END AS salt "
         f"FROM (SELECT c_custkey, c_mktsegment, k, "
         f"{explode(dialect, sequence(dialect, '0', f'CASE WHEN k IS NULL THEN 0 ELSE {s - 1} END'), 'sv')} "
         f"FROM customer LEFT JOIN __hv ON c_custkey = k) __r"),
        # salted fact: heavy rows get hash(pk) % S, light rows -1
        ("__fact_s",
         f"SELECT o_custkey, "
         f"CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, "
         f"CASE WHEN k IS NULL THEN CAST(-1 AS BIGINT) "
         f"ELSE CAST({fact_salt} AS BIGINT) END AS salt "
         f"FROM orders LEFT JOIN __hv ON o_custkey = k"),
        ("__joined",
         "SELECT d.c_mktsegment, f.cents FROM __fact_s f "
         "JOIN __dim_rep d ON f.o_custkey = d.c_custkey "
         "AND f.salt = d.salt"),
        # _mz (round 11): the final's global ORDER BY range-samples its
        # child, re-executing the aggregate merge above the last exchange
        # a second time per call; the materialized relation is
        # output-sized (one row per market segment)
        ("__sj_mz",
         "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders, "
         "CAST(SUM(cents) AS BIGINT) AS total_cents FROM __joined "
         "GROUP BY c_mktsegment"),
    ]
    final = ("SELECT c_mktsegment, n_orders, total_cents FROM __sj_mz "
             "ORDER BY c_mktsegment")
    return stages, final


def plain_join_sql() -> str:
    """The unsalted equivalent (both engines) — the semantics oracle the
    pytest pins the salted plan against."""
    return ("SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
            "AS total_cents "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment ORDER BY c_mktsegment")
