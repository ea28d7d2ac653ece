"""Join-strategy snapshots of the deepest-join fixtures (PLANS.md claims
as executable assertions — round-5 VERDICT #9).

Every approx-query join in this engine is dimension-sized on one side by
construction (samples are small; dims are small; subquery results are
key lists), so the plan this engine WANTS is all-BroadcastHashJoin with
zero CartesianProduct / BroadcastNestedLoopJoin and zero SortMergeJoin.
A planner regression — e.g. a relation outgrowing
spark.sql.autoBroadcastJoinThreshold after a sampling change, or a join
condition degrading to a cross product after an alias-planning change —
fails these loudly instead of surfacing as a silent 100x at scale.

Counts are of the EXECUTED plan (collect first, so AQE's final plan is
what is asserted — the same plan a cluster would run)."""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL


def _executed_plan(df) -> str:
    df.collect()        # finalize AQE
    return df._jdf.queryExecution().executedPlan().toString()


def _counts(plan: str) -> dict[str, int]:
    return {
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "cartesian": len(re.findall(r"\bCartesianProduct\b", plan)),
        "bnl": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
    }


# Snapshots of the EXECUTED plan's operator counts (node names in the
# physical-plan string — higher than PLANS.md's logical-join counts
# because the two-level stat lattice re-joins and the partial-route union
# replan the same logical joins per subtree). CartesianProduct is 0
# everywhere, always. Designed-in exceptions:
#   - bootstrap/two-sample fixtures CROSS-join the tiny broadcast TRIALS
#     relation (a row multiplier, not a pairwise blowup) — that plans as
#     BroadcastNestedLoopJoin and is the plan we want at any scale;
#   - partial-route fixtures aggregate the UNSAMPLED base remainder
#     exactly; its fact-x-fact join legitimately sorts-merges.
_SHAPES = {
    # PLANS.md logical audit "3x BHJ": dim join + the per-stratum lattice
    # re-joins = 6 BHJ nodes in the executed plan
    "cf_join_orders": dict(exact_bhj=6),
    # PLANS.md logical audit "7x BHJ": doubled by the oracle-visible
    # two-level estimate join-back = 14 nodes
    "sql_q5_multijoin": dict(exact_bhj=14),
    # derived-table per-tree samples joined back by group key
    "sql_derived_agg_join": dict(min_bhj=1),
    # alias-preserving planning with duplicate-column dedup (r5 fix)
    "sql_alias_qualified_where": dict(min_bhj=1),
    # two independently-sampled relations joined on the key; 2 BNL = the
    # two sides' broadcast trials cross-joins
    "two_sample_join_sum": dict(min_bhj=2, max_bnl=2),
    # sampled fact x dims + IN-subquery key list, partial-route union:
    # the base-remainder side may sort-merge its fact join
    "sql_partial_route_join": dict(min_bhj=2, max_smj=1),
}


@pytest.mark.parametrize("name", sorted(_SHAPES))
def test_join_strategy_snapshot(spark, name):
    qs = entrymod.queries()
    df = qs[name](spark, SF_SMALL)
    c = _counts(_executed_plan(df))
    shape = _SHAPES[name]
    assert c["cartesian"] == 0, (name, c)
    assert c["bnl"] <= shape.get("max_bnl", 0), (name, c)
    assert c["smj"] <= shape.get("max_smj", 0), (name, c)
    if "exact_bhj" in shape:
        assert c["bhj"] == shape["exact_bhj"], (name, c)
    else:
        assert c["bhj"] >= shape["min_bhj"], (name, c)


def test_hll_route_shuffle_is_register_bounded(spark):
    """The HLL COUNT(DISTINCT) route's plan must be scan -> partial agg
    -> m-bounded register exchange -> finalize: NO join operator at all,
    and the register aggregation map-side combines (a partial_max
    HashAggregate below the exchange) so the shuffle carries at most
    m rows per group regardless of input size."""
    plan = _executed_plan(
        entrymod.queries()["sql_count_distinct_hll"](spark, SF_SMALL))
    c = _counts(plan)
    assert sum(c.values()) == 0, c               # pure aggregate pipeline
    assert "partial_max" in plan                 # map-side register combine


def test_histogram_route_window_partitions_on_group(spark):
    """The grouped percentile route's cumulative window must PARTITION BY
    the group key — a global ORDER BY window would be a single-partition
    sort of the bin relation at scale."""
    plan = _executed_plan(
        entrymod.queries()["sql_histogram_quantile_route_grouped"](
            spark, SF_SMALL))
    # every windowspecdefinition opens with the group key -> the
    # cumulative sums distribute across groups
    specs = re.findall(r"windowspecdefinition\((\w+)", plan)
    assert specs and all(s.startswith("source") for s in specs), specs
    # bin build map-side combines before the bin exchange
    assert "partial_count" in plan
    c = _counts(plan)
    assert c["cartesian"] == 0 and c["smj"] == 0, c
