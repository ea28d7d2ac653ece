"""Statistical accuracy (reference test strategy, SURVEY §5):

  * CI coverage — across independent sampler seeds, [lower, upper] must
    contain the exact answer at roughly the confidence level
    (BootStrapAccuracySuite.scala:307-460 protocol, scaled down)
  * point estimates converge to the exact answer on average
  * closed-form and bootstrap agree: same sample -> same point estimate;
    bounds within a small factor (CompareBootstrapClosedFormSuite analog)
"""

from __future__ import annotations

import dataclasses
import math

import pytest

from snappy_aqp_spark.fixtures import ALL_ERRORS, LI_HASH, _PRICE
from snappy_aqp_spark.plans.approx_query import load_tables, run_approx_query
from snappy_aqp_spark.specs import ApproxAgg, ApproxQuerySpec
from tests.conftest import SF_SMALL

N_SEEDS = 30
CONFIDENCE = 0.95


def _spec(seed: int, estimator: str = "closed_form") -> ApproxQuerySpec:
    sample = dataclasses.replace(LI_HASH, seed=seed, fraction=0.1)
    return ApproxQuerySpec(
        sample=sample,
        aggs=(ApproxAgg("sum", "l_extendedprice", "s", _PRICE, ALL_ERRORS),),
        confidence=CONFIDENCE, estimator=estimator, trials=100)


@pytest.fixture(scope="module")
def exact_sum(duck):
    return float(duck.sql(
        "SELECT SUM(CAST(FLOOR(l_extendedprice * 4.0) AS BIGINT)) / 4.0 "
        "FROM lineitem").fetchone()[0])


@pytest.fixture(scope="module")
def runs(spark, exact_sum):
    tables = load_tables(spark, SF_SMALL, ("lineitem",))
    out = []
    for seed in range(N_SEEDS):
        row = run_approx_query(spark, _spec(seed), tables).collect()[0]
        out.append((row["s"], row["s_lower_bound"], row["s_upper_bound"]))
    return out


@pytest.mark.slow
def test_ci_coverage(runs, exact_sum):
    covered = sum(1 for est, lo, hi in runs if lo <= exact_sum <= hi)
    # binomial(30, 0.95): P(covered < 24) < 1e-4
    assert covered >= 24, f"coverage {covered}/{N_SEEDS} at {CONFIDENCE}"


@pytest.mark.slow
def test_point_estimates_converge(runs, exact_sum):
    mean_est = sum(e for e, _, _ in runs) / len(runs)
    assert abs(mean_est - exact_sum) / exact_sum < 0.03


@pytest.mark.slow
def test_individual_estimates_reasonable(runs, exact_sum):
    for est, _, _ in runs:
        assert abs(est - exact_sum) / exact_sum < 0.25


@pytest.mark.slow
def test_bootstrap_agrees_with_closed_form(spark, exact_sum):
    tables = load_tables(spark, SF_SMALL, ("lineitem",))
    cf = run_approx_query(spark, _spec(7, "closed_form"), tables).collect()[0]
    bs = run_approx_query(spark, _spec(7, "bootstrap"), tables).collect()[0]
    # same sample -> identical Horvitz-Thompson point estimate
    assert cf["s"] == pytest.approx(bs["s"], rel=1e-9)
    cf_width = cf["s_upper_bound"] - cf["s_lower_bound"]
    bs_width = bs["s_upper_bound"] - bs["s_lower_bound"]
    assert 0.3 < bs_width / cf_width < 3.0
    assert bs["s_lower_bound"] < exact_sum < bs["s_upper_bound"]


def test_higher_fraction_tightens_bounds(spark):
    tables = load_tables(spark, SF_SMALL, ("lineitem",))

    def width(fraction):
        sample = dataclasses.replace(LI_HASH, seed=3, fraction=fraction)
        spec = ApproxQuerySpec(
            sample=sample,
            aggs=(ApproxAgg("sum", "l_extendedprice", "s", _PRICE, ALL_ERRORS),),
            confidence=CONFIDENCE)
        r = run_approx_query(spark, spec, tables).collect()[0]
        return r["s_upper_bound"] - r["s_lower_bound"]

    assert width(0.2) < width(0.05)


@pytest.fixture(scope="module")
def rr_runs(spark, exact_sum):
    """reservoir_rand sampler across independent seeds — the seeded
    Algorithm-R mode (StratifiedSamplerReservoir.scala:58-77 semantics;
    SamplingAccuracySuite protocol). reservoir_size ~= 10% of the biggest
    stratum so CI widths are comparable to the fraction harness."""
    tables = load_tables(spark, SF_SMALL, ("lineitem",))
    out = []
    for seed in range(N_SEEDS):
        sample = dataclasses.replace(LI_HASH, seed=seed,
                                     method="reservoir_rand",
                                     reservoir_size=150)
        spec = ApproxQuerySpec(
            sample=sample,
            aggs=(ApproxAgg("sum", "l_extendedprice", "s", _PRICE,
                            ALL_ERRORS),),
            confidence=CONFIDENCE)
        row = run_approx_query(spark, spec, tables).collect()[0]
        out.append((row["s"], row["s_lower_bound"], row["s_upper_bound"]))
    return out


@pytest.mark.slow
def test_reservoir_rand_ci_coverage(rr_runs, exact_sum):
    covered = sum(1 for est, lo, hi in rr_runs if lo <= exact_sum <= hi)
    # binomial(30, 0.95): P(covered < 24) < 1e-4
    assert covered >= 24, f"coverage {covered}/{N_SEEDS} at {CONFIDENCE}"


@pytest.mark.slow
def test_reservoir_rand_point_estimates_converge(rr_runs, exact_sum):
    mean_est = sum(e for e, _, _ in rr_runs) / len(rr_runs)
    assert abs(mean_est - exact_sum) / exact_sum < 0.03


def test_rand_hash_decorrelates_adversarial_keys(duck):
    """the scrambled priority stream must stay uniform when keys stride in
    lockstep with the measure (the adversarial pattern a plain polynomial
    hash can correlate with): selection rate per measure-decile stays near
    the global rate for every seed."""
    from snappy_aqp_spark.detrng import MODULUS, rand_hash_sql
    for seed in (0, 1, 7):
        frag = rand_hash_sql(["k"], seed)
        df = duck.sql(
            "SELECT (r * 64) AS k, r % 10 AS decile, "
            f"CASE WHEN {frag} < {MODULUS // 5} THEN 1 ELSE 0 END AS sel "
            "FROM (SELECT UNNEST(generate_series(0, 19999)) AS r)").df()
        by_decile = df.groupby("decile")["sel"].mean()
        assert abs(df["sel"].mean() - 0.2) < 0.02, seed
        assert ((by_decile - 0.2).abs() < 0.05).all(), (seed, by_decile)


@pytest.mark.slow
def test_quantile_ci_coverage_across_seeds(spark, duck):
    """binomial order-statistic intervals must cover the TRUE median at
    roughly the confidence level across independent sampler seeds (the
    reference's multi-run CI protocol applied to the quantile operator)."""
    from snappy_aqp_spark.dialect import SPARK as _SP
    from snappy_aqp_spark.pipeline.dual import run_stages
    from snappy_aqp_spark.pipeline.quantiles import uniform_quantile_stages
    spark.read.parquet(f"{SF_SMALL}/documents.parquet") \
        .createOrReplaceTempView("documents")
    truth = float(duck.sql(
        "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY length(text)) "
        "FROM documents").fetchone()[0])
    covered = 0
    for seed in range(N_SEEDS):
        st, fin = uniform_quantile_stages(_SP, qs=(0.5,), fraction=0.2,
                                          seed=seed, confidence=CONFIDENCE)
        r = run_stages(spark, st, fin).collect()[0]
        covered += r["lower_bound"] <= truth <= r["upper_bound"]
    # binomial(30, 0.95): P(covered < 24) < 1e-4
    assert covered >= 24, f"coverage {covered}/{N_SEEDS}"


@pytest.fixture(scope="module")
def bs_runs(spark):
    """bootstrap estimator across independent sample seeds
    (BootStrapAccuracySuite protocol, scaled down: the reference averages
    bounds over ~150 runs, :307-460)."""
    tables = load_tables(spark, SF_SMALL, ("lineitem",))
    out = []
    for seed in range(15):
        row = run_approx_query(spark, _spec(seed, "bootstrap"),
                               tables).collect()[0]
        out.append((row["s"], row["s_lower_bound"], row["s_upper_bound"]))
    return out


@pytest.mark.slow
def test_bootstrap_ci_coverage(bs_runs, exact_sum):
    covered = sum(1 for est, lo, hi in bs_runs if lo <= exact_sum <= hi)
    # binomial(15, 0.95): P(covered < 11) < 1e-4
    assert covered >= 11, f"coverage {covered}/15 at {CONFIDENCE}"


@pytest.mark.slow
def test_bootstrap_point_estimates_converge(bs_runs, exact_sum):
    mean_est = sum(e for e, _, _ in bs_runs) / len(bs_runs)
    assert abs(mean_est - exact_sum) / exact_sum < 0.03
    # bootstrap quantile bounds are finite and ordered
    for est, lo, hi in bs_runs:
        assert lo <= est <= hi


@pytest.mark.slow
def test_closed_form_se_matches_empirical_sd(runs):
    """ClosedFormGoldenSDSuite analog: the closed-form predicted standard
    error (CI half-width / z) must match the EMPIRICAL standard deviation
    of the point estimate across independent sampler seeds — an
    independent check of the variance formula itself (the replay oracle
    shares the formula; this test does not). chi-square noise of a
    30-seed SD is ~±25%, plus Bernoulli-vs-SRS slack -> [0.65, 1.5]."""
    import statistics
    z975 = 1.959963984540054
    emp_sd = statistics.stdev(e for e, _, _ in runs)
    pred_se = statistics.mean((hi - lo) / (2 * z975) for _, lo, hi in runs)
    assert 0.65 < emp_sd / pred_se < 1.5, (emp_sd, pred_se)


# --- reference-protocol coverage at sf0.01 (round-8 VERDICT #5) -------------
# BootStrapAccuracySuite.scala:309-318 averages bounds over 150 reruns
# against the exact answer; this is the scaled equivalent: 50 independent
# sampler seeds at the driver's t2 scale, one closed-form and one
# bootstrap harness, asserting the 95% CI covers the exact answer in
# >= ~90% of runs. Randomness is key-hash-derived, so each seed's outcome
# is deterministic — the thresholds are exact regression pins, not flaky
# statistical gates.

N_SEEDS_REF = 50


@pytest.fixture(scope="module")
def exact_sum_medium(duck_medium):
    return float(duck_medium.sql(
        "SELECT SUM(CAST(FLOOR(l_extendedprice * 4.0) AS BIGINT)) / 4.0 "
        "FROM lineitem").fetchone()[0])


@pytest.fixture(scope="module")
def medium_tables(spark):
    from tests.conftest import SF_MEDIUM
    return load_tables(spark, SF_MEDIUM, ("lineitem",))


def _coverage(spark, tables, exact, estimator):
    covered = 0
    for seed in range(N_SEEDS_REF):
        row = run_approx_query(spark, _spec(seed, estimator),
                               tables).collect()[0]
        if row["s_lower_bound"] <= exact <= row["s_upper_bound"]:
            covered += 1
    return covered


@pytest.mark.slow
def test_reference_protocol_ci_coverage_closed_form(spark, medium_tables,
                                                    exact_sum_medium):
    covered = _coverage(spark, medium_tables, exact_sum_medium,
                        "closed_form")
    # binomial(50, 0.95): P(covered < 44) < 4e-3
    assert covered >= 44, f"coverage {covered}/{N_SEEDS_REF}"


@pytest.mark.slow
def test_reference_protocol_ci_coverage_bootstrap(spark, medium_tables,
                                                  exact_sum_medium):
    covered = _coverage(spark, medium_tables, exact_sum_medium, "bootstrap")
    assert covered >= 44, f"coverage {covered}/{N_SEEDS_REF}"


# --- sketch-route error contracts (round-8 VERDICT #5) -----------------------
# The HLL route advertises a-priori bounds est*(1 ± z*1.04/sqrt(m)) and the
# histogram route a hard [lo, hi) bin envelope. Neither was empirically
# swept before — these tests check the ERROR-COLUMN contract itself over 30
# deterministic pseudo-random tables each (population shape, cardinality,
# sign and spread all varied). Key-hash determinism makes every outcome a
# regression pin, not a flaky statistical gate.

N_TABLES = 30


@pytest.mark.slow
def test_hll_route_error_contract_sweep(spark):
    """|est - exact| stays within the advertised bound at the route's
    confidence: across 30 tables the 95% interval [lb, ub] must contain
    the exact COUNT(DISTINCT) in >= 24 (binomial(30,.95): P(<24) < 1e-4),
    and every single estimate within 4 standard errors."""
    from snappy_aqp_spark.dialect import SPARK as _SP
    from snappy_aqp_spark.pipeline.distinct import (
        hll_count_distinct_query_sql)
    p = 10
    se = 1.04 / math.sqrt(1 << p)
    covered = 0
    for i in range(N_TABLES):
        n = 5000 + (i * 2654435761) % 75000          # 5k..80k distinct
        stride = [1, 7, 7919, 104729][i % 4]
        shift = [0, -3_000_000, 11, 10 ** 12][(i // 4) % 4]
        dup = 1 + i % 3                              # 1..3 copies per key
        spark.sql(
            f"SELECT CAST((id % {n}) * {stride} + {shift} AS BIGINT) AS k "
            f"FROM range({n * dup})"
        ).createOrReplaceTempView("__hll_sweep")
        est, lb, ub = spark.sql(hll_count_distinct_query_sql(
            _SP, col="k", table="__hll_sweep", p=p, alias="a",
            err_cols=(("lower_bound", "lb"), ("upper_bound", "ub")),
            confidence=0.95, key_kind="bigint")).collect()[0]
        covered += lb <= n <= ub
        assert abs(est - n) / n < 4 * se, (i, n, est)
    assert covered >= 24, f"coverage {covered}/{N_TABLES}"


@pytest.mark.slow
def test_hll_route_small_cardinality_sweep(spark):
    """BELOW the 2.5*m cutoff (round-9 VERDICT #1): the deterministic
    linear-counting branch must answer — raw HLL is biased low there —
    and its accuracy must beat the route's own advertised bound by a
    wide margin. LC's relative standard error is
    sqrt(m*(e^t - t - 1))/n with t = n/m (Whang et al. 1990), so the
    per-table gate is 5 LC standard errors with an absolute floor of one
    key (a single deterministic bucket collision at tiny n); every
    [lb, ub] from the 1.04/sqrt(m) formula must contain the exact count
    outright (LC only tightens the estimate the bounds wrap)."""
    from snappy_aqp_spark.dialect import SPARK as _SP
    from snappy_aqp_spark.pipeline.distinct import (
        hll_count_distinct_query_sql)
    p = 10
    m = 1 << p
    for i in range(N_TABLES):
        n = 3 + (i * 2654435761) % 2300           # 3..~2.3k << 2.5*m=2560
        stride = [1, 7, 7919, 104729][i % 4]
        shift = [0, -3_000_000, 11, 10 ** 12][(i // 4) % 4]
        spark.sql(
            f"SELECT CAST((id % {n}) * {stride} + {shift} AS BIGINT) AS k "
            f"FROM range({n * (1 + i % 3)})"
        ).createOrReplaceTempView("__hll_lc_sweep")
        est, lb, ub = spark.sql(hll_count_distinct_query_sql(
            _SP, col="k", table="__hll_lc_sweep", p=p, alias="a",
            err_cols=(("lower_bound", "lb"), ("upper_bound", "ub")),
            confidence=0.95, key_kind="bigint")).collect()[0]
        t = n / m
        lc_se = math.sqrt(m * (math.exp(t) - t - 1.0))
        assert abs(est - n) <= max(5 * lc_se, 1.0), (i, n, est)
        assert lb <= n <= ub, (i, n, est, lb, ub)


@pytest.mark.slow
def test_histogram_route_envelope_always_contains_exact(spark):
    """the histogram route's [lower_bound, upper_bound) is a HARD
    envelope: the exact order-statistic quantile (the route's own rank
    definition: smallest value whose cumulative count reaches
    ceil(q*n)) must fall inside it in EVERY run, not at a confidence."""
    from snappy_aqp_spark.dialect import SPARK as _SP
    from snappy_aqp_spark.pipeline.quantiles import (
        histogram_quantile_query_sql)
    for i in range(N_TABLES):
        n = 2000 + (i * 48271) % 20000
        spread = [997, 50021, 13, 100003][i % 4]
        shift = [0, -25000, 7, -1][(i // 4) % 4]
        q = (0.1, 0.5, 0.9, 0.99)[i % 4]
        sql_vals = (f"SELECT CAST((id * 1103515245 + {i * 12345 + 7}) "
                    f"% {spread} + {shift} AS BIGINT) AS v "
                    f"FROM range({n})")
        spark.sql(sql_vals).createOrReplaceTempView("__hq_sweep")
        row = spark.sql(histogram_quantile_query_sql(
            _SP, col="v", table="__hq_sweep", width=25,
            pcts=((q, "est"),),
            err_cols=(("lower_bound", q, "lb"),
                      ("upper_bound", q, "ub")))).collect()[0]
        exact = spark.sql(
            f"SELECT v FROM __hq_sweep ORDER BY v "
            f"LIMIT 1 OFFSET {max(0, math.ceil(q * n) - 1)}"
        ).collect()[0][0]
        assert row["lb"] <= exact < row["ub"], (i, q, exact, dict(
            lb=row["lb"], ub=row["ub"], est=row["est"]))
