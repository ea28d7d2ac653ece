"""Joins of TWO sample tables — the reference's own deferred feature.

JoinQueryRoutingTestSuite.scala carries an @ignore'd "test join of two
sample tables": the reference restricts every approx query to ONE sampled
relation and never shipped the two-sample case. The estimator itself is
classical (public literature: Acharya et al., "Join Synopses for
Approximate Query Answering", SIGMOD'99; Haas & Hellerstein's ripple
join): under independent per-table sampling, each joined pair (a, b)
carries the Horvitz-Thompson weight w_a * w_b, so

    SUM(x)_join  ≈  Σ_pairs  w_a * w_b * x

is unbiased. Closed-form variance for a two-table design is messy (join
multiplicity covariances), so error bounds come from the two-table
POISSON BOOTSTRAP: each trial draws independent Poisson(1) multiplicities
per SIDE (seeded from each side's row keys — deterministic, replayable),
and the per-trial estimate Σ m_a * m_b * w_a * w_b * x resamples both
designs jointly. CI = trial percentiles, the same finalize the one-table
bootstrap uses.

Caveat the operator inherits from the math (and documents rather than
hides): joining two INDEPENDENT uniform samples keeps only f_a * f_b of
the join — CIs are honest but wide at small fractions. Where one side's
keys are contained in the other's (FK joins), prefer the one-sample join
the engine already routes; this operator is for the case the reference
punted on.

Everything is dual-emitted stage SQL: integer-lattice sums (quant.py),
key-derived multiplicities (detrng), BIGINT trial values sorted for the
percentile pick — bit-exact Spark/DuckDB replay.
"""

from __future__ import annotations

import math

from ..detrng import MODULUS, hash_sql
from ..dialect import array_sort, collect_list, dlit, element_at
from ..quant import pow2_literal
from ..sampling.sql import sample_cte_stages
from ..specs import WEIGHT_COL, SampleSpec
from ..stats import poisson1_cdf_thresholds
from .bootstrap import TRIAL_COL

# per-row quantized |w_a*w_b*x| budget: 2^30 keeps (value x m_a*m_b <= 144
# x 6M rows at sf1) far under BIGINT even before sharding further
_TERM_BITS = 30


def _multiplicity(spec: SampleSpec, side_salt: int, prefix: str) -> str:
    """Poisson(1) multiplicity for (row, trial) on one side; trial 0 -> 1.
    Seeded from THAT side's row keys so the two sides resample
    independently (bootstrap.multiplicity_sql with a side-specific
    seed). ``prefix`` is the side's projected column prefix in
    ``__tsj_join`` — key columns are side-prefixed there so the hash
    stays unambiguous even when both specs share a key-column name."""
    h = hash_sql([f"{prefix}{k}" for k in spec.key_cols],
                 seed=spec.seed * 31 + 1709 + side_salt, salt=TRIAL_COL)
    th = poisson1_cdf_thresholds(MODULUS)
    branches = " ".join(f"WHEN {h} < {c} THEN {k}"
                        for k, c in enumerate(th))
    return (f"(CASE WHEN {TRIAL_COL} = 0 THEN 1 {branches} "
            f"ELSE {len(th)} END)")


def two_sample_join_sum_stages(dialect: str, spec_a: SampleSpec,
                               spec_b: SampleSpec, join_on: str,
                               measure: str, group_by: str,
                               out_alias: str = "est",
                               where: str = "", max_abs: float = 1.0e7,
                               trials: int = 100,
                               confidence: float = 0.95,
                               ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)``: per ``group_by`` value — the two-sample HT
    estimate of SUM(measure) over the join, with bootstrap lb/ub and
    relative error. ``join_on``/``measure``/``where`` reference the two
    base tables' columns unqualified (both sides' columns are projected
    into the join stage)."""
    from ..pipeline.dual import explode, sequence
    # Independence guard: the w_a*w_b weight assumes the two inclusion
    # designs are independent. The affine "hash" stream (detrng.hash_sql)
    # maps different seeds to SHIFTED intervals of the same key ordering —
    # two affine samples of the same base table are nested/disjoint, never
    # independent (a self-join would estimate garbage with honest-looking
    # CIs). Nonlinear streams (hash_rand/reservoir_rand) decorrelate seeds.
    _affine = ("hash", "fraction", "reservoir", "error_limit")
    if (spec_a.base_table == spec_b.base_table
            and spec_a.method in _affine and spec_b.method in _affine):
        raise ValueError(
            "two_sample_join_sum_stages: both sides sample "
            f"{spec_a.base_table!r} with affine hash streams — seeds are "
            "shifted intervals, not independent designs. Use method "
            "'hash_rand' (fraction) or 'reservoir_rand' on at least one "
            "side, with distinct seeds.")
    s = _TERM_BITS - max(0, math.ceil(math.log2(max_abs))) - 1
    stages = list(sample_cte_stages(spec_a, "__tsj_a", prefix="tsa_"))
    stages += sample_cte_stages(spec_b, "__tsj_b", prefix="tsb_")
    # side-prefixed key projections: spec_a and spec_b may share key-column
    # names (e.g. a self-join), which would make the unqualified projection
    # ambiguous downstream
    keys_a = ", ".join(f"a.{k} AS __a_{k}" for k in spec_a.key_cols)
    keys_b = ", ".join(f"b.{k} AS __b_{k}" for k in spec_b.key_cols)
    q = (f"CAST(FLOOR(a.{WEIGHT_COL} * b.{WEIGHT_COL} * ({measure}) "
         f"* {pow2_literal(s)}) AS BIGINT)")
    stages.append((
        "__tsj_join",
        f"SELECT {group_by} AS __g, {keys_a}, {keys_b}, {q} AS __q "
        f"FROM __tsj_a a JOIN __tsj_b b ON {join_on}"
        + (f" WHERE {where}" if where else "")))
    if dialect == "spark":
        # trial-unrolled wide aggregate (operators/bootstrap.py::
        # wide_trial_columns, same argument): each side's salt-free key
        # hash is projected ONCE per joined row, the per-trial Poisson
        # multiplicities fold their trial salt to Python constants, and
        # one hash aggregate computes all R+1 integer trial sums — the
        # join relation is scanned once instead of materializing
        # rows x (R+1) into the first aggregate. Trial sums are integer-
        # exact, so this matches the oracle's CROSS JOIN replay bit for
        # bit (pinned by the two_sample fixtures + 10x stress).
        from ..detrng import _MIX, _MUL
        from ..stats import poisson1_cdf_thresholds as _th
        th = _th(MODULUS)

        def base(spec: SampleSpec, side_salt: int, prefix: str) -> str:
            return hash_sql([f"{prefix}{k}" for k in spec.key_cols],
                            seed=spec.seed * 31 + 1709 + side_salt, salt=0)

        def mcase(base_col: str, t: int) -> str:
            if t == 0:
                return "1"
            salt_c = (t * _MIX + 777) % MODULUS
            h = (f"((({base_col} + {salt_c}) * {_MUL} + 99991) "
                 f"% {MODULUS})")
            branches = " ".join(f"WHEN {h} < {c} THEN {k}"
                                for k, c in enumerate(th))
            return f"(CASE {branches} ELSE {len(th)} END)"

        stages.append((
            "__tsj_hb",
            f"SELECT __g, __q, {base(spec_a, 11, '__a_')} AS __hba, "
            f"{base(spec_b, 23, '__b_')} AS __hbb FROM __tsj_join"))
        sums = ", ".join(
            f"SUM({mcase('__hba', t)} * {mcase('__hbb', t)} * __q) "
            f"AS __tq{t}" for t in range(trials + 1))
        stages.append((
            "__tsj_wide",
            f"SELECT __g, {sums} FROM __tsj_hb GROUP BY __g"))
        pairs = ", ".join(f"CAST({t} AS BIGINT), __tq{t}"
                          for t in range(trials + 1))
        stages.append((
            "__tsj_tsum",
            f"SELECT __g, stack({trials + 1}, {pairs}) "
            f"AS ({TRIAL_COL}, __tq) FROM __tsj_wide"))
    else:
        # BIGINT trial index: the multiplicity hash multiplies it by a
        # large prime, which overflows int32 under Spark 4 ANSI mode
        stages.append((
            "__tsj_trials",
            f"SELECT CAST(__ti AS BIGINT) AS {TRIAL_COL} FROM ("
            f"SELECT {explode(dialect, sequence(dialect, '0', str(trials)), '__ti')}"
            + ") __tix"))
        m_a = _multiplicity(spec_a, 11, "__a_")
        m_b = _multiplicity(spec_b, 23, "__b_")
        stages.append((
            "__tsj_tsum",
            f"SELECT __g, {TRIAL_COL}, "
            f"SUM({m_a} * {m_b} * __q) AS __tq "
            f"FROM __tsj_join CROSS JOIN __tsj_trials "
            f"GROUP BY __g, {TRIAL_COL}"))
    coll = collect_list(dialect, "__tq")
    stages.append((
        "__tsj_grp",
        f"SELECT __g, MAX(CASE WHEN {TRIAL_COL} = 0 THEN __tq END) AS __e0, "
        f"{array_sort(dialect, coll + f' FILTER (WHERE {TRIAL_COL} > 0)')} "
        f"AS __vals, "
        f"COUNT(CASE WHEN {TRIAL_COL} > 0 THEN 1 END) AS __n "
        f"FROM __tsj_tsum GROUP BY __g"))
    lower, upper = (1.0 - confidence) / 2.0, (1.0 + confidence) / 2.0
    lb_idx = (f"(CAST(FLOOR(CAST(__n AS DOUBLE) * {dlit(lower)}) AS INT)"
              f" + 1)")
    ub_idx = f"CAST(CEIL(CAST(__n AS DOUBLE) * {dlit(upper)}) AS INT)"
    unscale = pow2_literal(-s)
    est = f"(CAST(__e0 AS DOUBLE) * {unscale})"
    lb = (f"(CAST({element_at(dialect, '__vals', lb_idx)} AS DOUBLE) "
          f"* {unscale})")
    ub = (f"(CAST({element_at(dialect, '__vals', ub_idx)} AS DOUBLE) "
          f"* {unscale})")
    final = (
        f"SELECT __g AS grp, {est} AS {out_alias}, "
        f"{lb} AS {out_alias}_lb, {ub} AS {out_alias}_ub, "
        f"(CASE WHEN {est} = {dlit(0.0)} THEN NULL ELSE "
        f"ABS(({ub} - {lb}) / ({dlit(2.0)} * {est})) END) "
        f"AS {out_alias}_rel "
        f"FROM __tsj_grp ORDER BY grp")
    return stages, final
