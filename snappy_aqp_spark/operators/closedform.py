"""Closed-form (CLT) error-estimated aggregation over stratified samples.

Rebuilds the reference's ``ClosedFormErrorEstimate`` declarative aggregate
(reference: closedform/closedFormError.scala:35-205) and its buffer
``StatCounterWithFullCount`` (closedform/errorEstimates.scala:141-332,
StatCounterAggregator.scala:44-55) as a two-level Spark aggregation:

  inner:  GROUP BY (group keys x stratum) — per-cell count / Σx / Σx²
  outer:  GROUP BY (group keys)           — combine per-stratum variances
  final:  scalar math — point estimate, std dev, z/t confidence factor,
          bounds, relative error, LOCAL_OMIT NaN semantics

Replicated math, per stratum s with full stratum sample size n_s
(``leftWeight``) and observed stratum total N_s (``rightWeight``):

    weightedCount += cell_count * N_s/n_s
    trueSum       += Σx * N_s/n_s
    Sum/Avg: var_s = [Σx²/n_s − (Σx/n_s)²] · N_s(N_s−n_s)/(n_s−1)
    Count:   var_s = (cell_count/n_s)(1 − cell_count/n_s) · N_s(N_s−n_s)/(n_s−1)
    var_s < 0 or NaN → 0 (summableStrataVariance, errorEstimates.scala:282-297)

    estimate: Count → weightedCount; Sum → trueSum; Avg → trueSum/weightedCount
    stdDev: Avg → sqrt(Σvar_s)/weightedCount; else sqrt(Σvar_s)
            (Count with estimate 0 → NaN)
    bound = stdDev · z(conf)            if group sample count ≥ 30
          = stdDev · t_{count−1}(conf)  otherwise      (closedFormError.scala:132-138)
    relErr = |bound/est| if |est|>1 else |bound|/(|est|+1)
    LOCAL_OMIT: relErr > error → estimate NaN (Count → −1), error cols NaN

All aggregation runs in reproducible mode (quant.py): measures are floor-
quantized to integers and cross-stratum sums are lattice sums, so the Spark
result is bit-identical to the single-threaded ANSI-SQL replay in
``oracle_stages`` regardless of partitioning — the basis of the exact
DuckDB correctness oracle, and stable answers under AQE re-planning at scale.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from ..dialect import DUCKDB, SPARK, array_lit, dlit, element_at, nan_literal
from ..quant import measure_scale, pow2_literal, scale_exponent
from ..specs import (STRATA_SAMPLED_COL, STRATA_TOTAL_COL, ApproxAgg,
                     ApproxQuerySpec)
from ..stats import confidence_factors


class ErrorLimitExceededException(RuntimeError):
    """reference: closedform/closedFormError.scala:211 (STRICT behavior)."""


@dataclass(frozen=True)
class AggScales:
    m: int    # measure quantization exponent
    sw: int   # weightedCount lattice exponent
    st: int   # trueSum lattice exponent
    sv: int   # variance lattice exponent


def agg_scales(agg: ApproxAgg, rows_hint: float) -> AggScales:
    m = measure_scale(agg.max_abs)
    sum_bound = max(1.0, agg.max_abs) * rows_hint
    return AggScales(
        m=m,
        sw=scale_exponent(rows_hint),
        st=scale_exponent(sum_bound),
        sv=scale_exponent(sum_bound * sum_bound),
    )


# --- inner stage fragments (aggregate SQL over the filtered sample) ---------

def quantized_measure(measure: str, m: int) -> str:
    return f"CAST(FLOOR(({measure}) * {pow2_literal(m)}) AS BIGINT)"


def decimal_sum(measure: str, dec_scale: int) -> str:
    """Exact order-independent per-stratum sum of a decimal measure: both
    engines sum DECIMAL(38, s) in integer arithmetic; the outer CAST pins the
    result type so Spark and DuckDB agree bit-for-bit."""
    d = f"DECIMAL(38,{dec_scale})"
    return f"CAST(SUM(CAST(({measure}) AS {d})) AS {d})"


def inner_frags(agg: ApproxAgg, sc: AggScales) -> dict[str, str]:
    a = agg.alias
    out: dict[str, str] = {}
    if agg.func in ("min", "max"):
        # bypass aggregate: extremum over raw sample rows, no quantization
        # (MIN/MAX of the same values is already engine-exact)
        fn = agg.func.upper()
        return {f"__mm_{a}": f"CAST({fn}({agg.measure}) AS DOUBLE)"}
    if agg.func == "count_star":
        out[f"__cnt_{a}"] = "CAST(COUNT(*) AS BIGINT)"
    else:
        mq = quantized_measure(agg.measure, sc.m)
        out[f"__cnt_{a}"] = f"CAST(COUNT({agg.measure}) AS BIGINT)"
        if agg.func in ("sum", "avg"):
            if agg.dec_scale is not None:
                # decimal widening path: exact DECIMAL(38, s) stratum sum for
                # the estimate; quantized squares only feed the variance
                out[f"__dsx_{a}"] = decimal_sum(agg.measure, agg.dec_scale)
            else:
                out[f"__sx_{a}"] = f"CAST(SUM({mq}) AS BIGINT)"
            out[f"__sxx_{a}"] = f"CAST(SUM(({mq}) * ({mq})) AS BIGINT)"
    return out


# --- outer stage fragments (per-group quantized combine) --------------------

def _w() -> str:
    return (f"(CAST(__snt AS DOUBLE) / CAST(__sns AS DOUBLE))")


def _cell_terms(agg: ApproxAgg, sc: AggScales) -> dict[str, str]:
    """Per-(group, stratum) double-valued terms, mirrored in both engines."""
    a = agg.alias
    w = _w()
    cnt_d = f"CAST(__cnt_{a} AS DOUBLE)"
    ns_d = "CAST(__sns AS DOUBLE)"
    NS_d = "CAST(__snt AS DOUBLE)"
    mul = f"({NS_d} * ({NS_d} - {ns_d}) / ({ns_d} - 1.0))"
    terms = {"wc": f"({cnt_d} * {w})"}
    if agg.func in ("sum", "avg"):
        unscale = pow2_literal(-sc.m)
        unscale2 = pow2_literal(-2 * sc.m)
        if agg.dec_scale is not None:
            # decimal widening: split the stratum weight snt/sns into its
            # integer part W (handled exactly in decimal arithmetic by
            # outer_frags' __qdt term) and the fractional remainder f < 1;
            # only dsx*f rides the double lattice. Estimates are EXACT for
            # integral weights (e.g. weight 1, HAC full-route) and the
            # residual error is bounded by the lattice granularity otherwise.
            sx_d = f"CAST(__dsx_{a} AS DOUBLE)"
            frac_w = (f"(CAST(__snt % __sns AS DOUBLE) / {ns_d})")
            terms["ts"] = f"({sx_d} * {frac_w})"
        else:
            sx_d = f"(CAST(__sx_{a} AS DOUBLE) * {unscale})"
            terms["ts"] = f"({sx_d} * {w})"
        sxx_d = f"(CAST(__sxx_{a} AS DOUBLE) * {unscale2})"
        sv = f"(({sxx_d} / {ns_d}) - (({sx_d} / {ns_d}) * ({sx_d} / {ns_d})))"
    else:
        sv = f"(({cnt_d} / {ns_d}) * (1.0 - ({cnt_d} / {ns_d})))"
    raw = f"({mul} * {sv})"
    terms["nv"] = (f"(CASE WHEN __sns <= 1 THEN 0.0 "
                   f"WHEN isnan({raw}) OR {raw} < 0.0 THEN 0.0 ELSE {raw} END)")
    return terms


def outer_frags(agg: ApproxAgg, sc: AggScales) -> dict[str, str]:
    a = agg.alias
    if agg.func in ("min", "max"):
        return {f"__mm_{a}": f"{agg.func.upper()}(__mm_{a})"}
    t = _cell_terms(agg, sc)

    def qsum(term: str, s: int) -> str:
        return f"CAST(SUM(CAST(FLOOR(({term}) * {pow2_literal(s)}) AS BIGINT)) AS BIGINT)"

    out = {f"__c_{a}": f"CAST(SUM(__cnt_{a}) AS BIGINT)",
           f"__qwc_{a}": qsum(t["wc"], sc.sw),
           f"__qnv_{a}": qsum(t["nv"], sc.sv)}
    if "ts" in t:
        out[f"__qts_{a}"] = qsum(t["ts"], sc.st)
    if agg.dec_scale is not None and agg.func in ("sum", "avg"):
        # exact part of the weighted sum: dsx * floor(snt/sns), summed in
        # DECIMAL(38, s) integer arithmetic (order-independent; both engines
        # agree bit-for-bit — overflow past 38 digits raises under ANSI,
        # mirroring the reference's bounded widening)
        d = f"DECIMAL(38,{agg.dec_scale})"
        w_int = "CAST((__snt - (__snt % __sns)) / __sns AS BIGINT)"
        out[f"__qdt_{a}"] = (f"CAST(SUM(CAST((__dsx_{a} * {w_int}) AS {d})) "
                             f"AS {d})")
    return out


# --- final stage fragments ---------------------------------------------------

def fin_est_frags(agg: ApproxAgg, sc: AggScales, confidence: float,
                  dialect: str) -> dict[str, str]:
    """estimate + confidence bound per agg, from outer-stage columns."""
    a = agg.alias
    if agg.func in ("min", "max"):
        # ByPassErrorCalc: the estimate IS the sample extremum, zero bound
        return {f"__est_{a}": f"__mm_{a}",
                f"__bnd_{a}": "CAST(0.0 AS DOUBLE)"}
    z, ts_table = confidence_factors(confidence)
    wc = f"(CAST(__qwc_{a} AS DOUBLE) * {pow2_literal(-sc.sw)})"
    nv = f"(CAST(__qnv_{a} AS DOUBLE) * {pow2_literal(-sc.sv)})"
    c = f"__c_{a}"
    if agg.func in ("sum", "avg"):
        tsum = f"(CAST(__qts_{a} AS DOUBLE) * {pow2_literal(-sc.st)})"
        if agg.dec_scale is not None:
            # exact integer-weight part + lattice fractional residual
            tsum = f"(CAST(__qdt_{a} AS DOUBLE) + {tsum})"
    if agg.func == "sum":
        est = f"(CASE WHEN {c} = 0 THEN NULL ELSE {tsum} END)"
        sd = f"SQRT({nv})"
    elif agg.func == "avg":
        est = f"(CASE WHEN {c} = 0 THEN NULL ELSE {tsum} / {wc} END)"
        sd = f"(CASE WHEN {c} = 0 THEN NULL ELSE SQRT({nv}) / {wc} END)"
    else:  # count / count_star: estimate = weightedCount; 0 -> NaN stddev
        est = wc
        sd = f"(CASE WHEN {wc} = 0.0 THEN {nan_literal()} ELSE SQRT({nv}) END)"
    t_arr = array_lit(dialect, [dlit(v) for v in ts_table])
    t_idx = f"GREATEST(LEAST({c} - 1, {len(ts_table)}), 1)"
    factor = (f"(CASE WHEN {c} >= 30 THEN {dlit(z)} "
              f"ELSE {element_at(dialect, t_arr, t_idx)} END)")
    return {f"__est_{a}": est, f"__bnd_{a}": f"({sd} * {factor})"}


def fin_rel_frags(agg: ApproxAgg) -> dict[str, str]:
    """relative error per agg, from the __est/__bnd columns of the previous
    stage (closedFormError.scala:142-156: clamp |est|<=1 by +1)."""
    a = agg.alias
    e, b = f"__est_{a}", f"__bnd_{a}"
    return {f"__rel_{a}": (
        f"(CASE WHEN {e} IS NULL THEN NULL "
        f"WHEN {e} < -1.0 OR {e} > 1.0 THEN ABS({b} / {e}) "
        f"ELSE ABS({b} / (ABS({e}) + 1.0)) END)")}


def omitted_cond(agg: ApproxAgg, error: float) -> str:
    r = f"__rel_{agg.alias}"
    return f"({r} IS NOT NULL AND NOT isnan({r}) AND {r} > {dlit(error)})"


def output_frags(agg: ApproxAgg, spec: ApproxQuerySpec) -> dict[str, str]:
    """visible output columns for one agg (estimate + requested error fns)."""
    a = agg.alias
    e, b, r = f"__est_{a}", f"__bnd_{a}", f"__rel_{a}"
    nan = nan_literal()
    if spec.behavior == "local_omit":
        om = omitted_cond(agg, spec.error)
        omit_est = "-1.0" if agg.func in ("count", "count_star") else nan
        out = {a: f"(CASE WHEN {om} THEN {omit_est} ELSE {e} END)"}
        err_val = {
            "absolute_error": f"(CASE WHEN {om} THEN {nan} ELSE ABS({b}) END)",
            "relative_error": f"(CASE WHEN {om} THEN {nan} ELSE {r} END)",
            "lower_bound": f"(CASE WHEN {om} THEN {nan} ELSE {e} - {b} END)",
            "upper_bound": f"(CASE WHEN {om} THEN {nan} ELSE {e} + {b} END)",
        }
    else:
        out = {a: e}
        err_val = {
            "absolute_error": f"ABS({b})",
            "relative_error": r,
            "lower_bound": f"({e} - {b})",
            "upper_bound": f"({e} + {b})",
        }
    for fn in agg.errors:
        out[f"{a}_{fn}"] = err_val[fn]
    return out


# --- exact (base-table) replica for HAC routing ------------------------------

def exact_output_frags(agg: ApproxAgg, sc: AggScales) -> dict[str, str]:
    """Exact aggregate in reproducible mode, with constant-folded error fns.

    On every exact route the reference's observable contract (the assertion
    protocol of QueryRoutingTestSuite.scala:142-143, 250-251, 290-291,
    554-557 — unsupported aggregates, MIN/MAX, COUNT DISTINCT and
    RUN_ON_FULL_TABLE reroutes alike) is: ``lower_bound``/``upper_bound``
    evaluate to NULL and ``absolute_error``/``relative_error`` to 0.0
    (routing hook common/QueryRoutingRules.scala:370-404)."""
    a = agg.alias
    if agg.func in ("min", "max"):
        est = f"CAST({agg.func.upper()}({agg.measure}) AS DOUBLE)"
    elif agg.func == "count_star":
        est = "CAST(COUNT(*) AS DOUBLE)"
    elif agg.func == "count":
        est = f"CAST(COUNT({agg.measure}) AS DOUBLE)"
    else:
        mq = quantized_measure(agg.measure, sc.m)
        if agg.dec_scale is not None:
            s = f"CAST({decimal_sum(agg.measure, agg.dec_scale)} AS DOUBLE)"
        else:
            s = f"(CAST(SUM({mq}) AS DOUBLE) * {pow2_literal(-sc.m)})"
        est = (f"(CASE WHEN COUNT({agg.measure}) = 0 THEN NULL ELSE {s} END)"
               if agg.func == "sum" else
               f"(CASE WHEN COUNT({agg.measure}) = 0 THEN NULL "
               f"ELSE {s} / CAST(COUNT({agg.measure}) AS DOUBLE) END)")
    out = {a: est}
    err_val = {"absolute_error": "CAST(0.0 AS DOUBLE)",
               "relative_error": "CAST(0.0 AS DOUBLE)",
               "lower_bound": "CAST(NULL AS DOUBLE)",
               "upper_bound": "CAST(NULL AS DOUBLE)"}
    for fn in agg.errors:
        out[f"{a}_{fn}"] = err_val[fn]
    return out
