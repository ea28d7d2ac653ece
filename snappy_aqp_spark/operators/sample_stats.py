"""SampleDataFrame contract: per-stratum statistics and quick CI estimates.

Rebuilds ``SampleDataFrameContractImpl`` (sql/SampleDataFrameContractImpl.scala:33):
  * ``errorStats``           (:55)  — per-QCS StatCounter map: count, mean,
                                      stddev, weighted count
  * ``errorEstimateAverage`` (:119) — weighted mean with Student-t/z CI and
                                      relative error at a confidence level

Operates directly on a sample DataFrame carrying the hidden weight columns;
all math follows the closed-form estimator conventions (quantized integer
sums -> mirrored double formulas), so both functions replay exactly on the
oracle via the matching ``*_oracle_stages`` emitters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..dialect import DUCKDB, SPARK, array_lit, dlit, element_at
from ..quant import measure_scale, pow2_literal
from ..specs import STRATA_SAMPLED_COL, STRATA_TOTAL_COL
from ..stats import confidence_factors


def _stat_frags(measure: str, max_abs: float) -> dict[str, str]:
    m = measure_scale(max_abs)
    mq = f"CAST(FLOOR(({measure}) * {pow2_literal(m)}) AS BIGINT)"
    return {
        "__scnt": f"CAST(COUNT({measure}) AS BIGINT)",
        "__ssx": f"CAST(SUM({mq}) AS BIGINT)",
        "__ssxx": f"CAST(SUM(({mq}) * ({mq})) AS BIGINT)",
        "__sns": f"MAX({STRATA_SAMPLED_COL})",
        "__snt": f"MAX({STRATA_TOTAL_COL})",
    }


def _stat_final(max_abs: float) -> dict[str, str]:
    m = measure_scale(max_abs)
    cnt = "CAST(__scnt AS DOUBLE)"
    mean = f"(CAST(__ssx AS DOUBLE) * {pow2_literal(-m)} / {cnt})"
    var = (f"(CAST(__ssxx AS DOUBLE) * {pow2_literal(-2 * m)} / {cnt} "
           f"- {mean} * {mean})")
    w = "(CAST(__snt AS DOUBLE) / CAST(__sns AS DOUBLE))"
    return {
        "count": "__scnt",
        "mean": f"(CASE WHEN __scnt = 0 THEN NULL ELSE {mean} END)",
        "stddev": (f"(CASE WHEN __scnt = 0 THEN NULL "
                   f"ELSE SQRT(GREATEST({var}, {dlit(0.0)})) END)"),
        "weighted_count": f"({cnt} * {w})",
    }


def error_stats(sample_df: DataFrame, measure: str, qcs: list[str],
                max_abs: float = 2.0 ** 20) -> DataFrame:
    """per-stratum StatCounter rows (errorStats analog)."""
    df = sample_df
    qcols = []
    for i, q in enumerate(qcs):
        df = df.withColumn(f"__eq{i}", F.expr(q))
        qcols.append(f"__eq{i}")
    agg = df.groupBy(*qcols).agg(
        *[F.expr(s).alias(n) for n, s in _stat_frags(measure, max_abs).items()])
    sel = [F.col(c).alias(q) for c, q in zip(qcols, qcs)]
    sel += [F.expr(s).alias(n) for n, s in _stat_final(max_abs).items()]
    return agg.select(*sel)


def error_stats_oracle(sample_stages, measure: str, qcs: list[str],
                       max_abs: float = 2.0 ** 20) -> str:
    from ..sampling.sql import stages_to_sql
    frags = _stat_frags(measure, max_abs)
    qsel = ", ".join(qcs)
    inner = (f"SELECT {qsel}, "
             + ", ".join(f"{s} AS {n}" for n, s in frags.items())
             + f" FROM __sample GROUP BY {qsel}")
    fin = _stat_final(max_abs)
    outer = (f"SELECT {qsel}, "
             + ", ".join(f"{s} AS {n}" for n, s in fin.items())
             + f" FROM ({inner}) __i")
    return stages_to_sql(sample_stages, outer)


def _ci_scales(max_abs: float, rows_hint: float) -> tuple[int, int, int]:
    """lattice exponents (weighted-count, sum, variance) derived from the
    measure bound and expected row count — the same rule as
    closedform.agg_scales, so __qnv (~ N_s^2 * var) cannot overflow BIGINT
    under Spark 4 ANSI mode for large strata."""
    from ..quant import scale_exponent
    sum_bound = max(1.0, max_abs) * rows_hint
    return (scale_exponent(rows_hint), scale_exponent(sum_bound),
            scale_exponent(sum_bound * sum_bound))


def _avg_ci_final(max_abs: float, confidence: float, dialect: str,
                  rows_hint: float) -> dict[str, str]:
    """weighted average + CLT bound from global quantized sums.

    Uses the same per-stratum conditional-variance formula as the
    closed-form AVG estimator (operators/closedform.py)."""
    sw, st, sv = _ci_scales(max_abs, rows_hint)
    z, ts_table = confidence_factors(confidence)
    wc = f"(CAST(__qwc AS DOUBLE) * {pow2_literal(-sw)})"
    tsum = f"(CAST(__qts AS DOUBLE) * {pow2_literal(-st)})"
    nv = f"(CAST(__qnv AS DOUBLE) * {pow2_literal(-sv)})"
    est = f"(CASE WHEN __c = 0 THEN NULL ELSE {tsum} / {wc} END)"
    sd = f"(CASE WHEN __c = 0 THEN NULL ELSE SQRT({nv}) / {wc} END)"
    t_arr = array_lit(dialect, [dlit(v) for v in ts_table])
    t_idx = f"GREATEST(LEAST(__c - 1, {len(ts_table)}), 1)"
    factor = (f"(CASE WHEN __c >= 30 THEN {dlit(z)} "
              f"ELSE {element_at(dialect, t_arr, t_idx)} END)")
    bound = f"({sd} * {factor})"
    rel = (f"(CASE WHEN {est} IS NULL THEN NULL "
           f"WHEN {est} < {dlit(-1.0)} OR {est} > {dlit(1.0)} "
           f"THEN ABS({bound} / {est}) "
           f"ELSE ABS({bound} / (ABS({est}) + {dlit(1.0)})) END)")
    return {"mean": est, "stddev": sd, "lower_bound": f"({est} - {bound})",
            "upper_bound": f"({est} + {bound})", "relative_error": rel}


def _avg_ci_outer(measure: str, max_abs: float,
                  rows_hint: float) -> tuple[dict[str, str], dict[str, str]]:
    s_wc, s_ts, s_nv = _ci_scales(max_abs, rows_hint)
    m = measure_scale(max_abs)
    inner = _stat_frags(measure, max_abs)
    w = "(CAST(__snt AS DOUBLE) / CAST(__sns AS DOUBLE))"
    ns_d, NS_d = "CAST(__sns AS DOUBLE)", "CAST(__snt AS DOUBLE)"
    sx_d = f"(CAST(__ssx AS DOUBLE) * {pow2_literal(-m)})"
    sxx_d = f"(CAST(__ssxx AS DOUBLE) * {pow2_literal(-2 * m)})"
    mul = f"({NS_d} * ({NS_d} - {ns_d}) / ({ns_d} - 1.0))"
    sv = f"(({sxx_d} / {ns_d}) - (({sx_d} / {ns_d}) * ({sx_d} / {ns_d})))"
    raw = f"({mul} * {sv})"
    nv_term = (f"(CASE WHEN __sns <= 1 THEN 0.0 "
               f"WHEN isnan({raw}) OR {raw} < 0.0 THEN 0.0 ELSE {raw} END)")

    def q(term, s):
        return (f"CAST(SUM(CAST(FLOOR(({term}) * {pow2_literal(s)}) AS BIGINT)) "
                f"AS BIGINT)")

    outer = {
        "__c": "CAST(SUM(__scnt) AS BIGINT)",
        "__qwc": q(f"(CAST(__scnt AS DOUBLE) * {w})", s_wc),
        "__qts": q(f"({sx_d} * {w})", s_ts),
        "__qnv": q(nv_term, s_nv),
    }
    return inner, outer


def error_estimate_average(sample_df: DataFrame, measure: str, qcs: list[str],
                           confidence: float = 0.95,
                           max_abs: float = 2.0 ** 20,
                           rows_hint: float = 2.0 ** 20) -> DataFrame:
    """single-row weighted average with CI (errorEstimateAverage analog)."""
    inner_frags, outer_frags = _avg_ci_outer(measure, max_abs, rows_hint)
    df = sample_df
    qcols = []
    for i, q in enumerate(qcs):
        df = df.withColumn(f"__eq{i}", F.expr(q))
        qcols.append(f"__eq{i}")
    inner = df.groupBy(*qcols).agg(
        *[F.expr(s).alias(n) for n, s in inner_frags.items()])
    outer = inner.groupBy().agg(
        *[F.expr(s).alias(n) for n, s in outer_frags.items()])
    fin = _avg_ci_final(max_abs, confidence, SPARK, rows_hint)
    return outer.select(*[F.expr(s).alias(n) for n, s in fin.items()])


def error_estimate_average_oracle(sample_stages, measure: str, qcs: list[str],
                                  confidence: float = 0.95,
                                  max_abs: float = 2.0 ** 20,
                                  rows_hint: float = 2.0 ** 20) -> str:
    from ..sampling.sql import stages_to_sql
    inner_frags, outer_frags = _avg_ci_outer(measure, max_abs, rows_hint)
    qsel = ", ".join(qcs)
    inner = (f"SELECT {qsel}, "
             + ", ".join(f"{s} AS {n}" for n, s in inner_frags.items())
             + f" FROM __sample GROUP BY {qsel}")
    outer = ("SELECT "
             + ", ".join(f"{s} AS {n}" for n, s in outer_frags.items())
             + f" FROM ({inner}) __i")
    fin = _avg_ci_final(max_abs, confidence, DUCKDB, rows_hint)
    final = ("SELECT "
             + ", ".join(f"{s} AS {n}" for n, s in fin.items())
             + f" FROM ({outer}) __o")
    return stages_to_sql(sample_stages, final)


# --- weighted sample quantiles ---------------------------------------------

def _wq_frags(measure: str, key_cols: list[str],
              qs: tuple[float, ...], dialect: str,
              group_by: str | None = None) -> tuple[str, str, str, str]:
    """(ordered-cum SQL, total SQL, q-spine SQL, final SQL) over a __wq
    source relation ([g,] val, w, tiebreak keys). The cumulative weight
    runs in the DEFINED window order (val, keys), so the double adds
    happen in one fixed sequence — bit-identical on any
    engine/partitioning; the total is MAX(cum) (order-independent),
    never a free-order double SUM. With ``group_by`` every window
    PARTITIONs on g — which also distributes the sort across executors
    (the grouped form has no single-partition stage at all)."""
    keys = ", ".join(key_cols)
    g_col = "g, " if group_by else ""
    part = "PARTITION BY g " if group_by else ""
    cum = (f"SELECT {g_col}val, SUM(w) OVER ({part}ORDER BY val, {keys} "
           f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum "
           f"FROM __wq")
    tot = (f"SELECT {g_col}val, cum, MAX(cum) OVER ("
           + (part.rstrip() if group_by else "PARTITION BY 1")
           + ") AS total FROM __wqc")
    q_arr = array_lit(dialect, [dlit(q) for q in qs])
    from ..pipeline import dual
    spine = (f"SELECT {dual.explode(dialect, q_arr, 'q')} "
             f"FROM (SELECT 1) __one")
    g_out = "r.g, " if group_by else ""
    final = (f"SELECT {g_out}q.q, MIN(r.val) AS est "
             f"FROM __wqq q JOIN __wqt r ON r.cum >= q.q * r.total "
             f"GROUP BY {g_out}q.q ORDER BY {g_out}q.q")
    return cum, tot, spine, final


def approx_quantile(sample_df: DataFrame, measure: str,
                    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                    key_cols: tuple[str, ...] = (),
                    group_by: str | None = None) -> DataFrame:
    """Weighted quantiles over a STRATIFIED sample: the q-quantile
    estimate is the smallest sample value whose cumulative Horvitz-
    Thompson weight reaches q of the total weight — the estimator the
    reference's sample tables imply but never shipped (its quantile
    surface routed exact; SURVEY §2.9). One window sort of the SAMPLE
    (fraction*N rows — the whole point at 100 TB). ``key_cols`` break
    value ties deterministically so the cumulative order (and therefore
    every double add) is fixed.

    Scale note: an unpartitioned cumulative window funnels the sample
    through ONE partition — fine for the sample sizes this targets
    (0.01-1% of the base); when even the sample is too big for one
    executor, use the mergeable ``pipeline.quantiles
    .histogram_quantile_stages`` (bin counts, no global sort) as the
    scale path and this estimator for the exact-on-sample answer."""
    from ..specs import WEIGHT_COL
    from ..dialect import SPARK as _S
    spark = sample_df.sparkSession
    guard = f"({measure}) IS NOT NULL"
    sel = [f"CAST({measure} AS DOUBLE) AS val", f"{WEIGHT_COL} AS w",
           *key_cols]
    if group_by:
        guard += f" AND ({group_by}) IS NOT NULL"
        sel.insert(0, f"{group_by} AS g")
    src = sample_df.where(F.expr(guard)).selectExpr(*sel)
    cum, tot, spine, final = _wq_frags(measure, list(key_cols), qs, _S,
                                       group_by)
    # per-call unique view names (round-6 ADVICE): two sessions sharing
    # one SparkSession must not clobber each other's intermediate views
    # between createOrReplaceTempView and the final spark.sql
    import re as _re
    import uuid as _uuid
    tok = _uuid.uuid4().hex[:8]
    ren = _re.compile(r"\b(__wq[ctq]?)\b")
    cum, tot, spine, final = (ren.sub(rf"\1_{tok}", s)
                              for s in (cum, tot, spine, final))
    src.createOrReplaceTempView(f"__wq_{tok}")
    spark.sql(cum).createOrReplaceTempView(f"__wqc_{tok}")
    spark.sql(tot).createOrReplaceTempView(f"__wqt_{tok}")
    spark.sql(spine).createOrReplaceTempView(f"__wqq_{tok}")
    return spark.sql(final)


def approx_quantile_oracle(sample_stages, measure: str,
                           qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                           key_cols: tuple[str, ...] = (),
                           group_by: str | None = None) -> str:
    from ..sampling.sql import stages_to_sql
    from ..specs import WEIGHT_COL
    cum, tot, spine, final = _wq_frags(measure, list(key_cols), qs, DUCKDB,
                                       group_by)
    keys = ", ".join(key_cols)
    g_sel = f"{group_by} AS g, " if group_by else ""
    guard = f"({measure}) IS NOT NULL"
    if group_by:
        guard += f" AND ({group_by}) IS NOT NULL"
    stages = list(sample_stages) + [
        ("__wq",
         f"SELECT {g_sel}CAST({measure} AS DOUBLE) AS val, "
         f"{WEIGHT_COL} AS w, {keys} FROM __sample WHERE {guard}"),
        ("__wqc", cum), ("__wqt", tot), ("__wqq", spine),
    ]
    return stages_to_sql(stages, final)
