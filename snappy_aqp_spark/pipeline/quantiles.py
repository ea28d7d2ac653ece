"""Approximate quantiles from a uniform hash-sample, with distribution-free
confidence intervals.

The reference approximates only SUM/AVG/COUNT (the closed-form/bootstrap
families); corpus statistics pipelines also need percentiles (document
length p50/p95/p99, token-count tails) where an exact sort of 100 TB is the
bottleneck. This operator estimates quantiles from a key-hash uniform
sample (``detrng.hash_sql`` — deterministic, partition-independent) and
bounds them with the classic distribution-free binomial order-statistic
interval: for sample size n, the true q-quantile lies between order
statistics ``floor(nq - z*sqrt(nq(1-q)))`` and ``ceil(nq + z*sqrt(nq(1-q)))``
with ~``confidence`` coverage (normal approximation to Binomial(n, q) —
Conover, Practical Nonparametric Statistics, §3.2).

A UNIFORM sample (not stratified) is the right design here: equal weights
make the plain order statistic the estimator, so every ranking step is
INTEGER arithmetic — deterministic on any engine/partitioning. The few
double expressions (index bounds) are scalar formulas on exact integers,
identical text in both dialects. At scale: one hash-filtered scan, one
sort of fraction*N rows (the whole point), three small rank joins.
"""

from __future__ import annotations

from ..detrng import hash_sql, threshold_for_fraction
from ..dialect import dlit
from ..stats import normal_ppf


def uniform_quantile_stages(dialect: str, col: str = "length(text)",
                            key_cols: tuple[str, ...] = ("doc_id",),
                            table: str = "documents",
                            qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                            fraction: float = 0.2, seed: int = 42,
                            confidence: float = 0.95
                            ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per q: (q, estimate, lower_bound,
    upper_bound, n_sample)."""
    thr = threshold_for_fraction(fraction)
    h = hash_sql(list(key_cols), seed)
    keys = ", ".join(key_cols)
    z = normal_ppf(0.5 + confidence / 2.0)
    stages = [
        ("__uqs",
         f"SELECT {keys}, CAST({col} AS DOUBLE) AS val FROM {table} "
         f"WHERE {h} < {thr}"),
        ("__uqn", "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM __uqs"),
        ("__uqr",
         f"SELECT val, ROW_NUMBER() OVER (ORDER BY val, {keys}) AS rn "
         f"FROM __uqs"),
    ]
    # per-q order-statistic indices (scalar double formulas on the exact n)
    parts = []
    for q in qs:
        ql, hw = dlit(q), f"{dlit(z)} * SQRT(CAST(n AS DOUBLE) * {dlit(q)} * {dlit(1.0 - q)})"
        mid = f"CAST(n AS DOUBLE) * {ql}"
        parts.append(
            f"SELECT {ql} AS q, "
            f"GREATEST(CAST(1 AS BIGINT), CAST(CEIL({mid}) AS BIGINT)) AS ei, "
            f"GREATEST(CAST(1 AS BIGINT), CAST(FLOOR({mid} - {hw}) AS BIGINT)) AS li, "
            f"LEAST(n, CAST(CEIL({mid} + {hw}) AS BIGINT)) AS hi, n "
            f"FROM __uqn")
    stages.append(("__uqi", " UNION ALL ".join(parts)))
    final = ("SELECT i.q, e.val AS estimate, l.val AS lower_bound, "
             "h.val AS upper_bound, i.n AS n_sample "
             "FROM __uqi i JOIN __uqr e ON e.rn = i.ei "
             "JOIN __uqr l ON l.rn = i.li "
             "JOIN __uqr h ON h.rn = i.hi ORDER BY i.q")
    return stages, final


def grouped_quantile_stages(dialect: str, col: str = "length(text)",
                            group_by: str = "lang",
                            key_cols: tuple[str, ...] = ("doc_id",),
                            table: str = "documents",
                            qs: tuple[float, ...] = (0.5, 0.9),
                            fraction: float = 0.3, seed: int = 42,
                            confidence: float = 0.95
                            ) -> tuple[list[tuple[str, str]], str]:
    """Per-group variant: one row per (group, q) with the same
    order-statistic estimate + binomial CI, ranks windowed PER GROUP.

    Scale: one hash-filtered scan, one shuffle on the group key shared by
    the count, the rank window, and the joins (hashpartitioning(g)
    satisfies every clustering containing g). Degenerate strata are
    handled by the GREATEST/LEAST clamps: a 1-row group returns that row
    for estimate and both bounds."""
    thr = threshold_for_fraction(fraction)
    h = hash_sql(list(key_cols), seed)
    keys = ", ".join(key_cols)
    z = normal_ppf(0.5 + confidence / 2.0)
    stages = [
        ("__gqs",
         f"SELECT {group_by} AS g, {keys}, CAST({col} AS DOUBLE) AS val "
         f"FROM {table} WHERE {h} < {thr}"),
        ("__gqn",
         "SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM __gqs GROUP BY g"),
        ("__gqr",
         f"SELECT g, val, ROW_NUMBER() OVER "
         f"(PARTITION BY g ORDER BY val, {keys}) AS rn FROM __gqs"),
    ]
    parts = []
    for q in qs:
        ql = dlit(q)
        hw = (f"{dlit(z)} * SQRT(CAST(n AS DOUBLE) * {ql} * "
              f"{dlit(1.0 - q)})")
        mid = f"CAST(n AS DOUBLE) * {ql}"
        parts.append(
            f"SELECT g, {ql} AS q, "
            f"GREATEST(CAST(1 AS BIGINT), CAST(CEIL({mid}) AS BIGINT)) AS ei, "
            f"GREATEST(CAST(1 AS BIGINT), CAST(FLOOR({mid} - {hw}) AS BIGINT)) AS li, "
            f"LEAST(n, CAST(CEIL({mid} + {hw}) AS BIGINT)) AS hi, n "
            f"FROM __gqn")
    stages.append(("__gqi", " UNION ALL ".join(parts)))
    final = ("SELECT i.g AS stratum, i.q, e.val AS estimate, "
             "l.val AS lower_bound, h.val AS upper_bound, i.n AS n_sample "
             "FROM __gqi i JOIN __gqr e ON e.g = i.g AND e.rn = i.ei "
             "JOIN __gqr l ON l.g = i.g AND l.rn = i.li "
             "JOIN __gqr h ON h.g = i.g AND h.rn = i.hi "
             "ORDER BY stratum, i.q")
    return stages, final
