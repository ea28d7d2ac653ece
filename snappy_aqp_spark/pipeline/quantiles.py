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
