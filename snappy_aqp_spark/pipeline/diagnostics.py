"""Pre-flight diagnostics for big joins and aggregations: key-skew
reports and join-cardinality estimation WITHOUT running the join.

At 100 TB the difference between a plan that finishes and one that dies
is usually a single skewed key or an unexpectedly exploding join. Both
facts are computable from per-key count vectors — two narrow aggregates —
at a tiny fraction of the join's own cost:

* **skew report**: per-key counts -> top-N heaviest keys with their
  integer share of the table (basis-point precision). The row driving a
  salting / AQE-skew-join decision.
* **join cardinality**: |A ⋈ B on k| = Σ_k count_A(k)·count_B(k),
  computed EXACTLY by joining the two count relations (shuffles rows
  proportional to DISTINCT keys, not to the join output). The same
  relation also yields the max per-key output (the skew cell) — the
  number that predicts the straggler.

All-integer, dual-emitted, bit-exact replay oracles.
"""

from __future__ import annotations

from .dual import idiv


def skew_report_stages(dialect: str, key: str = "user_id",
                       table: str = "events", top: int = 20
                       ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> top-N keys by frequency: (key_val, n,
    share_bp) where share_bp is the key's share in basis points
    (n * 10000 / total, integer-truncated)."""
    stages = [
        ("__skc",
         f"SELECT CAST({key} AS BIGINT) AS key_val, "
         f"CAST(COUNT(*) AS BIGINT) AS n FROM {table} GROUP BY {key}"),
        ("__skt", "SELECT CAST(SUM(n) AS BIGINT) AS t FROM __skc"),
    ]
    final = (f"SELECT c.key_val, c.n, "
             f"{idiv(dialect, 'c.n * 10000', 't.t')} AS share_bp "
             f"FROM __skc c CROSS JOIN __skt t "
             f"ORDER BY c.n DESC, c.key_val LIMIT {top}")
    return stages, final


def profile_stages(dialect: str,
                   cols: tuple[str, ...] = ("doc_id", "text", "lang",
                                            "source", "n_chars"),
                   table: str = "documents"
                   ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per column: (col_name, n_rows,
    n_nulls, n_distinct) — the basic data-profile sweep. One aggregate
    pass per column over a shared scan; at 100 TB you'd run the
    approximate variant (``distinct.hll_distinct_stages``) for the
    distinct counts — this exact form is the small/medium-table tool and
    the oracle for it."""
    parts = [
        (f"SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows, "
         f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
         f"AS n_nulls, "
         f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct FROM {table}")
        for c in cols]
    return [], ("SELECT * FROM (" + " UNION ALL ".join(parts) +
                ") __p ORDER BY col_name")


def join_cardinality_stages(dialect: str,
                            left: str = "lineitem",
                            left_key: str = "l_orderkey",
                            right: str = "orders",
                            right_key: str = "o_orderkey"
                            ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row: (join_rows, distinct_join_keys,
    max_key_output, left_rows, right_rows) — the exact output cardinality
    of ``left ⋈ right ON left_key = right_key`` and the size of its
    biggest single-key cell, without materializing the join."""
    stages = [
        ("__jca",
         f"SELECT {left_key} AS k, CAST(COUNT(*) AS BIGINT) AS n "
         f"FROM {left} GROUP BY {left_key}"),
        ("__jcb",
         f"SELECT {right_key} AS k, CAST(COUNT(*) AS BIGINT) AS n "
         f"FROM {right} GROUP BY {right_key}"),
        ("__jcm",
         "SELECT a.k, a.n * b.n AS o FROM __jca a JOIN __jcb b ON a.k = b.k"),
    ]
    final = ("SELECT CAST(COALESCE(SUM(o), 0) AS BIGINT) AS join_rows, "
             "CAST(COUNT(*) AS BIGINT) AS distinct_join_keys, "
             "CAST(COALESCE(MAX(o), 0) AS BIGINT) AS max_key_output, "
             "(SELECT CAST(SUM(n) AS BIGINT) FROM __jca) AS left_rows, "
             "(SELECT CAST(SUM(n) AS BIGINT) FROM __jcb) AS right_rows "
             "FROM __jcm")
    return stages, final


def correlation_stages(dialect: str,
                       pairs: tuple[tuple[str, str], ...] = (
                           ("l_quantity", "l_extendedprice"),
                           ("l_quantity", "l_discount"),
                           ("l_extendedprice", "l_tax")),
                       table: str = "lineitem",
                       ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per column pair: (x, y, n, corr) —
    Pearson correlation from quantized integer moment sums, so the
    result is order-independent and replays bit-exactly (a plain double
    SUM(x*y) would depend on Spark's nondeterministic aggregation
    order). One scan, five integer SUMs per pair, map-side combined —
    the feature-relationship pass a table-profiling pipeline runs before
    choosing stratification or clustering columns.

    Lattice: each column quantizes at its OWN measure_scale (per-column
    bounds — a shared scale zeroes out small-ranged columns like
    l_discount); per-row products shift down by 2^21 before summing so
    every term stays <= 2^21 and sums survive 2^41 rows under ANSI
    BIGINT (the qsum_sql headroom rule). The per-term floor is a
    deterministic ~2^-21 relative perturbation — identical on both
    engines, invisible at corr's double output precision."""
    from ..quant import measure_scale, pow2_literal
    from ..dialect import dlit
    from ..sql.frontend import measure_bound
    D = 21

    def q(col: str, m: int) -> str:
        return f"CAST(FLOOR(({col}) * {pow2_literal(m)}) AS BIGINT)"

    stages = []
    selects = []
    for i, (x, y) in enumerate(pairs):
        mx = measure_scale(measure_bound(x) / 2.0)
        my = measure_scale(measure_bound(y) / 2.0)
        qx, qy = q(x, mx), q(y, my)
        guard = f"({x}) IS NOT NULL AND ({y}) IS NOT NULL"
        stages.append((
            f"__corr{i}",
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM({qx}) AS BIGINT) AS sx, "
            f"CAST(SUM({qy}) AS BIGINT) AS sy, "
            f"CAST(SUM({idiv(dialect, f'({qx}) * ({qy})', str(1 << D))}) AS BIGINT) AS sxy, "
            f"CAST(SUM({idiv(dialect, f'({qx}) * ({qx})', str(1 << D))}) AS BIGINT) AS sxx, "
            f"CAST(SUM({idiv(dialect, f'({qy}) * ({qy})', str(1 << D))}) AS BIGINT) AS syy "
            f"FROM {table} WHERE {guard}"))
        nd = "CAST(n AS DOUBLE)"
        mean_x = f"(CAST(sx AS DOUBLE) * {pow2_literal(-mx)} / {nd})"
        mean_y = f"(CAST(sy AS DOUBLE) * {pow2_literal(-my)} / {nd})"
        xy = (f"(CAST(sxy AS DOUBLE) * {pow2_literal(D - mx - my)} / {nd})")
        xx = (f"(CAST(sxx AS DOUBLE) * {pow2_literal(D - 2 * mx)} / {nd})")
        yy = (f"(CAST(syy AS DOUBLE) * {pow2_literal(D - 2 * my)} / {nd})")
        cov = f"({xy} - {mean_x} * {mean_y})"
        var_x = f"({xx} - {mean_x} * {mean_x})"
        var_y = f"({yy} - {mean_y} * {mean_y})"
        corr = (f"(CASE WHEN {var_x} <= {dlit(0.0)} "
                f"OR {var_y} <= {dlit(0.0)} THEN NULL "
                f"ELSE {cov} / (SQRT({var_x}) * SQRT({var_y})) END)")
        selects.append(
            f"SELECT '{x}' AS x, '{y}' AS y, n, {corr} AS corr "
            f"FROM __corr{i}")
    final = " UNION ALL ".join(selects)
    final = (f"SELECT x, y, n, corr FROM ({final}) __u ORDER BY x, y")
    return stages, final
