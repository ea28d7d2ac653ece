"""Portable-SQL emission of the stratified sample as CTE stages.

Produces the *same rows, weights and strata* as ``samplers.stratified_sample``
— on any ANSI engine. Used to build the DuckDB replay oracle; the text is
also valid Spark SQL (tested for equality against the DataFrame path).
"""

from __future__ import annotations

from ..detrng import threshold_for_fraction
from ..specs import (STRATA_SAMPLED_COL, STRATA_TOTAL_COL, WEIGHT_COL,
                     SampleSpec)
from ..tables import TABLE_COLUMNS


def sample_cte_stages(spec: SampleSpec, out_name: str = "__sample",
                      base_sql: str | None = None,
                      base_cols: tuple[str, ...] | None = None,
                      prefix: str = "") -> list[tuple[str, str]]:
    """[(cte_name, select_sql), ...]; the last stage is the sample relation.

    ``base_sql`` defaults to ``SELECT * FROM <spec.base_table>``.
    ``prefix`` renames the internal stages (not ``out_name``) so several
    sample CTE chains can coexist in one WITH list (e.g. a sampled
    subquery tree next to the outer query's sample).
    """
    if prefix:
        plain = sample_cte_stages(spec, out_name, base_sql, base_cols)
        internal = [n for n, _ in plain if n != out_name]
        import re
        pat = re.compile(r"\b(" + "|".join(internal) + r")\b")
        return [(n if n == out_name else prefix + n,
                 pat.sub(lambda m: prefix + m.group(1), s))
                for n, s in plain]
    cols = base_cols or TABLE_COLUMNS[spec.base_table]
    col_list = ", ".join(cols)
    base = base_sql or (
        f"SELECT {col_list} FROM {spec.base_table}"
        + (f" WHERE {spec.base_filter}" if spec.base_filter else ""))
    from .samplers import priority_sql
    h = priority_sql(spec)
    qcs = ", ".join(spec.qcs)
    keys = ", ".join(cols)  # full-column tiebreak (see samplers._ranked_sample)
    k = spec.reservoir_size
    thr = threshold_for_fraction(spec.fraction)

    stages: list[tuple[str, str]] = []
    stages.append(("__tag", f"SELECT {col_list}, {h} AS __h FROM ({base}) __b"))

    if spec.method == "error_limit":
        from .error_limit import nreq_frag, stats_frags
        qcs_cols = [q.strip() for q in spec.qcs]
        assert all(q.isidentifier() for q in qcs_cols), \
            "error_limit oracle needs simple-column QCS"
        sf = stats_frags(spec)
        stats_sel = ", ".join([qcs] + [f"{s} AS {n}" for n, s in sf.items()])
        stages.append(("__estats",
                       f"SELECT {stats_sel} FROM __tag GROUP BY {qcs}"))
        stages.append(("__ereq",
                       f"SELECT {qcs}, __eN, {nreq_frag(spec)} AS __enreq "
                       f"FROM __estats"))
        # rank within stratum, then join the per-stratum requirement
        stages.append(("__erk",
                       f"SELECT *, ROW_NUMBER() OVER (PARTITION BY {qcs} "
                       f"ORDER BY __h, {keys}) AS __rn FROM __tag"))
        on = " AND ".join(f"a.{q} = r.{q}" for q in qcs_cols)
        stages.append((out_name,
                       f"SELECT {', '.join('a.' + c for c in cols)}, "
                       f"CAST(r.__enreq AS BIGINT) AS {STRATA_SAMPLED_COL}, "
                       f"CAST(r.__eN AS BIGINT) AS {STRATA_TOTAL_COL}, "
                       f"CAST(r.__eN AS DOUBLE) / CAST(r.__enreq AS DOUBLE) "
                       f"AS {WEIGHT_COL} "
                       f"FROM __erk a JOIN __ereq r ON {on} "
                       f"WHERE a.__rn <= r.__enreq"))
        return stages

    if spec.method in ("hash", "hash_rand"):
        include = f"__h < {thr}"
    elif spec.method in ("reservoir", "reservoir_rand"):
        include = f"__rn <= {k}"
    else:  # fraction with per-stratum floor
        include = f"__rn <= {k} OR __h < {thr}"
    stages.append(("__rk",
                   f"SELECT *, ROW_NUMBER() OVER (PARTITION BY {qcs} ORDER BY __h, {keys}) AS __rn, "
                   f"COUNT(*) OVER (PARTITION BY {qcs}) AS __ntot FROM __tag"))
    stages.append(("__mk", f"SELECT *, CASE WHEN {include} THEN 1 ELSE 0 END AS __in FROM __rk"))
    stages.append(("__ct", f"SELECT *, SUM(__in) OVER (PARTITION BY {qcs}) AS __nsmp FROM __mk"))
    stages.append((out_name,
                   f"SELECT {col_list}, CAST(__nsmp AS BIGINT) AS {STRATA_SAMPLED_COL}, "
                   f"CAST(__ntot AS BIGINT) AS {STRATA_TOTAL_COL}, "
                   f"CAST(__ntot AS DOUBLE) / CAST(__nsmp AS DOUBLE) AS {WEIGHT_COL} "
                   f"FROM __ct WHERE __in = 1"))
    return stages


def stages_to_sql(stages: list[tuple[str, str]], final_select: str) -> str:
    ctes = ",\n".join(f"{name} AS (\n{sql}\n)" for name, sql in stages)
    return f"WITH {ctes}\n{final_select}"
