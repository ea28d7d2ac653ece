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
