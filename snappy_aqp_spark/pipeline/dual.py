"""Dialect shims + stage runner for dual-emitted pipeline operators.

Pipeline operators (dedup, similarity) are declared once as CTE stage lists
in portable SQL with small dialect shims; the Spark path executes the full
query through ``spark.sql`` (one Catalyst-optimized plan over temp views),
the oracle path replays the identical stages on DuckDB. Zero drift by
construction.
"""

from __future__ import annotations

from ..dialect import DUCKDB, SPARK


def explode(dialect: str, arr_sql: str, alias: str) -> str:
    return (f"explode({arr_sql}) AS {alias}" if dialect == SPARK
            else f"unnest({arr_sql}) AS {alias}")


def transform(dialect: str, arr_sql: str, lam: str) -> str:
    return (f"transform({arr_sql}, {lam})" if dialect == SPARK
            else f"list_transform({arr_sql}, {lam})")


def sequence(dialect: str, lo: str, hi: str) -> str:
    return (f"sequence({lo}, {hi})" if dialect == SPARK
            else f"generate_series({lo}, {hi})")


def arr_distinct(dialect: str, arr_sql: str) -> str:
    return (f"array_distinct({arr_sql})" if dialect == SPARK
            else f"list_distinct({arr_sql})")


def arr_min(dialect: str, arr_sql: str) -> str:
    return (f"array_min({arr_sql})" if dialect == SPARK
            else f"list_min({arr_sql})")


def arr_sum_bigint(dialect: str, arr_sql: str) -> str:
    if dialect == SPARK:
        return f"aggregate({arr_sql}, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    return f"CAST(list_sum({arr_sql}) AS BIGINT)"


def elem(dialect: str, arr_sql: str, idx_sql: str) -> str:
    if dialect == SPARK:
        return f"element_at({arr_sql}, CAST({idx_sql} AS INT))"
    return f"list_extract({arr_sql}, CAST({idx_sql} AS INT))"


def xor(dialect: str, a: str, b: str) -> str:
    return f"({a} ^ {b})" if dialect == SPARK else f"xor({a}, {b})"


def shiftright(dialect: str, a: str, n: str) -> str:
    return (f"shiftright({a}, {n})" if dialect == SPARK
            else f"(({a}) >> ({n}))")


def hex15_to_long(hex_sql: str) -> str:
    """first 15 hex chars of a hex string -> BIGINT < 2^60 (portable —
    no conv() in DuckDB, no from_hex in Spark; instr is in both)."""
    terms = []
    for p in range(15):
        d = (f"CAST(instr('0123456789abcdef', substring({hex_sql}, {p + 1}, 1)) "
             f"- 1 AS BIGINT)")
        terms.append(f"{d} * CAST({16 ** (14 - p)} AS BIGINT)")
    return "(" + " + ".join(terms) + ")"


def stages_sql(stages: list[tuple[str, str]], final: str) -> str:
    ctes = ",\n".join(f"{n} AS (\n{s}\n)" for n, s in stages)
    return f"WITH {ctes}\n{final}"


def run_stages(spark, stages: list[tuple[str, str]], final: str):
    return spark.sql(stages_sql(stages, final))
