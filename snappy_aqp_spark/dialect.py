"""Tiny dialect shims for the handful of constructs where Spark SQL and
DuckDB spell things differently. Everything else in the generated fragments
is shared ANSI text.
"""

from __future__ import annotations

SPARK = "spark"
DUCKDB = "duckdb"


def dlit(x: float) -> str:
    """Portable double literal.

    DuckDB parses bare decimal literals (``1.5``) as DECIMAL and
    double-rounds them through DECIMAL128 on cast; Spark parses them as
    DOUBLE. A *string* cast is correctly rounded in both engines, giving
    the identical IEEE double.
    """
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def array_lit(dialect: str, items: list[str]) -> str:
    inner = ", ".join(items)
    return f"array({inner})" if dialect == SPARK else f"[{inner}]"


def element_at(dialect: str, arr_sql: str, idx_sql: str) -> str:
    """1-based indexing in both engines."""
    if dialect == SPARK:
        return f"element_at({arr_sql}, CAST({idx_sql} AS INT))"
    return f"list_extract({arr_sql}, CAST({idx_sql} AS INT))"


def array_sort(dialect: str, arr_sql: str) -> str:
    return f"array_sort({arr_sql})" if dialect == SPARK else f"list_sort({arr_sql})"


def collect_list(dialect: str, expr_sql: str) -> str:
    return f"collect_list({expr_sql})" if dialect == SPARK else f"list({expr_sql})"


def log_fn(dialect: str, expr_sql: str) -> str:
    """Natural log: Spark `ln`, DuckDB `ln` — shared; kept for clarity."""
    return f"ln({expr_sql})"


def nan_literal() -> str:
    return "CAST('NaN' AS DOUBLE)"


def epoch_micros(dialect: str, ts_sql: str) -> str:
    """Timestamp -> microseconds since epoch as BIGINT (UTC), both engines."""
    if dialect == SPARK:
        return f"unix_micros({ts_sql})"
    return f"epoch_us({ts_sql})"


def make_ts(dialect: str, micros_sql: str) -> str:
    """Microseconds since epoch -> timestamp."""
    if dialect == SPARK:
        return f"timestamp_micros(CAST({micros_sql} AS BIGINT))"
    return f"make_timestamp(CAST({micros_sql} AS BIGINT))"
