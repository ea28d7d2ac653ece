"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` returns the DuckDB
replay SQL that reproduces each result bit-for-bit (reproducible-mode
engine — see snappy_aqp_spark/quant.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from snappy_aqp_spark.fixtures import APPROX_SPECS
from snappy_aqp_spark.plans.approx_query import (load_tables, oracle_sql_for,
                                                 run_approx_query)
from snappy_aqp_spark.specs import ApproxQuerySpec


def _tables_for(spec: ApproxQuerySpec) -> tuple[str, ...]:
    return (spec.sample.base_table, *[j.table for j in spec.joins])


def _make_runner(spec: ApproxQuerySpec) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tables = load_tables(spark, sf_dir, _tables_for(spec))
        return run_approx_query(spark, spec, tables, cache_token=sf_dir)
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return queries()["cf_group_multi"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in APPROX_SPECS.items():
        out[name] = _make_runner(spec)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: oracle_sql_for(spec) for name, spec in APPROX_SPECS.items()}
