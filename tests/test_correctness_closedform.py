"""Driver-style oracle checks: every approx-query fixture must match its
DuckDB replay bit-for-bit (reproducible mode)."""

from __future__ import annotations

import pytest

from snappy_aqp_spark.fixtures import APPROX_SPECS
from snappy_aqp_spark.plans.approx_query import (load_tables, oracle_sql_for,
                                                 run_approx_query)
from tests.conftest import SF_SMALL, compare_frames


def _tables_for(spec):
    return (spec.sample.base_table, *[j.table for j in spec.joins])


@pytest.mark.parametrize("name", sorted(APPROX_SPECS))
def test_fixture_matches_oracle(spark, duck, name):
    spec = APPROX_SPECS[name]
    tables = load_tables(spark, SF_SMALL, _tables_for(spec))
    res = run_approx_query(spark, spec, tables)
    oracle = duck.sql(oracle_sql_for(spec))
    compare_frames(res, oracle)


def test_strict_raises(spark):
    import dataclasses
    from snappy_aqp_spark.operators.closedform import ErrorLimitExceededException
    spec = dataclasses.replace(APPROX_SPECS["cf_strict"], error=1e-6)
    tables = load_tables(spark, SF_SMALL, _tables_for(spec))
    with pytest.raises(ErrorLimitExceededException):
        run_approx_query(spark, spec, tables)
