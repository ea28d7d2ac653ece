"""Driver-style oracle sweep over the SQL-surface fixtures.

Every entry in ``SQL_FIXTURES`` runs through the full AQPSession.sql path
(DDL + query) and must match its DuckDB replay oracle bit-for-bit at
sf0.001 — the same contract the driver gate enforces at sf0.01, kept in
the suite so a frontend regression is caught before the round boundary.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from snappy_aqp_spark.fixtures import SQL_FIXTURES
from tests.conftest import SF_SMALL, compare_frames


@pytest.mark.parametrize("name", sorted(SQL_FIXTURES))
def test_sql_fixture_matches_oracle(spark, duck, name):
    fx = SQL_FIXTURES[name]
    res = entrymod._make_sql_runner(fx)(spark, SF_SMALL)
    oracle = duck.sql(entrymod._sql_fixture_oracle(fx))
    compare_frames(res, oracle)
