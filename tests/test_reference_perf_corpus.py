"""The reference's own perf-query corpus as a grammar + routing gate.

src/test/java/io/snappydata/app/perf*.sql are the reference's real-user
surface (driven by its perf harness, PerfTest.java) — 9 files, ~70
queries: bare ``with error`` clauses, unaliased error functions,
``behavior 'PARTIAL_RUN_ON_BASE_TABLE'``/``'RUN_ON_FULL_TABLE'``,
HAVING over relative_error, comma joins across two fact tables plus a
dim filter, direct sample-table scans (sampleTable_WOE), and the
error-function-on-exact-route fold. Every query is loaded VERBATIM from
the reference at test time (no copies kept here), schema-adapted only by
registering airline-shaped VIEWS over the TPC-H fixture tables, and must
parse + route + execute; a deterministic subset is additionally
value-checked against the DuckDB replay oracle.
"""

from __future__ import annotations

import os
import re

import pytest

from snappy_aqp_spark.api import AQPSession
from snappy_aqp_spark.plans.approx_query import oracle_sql_for, visible_columns
from tests.conftest import SF_SMALL, compare_frames

_REF_DIR = "/root/reference/src/test/java/io/snappydata/app"
_FILES = ("perfQueries.sql", "perfQueriesBaseTable.sql",
          "perfQueries_WOE.sql", "perfQueriesPartialRoute.sql",
          "perfQueriesPartialRouteBaseTable.sql",
          "perfFunctionalQueries.sql", "perfFunctionalBaseQueries.sql",
          "perfJoinQueries.sql", "perfJoinQueriesBaseTable.sql")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF_DIR), reason="reference corpus not present")


def _load() -> list[tuple[str, int, str]]:
    out = []
    for f in _FILES:
        path = os.path.join(_REF_DIR, f)
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            for i, line in enumerate(fh, 1):
                q = line.strip().rstrip(";").strip()
                if q and not q.startswith("--"):
                    out.append((f, i, q))
    return out


_CORPUS = _load()

# airline-shaped views over the TPC-H fixture tables — identical SQL text
# runs on Spark and DuckDB. Column choices keep every referenced measure
# numeric and every carrier value joinable to airlineRef.Code.
_VIEWS = {
    "airline": (
        "SELECT l_orderkey, l_linenumber, "
        "CAST(l_quantity AS DOUBLE) AS ArrDelay, "
        "CAST(l_quantity AS DOUBLE) AS DepDelay, "
        "l_returnflag AS uniqueCarrier, l_linestatus AS Origin, "
        "CAST(l_tax AS DOUBLE) AS TaxiOut, "
        "CAST(l_discount AS DOUBLE) AS TaxiIn, "
        "CAST(l_extendedprice AS DOUBLE) AS Distance, "
        "CAST(l_extendedprice AS DOUBLE) AS ActualElapsedTime, "
        "CAST(l_linenumber AS INT) AS year_, "
        "CAST(CASE WHEN l_linenumber = 1 THEN 1 ELSE 0 END AS INT) "
        "AS CANCELLED, "
        "CAST(l_partkey % 2400 AS INT) AS CRSDepTime, "
        "CAST(l_suppkey % 2400 AS INT) AS DepTime "
        "FROM lineitem"),
    "airlineRef": "SELECT n_name AS Code, n_name AS description "
                  "FROM nation",
    "Flight": ("SELECT o.o_orderkey AS FlighTieStr, n.n_name AS "
               "uniqueCarrier FROM orders o JOIN customer c "
               "ON o.o_custkey = c.c_custkey JOIN nation n "
               "ON c.c_nationkey = n.n_nationkey"),
    "FlightData": ("SELECT l.l_orderkey, l.l_linenumber, "
                   "l.l_orderkey AS FlighTieStr, "
                   "CAST(l.l_quantity AS DOUBLE) AS ArrDelay, "
                   "n.n_name AS uniqueCarrier "
                   "FROM lineitem l JOIN orders o "
                   "ON l.l_orderkey = o.o_orderkey JOIN customer c "
                   "ON o.o_custkey = c.c_custkey JOIN nation n "
                   "ON c.c_nationkey = n.n_nationkey"),
}
_VIEWS["airline1"] = _VIEWS["airline"]

_DDLS = (
    "CREATE SAMPLE TABLE airline_s ON airline OPTIONS("
    "qcs 'uniqueCarrier', fraction '0.2', method 'hash', seed '42', "
    "keyColumns 'l_orderkey,l_linenumber')",
    "CREATE SAMPLE TABLE airline1_s ON airline1 OPTIONS("
    "qcs 'uniqueCarrier', fraction '0.2', method 'hash', seed '43', "
    "keyColumns 'l_orderkey,l_linenumber')",
    "CREATE SAMPLE TABLE fd_s ON FlightData OPTIONS("
    "qcs 'uniqueCarrier', fraction '0.2', method 'hash', seed '44', "
    "keyColumns 'l_orderkey,l_linenumber')",
    "CREATE SAMPLE TABLE sampleTable_WOE ON airline OPTIONS("
    "qcs 'uniqueCarrier', fraction '0.2', method 'hash', seed '45', "
    "keyColumns 'l_orderkey,l_linenumber')",
)


@pytest.fixture(scope="module")
def aqp_air(spark):
    s = AQPSession(spark, data_token="ref-perf-corpus", error=0.5,
                   confidence=0.95, behavior="do_nothing")
    s.load_tables(SF_SMALL, ["lineitem", "orders", "customer", "nation"])
    for name, sql in _VIEWS.items():
        s.register_table(name, spark.sql(sql))
    for ddl in _DDLS:
        s.sql(ddl)
    return s


@pytest.fixture(scope="module")
def duck_air(duck):
    for name, sql in _VIEWS.items():
        duck.sql(f"CREATE OR REPLACE VIEW {name} AS {sql}")
    return duck


@pytest.mark.parametrize(
    "src,line,q", _CORPUS,
    ids=[f"{f.removesuffix('.sql')}:{i}" for f, i, _ in _CORPUS])
def test_reference_perf_query_parses_routes_runs(aqp_air, src, line, q):
    """every query in the reference's perf corpus executes end-to-end —
    a parse failure or routing crash is a named grammar gap."""
    rows = aqp_air.sql(q).collect()
    assert rows is not None
    # global aggregates (no GROUP BY) always produce exactly one row
    if "group by" not in q.lower():
        assert len(rows) == 1


# deterministic value-checked subset: (file, line-1-based) pairs
_ORACLE_SUBSET = {
    ("perfQueries.sql", 1),             # bare WITH ERROR, sum + both errors
    ("perfQueries.sql", 4),             # group/order/limit WITH ERROR
    ("perfQueriesBaseTable.sql", 4),    # HAVING relative_error, no clause
    ("perfQueriesPartialRoute.sql", 1),   # PARTIAL_RUN_ON_BASE_TABLE
    ("perfQueriesPartialRoute.sql", 5),   # RUN_ON_FULL_TABLE
    ("perfQueries_WOE.sql", 1),         # exact passthrough
    ("perfQueries_WOE.sql", 4),         # do_nothing behavior, no error fns
    ("perfFunctionalQueries.sql", 6),   # sum group, single abs error
    ("perfJoinQueries.sql", 2),         # two fact joins + dim filter
}


@pytest.mark.parametrize(
    "src,line,q",
    [t for t in _CORPUS if (t[0], t[1]) in _ORACLE_SUBSET],
    ids=[f"{f.removesuffix('.sql')}:{i}"
         for f, i, _ in _CORPUS if (f, i) in _ORACLE_SUBSET])
def test_reference_perf_query_matches_oracle(aqp_air, duck_air, src, line, q):
    """the subset's values replay bit-exactly on DuckDB (same contract as
    the driver gate)."""
    an = aqp_air.analyze_sql(q)
    if an is None or an.spec is None:
        # exact route: fold error functions and run the text on both
        from snappy_aqp_spark.sql import frontend as fe
        stripped, _ = fe.strip_with_clause(q.rstrip(";"))
        folded = fe.fold_error_functions(
            stripped, an.parsed if an is not None else None)
        compare_frames(aqp_air.sql(q), duck_air.sql(folded))
        return
    sql = oracle_sql_for(an.spec)
    if an.rename:
        cols = [f"{c} AS {an.rename.get(c, c)}"
                for c in visible_columns(an.spec)]
        sql = f"SELECT {', '.join(cols)} FROM (\n{sql}\n) __renamed"
    compare_frames(aqp_air.sql(q), duck_air.sql(sql))
