"""Audit fixture oracle result TYPES against the Spark result types.

The driver's correctness gate hashes values as each engine materializes
them into pandas, so a value-identical result can still hash-red when the
two engines land on different pandas dtypes — e.g. DuckDB widens
SUM(BIGINT) to HUGEINT, which pandas materializes as float64, while
Spark's BIGINT stays int64 ("17190036984" vs "17190036984.0" under any
stringify/hash). This script runs every queries()/oracle_sql() pair at a
small SF and compares the PANDAS DTYPE KIND of each output column — the
driver-visible representation. Any MISMATCH row is a latent hash-red: pin
the type with an explicit CAST in the shared query text.

Note nullable-int columns are NOT flagged when both engines produce them:
both Spark's toPandas and DuckDB's .df() materialize a nullable int64
column as float64, so the kinds agree.

Usage: python scripts/oracle_type_audit.py [sf_dir]
"""
from __future__ import annotations

import sys, time
sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.driver.memory", "6g")
         .appName("type-audit").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")

# pandas dtype kind -> comparable class
_KIND = {"i": "int", "u": "int", "f": "float", "b": "bool",
         "O": "object", "M": "datetime", "m": "timedelta", "S": "bytes"}


def kinds(df) -> dict[str, str]:
    return {c: _KIND.get(df[c].dtype.kind, df[c].dtype.kind)
            for c in df.columns}


def audit() -> list[str]:
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad: list[str] = []
    for name in sorted(qs):
        if name not in oracles:
            continue
        t0 = time.time()
        try:
            sp = kinds(qs[name](spark, SF_DIR).toPandas())
            dk = kinds(con.sql(oracles[name]).df())
        except Exception as ex:
            bad.append(name)
            print(f"{name:30s} ERROR {type(ex).__name__}: {str(ex)[:160]}",
                  flush=True)
            continue
        diffs = [f"{c}: spark={sp.get(c)} duck={dk.get(c)}"
                 for c in sorted(set(sp) | set(dk))
                 if sp.get(c) != dk.get(c)]
        if diffs:
            bad.append(name)
        print(f"{name:30s} {'MISMATCH' if diffs else 'OK':8s} "
              f"{'; '.join(diffs)} {time.time()-t0:4.1f}s", flush=True)
    return bad


bad = audit()
print(f"\n{len(bad)} fixtures with driver-visible type mismatches: {bad}")
spark.stop()
sys.exit(1 if bad else 0)
