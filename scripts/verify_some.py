"""Targeted driver-gate check: run the NAMED __spark_entry__ queries against
their DuckDB oracles (same comparison as verify_entry.py) at one SF.

Usage: python scripts/verify_some.py sf_dir name [name ...]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

SF_DIR = sys.argv[1]
NAMES = sys.argv[2:]

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false")
         .config("spark.driver.memory", "8g")
         .appName("verify-some").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
con.sql("SET memory_limit='24GB'")
con.sql("SET temp_directory='/tmp/aqp_duck_tmp'")
con.sql("SET max_temp_directory_size='40GB'")
for t in ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")

qs = entrymod.queries()
oracles = entrymod.oracle_sql()
fails = []
for name in NAMES:
    t0 = time.time()
    try:
        sp = qs[name](spark, SF_DIR).toPandas()
        dk = con.sql(oracles[name]).df()
        ok = sorted(sp.columns) == sorted(dk.columns) and len(sp) == len(dk)
        detail = ""
        if ok:
            cols = sorted(sp.columns)
            a = sp[cols].sort_values(cols).reset_index(drop=True)
            b = dk[cols].sort_values(cols).reset_index(drop=True)
            for c in cols:
                if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
                    af = a[c].astype(float)
                    bf = b[c].astype(float)
                    same = ((af == bf) | (af.isna() & bf.isna())).all()
                else:
                    same = ((a[c].astype(object) == b[c].astype(object)) |
                            (a[c].isna() & b[c].isna())).all()
                if not same:
                    ok = False
                    detail = f"col {c} differs"
                    break
        else:
            detail = f"shape sp={sp.shape} dk={dk.shape}"
        if not ok:
            fails.append(name)
        print(f"{name:28s} rows={len(sp):6d}  "
              f"{'OK ' if ok else 'FAIL'} {detail} {time.time()-t0:5.1f}s",
              flush=True)
    except Exception as ex:
        fails.append(name)
        print(f"{name:28s} ERROR {type(ex).__name__}: {str(ex)[:200]}")

print(f"\n{len(NAMES) - len(fails)}/{len(NAMES)} match")
spark.stop()
sys.exit(1 if fails else 0)
