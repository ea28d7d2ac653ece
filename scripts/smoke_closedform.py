"""Dev smoke: spark vs duckdb exact-replay comparison for one spec."""
import sys, time
sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from snappy_aqp_spark.specs import ApproxAgg, ApproxQuerySpec, SampleSpec
from snappy_aqp_spark.plans.approx_query import (load_tables, oracle_sql_for,
                                                 run_approx_query)

SF_DIR = "/root/testdata/sf0.001"

spec = ApproxQuerySpec(
    sample=SampleSpec(
        base_table="lineitem",
        key_cols=("l_orderkey", "l_linenumber"),
        qcs=("l_returnflag", "l_linestatus"),
        method="hash", fraction=0.05, seed=42),
    aggs=(
        ApproxAgg("sum", "l_extendedprice", "sum_price", max_abs=2.0**17,
                  errors=("absolute_error", "relative_error", "lower_bound", "upper_bound")),
        ApproxAgg("avg", "l_discount", "avg_disc", max_abs=1.0,
                  errors=("relative_error",)),
        ApproxAgg("count_star", None, "cnt",
                  errors=("lower_bound", "upper_bound")),
    ),
    group_by=("l_returnflag",), group_aliases=("rf",),
    order_by=("rf",),
    error=0.5, confidence=0.95, behavior="do_nothing",
)

t0 = time.time()
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .appName("smoke").getOrCreate())
spark.sparkContext.setLogLevel("WARN")
print("spark up", time.time() - t0)

tables = load_tables(spark, SF_DIR, ("lineitem",))
res = run_approx_query(spark, spec, tables)
spdf = res.toPandas().sort_values("rf").reset_index(drop=True)
print("SPARK:\n", spdf.to_string())

sql = oracle_sql_for(spec)
print("\nORACLE SQL:\n", sql[:1500], "...\n")
con = duckdb.connect()
con.sql(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')")
dkdf = con.sql(sql).df().sort_values("rf").reset_index(drop=True)
print("DUCKDB:\n", dkdf.to_string())

# bit-exact comparison
ok = True
for c in spdf.columns:
    a, b = spdf[c], dkdf[c]
    if a.dtype.kind == "f":
        same = ((a == b) | (a.isna() & b.isna())).all()
    else:
        same = (a == b).all()
    if not same:
        ok = False
        print(f"MISMATCH {c}:\n", pd.DataFrame({"spark": a, "duck": b}))
print("BIT-EXACT MATCH:", ok)
spark.stop()
sys.exit(0 if ok else 1)
