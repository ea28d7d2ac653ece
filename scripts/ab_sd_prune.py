"""A/B the round-10 semantic_dedup angle-bound prune against the old
(exact-predicate-only) form in DuckDB alone: result diff + a direct count
of exact-qualifying pairs the bound would prune (must be 0).

Usage: python scripts/ab_sd_prune.py sf_dir [sf_dir ...]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from snappy_aqp_spark.dialect import dlit
from snappy_aqp_spark.pipeline import dual
from snappy_aqp_spark.pipeline import similarity as sim
from snappy_aqp_spark.pipeline.similarity import _cos, _dot

EPS = 0.95
DIM = 64

fails = 0
for sf_dir in sys.argv[1:]:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')")

    stages_new, final = sim.semantic_dedup_stages("duckdb", eps=EPS)
    pair_cos = _cos(_dot("duckdb", "a.v", "b.v", DIM), "a.n2", "b.n2")
    old_where = f"{pair_cos} >= {dlit(EPS)}"
    stages_old = []
    bound_expr = None
    for name, q in stages_new:
        if name == "__sd_drop":
            head, _, new_where = q.partition(" WHERE ")
            assert new_where.endswith(f"AND {old_where}"), new_where
            bound_expr = new_where[: -len(f" AND {old_where}")]
            stages_old.append((name, f"{head} WHERE {old_where}"))
        else:
            stages_old.append((name, q))
    assert bound_expr is not None

    t0 = time.time()
    new_rows = con.sql(dual.stages_sql(stages_new, final)).fetchall()
    t1 = time.time()
    old_rows = con.sql(dual.stages_sql(stages_old, final)).fetchall()
    t2 = time.time()
    same = new_rows == old_rows

    # conservativeness: pairs passing the exact predicate that the bound
    # (with its 1e-9 slack) would have pruned
    head = dict(stages_new)["__sd_drop"].partition(" WHERE ")[0]
    head_cnt = head.replace("SELECT DISTINCT a.vec_id", "SELECT COUNT(*)", 1)
    viol = con.sql(dual.stages_sql(
        stages_new[:-1],
        f"{head_cnt} WHERE {old_where} AND NOT ({bound_expr})")).fetchone()[0]

    ok = same and viol == 0
    fails += 0 if ok else 1
    print(f"{sf_dir}: rows={len(new_rows)} identical={same} "
          f"bound_violations={viol} new={t1-t0:.2f}s old={t2-t1:.2f}s "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    con.close()

sys.exit(1 if fails else 0)
