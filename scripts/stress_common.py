"""Shared oracle plumbing for the scale-stress scripts (sf1/sf10/sf100).

One place for the three disciplines every stress oracle must share
(round-10 review: the compare logic had been copy-pasted and was already
drifting): the bounded DuckDB connection, scratch-view registration, and
the NaN-aware sorted bit-compare."""
from __future__ import annotations

import os

import duckdb


def oracle_connect(mem: str):
    """DuckDB connection with the repo's oracle limits: a runaway replay
    must abort loudly on the temp cap, never fill the box's disk (the
    1000x closed-form oracle measured >60 GB of spill before this cap
    existed — PLANS.md round-10)."""
    con = duckdb.connect()
    con.sql(f"SET memory_limit='{mem}'")
    con.sql("SET temp_directory='/tmp/aqp_duck_tmp'")
    con.sql("SET max_temp_directory_size='40GB'")
    return con


def register_scratch_views(con, scratch: str, tables) -> None:
    """CREATE VIEW per scratch table (dir-or-file parquet)."""
    for t in tables:
        path = f"{scratch}/{t}.parquet"
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")


def frames_bitmatch(sp, dk) -> bool:
    """Exact equality of two result frames up to row order: identical
    column sets, identical row counts, and per-cell bit equality after a
    whole-frame sort (NaN==NaN counts as equal — the LOCAL_OMIT
    contract encodes omitted groups as NaN on both engines)."""
    cols = sorted(sp.columns)
    if sorted(dk.columns) != cols or len(sp) != len(dk):
        return False
    a = sp[cols].sort_values(cols).reset_index(drop=True)
    b = dk[cols].sort_values(cols).reset_index(drop=True)
    return all(((a[c] == b[c]) | (a[c].isna() & b[c].isna())).all()
               for c in cols)
