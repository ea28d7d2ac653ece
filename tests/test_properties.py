"""Property-based tests (hypothesis) for the determinism core.

The whole bit-exact oracle contract rests on ``detrng.hash_sql`` emitting
SQL that evaluates identically in every engine for ANY integer key —
including negative and int32-overflowing keys (the round-2 ADVICE bugs
lived exactly there). These properties drive the fragment through DuckDB
against an independent pure-Python evaluator over adversarial inputs;
Spark agreement is covered by the fixture oracles at suite level.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st

from snappy_aqp_spark.detrng import (MODULUS, hash_sql,
                                     threshold_for_fraction, uniform01_sql)

_MUL = 1103515245
_MIX = 179424673

KEYS = st.integers(min_value=-(2 ** 62), max_value=2 ** 62)


def _trunc_mod(a: int, m: int) -> int:
    """SQL %: remainder keeps the dividend's sign (C semantics)."""
    r = abs(a) % m
    return -r if a < 0 else r


def _py_hash(keys: list[int], seed: int, salt: int = 0) -> int:
    seed_c = (seed * _MIX + 12345) % MODULUS

    def nn(k: int) -> int:
        return (_trunc_mod(k, MODULUS) + MODULUS) % MODULUS

    expr = _trunc_mod(nn(keys[0]) * _MUL + seed_c, MODULUS)
    for k in keys[1:]:
        expr = _trunc_mod((expr + nn(k)) * _MUL + seed_c, MODULUS)
    if salt != 0:
        salt_c = (salt * _MIX + 777) % MODULUS
        expr = _trunc_mod((expr + salt_c) * _MUL + 99991, MODULUS)
    return expr


@settings(max_examples=200, deadline=None)
@given(keys=st.lists(KEYS, min_size=1, max_size=3),
       seed=st.integers(min_value=0, max_value=2 ** 31),
       salt=st.integers(min_value=0, max_value=1000))
def test_hash_sql_matches_python_eval_on_duckdb(keys, seed, salt):
    cols = [f"c{i}" for i in range(len(keys))]
    frag = hash_sql(cols, seed, salt)
    sel = ", ".join(f"CAST({v} AS BIGINT) AS c{i}"
                    for i, v in enumerate(keys))
    got = duckdb.sql(f"SELECT {frag} AS h FROM (SELECT {sel})").fetchone()[0]
    assert got == _py_hash(keys, seed, salt)
    assert 0 <= got < MODULUS


@settings(max_examples=100, deadline=None)
@given(keys=st.lists(KEYS, min_size=1, max_size=2),
       seed=st.integers(min_value=0, max_value=2 ** 31))
def test_uniform01_in_unit_interval(keys, seed):
    cols = [f"c{i}" for i in range(len(keys))]
    frag = uniform01_sql(cols, seed)
    sel = ", ".join(f"CAST({v} AS BIGINT) AS c{i}"
                    for i, v in enumerate(keys))
    got = duckdb.sql(f"SELECT {frag} AS u FROM (SELECT {sel})").fetchone()[0]
    assert 0.0 <= got < 1.0


@settings(max_examples=200, deadline=None)
@given(f=st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_threshold_fraction_bounds(f):
    t = threshold_for_fraction(f)
    assert 0 <= t <= MODULUS
    # monotone: a larger fraction never gets a smaller threshold
    assert threshold_for_fraction(min(1.0, f + 0.01)) >= t


@settings(max_examples=50, deadline=None)
@given(vals=st.lists(st.integers(min_value=0, max_value=10 ** 6),
                     min_size=1, max_size=50),
       stride=st.integers(min_value=1, max_value=10 ** 5))
def test_systematic_pps_mass_invariant(vals, stride):
    """for ANY weight sequence and stride: kept count equals the number of
    stride boundaries crossed = floor(total/stride) ± 1, and every row
    with w >= stride is kept (pipeline/weighted.py contract)."""
    rows = " UNION ALL ".join(
        f"SELECT {i} AS id, {max(v, 1)} AS w" for i, v in enumerate(vals))
    q = (f"WITH t AS ({rows}), c AS (SELECT id, w, SUM(w) OVER "
         f"(ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
         f"AS cum FROM t) SELECT id, w FROM c "
         f"WHERE (cum // {stride}) > ((cum - w) // {stride})")
    kept = duckdb.sql(q).df()
    # exact Python replay of the stride-crossing rule
    cum, expect = 0, set()
    for i, v in enumerate(vals):
        w = max(v, 1)
        cum += w
        if cum // stride > (cum - w) // stride:
            expect.add(i)
    assert set(kept["id"]) == expect
    total = sum(max(v, 1) for v in vals)
    # one boundary per stride length -> never more than total//stride rows
    assert len(kept) <= max(total // stride, 0) or total < stride
    heavy = {i for i, v in enumerate(vals) if max(v, 1) >= stride}
    assert heavy <= set(kept["id"])
