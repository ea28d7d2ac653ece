"""Deterministic, engine-portable pseudo-random draws as SQL fragments.

The reference engine seeds its samplers / bootstrap with JVM RNGs
(reference: stratifiedSampling.scala Algorithm-R reservoir;
bootstrap/bootstrapExpressions.scala:91 ``DebugFixedSeed`` for reproducible
tests). A JVM RNG cannot be replayed inside DuckDB, so this rebuild derives
randomness from the row's *unique key columns* with pure integer arithmetic
(a multiplicative polynomial hash mod a Mersenne prime). The identical SQL
text evaluates on Spark SQL and DuckDB, which is what makes every sampled
query exactly oracle-checkable — and it is also the right scale design:
hash-based (a.k.a. universe) sampling needs no shuffle and no state, so a
100 TB scan samples in a single pass.

All intermediates stay below 2^62 so the arithmetic never overflows BIGINT
(Spark 4 runs ANSI mode by default and would raise on overflow).
"""

from __future__ import annotations

MODULUS = 2147483647          # 2^31 - 1 (Mersenne prime)
_MUL = 1103515245             # classic LCG multiplier, < 2^31
_MIX = 179424673              # prime mixer for the seed/salt


def hash_sql(key_cols: list[str], seed: int, salt: str | int = 0) -> str:
    """SQL fragment: integer in [0, MODULUS) derived from key columns.

    ``key_cols`` are SQL expressions of integer type that uniquely identify a
    row (e.g. ``["l_orderkey", "l_linenumber"]``). ``salt`` may be an integer
    or a SQL expression (e.g. a bootstrap-trial index column) — it is mixed in
    multiplicatively so different salts give independent-looking streams.

    Valid verbatim under both Spark SQL and DuckDB.
    """
    if not key_cols:
        raise ValueError("need at least one key column")
    seed_c = (seed * _MIX + 12345) % MODULUS

    def nn(k: str) -> str:
        # % keeps the dividend's sign in both engines: normalize to
        # [0, MODULUS) so negative keys hash uniformly instead of always
        # passing `hash < threshold` (identical for non-negative keys).
        # BIGINT cast first: INT key columns would overflow int32 on
        # `+ MODULUS` under Spark 4 ANSI mode.
        return (f"(((CAST({k} AS BIGINT) % {MODULUS}) + {MODULUS}) "
                f"% {MODULUS})")

    expr = f"({nn(key_cols[0])} * {_MUL} + {seed_c}) % {MODULUS}"
    for k in key_cols[1:]:
        expr = f"(({expr} + {nn(k)}) * {_MUL} + {seed_c}) % {MODULUS}"
    if isinstance(salt, int):
        if salt != 0:
            salt_c = (salt * _MIX + 777) % MODULUS
            expr = f"(({expr} + {salt_c}) * {_MUL} + 99991) % {MODULUS}"
    else:
        expr = f"(({expr} + (({salt}) * {_MIX} + 777) % {MODULUS}) * {_MUL} + 99991) % {MODULUS}"
    return f"({expr})"


def rand_hash_sql(key_cols: list[str], seed: int, salt: str | int = 0) -> str:
    """Like ``hash_sql`` but with two QUADRATIC scrambling rounds on top of
    the polynomial hash — the seeded ``reservoir_rand`` sampler's priority
    stream (Algorithm-R semantics, StratifiedSamplerReservoir.scala:58-77).

    The polynomial hash is affine in the keys, so key patterns correlated
    with measures (e.g. keys striding in lockstep with a value column)
    could in principle correlate with sampling priorities. The plain LCG
    fix doesn't help — affine maps compose to affine — so each round here
    squares mod the Mersenne prime (``h*h`` stays under 2^62, safe in
    ANSI BIGINT), a nonlinear map with good empirical avalanche that still
    uses only * + %, portable verbatim to Spark SQL and DuckDB. Coverage
    across seeds is pinned by the statistical suite (test_accuracy.py)."""
    h = hash_sql(key_cols, seed, salt)
    c1 = (seed * _MIX + 48271) % MODULUS
    r1 = (f"((({h} * {h}) % {MODULUS}) * 3 + {h} * 48271 + {c1}) "
          f"% {MODULUS}")
    return (f"(((({r1}) * ({r1})) % {MODULUS}) + ({r1}) * 69621 + 12345) "
            f"% {MODULUS}")


def threshold_for_fraction(fraction: float) -> int:
    """Integer threshold t so that P(hash < t) == fraction (exactly, in both engines)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction out of range: {fraction}")
    return int(fraction * MODULUS)


def uniform01_sql(key_cols: list[str], seed: int, salt: str | int = 0) -> str:
    """SQL fragment: double in [0, 1) — a single IEEE division, identical in both engines."""
    return f"(CAST({hash_sql(key_cols, seed, salt)} AS DOUBLE) / CAST({float(MODULUS)!r} AS DOUBLE))"
