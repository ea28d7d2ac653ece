"""Bloom-filter semi-join pruning: build a bit-set from the dimension
side's join keys, broadcast it as ONE packed row, and filter the fact scan
before the join shuffle.

This is the runtime-filter pattern (Spark's own
``spark.sql.optimizer.runtime.bloomFilter`` injects it for some plans;
here it is an explicit, tunable operator): at 100 TB the dominant cost of
a selective fact⋈dim join is shuffling fact rows that will never match.
An m-bit filter over the dim keys costs m/63 BIGINTs (a few KB —
broadcast to every executor inside one literal row), rejects most
non-matching rows inside the scan stage with pure integer arithmetic, and
never rejects a true match. The exact join afterwards removes the false
positives, so the operator's result is EXACTLY the unfiltered join — the
filter only moves work out of the shuffle.

Plan shape: fact side stays one-row-per-row (the k probe positions are
unrolled expressions, not an explode), the packed filter is a 1-row
cross-join broadcast (same shape as the IVF packed-centroid scan,
similarity.py), and the only shuffles are the tiny dim aggregation and
the final group-by.

Determinism: positions come from ``detrng.hash_sql`` (engine-portable
integer hash), words use 63-bit lanes so ``1 << bit`` never touches the
sign bit — identical in Spark and DuckDB.
"""

from __future__ import annotations

from ..detrng import hash_sql
from .dual import band, elem, explode, idiv, ordered_list, sequence, shiftleft

_LANE = 63                      # bits per word; keeps 1<<bit positive


def bloom_semi_join_stages(dialect: str, n_words: int = 260,
                           k_hashes: int = 4, seed: int = 42
                           ) -> tuple[list[tuple[str, str]], str]:
    """Revenue per return flag for lineitems of URGENT-priority orders,
    with the orders-side bloom filter pruning the lineitem scan before the
    join. -> (l_returnflag, n_rows, revenue_cents), exactly equal to the
    plain join's answer."""
    m_bits = n_words * _LANE

    def pos(key: str, i: int) -> str:
        return f"({hash_sql([key], seed, salt=i + 1)} % {m_bits})"

    # dim-side bit positions -> per-word OR-mask (<= n_words tiny rows).
    # The k hash branches come from ONE pass with the salt as an exploded
    # column (round 11; previously a k-way UNION ALL re-reading __bfd per
    # branch): hash_sql mixes an integer salt s as ((s*MIX+777)%MODULUS),
    # the identical formula it emits for a salt EXPRESSION, so the
    # positions are bit-equal to the unioned form's by construction.
    dim = ("SELECT o_orderkey FROM orders WHERE o_orderpriority LIKE '1%'")
    pos_expr = (f"({hash_sql(['o_orderkey'], seed, salt='__si')} "
                f"% {m_bits})")
    pos_rows = (f"SELECT {pos_expr} AS p FROM ("
                f"SELECT o_orderkey, "
                f"{explode(dialect, sequence(dialect, '1', str(k_hashes)), '__si')} "
                f"FROM __bfd) __e")
    one = shiftleft(dialect, "CAST(1 AS BIGINT)", f"p % {_LANE}")
    # dense word vector 0..n_words-1 (missing words -> 0), packed into one
    # ordered array row for the broadcast
    seq_rows = (f"SELECT "
                f"{explode(dialect, sequence(dialect, '0', str(n_words - 1)), 'word')}")
    word_of_p = idiv(dialect, "p", str(_LANE))
    stages = [
        ("__bfd", dim),
        ("__bfm",
         f"SELECT {word_of_p} AS word, bit_or({one}) AS mask "
         f"FROM ({pos_rows}) __p GROUP BY {word_of_p}"),
        ("__bfp",
         f"SELECT {ordered_list(dialect, 'm', 'word')} AS words FROM ("
         f"SELECT s.word, COALESCE(b.mask, CAST(0 AS BIGINT)) AS m "
         f"FROM ({seq_rows}) s LEFT JOIN __bfm b ON s.word = b.word) __w"),
    ]
    # probe: all k bits set (unrolled; short-circuits in the scan stage)
    checks = []
    for i in range(k_hashes):
        p = pos("l_orderkey", i)
        word_idx = f"{idiv(dialect, p, str(_LANE))} + 1"
        bit = shiftleft(dialect, "CAST(1 AS BIGINT)", f"({p}) % {_LANE}")
        checks.append(
            f"{band(dialect, elem(dialect, 'f.words', word_idx), bit)} != 0")
    stages.append(
        ("__bfs",
         f"SELECT l.l_orderkey, "
         f"CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS cents, "
         f"l.l_returnflag FROM lineitem l CROSS JOIN __bfp f "
         f"WHERE {' AND '.join(checks)}"))
    # _mz (round 11): the final's global ORDER BY range-samples its
    # child, re-executing the final aggregate merge a second time per
    # call; the materialized relation is output-sized (one row per
    # return flag)
    stages.append(
        ("__bsj_mz",
         "SELECT s.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows, "
         "CAST(SUM(s.cents) AS BIGINT) AS revenue_cents "
         "FROM __bfs s JOIN __bfd d ON s.l_orderkey = d.o_orderkey "
         "GROUP BY s.l_returnflag"))
    final = ("SELECT l_returnflag, n_rows, revenue_cents FROM __bsj_mz "
             "ORDER BY l_returnflag")
    return stages, final


def bloom_prune_count_stages(dialect: str, n_words: int = 260,
                             k_hashes: int = 4, seed: int = 42
                             ) -> tuple[list[tuple[str, str]], str]:
    """Diagnostic variant: how many probe rows survive the bloom filter
    alone (true matches + false positives). Used by tests to bound the
    false-positive rate; not a fixture."""
    stages, _ = bloom_semi_join_stages(dialect, n_words, k_hashes, seed)
    return stages, "SELECT CAST(COUNT(*) AS BIGINT) AS survivors FROM __bfs"
