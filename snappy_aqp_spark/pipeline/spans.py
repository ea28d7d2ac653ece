"""Exact duplicated-span detection — substring-level dedup signals.

Document-level dedup (exact / minhash / simhash in ``dedup.py``) misses the
common contamination mode where *parts* of documents repeat: boilerplate
headers, license blocks, templated passages. The suffix-array recipe
(Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better") removes any token span of length >= k that occurs more than once
in the corpus. A distributed suffix array is impractical as a relational
plan; the equivalent relational form used here:

  1. every overlapping k-token gram, with its position, per document;
  2. grams occurring >= ``min_count`` times corpus-wide are "duplicated";
  3. a maximal run of consecutive duplicated gram positions inside one
     document is exactly a maximal duplicated span of >= k tokens
     (classic gaps-and-islands: position minus per-doc rank is constant
     within a run).

This finds precisely the spans the suffix-array method finds (a span of
length L >= k duplicates iff all its L-k+1 grams duplicate), with only
equi-shuffles: one groupBy on the gram for counting, a semi-join back, and
a per-document window. At 100 TB the gram *strings* in the shuffle can be
replaced by 60-bit codes to cut payload ~5x at a ~2^-60 collision rate —
``dual.avalanche60_steps`` over a token-code fold is the cheap
integer-only form (round-9; ``hex15_to_long(md5(...))`` works too but
pays a cryptographic hash per gram). The string form here keeps the
count exact and the oracle replay byte-identical.

Output rows are the spans themselves — the actionable artifact: a cleaner
joins them back to cut the spans out, an auditor aggregates them into a
per-document duplicated-token fraction.
"""

from __future__ import annotations

from .dual import (arr_filter, arr_len, elem, explode, mk_struct, sequence,
                   transform)


def _tokens(dialect: str, col: str) -> str:
    """lower-cased alnum tokens, identical split in both engines."""
    split = (f"split(lower({col}), '[^a-z0-9]+')" if dialect == "spark"
             else f"regexp_split_to_array(lower({col}), '[^a-z0-9]+')")
    return arr_filter(dialect, split, "t -> t <> ''")


def _empty_pg_array(dialect: str) -> str:
    if dialect == "spark":
        return "CAST(array() AS ARRAY<STRUCT<p: BIGINT, g: STRING>>)"
    return "CAST([] AS STRUCT(p BIGINT, g VARCHAR)[])"


def _gram_structs(dialect: str, arr: str, k: int) -> str:
    """array of (1-based position, k-gram) structs over token-array column
    ``arr`` (a generator-position explode keeps the array from being
    re-evaluated per element — measured 12x faster than the posexplode
    and bind_array formulations on this corpus)."""
    joined = " || ' ' || ".join(elem(dialect, arr, f"i + {j}")
                                for j in range(k))
    st = mk_struct(dialect, [("p", "CAST(i AS BIGINT)"),
                             ("g", f"({joined})")])
    n = arr_len(dialect, arr)
    body = transform(dialect, sequence(dialect, "1", f"{n} - {k - 1}"),
                     f"i -> {st}")
    return (f"(CASE WHEN {n} >= {k} THEN {body} "
            f"ELSE {_empty_pg_array(dialect)} END)")


def duplicate_spans_stages(dialect: str, k: int = 5, min_count: int = 2,
                           table: str = "documents", col: str = "text"
                           ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per maximal duplicated span:
    (doc_id, tok_start 0-based, span_ntok, n_dup_grams), ordered by
    (doc_id, tok_start). ``span_ntok = n_dup_grams + k - 1`` always —
    kept as a column so the invariant is visible in the output."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    gs = _gram_structs(dialect, "a", k)
    # ONE gram-stream text, used by TWO independently-named stages (round
    # 11): the round-10 shape named the stream once with two downstream
    # readers, so the stage runner PERSISTED it — a corpus-sized cache of
    # the exploded gram stream (~k x corpus bytes at 100 TB), the same
    # risk class the pii_scan rewrite removed. Splitting the legs keeps
    # each reference count at 1 (nothing persists): the count leg pays a
    # map-side partial aggregate whose shuffle carries one row per
    # distinct gram per partition, the probe leg re-derives the stream
    # from the scan (one extra tokenize+explode pass — strictly cheaper
    # than materializing the stream at scale) and joins the duplicated-
    # gram list, which is small by construction (duplicated grams are
    # rare), as a broadcast build side.
    #
    # Measured-and-rejected alternative (round-10 VERDICT item 4
    # suggested a partition-local count>1 prefilter before the global
    # shuffle): UNSAFE — a gram occurring once in each of two partitions
    # has global count 2 but no partition-local count above 1, so the
    # prefilter would drop true duplicates. The hash aggregate's map-side
    # partial counts already deliver the safe version of the same idea.
    gram_sql = (f"SELECT doc_id, s.p AS p, s.g AS g FROM "
                f"(SELECT doc_id, {explode(dialect, gs, 's')} FROM "
                f"(SELECT doc_id, {_tokens(dialect, col)} AS a "
                f"FROM {table}) __t) __x")
    stages = [
        # count leg: corpus-wide duplicated grams (the one wide shuffle,
        # keyed on g; only g survives column pruning)
        ("__dpg", gram_sql),
        ("__dpc",
         f"SELECT g FROM __dpg GROUP BY g "
         f"HAVING COUNT(*) >= {min_count}"),
        # probe leg: positions covered by a duplicated gram (fresh
        # derivation of the same stream — identical text, new name)
        ("__dpgp", gram_sql),
        ("__dpd",
         "SELECT d.doc_id, d.p FROM __dpgp d JOIN __dpc c ON d.g = c.g"),
        # gaps-and-islands: constant (p - rank) within a consecutive run
        ("__dpi",
         "SELECT doc_id, p, p - ROW_NUMBER() OVER "
         "(PARTITION BY doc_id ORDER BY p) AS grp FROM __dpd"),
        # _mz: the final's global ORDER BY otherwise re-evaluates the
        # window+aggregate subtree a second time for range-bound
        # sampling; the materialized relation is the output-sized span
        # table
        ("__dps_mz",
         f"SELECT doc_id, CAST(MIN(p) - 1 AS BIGINT) AS tok_start, "
         f"CAST(COUNT(*) + {k - 1} AS BIGINT) AS span_ntok, "
         f"CAST(COUNT(*) AS BIGINT) AS n_dup_grams "
         f"FROM __dpi GROUP BY doc_id, grp"),
    ]
    final = ("SELECT doc_id, tok_start, span_ntok, n_dup_grams "
             "FROM __dps_mz ORDER BY doc_id, tok_start")
    return stages, final
