"""Within-document repetition signals — the Gopher/MassiveText-style
quality rules that catch boilerplate, SEO spam, and degenerate generations
(pages that repeat the same words or phrases over and over).

Per document, over its word stream:
  * ``dup_word_bp``  — fraction of word tokens that are occurrences of a
    repeated word (count > 1), in basis points;
  * ``top_bigram_bp`` — fraction of word tokens covered by occurrences of
    the single most frequent bigram (2 * top count / n_words);
  * ``dup_trigram_bp`` — fraction of trigram positions whose trigram
    occurs more than once.

All ratios are integer basis points (idiv), so the output is bit-exact
across engines. n-grams are adjacent-word joins built directly from the
token ARRAY (one ``transform`` over positions — no positional self-join),
then exploded and counted per (doc, gram): the plan is one tokenize pass
plus per-doc-keyed aggregations, shuffling only (doc_id, gram) pairs. At
100 TB the gram strings can be replaced by integer rolling codes to
shrink the shuffle payload; the string form here keeps counts exact.

Documents shorter than the gram width contribute zero gram positions
(guarded — Spark's ``sequence(1, 0)`` counts DOWN, unlike DuckDB's empty
``generate_series``, so the guard is load-bearing for the oracle
contract).
"""

from __future__ import annotations

from .dual import arr_filter, arr_len, elem, explode, idiv, sequence, transform


def _tokens(dialect: str, col: str) -> str:
    """lower-cased alnum tokens, identical split in both engines."""
    split = (f"split(lower({col}), '[^a-z0-9]+')" if dialect == "spark"
             else f"regexp_split_to_array(lower({col}), '[^a-z0-9]+')")
    return arr_filter(dialect, split, "t -> t <> ''")


def _empty_varchar_array(dialect: str) -> str:
    return ("CAST(array() AS ARRAY<STRING>)" if dialect == "spark"
            else "CAST([] AS VARCHAR[])")


def _grams(dialect: str, arr: str, n: str, k: int) -> str:
    """array of adjacent ``k``-word grams (space-joined) of token array
    ``arr`` with length ``n``; empty when the document is too short."""
    joined = " || ' ' || ".join(
        elem(dialect, arr, f"i + {j}") for j in range(k))
    body = transform(dialect, sequence(dialect, "1", f"{n} - {k - 1}"),
                     f"i -> ({joined})")
    return f"(CASE WHEN {n} >= {k} THEN {body} ELSE {_empty_varchar_array(dialect)} END)"


def _singles_sorted_spark(s: str) -> str:
    """count of values occurring EXACTLY once in the SORTED array variable
    ``s``: a position is a singleton iff it differs from both neighbours
    (boundaries via GREATEST/LEAST stay in range; the `i = 1`/`i = size`
    disjuncts decide those cases regardless of the clamped comparison).
    Works off run boundaries, so it only needs EQUALITY grouping — any
    total order that makes equal elements adjacent gives the same count."""
    return (f"CASE WHEN size({s}) >= 1 THEN "
            f"size(filter(sequence(1, size({s})), i -> "
            f"(i = 1 OR element_at({s}, i) <> "
            f"element_at({s}, GREATEST(i - 1, 1))) "
            f"AND (i = size({s}) OR element_at({s}, i) <> "
            f"element_at({s}, LEAST(i + 1, size({s}))))"
            f")) ELSE 0 END")


def _singles_duck(l: str) -> str:
    """DuckDB oracle form: distinct values whose occurrence count is 1
    (O(distinct x n) vectorized — oracle-side only)."""
    return (f"len(list_filter(list_distinct({l}), "
            f"x -> len(list_filter({l}, y -> y = x)) = 1))")


def _maxrun_sorted_spark(s2: str) -> str:
    """longest run in a SORTED array = max occurrence count of any value;
    one O(n) fold with (prev, run, best) struct state."""
    step = ("CASE WHEN acc.p IS NOT NULL AND x = acc.p "
            "THEN acc.r + CAST(1 AS BIGINT) ELSE CAST(1 AS BIGINT) END")
    return (f"aggregate({s2}, "
            f"named_struct('p', CAST(NULL AS STRING), "
            f"'r', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT)), "
            f"(acc, x) -> named_struct('p', x, 'r', {step}, "
            f"'b', GREATEST(acc.b, {step})), acc -> acc.b)")


def _maxcnt_duck(l2: str) -> str:
    return (f"COALESCE(list_max(list_transform(list_distinct({l2}), "
            f"x -> CAST(len(list_filter({l2}, y -> y = x)) AS BIGINT))), "
            f"CAST(0 AS BIGINT))")


def repetition_signals_stages(dialect: str, table: str = "documents",
                              col: str = "text"
                              ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per document:
    (doc_id, n_words, n_distinct_words, dup_word_bp, top_bigram_bp,
    dup_trigram_bp).

    Every signal is a PER-DOCUMENT function of the token array, so the
    whole computation is one map-only projection (round 10): per doc,
    word/trigram singleton counts come from run boundaries of the sorted
    arrays and the top-bigram count from an O(n) run-length fold — no
    explode, no per-doc aggregation shuffle, no join-back. The former
    shape (3 explode+groupBy passes + a 4-way join) shuffled the whole
    token stream three times to compute doc-local facts; this one runs at
    scan speed at any scale, with the final ORDER BY as the only exchange.
    Duplicate-count identities: dup_tokens = n - singletons(words);
    dup_trigrams = (n-2) - singletons(trigrams); top-bigram count = the
    longest run in the sorted bigram array. All counts depend on equality
    grouping only, so engine collation cannot affect them."""
    toks = _tokens(dialect, col)
    nw = "GREATEST(m.n, CAST(1 AS BIGINT))"
    n3 = "GREATEST(m.n - 2, CAST(1 AS BIGINT))"
    if dialect == "spark":
        from ..dialect import array_sort
        from .dual import bind_array
        n_sql = "CAST(size(t) AS BIGINT)"
        g2 = _grams(dialect, "t", n_sql, 2)
        g3 = _grams(dialect, "t", n_sql, 3)
        s1 = bind_array(dialect, array_sort(dialect, "t"),
                        lambda s: f"CAST({_singles_sorted_spark(s)} AS BIGINT)")
        s3 = bind_array(dialect, array_sort(dialect, g3),
                        lambda s: f"CAST({_singles_sorted_spark(s)} AS BIGINT)")
        fields = (f"'n', {n_sql}, "
                  f"'nd', CAST(size(array_distinct(t)) AS BIGINT), "
                  f"'dup', {n_sql} - {s1}, "
                  f"'top2', {_maxrun_sorted_spark(array_sort(dialect, g2))}, "
                  f"'dup3', CASE WHEN {n_sql} >= 3 "
                  f"THEN {n_sql} - 2 - {s3} ELSE CAST(0 AS BIGINT) END")
        # explode of a 1-element struct array: binds the token array once
        # (a Generate node — CollapseProject cannot inline through it, so
        # downstream field extraction cannot re-evaluate the tokenizer).
        # REPARTITION(doc_id) on the projected (doc_id, text) pair: the
        # per-doc signal computation parallelizes with
        # spark.sql.shuffle.partitions instead of the scan's split count
        # (a single small input file would otherwise serialize the whole
        # map stage); ONE narrow shuffle of the text replaces the three
        # exploded gram-stream shuffles of the former shape, so shuffled
        # bytes still go DOWN while the compute distributes
        stages = [
            ("__rpm_mz",
             f"SELECT doc_id, explode(transform(array({toks}), "
             f"t -> named_struct({fields}))) AS m FROM "
             f"(SELECT /*+ REPARTITION(doc_id) */ doc_id, {col} "
             f"FROM {table}) __src"),
        ]
    else:
        from .dual import bind_array
        n_sql = f"CAST(len(__rt) AS BIGINT)"
        stages = [
            ("__rp0", f"SELECT doc_id, {toks} AS __rt FROM {table}"),
            ("__rpm_mz",
             f"SELECT doc_id, {{'n': {n_sql}, "
             f"'nd': CAST(len(list_distinct(__rt)) AS BIGINT), "
             f"'dup': {n_sql} - CAST({_singles_duck('__rt')} AS BIGINT), "
             f"'top2': {_maxcnt_duck(_grams(dialect, '__rt', n_sql, 2))}, "
             f"'dup3': CASE WHEN {n_sql} >= 3 THEN {n_sql} - 2 - "
             f"CAST({_singles_duck(_grams(dialect, '__rt', n_sql, 3))} "
             f"AS BIGINT) ELSE CAST(0 AS BIGINT) END}} AS m FROM __rp0"),
        ]
    final = (
        "SELECT doc_id, m.n AS n_words, m.nd AS n_distinct_words, "
        + idiv(dialect, "m.dup * 10000", nw) + " AS dup_word_bp, "
        + idiv(dialect, "m.top2 * 2 * 10000", nw) + " AS top_bigram_bp, "
        + idiv(dialect, "m.dup3 * 10000", n3) + " AS dup_trigram_bp "
        "FROM __rpm_mz ORDER BY doc_id")
    return stages, final
