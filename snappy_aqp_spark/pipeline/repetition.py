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


def repetition_signals_stages(dialect: str, table: str = "documents",
                              col: str = "text"
                              ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per document:
    (doc_id, n_words, n_distinct_words, dup_word_bp, top_bigram_bp,
    dup_trigram_bp)."""
    toks = _tokens(dialect, col)
    stages = [
        ("__rp0",
         f"SELECT doc_id, __a AS a, CAST({arr_len(dialect, '__a')} AS BIGINT) AS n "
         f"FROM (SELECT doc_id, {toks} AS __a FROM {table}) __t"),
        # word occurrence counts -> repeated-word token mass
        ("__rpw",
         f"SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c FROM "
         f"(SELECT doc_id, {explode(dialect, 'a', 'w')} FROM __rp0) __x "
         f"GROUP BY doc_id, w"),
        ("__rpws",
         "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct, "
         "CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) "
         "AS dup_tokens FROM __rpw GROUP BY doc_id"),
        # bigram counts -> most frequent bigram's token coverage
        ("__rp2",
         f"SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM "
         f"(SELECT doc_id, "
         f"{explode(dialect, _grams(dialect, 'a', 'n', 2), 'g')} "
         f"FROM __rp0) __x GROUP BY doc_id, g"),
        ("__rp2s",
         "SELECT doc_id, MAX(c) AS top2 FROM __rp2 GROUP BY doc_id"),
        # trigram counts -> duplicated trigram position fraction
        ("__rp3",
         f"SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM "
         f"(SELECT doc_id, "
         f"{explode(dialect, _grams(dialect, 'a', 'n', 3), 'g')} "
         f"FROM __rp0) __x GROUP BY doc_id, g"),
        ("__rp3s",
         "SELECT doc_id, CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) "
         "AS BIGINT) AS dup3 FROM __rp3 GROUP BY doc_id"),
    ]
    nw = "GREATEST(d.n, CAST(1 AS BIGINT))"
    n3 = "GREATEST(d.n - 2, CAST(1 AS BIGINT))"
    final = (
        "SELECT d.doc_id, d.n AS n_words, "
        "COALESCE(w.n_distinct, CAST(0 AS BIGINT)) AS n_distinct_words, "
        + idiv(dialect, "COALESCE(w.dup_tokens, 0) * 10000", nw)
        + " AS dup_word_bp, "
        + idiv(dialect, "COALESCE(b.top2, 0) * 2 * 10000", nw)
        + " AS top_bigram_bp, "
        + idiv(dialect, "COALESCE(t.dup3, 0) * 10000", n3)
        + " AS dup_trigram_bp "
        "FROM __rp0 d "
        "LEFT JOIN __rpws w ON d.doc_id = w.doc_id "
        "LEFT JOIN __rp2s b ON d.doc_id = b.doc_id "
        "LEFT JOIN __rp3s t ON d.doc_id = t.doc_id "
        "ORDER BY d.doc_id")
    return stages, final
