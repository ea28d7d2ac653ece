"""Corpus-statistics language-model signals — integer-exact, fully
relational.

Two operators over the ``documents`` table:

* ``lm_surprise_stages`` — a bigram-LM novelty score per document. A
  document's bigram (w1, w2) is "surprising" in proportion to how rarely
  w2 follows w1 across the corpus: bits = blog(c(w1)) - blog(c(w1 w2)),
  the integer floor-log2 analog of -log2 P(w2|w1). Documents whose word
  transitions are poorly predicted by the corpus statistics (gibberish,
  shuffled text, OCR noise) score high; formulaic text scores near zero.
  This is the cheap stand-in for perplexity filtering with an external LM
  (the standard training-data quality gate) — no model, no floats.

* ``dsir_select_stages`` — DSIR-shaped importance selection (Xie et al.,
  "Data Selection for Language Models via Importance Resampling", 2023):
  rank out-of-domain documents by how much their unigram stream looks like
  a target domain. Per token w: bits = blog(ct(w)+1) - blog(cr(w)+1) with
  ct/cr the target/raw corpus counts (an integer log-likelihood-ratio
  surrogate); a document's weight is the sum over its token occurrences.
  Top-k by (weight, doc_id) is the selected training subset.

Integer contract: floor(log2(x)) is computed as length(bin(x)) - 1 —
``bin`` renders the binary string identically in Spark and DuckDB, so no
libm call ever reaches the compared output.

Scale design: both operators reduce to (1) one tokenize pass over the
corpus, (2) vocabulary-sized count aggregations (map-side combinable; the
vocabulary is orders of magnitude smaller than the corpus), (3) a single
stream-side equi-join of the exploded token/bigram stream against a
vocabulary-keyed score table (built by joining the count tables vocab-side
first, so the big stream is joined exactly once), and (4) a per-doc
re-aggregation keyed by doc_id. At 100 TB the score table is the natural
broadcast side; nothing here shuffles the corpus more than the one
(doc_id, gram) explode that every n-gram statistic needs.
"""

from __future__ import annotations

from .dual import arr_filter, elem, explode, idiv, sequence, transform
from ..dialect import SPARK


def _tokens(dialect: str, col: str) -> str:
    split = (f"split(lower({col}), '[^a-z0-9]+')" if dialect == SPARK
             else f"regexp_split_to_array(lower({col}), '[^a-z0-9]+')")
    return arr_filter(dialect, split, "t -> t <> ''")


def _arr_len_bigint(dialect: str, arr: str) -> str:
    from .dual import arr_len
    return f"CAST({arr_len(dialect, arr)} AS BIGINT)"


def blog(expr: str) -> str:
    """floor(log2(expr)) for a positive BIGINT, libm-free: both engines
    render bin(5) = '101', so length - 1 is the exact bit log."""
    return f"(LENGTH(bin(CAST({expr} AS BIGINT))) - 1)"


def lm_surprise_stages(dialect: str, table: str = "documents",
                       col: str = "text") -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per document:
    (doc_id, n_bigrams, surprise_bits, avg_surprise_bp).

    avg_surprise_bp = basis points of surprise bits per bigram position
    (idiv(10000 * bits, n_bigrams); 0 for documents with < 2 tokens)."""
    toks = _tokens(dialect, col)
    # adjacent bigram string per position; '' joiner cannot appear in
    # the alnum token alphabet, so the gram code is injective
    w1 = elem(dialect, "a", "i")
    w2 = elem(dialect, "a", "i + 1")
    grams = transform(dialect, sequence(dialect, "1", "n - 1"),
                      f"i -> ({w1} || ' ' || {w2})")
    stages = [
        ("__lm0",
         f"SELECT doc_id, __a AS a, {_arr_len_bigint(dialect, '__a')} AS n "
         f"FROM (SELECT doc_id, {toks} AS __a FROM {table}) __t"),
        # every bigram OCCURRENCE of every document (positions score
        # individually — a repeated rare transition is repeatedly
        # surprising)
        ("__lmb",
         f"SELECT doc_id, g FROM (SELECT doc_id, "
         f"{explode(dialect, f'(CASE WHEN n >= 2 THEN {grams} ELSE NULL END)', 'g')} "
         f"FROM __lm0) __x"),
        # corpus statistics: vocabulary-sized, map-side combinable
        ("__lmu",
         f"SELECT {elem(dialect, 'a', 'i')} AS w, "
         f"CAST(COUNT(*) AS BIGINT) AS cu FROM "
         f"(SELECT a, {explode(dialect, sequence(dialect, '1', 'n'), 'i')} "
         f"FROM __lm0 WHERE n >= 1) __x GROUP BY 1"),
        ("__lmbc",
         "SELECT g, CAST(COUNT(*) AS BIGINT) AS cb FROM __lmb GROUP BY g"),
        # score table built vocab-side: the corpus stream joins ONCE
        ("__lmsc",
         f"SELECT bc.g AS g, ({blog('u.cu')} - {blog('bc.cb')}) AS bits "
         f"FROM __lmbc bc JOIN __lmu u "
         f"ON u.w = CASE WHEN POSITION(' ' IN bc.g) > 0 "
         f"THEN SUBSTRING(bc.g, 1, POSITION(' ' IN bc.g) - 1) ELSE bc.g END"),
        # _mz: one thin row per scored document (output-sized). A repeat
        # caller otherwise re-derives the vocab score table + this rollup
        # from the persisted token/bigram stages on every call (measured:
        # warm 1.0 -> 0.55 s, jobs 9 -> 4 at sf0.1); the cold path is one
        # evaluation either way — same repeat-call philosophy as the
        # pipeline's other persisted stages, lifecycle identical
        ("__lmd_mz",
         "SELECT b.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, "
         "CAST(SUM(s.bits) AS BIGINT) AS surprise_bits "
         "FROM __lmb b JOIN __lmsc s ON b.g = s.g GROUP BY b.doc_id"),
    ]
    final = (
        f"SELECT d.doc_id AS doc_id, "
        f"COALESCE(l.n_bigrams, 0) AS n_bigrams, "
        f"COALESCE(l.surprise_bits, 0) AS surprise_bits, "
        f"CASE WHEN COALESCE(l.n_bigrams, 0) > 0 THEN "
        f"{idiv(dialect, '10000 * l.surprise_bits', 'l.n_bigrams')} "
        f"ELSE 0 END AS avg_surprise_bp "
        f"FROM {table} d LEFT JOIN __lmd_mz l ON d.doc_id = l.doc_id "
        f"ORDER BY doc_id")
    return stages, final


def dsir_select_stages(dialect: str, table: str = "documents",
                       col: str = "text", target_source: str = "src0",
                       k: int = 50) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> the ``k`` out-of-target documents whose token
    distribution best matches the target domain:
    (rank, doc_id, source, n_tokens, weight_bits).

    weight_bits = sum over token occurrences of
    blog(target_count + 1) - blog(raw_count + 1) — add-one keeps unseen
    words defined (blog(1) = 0) and the integer floors make the ranking
    bit-exact. Ties break on doc_id for a stable selection."""
    toks = _tokens(dialect, col)
    stages = [
        ("__ds0",
         f"SELECT doc_id, source, __a AS a, "
         f"{_arr_len_bigint(dialect, '__a')} AS n "
         f"FROM (SELECT doc_id, source, {toks} AS __a FROM {table}) __t"),
        ("__dsw",
         f"SELECT doc_id, source, w FROM (SELECT doc_id, source, "
         f"{explode(dialect, 'a', 'w')} FROM __ds0) __x"),
        # per-word counts in the target slice vs the rest (one pass)
        ("__dsc",
         f"SELECT w, "
         f"CAST(SUM(CASE WHEN source = '{target_source}' THEN 1 ELSE 0 END) "
         f"AS BIGINT) AS ct, "
         f"CAST(SUM(CASE WHEN source <> '{target_source}' THEN 1 ELSE 0 END) "
         f"AS BIGINT) AS cr FROM __dsw GROUP BY w"),
        ("__dssc",
         f"SELECT w, ({blog('ct + 1')} - {blog('cr + 1')}) AS bits "
         f"FROM __dsc"),
        ("__dsd",
         f"SELECT s.doc_id AS doc_id, s.source AS source, "
         f"CAST(COUNT(*) AS BIGINT) AS n_tokens, "
         f"CAST(SUM(c.bits) AS BIGINT) AS weight_bits "
         f"FROM __dsw s JOIN __dssc c ON s.w = c.w "
         f"WHERE s.source <> '{target_source}' "
         f"GROUP BY s.doc_id, s.source"),
        ("__dsr",
         "SELECT doc_id, source, n_tokens, weight_bits, "
         "CAST(ROW_NUMBER() OVER (ORDER BY weight_bits DESC, doc_id) "
         "AS BIGINT) AS rank FROM __dsd"),
    ]
    final = (f"SELECT rank, doc_id, source, n_tokens, weight_bits "
             f"FROM __dsr WHERE rank <= {k} ORDER BY rank")
    return stages, final
