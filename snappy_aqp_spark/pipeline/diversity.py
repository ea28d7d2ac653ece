"""Per-source corpus diversity metrics.

Mixture design for training data needs per-source diversity diagnostics
next to the volume counts: a source whose documents reuse a tiny
vocabulary (template farms, log dumps, boilerplate mirrors) contributes
far less signal per token than its size suggests. Standard signals, all
integer basis points so the replay is bit-exact:

  * ``ttr_bp``        — corpus type-token ratio per source
                        (distinct words / word occurrences);
  * ``uniq_trigram_bp`` — fraction of word-trigram occurrences whose gram
                        appears exactly once within the source (the
                        self-repetition complement: low = templated);
  * ``docs_per_word_bp`` — mean document frequency per distinct word in
                        basis points (how concentrated the vocabulary is
                        across documents).

Plan shape at 100 TB: one tokenize pass, then two (source, token)-keyed
aggregates — the shuffles carry (source, word) and (source, gram) pairs
only, never document text. Companion to repetition_signals (within-doc)
and text_top_terms (per-doc tf-idf): this one is the SOURCE-level rollup.
"""

from __future__ import annotations

from .dual import arr_distinct, arr_len, explode, idiv
from .repetition import _grams, _tokens


def corpus_diversity_stages(dialect: str, table: str = "documents",
                            col: str = "text"
                            ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per source:
    (source, n_docs, n_words, n_distinct_words, ttr_bp, uniq_trigram_bp,
    docs_per_word_bp)."""
    toks = _tokens(dialect, col)
    stages = [
        ("__dv_tok",
         f"SELECT doc_id, source, {toks} AS toks, "
         f"{arr_len(dialect, toks)} AS n FROM {table}"),
        # per (source, word): occurrences + document frequency. df comes
        # from an IN-ROW deduplicated second stream (explode of
        # array_distinct — each doc contributes each word once) unioned
        # with the full occurrence stream: one partial-aggregated exchange
        # on (source, word) replaces the COUNT(DISTINCT doc_id) plan
        # (Expand x2 of the exploded stream + a second aggregate layer)
        ("__dv_wstats",
         f"SELECT source, word, CAST(SUM(o) AS BIGINT) AS occ, "
         f"CAST(SUM(d) AS BIGINT) AS df FROM ("
         f"SELECT source, 1 AS o, 0 AS d, "
         f"{explode(dialect, 'toks', 'word')} FROM __dv_tok "
         f"UNION ALL "
         f"SELECT source, 0 AS o, 1 AS d, "
         f"{explode(dialect, arr_distinct(dialect, 'toks'), 'word')} "
         f"FROM __dv_tok) __u GROUP BY source, word"),
        ("__dv_grams",
         "SELECT source, "
         f"{explode(dialect, _grams(dialect, 'toks', 'n', 3), 'gram')} "
         "FROM __dv_tok"),
        ("__dv_gstats",
         "SELECT source, gram, CAST(COUNT(*) AS BIGINT) AS occ "
         "FROM __dv_grams GROUP BY source, gram"),
        ("__dv_gagg",
         "SELECT source, SUM(occ) AS n_gram_occ, "
         "SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS n_uniq_grams "
         "FROM __dv_gstats GROUP BY source"),
        ("__dv_wagg",
         "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct_words, "
         "SUM(occ) AS n_words, SUM(df) AS sum_df "
         "FROM __dv_wstats GROUP BY source"),
        # doc counts off the (persisted) token stage — row-preserving
        # projection of the table, so a third table scan is unnecessary
        ("__dv_docs",
         "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM __dv_tok "
         "GROUP BY source"),
    ]
    ttr = idiv(dialect, "w.n_distinct_words * 10000", "w.n_words")
    uniq = idiv(dialect, "g.n_uniq_grams * 10000", "g.n_gram_occ")
    dpw = idiv(dialect, "w.sum_df * 10000", "w.n_distinct_words")
    final = (
        "SELECT d.source, d.n_docs, "
        "CAST(w.n_words AS BIGINT) AS n_words, "
        "w.n_distinct_words, "
        f"CAST(CASE WHEN w.n_words > 0 THEN {ttr} ELSE 0 END "
        "AS BIGINT) AS ttr_bp, "
        f"CAST(CASE WHEN g.n_gram_occ > 0 THEN {uniq} ELSE 0 END "
        "AS BIGINT) AS uniq_trigram_bp, "
        f"CAST(CASE WHEN w.n_distinct_words > 0 THEN {dpw} ELSE 0 END "
        "AS BIGINT) AS docs_per_word_bp "
        "FROM __dv_docs d JOIN __dv_wagg w ON d.source = w.source "
        "JOIN __dv_gagg g ON d.source = g.source "
        "ORDER BY d.source")
    return stages, final
