"""Per-document top terms with corpus document frequencies — the integer
skeleton of tf-idf keyword extraction.

Rank terms per document by (tf DESC, df ASC, term ASC): high in-document
frequency first, corpus-rare breaking ties — the same ordering
tf·idf(=ln((N+1)/(df+1))+1) induces whenever tf differs, without any
transcendental math. That is deliberate: ``ln`` is libm-dependent (see
pipeline/distinct.py's linear-counting note), so a float score could
rank-flip between engines on near-ties; the integer key is bit-portable
and the (tf, df) pair lets callers compute any idf weighting they like.

Plan shape at scale: one explode over the token arrays, one aggregate to
(doc, term, tf), one aggregate to (term, df) with a broadcast-size result
joined back, one per-doc window for the top-k — the canonical two-shuffle
term-statistics pipeline.
"""

from __future__ import annotations

from .dual import arr_filter, explode


def _tokens(dialect: str, col: str) -> str:
    """lower-cased alnum tokens, identical split in both engines."""
    split = (f"split(lower({col}), '[^a-z0-9]+')" if dialect == "spark"
             else f"regexp_split_to_array(lower({col}), '[^a-z0-9]+')")
    return arr_filter(dialect, split, "t -> t <> ''")


def top_terms_stages(dialect: str, k: int = 3, min_len: int = 3,
                     table: str = "documents"
                     ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> up to k rows per doc:
    (doc_id, term, tf, df, rank). Terms shorter than ``min_len`` are
    dropped (they are almost always stopwords/noise)."""
    toks = _tokens(dialect, "text")
    expl = f"SELECT doc_id, {explode(dialect, toks, 'term')} FROM {table}"
    stages = [
        ("__tte", f"SELECT doc_id, term FROM ({expl}) __x "
                  f"WHERE length(term) >= {min_len}"),
        ("__ttf",
         "SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf "
         "FROM __tte GROUP BY doc_id, term"),
        ("__tdf",
         "SELECT term, CAST(COUNT(*) AS BIGINT) AS df "
         "FROM __ttf GROUP BY term"),
        # rank filter INSIDE the stage (filter-over-window in one SELECT
        # keeps Spark's WindowGroupLimit top-k pushdown), and _mz: the
        # final's global ORDER BY otherwise re-evaluates the whole
        # join+window chain for range-bound sampling; the materialized
        # relation is the output-sized top-k per doc, never the full
        # (doc, term) table
        ("__ttk_mz",
         "SELECT doc_id, term, tf, df, rank FROM ("
         "SELECT f.doc_id, f.term, f.tf, d.df, "
         "ROW_NUMBER() OVER (PARTITION BY f.doc_id "
         "ORDER BY f.tf DESC, d.df ASC, f.term ASC) AS rank "
         f"FROM __ttf f JOIN __tdf d ON f.term = d.term) __r "
         f"WHERE rank <= {k}"),
    ]
    final = (f"SELECT doc_id, term, tf, df, CAST(rank AS BIGINT) AS rank "
             f"FROM __ttk_mz ORDER BY doc_id, rank")
    return stages, final
