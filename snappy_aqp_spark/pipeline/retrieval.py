"""BM25-shaped lexical retrieval — top-k corpus documents per query.

Data-curation pipelines use lexical retrieval constantly: retrieval-based
decontamination (find training docs that "answer" an eval query),
source-overlap auditing, nearest-neighbor text attribution. This operator
scores corpus documents against a set of query documents with a BM25-form
ranking function and returns the top-k per query.

The plan is the classic distributed inverted-index shape, all equi-joins:
term frequencies per document (one tokenize pass + a (doc, term) groupBy),
document frequencies per term (a (term) groupBy — the posting-list
lengths), then query terms probe the tf table with a shuffle join keyed on
the term, partial-aggregated per (query, doc). The df/idf relation and
query-term relation are tiny and broadcast. At 100 TB the only wide
shuffle is the (term)-keyed probe, which is the theoretical minimum for
lexical retrieval.

All-integer scoring (exact on both engines, no libm):
  * tf saturation is BM25's  tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    computed in basis points with k1 = 1.2, b = 0.75 as integer constants
    and dl/avgdl = dl·n_docs/total_tokens under floor division;
  * the idf factor is the rational surrogate (n_docs − df)·10⁴ // df —
    order-equivalent to Robertson idf (both strictly decreasing in df),
    exactly representable; a term present in every document scores 0.
Scores are BIGINT "score basis points"; ranking ties break to the
smaller doc_id, so the output is fully deterministic.
"""

from __future__ import annotations

from .dual import arr_filter, explode, hint, idiv

K1_C = 120        # k1 = 1.2, in hundredths
B_C = 75          # b  = 0.75, in hundredths


def _tokens(dialect: str, col: str) -> str:
    split = (f"split(lower({col}), '[^a-z0-9]+')" if dialect == "spark"
             else f"regexp_split_to_array(lower({col}), '[^a-z0-9]+')")
    return arr_filter(dialect, split, "t -> t <> ''")


def bm25_topk_stages(dialect: str, query_pred: str, topk: int = 5,
                     table: str = "documents", col: str = "text"
                     ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> top-``topk`` corpus docs per query doc:
    (qid, rank, doc_id, score_bp). Query documents (``query_pred``) are
    excluded from the RESULTS; corpus statistics (tf, dl, df, n_docs,
    total tokens) cover the whole indexed table — standard BM25, where
    the index never depends on the query. That independence is what lets
    every ``*_ix`` stage survive across different queries:
    dual.run_stages keys its index cache on the stage's transitive SQL
    closure, so a NEW ``query_pred`` probes the already-persisted
    postings instead of rebuilding them (round-8 ADVICE)."""
    stages = [
        # INDEX stages (query-independent; *_ix persists across calls):
        # term frequencies, doc lengths, global stats, posting-list
        # lengths, and the postings carrying the ENTIRE doc-side BM25
        # factor — tf saturation depends only on (tf, dl, n_docs, tot),
        # all corpus-side, so it is precomputed into the index. The
        # corpus-sized (doc_id) join between tf and dl happens ONCE at
        # index-build time; the per-query path below never joins two
        # corpus-sized relations again.
        ("__bmf_ix",
         f"SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM "
         f"(SELECT doc_id, {explode(dialect, _tokens(dialect, col), 'w')} "
         f"FROM {table}) __bmtok GROUP BY doc_id, w"),
        ("__bml_ix",
         "SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl "
         "FROM __bmf_ix GROUP BY doc_id"),
        ("__bmg_ix",
         "SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, "
         "CAST(SUM(dl) AS BIGINT) AS tot FROM __bml_ix"),
        ("__bmdf_ix",
         "SELECT w, CAST(COUNT(*) AS BIGINT) AS df "
         "FROM __bmf_ix GROUP BY w"),
        # REPARTITION(doc_id): lays the CACHED postings out doc-major, so
        # the probe's partial (qid, doc_id) aggregation collapses each
        # doc's per-term contributions inside its map task — measured at
        # sf0.1: map-side agg 4.43M -> 3.35M rows (25%) under the build's
        # (doc_id, w) hash layout vs 4.43M -> ~250k (18x) doc-major; the
        # probe shuffle drops 36 MB -> ~2.5 MB. Physical-only (one extra
        # exchange at index build, amortized across probes); DuckDB text
        # identical
        ("__bmp_ix",
         f"SELECT {hint(dialect, 'REPARTITION(doc_id)')}"
         f"f.w, f.doc_id, CAST("
         f"{idiv(dialect, 'f.tf * ' + str((100 + K1_C) * 100) + ' * 10000', 'f.tf * 10000 + ' + idiv(dialect, str(K1_C) + ' * (10000 - ' + str(B_C * 100) + ' + ' + idiv(dialect, str(B_C * 100) + ' * l.dl * g.n_docs', 'g.tot') + ')', '100'))}"
         f" AS BIGINT) AS sat_bp "
         f"FROM __bmf_ix f JOIN __bml_ix l ON f.doc_id = l.doc_id, "
         f"__bmg_ix g"),
        # QUERY path: the query doc ids come from a predicate-pushed scan
        # of the base table (tiny by construction, no tokenization)
        ("__bmqd",
         f"SELECT DISTINCT doc_id AS qid FROM {table} WHERE {query_pred}"),
        # query terms come from the PERSISTED tf index, not a re-tokenize
        # of the query docs: DISTINCT (doc_id, w) of a document IS its tf
        # index rows (same tokenizer builds both; a zero-token query doc
        # is absent from either form and can never match or be matched),
        # so a broadcast semi against the index replaces a second
        # scan+regex+explode of the base table on every call
        ("__bmq",
         f"SELECT {hint(dialect, 'BROADCAST(x)')}f.doc_id AS qid, f.w "
         f"FROM __bmf_ix f JOIN __bmqd x ON f.doc_id = x.qid"),
        # idf for the query vocabulary — a broadcast semi-join of the df
        # index against the (tiny) query term set
        ("__bmi",
         f"SELECT {hint(dialect, 'BROADCAST(__qv)')}d.w, "
         f"{idiv(dialect, '(g.n_docs - d.df) * 10000', 'd.df')} "
         f"AS idf_bp FROM __bmdf_ix d "
         f"JOIN (SELECT DISTINCT w FROM __bmq) __qv ON d.w = __qv.w, "
         f"__bmg_ix g"),
        # (qid, w, idf_bp) in ONE query-sized relation: idf attaches to the
        # query terms BEFORE the posting probe (w is unique in __bmi, so
        # the attach is lossless), which saves one broadcast probe per
        # posting row on the widest stream of the query path
        ("__bmqi",
         f"SELECT {hint(dialect, 'BROADCAST(i)')}q.qid, q.w, i.idf_bp "
         f"FROM __bmq q JOIN __bmi i ON i.w = q.w"),
        # probe: one pass over the cached postings with every query-sized
        # relation broadcast (q and the query-doc anti side x) — no
        # sort-merge exchange anywhere on the query path; the only
        # shuffle left is the (qid, doc) partial agg
        ("__bms",
         f"SELECT {hint(dialect, 'BROADCAST(q, x)')}"
         f"q.qid, p.doc_id, "
         f"CAST(SUM(q.idf_bp * p.sat_bp) AS BIGINT) AS score_bp "
         f"FROM __bmqi q JOIN __bmp_ix p ON q.w = p.w "
         f"LEFT JOIN __bmqd x ON x.qid = p.doc_id "
         f"WHERE x.qid IS NULL "
         f"GROUP BY q.qid, p.doc_id"),
        ("__bmr",
         "SELECT qid, doc_id, score_bp, ROW_NUMBER() OVER "
         "(PARTITION BY qid ORDER BY score_bp DESC, doc_id ASC) AS rank "
         "FROM __bms WHERE score_bp > 0"),
    ]
    final = (f"SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id, score_bp "
             f"FROM __bmr WHERE rank <= {topk} ORDER BY qid, rank")
    return stages, final
