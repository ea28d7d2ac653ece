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

from .dual import arr_filter, explode, idiv

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
    excluded from the scored corpus; their distinct tokens are the query
    terms."""
    stages = [
        ("__bmt",
         f"SELECT doc_id, CASE WHEN {query_pred} THEN 1 ELSE 0 END AS is_q, "
         f"{explode(dialect, _tokens(dialect, col), 'w')} FROM {table}"),
        # corpus term frequencies + document lengths
        ("__bmf",
         "SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf "
         "FROM __bmt WHERE is_q = 0 GROUP BY doc_id, w"),
        ("__bml",
         "SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl "
         "FROM __bmf GROUP BY doc_id"),
        ("__bmg",
         "SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, "
         "CAST(SUM(dl) AS BIGINT) AS tot FROM __bml"),
        # distinct query terms
        ("__bmq",
         "SELECT DISTINCT doc_id AS qid, w FROM __bmt WHERE is_q = 1"),
        # posting-list lengths -> integer idf surrogate (broadcast-sized).
        # Only query terms are ever scored, so the df aggregate is
        # semi-joined to the (small) query vocabulary up front — the
        # GROUP BY shrinks from |corpus vocab| to |query vocab| keys
        ("__bmi",
         f"SELECT w, {idiv(dialect, '(g.n_docs - df) * 10000', 'df')} "
         f"AS idf_bp FROM "
         f"(SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM __bmf "
         f"WHERE w IN (SELECT w FROM __bmq) "
         f"GROUP BY w) __df, __bmg g"),
        # probe the tf table on the term; saturate tf; weight by idf
        ("__bms",
         f"SELECT q.qid, f.doc_id, CAST(SUM(i.idf_bp * "
         f"{idiv(dialect, 'f.tf * ' + str((100 + K1_C) * 100) + ' * 10000', 'f.tf * 10000 + ' + idiv(dialect, str(K1_C) + ' * (10000 - ' + str(B_C * 100) + ' + ' + idiv(dialect, str(B_C * 100) + ' * l.dl * g.n_docs', 'g.tot') + ')', '100'))}"
         f") AS BIGINT) AS score_bp "
         f"FROM __bmq q JOIN __bmf f ON q.w = f.w "
         f"JOIN __bml l ON f.doc_id = l.doc_id "
         f"JOIN __bmi i ON f.w = i.w, __bmg g "
         f"GROUP BY q.qid, f.doc_id"),
        ("__bmr",
         "SELECT qid, doc_id, score_bp, ROW_NUMBER() OVER "
         "(PARTITION BY qid ORDER BY score_bp DESC, doc_id ASC) AS rank "
         "FROM __bms WHERE score_bp > 0"),
    ]
    final = (f"SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id, score_bp "
             f"FROM __bmr WHERE rank <= {topk} ORDER BY qid, rank")
    return stages, final
