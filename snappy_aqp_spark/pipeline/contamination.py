"""Benchmark-decontamination overlap detection: which training documents
share suspicious amounts of verbatim text with an evaluation set.

Before training on a scraped corpus you must find (and usually drop) the
documents that contain eval-benchmark material — the standard method is
char/token n-gram overlap (as used for the public web-corpus
decontamination pipelines): a training doc is CONTAMINATED if it shares
at least ``min_shared`` distinct k-grams with any eval doc.

Plan shape at 100 TB: shingle both sides into integer k-gram codes
(`dual.gram_int_array` — exact ints, no string shuffles), frequency-cap
the gram join key on the EVAL side only (the eval set is small; common
grams like whitespace runs would otherwise fan out), then one equi-join
on the gram code + a (train_doc, eval_doc) count aggregate. The train
corpus is scanned once and shuffled only by gram code; the eval shingle
set is usually broadcast-sized.

The fixture marks documents ``doc_id % 17 == 0`` as the "eval set" and
scans the rest — with the corpus's planted near-duplicates, overlaps
exist by construction. Output is fully deterministic (integer counts).
"""

from __future__ import annotations

from . import dual
from .dual import idiv


def contamination_stages(dialect: str, k: int = 7, min_shared: int = 100,
                         eval_pred: str = "doc_id % 17 = 0",
                         table: str = "documents", col: str = "text",
                         max_gram_df: int = 50,
                         max_train_gram_df: int = 10_000
                         ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per contaminated (train, eval) pair:
    (train_id, eval_id, shared_grams, train_grams, eval_grams,
    overlap_pct_x100). ``max_gram_df``: eval-side grams appearing in more
    than this many eval docs are dropped from the join key — both the
    standard boilerplate filter (ubiquitous grams carry no contamination
    signal) and the skew guard (a gram in most eval docs multiplies the
    join fan-out by the eval-set size; at the default the sweep runs ~2×
    faster and reports verbatim overlaps only). Counts for surviving
    grams stay exact.

    ``max_train_gram_df`` is the SYMMETRIC cap: a gram present in more
    than this many TRAIN docs is dropped too, so the ``__cov`` join's
    per-gram fan-out is bounded by max_train_gram_df x max_gram_df on
    both sides (without it, one boilerplate gram in 10M train docs x 50
    eval docs = 500M join rows). Train-side document frequency is only
    counted for grams that survive the eval filter — the broadcast-sized
    eval gram list prunes the count's shuffle to the gram intersection —
    and the over-cap gram list (tiny by construction) excludes via
    anti-join, not a kept-list join."""
    grams = dual.gram_int_array(dialect, col, k)
    stages = [
        ("__cge",
         f"SELECT doc_id, {dual.arr_distinct(dialect, grams)} AS gs "
         f"FROM {table} WHERE {eval_pred}"),
        ("__cgt",
         f"SELECT doc_id, {dual.arr_distinct(dialect, grams)} AS gs "
         f"FROM {table} WHERE NOT ({eval_pred})"),
        # per-doc distinct-gram counts come free off the distinct arrays —
        # an explode + GROUP BY here would re-shuffle the whole corpus
        ("__cne",
         f"SELECT doc_id, CAST({dual.arr_len(dialect, 'gs')} AS BIGINT) "
         f"AS n FROM __cge"),
        ("__cnt",
         f"SELECT doc_id, CAST({dual.arr_len(dialect, 'gs')} AS BIGINT) "
         f"AS n FROM __cgt"),
        ("__cse",
         f"SELECT doc_id, {dual.explode(dialect, 'gs', 'sh')} FROM __cge"),
        ("__cst",
         f"SELECT doc_id, {dual.explode(dialect, 'gs', 'sh')} FROM __cgt"),
        # eval-side gram document frequency -> drop boilerplate grams
        ("__cdf",
         f"SELECT sh FROM __cse GROUP BY sh "
         f"HAVING COUNT(*) <= {max_gram_df}"),
        # train-side df over the eval-surviving gram intersection only;
        # grams above the cap form a TINY exclusion list
        ("__cxt",
         f"SELECT t.sh FROM __cst t JOIN __cdf d ON t.sh = d.sh "
         f"GROUP BY t.sh HAVING COUNT(*) > {max_train_gram_df}"),
        ("__cov",
         "SELECT t.doc_id AS train_id, e.doc_id AS eval_id, "
         "CAST(COUNT(*) AS BIGINT) AS shared_grams "
         "FROM __cst t JOIN __cdf d ON t.sh = d.sh "
         "JOIN __cse e ON t.sh = e.sh "
         "WHERE t.sh NOT IN (SELECT sh FROM __cxt) "
         f"GROUP BY t.doc_id, e.doc_id HAVING COUNT(*) >= {min_shared}"),
    ]
    final = ("SELECT o.train_id, o.eval_id, o.shared_grams, "
             "t.n AS train_grams, e.n AS eval_grams, "
             # integer percentage of the eval doc covered (x100 for 2dp);
             # explicit integer division — CAST(double) truncates in Spark
             # but rounds in DuckDB
             f"{idiv(dialect, 'o.shared_grams * 10000', 'e.n')} "
             "AS overlap_pct_x100 "
             "FROM __cov o JOIN __cnt t ON o.train_id = t.doc_id "
             "JOIN __cne e ON o.eval_id = e.doc_id "
             "ORDER BY o.train_id, o.eval_id")
    return stages, final
