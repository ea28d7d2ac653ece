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
                         max_train_gram_df: int = 10_000,
                         max_grams_per_doc: int | None = None
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
    than this many TRAIN docs is dropped too, so the ``__cov_mz`` join's
    per-gram fan-out is bounded by max_train_gram_df x max_gram_df on
    both sides (without it, one boilerplate gram in 10M train docs x 50
    eval docs = 500M join rows). Train-side document frequency is only
    counted for grams that survive the eval filter — the broadcast-sized
    eval gram list prunes the count's shuffle to the gram intersection —
    and the over-cap gram list (tiny by construction) excludes via
    anti-join, not a kept-list join.

    ``max_grams_per_doc`` (the capped-shingle-sample volume diet — same
    strategy as dedup.py's scale notes): keep only the M SMALLEST distinct
    gram codes per TRAIN doc. Gram codes are integer hashes, so the M
    smallest are a uniform deterministic sample of the doc's gram set
    (bottom-M min-hash). EVAL grams stay exhaustive, so eval-set recall is
    unchanged; the train-side recall bound is: a (train, eval) pair
    sharing S grams out of a train doc's T distinct grams retains
    ~S*min(1, M/T) shared grams in expectation, so choose
    M >= T*min_shared/S_target for the overlaps that must stay above the
    threshold. None (default) disables the cap. The fixture passes a cap
    far above any sf0.01/0.1 doc's distinct-gram count, so fixture
    semantics are identical with or without it."""
    grams = dual.gram_int_array(dialect, col, k)
    gs_train = "gs"
    if max_grams_per_doc is not None:
        # bottom-M selection is order-free: sort then slice (both engines
        # 1-based slice via dual.arr_slice)
        from ..dialect import array_sort
        gs_train = dual.arr_slice(dialect, array_sort(dialect, "gs"),
                                  "1", str(max_grams_per_doc))
    stages = [
        ("__cge",
         f"SELECT doc_id, {dual.arr_distinct(dialect, grams)} AS gs "
         f"FROM {table} WHERE {eval_pred}"),
        ("__cgt0",
         f"SELECT doc_id, {dual.arr_distinct(dialect, grams)} AS gs "
         f"FROM {table} WHERE NOT ({eval_pred})"),
        ("__cgt", f"SELECT doc_id, {gs_train} AS gs FROM __cgt0"),
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
        # ---- candidate pruning by necessary condition (the similarity-
        # join length-filter idea, as in dedup.py's ppjoin rewrite):
        # shared_grams(t, e) counts grams BOTH docs have that survive the
        # df filters, so it is bounded by each doc's own surviving-gram
        # count — any doc with fewer than min_shared surviving grams can
        # never reach the HAVING threshold and is dropped BEFORE the pair
        # join. On corpora whose docs are shorter than min_shared grams
        # (most of any web corpus), this kills almost the entire join
        # input while remaining exact.
        ("__csef",
         "SELECT e.doc_id, e.sh FROM __cse e JOIN __cdf d ON e.sh = d.sh"),
        ("__csek",
         "SELECT doc_id, sh FROM ("
         "SELECT doc_id, sh, COUNT(*) OVER (PARTITION BY doc_id) AS __dn "
         f"FROM __csef) __w WHERE __dn >= {min_shared}"),
        # train x eval-surviving gram intersection, materialized once
        # (run_stages persists it: referenced by __cxt and __cstk)
        ("__cstf",
         "SELECT t.doc_id, t.sh FROM __cst t JOIN __cdf d ON t.sh = d.sh"),
        # train-side df cap over the FULL intersection (cap semantics are
        # defined pre-pruning); over-cap grams form a TINY exclusion list
        ("__cxt",
         f"SELECT sh FROM __cstf "
         f"GROUP BY sh HAVING COUNT(*) > {max_train_gram_df}"),
        ("__cstk",
         "SELECT doc_id, sh FROM ("
         "SELECT doc_id, sh, COUNT(*) OVER (PARTITION BY doc_id) AS __dn "
         f"FROM __cstf) __w WHERE __dn >= {min_shared}"),
        # NOT EXISTS, not NOT IN: the join key is provably non-null, and
        # NOT EXISTS plans as a plain (hashed) anti join on both engines —
        # NOT IN forces Spark's null-aware anti join machinery
        # _mz: the final's global ORDER BY range-samples its child before
        # sorting it, so an unmaterialized __cov chain — the widest join
        # of the whole pipeline — EXECUTES TWICE per call (measured at
        # sf0.1: the pair join emitted 35.9M rows = 2 x its true 17.95M;
        # two ~3 s stages read the same 8 MB exchange). Materializing the
        # tiny post-HAVING pair table (42 rows here) makes the sort's two
        # passes hit the cache; same rows, same engine contract
        ("__cov_mz",
         "SELECT t.doc_id AS train_id, e.doc_id AS eval_id, "
         "CAST(COUNT(*) AS BIGINT) AS shared_grams "
         "FROM __cstk t JOIN __csek e ON t.sh = e.sh "
         "WHERE NOT EXISTS (SELECT 1 FROM __cxt x WHERE x.sh = t.sh) "
         f"GROUP BY t.doc_id, e.doc_id HAVING COUNT(*) >= {min_shared}"),
    ]
    final = ("SELECT o.train_id, o.eval_id, o.shared_grams, "
             "t.n AS train_grams, e.n AS eval_grams, "
             # integer percentage of the eval doc covered (x100 for 2dp);
             # explicit integer division — CAST(double) truncates in Spark
             # but rounds in DuckDB
             f"{idiv(dialect, 'o.shared_grams * 10000', 'e.n')} "
             "AS overlap_pct_x100 "
             "FROM __cov_mz o JOIN __cnt t ON o.train_id = t.doc_id "
             "JOIN __cne e ON o.eval_id = e.doc_id "
             "ORDER BY o.train_id, o.eval_id")
    return stages, final
