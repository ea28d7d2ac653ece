"""Query-fixture registry: every operator claimed in SURVEY.md §2 gets a
named spec here, powering both ``__spark_entry__.queries()`` and
``__spark_entry__.oracle_sql()``.

Mirrors the reference's perf/functional query corpus
(src/test/java/io/snappydata/app/perfQueries.sql, perfFunctionalQueries.sql,
perfJoinQueries.sql) re-targeted at the driver's TPC-H-ish tables.
"""

from __future__ import annotations

from .pipeline import bloom as _bl
from .pipeline import chunking as _ck
from .pipeline import contamination as _cn
from .pipeline import dedup as _dd
from .operators import two_sample as _ts2
from .pipeline import diagnostics as _dg
from .pipeline import diversity as _dv
from .pipeline import funnel as _fn
from .pipeline import distinct as _dc
from .pipeline import histogram as _hg
from .pipeline import quantiles as _qt
from .pipeline import zorder as _zo
from .pipeline import sessions as _ss
from .pipeline import similarity as _sim
from .pipeline import split as _sp
from .pipeline import packing as _pk
from .pipeline import repetition as _rp
from .pipeline import incremental as _ic
from .pipeline import lm as _lm
from .pipeline import retrieval as _rv
from .pipeline import grouped_topk as _gt
from .pipeline import salting as _sa
from .pipeline import spans as _dsp
from .pipeline import pii as _pii
from .pipeline import temporal as _tp
from .pipeline import terms as _tm
from .pipeline import text as _tx
from .pipeline import weighted as _wt
from .specs import ApproxAgg, ApproxQuerySpec, JoinSpec, SampleSpec
from .topk.api import TopKSpec

# --- data-pipeline fixtures (dedup / similarity; dual-dialect stages) -------
PIPELINE_FIXTURES: dict[str, dict] = {
    "dedup_exact": {
        "builder": _dd.exact_dedup_stages, "kw": {}, "tables": ("documents",)},
    # 0.8 is the standard near-verbatim threshold: the planted near-dups
    # sit at jaccard ~0.93-0.99, and the prefix length (c - ceil(t*n) + 1)
    # shrinks ~2.5x vs t=0.5, which is what bounds the candidate join
    "dedup_ngram_jaccard": {
        "builder": _dd.ngram_jaccard_stages, "kw": {"threshold": 0.8},
        "tables": ("documents",)},
    # PII scan + redaction (map-only pass; backslash-free patterns keep
    # the regex text identical across engines). The corpus carries no PII,
    # so the fixture injects deterministic doc_id-derived emails/IPs/
    # phones first — extraction, counting and chained redaction all fire
    "pii_scan": {
        "builder": _pii.pii_fixture_stages, "kw": {},
        "tables": ("documents",)},
    # RefinedWeb/Falcon line-level dedup: corpus-repeated lines removed
    # from EVERY document, documents rebuilt in original order. The
    # synthetic corpus has no newlines, so the fixture folds docs into
    # 3-word lines first (deterministic, both engines) — near-dup docs
    # share folded lines, exercising the removal + rebuild branches
    "dedup_lines": {
        "builder": _dd.line_dedup_fixture_stages, "kw": {},
        "tables": ("documents",)},
    # k=7 shingles: background char-gram Jaccard on natural text is high at
    # k=5 (~0.17 here), flooding the bands with false-positive candidates;
    # k=7 drops it ~3x while staying injective in the 257^j polynomial code
    "dedup_minhash_lsh": {
        "builder": _dd.minhash_lsh_stages, "kw": {"threshold": 0.5, "k": 7},
        "tables": ("documents",)},
    "dedup_simhash": {
        "builder": _dd.simhash_stages, "kw": {"max_hamming": 3},
        "tables": ("documents",)},
    # planted near-dups (deterministic integer perturbation, cos ~ 0.99)
    # + multi-table hyperplane LSH candidates + exact verify — the equi-join
    # scale path; cosine_pairs_stages is the brute-force small-N verifier
    "dedup_embedding_cosine": {
        "builder": _sim.near_dup_pairs_stages, "kw": {"threshold": 0.9},
        "tables": ("embeddings",)},
    "ann_cosine_topk": {
        "builder": _sim.brute_force_topk_stages, "kw": {},
        "tables": ("embeddings",)},
    "ann_lsh_topk": {
        "builder": _sim.lsh_topk_stages, "kw": {},
        "tables": ("embeddings",)},
    # centroid-partitioned IVF-Flat (deterministic seed subsample + one SQL
    # Lloyd step); probing scans nprobe/n_centroids of the corpus
    "ann_ivf_topk": {
        "builder": _sim.ivf_topk_stages, "kw": {},
        "tables": ("embeddings",)},
    # product-quantization ANN: 4-dim subspaces x 16 codewords (one SQL
    # Lloyd step), ADC codes-only scan + exact re-rank of a 20x shortlist;
    # recall@3 ~ 0.92 vs brute force on the (worst-case random) corpus,
    # pinned by pytest
    "ann_pq_topk": {
        "builder": _sim.pq_topk_stages, "kw": {"n_sub": 16, "refine": 20},
        "tables": ("embeddings",)},
    # SemDeDup (Abbas et al. 2023): k-means + within-cluster cosine
    # pruning, keep the least-typical member of each duplicate group.
    # eps=0.95 sits between the planted near-dups (cos ~0.997) and the
    # random background (max ~0.6): the drop branch provably fires
    "semantic_dedup": {
        "builder": _sim.semantic_dedup_stages, "kw": {"eps": 0.95},
        "tables": ("embeddings",)},
    # deterministic SQL HyperLogLog (p=6 -> 64 registers; documents has
    # 500 distinct doc_ids, safely above the 2.5m linear-counting branch
    # so the libm-free raw path is active — see pipeline/distinct.py)
    "approx_distinct_hll": {
        "builder": _dc.hll_distinct_stages,
        "kw": {"p": 6, "key_kind": "bigint"},   # doc_id is int64: the
        # integer avalanche hash replaces per-row md5 (round-9)
        "tables": ("documents",)},
    # doc-length percentiles from a uniform hash-sample with
    # distribution-free binomial order-statistic CIs (all-integer ranking)
    "approx_quantiles": {
        "builder": _qt.uniform_quantile_stages, "kw": {},
        "tables": ("documents",)},
    # per-language doc-length percentiles: same order-statistic estimator,
    # windows and joins keyed per group (one shared group-key shuffle)
    "approx_quantiles_grouped": {
        "builder": _qt.grouped_quantile_stages, "kw": {},
        "tables": ("documents",)},
    # gap-based sessionization: one shuffle on user_id, window + rollup
    # reuse the exchange (12h silence splits sessions on this corpus)
    "sessionize_events": {
        "builder": _ss.sessionize_stages, "kw": {},
        "tables": ("events",)},
    # distributed merge-join as-of: most recent click at or before each
    # purchase, one shuffle + one window (no BroadcastNestedLoopJoin)
    "asof_join_clicks": {
        "builder": _tp.asof_join_stages, "kw": {},
        "tables": ("events",)},
    # bucketed interval join: activity inside the 1-day window after each
    # error event; equi-join on (user, time-bucket) + residual range filter
    "range_join_activity": {
        "builder": _tp.range_join_stages, "kw": {},
        "tables": ("events",)},
    # bloom-filter semi-join pruning (explicit runtime-filter): the packed
    # dim-side bit-set prunes the fact scan before the shuffle; result is
    # exactly the plain join's (FPs removed by the join itself)
    "bloom_semi_join": {
        "builder": _bl.bloom_semi_join_stages, "kw": {},
        "tables": ("lineitem", "orders")},
    # skew-salted equi-join: heavy keys spread over salt_factor reducers,
    # result row-for-row the plain join (pinned by pytest; the driver
    # oracle replays the same staged SQL)
    "skew_salted_join": {
        "builder": _sa.salted_join_stages, "kw": {},
        "tables": ("orders", "customer")},
    # grouped top-k with rank-limit pushdown (WindowGroupLimit): one
    # combine-enabled shuffle + per-partition bounded-heap top-k
    "grouped_topk": {
        "builder": _gt.grouped_topk_stages, "kw": {},
        "tables": ("events",)},
    # reproducible per-stratum train/val/test split (exact quotas here;
    # the zero-shuffle hash-threshold variant is pytest-covered)
    "stratified_split": {
        "builder": _sp.split_assign_stages, "kw": {},
        "tables": ("documents",)},
    # per-doc top terms with corpus df (integer-ranked tf-idf skeleton)
    "text_top_terms": {
        "builder": _tm.top_terms_stages, "kw": {},
        "tables": ("documents",)},
    # weighted (PPS) corpus sampling by systematic stride over a hash
    # order: all-integer, heavy rows always kept, exact HT rationals
    "pps_weighted_sample": {
        "builder": _wt.pps_sample_stages, "kw": {},
        "tables": ("documents",)},
    # dense fixed-width doc-length histogram (integer binning)
    "corpus_histogram": {
        "builder": _hg.histogram_stages, "kw": {},
        "tables": ("documents",)},
    # per-source quota cap: deterministic uniform pick of <= cap per group
    "source_quota_cap": {
        "builder": _hg.quota_cap_stages, "kw": {},
        "tables": ("documents",)},
    # Z-order (Morton) layout analysis: bit-interleaved (user, value-band)
    # key, fixed z-prefix chunks (one GROUP BY, no global sort), per-chunk
    # min/max of BOTH dims — the multi-column data-skipping property,
    # value-checked end to end
    "zorder_layout": {
        "builder": _zo.zorder_chunk_stats_stages, "kw": {},
        "tables": ("events",)},
    # HLL set algebra: two overlapping populations' distinct estimates,
    # lossless register-max union, inclusion-exclusion intersection,
    # Jaccard — audience overlap without shuffling raw keys
    "hll_set_ops": {
        "builder": _dc.hll_set_ops_stages, "kw": {"key_kind": "bigint"},
        "tables": ("documents",)},
    # mergeable histogram quantiles: fixed-width bin counts add across
    # shards (no sampling, no raw-value sort); estimate = bin midpoint
    # with the bin's [lo, hi) as the deterministic error envelope
    "histogram_quantile": {
        "builder": _qt.histogram_quantile_stages, "kw": {},
        "tables": ("documents",)},
    "histogram_quantile_grouped": {
        "builder": _qt.histogram_quantile_stages,
        "kw": {"group_by": "lang"},
        "tables": ("documents",)},
    # Pearson correlation per column pair from quantized integer moment
    # sums (order-independent; per-column lattice scales)
    "column_correlation": {
        "builder": _dg.correlation_stages, "kw": {},
        "tables": ("lineitem",)},
    # benchmark decontamination: train docs sharing >= 100 distinct
    # 7-grams with the (doc_id % 17) "eval set" — one gram-code equi-join
    # max_grams_per_doc: bottom-M min-hash diet on the train side —
    # far above any sf0.01/0.1 doc's distinct-gram count (docs are <600
    # chars here), so fixture semantics equal the uncapped definition
    # while the capped path stays driver-verified
    "decontamination": {
        "builder": _cn.contamination_stages,
        "kw": {"max_grams_per_doc": 2048},
        "tables": ("documents",)},
    # fixed-size overlapping chunk windows (shuffle-free until consumed)
    "chunk_documents": {
        "builder": _ck.chunk_documents_stages, "kw": {},
        "tables": ("documents",)},
    # key-skew pre-flight report (top keys + basis-point shares)
    "skew_report": {
        "builder": _dg.skew_report_stages, "kw": {},
        "tables": ("events",)},
    # exact join-output cardinality + biggest key cell, without the join
    "join_cardinality": {
        "builder": _dg.join_cardinality_stages, "kw": {},
        "tables": ("lineitem", "orders")},
    # ordered conversion funnel (signup -> click -> purchase within 2
    # days), conditional-MIN cascade — no k-way self-join
    "event_funnel": {
        "builder": _fn.funnel_stages, "kw": {"within_days": 2},
        "tables": ("events",)},
    # weekly cohort retention triangle (saturated on this synthetic
    # corpus — every user is active every week; the computation and its
    # oracle are general)
    "cohort_retention": {
        "builder": _fn.cohort_retention_stages, "kw": {},
        "tables": ("events",)},
    # exact per-column data profile (nulls / distincts); the approximate
    # scale path is hll_distinct_stages
    "table_profile": {
        "builder": _dg.profile_stages, "kw": {},
        "tables": ("documents",)},
    # concat-and-chunk sequence packing: (sequence, document) segment map
    # over a bucketed-prefix-sum token stream (seq_len=128 so multi-doc
    # sequences AND multi-sequence docs both occur on this corpus)
    "sequence_pack": {
        "builder": _pk.sequence_pack_stages, "kw": {"seq_len": 128},
        "tables": ("documents",)},
    # domain-mixture resampling to target shares (basis points) with exact
    # per-source quotas and upweight rationals; no source is upsampled
    "mixture_resample": {
        "builder": _pk.mixture_resample_stages,
        "kw": {"targets": {"src0": 3000, "src1": 3000, "src2": 2000,
                           "src3": 1000, "src4": 1000}},
        "tables": ("documents",)},
    # Gopher-style within-document repetition quality signals
    "repetition_signals": {
        "builder": _rp.repetition_signals_stages, "kw": {},
        "tables": ("documents",)},
    # the reference's own deferred feature (JoinQueryRoutingTestSuite's
    # @ignore'd "test join of two sample tables"): two-table HT estimate
    # w_a*w_b*x with two-sided Poisson-bootstrap CIs (Acharya et al.
    # SIGMOD'99 join synopses / ripple-join estimator)
    "two_sample_join_sum": {
        "builder": _ts2.two_sample_join_sum_stages,
        "kw": {"spec_a": SampleSpec(
                   "lineitem", ("l_orderkey", "l_linenumber"),
                   ("l_returnflag",), "hash", 0.2, seed=42),
               "spec_b": SampleSpec(
                   "orders", ("o_orderkey",),
                   ("o_orderstatus",), "hash", 0.3, seed=43),
               "join_on": "a.l_orderkey = b.o_orderkey",
               "measure": "l_extendedprice",
               "group_by": "b.o_orderstatus",
               "out_alias": "rev", "max_abs": 2.0e7,
               "trials": 100, "confidence": 0.95},
        "tables": ("lineitem", "orders")},
    # SELF-join of two INDEPENDENT samples of the same table: requires
    # the nonlinear hash_rand method — affine hash streams with
    # different seeds are shifted intervals of the same key ordering
    # (nested/disjoint, never independent), which the operator rejects
    # outright. Drives the round-5 independence guard + hash_rand
    # sampler through the gate.
    "two_sample_self_join": {
        "builder": _ts2.two_sample_join_sum_stages,
        "kw": {"spec_a": SampleSpec(
                   "orders", ("o_orderkey",),
                   ("o_orderstatus",), "hash_rand", 0.3, seed=42),
               "spec_b": SampleSpec(
                   "orders", ("o_orderkey",),
                   ("o_orderstatus",), "hash_rand", 0.4, seed=971),
               "join_on": "a.o_orderkey = b.o_orderkey",
               "measure": "a.o_totalprice",
               "group_by": "a.o_orderstatus",
               "out_alias": "tp", "max_abs": 1.0e6,
               "trials": 60, "confidence": 0.95},
        "tables": ("orders",)},
    # source-level diversity rollup (mixture-design diagnostics): TTR,
    # unique-trigram fraction, mean per-word document frequency — the
    # shuffles carry (source, token) pairs only, never text
    "corpus_diversity": {
        "builder": _dv.corpus_diversity_stages, "kw": {},
        "tables": ("documents",)},
    # maximal duplicated token spans (suffix-array dedup semantics in
    # relational form: dup k-grams -> gaps-and-islands runs)
    "duplicate_spans": {
        "builder": _dsp.duplicate_spans_stages, "kw": {"k": 5},
        "tables": ("documents",)},
    # incremental dedup: screen an incoming batch (2 sources) against the
    # rest of the corpus — exact tier + asymmetric banded-LSH near tier
    "cross_corpus_dedup": {
        "builder": _ic.cross_corpus_dedup_stages,
        # the verify budget is an EXPLICIT opt-in here (round-9 ADVICE:
        # the public default is uncapped): 24 = 3x bands exceeds every
        # candidate multiplicity at fixture scales (capped == uncapped,
        # pytest-pinned) and bounds the 100x stress verify join; the
        # companion cap-report operator quantifies what it would drop
        "kw": {"new_pred": "source IN ('src18', 'src19')",
               "threshold": 0.5, "max_candidates_per_doc": 24},
        # the band/shingle lineage is referenced by several downstream
        # stages: inlined re-evaluation is quadratic at scale (see
        # __spark_entry__.oracle_sql)
        "materialize_oracle": True,
        "tables": ("documents",)},
    # BM25-shaped lexical retrieval: every 100th doc queries the rest
    "bm25_retrieval": {
        "builder": _rv.bm25_topk_stages,
        "kw": {"query_pred": "doc_id % 100 = 0", "topk": 5},
        "tables": ("documents",)},
    # whitespace / alnum / BPE-ish token accounting per document
    "token_stats": {
        "builder": _tx.token_stats_stages, "kw": {},
        "tables": ("documents",)},
    # one BPE training round (Sennrich et al. 2016): adjacent-pair counts
    # over the word-frequency table; iterating shuffles only the vocab
    "bpe_pair_counts": {
        "builder": _tx.bpe_pair_counts_stages, "kw": {"top_k": 20},
        "tables": ("documents",)},
    # C4 page-level cleaning rules (Raffel et al. 2020 §2.2): terminal
    # punctuation, min sentences, curly-brace/code markers, blocklist.
    # min_sentences=5 fires the drop branch on this corpus (docs fold to
    # few sentence spans)
    "c4_filters": {
        "builder": _tx.c4_fixture_stages, "kw": {"min_sentences": 5},
        "tables": ("documents",)},
    # Gopher quality-filter rules (Rae et al. 2021 Appendix A): per-doc
    # flags + keep decision, map-only. min_words=20 (not the paper's 50)
    # and a corpus-frequent stopword list so BOTH branches of every rule
    # fire on the synthetic corpus (which lacks most canonical stopwords)
    "gopher_quality": {
        "builder": _tx.gopher_quality_stages,
        "kw": {"min_words": 20,
               "stopwords": ("the", "a", "data", "join", "table",
                             "row", "key", "query")},
        "tables": ("documents",)},
    # hard-negative mining for contrastive retrieval training: most-similar
    # non-near-dup items per query (LSH-probed candidates, exact cosine,
    # dup band excluded)
    "hard_negative_mining": {
        "builder": _sim.hard_negative_mining_stages,
        "kw": {"dup_threshold": 0.9, "k": 3},
        "tables": ("embeddings",)},
    # bigram-LM novelty (integer floor-log2 surprise per transition) —
    # the no-model stand-in for perplexity quality filtering
    "lm_surprise": {
        "builder": _lm.lm_surprise_stages, "kw": {},
        "tables": ("documents",)},
    # DSIR-shaped importance selection: top-k out-of-target docs whose
    # unigram stream best matches the target domain's statistics
    "dsir_select": {
        "builder": _lm.dsir_select_stages,
        "kw": {"target_source": "src0", "k": 50},
        "tables": ("documents",)},
}

ALL_ERRORS = ("absolute_error", "relative_error", "lower_bound", "upper_bound")

# canonical samples over the driver tables (FIXTURES.md §B.1)
LI_HASH = SampleSpec("lineitem", ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
                     ("l_returnflag", "l_linestatus"), "hash", fraction=0.05, seed=42)
LI_RESERVOIR = SampleSpec("lineitem", ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
                          ("l_returnflag", "l_linestatus"), "reservoir",
                          fraction=0.05, reservoir_size=200, seed=42)
LI_FRACTION = SampleSpec("lineitem", ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
                         ("l_returnflag", "l_linestatus"), "fraction",
                         fraction=0.02, reservoir_size=50, seed=42)
LI_EXPR_QCS = SampleSpec("lineitem", ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
                         ("year(l_shipdate)",), "hash", fraction=0.05, seed=7)
ORD_HASH = SampleSpec("orders", ("o_orderkey",), ("o_orderpriority",),
                      "hash", fraction=0.1, seed=42)

_PRICE = 2.0 ** 17      # l_extendedprice < 105k
_QTY = 2.0 ** 6         # l_quantity <= 50
_TOTAL = 2.0 ** 19      # o_totalprice < 500k


# --- approximate time-series TopK fixtures (SURVEY §2.6) --------------------
_3D_US = 3 * 24 * 3600 * 1_000_000
# pinned epoch (2024-01-01T00:00:00Z): makes time buckets plan-time
# constants — no create-time min(ts) scan, and the replay oracle can emit
# the dyadic-cover slack terms as literals
_T_EPOCH = 1_704_067_200_000_000
_T_2024_01_08 = 1_704_672_000_000_000
_T_2024_01_22 = 1_705_881_600_000_000

TOPK_FIXTURES: dict[str, dict] = {
    # TopKHokusai-analog CMS table, full-range query
    "topk_cms_full": {
        "spec": TopKSpec("topk_cms_full", key="user_id", time_col="ts",
                         time_interval_us=_3D_US, epoch_us=_T_EPOCH, size=100, depth=7,
                         width=4096, num_partitions=8, int_key=True),
        "start": None, "end": None, "k": 20,
    },
    # between-time query over a sub-range (Hokusai getTopKBetweenTime)
    "topk_cms_window": {
        "spec": TopKSpec("topk_cms_window", key="user_id", time_col="ts",
                         time_interval_us=_3D_US, epoch_us=_T_EPOCH, size=100, depth=7,
                         width=4096, num_partitions=8, int_key=True),
        "start": _T_2024_01_08, "end": _T_2024_01_22, "k": 15,
    },
    # weighted frequency column (TopKWrapper frequencyCol)
    "topk_cms_freq": {
        "spec": TopKSpec("topk_cms_freq", key="user_id", time_col="ts",
                         time_interval_us=_3D_US, epoch_us=_T_EPOCH, size=100, depth=7,
                         width=4096, num_partitions=8, int_key=True,
                         frequency_col="CAST(FLOOR(value) AS BIGINT)"),
        "start": None, "end": None, "k": 20,
    },
    # Space-Saving stream summary variant
    "topk_streamsummary": {
        "spec": TopKSpec("topk_streamsummary", key="user_id", time_col="ts",
                         time_interval_us=_3D_US, epoch_us=_T_EPOCH, size=100,
                         stream_summary=True, capacity=4096,
                         num_partitions=8, int_key=True),
        "start": _T_2024_01_08, "end": None, "k": 20,
    },
    # two-sided time window over a Space-Saving table
    # (queryTopkStreamSummary with start+end,
    # SnappyContextAQPFunctions.scala:293-323)
    "topk_streamsummary_window": {
        "spec": TopKSpec("topk_streamsummary_window", key="user_id",
                         time_col="ts", time_interval_us=_3D_US,
                         epoch_us=_T_EPOCH, size=100, stream_summary=True,
                         capacity=4096, num_partitions=8, int_key=True),
        "start": _T_2024_01_08, "end": _T_2024_01_22, "k": 15,
    },
}

# --- SQL-surface fixtures (snappyAQPParsers.scala:39-106 parity) ------------
# Each runs through AQPSession.sql: DDL then a WITH-ERROR query. Oracle SQL
# derives from the identical session-free analysis (api.analyze_text).
_LI_DDL = ("CREATE SAMPLE TABLE li_sample ON lineitem OPTIONS("
           "qcs 'l_returnflag,l_linestatus', fraction '0.05', "
           "method 'hash', seed '42')")
# second candidate on the same base, different QCS and fraction: the
# selection-priority fixture registers BOTH and the query's GROUP BY
# matches exactly one
_LI_DDL_STATUS = ("CREATE SAMPLE TABLE li_by_status ON lineitem OPTIONS("
                  "qcs 'l_linestatus', fraction '0.2', "
                  "method 'hash', seed '7')")

SQL_FIXTURES: dict[str, dict] = {
    # sample-selection priority (reference sample choice rules,
    # QueryProcessingRules.scala + SampleSelectionTest protocols): with
    # two candidate samples on the base table, the query's GROUP BY
    # {l_linestatus} matches li_by_status's QCS EXACTLY, so it must be
    # chosen over the broader li_sample; the oracle replays the CHOSEN
    # spec, so a selection change flips fractions/seeds and hash-fails
    "sql_sample_priority": {
        "ddl": [_LI_DDL, _LI_DDL_STATUS],
        "tables": ("lineitem",),
        "query": ("SELECT l_linestatus, sum(l_extendedprice) AS rev, "
                  "relative_error(rev) FROM lineitem GROUP BY l_linestatus "
                  "ORDER BY l_linestatus WITH ERROR 0.5"),
    },
    "sql_with_error": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, sum(l_extendedprice) AS s, "
                  "absolute_error(s), relative_error(s), lower_bound(s), "
                  "upper_bound(s), count(*) AS c FROM lineitem "
                  "GROUP BY l_returnflag ORDER BY l_returnflag "
                  "WITH ERROR 0.5 CONFIDENCE 0.95"),
    },
    # approx query THROUGH a projection view (AbstractViewTest.scala:141-165:
    # WITH ERROR queries against a view of the base table must route to the
    # base table's sample; the view predicate conjoins with the query's)
    # two dimension joins on the sampled fact (JoinQueryTest protocols:
    # one sampled relation, every dimension exact)
    "sql_join_two_dims": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem", "orders", "customer"),
        "query": ("SELECT c_mktsegment, sum(l_extendedprice) AS rev, "
                  "absolute_error(rev), lower_bound(rev) "
                  "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
                  "JOIN customer ON o_custkey = c_custkey "
                  "GROUP BY c_mktsegment ORDER BY c_mktsegment "
                  "WITH ERROR 0.5 CONFIDENCE 0.95"),
    },
    # table aliases through FROM/JOIN (every query in the reference's perf
    # corpus is written this way: perfFunctionalQueries.sql,
    # perfJoinQueries.sql — `FROM FlightData fd, Flight fl, airlineRef`);
    # ORDER BY the aggregate alias mirrors `ORDER BY x` there
    "sql_alias_join": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem", "orders"),
        "query": ("SELECT o.o_orderstatus, sum(l.l_extendedprice) AS rev, "
                  "absolute_error(rev), relative_error(rev) "
                  "FROM lineitem l JOIN orders o "
                  "ON l.l_orderkey = o.o_orderkey "
                  "GROUP BY o.o_orderstatus ORDER BY rev DESC "
                  "WITH ERROR 0.5"),
    },
    # comma-style FROM list with join predicates in WHERE, incl. an OR of
    # substring() filters — the exact shape of perfJoinQueries.sql:1
    # (`FROM FlightData fd, Flight fl, airlineRef WHERE ... and
    # (substring(...)='S' or substring(...)='s')`); the cross joins stay
    # declarative and Catalyst/DuckDB fold the equalities into equi-joins
    "sql_comma_join": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem", "orders", "customer"),
        "query": ("SELECT avg(l.l_extendedprice) AS x, absolute_error(x), "
                  "relative_error(x) FROM lineitem l, orders o, customer c "
                  "WHERE l.l_orderkey = o.o_orderkey "
                  "AND o.o_custkey = c.c_custkey "
                  "AND (substring(c.c_mktsegment, 1, 1) = 'B' "
                  "OR substring(c.c_mktsegment, 1, 1) = 'A') "
                  "WITH ERROR 0.5 CONFIDENCE 0.95"),
    },
    # alias-qualified WHERE/ON kept VERBATIM through planning (round-5
    # alias-preserving join planning: relations plan under their SQL
    # aliases on both executors, so qualified predicates survive even
    # when joined relations share column names — perfJoinQueries.sql
    # style). Every clause here qualifies through the aliases.
    "sql_alias_qualified_where": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem", "orders"),
        "query": ("SELECT sum(l.l_quantity) AS sq, absolute_error(sq), "
                  "lower_bound(sq) FROM lineitem l "
                  "JOIN orders o ON l.l_orderkey = o.o_orderkey "
                  "WHERE o.o_orderpriority = '1-URGENT' "
                  "AND l.l_discount < 0.05 "
                  "WITH ERROR 0.5 CONFIDENCE 0.95"),
    },
    # TPC-H Q5 shape — the deepest join tree in the suite: the sampled
    # fact through FIVE dimension hops (orders -> customer, supplier with a
    # compound ON including the dim-dim predicate c_nationkey = s_nationkey,
    # nation, region) with a region filter; the reference's perf corpus
    # runs the same fact-through-reference-chain shape
    # (perfJoinQueries.sql). The AQP contract: sample selection anywhere in
    # the tree, weights carried through every hop, estimators on top.
    "sql_q5_multijoin": {
        "ddl": [("CREATE SAMPLE TABLE li_q5 ON lineitem OPTIONS("
                 "qcs 'l_returnflag', fraction '0.1', "
                 "method 'hash', seed '42')")],
        "tables": ("lineitem", "orders", "customer", "supplier",
                   "nation", "region"),
        "query": ("SELECT n_name, sum(l_extendedprice) AS rev, "
                  "relative_error(rev), lower_bound(rev) "
                  "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
                  "JOIN customer ON o_custkey = c_custkey "
                  "JOIN supplier ON l_suppkey = s_suppkey "
                  "AND c_nationkey = s_nationkey "
                  "JOIN nation ON s_nationkey = n_nationkey "
                  "JOIN region ON n_regionkey = r_regionkey "
                  "WHERE r_name = 'ASIA' "
                  "GROUP BY n_name ORDER BY rev DESC WITH ERROR 0.8"),
    },
    # AQP-210/AQP-227 protocol (CommonBugTest.scala:1204-1260): arithmetic
    # OVER error functions as select items and in HAVING; components are
    # computed hidden when not selected separately
    "sql_errfn_arithmetic": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, sum(l_quantity) AS x, "
                  "lower_bound(x) + upper_bound(x) AS lbub FROM lineitem "
                  "GROUP BY l_returnflag "
                  "HAVING lower_bound(x) + upper_bound(x) > 0 "
                  "ORDER BY l_returnflag WITH ERROR 0.5"),
    },
    # AQP-283 protocol (CommonBugTest.scala:2666-2712): arithmetic ACROSS
    # aggregates in ONE select item — sum(a)/sum(b) WITH ERROR. The point
    # estimate composes the per-aggregate HT estimates; error functions on
    # the composite ride the bootstrap trials (per-trial composition is the
    # statistically sound ratio CI, which closed-form variance lacks)
    "sql_agg_ratio": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, "
                  "sum(l_extendedprice)/sum(l_quantity) AS ratio, "
                  "relative_error(ratio), lower_bound(ratio), "
                  "upper_bound(ratio) FROM lineitem GROUP BY l_returnflag "
                  "ORDER BY l_returnflag WITH ERROR 0.5"),
    },
    # errorless composites stay on the chosen estimator as post-aggregation
    # derived items; the arithmetic mixes sums, count(*) and literals with
    # a guarded division
    "sql_agg_arithmetic": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT l_linestatus, "
                  "(sum(l_extendedprice) + 2 * count(*)) / 1000 AS score, "
                  "sum(l_quantity) AS q, absolute_error(q) "
                  "FROM lineitem GROUP BY l_linestatus "
                  "ORDER BY l_linestatus WITH ERROR 0.5"),
    },
    # AQP-229 protocol (CommonBugTest.scala:1482-1530): a select item that
    # is an expression OVER the group key (CASE over the grouped column),
    # computed post-aggregation alongside the weighted estimate
    "sql_case_over_group": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT sum(l_quantity) AS sq, relative_error(sq), "
                  "CASE WHEN l_returnflag = 'A' THEN 'Accepted' "
                  "WHEN l_returnflag = 'N' THEN 'New' "
                  "ELSE 'Returned' END AS flag "
                  "FROM lineitem GROUP BY l_returnflag "
                  "ORDER BY l_returnflag WITH ERROR 0.9"),
    },
    # SNAP-806 protocol (CommonBugTest.scala:296-360): null-mixed measure
    # columns — sum/avg skip NULLs, count(col) weights only non-null rows,
    # count(*) weights everything; all alongside error functions
    "sql_null_measures": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, "
                  "sum(NULLIF(l_discount, 0.04)) AS s_mix, "
                  "avg(NULLIF(l_discount, 0.04)) AS a_mix, "
                  "count(NULLIF(l_linestatus, 'F')) AS c_mix, "
                  "count(*) AS c_star, absolute_error(s_mix) "
                  "FROM lineitem GROUP BY l_returnflag "
                  "ORDER BY l_returnflag WITH ERROR 0.5 CONFIDENCE 0.95"),
    },
    # direct query ON the sample table, no WITH clause at all: AQP machinery
    # with infinite error tolerance and default confidence, weighted
    # estimates + error functions (createErrConfForSampleTableQuery,
    # QueryProcessingRules.scala:591-600; ErrorEstimateFunctionTest
    # .scala:175-193)
    "sql_direct_sample_query": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, sum(l_quantity) AS x, "
                  "absolute_error(x), relative_error(x), count(*) AS c "
                  "FROM li_sample GROUP BY l_returnflag "
                  "ORDER BY l_returnflag"),
    },
    # NYC-corpus shape (sampleTableNYCQueries.sql:2,5): bare select aliases
    # (no AS), GROUP BY ordinal, BETWEEN filter, ORDER BY repeating the
    # aggregate's expression text instead of its alias
    "sql_group_ordinals": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT CAST(FLOOR(l_quantity / 10) AS BIGINT) qbucket, "
                  "COUNT(*) num_items, absolute_error(num_items), "
                  "relative_error(num_items) FROM lineitem "
                  "WHERE l_quantity BETWEEN 5 AND 45 "
                  "GROUP BY 1 ORDER BY COUNT(*) DESC, qbucket LIMIT 4 "
                  "WITH ERROR 0.5"),
    },
    "sql_view": {
        "ddl": [_LI_DDL,
                "CREATE VIEW li_view AS (SELECT l_returnflag, l_linestatus, "
                "l_quantity AS qty, l_extendedprice FROM lineitem "
                "WHERE l_quantity > 2)"],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, sum(qty) AS sq, absolute_error(sq), "
                  "count(*) AS c FROM li_view WHERE qty < 40 "
                  "GROUP BY l_returnflag ORDER BY l_returnflag "
                  "WITH ERROR 0.5 CONFIDENCE 0.95"),
    },
    "sql_behavior_clause": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT l_linestatus, avg(l_quantity) AS aq, "
                  "relative_error(aq) FROM lineitem WHERE l_quantity > 5 "
                  "GROUP BY l_linestatus ORDER BY l_linestatus "
                  "WITH ERROR 0.4 CONFIDENCE 0.9 BEHAVIOR 'local_omit'"),
    },
    "sql_bootstrap_having": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, avg(l_extendedprice) AS a, "
                  "lower_bound(a), upper_bound(a) FROM lineitem "
                  "GROUP BY l_returnflag HAVING a > 1000.0 "
                  "ORDER BY l_returnflag WITH ERROR 0.5"),
    },
    "sql_join_where": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem", "orders"),
        "query": ("SELECT o_orderstatus, sum(l_extendedprice) AS rev, "
                  "absolute_error(rev) FROM lineitem JOIN orders "
                  "ON l_orderkey = o_orderkey WHERE o_orderpriority LIKE '1%' "
                  "GROUP BY o_orderstatus ORDER BY o_orderstatus "
                  "WITH ERROR 0.5"),
    },
    # WHERE-clause subqueries: IN-subquery -> exact semi-join feeding the
    # sampled outer plan, scalar subquery -> inlined literal (PlaceHolderPlan
    # routing, QueryProcessingRules.scala:119-148; SubQueryRoutingTestSuite)
    "sql_subquery_not_in": {
        "ddl": [("CREATE SAMPLE TABLE ord_sample2 ON orders OPTIONS("
                 "qcs 'o_orderpriority', fraction '0.1', "
                 "method 'hash', seed '42')")],
        "tables": ("orders", "lineitem"),
        "query": ("SELECT o_orderpriority, sum(o_totalprice) AS st, "
                  "upper_bound(st) FROM orders "
                  "WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem "
                  "WHERE l_quantity > 30) "
                  "GROUP BY o_orderpriority ORDER BY o_orderpriority "
                  "WITH ERROR 0.5"),
    },
    "sql_subquery": {
        "ddl": [("CREATE SAMPLE TABLE ord_sample ON orders OPTIONS("
                 "qcs 'o_orderpriority', fraction '0.1', "
                 "method 'hash', seed '42')")],
        "tables": ("orders", "lineitem", "customer"),
        "query": ("SELECT o_orderpriority, sum(o_totalprice) AS st, "
                  "absolute_error(st), relative_error(st) FROM orders "
                  "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem "
                  "WHERE l_quantity > 45) "
                  "AND o_custkey <= (SELECT MAX(c_custkey) FROM customer) "
                  "GROUP BY o_orderpriority ORDER BY o_orderpriority "
                  "WITH ERROR 0.5"),
    },
    # scalar subquery routed through ITS OWN sample: the subquery tree runs
    # as an approx query inheriting the outer error/confidence, and the
    # weighted estimate inlines as the comparison literal
    # (subqueryChildHandler applies the outer AQP clause to the child,
    # QueryProcessingRules.scala:119-148)
    "sql_scalar_subquery_sampled": {
        "ddl": [("CREATE SAMPLE TABLE ord_sc_sample ON orders OPTIONS("
                 "qcs 'o_orderpriority', fraction '0.1', "
                 "method 'hash', seed '42')")],
        "tables": ("orders",),
        "query": ("SELECT o_orderpriority, sum(o_totalprice) AS st, "
                  "relative_error(st) FROM orders "
                  "WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) "
                  "GROUP BY o_orderpriority ORDER BY o_orderpriority "
                  "WITH ERROR 0.5"),
    },
    # derived table in FROM: inlined like a projection view, so the query
    # routes through the base table's sample (SubQueryRoutingTestSuite
    # "subquery in from clause" protocols)
    "sql_from_subquery": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, sum(li.l_extendedprice) AS s, "
                  "absolute_error(s), count(*) AS c "
                  "FROM (SELECT * FROM lineitem WHERE l_quantity > 5) li "
                  "GROUP BY l_returnflag ORDER BY l_returnflag "
                  "WITH ERROR 0.5"),
    },
    # error-limit sampler through the DDL surface (errorLimitColumn /
    # errorLimitPercent options, snappyAQPParsers.scala:77-103,
    # stratifiedSampling.scala:330-357; percent is 0-100 as in the reference)
    "sql_error_limit_ddl": {
        "ddl": [("CREATE SAMPLE TABLE li_el_sample ON lineitem OPTIONS("
                 "qcs 'l_returnflag,l_linestatus', "
                 "errorLimitColumn 'l_extendedprice', errorLimitPercent '5', "
                 "strataReservoirSize '30', seed '42')")],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, sum(l_extendedprice) AS s, "
                  "relative_error(s) FROM lineitem GROUP BY l_returnflag "
                  "ORDER BY l_returnflag WITH ERROR 0.5"),
    },
    # AS-select populate form: the sample covers the filtered population
    # (CreateSampleTableCommand.scala:27-46)
    "sql_sample_as_select": {
        "ddl": [("CREATE SAMPLE TABLE li_hi_sample OPTIONS("
                 "qcs 'l_returnflag', fraction '0.05', method 'hash', "
                 "seed '42') AS SELECT * FROM lineitem "
                 "WHERE l_quantity > 10")],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, sum(l_extendedprice) AS s, "
                  "absolute_error(s), count(*) AS c FROM lineitem "
                  "WHERE l_quantity > 10 GROUP BY l_returnflag "
                  "ORDER BY l_returnflag WITH ERROR 0.5"),
    },
    # error function called DIRECTLY in HAVING (never selected): resolved
    # into a hidden engine column, evaluated, then dropped from the output
    # (reference GetErrorBounds / ErrorEstimateAttribute,
    # QueryProcessingRules.scala:1525-1566)
    "sql_having_error_fn": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, l_linestatus, sum(l_extendedprice) AS s "
                  "FROM lineitem GROUP BY l_returnflag, l_linestatus "
                  "HAVING relative_error(s) < 0.9 AND s > 1000.0 "
                  "ORDER BY l_returnflag, l_linestatus WITH ERROR 0.5"),
    },
    # sample registered on the JOINED relation, FROM table exact — the
    # reference picks the one sampled relation anywhere in the join tree
    # (ReplaceWithSampleTable, QueryProcessingRules.scala:504-515;
    # JoinQueryRoutingTestSuite.scala)
    "sql_join_sampled_dim": {
        "ddl": [("CREATE SAMPLE TABLE ord_dim_sample ON orders OPTIONS("
                 "qcs 'o_orderpriority', fraction '0.1', "
                 "method 'hash', seed '42')")],
        "tables": ("lineitem", "orders"),
        "query": ("SELECT o_orderpriority, sum(l_extendedprice) AS rev, "
                  "absolute_error(rev), relative_error(rev) "
                  "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
                  "GROUP BY o_orderpriority ORDER BY o_orderpriority "
                  "WITH ERROR 0.5"),
    },
    # one sample query per WHERE-subquery tree: the outer query routes
    # through the lineitem sample while the IN-subquery's relation is
    # replaced by the orders sample (PlaceHolderPlan + ReplaceWithSampleTable
    # on the subquery child, QueryProcessingRules.scala:119-148;
    # SubQueryRoutingTestSuite.scala)
    "sql_subquery_sampled": {
        "ddl": [_LI_DDL,
                ("CREATE SAMPLE TABLE ord_sub_sample ON orders OPTIONS("
                 "qcs 'o_orderpriority', fraction '0.2', "
                 "method 'hash', seed '7')")],
        "tables": ("lineitem", "orders"),
        "query": ("SELECT l_returnflag, sum(l_extendedprice) AS s, "
                  "absolute_error(s) FROM lineitem "
                  "WHERE l_orderkey IN (SELECT o_orderkey FROM orders "
                  "WHERE o_orderpriority LIKE '1%') "
                  "GROUP BY l_returnflag ORDER BY l_returnflag "
                  "WITH ERROR 0.5"),
    },
    # DROP SAMPLE TABLE then recreate with a different fraction: the query
    # must route through the RECREATED sample (truncate/drop surface,
    # ColumnFormatSamplingRelation truncate :397; catalog drop semantics)
    "sql_drop_recreate": {
        "ddl": [("CREATE SAMPLE TABLE li_dr_sample ON lineitem OPTIONS("
                 "qcs 'l_returnflag', fraction '0.02', method 'hash', "
                 "seed '42')"),
                "DROP SAMPLE TABLE li_dr_sample",
                ("CREATE SAMPLE TABLE li_dr_sample ON lineitem OPTIONS("
                 "qcs 'l_returnflag', fraction '0.08', method 'hash', "
                 "seed '11')")],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, sum(l_extendedprice) AS s, "
                  "relative_error(s), count(*) AS c FROM lineitem "
                  "GROUP BY l_returnflag ORDER BY l_returnflag "
                  "WITH ERROR 0.5"),
    },
    # unsupported aggregate -> exact route with folded error functions
    # (integer-valued outputs keep the exact oracle engine-independent)
    "sql_exact_fallback": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, count(DISTINCT l_suppkey) AS u, "
                  "absolute_error(u) FROM lineitem GROUP BY l_returnflag "
                  "ORDER BY l_returnflag WITH ERROR 0.1"),
    },
    # AQP-128/96/271 (CommonBugTest.scala:843-899): the same aggregate
    # repeated under two aliases — both columns carry the identical estimate
    # and the error fn resolves against the second alias
    "sql_dup_agg": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, avg(l_quantity) AS a1, "
                  "avg(l_quantity) AS a2, absolute_error(a2) FROM lineitem "
                  "GROUP BY l_returnflag ORDER BY l_returnflag DESC "
                  "WITH ERROR 0.5 CONFIDENCE 0.95"),
    },
    # AQP-130 (CommonBugTest.scala:2194-2238): error functions directly in
    # ORDER BY (group keys appended as deterministic tiebreakers)
    "sql_order_by_errfn": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, l_linestatus, "
                  "sum(l_extendedprice) AS s, absolute_error(s) "
                  "FROM lineitem GROUP BY l_returnflag, l_linestatus "
                  "ORDER BY absolute_error(s), l_returnflag, l_linestatus "
                  "WITH ERROR 0.5 CONFIDENCE 0.95"),
    },
    # AQP-239/230/229 (CommonBugTest.scala:1482-1568): GROUP BY over a
    # datetime function with a CASE select item over the same expression,
    # ORDER BY the (unselected, hidden — AQP-201) group expression, strict
    # behavior; error-fn target resolution is case-insensitive (the
    # reference query writes relative_error(numOFRides) for alias
    # numOfRides)
    "sql_month_case": {
        "ddl": [("CREATE SAMPLE TABLE ev_sample ON events OPTIONS("
                 "qcs 'event_type', fraction '0.05', method 'hash', "
                 "seed '42')")],
        "tables": ("events",),
        "query": ("SELECT sum(value) AS rides, relative_error(RIDES), "
                  "CASE WHEN month(ts) <= 3 THEN 'Q1' "
                  "WHEN month(ts) <= 6 THEN 'Q2' "
                  "WHEN month(ts) <= 9 THEN 'Q3' ELSE 'Q4' END AS qtr "
                  "FROM events GROUP BY month(ts) ORDER BY month(ts) "
                  "WITH ERROR 0.9 CONFIDENCE 0.95 BEHAVIOR 'strict'"),
    },
    # cube/rollup/grouping sets route exact (QueryRoutingRules.scala:86-92)
    # with folded error functions — previously the ROLLUP group item leaked
    # into the approx plan and crashed at withColumn time
    "sql_rollup_exact": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sq, "
                  "absolute_error(sq) AS ae FROM lineitem "
                  "GROUP BY ROLLUP(l_returnflag, l_linestatus) "
                  "ORDER BY l_returnflag, l_linestatus WITH ERROR 0.5"),
    },
    # AQP-285 (AQPConnectionPropertySetTest.scala:120-213): `SET
    # spark.sql.aqp.error=...` mid-session makes SUBSEQUENT plain queries
    # (no WITH clause) route through AQP with the session values
    # (conf.contains(Property.Error.name), QueryProcessingRules.scala:286)
    "sql_set_props": {
        "ddl": [_LI_DDL,
                "SET spark.sql.aqp.error=0.4",
                "SET spark.sql.aqp.confidence=0.9"],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, avg(l_extendedprice) AS a, "
                  "relative_error(a) FROM lineitem "
                  "GROUP BY l_returnflag ORDER BY l_returnflag"),
    },
    # AQP-217 (CommonBugTest.scala:2315-2420): HAVING on the raw aggregate
    # expression (not its alias) under BEHAVIOR 'partial_run_on_base_table'
    # with all four error fns selected and ORDER BY the aggregate DESC —
    # groups failing the error check re-run exact, pass through the same
    # HAVING, and the union re-sorts (group key appended as a deterministic
    # tiebreaker; the reference sorts by the measure alone)
    "sql_partial_route_having": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, l_linestatus, "
                  "sum(l_extendedprice) AS s, "
                  "absolute_error(s) AS ae, relative_error(s) AS re, "
                  "lower_bound(s) AS lb, upper_bound(s) AS ub "
                  "FROM lineitem GROUP BY l_returnflag, l_linestatus "
                  "HAVING sum(l_extendedprice) > 1000.0 "
                  "ORDER BY s DESC, l_returnflag, l_linestatus "
                  "WITH ERROR 0.048 "
                  "CONFIDENCE 0.95 BEHAVIOR 'partial_run_on_base_table'"),
    },
    # partial routing THROUGH A JOIN (JoinQueryRoutingTestSuite x
    # PartialQueryRoutingTestSuite protocols combined): violating groups
    # re-run exactly through the joined base plan, passing groups keep the
    # sampled-join estimate; error 0.084 splits the five priorities
    # 3 approx / 2 exact at the driver's sf0.01 gate
    "sql_partial_route_join": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem", "orders"),
        "query": ("SELECT o_orderpriority, sum(l_extendedprice) AS rev, "
                  "relative_error(rev) AS re "
                  "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
                  "GROUP BY o_orderpriority ORDER BY o_orderpriority "
                  "WITH ERROR 0.084 CONFIDENCE 0.95 "
                  "BEHAVIOR 'partial_run_on_base_table'"),
    },
    # AQP-192 protocol (QueryRoutingTestSuite.scala:540-557): a reroute to
    # the full table answers exactly and folds the error functions — bounds
    # NULL, absolute/relative error 0
    "sql_full_route_nulls": {
        "ddl": [_LI_DDL],
        "tables": ("lineitem",),
        "query": ("SELECT l_returnflag, sum(l_extendedprice) AS s, "
                  "lower_bound(s) AS lb, upper_bound(s) AS ub, "
                  "relative_error(s) AS re, absolute_error(s) AS ae "
                  "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag "
                  "WITH ERROR 0.00001 CONFIDENCE 0.95 "
                  "BEHAVIOR 'run_on_full_table'"),
    },
}

# closed-form query over a sample maintained by 3 incremental appends
# through StreamingSampleMaintainer (§2.2 insert/append): the maintained
# state is bit-equal to the batch sample, so the batch-replay oracle holds
INCR_APPEND_SPEC = ApproxQuerySpec(
    sample=LI_HASH,
    aggs=(ApproxAgg("sum", "l_extendedprice", "sum_price", _PRICE, ALL_ERRORS),
          ApproxAgg("count_star", None, "cnt", errors=("relative_error",))),
    group_by=("l_returnflag",), group_aliases=("rf",), order_by=("rf",),
)

# CREATE TOPK TABLE DDL path (snappyAQPParsers.scala:77-103): same spec the
# DDL string in __spark_entry__ builds, reused for the replay oracle
TOPK_DDL_SPEC = TopKSpec("topk_ddl", key="user_id", time_col="ts",
                         time_interval_us=_3D_US, epoch_us=_T_EPOCH,
                         size=100, depth=7, width=4096, num_partitions=8,
                         int_key=True)
TOPK_DDL_TEXT = ("CREATE TOPK TABLE topk_ddl ON events OPTIONS("
                 "key 'user_id', timeSeriesColumn 'ts', "
                 "timeInterval '259200s', epoch '1704067200000000', "
                 "size '100', depth '7', width '4096', "
                 "numPartitions '8', intKey 'true')")
TOPK_DDL_WINDOW = (_T_2024_01_08, _T_2024_01_22, 15)

# plain (non-timeseries) TopKCMS: no timeSeriesColumn -> ONE sketch per
# partition, no dyadic levels (reference TopKCMS vs TopKHokusai split,
# TopKWrapper options); the scan is top-k over the whole ingest
TOPK_PLAIN_SPEC = TopKSpec("topk_plain", key="user_id", time_col=None,
                           size=100, depth=7, width=4096, num_partitions=8,
                           int_key=True)
TOPK_PLAIN_TEXT = ("CREATE TOPK TABLE topk_plain ON events OPTIONS("
                   "key 'user_id', size '100', depth '7', width '4096', "
                   "numPartitions '8', intKey 'true')")

APPROX_SPECS: dict[str, ApproxQuerySpec] = {
    # global aggregate, all error functions (perfQueries.sql:1 shape)
    "cf_sum_global": ApproxQuerySpec(
        sample=LI_HASH,
        aggs=(ApproxAgg("sum", "l_extendedprice", "sum_price", _PRICE, ALL_ERRORS),),
    ),
    # DecimalType measures: exact DECIMAL(38,2) stratum sums for the
    # estimate (reference widens Decimal, QueryProcessingRules.scala:1461-1466)
    "cf_decimal_measure": ApproxQuerySpec(
        sample=LI_HASH,
        aggs=(ApproxAgg("sum", "CAST(l_extendedprice AS DECIMAL(18,2))",
                        "sum_dec", _PRICE, ("absolute_error",), dec_scale=2),
              ApproxAgg("avg", "CAST(l_extendedprice AS DECIMAL(18,2))",
                        "avg_dec", _PRICE, dec_scale=2)),
        group_by=("l_returnflag",),
        group_aliases=("l_returnflag",),
        order_by=("l_returnflag",),
    ),
    # grouped multi-aggregate with ORDER BY (perfQueries.sql:4 shape)
    "cf_group_multi": ApproxQuerySpec(
        sample=LI_HASH,
        aggs=(ApproxAgg("sum", "l_extendedprice", "sum_price", _PRICE, ALL_ERRORS),
              ApproxAgg("avg", "l_discount", "avg_disc", 1.0,
                        ("relative_error", "lower_bound", "upper_bound")),
              ApproxAgg("count_star", None, "cnt", errors=("absolute_error",))),
        group_by=("l_returnflag",), group_aliases=("rf",), order_by=("rf",),
    ),
    # WHERE inside strata (perfQueries.sql:2 shape)
    "cf_where": ApproxQuerySpec(
        sample=LI_HASH,
        aggs=(ApproxAgg("sum", "l_extendedprice", "sum_price", _PRICE, ALL_ERRORS),
              ApproxAgg("count", "l_quantity", "cnt_qty", _QTY,
                        ("lower_bound", "upper_bound"))),
        where="l_quantity < 25",
        group_by=("l_linestatus",), group_aliases=("ls",), order_by=("ls",),
    ),
    # arithmetic measure expression (WeightageRule pushes through + - * /,
    # reference WeightedAggregates.scala:84-171)
    "cf_expr_measure": ApproxQuerySpec(
        sample=LI_HASH,
        aggs=(ApproxAgg("sum", "l_extendedprice * (1.0 - l_discount)",
                        "sum_revenue", _PRICE, ALL_ERRORS),),
        group_by=("l_returnflag",), group_aliases=("rf",), order_by=("rf",),
    ),
    # reservoir sampler (StratifiedSamplerReservoir)
    "cf_reservoir": ApproxQuerySpec(
        sample=LI_RESERVOIR,
        aggs=(ApproxAgg("sum", "l_extendedprice", "sum_price", _PRICE, ALL_ERRORS),
              ApproxAgg("avg", "l_quantity", "avg_qty", _QTY, ("relative_error",))),
        group_by=("l_returnflag",), group_aliases=("rf",), order_by=("rf",),
    ),
    # fraction sampler with per-stratum floor (StratifiedSamplerCached)
    "cf_fraction": ApproxQuerySpec(
        sample=LI_FRACTION,
        aggs=(ApproxAgg("count_star", None, "cnt", errors=ALL_ERRORS),),
        group_by=("l_linestatus",), group_aliases=("ls",), order_by=("ls",),
    ),
    # expression QCS (NYCTaxi hour(pickup_datetime) analog)
    "cf_expr_qcs": ApproxQuerySpec(
        sample=LI_EXPR_QCS,
        aggs=(ApproxAgg("avg", "l_extendedprice", "avg_price", _PRICE, ALL_ERRORS),),
        group_by=("year(l_shipdate)",), group_aliases=("ship_year",),
        order_by=("ship_year",),
    ),
    # MIN/MAX alongside approx aggregates: args in the QCS -> bypass error
    # calc (ByPassErrorCalc, QueryRoutingRules.scala:55-92); the extremum is
    # exact because every stratum is represented in the sample
    "cf_minmax_alongside": ApproxQuerySpec(
        sample=LI_EXPR_QCS,
        aggs=(ApproxAgg("sum", "l_extendedprice", "sum_price", _PRICE, ALL_ERRORS),
              ApproxAgg("min", "year(l_shipdate)", "min_year",
                        errors=("absolute_error", "lower_bound")),
              ApproxAgg("max", "year(l_shipdate)", "max_year",
                        errors=("relative_error", "upper_bound"))),
        group_by=("l_returnflag",), group_aliases=("rf",), order_by=("rf",),
    ),
    # join: sample x exact dimension (perfJoinQueries.sql shape; sample table
    # on exactly one relation — QueryProcessingRules.scala:504-515)
    "cf_join_orders": ApproxQuerySpec(
        sample=LI_HASH,
        joins=(JoinSpec("orders", "l_orderkey = o_orderkey"),),
        aggs=(ApproxAgg("sum", "l_extendedprice", "sum_price", _PRICE, ALL_ERRORS),
              ApproxAgg("count_star", None, "cnt")),
        where="o_orderpriority LIKE '1%'",
        group_by=("o_orderstatus",), group_aliases=("status",), order_by=("status",),
    ),
    # orders-table sample (row-table sample analog)
    "cf_orders_sample": ApproxQuerySpec(
        sample=ORD_HASH,
        aggs=(ApproxAgg("sum", "o_totalprice", "sum_total", _TOTAL, ALL_ERRORS),
              ApproxAgg("count_star", None, "cnt", errors=("relative_error",))),
        group_by=("o_orderpriority",), group_aliases=("prio",), order_by=("prio",),
    ),
    # HAVING over an output alias incl. an error function
    "cf_having": ApproxQuerySpec(
        sample=LI_HASH,
        aggs=(ApproxAgg("sum", "l_extendedprice", "sum_price", _PRICE, ALL_ERRORS),),
        group_by=("l_returnflag", "l_linestatus"), group_aliases=("rf", "ls"),
        having="sum_price > 1000000.0 AND sum_price_relative_error < 0.9",
        order_by=("rf", "ls"), limit=10,
    ),
    # HAC: local omission -> NaN outputs for violating groups
    "cf_local_omit": ApproxQuerySpec(
        sample=LI_HASH,
        aggs=(ApproxAgg("avg", "l_extendedprice", "avg_price", _PRICE, ALL_ERRORS),),
        group_by=("l_returnflag", "l_linestatus"), group_aliases=("rf", "ls"),
        order_by=("rf", "ls"),
        error=0.008, behavior="local_omit",
    ),
    # HAC: strict with a loose contract (tight contract raises — tested in pytest)
    "cf_strict": ApproxQuerySpec(
        sample=LI_HASH,
        aggs=(ApproxAgg("sum", "l_extendedprice", "sum_price", _PRICE, ALL_ERRORS),),
        group_by=("l_returnflag",), group_aliases=("rf",), order_by=("rf",),
        error=0.9, behavior="strict",
    ),
    # HAC: full rerouting to the base table on violation
    "cf_full_route": ApproxQuerySpec(
        sample=LI_HASH,
        aggs=(ApproxAgg("sum", "l_extendedprice", "sum_price", _PRICE,
                        ("absolute_error", "relative_error")),),
        group_by=("l_returnflag",), group_aliases=("rf",), order_by=("rf",),
        error=0.01, behavior="run_on_full_table",
    ),
    # HAC: partial per-group rerouting (AQPRules.scala:375-479)
    "cf_partial_route": ApproxQuerySpec(
        sample=LI_HASH,
        aggs=(ApproxAgg("avg", "l_extendedprice", "avg_price", _PRICE,
                        ("relative_error", "lower_bound", "upper_bound")),),
        group_by=("l_returnflag", "l_linestatus"), group_aliases=("rf", "ls"),
        order_by=("rf", "ls"),
        error=0.008, behavior="partial_run_on_base_table",
    ),
    # error-limit sampler: stratum sizes grown until the CLT relative error
    # of l_extendedprice stays under 5% (StratifiedSamplerErrorLimit)
    "cf_error_limit_sample": ApproxQuerySpec(
        sample=SampleSpec("lineitem",
                          ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
                          ("l_returnflag", "l_linestatus"), "error_limit",
                          seed=42, reservoir_size=30,
                          error_limit_col="l_extendedprice",
                          error_limit_pct=0.05, error_limit_conf=0.95,
                          error_limit_max_abs=_PRICE),
        aggs=(ApproxAgg("sum", "l_extendedprice", "sum_price", _PRICE, ALL_ERRORS),
              ApproxAgg("count_star", None, "cnt")),
        group_by=("l_returnflag",), group_aliases=("rf",), order_by=("rf",),
    ),
    # bootstrap estimator: Poisson resampling CIs (bootstrap/BootstrapSum etc.)
    "bs_sum_group": ApproxQuerySpec(
        sample=LI_HASH,
        aggs=(ApproxAgg("sum", "l_extendedprice", "sum_price", _PRICE, ALL_ERRORS),
              ApproxAgg("count_star", None, "cnt", errors=("lower_bound", "upper_bound"))),
        group_by=("l_returnflag",), group_aliases=("rf",), order_by=("rf",),
        estimator="bootstrap", trials=100,
    ),
    # AVG + HAVING above the aggregate: the case the reference routes to
    # bootstrap (QueryProcessingRules.scala:1421-1447)
    "bs_avg_having": ApproxQuerySpec(
        sample=LI_HASH,
        aggs=(ApproxAgg("avg", "l_extendedprice", "avg_price", _PRICE, ALL_ERRORS),),
        group_by=("l_returnflag", "l_linestatus"), group_aliases=("rf", "ls"),
        having="avg_price > 30000.0", order_by=("rf", "ls"),
        estimator="bootstrap", trials=100,
    ),
    # bootstrap + LOCAL_OMIT -> NULLed groups (BootstrapFunctions.scala:195-203)
    "bs_local_omit": ApproxQuerySpec(
        sample=LI_HASH,
        aggs=(ApproxAgg("avg", "l_discount", "avg_disc", 1.0, ALL_ERRORS),),
        group_by=("l_returnflag",), group_aliases=("rf",), order_by=("rf",),
        error=0.004, behavior="local_omit", estimator="bootstrap", trials=100,
    ),
    # bypass: no error estimation requested (ByPassErrorCalculations)
    "bypass_weighted_sum": ApproxQuerySpec(
        sample=LI_HASH,
        aggs=(ApproxAgg("sum", "l_quantity", "sum_qty", _QTY),
              ApproxAgg("avg", "l_extendedprice", "avg_price", _PRICE),
              ApproxAgg("count_star", None, "cnt")),
        group_by=("l_returnflag",), group_aliases=("rf",), order_by=("rf",),
        estimator="bypass",
    ),
}
