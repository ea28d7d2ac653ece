"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language ID
(stopword-profile heuristic), quality scoring (length / punctuation /
stopword ratios), token counting, and document fingerprinting (full-text
hash + min-k-gram winnowing hash).

Everything is a scalar projection over ``documents`` — embarrassingly
parallel, no shuffle, pure JVM expressions (whole-stage codegen) on the
Spark side. Fragments avoid backslash regex classes and transcendental
functions so the identical semantics replay on DuckDB for the exact oracle
(backslash escaping and libm rounding differ between engines; integer
counts and single-division ratios do not).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..dialect import DUCKDB, SPARK, dlit

STOPWORDS = {
    "en": ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "una", "los", "se"),
    "de": ("der", "die", "das", "und", "ein", "zu", "mit", "von", "ist", "im"),
}


def regex_count(dialect: str, col: str, pat: str) -> str:
    if dialect == SPARK:
        return f"size(regexp_extract_all({col}, '{pat}', 0))"
    return f"len(regexp_extract_all({col}, '{pat}'))"


def _tokens(dialect: str, col: str) -> str:
    """one regex-split pass -> non-empty alnum tokens (identical split
    semantics verified on both engines, incl. boundary empties)."""
    split = (f"split({col}, '[^A-Za-z0-9]+')" if dialect == SPARK
             else f"regexp_split_to_array({col}, '[^A-Za-z0-9]+')")
    flt = "filter" if dialect == SPARK else "list_filter"
    return f"{flt}({split}, t -> t <> '')"


def _in_count(dialect: str, toks: str, words: tuple[str, ...]) -> str:
    flt = "filter" if dialect == SPARK else "list_filter"
    lst = ", ".join(f"'{w}'" for w in words)
    body = f"{flt}({toks}, t -> t IN ({lst}))"
    return (f"size({body})" if dialect == SPARK else f"len({body})")


TOKEN_FEATURES = ("n_tokens", "sw_en", "sw_es", "sw_de")


def _token_counts(dialect: str, toks: str) -> dict[str, str]:
    """count fragments over a bound token-array variable."""
    arr_n = "size" if dialect == SPARK else "len"
    out = {"n_tokens": f"CAST({arr_n}({toks}) AS BIGINT)"}
    for lang, words in STOPWORDS.items():
        out[f"sw_{lang}"] = f"CAST({_in_count(dialect, toks, words)} AS BIGINT)"
    return out


def token_struct_frag(col: str = "text") -> str:
    """Spark: all token-derived counts in ONE generator expression.

    The token array binds once as a lambda variable (one regex-split pass
    per document — the former 6-regex formulation re-scanned the document
    per feature and dominated the bench); ``explode`` of the 1-element
    struct array is a Generate node, which CollapseProject cannot inline
    through, so downstream references extract struct fields instead of
    re-splitting."""
    counts = _token_counts(SPARK, "t")
    fields = ", ".join(f"'{n}', {s}" for n, s in counts.items())
    return (f"explode(transform(array({_tokens(SPARK, col)}), "
            f"t -> named_struct({fields})))")


def text_feature_frags(dialect: str, col: str = "text") -> dict[str, str]:
    """non-token doc features; identical values on Spark and DuckDB."""
    return {"n_chars_m": f"CAST(length({col}) AS BIGINT)",
            "n_punct": f"CAST({regex_count(dialect, col, '[.,;:!?]')} AS BIGINT)"}


def quality_frags() -> dict[str, str]:
    """quality score from the feature columns (rational arithmetic only:
    identical doubles cross-engine). Range [0, 1]."""
    tok = "CAST(n_tokens AS DOUBLE)"
    stop_ratio = f"(CASE WHEN n_tokens = 0 THEN {dlit(0.0)} ELSE CAST(sw_en AS DOUBLE) / {tok} END)"
    punct_ratio = f"(CASE WHEN n_chars_m = 0 THEN {dlit(0.0)} ELSE CAST(n_punct AS DOUBLE) / CAST(n_chars_m AS DOUBLE) END)"
    len_score = f"(CASE WHEN n_tokens >= 100 THEN {dlit(1.0)} ELSE {tok} / {dlit(100.0)} END)"
    q = (f"(({dlit(2.0)} * {stop_ratio} + {dlit(1.0)} * {len_score} + "
         f"{dlit(1.0)} * ({dlit(1.0)} - {punct_ratio})) / {dlit(4.0)})")
    return {"stopword_ratio": stop_ratio, "punct_ratio": punct_ratio,
            "quality": q}


def langid_frag() -> str:
    """argmax over per-language stopword hits; ties and zero -> 'und'.

    CASE evaluates in declaration order, so ties resolve identically in
    both engines."""
    langs = sorted(STOPWORDS)
    conds = []
    for lang in langs:
        others = [f"sw_{lang} >= sw_{o}" for o in langs if o != lang]
        conds.append(f"WHEN sw_{lang} > 0 AND {' AND '.join(others)} "
                     f"THEN '{lang}'")
    return f"(CASE {' '.join(conds)} ELSE 'und' END)"


def fingerprint_frags(dialect: str, col: str = "text",
                      k: int = 8) -> dict[str, str]:
    """md5 full-text fingerprint + winnowing-style min k-gram hash.

    The min-gram hash reads the precomputed ``__ac`` character-code array
    (O(1) per access) — a positional-substring formulation is O(len^2) per
    document (see dual.ascii_array)."""
    from . import dual
    P31 = 2147483647
    coeffs = [pow(257, j, P31) for j in range(k)]
    grams_raw = dual.gram_int_array(dialect, col, k, coeffs=coeffs)
    grams = dual.transform(dialect, grams_raw, f"g -> (g % {P31})")
    return {"fp_md5": f"md5({col})",
            "fp_mingram": f"CAST({dual.arr_min(dialect, grams)} AS BIGINT)"}


def _mingram_pandas_udf(k: int = 8):
    """Arrow-batched rolling-hash fingerprint, bit-identical to the SQL
    formula in fingerprint_frags: min over positions i of
    (sum_j code[i+j] * (257^j mod P31)) mod P31, NULL when len < k.

    The SQL formulation costs k boxed ``element_at`` lambda evaluations per
    character position (~12M at sf0.1) and dominated the whole text bench;
    numpy does the same int64 arithmetic vectorized per document. Exactness:
    codepoints < 0x110000 and sum(coeffs) < 8*P31 keep the window sum under
    2^54, far inside exact int64 — identical values to the DuckDB replay."""
    from pyspark.sql.functions import pandas_udf

    P31 = 2147483647
    coeffs = np.array([pow(257, j, P31) for j in range(k)], dtype=np.int64)

    @pandas_udf("bigint")
    def mingram(texts: pd.Series) -> pd.Series:
        out = []
        for s in texts:
            if s is None or len(s) < k:
                out.append(None)
                continue
            codes = np.frombuffer(s.encode("utf-32-le"),
                                  dtype=np.uint32).astype(np.int64)
            win = np.lib.stride_tricks.sliding_window_view(codes, k)
            out.append(int(((win @ coeffs) % P31).min()))
        return pd.Series(out, dtype="object")

    return mingram


def text_features(df: DataFrame, col: str = "text") -> DataFrame:
    """Spark path: one tokenization generator + scalar counts +
    fingerprints -> quality/langid. All-JVM whole-stage codegen except the
    fingerprint, which runs as a vectorized Arrow batch (same stage, no
    shuffle)."""
    fps = fingerprint_frags(SPARK, col)
    # adaptive parallelism (round 10): a small input (one parquet file ->
    # 1-2 scan splits) would serialize this whole per-doc computation on
    # one core; redistribute to the session's defaultParallelism ONLY
    # when the scan itself yields fewer splits. At real scale the scan
    # split count exceeds the core count and this is a no-op — the value
    # scales with the cluster, it is not a local constant. The explicit
    # partition count makes the exchange non-coalescible (AQE would fold
    # a sub-1MB stream back to one partition).
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism, "doc_id")
    stage_a = df.select(
        "doc_id", "lang", "source",
        *[F.expr(s).alias(n)
          for n, s in text_feature_frags(SPARK, col).items()],
        F.expr(token_struct_frag(col)).alias("__tf"),
        F.expr(fps["fp_md5"]).alias("fp_md5"),
        _mingram_pandas_udf()(F.col(col)).alias("fp_mingram"))
    stage_b = stage_a.select(
        "doc_id", "lang", "source",
        *[F.col(f"__tf.{n}").alias(n) for n in ("n_tokens",)],
        "n_punct", "n_chars_m",
        *[F.col(f"__tf.{n}").alias(n) for n in TOKEN_FEATURES[1:]],
        "fp_md5", "fp_mingram")
    return stage_b.select(
        "*",
        *[F.expr(s).alias(n) for n, s in quality_frags().items()],
        F.expr(langid_frag()).alias("lang_pred"))


def text_features_oracle(dialect: str = DUCKDB, table: str = "documents",
                         col: str = "text") -> str:
    """replay SQL: a __toks CTE column feeds the token counts (DuckDB CSEs
    the references; the barrier trick is only needed under Catalyst)."""
    feat = text_feature_frags(dialect, col)
    tok = _token_counts(dialect, "__toks")
    fp = fingerprint_frags(dialect, col)
    base = (f"SELECT doc_id, lang, source, {col}, "
            f"{_tokens(dialect, col)} AS __toks FROM {table}")
    inner_parts = ["doc_id", "lang", "source",
                   f"{tok['n_tokens']} AS n_tokens"]
    inner_parts += [f"{s} AS {n}" for n, s in feat.items()]
    inner_parts += [f"{tok[n]} AS {n}" for n in TOKEN_FEATURES[1:]]
    inner_parts += [f"{s} AS {n}" for n, s in fp.items()]
    inner = f"SELECT {', '.join(inner_parts)} FROM ({base}) __b"
    outer_parts = (["*"]
                   + [f"{s} AS {n}" for n, s in quality_frags().items()]
                   + [f"{langid_frag()} AS lang_pred"])
    return f"SELECT {', '.join(outer_parts)} FROM ({inner}) __t"


# BPE-ish pre-tokenizer: contraction suffixes, letter runs, digit runs,
# bare apostrophe, symbol runs — the GPT-2 pre-tokenization shape minus
# the lookaheads (DuckDB's RE2 has none; alternation order carries the
# same precedence, and both engines use leftmost-first alternation).
BPE_PAT = "''(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|''|[^a-z0-9'' ]+"


def token_stats_stages(dialect: str, table: str = "documents",
                       col: str = "text"
                       ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> per-document token accounting:
    (doc_id, n_chars_txt, n_ws_tokens, n_alnum_tokens, n_bpe_tokens).

    Three tokenizer granularities side by side — whitespace runs (the
    cheap proxy), alnum words (the analysis tokenizer), and a BPE-ish
    pre-tokenizer (closest to what an LM tokenizer's input segmentation
    produces; real BPE merges only ever SPLIT these pieces further, so
    ``n_bpe_tokens`` is a lower bound on the LM token count). Pure scalar
    projection: no shuffle, whole-stage codegen on Spark."""
    ws = regex_count(dialect, col, "[^ ]+")
    alnum = regex_count(dialect, f"lower({col})", "[a-z0-9]+")
    bpe = regex_count(dialect, f"lower({col})", BPE_PAT)
    # *_mz + REPARTITION: same ORDER-BY-over-heavy-map pattern as
    # gopher_quality — materializing the thin count table stops the range
    # sampling pass from running the three tokenizer regexes twice
    hint_sql = "/*+ REPARTITION(doc_id) */ " if dialect == SPARK else ""
    stages = [
        ("__ts_mz",
         f"SELECT doc_id, CAST(length({col}) AS BIGINT) AS n_chars_txt, "
         f"CAST({ws} AS BIGINT) AS n_ws_tokens, "
         f"CAST({alnum} AS BIGINT) AS n_alnum_tokens, "
         f"CAST({bpe} AS BIGINT) AS n_bpe_tokens "
         f"FROM (SELECT {hint_sql}doc_id, {col} FROM {table}) __t"),
    ]
    return stages, "SELECT * FROM __ts_mz ORDER BY doc_id"


# Gopher quality rules (Rae et al., "Scaling Language Models: Methods,
# Analysis & Insights from Training Gopher", 2021 — Appendix A quality
# filter). The canonical pretraining quality gate: every rule is a single
# projection over the bound token/line arrays, zero shuffle.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_stages(dialect: str, table: str = "documents",
                          min_words: int = 50, max_words: int = 100_000,
                          stopwords: tuple[str, ...] = GOPHER_STOPWORDS
                          ) -> tuple[list[tuple[str, str]], str]:
    """Per-document Gopher rule flags + the overall keep decision.

    Rules (paper thresholds): word count in [50, 100k]; mean word length
    in [3, 10]; symbol-to-word ratio (# / ellipsis) <= 0.1; <= 90% of
    lines bullet-started and <= 30% ellipsis-ended; >= 80% of words
    contain an alphabetic character; >= 2 distinct canonical stopwords.
    Map-only: one token split + one line split per document, every flag a
    scalar projection — at 100 TB this runs at scan speed with no
    Exchange (same shape as text_analysis/token_stats)."""
    flt = "filter" if dialect == SPARK else "list_filter"
    arr_n = "size" if dialect == SPARK else "len"
    toks = _tokens(dialect, "text")
    if dialect == SPARK:
        lines = "filter(split(text, '\\n'), l -> trim(l) <> '')"
        alpha_toks = f"filter(t, x -> x RLIKE '[A-Za-z]')"
        dedup = "array_distinct"
        lensum = "aggregate(transform(t, x -> length(x)), 0, (a, x) -> a + x)"
    else:
        lines = ("list_filter(regexp_split_to_array(text, '\\n'), "
                 "l -> trim(l) <> '')")
        alpha_toks = "list_filter(t, x -> regexp_matches(x, '[A-Za-z]'))"
        dedup = "list_distinct"
        lensum = "list_sum(list_transform(t, x -> length(x)))"
    sw_list = ", ".join(f"'{w}'" for w in stopwords)
    # REPARTITION(doc_id): distributes the per-doc flag computation with
    # spark.sql.shuffle.partitions (a small input's scan split count would
    # otherwise serialize it); __gq_flags is a *_mz stage because the
    # final's global ORDER BY would both strip that repartition (redundant
    # below a Sort to the optimizer) and evaluate the flags twice
    # (range-bound sampling + sort) — the materialized relation is the
    # thin flag table, not the text
    hint_sql = ("/*+ REPARTITION(doc_id) */ " if dialect == SPARK else "")
    stages = [
        ("__gq_base",
         f"SELECT doc_id, "
         f"CAST({arr_n}(t) AS BIGINT) AS n_words, "
         f"CAST(COALESCE({lensum}, 0) AS BIGINT) AS char_sum, "
         f"CAST({arr_n}({alpha_toks}) AS BIGINT) AS n_alpha_words, "
         f"CAST({arr_n}({flt}({dedup}(t), x -> lower(x) IN ({sw_list}))) "
         f"AS BIGINT) AS n_stop, "
         f"CAST({regex_count(dialect, 'text', '#')} AS BIGINT) AS n_hash, "
         f"CAST({regex_count(dialect, 'text', '[.][.][.]')} "
         f"AS BIGINT) AS n_ellipsis, "
         f"CAST({arr_n}(l) AS BIGINT) AS n_lines, "
         f"CAST({arr_n}({flt}(l, x -> trim(x) LIKE '-%' OR trim(x) LIKE "
         f"'*%')) AS BIGINT) AS n_bullet, "
         f"CAST({arr_n}({flt}(l, x -> x LIKE '%...')) AS BIGINT) AS n_ell_end "
         f"FROM (SELECT {hint_sql}doc_id, text, {toks} AS t, {lines} AS l "
         f"FROM {table}) __b"),
        ("__gq_flags_mz",
         "SELECT doc_id, n_words, "
         f"CAST(CASE WHEN n_words BETWEEN {min_words} AND {max_words} "
         "THEN 1 ELSE 0 END AS BIGINT) AS ok_word_count, "
         "CAST(CASE WHEN n_words > 0 AND "
         "CAST(char_sum AS DOUBLE) / CAST(n_words AS DOUBLE) "
         f"BETWEEN {dlit(3.0)} AND {dlit(10.0)} "
         "THEN 1 ELSE 0 END AS BIGINT) AS ok_mean_word_len, "
         "CAST(CASE WHEN n_words > 0 AND "
         "CAST(n_hash + n_ellipsis AS DOUBLE) / CAST(n_words AS DOUBLE) "
         f"<= {dlit(0.1)} THEN 1 ELSE 0 END AS BIGINT) AS ok_symbol_ratio, "
         "CAST(CASE WHEN n_lines = 0 OR "
         "CAST(n_bullet AS DOUBLE) / CAST(n_lines AS DOUBLE) "
         f"<= {dlit(0.9)} THEN 1 ELSE 0 END AS BIGINT) AS ok_bullet_lines, "
         "CAST(CASE WHEN n_lines = 0 OR "
         "CAST(n_ell_end AS DOUBLE) / CAST(n_lines AS DOUBLE) "
         f"<= {dlit(0.3)} THEN 1 ELSE 0 END AS BIGINT) AS ok_ellipsis_lines, "
         "CAST(CASE WHEN n_words > 0 AND "
         "CAST(n_alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE) "
         f">= {dlit(0.8)} THEN 1 ELSE 0 END AS BIGINT) AS ok_alpha_words, "
         "CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS BIGINT) "
         "AS ok_stopwords "
         "FROM __gq_base"),
    ]
    final = ("SELECT doc_id, n_words, ok_word_count, ok_mean_word_len, "
             "ok_symbol_ratio, ok_bullet_lines, ok_ellipsis_lines, "
             "ok_alpha_words, ok_stopwords, "
             "CAST(ok_word_count * ok_mean_word_len * ok_symbol_ratio * "
             "ok_bullet_lines * ok_ellipsis_lines * ok_alpha_words * "
             "ok_stopwords AS BIGINT) AS keep "
             "FROM __gq_flags_mz ORDER BY doc_id")
    return stages, final


def c4_filters_stages(dialect: str, table: str = "documents",
                      min_sentences: int = 3,
                      blocklist: tuple[str, ...] = ("lorem ipsum",
                                                    "javascript")
                      ) -> tuple[list[tuple[str, str]], str]:
    """C4 page-level cleaning rules (Raffel et al., "Exploring the Limits
    of Transfer Learning with a Unified Text-to-Text Transformer", 2020 —
    §2.2): terminal punctuation, a minimum sentence count, no curly
    braces (code markers), and a lowercase phrase blocklist ("lorem
    ipsum", "javascript"). Map-only: one sentence split + scalar
    projections per document — scan-speed at 100 TB, no Exchange (the
    line-level "three-sentence span dedup" C4 rule is the separate
    dedup_lines / duplicate_spans operators)."""
    flt = "filter" if dialect == SPARK else "list_filter"
    arr_n = "size" if dialect == SPARK else "len"
    if dialect == SPARK:
        sents = "filter(split(text, '[.!?]+'), s -> trim(s) <> '')"
    else:
        sents = ("list_filter(regexp_split_to_array(text, '[.!?]+'), "
                 "s -> trim(s) <> '')")
    block = " OR ".join(
        f"contains(lower(text), '{p}')" for p in blocklist)
    hint_sql = "/*+ REPARTITION(doc_id) */ " if dialect == SPARK else ""
    stages = [
        ("__c4_mz",
         f"SELECT doc_id, "
         f"CAST({arr_n}({sents}) AS BIGINT) AS n_sentences, "
         f"CAST(CASE WHEN {regex_count(dialect, 'trim(text)', '[.!?]$')} > 0 "
         f"THEN 1 ELSE 0 END AS BIGINT) AS ok_terminal_punct, "
         f"CAST(CASE WHEN contains(text, chr(123)) OR contains(text, chr(125)) "
         f"THEN 0 ELSE 1 END AS BIGINT) AS ok_no_braces, "
         f"CAST(CASE WHEN {block} THEN 0 ELSE 1 END AS BIGINT) "
         f"AS ok_blocklist "
         f"FROM (SELECT {hint_sql}doc_id, text FROM {table}) __t"),
    ]
    final = (f"SELECT doc_id, n_sentences, "
             f"CAST(CASE WHEN n_sentences >= {min_sentences} THEN 1 ELSE 0 "
             f"END AS BIGINT) AS ok_min_sentences, "
             f"ok_terminal_punct, ok_no_braces, ok_blocklist, "
             f"CAST(CASE WHEN n_sentences >= {min_sentences} THEN 1 ELSE 0 "
             f"END * ok_terminal_punct * ok_no_braces * ok_blocklist "
             f"AS BIGINT) AS keep "
             f"FROM __c4_mz ORDER BY doc_id")
    return stages, final


def c4_fixture_stages(dialect: str, min_sentences: int = 5
                      ) -> tuple[list[tuple[str, str]], str]:
    """Fixture harness for c4_filters_stages: the synthetic corpus has no
    punctuation, so every rule would fail identically. Inject
    deterministic doc_id-derived variants first (same recipe as the PII
    fixture): sentence boundaries at each ' batch ' occurrence + a
    terminal period (doc_id%4=0), a curly-brace code marker (%4=1), a
    blocklist phrase (%4=2), untouched (%4=3) — every rule fires in both
    directions."""
    inject = ("SELECT doc_id, CASE "
              "WHEN doc_id % 4 = 0 THEN "
              "concat(replace(text, ' batch ', '. batch '), '.') "
              "WHEN doc_id % 4 = 1 THEN concat(text, ' {x}') "
              "WHEN doc_id % 4 = 2 THEN concat(text, ' lorem ipsum') "
              "ELSE text END AS text FROM documents")
    stages, final = c4_filters_stages(dialect, table="__c4doc",
                                      min_sentences=min_sentences)
    return [("__c4doc", inject)] + stages, final


def bpe_pair_counts_stages(dialect: str, table: str = "documents",
                           top_k: int = 20
                           ) -> tuple[list[tuple[str, str]], str]:
    """One round of BPE tokenizer training at corpus scale (Sennrich et
    al., "Neural Machine Translation of Rare Words with Subword Units",
    2016): adjacent-symbol pair frequencies over the word-frequency
    table, ranked to propose the next merge.

    Shape: tokenize once -> word-frequency aggregate (the ONLY
    corpus-wide shuffle; distinct-word cardinality, not token volume) ->
    per-word character bigrams x word frequency -> pair aggregate over
    the (tiny) vocabulary relation. Iterating = re-running with the
    merged symbol applied; every round shuffles only the vocab table, so
    the classic training loop is corpus-scan-free after round one. (At 100 TB the
    word-frequency table is the standard first reduction — a few hundred
    million rows, not the trillions of tokens.)"""
    from . import dual
    toks = _tokens(dialect, "text")
    pairs = dual.transform(
        dialect, dual.sequence(dialect, "1", "length(w) - 1"),
        "i -> substr(w, CAST(i AS INT), 2)")
    stages = [
        ("__bpe_tok", f"SELECT {dual.explode(dialect, toks, 'w')} "
                      f"FROM {table}"),
        ("__bpe_wf", "SELECT lower(w) AS w, CAST(COUNT(*) AS BIGINT) AS wf "
                     "FROM __bpe_tok GROUP BY lower(w)"),
        ("__bpe_pairs", f"SELECT pair, wf FROM (SELECT wf, "
                        f"{dual.explode(dialect, pairs, 'pair')} "
                        f"FROM __bpe_wf WHERE length(w) >= 2) __p"),
        ("__bpe_agg", "SELECT pair, CAST(SUM(wf) AS BIGINT) AS n "
                      "FROM __bpe_pairs GROUP BY pair"),
    ]
    final = (f"SELECT pair, n, CAST(ROW_NUMBER() OVER "
             f"(ORDER BY n DESC, pair ASC) AS BIGINT) AS rank "
             f"FROM __bpe_agg ORDER BY n DESC, pair ASC LIMIT {top_k}")
    return stages, final
