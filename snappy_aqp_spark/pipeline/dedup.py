"""Deduplication operators for training-data pipelines.

Four flavors over ``documents(doc_id, text, ...)``:

  * exact          — full-text hash clusters (one shuffle on the hash)
  * ngram_jaccard  — EXACT character-k-gram Jaccard via prefix filtering
                     (ppjoin-style rarest-first prefixes + size-ratio
                     pruning; candidate-complete, no all-pairs join)
  * minhash_lsh    — MinHash signatures -> banded LSH buckets -> candidate
                     pairs -> exact-Jaccard verification (probabilistic
                     recall, cheapest at extreme scale / low thresholds)
  * simhash        — 32-bit simhash over tokens, pairs within Hamming
                     distance (bit_count(xor) filter)

Declared as dialect-parameterized CTE stages (pipeline/dual.py): the Spark
plan and the DuckDB replay oracle come from the same text. All hashing is
md5-derived integer arithmetic — deterministic everywhere.

Scale notes: shingle explosion is ~len(text) rows per doc — at 100 TB run
minhash on a capped shingle sample per doc and bucket-join with AQE;
the inverted-index join partitions by shingle so hot shingles (stopword
grams) should be frequency-capped (``max_doc_freq``) exactly as done here.
"""

from __future__ import annotations

from . import dual
from ..dialect import DUCKDB, SPARK, dlit

P31 = 2147483647


def _shingles(dialect: str, table: str, col: str, k: int) -> list[tuple[str, str]]:
    """(doc_id, shingle-int) rows: distinct char k-grams as exact ints
    (Σ ascii·257^j, injective for k <= 7) — O(len·k) per doc via the bound
    char array (dual.gram_int_array)."""
    grams = dual.gram_int_array(dialect, col, k)
    stages = [
        ("__grams", f"SELECT doc_id, {dual.arr_distinct(dialect, grams)} AS gs "
                    f"FROM {table}"),
        ("__sh", f"SELECT doc_id, {dual.explode(dialect, 'gs', 'sh')} "
                 f"FROM __grams"),
    ]
    return stages


def exact_dedup_stages(dialect: str, table: str = "documents",
                       col: str = "text") -> tuple[list[tuple[str, str]], str]:
    stages = [
        ("__fp", f"SELECT doc_id, md5({col}) AS fp FROM {table}"),
        ("__cl", "SELECT fp, CAST(COUNT(*) AS BIGINT) AS cluster_size, "
                 "CAST(MIN(doc_id) AS BIGINT) AS keeper FROM __fp GROUP BY fp"),
    ]
    final = ("SELECT f.doc_id, c.keeper, c.cluster_size, "
             "CASE WHEN f.doc_id = c.keeper THEN 0 ELSE 1 END AS is_duplicate "
             "FROM __fp f JOIN __cl c ON f.fp = c.fp "
             "ORDER BY f.doc_id")
    return stages, final


_SIG_WORDS = 16          # 16 x 63 = 1008 signature bits per document
_SIG_BITS = 63           # bits per word: 1 << 63 overflows signed BIGINT


def _sig_words_sql(dialect: str) -> str:
    """per-doc 1008-bit capped-token-set signature as 16 BIGINT words.

    Bucket = avalanched token hash mod 1008 (mod-P31 multiplicative mix —
    the raw polynomial gram codes have correlated low bits); word i holds
    the BIT_OR of ``1 << (bucket % 63)`` over buckets in [63i, 63i+63)
    (63 usable bits: ``1 << 63`` overflows signed 64-bit in DuckDB)."""
    bkt = (f"((((sh % {P31}) * 2654435761 + 99991) % {P31}) "
           f"% {_SIG_WORDS * _SIG_BITS})")
    one = dual.shiftleft(dialect, "CAST(1 AS BIGINT)", f"({bkt}) % {_SIG_BITS}")
    wi = dual.idiv(dialect, bkt, str(_SIG_BITS))
    words = ", ".join(
        f"COALESCE(BIT_OR(CASE WHEN wi = {i} THEN wv END), 0) AS w{i}"
        for i in range(_SIG_WORDS))
    return (f"SELECT doc_id, {words} FROM "
            f"(SELECT doc_id, {wi} AS wi, {one} AS wv FROM __shc) "
            f"GROUP BY doc_id")


def _popxor_sql(dialect: str) -> str:
    """sum of per-word popcounts of the two signatures' XOR (each term
    cast to BIGINT: DuckDB's bit_count returns TINYINT and 16 words of
    popcount overflow it)."""
    return "(" + " + ".join(
        f"CAST(bit_count({dual.xor(dialect, f'sa.w{i}', f'sb.w{i}')}) "
        "AS BIGINT)"
        for i in range(_SIG_WORDS)) + ")"


def ngram_jaccard_stages(dialect: str, threshold: float = 0.8, k: int = 5,
                         table: str = "documents", col: str = "text",
                         max_doc_freq: int = 10_000
                         ) -> tuple[list[tuple[str, str]], str]:
    """EXACT n-gram Jaccard pairs via PREFIX FILTERING — complete (unlike
    minhash) without the all-co-shingled-pairs quadratic join.

    Chaudhuri/Xiao prefix-filter principle: order every doc's shingles by
    one global total order (rarest-first for pruning power); two docs with
    |A∩B| >= O must share a shingle among the first |A|-O+1 / |B|-O+1 of
    each. Jaccard >= t forces overlap >= ceil(t*n_doc) and partner size
    within [t*n, n/t], so candidates come from ONE equi-join on the short
    prefixes + a size-ratio filter; the exact intersection count then runs
    only over candidate pairs. At 100 TB every stage is an equi-shuffle
    bounded by prefix/candidate volume — no N x N product.

    Two further exact ppjoin prunings (Xiao et al., "Efficient Similarity
    Joins for Near Duplicate Detection") keep the candidate set small even
    on low-entropy corpora where shingles collide heavily:

      * INDEXING PREFIX — orient each pair by full size (smaller side
        first).  For the smaller doc the pair overlap is >= 2t/(1+t)*n, so
        its join prefix shrinks to c - ceil(2t/(1+t)*n) + 1 (vs the probe
        prefix c - ceil(t*n) + 1): the candidate join is short-prefix x
        long-prefix, quadratically fewer pairs per hot shingle.
      * POSITIONAL FILTER — both docs' shingles are sorted by the same
        global (df, sh) order, so the (df, sh)-smallest shared token has
        the minimal row number in BOTH docs simultaneously; every earlier
        token is unshared.  Overlap <= 1 + min(ca - ra0, cb - rb0), and
        Jaccard >= t needs overlap*(1+t) >= t*(na+nb) — pairs that cannot
        reach it are dropped before the array-intersect verify.

    Survivors then pass an exact XOR-POPCOUNT SCREEN before the (hash-set)
    array intersect: each doc's capped token set is summarized as a
    1024-bit signature (16 BIGINT words; one bucketed BIT_OR pass).  A
    signature word bit set on exactly one side proves >= 1 unshared token
    in that bucket, and distinct buckets are distinct tokens, so
    sum_i bit_count(wa_i ^ wb_i) <= |A delta B| exactly.  Jaccard >= t
    bounds the symmetric difference by ca + cb - 2t/(1+t)*(na+nb); pairs
    whose popcount lower bound exceeds it cannot qualify.  The screen is
    ~50 integer ops per pair vs ~2x|doc| hash-set ops for the intersect,
    and on low-similarity candidate floods it removes ~99% of the verify
    work while provably never dropping a true pair.
    All bounds use an epsilon slack on the float threshold so rounding
    can only LENGTHEN a prefix / KEEP a candidate, never lose a true pair.

    ``max_doc_freq`` caps hot-shingle document frequency exactly as
    before: intersections count capped shingles, union sizes stay full —
    same output contract as the prior baseline, now scale-shaped."""
    t = dlit(threshold)
    # 2t/(1+t): the smaller side's minimum overlap fraction (of its own
    # FULL size) against any eligible partner
    t2 = dlit(2.0 * threshold / (1.0 + threshold))
    eps = "1e-9"
    stages = _shingles(dialect, table, col, k)
    stages += [
        # full sizes come free off the distinct arrays — a COUNT over the
        # exploded stream would re-shuffle the whole corpus
        ("__sz", f"SELECT doc_id, CAST({dual.arr_len(dialect, 'gs')} "
                 f"AS BIGINT) AS n FROM __grams"),
        # global shingle document frequency: the prefix order AND the
        # hot-shingle cap both come off this one aggregate
        ("__dfc", "SELECT sh, CAST(COUNT(*) AS BIGINT) AS df FROM __sh "
                  "GROUP BY sh"),
        ("__shc", f"SELECT s.doc_id, s.sh, d.df FROM __sh s "
                  f"JOIN __dfc d ON s.sh = d.sh WHERE d.df <= {max_doc_freq}"),
        ("__csz", "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS c FROM __shc "
                  "GROUP BY doc_id"),
        # rarest-first probe prefix: the first c - ceil(t*n) + 1 shingles,
        # with sizes and row numbers attached once for both join sides
        ("__pref",
         "SELECT q.doc_id, q.sh, q.rn, z.n, c.c FROM ("
         "SELECT s.doc_id, s.sh, "
         "ROW_NUMBER() OVER (PARTITION BY s.doc_id ORDER BY s.df, s.sh) "
         "AS rn FROM __shc s) q "
         "JOIN __sz z ON q.doc_id = z.doc_id "
         "JOIN __csz c ON q.doc_id = c.doc_id "
         f"WHERE q.rn <= c.c - CAST(CEIL({t} * z.n - {eps}) AS BIGINT) + 1"),
        # candidates: indexing-prefix equi-join (smaller side restricted to
        # its 2t/(1+t) prefix), size-ratio pruning, then the positional
        # filter over the first shared token's row numbers
        ("__cand",
         "SELECT LEAST(a.doc_id, b.doc_id) AS ida, "
         "GREATEST(a.doc_id, b.doc_id) AS idb, "
         "MIN(a.n) + MIN(b.n) AS ns, MIN(a.c) + MIN(b.c) AS cs "
         "FROM __pref a JOIN __pref b ON a.sh = b.sh "
         "AND (a.n < b.n OR (a.n = b.n AND a.doc_id < b.doc_id)) "
         f"AND a.rn <= a.c - CAST(CEIL({t2} * a.n - {eps}) AS BIGINT) + 1 "
         f"AND b.n * {t} <= a.n "
         "GROUP BY a.doc_id, b.doc_id "
         f"HAVING ({dlit(1.0)} + {t}) * "
         "(1 + LEAST(MIN(a.c) - MIN(a.rn), MIN(b.c) - MIN(b.rn))) "
         f">= {t} * (MIN(a.n) + MIN(b.n)) - {eps}"),
        # 1024-bit capped-token-set signatures: 16 words per doc, one
        # bucketed BIT_OR pass over the capped stream
        ("__sigw", _sig_words_sql(dialect)),
        # exact screen: popcount(xor) lower-bounds |A delta B|; prune when
        # even the bound exceeds the threshold's symmetric-difference budget
        ("__scr",
         "SELECT c.ida, c.idb, c.ns FROM __cand c "
         "JOIN __sigw sa ON sa.doc_id = c.ida "
         "JOIN __sigw sb ON sb.doc_id = c.idb "
         f"WHERE {_popxor_sql(dialect)} <= "
         f"CAST(c.cs AS DOUBLE) - {t2} * c.ns + {eps}"),
        # exact intersection counts, screened pairs only — via per-doc
        # capped-gram ARRAYS, not a token re-explosion: joining candidates
        # back to the token stream costs |cand| x tokens-per-doc
        # intermediate rows (measured 17x slower at sf0.1); two array
        # lookups + an array_intersect are linear in the candidate count.
        # Round-11 A/B, REVERTED: restricting this aggregate to screened
        # candidate docs (semi-join on a __scr-derived doc list first)
        # measured cold 5.3 -> 6.7 s / warm 0.55 -> 1.08 s — it serializes
        # the array build behind the whole screen chain (they run as
        # CONCURRENT AQE stages in this shape) and adds an exchange; the
        # corpus-wide array build over the persisted capped stream is the
        # faster plan at every scale where __shc persists anyway.
        ("__gsc", f"SELECT doc_id, {dual.arr_agg(dialect, 'sh')} AS gsc "
                  f"FROM __shc GROUP BY doc_id"),
        ("__pairs",
         f"SELECT c.ida, c.idb, c.ns, "
         f"{dual.arr_intersect_len(dialect, 'ga.gsc', 'gb.gsc')} AS common "
         f"FROM __scr c JOIN __gsc ga ON ga.doc_id = c.ida "
         f"JOIN __gsc gb ON gb.doc_id = c.idb"),
        # threshold filter inside the stage + _mz: the final's global
        # ORDER BY otherwise re-evaluates the whole candidate/verify chain
        # (prefix self-join included) a second time for range-bound
        # sampling; the materialized relation is the output-sized
        # qualifying-pair set
        # jaccard computed ONCE in the inner select, threshold on the
        # alias outside (same filter-over-subquery shape as terms.py
        # __ttk_mz) — one expression to edit, no way for the emitted
        # value and the filter to desynchronize
        ("__jk_mz",
         f"SELECT ida, idb, jaccard FROM ("
         f"SELECT p.ida, p.idb, CAST(p.common AS DOUBLE) / "
         f"CAST(p.ns - p.common AS DOUBLE) AS jaccard "
         f"FROM __pairs p) __jk WHERE jaccard >= {t}"),
    ]
    final = "SELECT ida, idb, jaccard FROM __jk_mz ORDER BY ida, idb"
    return stages, final


def line_dedup_stages(dialect: str, min_count: int = 3,
                      table: str = "documents", col: str = "text"
                      ) -> tuple[list[tuple[str, str]], str]:
    """Corpus-level LINE deduplication with document reconstruction — the
    RefinedWeb/Falcon recipe (Penedo et al. 2023): a line whose exact text
    occurs >= ``min_count`` times across the whole corpus is boilerplate
    (headers, nav bars, license blocks); EVERY occurrence is removed and
    each document is rebuilt from its surviving lines in original order.

    Differs from ``duplicate_spans_stages`` (which *reports* duplicated
    token spans): this is the cleaning transform — output is the cleaned
    corpus plus per-document removal accounting.

    Plan shape at 100 TB: one explode (rows ~ total line count), one
    GROUP BY on the line hash (the only wide shuffle; md5 keys, not line
    text), a hash semi-join back, and one per-doc rebuild aggregation.
    Empty/whitespace-only lines are dropped before counting so indentation
    noise can't link unrelated documents."""
    nl = "chr(10)"          # '\n' literal text is not portable (see dual)
    lines = dual.str_split(dialect, col, nl)
    def _structs(la: str) -> str:
        body = dual.mk_struct(dialect, [
            ("li", "i"), ("line", f"trim({dual.elem(dialect, la, 'i')})")])
        return dual.transform(
            dialect, dual.sequence(dialect, "1", dual.arr_len(dialect, la)),
            f"i -> {body}")

    structs = dual.bind_array(dialect, lines, _structs)
    stages = [
        ("__dls", f"SELECT doc_id, {dual.explode(dialect, structs, 's')} "
                  f"FROM {table}"),
        ("__dl", "SELECT doc_id, CAST(s.li AS BIGINT) AS li, s.line AS line, "
                 "md5(s.line) AS lh FROM __dls WHERE length(s.line) > 0"),
        # round 11: the keep filter excludes against the BOILERPLATE list
        # (lines at or over min_count — rare by construction) instead of
        # joining every line to the full per-line count table: the join's
        # build side shrinks from |distinct lines| to |boilerplate lines|
        # (broadcastable; plans as a hashed anti join via NOT EXISTS on
        # both engines), and `cnt < min_count` ≡ `lh not in the >= list`
        # because every line hash has exactly one count and is non-null.
        ("__bl", f"SELECT lh FROM __dl GROUP BY lh "
                 f"HAVING COUNT(*) >= {min_count}"),
        ("__keep", "SELECT d.doc_id, d.li, d.line FROM __dl d "
                   "WHERE NOT EXISTS "
                   "(SELECT 1 FROM __bl b WHERE b.lh = d.lh)"),
        # A no-persist variant (window COUNT(*) OVER (PARTITION BY lh) +
        # in-row per-doc line counts) was A/B'd this round and REVERTED:
        # cold 1.43 -> 2.63 s, warm 0.51 -> 1.06 s — the fixture's folded
        # pre-stage became the new multi-referenced (persisted) relation
        # and the lh window sort costs more than the hash aggregate. The
        # exploded line stream stays the pipeline's persisted stage.
        ("__stat", "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines "
                   "FROM __dl GROUP BY doc_id"),
        ("__rb", f"SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept, "
                 f"{dual.arr_join(dialect, dual.ordered_list(dialect, 'line', 'li'), nl)} "
                 f"AS clean_text FROM __keep GROUP BY doc_id"),
    ]
    final = (f"SELECT s.doc_id, s.n_lines, "
             f"s.n_lines - COALESCE(r.n_kept, 0) AS n_removed, "
             f"COALESCE(r.clean_text, '') AS clean_text "
             f"FROM __stat s LEFT JOIN __rb r ON s.doc_id = r.doc_id "
             f"ORDER BY s.doc_id")
    return stages, final


def line_dedup_fixture_stages(dialect: str, words_per_line: int = 3,
                              min_count: int = 2
                              ) -> tuple[list[tuple[str, str]], str]:
    """`line_dedup_stages` over the synthetic corpus, which has no
    newlines: a deterministic preprocessing stage folds every document
    into ``words_per_line``-word lines first (same fold on both engines),
    then the real recipe runs unchanged. Near-duplicate documents share
    word runs, so their folded lines repeat corpus-wide and the removal
    branch is genuinely exercised."""
    nl, sp = "chr(10)", "chr(32)"
    words = dual.str_split(dialect, "text", sp)

    def _fold(wa: str) -> str:
        n_lines = (f"CAST(CEIL(CAST({dual.arr_len(dialect, wa)} AS DOUBLE) "
                   f"/ {words_per_line}.0) AS BIGINT)")
        line = dual.arr_join(
            dialect,
            dual.arr_slice(dialect, wa, f"(b - 1) * {words_per_line} + 1",
                           str(words_per_line)), sp)
        lines = dual.transform(
            dialect, dual.sequence(dialect, "1", n_lines), f"b -> {line}")
        return dual.arr_join(dialect, lines, nl)

    pre = [("__docs_ml",
            f"SELECT doc_id, {dual.bind_array(dialect, words, _fold)} AS text "
            f"FROM documents")]
    stages, final = line_dedup_stages(dialect, min_count=min_count,
                                      table="__docs_ml")
    return pre + stages, final


def _minhash_exprs(n_hashes: int) -> list[tuple[int, int]]:
    """fixed (a, b) constants for the permutation hashes."""
    rnd = []
    a, b = 1103515245, 12345
    for i in range(n_hashes):
        a = (a * 1299709 + 15485863) % P31
        b = (b * 179424673 + 99991) % P31
        rnd.append((a | 1, b))
    return rnd


def minhash_lsh_stages(dialect: str, threshold: float, k: int = 5,
                       n_hashes: int = 32, bands: int = 8,
                       table: str = "documents", col: str = "text"
                       ) -> tuple[list[tuple[str, str]], str]:
    """one-permutation MinHash -> bands -> bucket join -> exact verify.

    Scale shape (the 100 TB plan):
      * signatures use ONE permutation hash per shingle (Li, Owen, Zhang
        2012, "One Permutation Hashing"): the hash value selects one of
        ``n_hashes`` bins and the per-bin minimum is the signature slot.
        One explode + two narrow whole-stage-codegen aggregations replace
        the n_hashes-way per-document array passes (which burned ~45M boxed
        lambda evaluations at sf0.1 and dominated the bench);
      * the band hash combines its bins positionally (m · C^(bin mod r),
        summed mod P31) so it is ORDER-INDEPENDENT — no sort, identical
        result on any execution order, and empty bins (short docs) simply
        contribute nothing;
      * shingles are exploded ONLY for documents that appear in a candidate
        pair (semi-join first), so the exact-Jaccard verify join never
        touches the full corpus.
    The only shuffles left are the per-doc bin/band aggregations (rows ~
    shingle count, then n_hashes/doc, then bands/doc), the (small) band
    self-join, and the verify join over candidate docs.
    """
    rows = n_hashes // bands
    (pa, pb) = _minhash_exprs(1)[0]
    cpows = [pow(1299721, j, P31) for j in range(rows)]
    grams = dual.gram_int_array(dialect, col, k)
    stages = [
        # distinct shingles as NARROW ROWS, not arrays: this stage is the
        # one worth caching (3 downstream readers), and persisting two-long
        # rows is ~10x cheaper than serializing per-doc array columns
        ("__shr", f"SELECT doc_id, "
                  f"{dual.explode(dialect, dual.arr_distinct(dialect, grams), 'sh')} "
                  f"FROM {table} WHERE length({col}) >= {k}"),
        # one permutation hash per shingle; hash selects the signature bin
        ("__bins", f"SELECT doc_id, h % {n_hashes} AS bin, MIN(h) AS m FROM "
                   f"(SELECT doc_id, ((sh % {P31}) * {pa} + {pb}) % {P31} AS h "
                   f"FROM __shr) __oph GROUP BY doc_id, h % {n_hashes}"),
        # band value = band-id packed above an order-independent positional
        # combine of the band's bins (sum of m * C^(bin mod rows) mod P31)
        ("__bands",
         f"SELECT doc_id, CAST((bin - (bin % {rows})) / {rows} AS BIGINT) "
         f"* {2 ** 31} + SUM((m * (CASE "
         + " ".join(f"WHEN bin % {rows} = {j} THEN {c}" for j, c in enumerate(cpows))
         + f" END)) % {P31}) % {P31} AS bv "
         f"FROM __bins "
         f"GROUP BY doc_id, CAST((bin - (bin % {rows})) / {rows} AS BIGINT)"),
        ("__cand",
         "SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb "
         "FROM __bands a JOIN __bands b "
         "ON a.bv = b.bv AND a.doc_id < b.doc_id"),
        ("__cdoc", "SELECT ida AS doc_id FROM __cand "
                   "UNION SELECT idb AS doc_id FROM __cand"),
        # exact intersection via per-candidate-doc shingle ARRAYS, not a
        # token re-explosion: joining candidate pairs back to the shingle
        # stream costs |cand| x shingles-per-doc intermediate rows; two
        # array lookups + an array_intersect are linear in the candidate
        # count (the ngram_jaccard_stages rewrite, ported — the explode
        # join was the dominant warm-iteration cost at sf0.1).
        # Round 11: the verify stream shingles ONLY candidate documents
        # straight off the base table (doc_id join BEFORE the gram hash),
        # which leaves __shr single-referenced — the corpus-sized shingle
        # stream is never persisted; candidates are a tiny fraction of
        # the corpus, so re-hashing just them beats caching everything
        ("__shv",
         f"SELECT t.doc_id, "
         f"{dual.explode(dialect, dual.arr_distinct(dialect, dual.gram_int_array(dialect, f't.{col}', k)), 'sh')} "
         f"FROM {table} t JOIN __cdoc d ON t.doc_id = d.doc_id "
         f"WHERE length(t.{col}) >= {k}"),
        ("__gsc",
         f"SELECT g.doc_id, {dual.arr_agg(dialect, 'g.sh')} AS gsc, "
         f"CAST(COUNT(*) AS BIGINT) AS n FROM __shv g GROUP BY g.doc_id"),
        ("__common",
         f"SELECT c.ida, c.idb, "
         f"{dual.arr_intersect_len(dialect, 'ga.gsc', 'gb.gsc')} AS common, "
         f"ga.n + gb.n AS ns "
         f"FROM __cand c JOIN __gsc ga ON ga.doc_id = c.ida "
         f"JOIN __gsc gb ON gb.doc_id = c.idb"),
        ("__j", "SELECT m.ida, m.idb, CAST(m.common AS DOUBLE) / "
                "CAST(m.ns - m.common AS DOUBLE) AS jaccard "
                "FROM __common m"),
        # _mz tail (the final's global ORDER BY otherwise re-evaluates the
        # band/verify chain a second time for range-bound sampling). __j
        # is kept as its own stage for the DuckDB oracle's __cpairs
        # composition (dedup_clusters_oracle_sql selects FROM __j);
        # cluster_labels runs the returned final, so it consumes — and
        # benefits from — the __jt_mz threshold filter too
        ("__jt_mz",
         f"SELECT ida, idb, jaccard FROM __j "
         f"WHERE jaccard >= {dlit(threshold)}"),
    ]
    final = "SELECT ida, idb, jaccard FROM __jt_mz ORDER BY ida, idb"
    return stages, final


def simhash_stages(dialect: str, max_hamming: int = 3, n_bits: int = 32,
                   table: str = "documents", col: str = "text"
                   ) -> tuple[list[tuple[str, str]], str]:
    """simhash signatures + pigeonhole-banded candidate pairs.

    Signature: per-bit sums of ±1 over mixed token hashes, computed with
    array HOFs inside one projection (no explode, no n_bits-way aggregate
    shuffle; the token array is bound once via dual.bind_array).

    Pair generation: the signature is split into ``max_hamming + 1``
    disjoint bit segments. Two signatures within Hamming distance
    ``max_hamming`` differ in at most ``max_hamming`` segments, so they
    must agree EXACTLY on at least one (pigeonhole) — an equi-join on
    (segment-id, segment-value) yields a guaranteed-complete candidate set;
    ``bit_count(xor) <= d`` verifies candidates. No all-pairs product.
    """
    toks_raw = dual.gram_int_array(dialect, col, 4, stride=4)
    # multiplicative mixing so simhash bits decorrelate from raw characters
    toks = dual.transform(dialect, toks_raw,
                          f"t -> (((t % {P31}) * 2654435761 + 12345) % {P31})")

    def sig_body(ba: str) -> str:
        terms = []
        for j in range(n_bits):
            bit = (f"t -> CAST(({dual.shiftright(dialect, 't', str(j))} % 2) "
                   f"* 2 - 1 AS BIGINT)")
            sj = dual.arr_sum_bigint(dialect, dual.transform(dialect, ba, bit))
            terms.append(f"(CASE WHEN {sj} >= 0 THEN {2 ** j} ELSE 0 END)")
        return "(" + " + ".join(terms) + ")"

    sig = dual.bind_array(dialect, toks, sig_body)
    stages = [
        # docs shorter than the token width have no tokens: excluded, as the
        # explode-based formulation produced no rows for them
        ("__sig", f"SELECT doc_id, CAST({sig} AS BIGINT) AS sig "
                  f"FROM {table} WHERE length({col}) >= 4"),
    ]
    n_seg = max_hamming + 1
    seg_bits = -(-n_bits // n_seg)          # ceil; segments cover all bits
    segs = [f"(CAST({bi} AS BIGINT) * 4294967296 + "
            f"({dual.shiftright(dialect, 'sig', str(bi * seg_bits))} "
            f"% {2 ** seg_bits}))" for bi in range(n_seg)]
    stages += [
        ("__seg", f"SELECT doc_id, sig, "
                  f"{dual.explode(dialect, dual.array_lit(dialect, segs), 'segv')} "
                  f"FROM __sig"),
        ("__cand",
         f"SELECT DISTINCT a.doc_id AS ida, a.sig AS siga, "
         f"b.doc_id AS idb, b.sig AS sigb "
         f"FROM __seg a JOIN __seg b "
         f"ON a.segv = b.segv AND a.doc_id < b.doc_id"),
    ]
    hamc = f"bit_count({dual.xor(dialect, 'siga', 'sigb')})"
    final = (f"SELECT ida, idb, CAST({hamc} AS BIGINT) AS hamming "
             f"FROM __cand WHERE {hamc} <= {max_hamming} ORDER BY ida, idb")
    return stages, final
