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

    ``max_doc_freq`` caps hot-shingle document frequency exactly as
    before: intersections count capped shingles, union sizes stay full —
    same output contract as the prior baseline, now scale-shaped."""
    t = dlit(threshold)
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
        # rarest-first prefix: keep the first c - ceil(t*n) + 1 shingles
        ("__pref",
         "SELECT q.doc_id, q.sh FROM ("
         "SELECT s.doc_id, s.sh, "
         "ROW_NUMBER() OVER (PARTITION BY s.doc_id ORDER BY s.df, s.sh) "
         "AS rn FROM __shc s) q "
         "JOIN __sz z ON q.doc_id = z.doc_id "
         "JOIN __csz c ON q.doc_id = c.doc_id "
         f"WHERE q.rn <= c.c - CAST(CEIL({t} * z.n) AS BIGINT) + 1"),
        # candidates: prefix equi-join + size-ratio pruning (n_b in
        # [t*n_a, n_a/t] is necessary for jaccard >= t)
        ("__cand",
         "SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb "
         "FROM __pref a JOIN __pref b ON a.sh = b.sh "
         "AND a.doc_id < b.doc_id "
         "JOIN __sz za ON a.doc_id = za.doc_id "
         "JOIN __sz zb ON b.doc_id = zb.doc_id "
         f"WHERE zb.n * {t} <= za.n AND za.n * {t} <= zb.n"),
        # exact intersection counts, candidate pairs only — via per-doc
        # capped-gram ARRAYS, not a token re-explosion: joining candidates
        # back to the token stream costs |cand| x tokens-per-doc
        # intermediate rows (measured 17x slower at sf0.1); two array
        # lookups + an array_intersect are linear in the candidate count
        ("__gsc", f"SELECT doc_id, {dual.arr_agg(dialect, 'sh')} AS gsc "
                  f"FROM __shc GROUP BY doc_id"),
        ("__pairs",
         f"SELECT c.ida, c.idb, "
         f"{dual.arr_intersect_len(dialect, 'ga.gsc', 'gb.gsc')} AS common "
         f"FROM __cand c JOIN __gsc ga ON ga.doc_id = c.ida "
         f"JOIN __gsc gb ON gb.doc_id = c.idb"),
        ("__j", "SELECT p.ida, p.idb, CAST(p.common AS DOUBLE) / "
                "CAST(sa.n + sb.n - p.common AS DOUBLE) AS jaccard "
                "FROM __pairs p JOIN __sz sa ON p.ida = sa.doc_id "
                "JOIN __sz sb ON p.idb = sb.doc_id"),
    ]
    final = (f"SELECT ida, idb, jaccard FROM __j WHERE jaccard >= {t} "
             f"ORDER BY ida, idb")
    return stages, final


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
        # shingle rows only for candidate documents
        ("__shc", "SELECT g.doc_id, g.sh "
                  "FROM __shr g JOIN __cdoc d ON g.doc_id = d.doc_id"),
        ("__sz", "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM __shr "
                 "GROUP BY doc_id"),
        ("__common",
         "SELECT c.ida, c.idb, CAST(COUNT(*) AS BIGINT) AS common "
         "FROM __cand c JOIN __shc a ON a.doc_id = c.ida "
         "JOIN __shc b ON b.doc_id = c.idb AND a.sh = b.sh "
         "GROUP BY c.ida, c.idb"),
        ("__j", "SELECT m.ida, m.idb, CAST(m.common AS DOUBLE) / "
                "CAST(sa.n + sb.n - m.common AS DOUBLE) AS jaccard "
                "FROM __common m JOIN __sz sa ON m.ida = sa.doc_id "
                "JOIN __sz sb ON m.idb = sb.doc_id"),
    ]
    final = (f"SELECT ida, idb, jaccard FROM __j "
             f"WHERE jaccard >= {dlit(threshold)} ORDER BY ida, idb")
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
