"""Stratified samplers (the reference's core operator family).

Reference semantics rebuilt here:
  * ``StratifiedSamplerReservoir`` — fixed-size per-stratum reservoir
    (reference: execution/StratifiedSamplerReservoir.scala:33-77)
  * ``StratifiedSamplerCached`` — fraction-based sampling with a per-stratum
    floor (reference: execution/StratifiedSamplerCached.scala:49)
  * hash/universe sampling — our scale path (no JVM analog in the reference;
    it replaces the memory-aware ``StratifiedSampledRDD`` scheduling at
    stratifiedSampling.scala:122-266 with a stateless one-pass filter)
  * the hidden weight column — reference packs ``numSamples<<40 |
    stratumTotal<<8 | hash`` into one LONG (stratifiedSampling.scala:749-760)
    and decodes it at query time via ``MapColumnToWeight``
    (common/WeightedAggregates.scala:230-311). We store the decoded triple
    directly: weight double + (n_s, N_s) bigints.

Scale design (100 TB):
  * ``hash`` method never shuffles the base data: one scan tags rows by a
    key-derived integer, a tiny per-stratum count aggregate is broadcast back.
    This is the default for big tables.
  * ``reservoir``/``fraction`` need a per-stratum top-k by the hash value.
    Naively that is a full-table window shuffle; we instead prefilter to
    candidates whose hash falls below an oversampled threshold and fall back
    per-stratum (exactly) when a stratum has too few candidates, so only
    ~8x the sample volume ever shuffles.

Randomness is derived from unique key columns (detrng.py), so sampling is
deterministic, replayable on any engine, and independent of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..detrng import (MODULUS, hash_sql, rand_hash_sql,
                      threshold_for_fraction)
from ..specs import (STRATA_SAMPLED_COL, STRATA_TOTAL_COL, WEIGHT_COL,
                     SampleSpec)

# strata smaller than this skip the candidate prefilter entirely
_PREFILTER_MIN_STRATUM = 4096
_OVERSAMPLE = 8


def _qcs_cols(spec: SampleSpec) -> list[str]:
    return [f"__q{i}" for i in range(len(spec.qcs))]


def priority_sql(spec: SampleSpec) -> str:
    """The spec's sampling-priority fragment: plain polynomial key hash, or
    the quadratically scrambled stream for ``reservoir_rand`` (seeded
    Algorithm-R semantics — taking the k SMALLEST independent uniform
    priorities per stratum is distribution-identical to Algorithm-R's
    replace-at-k/seen, and replayable on any engine)."""
    fn = (rand_hash_sql if spec.method in ("reservoir_rand", "hash_rand")
          else hash_sql)
    return fn(list(spec.key_cols), spec.seed)


def _tag(df: DataFrame, spec: SampleSpec) -> DataFrame:
    out = df.withColumn("__h", F.expr(priority_sql(spec)))
    for i, q in enumerate(spec.qcs):
        out = out.withColumn(f"__q{i}", F.expr(q))
    return out


def _nullsafe_join(left: DataFrame, right: DataFrame, cols: list[str],
                   how: str = "inner") -> DataFrame:
    """broadcast-join on ``cols`` with NULL-safe equality (<=>).

    A NULL-valued QCS expression is a real stratum (the SQL-oracle window
    partitions keep it), so plain ``on=cols`` equality would silently drop
    its rows from the sample. Right-side join columns are renamed before the
    join and dropped after, so the output schema matches an ``on=cols``
    join."""
    ren = {c: f"__rj_{c}" for c in cols}
    r = right
    for c, rc in ren.items():
        r = r.withColumnRenamed(c, rc)
    cond = None
    for c, rc in ren.items():
        e = F.col(c).eqNullSafe(F.col(rc))
        cond = e if cond is None else cond & e
    out = left.join(F.broadcast(r), on=cond, how=how)
    if how in ("leftsemi", "left_semi", "leftanti", "left_anti"):
        return out
    return out.drop(*ren.values())


def _finish(df: DataFrame, base_cols: list[str]) -> DataFrame:
    return df.select(
        *base_cols,
        F.col("__nsmp").cast("bigint").alias(STRATA_SAMPLED_COL),
        F.col("__ntot").cast("bigint").alias(STRATA_TOTAL_COL),
        (F.col("__ntot").cast("double") / F.col("__nsmp").cast("double")).alias(WEIGHT_COL),
    )


def _hash_sample(df: DataFrame, spec: SampleSpec) -> DataFrame:
    thr = threshold_for_fraction(spec.fraction)
    qcs = _qcs_cols(spec)
    tagged = _tag(df, spec).withColumn(
        "__in", F.when(F.col("__h") < F.lit(thr), F.lit(1)).otherwise(F.lit(0)))
    counts = (tagged.groupBy(*qcs)
              .agg(F.count(F.lit(1)).alias("__ntot"), F.sum("__in").alias("__nsmp")))
    joined = _nullsafe_join(tagged.where(F.col("__in") == 1).drop("__in"),
                            counts.where(F.col("__nsmp") > 0), qcs)
    return _finish(joined, df.columns)


def _ranked_sample(df: DataFrame, spec: SampleSpec, use_prefilter: bool = True) -> DataFrame:
    """reservoir / fraction-with-floor via per-stratum rank on the hash.

    Equivalent to ROW_NUMBER() OVER (PARTITION BY qcs ORDER BY __h, keys)
    over the full table, but only candidate rows are shuffled into the
    window when the prefilter can prove exactness for a stratum.
    """
    k = spec.reservoir_size
    thr = threshold_for_fraction(spec.fraction) if spec.method == "fraction" else 0
    qcs = _qcs_cols(spec)
    tagged = _tag(df, spec)
    aggs = [F.count(F.lit(1)).alias("__ntot")]
    if spec.method == "fraction":
        # per-stratum count under the fraction threshold: a stratum with
        # >= k such rows never needs ranking (the k smallest priorities
        # are all under thr, so (rn <= k) OR (h < thr) == (h < thr)) —
        # at scale this removes nearly every row from the window, whose
        # partition count is the (small) stratum count and would
        # otherwise serialize a fraction-sized sort per stratum
        aggs.append(F.sum((F.col("__h") < F.lit(thr)).cast("long"))
                    .alias("__nthr"))
    counts = tagged.groupBy(*qcs).agg(*aggs)

    if use_prefilter:
        # candidate threshold per stratum: oversampled k/N (and at least the
        # fraction threshold for the fraction method)
        cand_thr = F.when(
            F.col("__ntot") <= F.lit(_PREFILTER_MIN_STRATUM), F.lit(MODULUS)
        ).otherwise(
            F.greatest(
                F.lit(thr),
                F.least(
                    F.lit(MODULUS),
                    F.ceil(F.lit(float(MODULUS * _OVERSAMPLE * (k + 32))) /
                           F.col("__ntot").cast("double")).cast("bigint"),
                ),
            )
        )
        counts_thr = counts.withColumn("__cthr", cand_thr)
        with_n = _nullsafe_join(tagged, counts_thr, qcs)
        # exactness check: a stratum's prefilter is valid iff it kept
        # >= k candidates; decided PER ROW from the broadcast candidate
        # counts (left join + coalesce 0), so (a) with_n is scanned once,
        # not once per ok/bad branch, and (b) a stratum with ZERO
        # candidates — absent from cand_counts entirely — correctly keeps
        # all its rows instead of vanishing (the old two-semi-join form
        # dropped it: a theoretical-only corner at _OVERSAMPLE=8, but a
        # real one the moment the oversample factor shrinks)
        cand_counts = (with_n.where(F.col("__h") < F.col("__cthr"))
                       .groupBy(*qcs).agg(F.count(F.lit(1)).alias("__cn")))
        cn = F.coalesce(F.col("__cn"), F.lit(0))
        pool = (_nullsafe_join(with_n, cand_counts, qcs, how="left")
                .where(((cn >= F.lit(k)) & (F.col("__h") < F.col("__cthr")))
                       | (cn < F.lit(k)))
                .drop("__cn"))
    else:
        pool = _nullsafe_join(tagged, counts, qcs)

    # fraction no-rank fast path: strata with >= k rows under thr pick
    # exactly {h < thr} (set-equal to the windowed pick, see counts above)
    direct = None
    if spec.method == "fraction":
        direct = pool.where((F.col("__nthr") >= F.lit(k))
                            & (F.col("__h") < F.lit(thr)))
        pool = pool.where(F.col("__nthr") < F.lit(k))

    # tiebreak by every base column: key columns may not be unique in the
    # wild, and rows identical in all columns are interchangeable — this
    # keeps the ranked pick deterministic across engines and partitionings
    order = [F.col("__h").asc()] + [F.col(c).asc() for c in df.columns]
    w = Window.partitionBy(*qcs).orderBy(*order)
    ranked = pool.withColumn("__rn", F.row_number().over(w))
    if spec.method in ("reservoir", "reservoir_rand"):
        picked = ranked.where(F.col("__rn") <= F.lit(k))
    else:
        picked = ranked.where((F.col("__rn") <= F.lit(k)) | (F.col("__h") < F.lit(thr)))
    picked = picked.drop("__rn")
    if direct is not None:
        picked = picked.unionByName(direct)
    n_per = picked.groupBy(*qcs).agg(F.count(F.lit(1)).alias("__nsmp"))
    out = _nullsafe_join(picked, n_per, qcs)
    return _finish(out, df.columns)


def _error_limit_sample(df: DataFrame, spec: SampleSpec) -> DataFrame:
    """per-stratum n from the CLT error-limit formula, then keep the n
    smallest key-hashes (see sampling/error_limit.py)."""
    from .error_limit import nreq_frag, stats_frags
    qcs = _qcs_cols(spec)
    tagged = _tag(df, spec)
    stats = tagged.groupBy(*qcs).agg(
        *[F.expr(s).alias(n) for n, s in stats_frags(spec).items()])
    req = stats.select(*qcs, F.col("__eN").alias("__ntot"),
                       F.expr(nreq_frag(spec)).alias("__nsmp"))
    pool = _nullsafe_join(tagged, req, qcs)
    order = [F.col("__h").asc()] + [F.col(c).asc() for c in df.columns]
    w = Window.partitionBy(*qcs).orderBy(*order)
    picked = (pool.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") <= F.col("__nsmp")))
    return _finish(picked, df.columns)


def stratified_sample(df: DataFrame, spec: SampleSpec) -> DataFrame:
    """Return df's stratified sample with the hidden weight columns appended.

    Analog of the reference's ad-hoc ``convertToStratifiedSample``
    (execution/SnappyContextAQPFunctions.scala:375-382).
    """
    if spec.base_filter:
        df = df.where(F.expr(spec.base_filter))
    if spec.method in ("hash", "hash_rand"):
        return _hash_sample(df, spec)
    if spec.method == "error_limit":
        return _error_limit_sample(df, spec)
    return _ranked_sample(df, spec)


def create_sample_table(spark, df: DataFrame, spec: SampleSpec, path: str,
                        partition_by: list[str] | None = None,
                        name: str | None = None) -> DataFrame:
    """Materialize a sample table to parquet (reference:
    ``CREATE SAMPLE TABLE`` -> ColumnFormatSamplingRelation persistence,
    sql/sampling/ColumnFormatSamplingRelation.scala:50).

    At 100 TB the sample itself can be billions of rows; partitioning by the
    leading QCS column keeps approx-query scans pruned.
    """
    sample = stratified_sample(df, spec)
    writer = sample.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    write_sample_sidecar(path, spec, name=name)
    return spark.read.parquet(path)


# NULL stratum sentinel for the multi-build composite key: QCS values are
# string-cast into one shared key column, and NULL is a real stratum
_NULL_STRATUM = "\x00<null>"


def multi_sample_build(spark, df: DataFrame,
                       named_specs: list[tuple[str, SampleSpec]],
                       path: str,
                       col_bounds: dict[str, float] | None = None
                       ) -> dict[str, str]:
    """Build N stratified samples of ONE base table — ANY mix of hash and
    ranked (reservoir / fraction-with-floor) specs — in a constant number
    of base scans (the batch analog of the streaming populator's one-pass
    fan-out, SnappyContextAQPFunctions.scala:390-442). The reference's
    canonical multi-sample scenario is exactly this shape: three NYC
    samples with different QCS at fraction 0.01 / reservoir 50 over one
    157M-row table (create_and_load_NYCTaxiCol_table.sql:17-35); built
    separately they cost several scans EACH.

      scan 1  every row map-side-explodes into one tiny (sample, stratum)
              entry per spec -> ONE partial-aggregated shuffle yields all
              per-spec stratum counts;
      scan 2  rows explode into per-spec candidates — hash specs by their
              inclusion predicate, ranked specs by the oversampled
              per-stratum prefilter (counts broadcast back, exactly
              _ranked_sample's cand_thr formula; strata the prefilter
              cannot certify keep ALL rows, decided per-row from the
              broadcast candidate counts, so no second base scan) — then
              ONE window over (sample, stratum) ranks every ranked spec's
              candidates in a single shuffle, and ONE
              partitionBy('__sample') write materializes everything.
              (The window's candidate-count re-aggregation recomputes the
              explode once more inside the same action — still O(1) scans
              overall.)

    Output per sample is row- and weight-identical to
    ``stratified_sample(df, spec)`` (pinned by pytest). Stratum identity
    uses the QCS tuple string-cast (NULL kept as a distinct stratum) —
    injective for the normal QCS types (int, string, date, boolean),
    and ENFORCED: a spec whose QCS evaluates to any other type (double,
    where ``-0.0``/``0.0`` group together natively but string-cast to
    distinct strata; timestamp; binary; ...) falls back to a per-spec
    ``stratified_sample`` build, so the equivalence contract holds for
    every QCS type the single-spec samplers accept (reference QCS
    generality: stratifiedSampling.scala:311-327). ``error_limit`` specs
    ride the same two passes: their quantized measure travels inside the
    scan-1 explode entries (the moment sums land in the same tiny counts
    aggregate), the CLT ``n_req`` derives per (sample, stratum) on that
    relation, and the shared window ranks with the per-stratum k."""
    import os
    if not named_specs:
        raise ValueError("multi-build needs at least one (name, spec)")
    seen = [n for n, _ in named_specs]
    if len(set(seen)) != len(seen):
        raise ValueError(f"duplicate sample names: {seen}")

    from pyspark.sql.types import (BooleanType, ByteType, DateType,
                                   IntegerType, LongType, ShortType,
                                   StringType)
    _cast_injective = (ByteType, ShortType, IntegerType, LongType,
                       StringType, DateType, BooleanType)

    def _qcs_fanout_safe(sp: SampleSpec) -> bool:
        fields = df.select(*[F.expr(q) for q in sp.qcs]).schema.fields
        return all(isinstance(f.dataType, _cast_injective) for f in fields)

    unsafe = [(n, sp) for n, sp in named_specs
              if not _qcs_fanout_safe(sp)]
    if unsafe:
        unsafe_names = {n for n, _ in unsafe}
        safe = [(n, sp) for n, sp in named_specs
                if n not in unsafe_names]
        subdirs = (multi_sample_build(spark, df, safe, path,
                                      col_bounds=col_bounds)
                   if safe else {})
        lcols = {c.lower() for c in df.columns}
        bnds = {c: v for c, v in (col_bounds or {}).items() if c in lcols}
        for n, sp in unsafe:
            sub = os.path.join(path, f"__sample={n}")
            stratified_sample(df, sp).write.mode("overwrite").parquet(sub)
            write_sample_sidecar(sub, sp, name=n, col_bounds=bnds)
            subdirs[n] = sub
        return subdirs
    specs = [sp for _, sp in named_specs]
    names = [n for n, _ in named_specs]
    is_hash = [sp.method in ("hash", "hash_rand") for sp in specs]
    is_el = [sp.method == "error_limit" for sp in specs]

    def skey(sp: SampleSpec):
        return F.array(*[F.coalesce(F.expr(q).cast("string"),
                                    F.lit(_NULL_STRATUM)) for q in sp.qcs])

    def live(sp: SampleSpec):
        return (F.expr(sp.base_filter) if sp.base_filter else F.lit(True))

    def hcol(sp: SampleSpec):
        return F.expr(priority_sql(sp))

    def frac_thr(sp: SampleSpec) -> int:
        # fraction threshold: the hash method's inclusion cut, and the
        # ranked fraction method's floor-OR cut; 0 for reservoir (h < 0
        # never holds, so the unified pick condition degrades exactly)
        if sp.method in ("hash", "hash_rand", "fraction"):
            return threshold_for_fraction(sp.fraction)
        return 0

    def hash_included(sp: SampleSpec):
        return live(sp) & (hcol(sp) < F.lit(frac_thr(sp)))

    # ---- scan 1: all per-spec stratum counts from one pass -------------
    def el_measure(i: int, sp: SampleSpec):
        # the error_limit spec's quantized measure (error_limit.stats_frags
        # mq) rides the explode entry so its moment sums fall out of the
        # SAME counts aggregate; 0 for every other method (unused)
        if not is_el[i]:
            return F.lit(0).cast("bigint")
        from ..quant import measure_scale, pow2_literal
        m = measure_scale(sp.error_limit_max_abs)
        return F.expr(f"CAST(FLOOR(({sp.error_limit_col}) * "
                      f"{pow2_literal(m)}) AS BIGINT)")

    # __in counts rows under the spec's fraction threshold for EVERY
    # method (hash: the inclusion cut itself; ranked fraction: the
    # no-rank fast path's per-stratum count; reservoir/error_limit:
    # threshold 0, always false)
    entries = [F.struct(F.lit(i).alias("__sid"), skey(sp).alias("__sk"),
                        live(sp).cast("int").alias("__live"),
                        hash_included(sp).cast("int").alias("__in"),
                        el_measure(i, sp).alias("__m"))
               for i, sp in enumerate(specs)]
    counts = (df.select(F.explode(F.array(*entries)).alias("e"))
              .select("e.*").where(F.col("__live") == 1)
              .groupBy("__sid", "__sk")
              .agg(F.count(F.lit(1)).alias("__ntot"),
                   F.sum("__in").alias("__nsmp_h"),
                   F.sum("__m").alias("__esx"),
                   F.sum(F.col("__m") * F.col("__m")).alias("__esxx")))
    if any(is_el):
        # per-stratum CLT size for the error_limit specs, derived on the
        # TINY counts relation (nreq_frag carries spec-specific z/scale/
        # pct literals, so each spec projects its own slice)
        from .error_limit import nreq_frag
        rest = counts.where(~F.col("__sid").isin(
            [i for i, e in enumerate(is_el) if e])).withColumn(
            "__nreq", F.lit(None).cast("bigint"))
        parts = [rest]
        for i, sp in enumerate(specs):
            if not is_el[i]:
                continue
            part = (counts.where(F.col("__sid") == i)
                    .withColumn("__eN", F.col("__ntot"))
                    .withColumn("__nreq", F.expr(nreq_frag(sp)))
                    .drop("__eN"))
            parts.append(part)
        counts = parts[0]
        for p in parts[1:]:
            counts = counts.unionByName(p)
    else:
        counts = counts.withColumn("__nreq", F.lit(None).cast("bigint"))

    # per-sid constant lookups (element_at is 1-based)
    def arr(vals):
        return F.array(*[F.lit(v) for v in vals])

    sid1 = F.col("__sid") + 1
    k_i = F.element_at(arr([sp.reservoir_size for sp in specs]), sid1)
    thr_i = F.element_at(arr([frac_thr(sp) for sp in specs]), sid1)
    hash_i = F.element_at(arr(is_hash), sid1)

    # ---- scan 2: candidates for every spec in one explode --------------
    cand_entries = []
    for i, sp in enumerate(specs):
        if is_hash[i]:
            e = F.when(hash_included(sp),
                       F.struct(F.lit(i).alias("__sid"),
                                skey(sp).alias("__sk"),
                                hcol(sp).alias("__h")))
        else:
            # ranked: every live row is a potential candidate; the
            # per-stratum prefilter threshold needs the broadcast counts,
            # so the cut happens right after the counts join below
            e = F.when(live(sp),
                       F.struct(F.lit(i).alias("__sid"),
                                skey(sp).alias("__sk"),
                                hcol(sp).alias("__h")))
        cand_entries.append(e)
    def explode_rows(*keep: str) -> DataFrame:
        return (df.withColumn("__e", F.explode(F.filter(
                    F.array(*cand_entries), lambda x: x.isNotNull())))
                .select(*keep, F.col("__e.__sid").alias("__sid"),
                        F.col("__e.__sk").alias("__sk"),
                        F.col("__e.__h").alias("__h")))

    rows = explode_rows(*df.columns)
    wn = rows.join(F.broadcast(counts), ["__sid", "__sk"])
    # effective per-stratum k: the spec's reservoir size, or the CLT
    # n_req for error_limit specs (a per-stratum COLUMN, not a constant)
    eff_k = F.coalesce(F.col("__nreq"), k_i.cast("bigint"))
    # _ranked_sample's cand_thr, verbatim (per-sid constants via lookup)
    cand_thr = F.when(
        F.col("__ntot") <= F.lit(_PREFILTER_MIN_STRATUM), F.lit(MODULUS)
    ).otherwise(
        F.greatest(
            thr_i.cast("bigint"),
            F.least(
                F.lit(MODULUS),
                F.ceil(F.lit(float(MODULUS * _OVERSAMPLE)) *
                       (eff_k.cast("double") + F.lit(32.0)) /
                       F.col("__ntot").cast("double")).cast("bigint"),
            ),
        )
    )
    # hash rows pass through (their cut already happened in the explode);
    # ranked rows keep the candidate cut OR their whole stratum when the
    # prefilter cannot certify k candidates (decided per-row from the
    # broadcast per-stratum candidate counts). The candidate COUNT pass
    # runs on a NARROW explode — (sid, stratum, hash) only, so its scan
    # prunes to the key/qcs columns instead of dragging every base
    # column through a second full-width explode.
    cand_counts = (explode_rows()
                   .join(F.broadcast(counts), ["__sid", "__sk"])
                   .where((~hash_i) & (F.col("__h") < cand_thr))
                   .groupBy("__sid", "__sk")
                   .agg(F.count(F.lit(1)).alias("__cn")))
    # the pool (≈ union of the specs' samples + top-up candidates, i.e.
    # fraction-sized) is consumed by BOTH sides of the no-rank split
    # below — persist it so the base scan + explode lineage executes
    # once for them, not once per side
    pool = (wn.join(F.broadcast(cand_counts), ["__sid", "__sk"], "left")
            .where(hash_i
                   | ((F.coalesce(F.col("__cn"), F.lit(0)) >= eff_k)
                      & (F.col("__h") < cand_thr))
                   | (F.coalesce(F.col("__cn"), F.lit(0)) < eff_k))
            .persist())
    # fraction no-rank fast path (same set-equality proof as
    # _ranked_sample): a ranked-fraction stratum whose under-threshold
    # count already reaches the floor picks exactly {h < thr} with
    # nsmp = that count — no ranking, no count window. Only floor
    # top-up strata and reservoir / error_limit specs enter the window,
    # so at scale its input is candidate-sized, not fraction-sized.
    no_rank = ((~hash_i) & (thr_i.cast("bigint") > F.lit(0))
               & (F.col("__nsmp_h") >= eff_k))
    heavy = (pool.where(no_rank & (F.col("__h") < thr_i.cast("bigint")))
             .withColumn("__nsmp", F.col("__nsmp_h")))
    # one window ranks every remaining ranked pool; hash rows skip ranking
    order = [F.col("__h").asc()] + [F.col(c).asc() for c in df.columns]
    w = Window.partitionBy("__sid", "__sk").orderBy(*order)
    ranked = pool.where(~no_rank).withColumn(
        "__rn", F.when(hash_i, F.lit(0)).otherwise(F.row_number().over(w)))
    picked = ranked.where(hash_i | (F.col("__rn") <= eff_k)
                          | (F.col("__h") < thr_i.cast("bigint")))
    nsmp = F.when(hash_i, F.col("__nsmp_h")).otherwise(
        F.count(F.lit(1)).over(Window.partitionBy("__sid", "__sk")))
    out = (picked.withColumn("__nsmp", nsmp).drop("__rn")
           .unionByName(heavy)
           .where(F.col("__nsmp") > 0)
           .select(*df.columns,
                   F.col("__nsmp").cast("bigint").alias(STRATA_SAMPLED_COL),
                   F.col("__ntot").cast("bigint").alias(STRATA_TOTAL_COL),
                   (F.col("__ntot").cast("double")
                    / F.col("__nsmp").cast("double")).alias(WEIGHT_COL),
                   F.element_at(F.array(*[F.lit(n) for n in names]),
                                F.col("__sid") + 1).alias("__sample")))
    out.write.mode("overwrite").partitionBy("__sample").parquet(path)
    pool.unpersist()
    subdirs = {}
    cols = {c.lower() for c in df.columns}
    bounds = {c: v for c, v in (col_bounds or {}).items() if c in cols}
    empty_schema = out.drop("__sample").schema
    for n, sp in named_specs:
        sub = os.path.join(path, f"__sample={n}")
        if not os.path.isdir(sub):
            # a spec that picked zero rows (tiny fraction / restrictive
            # base_filter) produces no partition directory — write a real
            # empty parquet with the sample schema so the sidecar lands
            # and readers / discover_samples see a valid empty sample,
            # matching the per-spec build path
            spark.createDataFrame([], empty_schema).write.parquet(sub)
        write_sample_sidecar(sub, sp, name=n, col_bounds=bounds)
        subdirs[n] = sub
    return subdirs


def multi_hash_sample_build(spark, df: DataFrame,
                            named_specs: list[tuple[str, SampleSpec]],
                            path: str,
                            col_bounds: dict[str, float] | None = None
                            ) -> dict[str, str]:
    """Hash-only validating wrapper over ``multi_sample_build`` (the
    original two-scan entry point; kept for callers that want the
    stricter method contract)."""
    for n, sp in named_specs:
        if sp.method not in ("hash", "hash_rand"):
            raise ValueError(f"{n}: multi-build supports hash methods only,"
                             f" got {sp.method!r}")
    return multi_sample_build(spark, df, named_specs, path,
                              col_bounds=col_bounds)


# self-describing sample persistence: the spec (and any column bounds the
# estimators derived at creation time) ride next to the parquet as an
# underscore-prefixed file parquet readers ignore — a FRESH session can
# re-register the sample without replaying its DDL (reference: sample
# registrations persist in the session catalog,
# hive/SnappyAQPSessionCatalog.scala:39,54 addSampleDataFrame). At cluster
# scale the same bytes go through the Hadoop FS API; locally plain files.
SIDECAR_NAME = "_aqp_sample_spec.json"


def write_sample_sidecar(path: str, spec: SampleSpec,
                         name: str | None = None,
                         col_bounds: dict[str, float] | None = None) -> None:
    import dataclasses
    import json
    import os
    meta = {"format": "snappy-aqp-sample/1", "name": name,
            "spec": dataclasses.asdict(spec),
            "col_bounds": col_bounds or {}}
    with open(os.path.join(path, SIDECAR_NAME), "w") as f:
        json.dump(meta, f, indent=1)


def read_sample_sidecar(path: str) -> tuple[str | None, SampleSpec,
                                            dict[str, float]]:
    import json
    import os
    with open(os.path.join(path, SIDECAR_NAME)) as f:
        meta = json.load(f)
    if meta.get("format") != "snappy-aqp-sample/1":
        raise ValueError(f"unrecognized sample sidecar at {path}: "
                         f"format={meta.get('format')!r}")
    sd = dict(meta["spec"])
    sd["key_cols"] = tuple(sd["key_cols"])
    sd["qcs"] = tuple(sd["qcs"])
    return meta.get("name"), SampleSpec(**sd), dict(meta.get("col_bounds", {}))
