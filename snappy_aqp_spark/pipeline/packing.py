"""Sequence packing and mixture resampling — the last-mile operators that
turn a cleaned corpus into training batches.

``sequence_pack_stages``: concat-and-chunk packing. Training runs want
fixed-length token sequences; the standard recipe concatenates every
document (in a deterministic shuffled order) into one long token stream
and slices it into ``seq_len``-token sequences, letting documents span
sequence boundaries. The operator emits the (sequence, document) segment
map: which token span of which document lands where — exactly the index a
data loader needs to assemble batches without materializing the stream.

Scale design: the document order is a deterministic hash shuffle and the
global token offset is a BUCKETED prefix sum (same two-level pattern as
``weighted.pps_sample_stages`` — per-bucket windows in parallel, one tiny
bucket-offset relation, broadcast joined back), so the corpus never
collapses into a single sort partition. Each document then explodes into
the O(ntok/seq_len) sequences it overlaps — no further shuffle.

Token counts default to a whitespace-word proxy (single O(len) pass, no
arrays); pass ``ntok_sql`` to use a real tokenizer's precomputed count
column. All outputs are integers — bit-exact across engines.

``mixture_resample_stages``: domain-mixture reweighting. Given target
proportions per source (basis points), compute the LARGEST total sample
that achieves the target mixture without upsampling any source
(T = min_s floor(n_s * 10000 / bp_s)), derive exact per-source quotas
k_s = floor(bp_s * T / 10000), and keep a deterministic uniform pick of
k_s rows per source (rank by row hash). Kept rows carry the exact
upweight rational (n_s / k_s) so downstream estimators can undo the
resampling. Source counts are a tiny aggregate; the pick is one window
partitioned by source.
"""

from __future__ import annotations

from ..detrng import MODULUS, hash_sql
from .dual import idiv, sequence, explode


def default_ntok_sql(col: str) -> str:
    """whitespace-word token proxy: spaces + 1, one O(len) pass."""
    return (f"CAST(length({col}) - length(replace({col}, ' ', '')) + 1 "
            f"AS BIGINT)")


def sequence_pack_stages(dialect: str, seq_len: int = 512,
                         key_cols: tuple[str, ...] = ("doc_id",),
                         table: str = "documents", col: str = "text",
                         ntok_sql: str | None = None, seed: int = 97,
                         n_buckets: int = 256
                         ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per (sequence, document) segment:
    (seq_id, key cols..., doc_ntok, doc_tok_start, seq_tok_start, n_tok).

    Invariants: per document the segments partition [0, doc_ntok);
    per sequence the segments sum to ``seq_len`` tokens (except the final
    sequence of the stream); segment order inside a sequence is the
    global document order."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    ntok = ntok_sql or default_ntok_sql(col)
    h = hash_sql(list(key_cols), seed)
    keys = ", ".join(key_cols)
    span = MODULUS // n_buckets + 1      # bucket = hash's leading range
    stages = [
        ("__sq0",
         f"SELECT {keys}, CAST(GREATEST({ntok}, 1) AS BIGINT) AS w, "
         f"{h} AS hh, {idiv(dialect, h, str(span))} AS b FROM {table}"),
        # parallel per-bucket prefix sums over the (hash, keys) order
        ("__sqc",
         f"SELECT {keys}, w, b, "
         f"SUM(w) OVER (PARTITION BY b ORDER BY hh, {keys} "
         f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bcum "
         f"FROM __sq0"),
        # tiny bucket-offset relation (n_buckets rows)
        ("__sqo",
         f"SELECT b, "
         f"SUM(t) OVER (ORDER BY b "
         f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t AS off "
         f"FROM (SELECT b, SUM(w) AS t FROM __sq0 GROUP BY b) __bt"),
        # 0-based token span [st, en) of each document in the stream
        # (BIGINT casts: DuckDB window SUMs widen to HUGEINT)
        ("__sqs",
         f"SELECT {keys}, w, CAST(c.bcum + o.off - w AS BIGINT) AS st, "
         f"CAST(c.bcum + o.off AS BIGINT) AS en "
         f"FROM __sqc c JOIN __sqo o ON c.b = o.b"),
        # explode into the sequences the span overlaps
        ("__sqe",
         f"SELECT {keys}, w, st, en, "
         + explode(dialect,
                   sequence(dialect, idiv(dialect, "st", str(seq_len)),
                            idiv(dialect, "en - 1", str(seq_len))),
                   "seq_id")
         + " FROM __sqs"),
    ]
    final = (f"SELECT CAST(seq_id AS BIGINT) AS seq_id, {keys}, "
             f"w AS doc_ntok, "
             f"GREATEST(seq_id * {seq_len} - st, CAST(0 AS BIGINT)) "
             f"AS doc_tok_start, "
             f"GREATEST(st - seq_id * {seq_len}, CAST(0 AS BIGINT)) "
             f"AS seq_tok_start, "
             f"LEAST((seq_id + 1) * {seq_len}, en) "
             f"- GREATEST(seq_id * {seq_len}, st) AS n_tok "
             f"FROM __sqe ORDER BY seq_id, {keys}")
    return stages, final


def mixture_resample_stages(dialect: str,
                            targets: dict[str, int] | None = None,
                            source_col: str = "source",
                            key_cols: tuple[str, ...] = ("doc_id",),
                            table: str = "documents", seed: int = 53
                            ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> kept rows: (key cols..., source, n_source,
    quota, up_num, up_den). ``targets`` maps source value -> target share
    in basis points (need not sum to 10000 — shares are relative).
    Sources absent from ``targets`` are dropped; no source is upsampled
    (the mixture is achieved by downsampling the over-represented ones)."""
    targets = targets if targets is not None else {}
    if not targets:
        raise ValueError("targets must name at least one source")
    for s, bp in targets.items():
        if bp <= 0:
            raise ValueError(f"target share must be positive: {s} -> {bp}")
    vals = ", ".join(f"('{s}', {int(bp)})" for s, bp in sorted(targets.items()))
    h = hash_sql(list(key_cols), seed)
    keys = ", ".join(key_cols)
    stages = [
        ("__mxs", f"SELECT * FROM (VALUES {vals}) AS __tv(src, bp)"),
        # per-source population counts (tiny: one row per target source)
        ("__mxc",
         f"SELECT s.src, s.bp, CAST(COUNT(*) AS BIGINT) AS n "
         f"FROM {table} d JOIN __mxs s ON d.{source_col} = s.src "
         f"GROUP BY s.src, s.bp"),
        # largest total respecting the mixture without upsampling
        ("__mxt",
         f"SELECT MIN({idiv(dialect, 'n * 10000', 'bp')}) AS t FROM __mxc"),
        ("__mxq",
         f"SELECT src, n, {idiv(dialect, 'bp * t', '10000')} AS quota "
         f"FROM __mxc, __mxt"),
        # deterministic uniform pick of exactly quota rows per source
        ("__mxr",
         f"SELECT {keys}, {source_col}, "
         f"ROW_NUMBER() OVER (PARTITION BY {source_col} "
         f"ORDER BY {h}, {keys}) AS rk "
         f"FROM {table} d JOIN __mxs s ON d.{source_col} = s.src"),
    ]
    final = (f"SELECT {keys}, {source_col}, q.n AS n_source, q.quota, "
             f"q.n AS up_num, q.quota AS up_den "
             f"FROM __mxr r JOIN __mxq q ON r.{source_col} = q.src "
             f"WHERE r.rk <= q.quota ORDER BY {source_col}, {keys}")
    return stages, final
