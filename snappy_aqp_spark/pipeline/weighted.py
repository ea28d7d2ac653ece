"""Weighted (probability-proportional-to-size) corpus sampling via
deterministic systematic sampling.

Training-data curation constantly downsamples a corpus with per-document
importance weights (quality score, dedup-cluster size, domain caps).
Classic weighted reservoirs (A-ES) rank by ``u^(1/w)`` — transcendental
math this engine deliberately avoids in compared outputs (libm drift; see
pipeline/distinct.py). Systematic PPS sampling needs only integer
arithmetic: lay every row's integer weight end-to-end on a line in a
deterministic hash-shuffled order, then take one row per length-``stride``
window — row i is kept iff a stride boundary falls inside its segment
(``floor(cum/stride) > floor((cum - w)/stride)``). Every row with
w >= stride is always kept (the heavy-item guarantee); others are kept
with probability w/stride.

Scale design — the prefix sum is BUCKETED, not global: a naive
``SUM() OVER (ORDER BY ...)`` collapses the table into one partition (a
100 TB sort on a single task). Instead the hash order is split into
``n_buckets`` contiguous ranges (the bucket is the hash's top bits, so
(bucket, hash, key) is the same total order as (hash, key)):

  1. per-bucket prefix sums — window PARTITIONED by bucket, fully parallel;
  2. an ``n_buckets``-row bucket-total relation, running-summed into
     offsets (the only single-partition step, over hundreds of rows);
  3. global cum = bucket offset + in-bucket cum, broadcast-joined back.

Identical output to the single-sort formulation, with the big table never
leaving hash-partitioned parallelism. The estimator contract matches the
engine's sample tables: each kept row carries the exact inverse inclusion
probability ``stride / min(w, stride)`` as a rational (ht_num/ht_den)
plus its double value.
"""

from __future__ import annotations

from ..detrng import MODULUS, hash_sql
from .dual import idiv


def pps_sample_stages(dialect: str, weight_col: str = "n_chars",
                      stride: int = 2500,
                      key_cols: tuple[str, ...] = ("doc_id",),
                      table: str = "documents", seed: int = 42,
                      n_buckets: int = 256
                      ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> kept rows: (key cols..., w, ht_num, ht_den,
    ht_weight). ``stride`` sets the expected sample mass: E[kept] ~
    total_weight / stride."""
    h = hash_sql(list(key_cols), seed)
    keys = ", ".join(key_cols)
    span = MODULUS // n_buckets + 1          # bucket = hash's leading range
    stages = [
        ("__ppw",
         f"SELECT {keys}, CAST(GREATEST({weight_col}, 1) AS BIGINT) AS w, "
         f"{h} AS hh, {idiv(dialect, h, str(span))} AS b FROM {table}"),
        # parallel per-bucket prefix sums
        ("__ppc",
         f"SELECT {keys}, w, b, "
         f"SUM(w) OVER (PARTITION BY b ORDER BY hh, {keys} "
         f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bcum "
         f"FROM __ppw"),
        # tiny bucket-offset relation (n_buckets rows)
        ("__ppo",
         f"SELECT b, "
         f"SUM(t) OVER (ORDER BY b "
         f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t AS off "
         f"FROM (SELECT b, SUM(w) AS t FROM __ppw GROUP BY b) __bt"),
    ]
    keep = (f"{idiv(dialect, 'cum', str(stride))} > "
            f"{idiv(dialect, 'cum - w', str(stride))}")
    # inclusion prob p = min(w, stride)/stride  ->  HT weight 1/p =
    # stride / min(w, stride), emitted as an exact rational + its double
    final = (f"SELECT {keys}, w, "
             f"CAST({stride} AS BIGINT) AS ht_num, "
             f"CAST(LEAST(CAST({stride} AS BIGINT), w) AS BIGINT) AS ht_den, "
             f"CAST({stride} AS DOUBLE) / "
             f"CAST(LEAST(CAST({stride} AS BIGINT), w) AS DOUBLE) AS ht_weight "
             f"FROM (SELECT c.*, c.bcum + o.off AS cum "
             f"      FROM __ppc c JOIN __ppo o ON c.b = o.b) __g "
             f"WHERE {keep} ORDER BY {keys}")
    return stages, final
