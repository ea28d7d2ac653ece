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

Scale: ONE shuffle (the window prefix-sum over the hash order — at 100 TB
you'd range-partition by the same hash and prefix-sum per partition +
partition offsets; the semantics here are partitioning-independent either
way because the hash order is a total order on rows, not on partitions).
The estimator contract matches the engine's sample tables: each kept row
carries ``weight = min(stride/w, 1)^-1``-free HT ratio ``stride/w`` capped
at 1, as integer-exact rationals (numerator/denominator columns) plus the
double ratio for convenience.
"""

from __future__ import annotations

from ..detrng import hash_sql


def pps_sample_stages(dialect: str, weight_col: str = "n_chars",
                      stride: int = 2500,
                      key_cols: tuple[str, ...] = ("doc_id",),
                      table: str = "documents", seed: int = 42
                      ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> kept rows: (key cols..., w, ht_num, ht_den,
    ht_weight) where ht_num/ht_den = stride/w (capped at 1 below) is the
    exact inverse inclusion probability as a rational; ht_weight is its
    double value. ``stride`` sets the expected sample mass: E[kept] ~
    total_weight / stride."""
    h = hash_sql(list(key_cols), seed)
    keys = ", ".join(key_cols)
    stages = [
        ("__ppw",
         f"SELECT {keys}, CAST(GREATEST({weight_col}, 1) AS BIGINT) AS w, "
         f"{h} AS hh FROM {table}"),
        ("__ppc",
         f"SELECT {keys}, w, "
         f"SUM(w) OVER (ORDER BY hh, {keys} "
         f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum "
         f"FROM __ppw"),
    ]
    keep = (f"(cum DIV {stride}) > ((cum - w) DIV {stride})"
            if dialect == "spark"
            else f"(cum // {stride}) > ((cum - w) // {stride})")
    # inclusion prob p = min(w, stride)/stride  ->  HT weight 1/p =
    # stride / min(w, stride), emitted as an exact rational + its double
    final = (f"SELECT {keys}, w, "
             f"CAST({stride} AS BIGINT) AS ht_num, "
             f"CAST(LEAST(CAST({stride} AS BIGINT), w) AS BIGINT) AS ht_den, "
             f"CAST({stride} AS DOUBLE) / "
             f"CAST(LEAST(CAST({stride} AS BIGINT), w) AS DOUBLE) AS ht_weight "
             f"FROM __ppc WHERE {keep} ORDER BY {keys}")
    return stages, final
