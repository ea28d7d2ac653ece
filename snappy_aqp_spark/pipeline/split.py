"""Deterministic train/validation/test splits for corpus tables.

A training-data pipeline's last step is a reproducible split. Two designs,
both driven by ``detrng.hash_sql`` (engine-portable integer hash — the
same assignment on any engine, any partitioning, any run):

* **hash-threshold** (``exact_quotas=False``): split = pure function of
  the key hash. ZERO shuffles — the assignment is a projection inside the
  scan, which is the only design that works when the table is 100 TB and
  the split must be recomputed identically by every downstream job.
  Proportions hold in expectation (±binomial noise per stratum).
* **exact-quota** (``exact_quotas=True``): rank rows by hash *within each
  stratum* and cut at floor(n*p) boundaries — exact per-stratum
  proportions, at the cost of one shuffle on the stratum key. Use for
  small/medium curated sets; beware stratum skew at scale (a single
  giant stratum serializes into one partition's sort — exactly the skew
  the hash-threshold variant avoids).

Group-leakage safety: pass the *cluster* key (e.g. the near-dup
``cluster_id`` from pipeline.clusters) as ``key_cols`` and every member of
a duplicate cluster lands in the same split — the standard guard against
train/test contamination through near-duplicates.
"""

from __future__ import annotations

from ..detrng import MODULUS, hash_sql


def hash_split_case(key_cols: tuple[str, ...],
                    fractions: tuple[float, ...],
                    names: tuple[str, ...], seed: int) -> str:
    """the zero-shuffle split assignment as one CASE expression (portable
    SQL): integer cut points on the key-hash range."""
    if len(fractions) != len(names):
        raise ValueError("fractions and names must align")
    if abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {sum(fractions)}")
    h = hash_sql(list(key_cols), seed)
    cuts, acc = [], 0.0
    for f in fractions[:-1]:
        acc += f
        cuts.append(int(acc * MODULUS))
    branches = "".join(f"WHEN {h} < {c} THEN '{n}' "
                       for c, n in zip(cuts, names[:-1]))
    return f"CASE {branches}ELSE '{names[-1]}' END"


def split_assign_stages(dialect: str,
                        key_cols: tuple[str, ...] = ("doc_id",),
                        strata: str = "lang", table: str = "documents",
                        fractions: tuple[float, ...] = (0.8, 0.1, 0.1),
                        names: tuple[str, ...] = ("train", "val", "test"),
                        seed: int = 42, exact_quotas: bool = True
                        ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per input row:
    (key cols..., stratum, split) ordered by the key."""
    if len(fractions) != len(names):
        raise ValueError("fractions and names must align")
    if abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {sum(fractions)}")
    h = hash_sql(list(key_cols), seed)
    keys = ", ".join(key_cols)

    if not exact_quotas:
        # hash-threshold: integer cut points on the hash range, no shuffle
        case = hash_split_case(key_cols, fractions, names, seed)
        stages = [("__spl",
                   f"SELECT {keys}, {strata} AS stratum, {case} AS split "
                   f"FROM {table}")]
        return stages, (f"SELECT {keys}, stratum, split FROM __spl "
                        f"ORDER BY {keys}")

    # exact quotas: rank by (hash, key) inside each stratum, cut at
    # cumulative floor boundaries (integer arithmetic only)
    cum, acc = [], 0.0
    for f in fractions[:-1]:
        acc += f
        cum.append(acc)
    branches = "".join(
        f"WHEN rn <= CAST(FLOOR(CAST(n AS DOUBLE) * {c!r}) AS BIGINT) "
        f"THEN '{nm}' "
        for c, nm in zip(cum, names[:-1]))
    case = f"CASE {branches}ELSE '{names[-1]}' END"
    stages = [
        ("__spr",
         f"SELECT {keys}, {strata} AS stratum, "
         f"ROW_NUMBER() OVER (PARTITION BY {strata} "
         f"ORDER BY {h}, {keys}) AS rn, "
         f"COUNT(*) OVER (PARTITION BY {strata}) AS n "
         f"FROM {table}"),
    ]
    return stages, (f"SELECT {keys}, stratum, {case} AS split FROM __spr "
                    f"ORDER BY {keys}")
