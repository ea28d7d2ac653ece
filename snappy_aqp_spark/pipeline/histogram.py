"""Corpus-statistics helpers: fixed-width histograms and per-source quota
capping — the two "shape the distribution" primitives every dataset report
and curation pass uses.

Both are single-purpose, all-integer, one-to-two-shuffle plans:

* **histogram**: integer binning ``floor(val/width)`` + one count
  aggregate. The bin list is dense (empty bins emitted as zero) so the
  result is a plottable vector, not a sparse map — the dense spine comes
  from a ``sequence`` over the observed min/max bins, which is tiny.
* **quota cap**: at most N rows per group, picked deterministically by key
  hash (so the survivors are a uniform subsample of each group, not
  whatever order the scan produced). One window shuffle on the group key;
  the "which rows" decision is reproducible on any engine/partitioning.
"""

from __future__ import annotations

from ..detrng import hash_sql
from .dual import explode, fdiv, sequence


def histogram_stages(dialect: str, col: str = "n_chars",
                     width: int = 200, table: str = "documents"
                     ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per bin between the observed min and
    max (dense): (bin, lo, hi, n). FLOOR binning, so negative values land
    in the bin whose [lo, hi) range actually contains them."""
    spine = (f"SELECT {explode(dialect, sequence(dialect, 'b0', 'b1'), 'bin')} "
             f"FROM __hbr")
    stages = [
        ("__hbv",
         f"SELECT {fdiv(dialect, f'CAST({col} AS BIGINT)', str(width))} "
         f"AS bin FROM {table}"),
        ("__hbc",
         "SELECT bin, CAST(COUNT(*) AS BIGINT) AS n FROM __hbv GROUP BY bin"),
        ("__hbr",
         "SELECT MIN(bin) AS b0, MAX(bin) AS b1 FROM __hbv"),
        ("__hbs", spine),
    ]
    final = (f"SELECT s.bin, s.bin * {width} AS lo, "
             f"(s.bin + 1) * {width} AS hi, "
             f"CAST(COALESCE(c.n, 0) AS BIGINT) AS n "
             f"FROM __hbs s LEFT JOIN __hbc c ON s.bin = c.bin "
             f"ORDER BY s.bin")
    return stages, final


def quota_cap_stages(dialect: str, group: str = "source", cap: int = 60,
                     key_cols: tuple[str, ...] = ("doc_id",),
                     table: str = "documents", seed: int = 42
                     ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> surviving rows (key cols..., grp) — at most
    ``cap`` per group, a deterministic uniform pick within each group."""
    h = hash_sql(list(key_cols), seed)
    keys = ", ".join(key_cols)
    stages = [
        ("__qcr",
         f"SELECT {keys}, {group} AS grp, "
         f"ROW_NUMBER() OVER (PARTITION BY {group} "
         f"ORDER BY {h}, {keys}) AS rn FROM {table}"),
    ]
    final = (f"SELECT {keys}, grp FROM __qcr WHERE rn <= {cap} "
             f"ORDER BY {keys}")
    return stages, final
