"""Z-order (Morton-curve) clustering for multi-column data skipping.

A file layout sorted on ONE column skips scans filtered on that column
only; interleaving the bits of several columns (the Morton / Z-value)
gives a single sort key whose contiguous ranges are small hyper-rectangles
in ALL interleaved dimensions — so per-file min/max statistics prune scans
filtered on ANY of them (the standard lakehouse OPTIMIZE ... ZORDER BY).
No reference analog (the reference's store hash-buckets rows —
gemfire buckets); this is the Spark-native layout operator a 100 TB
corpus needs for multi-predicate scan pruning.

Two pieces:

- ``zorder_chunk_stats_stages``: the DUAL-EMITTED analysis — z-value per
  row (pure integer bit math, identical SQL text on Spark and DuckDB),
  chunks = fixed z-PREFIX buckets (``z >> shift``: equal z-range spans,
  exactly how z-ordered files cover the key space — one GROUP BY, no
  global sort, no window), per-chunk min/max of every interleaved
  dimension. The driver value-checks the whole analysis.

- ``write_zordered`` / ``zorder_file_stats``: the PRODUCTION write path —
  ``repartitionByRange(z)`` (Spark's sampled range exchange, the same
  mechanism a petabyte global sort uses) + ``sortWithinPartitions`` +
  parquet; per-file min/max via ``input_file_name()`` proves the skip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import dual


def zvalue_sql(dialect: str, cols: list[str], bits: int = 8) -> str:
    """Bit-interleave ``len(cols)`` non-negative BIGINT exprs (each using
    the low ``bits`` bits) into one Morton value < 2^(bits*len(cols)).
    Plain +/&/shift integer arithmetic — dual-emitted verbatim."""
    d = len(cols)
    terms = []
    for i in range(bits):
        for j, x in enumerate(cols):
            bit = dual.band(dialect,
                            dual.shiftright(dialect, f"({x})", str(i)), "1")
            terms.append(dual.shiftleft(dialect, bit, str(i * d + j)))
    return "(" + " + ".join(terms) + ")"


def _dims_events(dialect: str, bits: int) -> list[tuple[str, str]]:
    """(name, quantized-expr) dims for the events fixture: user and a
    value band, both folded into [0, 2^bits) with non-negative modulo."""
    m = str(1 << bits)
    uid = f"(((CAST(user_id AS BIGINT) % {m}) + {m}) % {m})"
    vq = (f"(((CAST(FLOOR(CAST(value AS DOUBLE)) AS BIGINT) % {m}) + {m}) "
          f"% {m})")
    return [("xdim", uid), ("ydim", vq)]


def zorder_chunk_stats_stages(dialect: str, bits: int = 8,
                              chunk_shift: int = 10,
                              table: str = "events"
                              ) -> tuple[list[tuple[str, str]], str]:
    """``(stages, final)`` -> one row per occupied z-prefix chunk:
    (chunk, n, min/max of each dim). Narrow per-chunk spans on EVERY dim
    are the data-skipping property itself: a filter on any dim prunes all
    chunks whose [min,max] misses it. chunk = z >> chunk_shift, so with
    bits=8 (z < 2^16) and chunk_shift=10 there are at most 64 chunks."""
    dims = _dims_events(dialect, bits)
    z = zvalue_sql(dialect, [e for _, e in dims], bits)
    proj = ", ".join(f"{e} AS {n}" for n, e in dims)
    stages = [
        ("__zq", f"SELECT {proj}, {z} AS z FROM {table}"),
        ("__zc", f"SELECT {dual.shiftright(dialect, 'z', str(chunk_shift))} "
                 f"AS chunk, xdim, ydim FROM __zq"),
    ]
    final = ("SELECT chunk, CAST(COUNT(*) AS BIGINT) AS n, "
             "MIN(xdim) AS min_x, MAX(xdim) AS max_x, "
             "MIN(ydim) AS min_y, MAX(ydim) AS max_y "
             "FROM __zc GROUP BY chunk ORDER BY chunk")
    return stages, final


def write_zordered(spark: SparkSession, df: DataFrame, cols: list[str],
                   path: str, bits: int = 8, n_files: int = 8) -> None:
    """Production layout write: observe each column's [min,max] (one
    cheap aggregate — real OPTIMIZE ZORDER does the same range pass),
    linearly scale to [0, 2^bits) so z-RANGES map to RAW-value ranges
    (modulo folding would scramble raw footers), then z-value -> sampled
    range exchange -> in-partition sort -> parquet. At 100 TB this is one
    global range-partitioned shuffle (what any global sort costs) and
    yields files whose parquet footers prune on every interleaved
    column."""
    from ..dialect import SPARK
    row = df.agg(*[f for c in cols for f in
                   (F.min(c).alias(f"__lo_{c}"),
                    F.max(c).alias(f"__hi_{c}"))]).collect()[0]
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = float(row[f"__lo_{c}"]), float(row[f"__hi_{c}"])
        span = (hi - lo) or 1.0
        scaled.append(
            f"CAST(FLOOR((CAST({c} AS DOUBLE) - {lo!r}) * {top / span!r}) "
            f"AS BIGINT)")
    z = zvalue_sql(SPARK, scaled, bits)
    (df.withColumn("__z", F.expr(z))
       .repartitionByRange(n_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))


def zorder_file_stats(spark: SparkSession, path: str,
                      cols: list[str]) -> DataFrame:
    """per-file min/max of ``cols`` — the statistics a reader's
    footer-based pruning sees."""
    df = spark.read.parquet(path).withColumn(
        "__file", F.input_file_name())
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df.groupBy("__file").agg(*aggs)
