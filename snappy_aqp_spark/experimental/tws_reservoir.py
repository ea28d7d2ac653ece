"""Streaming stratified reservoir maintenance on ``transformWithState``.

The reference maintains one bounded reservoir per stratum inside its
sampler as the stream flows through (StratifiedSamplerReservoir.scala:33-77
keeps a fixed-k buffer per stratum and updates it row by row;
StratifiedSamplerCached tracks per-stratum seen counts for the weight
column, stratifiedSampling.scala:749-760). This module is the same
operator on Spark 4's arbitrary-stateful API: the stream is grouped by the
stratum key and a ``StatefulProcessor`` keeps

- ``reservoir``  — ListState of the k sample rows (id + priority),
- ``counts``     — ValueState (batch ordinal, rows seen),

per stratum, in the checkpointed state store (fault-tolerant, rescalable —
state moves with the key, unlike the reference's node-pinned region maps).

Determinism contract: the maintained reservoir is the k SMALLEST values of
the detrng priority hash (ties broken by the unique id). k-min-hash is an
order-independent fold, so after any number of micro-batches the state
equals the batch sampler's pick over everything ingested — giving this
streaming-stateful operator a full value-hash DuckDB oracle (the same
window-rank replay the batch `reservoir` method uses).

Each batch emits the stratum's CURRENT reservoir tagged with the batch
ordinal; the last ordinal per stratum is the final state (the fixture
post-filters on it — append sinks cannot retract earlier snapshots).

QUARANTINED (snappy_aqp_spark.experimental): Spark's transformWithState
Python worker speaks a protobuf protocol
(pyspark/sql/streaming/proto/StateMessage_pb2.py imports google.protobuf),
and this container ships no protobuf and permits no installs — so this
code path has NEVER executed here and is NOT counted in coverage claims.
``tws_available()`` feature-detects; the pytest is marker-skipped; the
production-equivalent semantics (bounded per-key streaming state) are
covered by the applyInPandasWithState Space-Saving operator in
streaming/stateful.py, whose path DOES run. On a stock PySpark 4 cluster
(protobuf ships with the distribution's Python env) this module should
run as-is — promote it back to streaming/ once executed against its
oracle in such an environment.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

from ..detrng import hash_sql


def tws_available() -> bool:
    """transformWithState needs protobuf in the Python worker env."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


_STATE_SCHEMA = StructType([
    StructField("id", LongType()),
    StructField("h", LongType()),
])
_COUNT_SCHEMA = StructType([
    StructField("batch_no", LongType()),
    StructField("n_seen", LongType()),
])
OUTPUT_SCHEMA = StructType([
    StructField("stratum", StringType()),
    StructField("batch_no", LongType()),
    StructField("id", LongType()),
    StructField("h", LongType()),
    StructField("n_total", LongType()),
])


class ReservoirProcessor(StatefulProcessor):
    """k-min-hash reservoir per stratum (grouping key)."""

    def __init__(self, k: int):
        self._k = k

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._reservoir = handle.getListState("reservoir", _STATE_SCHEMA)
        self._counts = handle.getValueState("counts", _COUNT_SCHEMA)

    def handleInputRows(self, key: Any, rows: Iterator, timerValues) -> Iterator:
        import pandas as pd
        cur = [(r[0], r[1]) for r in self._reservoir.get()] \
            if self._reservoir.exists() else []
        if self._counts.exists():
            c = self._counts.get()
            batch_no, n_seen = int(c[0]), int(c[1])
        else:
            batch_no, n_seen = 0, 0
        for pdf in rows:
            n_seen += len(pdf)
            cur.extend(zip(pdf["id"].astype("int64"),
                           pdf["h"].astype("int64")))
            # fold eagerly: state stays O(k) even for huge batches
            cur = sorted(cur, key=lambda t: (t[1], t[0]))[:self._k]
        self._reservoir.clear()
        self._reservoir.appendList([(int(i), int(h)) for i, h in cur])
        self._counts.update((batch_no + 1, n_seen))
        yield pd.DataFrame({
            "stratum": [key[0]] * len(cur),
            "batch_no": [batch_no + 1] * len(cur),
            "id": [i for i, _ in cur],
            "h": [h for _, h in cur],
            "n_total": [n_seen] * len(cur),
        })

    def close(self) -> None:
        pass


def streaming_reservoir(stream_df: DataFrame, stratum_col: str,
                        id_col: str, k: int, seed: int) -> DataFrame:
    """Maintain a per-stratum k-min-hash reservoir over a stream.

    The priority hash is computed JVM-side (one codegen projection) before
    grouping; only the O(k) fold runs in Python, batched via Arrow.
    """
    tagged = stream_df.select(
        F.expr(stratum_col).alias("stratum"),
        F.col(id_col).cast("bigint").alias("id"),
        F.expr(hash_sql([id_col], seed)).alias("h"))
    return (tagged.groupBy("stratum")
            .transformWithStateInPandas(ReservoirProcessor(k),
                                        OUTPUT_SCHEMA, "append",
                                        "processingTime"))


def final_reservoir(snapshots: DataFrame) -> DataFrame:
    """Reduce the append-sink snapshots to each stratum's LAST emission."""
    last = snapshots.groupBy("stratum").agg(F.max("batch_no").alias("batch_no"))
    return (snapshots.join(last, ["stratum", "batch_no"])
            .select("stratum", "id", "n_total"))


def reservoir_oracle_sql(table: str, stratum_sql: str, id_col: str,
                         k: int, seed: int) -> str:
    """DuckDB replay: per-stratum k smallest priority hashes with the
    stratum's total row count — exactly the converged streaming state."""
    h = hash_sql([id_col], seed)
    return (
        "SELECT stratum, id, n_total FROM ("
        f"SELECT {stratum_sql} AS stratum, CAST({id_col} AS BIGINT) AS id, "
        f"ROW_NUMBER() OVER (PARTITION BY {stratum_sql} "
        f"ORDER BY {h}, {id_col}) AS rn, "
        f"CAST(COUNT(*) OVER (PARTITION BY {stratum_sql}) AS BIGINT) "
        f"AS n_total FROM {table}) __r "
        f"WHERE rn <= {k} ORDER BY stratum, id")
