"""Stream-table DDL + the STREAMING INIT/START/STOP session commands.

Rebuilds the reference's streaming SQL surface (SnappyStreamingContext
commands driven through ``snsc.sql`` — AQPStreamingSuite.scala:63-130:
``STREAMING INIT 2secs`` / ``CREATE STREAM TABLE t (..) USING <provider>
OPTIONS (..)`` / ``CREATE TOPK TABLE .. ON t`` / ``STREAMING START`` /
query stream + TopK tables / ``STREAMING STOP``) on Structured Streaming:

* ``CREATE STREAM TABLE`` registers a ``readStream`` source. Providers:
  - ``file_stream``: Spark's file source (``format`` option: parquet /
    json / csv; ``path`` required) — the container-replicable analog of
    the reference's twitter_stream / kafka_stream connectors (connector
    auth options like ``rowConverter`` are provider-specific there and
    ignored here);
  - ``rate_stream``: Spark's built-in rate source (smoke/load testing).
* ``STREAMING START`` starts one ``foreachBatch`` query per stream table.
  Each micro-batch appends to a parquet snapshot — ``SELECT * FROM t``
  then reads everything ingested so far (the reference's window-backed
  stream relation scan) — and fans out into every TopK structure created
  ON that stream table (aqpTablePopulator semantics,
  SnappyContextAQPFunctions.scala:390-442).
* ``STREAMING STOP`` stops the queries; checkpoints persist, so a later
  START resumes without re-ingesting already-seen files.

Scale note: the snapshot/checkpoint directories are plain parquet + the
engine's own checkpoint format — on a cluster both live on shared storage
and the design is unchanged; only the local temp-dir default is a
convenience.
"""

from __future__ import annotations

import os
import re
import shutil
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


_DURATION_RE = re.compile(r"^\s*(\d+)\s*(ms|s|secs?|seconds?)?\s*$",
                          re.IGNORECASE)


def parse_streaming_duration_ms(text: str) -> int:
    """``2secs`` / ``2 SECS`` / ``500ms`` / ``2`` (seconds — the reference's
    ``STREAMING INIT <n>`` treats the bare number as seconds)."""
    m = _DURATION_RE.match(text)
    if not m:
        raise ValueError(f"bad STREAMING INIT duration: {text!r}")
    n = int(m.group(1))
    unit = (m.group(2) or "s").lower()
    return n if unit == "ms" else n * 1000


@dataclass
class StreamTableDef:
    name: str
    schema_ddl: str | None            # "k string, v long" (None: rate source)
    provider: str                     # file_stream | rate_stream
    options: dict[str, str] = field(default_factory=dict)


class StreamingManager:
    """Session-scoped registry of stream tables + the running queries."""

    def __init__(self, spark: SparkSession, state_root: str | None = None):
        self.spark = spark
        self.trigger_ms = 500
        self.tables: dict[str, StreamTableDef] = {}
        self._queries: dict[str, object] = {}   # table name -> StreamingQuery
        self._root = state_root or tempfile.mkdtemp(prefix="aqp_streams_")
        # name -> list of callables(batch_df) fanned out per micro-batch
        self._sinks: dict[str, list] = {}

    @property
    def active(self) -> bool:
        return bool(self._queries)

    def init(self, duration_text: str) -> None:
        if self.active:
            raise RuntimeError("STREAMING INIT while started; STOP first")
        self.trigger_ms = parse_streaming_duration_ms(duration_text)

    def create(self, d: StreamTableDef) -> DataFrame:
        if d.provider.lower() not in ("file_stream", "rate_stream"):
            raise ValueError(f"unknown stream provider '{d.provider}' "
                             f"(supported: file_stream, rate_stream)")
        if d.provider.lower() == "file_stream" and "path" not in d.options:
            raise ValueError("file_stream needs a path option")
        self.tables[d.name.lower()] = d
        # before any data: an empty static snapshot with the DDL schema, so
        # the table is immediately queryable and usable as a TopK base
        if d.schema_ddl:
            empty = self.spark.createDataFrame([], schema=d.schema_ddl)
        else:
            empty = self.spark.createDataFrame(
                [], schema="timestamp timestamp, value long")
        empty.createOrReplaceTempView(d.name)
        return empty

    def add_sink(self, table: str, fn) -> None:
        """fan-out hook: fn(batch_df) runs on every micro-batch of table."""
        self._sinks.setdefault(table.lower(), []).append(fn)

    def drop(self, name: str) -> bool:
        """Drop ONE stream table: stop only its query — the other stream
        tables' ingestion queries keep running untouched."""
        d = self.tables.pop(name.lower(), None)
        if d is None:
            return False
        q = self._queries.pop(name.lower(), None)
        if q is not None:
            q.stop()
        self.spark.catalog.dropTempView(d.name)
        self._sinks.pop(name.lower(), None)
        shutil.rmtree(os.path.join(self._root, name.lower()),
                      ignore_errors=True)
        return True

    # -- lifecycle -----------------------------------------------------------

    def _reader(self, d: StreamTableDef):
        if d.provider.lower() == "rate_stream":
            r = self.spark.readStream.format("rate")
            for k, v in d.options.items():
                r = r.option(k, v)
            return r.load()
        fmt = d.options.get("format", "parquet")
        r = self.spark.readStream.schema(d.schema_ddl).format(fmt)
        for k, v in d.options.items():
            if k not in ("path", "format", "rowconverter"):
                r = r.option(k, v)
        if fmt == "csv":
            r = r.option("header", "false")
        return r.load(d.options["path"])

    def _snapshot_dir(self, name: str) -> str:
        return os.path.join(self._root, name.lower(), "rows")

    def _batch_fn(self, d: StreamTableDef):
        rows_dir = self._snapshot_dir(d.name)
        sinks = self._sinks.get(d.name.lower(), [])

        def on_batch(batch_df: DataFrame, epoch_id: int) -> None:
            if batch_df.isEmpty():
                return
            batch_df.write.mode("append").parquet(rows_dir)
            snap = self.spark.read.parquet(rows_dir)
            snap.createOrReplaceTempView(d.name)
            for fn in sinks:
                fn(batch_df)

        return on_batch

    def start(self) -> None:
        if self.active:
            raise RuntimeError("STREAMING START while already started")
        for d in self.tables.values():
            ckpt = os.path.join(self._root, d.name.lower(), "ckpt")
            q = (self._reader(d).writeStream
                 .foreachBatch(self._batch_fn(d))
                 .trigger(processingTime=f"{self.trigger_ms} milliseconds")
                 .option("checkpointLocation", ckpt)
                 .start())
            self._queries[d.name.lower()] = q

    def process_all(self) -> None:
        """deterministic drain: block until every source is fully consumed
        (test/sync surface; production relies on the trigger cadence)."""
        for q in self._queries.values():
            q.processAllAvailable()

    def stop(self) -> None:
        for q in self._queries.values():
            q.stop()
        self._queries = {}

    def snapshot(self, name: str) -> DataFrame | None:
        """current accumulated rows of a stream table (None if unknown)."""
        d = self.tables.get(name.lower())
        if d is None:
            return None
        rows_dir = self._snapshot_dir(name)
        if os.path.isdir(rows_dir):
            return self.spark.read.parquet(rows_dir)
        if d.schema_ddl:
            return self.spark.createDataFrame([], schema=d.schema_ddl)
        return self.spark.createDataFrame(
            [], schema="timestamp timestamp, value long")
