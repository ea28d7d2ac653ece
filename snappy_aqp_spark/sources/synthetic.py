"""Custom Python DataSource: a deterministic synthetic event generator.

The reference ships pluggable stream adapters that synthesize or adapt
event feeds into its ingest pipeline (stream sources registered through
its CREATE STREAM TABLE providers; the AQP streaming suites drive them
with generated tweet/row streams). The Spark-4-native way to add a custom
source is the Python DataSource API: this module registers
``synthetic_events`` as BOTH a batch reader and a micro-batch stream
reader.

Scale/e2e design points:

- ``partitions()`` splits the id range across readers, so generation is
  embarrassingly parallel and the driver never materializes rows.
- Rows are a pure integer function of the row id (the detrng LCG family),
  so any slice of the stream is reproducible: the DuckDB oracle is a
  ``generate_series`` over the same formula — a full value-hash fixture
  for a CUSTOM SOURCE, not just a smoke test.
- The stream reader's offsets are plain row counts; ``read`` regenerates
  exactly the [start, end) slice, so checkpoint replay after a crash
  yields identical batches (the source-side half of exactly-once).
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, InputPartition)

from ..detrng import MODULUS, _MIX, _MUL

_TYPES = ("view", "click", "purchase")
_SCHEMA = ("event_id bigint, user_id bigint, event_type string, "
           "amount_cents bigint")


def _seed_c(seed: int) -> int:
    return (seed * _MIX + 12345) % MODULUS


def _row(i: int, seed_c: int) -> tuple:
    h = (i * _MUL + seed_c) % MODULUS
    return (i, h % 1000, _TYPES[h % 3], h % 10000)


def synthetic_row_exprs(seed: int, id_sql: str = "i") -> dict[str, str]:
    """The generator formula as engine-portable SQL fragments keyed by
    output column (used verbatim by the DuckDB oracle)."""
    h = f"(({id_sql} * {_MUL} + {_seed_c(seed)}) % {MODULUS})"
    return {
        "event_id": id_sql,
        "user_id": f"({h} % 1000)",
        "event_type": (f"(CASE {h} % 3 WHEN 0 THEN 'view' "
                       "WHEN 1 THEN 'click' ELSE 'purchase' END)"),
        "amount_cents": f"({h} % 10000)",
    }


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("rows", "1000"))
        self.seed_c = _seed_c(int(options.get("seed", "42")))
        self.n_parts = int(options.get("numPartitions", "8"))

    def partitions(self):
        step = max(1, -(-self.n // self.n_parts))
        return [_Range(s, min(s + step, self.n))
                for s in range(0, self.n, step)]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _row(i, self.seed_c)


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.total = int(options.get("rows", "1000"))
        self.per_batch = int(options.get("rowsPerBatch", "400"))
        self.seed_c = _seed_c(int(options.get("seed", "42")))
        self.n_parts = int(options.get("numPartitions", "4"))

    def initialOffset(self):
        return {"i": 0}

    def latestOffset(self):
        # grows by one batch per trigger until the configured total —
        # a bounded feed so availableNow/tests drain deterministically
        cur = getattr(self, "_cur", 0)
        self._cur = min(cur + self.per_batch, self.total)
        return {"i": self._cur}

    def partitions(self, start, end):
        lo, hi = start["i"], end["i"]
        step = max(1, -(-(hi - lo) // self.n_parts))
        return [_Range(s, min(s + step, hi)) for s in range(lo, hi, step)]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield _row(i, self.seed_c)

    def commit(self, end):
        pass

    def stop(self):
        pass


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return _Reader(self.options)

    def streamReader(self, schema):
        return _StreamReader(self.options)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


def synthetic_agg_oracle_sql(rows: int = 100_000, seed: int = 42) -> str:
    """DuckDB replay of the fixture aggregate: regenerate the id range
    with generate_series and the same integer formula."""
    e = synthetic_row_exprs(seed)
    return (
        "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(amount_cents) AS BIGINT) AS amount_cents, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ("
        f"SELECT {e['event_type']} AS event_type, "
        f"{e['amount_cents']} AS amount_cents, "
        f"{e['user_id']} AS user_id "
        f"FROM generate_series(0, {rows - 1}) AS t(i)) __g "
        "GROUP BY event_type ORDER BY event_type")
