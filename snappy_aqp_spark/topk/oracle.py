"""Replay-oracle SQL for TopK fixtures.

Exactness contract: with the fixture's width/depth and per-partition key
sets, the conservative CMS estimate has no collisions on the test data, so
``EstimatedValue`` equals the exact in-range count and ``LowerBound`` equals
``est - Σ_buckets floor(bucket_partition_size * eps)`` — both expressible in
portable SQL when the key is an integer (partition id = key mod P, matching
the engine's int-key partitioner). Verified bit-for-bit by the driver gate;
at production scale the same operator degrades gracefully to approximate.
"""

from __future__ import annotations

import numpy as np

from ..dialect import dlit
from .api import TopKSpec


def topk_oracle_sql(spec: TopKSpec, table: str, start_us: int | None,
                    end_us: int | None, k: int) -> str:
    iv = spec.time_interval_us
    eps = float(np.e) / spec.width
    epoch = f"(SELECT MIN(epoch_us({spec.time_col})) FROM {table})"
    bucket = (f"CAST(FLOOR(CAST(epoch_us({spec.time_col}) - {epoch} AS DOUBLE) "
              f"/ CAST({iv} AS DOUBLE)) AS BIGINT)")
    freq = spec.frequency_col or "1"
    key = f"CAST({spec.key} AS VARCHAR)"
    pid = f"CAST(({spec.key}) % {spec.num_partitions} AS BIGINT)"
    conds = []
    if start_us is not None:
        conds.append(f"bucket >= CAST(FLOOR(CAST({start_us} - {epoch} AS DOUBLE) / CAST({iv} AS DOUBLE)) AS BIGINT)")
    if end_us is not None:
        conds.append(f"bucket <= CAST(FLOOR(CAST({end_us} - {epoch} AS DOUBLE) / CAST({iv} AS DOUBLE)) AS BIGINT)")
    where = f"WHERE {' AND '.join(conds)}" if conds else ""

    base = (f"SELECT {key} AS key, {pid} AS pid, {bucket} AS bucket, "
            f"CAST({freq} AS BIGINT) AS freq FROM {table}")
    if spec.stream_summary:
        return (
            f"WITH __rng AS ({base}), __inb AS (SELECT * FROM __rng {where}), "
            f"__cnt AS (SELECT key, CAST(SUM(freq) AS BIGINT) AS est "
            f"FROM __inb GROUP BY key) "
            f"SELECT key, est AS EstimatedValue, CAST(0 AS BIGINT) AS DeltaError "
            f"FROM __cnt ORDER BY est DESC, key ASC LIMIT {k}")
    return (
        f"WITH __rng AS ({base}), __inb AS (SELECT * FROM __rng {where}), "
        f"__sizes AS (SELECT pid, bucket, CAST(SUM(freq) AS BIGINT) AS n "
        f"FROM __inb GROUP BY pid, bucket), "
        f"__slack AS (SELECT pid, CAST(SUM(CAST(FLOOR(CAST(n AS DOUBLE) * "
        f"{dlit(eps)}) AS BIGINT)) AS BIGINT) AS s FROM __sizes GROUP BY pid), "
        f"__cnt AS (SELECT key, pid, CAST(SUM(freq) AS BIGINT) AS est "
        f"FROM __inb GROUP BY key, pid) "
        f"SELECT c.key AS key, c.est AS EstimatedValue, "
        f"c.est - s.s AS LowerBound "
        f"FROM __cnt c JOIN __slack s ON c.pid = s.pid "
        f"ORDER BY c.est DESC, c.key ASC LIMIT {k}")
