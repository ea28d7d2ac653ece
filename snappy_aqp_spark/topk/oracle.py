"""Replay-oracle SQL for TopK fixtures.

Exactness contract: with the fixture's width/depth and per-partition key
sets, the conservative CMS estimate has no collisions on the test data, so
``EstimatedValue`` equals the exact in-range count; ``LowerBound`` equals
``est - Σ_sketches floor(sketch_size * eps)`` over exactly the sketch rows
the engine touches — per level-0 bucket for open ranges, per HOKUSAI DYADIC
COVER interval for two-sided ranges (the IntervalTracker path); ``MaxBound``
equals the estimate and ``Probability`` is the constant CMS confidence
(Approximate monoid, Approximate.scala:25-60). All expressible in portable
SQL when the key is an integer (partition id = key mod P, matching the
engine's int-key partitioner) and the fixture pins ``epoch_us`` (so bucket
numbers are plan-time constants). Verified bit-for-bit by the driver gate;
at production scale the same operator degrades gracefully to approximate.

Caveat: the dyadic-cover slack assumes the queried range lies inside the
table's dyadic span (always true when the range is within the data's time
extent) — the engine clamps wider ranges to its materialized levels.
"""

from __future__ import annotations

import numpy as np

from ..dialect import dlit
from .api import TopKSpec
from .sketches import IntervalTracker


def topk_oracle_sql(spec: TopKSpec, table: str, start_us: int | None,
                    end_us: int | None, k: int,
                    decayed_before: int | None = None,
                    decay_levels: int = 1) -> str:
    """``decayed_before``/``decay_levels``: replay the slack of a decayed
    table — buckets below the cutoff carry the HALVED width's eps (the
    engine's decay compresses those sketches, Hokusai item aggregation),
    everything else the original width's."""
    iv = spec.time_interval_us
    eps = float(np.e) / spec.width
    prob = 1.0 - float(np.exp(-spec.depth))
    if spec.time_col is None:
        # plain (non-timeseries) TopKCMS: one sketch, every row in the
        # single level-0 bucket; range endpoints do not apply
        assert start_us is None and end_us is None
        epoch, bucket = "0", "CAST(0 AS BIGINT)"
    elif spec.epoch_us is not None:
        epoch = str(int(spec.epoch_us))
    else:
        epoch = f"(SELECT MIN(epoch_us({spec.time_col})) FROM {table})"
    if spec.time_col is not None:
        bucket = (f"CAST(FLOOR(CAST(epoch_us({spec.time_col}) - {epoch} "
                  f"AS DOUBLE) / CAST({iv} AS DOUBLE)) AS BIGINT)")
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

    # sketch-row granularity: one slack term per sketch the engine merges
    if (spec.dyadic and spec.epoch_us is not None and spec.time_col is not None
            and start_us is not None and end_us is not None):
        b0 = max(0, (start_us - spec.epoch_us) // iv)
        b1 = (end_us - spec.epoch_us) // iv
        cover = IntervalTracker(62).cover(int(b0), int(b1))
        iv_case = "CASE " + " ".join(
            f"WHEN bucket BETWEEN {IntervalTracker.span(l, i)[0]} AND "
            f"{IntervalTracker.span(l, i)[1]} THEN {n}"
            for n, (l, i) in enumerate(cover)) + " END"
        grain = f"{iv_case} AS grain"
    else:
        grain = "bucket AS grain"

    if decayed_before is not None:
        dec_eps = float(np.e) / max(2, spec.width >> decay_levels)
        # grain == level-0 bucket on the open-range path decay applies to
        eps_sql = (f"(CASE WHEN grain < {int(decayed_before)} "
                   f"THEN {dlit(dec_eps)} ELSE {dlit(eps)} END)")
    else:
        eps_sql = dlit(eps)

    return (
        f"WITH __rng AS ({base}), __inb AS (SELECT *, {grain} FROM __rng {where}), "
        f"__sizes AS (SELECT pid, grain, CAST(SUM(freq) AS BIGINT) AS n "
        f"FROM __inb GROUP BY pid, grain), "
        f"__slack AS (SELECT pid, CAST(SUM(CAST(FLOOR(CAST(n AS DOUBLE) * "
        f"{eps_sql}) AS BIGINT)) AS BIGINT) AS s FROM __sizes GROUP BY pid), "
        f"__cnt AS (SELECT key, pid, CAST(SUM(freq) AS BIGINT) AS est "
        f"FROM __inb GROUP BY key, pid) "
        f"SELECT c.key AS key, c.est AS EstimatedValue, "
        f"c.est - s.s AS LowerBound, c.est AS MaxBound, "
        f"{dlit(prob)} AS Probability "
        f"FROM __cnt c JOIN __slack s ON c.pid = s.pid "
        f"ORDER BY c.est DESC, c.key ASC LIMIT {k}")
