"""Sketch primitives for approximate time-series TopK.

Rebuilds (in numpy, deterministic):
  * Count-Min Sketch with conservative point estimate and the reference's
    ``Approximate`` wrapping: lower = est - floor(size*eps), max = est
    (reference: execution/cms/CountMinSketch.scala:273-375,
    execution/Approximate.scala:25-60)
  * width-halving compression used by Hokusai item aggregation
    (CountMinSketch.scala:344+ ``compress``; Hokusai paper, Matusevych,
    Smola, Ahmed 2012)
  * Space-Saving stream summary (streamsummary/StreamSummaryAggregation.scala:35-131)

Hashing is a fixed-constant polynomial over the key's utf-8 bytes mod a
Mersenne prime — deterministic across processes, partitions and engines (no
PYTHONHASHSEED dependence), which keeps sketch contents reproducible for the
replay oracle.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

_P = 2305843009213693951          # 2^61 - 1
_ROW_A = (1103515245, 1299709, 15485863, 32452843, 49979687, 67867967,
          86028121, 104395301, 122949823, 141650939, 160481183, 179424673)
_ROW_B = (12345, 67891, 24680, 13579, 97531, 86420, 11235, 81321, 34553,
          89151, 43349, 77711)

_M64 = 0xFFFFFFFFFFFFFFFF


def _mix64(x: int) -> int:
    """splitmix64 finalizer: full-avalanche 64-bit mix (public-domain
    constant set; deterministic, pure integer)."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return (x ^ (x >> 31)) & _M64


def key_hash(key) -> int:
    """Deterministic 61-bit hash of a (string or int) key."""
    if isinstance(key, (int, np.integer)):
        return (int(key) * 2654435761 + 0x9E3779B9) % _P
    h = 0
    for b in str(key).encode("utf-8"):
        h = (h * 131 + b) % _P
    return h


@dataclass(frozen=True)
class Approximate:
    """(lowerBound, estimate, max, probabilityWithinBounds) monoid
    (Approximate.scala:25-60): a + b keeps lower sums and max := est sum."""
    lower: int
    estimate: int
    max: int
    probability: float

    def __add__(self, other: "Approximate") -> "Approximate":
        est = self.estimate + other.estimate
        return Approximate(self.lower + other.lower, est, est,
                           self.probability)


class CountMinSketch:
    """depth x width counter matrix; eps = e/width, confidence = 1-exp(-depth)
    (CMSParams semantics, Hokusai.scala:698)."""

    def __init__(self, depth: int = 7, width: int = 200,
                 table: np.ndarray | None = None, size: int = 0):
        if depth > len(_ROW_A):
            raise ValueError(f"depth > {len(_ROW_A)} unsupported")
        self.depth, self.width = depth, width
        self.table = table if table is not None else np.zeros(
            (depth, width), dtype=np.int64)
        self.size = size                      # total count added
        self.eps = float(np.e) / width
        self.confidence = 1.0 - float(np.exp(-depth))

    # -- hashing -----------------------------------------------------------
    #
    # Row buckets need INDEPENDENT low bits: the width is a power of two,
    # and with small key hashes the textbook ((a*h+b) mod P) mod w never
    # wraps mod P, so every row's bucket collapses to a bijection of
    # h mod w — any two keys congruent mod w then collide in ALL rows and
    # the min-estimate inflates by the colliding key's full count (seen as
    # a systematic ~2x overcount once key cardinality approaches the
    # width). A 64-bit avalanche finalizer (splitmix64) over per-row-salted
    # h restores independent rows; bucket consistency under width-halving
    # (compress) is preserved because mix % (w/2) == (mix % w) % (w/2)
    # for power-of-two widths.

    def _buckets(self, h: int) -> list[int]:
        return [_mix64(h ^ (_ROW_A[i] << 1) ^ _ROW_B[i]) % self.width
                for i in range(self.depth)]

    # -- updates -----------------------------------------------------------

    def add(self, key, count: int = 1) -> None:
        for i, b in enumerate(self._buckets(key_hash(key))):
            self.table[i, b] += count
        self.size += count

    def add_many(self, keys, counts) -> None:
        for k, c in zip(keys, counts):
            self.add(k, int(c))

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert (self.depth, self.width) == (other.depth, other.width)
        return CountMinSketch(self.depth, self.width,
                              self.table + other.table,
                              self.size + other.size)

    def compress(self) -> "CountMinSketch":
        """Halve the width: column i of the new table is col i + col i+w/2
        (Hokusai item aggregation). Hash buckets stay consistent because
        b mod (w/2) == (b mod w) mod (w/2) when w is a power of two."""
        w2 = self.width // 2
        return CountMinSketch(self.depth, w2,
                              self.table[:, :w2] + self.table[:, w2:2 * w2],
                              self.size)

    # -- queries -----------------------------------------------------------

    def estimate(self, key) -> int:
        return int(min(self.table[i, b]
                       for i, b in enumerate(self._buckets(key_hash(key)))))

    def estimate_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized ``estimate`` over an array of ``key_hash`` values
        (int64/uint64): the query path's cost is |candidates| x |sketches|
        x depth scalar ``_mix64`` calls in interpreted Python — this runs
        the identical splitmix64 mix, row-salted buckets and min-over-rows
        as whole numpy arrays (uint64 arithmetic wraps mod 2^64, exactly
        the scalar path's ``& _M64`` masking), so estimates are
        bit-identical to the scalar path (pinned by pytest)."""
        hs = hashes.astype(np.uint64, copy=False)
        out = None
        for i in range(self.depth):
            x = hs ^ np.uint64((_ROW_A[i] << 1) ^ _ROW_B[i])
            x = x + np.uint64(0x9E3779B97F4A7C15)
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x = x ^ (x >> np.uint64(31))
            v = self.table[i, (x % np.uint64(self.width)).astype(np.int64)]
            out = v if out is None else np.minimum(out, v)
        return out

    def estimate_approximate(self, key) -> Approximate:
        est = self.estimate(key)
        return Approximate(est - int(self.size * self.eps), est, est,
                           self.confidence)

    # -- serialization (deterministic little-endian bytes) ------------------

    def to_bytes(self) -> bytes:
        head = np.array([self.depth, self.width, self.size],
                        dtype="<i8").tobytes()
        return head + self.table.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinSketch":
        depth, width, size = np.frombuffer(data[:24], dtype="<i8")
        table = np.frombuffer(data[24:], dtype="<i8").reshape(
            int(depth), int(width)).copy()
        return cls(int(depth), int(width), table, int(size))


class IntervalTracker:
    """Dyadic-interval bookkeeping for Hokusai time aggregation
    (reference: execution/Hokusai.scala:763 ``IntervalTracker``; the range
    query walks taAggregates over a dyadic cover, Hokusai.scala:394-432).

    Level ``l`` holds sketches over aligned spans of ``2^l`` time buckets;
    any bucket range [lo, hi] is covered by at most ``2*log2(n)`` aligned
    spans, so a months-long range query merges O(log n) sketches instead of
    one per interval."""

    def __init__(self, max_level: int):
        self.max_level = max_level

    @staticmethod
    def span(level: int, idx: int) -> tuple[int, int]:
        """bucket range [lo, hi] covered by node ``idx`` of ``level``."""
        return idx << level, ((idx + 1) << level) - 1

    def cover(self, lo: int, hi: int) -> list[tuple[int, int]]:
        """minimal dyadic cover of [lo, hi] as (level, idx) nodes, left to
        right — greedy largest-aligned-block decomposition."""
        assert lo >= 0 and hi >= lo
        out: list[tuple[int, int]] = []
        while lo <= hi:
            l = self.max_level if lo == 0 else min(
                (lo & -lo).bit_length() - 1, self.max_level)
            while lo + (1 << l) - 1 > hi:
                l -= 1
            out.append((l, lo >> l))
            lo += 1 << l
        return out


class TopKCMS(CountMinSketch):
    """CMS + maintained top-k key set (cms/TopKCMS.scala:32-193)."""

    def __init__(self, k: int, depth: int = 7, width: int = 200, **kw):
        super().__init__(depth, width, **kw)
        self.k = k
        self._top: dict = {}                  # key -> estimate

    def add(self, key, count: int = 1) -> None:
        super().add(key, count)
        est = self.estimate(key)
        if key in self._top or len(self._top) < self.k:
            self._top[key] = est
        else:
            mn_key = min(self._top, key=lambda x: (self._top[x], str(x)))
            if est > self._top[mn_key]:
                del self._top[mn_key]
                self._top[key] = est

    def topk(self) -> list[tuple]:
        return heapq.nlargest(self.k, self._top.items(),
                              key=lambda kv: (kv[1], str(kv[0])))


class SpaceSaving:
    """Space-Saving stream summary: capacity-bounded (key -> count, error)
    (StreamSummaryAggregation.scala:35-131, Metwally et al. 2005)."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.counts: dict = {}                # key -> (count, error)

    def add(self, key, count: int = 1) -> None:
        if key in self.counts:
            c, e = self.counts[key]
            self.counts[key] = (c + count, e)
        elif len(self.counts) < self.capacity:
            self.counts[key] = (count, 0)
        else:
            mn_key = min(self.counts,
                         key=lambda x: (self.counts[x][0], str(x)))
            mn_c, _ = self.counts.pop(mn_key)
            self.counts[key] = (mn_c + count, mn_c)

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        out = SpaceSaving(self.capacity)
        keys = set(self.counts) | set(other.counts)
        merged = {}
        for k in keys:
            c1, e1 = self.counts.get(k, (0, 0))
            c2, e2 = other.counts.get(k, (0, 0))
            merged[k] = (c1 + c2, e1 + e2)
        for k in sorted(merged, key=lambda x: (-merged[x][0], str(x)))[
                : self.capacity]:
            out.counts[k] = merged[k]
        return out

    def topk(self, k: int) -> list[tuple]:
        items = sorted(self.counts.items(),
                       key=lambda kv: (-kv[1][0], str(kv[0])))
        return [(key, c, e) for key, (c, e) in items[:k]]
