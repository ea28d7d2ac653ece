"""Sample catalog + selection (reference: SnappyAQPSessionCatalog,
hive/SnappyAQPSessionCatalog.scala:39-170, and the sample-matching priority
in ReplaceWithSampleTable, common/QueryProcessingRules.scala:417-500).

Selection priority for a query over base table T with group-by column set G
and query column set Q = G ∪ filter columns:

    1. sample QCS == G          (exact group-by match)
    2. sample QCS == Q          (exact query-column match)
    3. sample QCS ⊇ Q           (superset; largest fraction wins)
    4. smallest |QCS \\ Q|       (least mismatch; largest fraction tiebreak)

Returns None when the base table has no samples — the caller then routes
the query to the base table exactly (PostReplaceSampleTableQueryRoutingRules,
common/QueryRoutingRules.scala:342-404).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .specs import SampleSpec


@dataclass
class SampleInfo:
    name: str
    spec: SampleSpec
    path: str | None = None          # materialized parquet location, if any


def _norm(cols: set[str]) -> set[str]:
    return {c.strip().lower() for c in cols}


@dataclass
class SampleCatalog:
    samples: dict[str, SampleInfo] = field(default_factory=dict)

    def register(self, info: SampleInfo) -> None:
        self.samples[info.name.lower()] = info

    def drop(self, name: str) -> None:
        self.samples.pop(name.lower(), None)

    def get(self, name: str) -> SampleInfo | None:
        return self.samples.get(name.lower())

    def for_base(self, base_table: str) -> list[SampleInfo]:
        return [s for s in self.samples.values()
                if s.spec.base_table.lower() == base_table.lower()]

    def select_sample(self, base_table: str, group_cols: set[str],
                      filter_cols: set[str]) -> SampleInfo | None:
        cands = self.for_base(base_table)
        if not cands:
            return None
        g = _norm(group_cols)
        q = _norm(group_cols | filter_cols)

        def qcs(s: SampleInfo) -> set[str]:
            return _norm(set(s.spec.qcs))

        exact_g = [s for s in cands if qcs(s) == g and g]
        if exact_g:
            return max(exact_g, key=lambda s: s.spec.fraction)
        exact_q = [s for s in cands if qcs(s) == q and q]
        if exact_q:
            return max(exact_q, key=lambda s: s.spec.fraction)
        supersets = [s for s in cands if q and qcs(s) >= q]
        if supersets:
            return max(supersets, key=lambda s: s.spec.fraction)
        return min(cands, key=lambda s: (len(qcs(s) - q), -s.spec.fraction))
