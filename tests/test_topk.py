"""Sketch invariants (reference HokusaiSpec / TopCMSSpec analogs) and the
Spark TopK table lifecycle (create / insert / between-time query)."""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from snappy_aqp_spark.topk.api import (TopKRegistry, TopKSpec,
                                       create_approx_ts_topk,
                                       insert_into_topk,
                                       query_approx_ts_topk)
from snappy_aqp_spark.topk.oracle import topk_oracle_sql
from snappy_aqp_spark.topk.sketches import (Approximate, CountMinSketch,
                                            SpaceSaving, TopKCMS)
from tests.conftest import SF_SMALL, compare_frames


def test_cms_estimate_overcounts_never_under():
    rng = np.random.default_rng(7)
    cms = CountMinSketch(depth=5, width=64)
    truth = {}
    for _ in range(2000):
        k = int(rng.integers(0, 200))
        cms.add(k)
        truth[k] = truth.get(k, 0) + 1
    for k, c in truth.items():
        assert cms.estimate(k) >= c
    assert cms.size == 2000


def test_cms_merge_and_serde():
    a, b = CountMinSketch(4, 128), CountMinSketch(4, 128)
    for i in range(100):
        a.add(i)
        b.add(i % 10)
    m = a.merge(b)
    assert m.estimate(3) >= a.estimate(3) + b.estimate(3) - 1
    rt = CountMinSketch.from_bytes(m.to_bytes())
    assert np.array_equal(rt.table, m.table) and rt.size == m.size


def test_cms_compress_halves_width_preserving_estimates():
    cms = CountMinSketch(4, 256)
    for i in range(500):
        cms.add(i % 40)
    half = cms.compress()
    assert half.width == 128
    for k in range(40):
        assert half.estimate(k) >= cms.estimate(k)   # coarser, never lower
    assert half.size == cms.size


def test_approximate_monoid():
    a = Approximate(8, 10, 10, 0.95)
    b = Approximate(3, 5, 5, 0.95)
    c = a + b
    assert (c.lower, c.estimate, c.max) == (11, 15, 15)


def test_topkcms_tracks_heavy_hitters():
    t = TopKCMS(k=5, depth=5, width=512)
    for i in range(50):
        for _ in range(100 - i):
            t.add(f"k{i}")
    top = [k for k, _ in t.topk()]
    assert top[:3] == ["k0", "k1", "k2"]


def test_spacesaving_exact_when_capacity_sufficient():
    ss = SpaceSaving(capacity=100)
    for i in range(50):
        ss.add(f"k{i}", 50 - i)
    top = ss.topk(5)
    assert top[0] == ("k0", 50, 0) and top[4] == ("k4", 46, 0)


def test_spacesaving_bounded_capacity_overestimates():
    ss = SpaceSaving(capacity=4)
    for i in range(20):
        ss.add(f"k{i % 8}")
    assert len(ss.counts) == 4
    for k, (c, e) in ss.counts.items():
        assert c >= e >= 0


@pytest.fixture(scope="module")
def events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF_SMALL}/events.parquet")


def _spec(name, **kw):
    base = dict(key="user_id", time_col="ts",
                time_interval_us=3 * 24 * 3600 * 1_000_000,
                depth=7, width=4096, num_partitions=8, int_key=True)
    base.update(kw)
    return TopKSpec(name, **base)


def test_topk_create_query_matches_oracle(spark, duck, events):
    reg = TopKRegistry()
    spec = _spec("t1")
    create_approx_ts_topk(spark, reg, events, spec)
    res = query_approx_ts_topk(spark, reg, "t1", None, None, 10)
    oracle = duck.sql(topk_oracle_sql(spec, "events", None, None, 10))
    compare_frames(res, oracle, sort_cols=["key"])


def test_topk_incremental_insert_equals_batch(spark, events):
    reg = TopKRegistry()
    spec = _spec("full")
    create_approx_ts_topk(spark, reg, events, spec)
    full = query_approx_ts_topk(spark, reg, "full", None, None, 10).toPandas()

    half1 = events.where("event_id % 2 = 0")
    half2 = events.where("event_id % 2 = 1")
    spec2 = dataclasses.replace(spec, name="inc",
                                epoch_us=reg.get("full").epoch_us)
    create_approx_ts_topk(spark, reg, half1, spec2)
    insert_into_topk(spark, reg, "inc", half2)
    inc = query_approx_ts_topk(spark, reg, "inc", None, None, 10).toPandas()
    assert full.equals(inc)


def test_streamsummary_two_sided_window_matches_oracle(spark, duck, events):
    """Two-sided [start, end) window over a Space-Saving table: merged
    per-bucket summaries equal the exact replay at fixture capacity
    (queryTopkStreamSummary, SnappyContextAQPFunctions.scala:293-323)."""
    reg = TopKRegistry()
    spec = _spec("ssw", stream_summary=True, capacity=4096)
    create_approx_ts_topk(spark, reg, events, spec)
    start, end = 1_704_672_000_000_000, 1_705_881_600_000_000
    res = query_approx_ts_topk(spark, reg, "ssw", start, end, 15)
    oracle = duck.sql(topk_oracle_sql(spec, "events", start, end, 15))
    compare_frames(res, oracle, sort_cols=["key"])


def test_hokusai_decay_keeps_conservative_estimates(spark, events):
    from snappy_aqp_spark.topk.api import decay_topk
    reg = TopKRegistry()
    spec = _spec("decay", width=4096)
    create_approx_ts_topk(spark, reg, events, spec)
    before = {r.key: r.EstimatedValue for r in
              query_approx_ts_topk(spark, reg, "decay", None, None, 50).collect()}
    decay_topk(spark, reg, "decay", older_than_bucket=5, levels=2)
    after = {r.key: r.EstimatedValue for r in
             query_approx_ts_topk(spark, reg, "decay", None, None, 50).collect()}
    # decayed sketches may only overestimate, never underestimate
    for k, v in before.items():
        assert after.get(k, 0) >= v


def test_decay_watermark_halves_each_bucket_exactly_once(spark, events):
    """Repeated decay calls with an advancing cutoff compress each bucket
    exactly ``levels`` times: the table tracks decayed_before, so a second
    pass over an already-decayed bucket is a no-op (the automatic
    decay-on-ingest path relies on this)."""
    from pyspark.sql import functions as F
    from snappy_aqp_spark.topk.api import decay_topk
    reg = TopKRegistry()
    spec = _spec("wm", width=4096)
    create_approx_ts_topk(spark, reg, events, spec)

    def widths():
        rows = (reg.get("wm").state.where(F.col("level") == 0)
                .select("bucket", "sketch").collect())
        return {int(r["bucket"]):
                CountMinSketch.from_bytes(bytes(r["sketch"])).width
                for r in rows}

    decay_topk(spark, reg, "wm", older_than_bucket=3, levels=1)
    w1 = widths()
    assert all(w == 2048 for b, w in w1.items() if b < 3)
    assert all(w == 4096 for b, w in w1.items() if b >= 3)
    # advancing cutoff: only [3, 5) compresses; [0, 3) must NOT re-halve
    decay_topk(spark, reg, "wm", older_than_bucket=5, levels=1)
    w2 = widths()
    assert all(w == 2048 for b, w in w2.items() if b < 5)
    assert all(w == 4096 for b, w in w2.items() if b >= 5)
    # same cutoff again: no-op
    t = decay_topk(spark, reg, "wm", older_than_bucket=5, levels=1)
    assert t.decayed_before == 5 and widths() == w2


def test_streaming_decay_on_ingest_bounds_old_widths(spark, events):
    """StreamingTopKMaintainer(decay_horizon=...) compresses aged buckets
    as time-ordered batches advance the newest bucket — no manual decay
    call (Hokusai.scala:172-196 timeEpoch.increment)."""
    from pyspark.sql import functions as F
    from snappy_aqp_spark.streaming.maintenance import StreamingTopKMaintainer
    reg = TopKRegistry()
    spec = _spec("ingest_decay", width=4096, epoch_us=1_704_067_200_000_000)
    from snappy_aqp_spark.topk.api import _time_us
    bucket = F.floor((_time_us(events, "ts") - F.lit(spec.epoch_us))
                     / F.lit(spec.time_interval_us))
    m = StreamingTopKMaintainer(spark, reg, spec, decay_horizon=5)
    for lo, hi in ((0, 3), (4, 6), (7, 9)):
        m.process_batch(events.where(bucket.between(lo, hi)))
    table = reg.get("ingest_decay")
    assert table.max_bucket == 9 and table.decayed_before == 5
    rows = (table.state.where(F.col("level") == 0)
            .select("bucket", "sketch").collect())
    for r in rows:
        w = CountMinSketch.from_bytes(bytes(r["sketch"])).width
        assert w == (2048 if int(r["bucket"]) < 5 else 4096)


def test_spec_level_decay_applies_on_plain_inserts(spark, events):
    """decay_horizon carried ON THE SPEC (the CREATE TOPK TABLE
    decayHorizon option path) ages buckets through plain
    create/insert_into_topk maintenance — no maintainer object needed."""
    from pyspark.sql import functions as F
    reg = TopKRegistry()
    spec = _spec("spec_decay", width=4096,
                 epoch_us=1_704_067_200_000_000, decay_horizon=5)
    from snappy_aqp_spark.topk.api import _time_us
    bucket = F.floor((_time_us(events, "ts") - F.lit(spec.epoch_us))
                     / F.lit(spec.time_interval_us))
    create_approx_ts_topk(spark, reg, events.where(bucket.between(0, 3)),
                          spec)
    insert_into_topk(spark, reg, "spec_decay",
                     events.where(bucket.between(4, 9)))
    table = reg.get("spec_decay")
    assert table.max_bucket == 9 and table.decayed_before == 5
    for r in (table.state.where(F.col("level") == 0)
              .select("bucket", "sketch").collect()):
        w = CountMinSketch.from_bytes(bytes(r["sketch"])).width
        assert w == (2048 if int(r["bucket"]) < 5 else 4096)


def test_create_topk_ddl_decay_horizon_option(spark, events):
    """CREATE TOPK TABLE ... decayHorizon 'N' flows into the spec and ages
    the one-shot build immediately (events span buckets 0-9 -> cutoff 5)."""
    from pyspark.sql import functions as F
    from snappy_aqp_spark.api import AQPSession
    s = AQPSession(spark, data_token="topk-ddl-decay")
    s.register_table("events", events)
    s.sql("CREATE TOPK TABLE tk_decay ON events OPTIONS(key 'user_id', "
          "timeSeriesColumn 'ts', timeInterval '259200s', "
          "epoch '1704067200000000', width '4096', numPartitions '8', "
          "intKey 'true', decayHorizon '5')")
    t = s.topk.get("tk_decay")
    assert t.spec.decay_horizon == 5
    assert t.max_bucket == 9 and t.decayed_before == 5
    for r in (t.state.where(F.col("level") == 0)
              .select("bucket", "sketch").collect()):
        w = CountMinSketch.from_bytes(bytes(r["sketch"])).width
        assert w == (2048 if int(r["bucket"]) < 5 else 4096)


def test_interval_tracker_cover_properties():
    """IntervalTracker invariants (HokusaiIntervalTrackerSpec analog):
    the cover partitions [lo, hi] exactly into aligned dyadic spans,
    with O(log n) spans."""
    from snappy_aqp_spark.topk.sketches import IntervalTracker
    tr = IntervalTracker(6)
    for lo in range(0, 40):
        for hi in range(lo, 64):
            cover = tr.cover(lo, hi)
            covered = []
            for level, idx in cover:
                s, e = IntervalTracker.span(level, idx)
                assert idx << level == s and e - s + 1 == 1 << level
                assert level <= tr.max_level
                covered.extend(range(s, e + 1))
            assert covered == list(range(lo, hi + 1))  # exact, ordered, disjoint
            assert len(cover) <= 2 * 7  # <= 2*(log2(64)+1)


def test_dyadic_window_query_matches_oracle(spark, duck, events):
    """two-sided range queries walk the O(log n) dyadic cover; pinned epoch
    lets the oracle reproduce the cover's slack terms exactly."""
    reg = TopKRegistry()
    spec = _spec("dy", epoch_us=1_704_067_200_000_000)
    t = create_approx_ts_topk(spark, reg, events, spec)
    assert t.max_level > 0          # levels materialized
    start, end = 1_704_672_000_000_000, 1_705_881_600_000_000
    res = query_approx_ts_topk(spark, reg, "dy", start, end, 10)
    # the plan touches the dyadic cover: [2,3] + [4,7] for this range
    oracle = duck.sql(topk_oracle_sql(spec, "events", start, end, 10))
    compare_frames(res, oracle, sort_cols=["key"])


def test_incremental_insert_rebuilds_only_ancestors(spark, events):
    """an insert touching one time bucket leaves every non-ancestor level
    row BYTE-IDENTICAL (reused, not rebuilt) and still equals the batch
    pyramid (VERDICT r2 task 4; reference Hokusai.scala:172-196)."""
    reg = TopKRegistry()
    spec = _spec("incdy")
    iv = spec.time_interval_us

    # hold out events of ONE time bucket (relative to the full-data epoch)
    full_epoch = create_approx_ts_topk(
        spark, reg, events, _spec("incdy_all")).epoch_us
    from pyspark.sql import functions as F
    from snappy_aqp_spark.topk.api import _time_us
    bucket_expr = F.floor((_time_us(events, "ts") - F.lit(full_epoch))
                          / F.lit(iv))
    base = events.where(bucket_expr != 3)
    extra = events.where(bucket_expr == 3)
    assert extra.count() > 0

    spec_inc = dataclasses.replace(spec, epoch_us=full_epoch)
    tbl = create_approx_ts_topk(spark, reg, base, spec_inc)
    before = {(r["pid"], r["level"], r["bucket"]):
              (bytes(r["sketch"]), tuple(r["cand_keys"]),
               tuple(r["cand_counts"]))
              for r in tbl.state.collect()}
    insert_into_topk(spark, reg, "incdy", extra)
    after_tbl = reg.get("incdy")
    after = {(r["pid"], r["level"], r["bucket"]):
             (bytes(r["sketch"]), tuple(r["cand_keys"]),
              tuple(r["cand_counts"]))
             for r in after_tbl.state.collect()}

    touched_pids = {r["pid"] for r in
                    (extra.select(F.pmod(F.col("user_id").cast("long"),
                                         F.lit(spec.num_partitions))
                                  .alias("pid")).distinct().collect())}
    changed = {k for k in before
               if k in after and after[k] != before[k]}
    for pid, level, bucket in changed:
        # every changed row must be a dyadic ancestor of bucket 3 on a
        # partition the insert touched
        assert pid in touched_pids, (pid, level, bucket)
        assert bucket == 3 >> level or (bucket << level) <= 3 < ((bucket + 1) << level), \
            (pid, level, bucket)

    # and the incremental pyramid equals the from-scratch batch pyramid
    batch = {(r["pid"], r["level"], r["bucket"]):
             (bytes(r["sketch"]), tuple(r["cand_keys"]),
              tuple(r["cand_counts"]))
             for r in reg.get("incdy_all").state.collect()}
    assert after == batch


def test_insert_extending_pyramid_builds_all_new_level_rows(spark):
    """an insert whose bucket extends max_level must materialize the NEW
    levels completely — including ancestors of untouched old buckets —
    or dyadic covers over the old range silently lose counts (regression:
    buckets 0-3 + insert at 12 previously dropped level-3 bucket 0)."""
    import dataclasses as dc
    from pyspark.sql import functions as F
    rows = [(u, b * 1_000_000 + u) for b in range(4) for u in range(10)]
    late = [(u, 12_000_000 + u) for u in range(5)]
    df = (spark.createDataFrame(rows, "user_id long, ts long")
          .withColumn("ts", F.col("ts") * 1000))
    extra = (spark.createDataFrame(late, "user_id long, ts long")
             .withColumn("ts", F.col("ts") * 1000))
    spec = TopKSpec("grow_inc", key="user_id", time_col="ts",
                    time_interval_us=1_000_000, num_partitions=2,
                    int_key=True, epoch_us=0)
    reg = TopKRegistry()
    create_approx_ts_topk(spark, reg, df, spec)
    insert_into_topk(spark, reg, "grow_inc", extra)
    inc = {(r["pid"], r["level"], r["bucket"]):
           (bytes(r["sketch"]), tuple(r["cand_keys"]),
            tuple(r["cand_counts"]))
           for r in reg.get("grow_inc").state.collect()}
    create_approx_ts_topk(spark, reg, df.unionByName(extra),
                          dc.replace(spec, name="grow_batch"))
    batch = {(r["pid"], r["level"], r["bucket"]):
             (bytes(r["sketch"]), tuple(r["cand_keys"]),
              tuple(r["cand_counts"]))
             for r in reg.get("grow_batch").state.collect()}
    assert inc == batch
    # the range query that walks the (3, 0) cover sees every old count
    q_inc = {r["key"]: r["EstimatedValue"] for r in query_approx_ts_topk(
        spark, reg, "grow_inc", 0, 12_000_000, 20).collect()}
    q_b = {r["key"]: r["EstimatedValue"] for r in query_approx_ts_topk(
        spark, reg, "grow_batch", 0, 12_000_000, 20).collect()}
    assert q_inc == q_b


def test_time_us_date_column_is_timezone_independent(spark):
    """DATE time columns must convert via the NTZ epoch, not a session-
    timezone cast — buckets would otherwise shift vs the DuckDB oracle."""
    from snappy_aqp_spark.topk.api import _time_us
    from pyspark.sql import functions as F
    df = spark.sql("SELECT DATE'2024-01-02' AS d")
    naive_epoch_us = 1_704_153_600_000_000      # duckdb epoch_us(DATE'2024-01-02')
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            us = df.select(_time_us(df, "d").alias("u")).first()["u"]
            assert us == naive_epoch_us, (tz, us)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_cms_row_hashes_are_independent():
    """Regression: with power-of-two widths and small key hashes, the
    textbook ((a*h+b) mod P) mod w family never wrapped mod P, collapsing
    every row to a bijection of h mod w — keys congruent mod w collided in
    ALL rows and estimates inflated ~2x at realistic cardinality. The
    avalanche-mixed rows must behave independently: no key pair among
    thousands shares more than a couple of rows."""
    from snappy_aqp_spark.topk.sketches import CountMinSketch, key_hash
    cms = CountMinSketch(7, 4096)
    buckets = {k: cms._buckets(key_hash(str(k))) for k in range(2000)}
    worst = 0
    items = list(buckets.items())
    for i in range(0, len(items), 7):     # ~300 probes against all others
        ka, ba = items[i]
        for kb, bb in items:
            if ka == kb:
                continue
            worst = max(worst, sum(1 for r in range(7) if ba[r] == bb[r]))
    assert worst <= 3, worst
    # and the sketch stays exact at fixture-scale cardinality
    cms2 = CountMinSketch(7, 4096)
    for k in range(1500):
        cms2.add(str(k), k % 7 + 1)
    assert all(cms2.estimate(str(k)) == k % 7 + 1 for k in range(0, 1500, 11))


def test_topk_save_load_roundtrip(spark, duck, events, tmp_path):
    """save_topk persists sketch state + a self-describing sidecar;
    load_topk into a FRESH registry answers the same window query
    byte-identically (and the dyadic cover still matches the oracle) —
    reference: TopK structures persist in the store and survive restart
    (topk/TopKRelation.scala:33-198)."""
    import json
    import os
    from snappy_aqp_spark.topk.api import TOPK_SIDECAR, load_topk, save_topk
    reg = TopKRegistry()
    spec = _spec("persist_src", epoch_us=1_704_067_200_000_000)
    create_approx_ts_topk(spark, reg, events, spec)
    start, end = 1_704_672_000_000_000, 1_705_881_600_000_000
    before = query_approx_ts_topk(
        spark, reg, "persist_src", start, end, 10).toPandas()
    p = str(tmp_path / "topk_state")
    save_topk(reg, "persist_src", p)
    side = json.load(open(os.path.join(p, TOPK_SIDECAR)))
    assert side["spec"]["key"] == "user_id" and side["max_level"] > 0
    reg.drop("persist_src")
    fresh = TopKRegistry()
    t = load_topk(spark, fresh, p)
    assert t.max_level == side["max_level"]
    after = query_approx_ts_topk(
        spark, fresh, "persist_src", start, end, 10)
    assert after.toPandas().equals(before)
    compare_frames(after, duck.sql(
        topk_oracle_sql(spec, "events", start, end, 10)),
        sort_cols=["key"])
    # load under a NEW name + incremental insert keeps maintaining state
    t2 = load_topk(spark, fresh, p, name="persist_renamed")
    insert_into_topk(spark, fresh, "persist_renamed",
                     events.limit(500))
    res = query_approx_ts_topk(spark, fresh, "persist_renamed",
                               start, end, 10)
    assert res.count() == 10
    # drop == unpersist: the shared suite JVM must not accumulate state
    fresh.drop("persist_src")
    fresh.drop("persist_renamed")


def test_session_topk_save_attach(spark, events, tmp_path):
    """session-surface persistence: save_topk in session A, attach_topk
    in a FRESH AQPSession, StartTime/EndTime scan answers identically."""
    from snappy_aqp_spark.api import AQPSession
    a = AQPSession(spark, data_token="topk-save-a")
    a.topk.tables.clear()
    spec = _spec("persist_api", epoch_us=1_704_067_200_000_000)
    create_approx_ts_topk(spark, a.topk, events, spec)
    start, end = 1_704_672_000_000_000, 1_705_881_600_000_000
    before = query_approx_ts_topk(spark, a.topk, "persist_api",
                                  start, end, 10).toPandas()
    p = str(tmp_path / "topk_api_state")
    a.save_topk("persist_api", p)
    b = AQPSession(spark, data_token="topk-save-b")
    b.topk.tables.clear()
    b.attach_topk(p)
    after = query_approx_ts_topk(spark, b.topk, "persist_api",
                                 start, end, 10).toPandas()
    assert after.equals(before)
    b.drop_topk("persist_api")    # unpersist: shared suite JVM hygiene


def test_topk_save_back_to_load_path(spark, events, tmp_path):
    """round-6 ADVICE: attach-then-save-BACK — saving to the very path
    the state was loaded from must not corrupt it (save stages to a
    sibling temp dir, renames, and rebinds the registry DataFrame)."""
    from snappy_aqp_spark.topk.api import load_topk, save_topk
    reg = TopKRegistry()
    spec = _spec("persist_back", epoch_us=1_704_067_200_000_000)
    create_approx_ts_topk(spark, reg, events, spec)
    start, end = 1_704_672_000_000_000, 1_705_881_600_000_000
    p = str(tmp_path / "topk_back")
    save_topk(reg, "persist_back", p)
    reg.drop("persist_back")
    fresh = TopKRegistry()
    load_topk(spark, fresh, p)
    before = query_approx_ts_topk(
        spark, fresh, "persist_back", start, end, 10).toPandas()
    # ingest more, save back to the SAME path the state came from
    insert_into_topk(spark, fresh, "persist_back", events.limit(500))
    save_topk(fresh, "persist_back", p)
    mid = query_approx_ts_topk(
        spark, fresh, "persist_back", start, end, 10).toPandas()
    # a third reload round-trips the post-ingest state byte-identically
    reg3 = TopKRegistry()
    load_topk(spark, reg3, p)
    after = query_approx_ts_topk(
        spark, reg3, "persist_back", start, end, 10).toPandas()
    assert after.equals(mid)
    fresh.drop("persist_back")
    reg3.drop("persist_back")


def test_cms_estimate_many_matches_scalar():
    """round-11: the query path estimates candidate arrays via the
    vectorized estimate_many — it must be bit-identical to the scalar
    estimate for every key, including post-compress (halved) widths."""
    import numpy as np
    from snappy_aqp_spark.topk.sketches import CountMinSketch, key_hash

    s = CountMinSketch(depth=7, width=64)
    keys = [f"user{i}" for i in range(500)] + list(range(300))
    for i, k in enumerate(keys):
        s.add(k, (i % 13) + 1)
    hs = np.array([key_hash(k) for k in keys], dtype=np.uint64)
    vec = s.estimate_many(hs)
    assert [int(v) for v in vec] == [s.estimate(k) for k in keys]
    c = s.compress()
    vec_c = c.estimate_many(hs)
    assert [int(v) for v in vec_c] == [c.estimate(k) for k in keys]
