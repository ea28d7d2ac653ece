"""Storage-layout operators: bucketed co-located joins, partition pruning.

The reference co-partitions sample tables with their base tables so scans
and joins reuse the base partitioning (ColumnFormatSamplingRelation.scala:
98-100, SampledCachedRDD.scala:36-48). The Spark-first analog is declared
write-time layout; these tests pin BOTH the unchanged answers and the
physical-plan effects (no Exchange below the join; fewer files read).
"""
from __future__ import annotations

from tests.conftest import SF_SMALL, compare_frames


def test_colocated_join_no_exchange_below_join(spark):
    from snappy_aqp_spark.storage import bucketed_tables, exchange_count
    li, od = bucketed_tables(spark, SF_SMALL, n_buckets=4)
    # the bare join: both sides bucketed on the key -> the SortMergeJoin's
    # children already satisfy its required distribution, ZERO Exchange
    j = spark.sql(
        f"SELECT /*+ MERGE(l) */ l.l_orderkey, o.o_orderstatus "
        f"FROM {li} l JOIN {od} o ON l.l_orderkey = o.o_orderkey")
    j.collect()
    assert exchange_count(j) == 0, \
        j._jdf.queryExecution().executedPlan().toString()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan


def test_unbucketed_join_shuffles_both_sides(spark):
    """Control: the same join over plain parquet must shuffle (this is the
    cost bucketing removes)."""
    from snappy_aqp_spark.storage import exchange_count
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    od = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    li.createOrReplaceTempView("__li_plain")
    od.createOrReplaceTempView("__od_plain")
    j = spark.sql(
        "SELECT /*+ MERGE(l) */ l.l_orderkey, o.o_orderstatus "
        "FROM __li_plain l JOIN __od_plain o "
        "ON l.l_orderkey = o.o_orderkey")
    j.collect()
    assert exchange_count(j) == 2


def test_colocated_join_revenue_matches_oracle(spark, duck):
    from snappy_aqp_spark.storage import (colocated_join_oracle_sql,
                                          colocated_join_revenue)
    res = colocated_join_revenue(spark, SF_SMALL)
    compare_frames(res, duck.sql(colocated_join_oracle_sql()))


def test_partition_pruning_reads_fewer_files(spark):
    from snappy_aqp_spark.storage import partitioned_files_read, pruned_scan
    from snappy_aqp_spark.storage.layout import _partitioned_documents
    pruned = pruned_scan(spark, SF_SMALL, ("src3", "src7"))
    n_pruned = partitioned_files_read(pruned)
    full = spark.read.parquet(_partitioned_documents(spark, SF_SMALL))
    n_full = partitioned_files_read(full)
    assert 0 < n_pruned < n_full
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "src3" in plan


def test_partition_pruned_counts_match_oracle(spark, duck):
    from snappy_aqp_spark.storage import (partition_pruned_counts,
                                          partition_pruned_oracle_sql)
    # earlier pipeline tests may shadow the shared duck documents view
    # (duck.register python objects take precedence over catalog views)
    try:
        duck.unregister("documents")
    except Exception:
        pass
    duck.sql("CREATE OR REPLACE VIEW documents AS SELECT * FROM "
             f"read_parquet('{SF_SMALL}/documents.parquet')")
    res = partition_pruned_counts(spark, SF_SMALL)
    compare_frames(res, duck.sql(partition_pruned_oracle_sql()))


def test_zorder_write_prunes_on_both_columns(spark, tmp_path):
    """write_zordered yields files whose footer min/max are narrow on
    EVERY interleaved column — a filter on either prunes most files —
    where a single-column sort only prunes on its own column."""
    from pyspark.sql import functions as F
    from snappy_aqp_spark.pipeline.zorder import (write_zordered,
                                                  zorder_file_stats)
    from tests.conftest import SF_SMALL
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet") \
        .select("event_id", "user_id", "value")

    def mean_span(stats, c):
        rows = stats.collect()
        g_lo = min(r[f"min_{c}"] for r in rows)
        g_hi = max(r[f"max_{c}"] for r in rows)
        g = float(g_hi - g_lo) or 1.0
        return sum(float(r[f"max_{c}"] - r[f"min_{c}"]) for r in rows) \
            / len(rows) / g

    zp = str(tmp_path / "zord")
    write_zordered(spark, ev, ["user_id", "value"], zp, n_files=8)
    zs = zorder_file_stats(spark, zp, ["user_id", "value"])
    assert zs.count() >= 4                    # range exchange made files
    # both dims narrow: each file covers a small hyper-rectangle
    assert mean_span(zs, "user_id") < 0.45
    assert mean_span(zs, "value") < 0.45
    # contrast: single-column sort leaves the OTHER column's spans ~full
    sp = str(tmp_path / "sorted")
    (ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id")
       .write.mode("overwrite").parquet(sp))
    ss = zorder_file_stats(spark, sp, ["user_id", "value"])
    assert mean_span(ss, "user_id") < 0.30    # its own column: great
    # the other column: materially worse than the z-ordered layout
    assert mean_span(ss, "value") > 1.5 * mean_span(zs, "value")
