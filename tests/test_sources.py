"""Custom Python DataSource (synthetic event generator): batch + stream."""
from __future__ import annotations

import time

from pyspark.sql import functions as F

from tests.conftest import compare_frames


def _agg(df):
    return (df.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.sum("amount_cents").cast("bigint").alias("amount_cents"),
                 F.countDistinct("user_id").cast("bigint").alias("n_users"))
            .orderBy("event_type"))


def test_batch_source_matches_generate_series_oracle(spark, duck):
    from snappy_aqp_spark.sources import (register_synthetic_source,
                                          synthetic_agg_oracle_sql)
    register_synthetic_source(spark)
    df = (spark.read.format("synthetic_events")
          .option("rows", "20000").option("seed", "7")
          .option("numPartitions", "5").load())
    assert df.rdd.getNumPartitions() == 5      # partitions() drives reads
    compare_frames(_agg(df), duck.sql(synthetic_agg_oracle_sql(20000, 7)))


def test_stream_source_drains_to_batch_answer(spark, duck, tmp_path):
    """The micro-batch stream reader regenerates exact [start, end) offset
    slices; draining the bounded feed equals the batch generation."""
    from snappy_aqp_spark.sources import (register_synthetic_source,
                                          synthetic_agg_oracle_sql)
    register_synthetic_source(spark)
    stream = (spark.readStream.format("synthetic_events")
              .option("rows", "3000").option("rowsPerBatch", "1100")
              .option("seed", "42").load())
    q = (stream.writeStream.outputMode("append").format("memory")
         .queryName("syn_test_sink")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="200 milliseconds").start())
    t0 = time.time()
    while time.time() - t0 < 120:
        if spark.table("syn_test_sink").count() >= 3000:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    assert spark.table("syn_test_sink").count() == 3000   # no dup/loss
    compare_frames(_agg(spark.table("syn_test_sink")),
                   duck.sql(synthetic_agg_oracle_sql(3000, 42)))
