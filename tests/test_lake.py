"""LakeTable: atomic snapshots, time travel, bucket pruning."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from aus_land_data_etl_spark.lake.table import BUCKET_COL, LakeTable, bucket_expr

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def _mkdf(spark, n, tag):
    return spark.range(n).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("warc_ts"),
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("text"),
    )


def test_create_read_empty(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, "url", "warc_ts", n_buckets=4)
    assert t.current_version() == 0
    assert t.read().count() == 0
    assert t.read().schema == SCHEMA


def test_overwrite_and_time_travel(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, "url", "warc_ts", n_buckets=4)
    t.overwrite(_mkdf(spark, 100, "a"))
    assert t.read().count() == 100
    t.overwrite(_mkdf(spark, 50, "b"))
    assert t.current_version() == 2
    assert t.read().count() == 50
    assert t.read(version=1).count() == 100  # time travel
    assert t.read(version=1).filter(F.col("text").startswith("a")).count() == 100


def test_bucket_pruning_reads_subset(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, "url", "warc_ts", n_buckets=4)
    df = _mkdf(spark, 200, "x")
    t.overwrite(df)
    # every row read via its own bucket must reproduce the full table
    total = 0
    for b in range(4):
        part = t.read(buckets=[b])
        # rows in bucket b must all hash to b
        bad = part.withColumn("b", bucket_expr("url", 4)).filter(F.col("b") != b)
        assert bad.count() == 0
        total += part.count()
    assert total == 200
    # pruned read touches fewer files than a full read
    snap = t.snapshot()
    assert len(snap.bucket_files) == 4


def test_commit_buckets_copy_on_write(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, "url", "warc_ts", n_buckets=4)
    t.overwrite(_mkdf(spark, 100, "a"))
    v1 = t.snapshot()
    # replace only bucket 0 with an empty set (delete all its rows)
    empty = spark.createDataFrame([], SCHEMA).withColumn(
        BUCKET_COL, F.lit(0).cast("int")
    )
    t.commit_buckets(empty, touched_buckets=[0])
    v2 = t.snapshot()
    assert "0" not in v2.bucket_files
    # other buckets' files are untouched (no rewrite)
    for b in ("1", "2", "3"):
        assert v2.bucket_files[b] == v1.bucket_files[b]


def test_epoch_idempotency(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, SCHEMA, "url", "warc_ts", n_buckets=2)
    df = _mkdf(spark, 10, "a").withColumn(BUCKET_COL, bucket_expr("url", 2))
    v = t.commit_buckets(df, touched_buckets=[0, 1], epoch_id="e1")
    v2 = t.commit_buckets(df, touched_buckets=[0, 1], epoch_id="e1")
    assert v == v2  # second commit is a no-op
    assert t.snapshot().committed_epochs == ["e1"]
