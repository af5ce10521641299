"""Bucket-count evolution (LakeTable.rebucket)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.apply import apply_batch, create_pages_table
from aus_land_data_etl_spark.cdc.generator import generate_events
from aus_land_data_etl_spark.lake.changelog import read_changes
from aus_land_data_etl_spark.lake.merge import read_current


def _state(table):
    return sorted(
        (r["url"], str(r["warc_ts"]), r["event_id"])
        for r in read_current(table).select("url", "warc_ts", "event_id").collect()
    )


def test_rebucket_preserves_state_and_replay_guard(spark, tmp_table_dir):
    t = create_pages_table(spark, tmp_table_dir, n_buckets=4)
    ev = generate_events(spark, 3000, seed=13, n_source_partitions=2)
    for i in range(3):
        apply_batch(
            t, ev.filter(F.pmod(F.col("source_pos"), F.lit(3)) == i),
            epoch=i, wal_offsets=True,
        )
    before = _state(t)
    v_before = t.current_version()

    v_re = t.rebucket(16)
    snap = t.snapshot()
    assert snap.n_buckets == 16 and v_re > v_before
    assert not snap.delta_files  # rewrite folded all deltas
    assert _state(t) == before

    # replay protection survives: a pre-rebucket batch is still a no-op
    v0 = t.current_version()
    apply_batch(
        t, ev.filter(F.pmod(F.col("source_pos"), F.lit(3)) == 0),
        epoch=0, wal_offsets=True,
    )
    assert t.current_version() == v0

    # new batches apply into the new layout and converge
    late = ev.filter(F.pmod(F.col("source_pos"), F.lit(3)) == 1).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")
    )
    apply_batch(t, late, epoch=99, wal_offsets=False)
    assert read_current(t).count() == len(before)

    # earlier snapshots stay readable under their own layout
    old = t.read_resolved(version=v_before)
    assert old.count() >= len(before)


def test_rebucket_is_content_noop_in_changelog(spark, tmp_table_dir):
    t = create_pages_table(spark, tmp_table_dir, n_buckets=4)
    ev = generate_events(spark, 1000, seed=13, n_source_partitions=2)
    apply_batch(t, ev, epoch=0, wal_offsets=True)
    v1 = t.current_version()
    v2 = t.rebucket(8)
    # net diff across a pure rebucket is empty (layout changed, content not)
    assert read_changes(t, v1, v2).count() == 0


def test_rebucket_same_count_noop(spark, tmp_table_dir):
    t = create_pages_table(spark, tmp_table_dir, n_buckets=4)
    ev = generate_events(spark, 500, seed=13)
    apply_batch(t, ev, epoch=0)
    v = t.current_version()
    assert t.rebucket(4) == v
