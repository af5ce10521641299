"""Merge-on-read path: delta accumulation, fold, CoW equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.apply import apply_batch, create_pages_table
from aus_land_data_etl_spark.cdc.generator import generate_events
from aus_land_data_etl_spark.lake.merge import compact, fold_deltas, read_current


@pytest.fixture(scope="module")
def events(spark):
    return generate_events(spark, 3000, seed=55).cache()


def _fp(df):
    cols = ["url", "warc_ts", "event_id", "text", "lang", "fetch_status"]
    r = df.select(
        F.bit_xor(F.xxhash64(*[F.col(c).cast("string") for c in cols])).alias("h"),
        F.count("*").alias("n"),
    ).collect()[0]
    return (r["h"] or 0, r["n"])


def _batches(events, n):
    return [events.filter(F.pmod(F.xxhash64("event_id"), F.lit(n)) == i) for i in range(n)]


def _sel(df):
    return df.select("url", "warc_ts", "event_id", "text", "lang", "fetch_status")


def test_mor_equals_cow(spark, events, tmp_path_factory):
    fps = {}
    for mode in ("cow", "mor"):
        d = str(tmp_path_factory.mktemp(f"tbl_{mode}"))
        t = create_pages_table(spark, d, n_buckets=4)
        for i, b in enumerate(_batches(events, 4)):
            apply_batch(t, b, epoch=i, mode=mode, compact_depth=100)
        fps[mode] = _fp(_sel(read_current(t)))
    assert fps["cow"] == fps["mor"]


def test_mor_delta_accumulation_and_fold(spark, events, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tbl_fold"))
    t = create_pages_table(spark, d, n_buckets=4)
    for i, b in enumerate(_batches(events, 3)):
        apply_batch(t, b, epoch=i, mode="mor", compact_depth=100)
    assert t.max_delta_depth() == 3  # one delta layer per epoch
    before = _fp(_sel(read_current(t)))
    fold_deltas(t, "event_id")
    assert t.max_delta_depth() == 0
    assert _fp(_sel(read_current(t))) == before  # fold preserves state
    # folded base keeps tombstones until full compact
    assert t.read(include_deltas=False).filter(F.col("is_deleted")).count() > 0
    compact(t)
    assert t.read().filter(F.col("is_deleted")).count() == 0
    assert _fp(_sel(read_current(t))) == before


def test_mor_auto_compact_trigger(spark, events, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tbl_auto"))
    t = create_pages_table(spark, d, n_buckets=4)
    for i, b in enumerate(_batches(events, 4)):
        apply_batch(t, b, epoch=i, mode="mor", compact_depth=2)
    # with depth 2 the stack can never stay ≥ 2 after an apply
    assert t.max_delta_depth() < 2


def test_mor_replay_epoch_noop(spark, events, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tbl_replay"))
    t = create_pages_table(spark, d, n_buckets=4)
    b = _batches(events, 2)
    apply_batch(t, b[0], epoch=0, mode="mor")
    v = t.current_version()
    depth = t.max_delta_depth()
    apply_batch(t, b[0], epoch=0, mode="mor")  # replay
    assert t.current_version() == v
    assert t.max_delta_depth() == depth


def test_mor_tombstone_blocks_late_update(spark, tmp_path_factory):
    import datetime as dt
    from pyspark.sql import Row

    from aus_land_data_etl_spark.cdc.events import EVENT_SCHEMA

    d = str(tmp_path_factory.mktemp("tbl_tomb"))
    t = create_pages_table(spark, d, n_buckets=2)

    def ev(eid, op, ts, html):
        return Row(
            event_id=eid, op=op, url="https://d1.example.com/p/1",
            warc_ts=dt.datetime(2024, 1, 1, 0, 0, ts), html=html, lang=None,
            schema_version=1, payload_extra=None, source_partition=0,
            source_offset=0, source_file="wal/part-0.log", source_pos=0,
        )

    apply_batch(t, spark.createDataFrame([ev("e-del", "delete", 30, None)], EVENT_SCHEMA), epoch=0, mode="mor")
    apply_batch(t, spark.createDataFrame([ev("e-upd", "update", 10, b"<p>old</p>")], EVENT_SCHEMA), epoch=1, mode="mor")
    assert read_current(t).count() == 0
    # fold mid-history, then a newer update resurrects
    fold_deltas(t, "event_id")
    assert read_current(t).count() == 0
    apply_batch(t, spark.createDataFrame([ev("e-new", "update", 50, b"<p>new</p>")], EVENT_SCHEMA), epoch=2, mode="mor")
    cur = read_current(t).collect()
    assert len(cur) == 1 and cur[0]["text"] == "new"
