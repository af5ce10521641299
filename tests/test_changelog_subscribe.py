"""ChangelogSubscription: durable cursor, at-least-once redelivery,
exactly-once sink state, stale-cursor detection, origin bootstrap."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.apply import apply_batch, create_pages_table
from aus_land_data_etl_spark.cdc.generator import generate_events
from aus_land_data_etl_spark.lake.changelog import (
    ChangelogSubscription,
    StaleCursorError,
)
from aus_land_data_etl_spark.lake.merge import read_current


@pytest.fixture()
def fed_table(spark, tmp_table_dir):
    t = create_pages_table(spark, tmp_table_dir, n_buckets=4)
    ev = generate_events(spark, 600, seed=21).localCheckpoint(eager=True)
    batches = [
        ev.filter(F.pmod(F.col("source_pos"), F.lit(3)) == i) for i in range(3)
    ]
    return t, batches


def _cursor(d):
    return os.path.join(d, "_subscribers", "mirror.json")


def test_poll_ack_cycle_and_empty_poll(spark, fed_table, tmp_table_dir):
    t, batches = fed_table
    apply_batch(t, batches[0], epoch=0)
    sub = ChangelogSubscription(t, _cursor(tmp_table_dir))  # start_at=current
    assert sub.poll() is None  # nothing since subscribe
    apply_batch(t, batches[1], epoch=1)
    got = sub.poll()
    assert got is not None
    df, target = got
    assert target == t.current_version()
    n = df.count()
    assert n > 0
    # unacked: redelivery returns the same interval (deterministic)
    df2, target2 = sub.poll()
    assert target2 == target and df2.count() == n
    sub.ack(target)
    assert sub.poll() is None


def test_cursor_survives_restart_and_refuses_rewind(spark, fed_table, tmp_table_dir):
    t, batches = fed_table
    apply_batch(t, batches[0], epoch=0)
    sub = ChangelogSubscription(t, _cursor(tmp_table_dir))
    apply_batch(t, batches[1], epoch=1)
    _, target = sub.poll()
    sub.ack(target)
    # a fresh instance on the same cursor file resumes, not restarts
    sub2 = ChangelogSubscription(t, _cursor(tmp_table_dir))
    assert sub2.position == target
    assert sub2.poll() is None
    with pytest.raises(ValueError, match="behind cursor"):
        sub2.ack(target - 1)


def test_stale_cursor_raises_not_partial(spark, fed_table, tmp_table_dir):
    t, batches = fed_table
    apply_batch(t, batches[0], epoch=0)
    sub = ChangelogSubscription(t, _cursor(tmp_table_dir))
    for i in (1, 2):
        apply_batch(t, batches[i], epoch=i)
    t.expire_snapshots(keep_last=1)  # drops the subscriber's version
    with pytest.raises(StaleCursorError, match="re-bootstrap"):
        sub.poll()


def test_origin_bootstrap_then_incremental(spark, fed_table, tmp_table_dir):
    t, batches = fed_table
    apply_batch(t, batches[0], epoch=0)
    apply_batch(t, batches[1], epoch=1)
    sub = ChangelogSubscription(
        t, _cursor(tmp_table_dir), start_at="origin"
    )
    assert sub.position is None
    df, target = sub.poll()
    live = read_current(t)
    assert df.count() == live.count()
    assert set(r["change_type"] for r in df.select("change_type").distinct().collect()) == {"insert"}
    sub.ack(target)
    # incremental from here on
    apply_batch(t, batches[2], epoch=2)
    df2, t2 = sub.poll()
    assert t2 > target and df2.count() > 0


def test_mirror_converges_via_process_once(spark, fed_table, tmp_table_dir):
    """End-to-end: a consumer mirror built ONLY from subscription batches
    equals the table's live view — including across an unacked crash
    redelivery."""
    t, batches = fed_table
    sub = ChangelogSubscription(t, _cursor(tmp_table_dir), start_at="origin")
    mirror: dict = {}

    def sink(df, target):
        for r in df.collect():
            if r["change_type"] == "delete":
                mirror.pop(r["url"], None)
            else:
                mirror[r["url"]] = (r["warc_ts"], r["event_id"])

    for i, b in enumerate(batches):
        apply_batch(t, b, epoch=i)
        if i == 1:
            # crash before ack: poll, apply to sink, DON'T ack
            df, _tv = sub.poll()
            sink(df, _tv)  # sink applied twice for this interval
        sub.process_once(sink)
    want = {
        r["url"]: (r["warc_ts"], r["event_id"])
        for r in read_current(t).collect()
    }
    assert mirror == want
