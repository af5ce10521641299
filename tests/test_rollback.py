"""Snapshot rollback + named tags (Iceberg rollback_to_snapshot / tag
analogs): metadata-only state restore, exactly-once replay semantics
after rollback, tag-anchored retention, and the changelog's undo diff.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.apply import apply_batch, create_pages_table
from aus_land_data_etl_spark.cdc.generator import generate_events
from aus_land_data_etl_spark.lake.changelog import _live_view, read_changes
from aus_land_data_etl_spark.lake.merge import read_current

COLS = ["url", "warc_ts", "event_id", "text"]


def _state(t):
    return sorted(map(tuple, read_current(t).select(*COLS).collect()))


@pytest.fixture()
def staged(spark, tmp_table_dir):
    """Table after 2 epochs, plus the remaining 2 batches unapplied."""
    t = create_pages_table(spark, tmp_table_dir, n_buckets=4)
    ev = generate_events(spark, 1200, seed=13).localCheckpoint(eager=True)
    batches = [
        ev.filter(F.pmod(F.col("source_pos"), F.lit(4)) == i) for i in range(4)
    ]
    for i in (0, 1):
        apply_batch(t, batches[i], epoch=i)
    return t, batches


def test_rollback_is_metadata_only_and_restores_state(spark, staged):
    t, batches = staged
    v_good = t.current_version()
    good = _state(t)
    good_snap = t.snapshot(v_good)

    apply_batch(t, batches[2], epoch=2)
    assert _state(t) != good

    v_new = t.rollback_to(v_good)
    assert v_new == t.current_version() > v_good
    assert _state(t) == good

    # metadata-only: the new descriptor re-references the OLD files —
    # no data was rewritten
    snap = t.snapshot(v_new)
    assert snap.bucket_files == good_snap.bucket_files
    assert snap.delta_files == good_snap.delta_files
    assert snap.n_buckets == good_snap.n_buckets
    # the bad version stays time-travelable until retention drops it
    assert t.snapshot(v_good + 1).version == v_good + 1


def test_replay_after_rollback_reapplies_and_reconverges(spark, staged):
    """Rollback restores the exactly-once state too: the rolled-back
    epoch is no longer 'applied', replays, and reconverges to the exact
    pre-rollback state — the recover-from-bad-deploy flow."""
    t, batches = staged
    v_good = t.current_version()
    apply_batch(t, batches[2], epoch=2)
    want = _state(t)
    v_before = t.current_version()

    t.rollback_to(v_good)
    # restored watermarks/epoch window ⇒ not applied ⇒ really re-applies
    apply_batch(t, batches[2], epoch=2)
    assert t.current_version() > v_before  # advanced, not skipped
    assert _state(t) == want


def test_tag_anchors_retention_and_rollback(spark, staged):
    t, batches = staged
    v_anchor = t.tag("post-backfill")
    anchor = _state(t)
    for i in (2, 3):
        apply_batch(t, batches[i], epoch=i)
    t.expire_snapshots(keep_last=1)

    # untagged history is gone, the tagged descriptor survives
    with pytest.raises(FileNotFoundError):
        t.snapshot(v_anchor + 1)
    assert t.snapshot(v_anchor).version == v_anchor
    assert t.tags() == {"post-backfill": v_anchor}

    t.rollback_to("post-backfill")
    assert _state(t) == anchor

    t.drop_tag("post-backfill")
    assert t.tags() == {}


def test_tags_work_as_time_travel_refs(spark, staged):
    """Every version-taking surface accepts a tag name: reads, lookups,
    and the changelog diff between two tags."""
    t, batches = staged
    t.tag("t1")
    s1 = _state(t)
    apply_batch(t, batches[2], epoch=2)
    t.tag("t2")

    live_t1 = _live_view(t, "t1", None, "event_id", COLS)
    assert sorted(map(tuple, live_t1.collect())) == s1
    url = live_t1.select("url").orderBy("url").first()["url"]
    assert t.lookup(url, version="t1").count() == 1

    ch = read_changes(t, "t1", "t2")
    assert ch.count() > 0
    assert sorted(map(tuple, ch.collect())) == sorted(
        map(tuple, read_changes(t, t.resolve_ref("t1"), t.resolve_ref("t2")).collect())
    )


def test_tag_validation_and_duplicates(spark, staged):
    t, _ = staged
    with pytest.raises(ValueError):
        t.tag("bad name")
    with pytest.raises(FileNotFoundError):
        t.tag("ghost", version=99)
    t.tag("a")
    with pytest.raises(FileExistsError):
        t.tag("a")
    t.tag("a", replace_existing=True)
    with pytest.raises(KeyError):
        t.resolve_ref("nope")
    assert t.rollback_to(t.current_version()) == t.current_version()  # no-op


def test_changelog_emits_undo_diff_across_rollback(spark, staged):
    """The rollback commit is an ordinary changelog interval: patching
    the pre-rollback live view with its net diff reproduces the restored
    state exactly (same contract as any other commit)."""
    t, batches = staged
    v_good = t.current_version()
    apply_batch(t, batches[2], epoch=2)
    v_bad = t.current_version()
    v_rb = t.rollback_to(v_good)

    ch = read_changes(t, v_bad, v_rb)
    live_bad = _live_view(t, v_bad, None, "event_id", COLS)
    live_rb = _live_view(t, v_rb, None, "event_id", COLS)
    touched = ch.select("url").distinct()
    patched = live_bad.join(touched, "url", "left_anti").unionByName(
        ch.filter(F.col("change_type") != "delete").select(*COLS)
    )
    assert sorted(map(tuple, patched.collect())) == sorted(
        map(tuple, live_rb.collect())
    )


def test_rollback_across_rebucket_restores_bucket_count(spark, staged):
    t, batches = staged
    v_good = t.current_version()
    good = _state(t)
    t.rebucket(8)
    apply_batch(t, batches[2], epoch=2)

    t.rollback_to(v_good)
    snap = t.snapshot()
    assert snap.n_buckets == 4
    assert _state(t) == good
    # serving reads agree with the restored bucket layout
    url = read_current(t).select("url").orderBy("url").first()["url"]
    rows = t.lookup(url).collect()
    assert len(rows) == 1 and rows[0]["url"] == url


def test_subscription_mirror_reconverges_across_rollback(
    spark, staged, tmp_table_dir
):
    """A durable changelog subscriber that consumed the bad commits
    receives the rollback as an ordinary net-diff interval: applying it
    to the mirror reconverges the mirror to the restored state — no
    re-bootstrap, no stale cursor."""
    from aus_land_data_etl_spark.lake.changelog import ChangelogSubscription

    t, batches = staged
    cursor = os.path.join(tmp_table_dir, "_subscribers", "m.json")
    sub = ChangelogSubscription(t, cursor, start_at="origin")

    mirror: dict[str, tuple] = {}

    def consume():
        got = sub.poll()
        if got is None:
            return
        df, target = got
        for r in df.collect():
            if r["change_type"] == "delete":
                mirror.pop(r["url"], None)
            else:
                mirror[r["url"]] = (r["warc_ts"], r["event_id"], r["text"])
        sub.ack(target)

    consume()  # the two staged epochs
    v_good = t.current_version()
    apply_batch(t, batches[2], epoch=2)
    consume()  # the bad epoch
    t.rollback_to(v_good)
    consume()  # the undo interval

    want = {
        r["url"]: (r["warc_ts"], r["event_id"], r["text"])
        for r in read_current(t).collect()
    }
    assert mirror == want


def test_agg_view_refresh_across_rollback(spark, staged, tmp_path):
    """An incremental aggregate view refreshed across a rollback interval
    must retract the undone contributions (the undo diff flows through
    the same preimage/postimage algebra as any interval) and keep
    matching a full recompute — through the rollback AND the subsequent
    replay of the rolled-back batch."""
    from aus_land_data_etl_spark.lake.incremental import (
        AggSpec,
        AggView,
        full_compute,
    )

    t, batches = staged
    view = AggView.create(
        spark,
        str(tmp_path / "mv"),
        t,
        keys=["grp"],
        aggs=[
            AggSpec("n_pages", "count"),
            AggSpec("sum_len", "sum", "text_len"),
        ],
        derived={"grp": "pmod(xxhash64(url), 5)", "text_len": "length(text)"},
        n_buckets=2,
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    view.refresh()
    assert rows(view.read()) == rows(full_compute(view))
    v_good = t.current_version()

    apply_batch(t, batches[2], epoch=2)
    view.refresh()
    assert rows(view.read()) == rows(full_compute(view))

    t.rollback_to(v_good)
    view.refresh()  # the undo interval retracts batch 2's contributions
    assert rows(view.read()) == rows(full_compute(view))

    apply_batch(t, batches[2], epoch=2)  # replay after rollback
    view.refresh()
    assert rows(view.read()) == rows(full_compute(view))
    assert view.refreshed_through() == t.current_version()


def test_vacuum_spares_files_made_live_by_rollback(spark, staged, tmp_table_dir):
    """Files referenced only by a rollback target must survive vacuum:
    liveness comes from on-disk descriptors, and rollback re-references
    them in the NEW current descriptor."""
    t, batches = staged
    v_good = t.current_version()
    good = _state(t)
    apply_batch(t, batches[2], epoch=2)
    t.rollback_to(v_good)
    snap = t.snapshot()
    referenced = {
        f for fs in snap.bucket_files.values() for f in fs
    } | {f for fs in snap.delta_files.values() for f in fs}
    t.vacuum_orphans(grace_seconds=0.0)  # may reclaim true orphans
    for rel in referenced:
        assert os.path.exists(os.path.join(t.root, rel)), rel
    assert _state(t) == good  # still fully readable after the sweep
