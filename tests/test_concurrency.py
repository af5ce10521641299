"""Optimistic-concurrency commit loop (Iceberg-style): a delta commit
that loses the descriptor O_EXCL race rebases its metadata on the
winner's snapshot and retries — data files are written once and
re-referenced, the racer's state (epochs, watermarks, schema) survives.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.apply import apply_batch, create_pages_table
from aus_land_data_etl_spark.cdc.generator import generate_events
from aus_land_data_etl_spark.lake.merge import read_current
from aus_land_data_etl_spark.lake.table import ConflictError, LakeTable


@pytest.fixture()
def tmp_table_dir():
    d = tempfile.mkdtemp(prefix="conc_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _seg(events, i, n=4):
    return events.filter(F.pmod(F.col("source_pos"), F.lit(n)) == i)


def _race_once(monkeypatch, loser_table, racer_commit):
    """Arrange for ``racer_commit`` to land between the loser's snapshot
    read and its descriptor write — the first _write_snapshot call on
    ``loser_table`` triggers the racer, then proceeds (and collides)."""
    orig = LakeTable._write_snapshot
    state = {"armed": True}

    def interposed(self, snap):
        if self is loser_table and state["armed"]:
            state["armed"] = False
            racer_commit()
        return orig(self, snap)

    monkeypatch.setattr(LakeTable, "_write_snapshot", interposed)
    return state


def test_delta_commit_rebases_after_losing_race(spark, tmp_table_dir, monkeypatch):
    events = generate_events(spark, 800, seed=31).localCheckpoint(eager=True)
    t1 = create_pages_table(spark, tmp_table_dir, n_buckets=4)
    apply_batch(t1, _seg(events, 0), epoch=0, compact_depth=99)
    t2 = LakeTable(spark, tmp_table_dir)

    _race_once(
        monkeypatch,
        t1,
        lambda: apply_batch(t2, _seg(events, 2), epoch=2, compact_depth=99),
    )
    apply_batch(t1, _seg(events, 1), epoch=1, compact_depth=99)

    snap = t1.snapshot()
    # both the racer's and the rebased committer's batches are in
    assert {"0", "1", "2"} <= set(snap.recent_epochs)
    expected = (
        _seg(events, 0).unionByName(_seg(events, 1)).unionByName(_seg(events, 2))
    )
    from aus_land_data_etl_spark.cdc.apply import prepare_batch
    from aus_land_data_etl_spark.operators.dedup import lww_latest

    want = lww_latest(
        prepare_batch(expected), "url", version_cols=["warc_ts", "event_id"]
    ).filter(F.col("op") != "delete")
    assert read_current(t1).count() == want.count()
    # replay of either racer or loser batch is still a no-op
    v = t1.current_version()
    apply_batch(t1, _seg(events, 1), epoch=1, compact_depth=99)
    apply_batch(t1, _seg(events, 2), epoch=2, compact_depth=99)
    assert t1.current_version() == v


def test_race_on_identical_batch_is_exactly_once(spark, tmp_table_dir, monkeypatch):
    """The racer applies the SAME batch content: the loser's retry must
    recognise it via the content key and no-op instead of double-applying."""
    events = generate_events(spark, 400, seed=32).localCheckpoint(eager=True)
    t1 = create_pages_table(spark, tmp_table_dir, n_buckets=4)
    apply_batch(t1, _seg(events, 0), epoch=0, compact_depth=99)
    t2 = LakeTable(spark, tmp_table_dir)

    _race_once(
        monkeypatch,
        t1,
        lambda: apply_batch(t2, _seg(events, 1), epoch=1, compact_depth=99),
    )
    apply_batch(t1, _seg(events, 1), epoch=1, compact_depth=99)

    snap = t1.snapshot()
    # exactly one commit for the shared batch: the loser returned the
    # racer's version instead of stacking a duplicate delta
    n_delta_files = sum(len(v) for v in snap.delta_files.values())
    assert snap.version == 2  # epoch0 commit + one commit for the race pair
    from aus_land_data_etl_spark.cdc.apply import prepare_batch
    from aus_land_data_etl_spark.operators.dedup import lww_latest

    want = lww_latest(
        prepare_batch(_seg(events, 0).unionByName(_seg(events, 1))),
        "url",
        version_cols=["warc_ts", "event_id"],
    ).filter(F.col("op") != "delete")
    assert read_current(t1).count() == want.count()
    assert n_delta_files > 0


def test_rebucket_mid_commit(spark, tmp_table_dir, monkeypatch):
    """Rebucket landing mid-commit: a FANOUT delta (no bucket column —
    rows cluster at fold time under whatever layout is then current)
    rebases cleanly; a PRE-BUCKETED delta, whose files are keyed to the
    old layout, must refuse (ConflictError) rather than mis-bucket."""
    from aus_land_data_etl_spark.cdc.apply import prepare_batch
    from aus_land_data_etl_spark.lake.merge import delta_merge_into

    events = generate_events(spark, 400, seed=33).localCheckpoint(eager=True)
    t1 = create_pages_table(spark, tmp_table_dir, n_buckets=4)
    apply_batch(t1, _seg(events, 0), epoch=0, compact_depth=99)
    t2 = LakeTable(spark, tmp_table_dir)

    # fanout path: rebases onto the new layout and still converges
    _race_once(monkeypatch, t1, lambda: t2.rebucket(8))
    apply_batch(t1, _seg(events, 1), epoch=1, compact_depth=99)
    snap = t1.snapshot()
    assert snap.n_buckets == 8 and "1" in snap.recent_epochs
    from aus_land_data_etl_spark.operators.dedup import lww_latest

    want = lww_latest(
        prepare_batch(_seg(events, 0).unionByName(_seg(events, 1))),
        "url",
        version_cols=["warc_ts", "event_id"],
    ).filter(F.col("op") != "delete")
    assert read_current(t1).count() == want.count()

    # pre-bucketed path: layout changed under us -> refuse
    monkeypatch.undo()
    _race_once(monkeypatch, t1, lambda: t2.rebucket(16))
    with pytest.raises(ConflictError, match="bucket layout"):
        delta_merge_into(
            t1,
            prepare_batch(_seg(events, 2)),
            tiebreak_col="event_id",
            epoch_id="2",
            fanout=False,
            compact_depth=99,
        )
    # the table itself is fine: re-applying against the new layout works
    apply_batch(t1, _seg(events, 2), epoch=2, compact_depth=99)
    assert t1.snapshot().n_buckets == 16


def test_commit_refuses_stale_planning_snapshot(spark, tmp_table_dir):
    """Lost-update guard (round-5 review): a rewrite planned against
    snapshot v must NOT commit if a delta landed in a touched bucket
    while its planning jobs (e.g. the z-order quantile pass) ran — even
    though no descriptor race occurs.  commit_buckets(computed_from=v)
    raises ConflictError instead of silently popping the unread delta,
    and a re-run against the fresh snapshot keeps the late rows."""
    import datetime as dt

    from pyspark.sql import types as T

    from aus_land_data_etl_spark.lake.merge import delta_merge_into, read_current
    from aus_land_data_etl_spark.lake.table import BUCKET_COL, bucket_expr
    from aus_land_data_etl_spark.lake.zorder import cluster_zorder_buckets

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("event_id", T.StringType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )
    t = LakeTable.create(
        spark, tmp_table_dir, schema=schema, key_col="url",
        version_col="warc_ts", n_buckets=2,
        properties={"stats_cols": ["warc_ts"]},
    )
    rows = [
        (f"u{i}", dt.datetime(2024, 1, 1, 0, 0, i % 50), f"e{i}", f"t{i}")
        for i in range(40)
    ]
    t.overwrite(spark.createDataFrame(rows, schema))
    planning_snap = t.snapshot()  # the rewrite "reads" here

    # a concurrent writer lands a delta while the planning jobs run
    late = spark.createDataFrame(
        [("u1", dt.datetime(2024, 1, 2), "e-late", "late-win")], schema
    ).withColumn("op", F.lit("update"))
    delta_merge_into(t, late, "event_id", compact_depth=100, fanout=False)

    # the stale rewrite: resolved rows FROM the planning snapshot
    resolved = t.read(version=planning_snap.version).withColumn(
        BUCKET_COL, bucket_expr("url", planning_snap.n_buckets)
    )
    with pytest.raises(ConflictError, match="read snapshot"):
        t.commit_buckets(
            resolved,
            touched_buckets=[0, 1],
            pre_bucketed=True,
            computed_from=planning_snap,
        )
    # nothing lost: the late row still wins
    winner = {r["url"]: r["text"] for r in read_current(t, "event_id").collect()}
    assert winner["u1"] == "late-win"

    # and the maintenance entrypoint re-planned against the fresh
    # snapshot succeeds, preserving the late row
    cluster_zorder_buckets(t, ["warc_ts"], min_files=1, files_per_bucket=2)
    winner = {r["url"]: r["text"] for r in read_current(t, "event_id").collect()}
    assert winner["u1"] == "late-win"


def test_publish_race_one_wins_one_conflicts(spark, tmp_table_dir, monkeypatch):
    """Two branches forked at the same main version race their
    publishes: the interposed racer lands first; the loser surfaces
    ConflictError (its audit ran against a superseded base), main holds
    exactly the winner's state, and the losing branch SURVIVES so its
    staged work can re-fork and replay."""
    events = generate_events(spark, 800, seed=33).localCheckpoint(eager=True)
    t1 = create_pages_table(spark, tmp_table_dir, n_buckets=4)
    apply_batch(t1, _seg(events, 0), epoch=0)
    t2 = LakeTable(spark, tmp_table_dir)

    b1 = t1.create_branch("p1")
    b2 = t2.create_branch("p2")
    apply_batch(b1, _seg(events, 1), epoch=1)
    apply_batch(b2, _seg(events, 2), epoch=2)
    winner_state = sorted(
        map(tuple, read_current(b2).select("url", "event_id").collect())
    )

    _race_once(monkeypatch, t1, lambda: t2.publish_branch("p2"))
    with pytest.raises(ConflictError, match="re-fork"):
        t1.publish_branch("p1")

    # main is exactly the winner's publish; the loser's branch survives
    assert sorted(
        map(tuple, read_current(t1).select("url", "event_id").collect())
    ) == winner_state
    assert set(t1.list_branches()) == {"p1"}

    # recovery: re-fork from the new main, replay, publish
    t1.drop_branch("p1")
    b1b = t1.create_branch("p1")
    apply_batch(b1b, _seg(events, 1), epoch=1)
    t1.publish_branch("p1")
    assert set(t1.snapshot().recent_epochs) >= {"0", "1", "2"}
