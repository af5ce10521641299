"""Orphan-file vacuum (Iceberg remove_orphan_files analog).

``expire_snapshots`` handles retention; ``vacuum_orphans`` handles
*failures*: data/manifest files written by committers that lost the
descriptor O_EXCL race and never rebased, crash leftovers, and
descriptor-staging tmp files — all age-gated so in-flight commits are
never touched.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.apply import apply_batch, create_pages_table
from aus_land_data_etl_spark.cdc.generator import generate_events
from aus_land_data_etl_spark.lake.merge import read_current
from aus_land_data_etl_spark.lake.table import LakeTable


def _age(path: str, seconds: float = 7200.0) -> None:
    old = time.time() - seconds
    for base, dirs, files in os.walk(path):
        for n in files + dirs:
            os.utime(os.path.join(base, n), (old, old))
    os.utime(path, (old, old))


def _build(spark, d, epochs=2):
    t = create_pages_table(spark, d, n_buckets=4)
    ev = generate_events(spark, 400, seed=7).localCheckpoint(eager=True)
    for i in range(epochs):
        apply_batch(
            t,
            ev.filter(F.pmod(F.col("source_pos"), F.lit(epochs)) == i),
            epoch=i,
            compact_depth=99,
        )
    return t


def test_vacuum_removes_aged_orphans_keeps_live(spark, tmp_table_dir):
    t = _build(spark, tmp_table_dir)
    before = read_current(t).count()

    # a loser racer's abandoned data dir: real parquet, unreferenced
    orphan_dir = os.path.join(tmp_table_dir, "data", "s00000001-deadbeef")
    os.makedirs(os.path.join(orphan_dir, "_bucket=0"))
    spark.range(5).toPandas().to_parquet(
        os.path.join(orphan_dir, "_bucket=0", "part-orphan.parquet")
    )
    # a crash leftover: _SUCCESS-only dir (the retention sweep skips these)
    empty_dir = os.path.join(tmp_table_dir, "data", "s00000002-cafecafe")
    os.makedirs(empty_dir)
    open(os.path.join(empty_dir, "_SUCCESS"), "w").close()
    # a loser's manifest spill and a crashed pointer-swap tmp file
    mdir = os.path.join(tmp_table_dir, "_manifests")
    orphan_manifest = os.path.join(mdir, "m00000009-feedfeedfeed.parquet")
    open(orphan_manifest, "wb").write(b"xx")
    sdir = os.path.join(tmp_table_dir, "_snapshots")
    tmp_file = os.path.join(sdir, "tmpabc123")
    open(tmp_file, "w").write("9")
    for p in (orphan_dir, empty_dir):
        _age(p)
    for p in (orphan_manifest, tmp_file):
        os.utime(p, (time.time() - 7200, time.time() - 7200))

    removed = t.vacuum_orphans(grace_seconds=3600)
    assert removed["data_files"] >= 1
    assert removed["data_dirs"] >= 2
    assert removed["manifests"] == 1
    assert removed["tmp_files"] == 1
    assert not os.path.exists(orphan_dir)
    assert not os.path.exists(empty_dir)
    assert not os.path.exists(orphan_manifest)
    assert not os.path.exists(tmp_file)
    # live table intact, byte-for-byte readable
    assert read_current(t).count() == before
    assert t.manifest_df().count() > 0


def test_vacuum_spares_fresh_unreferenced_files(spark, tmp_table_dir):
    """An unreferenced dir *newer* than the grace window may be an
    in-flight commit (or a rebasing loser about to reference its own
    files at a later version) — it must survive."""
    t = _build(spark, tmp_table_dir)
    inflight = os.path.join(tmp_table_dir, "data", "s00000042-00c0ffee")
    os.makedirs(os.path.join(inflight, "_bucket=1"))
    spark.range(3).toPandas().to_parquet(
        os.path.join(inflight, "_bucket=1", "part-inflight.parquet")
    )
    removed = t.vacuum_orphans(grace_seconds=3600)
    assert removed == {
        "data_files": 0, "data_dirs": 0, "manifests": 0, "tmp_files": 0,
    }
    assert os.path.exists(inflight)


def test_vacuum_after_real_lost_race(spark, tmp_table_dir, monkeypatch):
    """Drive an actual O_EXCL collision where the loser dies before
    rebasing; its already-written data files are on disk, unreferenced.
    After the grace window the vacuum reclaims them; convergence and
    replay idempotence are unaffected."""
    events = generate_events(spark, 400, seed=13).localCheckpoint(eager=True)
    t1 = create_pages_table(spark, tmp_table_dir, n_buckets=4)
    apply_batch(t1, events.filter(F.col("source_pos") % 3 == 0), epoch=0,
                compact_depth=99)
    t2 = LakeTable(spark, tmp_table_dir)

    orig = LakeTable._write_snapshot
    state = {"armed": True}

    class SimulatedCrash(RuntimeError):
        pass

    def die_before_descriptor(self, snap):
        if self is t1 and state["armed"]:
            state["armed"] = False
            apply_batch(
                t2, events.filter(F.col("source_pos") % 3 == 1), epoch=1,
                compact_depth=99,
            )
            # loser's data files are already on disk; it dies before its
            # descriptor attempt — the orphan the vacuum exists for
            raise SimulatedCrash()
        return orig(self, snap)

    monkeypatch.setattr(LakeTable, "_write_snapshot", die_before_descriptor)
    with pytest.raises(SimulatedCrash):
        apply_batch(
            t1, events.filter(F.col("source_pos") % 3 == 2), epoch=2,
            compact_depth=99,
        )
    monkeypatch.setattr(LakeTable, "_write_snapshot", orig)

    data_dir = os.path.join(tmp_table_dir, "data")
    live = set()
    snap = t1.snapshot()
    for fs in snap.bucket_files.values():
        live.update(f.split(os.sep)[1] for f in fs)
    for fs in snap.delta_files.values():
        live.update(f.split(os.sep)[1] for f in fs)
    orphan_dirs = [
        d for d in os.listdir(data_dir)
        if d not in live and os.path.isdir(os.path.join(data_dir, d))
    ]
    # older snapshots still reference some dirs; at least the dead
    # loser's dir must be unreferenced by the CURRENT snapshot
    assert orphan_dirs

    _age(data_dir)  # everything ages past the grace window ...
    removed = t1.vacuum_orphans(grace_seconds=3600)
    # ... but only files no RETAINED descriptor references are vacuumed
    assert removed["data_files"] >= 1
    state_now = {
        r["url"]: r["event_id"] for r in read_current(t1).collect()
    }
    # replaying the racer's batch post-vacuum is still a no-op
    v = t1.current_version()
    apply_batch(t1, events.filter(F.col("source_pos") % 3 == 1), epoch=1,
                compact_depth=99)
    assert t1.current_version() == v
    assert {
        r["url"]: r["event_id"] for r in read_current(t1).collect()
    } == state_now
