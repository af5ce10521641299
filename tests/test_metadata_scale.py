"""Commit-metadata scale contract: the snapshot descriptor is O(1) in
epoch count (VERDICT r1 task 2).

- lineage manifests are spilled to parquet files, never inline;
- the exactly-once guard is a bounded recent-epoch window plus offset
  high-watermarks, so the descriptor stops growing while replays of
  epochs far older than the window are still skipped (watermark path);
- crash-orphaned manifest files (version above the pointer) are invisible.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.apply import (
    apply_batch,
    create_pages_table,
    prepare_batch,
)
from aus_land_data_etl_spark.cdc.generator import generate_events
from aus_land_data_etl_spark.lake import table as table_mod
from aus_land_data_etl_spark.lake.merge import read_current

N = 1600
N_BATCHES = 16
WINDOW = 8


@pytest.fixture()
def tmp_table_dir():
    d = tempfile.mkdtemp(prefix="meta_scale_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _range_batches(events, n_batches):
    """Contiguous WAL-position chunks — dense offsets per source partition,
    exactly what a binlog shipper delivers."""
    per = N // n_batches
    return [
        events.filter(
            (F.col("source_pos") >= i * per) & (F.col("source_pos") < (i + 1) * per)
        )
        for i in range(n_batches)
    ]


def _fingerprint(df):
    return (
        df.select(
            F.expr(
                "bit_xor(xxhash64(url, cast(warc_ts as string), event_id))"
            ).alias("h")
        ).collect()[0]["h"]
    )


def test_descriptor_o1_in_epochs_and_watermark_replay(
    spark, tmp_table_dir, monkeypatch
):
    monkeypatch.setattr(table_mod, "RECENT_EPOCH_WINDOW", WINDOW)
    events = generate_events(spark, N, seed=21).localCheckpoint(eager=True)
    batches = _range_batches(events, N_BATCHES)
    table = create_pages_table(spark, tmp_table_dir, n_buckets=8)

    sizes = {}
    for i, b in enumerate(batches):
        apply_batch(table, b, epoch=i, compact_depth=4, wal_offsets=True)
        if i + 1 in (N_BATCHES // 2, N_BATCHES):
            sizes[i + 1] = len(table.snapshot().to_json())

    snap = table.snapshot()
    # bounded window (each batch records 2 keys: epoch id + content key)
    assert len(snap.recent_epochs) <= WINDOW
    # watermarks advanced for every source partition (dense WAL ranges)
    assert len(snap.watermarks) == 8
    assert all(w >= 0 for w in snap.watermarks.values())
    # descriptor size is flat between epoch 8 and epoch 16 (both are
    # post-fold states with compact_depth=4): O(1) in epoch count
    lo, hi = sizes[N_BATCHES // 2], sizes[N_BATCHES]
    assert hi <= lo * 1.15, f"descriptor grew with epochs: {lo} -> {hi}"

    # replay of an epoch far older than the window: watermark skip, no
    # version advance, no state change
    fp_before = _fingerprint(read_current(table))
    v_before = table.current_version()
    apply_batch(table, batches[2], epoch=2, compact_depth=4, wal_offsets=True)
    assert table.current_version() == v_before
    assert _fingerprint(read_current(table)) == fp_before

    # full lineage survives the spill: every epoch, unique per partition,
    # row counts match the prepared batches
    m = table.manifest_df()
    assert m.select("epoch").distinct().count() == N_BATCHES
    assert m.count() == m.select("epoch", "source_partition").distinct().count()
    total = sum(prepare_batch(b).count() for b in batches)
    assert m.agg(F.sum("row_count")).collect()[0][0] == total

    # a manifest file no descriptor references (crash orphan, or a
    # committer that lost the descriptor race) is invisible
    orphan_src = sorted(os.listdir(table._manifest_dir))[0]
    shutil.copyfile(
        os.path.join(table._manifest_dir, orphan_src),
        os.path.join(table._manifest_dir, "m99999999-deadbeef.parquet"),
    )
    assert m.count() == table.manifest_df().count()
    # ... and expire_snapshots does not reclaim files that may belong to
    # an in-flight commit (version above the pointer)
    table.expire_snapshots(keep_last=1)
    assert "m99999999-deadbeef.parquet" in os.listdir(table._manifest_dir)
    # versioned lineage: an older RETAINED snapshot sees only its own rows
    v = table.current_version()
    assert table.manifest_df(version=v).count() == m.count()


def test_compact_manifests_merges_to_one_file(spark, tmp_table_dir):
    """Manifest compaction (rewrite_manifests analog) is a metadata-only
    commit: the new snapshot references ONE merged file, every lineage
    row survives, versioned reads of the pre-compaction snapshot still
    see their own file set, and expire_snapshots reclaims the inputs
    once no retained descriptor references them."""
    events = generate_events(spark, 400, seed=31).localCheckpoint(eager=True)
    table = create_pages_table(spark, tmp_table_dir, n_buckets=4)
    for i in range(4):
        batch = events.filter(
            (F.col("source_pos") >= i * 100) & (F.col("source_pos") < (i + 1) * 100)
        )
        apply_batch(table, batch, epoch=i, compact_depth=100)
    before = sorted(
        tuple(r) for r in table.manifest_df().collect()
    )
    v_pre = table.current_version()
    assert len(table.snapshot().manifest_files) == 4
    merged = table.compact_manifests()
    assert merged == 3
    assert len(table.snapshot().manifest_files) == 1
    after = sorted(tuple(r) for r in table.manifest_df().collect())
    assert after == before
    # versioned lineage read of the retained pre-compaction snapshot
    pre = sorted(tuple(r) for r in table.manifest_df(version=v_pre).collect())
    assert pre == before
    # inputs reclaimed only once no retained descriptor references them
    table.expire_snapshots(keep_last=1)
    assert len(os.listdir(table._manifest_dir)) == 1
    # idempotent / no-op on a single referenced file
    assert table.compact_manifests() == 0


def test_snapshot_migrates_legacy_descriptor():
    """Descriptors written before the metadata-scale change (inline
    `manifests` rows + unbounded `committed_epochs`) still open: epochs
    land in the bounded recent window, inline rows are carried as
    legacy_manifests (spilled to a referenced file on the next commit),
    and unknown future keys are ignored."""
    import json as _json

    from aus_land_data_etl_spark.lake.table import Snapshot

    rows = [
        {
            "source_partition": 0,
            "start_offset": 0,
            "end_offset": 9,
            "row_count": 10,
            "checksum": "abc",
        }
    ]
    legacy = {
        "version": 3,
        "schema_json": '{"type":"struct","fields":[]}',
        "n_buckets": 4,
        "key_col": "url",
        "version_col": "warc_ts",
        "bucket_files": {},
        "manifests": rows,
        "committed_epochs": ["0", "1", "2"],
        "properties": {},
        "delta_files": {},
        "some_future_key": True,
    }
    snap = Snapshot.from_json(_json.dumps(legacy))
    assert snap.recent_epochs == ["0", "1", "2"]
    assert snap.legacy_manifests == rows
    assert snap.is_applied("1")
    assert not snap.is_applied("99")
    # round-trips through the new serialisation without the legacy keys
    again = Snapshot.from_json(snap.to_json())
    assert again.recent_epochs == snap.recent_epochs
    assert again.legacy_manifests == rows


def test_out_of_order_commits_backfill_watermark(
    spark, tmp_table_dir, monkeypatch
):
    """Round-2 verdict #6: batches committing 1,3,2 must end with
    wm = end(3) — the early-arriving range parks in pending_ranges and
    folds in when the gap closes, so an old replay of ANY of them outside
    the recent-epoch window is a watermark/pending no-op instead of a
    wasted re-apply."""
    monkeypatch.setattr(table_mod, "RECENT_EPOCH_WINDOW", 2)
    events = generate_events(spark, 400, seed=23).localCheckpoint(eager=True)
    per = 100
    batches = [
        events.filter(
            (F.col("source_pos") >= i * per) & (F.col("source_pos") < (i + 1) * per)
        )
        for i in range(4)
    ]
    table = create_pages_table(spark, tmp_table_dir, n_buckets=4)

    apply_batch(table, batches[0], epoch=0, wal_offsets=True)
    apply_batch(table, batches[2], epoch=2, wal_offsets=True)  # ahead of 1
    snap = table.snapshot()
    wm_after_gap = dict(snap.watermarks)
    # batch 2's ranges are parked above the watermark, not folded in
    assert snap.pending_ranges, "out-of-order range should be pending"

    # replay of the parked batch is already a no-op (pending-range path),
    # even though its epoch keys fell out of the 2-entry window
    apply_batch(table, batches[1], epoch=1, wal_offsets=True)  # close gap
    v_mid = table.current_version()
    fp_mid = _fingerprint(read_current(table))
    apply_batch(table, batches[2], epoch=2, wal_offsets=True)
    assert table.current_version() == v_mid, "replay re-applied"
    assert _fingerprint(read_current(table)) == fp_mid

    snap = table.snapshot()
    # the gap-closing commit folded the parked range: wm jumped past BOTH
    assert not snap.pending_ranges
    assert all(
        snap.watermarks[ns] > wm_after_gap.get(ns, -1)
        for ns in snap.watermarks
    )
    # and equals the end of batch 2's span per namespace (dense prefix of
    # batches 0+1+2): replay of batch 1 outside the window is also a no-op
    apply_batch(table, batches[1], epoch=1, wal_offsets=True)
    assert table.current_version() == v_mid


def test_pending_ranges_bounded_under_shuffled_wal():
    """Driver-only: a pathologically shuffled WAL tail (every other range
    missing, then filled) keeps pending_ranges ≤ PENDING_RANGE_MAX per
    namespace, and filling the gaps folds everything into the watermark."""
    from aus_land_data_etl_spark.lake.table import (
        PENDING_RANGE_MAX,
        Snapshot,
    )

    snap = Snapshot(
        version=0, schema_json="{}", n_buckets=4, key_col="url",
        version_col="warc_ts", bucket_files={},
    )

    def commit(s, start, end, epoch):
        m = [{
            "source_partition": 0, "source_file": "w", "epoch": epoch,
            "start_offset": start, "end_offset": end,
            "row_count": end - start + 1, "distinct_offsets": end - start + 1,
        }]
        recent, wm, pend = s.advanced_epoch_state(str(epoch), m)
        return Snapshot(
            version=s.version + 1, schema_json="{}", n_buckets=4,
            key_col="url", version_col="warc_ts", bucket_files={},
            recent_epochs=recent, watermarks=wm, pending_ranges=pend,
        )

    # 200 odd-indexed 10-offset ranges arrive first: all park (bounded)
    for i in range(200):
        lo = (2 * i + 1) * 10
        snap = commit(snap, lo, lo + 9, i)
    assert snap.watermarks.get("w#0", -1) == -1
    assert len(snap.pending_ranges["w#0"]) <= PENDING_RANGE_MAX
    # now the even ranges fill the gaps: watermark sweeps through every
    # range still tracked; overflow-dropped ranges re-apply harmlessly
    for i in range(200):
        lo = (2 * i) * 10
        snap = commit(snap, lo, lo + 9, 1000 + i)
    wm = snap.watermarks["w#0"]
    # everything the bounded set could retain folds in; the watermark
    # must at least cover the PENDING_RANGE_MAX retained odd ranges
    assert wm >= (2 * PENDING_RANGE_MAX) * 10 - 1
    assert len(snap.pending_ranges.get("w#0", [])) <= PENDING_RANGE_MAX
