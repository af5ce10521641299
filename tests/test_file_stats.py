"""Zonemap file stats + predicate file-skipping (lake/stats.py, plan_scan).

Iceberg-parity: per-data-file lower/upper bounds recorded at commit time,
consulted before the scan opens any file.  The tests pin three contracts:

1. stats collection is faithful (footer-only, NULL-aware, carried across
   commits, dropped with dead files);
2. pruning is *advisory but sound* — pruned-scan + row filter ==
   full-scan + row filter, always;
3. pruning is *effective* on the CDC hot path — time-banded WAL epochs
   land as MoR delta layers whose warc_ts zonemaps let a time-windowed
   raw scan skip every other epoch's files.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.apply import apply_batch, create_pages_table
from aus_land_data_etl_spark.cdc.generator import generate_events
from aus_land_data_etl_spark.lake.merge import fold_deltas, read_current
from aus_land_data_etl_spark.lake.stats import (
    collect_file_stats,
    prune_files,
)
from aus_land_data_etl_spark.lake.table import _stats_bearing_timestamps


@pytest.fixture(scope="module")
def events(spark):
    return generate_events(spark, 4000, seed=77).cache()


def _time_bands(events, n):
    """Split the stream into n contiguous warc_ts bands (a WAL tail is
    roughly time-ordered, so per-epoch files naturally band by time)."""
    qs = [i / n for i in range(1, n)]
    with_d = events.withColumn("_ts_d", F.col("warc_ts").cast("double"))
    cuts = with_d.approxQuantile("_ts_d", qs, 0.0)
    ts_d = F.col("warc_ts").cast("double")
    bands = []
    lo = None
    for hi in cuts + [None]:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (ts_d > F.lit(lo))
        if hi is not None:
            cond = cond & (ts_d <= F.lit(hi))
        bands.append(events.filter(cond))
        lo = hi
    return bands


# -- 1. collection ----------------------------------------------------------

def test_collect_file_stats_bounds_and_nulls(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "en", dt.datetime(2024, 1, 1, 0, 0, 0)),
            (5, None, dt.datetime(2024, 1, 3, 0, 0, 0)),
            (3, "de", dt.datetime(2024, 1, 2, 0, 0, 0)),
        ],
        "k long, lang string, ts timestamp",
    ).coalesce(1)
    out = str(tmp_path / "p")
    with _stats_bearing_timestamps(spark):  # INT96 default carries no stats
        df.write.parquet(out)
    import os

    rel = [f for f in os.listdir(out) if f.endswith(".parquet")]
    st = collect_file_stats(out, rel, ["k", "lang", "ts", "missing"])
    e = st[rel[0]]
    assert e["rows"] == 3
    assert e["cols"]["k"] == {"lo": 1, "hi": 5, "nulls": 0}
    assert e["cols"]["lang"]["lo"] == "de" and e["cols"]["lang"]["hi"] == "en"
    assert e["cols"]["lang"]["nulls"] == 1
    assert e["cols"]["ts"]["lo"].startswith("2024-01-01T00:00:00")
    assert e["cols"]["ts"]["hi"].startswith("2024-01-03T00:00:00")
    assert "missing" not in e["cols"]  # absent column -> no entry, never pruned


def test_all_null_column_is_definitively_prunable(spark, tmp_path):
    df = spark.createDataFrame([(1, None), (2, None)], "k long, lang string")
    out = str(tmp_path / "p")
    df.coalesce(1).write.parquet(out)
    import os

    rel = [f for f in os.listdir(out) if f.endswith(".parquet")]
    st = collect_file_stats(out, rel, ["lang"])
    e = st[rel[0]]["cols"]["lang"]
    assert e["lo"] is None and e["nulls"] == 2
    kept, skipped = prune_files(st, rel, [("lang", "==", "en")])
    assert kept == [] and skipped == rel  # NULL never equals anything


def test_prune_is_conservative_without_stats():
    # unknown file / unknown column -> always kept
    kept, skipped = prune_files({}, ["f1"], [("warc_ts", ">", "2024")])
    assert kept == ["f1"] and skipped == []
    st = {"f1": {"rows": 5, "cols": {}}}
    kept, _ = prune_files(st, ["f1"], [("lang", "==", "en")])
    assert kept == ["f1"]


def test_prune_ops():
    st = {"f": {"rows": 10, "cols": {"k": {"lo": 10, "hi": 20, "nulls": 0}}}}
    keep = lambda op, v: prune_files(st, ["f"], [("k", op, v)])[0] == ["f"]
    assert keep("==", 15) and not keep("==", 9) and not keep("==", 21)
    assert keep("<", 11) and not keep("<", 10)
    assert keep("<=", 10) and not keep("<=", 9)
    assert keep(">", 19) and not keep(">", 20)
    assert keep(">=", 20) and not keep(">=", 21)
    assert keep("between", (0, 10)) and keep("between", (20, 99))
    assert not keep("between", (21, 99)) and not keep("between", (0, 9))
    with pytest.raises(ValueError):
        prune_files(st, ["f"], [("k", "!=", 5)])


# -- 2. commit-time recording + soundness ------------------------------------

def test_stats_recorded_and_pruned_read_sound(spark, events, tmp_path):
    t = create_pages_table(spark, str(tmp_path / "tbl"), n_buckets=4)
    bands = _time_bands(events, 4)
    for i, b in enumerate(bands):
        apply_batch(t, b, epoch=i, mode="mor", compact_depth=100)
    snap = t.snapshot()
    live = {f for fs in snap.bucket_files.values() for f in fs} | {
        f for fs in snap.delta_files.values() for f in fs
    }
    # every live data file carries warc_ts zonemaps; no dead entries
    assert set(snap.file_stats) == live
    assert all("warc_ts" in e["cols"] for e in snap.file_stats.values())

    # soundness on the raw scan: pruned + filter == full + filter
    lo, hi = events.select(
        F.min("warc_ts"),
        F.expr(
            "timestamp_seconds(percentile(cast(warc_ts AS double), 0.3))"
        ),
    ).first()
    pred = [("warc_ts", "between", (lo, hi))]
    cond = F.col("warc_ts").between(F.lit(lo), F.lit(hi))
    full = {
        tuple(r)
        for r in t.read(predicates=None).filter(cond).select("event_id").collect()
    }
    pruned = {
        tuple(r)
        for r in t.read(predicates=pred).filter(cond).select("event_id").collect()
    }
    assert pruned == full and len(full) > 0

    # effectiveness: the window touches ~2 of 4 time bands -> files skipped
    kept, skipped = t.plan_scan(predicates=pred)
    assert len(skipped) > 0
    assert set(kept) | set(skipped) == live


def test_resolved_read_guards_mor_pruning(spark, events, tmp_path):
    t = create_pages_table(spark, str(tmp_path / "tbl"), n_buckets=4)
    for i, b in enumerate(_time_bands(events, 3)):
        apply_batch(t, b, epoch=i, mode="mor", compact_depth=100)
    hi = events.select(
        F.expr("timestamp_seconds(percentile(cast(warc_ts AS double), 0.4))")
    ).first()[0]
    pred = [("warc_ts", "<=", hi)]
    cond = F.col("warc_ts") <= F.lit(hi)

    def key_set(df):
        return {tuple(r) for r in df.select("url", "event_id").collect()}

    # with delta layers: predicates must be IGNORED (pruning before LWW
    # resolution would resurrect older in-range versions); same-view
    # comparison (read_resolved keeps tombstone rows, unlike read_current)
    truth = key_set(t.read_resolved().filter(cond))
    assert key_set(t.read_resolved(predicates=pred).filter(cond)) == truth

    # folded base (one row per key): pruning active and still sound
    fold_deltas(t, "event_id")
    resolved = t.read_resolved(predicates=pred).filter(cond)
    got = {tuple(r) for r in resolved.select("url", "event_id").collect()}
    want = {
        tuple(r)
        for r in t.read_resolved().filter(cond).select("url", "event_id").collect()
    }
    assert got == want


def test_stats_survive_fold_and_expire(spark, events, tmp_path):
    t = create_pages_table(spark, str(tmp_path / "tbl"), n_buckets=4)
    for i, b in enumerate(_time_bands(events, 3)):
        apply_batch(t, b, epoch=i, mode="mor", compact_depth=100)
    fold_deltas(t, "event_id")
    t.expire_snapshots(keep_last=1)
    snap = t.snapshot()
    live = {f for fs in snap.bucket_files.values() for f in fs} | {
        f for fs in snap.delta_files.values() for f in fs
    }
    assert set(snap.file_stats) == live  # folded-away files dropped
    assert all("warc_ts" in e["cols"] for e in snap.file_stats.values())


def test_sorted_writes_cluster_rows(spark, events, tmp_path):
    """sort_cols property: rows inside each base file are warc_ts-ordered
    (tight zonemaps + parquet RLE); checked on the physical file, not the
    DataFrame, since scan order is not guaranteed."""
    import pyarrow.parquet as pq
    import os

    t = create_pages_table(spark, str(tmp_path / "tbl"), n_buckets=2)
    apply_batch(t, events, epoch=0, mode="cow")  # CoW -> sorted base files
    snap = t.snapshot()
    files = [f for fs in snap.bucket_files.values() for f in fs]
    assert files
    for rel in files:
        ts = pq.read_table(os.path.join(t.root, rel), columns=["warc_ts"])
        vals = ts.column("warc_ts").to_pylist()
        assert vals == sorted(vals)
