"""Incremental aggregate-view maintenance: refresh == full recompute,
exactly-once refresh, group death/rebirth, null-aware sums, pruning."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.apply import apply_batch, create_pages_table
from aus_land_data_etl_spark.cdc.events import EVENT_SCHEMA
from aus_land_data_etl_spark.cdc.generator import generate_events
from aus_land_data_etl_spark.lake.incremental import AggSpec, AggView, full_compute


def _ev(eid, op, url, ts_sec, body, schema_version=1, extra=None):
    return Row(
        event_id=str(eid),
        op=op,
        url=url,
        warc_ts=dt.datetime(2024, 1, 1, 0, 0, ts_sec),
        html=(f"<html><body><p>{body}</p></body></html>").encode() if body else None,
        lang=None,
        schema_version=schema_version,
        payload_extra=extra,
        source_partition=0,
        source_offset=eid,
        source_file="t.parquet",
        source_pos=eid,
    )


def _events_df(spark, rows):
    return spark.createDataFrame(rows, EVENT_SCHEMA)


def _rows(df, ndigits=6):
    out = []
    for r in df.collect():
        vals = []
        for v in r:
            vals.append(round(v, ndigits) if isinstance(v, float) else v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def test_view_matches_full_recompute_over_generated_stream(spark, tmp_path):
    """count/sum/avg by a derived key track a 4-batch generated CDC stream
    (hot keys, dupes, deletes, disorder) interval by interval."""
    src = create_pages_table(spark, str(tmp_path / "src"), n_buckets=4)
    view = AggView.create(
        spark,
        str(tmp_path / "mv"),
        src,
        keys=["grp"],
        aggs=[
            AggSpec("n_pages", "count"),
            AggSpec("sum_len", "sum", "text_len"),
            AggSpec("avg_len", "avg", "text_len"),
        ],
        derived={
            "grp": "pmod(xxhash64(url), 5)",
            "text_len": "length(text)",
        },
        n_buckets=4,
    )
    events = generate_events(spark, 2000, seed=13)
    for i in range(4):
        batch = events.filter(F.pmod(F.xxhash64("event_id"), F.lit(4)) == i)
        apply_batch(src, batch, epoch=i)
        view.refresh()
        assert _rows(view.read()) == _rows(full_compute(view))
    assert view.refreshed_through() == src.current_version()


def test_refresh_is_exactly_once_and_noop_when_current(spark, tmp_path):
    src = create_pages_table(spark, str(tmp_path / "src"), n_buckets=2)
    view = AggView.create(
        spark, str(tmp_path / "mv"), src,
        keys=["grp"], aggs=[AggSpec("n", "count")],
        derived={"grp": "substring_index(url, '/', -1)"}, n_buckets=2,
    )
    apply_batch(
        src,
        _events_df(spark, [_ev(1, "insert", "https://x.example.com/a", 10, "p1")]),
        epoch=0,
    )
    v1 = view.refresh()
    # nothing new: no-op, no new snapshot
    assert view.refresh() == v1
    snap = view.table.snapshot()
    assert int(snap.properties["mv_source_version"]) == src.current_version()
    # the interval's epoch key is in the exactly-once window, so a crashed
    # refresh re-driven over the same interval would hit the guard
    assert f"mv:0->{src.current_version()}" in snap.recent_epochs
    assert _rows(view.read()) == _rows(full_compute(view))


def test_group_death_and_rebirth(spark, tmp_path):
    src = create_pages_table(spark, str(tmp_path / "src"), n_buckets=2)
    view = AggView.create(
        spark, str(tmp_path / "mv"), src,
        keys=["grp"],
        aggs=[AggSpec("n", "count"), AggSpec("sum_len", "sum", "tl")],
        derived={"grp": "regexp_extract(url, 'g([0-9]+)', 1)", "tl": "length(text)"},
        n_buckets=2,
    )
    u = "https://ex.com/g7/only"
    apply_batch(src, _events_df(spark, [_ev(1, "insert", u, 10, "v1")]), epoch=0)
    view.refresh()
    assert _rows(view.read()) == _rows(full_compute(view))
    # group dies: its only row tombstoned
    apply_batch(src, _events_df(spark, [_ev(2, "delete", u, 20, None)]), epoch=1)
    view.refresh()
    assert view.read().count() == 0
    assert full_compute(view).count() == 0
    # rebirth with a different payload
    apply_batch(src, _events_df(spark, [_ev(3, "insert", u, 30, "v2 longer")]), epoch=2)
    view.refresh()
    assert _rows(view.read()) == _rows(full_compute(view))


def test_null_aware_sum_and_count_col(spark, tmp_path):
    """SUM over an all-null group is NULL (not 0); count_col counts only
    non-null; both flip correctly when the null-ness changes."""
    src = create_pages_table(spark, str(tmp_path / "src"), n_buckets=2)
    view = AggView.create(
        spark, str(tmp_path / "mv"), src,
        keys=["grp"],
        aggs=[
            AggSpec("n_status", "count_col", "fetch_status"),
            AggSpec("sum_status", "sum", "fetch_status"),
        ],
        derived={"grp": "substring_index(url, '/', -1)"},
        n_buckets=2,
    )
    # v1 events carry no fetch_status -> NULL
    apply_batch(
        src,
        _events_df(spark, [
            _ev(1, "insert", "https://ex.com/a", 10, "x"),
            _ev(2, "insert", "https://ex.com/b", 10, "y"),
        ]),
        epoch=0,
    )
    view.refresh()
    got = {r["grp"]: r for r in view.read().collect()}
    assert got["a"]["sum_status"] is None and got["a"]["n_status"] == 0
    assert _rows(view.read()) == _rows(full_compute(view))
    # b gains a status (v4 schema); a stays all-null
    apply_batch(
        src,
        _events_df(spark, [
            _ev(3, "update", "https://ex.com/b", 20, "y2",
                schema_version=4, extra='{"fetch_status": 200}'),
        ]),
        epoch=1,
    )
    view.refresh()
    got = {r["grp"]: r for r in view.read().collect()}
    assert got["b"]["sum_status"] == 200.0 and got["b"]["n_status"] == 1
    assert got["a"]["sum_status"] is None
    assert _rows(view.read()) == _rows(full_compute(view))


def test_refresh_rewrites_only_touched_view_buckets(spark, tmp_path):
    """O(changes) evidence: a refresh whose interval touches one group
    rewrites only that group's view bucket."""
    src = create_pages_table(spark, str(tmp_path / "src"), n_buckets=4)
    view = AggView.create(
        spark, str(tmp_path / "mv"), src,
        keys=["grp"], aggs=[AggSpec("n", "count")],
        derived={"grp": "substring_index(url, '/', -1)"}, n_buckets=8,
    )
    rows = [
        _ev(i, "insert", f"https://ex.com/s{i}/k{i}", 10, f"p{i}")
        for i in range(1, 9)
    ]
    apply_batch(src, _events_df(spark, rows), epoch=0)
    view.refresh()
    before = view.table.snapshot()
    # touch exactly one key
    apply_batch(
        src,
        _events_df(spark, [_ev(99, "update", "https://ex.com/s1/k1", 20, "p1b")]),
        epoch=1,
    )
    view.refresh()
    after = view.table.snapshot()
    changed = [
        b
        for b in set(before.bucket_files) | set(after.bucket_files)
        if before.bucket_files.get(b) != after.bucket_files.get(b)
    ]
    assert len(changed) == 1
    assert _rows(view.read()) == _rows(full_compute(view))


def test_multi_column_and_null_group_keys(spark, tmp_path):
    """Composite keys including NULLs group correctly ((NULL,'x') is one
    group, distinct from ('','x'))."""
    src = create_pages_table(spark, str(tmp_path / "src"), n_buckets=2)
    view = AggView.create(
        spark, str(tmp_path / "mv"), src,
        keys=["seg", "tld"],
        aggs=[AggSpec("n", "count")],
        derived={
            "tld": "regexp_extract(url, '\\\\.([a-z]+)/', 1)",
            # NULL for path '1' — exercises NULL inside a composite key
            "seg": "nullif(substring_index(url, '/', -1), '1')",
        },
        n_buckets=2,
    )
    apply_batch(
        src,
        _events_df(spark, [
            _ev(1, "insert", "https://a.com/1", 10, "x"),   # seg NULL
            _ev(2, "insert", "https://b.com/2", 10, "y"),
            _ev(3, "insert", "https://c.org/3", 10, "z", schema_version=2),
        ]),
        epoch=0,
    )
    view.refresh()
    assert _rows(view.read()) == _rows(full_compute(view))
    got = {(r["seg"], r["tld"]): r["n"] for r in view.read().collect()}
    assert got[(None, "com")] == 1
    assert got[("2", "com")] == 1 and got[("3", "org")] == 1


def test_min_max_clean_and_dirty_paths(spark, tmp_path):
    """min/max fold additions for free; a retraction at the stored
    extremum forces that group's recompute (and only then)."""
    src = create_pages_table(spark, str(tmp_path / "src"), n_buckets=2)
    view = AggView.create(
        spark, str(tmp_path / "mv"), src,
        keys=["grp"],
        aggs=[AggSpec("min_len", "min", "tl"), AggSpec("max_len", "max", "tl")],
        derived={"grp": "regexp_extract(url, 'g([0-9]+)', 1)", "tl": "length(text)"},
        n_buckets=2,
    )
    # g1: texts of length 2 and 6 (bodies "xx", "yyyyyy")
    apply_batch(src, _events_df(spark, [
        _ev(1, "insert", "https://ex.com/g1/a", 10, "xx"),
        _ev(2, "insert", "https://ex.com/g1/b", 10, "yyyyyy"),
    ]), epoch=0)
    view.refresh()
    assert _rows(view.read()) == _rows(full_compute(view))
    # clean path: insert shorter text -> new min, no recompute needed
    apply_batch(src, _events_df(spark, [
        _ev(3, "insert", "https://ex.com/g1/c", 20, "z"),
    ]), epoch=1)
    view.refresh()
    got = view.read().collect()[0]
    assert got["min_len"] == 1.0 and got["max_len"] == 6.0
    # dirty path: delete the min row -> extremum invalidated -> recompute
    apply_batch(src, _events_df(spark, [
        _ev(4, "delete", "https://ex.com/g1/c", 30, None),
    ]), epoch=2)
    view.refresh()
    got = view.read().collect()[0]
    assert got["min_len"] == 2.0 and got["max_len"] == 6.0
    assert _rows(view.read()) == _rows(full_compute(view))
    # dirty path via update: the max row's text shrinks
    apply_batch(src, _events_df(spark, [
        _ev(5, "update", "https://ex.com/g1/b", 40, "www"),
    ]), epoch=3)
    view.refresh()
    got = view.read().collect()[0]
    assert got["min_len"] == 2.0 and got["max_len"] == 3.0
    assert _rows(view.read()) == _rows(full_compute(view))
    # group death through the extremal view
    apply_batch(src, _events_df(spark, [
        _ev(6, "delete", "https://ex.com/g1/a", 50, None),
        _ev(7, "delete", "https://ex.com/g1/b", 50, None),
    ]), epoch=4)
    view.refresh()
    assert view.read().count() == 0


def test_min_max_matches_full_recompute_over_generated_stream(spark, tmp_path):
    """min/max by derived key track a generated CDC stream (updates move
    values, deletes retract extrema) interval by interval."""
    src = create_pages_table(spark, str(tmp_path / "src"), n_buckets=4)
    view = AggView.create(
        spark, str(tmp_path / "mv"), src,
        keys=["grp"],
        aggs=[
            AggSpec("n", "count"),
            AggSpec("min_len", "min", "tl"),
            AggSpec("max_len", "max", "tl"),
        ],
        derived={"grp": "pmod(xxhash64(url), 3)", "tl": "length(text)"},
        n_buckets=4,
    )
    events = generate_events(spark, 1500, seed=29)
    for i in range(3):
        batch = events.filter(F.pmod(F.xxhash64("event_id"), F.lit(3)) == i)
        apply_batch(src, batch, epoch=i)
        view.refresh()
        assert _rows(view.read()) == _rows(full_compute(view))


def test_min_max_reserve_avoids_recompute_until_exhausted(
    spark, tmp_path, monkeypatch
):
    """Mechanism pin for the bounded retraction reserve: deleting the min
    row falls back to the next tracked value WITHOUT touching the source
    (zero recompute calls); only an interval that retracts every tracked
    value of a non-exhaustive group (> RESERVE_K distinct values) pays
    the recompute — and still lands on the right answer."""
    from aus_land_data_etl_spark.lake.incremental import RESERVE_K

    src = create_pages_table(spark, str(tmp_path / "src"), n_buckets=2)
    view = AggView.create(
        spark, str(tmp_path / "mv"), src,
        keys=["grp"],
        aggs=[AggSpec("min_len", "min", "tl")],
        derived={"grp": "regexp_extract(url, 'g([0-9]+)', 1)",
                 "tl": "length(text)"},
        n_buckets=2,
    )
    # 12 distinct text lengths 1..12 -> reserve holds 1..8, exhaustive=False
    n = RESERVE_K + 4
    apply_batch(src, _events_df(spark, [
        _ev(i, "insert", f"https://ex.com/g1/{i}", 10, "x" * i)
        for i in range(1, n + 1)
    ]), epoch=0)
    view.refresh()

    calls = {"n": 0}
    orig = AggView._recompute_groups

    def counting(self, *a, **k):
        calls["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(AggView, "_recompute_groups", counting)

    # delete min rows one interval at a time: reserve absorbs ALL of them
    # (even the 8th — the reserve empties but... 7 deletions keep >=1)
    for step in range(1, RESERVE_K - 1 + 1):  # delete lengths 1..7
        apply_batch(src, _events_df(spark, [
            _ev(100 + step, "delete", f"https://ex.com/g1/{step}",
                20 + step, None),
        ]), epoch=step)
        view.refresh()
        got = view.read().collect()[0]
        assert got["min_len"] == float(step + 1), step
    assert calls["n"] == 0, "reserve fallback must not touch the source"

    # one interval retracting the last tracked value (8) -> reserve empty,
    # not exhaustive -> exactly one recompute; correct min (9) restored
    # and the reserve is rebuilt (9..12, exhaustive) so the NEXT deletion
    # is reserve-served again
    apply_batch(src, _events_df(spark, [
        _ev(200, "delete", f"https://ex.com/g1/{RESERVE_K}", 40, None),
    ]), epoch=99)
    view.refresh()
    assert calls["n"] == 1
    assert view.read().collect()[0]["min_len"] == float(RESERVE_K + 1)
    assert _rows(view.read()) == _rows(full_compute(view))
    apply_batch(src, _events_df(spark, [
        _ev(201, "delete", f"https://ex.com/g1/{RESERVE_K + 1}", 50, None),
    ]), epoch=100)
    view.refresh()
    assert calls["n"] == 1, "rebuilt exhaustive reserve serves the next delete"
    assert view.read().collect()[0]["min_len"] == float(RESERVE_K + 2)
