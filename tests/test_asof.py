"""Backward as-of join (operators.joins.asof_join).

Semantics under test mirror the reference's correlated latest-version
lookups (point-in-time enrichment): for each left row, the latest right
row of the same key with right_ts <= left_ts (< when strict), LEFT JOIN
NULLs when none exists, ties at equal timestamps broken by the greatest
tiebreak column.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aus_land_data_etl_spark.operators.joins import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-10T00:00:00")),  # after r2 → r2
            (2, "k1", _ts("2024-01-05T00:00:00")),  # equal to r2's ts
            (3, "k1", _ts("2024-01-01T00:00:00")),  # before all → NULL
            (4, "k2", _ts("2024-01-10T00:00:00")),  # other key → r3
            (5, "k3", _ts("2024-01-10T00:00:00")),  # key with no rights
        ],
        "lid int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "k1", _ts("2024-01-03T00:00:00"), 1.0),
            (11, "k1", _ts("2024-01-05T00:00:00"), 2.0),
            (12, "k1", _ts("2024-01-05T00:00:00"), 3.0),  # tie: larger rid wins
            (13, "k2", _ts("2024-01-04T00:00:00"), 4.0),
            (14, "k2", None, 99.0),  # NULL ts: never matches
        ],
        "rid int, k string, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", tiebreaks=["rid"]
    )
    got = {r["lid"]: (r["asof_rid"], r["asof_v"]) for r in out.collect()}
    assert got == {
        1: (12, 3.0),  # latest ≤ Jan 10 is the Jan 5 pair; rid 12 wins the tie
        2: (12, 3.0),  # inclusive: equal-ts right rows are visible
        3: (None, None),
        4: (13, 4.0),
        5: (None, None),
    }
    # left row count preserved (no fan-out), all left columns intact
    assert out.count() == left.count()
    assert set(left.columns) <= set(out.columns)


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        tiebreaks=["rid"], strict=True,
    )
    got = {r["lid"]: r["asof_rid"] for r in out.collect()}
    # lid 2 (ts == Jan 5) now sees only the Jan 3 row
    assert got[2] == 10
    assert got[1] == 12  # strictly-before rows unaffected


def test_asof_null_payload_not_skipped(spark):
    # A right row whose payload value is NULL must still win (the struct
    # carry prevents last(ignorenulls) from reaching past it).
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-10T00:00:00"))], "lid int, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, "k", _ts("2024-01-01T00:00:00"), 1.0),
            (11, "k", _ts("2024-01-05T00:00:00"), None),
        ],
        "rid int, k string, ts timestamp, v double",
    )
    row = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", tiebreaks=["rid"]
    ).collect()[0]
    assert row["asof_rid"] == 11 and row["asof_v"] is None


def test_asof_composite_key_and_prefix(spark):
    left = spark.createDataFrame(
        [(1, "a", 1, _ts("2024-01-10T00:00:00"))],
        "lid int, k1 string, k2 int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "a", 1, _ts("2024-01-02T00:00:00")),
            (11, "a", 2, _ts("2024-01-05T00:00:00")),  # k2 differs: no match
        ],
        "rid int, k1 string, k2 int, ts timestamp",
    )
    row = asof_join(
        left, right, on=["k1", "k2"], left_ts="ts", right_ts="ts",
        tiebreaks=["rid"], prefix="prior_",
    ).collect()[0]
    assert row["prior_rid"] == 10
    assert row["prior_ts"] == _ts("2024-01-02T00:00:00")


def test_asof_single_shuffle_plan(spark):
    # Scale check: the whole as-of resolves in ONE exchange (the window's
    # hash partition on the key) — no range-join row explosion.
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", tiebreaks=["rid"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_matches_naive_range_join(spark):
    # Property vs the quadratic ground truth on a deterministic grid.
    import itertools

    rows_l = [
        (i, f"k{i % 3}", _ts("2024-01-01T00:00:00") + dt.timedelta(hours=7 * i))
        for i in range(24)
    ]
    rows_r = [
        (100 + j, f"k{j % 3}", _ts("2024-01-01T00:00:00") + dt.timedelta(hours=5 * j), float(j))
        for j in range(30)
    ]
    left = spark.createDataFrame(rows_l, "lid int, k string, ts timestamp")
    right = spark.createDataFrame(rows_r, "rid int, k string, ts timestamp, v double")
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", tiebreaks=["rid"]
    )
    got = {r["lid"]: r["asof_rid"] for r in out.collect()}
    naive = {}
    for lid, lk, lts in rows_l:
        best = [
            (rts, rid)
            for rid, rk, rts, _v in rows_r
            if rk == lk and rts <= lts
        ]
        naive[lid] = max(best)[1] if best else None
    assert got == naive


def test_asof_null_keys_never_match(spark):
    """SQL equi-join semantics (round-2 ADVICE): a NULL-key right row
    must not match a NULL-key left row (Window.partitionBy would group
    the NULLs together); the NULL-key left row survives with NULL
    payloads, like LEFT JOIN."""
    left = spark.createDataFrame(
        [
            (1, None, _ts("2024-01-10T00:00:00")),
            (2, "k1", _ts("2024-01-10T00:00:00")),
        ],
        "lid int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, None, _ts("2024-01-05T00:00:00"), 1.0),  # must never match
            (11, "k1", _ts("2024-01-05T00:00:00"), 2.0),
        ],
        "rid int, k string, ts timestamp, v double",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", tiebreaks=["rid"]
    )
    got = {r["lid"]: (r["asof_rid"], r["asof_v"]) for r in out.collect()}
    assert got == {1: (None, None), 2: (11, 2.0)}
