"""Predicate-sharded pagination planning + distributed fetch (S5/S6/S11).

The fake-server callables are built as *closures* (not module-level
functions) so cloudpickle ships them by value to executor workers — the
tests module itself is not importable there.
"""

from __future__ import annotations

from pyspark.sql import types as T

from aus_land_data_etl_spark.sources.paginated import fetch_paginated, plan_shards

N = 50_000

ROW_SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
)


def make_server(n: int):
    """Deterministic fake server: keys 0..n-1, value = key*10."""

    def count_fn(lo: float, hi: float) -> int:
        return len(range(max(0, int(lo)), min(n, int(hi))))

    def fetch_fn(lo: float, hi: float, offset: int, limit: int) -> list[dict]:
        ks = list(range(max(0, int(lo)), min(n, int(hi))))[offset : offset + limit]
        return [{"k": k, "v": k * 10} for k in ks]

    return count_fn, fetch_fn


def test_plan_respects_budget():
    count_fn, _ = make_server(N)
    shards = plan_shards(count_fn, 0, N, page_size=1000, max_shard_rows=8000)
    assert shards
    for s in shards:
        assert s.limit <= 1000
        assert count_fn(s.lo, s.hi) <= 8000
    # pages tile the row space exactly
    assert sum(s.limit for s in shards) == N


def test_plan_skips_empty_ranges():
    # all rows live in [0, 1000) — the planner must not emit pages for the
    # empty 98% of the range (recursive refinement prunes them)
    count_fn, _ = make_server(1000)
    shards = plan_shards(count_fn, 0, N, page_size=100, max_shard_rows=500)
    assert shards
    assert sum(s.limit for s in shards) == 1000
    assert all(s.lo < 1000 for s in shards)


def test_fetch_complete_and_exact(spark):
    count_fn, fetch_fn = make_server(N)
    shards = plan_shards(count_fn, 0, N, page_size=2000, max_shard_rows=10_000)
    df = fetch_paginated(spark, shards, fetch_fn, ROW_SCHEMA)
    assert df.count() == N
    got = df.selectExpr("sum(v) s", "count(distinct k) d").collect()[0]
    assert got["d"] == N
    assert got["s"] == sum(k * 10 for k in range(N))


def test_fetch_retries_flaky_server(spark):
    count_fn, fetch_fn = make_server(5000)
    seen: set = set()

    def flaky(lo, hi, off, lim):
        # fails deterministically on first attempt for some pages
        key = (int(lo), off, lim)
        if (int(lo) + off) % 7 == 0 and key not in seen:
            seen.add(key)
            raise ConnectionError("transient")
        return fetch_fn(lo, hi, off, lim)

    shards = plan_shards(count_fn, 0, 5000, page_size=500, max_shard_rows=2000)
    df = fetch_paginated(spark, shards, flaky, ROW_SCHEMA)
    assert df.count() == 5000
