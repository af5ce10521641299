"""Predicate-sharded paginated remote source (SURVEY.md §2.1 S5/S6, S11).

The reference plans FeatureServer reads by recursively splitting a
predicate (a date or float range) until each shard's COUNT(*) fits the
page budget, then emits LIMIT/OFFSET pages
(/root/reference/lib/pipeline/gis/feature_pagination_sharding.py:41-106,
lib/pipeline/gis/predicate/date.py:62-89).  Spark restatement:

- the *planner* runs driver-side against a cheap count probe (HTTP COUNT
  in production; any callable here) and yields a shard/page table;
- the *fetcher* is an Arrow-batched ``mapInPandas`` over that page table
  — each task pulls its pages through a rate-limited client (the
  reference's per-host semaphore + backoff stack, http_config.py:4-16),
  so fetch parallelism = Spark task parallelism, bounded per executor.

No network exists in this sandbox, so the client is injectable; tests use
a deterministic fake server.  The planning logic — the part that matters
for scale (it is dynamic partition planning) — is real and tested.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass(frozen=True)
class Shard:
    """Half-open predicate interval [lo, hi) with LIMIT/OFFSET pages."""

    lo: float
    hi: float
    offset: int
    limit: int


def plan_shards(
    count_fn: Callable[[float, float], int],
    lo: float,
    hi: float,
    page_size: int = 1000,
    max_shard_rows: int = 10_000,
    max_depth: int = 32,
) -> list[Shard]:
    """Recursively bisect [lo, hi) until each shard's count probe fits
    ``max_shard_rows``; then emit pages.  This is the reference's
    ``RequestSharder.shard`` made iterative (explicit stack, no recursion
    limit) — the planner is O(shards) count probes.
    """
    shards: list[Shard] = []
    stack = [(lo, hi, 0)]
    while stack:
        a, b, depth = stack.pop()
        n = count_fn(a, b)
        if n == 0:
            continue
        if n > max_shard_rows and depth < max_depth and b - a > 1e-9:
            mid = (a + b) / 2
            stack.append((a, mid, depth + 1))
            stack.append((mid, b, depth + 1))
            continue
        for off in range(0, n, page_size):
            shards.append(Shard(a, b, off, min(page_size, n - off)))
    return shards


PAGE_SCHEMA = T.StructType(
    [
        T.StructField("lo", T.DoubleType()),
        T.StructField("hi", T.DoubleType()),
        T.StructField("offset", T.IntegerType()),
        T.StructField("limit", T.IntegerType()),
    ]
)


class RateLimiter:
    """Token-bucket limiter for fetch tasks (the per-host semaphore +
    throttle analog).  One instance per python worker; bounds request
    rate within a task."""

    def __init__(self, per_second: float):
        self.per_second = per_second
        self._next = 0.0

    def acquire(self) -> None:
        now = time.monotonic()
        if now < self._next:
            time.sleep(self._next - now)
        self._next = max(now, self._next) + 1.0 / self.per_second


def fetch_paginated(
    spark: SparkSession,
    shards: list[Shard],
    fetch_fn: Callable[[float, float, int, int], list[dict]],
    row_schema: T.StructType,
    n_partitions: int | None = None,
    requests_per_second: float | None = None,
    max_retries: int = 5,
) -> DataFrame:
    """Distribute the page plan over tasks; fetch with retry/backoff.

    ``fetch_fn(lo, hi, offset, limit) -> list[dict]`` is the remote call
    (deterministic fake in tests).  Exponential backoff mirrors the
    reference's ``ExpBackoffClientSession`` (exp_backoff/client_session.py).
    """
    rows = [(float(s.lo), float(s.hi), int(s.offset), int(s.limit)) for s in shards]
    n_partitions = n_partitions or min(len(rows) or 1, spark.sparkContext.defaultParallelism)
    pages = spark.createDataFrame(rows, PAGE_SCHEMA).repartition(n_partitions)
    names = [f.name for f in row_schema.fields]

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        limiter = RateLimiter(requests_per_second) if requests_per_second else None
        for pdf in batches:
            out: list[dict] = []
            for lo, hi, off, lim in zip(pdf["lo"], pdf["hi"], pdf["offset"], pdf["limit"]):
                if limiter:
                    limiter.acquire()
                delay = 0.05
                for attempt in range(max_retries):
                    try:
                        out.extend(fetch_fn(float(lo), float(hi), int(off), int(lim)))
                        break
                    except Exception:
                        if attempt == max_retries - 1:
                            raise
                        time.sleep(delay)
                        delay *= 2
            yield pd.DataFrame(out, columns=names) if out else pd.DataFrame(
                {n: [] for n in names}
            )

    return pages.mapInPandas(fetch, schema=row_schema)
