"""Property-based replay/state-equivalence (Hypothesis).

Random event logs — duplicate deliveries, out-of-order versions, deletes,
key collisions — applied through the real engine under a random batching
must equal a 40-line pure-Python LWW oracle.  This is the randomized
counterpart of the deterministic replay suite (SURVEY.md §5 test plan #2).
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.apply import apply_batch, create_pages_table
from aus_land_data_etl_spark.cdc.events import EVENT_SCHEMA
from aus_land_data_etl_spark.lake.merge import read_current

KEYS = [f"https://d{i}.example.com/p/{i}" for i in range(6)]
BASE = dt.datetime(2024, 1, 1)


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    events = []
    for i in range(n):
        key = draw(st.sampled_from(KEYS))
        op = draw(st.sampled_from(["insert", "update", "update", "delete"]))
        ts_s = draw(st.integers(min_value=0, max_value=40))
        events.append((f"e{i:03d}", op, key, ts_s))
    # duplicate delivery of a random subset
    dups = draw(st.lists(st.sampled_from(events), max_size=4))
    order = events + dups
    n_batches = draw(st.integers(min_value=1, max_value=3))
    return order, n_batches


def python_oracle(events):
    """Pure-python LWW with tombstones: winner per key by (ts, event_id)."""
    state: dict[str, tuple] = {}
    for eid, op, key, ts_s in events:
        cur = state.get(key)
        cand = (ts_s, eid, op)
        if cur is None or cand[:2] > cur[:2]:
            state[key] = cand
    return {
        key: (ts, eid)
        for key, (ts, eid, op) in state.items()
        if op != "delete"
    }


def to_rows(events):
    rows = []
    for eid, op, key, ts_s in events:
        html = None if op == "delete" else f"<p>{eid} body</p>".encode()
        rows.append(
            (
                eid, op, key, BASE + dt.timedelta(seconds=ts_s), html, None,
                1, None, 0, 0, "wal/p0.log", 0,
            )
        )
    return rows


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(event_logs())
def test_engine_matches_python_oracle(spark, tmp_path_factory, log):
    events, n_batches = log
    d = str(tmp_path_factory.mktemp("prop"))
    table = create_pages_table(spark, d, n_buckets=2)
    df = spark.createDataFrame(to_rows(events), EVENT_SCHEMA)
    for i in range(n_batches):
        batch = df.filter(F.pmod(F.xxhash64("event_id"), F.lit(n_batches)) == i)
        apply_batch(table, batch, epoch=i)
    got = {
        r["url"]: ((r["warc_ts"] - BASE).total_seconds(), r["event_id"])
        for r in read_current(table).collect()
    }
    assert got == python_oracle(events)
