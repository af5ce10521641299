"""Event-time operators: watermarked windows, bounded dedup, stateful LWW.

Each test drains the WAL multiple times against ONE checkpoint (write
file → drain → write file → drain).  Batch boundaries are therefore
deterministic, and the watermark/state carried between drains is read
back from the checkpoint — exercising recovery, not just a single run.
A fresh foreachBatch collector per drain isolates each run's emissions
(the memory sink cannot resume from a checkpoint).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F  # noqa: F401  (plan debugging)
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from aus_land_data_etl_spark.streaming.windowed import (
    dedup_within_watermark,
    latest_per_key_stateful,
    windowed_rollup,
)

ROLLUP_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("url", StringType()),
        StructField("op", StringType()),
        StructField("warc_ts", TimestampType()),
    ]
)

T0 = dt.datetime(2024, 1, 10, 0, 0, 0)


def _ts(hours: float) -> dt.datetime:
    return T0 + dt.timedelta(hours=hours)


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="wstream_")
    paths = {k: os.path.join(root, k) for k in ("wal", "ckpt")}
    yield paths
    shutil.rmtree(root, ignore_errors=True)


def _write_wal(spark, wal_dir: str, rows: list[tuple]) -> None:
    df = spark.createDataFrame(rows, ROLLUP_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(wal_dir)


class _Rows(list):
    def collect(self):
        return list(self)

    def count(self):
        return len(self)


def _drain(spark, dirs, transform, query_name: str, output_mode: str) -> _Rows:
    """availableNow drain of whatever is unprocessed; returns ONLY this
    run's emissions (foreachBatch collector — recovery-capable, unlike
    the memory sink)."""
    out = _Rows()
    reader = spark.readStream.schema(ROLLUP_SCHEMA).parquet(dirs["wal"])
    q = (
        transform(reader)
        .writeStream.foreachBatch(lambda df, _eid: out.extend(df.collect()))
        .outputMode(output_mode)
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out


def test_windowed_rollup_closes_and_drops_late(spark, dirs):
    real = [
        ("e1", "https://d1.example.com/p/1", "insert", _ts(0.1)),
        ("e2", "https://d1.example.com/p/2", "update", _ts(0.5)),
        ("e3", "https://d2.example.com/p/3", "delete", _ts(1.2)),
        ("e4", "https://d1.example.com/p/1", "update", _ts(1.4)),
    ]
    rollup = lambda df: windowed_rollup(df, window="1 hour", watermark="30 minutes")

    # drain 1: real events + a far-future watermark pusher → every real
    # window ends before the new watermark and is emitted (append mode).
    _write_wal(spark, dirs["wal"], real)
    _write_wal(
        spark, dirs["wal"], [("push", "https://dp.example.com/p/0", "insert", _ts(100))]
    )
    got1 = _drain(spark, dirs, rollup, "rollup_run1", "append")
    expect = {
        (_ts(0), "d1.example.com"): (2, 0),
        (_ts(1), "d1.example.com"): (1, 0),
        (_ts(1), "d2.example.com"): (1, 1),
    }
    rows1 = {
        (r["w_start"], r["domain"]): (r["n_events"], r["n_deletes"])
        for r in got1.collect()
    }
    assert rows1 == expect  # pusher's own window is still open → absent

    # drain 2 (recovered from checkpoint): an event behind the persisted
    # watermark must be dropped on arrival — no new window emission.
    _write_wal(
        spark, dirs["wal"], [("late", "https://d9.example.com/p/9", "insert", _ts(0.2))]
    )
    got2 = _drain(spark, dirs, rollup, "rollup_run2", "append")
    assert got2.count() == 0

    # batch form of the same expression (no watermark) sees everything
    batch = windowed_rollup(spark.createDataFrame(real, ROLLUP_SCHEMA), window="1 hour")
    assert {
        (r["w_start"], r["domain"]): (r["n_events"], r["n_deletes"])
        for r in batch.collect()
    } == expect


def test_dedup_within_watermark_suppresses_redelivery(spark, dirs):
    a = [(f"e{i}", "https://d1.example.com/p/1", "insert", _ts(i / 10)) for i in range(8)]
    # second delivery re-sends e4..e7 (same ids, same ts) plus fresh e8, e9
    b = [(f"e{i}", "https://d1.example.com/p/1", "insert", _ts(i / 10)) for i in range(4, 10)]
    dedup = lambda df: dedup_within_watermark(df, ["event_id"], watermark="2 hours")

    _write_wal(spark, dirs["wal"], a)
    got1 = _drain(spark, dirs, dedup, "dedup_run1", "append")
    assert sorted(r["event_id"] for r in got1.collect()) == sorted(
        f"e{i}" for i in range(8)
    )

    _write_wal(spark, dirs["wal"], b)
    got2 = _drain(spark, dirs, dedup, "dedup_run2", "append")
    # the re-delivered ids are suppressed by checkpointed dedup state
    assert sorted(r["event_id"] for r in got2.collect()) == ["e8", "e9"]

    # batch path: plain exact dedup
    batch = dedup_within_watermark(spark.createDataFrame(a + b, ROLLUP_SCHEMA), ["event_id"])
    assert batch.count() == 10


def test_latest_per_key_stateful_emits_only_advances(spark, dirs):
    _write_wal(
        spark,
        dirs["wal"],
        [
            ("a1", "u1", "insert", _ts(10)),
            ("a0", "u1", "insert", _ts(9)),  # folded away inside the batch
            ("b1", "u2", "insert", _ts(10)),
        ],
    )
    got1 = _drain(spark, dirs, latest_per_key_stateful, "state_run1", "update")
    rows1 = [(r["url"], r["event_id"], r["warc_ts"], r["op"]) for r in got1.collect()]
    assert sorted(rows1) == [
        ("u1", "a1", _ts(10), "insert"),
        ("u2", "b1", _ts(10), "insert"),
    ]

    _write_wal(
        spark,
        dirs["wal"],
        [
            ("a2", "u1", "update", _ts(11)),  # advances u1
            ("a9", "u1", "update", _ts(5)),  # stale — loses to state
            ("b0", "u2", "update", _ts(8)),  # stale — u2 silent this batch
            ("c1", "u3", "insert", _ts(10)),  # new key
        ],
    )
    got2 = _drain(spark, dirs, latest_per_key_stateful, "state_run2", "update")
    rows2 = [(r["url"], r["event_id"], r["warc_ts"], r["op"]) for r in got2.collect()]
    assert sorted(rows2) == [
        ("u1", "a2", _ts(11), "update"),
        ("u3", "c1", _ts(10), "insert"),
    ]


def test_latest_per_key_stateful_ttl_evicts_idle_keys(spark, dirs):
    """With state_ttl, a key idle past watermark+TTL is evicted — state
    rows are O(active keys), not O(distinct urls ever seen)."""
    tr = lambda df: latest_per_key_stateful(
        df, state_ttl="2 hours", watermark_delay="1 hour"
    )

    def drain_with_state(name):
        out = _Rows()
        reader = spark.readStream.schema(ROLLUP_SCHEMA).parquet(dirs["wal"])
        q = (
            tr(reader)
            .writeStream.foreachBatch(lambda df, _eid: out.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", dirs["ckpt"])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        prog = q.lastProgress
        n_state = (
            prog["stateOperators"][0]["numRowsTotal"]
            if prog and prog.get("stateOperators")
            else None
        )
        return out, n_state

    _write_wal(
        spark,
        dirs["wal"],
        [("a1", "u1", "insert", _ts(10)), ("b1", "u2", "insert", _ts(10))],
    )
    got1, n1 = drain_with_state("ttl_run1")
    assert {r["url"] for r in got1.collect()} == {"u1", "u2"}
    assert n1 == 2

    # watermark pusher: after this batch the watermark (39h) passes
    # u1/u2's timeout (10h + 2h); the timeout fires on the NEXT batch
    _write_wal(spark, dirs["wal"], [("c1", "u3", "insert", _ts(40))])
    drain_with_state("ttl_run2")

    _write_wal(spark, dirs["wal"], [("d1", "u4", "insert", _ts(41))])
    got3, n3 = drain_with_state("ttl_run3")
    assert {r["url"] for r in got3.collect()} == {"u4"}
    # u1/u2 evicted; only the keys inside the TTL horizon remain
    assert n3 == 2
