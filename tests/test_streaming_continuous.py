"""Continuous (non-drain) streaming: late WAL segments applied while the
query stays live; graceful stop."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.apply import create_pages_table
from aus_land_data_etl_spark.cdc.generator import generate_events
from aus_land_data_etl_spark.lake.merge import read_current
from aus_land_data_etl_spark.streaming.runner import run_stream, write_event_log


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="cont_")
    paths = {k: os.path.join(root, k) for k in ("wal", "ckpt", "table")}
    yield paths
    shutil.rmtree(root, ignore_errors=True)


def test_continuous_tail_and_graceful_stop(spark, dirs):
    ev1 = generate_events(spark, 800, seed=71)
    write_event_log(ev1, dirs["wal"], n_files=2)
    table = create_pages_table(spark, dirs["table"], n_buckets=4)
    res = run_stream(
        spark, table, dirs["wal"], dirs["ckpt"],
        max_files_per_trigger=1, available_now=False,
    )
    assert res.query is not None and res.query.isActive
    n1 = read_current(table).count()
    assert n1 > 0
    try:
        # late-arriving WAL segment picked up by the live query
        late = generate_events(spark, 400, seed=72).withColumn(
            "source_file", F.concat(F.lit("late/"), F.col("source_file"))
        )
        write_event_log(late, dirs["wal"], n_files=1)
        res.query.processAllAvailable()
        assert read_current(table).count() >= n1
        both = ev1.unionByName(late)
        # converged state equals a one-shot apply of everything
        from aus_land_data_etl_spark.cdc.apply import prepare_batch
        from aus_land_data_etl_spark.operators.dedup import lww_latest

        prep = prepare_batch(both)
        expect = (
            lww_latest(prep, "url", ["warc_ts", "event_id"])
            .filter(F.col("op") != "delete")
            .count()
        )
        assert read_current(table).count() == expect
    finally:
        res.query.stop()  # graceful drain (T8)
    assert not res.query.isActive
