"""Predicate deletes (merge.delete_where): GDPR erasure / retention sweep
as a first-class CDC change — tombstones at an explicit version, LWW-safe
against concurrent updates, exactly-once by operation id, visible to the
changelog like any other delete.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.apply import apply_batch, create_pages_table
from aus_land_data_etl_spark.cdc.generator import generate_events
from aus_land_data_etl_spark.lake.changelog import read_changes
from aus_land_data_etl_spark.lake.merge import delete_where, read_current


@pytest.fixture()
def table(spark, tmp_path):
    t = create_pages_table(spark, str(tmp_path / "tbl"), n_buckets=4)
    ev = generate_events(spark, 3000, seed=21)
    for e in range(3):
        apply_batch(
            t, ev.filter(F.pmod(F.col("source_pos"), F.lit(3)) == e), epoch=e
        )
    return t


def test_delete_where_tombstones_matching_rows(spark, table):
    live = read_current(table)
    as_of = live.agg(F.max("warc_ts")).first()[0] + dt.timedelta(seconds=1)
    cond = F.col("url").like("https://d0.example.com/%")
    n_match = live.filter(cond).count()
    assert n_match > 0
    total = live.count()

    v = delete_where(table, cond, as_of, op_id="erase-d0")
    assert v == table.current_version()
    after = read_current(table)
    assert after.filter(cond).count() == 0
    assert after.count() == total - n_match
    # the tombstone is a real versioned row, not a physical drop (pre-
    # existing stream tombstones also match cond — count only the new ones)
    raw = table.read_resolved()
    dead = raw.filter(cond & F.col("is_deleted") & (F.col("warc_ts") == F.lit(as_of)))
    assert dead.count() == n_match


def test_delete_where_is_exactly_once_by_op_id(spark, table):
    as_of = read_current(table).agg(F.max("warc_ts")).first()[0] + dt.timedelta(
        seconds=1
    )
    cond = F.col("url").like("https://d1.example.com/%")
    v1 = delete_where(table, cond, as_of, op_id="erase-d1")
    v2 = delete_where(table, cond, as_of, op_id="erase-d1")
    assert v2 == v1 == table.current_version()
    # a different op id with nothing left to delete is also a no-op commit
    v3 = delete_where(table, cond, as_of, op_id="erase-d1-again")
    assert v3 == v1


def test_newer_update_survives_the_delete(spark, table):
    """A row whose current version is at/after as_of is NEWER information
    than the delete decision and must survive — LWW, not imperative."""
    live = read_current(table)
    row = live.orderBy("url").first()
    url = row["url"]
    as_of = row["warc_ts"]  # strictly-older rule: == as_of survives too
    before = live.count()
    delete_where(table, F.col("url") == url, as_of, op_id="erase-one")
    after = read_current(table)
    assert after.filter(F.col("url") == url).count() == 1
    assert after.count() == before


def test_delete_where_visible_in_changelog(spark, table):
    v_from = table.current_version()
    live = read_current(table)
    as_of = live.agg(F.max("warc_ts")).first()[0] + dt.timedelta(seconds=1)
    cond = F.col("url").like("https://d2.example.com/%")
    n_match = live.filter(cond).count()
    assert n_match > 0
    v_to = delete_where(table, cond, as_of, op_id="erase-d2")
    ch = read_changes(table, v_from, v_to)
    assert ch.filter(F.col("change_type") == "delete").count() == n_match
    assert ch.filter(F.col("change_type") != "delete").count() == 0
