"""CDC apply: convergence, replay equivalence, exactly-once, evolution.

The Spark analog of the reference's differential/snapshot test strategy
(SURVEY.md §5): the same event log applied under different batchings,
orderings and replays must converge to an identical final table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.apply import apply_batch, create_pages_table, prepare_batch
from aus_land_data_etl_spark.cdc.generator import generate_events
from aus_land_data_etl_spark.lake.merge import read_current
from aus_land_data_etl_spark.operators.dedup import lww_latest

N_EVENTS = 3000


@pytest.fixture(scope="module")
def events(spark) -> DataFrame:
    return generate_events(spark, N_EVENTS, seed=42, n_source_partitions=4).cache()


def expected_final(events: DataFrame) -> DataFrame:
    """Oracle: direct one-shot LWW over the whole log (no engine)."""
    prep = prepare_batch(events)
    win = lww_latest(prep, "url", version_cols=["warc_ts", "event_id"])
    return win.filter(F.col("op") != "delete").select(
        "url", "warc_ts", "event_id", "text", "lang", "fetch_status"
    )


def state_fingerprint(df: DataFrame) -> int:
    cols = ["url", "warc_ts", "event_id", "text", "lang", "fetch_status"]
    row = (
        df.select(
            F.bit_xor(
                F.xxhash64(*[F.col(c).cast("string") for c in cols])
            ).alias("h"),
            F.count("*").alias("n"),
        )
    ).collect()[0]
    return (row["h"] or 0, row["n"])


def split_batches(events: DataFrame, n: int) -> list[DataFrame]:
    return [
        events.filter(F.pmod(F.xxhash64("event_id"), F.lit(n)) == i) for i in range(n)
    ]


def test_generator_deterministic(spark):
    a = generate_events(spark, 500, seed=7)
    b = generate_events(spark, 500, seed=7)
    c = generate_events(spark, 500, seed=8)
    ha = a.select(F.bit_xor(F.xxhash64("event_id", "url", "op"))).collect()[0][0]
    hb = b.select(F.bit_xor(F.xxhash64("event_id", "url", "op"))).collect()[0][0]
    hc = c.select(F.bit_xor(F.xxhash64("event_id", "url", "op"))).collect()[0][0]
    assert ha == hb
    assert ha != hc


def test_generator_skew_and_dupes(spark, events):
    dom = events.withColumn("d", F.regexp_extract("url", r"https://(d\d+)\.", 1))
    top = dom.groupBy("d").count().orderBy(F.desc("count")).first()
    assert top["d"] == "d0"
    assert top["count"] > 0.2 * N_EVENTS  # hot domain holds ~30%
    n_all = events.count()
    n_distinct = events.select("event_id").distinct().count()
    assert n_all > n_distinct  # duplicate delivery present


def test_apply_converges_to_oracle(spark, events, tmp_table_dir):
    table = create_pages_table(spark, tmp_table_dir, n_buckets=8)
    for i, b in enumerate(split_batches(events, 4)):
        apply_batch(table, b, epoch=i)
    got = read_current(table).select(
        "url", "warc_ts", "event_id", "text", "lang", "fetch_status"
    )
    assert state_fingerprint(got) == state_fingerprint(expected_final(events))


def test_replay_and_reorder_equivalence(spark, events, tmp_table_dir):
    import tempfile, shutil

    batches = split_batches(events, 4)
    fps = []
    for order, replay in [((0, 1, 2, 3), False), ((3, 1, 0, 2), False), ((0, 1, 2, 3), True)]:
        d = tempfile.mkdtemp(prefix="replay_")
        try:
            table = create_pages_table(spark, d, n_buckets=8)
            for i in order:
                apply_batch(table, batches[i], epoch=i)
                if replay:
                    apply_batch(table, batches[i], epoch=i)  # duplicate epoch
            if replay:  # also re-deliver an old epoch at the end
                apply_batch(table, batches[0], epoch=0)
            fps.append(
                state_fingerprint(
                    read_current(table).select(
                        "url", "warc_ts", "event_id", "text", "lang", "fetch_status"
                    )
                )
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)
    assert fps[0] == fps[1] == fps[2]


def test_manifest_lineage(spark, events, tmp_table_dir):
    table = create_pages_table(spark, tmp_table_dir, n_buckets=8)
    batches = split_batches(events, 3)
    for i, b in enumerate(batches):
        apply_batch(table, b, epoch=i)
        apply_batch(table, b, epoch=i)  # replay must not duplicate manifests
    m = table.manifest_df()
    # unique (epoch, source_partition)
    assert m.count() == m.select("epoch", "source_partition").distinct().count()
    # row counts per epoch match the prepared batch sizes
    sizes = {i: prepare_batch(b).count() for i, b in enumerate(batches)}
    got = {r["epoch"]: r["n"] for r in m.groupBy("epoch").agg(F.sum("row_count").alias("n")).collect()}
    assert got == sizes


def test_schema_evolution_fetch_status(spark, events, tmp_table_dir):
    """v4 events promote fetch_status; v1-only prefix has it as NULL."""
    table = create_pages_table(spark, tmp_table_dir, n_buckets=8)
    v1 = events.filter(F.col("schema_version") == 1)
    v4 = events.filter(F.col("schema_version") == 4)
    apply_batch(table, v1, epoch=0)
    apply_batch(table, v4, epoch=1)
    cur = read_current(table)
    assert "fetch_status" in cur.columns
    assert cur.filter(F.col("fetch_status").isNotNull()).count() > 0
    assert cur.filter(F.col("fetch_status").isNull()).count() > 0
    # v3 rename: language in the JSON side-car surfaces as lang
    v3 = events.filter(F.col("schema_version") == 3)
    assert prepare_batch(v3).filter(F.col("lang").isNull() & (F.col("op") != "delete")).count() == 0


def test_tombstone_blocks_late_update(spark, tmp_table_dir):
    """A late update older than a processed delete must not resurrect."""
    from pyspark.sql import Row
    import datetime as dt

    table = create_pages_table(spark, tmp_table_dir, n_buckets=2)

    def ev(eid, op, ts, html):
        return Row(
            event_id=eid,
            op=op,
            url="https://d1.example.com/p/1",
            warc_ts=dt.datetime(2024, 1, 1, 0, 0, ts),
            html=html,
            lang=None,
            schema_version=1,
            payload_extra=None,
            source_partition=0,
            source_offset=0,
            source_file="wal/part-0.log",
            source_pos=0,
        )

    from aus_land_data_etl_spark.cdc.events import EVENT_SCHEMA

    b1 = spark.createDataFrame([ev("e-del", "delete", 30, None)], EVENT_SCHEMA)
    b2 = spark.createDataFrame([ev("e-upd", "update", 10, b"<p>old</p>")], EVENT_SCHEMA)
    apply_batch(table, b1, epoch=0)
    apply_batch(table, b2, epoch=1)  # arrives later, but ts is older
    assert read_current(table).count() == 0
    # and a *newer* update does resurrect
    b3 = spark.createDataFrame([ev("e-new", "update", 50, b"<p>new</p>")], EVENT_SCHEMA)
    apply_batch(table, b3, epoch=2)
    cur = read_current(table).collect()
    assert len(cur) == 1 and cur[0]["text"] == "new"


def test_unknown_schema_version_dead_letters(spark, events, tmp_table_dir):
    """Events with an unregistered schema_version are routed to the
    dead-letter output and excluded from the apply — never guessed at
    (registry contract; the reference's typed-reader error path,
    raw_data/rows.py:106-127)."""
    from aus_land_data_etl_spark.cdc.registry import SchemaRegistry

    reg = SchemaRegistry()
    future = events.withColumn(
        "schema_version",
        F.when(F.pmod(F.xxhash64("event_id"), F.lit(10)) == 0, F.lit(99)).otherwise(
            F.col("schema_version")
        ),
    )
    n_bad = reg.dead_letter(future).count()
    n_ok = reg.valid(future).count()
    assert n_bad > 0 and n_bad + n_ok == future.count()
    assert reg.dead_letter(future).select("schema_version").distinct().collect()[0][
        0
    ] == 99

    table = create_pages_table(spark, tmp_table_dir, n_buckets=8)
    apply_batch(table, reg.valid(future), epoch=0, registry=reg)
    # converged state contains only keys whose winning event was valid
    exp = expected_final(reg.valid(future))
    assert state_fingerprint(read_current(table).select(
        "url", "warc_ts", "event_id", "text", "lang", "fetch_status"
    )) == state_fingerprint(exp)


def test_extreme_hot_domain_convergence(spark, tmp_table_dir):
    """Skew stress (north star: 'skew from hot domains'): 95% of events on
    one domain must still converge byte-identically in BOTH modes — the
    salted CoW path (two-level LWW reduce bounds any one task's share of
    the hot key) and the MoR path (fanout write never shuffles on the
    key at all)."""
    hot = generate_events(spark, 4000, seed=44, hot_fraction=0.95, n_urls=300)
    want = state_fingerprint(
        expected_final(hot).select(
            "url", "warc_ts", "event_id", "text", "lang", "fetch_status"
        )
    )
    import shutil
    import tempfile

    for mode in ("cow", "mor"):
        d = tempfile.mkdtemp(prefix=f"skew_{mode}_")
        try:
            t = create_pages_table(spark, d, n_buckets=8)
            for i, b in enumerate(split_batches(hot, 4)):
                apply_batch(t, b, epoch=i, mode=mode, n_salts=8)
            got = state_fingerprint(
                read_current(t).select(
                    "url", "warc_ts", "event_id", "text", "lang", "fetch_status"
                )
            )
            assert got == want, f"mode={mode} diverged under 95% hot-domain skew"
        finally:
            shutil.rmtree(d, ignore_errors=True)


def test_unknown_schema_events_quarantined(spark, tmp_table_dir):
    """Dead-letter queue: a producer shipping a schema_version this
    consumer predates must not silently lose events — they are
    quarantined byte-complete under _dead_letter/, excluded from the
    table, and a replay of the batch keeps exactly one copy."""
    from aus_land_data_etl_spark.cdc.apply import read_dead_letters

    ev = generate_events(spark, 400, seed=55).localCheckpoint(eager=True)
    is_bad = F.pmod(F.col("source_pos"), F.lit(10)) == 0
    batch = ev.withColumn(
        "schema_version",
        F.when(is_bad, F.lit(99)).otherwise(F.col("schema_version")),
    ).localCheckpoint(eager=True)
    n_bad = batch.filter(F.col("schema_version") == 99).count()
    assert n_bad > 0

    t = create_pages_table(spark, tmp_table_dir, n_buckets=4)
    apply_batch(t, batch, epoch=0)
    dl = read_dead_letters(t)
    assert dl.count() == n_bad
    # byte-complete quarantine: html payloads survive exactly
    src = {
        r["event_id"]: bytes(r["html"] or b"")
        for r in batch.filter(F.col("schema_version") == 99)
        .select("event_id", "html")
        .collect()
    }
    got = {
        r["event_id"]: bytes(r["html"] or b"")
        for r in dl.select("event_id", "html").collect()
    }
    assert got == src
    # the table itself holds only the valid rows
    valid = batch.filter(F.col("schema_version") != 99)
    want = state_fingerprint(
        expected_final(valid).select(
            "url", "warc_ts", "event_id", "text", "lang", "fetch_status"
        )
    )
    assert state_fingerprint(
        read_current(t).select(
            "url", "warc_ts", "event_id", "text", "lang", "fetch_status"
        )
    ) == want
    # replay: still one copy, no version advance
    v = t.current_version()
    apply_batch(t, batch, epoch=0)
    assert t.current_version() == v
    assert read_dead_letters(t).count() == n_bad


def test_dead_letter_replay_after_registry_learns_version(
    spark, tmp_table_dir, tmp_path
):
    """The repair half of the quarantine contract: once the registry
    learns a version, ``replay_dead_letters`` re-applies the quarantined
    rows through the exactly-once path and the table converges to
    EXACTLY the state a registry that knew the version at ingest time
    would have produced (engine-vs-engine differential).  Partial
    knowledge replays partially; a second replay is a no-op."""
    from aus_land_data_etl_spark.cdc.apply import (
        read_dead_letters,
        replay_dead_letters,
    )
    from aus_land_data_etl_spark.cdc.registry import SchemaRegistry

    ev = generate_events(spark, 400, seed=56).localCheckpoint(eager=True)
    pos = F.pmod(F.col("source_pos"), F.lit(10))
    batch = ev.withColumn(
        "schema_version",
        F.when(pos == 0, F.lit(98))
        .when(pos == 1, F.lit(99))
        .otherwise(F.col("schema_version")),
    ).localCheckpoint(eager=True)
    n98 = batch.filter(F.col("schema_version") == 98).count()
    n99 = batch.filter(F.col("schema_version") == 99).count()
    assert n98 > 0 and n99 > 0

    t = create_pages_table(spark, tmp_table_dir, n_buckets=4)
    apply_batch(t, batch, epoch=0)  # default registry: 98+99 quarantined
    assert read_dead_letters(t).count() == n98 + n99

    # the registry learns 99 (but not 98): partial replay
    knows99 = SchemaRegistry(versions=(1, 2, 3, 4, 99))
    r1 = replay_dead_letters(t, registry=knows99)
    assert r1 == {"replayed": n99, "still_dead": n98, "epochs": 1}
    left = read_dead_letters(t)
    assert left.count() == n98
    assert left.select("schema_version").distinct().collect()[0][0] == 98

    # then 98 too: everything drains
    knows_all = SchemaRegistry(versions=(1, 2, 3, 4, 98, 99))
    r2 = replay_dead_letters(t, registry=knows_all)
    assert r2 == {"replayed": n98, "still_dead": 0, "epochs": 1}
    assert read_dead_letters(t).count() == 0

    # differential: identical to a single ingest under the knowing registry
    t2 = create_pages_table(spark, str(tmp_path / "ref"), n_buckets=4)
    apply_batch(t2, batch, epoch=0, registry=knows_all)
    cols = ["url", "warc_ts", "event_id", "text", "lang", "fetch_status"]
    assert state_fingerprint(read_current(t).select(*cols)) == state_fingerprint(
        read_current(t2).select(*cols)
    )

    # replay with nothing quarantined: pure no-op
    v = t.current_version()
    assert replay_dead_letters(t, registry=knows_all) == {
        "replayed": 0, "still_dead": 0, "epochs": 0,
    }
    assert t.current_version() == v


def test_generator_offset_base_continues_wal(spark):
    """A second generated WAL segment with offset_base continues the
    binlog positions — no per-(partition, offset) overlap with the
    first, so applying both segments lands both (offsets identify
    deliveries; a segment re-using 0.. would correctly replay-skip)."""
    a = generate_events(spark, 100, seed=1, dup_fraction=0.0)
    b = generate_events(spark, 50, seed=2, offset_base=100, dup_fraction=0.0)
    amax = a.agg(F.max("source_pos")).first()[0]
    bmin = b.agg(F.min("source_pos")).first()[0]
    assert bmin == amax + 1
    overlap = (
        a.select("source_partition", "source_offset")
        .join(
            b.select("source_partition", "source_offset"),
            ["source_partition", "source_offset"],
        )
        .count()
    )
    assert overlap == 0
    # event ids are globally unique across segments
    assert a.select("event_id").union(b.select("event_id")).distinct().count() == 150
