"""Maintenance ops: dim upsert (K2), snapshot expiry, widening read."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from aus_land_data_etl_spark.lake.merge import append_if_absent
from aus_land_data_etl_spark.lake.table import LakeTable

DIM_SCHEMA = T.StructType(
    [
        T.StructField("zone_code", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("ord", T.LongType(), True),
    ]
)


def _dim(spark, codes, tag):
    return spark.createDataFrame(
        [(c, f"{tag}-{c}", i) for i, c in enumerate(codes)], DIM_SCHEMA
    )


def test_append_if_absent_idempotent(spark, tmp_table_dir):
    t = LakeTable.create(spark, tmp_table_dir, DIM_SCHEMA, "zone_code", "ord", n_buckets=4)
    append_if_absent(t, _dim(spark, ["R1", "R2", "B3"], "v1"))
    assert t.read().count() == 3
    # conflicting re-insert keeps the FIRST version (insert-if-absent)
    append_if_absent(t, _dim(spark, ["R2", "E4"], "v2"))
    rows = {r["zone_code"]: r["label"] for r in t.read().collect()}
    assert rows == {"R1": "v1-R1", "R2": "v1-R2", "B3": "v1-B3", "E4": "v2-E4"}
    # replay of the same batch is a no-op
    append_if_absent(t, _dim(spark, ["R2", "E4"], "v2"))
    assert t.read().count() == 4


def test_expire_snapshots_keeps_current_readable(spark, tmp_table_dir):
    import os

    t = LakeTable.create(spark, tmp_table_dir, DIM_SCHEMA, "zone_code", "ord", n_buckets=2)
    for i in range(5):
        append_if_absent(t, _dim(spark, [f"Z{i}"], f"v{i}"))
    v = t.current_version()
    before = t.read().count()
    t.expire_snapshots(keep_last=2)
    assert t.current_version() == v
    assert t.read().count() == before
    # ancient snapshot descriptors are gone
    snaps = [f for f in os.listdir(os.path.join(tmp_table_dir, "_snapshots")) if f.startswith("v")]
    assert len(snaps) == 2
    # data dirs referenced by no kept snapshot were removed
    data_dirs = os.listdir(os.path.join(tmp_table_dir, "data"))
    live = set()
    for k in range(max(0, v - 1), v + 1):
        s = t.snapshot(k)
        for fs in list(s.bucket_files.values()) + list(s.delta_files.values()):
            live.update(p.split(os.sep)[1] for p in fs)
    assert set(data_dirs) == live


def test_widened_int_files_read_as_long(spark, tmp_table_dir):
    """Type-widening evolution: parquet written int32 must read under a
    snapshot schema declaring long (Spark 4 parquet widening)."""
    import os

    p = os.path.join(tmp_table_dir, "ints")
    spark.range(10).select(F.col("id").cast("int").alias("ord")).write.parquet(p)
    widened = T.StructType([T.StructField("ord", T.LongType(), True)])
    got = spark.read.schema(widened).parquet(p)
    assert got.schema["ord"].dataType == T.LongType()
    assert got.agg(F.sum("ord")).collect()[0][0] == 45


def test_expire_reclaims_folded_fanout_delta_dirs(spark, tmp_table_dir):
    """Fanout delta files live at the snapshot-dir top level (no bucket
    subdirs); once folded into a new base and aged out of the kept window
    their directories must be reclaimed too."""
    import os

    from aus_land_data_etl_spark.cdc.apply import apply_batch, create_pages_table
    from aus_land_data_etl_spark.cdc.generator import generate_events
    from aus_land_data_etl_spark.lake.merge import fold_deltas, read_current

    t = create_pages_table(spark, tmp_table_dir, n_buckets=4)
    ev = generate_events(spark, 400, seed=3)
    for i in range(3):  # three fanout delta commits
        apply_batch(t, ev.filter(F.pmod(F.col("source_pos"), F.lit(3)) == i), epoch=i)
    assert t.snapshot().delta_files  # fanout stack exists
    fold_deltas(t, tiebreak_col="event_id")
    n = read_current(t).count()
    t.expire_snapshots(keep_last=1)
    assert read_current(t).count() == n  # current state untouched
    data_dirs = set(os.listdir(os.path.join(tmp_table_dir, "data")))
    live = set()
    for fs in list(t.snapshot().bucket_files.values()) + list(
        t.snapshot().delta_files.values()
    ):
        live.update(p.split(os.sep)[1] for p in fs)
    assert data_dirs == live  # every unreferenced dir (incl. fanout) gone
