"""Driver-side Murmur3 parity with Spark's F.hash + lookup job count.

Round-3 verdict #5: the serving-side point read must not launch a Spark
job just to compute the bucket id.  key_bucket is driver-side Python
Murmur3 now; these tests pin (a) exact hash parity with Spark over 1k
randomized keys per type, (b) that lookup() issues exactly one job.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from aus_land_data_etl_spark.cdc.apply import apply_batch, create_pages_table
from aus_land_data_etl_spark.cdc.generator import generate_events
from aus_land_data_etl_spark.lake.table import bucket_of, spark_hash_value


def test_driver_side_murmur3_parity_1k_keys(spark):
    """bucket_of (pure-Python Murmur3) must equal Spark's own
    pmod(hash(key), n) for 1k randomized keys per type: strings covering
    all byte-length residues mod 4 (Spark's tail handling) including
    multi-byte UTF-8 and empty, binary, int, long."""
    rng = random.Random(7)
    pieces = ["a", "é", "日", "\U0001f680", "-", "0", "/", " ", "x" * 7]
    strings = ["", "a", "ab", "abc", "abcd"] + [
        "".join(rng.choice(pieces) for _ in range(rng.randint(1, 24)))
        for _ in range(495)
    ]
    ints = [0, 1, -1, 2**31 - 1, -(2**31)] + [
        rng.randint(-(2**31), 2**31 - 1) for _ in range(245)
    ]
    longs = [0, -1, 2**63 - 1, -(2**63)] + [
        rng.randint(-(2**63), 2**63 - 1) for _ in range(246)
    ]
    n = 32

    sdf = spark.createDataFrame(
        [(s,) for s in strings],
        T.StructType([T.StructField("k", T.StringType())]),
    ).select(F.hash("k").alias("h"), F.pmod(F.hash("k"), F.lit(n)).alias("b"))
    for s, r in zip(strings, sdf.collect()):
        assert spark_hash_value(s, T.StringType()) == r["h"], repr(s)
        assert bucket_of(s, n, T.StringType()) == r["b"], repr(s)

    bdf = spark.createDataFrame(
        [(s.encode(),) for s in strings],
        T.StructType([T.StructField("k", T.BinaryType())]),
    ).select(F.hash("k").alias("h"))
    for s, r in zip(strings, bdf.collect()):
        assert spark_hash_value(s.encode(), T.BinaryType()) == r["h"], repr(s)

    idf = spark.createDataFrame(
        [(i,) for i in ints],
        T.StructType([T.StructField("k", T.IntegerType())]),
    ).select(F.hash("k").alias("h"))
    for i, r in zip(ints, idf.collect()):
        assert spark_hash_value(i, T.IntegerType()) == r["h"], i

    ldf = spark.createDataFrame(
        [(i,) for i in longs],
        T.StructType([T.StructField("k", T.LongType())]),
    ).select(F.hash("k").alias("h"))
    for i, r in zip(longs, ldf.collect()):
        assert spark_hash_value(i, T.LongType()) == r["h"], i


def test_lookup_issues_exactly_one_job(spark, tmp_table_dir):
    t = create_pages_table(spark, tmp_table_dir, n_buckets=8)
    ev = generate_events(spark, 500, seed=13)
    apply_batch(t, ev, epoch=0, mode="cow")
    key = ev.select("url").first()["url"]

    sc = spark.sparkContext
    group = "lookup-one-job"
    sc.setJobGroup(group, "point lookup job count")
    try:
        rows = t.lookup(key).collect()
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    finally:
        sc.setJobGroup("", "")
    assert len(rows) == 1
    assert n_jobs == 1, f"lookup launched {n_jobs} jobs, expected 1"


def test_timestamp_hash_parity(spark):
    """Timestamp keys hash as epoch microseconds (incl. pre-epoch and
    microsecond-precision values) — the driver-side path must match
    F.hash exactly or a timestamp-keyed lookup would silently open the
    wrong bucket."""
    import datetime as dt

    rng = random.Random(3)
    tss = [
        dt.datetime(1970, 1, 1),
        dt.datetime(2024, 2, 29, 23, 59, 59),
        dt.datetime(1969, 12, 31, 23, 0, 0),  # negative epoch micros
    ] + [
        dt.datetime(2000, 1, 1)
        + dt.timedelta(
            seconds=rng.randint(0, 10**9), microseconds=rng.randint(0, 999999)
        )
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(t,) for t in tss],
        T.StructType([T.StructField("k", T.TimestampType())]),
    ).select(F.hash("k").alias("h"))
    for t, r in zip(tss, df.collect()):
        assert spark_hash_value(t, T.TimestampType()) == r["h"], t
