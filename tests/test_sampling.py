"""Deterministic hash split/sample: portability (Python md5 recompute),
stability under repartition/increment, weight fidelity."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from aus_land_data_etl_spark.functions.sampling import (
    hash_sample,
    hash_split,
    split_bucket,
)


def _py_bucket(key: str, salt: str = "v1") -> int:
    h = hashlib.md5(f"{key}|{salt}".encode()).hexdigest()
    return int(h[:8], 16) % 1_000_000


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("key")
    )


def test_bucket_matches_python_md5(spark):
    """The bucket is recomputable outside Spark byte-for-byte — the
    portability contract the DuckDB oracle relies on."""
    rows = (
        _docs(spark, 500)
        .select("key", split_bucket("key").alias("b"))
        .collect()
    )
    for r in rows:
        assert r["b"] == _py_bucket(r["key"]), r["key"]


def test_split_stable_under_repartition_and_increment(spark):
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    base = {
        r["key"]: r["split"]
        for r in hash_split(_docs(spark, 1000), "key", w).collect()
    }
    # repartitioned: identical assignment
    shuffled = {
        r["key"]: r["split"]
        for r in hash_split(
            _docs(spark, 1000).repartition(17), "key", w
        ).collect()
    }
    assert shuffled == base
    # incremental arrival: old keys keep their split
    grown = {
        r["key"]: r["split"]
        for r in hash_split(_docs(spark, 2000), "key", w).collect()
    }
    assert {k: grown[k] for k in base} == base


def test_split_weights_approximately_honoured(spark):
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    counts = dict(
        hash_split(_docs(spark, 20000), "key", w)
        .groupBy("split")
        .count()
        .collect()
    )
    n = sum(counts.values())
    assert n == 20000
    for name, frac in w.items():
        assert abs(counts[name] / n - frac) < 0.01, (name, counts)


def test_split_weights_must_sum_to_one(spark):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(_docs(spark, 10), "key", {"a": 0.5, "b": 0.4})


def test_sample_is_subset_and_deterministic(spark):
    docs = _docs(spark, 5000)
    s1 = {r["key"] for r in hash_sample(docs, "key", 0.1).collect()}
    s2 = {r["key"] for r in hash_sample(docs.repartition(9), "key", 0.1).collect()}
    assert s1 == s2
    assert abs(len(s1) / 5000 - 0.1) < 0.02
    # independent salt draws a different (but equally deterministic) set
    s3 = {r["key"] for r in hash_sample(docs, "key", 0.1, salt="v2").collect()}
    assert s3 != s1


def test_split_and_sample_agree(spark):
    """hash_sample(f) selects exactly the first-split keys of
    hash_split({in: f, out: 1-f}) — one primitive, two views."""
    docs = _docs(spark, 3000)
    sampled = {r["key"] for r in hash_sample(docs, "key", 0.25).collect()}
    split = hash_split(docs, "key", {"in": 0.25, "out": 0.75})
    in_split = {
        r["key"] for r in split.filter(F.col("split") == "in").collect()
    }
    assert sampled == in_split
