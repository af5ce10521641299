"""Curation operators: domain caps, decontamination, sequence packing —
edge cases beyond the driver oracles (empty text, short docs, oversized
documents, cap larger than group)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aus_land_data_etl_spark.operators.curation import (
    cap_per_group,
    decontaminate,
    pack_sequences,
    word_shingles,
)


def test_word_shingles_edges(spark):
    df = spark.createDataFrame(
        [
            (1, "one two three four five six"),
            (2, "too short"),
            (3, ""),
            (4, None),
            (5, "  spaced   Out   a b c  d  "),
        ],
        "id long, text string",
    )
    got = {
        r["id"]: r["sh"]
        for r in df.select("id", word_shingles(F.col("text"), 5).alias("sh")).collect()
    }
    assert got[1] == ["one two three four five", "two three four five six"]
    assert got[2] == [] and got[3] == [] and got[4] == []
    assert got[5] == ["spaced out a b c", "out a b c d"]


def test_cap_per_group_keeps_best_and_small_groups(spark):
    df = spark.createDataFrame(
        [(g, i, 10 * i) for g in range(2) for i in range(6)] + [(9, 0, 5)],
        "grp long, id long, score long",
    )
    got = cap_per_group(
        df, "grp", order_by=[F.desc("score"), F.asc("id")], max_per_group=3
    )
    rows = {(r["grp"], r["id"]) for r in got.collect()}
    assert rows == {(0, 5), (0, 4), (0, 3), (1, 5), (1, 4), (1, 3), (9, 0)}


def test_decontaminate_drops_only_overlapping(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here thanks a lot folks"),
            (3, "short"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps far away")],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in decontaminate(docs, bench, n=5).collect()}
    # doc 1 shares "the quick brown fox jumps"; doc 3 too short to shingle
    assert kept == {2, 3}


def test_pack_sequences_contiguous_fill_and_oversize(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 250), (4, 10), (5, 500), (6, 1)],
        "id long, n long",
    )
    got = {
        r["id"]: r["bin_id"]
        for r in pack_sequences(
            df, "n", budget=256, order_by=[F.asc("id")]
        ).collect()
    }
    # exclusive running sums: 0,100,200,450,460,960
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 3}
    # deterministic under repartition
    got2 = {
        r["id"]: r["bin_id"]
        for r in pack_sequences(
            df.repartition(5), "n", budget=256, order_by=[F.asc("id")]
        ).collect()
    }
    assert got2 == got


def test_dup_ngram_frac_edges(spark):
    from aus_land_data_etl_spark.operators.curation import dup_ngram_frac

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # 2-grams: ab ba ab ba ab -> 2/5 distinct
            (2, "all words unique here now"),
            (3, "x"),                 # no 2-grams
            (4, None),
            (5, "same same same same"),
        ],
        "id long, text string",
    )
    got = {
        r["id"]: r["f"]
        for r in df.select("id", dup_ngram_frac(F.col("text"), 2).alias("f")).collect()
    }
    assert got[1] == round(1 - 2 / 5, 6)
    assert got[2] == 0.0
    assert got[3] == 0.0 and got[4] == 0.0
    assert got[5] == round(1 - 1 / 3, 6)


def test_pack_sequences_bucketed_semantics_and_plan(spark):
    """The parallel packing variant: (a) within every hash bucket the
    contiguous-fill invariant holds (a bin never exceeds the budget
    unless a single document does); (b) global bin ids are disjoint
    across buckets and reproducible under repartition; (c) THE PLAN HAS
    NO SinglePartition EXCHANGE — the window partitions by the bucket
    (the round-4 verdict's scale requirement)."""
    from aus_land_data_etl_spark.operators.curation import (
        pack_sequences_bucketed,
    )

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37, F.lit(90)) + 1).alias("n"),
    )
    out = pack_sequences_bucketed(
        df, "doc_id", "n", budget=256, order_by=[F.asc("doc_id")], n_buckets=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(pack_bucket" in plan, plan

    rows = out.collect()
    # (b) bin id encodes its bucket; assignment is partition-independent
    assert all(r["bin_id"] % 8 == r["pack_bucket"] for r in rows)
    again = {
        r["doc_id"]: r["bin_id"]
        for r in pack_sequences_bucketed(
            df.repartition(7),
            "doc_id",
            "n",
            budget=256,
            order_by=[F.asc("doc_id")],
            n_buckets=8,
        ).collect()
    }
    assert again == {r["doc_id"]: r["bin_id"] for r in rows}
    # (a) contiguous fill within each bucket: replay the running sum
    from collections import defaultdict

    per_bucket = defaultdict(list)
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        per_bucket[r["pack_bucket"]].append(r)
    for b, rs in per_bucket.items():
        run = 0
        for r in rs:
            assert r["bin_id"] == (run // 256) * 8 + b
            run += r["n"]


def test_hash_sample_by_deterministic_stratified(spark):
    """Per-group deterministic sampling: exact key sets per stratum are
    reproducible under repartition and incremental arrival (a key's
    fate never changes when more data lands), rates track the targets,
    and the default stratum keeps ~default."""
    from aus_land_data_etl_spark.functions.sampling import hash_sample_by

    df = spark.range(20_000).select(
        F.col("id").alias("k"), F.pmod("id", F.lit(4)).alias("g")
    )
    fr = {0: 1.0, 1: 0.5, 2: 0.1}
    kept = hash_sample_by(df, "k", "g", fr, default=0.0).collect()
    by_g = {}
    for r in kept:
        by_g.setdefault(r["g"], set()).add(r["k"])
    assert 3 not in by_g  # default 0 -> dropped stratum
    assert len(by_g[0]) == 5000
    assert abs(len(by_g[1]) / 5000 - 0.5) < 0.05
    assert abs(len(by_g[2]) / 5000 - 0.1) < 0.03
    # repartition + subset stability
    again = {
        (r["k"], r["g"])
        for r in hash_sample_by(
            df.repartition(13), "k", "g", fr, default=0.0
        ).collect()
    }
    assert again == {(r["k"], r["g"]) for r in kept}
    sub = {
        r["k"]
        for r in hash_sample_by(
            df.filter(F.col("k") < 1000), "k", "g", fr, default=0.0
        ).collect()
    }
    assert sub == {k for g in by_g.values() for k in g if k < 1000}


def test_dedup_lines_removes_cross_doc_boilerplate(spark):
    from aus_land_data_etl_spark.operators.curation import dedup_lines

    docs = spark.createDataFrame(
        [
            (1, "COOKIE Banner\nunique prose one\n\nshared footer"),
            (2, "cookie banner\nother words here\nshared footer"),
            (3, "cookie banner\nmore distinct stuff"),
            (4, "all alone doc"),
            (5, "cookie banner"),   # becomes a husk, must not vanish
            (6, None),              # NULL text -> one empty line, kept
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
        for r in dedup_lines(docs, min_docs=2).collect()
    }
    # duplicate detection is case/whitespace-insensitive, originals kept
    assert got[1] == ("unique prose one\n", 4, 2)  # blank line is structure
    assert got[2] == ("other words here", 3, 1)
    assert got[3] == ("more distinct stuff", 2, 1)
    assert got[4] == ("all alone doc", 1, 1)
    assert got[5] == ("", 1, 0)
    assert got[6] == ("", 1, 1)  # empty line never counts as boilerplate
    assert len(got) == 6


def test_dedup_lines_threshold_and_order(spark):
    from aus_land_data_etl_spark.operators.curation import dedup_lines

    docs = spark.createDataFrame(
        [(i, "dup line\nkeep %d\ndup line" % i) for i in range(1, 4)],
        "doc_id long, text string",
    )
    # below threshold: nothing removed, text byte-identical
    same = dedup_lines(docs, min_docs=4).collect()
    assert all(r["text"] == "dup line\nkeep %d\ndup line" % r["doc_id"] for r in same)
    # at threshold: both copies of the duplicated line go, order survives
    got = {r["doc_id"]: r["text"] for r in dedup_lines(docs, min_docs=3).collect()}
    assert got == {1: "keep 1", 2: "keep 2", 3: "keep 3"}


def test_redact_pii_matches_python_re(spark):
    import re

    from aus_land_data_etl_spark.functions.text import (
        EMAIL_PATTERN,
        IPV4_PATTERN,
        PHONE_PATTERN,
        redact_pii,
    )

    samples = [
        "mail bob.smith+x@foo-bar.co.uk now",
        "a@b.co and c.d@e-f.org.au together",
        "server 192.168.0.1 and 10.0.0.255 ok",
        "call +1 415-555-0142 or (415) 555.0143",
        "edge 999.999.999.999 still ip-shaped",
        "no pii here, just v1.2 and 42",
        "combo x@y.zz at 8.8.8.8 ring 0400 123 456",
        "",
    ]

    def py_redact(s: str) -> str:
        s = re.sub(EMAIL_PATTERN, "<EMAIL>", s)
        s = re.sub(IPV4_PATTERN, "<IP>", s)
        s = re.sub(PHONE_PATTERN, "<PHONE>", s)
        return s

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "id long, text string"
    )
    got = {
        r["id"]: r["r"]
        for r in df.select("id", redact_pii("text").alias("r")).collect()
    }
    for i, s in enumerate(samples):
        assert got[i] == py_redact(s), (s, got[i], py_redact(s))
