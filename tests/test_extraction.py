"""Extraction fixtures (FIXTURES.md §3): byte-identical, deterministic.

The analog of the reference's snapshot + differential parser tests
(/root/reference/lib/pipeline/nsw_vg/property_sales/file_format/tests/
test_parse_e2e.py) — golden outputs per fixture case, plus the invariant
that the distributed UDF output is byte-identical to the pure function.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aus_land_data_etl_spark.functions.text import (
    extract_text_bytes,
    extract_text_udf,
    lang_id,
)

CASES = [
    ("utf8-basic", b"<html><body><p>hello world</p></body></html>", "hello world"),
    (
        "latin1-fallback",
        "<p>caf\xe9 cr\xe8me</p>".encode("iso-8859-1"),
        "caf\xe9 cr\xe8me",
    ),
    (
        "nested-tags",
        b"<div><span>a</span><b>b</b> <i>c</i></div>",
        "a b c",
    ),
    (
        "entity-refs",
        b"<p>fish &amp; chips &lt;now&gt; &#8364;5</p>",
        "fish & chips <now> €5",
    ),
    ("empty-body", b"<html><body></body></html>", ""),
    (
        "script-style-dropped",
        b"<script>var x='<p>no</p>';</script><style>p{}</style><p>yes</p>",
        "yes",
    ),
    (
        "comments-dropped",
        b"<p>keep</p><!-- <p>gone</p> --><p>tail</p>",
        "keep tail",
    ),
    (
        "multibyte-utf8",
        "<p>日本語 — ok</p>".encode("utf-8"),
        "日本語 — ok",
    ),
    ("none-input", None, None),
    (
        "nbsp-collapse",
        b"<p>a&nbsp;&nbsp;b\xc2\xa0c</p>",
        "a b c",
    ),
    (
        "whitespace-collapse",
        b"<p>a\t \tb</p>\n\n\n<p>c</p>",
        "a b\nc",
    ),
]


@pytest.mark.parametrize("name,raw,expected", CASES, ids=[c[0] for c in CASES])
def test_extract_golden(name, raw, expected):
    assert extract_text_bytes(raw) == expected


def test_udf_matches_pure_function(spark):
    """Differential: the Arrow-batched UDF ≡ the pure function, byte for
    byte, over every fixture (the reference's two-implementation parse
    comparison, test_parse_e2e.py:21-46)."""
    rows = [(n, r) for n, r, _ in CASES]
    df = spark.createDataFrame(rows, "name string, html binary")
    got = {
        r["name"]: r["t"]
        for r in df.select("name", extract_text_udf("html").alias("t")).collect()
    }
    for name, raw, _ in CASES:
        assert got[name] == extract_text_bytes(raw), name


def test_extract_deterministic_across_partitionings(spark):
    rows = [(f"u{i}", f"<p>doc {i} &amp; more</p>".encode()) for i in range(500)]
    df1 = spark.createDataFrame(rows, "url string, html binary").repartition(13)
    df2 = spark.createDataFrame(rows, "url string, html binary").repartition(2)
    h = lambda d: d.select(
        F.bit_xor(F.xxhash64("url", extract_text_udf("html"))).alias("h")
    ).collect()[0]["h"]
    assert h(df1) == h(df2)


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is here with that", "en"),
            ("der hund und die katze ist nicht ein", "de"),
            ("le chat est dans la maison des gens", "fr"),
            ("el perro y los gatos por una casa como", "es"),
            ("zzz qqq", "und"),
        ],
        "text string, expected string",
    )
    rows = df.select("expected", lang_id("text").alias("got")).collect()
    for r in rows:
        assert r["got"] == r["expected"]
