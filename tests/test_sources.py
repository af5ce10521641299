"""Sources: encoding fallback, PSV, multi-record scan, snapshot policies."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from aus_land_data_etl_spark.sources.readers import (
    DiscoveryMode,
    filename_date,
    read_csv_with_fallback,
    read_psv,
    scan_delimited_records,
    with_parent_context,
)


@pytest.fixture()
def srcdir():
    with tempfile.TemporaryDirectory(prefix="src_") as d:
        yield d


def test_csv_utf8(spark, srcdir):
    p = os.path.join(srcdir, "a.csv")
    with open(p, "w", encoding="utf-8") as f:
        f.write("name,city\nJosé,Müller\nplain,ascii\n")
    df = read_csv_with_fallback(spark, srcdir)
    rows = {r["name"] for r in df.collect()}
    assert rows == {"José", "plain"}


def test_csv_latin1_fallback(spark, srcdir):
    p = os.path.join(srcdir, "a.csv")
    with open(p, "wb") as f:
        f.write("name,city\nJosé,X\n".encode("iso-8859-1"))
    df = read_csv_with_fallback(spark, srcdir)
    assert df.collect()[0]["name"] == "José"


def test_csv_mixed_encodings_per_file(spark, srcdir):
    """One directory mixing UTF-8 and ISO-8859-1 files: the fallback is
    per FILE (single pass over the bytes), so both decode losslessly —
    a whole-scan encoding choice would mojibake one of them."""
    with open(os.path.join(srcdir, "a.csv"), "w", encoding="utf-8") as f:
        f.write("name,city\nJosé,Zürich\n")
    with open(os.path.join(srcdir, "b.csv"), "wb") as f:
        f.write("name,city\nRenée,Orléans\n".encode("iso-8859-1"))
    df = read_csv_with_fallback(spark, srcdir)
    rows = {(r["name"], r["city"]) for r in df.collect()}
    assert rows == {("José", "Zürich"), ("Renée", "Orléans")}
    assert not any("�" in (n or "") for n, _ in rows)


def test_psv_null_normalisation(spark, srcdir):
    p = os.path.join(srcdir, "g.psv")
    with open(p, "w") as f:
        f.write("ID|NAME|FLAT\n1|MAIN ST|\n2||7\n")
    df = read_psv(spark, srcdir + "/*.psv")
    rows = df.orderBy("ID").collect()
    assert rows[0]["FLAT"] is None
    assert rows[1]["NAME"] is None


def test_multi_record_scan_and_parent_context(spark, srcdir):
    p = os.path.join(srcdir, "sales_01012021.DAT")
    with open(p, "w") as f:
        f.write(
            "A;2021;FILE1\n"
            "B;P1;100\n"
            "C;P1;desc part one\n"
            "B;P2;200\n"
            "A;2021;FILE2\n"
            "B;P3;300\n"
            "Z;3\n"
        )
    recs = scan_delimited_records(spark, srcdir)
    assert recs.count() == 7
    kinds = {r["kind"] for r in recs.select("kind").distinct().collect()}
    assert kinds == {"A", "B", "C", "Z"}
    # B rows inherit the preceding A header (file context carry)
    ctx = with_parent_context(recs, "A")
    b_rows = ctx.filter(F.col("kind") == "B").orderBy("position").collect()
    assert [r["parent_fields"][1] for r in b_rows] == ["FILE1", "FILE1", "FILE2"]
    # byte positions are strictly increasing within the file
    pos = [r["position"] for r in recs.orderBy("position").collect()]
    assert pos == sorted(pos) and len(set(pos)) == 7
    # filename→date lineage
    d = recs.select(filename_date().alias("d")).first()["d"]
    assert str(d) == "2021-01-01"


def test_discovery_modes(spark):
    targets = spark.createDataFrame(
        [(2019, "f19"), (2020, "f20"), (2021, "f21"), (2022, "f22")],
        "year int, file string",
    )
    assert DiscoveryMode("latest").select(targets).collect()[0]["year"] == 2022
    assert DiscoveryMode("all").select(targets).count() == 4
    assert DiscoveryMode("these_years", years=[2020, 2022]).select(targets).count() == 2
    assert {
        r["year"] for r in DiscoveryMode("each_nth_year", n=2).select(targets).collect()
    } == {2020, 2022}
