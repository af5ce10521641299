"""File sources (SURVEY.md §2.1 S1–S10) re-expressed Spark-first.

The reference streams files through hand-rolled async readers; here every
source is a declarative ``spark.read`` so Catalyst gets pushdown/pruning,
with small helpers for the semantics Spark lacks out of the box:

- S3  CSV with encoding fallback (utf-8 → ISO-8859-1)
- S4  pipe-delimited PSV with ''→NULL
- S1  versioned multi-record-type text scan (.DAT analog) via mapInPandas
- S9  incremental snapshot selection (vintage policies)
- F7  filename→date lineage extraction
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv_with_fallback(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    encodings: tuple[str, ...] = ("UTF-8", "ISO-8859-1"),
    sep: str = ",",
    **options,
) -> DataFrame:
    """CSV scan with PER-FILE encoding fallback in ONE pass over the bytes.

    Reference: land-values ingest retries ISO-8859-1 when UTF-8 decode
    fails (/root/reference/lib/pipeline/nsw_vg/land_values/ingest.py:137-177)
    — a per-file try/except.  Restated without a probe pass: each file's
    bytes are read once (binaryFile), decoded with ``encodings[0]`` and,
    on UnicodeDecodeError, re-decoded in memory with the fallback (no
    second scan); the decoded lines are then parsed JVM-side with
    ``from_csv``.  A directory may freely mix encodings per file — the
    failure mode of any whole-scan encoding choice.

    Column names come from ``schema`` when given, else from the header of
    the first file (one bounded driver-side read).  Limitation: records
    must not contain embedded newlines (true of the reference's sources);
    per-file decode is inherently file-at-a-time, so files should be the
    usual many-small-files shape, not one giant blob.
    """
    enc0, enc1 = encodings[0], encodings[1]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for content in pdf["content"]:
                data = bytes(content)
                try:
                    text = data.decode(enc0)
                except UnicodeDecodeError:
                    text = data.decode(enc1)
                lines = text.splitlines()[1:]  # drop per-file header
                if lines:
                    frames.append(pd.DataFrame({"value": lines}))
            yield pd.concat(frames) if frames else pd.DataFrame({"value": []})

    raw = spark.read.format("binaryFile").load(path).select("content")
    lines = raw.mapInPandas(decode, schema="value string")

    if schema is not None:
        ddl = schema
    else:
        first = raw.limit(1).collect()
        if not first:
            return spark.createDataFrame([], T.StructType([]))
        data = bytes(first[0]["content"])
        try:
            header = data.decode(enc0).splitlines()[0]
        except UnicodeDecodeError:
            header = data.decode(enc1).splitlines()[0]
        names = [c.strip().strip('"') for c in header.split(sep)]
        ddl = T.StructType([T.StructField(n, T.StringType()) for n in names])
    ddl_str = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in ddl.fields)
    parsed = lines.select(
        F.from_csv(F.col("value"), ddl_str, {"sep": sep, **options}).alias("r")
    )
    return parsed.select("r.*")


def read_psv(
    spark: SparkSession, path: str, schema: T.StructType | None = None, **options
) -> DataFrame:
    """Pipe-delimited PSV (GNAF analog): header row, '' → NULL.

    Reference: /root/reference/lib/pipeline/gnaf/ingestion.py:43-66.
    """
    reader = spark.read.options(header=True, sep="|", nullValue="", **options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


# ---------------------------------------------------------------------------
# S1: versioned multi-record-type scan (.DAT analog)
# ---------------------------------------------------------------------------

#: Output of the record scan: one row per record with its file lineage,
#: position, record kind and raw fields (typed projection happens in the
#: schema registry, exactly like the CDC path).
RECORD_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("position", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("fields", T.ArrayType(T.StringType())),
    ]
)


def scan_delimited_records(
    spark: SparkSession,
    path: str,
    field_sep: str = ";",
    kinds: tuple[str, ...] = ("A", "B", "C", "D", "Z"),
) -> DataFrame:
    """Multi-record-type delimited scan (the .DAT family, S1).

    Reference: ``PropertySalesParser.get_rows`` splits semicolon-delimited
    files whose first field names the record kind (A/B/C/D/Z), carrying
    byte positions for lineage
    (/root/reference/lib/pipeline/nsw_vg/property_sales/file_format/
    parse.py:71-177).  Spark restatement: whole files via ``binaryFile``
    (records cross line boundaries, so line-splitting is wrong), then an
    Arrow-batched ``mapInPandas`` splitter emitting (file, position, kind,
    fields) rows.  Per-file work parallelises across tasks; per-record
    work is vectorised pandas.
    """
    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def split_records(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"source_file": [], "position": [], "kind": [], "fields": []}
            for path_, content in zip(pdf["path"], pdf["content"]):
                try:
                    text = bytes(content).decode("utf-8")
                except UnicodeDecodeError:
                    text = bytes(content).decode("iso-8859-1")
                pos = 0
                for line in text.splitlines():
                    stripped = line.strip()
                    if stripped:
                        fields = stripped.split(field_sep)
                        kind = fields[0]
                        if kind in kinds:
                            out["source_file"].append(path_)
                            out["position"].append(pos)
                            out["kind"].append(kind)
                            out["fields"].append(fields[1:])
                    pos += len(line.encode("utf-8")) + 1
            yield pd.DataFrame(out)

    return raw.mapInPandas(split_records, schema=RECORD_SCHEMA)


def with_parent_context(
    records: DataFrame,
    parent_kind: str,
    context_name: str = "parent_fields",
) -> DataFrame:
    """Attach the most recent parent record's fields to each row.

    Reference: B rows inherit their A row's file-header context
    (parse.py:91-130).  Spark: ``last(..., ignorenulls=True)`` over a
    window ordered by position within each file — the streaming-carry
    pattern from SURVEY.md §2.1.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source_file")
        .orderBy("position")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    parent = F.when(F.col("kind") == parent_kind, F.col("fields"))
    return records.withColumn(context_name, F.last(parent, ignorenulls=True).over(w))


# ---------------------------------------------------------------------------
# S9: incremental snapshot selection policies
# ---------------------------------------------------------------------------


@dataclass
class DiscoveryMode:
    """Vintage-selection policy (reference ``DiscoveryMode``,
    /root/reference/lib/pipeline/nsw_vg/land_values/config.py:25-51):
    which snapshots of a periodically republished dataset to ingest."""

    kind: str  # latest | each_year | each_nth_year | these_years | all
    n: int | None = None
    years: list[int] | None = None

    def select(self, targets: DataFrame, year_col: str = "year") -> DataFrame:
        from pyspark.sql import Window

        if self.kind == "all":
            return targets
        if self.kind == "latest":
            w = Window.orderBy(F.desc(year_col))
            return (
                targets.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        if self.kind == "each_year":
            w = Window.partitionBy(year_col).orderBy(F.desc(year_col))
            return (
                targets.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        if self.kind == "each_nth_year":
            assert self.n
            return self.select_each_year(targets, year_col).filter(
                F.pmod(F.col(year_col), F.lit(self.n)) == 0
            )
        if self.kind == "these_years":
            assert self.years is not None
            return targets.filter(F.col(year_col).isin(self.years))
        raise ValueError(self.kind)

    def select_each_year(self, targets: DataFrame, year_col: str) -> DataFrame:
        from pyspark.sql import Window

        w = Window.partitionBy(year_col).orderBy(F.desc(year_col))
        return (
            targets.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )


def filename_date(col: str = "source_file", pattern: str = r"_(\d{8})\.DAT$", fmt: str = "ddMMyyyy"):
    """F7: filename→date lineage extraction (reference coordinator.py:144-149)."""
    return F.to_date(F.regexp_extract(F.col(col), pattern, 1), fmt)
