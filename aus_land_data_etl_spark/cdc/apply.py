"""Micro-batch apply: project → extract → manifest → MERGE.

This is the ``foreachBatch`` body of the streaming pipeline and the unit
the replay/state-equivalence suite drives directly.  Everything in the hot
path is a Catalyst expression or an Arrow-batched pandas UDF — no per-row
Python (input_hint).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.events import PAGES_SCHEMA
from aus_land_data_etl_spark.cdc.registry import SchemaRegistry
from aus_land_data_etl_spark.functions.text import extract_text_udf, lang_id
from aus_land_data_etl_spark.lake.merge import merge_into
from aus_land_data_etl_spark.lake.table import LakeTable

#: Salt count for the two-level hot-key LWW reduction.  0 disables; the
#: bench enables it for the skewed stream.
DEFAULT_SALTS = 8


def create_pages_table(
    spark: SparkSession, root: str, n_buckets: int = 32
) -> LakeTable:
    return LakeTable.create(
        spark,
        root,
        schema=PAGES_SCHEMA,
        key_col="url",
        version_col="warc_ts",
        n_buckets=n_buckets,
    )


def compute_manifest(batch: DataFrame) -> list[dict[str, Any]]:
    """Per-source-partition lineage: offset range, row count, order-
    insensitive checksum of (url, warc_ts, op).

    The checksum uses ``bit_xor`` of per-row hashes — commutative, so the
    same set of rows yields the same checksum regardless of partitioning or
    arrival order (replay comparability).  The reference analog is its
    per-file row-count telemetry + unique file_path lineage
    (/root/reference/lib/pipeline/nsw_vg/land_values/telemetry.py:25-84,
    sql/meta/schema/001_APPLY_init.sql:36-56).
    """
    rows = (
        batch.groupBy("source_partition")
        .agg(
            F.min("source_offset").alias("start_offset"),
            F.max("source_offset").alias("end_offset"),
            F.count("*").alias("row_count"),
            F.expr(
                "conv(cast(bit_xor(xxhash64(url, cast(warc_ts as string), op)) as string), 10, 16)"
            ).alias("checksum"),
        )
        .collect()
    )
    return [
        {
            "source_partition": int(r["source_partition"]),
            "start_offset": int(r["start_offset"]),
            "end_offset": int(r["end_offset"]),
            "row_count": int(r["row_count"]),
            "checksum": str(r["checksum"]),
        }
        for r in rows
    ]


def prepare_batch(events: DataFrame, registry: SchemaRegistry | None = None) -> DataFrame:
    """Raw events → merge-ready rows (projection + text extraction).

    ``text`` is extracted here (not post-merge) so the converged table is
    the pure function of applied events the byte-identical invariant needs;
    ``lang`` falls back to the heuristic classifier when the event carried
    none (v1 events).
    """
    registry = registry or SchemaRegistry()
    canon = registry.project(registry.valid(events))
    text = F.when(F.col("op") != "delete", extract_text_udf(F.col("html")))
    canon = canon.withColumn("text", text)
    return canon.withColumn(
        "lang",
        F.when(F.col("op") == "delete", F.lit(None).cast("string")).otherwise(
            F.coalesce(F.col("lang"), lang_id(F.col("text")))
        ),
    )


def apply_batch(
    table: LakeTable,
    events: DataFrame,
    epoch: int | str,
    registry: SchemaRegistry | None = None,
    n_salts: int = DEFAULT_SALTS,
) -> int:
    """Apply one micro-batch of raw change events exactly once."""
    epoch_id = str(epoch)
    snap = table.snapshot()
    if epoch_id in snap.committed_epochs:
        return snap.version  # replayed batch: no-op (exactly-once)
    # Persist the prepared batch: the extraction UDF is the expensive stage
    # and three consumers follow (manifest agg, touched-bucket probe, the
    # merge write) — without this it would run 3×.
    batch = prepare_batch(events, registry).persist()
    try:
        manifest = compute_manifest(batch)
        for m in manifest:
            m["epoch"] = int(epoch) if str(epoch).isdigit() else -1
        return merge_into(
            table,
            batch.drop("source_partition", "source_offset"),
            tiebreak_col="event_id",
            epoch_id=epoch_id,
            manifest_rows=manifest,
            n_salts=n_salts,
        )
    finally:
        batch.unpersist()
