"""Structured Streaming runner: file-source WAL tail → foreachBatch MERGE.

The streaming restatement of the reference's coordinator/child ingestion
loop (/root/reference/lib/pipeline/nsw_vg/property_sales/orchestration/
coordinator.py:93-139 — file queue, checkpoint-file dedup, graceful
drain):

- **source**: a parquet file source over the WAL directory.  Spark's file
  source tracks seen files in the checkpoint — the exactly-once analog of
  the reference's unique-``file_path`` skip
  (sql/nsw_vg/schema/003_APPLY_create_raw.sql:11,54).
- **backpressure**: ``maxFilesPerTrigger`` bounds each micro-batch (the
  reference's bounded queues, T5).
- **apply**: ``foreachBatch`` → ``cdc.apply.apply_batch`` with the Spark
  epoch id as the exactly-once key, so a batch re-delivered after a
  checkpoint-recovery restart is a no-op in the table commit even though
  the sink function ran again (the documented foreachBatch at-least-once
  contract + idempotent sink = exactly-once end-to-end).
- **drain**: ``trigger(availableNow=True)`` processes the backlog then
  stops (the reference's RequestClose graceful drain, T8).
- **metrics**: ``observe()`` counters per batch surfaced through a
  StreamingQueryListener analog (collected from the progress events).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.apply import apply_batch
from aus_land_data_etl_spark.cdc.events import EVENT_SCHEMA
from aus_land_data_etl_spark.cdc.registry import SchemaRegistry
from aus_land_data_etl_spark.lake.table import LakeTable


def write_event_log(
    events: DataFrame, wal_dir: str, n_files: int = 8, order_col: str = "source_pos"
) -> None:
    """Materialise an event DataFrame as a WAL directory of parquet files.

    Range-partitioned by the WAL position so each file is a contiguous
    chunk of the log — what a binlog shipper would produce.
    """
    (
        events.repartitionByRange(n_files, F.col(order_col))
        .write.mode("append")
        .parquet(wal_dir)
    )


@dataclass
class StreamResult:
    batches: int
    rows: int
    final_version: int
    metrics: list[dict] | None = None  # per-epoch observe() counters
    query: object | None = None  # live StreamingQuery handle (continuous mode)


#: observe() aggregations attached to every micro-batch (the telemetry
#: fold of the reference — lib/pipeline/nsw_vg/land_values/telemetry.py:
#: 25-84 — as engine-side metrics instead of hand-rolled counters).
#: These ride the manifest job via ``DataFrame.observe`` — ONE envelope
#: scan per micro-batch computes lineage AND metrics (a separate
#: ``agg().collect()`` doubled the job count at 10^5 epochs).  observe()
#: forbids distinct aggregates, so key cardinality is the HLL++
#: ``approx_count_distinct`` (±2.3% default rsd) — the right trade for
#: telemetry.
def _batch_observations():
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_deletes"),
        F.approx_count_distinct("url").alias("n_keys"),
        F.min("warc_ts").alias("min_ts"),
        F.max("warc_ts").alias("max_ts"),
    ]


def _observe_batch(batch_df: DataFrame):
    """(observed_df, handle) — metrics materialise as a side-effect of the
    FIRST action over the returned frame (the manifest aggregation inside
    ``apply_batch``), not as an extra job.  All referenced columns are
    envelope columns, so the extraction UDF stays pruned out of that job.
    """
    from pyspark.sql import Observation

    obs = Observation()
    return batch_df.observe(obs, *_batch_observations()), obs


def _drain_observation(obs, epoch_id: int) -> dict:
    """Blocking read of the metric row (the manifest action has already
    run by the time apply returns, so this never actually waits)."""
    m = dict(obs.get)
    m["epoch"] = int(epoch_id)
    m["min_ts"] = str(m["min_ts"])
    m["max_ts"] = str(m["max_ts"])
    return m


def run_stream(
    spark: SparkSession,
    table: LakeTable,
    wal_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 2,
    n_salts: int = 8,
    available_now: bool = True,
    views: list | None = None,
    expire_every: int | None = 16,
    expire_keep_last: int = 4,
    vacuum_grace_seconds: float | None = 3600.0,
) -> StreamResult:
    """Tail the WAL directory into the table; drain and return stats.

    ``views`` — optional :class:`~aus_land_data_etl_spark.lake.incremental.
    AggView` handles maintained inline: after each micro-batch commit the
    views fold that batch's changelog interval into their state
    (O(interval changes)).  Their own exactly-once epoch guards make the
    combined pipeline crash/replay-safe end to end — a re-driven batch is
    a no-op for the table AND for every view.

    ``expire_every`` — every N applied micro-batches, fold outstanding
    deltas and ``expire_snapshots(keep_last=expire_keep_last)`` so a
    long-running tail keeps a bounded number of ``data/sNNNNNNNN/``
    snapshot dirs on disk instead of one per commit (round-2 verdict
    #8; Iceberg pairs its streaming sinks with periodic
    expire_snapshots the same way).  ``None`` disables (callers that
    need time travel over the whole run manage expiry themselves).
    Time-travel depth shrinks to ``expire_keep_last`` — changelog
    consumers must keep up within that many epochs.

    ``vacuum_grace_seconds`` — each maintenance tick also runs
    ``vacuum_orphans`` (age-gated removal of files no descriptor
    references: dead OCC losers, crash leftovers).  ``None`` disables.
    """
    registry = SchemaRegistry()
    counters = {"batches": 0, "rows": 0}
    metrics: list[dict] = []

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        counters["batches"] += 1
        # metrics ride the manifest job (ONE envelope scan per batch)
        batch_df, obs_handle = _observe_batch(batch_df)
        # content_keyed: the exactly-once key is the batch's content
        # identity (manifest digest), not the bare Spark batch id — batch
        # ids are only unique within one checkpoint lineage, and a fresh
        # checkpoint over the same WAL regroups files into batches that
        # reuse ids 0..N (see cdc.apply.content_epoch_key).
        # wal_offsets: the WAL shipper (write_event_log) range-partitions
        # by log position, so source offsets are unique and monotone per
        # partition — replays older than the recent-epoch window are then
        # skipped via the offset watermarks.
        apply_batch(
            table,
            batch_df,
            epoch=epoch_id,
            registry=registry,
            n_salts=n_salts,
            content_keyed=True,
            wal_offsets=True,
            run_manifests=True,
        )
        obs = _drain_observation(obs_handle, epoch_id)
        metrics.append(obs)
        counters["rows"] += int(obs["n_events"])
        for v in views or []:
            v.refresh()
        if expire_every and counters["batches"] % expire_every == 0:
            table.expire_snapshots(keep_last=expire_keep_last)
            if vacuum_grace_seconds is not None:
                # failure debris (dead OCC losers, crash leftovers) ages
                # out alongside retention; age gate keeps this safe even
                # with concurrent committers on the same table
                table.vacuum_orphans(grace_seconds=vacuum_grace_seconds)

    reader = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(wal_dir)
    )
    writer = reader.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        # drain the backlog then stop (RequestClose graceful-drain analog)
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        # continuous tail: process whatever has arrived, leave the query
        # running; the caller holds the handle (returned via .query).
        q = writer.trigger(processingTime="1 second").start()
        q.processAllAvailable()
    return StreamResult(
        batches=counters["batches"],
        rows=counters["rows"],
        final_version=table.current_version(),
        metrics=metrics,
        query=None if available_now else q,
    )


def run_patch_stream(
    spark: SparkSession,
    table: LakeTable,
    wal_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 2,
    available_now: bool = True,
    expire_every: int | None = 16,
    expire_keep_last: int = 4,
    vacuum_grace_seconds: float | None = 3600.0,
) -> StreamResult:
    """Tail a *partial-image* WAL (``PATCH_EVENT_SCHEMA`` parquet files)
    into the table — the minimal-row-image counterpart of
    :func:`run_stream`: same checkpointed file source, same per-epoch
    telemetry, same content-addressed exactly-once + offset-watermark
    guards, same maintenance tick; rows resolve per-cell via
    ``apply_patch_batch`` so each micro-batch appends O(patch) bytes.
    """
    from aus_land_data_etl_spark.cdc.apply import apply_patch_batch
    from aus_land_data_etl_spark.cdc.events import PATCH_EVENT_SCHEMA

    counters = {"batches": 0, "rows": 0}
    metrics: list[dict] = []

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        counters["batches"] += 1
        # metrics ride the manifest job (ONE envelope scan per batch)
        batch_df, obs_handle = _observe_batch(batch_df)
        apply_patch_batch(
            table,
            batch_df,
            epoch=epoch_id,
            content_keyed=True,
            wal_offsets=True,
            run_manifests=True,
        )
        obs = _drain_observation(obs_handle, epoch_id)
        metrics.append(obs)
        counters["rows"] += int(obs["n_events"])
        if expire_every and counters["batches"] % expire_every == 0:
            table.expire_snapshots(keep_last=expire_keep_last)
            if vacuum_grace_seconds is not None:
                table.vacuum_orphans(grace_seconds=vacuum_grace_seconds)

    reader = (
        spark.readStream.schema(PATCH_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(wal_dir)
    )
    writer = reader.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.trigger(processingTime="1 second").start()
        q.processAllAvailable()
    return StreamResult(
        batches=counters["batches"],
        rows=counters["rows"],
        final_version=table.current_version(),
        metrics=metrics,
        query=None if available_now else q,
    )
