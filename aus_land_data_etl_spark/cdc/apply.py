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

#: Target rows per write task.  The manifest aggregation already knows the
#: batch row count, so the delta write coalesces to ≈ this many rows per
#: task.  Sizing is a balance: too few rows/task and Python-worker + task
#: overhead dominates (a 5k-row batch must not fan into 32 near-empty
#: tasks); too many and the extraction UDF — the per-batch critical path —
#: underfills the cluster (measured on local[32], 51k-row batches, warm
#: workers, best-of-3 interleaved trials: 7.4s at 3 tasks vs 4.7s at
#: 12–32 tasks; worse under contention).  4k rows ≈ 5 MB of html per
#: task keeps every core busy from ~1 core-count rows upward while a
#: 10M-row batch still fans out across the whole cluster (coalesce only
#: ever shrinks partitioning, so large batches are untouched).
ROWS_PER_WRITE_TASK = 4_000

#: Salt count for the two-level hot-key LWW pre-reduce.  0 disables (the
#: default): LWW is associative, so the merge resolves target ∪ source in
#: one aggregation, and an extra pre-shuffle only pays off when individual
#: keys carry huge duplicate-event counts within a batch.  Hot *domains*
#: (north rule) don't skew the per-url grouping; a genuinely hot *url*
#: does, and then n_salts>1 bounds the reduce-side key width.
DEFAULT_SALTS = 0


def write_dead_letters(
    table: LakeTable, events: DataFrame, epoch: int | str,
    registry: SchemaRegistry,
) -> int:
    """Persist events the registry cannot project (unknown
    ``schema_version``) under ``<root>/_dead_letter/e<epoch>/``.

    The reference's typed readers keep error rows instead of dropping
    them (raw_data/rows.py:106-127); a 10^10-event WAL tail needs the
    same: a producer that ships a version this consumer predates must
    not silently lose data — the rows are quarantined raw (full
    envelope, byte-complete html) for replay once the registry learns
    the version.  The write is keyed by epoch and ``overwrite``-mode, so
    a crash-retry of the same batch leaves one copy (same idempotency
    class as the commit itself).  Cost: one column-pruned count scan per
    batch, plus a full write only when dead rows exist (the common case
    writes nothing).
    """
    dead = registry.dead_letter(events)
    n = dead.count()
    if n:
        import os
        import re as _re

        safe = _re.sub(r"[^A-Za-z0-9_.-]", "_", str(epoch))[:64]
        out = os.path.join(table.root, "_dead_letter", f"e{safe}")
        dead.write.mode("overwrite").parquet(out)
    return n


def read_dead_letters(table: LakeTable) -> DataFrame:
    """All quarantined events (empty frame if none yet)."""
    import os

    from aus_land_data_etl_spark.cdc.events import EVENT_SCHEMA

    d = os.path.join(table.root, "_dead_letter")
    if not os.path.isdir(d):
        return table.spark.createDataFrame([], EVENT_SCHEMA)
    return (
        table.spark.read.schema(EVENT_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )


def replay_dead_letters(
    table: LakeTable,
    registry: SchemaRegistry | None = None,
    n_salts: int = DEFAULT_SALTS,
    mode: str = "mor",
) -> dict[str, int]:
    """Re-inject quarantined events once the registry has learned their
    schema versions — the repair half of the dead-letter contract
    (``write_dead_letters`` quarantines "for replay once the registry
    learns the version"; this is that replay).

    Per quarantined epoch directory ``e<id>``:

    - events the given registry NOW understands re-apply through the
      normal exactly-once path under the distinct epoch key
      ``dlq-<id>`` (LWW makes late application safe: a quarantined
      update older than the current row loses, exactly as if it had
      arrived on time — the same total order);
    - events still unknown stay quarantined (the directory is rewritten
      with only those rows, or removed when none remain);
    - crash-safe: a crash between the apply and the directory rewrite
      re-replays the same rows under the same ``dlq-<id>`` epoch on the
      next run, which the exactly-once guard skips, and the rewrite
      then completes.

    Returns ``{"replayed": rows re-applied, "still_dead": rows left
    quarantined, "epochs": directories replayed}``.
    """
    import os
    import shutil as _shutil

    from aus_land_data_etl_spark.cdc.events import EVENT_SCHEMA

    registry = registry or SchemaRegistry()
    d = os.path.join(table.root, "_dead_letter")
    out = {"replayed": 0, "still_dead": 0, "epochs": 0}
    if not os.path.isdir(d):
        return out
    for sub in sorted(os.listdir(d)):
        full = os.path.join(d, sub)
        if not (os.path.isdir(full) and sub.startswith("e")):
            continue
        events = table.spark.read.schema(EVENT_SCHEMA).parquet(full)
        # materialise BOTH splits before any directory rewrite — the
        # still-dead write below must never read the files it replaces
        ready = registry.valid(events).localCheckpoint(eager=True)
        still = registry.dead_letter(events).localCheckpoint(eager=True)
        n_ready, n_still = ready.count(), still.count()
        if n_ready == 0:
            out["still_dead"] += n_still
            continue
        # content-keyed commit, NOT the bare directory name: two partial
        # replays of the same directory (registry learned version A,
        # later version B) carry different row sets and must both
        # apply, while a crash-retry of the SAME row set must skip —
        # exactly the content-identity contract the streaming runner
        # uses (a fixed "dlq-<id>" epoch key silently no-ops the second
        # partial replay; caught by the partial-knowledge test)
        apply_batch(
            table,
            ready,
            epoch=f"dlq-{sub[1:]}",
            registry=registry,
            n_salts=n_salts,
            mode=mode,
            content_keyed=True,
            dead_letter=False,  # ready rows are known-projectable
        )
        if n_still:
            tmp = full + ".tmp"
            still.write.mode("overwrite").parquet(tmp)
            _shutil.rmtree(full)
            os.rename(tmp, full)
        else:
            _shutil.rmtree(full)
        out["replayed"] += n_ready
        out["still_dead"] += n_still
        out["epochs"] += 1
    return out


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
        properties={
            # zonemap columns recorded per data file at commit time: time-
            # range scans (recent-changes export, changelog windows) skip
            # whole files via plan_scan; each MoR delta layer covers one
            # epoch's narrow warc_ts band, so time predicates prune old
            # epochs without opening them.
            # "is_deleted" additionally records per-file live-row counts
            # (stats.py `dels`) so COUNT over the serving view answers
            # from metadata (lake/metadata_agg.py), Iceberg-manifest style.
            "stats_cols": ["warc_ts", "lang", "is_deleted"],
            # cluster rows by version time inside each bucket file —
            # tight zonemaps + better RLE; per-partition sort, no shuffle.
            "sort_cols": ["warc_ts"],
            # parquet bloom filter on the key: point lookups (LakeTable.
            # lookup) skip row groups inside the one bucket they open —
            # zonemaps can't help there, hash bucketing gives every file
            # the full url range.
            "bloom_cols": ["url"],
        },
    )


def manifest_frame(
    batch: DataFrame, n_buckets: int | None = None, runs: bool = False
) -> DataFrame:
    """The (lazy) per-source-partition lineage aggregation — exposed
    separately so plan-evidence tooling can assert the extraction UDF is
    pruned out of this job (it reads envelope columns only).

    ``runs=True`` emits one row per **maximal dense offset run** per
    namespace (gaps-and-islands over the distinct offsets) instead of one
    min/max row per namespace.  Streaming callers need this: a file
    source groups WAL chunks by modification time, so one micro-batch can
    legally contain two non-adjacent chunks of the same namespace — a
    min/max manifest then fails the watermark's density proof and the
    offsets stay unwatermarked forever, while per-run rows park as
    pending ranges and fold in when the gap closes.  Watermark advance
    becomes independent of micro-batch file grouping.  Batch-mode
    lineage keeps the coarser one-row-per-namespace form (the audit
    oracle's granularity).
    """
    from aus_land_data_etl_spark.lake.table import bucket_expr

    # The row hash MUST include the total-order tiebreak (event_id):
    # hashing only (url, warc_ts, op) made two distinct events sharing
    # those fields byte-identical in the manifest, so two batches with
    # degenerate source offsets produced colliding content keys and the
    # second batch was falsely skipped (silent event loss — caught by
    # tests/test_property_lww.py).  event_id is unique per event, so it
    # also covers patch payloads (_set_cols/html/lang) implicitly.
    row_hash = F.xxhash64(
        "url", F.col("warc_ts").cast("string"), "op", "event_id"
    )
    # Multiset checksum: SUM of row hashes mod 2^64, NOT xor.  xor
    # self-cancels under at-least-once duplication — a batch holding the
    # same event twice xors to 0, so {e,e} and {e',e'} collide and the
    # second batch is falsely skipped (Hypothesis-found).  Addition mod
    # 2^64 is equally commutative/associative (runs re-fold) but
    # duplicate-sensitive: k copies contribute k·h.  decimal(38,0)
    # accumulation keeps the sum exact under Spark's ANSI overflow rules
    # for any feasible batch size (10^10 rows × 2^63 < 10^38).
    _two64 = F.lit("18446744073709551616").cast("decimal(38,0)")
    msum = lambda c: F.conv(  # noqa: E731
        F.pmod(F.sum(c.cast("decimal(38,0)")), _two64).cast("decimal(38,0)")
        .cast("string"),
        10,
        16,
    )
    if not runs:
        aggs = [
            F.min("source_offset").alias("start_offset"),
            F.max("source_offset").alias("end_offset"),
            F.count("*").alias("row_count"),
            # density evidence for the offset watermark: at-least-once
            # transport duplicates inflate row_count, so contiguity is
            # proven on the distinct-offset count instead
            F.countDistinct("source_offset").alias("distinct_offsets"),
            msum(row_hash).alias("checksum"),
        ]
        if n_buckets is not None:
            aggs.append(
                F.collect_set(bucket_expr("url", n_buckets)).alias("buckets")
            )
        # The offset namespace is the COMPOSITE (source_file,
        # source_partition): a late/backfill segment arrives as a different
        # file whose offsets restart and must not alias the main shard's
        # applied prefix.
        return batch.groupBy("source_partition", "source_file").agg(*aggs)

    from pyspark.sql import Window

    ns = ["source_partition", "source_file"]
    per_off_aggs = [
        F.count("*").alias("n_rows"),
        # modular sum is associative: runs re-fold (see msum above)
        F.pmod(F.sum(row_hash.cast("decimal(38,0)")), _two64).alias("h"),
    ]
    if n_buckets is not None:
        per_off_aggs.append(
            F.collect_set(bucket_expr("url", n_buckets)).alias("bs")
        )
    per_off = batch.groupBy(*ns, "source_offset").agg(*per_off_aggs)
    rn = F.row_number().over(Window.partitionBy(*ns).orderBy("source_offset"))
    runs_df = per_off.withColumn("_run", F.col("source_offset") - rn)
    aggs = [
        F.min("source_offset").alias("start_offset"),
        F.max("source_offset").alias("end_offset"),
        F.sum("n_rows").alias("row_count"),
        F.count("*").alias("distinct_offsets"),  # dense by construction
        msum(F.col("h")).alias("checksum"),
    ]
    if n_buckets is not None:
        aggs.append(
            F.array_distinct(F.flatten(F.collect_list("bs"))).alias("buckets")
        )
    return runs_df.groupBy(*ns, "_run").agg(*aggs).drop("_run")


def compute_manifest(
    batch: DataFrame, n_buckets: int | None = None, runs: bool = False
) -> tuple[list[dict[str, Any]], list[int]]:
    """Per-source-partition lineage + the touched-bucket set, in ONE action.

    Lineage: offset range, row count, order-insensitive checksum of
    (url, warc_ts, op, event_id).  The checksum SUMS per-row hashes mod
    2^64 — commutative AND duplicate-sensitive, so the same *multiset*
    of rows yields the same checksum regardless of partitioning or
    arrival order (replay comparability), while at-least-once duplicates
    still perturb it (xor would self-cancel).
    The reference analog is its per-file row-count telemetry + unique
    file_path lineage (/root/reference/lib/pipeline/nsw_vg/land_values/
    telemetry.py:25-84, sql/meta/schema/001_APPLY_init.sql:36-56).

    The touched-bucket ids piggyback on the same aggregation
    (``collect_set`` per group, unioned driver-side — bounded by
    n_buckets) so the merge needs no separate probe job.
    """
    rows = manifest_frame(batch, n_buckets, runs=runs).collect()
    touched: set[int] = set()
    manifest = []
    for r in rows:
        manifest.append(
            {
                "source_partition": int(r["source_partition"]),
                "source_file": str(r["source_file"]),
                "start_offset": int(r["start_offset"]),
                "end_offset": int(r["end_offset"]),
                "row_count": int(r["row_count"]),
                "distinct_offsets": int(r["distinct_offsets"]),
                "checksum": str(r["checksum"]),
            }
        )
        if n_buckets is not None:
            touched.update(int(b) for b in r["buckets"])
    return manifest, sorted(touched)


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


def content_epoch_key(manifest: list[dict[str, Any]]) -> str:
    """Content-addressed exactly-once key for a batch: a digest of its
    per-source-partition lineage (offset ranges, row counts, checksums).

    Spark batch ids are only unique within one checkpoint lineage — a
    fresh checkpoint over the same WAL regroups files into batches that
    reuse ids 0..N.  Keying commits by *content identity* gives the right
    behaviour in every replay scenario: an identical batch (foreachBatch
    retry, same-grouping WAL replay) is a commit no-op, while a
    differently-grouped batch carrying unapplied events is applied.
    """
    import hashlib
    import json

    payload = json.dumps(
        sorted(
            [
                m["source_partition"],
                m.get("source_file", ""),
                m["start_offset"],
                m["end_offset"],
                m["row_count"],
                m["checksum"],
            ]
            for m in manifest
        )
    )
    return "c:" + hashlib.sha256(payload.encode()).hexdigest()[:24]


def apply_batch(
    table: LakeTable,
    events: DataFrame,
    epoch: int | str,
    registry: SchemaRegistry | None = None,
    n_salts: int = DEFAULT_SALTS,
    mode: str = "mor",
    compact_depth: int = 8,
    content_keyed: bool = False,
    wal_offsets: bool = False,
    dead_letter: bool = True,
    run_manifests: bool = False,
) -> int:
    """Apply one micro-batch of raw change events exactly once.

    ``mode='mor'`` (default): merge-on-read — O(batch) per epoch, deltas
    folded when any bucket's stack reaches ``compact_depth`` (the scale
    path for a 10^10-event stream).  ``mode='cow'``: copy-on-write — every
    epoch rewrites touched buckets, read side stays one-row-per-key.
    Both converge to identical state (same LWW total order).

    ``content_keyed=True`` (the streaming runner's setting) keys the
    commit by the batch's content identity only (``content_epoch_key``) —
    bare Spark batch ids are not recorded because they collide across
    checkpoint lineages.  Batch-mode callers record BOTH the caller's
    epoch id and the content key, so a batch applied one way is recognised
    as committed the other way (mixed batch/streaming replay safety).
    Replays older than the recent-epoch window are caught by the offset
    watermarks (see ``lake.table``); either way a replayed batch skips the
    expensive extraction + write entirely.

    ``dead_letter`` (default on): events whose ``schema_version`` the
    registry does not know are quarantined raw under
    ``<root>/_dead_letter/`` (``write_dead_letters``) instead of being
    silently dropped by the valid-only projection; ``read_dead_letters``
    surfaces them for replay once the registry learns the version.
    """
    from aus_land_data_etl_spark.lake.merge import delta_merge_into

    epoch_id = str(epoch)
    registry = registry or SchemaRegistry()
    snap = table.snapshot()
    if not content_keyed and snap.is_applied(epoch_id):
        return snap.version  # replayed batch: no-op (exactly-once)
    if dead_letter:
        # quarantine unknown-schema events BEFORE the valid-only
        # projection silently drops them (overwrite by epoch: replay-safe)
        write_dead_letters(table, events, epoch, registry)
    # No persist: the manifest aggregation reads only envelope columns, so
    # Catalyst's column pruning drops the (deterministic) extraction UDF
    # from that job entirely — the expensive html→text pass runs exactly
    # once, inside the merge write.  (Persisting here would force a full
    # materialisation including extraction — strictly worse.)
    batch = prepare_batch(events, registry)
    manifest, touched = compute_manifest(
        batch, n_buckets=snap.n_buckets, runs=run_manifests
    )
    content_key = content_epoch_key(manifest)
    epoch_ids = [content_key] if content_keyed else [epoch_id, content_key]
    # Watermark-based skip (for replays older than the recent-epoch window)
    # is sound only under the WAL contract — unique, monotone offsets per
    # source partition — which the caller declares via ``wal_offsets``.
    if snap.is_applied(epoch_ids, manifest if wal_offsets else None):
        return snap.version  # identical batch content already applied
    epoch_num = int(epoch) if str(epoch).lstrip("-").isdigit() else -1
    for m in manifest:
        m["epoch"] = epoch_num
    payload = batch.drop("source_partition", "source_offset")
    # Right-size the write: the manifest just counted the batch, so shrink
    # a small micro-batch to ~ROWS_PER_WRITE_TASK rows per task (coalesce
    # — no shuffle; the projection+extraction run inside the merged tasks).
    total_rows = sum(m["row_count"] for m in manifest)
    target = max(1, -(-total_rows // ROWS_PER_WRITE_TASK))
    if target < payload.rdd.getNumPartitions():
        payload = payload.coalesce(target)
    if mode == "mor":
        return delta_merge_into(
            table,
            payload,
            tiebreak_col="event_id",
            epoch_id=epoch_ids,
            manifest_rows=manifest,
            compact_depth=compact_depth,
            wal_offsets=wal_offsets,
        )
    return merge_into(
        table,
        payload,
        tiebreak_col="event_id",
        epoch_id=epoch_ids,
        manifest_rows=manifest,
        n_salts=n_salts,
        touched=touched,
        wal_offsets=wal_offsets,
    )


def prepare_patch_batch(events: DataFrame) -> DataFrame:
    """PATCH_EVENT_SCHEMA rows → cell-merge-ready rows.

    The ``text`` cell is DERIVED: it is determined exactly when ``html``
    is (full image, or a patch naming ``html``), and its value is the
    extraction of the shipped bytes — so the per-cell LWW winner for
    ``text`` always corresponds to the winner for ``html`` and the
    byte-identical text-per-url invariant holds cell-wise.  Provenance
    cells (``source_file``/``source_pos``) are determined by every event:
    row provenance means "the newest event touching this row".  Patches
    never derive ``lang`` from text (a patch determines only what it
    names); full images keep the heuristic fallback.
    """
    is_patch = F.col("op") == "patch"
    # a malformed patch with NULL set_cols must not silently become a
    # full image (it would null every unnamed cell): empty set instead
    named = F.coalesce(F.col("set_cols"), F.array().cast("array<string>"))
    html_set = ~is_patch | F.array_contains(named, "html")
    text = F.when((F.col("op") != "delete") & html_set, extract_text_udf(F.col("html")))
    lang = F.when(
        F.col("op") == "delete", F.lit(None).cast("string")
    ).otherwise(
        F.when(is_patch, F.col("lang")).otherwise(
            F.coalesce(F.col("lang"), lang_id(text))
        )
    )
    # html implies the derived text cell; provenance cells always
    sets = F.when(
        is_patch,
        F.array_union(
            F.when(
                F.array_contains(named, "html"),
                F.array_union(named, F.array(F.lit("text"))),
            ).otherwise(named),
            F.array(F.lit("source_file"), F.lit("source_pos")),
        ),
    )
    return events.select(
        "event_id",
        "op",
        "url",
        "warc_ts",
        sets.alias("_set_cols"),
        "html",
        text.alias("text"),
        lang.alias("lang"),
        "source_partition",
        "source_offset",
        "source_file",
        "source_pos",
    )


def apply_patch_batch(
    table: LakeTable,
    events: DataFrame,
    epoch: int | str,
    mode: str = "mor",
    compact_depth: int = 8,
    content_keyed: bool = False,
    wal_offsets: bool = False,
    run_manifests: bool = False,
) -> int:
    """Apply one micro-batch of partial-image change events exactly once.

    The patch counterpart of :func:`apply_batch`: same lineage manifests
    (offset ranges, row counts, order-insensitive checksums per source
    partition), same content-addressed exactly-once keys and offset
    watermarks, same MoR (O(batch) fanout deltas) / CoW (bucket-pruned
    rewrite) modes — but rows resolve per-cell (operators/patch.py), so
    an update that flips one column on a multi-MB page appends bytes
    proportional to the patch.
    """
    from aus_land_data_etl_spark.lake.merge import (
        delta_merge_patch_into,
        merge_patch_into,
    )

    epoch_id = str(epoch)
    snap = table.snapshot()
    if not content_keyed and snap.is_applied(epoch_id):
        return snap.version
    batch = prepare_patch_batch(events)
    manifest, touched = compute_manifest(
        batch, n_buckets=snap.n_buckets, runs=run_manifests
    )
    content_key = content_epoch_key(manifest)
    epoch_ids = [content_key] if content_keyed else [epoch_id, content_key]
    if snap.is_applied(epoch_ids, manifest if wal_offsets else None):
        return snap.version
    epoch_num = int(epoch) if str(epoch).lstrip("-").isdigit() else -1
    for m in manifest:
        m["epoch"] = epoch_num
    payload = batch.drop("source_partition", "source_offset")
    total_rows = sum(m["row_count"] for m in manifest)
    target = max(1, -(-total_rows // ROWS_PER_WRITE_TASK))
    if target < payload.rdd.getNumPartitions():
        payload = payload.coalesce(target)
    if mode == "mor":
        return delta_merge_patch_into(
            table,
            payload,
            tiebreak_col="event_id",
            epoch_id=epoch_ids,
            manifest_rows=manifest,
            compact_depth=compact_depth,
            wal_offsets=wal_offsets,
        )
    return merge_patch_into(
        table,
        payload,
        tiebreak_col="event_id",
        epoch_id=epoch_ids,
        manifest_rows=manifest,
        touched=touched,
        wal_offsets=wal_offsets,
    )
