"""LakeTable — a minimal ACID table format on parquet.

Layout::

    <root>/
      _snapshots/v00000001.json   # immutable snapshot descriptors
      _snapshots/_VERSION         # atomic pointer to current version
      data/s00000001/_bucket=N/*.parquet

A snapshot descriptor records: table schema (json), bucket count, key /
version columns, the file list per bucket, the accumulated per-epoch
lineage manifests, and the set of committed epoch ids (the exactly-once
guard).  Commit = write descriptor with O_EXCL then atomically swap the
``_VERSION`` pointer — the same optimistic single-pointer protocol Iceberg
uses (metadata.json + version-hint).

Scale note (10^10 events / 1000 executors): the JSON descriptor holds
bucket→file lists and manifests inline; at production scale those become
parquet manifest files referenced by path (exactly Iceberg's manifest
lists) — the commit protocol and pruning logic are unchanged.  Bucket
count scales with the cluster (buckets ≙ Iceberg ``bucket(N, url)``
partition transform), giving MERGE a bounded rewrite set and joins a
co-partitioned layout.

Reference parity: hash partitioning by entity key mirrors the reference's
``PARTITION BY HASH (property_id)`` with 16 partitions
(/root/reference/sql/nsw_vg/schema/002_APPLY_create_raw.sql:48,
lib/tasks/schema/partition.py:26-85); the epoch guard mirrors its
``ON CONFLICT DO NOTHING`` idempotent re-run contract
(lib/pipeline/nsw_vg/property_sales/ingestion/ingestion.py:11-20).
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# NOTE: no leading underscore — Hadoop listing treats `_…` path elements as
# hidden, which would make `bucket=N` partition dirs invisible to the reader.
BUCKET_COL = "bucket_id"


def bucket_expr(key_col: str, n_buckets: int):
    """Deterministic bucket id for a key: pmod(murmur3(key), n).

    Deliberately the SAME function Spark's HashPartitioning uses for
    ``repartition(n, key)`` / groupBy shuffles (Murmur3 then pmod): after
    one ``repartition(n_buckets, key)`` every task holds exactly one
    bucket, so aggregations reuse the partitioning (no extra exchange) and
    the bucketed write emits one file per bucket without another shuffle.
    """
    return F.pmod(F.hash(F.col(key_col)), F.lit(n_buckets)).cast("int")


@dataclass
class Snapshot:
    version: int
    schema_json: str
    n_buckets: int
    key_col: str
    version_col: str
    bucket_files: dict[str, list[str]]  # bucket id (str) -> base file paths
    manifests: list[dict[str, Any]] = field(default_factory=list)
    committed_epochs: list[str] = field(default_factory=list)
    properties: dict[str, Any] = field(default_factory=dict)
    #: merge-on-read delta files per bucket (Iceberg v2 style): unresolved
    #: newer rows (incl. tombstones) layered over the base; readers resolve
    #: LWW, compaction folds them into bucket_files.  The sentinel key "*"
    #: holds fanout deltas that span all buckets (written without any
    #: shuffle — clustering deferred to compaction).
    delta_files: dict[str, list[str]] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        return Snapshot(**json.loads(s))

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))


class LakeTable:
    """Handle to a snapshot-committed bucketed parquet table."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # -- paths ------------------------------------------------------------
    @property
    def _snap_dir(self) -> str:
        return os.path.join(self.root, "_snapshots")

    def _snap_path(self, version: int) -> str:
        return os.path.join(self._snap_dir, f"v{version:08d}.json")

    @property
    def _version_ptr(self) -> str:
        return os.path.join(self._snap_dir, "_VERSION")

    # -- lifecycle ---------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_col: str,
        version_col: str,
        n_buckets: int = 32,
        properties: dict[str, Any] | None = None,
    ) -> "LakeTable":
        t = cls(spark, root)
        os.makedirs(t._snap_dir, exist_ok=True)
        snap = Snapshot(
            version=0,
            schema_json=json.dumps(schema.jsonValue()),
            n_buckets=n_buckets,
            key_col=key_col,
            version_col=version_col,
            bucket_files={},
            properties=properties or {},
        )
        t._write_snapshot(snap)
        return t

    @classmethod
    def exists(cls, root: str) -> bool:
        return os.path.exists(os.path.join(root, "_snapshots", "_VERSION"))

    def current_version(self) -> int:
        with open(self._version_ptr) as f:
            return int(f.read().strip())

    def snapshot(self, version: int | None = None) -> Snapshot:
        v = self.current_version() if version is None else version
        with open(self._snap_path(v)) as f:
            return Snapshot.from_json(f.read())

    # -- read --------------------------------------------------------------
    def read(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        include_deltas: bool = True,
    ) -> DataFrame:
        """Read the table at a snapshot, optionally bucket-pruned.

        The snapshot's schema is imposed on the scan so files written before
        a schema-evolution step surface the added columns as NULL (the
        parquet-reader analog of Iceberg's schema-id resolution).

        With ``include_deltas`` the scan unions merge-on-read delta files —
        rows are then RAW (possibly several versions per key, tombstones
        included); use ``read_resolved`` for the LWW view.
        """
        snap = self.snapshot(version)
        files: list[str] = []
        for b, fs in snap.bucket_files.items():
            if buckets is None or int(b) in buckets:
                files.extend(os.path.join(self.root, f) for f in fs)
        if include_deltas:
            for b, fs in snap.delta_files.items():
                if buckets is None or b == "*" or int(b) in buckets:
                    files.extend(os.path.join(self.root, f) for f in fs)
        if not files:
            return self.spark.createDataFrame([], snap.schema)
        df = self.spark.read.schema(snap.schema).parquet(*files)
        # fanout delta files span all buckets — enforce the requested
        # bucket subset with a (cheap, codegen'd) key-hash filter.
        if include_deltas and buckets is not None and "*" in snap.delta_files:
            df = df.filter(bucket_expr(snap.key_col, snap.n_buckets).isin(buckets))
        return df

    def read_resolved(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        tiebreak_col: str = "event_id",
    ) -> DataFrame:
        """LWW-resolved view over base ∪ deltas (merge-on-read)."""
        from aus_land_data_etl_spark.operators.dedup import lww_latest

        snap = self.snapshot(version)
        raw = self.read(version=version, buckets=buckets, include_deltas=True)
        if not snap.delta_files:
            return raw  # base is already one-row-per-key
        return lww_latest(raw, snap.key_col, [snap.version_col, tiebreak_col])

    # -- write -------------------------------------------------------------
    def _write_snapshot(self, snap: Snapshot) -> None:
        path = self._snap_path(snap.version)
        # O_EXCL: concurrent committers race on the version file, loser
        # retries on a fresh snapshot (optimistic concurrency, Iceberg-style).
        with open(path, "x") as f:
            f.write(snap.to_json())
        fd, tmp = tempfile.mkstemp(dir=self._snap_dir)
        with os.fdopen(fd, "w") as f:
            f.write(str(snap.version))
        os.rename(tmp, self._version_ptr)  # atomic pointer swap

    def _write_bucket_data(
        self, df: DataFrame, snapshot_version: int, pre_bucketed: bool = False
    ) -> dict[str, list[str]]:
        """Write df (must carry BUCKET_COL) partitioned by bucket; return
        the relative file list per bucket.

        Rows are clustered by bucket before the partitioned write so each
        bucket lands in exactly one task → one file per bucket, instead of
        (tasks × buckets) small files.  This caps file count at n_buckets
        per snapshot, keeping the next epoch's bucket-pruned read (and the
        driver-side listing) O(buckets), not O(buckets × cores × epochs).
        ``pre_bucketed=True`` asserts the caller already key-partitioned
        the frame (bucket_expr matches Spark's hash partitioning), so no
        extra shuffle is added here.
        """
        rel_dir = os.path.join("data", f"s{snapshot_version:08d}")
        out_dir = os.path.join(self.root, rel_dir)
        if not pre_bucketed:
            snap = self.snapshot()
            df = df.repartition(snap.n_buckets, F.col(BUCKET_COL))
        (
            df.write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(out_dir)
        )
        bucket_files: dict[str, list[str]] = {}
        for entry in sorted(os.listdir(out_dir)):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            b = str(int(entry.split("=", 1)[1]))
            bdir = os.path.join(out_dir, entry)
            bucket_files[b] = sorted(
                os.path.join(rel_dir, entry, f)
                for f in os.listdir(bdir)
                if f.endswith(".parquet")
            )
        return bucket_files

    def overwrite(self, df: DataFrame) -> int:
        """Full rewrite of table content (bootstrap / backfill path)."""
        snap = self.snapshot()
        new_version = snap.version + 1
        with_bucket = df.withColumn(BUCKET_COL, bucket_expr(snap.key_col, snap.n_buckets))
        bucket_files = self._write_bucket_data(with_bucket, new_version)
        new_snap = Snapshot(
            version=new_version,
            schema_json=json.dumps(df.schema.jsonValue()),
            n_buckets=snap.n_buckets,
            key_col=snap.key_col,
            version_col=snap.version_col,
            bucket_files=bucket_files,
            manifests=snap.manifests,
            committed_epochs=snap.committed_epochs,
            properties=snap.properties,
        )
        self._write_snapshot(new_snap)
        return new_version

    def commit_buckets(
        self,
        replaced: dict[int, DataFrame] | DataFrame,
        touched_buckets: list[int],
        schema: T.StructType | None = None,
        manifest_rows: list[dict[str, Any]] | None = None,
        epoch_id: str | None = None,
        pre_bucketed: bool = False,
    ) -> int:
        """Copy-on-write commit: replace data for ``touched_buckets`` only.

        ``replaced`` is one DataFrame carrying BUCKET_COL covering exactly
        the touched buckets.  Untouched buckets keep their existing files —
        this is what bounds MERGE write amplification at scale (SURVEY §7.4.7).
        """
        snap = self.snapshot()
        if epoch_id is not None and epoch_id in snap.committed_epochs:
            return snap.version  # exactly-once: batch already applied
        new_version = snap.version + 1
        assert isinstance(replaced, DataFrame)
        new_files = self._write_bucket_data(replaced, new_version, pre_bucketed)
        bucket_files = dict(snap.bucket_files)
        delta_files = dict(snap.delta_files)
        for b in touched_buckets:
            bucket_files.pop(str(b), None)
            # base rewrite supersedes any deltas layered on these buckets
            delta_files.pop(str(b), None)
        # fanout deltas span every bucket — superseded only by a full fold
        if set(touched_buckets) >= set(range(snap.n_buckets)):
            delta_files.pop("*", None)
        # A touched bucket that ends up empty (all rows deleted) simply has
        # no files in the new snapshot.
        bucket_files.update(new_files)
        properties = dict(snap.properties)
        if not delta_files:
            properties.pop("delta_epochs", None)
        new_snap = Snapshot(
            version=new_version,
            schema_json=json.dumps(schema.jsonValue()) if schema is not None else snap.schema_json,
            n_buckets=snap.n_buckets,
            key_col=snap.key_col,
            version_col=snap.version_col,
            bucket_files=bucket_files,
            manifests=snap.manifests + (manifest_rows or []),
            committed_epochs=snap.committed_epochs + ([epoch_id] if epoch_id else []),
            properties=properties,
            delta_files=delta_files,
        )
        self._write_snapshot(new_snap)
        return new_version

    def _write_fanout_data(self, df: DataFrame, snapshot_version: int) -> list[str]:
        """Write delta rows with NO shuffle: whatever partitioning the
        batch already has goes straight to parquet.  Clustering by bucket
        is deferred to the next fold (the Iceberg fanout-writer tradeoff:
        zero write-side exchange, coarser read pruning until compaction)."""
        rel_dir = os.path.join("data", f"s{snapshot_version:08d}")
        out_dir = os.path.join(self.root, rel_dir)
        df.write.mode("overwrite").parquet(out_dir)
        return sorted(
            os.path.join(rel_dir, f)
            for f in os.listdir(out_dir)
            if f.endswith(".parquet")
        )

    def commit_delta(
        self,
        winners: DataFrame,
        schema: T.StructType | None = None,
        manifest_rows: list[dict[str, Any]] | None = None,
        epoch_id: str | None = None,
        pre_bucketed: bool = False,
        fanout: bool = False,
    ) -> int:
        """Merge-on-read commit: append the batch's rows as delta files.

        O(batch) per epoch — the base is never read or rewritten here;
        readers resolve LWW over base ∪ deltas and ``fold_deltas``
        compacts.  This is what bounds write amplification on a 10^10-event
        stream (SURVEY §7.4.7): CoW rewrites O(table) per epoch, MoR
        defers that to compaction across many epochs.
        """
        snap = self.snapshot()
        if epoch_id is not None and epoch_id in snap.committed_epochs:
            return snap.version
        new_version = snap.version + 1
        delta_files = {k: list(v) for k, v in snap.delta_files.items()}
        if fanout:
            delta_files.setdefault("*", []).extend(
                self._write_fanout_data(winners, new_version)
            )
        else:
            new_files = self._write_bucket_data(winners, new_version, pre_bucketed)
            for b, fs in new_files.items():
                delta_files.setdefault(b, []).extend(fs)
        properties = dict(snap.properties)
        properties["delta_epochs"] = int(properties.get("delta_epochs", 0)) + 1
        new_snap = Snapshot(
            version=new_version,
            schema_json=json.dumps(schema.jsonValue()) if schema is not None else snap.schema_json,
            n_buckets=snap.n_buckets,
            key_col=snap.key_col,
            version_col=snap.version_col,
            bucket_files=snap.bucket_files,
            manifests=snap.manifests + (manifest_rows or []),
            committed_epochs=snap.committed_epochs + ([epoch_id] if epoch_id else []),
            properties=properties,
            delta_files=delta_files,
        )
        self._write_snapshot(new_snap)
        return new_version

    def max_delta_depth(self) -> int:
        """Number of unfolded delta commits (compaction trigger)."""
        snap = self.snapshot()
        if not snap.delta_files:
            return 0
        return int(snap.properties.get("delta_epochs", 0))

    # -- maintenance --------------------------------------------------------
    def manifest_df(self) -> DataFrame:
        """Lineage manifests as a DataFrame (epoch, partition, offsets, counts,
        checksum) — the queryable audit trail the north rule requires."""
        snap = self.snapshot()
        schema = T.StructType(
            [
                T.StructField("epoch", T.LongType()),
                T.StructField("source_partition", T.IntegerType()),
                T.StructField("start_offset", T.LongType()),
                T.StructField("end_offset", T.LongType()),
                T.StructField("row_count", T.LongType()),
                T.StructField("checksum", T.StringType()),
            ]
        )
        rows = [
            (
                int(m["epoch"]),
                int(m["source_partition"]),
                int(m["start_offset"]),
                int(m["end_offset"]),
                int(m["row_count"]),
                str(m["checksum"]),
            )
            for m in snap.manifests
        ]
        return self.spark.createDataFrame(rows, schema)

    def expire_snapshots(self, keep_last: int = 2) -> None:
        """Drop snapshot descriptors and data dirs no current snapshot
        references (the REINDEX/compaction analog; Iceberg expire_snapshots)."""
        current = self.current_version()
        keep = set(range(max(0, current - keep_last + 1), current + 1))
        live_files: set[str] = set()
        for v in keep:
            try:
                s = self.snapshot(v)
            except FileNotFoundError:
                continue
            for fs in s.bucket_files.values():
                live_files.update(fs)
            for fs in s.delta_files.values():
                live_files.update(fs)
        data_dir = os.path.join(self.root, "data")
        if os.path.isdir(data_dir):
            for sdir in os.listdir(data_dir):
                full = os.path.join(data_dir, sdir)
                rels: set[str] = set()
                for e in os.listdir(full):
                    p = os.path.join(full, e)
                    if e.startswith(BUCKET_COL) and os.path.isdir(p):
                        rels.update(
                            os.path.join("data", sdir, e, f) for f in os.listdir(p)
                        )
                    elif e.endswith(".parquet"):
                        # fanout delta files live at the snapshot-dir top
                        # level (no bucket subdirs) — without this branch
                        # their dirs were never considered for reclaim
                        rels.add(os.path.join("data", sdir, e))
                if rels and not (rels & live_files):
                    import shutil

                    shutil.rmtree(full)
        for f in os.listdir(self._snap_dir):
            if f.startswith("v") and int(f[1:9]) not in keep:
                os.remove(os.path.join(self._snap_dir, f))
