"""Persisted, incrementally-maintained MinHash-LSH near-duplicate index.

A 10^10-document corpus cannot re-run whole-corpus LSH banding on every
ingest cycle: the band table IS the index.  This module persists the
banded MinHash signatures once and lets each CDC batch probe + extend
them in O(batch) — the near-dup analog of ``similarity.IvfIndex``
(index once, query many, maintain incrementally), and the continuous
form of the reference's staged dedup pass (its pipeline re-deduplicates
per vintage load; here each exactly-once change batch is checked
against the full accumulated corpus as it lands — reference behavior:
ingest→clean→dedup staging flow, see SURVEY §2 W1/U1).

Layout under ``root``:

- ``meta.json`` — the hash-family contract (k, n_bands, shingle_n,
  seed, n_buckets, id type).  Probing with a different family would
  silently return garbage, so every handle loads it from disk.
- ``bands/bucket=*/`` — one row per (doc, band): (doc_id, band,
  band_hash), parquet **partitioned by** ``bucket =
  pmod(xxhash64(seed+1, band, band_hash), n_buckets)``.  A new batch's
  band hashes land in a subset of buckets; ``add`` /
  ``candidates_for`` push that subset as a partition filter, so
  unprobed bucket directories are never opened (the same
  directory-level pruning contract as ``IvfIndex.search``, proven the
  same two ways in tests: executed-plan PartitionFilters + a runtime
  poison-file read).  A batch of m docs probes ≤ min(m·n_bands,
  n_buckets) buckets — small batch against huge corpus ⇒ most of the
  band table is skipped.
- ``sigs/sbucket=*/`` — (doc_id, sig array<long>), partitioned by
  ``sbucket = pmod(xxhash64(seed+2, doc_id), n_buckets)`` so
  ``estimated`` fetches only the signature partitions its pair ids
  hash into (Broder estimate prefilter before the exact verify).

Equivalence contract (test-pinned): starting from an empty index, the
UNION of the pair sets returned by successive ``add`` calls equals
``minhash_lsh_candidates`` run once over the union of the batches.
Banding is per-document and the hash family is fixed (``band_rows`` is
shared code), so incremental vs batch can differ only in WHICH call
first reports a pair — never in the set.

Idempotence is the feeder's contract, exactly as for ``IvfIndex.add``:
drive ``add`` from an exactly-once change feed (e.g. a
``ChangelogSubscription`` net-insert stream) — a replayed ``add``
appends duplicate band rows, like any blind file append.  Updates to an
already-indexed document require tombstone + re-add semantics upstream.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aus_land_data_etl_spark.operators.dedup_ml import (
    band_pairs,
    band_rows,
    estimated_similarity,
    minhash_signatures,
    shingle_rows,
)

__all__ = ["NearDupIndex"]


class NearDupIndex:
    """Persisted banded-MinHash near-dup index with O(batch) maintenance."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        with open(os.path.join(root, "meta.json")) as f:
            meta = json.load(f)
        self.k: int = meta["k"]
        self.n_bands: int = meta["n_bands"]
        self.shingle_n: int = meta["shingle_n"]
        self.seed: int = meta["seed"]
        self.n_buckets: int = meta["n_buckets"]
        self.id_type: str = meta["id_type"]

    # ------------------------------------------------------------------
    # construction

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        k: int = 64,
        n_bands: int = 64,
        shingle_n: int = 5,
        seed: int = 42,
        n_buckets: int = 32,
        id_type: str = "bigint",
    ) -> "NearDupIndex":
        """Create an EMPTY index (the natural start of a CDC-fed corpus:
        every document arrives through ``add`` and is candidate-checked
        against everything indexed before it)."""
        if k % n_bands != 0:
            raise ValueError(f"k={k} must be divisible by n_bands={n_bands}")
        os.makedirs(root, exist_ok=True)
        tmp = os.path.join(root, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(
                {
                    "k": k,
                    "n_bands": n_bands,
                    "shingle_n": shingle_n,
                    "seed": seed,
                    "n_buckets": n_buckets,
                    "id_type": id_type,
                },
                f,
            )
        os.replace(tmp, os.path.join(root, "meta.json"))
        return cls(spark, root)

    @classmethod
    def build(
        cls,
        docs: DataFrame,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        **kwargs,
    ) -> "NearDupIndex":
        """Create and bulk-load from an existing corpus WITHOUT computing
        any candidate pairs (the backfill path: pairs inside the initial
        corpus are a one-shot ``minhash_lsh_candidates`` job if wanted)."""
        idx = cls.create(docs.sparkSession, root, **kwargs)
        idx._append(idx._signatures(docs, id_col, text_col))
        return idx

    # ------------------------------------------------------------------
    # internal plumbing

    def _signatures(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """(doc_id, sig) for a batch — ONE shuffle over its shingle rows,
        eagerly checkpointed: the result feeds the probe join, the
        self-join, and the append, and must not recompute per reference."""
        sigs = minhash_signatures(
            shingle_rows(docs, id_col, text_col, self.shingle_n),
            self.k,
            self.seed,
        )
        return sigs.localCheckpoint(eager=True)

    def _bands_with_bucket(self, sigs: DataFrame) -> DataFrame:
        return band_rows(sigs, self.k, self.n_bands).withColumn(
            "bucket",
            F.pmod(
                F.xxhash64(F.lit(self.seed + 1), F.col("band"), F.col("band_hash")),
                F.lit(self.n_buckets),
            ).cast("int"),
        )

    def _empty(self, schema: str) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    def _has_parquet(self, sub: str) -> bool:
        base = os.path.join(self.root, sub)
        for dirpath, _dirs, files in os.walk(base):
            if any(fn.endswith(".parquet") for fn in files):
                return True
        return False

    def bands(self) -> DataFrame:
        """The full persisted band table (maintenance / audit surface)."""
        if not self._has_parquet("bands"):
            return self._empty(
                f"doc_id {self.id_type}, band int, band_hash bigint, bucket int"
            )
        return self.spark.read.parquet(os.path.join(self.root, "bands"))

    def sigs(self) -> DataFrame:
        if not self._has_parquet("sigs"):
            return self._empty(
                f"doc_id {self.id_type}, sig array<bigint>, sbucket int"
            )
        return self.spark.read.parquet(os.path.join(self.root, "sigs"))

    def _append(self, sigs_new: DataFrame) -> None:
        self._bands_with_bucket(sigs_new).write.mode("append").partitionBy(
            "bucket"
        ).parquet(os.path.join(self.root, "bands"))
        sigs_new.withColumn(
            "sbucket",
            F.pmod(
                F.xxhash64(F.lit(self.seed + 2), F.col("doc_id")),
                F.lit(self.n_buckets),
            ).cast("int"),
        ).write.mode("append").partitionBy("sbucket").parquet(
            os.path.join(self.root, "sigs")
        )

    def _probe(self, sigs_new: DataFrame) -> DataFrame:
        """Candidate pairs touching the batch: batch-vs-corpus via the
        bucket-pruned band probe, plus batch-vs-batch via the in-batch
        band self-join.  Output (id_a, id_b) with id_a < id_b, distinct."""
        bands_new = self._bands_with_bucket(sigs_new)
        # bounded driver-side set: ≤ n_buckets ints — the partition filter
        probed = sorted(
            r["bucket"] for r in bands_new.select("bucket").distinct().collect()
        )
        corpus = self.bands().filter(F.col("bucket").isin(probed))
        cross = (
            bands_new.alias("n")
            .join(
                corpus.alias("c"),
                (F.col("n.band") == F.col("c.band"))
                & (F.col("n.band_hash") == F.col("c.band_hash"))
                & (F.col("n.doc_id") != F.col("c.doc_id")),
            )
            .select(
                F.least("n.doc_id", "c.doc_id").alias("id_a"),
                F.greatest("n.doc_id", "c.doc_id").alias("id_b"),
            )
        )
        within = band_pairs(sigs_new, self.k, self.n_bands)
        return cross.unionAll(within.select("id_a", "id_b")).distinct()

    # ------------------------------------------------------------------
    # public surface

    def candidates_for(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """Probe-only: candidate pairs for a batch against corpus ∪ batch,
        WITHOUT mutating the index (e.g. pre-admission screening)."""
        return self._probe(self._signatures(docs, id_col, text_col))

    def add(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """Index a batch and return its candidate pairs (batch-vs-corpus
        and batch-vs-batch).  The pair set is materialised (eager
        localCheckpoint) BEFORE the band/signature append so the probe
        can never observe the batch's own freshly-written files —
        add-then-probe races are structurally impossible."""
        sigs_new = self._signatures(docs, id_col, text_col)
        pairs = self._probe(sigs_new).localCheckpoint(eager=True)
        self._append(sigs_new)
        return pairs

    def compact(self) -> dict[str, int]:
        """Rewrite each band-bucket directory into one file.  Every
        ``add`` appends one file per touched bucket, so after 10^4
        ingest cycles a probe pays 10^4 file opens per bucket — the
        classic small-file problem; this is the index's maintenance
        rewrite (same role as the lake's ``compact``).

        Crash-safe without a descriptor: new compacted files are
        appended FIRST, the superseded originals removed after.  A crash
        between the two leaves duplicate band rows, which the candidate
        path tolerates by construction (``_probe`` ends in
        ``distinct()``) and the next ``compact`` clears.  Signatures are
        left alone — their row count is O(corpus), not O(ingest cycles).
        """
        import glob

        bands_dir = os.path.join(self.root, "bands")
        old = glob.glob(os.path.join(bands_dir, "bucket=*", "*.parquet"))
        if len(old) <= self.n_buckets:
            return {"files_before": len(old), "files_after": len(old)}
        # one shuffle partition per bucket → one output file per directory
        (
            self.bands()
            .repartition(self.n_buckets, F.col("bucket"))
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(bands_dir)
        )
        for p in old:
            os.remove(p)
        after = glob.glob(os.path.join(bands_dir, "bucket=*", "*.parquet"))
        return {"files_before": len(old), "files_after": len(after)}

    def estimated(self, pairs: DataFrame) -> DataFrame:
        """Broder MinHash similarity estimate for candidate pairs off the
        persisted signatures — the cheap prefilter before an exact
        n-gram-Jaccard verify.  Signature partitions are pruned to the
        sbuckets the pair ids hash into (bounded collect: ≤ n_buckets
        ints), so a small candidate set reads a small fraction of sigs/."""
        ids = (
            pairs.select(F.col("id_a").alias("doc_id"))
            .unionAll(pairs.select(F.col("id_b")))
            .withColumn(
                "sbucket",
                F.pmod(
                    F.xxhash64(F.lit(self.seed + 2), F.col("doc_id")),
                    F.lit(self.n_buckets),
                ).cast("int"),
            )
        )
        probed = sorted(
            r["sbucket"] for r in ids.select("sbucket").distinct().collect()
        )
        sigs = self.sigs().filter(F.col("sbucket").isin(probed)).select("doc_id", "sig")
        return estimated_similarity(pairs, sigs, self.k)
