"""Metadata-only aggregates over lake snapshots.

Iceberg answers ``SELECT count(*)`` from its manifests: every data file's
``record_count`` is in table metadata, so a count over a 100 TB table
opens ZERO data files.  Trino/Spark push the same move further with
*residuals*: files whose zonemap proves every row matches the predicate
are counted from metadata; only the boundary files — the ones a time
window cuts through — are actually scanned.  At 10^10 rows that is the
difference between a sub-second planner answer and a 200k-file scan.

This module provides that for :class:`~aus_land_data_etl_spark.lake.
table.LakeTable`, with the two lake-specific soundness twists:

- **Tombstones.**  A folded base keeps deleted keys as ``is_deleted``
  rows (they guard against late updates), and the serving view
  (``read_current``) filters them out — so a file's ``rows`` from the
  footer over-counts unless the file provably holds no tombstone.  The
  boolean zonemap on ``is_deleted`` gives the proof for free:
  ``hi == 0`` → no tombstone in the file; ``lo == 1`` (or all-NULL) →
  nothing live, contribute 0.  Mixed files go to the residual scan.
- **Merge-on-read stacks.**  With live delta layers the base is not the
  current state (a delta may update or delete any base row), so the
  metadata path is refused entirely and the count falls back to one
  resolved scan — correct over fast, same contract as
  ``read_resolved(predicates=...)``.  Fold first for metadata counts.

Reference parity: the reference counts ingest progress with per-table
``SELECT count(*)`` probes during its staged loads (A4 — lib/pipeline/
nsw_vg discovery counts); this is the same observable pushed down to
table metadata so it stays O(files) at any data scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from aus_land_data_etl_spark.lake.stats import proves_all_match, prune_files

if TYPE_CHECKING:  # pragma: no cover
    from aus_land_data_etl_spark.lake.table import LakeTable

#: tombstone column convention, shared with lake/merge.py (DELETED_COL)
_DELETED = "is_deleted"


def predicate_expr(predicates: list[tuple]) -> Column:
    """The conjunctive row filter for ``(col, op, value)`` triples — the
    row-level residual every zonemap consumer must still apply."""
    out = F.lit(True)
    for col, op, value in predicates:
        c = F.col(col)
        if op == "between":
            cond = (c >= F.lit(value[0])) & (c <= F.lit(value[1]))
        elif op == "==":
            cond = c == F.lit(value)
        elif op == "<":
            cond = c < F.lit(value)
        elif op == "<=":
            cond = c <= F.lit(value)
        elif op == ">":
            cond = c > F.lit(value)
        elif op == ">=":
            cond = c >= F.lit(value)
        else:
            raise ValueError(f"unknown predicate op {op!r}")
        out = out & cond
    return out


@dataclass
class CountPlan:
    """Audit trail of a :func:`count_current` answer.

    ``count`` is exact (== ``read_current(...).filter(preds).count()``).
    ``metadata_files`` were answered without being opened;
    ``scanned_files`` needed the residual scan; ``pruned_files`` were
    zonemap-excluded outright.  ``fallback`` marks the delta-stack path
    (one resolved scan, no metadata claim).
    """

    count: int = 0
    metadata_files: list[str] = field(default_factory=list)
    scanned_files: list[str] = field(default_factory=list)
    pruned_files: list[str] = field(default_factory=list)
    fallback: bool = False


def _file_dels(entry: dict[str, Any], has_del: bool) -> int | None:
    """Rows the serving view hides in this file — the exact ``dels``
    recorded at commit time when available, else derived from the
    boolean zonemap when homogeneous, else None (must scan)."""
    if not has_del:
        return 0
    if "dels" in entry:
        return int(entry["dels"])
    cst = entry.get("cols", {}).get(_DELETED)
    if cst is None:
        return None
    lo, hi, nulls = cst.get("lo"), cst.get("hi"), cst.get("nulls", 0)
    if lo is None and hi is None and nulls == entry.get("rows"):
        return int(entry["rows"])  # all-NULL is_deleted: nothing live
    if nulls != 0:
        return None
    if hi == 0:
        return 0
    if lo == 1:
        return int(entry["rows"])
    return None


def count_current(
    table: "LakeTable",
    predicates: list[tuple] | None = None,
    tiebreak_col: str = "event_id",
    version: int | None = None,
) -> CountPlan:
    """Exact COUNT of the current serving view, metadata-first.

    Equals ``read_current(table).filter(<predicates>).count()`` — but on
    a folded table the answer comes from the per-file stats recorded at
    commit time wherever the zonemaps prove it, and only boundary files
    (range-cut or tombstone-mixed) are scanned.  A fully-covered count
    (no residual files) launches ZERO Spark jobs.

    ``predicates`` — conjunctive ``(col, op, value)`` triples, ops in
    ``{<, <=, >, >=, ==, between}`` (NULLs never match, standard SQL).
    """
    preds = list(predicates or [])
    snap = table.snapshot(version)
    names = {f.name for f in snap.schema.fields}
    has_del = _DELETED in names

    if snap.delta_files:
        # merge-on-read stacks: a delta may rewrite or delete any base
        # row, so per-file metadata says nothing about the current state.
        from aus_land_data_etl_spark.lake.merge import read_current

        cols = sorted({c for c, _, _ in preds})
        df = read_current(table, tiebreak_col=tiebreak_col, columns=cols)
        if preds:
            df = df.filter(predicate_expr(preds))
        return CountPlan(count=df.count(), fallback=True)

    rels: list[str] = []
    for fs in snap.bucket_files.values():
        rels.extend(fs)
    kept, skipped = prune_files(snap.file_stats, rels, preds)

    plan = CountPlan(pruned_files=list(skipped))
    residual: list[str] = []
    for rel in kept:
        entry = snap.file_stats.get(rel)
        if entry is None:
            residual.append(rel)
            continue
        rows = int(entry["rows"])
        dels = _file_dels(entry, has_del)
        if dels is not None and dels == rows:
            # provably nothing live — a metadata answer of 0, whatever
            # the predicates say
            plan.metadata_files.append(rel)
        elif dels is not None and not preds:
            plan.count += rows - dels
            plan.metadata_files.append(rel)
        elif dels == 0 and proves_all_match(entry, preds):
            # with predicates, an exact metadata answer also needs the
            # file tombstone-free: a recorded ``dels`` can't say WHICH
            # rows of the range it hides
            plan.count += rows
            plan.metadata_files.append(rel)
        else:
            residual.append(rel)

    if residual:
        import os

        paths = [os.path.join(table.root, r) for r in residual]
        df = table.spark.read.schema(snap.schema).parquet(*paths)
        if has_del:
            df = df.filter(~F.col(_DELETED))
        if preds:
            df = df.filter(predicate_expr(preds))
        plan.count += df.count()
        plan.scanned_files = residual
    return plan
