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
        df = _residual_read(table, snap, residual, has_del, preds)
        plan.count += df.count()
        plan.scanned_files = residual
    return plan


def _residual_read(table, snap, rels, has_del, preds):
    import os

    paths = [os.path.join(table.root, r) for r in rels]
    df = table.spark.read.schema(snap.schema).parquet(*paths)
    if has_del:
        df = df.filter(~F.col(_DELETED))
    if preds:
        df = df.filter(predicate_expr(preds))
    return df


@dataclass
class BoundsPlan:
    """Audit trail of a :func:`minmax_current` answer (see
    :class:`CountPlan` for the field semantics)."""

    lo: Any = None
    hi: Any = None
    count_nonnull: int = 0
    metadata_files: list[str] = field(default_factory=list)
    scanned_files: list[str] = field(default_factory=list)
    pruned_files: list[str] = field(default_factory=list)
    fallback: bool = False


def _decode(dtype: Any, v: Any) -> Any:
    """Invert ``stats._encode`` back to the column's Python type."""
    import datetime as dt

    from pyspark.sql import types as T

    if v is None:
        return None
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return dt.datetime.strptime(v, "%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(dtype, T.DateType):
        return dt.date.fromisoformat(v)
    if isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        return int(v)
    return v


def minmax_current(
    table: "LakeTable",
    col: str,
    predicates: list[tuple] | None = None,
    tiebreak_col: str = "event_id",
    version: int | None = None,
) -> BoundsPlan:
    """Exact MIN/MAX/COUNT(col) of the current serving view, metadata-first.

    Equals ``read_current(table).filter(<preds>).agg(min, max,
    count(col))`` — answered from the per-file zonemaps wherever they
    prove exactness, with only boundary files scanned.  Soundness rules
    (each routes the file to the residual scan when unmet):

    - **String bounds are used only when recorded.**  A truncated
      BYTE_ARRAY statistic would be sound for *pruning* but is not an
      actual value, so it could not be returned as an exact MIN/MAX.
      Spark's parquet writer (parquet-mr) never records truncated chunk
      stats — past ~4 KB it OMITS min/max entirely (verified empirically
      against the pinned runtime; a stat-less column simply routes to
      the residual scan, never to a wrong answer).  Binary columns are
      excluded outright.
    - **Tombstones.**  Parquet bounds ignore NULLs, and a tombstone row
      stores NULL in every payload cell (pinned by
      ``tests/test_metadata_agg.py``), so payload-column bounds are
      live-rows-only for free.  For the key/version/tiebreak columns —
      which tombstones DO populate — the file must prove ``dels == 0``.
      A file whose ``is_deleted`` column has NULLs proves nothing
      (those rows hide from the serving view with payloads intact).
    - **Predicates.**  Only files whose zonemap proves EVERY row matches
      (``stats.proves_all_match``) contribute bounds; range-cut files
      are scanned.

    ``count_nonnull`` rides along because it falls out of the same
    entries (``rows - nulls``) and is the COUNT(col) SQL semantic.
    """
    from pyspark.sql import types as T

    preds = list(predicates or [])
    snap = table.snapshot(version)
    names = {f.name for f in snap.schema.fields}
    if col not in names:
        raise ValueError(f"unknown column {col!r}")
    dtype = snap.schema[col].dataType
    has_del = _DELETED in names

    if snap.delta_files:
        from aus_land_data_etl_spark.lake.merge import read_current

        cols = sorted({c for c, _, _ in preds} | {col})
        df = read_current(table, tiebreak_col=tiebreak_col, columns=cols)
        if preds:
            df = df.filter(predicate_expr(preds))
        row = df.agg(
            F.min(col).alias("lo"), F.max(col).alias("hi"),
            F.count(col).alias("n"),
        ).first()
        return BoundsPlan(
            lo=row["lo"], hi=row["hi"], count_nonnull=int(row["n"]),
            fallback=True,
        )

    binary = isinstance(dtype, T.BinaryType)
    payload = col not in {snap.key_col, snap.version_col, tiebreak_col}

    rels: list[str] = []
    for fs in snap.bucket_files.values():
        rels.extend(fs)
    kept, skipped = prune_files(snap.file_stats, rels, preds)

    plan = BoundsPlan(pruned_files=list(skipped))
    residual: list[str] = []
    for rel in kept:
        entry = snap.file_stats.get(rel)
        if entry is None or binary:
            residual.append(rel)
            continue
        dels = _file_dels(entry, has_del)
        if dels is not None and dels == int(entry["rows"]):
            plan.metadata_files.append(rel)  # nothing live: contributes 0
            continue
        dst = entry.get("cols", {}).get(_DELETED) if has_del else None
        tomb_ok = (
            not has_del
            or (payload and dst is not None and dst.get("nulls", 1) == 0)
            or dels == 0
        )
        cst = entry.get("cols", {}).get(col)
        if not tomb_ok or cst is None or not proves_all_match(entry, preds):
            residual.append(rel)
            continue
        lo, hi = _decode(dtype, cst.get("lo")), _decode(dtype, cst.get("hi"))
        if lo is not None:
            plan.lo = lo if plan.lo is None else min(plan.lo, lo)
            plan.hi = hi if plan.hi is None else max(plan.hi, hi)
        plan.count_nonnull += int(entry["rows"]) - int(cst.get("nulls", 0))
        plan.metadata_files.append(rel)

    if residual:
        row = (
            _residual_read(table, snap, residual, has_del, preds)
            .agg(
                F.min(col).alias("lo"), F.max(col).alias("hi"),
                F.count(col).alias("n"),
            )
            .first()
        )
        if row["lo"] is not None:
            plan.lo = row["lo"] if plan.lo is None else min(plan.lo, row["lo"])
            plan.hi = row["hi"] if plan.hi is None else max(plan.hi, row["hi"])
        plan.count_nonnull += int(row["n"])
        plan.scanned_files = residual
    return plan
