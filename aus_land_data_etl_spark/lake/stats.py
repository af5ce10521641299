"""File-level column statistics (zonemaps) and predicate file-skipping.

Iceberg keeps per-data-file ``lower_bounds``/``upper_bounds`` in its
manifests so a planner can drop files whose value range cannot satisfy a
query predicate — before the scan ever opens them.  At 100 TB that is the
difference between "read 3 files" and "list, open and row-group-filter
200k files": parquet footers also carry min/max, but consulting them
still costs one ranged GET per file, while manifest stats are read once
with the snapshot.

This module provides the same move for :class:`~aus_land_data_etl_spark.
lake.table.LakeTable`:

- :func:`collect_file_stats` — a footer-only sweep over freshly written
  parquet files (no data pages are read; row-group metadata only).  Run
  by the commit paths at write time, when the files are at their
  smallest count and the footers are OS-cache-hot.  On a real cluster
  this sweep would ride the write tasks themselves (parquet writers
  already hold the stats in memory); driver-side footer reads are the
  local-FS stand-in with identical output.
- :func:`prune_files` — evaluates simple conjunctive range/equality
  predicates against the recorded zonemaps and returns the files that
  may contain a matching row.  **Advisory contract**: the surviving set
  is a superset of the files with matches — callers must still apply
  the row-level filter.  A file with no recorded stats for a predicate
  column is always kept (schema evolution, pre-stats snapshots, and
  delta layers written before the table property was set all degrade to
  "scan it", never to a wrong answer).

Soundness note for merge-on-read tables: pruning is a *row filter at
file granularity*, so it commutes with row-level filters — but NOT with
last-writer-wins resolution.  Dropping the delta file holding a key's
newest version would resurrect an older version that happens to sit in
the predicate's range.  ``LakeTable.read_resolved`` therefore applies
pruning only when the table has no delta layers (base is one row per
key = current state); raw ``read`` callers own the semantics.

Reference parity: the reference prunes its ingest scans with vintage
predicates on filename-derived dates (lib/pipeline/nsw_vg/property_sales/
file_format/text_source.py — date-bounded file selection); this is the
same idea pushed into table metadata.
"""

from __future__ import annotations

import datetime as _dt
import os
from typing import Any

#: ops understood by :func:`prune_files`; "between" takes a (lo, hi) pair
#: (inclusive both ends).
_OPS = {"<", "<=", ">", ">=", "==", "between"}


def _encode(v: Any) -> Any:
    """JSON-safe, order-preserving encoding of a stats bound.

    Timestamps/dates become fixed-width ISO-8601 strings (lexicographic
    order == chronological order), numbers stay numbers, strings stay
    strings.  Returns None for types we do not stat (binary, nested).
    """
    if isinstance(v, bool):
        # bool is an int subclass — encode explicitly as 0/1 so boolean
        # zonemaps (e.g. the tombstone column) are usable: hi == 0 proves
        # a file holds no True, lo == 1 proves it holds nothing else.
        return int(v)
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, _dt.datetime):
        # normalise to naive UTC micros — parquet stats are tz-naive here
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, str):
        return v
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    return None


def encode_value(v: Any) -> Any:
    """Public alias: encode a *predicate* value the same way bounds are."""
    return _encode(v)


def collect_file_stats(
    root: str, rel_paths: list[str], stat_cols: list[str]
) -> dict[str, dict[str, Any]]:
    """Footer-only min/max/null-count sweep; returns {rel_path: entry}.

    Entry shape::

        {"rows": 123,
         "cols": {"warc_ts": {"lo": "...", "hi": "...", "nulls": 0}},
         "dels": 4}          # only when "is_deleted" is a stat column

    A column chunk without usable statistics simply has no entry under
    ``cols`` (→ never pruned on that column).  An all-NULL column is
    recorded with ``lo = hi = None`` and ``nulls == rows`` — definitive
    evidence no value exists, so every value predicate prunes it.

    ``dels`` — the EXACT number of rows the serving view hides (tombstone
    ``is_deleted`` True, or NULL): Iceberg keeps ``record_count`` per
    file so COUNT answers from manifests; with tombstones retained in the
    base the live count is ``rows - dels``.  Derived free from the
    boolean zonemap when the file is homogeneous; a tombstone-mixed file
    costs one single-column read — at write time, on files just written
    (OS-cache-hot), of the most RLE-compressible column there is.  On a
    real cluster the writer task would fold this count in-flight.
    """
    import pyarrow.parquet as pq

    wanted = set(stat_cols)
    out: dict[str, dict[str, Any]] = {}
    for rel in rel_paths:
        path = os.path.join(root, rel)
        md = pq.ParquetFile(path).metadata
        if md.num_row_groups == 0:
            out[rel] = {"rows": 0, "cols": {}}
            continue
        # column name -> index, from the first row group (flat schema)
        name_to_idx = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.num_columns)
        }
        cols: dict[str, dict[str, Any]] = {}
        for name in wanted & set(name_to_idx):
            idx = name_to_idx[name]
            lo = hi = None
            nulls = 0
            usable = True
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                if st is None or st.null_count is None:
                    usable = False
                    break
                nulls += st.null_count
                if not st.has_min_max:
                    # all-NULL chunk carries no bounds; anything else
                    # without bounds makes the column unusable
                    if st.null_count != md.row_group(g).num_rows:
                        usable = False
                        break
                    continue
                e_lo, e_hi = _encode(st.min), _encode(st.max)
                if e_lo is None or e_hi is None:
                    usable = False
                    break
                lo = e_lo if lo is None else min(lo, e_lo)
                hi = e_hi if hi is None else max(hi, e_hi)
            if usable:
                cols[name] = {"lo": lo, "hi": hi, "nulls": nulls}
        entry: dict[str, Any] = {"rows": md.num_rows, "cols": cols}
        if "is_deleted" in wanted and "is_deleted" in name_to_idx:
            entry["dels"] = _count_dels(path, md.num_rows, cols.get("is_deleted"))
        out[rel] = entry
    return out


def _count_dels(path: str, rows: int, dst: dict[str, Any] | None) -> int:
    """Exact count of serving-hidden rows (``is_deleted`` True or NULL).

    Free when the boolean zonemap is homogeneous; otherwise one
    single-column read of the file just written (see
    :func:`collect_file_stats` docstring for the at-scale rationale).
    """
    if rows == 0:
        return 0
    if dst is not None:
        lo, hi, nulls = dst.get("lo"), dst.get("hi"), dst.get("nulls", 0)
        if lo is None and hi is None:
            return rows  # all NULL: nothing live
        if nulls == 0 and hi == 0:
            return 0
        if nulls == 0 and lo == 1:
            return rows
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    col = pq.read_table(path, columns=["is_deleted"]).column(0)
    live = pc.sum(pc.invert(col.combine_chunks())).as_py() or 0
    return rows - int(live)


def _matches(entry: dict[str, Any] | None, col: str, op: str, value: Any) -> bool:
    """May this file contain a row satisfying ``col op value``?

    Conservative: True unless the zonemap *definitively* excludes it.
    """
    if not entry:
        return True
    cst = entry.get("cols", {}).get(col)
    if cst is None:
        return True  # no stats for this column — cannot prune
    lo, hi = cst.get("lo"), cst.get("hi")
    if lo is None or hi is None:
        # all values NULL: no value predicate can match (SQL NULL
        # comparisons are never true)
        return False
    if op == "between":
        p_lo, p_hi = (encode_value(value[0]), encode_value(value[1]))
        if p_lo is None or p_hi is None:
            return True
        if not _comparable(lo, p_lo) or not _comparable(lo, p_hi):
            return True
        return not (hi < p_lo or lo > p_hi)
    v = encode_value(value)
    if v is None or not _comparable(lo, v):
        return True
    if op == "==":
        return lo <= v <= hi
    if op == "<":
        return lo < v
    if op == "<=":
        return lo <= v
    if op == ">":
        return hi > v
    if op == ">=":
        return hi >= v
    raise ValueError(f"unknown predicate op {op!r} (use one of {sorted(_OPS)})")


def _comparable(a: Any, b: Any) -> bool:
    num = (int, float)
    return (isinstance(a, num) and isinstance(b, num)) or (
        isinstance(a, str) and isinstance(b, str)
    )


def proves_all_match(
    entry: dict[str, Any] | None, predicates: list[tuple]
) -> bool:
    """Does the zonemap PROVE that EVERY row in the file satisfies all
    ``predicates``?  The dual of :func:`_matches` — used by metadata-only
    aggregates (``lake/metadata_agg.py``) to answer COUNT from manifests
    without opening the file.  Conservative in the opposite direction:
    False unless the stats *definitively* include the whole file.

    Requires ``nulls == 0`` on every predicate column: a NULL never
    satisfies a value predicate, so one NULL row breaks the "all rows
    match" claim even when the bounds are inside the range.
    """
    if not entry:
        return False
    for col, op, value in predicates:
        cst = entry.get("cols", {}).get(col)
        if cst is None or cst.get("nulls", 1) != 0:
            return False
        lo, hi = cst.get("lo"), cst.get("hi")
        if lo is None or hi is None:
            return False
        if op == "between":
            p_lo, p_hi = encode_value(value[0]), encode_value(value[1])
            if p_lo is None or p_hi is None or not _comparable(lo, p_lo):
                return False
            if not (p_lo <= lo and hi <= p_hi):
                return False
            continue
        v = encode_value(value)
        if v is None or not _comparable(lo, v):
            return False
        if op == "==":
            ok = lo == v == hi
        elif op == "<":
            ok = hi < v
        elif op == "<=":
            ok = hi <= v
        elif op == ">":
            ok = lo > v
        elif op == ">=":
            ok = lo >= v
        else:
            raise ValueError(
                f"unknown predicate op {op!r} (use one of {sorted(_OPS)})"
            )
        if not ok:
            return False
    return True


def prune_files(
    file_stats: dict[str, dict[str, Any]],
    rel_paths: list[str],
    predicates: list[tuple],
) -> tuple[list[str], list[str]]:
    """Split ``rel_paths`` into (kept, skipped) under conjunctive predicates.

    ``predicates``: list of ``(col, op, value)`` with op in
    ``{"<", "<=", ">", ">=", "==", "between"}``; ``between`` takes an
    inclusive ``(lo, hi)`` pair.  Predicates are ANDed — a file is
    skipped if ANY predicate definitively excludes it.
    """
    for _, op, _ in predicates:
        if op not in _OPS:
            raise ValueError(f"unknown predicate op {op!r} (use one of {sorted(_OPS)})")
    kept: list[str] = []
    skipped: list[str] = []
    for rel in rel_paths:
        entry = file_stats.get(rel)
        if all(_matches(entry, c, op, v) for c, op, v in predicates):
            kept.append(rel)
        else:
            skipped.append(rel)
    return kept, skipped
