"""Multi-dimensional file clustering (Z-order) for zonemap file-skipping.

``sort_cols`` (table.py) clusters rows lexicographically, which tightens
the per-file zonemaps (lake/stats.py) on the FIRST sort column only: a
predicate on the second column still has to open every file, because each
file spans that column's full range.  At 100 TB that asymmetry matters —
a pages table clustered by ``warc_ts`` answers time windows by opening 2
of 200k files but a `lang =` probe by opening all of them.

``cluster_zorder`` is the Databricks ``OPTIMIZE ZORDER BY`` / Iceberg
sort-order-evolution analog: one maintenance rewrite that re-clusters the
resolved rows along a space-filling curve so EVERY clustered dimension
gets usably tight file zonemaps:

1. quantize each dimension to ``2**bits`` rank buckets via ONE
   ``approxQuantile`` pass (Greenwald–Khanna sketch — the driver receives
   at most ``2**bits - 1`` doubles per column, never data rows);
2. interleave the bucket indices' bits into a Morton key — pure Catalyst
   bit arithmetic (``shiftleft``/``shiftright``/``&``), no UDF;
3. range-partition each hash bucket into ``files_per_bucket`` contiguous
   z-ranges and write one file per range (``LakeTable.overwrite`` with a
   ``cluster_key``), so a file covers ~``files_per_bucket**(-1/n_cols)``
   of each dimension instead of all of one and none of the others.

Quantile (rank) buckets, not uniform-width ones: a skewed dimension
(e.g. long-tail token counts) still splits into evenly-populated cells,
so every file stays small in every dimension.  Hash bucketing by key is
PRESERVED — z-ranges subdivide buckets, so key-pruned merges, point
lookups and the changelog diff are untouched; only read-side range
predicates get the new file-skipping axis (``LakeTable.plan_scan``).

Scale: the rewrite is one shuffle (`repartitionByRange`) over the
resolved view — the same cost envelope as ``compact``/``rebucket``, run
on the same maintenance cadence.  The quantizer is computed per rewrite;
like those paths it is an O(table) job you schedule, never an implicit
per-write tax.

Reference parity: the reference's ingest prunes scans on one
filename-derived date axis (lib/pipeline/nsw_vg/property_sales/
file_format/text_source.py); this generalises that idea to arbitrary
dimension sets via table metadata, as its SQL consumers' multi-predicate
queries (sql/nsw_vg/tasks) would need at lake scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aus_land_data_etl_spark.lake.table import LakeTable

#: types the quantizer accepts — anything with a total order that casts
#: losslessly enough to double for RANK bucketing (exact values are never
#: reconstructed from the cast; only which side of a boundary a row falls)
_ORDERED = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.TimestampType,
    T.DateType,
)

#: UTF-8 byte prefix length for the string rank proxy: 6 bytes = 48 bits,
#: exactly representable in an IEEE double (53-bit mantissa), so the
#: proxy's numeric order IS its bytewise order on the prefix.
_STR_PREFIX_BYTES = 6


def _rank_expr(c: str, dt: T.DataType) -> Column:
    """Double-valued rank proxy for one z dimension.

    Ordered scalar types cast directly.  Strings map to their first
    ``_STR_PREFIX_BYTES`` UTF-8 bytes read as a big-endian integer
    (hex → right-zero-pad → base-16 parse): numeric order of the proxy
    equals bytewise order of the prefix, and 48 bits fit a double
    exactly.  Ties beyond the prefix land in the same rank bucket —
    harmless, because pruning soundness comes from the REAL string
    min/max recorded in the file zonemaps (lake/stats.py); the proxy
    only decides layout, i.e. how tight those zonemaps end up.
    """
    if isinstance(dt, T.StringType):
        h = F.rpad(
            F.substring(F.hex(F.encode(F.col(c), "UTF-8")), 1, 2 * _STR_PREFIX_BYTES),
            2 * _STR_PREFIX_BYTES,
            "0",
        )
        return F.conv(h, 16, 10).cast("double")
    return F.col(c).cast("double")


def quantile_bounds(
    df: DataFrame, cols: list[str], bits: int = 6, rel_err: float = 0.01
) -> dict[str, list[float]]:
    """Per-column quantile boundaries for the z-quantizer.

    One ``approxQuantile`` pass over all columns at probabilities
    ``i / 2**bits``; boundaries are deduplicated (a dimension with few
    distinct values just uses fewer buckets).  NULLs are excluded here
    and map to bucket 0 in :func:`zorder_key`.
    """
    if not 1 <= bits <= 12:
        raise ValueError(f"bits must be in [1, 12], got {bits}")
    for c in cols:
        dt = df.schema[c].dataType
        if not isinstance(dt, (*_ORDERED, T.StringType)):
            raise ValueError(
                f"z-order column {c!r} has unorderable-for-quantiles type "
                f"{dt.simpleString()}; supported: numeric, decimal, "
                "timestamp, date, string"
            )
    probs = [i / 2**bits for i in range(1, 2**bits)]
    casted = df.select(
        [_rank_expr(c, df.schema[c].dataType).alias(c) for c in cols]
    )
    quantiles = casted.approxQuantile(cols, probs, rel_err)
    return {c: sorted(set(q)) for c, q in zip(cols, quantiles)}


def zorder_key(
    bounds: dict[str, list[float]],
    bits: int = 6,
    string_cols: frozenset[str] | set[str] | tuple[str, ...] = (),
) -> Column:
    """Interleaved-bit Morton key over the quantized dimensions.

    Pure Catalyst: the bucket index of a value is the count of boundaries
    ``<=`` it (a fold over a literal array — at most ``2**bits - 1``
    comparisons per row per dimension), and the interleave is plain
    shift/mask arithmetic on longs.  No UDF, fully codegen-able.

    ``string_cols`` names the dimensions whose bounds were computed over
    the string rank proxy (:func:`_rank_expr`) — the row-side expression
    must match the boundary domain.

    NULL values bucket to 0 (comparisons against NULL are falsy, so every
    fold term contributes nothing) — NULL rows cluster together at the
    curve origin rather than scattering across files.
    """
    idx_exprs: list[Column] = []
    for c, bs in bounds.items():
        v = (
            _rank_expr(c, T.StringType())
            if c in string_cols
            else F.col(c).cast("double")
        )
        if not bs:
            # empty/constant dimension (e.g. a rewrite of an empty table):
            # every row is bucket 0, no comparisons to fold
            idx_exprs.append(F.lit(0).cast("long"))
            continue
        arr = F.array(*[F.lit(float(b)) for b in bs])
        idx = F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc + F.when(v >= b, 1).otherwise(0),
        )
        idx_exprs.append(idx.cast("long"))
    n = len(idx_exprs)
    if n == 0:
        raise ValueError("zorder_key needs at least one dimension")
    z = F.lit(0).cast("long")
    for j, idx in enumerate(idx_exprs):
        for i in range(bits):
            bit = F.shiftright(idx, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + j)  # disjoint bits: + == OR
    return z


def cluster_zorder(
    table: LakeTable,
    cols: list[str],
    bits: int = 6,
    files_per_bucket: int = 4,
    tiebreak_col: str = "event_id",
    rel_err: float = 0.01,
) -> int:
    """Rewrite the table's resolved rows z-ordered along ``cols``.

    Same maintenance envelope as ``merge.compact``: reads the
    LWW-*resolved* view (tombstones kept — they still guard late
    updates), then one clustered overwrite commit.  Each hash bucket is
    split into ``files_per_bucket`` contiguous z-ranges, one file per
    range, so every dimension in ``cols`` can skip files via
    ``plan_scan`` afterwards.

    Raises unless every z column is in the ``stats_cols`` table property
    — without recorded zonemaps the rewrite would cluster for a pruner
    that never sees the bounds.
    """
    snap = table.snapshot()
    _check_stats_cols(snap, cols)
    if files_per_bucket < 1:
        raise ValueError(f"files_per_bucket must be >= 1, got {files_per_bucket}")
    resolved = table.read_resolved(tiebreak_col=tiebreak_col)
    key = _cluster_key_for(resolved, cols, bits=bits, rel_err=rel_err)
    return table.overwrite(
        resolved, cluster_key=key, files_per_bucket=files_per_bucket
    )


def _cluster_key_for(
    df: DataFrame, cols: list[str], bits: int, rel_err: float
) -> Column:
    """One ``approxQuantile`` planning pass + the matching row-side Morton
    key (string dimensions route through the rank proxy on BOTH sides)."""
    bounds = quantile_bounds(df, cols, bits=bits, rel_err=rel_err)
    str_cols = frozenset(
        c for c in cols if isinstance(df.schema[c].dataType, T.StringType)
    )
    return zorder_key(bounds, bits=bits, string_cols=str_cols)


def _check_stats_cols(snap, cols: list[str]) -> None:
    stats_cols = set(snap.properties.get("stats_cols") or [])
    missing = [c for c in cols if c not in stats_cols]
    if missing:
        raise ValueError(
            f"z-order columns {missing} are not in the table's stats_cols "
            f"property {sorted(stats_cols)}; zonemaps are never recorded "
            "for them, so clustering would not enable any file-skipping"
        )


def cluster_zorder_buckets(
    table: LakeTable,
    cols: list[str],
    buckets: list[int] | None = None,
    min_files: int = 2,
    bits: int = 6,
    files_per_bucket: int = 4,
    tiebreak_col: str = "event_id",
    rel_err: float = 0.01,
) -> int:
    """Incremental z-order: re-cluster ONLY the deep buckets.

    At 100 TB you never rewrite the whole table on a maintenance tick —
    you re-cluster the hash buckets whose file stacks grew past
    ``min_files`` (base + delta layers), or an explicit ``buckets`` list.
    Untouched buckets keep their existing files byte-for-byte (the
    ``commit_buckets`` copy-on-write contract), which bounds the rewrite
    at O(dirty data) rather than O(table) — the same write-amplification
    envelope as the leveled ``fold_deltas``.

    Sound by the fold contract: fanout (``"*"``) deltas are first
    clustered into per-bucket layers (``cluster_fanout_deltas`` — they
    span every bucket, so a bucket-scoped commit could not retire them),
    then the selected buckets resolve base ∪ stack (per-cell for patch
    tables) and rewrite clustered; the committed schema is aligned to the
    snapshot's whenever other buckets still hold live deltas
    (``_align_to`` — the round-4 CoW-after-MoR guard).

    The quantizer is computed over the selected buckets' resolved rows:
    bounds are per-rewrite layout hints, while pruning soundness always
    rests on the real per-file min/max swept at commit (lake/stats.py).
    Returns the committed version (unchanged if nothing qualified).
    """
    from aus_land_data_etl_spark.lake.merge import (
        _align_to,
        cluster_fanout_deltas,
    )
    from aus_land_data_etl_spark.lake.table import BUCKET_COL, bucket_expr

    snap = table.snapshot()
    _check_stats_cols(snap, cols)
    if files_per_bucket < 1:
        raise ValueError(f"files_per_bucket must be >= 1, got {files_per_bucket}")
    cluster_fanout_deltas(table, tiebreak_col)
    snap = table.snapshot()
    if buckets is None:
        buckets = sorted(
            b
            for b in range(snap.n_buckets)
            if len(snap.bucket_files.get(str(b), []))
            + len(snap.delta_files.get(str(b), []))
            >= max(1, min_files)
        )
    else:
        bad = [b for b in buckets if not 0 <= b < snap.n_buckets]
        if bad:
            raise ValueError(f"buckets {bad} out of range [0, {snap.n_buckets})")
        buckets = sorted(set(buckets))
    if not buckets:
        return snap.version
    resolved = table.read_resolved(buckets=buckets, tiebreak_col=tiebreak_col)
    key = _cluster_key_for(resolved, cols, bits=bits, rel_err=rel_err)
    # patch tables: resolution consumed _set_cols and materialised _cvers;
    # align so delta layers surviving in OTHER buckets stay readable
    resolved = _align_to(resolved, snap.schema)
    resolved = resolved.withColumn(
        BUCKET_COL, bucket_expr(snap.key_col, snap.n_buckets)
    )
    return table.commit_buckets(
        resolved,
        touched_buckets=buckets,
        schema=resolved.drop(BUCKET_COL).schema,
        cluster_key=key,
        files_per_bucket=files_per_bucket,
        computed_from=snap,
    )
