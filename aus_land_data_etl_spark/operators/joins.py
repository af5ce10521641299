"""Join operators (SURVEY.md §2.4 J1–J6).

All joins are declared through the DataFrame API so Catalyst picks the
physical strategy (broadcast for small dims, sort-merge otherwise, AQE
skew splitting at runtime).  Helpers exist for the two patterns Spark
doesn't spell natively: null-safe composite keys and existence flags.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def null_safe_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join where NULL keys match NULL (``<=>``).

    The reference works around ``NULL != NULL`` with a generated composite
    key ``(property_id, COALESCE(strata_lot_number, -1))``
    (/root/reference/sql/nsw_lrs/schema/001_APPLY_init.sql:3-15).  Spark has
    first-class null-safe equality, which keeps the join key's statistics
    intact instead of inventing a sentinel.
    """
    cond: Column | None = None
    for k in keys:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else cond & c
    assert cond is not None
    return left.join(right, cond, how)


def anti_join(left: DataFrame, right: DataFrame, keys: list[str]) -> DataFrame:
    """NOT EXISTS (reference insert-if-absent / orphan cleanup,
    sql/nsw_spatial/tasks/dedup_lot_layer.sql:23-25)."""
    return left.join(right, keys, "left_anti")


def semi_join(left: DataFrame, right: DataFrame, keys: list[str]) -> DataFrame:
    """EXISTS as a filter."""
    return left.join(right, keys, "left_semi")


def exists_flag(
    left: DataFrame, right: DataFrame, keys: list[str], flag: str
) -> DataFrame:
    """Existence as a boolean column (reference ``seen_in_land_values =
    (e.source_id IS NOT NULL)`` after LEFT JOIN,
    sql/nsw_vg/tasks/from_raw_derive/005_populate_lrs/001_setup.sql:51-58).

    Implemented as LEFT JOIN against the *distinct* key set so the left
    row count is preserved (a plain left join against a non-unique right
    side would fan out).
    """
    marker = right.select(*keys).distinct().withColumn("_seen", F.lit(1))
    out = left.join(marker, keys, "left")
    return out.withColumn(flag, F.col("_seen").isNotNull()).drop("_seen")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    tiebreaks: list[str] | None = None,
    strict: bool = False,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: each left row gains the *latest* right row of
    the same key with ``right_ts <= left_ts`` (``<`` when ``strict``), or
    NULLs when no such row exists (LEFT JOIN semantics).

    The point-in-time lookup every CDC consumer eventually needs ("the
    state that was current when this event happened") — the reference
    resolves it row-at-a-time in SQL via correlated latest-version
    subqueries (e.g. joining each valuation to the property row effective
    at its date); Spark has no ASOF JOIN, and the naive
    ``JOIN ON key AND r.ts <= l.ts`` + rank explodes to O(|left|·|right|)
    per key before the filter.

    This implementation is the union-sentinel form: tag both sides, union,
    and carry the most recent right payload forward with
    ``last(..., ignorenulls=True)`` over a (key, time)-ordered running
    window — ONE shuffle (the window's hash partition on the key), no row
    explosion, O(n log n) sort per partition.  At 100 TB both inputs
    shuffle once on the key; a key hot enough to overflow one task's sort
    spills rather than OOMs (external sort), but is better range-split
    upstream.

    Ties: right rows at ``right_ts == left_ts`` ARE visible (inclusive)
    unless ``strict``; among right rows with equal timestamps the winner
    is the greatest by ``tiebreaks`` (order columns of ``right``; make
    them unique per key for determinism).  Right rows with NULL
    ``right_ts`` never match (unknown time).

    NULL keys: SQL equi-join semantics — a right row with a NULL in any
    key column never matches anything (it is dropped before the union;
    ``Window.partitionBy`` would otherwise group NULL keys together and
    silently match NULL-key lefts to NULL-key rights).  Left rows with
    NULL keys are kept and get NULL payloads, as LEFT JOIN would.

    Returns all left columns plus each non-key right column as
    ``<prefix><name>`` (including ``<prefix><right_ts>``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    tiebreaks = list(tiebreaks or [])
    payload_cols = [c for c in right.columns if c not in keys]
    clash = [c for c in left.columns + right.columns if c.startswith("_asof_")]
    if clash:
        raise ValueError(f"reserved _asof_* column present: {clash}")

    # left rows sort AFTER right rows at the same timestamp (inclusive
    # visibility); under strict they sort BEFORE them instead.
    l_ord, r_ord = (0, 1) if strict else (1, 0)
    r_not_null_keys = reduce(
        lambda a, b: a & b, [F.col(k).isNotNull() for k in keys]
    )
    r_tagged = right.filter(
        F.col(right_ts).isNotNull() & r_not_null_keys
    ).select(
        *keys,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(r_ord).alias("_asof_ord"),
        F.lit(False).alias("_asof_is_left"),
        # one struct, not bare columns: a legitimately-NULL payload value
        # must not let last(ignorenulls) reach past its row to an older one
        F.struct(*[F.col(c) for c in payload_cols]).alias("_asof_hit"),
        *[F.col(t).alias(f"_asof_tb{i}") for i, t in enumerate(tiebreaks)],
    )
    l_tagged = left.select(
        *left.columns,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(l_ord).alias("_asof_ord"),
        F.lit(True).alias("_asof_is_left"),
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("_asof_ts").asc(),
            F.col("_asof_ord").asc(),
            *[
                F.col(f"_asof_tb{i}").asc_nulls_first()
                for i in range(len(tiebreaks))
            ],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_asof_match", F.last("_asof_hit", ignorenulls=True).over(w))
    return u.filter(F.col("_asof_is_left")).select(
        *left.columns,
        *[
            F.col(f"_asof_match.{c}").alias(prefix + c)
            for c in payload_cols
        ],
    )
