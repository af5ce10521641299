"""Join operators (SURVEY.md §2.4 J1–J6).

All joins are declared through the DataFrame API so Catalyst picks the
physical strategy (broadcast for small dims, sort-merge otherwise, AQE
skew splitting at runtime).  Helpers exist for the two patterns Spark
doesn't spell natively: null-safe composite keys and existence flags.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
