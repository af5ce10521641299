"""Lateral-unnest / wide→long pivot (SURVEY.md §2.4 J2).

The reference zips 5 parallel column groups into rows with
``LEFT JOIN LATERAL (SELECT UNNEST(ARRAY[base_date_1..5]), UNNEST(...))``
(/root/reference/sql/nsw_vg/tasks/from_raw_derive/002_ingest_land_values/
003_land_valuation.sql:23-31).  Spark equivalent: ``posexplode(
arrays_zip(...))`` — one generator, no join, fully parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unnest_parallel_columns(
    df: DataFrame,
    groups: dict[str, list[str]],
    keep: list[str],
    index_col: str = "idx",
    drop_all_null: bool = True,
) -> DataFrame:
    """Zip parallel column groups into long form.

    ``groups`` maps output column name → ordered list of source columns
    (all lists must be the same length).  Output: one row per (input row,
    position), with ``index_col`` = 1-based position — matching the
    UNNEST WITH ORDINALITY semantics.
    """
    lengths = {len(v) for v in groups.values()}
    assert len(lengths) == 1, "parallel groups must have equal arity"
    zipped = F.arrays_zip(
        *[
            F.array(*[F.col(c) for c in cols]).alias(out)
            for out, cols in groups.items()
        ]
    )
    out = df.select(*keep, F.posexplode(zipped).alias("_pos", "_z")).select(
        *keep,
        (F.col("_pos") + 1).alias(index_col),
        *[F.col(f"_z.{name}").alias(name) for name in groups],
    )
    if drop_all_null:
        non_null = None
        for name in groups:
            c = F.col(name).isNotNull()
            non_null = c if non_null is None else (non_null | c)
        out = out.filter(non_null)
    return out
