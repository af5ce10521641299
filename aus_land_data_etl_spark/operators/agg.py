"""Aggregation operators (SURVEY.md §2.5 A1–A5).

The reference's only exotic aggregate is *ordered* aggregation
(``STRING_AGG(x, '' ORDER BY position)`` — reassembling legal
descriptions split across C rows,
/root/reference/sql/nsw_vg/tasks/from_raw_derive/003_ingest_psi_post_2001/
002_legal_description.sql:9-16).  Spark's ``collect_list`` is
order-nondeterministic, so ordered aggregation is expressed as
``array_sort(collect_list(struct(position, payload)))`` — deterministic
regardless of partitioning, which matters for replay equivalence
(SURVEY.md §7.4.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ordered_string_agg(
    position: Column | str, payload: Column | str, sep: str = ""
) -> Column:
    """STRING_AGG(payload, sep ORDER BY position) as a deterministic agg."""
    pos = F.col(position) if isinstance(position, str) else position
    pay = F.col(payload) if isinstance(payload, str) else payload
    arr = F.array_sort(F.collect_list(F.struct(pos.alias("p"), pay.alias("v"))))
    return F.array_join(F.transform(arr, lambda x: x["v"]), sep)


def first_by_order(position: Column | str, payload: Column | str) -> Column:
    """``(ARRAY_AGG(x ORDER BY position))[1]`` ≡ min_by (002_legal_description.sql:13)."""
    pos = F.col(position) if isinstance(position, str) else position
    pay = F.col(payload) if isinstance(payload, str) else payload
    return F.min_by(pay, pos)


def ordered_collect(
    position: Column | str, payload: Column | str
) -> Column:
    """ARRAY_AGG(payload ORDER BY position) — deterministic list agg."""
    pos = F.col(position) if isinstance(position, str) else position
    pay = F.col(payload) if isinstance(payload, str) else payload
    arr = F.array_sort(F.collect_list(F.struct(pos.alias("p"), pay.alias("v"))))
    return F.transform(arr, lambda x: x["v"])


def segment_stats(
    df: DataFrame, order_col: str, n_segments: int, agg_cols: dict[str, Column] | None = None
) -> DataFrame:
    """NTILE range segmentation + per-segment stats (reference work
    partitioner, lib/pipeline/nsw_vg/property_description/
    work_partitioner.py:36-46).

    Note the scale caveat from SURVEY §2.6 W4: ``ntile`` needs a global
    sort; at cluster scale prefer ``repartitionByRange`` which samples
    instead.  This operator exists for parity + the planning use case
    (its output is tiny: one row per segment).
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col(order_col))
    seg = df.withColumn("segment", F.ntile(n_segments).over(w).cast("long"))
    aggs = agg_cols or {}
    return seg.groupBy("segment").agg(
        F.min(order_col).alias("seg_min"),
        F.max(order_col).alias("seg_max"),
        F.count("*").alias("seg_count"),
        *[v.alias(k) for k, v in aggs.items()],
    )
