"""The staged derive DAG — the reference's ordered 21-SQL-script analog.

Reference: ``ingest_deduplicate`` runs identifiers → sources/lineage →
property dim → addresses → canonicalisation → per-attribute event ingest
→ cleanup as 21 sequential SQL scripts against Postgres
(/root/reference/lib/tasks/nsw_vg/ingest_deduplicate.py:13-38).  Here the
whole plan is ONE lazy DataFrame DAG over the converged ``pages`` table
and the raw change log: Catalyst sees every stage at once, so common
subtrees are shared, filters push down across stage boundaries, and no
intermediate is materialised unless asked.

Stage map (reference script → here):
  001_identifiers      → dim_domain / dim_lang (distinct dims, K2)
  002_source lineage   → lineage_rollup (per source file/partition counts)
  005_canonicalisation → the merge already did LWW; re-derived here as
                         per-url change history stats (audit view)
  00N per-attribute    → page_stats (quality/tokens/fingerprint per url)
  rollups              → domain_rollup (the matview analog)
  check_constraints    → validation (post-load assertion frame, K6)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aus_land_data_etl_spark.functions.core import deterministic_id
from aus_land_data_etl_spark.functions.text import (
    fingerprint64,
    quality_score,
    token_count,
)

DOMAIN_RE = r"^https?://([^/]+)/"


def dim_domain(pages: DataFrame) -> DataFrame:
    """Distinct-domain dimension with deterministic surrogate ids (the
    reference's uuid-minting replaced per SURVEY §7.4.1)."""
    return (
        pages.select(F.regexp_extract("url", DOMAIN_RE, 1).alias("domain"))
        .filter(F.col("domain") != "")
        .distinct()
        .select(deterministic_id("domain").alias("domain_id"), "domain")
    )


def dim_lang(pages: DataFrame) -> DataFrame:
    return (
        pages.select(F.col("lang").alias("lang"))
        .filter(F.col("lang").isNotNull())
        .distinct()
    )


def page_stats(pages: DataFrame) -> DataFrame:
    """Per-page derived attributes (the per-attribute event-ingest analog)."""
    return pages.select(
        "url",
        F.regexp_extract("url", DOMAIN_RE, 1).alias("domain"),
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        token_count("text").alias("n_tokens"),
        quality_score("text").alias("quality"),
        fingerprint64("text").alias("fingerprint"),
    )


def domain_rollup(stats: DataFrame) -> DataFrame:
    """Materialised-view analog (reference full_property_address matview,
    /root/reference/sql/nsw_gnb/schema/001_APPLY_init.sql:46-67)."""
    return stats.groupBy("domain").agg(
        F.count("*").alias("n_pages"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
    )


def lineage_rollup(events: DataFrame) -> DataFrame:
    """Per-source-file lineage counts (meta.file_source analog)."""
    return events.groupBy("source_file", "source_partition").agg(
        F.count("*").alias("n_events"),
        F.min("source_offset").alias("first_offset"),
        F.max("source_offset").alias("last_offset"),
    )


def change_history(events: DataFrame) -> DataFrame:
    """Per-url audit: how many changes of each op, first/last version."""
    return events.groupBy("url").agg(
        F.count("*").alias("n_changes"),
        F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_deletes"),
        F.min("warc_ts").alias("first_ts"),
        F.max("warc_ts").alias("last_ts"),
    )


def validation(pages: DataFrame) -> DataFrame:
    """Post-load constraint frame (K6, meta.check_constraints analog,
    /root/reference/sql/meta/schema/002_APPLY_utility.sql:1-28): one row
    per violated constraint; the pipeline asserts it is empty."""
    checks = {
        "url_not_null": F.col("url").isNull(),
        "url_has_scheme": ~F.col("url").rlike("^https?://"),
        "warc_ts_not_null": F.col("warc_ts").isNull(),
        "live_rows_have_text": F.col("text").isNull(),
    }
    frames = [
        pages.filter(cond).select(
            F.lit(name).alias("constraint"), F.col("url").alias("offending_url")
        )
        for name, cond in checks.items()
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def derive_all(pages: DataFrame, events: DataFrame) -> dict[str, DataFrame]:
    """The full DAG, declared at once (stage order is data-dependency only
    — Catalyst handles it, unlike the reference's manual script ordering)."""
    stats = page_stats(pages)
    return {
        "dim_domain": dim_domain(pages),
        "dim_lang": dim_lang(pages),
        "page_stats": stats,
        "domain_rollup": domain_rollup(stats),
        "lineage_rollup": lineage_rollup(events),
        "change_history": change_history(events),
        "validation": validation(pages),
    }
