"""Event-metadata-driven schema registry (SURVEY.md §1.3).

The reference selects one of five positional syntaxes by data vintage and
maps each onto a superset schema with defaults for missing fields
(/root/reference/lib/pipeline/nsw_vg/property_sales/file_format/
syntax.py:10-63, factories.py:156-265).  Here each change event carries
``schema_version``; the registry projects every version onto the current
canonical superset with pure column expressions:

- v1  base columns only (``lang`` missing → NULL, the 1990-format analog);
- v2  adds ``lang`` as a typed column (added column);
- v3  renames ``lang`` → ``language`` inside the JSON side-car (rename
  mapping);
- v4  adds ``fetch_status`` (promoted to a real table column — the
  ``ALTER TABLE ADD COLUMN`` analog, applied by merge's superset union)
  and widens ``source_pos`` semantics int→long (type widening — parquet
  readers handle int32→int64 natively).

Adding a future version = registering one more projection case; no
pipeline code changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.events import PAYLOAD_EXTRA_SCHEMA

#: Versions this registry understands.  An event with an unknown version is
#: routed to the dead-letter output rather than guessed at.
KNOWN_VERSIONS = (1, 2, 3, 4)


class SchemaRegistry:
    """Projects raw change events onto the canonical superset columns."""

    def __init__(self, versions: tuple[int, ...] = KNOWN_VERSIONS):
        self.versions = versions

    def _extra(self, df: DataFrame) -> Column:
        return F.from_json(F.col("payload_extra"), PAYLOAD_EXTRA_SCHEMA)

    def project(self, events: DataFrame) -> DataFrame:
        """Raw events → canonical columns.  Pure expressions, single pass."""
        extra = self._extra(events)
        v = F.col("schema_version")
        lang = (
            F.when(v <= 1, F.lit(None).cast("string"))
            .when(v == 2, F.col("lang"))
            .otherwise(extra["language"])  # v3+: renamed field in side-car
        )
        fetch_status = F.when(v >= 4, extra["fetch_status"]).cast("int")
        return events.select(
            "event_id",
            "op",
            "url",
            "warc_ts",
            "html",
            lang.alias("lang"),
            fetch_status.alias("fetch_status"),
            "source_partition",
            "source_offset",
            "source_file",
            F.col("source_pos").cast("long").alias("source_pos"),
        )

    def dead_letter(self, events: DataFrame) -> DataFrame:
        """Events with unknown schema versions (validation predicate path —
        the analog of the reference's typed-reader error rows,
        raw_data/rows.py:106-127)."""
        return events.filter(~F.col("schema_version").isin(list(self.versions)))

    def valid(self, events: DataFrame) -> DataFrame:
        return events.filter(F.col("schema_version").isin(list(self.versions)))
