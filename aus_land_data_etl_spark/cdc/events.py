"""Change-event envelope and target-table schemas (FIXTURES.md §1–2).

The event envelope mirrors the reference's change metadata
(``change_type``, ``last_update`` — /root/reference/sql/nsw_spatial/schema/
002_APPLY_staging.sql:14-21,48-52) and lineage columns
(``source_file_name``, ``source_line_number`` —
sql/nsw_vg/schema/002_APPLY_create_raw.sql:43-45; byte positions
sql/meta/schema/001_APPLY_init.sql:48-57).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: The binlog/WAL-style change event (one row per change).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),  # sha256(file‖pos)
        T.StructField("op", T.StringType(), False),  # insert|update|delete
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),  # LWW version
        T.StructField("html", T.BinaryType(), True),  # null for deletes
        T.StructField("lang", T.StringType(), True),  # v2+ only
        T.StructField("schema_version", T.IntegerType(), False),
        T.StructField("payload_extra", T.StringType(), True),  # JSON side-car
        T.StructField("source_partition", T.IntegerType(), False),
        T.StructField("source_offset", T.LongType(), False),
        T.StructField("source_file", T.StringType(), False),
        T.StructField("source_pos", T.LongType(), False),
    ]
)

#: The converged target table (BASELINE.json input_hint) + engine-maintained
#: columns (tiebreak id, tombstone flag, lineage).
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("event_id", T.StringType(), False),
        T.StructField("is_deleted", T.BooleanType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source_file", T.StringType(), True),
        T.StructField("source_pos", T.LongType(), True),
    ]
)

#: Partial-image change envelope (binlog_row_image=MINIMAL shipper): a
#: ``patch`` op names the cells it determines in ``set_cols``; shipping
#: ``html`` implies the derived ``text`` cell (extraction re-runs on the
#: patched bytes, preserving the byte-identical text-per-url invariant).
#: Full images / deletes carry ``set_cols`` NULL (determine everything).
PATCH_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("op", T.StringType(), False),  # insert|update|delete|patch
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),  # LWW version
        T.StructField("set_cols", T.ArrayType(T.StringType()), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source_partition", T.IntegerType(), False),
        T.StructField("source_offset", T.LongType(), False),
        T.StructField("source_file", T.StringType(), False),
        T.StructField("source_pos", T.LongType(), False),
    ]
)

#: JSON fields that may appear in payload_extra, by schema version.
PAYLOAD_EXTRA_SCHEMA = T.StructType(
    [
        T.StructField("language", T.StringType(), True),  # v3 rename of lang
        T.StructField("fetch_status", T.IntegerType(), True),  # v4 added col
    ]
)
