"""Snapshot-committed bucketed-parquet lake tables.

Iceberg-style semantics implemented over plain parquet (the sandbox image
ships no Iceberg/Delta jars): atomic snapshot commits, time travel,
per-epoch lineage manifests, bucket-layout metadata enabling bucket-pruned
copy-on-write MERGE.  On a real cluster this layer is swapped for Iceberg
(``MERGE INTO`` + snapshot properties); the public API is format-agnostic.
"""

from aus_land_data_etl_spark.lake.table import LakeTable  # noqa: F401
from aus_land_data_etl_spark.lake.merge import merge_into  # noqa: F401
