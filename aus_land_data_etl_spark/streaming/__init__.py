"""Structured Streaming shell for the CDC pipeline."""

from aus_land_data_etl_spark.streaming.runner import (  # noqa: F401
    run_stream,
    write_event_log,
)
from aus_land_data_etl_spark.streaming.windowed import (  # noqa: F401
    dedup_within_watermark,
    latest_per_key_stateful,
    windowed_rollup,
)
