"""Structured Streaming shell for the CDC pipeline."""

from aus_land_data_etl_spark.streaming.runner import (  # noqa: F401
    run_stream,
    write_event_log,
)
