"""CDC change-event model, generator, registry and apply pipeline."""

from aus_land_data_etl_spark.cdc.events import EVENT_SCHEMA, PAGES_SCHEMA  # noqa: F401
from aus_land_data_etl_spark.cdc.generator import generate_events  # noqa: F401
from aus_land_data_etl_spark.cdc.registry import SchemaRegistry  # noqa: F401
from aus_land_data_etl_spark.cdc.apply import apply_batch, create_pages_table  # noqa: F401
