"""Scalar / vectorized column function library."""

from aus_land_data_etl_spark.functions.core import (  # noqa: F401
    code_label,
    deterministic_id,
    effective_date,
    normalised_key,
    parse_compact_date,
    parse_dmy_date,
    sqm_area,
    zone_standard,
)
from aus_land_data_etl_spark.functions.text import (  # noqa: F401
    extract_text_udf,
    lang_id,
    quality_score,
    simhash64,
    token_count,
)
