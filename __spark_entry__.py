"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC convergence on sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator inventory from
SURVEY.md §2 plus the training-data ops, each oracle-checked against
DuckDB where SQL-expressible (approximate ops — MinHash-LSH, SimHash,
hyperplane-LSH ANN — are rows-only by nature; their exact counterparts
are oracle-checked).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from aus_land_data_etl_spark.plans.driver_queries import (  # noqa: E402
    ORACLES,
    QUERIES,
    q_cdc_engine_converge,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the CDC engine converging the sf0.001 event log."""
    return q_cdc_engine_converge(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
