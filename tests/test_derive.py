"""Derive DAG over a converged pages table (end-to-end staged flow)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aus_land_data_etl_spark.cdc.apply import apply_batch, create_pages_table
from aus_land_data_etl_spark.cdc.generator import generate_events
from aus_land_data_etl_spark.lake.merge import read_current
from aus_land_data_etl_spark.plans.derive import derive_all


@pytest.fixture(scope="module")
def converged(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("derive_tbl"))
    events = generate_events(spark, 2000, seed=33).cache()
    table = create_pages_table(spark, d, n_buckets=8)
    apply_batch(table, events, epoch=0)
    return read_current(table).cache(), events


def test_derive_all(spark, converged):
    pages, events = converged
    out = derive_all(pages, events)
    # dims are distinct and deterministic
    dd = out["dim_domain"]
    assert dd.count() == dd.select("domain").distinct().count()
    ids1 = {r["domain_id"] for r in dd.collect()}
    ids2 = {r["domain_id"] for r in derive_all(pages, events)["dim_domain"].collect()}
    assert ids1 == ids2
    # stats cover every live page
    assert out["page_stats"].count() == pages.count()
    # rollup totals reconcile with stats
    n = out["domain_rollup"].agg(F.sum("n_pages")).collect()[0][0]
    assert n == pages.count()
    # lineage covers all events
    assert (
        out["lineage_rollup"].agg(F.sum("n_events")).collect()[0][0] == events.count()
    )
    # validation holds on the engine's own output (K6 gate)
    assert out["validation"].count() == 0


def test_validation_catches_violations(spark, converged):
    pages, events = converged
    broken = pages.withColumn(
        "url", F.when(F.col("lang") == "en", F.lit("notaurl")).otherwise(F.col("url"))
    )
    bad = derive_all(broken, events)["validation"]
    assert bad.filter(F.col("constraint") == "url_has_scheme").count() > 0
