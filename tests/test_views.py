"""SQL view surface: plain spark.sql over the registered views must agree
with the typed-query compilers (measure dedup baked in), and predicates
written in SQL must still reach the scan."""

from __future__ import annotations

import pytest

from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.model import (
    AggFunc,
    AggregationSpec,
    MeasureQuery,
    TimeRange,
)
from skywalking_banyandb_spark.plans.measure import compile_measure
from skywalking_banyandb_spark.views import register_views

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def views(spark):
    names = register_views(spark, default_catalog(SF_SMALL))
    yield names
    for n in names:
        spark.catalog.dropTempView(n)


def test_views_registered(spark, views):
    assert "measure_metrics_g1" in views
    assert "stream_event_log_g1" in views
    assert "trace_event_trace_g1" in views
    assert "property_documents_g1" in views


def test_sql_over_measure_view_matches_typed_query(spark, views):
    sql = spark.sql("""
        SELECT event_type, MAX(value) AS value
        FROM measure_metrics_g1
        WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
          AND ts <  TIMESTAMP '2024-01-27 00:00:00'
        GROUP BY event_type
    """)
    q = MeasureQuery(
        groups=["g1"], name="metrics",
        time_range=TimeRange.of("2024-01-03T00:00:00", "2024-01-27T00:00:00"),
        group_by=["event_type"], agg=AggregationSpec(AggFunc.MAX, "value"),
        limit=100000,
    )
    typed = compile_measure(spark, default_catalog(SF_SMALL), q)
    assert ({(r.event_type, r.value) for r in sql.collect()}
            == {(r.event_type, r.value) for r in typed.collect()})


def test_measure_view_has_dedup_and_no_version_column(spark, views):
    df = spark.table("measure_metrics_g1")
    assert "event_id" not in df.columns  # version column stripped
    # raw table has duplicate (user_id, ts) versions; view must not
    n_keys = df.select("user_id", "ts").distinct().count()
    assert df.count() == n_keys


def test_sql_predicate_pushes_below_dedup(spark, views):
    df = spark.sql("""
        SELECT user_id, value FROM measure_metrics_g1
        WHERE user_id = 3
    """)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the user_id filter is a dedup group key -> pushed to the scan
    assert "PushedFilters: [" in plan and "user_id" in plan.split("PushedFilters")[1][:200], plan
