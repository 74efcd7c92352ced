"""Differential testing — the engine's DataFrame plans vs equivalent Spark
SQL text on the same session (the analogue of the reference's
vectorized-vs-row diff tests, ``pkg/query/vectorized/measure/diff_test.go``).
Same engine, two plan-construction paths; results must agree exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.model import (
    AggFunc,
    AggregationSpec,
    BinaryOp,
    MeasureQuery,
    Sort,
    TimeRange,
    TopSpec,
    and_,
    cond,
)
from skywalking_banyandb_spark.plans.measure import compile_measure
from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL

TR = TimeRange.of("2024-01-03T00:00:00", "2024-01-27T00:00:00")


@pytest.fixture(scope="module", autouse=True)
def events_view(spark):
    read_table(spark, f"{SF_SMALL}/events.parquet").createOrReplaceTempView("ev")
    yield
    spark.catalog.dropTempView("ev")


DEDUP_SQL = """
    SELECT * FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, ts ORDER BY event_id DESC) AS _rn
      FROM ev
      WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
        AND ts <  TIMESTAMP '2024-01-27 00:00:00'
    ) WHERE _rn = 1
"""


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_group_agg_dual(spark):
    q = MeasureQuery(
        groups=["g1"], name="metrics", time_range=TR,
        group_by=["event_type"], agg=AggregationSpec(AggFunc.SUM, "value"),
        limit=10000,
    )
    df = compile_measure(spark, default_catalog(SF_SMALL), q)
    sql = spark.sql(f"""
        SELECT event_type,
               CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS value
        FROM ({DEDUP_SQL}) GROUP BY event_type
    """)
    assert _rows(df) == _rows(sql)


def test_filter_scan_dual(spark):
    q = MeasureQuery(
        groups=["g1"], name="metrics", time_range=TR,
        criteria=and_(cond("event_type", BinaryOp.IN, ["click", "error"]),
                      cond("value", BinaryOp.GE, 50.0)),
        tag_projection=["user_id", "event_type"], field_projection=["value"],
        limit=300, offset=7,
    )
    df = compile_measure(spark, default_catalog(SF_SMALL), q)
    sql = spark.sql(f"""
        SELECT ts, user_id, event_type, value FROM ({DEDUP_SQL})
        WHERE event_type IN ('click', 'error') AND value >= 50.0
        ORDER BY ts, user_id LIMIT 300 OFFSET 7
    """)
    assert _rows(df) == _rows(sql)


def test_topn_dual(spark):
    q = MeasureQuery(
        groups=["g1"], name="metrics", time_range=TR,
        group_by=["user_id"], agg=AggregationSpec(AggFunc.MEAN, "value"),
        top=TopSpec(7, "value", Sort.ASC), limit=100,
    )
    df = compile_measure(spark, default_catalog(SF_SMALL), q)
    sql = spark.sql(f"""
        SELECT user_id,
               CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) / COUNT(value) AS value
        FROM ({DEDUP_SQL}) GROUP BY user_id
        ORDER BY value ASC, user_id LIMIT 7
    """)
    assert _rows(df) == _rows(sql)
