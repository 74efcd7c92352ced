"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``skywalking_banyandb_spark`` — entries are built
through the engine's typed query model (MeasureQuery/StreamQuery/...) and
plan compilers so the gate exercises the engine itself.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from skywalking_banyandb_spark import registry
from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.model import (
    AggFunc,
    AggregationSpec,
    MeasureQuery,
    TimeRange,
)
from skywalking_banyandb_spark.plans.measure import compile_measure


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (M0 golden-case analogue ``group_max``):
    per-series MAX over a time window on the measure path."""
    sf_dir = "/root/testdata/sf0.001"
    q = MeasureQuery(
        groups=["g1"],
        name="metrics",
        time_range=TimeRange.of("2024-01-01T00:00:00", "2024-02-01T00:00:00"),
        group_by=["user_id"],
        agg=AggregationSpec(AggFunc.MAX, "value"),
        limit=1000,
    )
    return compile_measure(spark, default_catalog(sf_dir), q)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
