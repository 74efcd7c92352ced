"""Skew-resistant aggregation — salted two-phase group-by.

AQE's skew-join handling covers joins, but a group-by on a hot key (one
service emitting 100× the points of the rest — routine in observability
data) still lands the whole key on one reducer. The classic fix is
salting: phase 1 groups on (key, salt) so the hot key spreads over
``n_salts`` reducers, phase 2 merges the per-salt partials.

All five reference aggregations (``model/v1/common.proto:74-81``) have
exact salted decompositions:

    MIN  -> min of per-salt mins          MAX -> max of per-salt maxes
    SUM  -> sum of per-salt sums          COUNT -> sum of per-salt counts
    MEAN -> sum(per-salt sums) / sum(per-salt counts)

The float SUM/MEAN decimal accumulation (see ``plans/measure.py``) is
associative, so salting does not change results — verified bit-exact in
``tests/test_skew.py``. Phase 2 shuffles ``groups × n_salts`` rows — at
100 TB that is noise next to the unsalted single-reducer hot key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import QueryAnalyzeError
from ..model import AggFunc

_DEC = "decimal(24,6)"


def salted_group_agg(
    df: DataFrame,
    group_by: Sequence[str],
    func: AggFunc,
    field: str,
    field_type: str = "FLOAT",
    n_salts: int = 16,
    alias: str | None = None,
) -> DataFrame:
    """GroupBy+agg with a salt column spreading each key over ``n_salts``
    partial groups. Exact for MIN/MAX/SUM/COUNT/MEAN; bit-identical to the
    unsalted plan for float SUM/MEAN thanks to decimal accumulation."""
    alias = alias or field
    col = F.col(field)
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    keys = [F.col(g) for g in group_by]

    if func in (AggFunc.MIN, AggFunc.MAX):
        f1 = F.min(col) if func is AggFunc.MIN else F.max(col)
        partial = salted.groupBy(*keys, F.col("_salt")).agg(f1.alias("_p"))
        f2 = F.min("_p") if func is AggFunc.MIN else F.max("_p")
        return partial.groupBy(*keys).agg(f2.alias(alias))
    if func is AggFunc.COUNT:
        partial = salted.groupBy(*keys, F.col("_salt")).agg(F.count(col).alias("_p"))
        return partial.groupBy(*keys).agg(F.sum("_p").alias(alias))
    if func is AggFunc.SUM:
        if field_type == "INT":
            partial = salted.groupBy(*keys, F.col("_salt")).agg(F.sum(col).alias("_p"))
            return partial.groupBy(*keys).agg(F.sum("_p").alias(alias))
        partial = salted.groupBy(*keys, F.col("_salt")).agg(
            F.sum(col.cast(_DEC)).alias("_p")
        )
        return partial.groupBy(*keys).agg(F.sum("_p").cast("double").alias(alias))
    if func is AggFunc.MEAN:
        partial = salted.groupBy(*keys, F.col("_salt")).agg(
            F.sum(col.cast(_DEC)).alias("_s"), F.count(col).alias("_c")
        )
        return partial.groupBy(*keys).agg(
            (F.sum("_s").cast("double") / F.sum("_c")).alias(alias)
        )
    raise QueryAnalyzeError(f"unknown aggregation {func}")
