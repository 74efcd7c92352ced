"""Multi-group merge — UNION ALL with NULL-filled schema union.

Reference: one query may span N groups; per-group plans run and results merge
with schemas union'd, new tags/fields NULL-filled
(``pkg/query/logical/measure/measure_plan_merge.go:39-176``,
``cross_group_merge.go:35-131``, schema merge ``logical/measure/schema.go``).
Spark's ``unionByName(allowMissingColumns=True)`` is exactly this; the final
sort/limit runs once over the union (no k-way heap needed — the shuffle sort
does it).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame


def union_groups(dfs: Sequence[DataFrame]) -> DataFrame:
    if not dfs:
        raise ValueError("union_groups needs at least one input")
    if len(dfs) == 1:
        return dfs[0]
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
