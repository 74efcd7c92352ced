"""Top-N / limit-offset operators.

Query-time Top-N (``measure_plan_top.go:44-168``): after group+agg keep the
top (DESC) or bottom (ASC) N rows by a field. Spark's ``orderBy().limit(n)``
lowers to TakeOrderedAndProject — each partition keeps a local N-heap and the
driver merges N*partitions rows, the same bounded-heap strategy as the
reference's ``measure_top.go:53-174`` but distributed. Ties are broken by the
remaining columns so results are total-ordered (required for the
deterministic-oracle comparison; the reference's heap is similarly stable).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..model import Sort
from .criteria import qcol


def top_n(
    df: DataFrame,
    field: str,
    n: int,
    sort: Sort = Sort.DESC,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    key = qcol(field).desc() if sort is Sort.DESC else qcol(field).asc()
    order = [key] + [qcol(c).asc() for c in tiebreak if c != field]
    return df.orderBy(*order).limit(n)


def per_window_top_n(
    df: DataFrame,
    window_cols: Sequence[str],
    field: str,
    n: int,
    sort: Sort = Sort.DESC,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Top-N within each time window (TopN pre-agg read shape,
    ``topn_plan_localscan.go``): row_number over (window) ordered by field."""
    from pyspark.sql.window import Window

    key = qcol(field).desc() if sort is Sort.DESC else qcol(field).asc()
    order = [key] + [qcol(c).asc() for c in tiebreak if c != field]
    w = Window.partitionBy(*[qcol(c) for c in window_cols]).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


# Above this many rows, limit+offset must NOT lower to TakeOrderedAndProject:
# its per-task top-K selector allocates O(limit+offset) memory, so a huge
# pagination offset (the API allows uint32) would OOM every executor. Spark's
# default topKSortFallbackThreshold is ~Int.MaxValue; capping it routes big
# offsets to the spill-safe global Sort + CollectLimit path while small
# pages keep the optimal bounded-heap plan.
_TOPK_SAFE_ROWS = 4_000_000
_TOPK_KEY = "spark.sql.execution.topKSortFallbackThreshold"


def ensure_pagination_memory_safety(spark) -> None:
    """SESSION-LEVEL engine policy (ADVICE r4 made this explicit): cap
    ``topKSortFallbackThreshold`` at ``_TOPK_SAFE_ROWS`` so any sort+limit
    whose limit+offset exceeds ~4M rows plans as the spill-safe global
    Sort + CollectLimit instead of a per-task O(limit+offset) heap.

    The cap PERSISTS for the session — deliberately. It cannot be scoped to
    one query: physical planning happens lazily at action time, after this
    function returns, so a set-then-restore would never reach the planner.
    It is also the plan we'd want for EVERY >4M-row sort+limit in the
    session, not just paginated ones (a 4M-row per-task heap is worse than
    a spillable sort regardless of who asks). A user's own LOWER setting is
    preserved; concurrent callers all write the same constant, so the
    check-then-set race is benign (last write = same value)."""
    cur = int(spark.conf.get(_TOPK_KEY))
    if cur > _TOPK_SAFE_ROWS:  # only ever lower a user's setting
        spark.conf.set(_TOPK_KEY, str(_TOPK_SAFE_ROWS))


def limit_offset(df: DataFrame, limit: Optional[int], offset: int) -> DataFrame:
    """Pagination (``measure_plan.go:37-131``); offset beyond end -> empty.
    Spark ≥3.4 supports a real OFFSET; both lower into the sort/limit leaf.

    Side effect: a limit+offset past ``_TOPK_SAFE_ROWS`` engages the
    session-wide :func:`ensure_pagination_memory_safety` cap (see its
    docstring for why it persists)."""
    if offset + (limit or 0) > _TOPK_SAFE_ROWS:
        ensure_pagination_memory_safety(df.sparkSession)
    if offset:
        df = df.offset(offset)
    if limit is not None:
        # the reference's "unlimited" sentinel is 0xffffffff (uint32 max,
        # stream all_max_limit golden case); Spark's limit is a Java int
        df = df.limit(min(limit, 2**31 - 1))
    return df
