"""Trace query compiler — TraceQuery -> DataFrame of spans grouped by trace.

Reference: ``pkg/query/logical/trace/trace_plan_local.go:43-120`` scans spans
by time/tags/trace-ids (sidx-ordered) and regroups them into ``Trace``
messages (``trace/v1/query.proto:31-57``). The regroup is the reference's
only join-like operation; on Spark it is ``groupBy(trace_id)`` +
``collect_list`` over spans sorted within each trace.

Scale note: the per-trace span list is assembled with
``sort_array(collect_list(struct(ts, span_id, ...)))`` — a declarative
aggregate with map-side partial combine, shuffling only grouped lists. Spans
of one trace co-locate after the shuffle regardless of input partitioning;
with storage bucketed by trace_id the shuffle disappears.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog, TraceSchema
from ..errors import QueryAnalyzeError
from ..model import Sort, TraceQuery, DEFAULT_LIMIT
from ..sources.parquet import read_table
from ..operators.criteria import compile_criteria, types_of
from ..operators.merge import union_groups
from ..operators.topk import limit_offset


def _tagmap(schema: TraceSchema) -> Dict[str, Optional[str]]:
    out: Dict[str, Optional[str]] = {
        schema.ts_column: None,
        schema.trace_id_column: None,
        schema.span_id_column: None,
    }
    for t in schema.tags:
        out[t.name] = t.analyzer
    return out


def compile_trace(spark: SparkSession, catalog: Catalog, q: TraceQuery) -> DataFrame:
    schemas: List[TraceSchema] = catalog.get_many(q.groups, "trace", q.name)
    ref = schemas[0]
    tagmap = _tagmap(ref)
    pred = compile_criteria(q.criteria, tagmap, types_of(ref))

    from ..catalog import resolve_stage_paths

    parts = []
    for s in schemas:
        df = read_table(
            spark, *resolve_stage_paths(s, q.stages),
            time_range=(s.ts_column, q.time_range.begin, q.time_range.end),
        )
        if pred is not None:
            df = df.where(pred)
        if q.trace_ids:
            df = df.where(F.col(s.trace_id_column).isin(*list(q.trace_ids)))
        parts.append(df)
    df = union_groups(parts)

    tid = F.col(ref.trace_id_column)
    span_payload = [ref.ts_column, ref.span_id_column] + [t.name for t in ref.tags]
    if ref.span_column:
        span_payload.append(ref.span_column)
    # spans sorted by (ts, span_id) within each trace — sidx ordering analogue
    grouped = df.groupBy(tid.alias("trace_id")).agg(
        F.sort_array(
            F.collect_list(F.struct(*[F.col(c) for c in span_payload]))
        ).alias("spans"),
        F.count(F.lit(1)).alias("span_count"),
        F.min(F.col(ref.ts_column)).alias("start_ts"),
        F.max(F.col(ref.ts_column)).alias("end_ts"),
    )

    order = q.order_by
    if order is not None and order.tag is not None:
        raise QueryAnalyzeError("trace ordering is by time (start_ts) only")
    direction = order.sort if order else Sort.ASC
    kcol = F.col("start_ts").desc() if direction is Sort.DESC else F.col("start_ts").asc()
    grouped = grouped.orderBy(kcol, F.col("trace_id").asc())

    limit = q.limit if q.limit is not None else DEFAULT_LIMIT
    return limit_offset(grouped, limit, q.offset)
