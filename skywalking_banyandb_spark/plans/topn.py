"""Top-N pre-aggregation — materialization job + read path.

Reference, write-time half (``banyand/measure/topn.go:562-583,744-810``):
measure writes tee into Filter(criteria) → Map(field+groupTags) → tumbling
window (size = measure interval) → per-group bounded Top-N heap with in-place
entity replacement (``pkg/flow/streaming/topn.go:51-305``) → snapshots into a
hidden ``_top_n_result`` measure. Read-time half
(``banyand/query/processor_topn.go:101-240``): scan the pre-agg measure,
per-entity distinct keeping the best value (``topn_plan_distinct.go:50-289``),
optional post-aggregation across windows (``processor_topn.go:189-240``),
emit ranked lists.

Spark-first: batch recompute — per (window, entity) the *latest* point wins
(the heap's replace-on-same-key semantics), then rank ≤ N within the window.
This is semantically exact, and at scale the window agg + rank is two
shuffle-free stages after a single shuffle on (window, entity) /(window).
The streaming variant lives in ``streaming/topn_stream.py``.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog, MeasureSchema
from ..errors import QueryAnalyzeError
from ..model import AggFunc, Sort, TopNQuery
from ..sources.parquet import read_table
from ..operators.criteria import compile_criteria, qcol
from ..operators.topk import per_window_top_n, top_n
from .measure import agg_expr


def materialize_topn(
    spark: SparkSession,
    schema: MeasureSchema,
    field: str,
    n: int,
    window: str = "1 hour",
    sort: Sort = Sort.DESC,
    stages: Sequence[str] = (),
    criteria=None,
    group_tags: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Build the ``_top_n_result`` table from the source measure (batch).

    Output: (window_start, group_tags..., field) with ≤ N rows per window.

    ``criteria`` is the TopNAggregation DECLARATION's pre-filter
    (``schema.proto`` TopNAggregation.criteria; the conformance
    ``not_in_svc2_svc4`` aggregation declares ``service_id NOT_IN
    [svc_2, svc_4]``): rows are filtered BEFORE the windowed ranking, so
    excluded entities never enter the materialized view — distinct from
    query-time ``conditions``, which the reference restricts to EQ.

    ``group_tags`` is the declaration's ``group_by_tag_names`` (the tags
    that key the ranking — e.g. ``http.uri`` for the conformance
    ``*_endpoint_*`` aggregations); None defaults to the source measure's
    entity, the reference's own default."""
    from ..catalog import materialize_derived, resolve_stage_paths

    if schema.field(field) is None:
        raise QueryAnalyzeError(f"top-n over unknown field {field!r}")
    keys = list(group_tags) if group_tags else list(schema.entity)
    df = read_table(spark, *resolve_stage_paths(schema, stages))
    df = materialize_derived(df, schema)
    for k in keys:
        if k not in df.columns:
            raise QueryAnalyzeError(
                f"top-n groupBy tag {k!r} is not a tag of {schema.name!r}")
    if criteria is not None:
        from ..operators.criteria import types_of

        tagmap = {t.name: t.analyzer for t in schema.tags}
        tagmap[schema.ts_column] = None
        pred = compile_criteria(criteria, tagmap, types_of(schema))
        if pred is not None:
            df = df.where(pred)
    win_start = F.window(F.col(schema.ts_column), window)["start"].alias("window_start")
    # per (window, group tags): latest write wins (heap replace semantics)
    # — max_by keyed on (ts, version) keeps it a partial-aggregatable agg.
    order_key = F.struct(
        F.col(schema.ts_column),
        *( [F.col(schema.version_column)] if schema.version_column else [] ),
    )
    latest = (
        df.groupBy(win_start, *[qcol(e) for e in keys])
        .agg(F.max_by(F.col(field), order_key).alias(field))
    )
    return per_window_top_n(
        latest, ["window_start"], field, n, sort, tiebreak=keys
    )


def compile_topn(
    spark: SparkSession,
    catalog: Catalog,
    q: TopNQuery,
    field: str = "value",
    window: str = "1 hour",
) -> DataFrame:
    """TopNQuery -> DataFrame (batch recompute path).

    Without ``agg``: per-window ranked lists (window_start, entity, value).
    With ``agg``: per-entity re-aggregation across windows then a final
    top-N (``processor_topn.go:189-240`` + ``topn_plan_distinct.go``).

    Name resolution mirrors ``topn_analyzer.go``: the query names a
    TopNAggregation DECLARATION, which carries the source measure, ranked
    field, groupBy tags, and optional pre-filter criteria
    (``catalog.TopNAggregationSchema``). When no declaration is
    registered under the name, the name resolves as a measure directly
    with ``field``/entity defaults — the engine's native shorthand."""
    from ..errors import SchemaError

    try:
        decls = catalog.get_many(q.groups, "topn", q.name)
    except SchemaError:
        decls = None
    if decls:
        return _compile_topn_resolved(spark, catalog, q, decls, window)
    schemas = catalog.get_many(q.groups, "measure", q.name)
    ref: MeasureSchema = schemas[0]
    parts = []
    for s in schemas:
        if s.topn_path:
            # materialized-view routing (SURVEY §4.1, topn_analyzer.go):
            # scan the maintained _top_n_result table instead of the source
            # measure; re-rank to the query's N (the stored counters_number
            # may exceed it)
            import os as _os

            if not _os.path.exists(s.topn_path):
                raise QueryAnalyzeError(
                    f"topn materialization {s.topn_path!r} does not exist"
                )
            stored = read_table(spark, s.topn_path)
            df = per_window_top_n(
                stored, ["window_start"], field, q.top_n, q.sort,
                tiebreak=list(s.entity),
            )
        else:
            df = materialize_topn(
                spark, s, field, q.top_n, window, q.sort, stages=q.stages
            )
        ts = F.col("window_start")
        if q.time_range.begin is not None:
            df = df.where(ts >= F.lit(q.time_range.begin))
        if q.time_range.end is not None:
            df = df.where(ts < F.lit(q.time_range.end))
        parts.append(df)
    from ..operators.merge import union_groups

    df = union_groups(parts)
    if q.conditions:
        from ..model import BinaryOp
        from ..operators.criteria import compile_condition

        tagmap = {t.name: t.analyzer for t in ref.tags}
        for c in q.conditions:
            # Reference analyze-time rules (topn_plan_localscan.go:137,149):
            # conditions may only reference the materialization's groupBy /
            # entity tags, and entity tags support EQ only. Anything else is
            # an error, never a silently-dropped predicate.
            if c.tag not in df.columns:
                raise QueryAnalyzeError(
                    f"topn condition on {c.tag!r}: only groupBy tag name is "
                    f"supported (available: {sorted(set(df.columns) - {'window_start', field})})"
                )
            if c.tag in ref.entity and c.op is not BinaryOp.EQ:
                raise QueryAnalyzeError(
                    f"tag {c.tag!r} belongs to the entity and only supports "
                    f"EQ operation in conditions (got {c.op.name})"
                )
            df = df.where(compile_condition(c, tagmap))
    if q.agg is None:
        return df.orderBy(
            F.col("window_start").asc(),
            F.col(field).desc() if q.sort is Sort.DESC else F.col(field).asc(),
            *[F.col(e).asc() for e in ref.entity],
        )
    # distinct-entity + post-aggregation across windows
    fspec = ref.field(field)
    agged = df.groupBy(*[F.col(e) for e in ref.entity]).agg(
        agg_expr(q.agg, field, fspec.type).alias(field)
    )
    return top_n(agged, field, q.top_n, q.sort, tiebreak=list(ref.entity))


def _compile_topn_resolved(
    spark: SparkSession,
    catalog: Catalog,
    q: TopNQuery,
    decls,
    window: str = "1 hour",
) -> DataFrame:
    """Declaration-resolved TopN (``topn_analyzer.go``): the query named a
    registered TopNAggregation; rank the declaration's field keyed by its
    groupBy tags over the declaration's source measure, with the
    declaration's criteria as the write-side pre-filter."""
    from ..operators.criteria import qcol
    from ..operators.merge import union_groups
    from ..model import BinaryOp
    from ..operators.criteria import compile_condition

    ref = decls[0]
    field = ref.field_name
    keys = list(ref.group_by_tags)
    src0 = catalog.get(
        ref.source_measure[0], "measure", ref.source_measure[1])
    parts = []
    for d in decls:
        src = catalog.get(d.source_measure[0], "measure", d.source_measure[1])
        df = materialize_topn(
            spark, src, d.field_name, q.top_n, window, q.sort,
            stages=q.stages, criteria=d.criteria,
            group_tags=d.group_by_tags,
        )
        ts = F.col("window_start")
        if q.time_range.begin is not None:
            df = df.where(ts >= F.lit(q.time_range.begin))
        if q.time_range.end is not None:
            df = df.where(ts < F.lit(q.time_range.end))
        parts.append(df)
    df = union_groups(parts)
    if q.conditions:
        tagmap = {t.name: t.analyzer for t in src0.tags}
        for c in q.conditions:
            # topn_plan_localscan.go:137,149 — conditions only on the
            # declaration's groupBy tags; entity tags accept EQ only
            if c.tag not in keys:
                raise QueryAnalyzeError(
                    f"topn condition on {c.tag!r}: only groupBy tag name "
                    f"is supported (available: {sorted(keys)})"
                )
            if c.tag in src0.entity and c.op is not BinaryOp.EQ:
                raise QueryAnalyzeError(
                    f"tag {c.tag!r} belongs to the entity and only supports "
                    f"EQ operation in conditions (got {c.op.name})"
                )
            df = df.where(compile_condition(c, tagmap))
    if q.agg is None:
        return df.orderBy(
            F.col("window_start").asc(),
            qcol(field).desc() if q.sort is Sort.DESC else qcol(field).asc(),
            *[qcol(e).asc() for e in keys],
        )
    fspec = src0.field(field)
    agged = df.groupBy(*[qcol(e) for e in keys]).agg(
        agg_expr(q.agg, field, fspec.type).alias(field)
    )
    return top_n(agged, field, q.top_n, q.sort, tiebreak=keys)
