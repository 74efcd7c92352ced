"""BydbQL transformer — AST -> typed query -> DataFrame.

The analogue of the reference's ``pkg/bydbql/transformer.go`` (~1.9k LoC Go):
resolves identifiers against the live schema, types values, resolves relative
times, and dispatches per resource kind (measure :311, stream :232, trace
:421, property :523, SHOW TOP :631 in the reference). Behaviors preserved:

- relative time literals ``'-30m' / '-2h' / '-1d' / '-1w' / 'now'`` resolve
  at transform time (``transformer.go:152-160``);
- a measure key that is both tag and field requires ``::TAG`` / ``::FIELD``
  (``transformer.go:789``) — ambiguous bare use is an error;
- exactly one aggregation projection allowed; AVG is an alias of MEAN;
- PROPERTY ``WHERE ID = / ID IN`` routes to id selection.
"""

from __future__ import annotations

import datetime as dt
import re
from typing import Optional, Tuple

from pyspark.sql import DataFrame, SparkSession

from ..catalog import Catalog, MeasureSchema
from ..errors import QueryAnalyzeError
from ..model import (
    AggFunc,
    AggregationSpec,
    BinaryOp,
    Condition,
    Criteria,
    CriteriaNode,
    LogicalOp,
    MeasureQuery,
    OrderBy,
    PropertyQuery,
    Sort,
    StreamQuery,
    TimeRange,
    TopNQuery,
    TopSpec,
    TraceQuery,
)
from .parser import (
    OrderClause,
    ProjItem,
    SelectStmt,
    ShowTopStmt,
    Statement,
    TimeCond,
    parse,
)

_REL_RE = re.compile(r"^-(\d+)([mhdw])$")
_UNIT = {"m": "minutes", "h": "hours", "d": "days", "w": "weeks"}


def resolve_time(lit: str, now: dt.datetime) -> dt.datetime:
    """Relative/absolute timestamp literal -> datetime (transformer.go:152-160)."""
    if lit == "now":
        return now
    m = _REL_RE.match(lit)
    if m:
        return now - dt.timedelta(**{_UNIT[m.group(2)]: int(m.group(1))})
    s = lit.replace("Z", "+00:00")
    try:
        t = dt.datetime.fromisoformat(s)
    except ValueError:
        raise QueryAnalyzeError(f"bad timestamp literal {lit!r}")
    if t.tzinfo is not None:
        t = t.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return t


def time_range(cond: Optional[TimeCond], now: dt.datetime) -> TimeRange:
    """TIME clause -> half-open [begin, end) (model/v1/query.proto:125-130).

    ``TIME = t`` selects the single millisecond bucket [t, t+1ms).
    """
    if cond is None:
        return TimeRange(None, None)
    begin = resolve_time(cond.begin, now) if cond.begin else None
    end = resolve_time(cond.end, now) if cond.end else None
    if cond.op == "=":
        return TimeRange(begin, begin + dt.timedelta(milliseconds=1))
    if cond.op == ">":
        # strictly-after: open lower bound -> next representable ms
        return TimeRange(begin + dt.timedelta(milliseconds=1) if begin else None, None)
    if cond.op == "<":
        return TimeRange(None, end)
    if cond.op == ">=":
        return TimeRange(begin, None)
    if cond.op == "<=":
        return TimeRange(None, end + dt.timedelta(milliseconds=1) if end else None)
    return TimeRange(begin, end)


def _strip_family(name: str, schema) -> str:
    """Resolve a family-qualified identifier path (``family.tag``,
    ``grammar.go:291-295`` GrammarIdentifierPath) against the schema's
    declared tag families: ``default.user_id`` -> ``user_id`` when the tag's
    family matches. Unqualified or unresolvable names pass through so the
    normal unknown-name validation produces the error."""
    if "." not in name:
        return name
    fam, _, tag = name.partition(".")
    spec = schema.tag(tag) if hasattr(schema, "tag") else None
    if spec is not None and (getattr(spec, "family", "default") or "default") == fam:
        return tag
    return name


def _strip_families(stmt: SelectStmt, schema) -> SelectStmt:
    """Rewrite every identifier position of a parsed statement through
    :func:`_strip_family` (projection, WHERE tree, GROUP BY, ORDER BY,
    TOP)."""
    import dataclasses

    def rewrite_node(node):
        if node is None:
            return None
        if isinstance(node, Condition):
            return dataclasses.replace(node, tag=_strip_family(node.tag, schema))
        return Criteria(node.op, rewrite_node(node.left), rewrite_node(node.right))

    proj = stmt.projection
    if proj not in ("*", "()"):
        proj = tuple(
            dataclasses.replace(p, name=_strip_family(p.name, schema))
            for p in proj
        )
    top = stmt.top
    if top is not None:
        top = dataclasses.replace(
            top, field_name=_strip_family(top.field_name, schema)
        )
    order_by = stmt.order_by
    if order_by is not None and order_by.key is not None:
        order_by = dataclasses.replace(
            order_by, key=_strip_family(order_by.key, schema)
        )
    return dataclasses.replace(
        stmt,
        projection=proj,
        where=rewrite_node(stmt.where),
        group_by=tuple(_strip_family(g, schema) for g in stmt.group_by),
        order_by=order_by,
        top=top,
    )


def _split_projection(
    stmt: SelectStmt, schema: MeasureSchema
) -> Tuple[Tuple[str, ...], Tuple[str, ...], Optional[AggregationSpec]]:
    """Measure projection -> (tags, fields, agg) with ::TAG/::FIELD rules."""
    if stmt.projection in ("*", "()"):
        return (), (), None
    tags, fields = [], []
    agg: Optional[AggregationSpec] = None
    for item in stmt.projection:
        if item.agg is not None:
            if agg is not None:
                raise QueryAnalyzeError("only one aggregation projection allowed")
            if schema.field(item.name) is None:
                raise QueryAnalyzeError(f"aggregation over unknown field {item.name!r}")
            agg = AggregationSpec(AggFunc(item.agg), item.name)
            continue
        is_tag = schema.tag(item.name) is not None
        is_field = schema.field(item.name) is not None
        if item.hint == "TAG":
            if not is_tag:
                raise QueryAnalyzeError(f"{item.name!r} is not a tag")
            tags.append(item.name)
        elif item.hint == "FIELD":
            if not is_field:
                raise QueryAnalyzeError(f"{item.name!r} is not a field")
            fields.append(item.name)
        elif is_tag and is_field:
            raise QueryAnalyzeError(
                f"{item.name!r} is both tag and field; use ::TAG or ::FIELD"
            )
        elif is_tag:
            tags.append(item.name)
        elif is_field:
            fields.append(item.name)
        else:
            raise QueryAnalyzeError(f"unknown projection {item.name!r}")
    return tuple(tags), tuple(fields), agg


def _resolve_group_by(
    stmt: SelectStmt, schema: MeasureSchema,
    proj_tags: Tuple[str, ...], proj_fields: Tuple[str, ...],
) -> Tuple[str, ...]:
    """``transformer.go:746-825`` convertGroupBy: each GROUP BY column
    resolves against the PROJECTION — auto (no specifier) requires the
    name in exactly one of the projected tag/field sets (both → "specify
    the type explicitly", neither → "not found in projection"); ``::TAG``
    requires a projected tag; ``::FIELD`` requires a projected field and
    at most ONE field is allowed. A ``SELECT *``/``()`` projection
    projects the whole schema, so resolution falls back to the declared
    tags/fields. The field-resolved column is validated then carried no
    further — identical to the YAML boundary, where
    ``groupBy.fieldName`` is accepted and inert (the reference's own
    golden group_max/group_mean outputs show the field does not join the
    grouping key)."""
    star = stmt.projection in ("*", "()")
    tag_set = ({t.name for t in schema.tags} if star else set(proj_tags))
    field_set = ({f.name for f in schema.fields} if star
                 else set(proj_fields))
    hints = stmt.group_by_hints or (None,) * len(stmt.group_by)
    out_tags = []
    field_seen = None
    for name, hint in zip(stmt.group_by, hints):
        if hint is None:
            in_t, in_f = name in tag_set, name in field_set
            if in_t and in_f:
                raise QueryAnalyzeError(
                    f"column {name!r} found in both tags and fields, "
                    "please specify the type explicitly in group by")
            if not in_t and not in_f:
                raise QueryAnalyzeError(
                    f"column {name!r} not found in projection")
            hint = "TAG" if in_t else "FIELD"
        if hint == "FIELD":
            if field_seen is not None:
                raise QueryAnalyzeError(
                    "only one field is allowed in GROUP BY")
            if name not in field_set:
                raise QueryAnalyzeError(
                    f"field {name!r} not found in projection")
            field_seen = name
            continue
        if name not in tag_set:
            raise QueryAnalyzeError(
                f"tag {name!r} not found in projection")
        out_tags.append(name)
    return tuple(out_tags)


def to_query(
    stmt: Statement, catalog: Catalog, now: Optional[dt.datetime] = None
):
    """AST -> typed query object (dispatch per resource kind)."""
    if now is None:
        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)

    if isinstance(stmt, ShowTopStmt):
        import dataclasses

        from ..errors import SchemaError

        tr = time_range(stmt.time, now)
        # the name resolves to a TopNAggregation DECLARATION first
        # (topn_analyzer.go; conformance SHOW TOP inputs name the
        # declaration) — family-strip conditions against its source
        # measure; a plain measure name keeps working as the shorthand.
        # EVERY group is tried (a multi-group SHOW TOP may register the
        # declaration under a later group only).
        _sch = None
        for _g in stmt.groups:
            try:
                _decl = catalog.get(_g, "topn", stmt.name)
                _sch = catalog.get(
                    _decl.source_measure[0], "measure",
                    _decl.source_measure[1])
                break
            except SchemaError:
                continue
        if _sch is None:
            _sch = catalog.get(stmt.groups[0], "measure", stmt.name)
        conds = tuple(
            dataclasses.replace(c, tag=_strip_family(c.tag, _sch))
            for c in stmt.where
        )
        return TopNQuery(
            groups=stmt.groups, name=stmt.name, time_range=tr,
            top_n=stmt.number, sort=stmt.sort,
            agg=AggFunc(stmt.agg) if stmt.agg else None,
            conditions=conds, stages=stmt.stages,
        )

    assert isinstance(stmt, SelectStmt)
    tr = time_range(stmt.time, now)
    order = (
        OrderBy(tag=stmt.order_by.key, sort=stmt.order_by.sort)
        if stmt.order_by else None
    )

    if stmt.resource == "MEASURE":
        # merged logical schema across groups, first declaration wins
        # (measure_plan_merge.go) — projection items only one group
        # declares must resolve (multi_group_new_tag_field)
        from ..catalog import merged_schema

        schema: MeasureSchema = merged_schema(
            catalog, stmt.groups, "measure", stmt.name)
        stmt = _strip_families(stmt, schema)
        order = (
            OrderBy(tag=stmt.order_by.key, sort=stmt.order_by.sort)
            if stmt.order_by else None
        )
        tags, fields, agg = _split_projection(stmt, schema)
        group_by = _resolve_group_by(stmt, schema, tags, fields)
        top = None
        if stmt.top is not None:
            top = TopSpec(stmt.top.number, stmt.top.field_name, stmt.top.sort)
        return MeasureQuery(
            groups=stmt.groups, name=stmt.name, time_range=tr,
            criteria=stmt.where, tag_projection=tags, field_projection=fields,
            group_by=group_by, agg=agg, top=top, order_by=order,
            limit=stmt.limit, offset=stmt.offset or 0, stages=stmt.stages,
        )
    if stmt.resource == "STREAM":
        stmt = _strip_families(
            stmt, catalog.get(stmt.groups[0], "stream", stmt.name))
        order = (
            OrderBy(tag=stmt.order_by.key, sort=stmt.order_by.sort)
            if stmt.order_by else None
        )
        proj = () if stmt.projection in ("*", "()") else tuple(
            p.name for p in stmt.projection
        )
        limit = stmt.limit
        if stmt.top is not None:
            # SELECT TOP n field [dir] over a stream lowers to
            # order-by-field + limit n (grammar.go TOP projection)
            order = OrderBy(tag=stmt.top.field_name, sort=stmt.top.sort)
            limit = stmt.top.number if limit is None else min(limit, stmt.top.number)
            if stmt.top.field_name not in proj and proj:
                proj = (*proj, stmt.top.field_name)
        return StreamQuery(
            groups=stmt.groups, name=stmt.name, time_range=tr,
            criteria=stmt.where, projection=proj, order_by=order,
            limit=limit, offset=stmt.offset or 0, stages=stmt.stages,
        )
    if stmt.resource == "TRACE":
        stmt = _strip_families(
            stmt, catalog.get(stmt.groups[0], "trace", stmt.name))
        order = (
            OrderBy(tag=stmt.order_by.key, sort=stmt.order_by.sort)
            if stmt.order_by else None
        )
        proj = () if stmt.projection in ("*", "()") else tuple(
            p.name for p in stmt.projection
        )
        return TraceQuery(
            groups=stmt.groups, name=stmt.name, time_range=tr,
            criteria=stmt.where, projection=proj, order_by=order,
            limit=stmt.limit, offset=stmt.offset or 0, stages=stmt.stages,
        )
    if stmt.resource == "PROPERTY":
        stmt = _strip_families(
            stmt, catalog.get(stmt.groups[0], "property", stmt.name))
        order = (
            OrderBy(tag=stmt.order_by.key, sort=stmt.order_by.sort)
            if stmt.order_by else None
        )
        ids, rest = _extract_ids(stmt.where)
        proj = () if stmt.projection in ("*", "()") else tuple(
            p.name for p in stmt.projection
        )
        return PropertyQuery(
            group=stmt.groups[0], name=stmt.name, ids=ids,
            criteria=rest, projection=proj, order_by=order,
            limit=stmt.limit, offset=stmt.offset or 0,
        )
    raise QueryAnalyzeError(f"unknown resource {stmt.resource}")


def _extract_ids(node: Optional[CriteriaNode]):
    """Pull ``ID = v`` / ``ID IN (...)`` out of property criteria
    (property/v1/rpc.proto id selection)."""
    if node is None:
        return (), None
    if isinstance(node, Condition) and node.tag.lower() == "id":
        if node.op is BinaryOp.EQ:
            return (node.value,), None
        if node.op is BinaryOp.IN:
            return tuple(node.value), None
        raise QueryAnalyzeError("ID supports only = and IN")
    if isinstance(node, Criteria) and node.op is LogicalOp.AND:
        lids, lrest = _extract_ids(node.left)
        rids, rrest = _extract_ids(node.right)
        ids = tuple(lids) + tuple(rids)
        if lrest is None:
            return ids, rrest
        if rrest is None:
            return ids, lrest
        return ids, Criteria(LogicalOp.AND, lrest, rrest)
    return (), node


def execute(
    spark: SparkSession,
    catalog: Catalog,
    text: str,
    now: Optional[dt.datetime] = None,
) -> DataFrame:
    """Parse + transform + compile a BydbQL statement to a DataFrame."""
    from ..plans.measure import compile_measure
    from ..plans.property import compile_property
    from ..plans.stream import compile_stream
    from ..plans.topn import compile_topn
    from ..plans.trace import compile_trace

    stmt = parse(text)
    q = to_query(stmt, catalog, now)
    if isinstance(q, MeasureQuery):
        return compile_measure(spark, catalog, q)
    if isinstance(q, StreamQuery):
        return compile_stream(spark, catalog, q)
    if isinstance(q, TraceQuery):
        return compile_trace(spark, catalog, q)
    if isinstance(q, PropertyQuery):
        return compile_property(spark, catalog, q)
    if isinstance(q, TopNQuery):
        return compile_topn(spark, catalog, q)
    raise QueryAnalyzeError(f"cannot execute {type(q).__name__}")


# the reference tracer caps direct children per span (tracer.go:32
# maxChildSpans = 20); mirror it so a 1000-partition union can't bloat
# the trace payload
_MAX_CHILD_SPANS = 20

def _metric_ms(metric, value: int) -> Optional[float]:
    """Timing SQLMetrics -> milliseconds, by declared metric type
    (SQLMetrics.scala: "timing" accumulates ms, "nsTiming" ns); other
    types (sum/size/average) are not durations."""
    mtype = metric.metricType()
    if mtype == "timing":
        return float(value)
    if mtype == "nsTiming":
        return value * 1e-6
    return None


def _plan_span(jnode, depth: int = 0) -> dict:
    """One executed-plan node -> a reference-shaped span
    (``common/v1/trace.proto`` Span: message, tags, duration, children).
    SQLMetric values are read AFTER execution, so they carry the real
    per-operator numbers (rows scanned, shuffle bytes, per-stage times) —
    the analogue of ``pkg/query/tracer.go`` wiring stage metrics into
    span tags."""
    name = jnode.nodeName()
    cls = jnode.getClass().getSimpleName()
    # AQE wraps the real tree; descend into the final physical plan, and
    # through the per-stage wrappers (Result/Shuffle/BroadcastQueryStage
    # hide their subtree behind .plan(), not .children())
    if cls == "AdaptiveSparkPlanExec":
        inner = _plan_span(jnode.executedPlan(), depth)
        inner["tags"]["adaptive"] = "true"
        return inner
    if "QueryStage" in cls:
        return _plan_span(jnode.plan(), depth)
    tags = {}
    dur = 0.0
    it = jnode.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        key, metric = kv._1(), kv._2()
        val = metric.value()
        ms = _metric_ms(metric, val)
        if ms is not None:
            dur += ms
        tags[key] = val
    children = []
    if depth < 24:
        kids = jnode.children()
        for i in range(min(kids.size(), _MAX_CHILD_SPANS)):
            children.append(_plan_span(kids.apply(i), depth + 1))
    return {"span": name, "duration_ms": dur, "tags": tags,
            "children": children}


def execute_traced(
    spark: SparkSession,
    catalog: Catalog,
    text: str,
    now: Optional[dt.datetime] = None,
):
    """``WITH QUERY_TRACE`` surface — returns (DataFrame, trace spans).

    Mirrors the reference's tracer (``pkg/query/tracer.go``,
    ``common/v1/trace.proto``): front-end stages (parse / transform /
    compile) are flat spans with measured durations, and the ``execute``
    span nests the EXECUTED physical plan as a span tree — one span per
    operator, duration from the operator's timing SQLMetrics and every
    other metric (numOutputRows, shuffle bytes, ...) as span tags. The
    query runs once inside this call (metrics only exist after
    execution) as a DISTRIBUTED count over the executed plan's own RDD —
    rows are counted where they are produced and never buffered on the
    driver (ADVICE r10: the previous ``collect()`` shipped the full
    result to Python just to measure ``len``). The returned DataFrame
    stays usable; collecting it is one further execution, which callers
    that need rows AND trace accept (the reference's traced query also
    materializes once per request, ``processor_topn.go:156-188``).
    """
    import time

    spans = []
    t0 = time.perf_counter()
    stmt = parse(text)
    spans.append({"span": "parse", "duration_ms": (time.perf_counter() - t0) * 1e3})
    t1 = time.perf_counter()
    q = to_query(stmt, catalog, now)
    spans.append({
        "span": "transform",
        "duration_ms": (time.perf_counter() - t1) * 1e3,
        "detail": type(q).__name__,
    })
    t2 = time.perf_counter()
    df = execute(spark, catalog, text, now)
    qe = df._jdf.queryExecution()
    spans.append({
        "span": "compile",
        "duration_ms": (time.perf_counter() - t2) * 1e3,
        "detail": qe.optimizedPlan().toString(),
    })
    t3 = time.perf_counter()
    # drive THIS plan's execution so its SQLMetrics are populated
    # (df.count() would plan and execute a DIFFERENT queryExecution);
    # toRdd() is this queryExecution's own physical RDD, and its count
    # runs distributed — per-partition longs, no driver row buffering
    n_rows = qe.toRdd().count()
    exec_span = {
        "span": "execute",
        "duration_ms": (time.perf_counter() - t3) * 1e3,
        "tags": {"numRows": n_rows},
        "children": [],
    }
    try:
        exec_span["children"] = [_plan_span(qe.executedPlan())]
    except Exception as e:   # metrics introspection must never kill a query
        exec_span["detail"] = (
            f"plan metrics unavailable ({e}); "
            + qe.executedPlan().toString())
    spans.append(exec_span)
    return df, spans
