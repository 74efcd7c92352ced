"""Response shaping — DataFrame results -> proto-style response dicts.

The reference's query services marshal results into typed responses:

- measure ``QueryResponse.data_points``: DataPoint{timestamp, tag_families
  (grouped by the schema's declared families), fields, version}
  (``measure/v1/query.proto:33-60``);
- stream ``QueryResponse.elements``: Element{element_id, timestamp,
  tag_families} (``stream/v1/query.proto:34-48``);
- trace ``QueryResponse.traces``: Trace{trace_id, spans=[Span{tags, span,
  span_id}]} (``trace/v1/query.proto:31-62``);
- property ``QueryResponse.properties``: Property{group, name, id, tags}
  (``property/v1/rpc.proto``).

Tag values keep the protobuf ``oneof`` flavor as ``{"str": {"value": ...}}``
/ ``{"int": {"value": ...}}`` etc. (``model/v1/common.proto:48-72``), so a
client of the reference's HTTP gateway can consume these dicts unchanged.

Shaping runs driver-side on the *collected* result (responses are bounded by
limit / default 100 — ``measure_analyzer.go:32``), never on the distributed
path; the heavy lifting stays in the DataFrame plan.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Dict, List, Optional, Sequence

from pyspark.sql import DataFrame

from .catalog import (
    MeasureSchema,
    PropertySchema,
    StreamSchema,
    TagSpec,
    TraceSchema,
)


def _ts_rfc3339(value: Optional[dt.datetime]) -> Optional[str]:
    if value is None:
        return None
    return value.isoformat(timespec="milliseconds") + "Z"


def _tag_value(spec_type: str, v: Any) -> Dict[str, Any]:
    """protobuf TagValue oneof (``model/v1/common.proto:48-58``)."""
    if v is None:
        return {"null": None}
    if spec_type == "STRING":
        return {"str": {"value": str(v)}}
    if spec_type == "INT":
        return {"int": {"value": int(v)}}
    if spec_type == "FLOAT":
        return {"float": {"value": float(v)}}
    if spec_type == "STRING_ARRAY":
        return {"strArray": {"value": [str(x) for x in v]}}
    if spec_type == "INT_ARRAY":
        return {"intArray": {"value": [int(x) for x in v]}}
    if spec_type == "DATA_BINARY":
        return {"binaryData": bytes(v)}
    if spec_type == "TIMESTAMP":
        return {"timestamp": _ts_rfc3339(v)}
    return {"str": {"value": str(v)}}


def _field_value(spec_type: str, v: Any) -> Dict[str, Any]:
    """protobuf FieldValue oneof (``model/v1/common.proto:64-72``)."""
    if v is None:
        return {"null": None}
    if spec_type == "INT":
        return {"int": {"value": int(v)}}
    if spec_type == "FLOAT":
        return {"float": {"value": float(v)}}
    if spec_type == "DATA_BINARY":
        return {"binaryData": bytes(v)}
    return {"str": {"value": str(v)}}


def _tag_families(
    tags: Sequence[TagSpec], row: Dict[str, Any],
    tag_order: Optional[Sequence[str]] = None,
) -> List[Dict[str, Any]]:
    """Group present tag columns into the schema's declared families.

    Tags WITHIN a family follow the REQUEST's projection order when given
    (the reference echoes TagProjection order in responses — conformance
    ``want/entity.yaml`` returns ``service_id, layer, name, short_name``
    for exactly that projection order, not the schema's declaration
    order); tags outside ``tag_order`` (and the no-projection case) keep
    declaration order (``model/v1/query.proto:37-40``; family grouping
    ``schema.proto:41-50``). FAMILY emission order follows each family's
    FIRST occurrence in the projection (the proto TagProjection is
    per-family, so the reference echoes families in request order — the
    stream conformance wants emit ``searchable`` before ``data`` for
    exactly that projection order); a projection that interleaves tags
    from different families therefore reorders tags only within each
    family, never splits or re-weaves the families themselves, and
    families outside the projection keep declaration order (ADVICE
    r11)."""
    families: Dict[str, List[TagSpec]] = {}
    order: List[str] = []
    for t in tags:  # declaration order is the base FAMILY sequence
        if t.name not in row:
            continue  # not in the projection
        if t.family not in families:
            families[t.family] = []
            order.append(t.family)
        families[t.family].append(t)
    if tag_order:
        pos = {n: i for i, n in enumerate(tag_order)}
        for fam in families.values():
            fam.sort(key=lambda t: pos.get(t.name, len(pos)))
        # stable: families entirely absent from the projection tie at
        # len(pos) and keep their declaration order
        order.sort(key=lambda f: min(pos.get(t.name, len(pos))
                                     for t in families[f]))
    return [
        {"name": fam, "tags": [
            {"key": t.name, "value": _tag_value(t.type, row[t.name])}
            for t in families[fam]
        ]}
        for fam in order
    ]


def measure_response(
    df: DataFrame, schema: MeasureSchema,
    tag_order: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    """Shape a measure result (``measure/v1/query.proto`` QueryResponse).

    Aggregated results carry field values only for the projected columns;
    raw results include version when present. ``tag_order`` is the
    request's tag projection — tags echo in that order per family.
    """
    points = []
    for r in df.collect():
        row = r.asDict()
        dp: Dict[str, Any] = {}
        if schema.ts_column in row:
            dp["timestamp"] = _ts_rfc3339(row[schema.ts_column])
        dp["tagFamilies"] = _tag_families(schema.tags, row, tag_order)
        fields = []
        for f in schema.fields:
            if f.name in row:
                fields.append(
                    {"name": f.name, "value": _field_value(f.type, row[f.name])}
                )
        dp["fields"] = fields
        if schema.version_column and schema.version_column in row:
            dp["version"] = int(row[schema.version_column])
        points.append(dp)
    return {"dataPoints": points}


def stream_response(
    df: DataFrame, schema: StreamSchema,
    tag_order: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    """Shape a stream result (``stream/v1/query.proto`` QueryResponse)."""
    elements = []
    for r in df.collect():
        row = r.asDict()
        el: Dict[str, Any] = {}
        if schema.element_id_column in row:
            el["elementId"] = str(row[schema.element_id_column])
        if schema.ts_column in row:
            el["timestamp"] = _ts_rfc3339(row[schema.ts_column])
        el["tagFamilies"] = _tag_families(schema.tags, row, tag_order)
        elements.append(el)
    return {"elements": elements}


def trace_response(
    df: DataFrame, schema: TraceSchema,
    tag_order: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    """Shape a trace result: spans grouped per trace id
    (``trace/v1/query.proto:51-62`` Trace message). Accepts either the
    regrouped form (one row per trace with a spans array) or flat span
    rows. ``tag_order`` is the request's tag projection: span tags carry
    ONLY the projected tags, in projection order — the reference's
    no-projection spans have no tags at all (conformance
    ``trace/data/want/all.yml`` spans hold spanId + span payload only),
    and ``having_query_tag`` echoes its projection order. None keeps the
    legacy emit-everything behavior for callers without a request."""
    traces: Dict[str, List[Dict[str, Any]]] = {}
    order: List[str] = []
    # the regrouped plan aliases the id column to the proto's field name
    id_col = schema.trace_id_column
    for r in df.collect():
        row = r.asDict()
        tid = str(row[id_col] if id_col in row else row["trace_id"])
        if tid not in traces:
            traces[tid] = []
            order.append(tid)
        if "spans" in row:  # regrouped: collect_list of span structs
            for s in row["spans"] or []:
                sd = s.asDict() if hasattr(s, "asDict") else dict(s)
                traces[tid].append(_span(sd, schema, tag_order))
        else:
            traces[tid].append(_span(row, schema, tag_order))
    return {
        "traces": [{"traceId": tid, "spans": traces[tid]} for tid in order]
    }


def _span(
    row: Dict[str, Any], schema: TraceSchema,
    tag_order: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    span: Dict[str, Any] = {}
    if schema.span_id_column in row:
        span["spanId"] = str(row[schema.span_id_column])
    specs = list(schema.tags)
    if tag_order is not None:
        by_name = {t.name: t for t in specs}
        specs = [by_name[n] for n in tag_order if n in by_name]
    tags = []
    for t in specs:
        if t.name in row:
            tags.append({"key": t.name, "value": _tag_value(t.type, row[t.name])})
    span["tags"] = tags
    if schema.span_column and schema.span_column in row and row[schema.span_column] is not None:
        v = row[schema.span_column]
        span["span"] = bytes(v) if isinstance(v, (bytes, bytearray)) else str(v).encode()
    return span


def property_response(df: DataFrame, schema: PropertySchema) -> Dict[str, Any]:
    """Shape a property result (``property/v1/rpc.proto`` QueryResponse)."""
    props = []
    for r in df.collect():
        row = r.asDict()
        p: Dict[str, Any] = {
            "metadata": {"group": schema.group, "name": schema.name},
        }
        if schema.id_column in row:
            p["id"] = str(row[schema.id_column])
        tags = []
        for t in schema.tags:
            # the Property id is its own proto field, never repeated in
            # tags (property/v1/rpc.proto; conformance want/all.yaml)
            if t.name == schema.id_column:
                continue
            if t.name in row:
                tags.append(
                    {"key": t.name, "value": _tag_value(t.type, row[t.name])}
                )
        p["tags"] = tags
        props.append(p)
    return {"properties": props}


def topn_response(
    df: DataFrame, schema: MeasureSchema, field: str
) -> Dict[str, Any]:
    """Shape a TopN result (``measure/v1/query.proto`` TopNResponse:
    lists[TopNList{items[Item{entity, value}]}]).

    Mirrors the reference's two shapes: the aggregated path emits ONE
    list of per-entity items (``processor_topn.go:267-282``
    toTopNResponse / ``topn_post_processor.go:320-345``
    valWithoutAggregation collapses to per-timeline lists); when the
    result still carries ``window_start`` (the engine's per-window
    no-agg shape) each window becomes its own TopNList with the window
    timestamp, the ``valWithoutAggregation`` timeline shape. Entity =
    the SOURCE measure's entity tags carried by the ranked rows
    (``topn.go:884-896`` stores entityValues; conformance want items
    carry service_id + entity_id)."""
    fspec = schema.field(field)
    ftype = fspec.type if fspec is not None else "FLOAT"
    ent_specs = [t for e in schema.entity
                 for t in (schema.tag(e),) if t is not None]
    lists: Dict[Any, List[Dict[str, Any]]] = {}
    order: List[Any] = []
    for r in df.collect():
        row = r.asDict()
        win = row.get("window_start")
        if win not in lists:
            lists[win] = []
            order.append(win)
        lists[win].append({
            "entity": [
                {"key": t.name, "value": _tag_value(t.type, row[t.name])}
                for t in ent_specs if t.name in row
            ],
            "value": _field_value(ftype, row.get(field)),
        })
    out = []
    for win in order:
        lst: Dict[str, Any] = {"items": lists[win]}
        if win is not None:
            lst["timestamp"] = _ts_rfc3339(win)
        out.append(lst)
    return {"lists": out}


def gated_statuses(catalog, expected) -> Dict[str, str]:
    """Per-group gate verdicts for the response envelope
    (``QueryResponse.group_statuses``) — see
    ``Catalog.group_statuses`` for the taxonomy."""
    return catalog.group_statuses(expected or {})


def gated_query_response(catalog, expected, result_key: str,
                         produce) -> Dict[str, Any]:
    """The reference's gate-then-query response shape
    (``test/cases/schema/query_gate.go``): evaluate every pinned group's
    status first; when ANY gated group is not SUCCEED the query
    SHORT-CIRCUITS — the response still succeeds transport-wise, carries
    the per-group ``groupStatuses`` map, and the result list is EMPTY
    (no partial answers from a half-consistent schema view). Only when
    every gated group passes is ``produce()`` invoked to run the query
    and shape ``result_key``."""
    statuses = gated_statuses(catalog, expected)
    if any(s != "STATUS_SUCCEED" for s in statuses.values()):
        return {"groupStatuses": statuses, result_key: []}
    out = produce()
    out.setdefault("groupStatuses", statuses)
    return out


def query_trace_response(spans, trace_id: str = "query") -> Dict[str, Any]:
    """Shape ``execute_traced`` spans as the reference's Trace message
    (``common/v1/trace.proto``: Trace{trace_id, spans[Span{message,
    duration (NANOSECONDS — ``pkg/query/tracer.go:252``), tags[Tag{key,
    value:string}], children}]}) — the envelope a ``WITH QUERY_TRACE``
    response carries beside its result."""
    def _span(s: Dict[str, Any]) -> Dict[str, Any]:
        tags = [{"key": k, "value": str(v)}
                for k, v in (s.get("tags") or {}).items()]
        if s.get("detail"):
            tags.append({"key": "detail", "value": str(s["detail"])[:2048]})
        return {
            "message": s["span"],
            "duration": int(round(s.get("duration_ms", 0.0) * 1e6)),
            "error": False,
            "tags": tags,
            "children": [_span(c) for c in s.get("children", ())],
        }

    return {"traceId": trace_id, "spans": [_span(s) for s in spans],
            "error": False}
