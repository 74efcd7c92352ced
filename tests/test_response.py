"""Response shaping: DataFrame -> proto-style dicts, matching the shapes of
``measure/v1/query.proto`` DataPoint, ``stream/v1/query.proto`` Element,
``trace/v1/query.proto`` Trace/Span, ``property/v1/rpc.proto`` Property."""

from __future__ import annotations

import pytest

from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.model import (
    BinaryOp,
    MeasureQuery,
    PropertyQuery,
    StreamQuery,
    TimeRange,
    TraceQuery,
    cond,
)
from skywalking_banyandb_spark.plans.measure import compile_measure
from skywalking_banyandb_spark.plans.property import compile_property
from skywalking_banyandb_spark.plans.stream import compile_stream
from skywalking_banyandb_spark.plans.trace import compile_trace
from skywalking_banyandb_spark.response import (
    measure_response,
    property_response,
    stream_response,
    trace_response,
)

from conftest import SF_SMALL

TR = TimeRange.of("2024-01-03T00:00:00", "2024-01-27T00:00:00")


@pytest.fixture(scope="module")
def cat():
    return default_catalog(SF_SMALL)


def test_measure_datapoint_shape(spark, cat):
    q = MeasureQuery(
        groups=["g1"], name="metrics", time_range=TR,
        tag_projection=["user_id", "event_type"],
        field_projection=["value"], limit=5,
    )
    resp = measure_response(compile_measure(spark, cat, q),
                            cat.get("g1", "measure", "metrics"))
    assert len(resp["dataPoints"]) == 5
    dp = resp["dataPoints"][0]
    assert dp["timestamp"].endswith("Z")
    fams = {f["name"]: f["tags"] for f in dp["tagFamilies"]}
    tags = {t["key"]: t["value"] for t in fams["default"]}
    assert "int" in tags["user_id"] and "str" in tags["event_type"]
    assert dp["fields"][0]["name"] == "value"
    assert "float" in dp["fields"][0]["value"]
    # version is shaped when the projection retains it (raw reads drop it
    # after the dedup resolves the winning write)
    assert "version" not in dp or isinstance(dp["version"], int)


def test_measure_agg_response_fields_only_projected(spark, cat):
    from skywalking_banyandb_spark.model import AggFunc, AggregationSpec

    q = MeasureQuery(
        groups=["g1"], name="metrics", time_range=TR,
        group_by=["event_type"],
        agg=AggregationSpec(AggFunc.MAX, "value"), limit=10,
    )
    resp = measure_response(compile_measure(spark, cat, q),
                            cat.get("g1", "measure", "metrics"))
    for dp in resp["dataPoints"]:
        assert "timestamp" not in dp          # aggregated: no point timestamp
        assert dp["fields"][0]["name"] == "value"
        keys = {t["key"] for f in dp["tagFamilies"] for t in f["tags"]}
        assert keys == {"event_type"}


def test_stream_element_shape(spark, cat):
    q = StreamQuery(
        groups=["g1"], name="event_log", time_range=TR,
        criteria=cond("event_type", BinaryOp.EQ, "click"),
        projection=["user_id", "event_type"], limit=3,
    )
    resp = stream_response(compile_stream(spark, cat, q),
                           cat.get("g1", "stream", "event_log"))
    assert len(resp["elements"]) == 3
    el = resp["elements"][0]
    assert el["elementId"] and el["timestamp"].endswith("Z")
    tags = {t["key"]: t["value"]
            for f in el["tagFamilies"] for t in f["tags"]}
    assert tags["event_type"] == {"str": {"value": "click"}}


def test_trace_regrouped_shape(spark, cat):
    q = TraceQuery(
        groups=["g1"], name="event_trace", time_range=TR,
        trace_ids=["1", "2"],
    )
    resp = trace_response(compile_trace(spark, cat, q),
                          cat.get("g1", "trace", "event_trace"))
    assert {t["traceId"] for t in resp["traces"]} <= {"1", "2"}
    for t in resp["traces"]:
        assert t["spans"], "every trace carries its spans"
        s = t["spans"][0]
        assert "spanId" in s and isinstance(s.get("tags"), list)


def test_property_shape(spark, cat):
    q = PropertyQuery(group="g1", name="documents", ids=["1", "2"],
                      projection=["lang", "source"])
    resp = property_response(compile_property(spark, cat, q),
                             cat.get("g1", "property", "documents"))
    assert len(resp["properties"]) == 2
    p = resp["properties"][0]
    assert p["metadata"] == {"group": "g1", "name": "documents"}
    assert p["id"] in {"1", "2"}
    assert {t["key"] for t in p["tags"]} == {"lang", "source"}


def test_topn_response_shapes(spark, cat):
    """TopNResponse shaping, both reference shapes: the aggregated path
    collapses to ONE list of per-entity items (toTopNResponse,
    processor_topn.go:267-282); a result still carrying window_start
    (the engine's per-window no-agg shape) emits one TopNList per
    window with its timestamp (topn_post_processor.go
    valWithoutAggregation timelines). Items = entity tags + value."""
    from skywalking_banyandb_spark.model import AggFunc, Sort, TopNQuery
    from skywalking_banyandb_spark.plans.topn import compile_topn
    from skywalking_banyandb_spark.response import topn_response

    tr = TimeRange.of("2024-01-03T00:00:00", "2024-01-05T00:00:00")
    schema = cat.get("g1", "measure", "metrics")

    agged = compile_topn(spark, cat, TopNQuery(
        groups=["g1"], name="metrics", time_range=tr,
        top_n=3, sort=Sort.DESC, agg=AggFunc.MAX))
    resp = topn_response(agged, schema, "value")
    assert len(resp["lists"]) == 1 and "timestamp" not in resp["lists"][0]
    items = resp["lists"][0]["items"]
    assert 0 < len(items) <= 3
    assert [t["key"] for t in items[0]["entity"]] == ["user_id"]
    assert "float" in items[0]["value"]

    per_window = compile_topn(spark, cat, TopNQuery(
        groups=["g1"], name="metrics", time_range=tr,
        top_n=2, sort=Sort.DESC))
    resp = topn_response(per_window, schema, "value")
    assert len(resp["lists"]) > 1          # one TopNList per window...
    for lst in resp["lists"]:
        assert lst["timestamp"]            # ...stamped with the window
        assert 0 < len(lst["items"]) <= 2  # ranked to the query's N
    # timeline lists arrive in window order (valWithoutAggregation sorts)
    stamps = [lst["timestamp"] for lst in resp["lists"]]
    assert stamps == sorted(stamps)


def test_schema_gate_statuses_and_short_circuit(spark):
    """Replay of the reference's schema gate tables
    (test/cases/schema/query_gate.go + write_gate.go) at the engine
    API level: stale revision -> STATUS_EXPIRED_SCHEMA; ahead ->
    STATUS_SCHEMA_NOT_APPLIED; match -> STATUS_SUCCEED; revision 0 and
    unlisted groups are ungated; a mixed query short-circuits with
    per-group statuses and EMPTY results."""
    import dataclasses

    import pytest as _pytest

    from skywalking_banyandb_spark.catalog import default_catalog
    from skywalking_banyandb_spark.errors import QueryAnalyzeError
    from skywalking_banyandb_spark.model import StreamQuery, TimeRange
    from skywalking_banyandb_spark.plans.stream import compile_stream
    from skywalking_banyandb_spark.response import (
        gated_query_response,
        stream_response,
    )

    cat = default_catalog(SF_SMALL)
    r1 = cat.mod_revision("g1")
    # advance g1 to R2 (re-register = schema update)
    cat.register(cat.get("g1", "stream", "event_log"))
    r2 = cat.mod_revision("g1")
    assert r2 > r1

    # status taxonomy
    assert cat.group_statuses({"g1": r1}) == {
        "g1": "STATUS_EXPIRED_SCHEMA"}
    assert cat.group_statuses({"g1": r2 + 5}) == {
        "g1": "STATUS_SCHEMA_NOT_APPLIED"}
    assert cat.group_statuses({"g1": r2}) == {"g1": "STATUS_SUCCEED"}
    assert cat.group_statuses({"g1": 0}) == {"g1": "STATUS_SUCCEED"}
    assert cat.group_statuses({}) == {}

    # compile path fails fast with the distinguished reasons
    q = StreamQuery(
        groups=["g1"], name="event_log",
        time_range=TimeRange.of("2024-01-01T00:00:00",
                                "2024-02-01T00:00:00"),
        limit=1, group_mod_revisions={"g1": r1})
    with _pytest.raises(QueryAnalyzeError, match="expired schema"):
        compile_stream(spark, cat, q)
    ahead = dataclasses.replace(q, group_mod_revisions={"g1": r2 + 5})
    with _pytest.raises(QueryAnalyzeError, match="not applied"):
        compile_stream(spark, cat, ahead)
    # revision 0 skips the check (write_gate's zero-ModRevision rule)
    zero = dataclasses.replace(q, group_mod_revisions={"g1": 0})
    assert compile_stream(spark, cat, zero).count() == 1

    # mixed-group short-circuit: g1 stale, g2 current -> statuses carry
    # both verdicts, elements are EMPTY, and the query never runs
    ran = []

    def produce():
        ran.append(True)
        schema = cat.get("g1", "stream", "event_log")
        ok = dataclasses.replace(q, group_mod_revisions=None)
        return stream_response(compile_stream(spark, cat, ok), schema)

    resp = gated_query_response(
        cat, {"g1": r1, "g2": cat.mod_revision("g2")}, "elements", produce)
    assert resp["groupStatuses"] == {
        "g1": "STATUS_EXPIRED_SCHEMA", "g2": "STATUS_SUCCEED"}
    assert resp["elements"] == [] and ran == []

    # all-pass: the query executes and statuses ride along
    resp2 = gated_query_response(
        cat, {"g1": r2, "g2": cat.mod_revision("g2")}, "elements", produce)
    assert ran == [True]
    assert resp2["groupStatuses"]["g1"] == "STATUS_SUCCEED"
    assert len(resp2["elements"]) == 1


def test_query_trace_response_shape(spark):
    """WITH QUERY_TRACE end-to-end: execute_traced spans shape into the
    common/v1/trace.proto Trace envelope — nanosecond durations, string
    Tag values, nested children mirroring the executed plan."""
    import datetime as dt

    from skywalking_banyandb_spark.bydbql.transformer import execute_traced
    from skywalking_banyandb_spark.catalog import default_catalog
    from skywalking_banyandb_spark.response import query_trace_response

    cat = default_catalog(SF_SMALL)
    _, spans = execute_traced(
        spark, cat,
        "SELECT event_type, COUNT(value) FROM MEASURE metrics IN g1 "
        "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-27T00:00:00Z' "
        "GROUP BY event_type WITH QUERY_TRACE LIMIT 100",
        dt.datetime(2024, 2, 1),
    )
    env = query_trace_response(spans)
    assert env["traceId"] == "query" and env["error"] is False
    msgs = [s["message"] for s in env["spans"]]
    assert msgs == ["parse", "transform", "compile", "execute"]
    ex = env["spans"][-1]
    assert ex["duration"] > 0 and isinstance(ex["duration"], int)  # nanos

    def flat(s):
        yield s
        for c in s["children"]:
            yield from flat(c)

    tree = list(flat(ex["children"][0]))
    assert any("HashAggregate" in s["message"] for s in tree)
    # proto Tag values are strings
    for s in tree:
        for t in s["tags"]:
            assert isinstance(t["key"], str) and isinstance(t["value"], str)


def test_interleaved_projection_never_reweaves_families():
    """The proto TagProjection is PER-FAMILY: families emit in the order
    of their FIRST occurrence in the projection (the reference echoes
    request family order — stream wants emit `searchable` before `data`),
    and an interleaving projection reorders tags only WITHIN each family,
    never splits a family or weaves two together (ADVICE r11; family
    grouping schema.proto:41-50)."""
    from skywalking_banyandb_spark.catalog import TagSpec
    from skywalking_banyandb_spark.response import _tag_families

    tags = [
        TagSpec("a1", "STRING", family="fam_a"),
        TagSpec("a2", "STRING", family="fam_a"),
        TagSpec("b1", "STRING", family="fam_b"),
        TagSpec("b2", "STRING", family="fam_b"),
    ]
    row = {"a1": "x", "a2": "y", "b1": "p", "b2": "q"}
    # interleaved projection leading with a fam_b tag: fam_b first (its
    # first occurrence precedes fam_a's), each family contiguous, tags
    # within each family in projection order
    fams = _tag_families(tags, row, tag_order=["b2", "a2", "b1", "a1"])
    assert [f["name"] for f in fams] == ["fam_b", "fam_a"]
    assert [t["key"] for t in fams[0]["tags"]] == ["b2", "b1"]
    assert [t["key"] for t in fams[1]["tags"]] == ["a2", "a1"]
    # family entirely outside the projection: declaration order at the end
    fams = _tag_families(tags, row, tag_order=["b1", "b2"])
    assert [f["name"] for f in fams] == ["fam_b", "fam_a"]
    assert [t["key"] for t in fams[1]["tags"]] == ["a1", "a2"]
    # no projection: declaration order throughout
    fams = _tag_families(tags, row)
    assert [f["name"] for f in fams] == ["fam_a", "fam_b"]
    assert [t["key"] for t in fams[0]["tags"]] == ["a1", "a2"]
