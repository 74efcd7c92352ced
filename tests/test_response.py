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
