"""Front-end differential: the SAME golden case expressed as the reference's
YAML QueryRequest (protojson boundary) AND as its paired ``.ql`` BydbQL text
must produce identical results.

The reference corpus ships both forms per case
(``test/cases/measure/data/input/<case>.yaml`` + ``<case>.ql``, loaded by
``test/cases/measure/measure.go`` / ``pkg/bydbql``); equality of the two
paths is exactly what its conformance suite asserts. Here both forms compile
through this engine (request_loader -> plans vs bydbql parse -> transform ->
plans), so any divergence between the two front ends surfaces as a row diff.
"""

from __future__ import annotations

import datetime as dt

import pytest

from skywalking_banyandb_spark.bydbql.transformer import execute
from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.plans.measure import compile_measure
from skywalking_banyandb_spark.plans.property import compile_property
from skywalking_banyandb_spark.plans.stream import compile_stream
from skywalking_banyandb_spark.plans.trace import compile_trace
from skywalking_banyandb_spark.request_loader import (
    load_measure_request,
    load_property_request,
    load_stream_request,
    load_topn_request,
    load_trace_request,
)

from conftest import SF_SMALL
from test_golden_corpus import _M_PROJ, _S_PROJ, TIME_RANGE
from test_golden_corpus2 import _leaf

_NOW = dt.datetime(2024, 2, 1)
_TB = ("TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-27T00:00:00Z'")


@pytest.fixture(scope="module")
def cat():
    return default_catalog(SF_SMALL)


def _rows(df, cols):
    return sorted(
        tuple((v is None, str(v)) for v in (r[c] for c in cols))
        for r in df.collect()
    )


def _assert_same(yaml_df, ql_df):
    common = sorted(set(yaml_df.columns) & set(ql_df.columns))
    assert common, (yaml_df.columns, ql_df.columns)
    a, b = _rows(yaml_df, common), _rows(ql_df, common)
    assert a == b, f"cols={common}\nyaml={a[:4]}\nql={b[:4]}"


# (case, yaml request, ql text) — measure
MEASURE_PAIRS = {
    "all": (
        f'name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}',
        f"SELECT user_id, event_type, value FROM MEASURE metrics IN g1 {_TB}",
    ),
    "entity": (
        f'name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}'
        "criteria:" + _leaf("user_id", "EQ", "int", 3),
        f"SELECT user_id, event_type, value FROM MEASURE metrics IN g1 {_TB} "
        "WHERE user_id = 3",
    ),
    "entity_in": (
        f'name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}'
        "criteria:" + _leaf("user_id", "IN", "intArray", [1, 4, 7]),
        f"SELECT user_id, event_type, value FROM MEASURE metrics IN g1 {_TB} "
        "WHERE user_id IN (1, 4, 7)",
    ),
    "not_in_set": (
        f'name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}'
        "criteria:" + _leaf("event_type", "NOT_IN", "strArray", ["click", "error"]),
        f"SELECT user_id, event_type, value FROM MEASURE metrics IN g1 {_TB} "
        "WHERE event_type NOT IN ('click', 'error')",
    ),
    "complex_and_or": (
        f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}criteria:
  le:
    op: "LOGICAL_OP_OR"
    left:
      le:
        op: "LOGICAL_OP_AND"
        left:{_leaf("user_id", "EQ", "int", 1)}
        right:{_leaf("event_type", "EQ", "str", "click")}
    right:{_leaf("event_type", "EQ", "str", "error")}
""",
        f"SELECT user_id, event_type, value FROM MEASURE metrics IN g1 {_TB} "
        "WHERE (user_id = 1 AND event_type = 'click') OR event_type = 'error'",
    ),
    "group_max": (
        f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}groupBy:
  tagProjection:
    tagFamilies:
    - name: "default"
      tags: ["event_type"]
  fieldName: "value"
agg:
  function: "AGGREGATION_FUNCTION_MAX"
  fieldName: "value"
limit: 1000
""",
        f"SELECT event_type, MAX(value) FROM MEASURE metrics IN g1 {_TB} "
        "GROUP BY event_type LIMIT 1000",
    ),
    "group_mean": (
        f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}groupBy:
  tagProjection:
    tagFamilies:
    - name: "default"
      tags: ["event_type"]
  fieldName: "value"
agg:
  function: "AGGREGATION_FUNCTION_MEAN"
  fieldName: "value"
limit: 1000
""",
        f"SELECT event_type, MEAN(value) FROM MEASURE metrics IN g1 {_TB} "
        "GROUP BY event_type LIMIT 1000",
    ),
    "order_tag_desc": (
        f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}orderBy:
  sort: "SORT_DESC"
  indexRuleName: "user_id"
""",
        f"SELECT user_id, event_type, value FROM MEASURE metrics IN g1 {_TB} "
        "ORDER BY user_id DESC",
    ),
    "limit_offset": (
        f'name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}limit: 7\noffset: 11\n',
        f"SELECT user_id, event_type, value FROM MEASURE metrics IN g1 {_TB} "
        "LIMIT 7 OFFSET 11",
    ),
    "top": (
        f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}groupBy:
  tagProjection:
    tagFamilies:
    - name: "default"
      tags: ["user_id"]
  fieldName: "value"
agg:
  function: "AGGREGATION_FUNCTION_MEAN"
  fieldName: "value"
top:
  number: 2
  fieldName: "value"
  fieldValueSort: "SORT_DESC"
limit: 1000
""",
        f"SELECT TOP 2 value DESC, user_id, MEAN(value) "
        f"FROM MEASURE metrics IN g1 {_TB} GROUP BY user_id LIMIT 1000",
    ),
}


@pytest.mark.parametrize("case", sorted(MEASURE_PAIRS))
def test_measure_yaml_ql_agree(spark, cat, case):
    yaml_text, ql = MEASURE_PAIRS[case]
    ydf = compile_measure(spark, cat, load_measure_request(yaml_text))
    qdf = execute(spark, cat, ql, _NOW)
    _assert_same(ydf, qdf)


STREAM_PAIRS = {
    "filter": (
        f'name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}{_S_PROJ}'
        "criteria:" + _leaf("event_type", "EQ", "str", "error") + "\nlimit: 300\n",
        f"SELECT user_id, event_type, value FROM STREAM event_log IN g1 {_TB} "
        "WHERE event_type = 'error' LIMIT 300",
    ),
    "sort_desc": (
        f"""name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}{_S_PROJ}orderBy:
  sort: "SORT_DESC"
  indexRuleName: "value"
limit: 50
""",
        f"SELECT user_id, event_type, value FROM STREAM event_log IN g1 {_TB} "
        "ORDER BY value DESC LIMIT 50",
    ),
    "offset": (
        f'name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}{_S_PROJ}limit: 25\noffset: 40\n',
        f"SELECT user_id, event_type, value FROM STREAM event_log IN g1 {_TB} "
        "LIMIT 25 OFFSET 40",
    ),
}


@pytest.mark.parametrize("case", sorted(STREAM_PAIRS))
def test_stream_yaml_ql_agree(spark, cat, case):
    yaml_text, ql = STREAM_PAIRS[case]
    ydf = compile_stream(spark, cat, load_stream_request(yaml_text))
    qdf = execute(spark, cat, ql, _NOW)
    _assert_same(ydf, qdf)


TRACE_PAIRS = {
    "all": (
        f'name: "event_trace"\ngroups: ["g1"]\n{TIME_RANGE}limit: 30\n',
        f"SELECT () FROM TRACE event_trace IN g1 {_TB} LIMIT 30",
    ),
    "order_duration_desc": (
        f"""name: "event_trace"\ngroups: ["g1"]\n{TIME_RANGE}orderBy:
  sort: "SORT_DESC"
  indexRuleName: "value"
limit: 30
""",
        f"SELECT () FROM TRACE event_trace IN g1 {_TB} "
        "ORDER BY value DESC LIMIT 30",
    ),
    "filter": (
        f'name: "event_trace"\ngroups: ["g1"]\n{TIME_RANGE}'
        "criteria:" + _leaf("event_type", "EQ", "str", "purchase") + "\nlimit: 30\n",
        f"SELECT () FROM TRACE event_trace IN g1 {_TB} "
        "WHERE event_type = 'purchase' LIMIT 30",
    ),
}


@pytest.mark.parametrize("case", sorted(TRACE_PAIRS))
def test_trace_yaml_ql_agree(spark, cat, case):
    yaml_text, ql = TRACE_PAIRS[case]
    ydf = compile_trace(spark, cat, load_trace_request(yaml_text)).select(
        "trace_id", "span_count", "start_ts", "end_ts")
    qdf = execute(spark, cat, ql, _NOW)
    _assert_same(ydf, qdf)


def test_property_yaml_ql_agree(spark, cat):
    yaml_text = """name: "documents"
groups: ["g1"]
criteria:
  condition:
    name: "lang"
    op: "BINARY_OP_EQ"
    value:
      str:
        value: "en"
tagProjection: ["lang", "n_chars"]
limit: 40
offset: 5
"""
    ql = ("SELECT lang, n_chars FROM PROPERTY documents IN g1 "
          "WHERE lang = 'en' LIMIT 40 OFFSET 5")
    ydf = compile_property(spark, cat, load_property_request(yaml_text))
    qdf = execute(spark, cat, ql, _NOW)
    _assert_same(ydf, qdf)


# Additional parser-path pairs: SHOW TOP vs TopNRequest, remaining agg
# functions, float comparisons, trace criteria trees.

def test_show_top_vs_topn_yaml(spark, cat):
    """SHOW TOP (dquery.go SHOW TOP -> TopNRequest) must equal the
    protojson TopNRequest form."""
    from skywalking_banyandb_spark.plans.topn import compile_topn

    yaml_text = """name: "metrics"
groups: ["g1"]
timeRange:
  begin: "2024-01-03T00:00:00Z"
  end: "2024-01-08T00:00:00Z"
topN: 5
fieldValueSort: 1
agg: 5
"""
    ql = ("SHOW TOP 5 FROM MEASURE metrics IN g1 "
          "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-08T00:00:00Z' "
          "AGGREGATE BY SUM ORDER BY DESC")
    ydf = compile_topn(spark, cat, load_topn_request(yaml_text))
    qdf = execute(spark, cat, ql, _NOW)
    _assert_same(ydf, qdf)


GROUP_AGG_PAIRS = {
    "group_min": ("AGGREGATION_FUNCTION_MIN", "MIN"),
    "group_sum": ("AGGREGATION_FUNCTION_SUM", "SUM"),
    "group_count": ("AGGREGATION_FUNCTION_COUNT", "COUNT"),
}


@pytest.mark.parametrize("case", sorted(GROUP_AGG_PAIRS))
def test_group_agg_yaml_ql_agree(spark, cat, case):
    enum_name, fn = GROUP_AGG_PAIRS[case]
    yaml_text = f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}groupBy:
  tagProjection:
    tagFamilies:
    - name: "default"
      tags: ["user_id"]
  fieldName: "value"
agg:
  function: "{enum_name}"
  fieldName: "value"
limit: 1000
"""
    ql = (f"SELECT user_id, {fn}(value) FROM MEASURE metrics IN g1 {_TB} "
          "GROUP BY user_id LIMIT 1000")
    ydf = compile_measure(spark, cat, load_measure_request(yaml_text))
    qdf = execute(spark, cat, ql, _NOW)
    _assert_same(ydf, qdf)


def test_measure_float_compare_yaml_ql_agree(spark, cat):
    yaml_text = (
        f'name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}'
        "criteria:" + _leaf("value", "GE", "float", 200.5) + "\nlimit: 5000\n")
    ql = (f"SELECT user_id, event_type, value FROM MEASURE metrics IN g1 {_TB} "
          "WHERE value >= 200.5 LIMIT 5000")
    ydf = compile_measure(spark, cat, load_measure_request(yaml_text))
    qdf = execute(spark, cat, ql, _NOW)
    _assert_same(ydf, qdf)


def test_trace_and_tree_yaml_ql_agree(spark, cat):
    yaml_text = (
        f'name: "event_trace"\ngroups: ["g1"]\n{TIME_RANGE}'
        + f"""criteria:
  le:
    op: "LOGICAL_OP_AND"
    left:{_leaf("event_type", "EQ", "str", "click")}
    right:{_leaf("value", "GE", "float", 50.0)}
"""
        + "limit: 30\n")
    ql = (f"SELECT () FROM TRACE event_trace IN g1 {_TB} "
          "WHERE event_type = 'click' AND value >= 50.0 LIMIT 30")
    ydf = compile_trace(spark, cat, load_trace_request(yaml_text)).select(
        "trace_id", "span_count", "start_ts", "end_ts")
    qdf = execute(spark, cat, ql, _NOW)
    _assert_same(ydf, qdf)


# --- round-3 pairs: HAVING on the derived array tag, top/bottom entity,
# --- trace ids / duration paging (the part-3 golden shapes in both forms)

R3_STREAM_PAIRS = {
    "having_derived": (
        f"""name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}projection:
  tagFamilies:
  - name: "searchable"
    tags: ["user_id", "props_tokens"]
criteria:
  le:
    op: "LOGICAL_OP_AND"
    left:{_leaf("props_tokens", "HAVING", "strArray", ["k", "69"])}
    right:{_leaf("user_id", "EQ", "int", 14)}
limit: 200
""",
        f"SELECT user_id, props_tokens FROM STREAM event_log IN g1 {_TB} "
        "WHERE props_tokens HAVING ('k', '69') AND user_id = 14 LIMIT 200",
    ),
    "not_having_derived": (
        f"""name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}projection:
  tagFamilies:
  - name: "searchable"
    tags: ["user_id", "props_tokens"]
criteria:""" + _leaf("props_tokens", "NOT_HAVING", "strArray", ["42"]) + "\nlimit: 100\n",
        f"SELECT user_id, props_tokens FROM STREAM event_log IN g1 {_TB} "
        "WHERE props_tokens NOT HAVING ('42') LIMIT 100",
    ),
}


@pytest.mark.parametrize("case", sorted(R3_STREAM_PAIRS))
def test_r3_stream_yaml_ql_agree(spark, cat, case):
    yaml_text, ql = R3_STREAM_PAIRS[case]
    ydf = compile_stream(spark, cat, load_stream_request(yaml_text))
    qdf = execute(spark, cat, ql, _NOW)
    _assert_same(ydf, qdf)


R3_MEASURE_PAIRS = {
    "top_entity_svc": (
        f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}criteria:{_leaf("event_type", "EQ", "str", "click")}
groupBy:
  tagProjection:
    tagFamilies:
    - name: "default"
      tags: ["user_id"]
  fieldName: "value"
agg:
  function: "AGGREGATION_FUNCTION_MEAN"
  fieldName: "value"
top:
  number: 2
  fieldName: "value"
  fieldValueSort: "SORT_DESC"
limit: 1000
""",
        f"SELECT TOP 2 value DESC, user_id, MEAN(value) FROM MEASURE metrics "
        f"IN g1 {_TB} WHERE event_type = 'click' GROUP BY user_id LIMIT 1000",
    ),
    "bottom_entity_svc": (
        f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}criteria:{_leaf("event_type", "EQ", "str", "click")}
groupBy:
  tagProjection:
    tagFamilies:
    - name: "default"
      tags: ["user_id"]
  fieldName: "value"
agg:
  function: "AGGREGATION_FUNCTION_MEAN"
  fieldName: "value"
top:
  number: 2
  fieldName: "value"
  fieldValueSort: "SORT_ASC"
limit: 1000
""",
        f"SELECT TOP 2 value ASC, user_id, MEAN(value) FROM MEASURE metrics "
        f"IN g1 {_TB} WHERE event_type = 'click' GROUP BY user_id LIMIT 1000",
    ),
}


@pytest.mark.parametrize("case", sorted(R3_MEASURE_PAIRS))
def test_r3_measure_yaml_ql_agree(spark, cat, case):
    yaml_text, ql = R3_MEASURE_PAIRS[case]
    ydf = compile_measure(spark, cat, load_measure_request(yaml_text))
    qdf = execute(spark, cat, ql, _NOW)
    _assert_same(ydf, qdf)


R3_TRACE_PAIRS = {
    # traceIds retrieval == criteria on the trace-id tag (both forms rank
    # identically); the QL side uses the WHERE form
    "trace_ids_vs_where": (
        f'name: "event_trace"\ngroups: ["g1"]\n{TIME_RANGE}traceIds: [1, 3, 5]\nlimit: 30\n',
        f"SELECT () FROM TRACE event_trace IN g1 {_TB} "
        "WHERE user_id IN (1, 3, 5) LIMIT 30",
    ),
    "order_duration_asc_offset": (
        f"""name: "event_trace"\ngroups: ["g1"]\n{TIME_RANGE}orderBy:
  sort: "SORT_ASC"
  indexRuleName: "value"
limit: 2
offset: 1
""",
        f"SELECT () FROM TRACE event_trace IN g1 {_TB} "
        "ORDER BY value ASC LIMIT 2 OFFSET 1",
    ),
}


@pytest.mark.parametrize("case", sorted(R3_TRACE_PAIRS))
def test_r3_trace_yaml_ql_agree(spark, cat, case):
    yaml_text, ql = R3_TRACE_PAIRS[case]
    ydf = compile_trace(spark, cat, load_trace_request(yaml_text)).select(
        "trace_id", "span_count", "start_ts", "end_ts")
    qdf = execute(spark, cat, ql, _NOW)
    _assert_same(ydf, qdf)
