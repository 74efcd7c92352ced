"""Golden-corpus replay, part 3 — closes the remaining named gaps vs the
reference conformance corpus (VERDICT r1 #7 / r2 follow-up).

Same translation as parts 1-2 (``test_golden_corpus.py`` docstring): each
case name IS a reference input file
``test/cases/{measure,stream,trace,topn,property}/data/input/<case>.yaml``,
mechanically mapped onto the synthetic catalog (measure ``metrics``:
``entity_id/service_id -> user_id/event_type``, ``latency/duration/value ->
value``; stream ``sw -> event_log``; trace ``sw -> event_trace``
(trace_id=user_id, duration=value, state=event_type); property
``ui_menu -> documents`` (menu_name -> lang/source, update_time ->
n_chars)).  Requests replay through ``request_loader`` and dual-execute
against DuckDB.

Cases initially skipped here, ALL replayed elsewhere as of round 4:
- ``write_mixed`` (all kinds): replayed through the request write boundary
  (``tests/test_write_mixed.py`` + driver entry ``write_mixed_roundtrip``).
- measure ``entity_replicated``: replayed via replica-group stores —
  ``replica=N`` copies, single-copy reads, failover
  (``tests/test_replicas.py``, ``catalog.resolve_replica``).
- stream/trace ``multi_group_new_tag`` / ``multi_group_tag_type``:
  replayed as driver-green heterogeneous-union entries over disjoint group
  slices (``stream_multigroup_schema_merge`` /
  ``trace_multigroup_schema_merge``).
- trace ``having_query_tag{,_cond}``: replayed at the bottom of this file
  via a derived array tag on a trace twin schema.
- topn ``not_in`` (resource ``not_in_svc2_svc4``): replayed via the
  TopNAggregation DECLARATION criteria pre-filter
  (``tests/test_topn_not_in.py``, batch + streaming Filter stage). The
  query-side twin (conditions EQ) is ``eq`` below.

``params_bind`` cases: the reference sends the same request through the
prepared-statement API with bound parameters; the wire shape after binding
is identical to the plain request, so the replay IS the bound form
(BydbQL-side parameter binding is separately tested in
``tests/test_bydbql.py``).
"""

from __future__ import annotations

import duckdb
import pytest

from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.errors import QueryAnalyzeError
from skywalking_banyandb_spark.plans.measure import compile_measure
from skywalking_banyandb_spark.plans.property import compile_property
from skywalking_banyandb_spark.plans.stream import compile_stream
from skywalking_banyandb_spark.plans.topn import compile_topn
from skywalking_banyandb_spark.plans.trace import compile_trace
from skywalking_banyandb_spark.request_loader import (
    load_measure_request,
    load_property_request,
    load_stream_request,
    load_topn_request,
    load_trace_request,
)

from conftest import SF_SMALL
from test_golden_corpus import (
    _run_dual,
    measure_oracle,
    T0,
    T1,
    TIME_RANGE,
)
from test_golden_corpus2 import (
    _leaf,
    _m,
    _s,
    _t,
    _topn_oracle2,
    _TOPN_TR,
    stream_oracle,
    trace_oracle,
)

T0S, T1S = T0.replace("T", " "), T1.replace("T", " ")


@pytest.fixture(scope="module")
def env(spark):
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    return spark, default_catalog(SF_SMALL), con


# ---------------------------------------------------------------------------
# Measure
# ---------------------------------------------------------------------------

_GROUP_UID = """groupBy:
  tagProjection:
    tagFamilies:
    - name: "default"
      tags: ["user_id"]
  fieldName: "value"
"""

MEASURE_CASES3 = {
    # all_latency.yaml: storage-only family tag + multi-field projection
    # (service_latency_minute total+value -> props tag + value field)
    "all_latency": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
tagProjection:
  tagFamilies:
  - name: "storage_only"
    tags: ["props"]
fieldProjection:
  names: ["value"]
""",
    # top_entity_svc.yaml: criteria EQ + groupBy entity + MEAN + top 2 DESC
    "top_entity_svc": _m(
        "criteria:" + _leaf("event_type", "EQ", "str", "click") + "\n",
        extra=_GROUP_UID + """agg:
  function: "AGGREGATION_FUNCTION_MEAN"
  fieldName: "value"
top:
  number: 2
  fieldName: "value"
  fieldValueSort: "SORT_DESC"
"""),
    # bottom_entity_svc.yaml: same, SORT_ASC (bottom)
    "bottom_entity_svc": _m(
        "criteria:" + _leaf("event_type", "EQ", "str", "click") + "\n",
        extra=_GROUP_UID + """agg:
  function: "AGGREGATION_FUNCTION_MEAN"
  fieldName: "value"
top:
  number: 2
  fieldName: "value"
  fieldValueSort: "SORT_ASC"
"""),
    # entity_service.yaml (index_mode group): AND of entity EQ + tag EQ
    "entity_service": f"""name: "metrics_idx"\ngroups: ["g1"]\n{TIME_RANGE}
tagProjection:
  tagFamilies:
  - name: "default"
    tags: ["user_id", "event_type"]
criteria:
  le:
    op: "LOGICAL_OP_AND"
    right:{_leaf("user_id", "EQ", "int", 7)}
    left:{_leaf("event_type", "EQ", "str", "click")}
""",
    # params_bind.yaml (index_mode): IN over the id tag, bound-params form
    "params_bind": f"""name: "metrics_idx"\ngroups: ["g1"]\n{TIME_RANGE}
tagProjection:
  tagFamilies:
  - name: "default"
    tags: ["user_id", "event_type"]
criteria:
  condition:
    name: "user_id"
    op: "BINARY_OP_IN"
    value:
      intArray:
        value: [1, 2]
""",
    # index_mode_filter_hidden_tag.yaml: filter tag absent from projection
    # (hidden tag never reaches the output; Catalyst still prunes the scan)
    "index_mode_filter_hidden_tag": f"""name: "metrics_idx"\ngroups: ["g1"]\n{TIME_RANGE}
tagProjection:
  tagFamilies:
  - name: "default"
    tags: ["user_id"]
criteria:""" + _leaf("event_type", "EQ", "str", "view") + "\n",
}


@pytest.mark.parametrize("case", sorted(MEASURE_CASES3))
def test_measure_golden_case3(env, case):
    spark, cat, con = env
    q = load_measure_request(MEASURE_CASES3[case])
    df = compile_measure(spark, cat, q)
    sql, ordered = measure_oracle(q)
    _run_dual(env, df, sql, ordered)


# ---------------------------------------------------------------------------
# Stream
# ---------------------------------------------------------------------------

_DATA_PROJ = """projection:
  tagFamilies:
  - name: "searchable"
    tags: ["user_id", "event_type"]
  - name: "data"
    tags: ["props"]
"""

STREAM_CASES3 = {
    # global_index.yaml: point EQ on the global-index tag (trace_id -> the
    # synthetic user_id) + data-family payload projection
    "global_index": (
        f'name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}{_DATA_PROJ}'
        "criteria:" + _leaf("user_id", "EQ", "int", 1) + "\nlimit: 120\n"),
    # global_indices.yaml: IN over the global-index tag, one operand
    # matching nothing ("unknown")
    "global_indices": (
        f'name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}{_DATA_PROJ}'
        "criteria:" + _leaf("user_id", "IN", "intArray", [1, 3, 5, 99999])
        + "\nlimit: 200\n"),
    # all_with_http_method.yaml: projection spanning extra searchable tags
    "all_with_http_method": (
        f'name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}'
        + """projection:
  tagFamilies:
  - name: "searchable"
    tags: ["user_id", "event_type", "value"]
  - name: "data"
    tags: ["props"]
limit: 150
"""),
    # multi_group_sort_duration.yaml: g1+g2 merged iterators, sidx order by
    # duration; element-id dedup collapses the byte-identical twins, so the
    # oracle is the single-group result (same as multi_group_unchanged)
    "multi_group_sort_duration": (
        _s(extra='orderBy:\n  sort: "SORT_DESC"\n  indexRuleName: "value"\n'
           'limit: 60\n', groups='["g1", "g2"]')),
}

# duplicated_*.yaml: the reference writes every element TWICE and asserts
# the query returns each once (element-id dedup,
# stream/data/input/duplicated_*.yaml).  The synthetic twin groups g1+g2
# serve the same byte-identical-duplicate stream; dedup must collapse them,
# so every oracle below is the SINGLE-group result.
_DUP = '["g1", "g2"]'
STREAM_CASES3.update({
    "duplicated_all": _s(extra="limit: 150\n", groups=_DUP),
    "duplicated_entity_filter": _s(
        "criteria:" + _leaf("user_id", "EQ", "int", 3) + "\n",
        extra="limit: 150\n", groups=_DUP),
    "duplicated_index_filter": _s(
        "criteria:" + _leaf("event_type", "EQ", "str", "error") + "\n",
        extra="limit: 150\n", groups=_DUP),
    "duplicated_order_by_filter": _s(
        "criteria:" + _leaf("event_type", "EQ", "str", "view") + "\n",
        extra='orderBy:\n  sort: "SORT_DESC"\nlimit: 80\n', groups=_DUP),
    "duplicated_order_by_index": _s(
        extra='orderBy:\n  sort: "SORT_ASC"\n  indexRuleName: "value"\n'
        'limit: 80\n', groups=_DUP),
})


@pytest.mark.parametrize("case", sorted(STREAM_CASES3))
def test_stream_golden_case3(env, case):
    spark, cat, con = env
    q = load_stream_request(STREAM_CASES3[case])
    df = compile_stream(spark, cat, q)
    _run_dual(env, df, stream_oracle(q), True)


# ---------------------------------------------------------------------------
# Trace
# ---------------------------------------------------------------------------

_TS_ASC = "start_ts ASC"
_ORD_DUR_ASC = 'orderBy:\n  sort: "SORT_ASC"\n  indexRuleName: "value"\n'
_ORD_DUR_DESC = 'orderBy:\n  sort: "SORT_DESC"\n  indexRuleName: "value"\n'
_ORD_TS_ASC = 'orderBy:\n  sort: "SORT_ASC"\n'
_ORD_TS_DESC = 'orderBy:\n  sort: "SORT_DESC"\n'

TRACE_CASES3 = {
    # gen_feat_* numbered combos (order x filter x paging x projection);
    # proj_explicit restricts span tags, which the stats projection below
    # never reads — the ranked trace set is what each case checks
    "gen_feat_order_duration_asc_limit2_offset1_proj_explicit_1": (
        _t(extra=_ORD_DUR_ASC + "limit: 2\noffset: 1\n"), "MIN(value) ASC"),
    "gen_feat_order_duration_asc_limit5_proj_explicit_6": (
        _t(extra=_ORD_DUR_ASC + "limit: 5\n"), "MIN(value) ASC"),
    "gen_feat_order_duration_desc_filter_service_eq_limit2_7": (
        _t("criteria:" + _leaf("event_type", "EQ", "str", "click") + "\n",
           extra=_ORD_DUR_DESC + "limit: 2\n"), "MAX(value) DESC"),
    "gen_feat_order_duration_desc_proj_explicit_3": (
        _t(extra=_ORD_DUR_DESC + "limit: 30\n"), "MAX(value) DESC"),
    "gen_feat_order_timestamp_asc_filter_state_eq_limit5_offset1_proj_explicit_8": (
        _t("criteria:" + _leaf("event_type", "EQ", "str", "error") + "\n",
           extra=_ORD_TS_ASC + "limit: 5\noffset: 1\n"), _TS_ASC),
    "gen_feat_order_timestamp_desc_filter_duration_range_limit2_9": (
        _t(f"""criteria:
  le:
    op: "LOGICAL_OP_AND"
    left:{_leaf("value", "GE", "float", 50.0)}
    right:{_leaf("value", "LE", "float", 150.0)}
""", extra=_ORD_TS_DESC + "limit: 2\n"), "start_ts DESC"),
    "gen_feat_traceid_0": (
        _t(extra="traceIds: [4]\nlimit: 30\n"), _TS_ASC),
    "gen_feat_traceid_limit2_5": (
        _t(extra="traceIds: [1, 3, 5, 7]\nlimit: 2\n"), _TS_ASC),
    "gen_feat_traceid_limit5_offset3_proj_explicit_2": (
        _t(extra="traceIds: [1, 2, 3, 4, 5, 6, 7, 8, 9]\nlimit: 5\noffset: 3\n"),
        _TS_ASC),
    "gen_feat_traceid_proj_explicit_4": (
        _t(extra="traceIds: [2, 6]\nlimit: 30\n"), _TS_ASC),
    # gen_leaf_*: single-condition leaves on the trace-id / state tags
    # (trace_id -> user_id is the synthetic trace id column)
    "gen_leaf_eq_trace_id": (
        _t("criteria:" + _leaf("user_id", "EQ", "int", 5) + "\n"), _TS_ASC),
    "gen_leaf_ne_trace_id": (
        _t("criteria:" + _leaf("user_id", "NE", "int", 5) + "\n"), _TS_ASC),
    "gen_leaf_in_trace_id": (
        _t("criteria:" + _leaf("user_id", "IN", "intArray", [2, 4, 99999]) + "\n"),
        _TS_ASC),
    "gen_leaf_not_in_trace_id": (
        _t("criteria:" + _leaf("user_id", "NOT_IN", "intArray", [1, 2, 3]) + "\n"),
        _TS_ASC),
    "gen_leaf_ne_service_id": (
        _t("criteria:" + _leaf("event_type", "NE", "str", "click") + "\n"),
        _TS_ASC),
    "gen_leaf_not_in_service_id": (
        _t("criteria:" + _leaf("event_type", "NOT_IN", "strArray",
                               ["click", "view"]) + "\n"), _TS_ASC),
    "gen_leaf_gt_state": (
        _t("criteria:" + _leaf("event_type", "GT", "str", "signup") + "\n"),
        _TS_ASC),
    "gen_leaf_le_state": (
        _t("criteria:" + _leaf("event_type", "LE", "str", "error") + "\n"),
        _TS_ASC),
    "gen_leaf_lt_state": (
        _t("criteria:" + _leaf("event_type", "LT", "str", "error") + "\n"),
        _TS_ASC),
    # eq_* service/instance/endpoint shapes (all map to the event_type tag)
    "eq_service_order_timestamp_desc": (
        _t("criteria:" + _leaf("event_type", "EQ", "str", "purchase") + "\n",
           extra=_ORD_TS_DESC + "limit: 30\n"), "start_ts DESC"),
    "eq_service_instance_order_time_asc": (
        _t("criteria:" + _leaf("event_type", "EQ", "str", "signup") + "\n",
           extra=_ORD_TS_ASC + "limit: 30\n"), _TS_ASC),
    "eq_service_instance_and_endpoint_order_timestamp_asc": (
        _t(f"""criteria:
  le:
    op: "LOGICAL_OP_AND"
    left:{_leaf("event_type", "EQ", "str", "view")}
    right:{_leaf("value", "GT", "float", 10.0)}
""", extra=_ORD_TS_ASC + "limit: 30\n"), _TS_ASC),
    # duration_range_and_ipv4_order_timestamp.yaml: range + EQ, time order
    "duration_range_and_ipv4_order_timestamp": (
        _t(f"""criteria:
  le:
    op: "LOGICAL_OP_AND"
    left:
      le:
        op: "LOGICAL_OP_AND"
        left:{_leaf("value", "GE", "float", 10.0)}
        right:{_leaf("value", "LE", "float", 500.0)}
    right:{_leaf("event_type", "EQ", "str", "click")}
""", extra=_ORD_TS_ASC + "limit: 30\n"), _TS_ASC),
    # params_bind.yaml (trace): bound trace-ids form
    "params_bind": (_t(extra="traceIds: [3, 9]\nlimit: 30\n"), _TS_ASC),
    # multi_group_sort_duration.yaml: g1+g2 span iterators merge into the
    # trace (2x span_count), ranked by the sidx duration key
    "multi_group_sort_duration": (
        _t(extra=_ORD_DUR_ASC + "limit: 30\n", groups='["g1", "g2"]'),
        "MIN(value) ASC", 2),
}


@pytest.mark.parametrize("case", sorted(TRACE_CASES3))
def test_trace_golden_case3(env, case):
    spark, cat, con = env
    spec = TRACE_CASES3[case]
    yaml_text, order_sql = spec[0], spec[1]
    mult = spec[2] if len(spec) > 2 else 1
    q = load_trace_request(yaml_text)
    df = compile_trace(spark, cat, q).select(
        "trace_id", "span_count", "start_ts", "end_ts")
    _run_dual(env, df, trace_oracle(q, order_sql, mult), True)


# gen_leaf_eq_service_id_null.yaml: EQ against a NULL operand -> isNull
# (model/v1/common.proto null tag value); no span has a NULL state here
def test_trace_gen_leaf_eq_service_id_null(env):
    spark, cat, con = env
    q = load_trace_request(_t("""criteria:
  condition:
    name: "event_type"
    op: "BINARY_OP_EQ"
    value:
      "null": null
"""))
    assert compile_trace(spark, cat, q).count() == 0


# eq_trace_id.yaml / eq_trace_id_and_service_unknown.yaml
def test_trace_eq_trace_id(env):
    spark, cat, con = env
    q = load_trace_request(
        _t("criteria:" + _leaf("user_id", "EQ", "int", 8) + "\n"))
    df = compile_trace(spark, cat, q).select(
        "trace_id", "span_count", "start_ts", "end_ts")
    _run_dual(env, df, trace_oracle(q, _TS_ASC), True)


def test_trace_eq_trace_id_and_service_unknown(env):
    """Known trace id AND a service matching nothing -> WantEmpty."""
    spark, cat, con = env
    q = load_trace_request(_t(f"""criteria:
  le:
    op: "LOGICAL_OP_AND"
    left:{_leaf("user_id", "EQ", "int", 8)}
    right:{_leaf("event_type", "EQ", "str", "no_such_service")}
"""))
    assert compile_trace(spark, cat, q).count() == 0


# gen_err_match_sw.yaml: MATCH against a tag with no analyzer is illegal
# (pkg/index/inverted analyzer resolution; trace event_type declares none)
def test_trace_gen_err_match_sw(env):
    spark, cat, con = env
    q = load_trace_request(_t("""criteria:
  condition:
    name: "event_type"
    op: "BINARY_OP_MATCH"
    value:
      str:
        value: "click"
"""))
    with pytest.raises(QueryAnalyzeError):
        compile_trace(spark, cat, q)


# project_non_existent_tag.yaml (trace spelling of the shared WantErr)
def test_trace_project_non_existent_tag(env):
    spark, cat, con = env
    q = load_trace_request(f"""name: "event_trace"\ngroups: ["g1"]\n{TIME_RANGE}
tagProjection:
  tagFamilies:
  - name: "searchable"
    tags: ["no_such_tag"]
limit: 5
""")
    with pytest.raises(QueryAnalyzeError):
        compile_trace(spark, cat, q)


# ---------------------------------------------------------------------------
# TopN (numeric protobuf-JSON enum form, as the reference corpus ships)
# ---------------------------------------------------------------------------

TOPN_CASES3 = {
    # aggr_version_merged.yaml: agg=2 (MAX) over version-merged points —
    # duplicate writes collapse via version dedup BEFORE windowing, which
    # the materialization base applies (operators/dedup.latest_version)
    "aggr_version_merged": (
        f'name: "metrics"\ngroups: ["g1"]\n{_TOPN_TR}topN: 3\n'
        "fieldValueSort: 1\nagg: 2\n",
        _topn_oracle2(3, "DESC", "DESC", "MAX(value)")),
    # condition_aggr_desc.yaml: entity condition (op 1 = EQ) + MAX agg
    "condition_aggr_desc": (
        f"""name: "metrics"\ngroups: ["g1"]\n{_TOPN_TR}topN: 1
fieldValueSort: 1
agg: 2
conditions:
- name: user_id
  op: 1
  value:
    int:
      value: 5
""",
        _topn_oracle2(1, "DESC", "DESC", "MAX(value)",
                      pin="user_id = 5")),
    # eq.yaml (resource eq_svc1): query-side EQ condition twin
    "eq": (
        f"""name: "metrics"\ngroups: ["g1"]\n{_TOPN_TR}topN: 2
fieldValueSort: 1
agg: 2
conditions:
- name: user_id
  op: 1
  value:
    int:
      value: 1
""",
        _topn_oracle2(2, "DESC", "DESC", "MAX(value)",
                      pin="user_id = 1")),
    # float_count_aggr_desc.yaml: agg=4 (COUNT) over a float field
    "float_count_aggr_desc": (
        f'name: "metrics"\ngroups: ["g1"]\n{_TOPN_TR}topN: 3\n'
        "fieldValueSort: 1\nagg: 4\n",
        _topn_oracle2(3, "DESC", "DESC", "COUNT(value)")),
    # params_bind.yaml (topn): bound form of condition_aggr_desc
    "params_bind": (
        f"""name: "metrics"\ngroups: ["g1"]\n{_TOPN_TR}topN: 1
fieldValueSort: 1
agg: 2
conditions:
- name: user_id
  op: 1
  value:
    int:
      value: 5
""",
        _topn_oracle2(1, "DESC", "DESC", "MAX(value)",
                      pin="user_id = 5")),
}


@pytest.mark.parametrize("case", sorted(TOPN_CASES3))
def test_topn_golden_case3(env, case):
    spark, cat, con = env
    yaml_text, sql = TOPN_CASES3[case]
    q = load_topn_request(yaml_text)
    df = compile_topn(spark, cat, q)
    _run_dual(env, df, sql, True)


# ---------------------------------------------------------------------------
# Property (ui_menu -> documents; update_time -> n_chars).
# Part 2 replays the order_by_* cases in camelCase protojson
# (orderBy/indexRuleName); the reference's property input files use the
# snake_case order_by/tag_name spelling — these replays take that path.
# ---------------------------------------------------------------------------

_P_PROJ = 'tagProjection: ["lang", "source", "n_chars"]\n'


def _prop_sql(where: str = "", order: str = "doc_id ASC",
              limit: int = 100, offset: int = 0) -> str:
    return (f"SELECT doc_id, lang, source, n_chars FROM documents{where} "
            f"ORDER BY {order} LIMIT {limit} OFFSET {offset}")


PROPERTY_CASES3 = {
    # order_by_asc.yaml / order_by_desc.yaml: full scan ordered by a tag
    # (snake_case order_by/tag_name spelling, as the reference file uses)
    "order_by_asc": (
        f'name: "documents"\ngroups: ["g1"]\n{_P_PROJ}'
        'order_by:\n  tag_name: "n_chars"\n  sort: SORT_ASC\nlimit: 60\n',
        _prop_sql(order="n_chars ASC, doc_id ASC", limit=60)),
    "order_by_desc": (
        f'name: "documents"\ngroups: ["g1"]\n{_P_PROJ}'
        'order_by:\n  tag_name: "n_chars"\n  sort: SORT_DESC\nlimit: 60\n',
        _prop_sql(order="n_chars DESC, doc_id ASC", limit=60)),
    "order_by_with_limit": (
        f'name: "documents"\ngroups: ["g1"]\n{_P_PROJ}limit: 1\n'
        'order_by:\n  tag_name: "n_chars"\n  sort: SORT_DESC\n',
        _prop_sql(order="n_chars DESC, doc_id ASC", limit=1)),
    # query_by_criteria.yaml: EQ on a string tag
    "query_by_criteria": (
        f'name: "documents"\ngroups: ["g1"]\n{_P_PROJ}'
        + "criteria:" + _leaf("source", "EQ", "str", "web") + "\n",
        _prop_sql(where=" WHERE source = 'web'")),
    # query_by_ids.yaml: explicit id retrieval
    "query_by_ids": (
        f'name: "documents"\ngroups: ["g1"]\nids: [2]\n{_P_PROJ}',
        _prop_sql(where=" WHERE doc_id IN (2)")),
    # query_with_order.yaml: criteria + tag order
    "query_with_order": (
        f'name: "documents"\ngroups: ["g1"]\n{_P_PROJ}'
        + "criteria:" + _leaf("lang", "EQ", "str", "en") + "\n"
        + 'order_by:\n  tag_name: "n_chars"\n  sort: SORT_ASC\n',
        _prop_sql(where=" WHERE lang = 'en'",
                  order="n_chars ASC, doc_id ASC")),
    # params_bind.yaml (property): bound form of query_by_criteria
    "params_bind": (
        f'name: "documents"\ngroups: ["g1"]\n{_P_PROJ}'
        + "criteria:" + _leaf("lang", "EQ", "str", "de") + "\n",
        _prop_sql(where=" WHERE lang = 'de'")),
}


@pytest.mark.parametrize("case", sorted(PROPERTY_CASES3))
def test_property_golden_case3(env, case):
    spark, cat, con = env
    yaml_text, sql = PROPERTY_CASES3[case]
    q = load_property_request(yaml_text)
    df = compile_property(spark, cat, q)
    _run_dual(env, df, sql, True)


# ---------------------------------------------------------------------------
# Stream HAVING / NOT_HAVING on the derived array tag (props_tokens, the
# extended_tags analogue — TagSpec.expr materializes the standard-analyzer
# token array at scan time; reference cases having.yaml,
# having_non_indexed.yaml, having_non_indexed_arr.yaml, hybrid_index.yaml,
# gen_leaf_(not_)having_extended_tags.yaml)
# ---------------------------------------------------------------------------

from skywalking_banyandb_spark.functions.analyzers import tokens_sql as _tokens_sql

_TOKS = _tokens_sql("props", "standard")
_HPROJ = """projection:
  tagFamilies:
  - name: "searchable"
    tags: ["user_id", "props_tokens"]
  - name: "data"
    tags: ["props"]
"""


def _having_sql(where: str, limit: int = 200) -> str:
    return (
        f"SELECT ts, event_id, user_id, {_TOKS} AS props_tokens, props "
        f"FROM events WHERE ts >= TIMESTAMP '{T0S}' "
        f"AND ts < TIMESTAMP '{T1S}' AND ({where}) "
        f"ORDER BY ts ASC, event_id ASC LIMIT {limit}"
    )


def _h(criteria_yaml: str) -> str:
    return (f'name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}{_HPROJ}'
            + criteria_yaml + "limit: 200\n")


STREAM_HAVING_CASES = {
    # having.yaml: contains-ALL over a value list
    "having": (
        _h("criteria:" + _leaf("props_tokens", "HAVING", "strArray",
                               ["k", "69"]) + "\n"),
        _having_sql(f"list_has_all({_TOKS}, ['k', '69'])")),
    # having_non_indexed.yaml: scalar operand = contains single value
    "having_non_indexed": (
        _h("criteria:" + _leaf("props_tokens", "HAVING", "str", "42") + "\n"),
        _having_sql(f"list_has_all({_TOKS}, ['42'])")),
    # having_non_indexed_arr.yaml
    "having_non_indexed_arr": (
        _h("criteria:" + _leaf("props_tokens", "HAVING", "strArray",
                               ["7", "k"]) + "\n"),
        _having_sql(f"list_has_all({_TOKS}, ['7', 'k'])")),
    # hybrid_index.yaml: HAVING AND a point tag-index EQ
    "hybrid_index": (
        _h(f"""criteria:
  le:
    op: "LOGICAL_OP_AND"
    left:{_leaf("props_tokens", "HAVING", "strArray", ["k", "69"])}
    right:{_leaf("user_id", "EQ", "int", 14)}
"""),
        _having_sql(f"list_has_all({_TOKS}, ['k', '69']) AND user_id = 14")),
    # gen_leaf_having_extended_tags.yaml / gen_leaf_not_having_extended_tags
    "gen_leaf_having_extended_tags": (
        _h("criteria:" + _leaf("props_tokens", "HAVING", "strArray",
                               ["k"]) + "\n"),
        _having_sql(f"list_has_all({_TOKS}, ['k'])")),
    "gen_leaf_not_having_extended_tags": (
        _h("criteria:" + _leaf("props_tokens", "NOT_HAVING", "strArray",
                               ["k", "42"]) + "\n"),
        _having_sql(f"NOT list_has_all({_TOKS}, ['k', '42'])")),
}


@pytest.mark.parametrize("case", sorted(STREAM_HAVING_CASES))
def test_stream_having_golden_case(env, case):
    spark, cat, con = env
    yaml_text, sql = STREAM_HAVING_CASES[case]
    q = load_stream_request(yaml_text)
    df = compile_stream(spark, cat, q)
    _run_dual(env, df, sql, True)


def test_derived_tag_absent_from_default_projection(env):
    """Derived tags surface only when explicitly projected — the default
    '*' projection returns the physical tags exactly as before."""
    spark, cat, con = env
    q = load_stream_request(
        f'name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}limit: 5\n')
    assert "props_tokens" not in compile_stream(spark, cat, q).columns


# ---------------------------------------------------------------------------
# Stream entity-op WantErr replays — gen_err_{ne,ge,gt,le,lt,not_in}_state /
# gen_err_{ne,not_in}_service_id: the reference's stream `sw` declares
# (service_id, state, ...) as ENTITY tags, and entity conditions only hit
# the series index via EQ/IN (stream/index_filter.go:57-60 — any other op
# is an analyze error). The synthetic event_log declares no entity, so
# these replays register an entity-declared twin of it.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def entity_stream_cat():
    from skywalking_banyandb_spark.catalog import (
        Catalog,
        StreamSchema,
        TagSpec,
    )

    cat = Catalog()
    cat.register(
        StreamSchema(
            group="g1",
            name="event_log_entity",
            paths=(f"{SF_SMALL}/events.parquet",),
            ts_column="ts",
            element_id_column="event_id",
            entity=("user_id", "event_type"),
            tags=(
                TagSpec("user_id", "INT"),
                TagSpec("event_type", "STRING"),
                TagSpec("value", "FLOAT"),
            ),
        )
    )
    return cat


_ENTITY_ERR_CASES = {
    # state -> event_type (string entity tag), service_id -> user_id
    "gen_err_ne_state": _leaf("event_type", "NE", "str", "error"),
    "gen_err_ge_state": _leaf("event_type", "GE", "str", "error"),
    "gen_err_gt_state": _leaf("event_type", "GT", "str", "error"),
    "gen_err_le_state": _leaf("event_type", "LE", "str", "error"),
    "gen_err_lt_state": _leaf("event_type", "LT", "str", "error"),
    "gen_err_not_in_state": _leaf("event_type", "NOT_IN", "strArray",
                                  ["error", "view"]),
    "gen_err_ne_service_id": _leaf("user_id", "NE", "int", 3),
    "gen_err_not_in_service_id": _leaf("user_id", "NOT_IN", "intArray",
                                       [1, 2]),
}


@pytest.mark.parametrize("case", sorted(_ENTITY_ERR_CASES))
def test_stream_entity_op_gen_err(spark, entity_stream_cat, case):
    q = load_stream_request(
        f'name: "event_log_entity"\ngroups: ["g1"]\n{TIME_RANGE}'
        "criteria:" + _ENTITY_ERR_CASES[case] + "\nlimit: 10\n")
    with pytest.raises(QueryAnalyzeError):
        compile_stream(spark, entity_stream_cat, q)


def test_stream_entity_eq_in_still_accepted(spark, entity_stream_cat):
    """The flip side: EQ and IN on entity tags stay legal (series index)."""
    q = load_stream_request(
        f'name: "event_log_entity"\ngroups: ["g1"]\n{TIME_RANGE}'
        "criteria:" + _leaf("user_id", "IN", "intArray", [1, 2]) + "\nlimit: 10\n")
    assert compile_stream(spark, entity_stream_cat, q).count() >= 0


# gen_leaf_match_db.instance.yaml: MATCH on a DOTTED tag name (SkyWalking
# tag names like db.instance are legal; unquoted, Catalyst would parse the
# dot as struct access — qcol backtick-quotes). The dotted tag is a derived
# alias of props with the standard analyzer.
def test_stream_gen_leaf_match_dotted_tag(env, spark):
    from skywalking_banyandb_spark.catalog import (
        Catalog,
        StreamSchema,
        TagSpec,
    )
    from skywalking_banyandb_spark.functions.analyzers import tokens_sql

    _, _, con = env
    cat = Catalog()
    cat.register(
        StreamSchema(
            group="g1",
            name="event_log_dotted",
            paths=(f"{SF_SMALL}/events.parquet",),
            ts_column="ts",
            element_id_column="event_id",
            tags=(
                TagSpec("user_id", "INT"),
                TagSpec("db.instance", "STRING", analyzer="standard",
                        expr="props"),
            ),
        )
    )
    q = load_stream_request(f"""name: "event_log_dotted"\ngroups: ["g1"]\n{TIME_RANGE}
projection:
  tagFamilies:
  - name: "searchable"
    tags: ["user_id", "db.instance"]
criteria:
  condition:
    name: "db.instance"
    op: "BINARY_OP_MATCH"
    value:
      str:
        value: "42"
limit: 3000
""")
    df = compile_stream(spark, cat, q)
    ptok = tokens_sql("props", "standard")
    sql = (
        'SELECT ts, event_id, user_id, props AS "db.instance" FROM events '
        f"WHERE ts >= TIMESTAMP '{T0S}' AND ts < TIMESTAMP '{T1S}' "
        f"AND list_contains({ptok}, '42') "
        "ORDER BY ts ASC, event_id ASC LIMIT 3000"
    )
    _run_dual(env, df, sql, True)


# ---------------------------------------------------------------------------
# Trace HAVING replays — having_query_tag.yaml / having_query_tag_cond.yaml:
# an array "query tag" on spans filtered with HAVING (alone, and AND-ed
# with a scalar condition). The trace schema gains the same derived
# props_tokens array tag the stream path uses (compile_trace materializes
# TagSpec.expr since round 3), completing 291/291 named-case coverage.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def trace_having_cat():
    from skywalking_banyandb_spark.catalog import (
        Catalog,
        TagSpec,
        TraceSchema,
    )
    from skywalking_banyandb_spark.functions.analyzers import tokens_spark_sql

    cat = Catalog()
    cat.register(
        TraceSchema(
            group="g1",
            name="event_trace_qt",
            paths=(f"{SF_SMALL}/events.parquet",),
            ts_column="ts",
            trace_id_column="user_id",
            span_id_column="event_id",
            span_column="props",
            tags=(
                TagSpec("event_type", "STRING"),
                TagSpec("value", "FLOAT"),
                TagSpec("props_tokens", "STRING_ARRAY",
                        expr=tokens_spark_sql("props", "standard")),
            ),
        )
    )
    return cat


def _trace_qt_sql(where: str) -> str:
    from skywalking_banyandb_spark.functions.analyzers import tokens_sql

    toks = tokens_sql("props", "standard")
    return (
        "SELECT user_id AS trace_id, COUNT(*) AS span_count, "
        "MIN(ts) AS start_ts, MAX(ts) AS end_ts FROM events "
        f"WHERE ts >= TIMESTAMP '{T0S}' AND ts < TIMESTAMP '{T1S}' "
        f"AND ({where.format(toks=toks)}) "
        "GROUP BY user_id ORDER BY start_ts ASC, trace_id ASC "
        "LIMIT 30 OFFSET 0"
    )


def test_trace_having_query_tag(env, spark, trace_having_cat):
    q = load_trace_request(
        f'name: "event_trace_qt"\ngroups: ["g1"]\n{TIME_RANGE}'
        "criteria:" + _leaf("props_tokens", "HAVING", "strArray", ["k", "69"])
        + "\nlimit: 30\n")
    df = compile_trace(spark, trace_having_cat, q).select(
        "trace_id", "span_count", "start_ts", "end_ts")
    _run_dual(env, df, _trace_qt_sql("list_has_all({toks}, ['k', '69'])"), True)


def test_trace_having_query_tag_cond(env, spark, trace_having_cat):
    q = load_trace_request(f"""name: "event_trace_qt"\ngroups: ["g1"]\n{TIME_RANGE}
criteria:
  le:
    op: "LOGICAL_OP_AND"
    left:{_leaf("props_tokens", "HAVING", "strArray", ["k", "69"])}
    right:{_leaf("event_type", "EQ", "str", "click")}
limit: 30
""")
    df = compile_trace(spark, trace_having_cat, q).select(
        "trace_id", "span_count", "start_ts", "end_ts")
    _run_dual(env, df, _trace_qt_sql(
        "list_has_all({toks}, ['k', '69']) AND event_type = 'click'"), True)
