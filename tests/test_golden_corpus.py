"""Golden-corpus replay: reference QueryRequest YAMLs -> request loader ->
plan compiler -> dual execution vs a DuckDB twin.

Each case mechanically mirrors one input of the reference conformance corpus
(``test/cases/{measure,stream,trace,topn,property}/data/input/<case>.yaml``
— the case name here IS the reference file name), translated to the
synthetic catalog: ``sw_metric -> g1``, ``service_cpm_minute -> metrics``,
tag ``id -> user_id`` (entity, INT), ``entity_id -> event_type`` (STRING),
field ``value``; stream ``sw -> event_log``; trace ``sw -> event_trace``.
The YAML *shape* (field names, enum spellings, criteria nesting) is the
reference's protobuf-JSON form, parsed by ``request_loader`` — so this
suite exercises the request boundary AND the compiler semantics per case.

Verify semantics follow ``test/cases/measure/measure.go:36-43``:
``want`` (dual-execute, ordered or DisOrder), ``WantEmpty`` (0 rows),
``WantErr`` (analyze-time error).
"""

from __future__ import annotations

import duckdb
import pytest

from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.errors import QueryAnalyzeError
from skywalking_banyandb_spark.model import AggFunc, BinaryOp, Sort
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

T0, T1 = "2024-01-03T00:00:00", "2024-01-27T00:00:00"
TIME_RANGE = f"""
timeRange:
  begin: "{T0}Z"
  end: "{T1}Z"
"""

SUM6 = "CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE)"
AGG_SQL = {
    AggFunc.MIN: "MIN(value)",
    AggFunc.MAX: "MAX(value)",
    AggFunc.SUM: SUM6,
    AggFunc.COUNT: "COUNT(value)",
    AggFunc.MEAN: f"{SUM6} / COUNT(value)",
}


@pytest.fixture(scope="module")
def env(spark):
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    return spark, default_catalog(SF_SMALL), con


def _crit_sql(node) -> str:
    from test_fuzz_criteria import _to_sql

    return _to_sql(node)


def _dd(q) -> str:
    b = str(q.time_range.begin) if q.time_range.begin else "1970-01-01"
    e = str(q.time_range.end) if q.time_range.end else "2100-01-01"
    return (
        "(SELECT ts, user_id, event_type, props, value FROM ("
        "SELECT *, row_number() OVER (PARTITION BY user_id, ts "
        "ORDER BY event_id DESC) AS rn FROM events "
        f"WHERE ts >= TIMESTAMP '{b}' AND ts < TIMESTAMP '{e}') WHERE rn = 1)"
    )


def measure_oracle(q) -> tuple[str, bool]:
    """Generic DuckDB twin of compile_measure for golden replay.
    Returns (sql, ordered_compare)."""
    where = f" WHERE {_crit_sql(q.criteria)}" if q.criteria is not None else ""
    limit = q.limit if q.limit is not None else 100
    page = f" LIMIT {limit} OFFSET {q.offset}"
    if q.agg is not None or q.group_by:
        gb = list(q.group_by)
        # projected tags beyond the group keys carry the group's FIRST
        # point's values (measure_plan_aggregation.go:286-288; wants
        # bottom_entity_svc / float_agg_min) — unique ts makes arg_min
        # by ts the deterministic twin of the engine's min_by(ts, version)
        extras = [f"arg_min({t}, ts) AS {t}"
                  for t in q.tag_projection if t not in q.group_by]
        if q.agg is not None:
            parts = gb + extras + [f"{AGG_SQL[q.agg.function]} AS value"]
            inner = (f"SELECT {', '.join(parts)} FROM {_dd(q)}{where}"
                     + (f" GROUP BY {', '.join(gb)}" if gb else ""))
        elif extras:
            inner = (f"SELECT {', '.join(gb + extras)} FROM {_dd(q)}{where} "
                     f"GROUP BY {', '.join(gb)}")
        else:
            inner = f"SELECT DISTINCT {', '.join(gb)} FROM {_dd(q)}{where}"
        if q.top is not None:
            d = "DESC" if q.top.sort is Sort.DESC else "ASC"
            tie = "".join(f", {g} ASC" for g in gb)
            return (
                f"SELECT * FROM ({inner} ORDER BY value {d}{tie} "
                f"LIMIT {q.top.number}){page}",
                True,
            )
        if q.order_by is not None and q.order_by.tag is not None:
            d = "DESC" if q.order_by.sort is Sort.DESC else "ASC"
            tie = "".join(
                f", {g} ASC" for g in gb if g != q.order_by.tag)
            return (
                f"{inner} ORDER BY {q.order_by.tag} {d}{tie}{page}", True)
        return f"SELECT * FROM ({inner}){page}", False

    proj = list(q.tag_projection) + list(q.field_projection)
    if not proj:
        proj = ["user_id", "event_type", "props", "value"]
    if q.top is not None and q.top.field_name not in proj:
        proj.append(q.top.field_name)
    cols = ["ts"] + [c for c in proj if c != "ts"]
    sel = f"SELECT {', '.join(cols)} FROM {_dd(q)}{where}"
    if q.top is not None:
        key, d = q.top.field_name, ("DESC" if q.top.sort is Sort.DESC else "ASC")
        tie = "".join(f", {t} ASC" for t in ("ts", "user_id") if t != key)
        return (
            f"SELECT * FROM ({sel} ORDER BY {key} {d}{tie} "
            f"LIMIT {q.top.number}){page}",
            True,
        )
    order = q.order_by
    key = "ts" if (order is None or order.tag is None) else order.tag
    d = "DESC" if (order is not None and order.sort is Sort.DESC) else "ASC"
    tie = "".join(f", {t} ASC" for t in ("ts", "user_id") if t != key)
    return f"{sel} ORDER BY {key} {d}{tie}{page}", True


def _run_dual(env, df, sql, ordered):
    spark, cat, con = env
    cols = sorted(df.columns)
    sp = [tuple(r[c] for c in cols) for r in df.collect()]
    du = [tuple(r[c] for c in cols)
          for r in con.execute(sql).fetch_arrow_table().to_pylist()]
    if not ordered:
        key = lambda row: tuple((v is None, str(v)) for v in row)
        sp, du = sorted(sp, key=key), sorted(du, key=key)
    assert sp == du, f"sql={sql}\nspark={sp[:5]}\nduck={du[:5]}"
    return sp


# ---------------------------------------------------------------------------
# Measure cases (test/cases/measure/data/input/<name>.yaml)
# ---------------------------------------------------------------------------

_M_PROJ = """
tagProjection:
  tagFamilies:
  - name: "default"
    tags: ["user_id", "event_type"]
fieldProjection:
  names: ["value"]
"""

MEASURE_CASES = {
    # all.yaml: full scan, default projection/order/limit
    "all": f'name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}',
    # all_only_fields.yaml: field projection only
    "all_only_fields": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
fieldProjection:
  names: ["value"]
""",
    # all_max_limit.yaml: explicit huge limit
    "all_max_limit": f'name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}limit: 100000\n',
    # limit.yaml / offset.yaml: pagination
    "limit": f'name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}limit: 7\n',
    "offset": f'name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}limit: 7\noffset: 11\n',
    # order_asc/order_desc.yaml: time order
    "order_asc": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}
orderBy:
  sort: "SORT_ASC"
""",
    "order_desc": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}
orderBy:
  sort: "SORT_DESC"
""",
    # order_tag_asc/order_tag_desc.yaml: indexed-tag order
    "order_tag_asc": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}
orderBy:
  sort: "SORT_ASC"
  indexRuleName: "user_id"
""",
    "order_tag_desc": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}
orderBy:
  sort: "SORT_DESC"
  indexRuleName: "user_id"
""",
    # entity.yaml: entity-tag EQ (enum by NAME)
    "entity": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}
criteria:
  condition:
    name: "user_id"
    op: "BINARY_OP_EQ"
    value:
      int:
        value: 3
""",
    # entity_in.yaml: entity IN set (enum by NUMBER, like topn inputs)
    "entity_in": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}
criteria:
  condition:
    name: "user_id"
    op: 9
    value:
      intArray:
        value: [1, 4, 7]
""",
    # in_set.yaml / not_in_set.yaml on a string tag
    "in_set": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}
criteria:
  condition:
    name: "event_type"
    op: "BINARY_OP_IN"
    value:
      strArray:
        value: ["click", "error"]
""",
    "not_in_set": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}
criteria:
  condition:
    name: "event_type"
    op: "BINARY_OP_NOT_IN"
    value:
      strArray:
        value: ["click", "error"]
""",
    # lt / gt / le / ge / ne leaves (gen_leaf_*.yaml)
    "gen_leaf_lt_int": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}
criteria:
  condition:
    name: "user_id"
    op: "BINARY_OP_LT"
    value:
      int:
        value: 5
""",
    "gen_leaf_ge_int": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}
criteria:
  condition:
    name: "user_id"
    op: "BINARY_OP_GE"
    value:
      int:
        value: 140
""",
    "gen_leaf_ne_str": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}
criteria:
  condition:
    name: "event_type"
    op: "BINARY_OP_NE"
    value:
      str:
        value: "click"
""",
    # complex_and_or.yaml: nested le tree (OR of (AND, leaf))
    "complex_and_or": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}{_M_PROJ}
criteria:
  le:
    op: "LOGICAL_OP_OR"
    left:
      le:
        op: "LOGICAL_OP_AND"
        left:
          condition:
            name: "user_id"
            op: "BINARY_OP_EQ"
            value:
              int:
                value: 1
        right:
          condition:
            name: "event_type"
            op: "BINARY_OP_EQ"
            value:
              str:
                value: "click"
    right:
      condition:
        name: "event_type"
        op: "BINARY_OP_EQ"
        value:
          str:
            value: "error"
""",
    # group.yaml / group_max.yaml family: group-by + each agg function
    "group_max": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
groupBy:
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
    "group_min": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
groupBy:
  tagProjection:
    tagFamilies:
    - name: "default"
      tags: ["event_type"]
  fieldName: "value"
agg:
  function: "AGGREGATION_FUNCTION_MIN"
  fieldName: "value"
limit: 1000
""",
    "group_sum": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
groupBy:
  tagProjection:
    tagFamilies:
    - name: "default"
      tags: ["event_type"]
  fieldName: "value"
agg:
  function: "AGGREGATION_FUNCTION_SUM"
  fieldName: "value"
limit: 1000
""",
    "group_count": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
groupBy:
  tagProjection:
    tagFamilies:
    - name: "default"
      tags: ["event_type"]
  fieldName: "value"
agg:
  function: 4
  fieldName: "value"
limit: 1000
""",
    "group_mean": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
groupBy:
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
    # group_by_multiple_tags (gen_feat_mean_group_2.yaml)
    "gen_feat_mean_group_2": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
groupBy:
  tagProjection:
    tagFamilies:
    - name: "default"
      tags: ["user_id", "event_type"]
  fieldName: "value"
agg:
  function: "AGGREGATION_FUNCTION_MEAN"
  fieldName: "value"
limit: 100000
""",
    # group_without_agg.yaml: distinct group rows
    "group_without_agg": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
groupBy:
  tagProjection:
    tagFamilies:
    - name: "default"
      tags: ["event_type"]
  fieldName: "value"
limit: 1000
""",
    # gen_feat_max_group_order_desc_6.yaml: group + order by group tag
    "gen_feat_max_group_order_desc_6": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
groupBy:
  tagProjection:
    tagFamilies:
    - name: "default"
      tags: ["user_id"]
  fieldName: "value"
agg:
  function: "AGGREGATION_FUNCTION_MAX"
  fieldName: "value"
orderBy:
  sort: "SORT_DESC"
  indexRuleName: "user_id"
limit: 100000
""",
    "gen_feat_mean_group_order_asc_5": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
groupBy:
  tagProjection:
    tagFamilies:
    - name: "default"
      tags: ["user_id"]
  fieldName: "value"
agg:
  function: "AGGREGATION_FUNCTION_MEAN"
  fieldName: "value"
orderBy:
  sort: "SORT_ASC"
  indexRuleName: "user_id"
limit: 100000
""",
    # top.yaml / bottom.yaml: query-time top-n over grouped agg
    "top": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
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
    "bottom": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
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
  number: 3
  fieldName: "value"
  fieldValueSort: "SORT_ASC"
limit: 1000
""",
    # float_top_sum.yaml / float_top_count.yaml
    "float_top_sum": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
groupBy:
  tagProjection:
    tagFamilies:
    - name: "default"
      tags: ["event_type"]
  fieldName: "value"
agg:
  function: "AGGREGATION_FUNCTION_SUM"
  fieldName: "value"
top:
  number: 3
  fieldName: "value"
  fieldValueSort: "SORT_DESC"
limit: 1000
""",
    "float_top_count": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
groupBy:
  tagProjection:
    tagFamilies:
    - name: "default"
      tags: ["event_type"]
  fieldName: "value"
agg:
  function: "AGGREGATION_FUNCTION_COUNT"
  fieldName: "value"
top:
  number: 2
  fieldName: "value"
  fieldValueSort: "SORT_DESC"
limit: 1000
""",
    # agg without group (float_agg_min.yaml)
    "float_agg_min": f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
agg:
  function: "AGGREGATION_FUNCTION_MIN"
  fieldName: "value"
limit: 10
""",
}


@pytest.mark.parametrize("case", sorted(MEASURE_CASES))
def test_measure_golden_case(env, case):
    spark, cat, con = env
    q = load_measure_request(MEASURE_CASES[case])
    sql, ordered = measure_oracle(q)
    df = compile_measure(spark, cat, q)
    _run_dual(env, df, sql, ordered)


# WantEmpty (empty_result.yaml): matching criteria but empty time range
def test_measure_empty_result(env):
    spark, cat, con = env
    q = load_measure_request(
        """name: "metrics"\ngroups: ["g1"]
timeRange:
  begin: "2030-01-01T00:00:00Z"
  end: "2030-01-02T00:00:00Z"
"""
    )
    assert compile_measure(spark, cat, q).count() == 0


# WantErr cases
def test_measure_err_filter_non_existent_tag(env):
    spark, cat, con = env
    q = load_measure_request(
        f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
criteria:
  condition:
    name: "no_such_tag"
    op: "BINARY_OP_EQ"
    value:
      str:
        value: "x"
"""
    )
    with pytest.raises(QueryAnalyzeError):
        compile_measure(spark, cat, q)


def test_measure_err_invalid_le(env):
    """err_invalid_le.yaml: logical expression with a missing operand."""
    spark, cat, con = env
    q = load_measure_request(
        f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
criteria:
  le:
    op: "LOGICAL_OP_AND"
    left:
      condition:
        name: "event_type"
        op: "BINARY_OP_EQ"
        value:
          str:
            value: "click"
"""
    )
    with pytest.raises(QueryAnalyzeError):
        compile_measure(spark, cat, q)


def test_measure_err_in_scalar(env):
    """gen_err_in_scalar.yaml: IN with a scalar operand."""
    spark, cat, con = env
    q = load_measure_request(
        f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
criteria:
  condition:
    name: "event_type"
    op: "BINARY_OP_IN"
    value:
      str:
        value: "click"
"""
    )
    with pytest.raises(QueryAnalyzeError):
        compile_measure(spark, cat, q)


def test_measure_err_unknown_field_in_request(env):
    """protojson rejects unknown fields — so does the loader."""
    with pytest.raises(QueryAnalyzeError, match="unknown field"):
        load_measure_request('name: "metrics"\ngroups: ["g1"]\nbogus: 1\n')


def test_measure_err_unknown_enum(env):
    with pytest.raises(QueryAnalyzeError, match="invalid"):
        load_measure_request(
            f"""name: "metrics"\ngroups: ["g1"]\n{TIME_RANGE}
criteria:
  condition:
    name: "event_type"
    op: "BINARY_OP_LIKE"
    value:
      str:
        value: "x"
"""
        )


# ---------------------------------------------------------------------------
# Stream cases (test/cases/stream/data/input/<name>.yaml)
# ---------------------------------------------------------------------------

_S_PROJ = """
projection:
  tagFamilies:
  - name: "searchable"
    tags: ["user_id", "event_type", "value"]
"""

STREAM_CASES = {
    "all": f'name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}{_S_PROJ}limit: 120\n',
    "all_max_limit": f'name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}{_S_PROJ}limit: 4294967295\n',
    "filter": f"""name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}{_S_PROJ}
criteria:
  condition:
    name: "event_type"
    op: "BINARY_OP_EQ"
    value:
      str:
        value: "error"
limit: 300
""",
    "filter_and_or": f"""name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}{_S_PROJ}
criteria:
  le:
    op: "LOGICAL_OP_AND"
    left:
      le:
        op: "LOGICAL_OP_OR"
        left:
          condition:
            name: "event_type"
            op: "BINARY_OP_EQ"
            value:
              str:
                value: "click"
        right:
          condition:
            name: "event_type"
            op: "BINARY_OP_EQ"
            value:
              str:
                value: "view"
    right:
      condition:
        name: "user_id"
        op: "BINARY_OP_LE"
        value:
          int:
            value: 60
limit: 400
""",
    "sort_desc": f"""name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}{_S_PROJ}
orderBy:
  sort: "SORT_DESC"
  indexRuleName: "value"
limit: 50
""",
    "sort_asc": f"""name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}{_S_PROJ}
orderBy:
  sort: "SORT_ASC"
  indexRuleName: "user_id"
limit: 50
""",
    "offset": f'name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}{_S_PROJ}limit: 25\noffset: 40\n',
}


@pytest.mark.parametrize("case", sorted(STREAM_CASES))
def test_stream_golden_case(env, case):
    spark, cat, con = env
    q = load_stream_request(STREAM_CASES[case])
    df = compile_stream(spark, cat, q)

    where = f" AND ({_crit_sql(q.criteria)})" if q.criteria is not None else ""
    order = q.order_by
    key = "ts" if (order is None or order.tag is None) else order.tag
    d = "DESC" if (order is not None and order.sort is Sort.DESC) else "ASC"
    limit = q.limit if q.limit is not None else 100
    sql = (
        "SELECT ts, event_id, user_id, event_type, value FROM events "
        f"WHERE ts >= TIMESTAMP '{T0.replace('T', ' ')}' "
        f"AND ts < TIMESTAMP '{T1.replace('T', ' ')}'{where} "
        f"ORDER BY {key} {d}, event_id ASC LIMIT {limit} OFFSET {q.offset}"
    )
    _run_dual(env, df, sql, True)


# ---------------------------------------------------------------------------
# Trace cases (test/cases/trace/data/input/<name>.yaml)
# ---------------------------------------------------------------------------

TRACE_CASES = {
    "all": (f'name: "event_trace"\ngroups: ["g1"]\n{TIME_RANGE}limit: 30\n',
            "start_ts ASC"),
    "order_desc": (
        f"""name: "event_trace"\ngroups: ["g1"]\n{TIME_RANGE}
orderBy:
  sort: "SORT_DESC"
limit: 30
""",
        "start_ts DESC",
    ),
    "order_duration_desc": (
        f"""name: "event_trace"\ngroups: ["g1"]\n{TIME_RANGE}
orderBy:
  sort: "SORT_DESC"
  indexRuleName: "value"
limit: 30
""",
        "MAX(value) DESC",
    ),
    "filter": (
        f"""name: "event_trace"\ngroups: ["g1"]\n{TIME_RANGE}
criteria:
  condition:
    name: "event_type"
    op: "BINARY_OP_EQ"
    value:
      str:
        value: "purchase"
limit: 30
""",
        "start_ts ASC",
    ),
    "paging": (
        f'name: "event_trace"\ngroups: ["g1"]\n{TIME_RANGE}limit: 10\noffset: 15\n',
        "start_ts ASC",
    ),
}


@pytest.mark.parametrize("case", sorted(TRACE_CASES))
def test_trace_golden_case(env, case):
    spark, cat, con = env
    yaml_text, order_sql = TRACE_CASES[case]
    q = load_trace_request(yaml_text)
    df = compile_trace(spark, cat, q).select(
        "trace_id", "span_count", "start_ts", "end_ts")
    where = f" AND ({_crit_sql(q.criteria)})" if q.criteria is not None else ""
    sql = (
        "SELECT user_id AS trace_id, COUNT(*) AS span_count, "
        "MIN(ts) AS start_ts, MAX(ts) AS end_ts FROM events "
        f"WHERE ts >= TIMESTAMP '{T0.replace('T', ' ')}' "
        f"AND ts < TIMESTAMP '{T1.replace('T', ' ')}'{where} "
        f"GROUP BY user_id ORDER BY {order_sql}, trace_id ASC "
        f"LIMIT {q.limit} OFFSET {q.offset}"
    )
    _run_dual(env, df, sql, True)


def test_trace_by_ids(env):
    """trace_by_ids golden shape: traceIds retrieval, no criteria."""
    spark, cat, con = env
    q = load_trace_request(
        f'name: "event_trace"\ngroups: ["g1"]\n{TIME_RANGE}traceIds: [3, 7]\nlimit: 10\n'
    )
    df = compile_trace(spark, cat, q).select("trace_id", "span_count")
    got = {(r.trace_id, r.span_count) for r in df.collect()}
    want = {
        tuple(r) for r in con.execute(
            "SELECT user_id, COUNT(*) FROM events "
            f"WHERE ts >= TIMESTAMP '{T0.replace('T', ' ')}' "
            f"AND ts < TIMESTAMP '{T1.replace('T', ' ')}' "
            "AND user_id IN (3, 7) GROUP BY user_id").fetchall()
    }
    assert got == want


# ---------------------------------------------------------------------------
# TopN cases (test/cases/topn/data/input/*.yaml — numeric enum form)
# ---------------------------------------------------------------------------

_TOPN_TR = """
timeRange:
  begin: "2024-01-03T00:00:00Z"
  end: "2024-01-08T00:00:00Z"
"""

# query-time conditions EQ-pin the group BEFORE the top-N truncation
# (topn_plan_localscan.go parseGroupByTags), so {pin} sits inside the
# ranked CTE, not after it.
_TOPN_SQL_BASE = """
WITH latest AS (
  SELECT date_trunc('hour', ts) AS window_start, user_id, value FROM events
  QUALIFY row_number() OVER (
    PARTITION BY date_trunc('hour', ts), user_id
    ORDER BY ts DESC, event_id DESC) = 1
), ranked AS (
  SELECT window_start, user_id, value FROM latest{pin}
  QUALIFY row_number() OVER (
    PARTITION BY window_start ORDER BY value {rankdir}, user_id) <= {n}
)
"""


def _topn_oracle(n, rankdir, aggdir, agg, pin=""):
    return (
        _TOPN_SQL_BASE.format(
            rankdir=rankdir, n=n, pin=f" WHERE {pin}" if pin else "")
        + f"""SELECT user_id, {agg}(value) AS value FROM ranked
        WHERE window_start >= TIMESTAMP '2024-01-03 00:00:00'
          AND window_start <  TIMESTAMP '2024-01-08 00:00:00'
        GROUP BY user_id ORDER BY value {aggdir}, user_id LIMIT {n}"""
    )


def test_topn_golden_top_max(env):
    """top.yaml: topN=3, fieldValueSort=1 (DESC), agg=2 (MAX) — the
    numeric-enum form the reference's topn inputs use."""
    spark, cat, con = env
    q = load_topn_request(
        f'name: "metrics"\ngroups: ["g1"]\n{_TOPN_TR}topN: 3\nfieldValueSort: 1\nagg: 2\n'
    )
    assert q.sort is Sort.DESC and q.agg is AggFunc.MAX
    df = compile_topn(spark, cat, q)
    _run_dual(env, df, _topn_oracle(3, "DESC", "DESC", "MAX"), True)


def test_topn_golden_bottom(env):
    """bottom.yaml: fieldValueSort=2 (ASC) keeps the smallest."""
    spark, cat, con = env
    q = load_topn_request(
        f'name: "metrics"\ngroups: ["g1"]\n{_TOPN_TR}topN: 3\nfieldValueSort: 2\nagg: 3\n'
    )
    assert q.sort is Sort.ASC and q.agg is AggFunc.MIN
    df = compile_topn(spark, cat, q)
    _run_dual(env, df, _topn_oracle(3, "ASC", "ASC", "MIN"), True)


def test_topn_golden_condition(env):
    """condition.yaml: entity EQ condition (numeric op form)."""
    spark, cat, con = env
    q = load_topn_request(
        f"""name: "metrics"\ngroups: ["g1"]\n{_TOPN_TR}topN: 3
fieldValueSort: 1
agg: 2
conditions:
- name: user_id
  op: 1
  value:
    int:
      value: 114
"""
    )
    df = compile_topn(spark, cat, q)
    _run_dual(
        env, df,
        _topn_oracle(3, "DESC", "DESC", "MAX", pin="user_id = 114"),
        True,
    )


def test_topn_golden_condition_non_eq_errs(env):
    """Entity conditions support EQ only (topn_plan_localscan.go:137)."""
    spark, cat, con = env
    q = load_topn_request(
        f"""name: "metrics"\ngroups: ["g1"]\n{_TOPN_TR}topN: 3
fieldValueSort: 1
agg: 2
conditions:
- name: user_id
  op: 6
  value:
    int:
      value: 3
"""
    )
    with pytest.raises(QueryAnalyzeError):
        compile_topn(spark, cat, q)


# ---------------------------------------------------------------------------
# Property cases (test/cases/property/data/input/*.yaml)
# ---------------------------------------------------------------------------

def test_property_golden_filter_sort(env):
    spark, cat, con = env
    q = load_property_request(
        """name: "documents"
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
    )
    df = compile_property(spark, cat, q)
    sql = ("SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en' "
           "ORDER BY doc_id ASC LIMIT 40 OFFSET 5")
    _run_dual(env, df, sql, True)


def test_property_golden_ids(env):
    """ids.yaml: retrieval by explicit ids."""
    spark, cat, con = env
    q = load_property_request(
        'name: "documents"\ngroups: ["g1"]\nids: [1, 2, 3]\ntagProjection: ["lang"]\n'
    )
    df = compile_property(spark, cat, q)
    sql = ("SELECT doc_id, lang FROM documents WHERE doc_id IN (1, 2, 3) "
           "ORDER BY doc_id ASC LIMIT 100")
    _run_dual(env, df, sql, True)


def test_trace_projection_restricts_span_tags(env):
    """tagProjection limits per-span tags in the regrouped payload
    (trace/v1/query.proto tag_projection)."""
    spark, cat, con = env
    q = load_trace_request(
        f"""name: "event_trace"\ngroups: ["g1"]\n{TIME_RANGE}
tagProjection:
  tagFamilies:
  - name: "searchable"
    tags: ["event_type"]
limit: 5
"""
    )
    df = compile_trace(spark, cat, q)
    span_fields = [f.name for f in df.schema["spans"].dataType.elementType.fields]
    assert span_fields == ["ts", "event_id", "event_type", "props"], span_fields


def test_trace_projection_unknown_tag_errs(env):
    spark, cat, con = env
    q = load_trace_request(
        f"""name: "event_trace"\ngroups: ["g1"]\n{TIME_RANGE}
tagProjection:
  tagFamilies:
  - name: "searchable"
    tags: ["nope"]
limit: 5
"""
    )
    with pytest.raises(QueryAnalyzeError):
        compile_trace(spark, cat, q)
