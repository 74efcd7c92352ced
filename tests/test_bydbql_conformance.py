"""BydbQL conformance parity suite (VERDICT r7 #2) — a table-by-table
mirror of the reference's de-facto language spec,
``pkg/bydbql/bydbql_test.go`` (3 872 LoC, 224 cases). Every Describe
block of the reference maps to a section here (same order, reference
line anchors in each section comment); COVERAGE.md carries the parity
table. Parse-level classes assert on the repo AST; transformer classes
run ``to_query``/``execute`` against the synthetic catalog.

Dialect divergences (documented, asserted as OUR behavior):
* double-quoted tokens are IDENTIFIERS (quoted column names, the
  documented Core Rule), never string literals — the reference marks
  double-quoted strings "if supported" and accepts rejection;
* escaped quote inside a string is ``''`` (SQL form), not ``\\'`` — the
  reference test uses Go-escaping that reaches the parser as ``\\``;
* a lone ``HAVING 'x'`` (no parens) is accepted like the reference's
  complex-query table requires.
"""

from __future__ import annotations

import datetime as dt

import pytest

from skywalking_banyandb_spark.bydbql.parser import (
    BydbQLSyntaxError,
    SelectStmt,
    ShowTopStmt,
    parse,
)
from skywalking_banyandb_spark.bydbql.transformer import (
    resolve_time,
    to_query,
)
from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.errors import QueryAnalyzeError
from skywalking_banyandb_spark.model import (
    BinaryOp,
    Condition,
    Criteria,
    LogicalOp,
    Sort,
)

from conftest import SF_SMALL

NOW = dt.datetime(2024, 2, 1)


def _cond(node):
    assert isinstance(node, Condition), node
    return node


# ---------------------------------------------------------------------------
# §1 Parser / valid queries — FROM forms, groups, stages
# (bydbql_test.go:39-377)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ql,groups,stages", [
    ("SELECT * FROM STREAM sw IN (default)", ("default",), ()),
    ("SELECT * FROM STREAM sw IN default", ("default",), ()),
    ("SELECT * FROM STREAM sw IN default, updated", ("default", "updated"), ()),
    ("SELECT * FROM STREAM sw IN (g1, g2, g3)", ("g1", "g2", "g3"), ()),
    ("SELECT * FROM MEASURE m IN g ON hot STAGES", ("g",), ("hot",)),
    ("SELECT * FROM MEASURE m IN g ON warm, cold STAGES", ("g",),
     ("warm", "cold")),
    ("SELECT * FROM MEASURE m IN g ON (warm, cold) STAGES", ("g",),
     ("warm", "cold")),
    ("SELECT * FROM TRACE t IN g ON hot, warm STAGES TIME > '-1h'", ("g",),
     ("hot", "warm")),
    ("SHOW TOP 3 FROM MEASURE m IN g1, g2", ("g1", "g2"), ()),
    ("SHOW TOP 3 FROM MEASURE m IN g ON cold STAGES", ("g",), ("cold",)),
    # group-name charset: hyphens, underscores, mixed case, numbers
    ("SELECT * FROM STREAM sw IN my-group-1", ("my-group-1",), ()),
    ("SELECT * FROM STREAM sw IN my_group_2", ("my_group_2",), ()),
    ("SELECT * FROM STREAM sw IN MyGroup", ("MyGroup",), ()),
    ("SELECT * FROM STREAM sw IN group123", ("group123",), ()),
])
def test_from_clause_forms(ql, groups, stages):
    s = parse(ql)
    assert s.groups == groups and s.stages == stages


@pytest.mark.parametrize("ql", [
    "SELECT * FROM STREAM sw IN ()",       # empty group list
    "SELECT * FROM STREAM sw IN group1,",  # trailing comma
])
def test_malformed_group_lists_rejected(ql):
    with pytest.raises(BydbQLSyntaxError):
        parse(ql)


# ---------------------------------------------------------------------------
# §2 WHERE precedence — AND binds tighter than OR, parens override
# (bydbql_test.go:378-548)
# ---------------------------------------------------------------------------

def test_and_binds_tighter_than_or():
    s = parse("SELECT * FROM STREAM sw IN g WHERE a = 1 OR b = 2 AND c = 3")
    # OR(a, AND(b, c))
    assert isinstance(s.where, Criteria) and s.where.op is LogicalOp.OR
    assert _cond(s.where.left).tag == "a"
    assert s.where.right.op is LogicalOp.AND


def test_parens_override_precedence():
    s = parse("SELECT * FROM STREAM sw IN g WHERE (a = 1 OR b = 2) AND c = 3")
    assert s.where.op is LogicalOp.AND
    assert s.where.left.op is LogicalOp.OR
    assert _cond(s.where.right).tag == "c"


def test_nested_parens_and_multiple_ands():
    s = parse("SELECT * FROM STREAM sw IN g "
              "WHERE ((a = 1 OR b = 2) AND (c = 3 OR d = 4)) OR e = 5")
    assert s.where.op is LogicalOp.OR
    assert s.where.left.op is LogicalOp.AND
    s = parse("SELECT * FROM STREAM sw IN g WHERE a = 1 AND b = 2 AND c = 3")
    # left-assoc AND chain
    assert s.where.op is LogicalOp.AND and s.where.left.op is LogicalOp.AND


# ---------------------------------------------------------------------------
# §3 MATCH forms (bydbql_test.go:549-786)
# ---------------------------------------------------------------------------

# default operator is OR (model/v1/query.proto MatchOption: unspecified
# operator executes as OR — the parser normalizes it eagerly)
@pytest.mark.parametrize("ql,values,analyzer,operator", [
    ("SELECT * FROM STREAM sw IN g WHERE m MATCH('error')",
     ["error"], None, LogicalOp.OR),
    ("SELECT * FROM STREAM sw IN g WHERE m MATCH('error', 'standard')",
     ["error"], "standard", LogicalOp.OR),
    ("SELECT * FROM STREAM sw IN g WHERE m MATCH('error', 'simple', 'AND')",
     ["error"], "simple", LogicalOp.AND),
    ("SELECT * FROM STREAM sw IN g WHERE m MATCH(('a', 'b'))",
     ["a", "b"], None, LogicalOp.OR),
    ("SELECT * FROM STREAM sw IN g WHERE m MATCH(('a', 'b'), 'keyword', 'OR')",
     ["a", "b"], "keyword", LogicalOp.OR),
    ("SELECT * FROM STREAM sw IN g WHERE m MATCH(('a', 'b'), 'OR')",
     ["a", "b"], None, LogicalOp.OR),
    # dotted identifier (documentation example)
    ("SELECT * FROM STREAM sw IN g WHERE db.instance MATCH('mysql')",
     ["mysql"], None, LogicalOp.OR),
])
def test_match_forms(ql, values, analyzer, operator):
    c = _cond(parse(ql).where)
    assert c.op is BinaryOp.MATCH and c.value == values
    assert c.match_analyzer == analyzer and c.match_operator is operator


def test_match_in_grouped_logical_expression():
    s = parse("SELECT * FROM STREAM sw IN g "
              "WHERE (m MATCH('error') OR level = 'fatal') AND svc = 'api'")
    assert s.where.op is LogicalOp.AND
    assert _cond(s.where.left.left).op is BinaryOp.MATCH


@pytest.mark.parametrize("ql", [
    "SELECT * FROM STREAM sw IN g WHERE m MATCH('e', 's', 'OR', 'extra')",
    "SELECT * FROM STREAM sw IN g WHERE m MATCH()",
    "SELECT * FROM STREAM sw IN g WHERE m MATCH",
])
def test_match_arity_rejected(ql):
    with pytest.raises(BydbQLSyntaxError):
        parse(ql)


# ---------------------------------------------------------------------------
# §4 Complex Queries — the reference's 18-query smoke table, verbatim
# shapes (bydbql_test.go:796-916)
# ---------------------------------------------------------------------------

COMPLEX = [
    "SELECT trace_id, service_id, start_time FROM STREAM sw IN "
    "(default, updated) WHERE service_id = 'webapp' AND state = 1 "
    "ORDER BY start_time DESC LIMIT 100",
    "SELECT region, SUM(latency) FROM MEASURE service_cpm IN "
    "(us-west, us-east) TIME BETWEEN '-2h' AND 'now' "
    "WHERE service = 'auth-service' GROUP BY region",
    "SELECT () FROM TRACE sw_trace IN default TIME > '-1h' "
    "WHERE status = 'error' WITH QUERY_TRACE LIMIT 50",
    "SELECT ip, region, owner FROM PROPERTY server_metadata IN "
    "(datacenter-1, datacenter-2) WHERE datacenter = 'dc-101' LIMIT 50",
    "SHOW TOP 5 FROM MEASURE service_errors IN (production, staging) "
    "TIME BETWEEN '-24h' AND 'now' WHERE status_code = '500' ORDER BY DESC",
    "SELECT * FROM STREAM sw IN default WHERE service_id = 'api' "
    "ORDER BY timestamp ASC LIMIT 50 OFFSET 100",
    "SELECT * FROM STREAM sw IN default TIME > '-1h' "
    "WHERE status IN (200, 201, 204)",
    "SELECT * FROM STREAM logs IN default "
    "WHERE level NOT IN ('DEBUG', 'TRACE') LIMIT 1000",
    "SELECT * FROM STREAM sw IN default WHERE tags HAVING ('error', 'critical')",
    "SELECT * FROM STREAM sw IN default WHERE tags HAVING 'error'",
    "SELECT * FROM STREAM sw IN default WHERE tags NOT HAVING ('test', 'debug')",
    "SELECT region, SUM(latency) FROM MEASURE metrics IN default "
    "GROUP BY region ORDER BY region ASC",
    "SELECT service, region, environment, SUM(requests) FROM MEASURE "
    "service_metrics IN default TIME BETWEEN '-1h' AND 'now' "
    "GROUP BY service, region, environment",
    "SELECT trace_id, service_id, duration FROM STREAM sw IN (prod, staging) "
    "TIME BETWEEN '2024-01-01T00:00:00Z' AND '2024-01-02T00:00:00Z' "
    "WHERE service_id = 'api-gateway' AND status >= 200 AND status < 300 "
    "ORDER BY duration DESC WITH QUERY_TRACE LIMIT 100 OFFSET 50",
    "SELECT * FROM STREAM sw IN default WHERE ((service = 'auth' OR "
    "service = 'api') AND status != 500) OR (service = 'web' AND "
    "(latency > 1000 OR error_count > 5))",
    "SHOW TOP 10 FROM MEASURE service_metrics IN default TIME > '-30m' "
    "WHERE region = 'us-west' AND environment = 'production' ORDER BY DESC",
    "SELECT metadata.service_id, metadata.region, response.status "
    "FROM STREAM sw IN default WHERE metadata.region = 'us-east'",
    "SELECT * FROM MEASURE metrics IN default TIME >= '2024-01-01T12:00:00Z' "
    "WHERE latency >= 100 AND latency <= 1000",
]


@pytest.mark.parametrize("i", range(len(COMPLEX)))
def test_complex_query_parses(i):
    assert parse(COMPLEX[i]) is not None


# ---------------------------------------------------------------------------
# §5 Error Handling — the reference's 44-row invalid-query table, verbatim
# (bydbql_test.go:917-976) + empty-group/malformed-group rows (:357-377)
# + star-initial identifier (:3847)
# ---------------------------------------------------------------------------

INVALID = [
    "SELECT",
    "SELECT * FROM",
    "SELECT * FROM INVALID sw",
    "SELECT * FROM STREAM sw in test,",
    "SHOW TOP FROM MEASURE metrics",
    "SELECT * WHERE service_id",
    "TIME > '2023-01-01'",
    "SELECT * FROM STREAM sw GROUP BY",
    "SELECT * FROM STREAM sw ORDER BY",
    "SELECT * FROM STREAM sw WHERE",
    "SELECT * FROM STREAM sw WHERE service =",
    "SELECT * FROM STREAM sw WHERE service_id MATCH",
    "SELECT * FROM STREAM sw WHERE service_id IN",
    "SELECT * FROM STREAM sw WHERE tags HAVING",
    "SELECT * FROM STREAM sw WHERE (service = 'a'",
    "SELECT * FROM STREAM sw WHERE service = 'a')",
    "SELECT * FROM STREAM sw TIME BETWEEN",
    "SELECT * FROM STREAM sw TIME BETWEEN '2024-01-01' AND",
    "SELECT * FROM STREAM sw LIMIT",
    "SELECT * FROM STREAM sw OFFSET",
    "SELECT * FROM STREAM sw IN default,,other",
    "SELECT ** FROM STREAM sw IN default",
    "SELECT FROM STREAM sw IN default WHERE id = 1",
    "SHOW TOP abc FROM MEASURE m IN default",
    "SELECT * FROM STREAM sw WHERE a = 1 AND",
    "SELECT * FROM STREAM sw WHERE a = 1 OR",
    "SELECT * FROM STREAM sw WHERE () = 1",
    "SELECT * FROM STREAM sw IN",
    "SELECT SUM() FROM MEASURE m IN default",
    "SELECT * FROM STREAM sw in default ORDER BY",
    "SELECT region, SUM(latency) FROM MEASURE m IN default "
    "GROUP BY region::invalid",
    "SELECT region, SUM(latency) FROM MEASURE m IN default GROUP BY ::tag",
    "SELECT region, SUM(latency) FROM MEASURE m IN default GROUP BY region::",
    "SELECT region, SUM(latency) FROM MEASURE m IN default GROUP BY region:tag",
    "SELECT region, SUM(latency) FROM MEASURE m IN default "
    "GROUP BY region::tag::field",
    "SELECT region, service, SUM(latency) FROM MEASURE m IN default "
    "GROUP BY region::tag,",
    "SELECT region, SUM(latency) FROM MEASURE m IN default "
    "GROUP BY region::tag, service::",
    "SELECT TOP 10 service_id::field DESC FROM STREAM sw IN default",
    "SHOW TOP 10 FROM MEASURE service_metrics IN default TIME > '-30m' "
    "WHERE region = 'us-west' OR environment = 'production'",
    "SHOW TOP 10 FROM MEASURE service_latency IN default "
    "TIME < '2023-01-01T00:00:00Z' ORDER BY value DESC",
    "SELECT * FROM STREAM sw IN ()",
    "SELECT * FROM STREAM sw IN group1,",
    "SELECT * FROM MEASURE *bad IN default",
    "SELECT FROM",
]


@pytest.mark.parametrize("i", range(len(INVALID)))
def test_invalid_query_rejected(i):
    with pytest.raises(BydbQLSyntaxError):
        parse(INVALID[i])


# ---------------------------------------------------------------------------
# §6 Time Format Parsing + Stream TIME Operators
# (bydbql_test.go:977-1002, 3170-3358)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("resource", ["STREAM", "MEASURE", "TRACE"])
@pytest.mark.parametrize("op", ["=", ">", "<", ">=", "<="])
@pytest.mark.parametrize("val", ["'-30m'", "'2023-06-15T14:30:00Z'", "'now'"])
def test_time_operator_matrix(resource, op, val):
    s = parse(f"SELECT * FROM {resource} r IN g TIME {op} {val}")
    assert s.time is not None and s.time.op == op
    # < / <= bound the END of the range; the others bound the BEGIN
    bound = s.time.end if op in ("<", "<=") else s.time.begin
    assert bound == val.strip("'")


def test_time_between_forms():
    s = parse("SELECT * FROM STREAM sw IN g "
              "TIME BETWEEN '2023-01-01T10:00:00Z' AND '2023-01-01T11:00:00Z'")
    assert s.time.op == "BETWEEN"
    assert s.time.begin == "2023-01-01T10:00:00Z"
    assert s.time.end == "2023-01-01T11:00:00Z"
    # same start and end, relative forms, mixed relative/absolute
    parse("SELECT * FROM STREAM sw IN g TIME BETWEEN '-1h' AND '-1h'")
    parse("SELECT * FROM STREAM sw IN g TIME BETWEEN '-1h' AND 'now'")
    parse("SELECT * FROM STREAM sw IN g "
          "TIME BETWEEN '2024-01-01T00:00:00Z' AND 'now'")
    s = parse("SHOW TOP 5 FROM MEASURE m IN g TIME BETWEEN '-24h' AND 'now'")
    assert isinstance(s, ShowTopStmt) and s.time.op == "BETWEEN"


@pytest.mark.parametrize("lit,want", [
    ("now", NOW),
    ("-30m", NOW - dt.timedelta(minutes=30)),
    ("-2h", NOW - dt.timedelta(hours=2)),
    ("-1d", NOW - dt.timedelta(days=1)),
    ("-1w", NOW - dt.timedelta(weeks=1)),
    ("2024-01-01T08:00:00+08:00", dt.datetime(2024, 1, 1)),
    ("2024-01-15T10:30:00Z", dt.datetime(2024, 1, 15, 10, 30)),
])
def test_relative_and_absolute_time_literals(lit, want):
    assert resolve_time(lit, NOW) == want


# ---------------------------------------------------------------------------
# §7 NULL Value Support (bydbql_test.go:1003-1087)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ql,op", [
    ("SELECT * FROM STREAM sw IN g WHERE f = NULL", BinaryOp.EQ),
    ("SELECT * FROM STREAM sw IN g WHERE f != NULL", BinaryOp.NE),
    ("SELECT * FROM MEASURE m IN g WHERE f = null", BinaryOp.EQ),   # case-ins
    ("SELECT * FROM MEASURE m IN g WHERE f = Null", BinaryOp.EQ),
])
def test_null_conditions(ql, op):
    c = _cond(parse(ql).where)
    assert c.op is op and c.value is None


def test_null_inside_logical_tree():
    s = parse("SELECT * FROM STREAM sw IN g WHERE a = NULL AND b != NULL "
              "OR c = 'x'")
    assert s.where.op is LogicalOp.OR
    assert _cond(s.where.left.left).value is None


# ---------------------------------------------------------------------------
# §8 Inequality Operators (bydbql_test.go:1088-1236)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("opstr,op,val", [
    ("!= 'down'", BinaryOp.NE, "down"),
    ("!= 500", BinaryOp.NE, 500),
    ("> 'm'", BinaryOp.GT, "m"),
    ("< 'm'", BinaryOp.LT, "m"),
    (">= 'm'", BinaryOp.GE, "m"),
    ("<= 'm'", BinaryOp.LE, "m"),
])
def test_inequality_operators(opstr, op, val):
    c = _cond(parse(f"SELECT * FROM STREAM sw IN g WHERE x {opstr}").where)
    assert c.op is op and c.value == val


def test_multiple_inequalities_chain():
    s = parse("SELECT * FROM STREAM sw IN g "
              "WHERE lat >= 100 AND lat <= 1000 AND err != 0")
    assert s.where.op is LogicalOp.AND


# ---------------------------------------------------------------------------
# §9 IN / NOT IN boundary cases (bydbql_test.go:1237-1394)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ql,op,val", [
    ("WHERE s IN (200)", BinaryOp.IN, [200]),
    ("WHERE s IN (200, 404)", BinaryOp.IN, [200, 404]),
    ("WHERE s IN (1,2,3,4,5,6,7,8,9,10)", BinaryOp.IN, list(range(1, 11))),
    ("WHERE s IN ('a', 'b', 'c')", BinaryOp.IN, ["a", "b", "c"]),
    ("WHERE s NOT IN (500)", BinaryOp.NOT_IN, [500]),
    ("WHERE s NOT IN (500, 502, 503, 504)", BinaryOp.NOT_IN,
     [500, 502, 503, 504]),
    # mixed types parse (legality is a transform-time concern)
    ("WHERE s IN (200, 'error', 404)", BinaryOp.IN, [200, "error", 404]),
])
def test_in_operator_forms(ql, op, val):
    c = _cond(parse(f"SELECT * FROM STREAM sw IN g {ql}").where)
    assert c.op is op and list(c.value) == val


@pytest.mark.parametrize("ql,op", [
    ("SELECT * FROM STREAM sw IN g WHERE s IN ()", BinaryOp.IN),
    ("SELECT * FROM STREAM sw IN g WHERE s NOT IN ()", BinaryOp.NOT_IN),
])
def test_empty_in_lists_parse(ql, op):
    """The reference test (:1306-1394) accepts EITHER verdict ('parser may
    reject empty IN list'); its conformance corpus ships ``IN ()`` as a
    legal query (trace ``in_empty_span_ids.ql``), so this parser accepts
    the empty candidate set — it matches nothing at execution."""
    c = _cond(parse(ql).where)
    assert c.op is op and list(c.value) == []


# ---------------------------------------------------------------------------
# §10 Dot-separated paths everywhere (bydbql_test.go:1395-1518)
# ---------------------------------------------------------------------------

def test_dot_paths_in_every_position():
    s = parse("SELECT metadata.service.name::tag, response.body.size::field "
              "FROM MEASURE metrics IN g TIME > '-30m' "
              "WHERE metadata.service.name = 'api' "
              "GROUP BY metadata.service.name::tag "
              "ORDER BY response.body.size DESC")
    names = [(p.name, p.hint) for p in s.projection]
    assert names == [("metadata.service.name", "TAG"),
                     ("response.body.size", "FIELD")]
    assert _cond(s.where).tag == "metadata.service.name"
    assert s.group_by == ("metadata.service.name",)
    assert s.group_by_hints == ("TAG",)
    assert s.order_by.key == "response.body.size"
    assert s.order_by.sort is Sort.DESC


def test_dot_path_in_aggregate():
    s = parse("SELECT region, SUM(response.body.size) FROM MEASURE m IN g "
              "GROUP BY region")
    aggs = [p for p in s.projection if p.agg]
    assert aggs[0].name == "response.body.size" and aggs[0].agg == "SUM"


# ---------------------------------------------------------------------------
# §11 Advanced ORDER BY (bydbql_test.go:1519-1611)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ql,key,sort", [
    ("ORDER BY metadata.latency DESC", "metadata.latency", Sort.DESC),
    ("ORDER BY duration", "duration", Sort.ASC),
    ("ORDER BY DESC", None, Sort.DESC),
    ("order by duration desc", "duration", Sort.DESC),
    ("ORDER BY TIME DESC", "time", Sort.DESC),
    ("ORDER BY TIME ASC", "time", Sort.ASC),
])
def test_order_by_forms(ql, key, sort):
    s = parse(f"SELECT * FROM STREAM sw IN g {ql}")
    assert s.order_by.sort is sort
    got = s.order_by.key
    assert got == key or (key == "time" and got in ("time", None))


# ---------------------------------------------------------------------------
# §12 GROUP BY with type specifiers (bydbql_test.go:1612-1764)
# + transformer semantics (transformer.go:746-825 convertGroupBy)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("gb,names,hints", [
    ("GROUP BY region", ("region",), (None,)),
    ("GROUP BY region::tag", ("region",), ("TAG",)),
    ("GROUP BY latency::field", ("latency",), ("FIELD",)),
    ("GROUP BY service, region", ("service", "region"), (None, None)),
    ("GROUP BY service::tag, region::tag, latency::field",
     ("service", "region", "latency"), ("TAG", "TAG", "FIELD")),
    ("GROUP BY service, region::tag", ("service", "region"), (None, "TAG")),
    ("GROUP BY metadata.service.name::tag", ("metadata.service.name",),
     ("TAG",)),
    ("GROUP BY region::TAG, latency::Field", ("region", "latency"),
     ("TAG", "FIELD")),
])
def test_group_by_specifier_parse(gb, names, hints):
    s = parse(f"SELECT * FROM MEASURE m IN g {gb}")
    assert s.group_by == names and s.group_by_hints == hints


def test_group_by_transform_resolution():
    cat = default_catalog(SF_SMALL)
    # auto: projected tag resolves
    q = to_query(parse(
        "SELECT event_type, SUM(value) FROM MEASURE metrics IN g1 "
        "GROUP BY event_type"), cat, NOW)
    assert q.group_by == ("event_type",)
    # ::tag accepted; a field-resolved column validates then is inert
    # (exactly like the YAML boundary's groupBy.fieldName)
    q = to_query(parse(
        "SELECT event_type, value FROM MEASURE metrics IN g1 "
        "GROUP BY event_type::tag, value::field"), cat, NOW)
    assert q.group_by == ("event_type",)
    # star projection resolves against the full schema
    q = to_query(parse(
        "SELECT * FROM MEASURE metrics IN g1 GROUP BY user_id"), cat, NOW)
    assert q.group_by == ("user_id",)


def test_group_by_transform_errors():
    cat = default_catalog(SF_SMALL)
    # not found in projection
    with pytest.raises(QueryAnalyzeError, match="not found in projection"):
        to_query(parse(
            "SELECT event_type, SUM(value) FROM MEASURE metrics IN g1 "
            "GROUP BY user_id"), cat, NOW)
    # ::tag naming a field
    with pytest.raises(QueryAnalyzeError, match="not found in projection"):
        to_query(parse(
            "SELECT event_type, value FROM MEASURE metrics IN g1 "
            "GROUP BY value::tag"), cat, NOW)
    # two fields
    with pytest.raises(QueryAnalyzeError, match="only one field"):
        to_query(parse(
            "SELECT value, value FROM MEASURE metrics IN g1 "
            "GROUP BY value::field, value::field"), cat, NOW)


# ---------------------------------------------------------------------------
# §13 Keyword case-insensitivity / name case-sensitivity
# (bydbql_test.go:1765-2117)
# ---------------------------------------------------------------------------

CASE_QUERIES = [
    "select * from stream sw in default",
    "sElEcT * fRoM sTrEaM sw In DeFaUlT",
    "SELECT * FROM STREAM sw IN default WhErE service = 'test'",
    "SELECT * FROM STREAM sw IN default WHERE a = 1 AnD b = 2",
    "SELECT * FROM STREAM sw IN default WHERE a = 1 oR b = 2",
    "SELECT region, SUM(value) FROM MEASURE m IN default group by region",
    "SELECT * FROM STREAM sw IN default Order By timestamp Desc",
    "SELECT * FROM STREAM sw IN default time > '-1h'",
    "SELECT * FROM STREAM sw IN default Time Between '2024-01-01' And '2024-01-02'",
    "SELECT * FROM STREAM sw IN default limit 100 offset 50",
    "SELECT sum(latency) FROM MEASURE m IN default",
    "SELECT * FROM STREAM sw IN default WHERE message match('error')",
    "SELECT * FROM STREAM sw IN default WHERE status in (200, 404)",
    "SELECT * FROM STREAM sw IN default WHERE status Not In (500, 503)",
    "SELECT * FROM STREAM sw IN default WHERE tags having ('error')",
    "SELECT * FROM STREAM sw IN default WHERE tags not having ('debug')",
    "SELECT * FROM STREAM sw IN default with query_trace",
    "show top 10 from measure m in default order by desc",
    "SELECT * FROM measure metrics IN default",
    "SELECT * FROM trace traces IN default",
    "SELECT * FROM property props IN default",
    "SHOW TOP 10 FROM MEASURE m IN default aggregate by max",
]


@pytest.mark.parametrize("i", range(len(CASE_QUERIES)))
def test_keyword_case_insensitive(i):
    assert parse(CASE_QUERIES[i]) is not None


def test_names_are_case_sensitive_and_preserved():
    for res in ("STREAM", "MEASURE", "TRACE", "PROPERTY"):
        a = parse(f"SELECT * FROM {res} MyResource IN default")
        b = parse(f"SELECT * FROM {res} myresource IN default")
        assert a.name == "MyResource" and b.name == "myresource"
        assert a.name != b.name
    s = parse("SELECT UserName, user_name FROM STREAM sw IN MyGroup "
              "WHERE ServiceID = 'x' GROUP BY UserName ORDER BY UserName")
    assert [p.name for p in s.projection] == ["UserName", "user_name"]
    assert s.groups == ("MyGroup",)
    assert _cond(s.where).tag == "ServiceID"
    assert s.group_by == ("UserName",)
    s = parse("sElEcT MyColumn fRoM sTrEaM MyStream In MyGroup")
    assert s.name == "MyStream" and s.projection[0].name == "MyColumn"


# ---------------------------------------------------------------------------
# §14 Column projection forms (bydbql_test.go:2118-2714)
# ---------------------------------------------------------------------------

def test_projection_forms():
    s = parse("SELECT a FROM STREAM sw IN g")
    assert [p.name for p in s.projection] == ["a"]
    s = parse("SELECT a, b_c, d-e, _f, A1b2 FROM STREAM sw IN g")
    assert [p.name for p in s.projection] == ["a", "b_c", "d-e", "_f", "A1b2"]
    s = parse("SELECT a::tag, b::field, c FROM MEASURE m IN g")
    assert [(p.name, p.hint) for p in s.projection] == [
        ("a", "TAG"), ("b", "FIELD"), ("c", None)]
    s = parse("SELECT x.y.z::TAG FROM MEASURE m IN g")
    assert s.projection[0].name == "x.y.z" and s.projection[0].hint == "TAG"


def test_aggregate_function_forms():
    for fn, norm in (("SUM", "SUM"), ("AVG", "MEAN"), ("MEAN", "MEAN"),
                     ("MAX", "MAX"), ("MIN", "MIN"), ("COUNT", "COUNT"),
                     ("sum", "SUM"), ("Count", "COUNT")):
        s = parse(f"SELECT region, {fn}(latency) FROM MEASURE m IN g "
                  "GROUP BY region")
        aggs = [p for p in s.projection if p.agg]
        assert aggs[0].agg == norm and aggs[0].name == "latency"


def test_special_projections():
    assert parse("SELECT * FROM STREAM sw IN g").projection == "*"
    assert parse("SELECT () FROM TRACE t IN g").projection == "()"
    s = parse("SELECT TOP 7 latency DESC FROM MEASURE m IN g")
    assert s.top.number == 7 and s.top.field_name == "latency"
    assert s.top.sort is Sort.DESC
    s = parse("SELECT TOP 3 cpm ASC, service::tag FROM MEASURE m IN g")
    assert s.top.sort is Sort.ASC
    assert s.projection[0].name == "service"


# ---------------------------------------------------------------------------
# §15 String literals / escaping / unicode / whitespace
# (bydbql_test.go:2715-2993)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("lit,want", [
    ("'hello world'", "hello world"),
    ("'it''s working'", "it's working"),       # SQL '' escape
    ("'/api/users'", "/api/users"),
    ("'multi-word-value'", "multi-word-value"),
    ("'snake_case_value'", "snake_case_value"),
    ("'v1.2.3'", "v1.2.3"),
    ("'Hello, World! How are you?'", "Hello, World! How are you?"),
    ("''", ""),
    ("'" + "x" * 500 + "'", "x" * 500),
    ("'emoji 🚀 test'", "emoji 🚀 test"),
])
def test_string_literal_forms(lit, want):
    c = _cond(parse(f"SELECT * FROM STREAM sw IN g WHERE m = {lit}").where)
    assert c.value == want


def test_double_quoted_is_identifier_not_string():
    # dialect rule: double quotes quote IDENTIFIERS (Core Rules); the
    # reference marks double-quoted STRINGS as optional-support
    s = parse('SELECT "count" FROM STREAM sw IN g')
    assert s.projection[0].name == "count"


def test_whitespace_insensitivity():
    a = parse("SELECT   *   FROM    STREAM sw   IN g WHERE a='x'")
    b = parse("SELECT *\n\tFROM STREAM sw\n IN g\nWHERE a = 'x'")
    c = parse("SELECT * FROM STREAM sw IN g WHERE a='x'")
    assert _cond(a.where) == _cond(b.where) == _cond(c.where)
    s = parse("SELECT * FROM STREAM sw IN g WHERE m = 'has  double  spaces'")
    assert s.where.value == "has  double  spaces"


# ---------------------------------------------------------------------------
# §16 Error message quality (bydbql_test.go:2994-3040)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ql,frag", [
    ("SELECT * STREAM sw IN g", "FROM"),
    ("SELECT * FROM STREAM sw default", "IN"),
    ("SELECT * FROM STREAM sw IN g WHERE m = 'unclosed", "character"),
    ("SELECT * FROM STREAM sw IN g WHERE a == 1", "="),
])
def test_error_messages_name_the_problem(ql, frag):
    with pytest.raises(BydbQLSyntaxError) as ei:
        parse(ql)
    assert frag.lower() in str(ei.value).lower() or frag in str(ei.value)


# ---------------------------------------------------------------------------
# §17 LIMIT / OFFSET boundaries (bydbql_test.go:3041-3169)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("tail,limit,offset", [
    ("LIMIT 10 OFFSET 20", 10, 20),
    ("LIMIT 10 OFFSET 0", 10, 0),
    ("LIMIT 100 OFFSET 10000", 100, 10000),
    ("LIMIT 0", 0, None),
    ("LIMIT 1", 1, None),
    ("LIMIT 999999", 999999, None),
    ("OFFSET 10", None, 10),            # OFFSET without LIMIT
])
def test_limit_offset_boundaries(tail, limit, offset):
    s = parse(f"SELECT * FROM STREAM sw IN g TIME > '-30m' {tail}")
    assert s.limit == limit and s.offset == offset


def test_negative_limit_parses_syntactically():
    # reference: "parser might accept syntactically, semantic validator
    # should reject"
    s = parse("SELECT * FROM STREAM sw IN g TIME > '-30m' LIMIT -1")
    assert s.limit == -1


# ---------------------------------------------------------------------------
# §18 Measure-specific: MATCH, SELECT TOP N (bydbql_test.go:3359-3445)
# ---------------------------------------------------------------------------

def test_measure_match_and_aggregation():
    s = parse("SELECT svc, SUM(cpm) FROM MEASURE m IN g "
              "WHERE name MATCH('api', 'standard', 'AND') GROUP BY svc")
    assert _cond(s.where).op is BinaryOp.MATCH
    assert any(p.agg == "SUM" for p in s.projection)


def test_select_top_n_in_measure():
    s = parse("SELECT TOP 10 latency FROM MEASURE m IN g TIME > '-15m'")
    assert s.top.number == 10 and s.top.sort is Sort.DESC  # default DESC
    s = parse("SELECT TOP 10 latency DESC FROM MEASURE m IN g")
    assert s.top.sort is Sort.DESC


# ---------------------------------------------------------------------------
# §19 SHOW TOP AGGREGATE BY (bydbql_test.go:3446-3543)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fn,norm", [
    ("SUM", "SUM"), ("MAX", "MAX"), ("MIN", "MIN"), ("AVG", "MEAN"),
    ("MEAN", "MEAN"), ("COUNT", "COUNT"), ("avg", "MEAN"),
])
def test_show_top_aggregate_by(fn, norm):
    s = parse(f"SHOW TOP 5 FROM MEASURE m IN g AGGREGATE BY {fn}")
    assert isinstance(s, ShowTopStmt) and s.agg == norm


def test_show_top_with_where_and_groups():
    s = parse("SHOW TOP 5 FROM MEASURE m IN g1, g2 TIME > '-30m' "
              "WHERE region = 'us' AND env = 'prod' AGGREGATE BY SUM")
    assert s.groups == ("g1", "g2") and len(s.where) == 2


# ---------------------------------------------------------------------------
# §20 Trace-specific (bydbql_test.go:3544-3640)
# ---------------------------------------------------------------------------

def test_trace_empty_projection_with_complex_conditions():
    s = parse("SELECT () FROM TRACE t IN g TIME > '-1h' "
              "WHERE (svc = 'a' OR svc = 'b') AND dur > 100 "
              "WITH QUERY_TRACE LIMIT 50")
    assert s.projection == "()" and s.query_trace and s.limit == 50


def test_trace_match():
    s = parse("SELECT () FROM TRACE t IN g "
              "WHERE endpoint MATCH('GET /api', 'url') AND state = 1")
    assert _cond(s.where.left).op is BinaryOp.MATCH
    assert s.where.left.match_analyzer == "url"


# ---------------------------------------------------------------------------
# §21 Property ID filtering (bydbql_test.go:3641-3766)
# ---------------------------------------------------------------------------

def test_property_id_forms():
    cat = default_catalog(SF_SMALL)
    q = to_query(parse(
        "SELECT lang FROM PROPERTY documents IN g1 WHERE ID = 1"), cat, NOW)
    assert q.ids == (1,) and q.criteria is None
    q = to_query(parse(
        "SELECT lang FROM PROPERTY documents IN g1 "
        "WHERE id IN (1, 2, 3) LIMIT 2"), cat, NOW)   # case-insensitive ID
    assert q.ids == (1, 2, 3) and q.limit == 2
    q = to_query(parse(
        "SELECT lang FROM PROPERTY documents IN g1 "
        "WHERE ID IN (1, 2) AND lang = 'en'"), cat, NOW)
    assert q.ids == (1, 2) and _cond(q.criteria).tag == "lang"


# ---------------------------------------------------------------------------
# §22 Extreme values (bydbql_test.go:3767-3797)
# ---------------------------------------------------------------------------

def test_extreme_integer_values():
    s = parse("SELECT * FROM STREAM sw IN g "
              "WHERE n > 9223372036854775807")
    assert _cond(s.where).value == 9223372036854775807
    s = parse("SELECT * FROM STREAM sw IN g "
              "WHERE n < -9223372036854775807")
    assert _cond(s.where).value == -9223372036854775807
    s = parse("SELECT * FROM STREAM sw IN g WHERE n = 0 AND m = 0")
    assert _cond(s.where.left).value == 0


# ---------------------------------------------------------------------------
# §23 Identifier character set — star-containing names
# (bydbql_test.go:3798-3860, reference 0.11)
# ---------------------------------------------------------------------------

def test_star_in_resource_and_group_names():
    s = parse("SHOW TOP 5 FROM MEASURE endpoint_avg-cluster-excludes-* IN g")
    assert s.name == "endpoint_avg-cluster-excludes-*"
    s = parse("SELECT * FROM STREAM sw-excludes-* IN default")
    assert s.name == "sw-excludes-*" and s.projection == "*"
    s = parse("SELECT * FROM MEASURE m IN mygroup-*")
    assert s.groups == ("mygroup-*",)
    s = parse("SELECT * FROM MEASURE m IN g WHERE col-* = 'v'")
    assert _cond(s.where).tag == "col-*"
    # bare star stays a projection, never an identifier
    s = parse("SELECT * FROM STREAM sw IN default")
    assert s.projection == "*"
    with pytest.raises(BydbQLSyntaxError):
        parse("SELECT * FROM MEASURE *bad IN default")
