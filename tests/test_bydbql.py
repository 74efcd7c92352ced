"""BydbQL front-end conformance: parse shapes, transformer behaviors, and
execution equivalence against directly-constructed typed queries."""

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
    execute,
    resolve_time,
    time_range,
    to_query,
)
from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.errors import QueryAnalyzeError
from skywalking_banyandb_spark.model import (
    AggFunc,
    BinaryOp,
    Condition,
    Criteria,
    LogicalOp,
    MeasureQuery,
    Sort,
)

from conftest import SF_SMALL

NOW = dt.datetime(2024, 2, 1, 0, 0, 0)


def test_parse_select_measure_full():
    s = parse(
        "SELECT event_type, MEAN(value) FROM MEASURE metrics IN g1, g2 "
        "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-27T00:00:00Z' "
        "WHERE (event_type = 'click' OR event_type = 'error') AND user_id >= 3 "
        "GROUP BY event_type ORDER BY value DESC WITH QUERY_TRACE LIMIT 10 OFFSET 2"
    )
    assert isinstance(s, SelectStmt)
    assert s.resource == "MEASURE" and s.groups == ("g1", "g2")
    assert s.group_by == ("event_type",) and s.query_trace
    assert s.limit == 10 and s.offset == 2
    assert isinstance(s.where, Criteria) and s.where.op is LogicalOp.AND


def test_parse_show_top():
    s = parse(
        "SHOW TOP 5 FROM MEASURE metrics IN g1 TIME > '-30m' "
        "WHERE event_type = 'click' AGGREGATE BY AVG ORDER BY ASC"
    )
    assert isinstance(s, ShowTopStmt)
    assert s.number == 5 and s.agg == "MEAN" and s.sort is Sort.ASC
    assert s.where[0].op is BinaryOp.EQ


def test_parse_match_variants():
    s = parse("SELECT * FROM STREAM event_log IN g1 WHERE text MATCH('error')")
    c = s.where
    assert c.op is BinaryOp.MATCH and c.value == ["error"]
    s = parse(
        "SELECT * FROM STREAM event_log IN g1 "
        "WHERE text MATCH(('a', 'b'), 'keyword', 'AND')"
    )
    c = s.where
    assert c.value == ["a", "b"] and c.match_analyzer == "keyword"
    assert c.match_operator is LogicalOp.AND
    # 2-arg form where the second arg is the operator
    s = parse("SELECT * FROM STREAM event_log IN g1 WHERE t MATCH(('a','b'), 'OR')")
    assert s.where.match_operator is LogicalOp.OR


def test_parse_stages_and_paren_groups():
    s = parse("SELECT * FROM MEASURE metrics IN (g1, g2) ON warm, cold STAGES TIME > '-1h'")
    assert s.stages == ("warm", "cold") and s.groups == ("g1", "g2")


def test_parse_having_and_null():
    s = parse("SELECT * FROM STREAM event_log IN g1 WHERE tags HAVING ('a','b') AND x != NULL")
    left, right = s.where.left, s.where.right
    assert left.op is BinaryOp.HAVING and left.value == ["a", "b"]
    assert right.op is BinaryOp.NE and right.value is None


def test_parse_errors():
    with pytest.raises(BydbQLSyntaxError):
        parse("SELECT FROM MEASURE m IN g")
    with pytest.raises(BydbQLSyntaxError):
        parse("SELECT * FROM TABLE t IN g")
    with pytest.raises(BydbQLSyntaxError):
        parse("SELECT * FROM MEASURE m IN g TIME > unquoted")
    with pytest.raises(BydbQLSyntaxError):
        parse("SHOW TOP 3 FROM MEASURE m IN g WHERE a = 1 OR b = 2")  # OR illegal
    with pytest.raises(BydbQLSyntaxError):
        parse("SELECT * FROM MEASURE m IN g; DROP TABLE x")


def test_relative_time_resolution():
    assert resolve_time("now", NOW) == NOW
    assert resolve_time("-30m", NOW) == NOW - dt.timedelta(minutes=30)
    assert resolve_time("-2h", NOW) == NOW - dt.timedelta(hours=2)
    assert resolve_time("-1w", NOW) == NOW - dt.timedelta(weeks=1)
    assert resolve_time("2024-01-01T08:00:00+08:00", NOW) == dt.datetime(2024, 1, 1)
    tr = time_range(parse("SELECT * FROM MEASURE metrics IN g1 TIME > '-1d'").time, NOW)
    assert tr.begin == NOW - dt.timedelta(days=1) + dt.timedelta(milliseconds=1)
    assert tr.end is None


def test_to_query_ambiguous_key_requires_hint():
    cat = default_catalog(SF_SMALL)
    # 'value' is a field; as bare projection on measure it resolves to field
    q = to_query(parse("SELECT user_id, value FROM MEASURE metrics IN g1"), cat, NOW)
    assert isinstance(q, MeasureQuery)
    assert q.tag_projection == ("user_id",) and q.field_projection == ("value",)
    with pytest.raises(QueryAnalyzeError):
        to_query(parse("SELECT nonexistent FROM MEASURE metrics IN g1"), cat, NOW)
    with pytest.raises(QueryAnalyzeError):
        to_query(parse("SELECT value::TAG FROM MEASURE metrics IN g1"), cat, NOW)


def test_property_id_routing():
    cat = default_catalog(SF_SMALL)
    q = to_query(
        parse("SELECT lang FROM PROPERTY documents IN g1 WHERE ID IN (1, 2) AND lang = 'en'"),
        cat, NOW,
    )
    assert q.ids == (1, 2)
    assert isinstance(q.criteria, Condition) and q.criteria.tag == "lang"


def test_execute_equivalence_measure(spark):
    """BydbQL text and the typed query compile to identical results."""
    from skywalking_banyandb_spark.model import (
        AggregationSpec,
        MeasureQuery,
        TimeRange,
        and_,
        cond,
    )
    from skywalking_banyandb_spark.plans.measure import compile_measure

    cat = default_catalog(SF_SMALL)
    ql = (
        "SELECT event_type, SUM(value) FROM MEASURE metrics IN g1 "
        "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-27T00:00:00Z' "
        "WHERE user_id <= 10 GROUP BY event_type LIMIT 1000"
    )
    got = sorted(map(tuple, execute(spark, cat, ql, NOW).collect()))
    want_q = MeasureQuery(
        groups=["g1"], name="metrics",
        time_range=TimeRange.of("2024-01-03T00:00:00", "2024-01-27T00:00:00"),
        criteria=cond("user_id", BinaryOp.LE, 10),
        group_by=["event_type"],
        agg=AggregationSpec(AggFunc.SUM, "value"),
        limit=1000,
    )
    want = sorted(map(tuple, compile_measure(spark, cat, want_q).collect()))
    assert got == want and len(got) > 0


def test_execute_show_top(spark):
    cat = default_catalog(SF_SMALL)
    df = execute(
        spark, cat,
        "SHOW TOP 3 FROM MEASURE metrics IN g1 "
        "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-08T00:00:00Z' "
        "AGGREGATE BY MEAN ORDER BY DESC",
        NOW,
    )
    rows = df.collect()
    assert len(rows) == 3
    vals = [r.value for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_show_top_declaration_in_later_group(spark):
    """A multi-group SHOW TOP whose TopNAggregation declaration is
    registered under a LATER group must still resolve the declaration
    (ADVICE r10: the transformer checked stmt.groups[0] only and
    silently fell back to the measure shorthand, family-stripping
    against the wrong schema)."""
    from skywalking_banyandb_spark.catalog import TopNAggregationSchema

    cat = default_catalog(SF_SMALL)
    cat.register(TopNAggregationSchema(
        group="g2", name="metrics_rank", source_measure=("g2", "metrics"),
        field_name="value", group_by_tags=("user_id",),
    ))
    # g1 has no declaration and no measure named metrics_rank; resolution
    # must come from g2 — before the fix this raised SchemaError
    df = execute(
        spark, cat,
        "SHOW TOP 3 FROM MEASURE metrics_rank IN g1, g2 "
        "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-08T00:00:00Z' "
        "AGGREGATE BY MAX ORDER BY DESC",
        NOW,
    )
    rows = df.collect()
    assert len(rows) == 3
    vals = [r.value for r in rows]
    assert vals == sorted(vals, reverse=True)
    # the declaration's groupBy tag (and the source entity) shape the row
    assert "user_id" in df.columns


def test_execute_stream_order_and_offset(spark):
    cat = default_catalog(SF_SMALL)
    df = execute(
        spark, cat,
        "SELECT user_id, value FROM STREAM event_log IN g1 "
        "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-27T00:00:00Z' "
        "ORDER BY value DESC LIMIT 5 OFFSET 2",
        NOW,
    )
    rows = df.collect()
    assert len(rows) == 5
    vals = [r.value for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_execute_trace_empty_projection(spark):
    cat = default_catalog(SF_SMALL)
    df = execute(
        spark, cat,
        "SELECT () FROM TRACE event_trace IN g1 "
        "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-05T00:00:00Z' LIMIT 10",
        NOW,
    )
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert "trace_id" in df.columns and "spans" in df.columns


def test_parse_edge_identifiers_and_timezones():
    from skywalking_banyandb_spark.bydbql.parser import parse
    import datetime as dt
    from skywalking_banyandb_spark.bydbql.transformer import resolve_time

    # dotted + quoted identifiers (syntax.md "Core Rules")
    s = parse("SELECT http.method, \"count\" FROM STREAM logs IN default "
              "WHERE http.method = 'GET'")
    names = [p.name for p in s.projection]
    assert names == ["http.method", "count"]
    assert s.where.tag == "http.method"

    # '' escape inside string literal
    s = parse("SELECT * FROM STREAM logs IN g WHERE msg = 'it''s'")
    assert s.where.value == "it's"

    # RFC3339 with explicit offset normalizes to UTC
    t = resolve_time("2023-01-01T15:30:45+08:00", dt.datetime(2024, 1, 1))
    assert t == dt.datetime(2023, 1, 1, 7, 30, 45)

    # TOP projection form with trailing columns
    s = parse("SELECT TOP 5 latency DESC, service FROM MEASURE m IN g "
              "TIME > '-30m'")
    assert s.top.number == 5 and s.top.field_name == "latency"
    assert [p.name for p in s.projection] == ["service"]

    # week-unit relative time
    t = resolve_time("-1w", dt.datetime(2024, 1, 8))
    assert t == dt.datetime(2024, 1, 1)


def test_family_qualified_identifiers(spark):
    """grammar.go:291-295 GrammarIdentifierPath: ``family.tag`` paths resolve
    against the declared tag family everywhere an identifier appears —
    projection, WHERE, GROUP BY, ORDER BY."""
    cat = default_catalog(SF_SMALL)
    plain = execute(
        spark, cat,
        "SELECT user_id, event_type FROM MEASURE metrics IN g1 "
        "TIME BETWEEN '2024-01-01T00:00:00' AND '2024-02-01T00:00:00' "
        "WHERE event_type = 'click' "
        "ORDER BY user_id LIMIT 20", NOW,
    )
    qualified = execute(
        spark, cat,
        "SELECT default.user_id, default.event_type FROM MEASURE metrics IN g1 "
        "TIME BETWEEN '2024-01-01T00:00:00' AND '2024-02-01T00:00:00' "
        "WHERE default.event_type = 'click' "
        "ORDER BY default.user_id LIMIT 20", NOW,
    )
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, qualified.collect()))
    # a wrong family does NOT resolve -> unknown-name analyze error
    import pytest as _pytest

    from skywalking_banyandb_spark.errors import QueryAnalyzeError

    with _pytest.raises(QueryAnalyzeError):
        execute(spark, cat,
                "SELECT nosuchfam.user_id FROM MEASURE metrics IN g1 "
                "TIME > '-30d' LIMIT 5", NOW)
