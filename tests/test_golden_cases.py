"""Golden-corpus case shapes ported from the reference's test strategy
(``test/cases/measure/measure.go`` entry flags: WantEmpty / WantErr /
DisOrder / default-limit behaviors). Each case is the behavioral contract,
re-expressed against the synthetic catalog."""

from __future__ import annotations

import datetime as dt

import pytest

from skywalking_banyandb_spark.bydbql.transformer import execute
from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.errors import QueryAnalyzeError, SchemaError
from skywalking_banyandb_spark.model import (
    AggFunc,
    AggregationSpec,
    BinaryOp,
    MeasureQuery,
    StreamQuery,
    TimeRange,
    cond,
)
from skywalking_banyandb_spark.plans.measure import compile_measure
from skywalking_banyandb_spark.plans.stream import compile_stream

from conftest import SF_SMALL

NOW = dt.datetime(2024, 2, 1)
TR = TimeRange.of("2024-01-03T00:00:00", "2024-01-27T00:00:00")


def _cat():
    return default_catalog(SF_SMALL)


# --- WantErr shapes (analyze-time errors, not empty results) ---------------

def test_filter_non_existent_tag_errors(spark):
    with pytest.raises(QueryAnalyzeError):
        compile_measure(spark, _cat(), MeasureQuery(
            groups=["g1"], name="metrics", time_range=TR,
            criteria=cond("no_such", BinaryOp.EQ, 1)))


def test_projection_unknown_tag_errors(spark):
    with pytest.raises(QueryAnalyzeError):
        compile_measure(spark, _cat(), MeasureQuery(
            groups=["g1"], name="metrics", time_range=TR,
            tag_projection=["no_such"]))


def test_group_by_unknown_tag_errors(spark):
    with pytest.raises(QueryAnalyzeError):
        compile_measure(spark, _cat(), MeasureQuery(
            groups=["g1"], name="metrics", time_range=TR,
            group_by=["no_such"], agg=AggregationSpec(AggFunc.SUM, "value")))


def test_agg_unknown_field_errors(spark):
    with pytest.raises(QueryAnalyzeError):
        compile_measure(spark, _cat(), MeasureQuery(
            groups=["g1"], name="metrics", time_range=TR,
            group_by=["event_type"], agg=AggregationSpec(AggFunc.SUM, "nope")))


def test_unknown_group_errors(spark):
    with pytest.raises(SchemaError):
        compile_measure(spark, _cat(), MeasureQuery(
            groups=["no_group"], name="metrics", time_range=TR))


def test_stream_order_by_unknown_tag_errors(spark):
    from skywalking_banyandb_spark.model import OrderBy

    with pytest.raises(QueryAnalyzeError):
        compile_stream(spark, _cat(), StreamQuery(
            groups=["g1"], name="event_log", time_range=TR,
            order_by=OrderBy("no_such")))


# --- WantEmpty shapes (valid queries matching nothing) ---------------------

def test_filter_unmatched_value_is_empty(spark):
    df = compile_measure(spark, _cat(), MeasureQuery(
        groups=["g1"], name="metrics", time_range=TR,
        criteria=cond("event_type", BinaryOp.EQ, "nonexistent_type")))
    assert df.count() == 0


def test_time_range_outside_data_is_empty(spark):
    df = compile_measure(spark, _cat(), MeasureQuery(
        groups=["g1"], name="metrics",
        time_range=TimeRange.of("2030-01-01T00:00:00", "2030-02-01T00:00:00")))
    assert df.count() == 0


def test_exclusive_upper_bound(spark):
    """[begin, end) — a row exactly at `end` is excluded."""
    ev = spark.read.parquet  # noqa: F841  (documentation of intent)
    import pyspark.sql.functions as F
    from skywalking_banyandb_spark.sources.parquet import read_table

    raw = read_table(spark, f"{SF_SMALL}/events.parquet")
    some_ts = raw.select("ts").orderBy("ts").limit(1).head()[0]
    df = compile_measure(spark, _cat(), MeasureQuery(
        groups=["g1"], name="metrics",
        time_range=TimeRange(some_ts, some_ts)))
    assert df.count() == 0  # empty half-open range
    df2 = compile_measure(spark, _cat(), MeasureQuery(
        groups=["g1"], name="metrics",
        time_range=TimeRange(some_ts, some_ts + dt.timedelta(microseconds=1))))
    assert df2.count() == 1  # exactly the boundary row


# --- default-limit / pagination behaviors ----------------------------------

def test_default_limit_100(spark):
    df = compile_measure(spark, _cat(), MeasureQuery(
        groups=["g1"], name="metrics", time_range=TR))
    assert df.count() == 100


def test_offset_beyond_end_empty(spark):
    df = compile_measure(spark, _cat(), MeasureQuery(
        groups=["g1"], name="metrics", time_range=TR,
        limit=10, offset=10_000_000))
    assert df.count() == 0


def test_limit_beyond_data_returns_all(spark):
    df = compile_measure(spark, _cat(), MeasureQuery(
        groups=["g1"], name="metrics", time_range=TimeRange.of(
            "2024-01-01T00:00:00", "2024-02-01T00:00:00"),
        limit=10_000_000))
    assert df.count() == 1000  # sf0.001 full table


# --- BydbQL equivalents of the same contracts ------------------------------

def test_bydbql_unknown_tag_errors(spark):
    with pytest.raises(QueryAnalyzeError):
        execute(spark, _cat(),
                "SELECT * FROM MEASURE metrics IN g1 WHERE ghost = 1", NOW)


def test_bydbql_empty_result(spark):
    df = execute(spark, _cat(),
                 "SELECT * FROM MEASURE metrics IN g1 "
                 "TIME > '2030-01-01T00:00:00Z' LIMIT 10", NOW)
    assert df.count() == 0


def test_op_type_legality_errors(spark):
    """Reference op/type legality (tag_filter.go:174-189; golden WantErr
    cases gen_err_in_scalar spirit, gen_err_match_int): IN on an array tag,
    MATCH on an int tag, HAVING on a scalar tag are analyze-time errors."""
    from skywalking_banyandb_spark.catalog import (
        Catalog, MeasureSchema, TagSpec, FieldSpec,
    )

    cat = Catalog()
    cat.register(MeasureSchema(
        group="g", name="m", paths=(f"{SF_SMALL}/events.parquet",),
        ts_column="ts",
        tags=(
            TagSpec("user_id", "INT"),
            TagSpec("event_type", "STRING", analyzer="standard"),
            TagSpec("labels", "STRING_ARRAY", indexed=False),
        ),
        fields=(FieldSpec("value", "FLOAT"),),
        entity=("user_id",), version_column="event_id",
    ))

    def q(criteria):
        return MeasureQuery(groups=["g"], name="m", time_range=TR,
                            criteria=criteria, limit=10)

    with pytest.raises(QueryAnalyzeError, match="array type"):
        compile_measure(spark, cat, q(cond("labels", BinaryOp.IN, ["a"])))
    with pytest.raises(QueryAnalyzeError, match="array type"):
        compile_measure(spark, cat, q(cond("labels", BinaryOp.NOT_IN, ["a"])))
    with pytest.raises(QueryAnalyzeError, match="string"):
        compile_measure(spark, cat, q(cond("user_id", BinaryOp.MATCH, ["1"])))
    with pytest.raises(QueryAnalyzeError, match="array"):
        compile_measure(spark, cat, q(
            cond("event_type", BinaryOp.HAVING, ["click"])))
    # the legal shapes still compile: IN on scalar, MATCH on string
    # (project physical columns only — 'labels' has no backing column in
    # the synthetic file; analyze-time legality is what's under test)
    def legal(criteria):
        return MeasureQuery(groups=["g"], name="m", time_range=TR,
                            criteria=criteria, limit=10,
                            tag_projection=["user_id", "event_type"])

    compile_measure(spark, cat, legal(cond("user_id", BinaryOp.IN, [1, 2])))
    compile_measure(spark, cat, legal(cond("event_type", BinaryOp.MATCH, ["click"])))
    # MATCH against a NON-analyzed string tag is an analyze-time error
    # (golden gen_err_match_trace_id / gen_err_match_sw: the tag has no
    # analyzed index rule)
    with pytest.raises(QueryAnalyzeError, match="analyzed"):
        compile_measure(spark, cat, q(cond("labels", BinaryOp.MATCH, ["x"])))


def test_invalid_logical_expression_errors(spark):
    """Golden case err_invalid_le: an AND/OR node missing an operand is an
    analyze-time error, not a crash or a silent no-op."""
    from skywalking_banyandb_spark.model import Criteria, LogicalOp

    bad = Criteria(LogicalOp.AND, cond("user_id", BinaryOp.EQ, 1), None)
    with pytest.raises(QueryAnalyzeError, match="invalid logical"):
        compile_measure(spark, _cat(), MeasureQuery(
            groups=["g1"], name="metrics", time_range=TR, criteria=bad))


# --- TopN condition validation (topn_plan_localscan.go:137,149) ------------

def test_topn_condition_unknown_tag_errors(spark):
    """A TopN condition on a tag absent from the materialization must be an
    analyze-time error (reference: 'only groupBy tag name is supported'),
    never a silently-dropped predicate."""
    from skywalking_banyandb_spark.model import TopNQuery, Sort
    from skywalking_banyandb_spark.plans.topn import compile_topn

    q = TopNQuery(
        groups=["g1"], name="metrics",
        time_range=TimeRange.of("2024-01-03T00:00:00", "2024-01-08T00:00:00"),
        top_n=3, sort=Sort.DESC,
        conditions=(cond("event_type", BinaryOp.EQ, "click"),),
    )
    with pytest.raises(QueryAnalyzeError, match="groupBy tag"):
        compile_topn(spark, _cat(), q)


def test_topn_entity_tag_non_eq_errors(spark):
    """Entity tags only support EQ in TopN conditions
    (topn_plan_localscan.go:137)."""
    from skywalking_banyandb_spark.model import TopNQuery, Sort
    from skywalking_banyandb_spark.plans.topn import compile_topn

    q = TopNQuery(
        groups=["g1"], name="metrics",
        time_range=TimeRange.of("2024-01-03T00:00:00", "2024-01-08T00:00:00"),
        top_n=3, sort=Sort.DESC,
        conditions=(cond("user_id", BinaryOp.GE, 3),),
    )
    with pytest.raises(QueryAnalyzeError, match="EQ"):
        compile_topn(spark, _cat(), q)


# --- Trace order-by sidx key (trace_plan_local.go:77-120) -------------------

def test_trace_orderby_unknown_tag_errors(spark):
    from skywalking_banyandb_spark.model import OrderBy, Sort, TraceQuery
    from skywalking_banyandb_spark.plans.trace import compile_trace

    q = TraceQuery(
        groups=["g1"], name="event_trace",
        time_range=TR, order_by=OrderBy("nope", Sort.DESC))
    with pytest.raises(QueryAnalyzeError, match="indexed tag"):
        compile_trace(spark, _cat(), q)


def test_trace_orderby_string_tag_errors(spark):
    """sidx keys are int64 — a STRING tag cannot be a trace sort key."""
    from skywalking_banyandb_spark.model import OrderBy, Sort, TraceQuery
    from skywalking_banyandb_spark.plans.trace import compile_trace

    q = TraceQuery(
        groups=["g1"], name="event_trace",
        time_range=TR, order_by=OrderBy("event_type", Sort.DESC))
    with pytest.raises(QueryAnalyzeError, match="numeric"):
        compile_trace(spark, _cat(), q)


def test_trace_orderby_duration_matches_duckdb(spark):
    """Slowest-traces-first ordering: trace key = MAX(value) for DESC,
    ties broken by trace_id; two-phase plan returns the same top-k set and
    order as a direct SQL ranking."""
    import duckdb

    from skywalking_banyandb_spark.model import OrderBy, Sort, TraceQuery
    from skywalking_banyandb_spark.plans.trace import compile_trace

    q = TraceQuery(
        groups=["g1"], name="event_trace", time_range=TR,
        order_by=OrderBy("value", Sort.DESC), limit=20, offset=5,
    )
    got = [
        (r.trace_id, r.span_count)
        for r in compile_trace(spark, _cat(), q)
        .select("trace_id", "span_count").collect()
    ]
    want = duckdb.sql(
        f"""SELECT user_id AS trace_id, COUNT(*) AS span_count
            FROM '{SF_SMALL}/events.parquet'
            WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
              AND ts < TIMESTAMP '2024-01-27 00:00:00'
            GROUP BY user_id
            ORDER BY MAX(value) DESC, trace_id LIMIT 20 OFFSET 5"""
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_topn_counters_number_caps_materialization_width(spark):
    """counters_number is the reference heap's EXACT bound
    (pkg/flow/streaming/topn.go sizes the per-(window, GroupName) heap at
    counters_number; schema.proto:147-150): a query whose N exceeds it can
    only rank the stored candidates, never widen them — so the
    materialization width is capped at counters_number (ADVICE r11; the
    old max(n, counters_number) surfaced series the reference's bounded
    store could never return). Without a declaration bound, the query's N
    sizes the recompute."""
    from skywalking_banyandb_spark.plans.topn import materialize_topn

    schema = _cat().get("g1", "measure", "metrics")
    capped = materialize_topn(
        spark, schema, "value", n=10, window="1 hour",
        group_tags=["event_type"], counters_number=2,
    )
    per_group = (
        capped.groupBy("window_start", "event_type").count().collect())
    assert per_group and all(r["count"] <= 2 for r in per_group)
    unbounded = materialize_topn(
        spark, schema, "value", n=10, window="1 hour",
        group_tags=["event_type"],
    )
    wide = unbounded.groupBy("window_start", "event_type").count().collect()
    assert max(r["count"] for r in wide) > 2  # N sizes the shorthand path


def test_agg_tag_projection_naming_field_is_not_duplicated(spark):
    """A tag_projection entry naming the aggregated FIELD passes
    analyze-time validation (fields live in tagmap so criteria can
    reference them) but must not generate a first-point extra aliased
    identically to the aggregate output — previously a duplicate,
    ambiguous column (ADVICE r11). The aggregate result shape stays
    entity tags + value (measure_plan_aggregation.go)."""
    q = MeasureQuery(
        groups=["g1"], name="metrics", time_range=TR,
        group_by=["event_type"],
        agg=AggregationSpec(AggFunc.SUM, "value"),
        tag_projection=["event_type", "value"], limit=100,
    )
    df = compile_measure(spark, _cat(), q)
    assert df.columns.count("value") == 1
    assert df.columns == ["event_type", "value"]
    df.collect()  # and the plan actually resolves (no ambiguity error)


def test_agg_extras_keep_tag_that_collides_with_another_groups_field(
        spark, tmp_path):
    """The field-name exclusion on aggregate extras is FIELD-ONLY: when a
    multi-group query merges group A declaring tag 'score' with group B
    declaring field 'score', the projected tag must still ride the
    first-point min_by extra (the reviewer scenario for the r12 extras
    fix: a blanket all-fields exclusion silently dropped a projected tag
    the reference returns)."""
    import dataclasses
    import datetime as dt

    from skywalking_banyandb_spark.catalog import (
        Catalog, FieldSpec, MeasureSchema, TagSpec,
    )
    from skywalking_banyandb_spark.plans.measure import compile_measure
    from skywalking_banyandb_spark.sources.writer import write_measure

    # score types are numeric on BOTH sides so the test isolates the
    # extras exclusion from the (documented) first-group-type merge
    df_a = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 10, 8), "e1", 7, 1.5),
         (2, dt.datetime(2024, 1, 10, 9), "e1", 3, 2.5)],
        "version long, ts timestamp, eid string, score long, value double",
    )
    sa = MeasureSchema(
        group="ga", name="mm", paths=(str(tmp_path / "a"),), ts_column="ts",
        tags=(TagSpec("eid", "STRING"), TagSpec("score", "INT")),
        fields=(FieldSpec("value", "FLOAT"),),
        entity=("eid",), version_column="version",
    )
    write_measure(df_a, sa, sa.paths[0])
    df_b = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 10, 8), "e2", 9.0, 3.5)],
        "version long, ts timestamp, eid string, score double, value double",
    )
    sb = MeasureSchema(
        group="gb", name="mm", paths=(str(tmp_path / "b"),), ts_column="ts",
        tags=(TagSpec("eid", "STRING"),),
        fields=(FieldSpec("value", "FLOAT"), FieldSpec("score", "FLOAT")),
        entity=("eid",), version_column="version",
    )
    write_measure(df_b, sb, sb.paths[0])
    cat = Catalog()
    cat.register(sa)
    cat.register(sb)
    q = MeasureQuery(
        groups=["ga", "gb"], name="mm",
        time_range=TimeRange.of("2024-01-01T00:00:00", "2024-02-01T00:00:00"),
        group_by=["eid"], agg=AggregationSpec(AggFunc.SUM, "value"),
        tag_projection=["eid", "score"], limit=10,
    )
    rows = {r.eid: r for r in compile_measure(spark, cat, q).collect()}
    assert "score" in rows["e1"].asDict()
    assert rows["e1"].score == 7              # first point's tag value
    assert rows["e1"].value == 4.0
