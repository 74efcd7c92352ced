"""Property-based differential fuzz at the WHOLE-QUERY level: random
MeasureQuery shapes (criteria × group-by × aggregation × order × pagination)
compiled by the engine vs a hand-built equivalent SQL statement in DuckDB
that replicates the measure read semantics (version dedup, post-dedup
filter, decimal float accumulation, total-order pagination).

The generated corpus mirrors the reference's generated golden cases
(``test/cases/measure/data/input/gen_feat_*`` — feature-combination
queries) but is unbounded instead of a fixed 209."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.model import (
    AggFunc,
    AggregationSpec,
    MeasureQuery,
    OrderBy,
    Sort,
    TimeRange,
)
from skywalking_banyandb_spark.plans.measure import compile_measure

from conftest import SF_SMALL
from test_fuzz_criteria import _to_sql, criteria_trees
from skywalking_banyandb_spark.model import (
    BinaryOp,
    Criteria,
    LogicalOp,
    cond,
)

TR = TimeRange.of("2024-01-05T00:00:00", "2024-01-25T00:00:00")

# version-dedup'd, time-bounded measure view (the engine's scan semantics:
# latest event_id wins per (user_id, ts); criteria evaluate AFTER dedup)
DD = """
  (SELECT ts, user_id, event_type, props, value FROM (
     SELECT *, row_number() OVER (
        PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
     FROM events
     WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
       AND ts <  TIMESTAMP '2024-01-25 00:00:00') WHERE rn = 1)"""

SUM6 = "CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE)"
AGG_SQL = {
    AggFunc.MIN: "MIN(value)",
    AggFunc.MAX: "MAX(value)",
    AggFunc.SUM: SUM6,
    AggFunc.COUNT: "COUNT(value)",
    AggFunc.MEAN: f"{SUM6} / COUNT(value)",
}

raw_queries = st.fixed_dictionaries({
    "mode": st.just("raw"),
    "criteria": st.none() | criteria_trees,
    "order": st.sampled_from(
        [None, ("user_id", Sort.ASC), ("user_id", Sort.DESC),
         ("event_type", Sort.ASC), ("event_type", Sort.DESC),
         (None, Sort.DESC)]),
    "limit": st.integers(min_value=1, max_value=150),
    "offset": st.integers(min_value=0, max_value=120),
})

agg_queries = st.fixed_dictionaries({
    "mode": st.just("agg"),
    "criteria": st.none() | criteria_trees,
    "group_by": st.sampled_from(
        [["event_type"], ["user_id"], ["user_id", "event_type"], []]),
    "agg": st.sampled_from(list(AggFunc)),
})

query_shapes = st.one_of(raw_queries, agg_queries)


@pytest.fixture(scope="module")
def env(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'"
    )
    return spark, default_catalog(SF_SMALL), con


def _build(shape):
    """shape dict -> (MeasureQuery, duckdb SQL)."""
    crit = shape["criteria"]
    where = f" WHERE {_to_sql(crit)}" if crit is not None else ""
    if shape["mode"] == "agg":
        gb = shape["group_by"]
        agg = shape["agg"]
        q = MeasureQuery(
            groups=["g1"], name="metrics", time_range=TR, criteria=crit,
            group_by=gb, agg=AggregationSpec(agg, "value"), limit=10**6,
        )
        if gb:
            cols = ", ".join(gb)
            sql = (f"SELECT {cols}, {AGG_SQL[agg]} AS value FROM {DD}{where} "
                   f"GROUP BY {cols}")
        else:
            sql = f"SELECT {AGG_SQL[agg]} AS value FROM {DD}{where}"
        return q, sql, False  # unordered compare

    order = shape["order"]
    ob = None
    if order is not None:
        ob = OrderBy(tag=order[0], sort=order[1])
    key = "ts" if (order is None or order[0] is None) else order[0]
    direction = "DESC" if (order and order[1] is Sort.DESC) else "ASC"
    tiebreak = [c for c in ("ts", "user_id") if c != key]
    order_sql = ", ".join(
        [f"{key} {direction}"] + [f"{t} ASC" for t in tiebreak]
    )
    q = MeasureQuery(
        groups=["g1"], name="metrics", time_range=TR, criteria=crit,
        order_by=ob, limit=shape["limit"], offset=shape["offset"],
    )
    sql = (f"SELECT ts, user_id, event_type, props, value FROM {DD}{where} "
           f"ORDER BY {order_sql} LIMIT {shape['limit']} "
           f"OFFSET {shape['offset']}")
    return q, sql, True  # ordered compare


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(shape=query_shapes)
def test_query_shape_matches_duckdb(env, shape):
    spark, cat, con = env
    q, sql, ordered = _build(shape)
    df = compile_measure(spark, cat, q)
    cols = sorted(df.columns)
    sp = [tuple(r[c] for c in cols) for r in df.collect()]
    duck = con.execute(sql).fetch_arrow_table().to_pylist()
    du = [tuple(r[c] for c in cols) for r in duck]
    if not ordered:
        key = lambda row: tuple((v is None, str(v)) for v in row)
        sp, du = sorted(sp, key=key), sorted(du, key=key)
    assert sp == du, f"shape={shape}\nsql={sql}"


# ---------------------------------------------------------------------------
# Stream-level shapes: criteria × order-by-tag × pagination over the
# element model (dedup by unique element id, total-order pagination) —
# the generated stream corpus analogue (gen_feat_* in test/cases/stream).
# ---------------------------------------------------------------------------

stream_shapes = st.fixed_dictionaries({
    "criteria": st.none() | criteria_trees,
    "order": st.sampled_from(
        [None, ("user_id", Sort.ASC), ("user_id", Sort.DESC),
         ("value", Sort.ASC), ("value", Sort.DESC), (None, Sort.DESC)]),
    "limit": st.integers(min_value=1, max_value=120),
    "offset": st.integers(min_value=0, max_value=80),
})


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(shape=stream_shapes)
def test_stream_shape_matches_duckdb(env, shape):
    from skywalking_banyandb_spark.model import StreamQuery
    from skywalking_banyandb_spark.plans.stream import compile_stream

    spark, cat, con = env
    crit = shape["criteria"]
    order = shape["order"]
    ob = OrderBy(tag=order[0], sort=order[1]) if order is not None else None
    q = StreamQuery(
        groups=["g1"], name="event_log", time_range=TR, criteria=crit,
        projection=["user_id", "event_type", "value"],
        order_by=ob, limit=shape["limit"], offset=shape["offset"],
    )
    df = compile_stream(spark, cat, q)
    cols = sorted(df.columns)
    sp = [tuple(r[c] for c in cols) for r in df.collect()]

    where = f" AND ({_to_sql(crit)})" if crit is not None else ""
    key = "ts" if (order is None or order[0] is None) else order[0]
    direction = "DESC" if (order and order[1] is Sort.DESC) else "ASC"
    sql = (
        "SELECT ts, event_id, user_id, event_type, value FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' "
        "  AND ts <  TIMESTAMP '2024-01-25 00:00:00'"
        f"{where} ORDER BY {key} {direction}, event_id ASC "
        f"LIMIT {shape['limit']} OFFSET {shape['offset']}"
    )
    du = [tuple(r[c] for c in cols)
          for r in con.execute(sql).fetch_arrow_table().to_pylist()]
    assert sp == du, f"shape={shape}\nsql={sql}"


# ---------------------------------------------------------------------------
# Trace-level shapes: criteria × time order × pagination, checked on the
# regrouped per-trace stats (span_count / start_ts / end_ts) — pins the
# trace-ID regrouping semantics (trace_plan_local.go) without comparing
# nested span arrays.
# ---------------------------------------------------------------------------

trace_shapes = st.fixed_dictionaries({
    "criteria": st.none() | criteria_trees,
    "sort": st.sampled_from([None, Sort.ASC, Sort.DESC]),
    "limit": st.integers(min_value=1, max_value=60),
    "offset": st.integers(min_value=0, max_value=40),
})


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(shape=trace_shapes)
def test_trace_shape_matches_duckdb(env, shape):
    from skywalking_banyandb_spark.model import TraceQuery
    from skywalking_banyandb_spark.plans.trace import compile_trace

    spark, cat, con = env
    crit = shape["criteria"]
    ob = OrderBy(tag=None, sort=shape["sort"]) if shape["sort"] else None
    q = TraceQuery(
        groups=["g1"], name="event_trace", time_range=TR, criteria=crit,
        order_by=ob, limit=shape["limit"], offset=shape["offset"],
    )
    df = compile_trace(spark, cat, q).select(
        "trace_id", "span_count", "start_ts", "end_ts")
    sp = [tuple(r) for r in df.collect()]

    where = f" AND ({_to_sql(crit)})" if crit is not None else ""
    direction = "DESC" if shape["sort"] is Sort.DESC else "ASC"
    sql = (
        "SELECT user_id AS trace_id, COUNT(*) AS span_count, "
        "MIN(ts) AS start_ts, MAX(ts) AS end_ts FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' "
        "  AND ts <  TIMESTAMP '2024-01-25 00:00:00'"
        f"{where} GROUP BY user_id "
        f"ORDER BY start_ts {direction}, trace_id ASC "
        f"LIMIT {shape['limit']} OFFSET {shape['offset']}"
    )
    du = [(r["trace_id"], r["span_count"], r["start_ts"], r["end_ts"])
          for r in con.execute(sql).fetch_arrow_table().to_pylist()]
    assert sp == du, f"shape={shape}\nsql={sql}"


# ---------------------------------------------------------------------------
# Property-level shapes: criteria × order-by-tag × pagination over the
# documents property table (id-tiebroken total order).
# ---------------------------------------------------------------------------

_prop_leaf = st.one_of(
    st.tuples(st.just("lang"), st.sampled_from([BinaryOp.EQ, BinaryOp.NE]),
              st.sampled_from(["en", "de", "fr", "es", "zz"])),
    st.tuples(st.just("n_chars"),
              st.sampled_from([BinaryOp.LT, BinaryOp.GT, BinaryOp.LE,
                               BinaryOp.GE]),
              st.integers(min_value=0, max_value=2000)),
)

prop_trees = st.recursive(
    _prop_leaf.map(lambda t: cond(*t)),
    lambda inner: st.tuples(
        st.sampled_from([LogicalOp.AND, LogicalOp.OR]), inner, inner
    ).map(lambda t: Criteria(t[0], t[1], t[2])),
    max_leaves=4,
)

prop_shapes = st.fixed_dictionaries({
    "criteria": st.none() | prop_trees,
    "order": st.sampled_from(
        [None, ("n_chars", Sort.ASC), ("n_chars", Sort.DESC),
         ("lang", Sort.ASC), ("lang", Sort.DESC)]),
    "limit": st.integers(min_value=1, max_value=80),
    "offset": st.integers(min_value=0, max_value=60),
})


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(shape=prop_shapes)
def test_property_shape_matches_duckdb(env, shape):
    from skywalking_banyandb_spark.model import PropertyQuery
    from skywalking_banyandb_spark.plans.property import compile_property

    spark, cat, con = env
    con.execute(
        f"CREATE VIEW IF NOT EXISTS documents AS "
        f"SELECT * FROM '{SF_SMALL}/documents.parquet'"
    )
    crit = shape["criteria"]
    order = shape["order"]
    ob = OrderBy(tag=order[0], sort=order[1]) if order else None
    q = PropertyQuery(
        group="g1", name="documents", criteria=crit,
        projection=["lang", "n_chars"],
        order_by=ob, limit=shape["limit"], offset=shape["offset"],
    )
    df = compile_property(spark, cat, q)
    cols = sorted(df.columns)
    sp = [tuple(r[c] for c in cols) for r in df.collect()]

    where = f" WHERE {_to_sql(crit)}" if crit is not None else ""
    if order:
        direction = "DESC" if order[1] is Sort.DESC else "ASC"
        order_sql = f"{order[0]} {direction}, doc_id ASC"
    else:
        order_sql = "doc_id ASC"
    sql = (
        f"SELECT doc_id, lang, n_chars FROM documents{where} "
        f"ORDER BY {order_sql} LIMIT {shape['limit']} OFFSET {shape['offset']}"
    )
    du = [tuple(r[c] for c in cols)
          for r in con.execute(sql).fetch_arrow_table().to_pylist()]
    assert sp == du, f"shape={shape}\nsql={sql}"
