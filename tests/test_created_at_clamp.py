"""created_at time-range clamp (reference 0.11 "Schema consistency Phase 1").

Mirrors the reference's golden specs (`test/cases/schema/clamp.go`, liaison
impl `banyand/liaison/grpc/measure.go:459-489` clampTimeRangeBegin):

- clamp fires ONLY for revision-pinned queries (GroupModRevisions non-empty
  is the opt-in trigger; legacy clients keep pre-creation rows);
- begin = max(begin, max(created_at across queried groups));
- nil created_at (pre-upgrade schema) is a no-op;
- a clamped begin past end yields an empty result, not an error.
"""

from __future__ import annotations

import dataclasses
import datetime as dt

from skywalking_banyandb_spark.catalog import (
    clamp_time_range_begin,
    default_catalog,
)
from skywalking_banyandb_spark.model import (
    AggFunc,
    AggregationSpec,
    MeasureQuery,
    StreamQuery,
    TimeRange,
    TraceQuery,
)
from skywalking_banyandb_spark.plans.measure import compile_measure
from skywalking_banyandb_spark.plans.stream import compile_stream
from skywalking_banyandb_spark.plans.trace import compile_trace

from conftest import SF_SMALL

_CA = dt.datetime(2024, 1, 10)


def _cat_with_created_at(sf, kind="measure", name="metrics", group="g1",
                         created_at=_CA):
    cat = default_catalog(sf)
    s = cat.get(group, kind, name)
    cat.register(dataclasses.replace(s, created_at=created_at))
    return cat


def test_clamp_pure_function_semantics():
    tr = TimeRange.of("2024-01-03T00:00:00", "2024-01-27T00:00:00")

    class S:
        def __init__(self, ca):
            self.created_at = ca

    # nil created_at everywhere -> untouched (pre-upgrade no-op)
    assert clamp_time_range_begin([S(None), S(None)], tr) is tr
    # one group's created_at inside the range -> begin raised to it
    out = clamp_time_range_begin([S(None), S(_CA)], tr)
    assert out.begin == _CA and out.end == tr.end
    # multi-group: MAX across queried groups wins
    later = dt.datetime(2024, 1, 20)
    out = clamp_time_range_begin([S(_CA), S(later)], tr)
    assert out.begin == later
    # created_at before begin -> untouched
    early = dt.datetime(2023, 6, 1)
    assert clamp_time_range_begin([S(early)], tr) is tr
    # unbounded begin -> becomes created_at
    out = clamp_time_range_begin([S(_CA)], TimeRange(None, tr.end))
    assert out.begin == _CA


def test_measure_clamp_drops_pre_creation_rows(spark):
    cat = _cat_with_created_at(SF_SMALL)
    base = dict(groups=["g1"], name="metrics",
                time_range=TimeRange.of("2024-01-03T00:00:00",
                                        "2024-01-27T00:00:00"),
                tag_projection=["user_id"], field_projection=["value"],
                limit=100000)
    legacy = compile_measure(spark, cat, MeasureQuery(**base))
    gated = compile_measure(spark, cat, MeasureQuery(
        **base, group_mod_revisions={"g1": cat.mod_revision("g1")}))
    n_legacy, n_gated = legacy.count(), gated.count()
    assert n_gated < n_legacy  # pre-01-10 rows clamped away
    assert gated.where(f"ts < timestamp'{_CA.isoformat(sep=' ')}'").count() == 0
    # legacy (no revisions) keeps pre-creation backfill — reference
    # backward-compat behavior
    assert legacy.where(f"ts < timestamp'{_CA.isoformat(sep=' ')}'").count() > 0


def test_measure_clamp_past_end_is_empty_not_error(spark):
    cat = _cat_with_created_at(SF_SMALL)
    q = MeasureQuery(
        groups=["g1"], name="metrics",
        # window entirely BEFORE created_at -> clamp degenerates the range
        time_range=TimeRange.of("2024-01-03T00:00:00", "2024-01-05T00:00:00"),
        tag_projection=["user_id"], field_projection=["value"],
        group_mod_revisions={"g1": cat.mod_revision("g1")},
    )
    assert compile_measure(spark, cat, q).count() == 0


def test_stream_and_trace_clamp(spark):
    scat = _cat_with_created_at(SF_SMALL, kind="stream", name="event_log")
    sq = StreamQuery(
        groups=["g1"], name="event_log",
        time_range=TimeRange.of("2024-01-03T00:00:00", "2024-01-27T00:00:00"),
        projection=["user_id", "event_type"], limit=100000,
        group_mod_revisions={"g1": scat.mod_revision("g1")},
    )
    got = compile_stream(spark, scat, sq)
    assert got.count() > 0
    assert got.where(f"ts < timestamp'{_CA.isoformat(sep=' ')}'").count() == 0

    tcat = _cat_with_created_at(SF_SMALL, kind="trace", name="event_trace")
    tq = TraceQuery(
        groups=["g1"], name="event_trace",
        time_range=TimeRange.of("2024-01-03T00:00:00", "2024-01-05T00:00:00"),
        limit=10,
        group_mod_revisions={"g1": tcat.mod_revision("g1")},
    )
    assert compile_trace(spark, tcat, tq).count() == 0


def test_clamp_entry_matches_oracle(spark):
    """The registry entry vs its DuckDB oracle at sf0.001 (the conformance
    pattern — the driver re-verifies at sf0.01)."""
    import duckdb

    import __spark_entry__ as em

    got = sorted(
        (r[0], round(r[1], 6))
        for r in em.queries()["measure_created_at_clamp"](
            spark, SF_SMALL).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{SF_SMALL}/events.parquet'")
    want = sorted(
        (r[0], round(r[1], 6))
        for r in con.execute(
            em.oracle_sql()["measure_created_at_clamp"]).fetchall())
    assert got == want
