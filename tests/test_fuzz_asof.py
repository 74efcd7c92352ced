"""Property-based differential fuzz for the as-of join: random tiny
event sets -> the engine's union-trick AND chunked as-of joins vs DuckDB's
native ASOF LEFT JOIN (an independent implementation). Any divergence in
(left_id -> matched payload) is a bug in one of the three."""

from __future__ import annotations

import datetime as dt

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import pytest

from skywalking_banyandb_spark.operators.asof import (
    asof_join,
    asof_join_chunked,
)

_T0 = dt.datetime(2024, 1, 1)

# (key, minute-offset, payload-or-None); None payload = left row
_row = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=5000),
    st.one_of(st.none(), st.integers(min_value=1, max_value=99)),
)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(_row, min_size=1, max_size=24))
@pytest.mark.soak
def test_asof_matches_duckdb_asof(spark, rows):
    lefts, rights = [], []
    for i, (k, mins, payload) in enumerate(rows):
        ts = _T0 + dt.timedelta(minutes=mins)
        if payload is None:
            lefts.append((i, k, ts))
        else:
            rights.append((k, ts, float(payload)))
    if not lefts:
        lefts.append((999, 0, _T0))

    left = spark.createDataFrame(lefts, "lid long, k long, ts timestamp")
    right = (spark.createDataFrame(rights, "k long, ts timestamp, pv double")
             if rights else
             spark.createDataFrame([], "k long, ts timestamp, pv double"))

    con = duckdb.connect()
    con.execute("CREATE TABLE l(lid BIGINT, k BIGINT, ts TIMESTAMP)")
    con.execute("CREATE TABLE r(k BIGINT, ts TIMESTAMP, pv DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", lefts)
    if rights:
        con.executemany("INSERT INTO r VALUES (?, ?, ?)", rights)
    want = dict(con.execute("""
        WITH rd AS (SELECT k, ts, MAX(pv) AS pv FROM r GROUP BY k, ts)
        SELECT l.lid, rd.pv FROM l ASOF LEFT JOIN rd
          ON l.k = rd.k AND l.ts >= rd.ts
    """).fetchall())

    got = {r.lid: r.asof_value
           for r in asof_join(left, right, ["k"], "ts", "pv").collect()}
    assert got == want, (sorted(got.items()), sorted(want.items()))

    chunked = {r.lid: r.asof_value
               for r in asof_join_chunked(left, right, ["k"], "ts", "pv",
                                          chunk_us=3_600_000_000).collect()}
    assert chunked == want


def test_asof_chunked_keeps_null_key_rows(spark):
    """ADVICE r4: the chunked stitch join must be NULL-SAFE on the series
    keys — the window formulation groups NULL keys into one series, so a
    NULL-key left row has well-defined as-of semantics and must not drop.
    Differential: plain vs chunked vs a sentinel-keyed DuckDB ASOF."""
    lefts = [(1, None, _T0 + dt.timedelta(minutes=10)),
             (2, None, _T0 + dt.timedelta(minutes=30)),
             (3, 1, _T0 + dt.timedelta(minutes=20)),
             (4, None, _T0 + dt.timedelta(minutes=5))]
    rights = [(None, _T0 + dt.timedelta(minutes=8), 7.0),
              (None, _T0 + dt.timedelta(minutes=25), 9.0),
              (1, _T0 + dt.timedelta(minutes=1), 3.0)]
    left = spark.createDataFrame(lefts, "lid long, k long, ts timestamp")
    right = spark.createDataFrame(rights, "k long, ts timestamp, pv double")

    con = duckdb.connect()
    con.execute("CREATE TABLE l(lid BIGINT, k BIGINT, ts TIMESTAMP)")
    con.execute("CREATE TABLE r(k BIGINT, ts TIMESTAMP, pv DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", lefts)
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", rights)
    want = dict(con.execute("""
        WITH rd AS (SELECT COALESCE(k, -1) AS k, ts, MAX(pv) AS pv
                    FROM r GROUP BY COALESCE(k, -1), ts)
        SELECT l.lid, rd.pv
        FROM (SELECT lid, COALESCE(k, -1) AS k, ts FROM l) l
        ASOF LEFT JOIN rd ON l.k = rd.k AND l.ts >= rd.ts
    """).fetchall())
    assert want == {1: 7.0, 2: 9.0, 3: 3.0, 4: None}

    got = {r.lid: r.asof_value
           for r in asof_join(left, right, ["k"], "ts", "pv").collect()}
    assert got == want
    chunked = {r.lid: r.asof_value
               for r in asof_join_chunked(left, right, ["k"], "ts", "pv",
                                          chunk_us=600_000_000).collect()}
    assert chunked == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(_row, min_size=1, max_size=24),
       tol_mins=st.one_of(st.none(), st.integers(min_value=0, max_value=600)))
@pytest.mark.soak
def test_asof_forward_and_tolerance_match_duckdb(spark, rows, tol_mins):
    """r5 options: direction='forward' (earliest at-or-after) and
    tolerance_us, differentially vs DuckDB's ASOF with a flipped
    inequality; tolerance applied to DuckDB's matched ts in Python."""
    lefts, rights = [], []
    for i, (k, mins, payload) in enumerate(rows):
        ts = _T0 + dt.timedelta(minutes=mins)
        if payload is None:
            lefts.append((i, k, ts))
        else:
            rights.append((k, ts, float(payload)))
    if not lefts:
        lefts.append((999, 0, _T0))
    left = spark.createDataFrame(lefts, "lid long, k long, ts timestamp")
    right = (spark.createDataFrame(rights, "k long, ts timestamp, pv double")
             if rights else
             spark.createDataFrame([], "k long, ts timestamp, pv double"))

    con = duckdb.connect()
    con.execute("CREATE TABLE l(lid BIGINT, k BIGINT, ts TIMESTAMP)")
    con.execute("CREATE TABLE r(k BIGINT, ts TIMESTAMP, pv DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", lefts)
    if rights:
        con.executemany("INSERT INTO r VALUES (?, ?, ?)", rights)
    raw = con.execute("""
        WITH rd AS (SELECT k, ts, MAX(pv) AS pv FROM r GROUP BY k, ts)
        SELECT l.lid, l.ts, rd.ts, rd.pv FROM l ASOF LEFT JOIN rd
          ON l.k = rd.k AND l.ts <= rd.ts
    """).fetchall()
    tol_us = None if tol_mins is None else tol_mins * 60_000_000
    want = {}
    for lid, lts, rts, pv in raw:
        if pv is not None and tol_us is not None:
            dist = (rts - lts) // dt.timedelta(microseconds=1)
            if dist > tol_us:
                pv = None
        want[lid] = pv

    got = {r.lid: r.asof_value for r in asof_join(
        left, right, ["k"], "ts", "pv",
        direction="forward", tolerance_us=tol_us).collect()}
    assert got == want, (sorted(got.items()), sorted(want.items()))

    chunked = {r.lid: r.asof_value for r in asof_join_chunked(
        left, right, ["k"], "ts", "pv", chunk_us=3_600_000_000,
        direction="forward", tolerance_us=tol_us).collect()}
    assert chunked == want
