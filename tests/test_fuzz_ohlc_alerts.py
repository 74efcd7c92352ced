"""Differential fuzz for OHLC windows and alert intervals: random tiny
event sets vs DuckDB (arg_min/arg_max + gaps-and-islands), targeting the
tie cases the corpus may not produce (same-timestamp rows, single-bucket
islands, empty results). Since r6 the base time sits just after the epoch
and hour offsets go NEGATIVE, so pre-1970 rows exercise the biased
open/close key (a bare lpad of negative micros breaks lexicographic
ordering) and the exact-floor bucket division (double-divide +
cast('bigint') truncates toward zero)."""

from __future__ import annotations

import datetime as dt

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_T0 = dt.datetime(1970, 1, 1, 2)

# (hour-offset, minute, type-id, value) — few hours/types so same-ts and
# same-bucket collisions are common
_ev = st.tuples(
    st.integers(min_value=-4, max_value=3),   # straddles the 1970 epoch
    st.integers(min_value=0, max_value=3),   # few minutes -> ts ties
    st.integers(min_value=0, max_value=1),
    st.integers(min_value=0, max_value=9),
)


def _frame(spark, rows):
    data = [
        (i, _T0 + dt.timedelta(hours=h, minutes=m), f"t{t}", float(v))
        for i, (h, m, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, event_type string, value double")
    con = duckdb.connect()
    con.execute("CREATE TABLE e(event_id BIGINT, ts TIMESTAMP, "
                "event_type VARCHAR, value DOUBLE)")
    if data:
        con.executemany("INSERT INTO e VALUES (?, ?, ?, ?)", data)
    return df, con


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(_ev, min_size=1, max_size=20))
def test_ohlc_fuzz_vs_duckdb(spark, rows):
    from skywalking_banyandb_spark.registry_observability import \
        _OHLC_KEY_BIAS as B

    df, con = _frame(spark, rows)
    key = F.concat(
        F.lpad((F.unix_micros(F.col("ts").cast("timestamp"))
                + F.lit(B)).cast("string"), 20, "0"),
        F.lit("|"), F.lpad(F.col("event_id").cast("string"), 12, "0"))
    got = sorted(
        (str(r.hour), r.event_type, r.open, r.high, r.low, r.close, r.n)
        for r in df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type")
        .agg(F.min_by("value", key).alias("open"),
             F.max("value").alias("high"),
             F.min("value").alias("low"),
             F.max_by("value", key).alias("close"),
             F.count(F.lit(1)).alias("n"))
        .collect())
    want = sorted(
        (str(r[0]), r[1], r[2], r[3], r[4], r[5], r[6])
        for r in con.execute(f"""
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP), event_type,
                   arg_min(value, lpad(CAST(epoch_us(ts) + {B} AS VARCHAR), 20, '0')
                           || '|' || lpad(CAST(event_id AS VARCHAR), 12, '0')),
                   MAX(value), MIN(value),
                   arg_max(value, lpad(CAST(epoch_us(ts) + {B} AS VARCHAR), 20, '0')
                           || '|' || lpad(CAST(event_id AS VARCHAR), 12, '0')),
                   COUNT(*)
            FROM e GROUP BY 1, 2""").fetchall())
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(_ev, min_size=0, max_size=20),
       threshold=st.integers(min_value=1, max_value=4))
def test_alert_islands_fuzz_vs_duckdb(spark, rows, threshold):
    from pyspark.sql.window import Window

    df, con = _frame(spark, rows)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    hour_us = F.lit(3_600_000_000)
    per = (df.groupBy("event_type",
                      ((us - F.pmod(us, hour_us)) / hour_us)
                      .cast("bigint").alias("bk"))
           .agg(F.count(F.lit(1)).alias("n"))
           .where(F.col("n") >= threshold))
    w = Window.partitionBy("event_type").orderBy("bk")
    got = sorted(
        (r.event_type, r.s, r.e, r.nb, r.peak)
        for r in per.withColumn("island", F.col("bk") - F.row_number().over(w))
        .groupBy("event_type", "island")
        .agg(F.min("bk").alias("s"), (F.max("bk") + 1).alias("e"),
             F.count(F.lit(1)).alias("nb"), F.max("n").alias("peak"))
        .collect())
    want = sorted(tuple(r) for r in con.execute(f"""
        WITH per AS (
          SELECT event_type, CAST((epoch_us(ts) - ((epoch_us(ts) % 3600000000) + 3600000000) % 3600000000) // 3600000000 AS BIGINT) bk,
                 COUNT(*) n
          FROM e GROUP BY 1, 2 HAVING COUNT(*) >= {threshold}),
        isl AS (
          SELECT *, bk - row_number() OVER (
              PARTITION BY event_type ORDER BY bk) AS island FROM per)
        SELECT event_type, MIN(bk), MAX(bk) + 1, COUNT(*), MAX(n)
        FROM isl GROUP BY event_type, island""").fetchall())
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.floats(min_value=0.01, max_value=500.0,
              allow_nan=False, allow_infinity=False),
    min_size=1, max_size=30))
def test_histogram_quantile_fuzz_vs_python(spark, vals):
    """Random distributions through the registry's compiled bucket-walk
    expression vs the independent Python reimplementation (from the PromQL
    definition) — nails the CASE-walk equivalence beyond fixed cases."""
    from test_r5_semantics import _hq_python
    from skywalking_banyandb_spark import registry_observability as obs
    import skywalking_banyandb_spark.sources.parquet as pq

    df = spark.createDataFrame(
        [("x", float(v)) for v in vals], "event_type string, value double")
    orig = pq.read_table
    try:
        obs.read_table = lambda s, p: df  # noqa: E731
        row = obs._histogram_quantile(spark, "ignored").collect()[0]
    finally:
        obs.read_table = orig
    for got, q in ((row.q50, 0.5), (row.q90, 0.9), (row.q99, 0.99)):
        want = _hq_python(list(vals), q)
        assert abs(got - want) < 1e-6, (q, got, want, sorted(vals))
