"""Round-6 differential fuzzers: the created_at clamp against an
independently-filtered query, and the PromQL reset-aware counter increase
against a from-scratch Python fold."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_T0 = dt.datetime(2024, 1, 1)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    ca_days=st.one_of(st.none(), st.integers(min_value=-5, max_value=40)),
    begin_days=st.integers(min_value=0, max_value=30),
    span_days=st.integers(min_value=0, max_value=20),
)
def test_created_at_clamp_fuzz(spark, ca_days, begin_days, span_days):
    """Gated query rows == ungated rows manually filtered to
    [max(begin, created_at), end) — for any created_at placement (before,
    inside, after the window, or absent)."""
    import dataclasses

    from skywalking_banyandb_spark.catalog import default_catalog
    from skywalking_banyandb_spark.model import MeasureQuery, TimeRange
    from skywalking_banyandb_spark.plans.measure import compile_measure

    from conftest import SF_SMALL

    begin = _T0 + dt.timedelta(days=begin_days)
    end = begin + dt.timedelta(days=span_days)
    ca = None if ca_days is None else _T0 + dt.timedelta(days=ca_days)

    cat = default_catalog(SF_SMALL)
    m = cat.get("g1", "measure", "metrics")
    cat.register(dataclasses.replace(m, created_at=ca))
    base = dict(groups=["g1"], name="metrics",
                time_range=TimeRange(begin, end),
                tag_projection=["user_id"], field_projection=["value"],
                limit=10**6)
    gated = compile_measure(spark, cat, MeasureQuery(
        **base, group_mod_revisions={"g1": cat.mod_revision("g1")}))
    ungated = compile_measure(spark, cat, MeasureQuery(**base))
    eff_begin = begin if ca is None else max(begin, ca)
    want = ungated.where(F.col("ts") >= F.lit(eff_begin)).count()
    assert gated.count() == want


_samples = st.lists(
    st.tuples(st.integers(min_value=0, max_value=200),   # minutes offset
              st.integers(min_value=0, max_value=30)),   # value
    min_size=0, max_size=25)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(samples=_samples)
def test_counter_increase_fuzz_vs_python(spark, samples):
    """Random counter series (dense ties, frequent resets) through the
    registry's compiled expression vs a from-scratch Python fold of the
    PromQL definition."""
    import skywalking_banyandb_spark.registry_observability as obs
    import skywalking_banyandb_spark.sources.parquet as pq

    rows = [
        (i, _T0 + dt.timedelta(minutes=m), 1, "click", float(v))
        for i, (m, v) in enumerate(samples)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    orig = pq.read_table
    try:
        obs.read_table = lambda s, p: df  # noqa: E731
        got = {(r.user_id, r.hour): (r.n_samples, r.n_resets, r.increase)
               for r in obs._counter_increase_promql(spark, "x").collect()}
    finally:
        obs.read_table = orig

    # independent fold: order by (ts, event_id), chain prev across hours
    want: dict = {}
    prev = None
    for eid, ts, uid, _, v in sorted(rows, key=lambda r: (r[1], r[0])):
        hour = ts.replace(minute=0, second=0, microsecond=0)
        key = (uid, hour)
        n, r_, inc = want.get(key, (0, 0, 0.0))
        n += 1
        if prev is not None:
            if v >= prev:
                inc += v - prev
            else:
                r_ += 1
                inc += v
        want[key] = (n, r_, inc)
        prev = v
    assert set(got) == set(want)
    for k, (n, r_, inc) in want.items():
        gn, gr, ginc = got[k]
        assert (gn, gr) == (n, r_), k
        assert abs(ginc - inc) < 1e-9, (k, ginc, inc)
