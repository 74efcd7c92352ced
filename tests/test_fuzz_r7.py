"""Property-based differential for the round-7 PromQL extrapolated-rate
estimator: random multi-series counter samples (random timestamps inside
and across hours, random resets, duplicate timestamps, singleton
windows) → the engine's windowed estimator vs a direct Python
transcription of promql/functions.go extrapolatedRate."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import skywalking_banyandb_spark.registry_observability as obs_mod

from conftest import SF_SMALL

H0 = dt.datetime(2024, 6, 1, 0, 0, 0)

_sample = st.tuples(
    st.integers(min_value=0, max_value=2),          # series
    st.integers(min_value=0, max_value=7199),       # second within 2 hours
    st.floats(min_value=0.0, max_value=1000.0,
              allow_nan=False, allow_infinity=False),
)


def _prom_increase(samples, start, end):
    samples = sorted(samples)
    if len(samples) < 2:
        return None
    first_t, first_v = samples[0][0], samples[0][2]
    last_t = samples[-1][0]
    raw = 0.0
    for (_, _, v0), (_, _, v1) in zip(samples, samples[1:]):
        raw += (v1 - v0) if v1 >= v0 else v1
    sampled = last_t - first_t
    if sampled <= 0:
        return None
    avg_dur = sampled / (len(samples) - 1)
    dur_start = first_t - start
    dur_end = end - last_t
    # promql/functions.go (Prometheus >= 2.46): threshold-clamp FIRST,
    # then the zero-crossing cap applies to the clamped value (ADVICE r7)
    thresh = avg_dur * 1.1
    if dur_start >= thresh:
        dur_start = avg_dur / 2
    if raw > 0 and first_v >= 0:
        dtz = sampled * (first_v / raw)
        if dtz < dur_start:
            dur_start = dtz
    if dur_end >= thresh:
        dur_end = avg_dur / 2
    extrap = sampled + dur_start + dur_end
    return raw * (extrap / sampled)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(samples=st.lists(_sample, min_size=1, max_size=40, unique=True))
def test_extrapolated_rate_fuzz(spark, samples):
    rows = [
        (u, H0 + dt.timedelta(seconds=sec), i, v, "click")
        for i, (u, sec, v) in enumerate(samples)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double, "
        "event_type string")

    # reference: per (series, hour) window with in-window ordering by
    # (t, event_id) — duplicates on t are legal and ordered by event_id
    by_win: dict = {}
    for i, (u, sec, v) in enumerate(samples):
        hour = sec // 3600
        by_win.setdefault((u, hour), []).append(
            (float(sec - hour * 3600), i, v))
    want = {k: _prom_increase(ss, 0.0, 3600.0)
            for k, ss in by_win.items()}
    want = {k: v for k, v in want.items() if v is not None}

    orig = obs_mod.read_table
    try:
        obs_mod.read_table = lambda _s, _p: df
        got = {
            (r.user_id, (r.hour - H0).total_seconds() // 3600): r.increase
            for r in obs_mod._rate_extrapolated_promql(
                spark, SF_SMALL).collect()
        }
    finally:
        obs_mod.read_table = orig
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-6 + 1e-9 * abs(v), (k, got[k], v)


def test_finalize_hash_rate_sampler_matches_python(spark):
    """The finalization hash-rate sampler's keep decision (Spark
    conv(substring(md5...)) path) must equal the Python recomputation on
    arbitrary trace ids — including unicode and md5 prefixes with
    leading zeros — at several rates."""
    import hashlib


    from skywalking_banyandb_spark.sources.trace_finalize import (
        hash_rate_sampler,
    )

    tids = (["t" + str(i) for i in range(50)]
            + ["", "a b", "トレース", "λ-1", "0" * 12, "ffffff"]
            + [hashlib.md5(str(i).encode()).hexdigest() for i in range(20)])
    df = spark.createDataFrame([(t,) for t in tids], "trace_id string")
    for rate in (0.0, 0.1, 0.5, 0.9, 1.0):
        got = {r.trace_id for r in
               df.where(hash_rate_sampler(rate).decide(df)).collect()}
        cut = int(rate * 0xFFFFFF)
        want = {t for t in tids
                if int(hashlib.md5(f"finalize|{t}".encode())
                       .hexdigest()[:6], 16) < cut}
        assert got == want, rate
