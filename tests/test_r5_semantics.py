"""Independent semantic checks for the round-5 operators.

The driver oracle proves Spark == DuckDB, but both sides share the same
formula — a formula bug would be invisible there. These tests recompute
each operator's answer in plain Python from the raw rows (a third,
independent implementation) and compare.
"""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from pyspark.sql import functions as F

import __spark_entry__ as em
from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL

_BOUNDS = [25.0, 50.0, 100.0, 200.0, 400.0]


def _hq_python(values, q):
    """PromQL histogram_quantile over cumulative buckets, reimplemented
    from the definition (not the SQL/Spark expression)."""
    total = len(values)
    cums = [sum(1 for v in values if v <= b) for b in _BOUNDS]
    rank = q * total
    for i, cum in enumerate(cums):
        if cum >= rank:
            lo = 0.0 if i == 0 else _BOUNDS[i - 1]
            hi = _BOUNDS[i]
            prev = 0 if i == 0 else cums[i - 1]
            if cum - prev > 0:
                return lo + (hi - lo) * (rank - prev) / (cum - prev)
            return hi
    return _BOUNDS[-1]  # +Inf bucket clamps


def test_histogram_quantile_matches_python(spark):
    ev = read_table(spark, f"{SF_SMALL}/events.parquet")
    by_type = defaultdict(list)
    for r in ev.select("event_type", "value").collect():
        by_type[r.event_type].append(r.value)
    got = {r.event_type: (r.q50, r.q90, r.q99) for r in
           em.queries()["measure_histogram_quantile"](spark, SF_SMALL)
           .collect()}
    assert set(got) == set(by_type)
    for t, vals in by_type.items():
        for gi, q in zip(range(3), (0.5, 0.9, 0.99)):
            want = _hq_python(vals, q)
            assert abs(got[t][gi] - want) < 1e-6, (t, q, got[t][gi], want)
    # sanity: the interpolated quantile brackets the exact one to within
    # one bucket width for q50
    for t, vals in by_type.items():
        vals = sorted(vals)
        exact = vals[len(vals) // 2]
        i = next((i for i, b in enumerate(_BOUNDS) if exact <= b),
                 len(_BOUNDS) - 1)
        lo = 0.0 if i == 0 else _BOUNDS[i - 1]
        hi = _BOUNDS[i]
        assert lo <= got[t][0] <= hi or abs(got[t][0] - exact) <= hi - lo


def test_alert_intervals_match_python(spark):
    ev = read_table(spark, f"{SF_SMALL}/events.parquet")
    counts = defaultdict(int)
    for r in ev.select("event_type", "ts").collect():
        bk = int(r.ts.replace(tzinfo=dt.timezone.utc).timestamp()
                 * 1_000_000) // 3_600_000_000
        counts[(r.event_type, bk)] += 1
    breached = defaultdict(list)
    for (t, bk), n in counts.items():
        if n >= 8:
            breached[t].append((bk, n))
    want = []
    for t, buckets in breached.items():
        buckets.sort()
        run = [buckets[0]]
        for bk, n in buckets[1:]:
            if bk == run[-1][0] + 1:
                run.append((bk, n))
            else:
                want.append((t, run[0][0], run[-1][0] + 1, len(run),
                             max(n for _, n in run)))
                run = [(bk, n)]
        want.append((t, run[0][0], run[-1][0] + 1, len(run),
                     max(n for _, n in run)))
    got = []
    for r in em.queries()["events_alert_intervals"](spark, SF_SMALL).collect():
        s = int(r.alert_start.replace(tzinfo=dt.timezone.utc).timestamp()
                * 1_000_000) // 3_600_000_000
        e = int(r.alert_end.replace(tzinfo=dt.timezone.utc).timestamp()
                * 1_000_000) // 3_600_000_000
        got.append((r.event_type, s, e, r.n_buckets, r.peak))
    assert sorted(got) == sorted(want)


def test_ohlc_matches_python(spark):
    ev = read_table(spark, f"{SF_SMALL}/events.parquet").where(
        F.col("event_type").isin("click", "purchase"))
    series = defaultdict(list)
    for r in ev.select("ts", "event_id", "event_type", "value").collect():
        hour = r.ts.replace(minute=0, second=0, microsecond=0)
        series[(hour, r.event_type)].append((r.ts, r.event_id, r.value))
    got = {(r.hour, r.event_type): (r.open, r.high, r.low, r.close, r.n)
           for r in em.queries()["measure_ohlc_window"](spark, SF_SMALL)
           .collect()}
    assert set(got) == set(series)
    for key, rows in series.items():
        rows.sort()  # (ts, event_id) total order
        vals = [v for _, _, v in rows]
        want = (rows[0][2], max(vals), min(vals), rows[-1][2], len(rows))
        assert got[key] == want, (key, got[key], want)


def test_keep_best_dominance_matches_python(spark):
    """Verify the RESOLUTION step independently: given the Spark-produced
    pair graph and quality scores, recompute neighbor-dominance in Python."""
    from skywalking_banyandb_spark.functions import dedup as dd
    from skywalking_banyandb_spark.functions import text as tx

    docs = read_table(spark, f"{SF_SMALL}/documents.parquet")
    pairs = [(r.a, r.b) for r in
             dd.winnow_pairs(docs, "doc_id", "text",
                             k=16, w=8, min_shared=2, df_cap=20).collect()]
    q = {r.doc_id: r.q for r in docs.select(
        "doc_id", tx.quality_score(F.col("text")).alias("q")).collect()}
    neigh = defaultdict(set)
    for a, b in pairs:
        neigh[a].add(b)
        neigh[b].add(a)
    want = sorted(
        n for n, ns in neigh.items()
        if not any((q[m] > q[n]) or (q[m] == q[n] and m < n) for m in ns))
    got = sorted(r.doc_id for r in
                 em.queries()["dedup_resolution_keep_best"](spark, SF_SMALL)
                 .collect())
    assert got == want


def test_histogram_quantile_synthetic_edges(spark):
    """Edge distributions for the bucket walk: everything in the first
    bucket, everything past the last finite boundary (+Inf clamp), exact
    boundary values, and a single-element series."""
    import duckdb

    cases = {
        "first": [1.0, 2.0, 3.0],              # all <= 25
        "inf": [450.0, 460.0, 470.0],          # all > 400 -> clamp to 400
        "bound": [25.0, 50.0, 100.0, 200.0],   # values ON boundaries
        "single": [42.0],
        "mixed": [10.0, 30.0, 60.0, 150.0, 300.0, 500.0],
    }
    rows = [(t, v) for t, vals in cases.items() for v in vals]
    df = spark.createDataFrame(rows, "event_type string, value double")

    # run the same compiled expression over the synthetic frame via a
    # DuckDB twin of the registry SQL (swap the events source)
    from skywalking_banyandb_spark import registry_observability as obs

    sql = obs._hq_sql().replace("FROM events", "FROM t")
    con = duckdb.connect()
    con.execute("CREATE TABLE t(event_type VARCHAR, value DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {r[0]: r[1:] for r in con.execute(sql).fetchall()}

    import skywalking_banyandb_spark.sources.parquet as pq

    # drive the Spark side through the same entry code path by
    # monkeypatching the table read
    orig = pq.read_table
    try:
        pq.read_table = lambda s, p: df  # noqa: E731
        obs.read_table = pq.read_table
        got = {r.event_type: (r.q50, r.q90, r.q99)
               for r in obs._histogram_quantile(spark, "ignored").collect()}
    finally:
        pq.read_table = orig
        obs.read_table = orig
    assert got == want

    # independent python expectations for the sharp edges
    assert got["inf"][2] == 400.0                  # +Inf clamp
    assert 0.0 <= got["first"][0] <= 25.0          # interpolates inside b0
    # one value in (25,50]: PromQL interpolates ACROSS the owning bucket
    # by rank fraction (25 + 25*q/1), it does not return the sample
    assert got["single"] == (37.5, 47.5, 49.75)
