"""Streaming proofs for the round-4 window extensions: hopping (sliding)
windows and session windows computed by Structured Streaming must agree
with their batch twins (the oracle-paired `measure_hopping_window` /
`events_session_window` registry entries).

The reference's flow engine is tumbling-only
(pkg/flow/streaming/sliding_window.go:255 NewTumblingTimeWindows); hopping
and session windows are Spark Structured Streaming natives this engine
exposes on top of the same ingest path.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from skywalking_banyandb_spark.sources.parquet import read_table
from skywalking_banyandb_spark.streaming.topn_stream import ensure_event_time

from conftest import SF_SMALL
import pytest


def _drain(q, timeout=300):
    if not q.awaitTermination(timeout=timeout):
        q.stop()
        raise RuntimeError("streaming window test timed out")


def test_streaming_hopping_window_matches_batch(spark):
    """15m/5m hopping-window counts over a 3-micro-batch drain (complete
    mode) equal the batch F.window(size, slide) aggregation."""
    work = tempfile.mkdtemp(prefix="hop_stream_")
    src = os.path.join(work, "src")
    try:
        ev = read_table(spark, f"{SF_SMALL}/events.parquet").where(
            F.col("event_type") == "error")
        for i, p in enumerate([ev.where(F.col("user_id") % 3 == k)
                               for k in (1, 2, 0)]):
            p.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(src, f"b{i}"))

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src, "*"))
        )
        agg = (
            ensure_event_time(stream, "ts")
            .groupBy(F.window(F.col("ts"), "15 minutes", "5 minutes")
                     .getField("start").alias("win_start"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (agg.writeStream.outputMode("complete")
             .format("memory").queryName("hop_out")
             .trigger(availableNow=True).start())
        _drain(q)

        got = sorted(
            (r.win_start.isoformat(), r.n)
            for r in spark.sql("SELECT * FROM hop_out").collect()
        )
        want = sorted(
            (r.win_start.isoformat(), r.n)
            for r in (
                ev.groupBy(F.window(F.col("ts").cast("timestamp"),
                                    "15 minutes", "5 minutes")
                           .getField("start").alias("win_start"))
                .agg(F.count(F.lit(1)).alias("n"))
                .collect())
        )
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.catalog.dropTempView("hop_out")


def test_streaming_session_window_matches_batch(spark):
    """Session windows (30m gap) in append mode with a watermark: a
    far-future sentinel row per user flushes every real session past the
    watermark; the emitted sessions equal the batch session_window
    aggregation."""
    work = tempfile.mkdtemp(prefix="sess_stream_")
    src = os.path.join(work, "src")
    try:
        ev = read_table(spark, f"{SF_SMALL}/events.parquet").where(
            F.col("user_id") < 30)
        cols = ["user_id", "ts"]
        base = ev.select(*cols)
        sentinel = (base.groupBy("user_id")
                    .agg(F.max("ts").alias("ts"))
                    .select("user_id",
                            (F.col("ts") + F.expr("INTERVAL 365 DAYS"))
                            .alias("ts")))
        base.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, "b0"))
        sentinel.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, "b1"))

        stream = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src, "*"))
        )
        agg = (
            ensure_event_time(stream, "ts")
            .withWatermark("ts", "1 minute")
            .groupBy("user_id", F.session_window(F.col("ts"), "30 minutes"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id",
                    F.col("session_window").getField("start")
                    .alias("session_start"), "n_events")
        )
        q = (agg.writeStream.outputMode("append")
             .format("memory").queryName("sess_out")
             .trigger(availableNow=True).start())
        _drain(q)

        cutoff = ev.agg(F.max("ts")).head()[0]
        got = sorted(
            (r.user_id, r.session_start.isoformat(), r.n_events)
            for r in spark.sql("SELECT * FROM sess_out").collect()
            if r.session_start.replace(tzinfo=None) <= cutoff
        )
        want = sorted(
            (r.user_id, r.session_start.isoformat(), r.n_events)
            for r in (
                base.groupBy("user_id",
                             F.session_window(F.col("ts").cast("timestamp"),
                                              "30 minutes"))
                .agg(F.count(F.lit(1)).alias("n_events"))
                .select("user_id",
                        F.col("session_window").getField("start")
                        .alias("session_start"), "n_events")
                .collect())
        )
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.catalog.dropTempView("sess_out")


def test_interval_join_restart_resume(spark):
    """The stream-stream interval join must resume from its checkpoint:
    drain batch 0, STOP the query, add batch 1, start a NEW query on the
    same checkpoint/output — the union of appends must equal the batch
    join over all data, with no duplicated matches from re-processing."""
    import shutil
    import tempfile
    import time

    import duckdb
    from pyspark.sql import functions as F

    from skywalking_banyandb_spark.sources.parquet import read_table
    from skywalking_banyandb_spark.streaming.interval_join import (
        start_interval_join_materialization,
    )

    import datetime as dt

    t3, t5, t6 = (dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 5),
                  dt.datetime(2024, 1, 6))
    work = tempfile.mkdtemp(prefix="ij_restart_")
    try:
        ev = read_table(spark, f"{SF_SMALL}/events.parquet")
        ts = F.col("ts")
        b0 = ev.where((ts >= F.lit(t3)) & (ts < F.lit(t5)))
        b1 = ev.where((ts >= F.lit(t5)) & (ts < F.lit(t6)))
        b0.coalesce(1).write.parquet(f"{work}/src/b0")
        schema = spark.read.parquet(f"{work}/src/b0").schema

        def run_once():
            stream = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", "1")
                      .parquet(f"{work}/src/*"))
            q = start_interval_join_materialization(
                spark, stream, output_path=f"{work}/out",
                checkpoint_path=f"{work}/ckpt", trigger_once=True)
            assert q.awaitTermination(timeout=300), "drain timed out"

        run_once()                      # first incarnation: batch 0 only
        time.sleep(1.1)
        b1.coalesce(1).write.parquet(f"{work}/src/b1")
        run_once()                      # restart: resumes, processes b1

        got = sorted(
            (r.user_id, r.s_event_id, r.p_event_id)
            for r in spark.read.parquet(f"{work}/out").collect())

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'")
        want = sorted(con.execute("""
            SELECT s.user_id, s.event_id, p.event_id
            FROM events s JOIN events p
              ON p.user_id = s.user_id
             AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 24 HOURS
            WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
              AND s.ts >= TIMESTAMP '2024-01-03' AND s.ts < TIMESTAMP '2024-01-06'
              AND p.ts >= TIMESTAMP '2024-01-03' AND p.ts < TIMESTAMP '2024-01-06'
        """).fetchall())
        assert got == [tuple(r) for r in want]
        assert len(got) == len(set(got)), "restart duplicated matches"
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_interval_join_left_outer_unmatched_emitted(spark):
    """leftOuter mode: every signup appears exactly once per match OR once
    null-padded if no purchase followed within the horizon; the matched
    subset equals the inner join; unmatched = batch anti-join."""
    import shutil
    import tempfile

    import duckdb
    from pyspark.sql import functions as F

    from skywalking_banyandb_spark.sources.parquet import read_table
    from skywalking_banyandb_spark.streaming.interval_join import (
        start_interval_join_materialization,
    )

    import datetime as dt

    t3, t6 = dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 6)
    work = tempfile.mkdtemp(prefix="ij_louter_")
    try:
        ev = read_table(spark, f"{SF_SMALL}/events.parquet")
        ts = F.col("ts")
        # one batch + far-future watermark flushers so every left row's
        # horizon closes and unmatched rows actually emit in availableNow.
        # The flushers must SURVIVE the type filters (one signup + one
        # purchase — outer emission waits on the MIN of both sides'
        # watermarks) and carry sentinel ids outside the asserted domain.
        b0 = ev.where((ts >= F.lit(t3)) & (ts < F.lit(t6)))
        far = F.lit(dt.datetime(2024, 3, 1)).cast("timestamp")
        flush = (ev.limit(1)
                 .withColumn("ts", far)
                 .withColumn("user_id", F.lit(-1).cast("long"))
                 .withColumn("event_id", F.lit(10**9).cast("long")))
        flushers = (flush.withColumn("event_type", F.lit("signup"))
                    .unionByName(
                        flush.withColumn("event_type", F.lit("purchase"))
                        .withColumn("event_id", F.lit(10**9 + 1).cast("long"))))
        b0.unionByName(flushers).coalesce(1).write.parquet(f"{work}/src/b0")
        schema = spark.read.parquet(f"{work}/src/b0").schema
        stream = (spark.readStream.schema(schema)
                  .parquet(f"{work}/src/*"))
        q = start_interval_join_materialization(
            spark, stream, output_path=f"{work}/out",
            checkpoint_path=f"{work}/ckpt", trigger_once=True,
            join_type="leftOuter")
        assert q.awaitTermination(timeout=300), "drain timed out"

        out = spark.read.parquet(f"{work}/out").where(
            F.col("s_event_id") < 10**9)  # drop the sentinel flushers
        got_matched = sorted(
            (r.user_id, r.s_event_id, r.p_event_id)
            for r in out.where(F.col("p_event_id").isNotNull()).collect())
        got_unmatched = sorted(
            r.s_event_id
            for r in out.where(F.col("p_event_id").isNull()).collect())

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'")
        inner = con.execute("""
            SELECT s.user_id, s.event_id, p.event_id
            FROM events s JOIN events p
              ON p.user_id = s.user_id
             AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 24 HOURS
            WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
              AND s.ts >= TIMESTAMP '2024-01-03' AND s.ts < TIMESTAMP '2024-01-06'
              AND p.ts >= TIMESTAMP '2024-01-03' AND p.ts < TIMESTAMP '2024-01-06'
        """).fetchall()
        anti = con.execute("""
            SELECT s.event_id FROM events s
            WHERE s.event_type = 'signup'
              AND s.ts >= TIMESTAMP '2024-01-03' AND s.ts < TIMESTAMP '2024-01-06'
              AND NOT EXISTS (
                SELECT 1 FROM events p
                WHERE p.event_type = 'purchase' AND p.user_id = s.user_id
                  AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 24 HOURS
                  AND p.ts >= TIMESTAMP '2024-01-03'
                  AND p.ts < TIMESTAMP '2024-01-06')
        """).fetchall()
        assert got_matched == sorted(tuple(r) for r in inner)
        assert got_unmatched == sorted(r[0] for r in anti)
        assert got_unmatched, "test vacuous: every signup matched"
    finally:
        shutil.rmtree(work, ignore_errors=True)


@pytest.mark.soak
def test_interval_join_hot_key_soak(spark):
    """Hot-key soak (VERDICT r5 #4): ONE user emits ~100x the median rate.
    The join must (a) survive the skewed drain, (b) produce the exact batch
    answer, and (c) keep TOTAL state within the rate x horizon bound — the
    watermark must keep evicting even though one partition holds the hot
    key's entire share (the per-key ceiling documented in
    streaming/interval_join.py)."""
    import datetime as dt
    import shutil
    import tempfile

    import duckdb

    from skywalking_banyandb_spark.streaming.interval_join import (
        start_interval_join_materialization,
    )

    t0 = dt.datetime(2024, 1, 1)
    horizon_h, lateness_h = 2, 1  # short horizon so eviction is visible
    rows = []
    eid = 0
    # 20 cold users: one signup + one purchase per day over 6 days
    for day in range(6):
        for u in range(1, 21):
            rows.append((eid, t0 + dt.timedelta(days=day, minutes=u),
                         u, "signup", 1.0)); eid += 1
            rows.append((eid, t0 + dt.timedelta(days=day, minutes=u + 30),
                         u, "purchase", 2.0)); eid += 1
    # the hot user 0: ~100x the median per-user rate, every ~4 minutes
    for k in range(6 * 24 * 15):
        rows.append((eid, t0 + dt.timedelta(minutes=4 * k),
                     0, "signup" if k % 2 else "purchase", 3.0)); eid += 1
    work = tempfile.mkdtemp(prefix="ij_hot_")
    try:
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double")
        # 3 chronological batch files -> 3+ micro-batches
        cut1, cut2 = (t0 + dt.timedelta(days=2), t0 + dt.timedelta(days=4))
        df.where(F.col("ts") < cut1).coalesce(1).write.parquet(f"{work}/src/b0")
        df.where((F.col("ts") >= cut1) & (F.col("ts") < cut2)) \
            .coalesce(1).write.parquet(f"{work}/src/b1")
        df.where(F.col("ts") >= cut2).coalesce(1).write.parquet(f"{work}/src/b2")
        schema = spark.read.parquet(f"{work}/src/b0").schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(f"{work}/src/*"))
        q = start_interval_join_materialization(
            spark, stream, output_path=f"{work}/out",
            checkpoint_path=f"{work}/ckpt",
            horizon=f"{horizon_h} hours", lateness=f"{lateness_h} hour",
            trigger_once=True)
        assert q.awaitTermination(timeout=300), "hot-key drain timed out"
        progresses = [p for p in q.recentProgress
                      if p and p.get("stateOperators")]
        assert progresses, "no state-operator progress recorded"
        final = progresses[-1]["stateOperators"][0]["numRowsTotal"]
        # rate x horizon bound: retained state can only hold rows whose
        # eviction horizon is still open at the final watermark, i.e. rows
        # in the trailing (horizon + lateness + 1h slack) of event time —
        # NOT the whole history (6 days x hot rate). Compute the bound from
        # the actual data: with ~15 hot rows/h, bound ~ 4h x 15 + cold
        # stragglers << total.
        max_ts = max(r[1] for r in rows)
        window = dt.timedelta(hours=horizon_h + lateness_h + 1)
        bound = sum(1 for r in rows if r[1] >= max_ts - window)
        total = len(rows)
        assert final <= bound, (final, bound)
        assert bound < total / 5, "soak data does not exercise eviction"
        # exactness under skew: output equals the DuckDB batch join
        got = sorted((r.user_id, r.s_event_id, r.p_event_id) for r in
                     spark.read.parquet(f"{work}/out").collect())
        con = duckdb.connect()
        con.execute(f"CREATE VIEW e AS SELECT * FROM '{work}/src/*/*.parquet'")
        want = sorted(tuple(r) for r in con.execute(f"""
            SELECT s.user_id, s.event_id, p.event_id
            FROM e s JOIN e p ON p.user_id = s.user_id
             AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL {horizon_h} HOURS
            WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
        """).fetchall())
        assert got == want
    finally:
        shutil.rmtree(work, ignore_errors=True)
