"""Streaming counter-increase (stateful cross-batch chaining) must equal
the batch PromQL operator on the same rows: the per-series (last_ts,
last_value) state makes a batch-boundary-crossing delta/reset identical to
the batch pass that sees the whole series at once."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from skywalking_banyandb_spark.sources.parquet import read_table
from skywalking_banyandb_spark.streaming.counter import (
    counter_view,
    start_counter_increase_materialization,
)

from conftest import SF_SMALL


def test_streaming_counter_matches_batch(spark):
    import datetime as dt

    from skywalking_banyandb_spark.registry_observability import (
        _counter_increase_promql)

    work = tempfile.mkdtemp(prefix="counter_stream_")
    try:
        ev = read_table(spark, f"{SF_SMALL}/events.parquet")
        cut = dt.datetime(2024, 1, 15)
        # two chronological batches: the cut crosses mid-series so the
        # first batch-2 sample MUST chain off batch-1 state (delta or
        # reset decided by the carried last_value)
        ev.where(F.col("ts") < F.lit(cut)).coalesce(1) \
            .write.parquet(f"{work}/src/b0")
        ev.where(F.col("ts") >= F.lit(cut)).coalesce(1) \
            .write.parquet(f"{work}/src/b1")
        schema = spark.read.parquet(f"{work}/src/b0").schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(f"{work}/src/*"))
        q = start_counter_increase_materialization(
            spark, stream, output_path=f"{work}/out",
            checkpoint_path=f"{work}/ckpt", trigger_once=True)
        assert q.awaitTermination(timeout=300), "drain timed out"

        got = {(r.user_id, r.hour): (r.n_samples, r.n_resets,
                                     r.increase, r.rate_per_s)
               for r in counter_view(spark, f"{work}/out").collect()}
        want = {(r.user_id, r.hour): (r.n_samples, r.n_resets,
                                      r.increase, r.rate_per_s)
                for r in _counter_increase_promql(spark, SF_SMALL)
                .collect()}
        assert set(got) == set(want)
        n_cross = 0
        for k, (ns, nr, inc, rate) in want.items():
            gns, gnr, ginc, grate = got[k]
            assert (gns, gnr) == (ns, nr), k
            assert abs(ginc - inc) < 1e-6, (k, ginc, inc)
            if rate is None:
                assert grate is None, k
            else:
                assert abs(grate - rate) < 1e-6, k
        # the differential is only meaningful if some series actually
        # cross the batch cut
        crossing = [k for k in want if k[1] < dt.datetime(2024, 1, 15)]
        assert crossing and len(crossing) < len(want)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_streaming_counter_restart_resumes_state(spark):
    """Stop after batch 0, restart on the same checkpoint with batch 1
    added: the rebuilt state store must keep chaining (same totals as one
    uninterrupted run)."""
    import datetime as dt
    import time

    work = tempfile.mkdtemp(prefix="counter_restart_")
    try:
        ev = read_table(spark, f"{SF_SMALL}/events.parquet")
        cut = dt.datetime(2024, 1, 15)
        ev.where(F.col("ts") < F.lit(cut)).coalesce(1) \
            .write.parquet(f"{work}/src/b0")
        schema = spark.read.parquet(f"{work}/src/b0").schema

        def run_once():
            stream = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", "1")
                      .parquet(f"{work}/src/*"))
            q = start_counter_increase_materialization(
                spark, stream, output_path=f"{work}/out",
                checkpoint_path=f"{work}/ckpt", trigger_once=True)
            assert q.awaitTermination(timeout=300), "drain timed out"

        run_once()
        time.sleep(1.1)
        ev.where(F.col("ts") >= F.lit(cut)).coalesce(1) \
            .write.parquet(f"{work}/src/b1")
        run_once()

        from skywalking_banyandb_spark.registry_observability import (
            _counter_increase_promql)

        got = {(r.user_id, r.hour): (r.n_samples, r.n_resets)
               for r in counter_view(spark, f"{work}/out").collect()}
        want = {(r.user_id, r.hour): (r.n_samples, r.n_resets)
                for r in _counter_increase_promql(spark, SF_SMALL)
                .collect()}
        assert got == want
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_streaming_extrapolated_rate_matches_batch(spark):
    """r7: the streaming extrapolated-rate twin must equal the batch
    Prometheus estimator on the same rows — exact on counts / window
    edges / carried first value, 1e-9 on the float-chained increase and
    rate."""
    import datetime as dt

    from skywalking_banyandb_spark.registry_observability import (
        _rate_extrapolated_promql,
    )
    from skywalking_banyandb_spark.streaming.counter import (
        extrapolated_rate_view,
        start_extrapolated_rate_materialization,
    )

    work = tempfile.mkdtemp(prefix="extrap_stream_")
    try:
        ev = read_table(spark, f"{SF_SMALL}/events.parquet")
        cut = dt.datetime(2024, 1, 15)
        ev.where(F.col("ts") < F.lit(cut)).coalesce(1) \
            .write.parquet(f"{work}/src/b0")
        ev.where(F.col("ts") >= F.lit(cut)).coalesce(1) \
            .write.parquet(f"{work}/src/b1")
        schema = spark.read.parquet(f"{work}/src/b0").schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(f"{work}/src/*"))
        q = start_extrapolated_rate_materialization(
            spark, stream, output_path=f"{work}/out",
            checkpoint_path=f"{work}/ckpt", trigger_once=True)
        assert q.awaitTermination(timeout=300), "drain timed out"

        got = {(r.user_id, r.hour): r
               for r in extrapolated_rate_view(
                   spark, f"{work}/out").collect()}
        want = {(r.user_id, r.hour): r
                for r in _rate_extrapolated_promql(
                    spark, SF_SMALL).collect()}
        assert set(got) == set(want) and len(want) > 0
        for k, w in want.items():
            g = got[k]
            assert g.n_samples == w.n_samples, k
            assert abs(g.increase - w.increase) < 1e-9, (k, g.increase,
                                                         w.increase)
            assert abs(g.rate_per_s - w.rate_per_s) < 1e-12, k
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_streaming_extrapolated_rate_restart_resumes_state(spark):
    """Restart on the same checkpoint mid-corpus: the rebuilt per-series
    state keeps the in-window chain exact — same estimator inputs as one
    uninterrupted run (exact columns compared; float raw covered by the
    batch differential above)."""
    import datetime as dt
    import time

    from skywalking_banyandb_spark.registry_observability import (
        _rate_extrapolated_promql,
    )
    from skywalking_banyandb_spark.streaming.counter import (
        extrapolated_rate_view,
        start_extrapolated_rate_materialization,
    )

    work = tempfile.mkdtemp(prefix="extrap_restart_")
    try:
        ev = read_table(spark, f"{SF_SMALL}/events.parquet")
        cut = dt.datetime(2024, 1, 15)
        ev.where(F.col("ts") < F.lit(cut)).coalesce(1) \
            .write.parquet(f"{work}/src/b0")
        schema = spark.read.parquet(f"{work}/src/b0").schema

        def run_once():
            stream = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", "1")
                      .parquet(f"{work}/src/*"))
            q = start_extrapolated_rate_materialization(
                spark, stream, output_path=f"{work}/out",
                checkpoint_path=f"{work}/ckpt", trigger_once=True)
            assert q.awaitTermination(timeout=300), "drain timed out"

        run_once()
        time.sleep(1.1)
        ev.where(F.col("ts") >= F.lit(cut)).coalesce(1) \
            .write.parquet(f"{work}/src/b1")
        run_once()

        got = {(r.user_id, r.hour): (r.n_samples, r.first_us, r.last_us,
                                     r.first_v, r.increase)
               for r in extrapolated_rate_view(
                   spark, f"{work}/out").collect()}

        # one uninterrupted run over the same two batches
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .parquet(f"{work}/src/*"))
        q = start_extrapolated_rate_materialization(
            spark, stream, output_path=f"{work}/out2",
            checkpoint_path=f"{work}/ckpt2", trigger_once=True)
        assert q.awaitTermination(timeout=300), "drain timed out"
        want = {(r.user_id, r.hour): (r.n_samples, r.first_us, r.last_us,
                                      r.first_v, r.increase)
                for r in extrapolated_rate_view(
                    spark, f"{work}/out2").collect()}
        assert got == want and len(want) > 0
        # and the batch operator agrees on the window set
        batch_keys = {(r.user_id, r.hour) for r in
                      _rate_extrapolated_promql(spark, SF_SMALL).collect()}
        assert set(got) == batch_keys
    finally:
        shutil.rmtree(work, ignore_errors=True)
