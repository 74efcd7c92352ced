"""Streaming ingestion tests: a Structured Streaming source drained with
``availableNow`` must land data in the exact segment layout the batch writer
produces, so the measure/stream read paths work unchanged on stream-written
data (write.proto client-stream analogue; see streaming/ingest.py)."""

from __future__ import annotations

import dataclasses
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.model import (
    AggFunc,
    AggregationSpec,
    MeasureQuery,
    TimeRange,
)
from skywalking_banyandb_spark.plans.measure import compile_measure
from skywalking_banyandb_spark.sources.parquet import read_table
from skywalking_banyandb_spark.streaming.ingest import start_measure_ingest

from conftest import SF_SMALL


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="stream_ingest_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_ingest_equals_batch_write(spark, workdir):
    cat = default_catalog(SF_SMALL)
    schema = cat.get("g1", "measure", "metrics")
    ev = read_table(spark, f"{SF_SMALL}/events.parquet")

    src_dir = os.path.join(workdir, "incoming")
    out_dir = os.path.join(workdir, "metrics")
    ckpt_dir = os.path.join(workdir, "ckpt")
    # land the source as two files so the drain sees multiple input splits
    ev.repartition(2).write.parquet(src_dir)

    source = spark.readStream.schema(ev.schema).parquet(src_dir)
    q = start_measure_ingest(source, schema, out_dir, ckpt_dir, trigger_once=True)
    q.awaitTermination(120)
    assert not q.isActive

    back = spark.read.parquet(out_dir)
    assert back.count() == ev.count()
    # same segment layout as the batch writer: day buckets on disk
    assert any(p.startswith("ts_bucket=") for p in os.listdir(out_dir))

    # the normal measure read path (version dedup + agg) runs unchanged over
    # stream-written segments
    stream_cat = default_catalog(SF_SMALL)
    stream_cat.register(dataclasses.replace(schema, paths=(out_dir,)))
    mq = MeasureQuery(
        groups=["g1"], name="metrics",
        time_range=TimeRange.of("2024-01-01T00:00:00", "2024-02-01T00:00:00"),
        group_by=["event_type"], agg=AggregationSpec(AggFunc.COUNT, "value"),
        limit=100000,
    )
    got = {r.event_type: r.value for r in
           compile_measure(spark, stream_cat, mq).collect()}
    want = {r.event_type: r.value for r in
            compile_measure(spark, cat, mq).collect()}
    assert got == want


def test_stream_ingest_incremental_batches(spark, workdir):
    """A second drain after new files arrive appends only the delta (the
    checkpoint tracks consumed files — LSM-style append parts)."""
    cat = default_catalog(SF_SMALL)
    schema = cat.get("g1", "measure", "metrics")
    ev = read_table(spark, f"{SF_SMALL}/events.parquet").limit(500).cache()
    half1 = ev.where(F.col("user_id") % 2 == 0)
    half2 = ev.where(F.col("user_id") % 2 == 1)

    src_dir = os.path.join(workdir, "incoming")
    out_dir = os.path.join(workdir, "metrics")
    ckpt_dir = os.path.join(workdir, "ckpt")
    os.makedirs(src_dir, exist_ok=True)

    half1.write.mode("append").parquet(src_dir)
    source = spark.readStream.schema(ev.schema).parquet(src_dir)
    q = start_measure_ingest(source, schema, out_dir, ckpt_dir, trigger_once=True)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == half1.count()

    half2.write.mode("append").parquet(src_dir)
    source = spark.readStream.schema(ev.schema).parquet(src_dir)
    q = start_measure_ingest(source, schema, out_dir, ckpt_dir, trigger_once=True)
    q.awaitTermination(120)
    n2 = spark.read.parquet(out_dir).count()
    assert n2 == ev.count()


def test_streaming_exact_dedup(spark, workdir):
    """Duplicate documents arriving across micro-batches within the
    watermark horizon are emitted exactly once, keyed by content
    fingerprint; the surviving set equals the batch exact-dedup."""
    import datetime as dt

    from pyspark.sql import functions as F

    from skywalking_banyandb_spark.functions.dedup import exact_dedup
    from skywalking_banyandb_spark.streaming.ingest import (
        streaming_exact_dedup,
    )

    t0 = dt.datetime(2024, 1, 1, 12)
    rows = [
        (1, "alpha beta", t0),
        (2, "alpha beta", t0 + dt.timedelta(minutes=1)),   # dup of 1
        (3, "gamma delta", t0 + dt.timedelta(minutes=2)),
        (4, "alpha beta", t0 + dt.timedelta(minutes=3)),   # dup of 1
        (5, "epsilon", t0 + dt.timedelta(minutes=4)),
    ]
    src_dir = os.path.join(workdir, "docs_src")
    df = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    df.coalesce(1).write.parquet(src_dir)

    source = spark.readStream.schema(df.schema).parquet(src_dir)
    deduped = streaming_exact_dedup(source, "doc_id", "text", "ts")
    out_dir = os.path.join(workdir, "docs_out")
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(workdir, "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    # one survivor per distinct content; batch dedup agrees on the count
    assert got.count() == 3
    texts = {r.text for r in got.collect()}
    assert texts == {"alpha beta", "gamma delta", "epsilon"}
    assert exact_dedup(df, "doc_id", "text").count() == 3
