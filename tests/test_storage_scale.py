"""Scale-path storage tests: the bucketed layout must make version dedup and
entity group-by shuffle-free (no Exchange in the physical plan), and segment
compaction must reduce file counts without changing query results."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.operators.dedup import latest_version
from skywalking_banyandb_spark.sources.parquet import read_table
from skywalking_banyandb_spark.sources.writer import (
    compact_segments,
    write_measure,
    write_measure_bucketed,
)

from conftest import SF_SMALL


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="storage_scale_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_layout_dedup_without_shuffle(spark, workdir):
    cat = default_catalog(SF_SMALL)
    schema = cat.get("g1", "measure", "metrics")
    ev = read_table(spark, f"{SF_SMALL}/events.parquet")

    spark.sql("DROP TABLE IF EXISTS metrics_bucketed")
    write_measure_bucketed(ev, schema, "metrics_bucketed", buckets=8)
    try:
        t = spark.table("metrics_bucketed")

        # (entity, ts) version dedup: the bucket hash distribution on
        # user_id satisfies the clustered distribution -> no Exchange
        deduped = latest_version(t, schema.entity, schema.ts_column, "event_id")
        plan = _plan(deduped)
        assert "Exchange" not in plan, plan

        # ...and the entity group-by after dedup is also shuffle-free
        agg = deduped.groupBy("user_id").agg(F.max("value").alias("value"))
        plan = _plan(agg)
        assert "Exchange" not in plan, plan

        # results identical to the unbucketed path
        got = {(r.user_id, r.value) for r in agg.collect()}
        want_df = latest_version(
            ev, schema.entity, schema.ts_column, "event_id"
        ).groupBy("user_id").agg(F.max("value").alias("value"))
        want = {(r.user_id, r.value) for r in want_df.collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS metrics_bucketed")


def test_compact_segments_merges_small_parts(spark, workdir):
    cat = default_catalog(SF_SMALL)
    schema = cat.get("g1", "measure", "metrics")
    ev = read_table(spark, f"{SF_SMALL}/events.parquet").limit(2000).cache()
    path = os.path.join(workdir, "metrics")

    # two append rounds -> >=2 part files per touched segment (LSM parts)
    half1 = ev.where(F.col("user_id") % 2 == 0)
    half2 = ev.where(F.col("user_id") % 2 == 1)
    write_measure(half1, schema, path)
    write_measure(half2, schema, path)

    def seg_files():
        return {
            seg: len(glob.glob(os.path.join(path, seg, "*.parquet")))
            for seg in os.listdir(path)
            if seg.startswith("ts_bucket=")
        }

    before = seg_files()
    assert any(n > 1 for n in before.values()), before

    before_rows = sorted(
        tuple(r) for r in spark.read.parquet(path).drop("ts_bucket").collect()
    )
    n = compact_segments(spark, schema, path, target_files=1)
    assert n == sum(1 for v in before.values() if v > 1)

    after = seg_files()
    assert all(v == 1 for v in after.values()), after
    after_rows = sorted(
        tuple(r) for r in spark.read.parquet(path).drop("ts_bucket").collect()
    )
    assert before_rows == after_rows


def test_engine_reads_bucketed_table_shuffle_free(spark, workdir):
    import dataclasses

    cat = default_catalog(SF_SMALL)
    schema = cat.get("g1", "measure", "metrics")
    ev = read_table(spark, f"{SF_SMALL}/events.parquet")

    spark.sql("DROP TABLE IF EXISTS metrics_engine_bucketed")
    write_measure_bucketed(ev, schema, "metrics_engine_bucketed", buckets=8)
    try:
        from skywalking_banyandb_spark.model import (
            AggFunc, AggregationSpec, MeasureQuery, TimeRange,
        )
        from skywalking_banyandb_spark.plans.measure import compile_measure

        bcat = default_catalog(SF_SMALL)
        bcat.register(dataclasses.replace(schema, table="metrics_engine_bucketed"))
        q = MeasureQuery(
            groups=["g1"], name="metrics",
            time_range=TimeRange.of("2024-01-03T00:00:00", "2024-01-27T00:00:00"),
            group_by=["user_id"], agg=AggregationSpec(AggFunc.MAX, "value"),
            limit=100000,
        )
        bdf = compile_measure(spark, bcat, q)
        # group key == entity == bucket key: the whole dedup+agg pipeline
        # runs on the persisted distribution, no Exchange anywhere
        plan = _plan(bdf)
        assert "Exchange" not in plan, plan

        got = {(r.user_id, r.value) for r in bdf.collect()}
        want = {(r.user_id, r.value) for r in
                compile_measure(spark, cat, q).collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS metrics_engine_bucketed")


def test_segment_layout_partition_pruning_from_time_range(spark, workdir):
    import dataclasses

    cat = default_catalog(SF_SMALL)
    schema = cat.get("g1", "measure", "metrics")
    ev = read_table(spark, f"{SF_SMALL}/events.parquet")
    path = os.path.join(workdir, "metrics_seg")
    write_measure(ev, schema, path)

    from skywalking_banyandb_spark.model import MeasureQuery, TimeRange
    from skywalking_banyandb_spark.plans.measure import compile_measure

    scat = default_catalog(SF_SMALL)
    scat.register(dataclasses.replace(schema, paths=(path,)))
    q = MeasureQuery(
        groups=["g1"], name="metrics",
        time_range=TimeRange.of("2024-01-10T00:00:00", "2024-01-12T00:00:00"),
        limit=100000,
    )
    df = compile_measure(spark, scat, q)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the time range must become ts_bucket partition filters (segment pruning)
    assert "PartitionFilters: [" in plan and "ts_bucket" in plan, plan

    # and the result matches the raw-parquet path on the same range
    base = compile_measure(spark, cat, q)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, base.collect()))


def test_hour_granularity_segment_pruning(spark, workdir):
    import dataclasses

    cat = default_catalog(SF_SMALL)
    schema = cat.get("g1", "measure", "metrics")
    ev = read_table(spark, f"{SF_SMALL}/events.parquet")
    path = os.path.join(workdir, "metrics_hourly")
    write_measure(ev, schema, path, segment_interval="HOUR")

    # hour buckets on disk
    bucket_dirs = [d for d in os.listdir(path) if d.startswith("ts_bucket=")]
    assert len(bucket_dirs) > 30, bucket_dirs[:3]

    from skywalking_banyandb_spark.model import MeasureQuery, TimeRange
    from skywalking_banyandb_spark.plans.measure import compile_measure

    scat = default_catalog(SF_SMALL)
    scat.register(dataclasses.replace(schema, paths=(path,)))
    # range starting mid-day: the day-truncated lower bucket bound is
    # conservative but correct for hour buckets
    q = MeasureQuery(
        groups=["g1"], name="metrics",
        time_range=TimeRange.of("2024-01-10T06:30:00", "2024-01-10T18:00:00"),
        limit=100000,
    )
    df = compile_measure(spark, scat, q)
    base = compile_measure(spark, cat, q)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, base.collect()))


def test_topn_routes_to_materialized_table(spark, workdir):
    """SHOW TOP routing (topn_analyzer.go): with a maintained _top_n_result
    table, the TopN read path scans it instead of the source measure, and
    results equal the recompute path."""
    import dataclasses

    from skywalking_banyandb_spark.model import Sort, TimeRange, TopNQuery
    from skywalking_banyandb_spark.plans.topn import compile_topn, materialize_topn

    cat = default_catalog(SF_SMALL)
    schema = cat.get("g1", "measure", "metrics")
    mat_path = os.path.join(workdir, "topn_result")
    # maintain with a larger N than the query asks for (counters_number)
    materialize_topn(spark, schema, "value", 10, "1 hour", Sort.DESC) \
        .write.parquet(mat_path)

    mcat = default_catalog(SF_SMALL)
    mcat.register(dataclasses.replace(schema, topn_path=mat_path))
    q = TopNQuery(
        groups=["g1"], name="metrics",
        time_range=TimeRange.of("2024-01-03T00:00:00", "2024-01-08T00:00:00"),
        top_n=3, sort=Sort.DESC,
    )
    routed = compile_topn(spark, mcat, q)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "topn_result" in plan          # scans the materialization...
    assert "events.parquet" not in plan   # ...not the source measure

    recomputed = compile_topn(spark, cat, q)
    assert sorted(map(tuple, routed.collect())) == \
           sorted(map(tuple, recomputed.collect()))
