"""Write-path tests: segment layout round-trip, partition pruning visible in
the plan, property CRUD, TTL retention."""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from skywalking_banyandb_spark.catalog import (
    MeasureSchema,
    PropertySchema,
    TagSpec,
    FieldSpec,
    default_catalog,
)
from skywalking_banyandb_spark.sources.parquet import read_table
from skywalking_banyandb_spark.sources.writer import (
    apply_ttl,
    property_apply,
    property_delete,
    write_measure,
)

from conftest import SF_SMALL


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="writepath_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_measure_roundtrip_and_pruning(spark, workdir):
    cat = default_catalog(SF_SMALL)
    schema = cat.get("g1", "measure", "metrics")
    ev = read_table(spark, f"{SF_SMALL}/events.parquet")
    path = os.path.join(workdir, "metrics")
    write_measure(ev, schema, path)

    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    # day-partitioned layout on disk
    assert any(p.startswith("ts_bucket=") for p in os.listdir(path))

    # time-range query must partition-prune: plan shows partition filters on
    # ts_bucket, and only matching buckets are scanned
    q = back.where(
        (F.col("ts_bucket") >= "2024-01-10") & (F.col("ts_bucket") < "2024-01-12")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    days = {r.d for r in q.select(F.date_trunc("day", "ts").alias("d")).distinct().collect()}
    assert days == {dt.datetime(2024, 1, 10), dt.datetime(2024, 1, 11)}


def test_property_apply_and_delete(spark, workdir):
    path = os.path.join(workdir, "props")
    schema = PropertySchema(
        group="g", name="p", paths=(path,), id_column="id",
        tags=(TagSpec("v", "STRING"),),
    )
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    property_apply(spark, schema, df1, path)
    df2 = spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string")
    property_apply(spark, schema, df2, path)

    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}  # upsert replaced id=2

    property_delete(spark, schema, [1, 3], path)
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {2: "B"}


def test_ttl_retention(spark):
    ev = read_table(spark, f"{SF_SMALL}/events.parquet")
    now = dt.datetime(2024, 1, 31)
    kept = apply_ttl(ev, "ts", ttl_days=7, now=now)
    assert kept.count() > 0
    assert kept.agg(F.min("ts")).head()[0] >= now - dt.timedelta(days=7)
    assert kept.count() < ev.count()


def test_drop_expired_segments(spark, workdir):
    """Physical TTL: whole expired ts_bucket directories are removed;
    surviving data and the boundary segment stay intact."""
    import datetime as dt

    from skywalking_banyandb_spark.sources.writer import drop_expired_segments

    cat = default_catalog(SF_SMALL)
    schema = cat.get("g1", "measure", "metrics")
    ev = read_table(spark, f"{SF_SMALL}/events.parquet")
    path = os.path.join(workdir, "metrics_ttl")
    write_measure(ev, schema, path)

    before = {d for d in os.listdir(path) if d.startswith("ts_bucket=")}
    # data spans 2024-01; retain 10 days as of 2024-01-31 -> drop < 2024-01-20
    now = dt.datetime(2024, 1, 31)
    n = drop_expired_segments(path, ttl_days=10, now=now)
    after = {d for d in os.listdir(path) if d.startswith("ts_bucket=")}
    assert n == len(before) - len(after) and n > 0
    # every surviving row is within (or on the boundary of) the window
    remaining = spark.read.parquet(path)
    min_ts = remaining.agg(F.min("ts")).head()[0]
    assert min_ts >= dt.datetime(2024, 1, 20)
    # expired rows are gone, recent rows intact
    keep_want = ev.where(F.col("ts") >= F.lit(dt.datetime(2024, 1, 21))).count()
    keep_got = remaining.where(F.col("ts") >= F.lit(dt.datetime(2024, 1, 21))).count()
    assert keep_got == keep_want


def test_backup_restore_roundtrip(spark, workdir):
    """banyand/backup analogue: time-dir backup is incremental; restore
    swaps the snapshot back in atomically and the data reads identically."""
    import datetime as dt

    from skywalking_banyandb_spark.sources.backup import (
        backup,
        list_backups,
        restore,
    )
    from skywalking_banyandb_spark.sources.writer import drop_expired_segments

    cat = default_catalog(SF_SMALL)
    schema = cat.get("g1", "measure", "metrics")
    ev = read_table(spark, f"{SF_SMALL}/events.parquet")
    path = os.path.join(workdir, "metrics_bk")
    broot = os.path.join(workdir, "backups")
    write_measure(ev, schema, path)
    total = spark.read.parquet(path).count()

    tdir = backup(path, broot, now=dt.datetime(2024, 2, 1))
    assert list_backups(broot) == [tdir] == ["2024-02-01"]
    # incremental: a second run copies nothing new (same tree)
    assert backup(path, broot, now=dt.datetime(2024, 2, 1)) == tdir

    # damage the live data (simulated retention overshoot), then restore
    drop_expired_segments(path, ttl_days=1, now=dt.datetime(2024, 1, 31))
    assert spark.read.parquet(path).count() < total
    restored = restore(broot, path)
    assert restored == tdir
    assert spark.read.parquet(path).count() == total


def test_write_stream_materializes_derived_tags(spark, tmp_path):
    """Write-time derived-tag materialization: the stored segment carries
    the token column physically; a stream schema pointed at it reads the
    STORED column (materialize_derived skips existing columns), and query
    results are identical to the read-time-computed form."""
    import dataclasses

    from pyspark.sql import functions as F

    from skywalking_banyandb_spark.catalog import default_catalog
    from skywalking_banyandb_spark.model import (
        BinaryOp,
        StreamQuery,
        TimeRange,
        cond,
    )
    from skywalking_banyandb_spark.plans.stream import compile_stream
    from skywalking_banyandb_spark.sources.parquet import read_table
    from skywalking_banyandb_spark.sources.writer import write_stream

    cat = default_catalog(SF_SMALL)
    schema = cat.get("g1", "stream", "event_log")
    src = read_table(spark, f"{SF_SMALL}/events.parquet")
    out = str(tmp_path / "seg")
    write_stream(src, schema, out, mode="overwrite",
                 materialize_derived_tags=True)

    stored = spark.read.parquet(out)
    assert "props_tokens" in stored.columns  # physically present

    written_schema = dataclasses.replace(schema, paths=(out,))
    q = StreamQuery(
        groups=["g1"], name="event_log",
        time_range=TimeRange.of("2024-01-03T00:00:00", "2024-01-27T00:00:00"),
        criteria=cond("props_tokens", BinaryOp.HAVING, ["k", "69"]),
        projection=["user_id", "props_tokens"], limit=500,
    )
    from skywalking_banyandb_spark.catalog import Catalog

    cat2 = Catalog(); cat2.register(written_schema)
    got = compile_stream(spark, cat2, q)
    want = compile_stream(spark, cat, q)
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.collect())
    assert g == w and len(g) > 0


def test_index_mode_time_range_strict_under_wide_segments(spark, tmp_path):
    """Reference 0.11 bug-fix parity ("index-mode measure queries
    returning documents outside the requested time range when a widened
    segment overlaps the query window"): with an index-mode store whose
    SEGMENT spans more than the query window, the [begin, end) predicate
    must still bound every returned row — segment (partition) pruning is
    an optimization, never the filter."""
    import datetime as dt

    import dataclasses

    from pyspark.sql import functions as F

    from skywalking_banyandb_spark.catalog import default_catalog
    from skywalking_banyandb_spark.model import MeasureQuery, TimeRange
    from skywalking_banyandb_spark.plans.measure import compile_measure
    from skywalking_banyandb_spark.sources.parquet import read_table
    from skywalking_banyandb_spark.sources.writer import write_measure

    cat = default_catalog(SF_SMALL)
    m = cat.get("g1", "measure", "metrics")
    # DAY segments (the widest IntervalRule unit) with a SUB-DAY query
    # window: the segment containing the window is strictly wider than
    # it, so partition pruning alone can never narrow to the answer
    src = read_table(spark, f"{SF_SMALL}/events.parquet")
    path = str(tmp_path / "wide")
    wide = dataclasses.replace(m, paths=(path,), index_mode=True)
    write_measure(src, wide, path, mode="overwrite",
                  segment_interval="DAY")
    cat.register(wide)

    begin = dt.datetime(2024, 1, 5, 6)
    end = dt.datetime(2024, 1, 5, 18)
    q = MeasureQuery(
        groups=["g1"], name="metrics",
        time_range=TimeRange(begin, end), limit=100000,
    )
    rows = compile_measure(spark, cat, q).select("ts").collect()
    assert rows, "window must not be empty"
    assert all(begin <= r.ts < end for r in rows)
    # and the widened segment really is wider than the window
    n_all = spark.read.parquet(path).count()
    assert n_all > len(rows)
