"""Replica groups — the ``entity_replicated`` golden case replay
(``test/cases/measure/data/input/entity_replicated.yaml``: a group with
replicas must answer with a SINGLE copy of each row) plus failover: reads
resolve to the lowest intact ``replica=N`` copy and fall over when it is
lost (``common.proto`` Group.replicas, docs/concept/clustering.md)."""

from __future__ import annotations

import dataclasses
import datetime as dt
import os
import shutil

import pytest
from pyspark.sql import functions as F

from skywalking_banyandb_spark.catalog import Catalog, default_catalog
from skywalking_banyandb_spark.errors import SchemaError
from skywalking_banyandb_spark.model import (
    BinaryOp,
    MeasureQuery,
    OrderBy,
    Sort,
    TimeRange,
    cond,
)
from skywalking_banyandb_spark.plans.measure import compile_measure
from skywalking_banyandb_spark.sources.parquet import read_table
from skywalking_banyandb_spark.sources.writer import write_measure

from conftest import SF_SMALL

TR = TimeRange.of("2024-01-03T00:00:00", "2024-01-05T00:00:00")


@pytest.fixture(scope="module")
def replicated_store(spark, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("replicated") / "metrics")
    cat0 = default_catalog(SF_SMALL)
    schema = cat0.get("g1", "measure", "metrics")
    t3, t5 = dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 5)
    sl = read_table(spark, f"{SF_SMALL}/events.parquet").where(
        (F.col("ts") >= F.lit(t3)) & (F.col("ts") < F.lit(t5)))
    write_measure(sl, schema, store, mode="overwrite", replicas=1)
    cat = Catalog()
    cat.register(dataclasses.replace(schema, group="replicated_group",
                                     paths=(store,)))
    return store, cat, sl


def _q():
    # the golden case's shape: EQ criteria + tag projection on a
    # replicated group (id EQ "1" -> user_id EQ 1 on the synthetic map)
    return MeasureQuery(
        groups=["replicated_group"], name="metrics", time_range=TR,
        criteria=cond("user_id", BinaryOp.EQ, 1),
        tag_projection=["user_id", "event_type"],
        field_projection=["value"],
        order_by=OrderBy(None, Sort.ASC), limit=10000,
    )


def test_replicated_group_returns_single_copy(spark, replicated_store):
    store, cat, sl = replicated_store
    assert sorted(os.listdir(store))[:2] == ["replica=0", "replica=1"]
    got = compile_measure(spark, cat, _q()).collect()
    # single copy: equals the version-deduped slice, NOT doubled
    from skywalking_banyandb_spark.operators.dedup import latest_version

    expected = (latest_version(
        sl.where(F.col("user_id") == 1), ["user_id"], "ts", "event_id")
        .count())
    assert len(got) == expected > 0
    assert len({(r["ts"], r["user_id"]) for r in got}) == len(got)


def test_replica_failover(spark, replicated_store):
    store, cat, _ = replicated_store
    baseline = [tuple(r) for r in compile_measure(spark, cat, _q()).collect()]
    shutil.rmtree(os.path.join(store, "replica=0"))
    got = [tuple(r) for r in compile_measure(spark, cat, _q()).collect()]
    assert got == baseline  # replica=1 answers, byte-identical

    # replica=1 corrupted (dir present, raster gone) -> no intact copy left
    rep1 = os.path.join(store, "replica=1")
    for dirpath, _, files in os.walk(rep1):
        for f in files:
            if f.endswith(".parquet"):
                os.unlink(os.path.join(dirpath, f))
    with pytest.raises(SchemaError, match="no intact replica"):
        compile_measure(spark, cat, _q())
