"""topn ``not_in`` replay — the last deliberately-skipped conformance
case: a TopNAggregation DECLARED with ``NOT_IN`` criteria
(``pkg/test/measure/testdata/topn_aggregations/not_in_svc2_svc4.json``:
``service_id NOT_IN [svc_2, svc_4]``) pre-filters rows before the
windowed ranking, and ``SHOW TOP`` over that aggregation
(``test/cases/topn/data/input/not_in.yaml``) never surfaces the excluded
entities. Synthetic map: service_id -> user_id, svc_k -> k."""

from __future__ import annotations

import dataclasses

from pyspark.sql import functions as F

from skywalking_banyandb_spark.catalog import Catalog, default_catalog
from skywalking_banyandb_spark.model import (
    AggFunc,
    BinaryOp,
    Sort,
    TimeRange,
    TopNQuery,
    cond,
)
from skywalking_banyandb_spark.plans.topn import compile_topn, materialize_topn

from conftest import SF_SMALL

TR = TimeRange.of("2024-01-03T00:00:00", "2024-01-08T00:00:00")
EXCLUDED = [2, 4]


def _materialized_catalog(spark, tmp_path):
    cat0 = default_catalog(SF_SMALL)
    schema = cat0.get("g1", "measure", "metrics")
    view = materialize_topn(
        spark, schema, field="value", n=1000, window="1 hour",
        sort=Sort.DESC,
        criteria=cond("user_id", BinaryOp.NOT_IN, EXCLUDED),
    )
    path = str(tmp_path / "topn_not_in")
    view.write.mode("overwrite").parquet(path)
    cat = Catalog()
    cat.register(dataclasses.replace(schema, topn_path=path))
    return cat


def test_not_in_declaration_prefilters_materialization(spark, tmp_path):
    cat = _materialized_catalog(spark, tmp_path)
    q = TopNQuery(groups=["g1"], name="metrics", time_range=TR,
                  top_n=2, sort=Sort.DESC, agg=AggFunc.MAX)
    rows = compile_topn(spark, cat, q).collect()
    assert rows and all(r["user_id"] not in EXCLUDED for r in rows)

    # exactness: equals the same aggregation computed over the source with
    # the exclusion applied as a plain filter (materialized-view routing
    # must not change values, only the scan)
    cat0 = default_catalog(SF_SMALL)
    schema = cat0.get("g1", "measure", "metrics")
    direct = materialize_topn(
        spark, schema, field="value", n=1000, window="1 hour",
        sort=Sort.DESC).where(~F.col("user_id").isin(EXCLUDED))
    got = sorted(tuple(r) for r in rows)
    cat_direct = Catalog()
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        direct.write.mode("overwrite").parquet(f"{d}/v")
        cat_direct.register(dataclasses.replace(schema, topn_path=f"{d}/v"))
        want = sorted(tuple(r) for r in
                      compile_topn(spark, cat_direct, q).collect())
    assert got == want


def test_not_in_streaming_declaration(spark, tmp_path):
    """The streaming flow's Filter stage applies the same declaration
    criteria (banyand/measure/topn.go Filter -> Map -> Window -> TopN)."""
    import datetime as dt
    import shutil

    from skywalking_banyandb_spark.streaming.topn_stream import (
        start_topn_materialization,
    )
    from skywalking_banyandb_spark.sources.parquet import read_table

    cat0 = default_catalog(SF_SMALL)
    schema = cat0.get("g1", "measure", "metrics")
    work = str(tmp_path / "stream")
    ev = read_table(spark, f"{SF_SMALL}/events.parquet")
    t3, t4 = dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 4)
    sl = ev.where((F.col("ts") >= F.lit(t3)) & (F.col("ts") < F.lit(t4)))
    sl.coalesce(1).write.parquet(f"{work}/src")

    stream = (spark.readStream
              .schema(spark.read.parquet(f"{work}/src").schema)
              .parquet(f"{work}/src"))
    q = start_topn_materialization(
        spark, stream, schema, field="value", n=3,
        output_path=f"{work}/out", checkpoint_path=f"{work}/ckpt",
        window="1 hour", lateness="10 minutes", sort=Sort.DESC,
        trigger_once=True,
        criteria=cond("user_id", BinaryOp.NOT_IN, EXCLUDED),
    )
    assert q.awaitTermination(timeout=300)
    shutil.rmtree(f"{work}/ckpt", ignore_errors=True)
    out = spark.read.parquet(f"{work}/out")
    users = {r["user_id"] for r in out.select("user_id").distinct().collect()}
    assert users and not users.intersection(EXCLUDED)
