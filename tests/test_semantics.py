"""Unit tests for engine semantics not exercised by the oracle registry:
array HAVING/NOT_HAVING, analyzers, version dedup, LSH recall, errors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skywalking_banyandb_spark.errors import QueryAnalyzeError
from skywalking_banyandb_spark.functions.analyzers import analyze_term, tokens
from skywalking_banyandb_spark.functions.similarity import brute_force_topk, lsh_topk
from skywalking_banyandb_spark.model import BinaryOp, LogicalOp, cond
from skywalking_banyandb_spark.operators.criteria import compile_condition
from skywalking_banyandb_spark.operators.dedup import latest_version

from conftest import SF_SMALL


def test_having_contains_all(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["a"]), (3, ["b", "c"])], "id int, tags array<string>"
    )
    pred = compile_condition(cond("tags", BinaryOp.HAVING, ["a", "b"]), {"tags": None})
    assert [r.id for r in df.where(pred).collect()] == [1]
    npred = compile_condition(cond("tags", BinaryOp.NOT_HAVING, ["a", "b"]), {"tags": None})
    assert sorted(r.id for r in df.where(npred).collect()) == [2, 3]


def test_unknown_tag_is_analyze_error(spark):
    with pytest.raises(QueryAnalyzeError):
        compile_condition(cond("nope", BinaryOp.EQ, 1), {"tags": None})


def test_analyzers(spark):
    df = spark.createDataFrame([("Hello, World-42 http://x.y/z",)], "t string")
    out = df.select(
        tokens(F.col("t"), "standard").alias("std"),
        tokens(F.col("t"), "simple").alias("simple"),
        tokens(F.col("t"), "keyword").alias("kw"),
    ).head()
    assert out.std == ["hello", "world", "42", "http", "x", "y", "z"]
    assert "42" not in out.simple and "hello" in out.simple
    assert out.kw == ["Hello, World-42 http://x.y/z"]
    assert analyze_term("Hash-Join", "standard") == ["hash", "join"]


def test_version_dedup_last_write_wins(spark):
    df = spark.createDataFrame(
        [(1, 100, 1, 10.0), (1, 100, 3, 30.0), (1, 100, 2, 20.0), (2, 100, 1, 99.0)],
        "sid int, ts int, version int, value double",
    )
    out = latest_version(df, ["sid"], "ts", "version")
    got = {(r.sid, r.ts): r.value for r in out.collect()}
    assert got == {(1, 100): 30.0, (2, 100): 99.0}
    assert "version" not in out.columns


def test_lsh_topk_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    d = emb.where(F.col("vec_id") != 0)
    exact = {r.vec_id for r in brute_force_topk(d, "vec_id", "embedding", q, 10).collect()}
    approx = {r.vec_id for r in lsh_topk(d, "vec_id", "embedding", q, 10).collect()}
    # approximate search must reach decent recall on clustered data
    assert len(exact & approx) >= 7, (exact, approx)


def test_ivf_topk_recall_vs_brute_force(spark):
    from skywalking_banyandb_spark.functions.similarity import ivf_assign, ivf_build, ivf_topk

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).head()["embedding"]]
    d = emb.where(F.col("vec_id") != 0)
    exact = {r.vec_id for r in brute_force_topk(d, "vec_id", "embedding", q, 10).collect()}
    approx = {r.vec_id for r in
              ivf_topk(d, "vec_id", "embedding", q, 10, k_clusters=8, nprobe=4).collect()}
    assert len(exact & approx) >= 7, (exact, approx)

    # the index is deterministic: same build twice -> same centroids, and
    # every vector lands in exactly one of k clusters
    c1 = ivf_build(d, "vec_id", "embedding", k_clusters=8, iters=2)
    c2 = ivf_build(d, "vec_id", "embedding", k_clusters=8, iters=2)
    assert c1 == c2
    clusters = ivf_assign(d, "embedding", c1).select("cluster_id").distinct().collect()
    assert 1 <= len(clusters) <= 8
    assert all(0 <= r.cluster_id < 8 for r in clusters)


def test_multimodal_decode_is_stubbed():
    from skywalking_banyandb_spark.functions.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01")


def test_match_unknown_analyzer_errors():
    with pytest.raises(ValueError):
        analyze_term("x", "bogus")


def test_data_binary_tag_roundtrip(spark, tmp_path):
    """DATA_BINARY tags (schema.proto:31-39) survive the write->read path
    and project correctly; binary is opaque (no index, no criteria)."""
    import dataclasses

    from skywalking_banyandb_spark.catalog import (
        FieldSpec, MeasureSchema, TagSpec,
    )
    from skywalking_banyandb_spark.model import MeasureQuery, TimeRange
    from skywalking_banyandb_spark.plans.measure import compile_measure
    from skywalking_banyandb_spark.sources.writer import write_measure
    from skywalking_banyandb_spark.catalog import Catalog
    import datetime as dt

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 10, 8), 7, bytearray(b"\x00\x01\xff"), 1.5),
         (2, dt.datetime(2024, 1, 10, 9), 7, bytearray(b"payload"), 2.5)],
        "version long, ts timestamp, sid long, blob binary, value double",
    )
    schema = MeasureSchema(
        group="g", name="bin_m", paths=(str(tmp_path / "bin_m"),),
        ts_column="ts",
        tags=(TagSpec("sid", "INT"), TagSpec("blob", "DATA_BINARY", indexed=False)),
        fields=(FieldSpec("value", "FLOAT"),),
        entity=("sid",), version_column="version",
    )
    write_measure(df, schema, schema.paths[0])
    cat = Catalog(); cat.register(schema)
    q = MeasureQuery(
        groups=["g"], name="bin_m",
        time_range=TimeRange.of("2024-01-01T00:00:00", "2024-02-01T00:00:00"),
        tag_projection=["sid", "blob"], field_projection=["value"], limit=10,
    )
    rows = compile_measure(spark, cat, q).collect()
    assert {bytes(r.blob) for r in rows} == {b"\x00\x01\xff", b"payload"}
    assert all(isinstance(r.value, float) for r in rows)


def test_group_mod_revision_gate(spark):
    """Per-group gating (measure/v1/query.proto:151-154): a query pinned to
    a schema revision fails fast once the group's schema changes; the
    current revision still passes."""
    from skywalking_banyandb_spark.catalog import default_catalog
    from skywalking_banyandb_spark.model import MeasureQuery, TimeRange
    from skywalking_banyandb_spark.plans.measure import compile_measure

    cat = default_catalog("/root/testdata/sf0.001")
    rev = cat.mod_revision("g1")
    q = MeasureQuery(
        groups=["g1"], name="metrics",
        time_range=TimeRange.of("2024-01-01T00:00:00", "2024-02-01T00:00:00"),
        limit=1, group_mod_revisions={"g1": rev},
    )
    assert compile_measure(spark, cat, q).count() == 1

    # schema change bumps the revision -> pinned query now rejected
    cat.register(cat.get("g1", "measure", "metrics"))
    import dataclasses

    stale = dataclasses.replace(q, group_mod_revisions={"g1": rev})
    with pytest.raises(QueryAnalyzeError, match="revision"):
        compile_measure(spark, cat, stale)


def test_catalog_json_roundtrip(spark, tmp_path):
    """Declarative registry persistence (banyand/metadata analogue): the
    full default catalog round-trips through JSON — every resource kind,
    tag/field specs, stages — and the rebuilt catalog compiles the same
    query to the same result."""
    from skywalking_banyandb_spark.catalog import (
        StageSpec,
        default_catalog,
        load_catalog,
        save_catalog,
    )
    from skywalking_banyandb_spark.model import (
        AggFunc,
        AggregationSpec,
        MeasureQuery,
        TimeRange,
    )
    from skywalking_banyandb_spark.plans.measure import compile_measure

    cat = default_catalog("/root/testdata/sf0.001")
    # exercise stages serialization too
    m = cat.get("g1", "measure", "metrics")
    import dataclasses

    cat.register(dataclasses.replace(
        m, name="metrics_staged",
        stages=(StageSpec("hot", m.paths),), default_stages=("hot",),
    ))
    p = str(tmp_path / "catalog.json")
    save_catalog(cat, p)
    back = load_catalog(p)

    q = MeasureQuery(
        groups=["g1"], name="metrics",
        time_range=TimeRange.of("2024-01-01T00:00:00", "2024-02-01T00:00:00"),
        group_by=["event_type"], agg=AggregationSpec(AggFunc.SUM, "value"),
        limit=100,
    )
    a = sorted(map(tuple, compile_measure(spark, cat, q).collect()))
    b = sorted(map(tuple, compile_measure(spark, back, q).collect()))
    assert a == b and len(a) > 0
    s = back.get("g1", "measure", "metrics_staged")
    assert s.stages[0].name == "hot" and s.default_stages == ("hot",)


# --- persisted ANN indexes (sources/ann_index.py) --------------------------

def _qv(spark):
    from skywalking_banyandb_spark.sources.parquet import read_table
    from pyspark.sql import functions as F

    row = (read_table(spark, f"{SF_SMALL}/embeddings.parquet")
           .where(F.col("vec_id") == 0).select("embedding").head())
    return [float(x) for x in row[0]]


def test_lsh_stored_index_matches_in_query(spark, monkeypatch, tmp_path):
    """The persisted SRP index returns EXACTLY the in-query lsh_topk result
    (same hyperplanes, same Hamming-ball candidates), and the probe is
    partition pruning, not a scan: PartitionFilters carries the sig
    predicate."""
    from pyspark.sql import functions as F

    from skywalking_banyandb_spark.sources.ann_index import lsh_probe_topk
    from skywalking_banyandb_spark.sources.parquet import read_table

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    q = _qv(spark)
    stored = lsh_probe_topk(spark, SF_SMALL, q, 10, exclude_id=0)
    got = [(r.vec_id, r.score) for r in stored.collect()]

    d = read_table(spark, f"{SF_SMALL}/embeddings.parquet").where(
        F.col("vec_id") != 0)
    want = [(r.vec_id, r.score)
            for r in lsh_topk(d, "vec_id", "embedding", q, 10).collect()]
    assert got == want

    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "sig" in plan, plan


def test_ivf_stored_index_probe_prunes_partitions(spark, monkeypatch, tmp_path):
    """The persisted IVF index never trains inside the query, probes only
    nprobe cluster partitions (PartitionFilters on cluster_id), and keeps
    recall vs brute force."""
    from skywalking_banyandb_spark.sources.ann_index import ivf_probe_topk
    from skywalking_banyandb_spark.sources.parquet import read_table
    from pyspark.sql import functions as F

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    q = _qv(spark)
    stored = ivf_probe_topk(spark, SF_SMALL, q, 10, k_clusters=8, nprobe=4,
                            exclude_id=0)
    got = {r.vec_id for r in stored.collect()}

    d = read_table(spark, f"{SF_SMALL}/embeddings.parquet").where(
        F.col("vec_id") != 0)
    exact = {r.vec_id
             for r in brute_force_topk(d, "vec_id", "embedding", q, 10).collect()}
    assert len(got & exact) >= 5, (got, exact)

    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan, plan
    # probe reads only the nprobe partitions; build artifacts cached on disk
    import os
    idx = [p for p in os.listdir(str(tmp_path))][0]
    assert idx


def test_ivf_sampled_probe_prunes_and_recalls(spark, monkeypatch, tmp_path):
    """The deterministic sampled-centroid IVF (the oracle-paired registry
    variant): probe is PartitionFilters on cluster_id, recall vs brute
    force holds, and the index is built once (second probe reuses it)."""
    import os

    from pyspark.sql import functions as F

    from skywalking_banyandb_spark.sources.ann_index import (
        ivf_sampled_probe_topk,
    )
    from skywalking_banyandb_spark.sources.parquet import read_table

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    q = _qv(spark)
    stored = ivf_sampled_probe_topk(
        spark, SF_SMALL, q, 10, k_clusters=8, nprobe=4, exclude_id=0)
    got = {r.vec_id for r in stored.collect()}

    d = read_table(spark, f"{SF_SMALL}/embeddings.parquet").where(
        F.col("vec_id") != 0)
    exact = {r.vec_id
             for r in brute_force_topk(d, "vec_id", "embedding", q, 10).collect()}
    assert len(got & exact) >= 5, (got, exact)

    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan, plan
    # deterministic + idempotent: the second probe hits the same stored
    # index and returns identical rows
    again = ivf_sampled_probe_topk(
        spark, SF_SMALL, q, 10, k_clusters=8, nprobe=4, exclude_id=0)
    assert [(r.vec_id, r.score) for r in again.collect()] == sorted(
        [(r.vec_id, r.score) for r in stored.collect()],
        key=lambda t: (-t[1], t[0]))


def test_embedding_neardup_lsh_no_nested_loop(spark):
    """The SRP-bucketed near-dup path joins on the (table, signature)
    bucket key — the plan must contain a hash/sort-merge equi-join, never
    a CartesianProduct / BroadcastNestedLoopJoin (VERDICT r1 #5)."""
    from skywalking_banyandb_spark.functions.similarity import (
        embedding_neardup_lsh_pairs,
    )
    from skywalking_banyandb_spark.sources.parquet import read_table

    d = read_table(spark, f"{SF_SMALL}/embeddings.parquet")
    pairs = embedding_neardup_lsh_pairs(d, "vec_id", "embedding", 0.45)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert pairs.count() >= 0


def test_huge_offset_is_memory_safe_and_empty(spark):
    """A uint32-scale pagination offset must not lower to a
    TakeOrderedAndProject heap of size limit+offset (per-task OOM at scale);
    it takes the spill-safe global-sort path and returns empty when the
    offset is beyond the data (measure_plan.go offset semantics)."""
    from skywalking_banyandb_spark.catalog import default_catalog
    from skywalking_banyandb_spark.model import MeasureQuery, TimeRange
    from skywalking_banyandb_spark.plans.measure import compile_measure

    from conftest import SF_SMALL

    q = MeasureQuery(
        groups=["g1"], name="metrics",
        time_range=TimeRange.of("2024-01-03T00:00:00", "2024-01-27T00:00:00"),
        offset=10**9, limit=100,
    )
    df = compile_measure(spark, default_catalog(SF_SMALL), q)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan, plan
    assert df.count() == 0
