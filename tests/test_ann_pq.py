"""PQ (product-quantization) index: recall vs brute force, code-table
shape/compression, build idempotence, and plan hygiene. Exact oracle
equivalence is covered by test_conformance.py::ann_pq_topk."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from skywalking_banyandb_spark.functions.similarity import brute_force_topk
from skywalking_banyandb_spark.sources.ann_index import (
    build_pq_index,
    pq_index_path,
    pq_probe_topk,
)
from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL


def _query(spark):
    row = (read_table(spark, f"{SF_SMALL}/embeddings.parquet")
           .where(F.col("vec_id") == 0).select("embedding").head())
    return [float(x) for x in row[0]]


def test_pq_codes_shape_and_compression(spark):
    path = build_pq_index(spark, SF_SMALL)
    idx = spark.read.parquet(path)
    row = idx.select("codes").head()
    assert len(row.codes) == 16
    bad = idx.where(
        F.exists("codes", lambda c: (c < 0) | (c >= 32))).count()
    assert bad == 0
    # 16 codes (≤32 distinct values each) stand in for 64 float32 dims
    # (~16x) — the ADC scan's IO is the codes column, not the vectors
    assert os.path.isfile(os.path.join(path, "_codebooks.json"))


def test_pq_build_idempotent(spark):
    p1 = build_pq_index(spark, SF_SMALL)
    mtime = os.path.getmtime(os.path.join(p1, "_codebooks.json"))
    p2 = build_pq_index(spark, SF_SMALL)
    assert p1 == p2 == pq_index_path(SF_SMALL, 16, 32)
    assert os.path.getmtime(os.path.join(p2, "_codebooks.json")) == mtime


def test_pq_recall_vs_brute_force(spark):
    q = _query(spark)
    emb = read_table(spark, f"{SF_SMALL}/embeddings.parquet").where(
        F.col("vec_id") != 0)
    exact = {r.vec_id for r in
             brute_force_topk(emb, "vec_id", "embedding", q, 10).collect()}
    approx = {r.vec_id for r in
              pq_probe_topk(spark, SF_SMALL, q, 10, exclude_id=0).collect()}
    # normalized-vector PQ (16 subspaces x 32 sampled codewords): the
    # ADC candidates + exact rerank recover most of the true top-10
    assert len(exact & approx) >= 7, (exact, approx)


def test_pq_probe_no_python_udf(spark):
    q = _query(spark)
    df = pq_probe_topk(spark, SF_SMALL, q, 10, exclude_id=0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_recall_and_partition_pruning(spark):
    from skywalking_banyandb_spark.sources.ann_index import ivfpq_probe_topk

    q = _query(spark)
    emb = read_table(spark, f"{SF_SMALL}/embeddings.parquet").where(
        F.col("vec_id") != 0)
    exact = {r.vec_id for r in
             brute_force_topk(emb, "vec_id", "embedding", q, 10).collect()}
    df = ivfpq_probe_topk(spark, SF_SMALL, q, 10, exclude_id=0)
    approx = {r.vec_id for r in df.collect()}
    # nprobe=4 of 8 clusters halves the universe before ADC; the composed
    # index still recovers the bulk of the true top-10
    assert len(exact & approx) >= 6, (exact, approx)
    # the probe must prune cluster partitions at the scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
