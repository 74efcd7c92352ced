"""Embedding-matrix operators: the one-pass covariance entry must equal
numpy's population covariance; the PCA back half (driver-side eigh over
the 64×64 result + Catalyst projection) round-trips; the nearest-centroid
confusion equals an independent numpy recomputation."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from skywalking_banyandb_spark.registry_pipeline import (
    _embedding_centroid_confusion,
    _embedding_covariance,
)
from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL


def _collect_embeddings(spark):
    rows = read_table(spark, f"{SF_SMALL}/embeddings.parquet") \
        .select("vec_id", "embedding", "label").orderBy("vec_id").collect()
    ids = [r.vec_id for r in rows]
    X = np.array([[float(x) for x in r.embedding] for r in rows])
    y = np.array([r.label for r in rows])
    return ids, X, y


def test_covariance_matches_numpy(spark):
    ids, X, _ = _collect_embeddings(spark)
    want = np.cov(X, rowvar=False, bias=True)  # population covariance
    got = np.zeros((64, 64))
    for r in _embedding_covariance(spark, SF_SMALL).collect():
        got[r.i - 1, r.j - 1] = r.cov
        got[r.j - 1, r.i - 1] = r.cov
    assert np.max(np.abs(got - want)) < 1e-9


def test_pca_projection_roundtrip(spark):
    """The PCA back half: eigh over the engine's covariance, project with
    a Catalyst dot-product against literal components, and check (a) the
    Spark projection equals the numpy projection and (b) top-k
    reconstruction error shrinks as k grows (the PCA guarantee)."""
    from skywalking_banyandb_spark.sources.ann_index import _double_array_lit

    ids, X, _ = _collect_embeddings(spark)
    cov = np.zeros((64, 64))
    for r in _embedding_covariance(spark, SF_SMALL).collect():
        cov[r.i - 1, r.j - 1] = cov[r.j - 1, r.i - 1] = r.cov
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]

    k = 8
    mean = X.mean(axis=0)
    emb = read_table(spark, f"{SF_SMALL}/embeddings.parquet")
    vec = F.col("embedding").cast("array<double>")
    centered = F.zip_with(vec, _double_array_lit(mean),
                          lambda x, m: x - m)
    proj_cols = [
        F.aggregate(
            F.zip_with(centered, _double_array_lit(evecs[:, c]),
                       lambda x, w: x * w),
            F.lit(0.0), lambda a, v: a + v,
        ).alias(f"pc{c}")
        for c in range(k)
    ]
    got = {r.vec_id: [r[f"pc{c}"] for c in range(k)]
           for r in emb.select("vec_id", *proj_cols).collect()}
    want = (X - mean) @ evecs[:, :k]
    for row_i, vid in enumerate(ids):
        assert np.max(np.abs(np.array(got[vid]) - want[row_i])) < 1e-9

    # PCA guarantee: mean squared reconstruction error = sum of dropped
    # eigenvalues; strictly decreasing in k for this corpus
    errs = []
    for kk in (4, 8, 16):
        Z = (X - mean) @ evecs[:, :kk]
        R = Z @ evecs[:, :kk].T + mean
        errs.append(np.mean(np.sum((X - R) ** 2, axis=1)))
        # the engine covariance is quantized to 2^-30 units (r7 —
        # exact associative integer sums on both engines), so the
        # error==dropped-eigenvalue identity holds to ~64 cells x 3*2^-30
        assert abs(errs[-1] - evals[kk:].sum()) < 2e-7
    assert errs[0] > errs[1] > errs[2]


def test_centroid_confusion_matches_numpy(spark):
    ids, X, y = _collect_embeddings(spark)
    labels = sorted(set(int(v) for v in y))
    cents = {l: X[y == l].mean(axis=0) for l in labels}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    want: dict = {}
    for row, lbl in zip(X, y):
        scored = sorted(((cos(row, cents[l]), -l) for l in labels),
                        reverse=True)
        assigned = -scored[0][1]
        key = (int(lbl), int(assigned))
        want[key] = want.get(key, 0) + 1
    got = {(r.label, r.assigned): r.n
           for r in _embedding_centroid_confusion(spark, SF_SMALL).collect()}
    assert got == want
    # sanity: well above the 10% chance level for 10 classes (the
    # synthetic labels are deliberately noisy — ~37% at sf0.001)
    correct = sum(n for (a, b), n in got.items() if a == b)
    assert correct / len(ids) > 0.25


def test_pca_project_entry_matches_numpy(spark):
    """r7 (VERDICT r6 #5): the first-class embedding_pca_project entry —
    fit from the engine's quantized covariance/means, canonical
    sign-normalized basis, Catalyst fold projection — must match the
    numpy projection built from the same covariance cells."""
    from skywalking_banyandb_spark.registry_pipeline import (
        _emb_quant_means,
        _embedding_pca_project,
        _pca_basis,
    )

    ids, X, _ = _collect_embeddings(spark)
    cov_cells = [(r.i, r.j, r.cov)
                 for r in _embedding_covariance(spark, SF_SMALL).collect()]
    emb = read_table(spark, f"{SF_SMALL}/embeddings.parquet")
    mean_cells = [(r.i, r.m) for r in _emb_quant_means(emb).collect()]
    mean, V = _pca_basis(cov_cells, mean_cells)
    # canonical sign: the largest-magnitude component of each column >= 0
    for c in range(V.shape[1]):
        assert V[np.argmax(np.abs(V[:, c])), c] >= 0
    want = (X - mean) @ V
    rows = _embedding_pca_project(spark, SF_SMALL).collect()
    assert [r.vec_id for r in rows] == sorted(ids)
    by_id = {vid: row_i for row_i, vid in enumerate(ids)}
    for r in rows:
        got = np.array([r[f"pc{c + 1}"] for c in range(V.shape[1])])
        assert np.max(np.abs(got - want[by_id[r.vec_id]])) < 1e-9
    # variance concentrates in the leading components
    Z = np.array([[r[f"pc{c + 1}"] for c in range(V.shape[1])]
                  for r in rows])
    v = Z.var(axis=0)
    assert v[0] >= v[1] >= v[2]


def test_pca_oracle_is_lazy_and_resolves():
    """The registered oracle is a callable resolved by oracle_sql();
    the emitted SQL embeds one literal mean and _PCA_K basis columns."""
    from skywalking_banyandb_spark import registry
    from skywalking_banyandb_spark.registry_pipeline import _PCA_K

    assert callable(registry._ORACLES["embedding_pca_project"])
    sql = registry.oracle_sql()["embedding_pca_project"]
    assert isinstance(sql, str)
    assert sql.count("list_sum") == _PCA_K
    assert f"pc{_PCA_K}" in sql and "generate_series(1, 64)" in sql


def test_int8_quantization_matches_numpy(spark):
    """r7: per-dim symmetric int8 quantization — scale, dequantization
    MSE and saturation count must match a direct numpy recomputation of
    the same floor-based quantizer."""
    from skywalking_banyandb_spark.registry_pipeline import (
        _embedding_int8_quantization,
    )

    ids, X, _ = _collect_embeddings(spark)
    scale = np.abs(X).max(axis=0) / 127.0
    q = np.clip(np.floor(X / scale), -127.0, 127.0)
    mse = ((X - q * scale) ** 2).mean(axis=0)
    sat = (np.abs(q) >= 127.0).sum(axis=0)

    rows = _embedding_int8_quantization(spark, SF_SMALL).collect()
    assert [r.i for r in rows] == list(range(1, 65))
    for r in rows:
        d = r.i - 1
        assert abs(r.scale - scale[d]) < 1e-15
        assert abs(r.mse - mse[d]) < 1e-9
        assert r.saturated == sat[d]
    # quantization quality sanity: error is bounded by one quantum step
    for r in rows:
        assert r.mse <= (r.scale ** 2)
    # at least one dim saturates (its max-|x| element maps to +/-127)
    assert sum(r.saturated for r in rows) >= 1


def test_kmeans_clusters_match_numpy(spark):
    """The declarative two-iteration spherical k-means must reproduce a
    numpy transcription exactly: same md5 init, same dot/||c|| argmax
    with smallest-cid tie-break, same per-dim means."""
    import hashlib

    from skywalking_banyandb_spark.registry_pipeline import (
        _embedding_kmeans_clusters,
    )

    ids, X, _ = _collect_embeddings(spark)
    order = sorted(range(len(ids)),
                   key=lambda i: (hashlib.md5(str(ids[i]).encode())
                                  .hexdigest(), ids[i]))
    init = [(int(ids[i]), X[i].astype(float)) for i in order[:8]]

    def assign(cents):
        out = {}
        for vid, v in zip(ids, X):
            scored = sorted(
                ((float(v @ cv) / float(np.linalg.norm(cv)), -cid)
                 for cid, cv in cents), reverse=True)
            out[int(vid)] = -scored[0][1]
        return out

    a1 = assign(init)
    cents1 = []
    for cid, _cv in init:
        members = [X[i] for i, vid in enumerate(ids) if a1[int(vid)] == cid]
        if members:
            cents1.append((cid, np.mean(members, axis=0)))
    a2 = assign(cents1)
    want = {}
    for vid, cid in a2.items():
        n, s = want.get(cid, (0, 0))
        want[cid] = (n + 1, s + vid)
    got = {r.cluster_id: (r.n_vectors, r.id_sum)
           for r in _embedding_kmeans_clusters(spark, SF_SMALL).collect()}
    assert got == want
    assert sum(n for n, _ in got.values()) == len(ids)  # partition
