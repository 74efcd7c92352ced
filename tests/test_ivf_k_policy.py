"""√n default policy for the IVF cluster count (VERDICT r13 Next #4).

A fixed ``k_clusters`` makes per-cluster probe work O(n/k) — linear in
the corpus — so the "floor-flat probe" posture dies at 100 TB unless k
tracks the corpus. ``similarity.default_k_clusters`` pins the policy
(clamp(isqrt(n), 4, 65536)); every build/retrain entry point resolves
``k_clusters=None`` through it. The registry entries keep their
explicit oracle-paired constants — the policy is the default for users
who do NOT pass k, which is exactly who was getting the local-mode
constant before (VERDICT r13: "a 100 TB user gets the local-mode
constant unless they know to override").
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from skywalking_banyandb_spark.functions import similarity as sim
from skywalking_banyandb_spark.sources import ann_index as ai
from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL


def test_policy_is_sqrt_with_clamps():
    assert sim.default_k_clusters(0) == sim.IVF_K_MIN
    assert sim.default_k_clusters(3) == sim.IVF_K_MIN
    assert sim.default_k_clusters(100) == 10
    # the sf1 scale-study measurement the policy is pinned to:
    # k=141 ≈ √20k (SCALE.md)
    assert sim.default_k_clusters(20_000) == 141
    assert sim.default_k_clusters(10**12) == sim.IVF_K_MAX
    ks = [sim.default_k_clusters(10**d) for d in range(13)]
    assert ks == sorted(ks)          # monotone in corpus size


def test_build_without_k_picks_corpus_sized_k(spark, tmp_path):
    """The done-criterion: building WITHOUT an explicit k at two corpus
    sizes picks documented, DIFFERENT k values — through the real build
    wiring (base_pred subsets of the same table), visible in both the
    index path and the persisted centroid count."""
    emb = read_table(spark, f"{SF_SMALL}/embeddings.parquet")
    n_small = emb.where("vec_id % 5 = 0").count()
    n_full = emb.count()
    small = ai.build_ivf_incremental_base(
        spark, SF_SMALL, base_pred="vec_id % 5 = 0", root=str(tmp_path))
    full = ai.build_ivf_incremental_base(
        spark, SF_SMALL, base_pred="true", root=str(tmp_path))
    k_small = sim.default_k_clusters(n_small)
    k_full = sim.default_k_clusters(n_full)
    assert k_small != k_full
    assert f"k{k_small}_" in small and f"k{k_full}_" in full
    for path, k in ((small, k_small), (full, k_full)):
        with open(os.path.join(path, "_centroids.json")) as f:
            assert len(json.load(f)) == k


def test_retrain_default_preserves_k_policy_opt_in_resizes(spark, tmp_path):
    """Retrain ``k_clusters`` semantics: the DEFAULT (None) preserves
    the index's current centroid count — the directory name encodes k,
    and a silent default resize would hand a later explicit-k caller
    an index whose contents no longer match its path key.
    ``k_clusters="policy"`` opts in to the maintenance behavior the
    policy buys: k re-derived from the LIVE rows, tracking corpus
    growth."""
    emb = read_table(spark, f"{SF_SMALL}/embeddings.parquet")
    path = ai.build_ivf_incremental_base(
        spark, SF_SMALL, base_pred="vec_id % 5 = 0", root=str(tmp_path))
    k_before = len(json.load(open(os.path.join(path, "_centroids.json"))))
    assert k_before == sim.default_k_clusters(
        emb.where("vec_id % 5 = 0").count())
    ai.ivf_incremental_append(spark, path,
                              emb.where("vec_id % 5 <> 0"))
    ai.ivf_incremental_retrain(spark, path)          # default: preserve
    k_kept = len(json.load(open(os.path.join(path, "_centroids.json"))))
    assert k_kept == k_before
    ai.ivf_incremental_retrain(spark, path, k_clusters="policy")
    k_after = len(json.load(open(os.path.join(path, "_centroids.json"))))
    assert k_after == sim.default_k_clusters(emb.count())
    assert k_after > k_before


def test_policy_built_index_probe_recall_holds(spark, tmp_path):
    """Recall floors hold under the policy k: probing ALL clusters is
    brute-force-exact (assignment is a partition of the corpus; the
    in-cell rank is exact cosine), and the standard nprobe=4 probe
    keeps a pinned recall floor vs brute-force truth."""
    path = ai.build_ivf_incremental_base(spark, SF_SMALL,
                                         base_pred="true",
                                         root=str(tmp_path))
    with open(os.path.join(path, "_centroids.json")) as f:
        k_used = len(json.load(f))
    emb = read_table(spark, f"{SF_SMALL}/embeddings.parquet")
    q = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    qlit = ai._double_array_lit(q)
    brute = [r.vec_id for r in (
        emb.where("vec_id <> 0")
        .select("vec_id",
                ai.cosine_raw(F.col("embedding").cast("array<double>"),
                              qlit).alias("_raw"))
        .orderBy(F.col("_raw").desc(), F.col("vec_id").asc())
        .limit(10).collect())]
    full = [r.vec_id for r in ai.ivf_incremental_probe_topk(
        spark, path, q, 10, nprobe=k_used, exclude_id=0).collect()]
    assert full == brute                      # exact at nprobe = k
    approx = [r.vec_id for r in ai.ivf_incremental_probe_topk(
        spark, path, q, 10, nprobe=4, exclude_id=0).collect()]
    recall = len(set(approx) & set(brute)) / 10
    assert recall >= 0.5, f"nprobe=4 recall {recall} under policy k={k_used}"


def test_default_build_and_probe_target_one_policy_index(
        spark, monkeypatch, tmp_path):
    """Build/probe default agreement (post-review hardening): a
    default-args build and a default-args probe resolve the SAME
    policy-k index. Before the probe defaults flipped to None, a
    default probe after a default (policy) build silently built and
    queried a SECOND k=8 index — different recall than the index the
    user just built, plus an unrequested O(corpus) write."""
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    emb = read_table(spark, f"{SF_SMALL}/embeddings.parquet")
    q = [float(x) for x in emb.where("vec_id = 1").first()["embedding"]]
    k_policy = sim.default_k_clusters(emb.count())
    built = ai.build_ivf_sampled_index(spark, SF_SMALL)      # default args
    assert f"k{k_policy}" in os.path.basename(built)
    got = [(r.vec_id, r.score) for r in ai.ivf_sampled_probe_topk(
        spark, SF_SMALL, q, 10, exclude_id=1).collect()]     # default args
    explicit = [(r.vec_id, r.score) for r in ai.ivf_sampled_probe_topk(
        spark, SF_SMALL, q, 10, k_clusters=k_policy,
        exclude_id=1).collect()]
    assert got == explicit and len(got) == 10
    # exactly ONE sampled-IVF index exists — the probe reused the
    # build's directory instead of minting a k=8 sibling
    key = os.path.basename(os.path.normpath(SF_SMALL))
    dirs = [d for d in os.listdir(tmp_path / key)
            if d.startswith("ivfs2_")]
    assert dirs == [os.path.basename(built)]
