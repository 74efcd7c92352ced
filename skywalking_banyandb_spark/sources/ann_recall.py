"""ANN approximation quality — recall@k vs brute force (VERDICT r7 #6).

The approximate probes (SRP-LSH, IVF, PQ, IVF-PQ, residual IVF-PQ, the
incremental twins) are all exactly REPRODUCIBLE — their driver rows
hash-match a DuckDB recomputation of the same approximation — but until
r8 nothing tracked how close the approximation is to the exact answer.
This module measures it: for a deterministic panel of query vectors,
``recall@k = |approx top-k ∩ exact top-k| / k`` averaged over the panel,
where the exact side is :func:`functions.similarity.brute_force_topk`
over the same candidate universe the index serves (the full corpus for
the static indexes; base ∪ append ∖ tombstones for the incremental
ones — measuring an incremental index against rows it is contractually
blind to would conflate deletion semantics with ranking quality).

Consumed two ways:
* ``tests/test_ann_recall.py`` asserts per-method floors — a codebook or
  probe regression that silently degrades ranking quality fails CI even
  though every hash gate still passes (the oracle reproduces the SAME
  degraded approximation);
* ``bench.py`` reports the numbers next to the build/probe split so the
  recall/latency trade-off is visible per round.

Panel choice: md5-ordered — the same deterministic engine-portable
sampler the index builds use (no RNG state), giving an arbitrary-but-
fixed spread of query vectors; the probed id itself is excluded from
both sides, like every ann_* registry entry.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .parquet import read_table


def query_panel(spark: SparkSession, sf_dir: str, n: int = 8,
                id_col: str = "vec_id", vec_col: str = "embedding",
                ) -> List[tuple]:
    """The ``n`` smallest-md5(id) vectors — deterministic across runs,
    engines and partitionings (the sampler of build_ivf_sampled_index)."""
    rows = (
        read_table(spark, f"{sf_dir}/embeddings.parquet")
        .select(F.col(id_col).alias("qid"),
                F.col(vec_col).cast("array<double>").alias("qv"))
        .orderBy(F.md5(F.col("qid").cast("string")), F.col("qid"))
        .limit(n)
        .collect()
    )
    return [(int(r.qid), [float(x) for x in r.qv]) for r in rows]


def _exact_ids(spark: SparkSession, sf_dir: str, query: Sequence[float],
               k: int, exclude_id: int, live_pred: str | None = None,
               ) -> set:
    from ..functions.similarity import brute_force_topk

    df = read_table(spark, f"{sf_dir}/embeddings.parquet")
    if live_pred:
        df = df.where(F.expr(live_pred))
    df = df.where(F.col("vec_id") != exclude_id)
    return {int(r.vec_id)
            for r in brute_force_topk(df, "vec_id", "embedding",
                                      query, k).collect()}


def _incremental_paths(spark: SparkSession, sf_dir: str) -> tuple:
    """Materialize both incremental indexes through the SAME lifecycle
    the registry entries run (base ⊕ append ⊖ tombstones — markers make
    replays no-ops), returning (ivf_path, ivfpq_path, live_pred)."""
    from ..registry_pipeline import (
        _IVF_INC_BASE,
        _IVF_INC_DEAD,
        _IVF_INC_NEW,
    )
    from .ann_index import (
        build_ivf_incremental_base,
        build_ivfpq_incremental_base,
        ivf_incremental_append,
        ivf_incremental_delete,
        ivfpq_incremental_append,
    )

    emb = read_table(spark, f"{sf_dir}/embeddings.parquet")
    new = emb.where(F.expr(_IVF_INC_NEW))
    dead = [r.vec_id for r in emb.where(F.expr(_IVF_INC_DEAD))
            .select("vec_id").collect()]
    p1 = build_ivf_incremental_base(spark, sf_dir, k_clusters=8,
                                    base_pred=_IVF_INC_BASE)
    ivf_incremental_append(spark, p1, new, marker="increment_mod10")
    ivf_incremental_delete(p1, dead)
    p2 = build_ivfpq_incremental_base(spark, sf_dir, k_clusters=8,
                                      m_sub=16, k_cw=32,
                                      base_pred=_IVF_INC_BASE)
    ivfpq_incremental_append(spark, p2, new, m_sub=16,
                             marker="increment_mod10")
    ivf_incremental_delete(p2, dead)
    return p1, p2, "vec_id % 97 != 0"


def ann_recall_at_k(spark: SparkSession, sf_dir: str, k: int = 10,
                    n_queries: int = 8,
                    methods: Sequence[str] | None = None,
                    ) -> Dict[str, float]:
    """Mean recall@k per method over the deterministic query panel, at
    the registry entries' own probe configuration (k_clusters=8,
    nprobe=4, m_sub=16, k_cw=32, L=4/b=6/hamming=1)."""
    from .ann_index import (
        ivf_incremental_probe_topk,
        ivf_sampled_probe_topk,
        ivfpq_incremental_probe_topk,
        ivfpq_probe_topk,
        ivfpq_residual_probe_topk,
        lsh_probe_topk,
        pq_probe_topk,
    )

    panel = query_panel(spark, sf_dir, n_queries)
    want = set(methods) if methods else {
        "lsh", "ivf", "pq", "ivfpq", "ivfpq_residual",
        "ivf_incremental", "ivfpq_incremental",
    }
    probes: Dict[str, callable] = {}
    if "lsh" in want:
        probes["lsh"] = lambda q, x: lsh_probe_topk(
            spark, sf_dir, q, k, exclude_id=x)
    if "ivf" in want:
        probes["ivf"] = lambda q, x: ivf_sampled_probe_topk(
            spark, sf_dir, q, k, k_clusters=8, nprobe=4, exclude_id=x)
    if "pq" in want:
        probes["pq"] = lambda q, x: pq_probe_topk(
            spark, sf_dir, q, k, exclude_id=x)
    if "ivfpq" in want:
        probes["ivfpq"] = lambda q, x: ivfpq_probe_topk(
            spark, sf_dir, q, k, k_clusters=8, exclude_id=x)
    if "ivfpq_residual" in want:
        probes["ivfpq_residual"] = lambda q, x: ivfpq_residual_probe_topk(
            spark, sf_dir, q, k, k_clusters=8, exclude_id=x)
    live_pred = None
    if want & {"ivf_incremental", "ivfpq_incremental"}:
        p_ivf, p_ivfpq, live_pred = _incremental_paths(spark, sf_dir)
        if "ivf_incremental" in want:
            probes["ivf_incremental"] = lambda q, x: \
                ivf_incremental_probe_topk(spark, p_ivf, q, k, nprobe=4,
                                           exclude_id=x)
        if "ivfpq_incremental" in want:
            probes["ivfpq_incremental"] = lambda q, x: \
                ivfpq_incremental_probe_topk(spark, p_ivfpq, q, k,
                                             nprobe=4, m_sub=16,
                                             exclude_id=x)

    hits: Dict[str, int] = {m: 0 for m in probes}
    denom: Dict[str, int] = {m: 0 for m in probes}
    full_truth: Dict[int, set] = {}
    live_truth: Dict[int, set] = {}
    for qid, qv in panel:
        full_truth[qid] = _exact_ids(spark, sf_dir, qv, k, qid)
        if live_pred:
            live_truth[qid] = _exact_ids(spark, sf_dir, qv, k, qid,
                                         live_pred)
    for name, probe in probes.items():
        truth = live_truth if name.endswith("incremental") else full_truth
        for qid, qv in panel:
            got = {int(r.vec_id) for r in probe(qv, qid).collect()}
            hits[name] += len(got & truth[qid])
            denom[name] += len(truth[qid])
    return {m: round(hits[m] / denom[m], 4) for m in probes}


def ann_incremental_recall_sweep(
    spark: SparkSession,
    sf_dir: str,
    scratch_root: str,
    k: int = 10,
    n_queries: int = 8,
    steps: Sequence[float] = (0.1, 0.3, 0.5, 1.0),
) -> Dict:
    """Recall decay vs APPENDED FRACTION for the frozen-structure
    incremental indexes (VERDICT r12 Next #4), plus the recovery a
    retrain buys — the measurement behind the documented rebuild
    trigger (:data:`ann_index.REBUILD_APPEND_FRACTION`).

    Base = the even half of the corpus; the append pool is the odd half
    in smallest-``md5(id)`` order (deterministic, engine-portable), fed
    in cumulative slices of ``steps``×|base|. At each step both
    incremental probes are scored against brute force over the LIVE
    rows (base ∪ appended-so-far); after the last step both indexes are
    retrained in place and scored again — the from-scratch level the
    policy's retrain restores. Built in ``scratch_root`` (NOT the
    shared index tree: retrain mutates; a second bench run must start
    from the frozen base again). The live-id bookkeeping is driver-side
    lists — fine for the bench corpus; at 100 TB liveness stays a
    relational semi-join, which is exactly how the probes themselves
    already treat tombstones."""
    from ..functions.similarity import brute_force_topk
    from .ann_index import (
        build_ivf_incremental_base,
        build_ivfpq_incremental_base,
        incremental_appended_fraction,
        ivf_incremental_append,
        ivf_incremental_probe_topk,
        ivf_incremental_retrain,
        ivfpq_incremental_append,
        ivfpq_incremental_probe_topk,
        ivfpq_incremental_retrain,
    )

    base_pred = "vec_id % 2 = 0"
    emb = read_table(spark, f"{sf_dir}/embeddings.parquet")
    base_n = emb.where(base_pred).count()
    pool_ids = [int(r.vec_id) for r in
                emb.where("vec_id % 2 = 1")
                .select("vec_id")
                .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
                .collect()]
    p_ivf = build_ivf_incremental_base(spark, sf_dir, k_clusters=8,
                                       base_pred=base_pred,
                                       root=scratch_root)
    p_ivfpq = build_ivfpq_incremental_base(spark, sf_dir, k_clusters=8,
                                           m_sub=16, k_cw=32,
                                           base_pred=base_pred,
                                           root=scratch_root)
    panel = query_panel(spark, sf_dir, n_queries)

    def score(live_ids: list) -> Dict[str, float]:
        live = emb.where(F.expr(base_pred)
                         | F.col("vec_id").isin(live_ids or [-1]))
        out: Dict[str, float] = {}
        for name, probe in (
            ("ivf_incremental", lambda q, x: ivf_incremental_probe_topk(
                spark, p_ivf, q, k, nprobe=4, exclude_id=x)),
            ("ivfpq_incremental", lambda q, x: ivfpq_incremental_probe_topk(
                spark, p_ivfpq, q, k, nprobe=4, m_sub=16, exclude_id=x)),
        ):
            hit = den = 0
            for qid, qv in panel:
                truth = {int(r.vec_id) for r in brute_force_topk(
                    live.where(F.col("vec_id") != qid),
                    "vec_id", "embedding", qv, k).collect()}
                got = {int(r.vec_id) for r in probe(qv, qid).collect()}
                hit += len(got & truth)
                den += len(truth)
            out[name] = round(hit / den, 4)
        return out

    result: Dict = {"base_pred": base_pred, "k": k, "base_rows": base_n,
                    "steps": []}
    applied = 0
    for frac in steps:
        target = min(int(frac * base_n), len(pool_ids))
        new_ids = pool_ids[applied:target]
        applied = target
        if new_ids:
            batch = emb.where(F.col("vec_id").isin(new_ids))
            marker = f"sweep_{int(frac * 100)}"
            ivf_incremental_append(spark, p_ivf, batch, marker=marker)
            ivfpq_incremental_append(spark, p_ivfpq, batch, m_sub=16,
                                     marker=marker)
        result["steps"].append({
            "appended_fraction": round(applied / base_n, 4),
            "appended_fraction_measured": round(
                incremental_appended_fraction(spark, p_ivf), 4),
            **score(pool_ids[:applied]),
        })
    ivf_incremental_retrain(spark, p_ivf, k_clusters=8)
    ivfpq_incremental_retrain(spark, p_ivfpq, k_clusters=8, m_sub=16,
                              k_cw=32)
    result["after_retrain"] = {
        "appended_fraction": round(applied / base_n, 4),
        "appended_fraction_measured": round(
            incremental_appended_fraction(spark, p_ivf), 4),
        **score(pool_ids[:applied]),
    }
    from .ann_index import REBUILD_APPEND_FRACTION
    result["policy"] = {"rebuild_append_fraction": REBUILD_APPEND_FRACTION}
    return result


def ann_policy_retrain_sequence(
    spark: SparkSession,
    sf_dir: str,
    scratch_root: str,
    k: int = 10,
    n_queries: int = 4,
) -> Dict:
    """The ``k_clusters="policy"`` retrain exercised END-TO-END (VERDICT
    r14 Next #6): build a POLICY-sized incremental base over half the
    corpus, append the other half (100% growth), watch
    :func:`ann_index.incremental_needs_retrain` fire, retrain with
    ``k_clusters="policy"`` — the maintenance behavior where the
    cluster count tracks corpus growth — and score post-retrain recall.

    The from-scratch floor is measured, not argued: a FRESH policy base
    built over the full corpus in separate scratch. Because retrain re-
    derives the same smallest-``md5(id)`` centroid sample from the same
    live rows, the retrained index and the fresh build are the SAME
    artifact — ``recall_after_policy_retrain`` must EQUAL
    ``recall_from_scratch`` (pinned in tests/test_ann_recall.py), which
    is the strongest form of "post-retrain recall ≥ the from-scratch
    floor"."""
    import json as _json
    import os as _os

    from ..functions.similarity import default_k_clusters
    from .ann_index import (
        build_ivf_incremental_base,
        incremental_needs_retrain,
        ivf_incremental_append,
        ivf_incremental_probe_topk,
        ivf_incremental_retrain,
    )

    emb = read_table(spark, f"{sf_dir}/embeddings.parquet")
    base_pred = "vec_id % 2 = 0"
    p = build_ivf_incremental_base(
        spark, sf_dir, k_clusters=None, base_pred=base_pred,
        root=_os.path.join(scratch_root, "grown"))
    with open(_os.path.join(p, "_centroids.json")) as f:
        k_before = len(_json.load(f))
    ivf_incremental_append(spark, p, emb.where("vec_id % 2 = 1"),
                           marker="policy_seq")
    fired = incremental_needs_retrain(spark, p)
    ivf_incremental_retrain(spark, p, k_clusters="policy")
    with open(_os.path.join(p, "_meta.json")) as f:
        meta = _json.load(f)
    k_after = meta["k_clusters"]

    fresh = build_ivf_incremental_base(
        spark, sf_dir, k_clusters=None, base_pred="true",
        root=_os.path.join(scratch_root, "fresh"))

    panel = query_panel(spark, sf_dir, n_queries)

    def _recall(path: str) -> float:
        hit = den = 0
        for qid, qv in panel:
            truth = _exact_ids(spark, sf_dir, qv, k, qid)
            got = {int(r.vec_id) for r in ivf_incremental_probe_topk(
                spark, path, qv, k, nprobe=4, exclude_id=qid).collect()}
            hit += len(got & truth)
            den += len(truth)
        return round(hit / den, 4)

    return {
        "k_before": k_before,
        "k_after": k_after,
        "k_policy_live": default_k_clusters(emb.count()),
        "needs_retrain_fired": bool(fired),
        "meta_policy_k": bool(meta.get("policy_k")),
        "recall_after_policy_retrain": _recall(p),
        "recall_from_scratch": _recall(fresh),
    }
