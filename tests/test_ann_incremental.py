"""Incremental IVF maintenance (VERDICT r6 #6): frozen-centroid append,
tombstone delete, partition-pruned compaction. The core invariant —
assignment depends only on (vector, frozen centroids), so ANY split of
the corpus into base + append batches produces the identical index state
and identical probe results."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from skywalking_banyandb_spark.registry_pipeline import (
    _IVF_INC_BASE,
    _IVF_INC_NEW,
    _ann_ivf_incremental,
    _query_vec,
)
from skywalking_banyandb_spark.sources.ann_index import (
    build_ivf_incremental_base,
    ivf_incremental_append,
    ivf_incremental_compact,
    ivf_incremental_delete,
    ivf_incremental_index_path,
    ivf_incremental_probe_topk,
)
from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL
import pytest


def _emb(spark):
    return read_table(spark, f"{SF_SMALL}/embeddings.parquet")


def _index_rows(spark, path):
    return {
        (r.id, r.cluster_id)
        for r in spark.read.parquet(path).select("id", "cluster_id").collect()
    }


def test_append_batch_split_invariance(spark, tmp_path, monkeypatch):
    """base ⊕ one-batch-append == base ⊕ two-batch-append == one-shot
    base over everything — identical (id, cluster_id) sets and identical
    probe rows, because the frozen-centroid argmax is order-free."""
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "a"))
    pa = build_ivf_incremental_base(spark, SF_SMALL, k_clusters=8,
                                    base_pred=_IVF_INC_BASE)
    new = _emb(spark).where(F.expr(_IVF_INC_NEW))
    ivf_incremental_append(spark, pa, new, marker="all")
    rows_a = _index_rows(spark, pa)

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "b"))
    pb = build_ivf_incremental_base(spark, SF_SMALL, k_clusters=8,
                                    base_pred=_IVF_INC_BASE)
    ivf_incremental_append(
        spark, pb, new.where(F.expr("vec_id % 20 = 0")), marker="b1")
    ivf_incremental_append(
        spark, pb, new.where(F.expr("vec_id % 20 = 10")), marker="b2")
    rows_b = _index_rows(spark, pb)
    assert rows_a == rows_b

    # one-shot over the full corpus with BASE-trained centroids: build
    # a base-only index in a third dir and append everything missing —
    # by the invariant this must equal both incremental states
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "c"))
    pc = build_ivf_incremental_base(spark, SF_SMALL, k_clusters=8,
                                    base_pred=_IVF_INC_BASE)
    base_rows = _index_rows(spark, pc)
    assert base_rows < rows_a  # strict subset: the append added rows
    ivf_incremental_append(spark, pc, new, marker="all")
    assert _index_rows(spark, pc) == rows_a

    q = _query_vec(spark, SF_SMALL)
    got_a = [(r.vec_id, r.score) for r in
             ivf_incremental_probe_topk(spark, pa, q, 10, nprobe=4,
                                        exclude_id=0).collect()]
    got_b = [(r.vec_id, r.score) for r in
             ivf_incremental_probe_topk(spark, pb, q, 10, nprobe=4,
                                        exclude_id=0).collect()]
    assert got_a == got_b and len(got_a) == 10


def test_append_marker_is_idempotent(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    p = build_ivf_incremental_base(spark, SF_SMALL, k_clusters=8,
                                   base_pred=_IVF_INC_BASE)
    new = _emb(spark).where(F.expr(_IVF_INC_NEW))
    ivf_incremental_append(spark, p, new, marker="m1")
    n1 = spark.read.parquet(p).count()
    ivf_incremental_append(spark, p, new, marker="m1")  # no-op
    assert spark.read.parquet(p).count() == n1


def test_tombstones_filter_and_compact_rewrites_only_hit_partitions(
        spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    p = build_ivf_incremental_base(spark, SF_SMALL, k_clusters=8)
    q = _query_vec(spark, SF_SMALL)
    before = [r.vec_id for r in
              ivf_incremental_probe_topk(spark, p, q, 10, nprobe=4,
                                         exclude_id=0).collect()]
    # tombstone the current top hit: it must vanish from the results
    victim = before[0]
    ivf_incremental_delete(p, [victim])
    after = [r.vec_id for r in
             ivf_incremental_probe_topk(spark, p, q, 10, nprobe=4,
                                        exclude_id=0).collect()]
    assert victim not in after and len(after) == 10
    assert after[:9] == before[1:10]

    # compaction: physical state drops the victim, probe unchanged,
    # and partitions without tombstones are not rewritten
    files_before = {
        d: sorted(os.listdir(os.path.join(p, d)))
        for d in os.listdir(p) if d.startswith("cluster_id=")
    }
    victim_cluster = spark.read.parquet(p) \
        .where(F.col("id") == victim).select("cluster_id").head().cluster_id
    ivf_incremental_compact(spark, p)
    assert json.load(open(os.path.join(p, "_tombstones.json"))) == []
    idx = spark.read.parquet(p)
    assert idx.where(F.col("id") == victim).count() == 0
    again = [r.vec_id for r in
             ivf_incremental_probe_topk(spark, p, q, 10, nprobe=4,
                                        exclude_id=0).collect()]
    assert again == after
    for d, files in files_before.items():
        if d != f"cluster_id={victim_cluster}":
            assert sorted(os.listdir(os.path.join(p, d))) == files, d

    # deleting nothing more: compact with empty sidecar is a no-op
    ivf_incremental_compact(spark, p)
    assert idx.where(F.col("id") == victim).count() == 0


def test_incremental_probe_matches_brute_force_recall(spark, tmp_path,
                                                      monkeypatch):
    """Recall sanity vs exact brute force over the LIVE rows (nprobe=8 of
    8 clusters scans everything → recall must be exact)."""
    import numpy as np

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    got = [r.vec_id for r in _ann_ivf_incremental(spark, SF_SMALL).collect()]
    rows = _emb(spark).select("vec_id", "embedding").collect()
    q = np.array(_query_vec(spark, SF_SMALL))
    qn = np.linalg.norm(q)
    scored = sorted(
        (
            -float(np.dot(v, q) / ((np.linalg.norm(v) or 1e-12) * qn)),
            int(r.vec_id),
        )
        for r in rows
        if r.vec_id % 97 != 0 and r.vec_id != 0
        for v in [np.array([float(x) for x in r.embedding])]
    )
    exact = [vid for _, vid in scored[:10]]
    # nprobe=4 of 8: partial scan — demand >= 0.6 recall@10 and that
    # every returned id is live
    assert all(v % 97 != 0 and v != 0 for v in got)
    assert len(set(got) & set(exact)) >= 6


@pytest.mark.soak
def test_ivfpq_append_batch_split_invariance(spark, tmp_path, monkeypatch):
    """The compressed-index twin: frozen centroids AND codebooks make
    append order-free — one-batch vs two-batch appends produce identical
    (id, cluster_id, codes) states and identical probe rows."""
    from skywalking_banyandb_spark.sources.ann_index import (
        build_ivfpq_incremental_base,
        ivfpq_incremental_append,
        ivfpq_incremental_probe_topk,
    )

    def _state(path):
        return {
            (r.id, r.cluster_id, tuple(r.codes))
            for r in spark.read.parquet(path)
            .select("id", "cluster_id", "codes").collect()
        }

    new = _emb(spark).where(F.expr(_IVF_INC_NEW))
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "a"))
    pa = build_ivfpq_incremental_base(spark, SF_SMALL, k_clusters=8,
                                      m_sub=16, k_cw=32,
                                      base_pred=_IVF_INC_BASE)
    ivfpq_incremental_append(spark, pa, new, m_sub=16, marker="all")

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "b"))
    pb = build_ivfpq_incremental_base(spark, SF_SMALL, k_clusters=8,
                                      m_sub=16, k_cw=32,
                                      base_pred=_IVF_INC_BASE)
    ivfpq_incremental_append(
        spark, pb, new.where(F.expr("vec_id % 20 = 0")), m_sub=16,
        marker="b1")
    ivfpq_incremental_append(
        spark, pb, new.where(F.expr("vec_id % 20 = 10")), m_sub=16,
        marker="b2")
    assert _state(pa) == _state(pb)

    q = _query_vec(spark, SF_SMALL)
    got_a = [(r.vec_id, r.score) for r in
             ivfpq_incremental_probe_topk(spark, pa, q, 10, nprobe=4,
                                          m_sub=16, exclude_id=0).collect()]
    got_b = [(r.vec_id, r.score) for r in
             ivfpq_incremental_probe_topk(spark, pb, q, 10, nprobe=4,
                                          m_sub=16, exclude_id=0).collect()]
    assert got_a == got_b and len(got_a) == 10


def test_incremental_probes_prune_partitions(spark, tmp_path, monkeypatch):
    """Scale gate: both incremental probes read only the nprobe nearest
    cluster_id partitions (PartitionFilters), never the whole index."""
    from skywalking_banyandb_spark.sources.ann_index import (
        build_ivfpq_incremental_base,
        ivfpq_incremental_probe_topk,
    )

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    q = _query_vec(spark, SF_SMALL)
    p1 = build_ivf_incremental_base(spark, SF_SMALL, k_clusters=8,
                                    base_pred=_IVF_INC_BASE)
    df1 = ivf_incremental_probe_topk(spark, p1, q, 10, nprobe=4,
                                     exclude_id=0)
    plan1 = df1._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan1 and "cluster_id" in plan1, plan1

    p2 = build_ivfpq_incremental_base(spark, SF_SMALL, k_clusters=8,
                                      m_sub=16, k_cw=32,
                                      base_pred=_IVF_INC_BASE)
    df2 = ivfpq_incremental_probe_topk(spark, p2, q, 10, nprobe=4,
                                       m_sub=16, exclude_id=0)
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan2 and "cluster_id" in plan2, plan2


def test_retrain_equals_one_shot_over_live_rows(spark, tmp_path,
                                                monkeypatch):
    """Centroid-drift answer (SCALE.md): re-train + atomic swap over the
    LIVE rows must equal a one-shot base build over the same live
    corpus — fresh centroids from the identical md5 sample, identical
    (id, cluster_id) state, identical probe rows; tombstones are
    physically gone and applied-batch markers survive."""
    import json as _json

    from skywalking_banyandb_spark.sources.ann_index import (
        ivf_incremental_retrain,
    )

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "a"))
    pa = build_ivf_incremental_base(spark, SF_SMALL, k_clusters=8,
                                    base_pred=_IVF_INC_BASE)
    new = _emb(spark).where(F.expr(_IVF_INC_NEW))
    ivf_incremental_append(spark, pa, new, marker="inc")
    dead = [r.vec_id for r in _emb(spark)
            .where(F.expr("vec_id % 97 = 0")).select("vec_id").collect()]
    ivf_incremental_delete(pa, dead)
    ivf_incremental_retrain(spark, pa, k_clusters=8)

    # one-shot over the live corpus (everything minus the tombstones)
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "b"))
    pb = build_ivf_incremental_base(spark, SF_SMALL, k_clusters=8,
                                    base_pred="vec_id % 97 != 0")
    assert _index_rows(spark, pa) == _index_rows(spark, pb)
    assert _json.load(open(os.path.join(pa, "_tombstones.json"))) == []
    assert os.path.exists(os.path.join(pa, "_applied_inc"))
    # centroids were RETRAINED: the json matches the one-shot's
    ca = _json.load(open(os.path.join(pa, "_centroids.json")))
    cb = _json.load(open(os.path.join(pb, "_centroids.json")))
    assert ca == cb

    q = _query_vec(spark, SF_SMALL)
    got_a = [(r.vec_id, r.score) for r in
             ivf_incremental_probe_topk(spark, pa, q, 10, nprobe=4,
                                        exclude_id=0).collect()]
    got_b = [(r.vec_id, r.score) for r in
             ivf_incremental_probe_topk(spark, pb, q, 10, nprobe=4,
                                        exclude_id=0).collect()]
    assert got_a == got_b and len(got_a) == 10


@pytest.mark.soak
def test_ivfpq_retrain_equals_one_shot_over_live_rows(spark, tmp_path,
                                                      monkeypatch):
    """Compressed-index retrain: fresh centroids AND codebooks from the
    live rows, state + probe identical to a one-shot base build over the
    same corpus; tombstones physically gone."""
    import json as _json

    from skywalking_banyandb_spark.sources.ann_index import (
        build_ivfpq_incremental_base,
        ivfpq_incremental_append,
        ivfpq_incremental_probe_topk,
        ivfpq_incremental_retrain,
    )

    def _state(path):
        return {
            (r.id, r.cluster_id, tuple(r.codes))
            for r in spark.read.parquet(path)
            .select("id", "cluster_id", "codes").collect()
        }

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "a"))
    pa = build_ivfpq_incremental_base(spark, SF_SMALL, k_clusters=8,
                                      m_sub=16, k_cw=32,
                                      base_pred=_IVF_INC_BASE)
    ivfpq_incremental_append(
        spark, pa, _emb(spark).where(F.expr(_IVF_INC_NEW)), m_sub=16,
        marker="inc")
    dead = [r.vec_id for r in _emb(spark)
            .where(F.expr("vec_id % 97 = 0")).select("vec_id").collect()]
    ivf_incremental_delete(pa, dead)
    ivfpq_incremental_retrain(spark, pa, k_clusters=8, m_sub=16, k_cw=32)

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "b"))
    pb = build_ivfpq_incremental_base(spark, SF_SMALL, k_clusters=8,
                                      m_sub=16, k_cw=32,
                                      base_pred="vec_id % 97 != 0")
    assert _state(pa) == _state(pb)
    assert _json.load(open(os.path.join(pa, "_tombstones.json"))) == []

    q = _query_vec(spark, SF_SMALL)
    got_a = [(r.vec_id, r.score) for r in
             ivfpq_incremental_probe_topk(spark, pa, q, 10, nprobe=4,
                                          m_sub=16, exclude_id=0).collect()]
    got_b = [(r.vec_id, r.score) for r in
             ivfpq_incremental_probe_topk(spark, pb, q, 10, nprobe=4,
                                          m_sub=16, exclude_id=0).collect()]
    assert got_a == got_b and len(got_a) == 10


def test_index_path_keyed_by_base_pred(tmp_path, monkeypatch):
    """ADVICE r7: the persisted-index key must include the base
    predicate — two consumers with different base subsets must NOT share
    a directory (the frozen artifacts would be trained on the wrong
    base)."""
    from skywalking_banyandb_spark.sources.ann_index import (
        ivfpq_incremental_index_path,
    )

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    p_all = ivf_incremental_index_path(SF_SMALL, 8)
    p_base = ivf_incremental_index_path(SF_SMALL, 8, _IVF_INC_BASE)
    p_other = ivf_incremental_index_path(SF_SMALL, 8, "vec_id % 97 != 0")
    assert len({p_all, p_base, p_other}) == 3
    # deterministic: same predicate → same directory
    assert p_base == ivf_incremental_index_path(SF_SMALL, 8, _IVF_INC_BASE)
    q_base = ivfpq_incremental_index_path(SF_SMALL, 8, 16, 32,
                                          _IVF_INC_BASE)
    q_other = ivfpq_incremental_index_path(SF_SMALL, 8, 16, 32,
                                           "vec_id % 97 != 0")
    assert q_base != q_other


def test_ivfpq_topk_sql_base_pred_requires_placeholder():
    """ADVICE r7: a raw-column base predicate is rejected — the old
    textual replace silently corrupted predicates where the id column
    name occurred as a substring of another identifier."""
    import pytest

    from skywalking_banyandb_spark.functions import similarity as sim

    with pytest.raises(ValueError, match="template over"):
        sim.ivfpq_topk_sql("embeddings", "vec_id", "embedding", 0, 10,
                           base_pred="vec_id % 10 != 0")
    # the placeholder form renders both alias contexts correctly
    sql = sim.ivfpq_topk_sql("embeddings", "vec_id", "embedding", 0, 10,
                             base_pred="{id} % 10 != 0")
    assert "eid % 10 != 0" in sql and "en.eid % 10 != 0" in sql


def test_rebuild_trigger_fires_at_append_fraction(spark, tmp_path,
                                                  monkeypatch):
    """The documented maintenance policy (VERDICT r12 Next #4): an
    incremental index must mandate a retrain once appends grow the
    corpus past REBUILD_APPEND_FRACTION of its size at the last
    (re)build; a retrain resets the baseline and the trigger."""
    from skywalking_banyandb_spark.sources.ann_index import (
        REBUILD_APPEND_FRACTION,
        incremental_appended_fraction,
        incremental_needs_retrain,
        ivf_incremental_retrain,
    )

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    p = build_ivf_incremental_base(spark, SF_SMALL, k_clusters=8,
                                   base_pred="vec_id % 2 = 0")
    assert incremental_appended_fraction(spark, p) == 0.0
    assert not incremental_needs_retrain(spark, p)
    # append ~60% of the base size: past the 0.5 threshold
    base_n = _emb(spark).where("vec_id % 2 = 0").count()
    batch = (_emb(spark).where("vec_id % 2 = 1")
             .orderBy("vec_id").limit(int(0.6 * base_n)))
    ivf_incremental_append(spark, p, batch, marker="b60")
    frac = incremental_appended_fraction(spark, p)
    assert frac > REBUILD_APPEND_FRACTION
    assert incremental_needs_retrain(spark, p)
    # retrain re-baselines: the trigger resets
    ivf_incremental_retrain(spark, p, k_clusters=8)
    assert incremental_appended_fraction(spark, p) == 0.0
    assert not incremental_needs_retrain(spark, p)


def test_build_count_backfills_for_legacy_indexes(spark, tmp_path,
                                                  monkeypatch):
    """Indexes persisted before the _build_count sidecar existed must
    not crash the trigger: the first observation backfills the current
    count as the baseline (growth measured from then on)."""
    from skywalking_banyandb_spark.sources.ann_index import (
        incremental_appended_fraction,
        incremental_needs_retrain,
    )

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    p = build_ivf_incremental_base(spark, SF_SMALL, k_clusters=8,
                                   base_pred="vec_id % 2 = 0")
    os.remove(os.path.join(p, "_build_count.json"))
    assert incremental_appended_fraction(spark, p) == 0.0
    assert os.path.exists(os.path.join(p, "_build_count.json"))
    assert not incremental_needs_retrain(spark, p)
