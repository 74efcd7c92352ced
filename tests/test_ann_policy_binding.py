"""Probe-side binding of the √n k-policy (VERDICT r14 wrong #1 / Next #1).

The r14 policy resolved ``k_clusters=None`` from a LIVE corpus count on
EVERY default-k call — build and probe alike. For a probe that is two
defects at 100 TB: (a) an existing index never spared the probe the
full-corpus count job, and (b) after the corpus grew — the normal state
of a pipeline — the re-derived k missed the existing directory and the
probe silently ran an O(corpus) index BUILD inside what the caller
believed was a pruned sub-second read. Since r15 the resolved k is
persisted in the index's ``_meta.json`` and a default-k probe BINDS to
the newest policy-built index (``ann_index._bind_policy_index``): no
count, no build, and a clear error when no policy index exists.

Reference parity note: BanyanDB's own inverted/LSM indexes are similarly
write-time artifacts that queries only read (banyand/internal/storage,
pkg/index) — a read path that could silently rewrite the index would be
a storage-engine bug there too.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from skywalking_banyandb_spark.functions import similarity as sim
from skywalking_banyandb_spark.sources import ann_index as ai
from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL


@pytest.fixture()
def grown_corpus(spark, tmp_path):
    """A private corpus dir seeded from sf0.001 embeddings, plus an
    index root — so the test can grow the corpus (the read-only
    /root/testdata never changes size) and watch what a default-k
    probe does about it."""
    corpus = tmp_path / "corpus"
    emb = read_table(spark, f"{SF_SMALL}/embeddings.parquet")
    emb.write.parquet(str(corpus / "embeddings.parquet"))
    return str(corpus), emb


def _listing(index_root: str) -> dict:
    out = {}
    for base, _dirs, files in os.walk(index_root):
        rel = os.path.relpath(base, index_root)
        out[rel] = sorted(files)
    return out


def test_probe_after_corpus_growth_binds_to_original_index(
        spark, monkeypatch, tmp_path, grown_corpus):
    """The r15 done-criterion: build with the default k, GROW the
    corpus past a policy-k boundary, re-probe with ``k_clusters=None``
    — the ORIGINAL index must be probed (no new directory, no corpus
    count job, no build), proven by (1) a byte-level index-tree listing
    snapshot, and (2) monkeypatched tripwires on every path that could
    touch the source corpus or re-resolve k."""
    corpus, emb = grown_corpus
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    n0 = emb.count()
    built = ai.build_ivf_sampled_index(spark, corpus)      # default k
    k0 = sim.default_k_clusters(n0)
    assert f"k{k0}" in os.path.basename(built)
    meta = json.load(open(os.path.join(built, "_meta.json")))
    assert meta == {"kind": "ivfs2", "k_clusters": k0, "policy_k": True}

    # grow the corpus enough that the live policy k CHANGES — the exact
    # precondition under which the r14 probe silently full-rebuilt
    grown = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding",
        *[c for c in emb.columns if c not in ("vec_id", "embedding")])
    grown.write.mode("append").parquet(f"{corpus}/embeddings.parquet")
    n1 = read_table(spark, f"{corpus}/embeddings.parquet").count()
    assert sim.default_k_clusters(n1) != k0

    before = _listing(str(tmp_path / "idx"))
    q = [float(x) for x in emb.where("vec_id = 1").first()["embedding"]]

    def _trip(*_a, **_k):
        raise AssertionError("a default-k PROBE must never touch the "
                             "source corpus, resolve k, or build")

    monkeypatch.setattr(ai, "read_table", _trip)
    monkeypatch.setattr(ai, "resolve_k_clusters", _trip)
    monkeypatch.setattr(ai, "build_ivf_sampled_index", _trip)
    got = ai.ivf_sampled_probe_topk(
        spark, corpus, q, 10, k_clusters=None, exclude_id=1).collect()
    assert len(got) == 10
    # ... and the index tree is byte-for-byte the pre-probe tree: the
    # probe neither minted a k(n1) sibling nor rewrote the k(n0) index
    assert _listing(str(tmp_path / "idx")) == before


def test_probe_default_without_policy_index_raises(
        spark, monkeypatch, tmp_path, grown_corpus):
    """No policy index → a default-k probe REFUSES with a build-
    explicitly error instead of running an O(corpus) build."""
    corpus, emb = grown_corpus
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    q = [float(x) for x in emb.where("vec_id = 1").first()["embedding"]]
    with pytest.raises(ValueError, match="build explicitly"):
        ai.ivf_sampled_probe_topk(spark, corpus, q, 10, k_clusters=None)
    # an EXPLICIT-k index alone doesn't satisfy the default either: the
    # user asked for "the policy index", not "whatever index exists"
    ai.build_ivf_sampled_index(spark, corpus, k_clusters=8)
    with pytest.raises(ValueError, match="policy-built"):
        ai.ivf_sampled_probe_topk(spark, corpus, q, 10, k_clusters=None)


def test_ivfpq_probe_binding_matches_non_k_params(
        spark, monkeypatch, tmp_path, grown_corpus):
    """The compressed probes bind on (kind, m_sub, k_cw) — a policy
    index built at different PQ geometry must not satisfy the default."""
    corpus, emb = grown_corpus
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    q = [float(x) for x in emb.where("vec_id = 1").first()["embedding"]]
    built = ai.build_ivfpq_index(spark, corpus, m_sub=16, k_cw=32)
    got = ai.ivfpq_probe_topk(spark, corpus, q, 10, k_clusters=None,
                              m_sub=16, k_cw=32).collect()
    assert len(got) == 10
    meta = json.load(open(os.path.join(built, "_meta.json")))
    assert meta["policy_k"] and meta["m_sub"] == 16 and meta["k_cw"] == 32
    with pytest.raises(ValueError, match="no policy-built"):
        ai.ivfpq_probe_topk(spark, corpus, q, 10, k_clusters=None,
                            m_sub=8, k_cw=32)


def test_retrain_rejects_unknown_string_k():
    """ADVICE r14 #2: any string other than 'policy' raises a clear
    ValueError — validated BEFORE any file access, so a typo fails fast
    instead of as an opaque Py4J .limit() type error."""
    for fn in (ai.ivf_incremental_retrain, ai.ivfpq_incremental_retrain):
        for bad in ("Policy", "auto", ""):
            with pytest.raises(ValueError, match="'policy'"):
                fn(None, "/nonexistent-index-path", bad)


def test_retrain_meta_policy_stickiness(spark, tmp_path):
    """_meta.json through retrain swaps: preserve-retrain keeps the
    policy flag (the index is still the one the policy build produced),
    ``"policy"`` re-stamps it with the resized k, an explicit int
    CLEARS it — an explicitly-sized index must never be what a
    default-k probe binds to."""
    path = ai.build_ivf_incremental_base(
        spark, SF_SMALL, base_pred="vec_id % 5 = 0", root=str(tmp_path))
    meta = json.load(open(os.path.join(path, "_meta.json")))
    assert meta["policy_k"] is True
    k0 = meta["k_clusters"]

    ai.ivf_incremental_retrain(spark, path)              # preserve
    meta = json.load(open(os.path.join(path, "_meta.json")))
    assert meta["policy_k"] is True and meta["k_clusters"] == k0

    emb = read_table(spark, f"{SF_SMALL}/embeddings.parquet")
    ai.ivf_incremental_append(spark, path, emb.where("vec_id % 5 <> 0"))
    ai.ivf_incremental_retrain(spark, path, k_clusters="policy")
    meta = json.load(open(os.path.join(path, "_meta.json")))
    assert meta["policy_k"] is True
    assert meta["k_clusters"] == sim.default_k_clusters(emb.count())

    ai.ivf_incremental_retrain(spark, path, k_clusters=8)
    meta = json.load(open(os.path.join(path, "_meta.json")))
    assert meta["policy_k"] is False and meta["k_clusters"] == 8
