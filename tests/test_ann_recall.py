"""ANN recall gate (VERDICT r7 #6): approximation quality is now a
tracked, floor-asserted number. Every approximate probe's recall@10 vs
brute-force cosine is measured over a deterministic md5-sampled query
panel at the registry entries' own probe configuration — a codebook,
shortlist or probe regression that silently degrades ranking quality
fails here even though every hash gate still passes (the DuckDB oracle
faithfully reproduces the same degraded approximation).

Floors are calibrated against measured values at BOTH the driver's
correctness SF and the bench SF (sf0.001/sf0.1 measured r8:
ivf .99/.99, pq .96/.94, ivfpq .96/.95, residual .95/.99,
ivf_incremental .99/.94, ivfpq_incremental .96/.95, lsh .61/.71 —
LSH's lower band is inherent to L=4/b=6/hamming≤1 candidate
generation, its role is dedup candidate pruning, not high-recall
search; the floor documents that contract)."""

from __future__ import annotations

import pytest

from skywalking_banyandb_spark.sources.ann_recall import ann_recall_at_k

from conftest import SF_SMALL

FLOORS = {
    "ivf": 0.9,
    "pq": 0.9,
    "ivfpq": 0.9,
    "ivfpq_residual": 0.9,
    "ivf_incremental": 0.9,
    "ivfpq_incremental": 0.9,
    "lsh": 0.55,
}


@pytest.fixture(scope="module")
def recalls(spark):
    return ann_recall_at_k(spark, SF_SMALL, k=10, n_queries=8)


@pytest.mark.parametrize("method", sorted(FLOORS))
def test_recall_floor(recalls, method):
    assert method in recalls, f"{method} not measured"
    assert recalls[method] >= FLOORS[method], (
        f"recall@10 for {method} = {recalls[method]} "
        f"below floor {FLOORS[method]}")


def test_panel_is_deterministic(spark):
    from skywalking_banyandb_spark.sources.ann_recall import query_panel

    p1 = query_panel(spark, SF_SMALL, 8)
    p2 = query_panel(spark, SF_SMALL, 8)
    assert p1 == p2
    assert len({qid for qid, _ in p1}) == 8


@pytest.mark.soak
def test_policy_retrain_sequence_matches_from_scratch(spark, tmp_path):
    """The bench's append→needs_retrain→retrain(k="policy")→recall row
    (VERDICT r14 Next #6): the trigger fires at 100% growth, the resize
    lands on the live-rows policy k, and post-retrain recall EQUALS the
    fresh policy build's — retrain re-derives the same smallest-md5
    centroid sample from the same live rows, so the two indexes are the
    same artifact (the strongest form of ">= the from-scratch floor")."""
    from skywalking_banyandb_spark.sources.ann_recall import (
        ann_policy_retrain_sequence,
    )

    rec = ann_policy_retrain_sequence(spark, SF_SMALL, str(tmp_path))
    assert rec["needs_retrain_fired"] is True          # 100% > 50%
    assert rec["k_after"] == rec["k_policy_live"] > rec["k_before"]
    assert rec["meta_policy_k"] is True
    assert rec["recall_after_policy_retrain"] == rec["recall_from_scratch"]
