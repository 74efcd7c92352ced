"""Banded-table cache window: plan-keyed reuse, not handle-FIFO
(VERDICT r11 #1).

Spark's CacheManager keys persist/unpersist by CANONICALIZED PLAN: a
repeat ``minhash_lsh_pairs`` call with the same configuration builds a
semantically identical banded table whose ``persist()`` is a no-op
against the live entry. The r11 FIFO evicted by HANDLE, so the repeat
call appended a twin, popped the old handle, and that handle's
``unpersist()`` removed the SHARED entry — every interleaved-config
bench pass ran uncached (the measured 2.31x ``dedup_minhash_lsh_3gram``
regression). These tests pin the fix: a same-config call refreshes the
live slot (MRU) and its result plan still executes against an
InMemoryRelation; only a genuinely new plan enters the window, and a
plan is unpersisted only when its last live slot leaves.
"""

from __future__ import annotations

import pytest

from skywalking_banyandb_spark.functions import dedup as dd
from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL


@pytest.fixture()
def docs(spark):
    return read_table(spark, f"{SF_SMALL}/documents.parquet")


@pytest.fixture(autouse=True)
def _clean_cache():
    dd.release_minhash_cache()
    yield
    dd.release_minhash_cache()


def _cached(df) -> bool:
    """True iff the plan executes against a live InMemoryRelation."""
    return "InMemoryRelation" in df._jdf.queryExecution().optimizedPlan().toString()


def test_third_same_config_call_hits_inmemoryrelation(docs):
    """The r11 repro: A(cfg1), B(cfg2), C(cfg1) — with a 2-slot FIFO the
    C call's twin-persist was a no-op and popping A's handle killed the
    shared entry, so C ran fully uncached. Plan-keyed LRU keeps it hot."""
    a = dd.minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.4)
    a.count()
    b = dd.minhash_lsh_pairs(docs, "doc_id", "text", n=1, threshold=0.5)
    b.count()
    c = dd.minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.4)
    assert _cached(c), (
        "third same-config call must execute against the live "
        "InMemoryRelation, not recompute the signature pipeline")
    assert c.count() == a.count()
    # the window holds exactly the two distinct configs' plans — each
    # config retains its banded table, its candidate table and its
    # verify-set table since r15 — and no twin was appended
    assert len(dd._banded_live) == 6
    hashes = [h for (_, h, _) in dd._banded_live]
    assert len(set(hashes)) == 6


def _fill_configs(docs, count: int, start_n: int = 4):
    """Issue ``count`` DISTINCT-config calls (varying shingle width)."""
    for i in range(count):
        dd.minhash_lsh_pairs(docs, "doc_id", "text", n=start_n + i,
                             threshold=0.4).count()


def test_same_config_refreshes_lru_slot(docs):
    """A repeat of the OLDEST config must survive subsequent new plans:
    after cfg1's slot is refreshed to MRU, filling the rest of the window
    with fresh configs evicts the others first — cfg1 stays cached."""
    a = dd.minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.4)
    a.count()
    # each call retains THREE plans since r15 (banded + cand + sets),
    # so fill to just under capacity without evicting cfg1's trio
    _fill_configs(docs, (dd._BANDED_KEEP - 3) // 3)
    dd.minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.4).count()
    # one more fresh config evicts the oldest NON-refreshed slot
    dd.minhash_lsh_pairs(docs, "doc_id", "text", n=2, threshold=0.4).count()
    again = dd.minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.4)
    assert _cached(again)


def test_eviction_still_bounds_window_and_recomputes_correctly(docs):
    """_BANDED_KEEP+1 DISTINCT configs overflow the window: the oldest is
    unpersisted (recompute cliff documented in the docstring) but its
    result stays CORRECT via lineage recompute."""
    a = dd.minhash_lsh_pairs(docs, "doc_id", "text", n=3, threshold=0.4)
    n_a = a.count()
    _fill_configs(docs, dd._BANDED_KEEP)
    assert len(dd._banded_live) == dd._BANDED_KEEP
    assert not _cached(a)          # evicted: plan no longer substituted
    assert a.count() == n_a        # lineage recompute, same answer


@pytest.mark.soak
def test_bench_extended_cycle_keeps_every_stable_config_resident(
        spark, docs, monkeypatch, tmp_path):
    """The r13 thrash repro (VERDICT r13 #1): the bench's extended list
    cycles FOUR stable banded plans — 3-gram K=8, unigram K=8 (shared
    by the lsh and agg entries), unigram K=32, and the incremental
    probe's candidate table — plus the compacted entry's per-run-
    SCRATCH probe, which mints a fresh plan key every pass. With
    _BANDED_KEEP=4 and the scratch probe retained in the shared window,
    every pass evicted a config it was about to need again. Replay
    three passes of the real cycle: every stable config's third pass
    must execute against an InMemoryRelation, and the scratch probes
    (retain=False) must never enter — let alone churn — the shared
    window."""
    from skywalking_banyandb_spark.sources import minhash_index as mh

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "shared"))
    stable = mh.build_minhash_index(spark, SF_SMALL,
                                    base_pred="doc_id % 2 = 0")
    batch = docs.where("doc_id % 2 = 1")

    def one_pass(scratch_root):
        outs = [
            dd.minhash_lsh_pairs(docs, "doc_id", "text", n=3,
                                 threshold=0.4),           # 3gram
            dd.minhash_lsh_pairs(docs, "doc_id", "text", n=1,
                                 threshold=0.5),           # lsh + agg
            dd.minhash_lsh_pairs(docs, "doc_id", "text", n=1,
                                 threshold=0.5, k=32, bands=16),  # k32
            mh.minhash_probe_pairs(spark, stable, batch,
                                   "doc_id", "text"),      # incremental
        ]
        scratch = mh.build_minhash_index(
            spark, SF_SMALL, base_pred="doc_id % 2 = 0",
            root=str(scratch_root))                        # compacted:
        outs.append(mh.minhash_probe_pairs(                # wiped scratch
            spark, scratch, batch, "doc_id", "text", retain=False))
        for o in outs:
            o.count()
        return outs

    one_pass(tmp_path / "s1")
    one_pass(tmp_path / "s2")
    third = one_pass(tmp_path / "s3")
    names = ("3gram", "unigram-k8", "unigram-k32", "incremental-probe")
    for name, o in zip(names, third[:4]):
        assert _cached(o), (
            f"stable config {name}'s third pass must execute against "
            "the live InMemoryRelation — the cycle evicted it")
    assert len(dd._banded_live) <= dd._BANDED_KEEP
    # the three scratch probes never entered the shared window
    assert len(dd._scratch_live) <= dd._SCRATCH_KEEP


def test_cross_window_twin_shares_one_handle(spark, docs, monkeypatch,
                                             tmp_path):
    """A plan retained once with retain=True and once with retain=False
    shares ONE CacheManager entry (persist is keyed by canonicalized
    plan), so it must be tracked under one handle: if the scratch
    window held a second handle for a stable-resident plan, a scratch
    eviction would unpersist the entry the stable window still lists
    as live — the r13 thrash reintroduced sideways. The stable claim
    wins: a scratch retain of a stable-resident twin refreshes the
    stable slot, and a stable retain of a scratch-resident twin
    PROMOTES it out of the evictable window."""
    from skywalking_banyandb_spark.sources import minhash_index as mh

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "shared"))
    path = mh.build_minhash_index(spark, SF_SMALL,
                                  base_pred="doc_id % 2 = 0")
    batch = docs.where("doc_id % 2 = 1")

    # stable first, then the identical probe as scratch
    stable = mh.minhash_probe_pairs(spark, path, batch, "doc_id", "text")
    stable.count()
    mh.minhash_probe_pairs(spark, path, batch, "doc_id", "text",
                           retain=False).count()
    assert len(dd._scratch_live) == 0       # refreshed in stable, no twin
    # churn the scratch window: the stable plan must stay resident
    for root in ("s1", "s2", "s3"):
        sp = mh.build_minhash_index(spark, SF_SMALL,
                                    base_pred="doc_id % 2 = 0",
                                    root=str(tmp_path / root))
        mh.minhash_probe_pairs(spark, sp, batch, "doc_id", "text",
                               retain=False).count()
    assert _cached(stable), (
        "scratch evictions dropped the stable window's live entry")

    # scratch first, then the identical probe as stable: promoted
    dd.release_minhash_cache()
    scratch_probe = mh.minhash_probe_pairs(spark, path, batch,
                                           "doc_id", "text", retain=False)
    scratch_probe.count()
    # a probe retains THREE scratch plans since r16 (the shared batch
    # shingle relation + cand + verify sets — VERDICT r15 Next #5)
    assert len(dd._scratch_live) == 3
    mh.minhash_probe_pairs(spark, path, batch, "doc_id", "text").count()
    assert len(dd._scratch_live) == 0       # all three promoted to stable
    assert _cached(scratch_probe)
