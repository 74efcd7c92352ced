"""Write-time MinHash index: probe ≡ full pipeline restricted to cross
pairs; append ≡ one-shot rebuild; idempotent atomic build.

The index stores the SAME band hashes, shingle sets, and duplicate
classes the self-join pipeline computes transiently (shared helpers in
functions/dedup.py), so an index-vs-batch probe must reproduce
``minhash_lsh_pairs`` over the union corpus filtered to (index-side,
batch-side) pairs — bit-equal jaccards included. That is the whole
correctness story: any drift in shingling, hashing, banding, collapse,
or verification breaks the equality on the first differing pair.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from skywalking_banyandb_spark.functions import dedup as dd
from skywalking_banyandb_spark.sources import minhash_index as mh
from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL


@pytest.fixture(autouse=True)
def _index_dir(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    dd.release_minhash_cache()
    yield
    dd.release_minhash_cache()


@pytest.fixture()
def docs(spark):
    return read_table(spark, f"{SF_SMALL}/documents.parquet")


def _probe_rows(spark, docs, base_pred: str, batch_pred: str,
                **params) -> list:
    path = mh.build_minhash_index(spark, SF_SMALL, base_pred=base_pred,
                                  **params)
    batch = docs.where(batch_pred)
    pairs = mh.minhash_probe_pairs(spark, path, batch, "doc_id", "text",
                                   threshold=0.5)
    return sorted((r.a, r.b, r.jaccard) for r in pairs.collect())


def _full_cross_rows(docs, base_pred: str, **kw) -> list:
    """Full self-join pipeline over the whole corpus, filtered to pairs
    with exactly one side satisfying ``base_pred``, oriented base-first."""
    full = dd.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5, **kw)
    a_base = F.expr(base_pred.replace("doc_id", "a"))
    b_base = F.expr(base_pred.replace("doc_id", "b"))
    cross = full.where(a_base != b_base).select(
        F.when(a_base, F.col("a")).otherwise(F.col("b")).alias("a"),
        F.when(a_base, F.col("b")).otherwise(F.col("a")).alias("b"),
        "jaccard",
    )
    return sorted((r.a, r.b, r.jaccard) for r in cross.collect())


def test_probe_matches_full_pipeline_cross_pairs(spark, docs):
    base = "doc_id % 2 = 0"
    got = _probe_rows(spark, docs, base, "doc_id % 2 = 1")
    want = _full_cross_rows(docs, base)
    assert got == want and len(got) > 0


def test_probe_matches_full_pipeline_3gram(spark, docs):
    base = "doc_id % 2 = 0"
    got = _probe_rows(spark, docs, base, "doc_id % 2 = 1", n=3)
    want = _full_cross_rows(docs, base, n=3)
    assert got == want


def test_append_then_probe_equals_oneshot_rebuild(spark, docs):
    """index(A) ⊕ append(B1), probed with B2, equals a one-shot index
    over A ∪ B1 probed with B2 — arrival order cannot change results."""
    path = mh.build_minhash_index(spark, SF_SMALL,
                                  base_pred="doc_id % 3 = 0")
    b1 = docs.where("doc_id % 3 = 1")
    mh.minhash_index_append(spark, path, b1, "doc_id", "text")
    b2 = docs.where("doc_id % 3 = 2")
    got = sorted(
        (r.a, r.b, r.jaccard)
        for r in mh.minhash_probe_pairs(
            spark, path, b2, "doc_id", "text").collect())
    oneshot = mh.build_minhash_index(spark, SF_SMALL,
                                     base_pred="doc_id % 3 <> 2")
    want = sorted(
        (r.a, r.b, r.jaccard)
        for r in mh.minhash_probe_pairs(
            spark, oneshot, b2, "doc_id", "text").collect())
    assert got == want and len(got) > 0


def test_identical_text_across_corpora_pairs_at_one(spark, docs):
    """A batch doc byte-identical to an indexed doc must always pair at
    jaccard 1.0 (identical shingle sets → identical signatures → every
    band collides) — the duplicate-collapse carries across corpora."""
    path = mh.build_minhash_index(spark, SF_SMALL,
                                  base_pred="doc_id % 2 = 0")
    twin = (docs.where("doc_id % 2 = 0").limit(1)
            .select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    src = int(twin.select(F.col("doc_id") - 1000000).first()[0])
    pairs = mh.minhash_probe_pairs(spark, path, twin, "doc_id", "text")
    hit = pairs.where(F.col("a") == src).collect()
    assert len(hit) == 1 and hit[0].jaccard == 1.0
    assert hit[0].b == src + 1000000


def test_build_is_idempotent_and_atomic(spark):
    p1 = mh.build_minhash_index(spark, SF_SMALL, base_pred="doc_id % 2 = 0")
    stamp = os.path.getmtime(os.path.join(p1, "_meta.json"))
    p2 = mh.build_minhash_index(spark, SF_SMALL, base_pred="doc_id % 2 = 0")
    assert p1 == p2
    assert os.path.getmtime(os.path.join(p1, "_meta.json")) == stamp
    import glob
    assert not glob.glob(p1 + ".tmp*")   # per-builder tmp dirs cleaned up
    # distinct base predicates get distinct artifacts (ADVICE r7 on the
    # IVF family: a shared path across base subsets silently trains on
    # the wrong base)
    p3 = mh.build_minhash_index(spark, SF_SMALL, base_pred="doc_id % 2 = 1")
    assert p3 != p1


def test_probe_same_batch_after_append_sees_new_docs(spark, docs):
    """Repeat probe of the SAME batch after an append must see the
    appended docs. A parquet scan canonicalizes by PATH, so the repeat
    probe's candidate plan is same-semantics with the persisted
    pre-append one — nothing may substitute that cache's frozen file
    list (today Spark's insert command recaches the written path and
    append refreshes explicitly on top; this pins the invariant rather
    than either mechanism)."""
    path = mh.build_minhash_index(spark, SF_SMALL,
                                  base_pred="doc_id % 3 = 0")
    b2 = docs.where("doc_id % 3 = 2")

    def probe():
        return sorted(
            (r.a, r.b, r.jaccard)
            for r in mh.minhash_probe_pairs(
                spark, path, b2, "doc_id", "text").collect())

    pre = probe()
    mh.minhash_index_append(spark, path, docs.where("doc_id % 3 = 1"),
                            "doc_id", "text")
    post = probe()
    oneshot = mh.build_minhash_index(spark, SF_SMALL,
                                     base_pred="doc_id % 3 <> 2")
    want = sorted(
        (r.a, r.b, r.jaccard)
        for r in mh.minhash_probe_pairs(
            spark, oneshot, b2, "doc_id", "text").collect())
    assert post == want
    assert set(pre) < set(post)   # strictly more pairs once B1 is in


def test_probe_after_absorb_is_idempotent(spark, docs):
    """Probing a batch AFTER absorbing it returns exactly the pre-absorb
    pairs: the probe anti-joins the batch's own ids out of the index, so
    an at-least-once retry whose prior attempt tore mid-absorb (index
    rows appended, ledger not committed) never emits intra-batch
    self-pairs."""
    path = mh.build_minhash_index(spark, SF_SMALL,
                                  base_pred="doc_id % 3 = 0")
    b1 = docs.where("doc_id % 3 = 1")

    def probe():
        return sorted(
            (r.a, r.b, r.jaccard)
            for r in mh.minhash_probe_pairs(
                spark, path, b1, "doc_id", "text").collect())

    pre = probe()
    mh.minhash_index_append(spark, path, b1, "doc_id", "text")  # torn:
    # rows are in the index, no ledger entry — the retry path
    assert probe() == pre


def test_zero_shingle_identical_twins_pair_across_corpora(spark, tmp_path):
    """Byte-identical docs whose text tokenizes to NO shingles (empty /
    punctuation-only) can never band-collide — no signature rows — but
    the full pipeline pairs them at jaccard 1.0 through its within-class
    path, so the probe must too (cls-equality path on zero-shingle
    classes). Probe ≡ full-pipeline-cross holds on a corpus containing
    such docs."""
    rows = [
        (0, ""), (1, ""),                       # identical zero-shingle twins
        (2, "??!!"), (3, "!!??"),               # zero-shingle, NOT identical
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "the quick brown fox jumps over the lazy dog"),
        (6, "a completely different document about spark"),
        (7, "another unrelated text body entirely"),
        (8, None), (9, None),                   # NULL-text twins: one class
        # under GROUP BY md5(text) in both engines, paired at 1.0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    path = mh.build_minhash_index(spark, str(tmp_path),
                                  base_pred="doc_id % 2 = 0")
    got = sorted(
        (r.a, r.b, r.jaccard)
        for r in mh.minhash_probe_pairs(
            spark, path, docs.where("doc_id % 2 = 1"),
            "doc_id", "text").collect())
    want = _full_cross_rows(docs, "doc_id % 2 = 0")
    assert got == want
    assert (0, 1, 1.0) in got                   # the zero-shingle twins
    assert (8, 9, 1.0) in got                   # the NULL-text twins
    assert not any({a, b} == {2, 3} for a, b, _ in got)  # not identical
    assert not any({a, b} == {0, 9} for a, b, _ in got)  # '' text != NULL


def test_concurrent_absorb_raises_instead_of_losing_a_key(spark, docs):
    """The absorb ledger is a read-modify-write of one JSON file; two
    interleaved absorbers could silently drop a key. The flock guard
    makes the second absorber fail LOUDLY (ADVICE r12 #4): while one
    absorber holds the lock, a concurrent absorb — even with a distinct
    batch key — raises ConcurrentAbsorbError and leaves the ledger
    untouched; after release the same absorb succeeds."""
    path = mh.build_minhash_index(spark, SF_SMALL,
                                  base_pred="doc_id % 3 = 0")
    b1 = docs.where("doc_id % 3 = 1")
    holder = mh._absorb_lock(path)
    holder.__enter__()   # a second absorber, mid-flight
    try:
        with pytest.raises(mh.ConcurrentAbsorbError):
            mh.minhash_index_absorb(spark, path, b1, "doc_id", "text",
                                    "batch-b1")
        assert mh.absorbed_batches(path) == set()   # ledger untouched
    finally:
        holder.__exit__(None, None, None)
    assert mh.minhash_index_absorb(spark, path, b1, "doc_id", "text",
                                   "batch-b1") is True
    assert mh.absorbed_batches(path) == {"batch-b1"}
    # replay is still an idempotent no-op (lock released between calls)
    assert mh.minhash_index_absorb(spark, path, b1, "doc_id", "text",
                                   "batch-b1") is False


def test_n_shingles_is_ansi_config_independent(spark):
    """NULL text must count as 0 shingles regardless of the session's
    size(NULL) semantics: ANSI-on yields NULL, legacy.sizeOfNull yields
    -1 — either would silently drop NULL-text docs out of the
    zero-shingle twin pairing (ADVICE r12 #3). Coalescing the ARRAY to
    array() before size is correct under every config."""
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "??!!"), (3, "real text here")],
        "doc_id long, text string")
    saved = spark.conf.get("spark.sql.ansi.enabled", "true")
    for ansi, legacy in (("true", "false"), ("false", "true"),
                         ("false", "false")):
        spark.conf.set("spark.sql.ansi.enabled", ansi)
        spark.conf.set("spark.sql.legacy.sizeOfNull", legacy)
        try:
            got = {r.doc_id: r.n for r in df.select(
                "doc_id",
                mh._n_shingles(F.col("text"), 1).alias("n")).collect()}
        finally:
            spark.conf.set("spark.sql.ansi.enabled", saved)
            spark.conf.unset("spark.sql.legacy.sizeOfNull")
        assert got[0] == 0 and got[1] == 0 and got[2] == 0, (ansi, legacy, got)
        assert got[3] > 0


def _probe(spark, path, batch):
    return sorted(
        (r.a, r.b, r.jaccard)
        for r in mh.minhash_probe_pairs(
            spark, path, batch, "doc_id", "text").collect())


def test_compaction_probe_pair_exact_and_disk_shrinks(spark, docs):
    """The done-criterion (VERDICT r12 Next #2): under a re-delivery
    workload (the same batch re-appended — what a torn absorb retry or a
    fresh-checkpoint lineage replay does), compaction must (a) leave the
    probe pair-exactly unchanged, (b) merge the duplicate classes, and
    (c) shrink the on-disk index."""
    path = mh.build_minhash_index(spark, SF_SMALL,
                                  base_pred="doc_id % 3 = 0")
    b1 = docs.where("doc_id % 3 = 1")
    mh.minhash_index_absorb(spark, path, b1, "doc_id", "text", "lineageA-0")
    # re-delivery: a fresh lineage replays the same docs — absorb under a
    # NEW key appends byte-identical class/band/shingle rows
    mh.minhash_index_absorb(spark, path, b1, "doc_id", "text", "lineageB-0")
    b2 = docs.where("doc_id % 3 = 2")
    pre = _probe(spark, path, b2)
    stats = mh.minhash_index_compact(spark, path)
    assert _probe(spark, path, b2) == pre and len(pre) > 0
    assert stats["classes_after"] < stats["classes_before"]
    assert stats["bytes_after"] < stats["bytes_before"]
    # the ledger survives the swap: replaying either lineage still no-ops
    assert mh.minhash_index_absorb(
        spark, path, b1, "doc_id", "text", "lineageA-0") is False


@pytest.mark.soak
def test_compaction_merges_cross_corpus_identical_texts(spark, tmp_path):
    """Byte-identical texts indexed from DIFFERENT corpora (base build +
    absorbed batch) form equal-cls classes with different reps;
    compaction merges them into one class (union members, one rep's
    bands/shingles) and the probe is still pair-exact — including for a
    RE-DELIVERED batch, where the merged class mixes batch and non-batch
    members and only member-level exclusion gives the right answer."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumps over the lazy dog"),   # base twin
        (6, "spark compiles declarative plans with catalyst"),
        (1, "the quick brown fox jumps over the lazy dog"),   # b1 twin
        (4, "a very similar document about the quick brown fox jumping"),
        (7, "spark compiles declarative plans with catalyst"),  # b1 twin
        (2, "the quick brown fox jumps over the lazy dog"),   # b2 probe
        (5, "spark compiles declarative plans with catalyst"),
        (8, "an entirely unrelated body of text goes here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    path = mh.build_minhash_index(spark, str(tmp_path),
                                  base_pred="doc_id % 3 = 0")
    b1 = docs.where("doc_id % 3 = 1")
    pre_absorb = _probe(spark, path, b1)
    mh.minhash_index_absorb(spark, path, b1, "doc_id", "text", "e0")
    # cross-corpus duplicate classes exist iff identical texts span the
    # base/b1 split; assert the corpus exercises the merge at all
    cls_rows = spark.read.parquet(f"{path}/classes")
    dup_cls = (cls_rows.groupBy("cls").count().where("count > 1").count())
    assert dup_cls > 0, "corpus has no cross-corpus identical texts"
    b2 = docs.where("doc_id % 3 = 2")
    pre = _probe(spark, path, b2)
    mh.minhash_index_compact(spark, path)
    merged_dup = (spark.read.parquet(f"{path}/classes")
                  .groupBy("cls").count().where("count > 1").count())
    assert merged_dup == 0
    assert _probe(spark, path, b2) == pre
    assert any({a, b} <= {0, 1, 2, 3} and j == 1.0 for a, b, j in pre)
    # re-probe of the absorbed batch still sees the index as if the
    # batch were not in it — exactly the pre-absorb pairs, even though
    # batch members now live inside merged classes whose rep is a BASE
    # doc (rep = min id 0) — only member-level exclusion survives this
    assert _probe(spark, path, b1) == pre_absorb


def test_compaction_equals_oneshot_rebuild(spark, docs):
    """Compacted(A ⊕ B1) probed with B2 ≡ one-shot index over A ∪ B1
    probed with B2 — compaction cannot drift from the canonical build."""
    path = mh.build_minhash_index(spark, SF_SMALL,
                                  base_pred="doc_id % 3 = 0")
    mh.minhash_index_absorb(spark, path, docs.where("doc_id % 3 = 1"),
                            "doc_id", "text", "e0")
    mh.minhash_index_compact(spark, path)
    oneshot = mh.build_minhash_index(spark, SF_SMALL,
                                     base_pred="doc_id % 3 <> 2")
    b2 = docs.where("doc_id % 3 = 2")
    assert _probe(spark, path, b2) == _probe(spark, oneshot, b2)


def test_compaction_trigger_fires_on_duplicate_fraction(spark, docs):
    """The compaction policy (COMPACT_DUPLICATE_FRACTION): a fresh
    index never needs compaction; a re-delivered absorb pushes the
    duplicate-class fraction to ~50% and fires the trigger; compaction
    resets it."""
    path = mh.build_minhash_index(spark, SF_SMALL,
                                  base_pred="doc_id % 3 = 0")
    assert not mh.minhash_index_needs_compaction(spark, path)
    b1 = docs.where("doc_id % 3 = 1")
    mh.minhash_index_absorb(spark, path, b1, "doc_id", "text", "lineageA-0")
    mh.minhash_index_absorb(spark, path, b1, "doc_id", "text", "lineageB-0")
    assert mh.minhash_index_needs_compaction(spark, path)
    mh.minhash_index_compact(spark, path)
    assert not mh.minhash_index_needs_compaction(spark, path)


@pytest.mark.soak
def test_rep_as_batch_id_after_compaction_keeps_cross_members(
        spark, tmp_path):
    """ADVICE r13 #1 repro: when a compacted class's rep (min member id)
    is a RE-DELIVERED batch id — batch twin's doc id SMALLER than its
    base twin's — the probe's candidate self-pair (rep, rep) must
    survive to member expansion. The old rep-level ``x.id != y.id``
    filter dropped it, so the merged class's cross-corpus members were
    never expanded (pre-absorb probe [(3,1,1.0)], post-compact probe
    []). Covers both the banded path (real text) and the zero-shingle
    cls-equality path (empty text)."""
    rows = [
        (3, "the quick brown fox jumps over the lazy dog"),  # base twin
        (6, "spark compiles declarative plans with catalyst"),
        (9, ""),                             # base zero-shingle twin
        (1, "the quick brown fox jumps over the lazy dog"),  # batch twin,
        # SMALLER id than its base twin -> merged rep = batch id
        (4, ""),                             # batch zero-shingle twin
        (7, "an entirely unrelated body of text goes here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    path = mh.build_minhash_index(spark, str(tmp_path),
                                  base_pred="doc_id % 3 = 0")
    b1 = docs.where("doc_id % 3 = 1")
    pre = _probe(spark, path, b1)
    assert (3, 1, 1.0) in pre          # banded twin pair
    assert (9, 4, 1.0) in pre          # zero-shingle twin pair
    mh.minhash_index_absorb(spark, path, b1, "doc_id", "text", "e0")
    mh.minhash_index_compact(spark, path)
    reps = {r.rep for r in
            spark.read.parquet(f"{path}/classes").select("rep").collect()}
    # the merged twin classes' reps ARE the batch ids (min member)
    assert {1, 4} <= reps
    # replay-idempotency contract: re-probing the absorbed batch sees
    # the index as if the batch were not in it — the pre-absorb pairs
    assert _probe(spark, path, b1) == pre


def test_compact_stats_equal_literal_relation_counts(spark, docs):
    """r15: the compact stats ride the merge aggregate inside the
    concurrent write group (one job) instead of separate pre/post count
    jobs over classes/ — they must still equal the literal row counts of
    the classes relation before and after the swap."""
    path = mh.build_minhash_index(spark, SF_SMALL, base_pred="doc_id % 3 = 0")
    b1 = docs.where("doc_id % 3 = 1")
    mh.minhash_index_absorb(spark, path, b1, "doc_id", "text", "lineageA-0")
    mh.minhash_index_absorb(spark, path, b1, "doc_id", "text", "lineageB-0")
    before = spark.read.parquet(os.path.join(path, "classes")).count()
    stats = mh.minhash_index_compact(spark, path)
    after = spark.read.parquet(os.path.join(path, "classes")).count()
    assert stats["classes_before"] == before
    assert stats["classes_after"] == after
