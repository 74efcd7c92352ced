"""Distributed BPE trainer (functions/bpe.py) vs a from-scratch local
Python reference: identical merge sequences (pair + count per step),
identical final vocabulary segmentation, and tokenization via apply_bpe
matches replaying the merges locally. Both sides share only the
DETERMINISM CONTRACT (max count, lexicographically-smallest-pair
tie-break, greedy left-to-right replacement) — not code."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from skywalking_banyandb_spark.functions.bpe import (
    END,
    apply_bpe,
    learn_bpe,
)
from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL

N_MERGES = 12


def _local_bpe(texts, n_merges):
    """Reference implementation (Sennrich et al. 2016 pseudocode)."""
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    segs = {w: list(w) + [END] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, f in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        # max count, then lexicographically smallest "a b" string
        best = min(pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (a, b), n = best
        merges.append((a, b, n))
        for w in segs:
            s, out, pend = segs[w], [], None
            for sym in s:
                if pend is not None and pend == a and sym == b:
                    out.append(a + b)
                    pend = None
                else:
                    if pend is not None:
                        out.append(pend)
                    pend = sym
            if pend is not None:
                out.append(pend)
            segs[w] = out
    return merges, segs


def test_learn_bpe_matches_reference(spark):
    docs = read_table(spark, f"{SF_SMALL}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    want_merges, want_segs = _local_bpe(texts, N_MERGES)

    got_merges = learn_bpe(docs, "text", N_MERGES)
    assert got_merges == want_merges

    # tokenization with the trained merges matches the reference's final
    # word segmentation
    toks = apply_bpe(docs.limit(20), "text", got_merges)
    for r in toks.collect():
        expect = []
        for w in r.text.split(" "):
            if w:
                expect.extend(want_segs[w])
        assert list(r.bpe_tokens) == expect


def test_bpe_merges_are_meaningful(spark):
    """The corpus has a small repeated vocabulary, so early merges must
    have high counts and build multi-char symbols."""
    docs = read_table(spark, f"{SF_SMALL}/documents.parquet")
    merges = learn_bpe(docs, "text", 5)
    assert len(merges) == 5
    assert merges[0][2] >= merges[-1][2] > 0
    assert any(len(a + b) > 2 for a, b, _ in merges)


def test_bpe_no_python_udf(spark):
    docs = read_table(spark, f"{SF_SMALL}/documents.parquet")
    merges = learn_bpe(docs, "text", 3)
    df = apply_bpe(docs, "text", merges)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_learn_bpe_releases_superseded_checkpoints(spark):
    """ADVICE r4: executor storage must hold O(1) vocab snapshots, not one
    per merge — the training loop unpersists each superseded checkpoint."""
    sc = spark.sparkContext
    before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    df = spark.createDataFrame(
        [("low lower lowest newest new",), ("wide wider widest low new",)],
        "text string")
    from skywalking_banyandb_spark.functions.bpe import learn_bpe

    merges = learn_bpe(df, "text", n_merges=6)
    assert len(merges) >= 4
    now = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    # only the FINAL vocab checkpoint may remain cached
    assert len(now - before) <= 1, (before, now)
