"""Streaming incremental dedup: the probe→emit→absorb loop over
micro-batches must equal the BATCH pipeline's cross-group pairs, and
re-delivered epochs must be no-ops (ledgered absorb + per-epoch dynamic
partition overwrite)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from skywalking_banyandb_spark.functions import dedup as dd
from skywalking_banyandb_spark.sources import minhash_index as mh
from skywalking_banyandb_spark.sources.parquet import read_table
from skywalking_banyandb_spark.streaming.incremental_dedup import (
    start_incremental_dedup,
)

from conftest import SF_SMALL


@pytest.fixture(autouse=True)
def _clean():
    dd.release_minhash_cache()
    yield
    dd.release_minhash_cache()


def _group(col):
    # arrival groups over the doc_id % 3 = 0 universe: base 0, b1, b2
    return (col % 9) / 3


def test_stream_equals_batch_cross_group_pairs(spark, tmp_path):
    """Two micro-batches (b1 then b2) probed and absorbed in order must
    emit exactly the batch pipeline's cross-GROUP pairs over the whole
    universe, oriented earlier-group-first: b1 pairs against base only;
    b2 pairs against base AND the absorbed b1."""
    docs = read_table(spark, f"{SF_SMALL}/documents.parquet") \
        .where("doc_id % 3 = 0")
    path = mh.build_minhash_index(spark, SF_SMALL,
                                  base_pred="doc_id % 9 = 0",
                                  root=str(tmp_path / "idx"))
    src = str(tmp_path / "src")
    docs.where("doc_id % 9 = 3").coalesce(1).write.parquet(f"{src}/b1")
    time.sleep(1.1)  # file-source ordering is by modification time
    docs.where("doc_id % 9 = 6").coalesce(1).write.parquet(f"{src}/b2")
    stream = (
        spark.readStream.schema(spark.read.parquet(f"{src}/b1").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    q = start_incremental_dedup(
        spark, stream, path, "doc_id", "text",
        output_path=str(tmp_path / "out"),
        checkpoint_path=str(tmp_path / "ckpt"))
    assert q.awaitTermination(timeout=300)

    got = sorted(
        (r.a, r.b, r.jaccard)
        for r in spark.read.parquet(str(tmp_path / "out")).collect())

    full = dd.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    ga, gb = _group(F.col("a")), _group(F.col("b"))
    want = sorted(
        (r.a, r.b, r.jaccard)
        for r in full.where(ga != gb).select(
            F.when(ga < gb, F.col("a")).otherwise(F.col("b")).alias("a"),
            F.when(ga < gb, F.col("b")).otherwise(F.col("a")).alias("b"),
            "jaccard").collect())
    assert got == want and len(got) > 0
    # both epochs emitted, and b2's epoch contains pairs against b1 docs
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.select("epoch").distinct().count() == 2
    assert out.where("a % 9 = 3").count() > 0


def test_redelivered_epoch_is_a_noop(spark, tmp_path):
    """Replaying the foreachBatch body with an already-absorbed epoch id
    (at-least-once redelivery) must change neither the index nor the
    output."""
    docs = read_table(spark, f"{SF_SMALL}/documents.parquet") \
        .where("doc_id % 3 = 0")
    path = mh.build_minhash_index(spark, SF_SMALL,
                                  base_pred="doc_id % 9 = 0",
                                  root=str(tmp_path / "idx"))
    b1 = docs.where("doc_id % 9 = 3")
    assert mh.minhash_index_absorb(spark, path, b1, "doc_id", "text",
                                   "epoch-0") is True
    bands_files = sorted(os.listdir(os.path.join(path, "bands")))
    assert mh.minhash_index_absorb(spark, path, b1, "doc_id", "text",
                                   "epoch-0") is False
    assert sorted(os.listdir(os.path.join(path, "bands"))) == bands_files
    assert mh.absorbed_batches(path) == {"epoch-0"}


def _stamp_ordered(src: str, *subs: str) -> None:
    """Set strictly increasing mtimes so each dir lands in its own
    micro-batch regardless of filesystem timestamp granularity."""
    now = time.time()
    for i, sub in enumerate(subs):
        d = f"{src}/{sub}"
        ts = now - 60.0 * (len(subs) - i)
        for name in os.listdir(d):
            os.utime(os.path.join(d, name), (ts, ts))


def test_streaming_resolution_equals_batch_keep_best(spark, tmp_path):
    """The per-epoch dominance decisions, folded (survivor = never
    dominated), must equal the BATCH keep-best policy computed over the
    full cross-arrival-group edge set — the same quality DESC / id ASC
    neighbor-dominance as dedup_resolution_keep_best."""
    from skywalking_banyandb_spark.functions.text import quality_score
    from skywalking_banyandb_spark.streaming.incremental_dedup import (
        resolution_survivors,
        seed_resolution_qualities,
        start_incremental_resolution,
    )

    docs = read_table(spark, f"{SF_SMALL}/documents.parquet") \
        .where("doc_id % 3 = 0")
    path = mh.build_minhash_index(spark, SF_SMALL,
                                  base_pred="doc_id % 9 = 0",
                                  root=str(tmp_path / "idx"))
    seed_resolution_qualities(docs.where("doc_id % 9 = 0"), "doc_id",
                              "text", str(tmp_path / "q"))
    src = str(tmp_path / "src")
    docs.where("doc_id % 9 = 3").coalesce(1).write.parquet(f"{src}/b1")
    docs.where("doc_id % 9 = 6").coalesce(1).write.parquet(f"{src}/b2")
    _stamp_ordered(src, "b1", "b2")
    stream = (
        spark.readStream.schema(spark.read.parquet(f"{src}/b1").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    q = start_incremental_resolution(
        spark, stream, path, "doc_id", "text",
        decisions_path=str(tmp_path / "dec"),
        qualities_path=str(tmp_path / "q"),
        checkpoint_path=str(tmp_path / "ckpt"))
    assert q.awaitTermination(timeout=300)

    got = sorted((r.node, r.q) for r in
                 resolution_survivors(spark, str(tmp_path / "dec")).collect())

    # batch formulation: dominance over the full cross-group pair set
    full = dd.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    ga, gb = _group(F.col("a")), _group(F.col("b"))
    pairs = full.where(ga != gb)
    qrel = docs.select(F.col("doc_id").alias("node"),
                       quality_score(F.col("text")).alias("q"))
    edges = (pairs.select(F.col("a").alias("node"), F.col("b").alias("nb"))
             .unionByName(pairs.select(F.col("b").alias("node"),
                                       F.col("a").alias("nb"))))
    qn = qrel.select(F.col("node").alias("nb"), F.col("q").alias("q_nb"))
    dom = (edges.join(qrel, "node").join(qn, "nb")
           .groupBy("node", "q")
           .agg(F.max((F.col("q_nb") > F.col("q"))
                      | ((F.col("q_nb") == F.col("q"))
                         & (F.col("nb") < F.col("node")))).alias("d")))
    want = sorted((r.node, r.q)
                  for r in dom.where(~F.col("d")).collect())
    assert got == want and len(got) > 0
    # a dominated doc exists (the policy actually pruned something)
    assert dom.where(F.col("d")).count() > 0
    # both epochs recorded decisions
    dec = spark.read.parquet(str(tmp_path / "dec"))
    assert dec.select("epoch").distinct().count() == 2


def test_streaming_resolution_redelivery_is_stable(spark, tmp_path):
    """Replaying the resolution body for an absorbed epoch (ledger hit)
    is a no-op, and a torn-absorb retry (decisions + qualities written,
    ledger not committed) recomputes identical decisions: the earlier-
    quality read anti-joins the batch's own ids, so its own torn rows
    cannot shift the dominance."""
    from skywalking_banyandb_spark.streaming.incremental_dedup import (
        seed_resolution_qualities,
        start_incremental_resolution,
    )

    docs = read_table(spark, f"{SF_SMALL}/documents.parquet") \
        .where("doc_id % 3 = 0")
    path = mh.build_minhash_index(spark, SF_SMALL,
                                  base_pred="doc_id % 9 = 0",
                                  root=str(tmp_path / "idx"))
    seed_resolution_qualities(docs.where("doc_id % 9 = 0"), "doc_id",
                              "text", str(tmp_path / "q"))
    src = str(tmp_path / "src")
    docs.where("doc_id % 9 = 3").coalesce(1).write.parquet(f"{src}/b1")
    _stamp_ordered(src, "b1")

    def run(ckpt: str):
        stream = (
            spark.readStream.schema(spark.read.parquet(f"{src}/b1").schema)
            .option("maxFilesPerTrigger", "1").parquet(f"{src}/*"))
        q = start_incremental_resolution(
            spark, stream, path, "doc_id", "text",
            decisions_path=str(tmp_path / "dec"),
            qualities_path=str(tmp_path / "q"),
            checkpoint_path=ckpt)
        assert q.awaitTermination(timeout=300)

    run(str(tmp_path / "ckpt1"))
    first = sorted(map(tuple, spark.read.parquet(str(tmp_path / "dec"))
                       .select("node", "q", "dominated").collect()))
    # fresh-lineage re-delivery of the same batch: index already holds
    # b1 (member-level probe exclusion) and q/ holds its qualities
    # (anti-joined) — the new lineage's decisions must be identical
    run(str(tmp_path / "ckpt2"))
    dec = spark.read.parquet(str(tmp_path / "dec"))
    assert dec.select("epoch").distinct().count() == 2
    per_epoch = [
        sorted(map(tuple, dec.where(F.col("epoch") == e)
                   .select("node", "q", "dominated").collect()))
        for e in [r.epoch for r in dec.select("epoch").distinct().collect()]
    ]
    assert per_epoch[0] == per_epoch[1] == first


def test_auto_compact_mid_stream_preserves_output(spark, tmp_path):
    """auto_compact=True: a fresh-lineage re-delivery of the same
    single-batch source (the duplicate-generating workload — every
    absorbed class duplicated once) pushes the duplicate-class fraction
    past the threshold, the loop compacts, and the re-delivered run's
    pairs still pair-exactly equal the first run's (valid for a single
    batch: its own ids are member-excluded, so both lineages probe the
    same effective corpus — with MULTIPLE batches a re-delivered
    lineage legitimately sees the first lineage's later batches and
    emits more pairs, which is corpus growth, not a compaction effect).
    The trigger must have actually fired (the index ends compacted) and
    the ledger must survive the swap (both lineages' keys)."""
    docs = read_table(spark, f"{SF_SMALL}/documents.parquet") \
        .where("doc_id % 3 = 0")
    path = mh.build_minhash_index(spark, SF_SMALL,
                                  base_pred="doc_id % 9 = 0",
                                  root=str(tmp_path / "idx"))
    src = str(tmp_path / "src")
    docs.where("doc_id % 9 = 3").coalesce(1).write.parquet(f"{src}/b1")
    _stamp_ordered(src, "b1")

    def run(ckpt: str, out: str):
        stream = (
            spark.readStream.schema(spark.read.parquet(f"{src}/b1").schema)
            .option("maxFilesPerTrigger", "1").parquet(f"{src}/*"))
        q = start_incremental_dedup(
            spark, stream, path, "doc_id", "text",
            output_path=out, checkpoint_path=ckpt, auto_compact=True)
        assert q.awaitTermination(timeout=300)
        return sorted(
            (r.a, r.b, r.jaccard)
            for r in spark.read.parquet(out).collect())

    first = run(str(tmp_path / "ckpt1"), str(tmp_path / "out1"))
    # fresh lineage over the same file: the absorb duplicates every b1
    # class, the duplicate fraction crosses the threshold mid-stream,
    # the loop compacts; the pairs must not move
    second = run(str(tmp_path / "ckpt2"), str(tmp_path / "out2"))
    assert second == first and len(first) > 0
    assert not mh.minhash_index_needs_compaction(spark, path)
    assert len(mh.absorbed_batches(path)) == 2   # one epoch per lineage
