"""Streaming incremental near-dup: probe each arriving micro-batch
against the write-time MinHash index, emit its cross-corpus pairs, then
absorb the batch so the NEXT micro-batch sees it.

This is the streaming twin of the batch probe/append loop
(:mod:`~skywalking_banyandb_spark.sources.minhash_index`) and the shape
a 100 TB ingest pipeline actually runs: near-dup discovery rides the
ingest stream, each shard costs O(shard + candidates), and the corpus
is never re-signatured. The reference's flow DSL has no dedup stage —
this is a Spark extension composed from Structured Streaming's
``foreachBatch`` (the micro-batch is a plain DataFrame, so the batch
probe runs unchanged) plus the index's ledgered absorb.

Exactly-once: ``foreachBatch`` is at-least-once — after a failure the
same epoch re-delivers. Three pieces make the loop idempotent:

* pair OUTPUT is partitioned by epoch id and written with dynamic
  partition overwrite — a retried epoch replaces its own partition,
  never duplicates it;
* index ABSORB goes through :func:`minhash_index_absorb`'s ledger,
  keyed by (checkpoint LINEAGE, epoch) — the lineage identity is the
  query id Spark persists inside the checkpoint, so a retried epoch is
  a no-op while a fresh checkpoint (even recreated at the same path,
  epoch ids reset to 0) re-keys rather than silently skipping batches;
* the probe anti-joins the batch's own ids out of the index, so a retry
  whose prior attempt tore mid-absorb (index rows appended, ledger not
  yet committed) re-probes to the identical pre-absorb answer — never
  intra-batch self-pairs — and overwrites the identical output.

Output partitions are keyed by the RUN-SCOPED epoch (lineage token +
epoch id): within a lineage, retries rewrite their own partition
idempotently; a fresh-checkpoint rerun writes its own partitions and
can never overwrite or interleave a prior run's. Re-running the SAME
source files under a fresh checkpoint re-absorbs them safely (duplicate
index rows are probe-harmless: distinct candidates, set-collected
shingles, rep-deduped classes), but a reader of a multi-run directory
sees both runs' pairs — point a reprocessing run at a fresh
``output_path``, the same ownership contract as Spark's file sink.
"""
from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.minhash_index import (
    absorbed_batches,
    minhash_index_absorb,
    minhash_index_compact,
    minhash_index_needs_compaction,
    minhash_probe_pairs,
)


def _lineage_token_reader(checkpoint_path: str):
    """Lazily read the run-scoped lineage token for ledger/partition
    keys: foreachBatch epoch ids restart from 0 with a fresh checkpoint,
    and a bare "epoch-0" key from a previous run would make the first
    real batch of the new run a silent no-op (review r12). The lineage
    identity is the streaming query id Spark PERSISTS INSIDE the
    checkpoint (checkpoint metadata file) — regenerated when the
    directory is deleted and recreated at the same path, stable across
    resumes — read lazily at first epoch (the metadata exists once the
    query starts). Fallback for checkpoints the driver cannot read as
    local files (URI schemes): the RAW path string — never
    os.path.abspath, which is cwd-dependent and mangles hdfs://-style
    URIs."""
    _token: list = []

    def _run_token() -> str:
        if not _token:
            try:
                with open(os.path.join(checkpoint_path, "metadata")) as f:
                    _token.append(json.load(f)["id"][:8])
            except (OSError, KeyError, ValueError):
                _token.append(hashlib.md5(
                    checkpoint_path.encode("utf-8")).hexdigest()[:8])
        return _token[0]

    return _run_token


def start_incremental_dedup(
    spark: SparkSession,
    stream: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    output_path: str,
    checkpoint_path: str,
    threshold: float = 0.5,
    auto_compact: bool = False,
) -> StreamingQuery:
    """Start the probe→emit→absorb loop over ``stream`` (a streaming
    DataFrame of documents). Pairs land under ``output_path`` as
    ``(a, b, jaccard)`` partitioned by ``epoch`` — ``a`` a doc already
    in the index (base corpus or an earlier batch), ``b`` a doc of the
    emitting batch. Runs with ``availableNow`` so a bounded source
    drains in source-option-sized micro-batches and terminates.

    ``output_path`` is created by the first NON-empty epoch (dynamic
    partition overwrite writes nothing for an empty pair set) — readers
    of an all-empty run should treat a missing directory as zero pairs.
    """
    _run_token = _lineage_token_reader(checkpoint_path)

    def _process(batch: DataFrame, epoch_id: int) -> None:
        key = f"{_run_token()}-epoch-{epoch_id}"
        if key in absorbed_batches(index_path):
            return  # fully processed by a prior attempt
        sess = batch.sparkSession
        # the probe + absorb issue several jobs over the micro-batch
        # (signature, shingle, class passes); persist so the source is
        # scanned once per epoch, not once per job
        batch = batch.persist()
        try:
            # retain=False: each epoch's probe pairs a different batch
            # side (and often a scratch index path), so its candidate
            # plan is single-use — keep it out of the shared LRU window
            pairs = minhash_probe_pairs(sess, index_path, batch, id_col,
                                        text_col, threshold, retain=False)
            # the partition key is the RUN-SCOPED epoch: a fresh-
            # checkpoint rerun (epoch ids reset to 0) writes its own
            # partitions instead of overwriting partition epoch=0 while
            # leaving a prior run's later partitions stale beside it
            (pairs.withColumn("epoch", F.lit(key))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("epoch")
             .parquet(output_path))
            minhash_index_absorb(sess, index_path, batch, id_col,
                                 text_col, key)
            _maybe_compact(sess, index_path, auto_compact)
        finally:
            batch.unpersist()

    return (
        stream.writeStream
        .foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def _maybe_compact(sess: SparkSession, index_path: str,
                   enabled: bool) -> None:
    """Opt-in post-absorb maintenance: the streaming loop is the
    index's long-lived single writer, so it is where the compaction
    policy naturally runs. Fires only past the duplicate-fraction
    threshold (one column-pruned aggregate per epoch when enabled);
    compaction is probe-pair-exact and ledger-preserving, so stream ≡
    batch and replay idempotency are unaffected — pinned by the
    auto-compact stream test running against the same batch oracle."""
    if enabled and minhash_index_needs_compaction(sess, index_path):
        minhash_index_compact(sess, index_path)


def seed_resolution_qualities(
    base_docs: DataFrame,
    id_col: str,
    text_col: str,
    qualities_path: str,
    quality=None,
) -> None:
    """Seed the resolution loop's quality side-relation with the BASE
    corpus (the docs the index was built over): ``(node, q)`` rows under
    partition ``epoch=base``. Idempotent (dynamic partition overwrite of
    its own partition). Must cover exactly the index's base_pred subset
    — an edge endpoint with no quality row drops out of that epoch's
    dominance inner join silently."""
    if quality is None:
        from ..functions.text import quality_score as quality
    (base_docs.select(F.col(id_col).alias("node"),
                      quality(F.col(text_col)).alias("q"))
     .withColumn("epoch", F.lit("base"))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("epoch")
     .parquet(qualities_path))


def start_incremental_resolution(
    spark: SparkSession,
    stream: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    decisions_path: str,
    qualities_path: str,
    checkpoint_path: str,
    threshold: float = 0.5,
    quality=None,
    auto_compact: bool = False,
) -> StreamingQuery:
    """Streaming keep-best RESOLUTION riding the incremental dedup loop
    (VERDICT r12 Next #6): each micro-batch probes the index for its
    cross-corpus near-dup pairs, then emits the epoch's DOMINANCE
    DECISIONS — for every doc touched by an epoch edge, ``(node, q,
    dominated)`` where ``dominated`` is the batch keep-best policy
    (a neighbor beats it on quality DESC, id ASC;
    registry_pipeline._dedup_keep_best) evaluated over THIS epoch's
    edges in both directions — then absorbs the batch.

    A doc's final survival is "never dominated in any epoch": every
    cross-arrival-group edge (a, b) is evaluated exactly once, in both
    directions, at the later side's arrival epoch, so

        survivors = touched nodes with MAX(dominated) = false

    over all decision partitions ≡ the batch keep-best computed over
    the full cross-group edge set — the stream ≡ batch equality
    ``tests/test_streaming_incremental_dedup.py`` pins.

    Idempotency mirrors the pair loop: decisions AND the epoch's
    quality rows land under run-scoped epoch partitions with dynamic
    overwrite; earlier-doc qualities are read from ``qualities_path``
    with the batch's own ids anti-joined out (so a torn-absorb retry
    whose prior attempt already wrote this batch's qualities recomputes
    the identical pre-absorb decisions); the absorb ledger commits
    LAST. Replayed lineages leave duplicate (node, q) decision rows —
    harmless, since q is deterministic from text and the survivor
    aggregate is MAX(dominated) per node.

    Seed ``qualities_path`` with :func:`seed_resolution_qualities`
    BEFORE starting — base-corpus edge endpoints need quality rows.
    """
    if quality is None:
        from ..functions.text import quality_score as quality
    _run_token = _lineage_token_reader(checkpoint_path)

    def _process(batch: DataFrame, epoch_id: int) -> None:
        key = f"{_run_token()}-epoch-{epoch_id}"
        if key in absorbed_batches(index_path):
            return
        sess = batch.sparkSession
        batch = batch.persist()
        pairs = None
        try:
            pairs = minhash_probe_pairs(sess, index_path, batch, id_col,
                                        text_col, threshold,
                                        retain=False).persist()
            bq = batch.select(F.col(id_col).alias("node"),
                              quality(F.col(text_col)).alias("q"))
            bids = batch.select(F.col(id_col).alias("node")).distinct()
            earlier = (sess.read.parquet(qualities_path)
                       .select("node", "q")
                       # multi-lineage replays duplicate rows; q is
                       # deterministic from text, so any copy is right
                       .dropDuplicates(["node"])
                       .join(bids, "node", "left_anti"))
            qrel = earlier.unionByName(bq)
            edges = (pairs.select(F.col("a").alias("node"),
                                  F.col("b").alias("nb"))
                     .unionByName(pairs.select(F.col("b").alias("node"),
                                               F.col("a").alias("nb"))))
            qn = qrel.select(F.col("node").alias("nb"),
                             F.col("q").alias("q_nb"))
            dec = (
                edges.join(qrel, "node").join(qn, "nb")
                .groupBy("node", "q")
                .agg(F.max(
                    (F.col("q_nb") > F.col("q"))
                    | ((F.col("q_nb") == F.col("q"))
                       & (F.col("nb") < F.col("node")))).alias("dominated"))
            )
            (dec.withColumn("epoch", F.lit(key))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("epoch")
             .parquet(decisions_path))
            (bq.withColumn("epoch", F.lit(key))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("epoch")
             .parquet(qualities_path))
            minhash_index_absorb(sess, index_path, batch, id_col,
                                 text_col, key)
            _maybe_compact(sess, index_path, auto_compact)
        finally:
            if pairs is not None:
                pairs.unpersist()
            batch.unpersist()

    return (
        stream.writeStream
        .foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def resolution_survivors(spark: SparkSession,
                         decisions_path: str) -> DataFrame:
    """Fold all epochs' decisions into the surviving set: ``(node, q)``
    rows whose ``dominated`` never went true. Nodes never touched by an
    edge have no decision row and are absent — exactly the batch
    keep-best's output domain (nodes of the near-dup graph). Missing
    directory (no epoch emitted a decision) degrades to zero rows."""
    if not os.path.isdir(decisions_path):
        return spark.createDataFrame([], "node bigint, q double")
    return (
        spark.read.parquet(decisions_path)
        .groupBy("node", "q")
        .agg(F.max("dominated").alias("_d"))
        .where(~F.col("_d"))
        .select("node", "q")
    )
