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
  keyed by (checkpoint identity, epoch) — a retried epoch that already
  absorbed is a no-op, and a RESTART against a fresh checkpoint (epoch
  ids reset to 0) re-keys rather than silently skipping real batches;
* the probe anti-joins the batch's own ids out of the index, so a retry
  whose prior attempt tore mid-absorb (index rows appended, ledger not
  yet committed) re-probes to the identical pre-absorb answer — never
  intra-batch self-pairs — and overwrites the identical output.

A fresh-checkpoint restart over already-absorbed files re-probes and
re-absorbs them: the output partitions rewrite with identical pairs
(the anti-join hides the batch's own absorbed rows) and the duplicate
index rows are probe-harmless (distinct candidates, set-collected
shingles, rep-deduped classes).
"""
from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources.minhash_index import (
    absorbed_batches,
    minhash_index_absorb,
    minhash_probe_pairs,
)


def start_incremental_dedup(
    spark: SparkSession,
    stream: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    output_path: str,
    checkpoint_path: str,
    threshold: float = 0.5,
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

    # ledger keys are scoped to the CHECKPOINT identity: foreachBatch
    # epoch ids restart from 0 with a fresh checkpoint dir, and a bare
    # "epoch-0" key from a previous run would make the first real batch
    # of the new run a silent no-op (review r12)
    run_token = hashlib.md5(
        os.path.abspath(checkpoint_path).encode("utf-8")).hexdigest()[:8]

    def _process(batch: DataFrame, epoch_id: int) -> None:
        key = f"{run_token}-epoch-{epoch_id}"
        if key in absorbed_batches(index_path):
            return  # fully processed by a prior attempt
        sess = batch.sparkSession
        # the probe + absorb issue several jobs over the micro-batch
        # (signature, shingle, class passes); persist so the source is
        # scanned once per epoch, not once per job
        batch = batch.persist()
        try:
            pairs = minhash_probe_pairs(sess, index_path, batch, id_col,
                                        text_col, threshold)
            (pairs.withColumn("epoch", F.lit(epoch_id))
             .write.mode("overwrite")
             .option("partitionOverwriteMode", "dynamic")
             .partitionBy("epoch")
             .parquet(output_path))
            minhash_index_absorb(sess, index_path, batch, id_col,
                                 text_col, key)
        finally:
            batch.unpersist()

    return (
        stream.writeStream
        .foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
