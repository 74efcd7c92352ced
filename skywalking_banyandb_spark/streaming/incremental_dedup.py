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

    # ledger keys are scoped to the CHECKPOINT LINEAGE: foreachBatch
    # epoch ids restart from 0 with a fresh checkpoint, and a bare
    # "epoch-0" key from a previous run would make the first real batch
    # of the new run a silent no-op (review r12). The lineage identity
    # is the streaming query id Spark PERSISTS INSIDE the checkpoint
    # (checkpoint metadata file) — regenerated when the directory is
    # deleted and recreated at the same path, stable across resumes —
    # read lazily at first epoch (the metadata exists once the query
    # starts). Fallback for checkpoints the driver cannot read as local
    # files (URI schemes): the RAW path string — never os.path.abspath,
    # which is cwd-dependent and mangles hdfs://-style URIs.
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
            pairs = minhash_probe_pairs(sess, index_path, batch, id_col,
                                        text_col, threshold)
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
        finally:
            batch.unpersist()

    return (
        stream.writeStream
        .foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
