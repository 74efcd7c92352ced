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
* index ABSORB goes through :func:`minhash_index_absorb`'s ledger — a
  retried epoch that already absorbed is a no-op, so the index never
  double-counts a batch;
* ordering — probe BEFORE absorb — means a retry that crashed between
  output and absorb re-probes against the identical (pre-absorb) index
  state and overwrites the identical output.
"""
from __future__ import annotations

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
    drains in source-option-sized micro-batches and terminates."""

    def _process(batch: DataFrame, epoch_id: int) -> None:
        key = f"epoch-{epoch_id}"
        if key in absorbed_batches(index_path):
            return  # fully processed by a prior attempt
        sess = batch.sparkSession
        pairs = minhash_probe_pairs(sess, index_path, batch, id_col,
                                    text_col, threshold)
        (pairs.withColumn("epoch", F.lit(epoch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("epoch")
         .parquet(output_path))
        minhash_index_absorb(sess, index_path, batch, id_col, text_col, key)

    return (
        stream.writeStream
        .foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
