"""Streaming ingestion — the Structured Streaming analogue of BanyanDB's
client-streamed gRPC writes (``measure/v1/write.proto`` DataPointValue,
``stream/v1/write.proto`` ElementValue): a continuous source lands in the
same segment layout the batch writers produce, so the read path is
identical for batch-written and stream-written data.

Each micro-batch appends day/hour-bucketed, series-sorted parquet via
``foreachBatch`` → the batch writer. Append-only (LSM semantics): no
rewrites, version dedup resolves duplicates at read time, exactly like the
reference's memtable-flush parts."""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..catalog import MeasureSchema, StreamSchema
from ..sources.writer import write_measure, write_stream


def start_measure_ingest(
    source: DataFrame,
    schema: MeasureSchema,
    output_path: str,
    checkpoint_path: str,
    segment_interval: str = "DAY",
    trigger_once: bool = False,
):
    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch.take(1):
            write_measure(batch, schema, output_path,
                          mode="append", segment_interval=segment_interval)

    writer = (
        source.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(_sink)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_stream_ingest(
    source: DataFrame,
    schema: StreamSchema,
    output_path: str,
    checkpoint_path: str,
    segment_interval: str = "DAY",
    trigger_once: bool = False,
):
    def _sink(batch: DataFrame, batch_id: int) -> None:
        if batch.take(1):
            write_stream(batch, schema, output_path,
                         mode="append", segment_interval=segment_interval)

    writer = (
        source.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(_sink)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_exact_dedup(
    source: DataFrame,
    id_col: str,
    text_col: str,
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup — the training-pipeline dedup operator applied
    at ingest time instead of as a batch sweep: fingerprint the content
    (same md5 fingerprint as the batch ``functions/dedup.exact_dedup``) and
    keep the first arrival per fingerprint within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state by event time:
    at 100 TB/day the state store holds one fingerprint per *distinct*
    document seen inside the lateness window — not the corpus — and Spark
    evicts entries as the watermark advances. Exactly-once per fingerprint
    within the horizon; cross-horizon duplicates fall through to the batch
    sweep (the same layered design as the reference's memtable-then-merge
    LSM dedup)."""
    from pyspark.sql import functions as F

    from ..functions.text import fingerprint
    from .topn_stream import ensure_event_time

    return (
        ensure_event_time(source, ts_col)
        .withColumn("fp", fingerprint(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .drop("fp")
    )
