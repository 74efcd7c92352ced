"""Streaming PromQL-style counter increase — per-series stateful chaining
across micro-batches (``applyInPandasWithState``).

The batch twin is ``registry_observability._counter_increase_promql``:
reset-aware increase (a counter decrease means a restart, so the
post-reset sample contributes its full value — T.81 of the metrics world:
``promql/functions.go`` resets handling). The batch form needs the whole
series in one pass; a live pipeline sees the series sliced into
micro-batches, and the LAST SAMPLE BEFORE THE SLICE decides whether the
first sample after it is a delta or a reset. That last sample is exactly
the per-series state this operator carries: ``(last_ts, last_value)``
per ``user_id``, a constant-size record per live series (the same bounded
-per-key state class as the reference's Top-N heaps,
``pkg/flow/streaming/topn.go:51-305``).

Each micro-batch emits PARTIAL rows per (user, hour): increase / resets /
sample-count / min-max event micros. All parts are associative, so the
materialized view is one grouped SUM/MIN/MAX over the appended parts —
``counter_view`` — and equals the batch operator on the same rows
(differential test ``tests/test_streaming_counter.py``). Correct chaining
requires in-order arrival per series ACROSS batches (within a batch the
operator sorts); out-of-order stragglers across batch boundaries would
need the batch operator's full re-sort — documented divergence, same
posture as the reference's monotonic watermark.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from .topn_stream import ensure_event_time

_STATE_SCHEMA = StructType([
    StructField("last_ts", LongType()),     # event-time micros
    StructField("last_value", DoubleType()),
])

PARTS_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("hour_us", LongType()),     # floor(ts, hour) in micros
    StructField("n_samples", LongType()),
    StructField("n_resets", LongType()),
    StructField("increase", DoubleType()),
    StructField("min_us", LongType()),
    StructField("max_us", LongType()),
])

_HOUR_US = 3_600_000_000


def _chain(key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    if rows.empty:
        return
    rows = rows.sort_values(["us", "event_id"], kind="mergesort")
    if state.exists:
        last_ts, last_value = state.get
    else:
        last_ts, last_value = None, None
    parts: dict = {}
    for us, value in zip(rows["us"].tolist(), rows["value"].tolist()):
        hour = us - us % _HOUR_US
        p = parts.get(hour)
        if p is None:
            p = parts[hour] = [0, 0, 0.0, us, us]  # n, resets, inc, min, max
        p[0] += 1
        p[3] = min(p[3], us)
        p[4] = max(p[4], us)
        if last_value is not None:
            if value >= last_value:
                p[2] += value - last_value
            else:  # reset: counter restarted from zero
                p[1] += 1
                p[2] += value
        last_ts, last_value = us, value
    state.update((int(last_ts), float(last_value)))
    uid = key[0]
    yield pd.DataFrame(
        [(uid, hour, p[0], p[1], p[2], p[3], p[4])
         for hour, p in sorted(parts.items())],
        columns=[f.name for f in PARTS_SCHEMA.fields],
    )


def start_counter_increase_materialization(
    spark: SparkSession,
    source: DataFrame,
    output_path: str,
    checkpoint_path: str,
    event_type: str = "click",
    trigger_once: bool = False,
):
    """Materialize per-(series, hour) PARTIAL counter-increase rows."""
    ev = ensure_event_time(source, "ts").where(
        F.col("event_type") == event_type)
    keyed = ev.select(
        "user_id", "event_id", "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    ).groupBy("user_id")
    parts = keyed.applyInPandasWithState(
        _chain, PARTS_SCHEMA, _STATE_SCHEMA,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        parts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def counter_view(spark: SparkSession, output_path: str) -> DataFrame:
    """The materialized view over the appended parts: associative merge to
    the batch operator's exact shape (increase/resets/samples/rate)."""
    parts = spark.read.parquet(output_path)
    g = parts.groupBy("user_id", "hour_us").agg(
        F.sum("n_samples").alias("n_samples"),
        F.sum("n_resets").alias("n_resets"),
        F.sum("increase").alias("increase"),
        F.min("min_us").alias("min_us"),
        F.max("max_us").alias("max_us"),
    )
    span = F.col("max_us") - F.col("min_us")
    return g.select(
        "user_id",
        F.timestamp_micros(F.col("hour_us")).alias("hour"),
        "n_samples", "n_resets", "increase",
        F.when(span > 0, F.col("increase") / (span / F.lit(1_000_000.0)))
        .alias("rate_per_s"),
    ).orderBy("user_id", "hour")


# ---------------------------------------------------------------------------
# Streaming extrapolated rate — the batch twin is
# registry_observability._rate_extrapolated_promql (the full Prometheus
# estimator, promql/functions.go extrapolatedRate). The estimator's inputs
# per (series, hour) are n / raw / first_us / last_us / first_v. All are
# associative-mergeable over micro-batch parts: counts and raw sum, the
# window edges min/max, and first_v rides an argmin-(us, event_id) struct
# (carried, never accumulated — exact). The in-window reset chain restarts
# at every hour boundary (PromQL never looks outside the range), so the
# per-series state is the same (last_ts, last_value) pair as the counter
# operator — the chain contributes 0 for a sample whose hour differs from
# the previous sample's.
# ---------------------------------------------------------------------------

EXTRAP_PARTS_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("hour_us", LongType()),
    StructField("n_samples", LongType()),
    StructField("raw", DoubleType()),
    StructField("min_us", LongType()),
    StructField("max_us", LongType()),
    StructField("first_us", LongType()),    # argmin carrier for first_v
    StructField("first_eid", LongType()),
    StructField("first_v", DoubleType()),
])


def _chain_extrap(key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    if rows.empty:
        return
    rows = rows.sort_values(["us", "event_id"], kind="mergesort")
    if state.exists:
        last_ts, last_value = state.get
    else:
        last_ts, last_value = None, None
    parts: dict = {}
    for us, eid, value in zip(rows["us"].tolist(),
                              rows["event_id"].tolist(),
                              rows["value"].tolist()):
        hour = us - us % _HOUR_US
        p = parts.get(hour)
        if p is None:
            # n, raw, min, max, first_us, first_eid, first_v
            p = parts[hour] = [0, 0.0, us, us, us, eid, value]
        p[0] += 1
        p[3] = max(p[3], us)
        # in-window chain only: a previous sample in a DIFFERENT hour
        # does not contribute (PromQL range semantics)
        if last_ts is not None and last_ts - last_ts % _HOUR_US == hour:
            if value >= last_value:
                p[1] += value - last_value
            else:
                p[1] += value  # reset
        last_ts, last_value = us, value
    state.update((int(last_ts), float(last_value)))
    uid = key[0]
    yield pd.DataFrame(
        [(uid, hour, p[0], p[1], p[2], p[3], p[4], p[5], p[6])
         for hour, p in sorted(parts.items())],
        columns=[f.name for f in EXTRAP_PARTS_SCHEMA.fields],
    )


def start_extrapolated_rate_materialization(
    spark: SparkSession,
    source: DataFrame,
    output_path: str,
    checkpoint_path: str,
    trigger_once: bool = False,
):
    """Materialize per-(series, hour) PARTIAL estimator inputs (all
    events — the batch twin's series definition)."""
    ev = ensure_event_time(source, "ts")
    keyed = ev.select(
        "user_id", "event_id", "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    ).groupBy("user_id")
    parts = keyed.applyInPandasWithState(
        _chain_extrap, EXTRAP_PARTS_SCHEMA, _STATE_SCHEMA,
        outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        parts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def extrapolated_rate_view(spark: SparkSession, output_path: str) -> DataFrame:
    """Associative merge of the parts + the SAME estimator expression as
    the batch operator (registry_observability comment block): windows
    with < 2 samples or zero sampled interval drop, edge extrapolation
    with the 1.1× threshold arms and the zero-crossing cap."""
    parts = spark.read.parquet(output_path)
    g = (
        parts.groupBy("user_id", "hour_us")
        .agg(
            F.sum("n_samples").alias("n_samples"),
            F.sum("raw").alias("raw"),
            F.min("min_us").alias("first_us"),
            F.max("max_us").alias("last_us"),
            F.min(F.struct("first_us", "first_eid", "first_v"))["first_v"]
            .alias("first_v"),
        )
        .where((F.col("n_samples") >= 2)
               & (F.col("last_us") > F.col("first_us")))
    )
    sampled = (F.col("last_us") - F.col("first_us")) / F.lit(1_000_000.0)
    avg_dur = sampled / (F.col("n_samples") - F.lit(1))
    dur_start0 = (F.col("first_us") - F.col("hour_us")) / F.lit(1_000_000.0)
    dur_end = (F.col("hour_us") + F.lit(_HOUR_US) - F.col("last_us")) \
        / F.lit(1_000_000.0)
    # promql/functions.go (Prometheus >= 2.46) order: threshold-clamp
    # first, then zero-crossing cap on the clamped value (ADVICE r7) —
    # identical expression to the batch operator
    thresh = avg_dur * F.lit(1.1)
    dur_start1 = F.when(dur_start0 < thresh, dur_start0) \
        .otherwise(avg_dur / F.lit(2.0))
    dtz = sampled * (F.col("first_v") / F.col("raw"))
    dur_start = F.when(
        (F.col("raw") > 0) & (F.col("first_v") >= 0) & (dtz < dur_start1),
        dtz).otherwise(dur_start1)
    extrap = (
        sampled
        + dur_start
        + F.when(dur_end < thresh, dur_end).otherwise(avg_dur / F.lit(2.0))
    )
    return g.select(
        "user_id",
        F.timestamp_micros(F.col("hour_us")).alias("hour"),
        "n_samples",
        "first_us", "last_us", "first_v",
        (F.col("raw") * (extrap / sampled)).alias("increase"),
        (F.col("raw") * (extrap / sampled) / F.lit(3600.0))
        .alias("rate_per_s"),
    ).orderBy("user_id", "hour")
