"""Trace finalization sampling — the retention-time sampler chain run at
segment compaction.

Reference parity (0.11): ``banyand/trace/finalize_scanner.go`` sweeps
cooled segments and force-merges their parts through the group's
registered sampler chain (``banyand/trace/pipeline_chain.go`` mergeChain;
plugin SDK ``pkg/pipeline/sdk/sdk.go:104`` Sampler / ``chain.go:75``
EvaluateChain). Semantics carried over, re-expressed Spark-first:

* a **sampler** declares an up-front *projection* — the per-trace
  aggregate columns it needs (``sdk.Projection``'s one-handshake column
  request) — and a *decide* function mapping the assembled per-trace
  block relation to a boolean keep column. Both are DECLARATIVE
  (Catalyst expressions), so the whole chain fuses into ONE scan + one
  map-side-combined aggregation per segment — there is no per-trace
  plugin call to time out;
* the **chain** is a conjunction over the same block relation
  (``EvaluateChain``: every link narrows the running mask); a link whose
  projection or decide RAISES while the plan is built is bypassed
  fail-open — mask unchanged, reported via ``on_bypass`` — mirroring
  ``applyChainLink``'s panic/error/length-mismatch handling (the
  runtime-timeout guard has no analogue here because links are
  expressions, not foreign code);
* the **fragment guard** (reference CHANGES.md: "Prevent merge-time
  trace sampling from dropping fragments when the same trace ID may
  remain in unselected parts ... provisional drops are checked against
  time bounds"): a trace whose span range touches within
  ``guard_margin`` of the segment boundary may continue in a
  neighbouring segment, so it is force-kept;
* **generation stamping** (``finalizeGen`` / ``finalize.json``): each
  segment carries a ``_finalize.json`` sidecar with the generation it
  was last sampled at; re-runs at the same generation are no-ops, so a
  crashed-and-replayed sweep cannot double-sample.

Coverage is best-effort, exactly like the reference: a segment dropped
by TTL before finalization is an accepted miss. Dropping is per
trace_id — a kept trace keeps EVERY span byte-for-byte (the engine
rewrites from its own data; the sampler only emits the mask).
"""

from __future__ import annotations

# Bump when the sampler chain / write_trace / finalize_segments semantics
# change: fixture caches key on this (tests/registry build day-segment
# fixtures once per (data, params, version) — a semantic change must not
# silently reuse a stale tempdir fixture; ADVICE r9).
FIXTURE_VERSION = 2

import json
import os
import shutil
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class TraceSampler:
    """One chain link. ``project`` maps output-column names to aggregate
    expressions over the span rows of one trace (evaluated inside the
    single per-segment groupBy — the union of all links' projections is
    computed once, the ``newMergeChain`` union-projection handshake).
    ``decide`` maps the assembled block relation — columns ``trace_id``,
    ``n_spans``, ``min_ts``, ``max_ts`` plus every projected column — to
    a boolean keep column."""

    name: str
    decide: Callable[[DataFrame], Column]
    project: Dict[str, Column] = field(default_factory=dict)


def hash_rate_sampler(rate: float, seed: str = "finalize") -> TraceSampler:
    """Deterministic rate sampler: keep a trace iff the integer value of
    the first 6 md5 hex digits of (seed | trace_id) falls under
    ``rate`` — stable across runs, engines and partitionings (no RNG
    state to coordinate across 1000 executors)."""
    cut = int(rate * 0xFFFFFF)

    def decide(blocks: DataFrame) -> Column:
        h = F.conv(F.substring(
            F.md5(F.concat(F.lit(seed + "|"),
                           F.col("trace_id").cast("string"))), 1, 6),
            16, 10).cast("long")
        return h < F.lit(cut)

    return TraceSampler(name=f"hash_rate({rate})", decide=decide)


def keep_matching_traces(name: str, span_pred: Column) -> TraceSampler:
    """Keep every trace containing at least one span matching
    ``span_pred`` (e.g. an error tag) — the classic tail-sampling rule.
    As a chain link it is a PASS for matching traces only; compose it
    with a rate sampler via :func:`any_of` to express "errors always,
    the rest at 10%"."""
    col = f"_match_{name}"

    def decide(blocks: DataFrame) -> Column:
        return F.col(col) == 1

    return TraceSampler(
        name=name, decide=decide,
        project={col: F.max(F.when(span_pred, 1).otherwise(0))})


def keep_slow_traces(min_duration_ms: int) -> TraceSampler:
    """Keep traces whose span range (max_ts − min_ts) is at least
    ``min_duration_ms`` — latency outliers survive retention."""
    def decide(blocks: DataFrame) -> Column:
        dur_ms = (F.unix_micros(F.col("max_ts"))
                  - F.unix_micros(F.col("min_ts"))) / F.lit(1000.0)
        return dur_ms >= F.lit(float(min_duration_ms))

    return TraceSampler(name=f"slow>={min_duration_ms}ms", decide=decide)


def any_of(name: str, *samplers: TraceSampler) -> TraceSampler:
    """Disjunction combinator: keep if ANY inner sampler keeps. The
    chain itself is a conjunction (reference ``EvaluateChain``), so OR
    policies ("errors always, others sampled") compose inside one
    link."""
    proj: Dict[str, Column] = {}
    for s in samplers:
        proj.update(s.project)

    def decide(blocks: DataFrame) -> Column:
        cols = [s.decide(blocks) for s in samplers]
        out = cols[0]
        for c in cols[1:]:
            out = out | c
        return out

    return TraceSampler(name=name, decide=decide, project=proj)


def _segment_state(segdir: str) -> dict:
    sfile = os.path.join(segdir, "_finalize.json")
    if os.path.exists(sfile):
        with open(sfile) as f:
            return json.load(f)
    return {"generation": 0, "rounds": 0, "dropped_traces": 0}


def finalize_segments(
    spark: SparkSession,
    schema,
    path: str,
    samplers: List[TraceSampler],
    generation: int = 1,
    guard_margin_ms: int = 0,
    segment_interval: str = "DAY",
    on_bypass: Optional[Callable[[int, str, Exception], None]] = None,
) -> dict:
    """Sweep every ``ts_bucket=`` segment of the trace table at ``path``
    and rewrite each through the sampler chain (the
    ``finalize_scanner.go`` sweep, minus the wall-clock cooldown — the
    caller decides when a segment is cool; TTL owns deletion).

    Per segment: ONE scan assembles the per-trace blocks (trace_id,
    n_spans, min_ts, max_ts + the union projection — a map-side-combined
    aggregation), the chain conjunction computes the keep-mask, the
    fragment guard force-keeps boundary-touching traces, and the segment
    directory is atomically swapped with only the kept traces' spans
    (byte-identical — an anti-join drop, never a rewrite of span
    payloads). Segments already stamped at ``generation`` are skipped
    (idempotent replay). Returns counters."""
    stats = {"segments": 0, "skipped": 0, "kept_traces": 0,
             "dropped_traces": 0, "bypassed_links": 0}
    tid = schema.trace_id_column
    ts = schema.ts_column
    proj: Dict[str, Column] = {}
    for s in samplers:
        proj.update(s.project)
    for seg in sorted(os.listdir(path)):
        if not seg.startswith("ts_bucket="):
            continue
        segdir = os.path.join(path, seg)
        state = _segment_state(segdir)
        if state["generation"] >= generation:
            stats["skipped"] += 1
            continue
        spans = spark.read.parquet(segdir)
        blocks = spans.groupBy(F.col(tid).alias("trace_id")).agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.min(ts).alias("min_ts"),
            F.max(ts).alias("max_ts"),
            *[expr.alias(n) for n, expr in proj.items()],
        )
        keep = F.lit(True)
        for idx, s in enumerate(samplers):
            try:
                keep = keep & s.decide(blocks)
            except Exception as e:  # fail open, per link (applyChainLink)
                stats["bypassed_links"] += 1
                if on_bypass is not None:
                    on_bypass(idx, s.name, e)
        if guard_margin_ms > 0:
            lo, hi = _segment_bounds(seg, segment_interval)
            margin = F.lit(guard_margin_ms * 1000)
            keep = keep | (F.unix_micros(F.col("min_ts")) - lo < margin) \
                        | (hi - F.unix_micros(F.col("max_ts")) <= margin)
        kept_ids = blocks.where(keep).select("trace_id")
        n_total = blocks.count()
        n_kept = kept_ids.count()
        out = spans.join(
            kept_ids.withColumnRenamed("trace_id", tid), tid, "inner")
        tmp = segdir + "._finalize"
        out.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_finalize.json"), "w") as f:
            json.dump({
                "generation": generation,
                "rounds": state["rounds"] + 1,
                "dropped_traces": state["dropped_traces"]
                + (n_total - n_kept),
            }, f)
        old = segdir + "._old"
        os.rename(segdir, old)
        os.rename(tmp, segdir)
        shutil.rmtree(old, ignore_errors=True)
        stats["segments"] += 1
        stats["kept_traces"] += n_kept
        stats["dropped_traces"] += n_total - n_kept
    return stats


def _segment_bounds(seg_dirname: str, segment_interval: str):
    """[start, end) of the segment in unix micros, parsed from the
    ``ts_bucket=<value>`` directory name (partitionBy URL-encodes ':').
    The cast to timestamp happens in Spark so the bounds live in the
    SAME session timezone as ``unix_micros`` over the span column."""
    from urllib.parse import unquote

    val = unquote(seg_dirname.split("=", 1)[1])
    start = F.unix_micros(F.lit(val).cast("timestamp"))
    width = (86_400_000_000 if segment_interval.upper() == "DAY"
             else 3_600_000_000)
    return start, start + F.lit(width)
