"""As-of join operators.

``asof_join`` is the single-shuffle union-trick (tag both sides, sort per
series key, ``last(ignorenulls)`` running carry) — optimal when no single
series dominates a partition (the driver entry ``events_asof_join`` uses
this shape inline).

``asof_join_chunked`` is the SKEW-RESISTANT variant: a hot series key (one
user with 10⁹ rows) would serialize the union-trick's per-key window into
one task. Chunking is the classic parallel-prefix (scan) decomposition:

1. within-chunk pass — partition by (key, time-chunk): the running carry
   runs per chunk, so the hot key's work spreads over its chunks;
2. chunk summaries — the LAST right-side value per (key, chunk): one tiny
   row per non-empty chunk;
3. carry-in — a window over the chunk-summary spine per key (rows =
   chunks, not events) propagates each chunk's predecessor value;
4. stitch — left rows whose chunk had no earlier right row take the
   carry-in: ``coalesce(within_chunk, carry_in)``.

Each phase is a bounded shuffle; no partition's size depends on a key's
total row count — only on rows-per-(key, chunk). Results are IDENTICAL to
``asof_join`` (asserted in tests/test_observability.py).

Both operators support the standard TSDB as-of options (r5):

- ``direction`` — ``"backward"`` (latest right at-or-before, the default)
  or ``"forward"`` (earliest right at-or-after). Internally forward is
  backward on NEGATED event-time microseconds — one sign flip, the same
  proven carry machinery.
- ``tolerance_us`` — maximum staleness: a carried match further than this
  from the left row's ts yields NULL (TimescaleDB/pandas ``merge_asof``
  tolerance semantics). The carry transports (right_ts, payload) structs
  so the check is a post-carry projection, not a join.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _us(c):
    return F.unix_micros(c.cast("timestamp"))


def _sign(direction: str) -> int:
    if direction == "backward":
        return 1
    if direction == "forward":
        return -1
    raise ValueError(f"direction must be 'backward' or 'forward', "
                     f"got {direction!r}")


def _prep(left: DataFrame, right: DataFrame, keys: Sequence[str],
          ts_col: str, payload_col: str, sign: int):
    """Tag and union the two sides on a SIGNED microsecond axis (sign=-1
    flips time so the forward join reuses the backward carry); right is
    pre-deduped to one row per (keys, ts) keeping the max payload
    (well-defined ASOF tie semantics). The carried value is a
    (ts_us, payload) struct so tolerance can be checked post-carry."""
    lcols = [c for c in left.columns]
    r = (right.groupBy(*keys, ts_col)
         .agg(F.max(payload_col).alias(payload_col)))
    pv_type = dict(r.dtypes)[payload_col]
    tagged_l = left.select(
        *keys, (F.lit(sign) * _us(F.col(ts_col))).alias("_sus"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(f"struct<_rus:bigint,_pv:{pv_type}>").alias("_pv_in"),
        F.struct(*[F.col(c) for c in lcols]).alias("_row"),
    )
    tagged_r = r.select(
        *keys, (F.lit(sign) * _us(F.col(ts_col))).alias("_sus"),
        F.lit(0).alias("_is_left"),
        F.struct(_us(F.col(ts_col)).alias("_rus"),
                 F.col(payload_col).alias("_pv")).alias("_pv_in"),
        F.lit(None).cast(tagged_l.schema["_row"].dataType).alias("_row"),
    )
    return tagged_l.unionByName(tagged_r)


def _emit(matched, ts_col: str, out_col: str,
          tolerance_us: Optional[int], sign: int):
    """Project the carried struct to the output payload, applying the
    tolerance gate (|right_ts - left_ts| <= tolerance on the real axis)."""
    pv = matched["_pv"]
    if tolerance_us is not None:
        lus = _us(F.col(f"_row.{ts_col}"))
        dist = (lus - matched["_rus"]) * sign  # >= 0 by construction
        pv = F.when(dist <= tolerance_us, pv)
    return pv.alias(out_col)


def asof_join(left: DataFrame, right: DataFrame, keys: Sequence[str],
              ts_col: str, payload_col: str,
              out_col: str = "asof_value",
              direction: str = "backward",
              tolerance_us: Optional[int] = None) -> DataFrame:
    """Right ``payload_col`` as of each left row's ts — latest at-or-before
    (backward, default) or earliest at-or-after (forward), optionally
    within ``tolerance_us``."""
    sign = _sign(direction)
    u = _prep(left, right, keys, ts_col, payload_col, sign)
    w = (Window.partitionBy(*keys).orderBy("_sus", "_is_left")
         .rowsBetween(Window.unboundedPreceding, 0))
    matched = F.last("_pv_in", ignorenulls=True).over(w)
    return (
        u.withColumn("_m", matched)
        .where(F.col("_is_left") == 1)
        .select(F.col("_row.*"),
                _emit(F.col("_m"), ts_col, out_col, tolerance_us, sign))
    )


def asof_join_chunked(left: DataFrame, right: DataFrame, keys: Sequence[str],
                      ts_col: str, payload_col: str,
                      out_col: str = "asof_value",
                      chunk_us: int = 86_400_000_000,
                      direction: str = "backward",
                      tolerance_us: Optional[int] = None) -> DataFrame:
    """Skew-resistant as-of join (see module docstring). ``chunk_us`` is
    the time-chunk width in microseconds (default 1 day) — choose it so
    rows-per-(key, chunk) fits a task; correctness is chunk-invariant."""
    sign = _sign(direction)
    # exact FLOOR division on bigints (SQL `div` truncates toward zero,
    # which would merge the two chunks around 0 on the negated forward
    # axis; float floor could misround near boundaries): (x - pmod) / c
    u = _prep(left, right, keys, ts_col, payload_col, sign).withColumn(
        "_ck",
        ((F.col("_sus") - F.pmod(F.col("_sus"), F.lit(chunk_us)))
         / F.lit(chunk_us)).cast("bigint"))

    # 1. within-chunk running carry — partitions are (key, chunk)
    win_chunk = (Window.partitionBy(*keys, "_ck")
                 .orderBy("_sus", "_is_left")
                 .rowsBetween(Window.unboundedPreceding, 0))
    u = u.withColumn("_within", F.last("_pv_in", ignorenulls=True).over(win_chunk))

    # 2. chunk summaries: last right value per non-empty (key, chunk) on
    #    the SIGNED axis
    summaries = (
        u.where(F.col("_is_left") == 0)
        .groupBy(*keys, "_ck")
        .agg(F.max_by(F.col("_pv_in"), F.col("_sus")).alias("_cl"))
    )

    # 3. carry-in over the chunk spine (every chunk any side touched);
    #    window size = number of chunks per key, never event counts.
    #    NULL-SAFE key match (ADVICE r4): the window formulation groups
    #    NULL keys into one series, so the spine join must match them too.
    spine = u.select(*keys, "_ck").distinct()
    summ_r = summaries.select(
        *[F.col(k).alias(f"_s_{k}") for k in keys],
        F.col("_ck").alias("_s_ck"), "_cl")
    scond = spine["_ck"] == summ_r["_s_ck"]
    for k in keys:
        scond = scond & spine[k].eqNullSafe(summ_r[f"_s_{k}"])
    spined = spine.join(summ_r, scond, "left").select(*keys, "_ck", "_cl")
    win_carry = (Window.partitionBy(*keys).orderBy("_ck")
                 .rowsBetween(Window.unboundedPreceding, -1))
    carry = spined.withColumn(
        "_carry", F.last("_cl", ignorenulls=True).over(win_carry)
    ).select(*keys, "_ck", "_carry")

    # 4. stitch — NULL-SAFE on the series keys (ADVICE r4): the window
    #    formulation groups NULL keys into one series, so the stitch join
    #    must match them too or NULL-key left rows would silently drop and
    #    break the 'results IDENTICAL to asof_join' guarantee. `_ck` is
    #    never null (derived from ts), so plain equality is fine there.
    lefts = u.where(F.col("_is_left") == 1)
    carry_r = carry.select(
        *[F.col(k).alias(f"_r_{k}") for k in keys],
        F.col("_ck").alias("_r_ck"), "_carry")
    cond = lefts["_ck"] == carry_r["_r_ck"]
    for k in keys:
        cond = cond & lefts[k].eqNullSafe(carry_r[f"_r_{k}"])
    return (
        lefts.join(carry_r, cond)
        .select(F.col("_row.*"),
                _emit(F.coalesce(F.col("_within"), F.col("_carry")),
                      ts_col, out_col, tolerance_us, sign))
    )
