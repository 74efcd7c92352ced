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
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _us(c):
    return F.unix_micros(c.cast("timestamp"))


def _prep(left: DataFrame, right: DataFrame, keys: Sequence[str],
          ts_col: str, payload_col: str):
    """Tag and union the two sides; right is pre-deduped to one row per
    (keys, ts) keeping the max payload (well-defined ASOF tie semantics)."""
    lcols = [c for c in left.columns]
    r = (right.groupBy(*keys, ts_col)
         .agg(F.max(payload_col).alias(payload_col)))
    tagged_l = left.select(
        *keys, ts_col, F.lit(1).alias("_is_left"),
        F.lit(None).cast(dict(r.dtypes)[payload_col]).alias("_pv_in"),
        F.struct(*[F.col(c) for c in lcols]).alias("_row"),
    )
    tagged_r = r.select(
        *keys, ts_col, F.lit(0).alias("_is_left"),
        F.col(payload_col).alias("_pv_in"),
        F.lit(None).cast(tagged_l.schema["_row"].dataType).alias("_row"),
    )
    return tagged_l.unionByName(tagged_r)


def asof_join(left: DataFrame, right: DataFrame, keys: Sequence[str],
              ts_col: str, payload_col: str,
              out_col: str = "asof_value") -> DataFrame:
    """Latest right ``payload_col`` at-or-before each left row's ts."""
    u = _prep(left, right, keys, ts_col, payload_col)
    w = (Window.partitionBy(*keys).orderBy(ts_col, "_is_left")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (
        u.withColumn(out_col, F.last("_pv_in", ignorenulls=True).over(w))
        .where(F.col("_is_left") == 1)
        .select(F.col("_row.*"), out_col)
    )


def asof_join_chunked(left: DataFrame, right: DataFrame, keys: Sequence[str],
                      ts_col: str, payload_col: str,
                      out_col: str = "asof_value",
                      chunk_us: int = 86_400_000_000) -> DataFrame:
    """Skew-resistant as-of join (see module docstring). ``chunk_us`` is
    the time-chunk width in microseconds (default 1 day) — choose it so
    rows-per-(key, chunk) fits a task; correctness is chunk-invariant."""
    u = _prep(left, right, keys, ts_col, payload_col).withColumn(
        "_ck", F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) "
                      f"div {chunk_us}"))
    kl = [F.col(k) for k in keys]

    # 1. within-chunk running carry — partitions are (key, chunk)
    win_chunk = (Window.partitionBy(*keys, "_ck")
                 .orderBy(ts_col, "_is_left")
                 .rowsBetween(Window.unboundedPreceding, 0))
    u = u.withColumn("_within", F.last("_pv_in", ignorenulls=True).over(win_chunk))

    # 2. chunk summaries: last right value per non-empty (key, chunk)
    summaries = (
        u.where(F.col("_is_left") == 0)
        .groupBy(*keys, "_ck")
        .agg(F.max_by(F.col("_pv_in"), _us(F.col(ts_col))).alias("_cl"))
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
                F.coalesce(F.col("_within"), F.col("_carry")).alias(out_col))
    )
