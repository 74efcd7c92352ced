"""Deterministic distributed sketches: Count-Min (frequency estimation)
and HyperLogLog (cardinality estimation).

The reference keeps exact bounded heaps only (`schema.proto:147-150` LRU
Top-N counters — no sketches anywhere, SURVEY §2.4 "approx distinct /
sketches: absent"); at 100 TB a training-data pipeline needs sub-linear
summaries. Both sketches here use **md5-derived hashes and integer
register arithmetic**, which makes every intermediate engine-portable —
the DuckDB oracle recomputes the identical sketch, so the driver gate
hash-compares the *estimates*, not just plausibility:

- **Count-Min** (Cormode & Muthukrishnan 2005): D independent rows of W
  counters; cell_d(x) = md5("{d}|" + x) % W; estimate = min over rows.
  Build = one explode + groupBy (d, cell) — a D×W-row table regardless of
  corpus size. Integer-exact.
- **HyperLogLog** (Flajolet et al. 2007): bucket = md5(x)[0:4] % m,
  rho = leading zeros of the next 48 hash bits + 1, register = max(rho).
  The register MAX is idempotent — no pre-dedup shuffle is needed, one
  groupBy(key, bucket) over raw rows. The harmonic sum Σ 2^-M is scaled
  by 2^49 into BIGINTs so it is EXACT and aggregation-order-independent;
  only the final α·m²/S division is floating point (rounded to 6 dp, the
  repo's exactness convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_D = 4
CMS_W = 256

HLL_M = 64          # buckets (2^6)
HLL_RHO_MAX = 49    # 48 hash bits -> rho in [1, 49]
# alpha_m = 0.7213 / (1 + 1.079/m) for m >= 64 (Flajolet et al. 2007);
# embedded as the exact double literal so Spark, Python and DuckDB use the
# same constant
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 64.0)


def _hex_long(col: Column, start: int, length: int) -> Column:
    return F.conv(F.substring(col, start, length), 16, 10).cast("bigint")


def _hex_long_sql(expr: str, start: int, length: int) -> str:
    return f"CAST('0x' || substr({expr}, {start}, {length}) AS BIGINT)"


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------

def cms_build(items: DataFrame, item_col: str,
              d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Sketch table (row, cell, cnt) — D×W rows total. One shuffle on
    (row, cell); the sketch size is independent of corpus size, so at
    100 TB this is a full-scan map + a 1024-key aggregation."""
    cells = F.explode(F.array(*[
        F.struct(
            F.lit(r).alias("row"),
            (_hex_long(F.md5(F.concat(F.lit(f"{r}|"), F.col(item_col))), 1, 8)
             % w).alias("cell"),
        )
        for r in range(d)
    ])).alias("rc")
    return (
        items.select(cells)
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, item_col: str,
                 d: int = CMS_D, w: int = CMS_W) -> DataFrame:
    """Point estimates for the probe items: explode each probe to its D
    (row, cell) addresses, broadcast-join the (tiny) sketch, min over
    rows. CMS guarantees est >= true count.

    A probe whose (row, cell) has no sketch row (item absent from the
    corpus AND the cell uncollided) means that counter is 0, so the join is
    a LEFT join with missing ``cnt`` coalesced to 0 (ADVICE r4: an inner
    join would drop fully-absent probes and over-estimate partially-missing
    ones by taking the min over fewer rows)."""
    addr = probes.select(
        F.col(item_col),
        F.explode(F.array(*[
            F.struct(
                F.lit(r).alias("row"),
                (_hex_long(F.md5(F.concat(F.lit(f"{r}|"), F.col(item_col))),
                           1, 8) % w).alias("cell"),
            )
            for r in range(d)
        ])).alias("rc"),
    ).select(item_col, F.col("rc.row").alias("row"),
             F.col("rc.cell").alias("cell"))
    return (
        addr.join(F.broadcast(sketch), ["row", "cell"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def cms_cells_sql(d: int = CMS_D, w: int = CMS_W) -> str:
    """Fragment: per-item (row, cell) addresses for an aliased column
    ``tok`` — UNION ALL over the D hash rows."""
    parts = [
        f"SELECT tok, {r} AS row, "
        + _hex_long_sql(f"md5('{r}|' || tok)", 1, 8) + f" % {w} AS cell "
        "FROM toks"
        for r in range(d)
    ]
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def hll_register_cols(key: Column) -> tuple[Column, Column]:
    """(bucket, rho) for one hashed key: bucket from the first 16 hash
    bits, rho = leading-zero count of the next 48 bits + 1 (via the exact
    integer identity rho = 49 - bitlength(w); bin() length is exact where
    a float log2 could mis-round at powers of two)."""
    h = F.md5(key.cast("string"))
    bucket = _hex_long(h, 1, 4) % HLL_M
    w = _hex_long(h, 5, 12)
    rho = F.when(w == 0, F.lit(HLL_RHO_MAX)).otherwise(
        F.lit(HLL_RHO_MAX) - F.length(F.bin(w)))
    return bucket, rho


def hll_estimate_expr(s_col: Column, nz_col: Column) -> Column:
    """Estimate from the EXACT integer harmonic sum.

    ``s_col``  = Σ_present 2^(49 - M_j)  (BIGINT, order-independent)
    ``nz_col`` = number of present (non-zero) registers

    Absent registers contribute 2^49 each; raw = α·m²·2^49 / S. Small-range
    (raw ≤ 2.5m, zeros present) switches to linear counting m·ln(m/V).
    Branch decisions are functions of exact integers, so both engines take
    the same branch; the final division/log is rounded to 6 dp."""
    m = F.lit(HLL_M)
    total_s = (s_col
               + (m - nz_col).cast("bigint")
               * F.shiftleft(F.lit(1).cast("long"), HLL_RHO_MAX)).cast("double")
    raw = F.lit(HLL_ALPHA) * m * m * F.pow(F.lit(2.0), F.lit(HLL_RHO_MAX)) / total_s
    v = (m - nz_col).cast("double")
    linear = m.cast("double") * F.log(m.cast("double") / v)
    return F.round(
        F.when((raw <= 2.5 * HLL_M) & (v > 0), linear).otherwise(raw), 6)


def hll_estimate_sql(s_expr: str, nz_expr: str) -> str:
    m = HLL_M
    total = f"CAST({s_expr} + (({m} - {nz_expr}) * (1::BIGINT << {HLL_RHO_MAX})) AS DOUBLE)"
    # CAST the alpha literal to DOUBLE: DuckDB parses a bare decimal
    # literal as DECIMAL and the chained multiplication overflows at
    # DECIMAL(18); Spark's F.lit(float) is already a double
    raw = (f"(CAST({HLL_ALPHA!r} AS DOUBLE) * {m} * {m} * (2.0 ** {HLL_RHO_MAX})"
           f" / {total})")
    v = f"CAST({m} - {nz_expr} AS DOUBLE)"
    linear = f"({m} * ln({m} / {v}))"
    return (f"ROUND(CASE WHEN {raw} <= {2.5 * m} AND {v} > 0 "
            f"THEN {linear} ELSE {raw} END, 6)")


# ---------------------------------------------------------------------------
# Bloom filter (membership)
# ---------------------------------------------------------------------------

BLOOM_M = 1024
BLOOM_K = 3


def bloom_positions(col: Column, k: int = BLOOM_K, m: int = BLOOM_M) -> Column:
    """The k bit positions of one item (array<bigint>), md5-derived so any
    engine computes the identical filter."""
    return F.array(*[
        _hex_long(F.md5(F.concat(F.lit(f"{i}|"), col)), 1, 8) % m
        for i in range(k)
    ])


def bloom_build(members: DataFrame, item_col: str,
                k: int = BLOOM_K, m: int = BLOOM_M) -> DataFrame:
    """The filter as its set of set-bit positions — at most ``m`` rows
    whatever the member-set size (the sub-linear membership summary;
    explode + distinct = one shuffle bounded by m)."""
    return (
        members.select(F.explode(
            bloom_positions(F.col(item_col), k, m)).alias("pos"))
        .distinct()
    )


def bloom_test(bits: DataFrame, probes: DataFrame, item_col: str,
               k: int = BLOOM_K, m: int = BLOOM_M) -> DataFrame:
    """Membership test: an item is (possibly) in the set iff ALL k of its
    positions are set. The bits table is broadcast (≤ m rows); one-sided
    error — false positives possible, false negatives never."""
    addr = probes.select(
        F.col(item_col),
        F.explode(bloom_positions(F.col(item_col), k, m)).alias("pos"),
    )
    return (
        addr.join(F.broadcast(bits), "pos", "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("hits"))
        .join(probes.select(item_col), item_col, "right")
        .select(item_col,
                (F.coalesce(F.col("hits"), F.lit(0)) == k).alias("in_bloom"))
    )


def bloom_positions_sql(expr: str, k: int = BLOOM_K, m: int = BLOOM_M) -> list:
    return [
        _hex_long_sql(f"md5('{i}|' || {expr})", 1, 8) + f" % {m}"
        for i in range(k)
    ]
