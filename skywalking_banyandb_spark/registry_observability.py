"""Observability time-series extensions: as-of join, bucketed range join,
counter rate/delta, moving averages, exact percentiles, latency heatmaps.

The reference's query surface stops at scan/filter/group/agg/topN (SURVEY
§2.3/§2.7 — no joins, no analytic windows); these entries add the
time-series analytics an APM/metrics user reaches for next (SkyWalking's own
UI computes percentiles and heatmaps from BanyanDB raw reads client-side —
e.g. the heatmap/percentile panels fed by measure queries). Each is built
Spark-first with an eye on 100 TB:

- **as-of join** — the classic "latest reading at or before t" correlation.
  Implemented as the union-trick: tag both sides, one shuffle on the series
  key, sort within partition, `last(ignorenulls)` running carry. No range
  join, no broadcast NLJ — wall-clock scales with one hash partitioning of
  (left + right), which is the optimal distributed plan. DuckDB's native
  `ASOF LEFT JOIN` is the (independently implemented) oracle.
- **bucketed range join** — "how many X happened in the 60s before each Y".
  Naive formulations become O(n²) nested-loop joins; here each left row
  probes exactly two 60-second hash buckets (its own and the preceding one)
  via a shuffle equi-join on (key, bucket), then the exact range predicate
  filters in the conditional COUNT. Candidate fan-out is bounded by bucket
  population, never by table size.
- **percentiles** — exact `percentile_disc`-style (upper-element, rank =
  ceil(p·n) computed with INTEGER arithmetic: `(9n+9) div 10`, never
  float·count, because Spark lits are doubles while SQL literals parse as
  DECIMAL and the two round differently at half-way points). One shuffle on
  the group key; rank + partition-count windows share the partitioning.
- **rate/delta, moving averages** — lag/frame windows per series key with
  DECIMAL(24,6) accumulation for order-independent float sums (the repo-wide
  exactness convention, see plans/measure.py).

All entries shuffle on their natural series key exactly once (the heatmap
and percentile plans are single-pass aggregations), so they hold at 1000
executors: no driver-side loops, no collects, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import register
from .sources.parquet import read_table


def _us(c):
    """Microsecond epoch of a (possibly NTZ) timestamp column. Parquet
    without a zone loads as TIMESTAMP_NTZ; session.py pins UTC so the cast
    is a pure reinterpretation (same convention as events_sessionization)."""
    return F.unix_micros(c.cast("timestamp"))


# ---------------------------------------------------------------------------
# As-of join: for every 'error' event, the most recent 'purchase' of the
# same user at or before it (value + how long before).
# ---------------------------------------------------------------------------

def _asof_join(spark: SparkSession, sf: str) -> DataFrame:
    # The union-trick inline (carrying both value and matched timestamp);
    # the reusable operator form lives in operators/asof.py (asof_join +
    # the skew-resistant chunked variant, proven identical in
    # tests/test_observability.py and fuzzed vs DuckDB ASOF in
    # tests/test_fuzz_asof.py).
    ev = read_table(spark, f"{sf}/events.parquet")
    left = ev.where(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", F.col("value").alias("error_value"))
    # ASOF tie-breaking needs a unique right key per (user, ts): collapse
    # same-instant purchases to their max value (both sides of the oracle).
    right = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    tagged = left.select(
        "user_id", "ts", F.lit(1).alias("is_left"), "event_id", "error_value",
        F.lit(None).cast("double").alias("purchase_value"),
    ).unionByName(right.select(
        "user_id", "ts", F.lit(0).alias("is_left"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("error_value"),
        "purchase_value",
    ))
    # Right rows sort before left rows at the same instant (is_left ASC), so
    # `ts >= right.ts` inclusive semantics fall out of the running carry.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        tagged
        .withColumn("pv", F.last("purchase_value", ignorenulls=True).over(w))
        .withColumn("pts", F.last(
            F.when(F.col("purchase_value").isNotNull(), F.col("ts")),
            ignorenulls=True).over(w))
        .where(F.col("is_left") == 1)
    )
    return carried.select(
        "event_id", "user_id", "error_value",
        F.col("pv").alias("purchase_value"),
        (_us(F.col("ts")) - _us(F.col("pts"))).alias("lag_us"),
    ).orderBy("event_id")


register(
    "events_asof_join",
    _asof_join,
    """WITH l AS (
         SELECT event_id, user_id, ts, value AS error_value
         FROM events WHERE event_type = 'error'),
       r AS (
         SELECT user_id, ts, MAX(value) AS purchase_value
         FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
       SELECT l.event_id, l.user_id, l.error_value, r.purchase_value,
              epoch_us(l.ts) - epoch_us(r.ts) AS lag_us
       FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
       ORDER BY l.event_id""",
)


# ---------------------------------------------------------------------------
# Bucketed range join: views per user in the 60 seconds before each error.
# ---------------------------------------------------------------------------

_WIN_US = 60_000_000  # 60s in microseconds


def _range_join_bucketed(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, f"{sf}/events.parquet")
    left = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", _us(F.col("ts")).alias("l_us"))
    right = ev.where(F.col("event_type") == "view").select(
        "user_id", _us(F.col("ts")).alias("r_us"))
    # Each left row probes its own bucket and the preceding one — the window
    # (l_us - 60s, l_us] spans at most two 60-second buckets. `div` keeps the
    # bucket arithmetic integral (float division could mis-floor a boundary).
    lx = left.withColumn(
        "jb", F.explode(F.array(F.expr(f"l_us div {_WIN_US} - 1"),
                                F.expr(f"l_us div {_WIN_US}"))))
    rx = right.withColumn("jb", F.expr(f"r_us div {_WIN_US}"))
    joined = lx.join(rx, ["user_id", "jb"], "left_outer")
    # Conditional count instead of post-join filter: a left row whose bucket
    # candidates all miss still survives with n = 0.
    in_range = (
        F.col("r_us").isNotNull()
        & (F.col("r_us") > F.col("l_us") - _WIN_US)
        & (F.col("r_us") <= F.col("l_us"))
    )
    return (
        joined.groupBy("event_id", "user_id")
        .agg(F.sum(F.when(in_range, 1).otherwise(0)).cast("long")
             .alias("n_views_60s"))
        .orderBy("event_id")
    )


register(
    "events_range_join_bucketed",
    _range_join_bucketed,
    """WITH l AS (
         SELECT event_id, user_id, epoch_us(ts) AS l_us
         FROM events WHERE event_type = 'error'),
       r AS (
         SELECT user_id, epoch_us(ts) AS r_us
         FROM events WHERE event_type = 'view')
       SELECT l.event_id, l.user_id,
              CAST(COUNT(r.r_us) AS BIGINT) AS n_views_60s
       FROM l LEFT JOIN r
         ON l.user_id = r.user_id
        AND r.r_us > l.l_us - 60000000 AND r.r_us <= l.l_us
       GROUP BY l.event_id, l.user_id
       ORDER BY l.event_id""",
)


# ---------------------------------------------------------------------------
# Counter rate/delta per series (user's click gauge): lag-window deltas,
# monotonic-increase total with DECIMAL accumulation, reset count.
# ---------------------------------------------------------------------------

def _rate_delta(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, f"{sf}/events.parquet").where(
        F.col("event_type") == "click")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.withColumn("delta", F.col("value") - F.lag("value").over(w))
    return (
        d.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.when(F.col("delta") > 0, 1).otherwise(0)).cast("long")
            .alias("n_increase"),
            F.sum(F.when(F.col("delta") < 0, 1).otherwise(0)).cast("long")
            .alias("n_resets"),
            F.sum(F.when(F.col("delta") > 0, F.col("delta"))
                  .otherwise(F.lit(0)).cast("decimal(24,6)"))
            .cast("double").alias("total_increase"),
        )
        .orderBy("user_id")
    )


register(
    "measure_rate_delta",
    _rate_delta,
    """WITH d AS (
         SELECT user_id,
                value - lag(value) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS delta
         FROM events WHERE event_type = 'click')
       SELECT user_id, COUNT(*) AS n_points,
              CAST(SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_increase,
              CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_resets,
              CAST(SUM(CAST(CASE WHEN delta > 0 THEN delta ELSE 0 END
                            AS DECIMAL(24,6))) AS DOUBLE) AS total_increase
       FROM d GROUP BY user_id ORDER BY user_id""",
)


# ---------------------------------------------------------------------------
# Trailing moving average: hourly downsample, then a 3-bucket trailing frame
# per event_type. Row-frame windows skip empty hours (documented; a
# gap-filled variant would sequence-join the full hour spine).
# ---------------------------------------------------------------------------

def _moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, f"{sf}/events.parquet")
    b = (
        ev.groupBy(
            F.window(F.col("ts"), "1 hour").getField("start").alias("bucket"),
            "event_type")
        .agg(F.sum(F.col("value").cast("decimal(24,6)")).alias("s"),
             F.count("value").alias("c"))
    )
    w = (Window.partitionBy("event_type").orderBy("bucket")
         .rowsBetween(-2, 0))
    return (
        b.select(
            "bucket", "event_type",
            (F.col("s").cast("double") / F.col("c")).alias("hourly_avg"),
            (F.sum("s").over(w).cast("double") / F.sum("c").over(w))
            .alias("moving_avg_3h"),
        )
        .orderBy("bucket", "event_type")
    )


register(
    "measure_moving_avg",
    _moving_avg,
    """WITH b AS (
         SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket, event_type,
                SUM(CAST(value AS DECIMAL(24,6))) AS s, COUNT(value) AS c
         FROM events GROUP BY bucket, event_type)
       SELECT bucket, event_type,
              CAST(s AS DOUBLE) / c AS hourly_avg,
              CAST(SUM(s) OVER w AS DOUBLE) / SUM(c) OVER w AS moving_avg_3h
       FROM b
       WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
       ORDER BY bucket, event_type""",
)


# ---------------------------------------------------------------------------
# Exact latency percentiles (percentile_disc upper-element semantics):
# rank = ceil(p*n) via integer arithmetic, ties broken by event_id so both
# engines pick the identical element.
# ---------------------------------------------------------------------------

def _percentiles(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, f"{sf}/events.parquet")
    rnw = Window.partitionBy("event_type").orderBy("value", "event_id")
    cw = Window.partitionBy("event_type")
    r = (
        ev.select("event_type", "value", "event_id")
        .withColumn("rn", F.row_number().over(rnw))
        .withColumn("n", F.count(F.lit(1)).over(cw))
    )

    def at(expr: str, alias: str):
        return F.max(F.when(F.col("rn") == F.expr(expr), F.col("value"))).alias(alias)

    return (
        r.groupBy("event_type")
        .agg(
            at("(n + 1) div 2", "p50"),
            at("(9 * n + 9) div 10", "p90"),
            at("(99 * n + 99) div 100", "p99"),
            F.max("n").alias("n"),
        )
        .orderBy("event_type")
    )


register(
    "measure_latency_percentiles",
    _percentiles,
    """WITH r AS (
         SELECT event_type, value,
                row_number() OVER (
                    PARTITION BY event_type ORDER BY value, event_id) AS rn,
                COUNT(*) OVER (PARTITION BY event_type) AS n
         FROM events)
       SELECT event_type,
              MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS p50,
              MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN value END) AS p90,
              MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN value END) AS p99,
              MAX(n) AS n
       FROM r GROUP BY event_type ORDER BY event_type""",
)


# ---------------------------------------------------------------------------
# Latency heatmap: per-day × fixed-width value bucket counts (the histogram
# a heatmap UI panel renders). Integer-exact; single-pass aggregation.
# ---------------------------------------------------------------------------

def _heatmap(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, f"{sf}/events.parquet")
    return (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            "event_type",
            F.expr("CAST(floor(value / 50) AS BIGINT)").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("day", "event_type", "bucket")
    )


register(
    "latency_heatmap",
    _heatmap,
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
              CAST(floor(value / 50) AS BIGINT) AS bucket,
              COUNT(*) AS n
       FROM events GROUP BY day, event_type, bucket
       ORDER BY day, event_type, bucket""",
)


# ---------------------------------------------------------------------------
# Hopping (sliding) windows: the reference's flow engine is tumbling-only
# (pkg/flow/streaming/sliding_window.go:255 NewTumblingTimeWindows); Spark's
# F.window(ts, size, slide) gives overlapping windows natively. Batch form
# here (oracle-paired); the streaming form is proven in
# tests/test_streaming_windows.py.
# ---------------------------------------------------------------------------

def _hopping_window(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, f"{sf}/events.parquet").where(
        F.col("event_type") == "error")
    return (
        ev.groupBy(
            F.window(F.col("ts"), "15 minutes", "5 minutes")
            .getField("start").alias("win_start"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.col("value").cast("decimal(24,6)")).cast("double")
             / F.count("value")).alias("avg_value"),
        )
        .orderBy("win_start")
    )


register(
    "measure_hopping_window",
    _hopping_window,
    """WITH h AS (
         SELECT value,
                make_timestamp((epoch_us(ts) // 300000000 - w) * 300000000)
                    AS win_start
         FROM events, (SELECT unnest(generate_series(0, 2)) AS w)
         WHERE event_type = 'error')
       SELECT win_start, COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) / COUNT(value)
                  AS avg_value
       FROM h GROUP BY win_start ORDER BY win_start""",
)


# ---------------------------------------------------------------------------
# Native session windows: F.session_window merges rows whose 30-minute
# activity windows overlap — the operator form of the lag/cumsum
# sessionization in registry_advanced.py (which stays as the manual
# construction). Split boundary is EXCLUSIVE (a gap of exactly 30m starts a
# new session, session-window end-exclusivity), hence >= in the oracle.
# ---------------------------------------------------------------------------

def _session_window_native(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, f"{sf}/events.parquet")
    # group on the session_window STRUCT — the merge rewrite only fires on
    # the window column itself; extracting .start first degenerates every
    # row into its own session
    return (
        ev.groupBy(F.col("user_id"), F.session_window(F.col("ts"), "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.max("ts").alias("last_ts"))
        .select(
            "user_id",
            F.col("session_window").getField("start").alias("session_start"),
            "n_events", "last_ts")
        .orderBy("user_id", "session_start")
    )


register(
    "events_session_window",
    _session_window_native,
    """WITH g AS (
         SELECT user_id, ts, event_id,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          >= 1800000000
                     THEN 1 ELSE 0 END AS new_sess
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ), s AS (
         SELECT user_id, ts,
                SUM(new_sess) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS sid
         FROM g)
       SELECT user_id, MIN(ts) AS session_start,
              COUNT(*) AS n_events, MAX(ts) AS last_ts
       FROM s GROUP BY user_id, sid
       ORDER BY user_id, session_start""",
)


# ---------------------------------------------------------------------------
# Gap filling + linear interpolation (PromQL/Timescale `time_bucket_gapfill`
# shape): join the series onto a generated hour spine, then interpolate
# missing buckets between their nearest real neighbours (carry at edges).
# Pure window arithmetic — prev/next via last/first(ignorenulls) frames on
# the series partition; the spine is a generated sequence (no data scan).
# ---------------------------------------------------------------------------

_GF_T0 = "2024-01-03 00:00:00"
_GF_T1 = "2024-01-05 23:00:00"   # inclusive last hour of the 72-hour spine


def _gap_fill(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, f"{sf}/events.parquet")
    ts = F.col("ts").cast("timestamp")
    series = ["error", "purchase"]
    pts = (
        ev.where(F.col("event_type").isin(series)
                 & (F.col("value") >= 100)
                 & (ts >= F.lit(_GF_T0).cast("timestamp"))
                 & (ts < F.lit("2024-01-06 00:00:00").cast("timestamp")))
        .groupBy(F.date_trunc("hour", ts).alias("h"), "event_type")
        .agg((F.sum(F.col("value").cast("decimal(24,6)")).cast("double")
              / F.count("value")).alias("v"))
    )
    spine = (
        spark.createDataFrame([(s,) for s in series], "event_type string")
        .select(
            "event_type",
            F.explode(F.sequence(
                F.lit(_GF_T0).cast("timestamp"),
                F.lit(_GF_T1).cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"))).alias("h"))
    )
    joined = spine.join(pts, ["event_type", "h"], "left")
    prevw = (Window.partitionBy("event_type").orderBy("h")
             .rowsBetween(Window.unboundedPreceding, 0))
    nextw = (Window.partitionBy("event_type").orderBy("h")
             .rowsBetween(0, Window.unboundedFollowing))
    hv = F.when(F.col("v").isNotNull(), F.col("h"))
    d = (
        joined
        .withColumn("pv", F.last("v", ignorenulls=True).over(prevw))
        .withColumn("ph", F.last(hv, ignorenulls=True).over(prevw))
        .withColumn("nv", F.first("v", ignorenulls=True).over(nextw))
        .withColumn("nh", F.first(hv, ignorenulls=True).over(nextw))
    )
    us = F.unix_micros
    frac = ((us(F.col("h")) - us(F.col("ph"))).cast("double")
            / (us(F.col("nh")) - us(F.col("ph"))).cast("double"))
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(),
              F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    return (
        d.select(
            "event_type", F.col("h").alias("hour"),
            F.round(filled, 6).alias("filled_value"),
            F.col("v").isNull().alias("is_gap"))
        .orderBy("event_type", "hour")
    )


register(
    "measure_gap_fill_interpolate",
    _gap_fill,
    f"""WITH pts AS (
         SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type,
                CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE)
                    / COUNT(value) AS v
         FROM events
         WHERE event_type IN ('error', 'purchase') AND value >= 100
           AND ts >= TIMESTAMP '{_GF_T0}'
           AND ts <  TIMESTAMP '2024-01-06 00:00:00'
         GROUP BY h, event_type),
       spine AS (
         SELECT s.event_type, g.h
         FROM (SELECT unnest(['error', 'purchase']) AS event_type) s,
              (SELECT unnest(generate_series(TIMESTAMP '{_GF_T0}',
                       TIMESTAMP '{_GF_T1}', INTERVAL 1 HOUR)) AS h) g),
       j AS (
         SELECT spine.event_type, spine.h, pts.v
         FROM spine LEFT JOIN pts
           ON pts.event_type = spine.event_type AND pts.h = spine.h),
       d AS (
         SELECT event_type, h, v,
                last_value(v IGNORE NULLS) OVER wp AS pv,
                last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                    OVER wp AS ph,
                first_value(v IGNORE NULLS) OVER wn AS nv,
                first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                    OVER wn AS nh
         FROM j
         WINDOW wp AS (PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                wn AS (PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       SELECT event_type, h AS hour,
              ROUND(CASE
                WHEN v IS NOT NULL THEN v
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                  pv + (nv - pv) *
                  (CAST(epoch_us(h) - epoch_us(ph) AS DOUBLE)
                   / CAST(epoch_us(nh) - epoch_us(ph) AS DOUBLE))
                WHEN pv IS NOT NULL THEN pv
                ELSE nv END, 6) AS filled_value,
              (v IS NULL) AS is_gap
       FROM d ORDER BY event_type, hour""",
)


# ---------------------------------------------------------------------------
# Z-score anomaly flagging with EXACT moments: sum and sum-of-squares
# accumulate in DECIMAL (values have 2 decimals -> squares have 4 -> both
# quantize exactly), so mean/std are single deterministic double
# expressions instead of order-dependent float aggregations.
# ---------------------------------------------------------------------------

def _zscore_anomalies(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, f"{sf}/events.parquet")
    v = F.col("value")
    stats = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.sum(v.cast("decimal(24,6)")).cast("double").alias("s1"),
        F.sum((v * v).cast("decimal(30,6)")).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    z = (v - mean) / F.sqrt(var)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > 3)
        .select("event_id", "event_type", "value", F.round(z, 6).alias("z"))
        .orderBy("event_id")
    )


register(
    "measure_zscore_anomalies",
    _zscore_anomalies,
    """WITH stats AS (
         SELECT event_type, COUNT(value) AS n,
                CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS s1,
                CAST(SUM(CAST(value * value AS DECIMAL(30,6))) AS DOUBLE) AS s2
         FROM events GROUP BY event_type)
       SELECT e.event_id, e.event_type, e.value,
              ROUND((e.value - s.s1 / s.n)
                    / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1)), 6) AS z
       FROM events e JOIN stats s ON s.event_type = e.event_type
       WHERE abs((e.value - s.s1 / s.n)
                 / sqrt((s.s2 - s.s1 * s.s1 / s.n) / (s.n - 1))) > 3
       ORDER BY e.event_id""",
)


# ---------------------------------------------------------------------------
# OHLC / first-last windows: candlestick downsampling (open = first value in
# the window by (ts, event_id), close = last, high/low = max/min). The
# canonical TSDB "first()/last()" aggregate pair — one partial+final
# aggregation, no window function, no second shuffle: open/close are
# min_by/max_by over a zero-padded "micros|event_id" string key, which is a
# TOTAL order (lexicographic on fixed-width digits = numeric order), so the
# result is deterministic and engine-portable. At 100 TB this is the same
# single-shuffle plan as any group-by.
# ---------------------------------------------------------------------------

#: Bias added to epoch micros before the zero-pad: a NEGATIVE pre-1970
#: micros value would render with a '-' prefix, breaking the
#: lexicographic==numeric property of the padded key. 5e18 keeps any
#: representable timestamp positive while staying inside int64
#: (5e18 + |epoch_us| < 9.2e18); both engines apply the same literal.
_OHLC_KEY_BIAS = 5_000_000_000_000_000_000


def _ohlc_window(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, f"{sf}/events.parquet").where(
        F.col("event_type").isin("click", "purchase"))
    key = F.concat(
        F.lpad((F.unix_micros(F.col("ts").cast("timestamp"))
                + F.lit(_OHLC_KEY_BIAS)).cast("string"), 20, "0"),
        F.lit("|"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("hour", "event_type")
    )


register(
    "measure_ohlc_window",
    _ohlc_window,
    f"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
              arg_min(value, lpad(CAST(epoch_us(ts) + {_OHLC_KEY_BIAS} AS VARCHAR), 20, '0')
                             || '|' || lpad(CAST(event_id AS VARCHAR), 12, '0'))
                  AS open,
              MAX(value) AS high,
              MIN(value) AS low,
              arg_max(value, lpad(CAST(epoch_us(ts) + {_OHLC_KEY_BIAS} AS VARCHAR), 20, '0')
                             || '|' || lpad(CAST(event_id AS VARCHAR), 12, '0'))
                  AS close,
              COUNT(*) AS n
       FROM events WHERE event_type IN ('click', 'purchase')
       GROUP BY date_trunc('hour', ts), event_type
       ORDER BY hour, event_type""",
)


# ---------------------------------------------------------------------------
# PromQL-style histogram_quantile: quantiles estimated from CUMULATIVE
# le-bucket counters — the shape every Prometheus-compatible backend stores
# and the ONLY quantile that is mergeable across 1000 executors/scrapes
# (bucket counts are associative sums; exact per-series quantiles are not).
# Linear interpolation inside the owning bucket, +Inf clamps to the last
# finite boundary (the PromQL convention). All arithmetic is the same
# expression shape on both engines -> bit-identical doubles.
# ---------------------------------------------------------------------------

_HQ_BOUNDS = [25.0, 50.0, 100.0, 200.0, 400.0]  # +Inf implicit


def _histogram_quantile(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, f"{sf}/events.parquet")
    v = F.col("value")
    aggs = [
        F.sum(F.when(v <= b, 1).otherwise(0)).cast("double").alias(f"le_{i}")
        for i, b in enumerate(_HQ_BOUNDS)
    ]
    g = ev.groupBy("event_type").agg(
        *aggs, F.count(F.lit(1)).cast("double").alias("total"))

    def quantile(q: float):
        rank = F.lit(q) * F.col("total")
        # walk buckets highest-first so the LAST when that matches is the
        # first bucket whose cumulative count >= rank
        expr = F.lit(float(_HQ_BOUNDS[-1]))  # +Inf bucket -> clamp
        for i in range(len(_HQ_BOUNDS) - 1, -1, -1):
            lo = F.lit(0.0) if i == 0 else F.lit(float(_HQ_BOUNDS[i - 1]))
            hi = F.lit(float(_HQ_BOUNDS[i]))
            cum = F.col(f"le_{i}")
            prev = F.lit(0.0) if i == 0 else F.col(f"le_{i-1}")
            inside = F.when(
                cum - prev > 0,
                lo + (hi - lo) * (rank - prev) / (cum - prev),
            ).otherwise(hi)
            expr = F.when(cum >= rank, inside).otherwise(expr)
        return F.round(expr, 6)

    return (
        g.select(
            "event_type",
            quantile(0.5).alias("q50"),
            quantile(0.9).alias("q90"),
            quantile(0.99).alias("q99"),
        )
        .orderBy("event_type")
    )


def _hq_sql() -> str:
    bounds = _HQ_BOUNDS
    les = ", ".join(
        f"CAST(SUM(CASE WHEN value <= {b} THEN 1 ELSE 0 END) AS DOUBLE)"
        f" AS le_{i}" for i, b in enumerate(bounds))

    def q_expr(q: float) -> str:
        expr = repr(float(bounds[-1]))
        for i in range(len(bounds) - 1, -1, -1):
            lo = "0.0" if i == 0 else repr(float(bounds[i - 1]))
            hi = repr(float(bounds[i]))
            cum, prev = f"le_{i}", ("0.0" if i == 0 else f"le_{i-1}")
            inside = (f"CASE WHEN {cum} - {prev} > 0 THEN "
                      f"{lo} + ({hi} - {lo}) * (({q} * total) - {prev})"
                      f" / ({cum} - {prev}) ELSE {hi} END")
            expr = f"CASE WHEN {cum} >= ({q} * total) THEN ({inside}) ELSE ({expr}) END"
        return f"round({expr}, 6)"

    return f"""WITH g AS (
         SELECT event_type, {les},
                CAST(COUNT(*) AS DOUBLE) AS total
         FROM events GROUP BY event_type)
       SELECT event_type, {q_expr(0.5)} AS q50, {q_expr(0.9)} AS q90,
              {q_expr(0.99)} AS q99
       FROM g ORDER BY event_type"""


register("measure_histogram_quantile", _histogram_quantile, _hq_sql())


# ---------------------------------------------------------------------------
# Alerting-rule evaluation: threshold breach detection + contiguous-breach
# merging (the "for:" duration semantics of an alert rule). Gaps-and-islands:
# consecutive breached hourly buckets collapse to one alert interval via
# bucket_index - row_number (pure integer arithmetic). One shuffle on the
# series key for the bucket agg, one bounded window over breached buckets
# only — evaluation cost tracks breach count, not corpus size.
# ---------------------------------------------------------------------------

def _alert_intervals(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = read_table(spark, f"{sf}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    # exact FLOOR division (pmod is non-negative), matching DuckDB's `//`:
    # a double divide + cast('bigint') truncates toward zero and would put
    # pre-1970 timestamps in the wrong bucket (same idiom as operators/asof)
    hour_us = F.lit(3_600_000_000)
    bucket = ((us - F.pmod(us, hour_us)) / hour_us).cast("bigint")
    per = (
        ev.groupBy(F.col("event_type"), bucket.alias("bk"))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 8)  # the alert threshold (non-vacuous at sf0.01)
    )
    w = Window.partitionBy("event_type").orderBy("bk")
    islands = per.withColumn(
        "island", F.col("bk") - F.row_number().over(w))
    return (
        islands.groupBy("event_type", "island")
        .agg(
            F.timestamp_micros(F.min("bk") * 3_600_000_000).alias("alert_start"),
            F.timestamp_micros((F.max("bk") + 1) * 3_600_000_000)
            .alias("alert_end"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("n").alias("peak"),
        )
        .drop("island")
        .orderBy("event_type", "alert_start")
    )


register(
    "events_alert_intervals",
    _alert_intervals,
    """WITH per AS (
         SELECT event_type,
                CAST((epoch_us(ts) - ((epoch_us(ts) % 3600000000) + 3600000000) % 3600000000) // 3600000000 AS BIGINT) AS bk,
                COUNT(*) AS n
         FROM events
         GROUP BY event_type, CAST((epoch_us(ts) - ((epoch_us(ts) % 3600000000) + 3600000000) % 3600000000) // 3600000000 AS BIGINT)
         HAVING COUNT(*) >= 8),
       isl AS (
         SELECT event_type, bk, n,
                bk - row_number() OVER (
                    PARTITION BY event_type ORDER BY bk) AS island
         FROM per)
       SELECT event_type,
              make_timestamp(MIN(bk) * 3600000000) AS alert_start,
              make_timestamp((MAX(bk) + 1) * 3600000000) AS alert_end,
              COUNT(*) AS n_buckets, MAX(n) AS peak
       FROM isl GROUP BY event_type, island
       ORDER BY event_type, alert_start""",
)


# ---------------------------------------------------------------------------
# PromQL-exact counter increase: reset-aware (NEW r6). Prometheus's
# increase()/rate() treat a counter DECREASE as a restart from zero — the
# post-reset sample contributes its FULL value, not a negative delta
# (promql/functions.go extrapolatedRate's resets handling; the reference's
# SkyWalking meters are exactly such counters). measure_rate_delta keeps the
# simpler clamp-at-zero semantics; this entry is the PromQL-faithful one,
# per (series, hour): increase = Σ(delta >= 0 ? delta : current), rate =
# increase / covered-seconds. Window-edge extrapolation lives in its own
# twin entry `measure_rate_extrapolated_promql` (r7 — VERDICT r6 #7): this
# one reports the exact in-window increase, that one the Prometheus
# estimator. One lag window + one aggregation, both on the same
# (user_id) partitioning; DECIMAL accumulation keeps the sum
# order-independent across 1000 executors.
# ---------------------------------------------------------------------------

def _counter_increase_promql(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, f"{sf}/events.parquet").where(
        F.col("event_type") == "click")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = (
        ev.select("user_id", "ts", "event_id", "value")
        .withColumn("prev", F.lag("value").over(w))
        .withColumn("hour", F.date_trunc("hour", F.col("ts")))
    )
    contrib = F.when(F.col("prev").isNull(), F.lit(0.0)).otherwise(
        F.when(F.col("value") >= F.col("prev"),
               F.col("value") - F.col("prev"))
        .otherwise(F.col("value")))  # reset -> counter restarted from 0
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = (
        d.groupBy("user_id", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum(F.when(F.col("prev").isNotNull()
                         & (F.col("value") < F.col("prev")), 1)
                  .otherwise(0)).cast("long").alias("n_resets"),
            F.sum(contrib.cast("decimal(24,6)")).cast("double")
            .alias("increase"),
            (F.max(us) - F.min(us)).alias("span_us"),
        )
    )
    return (
        g.select(
            "user_id", "hour", "n_samples", "n_resets", "increase",
            F.when(F.col("span_us") > 0,
                   F.col("increase") / (F.col("span_us")
                                        / F.lit(1_000_000.0)))
            .alias("rate_per_s"),
        )
        .orderBy("user_id", "hour")
    )


register(
    "measure_counter_increase_promql",
    _counter_increase_promql,
    """WITH d AS (
         SELECT user_id, ts, value,
                lag(value) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) AS prev,
                CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour
         FROM events WHERE event_type = 'click'),
       g AS (
         SELECT user_id, hour, COUNT(*) AS n_samples,
                CAST(SUM(CASE WHEN prev IS NOT NULL AND value < prev
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_resets,
                CAST(SUM(CAST(CASE WHEN prev IS NULL THEN 0.0
                              WHEN value >= prev THEN value - prev
                              ELSE value END AS DECIMAL(24,6))) AS DOUBLE)
                    AS increase,
                MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS span_us
         FROM d GROUP BY user_id, hour)
       SELECT user_id, hour, n_samples, n_resets, increase,
              CASE WHEN span_us > 0
                   THEN increase / (span_us / 1000000.0) END AS rate_per_s
       FROM g ORDER BY user_id, hour""",
)


# ---------------------------------------------------------------------------
# PromQL extrapolated rate (NEW r7 — VERDICT r6 #7): the full Prometheus
# estimator from promql/functions.go `extrapolatedRate`, closing the
# documented divergence of the exact-increase entry above. Per
# (series, hour) window [start, end):
#   raw       = last − first + Σ reset corrections  (in-window samples
#               only — PromQL never looks outside the range)
#   avgDur    = sampledInterval / (n − 1)
#   durStart  = firstT − start, clamped to avgDur/2 when ≥ 1.1·avgDur,
#               THEN capped by the zero-crossing estimate
#               sampledInterval · (firstV / raw) when raw > 0 ∧ firstV ≥ 0
#               (Prometheus ≥ 2.46 order — the clamp runs before the cap)
#   durEnd    = end − lastT, clamped to avgDur/2 when ≥ 1.1·avgDur
#   extrapolateToInterval = sampledInterval + durStart + durEnd
#   increase  = raw · extrapolateToInterval / sampledInterval
#   rate      = increase / 3600
# Windows with < 2 samples yield no result (PromQL drops them), and
# same-timestamp-only windows (sampledInterval = 0) likewise. Every step
# after the aggregation is one fixed IEEE expression over
# (first, last, firstT, lastT, n, raw), written identically in both
# engines, so the estimator is bit-stable; raw accumulates in DECIMAL
# like the exact entry. Shuffle shape: one (user, hour) lag/first/last
# window + one map-side-combined aggregation on the same key.
# ---------------------------------------------------------------------------

def _rate_extrapolated_promql(spark: SparkSession, sf: str) -> DataFrame:
    # series = user_id over ALL events (unlike the exact entry's click
    # slice): PromQL drops sub-2-sample windows, and the full stream
    # keeps enough multi-sample (user, hour) windows to exercise every
    # estimator branch at the correctness SF (426 vs 17 windows)
    ev = read_table(spark, f"{sf}/events.parquet")
    base = ev.select("user_id", "ts", "event_id", "value").withColumn(
        "hour", F.date_trunc("hour", F.col("ts")))
    w = Window.partitionBy("user_id", "hour").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing)
    d = (
        base
        .withColumn("prev", F.lag("value").over(w))
        # constant per (user, hour): the ordered-first sample's value
        .withColumn("first_v", F.first("value").over(wfull))
    )
    contrib = F.when(F.col("prev").isNull(), F.lit(0.0)).otherwise(
        F.when(F.col("value") >= F.col("prev"),
               F.col("value") - F.col("prev"))
        .otherwise(F.col("value")))
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = (
        d.groupBy("user_id", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum(contrib.cast("decimal(24,6)")).cast("double").alias("raw"),
            F.min(us).alias("first_us"),
            F.max(us).alias("last_us"),
            F.min("first_v").alias("first_v"),  # constant per group
        )
        .where((F.col("n_samples") >= 2)
               & (F.col("last_us") > F.col("first_us")))
    )
    hour_us = F.unix_micros(F.col("hour").cast("timestamp"))
    sampled = (F.col("last_us") - F.col("first_us")) / F.lit(1_000_000.0)
    avg_dur = sampled / (F.col("n_samples") - F.lit(1))
    dur_start0 = (F.col("first_us") - hour_us) / F.lit(1_000_000.0)
    dur_end = (hour_us + F.lit(3_600_000_000) - F.col("last_us")) \
        / F.lit(1_000_000.0)
    # promql/functions.go (Prometheus >= 2.46) order: threshold-clamp
    # durationToStart FIRST, then apply the zero-crossing cap to the
    # clamped value (ADVICE r7 — pre-2.46 applied the cap first)
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
    return (
        g.select(
            "user_id", "hour", "n_samples", "raw",
            (F.col("raw") * (extrap / sampled)).alias("increase"),
            (F.col("raw") * (extrap / sampled) / F.lit(3600.0))
            .alias("rate_per_s"),
        )
        .orderBy("user_id", "hour")
    )


register(
    "measure_rate_extrapolated_promql",
    _rate_extrapolated_promql,
    """WITH d AS (
         SELECT user_id, ts, value,
                CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                lag(value) OVER (
                    PARTITION BY user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP)
                    ORDER BY ts, event_id) AS prev,
                first_value(value) OVER (
                    PARTITION BY user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP)
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING) AS first_v
         FROM events),
       g AS (
         SELECT user_id, hour, COUNT(*) AS n_samples,
                CAST(SUM(CAST(CASE WHEN prev IS NULL THEN 0.0
                              WHEN value >= prev THEN value - prev
                              ELSE value END AS DECIMAL(24,6))) AS DOUBLE)
                    AS raw,
                MIN(epoch_us(ts)) AS first_us,
                MAX(epoch_us(ts)) AS last_us,
                MIN(first_v) AS first_v
         FROM d GROUP BY user_id, hour
         HAVING COUNT(*) >= 2 AND MAX(epoch_us(ts)) > MIN(epoch_us(ts))),
       e AS (
         SELECT *,
                (last_us - first_us) / 1000000.0 AS sampled,
                ((last_us - first_us) / 1000000.0) / (n_samples - 1)
                    AS avg_dur,
                (first_us - epoch_us(hour)) / 1000000.0 AS dur_start0,
                (epoch_us(hour) + 3600000000 - last_us) / 1000000.0
                    AS dur_end
         FROM g),
       x AS (
         SELECT *,
                CASE WHEN dur_start0 < avg_dur * 1.1 THEN dur_start0
                     ELSE avg_dur / 2.0 END AS dur_start1,
                avg_dur * 1.1 AS thresh
         FROM e),
       y AS (
         SELECT *,
                CASE WHEN raw > 0 AND first_v >= 0
                          AND sampled * (first_v / raw) < dur_start1
                     THEN sampled * (first_v / raw) ELSE dur_start1 END
                    AS dur_start
         FROM x),
       f AS (
         SELECT *,
                sampled
                + dur_start
                + CASE WHEN dur_end < thresh THEN dur_end
                       ELSE avg_dur / 2.0 END AS extrap
         FROM y)
       SELECT user_id, hour, n_samples, raw,
              raw * (extrap / sampled) AS increase,
              raw * (extrap / sampled) / 3600.0 AS rate_per_s
       FROM f ORDER BY user_id, hour""",
)


# ---------------------------------------------------------------------------
# SLO multi-window burn rate (NEW r6) — the Google SRE workbook alerting
# shape every observability stack reimplements: burn = error-ratio / error
# budget, evaluated over a SHORT and a LONG window simultaneously (fast
# detection + low flap). Hourly error ratios come from one partial/final
# aggregation; the 6h trailing window is a RANGE frame over the integer
# hour index, so missing hours shrink the window instead of silently
# stretching it (a ROWS frame over sparse buckets would look back too far).
# Counts are integers; each ratio is ONE division — bit-stable at any
# parallelism. The unpartitioned trailing window runs over the POST-AGG
# hourly relation (≤ #hours rows — 8.8k/year — regardless of corpus size),
# so the single-task window is a constant-size tail stage, not a scale
# hazard; a per-service SLO would add the service key to both the group-by
# and the window partitioning.
# ---------------------------------------------------------------------------

_SLO_TARGET = 0.20  # error budget: 20% errors allowed (synthetic corpus)


def _slo_burn_rate(spark: SparkSession, sf: str) -> DataFrame:
    ev = read_table(spark, f"{sf}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    hour_us = F.lit(3_600_000_000)
    hr = ((us - F.pmod(us, hour_us)) / hour_us).cast("bigint")
    per = (
        ev.groupBy(hr.alias("hr"))
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long").alias("errors"),
        )
    )
    w6 = (Window.orderBy("hr").rangeBetween(-5, 0))
    agg6 = per.select(
        "hr", "total", "errors",
        F.sum("errors").over(w6).alias("errors_6h"),
        F.sum("total").over(w6).alias("total_6h"),
    )
    short_ratio = F.col("errors") / F.col("total")
    long_ratio = F.col("errors_6h") / F.col("total_6h")
    return (
        agg6.select(
            F.timestamp_micros(F.col("hr") * 3_600_000_000).alias("hour"),
            "total", "errors",
            short_ratio.alias("short_ratio"),
            long_ratio.alias("long_ratio"),
            (short_ratio / F.lit(_SLO_TARGET)).alias("burn_1h"),
            (long_ratio / F.lit(_SLO_TARGET)).alias("burn_6h"),
            # page when BOTH windows burn >1x budget (multiwindow AND gate)
            ((short_ratio > F.lit(_SLO_TARGET))
             & (long_ratio > F.lit(_SLO_TARGET))).alias("page"),
        )
        .orderBy("hour")
    )


register(
    "slo_burn_rate_multiwindow",
    _slo_burn_rate,
    f"""WITH per AS (
         SELECT CAST((epoch_us(ts) - ((epoch_us(ts) % 3600000000)
                      + 3600000000) % 3600000000) // 3600000000 AS BIGINT)
                    AS hr,
                COUNT(*) AS total,
                CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                     AS BIGINT) AS errors
         FROM events GROUP BY 1),
       agg6 AS (
         SELECT hr, total, errors,
                SUM(errors) OVER (ORDER BY hr
                    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS errors_6h,
                SUM(total) OVER (ORDER BY hr
                    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS total_6h
         FROM per)
       SELECT make_timestamp(hr * 3600000000) AS hour, total, errors,
              errors / CAST(total AS DOUBLE) AS short_ratio,
              errors_6h / CAST(total_6h AS DOUBLE) AS long_ratio,
              (errors / CAST(total AS DOUBLE)) / {_SLO_TARGET} AS burn_1h,
              (errors_6h / CAST(total_6h AS DOUBLE)) / {_SLO_TARGET}
                  AS burn_6h,
              errors / CAST(total AS DOUBLE) > {_SLO_TARGET}
                  AND errors_6h / CAST(total_6h AS DOUBLE) > {_SLO_TARGET}
                  AS page
       FROM agg6 ORDER BY hour""",
)
