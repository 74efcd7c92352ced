"""Advanced analytics entries: anti-join, gap-based sessionization (window
functions), and near-duplicate clustering (iterative connected components).

These go beyond the reference's operator surface (which has no joins and no
analytic window functions — SURVEY §2.3/§2.7) and showcase the Spark-native
capabilities a training-data pipeline leans on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions.dedup import ngram_jaccard_pairs, ngram_jaccard_pairs_sql
from .registry import register
from .sources.parquet import read_table


def _anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """Parts that never appear in any lineitem — left anti join (broadcast
    of the distinct key set at scale; Catalyst picks the strategy)."""
    part = read_table(spark, f"{sf}/part.parquet")
    li = read_table(spark, f"{sf}/lineitem.parquet")
    return (
        part.join(li, part["p_partkey"] == li["l_partkey"], "left_anti")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
    )


register(
    "part_never_ordered_antijoin",
    _anti_join,
    """SELECT p_partkey, p_name, p_retailprice FROM part
       WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
       ORDER BY p_partkey""",
)


def _sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's gap to
    the previous event exceeds 30 minutes. Classic lag + running-sum window
    composition; shuffles once on user_id, then both window functions reuse
    the same partitioning (no second shuffle)."""
    ev = read_table(spark, f"{sf}/events.parquet")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_micros only accepts TIMESTAMP (LTZ); parquet without a zone loads
    # as TIMESTAMP_NTZ, so cast first. Gap invariance under the cast holds
    # only for fixed-offset session timezones (a DST transition would
    # stretch/shrink wall-clock gaps); session.py pins UTC, so it holds.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.unix_micros(F.lag(F.col("ts").cast("timestamp")).over(by_user))
    new_sess = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = (
        ev.withColumn("new_sess", new_sess)
        .withColumn("session_id", F.sum("new_sess").over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .orderBy("user_id", "session_id")
    )


register(
    "events_sessionization",
    _sessionize,
    """WITH g AS (
         SELECT user_id, ts, event_id,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                     THEN 1 ELSE 0 END AS new_sess
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ), s AS (
         SELECT user_id, ts,
                CAST(SUM(new_sess) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
         FROM g
       )
       SELECT user_id, session_id, COUNT(*) AS n_events,
              MIN(ts) AS session_start, MAX(ts) AS session_end
       FROM s GROUP BY user_id, session_id
       ORDER BY user_id, session_id""",
)


def _dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-duplicate clustering: connected components over the Jaccard
    pair graph by iterative min-label propagation (label = min doc_id
    reachable). Each iteration is one join + groupBy; converges in
    O(component diameter) rounds — the standard large-graph CC pattern when
    a graph library isn't warranted."""
    docs = read_table(spark, f"{sf}/documents.parquet")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.12)
    # the pair graph is the expensive part (shingle join) — materialize it
    # ONCE and reuse across iterations; each label frontier is
    # localCheckpoint'ed so the lineage (and with it, recompute cost per
    # convergence check) stays O(1) per round instead of O(rounds)
    edges = (
        pairs.select("a", "b")
        .unionByName(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .persist()
    )
    labels = docs.select(
        F.col("doc_id").alias("node"), F.col("doc_id").alias("label")
    ).localCheckpoint()
    converged = False
    for _ in range(8):  # diameter bound for this corpus; loop is driver-side
        neigh = (
            edges.join(labels, edges["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        new = (
            labels.join(neigh, on="node", how="left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
                (F.coalesce(F.col("nlabel"), F.col("label")) < F.col("label")).alias("changed"),
            )
            .localCheckpoint()
        )
        labels = new.select("node", "label")
        if new.where(F.col("changed")).isEmpty():
            converged = True
            break
    edges.unpersist()
    if not converged:
        # a component with diameter > the round bound would otherwise get
        # SILENTLY wrong labels — fail loudly; callers raise the bound
        raise RuntimeError(
            "near-dup clustering did not converge within 8 label-propagation "
            "rounds (component diameter exceeds the bound)")
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .where(F.col("cluster_size") > 1)
        .select(F.col("label").alias("cluster_id"), "cluster_size")
        .orderBy("cluster_id")
    )


register(
    "dedup_near_dup_clusters",
    _dedup_clusters,
    f"""WITH RECURSIVE pairs AS ({ngram_jaccard_pairs_sql("documents", "doc_id", "text", 2, 0.12)}),
    edges AS (
      SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
    ),
    reach(node, label) AS (
      SELECT DISTINCT a AS node, a AS label FROM edges
      UNION
      SELECT e.a AS node, r.label
      FROM edges e JOIN reach r ON e.b = r.node
      WHERE r.label < e.a OR r.label <= e.a
    ),
    comp AS (
      SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node
    )
    SELECT cluster_id, COUNT(*) AS cluster_size
    FROM comp GROUP BY cluster_id
    HAVING COUNT(*) > 1
    ORDER BY cluster_id""",
)


def _downsample_5m(spark: SparkSession, sf: str) -> DataFrame:
    """Interval downsampling (the series-resolution change implied by the
    measure ``interval``, SURVEY §2.7): tumbling 5-minute buckets per
    entity-group key, one shuffle on (bucket, key), decimal-deterministic
    mean. ``F.window`` is a narrow projection — the bucket is computed
    map-side, so partition pruning and pushdown on ts still apply."""
    ev = read_table(spark, f"{sf}/events.parquet")
    return (
        ev.groupBy(
            F.window(F.col("ts"), "5 minutes").getField("start").alias("bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("value").cast("decimal(24,6)")).cast("double")
                / F.count(F.col("value"))
            ).alias("avg_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("bucket", "event_type")
    )


register(
    "measure_downsample_5m",
    _downsample_5m,
    """SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS bucket, event_type,
              COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) / COUNT(value)
                  AS avg_value,
              MAX(value) AS max_value
       FROM events GROUP BY bucket, event_type
       ORDER BY bucket, event_type""",
)
