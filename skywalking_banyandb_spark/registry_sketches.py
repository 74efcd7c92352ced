"""Driver entries for the deterministic sketches (functions/sketches.py):
Count-Min token-frequency estimates and HyperLogLog distinct-user
estimates, both with exact DuckDB twins (md5 hashes + integer registers
make the sketches engine-portable, so the ESTIMATES hash-compare)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.sketches import (
    CMS_D,
    CMS_W,
    cms_build,
    cms_cells_sql,
    cms_estimate,
    hll_estimate_expr,
    hll_estimate_sql,
    hll_register_cols,
)
from .registry import register
from .sources.parquet import read_table


def _sketch_cms_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """CMS frequency estimates next to true counts for every corpus token
    with true count >= 30. est >= true always (CMS one-sided error); the
    sketch is D×W = 1024 cells however large the corpus."""
    docs = read_table(spark, f"{sf}/documents.parquet")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    sketch = cms_build(toks, "tok")
    true_c = (toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_c"))
              .where(F.col("true_c") >= 30))
    est = cms_estimate(sketch, true_c.select("tok"), "tok")
    return (
        true_c.join(est, "tok")
        .select("tok", "true_c", F.col("est").alias("est_c"))
        .orderBy("tok")
    )


register(
    "sketch_cms_tokens",
    _sketch_cms_tokens,
    f"""WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        sketch AS (
          SELECT row, cell, COUNT(*) AS cnt
          FROM ({cms_cells_sql(CMS_D, CMS_W)})
          GROUP BY row, cell),
        true_c AS (
          SELECT tok, COUNT(*) AS true_c FROM toks GROUP BY tok
          HAVING COUNT(*) >= 30),
        addr AS (
          SELECT t.tok AS tok, a.row AS row, a.cell AS cell
          FROM true_c t
          JOIN ({cms_cells_sql(CMS_D, CMS_W).replace("FROM toks",
                 "FROM (SELECT DISTINCT tok FROM toks) toks")}) a
            ON a.tok = t.tok),
        est AS (
          -- LEFT join + COALESCE 0 mirrors cms_estimate (ADVICE r4): an
          -- unoccupied cell means that counter is 0
          SELECT addr.tok AS tok, MIN(COALESCE(s.cnt, 0)) AS est_c
          FROM addr LEFT JOIN sketch s
            ON s.row = addr.row AND s.cell = addr.cell
          GROUP BY addr.tok)
        SELECT t.tok AS tok, t.true_c AS true_c, e.est_c AS est_c
        FROM true_c t JOIN est e ON e.tok = t.tok
        ORDER BY t.tok""",
)


def _sketch_hll_users(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type distinct-user estimates: register max over RAW rows
    (no pre-dedup shuffle — MAX is idempotent), exact-integer harmonic sum,
    estimate vs the exact COUNT(DISTINCT)."""
    ev = read_table(spark, f"{sf}/events.parquet")
    bucket, rho = hll_register_cols(F.col("user_id"))
    regs = (
        ev.select("event_type", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m"))
    )
    agg = regs.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - CAST(m AS INT))"))
        .alias("s"),
        F.count(F.lit(1)).alias("nz"),
    )
    est = agg.select(
        "event_type", hll_estimate_expr(F.col("s"), F.col("nz")).alias("hll_est"))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"))
    return exact.join(est, "event_type").orderBy("event_type")


register(
    "sketch_hll_users",
    _sketch_hll_users,
    f"""WITH r AS (
          SELECT event_type,
                 CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4)
                      AS BIGINT) % 64 AS bucket,
                 CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                               5, 12) AS BIGINT) = 0
                      THEN 49
                      ELSE 49 - length(bin(CAST('0x'
                           || substr(md5(CAST(user_id AS VARCHAR)), 5, 12)
                           AS BIGINT)))
                 END AS rho
          FROM events),
        regs AS (
          SELECT event_type, bucket, MAX(rho) AS m
          FROM r GROUP BY event_type, bucket),
        agg AS (
          SELECT event_type,
                 SUM(1::BIGINT << (49 - m)) AS s,
                 COUNT(*) AS nz
          FROM regs GROUP BY event_type),
        est AS (
          SELECT event_type, {hll_estimate_sql('s', 'nz')} AS hll_est
          FROM agg),
        exact AS (
          SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
          FROM events GROUP BY event_type)
        SELECT x.event_type AS event_type, x.n_exact AS n_exact,
               e.hll_est AS hll_est
        FROM exact x JOIN est e ON e.event_type = x.event_type
        ORDER BY x.event_type""",
)


def _sketch_bloom_membership(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom membership: the member set is the vocabulary of 'src0'
    documents (a stand-in benchmark set); every corpus token is tested
    against the filter. One-sided error — is_member=true implies
    in_bloom=true always; in_bloom=true with is_member=false is a false
    positive (visible in the output, hash-compared too)."""
    from .functions.sketches import BLOOM_K, bloom_build, bloom_test

    docs = read_table(spark, f"{sf}/documents.parquet")
    all_toks = (docs.select(F.explode(F.split(F.col("text"), " "))
                            .alias("tok")).distinct())
    members = (docs.where(F.col("source") == "src0")
               .select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
               .distinct())
    bits = bloom_build(members, "tok")
    tested = bloom_test(bits, all_toks, "tok")
    return (
        all_toks.join(members.withColumn("is_member", F.lit(True)),
                      "tok", "left")
        .na.fill(False, ["is_member"])
        .join(tested, "tok")
        .select("tok", "is_member", "in_bloom")
        .orderBy("tok")
    )


_BLOOM_POS = ["CAST('0x' || substr(md5('{i}|' || tok), 1, 8) AS BIGINT) % 1024"
              .format(i=i) for i in range(3)]


register(
    "sketch_bloom_membership",
    _sketch_bloom_membership,
    f"""WITH toks AS (
          SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
          FROM documents),
        mem AS (
          SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
          FROM documents WHERE source = 'src0'),
        bits AS (
          SELECT DISTINCT pos FROM (
            SELECT {_BLOOM_POS[0]} AS pos FROM mem
            UNION ALL SELECT {_BLOOM_POS[1]} FROM mem
            UNION ALL SELECT {_BLOOM_POS[2]} FROM mem)),
        addr AS (
            SELECT tok, {_BLOOM_POS[0]} AS pos FROM toks
            UNION ALL SELECT tok, {_BLOOM_POS[1]} FROM toks
            UNION ALL SELECT tok, {_BLOOM_POS[2]} FROM toks),
        hits AS (
          SELECT tok, COUNT(*) AS h FROM addr
          WHERE pos IN (SELECT pos FROM bits) GROUP BY tok)
        SELECT t.tok AS tok,
               (t.tok IN (SELECT tok FROM mem)) AS is_member,
               (COALESCE(h.h, 0) = 3) AS in_bloom
        FROM toks t LEFT JOIN hits h ON h.tok = t.tok
        ORDER BY t.tok""",
)
