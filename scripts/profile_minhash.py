"""Stage-level profile of the MinHash-LSH cost centers (guide §1).

Splits minhash_lsh_pairs into its plan segments and times each with the
noop sink so the wall is the computation, not the collect: classes,
signatures, banded table, candidate distinct, verify sets, verified rep
pairs, member expansion, bucket aggregate. Run on a quiet machine:

    python scripts/profile_minhash.py [k32|agg|3gram] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from skywalking_banyandb_spark.functions import dedup as dd
from skywalking_banyandb_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, fn):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{dt:8.3f}s  {label}", flush=True)
    spark.sparkContext.setJobDescription(None)
    return out


def main() -> None:
    cfg = sys.argv[1] if len(sys.argv) > 1 else "agg"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    k, bands, n, tau = {
        "agg": (8, 2, 1, 0.5),
        "k32": (32, 16, 1, 0.5),
        "3gram": (8, 2, 3, 0.4),
    }[cfg]
    spark = get_spark("minhash-profile")
    spark.sparkContext.setLogLevel("ERROR")
    from skywalking_banyandb_spark.sources.parquet import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet")
    id_col, text_col = "doc_id", "text"

    # warm the page cache / JVM
    timed(spark, "warm count(documents)", docs.count)

    classes = dd._text_classes(docs, id_col, text_col)
    timed(spark, "classes (noop)", lambda: noop(classes))

    rep_ids = classes.select(F.col("_rep").alias(id_col))
    reps = docs.join(rep_ids, id_col, "left_semi")
    sig = dd._minhash_sig(reps, id_col, text_col, n, k=k)
    timed(spark, "signatures (noop)", lambda: noop(sig))

    banded = dd._band_hashes(sig, k, bands).persist()
    timed(spark, "banded materialize (count)", banded.count)

    cand = (
        banded.alias("x").join(banded.alias("y"), on=["band", "bh"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    ).persist()
    ncand = timed(spark, "candidates distinct (count)", cand.count)
    print(f"          candidates: {ncand}")

    cand_ids = (
        cand.select(F.col("a").alias(id_col))
        .unionByName(cand.select(F.col("b").alias(id_col)))
        .distinct()
    )
    sh = reps.join(cand_ids, id_col, "left_semi").select(
        F.col(id_col).alias("id"),
        F.explode(dd._shingles(F.col(text_col), n)).alias("sh"),
    )
    sets = (
        sh.groupBy("id").agg(F.collect_set("sh").alias("shset"))
        .select("id", "shset", F.size("shset").alias("sz"))
    ).persist()
    nsets = timed(spark, "verify sets build (count)", sets.count)
    print(f"          candidate docs: {nsets}")

    verified = dd._verify_pairs_with_sets(cand, sets, tau).persist()
    nv = timed(spark, "verify pair-intersect (count)", verified.count)
    print(f"          verified rep pairs: {nv}")

    ma = classes.select(F.col("_rep").alias("a"), F.col("_members").alias("_ma"))
    mb = classes.select(F.col("_rep").alias("b"), F.col("_members").alias("_mb"))
    cross = (
        verified.join(ma, "a").join(mb, "b")
        .select(F.explode("_ma").alias("x"), F.col("_mb"), "jaccard")
        .select(F.col("x"), F.explode("_mb").alias("y"), "jaccard")
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"),
                "jaccard")
    )
    within = (
        classes.where(F.col("_n") >= 2)
        .select(F.explode("_members").alias("x"), F.col("_members"))
        .select("x", F.explode("_members").alias("y"))
        .where(F.col("x") < F.col("y"))
        .select(F.col("x").alias("a"), F.col("y").alias("b"),
                F.lit(1.0).alias("jaccard"))
    )
    pairs = cross.unionByName(within)
    timed(spark, "member expand (noop)", lambda: noop(pairs))

    agg = (
        pairs.groupBy(F.floor(F.col("jaccard") * 100).cast("bigint")
                      .alias("jbucket"))
        .agg(F.count(F.lit(1)).alias("n_pairs"),
             F.sum("a").cast("bigint").alias("sum_a"),
             F.sum("b").cast("bigint").alias("sum_b"),
             F.sum(F.col("a") * F.col("b")).cast("bigint").alias("sum_ab"))
        .orderBy("jbucket")
    )
    timed(spark, "expand + bucket agg (collect)", agg.collect)

    # end-to-end reference (the registry shape, fresh lineage)
    pairs2 = dd.minhash_lsh_pairs(docs, id_col, text_col, n=n,
                                  threshold=tau, k=k, bands=bands)
    timed(spark, "END-TO-END minhash_lsh_pairs (noop)", lambda: noop(pairs2))
    timed(spark, "END-TO-END pass 2 (noop)", lambda: noop(
        dd.minhash_lsh_pairs(docs, id_col, text_col, n=n, threshold=tau,
                             k=k, bands=bands)))


if __name__ == "__main__":
    main()
