"""Truncation profile of minhash_lsh_pairs: noop successive prefixes of
the REAL pipeline (its own banded persist, AQE broadcasts intact) and
difference the walls. Run: python scripts/profile_minhash2.py [agg|k32|3gram]
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


def timed(spark, label, fn, reps=2):
    best = None
    for _ in range(reps):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(f"{best:8.3f}s  {label}", flush=True)
    spark.sparkContext.setJobDescription(None)
    return best


def main() -> None:
    cfg = sys.argv[1] if len(sys.argv) > 1 else "agg"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    k, bands, n, tau = {
        "agg": (8, 2, 1, 0.5),
        "k32": (32, 16, 1, 0.5),
        "3gram": (8, 2, 3, 0.4),
    }[cfg]
    spark = get_spark("minhash-profile2")
    spark.sparkContext.setLogLevel("ERROR")
    from skywalking_banyandb_spark.sources.parquet import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet")
    id_col, text_col = "doc_id", "text"
    timed(spark, "warm count(documents)", docs.count, reps=1)

    # Build the pipeline pieces EXACTLY as minhash_lsh_pairs does, sharing
    # its banded persist via the twin window.
    def pieces():
        classes = dd._text_classes(docs, id_col, text_col)
        rep_ids = classes.select(F.col("_rep").alias(id_col))
        d2 = docs.join(rep_ids, id_col, "left_semi")
        sig = dd._minhash_sig(d2, id_col, text_col, n, k=k)
        banded = dd._band_hashes(sig, k, bands).persist()
        dd._retain_banded(banded)
        cand = (
            banded.alias("x").join(banded.alias("y"), on=["band", "bh"])
            .where(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
            .distinct()
        )
        cand_ids = (
            cand.select(F.col("a").alias(id_col))
            .unionByName(cand.select(F.col("b").alias(id_col)))
            .distinct()
        )
        sh = d2.join(cand_ids, id_col, "left_semi").select(
            F.col(id_col).alias("id"),
            F.explode(dd._shingles(F.col(text_col), n)).alias("sh"),
        )
        ids = (
            cand.select(F.col("a").alias("id"))
            .unionByName(cand.select(F.col("b").alias("id")))
            .distinct()
        )
        sets = (
            sh.join(ids, "id", "left_semi")
            .groupBy("id").agg(F.collect_set("sh").alias("shset"))
            .select("id", "shset", F.size("shset").alias("sz"))
        )
        verified = dd._verify_pairs_with_sets(cand, sets, tau)
        return classes, cand, sets, verified

    # warm the banded cache once
    classes, cand, sets, verified = pieces()
    timed(spark, "prefix: cand (noop)", lambda: noop(pieces()[1]), reps=1)

    timed(spark, "prefix: cand (noop) warm", lambda: noop(pieces()[1]))
    timed(spark, "prefix: sets (noop) warm", lambda: noop(pieces()[2]))
    timed(spark, "prefix: verified (noop) warm", lambda: noop(pieces()[3]))
    full = dd.minhash_lsh_pairs(docs, id_col, text_col, n=n, threshold=tau,
                                k=k, bands=bands)
    timed(spark, "full pairs (noop) warm", lambda: noop(
        dd.minhash_lsh_pairs(docs, id_col, text_col, n=n, threshold=tau,
                             k=k, bands=bands)))
    from skywalking_banyandb_spark.registry_pipeline import _jbucket_agg
    timed(spark, "full + jbucket agg (collect) warm", lambda: _jbucket_agg(
        dd.minhash_lsh_pairs(docs, id_col, text_col, n=n, threshold=tau,
                             k=k, bands=bands)).collect())


if __name__ == "__main__":
    main()
