"""One-off r8 measurement: ngram_jaccard_pairs naive vs prefix-filter
candidate strategy on the skew-proof corpus at tau=0.5 (the
high-threshold regime prefix filtering is for) — wall + heaviest-stage
CPU via the status API. Reuses scripts/skew_proof.py's corpus builder;
results recorded in SCALE.md (round-8 section)."""
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

spec = importlib.util.spec_from_file_location(
    "skew_proof", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "skew_proof.py"))
sp = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sp)

from pyspark.sql import SparkSession  # noqa: E402


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(sp.UI_PORT))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from skywalking_banyandb_spark.functions.dedup import ngram_jaccard_pairs
    from skywalking_banyandb_spark.sources.parquet import read_table

    work = sp.build_skewed_corpus(spark)
    docs = read_table(spark, f"{work}/documents.parquet")
    app = sp._app_id()
    last = max((s["stageId"] for s in sp._rest(app, "/stages?status=complete")),
               default=-1)
    for label, forced in (("naive", False), ("prefix", True)):
        t0 = time.time()
        n = ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.5,
                                df_cap_frac=0.08, prefix_filter=forced).count()
        wall = round(time.time() - t0, 1)
        time.sleep(3)
        stages = sp.stage_ratios(app, last)
        last = max((s["stage"] for s in stages), default=last)
        heavy = sorted(stages, key=lambda s: -s["total_s"])[:3]
        print(json.dumps({label: {"rows": n, "wall_s": wall,
                                  "heaviest": heavy}}))


if __name__ == "__main__":
    main()
