"""Sparse-corpus twin of ngram_tau_compare: raw sf0.1 documents (5 k
docs, tiny true answer at tau=0.5) — the regime prefix filtering is
supposed to win. Wall + heaviest stages via the status API."""
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

    docs = read_table(spark, "/root/testdata/sf0.1/documents.parquet")
    app = sp._app_id()
    last = max((s["stageId"] for s in sp._rest(app, "/stages?status=complete")),
               default=-1)
    for label, forced in (("naive", False), ("prefix", True)):
        t0 = time.time()
        n = ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.5,
                                prefix_filter=forced).count()
        wall = round(time.time() - t0, 1)
        time.sleep(3)
        stages = sp.stage_ratios(app, last)
        last = max((s["stage"] for s in stages), default=last)
        heavy = sorted(stages, key=lambda s: -s["total_s"])[:2]
        print(json.dumps({label: {"rows": n, "wall_s": wall,
                                  "heaviest": heavy}}))


if __name__ == "__main__":
    main()
