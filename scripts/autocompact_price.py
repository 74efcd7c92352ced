"""Price the streaming loop's opt-in auto_compact (VERDICT r13 Next #6).

``start_incremental_dedup(..., auto_compact=True)`` runs the compaction
policy after every epoch's absorb: one column-pruned trigger aggregate
per epoch, plus a full index rewrite whenever the duplicate-class
fraction crosses COMPACT_DUPLICATE_FRACTION. A user enabling it blind
should know both numbers, so this script runs the SAME workload twice —
fresh scratch each time — with auto_compact off and on, and records
per-epoch walls from Structured Streaming's own progress telemetry
(``StreamingQuery.recentProgress[].durationMs.triggerExecution``, which
includes the whole ``foreachBatch`` body: probe + emit + absorb +
maintenance).

Workload: the registry entries' bounded universe (doc_id % 3 = 0 of the
generated sf0.1 corpus — scripts/scale_study.py's generator, seed 42),
base index over %9=0, two stream micro-batches (b1 = %9=3, b2 = %9=6).
To make the trigger actually fire mid-loop, the index is PRE-SEEDED
with b1 under an old lineage ("reprocess-0") before the stream starts:
the stream's own epoch-0 absorb of b1 (a fresh lineage) then duplicates
those classes — the fresh-checkpoint re-run shape — pushing the
duplicate fraction past the threshold, so the auto_compact run pays a
compaction inside the loop while the off run never does.

Output: AUTOCOMPACT_PRICE.json at the repo root —
``{"off": {"epochs": [...s], "total_sec"}, "on": {..., "compactions"},
"trigger_check_sec"}`` — summarized in SCALE.md.

Run: python scripts/autocompact_price.py [--sf 0.1]
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _epoch_walls(query) -> list:
    return [round(p["durationMs"]["triggerExecution"] / 1000.0, 3)
            for p in query.recentProgress
            if p.get("numInputRows", 0) > 0]


def run_once(spark, sf_dir: str, auto_compact: bool) -> dict:
    from pyspark.sql import functions as F  # noqa: F401 (plan imports)

    from skywalking_banyandb_spark.sources import minhash_index as mh
    from skywalking_banyandb_spark.sources.parquet import read_table
    from skywalking_banyandb_spark.streaming.incremental_dedup import (
        start_incremental_dedup,
    )

    work = tempfile.mkdtemp(prefix=f"autocompact_{auto_compact}_")
    try:
        path = mh.build_minhash_index(
            spark, sf_dir, base_pred="doc_id % 9 = 0", root=f"{work}/idx")
        docs = read_table(
            spark, f"{sf_dir}/documents.parquet").where("doc_id % 3 = 0")
        b1 = docs.where("doc_id % 9 = 3")
        # pre-seed under an old lineage: the stream's own absorb of b1
        # (a fresh lineage) then duplicates these classes and fires the
        # compaction trigger mid-loop
        mh.minhash_index_absorb(spark, path, b1, "doc_id", "text",
                                "reprocess-0")
        classes_preseed = spark.read.parquet(
            os.path.join(path, "classes")).count()
        b1.coalesce(1).write.parquet(f"{work}/src/b1")
        docs.where("doc_id % 9 = 6").coalesce(1) \
            .write.parquet(f"{work}/src/b2")
        now = time.time()
        for sub, ts in (("b1", now - 120.0), ("b2", now - 60.0)):
            d = f"{work}/src/{sub}"
            for name in os.listdir(d):
                os.utime(os.path.join(d, name), (ts, ts))
        stream = (
            spark.readStream
            .schema(spark.read.parquet(f"{work}/src/b1").schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{work}/src/*")
        )
        t0 = time.perf_counter()
        q = start_incremental_dedup(
            spark, stream, path, "doc_id", "text",
            output_path=f"{work}/out", checkpoint_path=f"{work}/ckpt",
            auto_compact=auto_compact)
        if not q.awaitTermination(timeout=600):
            q.stop()
            raise RuntimeError("streaming loop timed out")
        total = round(time.perf_counter() - t0, 3)
        classes_final = spark.read.parquet(
            os.path.join(path, "classes")).count()
        return {
            "auto_compact": auto_compact,
            "epochs_sec": _epoch_walls(q),
            "total_sec": total,
            "classes_preseed": classes_preseed,
            "classes_final": classes_final,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.1")
    args = ap.parse_args()

    from skywalking_banyandb_spark.session import get_spark

    from scale_study import gen_corpus

    root = os.path.join(tempfile.gettempdir(), "banyandb_scale_study")
    sf = float(args.sf)
    sf_dir = os.path.join(root, f"gen_sf{sf}")
    gen_corpus(sf_dir, sf)

    spark = get_spark("banyandb-autocompact-price")
    spark.sparkContext.setLogLevel("ERROR")

    # the per-epoch cost of the trigger CHECK alone (the price every
    # enabled epoch pays even when nothing fires): one column-pruned
    # aggregate over classes/
    from skywalking_banyandb_spark.sources import minhash_index as mh
    probe_work = tempfile.mkdtemp(prefix="autocompact_check_")
    try:
        p = mh.build_minhash_index(spark, sf_dir,
                                   base_pred="doc_id % 9 = 0",
                                   root=probe_work)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            mh.minhash_index_needs_compaction(spark, p)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
    finally:
        shutil.rmtree(probe_work, ignore_errors=True)

    off = run_once(spark, sf_dir, auto_compact=False)
    on = run_once(spark, sf_dir, auto_compact=True)
    record = {"sf": sf, "seed": 42,
              "trigger_check_sec": round(best, 3),
              "off": off, "on": on,
              # same workload, so a smaller final class table in the
              # enabled run IS the in-loop compaction having fired
              "compaction_fired": on["classes_final"] < off["classes_final"]}
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "AUTOCOMPACT_PRICE.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
