"""Run one registry entry with the Spark UI enabled and dump per-stage
task-time totals from the REST API (guide §7.1) — shows where the wall
actually goes. Usage: python scripts/profile_stages.py <entry> [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    entry = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stage-profile")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    qs = em.queries()
    walls = []
    marks = []
    for i in range(passes):
        t0 = time.perf_counter()
        qs[entry](spark, sf_dir).collect()
        walls.append(round(time.perf_counter() - t0, 3))
        marks.append(time.time())
    print("walls:", walls)

    app = json.load(urllib.request.urlopen(
        "http://localhost:4099/api/v1/applications"))[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"http://localhost:4099/api/v1/applications/{app}/stages?status=complete"))
    # keep stages of the LAST pass only (submitted after the prior mark)
    import datetime as dt

    def ts(s):
        return dt.datetime.strptime(
            s[:19], "%Y-%m-%dT%H:%M:%S").replace(
            tzinfo=dt.timezone.utc).timestamp()

    cut = marks[-2] if len(marks) >= 2 else 0
    rows = []
    for s in stages:
        sub = ts(s["firstTaskLaunchedTime"]) if s.get(
            "firstTaskLaunchedTime") else 0
        if sub < cut - 0.5:
            continue
        rows.append((
            s["executorRunTime"], s["stageId"], s["numCompleteTasks"],
            round(s.get("executorCpuTime", 0) / 1e6),
            s.get("shuffleReadBytes", 0) // 1024,
            s.get("shuffleWriteBytes", 0) // 1024,
            (s.get("description") or s["name"])[:90],
        ))
    rows.sort(reverse=True)
    print(f"{'runMs':>8} {'stage':>5} {'tasks':>5} {'cpuMs':>8} "
          f"{'shrKB':>8} {'shwKB':>8}  name")
    for r in rows[:28]:
        print(f"{r[0]:8d} {r[1]:5d} {r[2]:5d} {r[3]:8d} {r[4]:8d} "
              f"{r[5]:8d}  {r[6]}")
    tot = sum(r[0] for r in rows)
    print(f"total executorRunTime of last pass: {tot} ms "
          f"across {len(rows)} stages")


if __name__ == "__main__":
    main()
