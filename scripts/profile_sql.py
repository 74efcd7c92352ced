"""Run one registry entry with the UI on and dump the slowest SQL-node
metrics of the final executed plan (AQE-final, per-operator timings).

    python scripts/profile_sql.py <entry> [passes]
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
        .appName("sql-profile")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4098")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    qs = em.queries()
    for _ in range(passes):
        t0 = time.perf_counter()
        qs[entry](spark, sf_dir).collect()
        print("wall", round(time.perf_counter() - t0, 3))

    app = json.load(urllib.request.urlopen(
        "http://localhost:4098/api/v1/applications"))[0]["id"]
    sqls = json.load(urllib.request.urlopen(
        f"http://localhost:4098/api/v1/applications/{app}/sql"
        f"?details=true&planDescription=false&length=200"))
    # the LAST big execution = the final pass's collect
    sqls = [s for s in sqls if s.get("duration", 0) > 500]
    last = sqls[-1]
    with open("/tmp/sql_profile_dump.json", "w") as f:
        json.dump(last, f, indent=1)
    print("=== execution", last["id"], "duration", last["duration"], "ms",
          "(full dump: /tmp/sql_profile_dump.json)")
    for n in last.get("nodes", []):
        mets = {m["name"]: m["value"] for m in n.get("metrics", [])}
        rows = mets.get("number of output rows", "")
        times = {k: v for k, v in mets.items()
                 if "time" in k and "total" in k}
        if times or rows:
            tstr = "; ".join(f"{k.split(' (')[0]}={v.splitlines()[0]}"
                             for k, v in times.items())
            print(f"[{n['nodeId']:3d}] {n['nodeName'][:44]:44s} "
                  f"rows={rows!s:>14s}  {tstr}")


if __name__ == "__main__":
    main()
