"""Bench-methodology timing of a subset of entries (cold pass + 2 steady
passes, per-query min) — for before/after comparisons during an
optimization round without paying the full bench.

    python scripts/bench_subset.py entry1 entry2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from skywalking_banyandb_spark.session import get_spark

import __spark_entry__ as entrymod


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("banyandb-spark-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    cold, t = {}, {}
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        cold[name] = round(time.perf_counter() - t0, 4)
    for _ in range(2):
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            if name not in t or dt < t[name]:
                t[name] = dt
    print(json.dumps({"cold": cold,
                      "steady": {n: round(v, 4) for n, v in t.items()}},
                     indent=1))


if __name__ == "__main__":
    main()
