"""Print .explain('formatted') of a registry entry's DataFrame.

    python scripts/explain_entry.py <entry> [out_file]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from skywalking_banyandb_spark.session import get_spark

import __spark_entry__ as em


def main() -> None:
    entry = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    df = em.queries()[entry](spark, sf_dir)
    txt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    if out:
        with open(out, "w") as f:
            f.write(txt)
        print(f"wrote {out} ({len(txt)} chars)")
    else:
        print(txt)


if __name__ == "__main__":
    main()
