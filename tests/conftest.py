from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from skywalking_banyandb_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"

# The pytest conformance sweep compares queries() vs oracle_sql() at
# SF_SMALL, while the driver does so at sf0.01 — lazy oracles that embed
# corpus-derived literals (embedding_pca_project) must read the same
# corpus the check runs against (resolved at oracle_sql() call time).
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF_SMALL)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("banyandb-spark-tests", cpus=8)
    yield s
    s.stop()
