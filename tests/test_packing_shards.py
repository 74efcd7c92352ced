"""pack_sequences shard-count parameterization: the packing must stay
oracle-exact for ANY shard count (the registered entry derives its count
from machine parallelism; a cluster would pass defaultParallelism).
Forcing a non-default count here proves the DuckDB twin is parameterized,
not pinned to a literal (VERDICT r3 #5)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from skywalking_banyandb_spark.registry_pipeline import (
    _PACK_SHARDS,
    pack_sequences,
    packing_oracle_sql,
)
from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL


def _norm(rows):
    out = []
    for row in rows:
        out.append(tuple(
            f"{v:.10g}" if isinstance(v, float) and not math.isnan(v)
            else str(v) for v in row))
    return sorted(out)


@pytest.mark.parametrize("shards", [5, 13])
def test_pack_sequences_oracle_exact_any_shard_count(spark, shards):
    assert shards != _PACK_SHARDS  # the point: NOT the registered default
    d = read_table(spark, f"{SF_SMALL}/documents.parquet")
    got = _norm([tuple(r) for r in
                 pack_sequences(d, cap=2048, shards=shards).collect()])

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_SMALL}/documents.parquet'")
    want = _norm(con.execute(packing_oracle_sql(shards)).fetchall())
    assert got == want and len(got) > 0


def test_default_shards_not_hardcoded_literal():
    """The registered entry's shard count tracks machine parallelism
    (SPARK_GRAFT_CPUS override, else cpu_count) — not a frozen 8."""
    expect = int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or (os.cpu_count() or 8)
    assert _PACK_SHARDS == expect


def test_pack_sequences_session_derived_default(spark):
    """shards=None derives from the session's defaultParallelism."""
    d = read_table(spark, f"{SF_SMALL}/documents.parquet")
    out = pack_sequences(d)
    n = spark.sparkContext.defaultParallelism
    shard_vals = {r["shard"] for r in out.select("shard").distinct().collect()}
    assert shard_vals and max(shard_vals) < n
