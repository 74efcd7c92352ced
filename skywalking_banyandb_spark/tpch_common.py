"""Shared TPC-H helpers, in their own module so the registry's
submodule-registration imports stay acyclic: registry_analytics and
registry_tpch2 both need these, and registry_tpch2 importing them FROM
registry_analytics made `import registry_analytics` as an entry point
fail (analytics → registry → tpch2 → analytics-partially-initialized;
the cycle was latent because the full test suite always initialized
`registry` first)."""
from __future__ import annotations

from pyspark.sql import SparkSession

from .sources.parquet import read_table

# every float aggregate accumulates in DECIMAL(24,6) and is cast back
# to double at the end — bit-stable across partitionings and engines
DEC = "decimal(24,6)"


def _tpch_views(spark: SparkSession, sf: str, *names: str) -> None:
    for n in names:
        read_table(spark, f"{sf}/{n}.parquet").createOrReplaceTempView(n)
