"""SparkSession factory tuned for the engine.

Local testing runs ``local[N]``; the configs below are the ones that matter
identically on a 1000-executor cluster: AQE (runtime re-plan + skew-join
handling), Arrow for the few Pandas-UDF paths, and sane shuffle partition
counts (AQE coalesces them down at runtime).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "skywalking-banyandb-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # write micros, not INT96 — keeps our own segment layout free of the
        # legacy type and makes footer-sniffing unambiguous
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # long-lived local sessions accumulate broadcast/shuffle state that
        # only the ContextCleaner frees, and it is driven by driver GC —
        # with a mostly-idle 16g heap a full GC can be 30+ min away
        # (default periodicGC.interval), so force one every 2 minutes;
        # negligible cost, prevents heap creep over thousands of stages
        .config("spark.cleaner.periodicGC.interval", "2min")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
