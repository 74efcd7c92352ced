"""Co-located join via Spark bucketing: writing both join sides bucketed
and sorted by the join key lets the SortMergeJoin read pre-partitioned,
pre-sorted buckets — NO Exchange (shuffle) on either side. At 100 TB this
is the difference between a join that moves the fact table over the
network every query and one that never shuffles it (SCALE.md 'minimize
shuffles'); the storage layout IS the partitioning."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL


@pytest.fixture()
def bucketed_tables(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS buckdemo")
    ords = read_table(spark, f"{SF_SMALL}/orders.parquet")
    li = read_table(spark, f"{SF_SMALL}/lineitem.parquet")
    (ords.write.mode("overwrite")
     .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .saveAsTable("buckdemo.orders_b"))
    (li.write.mode("overwrite")
     .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .saveAsTable("buckdemo.lineitem_b"))
    yield
    spark.sql("DROP TABLE IF EXISTS buckdemo.orders_b")
    spark.sql("DROP TABLE IF EXISTS buckdemo.lineitem_b")
    spark.sql("DROP DATABASE IF EXISTS buckdemo")
    shutil.rmtree("spark-warehouse/buckdemo.db", ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the merge-join path so the bucket layout (not a broadcast)
        # is what eliminates the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (
            spark.table("buckdemo.orders_b")
            .join(spark.table("buckdemo.lineitem_b"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        # the join itself reads bucket files directly: the only Exchange
        # in the whole plan is the post-join aggregation's
        pre_join = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
        # correctness unchanged vs the shuffle join over raw parquet
        raw = (
            read_table(spark, f"{SF_SMALL}/orders.parquet")
            .join(read_table(spark, f"{SF_SMALL}/lineitem.parquet"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, raw.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
