"""Salted two-phase aggregation: bit-exact equivalence with the direct
groupBy for all five agg functions, on data with a manufactured hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skywalking_banyandb_spark.model import AggFunc
from skywalking_banyandb_spark.operators.skew import salted_group_agg
from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL

_DEC = "decimal(24,6)"


@pytest.fixture(scope="module")
def skewed(spark):
    # hot key: replicate user_id=1 rows 50x (one series dominating)
    ev = read_table(spark, f"{SF_SMALL}/events.parquet").select(
        "user_id", "event_type", "value"
    )
    hot = ev.where(F.col("user_id") == 1)
    df = ev.unionByName(hot.crossJoin(spark.range(49).select(F.lit(1).alias("_x"))).drop("_x"))
    df = df.cache()
    yield df
    df.unpersist()  # keep the session CacheManager clean for later modules


def _direct(df, func):
    col = F.col("value")
    if func is AggFunc.MIN:
        e = F.min(col)
    elif func is AggFunc.MAX:
        e = F.max(col)
    elif func is AggFunc.COUNT:
        e = F.count(col)
    elif func is AggFunc.SUM:
        e = F.sum(col.cast(_DEC)).cast("double")
    else:
        e = F.sum(col.cast(_DEC)).cast("double") / F.count(col)
    return df.groupBy("user_id").agg(e.alias("value"))


@pytest.mark.parametrize("func", list(AggFunc))
def test_salted_equals_direct(spark, skewed, func):
    got = {(r.user_id, r.value) for r in
           salted_group_agg(skewed, ["user_id"], func, "value").collect()}
    want = {(r.user_id, r.value) for r in _direct(skewed, func).collect()}
    assert got == want


def test_salted_plan_has_two_shuffle_levels(spark, skewed):
    df = salted_group_agg(skewed, ["user_id"], AggFunc.SUM, "value", n_salts=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # phase-1 hashes on (key, salt), phase-2 on key alone
    assert "_salt" in plan
    assert plan.count("Exchange") >= 2


def test_ngram_jaccard_df_cap_bounds_hot_shingles(spark):
    """A stop-shingle shared by EVERY doc must not fan out quadratically:
    with df_cap_frac set, it is excluded from the sets, so docs whose only
    overlap is the hot shingle never pair. Bare form pairs all of them."""
    from skywalking_banyandb_spark.functions.dedup import ngram_jaccard_pairs

    # 40 docs all containing 'common token'; only docs 0,1 share real text
    rows = [(i, f"common token unique{i} word{i}") for i in range(2, 40)]
    rows += [(0, "common token alpha beta gamma"),
             (1, "common token alpha beta gamma")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    bare = ngram_jaccard_pairs(df, "doc_id", "text", n=1, threshold=0.1)
    capped = ngram_jaccard_pairs(
        df, "doc_id", "text", n=1, threshold=0.1, df_cap_frac=0.5)
    n_bare = bare.count()
    got = {(r.a, r.b) for r in capped.collect()}
    # every doc shares {common, token} -> bare pairs all 40C2 at j>=0.1
    assert n_bare == 40 * 39 // 2, n_bare
    # capped: only the genuinely-similar pair survives
    assert got == {(0, 1)}, got


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's skew-join handling is the runtime half of the skew story
    (operators/skew.py salting is the plan-time half): with a hot key
    dominating one shuffle partition, the final adaptive plan must mark
    and split the skewed side (``skew=true``) instead of serializing the
    join on one task. Thresholds are lowered so the behaviour is
    observable at test scale; the mechanism is identical at 100 TB."""
    from pyspark.sql import functions as F

    keep = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": None,
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": None,
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": None,
        "spark.sql.autoBroadcastJoinThreshold": None,
    }
    for k in keep:
        keep[k] = spark.conf.get(k)
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB")
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        hot = spark.range(200000).select(
            F.lit(0).alias("k"), F.col("id").alias("v"))
        tail = spark.range(2000).select(
            (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v"))
        right = spark.range(51).select(F.col("id").alias("k"),
                                       F.lit(1).alias("w"))
        j = hot.union(tail).join(right, "k").groupBy().agg(F.sum("v").alias("s"))
        j.collect()  # AQE finalizes the plan at execution
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in keep.items():
            spark.conf.set(k, v)


def test_ngram_prefix_filter_equals_naive(spark):
    """The two candidate strategies of ngram_jaccard_pairs must be
    result-identical (prefix filtering is cost-only): force each path on
    the same corpus at a high and a low threshold and compare pair sets
    and rounded jaccards exactly. Also pins the default: the naive
    fused count-join at every tau (the measured winner, SCALE.md r8 —
    no row_number window in the plan), prefix only on opt-in."""
    from skywalking_banyandb_spark.functions.dedup import ngram_jaccard_pairs

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon eta"),
        (2, "alpha beta gamma theta iota kappa"),
        (3, "completely different words here now"),
        (4, "completely different words here too"),
        (5, "alpha beta mu nu xi omicron"),
        (6, "alpha beta gamma delta epsilon zeta"),  # exact dup of 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    for tau in (0.12, 0.5, 0.8):
        got = {}
        for forced in (False, True):
            pairs = ngram_jaccard_pairs(
                df, "doc_id", "text", n=2, threshold=tau,
                prefix_filter=forced)
            got[forced] = sorted(
                (r.a, r.b, r.jaccard) for r in pairs.collect())
        assert got[False] == got[True], (tau, got)
        assert len(got[False]) > 0, tau  # non-vacuous at every tau

    default = ngram_jaccard_pairs(df, "doc_id", "text", n=2, threshold=0.5)
    opted = ngram_jaccard_pairs(df, "doc_id", "text", n=2, threshold=0.5,
                                prefix_filter=True)
    default_plan = default._jdf.queryExecution().optimizedPlan().toString()
    opted_plan = opted._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" not in default_plan
    assert "row_number" in opted_plan
