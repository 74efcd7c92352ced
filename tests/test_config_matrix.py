"""Config-independence: results must be IDENTICAL under different Spark
session configurations (the grading driver uses a plain session; users run
whatever their cluster defaults to). A representative entry per operator
family runs under AQE-off + tiny shuffle partitions and must produce
row-identical results to the engine-default session."""

from __future__ import annotations

import pytest

import __spark_entry__ as em

from conftest import SF_SMALL

_ENTRIES = [
    "measure_scan_filter",        # pushdown + dedup + pagination
    "measure_groupby_mean",       # decimal-deterministic agg
    "topn_per_window",            # window rank
    "dedup_substring_winnow",     # explode + window + self-join (r5)
    "ann_cosine_topk",            # unrounded ranking (r5)
    "events_cohort_retention",    # window-min rewrite (r5)
    "measure_histogram_quantile", # bucket interpolation (r5)
    "events_asof_join",           # union-trick carry
    # r6 families
    "measure_counter_increase_promql",  # lag window + reset chain
    "slo_burn_rate_multiwindow",        # RANGE frame over hour index
    "quality_tfidf_top_terms",          # two window ranks, IEEE division
    "quality_charlm_typicality",        # persisted scratch pair table
    "embedding_covariance",             # quantized integer accumulation (r7)
    "tpch_q17_small_quantity",          # decorrelated scalar subquery
    # r7 families
    "embedding_pca_project",            # driver eigh + literal-fold projection
    "ann_ivf_incremental_topk",         # frozen-centroid append + tombstones
    "measure_rate_extrapolated_promql", # edge-extrapolation IEEE expression
    "embedding_int8_quantization",      # quantized-integer MSE sums
    # r8 families
    "embedding_kmeans_clusters",        # broadcast-centroid argmax, 2 Lloyd iters
    "embedding_centroid_confusion",     # factored dot/||c|| ranking (r8 reshape)
    "dedup_minhash_lsh",                # collapse + stop-buckets + pair verify
    "trace_finalize_sampling",          # md5 rate sampler + segment rewrite
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", _ENTRIES)
def test_results_config_independent(spark, name):
    base = _rows(em.queries()[name](spark, SF_SMALL))

    alt = spark.newSession()
    alt.conf.set("spark.sql.adaptive.enabled", "false")
    alt.conf.set("spark.sql.shuffle.partitions", "3")
    alt.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        got = _rows(em.queries()[name](alt, SF_SMALL))
    finally:
        alt.conf.set("spark.sql.adaptive.enabled", "true")
    assert got == base, f"{name} diverged under AQE-off/partitions=3"
