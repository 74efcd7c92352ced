"""Hash-coded verify sets (r15 optimization): `_verify_sets` codes each
shingle to its 64-bit xxhash before set collection, because the per-pair
verification reads only CARDINALITIES (|∩|, |A|, |B|) — any injective
coding is value-invariant, and BIGINT `array_intersect` beats re-hashing
variable-length strings once per candidate pair. These tests pin the
injectivity precondition on the shipped corpora and the value-equality
of the coded verify against a string-set twin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skywalking_banyandb_spark.functions import dedup as dd
from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL


@pytest.fixture()
def docs(spark):
    return read_table(spark, f"{SF_SMALL}/documents.parquet")


@pytest.mark.parametrize("n", [1, 3])
def test_xxhash64_is_injective_on_corpus_shingles(spark, docs, n):
    """No 64-bit collision among the corpus's distinct shingles — the
    precondition under which the coded cardinalities equal the string
    cardinalities exactly (expected colliding pairs ~V²/2⁶⁵; this makes
    the expectation an observation on the fixed test corpora)."""
    sh = docs.select(
        F.explode(dd._shingles(F.col("text"), n)).alias("sh")).distinct()
    row = sh.agg(
        F.count(F.lit(1)).alias("v"),
        F.countDistinct(F.xxhash64("sh")).alias("h")).collect()[0]
    assert row.v == row.h and row.v > 0


def test_coded_verify_equals_string_verify(spark, docs):
    """The coded `_verify_sets` path and a string-set twin produce
    IDENTICAL verified pairs (same (a, b, jaccard) rows) for the real
    candidate set of the default unigram config."""
    sh = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(dd._shingles(F.col("text"), 1)).alias("sh"))
    sig = dd._minhash_sig(docs, "doc_id", "text", 1)
    banded = dd._band_hashes(sig, dd.MINHASH_K, dd.BANDS)
    cand = (
        banded.alias("x").join(banded.alias("y"), on=["band", "bh"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    coded = dd._verify_pairs_exact(cand, sh, 0.5)
    string_sets = (
        sh.groupBy("id")
        .agg(F.collect_set("sh").alias("shset"))
        .select("id", "shset", F.size("shset").alias("sz"))
    )
    strings = dd._verify_pairs_with_sets(cand, string_sets, 0.5)
    got = sorted(map(tuple, coded.collect()))
    want = sorted(map(tuple, strings.collect()))
    assert got == want and len(got) > 0
