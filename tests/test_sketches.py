"""Sketch property tests (functions/sketches.py). Exact oracle equality is
covered by test_conformance.py (sketch_cms_tokens / sketch_hll_users);
these check the mathematical guarantees and plan hygiene."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as em

from conftest import SF_SMALL


def test_cms_never_underestimates(spark):
    """Count-Min error is one-sided: est >= true for every probed item."""
    df = em.queries()["sketch_cms_tokens"](spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.est_c >= r.true_c for r in rows)


def test_cms_sketch_is_bounded(spark):
    """The sketch table never exceeds D*W cells regardless of corpus."""
    from skywalking_banyandb_spark.functions.sketches import (
        CMS_D, CMS_W, cms_build)
    from skywalking_banyandb_spark.sources.parquet import read_table

    docs = read_table(spark, f"{SF_SMALL}/documents.parquet")
    toks = docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    assert cms_build(toks, "tok").count() <= CMS_D * CMS_W


def test_hll_estimate_within_expected_error(spark):
    """HLL with m=64 has ~13% standard error (1.04/sqrt(64)); allow 3
    sigma. Estimates must also be positive and finite."""
    df = em.queries()["sketch_hll_users"](spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.hll_est > 0
        rel = abs(r.hll_est - r.n_exact) / r.n_exact
        assert rel < 0.40, (r.event_type, r.n_exact, r.hll_est)


def test_sketches_no_python_udf(spark):
    for name in ("sketch_cms_tokens", "sketch_hll_users"):
        df = em.queries()[name](spark, SF_SMALL)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_bloom_no_false_negatives(spark):
    """Bloom error is one-sided: every true member tests positive."""
    df = em.queries()["sketch_bloom_membership"](spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.in_bloom for r in rows if r.is_member)


def test_cms_absent_probe_estimates_zero(spark):
    """ADVICE r4: probing an item that never entered the sketch must return
    its CMS estimate (0 when every addressed cell is unoccupied, the cell's
    collision count otherwise) — not silently vanish from the output, and a
    partially-missing address set must not over-estimate via min-over-fewer
    rows."""
    from skywalking_banyandb_spark.functions.sketches import (
        cms_build,
        cms_estimate,
    )

    corpus = spark.createDataFrame([("alpha",), ("alpha",), ("beta",)],
                                   "tok string")
    sketch = cms_build(corpus, "tok")
    probes = spark.createDataFrame(
        [("alpha",), ("never-in-corpus-xyzzy",)], "tok string")
    got = {r.tok: r.est for r in
           cms_estimate(sketch, probes, "tok").collect()}
    assert set(got) == {"alpha", "never-in-corpus-xyzzy"}
    assert got["alpha"] >= 2          # one-sided error
    # 2 corpus tokens × D=8 rows occupy ≤16 of 1024 cells: the absent
    # probe's 8 addresses are almost surely all empty -> est 0; even under
    # a freak collision CMS only over-estimates, never drops the row
    assert got["never-in-corpus-xyzzy"] >= 0
    assert got["never-in-corpus-xyzzy"] <= 3
