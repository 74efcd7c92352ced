"""Measured MinHash-LSH recall floors (VERDICT r9 #8).

Every pair either configuration RETURNS is exact-Jaccard-verified, so
precision is 1.0 by construction and recall — the fraction of
brute-force-true pairs that survive banding — is the whole quality
story. The default K=8 estimator is deliberately cheap and COARSE
(measured 0.44-0.56 at unigram tau=0.5 across seed draws, SCALE.md r9);
the K=32 x (16 bands x 2 rows) configuration behind
``dedup_minhash_lsh_k32`` is the production-recall knob:
P(candidate | s=0.5) = 1-(1-0.25)^16 ~ 0.99, so its verified recall is
floor-gated at >= 0.8 here against brute-force truth on the same
corpus. The K=8 sibling is measured alongside for the contrast (its
honest floor is 0.3 — a regression guard, not a quality claim)."""

from __future__ import annotations

import duckdb
import pytest

from skywalking_banyandb_spark.functions.dedup import (
    _shingles_sql,
    minhash_lsh_pairs,
)
from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL

TAU = 0.5


@pytest.fixture(scope="module")
def truth():
    """Brute-force unigram Jaccard >= tau pairs (DuckDB, exact)."""
    con = duckdb.connect()
    sh = _shingles_sql("text", 1)
    rows = con.execute(f"""
        WITH sh0 AS (
          SELECT doc_id AS id, unnest({sh}) AS s
          FROM '{SF_SMALL}/documents.parquet'),
        shd AS (SELECT DISTINCT id, s FROM sh0),
        sizes AS (SELECT id, COUNT(*) AS sz FROM shd GROUP BY id),
        common AS (
          SELECT x.id AS a, y.id AS b, COUNT(*) AS c
          FROM shd x JOIN shd y ON x.s = y.s AND x.id < y.id
          GROUP BY 1, 2)
        SELECT a, b FROM common
        JOIN sizes sa ON sa.id = a JOIN sizes sb ON sb.id = b
        WHERE round(c / CAST(sa.sz + sb.sz - c AS DOUBLE), 6) >= {TAU}
    """).fetchall()
    t = {(a, b) for a, b in rows}
    assert len(t) > 500, f"corpus drifted: only {len(t)} true pairs"
    return t


def _recall(spark, truth, **kw) -> float:
    docs = read_table(spark, f"{SF_SMALL}/documents.parquet")
    found = {
        (r.a, r.b)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", n=1, threshold=TAU, **kw
        ).collect()
    }
    assert found <= truth, "verify must make precision exact"
    return len(found) / len(truth)


def test_k32_recall_floor(spark, truth):
    r = _recall(spark, truth, k=32, bands=16)
    assert r >= 0.8, f"K=32 x (16x2) verified recall {r:.4f} < 0.8"


def test_k8_default_recall_documented_floor(spark, truth):
    # the cheap default: coarse by design; guard the documented band so
    # a signature regression can't silently zero it out
    r = _recall(spark, truth)   # K=8, 2x4
    assert 0.3 <= r < 0.95, f"K=8 verified recall {r:.4f} drifted"