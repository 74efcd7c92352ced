"""Property-based differential fuzz for winnowing fingerprints: random
short documents (ASCII + multibyte unicode) -> the engine's exploded
window-min selection vs DuckDB's list-comprehension recomputation. Both
count CHARACTERS (not bytes) in substr/len and hash the UTF-8 md5, so any
divergence is a bug in one side's gram/window arithmetic."""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from skywalking_banyandb_spark.functions.dedup import (
    winnow_doc_fingerprints,
    winnow_pairs_sql,
)

_alpha = st.sampled_from(list("ab xyz.,!") + ["é", "λ", "中"])
_doc = st.lists(_alpha, min_size=0, max_size=60).map("".join)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_doc, min_size=1, max_size=6))
def test_winnow_fingerprints_match_duckdb(spark, texts):
    k, w = 4, 3
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id, r.fp) for r in
           winnow_doc_fingerprints(df, "doc_id", "text", k, w).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    # reuse the entry oracle's fingerprint CTEs via winnow_pairs_sql's
    # building blocks: run just the fp CTE
    sql = winnow_pairs_sql("documents", "doc_id", "text", k=k, w=w,
                           min_shared=1, df_cap=10**9)
    fp_cte = sql.split("capped AS")[0].rstrip().rstrip(",")
    want = set(con.execute(
        fp_cte + "\nSELECT id, fp FROM fp").fetchall())
    assert got == want


def test_small_corpus_df_cap_floors_at_one(spark):
    """ADVICE r6: corpora smaller than 1/df_cap_frac floored the derived
    cap below 2 (the df of a duplicate pair), so the stop filter dropped every fingerprint
    and near-identical docs silently produced zero pairs - on BOTH
    engines, so the differential stayed green. The cap must floor at 1."""
    from skywalking_banyandb_spark.functions.dedup import winnow_pairs

    text = "the quick brown fox jumps over the lazy dog repeatedly"
    rows = [(0, text), (1, text + "!"), (2, "completely unrelated words"),
            (3, "other unrelated content here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_pairs(df, "doc_id", "text").collect()
    assert [(p.a, p.b) for p in pairs] == [(0, 1)]

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = con.execute(
        winnow_pairs_sql("documents", "doc_id", "text")).fetchall()
    assert [(a, b) for a, b, _ in want] == [(0, 1)]
