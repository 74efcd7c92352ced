"""Segment-scoped property merge (VERDICT r3 #8): on an id-hash-bucketed
store, Apply/Delete rewrite ONLY the segments containing touched ids —
untouched segment files stay byte-identical (same paths, sizes, mtimes) —
and query results are identical to the whole-store rewrite semantics."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.model import BinaryOp, PropertyQuery, cond
from skywalking_banyandb_spark.plans.property import compile_property
from skywalking_banyandb_spark.sources.parquet import read_table
from skywalking_banyandb_spark.sources.writer import (
    _prop_bucket_col,
    property_apply,
    property_delete,
    write_property_bucketed,
)

from conftest import SF_SMALL

BUCKETS = 8


def _file_state(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
    return out


def _seg_of(spark, doc_id):
    # bucket of a literal id, computed with the store's own hash
    return (spark.createDataFrame([(doc_id,)], "doc_id bigint")
            .select(_prop_bucket_col("doc_id", BUCKETS).alias("b"))
            .collect()[0]["b"])


def test_property_apply_rewrites_only_touched_segments(spark, tmp_path):
    store = str(tmp_path / "props")
    cat = default_catalog(SF_SMALL)
    schema = cat.get("g1", "property", "documents")
    docs = read_table(spark, f"{SF_SMALL}/documents.parquet")
    write_property_bucketed(docs, schema, store, buckets=BUCKETS)
    before = _file_state(store)
    assert len({os.path.dirname(p) for p in before}) == BUCKETS

    # touch two known ids (3 upsert, 999993 insert) + delete one (7)
    upd = docs.where(F.col("doc_id") == 3).withColumn("lang", F.lit("xx")) \
        .unionByName(docs.where(F.col("doc_id") == 5)
                     .withColumn("doc_id", F.lit(999993).cast("bigint")))
    property_apply(spark, schema, upd, path=store)
    property_delete(spark, schema, [7], path=store)

    touched = {_seg_of(spark, i) for i in (3, 999993, 7)}
    after = _file_state(store)
    untouched_dirs = {
        os.path.join(store, f"id_bucket={b}")
        for b in range(BUCKETS) if b not in touched
    }
    for p, st in before.items():
        if os.path.dirname(p) in untouched_dirs:
            assert after.get(p) == st, f"untouched segment rewritten: {p}"
    # every touched segment was rewritten (old files gone or changed)
    for p, st in before.items():
        if os.path.dirname(p) not in untouched_dirs:
            assert after.get(p) != st

    # end state == whole-store semantics
    got = dict(
        spark.read.parquet(store)
        .where(F.col("doc_id").isin(3, 7, 999993))
        .select("doc_id", "lang").collect())
    assert got[3] == "xx"
    assert 999993 in got and 7 not in got
    n0 = docs.count()
    assert spark.read.parquet(store).count() == n0  # +1 insert -1 delete


def test_property_query_over_bucketed_store_matches_flat(spark, tmp_path):
    """compile_property over a bucketed store returns the same rows as over
    the flat parquet (id_bucket is invisible to the query surface)."""
    import dataclasses

    store = str(tmp_path / "props2")
    cat = default_catalog(SF_SMALL)
    schema = cat.get("g1", "property", "documents")
    docs = read_table(spark, f"{SF_SMALL}/documents.parquet")
    write_property_bucketed(docs, schema, store, buckets=BUCKETS)

    q = PropertyQuery(
        group="g1", name="documents",
        criteria=cond("lang", BinaryOp.EQ, "en"),
        projection=["lang", "n_chars"], limit=50,
    )
    flat = [tuple(r) for r in compile_property(spark, cat, q).collect()]
    from skywalking_banyandb_spark.catalog import Catalog

    cat2 = Catalog()
    cat2.register(dataclasses.replace(schema, paths=(store,)))
    bucketed = [tuple(r) for r in compile_property(spark, cat2, q).collect()]
    assert bucketed == flat and len(flat) > 0
