"""Streaming Top-N materialization vs batch recompute — the streaming job,
fed the same events as file-source micro-batches, must converge to exactly
the batch ``materialize_topn`` result (the reference's pre-agg table)."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.model import Sort
from skywalking_banyandb_spark.plans.topn import materialize_topn
from skywalking_banyandb_spark.sources.parquet import read_table
from skywalking_banyandb_spark.streaming.topn_stream import (
    start_topn_materialization,
)

from conftest import SF_SMALL


def test_streaming_topn_matches_batch(spark):
    cat = default_catalog(SF_SMALL)
    schema = cat.get("g1", "measure", "metrics")
    work = tempfile.mkdtemp(prefix="topn_stream_")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")
    ckpt_dir = os.path.join(work, "ckpt")
    os.makedirs(src_dir)
    try:
        # split events into 3 files -> 3 micro-batches (out of time order to
        # exercise the late-window merge path)
        ev = read_table(spark, f"{SF_SMALL}/events.parquet")
        parts = [
            ev.where(F.col("user_id") % 3 == i) for i in (1, 2, 0)
        ]
        for i, p in enumerate(parts):
            p.coalesce(1).write.mode("overwrite").parquet(os.path.join(src_dir, f"b{i}"))

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src_dir, "*"))
        )
        q = start_topn_materialization(
            spark, stream, schema, field="value", n=3,
            output_path=out_dir, checkpoint_path=ckpt_dir,
            window="1 hour", lateness="30 days",  # keep all windows live
            sort=Sort.DESC, trigger_once=True,
        )
        q.awaitTermination(timeout=300)

        got = sorted(
            (str(r.window_start), r.user_id, r.value)
            for r in spark.read.parquet(out_dir).collect()
        )
        want = sorted(
            (str(r.window_start), r.user_id, r.value)
            for r in materialize_topn(spark, schema, "value", 3, "1 hour", Sort.DESC).collect()
        )
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
