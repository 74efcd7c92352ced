"""Write paths — the analogue of BanyanDB's gRPC write services
(``measure/v1/write.proto``, ``stream/v1/write.proto``,
``trace/v1/write.proto``, ``property/v1/rpc.proto`` Apply/Delete).

Physical layout (the 100 TB design, mirroring group→segment→shard→part of
``banyand/internal/storage/storage.go:110-137``):

- partition by coarse ``ts_bucket`` (= segment_interval HOUR/DAY) — gives
  Catalyst partition pruning for every time-range query, the counterpart of
  ``SelectSegments(timeRange)``;
- within a partition, sort by (entity..., ts) — the reference's
  series-sorted blocks (``banyand/measure/block.go:79-84``); parquet gets
  tight min/max stats per row group on the entity columns, so entity
  predicates row-group-skip (the inverted/skipping index analogue);
- version stays a plain column; dedup happens at read (LSM semantics:
  appends never rewrite).

Property Apply is last-write-wins upsert by (group, name, id) with a
monotonically increasing applied_at version — implemented as
read-modify-write parquet here (Delta/Iceberg MERGE on a real deployment).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import MeasureSchema, PropertySchema, StreamSchema, TraceSchema
from .parquet import read_table

_GRANULARITY = {"HOUR": "hour", "DAY": "day"}


def write_measure(
    df: DataFrame,
    schema: MeasureSchema,
    path: str,
    mode: str = "append",
    segment_interval: str = "DAY",
    replicas: int = 0,
) -> None:
    """Append data points in the segment/series-sorted layout.

    ``replicas > 0`` lays ``replicas + 1`` byte-identical copies in
    ``replica=N`` subdirs (``common.proto`` Group.replicas: 1 = primary +
    one replica). Reads resolve to a single intact copy
    (:func:`..catalog.resolve_replica`) so a replicated group never
    duplicates rows in results — the ``entity_replicated`` golden-case
    contract. Replica 0 is written once and file-copied: the reference
    delegates replication to the storage layer (clustering.md), and a
    local copytree is that layer's stand-in."""
    gran = _GRANULARITY[segment_interval.upper()]
    out = (
        df.withColumn("ts_bucket", F.date_trunc(gran, F.col(schema.ts_column)))
        .repartition(F.col("ts_bucket"))
        .sortWithinPartitions(*schema.entity, schema.ts_column)
    )
    if replicas > 0:
        primary = os.path.join(path, "replica=0")
        out.write.partitionBy("ts_bucket").mode(mode).parquet(primary)
        for i in range(1, replicas + 1):
            rep = os.path.join(path, f"replica={i}")
            shutil.rmtree(rep, ignore_errors=True)
            shutil.copytree(primary, rep)
        return
    out.write.partitionBy("ts_bucket").mode(mode).parquet(path)


def write_stream(
    df: DataFrame,
    schema: StreamSchema,
    path: str,
    mode: str = "append",
    segment_interval: str = "DAY",
    materialize_derived_tags: bool = False,
) -> None:
    """Append elements in the segment layout.

    ``materialize_derived_tags=True`` evaluates every ``TagSpec.expr`` at
    WRITE time and stores the result as a physical column — the
    reference's write-time index materialization (and the 100 TB form of
    the engine's derived tags: the read path's ``materialize_derived``
    skips columns that already exist, so a query is oblivious to which
    side produced the tag, while stored columns let HAVING/MATCH filters
    ride parquet stats instead of recomputing per query)."""
    gran = _GRANULARITY[segment_interval.upper()]
    if materialize_derived_tags:
        from ..catalog import materialize_derived

        df = materialize_derived(df, schema)
    out = (
        df.withColumn("ts_bucket", F.date_trunc(gran, F.col(schema.ts_column)))
        .repartition(F.col("ts_bucket"))
        .sortWithinPartitions(schema.ts_column, schema.element_id_column)
    )
    out.write.partitionBy("ts_bucket").mode(mode).parquet(path)


def write_trace(
    df: DataFrame,
    schema: "TraceSchema",
    path: str,
    mode: str = "append",
    segment_interval: str = "DAY",
) -> None:
    """Append spans in the segment layout (``trace/v1/write.proto``):
    partitioned by coarse ts_bucket, sorted by (trace_id, ts, span_id)
    within a segment so one trace's spans cluster in a row-group run and
    trace-id predicates row-group-skip (the sidx analogue)."""
    gran = _GRANULARITY[segment_interval.upper()]
    out = (
        df.withColumn("ts_bucket", F.date_trunc(gran, F.col(schema.ts_column)))
        .repartition(F.col("ts_bucket"))
        .sortWithinPartitions(
            schema.trace_id_column, schema.ts_column, schema.span_id_column)
    )
    out.write.partitionBy("ts_bucket").mode(mode).parquet(path)


def write_measure_bucketed(
    df: DataFrame,
    schema: MeasureSchema,
    table_name: str,
    buckets: int = 32,
    segment_interval: str = "DAY",
) -> None:
    """Bucketed segment layout — the shuffle-free scale path.

    ``partitionBy(ts_bucket)`` (segment pruning) + ``bucketBy(entity)`` +
    ``sortBy(entity, ts)``: the persisted hash distribution on the entity
    satisfies the clustered distribution every downstream (entity, ts)
    version-dedup and entity group-by requires, so those aggregations run
    with NO Exchange — the shard-routing of ``pkg/partition/entity.go:89-100``
    expressed as a Spark bucketed table. At 100 TB this removes the one
    full-data shuffle from every measure read."""
    gran = _GRANULARITY[segment_interval.upper()]
    out = df.withColumn("ts_bucket", F.date_trunc(gran, F.col(schema.ts_column)))
    (
        out.write.format("parquet")
        .mode("overwrite")
        .partitionBy("ts_bucket")
        .bucketBy(buckets, *schema.entity)
        .sortBy(*schema.entity, schema.ts_column)
        .saveAsTable(table_name)
    )


def compact_segments(
    spark: SparkSession,
    schema: MeasureSchema,
    path: str,
    target_files: int = 1,
) -> int:
    """LSM merge analogue (``banyand/measure/flusher.go`` +
    ``merger.go``): append-mode ingest leaves many small parts per segment;
    compaction rewrites each ``ts_bucket=`` segment directory into
    ``target_files`` large series-sorted files and swaps it in atomically.
    Read semantics are unchanged (version dedup already resolves
    duplicates); parquet row-group stats get tighter, so entity predicates
    skip more. Returns the number of segments compacted."""
    import glob

    done = 0
    for seg in sorted(os.listdir(path)):
        if not seg.startswith("ts_bucket="):
            continue
        segdir = os.path.join(path, seg)
        files = glob.glob(os.path.join(segdir, "*.parquet"))
        if len(files) <= target_files:
            continue
        out = (
            spark.read.parquet(segdir)
            .coalesce(target_files)
            .sortWithinPartitions(*schema.entity, schema.ts_column)
        )
        tmp = segdir + "._compact"
        out.write.mode("overwrite").parquet(tmp)
        old = segdir + "._old"
        os.rename(segdir, old)
        os.rename(tmp, segdir)
        shutil.rmtree(old, ignore_errors=True)
        done += 1
    return done


def _atomic_replace(df: DataFrame, path: str) -> None:
    """Write a full new table state then swap directories (poor-man's ACID;
    a table format with MERGE replaces this at scale)."""
    tmp = tempfile.mkdtemp(prefix="_prop_apply_", dir=os.path.dirname(path) or ".")
    try:
        df.write.mode("overwrite").parquet(tmp)
        old = path + ".old"
        if os.path.exists(path):
            os.rename(path, old)
            os.rename(tmp, path)
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(tmp, path)
    except Exception:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def _prop_bucket_col(id_col: str, buckets: int):
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets)).cast("int")


def _prop_meta(path: str) -> Optional[int]:
    """Bucket count of a bucketed property store (sidecar), else None."""
    import json

    meta = os.path.join(path, "_prop_meta.json")
    if os.path.exists(meta):
        with open(meta) as fh:
            return int(json.load(fh)["buckets"])
    return None


def write_property_bucketed(
    df: DataFrame,
    schema: PropertySchema,
    path: str,
    buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Property store in id-hash segments (``id_bucket=N`` dirs): Apply and
    Delete rewrite ONLY the segments holding touched ids, the merge-on-
    write analogue of the reference's sharded property store
    (``banyand/property/``; Delta/Iceberg MERGE on a real deployment).
    Queries read the root dir unchanged — id_bucket is a partition column
    Catalyst prunes when a query filters on it and ignores otherwise."""
    import json

    out = df.withColumn("id_bucket",
                        _prop_bucket_col(schema.id_column, buckets))
    (out.repartition(F.col("id_bucket"))
        .write.partitionBy("id_bucket").mode(mode).parquet(path))
    with open(os.path.join(path, "_prop_meta.json"), "w") as fh:
        json.dump({"buckets": buckets}, fh)


def _touched_buckets(updates: DataFrame, id_col: str, buckets: int) -> list:
    rows = (updates.select(_prop_bucket_col(id_col, buckets).alias("b"))
            .distinct().collect())
    return sorted(r["b"] for r in rows)


def property_apply(
    spark: SparkSession,
    schema: PropertySchema,
    updates: DataFrame,
    path: Optional[str] = None,
) -> None:
    """Upsert documents by id — ``property/v1/rpc.proto:35-51`` Apply.

    New rows fully replace existing rows with the same id (strategy
    STRATEGY_REPLACE, the default). On a bucketed store (see
    :func:`write_property_bucketed`) only the segments containing touched
    ids are rewritten; untouched segment files are left byte-identical.
    Legacy single-directory stores fall back to whole-store
    read-modify-write."""
    path = path or schema.paths[0]
    idc = schema.id_column
    buckets = _prop_meta(path) if os.path.exists(path) else None
    if buckets is not None:
        upd = updates.withColumn("_b", _prop_bucket_col(idc, buckets))
        for b in _touched_buckets(updates, idc, buckets):
            segdir = os.path.join(path, f"id_bucket={b}")
            part = upd.where(F.col("_b") == b).drop("_b")
            if os.path.exists(segdir):
                current = spark.read.parquet(segdir)
                keep = current.join(
                    part.select(idc).distinct(), on=idc, how="left_anti")
                merged = keep.unionByName(part.select(*current.columns))
            else:
                merged = part
            _atomic_replace(merged, segdir)
        return
    if os.path.exists(path):
        current = read_table(spark, path)
        keep = current.join(
            updates.select(idc).distinct(), on=idc, how="left_anti"
        )
        merged = keep.unionByName(updates.select(*current.columns))
    else:
        merged = updates
    _atomic_replace(merged, path)


def property_delete(
    spark: SparkSession,
    schema: PropertySchema,
    ids: Sequence,
    path: Optional[str] = None,
) -> None:
    """Delete documents by id — ``property/v1/rpc.proto:53-57``. Bucketed
    stores rewrite only the segments the ids hash into."""
    path = path or schema.paths[0]
    idc = schema.id_column
    buckets = _prop_meta(path)
    if buckets is not None:
        id_df = spark.createDataFrame([(i,) for i in ids], f"{idc} bigint")
        for b in _touched_buckets(id_df, idc, buckets):
            segdir = os.path.join(path, f"id_bucket={b}")
            if not os.path.exists(segdir):
                continue
            current = spark.read.parquet(segdir)
            _atomic_replace(
                current.where(~F.col(idc).isin(*list(ids))), segdir)
        return
    current = read_table(spark, path)
    _atomic_replace(current.where(~F.col(schema.id_column).isin(*list(ids))), path)


def _expired_segments(path: str, cutoff) -> list:
    """``ts_bucket=`` segment dirs wholly before ``cutoff``. A bucket covers
    [bucket, bucket + interval); it is fully expired only when the NEXT
    bucket start is <= cutoff — one-day width (the coarsest interval) keeps
    the check conservative for day buckets."""
    import datetime as dt

    out = []
    for seg in sorted(os.listdir(path)):
        if not seg.startswith("ts_bucket="):
            continue
        raw = seg.split("=", 1)[1].replace("%3A", ":").replace("+", " ")
        try:
            bucket = dt.datetime.fromisoformat(raw.strip())
        except ValueError:
            continue
        if bucket + dt.timedelta(days=1) <= cutoff:
            out.append(seg)
    return out


def drop_expired_segments(path: str, ttl_days: int, now) -> int:
    """Physical retention: delete whole ``ts_bucket=`` segment directories
    older than the TTL — the reference's segment-drop expiry
    (``storage.go:132-137``: retention removes segments, never row-level
    deletes). O(#segments) directory operations, zero data scanned; the
    read-path ``apply_ttl`` filter covers the boundary segment. Returns the
    number of segments dropped."""
    import datetime as dt

    dropped = 0
    for seg in _expired_segments(path, now - dt.timedelta(days=ttl_days)):
        shutil.rmtree(os.path.join(path, seg), ignore_errors=True)
        dropped += 1
    return dropped


def migrate_segments(src: str, dst: str, ttl_days: int, now) -> int:
    """Lifecycle stage migration — move segments that aged out of a stage's
    TTL to the next stage's directory (hot → warm → cold), the
    ``banyand/backup/lifecycle/`` migration analogue (per-stage TTLs in
    ``common.proto:65-93``; migration visitors
    ``measure_migration_visitor.go`` / ``stream_migration_visitor.go``).

    Whole ``ts_bucket=`` directories move — O(#segments) renames on a
    filesystem, a manifest/metadata operation on object storage; no rows
    are rewritten, and the moved segments keep their series-sorted layout
    so warm reads are as pruned as hot ones. Returns segments moved."""
    import datetime as dt

    os.makedirs(dst, exist_ok=True)
    moved = 0
    for seg in _expired_segments(src, now - dt.timedelta(days=ttl_days)):
        target = os.path.join(dst, seg)
        if os.path.exists(target):
            # same bucket exists in the destination stage (e.g. partial
            # earlier migration): merge files instead of clobbering
            for f in os.listdir(os.path.join(src, seg)):
                shutil.move(os.path.join(src, seg, f), os.path.join(target, f))
            shutil.rmtree(os.path.join(src, seg), ignore_errors=True)
        else:
            shutil.move(os.path.join(src, seg), target)
        moved += 1
    return moved


def apply_ttl(df: DataFrame, ts_column: str, ttl_days: int, now) -> DataFrame:
    """Retention filter — segment-drop TTL (``storage.go:132-137``) expressed
    as a read-path predicate; on the partitioned layout it prunes whole
    ``ts_bucket`` partitions (golden case: 'index mode excludes data expired
    beyond TTL')."""
    import datetime as dt

    cutoff = now - dt.timedelta(days=ttl_days)
    return df.where(F.col(ts_column) >= F.lit(cutoff))
