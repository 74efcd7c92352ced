"""Version dedup + element-id dedup — the core custom read-path semantics.

Measure last-write-wins upsert: per (entity, ts) keep the row with the highest
``version`` — the reference does this inside its k-way merge
(``banyand/measure/query.go:966-1027``: ``versions[idx] > lastVersion →
replace``). It must run on EVERY measure read path (SURVEY §7 "hard parts").

Scale note: we implement it as ``groupBy(entity, ts).agg(max_by(struct(*),
version))`` rather than a row_number window. A window has no map-side partial
aggregation — at 100 TB it shuffles every raw row. ``max_by`` is a declarative
aggregate, so Spark runs a partial hash-aggregate before the shuffle and only
one surviving row per (entity, ts) crosses the wire; with the storage layout
bucketed by entity the shuffle is eliminated entirely.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .criteria import qcol


def latest_version(
    df: DataFrame,
    entity: Sequence[str],
    ts_column: str,
    version_column: str,
) -> DataFrame:
    """Keep the highest-version row per (entity..., ts); drops the version
    column from the output (the reference's responses don't carry it)."""
    keys = [*entity, ts_column]
    payload = [c for c in df.columns if c not in keys]
    packed = df.groupBy(*[qcol(k) for k in keys]).agg(
        F.max_by(F.struct(*[qcol(c).alias(c) for c in payload]),
                 qcol(version_column)).alias("_row")
    )
    cols = [qcol(k) for k in keys] + [
        F.col("_row").getField(c).alias(c)
        for c in payload if c != version_column
    ]
    return packed.select(*cols)


def distinct_element(
    df: DataFrame, element_id_column: str, prefer_min: str | None = None
) -> DataFrame:
    """Stream element-id dedup
    (``stream_plan_indexscan_local.go:157-166``): keep one row per element
    id. Within one group element ids are unique by contract, so
    ``dropDuplicates`` suffices. When the same id can arrive from several
    heterogeneous groups, ``prefer_min`` names an ordinal column and the
    row with the smallest ordinal wins deterministically (the merged
    iterator emits the first group's copy); the ordinal column is consumed.
    Both forms are partial-aggregatable hash aggregates — one shuffle."""
    if prefer_min is None:
        return df.dropDuplicates([element_id_column])
    payload = [c for c in df.columns if c != element_id_column]
    packed = df.groupBy(F.col(element_id_column)).agg(
        F.min_by(F.struct(*[qcol(c).alias(c) for c in payload]),
                 F.col(prefer_min)).alias("_row")
    )
    return packed.select(
        F.col(element_id_column),
        *[F.col("_row").getField(c).alias(c)
          for c in payload if c != prefer_min],
    )
