"""Stream query compiler — StreamQuery -> DataFrame.

Reference: ``pkg/query/logical/stream/stream_analyzer.go`` composes
``Limit ∘ [TagFilter ∘] localIndexScan`` with element-id dedup
(``stream_plan_indexscan_local.go:86-198``, dedup :157-166) and ordering by
time or by an indexed tag (``banyand/stream/query.go:373``). On Spark the
"indexed tag only" ordering restriction disappears (shuffle sort handles any
column); we stay accepting of all reference-legal queries.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog, StreamSchema, materialize_derived
from ..errors import QueryAnalyzeError
from ..model import Sort, StreamQuery, DEFAULT_LIMIT
from ..sources.parquet import read_table
from ..model import BinaryOp
from ..operators.criteria import compile_criteria, conditions_of, qcol, types_of
from ..operators.dedup import distinct_element
from ..operators.merge import union_groups
from ..operators.topk import limit_offset


def _tagmap(schema: StreamSchema) -> Dict[str, Optional[str]]:
    out: Dict[str, Optional[str]] = {
        schema.ts_column: None,
        schema.element_id_column: None,
    }
    for t in schema.tags:
        out[t.name] = t.analyzer
    return out


def compile_stream(spark: SparkSession, catalog: Catalog, q: StreamQuery) -> DataFrame:
    schemas: List[StreamSchema] = catalog.get_many(q.groups, "stream", q.name)
    if q.group_mod_revisions:
        catalog.check_revisions(q.group_mod_revisions)
        # revision-pinned clients opt into the created_at clamp
        # (reference 0.11; test/cases/schema/clamp.go drives the stream path)
        from dataclasses import replace

        from ..catalog import clamp_time_range_begin

        q = replace(q, time_range=clamp_time_range_begin(schemas, q.time_range))
    ref = schemas[0]
    # merged logical schema across groups — first declaration wins; tags
    # present in only some groups come back NULL-filled for the others
    # ("multi groups: new tag and fields",
    # pkg/query/logical/stream/stream_plan_merge.go mergeSchema)
    tagmap = _tagmap(ref)
    types = types_of(ref)
    merged_tags = list(ref.tags)
    for s in schemas[1:]:
        for t in s.tags:
            if t.name not in tagmap:
                tagmap[t.name] = t.analyzer
                types[t.name] = t.type
                merged_tags.append(t)
    hetero = any(
        {t.name for t in s.tags} != {t.name for t in ref.tags}
        for s in schemas[1:]
    )
    for name in q.projection:
        if name not in tagmap:
            raise QueryAnalyzeError(f"projection references unknown tag {name!r}")
    # Entity tags ride the series index, which only answers EQ/IN
    # (layer1_leaf.go:137-151 isEntityUnsupportedOp -> gen_err_* WantErr).
    if ref.entity:
        for c in conditions_of(q.criteria):
            if c.tag in ref.entity and c.op not in (BinaryOp.EQ, BinaryOp.IN):
                raise QueryAnalyzeError(
                    f"operation {c.op.name} is unsupported on entity tag "
                    f"{c.tag!r} (only EQ and IN hit the series index)"
                )
    pred = compile_criteria(q.criteria, tagmap, types)

    from ..catalog import TAG_TYPE_TO_SPARK, resolve_stage_paths

    crit_tags = {c.tag for c in conditions_of(q.criteria)}
    parts = []
    for i, s in enumerate(schemas):
        df = read_table(
            spark, *resolve_stage_paths(s, q.stages),
            time_range=(s.ts_column, q.time_range.begin, q.time_range.end),
        )
        df = materialize_derived(df, s)
        if hetero:
            # restrict the scan to the columns THIS group's schema declares
            # (shared files may carry more; undeclared ones must come back
            # NULL-filled by the union, not leak through), then pad typed
            # NULLs for criteria tags the group lacks so the filter applies
            # NULL semantics (EQ/IN on a missing tag matches nothing).
            declared = {s.ts_column, s.element_id_column}
            declared |= {t.name for t in s.tags}
            df = df.select(*[qcol(c) for c in df.columns if c in declared])
            group_tags = {t.name for t in s.tags}
            for t in merged_tags:
                if t.name in crit_tags and t.name not in group_tags:
                    df = df.withColumn(
                        t.name,
                        F.lit(None).cast(TAG_TYPE_TO_SPARK[t.type]))
        if pred is not None:
            df = df.where(pred)
        if hetero:
            # group ordinal: the merged iterator emits the FIRST group's
            # copy of an element id (deterministic dedup preference below)
            df = df.withColumn("_g_ord", F.lit(i))
        parts.append(df)
    df = union_groups(parts)
    df = distinct_element(
        df, ref.element_id_column, prefer_min="_g_ord" if hetero else None)

    # default projection = the physical tags; derived tags appear only when
    # explicitly projected (like index content in the reference)
    proj = list(q.projection) or [t.name for t in merged_tags if t.expr is None]
    keep = [ref.ts_column, ref.element_id_column] + [
        c for c in proj if c not in (ref.ts_column, ref.element_id_column)
    ]
    df = df.select(*[qcol(c) for c in keep])

    order = q.order_by
    key = ref.ts_column if (order is None or order.tag is None) else order.tag
    if key not in df.columns:
        raise QueryAnalyzeError(f"order by unknown tag {key!r}")
    direction = order.sort if order else Sort.ASC
    kcol = qcol(key).desc() if direction is Sort.DESC else qcol(key).asc()
    # element id is unique -> total order for stable pagination
    df = df.orderBy(kcol, F.col(ref.element_id_column).asc())

    limit = q.limit if q.limit is not None else DEFAULT_LIMIT
    return limit_offset(df, limit, q.offset)
