"""Property query compiler — PropertyQuery -> DataFrame.

Reference: ``banyand/property/db.go`` + ``property/v1/rpc.proto:35-91``:
schema'd key-value documents with Apply (upsert), Delete, and Query
(ids / criteria filter, projection, limit). Batch CRUD maps to
read-modify-write parquet (Delta merge on a real deployment); the query path
below is a plain filter/project/limit plan.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Catalog, PropertySchema, materialize_derived
from ..errors import QueryAnalyzeError
from ..model import PropertyQuery, DEFAULT_LIMIT
from ..sources.parquet import read_table
from ..operators.criteria import compile_criteria, types_of
from ..operators.topk import limit_offset


def _tagmap(schema: PropertySchema) -> Dict[str, Optional[str]]:
    out: Dict[str, Optional[str]] = {schema.id_column: None}
    for t in schema.tags:
        out[t.name] = t.analyzer
    return out


def compile_property(spark: SparkSession, catalog: Catalog, q: PropertyQuery) -> DataFrame:
    schema: PropertySchema = catalog.get(q.group, "property", q.name)
    tagmap = _tagmap(schema)
    for name in q.projection:
        if name not in tagmap:
            raise QueryAnalyzeError(f"projection references unknown tag {name!r}")
    pred = compile_criteria(q.criteria, tagmap, types_of(schema))

    df = materialize_derived(read_table(spark, *schema.paths), schema)
    if q.ids:
        df = df.where(F.col(schema.id_column).isin(*list(q.ids)))
    if pred is not None:
        df = df.where(pred)

    proj = list(q.projection) or [t.name for t in schema.tags if t.expr is None]
    # the sort tag may be outside the projection (golden
    # order_without_projection: want rows carry ONLY the projected tags) —
    # ride it along for the sort, drop it after paging
    order_extra = None
    if q.order_by and q.order_by.tag and q.order_by.tag not in proj:
        order_extra = q.order_by.tag
        proj.append(order_extra)
    keep = [schema.id_column] + [c for c in proj if c != schema.id_column]
    df = df.select(*[F.col(c) for c in keep])
    if q.order_by and q.order_by.tag:
        if q.order_by.tag not in tagmap:
            raise QueryAnalyzeError(
                f"order by references unknown tag {q.order_by.tag!r}"
            )
        from ..model import Sort

        kcol = (F.col(q.order_by.tag).desc() if q.order_by.sort is Sort.DESC
                else F.col(q.order_by.tag).asc())
        # id tiebreak -> total order under LIMIT/OFFSET
        df = df.orderBy(kcol, F.col(schema.id_column).asc())
    else:
        df = df.orderBy(F.col(schema.id_column).asc())
    limit = q.limit if q.limit is not None else DEFAULT_LIMIT
    df = limit_offset(df, limit, q.offset)
    return df.drop(order_extra) if order_extra else df
