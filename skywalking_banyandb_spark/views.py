"""SQL view surface — register every catalog resource as a Spark SQL temp
view with the engine's read semantics baked in, so plain ``spark.sql()``
users get correct results:

- measure views apply version dedup (highest version per (entity, ts),
  ``banyand/measure/query.go:966-1027``) — a raw SQL user can never forget
  the upsert semantics;
- stream views apply element-id dedup;
- trace and property views are plain scans (their semantics are per-query).

View names are ``{kind}_{name}_{group}`` (e.g. ``measure_metrics_g1``).
Filters written against the views still push down: Catalyst moves ts/entity
predicates below the dedup aggregate because they reference its group keys.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import SparkSession

from .catalog import Catalog
from .operators.dedup import distinct_element, latest_version
from .sources.parquet import read_table


def register_views(spark: SparkSession, catalog: Catalog) -> List[str]:
    """Create/replace one temp view per catalog resource; returns names."""
    names: List[str] = []
    for (group, kind, name), schema in sorted(catalog._resources.items()):
        if schema.kind == "measure" and schema.table:
            df = spark.table(schema.table)
        else:
            df = read_table(spark, *schema.paths)
        if schema.kind == "measure" and not schema.index_mode and schema.version_column:
            df = latest_version(
                df, schema.entity, schema.ts_column, schema.version_column
            )
        elif schema.kind == "stream":
            df = distinct_element(df, schema.element_id_column)
        view = f"{kind}_{name}_{group}"
        df.createOrReplaceTempView(view)
        names.append(view)
    return names
