"""Driver-contract entries for the remaining criteria algebra: array
HAVING / NOT_HAVING (on a real array column) and semi-structured JSON tag
extraction over the events ``props`` column.

HAVING semantics (``model/v1/query.proto:47-49``, ``tag_filter.go``
havingTag): the array tag must contain ALL listed values; NOT_HAVING is the
negation. The synthetic tables carry no array columns, so the entry derives
one (the analyzed token array) and then applies the same
``compile_condition`` operator the measure/stream paths use — the operator
under test is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.analyzers import tokens, tokens_sql
from .model import BinaryOp, cond
from .operators.criteria import compile_condition
from .registry import register
from .sources.parquet import read_table

_TOK = tokens_sql("text", "standard")


def _having(spark: SparkSession, sf: str) -> DataFrame:
    d = read_table(spark, f"{sf}/documents.parquet")
    d = d.select(F.col("doc_id"), tokens(F.col("text"), "standard").alias("toks"))
    pred = compile_condition(
        cond("toks", BinaryOp.HAVING, ["merge", "scan", "join"]), {"toks": None}
    )
    return d.where(pred).select("doc_id")


register(
    "criteria_having_array",
    _having,
    f"""SELECT doc_id FROM documents
        WHERE list_has_all({_TOK}, ['merge', 'scan', 'join'])
        ORDER BY doc_id""",
)


def _not_having(spark: SparkSession, sf: str) -> DataFrame:
    d = read_table(spark, f"{sf}/documents.parquet")
    d = d.select(F.col("doc_id"), tokens(F.col("text"), "standard").alias("toks"))
    pred = compile_condition(
        cond("toks", BinaryOp.NOT_HAVING, ["merge", "scan", "join"]), {"toks": None}
    )
    return d.where(pred).select("doc_id")


register(
    "criteria_not_having_array",
    _not_having,
    f"""SELECT doc_id FROM documents
        WHERE NOT list_has_all({_TOK}, ['merge', 'scan', 'join'])
        ORDER BY doc_id""",
)


def _json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured tag extraction: pull ``$.k`` out of the JSON props
    column and aggregate on it — the training-pipeline 'typed metadata from
    raw JSON' shape (JVM-side get_json_object; no Python)."""
    ev = read_table(spark, f"{sf}/events.parquet")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.select(F.col("event_type"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.col("k")).alias("n"),
            F.sum(F.col("k")).alias("k_sum"),
            F.max(F.col("k")).alias("k_max"),
        )
    )


register(
    "json_extract_agg",
    _json_extract,
    """SELECT event_type, COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS k_sum, MAX(k) AS k_max
       FROM (SELECT event_type,
                    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             FROM events)
       GROUP BY event_type""",
)
