"""Property-based differential fuzz: random criteria trees compiled by the
engine vs an equivalent SQL string in DuckDB, on the same events table.
Any divergence in matched row IDs is an engine bug."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from skywalking_banyandb_spark.model import (
    BinaryOp,
    Condition,
    Criteria,
    CriteriaNode,
    LogicalOp,
    cond,
)
from skywalking_banyandb_spark.operators.criteria import compile_criteria

from conftest import SF_SMALL

SCHEMA_TAGS = {"user_id": None, "event_type": None, "value": None,
               "props_tokens": None}
TAG_TYPES = {"user_id": "INT", "event_type": "STRING", "value": "FLOAT",
             "props_tokens": "STRING_ARRAY"}

# tokens of the synthetic props ('{"k": 69}' -> ['k', '69']): 'k' plus digits
_token_vals = ["k", "1", "7", "42", "69", "87", "zz"]

_types = ["click", "view", "error", "signup", "purchase", "ghost"]

_leaf = st.one_of(
    st.tuples(st.just("event_type"),
              st.sampled_from([BinaryOp.EQ, BinaryOp.NE]),
              st.sampled_from(_types)),
    st.tuples(st.just("event_type"),
              st.sampled_from([BinaryOp.IN, BinaryOp.NOT_IN]),
              st.lists(st.sampled_from(_types), min_size=1, max_size=3)),
    st.tuples(st.just("user_id"),
              st.sampled_from([BinaryOp.LT, BinaryOp.GT, BinaryOp.LE,
                               BinaryOp.GE, BinaryOp.EQ, BinaryOp.NE]),
              st.integers(min_value=-2, max_value=20)),
    st.tuples(st.just("value"),
              st.sampled_from([BinaryOp.LT, BinaryOp.GT, BinaryOp.LE, BinaryOp.GE]),
              st.floats(min_value=-10.0, max_value=600.0,
                        allow_nan=False, allow_infinity=False)),
)

# HAVING / NOT_HAVING over the derived token array (contains-ALL) — only in
# the criteria-level fuzz (the measure-query fuzzer reuses criteria_trees,
# and the metrics schema declares no token tag)
_having_leaf = st.tuples(
    st.just("props_tokens"),
    st.sampled_from([BinaryOp.HAVING, BinaryOp.NOT_HAVING]),
    st.lists(st.sampled_from(_token_vals), min_size=1, max_size=3),
)


def _to_node(t) -> Condition:
    return cond(*t)


criteria_trees = st.recursive(
    _leaf.map(_to_node),
    lambda inner: st.tuples(
        st.sampled_from([LogicalOp.AND, LogicalOp.OR]), inner, inner
    ).map(lambda t: Criteria(t[0], t[1], t[2])),
    max_leaves=5,
)

criteria_trees_ext = st.recursive(
    st.one_of(_leaf, _having_leaf).map(_to_node),
    lambda inner: st.tuples(
        st.sampled_from([LogicalOp.AND, LogicalOp.OR]), inner, inner
    ).map(lambda t: Criteria(t[0], t[1], t[2])),
    max_leaves=5,
)


def _to_sql(node: CriteriaNode) -> str:
    if isinstance(node, Condition):
        tag, op, v = node.tag, node.op, node.value
        if op in (BinaryOp.IN, BinaryOp.NOT_IN):
            vals = ", ".join(repr(x) for x in v)
            neg = "NOT " if op is BinaryOp.NOT_IN else ""
            return f"{tag} {neg}IN ({vals})"
        if op in (BinaryOp.HAVING, BinaryOp.NOT_HAVING):
            vals = ", ".join(repr(x) for x in (v if isinstance(v, (list, tuple)) else [v]))
            neg = "NOT " if op is BinaryOp.NOT_HAVING else ""
            return f"{neg}list_has_all({tag}, [{vals}])"
        sym = {BinaryOp.EQ: "=", BinaryOp.NE: "<>", BinaryOp.LT: "<",
               BinaryOp.GT: ">", BinaryOp.LE: "<=", BinaryOp.GE: ">="}[op]
        return f"{tag} {sym} {v!r}"
    return f"({_to_sql(node.left)} {node.op.value} {_to_sql(node.right)})"


@pytest.fixture(scope="module")
def fuzz_env(spark):
    from skywalking_banyandb_spark.sources.parquet import read_table

    from skywalking_banyandb_spark.functions.analyzers import (
        tokens_spark_sql,
        tokens_sql,
    )

    df = (
        read_table(spark, f"{SF_SMALL}/events.parquet")
        .withColumn("props_tokens", F.expr(tokens_spark_sql("props", "standard")))
        .cache()
    )
    df.count()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT *, "
        f"{tokens_sql('props', 'standard')} AS props_tokens "
        f"FROM '{SF_SMALL}/events.parquet'"
    )
    yield df, con
    # unpersist at teardown: the CacheManager substitutes InMemoryTableScan
    # into ANY later plan over the same parquet relation session-wide, which
    # erases PushedFilters/ReadSchema and breaks test_plan_quality's gates
    df.unpersist()


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tree=criteria_trees_ext)
def test_criteria_tree_matches_duckdb(fuzz_env, tree):
    df, con = fuzz_env
    pred = compile_criteria(tree, SCHEMA_TAGS, TAG_TYPES)
    spark_ids = sorted(
        r.event_id for r in df.where(pred).select("event_id").collect()
    )
    duck_ids = sorted(
        r[0] for r in con.execute(
            f"SELECT event_id FROM events WHERE {_to_sql(tree)}"
        ).fetchall()
    )
    assert spark_ids == duck_ids, _to_sql(tree)
