"""Binder equivalence (the reference's ``binder_equivalence_test.go``
contract): a bound prepared statement must behave exactly like the same
statement with inline literals; rebinding yields independent statements."""

from __future__ import annotations

import datetime as dt

import pytest

from skywalking_banyandb_spark.bydbql.binder import execute_prepared, prepare
from skywalking_banyandb_spark.bydbql.transformer import execute
from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.errors import QueryAnalyzeError

from conftest import SF_SMALL

NOW = dt.datetime(2024, 2, 1)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_bound_equals_inline(spark):
    cat = default_catalog(SF_SMALL)
    bound = execute_prepared(
        spark, cat,
        "SELECT user_id, value FROM MEASURE metrics IN g1 "
        "TIME BETWEEN ? AND ? "
        "WHERE event_type = ? AND value > ? LIMIT 50",
        params=[dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 27), "click", 100.0],
        now=NOW,
    )
    inline = execute(
        spark, cat,
        "SELECT user_id, value FROM MEASURE metrics IN g1 "
        "TIME BETWEEN '2024-01-03T00:00:00' AND '2024-01-27T00:00:00' "
        "WHERE event_type = 'click' AND value > 100.0 LIMIT 50",
        NOW,
    )
    assert _rows(bound) == _rows(inline) and len(_rows(bound)) > 0


def test_rebind_is_independent(spark):
    cat = default_catalog(SF_SMALL)
    text = ("SELECT user_id FROM STREAM event_log IN g1 "
            "TIME BETWEEN '2024-01-03T00:00:00' AND '2024-01-27T00:00:00' "
            "WHERE event_type IN (?, ?) LIMIT 1000")
    a = execute_prepared(spark, cat, text, ["click", "view"], NOW)
    b = execute_prepared(spark, cat, text, ["error", "signup"], NOW)
    ra, rb = _rows(a), _rows(b)
    assert ra and rb and ra != rb


def test_param_in_show_top_and_arity_check(spark):
    cat = default_catalog(SF_SMALL)
    # entity conditions are EQ-only (topn_plan_localscan.go:137) — a single
    # entity's Top-N collapses to one aggregated row
    df = execute_prepared(
        spark, cat,
        "SHOW TOP 3 FROM MEASURE metrics IN g1 "
        "TIME BETWEEN ? AND ? WHERE user_id = ? AGGREGATE BY MEAN ORDER BY DESC",
        [dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 8), 2],
        NOW,
    )
    assert len(df.collect()) == 1
    with pytest.raises(QueryAnalyzeError):
        prepare("SELECT * FROM MEASURE metrics IN g1 WHERE user_id = ?").bind()


def test_question_mark_inside_string_is_literal(spark):
    p = prepare("SELECT * FROM PROPERTY documents IN g1 WHERE source = 'what?'")
    assert p.n_params == 0


def test_statement_cache_hit():
    prepare.cache_clear()
    text = "SELECT * FROM MEASURE metrics IN g1 WHERE user_id = ?"
    p1 = prepare(text)
    p2 = prepare(text)
    assert p1 is p2
    assert prepare.cache_info().hits >= 1
