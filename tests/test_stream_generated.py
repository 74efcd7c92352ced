"""Generated STREAM-query conformance (r8 bonus) — the pairwise
feature machine of the trace framework (``test_trace_generated.py``,
itself the analogue of reference ``test/cases/trace/cmd/generate``)
applied to the stream path: the reference's hand-written stream
``gen_feat_*`` golden family covers 17 order×filter×paging×projection
combinations (replayed in test_golden_corpus2.py); this suite GENERATES
the pairwise-covering vector set over the same dimensions and
dual-executes every case against DuckDB, so new combinations appear as
the dimension lists grow instead of by hand."""

from __future__ import annotations

import duckdb
import pytest

from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.model import Sort
from skywalking_banyandb_spark.plans.stream import compile_stream
from skywalking_banyandb_spark.request_loader import load_stream_request

from conftest import SF_SMALL
from test_golden_corpus import TIME_RANGE, T0, T1, _crit_sql, _run_dual
from test_trace_generated import _leaf, pairwise_vectors

T0S, T1S = T0.replace("T", " "), T1.replace("T", " ")


@pytest.fixture(scope="module")
def env(spark):
    cat = default_catalog(SF_SMALL)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'")
    return spark, cat, con


_STRNONE = "none"

_PARAMS = {
    "order": ["value_asc", "value_desc", "ts_asc", "ts_desc", _STRNONE],
    "filter": [_STRNONE, "type_eq", "value_range", "user_in"],
    "limit": [_STRNONE, "2", "5"],
    "offset": [_STRNONE, "1", "3"],
    "proj": ["default", "explicit"],
}

_CONSTRAINTS = [
    lambda v: not ("offset" in v and "limit" in v
                   and v["offset"] != _STRNONE and v["limit"] == _STRNONE),
]

_FILTER_YAML = {
    "type_eq": "criteria:" + _leaf("event_type", "EQ", "str", "view") + "\n",
    "user_in": "criteria:" + _leaf("user_id", "IN", "intArray",
                                   [1, 4, 7]) + "\n",
    "value_range": f"""criteria:
  le:
    op: "LOGICAL_OP_AND"
    left:{_leaf("value", "GE", "float", 50.0).replace(chr(10) + "  ", chr(10) + "      ")}
    right:{_leaf("value", "LE", "float", 150.0).replace(chr(10) + "  ", chr(10) + "      ")}
""",
}

_ORDER_YAML = {
    "value_asc": 'orderBy:\n  sort: "SORT_ASC"\n  indexRuleName: "value"\n',
    "value_desc": 'orderBy:\n  sort: "SORT_DESC"\n  indexRuleName: "value"\n',
    "ts_asc": 'orderBy:\n  sort: "SORT_ASC"\n',
    "ts_desc": 'orderBy:\n  sort: "SORT_DESC"\n',
    _STRNONE: "",
}


def _name(v):
    parts = ["feat"]
    if v["order"] != _STRNONE:
        parts.append(v["order"])
    if v["filter"] != _STRNONE:
        parts.append("filter_" + v["filter"])
    if v["limit"] != _STRNONE:
        parts.append("limit" + v["limit"])
    if v["offset"] != _STRNONE:
        parts.append("offset" + v["offset"])
    if v["proj"] == "explicit":
        parts.append("proj")
    return "_".join(parts) or "feat_plain"


_VECS = {_name(v): v for v in pairwise_vectors(_PARAMS, _CONSTRAINTS)}


def test_pairwise_stream_vector_count():
    # pairwise stays well under the 360-vector full product while
    # covering every legal value pair
    assert 10 <= len(_VECS) <= 60


@pytest.mark.parametrize("name", sorted(_VECS))
def test_gen_stream_feature(env, name):
    spark, cat, con = env
    v = _VECS[name]
    extra = ""
    if v["proj"] == "explicit":
        extra += ('projection:\n  tagFamilies:\n  - name: "searchable"\n'
                  '    tags: ["user_id", "value"]\n')
    extra += _ORDER_YAML[v["order"]]
    if v["limit"] != _STRNONE:
        extra += f"limit: {v['limit']}\n"
    if v["offset"] != _STRNONE:
        extra += f"offset: {v['offset']}\n"
    yaml_text = (f'name: "event_log"\ngroups: ["g1"]\n{TIME_RANGE}'
                 + _FILTER_YAML.get(v["filter"], "") + extra)
    q = load_stream_request(yaml_text)
    df = compile_stream(spark, cat, q)

    where = f" AND ({_crit_sql(q.criteria)})" if q.criteria is not None else ""
    proj = list(q.projection) or ["user_id", "event_type", "value", "props"]
    cols = ["ts", "event_id"] + [c for c in proj
                                 if c not in ("ts", "event_id")]
    order = q.order_by
    key = "ts" if (order is None or order.tag is None) else order.tag
    d = "DESC" if (order is not None and order.sort is Sort.DESC) else "ASC"
    limit = q.limit if q.limit is not None else 100
    sql = (
        f"SELECT {', '.join(cols)} FROM events "
        f"WHERE ts >= TIMESTAMP '{T0S}' AND ts < TIMESTAMP '{T1S}'{where} "
        f"ORDER BY {key} {d}, event_id ASC LIMIT {limit} OFFSET {q.offset}"
    )
    _run_dual(env, df, sql, True)
