"""Generated trace-query conformance suite (VERDICT r7 #1) — the repo
analogue of the reference 0.11 program-generated trace framework
(``test/cases/trace/cmd/generate``): three layers of cases built by code,
not hand-listed, each executed dual (compile_trace vs a DuckDB
recomputation over the same events-derived trace table):

* **layer 1 — criteria leaves** (``layer1_leaf.go:34-100``): every legal
  BinaryOp × tag-type combination as a single-leaf criteria, plus the
  MATCH-on-unindexed-tag error case (``gen_err_match_sw``);
* **layer 2 — AND/OR trees** (``layer2_tree.go:28-90``): alternating-op
  trees of depth 1/2/3/5 with leaves cycling over the schema's tags,
  plus a deliberately contradictory AND (the reference's WantEmpty
  depth-3 analogue);
* **layer 3 — pairwise feature vectors** (``layer3_features.go:22-100``
  over ``pairwise.go``): greedy pair-covering (AETG-style, Cohen et al.
  1997) over mode × order × filter × limit × offset × projection with
  the reference's three constraints and its forced mode-coverage
  vectors.

Tag mapping onto the synthetic corpus (same convention as the replayed
golden cases in test_golden_corpus2.py): trace_id → ``user_id`` (INT),
service/state → ``event_type`` (STRING), duration → ``value`` (FLOAT).
The pairwise generator itself is property-tested for its coverage
guarantee (every valid value pair appears in some vector).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from skywalking_banyandb_spark.catalog import default_catalog
from skywalking_banyandb_spark.errors import QueryAnalyzeError
from skywalking_banyandb_spark.plans.trace import compile_trace
from skywalking_banyandb_spark.request_loader import load_trace_request

from conftest import SF_SMALL
from test_golden_corpus import _run_dual, _crit_sql, TIME_RANGE, T0, T1

T0S, T1S = T0.replace("T", " "), T1.replace("T", " ")


@pytest.fixture(scope="module")
def env(spark):
    cat = default_catalog(SF_SMALL)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'")
    return spark, cat, con


# ---------------------------------------------------------------------------
# pairwise generator (layer-3 harness)
# ---------------------------------------------------------------------------

def pairwise_vectors(params: dict, constraints=()) -> list:
    """Greedy pairwise (2-way) covering: every constraint-legal value
    pair of every two parameters appears in at least one emitted vector.
    Deterministic: parameters and values are iterated in sorted/declared
    order (no RNG). Analogue of ``cmd/generate/pairwise.go``."""
    names = sorted(params)

    def ok(vec):
        return all(c(vec) for c in constraints)

    required = set()
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            for va in params[a]:
                for vb in params[b]:
                    if ok({a: va, b: vb}):
                        required.add((a, va, b, vb))

    def pairs_of(vec):
        out = set()
        for i, a in enumerate(names):
            for b in names[i + 1:]:
                out.add((a, vec[a], b, vec[b]))
        return out

    vectors = []
    covered: set = set()
    while True:
        remaining = required - covered
        if not remaining:
            break
        # seed from an uncovered pair — guarantees progress every round
        a, va, b, vb = sorted(remaining)[0]
        vec = {a: va, b: vb}
        for name in names:
            if name in vec:
                continue
            best, best_score = None, -1
            for val in params[name]:
                trial = dict(vec)
                trial[name] = val
                if not ok(trial):
                    continue
                score = sum(
                    1 for k in vec
                    if (min(k, name), trial[min(k, name)],
                        max(k, name), trial[max(k, name)]) in remaining)
                if score > best_score:
                    best, best_score = val, score
            if best is None:
                break  # seed pair cannot extend to a legal full vector
            vec[name] = best
        if len(vec) < len(names):
            covered.add((a, va, b, vb))  # pairwise-legal, globally not
            continue
        covered |= pairs_of(vec) & required
        vectors.append(vec)
    return vectors


def test_pairwise_generator_covers_all_pairs():
    params = {"a": ["1", "2", "3"], "b": ["x", "y"], "c": ["p", "q", "r"]}
    cons = [lambda v: not (v.get("a") == "1" and v.get("b") == "y")]
    vecs = pairwise_vectors(params, cons)
    seen = set()
    for v in vecs:
        assert not (v["a"] == "1" and v["b"] == "y")
        ks = sorted(v)
        for i, x in enumerate(ks):
            for y in ks[i + 1:]:
                seen.add((x, v[x], y, v[y]))
    for a in params["a"]:
        for b in params["b"]:
            if a == "1" and b == "y":
                continue
            assert ("a", a, "b", b) in seen
    for b in params["b"]:
        for c in params["c"]:
            assert ("b", b, "c", c) in seen
    # pairwise is sub-exhaustive: fewer vectors than the full product
    assert len(vecs) < 3 * 2 * 3


# ---------------------------------------------------------------------------
# shared request/oracle builders
# ---------------------------------------------------------------------------

def _leaf(tag, op, kind, val):
    if kind in ("strArray", "intArray"):
        k = kind.replace("Array", "")
        vals = "\n".join(
            f'          - {"" if k == "int" else ""}{v!r}' if k == "str"
            else f"          - {v}" for v in val)
        return f"""
  condition:
    name: "{tag}"
    op: "BINARY_OP_{op}"
    value:
      {kind}:
        value:
{vals}"""
    if kind == "null":
        return f"""
  condition:
    name: "{tag}"
    op: "BINARY_OP_{op}"
    value:
      "null": {{}}"""
    v = f'"{val}"' if kind == "str" else val
    return f"""
  condition:
    name: "{tag}"
    op: "BINARY_OP_{op}"
    value:
      {kind}:
        value: {v}"""


def _req(criteria_yaml="", extra="limit: 30\n"):
    return (f'name: "event_trace"\ngroups: ["g1"]\n{TIME_RANGE}'
            + criteria_yaml + extra)


def _oracle(q, order_sql="start_ts ASC"):
    where = f" AND ({_crit_sql(q.criteria)})" if q.criteria is not None else ""
    ids = ""
    if q.trace_ids:
        ids = f" AND user_id IN ({', '.join(str(i) for i in q.trace_ids)})"
    limit = q.limit if q.limit is not None else 100
    return (
        "SELECT user_id AS trace_id, COUNT(*) AS span_count, "
        "MIN(ts) AS start_ts, MAX(ts) AS end_ts FROM events "
        f"WHERE ts >= TIMESTAMP '{T0S}' AND ts < TIMESTAMP '{T1S}'{where}{ids} "
        f"GROUP BY user_id ORDER BY {order_sql}, trace_id ASC "
        f"LIMIT {limit} OFFSET {q.offset}"
    )


def _dual(env, yaml_text, order_sql="start_ts ASC"):
    spark, cat, con = env
    q = load_trace_request(yaml_text)
    df = compile_trace(spark, cat, q).select(
        "trace_id", "span_count", "start_ts", "end_ts")
    return _run_dual(env, df, _oracle(q, order_sql), True)


# ---------------------------------------------------------------------------
# layer 1 — criteria leaves (generated, not hand-listed)
# ---------------------------------------------------------------------------

def _layer1_cases():
    """Every legal op × tag combination, built programmatically like
    ``defineLeafOps`` (layer1_leaf.go:63-90)."""
    cases = {}
    # trace-id leaf ops (reference: trace_id str; here INT user_id)
    for op, kind, val in (
        ("EQ", "int", 3), ("NE", "int", 5),
        ("IN", "intArray", [2, 4]), ("NOT_IN", "intArray", [1000000007]),
    ):
        cases[f"leaf_{op.lower()}_trace_id"] = _leaf("user_id", op, kind, val)
    # string-tag leaf ops (reference service_id/state strings)
    for op, kind, val in (
        ("EQ", "str", "purchase"), ("NE", "str", "click"),
        ("IN", "strArray", ["click", "error"]),
        ("NOT_IN", "strArray", ["missing_type"]),
        ("LT", "str", "error"), ("GT", "str", "signup"),
        ("LE", "str", "click"), ("GE", "str", "view"),
    ):
        cases[f"leaf_{op.lower()}_event_type"] = _leaf(
            "event_type", op, kind, val)
    # numeric leaf ops (reference duration int; here FLOAT value)
    for op, val in (("LT", 1.0), ("GT", 400.0), ("LE", 5.0), ("GE", 420.0),
                    ("EQ", 87.5), ("NE", 87.5)):
        cases[f"leaf_{op.lower()}_value"] = _leaf("value", op, "float", val)
    return cases


_L1 = _layer1_cases()


@pytest.mark.parametrize("case", sorted(_L1))
def test_gen_layer1_leaf(env, case):
    _dual(env, _req("criteria:" + _L1[case] + "\n"))


def test_gen_layer1_eq_exact_miss_is_empty(env):
    """``gen_leaf_eq_duration`` semantics: EQ on a value no span carries
    → empty on BOTH engines (the reference marks it WantEmpty)."""
    rows = _dual(env, _req(
        "criteria:" + _leaf("value", "EQ", "float", 123456.789) + "\n"))
    assert rows == []


def test_gen_layer1_match_unindexed_errors(env):
    """``gen_err_match_sw``: MATCH against a tag with no analyzer is an
    analyze-time error, not an empty result."""
    spark, cat, con = env
    q = load_trace_request(_req(
        "criteria:" + _leaf("event_type", "MATCH", "str", "purchase") + "\n"))
    with pytest.raises(QueryAnalyzeError):
        compile_trace(spark, cat, q).collect()


# ---------------------------------------------------------------------------
# layer 2 — alternating AND/OR trees of depth 1/2/3/5
# ---------------------------------------------------------------------------

_L2_LEAVES = [
    ("event_type", "EQ", "str", "click"),
    ("event_type", "EQ", "str", "purchase"),
    ("value", "GE", "float", 10.0),
    ("event_type", "EQ", "str", "view"),
    ("value", "LE", "float", 400.0),
    ("event_type", "EQ", "str", "signup"),
]


def _tree_yaml(depth, op, offset=0, indent=2):
    """``buildTree`` (layer2_tree.go:76-90): alternate AND/OR each level,
    leaves cycle over the tag list by offset."""
    pad = " " * indent
    if depth <= 1:
        tag, o, kind, val = _L2_LEAVES[offset % len(_L2_LEAVES)]
        return _leaf(tag, o, kind, val).replace("\n  ", "\n" + pad)
    alt = "OR" if op == "AND" else "AND"
    left = _tree_yaml(depth - 1, alt, offset, indent + 4)
    right = _tree_yaml(depth - 1, alt, offset + (1 << (depth - 2)),
                       indent + 4)
    return (f"\n{pad}le:\n{pad}  op: \"LOGICAL_OP_{op}\""
            f"\n{pad}  left:{left}\n{pad}  right:{right}")


@pytest.mark.parametrize("depth,op", [
    (1, "AND"), (2, "AND"), (2, "OR"), (3, "AND"), (3, "OR"),
    (5, "AND"), (5, "OR"),
])
def test_gen_layer2_tree(env, depth, op):
    _dual(env, _req("criteria:" + _tree_yaml(depth, op) + "\n"))


def test_gen_layer2_contradictory_and_is_empty(env):
    """The reference's depth-3 WantEmpty analogue: an AND whose arms
    cannot both hold yields empty on both engines."""
    y = f"""criteria:
  le:
    op: "LOGICAL_OP_AND"
    left:{_leaf("value", "LT", "float", 1.0).replace(chr(10) + "  ", chr(10) + "      ")}
    right:{_leaf("value", "GT", "float", 100000.0).replace(chr(10) + "  ", chr(10) + "      ")}
"""
    assert _dual(env, _req(y)) == []


# ---------------------------------------------------------------------------
# layer 3 — pairwise feature vectors
# ---------------------------------------------------------------------------

_STRNONE = "none"

_L3_PARAMS = {
    "mode": ["traceid", "order"],
    "order": ["value_asc", "value_desc", "ts_asc", "ts_desc", _STRNONE],
    "filter": [_STRNONE, "type_eq", "value_range", "type2_eq"],
    "limit": [_STRNONE, "2", "5"],
    "offset": [_STRNONE, "1", "3"],
    "proj": ["empty", "explicit"],
}

_L3_CONSTRAINTS = [
    lambda v: not ("mode" in v and "order" in v
                   and v["mode"] == "order" and v["order"] == _STRNONE),
    lambda v: not ("mode" in v and "order" in v
                   and v["mode"] == "traceid" and v["order"] != _STRNONE),
    lambda v: not ("offset" in v and "limit" in v
                   and v["offset"] != _STRNONE and v["limit"] == _STRNONE),
]

# forced coverage rows (ensureModeCoverage, layer3_features.go:160-176)
_L3_REQUIRED = [
    {"mode": "traceid", "order": _STRNONE, "filter": _STRNONE,
     "limit": _STRNONE, "offset": _STRNONE, "proj": "explicit"},
    {"mode": "traceid", "order": _STRNONE, "filter": _STRNONE,
     "limit": "2", "offset": _STRNONE, "proj": "empty"},
    {"mode": "order", "order": "value_asc", "filter": _STRNONE,
     "limit": "5", "offset": _STRNONE, "proj": "explicit"},
    {"mode": "order", "order": "value_desc", "filter": "type_eq",
     "limit": "2", "offset": _STRNONE, "proj": "empty"},
    {"mode": "order", "order": "ts_asc", "filter": "type2_eq",
     "limit": "5", "offset": "1", "proj": "explicit"},
    {"mode": "order", "order": "ts_desc", "filter": "value_range",
     "limit": "2", "offset": _STRNONE, "proj": "empty"},
]


def _l3_vectors():
    vecs = pairwise_vectors(_L3_PARAMS, _L3_CONSTRAINTS)
    for req in _L3_REQUIRED:
        if not any(all(v.get(k) == val for k, val in req.items())
                   for v in vecs):
            vecs.append(req)
    return vecs


_L3_FILTER_YAML = {
    "type_eq": "criteria:" + _leaf("event_type", "EQ", "str", "click") + "\n",
    "type2_eq": "criteria:" + _leaf(
        "event_type", "EQ", "str", "purchase") + "\n",
    "value_range": f"""criteria:
  le:
    op: "LOGICAL_OP_AND"
    left:{_leaf("value", "GE", "float", 100.0).replace(chr(10) + "  ", chr(10) + "      ")}
    right:{_leaf("value", "LE", "float", 200.0).replace(chr(10) + "  ", chr(10) + "      ")}
""",
}

_L3_FILTER_SQL = {
    "type_eq": "event_type = 'click'",
    "type2_eq": "event_type = 'purchase'",
    "value_range": "(value >= 100.0 AND value <= 200.0)",
}

_L3_ORDER = {
    "value_asc": ('orderBy:\n  sort: "SORT_ASC"\n  indexRuleName: "value"\n',
                  "MIN(value) ASC"),
    "value_desc": ('orderBy:\n  sort: "SORT_DESC"\n  indexRuleName: "value"\n',
                   "MAX(value) DESC"),
    "ts_asc": ('orderBy:\n  sort: "SORT_ASC"\n', "start_ts ASC"),
    "ts_desc": ('orderBy:\n  sort: "SORT_DESC"\n', "start_ts DESC"),
}


def _l3_name(v):
    parts = ["feat", v["mode"]]
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
    return "_".join(parts)


_L3_VECS = {_l3_name(v): v for v in _l3_vectors()}


@pytest.mark.parametrize("name", sorted(_L3_VECS))
def test_gen_layer3_feature(env, name):
    spark, cat, con = env
    v = _L3_VECS[name]
    extra = ""
    if v["proj"] == "explicit":
        extra += ('tagProjection:\n  tagFamilies:\n  - name: "default"\n'
                  '    tags: ["event_type"]\n')
    if v["limit"] != _STRNONE:
        extra += f"limit: {v['limit']}\n"
    if v["offset"] != _STRNONE:
        extra += f"offset: {v['offset']}\n"
    if v["mode"] == "traceid":
        crit = "criteria:" + _leaf("user_id", "EQ", "int", 3) + "\n"
        order_sql = "start_ts ASC"
        yaml_text = _req(crit, extra)
    else:
        oy, order_sql = _L3_ORDER[v["order"]]
        crit = _L3_FILTER_YAML.get(v["filter"], "")
        yaml_text = _req(crit, oy + extra)
    q = load_trace_request(yaml_text)
    df = compile_trace(spark, cat, q)
    if v["proj"] == "explicit":
        # projection contract: spans carry (ts, span_id, projected tags,
        # span payload) and nothing else
        fields = [f.name for f in df.schema["spans"].dataType.elementType]
        assert fields == ["ts", "event_id", "event_type", "props"], fields
    rows = _run_dual(env, df.select(
        "trace_id", "span_count", "start_ts", "end_ts"),
        _oracle(q, order_sql), True)
    if v["mode"] == "traceid" and v["offset"] != _STRNONE:
        # reference marks traceid+offset WantEmpty: one trace, page 2+
        assert rows == []


def test_gen_layer3_has_both_modes():
    modes = {v["mode"] for v in _L3_VECS.values()}
    assert modes == {"traceid", "order"}
    assert len(_L3_VECS) >= 10


# ---------------------------------------------------------------------------
# remaining golden-corpus gaps (VERDICT r7 #1): the trace cases no corpus
# file replayed — filter_non_existent_tag, multi_group_new_tag,
# multi_group_tag_type (test/cases/trace/data/input/*.yml; write_mixed is
# exercised by the write_mixed_roundtrip registry entry)
# ---------------------------------------------------------------------------

def test_trace_filter_non_existent_tag_errors(env):
    """filter_non_existent_tag.yml (WantErr): criteria naming a tag the
    schema does not declare is an ANALYZE-time error, never an empty
    result — the unknown-tag/unmatched-filter distinction the reference
    pins (SURVEY §7 hard parts)."""
    spark, cat, con = env
    q = load_trace_request(_req(
        "criteria:" + _leaf("nonexistent_tag", "EQ", "str", "x") + "\n"))
    with pytest.raises(QueryAnalyzeError):
        compile_trace(spark, cat, q).collect()


def _hetero_env(env, g3_tags):
    import dataclasses

    from skywalking_banyandb_spark.catalog import Catalog

    spark, cat0, con = env
    base = cat0.get("g1", "trace", "event_trace")
    cat = Catalog()
    cat.register(base)
    cat.register(dataclasses.replace(base, group="g3", tags=g3_tags))
    return spark, cat, con


def test_trace_multi_group_new_tag(env):
    """multi_group_new_tag.yml: a cross-group query projecting a tag only
    ONE group declares — the other group's spans NULL-fill it (the trace
    flavor of the 'multi groups: new tag and fields' schema merge)."""
    from skywalking_banyandb_spark.catalog import TagSpec

    spark, cat, con = _hetero_env(env, (TagSpec("value", "FLOAT"),))
    q = load_trace_request(_req(
        "criteria:" + _leaf("user_id", "IN", "intArray", [1, 2, 9]) + "\n",
        extra=('tagProjection:\n  tagFamilies:\n  - name: "default"\n'
               '    tags: ["event_type", "value"]\nlimit: 30\n')))
    q = type(q)(**{**q.__dict__, "groups": ["g1", "g3"]})
    df = compile_trace(spark, cat, q)
    fields = [f.name for f in df.schema["spans"].dataType.elementType]
    assert "event_type" in fields  # merged schema keeps g1's extra tag
    rows = df.select("trace_id", "span_count").collect()
    # both groups read the same physical spans: per-trace count doubles,
    # and exactly half of each trace's spans carry NULL event_type
    want = {r[0]: 2 * r[1] for r in con.execute(
        "SELECT user_id, COUNT(*) FROM events "
        f"WHERE ts >= TIMESTAMP '{T0S}' AND ts < TIMESTAMP '{T1S}' "
        "AND user_id IN (1, 2, 9) GROUP BY user_id").fetchall()}
    assert {r.trace_id: r.span_count for r in rows} == want
    nulls = df.select(F.explode("spans").alias("s")).where(
        F.col("s.event_type").isNull()).count()
    assert nulls == sum(want.values()) // 2


def test_trace_multi_group_tag_type_change(env):
    """multi_group_tag_type.yml: one group re-declares a tag at another
    type. The reference returns each group's own typed values
    (heterogeneous key-value span tags); a columnar engine holds ONE type
    per column, so the merged schema resolves to the FIRST group's
    declared type — results still union (documented divergence: same
    rows, one column type)."""
    from skywalking_banyandb_spark.catalog import TagSpec

    spark, cat, con = _hetero_env(
        env, (TagSpec("event_type", "STRING"), TagSpec("value", "INT")))
    q = load_trace_request(_req(
        "criteria:" + _leaf("user_id", "IN", "intArray", [1, 2, 9]) + "\n",
        extra=('tagProjection:\n  tagFamilies:\n  - name: "default"\n'
               '    tags: ["event_type", "value"]\nlimit: 30\n')))
    q = type(q)(**{**q.__dict__, "groups": ["g1", "g3"]})
    df = compile_trace(spark, cat, q)
    elem = df.schema["spans"].dataType.elementType
    assert str(elem["value"].dataType) == "DoubleType()"  # g1 wins
    got = {r.trace_id: r.span_count
           for r in df.select("trace_id", "span_count").collect()}
    want = {r[0]: 2 * r[1] for r in con.execute(
        "SELECT user_id, COUNT(*) FROM events "
        f"WHERE ts >= TIMESTAMP '{T0S}' AND ts < TIMESTAMP '{T1S}' "
        "AND user_id IN (1, 2, 9) GROUP BY user_id").fetchall()}
    assert got == want
