"""write_mixed conformance trio — literal replays of the reference's mixed
write streams (``test/cases/{measure,stream,trace}/data/data.go``
WriteMixed + ``input/write_mixed.yaml``): batch 1 writes values in SCHEMA
tag order, batch 2 reuses the previous metadata (sticky) but carries an
explicit spec that REORDERS tags/fields (mapped back by name), batch 3
targets a SECOND group with its own spec; the query then reads across
both groups. Closes the last documented-analogue gap (VERDICT r3 #6)."""

from __future__ import annotations

import dataclasses

import pytest

from skywalking_banyandb_spark.catalog import Catalog, default_catalog
from skywalking_banyandb_spark.model import (
    BinaryOp,
    MeasureQuery,
    StreamQuery,
    TimeRange,
    TraceQuery,
    cond,
)
from skywalking_banyandb_spark.plans.measure import compile_measure
from skywalking_banyandb_spark.plans.stream import compile_stream
from skywalking_banyandb_spark.plans.trace import compile_trace
from skywalking_banyandb_spark.request_loader import (
    apply_write_requests,
    load_write_requests,
)

from conftest import SF_SMALL

TR = TimeRange.of("2024-01-03T00:00:00", "2024-01-04T00:00:00")


def _store_catalog(kind, name, paths_by_group):
    cat0 = default_catalog(SF_SMALL)
    cat = Catalog()
    for grp, path in paths_by_group.items():
        base = cat0.get("g1", kind, name)
        cat.register(dataclasses.replace(base, group=grp, paths=(path,)))
    return cat


def _dp(ts, tags, fields, md=None, spec=None):
    d = {"dataPoint": {
        "timestamp": ts,
        "tagFamilies": [{"tags": tags}],
        "fields": fields,
    }}
    if md:
        d["metadata"] = md
    if spec:
        d["spec"] = spec
    return d


def test_measure_write_mixed_roundtrip(spark, tmp_path):
    s = lambda v: {"str": {"value": v}}
    i = lambda v: {"int": {"value": v}}
    f = lambda v: {"float": {"value": v}}
    spec_rev = {"tagFamilySpec": [{"name": "default",
                                   "tagNames": ["props", "event_type", "user_id"]}],
                "fieldNames": ["value"]}
    spec_g2 = {"tagFamilySpec": [{"name": "default",
                                  "tagNames": ["event_type", "user_id", "props"]}],
               "fieldNames": ["value"]}
    docs = [
        # batch 1 — schema order (user_id, event_type, props | value), g1
        _dp("2024-01-03T01:00:00Z", [i(1), s("click"), s("p1")], [f(10.0)],
            md={"group": "g1", "name": "metrics"}),
        _dp("2024-01-03T02:00:00Z", [i(2), s("view"), s("p2")], [f(20.0)]),
        # batch 2 — sticky metadata (still g1), spec-reversed order
        _dp("2024-01-03T01:00:00Z", [s("p1b"), s("click"), i(1)], [f(11.0)],
            spec=spec_rev),  # same (entity, ts) as row 1 -> upsert wins
        _dp("2024-01-03T03:00:00Z", [s("p3"), s("error"), i(3)], [f(30.0)]),
        # batch 3 — second group, its own spec
        _dp("2024-01-03T01:30:00Z", [s("click"), i(1), s("q1")], [f(40.0)],
            md={"group": "g2", "name": "metrics"}, spec=spec_g2),
        _dp("2024-01-03T02:30:00Z", [s("signup"), i(4), s("q4")], [f(50.0)]),
    ]
    cat0 = default_catalog(SF_SMALL)
    paths = apply_write_requests(spark, cat0, "measure", docs, str(tmp_path))
    cat = _store_catalog("measure", "metrics", {
        "g1": paths[("g1", "metrics")], "g2": paths[("g2", "metrics")]})

    q = MeasureQuery(
        groups=["g1", "g2"], name="metrics", time_range=TR,
        criteria=cond("user_id", BinaryOp.IN, [1, 2, 3, 4]),
        tag_projection=["user_id", "event_type", "props"],
        field_projection=["value"], limit=100,
    )
    got = sorted(tuple(r) for r in compile_measure(spark, cat, q).collect())
    import datetime as dt
    t = lambda h, m=0: dt.datetime(2024, 1, 3, h, m)
    # row 1 upserted by the spec-order rewrite (version = write seq)
    want = sorted([
        (t(1), 1, "click", "p1b", 11.0),
        (t(2), 2, "view", "p2", 20.0),
        (t(3), 3, "error", "p3", 30.0),
        (t(1, 30), 1, "click", "q1", 40.0),
        (t(2, 30), 4, "signup", "q4", 50.0),
    ])
    assert got == want


def _el(eid, ts, tags, md=None, spec=None):
    d = {"element": {"elementId": eid, "timestamp": ts,
                     "tagFamilies": [{"tags": tags}]}}
    if md:
        d["metadata"] = md
    if spec:
        d["spec"] = spec
    return d


def test_stream_write_mixed_roundtrip(spark, tmp_path):
    s = lambda v: {"str": {"value": v}}
    i = lambda v: {"int": {"value": v}}
    f = lambda v: {"float": {"value": v}}
    # physical tag order: user_id, event_type, value, props
    spec_rev = {"tagFamilySpec": [{"name": "default",
                                   "tagNames": ["props", "value",
                                                "event_type", "user_id"]}]}
    docs = [
        _el(101, "2024-01-03T01:00:00Z", [i(1), s("click"), f(1.5), s("k 69 a")],
            md={"group": "g1", "name": "event_log"}),
        _el(102, "2024-01-03T02:00:00Z", [i(2), s("view"), f(2.5), s("b")]),
        _el(103, "2024-01-03T03:00:00Z", [s("c"), f(3.5), s("error"), i(3)],
            spec=spec_rev),
        _el(104, "2024-01-03T01:30:00Z", [s("d"), f(4.5), s("click"), i(1)],
            md={"group": "g2", "name": "event_log"}, spec=spec_rev),
    ]
    cat0 = default_catalog(SF_SMALL)
    paths = apply_write_requests(spark, cat0, "stream", docs, str(tmp_path))
    cat = _store_catalog("stream", "event_log", {
        "g1": paths[("g1", "event_log")], "g2": paths[("g2", "event_log")]})

    q = StreamQuery(
        groups=["g1", "g2"], name="event_log", time_range=TR,
        criteria=cond("user_id", BinaryOp.IN, [1, 2, 3]),
        projection=["user_id", "event_type", "value", "props"], limit=100,
    )
    got = [tuple(r) for r in compile_stream(spark, cat, q).collect()]
    import datetime as dt
    t = lambda h, m=0: dt.datetime(2024, 1, 3, h, m)
    # ordered by ts then element id; spec-order writes land on the right tags
    assert got == [
        (t(1), 101, 1, "click", 1.5, "k 69 a"),
        (t(1, 30), 104, 1, "click", 4.5, "d"),
        (t(2), 102, 2, "view", 2.5, "b"),
        (t(3), 103, 3, "error", 3.5, "c"),
    ]


def _sp(tags, span, md=None, spec=None):
    d = {"tags": tags, "span": span}
    if md:
        d["metadata"] = md
    if spec:
        d["spec"] = spec
    return d


def test_trace_write_mixed_roundtrip(spark, tmp_path):
    s = lambda v: {"str": {"value": v}}
    i = lambda v: {"int": {"value": v}}
    f = lambda v: {"float": {"value": v}}
    # canonical order: (user_id [trace], event_id [span], ts, event_type, value)
    spec_perm = {"tagNames": ["event_id", "value", "event_type", "ts",
                              "user_id"]}
    ns = lambda h, m=0: int((1704243600 + (h - 1) * 3600 + m * 60) * 1e9)
    docs = [
        _sp([i(7), i(201), s("2024-01-03T01:00:00Z"), s("purchase"), f(9.0)],
            "span-a", md={"group": "g1", "name": "event_trace"}),
        _sp([i(7), i(202), s("2024-01-03T01:05:00Z"), s("view"), f(8.0)],
            "span-b"),
        # spec-order batch, sticky g1, int-nanos timestamp form
        _sp([i(203), f(7.0), s("purchase"), i(ns(2)), i(7)],
            "span-c", spec=spec_perm),
        # second group: spans of the SAME trace id land in g2 and must merge
        _sp([i(204), f(6.0), s("error"), i(ns(1, 30)), i(7)],
            "span-d", md={"group": "g2", "name": "event_trace"},
            spec=spec_perm),
        _sp([i(205), f(5.0), s("view"), i(ns(3)), i(9)], "span-e"),
    ]
    cat0 = default_catalog(SF_SMALL)
    paths = apply_write_requests(spark, cat0, "trace", docs, str(tmp_path))
    cat = _store_catalog("trace", "event_trace", {
        "g1": paths[("g1", "event_trace")], "g2": paths[("g2", "event_trace")]})

    q = TraceQuery(groups=["g1", "g2"], name="event_trace", time_range=TR,
                   trace_ids=[7, 9], limit=10)
    rows = {r["trace_id"]: r for r in compile_trace(spark, cat, q).collect()}
    assert set(rows) == {7, 9}
    t7 = rows[7]
    assert t7["span_count"] == 4  # spans merged from BOTH groups
    # spans sorted by (ts, span_id); span ids prove the cross-group merge
    assert [sp["event_id"] for sp in t7["spans"]] == [201, 202, 204, 203]
    assert [sp["props"] for sp in t7["spans"]] == \
        ["span-a", "span-b", "span-d", "span-c"]
    assert [sp["value"] for sp in t7["spans"]] == [9.0, 8.0, 6.0, 7.0]
    assert rows[9]["span_count"] == 1


def test_write_without_metadata_rejected():
    from skywalking_banyandb_spark.errors import QueryAnalyzeError

    cat0 = default_catalog(SF_SMALL)
    with pytest.raises(QueryAnalyzeError, match="metadata"):
        load_write_requests(
            [{"dataPoint": {"timestamp": "2024-01-03T00:00:00Z",
                            "tagFamilies": [], "fields": []}}],
            cat0, "measure")


def test_write_wrong_arity_rejected():
    from skywalking_banyandb_spark.errors import QueryAnalyzeError

    cat0 = default_catalog(SF_SMALL)
    doc = _dp("2024-01-03T01:00:00Z", [{"int": {"value": 1}}],
              [{"float": {"value": 1.0}}],
              md={"group": "g1", "name": "metrics"})
    with pytest.raises(QueryAnalyzeError, match="expected 3"):
        load_write_requests([doc], cat0, "measure")


def test_stream_write_generates_element_id_when_omitted(spark, tmp_path):
    """Reference 0.10: server-side element-id generation when the client
    omits elementId (banyand/stream/write_standalone.go:181-183 falls
    back to the snowflake idGen, pkg/idgen/snowflake.go layout). Ours is
    seeded from the element's own timestamp + per-ms sequence, so a
    REPLAYED request stream generates identical ids."""
    import datetime as dt

    from skywalking_banyandb_spark.request_loader import (
        _ELEMENT_ID_EPOCH_MS,
        load_write_requests,
    )

    s = lambda v: {"str": {"value": v}}
    i = lambda v: {"int": {"value": v}}
    f = lambda v: {"float": {"value": v}}

    def el(ts, tags, eid=None, md=None):
        e = {"element": {"timestamp": ts,
                         "tagFamilies": [{"tags": tags}]}}
        if eid is not None:
            e["element"]["elementId"] = eid
        if md:
            e["metadata"] = md
        return e

    docs = [
        el("2024-01-03T01:00:00Z", [i(1), s("click"), f(1.5), s("a")],
           md={"group": "g1", "name": "event_log"}),
        el("2024-01-03T01:00:00Z", [i(2), s("view"), f(2.5), s("b")]),
        el("2024-01-03T02:00:00Z", [i(3), s("error"), f(3.5), s("c")],
           eid=777),  # explicit id honored verbatim
    ]
    cat = default_catalog(SF_SMALL)
    rows = load_write_requests(docs, cat, "stream")[("g1", "event_log")]
    ids = [r["event_id"] for r in rows]
    assert ids[2] == 777
    # generated ids: unique, and the snowflake timestamp field decodes
    # back to the element's own millisecond
    assert len(set(ids)) == 3
    ms = int((dt.datetime(2024, 1, 3, 1) - dt.datetime(1970, 1, 1))
             .total_seconds() * 1000)
    for k in (0, 1):
        assert ids[k] >> 17 == ms - _ELEMENT_ID_EPOCH_MS
        assert (ids[k] & 0x3FF) == k  # per-ms arrival sequence
    # replay determinism: the same stream yields the same ids
    rows2 = load_write_requests(docs, cat, "stream")[("g1", "event_log")]
    assert [r["event_id"] for r in rows2] == ids


def test_stream_element_id_sequence_overflow_advances_clock():
    """pkg/idgen/snowflake.go NextID: when the 10-bit per-ms sequence is
    exhausted the logical clock advances and the sequence resets — the
    1025th client-omitted-id element in one millisecond must get a UNIQUE
    id, never a masked duplicate (ADVICE r7).  Later real arrivals in the
    spilled-into millisecond must stay unique too."""
    import datetime as dt

    from skywalking_banyandb_spark.request_loader import (
        _ELEMENT_ID_EPOCH_MS,
        load_write_requests,
    )

    i = lambda v: {"int": {"value": v}}
    s = lambda v: {"str": {"value": v}}
    f = lambda v: {"float": {"value": v}}

    def el(ts, n, md=None):
        e = {"element": {"timestamp": ts,
                         "tagFamilies": [{"tags": [
                             i(n), s("click"), f(0.5), s("x")]}]}}
        if md:
            e["metadata"] = md
        return e

    t0 = "2024-01-03T01:00:00Z"          # ms M
    t1 = "2024-01-03T01:00:00.001Z"      # ms M+1 (real arrival)
    docs = [el(t0, 0, md={"group": "g1", "name": "event_log"})]
    docs += [el(t0, n) for n in range(1, 1030)]   # 1030 at ms M (> 1024)
    docs += [el(t1, 2000), el(t1, 2001)]          # 2 real at ms M+1
    cat = default_catalog(SF_SMALL)
    rows = load_write_requests(docs, cat, "stream")[("g1", "event_log")]
    ids = [r["event_id"] for r in rows]
    assert len(set(ids)) == len(ids) == 1032
    ms = int((dt.datetime(2024, 1, 3, 1) - dt.datetime(1970, 1, 1))
             .total_seconds() * 1000) - _ELEMENT_ID_EPOCH_MS
    # first 1024 fill ms M with sequences 0..1023
    assert ids[1023] == (ms << 17) | 1023
    # 1025th spills into the NEXT logical millisecond, sequence reset
    assert ids[1024] == ((ms + 1) << 17) | 0
    assert ids[1029] == ((ms + 1) << 17) | 5
    # real arrivals at ms M+1 continue the spilled counter (no collision)
    assert ids[1030] == ((ms + 1) << 17) | 6
    assert ids[1031] == ((ms + 1) << 17) | 7
    # and the measure-version write sequence was NOT clobbered by the
    # per-ms counter (ADVICE r7 low: distinct local name)
    rows2 = load_write_requests(docs, cat, "stream")[("g1", "event_log")]
    assert [r["event_id"] for r in rows2] == ids


def test_schema_deletion_replay(spark, tmp_path):
    """Replay of test/cases/schema/deletion.go VerifyMeasureDeletion:
    write data -> delete the resource -> writes AND queries to it are
    rejected, its data is gone, and a sibling resource in the same group
    keeps working."""
    import dataclasses as dc
    import os

    import pytest as _pytest

    from skywalking_banyandb_spark.errors import SchemaError
    from skywalking_banyandb_spark.model import AggFunc, AggregationSpec
    from skywalking_banyandb_spark.model import MeasureQuery
    from skywalking_banyandb_spark.plans.measure import compile_measure

    s = lambda v: {"str": {"value": v}}
    i = lambda v: {"int": {"value": v}}
    f = lambda v: {"float": {"value": v}}
    docs = [
        _dp("2024-01-03T01:00:00Z", [i(1), s("click"), s("p")], [f(1.0)],
            md={"group": "g1", "name": "metrics"}),
        _dp("2024-01-03T02:00:00Z", [i(2), s("view"), s("q")], [f(2.0)]),
    ]
    cat0 = default_catalog(SF_SMALL)
    paths = apply_write_requests(spark, cat0, "measure", docs, str(tmp_path))
    store = paths[("g1", "metrics")]

    cat = Catalog()
    base = cat0.get("g1", "measure", "metrics")
    cat.register(dataclasses.replace(base, paths=(store,)))
    sibling = dc.replace(cat0.get("g1", "stream", "event_log"))
    cat.register(sibling)

    q = MeasureQuery(
        groups=["g1"], name="metrics", time_range=TR,
        agg=AggregationSpec(AggFunc.COUNT, "value"), limit=10)
    assert compile_measure(spark, cat, q).collect()[0][0] == 2

    # step 2-3: delete -> confirmed; queries and writes now rejected
    assert cat.delete_resource("g1", "measure", "metrics",
                               remove_data=True) is True
    with _pytest.raises(SchemaError):
        compile_measure(spark, cat, q)
    with _pytest.raises(SchemaError):
        load_write_requests(docs, cat, "measure")
    assert not os.path.exists(store)
    # double delete is not confirmed (deleted=False)
    assert cat.delete_resource("g1", "measure", "metrics") is False

    # step 4-5: the sibling resource still registers and resolves
    assert cat.get("g1", "stream", "event_log") is sibling
