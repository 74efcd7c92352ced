"""Verbatim twin catalog — the reference conformance schemas re-registered
over the synthetic events/documents tables with DERIVED columns.

Shared by the verbatim replay suites (``test_golden_gen_verbatim.py``,
``test_golden_named_verbatim.py``, ``test_golden_gen_ql.py``): each
reference resource (``pkg/test/{measure,stream,trace,property}/testdata``
+ ``topn_aggregations``) is registered under its EXACT name/group, every
tag a ``TagSpec.expr`` / ``FieldSpec.expr`` over the physical columns.
Value domains are chosen so the corpus's operand VALUES discriminate
(``webapp_id``, ``trace_001``, ``entity_2``, ``svc1``, ``service_1``,
``'1'``, ``test1``, ``10.0.0.3_id``, ``span_002``, ``/home_endpoint``,
``state`` 0/1, ``duration`` thresholds 30..1200 all hit real rows).

Each tag spec row is (name, type, analyzer, spark_expr, duck_expr);
``duck_expr`` None means the Spark expression is dialect-portable (CASE /
concat / CAST ... AS STRING / floor are identical in DuckDB). The DuckDB
views built from the same rows are the oracle side of the dual execution.

Documented divergence carried from the adjudicated multi-group semantics:
where a second group re-declares a tag/field at another TYPE (measure
``sw_updated.entity_id`` INT, stream ``updated.status_code`` STRING,
trace ``test-trace-updated.state`` STRING), the merged column takes the
FIRST group's type (columnar engines hold one type per column); the twins
therefore declare the re-typed tag with the same expression and the first
group's type.
"""

from __future__ import annotations

from skywalking_banyandb_spark.catalog import (
    Catalog,
    FieldSpec,
    MeasureSchema,
    PropertySchema,
    StreamSchema,
    TagSpec,
    TopNAggregationSchema,
    TraceSchema,
)
from skywalking_banyandb_spark.model import BinaryOp, cond

# ---------------------------------------------------------------------------
# Shared derived expressions
# ---------------------------------------------------------------------------

_SVC = "concat('svc', CAST(user_id % 6 + 1 AS STRING))"           # svc1..svc6
_ENTITY = "concat('entity_', CAST(user_id % 8 AS STRING))"        # entity_0..7
_SERVICE_UND = "concat('svc_', CAST(user_id % 3 AS STRING))"      # svc_0..2
_SERVICE = "concat('service_', CAST(user_id % 3 AS STRING))"      # service_0..2
_LAYER = "user_id % 3"                                            # 0..2
_STATE = "user_id % 2"                                            # 0/1
_DURATION = "CAST(floor(value * 10) AS BIGINT)"                   # 0..3275
_NODE = ("CASE WHEN user_id % 3 = 0 THEN 'nodea' "
         "WHEN user_id % 3 = 1 THEN 'nodeb us-east' ELSE 'nodec' END")
_TOTAL = "value * 2"

# ---------------------------------------------------------------------------
# Stream sw (streams/sw.json) — searchable family, entity
# (service_id, service_instance_id, state)
# ---------------------------------------------------------------------------

STREAM_TAGS = [
    ("trace_id", "STRING", None, "CAST(event_id % 8 AS STRING)", None),
    ("state", "INT", None, _STATE, None),
    ("service_id", "STRING", None,
     "CASE WHEN user_id % 3 = 0 THEN 'webapp_id' "
     "WHEN user_id % 3 = 1 THEN 'api_id' ELSE 'db_id' END", None),
    ("service_instance_id", "STRING", None,
     "concat('inst_', CAST(user_id % 4 AS STRING))", None),
    ("endpoint_id", "STRING", None, "concat('/api/', event_type)", None),
    ("duration", "INT", None, _DURATION, None),
    ("start_time", "INT", None, "CAST(floor(value * 100) AS BIGINT)", None),
    ("http.method", "STRING", None,
     "CASE WHEN event_id % 4 = 0 THEN 'GET' WHEN event_id % 4 = 1 THEN "
     "'POST' WHEN event_id % 4 = 2 THEN 'PUT' ELSE 'DELETE' END", None),
    ("status_code", "INT", None,
     "CASE WHEN event_type = 'error' THEN 500 WHEN event_type = "
     "'purchase' THEN 100 ELSE 200 END", None),
    ("span_id", "STRING", None, "CAST(event_id AS STRING)", None),
    ("db.type", "STRING", None,
     "CASE WHEN user_id % 2 = 0 THEN 'sql' ELSE 'nosql' END", None),
    # index rule db.instance.json: analyzer "url"
    ("db.instance", "STRING", "url",
     "CASE WHEN event_type IN ('click', 'view') THEN 'mysql' "
     "ELSE 'pgsql' END", None),
    ("mq.queue", "STRING", None,
     "concat('q', CAST(user_id % 2 AS STRING))", None),
    ("mq.topic", "STRING", None,
     "concat('t', CAST(user_id % 2 AS STRING))", None),
    ("mq.broker", "STRING", None,
     "concat('b', CAST(user_id % 2 AS STRING))", None),
    ("extended_tags", "STRING_ARRAY", None,
     "array(substring(event_type, 1, 1), substring(event_type, 2, 1))",
     "[substring(event_type, 1, 1), substring(event_type, 2, 1)]"),
    ("non_indexed_tags", "STRING_ARRAY", None,
     "array(event_type)", "[event_type]"),
    ("data_binary", "DATA_BINARY", None,
     "CAST(props AS BINARY)", "CAST(props AS BLOB)"),
]

# streams/sw_updated.json: adds new_tag (and re-types status_code STRING —
# first-group type wins, see module docstring)
STREAM_UPDATED_TAGS = STREAM_TAGS + [
    ("new_tag", "STRING", None,
     "concat('n', CAST(user_id % 2 AS STRING))", None),
]

# streams/{duplicated,deduplication_test}.json — same searchable shape,
# service_instance_id domain carries the corpus's '10.0.0.3_id'
DUP_STREAM_TAGS = [
    ("data_binary", "DATA_BINARY", None,
     "CAST(props AS BINARY)", "CAST(props AS BLOB)"),
    ("trace_id", "STRING", None, "CAST(event_id % 8 AS STRING)", None),
    ("state", "INT", None, _STATE, None),
    ("service_id", "STRING", None,
     "CASE WHEN user_id % 3 = 0 THEN 'webapp_id' "
     "WHEN user_id % 3 = 1 THEN 'api_id' ELSE 'db_id' END", None),
    ("service_instance_id", "STRING", None,
     "concat('10.0.0.', CAST(user_id % 5 AS STRING), '_id')", None),
    ("duration", "INT", None, _DURATION, None),
]

# ---------------------------------------------------------------------------
# Measures (measures/*.json)
# ---------------------------------------------------------------------------

CPM_TAGS = [  # service_cpm_minute.json
    ("id", "STRING", None, _SVC, None),
    ("entity_id", "STRING", None, _ENTITY, None),
]

CPM_UPDATED_TAGS = [  # service_cpm_minute_updated.json (entity_id re-typed
    # INT in the reference; first-group type wins — STRING here)
    ("entity_id", "STRING", None, _ENTITY, None),
    ("extra_tag", "STRING", None,
     "concat('x', CAST(user_id % 2 AS STRING))", None),
]

TRAFFIC_TAGS = [  # service_traffic.json (index_mode) — id '1'..'6'
    ("id", "STRING", None, "CAST(user_id % 6 + 1 AS STRING)", None),
    ("service_id", "STRING", None, _SERVICE, None),
    ("name", "STRING", None, _NODE, None),
    ("short_name", "STRING", None, "upper(event_type)", None),
    ("service_group", "STRING", None,
     "CASE WHEN user_id % 2 = 0 THEN 'g_even' ELSE 'g_odd' END", None),
    ("layer", "INT", None, _LAYER, None),
]

SIT_TAGS = [  # service_instance_traffic.json; searchable_name.json: url
    ("id", "STRING", None, _SVC, None),
    ("service_id", "STRING", None, _SERVICE_UND, None),
    ("name", "STRING", "url", _NODE, None),
    ("last_ping", "INT", None, "CAST(floor(value) AS BIGINT)", None),
    ("layer", "INT", None, _LAYER, None),
]

SLM_TAGS = CPM_TAGS                      # service_latency_minute.json
SILM_TAGS = [                            # service_instance_latency_minute
    ("entity_id", "STRING", None, _ENTITY, None),
    ("service_id", "STRING", None, _SERVICE_UND, None),
]
CLR_TAGS = [                             # instance_clr_cpu_minute.json
    ("service_id", "STRING", None, _SERVICE_UND, None),
    ("entity_id", "STRING", None, _ENTITY, None),
]
SIFM_TAGS = [                            # service_instance_float_metric
    ("id", "STRING", None, _SVC, None),
    ("entity_id", "STRING", None, _ENTITY, None),
    ("service_id", "STRING", None, _SERVICE_UND, None),
]
SICM_TAGS = SIFM_TAGS                    # service_instance_cpm_minute
SIECM_TAGS = [                           # service_instance_endpoint_cpm_minute
    ("id", "STRING", None, _SVC, None),
    ("entity_id", "STRING", None, _ENTITY, None),
    ("service_id", "STRING", None, _SERVICE_UND, None),
    ("http.uri", "STRING", None,
     "concat('/uri/', CAST(user_id % 5 AS STRING))", None),
]
ERTM_TAGS = [("entity_id", "STRING", None, _ENTITY, None)]
SIMTT_TAGS = [                           # service_instance_metric_topn_test
    ("id", "STRING", None, _SVC, None),
    ("service_id", "STRING", None, _SERVICE_UND, None),
]
ET_TAGS = [                              # endpoint_traffic.json; rule
    # endpoint_name analyzer "url"
    ("service_id", "STRING", None, _SERVICE, None),
    ("endpoint_name", "STRING", "url",
     "concat('endpoint-', CAST(user_id % 4 AS STRING))", None),
]

# ---------------------------------------------------------------------------
# Traces (traces/*.json)
# ---------------------------------------------------------------------------

TRACE_TAGS = [  # traces/sw.json (test-trace-group)
    ("trace_id", "STRING", None,
     "concat('trace_00', CAST(event_id % 5 AS STRING))", None),
    ("state", "INT", None, _STATE, None),
    ("service_id", "STRING", None,
     "CASE WHEN user_id % 4 = 0 THEN 'api_service' "
     "WHEN user_id % 4 = 1 THEN 'auth_service' "
     "WHEN user_id % 4 = 2 THEN 'notification_service' "
     "ELSE 'webapp_service' END", None),
    ("service_instance_id", "STRING", None,
     "concat(CASE WHEN user_id % 5 = 0 THEN 'api' "
     "WHEN user_id % 5 = 1 THEN 'database' "
     "WHEN user_id % 5 = 2 THEN 'notification' "
     "WHEN user_id % 5 = 3 THEN 'payment' ELSE 'webapp' END, "
     "'_instance_', CAST(event_id % 3 AS STRING))", None),
    ("endpoint_id", "STRING", None,
     "CASE WHEN user_id % 3 = 0 THEN '/home_endpoint' "
     "WHEN user_id % 3 = 1 THEN '/item_endpoint' "
     "ELSE '/cart_endpoint' END", None),
    ("duration", "INT", None, _DURATION, None),
    ("span_id", "STRING", None, "CAST(event_id AS STRING)", None),
]

# traces/sw_updated.json: + error_message (state re-typed STRING in the
# reference — first-group type wins)
TRACE_UPDATED_TAGS = TRACE_TAGS + [
    ("error_message", "STRING", None,
     "CASE WHEN event_type = 'error' THEN 'boom' ELSE '' END", None),
]

ZIPKIN_TAGS = [  # traces/zipkin.json (zipkinTrace)
    ("trace_id", "STRING", None,
     "concat('zt_', CAST(event_id % 5 AS STRING))", None),
    ("span_id", "STRING", None,
     "concat('span_00', CAST(event_id % 4 AS STRING))", None),
    ("parent_id", "STRING", None, "CAST(event_id % 7 AS STRING)", None),
    ("operation_name", "STRING", None,
     "CASE WHEN user_id % 3 = 0 THEN '/db/query' "
     "WHEN user_id % 3 = 1 THEN '/http/get' ELSE '/rpc/call' END", None),
    ("kind", "STRING", None,
     "CASE WHEN user_id % 2 = 0 THEN 'CLIENT' ELSE 'SERVER' END", None),
    ("duration", "INT", None, _DURATION, None),
    ("local_endpoint_service_name", "STRING", None, _SERVICE, None),
    ("local_endpoint_ipv4", "STRING", None,
     "concat('192.168.1.', CAST(user_id % 12 AS STRING))", None),
    ("local_endpoint_port", "INT", None, "8000 + user_id % 3", None),
    ("remote_endpoint_service_name", "STRING", None, _SERVICE_UND, None),
    ("remote_endpoint_ipv4", "STRING", None,
     "concat('10.1.0.', CAST(user_id % 9 AS STRING))", None),
    ("remote_endpoint_port", "INT", None, "9000 + user_id % 2", None),
    ("shared", "INT", None, _STATE, None),
    ("debug", "INT", None, "event_id % 2", None),
    ("query", "STRING_ARRAY", None,
     "CASE WHEN user_id % 2 = 0 THEN array('SELECT * FROM users') "
     "ELSE array('UPDATE users') END",
     "CASE WHEN user_id % 2 = 0 THEN ['SELECT * FROM users'] "
     "ELSE ['UPDATE users'] END"),
]

# ---------------------------------------------------------------------------
# Property ui_menu (properties/sw.json group; cases use menu_name,
# configuration, update_time; ids are strings)
# ---------------------------------------------------------------------------

UIMENU_TAGS = [
    ("prop_id", "STRING", None, "CAST(doc_id AS STRING)", None),
    ("menu_name", "STRING", None,
     "concat('test', CAST(doc_id % 4 AS STRING))", None),
    ("configuration", "STRING", None, "source", None),
    ("update_time", "INT", None, "n_chars", None),
]


def tagspecs(specs, family="default", families=None):
    """``families`` overrides the family per tag name — the reference
    splits some schemas across families (streams/sw.json puts
    ``data_binary`` in family ``data``; measures/service_latency_minute
    puts ``entity_id`` in ``storage_only``) and responses nest tags by
    family, so the twins must mirror the split."""
    families = families or {}
    return tuple(
        TagSpec(n, t, family=families.get(n, family), analyzer=a, expr=spark)
        for (n, t, a, spark, _) in specs
    )


def view_sql(view, specs, sf_dir, extra="", table="events"):
    cols = ["ts", "event_id"] if table == "events" else ["doc_id"]
    cols += [f'{duck or spark} AS "{n}"' for (n, _, _, spark, duck) in specs]
    tail = ", value" if table == "events" else ""
    return (f"CREATE VIEW {view} AS SELECT {', '.join(cols)}{tail}{extra} "
            f"FROM '{sf_dir}/{table}.parquet'")


# fields shared by the cpm-like measure twins
_F_TOTAL_VALUE = (FieldSpec("total", "FLOAT", expr=_TOTAL),
                  FieldSpec("value", "FLOAT"))


def twin_catalog(sf_dir: str) -> Catalog:
    ev = f"{sf_dir}/events.parquet"
    docs = f"{sf_dir}/documents.parquet"
    cat = Catalog()

    # ---- streams -----------------------------------------------------
    cat.register(StreamSchema(
        group="default", name="sw", paths=(ev,), ts_column="ts",
        element_id_column="event_id",
        tags=tagspecs(STREAM_TAGS, family="searchable",
                      families={"data_binary": "data"}),
        entity=("service_id", "service_instance_id", "state"),
    ))
    cat.register(StreamSchema(
        group="updated", name="sw", paths=(ev,), ts_column="ts",
        element_id_column="event_id",
        tags=tagspecs(STREAM_UPDATED_TAGS, family="searchable",
                      families={"data_binary": "data"}),
        entity=("service_id", "service_instance_id", "state"),
    ))
    for nm in ("duplicated", "deduplication_test"):
        cat.register(StreamSchema(
            group="default", name=nm, paths=(ev,), ts_column="ts",
            element_id_column="event_id",
            tags=tagspecs(DUP_STREAM_TAGS, family="searchable",
                      families={"data_binary": "data"}),
            entity=("service_id", "service_instance_id", "state"),
        ))

    # ---- measures ----------------------------------------------------
    def m(group, name, tags, fields, entity, families=None, **kw):
        cat.register(MeasureSchema(
            group=group, name=name, paths=(ev,), ts_column="ts",
            tags=tagspecs(tags, families=families), fields=fields,
            entity=entity,
            version_column=kw.pop("version_column", "event_id"),
            **kw,
        ))

    m("sw_metric", "service_cpm_minute", CPM_TAGS, _F_TOTAL_VALUE,
      ("entity_id",), interval="1 minute")
    m("sw_updated", "service_cpm_minute", CPM_UPDATED_TAGS,
      (FieldSpec("total", "FLOAT", expr=_TOTAL),
       FieldSpec("extra_field", "STRING",
                 expr="concat('f', CAST(user_id % 3 AS STRING))")),
      ("entity_id",))
    m("sw_metric", "service_latency_minute", SLM_TAGS, _F_TOTAL_VALUE,
      ("entity_id",), families={"entity_id": "storage_only"})
    m("sw_metric", "service_instance_latency_minute", SILM_TAGS,
      (FieldSpec("value", "FLOAT"),), ("entity_id",))
    m("sw_metric", "instance_clr_cpu_minute", CLR_TAGS,
      (FieldSpec("summation", "FLOAT", expr="value * 3"),
       FieldSpec("count", "INT",
                 expr="CAST(floor(value) AS BIGINT) % 7 + 1"),
       FieldSpec("value", "FLOAT")), ("entity_id",))
    m("sw_metric", "service_instance_float_metric", SIFM_TAGS,
      _F_TOTAL_VALUE, ("service_id", "entity_id"))
    for grp in ("sw_metric", "sw_updated"):
        m(grp, "service_instance_cpm_minute", SICM_TAGS, _F_TOTAL_VALUE,
          ("service_id", "entity_id"))
    m("sw_metric", "service_instance_endpoint_cpm_minute", SIECM_TAGS,
      _F_TOTAL_VALUE, ("service_id", "entity_id"))
    m("sw_metric", "endpoint_resp_time_minute", ERTM_TAGS,
      (FieldSpec("value", "FLOAT"),), ("entity_id",))
    m("sw_metric", "service_instance_metric_topn_test", SIMTT_TAGS,
      (FieldSpec("value", "FLOAT"),), ("service_id",))
    m("sw_metric", "service_instance_traffic", SIT_TAGS, (), ("id",))
    m("sw_metric", "endpoint_traffic", ET_TAGS, (),
      ("service_id", "endpoint_name"))
    m("exception", "duplicated", CPM_TAGS, _F_TOTAL_VALUE, ("entity_id",))
    for grp in ("index_mode", "replicated_group"):
        m(grp, "service_traffic", TRAFFIC_TAGS, (), ("id",),
          index_mode=True, version_column=None)

    # ---- topn declarations (topn_aggregations/*.json, verbatim) ------
    def topn(group, name, src, field, keys, criteria=None):
        cat.register(TopNAggregationSchema(
            group=group, name=name, source_measure=(group, src),
            field_name=field, group_by_tags=keys, criteria=criteria,
        ))

    topn("sw_metric", "service_instance_cpm_minute_top_bottom_100",
         "service_instance_cpm_minute", "value", ("service_id",))
    topn("sw_updated", "service_instance_cpm_minute_top_bottom_100",
         "service_instance_cpm_minute", "value", ("service_id",))
    topn("sw_metric", "endpoint_resp_time_minute_top_bottom_100",
         "endpoint_resp_time_minute", "value", ("entity_id",))
    topn("sw_metric", "service_instance_float_metric_top_bottom_3",
         "service_instance_float_metric", "value",
         ("service_id", "entity_id"))
    topn("sw_metric", "service_instance_endpoint_cpm_minute_top_bottom_100",
         "service_instance_endpoint_cpm_minute", "total", ("http.uri",))
    topn("sw_metric", "topn_agg_test",
         "service_instance_metric_topn_test", "value", ("service_id",))
    topn("sw_metric", "eq_svc1", "service_instance_endpoint_cpm_minute",
         "total", ("http.uri",),
         criteria=cond("service_id", BinaryOp.EQ, "svc_1"))
    topn("sw_metric", "ne_svc1", "service_instance_endpoint_cpm_minute",
         "total", ("http.uri",),
         criteria=cond("service_id", BinaryOp.NE, "svc_1"))
    topn("sw_metric", "in_svc2_svc4", "service_instance_endpoint_cpm_minute",
         "total", ("http.uri",),
         criteria=cond("service_id", BinaryOp.IN, ["svc_2", "svc_4"]))
    topn("sw_metric", "not_in_svc2_svc4",
         "service_instance_endpoint_cpm_minute", "total", ("http.uri",),
         criteria=cond("service_id", BinaryOp.NOT_IN, ["svc_2", "svc_4"]))

    # ---- traces --------------------------------------------------------
    cat.register(TraceSchema(
        group="test-trace-group", name="sw", paths=(ev,), ts_column="ts",
        trace_id_column="trace_id", span_id_column="span_id",
        span_column="props", tags=tagspecs(TRACE_TAGS),
        ts_tag_alias="timestamp",   # sw.json timestamp_tag_name
    ))
    cat.register(TraceSchema(
        group="test-trace-updated", name="sw", paths=(ev,), ts_column="ts",
        trace_id_column="trace_id", span_id_column="span_id",
        span_column="props", tags=tagspecs(TRACE_UPDATED_TAGS),
        ts_tag_alias="timestamp",
    ))
    cat.register(TraceSchema(
        group="zipkinTrace", name="zipkin", paths=(ev,), ts_column="ts",
        trace_id_column="trace_id", span_id_column="span_id",
        span_column="props", tags=tagspecs(ZIPKIN_TAGS),
        # index rule zipkin-timestamp.json names the time sidx
        ts_tag_alias="zipkin-timestamp",
    ))

    # ---- property ------------------------------------------------------
    cat.register(PropertySchema(
        group="sw", name="ui_menu", paths=(docs,), id_column="prop_id",
        tags=tagspecs(UIMENU_TAGS),
    ))
    return cat


def build_views(con, sf_dir: str) -> None:
    """Create every oracle view on a DuckDB connection."""
    con.execute(view_sql("v_sw", STREAM_TAGS, sf_dir))
    con.execute(view_sql("v_sw_upd", STREAM_UPDATED_TAGS, sf_dir))
    con.execute(view_sql("v_dup", DUP_STREAM_TAGS, sf_dir))
    con.execute(view_sql("v_cpm", CPM_TAGS, sf_dir,
                         extra=f', {_TOTAL} AS "total"'))
    con.execute(view_sql(
        "v_cpm_upd", CPM_UPDATED_TAGS, sf_dir,
        extra=(f', {_TOTAL} AS "total", '
               "concat('f', CAST(user_id % 3 AS STRING)) AS \"extra_field\"")))
    con.execute(view_sql("v_slm", SLM_TAGS, sf_dir,
                         extra=f', {_TOTAL} AS "total"'))
    con.execute(view_sql("v_silm", SILM_TAGS, sf_dir))
    con.execute(view_sql(
        "v_clr", CLR_TAGS, sf_dir,
        extra=(', value * 3 AS "summation", '
               'CAST(floor(value) AS BIGINT) % 7 + 1 AS "count"')))
    con.execute(view_sql("v_sifm", SIFM_TAGS, sf_dir,
                         extra=f', {_TOTAL} AS "total"'))
    con.execute(view_sql("v_sicm", SICM_TAGS, sf_dir,
                         extra=f', {_TOTAL} AS "total"'))
    con.execute(view_sql("v_siecm", SIECM_TAGS, sf_dir,
                         extra=f', {_TOTAL} AS "total"'))
    con.execute(view_sql("v_ertm", ERTM_TAGS, sf_dir))
    con.execute(view_sql("v_simtt", SIMTT_TAGS, sf_dir))
    con.execute(view_sql("v_sit", SIT_TAGS, sf_dir))
    con.execute(view_sql("v_et", ET_TAGS, sf_dir))
    con.execute(view_sql("v_traffic", TRAFFIC_TAGS, sf_dir))
    con.execute(view_sql("v_swt", TRACE_TAGS, sf_dir))
    con.execute(view_sql("v_swt_upd", TRACE_UPDATED_TAGS, sf_dir))
    con.execute(view_sql("v_zipkin", ZIPKIN_TAGS, sf_dir))
    con.execute(view_sql("v_uimenu", UIMENU_TAGS, sf_dir,
                         table="documents"))
