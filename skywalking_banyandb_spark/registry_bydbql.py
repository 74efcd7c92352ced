"""Driver-contract entries that go through the BydbQL front end — the full
text -> parse -> transform -> compile -> execute path, oracle-checked.

Absolute RFC3339 times keep results deterministic (relative '-30m' literals
resolve against wall-clock ``now`` and cannot be oracle-paired).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bydbql.transformer import execute
from .catalog import default_catalog
from .registry import DEDUP, SUM6, register

_NOW = dt.datetime(2024, 2, 1)


def _ql(text: str):
    def fn(spark: SparkSession, sf: str) -> DataFrame:
        return execute(spark, default_catalog(sf), text, _NOW)

    return fn


register(
    "bydbql_measure_group_agg",
    _ql(
        "SELECT event_type, MEAN(value) FROM MEASURE metrics IN g1 "
        "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-27T00:00:00Z' "
        "WHERE user_id >= 2 GROUP BY event_type LIMIT 1000"
    ),
    f"""SELECT event_type, {SUM6.format(x='value')} / COUNT(value) AS value
        FROM {DEDUP} WHERE user_id >= 2 GROUP BY event_type""",
)


register(
    "bydbql_measure_scan_where",
    _ql(
        "SELECT user_id, event_type, value FROM MEASURE metrics IN g1 "
        "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-27T00:00:00Z' "
        "WHERE event_type IN ('error', 'signup') AND value <= 300 "
        "ORDER BY TIME ASC LIMIT 120 OFFSET 15"
    ),
    f"""SELECT ts, user_id, event_type, value FROM {DEDUP}
        WHERE event_type IN ('error', 'signup') AND value <= 300
        ORDER BY ts, user_id LIMIT 120 OFFSET 15""",
)


register(
    "bydbql_show_top",
    _ql(
        "SHOW TOP 5 FROM MEASURE metrics IN g1 "
        "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-08T00:00:00Z' "
        "AGGREGATE BY SUM ORDER BY DESC"
    ),
    f"""WITH latest AS (
          SELECT date_trunc('hour', ts) AS window_start, user_id, value FROM events
          QUALIFY row_number() OVER (
            PARTITION BY date_trunc('hour', ts), user_id
            ORDER BY ts DESC, event_id DESC) = 1
        ), ranked AS (
          SELECT window_start, user_id, value FROM latest
          QUALIFY row_number() OVER (
            PARTITION BY window_start ORDER BY value DESC, user_id) <= 5
        )
        SELECT user_id, {SUM6.format(x='value')} AS value FROM ranked
        WHERE window_start >= TIMESTAMP '2024-01-03 00:00:00'
          AND window_start <  TIMESTAMP '2024-01-08 00:00:00'
        GROUP BY user_id ORDER BY value DESC, user_id LIMIT 5""",
)


register(
    "bydbql_stream_orderby_tag",
    _ql(
        "SELECT user_id, event_type, value FROM STREAM event_log IN g1 "
        "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-27T00:00:00Z' "
        "WHERE event_type != 'view' ORDER BY value DESC LIMIT 80"
    ),
    """SELECT ts, event_id, user_id, event_type, value FROM events
       WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' AND ts < TIMESTAMP '2024-01-27 00:00:00'
         AND event_type <> 'view'
       ORDER BY value DESC, event_id LIMIT 80""",
)


register(
    "bydbql_property_match",
    _ql(
        "SELECT lang, n_chars FROM PROPERTY documents IN g1 "
        "WHERE text MATCH(('merge', 'scan'), 'standard', 'AND') AND lang = 'de' "
        "LIMIT 10000"
    ),
    """SELECT doc_id, lang, n_chars FROM documents
       WHERE list_contains(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''), 'merge')
         AND list_contains(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''), 'scan')
         AND lang = 'de'
       ORDER BY doc_id LIMIT 10000""",
)


register(
    "bydbql_trace_stats",
    (lambda text: lambda spark, sf: execute(
        spark, default_catalog(sf), text, _NOW
    ).select("trace_id", "span_count", "start_ts", "end_ts"))(
        "SELECT () FROM TRACE event_trace IN g1 "
        "TIME BETWEEN '2024-01-05T00:00:00Z' AND '2024-01-20T00:00:00Z' "
        "WHERE value > 300 LIMIT 5000"
    ),
    """SELECT user_id AS trace_id, COUNT(*) AS span_count,
              MIN(ts) AS start_ts, MAX(ts) AS end_ts
       FROM events
       WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
         AND value > 300
       GROUP BY user_id ORDER BY start_ts, trace_id LIMIT 5000""",
)


register(
    "bydbql_select_top",
    _ql(
        "SELECT TOP 10 value DESC, user_id FROM MEASURE metrics IN g1 "
        "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-27T00:00:00Z'"
    ),
    f"""SELECT ts, user_id, value FROM {DEDUP}
        ORDER BY value DESC, ts, user_id LIMIT 10""",
)


register(
    "bydbql_stream_select_top",
    _ql(
        "SELECT TOP 15 value ASC, user_id, event_type FROM STREAM event_log IN g1 "
        "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-27T00:00:00Z' "
        "WHERE event_type != 'view'"
    ),
    """SELECT ts, event_id, user_id, event_type, value FROM events
       WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
         AND ts <  TIMESTAMP '2024-01-27 00:00:00'
         AND event_type <> 'view'
       ORDER BY value ASC, event_id LIMIT 15""",
)


register(
    "bydbql_family_qualified_agg",
    _ql(
        "SELECT default.user_id, MAX(value) FROM MEASURE metrics IN g1 "
        "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-27T00:00:00Z' "
        "WHERE default.event_type != 'view' "
        "GROUP BY default.user_id LIMIT 100000"
    ),
    # family-qualified identifier paths (grammar.go:291-295) resolve to the
    # bare tag everywhere: projection, WHERE, GROUP BY
    f"""SELECT user_id, MAX(value) AS value FROM {DEDUP}
        WHERE event_type <> 'view' GROUP BY user_id""",
)


register(
    "bydbql_trace_orderby_duration",
    (lambda text: lambda spark, sf: execute(
        spark, default_catalog(sf), text, _NOW
    ).select("trace_id", "span_count", "start_ts", "end_ts"))(
        "SELECT () FROM TRACE event_trace IN g1 "
        "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-27T00:00:00Z' "
        "ORDER BY value DESC LIMIT 40"
    ),
    """SELECT user_id AS trace_id, COUNT(*) AS span_count,
              MIN(ts) AS start_ts, MAX(ts) AS end_ts
       FROM events
       WHERE ts >= TIMESTAMP '2024-01-03 00:00:00' AND ts < TIMESTAMP '2024-01-27 00:00:00'
       GROUP BY user_id ORDER BY MAX(value) DESC, trace_id LIMIT 40""",
)


def _ql_stream_having(spark: SparkSession, sf: str) -> DataFrame:
    df = execute(
        spark, default_catalog(sf),
        "SELECT user_id, props_tokens FROM STREAM event_log IN g1 "
        "TIME BETWEEN '2024-01-03T00:00:00Z' AND '2024-01-27T00:00:00Z' "
        "WHERE props_tokens HAVING ('k', '69') AND user_id = 14 LIMIT 200",
        _NOW)
    # Driver canonicalization: pandas sort cannot hash list values, so the
    # array tag is emitted space-joined (trace_spans_payload pattern). The
    # HAVING predicate above still runs on the real array column.
    return df.withColumn("props_tokens", F.array_join("props_tokens", " "))


register(
    "bydbql_stream_having",
    _ql_stream_having,
    # HAVING through the QL front end against the derived array tag
    # (grammar HAVING production; same semantics as stream_having_derived_tag)
    """SELECT ts, event_id, user_id,
              array_to_string(
                  list_filter(string_split_regex(lower(props), '[^a-z0-9]+'),
                              x -> x <> ''), ' ') AS props_tokens
       FROM events
       WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
         AND ts <  TIMESTAMP '2024-01-27 00:00:00'
         AND list_has_all(
               list_filter(string_split_regex(lower(props), '[^a-z0-9]+'),
                           x -> x <> ''), ['k', '69'])
         AND user_id = 14
       ORDER BY ts ASC, event_id ASC LIMIT 200""",
)
