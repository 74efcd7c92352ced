"""Positional parameters, prepared statements, and the statement cache —
the analogue of the reference's ``pkg/bydbql/binder.go`` /
``prepared.go`` / liaison LRU cache (``banyand/liaison/grpc/
bydbql_cache.go``).

A statement may contain ``?`` placeholders wherever a *condition or time
value* is legal (condition values, IN/HAVING/MATCH list elements, TIME
literals). LIMIT/OFFSET take literal integers only, as in the reference.
``prepare()`` parses once; ``bind()`` substitutes parameters into the AST
without re-parsing — binding is by position, and binding a prepared
statement twice with different parameters yields independent ASTs (the
binder-equivalence contract: a bound statement behaves exactly like the
same statement with inline literals).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, replace
from functools import lru_cache
from typing import Any, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession

from ..catalog import Catalog
from ..errors import QueryAnalyzeError
from .parser import (
    Condition,
    Criteria,
    SelectStmt,
    ShowTopStmt,
    Statement,
    TimeCond,
    parse,
)


class _Param:
    """Placeholder sentinel carried through the AST."""

    __slots__ = ("index",)

    def __init__(self, index: int):
        self.index = index

    def __repr__(self) -> str:  # pragma: no cover
        return f"?{self.index}"


from .parser import PARAM_MARK as _PARAM_MARK


def _pre_substitute(text: str) -> Tuple[str, int]:
    """Replace each ``?`` outside string literals with a typed marker string
    literal the lexer can carry; returns (rewritten, count)."""
    out = []
    count = 0
    in_str = False
    i = 0
    while i < len(text):
        ch = text[i]
        if in_str:
            out.append(ch)
            if ch == "'":
                # handle '' escape
                if i + 1 < len(text) and text[i + 1] == "'":
                    out.append("'")
                    i += 1
                else:
                    in_str = False
        elif ch == "'":
            in_str = True
            out.append(ch)
        elif ch == "?":
            out.append(f"'{_PARAM_MARK}{count}'")
            count += 1
        else:
            out.append(ch)
        i += 1
    return "".join(out), count


def _is_param(v: Any) -> Optional[int]:
    if isinstance(v, str) and v.startswith(_PARAM_MARK):
        return int(v[len(_PARAM_MARK):])
    return None


def _bind_value(v: Any, params: Sequence[Any]) -> Any:
    idx = _is_param(v)
    if idx is not None:
        return params[idx]
    if isinstance(v, list):
        # an array bound into a list position (``id IN (?)``, the measure
        # params_bind golden case) splices rather than nests
        out = []
        for x in v:
            b = _bind_value(x, params)
            if _is_param(x) is not None and isinstance(b, (list, tuple)):
                out.extend(b)
            else:
                out.append(b)
        return out
    return v


def _bind_criteria(node, params):
    if node is None:
        return None
    if isinstance(node, Condition):
        return replace(node, value=_bind_value(node.value, params))
    return Criteria(node.op, _bind_criteria(node.left, params),
                    _bind_criteria(node.right, params))


def _bind_time(tc: Optional[TimeCond], params) -> Optional[TimeCond]:
    if tc is None:
        return None

    def one(v):
        if v is None:
            return None
        b = _bind_value(v, params)
        if isinstance(b, dt.datetime):
            return b.isoformat()
        return str(b)

    return TimeCond(op=tc.op, begin=one(tc.begin), end=one(tc.end))


@dataclass(frozen=True)
class Prepared:
    text: str
    ast: Statement
    n_params: int

    def bind(self, *params: Any) -> Statement:
        if len(params) != self.n_params:
            raise QueryAnalyzeError(
                f"statement expects {self.n_params} parameters, got {len(params)}"
            )
        def count(v):
            # LIMIT ? / OFFSET ? / TOP ? positions (params_bind golden .ql)
            idx = _is_param(v)
            return int(params[idx]) if idx is not None else v

        s = self.ast
        if isinstance(s, SelectStmt):
            top = s.top
            if top is not None and _is_param(top.number) is not None:
                top = replace(top, number=count(top.number))
            return replace(
                s,
                where=_bind_criteria(s.where, params),
                time=_bind_time(s.time, params),
                limit=count(s.limit),
                offset=count(s.offset),
                top=top,
            )
        assert isinstance(s, ShowTopStmt)
        return replace(
            s,
            number=count(s.number),
            where=tuple(_bind_criteria(c, params) for c in s.where),
            time=_bind_time(s.time, params),
        )


@lru_cache(maxsize=256)
def prepare(text: str) -> Prepared:
    """Parse once, cache by statement text (the liaison LRU cache analogue —
    repeated queries skip the parser entirely)."""
    rewritten, count = _pre_substitute(text)
    ast = parse(rewritten)
    return Prepared(text=text, ast=ast, n_params=count)


def execute_prepared(
    spark: SparkSession,
    catalog: Catalog,
    text: str,
    params: Sequence[Any] = (),
    now: Optional[dt.datetime] = None,
) -> DataFrame:
    from .transformer import to_query
    from .transformer import execute as _exec  # noqa: F401  (same dispatch)

    stmt = prepare(text).bind(*params)
    q = to_query(stmt, catalog, now)
    from ..model import (
        MeasureQuery,
        PropertyQuery,
        StreamQuery,
        TopNQuery,
        TraceQuery,
    )
    from ..plans.measure import compile_measure
    from ..plans.property import compile_property
    from ..plans.stream import compile_stream
    from ..plans.topn import compile_topn
    from ..plans.trace import compile_trace

    if isinstance(q, MeasureQuery):
        return compile_measure(spark, catalog, q)
    if isinstance(q, StreamQuery):
        return compile_stream(spark, catalog, q)
    if isinstance(q, TraceQuery):
        return compile_trace(spark, catalog, q)
    if isinstance(q, PropertyQuery):
        return compile_property(spark, catalog, q)
    if isinstance(q, TopNQuery):
        return compile_topn(spark, catalog, q)
    raise QueryAnalyzeError(f"cannot execute {type(q).__name__}")
