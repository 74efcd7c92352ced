"""BydbQL parser — lexer + recursive-descent grammar -> AST.

Re-implements (from the public spec, not the code) the reference's BydbQL
surface: ``pkg/bydbql/grammar.go:32-120`` and
``skills/bydbql/references/syntax.md``. Statement forms::

    SELECT <proj> FROM STREAM|MEASURE|TRACE|PROPERTY <name> IN <groups>
        [ON <stages> STAGES] [TIME <cond>] [WHERE <criteria>]
        [GROUP BY <tags>] [ORDER BY ...] [WITH QUERY_TRACE]
        [LIMIT n] [OFFSET n]
    SHOW TOP <n> FROM MEASURE <name> IN <groups> [ON <stages> STAGES]
        [TIME <cond>] [WHERE <conds>] [AGGREGATE BY <fn>]
        [ORDER BY ASC|DESC] [WITH QUERY_TRACE]

Keywords are case-insensitive; identifiers are case-sensitive, may be dotted
(``http.method``) or double-quoted; strings are single-quoted. AND binds
tighter than OR; parentheses override.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple, Union

from ..errors import QueryAnalyzeError
from ..model import (
    BinaryOp,
    Condition,
    Criteria,
    CriteriaNode,
    LogicalOp,
    Sort,
)


class BydbQLSyntaxError(QueryAnalyzeError):
    pass


# ---------------------------------------------------------------------------
# Lexer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>'(?:[^']|'')*')
  | (?P<qident>"[^"]*")
  | (?P<number>-?\d+(?:\.\d+)?)
  | (?P<dcolon>::)
  | (?P<op><=|>=|!=|=|<|>)
  | (?P<punct>[(),*])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_.\-*]*)
    """,
    re.VERBOSE,
)

# Positional-parameter marker: the binder pre-substitutes each ``?`` with a
# string literal carrying this prefix, so markers flow through the lexer
# like ordinary strings and are resolved by position at bind() time.
PARAM_MARK = "\x00param:"

KEYWORDS = {
    "SELECT", "SHOW", "TOP", "FROM", "IN", "ON", "STAGES", "TIME", "WHERE",
    "GROUP", "ORDER", "BY", "ASC", "DESC", "WITH", "QUERY_TRACE", "LIMIT",
    "OFFSET", "AND", "OR", "NOT", "HAVING", "MATCH", "BETWEEN", "NULL",
    "STREAM", "MEASURE", "TRACE", "PROPERTY", "AGGREGATE",
    "SUM", "MEAN", "AVG", "COUNT", "MAX", "MIN", "ID",
}


@dataclass(frozen=True)
class Tok:
    kind: str          # KW | IDENT | STRING | NUMBER | OP | PUNCT | DCOLON | EOF
    text: str
    pos: int


def tokenize(text: str) -> List[Tok]:
    out: List[Tok] = []
    i = 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise BydbQLSyntaxError(f"unexpected character {text[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        val = m.group()
        if kind == "ws":
            continue
        if kind == "string":
            out.append(Tok("STRING", val[1:-1].replace("''", "'"), m.start()))
        elif kind == "qident":
            out.append(Tok("IDENT", val[1:-1], m.start()))
        elif kind == "number":
            out.append(Tok("NUMBER", val, m.start()))
        elif kind == "dcolon":
            out.append(Tok("DCOLON", "::", m.start()))
        elif kind == "op":
            out.append(Tok("OP", val, m.start()))
        elif kind == "punct":
            out.append(Tok("PUNCT", val, m.start()))
        else:  # ident or keyword
            up = val.upper()
            out.append(Tok("KW" if up in KEYWORDS else "IDENT",
                           up if up in KEYWORDS else val, m.start()))
    out.append(Tok("EOF", "", len(text)))
    return out


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ProjItem:
    name: str
    hint: Optional[str] = None         # "TAG" | "FIELD"
    agg: Optional[str] = None          # SUM/MEAN/COUNT/MAX/MIN (AVG->MEAN)


@dataclass(frozen=True)
class TopProj:
    number: int
    field_name: str
    sort: Sort = Sort.DESC


@dataclass(frozen=True)
class TimeCond:
    op: str                            # = > < >= <= BETWEEN
    begin: Optional[str] = None
    end: Optional[str] = None


@dataclass(frozen=True)
class OrderClause:
    key: Optional[str]                 # None -> TIME / bare direction
    sort: Sort = Sort.ASC


@dataclass(frozen=True)
class SelectStmt:
    resource: str                      # STREAM|MEASURE|TRACE|PROPERTY
    name: str
    groups: Tuple[str, ...]
    stages: Tuple[str, ...] = ()
    projection: Union[str, Tuple[ProjItem, ...]] = "*"   # "*" | "()" | items
    top: Optional[TopProj] = None
    time: Optional[TimeCond] = None
    where: Optional[CriteriaNode] = None
    group_by: Tuple[str, ...] = ()
    # per-column ::TAG/::FIELD specifier of group_by (None = auto-resolve
    # against the projection, bydbql_test.go "GROUP BY with Type
    # Specifiers" / transformer.go convertGroupBy)
    group_by_hints: Tuple[Optional[str], ...] = ()
    order_by: Optional[OrderClause] = None
    query_trace: bool = False
    limit: Optional[int] = None
    offset: Optional[int] = None


@dataclass(frozen=True)
class ShowTopStmt:
    number: int
    name: str
    groups: Tuple[str, ...]
    stages: Tuple[str, ...] = ()
    time: Optional[TimeCond] = None
    where: Tuple[Condition, ...] = ()
    agg: Optional[str] = None
    sort: Sort = Sort.DESC
    query_trace: bool = False


Statement = Union[SelectStmt, ShowTopStmt]

_AGG_KWS = {"SUM", "MEAN", "AVG", "COUNT", "MAX", "MIN"}


class _Parser:
    def __init__(self, toks: List[Tok]):
        self.toks = toks
        self.i = 0

    # -- token helpers ------------------------------------------------------
    def peek(self, ahead: int = 0) -> Tok:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        if t.kind != "EOF":
            self.i += 1
        return t

    def accept_kw(self, *kws: str) -> Optional[Tok]:
        t = self.peek()
        if t.kind == "KW" and t.text in kws:
            return self.next()
        return None

    def expect_kw(self, *kws: str) -> Tok:
        t = self.accept_kw(*kws)
        if not t:
            got = self.peek()
            raise BydbQLSyntaxError(
                f"expected {'/'.join(kws)} at {got.pos}, got {got.text or 'EOF'!r}"
            )
        return t

    def expect_ident(self) -> str:
        t = self.peek()
        # unreserved keyword-looking identifiers (e.g. a tag named "count")
        if t.kind == "IDENT" or (t.kind == "KW" and t.text in _AGG_KWS | {"ID", "TIME"}):
            self.next()
            return t.text if t.kind == "IDENT" else t.text.lower()
        raise BydbQLSyntaxError(f"expected identifier at {t.pos}, got {t.text!r}")

    def expect_punct(self, ch: str) -> None:
        t = self.peek()
        if t.kind == "PUNCT" and t.text == ch:
            self.next()
            return
        raise BydbQLSyntaxError(f"expected {ch!r} at {t.pos}, got {t.text!r}")

    def accept_punct(self, ch: str) -> bool:
        t = self.peek()
        if t.kind == "PUNCT" and t.text == ch:
            self.next()
            return True
        return False

    def expect_number(self) -> str:
        t = self.peek()
        if t.kind == "NUMBER":
            self.next()
            return t.text
        raise BydbQLSyntaxError(f"expected number at {t.pos}, got {t.text!r}")

    def expect_count(self):
        """A count position (LIMIT / OFFSET / TOP n): a number, or a bound
        parameter marker (``LIMIT ?`` / ``SHOW TOP ?`` — the reference's
        params_bind golden cases bind these positions)."""
        t = self.peek()
        if t.kind == "STRING" and t.text.startswith(PARAM_MARK):
            self.next()
            return t.text
        return int(self.expect_number())

    # -- grammar ------------------------------------------------------------
    def statement(self) -> Statement:
        if self.accept_kw("SELECT"):
            stmt = self.select_stmt()
        elif self.accept_kw("SHOW"):
            stmt = self.show_top_stmt()
        else:
            t = self.peek()
            raise BydbQLSyntaxError(f"expected SELECT or SHOW at {t.pos}")
        t = self.peek()
        if t.kind != "EOF":
            raise BydbQLSyntaxError(f"unexpected trailing input at {t.pos}: {t.text!r}")
        return stmt

    def select_stmt(self) -> SelectStmt:
        projection, top = self.projection()
        self.expect_kw("FROM")
        resource = self.expect_kw("STREAM", "MEASURE", "TRACE", "PROPERTY").text
        name = self.expect_ident()
        self.expect_kw("IN")
        groups = self.group_list()
        stages = self.stages_clause()
        time = self.time_clause() if self.accept_kw("TIME") else None
        where = self.criteria() if self.accept_kw("WHERE") else None
        group_by: Tuple[str, ...] = ()
        group_by_hints: Tuple[Optional[str], ...] = ()
        if self.accept_kw("GROUP"):
            self.expect_kw("BY")
            items = [self.group_by_item()]
            while self.accept_punct(","):
                items.append(self.group_by_item())
            group_by = tuple(n for n, _ in items)
            group_by_hints = tuple(h for _, h in items)
        order_by = self.order_clause() if self.accept_kw("ORDER") else None
        query_trace = self.with_clause()
        limit = self.expect_count() if self.accept_kw("LIMIT") else None
        offset = self.expect_count() if self.accept_kw("OFFSET") else None
        return SelectStmt(
            resource=resource, name=name, groups=groups, stages=stages,
            projection=projection, top=top, time=time, where=where,
            group_by=group_by, group_by_hints=group_by_hints,
            order_by=order_by, query_trace=query_trace,
            limit=limit, offset=offset,
        )

    def group_by_item(self) -> Tuple[str, Optional[str]]:
        """GROUP BY column with optional ``::TAG``/``::FIELD`` specifier
        (grammar.go:97-101; bydbql_test.go "GROUP BY with Type
        Specifiers" — specifiers are case-insensitive, anything else
        after ``::`` is a syntax error)."""
        name = self.expect_ident()
        hint = None
        if self.peek().kind == "DCOLON":
            self.next()
            t2 = self.peek()
            if t2.kind in ("IDENT", "KW") and t2.text.upper() in ("TAG", "FIELD"):
                self.next()
                hint = t2.text.upper()
            else:
                raise BydbQLSyntaxError(
                    f"expected TAG or FIELD after :: at {t2.pos}")
        return name, hint

    def show_top_stmt(self) -> ShowTopStmt:
        self.expect_kw("TOP")
        number = self.expect_count()
        self.expect_kw("FROM")
        self.expect_kw("MEASURE")
        name = self.expect_ident()
        self.expect_kw("IN")
        groups = self.group_list()
        stages = self.stages_clause()
        time = self.time_clause() if self.accept_kw("TIME") else None
        conds: Tuple[Condition, ...] = ()
        if self.accept_kw("WHERE"):
            node = self.criteria()
            conds = tuple(_flatten_and(node))
        agg = None
        if self.accept_kw("AGGREGATE"):
            self.expect_kw("BY")
            agg = self.expect_kw(*_AGG_KWS).text
            if agg == "AVG":
                agg = "MEAN"
        sort = Sort.DESC
        if self.accept_kw("ORDER"):
            self.expect_kw("BY")
            sort = Sort.ASC if self.expect_kw("ASC", "DESC").text == "ASC" else Sort.DESC
        query_trace = self.with_clause()
        return ShowTopStmt(
            number=number, name=name, groups=groups, stages=stages, time=time,
            where=conds, agg=agg, sort=sort, query_trace=query_trace,
        )

    def projection(self) -> Tuple[Union[str, Tuple[ProjItem, ...]], Optional[TopProj]]:
        t = self.peek()
        if t.kind == "PUNCT" and t.text == "*":
            self.next()
            return "*", None
        if t.kind == "PUNCT" and t.text == "(":
            # `()` empty projection
            if self.peek(1).kind == "PUNCT" and self.peek(1).text == ")":
                self.next(); self.next()
                return "()", None
        if self.accept_kw("TOP"):
            number = self.expect_count()
            fname = self.expect_ident()
            sort = Sort.DESC
            if self.accept_kw("ASC"):
                sort = Sort.ASC
            elif self.accept_kw("DESC"):
                sort = Sort.DESC
            top = TopProj(number, fname, sort)
            items: List[ProjItem] = []
            while self.accept_punct(","):
                items.append(self.proj_item())
            return tuple(items), top
        items = [self.proj_item()]
        while self.accept_punct(","):
            items.append(self.proj_item())
        return tuple(items), None

    def proj_item(self) -> ProjItem:
        t = self.peek()
        if t.kind == "KW" and t.text in _AGG_KWS and \
                self.peek(1).kind == "PUNCT" and self.peek(1).text == "(":
            fn = self.next().text
            self.expect_punct("(")
            name = self.expect_ident()
            self.expect_punct(")")
            return ProjItem(name=name, agg="MEAN" if fn == "AVG" else fn)
        name = self.expect_ident()
        hint = None
        if self.peek().kind == "DCOLON":
            self.next()
            t2 = self.peek()
            if t2.kind in ("IDENT", "KW") and t2.text.upper() in ("TAG", "FIELD"):
                self.next()
                hint = t2.text.upper()
            else:
                raise BydbQLSyntaxError(f"expected TAG or FIELD after :: at {t2.pos}")
        return ProjItem(name=name, hint=hint)

    def group_list(self) -> Tuple[str, ...]:
        parens = self.accept_punct("(")
        names = [self.expect_ident()]
        while self.accept_punct(","):
            names.append(self.expect_ident())
        if parens:
            self.expect_punct(")")
        return tuple(names)

    def stages_clause(self) -> Tuple[str, ...]:
        if not self.accept_kw("ON"):
            return ()
        parens = self.accept_punct("(")
        names = [self.expect_ident()]
        while self.accept_punct(","):
            names.append(self.expect_ident())
        if parens:
            self.expect_punct(")")
        self.expect_kw("STAGES")
        return tuple(names)

    def time_clause(self) -> TimeCond:
        if self.accept_kw("BETWEEN"):
            b = self.peek()
            if b.kind != "STRING":
                raise BydbQLSyntaxError(f"expected timestamp string at {b.pos}")
            self.next()
            self.expect_kw("AND")
            e = self.peek()
            if e.kind != "STRING":
                raise BydbQLSyntaxError(f"expected timestamp string at {e.pos}")
            self.next()
            return TimeCond(op="BETWEEN", begin=b.text, end=e.text)
        t = self.peek()
        if t.kind != "OP":
            raise BydbQLSyntaxError(f"expected time operator at {t.pos}")
        self.next()
        v = self.peek()
        if v.kind != "STRING":
            raise BydbQLSyntaxError(f"expected timestamp string at {v.pos}")
        self.next()
        if t.text in (">", ">="):
            return TimeCond(op=t.text, begin=v.text)
        if t.text in ("<", "<="):
            return TimeCond(op=t.text, end=v.text)
        if t.text == "=":
            return TimeCond(op="=", begin=v.text, end=v.text)
        raise BydbQLSyntaxError(f"bad time operator {t.text!r} at {t.pos}")

    def order_clause(self) -> OrderClause:
        self.expect_kw("BY")
        if self.accept_kw("ASC"):
            return OrderClause(key=None, sort=Sort.ASC)
        if self.accept_kw("DESC"):
            return OrderClause(key=None, sort=Sort.DESC)
        if self.accept_kw("TIME"):
            key = None
        else:
            key = self.expect_ident()
        sort = Sort.ASC
        if self.accept_kw("DESC"):
            sort = Sort.DESC
        else:
            self.accept_kw("ASC")
        return OrderClause(key=key, sort=sort)

    def with_clause(self) -> bool:
        if self.accept_kw("WITH"):
            self.expect_kw("QUERY_TRACE")
            return True
        return False

    # -- criteria (OR lowest, AND tighter, parens highest) ------------------
    def criteria(self) -> CriteriaNode:
        node = self.and_expr()
        while self.accept_kw("OR"):
            node = Criteria(LogicalOp.OR, node, self.and_expr())
        return node

    def and_expr(self) -> CriteriaNode:
        node = self.unary_expr()
        while self.accept_kw("AND"):
            node = Criteria(LogicalOp.AND, node, self.unary_expr())
        return node

    def unary_expr(self) -> CriteriaNode:
        if self.accept_punct("("):
            node = self.criteria()
            self.expect_punct(")")
            return node
        return self.condition()

    def condition(self) -> Condition:
        tag = self.expect_ident()
        t = self.peek()
        if t.kind == "OP":
            self.next()
            value = self.value()
            op = {
                "=": BinaryOp.EQ, "!=": BinaryOp.NE, ">": BinaryOp.GT,
                "<": BinaryOp.LT, ">=": BinaryOp.GE, "<=": BinaryOp.LE,
            }[t.text]
            return Condition(tag=tag, op=op, value=value)
        if self.accept_kw("IN"):
            return Condition(tag=tag, op=BinaryOp.IN, value=self.value_list())
        if self.accept_kw("NOT"):
            if self.accept_kw("IN"):
                return Condition(tag=tag, op=BinaryOp.NOT_IN, value=self.value_list())
            self.expect_kw("HAVING")
            return Condition(tag=tag, op=BinaryOp.NOT_HAVING,
                             value=self.value_or_list())
        if self.accept_kw("HAVING"):
            return Condition(tag=tag, op=BinaryOp.HAVING, value=self.value_or_list())
        if self.accept_kw("MATCH"):
            return self.match_args(tag)
        raise BydbQLSyntaxError(f"expected condition operator at {t.pos}")

    def match_args(self, tag: str) -> Condition:
        self.expect_punct("(")
        t = self.peek()
        if t.kind == "PUNCT" and t.text == "(":
            values = self.value_list()
        else:
            values = [self.value()]
        analyzer = None
        operator = LogicalOp.OR
        if self.accept_punct(","):
            a = self.peek()
            if a.kind != "STRING":
                raise BydbQLSyntaxError(f"expected analyzer string at {a.pos}")
            self.next()
            if a.text.upper() in ("AND", "OR"):
                operator = LogicalOp(a.text.upper())
            else:
                analyzer = a.text
                if self.accept_punct(","):
                    o = self.peek()
                    if o.kind != "STRING" or o.text.upper() not in ("AND", "OR"):
                        raise BydbQLSyntaxError(f"expected 'AND' or 'OR' at {o.pos}")
                    self.next()
                    operator = LogicalOp(o.text.upper())
        self.expect_punct(")")
        return Condition(tag=tag, op=BinaryOp.MATCH, value=values,
                         match_analyzer=analyzer, match_operator=operator)

    def value(self) -> Any:
        t = self.peek()
        if t.kind == "STRING":
            self.next()
            return t.text
        if t.kind == "NUMBER":
            self.next()
            return float(t.text) if "." in t.text else int(t.text)
        if t.kind == "KW" and t.text == "NULL":
            self.next()
            return None
        raise BydbQLSyntaxError(f"expected value at {t.pos}, got {t.text!r}")

    def value_list(self) -> List[Any]:
        self.expect_punct("(")
        # IN () — the empty candidate set is grammatical and matches
        # nothing (conformance in_empty_span_ids.ql)
        if self.accept_punct(")"):
            return []
        vals = [self.value()]
        while self.accept_punct(","):
            vals.append(self.value())
        self.expect_punct(")")
        return vals

    def value_or_list(self) -> Any:
        t = self.peek()
        if t.kind == "PUNCT" and t.text == "(":
            return self.value_list()
        return [self.value()]


def _flatten_and(node: CriteriaNode) -> List[Condition]:
    """SHOW TOP WHERE allows only AND-ed simple conditions."""
    if isinstance(node, Condition):
        return [node]
    if isinstance(node, Criteria) and node.op is LogicalOp.AND:
        return _flatten_and(node.left) + _flatten_and(node.right)
    raise BydbQLSyntaxError("SHOW TOP WHERE supports only AND-combined conditions")


def parse(text: str) -> Statement:
    return _Parser(tokenize(text)).statement()
