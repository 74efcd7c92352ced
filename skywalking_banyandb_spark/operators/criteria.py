"""Criteria tree -> Catalyst Column compiler.

Reference semantics: ``model/v1/query.proto:47-101`` (ops), evaluation
``pkg/query/logical/tag_filter.go:73-609`` and ``expr_literal.go``; MATCH
query build ``pkg/index/inverted/query.go:84-198``. Two behaviors the golden
corpus pins down (``test/cases/measure/measure.go``):

- a condition on a tag that is NOT in the declared schema is an analyze-time
  **error** (``filter_non_existent_tag`` WantErr), while a condition that
  matches nothing is just an **empty** result;
- HAVING on an array tag means "contains ALL of the listed values".

Everything compiles to built-in Catalyst expressions — predicates stay inside
whole-stage codegen and push down to the parquet scan where eligible
(EQ/NE/LT/.../IN reach ``PushedFilters``; MATCH/HAVING evaluate post-scan,
exactly like the reference's post-scan tag filter
``stream_plan_tag_filter.go``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..errors import QueryAnalyzeError
from ..functions.analyzers import analyze_term, tokens
from ..model import BinaryOp, Condition, Criteria, CriteriaNode, LogicalOp


def _as_list(value: Any) -> Sequence[Any]:
    if value is None:
        return []
    if isinstance(value, (list, tuple)):
        return list(value)
    return [value]


def qcol(name: str) -> Column:
    """Column reference that tolerates dotted tag names (SkyWalking tags
    like ``http.method`` / ``db.instance`` are legal BanyanDB tag names;
    unquoted, Catalyst would parse the dot as struct-field access)."""
    if "." in name:
        return F.col("`" + name + "`")
    return F.col(name)


def compile_condition(
    c: Condition,
    schema_tags: Dict[str, Optional[str]],
    tag_types: Optional[Dict[str, str]] = None,
) -> Column:
    """Compile one condition. ``schema_tags`` maps known tag/field name ->
    analyzer (or None); ``tag_types`` (optional) maps name -> declared
    BanyanDB type for op/type validation."""
    if c.tag not in schema_tags:
        raise QueryAnalyzeError(f"filter references unknown tag {c.tag!r}")
    col = qcol(c.tag)
    op = c.op
    ttype = (tag_types or {}).get(c.tag)

    # op/type legality (tag_filter.go:174-189; golden cases
    # gen_err_in_scalar / gen_err_match_int are WantErr)
    if op in (BinaryOp.IN, BinaryOp.NOT_IN) and ttype in (
        "STRING_ARRAY", "INT_ARRAY",
    ):
        raise QueryAnalyzeError(
            f"{'not in' if op is BinaryOp.NOT_IN else 'in'} condition is "
            f"not supported for array type (tag {c.tag!r})"
        )
    if op is BinaryOp.MATCH and ttype not in (None, "STRING", "STRING_ARRAY"):
        raise QueryAnalyzeError(
            f"match condition requires an analyzed string tag, "
            f"{c.tag!r} is {ttype}"
        )
    if op in (BinaryOp.HAVING, BinaryOp.NOT_HAVING) and ttype not in (
        None, "STRING_ARRAY", "INT_ARRAY",
    ):
        raise QueryAnalyzeError(
            f"having condition requires an array tag, {c.tag!r} is {ttype}"
        )

    # ordered comparisons need a concrete operand; a null/empty value is an
    # analyze-time error (golden stream gen_err_{lt,le,gt,ge}_state feed
    # ``int: {}`` and the reference rejects the request)
    if op in (BinaryOp.LT, BinaryOp.GT, BinaryOp.LE, BinaryOp.GE) and c.value is None:
        raise QueryAnalyzeError(
            f"{op.name} requires a non-null operand (tag {c.tag!r})"
        )
    if op is BinaryOp.EQ:
        return col.isNull() if c.value is None else (col == F.lit(c.value))
    if op is BinaryOp.NE:
        return col.isNotNull() if c.value is None else (col != F.lit(c.value))
    if op is BinaryOp.LT:
        return col < F.lit(c.value)
    if op is BinaryOp.GT:
        return col > F.lit(c.value)
    if op is BinaryOp.LE:
        return col <= F.lit(c.value)
    if op is BinaryOp.GE:
        return col >= F.lit(c.value)
    if op in (BinaryOp.IN, BinaryOp.NOT_IN):
        # scalar operand is an analyze-time error (golden gen_err_in_scalar)
        if not isinstance(c.value, (list, tuple)):
            raise QueryAnalyzeError(
                f"{op.name} requires an array operand, got {c.value!r}"
            )
        if op is BinaryOp.IN:
            return col.isin(*list(c.value))
        return ~col.isin(*list(c.value))
    if op is BinaryOp.HAVING:
        # array tag contains ALL listed values (tag_filter.go havingTag)
        wanted = F.array(*[F.lit(v) for v in _as_list(c.value)])
        return F.size(F.array_except(wanted, col)) == 0
    if op is BinaryOp.NOT_HAVING:
        wanted = F.array(*[F.lit(v) for v in _as_list(c.value)])
        return F.size(F.array_except(wanted, col)) > 0
    if op is BinaryOp.MATCH:
        # MATCH requires an analyzed index: the tag's declared analyzer or a
        # condition-level override. A MATCH against a non-analyzed tag is an
        # analyze-time error (golden gen_err_match_trace_id /
        # gen_err_match_sw; pkg/index/inverted analyzer resolution).
        analyzer = c.match_analyzer or schema_tags.get(c.tag)
        if analyzer is None:
            raise QueryAnalyzeError(
                f"match condition requires an analyzed tag; {c.tag!r} has "
                f"no analyzer and the condition declares none"
            )
        toks = tokens(col, analyzer)
        terms: list[str] = []
        for v in _as_list(c.value):
            terms.extend(analyze_term(str(v), analyzer))
        if not terms:
            return F.lit(False)
        preds = [F.array_contains(toks, t) for t in terms]
        out = preds[0]
        for p in preds[1:]:
            out = (out & p) if c.match_operator is LogicalOp.AND else (out | p)
        return out
    raise QueryAnalyzeError(f"unsupported op {op}")


def conditions_of(node: Optional[CriteriaNode]):
    """Yield every leaf Condition in the criteria tree (for analyze-time
    validation passes, e.g. the entity-tag op restriction)."""
    if node is None:
        return
    if isinstance(node, Condition):
        yield node
        return
    if isinstance(node, Criteria):
        yield from conditions_of(node.left)
        yield from conditions_of(node.right)


def criteria_tags(node: Optional[CriteriaNode]) -> set:
    """Tags referenced anywhere in the criteria tree (for scan-side column
    pruning — the reference's hidden-tag projection, ``hidden_tags.go``)."""
    if node is None:
        return set()
    if isinstance(node, Condition):
        return {node.tag}
    return criteria_tags(node.left) | criteria_tags(node.right)


def compile_criteria(
    node: Optional[CriteriaNode],
    schema_tags: Dict[str, Optional[str]],
    tag_types: Optional[Dict[str, str]] = None,
) -> Optional[Column]:
    """Compile the AND/OR tree; ``None`` criteria -> no filter."""
    if node is None:
        return None
    if isinstance(node, Condition):
        return compile_condition(node, schema_tags, tag_types)
    if isinstance(node, Criteria):
        # a logical node missing either child is malformed — analyze-time
        # error, matching golden case err_invalid_le (WantErr)
        if node.left is None or node.right is None:
            raise QueryAnalyzeError("invalid logical expression: operator "
                                    f"{node.op.name} requires two operands")
        left = compile_criteria(node.left, schema_tags, tag_types)
        right = compile_criteria(node.right, schema_tags, tag_types)
        return (left & right) if node.op is LogicalOp.AND else (left | right)
    raise QueryAnalyzeError(f"bad criteria node {node!r}")


def types_of(schema) -> Dict[str, str]:
    """Declared tag/field types of any resource schema, for
    :func:`compile_condition` op/type validation."""
    out: Dict[str, str] = {}
    for t in getattr(schema, "tags", ()):
        out[t.name] = t.type
    for f in getattr(schema, "fields", ()):
        out[f.name] = f.type
    return out
