"""O(len²) char-k-gram idiom lint (VERDICT r10 Next #7).

Catalyst re-evaluates OUTER expressions referenced inside a
higher-order-function lambda PER ELEMENT, and ``substr``-by-position on
a string rescans its UTF-8 bytes from the start — so
``transform(sequence(1, len), i -> substr(txt, i, k))`` is O(len²) per
row. Three instances of this class shipped and were fixed across
r9/r10 (winnow shingles, charlm trigrams, 3-gram shingles — each
measured 2-3x of the stage wall; see ``functions/dedup._shingles`` for
the zipped-slice replacement). The surviving legitimate
``transform(sequence(...))`` sites index ARRAY columns via
``element_at`` — O(1) per access — which this lint permits.

The lint scans the ENGINE source (not tests, not DuckDB oracle SQL —
DuckDB's list_transform has no such re-evaluation trap) for a
``transform( ... sequence(`` window that also contains ``substr``,
after stripping comments and docstrings (which legitimately DESCRIBE
the banned idiom next to its replacement).
"""

from __future__ import annotations

import ast
import glob
import io
import os
import re
import tokenize

ENGINE = os.path.join(os.path.dirname(__file__), "..",
                      "skywalking_banyandb_spark")

# transform( <anything, non-greedy> sequence(  — the HOF index-generator
# pair, in Python (F.transform(F.sequence(...)) ) or Spark-SQL-in-string
# (expr("transform(sequence(...), i -> ...)")) spelling
_PAIR = re.compile(r"transform\s*\(.{0,400}?sequence\s*\(", re.S)
_BAD = re.compile(r"substr", re.I)
_WINDOW = 600  # chars of lambda body to inspect after the match


def _stripped_source(path: str) -> str:
    """Source with comments and docstrings blanked (preserving offsets),
    so prose describing the banned idiom cannot trip the lint while
    string-embedded Spark SQL expressions still can."""
    src = open(path, encoding="utf-8").read()
    out = list(src)

    def blank(a: int, b: int) -> None:
        for i in range(a, b):
            if out[i] not in "\n":
                out[i] = " "

    # line offsets for (row, col) -> absolute position
    line_start = [0]
    for line in src.splitlines(keepends=True):
        line_start.append(line_start[-1] + len(line))

    def pos(row: int, col: int) -> int:
        return line_start[row - 1] + col

    for tok in tokenize.generate_tokens(io.StringIO(src).readline):
        if tok.type == tokenize.COMMENT:
            blank(pos(*tok.start), pos(*tok.end))

    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, (ast.Module, ast.ClassDef, ast.FunctionDef,
                             ast.AsyncFunctionDef)):
            body = getattr(node, "body", [])
            if body and isinstance(body[0], ast.Expr) and isinstance(
                    body[0].value, ast.Constant) and isinstance(
                    body[0].value.value, str):
                d = body[0].value
                blank(pos(d.lineno, d.col_offset),
                      pos(d.end_lineno, d.end_col_offset))
    return "".join(out)


def test_no_substr_inside_transform_sequence():
    offenders = []
    for path in sorted(glob.glob(f"{ENGINE}/**/*.py", recursive=True)):
        src = _stripped_source(path)
        for m in _PAIR.finditer(src):
            window = src[m.start():m.start() + _WINDOW]
            if _BAD.search(window):
                line = src[:m.start()].count("\n") + 1
                offenders.append(f"{os.path.relpath(path, ENGINE)}:{line}")
    assert not offenders, (
        "transform(sequence(...)) lambda touches substr — the O(len^2) "
        "char-k-gram idiom (re-fixed three times across r9/r10). Build "
        "k-grams by zipping the char/token array with its own F.slice "
        f"shifts instead (functions/dedup._shingles): {offenders}"
    )


def test_lint_catches_the_shipped_bug_shape():
    """The lint must FLAG the exact idiom that shipped (r9 winnow): a
    transform over sequence whose lambda substr-indexes the outer
    string — guard against the lint regressing to a no-op."""
    bad = (
        'F.transform(\n'
        '    F.sequence(F.lit(1), F.length(txt) - 2),\n'
        '    lambda i: F.substring(txt, i, 3),\n'
        ')\n'
    )
    assert _PAIR.search(bad) and _BAD.search(
        bad[_PAIR.search(bad).start():])
    sql_bad = 'F.expr("transform(sequence(1, len(t)), i -> substr(t, i, 3))")'
    m = _PAIR.search(sql_bad)
    assert m and _BAD.search(sql_bad[m.start():])
    good = (
        'F.transform(\n'
        '    F.sequence(F.lit(1), F.size("toks") - 1),\n'
        '    lambda i: F.element_at(F.col("toks"), i),\n'
        ')\n'
    )
    m = _PAIR.search(good)
    assert m and not _BAD.search(good[m.start():m.start() + _WINDOW])
