"""Full-text analyzers for MATCH — the engine's analogue of the reference's
bluge analyzers (``pkg/index/index.go:31-40``: standard / simple / keyword /
url; query build ``pkg/index/inverted/query.go:84-198``).

The reference tokenizes at *write* time into an inverted index; on Spark we
tokenize with built-in JVM expressions at *read* time (Catalyst codegens the
regex split; no Python UDF), and the MATCH predicate becomes array_contains
over the token array. At 100 TB one would materialize the token column at
ingest (a generated column) so the predicate can use a bloom filter / data
skipping — the expression below is the same either way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Token-split regexes per analyzer. Kept deliberately simple & portable so the
# DuckDB oracle can reproduce them with string_split_regex.
_ANALYZER_SPLIT = {
    # unicode word segmentation approximated by non-alphanumeric splits
    "standard": r"[^a-z0-9]+",
    # letters only (numbers are separators)
    "simple": r"[^a-z]+",
    # url: break on separators typical of URLs plus whitespace
    "url": r"[^a-z0-9]+",
}

ANALYZERS = ("standard", "simple", "keyword", "url")


def tokens(col: Column, analyzer: str = "standard") -> Column:
    """Token array for ``col`` under ``analyzer`` (empty tokens dropped)."""
    if analyzer == "keyword":
        return F.array(col)
    try:
        pat = _ANALYZER_SPLIT[analyzer]
    except KeyError:
        raise ValueError(f"unknown analyzer {analyzer!r} (want one of {ANALYZERS})")
    split = F.split(F.lower(col), pat)
    return F.filter(split, lambda x: x != F.lit(""))


def analyze_term(term: str, analyzer: str = "standard") -> list[str]:
    """Tokenize a query-side term the same way (driver-side, tiny)."""
    import re

    if analyzer == "keyword":
        return [term]
    try:
        pat = _ANALYZER_SPLIT[analyzer]
    except KeyError:
        raise ValueError(f"unknown analyzer {analyzer!r} (want one of {ANALYZERS})")
    return [t for t in re.split(pat, term.lower()) if t]


def tokens_sql(expr: str, analyzer: str = "standard") -> str:
    """DuckDB-SQL equivalent of :func:`tokens` (used by oracle queries)."""
    if analyzer == "keyword":
        return f"[{expr}]"
    pat = _ANALYZER_SPLIT[analyzer]
    return (
        f"list_filter(string_split_regex(lower({expr}), '{pat}'), x -> x <> '')"
    )


def tokens_spark_sql(expr: str, analyzer: str = "standard") -> str:
    """Spark-SQL string form of :func:`tokens` — for derived tags
    (``TagSpec.expr``), so the token expression stays single-sourced in
    ``_ANALYZER_SPLIT`` alongside the Column and DuckDB forms."""
    if analyzer == "keyword":
        return f"array({expr})"
    pat = _ANALYZER_SPLIT[analyzer]
    return f"filter(split(lower({expr}), '{pat}'), x -> x != '')"
