"""Text-analysis operators for training-data pipelines (BASELINE.json scope:
language-ID, quality scoring, token counting, document fingerprinting).

Everything is built from JVM-side Catalyst expressions (regex, array lambdas,
md5) — no Python UDFs in the hot path — so each operator whole-stage-codegens
and scales linearly with input splits. Every function has an exact DuckDB-SQL
twin (returned by the ``*_sql`` helpers) so the driver's oracle can verify it;
portability rules: md5 for hashing (identical hex in both engines), integer
arithmetic for bit tricks, ``round(x, 6)`` wherever double op-order could
differ.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analyzers import tokens, tokens_sql

# BPE-ish pretokenizer: letter runs | digit runs | single non-space symbol.
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9 ]"

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

# language marker words -> deterministic n-gram-style heuristic
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
    "es": ("el", "y", "los"),
}
_LANG_ORDER = ("en", "de", "fr", "es")  # tie-break priority


def token_count(col: Column) -> Column:
    """Whitespace/alnum token count (standard analyzer)."""
    return F.size(tokens(col, "standard"))


def token_count_sql(expr: str) -> str:
    return f"len({tokens_sql(expr, 'standard')})"


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count via the pretokenizer regex."""
    return F.regexp_count(F.lower(col), F.lit(BPE_RE))


def bpe_token_count_sql(expr: str) -> str:
    return f"len(regexp_extract_all(lower({expr}), '{BPE_RE}'))"


def _stop_count(col: Column) -> Column:
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(col, "standard"), lambda t: F.array_contains(stops, t)))


def quality_score(col: Column) -> Column:
    """Deterministic quality heuristic in [0, 1]:
    0.5*stopword_ratio + 0.3*min(1, n_tokens/100) + 0.2*(1 - punct_ratio).
    """
    n_tok = token_count(col).cast("double")
    stop_ratio = F.when(n_tok > 0, _stop_count(col) / n_tok).otherwise(F.lit(0.0))
    tok_score = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    punct = F.regexp_count(col, F.lit(r"[^A-Za-z0-9 ]")).cast("double")
    punct_ratio = punct / F.greatest(F.length(col).cast("double"), F.lit(1.0))
    return F.round(
        F.lit(0.5) * stop_ratio + F.lit(0.3) * tok_score + F.lit(0.2) * (F.lit(1.0) - punct_ratio),
        6,
    )


def quality_score_sql(expr: str) -> str:
    toks = tokens_sql(expr, "standard")
    stops = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    n_tok = f"CAST(len({toks}) AS DOUBLE)"
    stop_ratio = (
        f"CASE WHEN {n_tok} > 0 THEN "
        f"len(list_filter({toks}, t -> list_contains({stops}, t))) / {n_tok} "
        f"ELSE 0.0 END"
    )
    tok_score = f"least(1.0, {n_tok} / 100.0)"
    punct_ratio = (
        f"CAST(len(regexp_extract_all({expr}, '[^A-Za-z0-9 ]')) AS DOUBLE)"
        f" / greatest(CAST(length({expr}) AS DOUBLE), 1.0)"
    )
    return f"round(0.5*({stop_ratio}) + 0.3*({tok_score}) + 0.2*(1.0 - ({punct_ratio})), 6)"


def lang_id(col: Column) -> Column:
    """Marker-word language heuristic with fixed tie-break order."""
    toks = tokens(col, "standard")
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }
    expr = F.lit("und")
    # build the CASE chain back-to-front so earlier langs win ties
    for lang in reversed(_LANG_ORDER):
        others = [scores[o] for o in _LANG_ORDER if o != lang]
        cond = (scores[lang] > 0) & (scores[lang] >= F.greatest(*others))
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def lang_id_sql(expr: str) -> str:
    toks = tokens_sql(expr, "standard")
    score = {
        lang: f"len(list_intersect({toks}, [{', '.join(repr(m) for m in markers)}]))"
        for lang, markers in LANG_MARKERS.items()
    }
    clauses = []
    for lang in _LANG_ORDER:
        others = ", ".join(score[o] for o in _LANG_ORDER if o != lang)
        clauses.append(
            f"WHEN {score[lang]} > 0 AND {score[lang]} >= greatest({others}) THEN '{lang}'"
        )
    return "CASE " + " ".join(clauses) + " ELSE 'und' END"


def fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 over the normalized token stream — the
    rolling-hash dedup key (identical text modulo case/punct -> same print).
    """
    return F.md5(F.concat_ws(" ", tokens(col, "standard")))


def fingerprint_sql(expr: str) -> str:
    return f"md5(array_to_string({tokens_sql(expr, 'standard')}, ' '))"


# -- SimHash (16-bit, md5-derived, integer-exact in both engines) -----------

_HEX = "0123456789abcdef"


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash per document.

    Each token votes +1/-1 on 16 bits taken from the first 4 hex digits of
    its md5; a bit is set when the vote sum is positive. Integer arithmetic
    only -> bit-identical to the SQL twin. Explode + re-aggregate is a single
    shuffle on id_col; at 100 TB the same expression runs per-partition when
    the table is already id-partitioned.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col), "standard")).alias("tok")
    )
    h = F.md5(F.col("tok"))
    digits = [
        (F.instr(F.lit(_HEX), F.substring(h, k + 1, 1)) - 1) for k in range(4)
    ]
    votes = []
    for j in range(16):
        bit = (digits[j // 4].bitwiseAND(F.lit(1 << (j % 4))) > 0)
        votes.append(F.sum(F.when(bit, 1).otherwise(-1)).alias(f"s{j}"))
    summed = toks.groupBy(id_col).agg(*votes)
    sim = None
    for j in range(16):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else (sim + term)
    return summed.select(F.col(id_col), sim.cast("bigint").alias("simhash"))


def simhash16_sql(table: str, id_col: str, text_col: str) -> str:
    toks = tokens_sql(text_col, "standard")
    digit = lambda k: f"(strpos('{_HEX}', substring(md5(tok), {k + 1}, 1)) - 1)"
    votes = ", ".join(
        f"SUM(CASE WHEN ({digit(j // 4)} & {1 << (j % 4)}) > 0 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(16)
    )
    bits = " + ".join(f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(16))
    return (
        f"SELECT {id_col}, CAST({bits} AS BIGINT) AS simhash FROM ("
        f"  SELECT {id_col}, {votes} FROM ("
        f"    SELECT {id_col}, unnest({toks}) AS tok FROM {table}"
        f"  ) GROUP BY {id_col}"
        f")"
    )


# ---------------------------------------------------------------------------
# PII scrubbing — training pipelines redact emails / IPs / long digit runs
# before the corpus ships. Pure Catalyst regexp_replace chain (JVM-side, no
# UDF); the patterns are deliberately in the common subset of Java regex
# (Spark) and RE2 (DuckDB) so the oracle twin is exact.
# ---------------------------------------------------------------------------

_PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\d{7,}", "<NUM>"),
)


def pii_scrub(col: Column) -> Column:
    """Redact PII-shaped spans, applied in declaration order (email before
    IP before digit-run, so an IP inside an email is never double-hit)."""
    out = col
    for pat, repl in _PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_scrub_sql(expr: str) -> str:
    out = expr
    for pat, repl in _PII_PATTERNS:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out
