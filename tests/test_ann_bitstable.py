"""Bit-stability of the unrounded ANN ranking (VERDICT r4 wrong #4).

Since round 5 every ANN ordering decision — probe selection, centroid
assignment, PQ encode, final rank — compares the UNROUNDED cosine/sqdist.
That is only sound if the raw doubles are bit-identical across the three
computers involved (Spark's ``aggregate`` left fold, Python's sequential
``sum``, DuckDB's ``list_dot_product``/``list_sum``). These tests prove it
corpus-wide and pin the two preconditions:

- DuckDB literal parsing: a bare decimal numeral is typed DECIMAL and then
  converted (double rounding!); ``_sql_double_array`` must string-cast so
  the correctly-rounded strtod path is used.
- Sequential accumulation: all three engines fold left-to-right, so the
  same input doubles give the same output bits.

With bit-identity, rounding can no longer decide which ROWS a query
returns — ``round6`` is display-only, and a 6th-decimal half-way boundary
cannot flip an ``ann_*`` driver row.
"""

from __future__ import annotations

import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from skywalking_banyandb_spark.functions.similarity import (
    _dot,
    _sql_double_array,
    cosine_raw_sql,
    round6,
)
from skywalking_banyandb_spark.sources.parquet import read_table

from conftest import SF_SMALL


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def test_raw_cosine_bit_identical_spark_duckdb_python(spark):
    """Every vector's raw cosine against the vec_id=0 query is bit-equal
    across Spark, DuckDB and the driver-side Python fold."""
    emb = read_table(spark, f"{SF_SMALL}/embeddings.parquet")
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).select("embedding").head()[0]]
    qlit = F.array(*[F.lit(x) for x in q])
    a = F.col("embedding").cast("array<double>")
    raw = _dot(a, qlit) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(qlit, qlit)))
    srows = {r.vec_id: r.s for r in
             emb.select("vec_id", raw.alias("s")).collect()}

    con = duckdb.connect()
    qsql = _sql_double_array(q)
    orows = dict(con.execute(
        f"SELECT vec_id, {cosine_raw_sql('embedding', qsql)} "
        f"FROM '{SF_SMALL}/embeddings.parquet'").fetchall())
    assert set(srows) == set(orows)
    mism = [v for v in srows if _bits(srows[v]) != _bits(orows[v])]
    assert not mism, f"{len(mism)} Spark-vs-DuckDB bit mismatches: {mism[:5]}"

    # Python sequential fold (the driver-side probe ranking) — same bits
    vecs = {r.vec_id: [float(x) for x in r.embedding]
            for r in emb.select("vec_id", "embedding").collect()}
    import math
    qn = math.sqrt(sum(x * x for x in q))
    pymism = []
    for vid, v in vecs.items():
        py = (sum(a_ * b_ for a_, b_ in zip(v, q))
              / (math.sqrt(sum(x * x for x in v)) * qn))
        if _bits(py) != _bits(srows[vid]):
            pymism.append(vid)
    assert not pymism, f"{len(pymism)} Python-vs-Spark bit mismatches"


def test_bare_numeral_literals_would_double_round():
    """Regression pin for WHY string-cast literals are required: a bare
    numeral inside a list literal is typed by unifying all elements into a
    common DECIMAL — once any element forces width > 18 digits the hugeint
    DECIMAL→DOUBLE conversion double-rounds and shifts values by an ulp
    (17/64 components of a real corpus vector). The quoted-string cast
    round-trips repr() exactly regardless of the neighbors."""
    x = -0.1441325545310974          # corpus component that shifts an ulp
    wide = 0.00010507983097340912    # forces the common type to DECIMAL(21,20)
    con = duckdb.connect()
    bare = con.execute(
        f"SELECT ([{x!r}, {wide!r}]::DOUBLE[])[1]").fetchone()[0]
    quoted = con.execute(
        f"SELECT ({_sql_double_array([x, wide])})[1]").fetchone()[0]
    assert _bits(quoted) == _bits(x)
    assert _bits(bare) != _bits(x), (
        "DuckDB now parses bare numeral lists exactly — _sql_double_array's "
        "string-cast is no longer load-bearing (fine, but re-verify)")
    assert "'" in _sql_double_array([x])


def test_halfway_boundary_cannot_flip_ranking():
    """Ordering by the unrounded value with id tie-break is stable at a
    constructed 6dp half-way boundary, where HALF_UP (Python/Spark decimal
    rendering) and binary-value rounding (DuckDB) could disagree on the
    DISPLAYED score. The rank no longer consults the rounded value at all."""
    import math

    b = 0.1234565  # a 6dp half-way boundary rendering
    lo = math.nextafter(b, -math.inf)
    hi = math.nextafter(b, math.inf)
    # the three values straddle the boundary within one ulp — exactly the
    # regime where HALF_UP-on-rendering vs binary rounding can disagree
    assert round6(lo) != round6(hi)  # rounding splits the pair...
    ranked = sorted([(hi, 2), (b, 3), (lo, 1)], key=lambda t: (-t[0], t[1]))
    assert [i for _, i in ranked] == [2, 3, 1]
    # ...but the rank consults only the raw value: permuting the rounded
    # scores (as a disagreeing engine would) cannot reorder the candidates
    for rounded in ([0.123456] * 3, [0.123457] * 3,
                    [0.123457, 0.123456, 0.123457]):
        tagged = list(zip([hi, b, lo], [2, 3, 1], rounded))
        tagged.sort(key=lambda t: (-t[0], t[1]))
        assert [i for _, i, _ in tagged] == [2, 3, 1]


@pytest.mark.parametrize("n", [64])
def test_duckdb_list_sum_is_sequential_fold(n):
    """list_sum / list_dot_product accumulate left-to-right like Spark's
    ``aggregate`` and Python's ``sum`` — the precondition for cross-engine
    bit-identity of the sqdist/cosine folds."""
    import random

    rng = random.Random(11)
    con = duckdb.connect()
    for _ in range(25):
        xs = [rng.uniform(-1, 1) for _ in range(n)]
        lit = _sql_double_array(xs)
        acc = 0.0
        for x in xs:
            acc = acc + x
        got = con.execute(f"SELECT list_sum({lit})").fetchone()[0]
        assert _bits(got) == _bits(acc)
        acc2 = 0.0
        for x in xs:
            acc2 = acc2 + x * x
        got2 = con.execute(f"SELECT list_dot_product({lit}, {lit})").fetchone()[0]
        assert _bits(got2) == _bits(acc2)


def test_double_array_lit_bit_identical_to_lit(spark):
    """r6: _double_array_lit (one parsed SQL literal instead of per-element
    py4j lit() calls) must restore the IDENTICAL double bits — repr() is
    the shortest round-trip form and Double.parseDouble inverts it
    exactly. Ordering stability of every ANN probe depends on this."""
    import random
    import struct

    from pyspark.sql import functions as F

    from skywalking_banyandb_spark.sources.ann_index import _double_array_lit

    random.seed(101)
    vals = ([random.uniform(-1, 1) for _ in range(256)]
            + [0.1, -0.3333333333333333, 1e-300, 2**-1074, 1.0, -0.0])
    row = spark.range(1).select(
        F.array(*[F.lit(float(v)) for v in vals]).alias("a"),
        _double_array_lit(vals).alias("b"),
    ).head()
    pack = lambda xs: [struct.pack(">d", x) for x in xs]  # noqa: E731
    assert pack(row.a) == pack(row.b)


def test_double_array_lit_nonfinite_spellings(spark):
    """ADVICE r6: Python repr gives 'inf'/'nan', which Spark's
    string->double CAST does not parse (it wants 'Infinity'/'NaN') —
    before the fix non-finite query-vector elements silently became NULL
    and nulled the cosine instead of propagating."""
    import math
    import struct

    from pyspark.sql import functions as F

    from skywalking_banyandb_spark.sources.ann_index import _double_array_lit

    vals = [float("inf"), float("-inf"), float("nan"), 1.5, -0.0]
    row = spark.range(1).select(_double_array_lit(vals).alias("b")).head()
    assert row.b is not None and all(v is not None for v in row.b)
    assert row.b[0] == math.inf and row.b[1] == -math.inf
    assert math.isnan(row.b[2])
    assert struct.pack(">d", row.b[4]) == struct.pack(">d", -0.0)
