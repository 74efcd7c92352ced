"""Oracle result-type sweep.

DuckDB promotes ``SUM`` over BIGINT to HUGEINT (int128).  Spark has no
128-bit integer type, so the driver's value-hash canonicalization treats
the column as a different type even when every value is identical — this
was the single red CORRECTNESS row of r8 (``embedding_kmeans_clusters``,
fixed by ``CAST(SUM(vec_id) AS BIGINT)``).  This sweep closes the class:
every ``oracle_sql()`` entry is DESCRIBE-bound in DuckDB (bind-only, no
execution, so it is cheap and needs no scratch fixtures for the common
case) and must not expose a HUGEINT column.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as em

from conftest import SF_SMALL

BASE_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in BASE_TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    yield c
    c.close()


def test_no_oracle_hugeint_columns(con):
    oracles = em.oracle_sql()
    described = 0
    offenders = []
    for name, sql in oracles.items():
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception:
            # Oracles over scratch fixtures (write round-trips, ANN index
            # sidecars) may not bind before their Spark half has run once
            # in this environment; the driver_sim sweep still covers them.
            continue
        described += 1
        offenders.extend(
            (name, r[0]) for r in rows if "HUGEINT" in str(r[1]).upper()
        )
    assert described >= 100, f"only {described} oracles bindable"
    assert not offenders, (
        "oracle columns typed HUGEINT (cast aggregates to BIGINT): "
        f"{offenders}"
    )
