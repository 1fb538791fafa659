"""Guard: every registered DuckDB oracle must parse and bind against the
test tables. EXPLAIN only (no execution), so the whole surface checks in
seconds — a syntax or column-name typo in an oracle surfaces here instead
of as a driver-gate failure a round later. No Spark session needed."""

from __future__ import annotations

import duckdb
import pytest

from pyrope_spark.catalog import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_every_oracle_explains(con):
    import pyrope_spark.queries as Q

    oracles = Q.oracle_sql()
    assert len(oracles) >= 90
    bad = {}
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad[name] = str(e)[:200]
    assert not bad, bad


def test_registry_names_unique_and_wellformed(con):
    import pyrope_spark.queries as Q

    qs = Q.queries()
    assert len(qs) == len(set(qs))
    for name in qs:
        assert name == name.lower() and " " not in name, name
