"""Driver-contract shape: every queries() entry has a DuckDB-parseable
oracle, keys match, and entry() is wired to a registered query. Cheap (no
Spark jobs) — catches oracle SQL typos/binding errors before the driver
does."""

from __future__ import annotations

import duckdb

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def test_registry_shape():
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 45
    # full oracle coverage — no rows-only entries left
    assert set(oracles) == set(qs)
    assert all(callable(f) for f in qs.values())


def test_every_oracle_parses_and_binds_in_duckdb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create or replace view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )
    for name, sql in entry.oracle_sql().items():
        try:
            con.sql("EXPLAIN " + sql)
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"oracle SQL for {name} fails: {exc}") from exc
