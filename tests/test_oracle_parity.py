"""Driver-style differential testing: every registered query with an oracle
runs on Spark and DuckDB and must match on row count, column names, and
order-insensitive canonical values (stricter than the driver: exact float
repr equality, surfacing any reduction-order drift before the driver sees
it).  Queries without an oracle get a rows-and-schema smoke check."""

from __future__ import annotations

import pytest

from hadoop_sync_spark.queries import load_all
from tests.conftest import compare_frames

QUERIES = load_all()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, oracle, sf_dir, name):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    rel = oracle.sql(q.oracle)
    n_rows = compare_frames(sdf, rel, name)
    # Vacuity guard (round-2 verdict item 3): an all-empty "match" validates
    # nothing — a query whose correct fixture output is empty must declare
    # expected_empty=True at registration.
    if not q.expected_empty:
        assert n_rows > 0, (
            f"{name}: vacuous parity — both engines returned 0 rows on the "
            f"fixture; declare expected_empty=True if this is intentional"
        )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    n = df.count()
    assert len(df.schema.fields) > 0
    if not q.expected_empty:
        assert n > 0, (
            f"{name}: rows-only query returned 0 rows on the fixture; "
            f"declare expected_empty=True if this is intentional"
        )
