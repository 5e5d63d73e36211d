"""Shared fixtures: one SparkSession per test run, a DuckDB oracle
connection with the fixture tables pre-registered, and the driver-style
comparison helper used by the parity suite."""

from __future__ import annotations

import math
import os
from datetime import datetime

import duckdb
import pytest

from hadoop_sync_spark.io import TABLES, table_path
from hadoop_sync_spark.session import get_spark

#: correctness SF; override with SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hadoop-sync-spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{table_path(SF_DIR, name)}')"
        )
    yield con
    con.close()


def canon_cell(v) -> str:
    """Canonical string for a cell, strict enough to surface any
    cross-engine drift the driver's value-hash would catch."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip repr: exact double identity
    if isinstance(v, datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(columns, rows):
    """Order-insensitive canonical multiset: sort columns by name (the
    driver's convention), stringify, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        "|".join(canon_cell(row[i]) for i in order) for row in rows
    )


def compare_frames(spark_df, oracle_rel, name: str):
    """Assert driver-style equivalence: row count, column-name set, and
    order-insensitive canonical values."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols = [d[0] for d in oracle_rel.description]
    o_rows = oracle_rel.fetchall()

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    s_canon = canon_rows(s_cols, s_rows)
    o_canon = canon_rows(o_cols, o_rows)
    if s_canon != o_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, o_canon) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first differing rows "
            f"(spark vs oracle): {diffs}"
        )
