"""Source/sink round-trips and partition pruning.

Every supported format must round-trip a representative slice (typed
columns: int64, int32, double, string, timestamp) bit-for-bit, and a
hive-partitioned write must prune directories on read (PartitionFilters
in the scan) — the coarse twin of the registry's min/max file pruning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_sync_spark.io import load_table
from hadoop_sync_spark.sinks import FORMATS, read_table, write_table


@pytest.fixture(scope="module")
def sample(spark, sf_dir):
    # orders covers int64/int32(date-derived)/double/string/timestamp
    return load_table(spark, sf_dir, "orders").limit(500).cache()


@pytest.mark.parametrize("fmt", FORMATS)
def test_roundtrip(spark, sample, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp(f"rt_{fmt}"))
    write_table(sample, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=sample.schema)
    assert back.schema == sample.schema
    a = {tuple(r) for r in sample.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b, f"{fmt} round-trip drifted"


def test_csv_requires_schema(spark, tmp_path_factory):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, "/nonexistent", fmt="csv")


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part_orders"))
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    write_table(orders, path, fmt="parquet", partition_by=("o_year",))
    back = read_table(spark, path).filter(F.col("o_year") == 1995)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_year" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], "partition predicate did not reach the scan"
    # pruning is sound: same rows as a post-hoc filter of the full table
    expect = orders.filter(F.col("o_year") == 1995).count()
    assert back.count() == expect


def test_csv_json_adversarial_roundtrip(spark, tmp_path_factory):
    """Row formats must survive the strings that break naive writers:
    embedded delimiters, quotes, newlines, unicode, empty strings, and
    NULLs (CSV's empty-vs-NULL ambiguity is pinned by explicit options)."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [StructField("id", LongType()), StructField("s", StringType())]
    )
    rows = [
        (1, 'comma,sep"quoted"'),
        (2, "line\nbreak\r\nand\ttab"),
        (3, ""),
        (4, None),
        (5, "ünïcode – 中文 🚀"),
        (6, "   leading/trailing   "),
        (7, "\\backslash\\ and 'single'"),
        (8, "\\N"),  # the classic null-marker collision string
        (9, "NULL"),
    ]
    df = spark.createDataFrame(rows, schema)
    for fmt in ("csv", "json"):
        path = str(tmp_path_factory.mktemp(f"adv_{fmt}"))
        write_table(df, path, fmt=fmt)
        back = read_table(spark, path, fmt=fmt, schema=schema)
        got = sorted((r.id, r.s) for r in back.collect())
        assert got == sorted(rows), f"{fmt} lost data: {got}"
