"""Table loading: directory-per-table parquet, the reference's data model.

The reference binds one logical table to one HDFS directory via the
``hdfs_directory_path`` foreign-table option (``HdfsSynchronizer.java:29-34``,
``CitusMasterNode.java:338-381``).  Spark's file-source model is exactly that;
``load_table`` is the engine's scan entry point and keeps schema fixed and
external (no inference surprises), mirroring the master-catalog-is-truth
design (``CitusMasterNode.java:195-215``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType

#: Every fixture table (TESTDATA.md).  Order: dims → facts → L3 tables.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    """Resolve a table name to its parquet path under a scale-factor dir."""
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table.  Plain ``spark.read.parquet`` so Catalyst gets full
    pushdown/pruning; callers `.select()` early to keep ReadSchema narrow.

    ``events.ts`` is parquet TIMESTAMP(NANOS); Spark has no nanosecond
    timestamp type, so we read it as a nanos-since-epoch long
    (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild a microsecond
    TimestampType column — the same truncation DuckDB's
    ``timestamp_ns::TIMESTAMP`` cast performs, keeping oracle parity.
    """
    # session-settable legacy conf; required for any table with ns timestamps
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # integer division: float division would lose precision above 2^53 ns
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        # restore the documented column order
        df = df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql`` queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
