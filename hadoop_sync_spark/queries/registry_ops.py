"""Registry/statistics queries — the L1 face of the reference itself.

The full registry engine (diff/sync/atomic publish, SURVEY §7 Phase 2) lives
in :mod:`hadoop_sync_spark.registry` with property tests; here we declare the
oracle-checkable statistics surface: the A17 min/max scan whose results the
reference stores as stringly-typed shard stats (``MinMaxValue.java:6-7``,
``CitusWorkerNode.java:140-165``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hadoop_sync_spark.queries import register
from hadoop_sync_spark.queries._util import t


@register(
    "q80_minmax_stats",
    oracle="""
    SELECT 'lineitem' AS table_name, 'l_shipdate' AS stat_column,
           CAST(MIN(l_shipdate) AS VARCHAR) AS min_value,
           CAST(MAX(l_shipdate) AS VARCHAR) AS max_value,
           COUNT(*) AS row_cnt
    FROM lineitem
    UNION ALL
    SELECT 'orders', 'o_orderdate',
           CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR),
           COUNT(*)
    FROM orders
    UNION ALL
    SELECT 'events', 'ts',
           CAST(MIN(ts::TIMESTAMP) AS VARCHAR), CAST(MAX(ts::TIMESTAMP) AS VARCHAR),
           COUNT(*)
    FROM events
    """,
    tags=("registry", "stats"),
)
def q80_minmax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-column min/max statistics, stored stringly exactly like the
    reference's `shardminvalue`/`shardmaxvalue` (A17/A19,
    `CitusMasterNode.java:44-47`) — what registry-based file pruning casts
    back at query time (SURVEY §4.1 P2).

    Scale: parquet footers already hold these per row group; Spark's
    aggregate pushdown can answer min/max without scanning data rows."""

    def one(tbl: str, col: str) -> DataFrame:
        return (
            t(spark, sf_dir, tbl)
            .agg(
                F.min(col).cast("string").alias("min_value"),
                F.max(col).cast("string").alias("max_value"),
                F.count("*").alias("row_cnt"),
            )
            .select(
                F.lit(tbl).alias("table_name"),
                F.lit(col).alias("stat_column"),
                "min_value",
                "max_value",
                "row_cnt",
            )
        )

    return (
        one("lineitem", "l_shipdate")
        .unionByName(one("orders", "o_orderdate"))
        .unionByName(one("events", "ts"))
    )
