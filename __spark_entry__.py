"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real surface lives in ``hadoop_sync_spark.queries`` (one registered
Query per implemented operator from SURVEY.md §2, each pairing the Spark
implementation with its DuckDB oracle); this module just adapts it.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hadoop_sync_spark.queries import load_all, oracle_map, queries_map  # noqa: E402
from hadoop_sync_spark.session import tune_session  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    tune_session(spark)
    return load_all()["q01_pricing_summary"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in queries_map().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per oracle-expressible query."""
    return oracle_map()
