"""Shared helpers for query implementations: exact-parity numeric idioms."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from hadoop_sync_spark.io import load_table

#: Decimal type used for exact money/quantity aggregation.  Every fixture
#: money/rate column carries exactly 2 fraction digits, so scale-2 casts are
#: lossless; Spark widens the sum to DECIMAL(28,2) and DuckDB to (38,2) —
#: both exact, both cast back to DOUBLE on output.
#:
#: Scale discipline (hard-won parity constraint): DuckDB's DECIMAL→DOUBLE
#: cast double-rounds when the *scaled integer* exceeds 2^53 (it converts
#: the hugeint mantissa to double before dividing by 10^scale), while
#: Spark/Java round the decimal string directly.  Keeping sum scales ≤ 6
#: keeps scaled values < 2^53 at every fixture SF, so both casts are the
#: correctly-rounded nearest double and hashes match bit-for-bit.
DEC = "decimal(18,2)"
#: 2-factor products (price × (1−discount)): scale 4, precision ≤ 26.
DEC2 = "decimal(12,2)"
#: 3-factor products (price × (1−disc) × (1+tax)): scale 6, precision ≤ 29.
DEC3 = "decimal(9,2)"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dec(c: Column | str) -> Column:
    """Cast to the exact-aggregation decimal type."""
    return (F.col(c) if isinstance(c, str) else c).cast(DEC)


def dsum(c: Column | str) -> Column:
    """Exact SUM over a double column, emitted as DOUBLE."""
    return F.sum(dec(c)).cast("double")


def davg(c: Column | str) -> Column:
    """Deterministic AVG: exact decimal sum → double → divide by count."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(dec(col)).cast("double") / F.count(col)


def sql_dsum(expr: str) -> str:
    """DuckDB spelling of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB spelling of :func:`davg`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({expr})"
