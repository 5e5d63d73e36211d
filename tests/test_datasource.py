"""The custom Python data source (Spark 4 API): partition planning,
schema, and — the property that makes it usable for scale studies —
partitioning-independence of the generated rows."""

from __future__ import annotations

import pytest

from hadoop_sync_spark.datasource import SyntheticDocsDataSource, synth_doc


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    spark.dataSource.register(SyntheticDocsDataSource)


def _read(spark, rows, partitions):
    return (
        spark.read.format("docsynth")
        .option("rows", rows)
        .option("partitions", partitions)
        .load()
    )


def test_schema_count_and_partitions(spark):
    df = _read(spark, 1000, 8)
    assert df.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 8
    assert df.select("doc_id").distinct().count() == 1000


def test_rows_are_partitioning_independent(spark):
    """Content must be a pure function of doc_id: re-reading with a
    different partition count yields row-for-row identical data (the
    splittable-generator contract scale tests rely on)."""
    a = sorted(tuple(r) for r in _read(spark, 500, 3).collect())
    b = sorted(tuple(r) for r in _read(spark, 500, 11).collect())
    assert a == b
    # and matches the driver-side generation rule exactly
    assert a[:5] == sorted(synth_doc(i) for i in range(500))[:5]


def test_source_feeds_engine_operators(spark):
    """The generated corpus must flow through a real operator unchanged —
    dedup over docsynth behaves like dedup over parquet documents."""
    from hadoop_sync_spark.queries.dedup import span_dedup_frame

    df = _read(spark, 300, 4)
    out = span_dedup_frame(df.select("doc_id", "text"), w=8)
    assert out.count() == 300
    assert out.filter("n_spans <= 0").count() == 0


def test_rows_zero_is_empty_scan(spark):
    df = _read(spark, 0, 4)
    assert df.count() == 0
