"""Skew helpers: salted join/agg must be answer-identical to the plain
forms — salting may only change the shuffle shape."""

from pyspark.sql import functions as F

from hadoop_sync_spark.functions.skew import salted_agg, salted_join


def test_salted_join_matches_plain_join(spark):
    # 90% of fact rows share one hot key
    fact = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    plain = fact.join(dim, "k").select("k", "v", "w")
    salted = salted_join(fact, dim, "k").select("k", "v", "w")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_agg_matches_plain_agg(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    plain = df.groupBy("k").agg(
        F.count("*").alias("cnt"), F.sum("v").alias("total")
    )
    salted = salted_agg(
        df,
        keys=["k"],
        aggs=[F.count("*").alias("_c"), F.sum("v").alias("_s")],
        final_aggs=[F.sum("_c").alias("cnt"), F.sum("_s").alias("total")],
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_approx_percentiles_within_envelope(spark, sf_dir):
    """q48's sketch quantiles must track the exact quantiles closely at
    accuracy=10000 (the whole point of shipping the sketch path)."""
    from hadoop_sync_spark.queries import load_all

    rows = load_all()["q48_approx_percentiles"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["approx_ok"] is True
        for q in ("p25", "p50", "p75", "p95"):
            assert r[q] is not None and float(r[q]) >= 0.0
