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


def test_aqe_splits_skewed_join_partitions(spark, sf_dir):
    """100 TB posture check: with AQE's skew-join thresholds scaled down
    to fixture size, a sort-merge join against a heavily skewed key must
    come out of adaptive planning with its skewed partitions split
    (`skew=true` marks on the SMJ node) — the runtime answer to the hot
    keys that salting (q44) handles statically."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

        # 90% of rows pile onto key 0; the rest spread over 1000 keys.
        # The fact side MUST come from many map tasks (16-way range):
        # AQE splits a skewed reduce partition at map-output granularity,
        # so a single-mapper input (one small parquet file) is
        # structurally unsplittable at any threshold.
        fact = spark.range(0, 150_000, 1, 16).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            (F.col("id") % 50).cast("double").alias("l_quantity"),
        )
        dim = (
            spark.range(0, 1000)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        )
        joined = fact.join(dim, "k").groupBy().agg(
            F.count("*").alias("cnt"),
            F.sum("l_quantity").alias("qty"),  # keeps the payload column
        )
        (row,) = joined.collect()
        assert row["cnt"] == fact.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
