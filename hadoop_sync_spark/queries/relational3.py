"""L2 relational surface, third batch: the subquery/join forms Catalyst
plans as *distinct physical operators* from the plain equi-join family —
NOT IN (null-aware anti-join), disjunctive-predicate joins (TPC-H Q19
shape), and correlated scalar-subquery aggregation (TPC-H Q17 shape).

Same exact-parity discipline as :mod:`relational` (see ``_util``): money
sums ride scaled BIGINTs; the Q17-style correlated aggregate is MAX (exact
and reduction-order-independent on doubles), never a float AVG whose
low-order bits could flip a comparison between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hadoop_sync_spark.queries import register
from hadoop_sync_spark.queries._util import (
    memo,
    scaled,
    sql_scaled,
    t,
)

_REVENUE4 = f"{sql_scaled('l_extendedprice')} * (100 - {sql_scaled('l_discount')})"


# --------------------------------------------------------------------------
# q83 — NOT IN subquery → null-aware anti-join (TPC-H Q16 shape)
# --------------------------------------------------------------------------
@register(
    "q83_notin_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND l.l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
    GROUP BY p.p_brand, p.p_size
    """,
    tags=("sql", "subquery", "not-in", "anti"),
)
def q83_notin_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier counts per (brand, size) excluding suppliers on a
    deny-list via NOT IN — TPC-H Q16's shape.  NOT IN is *not* the same
    operator as NOT EXISTS (q38): its three-valued-logic null semantics
    make Catalyst plan a null-aware anti-join (BroadcastNestedLoopJoin
    degenerating to a single-key broadcast when the subquery side is
    small), which is exactly the right plan at 100 TB — the deny-list is
    dimension-sized and ships to every executor once.

    Scale: fact⋈part is the only shuffle; the NOT IN side broadcasts."""
    from hadoop_sync_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p.p_brand, p.p_size,
               COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#45'
          AND l.l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
              )
        GROUP BY p.p_brand, p.p_size
        """
    )


# --------------------------------------------------------------------------
# q84 — disjunctive-predicate join (TPC-H Q19 shape)
# --------------------------------------------------------------------------
@register(
    "q84_disjunctive_join_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REVENUE4}) AS DOUBLE) / 10000.0 AS revenue,
           COUNT(*) AS line_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 45
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    tags=("join", "disjunctive", "filter"),
)
def q84_disjunctive_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under an OR of three conjunctive brand/size/quantity bands —
    TPC-H Q19's disjunctive join.  The join key stays a clean equi-join on
    partkey (hash-joinable); the disjunction is a post-join filter whose
    single-table conjuncts Catalyst extracts and pushes below the join
    (CNF conversion), so `part` is pre-filtered to the union of brand/size
    bands before it broadcasts.

    Scale: part is dimension-sized → broadcast; lineitem never shuffles."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")

    def _build():
        revenue4 = scaled("l_extendedprice") * (
            F.lit(100).cast("long") - scaled("l_discount")
        )
        band = (
            (
                (F.col("p_brand") == "Brand#12")
                & F.col("p_size").between(1, 15)
                & F.col("l_quantity").between(1, 21)
            )
            | (
                (F.col("p_brand") == "Brand#23")
                & F.col("p_size").between(1, 30)
                & F.col("l_quantity").between(10, 30)
            )
            | (
                (F.col("p_brand") == "Brand#34")
                & F.col("p_size").between(1, 45)
                & F.col("l_quantity").between(20, 40)
            )
        )
        return band, [
            (F.sum(revenue4).cast("double") / F.lit(10000.0)).alias(
                "revenue"
            ),
            F.count("*").alias("line_cnt"),
        ]

    band, aggs = memo("q84", _build)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(band)
        .agg(*aggs)
    )


# --------------------------------------------------------------------------
# q85 — correlated scalar subquery with aggregate (TPC-H Q17 shape)
# --------------------------------------------------------------------------
@register(
    "q85_correlated_max_qty",
    oracle=f"""
    SELECT p.p_brand,
           COUNT(*) AS line_cnt,
           CAST(SUM({sql_scaled('l.l_extendedprice')}) AS DOUBLE) / 100.0
             AS price_sum
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_quantity >= (
            SELECT MAX(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey
          ) - 1.0
    GROUP BY p.p_brand
    """,
    tags=("sql", "subquery", "correlated", "scalar-agg"),
)
def q85_correlated_max_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems within 1 unit of their part's maximum order quantity —
    TPC-H Q17's correlated-scalar-aggregate shape.  Catalyst decorrelates
    the subquery into a per-partkey aggregate joined back to the fact
    (visible as an Aggregate⋈fact in the plan), which is exactly the
    manual rewrite you'd do at 100 TB — the per-part aggregate is |part|
    rows, far smaller than the fact.

    The correlated aggregate is MAX, not AVG: double MAX is exact and
    reduction-order-independent, so the comparison threshold is identical
    in both engines (a float AVG's low-order bits could flip rows at the
    boundary)."""
    from hadoop_sync_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT p.p_brand,
               COUNT(*) AS line_cnt,
               CAST(SUM({sql_scaled('l.l_extendedprice')}) AS DOUBLE) / 100.0
                 AS price_sum
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_quantity >= (
                SELECT MAX(l2.l_quantity) FROM lineitem l2
                WHERE l2.l_partkey = l.l_partkey
              ) - 1.0
        GROUP BY p.p_brand
        """
    )


# --------------------------------------------------------------------------
# q128 — skyline / Pareto front (grid-partitioned dominance)
# --------------------------------------------------------------------------
#: Grid width over p_retailprice: bucket = floor(price / W).  Any point in
#: a strictly earlier bucket is strictly cheaper, so cross-bucket
#: dominance reduces to one prefix-min over BUCKET aggregates (tiny),
#: and within-bucket dominance parallelizes per bucket.
_SKY_W = 50


@register(
    "q128_price_size_skyline",
    oracle="""
    WITH pts AS (
        SELECT p_partkey, p_retailprice AS price,
               CAST(p_size AS BIGINT) AS size
        FROM part
    )
    SELECT p.p_partkey, p.price, p.size
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.price <= p.price AND q.size <= p.size
          AND (q.price < p.price OR q.size < p.size)
    )
    """,
    tags=("relational", "skyline", "pareto"),
)
def q128_price_size_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto front) of parts minimizing (price, size): a part
    survives iff no other part is ≤ on both dimensions and < on one —
    the multi-criteria shortlist query (Börzsönyi et al., "The Skyline
    Operator", ICDE'01).  The oracle is the textbook NOT EXISTS
    (quadratic, fine at fixture scale); the Spark plan is the
    GRID-PARTITIONED form that scales:

    - bucket points by price range (floor(price/W) — data-independent,
      no sort); a point in a strictly earlier bucket is strictly
      cheaper, so CROSS-bucket dominance collapses to a prefix-min of
      per-bucket min sizes — bucket-cardinality work on the driver-scale
      aggregate, broadcast back;
    - WITHIN-bucket dominance uses two window frames partitioned per
      bucket (min size over strictly-cheaper rows via a RANGE frame that
      excludes price peers; min size among exact price peers), so every
      corpus-scale pass is embarrassingly parallel across buckets — no
      global sort, no self-join, one shuffle on bucket.

    Equal (price, size) duplicates don't strictly dominate each other
    and both survive, matching the NOT EXISTS semantics."""
    pts = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("long").alias("size"),
    )
    return pareto_front(pts)


def pareto_front(pts: DataFrame, bucket_width: int = _SKY_W) -> DataFrame:
    """Grid-partitioned 2-D skyline minimizing (price, size) over a frame
    with columns (price DOUBLE 2-decimal, size BIGINT, + carried id
    columns).  See :func:`q128_price_size_skyline` for the algorithm;
    factored so behavioral tests can feed crafted point sets against a
    brute-force reference."""
    from pyspark.sql.window import Window

    carried = [c for c in pts.columns if c not in ("price", "size")]
    pts = pts.withColumn(
        "bucket", F.floor(F.col("price") / F.lit(float(bucket_width)))
    )
    # cross-bucket: prefix min of per-bucket min size over EARLIER buckets
    bmins = pts.groupBy("bucket").agg(F.min("size").alias("bmin"))
    wprev = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # bucket-cardinality frame — tiny by construction
    prefix = bmins.select(
        "bucket", F.min("bmin").over(wprev).alias("prev_min")
    )
    # within-bucket: RANGE frame over CENT-scaled price (exact long, the
    # _util.scaled idiom) ending at -1 excludes price peers → the frame
    # is exactly the strictly-cheaper rows
    pts = pts.withColumn("price_c", scaled("price"))
    wcheaper = (
        Window.partitionBy("bucket")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wpeers = Window.partitionBy("bucket", "price_c")
    flagged = (
        pts.join(F.broadcast(prefix), "bucket")
        .withColumn("m_cheaper", F.min("size").over(wcheaper))
        .withColumn("m_peer", F.min("size").over(wpeers))
    )
    dominated = (
        (F.col("prev_min") <= F.col("size"))
        | (F.col("m_cheaper") <= F.col("size"))
        | (F.col("m_peer") < F.col("size"))
    )
    return flagged.filter(~F.coalesce(dominated, F.lit(False))).select(
        *carried, "price", "size"
    )
