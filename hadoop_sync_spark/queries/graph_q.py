"""Graph analytics beyond connected components: triangle counting over a
co-purchase projection — the round-4 addition to the distributed-graph
family (q68/q106 cover components; this covers the join-based motif
counting that underlies clustering-coefficient / community-quality
metrics over similarity and interaction graphs).

Algorithm: degree ordering + two hash joins (the MapReduce-era standard,
Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
Reducer", WWW'11): relabel every node by its degree rank (ties broken by
id, so the order is total), orient each edge low→high, and count paths
a→b→c closed by a→c.  Under degree order a node's forward neighborhood
is O(√m), which bounds the wedge join — the "last reducer" hot node that
kills the naive formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from hadoop_sync_spark.queries import register
from hadoop_sync_spark.queries._util import t

#: Co-purchase projection knobs: restrict to small parts and cap the
#: per-part customer list so the pair expansion is bounded by
#: construction (the max_bucket idiom from the LSH family) — a mega-part
#: bought by everyone must not emit a quadratic clique.
_MAX_PART_SIZE = 5
_CUST_CAP = 10


@register(
    "q123_copurchase_triangles",
    oracle=f"""
    WITH pc AS (
        SELECT DISTINCT l.l_partkey AS pk, o.o_custkey AS c
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size <= {_MAX_PART_SIZE}
    ), capped AS (
        SELECT pk, c FROM (
            SELECT pk, c,
                   ROW_NUMBER() OVER (PARTITION BY pk ORDER BY c) AS rn
            FROM pc
        ) WHERE rn <= {_CUST_CAP}
    ), e0 AS (
        SELECT DISTINCT a.c AS u, b.c AS v
        FROM capped a JOIN capped b ON a.pk = b.pk AND a.c < b.c
    ), deg AS (
        SELECT n, COUNT(*) AS d FROM (
            SELECT u AS n FROM e0 UNION ALL SELECT v AS n FROM e0
        ) GROUP BY n
    ), e AS (
        SELECT CASE WHEN (du.d, e0.u) < (dv.d, e0.v) THEN e0.u ELSE e0.v END
                 AS src,
               CASE WHEN (du.d, e0.u) < (dv.d, e0.v) THEN e0.v ELSE e0.u END
                 AS dst
        FROM e0 JOIN deg du ON e0.u = du.n JOIN deg dv ON e0.v = dv.n
    ), tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM e e1 JOIN e e2 ON e2.src = e1.dst
                  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS n_edges,
           (SELECT CAST(n_triangles AS BIGINT) FROM tri) AS n_triangles
    """,
    tags=("graph", "triangles", "motif"),
)
def q123_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the customer co-purchase graph (customers are
    adjacent when they bought the same small part; per-part fan-out
    capped at {cap} so a universally-bought part cannot emit a quadratic
    clique — the max_bucket skew idiom).  Emits one row
    (n_nodes, n_edges, n_triangles): the triangle density that feeds
    clustering-coefficient and community-health metrics over any pair
    graph this engine produces (near-dup pairs, interaction graphs).

    Scale: the projection is two hash joins + a windowed cap (one
    shuffle on pk); degrees are one aggregation over the edge endpoints;
    orientation compares (degree, id) pairs DIRECTLY — any total order
    works, so there is no global rank and no global sort anywhere; the
    triangle count is TWO hash joins on the degree-oriented edge list —
    under degree order each node's forward neighborhood is O(√m), so the
    wedge join (e2.src = e1.dst) is bounded per key and the closing
    probe is a plain equi-join; no node explodes a reducer (Suri &
    Vassilvitskii WWW'11).  Every join key is hashable; nothing
    driver-side."""
    assembled, caches = triangle_pipeline(spark, sf_dir, persist=True)
    from hadoop_sync_spark.queries._util import materialize_and_free

    return materialize_and_free(assembled, caches)


def triangle_pipeline(
    spark: SparkSession, sf_dir: str, persist: bool = True
) -> tuple[DataFrame, list[DataFrame]]:
    """Build the co-purchase triangle pipeline; returns (assembled one-row
    frame, caches-to-free).  ``persist=False`` keeps every frame lazy so
    plan tests can inspect the triangle joins (a persisted edge list
    would hide them behind InMemoryTableScan)."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_size") <= _MAX_PART_SIZE)
        .select("p_partkey")
    )
    pc = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_partkey").alias("pk"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    w = Window.partitionBy("pk").orderBy("c")
    capped = (
        pc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _CUST_CAP)
        .select("pk", "c")
    )
    a, b = capped.alias("a"), capped.alias("b")
    # persist the edge list: three consumers (degree agg, edge count, and
    # the 3-way triangle self-join) would otherwise each recompute the
    # projection joins; freed by the materialize epilogue below
    e0 = (
        a.join(b, (F.col("a.pk") == F.col("b.pk")) & (F.col("a.c") < F.col("b.c")))
        .select(F.col("a.c").alias("u"), F.col("b.c").alias("v"))
        .distinct()
    )
    return triangle_stats(e0, persist=persist)


def triangle_stats(
    e0: DataFrame, persist: bool = True
) -> tuple[DataFrame, list[DataFrame]]:
    """Degree-ordered triangle counting over an undirected edge list
    (columns u, v; u != v, one row per unordered pair).  Returns the
    one-row (n_nodes, n_edges, n_triangles) frame plus caches-to-free.
    Factored so behavioral tests can feed crafted graphs with known
    triangle counts."""
    if persist:
        e0 = e0.persist()
    deg = (
        e0.select(F.col("u").alias("n"))
        .unionAll(e0.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    du = deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du")
    dv = deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv")
    fwd = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
    # persist the oriented edges too: e appears three times in the
    # triangle join (e1/e2/e3)
    e = (
        e0.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    if persist:
        e = e.persist()
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.src") == F.col("e1.dst"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    n_edges = e0.agg(F.count("*").alias("n_edges"))
    assembled = (
        n_nodes.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select("n_nodes", "n_edges", F.col("n_triangles").cast("long"))
    )
    return assembled, ([e0, e] if persist else [])


q123_copurchase_triangles.__doc__ = q123_copurchase_triangles.__doc__.format(
    cap=_CUST_CAP
)
