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


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-purchase edge list (u, v; u < v, distinct): customers
    adjacent when they bought the same small part, per-part fan-out capped
    at `_CUST_CAP` (the max_bucket skew idiom).  Shared by the triangle
    (q123) and PageRank (q137) pipelines."""
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
    return (
        a.join(b, (F.col("a.pk") == F.col("b.pk")) & (F.col("a.c") < F.col("b.c")))
        .select(F.col("a.c").alias("u"), F.col("b.c").alias("v"))
        .distinct()
    )


def triangle_pipeline(
    spark: SparkSession, sf_dir: str, persist: bool = True
) -> tuple[DataFrame, list[DataFrame]]:
    """Build the co-purchase triangle pipeline; returns (assembled one-row
    frame, caches-to-free).  ``persist=False`` keeps every frame lazy so
    plan tests can inspect the triangle joins (a persisted edge list
    would hide them behind InMemoryTableScan)."""
    # the edge list gets persisted inside triangle_stats: three consumers
    # (degree agg, edge count, and the 3-way triangle self-join) would
    # otherwise each recompute the projection joins; freed by the
    # materialize epilogue
    return triangle_stats(copurchase_edges(spark, sf_dir), persist=persist)


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


# --------------------------------------------------------------------------
# q137 — fixed-iteration quantized PageRank over the co-purchase graph
# --------------------------------------------------------------------------
_PR_SCALE = 1_000_000_000  # score unit: 1e-9 of total probability mass
_PR_ITERS = 3

_SQL_PR_EDGES = f"""
    pc AS (
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
    )
"""


def _sql_pr_iter(i: int) -> str:
    prev = f"s{i - 1}"
    return f"""
    it{i} AS (
        SELECT adj.dst AS node,
               CAST(SUM({prev}.s // {prev}.d) AS BIGINT) AS agg
        FROM adj JOIN {prev} ON adj.src = {prev}.node
        GROUP BY adj.dst
    ), s{i} AS (
        SELECT {prev}.node, {prev}.d, {prev}.base,
               CAST({prev}.base
                    + (85 * COALESCE(it{i}.agg, 0)) // 100 AS BIGINT) AS s
        FROM {prev} LEFT JOIN it{i} ON {prev}.node = it{i}.node
    )"""


@register(
    "q137_copurchase_pagerank",
    oracle=f"""
    WITH {_SQL_PR_EDGES},
    adj AS (
        SELECT u AS src, v AS dst FROM e0
        UNION ALL
        SELECT v AS src, u AS dst FROM e0
    ), deg AS (
        SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
        FROM adj GROUP BY src
    ), cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg),
    s0 AS (
        SELECT node, d,
               CAST((15 * ({_PR_SCALE} // cnt.n_nodes)) // 100 AS BIGINT)
                 AS base,
               CAST({_PR_SCALE} // cnt.n_nodes AS BIGINT) AS s
        FROM deg, cnt
    ),{",".join(_sql_pr_iter(i) for i in range(1, _PR_ITERS + 1))}
    SELECT node AS custkey, d AS degree, s AS pr_q9
    FROM s{_PR_ITERS}
    ORDER BY s DESC, node
    LIMIT 20
    """,
    tags=("graph", "pagerank", "iterative"),
)
def q137_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, {iters} unrolled iterations from the
    uniform vector) over the customer co-purchase graph — the canonical
    iterative-propagation operator the graph family still lacked
    (components find WHO is connected, triangles how densely; PageRank
    ranks influence).  Top-20 customers by score under a total order.

    Exactness: the whole recurrence is integer arithmetic in 1e-9 mass
    units — contribution = s div d (truncating), update = base +
    (85·Σcontrib) div 100 with base = (15·(SCALE div N)) div 100 — both
    engines truncate integer division toward zero (commit 76bc554), so
    three iterations stay bit-exact with the DuckDB oracle without a
    single float.  A fixed iteration count (the production norm for
    ranking pipelines: power iteration is run a budgeted number of
    sweeps, not to machine-epsilon convergence) is what makes an EXACT
    oracle expressible as chained CTEs rather than a weaker fixpoint
    contract like q68's.

    Scale: the adjacency persists once (2 rows/edge) and each iteration
    is one hash join (adj ⋈ scores on src, node-scale build side) + one
    partial-aggregated shuffle on dst — the classic message-passing
    round, O(edges) per iteration with no global sort; scores stay
    node-scale.  Truncation drains ≤1 unit per (node, div) per round, so
    total mass shrinks by <2N·10⁻⁹ per sweep — rank order is unaffected
    and the drain is deterministic, hence oracle-matched.  The final
    TakeOrdered(20) is the only ordering."""
    from hadoop_sync_spark.queries._util import materialize_and_free

    # Persist the UNDIRECTED edge list, not just the symmetrized
    # adjacency: adj's unionAll references e0 twice, so without this
    # cache the whole lineitem⋈orders⋈part edge pipeline ran TWICE
    # inside adj's materialization (same-boot profile: 4.3 s vs 1.7 s
    # for a single edge pass — the round-7 trim's biggest term).
    e0 = copurchase_edges(spark, sf_dir).persist()
    # One up-front hash partitioning on src: every message round joins
    # adj on src, so pre-partitioning lets all three per-round joins
    # reuse this exchange and shuffle only the node-scale score side —
    # at 100 TB this is the standard "partition the edges once, ship
    # the vertex frame" Pregel layout; deg's groupBy(src) also becomes
    # exchange-free.
    adj = (
        e0.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(e0.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .repartition("src")
        .persist()
    )
    scores, handles = pagerank_quantized(
        adj, iters=_PR_ITERS, with_handles=True
    )
    top = (
        scores.select(
            F.col("node").alias("custkey"),
            F.col("d").alias("degree"),
            F.col("s").alias("pr_q9"),
        )
        .orderBy(F.col("pr_q9").desc(), "custkey")
        .limit(20)
    )
    return materialize_and_free(top, [e0, adj, *handles])


def pagerank_quantized(
    adj: DataFrame, iters: int = _PR_ITERS, with_handles: bool = False
) -> DataFrame | tuple[DataFrame, list[DataFrame]]:
    """Integer-quantized PageRank over a directed adjacency frame
    (columns src, dst; for undirected graphs pass both directions).
    Returns (node, d, base, s) after ``iters`` unrolled message-passing
    rounds.  Factored so behavioral tests can feed crafted graphs and
    compare against a pure-Python mirror of the same recurrence.

    ``with_handles=True`` persists EVERY OTHER round's score frame (plus
    the init and the final round) and returns the handles for the
    caller's materialize-then-free epilogue: every round references its
    predecessor TWICE (contrib side + carry side), so an uncached chain
    doubles lineage per round — 2^iters copies of the init subtree at
    runtime (the q68 component-loop lesson, applied to an unrolled
    loop).  Caching every round bounds recompute at 1× but pays a cache
    barrier per round; the every-other cadence bounds recompute at 4×
    of a (node-scale, cached-adjacency-rooted) segment while halving
    the barriers — measured 5.3 → 4.0 s on the q137 fixture with
    bit-identical output (round-7 trim).  Tests keep the default lazy
    form so plan assertions can see the joins."""
    deg = adj.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("d")
    )
    cnt = deg.agg(F.count("*").alias("n_nodes"))
    handles: list[DataFrame] = []

    def _hold(frame: DataFrame, rnd: int) -> DataFrame:
        if with_handles and (rnd % 2 == 0 or rnd == iters):
            frame = frame.persist()
            handles.append(frame)
        return frame

    s = _hold(
        deg.crossJoin(F.broadcast(cnt)).select(
            "node",
            "d",
            F.expr(f"(15 * ({_PR_SCALE} div n_nodes)) div 100").alias("base"),
            F.expr(f"{_PR_SCALE} div n_nodes").alias("s"),
        ),
        0,
    )
    for _rnd in range(1, iters + 1):
        contrib = (
            adj.join(
                s.select(
                    F.col("node").alias("src"), F.expr("s div d").alias("w")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("w").alias("agg"))
        )
        s = _hold(
            s.select("node", "d", "base")
            .join(contrib, "node", "left")
            .select(
                "node",
                "d",
                "base",
                F.expr(
                    "base + (85 * coalesce(agg, 0)) div 100"
                ).alias("s"),
            ),
            _rnd,
        )
    return (s, handles) if with_handles else s


q137_copurchase_pagerank.__doc__ = q137_copurchase_pagerank.__doc__.format(
    iters=_PR_ITERS
)
