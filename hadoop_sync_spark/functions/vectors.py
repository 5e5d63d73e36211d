"""Vector similarity: exact cosine machinery + brute-force and IVF top-k.

Dot products are sequential double folds over ``zip_with`` products — pure
JVM builtins, bit-deterministic, and expressible identically in the DuckDB
oracle (``list_zip`` + ``list_reduce``).  A pandas-UDF path would be faster
per-row for very high dimensions; at dim=64 the builtin fold keeps the whole
plan in codegen and avoids Arrow transfer entirely.

IVF background: inverted-file ANN indexing per Jégou et al., "Product
Quantization for Nearest Neighbor Search" (TPAMI 2011) — here only the
coarse IVF layer (centroid assignment + probe) without PQ compression.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Exact-order dot product of two float arrays in DOUBLE."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0-vector-safe (returns NULL via nullif)."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Scale: broadcast the (small) query set against the full vector table —
    an embarrassingly parallel scan with per-partition top-k maintained by
    the rank<=k window filter (WindowGroupLimit pushes the limit into the
    shuffle).  Cost O(|vectors|·|queries|·dim) — the honest baseline every
    ANN variant is validated against."""
    # norms are projected ONCE per row on each side: `cosine()` inline in
    # the pair space would re-fold the vector-side norm once per QUERY and
    # the query-side norm once per ROW (|queries|× / |vectors|× redundant
    # dim-wide folds); sqrt of the same double multiplied once is
    # IEEE-identical, so oracle parity is unaffected
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vvec"),
        l2_norm(F.col(vec_col)).alias("_vn"),
    )
    sim = dot(F.col("_qvec"), F.col("_vvec")) / F.nullif(
        F.col("_qn") * F.col("_vn"), F.lit(0.0)
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def kmeans_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Learn IVF coarse centroids with MLlib k-means (k-means|| init —
    Bahmani et al., VLDB 2012), on L2-NORMALIZED inputs so the euclidean
    objective matches the cosine geometry the index probes (spherical
    k-means approximation: for unit vectors, euclidean argmin == cosine
    argmax).

    Scale: k-means|| is the distributed-native initializer (O(iterations)
    passes, each one map-reduce over the vectors); the fitted centers are
    `n_centroids × dim` doubles — driver-side tiny — re-entering the plan
    as a literal DataFrame that every assignment join broadcasts."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    unit = F.transform(
        F.col(vec_col),
        lambda x: x.cast("double")
        / F.nullif(l2_norm(F.col(vec_col)), F.lit(0.0)),
    )
    feat = vectors.select(array_to_vector(unit).alias("features")).filter(
        F.col("features").isNotNull()
    )
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, initMode="k-means||"
    ).fit(feat)
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return vectors.sparkSession.createDataFrame(
        centers, "centroid_id int, cvec array<double>"
    )


def ivf_assign(
    vectors: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: str = "kmeans",
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Build a coarse IVF index: (centroids, assignments).

    ``centroids="kmeans"`` (default) learns centers with MLlib k-means||
    (:func:`kmeans_centroids`); ``"lowest_id"`` keeps the deterministic
    data-points-as-centers fallback (no fit pass — useful for fixture
    reproducibility and as the recall baseline the k-means path must
    beat, tests/test_vectors.py).  Assignment is one broadcast join +
    window argmin: each vector joins all centroids (tiny), keeps its
    nearest.  Result is hash-partitionable by `centroid_id` — the bucket
    key that makes 100 TB ANN a per-bucket scan instead of a full sweep."""
    if centroids == "kmeans":
        cents = kmeans_centroids(
            vectors, n_centroids, vec_col=vec_col, seed=seed
        )
    elif centroids == "lowest_id":
        cents = (
            vectors.orderBy(id_col)
            .limit(n_centroids)
            .select(
                F.col(id_col).cast("int").alias("centroid_id"),
                F.col(vec_col).alias("cvec"),
            )
        )
    else:
        raise ValueError(f"unknown centroid strategy: {centroids!r}")
    scored = vectors.select(
        F.col(id_col).alias("m_id"), F.col(vec_col).alias("mvec")
    ).crossJoin(F.broadcast(cents))
    w = Window.partitionBy("m_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id")
    )
    assignments = (
        scored.withColumn("sim", cosine(F.col("mvec"), F.col("cvec")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("m_id").alias(id_col), "centroid_id")
    )
    return cents, assignments


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: str = "kmeans",
) -> DataFrame:
    """Approximate top-k: probe the `n_probe` nearest IVF buckets only.

    Scale path for SURVEY §2C similarity search: search cost drops by
    ~n_probe/n_centroids vs brute force; recall is tunable via n_probe and
    validated against :func:`brute_force_topk` in the test suite."""
    cents, assign = ivf_assign(vectors, n_centroids, id_col, vec_col, centroids)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # which buckets does each query probe?
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qsim").desc(), F.col("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("qsim", cosine(F.col("qvec"), F.col("cvec")))
        .withColumn("prn", F.row_number().over(wq))
        .filter(F.col("prn") <= n_probe)
        .select("query_id", "qvec", "centroid_id")
    )
    # members of the probed buckets
    members = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("mvec")
    ).join(
        assign.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id"
    )
    scored = (
        members.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("mvec")).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def rp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane (sign) LSH signature: bit i = [vec · plane_i > 0],
    packed into one BIGINT (Charikar, STOC'02 §3).  P[bit agrees] =
    1 − θ/π for vectors at angle θ, so close vectors share long bit
    prefixes.

    Arrow-batched pandas UDF, not builtin folds: n_planes × dim literal
    arrays make a Catalyst expression tree whose analysis/codegen alone
    cost ~16 s at 48×64 (measured), while one numpy matmul per batch is
    milliseconds — the textbook case for a vectorized UDF over a
    hand-unrolled expression.  Deterministic: fixed plane matrix, IEEE
    float64 matmul, strict `> 0` threshold."""
    mat = np.asarray(planes, dtype=np.float64)  # (n_planes, dim)
    weights = (1 << np.arange(mat.shape[0], dtype=np.uint64)).astype(np.uint64)

    @F.pandas_udf("bigint")
    def sig(v: pd.Series) -> pd.Series:
        dense = np.stack(v.to_numpy())  # (batch, dim)
        bits = dense.astype(np.float64) @ mat.T > 0  # (batch, n_planes)
        packed = (bits.astype(np.uint64) * weights).sum(axis=1)
        return pd.Series(packed.astype(np.int64))

    return sig(vec)


def rp_band_pairs(
    vectors: DataFrame,
    threshold: float,
    n_planes: int = 16,
    band_bits: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 500,
) -> DataFrame:
    """Scale-safe cosine near-pair generation: sign-LSH banding → in-bucket
    ordered-pair expansion → exact cosine rescoring at ``threshold``.

    The all-pairs formulation (self-join on id<id) is O(n²) in vectors and
    dies at 100 TB; here candidates are only pairs sharing at least one
    `band_bits`-wide signature band (Charikar sign-LSH, same family as
    :func:`rp_lsh_topk`), so cost is one wide shuffle (the bucket groupBy)
    plus in-bucket expansion — the embedding-space twin of
    ``minhash_lsh_pairs``.  The signature is computed ONCE per row (bucket
    groupBy, not a self-join: Spark would not reuse the pandas-UDF stage
    across join sides), norms are hoisted per row before bucketing, and
    `max_bucket` caps degenerate buckets the same way the MinHash path does.

    Returns (id_a, id_b, sim) with id_a < id_b, each pair scored by exact
    cosine — LSH affects only recall, never precision."""
    if n_planes % band_bits != 0:
        raise ValueError(
            f"n_planes ({n_planes}) must be a multiple of band_bits "
            f"({band_bits}); trailing sign bits would be computed but "
            "never bucketed, silently lowering recall"
        )
    first = vectors.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None or first["d"] is None:
        raise ValueError(
            f"cannot infer dimensionality: vectors DataFrame is empty or "
            f"its first {vec_col!r} is NULL"
        )
    dim = int(first["d"])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim)).tolist()
    n_bands = n_planes // band_bits
    mask = (1 << band_bits) - 1

    sig = rp_signature(F.col(vec_col), planes)
    bands = F.array(
        *[
            F.shiftrightunsigned(sig, b * band_bits).bitwiseAND(
                F.lit(mask).cast("long")
            )
            for b in range(n_bands)
        ]
    )
    banded = vectors.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        l2_norm(F.col(vec_col)).alias("_n"),
        F.posexplode(bands).alias("band_no", "band_val"),
    )
    buckets = (
        banded.groupBy("band_no", "band_val")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_id", "_vec", "_n"))
            ).alias("_ms")
        )
        .filter(F.size("_ms") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("_ms") <= max_bucket)
    ms = F.col("_ms")
    pair_structs = F.flatten(
        F.transform(
            ms,
            lambda x, i: F.transform(
                F.slice(ms, i + 2, F.size(ms)),
                lambda y: F.struct(x.alias("x"), y.alias("y")),
            ),
        )
    )
    cands = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(
            F.col("p.x._id").alias("id_a"),
            F.col("p.y._id").alias("id_b"),
            F.col("p.x._vec").alias("_va"),
            F.col("p.y._vec").alias("_vb"),
            F.col("p.x._n").alias("_na"),
            F.col("p.y._n").alias("_nb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = dot(F.col("_va"), F.col("_vb")) / F.nullif(
        F.col("_na") * F.col("_nb"), F.lit(0.0)
    )
    return (
        cands.select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def rp_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 16,
    band_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH bucketing: candidates
    are vectors sharing at least one `band_bits`-wide signature band with
    the query; exact cosine rescoring + per-query window top-k.

    The hyperplane family is driver-generated (numpy, fixed seed) and
    enters the plan as literals — deterministic across runs and executors.
    Dimensionality comes from one metadata probe of the first row.

    Scale: one shuffle on (band_no, band_val); per-bucket fan-in is
    n/2^band_bits in expectation (uniform directions), so band_bits tunes
    the recall/cost point the way n_probe does for IVF — and the candidate
    join never touches vectors outside shared buckets."""
    if n_planes % band_bits != 0:
        raise ValueError(
            f"n_planes ({n_planes}) must be a multiple of band_bits "
            f"({band_bits}); trailing sign bits would be computed but "
            "never bucketed, silently lowering recall"
        )
    first = vectors.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None or first["d"] is None:
        raise ValueError(
            f"cannot infer dimensionality: vectors DataFrame is empty or "
            f"its first {vec_col!r} is NULL"
        )
    dim = int(first["d"])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_planes, dim)).tolist()
    n_bands = n_planes // band_bits
    mask = (1 << band_bits) - 1

    def with_bands(df: DataFrame, idname: str) -> DataFrame:
        sig = rp_signature(F.col(vec_col), planes)
        bands = F.array(
            *[
                F.shiftrightunsigned(sig, b * band_bits)
                .bitwiseAND(F.lit(mask).cast("long"))
                .alias(f"b{b}")
                for b in range(n_bands)
            ]
        )
        return df.select(
            F.col(id_col).alias(idname),
            F.col(vec_col).alias(f"{idname}_vec"),
            F.posexplode(bands).alias("band_no", "band_val"),
        )

    qb = with_bands(queries, "query_id")
    vb = with_bands(vectors, "neighbor_id")
    cands = (
        vb.join(F.broadcast(qb), ["band_no", "band_val"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "query_id_vec", "neighbor_id", "neighbor_id_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("query_id_vec"), F.col("neighbor_id_vec")).alias(
            "cosine_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            "cosine_sim",
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )
