"""Vector similarity: the IVF approximate path must stay close to the
exact brute-force baseline (recall), and the scoring math must agree with
a numpy reference."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hadoop_sync_spark.functions.vectors import (
    brute_force_topk,
    cosine,
    ivf_topk,
)
from hadoop_sync_spark.io import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_cosine_matches_numpy(spark, emb):
    rows = emb.orderBy("vec_id").limit(6).collect()
    a, b = np.array(rows[0]["embedding"]), np.array(rows[1]["embedding"])
    expected = float(
        np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    )
    got = (
        spark.createDataFrame(
            [(rows[0]["embedding"], rows[1]["embedding"])],
            "a array<float>, b array<float>",
        )
        .select(cosine(F.col("a"), F.col("b")).alias("c"))
        .first()["c"]
    )
    assert math.isclose(got, expected, rel_tol=1e-6)


def test_ivf_recall_vs_brute_force(spark, emb):
    queries = emb.orderBy("vec_id").limit(8)
    exact = brute_force_topk(emb, queries, k=10)
    approx = ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=8)

    def pairs(df):
        return {
            (r["query_id"], r["neighbor_id"]) for r in df.collect()
        }

    e, a = pairs(exact), pairs(approx)
    recall = len(e & a) / len(e)
    # probing half the coarse buckets must recover most true neighbors
    assert recall >= 0.6, f"recall@10 = {recall:.2f}"
    # approx results are a subset of real vectors with sane scores
    assert all(
        -1.0 - 1e-6 <= r["cosine_sim"] <= 1.0 + 1e-6 for r in approx.collect()
    )


def test_kmeans_centroids_beat_lowest_id_at_equal_probe(spark, emb):
    """The k-means|| centroid path must beat the data-points-as-centers
    fallback at equal n_probe, measured on queries that are NOT centroids
    of either index (vec_id >= 400) — querying a centroid flatters the
    lowest-id strategy (its bucket IS the probe), which is exactly the
    bias real query traffic won't have."""
    queries = emb.filter(F.col("vec_id") >= 400).orderBy("vec_id").limit(12)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }

    def recall(strat):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                emb, queries, k=10, n_centroids=16, n_probe=4,
                centroids=strat,
            ).collect()
        }
        return len(exact & got) / len(exact)

    r_kmeans, r_lowest = recall("kmeans"), recall("lowest_id")
    assert r_kmeans > r_lowest, (r_kmeans, r_lowest)
    assert r_kmeans >= 0.55, r_kmeans


def test_brute_force_topk_is_exact(spark, emb):
    """Spot-check one query against a full numpy ranking."""
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    qid = rows[0]["vec_id"]
    q = vecs[qid]

    def cos(x):
        return float(np.dot(q, x) / (np.linalg.norm(q) * np.linalg.norm(x)))

    expected = sorted(
        ((cos(v), -i) for i, v in vecs.items() if i != qid), reverse=True
    )[:10]
    expected_ids = [-t[1] for t in expected]

    got = (
        brute_force_topk(emb, emb.filter(F.col("vec_id") == qid), k=10)
        .orderBy("rank")
        .collect()
    )
    assert [r["neighbor_id"] for r in got] == expected_ids


def test_rp_band_pairs_recall_precision_and_plan(spark, emb):
    """Coarse operating point (low threshold, 4-bit bands — the
    interactive/small-corpus config): sign-LSH banded pairs must recover
    nearly all exact cosine pairs, with perfect precision (candidates are
    exact-rescored), and the plan must contain no nested-loop/cartesian
    join.  The registered q69 runs the HIGH-threshold config — see
    test_rp_band_pairs_semantic_dedup_operating_point."""
    import itertools

    from hadoop_sync_spark.functions.vectors import rp_band_pairs

    pairs_df = rp_band_pairs(emb, 0.35, n_planes=48, band_bits=4)
    plan = pairs_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    got = {
        (r["id_a"], r["id_b"]): r["sim"] for r in pairs_df.collect()
    }
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    norms = {i: np.linalg.norm(v) for i, v in vecs.items()}
    exact = {}
    for a, b in itertools.combinations(sorted(vecs), 2):
        s = float(vecs[a] @ vecs[b] / (norms[a] * norms[b]))
        if s >= 0.35:
            exact[(a, b)] = s
    # precision 1.0: every emitted pair is a true pair with the true score
    assert set(got) <= set(exact), "LSH emitted a non-pair (precision < 1)"
    for p, s in got.items():
        assert math.isclose(s, exact[p], rel_tol=1e-9)
    # recall: most pairs overall, all of the confidently-similar ones
    recall = len(got) / max(len(exact), 1)
    assert recall >= 0.75, f"recall@0.35 = {recall:.2f}"
    hi = {p for p, s in exact.items() if s >= 0.5}
    assert hi <= set(got), f"missing high-sim pairs: {hi - set(got)}"


def test_rp_band_pairs_semantic_dedup_operating_point(spark, emb):
    """The registered q69 config (θ=0.9, 60 planes / 12-bit bands) must be
    BOTH complete on true duplicates and selective: every planted exact
    clone pair surfaces (identical sign bits → collides in every band),
    and nothing else does — the fixture cloud's max off-diagonal cosine is
    ~0.5, so any extra emitted pair means the rescore threshold leaked.
    Selectivity is the scale property: at 2^-12 per-band background
    collision, candidates stay ~0.1% of n² instead of the coarse config's
    ~75%."""
    from hadoop_sync_spark.functions.vectors import rp_band_pairs

    offset = 1_000_000
    clones = (
        emb.filter(F.col("vec_id") % 25 == 0)
        .withColumn("vec_id", F.col("vec_id") + offset)
    )
    corpus = emb.unionByName(clones)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in rp_band_pairs(
            corpus, 0.9, n_planes=60, band_bits=12
        ).collect()
    }
    expected = {
        (r["vec_id"], r["vec_id"] + offset)
        for r in emb.filter(F.col("vec_id") % 25 == 0).collect()
    }
    assert expected <= pairs, f"missing clone pairs: {expected - pairs}"
    assert pairs == expected, f"unexpected non-clone pairs: {pairs - expected}"


def test_rp_signature_lazy_matches_eager(spark, emb):
    """The probe-free signature path (plane matrix generated inside the
    UDF from the first batch's dim) must be bit-identical to the
    driver-generated eager path — both are RandomState(seed).normal of the
    same shape, so any drift means the lazy path broke determinism."""
    import numpy as np

    from hadoop_sync_spark.functions.vectors import (
        rp_signature,
        rp_signature_lazy,
    )

    planes = np.random.RandomState(7).normal(size=(24, 64)).tolist()
    eager = {
        r["vec_id"]: r["s"]
        for r in emb.select(
            "vec_id", rp_signature(F.col("embedding"), planes).alias("s")
        ).collect()
    }
    lazy = {
        r["vec_id"]: r["s"]
        for r in emb.select(
            "vec_id",
            rp_signature_lazy(F.col("embedding"), 24, seed=7).alias("s"),
        ).collect()
    }
    assert eager == lazy


def test_rp_lsh_recall_and_determinism(spark, emb):
    """Sign-LSH bucketing must recover most true neighbors in the
    fixture's near-uniform regime (48 planes × 4-bit bands) and be
    bit-deterministic across runs (fixed hyperplane seed)."""
    from hadoop_sync_spark.functions.vectors import rp_lsh_topk

    queries = emb.orderBy("vec_id").limit(8)
    exact = brute_force_topk(emb, queries, k=10)
    approx = rp_lsh_topk(emb, queries, k=10, n_planes=48, band_bits=4)

    def pairs(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    e, a = pairs(exact), pairs(approx)
    recall = len(e & a) / len(e)
    assert recall >= 0.55, f"recall@10 = {recall:.2f}"
    again = pairs(rp_lsh_topk(emb, queries, k=10, n_planes=48, band_bits=4))
    assert a == again


def test_pq_topk_recall_codes_and_determinism(spark, emb):
    """PQ ADC must (a) encode every non-degenerate vector to exactly m
    codes in [0, ksub), (b) beat a 0.5 pooled-recall floor at the q111
    operating point (measured ~0.8 at sf0.001-0.01 — generous margin),
    and (c) be run-to-run deterministic (fixed seed, fixed-order numpy
    reductions)."""
    from hadoop_sync_spark.functions.vectors import (
        pq_codebooks,
        pq_encode,
        pq_topk,
    )

    m, ksub = 8, 16
    books = pq_codebooks(emb, m=m, ksub=ksub)
    assert books.shape[0] == m and books.shape[1] <= ksub
    codes = pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes[:20]:
        assert len(r["pq_codes"]) == m
        assert all(0 <= c < ksub for c in r["pq_codes"])

    queries = emb.filter(F.col("vec_id") < 5)
    ann = pq_topk(emb, queries, k=10, m=m, ksub=ksub, n_candidates=50)
    exact = brute_force_topk(emb, queries, k=10)
    a = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    assert len(a & e) / len(e) >= 0.5

    again = pq_topk(emb, queries, k=10, m=m, ksub=ksub, n_candidates=50)
    assert {(r["query_id"], r["neighbor_id"], r["rank"]) for r in again.collect()} == {
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in ann.collect()
    }


def test_pq_dim_not_divisible_raises(spark):
    from hadoop_sync_spark.functions.vectors import pq_codebooks

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="divisible"):
        pq_codebooks(df, m=2)


def test_ivf_pq_topk_completeness_and_recall(spark, emb):
    """The composed IVF-PQ path must return exactly k neighbors per
    query and beat a 0.3 pooled-recall floor at the q114 operating
    point (measured ~0.54 at sf0.01; the probe restriction costs
    recall vs plain PQ, the documented IVF trade)."""
    from hadoop_sync_spark.functions.vectors import ivf_pq_topk

    queries = emb.filter(F.col("vec_id") < 5)
    ann = ivf_pq_topk(emb, queries, k=10)
    exact = brute_force_topk(emb, queries, k=10)
    a = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    per_q = {}
    for q, _ in a:
        per_q[q] = per_q.get(q, 0) + 1
    assert set(per_q.values()) == {10}
    assert len(a & e) / len(e) >= 0.3
