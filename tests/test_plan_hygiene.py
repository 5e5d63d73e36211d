"""Repo-wide plan hygiene: EVERY registered query's physical plan must be
free of cartesian products and nested-loop joins (the two operators that
turn a 100 TB query into a non-terminating one), except an explicit
allowlist of intentionally-bounded oracle cross-checks.

This is the blanket form of the targeted assertions in test_plans.py: a
new query cannot silently regress into a quadratic join shape without
either failing here or being consciously allowlisted."""

from __future__ import annotations

import pytest

from hadoop_sync_spark.queries import load_all

QUERIES = load_all()

#: Queries whose nested-loop/cross node is BOUNDED by construction — each
#: entry documents exactly which side is bounded and why that holds at
#: 100 TB (a data×data nested loop would never qualify).
BOUNDED_OK = {
    # bounded (vec_id < 300) oracle cross-check; scale path is q69/q71/q72
    "q65_embedding_dup_pairs",
    # brute-force exact top-k IS the all-pairs baseline by definition
    # (broadcast queries × corpus); the scale paths are q71 (IVF) and
    # q72 (sign-LSH) whose candidate joins are hash joins
    "q70_cosine_topk",
    # q71/q72/q111/q114 no longer need allowlisting: their _ann_contract
    # rows materialize to a LocalRelation (caches freed eagerly), so the
    # returned plan carries no joins at all; the operator-level join
    # shapes are asserted directly (test_ivf_candidate_join_is_hash_join
    # here, band-join and rescore shapes in tests/test_vectors.py)
    # the cross attaches a ONE-ROW min/max bounds aggregate to the
    # event-type dimension to generate the bucket spine — a scalar
    # attach, not a data×data join
    "q75_gap_fill_locf",
    # the cross attaches a ONE-ROW total-token-count aggregate to the
    # per-term counts (broadcast scalar attach for the ppm share)
    "q98_heavy_hitters",
    # same ONE-ROW total attach as q98; the sketch-vs-exact join itself
    # is a hash join on term
    "q105_misra_gries",
    # the cross attaches the ONE-ROW per-column bounds aggregate to the
    # histogram bucketing pass (broadcast scalar attach)
    "q100_column_profile",
    # the cross joins the ONE-ROW lineitem metrics aggregate to the
    # ONE-ROW orphan-count aggregate to assemble the 6-row report —
    # both sides are scalar by construction at any corpus size
    "q112_quality_constraints",
    # the crosses attach the ONE-ROW corpus-total and weight-normalizer
    # aggregates to the source-scale weight table (broadcast scalar
    # attaches, both sides bounded at any corpus size)
    "q131_temperature_mix",
    # the cross attaches the ONE-ROW corpus-total aggregate to the
    # vocab-bounded pair counts (the q98 scalar-attach idiom); the
    # incidence self-join itself is a hash join on doc_id
    "q136_token_pmi",
}

#: Queries whose fn() performs driver-side work beyond building a plan
#: (registry lifecycle, streaming drains) — exercised by their own tests.
SIDE_EFFECTING = {
    "q47_streaming_tumbling_window",
    "q82_registry_sync_lifecycle",
    "q95_compaction_lifecycle",
    "q101_time_travel",
    "q102_schema_evolution",
    "q103_zorder_box_query",
    "q104_format_roundtrip",
}

#: Contract queries whose fn() MATERIALIZES its one-row result (the
#: _ann_contract/_pair_contract/_component_contract cache-freeing
#: epilogue): the returned plan is a LocalRelation, so a plan assertion
#: here would be vacuous — and executing the full pipeline just to skip
#: wastes minutes.  Their join shapes are asserted at OPERATOR level:
#: test_ivf_candidate_join_is_hash_join below, the lsh_candidate_pairs /
#: rp_band_pairs plan tests in test_plans.py, and the band-join shapes
#: in tests/test_vectors.py.
MATERIALIZED_CONTRACT = {
    "q63_minhash_lsh_pairs",
    # since the round-5 contract-persist fix q64 persists its signature
    # frame and materializes the contract row to free it, so the returned
    # plan is a LocalRelation like q66's; its crosses are the same
    # ONE-ROW scalar attaches as before (block-consistency count,
    # id-disjointness), asserted nowhere else because the signature path
    # carries no data×data joins at all
    "q64_simhash_signatures",
    "q66_simhash_pairs",
    "q68_dup_components",
    "q69_semantic_dedup",
    "q71_ivf_topk",
    "q72_rp_lsh_topk",
    "q111_pq_topk",
    "q114_ivf_pq_topk",
    # operator-level shape asserted by test_triangle_joins_are_hash_joins
    "q123_copurchase_triangles",
    # materializes its top-20 to free the adjacency cache; the per-round
    # message-passing join shape is asserted on pagerank_quantized
    # directly (test_round6_ops.py)
    "q137_copurchase_pagerank",
    # materializes its node-scale driver-checked output to free the star
    # checkpoint; the star loop's join shapes are covered by the graph
    # equivalence/convergence tests
    "q106_chain_components",
}

SWEEP = sorted(set(QUERIES) - SIDE_EFFECTING)


@pytest.mark.parametrize("name", SWEEP)
def test_no_quadratic_join_shapes(spark, sf_dir, name):
    # skip BEFORE building/executing: a materialized contract's fn() runs
    # its whole pipeline, and an allowlisted query's plan is never
    # asserted — either way the fn() call would be pure wasted minutes
    if name in MATERIALIZED_CONTRACT:
        pytest.skip("fn() materializes a LocalRelation (documented above)")
    if name in BOUNDED_OK:
        pytest.skip("bounded cross by construction (documented above)")
    df = QUERIES[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested loop"


def test_ivf_candidate_join_is_hash_join(spark, sf_dir):
    """The IVF candidate join must be a hash join on centroid_id, or IVF
    has silently degraded to brute force.  Inspected on the operator
    itself — the q71 contract row now materializes to a LocalRelation
    (its caches are freed eagerly), so the pipeline plan is only visible
    pre-contract."""
    from pyspark.sql import functions as F

    from hadoop_sync_spark.functions.vectors import ivf_topk
    from hadoop_sync_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    topk = ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=4)
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin [centroid_id" in plan


def test_pq_internal_joins_are_hash_joins(spark, sf_dir):
    """pq_topk's internal joins (candidate-id fetch + query rescore) must
    stay hash joins — the q111 contract row materializes a LocalRelation,
    so without an operator-level assert a regression to
    BroadcastNestedLoopJoin in the rescore path would go unnoticed
    (round-3 advice)."""
    from pyspark.sql import functions as F

    from hadoop_sync_spark.functions.vectors import pq_topk
    from hadoop_sync_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    topk = pq_topk(emb, queries, k=10, m=8, ksub=16, n_candidates=30)
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, "PQ rescore degraded"
    assert "CartesianProduct" not in plan
    # candidate fetch keyed on neighbor_id, rescore keyed on query_id
    assert "BroadcastHashJoin [neighbor_id" in plan
    assert "BroadcastHashJoin [query_id" in plan


def test_ivf_pq_internal_joins_are_hash_joins(spark, sf_dir):
    """ivf_pq_topk's bucket probe (the ADC scan restriction) and both
    rescore joins must be hash joins: a nested-loop bucket probe would
    silently scan every code for every query — brute force with extra
    steps."""
    from pyspark.sql import functions as F

    from hadoop_sync_spark.functions.vectors import ivf_pq_topk
    from hadoop_sync_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    topk = ivf_pq_topk(
        emb, queries, k=10, n_centroids=16, n_probe=4, m=8, ksub=16
    )
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, "IVF-PQ probe degraded"
    assert "CartesianProduct" not in plan
    # bucket probe keyed on _bucket; rescore joins on neighbor_id/query_id
    assert "BroadcastHashJoin [_bucket" in plan
    assert "BroadcastHashJoin [neighbor_id" in plan
    assert "BroadcastHashJoin [query_id" in plan


def test_triangle_joins_are_hash_joins(spark, sf_dir):
    """q123's wedge join (e2.src = e1.dst) and closing-edge probe
    ((src,dst) equi-pair) must be hash joins, and the only cross joins
    are the one-row scalar attaches assembling the report.  Inspected on
    the lazy pipeline — the registered fn() materializes a
    LocalRelation."""
    from hadoop_sync_spark.queries.graph_q import triangle_pipeline

    assembled, caches = triangle_pipeline(spark, sf_dir, persist=False)
    assert caches == []
    plan = assembled._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # exactly the TWO one-row scalar attaches assembling the
    # (n_nodes, n_edges, n_triangles) report may be nested-loop crosses;
    # a third would mean a data-sized join degraded
    assert plan.count("BroadcastNestedLoopJoin") == 2
    # the wedge join (e2.src = e1.dst) and closing probe ((src,dst)
    # pair) must be equi-joins: hash or sort-merge, keyed on src/dst
    import re

    equi = [
        ln
        for ln in plan.splitlines()
        if re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", ln)
        and "src" in ln
        and "dst" in ln
    ]
    assert equi, f"no equi-join on (src, dst) found:\n{plan}"
