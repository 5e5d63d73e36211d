"""Behavioral tests for the round-6 operators on CRAFTED inputs — the
fixture-parity sweep (test_oracle_parity) already cross-checks every
registered query against DuckDB on the fixtures; these tests pin the
semantics on hand-computable cases and on edge shapes the fixtures don't
contain (chunk tails shorter than the overlap, all-simultaneous event
streams, negative-balance banding, independence-lift identities).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hadoop_sync_spark.queries import load_all


def _mk_documents(spark, rows, out):
    """rows: (doc_id, text); writes a documents.parquet the queries read."""
    spark.createDataFrame(
        [(i, txt, "en", "crafted", len(txt)) for i, txt in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(out) + "/documents.parquet")
    return str(out)


def _mk_events(spark, rows, out):
    """rows: (event_id, user_id, us_seconds, value)."""
    spark.createDataFrame(
        [(eid, uid, "e", us * 1_000_000, val) for eid, uid, us, val in rows],
        "event_id long, user_id long, event_type string, _us long,"
        " value double",
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_micros(F.col("_us")).alias("ts"),
        "value",
        F.lit("{}").alias("props"),
    ).write.parquet(str(out) + "/events.parquet")
    return str(out)


# --------------------------------------------------------------------------
# q133 — overlapping token-window chunking
# --------------------------------------------------------------------------
def _chunks(spark, sf_dir):
    return {
        r["chunk_no"]: (r["start_tok"], r["chunk_len"], r["chunk_sig"])
        for r in load_all()["q133_doc_chunks"].fn(spark, sf_dir).collect()
    }


def test_chunking_covers_every_token_with_10_token_overlap(spark, tmp_path):
    """100 tokens → starts 0/30/60/90 with lengths 40/40/40/10; chunk k
    covers [30k, 30k+39], so consecutive chunks overlap by exactly 10 and
    every token index lands in at least one chunk."""
    toks = [f"t{i:03d}" for i in range(100)]
    sf = _mk_documents(spark, [(1, " ".join(toks))], tmp_path)
    got = _chunks(spark, sf)
    assert {k: v[:2] for k, v in got.items()} == {
        0: (0, 40),
        1: (30, 40),
        2: (60, 40),
        3: (90, 10),
    }
    # signatures are md5 of the space-joined window
    assert (
        got[3][2] == hashlib.md5(" ".join(toks[90:100]).encode()).hexdigest()
    )
    covered = set()
    for _, (s, ln, _sig) in got.items():
        covered.update(range(s, s + ln))
    assert covered == set(range(100))


def test_chunking_tail_shorter_than_overlap_and_tiny_docs(spark, tmp_path):
    """31 tokens → a second chunk of length 1 (the stride landed before
    the end, so the tail chunk exists even though the first chunk already
    covered 40 > 31); 30 tokens → exactly one chunk; 1 token → one
    1-token chunk."""
    sf = _mk_documents(
        spark,
        [
            (1, " ".join(f"a{i}" for i in range(31))),
            (2, " ".join(f"b{i}" for i in range(30))),
            (3, "solo"),
        ],
        tmp_path,
    )
    rows = load_all()["q133_doc_chunks"].fn(spark, sf).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_no"], r["start_tok"], r["chunk_len"])
        )
    assert sorted(by_doc[1]) == [(0, 0, 31), (1, 30, 1)]
    assert sorted(by_doc[2]) == [(0, 0, 30)]
    assert sorted(by_doc[3]) == [(0, 0, 1)]


# --------------------------------------------------------------------------
# q134 — interval-weighted (time-weighted) average
# --------------------------------------------------------------------------
def test_twap_weights_by_holding_duration(spark, tmp_path):
    """val 10.00 held 10s, then 20.00 held 30s, final event open-ended →
    TWAP = (10·10 + 20·30)/40 = 17.5 ≠ the plain AVG 10.0 of the three
    observations — exactly the burst-robustness a time-weighted mean
    buys."""
    sf = _mk_events(
        spark,
        [(1, 7, 0, 10.0), (2, 7, 10, 20.0), (3, 7, 40, 999.0)],
        tmp_path,
    )
    rows = load_all()["q134_interval_weighted_avg"].fn(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["user_id"], r["n_intervals"], r["total_dur_s"]) == (7, 2, 40)
    assert r["twap"] == 17.5


def test_twap_excludes_zero_weight_and_single_event_users(spark, tmp_path):
    """A single-event user has no closing bound (no interval); a user
    whose events all share one timestamp has total weight 0 — both are
    excluded rather than producing NULL/∞ rows.  Sub-second gaps truncate
    to 0 seconds (integer division), so user 9's one real interval also
    carries weight 0 and is excluded."""
    sf = _mk_events(
        spark,
        [
            (1, 1, 100, 5.0),  # single event
            (2, 2, 100, 5.0),
            (3, 2, 100, 7.0),  # simultaneous pair → weight 0
            (4, 9, 0, 5.0),
            (5, 9, 0, 7.0),  # same second → dur_s = 0
        ],
        tmp_path,
    )
    assert load_all()["q134_interval_weighted_avg"].fn(spark, sf).count() == 0


# --------------------------------------------------------------------------
# q135 — k-anonymity suppression audit
# --------------------------------------------------------------------------
def _mk_customer(spark, rows, out):
    """rows: (nationkey, mktsegment, acctbal) one per customer."""
    spark.createDataFrame(
        [(i, nk, seg, bal) for i, (nk, seg, bal) in enumerate(rows)],
        "c_custkey long, c_nationkey long, c_mktsegment string,"
        " c_acctbal double",
    ).write.parquet(str(out) + "/customer.parquet")
    return str(out)


def test_k_anonymity_keeps_only_groups_of_5_plus(spark, tmp_path):
    """Nation 1: one QI group of 5 (kept) + one of 2 (suppressed);
    nation 2: one group of 4 → everything suppressed."""
    rows = (
        [(1, "AUTO", 500.0)] * 5
        + [(1, "STEEL", 500.0)] * 2
        + [(2, "AUTO", 1500.0)] * 4
    )
    sf = _mk_customer(spark, rows, tmp_path)
    got = {
        r["c_nationkey"]: (
            r["n_groups"],
            r["n_groups_kept"],
            r["n_rows_kept"],
            r["n_rows_suppressed"],
        )
        for r in load_all()["q135_k_anonymity"].fn(spark, sf).collect()
    }
    assert got == {1: (2, 1, 5, 2), 2: (1, 0, 0, 4)}


def test_k_anonymity_balance_banding_truncates_toward_zero(spark, tmp_path):
    """Banding is scaled-cents integer division truncating toward zero on
    BOTH engines, so -500.00 and +500.00 share band 0 (the zero band is
    double-width, a documented property of truncation) while 1500.00
    bands to 1 and -1500.00 to -1."""
    rows = [(1, "AUTO", b) for b in (-500.0, 500.0) for _ in range(5)] + [
        (1, "AUTO", 1500.0)
    ] * 5 + [(1, "AUTO", -1500.0)] * 5
    sf = _mk_customer(spark, rows, tmp_path)
    got = load_all()["q135_k_anonymity"].fn(spark, sf).collect()
    # bands: 0 (±500 together, 10 rows), 1 (5 rows), -1 (5 rows) → 3
    # groups, all ≥ 5 → all kept
    assert [
        (r["n_groups"], r["n_groups_kept"], r["n_rows_kept"]) for r in got
    ] == [(3, 3, 20)]


# --------------------------------------------------------------------------
# q136 — co-occurrence lift (quantized PMI)
# --------------------------------------------------------------------------
def test_pmi_lift_identities_on_crafted_corpus(spark, tmp_path):
    """10 docs all containing {a b}; {c d} co-occur in the 5 docs where
    both appear.  lift(a,b) = 10·10·10⁶÷(10·10) = exactly 1e6 ppm
    (ubiquitous pairs carry NO association signal — lift 1.0); lift(c,d)
    = 5·10·10⁶÷(5·5) = 2e6 ppm (perfect co-occurrence at df 5 doubles
    it).  Cross pairs like (a,c) have co_df 5 = df_c·df_a/N → also 1e6:
    independence shows up as exactly 10⁶ whenever counts allow it."""
    docs = []
    for i in range(10):
        text = "a b" + (" c d" if i < 5 else "")
        docs.append((i, text))
    sf = _mk_documents(spark, docs, tmp_path)
    got = {
        (r["term_a"], r["term_b"]): (
            r["co_df"],
            r["df_a"],
            r["df_b"],
            r["lift_ppm"],
        )
        for r in load_all()["q136_token_pmi"].fn(spark, sf).collect()
    }
    assert got[("a", "b")] == (10, 10, 10, 1_000_000)
    assert got[("c", "d")] == (5, 5, 5, 2_000_000)
    assert got[("a", "c")] == (5, 10, 5, 1_000_000)
    # support guard: nothing below 5 co-docs surfaces
    assert all(v[0] >= 5 for v in got.values())


# --------------------------------------------------------------------------
# _pair_contract — empty-corpus NULL-safety (round-6 review fix)
# --------------------------------------------------------------------------
def test_pair_contract_empty_corpus_matches_oracle_shape(spark, tmp_path):
    """An empty regenerated fixture must yield (0, TRUE, TRUE, TRUE) like
    the DuckDB oracle — the folded contract's SUM-based counts return
    NULL over zero rows without the coalesce (the old per-frame COUNT(*)
    jobs returned 0)."""
    sf = _mk_documents(spark, [], tmp_path)
    for q in ("q63_minhash_lsh_pairs", "q66_simhash_pairs"):
        rows = load_all()[q].fn(spark, sf).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (
            r["n_planted"],
            r["clone_recall_ok"],
            r["candidate_bound_ok"],
            r["ids_disjoint_ok"],
        ) == (0, True, True, True), q


# --------------------------------------------------------------------------
# _pair_contract — falsifiability of the folded algebra (round-6 fold)
# --------------------------------------------------------------------------
def _contract_row(spark, pairs_rows, capped_ids=(), n_docs=150):
    """Run _pair_contract directly on crafted frames: docs 0..n_docs-1
    with single-token texts, clone ids shifted by _CLONE_OFFSET; `pairs`
    is handed in verbatim so tests can withhold or inflate candidates."""
    from hadoop_sync_spark.queries.dedup import _CLONE_OFFSET, _pair_contract

    original = spark.createDataFrame(
        [(i, ["tok"]) for i in range(n_docs)], "doc_id long, sh array<string>"
    )
    pairs = spark.createDataFrame(
        pairs_rows or [], "id_a long, id_b long"
    )
    capped = spark.createDataFrame(
        [(i,) for i in capped_ids] or [], "id_a long"
    )
    from pyspark.sql import functions as F  # noqa: F811

    return _pair_contract(
        pairs,
        original,
        "doc_id",
        "id_a",
        "id_b",
        eligible_pred=F.size(F.array_remove(F.col("sh"), "")) > 0,
        capped=capped,
    ).collect()[0]


def test_pair_contract_catches_withheld_clone_pair(spark):
    """Planted ids with n_docs=150 and _CLONE_MOD=50 are {0, 50, 100};
    emitting only two of the three expected clone pairs must flip
    clone_recall_ok to False — the contract is falsifiable, not
    vacuously green."""
    from hadoop_sync_spark.queries.dedup import _CLONE_OFFSET

    full = [(p, p + _CLONE_OFFSET) for p in (0, 50, 100)]
    ok = _contract_row(spark, full)
    assert (ok["n_planted"], ok["clone_recall_ok"]) == (3, True)
    missing = _contract_row(spark, full[:2])
    assert (missing["n_planted"], missing["clone_recall_ok"]) == (3, False)


def test_pair_contract_capped_id_excuses_only_its_own_pair(spark):
    """Declaring id 100 capped exempts exactly its pair from the recall
    requirement: withholding (100, clone) passes, but withholding an
    UNCAPPED pair still fails."""
    from hadoop_sync_spark.queries.dedup import _CLONE_OFFSET

    two = [(p, p + _CLONE_OFFSET) for p in (0, 50)]
    assert _contract_row(spark, two, capped_ids=[100])[
        "clone_recall_ok"
    ] is True
    assert _contract_row(spark, two[:1], capped_ids=[100])[
        "clone_recall_ok"
    ] is False


def test_pair_contract_capped_pair_cannot_mask_missing_uncapped(spark):
    """The masking scenario from the round-6 ADVICE: id 100 is capped,
    its pair is (impossibly) emitted anyway, and the UNCAPPED pair for
    id 0 is withheld.  _found would read 3-1=2 == _ne_pre - _ncap under
    count-only algebra — the _found_capped guard must flip the verdict
    to False instead of letting the offsets cancel."""
    from hadoop_sync_spark.queries.dedup import _CLONE_OFFSET

    masked = [(p, p + _CLONE_OFFSET) for p in (50, 100)]  # 0 withheld
    r = _contract_row(spark, masked, capped_ids=[100])
    assert r["clone_recall_ok"] is False
    # control: same capped declaration with honest emission (capped pair
    # absent, both uncapped pairs present) still passes
    honest = [(p, p + _CLONE_OFFSET) for p in (0, 50)]
    assert _contract_row(spark, honest, capped_ids=[100])[
        "clone_recall_ok"
    ] is True


def test_pair_contract_catches_quadratic_candidate_blowup(spark):
    """A pair output larger than max_pairs_per_row × corpus must flip
    candidate_bound_ok — with n_docs=150 (+3 clones) the bound is
    5 × 153; 800 distinct pairs exceed it."""
    from hadoop_sync_spark.queries.dedup import _CLONE_OFFSET

    full = [(p, p + _CLONE_OFFSET) for p in (0, 50, 100)]
    blowup = full + [(10_000 + i, 20_000 + i) for i in range(800)]
    r = _contract_row(spark, blowup)
    assert r["clone_recall_ok"] is True
    assert r["candidate_bound_ok"] is False


# --------------------------------------------------------------------------
# q137 — quantized PageRank: pure-Python mirror + structural properties
# --------------------------------------------------------------------------
def _py_pagerank(edges, iters=3, scale=1_000_000_000):
    """Exact Python mirror of pagerank_quantized's integer recurrence:
    undirected edges → per-node score after `iters` rounds."""
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    n = len(adj)
    base = (15 * (scale // n)) // 100
    s = {v: scale // n for v in adj}
    for _ in range(iters):
        contrib = {v: 0 for v in adj}
        for u, nbrs in adj.items():
            w = s[u] // len(nbrs)
            for v in nbrs:
                contrib[v] += w
        s = {v: base + (85 * contrib[v]) // 100 for v in adj}
    return {v: (len(adj[v]), s[v]) for v in adj}


def _spark_pagerank(spark, edges):
    from hadoop_sync_spark.queries.graph_q import pagerank_quantized

    e0 = spark.createDataFrame(edges, "u long, v long")
    adj = e0.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(e0.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    return {
        r["node"]: (r["d"], r["s"])
        for r in pagerank_quantized(adj).collect()
    }


def test_pagerank_matches_pure_python_mirror_exactly(spark):
    """Star-with-tail graph (hub 0 — leaves 1..4, leaf 4 chains to 5):
    the Spark recurrence must equal the Python mirror BIT-FOR-BIT on
    every node — same truncating divisions, same order-independent
    integer sums."""
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (4, 5)]
    assert _spark_pagerank(spark, edges) == _py_pagerank(edges)


def test_pagerank_symmetry_and_hub_dominance(spark):
    """K4: every node is structurally identical → identical scores.
    Star: the hub outranks every leaf, and structurally-identical leaves
    tie exactly."""
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _spark_pagerank(spark, k4)
    assert len({sv for _, sv in got.values()}) == 1
    star = [(0, i) for i in range(1, 6)]
    got = _spark_pagerank(spark, star)
    hub = got[0][1]
    leaf_scores = {got[i][1] for i in range(1, 6)}
    assert len(leaf_scores) == 1
    assert hub > leaf_scores.pop()


def test_pagerank_iteration_join_is_hash_join(spark):
    """Each message-passing round must be a hash/shuffle join on src —
    a nested-loop here would be O(V·E) per round at 100 TB."""
    from hadoop_sync_spark.queries.graph_q import pagerank_quantized

    e0 = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "u long, v long"
    )
    adj = e0.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionAll(e0.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    plan = (
        pagerank_quantized(adj)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # the lazy (test) form re-instantiates the init's ONE-ROW n_nodes
    # broadcast attach per unrolled round (q137 itself persists each
    # round, collapsing these) — every nested-loop node must be that
    # Cross-typed scalar attach, never a data×data join
    import re

    bnlj = [
        l for l in plan.splitlines() if "BroadcastNestedLoopJoin" in l
    ]
    assert bnlj and all(
        re.search(r"BuildRight, Cross", l) for l in bnlj
    ), bnlj
    # the message joins themselves are shuffle joins on src
    assert plan.count("SortMergeJoin [src") + plan.count(
        "ShuffledHashJoin [src"
    ) >= 3


def test_pagerank_matches_python_mirror_on_random_graph(spark):
    """200-node seeded random graph (~600 edges, hubs and isolates-free):
    bit-equality against the Python mirror on a shape large enough that
    truncation drift, join duplication, or aggregation-order effects
    would show if any existed."""
    import random

    rng = random.Random(99)
    edges = sorted(
        {
            (min(u, v), max(u, v))
            for u, v in (
                (rng.randrange(200), rng.randrange(200)) for _ in range(700)
            )
            if u != v
        }
    )
    assert _spark_pagerank(spark, edges) == _py_pagerank(edges)
