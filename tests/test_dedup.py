"""Behavioral coverage for the rows-only dedup operators (q63/q64/q66):
planted near-duplicates must be found, unrelated docs must not pair, and
the Arrow-vectorized signature paths must be bit-identical to the
pure-builtin reference implementations."""

import pytest
from pyspark.sql import functions as F

from hadoop_sync_spark.functions.hashing import (
    hamming64,
    minhash_lsh_pairs,
    minhash_signature,
    minhash_signature_builtin,
    simhash64,
    simhash64_builtin,
)
from hadoop_sync_spark.functions.text import (
    normalize,
    shingles_of_tokens,
    tokens,
)

_BASE = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew strong potions beneath the ancient oak tree near the river"
)


def _planted_corpus(spark):
    """100 mutually-distinct docs (disjoint vocabularies → near-zero shingle
    overlap) + 2 exact copies of doc 0 and 1 one-word variant of it."""
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(30))) for i in range(1, 100)
    ]
    rows.append((0, _BASE))
    near = _BASE.replace("wizards", "sorcerers")
    rows += [(1000 + j, _BASE) for j in range(2)]
    rows.append((2000, near))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shingled(df):
    toks = df.select("doc_id", tokens(normalize(F.col("text"))).alias("tok"))
    return toks.select(
        "doc_id",
        F.array_distinct(shingles_of_tokens(F.col("tok"), 3)).alias("sh"),
    )


def test_minhash_arrow_is_bit_identical_to_builtin(spark):
    # the builtin REFERENCE formulation needs wraparound multiply
    # (a*h mod 2^64), which ANSI mode traps as overflow — evaluate the
    # comparison under a temporarily non-ANSI conf; the PRODUCTION Arrow
    # path wraps in numpy uint64 and stays ANSI-clean (the parity sweep
    # and driver run it under ANSI)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        sh = _shingled(_planted_corpus(spark))
        cmp = sh.select(
            minhash_signature(F.col("sh")).alias("a"),
            minhash_signature_builtin(F.col("sh")).alias("b"),
        )
        assert cmp.filter(F.col("a") != F.col("b")).count() == 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")


def test_simhash_arrow_is_bit_identical_to_builtin(spark):
    d = _planted_corpus(spark)
    tok = tokens(normalize(F.col("text")))
    cmp = d.select(
        simhash64(tok).alias("a"), simhash64_builtin(tok).alias("b")
    )
    assert cmp.filter(F.col("a") != F.col("b")).count() == 0


def test_minhash_lsh_finds_planted_duplicates(spark):
    pairs = minhash_lsh_pairs(
        _shingled(_planted_corpus(spark)), "doc_id", "sh", k=32, bands=8
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    planted = {(0, 1000), (0, 1001), (1000, 1001)}
    assert planted <= found, f"missing planted dup pairs: {planted - found}"
    # the one-word variant shares almost all shingles → should collide too
    assert any(2000 in p for p in found)
    # distinct filler docs must not flood the candidate set
    assert len(found) < 50


def test_simhash_near_duplicates_have_small_hamming(spark):
    d = _planted_corpus(spark)
    sig = d.select(
        "doc_id", simhash64(tokens(normalize(F.col("text")))).alias("s")
    )
    rows = {r["doc_id"]: r["s"] for r in sig.collect()}
    pair = spark.createDataFrame(
        [(rows[0], rows[2000]), (rows[0], rows[50])], "a long, b long"
    ).select(hamming64(F.col("a"), F.col("b")).alias("h"))
    near, far = [r["h"] for r in pair.collect()]
    assert near < far, (near, far)
    assert near <= 12


def test_empty_documents_do_not_flood_buckets(spark):
    rows = [(i, f"{_BASE} token{i}") for i in range(10)]
    rows += [(100 + j, "   ") for j in range(20)]  # 20 empty docs
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(
        _shingled(df), "doc_id", "sh", k=32, bands=8
    ).collect()
    ids = {i for r in pairs for i in (r["id_a"], r["id_b"])}
    assert all(i < 100 for i in ids), "sentinel signatures paired empty docs"


def test_mega_bucket_skew_guard(spark):
    """A degenerate corpus (hundreds of identical docs) must not expand a
    quadratic mega-bucket: the default `max_bucket` cap drops the bucket
    outright, so pair output stays bounded.  With the cap lifted the same
    corpus produces the full quadratic pair set — proving the guard is
    what bounds it."""
    rows = [(i, _BASE) for i in range(60)]
    rows += [(1000 + i, " ".join(f"u{i}v{j}" for j in range(30))) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = _shingled(df)
    capped = minhash_lsh_pairs(
        sh, "doc_id", "sh", k=32, bands=8, max_bucket=50
    ).count()
    uncapped = minhash_lsh_pairs(
        sh, "doc_id", "sh", k=32, bands=8, max_bucket=None
    ).count()
    assert uncapped == 60 * 59 // 2, uncapped
    assert capped == 0, capped


def test_connected_components_planted_chain(spark):
    """A~B, B~C, D~E must yield components {A,B,C} and {D,E} with the
    minimum id as the canonical label; convergence needs >1 round (the
    chain's transitive closure is not visible in any single edge)."""
    from hadoop_sync_spark.functions.graph import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (3, 4)], "src long, dst long"
    )
    got = {
        (r.node, r.component)
        for r in connected_components(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


@pytest.mark.slow
def test_star_components_match_label_propagation(spark):
    """large-star/small-star must agree with one-hop label propagation on
    random graphs (several seeds and densities) — same (node, component)
    set, including multi-component splits."""
    import random

    from hadoop_sync_spark.functions.graph import (
        connected_components,
        connected_components_star,
    )

    for seed, n, m in [(1, 60, 40), (2, 120, 80), (3, 200, 260)]:
        rng = random.Random(seed)
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        edges = spark.createDataFrame(pairs, "src long, dst long")
        lp = {
            (r.node, r.component) for r in connected_components(edges).collect()
        }
        st = {
            (r.node, r.component)
            for r in connected_components_star(edges).collect()
        }
        assert st == lp, (seed, st ^ lp)


def test_star_components_converge_on_long_chain(spark):
    """A 400-node path has diameter 399: label propagation would need
    ~400 rounds, large-star/small-star must finish in O(log² n) — well
    under 15 alternating rounds — and still label every node with the
    chain's minimum."""
    from hadoop_sync_spark.functions.graph import connected_components_star

    n = 400
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = {
        (r.node, r.component)
        for r in connected_components_star(edges, max_iter=15).collect()
    }
    assert got == {(i, 0) for i in range(n)}


def test_bloom_filter_no_false_negatives_and_low_fpr(spark):
    """The Bloom index must answer TRUE for EVERY inserted key (false
    negatives are what would corrupt q117's exactness) and stay under a
    2% false-positive rate on disjoint keys at the default sizing
    (2^20 bits / 5 hashes — 1% expected at ~87k keys, far above the
    fixture's)."""
    from hadoop_sync_spark.functions.hashing import (
        bloom_might_contain,
        build_bloom_bits,
    )
    from pyspark.sql import functions as F

    keys = spark.range(5000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("f")
    )
    packed = build_bloom_bits(keys, "f")
    probe = bloom_might_contain(packed)
    inserted = keys.select(probe(F.col("f")).alias("hit"))
    assert inserted.filter(~F.col("hit")).count() == 0

    others = spark.range(5000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("f")
    )
    fpr = (
        others.select(probe(F.col("f")).cast("int").alias("hit"))
        .agg(F.avg("hit"))
        .first()[0]
    )
    assert fpr < 0.02, f"false-positive rate {fpr}"


def test_bloom_null_keys_excluded_and_probe_propagates_null(spark):
    """NULL keys must not enter the filter (xxhash64 skips a NULL arg, so
    every NULL would otherwise share one fixed position set and probe
    'maybe'), and the probe must answer NULL — not TRUE/FALSE — for a
    NULL key so callers choose the null policy explicitly (round-3
    advice)."""
    from hadoop_sync_spark.functions.hashing import (
        bloom_might_contain,
        build_bloom_bits,
    )
    from pyspark.sql import functions as F

    keys = spark.range(100).select(
        F.when(F.col("id") < 50, F.concat(F.lit("k-"), F.col("id"))).alias(
            "f"
        )
    )  # 50 real keys + 50 NULLs
    packed = build_bloom_bits(keys, "f")
    # NULLs contributed nothing: same bits as the non-null subset alone
    non_null_packed = build_bloom_bits(keys.filter(F.col("f").isNotNull()), "f")
    assert (packed == non_null_packed).all()
    probe = bloom_might_contain(packed)
    rows = keys.select(
        F.col("f"), probe(F.col("f")).alias("hit")
    ).collect()
    for r in rows:
        if r["f"] is None:
            assert r["hit"] is None, "NULL key must probe NULL"
        else:
            assert r["hit"] is True


def test_bloom_incremental_dedup_equals_exact_path(spark, sf_dir):
    """q117 (Bloom-prefiltered) must return row-for-row the same
    classification as q99 (direct broadcast probe) — the Bloom is a
    cost lever, never a semantics one."""
    from hadoop_sync_spark.queries import load_all

    qs = load_all()
    a = sorted(
        tuple(r) for r in qs["q99_incremental_dedup"].fn(spark, sf_dir).collect()
    )
    b = sorted(
        tuple(r)
        for r in qs["q117_bloom_incremental_dedup"].fn(spark, sf_dir).collect()
    )
    assert a == b


def test_span_dedup_lone_empty_doc_matches_oracle(spark):
    """Review-caught parity hole: a document whose ONLY kept span is the
    empty string — Spark's nullif collapsed '' to NULL while DuckDB's
    string_agg kept ''; both sides now NULLIF, agreeing on NULL.  The
    committed fuzz corpus masked it (five docs share the empty span, so
    nd>=2 drops it before reassembly)."""
    import duckdb
    import pandas as pd

    from hadoop_sync_spark.queries.dedup import (
        span_dedup_frame,
        span_dedup_sql,
    )

    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["", "a b c d", "e f g h"]}
    )
    sdf = spark.createDataFrame(pdf, "doc_id long, text string")
    got = sorted(tuple(r) for r in span_dedup_frame(sdf, w=3).collect())
    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(tuple(r) for r in con.sql(
        span_dedup_sql("documents", w=3)
    ).fetchall())
    assert got == want
    # and the lone empty doc's reassembly is NULL on both engines
    assert got[0] == (0, 1, 0, None)


def test_materialize_and_free_releases_caches(spark):
    """The contract epilogue must free every listed cache (DataFrames
    and raw RDD handles alike), return the same rows as the lazy plan,
    and leave a frame that no longer depends on the freed caches."""
    from hadoop_sync_spark.queries._util import materialize_and_free

    jmap = spark.sparkContext._jsc.getPersistentRDDs
    base = spark.range(100).withColumn("v", F.col("id") * 2)
    cached = base.persist()
    cached.count()
    n_with = len(jmap())
    agg = cached.agg(F.sum("v").alias("s"))
    out = materialize_and_free(agg, [cached])
    assert len(jmap()) == n_with - 1
    assert out.collect() == agg.collect()  # recomputable without cache

    # no free list → lazy passthrough, nothing touched
    lazy = materialize_and_free(agg, None)
    assert lazy is agg


def test_tracked_ckpt_frees_exactly_its_checkpoint(spark):
    """_tracked_ckpt must hand back handles that free the checkpoint it
    created and nothing else."""
    from hadoop_sync_spark.functions.graph import _free, _tracked_ckpt

    jmap = spark.sparkContext._jsc.getPersistentRDDs
    other = spark.range(50).localCheckpoint()  # bystander cache
    n0 = len(jmap())
    df, handles = _tracked_ckpt(spark.range(10).withColumn("x", F.lit(1)))
    assert len(jmap()) == n0 + 1
    assert df.count() == 10
    _free(handles)
    assert len(jmap()) == n0  # bystander survives
    assert other.count() == 50


def test_component_loops_free_checkpoints_on_failure_paths(spark):
    """Round-3 advice: the checkpoint hygiene covered only the success
    path — the non-convergence RuntimeError (and any mid-loop exception)
    leaked every live handle.  Both loops must now release ALL their
    checkpoints on the error exit; on success exactly one checkpoint (the
    result's own) may remain live."""
    import pytest

    from hadoop_sync_spark.functions.graph import (
        connected_components,
        connected_components_star,
    )

    jmap = spark.sparkContext._jsc.getPersistentRDDs
    # a 12-node chain needs ~6 label-propagation rounds; max_iter=1 cannot
    # converge for either algorithm
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    n0 = len(jmap())
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)
    assert len(jmap()) == n0, "label-propagation error path leaked caches"
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(
            edges.withColumnRenamed("src", "a").withColumnRenamed(
                "dst", "b"
            ),
            src="a",
            dst="b",
            max_iter=1,
        )
    assert len(jmap()) == n0, "star error path leaked caches"

    # success path: only the result's own checkpoint stays live
    before = {int(k) for k in jmap().keySet().toArray()}
    out = connected_components(edges)
    live = jmap()
    new = [
        live.get(k)
        for k in live.keySet().toArray()
        if int(k) not in before
    ]
    assert len(new) == 1, "success path must keep exactly the result ckpt"
    assert out.filter(F.col("component") != 0).count() == 0
    for h in new:  # leave the session clean for other tests
        h.unpersist(False)


def test_vectorized_folds_are_chunk_invariant():
    """The chunked vectorized folds must give identical results whatever
    the chunk size: tiny chunks force every boundary case (doc spanning
    its own chunk, single over-long doc, chunk cut between docs) that the
    production 2^19/2^20 constants never hit on fixture batches.  Null
    and empty docs interleave with the numeric path."""
    import numpy as np
    import pandas as pd

    from hadoop_sync_spark.functions.hashing import (
        _minhash_fold,
        _perm_params,
        _simhash_fold,
    )

    rng = np.random.default_rng(7)
    docs: list = []
    for i in range(200):
        if i % 17 == 0:
            docs.append(None)
        elif i % 11 == 0:
            docs.append(np.array([], dtype=np.int64))
        else:
            n = int(rng.integers(1, 50)) if i % 5 else int(rng.integers(100, 300))
            docs.append(rng.integers(-(2**63), 2**63, size=n, dtype=np.int64))
    s = pd.Series(docs)

    params = _perm_params(32, 42)
    a_vec = np.array([a % (1 << 64) for a, _ in params], dtype=np.uint64)
    b_vec = np.array([b % (1 << 64) for _, b in params], dtype=np.uint64)
    sentinel = np.full(32, 0x7FFFFFFFFFFFFFFF, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)

    def canon_mh(res):
        return [None if v is None else list(v) for v in res]

    big_mh = canon_mh(_minhash_fold(s, a_vec, b_vec, sentinel, 1 << 30))
    big_sh = list(_simhash_fold(s, shifts, 1 << 30))
    for chunk in (1, 7, 64, 251):
        assert canon_mh(
            _minhash_fold(s, a_vec, b_vec, sentinel, chunk)
        ) == big_mh, f"minhash fold differs at chunk={chunk}"
        assert list(_simhash_fold(s, shifts, chunk)) == big_sh, (
            f"simhash fold differs at chunk={chunk}"
        )


def test_lsh_hashed_items_path_is_bit_identical(spark):
    """The round-13 fast path (caller caches element_hashes output and
    passes items_hashed=True) must emit exactly the pair set — ids AND
    est_jaccard bits — of the raw string-items path: the same xxhash64
    values reach the same Arrow fold either way, including empty docs
    (sentinel drop) whose cleaned arrays hash to empty arrays."""
    from hadoop_sync_spark.functions.hashing import element_hashes

    df = _planted_corpus(spark)
    # interleave whitespace-only docs to cover the sentinel branch
    blanks = spark.createDataFrame(
        [(9000 + j, "   ") for j in range(5)], "doc_id long, text string"
    )
    sh = _shingled(df.unionByName(blanks))
    via_strings = minhash_lsh_pairs(sh, "doc_id", "sh", k=32, bands=8)
    hashed = sh.select(
        "doc_id",
        element_hashes(F.array_remove(F.col("sh"), "")).alias("hs"),
    )
    via_hashes = minhash_lsh_pairs(
        hashed, "doc_id", "hs", k=32, bands=8, items_hashed=True
    )
    a = sorted(map(tuple, via_strings.collect()))
    b = sorted(map(tuple, via_hashes.collect()))
    assert a == b and len(a) > 0


def test_fused_capped_path_matches_unfused_derivation(spark):
    """ADVICE r13: the fused tagged-generator path (with_capped_ids=True
    — ONE generator emits pair and member structs, one groupBy yields
    both outputs) must agree with the unfused derivation on a corpus
    holding an over-cap bucket group, an exactly-at-cap group, and
    normal under-cap docs:

    - pairs == the unfused pair set (with_capped_ids=False, same cap);
    - capped == ids present in some >=2-member bucket but in NO
      under-cap >=2-member bucket (derived here via the uncapped pair
      set: an id pairs somewhere iff it has an under-cap bucket when
      cap=None means every bucket is under-cap... the reference is
      computed from group structure instead, see below).

    Group structure makes the expected capped set exact by
    construction: identical docs share identical signatures, so a
    group of size g lands g-strong in EVERY band bucket — over-cap
    groups are fully capped (no other band can rescue them), at-cap
    and under-cap groups pair completely and are never capped.
    """
    base_a = " ".join(f"a{i} b{i} c{i}" for i in range(40))
    base_b = " ".join(f"x{i} y{i} z{i}" for i in range(40))
    cap = 6
    rows = [(i, base_a) for i in range(10)]          # over-cap group
    rows += [(100 + i, base_b) for i in range(cap)]  # exactly-at-cap
    rows += [(1000 + i, " ".join(f"u{i}w{j}" for j in range(30)))
             for i in range(4)]                      # under-cap singles
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = _shingled(df)

    pairs_f, capped_f = minhash_lsh_pairs(
        sh, "doc_id", "sh", k=32, bands=8, max_bucket=cap,
        with_capped_ids=True,
    )
    got_pairs = {(r.id_a, r.id_b) for r in pairs_f.collect()}
    got_capped = {r.id_a for r in capped_f.collect()}

    pairs_u = minhash_lsh_pairs(
        sh, "doc_id", "sh", k=32, bands=8, max_bucket=cap,
    )
    want_pairs = {(r.id_a, r.id_b) for r in pairs_u.collect()}

    assert got_pairs == want_pairs
    # the at-cap group's full pair set must be present (cap is <=)
    at_cap = {100 + i for i in range(cap)}
    assert {(a, b) for a, b in want_pairs
            if a in at_cap and b in at_cap} == {
        (a, b) for a in at_cap for b in at_cap if a < b
    }
    # the over-cap group is fully capped; nobody else is
    assert got_capped == set(range(10))
    # est_jaccard payload identical across both paths for shared pairs
    est_f = {(r.id_a, r.id_b): r.est_jaccard for r in pairs_f.collect()}
    est_u = {(r.id_a, r.id_b): r.est_jaccard for r in pairs_u.collect()}
    assert est_f == est_u
