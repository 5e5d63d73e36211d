"""Deduplication operators over `documents` (driver L3 mandate).

Tiers, cheapest → fuzziest:
  exact (md5 grouping) → token-set (order-insensitive) → n-gram Jaccard
  (exact set similarity on bounded candidates) → MinHash-LSH (scalable
  candidate generation) → SimHash (bit-signature).

Exact/token-set/Jaccard are SQL-expressible → DuckDB oracles.  MinHash/
SimHash/sign-LSH signatures depend on xxhash64 (no DuckDB twin) → their
driver rows are planted-clone acceptance contracts (oracle-pinned planted
count + deterministic recall/bound booleans; see the contract section
below), with pair-level behavioral tests in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from hadoop_sync_spark.queries import register
from hadoop_sync_spark.queries._util import materialize_and_free, t
from hadoop_sync_spark.functions.hashing import (
    element_hashes,
    hamming64,
    minhash_lsh_pairs,
    simhash64,
)
from hadoop_sync_spark.functions.text import (
    fingerprint,
    token_set_key,
    tokens,
    normalize,
)

from hadoop_sync_spark.functions.text import WS_RE

_SQL_TOKENS = f"string_split_regex(trim(text, ' '), '{WS_RE}')"
_SQL_NORM_TOKENS = f"string_split_regex(trim(lower(trim(text, ' ')), ' '), '{WS_RE}')"


# --------------------------------------------------------------------------
# q60 — exact dedup: deterministic survivors
# --------------------------------------------------------------------------
@register(
    "q60_exact_dedup",
    oracle="""
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    JOIN (
        SELECT MIN(doc_id) AS doc_id
        FROM documents
        GROUP BY md5(lower(trim(text, ' ')))
    ) k USING (doc_id)
    """,
    tags=("dedup", "exact"),
)
def q60_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication with deterministic survivor selection (lowest
    doc_id per content fingerprint) — hash-groupBy dedup, the 100 TB-safe
    form of ``dropDuplicates`` (one shuffle on the fingerprint).

    Scale: group key is the 128-bit md5, uniformly distributed → no skew;
    survivors join back semi-style on doc_id."""
    d = t(spark, sf_dir, "documents")
    keep = (
        d.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return d.join(keep, "doc_id", "left_semi").select("doc_id", "lang", "source")


# --------------------------------------------------------------------------
# q61 — token-set (order/multiplicity-insensitive) dedup groups
# --------------------------------------------------------------------------
@register(
    "q61_token_set_dedup",
    oracle=f"""
    SELECT md5(array_to_string(list_sort(list_distinct({_SQL_NORM_TOKENS})), ' '))
             AS set_key,
           COUNT(*) AS doc_cnt,
           MIN(doc_id) AS keep_doc_id
    FROM documents
    GROUP BY set_key
    HAVING COUNT(*) > 0
    """,
    tags=("dedup", "near"),
)
def q61_token_set_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup grouping on the sorted-distinct-token key: catches documents
    that are word-order shuffles or repetition-padded copies of each other
    (a common crawl-dup pattern a raw md5 misses)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", token_set_key(F.col("text")).alias("set_key"))
        .groupBy("set_key")
        .agg(F.count("*").alias("doc_cnt"), F.min("doc_id").alias("keep_doc_id"))
    )


def _banded_jaccard_pairs(
    sets: DataFrame, arr_col: str, span: int, threshold: float
) -> DataFrame:
    """Exact set-Jaccard over a bounded candidate window, as a hash join.

    `sets` carries (doc_id, lang, <arr_col>: array).  Candidates are
    same-language pairs with doc_b ∈ (doc_a, doc_a+span] — which means
    doc_b's span-wide id block is doc_a's block or the next one, so
    probing two blocks per left row turns the theta join into a
    hash-joinable equi join on (lang, block).  A raw non-equi condition on
    doc ids plans as a per-language nested-loop sweep — quadratic in
    docs-per-language (plan-asserted in tests/test_plans.py).  Shared by
    q62 (token sets) and q67 (char-4-gram sets)."""
    blk = (F.col("doc_id") / span).cast("long")
    a = sets.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("lang_a"),
        F.col(arr_col).alias("arr_a"),
        F.explode(F.array(blk, blk + 1)).alias("blk_a"),
    )
    b = sets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col(arr_col).alias("arr_b"),
        blk.alias("blk_b"),
    )
    joined = a.join(
        b,
        (F.col("blk_a") == F.col("blk_b"))
        & (F.col("lang_a") == F.col("lang_b"))
        & (F.col("doc_a") < F.col("doc_b"))
        & (F.col("doc_b") <= F.col("doc_a") + span),
    )
    inter = F.size(F.array_intersect(F.col("arr_a"), F.col("arr_b")))
    staged = joined.select(
        "doc_a",
        "doc_b",
        inter.alias("nc"),
        F.size("arr_a").alias("na"),
        F.size("arr_b").alias("nb"),
    )
    jac = F.col("nc").cast("double") / (F.col("na") + F.col("nb") - F.col("nc"))
    return (
        staged.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Repartition a single-file table so per-row array work uses all
    cores (a small parquet file arrives as one partition)."""
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par, "doc_id")
    return df


# --------------------------------------------------------------------------
# q62 — exact n-gram (token) Jaccard on bounded candidate pairs
# --------------------------------------------------------------------------
@register(
    "q62_jaccard_pairs",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, list_distinct({_SQL_NORM_TOKENS}) AS tok
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
             / (len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok)))
             AS jaccard
    FROM toks a JOIN toks b
      ON a.lang = b.lang
     AND a.doc_id < b.doc_id
     AND b.doc_id <= a.doc_id + 10
    WHERE CAST(len(list_intersect(a.tok, b.tok)) AS DOUBLE)
             / (len(a.tok) + len(b.tok) - len(list_intersect(a.tok, b.tok)))
          >= 0.3
    """,
    tags=("dedup", "jaccard"),
)
def q62_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-Jaccard similarity over a bounded candidate window
    (same-language, nearby doc_ids) — the verification stage every
    LSH-generated candidate pair goes through, run here standalone so the
    arithmetic itself is oracle-checked.

    Scale: candidate generation in production comes from LSH buckets (q63),
    never from an unbounded self-join; the banded join here bounds work the
    same way."""
    d = _spread(spark, t(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        "lang",
        F.array_distinct(tokens(normalize(F.col("text")))).alias("tok"),
    )
    return _banded_jaccard_pairs(toks, "tok", span=10, threshold=0.3)


# --------------------------------------------------------------------------
# q67 — exact character-n-gram Jaccard on bounded candidate pairs
# --------------------------------------------------------------------------
@register(
    "q67_chargram_jaccard_pairs",
    oracle="""
    WITH g AS (
        SELECT doc_id, lang,
               list_distinct(list_transform(
                   range(1, greatest(length(lower(trim(text, ' '))) - 3, 1) + 1),
                   i -> substr(lower(trim(text, ' ')), CAST(i AS INT), 4))) AS gr
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE)
             / (len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr)))
             AS jaccard
    FROM g a JOIN g b
      ON a.lang = b.lang
     AND a.doc_id < b.doc_id
     AND b.doc_id <= a.doc_id + 10
    WHERE CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE)
             / (len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr)))
          >= 0.35
    """,
    tags=("dedup", "jaccard", "ngram"),
)
def q67_chargram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-4-gram Jaccard near-dup pairs — the tokenization-free tier
    of the dedup cascade: robust to hyphenation/whitespace damage that
    shifts word boundaries (where token Jaccard, q62, under-counts).
    Same block-bucketed equi-join as q62 so the theta condition never
    plans as a nested-loop sweep.

    Scale: the gram set is built per-row (narrow, codegen'd substr loop
    over one materialized normalized-text column); candidates at 100 TB
    come from LSH buckets (q63) — the banded join here bounds fixture work
    the same way."""
    d = _spread(spark, t(spark, sf_dir, "documents"))
    n = 4
    norm = d.select("doc_id", "lang", normalize(F.col("text")).alias("s"))
    s = F.col("s")
    idx = F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1)))
    grams = norm.select(
        "doc_id",
        "lang",
        F.array_distinct(
            F.transform(idx, lambda i: s.substr(i, F.lit(n)))
        ).alias("gr"),
    )
    return _banded_jaccard_pairs(grams, "gr", span=10, threshold=0.35)


# --------------------------------------------------------------------------
# Planted-clone acceptance contracts for the signature-hash dedup family
# --------------------------------------------------------------------------
# xxhash64-based signatures (MinHash, SimHash, sign-LSH) have no DuckDB
# twin, so their PAIR OUTPUTS cannot hash-match an oracle.  What CAN be
# oracle-checked is the planted-clone contract (the q48/q32/q71 pattern):
# clone every Nth document under a shifted id, run the real operator over
# the planted corpus, and emit one row the oracle can pin — the planted
# count (data-derived SQL) plus self-asserted booleans that hold
# DETERMINISTICALLY: an exact clone has the identical shingle set /
# signature / embedding, so it shares every LSH band and SimHash block
# with its source, and the candidate pair MUST surface.  Pair-level
# behavior stays covered by tests/test_dedup.py.
_CLONE_MOD = 50
#: Clone ids live 10^12 above the data: far beyond any fixture id (≤1e3)
#: and any key-shifted scale-study replica (≤1e8 at 100×); contracts also
#: assert the gap via ids_disjoint_ok so a violation fails loudly.
_CLONE_OFFSET = 10**12

_SQL_DOC_CLONE_CONTRACT = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
           TRUE AS clone_recall_ok,
           TRUE AS candidate_bound_ok,
           TRUE AS ids_disjoint_ok
    FROM documents WHERE doc_id % {_CLONE_MOD} = 0
"""


def _with_planted_clones(
    df: DataFrame, id_col: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(corpus ∪ exact clones of every `_CLONE_MOD`-th row, the planted
    originals, the pre-clone original frame).  Clone ids are shifted by
    `_CLONE_OFFSET`; contracts assert max(original id) < offset via the
    returned original frame (`ids_disjoint_ok`) so a regenerated fixture
    whose ids grow into the clone range fails loudly instead of silently
    corrupting the recall joins.

    Round-13 form: the corpus is generated by a single ``explode`` over
    the source rows (a planted row emits [id, id+offset], others [id])
    instead of ``df ∪ clones(df.filter(...))``.  Row multiset is
    identical, but the union form scanned the source twice — and when the
    source is a caller's still-cold persisted frame, the two concurrent
    union branches each populated the cache, doubling the tokenize/hash
    pass inside the contract's eager materialization job (measured as
    twin 32-task stages in the q63 event log).  One generator projection
    reads the source exactly once."""
    planted = df.filter(
        _memo(("planted_pred", id_col),
              lambda: F.col(id_col) % _CLONE_MOD == 0)
    )
    exploded_id = _memo(
        ("clone_ids", id_col),
        lambda: F.explode(
            F.when(
                F.col(id_col) % _CLONE_MOD == 0,
                F.array(F.col(id_col), F.col(id_col) + _CLONE_OFFSET),
            ).otherwise(F.array(F.col(id_col)))
        ).alias(id_col),
    )
    rest = [c for c in df.columns if c != id_col]
    corpus = df.select(exploded_id, *rest).select(*df.columns)
    return corpus, planted, df


def _ids_disjoint(original: DataFrame, id_col: str) -> DataFrame:
    """One-row broadcast scalar: TRUE iff every original id sits in
    [0, _CLONE_OFFSET) (NULL-safe: empty frame → vacuously TRUE).  The
    lower bound matters too: a NEGATIVE id (id = 5 − offset) would clone
    to a legitimate positive id and corrupt the recall join while a
    max-only check stays green (second-pass review finding)."""
    return original.agg(
        F.coalesce(
            (F.max(F.col(id_col)) < F.lit(_CLONE_OFFSET))
            & (F.min(F.col(id_col)) >= 0),
            F.lit(True),
        ).alias("_ids_ok")
    )


# The contract's Column trees (round-13 driver-side optimization) are
# memoized via the process-wide hadoop_sync_spark.memoize.expr_memo
# (round 14 — previously a module-local dict): building them costs
# ~0.3-0.4 s of py4j round-trips per call, and they are parametric only
# on column NAMES and the bound constant.  See memoize.py for the
# Column-only rule, the SparkContext keying, and the collision tripwire.
from hadoop_sync_spark.memoize import expr_memo as _expr_memo  # noqa: E402

# the module's general Column-tree memo is _util.memo (same rationale);
# aliased so call sites read locally
from hadoop_sync_spark.queries._util import memo as _memo  # noqa: E402


def _contract_exprs(id_col: str, a_col: str, b_col: str,
                    capped_id_col: str, max_pairs_per_row: int) -> dict:
    key = (id_col, a_col, b_col, capped_id_col, max_pairs_per_row)
    return _expr_memo(
        "queries.dedup._contract_exprs", key,
        lambda: _build_contract_exprs(
            id_col, a_col, b_col, capped_id_col, max_pairs_per_row
        ),
    )


def _build_contract_exprs(id_col: str, a_col: str, b_col: str,
                          capped_id_col: str,
                          max_pairs_per_row: int) -> dict:
    def _in_range(c: Column) -> Column:
        # an honest original-side id: non-negative, below the clone band
        return (c >= 0) & (c < _CLONE_OFFSET)

    is_planted = F.col(id_col) % _CLONE_MOD == 0
    # planted-pair flag as a pure predicate (docstring bullet 2): the
    # original-side id is planted and in the honest range, the partner
    # is exactly its clone id — no expected-pair broadcast
    flag = (
        (F.col(a_col) % _CLONE_MOD == 0)
        & _in_range(F.col(a_col))
        & (F.col(b_col) == F.col(a_col) + _CLONE_OFFSET)
    )
    cols = {
        "_no": "long",
        "n_planted": "long",
        "_ne_pre": "long",
        "_ids_ok": "boolean",
        "_np": "long",
        "_found": "long",
        "_found_capped": "long",
        "_ncap": "long",
    }
    got = {
        "is_planted": is_planted,
        "scalars_fixed": [
            F.count("*").alias("_no"),
            F.coalesce(F.sum(is_planted.cast("long")), F.lit(0)).alias(
                "n_planted"
            ),
            F.coalesce(
                (F.max(F.col(id_col)) < F.lit(_CLONE_OFFSET))
                & (F.min(F.col(id_col)) >= 0),
                F.lit(True),
            ).alias("_ids_ok"),
        ],
        "pair_sel": [
            F.col(a_col).alias("_k"),
            F.when(flag, F.lit(1)).alias("_flag"),
            F.lit(1).alias("_is_pair"),
            F.lit(0).alias("_is_cap"),
            F.lit(0).alias("_cap_elig"),
        ],
        "cap_sel": [
            F.col(capped_id_col).alias("_k"),
            F.lit(None).cast("int").alias("_flag"),
            F.lit(0).alias("_is_pair"),
            F.lit(1).alias("_is_cap"),
            # capped∩eligible (docstring bullet 4): capped ids reached
            # buckets, so the operator's own eligibility filter passed;
            # in-range → original row
            (
                (F.col(capped_id_col) % _CLONE_MOD == 0)
                & _in_range(F.col(capped_id_col))
            ).cast("int").alias("_cap_elig"),
        ],
        "per_id_aggs": [
            F.sum("_is_pair").alias("_np_id"),
            F.count("_flag").alias("_nf_id"),
            F.max("_is_cap").alias("_c_id"),
            F.max("_cap_elig").alias("_ce_id"),
        ],
        "pair_stats_aggs": [
            F.coalesce(F.sum("_np_id"), F.lit(0)).cast("long").alias("_np"),
            F.coalesce(F.sum("_nf_id"), F.lit(0)).cast("long").alias(
                "_found"
            ),
            F.coalesce(
                F.sum(F.col("_nf_id") * F.col("_c_id")), F.lit(0)
            ).cast("long").alias("_found_capped"),
            F.coalesce(
                F.sum(F.col("_ce_id").cast("long") * F.col("_c_id")),
                F.lit(0),
            ).cast("long").alias("_ncap"),
        ],
        "pad_null": {
            c: F.lit(None).cast(t).alias(c) for c, t in cols.items()
        },
        "cols": cols,
        "fold_aggs": [F.max(c).alias(c) for c in cols],
        "assembled_sel": [
            F.col("n_planted"),
            (
                (F.col("_found") == F.col("_ne_pre") - F.col("_ncap"))
                & (F.col("_found_capped") == 0)
            ).alias("clone_recall_ok"),
            (
                F.col("_np")
                <= max_pairs_per_row * (F.col("_no") + F.col("n_planted"))
            ).alias("candidate_bound_ok"),
            F.col("_ids_ok").alias("ids_disjoint_ok"),
        ],
    }
    return got


def _pair_contract(
    pairs: DataFrame,
    original: DataFrame,
    id_col: str,
    a_col: str,
    b_col: str,
    max_pairs_per_row: int = 5,
    eligible_pred: Column | None = None,
    capped: DataFrame | None = None,
    capped_id_col: str = "id_a",
    free: list[DataFrame] | None = None,
) -> DataFrame:
    """One-row acceptance contract over a (distinct) candidate-pair
    output: every ELIGIBLE planted (id, id+offset) clone pair was emitted,
    and the pair count stays linear in the corpus (the anti-quadratic
    bound).

    ``original`` is the pre-clone frame (the contract assumes the caller
    built its corpus as ``original ∪ clones(planted)`` via
    :func:`_with_planted_clones`, so the corpus count is derivable as
    ``n_original + n_planted`` without a separate job).  ``eligible_pred``
    is the operator's own input filter on original rows (empty-shingle
    sentinel drop); ``capped`` lists ids whose every bucket was lost to
    the ``max_bucket`` cap — the contract tests the OPERATOR, not the
    fixture: a regenerated corpus with a blank planted doc must not read
    as a recall bug.  ``n_planted`` stays the oracle-pinned full planted
    count.

    ONE collect job beyond the caller's eager cache materialization
    (five jobs in round 5, three in round 6, one collect + three
    broadcast jobs in round 7, two jobs total in round 10, one in round
    13 — each broadcast exchange materializes as its OWN eager Spark
    job, so folding them away is per-job overhead reclaimed on warm
    caches; round 13 replaced the last broadcast, the capped tripwire
    join, with a union + per-id groupBy inside the collect job, which
    also absorbed the separate capped persist):

    - ONE aggregation over the cached original frame yields the corpus /
      planted / pre-cap-eligible counts AND the id-disjointness min/max
      in a single pass (they were four separate branch jobs, ~1s of
      per-job overhead on warm caches);
    - planted-pair flagging is a PURE PREDICATE on the emitted pair
      (original-side planted id in the honest range, partner exactly
      ``id + _CLONE_OFFSET``) instead of the old broadcast join against
      an expected-pair frame: an emitted pair implies its original-side
      id reached a bucket, which implies the operator's own eligibility
      filter passed — so predicate-flagging and expected-join flagging
      agree on every emittable pair, and the broadcast job (plus its
      re-scan of the cached original) disappears.  An ineligible id that
      somehow surfaced in a pair would now COUNT in ``_found`` and break
      the recall equality from above rather than below — still red,
      strictly more conservative;
    - a capped id's pair cannot be emitted by construction (every bucket
      that contained it was dropped), so the recall equation subtracts
      the capped-planted count instead of anti-joining ``expected``.
      That by-construction invariant is not assumed silently: the pair
      job counts flagged pairs whose original-side id is capped
      (``_found_capped``, via the per-id union groupBy — no broadcast
      remains in the contract since round 13) and the verdict
      requires zero, so a future cap-semantics change (whole-bucket drop
      → per-member trimming) that starts emitting capped pairs trips the
      contract instead of masking a missing uncapped pair;
    - the capped∩eligible adjustment is a fold branch aggregating the
      capped frame DIRECTLY (planted + honest-range predicate): capped
      ids come from ≥2-member buckets, so they passed the eligibility
      filter, and an in-range id in the corpus is an original row by
      ``_with_planted_clones`` construction — the old broadcast
      semi-join against the cached original counted exactly the same
      set (empirically ~0 rows) at the cost of its own broadcast job
      and a second capped recomputation.

    ``free`` lists internally persisted frames (the LSH bucket caches)
    to release after the row MATERIALIZES here — same
    materialize-then-unpersist hygiene as the ANN contracts: a lazily
    returned plan would pin the caches for the session lifetime."""
    ex_ = _contract_exprs(id_col, a_col, b_col, capped_id_col,
                          max_pairs_per_row)
    is_planted = ex_["is_planted"]
    is_elig = (
        is_planted & eligible_pred if eligible_pred is not None else is_planted
    )
    # coalesce: SUM over an empty frame is NULL where the old per-frame
    # COUNT(*) jobs returned 0 — an empty regenerated fixture must yield
    # (0, TRUE, TRUE, TRUE) like the oracle, not a NULL-poisoned row
    scalars = original.agg(
        *ex_["scalars_fixed"],
        F.coalesce(F.sum(is_elig.cast("long")), F.lit(0)).alias("_ne_pre"),
    )
    # masking guard (round-7 ADVICE): the recall equation below checks
    # COUNT equality (_found == _ne_pre - _ncap), so a spuriously emitted
    # capped pair would numerically offset a MISSING uncapped pair and
    # read green.  By construction a capped id's pair cannot be emitted
    # (every bucket containing it was dropped) — enforce that invariant
    # explicitly: count flagged pairs whose original-side id is capped,
    # and require zero.  Round-13 form: the pair/capped alignment no
    # longer broadcasts the capped residue into the pair frame (that
    # broadcast materialized as its own eager build job, and the residue
    # had to be persisted so the _ncap branch would not recompute it).
    # Instead, pair rows and capped-id rows UNION and aggregate per
    # original-side id once — _np/_found, the capped tripwire
    # (_found_capped) and capped∩eligible (_ncap) all fall out of a
    # single small groupBy that lives inside the one collect job (guide
    # §2.4: operations keyed the same way share one exchange).  The key
    # is the pair's left id: per-id pair width is bounded by
    # bands × max_bucket (no skew), total rows by the linear candidate
    # bound plus the ≈0-row capped residue.
    pair_rows = pairs.select(*ex_["pair_sel"])
    if capped is not None:
        tallied = pair_rows.unionByName(capped.select(*ex_["cap_sel"]))
    else:
        tallied = pair_rows
    # capped ids are distinct by construction (groupBy output), so
    # per-id max(_is_cap)/max(_cap_elig) recover exactly the old
    # broadcast-join alignment and the old direct capped aggregation
    per_id = tallied.groupBy("_k").agg(*ex_["per_id_aggs"])
    pair_stats = per_id.agg(*ex_["pair_stats_aggs"])
    # single-job assembly (round 7): the old epilogue cross-joined the
    # one-row aggregates into `scalars` via F.broadcast — each broadcast
    # materializes as its OWN eager Spark job before the final collect,
    # three jobs of pure per-job overhead on warm caches (same-boot A/B:
    # ~0.7 s of the q63 wall clock).  Union-folding the one-row
    # aggregates keeps every branch inside the single collect job: each
    # branch pads the shared scalar schema with typed NULLs and a
    # null-skipping max() reassembles the row.  Emitted row is identical.
    # (Two branches since round 13: _ncap folded into pair_stats above.)
    def _pad(df: DataFrame) -> DataFrame:
        have = set(df.columns)
        return df.select(
            *[
                F.col(c) if c in have else ex_["pad_null"][c]
                for c in ex_["cols"]
            ]
        )

    folded = (
        _pad(scalars)
        .unionByName(_pad(pair_stats))
        .agg(*ex_["fold_aggs"])
    )
    assembled = folded.select(*ex_["assembled_sel"])
    return materialize_and_free(assembled, free)


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh) distinct 3-token shingle sets — shared by the MinHash
    family (q63/q68)."""
    from hadoop_sync_spark.functions.text import shingles_of_tokens

    # spread first so shingle building and signatures run on all cores;
    # then two-step projection: materialize tokens, then shingle from the
    # column reference — keeps the transform lambda from re-tokenizing per
    # shingle index (Catalyst expression trees are trees, not DAGs)
    d = _spread(spark, t(spark, sf_dir, "documents"))
    toks_df = d.select(
        "doc_id",
        _memo("doc_tokens",
              lambda: tokens(normalize(F.col("text"))).alias("tok")),
    )
    return toks_df.select(
        "doc_id",
        _memo(
            "doc_shingles",
            lambda: F.array_distinct(
                shingles_of_tokens(F.col("tok"), n=3)
            ).alias("sh"),
        ),
    )


def _hs_nonempty() -> Column:
    """Shared eligibility predicate for the hashed-shingle contracts
    (q63/q68): cleaned shingle set non-empty, read off the cached
    hashed-element array (element-aligned with the cleaned set).  ONE
    memo call site on purpose — the round-14 collision tripwire flags
    the same key cached from two different builders."""
    return _memo("hs_nonempty", lambda: F.size(F.col("hs")) > 0)


def _hashed_shingles_col() -> Column:
    """Shared hashed-element projection for the MinHash contracts
    (q63/q68): xxhash64 of each cleaned shingle, the narrow proxy both
    persist instead of the shingle strings (round 13, guide §2.3).  ONE
    memo call site on purpose (see :func:`_hs_nonempty`)."""
    return _memo(
        "hashed_shingles",
        lambda: element_hashes(
            F.array_remove(F.col("sh"), "")
        ).alias("hs"),
    )


def lsh_candidate_pairs(
    shingled: DataFrame,
    with_capped_ids: bool = False,
    with_persist_handle: bool = False,
    eager_cache: bool = True,
    items_col: str = "sh",
    items_hashed: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame] | tuple[
    DataFrame, DataFrame, DataFrame | None
]:
    """MinHash-LSH candidate pairs over (doc_id, sh) rows: 32-slot
    signature → 8-band bucketing → in-bucket expansion.  No trailing
    orderBy: a global sort over the unbounded pair output is pure
    fixture-determinism cost at 100 TB — tests sort their own copies.
    ``items_col``/``items_hashed``: callers that cache pre-hashed
    element arrays (q63) pass them through so the signature stage skips
    re-hashing (see :func:`minhash_lsh_pairs`)."""
    return minhash_lsh_pairs(
        shingled, "doc_id", items_col, k=32, bands=8,
        with_capped_ids=with_capped_ids,
        with_persist_handle=with_persist_handle,
        eager_cache=eager_cache,
        items_hashed=items_hashed,
    )


# --------------------------------------------------------------------------
# q63 — MinHash-LSH candidate pairs (planted-clone acceptance contract)
# --------------------------------------------------------------------------
@register(
    "q63_minhash_lsh_pairs",
    oracle=_SQL_DOC_CLONE_CONTRACT,
    tags=("dedup", "minhash", "lsh"),
)
def q63_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable near-dup candidate generation: 3-token shingles → 32-slot
    MinHash signature → 8-band LSH bucketing → in-bucket self-join.  This
    is the operator that replaces the O(n²) scan at 100 TB.

    Driver-checked through the planted-clone contract (module note above):
    every `_CLONE_MOD`-th document is cloned under a shifted id, and the
    contract row asserts the oracle-counted planted total, 100% clone-pair
    recall (identical shingle sets collide in every band — deterministic,
    not probabilistic), and the linear candidate bound.

    Shingles (3-token n-grams), not bare tokens, feed the signature:
    shared-vocabulary corpora make token-set Jaccard uniformly high (the
    sf0.01 word-soup fixtures collide on ~2/3 of all pairs with token
    MinHash), while shingle Jaccard stays discriminative."""
    # persist the PRE-HASHED element arrays, not the shingle strings
    # (round 13): the signature pipeline and the contract's folded scalar
    # pass both derive from this cache, and both only need the xxhash64
    # element values / the cleaned-set size — hashing once into the cache
    # drops the per-branch re-hash and shrinks the cached payload from
    # ~60-byte shingle strings to 8-byte longs (guide §2.3: cache the
    # narrow proxy).  Freed with the bucket cache once the row
    # materializes.
    hs = (
        _doc_shingles(spark, sf_dir)
        .select("doc_id", _hashed_shingles_col())
        .persist()
    )
    corpus, _planted, _original = _with_planted_clones(hs, "doc_id")
    # eager_cache=True: since the round-13 contract fold removed the
    # tripwire broadcast, the one collect job consumes the bucket cache
    # from TWO concurrent subtrees (pairs + capped) — the eager count()
    # materializes it once, deterministically, before they race
    pairs, capped, handle = lsh_candidate_pairs(
        corpus, with_capped_ids=True, with_persist_handle=True,
        items_col="hs", items_hashed=True,
    )
    # eligibility = the sentinel filter inside minhash_lsh_pairs: docs
    # whose cleaned shingle set is empty never get a signature (the
    # hashed array is element-aligned with the cleaned shingle set, so
    # its size carries the same predicate)
    return _pair_contract(
        pairs, hs, "doc_id", "id_a", "id_b",
        eligible_pred=_hs_nonempty(),
        capped=capped, capped_id_col="id_a",
        free=[handle, hs],
    )


# --------------------------------------------------------------------------
# q64 — SimHash signatures (planted-clone determinism contract)
# --------------------------------------------------------------------------
@register(
    "q64_simhash_signatures",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
           TRUE AS clone_sig_identical_ok,
           TRUE AS block_consistent_ok,
           TRUE AS ids_disjoint_ok
    FROM documents WHERE doc_id % {_CLONE_MOD} = 0
    """,
    tags=("dedup", "simhash"),
)
def q64_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (single-fold, no shuffle) plus its
    16-bit prefix — the block key under which production SimHash dedup
    compares hamming distance (Manku et al., WWW'07 block-permuted
    approach).

    Driver-checked through the signature determinism contract: the
    signature of every planted exact clone must equal its source's
    signature bit-for-bit (content-functional, partition-independent),
    and every emitted block key must equal the signature's top 16 bits —
    the properties block-probing (q66) silently depends on."""
    d = _spread(spark, t(spark, sf_dir, "documents"))
    corpus, planted, original = _with_planted_clones(
        d.select("doc_id", "text"), "doc_id"
    )
    sig = simhash64(tokens(normalize(F.col("text"))))
    # persist the signature frame: the contract's three scalar branches
    # (clone-pair join, block-consistency agg, id-disjointness) each hang
    # off it, and the nondeterministic SimHash Arrow stage defeats
    # ReuseExchange — without the cache every branch re-tokenizes and
    # re-signs the corpus (the q63/q68 contract-persist fix, deferred
    # from round 4); freed once the row materializes
    sigs = corpus.select(
        "doc_id",
        sig.alias("simhash"),
        F.shiftrightunsigned(sig, 48).alias("block16"),
    ).persist()
    # materialize the cache eagerly (as q66 does for buckets_all): the
    # broadcast subtrees below (cln, block_bad) are submitted as separate
    # concurrent jobs, and with a lazy cache each can recompute the
    # nondeterministic-flagged Arrow simhash stage before the cache
    # populates — values are deterministic so that is perf-only, but the
    # tokenize+sign pass is the whole cost of this query
    sigs.count()
    src = sigs.filter(F.col("doc_id") < _CLONE_OFFSET).select(
        F.col("doc_id").alias("p"), F.col("simhash").alias("_sig_a")
    )
    cln = sigs.filter(F.col("doc_id") >= _CLONE_OFFSET).select(
        (F.col("doc_id") - _CLONE_OFFSET).alias("p"),
        F.col("simhash").alias("_sig_b"),
    )
    sig_pairs = src.join(F.broadcast(cln), "p").agg(
        F.count("*").alias("n_planted"),
        F.sum(
            (~F.col("_sig_a").eqNullSafe(F.col("_sig_b"))).cast("long")
        ).alias("_sig_bad"),
    )
    block_bad = sigs.agg(
        F.sum(
            (
                ~F.col("block16").eqNullSafe(
                    F.shiftrightunsigned(F.col("simhash"), 48)
                )
            ).cast("long")
        ).alias("_blk_bad")
    )
    assembled = (
        sig_pairs.crossJoin(F.broadcast(block_bad))
        .crossJoin(F.broadcast(_ids_disjoint(original, "doc_id")))
        .select(
            "n_planted",
            (F.col("_sig_bad") == 0).alias("clone_sig_identical_ok"),
            (F.col("_blk_bad") == 0).alias("block_consistent_ok"),
            F.col("_ids_ok").alias("ids_disjoint_ok"),
        )
    )
    return materialize_and_free(assembled, [sigs])


# --------------------------------------------------------------------------
# q66 — SimHash block join (planted-clone acceptance contract)
# --------------------------------------------------------------------------
@register(
    "q66_simhash_pairs",
    oracle=_SQL_DOC_CLONE_CONTRACT,
    tags=("dedup", "simhash", "hamming"),
)
def q66_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs: candidates share a 16-bit signature
    block (Manku et al. WWW'07 block strategy — a true near-pair at
    hamming ≤ 3 must agree on at least one of four 16-bit blocks), verified
    by exact hamming distance.

    Driver-checked through the planted-clone contract (module note above):
    an exact clone has the identical 64-bit signature, so it shares all
    four blocks at hamming 0 and its pair MUST surface — recall of planted
    pairs is deterministic, plus the linear candidate bound.

    Scale: one shuffle on (block_no, block_value); in-bucket pair expansion
    like q63.  4 block probes per doc replace the O(n²) signature sweep.
    Real-text SimHash bits are highly non-uniform (common tokens dominate
    the per-bit majority votes), so a few block values go quadratic: at
    10× sf0.1 the widest of 65,536 buckets held 1,031 of 50k docs and
    candidates totaled 9.8M (~50× the linear target) — one straggler
    task.  The same `max_bucket` cap as q63 bounds the expansion; a true
    near-pair is lost only if ALL FOUR of its shared blocks are over-cap
    (each pair has 4 independent probes), the standard LSH skew
    tradeoff."""
    d = _spread(spark, t(spark, sf_dir, "documents"))
    # persist the tokenized frame: corpus/planted/original/eligible and
    # the contract's scalar counts all hang off it — without the cache
    # every branch re-tokenizes the corpus (the q63/q68 contract-persist
    # fix, deferred from round 4); freed with the bucket cache once the
    # contract row materializes
    toks_df = d.select(
        "doc_id", tokens(normalize(F.col("text"))).alias("tok")
    ).persist()
    corpus, _planted, _original = _with_planted_clones(toks_df, "doc_id")
    sig = corpus.select(
        "doc_id", simhash64(F.col("tok")).alias("sig")
    )
    blocks = sig.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sig"), s).bitwiseAND(
                        F.lit(0xFFFF).cast("long")
                    )
                    for s in (0, 16, 32, 48)
                ]
            )
        ).alias("block_no", "block_val"),
    )
    buckets_all = (
        blocks.groupBy("block_no", "block_val")
        .agg(
            F.array_sort(F.collect_list(F.struct("doc_id", "sig"))).alias("_ms")
        )
        .filter(F.size("_ms") > 1)
    )
    # FUSED pair+capped derivation (round 13, the minhash_lsh_pairs
    # pattern): one tagged generator over each block-bucket row emits the
    # candidate-pair structs (tag 0, under-cap buckets only — the
    # conditional keeps the quadratic expansion off over-cap buckets) and
    # one member struct per bucket member (tag 1, every bucket, carrying
    # the under-cap flag); a single groupBy then yields the distinct
    # hamming-verified pairs AND the fully-capped ids in one pass and one
    # exchange where the unfused form re-scanned the persisted bucket
    # frame through two separate exchanges.  The persisted frame is the
    # grouped output (no signatures — smaller), materialized eagerly so
    # the collect job's two consumers cannot race the cache build.
    from pyspark import StorageLevel

    from hadoop_sync_spark.functions.hashing import tagged_bucket_exprs

    tx = tagged_bucket_exprs(
        "doc_id",
        "hamming",
        lambda x, y: hamming64(x["sig"], y["sig"]),
        500,
        "doc_a",
        "doc_b",
    )
    # member rows ride the hamming filter (hamming NULL → disjunct NULL,
    # tag==1 wins); pair rows pass only at hamming ≤ 6 — the same
    # pre-distinct verification filter as the unfused form
    keep = _memo(
        "q66_keep",
        lambda: (F.col("p._tag") == 1) | (F.col("p.hamming") <= 6),
    )
    g = (
        buckets_all.select(tx["tagged_explode"])
        .filter(keep)
        .groupBy(*tx["group_keys"])
        .agg(tx["group_agg"])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    g.count()
    pairs = g.filter(tx["is_pair"]).select("doc_a", "doc_b", "hamming")
    # clone pairs the block path GUARANTEES: SimHash is defined for every
    # doc (empty → sig 0), so the only loss channel is the 500 cap — an
    # id whose every ≥2-member block bucket was dropped cannot pair
    capped = g.filter(tx["is_fully_capped"]).select(
        F.col("doc_a").alias("doc_id")
    )
    # eligibility needs no predicate: SimHash is defined for every doc
    # (empty → sig 0), so the cap is the only loss channel
    return _pair_contract(
        pairs, toks_df, "doc_id", "doc_a", "doc_b",
        capped=capped, capped_id_col="doc_id",
        free=[g, toks_df],
    )


def _cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded embedding-cosine near-dup pairs (vec_a, vec_b, sim ≥ 0.35),
    shared by q65 (pairs) and q69 (clusters).  Norms are projected ONCE
    per row before the self-join — `cosine()` inline would re-fold each
    side's 64-element norm per PAIR (n× redundant work; the oracle
    precomputes `nrm` the same way, so the arithmetic stays identical:
    sqrt of the same double, multiplied once)."""
    from hadoop_sync_spark.functions.vectors import dot, l2_norm

    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        l2_norm(F.col("embedding")).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        l2_norm(F.col("embedding")).alias("nb"),
    )
    sim = dot(F.col("ea"), F.col("eb")) / F.nullif(
        F.col("na") * F.col("nb"), F.lit(0.0)
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("sim"))
        .filter(F.col("sim") >= 0.35)
    )


# --------------------------------------------------------------------------
# q65 — embedding-cosine near-dup pairs (bounded, oracle-checked)
# --------------------------------------------------------------------------
@register(
    "q65_embedding_dup_pairs",
    oracle="""
    WITH v AS (
        SELECT vec_id, embedding,
               sqrt(list_reduce(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                    (a, b) -> a + b)) AS nrm
        FROM embeddings WHERE vec_id < 300
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                (x, y) -> x + y) / (a.nrm * b.nrm) AS cosine_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                (x, y) -> x + y) / (a.nrm * b.nrm) >= 0.35
    """,
    tags=("dedup", "vectors"),
)
def q65_embedding_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs over a bounded slice — the
    semantic-dedup primitive.  Dot/norm are sequential double folds, so
    Spark and the oracle agree bit-for-bit.

    Scale: production replaces the bounded self-join with IVF bucketing
    (functions.vectors.ivf_topk) — same scoring expression, candidate set
    restricted to shared buckets."""
    return _cosine_pairs(spark, sf_dir).withColumnRenamed("sim", "cosine_sim")


# --------------------------------------------------------------------------
# q68 — duplicate clusters: LSH pairs → connected components (rows-only)
# --------------------------------------------------------------------------
_SQL_COMPONENT_CONTRACT = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
           TRUE AS clones_colocated_ok,
           TRUE AS no_collapse_ok,
           TRUE AS ids_disjoint_ok
    FROM documents WHERE doc_id % {_CLONE_MOD} = 0
"""


def _component_contract(
    comp: DataFrame,
    planted: DataFrame,
    corpus: DataFrame,
    id_col: str,
    eligible: DataFrame | None = None,
    original: DataFrame | None = None,
    free: list[DataFrame] | None = None,
) -> DataFrame:
    """One-row contract over a (node, component) labeling: every ELIGIBLE
    planted clone landed in its source's component, and no component
    swallowed more than half the corpus (the accidental-full-graph-collapse
    guard).  ``eligible`` restricts the colocation check to planted rows
    whose clone EDGE the pair pipeline guarantees (survives the operator's
    input filters and bucket caps) — same rationale as
    :func:`_pair_contract`; ``n_planted`` stays the oracle-pinned full
    count."""
    if eligible is None:
        eligible = planted
    p = eligible.select(F.col(id_col).alias("p"))
    ca = p.join(
        comp.withColumnRenamed("node", "p"), "p"
    ).select("p", F.col("component").alias("_comp_a"))
    cb = eligible.select(
        F.col(id_col).alias("p"),
        (F.col(id_col) + _CLONE_OFFSET).alias("node"),
    ).join(comp, "node").select("p", F.col("component").alias("_comp_b"))
    bad = (
        ca.join(cb, "p", "full_outer")
        .filter(
            ~F.col("_comp_a").eqNullSafe(F.col("_comp_b"))
        )
        .agg(F.count("*").alias("_bad"))
    )
    n_planted = planted.agg(F.count("*").alias("n_planted"))
    biggest = comp.groupBy("component").count().agg(
        F.max("count").alias("_mx")
    )
    n_corpus = corpus.agg(F.count("*").alias("_nc"))
    ids_ok = (
        _ids_disjoint(original, id_col)
        if original is not None
        else planted.sparkSession.range(1).select(
            F.lit(True).alias("_ids_ok")
        )
    )
    assembled = (
        n_planted.crossJoin(F.broadcast(bad))
        .crossJoin(F.broadcast(biggest))
        .crossJoin(F.broadcast(n_corpus))
        .crossJoin(F.broadcast(ids_ok))
        .select(
            "n_planted",
            (F.col("_bad") == 0).alias("clones_colocated_ok"),
            (F.col("_mx") <= F.col("_nc") / 2).alias("no_collapse_ok"),
            F.col("_ids_ok").alias("ids_disjoint_ok"),
        )
    )
    return materialize_and_free(assembled, free)


@register(
    "q68_dup_components",
    oracle=_SQL_COMPONENT_CONTRACT,
    tags=("dedup", "components", "iterative"),
)
def q68_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup cascade's completion step: near-dup PAIRS (MinHash-LSH
    candidates, q63) become duplicate GROUPS via connected components —
    the "keep one per cluster" output a curation pipeline actually writes.

    Iteration-to-fixpoint has no hash-comparable SQL twin, so the driver
    row is the planted-clone colocation contract: every cloned document
    must land in its source's component (the clone PAIR is a guaranteed
    edge — identical shingle sets collide in every LSH band), and no
    component may swallow more than half the corpus.  Cluster-level
    behavior (planted chains, survivor election) stays covered in
    tests/test_dedup.py and tests for functions/graph.py.

    Iterative min-label propagation (one shuffle per round, lineage
    truncated per round); duplicate clusters are tiny and dense, so it
    converges in ~3 rounds."""
    from hadoop_sync_spark.functions.graph import connected_components

    # hashed-element persist: same narrow-proxy rationale as q63 (round
    # 13) — both the signature pipeline and the eligibility filter need
    # only the xxhash64 values / the cleaned-set size
    hs = (
        _doc_shingles(spark, sf_dir)
        .select("doc_id", _hashed_shingles_col())
        .persist()
    )
    corpus, planted, original = _with_planted_clones(hs, "doc_id")
    pairs, capped, handle = lsh_candidate_pairs(
        corpus, with_capped_ids=True, with_persist_handle=True,
        items_col="hs", items_hashed=True,
    )
    comp, comp_h = connected_components(
        pairs, src="id_a", dst="id_b", with_handles=True
    )
    # eligible = planted rows whose clone EDGE the MinHash path
    # guarantees: cleaned shingle set non-empty (the sentinel filter
    # inside minhash_lsh_pairs drops empty docs — the hashed array is
    # element-aligned with the cleaned set) and not every bucket
    # lost to the max_bucket cap; the capped residue is ~0 rows, so it
    # broadcasts (was the inlined body of the removed _shingle_eligible)
    eligible = planted.filter(_hs_nonempty()).join(
        F.broadcast(capped.withColumnRenamed("id_a", "doc_id")),
        "doc_id",
        "left_anti",
    )
    # the contract row materializes, so even the components' own result
    # checkpoint is releasable — zero caches survive this query
    return _component_contract(
        comp, planted, corpus, "doc_id",
        eligible=eligible, original=original,
        free=[handle, hs, comp_h],
    )


# --------------------------------------------------------------------------
# q69 — semantic dedup: embedding-cosine pairs → clusters (rows-only)
# --------------------------------------------------------------------------
_SQL_EMB_COMPONENT_CONTRACT = f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
           TRUE AS clones_colocated_ok,
           TRUE AS no_collapse_ok,
           TRUE AS ids_disjoint_ok
    FROM embeddings WHERE vec_id % {_CLONE_MOD} = 0
"""


@register(
    "q69_semantic_dedup",
    oracle=_SQL_EMB_COMPONENT_CONTRACT,
    tags=("dedup", "semantic", "vectors", "components"),
)
def q69_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): documents
    whose EMBEDDINGS are near-parallel are duplicates even when their text
    differs (paraphrases, translations, templated rewrites) — cosine pairs
    above threshold become edges, connected components become clusters.

    Driver-checked through the planted-clone colocation contract: every
    `_CLONE_MOD`-th vector is cloned under a shifted id; an identical
    vector has the identical sign bits, shares every LSH band bucket, and
    rescores at cosine 1.0 ≥ threshold — so the clone edge is guaranteed
    and both must land in one component; plus the no-full-collapse guard.
    Cluster-level behavior stays covered in tests/test_vectors.py.

    Scale: candidate pairs come from sign-LSH bands
    (:func:`hadoop_sync_spark.functions.vectors.rp_band_pairs` — one wide
    shuffle, in-bucket expansion, exact cosine rescoring), NOT an all-pairs
    self-join.  The bounded exact self-join (q65's `_cosine_pairs`) stays
    as the recall cross-check in tests/test_vectors.py."""
    from hadoop_sync_spark.functions.graph import connected_components
    from hadoop_sync_spark.functions.vectors import rp_band_pairs

    # Operating point: θ=0.9, 60 planes / 12-bit bands (5 bands).  True
    # duplicate embeddings are near-parallel (SemDeDup dedups at cosine
    # ≥~0.9), and sign-LSH is only sub-quadratic when the threshold is
    # high: a random pair collides in a 12-bit band w.p. 2^-12, so
    # background candidates are ~5·2^-12 ≈ 0.1% of all pairs, while a
    # clone pair (agreement 1.0) collides in EVERY band — recall 1.0 for
    # exact dups, ≈0.8 at cosine 0.95, ≈0.57 at the 0.9 boundary
    # ((1-θ/π)^12 per band; Charikar '02).  The earlier 0.35/4-bit point
    # recalled fixture-cloud pairs well but collided ~75% of ALL pairs —
    # near-quadratic candidate generation dressed as LSH (measured: ~12 s
    # for 2 000 vectors at sf0.1).  Coarse operating points remain
    # caller-choosable on the generic operator; tests pin both.
    from hadoop_sync_spark.functions.vectors import l2_norm

    emb = t(spark, sf_dir, "embeddings")
    corpus, planted, original = _with_planted_clones(
        emb.select("vec_id", "embedding"), "vec_id"
    )
    pairs, capped, handle = rp_band_pairs(
        corpus, threshold=0.9, n_planes=60, band_bits=12, max_bucket=500,
        with_capped_ids=True, with_persist_handle=True,
    )
    comp, comp_h = connected_components(
        pairs, src="id_a", dst="id_b", with_handles=True
    )
    # the clone EDGE is guaranteed only for vectors that can score: NULL
    # or zero-norm embeddings rescore to NULL cosine (never ≥ threshold),
    # and an id whose every bucket was capped never reaches rescoring
    eligible = planted.filter(
        F.col("embedding").isNotNull() & (l2_norm(F.col("embedding")) > 0)
    ).join(capped, "vec_id", "left_anti")
    return _component_contract(
        comp, planted, corpus, "vec_id",
        eligible=eligible, original=original, free=[handle, comp_h],
    )


# --------------------------------------------------------------------------
# q99 — incremental snapshot dedup: new batch vs existing corpus
# --------------------------------------------------------------------------
#: The fixture has no "second snapshot", so the query constructs one
#: deterministically (SQL-expressible, identical in the oracle): the
#: incoming batch is every 10th document; every 30th batch doc re-carries
#: the TEXT of its corpus neighbor (doc_id+1 — a re-crawl dup), and every
#: 40th (not also 30th) re-carries the raw text of batch neighbor
#: doc_id+10 (a within-batch dup).  Classification below is purely
#: content-based — it never peeks at the planting rule.
_SQL_Q99 = """
    WITH batch AS (
        SELECT b.doc_id,
               CASE WHEN b.doc_id % 30 = 0 AND c.text IS NOT NULL THEN c.text
                    WHEN b.doc_id % 30 <> 0 AND b.doc_id % 40 = 0
                         AND d.text IS NOT NULL THEN d.text
                    ELSE b.text END AS text
        FROM documents b
        LEFT JOIN documents c ON c.doc_id = b.doc_id + 1
        LEFT JOIN documents d ON d.doc_id = b.doc_id + 10
        WHERE b.doc_id % 10 = 0
    ),
    bfp AS (
        SELECT doc_id, md5(lower(trim(text, ' '))) AS f FROM batch
    ),
    corpus_min AS (
        SELECT md5(lower(trim(text, ' '))) AS f,
               MIN(doc_id) AS corpus_canonical
        FROM documents WHERE doc_id % 10 <> 0 GROUP BY 1
    ),
    batch_min AS (
        SELECT f, MIN(doc_id) AS batch_first FROM bfp GROUP BY f
    )
    SELECT b.doc_id,
           CASE WHEN cm.corpus_canonical IS NOT NULL THEN 'dup_of_corpus'
                WHEN b.doc_id > bm.batch_first THEN 'dup_in_batch'
                ELSE 'new' END AS status,
           CAST(CASE WHEN cm.corpus_canonical IS NOT NULL
                         THEN cm.corpus_canonical
                     WHEN b.doc_id > bm.batch_first THEN bm.batch_first
                END AS BIGINT) AS canonical_id
    FROM bfp b
    LEFT JOIN corpus_min cm USING (f)
    JOIN batch_min bm USING (f)
"""


def _q99_batch(d: DataFrame) -> DataFrame:
    """The deterministic synthetic 'incoming batch' both q99 and q117
    classify (see the _SQL_Q99 comment for the planting rule)."""
    b = d.filter(F.col("doc_id") % 10 == 0).alias("b")
    c = d.select(
        (F.col("doc_id") - 1).alias("_cid"), F.col("text").alias("_ctext")
    ).alias("c")
    e = d.select(
        (F.col("doc_id") - 10).alias("_did"), F.col("text").alias("_dtext")
    ).alias("e")
    return (
        b.join(c, F.col("b.doc_id") == F.col("_cid"), "left")
        .join(e, F.col("b.doc_id") == F.col("_did"), "left")
        .select(
            "b.doc_id",
            F.when(
                (F.col("b.doc_id") % 30 == 0) & F.col("_ctext").isNotNull(),
                F.col("_ctext"),
            )
            .when(
                (F.col("b.doc_id") % 30 != 0)
                & (F.col("b.doc_id") % 40 == 0)
                & F.col("_dtext").isNotNull(),
                F.col("_dtext"),
            )
            .otherwise(F.col("b.text"))
            .alias("text"),
        )
    )


@register(
    "q99_incremental_dedup",
    oracle=_SQL_Q99,
    tags=("dedup", "incremental", "snapshot", "l3"),
)
def q99_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental snapshot dedup — the reference's incremental-sync idea
    applied to CONTENT: when a new batch of documents arrives, classify
    each incoming doc as a duplicate of the existing corpus (with its
    canonical surviving doc), a duplicate within the batch itself (first
    occurrence wins), or genuinely new — the decision a crawl-refresh
    pipeline makes before admitting rows, without re-deduplicating the
    whole corpus.

    Scale: the batch is small relative to a 100 TB corpus, so the corpus
    side NEVER shuffles — its fingerprint scan is probed by a broadcast of
    the batch's distinct fingerprints, the classic
    big-stream × small-broadcast shape; the per-fingerprint minimums
    aggregate only the (tiny) hit set.  The fixture batch is constructed
    in-query (docstring note above) so all three statuses occur at every
    SF."""
    d = t(spark, sf_dir, "documents")
    batch = _q99_batch(d)
    bfp = batch.select("doc_id", fingerprint(F.col("text")).alias("f"))
    corpus = d.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id", fingerprint(F.col("text")).alias("f")
    )
    # 100 TB shape: broadcast the batch's fingerprint set; the corpus scan
    # streams past it un-shuffled, and only hits reach the aggregation
    corpus_min = (
        corpus.join(F.broadcast(bfp.select("f").distinct()), "f")
        .groupBy("f")
        .agg(F.min("doc_id").alias("corpus_canonical"))
    )
    batch_min = bfp.groupBy("f").agg(F.min("doc_id").alias("batch_first"))
    has_corpus = F.col("corpus_canonical").isNotNull()
    in_batch_dup = F.col("doc_id") > F.col("batch_first")
    return (
        bfp.join(F.broadcast(corpus_min), "f", "left")
        .join(F.broadcast(batch_min), "f")
        .select(
            "doc_id",
            F.when(has_corpus, F.lit("dup_of_corpus"))
            .when(in_batch_dup, F.lit("dup_in_batch"))
            .otherwise(F.lit("new"))
            .alias("status"),
            F.when(has_corpus, F.col("corpus_canonical"))
            .when(in_batch_dup, F.col("batch_first"))
            .cast("long")
            .alias("canonical_id"),
        )
    )


# --------------------------------------------------------------------------
# q117 — Bloom-prefiltered incremental dedup (the amortized-index path)
# --------------------------------------------------------------------------
@register(
    "q117_bloom_incremental_dedup",
    oracle=_SQL_Q99,
    tags=("dedup", "incremental", "bloom", "l3"),
)
def q117_bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q99's classification through a Bloom membership index (Bloom,
    CACM'70) — the SAME exact answer (same oracle SQL), different scale
    mechanism: q99 probes the corpus per batch (one corpus scan every
    batch); here corpus membership is pre-baked into a constant-size bit
    array (128 KB at 2²⁰ bits) that is built once per snapshot, grows
    monotonically under appends (bits only turn on), and answers most
    batch rows WITHOUT touching the corpus.  Only Bloom-POSITIVE
    fingerprints pay the exact corpus confirmation join (true dups +
    the false-positive margin); a negative probe is proof of novelty —
    false negatives are impossible, so exactness is preserved by
    construction, which is why the full q99 oracle applies verbatim.

    At 100 TB: a per-batch corpus scan is the dominant cost of q99's
    shape; the Bloom flips that to O(batch) probes + point-lookup
    confirms on the candidate set, with the index 9.6 bits/key at 1%
    FPR — the only membership structure that fits in executor memory
    when the fingerprint set does not.  FPR/no-false-negative
    properties are asserted in tests/test_dedup.py."""
    from hadoop_sync_spark.functions.hashing import (
        bloom_might_contain,
        build_bloom_bits,
    )

    d = t(spark, sf_dir, "documents")
    batch = _q99_batch(d)
    bfp = batch.select("doc_id", fingerprint(F.col("text")).alias("f"))
    corpus = d.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id", fingerprint(F.col("text")).alias("f")
    )
    # snapshot-time index build (amortized across batches in production)
    packed = build_bloom_bits(corpus, "f")
    probe = bloom_might_contain(packed)
    probed = bfp.withColumn("_maybe", probe(F.col("f")))
    # only Bloom-positive fingerprints reach the exact corpus confirm
    cand = probed.filter(F.col("_maybe")).select("f").distinct()
    corpus_min = (
        corpus.join(F.broadcast(cand), "f")
        .groupBy("f")
        .agg(F.min("doc_id").alias("corpus_canonical"))
    )
    batch_min = bfp.groupBy("f").agg(F.min("doc_id").alias("batch_first"))
    has_corpus = F.col("corpus_canonical").isNotNull()
    in_batch_dup = F.col("doc_id") > F.col("batch_first")
    return (
        probed.join(F.broadcast(corpus_min), "f", "left")
        .join(F.broadcast(batch_min), "f")
        .select(
            "doc_id",
            F.when(has_corpus, F.lit("dup_of_corpus"))
            .when(in_batch_dup, F.lit("dup_in_batch"))
            .otherwise(F.lit("new"))
            .alias("status"),
            F.when(has_corpus, F.col("corpus_canonical"))
            .when(in_batch_dup, F.col("batch_first"))
            .cast("long")
            .alias("canonical_id"),
        )
    )


# --------------------------------------------------------------------------
# q106 — long-chain transitive closure (large-star/small-star, value-checked)
# --------------------------------------------------------------------------
@register(
    "q106_chain_components",
    oracle="""
    SELECT doc_id,
           MIN(doc_id) OVER (PARTITION BY source) AS component
    FROM documents
    """,
    tags=("graph", "components", "star", "l3"),
)
def q106_chain_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure over LONG chains, fully value-checked: the docs
    of each source are linked consecutively by doc_id (each source becomes
    one path of hundreds/thousands of hops), and every doc must be
    labeled with its chain's minimum — which SQL states directly as
    `MIN(doc_id) OVER (PARTITION BY source)`, so the oracle checks every
    (node, component) VALUE, not a summary contract.

    This is the workload that separates the two component algorithms:
    one-hop label propagation needs O(chain length) rounds (hundreds
    here — it would exhaust any sane round budget), while the
    large-star/small-star alternation (`connected_components_star`,
    Kiveris et al. SoCC'14) converges in O(log² n) — ~10 alternations at
    this size.  Single-doc sources (isolated nodes) are unioned back in
    as self-labeled, same contract as the graph API documents.

    Scale: edge construction is one window pass per source partition;
    each star phase is a groupBy-min + same-key join + distinct."""
    from hadoop_sync_spark.functions.graph import connected_components_star
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy("doc_id")
    edges = (
        d.withColumn("nxt", F.lead("doc_id").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("doc_id").alias("src"), F.col("nxt").alias("dst"))
    )
    labels, star_h = connected_components_star(
        edges, max_iter=25, with_handles=True
    )
    # the output is node-scale (one row per document of this table slice)
    # and every value is driver-checked anyway — materialize it and free
    # the star result's checkpoint so the query leaves zero caches
    out = (
        d.join(labels, d["doc_id"] == labels["node"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias(
                "component"
            ),
        )
    )
    from hadoop_sync_spark.queries._util import materialize_and_free

    return materialize_and_free(out, [star_h])


# --------------------------------------------------------------------------
# q108 — bounded edit-distance (typo/OCR) near-pairs, fully value-checked
# --------------------------------------------------------------------------
@register(
    "q108_edit_distance_pairs",
    oracle="""
    WITH p AS (
        SELECT doc_id, lang, substr(lower(trim(text, ' ')), 1, 64) AS pre
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.pre, b.pre) AS BIGINT) AS edit_dist
    FROM p a JOIN p b
      ON a.lang = b.lang
     AND a.doc_id < b.doc_id
     AND b.doc_id <= a.doc_id + 10
    ORDER BY edit_dist, doc_a, doc_b
    LIMIT 20
    """,
    tags=("dedup", "fuzzy", "levenshtein"),
)
def q108_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo/OCR-grade fuzzy matching: exact Levenshtein distance over
    64-char normalized prefixes for bounded same-language candidate
    pairs, reported as the 20 CLOSEST pairs under a total order
    (edit_dist, doc_a, doc_b) — the character-level complement to token
    Jaccard (q62), fully VALUE-checked (both engines implement exact edit
    distance, so every emitted integer must agree; a closest-pair ranking
    checks real distances on any corpus, where a fixed near-dup threshold
    would go empty on fixture word soup).

    Candidates use the same two-block-probe equi rewrite as q62 (doc_b in
    (doc_a, doc_a+10], hash-joinable on (lang, block) — never a
    nested-loop sweep); at production scale the candidates come from LSH
    buckets and this is the verification stage.  The prefix bound keeps
    the DP cost per pair at O(64²) regardless of document length —
    Spark's `levenshtein(l, r, threshold)` early-exit form is the
    documented fallback when full-text distances are needed.  The top-k
    plans as TakeOrderedAndProject (per-partition heads + k-row merge)."""
    d = _spread(spark, t(spark, sf_dir, "documents"))
    pre = d.select(
        "doc_id",
        "lang",
        F.substring(F.lower(F.trim(F.col("text"))), 1, 64).alias("pre"),
    )
    span = 10
    blk = (F.col("doc_id") / span).cast("long")
    a = pre.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("lang_a"),
        F.col("pre").alias("pre_a"),
        F.explode(F.array(blk, blk + 1)).alias("blk_a"),
    )
    b = pre.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("pre").alias("pre_b"),
        blk.alias("blk_b"),
    )
    return (
        a.join(
            b,
            (F.col("blk_a") == F.col("blk_b"))
            & (F.col("lang_a") == F.col("lang_b"))
            & (F.col("doc_a") < F.col("doc_b"))
            & (F.col("doc_b") <= F.col("doc_a") + span),
        )
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein(F.col("pre_a"), F.col("pre_b"))
            .cast("long")
            .alias("edit_dist"),
        )
        .orderBy("edit_dist", "doc_a", "doc_b")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q110 — duplicate-span removal (sub-document exact dedup)
# --------------------------------------------------------------------------
_SPAN_W = 8


def span_dedup_sql(table: str = "documents", w: int = _SPAN_W) -> str:
    """DuckDB twin of :func:`span_dedup_frame` — parameterized so the
    idiom fuzz harness (tests/test_parity_fuzz.py) can run it over an
    adversarial corpus, not just the fixture."""
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM {table}
    ), spans AS (
        SELECT doc_id, CAST(i AS BIGINT) AS span_no,
               array_to_string(tk[i*{w}+1 : i*{w}+{w}], ' ')
                 AS span
        FROM toks, unnest(range(CAST(ceil(len(tk) / {w}.0) AS BIGINT)))
               AS u(i)
    ), counts AS (
        SELECT span, COUNT(DISTINCT doc_id) AS nd FROM spans GROUP BY span
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(COUNT(*) FILTER (c.nd >= 2) AS BIGINT) AS dup_spans,
           NULLIF(string_agg(s.span, ' ' ORDER BY s.span_no)
                    FILTER (c.nd < 2), '') AS kept_text
    FROM spans s JOIN counts c USING (span)
    GROUP BY s.doc_id
    """


def span_dedup_frame(d: DataFrame, w: int = _SPAN_W) -> DataFrame:
    """Core of q110 over an arbitrary (doc_id, text) frame — see the
    q110 docstring for semantics and the scale analysis."""
    tk = F.split(F.col("text"), " ")
    n_spans = F.ceil(F.size(tk) / F.lit(float(w))).cast("int")
    spans = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_spans - 1),
                lambda i: F.concat_ws(" ", F.slice(tk, i * w + 1, w)),
            )
        ).alias("span_no", "span"),
    )
    counts = spans.groupBy("span").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    kept_structs = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("span_no"),
                F.when(F.col("nd") < 2, F.col("span")).alias("kept"),
            )
        )
    )
    return (
        spans.join(counts, "span")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum((F.col("nd") >= 2).cast("long")).alias("dup_spans"),
            F.nullif(
                F.concat_ws(
                    " ",
                    F.filter(
                        F.transform(kept_structs, lambda s: s["kept"]),
                        lambda x: x.isNotNull(),
                    ),
                ),
                F.lit(""),
            ).alias("kept_text"),
        )
    )


@register(
    "q110_span_dedup",
    oracle=span_dedup_sql(),
    tags=("dedup", "span", "l3"),
)
def q110_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document duplicate-span removal: every document is cut into
    fixed-stride 8-token spans, spans occurring in ≥2 DISTINCT documents
    are dropped, and the survivors are reassembled in order — the
    fixed-stride approximation of exact-substring training-data dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better", ACL'22: boilerplate/licence/navigation text recurs across
    crawled pages whose documents are NOT near-dups, so document-level
    dedup q60-q69 cannot touch it).  Emits (doc_id, n_spans, dup_spans,
    kept_text), kept_text NULL when every span was shared.

    Fully value-checked: span extraction, the distinct-document counts,
    and the reassembled text must agree byte-for-byte with the oracle.
    Both sides NULLIF an empty reassembly: Spark's concat_ws returns ''
    for zero kept spans where string_agg returns NULL, and — the
    converse, caught by review — a document whose ONLY kept span is the
    empty string aggregates to '' in DuckDB while Spark's nullif had
    already collapsed it; the double NULLIF makes the two agree on NULL
    for every empty-string reassembly (tests/test_dedup.py pins the
    lone-empty-doc case).

    Scale: explode is n_tokens/8 rows; the span-frequency pass is one
    partial+final aggregation keyed by the span text (uniform-ish key
    space — a popular boilerplate span concentrates its COUNT, not rows),
    the count join back is 1-row-per-key (no expansion), and the doc
    regroup is one shuffle on doc_id.  No Python, no global sort; at
    100 TB the span key would be md5(span) (16 bytes vs the text) —
    kept verbatim here so the reassembly is oracle-checkable."""
    return span_dedup_frame(_spread(spark, t(spark, sf_dir, "documents")))


# --------------------------------------------------------------------------
# q118 — train/test split-leakage audit (cross-split duplicate content)
# --------------------------------------------------------------------------
#: q74's split rule, imported — the audit must test the SAME assignment
#: q74 produces, so neither the rule nor the hash idiom is re-spelled here
from hadoop_sync_spark.queries.sampling import SQL_SPLIT as _SQL_SPLIT
from hadoop_sync_spark.queries.sampling import split_col as _split_col


@register(
    "q118_split_leakage",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, lang,
               md5(lower(trim(text, ' '))) AS exact_key,
               md5(array_to_string(list_sort(list_distinct(
                   {_SQL_NORM_TOKENS})), ' ')) AS set_key,
               {_SQL_SPLIT} AS split
        FROM documents
    ),
    pairs AS (
        SELECT a.lang, 'exact' AS kind,
               a.doc_id AS test_doc, b.doc_id AS train_doc
        FROM fp a JOIN fp b ON a.exact_key = b.exact_key
        WHERE a.split = 'test' AND b.split = 'train'
        UNION ALL
        SELECT a.lang, 'token_set',
               a.doc_id, b.doc_id
        FROM fp a JOIN fp b ON a.set_key = b.set_key
        WHERE a.split = 'test' AND b.split = 'train'
    )
    SELECT lang, kind,
           CAST(COUNT(*) AS BIGINT) AS leak_pairs,
           MIN(test_doc) AS min_test_doc,
           MIN(train_doc) AS min_train_doc
    FROM pairs GROUP BY lang, kind
    """,
    tags=("dedup", "leakage", "split", "l3"),
)
def q118_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split-leakage audit: every TEST document whose content
    already appears in TRAIN — at two severities: byte-exact (md5 of
    normalized text) and token-set (order/multiplicity-insensitive, the
    q61 key, catching shuffled/padded re-crawls).  This is the audit an
    eval pipeline runs before trusting held-out numbers: the q74 split
    is leakage-safe BY ID (membership is a pure hash of doc_id), but
    nothing stops two DIFFERENT ids carrying the same content across the
    boundary — which is exactly what this surfaces (the fixture has
    zero exact leaks and dozens of token-set leaks).  Reported per
    (lang, severity) with deterministic witness ids.

    Scale: the pair COUNT is computed from per-key group sizes
    (Σ n_test·n_train over shared keys) — both sides aggregate to one
    row per content key BEFORE the join, so a degenerate mega-group
    (thousands of empty/boilerplate documents sharing one set key — the
    common crawl pathology) costs counts×counts arithmetic, never a
    materialized quadratic pair expansion; the oracle states the same
    number by expanding pairs, which DuckDB can afford at fixture
    scale.  Two shuffles per severity (group + key join), hash joins on
    uniform 128-bit keys.  Composable with the near-dup tiers (MinHash
    bands across the boundary) when exact/set equality is too strict."""
    d = t(spark, sf_dir, "documents")
    split = _split_col()
    fp = d.select(
        "doc_id",
        "lang",
        fingerprint(F.col("text")).alias("exact_key"),
        token_set_key(F.col("text")).alias("set_key"),
        split.alias("split"),
    )
    test = fp.filter(F.col("split") == "test")
    train = fp.filter(F.col("split") == "train")

    def leaks(key: str, kind: str) -> DataFrame:
        a = (
            test.groupBy(F.col(key).alias("k"), "lang")
            .agg(
                F.count("*").alias("n_test"),
                F.min("doc_id").alias("t_min"),
            )
        )
        b = (
            train.groupBy(F.col(key).alias("k"))
            .agg(
                F.count("*").alias("n_train"),
                F.min("doc_id").alias("tr_min"),
            )
        )
        return a.join(b, "k").select(
            "lang",
            F.lit(kind).alias("kind"),
            (F.col("n_test") * F.col("n_train")).alias("npairs"),
            "t_min",
            "tr_min",
        )

    per_key = leaks("exact_key", "exact").unionByName(
        leaks("set_key", "token_set")
    )
    return per_key.groupBy("lang", "kind").agg(
        F.sum("npairs").alias("leak_pairs"),
        F.min("t_min").alias("min_test_doc"),
        F.min("tr_min").alias("min_train_doc"),
    )
