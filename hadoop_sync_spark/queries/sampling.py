"""Deterministic corpus sampling (driver L3: training-data pipeline ops).

Sampling for training data must be REPRODUCIBLE: re-running the pipeline on
the same corpus (or an incrementally grown one) must keep each document's
sample/split membership stable — Bernoulli `df.sample`/`sampleBy` can't
promise that (row-order-dependent RNG streams), and at 100 TB you cannot
afford to materialize membership tables.  The standard fix is
content-addressed bucketing: bucket = hash(stable_id) mod 100, membership =
bucket threshold.  Stateless, shuffle-free, incremental-append-safe, and —
because the hash here is an md5 prefix — bit-identical in the DuckDB
oracle, so both queries are fully hash-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from hadoop_sync_spark.queries import register
from hadoop_sync_spark.queries._util import md5_prefix_long, memo, sql_md5_prefix_long, t

#: SQL twin of :func:`hash_bucket` (DuckDB spelling).
_SQL_BUCKET = f"{sql_md5_prefix_long('CAST(doc_id AS VARCHAR)')} % 100"


def hash_bucket(idc: Column, n: int = 100) -> Column:
    """Stable bucket in [0, n): md5-prefix of the stringified id.  The id,
    not the row, carries membership — append-safe and order-free."""
    return md5_prefix_long(idc.cast("string")) % n


# --------------------------------------------------------------------------
# q73 — deterministic stratified sampling by language
# --------------------------------------------------------------------------
#: Single source of truth for the per-language keep rates (percent); the
#: Spark when-chain and the oracle CASE are both generated from it.
_FRACTIONS = {"en": 50, "de": 20}
_DEFAULT_PCT = 10

_SQL_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{lang}' THEN {pct}" for lang, pct in _FRACTIONS.items())
    + f" ELSE {_DEFAULT_PCT} END"
)


def _threshold() -> Column:
    expr = None
    for lang, pct in _FRACTIONS.items():
        clause = F.when(F.col("lang") == lang, pct)
        expr = clause if expr is None else expr.when(F.col("lang") == lang, pct)
    return expr.otherwise(_DEFAULT_PCT)


@register(
    "q73_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source,
           {_SQL_BUCKET} AS bucket
    FROM documents
    WHERE {_SQL_BUCKET} < {_SQL_CASE}
    """,
    tags=("sampling", "stratified", "l3"),
)
def q73_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus sample with per-language rates (en 50%, de 20%,
    rest 10%) via content-hash bucketing — the mix-rebalancing step of a
    pretraining pipeline, reproducible across runs and robust to appends
    (a document's membership never changes when other rows arrive).

    Scale: narrow per-row predicate on a hash of the id — zero shuffle,
    pushdown-friendly, no RNG state."""
    d = t(spark, sf_dir, "documents")
    bucket, keep = memo(
        "q73",
        lambda: (
            hash_bucket(F.col("doc_id")).alias("bucket"),
            F.col("bucket") < _threshold(),
        ),
    )
    return d.select("doc_id", "lang", "source", bucket).filter(keep)


# --------------------------------------------------------------------------
# q74 — deterministic train/val/test split with per-cell counts
# --------------------------------------------------------------------------
#: the ONE split rule: q74 assigns it, q118's leakage audit must audit
#: the SAME rule — both sides (Spark and SQL) are built from these
TRAIN_PCT, VAL_PCT = 80, 90

#: DuckDB spelling of :func:`split_col`.
SQL_SPLIT = (
    f"CASE WHEN {_SQL_BUCKET} < {TRAIN_PCT} THEN 'train' "
    f"WHEN {_SQL_BUCKET} < {VAL_PCT} THEN 'val' ELSE 'test' END"
)


def split_col() -> Column:
    """The q74 train/val/test assignment as a Column (pure function of
    doc_id — shared with the q118 leakage audit so the two can never
    drift onto different split rules)."""
    bucket = hash_bucket(F.col("doc_id"))
    return (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < VAL_PCT, "val")
        .otherwise("test")
    )


@register(
    "q74_train_val_test_split",
    oracle=f"""
    SELECT lang,
           {SQL_SPLIT} AS split,
           COUNT(*) AS doc_cnt,
           CAST(SUM(n_chars) AS BIGINT) AS char_cnt
    FROM documents
    GROUP BY lang, split
    """,
    tags=("sampling", "split", "l3"),
)
def q74_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by content hash, reported as
    per-(lang, split) document and character counts — the leakage-safe
    split: membership is a pure function of doc_id, so no document can
    migrate between splits across pipeline runs or corpus versions.

    Scale: the split column is free (no shuffle); the count is one
    partial+final aggregation."""
    d = t(spark, sf_dir, "documents")
    split = split_col()
    return (
        d.select("lang", split.alias("split"), "n_chars")
        .groupBy("lang", "split")
        .agg(F.count("*").alias("doc_cnt"), F.sum("n_chars").alias("char_cnt"))
    )


# --------------------------------------------------------------------------
# q107 — exactly-k weighted priority sample (Duffield-Lund-Thorup)
# --------------------------------------------------------------------------
_PRIO_K = 200

#: DuckDB spelling of the integer priority (see q107 docstring).
_SQL_PRIO = (
    "CAST(n_chars AS BIGINT) * 4294967296 // "
    f"({sql_md5_prefix_long('CAST(doc_id AS VARCHAR)')} + 1)"
)


@register(
    "q107_weighted_priority_sample",
    oracle=f"""
    SELECT doc_id, lang, n_chars,
           CAST({_SQL_PRIO} AS BIGINT) AS priority
    FROM documents
    ORDER BY priority DESC, doc_id
    LIMIT {_PRIO_K}
    """,
    tags=("sampling", "weighted", "l3"),
)
def q107_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k weighted sample via priority sampling (Duffield, Lund &
    Thorup, JACM'07): each document draws priority `w/u` — weight
    `n_chars` over a uniform keyed by content hash — and the k highest
    priorities are kept, so heavier documents are proportionally likelier
    to be sampled while the total is EXACTLY k (the guarantee the
    threshold-style q88 trades away).

    Cross-engine exactness: the priority is integer-quantized as
    `(w · 2³²) DIV (h + 1)` with `h` the 32-bit md5 prefix — pure BIGINT
    arithmetic both engines compute identically (a float `w/u` or the
    classic `u^(1/w)` Efraimidis-Spirakis key would hinge on pow/log ULP
    agreement at the top-k boundary), with doc_id as the total-order tie
    breaker.  Like q73/q74, membership is a pure function of (doc_id,
    n_chars): reproducible across runs, no RNG state.

    Scale: plans as TakeOrderedAndProject — per-partition top-k then a
    k-row merge on the driver; no global sort, no shuffle of the corpus."""
    d = t(spark, sf_dir, "documents")
    # stage the hash, then integer-divide with SQL DIV: Column `/` on
    # longs is DOUBLE division, whose nearest-rounding can cross an
    # integer boundary the oracle's exact `//` floors under
    staged = d.select(
        "doc_id",
        "lang",
        "n_chars",
        (md5_prefix_long(F.col("doc_id").cast("string")) + 1).alias("_h"),
    )
    prio = F.expr(
        "CAST(n_chars AS BIGINT) * CAST(4294967296 AS BIGINT) DIV _h"
    )
    return (
        staged.select(
            "doc_id",
            "lang",
            "n_chars",
            prio.alias("priority"),
        )
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(_PRIO_K)
    )


# --------------------------------------------------------------------------
# q113 — deterministic training-shard assignment (seeded corpus shuffle)
# --------------------------------------------------------------------------
_N_SHARDS = 8

#: order-hash: a SECOND, salt-distinguished md5 stream so the within-shard
#: order is independent of the shard-choice hash (same value would sort
#: each shard by its own bucket residue — correlated, not shuffled).
_SQL_ORDER_H = sql_md5_prefix_long("'ord1|' || CAST(doc_id AS VARCHAR)")

#: shard directly as md5-prefix mod 8 — (hash % 100) % 8 would give
#: residues 0-3 a systematic 13/100-vs-12/100 size bias (review finding:
#: 100 = 12·8 + 4), ~8% heavier shards for half the ranks on EVERY corpus
_SQL_SHARD = f"{sql_md5_prefix_long('CAST(doc_id AS VARCHAR)')} % {_N_SHARDS}"


@register(
    "q113_shard_shuffle",
    oracle=f"""
    SELECT doc_id,
           {_SQL_SHARD} AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY {_SQL_SHARD}
               ORDER BY {_SQL_ORDER_H}, doc_id
           ) AS BIGINT) AS pos
    FROM documents
    """,
    tags=("sampling", "shuffle", "l3"),
)
def q113_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle into training shards: each
    document lands in shard `hash(doc_id) mod 8` and takes position
    `row_number` under a SECOND, salt-independent content hash within its
    shard — the epoch-shard construction of a pretraining data loader
    (documents must arrive in a reproducible pseudo-random order, and no
    two ranks may read the same document).  Re-running on the same corpus
    snapshot reproduces the identical order; both hashes are md5 prefixes,
    so every (doc_id, shard, pos) triple is value-checked cross-engine.

    Scale: this is how you shuffle 100 TB WITHOUT a global sort — shard
    membership is a narrow per-row hash (zero shuffle), and ordering is
    per-shard (one shuffle on the shard key, each shard sorted
    independently in parallel; a single global row_number would serialize
    through one partition).  Shard count scales to rank count; positions
    are snapshot-relative (append ⇒ rebuild epoch shards, as data loaders
    do)."""
    d = t(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    shard = hash_bucket(F.col("doc_id"), _N_SHARDS)
    order_h = md5_prefix_long(
        F.concat(F.lit("ord1|"), F.col("doc_id").cast("string"))
    )
    w = (
        Window.partitionBy("shard").orderBy(F.col("_oh"), F.col("doc_id"))
    )
    return (
        d.select(
            "doc_id", shard.alias("shard"), order_h.alias("_oh")
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


# --------------------------------------------------------------------------
# q116 — exactly-k-per-group eval sample (deterministic, hash-ordered)
# --------------------------------------------------------------------------
_EVAL_K = 20

_SQL_EVAL_H = sql_md5_prefix_long("'eval1|' || CAST(doc_id AS VARCHAR)")


@register(
    "q116_eval_per_lang",
    oracle=f"""
    SELECT doc_id, lang, rn FROM (
        SELECT doc_id, lang,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY {_SQL_EVAL_H}, doc_id
               ) AS BIGINT) AS rn
        FROM documents
    ) WHERE rn <= {_EVAL_K}
    """,
    tags=("sampling", "per-group", "eval"),
)
def q116_eval_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out eval-set construction: EXACTLY 20 documents per language,
    chosen by a salted content hash under a total order — the per-group
    twin of q107 (q73's rate-based strata cannot promise a count, and an
    eval set needs one).  The salt ('eval1|') makes the draw independent
    of the q73/q74 split hash, so eval membership does not correlate
    with train/test membership; re-runs reproduce the identical set.

    Scale: rank-then-filter plans as WindowGroupLimit (plan-asserted in
    tests/test_plans.py) — each partition keeps only its local top-20
    per language BEFORE the shuffle, so the exchange carries
    O(partitions · languages · k) rows, not the corpus."""
    d = t(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    h = md5_prefix_long(
        F.concat(F.lit("eval1|"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("_h"), F.col("doc_id"))
    return (
        d.select("doc_id", "lang", h.alias("_h"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _EVAL_K)
        .select("doc_id", "lang", "rn")
    )


# --------------------------------------------------------------------------
# q142 — length-matched control pairing (global 1D nearest-value join)
# --------------------------------------------------------------------------
#: band width for the nearest-length union-merge (n_chars div _MATCH_BAND)
_MATCH_BAND = 64


@register(
    "q142_length_matched_controls",
    oracle="""
    WITH a AS (
        SELECT doc_id AS a_id, n_chars AS a_len FROM documents
        WHERE doc_id % 2 = 1
    ), b AS (
        SELECT doc_id AS b_id, n_chars AS b_len FROM documents
        WHERE doc_id % 2 = 0
    ), r AS (
        SELECT a_id, a_len, b_id, b_len,
               ROW_NUMBER() OVER (
                   PARTITION BY a_id
                   ORDER BY abs(b_len - a_len), b_len, b_id
               ) AS rn
        FROM a CROSS JOIN b
    )
    SELECT a_id, CAST(a_len AS BIGINT) AS a_len,
           b_id, CAST(b_len AS BIGINT) AS b_len,
           CAST(abs(b_len - a_len) AS BIGINT) AS diff
    FROM r WHERE rn = 1
    """,
    tags=("sampling", "matching", "nearest-join"),
)
def q142_length_matched_controls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-matched control pairing: every treatment document (odd
    doc_id) matched to the control-pool document (even doc_id) with the
    NEAREST n_chars — with-replacement nearest-neighbor matching, the
    control-construction step of a paired eval (match on a confounder,
    compare on the treatment axis).  Ties: equal distance prefers the
    shorter control, equal length the smaller doc_id — total order, so
    the output is deterministic.

    The oracle states the semantics as the textbook quadratic
    (cross join + rank); the Spark plan is the scalable GLOBAL 1D
    nearest-join: a per-length deduped control table unions with the
    probe stream, bands on ``n_chars div 64`` partition the
    union-merge windows (below = last control at-or-under in band, above
    = first control strictly over in band), and a TINY per-band
    aggregate frame (≤ one row per band — the q128 cross-bucket idiom)
    carries each band's best below/above candidate across band
    boundaries, broadcast back onto the probes.  One shuffle on the
    band key; no self-join, no global sort (the only partitionless
    window runs on the band-aggregate frame, whose size is the length
    domain / 64).

    Scale: probe volume is corpus-sized but everything control-side
    collapses to ≤ one row per DISTINCT length first — the length
    domain, not the corpus, bounds every auxiliary structure."""
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents")
    probe = d.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("a_id"),
        F.col("n_chars").cast("long").alias("len"),
        F.lit(1).alias("is_probe"),
        F.lit(None).cast("long").alias("b_id"),
    )
    # per-length control representative: the tie rule (min doc_id per
    # equal length) applied ONCE, corpus-scale -> length-domain-scale
    bagg = (
        d.filter(F.col("doc_id") % 2 == 0)
        .groupBy(F.col("n_chars").cast("long").alias("len"))
        .agg(F.min("doc_id").alias("b_id"))
    )
    refs = bagg.select(
        F.lit(None).cast("long").alias("a_id"),
        "len",
        F.lit(0).alias("is_probe"),
        "b_id",
    )
    m = probe.unionByName(refs).withColumn(
        "band", F.expr(f"len div {_MATCH_BAND}")
    )
    ref_struct = F.when(
        F.col("is_probe") == 0, F.struct(F.col("len"), F.col("b_id"))
    )
    # refs sort before probes at equal len (is_probe asc): an equal-length
    # control is below-visible (diff 0) and never above-visible (strict >)
    order = [F.col("len"), F.col("is_probe"), F.col("b_id")]
    w_below = (
        Window.partitionBy("band").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_above = (
        Window.partitionBy("band").orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    within = m.select(
        "a_id", "len", "is_probe", "band",
        F.last(ref_struct, ignorenulls=True).over(w_below).alias("below_in"),
        F.first(ref_struct, ignorenulls=True).over(w_above).alias("above_in"),
    ).filter(F.col("is_probe") == 1)
    # tiny cross-band frame: one row per band present in the union (bands
    # holding probes but no controls included — their mx/mn stay NULL and
    # the skip-null prefix fold reaches past them)
    ref_len = F.when(F.col("is_probe") == 0, F.col("len"))
    bandagg = m.groupBy("band").agg(
        F.max(ref_len).alias("mx"), F.min(ref_len).alias("mn")
    )
    w_prev = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_next = Window.orderBy("band").rowsBetween(1, Window.unboundedFollowing)
    bandctx = bandagg.select(
        "band",
        F.max("mx").over(w_prev).alias("prev_len"),
        F.min("mn").over(w_next).alias("next_len"),
    )
    prev_rep = bagg.select(
        F.col("len").alias("prev_len"), F.col("b_id").alias("prev_id")
    )
    next_rep = bagg.select(
        F.col("len").alias("next_len"), F.col("b_id").alias("next_id")
    )
    bandctx = (
        bandctx.join(F.broadcast(prev_rep), "prev_len", "left")
        .join(F.broadcast(next_rep), "next_len", "left")
        .select("band", "prev_len", "prev_id", "next_len", "next_id")
    )
    j = within.join(F.broadcast(bandctx), "band", "left").select(
        "a_id",
        "len",
        F.coalesce(
            F.col("below_in"),
            F.when(
                F.col("prev_len").isNotNull(),
                F.struct(
                    F.col("prev_len").alias("len"),
                    F.col("prev_id").alias("b_id"),
                ),
            ),
        ).alias("below"),
        F.coalesce(
            F.col("above_in"),
            F.when(
                F.col("next_len").isNotNull(),
                F.struct(
                    F.col("next_len").alias("len"),
                    F.col("next_id").alias("b_id"),
                ),
            ),
        ).alias("above"),
    )
    pick_above = F.col("below").isNull() | (
        F.col("above").isNotNull()
        & (
            (F.col("above.len") - F.col("len"))
            < (F.col("len") - F.col("below.len"))
        )
    )
    best = F.when(pick_above, F.col("above")).otherwise(F.col("below"))
    return j.select(
        "a_id",
        F.col("len").alias("a_len"),
        best["b_id"].alias("b_id"),
        best["len"].alias("b_len"),
        F.abs(best["len"] - F.col("len")).cast("long").alias("diff"),
    )
