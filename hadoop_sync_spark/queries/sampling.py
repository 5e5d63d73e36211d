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
from hadoop_sync_spark.queries._util import md5_prefix_long, sql_md5_prefix_long, t

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
    bucket = hash_bucket(F.col("doc_id"))
    return d.select(
        "doc_id", "lang", "source", bucket.alias("bucket")
    ).filter(F.col("bucket") < _threshold())


# --------------------------------------------------------------------------
# q74 — deterministic train/val/test split with per-cell counts
# --------------------------------------------------------------------------
@register(
    "q74_train_val_test_split",
    oracle=f"""
    SELECT lang,
           CASE WHEN {_SQL_BUCKET} < 80 THEN 'train'
                WHEN {_SQL_BUCKET} < 90 THEN 'val'
                ELSE 'test' END AS split,
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
    bucket = hash_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select("lang", split.alias("split"), "n_chars")
        .groupBy("lang", "split")
        .agg(F.count("*").alias("doc_cnt"), F.sum("n_chars").alias("char_cnt"))
    )
