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
from hadoop_sync_spark.queries._util import t

#: SQL twin of :func:`hash_bucket` (DuckDB spelling).
_SQL_BUCKET = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100"
)


def hash_bucket(idc: Column, n: int = 100) -> Column:
    """Stable bucket in [0, n): md5-prefix of the stringified id.  The id,
    not the row, carries membership — append-safe and order-free."""
    return (
        F.conv(F.substring(F.md5(idc.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n
    )


# --------------------------------------------------------------------------
# q73 — deterministic stratified sampling by language
# --------------------------------------------------------------------------
_FRACTIONS = {"en": 50, "de": 20}  # percent kept per lang
_DEFAULT_PCT = 10


@register(
    "q73_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source,
           {_SQL_BUCKET} AS bucket
    FROM documents
    WHERE {_SQL_BUCKET} <
          CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20 ELSE 10 END
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
    threshold = F.when(F.col("lang") == "en", 50).when(
        F.col("lang") == "de", 20
    ).otherwise(_DEFAULT_PCT)
    return d.select(
        "doc_id", "lang", "source", bucket.alias("bucket")
    ).filter(F.col("bucket") < threshold)


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
           SUM(n_chars) AS char_cnt
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
