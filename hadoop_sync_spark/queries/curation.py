"""Corpus-curation operators (driver L3): PII redaction, benchmark
contamination screening, token-budget subsampling, incremental corpus
merge (MERGE INTO semantics), metric unpivot, exact regression
statistics, per-source duplication profile, anti-entropy table
fingerprint reconciliation, and exact heavy hitters.

These are the remaining steps of a training-data pipeline between "scored
documents" (queries/text.py) and "batches" (queries/pipeline_q.py):
scrubbing, decontamination against an eval set, budgeted selection, and
incremental refresh of a published corpus.  Reference parity note: the
reference (kavita26/hadoop-sync, HdfsSynchronizer.java:172-199) only
*moves* data; this curation layer is part of the driver-mandated L3
surface, not a reference port.

Built-in-function discipline as in queries/text.py: regex/split/window/
join only — JVM-side, codegen'd, no Python UDFs; every operator states its
shuffle count and 100 TB posture in its docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from hadoop_sync_spark.queries import register
from hadoop_sync_spark.queries._util import (
    dsum,
    md5_prefix60_long,
    md5_prefix_long,
    sql_dsum,
    sql_md5_prefix60_long,
    sql_md5_prefix_long,
    t,
)
from hadoop_sync_spark.functions.text import WS_RE, normalize, tokens
from hadoop_sync_spark.queries.pipeline_q import _SQL_NORM_TOKENS
from hadoop_sync_spark.queries.sampling import hash_bucket, _SQL_BUCKET

# --------------------------------------------------------------------------
# q86 — PII inject-and-redact round trip
# --------------------------------------------------------------------------
# Cross-engine regex discipline: Java (Spark) and RE2 (DuckDB oracle) agree
# on explicit classes, `(?:...)`, bounded repetition and `\b`; we avoid
# lookaround and backreferences (RE2 has neither).  Groups are
# non-capturing and extraction is explicit group 0, because the engines'
# *default* extraction group differs (Spark regexp_extract_all defaults to
# group 1, DuckDB to group 0).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}(?:\.\d{1,3}){3}\b"

#: The synthetic corpus carries no real PII, so the query plants
#: deterministic PII on every 7th document and then scrubs it — the oracle
#: must agree on both the detection counts and the redacted lengths, which
#: exercises the regexes in both directions (a silent non-match would show
#: up as a char-delta mismatch).
_SQL_INJECTED = (
    "CASE WHEN doc_id % 7 = 0 THEN text || ' contact user' "
    "|| CAST(doc_id AS VARCHAR) || '@example.com or 10.' "
    "|| CAST(doc_id % 200 AS VARCHAR) || '.' "
    "|| CAST(doc_id % 250 AS VARCHAR) || '.' "
    "|| CAST(doc_id % 100 AS VARCHAR) || ' asap' "
    "ELSE text END"
)


def _injected_col() -> F.Column:
    d = F.col("doc_id")
    return F.when(
        d % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            d.cast("string"),
            F.lit("@example.com or 10."),
            (d % 200).cast("string"),
            F.lit("."),
            (d % 250).cast("string"),
            F.lit("."),
            (d % 100).cast("string"),
            F.lit(" asap"),
        ),
    ).otherwise(F.col("text"))


def redact_pii(col: F.Column) -> F.Column:
    """Scrub emails then IPv4 literals from a text column (builtin
    regexp_replace, replace-all)."""
    return F.regexp_replace(
        F.regexp_replace(col, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )


@register(
    "q86_pii_redaction",
    oracle=f"""
    WITH staged AS (
        SELECT source, {_SQL_INJECTED} AS injected FROM documents
    ),
    scrubbed AS (
        SELECT source, injected,
               regexp_replace(regexp_replace(injected,
                   '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{IPV4_RE}', '<IP>', 'g') AS redacted,
               len(regexp_extract_all(injected, '{EMAIL_RE}', 0)) AS n_email,
               len(regexp_extract_all(injected, '{IPV4_RE}', 0)) AS n_ip
        FROM staged
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_email + n_ip > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_with_pii,
           CAST(SUM(n_email) AS BIGINT) AS emails_found,
           CAST(SUM(n_ip) AS BIGINT) AS ips_found,
           CAST(SUM(length(injected) - length(redacted)) AS BIGINT)
               AS char_delta
    FROM scrubbed
    GROUP BY source
    """,
    tags=("curation", "pii", "regex", "l3"),
)
def q86_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub report per source: plant deterministic emails/IPs on every
    7th document, redact them with cross-engine-safe regexes, and account
    for every detection and removed character.

    Scale: narrow per-row regex work inside whole-stage codegen plus ONE
    aggregation shuffle on `source` — the same shape at 100 TB.  Regex
    cost is linear in text length; no Python, no explode."""
    d = t(spark, sf_dir, "documents")
    staged = d.select("source", _injected_col().alias("injected"))
    scrubbed = staged.select(
        "source",
        "injected",
        redact_pii(F.col("injected")).alias("redacted"),
        F.size(
            F.regexp_extract_all(F.col("injected"), F.lit(EMAIL_RE), F.lit(0))
        ).alias("n_email"),
        F.size(
            F.regexp_extract_all(F.col("injected"), F.lit(IPV4_RE), F.lit(0))
        ).alias("n_ip"),
    )
    return scrubbed.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(((F.col("n_email") + F.col("n_ip")) > 0).cast("long")).alias(
            "docs_with_pii"
        ),
        F.sum("n_email").cast("long").alias("emails_found"),
        F.sum("n_ip").cast("long").alias("ips_found"),
        F.sum(F.length("injected") - F.length("redacted"))
        .cast("long")
        .alias("char_delta"),
    )


# --------------------------------------------------------------------------
# q87 — benchmark-contamination screen (n-gram overlap vs a held-out set)
# --------------------------------------------------------------------------
#: Benchmark membership is deterministic (every 97th doc); k=3 over the
#: small synthetic vocabulary yields real collisions, standing in for
#: k=8..13 over natural text (the knob is the same operator).
_CONTAM_K = 3
_BENCH_PRED = "doc_id % 97 = 0"


def _kgrams(tok: F.Column, k: int) -> F.Column:
    """All k-grams of a token array, space-joined; empty for short docs.
    The sequence is gated because Spark's sequence(1, n) auto-steps -1
    when n < 1, fabricating bogus indices."""
    n = F.size(tok) - (k - 1)
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.array_join(F.slice(tok, i, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


_SQL_KGRAMS = (
    "list_transform(range(1, greatest(len(tok) - {km1}, 0) + 1),"
    " i -> array_to_string(tok[CAST(i AS INT):CAST(i AS INT) + {km1}], ' '))"
).format(km1=_CONTAM_K - 1)


@register(
    "q87_contamination_screen",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, {_SQL_NORM_TOKENS} AS tok FROM documents
    ),
    grams AS (
        SELECT doc_id, lang, unnest({_SQL_KGRAMS}) AS gram FROM toks
    ),
    bench AS (
        SELECT DISTINCT gram FROM grams WHERE {_BENCH_PRED}
    ),
    corpus AS (
        SELECT DISTINCT doc_id, lang, gram FROM grams
        WHERE NOT ({_BENCH_PRED})
    ),
    hits AS (
        SELECT corpus.doc_id, corpus.lang
        FROM corpus JOIN bench USING (gram)
    ),
    per_lang_hits AS (
        SELECT lang,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS contaminated_docs,
               CAST(COUNT(*) AS BIGINT) AS gram_hits
        FROM hits GROUP BY lang
    ),
    per_lang AS (
        SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM corpus GROUP BY lang
    )
    SELECT per_lang.lang, n_docs,
           COALESCE(contaminated_docs, 0) AS contaminated_docs,
           COALESCE(gram_hits, 0) AS gram_hits
    FROM per_lang LEFT JOIN per_lang_hits USING (lang)
    """,
    tags=("curation", "contamination", "ngram", "l3"),
)
def q87_contamination_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination report: which corpus documents share a k-gram with
    the benchmark (eval) subset, per language — the screen run before
    training so eval questions aren't in the training set.

    Scale: the benchmark gram set is small by construction (eval suites
    are MBs, corpora are TBs) → broadcast hash join against it, no shuffle
    of the corpus grams; distinct-per-doc and the per-lang rollup are the
    only wide stages.  At 100 TB the distinct runs on (doc_id, gram)
    hashes, and k≥8 keeps the gram stream narrow."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", tokens(normalize(F.col("text"))).alias("tok")
    )
    grams = toks.select(
        "doc_id",
        "lang",
        F.explode(_kgrams(F.col("tok"), _CONTAM_K)).alias("gram"),
    )
    is_bench = F.col("doc_id") % 97 == 0
    bench = grams.where(is_bench).select("gram").distinct()
    corpus = grams.where(~is_bench).distinct()
    hits = corpus.join(F.broadcast(bench), "gram")
    per_lang_hits = hits.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("contaminated_docs"),
        F.count("*").alias("gram_hits"),
    )
    per_lang = corpus.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return per_lang.join(per_lang_hits, "lang", "left").select(
        "lang",
        "n_docs",
        F.coalesce("contaminated_docs", F.lit(0)).alias("contaminated_docs"),
        F.coalesce("gram_hits", F.lit(0)).alias("gram_hits"),
    )


# --------------------------------------------------------------------------
# q88 — per-language token-budget selection (two-phase, no global sort)
# --------------------------------------------------------------------------
_TOKEN_BUDGET = 3000


@register(
    "q88_token_budget_sample",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, lang,
               CAST(len({_SQL_NORM_TOKENS}) AS BIGINT) AS n_tok,
               CAST({_SQL_BUCKET} AS BIGINT) AS bucket
        FROM documents
    ),
    ordered AS (
        SELECT doc_id, lang, n_tok, bucket,
               COALESCE(SUM(n_tok) OVER (
                   PARTITION BY lang ORDER BY bucket, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS tok_before
        FROM docs
    )
    SELECT doc_id, lang, n_tok, bucket FROM ordered
    WHERE tok_before < {_TOKEN_BUDGET}
    """,
    tags=("curation", "sampling", "budget", "l3"),
)
def q88_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget selection: per language, keep documents in
    deterministic content-hash order until {budget} tokens are consumed
    (the last document may straddle the budget) — how a pretraining mix
    caps each language/source at N tokens reproducibly.

    Scale: the naive form is a per-language global sort + running sum over
    EVERY document.  This implementation is two-phase: (1) aggregate token
    sums per (lang, hash-bucket) — one small shuffle, 100 rows/lang; (2) a
    window over that tiny bucket ledger finds each bucket's tokens-before;
    (3) fully-kept buckets pass with a broadcast semi-join and NO sort;
    only the single straddling bucket per language (~1% of rows) gets a
    per-doc running sum.  The oracle states the same semantics as one
    naive window (identical keep set, different plan).  At 100 TB the
    full-sort version is a terabyte-scale sort; this sorts megabytes."""
    d = t(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        "lang",
        F.size(tokens(normalize(F.col("text")))).cast("long").alias("n_tok"),
        hash_bucket(F.col("doc_id")).cast("long").alias("bucket"),
    )
    ledger = docs.groupBy("lang", "bucket").agg(
        F.sum("n_tok").alias("btok")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ledger = ledger.select(
        "lang",
        "bucket",
        "btok",
        F.coalesce(F.sum("btok").over(w), F.lit(0)).alias("bucket_before"),
    )
    budget = F.lit(_TOKEN_BUDGET)
    full = ledger.where(
        F.col("bucket_before") + F.col("btok") <= budget
    ).select("lang", "bucket")
    straddle = ledger.where(
        (F.col("bucket_before") < budget)
        & (F.col("bucket_before") + F.col("btok") > budget)
    ).select("lang", "bucket", "bucket_before")

    kept_full = docs.join(F.broadcast(full), ["lang", "bucket"], "left_semi")

    wdoc = (
        Window.partitionBy("lang", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    straddle_docs = docs.join(F.broadcast(straddle), ["lang", "bucket"])
    kept_straddle = (
        straddle_docs.select(
            "doc_id",
            "lang",
            "n_tok",
            "bucket",
            (
                F.col("bucket_before")
                + F.coalesce(F.sum("n_tok").over(wdoc), F.lit(0))
            ).alias("tok_before"),
        )
        .where(F.col("tok_before") < budget)
        .drop("tok_before")
    )
    return kept_full.select("doc_id", "lang", "n_tok", "bucket").unionByName(
        kept_straddle
    )


# --------------------------------------------------------------------------
# q89 — incremental corpus merge (MERGE INTO semantics as a join rewrite)
# --------------------------------------------------------------------------
_SQL_CHANGESET = """
        SELECT doc_id, upper(text) AS text, lang, source
        FROM documents WHERE doc_id % 10 = 0
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text || ' v2' AS text, lang, source
        FROM documents WHERE doc_id % 50 = 0
"""


@register(
    "q89_corpus_merge",
    oracle=f"""
    WITH changes AS ({_SQL_CHANGESET}
    )
    SELECT CASE WHEN b.doc_id IS NULL THEN 'insert'
                WHEN c.doc_id IS NULL THEN 'keep'
                ELSE 'update' END AS action,
           COALESCE(c.lang, b.lang) AS lang,
           CAST(COUNT(*) AS BIGINT) AS doc_cnt,
           CAST(SUM(length(COALESCE(c.text, b.text))) AS BIGINT) AS char_cnt
    FROM documents b FULL OUTER JOIN changes c USING (doc_id)
    GROUP BY action, COALESCE(c.lang, b.lang)
    """,
    tags=("curation", "merge", "upsert", "l3"),
)
def q89_corpus_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus refresh with MERGE INTO semantics, expressed as
    the full-outer-join rewrite (plain-parquet tables have no MERGE):
    a deterministic changeset (every 10th doc re-crawled and upper-cased;
    every 50th doc spawning a new versioned doc) merges into the base
    corpus; output audits the merge per (action, lang).

    Scale: ONE co-partitioning shuffle — the full outer join on doc_id
    (sort-merge; Spark cannot broadcast a full-outer side, and at corpus
    scale both sides are large anyway; AQE splits skewed key ranges) —
    plus the audit aggregation.  The same rewrite is the writer for
    registry-managed corpora: action='keep' rows short-circuit to
    existing files, only insert/update partitions rewrite."""
    d = t(spark, sf_dir, "documents")
    updates = d.where(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.upper("text").alias("text"), "lang", "source"
    )
    inserts = d.where(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" v2")).alias("text"),
        "lang",
        "source",
    )
    changes = updates.unionByName(inserts)
    b = d.alias("b")
    c = changes.alias("c")
    merged = b.join(c, F.col("b.doc_id") == F.col("c.doc_id"), "full_outer")
    action = (
        F.when(F.col("b.doc_id").isNull(), F.lit("insert"))
        .when(F.col("c.doc_id").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
    )
    return merged.select(
        action.alias("action"),
        F.coalesce(F.col("c.lang"), F.col("b.lang")).alias("lang"),
        F.coalesce(F.col("c.text"), F.col("b.text")).alias("new_text"),
    ).groupBy("action", "lang").agg(
        F.count("*").alias("doc_cnt"),
        F.sum(F.length("new_text")).cast("long").alias("char_cnt"),
    )


# --------------------------------------------------------------------------
# q93 — unpivot / melt (wide metrics → long form)
# --------------------------------------------------------------------------
@register(
    "q93_unpivot_metrics",
    oracle=f"""
    WITH agg AS (
        SELECT o_orderpriority,
               {sql_dsum('o_totalprice')} AS total_price,
               CAST(COUNT(*) AS DOUBLE) AS order_cnt
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'total_price' AS metric, total_price AS value
    FROM agg
    UNION ALL
    SELECT o_orderpriority, 'order_cnt' AS metric, order_cnt AS value
    FROM agg
    """,
    tags=("relational", "unpivot", "melt"),
)
def q93_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (DataFrame.unpivot / SQL UNPIVOT): per-priority
    order metrics melted to (priority, metric, value) rows — the missing
    half of q33's pivot, used by metric stores and chart feeds.

    Scale: the aggregation is the only shuffle; unpivot itself is a
    narrow per-row expansion (Spark `Expand` node, no exchange)."""
    o = t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        dsum("o_totalprice").alias("total_price"),
        F.count("*").cast("double").alias("order_cnt"),
    )
    return agg.unpivot(
        ["o_orderpriority"],
        ["total_price", "order_cnt"],
        "metric",
        "value",
    )


# --------------------------------------------------------------------------
# q94 — exact regression statistics via integer power sums
# --------------------------------------------------------------------------
@register(
    "q94_regression_stats",
    oracle="""
    WITH sums AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sx,
               CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT)) AS DOUBLE)
                   AS sy,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(ROUND(l_extendedprice) AS BIGINT)
                      * CAST(ROUND(l_extendedprice) AS BIGINT)) AS DOUBLE)
                   AS syy,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                      * CAST(ROUND(l_extendedprice) AS BIGINT)) AS DOUBLE)
                   AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
               AS corr_qty_price,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS regr_slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
               AS regr_intercept
    FROM sums
    """,
    tags=("agg", "statistics", "regression"),
)
def q94_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation and least-squares regression of price on quantity per
    return flag — computed from EXACT integer power sums (quantity is
    integer-valued; price is rounded to whole units first), so both
    engines fold identical BIGINTs and the final double arithmetic is the
    same IEEE expression tree on identical scalars: bit-identical results,
    where native corr()/regr_slope() would drift by reduction order.

    Scale: one partial+final aggregation shuffle, all sums in whole-stage
    codegen.  Overflow headroom: price ≤ ~1.1e5 → syy term ≤ 1.2e10/row →
    int64 safe beyond sf100 per group; document wider accumulators past
    that."""
    li = t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice")).cast("long")
    sums = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov_n = n * sxy - sx * sy
    slope = cov_n / (n * sxx - sx * sx)
    return sums.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        (
            cov_n / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_price"),
        slope.alias("regr_slope"),
        ((sy - slope * sx) / n).alias("regr_intercept"),
    )


# --------------------------------------------------------------------------
# q96 — per-source duplication health profile
# --------------------------------------------------------------------------
@register(
    "q96_dup_profile",
    oracle="""
    WITH fp AS (
        SELECT source, md5(lower(trim(text, ' '))) AS f FROM documents
    ),
    c AS (
        SELECT f, CAST(COUNT(*) AS BIGINT) AS cnt FROM fp GROUP BY f
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_docs,
           CAST(COUNT(DISTINCT f) AS BIGINT) AS distinct_fps,
           CAST(MAX(cnt) AS BIGINT) AS max_clone_cnt
    FROM fp JOIN c USING (f)
    GROUP BY source
    """,
    tags=("curation", "dedup", "report", "l3"),
)
def q96_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication health report: how many of a source's
    documents are exact clones (by normalized-content fingerprint), how
    many distinct texts it contributes, and its worst clone multiplicity
    — the dashboard a corpus curator watches to decide which sources need
    dedup before mixing (q78) or budgeting (q88).

    Scale: two shuffles — fingerprint counts (map-side combined) and the
    per-source rollup; the join back to rows is on the fingerprint key the
    first aggregation already partitioned by, so AQE reuses the exchange.
    No Python, no explode."""
    from hadoop_sync_spark.functions.text import fingerprint

    d = t(spark, sf_dir, "documents")
    fp = d.select("source", fingerprint(F.col("text")).alias("f"))
    counts = fp.groupBy("f").agg(F.count("*").cast("long").alias("cnt"))
    return (
        fp.join(counts, "f")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("cnt") > 1).cast("long")).alias("dup_docs"),
            F.countDistinct("f").alias("distinct_fps"),
            F.max("cnt").alias("max_clone_cnt"),
        )
    )


# --------------------------------------------------------------------------
# q97 — table fingerprint reconciliation (anti-entropy check)
# --------------------------------------------------------------------------
# Canonical row string: integer/string columns only (doubles ride the
# scaled-BIGINT idiom, timestamps ride tz-pinned epoch micros), so both
# engines render byte-identical strings — float formatting never enters.
_SQL_LI_ROWSTR = (
    "concat_ws('|', l_orderkey, l_partkey, l_suppkey, {LINENO}, "
    "CAST(ROUND(l_quantity*100) AS BIGINT), "
    "CAST(ROUND(l_extendedprice*100) AS BIGINT), "
    "CAST(ROUND(l_discount*100) AS BIGINT), "
    "CAST(ROUND(l_tax*100) AS BIGINT), "
    "l_returnflag, l_linestatus, epoch_us(l_shipdate))"
)
#: deliberate drift planted in the "replica": every l_orderkey divisible by
#: 997 gets its line number shifted, so a handful of buckets must mismatch
_SQL_LINENO_B = (
    "CASE WHEN l_orderkey % 997 = 0 THEN l_linenumber + 100 "
    "ELSE l_linenumber END"
)

_N_FP_BUCKETS = 64
_FP_MOD = 1000003  # keeps the additive digest < 2^63 for ~9e12 rows/bucket


def _li_rowstr(lineno: F.Column) -> F.Column:
    """Canonical lineitem row string (integer/string columns only — see
    the module note above ``_SQL_LI_ROWSTR``)."""
    return F.concat_ws(
        "|",
        F.col("l_orderkey"),
        F.col("l_partkey"),
        F.col("l_suppkey"),
        lineno,
        F.round(F.col("l_quantity") * 100).cast("long"),
        F.round(F.col("l_extendedprice") * 100).cast("long"),
        F.round(F.col("l_discount") * 100).cast("long"),
        F.round(F.col("l_tax") * 100).cast("long"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        # naive shipdate → micros, pinned to UTC (session-tz-independent)
        F.expr("unix_micros(to_utc_timestamp(l_shipdate,'UTC'))"),
    )


def _spread_li(spark: SparkSession, li: DataFrame) -> DataFrame:
    """Widen a narrow lineitem scan before the fingerprint passes
    (round 14; the dedup._spread pattern).  The digest/drilldown
    queries do per-row md5+conv work in EVERY pass, and a small
    single-file table arrives as ONE partition — at sf0.1 that
    serialized four 600k-row fingerprint scans onto one core (q109
    measured 10.8 s wall over only 25 completed tasks).  One
    deterministic hash repartition, shared by every consumer through
    AQE exchange reuse, runs them all wide.  No-op at scale: a real
    table's scan already has >= defaultParallelism splits."""
    par = spark.sparkContext.defaultParallelism
    if li.rdd.getNumPartitions() < par:
        return li.repartition(par, "l_orderkey")
    return li


def _li_bucket_digest(li: DataFrame, lineno: F.Column) -> DataFrame:
    """Per-bucket order-insensitive digest of lineitem rows: row count,
    XOR-fold and bounded additive fold of a 32-bit md5 row fingerprint."""
    fp = md5_prefix_long(_li_rowstr(lineno))
    return (
        li.select(fp.alias("fp"))
        .groupBy((F.col("fp") % _N_FP_BUCKETS).alias("bucket"))
        .agg(
            F.count("*").alias("cnt"),
            F.expr("bit_xor(fp)").alias("xr"),
            F.sum(F.col("fp") % _FP_MOD).alias("ms"),
        )
    )


def _sql_bucket_digest(lineno_expr: str) -> str:
    rowstr = _SQL_LI_ROWSTR.format(LINENO=lineno_expr)
    return f"""
        SELECT fp % {_N_FP_BUCKETS} AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(bit_xor(fp) AS BIGINT) AS xr,
               CAST(SUM(fp % {_FP_MOD}) AS BIGINT) AS ms
        FROM (SELECT {sql_md5_prefix_long(rowstr)} AS fp FROM lineitem)
        GROUP BY 1
    """


@register(
    "q97_table_fingerprint_diff",
    oracle=f"""
    WITH a AS ({_sql_bucket_digest("l_linenumber")}),
         b AS ({_sql_bucket_digest(_SQL_LINENO_B)})
    SELECT COALESCE(a.bucket, b.bucket) AS bucket,
           CAST(COALESCE(a.cnt, 0) AS BIGINT) AS cnt_a,
           CAST(COALESCE(b.cnt, 0) AS BIGINT) AS cnt_b,
           (a.cnt IS NOT DISTINCT FROM b.cnt
            AND a.xr IS NOT DISTINCT FROM b.xr
            AND a.ms IS NOT DISTINCT FROM b.ms) AS bucket_match
    FROM a FULL OUTER JOIN b USING (bucket)
    """,
    tags=("reconcile", "fingerprint", "anti-entropy", "l3"),
)
def q97_table_fingerprint_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy table reconciliation: compare two table states by
    per-bucket content digests instead of row-by-row transfer — the
    data-plane completion of the reference's metadata diff
    (``HdfsSynchronizer.java:172-199`` diffs *catalog entries*; this diffs
    the *rows behind them*).  A replica that drifted (here: a planted
    line-number shift on every 997th order) surfaces as mismatched digest
    buckets; matching buckets certify their rows wholesale.

    Digest = (count, XOR-fold, bounded additive fold) of a 32-bit md5 row
    fingerprint over a canonical row string, bucketed by fingerprint.  XOR
    and the mod-1e6 sum are order- and partition-insensitive, exact in
    int64 under ANSI mode (no overflow: additive term < 1e6, ~9e12 rows of
    headroom per bucket), and cross-engine identical (md5 everywhere;
    xxhash64 is Spark-only).

    Scale: each side is one scan + one 64-group partial+final aggregation
    — the shuffle carries 64 rows per side regardless of table size; the
    reconcile join is on 64-row digests.  At 100 TB this is the Merkle
    level-0 sweep: only mismatched buckets need a drill-down rescan
    (re-digest the bucket at finer granularity), never a full-table sort
    or exchange."""
    li = _spread_li(spark, t(spark, sf_dir, "lineitem"))
    a = _li_bucket_digest(li, F.col("l_linenumber"))
    b = _li_bucket_digest(
        li,
        F.when(
            F.col("l_orderkey") % 997 == 0, F.col("l_linenumber") + 100
        ).otherwise(F.col("l_linenumber")),
    )
    a, b = a.alias("a"), b.alias("b")
    return a.join(b, "bucket", "full_outer").select(
        F.col("bucket"),
        F.coalesce(F.col("a.cnt"), F.lit(0)).alias("cnt_a"),
        F.coalesce(F.col("b.cnt"), F.lit(0)).alias("cnt_b"),
        (
            F.col("a.cnt").eqNullSafe(F.col("b.cnt"))
            & F.col("a.xr").eqNullSafe(F.col("b.xr"))
            & F.col("a.ms").eqNullSafe(F.col("b.ms"))
        ).alias("bucket_match"),
    )


# --------------------------------------------------------------------------
# q109 — Merkle drill-down: from mismatched digests to exact drifted rows
# --------------------------------------------------------------------------
_N_FP_SUBBUCKETS = 4096  # 64 sub-buckets per level-0 bucket (64 | 4096)

_SQL_FP_ROWS = """
    SELECT l_orderkey, CAST({LINENO} AS BIGINT) AS l_linenumber,
           fp % {NB} AS bucket, fp % {NSB} AS subbucket, leaf
    FROM (SELECT *, {FP} AS fp, {LEAF} AS leaf FROM lineitem)
"""

_SQL_BAD_DIGEST = """
    SELECT COALESCE(a.{K}, b.{K}) AS {K}
    FROM {A} a FULL OUTER JOIN {B} b USING ({K})
    WHERE NOT (a.cnt IS NOT DISTINCT FROM b.cnt
           AND a.xr IS NOT DISTINCT FROM b.xr
           AND a.ms IS NOT DISTINCT FROM b.ms)
"""


def _keyed_fp_rows(li: DataFrame, lineno: F.Column) -> DataFrame:
    """Per-row fingerprints with their digest-tree coordinates: level-0
    bucket (fp32 % 64 — MUST equal the q97 digest bucketing so the drill
    descends the same tree), level-1 sub-bucket (fp32 % 4096; since
    64 | 4096, each sub-bucket nests inside exactly one bucket), and the
    60-bit leaf identity."""
    rowstr = _li_rowstr(lineno)
    fp = md5_prefix_long(rowstr)
    return li.select(
        F.col("l_orderkey"),
        lineno.cast("long").alias("l_linenumber"),
        (fp % _N_FP_BUCKETS).alias("bucket"),
        (fp % _N_FP_SUBBUCKETS).alias("subbucket"),
        md5_prefix60_long(rowstr).alias("leaf"),
    )


def _leaf_digest(rows: DataFrame, key: str) -> DataFrame:
    return rows.groupBy(key).agg(
        F.count("*").alias("cnt"),
        F.expr("bit_xor(leaf)").alias("xr"),
        F.sum(F.col("leaf") % _FP_MOD).alias("ms"),
    )


def _digest_mismatches(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    a, b = a.alias("a"), b.alias("b")
    return (
        a.join(b, key, "full_outer")
        .filter(
            ~(
                F.col("a.cnt").eqNullSafe(F.col("b.cnt"))
                & F.col("a.xr").eqNullSafe(F.col("b.xr"))
                & F.col("a.ms").eqNullSafe(F.col("b.ms"))
            )
        )
        .select(key)
    )


@register(
    "q109_fingerprint_drilldown",
    oracle=f"""
    WITH a0 AS ({_sql_bucket_digest("l_linenumber")}),
         b0 AS ({_sql_bucket_digest(_SQL_LINENO_B)}),
         bad0 AS ({_SQL_BAD_DIGEST.format(A="a0", B="b0", K="bucket")}),
         ra AS ({_SQL_FP_ROWS.format(
             LINENO="l_linenumber", NB=_N_FP_BUCKETS, NSB=_N_FP_SUBBUCKETS,
             FP=sql_md5_prefix_long(_SQL_LI_ROWSTR.format(LINENO="l_linenumber")),
             LEAF=sql_md5_prefix60_long(_SQL_LI_ROWSTR.format(LINENO="l_linenumber")))}),
         rb AS ({_SQL_FP_ROWS.format(
             LINENO=_SQL_LINENO_B, NB=_N_FP_BUCKETS, NSB=_N_FP_SUBBUCKETS,
             FP=sql_md5_prefix_long(_SQL_LI_ROWSTR.format(LINENO=_SQL_LINENO_B)),
             LEAF=sql_md5_prefix60_long(_SQL_LI_ROWSTR.format(LINENO=_SQL_LINENO_B)))}),
         ra0 AS (SELECT * FROM ra WHERE bucket IN (SELECT bucket FROM bad0)),
         rb0 AS (SELECT * FROM rb WHERE bucket IN (SELECT bucket FROM bad0)),
         sa AS (SELECT subbucket, CAST(COUNT(*) AS BIGINT) AS cnt,
                       CAST(bit_xor(leaf) AS BIGINT) AS xr,
                       CAST(SUM(leaf % {_FP_MOD}) AS BIGINT) AS ms
                FROM ra0 GROUP BY 1),
         sb AS (SELECT subbucket, CAST(COUNT(*) AS BIGINT) AS cnt,
                       CAST(bit_xor(leaf) AS BIGINT) AS xr,
                       CAST(SUM(leaf % {_FP_MOD}) AS BIGINT) AS ms
                FROM rb0 GROUP BY 1),
         bad1 AS ({_SQL_BAD_DIGEST.format(A="sa", B="sb", K="subbucket")}),
         la AS (SELECT l_orderkey, l_linenumber, leaf,
                       CAST(COUNT(*) AS BIGINT) AS cnt_a
                FROM ra0 WHERE subbucket IN (SELECT subbucket FROM bad1)
                GROUP BY 1, 2, 3),
         lb AS (SELECT l_orderkey, l_linenumber, leaf,
                       CAST(COUNT(*) AS BIGINT) AS cnt_b
                FROM rb0 WHERE subbucket IN (SELECT subbucket FROM bad1)
                GROUP BY 1, 2, 3)
    SELECT CASE WHEN COALESCE(cnt_a, 0) > COALESCE(cnt_b, 0)
                THEN 'authoritative_only' ELSE 'replica_only' END AS side,
           l_orderkey, l_linenumber
    FROM la FULL OUTER JOIN lb USING (l_orderkey, l_linenumber, leaf)
    WHERE COALESCE(cnt_a, 0) != COALESCE(cnt_b, 0)
    """,
    tags=("reconcile", "fingerprint", "anti-entropy", "drilldown", "l3"),
)
def q109_fingerprint_drilldown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drill-down q97's docstring promises: descend from mismatched
    level-0 digest buckets to the EXACT drifted row identities, never
    shuffling rows outside mismatched subtrees.  Same planted drift as
    q97 (every 997th order's line numbers shifted on the "replica" side);
    output is one row per drifted physical row — (side, l_orderkey,
    l_linenumber) with side = which table state has it.

    Three-level stateless Merkle sweep:
      level 0 — q97's 64-bucket digests (exchange: 64 rows/side);
      level 1 — rows in mismatched buckets only, re-digested at 4096
        sub-buckets nested 64-per-bucket (fp%64 = (fp%4096)%64), using
        the 60-bit leaf fingerprint (32-bit birthday-collides ~100k rows;
        60-bit holds to ~1e9 rows per bucket);
      leaf — rows in mismatched SUB-buckets only, full-outer multiset
        diff on (leaf, key) → per-row classification.

    Scale: each level rescans the table (scans are cheap, embarrassingly
    parallel, and pruned by nothing weaker than the digest tree itself)
    but the exchanges shrink geometrically: 64 rows, then |bad buckets|
    ·N/64 rows, then |bad sub-buckets|·N/4096 rows — at 100 TB with ε
    drift the leaf diff shuffles ~ε·N + N/4096-per-bad-subtree instead of
    the full table, which is the entire point of anti-entropy digests
    (the mismatched-bucket sets ride as broadcast semi-join filters, tiny
    by construction).  A persisted digest tree (registry-published, per
    q95's compaction lifecycle) would drop the rescans too; the stateless
    form is the worst case."""
    li = _spread_li(spark, t(spark, sf_dir, "lineitem"))
    lineno_b = F.when(
        F.col("l_orderkey") % 997 == 0, F.col("l_linenumber") + 100
    ).otherwise(F.col("l_linenumber"))

    bad0 = _digest_mismatches(
        _li_bucket_digest(li, F.col("l_linenumber")),
        _li_bucket_digest(li, lineno_b),
        "bucket",
    )
    # NOTE (round 14, measured): do NOT materialize bad0/bad1 as local
    # relations "to cut the rescans".  The static plan prints 36 scans
    # because the digest subtrees repeat under every consumer, but
    # AQE's runtime exchange reuse dedups the identical subtrees inside
    # the one collect action — the executed run completes 25 tasks.
    # Collect-then-reattach splits the action into separate jobs that
    # cannot share exchanges: same-boot A/B ran 121 tasks and
    # 10.8 s → 13.8 s.  The lazy form IS the optimized form.
    ra = _keyed_fp_rows(li, F.col("l_linenumber")).join(
        F.broadcast(bad0), "bucket"
    )
    rb = _keyed_fp_rows(li, lineno_b).join(F.broadcast(bad0), "bucket")

    bad1 = _digest_mismatches(
        _leaf_digest(ra, "subbucket"), _leaf_digest(rb, "subbucket"), "subbucket"
    )
    keys = ["l_orderkey", "l_linenumber", "leaf"]
    la = (
        ra.join(F.broadcast(bad1), "subbucket")
        .groupBy(keys)
        .agg(F.count("*").alias("cnt_a"))
    )
    lb = (
        rb.join(F.broadcast(bad1), "subbucket")
        .groupBy(keys)
        .agg(F.count("*").alias("cnt_b"))
    )
    return (
        la.join(lb, keys, "full_outer")
        .withColumn("cnt_a", F.coalesce("cnt_a", F.lit(0)))
        .withColumn("cnt_b", F.coalesce("cnt_b", F.lit(0)))
        .filter(F.col("cnt_a") != F.col("cnt_b"))
        .select(
            F.when(
                F.col("cnt_a") > F.col("cnt_b"), F.lit("authoritative_only")
            )
            .otherwise(F.lit("replica_only"))
            .alias("side"),
            "l_orderkey",
            "l_linenumber",
        )
    )


# --------------------------------------------------------------------------
# q98 — exact corpus heavy hitters
# --------------------------------------------------------------------------
_HH_PPM = 1000  # report terms ≥ 0.1% of all corpus tokens


@register(
    "q98_heavy_hitters",
    oracle=f"""
    WITH tok AS (
        SELECT unnest({_SQL_NORM_TOKENS}) AS term FROM documents
    ), c AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY term
    ), n AS (SELECT COUNT(*) AS total FROM tok)
    SELECT term, cnt,
           CAST((cnt * 1000000) // (SELECT total FROM n) AS BIGINT) AS ppm
    FROM c
    WHERE (cnt * 1000000) // (SELECT total FROM n) >= {_HH_PPM}
    """,
    tags=("text", "heavy-hitters", "frequency", "l3"),
)
def q98_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters: every normalized token holding at least
    0.1% of all token occurrences, with its exact count and integer
    parts-per-million share — the vocabulary/stopword profile a corpus
    curator reads before filtering (and the exact answer sketches like
    Misra-Gries or Count-Min approximate).

    The share is integer arithmetic (``cnt * 1e6 DIV total``) so both
    engines agree exactly — no float division in the cut-off predicate.

    Scale: explode + one partial+final aggregation on the term key —
    map-side combine absorbs hot-token skew before the shuffle; the total
    is a broadcast scalar.  Headroom note: cnt*1e6 needs int64 → exact up
    to ~9e12 occurrences of a single term; past that (a 100 TB corpus's
    top stopword) divide total first or fold through DECIMAL(38,0) — or
    switch to the per-partition Misra-Gries + merge pattern when even one
    exact pass is too much."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens(normalize(F.col("text")))).alias("term"))
    counts = tok.groupBy("term").agg(F.count("*").alias("cnt"))
    total = tok.agg(F.count("*").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("ppm", F.expr("cnt * 1000000 DIV total"))
        .filter(F.col("ppm") >= _HH_PPM)
        .select("term", "cnt", "ppm")
    )


# --------------------------------------------------------------------------
# q105 — Misra-Gries heavy hitters (the sketch upgrade path q98 documents)
# --------------------------------------------------------------------------
_MG_K = 2000  # sketch capacity: error ≤ n/(K+1) token occurrences


@register(
    "q105_misra_gries",
    oracle=f"""
    WITH tok AS (
        SELECT unnest({_SQL_NORM_TOKENS}) AS term FROM documents
    ), c AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY term
    ), n AS (SELECT COUNT(*) AS total FROM tok)
    SELECT term, cnt,
           CAST((cnt * 1000000) // (SELECT total FROM n) AS BIGINT) AS ppm,
           TRUE AS mg_found_ok,
           TRUE AS mg_err_ok
    FROM c
    WHERE (cnt * 1000000) // (SELECT total FROM n) >= {_HH_PPM}
    """,
    tags=("text", "heavy-hitters", "sketch", "l3"),
)
def q105_misra_gries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters — the mergeable-sketch path q98's
    docstring points to for when even one exact aggregation pass is too
    much.  Per-partition capacity-K sketches over the token stream
    (Arrow-batched `mapInPandas`; the iterated-min decrement is computed
    in one vectorized step — subtracting the (m−K)-th smallest counter
    value is exactly equivalent), merged by summing surviving counters:
    per-partition errors add to ≤ n/(K+1) TOTAL (Agarwal et al.,
    "Mergeable Summaries", PODS'12), so the merged estimate `est`
    satisfies  cnt − n/(K+1) ≤ est ≤ cnt.

    Driver-checked through the guarantee, not the (partitioning-
    dependent) estimates: for every EXACT heavy hitter (≥0.1% share,
    values oracle-checked like q98), `mg_found_ok` pins that the sketch
    surfaced it — guaranteed, since cnt > n/1000 > n/(K+1) — and
    `mg_err_ok` pins the integer-exact error bound
    (cnt − est)·(K+1) ≤ total.

    Scale: the sketch shuffle carries ≤ K rows per partition regardless
    of corpus size — this is the operator whose exchange stays KB-sized
    at 100 TB; the exact pass alongside it exists only as the acceptance
    oracle."""
    d = t(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens(normalize(F.col("text")))).alias("term"))

    def mg(batches):
        import numpy as np
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for term, c in pdf["term"].value_counts().items():
                counters[term] = counters.get(term, 0) + int(c)
            m = len(counters)
            if m > _MG_K:
                vals = np.sort(np.fromiter(counters.values(), dtype=np.int64))
                delta = int(vals[m - _MG_K - 1])
                counters = {
                    t_: c - delta for t_, c in counters.items() if c > delta
                }
        yield pd.DataFrame(
            {"term": list(counters), "est": list(counters.values())}
        )

    sketch = (
        tok.mapInPandas(mg, "term string, est long")
        .groupBy("term")
        .agg(F.sum("est").alias("est"))
    )
    counts = tok.groupBy("term").agg(F.count("*").alias("cnt"))
    total = tok.agg(F.count("*").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("ppm", F.expr("cnt * 1000000 DIV total"))
        .filter(F.col("ppm") >= _HH_PPM)
        .join(sketch, "term", "left")
        .select(
            "term",
            "cnt",
            "ppm",
            F.col("est").isNotNull().alias("mg_found_ok"),
            (
                (F.col("cnt") - F.coalesce(F.col("est"), F.lit(0)))
                * (_MG_K + 1)
                <= F.col("total")
            ).alias("mg_err_ok"),
        )
    )


# --------------------------------------------------------------------------
# q112 — data-quality constraint report (Deequ-style, single-pass)
# --------------------------------------------------------------------------
@register(
    "q112_quality_constraints",
    oracle="""
    WITH m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(l_shipdate) AS BIGINT) AS ship_nn,
               CAST(COUNT(*) FILTER (l_quantity BETWEEN 1 AND 50) AS BIGINT)
                 AS qty_ok,
               CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
                 AS pk_distinct,
               CAST(COUNT(*) FILTER (l_returnflag IN ('R','A','N')) AS BIGINT)
                 AS rf_ok
        FROM lineitem
    ), orph AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS orphans
        FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT 'row_count' AS check_name, CAST(n AS DOUBLE) AS metric,
           n >= 1 AS ok FROM m
    UNION ALL
    SELECT 'completeness_l_shipdate', CAST(ship_nn AS DOUBLE) / n,
           ship_nn = n FROM m
    UNION ALL
    SELECT 'domain_l_quantity_1_50', CAST(qty_ok AS DOUBLE) / n,
           qty_ok = n FROM m
    UNION ALL
    SELECT 'accepted_values_l_returnflag', CAST(rf_ok AS DOUBLE) / n,
           rf_ok = n FROM m
    UNION ALL
    SELECT 'uniqueness_orderkey_linenumber', CAST(pk_distinct AS DOUBLE) / n,
           pk_distinct = n FROM m
    UNION ALL
    SELECT 'referential_lineitem_orders', CAST(orphans AS DOUBLE),
           orphans = 0 FROM orph
    """,
    tags=("curation", "quality", "constraints"),
)
def q112_quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over the fact table (the Deequ
    pattern: Schelter et al., "Automating Large-Scale Data Quality
    Verification", VLDB'18) — the admission check a training-data
    pipeline runs before a corpus snapshot is published: row-count
    floor, completeness (l_shipdate), value domain (l_quantity ∈
    [1,50]), accepted values (l_returnflag), key uniqueness
    ((l_orderkey, l_linenumber) — genuinely violated in the fixture, so
    the failing row is exercised), and referential integrity (every
    lineitem has its order).  Emits one long-form row per constraint:
    (check_name, metric DOUBLE, ok BOOLEAN).

    Scale: ALL row-level checks fold into ONE partial+final aggregation
    pass over the fact table (no per-constraint scans — the point of the
    Deequ design); the distinct-key count rides the same pass, and the
    referential check is one anti-join whose build side (orders keys) is
    dimension-scale here and bloom/broadcast-prunable at 100 TB.  The
    report itself is 6 rows — driver-sized by construction."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    m = li.agg(
        F.count("*").alias("n"),
        F.count("l_shipdate").alias("ship_nn"),
        F.sum(
            F.col("l_quantity").between(1, 50).cast("long")
        ).alias("qty_ok"),
        F.count_distinct(
            F.struct("l_orderkey", "l_linenumber")
        ).alias("pk_distinct"),
        F.sum(
            F.col("l_returnflag").isin("R", "A", "N").cast("long")
        ).alias("rf_ok"),
    )
    orph = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("orphans"))
    )
    combined = m.crossJoin(F.broadcast(orph))
    n = F.col("n").cast("double")
    report = F.array(
        F.struct(
            F.lit("row_count").alias("check_name"),
            n.alias("metric"),
            (F.col("n") >= 1).alias("ok"),
        ),
        F.struct(
            F.lit("completeness_l_shipdate").alias("check_name"),
            (F.col("ship_nn").cast("double") / n).alias("metric"),
            (F.col("ship_nn") == F.col("n")).alias("ok"),
        ),
        F.struct(
            F.lit("domain_l_quantity_1_50").alias("check_name"),
            (F.col("qty_ok").cast("double") / n).alias("metric"),
            (F.col("qty_ok") == F.col("n")).alias("ok"),
        ),
        F.struct(
            F.lit("accepted_values_l_returnflag").alias("check_name"),
            (F.col("rf_ok").cast("double") / n).alias("metric"),
            (F.col("rf_ok") == F.col("n")).alias("ok"),
        ),
        F.struct(
            F.lit("uniqueness_orderkey_linenumber").alias("check_name"),
            (F.col("pk_distinct").cast("double") / n).alias("metric"),
            (F.col("pk_distinct") == F.col("n")).alias("ok"),
        ),
        F.struct(
            F.lit("referential_lineitem_orders").alias("check_name"),
            F.col("orphans").cast("double").alias("metric"),
            (F.col("orphans") == 0).alias("ok"),
        ),
    )
    return combined.select(F.inline(report))


# --------------------------------------------------------------------------
# q115 — per-source relative quality gate (keep top 60% per source)
# --------------------------------------------------------------------------
_SQL_TOKCNT = f"CAST(len(string_split_regex(trim(text, ' '), '{WS_RE}')) AS BIGINT)"


@register(
    "q115_per_source_quality_gate",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, source, {_SQL_TOKCNT} AS token_cnt FROM documents
    ), r AS (
        SELECT doc_id, source, token_cnt,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY token_cnt DESC, doc_id
               ) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
        FROM s
    )
    SELECT doc_id, source, token_cnt, rn, n_src
    FROM r WHERE rn * 10 <= n_src * 6
    """,
    tags=("curation", "quality", "per-group"),
)
def q115_per_source_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source RELATIVE quality filtering: keep the top 60% of each
    source's documents by token count (rank under a total order; the
    keep test `rn·10 ≤ n·6` is pure integer arithmetic — no float
    percentile at the cut boundary).  Absolute thresholds (q53's keep/
    flag) mis-serve heterogeneous corpora — a cutoff tuned for web text
    deletes all of a transcript source or keeps all of a spam one;
    ranking WITHIN each source holds the mix steady while dropping each
    source's own worst tail, the Gopher/CCNet-style per-source gate.

    Scale: one shuffle on source; both window functions share the same
    partitioning pass.  Group count = source count (thousands at
    100 TB), each group's rank is computed in parallel — and a skewed
    mega-source splits cleanly under AQE because rank-then-filter
    never materializes the group in one task's memory (unlike
    collect_list-style gates)."""
    d = t(spark, sf_dir, "documents")
    from hadoop_sync_spark.functions.text import token_count

    s = d.select(
        "doc_id", "source", token_count(F.col("text")).alias("token_cnt")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("token_cnt").desc(), F.col("doc_id")
    )
    wc = Window.partitionBy("source")
    return (
        s.select(
            "doc_id",
            "source",
            "token_cnt",
            F.row_number().over(w).cast("long").alias("rn"),
            F.count("*").over(wc).alias("n_src"),
        )
        .filter(F.col("rn") * 10 <= F.col("n_src") * 6)
    )


def observed_write_metrics(
    df: DataFrame, name: str = "quality"
) -> tuple[DataFrame, "Observation"]:
    """Attach single-pass data-quality observability to any frame: row
    count, null l_shipdate count, and out-of-domain l_quantity count are
    computed BY THE SAME JOB that consumes the frame (`df.observe` rides
    the existing scan — zero extra passes, unlike running q112's report
    as a second query).  This is how a 100 TB pipeline gets its
    admission metrics for free on the write path; the q112 report stays
    the standalone auditor.

    Returns (observed_df, observation); read `observation.get` AFTER an
    action on observed_df.  Works identically under Structured Streaming
    via the query-progress listener (same API, per-micro-batch)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("l_shipdate").isNull().cast("long")).alias(
            "null_shipdate"
        ),
        # NULL counts as OUT of domain, matching q112: its qty_ok sum skips
        # the NULL `between`, so a NULL quantity already fails the q112
        # check (qty_ok < n) — without the coalesce this metric would
        # report 0 out-of-domain on the same corpus (round-3 advice)
        F.sum(
            F.coalesce(
                ~F.col("l_quantity").between(1, 50), F.lit(True)
            ).cast("long")
        ).alias("qty_out_of_domain"),
    )
    return observed, obs


# --------------------------------------------------------------------------
# q126 — snapshot change-data-capture (row + column-level diff)
# --------------------------------------------------------------------------
@register(
    "q126_snapshot_cdc",
    oracle="""
    WITH a AS (
        SELECT doc_id, text, lang FROM documents WHERE doc_id % 7 <> 0
    ), b AS (
        SELECT doc_id,
               CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END
                 AS text,
               lang
        FROM documents WHERE doc_id % 5 <> 0
    ), d AS (
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
               CASE WHEN a.doc_id IS NULL THEN 'added'
                    WHEN b.doc_id IS NULL THEN 'removed'
                    WHEN a.text IS DISTINCT FROM b.text
                         OR a.lang IS DISTINCT FROM b.lang THEN 'changed'
                    ELSE 'unchanged' END AS change_type,
               (a.doc_id IS NOT NULL AND b.doc_id IS NOT NULL
                AND a.text IS DISTINCT FROM b.text) AS text_changed,
               (a.doc_id IS NOT NULL AND b.doc_id IS NOT NULL
                AND a.lang IS DISTINCT FROM b.lang) AS lang_changed
        FROM a FULL JOIN b ON a.doc_id = b.doc_id
    )
    SELECT doc_id, change_type, text_changed, lang_changed
    FROM d WHERE change_type <> 'unchanged'
    """,
    tags=("curation", "cdc", "diff"),
)
def q126_snapshot_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two corpus snapshots: per-key
    added/removed/changed classification PLUS per-column change flags —
    the row-level diff feed (Delta CDF shape) that downstream consumers
    use to reprocess only what moved, where q97/q109's digests only
    LOCATE drift.  Snapshots are carved deterministically from the
    fixture (A drops doc_id%7==0, B drops doc_id%5==0 and rewrites
    doc_id%11==0), so adds, removes, and column-level changes are all
    genuinely exercised.

    Scale: ONE full-outer hash join co-partitioned on the key; column
    comparisons are null-safe expressions inside the join's projection
    (no second pass).  The unchanged majority is filtered before
    emission, so the output is delta-sized, not corpus-sized — at
    100 TB the join itself is the only corpus-scale cost and both
    sides shuffle once on doc_id."""
    d = t(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text", "lang")
    b = (
        d.filter(F.col("doc_id") % 5 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 11 == 0, F.upper("text")
            ).otherwise(F.col("text")).alias("text"),
            "lang",
        )
    )
    aa, bb = a.alias("a"), b.alias("b")
    both = F.col("a.doc_id").isNotNull() & F.col("b.doc_id").isNotNull()
    text_chg = both & ~F.col("a.text").eqNullSafe(F.col("b.text"))
    lang_chg = both & ~F.col("a.lang").eqNullSafe(F.col("b.lang"))
    change_type = (
        F.when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("b.doc_id").isNull(), "removed")
        .when(text_chg | lang_chg, "changed")
        .otherwise("unchanged")
    )
    return (
        aa.join(bb, F.col("a.doc_id") == F.col("b.doc_id"), "full")
        .select(
            F.coalesce(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_id"),
            change_type.alias("change_type"),
            text_chg.alias("text_changed"),
            lang_chg.alias("lang_changed"),
        )
        .filter(F.col("change_type") != "unchanged")
    )


# --------------------------------------------------------------------------
# q130 — robust per-source statistics (exact integer median / MAD / outliers)
# --------------------------------------------------------------------------
@register(
    "q130_robust_source_stats",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, source, {_SQL_TOKCNT} AS tc FROM documents
    ), r1 AS (
        SELECT doc_id, source, tc,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY tc, doc_id)
                 AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM s
    ), m AS (
        SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN rn = (n+1)//2 THEN tc ELSE 0 END
                      + CASE WHEN rn = (n+2)//2 THEN tc ELSE 0 END)
                    AS BIGINT) AS med2
        FROM r1 GROUP BY source
    ), d AS (
        SELECT s.doc_id, s.source, abs(2 * s.tc - m.med2) AS dv
        FROM s JOIN m USING (source)
    ), r2 AS (
        SELECT source, dv,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY dv, doc_id)
                 AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM d
    ), mm AS (
        SELECT source,
               CAST(SUM(CASE WHEN rn = (n+1)//2 THEN dv ELSE 0 END
                      + CASE WHEN rn = (n+2)//2 THEN dv ELSE 0 END)
                    AS BIGINT) AS mad2
        FROM r2 GROUP BY source
    ), o AS (
        SELECT d.source,
               CAST(SUM(CASE WHEN 2 * d.dv > 3 * mm.mad2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM d JOIN mm USING (source) GROUP BY d.source
    )
    SELECT m.source, m.n_docs, m.med2, mm.mad2, o.n_outliers
    FROM m JOIN mm USING (source) JOIN o USING (source)
    """,
    tags=("curation", "robust-stats", "quality"),
)
def q130_robust_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source token-count statistics: exact MEDIAN, exact MAD
    (median absolute deviation), and the count of 3-MAD outliers — the
    outlier detector quality pipelines prefer over mean/stddev because a
    source's own spam tail can't drag the threshold.  All arithmetic
    stays on DOUBLED integers (med2 = 2·median, mad2 = 4·MAD on the
    doubled-deviation scale; the outlier test 2·d > 3·mad2 is the
    integer form of |x−med| > 3·MAD), so both engines agree bit-for-bit
    — and the doubled-median sums its two middle ranks as separate
    terms, counting an odd group's middle row twice (the q24 lesson).

    Scale: the ENTIRE report is stacked window functions over ONE
    hash-partitioning on `source` — median via rank-pick-as-window-sum,
    deviations, MAD the same way, the outlier flag, then a final groupBy
    on the same key that rides the existing partitioning.  Plan-checked
    at exactly 1 exchange (test_plans): the earlier join-based form
    recomputed the corpus per report column (7 exchanges)."""
    d0 = t(spark, sf_dir, "documents")
    from hadoop_sync_spark.functions.text import token_count

    s = d0.select(
        "doc_id", "source", token_count(F.col("text")).alias("tc")
    )
    w1 = Window.partitionBy("source").orderBy("tc", "doc_id")
    wc = Window.partitionBy("source")
    zero = F.lit(0).cast("long")

    def pick(rank_col: str, val: str) -> F.Column:
        # two-term middle sum (q24 lesson: odd groups count the middle
        # row twice), evaluated per row then summed over the partition
        lo = F.floor((F.col("n") + 1) / 2)
        hi = F.floor((F.col("n") + 2) / 2)
        return F.when(F.col(rank_col) == lo, F.col(val)).otherwise(
            zero
        ) + F.when(F.col(rank_col) == hi, F.col(val)).otherwise(zero)

    r = (
        s.withColumn("n", F.count("*").over(wc))
        .withColumn("rn1", F.row_number().over(w1))
        .withColumn("med2", F.sum(pick("rn1", "tc")).over(wc))
        .withColumn("dv", F.abs(2 * F.col("tc") - F.col("med2")))
    )
    w2 = Window.partitionBy("source").orderBy("dv", "doc_id")
    r = (
        r.withColumn("rn2", F.row_number().over(w2))
        .withColumn("mad2", F.sum(pick("rn2", "dv")).over(wc))
        .withColumn(
            "is_outlier",
            (2 * F.col("dv") > 3 * F.col("mad2")).cast("long"),
        )
    )
    return r.groupBy("source").agg(
        F.max("n").alias("n_docs"),
        F.max("med2").alias("med2"),
        F.max("mad2").alias("mad2"),
        F.sum("is_outlier").alias("n_outliers"),
    )


# --------------------------------------------------------------------------
# q135 — k-anonymity small-group suppression audit
# --------------------------------------------------------------------------
_K_ANON = 5


@register(
    "q135_k_anonymity",
    oracle=f"""
    WITH qi AS (
        SELECT c_nationkey,
               c_mktsegment,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) // 100000 AS bal_band,
               CAST(COUNT(*) AS BIGINT) AS grp_n
        FROM customer
        GROUP BY 1, 2, 3
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN grp_n >= {_K_ANON} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_groups_kept,
           CAST(SUM(CASE WHEN grp_n >= {_K_ANON} THEN grp_n ELSE 0 END)
                AS BIGINT) AS n_rows_kept,
           CAST(SUM(CASE WHEN grp_n < {_K_ANON} THEN grp_n ELSE 0 END)
                AS BIGINT) AS n_rows_suppressed
    FROM qi
    GROUP BY c_nationkey
    """,
    tags=("curation", "privacy", "k-anonymity"),
)
def q135_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity enforcement audit (k=5) over the customer table: rows
    are generalized to quasi-identifier groups — (nation, market segment,
    $1000 account-balance band) — and any group smaller than k is
    suppressed before the data may ship in a training corpus.  The audit
    reports, per nation, how many QI groups exist, how many survive, and
    the kept/suppressed row counts — the release-gate report a privacy
    review signs off on (Sweeney's k-anonymity, the standard tabular
    pre-release check).

    Exactness: the balance band is the scaled-cents integer divided by
    100000 — both engines truncate integer division toward zero
    (measured, commit 76bc554), so negative balances band identically.

    Scale: two chained aggregations; the first shuffles on the QI key
    (partial aggregation bounds shuffle rows by distinct QI groups per
    task), the second reduces group rows — already tiny — onto nations.
    No row-level data survives the first exchange, so the plan's width is
    the number of QI groups, not customers."""
    qi = (
        t(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.expr(
                "CAST(ROUND(c_acctbal * 100) AS BIGINT) div 100000"
            ).alias("bal_band"),
        )
        .agg(F.count("*").alias("grp_n"))
    )
    k = F.lit(_K_ANON)
    return qi.groupBy("c_nationkey").agg(
        F.count("*").alias("n_groups"),
        F.sum(F.when(F.col("grp_n") >= k, 1).otherwise(0))
        .cast("long")
        .alias("n_groups_kept"),
        F.sum(F.when(F.col("grp_n") >= k, F.col("grp_n")).otherwise(0))
        .cast("long")
        .alias("n_rows_kept"),
        F.sum(F.when(F.col("grp_n") < k, F.col("grp_n")).otherwise(0))
        .cast("long")
        .alias("n_rows_suppressed"),
    )


# --------------------------------------------------------------------------
# q141 — n-gram novelty vs a reference split (memorization-risk profile)
# --------------------------------------------------------------------------
@register(
    "q141_ngram_novelty",
    oracle=f"""
    WITH tokd AS (
        SELECT doc_id, source, {_SQL_NORM_TOKENS} AS tok FROM documents
    ), sh AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   generate_series(0, greatest(len(tok) - 3, 0)),
                   i -> array_to_string(tok[i+1 : i+3], ' '))) AS sh
        FROM tokd
    ), ref AS (
        SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 10 < 3
    ), probe AS (
        SELECT doc_id, source, unnest(sh) AS s FROM sh
        WHERE doc_id % 10 >= 3
    ), per_doc AS (
        SELECT p.doc_id, p.source,
               COUNT(*) AS n_sh,
               SUM(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END) AS matched
        FROM probe p LEFT JOIN ref r ON p.s = r.s
        GROUP BY p.doc_id, p.source
    ), cov AS (
        SELECT source, (1000000 * matched) // n_sh AS cov_ppm FROM per_doc
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(cov_ppm) AS BIGINT) AS sum_cov_ppm,
           CAST(MAX(cov_ppm) AS BIGINT) AS max_cov_ppm,
           CAST(MIN(cov_ppm) AS BIGINT) AS min_cov_ppm
    FROM cov GROUP BY source
    """,
    tags=("curation", "ngram", "novelty", "contamination"),
)
def q141_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram coverage of every probe document against the reference
    split's shingle inventory (doc_id % 10 < 3 = reference, the rest
    probe) — the memorization/novelty profile a training-data pipeline
    runs before mixing a new source into a corpus that already contains
    its possible ancestors.  Complements q87 (exact substring
    contamination screen): q87 answers "does an eval string appear
    verbatim"; this scores HOW MUCH of each document is recombined
    reference material, per source, in exact integer ppm
    (``cov_ppm = 1e6·matched div n_shingles``, truncating — the
    engine's quantized-ratio idiom).

    Scale: the probe→ref membership check joins on the shingle string
    with NO forced broadcast hint — at fixture scale AQE broadcasts the
    small reference inventory, while at 100 TB (reference = hundreds of
    GB of distinct shingles) the planner keeps the hash-shuffle join;
    both are correct and the choice stays size-adaptive.  Everything
    else is two explode+aggregate passes; per-doc then per-source
    rollups are map-side-combined.  No driver-side state at all."""
    from hadoop_sync_spark.functions.text import shingles_of_tokens

    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", tokens(normalize(F.col("text"))).alias("tok")
    )
    sh = d.select(
        "doc_id",
        "source",
        F.array_distinct(shingles_of_tokens(F.col("tok"), n=3)).alias("sh"),
    )
    ref = (
        sh.filter(F.col("doc_id") % 10 < 3)
        .select(F.explode("sh").alias("s"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    probe = sh.filter(F.col("doc_id") % 10 >= 3).select(
        "doc_id", "source", F.explode("sh").alias("s")
    )
    per_doc = (
        probe.join(ref, "s", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_sh"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("matched"),
        )
    )
    cov = per_doc.select(
        "source", F.expr("(1000000 * matched) div n_sh").alias("cov_ppm")
    )
    return cov.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("cov_ppm").cast("long").alias("sum_cov_ppm"),
        F.max("cov_ppm").cast("long").alias("max_cov_ppm"),
        F.min("cov_ppm").cast("long").alias("min_cov_ppm"),
    )
