"""Training-data pipeline operators beyond per-doc analysis (driver L3):
corpus n-gram statistics, deterministic weighted mix resampling, and
context-window sequence packing — the steps between "scored documents" and
"batches a trainer consumes".

Built-in-function-only like queries/text.py (split/transform/window —
JVM-side, codegen'd); the only shuffles are the declared aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from hadoop_sync_spark.queries import register
from hadoop_sync_spark.queries._util import (
    md5_prefix_long,
    t,
    sql_md5_prefix_long,
)
from hadoop_sync_spark.functions.text import WS_RE, normalize, tokens
from hadoop_sync_spark.queries.sampling import hash_bucket, _SQL_BUCKET

_SQL_NORM_TOKENS = (
    f"string_split_regex(trim(lower(trim(text, ' ')), ' '), '{WS_RE}')"
)


# --------------------------------------------------------------------------
# q77 — corpus n-gram statistics: top bigrams per language
# --------------------------------------------------------------------------
@register(
    "q77_ngram_stats",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, {_SQL_NORM_TOKENS} AS tok FROM documents
    ),
    bg AS (
        SELECT doc_id, lang,
               unnest(list_transform(
                   range(1, greatest(len(tok) - 1, 0) + 1),
                   i -> tok[CAST(i AS INT)] || ' ' || tok[CAST(i AS INT) + 1]
               )) AS bigram
        FROM toks
    ),
    agg AS (
        SELECT lang, bigram,
               COUNT(*) AS cnt,
               COUNT(DISTINCT doc_id) AS doc_freq
        FROM bg GROUP BY lang, bigram
    )
    SELECT lang, bigram, cnt, doc_freq, rank FROM (
        SELECT lang, bigram, cnt, doc_freq,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY cnt DESC, bigram
               ) AS BIGINT) AS rank
        FROM agg
    ) WHERE rank <= 10
    """,
    tags=("text", "ngram", "corpus", "l3"),
)
def q77_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram frequency: total occurrences and document
    frequency per (lang, bigram), top-10 per language — the vocabulary /
    contamination / boilerplate report a corpus curator reads before
    training, and the count layer a BPE trainer's pair statistics start
    from.

    Scale: bigram explode is narrow; the (lang, bigram) aggregation is ONE
    wide shuffle with map-side partial counts (the key space is vocab²
    but heavy hitters dominate partial aggregation); the per-lang top-k
    window shuffles only the aggregated counts, and languages are few —
    if one language's distinct-bigram set were itself huge, the rank
    filter composes with a pre-window `cnt > threshold` guard."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", tokens(normalize(F.col("text"))).alias("tok")
    )
    # sequence(1, size-1) would run DESCENDING for 1-token docs (Spark
    # sequences auto-step -1), fabricating a bogus index — gate it
    idx = F.when(
        F.size("tok") >= 2, F.sequence(F.lit(1), F.size("tok") - 1)
    ).otherwise(F.array().cast("array<int>"))
    bigram = F.explode(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", F.element_at(F.col("tok"), i), F.element_at(F.col("tok"), i + 1)
            ),
        )
    )
    bg = toks.select("doc_id", "lang", bigram.alias("bigram"))
    agg = bg.groupBy("lang", "bigram").agg(
        F.count("*").alias("cnt"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "bigram")
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
    )


# --------------------------------------------------------------------------
# q78 — deterministic weighted corpus mix (per-source resampling)
# --------------------------------------------------------------------------
@register(
    "q78_corpus_mix",
    oracle=f"""
    WITH weighted AS (
        SELECT source, lang, n_chars,
               20 + {sql_md5_prefix_long("source")} % 60 AS weight,
               {_SQL_BUCKET} AS bucket
        FROM documents
    )
    SELECT source,
           CAST(MIN(weight) AS BIGINT) AS weight,
           COUNT(*) AS total_cnt,
           CAST(SUM(CASE WHEN bucket < weight THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_cnt,
           CAST(SUM(CASE WHEN bucket < weight THEN n_chars ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM weighted
    GROUP BY source
    """,
    tags=("sampling", "mix", "corpus", "l3"),
)
def q78_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing (Gopher/The-Pile-style source weighting):
    each source gets a sampling weight (here derived from the source name
    hash, 20-79%; production passes a curated weight table) and documents
    are kept by content-hash bucket < weight — deterministic, append-safe
    (a doc's fate never changes when other docs arrive), and exactly
    reproducible across engines.  Output is the per-source audit: weight,
    totals, kept counts/chars.

    Scale: the keep decision is a narrow expression (no shuffle, no RNG
    state); the audit is one partial+final aggregation on source."""
    d = t(spark, sf_dir, "documents")
    weight = (F.lit(20) + md5_prefix_long(F.col("source")) % 60).alias("weight")
    bucket = hash_bucket(F.col("doc_id"))
    keep = (bucket < F.col("weight")).cast("long")
    return (
        d.select("source", "n_chars", weight, keep.alias("keep"))
        .groupBy("source")
        .agg(
            F.min("weight").cast("long").alias("weight"),
            F.count("*").alias("total_cnt"),
            F.sum("keep").cast("long").alias("kept_cnt"),
            F.sum(F.when(F.col("keep") == 1, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("kept_chars"),
        )
    )


# --------------------------------------------------------------------------
# q79 — context-window sequence packing (concat-and-chunk budgeting)
# --------------------------------------------------------------------------
@register(
    "q79_sequence_packing",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST(len({_SQL_NORM_TOKENS}) AS BIGINT) AS n_tok
        FROM documents
    ),
    packed AS (
        SELECT lang, doc_id, n_tok,
               CAST(FLOOR(CAST(SUM(n_tok) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tok AS DOUBLE) / 512) AS BIGINT) AS bin_id
        FROM toks
    )
    SELECT lang, bin_id,
           COUNT(*) AS doc_cnt,
           CAST(SUM(n_tok) AS BIGINT) AS tok_cnt,
           MIN(doc_id) AS first_doc_id,
           MAX(doc_id) AS last_doc_id
    FROM packed
    GROUP BY lang, bin_id
    """,
    tags=("packing", "tokens", "corpus", "l3"),
)
def q79_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining batches: concatenate documents in
    deterministic (lang, doc_id) order and chunk the token stream into
    512-token context windows — each document's bin is the window its
    FIRST token lands in (floor(preceding-token-count / 512)), the
    concat-and-chunk packing GPT-style pipelines use.  Output is the
    per-bin manifest (doc span, token count) a loader shards by.

    Scale: one window cumsum per language partition (a single shuffle on
    lang — at real scale the partition key would be (lang, shard) so no
    one language serializes into one task), then one aggregation reusing
    the same partitioning."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(tokens(normalize(F.col("text")))).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_tok").over(w) - F.col("n_tok")).cast("double") / 512
        ).cast("long"),
    )
    return packed.groupBy("lang", "bin_id").agg(
        F.count("*").alias("doc_cnt"),
        F.sum("n_tok").cast("long").alias("tok_cnt"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )


# --------------------------------------------------------------------------
# q131 — temperature-scaled mixture reweighting (α = 0.5)
# --------------------------------------------------------------------------
@register(
    "q131_temperature_mix",
    oracle=f"""
    WITH s AS (
        SELECT source, CAST(SUM(len({_SQL_NORM_TOKENS})) AS BIGINT) AS n_tok
        FROM documents GROUP BY source
    ), tot AS (
        SELECT CAST(SUM(n_tok) AS BIGINT) AS total FROM s
    ), w AS (
        SELECT source, n_tok,
               n_tok * 1000000 // tot.total AS share_ppm,
               CAST(ROUND(sqrt(CAST(n_tok AS DOUBLE) / tot.total) * 1000000)
                    AS BIGINT) AS sqrt_w_q6
        FROM s, tot
    ), sw AS (
        SELECT CAST(SUM(sqrt_w_q6) AS BIGINT) AS sum_w FROM w
    )
    SELECT w.source, w.n_tok, w.share_ppm,
           CAST(ROUND(CAST(w.sqrt_w_q6 AS DOUBLE) * 1000000 / sw.sum_w)
                AS BIGINT) AS mix_ppm
    FROM w, sw
    """,
    tags=("sampling", "mix", "temperature", "l3"),
)
def q131_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing: sampling weights ∝ (token
    share)^α with α = 0.5 — the standard flattening knob (multilingual
    LM sampling, XLM-style) that up-weights small sources relative to
    their raw share where q78's fixed weight table cannot adapt.
    α = 0.5 is computed as sqrt, which IEEE-754 requires to be
    CORRECTLY ROUNDED — so both engines produce the identical double and
    the quantized weights (·1e6, ROUND) match bit-for-bit; the raw share
    is exact integer ppm (n·1e6 // total).

    Scale: one corpus-scale aggregation to per-source token counts; the
    total and the weight normalizer are one-row aggregates of the
    source-scale table, broadcast back.  Emits the audit (raw share vs
    temperature share) a mixing run logs before sampling."""
    d = t(spark, sf_dir, "documents")
    from hadoop_sync_spark.functions.text import token_count

    s = (
        d.select("source", token_count(F.col("text")).alias("tc"))
        .groupBy("source")
        .agg(F.sum("tc").alias("n_tok"))
    )
    tot = s.agg(F.sum("n_tok").alias("total"))
    w = s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tok",
        F.expr("n_tok * 1000000 div total").alias("share_ppm"),
        F.round(
            F.sqrt(F.col("n_tok").cast("double") / F.col("total")) * 1_000_000
        )
        .cast("long")
        .alias("sqrt_w_q6"),
    )
    sw = w.agg(F.sum("sqrt_w_q6").alias("sum_w"))
    return w.crossJoin(F.broadcast(sw)).select(
        "source",
        "n_tok",
        "share_ppm",
        F.round(F.col("sqrt_w_q6").cast("double") * 1_000_000 / F.col("sum_w"))
        .cast("long")
        .alias("mix_ppm"),
    )


# --------------------------------------------------------------------------
# q133 — overlapping token-window chunking (RAG / context-window prep)
# --------------------------------------------------------------------------
_CHUNK_W = 40  # tokens per chunk
_CHUNK_S = 30  # stride (10-token overlap between consecutive chunks)


@register(
    "q133_doc_chunks",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, {_SQL_NORM_TOKENS} AS tok FROM documents
    ), starts AS (
        SELECT doc_id, tok,
               unnest(generate_series(0, len(tok) - 1, {_CHUNK_S})) AS s
        FROM tok
    )
    SELECT doc_id,
           CAST(s // {_CHUNK_S} AS BIGINT) AS chunk_no,
           CAST(s AS BIGINT) AS start_tok,
           CAST(len(tok[s + 1 : s + {_CHUNK_W}]) AS BIGINT) AS chunk_len,
           md5(array_to_string(tok[s + 1 : s + {_CHUNK_W}], ' ')) AS chunk_sig
    FROM starts
    """,
    tags=("pipeline", "chunking", "rag"),
)
def q133_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking: split every document into
    40-token chunks on a 30-token stride (10-token overlap
    so no answer span is ever cut without a copy that contains it) — the
    passage-extraction step every RAG indexing and long-context training
    pipeline runs between raw documents and an embedding/packing stage.
    Each chunk carries a stable (doc_id, chunk_no) identity, its token
    offset and length, and a content signature (md5 of the joined window)
    for chunk-level dedup downstream.

    Scale: pure narrow transforms — tokenize, per-row integer sequence of
    chunk starts, explode, slice — zero shuffle, zero UDFs, whole-stage
    codegen end to end.  Output rows ≈ tokens/stride ≈ 1.3 rows per 40
    input tokens; the explode never materializes a per-doc collection
    larger than the document itself, so mega-documents stream through
    partition-locally.  (The trailing chunk is the natural short tail,
    kept: packing (q79) pads or merges tails downstream.)"""
    d = t(spark, sf_dir, "documents")
    chunks = d.select(
        "doc_id",
        tokens(normalize(F.col("text"))).alias("tok"),
    ).select(
        "doc_id",
        "tok",
        F.explode(
            F.sequence(F.lit(0), F.size("tok") - 1, F.lit(_CHUNK_S))
        ).alias("s"),
    )
    win = F.slice("tok", F.col("s") + 1, _CHUNK_W)
    return chunks.select(
        "doc_id",
        F.expr(f"s div {_CHUNK_S}").cast("long").alias("chunk_no"),
        F.col("s").cast("long").alias("start_tok"),
        F.size(win).cast("long").alias("chunk_len"),
        F.md5(F.array_join(win, " ")).alias("chunk_sig"),
    )


# --------------------------------------------------------------------------
# q143 — content-defined chunking + chunk-level dup profile
# --------------------------------------------------------------------------
#: a token ENDS a chunk when its md5's last hex digit is in this set —
#: 2/16 boundary probability, expected chunk ≈ 8 tokens.  Content-defined
#: (rsync/LBFS-style): boundaries depend only on local content, so an
#: insertion reshapes chunks only up to the next boundary, where q133's
#: fixed-stride windows shift EVERY downstream chunk (the property that
#: makes chunk-level dedup robust to edits).
_CDC_BOUNDARY = ("0", "1")


def cdc_chunks_frame(d: DataFrame) -> DataFrame:
    """(doc_id, chunk_id, n_tokens, chunk_sig) content-defined chunks of
    a (doc_id, text) frame — the kernel behind q143, factored for the
    insertion-robustness property test.

    Plan: posexplode → one boundary flag per token (md5, codegen) → a
    running pre-boundary count per doc assigns chunk ids → one groupBy
    rebuilds each chunk (sorted struct collect, the q27 ordered-agg
    idiom) and signs it.  Two exchanges total (window on doc_id, agg on
    (doc_id, chunk_id)); per-group state is one chunk, never a corpus."""
    tok = d.select(
        "doc_id",
        F.posexplode(tokens(normalize(F.col("text")))).alias("pos", "term"),
    )
    flag = (
        F.substring(F.md5(F.col("term")), 32, 1)
        .isin(*_CDC_BOUNDARY)
        .cast("long")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = tok.select(
        "doc_id",
        "pos",
        "term",
        F.coalesce(F.sum(flag).over(w), F.lit(0)).alias("chunk_id"),
    )
    return (
        chunked.groupBy("doc_id", "chunk_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "term"))
                        ),
                        lambda x: x["term"],
                    ),
                    " ",
                )
            ).alias("chunk_sig"),
        )
    )


@register(
    "q143_cdc_chunk_dups",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_NORM_TOKENS} AS tok FROM documents
    ), tokpos AS (
        SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos, tok[i + 1] AS term
        FROM toks, unnest(range(len(tok))) AS u(i)
    ), flagged AS (
        SELECT doc_id, pos, term,
               CASE WHEN substr(md5(term), 32, 1) IN ('0', '1')
                    THEN 1 ELSE 0 END AS flag
        FROM tokpos
    ), chunked AS (
        SELECT doc_id, pos, term,
               COALESCE(SUM(flag) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS chunk_id
        FROM flagged
    ), chunks AS (
        SELECT doc_id, chunk_id,
               md5(string_agg(term, ' ' ORDER BY pos)) AS chunk_sig
        FROM chunked GROUP BY doc_id, chunk_id
    )
    SELECT chunk_sig,
           CAST(COUNT(*) AS BIGINT) AS n_occ,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM chunks
    GROUP BY chunk_sig
    HAVING COUNT(*) >= 2
    ORDER BY n_occ DESC, chunk_sig
    LIMIT 20
    """,
    tags=("pipeline", "chunking", "cdc", "dedup"),
)
def q143_cdc_chunk_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (module note above) + the top-20 most
    duplicated chunk signatures across the corpus — sub-document dedup
    where q110's fixed-stride spans miss edit-shifted duplicates: a
    one-token insertion shifts every downstream fixed-stride span but
    only the local content-defined chunk (property-tested in
    tests/test_round7_ops.py).

    Scale: boundary flags are pure codegen (md5 + substring per token);
    the dup profile is one map-side-combined aggregation on chunk_sig;
    top-20 under a total order is TakeOrdered, no global sort."""
    chunks = cdc_chunks_frame(t(spark, sf_dir, "documents"))
    return (
        chunks.groupBy("chunk_sig")
        .agg(
            F.count("*").cast("long").alias("n_occ"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .filter(F.col("n_occ") >= 2)
        .orderBy(F.col("n_occ").desc(), "chunk_sig")
        .limit(20)
    )
