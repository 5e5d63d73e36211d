"""Behavioral tests for the round-7 operators: q139 BM25 (integer
scoring vs a pure-Python mirror), q140 cogrouped as-of alignment
(tie/NULL semantics on crafted frames), q141 n-gram novelty (hand-
computable coverage).  q138's Delta reader has its own file
(test_delta_log.py)."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# q139 — BM25: python mirror of the integer formula on a crafted corpus
# --------------------------------------------------------------------------
def _bm25_mirror(docs: dict[int, list[str]], queries: dict[str, list[str]],
                 k: int):
    """Pure-Python mirror of retrieval_q's integer BM25 (rational IDF,
    al_q-quantized length norm, per-term truncation then sum)."""
    n = len(docs)
    tl = sum(len(toks) for toks in docs.values())
    al_q = tl // n
    df: dict[str, int] = {}
    for toks in docs.values():
        for term in set(toks):
            df[term] = df.get(term, 0) + 1
    out = {}
    for qid, terms in queries.items():
        scores: dict[int, int] = {}
        for doc_id, toks in docs.items():
            s = 0
            for term in terms:
                tf = toks.count(term)
                if tf == 0 or term not in df:
                    continue
                num = 1_000_000 * (2 * n - 2 * df[term] + 1) * 44 * al_q * tf
                den = (2 * df[term] + 1) * (
                    20 * al_q * tf + 6 * al_q + 18 * len(toks)
                )
                s += num // den
            if s > 0:
                scores[doc_id] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(r + 1, doc_id, s) for r, (doc_id, s) in
                    enumerate(ranked)]
    return out


def test_bm25_matches_python_mirror(spark, tmp_path):
    import pandas as pd

    docs = {
        0: "spark join spark table".split(),
        1: "join join join scan".split(),
        2: "table scan merge merge".split(),
        3: "vector stream spark".split(),
        4: "the the the the the the".split(),
    }
    pdf = pd.DataFrame(
        {"doc_id": list(docs), "text": [" ".join(t) for t in docs.values()],
         "lang": "en", "source": "s", "n_chars": 1}
    )
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf)
    pdf.to_parquet(os.path.join(sf, "documents.parquet"))

    from hadoop_sync_spark.queries import load_all
    from hadoop_sync_spark.queries.retrieval_q import (
        _BM25_K,
        _BM25_QUERIES,
    )

    got = load_all()["q139_bm25_topk"].fn(spark, sf).collect()
    want = _bm25_mirror(
        docs, {qid: list(t) for qid, t in _BM25_QUERIES}, _BM25_K
    )
    got_by_q: dict[str, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rnk)):
        got_by_q.setdefault(r.query_id, []).append(
            (r.rnk, r.doc_id, r.bm25_q6)
        )
    assert got_by_q == {q: rows for q, rows in want.items() if rows}


def test_bm25_higher_tf_and_rarity_rank_higher(spark, tmp_path):
    """Structural sanity on the crafted corpus: for 'spark join', doc 1
    (3× join, common) must not outrank doc 0 (spark AND join; spark is
    rarer) — rarity plus coverage beats raw tf of a commoner term."""
    import os

    import pandas as pd

    docs = {
        0: "spark join spark table".split(),
        1: "join join join scan".split(),
        2: "table scan merge merge".split(),
        3: "vector stream spark".split(),
        4: "the the the the the the".split(),
    }
    pdf = pd.DataFrame(
        {"doc_id": list(docs), "text": [" ".join(t) for t in docs.values()],
         "lang": "en", "source": "s", "n_chars": 1}
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pdf.to_parquet(os.path.join(sf, "documents.parquet"))
    from hadoop_sync_spark.queries import load_all

    rows = load_all()["q139_bm25_topk"].fn(spark, sf).collect()
    sj = {r.doc_id: r.rnk for r in rows if r.query_id == "spark-join"}
    assert sj[0] < sj[1]


def test_bm25_plan_broadcasts_query_terms(spark):
    from hadoop_sync_spark.queries.retrieval_q import _bm25_pipeline

    out, tf = _bm25_pipeline(spark, "/root/testdata/sf0.001")
    try:
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
    finally:
        tf.unpersist()


# --------------------------------------------------------------------------
# q140 — cogrouped as-of: tie + NULL semantics on crafted frames
# --------------------------------------------------------------------------
def _ts(s: str):
    return datetime.datetime.fromisoformat(s)


def test_cogroup_asof_ties_and_nulls(spark):
    from hadoop_sync_spark.queries.events import cogroup_asof_align

    purchases = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 10:00:00")),  # two clicks tie at 10:00
            (1, 101, _ts("2024-01-01 09:00:00")),  # click strictly before
            (2, 200, _ts("2024-01-01 08:00:00")),  # user has later click only
            (3, 300, _ts("2024-01-01 12:00:00")),  # user has no clicks
        ],
        "user_id long, event_id long, ts timestamp",
    )
    clicks = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),
            (1, 11, _ts("2024-01-01 10:00:00")),  # tie → larger click_id
            (1, 12, _ts("2024-01-01 08:30:00")),
            (2, 20, _ts("2024-01-01 09:00:00")),  # after the purchase
        ],
        "user_id long, click_id long, click_ts timestamp",
    )
    got = {
        r.event_id: (r.click_id, r.gap_us)
        for r in cogroup_asof_align(purchases, clicks).collect()
    }
    assert got == {
        100: (11, 0),                       # tie broken to click_id 11
        101: (12, 30 * 60 * 1_000_000),     # 09:00 - 08:30, exact µs
        200: (None, None),                  # only a LATER click exists
        300: (None, None),                  # no clicks at all
    }


def test_cogroup_asof_registered_query_matches_builtin_asof(spark):
    """Cross-implementation check on the real fixture: the pandas
    cogroup path must agree row-for-row with a pure-builtin
    window-ranked formulation (the q31 idiom) over the same events."""
    from hadoop_sync_spark.queries import load_all
    from hadoop_sync_spark.queries._util import t as load_t
    from pyspark.sql.window import Window

    sf = "/root/testdata/sf0.001"
    def _key(row):
        return tuple((v is None, v) for v in row)

    got = sorted(
        (
            (r.user_id, r.event_id, r.click_id, r.gap_us)
            for r in load_all()["q140_cogroup_asof_align"]
            .fn(spark, sf)
            .collect()
        ),
        key=_key,
    )
    ev = load_t(spark, sf, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    # rename the click-side key BEFORE joining: p and c share lineage
    # (both derive from ev), so `p.user_id == c.user_id` resolves to the
    # same attribute — a trivially-true predicate that joins clicks
    # across ALL users
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    w = Window.partitionBy("user_id", "event_id").orderBy(
        F.col("click_ts").desc(), F.col("click_id").desc()
    )
    ref = (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("click_ts") <= F.col("ts")),
            "left",
        )
        .drop("c_user_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            "click_id",
            (
                F.unix_micros("ts") - F.unix_micros("click_ts")
            ).alias("gap_us"),
        )
    )
    want = sorted(
        (
            (r.user_id, r.event_id, r.click_id, r.gap_us)
            for r in ref.collect()
        ),
        key=_key,
    )
    assert got == want


# --------------------------------------------------------------------------
# q141 — n-gram novelty: hand-computable coverage
# --------------------------------------------------------------------------
def test_ngram_novelty_hand_computed(spark, tmp_path):
    import os

    import pandas as pd

    # doc_id 0-2 are the reference split (doc_id % 10 < 3)
    rows = [
        (0, "a b c d e", "ref"),        # ref shingles: abc bcd cde
        (1, "x y z", "ref"),            # ref shingle: xyz
        (2, "a b c", "ref"),            # abc (dup with 0)
        # probe docs:
        (13, "a b c d e", "s1"),        # 3 shingles, all matched → 1e6
        (14, "a b c q r", "s1"),        # abc, bcq, cqr → 1 of 3 → 333333
        (15, "p q r s", "s2"),          # pqr, qrs → 0 of 2 → 0
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": "en",
            "source": [r[2] for r in rows],
            "n_chars": 1,
        }
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pdf.to_parquet(os.path.join(sf, "documents.parquet"))
    from hadoop_sync_spark.queries import load_all

    got = {
        r.source: (r.n_docs, r.sum_cov_ppm, r.max_cov_ppm, r.min_cov_ppm)
        for r in load_all()["q141_ngram_novelty"].fn(spark, sf).collect()
    }
    assert got == {
        "s1": (2, 1_000_000 + 333_333, 1_000_000, 333_333),
        "s2": (1, 0, 0, 0),
    }


# --------------------------------------------------------------------------
# q142 — nearest-length matching: crafted tie + cross-band cases
# --------------------------------------------------------------------------
def test_length_match_ties_and_cross_band(spark, tmp_path):
    import os

    import pandas as pd

    # even doc_id = control pool, odd = treatment; bands are len div 64
    rows = [
        (2, 90), (4, 110), (6, 50), (8, 50), (10, 500),   # controls
        (13, 100),  # equidistant 90/110 -> prefer shorter (id 2)
        (15, 50),   # exact match -> rep is min control id (6, not 8)
        (17, 1000), # empty band, nearest is bands away (id 10, len 500)
        (19, 10),   # nothing at-or-under -> above-only (id 6, len 50)
        (21, 120),  # below 110 beats above 500
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": "x",
            "lang": "en",
            "source": "s",
            "n_chars": [r[1] for r in rows],
        }
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    pdf.to_parquet(os.path.join(sf, "documents.parquet"))
    from hadoop_sync_spark.queries import load_all

    got = {
        r.a_id: (r.b_id, r.b_len, r.diff)
        for r in load_all()["q142_length_matched_controls"]
        .fn(spark, sf)
        .collect()
    }
    assert got == {
        13: (2, 90, 10),
        15: (6, 50, 0),
        17: (10, 500, 500),
        19: (6, 50, 40),
        21: (4, 110, 10),
    }


# --------------------------------------------------------------------------
# q143 — content-defined chunking: python mirror + insertion robustness
# --------------------------------------------------------------------------
def _mirror_cdc(tokens_):
    """Pure-Python mirror of cdc_chunks_frame's per-doc chunking."""
    import hashlib

    chunks, cur = [], []
    for t_ in tokens_:
        cur.append(t_)
        if hashlib.md5(t_.encode()).hexdigest()[-1] in ("0", "1"):
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return [
        (i, len(c), hashlib.md5(" ".join(c).encode()).hexdigest())
        for i, c in enumerate(c2 for c2 in chunks)
    ]


def _cdc_tokens(n=120):
    # deterministic pseudo-corpus with enough variety to hit boundaries
    return [f"tok{(i * 7 + 3) % 41}" for i in range(n)]


def test_cdc_chunks_match_python_mirror(spark):
    import pandas as pd

    from hadoop_sync_spark.queries.pipeline_q import cdc_chunks_frame

    toks = _cdc_tokens()
    d = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": [" ".join(toks)]})
    )
    got = sorted(
        (r.chunk_id, r.n_tokens, r.chunk_sig)
        for r in cdc_chunks_frame(d).collect()
    )
    assert got == sorted(_mirror_cdc(toks))


def test_cdc_insertion_shifts_only_local_chunks(spark):
    """The content-defined property: inserting one token reshapes chunks
    only up to the next boundary — every later chunk signature survives
    identically (where a fixed-stride chunker would shift them ALL)."""
    toks = _cdc_tokens()
    ins_at = 25
    toks2 = toks[:ins_at] + ["inserted"] + toks[ins_at:]
    sigs1 = [s for _, _, s in _mirror_cdc(toks)]
    sigs2 = [s for _, _, s in _mirror_cdc(toks2)]
    # chunks strictly before the insertion's chunk are untouched, and the
    # tail after the insertion's boundary re-synchronizes exactly
    import hashlib

    n_bound_before = sum(
        1 for t_ in toks[:ins_at]
        if hashlib.md5(t_.encode()).hexdigest()[-1] in ("0", "1")
    )
    assert sigs1[:n_bound_before] == sigs2[:n_bound_before]
    assert sigs1[n_bound_before + 1:] == sigs2[n_bound_before + 1:]
    assert sigs1[n_bound_before] != sigs2[n_bound_before]
    # sanity: the corpus actually has chunks on both sides of the edit
    assert n_bound_before >= 2 and len(sigs1) - n_bound_before >= 3
