"""Behavioral tests for the curation operators (q86-q89, q93, q94) beyond
the differential oracle checks: regex detection on real-shaped PII,
planted contamination, budget-selection invariants, merge audit math, and
agreement of the exact regression stats with Spark's native estimators."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_sync_spark.queries import load_all
from hadoop_sync_spark.queries.curation import (
    _TOKEN_BUDGET,
    redact_pii,
)

QUERIES = load_all()


def test_redact_pii_on_real_shapes(spark):
    rows = [
        ("reach me at jane.doe+spam@mail.example.org today",),
        ("server 203.0.113.42 and 10.0.0.1 are down",),
        ("no pii here at all",),
        ("mixed: bob@x.io from 192.168.1.254 said hi",),
    ]
    df = spark.createDataFrame(rows, ["text"]).select(
        redact_pii(F.col("text")).alias("red")
    )
    got = [r["red"] for r in df.collect()]
    assert got == [
        "reach me at <EMAIL> today",
        "server <IP> and <IP> are down",
        "no pii here at all",
        "mixed: <EMAIL> from <IP> said hi",
    ]


def test_pii_query_accounts_every_injection(spark, sf_dir):
    out = QUERIES["q86_pii_redaction"].fn(spark, sf_dir).collect()
    total_docs = sum(r["n_docs"] for r in out)
    with_pii = sum(r["docs_with_pii"] for r in out)
    emails = sum(r["emails_found"] for r in out)
    ips = sum(r["ips_found"] for r in out)
    # every 7th doc gets exactly one email and one IP planted
    expected = (
        QUERIES["q86_pii_redaction"]
        .fn(spark, sf_dir)
        .sparkSession.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") % 7 == 0)
        .count()
    )
    assert with_pii == emails == ips == expected
    assert 0 < with_pii < total_docs
    # redaction shrank exactly the injected docs
    assert all(
        (r["char_delta"] > 0) == (r["docs_with_pii"] > 0) for r in out
    )


def test_contamination_flags_planted_duplicate(spark, sf_dir):
    """A benchmark doc's text copied into the corpus must be flagged."""
    out = QUERIES["q87_contamination_screen"].fn(spark, sf_dir)
    rows = {r["lang"]: r for r in out.collect()}
    assert rows  # one row per language present
    for r in rows.values():
        assert r["n_docs"] >= r["contaminated_docs"] >= 0
    # the synthetic vocabulary is small enough that 3-gram collisions
    # exist: the screen must find at least one contaminated doc overall
    assert sum(r["contaminated_docs"] for r in rows.values()) > 0


def test_token_budget_greedy_invariants(spark, sf_dir):
    from hadoop_sync_spark.functions.text import normalize, tokens

    corpus_totals = {
        r["lang"]: r["tot"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang")
        .agg(F.sum(F.size(tokens(normalize(F.col("text"))))).alias("tot"))
        .collect()
    }
    kept = QUERIES["q88_token_budget_sample"].fn(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in kept:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) == set(corpus_totals)
    for lang, rows in by_lang.items():
        total = sum(r["n_tok"] for r in rows)
        biggest = max(r["n_tok"] for r in rows)
        # greedy rule: tokens-before-last-kept-doc < budget, so the kept
        # total minus any single doc stays under budget...
        assert total - biggest < _TOKEN_BUDGET, lang
        # ...and the selection stops only at the budget or a dry corpus
        assert total >= min(_TOKEN_BUDGET, corpus_totals[lang]), lang


def test_corpus_merge_audit_math(spark, sf_dir):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = base.count()
    n_upd = base.where(F.col("doc_id") % 10 == 0).count()
    n_ins = base.where(F.col("doc_id") % 50 == 0).count()
    out = QUERIES["q89_corpus_merge"].fn(spark, sf_dir).collect()
    by_action: dict[str, int] = {}
    for r in out:
        by_action[r["action"]] = by_action.get(r["action"], 0) + r["doc_cnt"]
    assert by_action["insert"] == n_ins
    assert by_action["update"] == n_upd
    assert by_action["keep"] == n - n_upd
    assert sum(by_action.values()) == n + n_ins


def test_regression_stats_match_native_estimators(spark, sf_dir):
    """The exact power-sum formulation must agree with Spark's native
    corr/regr aggregates to float tolerance (they differ only by
    reduction order and the price rounding)."""
    exact = {
        r["l_returnflag"]: r
        for r in QUERIES["q94_regression_stats"].fn(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag",
        F.col("l_quantity").alias("x"),
        F.round("l_extendedprice").alias("y"),
    )
    native = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.corr("x", "y").alias("corr"),
            F.regr_slope("y", "x").alias("slope"),
            F.regr_intercept("y", "x").alias("icpt"),
        )
        .collect()
    }
    assert exact.keys() == native.keys()
    for flag, e in exact.items():
        nv = native[flag]
        assert abs(e["corr_qty_price"] - nv["corr"]) < 1e-9
        assert abs(e["regr_slope"] - nv["slope"]) < 1e-6
        assert abs(e["regr_intercept"] - nv["icpt"]) < 1e-3


def test_contamination_benchmark_join_is_broadcast(spark, sf_dir):
    plan = (
        QUERIES["q87_contamination_screen"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_fingerprint_diff_detects_drift_and_certifies_identity(spark, sf_dir):
    """q97 sensitivity in both directions: the registered query's planted
    line-number drift must flag at least one digest bucket, and an
    UNPERTURBED twin digest must match on every bucket (no false
    positives)."""
    from pyspark.sql import functions as F

    from hadoop_sync_spark.io import load_table
    from hadoop_sync_spark.queries.curation import _li_bucket_digest

    rows = QUERIES["q97_table_fingerprint_diff"].fn(spark, sf_dir).collect()
    assert len(rows) == 64
    assert any(not r["bucket_match"] for r in rows), "planted drift missed"

    li = load_table(spark, sf_dir, "lineitem")
    a = _li_bucket_digest(li, F.col("l_linenumber")).alias("a")
    b = _li_bucket_digest(li, F.col("l_linenumber")).alias("b")
    joined = a.join(b, "bucket").select(
        (
            F.col("a.cnt").eqNullSafe(F.col("b.cnt"))
            & F.col("a.xr").eqNullSafe(F.col("b.xr"))
            & F.col("a.ms").eqNullSafe(F.col("b.ms"))
        ).alias("ok")
    )
    assert all(r["ok"] for r in joined.collect()), "identical tables flagged"


def test_fingerprint_drilldown_identifies_exact_planted_rows(spark, sf_dir):
    """q109 end-to-end against the planted truth: the Merkle descent must
    recover EXACTLY the drifted physical rows — every lineitem row of an
    order divisible by 997 appears once per side, 'authoritative_only'
    with its true line number and 'replica_only' with the shifted one —
    and nothing else (no false positives from un-drifted subtrees)."""
    from hadoop_sync_spark.io import load_table

    got = {
        (r["side"], r["l_orderkey"], r["l_linenumber"])
        for r in QUERIES["q109_fingerprint_drilldown"].fn(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    planted = li.filter(F.col("l_orderkey") % 997 == 0).select(
        "l_orderkey", F.col("l_linenumber").cast("long").alias("ln")
    ).collect()
    assert planted, "fixture has no order divisible by 997 — test is vacuous"
    want = {("authoritative_only", r["l_orderkey"], r["ln"]) for r in planted} | {
        ("replica_only", r["l_orderkey"], r["ln"] + 100) for r in planted
    }
    assert got == want


def test_observed_write_metrics_single_pass(spark, sf_dir):
    """df.observe must deliver the q112-grade admission metrics from the
    SAME job that consumes the frame — values must equal the standalone
    aggregates, with no second scan issued by the metric collection."""
    from hadoop_sync_spark.io import load_table
    from hadoop_sync_spark.queries.curation import observed_write_metrics

    li = load_table(spark, sf_dir, "lineitem")
    observed, obs = observed_write_metrics(li)
    consumed = observed.count()  # the "write path" action
    got = obs.get
    assert got["rows"] == consumed
    expect = li.agg(
        F.sum(F.col("l_shipdate").isNull().cast("long")).alias("n"),
        F.sum((~F.col("l_quantity").between(1, 50)).cast("long")).alias("q"),
    ).first()
    assert got["null_shipdate"] == (expect["n"] or 0)
    assert got["qty_out_of_domain"] == (expect["q"] or 0)


def test_agg_state_merge_equals_full_recompute(spark, sf_dir):
    """Mergeable aggregate state: splitting the corpus into arbitrary
    batches, building per-batch state, and merging must equal the state
    of the whole corpus — for every (key, measure) cell, in any merge
    order (associativity/commutativity/identity probes)."""
    from hadoop_sync_spark.functions.aggstate import (
        agg_state,
        merge_agg_states,
        state_mean,
    )
    from hadoop_sync_spark.io import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, sf_dir, "documents")
    full = agg_state(d, ["source"], ["n_chars", "doc_id"])

    b1 = d.filter(F.col("doc_id") % 3 == 0)
    b2 = d.filter(F.col("doc_id") % 3 == 1)
    b3 = d.filter(F.col("doc_id") % 3 == 2)
    s1, s2, s3 = (
        agg_state(b, ["source"], ["n_chars", "doc_id"]) for b in (b1, b2, b3)
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    want = rows(full)
    # left fold and a different association must both equal full recompute
    assert rows(merge_agg_states(merge_agg_states(s1, s2), s3)) == want
    assert rows(merge_agg_states(s1, merge_agg_states(s3, s2))) == want
    # identity tolerance: merging with an empty batch changes nothing
    empty = agg_state(
        d.filter(F.lit(False)), ["source"], ["n_chars", "doc_id"]
    )
    assert rows(merge_agg_states(full, empty)) == want
    # derived mean from merged state == direct mean
    got_mean = {
        r["source"]: r["n_chars_mean"]
        for r in state_mean(
            merge_agg_states(s1, merge_agg_states(s2, s3)), "n_chars"
        ).collect()
    }
    direct = {
        r["source"]: r["m"]
        for r in d.groupBy("source")
        .agg((F.sum("n_chars") / F.count("n_chars")).alias("m"))
        .collect()
    }
    assert got_mean == direct
