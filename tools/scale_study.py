#!/usr/bin/env python
"""Scale study: replicate sf0.1 k-fold with disjoint keys, then measure
per-query wall clock at both scales to find superlinear operators.

Usage:
    python tools/scale_study.py build [k]     # default k=10 → ~sf1
    python tools/scale_study.py run [k]       # times queries, prints table

Replication is *key-shifted*, not naive duplication, so data
characteristics (dup rate, similarity structure, group cardinalities per
key) stay constant while volume grows — the property that makes a time
ratio comparable to the data ratio:

- Fact tables (`lineitem`, `orders`, `customer`, `supplier`, `part`,
  `events`): every key column is offset by `replica * SPAN` (SPAN a power
  of ten above the base key range) so joins stay 1:1 consistent and no
  cross-replica key collides.  Dimension tables (`region`, `nation`) are
  NOT replicated — dims don't grow with fact volume in a star schema, and
  broadcast-ability at scale is exactly the property we want to preserve.
- `documents.text`: replica i>0 rewrites token t → t+<replica letter> for
  the ~30% of the token vocabulary with crc32(t) % 10 < 3.  The rewrite
  is a function of (token, replica) only, so any two documents inside one
  replica keep their exact base-corpus similarity (same substitution
  applied to both), while cross-replica Jaccard of a doc with its own
  copy drops to ~0.54 — below near-dup thresholds.  Dup structure per
  unit of data is therefore scale-invariant.
- `embeddings.embedding`: replica i applies a ±1 diagonal transform with
  signs keyed by (dim, replica).  Orthogonal → all within-replica
  cosines/norms are preserved exactly; cross-replica cosine of a vector
  with its own copy decays to ~0 (random sign agreement).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
import zlib
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2"))

#: key column → SPAN (one power of ten above the base sf0.1 key range)
KEY_SPANS = {
    "l_orderkey": 10_000_000,
    "o_orderkey": 10_000_000,
    "l_partkey": 1_000_000,
    "p_partkey": 1_000_000,
    "l_suppkey": 100_000,
    "s_suppkey": 100_000,
    "o_custkey": 1_000_000,
    "c_custkey": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

REPLICATED = (
    "lineitem",
    "orders",
    "customer",
    "supplier",
    "part",
    "events",
    "documents",
    "embeddings",
)
DIMS = ("region", "nation")

#: one representative per operator family (registry names), grouped into
#: the per-SESSION families the sweep isolates (round-8, VERDICT r7 item
#: 6): a single-session 59-query sweep provably inflates LATE rows via
#: accumulated JVM/broadcast/GC state (round 7: q66 ratio 5.4 in-sweep
#: vs 1.33 isolated; q129 base 3.79 vs 0.81), so `run` now executes one
#: fresh subprocess+SparkSession per family — flagged-row re-measurement
#: stops being a manual step because no row is ever "late" behind an
#: unrelated family.  ~10 s JVM startup per family is the price; the
#: per-family tables in SCALING.md are the authoritative numbers.
FAMILIES: dict[str, list[str]] = {
    "relational": [
        "q01_pricing_summary",      # scan + group agg
        "q03_top_unshipped_orders", # join + top-k
        "q09_distinct_counts",      # distinct
        "q12_top_orders_per_customer",  # window
        "q21_regional_revenue",     # 6-table broadcast star
        "q84_disjunctive_join_revenue",
    ],
    "temporal": [
        "q40_tumbling_window",      # event-time window
        "q42_session_windows",      # session window
        "q75_gap_fill_locf",        # time-series gap fill
        "q119_scd2_intervals",    # gaps-and-islands (3 window passes, 1 shuffle)
        "q120_funnel_conversion", # equi-join + conditional MIN funnel
        "q122_rolling_7d_revenue",  # RANGE frame sliding aggregate
        "q124_retention_cohorts",   # distinct + min-agg + equi-join
        "q125_event_trigrams",      # double-lag window + tiny agg + top-k
        "q126_snapshot_cdc",        # one co-partitioned full-outer join
        "q128_price_size_skyline",  # grid-partitioned dominance windows
        "q130_robust_source_stats",  # two rank-window passes on source
        "q134_interval_weighted_avg",  # one-exchange window + agg
    ],
    "text": [
        "q57_bpe_pretokens",        # text tokenize + agg
        "q121_bigram_lm_quality", # bigram LM train + score (3 shuffles)
        "q127_vocab_build",         # token agg + vocab-scale rank
        "q131_temperature_mix",     # agg + one-row normalizers
        "q132_posting_blocks",      # doc-sharded postings, one shuffle
        "q133_doc_chunks",          # zero-shuffle narrow chunking
        "q135_k_anonymity",         # two chained aggregations
        "q136_token_pmi",           # vocab-capped doc-keyed pair expansion
    ],
    "dedup": [
        "q60_exact_dedup",          # hash dedup
        "q62_jaccard_pairs",        # bucketed similarity join
        "q63_minhash_lsh_pairs",    # LSH banding
        "q66_simhash_pairs",        # simhash blocks
        "q68_dup_components",       # iterative label propagation
        "q99_incremental_dedup",
        "q110_span_dedup",        # sub-document span dedup (explode + 2 shuffles)
        "q117_bloom_incremental_dedup",  # bloom index + exact confirm
        "q143_cdc_chunk_dups",      # content-defined chunk signatures
    ],
    "sample-sketch": [
        "q73_stratified_sample",    # deterministic sampling
        "q88_token_budget_sample",  # two-phase budget selection
        "q97_table_fingerprint_diff",
        "q98_heavy_hitters",
        "q105_misra_gries",       # mergeable sketch (KB-sized exchange)
        "q112_quality_constraints",  # single-pass constraint report
        "q113_shard_shuffle",     # per-shard window, no global sort
        "q115_per_source_quality_gate",  # per-source rank gate
        "q116_eval_per_lang",     # WindowGroupLimit per-group top-k
    ],
    "ann": [
        "q70_cosine_topk",          # brute-force ANN baseline
        "q71_ivf_topk",             # IVF ANN
        "q111_pq_topk",           # PQ ADC scan (constant-cost codebooks)
        "q114_ivf_pq_topk",       # composed coarse probe x ADC scan
    ],
    "graph": [
        "q123_copurchase_triangles",  # degree-ordered wedge + closing joins
        "q137_copurchase_pagerank",  # per-round message join + agg, cached rounds
    ],
    "retrieval-curation": [
        "q139_bm25_topk",           # postings join, matched-docs-only top-k
        "q140_cogroup_asof_align",  # bucketed cogroup merge_asof
        "q141_ngram_novelty",       # membership join (knowingly linear)
        "q142_length_matched_controls",  # banded union-merge nearest join
    ],
    "multimodal": [
        "q129_audio_energy_segments",  # decode + vectorized DSP per frame
        "q145_png_roundtrip_stats",  # CPU-bound codec, key-frame repartition
        "q146_jpeg_roundtrip_stats",  # DCT codec round trip, same posture
    ],
    "lakehouse": [
        "q138_delta_log_reader",    # metadata replay + snapshot-scoped scan
        "q144_delta_registry_sync",  # Delta snapshot diff through the registry
        "q147_iceberg_snapshot_reader",  # manifest walk + 2-layer pruning
        "q148_iceberg_mor_reader",  # broadcast-anti position/equality deletes
        "q149_delta_dv_reader",     # Roaring DV subtraction, v0 time travel
    ],
}

#: flat view (kept for SPARK_GRAFT_SCALE_QUERIES and external callers)
STUDY_QUERIES = [q for fam in FAMILIES.values() for q in fam]


def scaled_dir(k: int) -> str:
    return f"/tmp/hss_scale_x{k}"


def _mutate_tokens(texts: pd.Series, replica: int) -> pd.Series:
    """token t → t+<letter> when crc32(t)%10 < 3; keyed by (token, replica)."""
    suffix = chr(ord("a") + (replica % 26))
    cache: dict[str, str] = {}

    def tok(t: str) -> str:
        got = cache.get(t)
        if got is None:
            got = t + suffix if zlib.crc32(t.encode()) % 10 < 3 else t
            cache[t] = got
        return got

    return texts.map(lambda s: " ".join(tok(t) for t in s.split(" ")))


def build(k: int, tables: tuple[str, ...] | None = None) -> None:
    """Build the k× replica dir; `tables` restricts which fact tables are
    replicated (for targeted high-k studies where a full build would be
    pointless I/O — e.g. 100× needs only documents+lineitem for the
    q68/q97/q98 curves)."""
    out = scaled_dir(k)
    os.makedirs(out, exist_ok=True)
    for name in DIMS:
        src = os.path.join(BASE, f"{name}.parquet")
        pq.write_table(pq.read_table(src), os.path.join(out, f"{name}.parquet"))
        print(f"{name}: copied (dimension, not replicated)")
    for name in tables or REPLICATED:
        t0 = time.time()
        base = pq.read_table(os.path.join(BASE, f"{name}.parquet"))
        pdf = base.to_pandas()
        parts = []
        for i in range(k):
            rep = pdf.copy()
            for col in rep.columns:
                if col in KEY_SPANS and i:
                    rep[col] = rep[col] + i * KEY_SPANS[col]
            if name == "documents" and i:
                rep["text"] = _mutate_tokens(rep["text"], i)
                rep["n_chars"] = rep["text"].str.len().astype("int64")
            if name == "embeddings" and i:
                mat = np.stack(rep["embedding"].to_numpy())
                dims = mat.shape[1]
                rng = (
                    np.array(
                        [zlib.crc32(f"{i}:{d}".encode()) for d in range(dims)]
                    )
                    % 2
                ) * 2 - 1
                rep["embedding"] = list(
                    (mat * rng.astype(mat.dtype)).astype(np.float32)
                )
            parts.append(rep)
        big = pd.concat(parts, ignore_index=True)
        table = pa.Table.from_pandas(big, schema=base.schema, preserve_index=False)
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {len(pdf)} → {len(big)} rows ({time.time()-t0:.1f}s)")
    print("built", out)


def _session(k: int):
    from pyspark.sql import SparkSession

    # Deliberately NEAR-VANILLA (no engine conf, no files.minPartitionNum):
    # this mirrors the driver's session posture, which is how the round-7
    # multimodal partition-starvation bug became measurable here while the
    # tuned bench.py session masked it.  Don't "fix" this by importing
    # session.get_spark — queries must carry their own partition-sizing
    # guards to pass this tool.
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _measure(spark, names: list[str], k: int) -> list[tuple]:
    from hadoop_sync_spark.queries import load_all

    registry = load_all()
    big = scaled_dir(k)

    def median_time(fn, sf_dir: str) -> float:
        fn(spark, sf_dir).count()  # warm-up (JIT, listing caches)
        times = []
        for _ in range(RUNS):
            t0 = time.time()
            fn(spark, sf_dir).count()
            times.append(time.time() - t0)
        return statistics.median(times)

    rows = []
    for name in names:
        q = registry[name]
        t_small = median_time(q.fn, BASE)
        t_big = median_time(q.fn, big)
        ratio = t_big / t_small if t_small > 0 else float("nan")
        rows.append((name, t_small, t_big, ratio))
        flag = " <-- SUPERLINEAR" if ratio > 1.5 * k else ""
        print(f"{name:34s} {t_small:7.2f}s {t_big:7.2f}s  x{ratio:5.1f}{flag}")
    return rows


def run_family(k: int, family: str) -> None:
    """One family, one fresh SparkSession (subprocess entry)."""
    rows = _measure(_session(k), FAMILIES[family], k)
    print(
        "FAMILY_RESULT "
        + json.dumps(
            {
                n: {"t_base": round(a, 3), "t_scaled": round(b, 3),
                    "ratio": round(r, 2)}
                for n, a, b, r in rows
            }
        )
    )


def run(k: int) -> None:
    """Full sweep: ONE SUBPROCESS (= one JVM/SparkSession) PER FAMILY, so
    no query's reading sits behind an unrelated family's accumulated
    JVM/broadcast/GC state (the round-7 late-row inflation: q66 5.4
    in-sweep vs 1.33 isolated).  SPARK_GRAFT_SCALE_QUERIES still runs a
    targeted list in a single in-process session."""
    only = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
    if only:
        rows = _measure(_session(k), only.split(","), k)
        print(
            json.dumps(
                {
                    "k": k,
                    "queries": {
                        n: {"t_base": round(a, 3), "t_scaled": round(b, 3),
                            "ratio": round(r, 2)}
                        for n, a, b, r in rows
                    },
                }
            )
        )
        return

    import subprocess

    merged: dict[str, dict] = {}
    for family in FAMILIES:
        print(f"== family: {family} (fresh session) ==", flush=True)
        proc = subprocess.run(
            [sys.executable, __file__, "run-family", str(k), family],
            capture_output=True,
            text=True,
            env=os.environ,
        )
        tail = None
        for line in proc.stdout.splitlines():
            if line.startswith("FAMILY_RESULT "):
                tail = line[len("FAMILY_RESULT "):]
            else:
                print(line)
        if proc.returncode != 0 or tail is None:
            print(f"family {family} FAILED (rc={proc.returncode}):")
            print(proc.stderr[-2000:])
            continue
        merged.update(json.loads(tail))
    print(json.dumps({"k": k, "queries": merged, "per_family_sessions": True}))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    kk = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    if cmd == "build":
        build(kk, tuple(sys.argv[3:]) or None)
    elif cmd == "run":
        run(kk)
    elif cmd == "run-family":
        run_family(kk, sys.argv[3])
    else:
        raise SystemExit(f"unknown command {cmd!r}")
