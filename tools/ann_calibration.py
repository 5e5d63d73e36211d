#!/usr/bin/env python
"""Measure the ANN contracts' actual operating point on the CURRENT
fixtures: pooled recall, candidate scan fraction (the data-derived
random-scan baseline), and the resulting headroom of the contract margin.

Run after every testdata regeneration (regeneration checklist,
SCALING.md) — the contracts derive their floor from the data, so this is
a headroom report, not a pass/fail gate:

    python tools/ann_calibration.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from hadoop_sync_spark.functions.vectors import (  # noqa: E402
    brute_force_topk,
    ivf_pq_topk,
    ivf_topk,
    pq_topk,
    rp_lsh_topk,
)


def measure(spark, sf_dir: str) -> None:
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = emb.filter(F.col("vec_id") < 5)
    n = emb.count()
    nq = queries.count()
    exact = brute_force_topk(emb, queries, k=10)
    e = {(r[0], r[1]) for r in exact.select("query_id", "neighbor_id").collect()}

    for name, margin, (ann, cands) in [
        (
            "q71_ivf",
            1.4,
            ivf_topk(
                emb, queries, k=10, n_centroids=16, n_probe=4,
                with_candidates=True,
            ),
        ),
        (
            "q72_rp_lsh",
            1.4,
            rp_lsh_topk(
                emb, queries, k=10, n_planes=48, band_bits=6,
                with_candidates=True,
            ),
        ),
        (
            "q111_pq",
            1.4,
            pq_topk(
                emb, queries, k=10, m=8, ksub=16, n_candidates=50,
                with_candidates=True,
            ),
        ),
        (
            "q114_ivf_pq",
            1.4,
            ivf_pq_topk(
                emb, queries, k=10, n_centroids=16, n_probe=4, m=8,
                ksub=16, n_candidates=50, with_candidates=True,
            ),
        ),
    ]:
        a = {(r[0], r[1]) for r in ann.select("query_id", "neighbor_id").collect()}
        n_cand = cands.count()
        recall = len(e & a) / max(len(e), 1)
        frac = n_cand / max(nq * (n - 1), 1)
        floor = margin * frac
        print(
            f"{sf_dir} {name}: N={n} recall={recall:.3f} "
            f"scan_frac={frac:.3f} floor={floor:.3f} "
            f"headroom={recall / floor if floor else float('inf'):.2f}x"
        )
        if recall < floor:
            print(f"  !! {name} recall below contract floor — driver row would fail")


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        measure(spark, d)


if __name__ == "__main__":
    main()
