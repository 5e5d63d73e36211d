#!/usr/bin/env python
"""Registry proxy benchmarks for the reference's three qualitative claims
(BASELINE.md §3): P1 = stat-collection cost on sync, P2 = stat-based file
pruning payoff, plus the idempotent re-sync cost.

Builds a multi-file copy of sf0.1 lineitem (range-partitioned on
l_shipdate so per-file min/max intervals are disjoint — the layout the
reference's block-per-shard model produces), then measures:

  P1: sync(fetch_min_max=True) vs sync(fetch_min_max=False) wall clock
  P2: read_pruned(3-month range) vs read() full scan — files opened + wall
  NOOP: immediate re-sync (diff-only) wall clock

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F

from hadoop_sync_spark.io import table_path
from hadoop_sync_spark.registry import Registry
from hadoop_sync_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="hadoop-sync-spark-bench-registry")
    spark.sparkContext.setLogLevel("ERROR")

    scratch = os.path.join(tempfile.gettempdir(), "hss_bench_registry")
    shutil.rmtree(scratch, ignore_errors=True)
    data_dir = os.path.join(scratch, "lineitem")
    meta_a = os.path.join(scratch, "meta_stats")
    meta_b = os.path.join(scratch, "meta_nostats")

    # multi-file layout, range-partitioned on the stat column
    li = spark.read.parquet(table_path(SF_DIR, "lineitem"))
    li.repartitionByRange(8, "l_shipdate").write.mode("overwrite").parquet(
        data_dir
    )

    ra = Registry(spark, meta_a)
    ra.register("lineitem", data_dir, partition_column="l_shipdate")
    t0 = time.perf_counter()
    ra.sync("lineitem", fetch_min_max=True)
    p1_with = time.perf_counter() - t0

    rb = Registry(spark, meta_b)
    rb.register("lineitem", data_dir, partition_column="l_shipdate")
    t0 = time.perf_counter()
    rb.sync("lineitem", fetch_min_max=False)
    p1_without = time.perf_counter() - t0

    t0 = time.perf_counter()
    noop = ra.sync("lineitem", fetch_min_max=True)
    noop_s = time.perf_counter() - t0
    assert noop.noop

    lo, hi = "1997-06-01 00:00:00", "1997-09-01 00:00:00"
    pred = (
        (F.col("l_shipdate") >= F.lit(lo).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(hi).cast("timestamp_ntz"))
    )
    total_files = len(ra.shards("lineitem"))
    kept_files = len(ra.prune_files("lineitem", lo, hi))

    def timed_count(df) -> tuple[float, int]:
        df.count()  # warm
        t0 = time.perf_counter()
        n = df.count()
        return time.perf_counter() - t0, n

    full_s, full_n = timed_count(ra.read("lineitem").filter(pred))
    pruned_s, pruned_n = timed_count(ra.read_pruned("lineitem", lo, hi).filter(pred))
    assert full_n == pruned_n, (full_n, pruned_n)

    # ---- DML write-face proxies (round 12, VERDICT r11 item 8):
    # delete_where wall clock vs matched rows and merge_upsert vs
    # source size, so write-path regressions surface round-over-round
    # in the recorded JSON, not just in correctness tests.  Fresh
    # 600k-row Delta table per measurement (deletes mutate).
    from hadoop_sync_spark.delta_log import DeltaLog
    from hadoop_sync_spark.io import write_single_parquet

    schema_json = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "v", "type": "long", "nullable": True,
             "metadata": {}},
        ],
    })

    def mk_delta(tag: str) -> DeltaLog:
        d = os.path.join(scratch, f"dml_{tag}")
        os.makedirs(d)
        log = DeltaLog(d)
        acts = [{"protocol": {"minReaderVersion": 1}},
                {"metaData": {
                    "id": "t",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_json,
                    "partitionColumns": [], "configuration": {}}}]
        per = 150_000
        for i in range(4):
            rel = f"f{i}.parquet"
            df = spark.range(i * per, (i + 1) * per).select(
                F.col("id").alias("k"),
                (F.col("id") * 10).alias("v"))
            write_single_parquet(df, os.path.join(d, rel), "br_dml_")
            acts.append(log.add_action_for(rel))
        log.commit(0, acts)
        return log

    dml: dict[str, float] = {}
    for label, match in (("5k", 5_000), ("50k", 50_000)):
        log = mk_delta(f"del_{label}")
        t0 = time.perf_counter()
        res = log.delete_where(spark, {"k": (0, match - 1)},
                               now_ms=1000)
        dml[f"delete_where_{label}_matched_s"] = round(
            time.perf_counter() - t0, 4)
        assert res["rows_deleted"] == match
    for label, batch in (("1k", 1_000), ("10k", 10_000)):
        log = mk_delta(f"mrg_{label}")
        src = spark.range(0, batch).select(
            F.col("id").alias("k"), (F.col("id") + 7).alias("v"))
        t0 = time.perf_counter()
        log.merge_upsert(spark, src, "k", now_ms=1000)
        dml[f"merge_upsert_{label}_source_s"] = round(
            time.perf_counter() - t0, 4)
    # streaming sink faces (round 12): micro-batch land wall clock +
    # the replay-skip, whose cost is the exactly-once price (must stay
    # metadata-time — a regression here means the skip started
    # touching data)
    log = mk_delta("stream")
    sbatch = spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") + 3).alias("v"))
    t0 = time.perf_counter()
    log.append_stream_batch(sbatch, "bench", 0)
    dml["stream_land_200k_s"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    assert log.append_stream_batch(sbatch, "bench", 0) is None
    dml["stream_replay_skip_s"] = round(time.perf_counter() - t0, 4)

    print(
        json.dumps(
            {
                "metric": "registry-proxies",
                "sf": SF_DIR,
                "p1_sync_with_stats_s": round(p1_with, 4),
                "p1_sync_without_stats_s": round(p1_without, 4),
                "p1_ratio": round(p1_with / p1_without, 2),
                "p2_total_files": total_files,
                "p2_files_after_prune": kept_files,
                "p2_full_scan_s": round(full_s, 4),
                "p2_pruned_scan_s": round(pruned_s, 4),
                "p2_speedup": round(full_s / pruned_s, 2),
                "p2_rows": full_n,
                "noop_resync_s": round(noop_s, 4),
                **dml,
            }
        )
    )
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
