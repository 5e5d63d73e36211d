#!/usr/bin/env python
"""Round-12 streaming-face scale study (SCALING.md evidence).

Axes for the exactly-once sinks + the delta_cdc source:

1. append_stream_batch batch-size sweep (Delta): 200k vs 2M rows in
   one micro-batch.  The write is one distributed parquet job, so
   wall clock should track rows near-linearly — and the REPLAY of the
   same epoch must cost metadata time only (log replay, zero data
   I/O), independent of batch size.  The replay cost IS the
   idempotence price; if it scaled with data, exactly-once would be
   unaffordable at 100 TB.
2. delta_cdc planning sweep: a table carrying 10x more UNTOUCHED
   history must not slow the planning of a fixed tail range —
   partitions() is O(commits in range + files changed), never
   O(table).  Measured by driving _CDCStreamReader.partitions
   directly (the driver-side path the engine calls per micro-batch).
3. Iceberg committed_epoch at 10x snapshot history: the watermark
   lookup walks ancestry in ONE metadata json — growing history 10x
   should grow the lookup far sublinearly (it reads the same file,
   longer list).

Run on a QUIET box; prints a markdown-ready block per axis.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_sync_spark.delta_log import DeltaLog
from hadoop_sync_spark.iceberg_meta import IcebergTable
from hadoop_sync_spark.session import get_spark


def axis1(spark):
    print("## axis 1: append_stream_batch batch size (Delta)")
    # warmup: the session's first parquet write job pays JVM/codegen
    # startup that would otherwise be billed to the first grid point
    wd = tempfile.mkdtemp(prefix="strm_warm_")
    DeltaLog(os.path.join(wd, "t")).append_stream_batch(
        spark.range(10_000).selectExpr("id as k", "id as v"),
        "warm", 0)
    for rows in (200_000, 2_000_000):
        d = tempfile.mkdtemp(prefix="strm_a1_")
        log = DeltaLog(os.path.join(d, "t"))
        df = spark.range(rows).selectExpr("id as k", "id * 7 as v")
        t0 = time.perf_counter()
        log.append_stream_batch(df, "study", 0)
        t_land = time.perf_counter() - t0
        t0 = time.perf_counter()
        assert log.append_stream_batch(df, "study", 0) is None
        t_replay = time.perf_counter() - t0
        n_files = len(log.snapshot().files)
        print(f"| {rows:>9,} rows | land {t_land:6.2f} s "
              f"({n_files} files) | replay-skip {t_replay*1000:7.1f} ms |")


def axis2(spark):
    print("## axis 2: delta_cdc planning vs untouched history")
    from hadoop_sync_spark.cdc_source import _CDCStreamReader

    for n_hist in (20, 200):
        d = tempfile.mkdtemp(prefix="strm_a2_")
        td = os.path.join(d, "t")
        log = DeltaLog(td)
        df = spark.range(500).selectExpr("id as k", "id as v")
        for epoch in range(n_hist):
            log.append_stream_batch(df, "hist", epoch)
        head = log.latest_version()
        rdr = _CDCStreamReader({"path": td})
        # fixed 5-commit tail range, history below it untouched
        t0 = time.perf_counter()
        parts = rdr.partitions({"version": head - 4},
                               {"version": head + 1})
        t_plan = time.perf_counter() - t0
        print(f"| {n_hist:>4} commits of history | plan 5-commit tail: "
              f"{t_plan*1000:7.1f} ms | {len(parts)} file parts |")


def axis3(spark):
    print("## axis 3: Iceberg committed_epoch vs snapshot history")
    df = None
    for n_hist in (20, 200):
        d = tempfile.mkdtemp(prefix="strm_a3_")
        t = IcebergTable.create(
            os.path.join(d, "t"),
            [("k", "bigint"), ("v", "bigint")], now_ms=1)
        if df is None:
            df = spark.range(200).selectExpr("id as k", "id as v")
        for epoch in range(n_hist):
            t.append_stream_batch(df, "hist", epoch, now_ms=epoch + 2)
        t0 = time.perf_counter()
        got = t.committed_epoch("hist")
        t_look = time.perf_counter() - t0
        assert got == n_hist - 1
        t0 = time.perf_counter()
        assert t.append_stream_batch(df, "hist", 0, now_ms=9999) is None
        t_replay = time.perf_counter() - t0
        print(f"| {n_hist:>4} snapshots | committed_epoch "
              f"{t_look*1000:7.1f} ms | replay-skip "
              f"{t_replay*1000:7.1f} ms |")


def main():
    spark = get_spark(app_name="stream-scale-study")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"load-avg {os.getloadavg()[0]:.2f}")
    axis1(spark)
    axis2(spark)
    axis3(spark)


if __name__ == "__main__":
    main()
