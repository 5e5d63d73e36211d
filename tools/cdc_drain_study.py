#!/usr/bin/env python
"""Round-13 CDC-source backlog drain study (SCALING.md evidence —
VERDICT r12 item 7: end-to-end drains, not just planning ms).

Both streaming sources drain a 1x and a 10x COMMIT backlog end to end
through a real Structured Streaming query (continuous processingTime
trigger — the Python Data Source API lacks Trigger.AvailableNow), with
and without the round-13 bounded-batch clamp:

1. delta_cdc: a CDF table with N pure-append commits x R rows each;
   drain all N, record wall / batches / rows / rows-per-second.  The
   claim under test: drain cost is O(backlog rows) with O(backlog
   commits) driver-side planning — never O(backlog x table) — so 10x
   commits ~ 10x wall, flat rows/s.
2. delta_cdc with maxVersionsPerBatch: the same 10x backlog lands in
   ceil(N/cap) bounded batches; per-batch planning stays O(cap), and
   the bounded drain's total wall stays within a small factor of the
   unbounded one (the price of checkpoint granularity).
3. iceberg_incremental: N append snapshots x R rows; same
   measurements, offsets in sequence space.

Planning-only timing (partitions() driven directly) rides along at
both scales to keep the r12 O(range) evidence current.

Run on a QUIET box; prints a markdown-ready block per axis.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import pandas as pd

from hadoop_sync_spark.cdc_source import (
    DeltaCDCStreamSource,
    IcebergIncrementalStreamSource,
    _CDCStreamReader,
)
from hadoop_sync_spark.delta_log import DeltaLog
from hadoop_sync_spark.iceberg_meta import IcebergTable
from hadoop_sync_spark.session import get_spark

ROWS_PER_COMMIT = 20_000

SCHEMA = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "long", "nullable": True, "metadata": {}},
    ],
})


def _mk_delta_backlog(n_commits: int) -> str:
    d = tempfile.mkdtemp(prefix=f"cdc_drain_{n_commits}_")
    t = os.path.join(d, "t")
    os.makedirs(t)
    log = DeltaLog(t)
    for v in range(n_commits):
        base = v * ROWS_PER_COMMIT
        pd.DataFrame({
            "k": range(base, base + ROWS_PER_COMMIT),
            "v": range(base, base + ROWS_PER_COMMIT),
        }).to_parquet(os.path.join(t, f"f{v}.parquet"))
        acts = [log.add_action_for(f"f{v}.parquet")]
        if v == 0:
            acts = [
                {"protocol": {"minReaderVersion": 1}},
                {"metaData": {
                    "id": "t",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": SCHEMA,
                    "partitionColumns": [],
                    "configuration": {
                        "delta.enableChangeDataFeed": "true"},
                }},
            ] + acts
        log.commit(v, acts)
    return t


def _mk_ice_backlog(spark, n_snaps: int) -> str:
    d = tempfile.mkdtemp(prefix=f"ice_drain_{n_snaps}_")
    t_dir = os.path.join(d, "t")
    t = IcebergTable.create(
        t_dir, [("k", "bigint"), ("v", "bigint")], now_ms=1)
    for i in range(n_snaps):
        base = i * ROWS_PER_COMMIT
        b = spark.range(base, base + ROWS_PER_COMMIT).selectExpr(
            "id as k", "id as v")
        t.append_stream_batch(b, "gen", i, now_ms=2 + i)
    return t_dir


def _drain(spark, fmt, path, extra_opts=None, expect_rows=0):
    """One continuous-trigger drain; returns (wall_s, n_batches,
    n_rows)."""
    ck = tempfile.mkdtemp(prefix="cdc_drain_ck_")
    shutil.rmtree(ck, ignore_errors=True)
    counts: list[int] = []

    def sink(bdf, _bid):
        n = bdf.count()
        if n:
            counts.append(n)

    df = spark.readStream.format(fmt).option("path", path)
    for k, v in (extra_opts or {}).items():
        df = df.option(k, v)
    t0 = time.perf_counter()
    q = (df.load().writeStream.foreachBatch(sink)
         .option("checkpointLocation", ck)
         .trigger(processingTime="50 milliseconds").start())
    deadline = time.time() + 600
    while time.time() < deadline:
        if sum(counts) >= expect_rows:
            break
        time.sleep(0.2)
    wall = time.perf_counter() - t0
    q.stop()
    shutil.rmtree(ck, ignore_errors=True)
    return wall, len(counts), sum(counts)


def main():
    spark = get_spark(app_name="cdc-drain-study")
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(DeltaCDCStreamSource)
    spark.dataSource.register(IcebergIncrementalStreamSource)

    print("## delta_cdc end-to-end backlog drain "
          f"({ROWS_PER_COMMIT} rows/commit)")
    tables = {}
    for n in (10, 100):
        tables[n] = _mk_delta_backlog(n)
        # planning-only at this scale (the r12 O(range) evidence)
        rdr = _CDCStreamReader({"path": tables[n]})
        t0 = time.perf_counter()
        parts = rdr.partitions({"version": 0}, {"version": n})
        plan_ms = (time.perf_counter() - t0) * 1e3
        wall, batches, rows = _drain(
            spark, "delta_cdc", tables[n],
            expect_rows=n * ROWS_PER_COMMIT)
        print(f"- {n} commits ({rows} rows): drain {wall:.1f} s in "
              f"{batches} batch(es), {rows / wall:,.0f} rows/s; "
              f"planning {plan_ms:.1f} ms for {len(parts)} parts")
    # bounded drain of the 10x backlog
    wall, batches, rows = _drain(
        spark, "delta_cdc", tables[100],
        extra_opts={"maxVersionsPerBatch": 10},
        expect_rows=100 * ROWS_PER_COMMIT)
    print(f"- 100 commits BOUNDED (maxVersionsPerBatch=10): drain "
          f"{wall:.1f} s in {batches} batches, "
          f"{rows / wall:,.0f} rows/s")

    print("## iceberg_incremental end-to-end backlog drain")
    for n in (10, 100):
        path = _mk_ice_backlog(spark, n)
        wall, batches, rows = _drain(
            spark, "iceberg_incremental", path,
            expect_rows=n * ROWS_PER_COMMIT)
        print(f"- {n} snapshots ({rows} rows): drain {wall:.1f} s in "
              f"{batches} batch(es), {rows / wall:,.0f} rows/s")
        if n == 100:
            wall, batches, rows = _drain(
                spark, "iceberg_incremental", path,
                extra_opts={"maxSnapshotsPerBatch": 10},
                expect_rows=n * ROWS_PER_COMMIT)
            print(f"- 100 snapshots BOUNDED (maxSnapshotsPerBatch=10): "
                  f"drain {wall:.1f} s in {batches} batches, "
                  f"{rows / wall:,.0f} rows/s")


if __name__ == "__main__":
    main()
