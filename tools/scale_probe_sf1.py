#!/usr/bin/env python
"""sf1 scaling probe (round 14 — VERDICT r13 item 3): one measurement
where EXECUTION dominates the driver floor, so the 8-vs-32-core ratio
reflects the engine, not py4j/collect overhead.

The sf0.1 bench queries finish in 0.1-2 s and are driver/collect-bound
(BENCH_r13 scaling block: ratios ≈1 at 8 vs 32 cores), so the repo's
100 TB posture claims were argued, not measured.  This probe:

1. Synthesizes a 10x ("sf1") dataset under /tmp/sf1_probe by
   DETERMINISTIC shifted replication of the sf0.1 fixtures (doc_id /
   orderkey / event ids shifted per copy; the read-only driver fixtures
   are never touched).  Written as 32 files/table so scan parallelism
   is real (the single-file sf0.1 tables scan as 1 task).
2. Runs the heavy operators through the noop sink (guide §1.4) at
   $SPARK_GRAFT_CPUS — invoke once with 32 and once with 8 (a fresh
   process per core count, exactly the driver's methodology).

Usage::

    python tools/scale_probe_sf1.py gen          # build /tmp/sf1_probe
    SPARK_GRAFT_CPUS=32 python tools/scale_probe_sf1.py run
    SPARK_GRAFT_CPUS=8  python tools/scale_probe_sf1.py run

Results recorded in SCALING.md.  This is a measurement tool: nothing
here feeds the bench or the oracle.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1_probe")
COPIES = 10
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

#: per-table id columns shifted per copy so keys stay unique and the
#: planted-contract arithmetic (id % 7 clones, id < 1e12 clone band)
#: keeps behaving like a 10x corpus
SHIFTS = {
    "documents": [("doc_id", 10_000)],
    "embeddings": [("vec_id", 10_000)],
    "events": [("event_id", 1_000_000), ("user_id", 100_000)],
    "lineitem": [("l_orderkey", 600_000)],
    "orders": [("o_orderkey", 600_000), ("o_custkey", 15_000)],
    "customer": [("c_custkey", 15_000)],
}
#: dimension tables ride along unreplicated (join fan-out unchanged)
COPY_AS_IS = ("region", "nation", "supplier", "part")

PROBES = [
    "q63_minhash_lsh_pairs",
    "q42_session_windows",
    "q84_disjunctive_join_revenue",
    "q100_column_profile",
]


def gen() -> None:
    from pyspark.sql import functions as F

    from hadoop_sync_spark.session import get_spark

    spark = get_spark(app_name="sf1-probe-gen")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    for name, shifts in SHIFTS.items():
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(COPIES):
            c = df
            for col, step in shifts:
                c = c.withColumn(col, F.col(col) + F.lit(i * step))
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        (out.repartition(32)
            .write.mode("overwrite").parquet(f"{DST}/{name}.parquet"))
        print(f"{name}: x{COPIES} written", file=sys.stderr)
    for name in COPY_AS_IS:
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        df.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
        print(f"{name}: copied", file=sys.stderr)


def run() -> None:
    from hadoop_sync_spark.queries import load_all
    from hadoop_sync_spark.session import get_spark

    registry = load_all()
    spark = get_spark(app_name="sf1-probe-run")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "?")
    out = {}
    for name in PROBES:
        q = registry[name]
        spark.sparkContext.setJobDescription(f"sf1probe:{name}")
        q.fn(spark, DST).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            q.fn(spark, DST).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(samples), 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"cpus": cpus, "sf": "sf1_probe(10x sf0.1)",
                      "noop_median_sec": out, "runs": RUNS}))


if __name__ == "__main__":
    if len(sys.argv) != 2 or sys.argv[1] not in ("gen", "run"):
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    (gen if sys.argv[1] == "gen" else run)()
