#!/usr/bin/env python
"""Same-boot A/B timing helper (BASELINE.md §3 protocol, one repo root).

Usage: python tools/ab_time.py <repo_root> <query> [<query> ...]

Runs each named query at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
under the bench.py protocol — one untimed warm-up then the median of
$SPARK_GRAFT_BENCH_RUNS (default 3) warm runs — and prints one JSON line.
Meant to be invoked as a subprocess per repo version so two checkouts of
the engine can be interleaved on the same boot without import collisions.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

root = os.path.abspath(sys.argv[1])
names = sys.argv[2:]
sys.path.insert(0, root)

from hadoop_sync_spark.queries import load_all  # noqa: E402
from hadoop_sync_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

registry = load_all()
spark = get_spark(app_name="ab-time")
spark.sparkContext.setLogLevel("ERROR")

out = {}
for name in names:
    q = registry[name]
    q.fn(spark, SF_DIR).collect()
    samples = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        q.fn(spark, SF_DIR).collect()
        samples.append(time.perf_counter() - t0)
    out[name] = {
        "median": round(statistics.median(samples), 4),
        "samples": [round(s, 4) for s in samples],
    }
print(json.dumps({"root": root, "queries": out}))
