#!/usr/bin/env python
"""Deterministic per-run work counters: jobs / stages / tasks for one
fn()+collect of each named query, via the SparkContext statusTracker
(the round-13 methodology, now a tracked tool).

Usage: python tools/run_counters.py <repo_root> <query> [<query> ...]

Runs one untimed warm-up (codegen + listing caches), then ONE counted
run inside a dedicated job group, and prints a JSON line
{"query": {"jobs": J, "stages": S, "tasks": T, "wall": sec}}.  These
counters are ambient-noise-free — the same code always schedules the
same jobs/stages/tasks at a given SF — which is why optimization rounds
cite them next to wall clock (BASELINE.md documents this box's 1.7x
pure-ambient wall spread)."""

from __future__ import annotations

import json
import os
import sys
import time

root = os.path.abspath(sys.argv[1])
names = sys.argv[2:]
sys.path.insert(0, root)

from hadoop_sync_spark.queries import load_all  # noqa: E402
from hadoop_sync_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

registry = load_all()
spark = get_spark(app_name="run-counters")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
st = sc.statusTracker()

out = {}
for name in names:
    q = registry[name]
    q.fn(spark, SF_DIR).collect()  # warm-up, uncounted
    group = f"count_{name}"
    sc.setJobGroup(group, name)
    t0 = time.perf_counter()
    q.fn(spark, SF_DIR).collect()
    wall = time.perf_counter() - t0
    sc.setJobGroup(None, None)
    jobs = st.getJobIdsForGroup(group)
    stages = set()
    tasks = 0
    tasks_run = 0
    for jid in jobs:
        ji = st.getJobInfo(jid)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = st.getStageInfo(sid)
            if si is not None and sid not in stages:
                stages.add(sid)
                tasks += si.numTasks
                # skipped stages (shuffle output reused) define tasks
                # but never run them — completed counts the real work
                tasks_run += si.numCompletedTasks
    out[name] = {
        "jobs": len(jobs),
        "stages": len(stages),
        "tasks": tasks,
        "tasks_run": tasks_run,
        "wall": round(wall, 3),
    }
print(json.dumps(out))
