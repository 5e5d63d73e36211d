#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [query ...]
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt (round
defaults to r14) for each query (default: the bench.py HEADLINE set).
Planning only — no job execution beyond what persist()-bearing query
constructors trigger, so it is cheap enough to run alongside other
work.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hadoop_sync_spark.queries import load_all  # noqa: E402
from hadoop_sync_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        raise SystemExit(2)
    suffix = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        import bench

        names = bench.HEADLINE
    registry = load_all()
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = (Path(__file__).resolve().parent.parent / "plans"
               / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"))
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = registry[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
