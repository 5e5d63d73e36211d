"""Out-of-CI deep sweep of the DML sequence fuzzer.

The pytest suite pins a handful of seeds as regression anchors; bug
HUNTING wants breadth.  This drives `tests/test_dml_fuzz.py`'s
runners over a seed range in one JVM, mixing the mapped / partitioned
/ DDL-triple variants the same way the round-11 sessions did::

    python tools/dml_fuzz_sweep.py 100 120            # twin sequences
    python tools/dml_fuzz_sweep.py 300 312 --ddl      # mapped DDL triple
    python tools/dml_fuzz_sweep.py 700 716 --ice-ddl  # Iceberg DDL triple
    python tools/dml_fuzz_sweep.py 100 120 --ops 14

Seed mixing for the twin mode: seed % 4 == 3 runs column-mapped Delta,
seed % 4 == 2 runs identity-partitioned (no merges).  Exit 0 = all
green; failures print their seed + the model-divergence context, so a
find reproduces with `_run_sequence(spark, tmp, SEED, ...)` alone.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import tempfile
import traceback

_REPO = str(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)
sys.path.insert(0, str(pathlib.Path(_REPO) / "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("start", type=int)
    ap.add_argument("stop", type=int)
    ap.add_argument("--ops", type=int, default=12)
    ap.add_argument("--ddl", action="store_true",
                    help="mapped-Delta DDL-triple sequences instead "
                         "of format-twin sequences")
    ap.add_argument("--ice-ddl", action="store_true",
                    help="Iceberg DDL-triple sequences")
    ap.add_argument("--stream", action="store_true",
                    help="compose streaming micro-batch appends into "
                         "the twin sequences (unmapped/unpartitioned "
                         "only — the faces' documented seams); odd "
                         "seeds add rollbacks")
    args = ap.parse_args()

    from hadoop_sync_spark.session import get_spark

    from test_dml_fuzz import (
        _run_delta_ddl_sequence,
        _run_iceberg_ddl_sequence,
        _run_sequence,
    )

    spark = get_spark(app_name="dml-fuzz-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    fails: list[int] = []
    total = 0
    for seed in range(args.start, args.stop):
        total += 1
        tmp = pathlib.Path(tempfile.mkdtemp(prefix="dmlfz_"))
        try:
            if args.ice_ddl:
                _run_iceberg_ddl_sequence(spark, tmp, seed, args.ops)
                print(f"seed {seed} ice-ddl: OK", flush=True)
            elif args.ddl:
                _run_delta_ddl_sequence(spark, tmp, seed, args.ops)
                print(f"seed {seed} ddl: OK", flush=True)
            elif args.stream:
                rb = seed % 2 == 1
                part = seed % 3 == 0
                _run_sequence(spark, tmp, seed, args.ops, mapped=False,
                              with_rollback=rb, with_stream=True,
                              partitioned=part,
                              partitioned_merge=part)
                print(f"seed {seed} stream rollback={rb} "
                      f"part={part}: OK", flush=True)
            else:
                mapped = seed % 4 == 3
                part = seed % 4 == 2
                _run_sequence(spark, tmp, seed, args.ops, mapped=mapped,
                              partitioned=part)
                print(f"seed {seed} mapped={mapped} part={part}: OK",
                      flush=True)
        except Exception:
            fails.append(seed)
            tb = traceback.format_exc().splitlines()
            print(f"seed {seed}: FAIL", file=sys.stderr)
            print("\n".join(tb[-10:]), file=sys.stderr)
    print(f"{total - len(fails)}/{total} green"
          + (f"; FAILURES: {fails}" if fails else ""))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
