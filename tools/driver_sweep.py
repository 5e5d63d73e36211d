"""Vanilla-session driver-contract sweep — the verify recipe as a tool.

Every round, library changes that touch shared read paths require
re-verifying the driver window through the EXACT contract the driver
runs: a vanilla SparkSession (none of the engine's tuned conf), each
``__spark_entry__.queries()`` entry at sf0.01 against its
``oracle_sql()`` on DuckDB views over the same parquet, compared with
``tests/conftest.py``'s canonical multiset (column-sort + cell
stringify + row-sort).  Sessions kept rewriting this inline; this is
the same script, tracked.

Usage::

    python tools/driver_sweep.py                 # the 50-query window
    python tools/driver_sweep.py --all           # every registered query
    python tools/driver_sweep.py q148 q149       # by prefix or exact
    python tools/driver_sweep.py --sf-dir /root/testdata/sf0.001

Exit 0 = all green; 1 = any mismatch/error (each printed with its
traceback tail).  Queries with no oracle entry run rows-only, exactly
like the driver's weaker check.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*",
                    help="query names (exact or prefix); default = the "
                         "driver window (first 50 registry entries)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true",
                    help="sweep every registered query")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from conftest import compare_frames  # tests/conftest.py
    from hadoop_sync_spark.compat.protobuf_shim import ensure_protobuf
    from hadoop_sync_spark.io import TABLES, table_path

    ensure_protobuf()
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    if args.all and args.names:
        # silently running the full (slow) sweep when the user named
        # specific queries would hide their typo behind exit 0
        print("--all and query names are mutually exclusive",
              file=sys.stderr)
        return 1
    if args.all:
        names = list(qs)
    elif args.names:
        names = [n for n in qs
                 if n in args.names
                 or any(n.startswith(p) for p in args.names)]
        missing = [p for p in args.names
                   if not any(n == p or n.startswith(p) for n in qs)]
        if missing:
            print(f"no such queries: {missing}", file=sys.stderr)
            return 1
    else:
        names = list(qs)[:50]

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet("
            f"'{table_path(args.sf_dir, t)}')"
        )

    fails: list[str] = []
    t_all = time.time()
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            df = qs[name](spark, args.sf_dir)
            sql = osql.get(name)
            if sql is None:
                n = df.count()
                status = f"rows-only ({n} rows)"
            else:
                n = compare_frames(df, con.sql(sql), name)
                status = f"ok ({n} rows)"
        except Exception:
            fails.append(name)
            status = "FAIL"
            tb = traceback.format_exc().splitlines()
            print("\n".join(tb[-12:]), file=sys.stderr)
        print(f"[{i:3d}/{len(names)}] {name}: {status} "
              f"({time.time() - t0:.1f}s)", flush=True)

    print(f"\n{len(names) - len(fails)}/{len(names)} green "
          f"in {time.time() - t_all:.0f}s"
          + (f"; FAILURES: {fails}" if fails else ""))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
