"""Z-order clustering: correctness (lossless write) and the actual point —
file-level min/max footprints must allow skipping on BOTH clustered
columns, where a single-column sort only prunes its own column."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from hadoop_sync_spark.functions.zorder import write_zordered, zorder_value
from pyspark.sql import functions as F

N_FILES = 16


def _file_ranges(path: str, cols: list[str]) -> list[dict]:
    """Per-file [min,max] of each column from parquet footers — what a
    scan planner (or the registry's prune_files) would consult."""
    out = []
    for fname in sorted(os.listdir(path)):
        if fname.startswith((".", "_")) or not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        schema_names = md.schema.names
        rng = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                name = schema_names[ci]
                if name not in cols:
                    continue
                st = md.row_group(rg).column(ci).statistics
                lo, hi = rng.get(name, (None, None))
                rng[name] = (
                    st.min if lo is None else min(lo, st.min),
                    st.max if hi is None else max(hi, st.max),
                )
        out.append(rng)
    return out


def _avg_overlap(ranges: list[dict], col: str, points: list[int]) -> float:
    """Average fraction of files whose [min,max] contains a probe point —
    the expected scan fan-out for an equality predicate."""
    hits = 0
    for p in points:
        hits += sum(1 for r in ranges if r[col][0] <= p <= r[col][1])
    return hits / (len(points) * len(ranges))


def test_zorder_write_is_lossless(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = str(tmp_path / "z")
    write_zordered(li, ["l_orderkey", "l_partkey"], out, N_FILES)
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    a = sorted(map(tuple, li.select("l_orderkey", "l_linenumber").collect()))
    b = sorted(map(tuple, back.select("l_orderkey", "l_linenumber").collect()))
    assert a == b


def test_zorder_prunes_both_columns(spark, sf_dir, tmp_path):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_orderkey", "l_partkey"]
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(li, cols, zdir, N_FILES)
    # baseline: the best single-column layout — range-sorted by orderkey
    (
        li.repartitionByRange(N_FILES, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.parquet(ldir)
    )
    zr, lr = _file_ranges(zdir, cols), _file_ranges(ldir, cols)
    assert len(zr) == len(lr) == N_FILES

    probes = {
        c: [r[0] for r in li.select(c).distinct().limit(50).collect()]
        for c in cols
    }
    # the linear layout prunes orderkey perfectly and partkey not at all
    lin_order = _avg_overlap(lr, "l_orderkey", probes["l_orderkey"])
    lin_part = _avg_overlap(lr, "l_partkey", probes["l_partkey"])
    z_order_ov = _avg_overlap(zr, "l_orderkey", probes["l_orderkey"])
    z_part = _avg_overlap(zr, "l_partkey", probes["l_partkey"])

    assert lin_part > 0.9  # single-column sort: partkey predicates scan ~all
    # z-order must prune meaningfully on BOTH columns: a 16-file layout
    # with 8-bit buckets keeps each file inside a fraction of each axis
    assert z_order_ov < 0.6
    assert z_part < 0.6
    # and the combined (sum) fan-out beats the linear layout's
    assert z_order_ov + z_part < lin_order + lin_part


def test_zorder_value_is_deterministic_and_bounded(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000)
    z = zorder_value(li, ["l_orderkey", "l_partkey"], bits=8)
    rows = li.select(z.alias("z")).agg(
        F.min("z").alias("mn"), F.max("z").alias("mx")
    ).collect()[0]
    assert 0 <= rows["mn"] <= rows["mx"] < (1 << 16)
