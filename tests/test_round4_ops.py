"""Behavioral tests for the round-4 operators on CRAFTED inputs — the
fixture-parity sweep (test_oracle_parity) already cross-checks every
registered query against DuckDB on the fixtures; these tests pin the
semantics on hand-computable cases and on edge shapes the fixtures don't
contain (known triangle counts, dominance ties, out-of-order funnels,
single-event SCD2 runs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# triangle_stats — known graphs
# --------------------------------------------------------------------------
def _tri(spark, edges):
    from hadoop_sync_spark.queries.graph_q import triangle_stats
    from hadoop_sync_spark.queries._util import materialize_and_free

    e0 = spark.createDataFrame(edges, "u long, v long")
    assembled, caches = triangle_stats(e0, persist=True)
    row = materialize_and_free(assembled, caches).first()
    return row["n_nodes"], row["n_edges"], row["n_triangles"]


def test_triangles_k4_complete_graph(spark):
    """K4 has C(4,3) = 4 triangles; every unordered pair is one edge."""
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert _tri(spark, k4) == (4, 6, 4)


def test_triangles_cycle_has_none(spark):
    """C5 (5-cycle) has zero triangles."""
    c5 = [(i, (i + 1) % 5) for i in range(5)]
    n, m, t = _tri(spark, [(min(a, b), max(a, b)) for a, b in c5])
    assert (n, m, t) == (5, 5, 0)


def test_triangles_two_disjoint_triangles_plus_chord(spark):
    """Two disjoint triangles = 2; adding one chord between them creates
    no new triangle."""
    g = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (2, 10)]
    assert _tri(spark, g) == (6, 7, 2)


# --------------------------------------------------------------------------
# pareto_front — brute-force reference on crafted points
# --------------------------------------------------------------------------
def _brute_skyline(points):
    out = []
    for i, (pid, pr, sz) in enumerate(points):
        dominated = any(
            qpr <= pr and qsz <= sz and (qpr < pr or qsz < sz)
            for j, (qid, qpr, qsz) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append((pid, pr, sz))
    return sorted(out)


@pytest.mark.parametrize(
    "points",
    [
        # duplicates of a skyline point both survive
        [(1, 10.00, 5), (2, 10.00, 5), (3, 20.00, 4), (4, 30.00, 9)],
        # strictly increasing staircase: everything survives
        [(1, 10.00, 9), (2, 20.00, 7), (3, 30.00, 5), (4, 40.00, 3)],
        # one point dominates everything
        [(1, 5.00, 1), (2, 10.00, 2), (3, 5.50, 1), (4, 100.00, 100)],
        # same-price chains: within-peer strict dominance only
        [(1, 10.00, 5), (2, 10.00, 4), (3, 10.00, 4), (4, 11.00, 3)],
        # cross-bucket boundary (width 50): 49.99 vs 50.00
        [(1, 49.99, 7), (2, 50.00, 7), (3, 50.00, 6), (4, 120.00, 1)],
    ],
)
def test_pareto_front_matches_brute_force(spark, points):
    from hadoop_sync_spark.queries.relational3 import pareto_front

    pts = spark.createDataFrame(
        points, "p_partkey long, price double, size long"
    )
    got = sorted(
        (r["p_partkey"], r["price"], r["size"])
        for r in pareto_front(pts).collect()
    )
    assert got == _brute_skyline(points)


def test_pareto_front_hypothesis_style_random(spark):
    """200 deterministic pseudo-random points (2-decimal prices) — the
    grid plan must equal brute force exactly."""
    import zlib

    points = []
    for i in range(200):
        h = zlib.crc32(f"pt-{i}".encode())
        price = round((h % 10_000) / 100.0 + 1.0, 2)
        size = (h >> 16) % 50 + 1
        points.append((i, price, size))
    from hadoop_sync_spark.queries.relational3 import pareto_front

    pts = spark.createDataFrame(
        points, "p_partkey long, price double, size long"
    )
    got = sorted(
        (r["p_partkey"], r["price"], r["size"])
        for r in pareto_front(pts).collect()
    )
    assert got == _brute_skyline(points)


# --------------------------------------------------------------------------
# SCD2 / funnel — crafted event streams (hand-computed expectations)
# --------------------------------------------------------------------------
def _mk_events(spark, rows):
    """rows: (event_id, user_id, us, event_type) with us in seconds for
    readability; stored as epoch micros via timestamp_micros."""
    return spark.createDataFrame(
        [
            (eid, uid, etype, us * 1_000_000)
            for eid, uid, us, etype in rows
        ],
        "event_id long, user_id long, event_type string, _us long",
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_micros(F.col("_us")).alias("ts"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )


def test_scd2_runs_collapse_and_intervals_chain(spark, tmp_path):
    """a a b a → three intervals: [t0,t2) type a (2 events), [t2,t3) type
    b, [t3,∞) type a, current."""
    ev = _mk_events(
        spark,
        [
            (1, 7, 100, "a"),
            (2, 7, 200, "a"),
            (3, 7, 300, "b"),
            (4, 7, 400, "a"),
        ],
    )
    out = str(tmp_path / "ev")
    ev.write.parquet(out + "/events.parquet")
    from hadoop_sync_spark.queries import load_all

    rows = sorted(
        (
            r["event_type"],
            r["valid_from_us"] // 1_000_000,
            None if r["valid_to_us"] is None else r["valid_to_us"] // 1_000_000,
            r["n_events"],
            r["is_current"],
        )
        for r in load_all()["q119_scd2_intervals"].fn(spark, out).collect()
    )
    assert rows == sorted(
        [
            ("a", 100, 300, 2, False),
            ("b", 300, 400, 1, False),
            ("a", 400, None, 1, True),
        ]
    )


def test_funnel_purchase_before_signup_does_not_convert(spark, tmp_path):
    """user 1: purchase at t=50 BEFORE signup t=100 → not converted;
    user 2: purchase after signup → converted with exact gap; user 3
    (no signup) absent from the report."""
    ev = _mk_events(
        spark,
        [
            (1, 1, 50, "purchase"),
            (2, 1, 100, "signup"),
            (3, 2, 100, "signup"),
            (4, 2, 160, "purchase"),
            (5, 3, 10, "purchase"),
        ],
    )
    out = str(tmp_path / "ev")
    ev.write.parquet(out + "/events.parquet")
    from hadoop_sync_spark.queries import load_all

    rows = {
        r["user_id"]: (r["converted"], r["gap_us"])
        for r in load_all()["q120_funnel_conversion"].fn(spark, out).collect()
    }
    assert set(rows) == {1, 2}
    assert rows[1] == (False, None)
    assert rows[2] == (True, 60 * 1_000_000)


def test_retention_cohort_counts_distinct_days(spark, tmp_path):
    """A user active twice on one day counts once in that cell; activity
    two days after first-seen lands in age 2."""
    day = 86_400
    ev = _mk_events(
        spark,
        [
            (1, 1, 0 * day + 10, "a"),
            (2, 1, 0 * day + 20, "b"),   # same day — one cell count
            (3, 1, 2 * day + 5, "a"),    # age 2
            (4, 2, 1 * day + 1, "a"),    # cohort day 1, age 0
        ],
    )
    out = str(tmp_path / "ev")
    ev.write.parquet(out + "/events.parquet")
    from hadoop_sync_spark.queries import load_all

    rows = {
        (r["cohort_day"], r["age_days"]): r["active_users"]
        for r in load_all()["q124_retention_cohorts"].fn(spark, out).collect()
    }
    assert rows == {(0, 0): 1, (0, 2): 1, (1, 0): 1}


def test_exact_median_counts_odd_group_middle_twice(spark, tmp_path):
    """q24 regression (round-4 find): an odd-sized group's median must be
    the middle value itself — the old `rn IN (lo, hi)` spelling matched
    the middle row once and then halved it.  Crafted odd group: quantities
    1,2,9 → median 2 (the old formula returned 1.0)."""
    import datetime

    rows = [
        (1, 1, 1.0, "A", datetime.datetime(2024, 1, 1)),
        (2, 1, 2.0, "A", datetime.datetime(2024, 1, 1)),
        (3, 1, 9.0, "A", datetime.datetime(2024, 1, 1)),
        (4, 1, 4.0, "B", datetime.datetime(2024, 1, 1)),
        (5, 1, 6.0, "B", datetime.datetime(2024, 1, 1)),
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_quantity double, "
        "l_returnflag string, l_shipdate timestamp",
    )
    out = str(tmp_path / "li")
    li.write.parquet(out + "/lineitem.parquet")
    from hadoop_sync_spark.queries import load_all

    got = {
        r["l_returnflag"]: (r["median_qty"], r["n"])
        for r in load_all()["q24_exact_median"].fn(spark, out).collect()
    }
    assert got == {"A": (2.0, 3), "B": (5.0, 2)}
