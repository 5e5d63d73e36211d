"""Skew-handling primitives: salted two-phase aggregation and salted
broadcast-backed joins — the 100 TB posture for hot keys (SURVEY §2C).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) handles *join*
skew at runtime; these helpers cover the cases AQE does not: hot-key
aggregation fan-in and deliberate pre-salting when key histograms are
known ahead of time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: default salt fan-out; ~2-4× cores is a good starting point
DEFAULT_SALT = 32


def with_salt(df: DataFrame, buckets: int = DEFAULT_SALT) -> DataFrame:
    """Attach a uniform `_salt` column.

    Derived from the row's POSITION (`monotonically_increasing_id`), not
    `rand()` and not a hash of the row's content:

    - rand() drifts under task retry (the recomputed row may land in a
      different bucket → double counting);
    - a content hash collapses on DUPLICATE rows — the exact hot-key shape
      salting exists for (e.g. counting events per user on a projected
      `(user_id)` frame: every hot-key row is identical, so all of them
      hash to ONE salt bucket and the reducer fan-in is unchanged);
    - mono-id is deterministic for a given input partitioning (partition
      index ≪ 33 | row position), survives task retry, and cycles rows
      evenly across buckets."""
    return df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(buckets))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    final_aggs: list[Column],
    buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups on (keys..., _salt) — the hot key's rows spread over
    `buckets` reducers; phase 2 re-aggregates the per-salt partials on the
    bare keys (tiny input: |groups| × buckets rows).  `aggs` are the
    partial aggregates (must be decomposable: sum/count/min/max), and
    `final_aggs` re-combine the partial columns by name.

    Note Spark's built-in partial aggregation (map-side combine) already
    bounds shuffle volume per *task*; salting additionally bounds the
    per-*reducer* fan-in when one key dominates the dataset — the case
    where a single reducer otherwise receives O(hot key share) of all
    partial rows.
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(*aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Skew-proof equi join: salt the skewed fact side, explode the small
    side into every salt bucket, join on (key, salt).  The hot key's rows
    land on `buckets` different reducers instead of one.

    The small side is replicated ×buckets, so it must be dimension-sized
    (the same precondition as a broadcast join; prefer plain broadcast
    when the small side fits — this helper exists for the middle ground
    where the dim is too big to broadcast but the fact key is skewed)."""
    sk = with_salt(skewed, buckets)
    sm = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return sk.join(sm, on=[key, "_salt"]).drop("_salt")
