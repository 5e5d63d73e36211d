"""Mergeable per-key aggregate state — the incremental-ETL face of
Spark's internal partial aggregation.

Spark merges partial aggregates within one job automatically; a 100 TB
pipeline ALSO needs partials that live ACROSS jobs: per-source statistics
maintained as a small materialized state table, updated from each new
batch without rescanning the corpus (the aggregate analogue of the
registry's incremental diff-sync and q99's incremental dedup).  That
works only for aggregates whose state is mergeable — count/sum/min/max
directly, mean via (sum, count) — and the merge must be associative,
commutative, and identity-tolerant so batch arrival order never matters.

Usage::

    state = agg_state(batch1, ["source"])          # small, materialize it
    state = merge_agg_states(state, agg_state(batch2, ["source"]))
    # == agg_state(batch1 ∪ batch2, ["source"])    # property-tested

Scale: each ``agg_state`` is one partial+final aggregation of its batch;
``merge_agg_states`` aggregates STATE rows only (key-cardinality — at
100 TB that's the dimension table, not the corpus).  Derived metrics
(mean) are computed from the merged state, never merged themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: state columns produced per measure m: m_cnt, m_sum, m_min, m_max
_SUFFIXES = ("cnt", "sum", "min", "max")


def agg_state(df: DataFrame, keys: list[str], measures: list[str]) -> DataFrame:
    """Per-key mergeable state for each measure column: non-null count,
    sum, min, max (sum over 2-decimal doubles should be pre-scaled by the
    caller if exactness across merges is required — the _util.scaled
    idiom composes)."""
    aggs = []
    for m in measures:
        aggs += [
            F.count(m).alias(f"{m}_cnt"),
            F.sum(m).alias(f"{m}_sum"),
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_agg_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two state tables (same schema): counts/sums add, mins/maxes
    fold.  Associative + commutative; a key present in only one input
    passes through unchanged (identity-tolerant), so states can arrive
    in any order and any grouping."""
    keys = [c for c in a.columns if not c.rsplit("_", 1)[-1] in _SUFFIXES]
    measures = list(
        dict.fromkeys(  # ordered-unique: preserve a's column order
            c.rsplit("_", 1)[0] for c in a.columns if c not in keys
        )
    )
    merged = a.unionByName(b)
    aggs = []
    for m in measures:
        aggs += [
            F.sum(f"{m}_cnt").alias(f"{m}_cnt"),
            F.sum(f"{m}_sum").alias(f"{m}_sum"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
        ]
    return merged.groupBy(*keys).agg(*aggs)


def state_mean(state: DataFrame, measure: str) -> DataFrame:
    """Derived mean from merged state — computed at read time, never
    merged (a mean is not mergeable; its (sum, count) state is)."""
    return state.withColumn(
        f"{measure}_mean",
        F.col(f"{measure}_sum").cast("double") / F.col(f"{measure}_cnt"),
    )
