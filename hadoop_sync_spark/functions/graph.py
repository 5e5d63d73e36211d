"""Iterative graph algorithms on DataFrames: connected components.

Near-dup detection (MinHash/SimHash/embedding pairs) emits EDGES; dedup
needs GROUPS — "keep one document per duplicate cluster" is connected
components over the similarity graph.  This is the one operator family in
the engine that is inherently iterative: each round is pure DataFrame ops
(join + union + min-aggregate), driven to fixpoint by a driver loop.

Algorithm: minimum-label propagation — every node's label starts as its own
id; each round, labels flow across edges and each node keeps the minimum
seen.  Converges in O(diameter) rounds; duplicate clusters from near-dup
detection are tiny and dense (diameter ≤ ~3), so 3-5 rounds is typical.

Scale notes:
- each round is ONE shuffle round-trip (edge⋈label join + min-agg);
- ``localCheckpoint`` truncates lineage every round — without it the plan
  doubles per iteration and Catalyst analysis dominates by round ~8;
- for web-scale graphs with long chains, the round count is the bottleneck
  and the published fix is the alternating large-star/small-star algorithm
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14), which converges in O(log² n); the driver loop below is the
  same skeleton with a different message rule, so the upgrade is local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components of an undirected graph given as an edge list.

    Returns (node, component) where component = the minimum node id
    reachable from `node` (a canonical, deterministic cluster id).
    Isolated nodes don't appear in the edge list and so don't appear in
    the output — callers union them back if every row needs a label.

    Raises RuntimeError if `max_iter` rounds don't reach the fixpoint
    (pathologically long chains — see module docstring for the
    large-star/small-star upgrade path)."""
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    # undirected: keep both directions so one join propagates both ways
    bidir = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    bidir = bidir.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint()

    labels = (
        bidir.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # labels flow one hop: neighbor's current component reaches `node`
        msgs = bidir.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "component")
        # carry the previous label through the min-agg so the fixpoint
        # check is a shuffle-free scan of the SAME checkpointed frame —
        # one materialized shuffle job per round instead of two (both the
        # agg and the old-label join partition on `node`, so the join
        # rides the agg's exchange)
        stepped = (
            labels.select("node", "component")
            .union(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .join(labels.withColumnRenamed("component", "old"), "node")
            .localCheckpoint()  # truncate lineage: plan would double/round
        )
        changed = (
            stepped.filter(F.col("component") != F.col("old")).limit(1).count()
        )
        labels = stepped.select("node", "component")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "graph has very long chains — switch to large-star/small-star"
    )
