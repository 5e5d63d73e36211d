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
- for web-scale graphs with long chains, the round count is the bottleneck;
  :func:`connected_components_star` implements the published fix — the
  alternating large-star/small-star algorithm (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14), O(log² n) rounds —
  verified equivalent to label propagation on random graphs and a
  400-node chain (tests/test_dedup.py).  Pick by graph shape: label
  propagation for tiny-diameter dup clusters (fewer shuffles per round),
  star for long-chain graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _tracked_ckpt(df: DataFrame) -> tuple[DataFrame, list]:
    """``localCheckpoint`` plus the underlying persisted-RDD handles.

    The checkpoint cache is RDD-level: ``DataFrame.unpersist()`` only
    talks to the Catalyst cache manager and is a NO-OP for it (verified
    empirically), so without handle bookkeeping every loop round leaks
    one MEMORY_AND_DISK cache until session shutdown.  The handles come
    from diffing ``sc.getPersistentRDDs()`` around the checkpoint call —
    exact under the single driver thread that runs these loops (a
    concurrent checkpoint from another thread could be mis-attributed;
    these loops are driver-sequential by construction).

    DANGER: freeing a handle makes ITS OWN frame unusable
    (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on next use — lineage was
    truncated, there is nothing to recompute from).  Only free a round's
    handles once a LATER checkpoint has materialized and no live frame
    references it."""
    sc = df.sparkSession.sparkContext
    jmap = sc._jsc.getPersistentRDDs()
    before = {int(k) for k in jmap.keySet().toArray()}
    out = df.localCheckpoint()
    jmap = sc._jsc.getPersistentRDDs()
    handles = [
        jmap.get(k)
        for k in jmap.keySet().toArray()
        if int(k) not in before
    ]
    return out, handles


def _free(handles: list) -> None:
    for h in handles:
        h.unpersist(False)


class _HandlePool:
    """Exit-path-safe registry of live checkpoint handle-lists.

    The iterative loops below hold 1-3 live checkpoints at a time and free
    each as soon as a later one materializes; that success-path hygiene
    used to leak every live handle on the non-convergence RuntimeError or
    any mid-loop exception (round-3 advice).  The pool makes release
    structural: hold() on creation, drop() when dead, keep() for the one
    checkpoint the returned DataFrame still references, and a finally-
    drain() frees whatever survives on EVERY exit path.  Membership is by
    identity — handle lists wrap py4j JavaObjects whose __eq__ would cross
    the gateway."""

    def __init__(self) -> None:
        self._live: dict[int, list] = {}

    def hold(self, handles: list) -> list:
        self._live[id(handles)] = handles
        return handles

    def drop(self, handles: list | None) -> None:
        if handles is not None and id(handles) in self._live:
            _free(self._live.pop(id(handles)))

    def keep(self, handles: list | None) -> None:
        """Forget without freeing (the result's own checkpoint)."""
        if handles is not None:
            self._live.pop(id(handles), None)

    def drain(self) -> None:
        for h in self._live.values():
            _free(h)
        self._live.clear()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    with_handles: bool = False,
) -> DataFrame | tuple[DataFrame, list]:
    """Connected components of an undirected graph given as an edge list.

    Returns (node, component) where component = the minimum node id
    reachable from `node` (a canonical, deterministic cluster id).
    Isolated nodes don't appear in the edge list and so don't appear in
    the output — callers union them back if every row needs a label.

    ``with_handles=True`` additionally returns the result's live
    checkpoint handles so a caller that MATERIALIZES the result (the
    contract rows) can release the one cache that must otherwise outlive
    this function.

    Raises RuntimeError if `max_iter` rounds don't reach the fixpoint
    (pathologically long chains — see module docstring for the
    large-star/small-star upgrade path)."""
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    pool = _HandlePool()
    try:
        # undirected: keep both directions so one join propagates both ways
        bidir = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        bidir, bidir_h = _tracked_ckpt(
            bidir.filter(F.col("src") != F.col("dst")).distinct()
        )
        pool.hold(bidir_h)

        labels, prev_h = _tracked_ckpt(
            bidir.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
        )
        pool.hold(prev_h)
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
            stepped, step_h = _tracked_ckpt(  # truncate lineage per round
                labels.select("node", "component")
                .union(msgs)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
                .join(labels.withColumnRenamed("component", "old"), "node")
            )
            pool.hold(step_h)
            # the new checkpoint materialized eagerly, so the previous
            # round's is dead — free it (one leaked cache per round
            # otherwise)
            pool.drop(prev_h)
            prev_h = step_h
            changed = (
                stepped.filter(F.col("component") != F.col("old"))
                .limit(1)
                .count()
            )
            labels = stepped.select("node", "component")
            if changed == 0:
                # the result references only the final checkpoint — it
                # outlives the pool; everything else (bidir) drains below
                pool.keep(prev_h)
                return (labels, prev_h) if with_handles else labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "graph has very long chains — switch to large-star/small-star"
        )
    finally:
        # every exit path — convergence, non-convergence RuntimeError, or
        # any mid-loop exception — releases the still-live checkpoints
        pool.drain()


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    with_handles: bool = False,
) -> DataFrame | tuple[DataFrame, list]:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the O(log² n)-round algorithm for graphs whose DIAMETER,
    not just size, is large (web-graph chains, linked citation series),
    where :func:`connected_components`'s one-hop label propagation would
    need O(diameter) rounds.

    Per round, two phases of (groupBy-min + same-key join + distinct):

    - **large-star** (keyed by every endpoint `u`): attach every
      strictly-larger neighbor of `u` to `m = min(Γ(u) ∪ {u})`;
    - **small-star** (each edge keyed by its LARGER endpoint `u`, so
      Γ⁻(u) is the smaller neighbors): attach `u` and all of Γ⁻(u)
      to `m = min(Γ⁻(u) ∪ {u})`.

    The fixpoint is a star forest — every edge points directly at its
    component's minimum id — detected with an order-insensitive
    (count, xxhash64-sum) digest of the edge set (the q97 anti-entropy
    idiom).  Digest equality is a FILTER, not the verdict: because the
    digest gates the loop BREAK, a collision between two different
    consecutive edge sets would otherwise terminate early on a
    non-converged set; so equality is confirmed with one exact
    ``exceptAll`` probe before breaking (counts already matched via the
    digest, so an empty difference proves set equality).  Returns
    (node, component) with the same contract as
    :func:`connected_components`.

    Scale: both phases shuffle on the grouping key and the edge set
    shrinks monotonically toward n−1 star edges; `localCheckpoint` per
    phase truncates lineage exactly as in the label-propagation loop."""
    e = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    ).filter(F.col("a") != F.col("b"))
    pool = _HandlePool()
    try:
        labels, handles = _star_loop(e, max_iter, pool)
        return (labels, handles) if with_handles else labels
    finally:
        pool.drain()


def _star_loop(
    e: DataFrame, max_iter: int, pool: _HandlePool
) -> tuple[DataFrame, list]:
    cur, cur_h = _tracked_ckpt(e.distinct())
    pool.hold(cur_h)

    def digest(df: DataFrame) -> tuple:
        # overflow-proof set digest (the q97 anti-entropy idiom): XOR-fold
        # never overflows, and the additive fold sums 32-bit slices so it
        # stays < 2^63 to ~4e9 edges — a bare SUM(xxhash64) is a random
        # walk with step ~2^63 that overflows ANSI-mode long arithmetic
        # after a few hundred edges
        h = F.xxhash64(F.col("a"), F.col("b"))
        row = df.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("hx"),
            F.sum(h.bitwiseAND(F.lit(0xFFFFFFFF).cast("long"))).alias("hs"),
        ).first()
        return (row["n"], row["hx"], row["hs"])

    prev = None
    prev_cur: DataFrame | None = None
    prev_cur_h: list | None = None
    for _ in range(max_iter):
        last_h = cur_h
        last_was_prev = cur is prev_cur
        # ---- large-star: key = u over BOTH directions
        bidir = cur.union(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins = bidir.groupBy("a").agg(F.min("b").alias("mb"))
        m = F.least(F.col("a"), F.col("mb"))
        cur, ls_h = _tracked_ckpt(
            bidir.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), m.alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        pool.hold(ls_h)
        # ---- small-star: key = larger endpoint, neighbors are smaller
        directed = cur.select(
            F.greatest(F.col("a"), F.col("b")).alias("a"),
            F.least(F.col("a"), F.col("b")).alias("b"),
        )
        mins = directed.groupBy("a").agg(F.min("b").alias("mb"))
        attach, at_h = _tracked_ckpt(
            directed.join(mins, "a")
            .select(F.col("b").alias("a"), F.col("mb").alias("b"))
            .union(mins.select(F.col("a"), F.col("mb").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        pool.hold(at_h)
        cur = attach
        cur_h = at_h
        # attach materialized, so the large-star intermediate is dead; the
        # round-entry checkpoint is too UNLESS the convergence probe below
        # still references it as prev_cur
        pool.drop(ls_h)
        if not last_was_prev:
            pool.drop(last_h)
        d = digest(cur)
        # digest equality is necessary, not sufficient: confirm with one
        # exact set probe (both frames are distinct and counts matched in
        # the digest, so empty difference ⇒ equal sets) — a digest
        # collision then just costs one extra probe, never a wrong result
        if (
            d == prev
            and prev_cur is not None
            and cur.exceptAll(prev_cur).limit(1).count() == 0
        ):
            pool.drop(prev_cur_h)  # result is built from cur alone
            break
        prev = d
        if prev_cur_h is not None:
            pool.drop(prev_cur_h)
        prev_cur = cur
        prev_cur_h = cur_h
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} rounds"
        )
    # star forest: every edge is (node -> component root); roots label
    # themselves.  The result references cur's checkpoint — it outlives
    # the caller's drain(); the handles ride back so a materializing
    # caller can release it
    pool.keep(cur_h)
    labels = (
        cur.select(F.col("a").alias("node"), F.col("b").alias("component"))
        .union(
            cur.select(F.col("b").alias("node"), F.col("b").alias("component"))
        )
        .distinct()
    )
    return labels, cur_h
