"""Lakehouse interop queries: reading open-table-format metadata with the
engine's own log reader (delta_log.py) and proving snapshot semantics
against the relational oracle.

Reference parity note: the reference's catalog is bespoke
(``CitusMetadataStore.java``); its 2026 successor in any real deployment
is an open table format.  q138 is the VERDICT-r6 "one lakehouse-interop
reader" slot: the Delta transaction log (public PROTOCOL.md) replayed to
a file list that feeds the ordinary distributed parquet scan.
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from hadoop_sync_spark.delta_log import DeltaLog
from hadoop_sync_spark.queries import register
from hadoop_sync_spark.queries._util import t

#: rewrite threshold for the v2 delete-where commit (dollars; compared
#: identically as DOUBLE >= integer literal in both engines)
_REWRITE_MIN = 50000


def _scratch_dir(key: str) -> str:
    h = hashlib.md5(key.encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"hss_delta_{h}")


def _move_single_part(staging: str, dest: str) -> None:
    parts = glob.glob(os.path.join(staging, "part-*.parquet"))
    assert len(parts) == 1, parts
    os.replace(parts[0], dest)
    shutil.rmtree(staging, ignore_errors=True)


def build_orders_delta_fixture(spark: SparkSession, sf_dir: str) -> str:
    """Deterministic 3-commit Delta table over ``orders`` (rebuilt from
    scratch on every call so reruns are idempotent):

    - v0: protocol + metaData + add f0 (bucket 0) + add f1 (bucket 1)
    - v1: add f2 (bucket 2)        [checkpoint written here]
    - v2: remove f1 + add f3 (bucket 1 rows with o_totalprice >=
      {_REWRITE_MIN}) — a delete-where expressed the way Delta writers
      actually express it: rewrite the file, swap via remove+add

    where bucket = o_orderkey % 4 (bucket 3 never enters the table).
    Data files are written by Spark executors; only the KB-scale log is
    driver-side — the production Delta split."""
    scratch = _scratch_dir(os.path.abspath(sf_dir) + "#orders_delta")
    shutil.rmtree(scratch, ignore_errors=True)
    table_dir = os.path.join(scratch, "orders_delta")
    os.makedirs(table_dir)

    src = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    bucket = F.col("o_orderkey") % 4

    def write_file(df: DataFrame, name: str) -> None:
        staging = os.path.join(scratch, "staging_" + name)
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        _move_single_part(staging, os.path.join(table_dir, name))

    write_file(src.filter(bucket == 0), "part-00000-f0.parquet")
    write_file(src.filter(bucket == 1), "part-00001-f1.parquet")
    write_file(src.filter(bucket == 2), "part-00002-f2.parquet")
    write_file(
        src.filter((bucket == 1) & (F.col("o_totalprice") >= _REWRITE_MIN)),
        "part-00003-f3.parquet",
    )

    log = DeltaLog(table_dir)
    log.commit(
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "orders-delta-fixture",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": src.schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                }
            },
            log.add_action_for("part-00000-f0.parquet"),
            log.add_action_for("part-00001-f1.parquet"),
        ],
    )
    log.commit(1, [log.add_action_for("part-00002-f2.parquet")])
    log.write_checkpoint(1)
    log.commit(
        2,
        [
            {"remove": {"path": "part-00001-f1.parquet",
                        "dataChange": True}},
            log.add_action_for("part-00003-f3.parquet"),
        ],
    )
    return table_dir


build_orders_delta_fixture.__doc__ = build_orders_delta_fixture.__doc__.format(
    _REWRITE_MIN=_REWRITE_MIN
)


@register(
    "q138_delta_log_reader",
    oracle=f"""
    WITH b AS (
        SELECT o_orderkey % 4 AS bkt, o_totalprice FROM orders
    )
    SELECT
        CAST(2 AS BIGINT) AS latest_version,
        CAST(3 AS BIGINT) AS n_live_files_latest,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM b
         WHERE bkt IN (0, 2)
            OR (bkt = 1 AND o_totalprice >= {_REWRITE_MIN}))
            AS cnt_latest,
        (SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) FROM b
         WHERE bkt IN (0, 2)
            OR (bkt = 1 AND o_totalprice >= {_REWRITE_MIN}))
            AS cents_latest,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM b WHERE bkt IN (0, 1, 2))
            AS cnt_v1,
        (SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) FROM b WHERE bkt IN (0, 1, 2))
            AS cents_v1
    """,
    tags=("lakehouse", "delta", "time-travel", "interop"),
)
def q138_delta_log_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta Lake interop: build a 3-commit Delta table over ``orders``
    (append, append+checkpoint, delete-where-via-rewrite), then read it
    back with the from-scratch log reader — latest snapshot AND
    version-1 time travel — and aggregate both into one oracle-checked
    row.  The latest-snapshot read seeds from the v1 checkpoint and
    replays only the v2 JSON tail, so checkpoint + tail replay +
    last-writer-wins removal are all on the verified path (the pure-JSON
    replay equivalence is pinned separately in tests/test_delta_log.py).

    Scale: replay is driver-side metadata (KBs/commit, like production
    Delta); the snapshot's live files feed a plain distributed parquet
    scan, so executor-side pushdown/pruning are untouched.  Aggregates
    use the scaled-BIGINT cents idiom for bit-exact cross-engine sums."""
    table_dir = build_orders_delta_fixture(spark, sf_dir)
    log = DeltaLog(table_dir)

    def agg_of(version: int | None, cnt_name: str, cents_name: str):
        return log.read(spark, version).agg(
            F.count("*").alias(cnt_name),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias(cents_name),
        )

    latest = log.latest_version()
    snap = log.snapshot()
    meta = spark.range(1).select(
        F.lit(latest).cast("long").alias("latest_version"),
        F.lit(len(snap.files)).cast("long").alias("n_live_files_latest"),
    )
    # one-row assembly via the union/max-fold idiom (same as the round-7
    # pair-contract epilogue): one job, no bounded-cross nested loops
    cols = (
        "latest_version", "n_live_files_latest",
        "cnt_latest", "cents_latest", "cnt_v1", "cents_v1",
    )

    def _pad(df: DataFrame) -> DataFrame:
        have = set(df.columns)
        return df.select(
            *[
                F.col(c) if c in have
                else F.lit(None).cast("long").alias(c)
                for c in cols
            ]
        )

    return (
        _pad(meta)
        .unionByName(_pad(agg_of(None, "cnt_latest", "cents_latest")))
        .unionByName(_pad(agg_of(1, "cnt_v1", "cents_v1")))
        .agg(*[F.max(c).alias(c) for c in cols])
    )


# --------------------------------------------------------------------------
# q144 — Delta table synced through the registry (A12-A16 over the open
# format)
# --------------------------------------------------------------------------
@register(
    "q144_delta_registry_sync",
    oracle=f"""
    WITH b AS (
        SELECT o_orderkey % 4 AS bkt, o_totalprice FROM orders
    )
    SELECT
        CAST(2 AS BIGINT) AS shards_after_c0,
        CAST(1 AS BIGINT) AS added_c1,
        CAST(1 AS BIGINT) AS added_c2,
        CAST(1 AS BIGINT) AS removed_c2,
        CAST(3 AS BIGINT) AS shards_final,
        TRUE AS resync_noop,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM b
         WHERE bkt IN (0, 2)
            OR (bkt = 1 AND o_totalprice >= {_REWRITE_MIN}))
            AS cnt_live,
        (SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) FROM b
         WHERE bkt IN (0, 2)
            OR (bkt = 1 AND o_totalprice >= {_REWRITE_MIN}))
            AS cents_live
    """,
    tags=("lakehouse", "delta", "registry", "sync", "interop"),
)
def q144_delta_registry_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's incremental-sync workflow (A12-A16: diff the FS
    state against the catalog, apply transactionally, idempotent re-run)
    driven by a DELTA table instead of a raw directory: each Delta
    commit surfaces as ordinary shard adds/removes because
    ``register_delta`` swaps the diff's FS-state source for the log's
    latest snapshot.  Commit-by-commit: c0 (two files) syncs 2 shards;
    c1 (append) diffs as exactly one add; c2 (delete-where rewrite)
    diffs as one add + one remove — the raw directory walk would have
    resurrected the removed file; an immediate re-sync is a noop; and
    the catalog-only read aggregates exactly the live rows (same oracle
    arithmetic as q138).

    Scale: identical posture to q82's sync lifecycle — log replay and
    catalog publish are KB-scale driver metadata, the final read is the
    ordinary distributed scan of the live files."""
    from hadoop_sync_spark.registry import Registry

    scratch = _scratch_dir(os.path.abspath(sf_dir) + "#delta_sync")
    shutil.rmtree(scratch, ignore_errors=True)
    table_dir = os.path.join(scratch, "orders_delta")
    os.makedirs(table_dir)
    meta_dir = os.path.join(scratch, "meta")

    src = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    bucket = F.col("o_orderkey") % 4

    def write_file(df: DataFrame, name: str) -> None:
        staging = os.path.join(scratch, "staging_" + name)
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        _move_single_part(staging, os.path.join(table_dir, name))

    write_file(src.filter(bucket == 0), "part-00000-f0.parquet")
    write_file(src.filter(bucket == 1), "part-00001-f1.parquet")
    write_file(src.filter(bucket == 2), "part-00002-f2.parquet")
    write_file(
        src.filter((bucket == 1) & (F.col("o_totalprice") >= _REWRITE_MIN)),
        "part-00003-f3.parquet",
    )

    log = DeltaLog(table_dir)
    reg = Registry(spark, meta_dir)

    log.commit(
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "orders-delta-sync",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": src.schema.json(),
                    "partitionColumns": [],
                    "configuration": {},
                }
            },
            log.add_action_for("part-00000-f0.parquet"),
            log.add_action_for("part-00001-f1.parquet"),
        ],
    )
    reg.register_delta("orders_delta", table_dir)
    reg.sync("orders_delta")
    shards_after_c0 = len(reg.shards("orders_delta"))

    log.commit(1, [log.add_action_for("part-00002-f2.parquet")])
    s1 = reg.sync("orders_delta")

    log.commit(
        2,
        [
            {"remove": {"path": "part-00001-f1.parquet",
                        "dataChange": True}},
            log.add_action_for("part-00003-f3.parquet"),
        ],
    )
    s2 = reg.sync("orders_delta")
    shards_final = len(reg.shards("orders_delta"))
    noop = reg.sync("orders_delta").noop

    live = reg.read("orders_delta").agg(
        F.count("*").alias("cnt_live"),
        F.sum(
            F.round(F.col("o_totalprice") * 100).cast("long")
        ).alias("cents_live"),
    )
    meta = spark.range(1).select(
        F.lit(shards_after_c0).cast("long").alias("shards_after_c0"),
        F.lit(s1.added).cast("long").alias("added_c1"),
        F.lit(s2.added).cast("long").alias("added_c2"),
        F.lit(s2.removed).cast("long").alias("removed_c2"),
        F.lit(shards_final).cast("long").alias("shards_final"),
        F.lit(bool(noop)).alias("resync_noop"),
    )
    cols = {
        "shards_after_c0": "long",
        "added_c1": "long",
        "added_c2": "long",
        "removed_c2": "long",
        "shards_final": "long",
        "resync_noop": "boolean",
        "cnt_live": "long",
        "cents_live": "long",
    }

    def _pad(df: DataFrame) -> DataFrame:
        have = set(df.columns)
        return df.select(
            *[
                F.col(c) if c in have else F.lit(None).cast(tp).alias(c)
                for c, tp in cols.items()
            ]
        )

    return (
        _pad(meta)
        .unionByName(_pad(live))
        .agg(*[F.max(c).alias(c) for c in cols])
    )
