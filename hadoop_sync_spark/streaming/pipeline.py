"""Streaming pipelines over the `events` table.

The reference's defining loop — *new HDFS blocks appear, a sync notices only
the difference and makes them queryable* (`README.md:10-13`,
`HdfsSynchronizer.java:142-205`) — is exactly Structured Streaming's file
source: each micro-batch processes only files not yet recorded in the
checkpoint's file log, `Trigger.AvailableNow` gives the reference's
run-to-completion CLI semantics, and the checkpoint plays the role of the
Citus catalog (exactly-once bookkeeping of what's been absorbed).

Batch twins of every computation here are registered as oracle-checked
queries (q40-q43); the streaming tests assert stream == batch at
end-of-input, which is Structured Streaming's correctness contract.

Scale posture: stateful operators (windows, dedup, sessions) shuffle on
their state key exactly once per micro-batch; watermarks bound state size —
without them a 100 TB/day stream accretes state forever.  Every operator
below takes an explicit watermark for that reason.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

def _events_schema(ts_type) -> StructType:
    """File-source schema for `events` — streaming reads require an explicit
    schema.  The fixture generator has shipped `ts` as parquet
    TIMESTAMP(NANOS) (long via nanosAsLong) and as naive TIMESTAMP(US)
    (timestamp_ntz); the on-disk type is probed at stream construction."""
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def stream_events(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int = 64,
    path_glob_filter: str | None = None,
) -> DataFrame:
    """File-source stream of events with a proper event-time column.

    ``maxFilesPerTrigger`` keeps micro-batches bounded when a backlog of
    files exists (the 100 TB catch-up case).  The source path must be a
    DIRECTORY (file-source contract); `path_glob_filter` narrows to
    matching files when the directory holds several tables (the fixture
    layout).

    `ts` is canonicalized to TimestampType (naive wall clock pinned as a
    UTC instant), matching hadoop_sync_spark.io.load_table, whichever
    encoding the files carry.  The encoding is probed from the parquet
    footers with a batch read (metadata-only, no data scan)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = spark.read
    if path_glob_filter is not None:
        probe = probe.option("pathGlobFilter", path_glob_filter)
    ts_type = probe.parquet(events_dir).schema["ts"].dataType

    reader = spark.readStream.schema(_events_schema(ts_type)).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if path_glob_filter is not None:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    raw = reader.parquet(events_dir)
    if isinstance(ts_type, LongType):
        # nanos-since-epoch → micros (integer division: exact above 2^53 ns)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if isinstance(ts_type, TimestampNTZType):
        return raw.withColumn("ts", F.to_utc_timestamp("ts", "UTC"))
    return raw


def windowed_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling/sliding event-time window counts with late-data handling.

    The watermark lets Spark finalize (and in append mode emit/evict)
    windows older than max(event_time) − delay: bounded state, late rows
    beyond the delay are dropped — SURVEY §2C's late-data contract."""
    w = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("event_cnt"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_cnt",
            "sum_value",
        )
    )


def sessionized(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user session windows (30-min inactivity gap) — the built-in
    session_window operator; state merges adjacent micro-batch sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("event_cnt"), F.max("ts").alias("last_event"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "last_event",
            "event_cnt",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful exactly-once dedup on event_id within the watermark horizon
    (`dropDuplicates` keyed state; SURVEY §2C).  The watermark bounds the
    dedup state — the difference between "works in the demo" and "OOMs on
    day three of a real stream"."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def dedup_stream_within_watermark(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Dedup via ``dropDuplicatesWithinWatermark`` — the Spark 3.5+ form
    whose state EVICTS on the watermark even though the event-time column
    is NOT part of the dedup key.  Plain ``dropDuplicates(["event_id"])``
    only expires state if the key includes the watermark column;
    within-watermark dedup keeps the key natural (event_id alone) while
    still bounding state to the late-data horizon — duplicates are only
    guaranteed collapsed when they arrive within the watermark delay of
    the first occurrence, exactly the at-least-once-source contract.

    Scale: state is one row per distinct in-horizon key, shuffled once on
    the key per micro-batch; eviction is watermark-driven so day-three
    state size tracks the horizon, not the stream's lifetime."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def sessionized_with_state(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState`` —
    the escape hatch for stateful logic session_window can't express
    (here: per-session value sum + event count with explicit state
    management, the pattern for custom counters/CRDTs/model state).

    Arrow-batched per group; state is one dict per user carrying the open
    session.  Emits one row per *closed* session; event-time timeout closes
    the final session at end-of-input."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start_us", LongType()),
            StructField("session_end_us", LongType()),
            StructField("event_cnt", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("end_us", LongType()),
            StructField("cnt", LongType()),
            StructField("total", DoubleType()),
        ]
    )
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        closed = []
        if state.exists:
            start_us, end_us, cnt, total = state.get
        else:
            start_us = end_us = cnt = None
            total = 0.0
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                t_us = int(ts.value // 1000)  # pandas ns → µs
                if start_us is None:
                    start_us, end_us, cnt, total = t_us, t_us, 1, float(value)
                elif t_us - end_us >= gap_us:
                    closed.append((user_id, start_us, end_us, cnt, total))
                    start_us, end_us, cnt, total = t_us, t_us, 1, float(value)
                else:
                    end_us, cnt, total = t_us, cnt + 1, total + float(value)
        if state.hasTimedOut:
            if start_us is not None:
                closed.append((user_id, start_us, end_us, cnt, total))
            state.remove()
        elif start_us is not None:
            state.update((start_us, end_us, cnt, total))
            state.setTimeoutTimestamp(end_us // 1000 + gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_start_us",
                    "session_end_us",
                    "event_cnt",
                    "sum_value",
                ],
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def attribution_join(
    events: DataFrame,
    horizon_minutes: int = 30,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the clicks the
    same user made in the preceding `horizon_minutes` — the canonical
    attribution query, and the one streaming operator whose state contract
    differs from aggregation: BOTH sides buffer rows until the watermark
    plus the join interval passes, so the time bound on the condition is
    what makes state finite (an unbounded-time stream-stream join would
    buffer each side forever).

    Works identically on a batch DataFrame (same code path, Spark treats
    the interval condition as a plain theta join) — the test's
    stream == batch contract.

    Scale: state is keyed by user_id (the equi part of the condition), so
    the join shuffles each side once on user_id; watermark + interval
    bound per-key buffered history to ~(watermark + horizon).

    ``how="leftOuter"`` adds the un-attributed purchases (null click
    columns) — in streaming these rows can only emit once the watermark
    guarantees no matching click can still arrive, which is why outer
    stream-stream joins REQUIRE the time bound (an unbounded outer join
    could never declare a row unmatched)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        )
    )
    return purchases.join(clicks, cond, how).select(
        "user_id", "purchase_id", "purchase_ts", "purchase_value",
        "click_id", "click_ts",
    )


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    query_name: str,
    output_mode: str = "complete",
) -> DataFrame:
    """Drain everything currently available into an in-memory table and
    return it — the reference's run-to-completion CLI sync as a streaming
    trigger.  Re-running with the same checkpoint processes only files that
    arrived since (incrementality, `README.md:10-13`)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def foreach_batch_parquet_sink(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Exactly-once file sink via ``foreachBatch``: every micro-batch
    lands in its own ``batch_id=N`` partition directory with overwrite
    mode, so Structured Streaming's replay contract (a batch id may be
    re-delivered after failure, with identical contents) degrades to an
    idempotent overwrite of the same directory instead of duplicate rows
    — the standard batchId-keyed idempotent-sink pattern from the Spark
    docs, and the streaming face of the registry's transactional publish.

    Scale: each batch write is an independent parquet job; downstream
    readers see `out_dir` as one partitioned table (`batch_id` is a
    discoverable partition column usable for incremental consumption)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def delta_txn_sink(
    stream_df: DataFrame,
    table_dir: str,
    app_id: str,
    checkpoint_dir: str,
) -> None:
    """Exactly-once DELTA sink via transaction identifiers — the
    protocol-level idempotence mechanism production streaming sinks
    use (``txn {appId, version=batchId}`` committed atomically WITH
    the batch's file additions; PROTOCOL.md "Transaction
    Identifiers").  Each micro-batch becomes one
    :meth:`DeltaLog.append_stream_batch` call; a re-delivered batch id
    — Spark's replay contract after failure, or a whole re-run after
    the stream's OWN checkpoint is lost — is refused by the table's
    log itself, which is strictly stronger than the batch_id-directory
    overwrite of :func:`foreach_batch_parquet_sink` (that one only
    protects against replays the checkpoint still remembers).

    Scale: per batch, one distributed parquet write job + one
    driver-side commit JSON; the idempotence check reads table
    METADATA (log replay), never data files."""
    from ..delta_log import DeltaLog

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        DeltaLog(table_dir).append_stream_batch(
            batch_df, app_id, batch_id
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def iceberg_epoch_sink(
    stream_df: DataFrame,
    table_dir: str,
    query_id: str,
    checkpoint_dir: str,
) -> None:
    """Exactly-once ICEBERG sink — the Iceberg twin of
    :func:`delta_txn_sink`.  Iceberg has no txn action; the epoch
    watermark rides the snapshot SUMMARY (``queryId``/``epochId``
    properties, where Spark's and Flink's Iceberg sinks park theirs)
    and replays are refused by walking the snapshot ancestry
    (:meth:`IcebergTable.committed_epoch`) — so a rollback correctly
    FORGETS epochs committed on the abandoned branch and the stream
    re-lands them.  The table must already exist (``create`` is the
    explicit DDL face)."""
    from ..iceberg_meta import IcebergTable

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        IcebergTable(table_dir).append_stream_batch(
            batch_df, query_id, batch_id
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` — the
    Spark 4.x arbitrary-state API (typed state handles + timers) that
    supersedes ``applyInPandasWithState`` for new stateful operators.
    State here is one ValueState row per user carrying (event count,
    exact cent-scaled value sum); each micro-batch folds its Arrow
    batches into the state and emits the updated running totals
    (outputMode Update).  The cent-scaled BIGINT keeps the running sum
    exact and reduction-order-free, the same discipline as the batch
    queries (_util.SCALE2).

    Scale: state lives in the state store keyed by user_id (RocksDB
    backend in production — transformWithState REQUIRES the RocksDB
    provider), shuffled once per micro-batch on the group key; per-key
    state is two longs — horizonless running aggregates stay O(distinct
    users), not O(events).

    Dependency note: the transformWithState state-server protocol
    speaks protobuf in both the driver and every Python worker.  Where
    no `protobuf` wheel exists,
    :mod:`hadoop_sync_spark.compat.protobuf_shim` routes
    `google.protobuf` to a vendored pure-Python runtime (activated by
    tests/conftest.py before the JVM starts, so workers inherit it via
    PYTHONPATH) — the cross-micro-batch contract test in
    tests/test_streaming.py runs for real in this container, RocksDB
    state store included."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "cnt BIGINT, cents BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            cnt, cents = 0, 0
            if self._totals.exists():
                prev = self._totals.get()
                cnt, cents = int(prev[0]), int(prev[1])
            for pdf in rows:
                if pdf.empty:
                    continue
                cnt += len(pdf)
                # Half-up like the batch convention (_util.scaled / Spark
                # F.round, HALF_UP away from zero) — pandas Series.round is
                # half-EVEN, which diverges on exact .5 cents. Fixture values
                # carry 2 decimals so ties are ~impossible there, but the
                # streaming total must match the batch aggregate on ANY input.
                import numpy as np

                v = pdf["value"].astype(float).to_numpy()
                cents += int(
                    (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)).sum()
                )
            self._totals.update((cnt, cents))
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "event_cnt": [cnt],
                    "value_cents": [cents],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id bigint, event_cnt bigint, value_cents bigint",
        outputMode="Update",
        timeMode="None",
    )


def enrich_with_dimension(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-STATIC join: each streaming event enriched with a batch
    dimension row (per-user attributes here) — the third join shape
    Structured Streaming supports, completing stream-stream
    (attribution_join) and windowed aggregation.  Stateless by design:
    the static side is simply (re)broadcast per micro-batch, so there is
    no join state to watermark — the streaming face of the broadcast
    dimension joins (q21) and the reference's catalog-sized joins (A7).
    Caveat (verified empirically): a parquet-backed static side pins its
    FILE LISTING at stream construction — an overwrite between
    micro-batches throws FILE_NOT_EXIST even after refreshByPath/
    refreshTable; picking up dimension refreshes requires a
    re-resolvable table format (Delta/Iceberg) or restarting the query
    with a rebuilt plan.  Restart-per-refresh composes cleanly with
    Trigger.AvailableNow drains (the pattern the tests use).

    Scale: identical to the batch rule — dimension broadcastable →
    BroadcastHashJoin per micro-batch, no shuffle of the stream."""
    from pyspark.sql import functions as F

    return events.join(F.broadcast(dim), "user_id", "left")
