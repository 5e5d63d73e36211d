"""Streaming behavior tests: stream == batch at end-of-input, incremental
file-arrival processing (the reference's defining loop), stateful dedup,
custom stateful sessionization."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from hadoop_sync_spark.io import load_table, table_path
from hadoop_sync_spark.streaming import (
    dedup_stream,
    sessionized,
    sessionized_with_state,
    stream_events,
    windowed_counts,
)
from hadoop_sync_spark.streaming.pipeline import run_available_now
from tests.conftest import SF_DIR

_QN = iter(range(1000))


def _qname(prefix: str) -> str:
    return f"{prefix}_{next(_QN)}"


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events"
    d.mkdir()
    shutil.copy(table_path(SF_DIR, "events"), d / "part-000.parquet")
    return str(d)


def _canon(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_tumbling_equals_batch(spark, events_dir, tmp_path):
    """Windowed stream aggregation at end-of-input == batch q40 counts."""
    stream = windowed_counts(stream_events(spark, events_dir))
    name = _qname("tumb")
    got = run_available_now(stream, str(tmp_path / "ckpt"), name)

    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("event_cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "event_cnt")
    )
    cols = ["window_start", "event_type", "event_cnt"]
    assert _canon(got, cols) == _canon(batch, cols)


def test_incremental_file_arrival(spark, events_dir, tmp_path):
    """The A12 loop, streamified: second availableNow run with the same
    checkpoint absorbs ONLY newly-arrived files."""
    ckpt = str(tmp_path / "ckpt")
    stream = stream_events(spark, events_dir).groupBy("event_type").agg(
        F.count("*").alias("cnt")
    )
    name = _qname("incr")
    first = run_available_now(stream, ckpt, name).collect()
    total1 = sum(r["cnt"] for r in first)
    assert total1 > 0

    # no new files → no micro-batch fires at all: the fresh memory sink
    # stays empty (the reference's "application does nothing" re-run)
    again = run_available_now(stream, ckpt, name).collect()
    assert sum(r["cnt"] for r in again) == 0

    # new file arrives → complete-mode output reflects old+new state:
    # only the new file was read, but counts cover both (checkpoint state)
    shutil.copy(
        table_path(SF_DIR, "events"), events_dir + "/part-001.parquet"
    )
    third = run_available_now(stream, ckpt, name).collect()
    assert sum(r["cnt"] for r in third) == 2 * total1


def test_stream_dedup(spark, events_dir, tmp_path):
    """Duplicate event_ids across files (same file copied) collapse to one
    row each under stateful dropDuplicates."""
    shutil.copy(
        table_path(SF_DIR, "events"), events_dir + "/part-dup.parquet"
    )
    n_unique = load_table(spark, SF_DIR, "events").count()
    stream = dedup_stream(stream_events(spark, events_dir))
    name = _qname("dedup")
    got = run_available_now(
        stream, str(tmp_path / "ckpt"), name, output_mode="append"
    )
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_stream_sessions_equal_batch_islands(spark, events_dir, tmp_path):
    """session_window stream at end-of-input == batch gaps-and-islands."""
    stream = sessionized(stream_events(spark, events_dir))
    name = _qname("sess")
    got = run_available_now(stream, str(tmp_path / "ckpt"), name)

    ev = load_table(spark, SF_DIR, "events")
    batch = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("event_cnt"))
        .select("user_id", F.col("w.start").alias("session_start"), "event_cnt")
    )
    cols = ["user_id", "session_start", "event_cnt"]
    assert _canon(got, cols) == _canon(batch, cols)


def test_custom_stateful_sessionization(spark, events_dir, tmp_path):
    """applyInPandasWithState sessionizer: closed sessions match the
    built-in session_window islands (count parity per user).

    Event-time timeouts only fire in a *later* micro-batch whose watermark
    has passed them, so two far-future sentinel files (fake user, separate
    micro-batches via maxFilesPerTrigger=1) advance the watermark and close
    every real session — the standard end-of-stream flush pattern."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    sentinel_user = 10**9
    # match the fixture's on-disk ts encoding (nanos long vs naive us)
    fixture_ts_type = pq.read_schema(events_dir + "/part-000.parquet").field(
        "ts"
    ).type
    for i, year_off in enumerate((365, 730)):
        sent_ts = pd.Timestamp("2024-01-01") + pd.Timedelta(days=year_off)
        ts_arr = (
            pa.array([int(sent_ts.value)], pa.int64())
            if pa.types.is_integer(fixture_ts_type)
            else pa.array([sent_ts.to_pydatetime()], fixture_ts_type)
        )
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([10**9 + i], pa.int64()),
                    "ts": ts_arr,
                    "user_id": pa.array([sentinel_user], pa.int64()),
                    "event_type": pa.array(["sentinel"], pa.string()),
                    "value": pa.array([0.0], pa.float64()),
                    "props": pa.array(["{}"], pa.string()),
                }
            ),
            events_dir + f"/zz-sentinel-{i}.parquet",
        )

    stream = sessionized_with_state(
        stream_events(spark, events_dir, max_files_per_trigger=1),
        watermark="0 seconds",
    )
    # bounded retry with a FRESH checkpoint + sink per attempt: a state-store
    # commit can abort spuriously when the whole suite loads the JVM (the
    # maintenance-thread race; see session.py maintenanceInterval note), and
    # a half-committed checkpoint must not be reused
    last_err = None
    for attempt in range(3):
        try:
            got = run_available_now(
                stream,
                str(tmp_path / f"ckpt{attempt}"),
                _qname("state"),
                output_mode="append",
            ).filter(F.col("user_id") != sentinel_user)
            break
        except Exception as e:  # noqa: BLE001 — retry then re-raise
            last_err = e
    else:
        raise last_err
    per_user_stream = {
        r["user_id"]: r["cnt"]
        for r in got.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    per_user_batch = {
        r["user_id"]: r["cnt"]
        for r in (
            ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.lit(1))
            .groupBy("user_id")
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
    }
    assert per_user_stream == per_user_batch


def test_stream_stream_attribution_join(spark, events_dir, tmp_path):
    """Stream-stream interval join == the identical batch join at
    end-of-input; both sides' state bounded by watermark + interval."""
    from hadoop_sync_spark.streaming import attribution_join

    stream = attribution_join(
        stream_events(spark, events_dir), watermark="0 seconds"
    )
    name = _qname("ssjoin")
    got = run_available_now(
        stream, str(tmp_path / "ckpt"), name, output_mode="append"
    )
    batch = attribution_join(load_table(spark, SF_DIR, "events"))
    cols = ["user_id", "purchase_id", "click_id"]
    assert _canon(got, cols) == _canon(batch, cols)
    assert len(_canon(got, cols)) > 0


def test_stream_stream_outer_join(spark, events_dir, tmp_path):
    """leftOuter stream-stream join: un-attributed purchases emit with
    null click columns once the watermark passes; coverage equals the
    batch outer join (every purchase appears exactly once per match or
    once unmatched)."""
    from hadoop_sync_spark.streaming import attribution_join

    stream = attribution_join(
        stream_events(spark, events_dir), watermark="0 seconds", how="leftOuter"
    )
    name = _qname("ssouter")
    got = run_available_now(
        stream, str(tmp_path / "ckpt"), name, output_mode="append"
    )
    batch = attribution_join(
        load_table(spark, SF_DIR, "events"), how="leftOuter"
    )
    cols = ["user_id", "purchase_id", "click_id"]
    got_rows, batch_rows = set(_canon(got, cols)), set(_canon(batch, cols))
    # streaming outer joins emit an unmatched row only once the watermark
    # passes its eviction point; end-of-input stops the watermark clock, so
    # purchases near the stream's end legitimately stay unemitted — the
    # stream result is a subset of the batch result, with the MATCHED rows
    # identical and a non-empty unmatched tail already flushed
    assert got_rows <= batch_rows
    matched = lambda rows: {r for r in rows if r[2] is not None}  # noqa: E731
    assert matched(got_rows) == matched(batch_rows)
    assert any(r[2] is None for r in got_rows)


def test_foreach_batch_sink_is_exactly_once(spark, events_dir, tmp_path):
    """batchId-keyed foreachBatch sink: incremental drains append new
    batches; a re-delivered batch id (the replay contract) overwrites its
    own directory instead of duplicating rows."""
    import os

    from hadoop_sync_spark.streaming.pipeline import (
        foreach_batch_parquet_sink,
    )

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    src = stream_events(spark, events_dir).select("event_id", "event_type")
    foreach_batch_parquet_sink(src, out, ckpt)
    first = spark.read.parquet(out)
    n_events = load_table(spark, SF_DIR, "events").count()
    assert first.count() == n_events
    assert first.select("event_id").distinct().count() == n_events

    # drain again with no new input: no new batch, no duplicates
    foreach_batch_parquet_sink(
        stream_events(spark, events_dir).select("event_id", "event_type"),
        out,
        ckpt,
    )
    assert spark.read.parquet(out).count() == n_events

    # new file arrives -> next drain appends exactly its rows once
    shutil.copy(
        os.path.join(events_dir, "part-000.parquet"),
        os.path.join(events_dir, "part-001.parquet"),
    )
    foreach_batch_parquet_sink(
        stream_events(spark, events_dir).select("event_id", "event_type"),
        out,
        ckpt,
    )
    assert spark.read.parquet(out).count() == 2 * n_events

    # simulate a failure replay: rewrite the LAST batch id with identical
    # contents (Spark's contract on restart-after-sink-success-but-
    # commit-failure); the partition overwrite keeps the total unchanged
    batch_dirs = sorted(
        d for d in os.listdir(out) if d.startswith("batch_id=")
    )
    last_id = int(batch_dirs[-1].split("=")[1])
    replay_df = spark.read.parquet(
        os.path.join(events_dir, "part-001.parquet")
    ).select("event_id", "event_type")
    replay_df.write.mode("overwrite").parquet(
        os.path.join(out, f"batch_id={last_id}")
    )
    assert spark.read.parquet(out).count() == 2 * n_events


def _protobuf_available() -> bool:
    """transformWithState's state-server protocol needs google.protobuf.
    This container ships no protobuf wheel, but conftest.py activates the
    Cloud-SDK-vendored pure-Python runtime through
    hadoop_sync_spark.compat.protobuf_shim before the JVM starts — a
    round-trip through PySpark's own generated StateMessage proto is the
    availability probe (it exercises descriptor build + serialize +
    parse, everything the state server needs from the runtime)."""
    try:
        from pyspark.sql.streaming.proto import StateMessage_pb2 as M

        req = M.StateRequest()
        M.StateRequest.FromString(req.SerializeToString())
        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="google.protobuf absent (and no Cloud-SDK-vendored runtime to "
    "shim): transformWithState state server cannot start",
)
def test_transform_with_state_running_totals(spark, events_dir, tmp_path):
    """The transformWithStateInPandas running totals must, at end of
    input, equal the batch per-user count and exact cent-scaled sum —
    and must carry state ACROSS micro-batches: a second file delivered
    through the same checkpoint continues the running totals instead of
    restarting them.  Requires the RocksDB state store provider
    (per-query conf: transformWithState refuses the HDFS-backed
    provider) and google.protobuf (see the skipif).

    Sink choice: foreachBatch-to-parquet, NOT the memory sink — a
    memory-sink query refuses to RESTART from an existing checkpoint
    ("does not support recovering from checkpoint location"), and the
    restart is exactly what this test exercises.  Each drain appends
    batch_id-partitioned updates; the latest batch_id per user is that
    user's current running total (update mode emits one row per touched
    key per batch)."""
    from hadoop_sync_spark.streaming.pipeline import (
        foreach_batch_parquet_sink,
        running_user_totals,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")

        def drain_totals():
            foreach_batch_parquet_sink(
                running_user_totals(stream_events(spark, events_dir)),
                out,
                ckpt,
            )
            pdf = spark.read.parquet(out).toPandas()
            return (
                pdf.sort_values("batch_id")
                .drop_duplicates("user_id", keep="last")
            )

        batch = (
            load_table(spark, SF_DIR, "events")
            .groupBy("user_id")
            .agg(
                F.count("*").alias("event_cnt"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                    "value_cents"
                ),
            )
        )
        bp = batch.toPandas()

        gp = drain_totals()
        m = gp.merge(bp, on="user_id", suffixes=("_s", "_b"))
        assert len(m) == len(bp)
        assert (m.event_cnt_s == m.event_cnt_b).all()
        assert (m.value_cents_s == m.value_cents_b).all()

        # second delivery: append a copy of the events file; the SAME
        # checkpoint must continue (not restart) the totals — doubling
        shutil.copy(
            table_path(SF_DIR, "events"),
            events_dir + "/part-001.parquet",
        )
        gp2 = drain_totals()
        m2 = gp2.merge(bp, on="user_id", suffixes=("_s", "_b"))
        assert len(m2) == len(bp)
        assert (m2.event_cnt_s == 2 * m2.event_cnt_b).all()
        assert (m2.value_cents_s == 2 * m2.value_cents_b).all()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stream_static_join_equals_batch(spark, events_dir, tmp_path):
    """Stream-static enrichment at end-of-input must equal the same join
    run in batch: every event carries its user's static attributes, and
    events whose user is missing from the dimension survive (left join)
    with NULLs."""
    from hadoop_sync_spark.streaming.pipeline import enrich_with_dimension

    # static per-user dimension derived once, batch-side; drop some users
    # so the left-join NULL path is exercised
    dim = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("user_events"))
        .filter(F.col("user_id") % 3 != 0)
    )
    stream = enrich_with_dimension(
        stream_events(spark, events_dir).select("event_id", "user_id"), dim
    )
    name = _qname("ssj")
    got = run_available_now(
        stream, str(tmp_path / "ckpt"), name, output_mode="append"
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .select("event_id", "user_id")
        .join(F.broadcast(dim), "user_id", "left")
    )
    cols = ["event_id", "user_id", "user_events"]
    assert _canon(got, cols) == _canon(batch, cols)
    assert got.filter(F.col("user_events").isNull()).count() > 0


def test_stream_dedup_within_watermark_collapses_in_horizon_dups(
    spark, events_dir, tmp_path
):
    """dropDuplicatesWithinWatermark: duplicates arriving within the
    watermark horizon of the first occurrence collapse to one row, with
    the key kept natural (event_id alone — no watermark column in the
    key) and state still watermark-evicted.  With both copies in one
    AvailableNow drain every duplicate is in-horizon, so coverage equals
    exact batch dedup."""
    from hadoop_sync_spark.streaming import dedup_stream_within_watermark

    shutil.copy(
        table_path(SF_DIR, "events"), events_dir + "/part-dup.parquet"
    )
    n_unique = load_table(spark, SF_DIR, "events").count()
    stream = dedup_stream_within_watermark(stream_events(spark, events_dir))
    name = _qname("dedup_ww")
    got = run_available_now(
        stream, str(tmp_path / "ckpt"), name, output_mode="append"
    )
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique
