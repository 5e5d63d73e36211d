"""Delta transaction identifiers (PROTOCOL.md "Transaction
Identifiers"): ``txn`` replay state, the idempotent commit face,
checkpoint carry (V1 parquet + V2), and the exactly-once streaming
sink built on them.

Reference parity: the reference's sync loop keys exactly-once
absorption on the Citus catalog's transactional publish
(HdfsSynchronizer.java:142-205); Delta's txn action is the open-format
spelling of that same watermark — an appId's last durable version,
read back from the log itself.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from hadoop_sync_spark.delta_log import DeltaLog

SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "long", "nullable": True, "metadata": {}},
        ],
    }
)


def _meta():
    return {
        "metaData": {
            "id": "t",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": SCHEMA_JSON,
            "partitionColumns": [],
            "configuration": {},
        }
    }


def _write_file(table_dir, rel, rows):
    pd.DataFrame(rows).to_parquet(os.path.join(table_dir, rel))


def _mk_table(tmp_path, name="t"):
    d = str(tmp_path / name)
    os.makedirs(d)
    log = DeltaLog(d)
    _write_file(d, "a.parquet", {"k": [1], "v": [10]})
    log.commit(0, [{"protocol": {"minReaderVersion": 1}}, _meta(),
                   log.add_action_for("a.parquet")])
    return d, log


def test_txn_replay_last_commit_wins(tmp_path):
    """One entry per appId; a later commit's txn replaces the earlier
    wholesale (the spec's newest-wins reader rule), and lastUpdated
    rides along when present."""
    d, log = _mk_table(tmp_path)
    log.commit(1, [{"txn": {"appId": "app-a", "version": 3}}])
    log.commit(2, [{"txn": {"appId": "app-b", "version": 1,
                            "lastUpdated": 1234}}])
    log.commit(3, [{"txn": {"appId": "app-a", "version": 7}}])
    snap = log.snapshot()
    assert snap.transactions["app-a"] == {"appId": "app-a", "version": 7}
    assert snap.transactions["app-b"] == {
        "appId": "app-b", "version": 1, "lastUpdated": 1234}
    assert log.txn_version("app-a") == 7
    assert log.txn_version("app-b") == 1
    assert log.txn_version("never-wrote") is None
    # time travel sees the then-current watermark
    assert log.txn_version("app-a", version=1) == 3


def test_commit_with_txn_is_idempotent(tmp_path):
    """A replayed (appId, version) skips the WHOLE commit — actions
    included — and returns None; a higher version goes through."""
    d, log = _mk_table(tmp_path)
    _write_file(d, "b.parquet", {"k": [2], "v": [20]})
    got = log.commit_with_txn([log.add_action_for("b.parquet")],
                              "writer-1", 0)
    assert got == 1
    head = log.latest_version()
    # replay of version 0, and a stale lower-than-watermark write
    assert log.commit_with_txn([log.add_action_for("b.parquet")],
                               "writer-1", 0) is None
    assert log.latest_version() == head
    # a DIFFERENT app is independent
    assert log.commit_with_txn([], "writer-2", 0) == 2
    # next version for writer-1 lands
    assert log.commit_with_txn([], "writer-1", 1) == 3
    assert log.txn_version("writer-1") == 1


def test_commit_with_txn_retries_lost_race(tmp_path, monkeypatch):
    """A FileExistsError race (another writer claimed the version
    between our head read and our commit) retries INSIDE
    commit_with_txn (ADVICE r12: the old docstring promised a
    caller-side retry no caller performed): head re-reads, the skip
    check re-runs, and the commit lands at the true next version."""
    d, log = _mk_table(tmp_path)
    log.commit(1, [{"txn": {"appId": "other", "version": 9}}])

    real_latest = log.latest_version
    stale = {"n": 1}

    def latest_stale_once():
        v = real_latest()
        if stale["n"]:
            stale["n"] -= 1
            return v - 1  # a competitor committed after our read
        return v

    monkeypatch.setattr(log, "latest_version", latest_stale_once)
    got = log.commit_with_txn([], "writer-1", 0)
    assert got == real_latest() == 2
    assert log.txn_version("writer-1") == 0

    # a raced DUPLICATE of the same (appId, version) collapses to a
    # no-op mid-loop: the stale view targets an existing file, the
    # retry's re-read sees the competitor already recorded our txn
    stale["n"] = 1
    assert log.commit_with_txn([], "writer-1", 0) is None
    assert real_latest() == 2

    # livelock surfaces: a head view that never becomes current
    # exhausts max_retries and propagates the last FileExistsError
    monkeypatch.setattr(log, "latest_version", lambda: 0)
    with pytest.raises(FileExistsError):
        log.commit_with_txn([], "writer-1", 5, max_retries=2)


def test_lax_external_txn_versions(tmp_path):
    """External writers' lax txn shapes: a STRING version coerces to
    int at replay (comparisons and the checkpoint's int64 column stay
    sound); an unparseable one keeps the reader alive but makes every
    idempotence face — and the V1 checkpoint, whose int64 column
    cannot hold it — refuse cleanly instead of TypeError-ing or
    silently resetting the watermark."""
    d, log = _mk_table(tmp_path)
    log.commit(1, [{"txn": {"appId": "strver", "version": "5"}}])
    assert log.txn_version("strver") == 5  # coerced
    assert log.commit_with_txn([], "strver", 5) is None  # skip works
    assert log.commit_with_txn([], "strver", 6) == 2
    log.write_checkpoint()  # int64 column accepts the coerced value

    log.commit(3, [{"txn": {"appId": "badver", "version": "abc"}}])
    assert log.read  # replay itself survived
    with pytest.raises(ValueError, match="malformed version"):
        log.txn_version("badver")
    with pytest.raises(ValueError, match="malformed version"):
        log.commit_with_txn([], "badver", 7)
    with pytest.raises(ValueError, match="malformed version"):
        log.write_checkpoint()
    # other apps are unaffected
    assert log.txn_version("strver") == 6


def test_commit_with_txn_race_retry(tmp_path):
    """The documented optimistic-concurrency contract: commit() itself
    refuses an existing version loudly (put-if-absent), and a caller's
    retry of commit_with_txn re-runs the skip check against whatever
    the racing writer landed — same (app, version) collapses to a
    no-op instead of a duplicate."""
    d, log = _mk_table(tmp_path)
    head = log.latest_version()
    # the raw atomicity primitive the contract rests on
    with pytest.raises(FileExistsError):
        log.commit(head, [{"txn": {"appId": "me", "version": 0}}])
    # a racing writer (another process, same app after a crash) lands
    # OUR (app, version) first; the retry must skip, not duplicate
    log.commit(head + 1, [{"txn": {"appId": "me", "version": 0}}])
    assert log.commit_with_txn([], "me", 0) is None
    assert log.latest_version() == head + 1
    # and a DIFFERENT version still lands after the race
    assert log.commit_with_txn([], "me", 1) == head + 2
    assert log.txn_version("me") == 1


@pytest.mark.parametrize("kind", ["v1", "v2"])
def test_checkpoint_carries_txn(tmp_path, kind):
    """The spec REQUIRES checkpoints to carry the latest txn per appId:
    after expire_log() removes the pre-checkpoint commits, the
    watermark must still refuse a replayed batch."""
    d, log = _mk_table(tmp_path)
    log.commit(1, [{"txn": {"appId": "app-a", "version": 3}}])
    log.commit(2, [{"txn": {"appId": "app-a", "version": 5}},
                   {"txn": {"appId": "app-b", "version": 0,
                            "lastUpdated": 99}}])
    if kind == "v1":
        log.write_checkpoint()
    else:
        log.write_checkpoint_v2()
    expired = log.expire_log()
    assert expired  # the replay prefix really is gone
    snap = log.snapshot()
    assert snap.transactions["app-a"]["version"] == 5
    assert snap.transactions["app-b"] == {
        "appId": "app-b", "version": 0, "lastUpdated": 99}
    # and the watermark still gates: a replayed version skips
    assert log.commit_with_txn([], "app-a", 5) is None
    assert log.commit_with_txn([], "app-a", 6) is not None


def test_append_stream_batch_idempotent(spark, tmp_path):
    """Micro-batch append: creates the table on first write, lands each
    batch exactly once, refuses a re-delivered batch id, and an empty
    batch still advances the watermark."""
    d = str(tmp_path / "stream_t")
    log = DeltaLog(d)
    b0 = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    b1 = spark.createDataFrame([(3, 30)], "k long, v long")

    assert log.append_stream_batch(b0, "sink-app", 0) is not None
    got = {tuple(r) for r in log.read(spark).collect()}
    assert got == {(1, 10), (2, 20)}

    # replay contract: same batch id re-delivered -> no-op
    assert log.append_stream_batch(b0, "sink-app", 0) is None
    assert log.read(spark).count() == 2

    assert log.append_stream_batch(b1, "sink-app", 1) is not None
    got = {tuple(r) for r in log.read(spark).collect()}
    assert got == {(1, 10), (2, 20), (3, 30)}

    # an EMPTY batch advances the watermark (else a retried empty batch
    # followed by a crash could re-admit batch 2 with different rows)
    empty = spark.createDataFrame([], "k long, v long")
    assert log.append_stream_batch(empty, "sink-app", 2) is not None
    assert log.txn_version("sink-app") == 2
    assert log.read(spark).count() == 3

    # column mismatch refuses loudly
    bad = spark.createDataFrame([(1,)], "wrong long")
    with pytest.raises(ValueError, match="columns"):
        log.append_stream_batch(bad, "sink-app", 3)


def test_append_stream_batch_crash_retry_overwrites(spark, tmp_path):
    """A crash between the deterministic renames and the commit leaves
    orphan txn-named parts; the retry overwrites them byte-for-byte and
    commits once — no duplicate rows, no orphan growth."""
    d = str(tmp_path / "crash_t")
    log = DeltaLog(d)
    b0 = spark.createDataFrame([(1, 10)], "k long, v long")
    log.append_stream_batch(b0, "app", 0)
    # simulate the torn attempt for batch 1: stage a file under the
    # deterministic name WITHOUT a commit
    import hashlib
    tag = hashlib.md5(b"app").hexdigest()[:8]
    orphan = f"txn-{tag}-{1:010d}-{0:05d}.parquet"
    pd.DataFrame({"k": [7], "v": [70]}).to_parquet(os.path.join(d, orphan))
    before = log.read(spark).count()
    assert before == 1  # orphan is invisible (not in any snapshot)
    b1 = spark.createDataFrame([(7, 70)], "k long, v long")
    assert log.append_stream_batch(b1, "app", 1) is not None
    got = {tuple(r) for r in log.read(spark).collect()}
    assert got == {(1, 10), (7, 70)}


def test_append_stream_batch_column_mapped(spark, tmp_path):
    """name-mode column mapping: the batch lands under PHYSICAL column
    names (the merge face's rule) and reads back logically; replay
    still skips."""
    d = str(tmp_path / "mapped_t")
    os.makedirs(d)
    log = DeltaLog(d)
    fields = [
        {"name": n, "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": i + 1,
                      "delta.columnMapping.physicalName": f"col-{n}"}}
        for i, n in enumerate(("k", "v"))
    ]
    log.commit(0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "t",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(
                {"type": "struct", "fields": fields}),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "2"},
        }},
    ])
    b0 = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    assert log.append_stream_batch(b0, "m-app", 0) is not None
    assert log.append_stream_batch(b0, "m-app", 0) is None
    got = {tuple(r) for r in
           log.read(spark).select("k", "v").collect()}
    assert got == {(1, 10), (2, 20)}
    # the parquet on disk carries PHYSICAL names
    import pyarrow.parquet as pq
    txn_files = [n for n in os.listdir(d) if n.startswith("txn-")]
    assert txn_files
    names = pq.read_schema(os.path.join(d, txn_files[0])).names
    assert set(names) == {"col-k", "col-v"}


def test_append_stream_batch_id_mode(spark, tmp_path):
    """id-mode twin (round 13 — the r12 refusal lifted): an EMPTY
    id-mode table's first batch lands under the metadata physicalName
    with footer field ids STAMPED; the second batch resolves
    per-footer from the first's files, so the table stays
    self-consistent and the id-mode reader composes."""
    import pyarrow.parquet as pq

    d = str(tmp_path / "idmode_t")
    os.makedirs(d)
    log = DeltaLog(d)
    fields = [
        {"name": n, "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": i + 1,
                      "delta.columnMapping.physicalName": f"col-{n}"}}
        for i, n in enumerate(("k", "v"))
    ]
    log.commit(0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "t",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(
                {"type": "struct", "fields": fields}),
            "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "id",
                              "delta.columnMapping.maxColumnId": "2"},
        }},
    ])
    b0 = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    assert log.append_stream_batch(b0, "id-app", 0) is not None
    assert log.append_stream_batch(b0, "id-app", 0) is None  # replay
    b1 = spark.createDataFrame([(3, 30)], "k long, v long")
    assert log.append_stream_batch(b1, "id-app", 1) is not None
    got = {tuple(r) for r in
           log.read(spark).select("k", "v").collect()}
    assert got == {(1, 10), (2, 20), (3, 30)}
    # every streamed file carries physical names AND footer field ids
    txn_files = sorted(n for n in os.listdir(d)
                       if n.startswith("txn-"))
    assert len(txn_files) >= 2
    for n in txn_files:
        sch = pq.read_schema(os.path.join(d, n))
        assert set(sch.names) == {"col-k", "col-v"}
        ids = {
            sch.field(i).name:
            int((sch.field(i).metadata or {})[b"PARQUET:field_id"])
            for i in range(len(sch.names))
        }
        assert ids == {"col-k": 1, "col-v": 2}


def test_delta_txn_sink_survives_checkpoint_loss(spark, tmp_path):
    """The real Structured Streaming drain: a file-source stream lands
    in a Delta table through delta_txn_sink.  A second drain through
    the SAME checkpoint is a no-op (file-log bookkeeping), and a drain
    through a FRESH checkpoint — the replay scenario the batch_id
    directory sink cannot survive — is refused by the table's own txn
    watermark instead of duplicating every row."""
    from hadoop_sync_spark.streaming.pipeline import delta_txn_sink

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]}).to_parquet(
        os.path.join(src_dir, "part-000.parquet"))
    table = str(tmp_path / "tbl")
    ckpt1 = str(tmp_path / "ckpt1")

    def stream():
        return (spark.readStream
                .schema("k long, v long")
                .parquet(src_dir))

    delta_txn_sink(stream(), table, "loss-app", ckpt1)
    log = DeltaLog(table)
    assert log.read(spark).count() == 3

    # same checkpoint, no new input: no new batch at all
    delta_txn_sink(stream(), table, "loss-app", ckpt1)
    assert log.read(spark).count() == 3

    # checkpoint LOST: batch ids restart at 0 with the full input —
    # the txn watermark (version 0 already recorded) refuses it
    ckpt2 = str(tmp_path / "ckpt2")
    delta_txn_sink(stream(), table, "loss-app", ckpt2)
    assert log.read(spark).count() == 3
    assert {tuple(r) for r in log.read(spark).collect()} == {
        (1, 10), (2, 20), (3, 30)}


def test_cli_stream_both_formats(spark, tmp_path, capsys):
    """`stream` CLI: drains a parquet dir into a registered format
    table exactly once; a re-run with a FRESH checkpoint lands zero
    new batches (the table's own watermark refuses the replay); plain
    directories refuse."""
    from hadoop_sync_spark.__main__ import main
    from hadoop_sync_spark.iceberg_meta import IcebergTable

    meta = str(tmp_path / "meta")
    src = str(tmp_path / "src")
    os.makedirs(src)
    pd.DataFrame({"k": [1, 2], "v": [10, 20]}).to_parquet(
        os.path.join(src, "p0.parquet"))

    d, log = _mk_table(tmp_path, "cli_stream")
    assert main(["register", meta, "t", d, "--format", "delta"]) == 0
    ck = str(tmp_path / "ck")
    assert main(["stream", meta, "t", src, "--checkpoint", ck,
                 "--app-id", "cli"]) == 0
    out = capsys.readouterr().out
    assert "watermark None -> 0" in out
    # a.parquet's (1,10) plus the two streamed rows, exactly once
    rows = sorted(tuple(r) for r in
                  log.read(spark).select("k", "v").collect())
    assert rows == [(1, 10), (1, 10), (2, 20)]
    # checkpoint lost: replayed batch 0 refused, zero new batches
    assert main(["stream", meta, "t", src, "--checkpoint",
                 str(tmp_path / "ck2"), "--app-id", "cli"]) == 0
    assert "0 new batch(es)" in capsys.readouterr().out
    assert log.read(spark).count() == 3  # a.parquet row + 2 streamed

    # iceberg twin
    di = str(tmp_path / "cli_stream_ice")
    t = IcebergTable.create(di, [("k", "bigint"), ("v", "bigint")],
                            now_ms=1)
    assert main(["register", meta, "ti", di, "--format",
                 "iceberg"]) == 0
    assert main(["stream", meta, "ti", src, "--checkpoint",
                 str(tmp_path / "cki"), "--app-id", "cli"]) == 0
    assert "watermark None -> 0" in capsys.readouterr().out
    assert t.read(spark).count() == 2
    assert main(["stream", meta, "ti", src, "--checkpoint",
                 str(tmp_path / "cki2"), "--app-id", "cli"]) == 0
    assert "0 new batch(es)" in capsys.readouterr().out
    assert t.read(spark).count() == 2

    # plain-directory tables refuse
    os.makedirs(str(tmp_path / "plaind"))
    pd.DataFrame({"k": [1]}).to_parquet(
        os.path.join(str(tmp_path / "plaind"), "x.parquet"))
    assert main(["register", meta, "tp",
                 str(tmp_path / "plaind")]) == 0
    assert main(["stream", meta, "tp", src, "--checkpoint",
                 str(tmp_path / "ckp")]) == 2


# ---- the Iceberg twin: epoch watermark in the snapshot summary ------


def test_iceberg_epoch_append_idempotent(spark, tmp_path):
    """Iceberg has no txn action: the epoch watermark rides the
    snapshot summary and replays skip via the ancestry walk."""
    from hadoop_sync_spark.iceberg_meta import IcebergTable

    d = str(tmp_path / "ice_t")
    t = IcebergTable.create(d, [("k", "bigint"), ("v", "bigint")],
                            now_ms=1)
    b0 = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    b1 = spark.createDataFrame([(3, 30)], "k long, v long")

    assert t.committed_epoch("q-1") is None
    assert t.append_stream_batch(b0, "q-1", 0, now_ms=2) is not None
    assert t.committed_epoch("q-1") == 0
    assert t.append_stream_batch(b0, "q-1", 0, now_ms=3) is None  # replay
    assert t.append_stream_batch(b1, "q-1", 1, now_ms=4) is not None
    got = {(r["k"], r["v"]) for r in t.read(spark).collect()}
    assert got == {(1, 10), (2, 20), (3, 30)}
    # a second query id is independent
    assert t.committed_epoch("q-2") is None
    # empty batch advances the watermark
    empty = spark.createDataFrame([], "k long, v long")
    assert t.append_stream_batch(empty, "q-1", 2, now_ms=5) is not None
    assert t.committed_epoch("q-1") == 2
    assert t.read(spark).count() == 3
    # footer bounds made it into the manifest: a point filter prunes
    # to the one file holding k=3
    files = [f for f in t.files() if "txn-" in f.path]
    assert len(files) >= 2


def test_partitioned_stream_appends_both_formats(spark, tmp_path):
    """Partitioned targets split per tuple in one idempotent commit —
    the partitioned-MERGE shape: Delta stamps string-encoded
    partitionValues, Iceberg stamps manifest tuples, and partition
    filters prune streamed files on both."""
    from hadoop_sync_spark.iceberg_meta import IcebergTable

    # Iceberg identity-partitioned
    d = str(tmp_path / "ice_part")
    t = IcebergTable.create(d, [("k", "bigint"), ("p", "bigint")],
                            partition_by=[("p", "long")], now_ms=1)
    b0 = spark.createDataFrame([(1, 0), (2, 1), (3, 0)],
                               "k long, p long")
    assert t.append_stream_batch(b0, "q-p", 0, now_ms=2) is not None
    assert t.append_stream_batch(b0, "q-p", 0, now_ms=3) is None
    got = {(r["k"], r["p"]) for r in t.read(spark).collect()}
    assert got == {(1, 0), (2, 1), (3, 0)}
    # one data file per tuple; a partition filter prunes to one
    assert len([f for f in t.files() if "txn-" in f.path]) == 2
    pruned = t.read(spark, partition_filter={"p": 1})
    assert {(r["k"], r["p"]) for r in pruned.collect()} == {(2, 1)}
    # bucket-partitioned stream (round 13 — the r12 refusal flipped):
    # per-row murmur3 bucket stamped into manifest tuples, replay
    # skips, pruning reaches the streamed files, source column KEPT
    from hadoop_sync_spark.iceberg_meta import transform_value

    d2 = str(tmp_path / "ice_bucket")
    t2 = IcebergTable.create(
        d2, [("k", "bigint"), ("p", "bigint")],
        partition_by=[("p", "int", "bucket[4]", "p_bucket")], now_ms=1)
    assert t2.append_stream_batch(b0, "q-p", 0, now_ms=2) is not None
    assert t2.append_stream_batch(b0, "q-p", 0, now_ms=3) is None
    assert {(r["k"], r["p"]) for r in t2.read(spark).collect()} == {
        (1, 0), (2, 1), (3, 0)}
    sf = [f for f in t2.files() if "txn-" in f.path]
    assert sorted(f.partition["p_bucket"] for f in sf) == sorted(
        {transform_value("bucket[4]", p) for p in (0, 1)})
    pruned1 = t2.files(partition_filter={"p_bucket": 1})
    assert pruned1 and all(
        f.partition["p_bucket"] == transform_value("bucket[4]", 1)
        for f in pruned1)

    # Delta partitioned (string-encoded partitionValues)
    dd = str(tmp_path / "delta_part")
    log = DeltaLog(dd)
    os.makedirs(dd)
    _write_file(dd, "seed.parquet", {"k": [9], "v": [90]})
    meta = {
        "metaData": {
            "id": "t",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({
                "type": "struct",
                "fields": [
                    {"name": "k", "type": "long", "nullable": True,
                     "metadata": {}},
                    {"name": "v", "type": "long", "nullable": True,
                     "metadata": {}},
                    {"name": "p", "type": "long", "nullable": True,
                     "metadata": {}},
                ],
            }),
            "partitionColumns": ["p"],
            "configuration": {},
        }
    }
    log.commit(0, [{"protocol": {"minReaderVersion": 1}}, meta,
                   log.add_action_for("seed.parquet",
                                      partitionValues={"p": "7"})])
    batch = spark.createDataFrame([(1, 10, 0), (2, 20, 1), (3, 30, 0)],
                                  "k long, v long, p long")
    assert log.append_stream_batch(batch, "sink-p", 0) is not None
    assert log.append_stream_batch(batch, "sink-p", 0) is None
    got = {tuple(r) for r in
           log.read(spark).select("k", "v", "p").collect()}
    assert got == {(9, 90, 7), (1, 10, 0), (2, 20, 1), (3, 30, 0)}
    # partitionValues stamped per tuple with the string encoding
    snap = log.snapshot()
    pvs = sorted(a["partitionValues"]["p"]
                 for pth, a in snap.live.items() if "txn-" in pth)
    assert pvs == ["0", "1"]


def test_iceberg_malformed_external_epoch_refuses(spark, tmp_path):
    """A lax external writer recording this query with a malformed
    epochId refuses loudly: ignoring it would walk on to an OLDER
    epoch and re-admit duplicates."""
    import json as _json

    from hadoop_sync_spark.iceberg_meta import IcebergTable

    d = str(tmp_path / "ice_lax")
    t = IcebergTable.create(d, [("k", "bigint")], now_ms=1)
    b = spark.createDataFrame([(1,)], "k long")
    t.append_stream_batch(b, "q-lax", 0, now_ms=2)
    # mutate the newest snapshot's summary in place (external writer)
    mdir = os.path.join(d, "metadata")
    latest = sorted(n for n in os.listdir(mdir)
                    if n.endswith(".metadata.json"))[-1]
    mp = os.path.join(mdir, latest)
    with open(mp) as fh:
        meta = _json.load(fh)
    meta["snapshots"][-1]["summary"][
        "spark.sql.streaming.epochId"] = "not-a-number"
    with open(mp, "w") as fh:
        _json.dump(meta, fh)
    t2 = IcebergTable(d)
    with pytest.raises(ValueError, match="malformed epochId"):
        t2.committed_epoch("q-lax")
    # a different query id is unaffected
    assert t2.committed_epoch("other") is None


def test_iceberg_epoch_forgotten_after_rollback(spark, tmp_path):
    """The ancestry walk means a rollback FORGETS epochs committed on
    the abandoned branch — the stream then re-lands them instead of
    silently dropping data the rollback undid."""
    from hadoop_sync_spark.iceberg_meta import IcebergTable

    d = str(tmp_path / "ice_rb")
    t = IcebergTable.create(d, [("k", "bigint"), ("v", "bigint")],
                            now_ms=1)
    b0 = spark.createDataFrame([(1, 10)], "k long, v long")
    b1 = spark.createDataFrame([(2, 20)], "k long, v long")
    s0 = t.append_stream_batch(b0, "q-rb", 0, now_ms=2)
    t.append_stream_batch(b1, "q-rb", 1, now_ms=3)
    assert t.committed_epoch("q-rb") == 1
    t.rollback_to(s0)
    # epoch 1's snapshot is off the current branch now
    assert t.committed_epoch("q-rb") == 0
    assert t.read(spark).count() == 1
    # the replayed epoch 1 re-lands (deterministic names overwrite the
    # now-orphaned parts from the abandoned branch)
    assert t.append_stream_batch(b1, "q-rb", 1, now_ms=4) is not None
    got = {(r["k"], r["v"]) for r in t.read(spark).collect()}
    assert got == {(1, 10), (2, 20)}


def test_iceberg_epoch_sink_survives_checkpoint_loss(spark, tmp_path):
    """Real Structured Streaming drain into Iceberg: same contract as
    the Delta twin — fresh-checkpoint replays are refused by the
    table's own epoch watermark."""
    from hadoop_sync_spark.iceberg_meta import IcebergTable
    from hadoop_sync_spark.streaming.pipeline import iceberg_epoch_sink

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]}).to_parquet(
        os.path.join(src_dir, "part-000.parquet"))
    table = str(tmp_path / "ice_sink")
    t = IcebergTable.create(table, [("k", "bigint"), ("v", "bigint")],
                            now_ms=1)

    def stream():
        return (spark.readStream
                .schema("k long, v long")
                .parquet(src_dir))

    iceberg_epoch_sink(stream(), table, "q-loss", str(tmp_path / "c1"))
    assert t.read(spark).count() == 3
    iceberg_epoch_sink(stream(), table, "q-loss", str(tmp_path / "c1"))
    assert t.read(spark).count() == 3
    # checkpoint LOST -> batch ids restart at 0 -> refused by summary
    iceberg_epoch_sink(stream(), table, "q-loss", str(tmp_path / "c2"))
    assert t.read(spark).count() == 3
    got = {(r["k"], r["v"]) for r in t.read(spark).collect()}
    assert got == {(1, 10), (2, 20), (3, 30)}
