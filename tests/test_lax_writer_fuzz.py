"""Lax-external-writer robustness: spec-LEGAL metadata variants a
different conforming writer could produce must not change what a read
returns.

Every interop bug this repo's history records came from exactly this
class — a form the spec permits but our own writer never emits
(parquet-null struct members, schemas stored out of list-position
order, absolute-URI file paths).  This suite builds a canonical table
on each format, captures its rows, then rewrites the METADATA ONLY
(commit JSONs / vN.metadata.json) through mutations the spec allows:

- explicit JSON ``null`` for optional absent fields (null = absent),
- unknown extra fields in known actions and whole unknown action
  types (forward compatibility: readers ignore what they don't know),
- list reorderings wherever the spec keys by id/name rather than by
  position (Delta action types within a commit; Iceberg's schemas and
  snapshots arrays).

After each mutation the table must read back the SAME rows, and the
metadata-driven faces (time travel, file listing) must keep working.
Data files and DV/delete files are never touched.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

#: slow tier (round 14): metamorphic lax-writer fuzz variants —
#: the strict-writer contracts stay default-covered in the format suites
pytestmark = pytest.mark.slow

from hadoop_sync_spark.delta_log import DeltaLog
from hadoop_sync_spark.iceberg_meta import DataFile, IcebergTable

# ------------------------------------------------------------- delta


def _mk_delta(spark, d):
    os.makedirs(d)
    log = DeltaLog(d)
    schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "v", "type": "long", "nullable": True,
             "metadata": {}},
        ],
    })
    for name, ks, vs in (("a.parquet", [1, 2], [10, 20]),
                         ("b.parquet", [3, 4], [30, 40])):
        pq.write_table(
            pa.table({"k": pa.array(ks, pa.int64()),
                      "v": pa.array(vs, pa.int64())}),
            os.path.join(d, name),
        )
    log.commit(0, [
        {"protocol": {"minReaderVersion": 1}},
        {"metaData": {"id": "t", "format": {"provider": "parquet",
                                            "options": {}},
                      "schemaString": schema, "partitionColumns": [],
                      "configuration": {}}},
        log.add_action_for("a.parquet"),
    ])
    log.commit(1, [log.add_action_for("b.parquet")])
    log.delete_where(spark, {"k": (2, 3)}, now_ms=1000)  # DV commit
    return log


def _delta_rows(spark, d):
    df = DeltaLog(d).read(spark).select("k", "v")
    return sorted(tuple(r) for r in df.collect())


def _rewrite_commits(d, fn):
    """Apply ``fn(version, [action, ...]) -> [action, ...]`` to every
    commit JSON under _delta_log."""
    log_dir = os.path.join(d, "_delta_log")
    for name in sorted(os.listdir(log_dir)):
        if not name.endswith(".json") or "." in name[:-5]:
            continue
        path = os.path.join(log_dir, name)
        with open(path, encoding="utf-8") as fh:
            actions = [json.loads(ln) for ln in fh if ln.strip()]
        out = fn(int(name[:-5]), actions)
        with open(path, "w", encoding="utf-8") as fh:
            for a in out:
                fh.write(json.dumps(a) + "\n")


_DELTA_MUTATIONS = {}


def _delta_mutation(f):
    _DELTA_MUTATIONS[f.__name__] = f
    return f


@_delta_mutation
def nulls_for_absent_optionals(version, actions):
    """JSON null means absent — stuff explicit nulls into every
    optional slot our own writer leaves out."""
    for a in actions:
        if "protocol" in a:
            a["protocol"].setdefault("minWriterVersion", None)
            a["protocol"].setdefault("readerFeatures", None)
            a["protocol"].setdefault("writerFeatures", None)
        if "metaData" in a:
            a["metaData"].setdefault("createdTime", None)
            a["metaData"].setdefault("description", None)
        if "add" in a:
            a["add"].setdefault("tags", None)
            a["add"].setdefault("deletionVector", None)
            a["add"].setdefault("baseRowId", None)
        if "remove" in a:
            a["remove"].setdefault("deletionTimestamp", None)
            a["remove"].setdefault("extendedFileMetadata", None)
    return actions


@_delta_mutation
def unknown_fields_and_actions(version, actions):
    """Readers ignore unrecognized fields in known actions and whole
    unrecognized action types (forward compatibility)."""
    for a in actions:
        for payload in a.values():
            if isinstance(payload, dict):
                payload["x-writer-custom"] = {"engine": "other", "n": 7}
    actions.append({"someFutureAction": {"version": 99}})
    actions.append({"commitInfo": {"engineInfo": "otherEngine/9.9"}})
    return actions


@_delta_mutation
def external_txn_actions(version, actions):
    """Other engines' streaming writers interleave ``txn`` actions
    (transaction identifiers) with file actions.  Batch ROWS must not
    change, replay must survive lax shapes (explicit-null lastUpdated,
    a version-less txn, unknown fields inside the payload), and the
    recorded watermark must still be readable for the well-formed
    entries."""
    actions.append({"txn": {"appId": f"ext-{version}",
                            "version": version,
                            "lastUpdated": None,
                            "x-writer-custom": "z"}})
    if version % 2:
        # spec-violating but seen in the wild: no version field — must
        # not crash replay, and reads back as "no watermark"
        actions.append({"txn": {"appId": "ext-versionless"}})
    return actions


@_delta_mutation
def action_type_order_shuffled(version, actions):
    """protocol/metaData/commitInfo placement within a commit is not
    semantic — move them AFTER the file actions."""
    files = [a for a in actions
             if "add" in a or "remove" in a]
    rest = [a for a in actions
            if not ("add" in a or "remove" in a)]
    return files + rest


def test_delta_lax_writer_variants(spark, tmp_path):
    base = str(tmp_path / "base")
    canonical_log = _mk_delta(spark, base)
    want = _delta_rows(spark, base)
    assert want == [(1, 10), (4, 40)]  # DV killed k=2,3
    want_v0 = sorted(
        tuple(r) for r in
        canonical_log.read(spark, 0).select("k", "v").collect()
    )
    for name, fn in _DELTA_MUTATIONS.items():
        d = str(tmp_path / name)
        log = _mk_delta(spark, d)
        _rewrite_commits(d, fn)
        assert _delta_rows(spark, d) == want, f"mutation {name}"
        # time travel still answers (metadata-driven face)
        got_v0 = sorted(
            tuple(r) for r in
            DeltaLog(d).read(spark, 0).select("k", "v").collect()
        )
        assert got_v0 == want_v0, f"mutation {name} (time travel)"
        # and a later write face still works on the mutated log
        log2 = DeltaLog(d)
        res = log2.delete_where(spark, {"k": (1, 1)}, now_ms=2000)
        assert res["rows_deleted"] == 1, f"mutation {name} (DML after)"
        assert sorted(
            tuple(r)
            for r in log2.read(spark).select("k", "v").collect()
        ) == [(4, 40)], f"mutation {name} (post-DML read)"


# ------------------------------------------------------------- iceberg


def _mk_iceberg(spark, d):
    os.makedirs(os.path.join(d, "data"))
    t = IcebergTable.create(
        d, [("k", "bigint"), ("v", "bigint")], now_ms=1
    )
    for name, ks, vs, now in (("f1.parquet", [1, 2], [10, 20], 1000),
                              ("f2.parquet", [3, 4], [30, 40], 2000)):
        p = os.path.join(d, "data", name)
        pq.write_table(
            pa.table({"k": pa.array(ks, pa.int64()),
                      "v": pa.array(vs, pa.int64())}),
            p,
        )
        t.append([DataFile(f"data/{name}", {}, len(ks),
                           os.path.getsize(p))], now_ms=now)
    t.delete_rows(spark, {"k": (2, 3)}, now_ms=3000)
    t.add_column("c1", "bigint", now_ms=4000)  # 2 schemas in metadata
    return t


def _iceberg_rows(spark, d, **kw):
    df = IcebergTable(d).read(spark, **kw).select("k", "v")
    return sorted(tuple(r) for r in df.collect())


def _rewrite_metadata(d, fn):
    t = IcebergTable(d)
    v = t.current_version()
    path = os.path.join(d, "metadata", f"v{v}.metadata.json")
    with open(path, encoding="utf-8") as fh:
        meta = json.load(fh)
    meta = fn(meta)
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(meta, fh, indent=1)


_ICE_MUTATIONS = {}


def _ice_mutation(f):
    _ICE_MUTATIONS[f.__name__] = f
    return f


@_ice_mutation
def schemas_list_reversed(meta):
    """Schemas key by schema-id, never by list position."""
    meta["schemas"] = list(reversed(meta["schemas"]))
    return meta


@_ice_mutation
def snapshots_list_reversed(meta):
    """Snapshots key by snapshot-id / timestamp, never by position."""
    meta["snapshots"] = list(reversed(meta["snapshots"]))
    return meta


@_ice_mutation
def unknown_keys_everywhere(meta):
    """Forward compatibility: ignore unknown fields."""
    meta["x-writer-custom"] = {"engine": "other"}
    for s in meta.get("snapshots", []):
        s["x-custom"] = 7
    for s in meta.get("schemas", []):
        s["x-custom"] = True
    return meta


def test_iceberg_lax_writer_variants(spark, tmp_path):
    base = str(tmp_path / "base")
    t = _mk_iceberg(spark, base)
    want = _iceberg_rows(spark, base)
    assert want == [(1, 10), (4, 40)]
    s1 = t.metadata()["snapshots"][0]["snapshot-id"]
    want_s1 = _iceberg_rows(spark, base, snapshot_id=s1)
    for name, fn in _ICE_MUTATIONS.items():
        d = str(tmp_path / name)
        _mk_iceberg(spark, d)
        _rewrite_metadata(d, fn)
        assert _iceberg_rows(spark, d) == want, f"mutation {name}"
        # time travel (snapshot lookup is by id)
        assert _iceberg_rows(spark, d, snapshot_id=s1) == want_s1, (
            f"mutation {name} (time travel)"
        )
        # a filtered read resolves names through the CURRENT schema
        # even with the schemas array reordered
        t2 = IcebergTable(d)
        got = sorted(
            tuple(r) for r in t2.read(
                spark, column_filter={"v": (40, 40)}
            ).select("k", "v").collect()
        )
        assert got == [(4, 40)], f"mutation {name} (filtered read)"
        # and a write face still composes on the mutated metadata
        assert t2.delete_rows(spark, {"k": (1, 1)}, now_ms=9000) == 1, (
            f"mutation {name} (DML after)"
        )
        assert _iceberg_rows(spark, d) == [(4, 40)], (
            f"mutation {name} (post-DML read)"
        )
