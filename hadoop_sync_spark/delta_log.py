"""Delta Lake transaction-log reader/committer — lakehouse interop for the
registry's catalog model (reference parity: the registry's versioned
publish, ``HdfsSynchronizer.java:223-325``, is the same
directory-of-versions idea; this module speaks the OPEN format a 2026
lake actually stores, so the engine can read tables other writers
produce).

Implemented from the public Delta protocol specification
(github.com/delta-io/delta PROTOCOL.md) — NOT a binding to the
``delta-spark`` package (absent in this container), and no code derived
from it:

- a table is ``<dir>/*.parquet`` data files plus ``<dir>/_delta_log/``
  holding ordered commits ``%020d.json``, each line one ACTION object:
  ``protocol``, ``metaData`` (with ``schemaString`` — Spark's own
  StructType JSON), ``add {path, partitionValues, size,
  modificationTime, dataChange}``, ``remove {path}``;
- a snapshot at version V is the last-writer-wins replay of actions
  0..V: a path is live iff its latest action ≤ V is an ``add``;
- ``N.checkpoint.parquet`` (+ the ``_last_checkpoint`` pointer) compacts
  the replay prefix: one row per surviving action, struct columns
  ``protocol / metaData / add / remove``; a reader seeds from the
  newest checkpoint ≤ V and replays only the JSON tail.

Scale posture: log replay is METADATA work — KBs per commit, one driver
pass, exactly where production Delta does it — while the data files the
snapshot selects are read by executors through the normal parquet
scan (predicate pushdown / column pruning intact, since the file list
feeds a plain ``spark.read.parquet``).  Checkpointing keeps replay
O(tail) instead of O(#commits).  Partitioned tables resolve partition
columns from the directory layout via ``basePath``.

Honest seams: reader features beyond protocol v1 (deletion vectors,
column mapping — ``minReaderVersion > 1``) raise instead of silently
mis-reading.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

_LOG_DIR = "_delta_log"
_LAST_CHECKPOINT = "_last_checkpoint"


def _commit_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _LOG_DIR, f"{version:020d}.json")


def _checkpoint_path(table_dir: str, version: int) -> str:
    return os.path.join(
        table_dir, _LOG_DIR, f"{version:020d}.checkpoint.parquet"
    )


@dataclass
class Snapshot:
    """Replay result at one version: live file infos + table metadata."""

    version: int
    schema_json: str | None
    partition_columns: tuple[str, ...]
    #: path -> add action dict (relative paths, exactly as logged)
    live: dict[str, dict] = field(default_factory=dict)

    @property
    def files(self) -> list[str]:
        return sorted(self.live)

    def schema(self) -> StructType | None:
        if self.schema_json is None:
            return None
        return StructType.fromJson(json.loads(self.schema_json))


class DeltaLog:
    """Reader + minimal committer for one Delta table directory."""

    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        self.log_dir = os.path.join(table_dir, _LOG_DIR)

    # ---- log structure -------------------------------------------------
    def versions(self) -> list[int]:
        """Sorted commit versions present in the log."""
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for name in os.listdir(self.log_dir):
            if name.endswith(".json") and len(name) == 25:
                try:
                    out.append(int(name[:20]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no Delta log at {self.log_dir}")
        return vs[-1]

    def _checkpoint_versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for name in os.listdir(self.log_dir):
            if name.endswith(".checkpoint.parquet"):
                try:
                    out.append(int(name.split(".", 1)[0]))
                except ValueError:
                    continue
        return sorted(out)

    # ---- replay --------------------------------------------------------
    def _apply(self, snap: Snapshot, action: dict) -> None:
        if "protocol" in action:
            mrv = action["protocol"].get("minReaderVersion", 1)
            if mrv > 1:
                raise NotImplementedError(
                    f"Delta minReaderVersion={mrv}: deletion vectors / "
                    "column mapping are beyond this reader (protocol v1); "
                    "refusing to silently mis-read"
                )
        elif "metaData" in action:
            md = action["metaData"]
            snap.schema_json = md.get("schemaString", snap.schema_json)
            snap.partition_columns = tuple(md.get("partitionColumns", ()))
        elif "add" in action:
            add = action["add"]
            snap.live[add["path"]] = add
        elif "remove" in action:
            snap.live.pop(action["remove"]["path"], None)
        # commitInfo / txn / cdc: no snapshot effect for a batch reader

    def snapshot(self, version: int | None = None) -> Snapshot:
        """Replay to ``version`` (default latest), seeding from the
        newest checkpoint ≤ version when one exists."""
        if version is None:
            version = self.latest_version()
        snap = Snapshot(version=version, schema_json=None,
                        partition_columns=())
        start = 0
        cps = [v for v in self._checkpoint_versions() if v <= version]
        if cps:
            self._seed_from_checkpoint(snap, cps[-1])
            start = cps[-1] + 1
        for v in range(start, version + 1):
            path = _commit_path(self.table_dir, v)
            if not os.path.exists(path):
                if v == 0:
                    raise FileNotFoundError(path)
                raise FileNotFoundError(
                    f"commit {v} missing (vacuumed?) while replaying to "
                    f"{version}: {path}"
                )
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        self._apply(snap, json.loads(line))
        return snap

    # ---- Spark read ----------------------------------------------------
    def read(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """The snapshot as a DataFrame: executors scan exactly the live
        files through the ordinary parquet source (pushdown intact).
        Partition columns attach from the logged ``add.partitionValues``
        (the protocol makes them authoritative — a conforming writer may
        lay files out flat, ADVICE r7) via the shared decoded-path
        broadcast join, cast from the logged strings to the schema's
        types; directory inference via ``basePath`` remains only as the
        fallback for logs whose adds never carried values.  An empty
        snapshot yields an empty frame with the logged schema."""
        snap = self.snapshot(version)
        files = [
            os.path.join(self.table_dir, p) for p in snap.files
        ]
        if not files:
            schema = snap.schema()
            if schema is None:
                raise ValueError("empty table with no metaData action")
            return spark.createDataFrame([], schema)
        schema = snap.schema()
        if not snap.partition_columns:
            reader = spark.read
            if schema is not None:
                # pinning the logged schema skips footer inference
                reader = reader.schema(schema)
            return reader.parquet(*files)
        part_cols = list(snap.partition_columns)
        adds = [snap.live[p] for p in snap.files]
        if all(
            set(part_cols) <= set(a.get("partitionValues") or {})
            for a in adds
        ):
            from hadoop_sync_spark.io import attach_file_columns

            rows = [
                (os.path.abspath(os.path.join(self.table_dir, a["path"])),)
                + tuple(
                    None
                    if a["partitionValues"][c] is None
                    else str(a["partitionValues"][c])
                    for c in part_cols
                )
                for a in adds
            ]
            df = attach_file_columns(
                spark.read.parquet(*files),
                rows,
                part_cols,
                what="delta snapshot partition",
            )
            if schema is not None:
                # the protocol logs partition values as strings; the
                # logged schema owns their real types
                for f in schema.fields:
                    if f.name in part_cols:
                        df = df.withColumn(
                            f.name, F.col(f.name).cast(f.dataType)
                        )
            return df
        # fallback: Hive-style layout inference for value-less logs
        return (
            spark.read.option("basePath", self.table_dir).parquet(*files)
        )

    # ---- minimal committer (fixture builder + registry export) ---------
    def commit(self, version: int, actions: list[dict]) -> str:
        """Write one commit atomically (temp file + rename, the same
        put-if-absent discipline as the registry's pointer swap).
        Refuses to overwrite an existing version."""
        os.makedirs(self.log_dir, exist_ok=True)
        path = _commit_path(self.table_dir, version)
        if os.path.exists(path):
            raise FileExistsError(f"Delta commit {version} already exists")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            for a in actions:
                fh.write(json.dumps(a, separators=(",", ":")) + "\n")
        os.rename(tmp, path)
        return path

    def add_action_for(self, rel_path: str, **extra) -> dict:
        """``add`` action for a data file already placed in the table
        dir (size/mtime from the filesystem, as writers log them)."""
        st = os.stat(os.path.join(self.table_dir, rel_path))
        return {
            "add": {
                "path": rel_path,
                "partitionValues": extra.pop("partitionValues", {}),
                "size": st.st_size,
                "modificationTime": int(st.st_mtime * 1000),
                "dataChange": True,
                **extra,
            }
        }

    # ---- checkpoints ---------------------------------------------------
    _CP_COLS = ("protocol", "metaData", "add", "remove")

    def write_checkpoint(self, version: int | None = None) -> str:
        """Compact the replay prefix ≤ version into
        ``N.checkpoint.parquet`` (one action per row, struct columns per
        the spec) and point ``_last_checkpoint`` at it."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        snap = self.snapshot(version)
        rows: list[dict] = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        ]
        if snap.schema_json is not None:
            rows.append(
                {
                    "metaData": {
                        "schemaString": snap.schema_json,
                        "partitionColumns": list(snap.partition_columns),
                    }
                }
            )
        for path in snap.files:
            add = dict(snap.live[path])
            add["partitionValues"] = [
                (k, v) for k, v in (add.get("partitionValues") or {}).items()
            ]
            rows.append({"add": add})
        cols = {}
        for col in self._CP_COLS:
            cols[col] = [r.get(col) for r in rows]
        schema = pa.schema(
            [
                pa.field(
                    "protocol",
                    pa.struct(
                        [("minReaderVersion", pa.int32()),
                         ("minWriterVersion", pa.int32())]
                    ),
                ),
                pa.field(
                    "metaData",
                    pa.struct(
                        [("schemaString", pa.string()),
                         ("partitionColumns", pa.list_(pa.string()))]
                    ),
                ),
                pa.field(
                    "add",
                    pa.struct(
                        [
                            ("path", pa.string()),
                            ("partitionValues",
                             pa.map_(pa.string(), pa.string())),
                            ("size", pa.int64()),
                            ("modificationTime", pa.int64()),
                            ("dataChange", pa.bool_()),
                        ]
                    ),
                ),
                pa.field(
                    "remove", pa.struct([("path", pa.string())])
                ),
            ]
        )
        table = pa.table(
            {c: pa.array(cols[c], type=schema.field(c).type)
             for c in self._CP_COLS},
            schema=schema,
        )
        cp_path = _checkpoint_path(self.table_dir, snap.version)
        pq.write_table(table, cp_path)
        with open(
            os.path.join(self.log_dir, _LAST_CHECKPOINT), "w",
            encoding="utf-8",
        ) as fh:
            json.dump({"version": snap.version, "size": len(rows)}, fh)
        return cp_path

    # ---- lifecycle (the registry's A23 ops on the open format) --------
    def history(self) -> list[dict]:
        """One row per commit, newest first: version, file mtime, and
        the action mix — the DESCRIBE HISTORY shape.  Metadata-only."""
        out = []
        for v in reversed(self.versions()):
            path = _commit_path(self.table_dir, v)
            counts: dict[str, int] = {}
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        for key in json.loads(line):
                            counts[key] = counts.get(key, 0) + 1
            out.append(
                {
                    "version": v,
                    "timestamp_ms": int(os.path.getmtime(path) * 1000),
                    "actions": counts,
                }
            )
        return out

    def vacuum(self) -> list[str]:
        """Delete data files no longer referenced by the LATEST snapshot
        (the Delta VACUUM with retention 0 for this container's
        single-writer fixtures — production retention windows exist to
        protect concurrent readers of old snapshots; after vacuum, time
        travel to versions needing removed files fails at read, exactly
        like the registry's post-vacuum reads).  Returns deleted paths.
        Never touches the log itself."""
        live = set(self.snapshot().files)
        deleted = []
        for root, dirs, files in os.walk(self.table_dir):
            if _LOG_DIR in root.split(os.sep):
                continue
            for name in files:
                if not name.endswith(".parquet"):
                    continue
                full = os.path.join(root, name)
                rel = os.path.relpath(full, self.table_dir)
                if rel not in live:
                    os.remove(full)
                    deleted.append(rel)
        return sorted(deleted)

    def _seed_from_checkpoint(self, snap: Snapshot, version: int) -> None:
        import pyarrow.parquet as pq

        table = pq.read_table(_checkpoint_path(self.table_dir, version))
        for row in table.to_pylist():
            action = {
                k: v for k, v in row.items() if v is not None
            }
            if "add" in action:
                pv = action["add"].get("partitionValues")
                if isinstance(pv, list):
                    action["add"]["partitionValues"] = dict(pv)
            self._apply(snap, action)
