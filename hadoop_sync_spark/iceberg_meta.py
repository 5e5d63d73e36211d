"""Apache Iceberg table-format reader/committer — the Iceberg sibling of
``delta_log.py``, implemented from the PUBLIC table spec
(iceberg.apache.org/spec, format v2) with no ``pyiceberg``/runtime
binding (absent in this container).  Manifest lists and manifests are
real Avro Object Container Files via the from-scratch codec in
``avro_codec.py``.

The metadata tree implemented:

- ``<table>/metadata/v<N>.metadata.json`` — table metadata: format
  version, table uuid, schemas (Iceberg field-id struct JSON), partition
  specs, the snapshot list (each with ``manifest-list`` path, timestamp,
  sequence number, operation summary), ``current-snapshot-id``,
  ``snapshot-log``; ``version-hint.text`` carries N (the HadoopCatalog
  convention, also public).
- snapshot → **manifest list** (Avro): one row per manifest with path,
  length, spec id, content kind, sequence numbers, added/existing/
  deleted file+row counts, and per-partition-field summaries
  (``contains_null`` + lower/upper bounds) — the layer Iceberg's scan
  planning prunes on before touching any manifest.
- manifest → **manifest entries** (Avro): status
  (EXISTING=0/ADDED=1/DELETED=2), snapshot id, sequence numbers, and the
  ``data_file`` struct (content, path, format, partition values, record
  count, file size).  A file is live in a snapshot iff its newest entry
  has status ≠ DELETED and ``content`` = data.

Commits follow Iceberg's optimistic protocol shape: write the new
manifest + manifest list + ``v(N+1).metadata.json`` via O_EXCL
put-if-absent (two writers racing the same version: exactly one wins),
then point ``version-hint.text`` at it — the swap-a-pointer discipline
the registry's A23 publish (registry.py::_publish) and the Delta
committer already use.  ``delete`` is copy-on-write at the metadata
level: a replacement manifest rewrites surviving entries as EXISTING and
removed ones as DELETED, exactly how Iceberg's ``overwrite`` snapshots
express file-level deletes.  **Merge-on-read is implemented too**
(round 8): position-delete files (reserved-field-id (file_path, pos)
parquet, content=1) and equality-delete files (equality_ids columns,
content=2) commit into separate delete manifests with spec-correct v2
sequence-number inheritance and carry-forward, and ``read`` subtracts
them with broadcast anti-joins keyed on ``_metadata.row_index`` /
null-safe column equality, honoring the sequence rules (position: data
seq ≤ delete seq; equality: strictly older — upsert semantics).

Scale posture: identical to the Delta reader — the metadata walk is
KB-scale driver work (exactly where production Iceberg plans scans: the
manifest-list layer exists so planning reads O(manifests touched), not
O(files)); the selected data files feed a plain distributed
``spark.read.parquet`` with pushdown/pruning intact.  Partition pruning
happens at BOTH metadata layers: manifest-list field summaries skip
whole manifests, entry partition values skip files — before a single
data byte is read.

Reference parity: the reference's catalog tracks shards per table
(CitusMetadataSync); Iceberg's manifest tree is the open-format
equivalent of that shard list, which is why ``Registry.diff`` can treat
a snapshot as FS state (the round-7 Delta integration pattern, A12-A16).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field as dataclasses_field

from hadoop_sync_spark.avro_codec import read_ocf, write_ocf
from hadoop_sync_spark.io import (
    BROADCAST_DELETE_ROW_LIMIT as _BROADCAST_DELETE_ROW_LIMIT,
)

_STATUS_EXISTING, _STATUS_ADDED, _STATUS_DELETED = 0, 1, 2
#: data_file.content (spec: Data File struct)
_CONTENT_DATA = 0
_CONTENT_POS_DELETES = 1
_CONTENT_EQ_DELETES = 2
#: manifest_file.content (spec: Manifest Lists)
_MANIFEST_DATA = 0
_MANIFEST_DELETES = 1
#: reserved field ids of the position-delete file schema (spec:
#: Position Delete Files)
_POS_DELETE_FILE_PATH_ID = 2147483546
_POS_DELETE_POS_ID = 2147483545

#: Spark simpleString → Iceberg primitive type names (the subset the
#: fixture tables need; anything else raises honestly).
_SPARK_TO_ICEBERG = {
    "bigint": "long",
    "int": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "binary": "binary",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
}

#: the spec's primitive type-promotion lattice ("Schema Evolution":
#: int → long, float → double; decimal widening is out of our type
#: map).  JSON-encoded type strings, matching _rename_history's walk.
_PROMOTIONS = {('"int"', '"long"'), ('"float"', '"double"')}


def _iceberg_schema_json(fields: list[tuple[str, str]]) -> dict:
    """[(name, spark_type)] → Iceberg struct schema with field ids."""
    out = []
    for i, (name, spark_t) in enumerate(fields, start=1):
        if spark_t not in _SPARK_TO_ICEBERG:
            raise NotImplementedError(
                f"no Iceberg mapping for Spark type {spark_t!r}"
            )
        out.append(
            {
                "id": i,
                "name": name,
                "required": False,
                "type": _SPARK_TO_ICEBERG[spark_t],
            }
        )
    return {"type": "struct", "schema-id": 0, "fields": out}


def _partition_avro_fields(spec_fields: list[dict]) -> list[dict]:
    """Iceberg spec fields → Avro record fields for the ``partition``
    struct inside data_file.  The type rides in the spec; ``date`` (the
    spec's result type for the ``day`` transform) is Avro int underneath
    (days from epoch — spec Appendix A maps date to ``int`` with the
    ``date`` logical annotation, which plain-int readers interop with)."""
    avro_t = {"int": "int", "long": "long", "string": "string", "date": "int"}
    return [
        {
            "name": f["name"],
            "type": ["null", avro_t[f["result-type"]]],
            "default": None,
        }
        for f in spec_fields
    ]


def _manifest_entry_schema(spec_fields: list[dict]) -> dict:
    part = {
        "type": "record",
        "name": "r102",
        "fields": _partition_avro_fields(spec_fields),
    }
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int"},
            {"name": "file_path", "type": "string"},
            {"name": "file_format", "type": "string"},
            {"name": "partition", "type": part},
            {"name": "record_count", "type": "long"},
            {"name": "file_size_in_bytes", "type": "long"},
            # equality-delete files only (content=2): schema field ids
            # the delete rows compare on (spec: equality_ids, id 135)
            {
                "name": "equality_ids",
                "type": ["null", {"type": "array", "items": "int"}],
                "default": None,
            },
            # per-COLUMN value bounds (spec: lower_bounds id 125 /
            # upper_bounds id 128, map<field id, single-value bytes>
            # ridden as Avro array-of-record like Iceberg's own files;
            # round 9) — the layer that prunes FILES on non-partition
            # predicates before any data byte is read
            {
                "name": "lower_bounds",
                "type": ["null", {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "k126_v127",
                        "fields": [
                            {"name": "key", "type": "int"},
                            {"name": "value", "type": "bytes"},
                        ],
                    },
                }],
                "default": None,
            },
            {
                "name": "upper_bounds",
                "type": ["null", {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "k129_v130",
                        "fields": [
                            {"name": "key", "type": "int"},
                            {"name": "value", "type": "bytes"},
                        ],
                    },
                }],
                "default": None,
            },
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"], "default": None},
            {
                "name": "sequence_number",
                "type": ["null", "long"],
                "default": None,
            },
            {
                "name": "file_sequence_number",
                "type": ["null", "long"],
                "default": None,
            },
            {"name": "data_file", "type": data_file},
        ],
    }


_FIELD_SUMMARY = {
    "type": "record",
    "name": "field_summary",
    "fields": [
        {"name": "contains_null", "type": "boolean"},
        {"name": "contains_nan", "type": ["null", "boolean"], "default": None},
        {"name": "lower_bound", "type": ["null", "bytes"], "default": None},
        {"name": "upper_bound", "type": ["null", "bytes"], "default": None},
    ],
}

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
        {"name": "added_files_count", "type": "int"},
        {"name": "existing_files_count", "type": "int"},
        {"name": "deleted_files_count", "type": "int"},
        {"name": "added_rows_count", "type": "long"},
        {"name": "existing_rows_count", "type": "long"},
        {"name": "deleted_rows_count", "type": "long"},
        {
            "name": "partitions",
            "type": ["null", {"type": "array", "items": _FIELD_SUMMARY}],
            "default": None,
        },
    ],
}


def _le_bytes(v, typ: str) -> bytes:
    """Iceberg single-value serialization for bounds (spec Appendix D):
    little-endian for int/long (date = int days from epoch, spec
    Appendix D "Single-value serialization"), UTF-8 for strings."""
    import struct as _s

    if typ in ("int", "date"):
        return _s.pack("<i", v)
    if typ == "long":
        return _s.pack("<q", v)
    if typ == "double":
        return _s.pack("<d", v)
    if typ == "float":
        return _s.pack("<f", v)
    if typ == "string":
        return v.encode("utf-8")
    raise NotImplementedError(f"bound serialization for {typ!r}")


def _from_le_bytes(b: bytes, typ: str):
    import struct as _s

    if typ in ("int", "date"):
        return _s.unpack("<i", b)[0]
    if typ == "long":
        # a promoted column's pre-promotion bounds are 4-byte ints —
        # the single-value serialization is width-determined (spec
        # Appendix D), so read by buffer width
        return _s.unpack("<i" if len(b) == 4 else "<q", b)[0]
    if typ == "double":
        return _s.unpack("<f" if len(b) == 4 else "<d", b)[0]
    if typ == "float":
        return _s.unpack("<f", b)[0]
    if typ == "string":
        return b.decode("utf-8")
    raise NotImplementedError(f"bound deserialization for {typ!r}")


def parquet_column_bounds(
    path: str, fields: list[dict]
) -> tuple[dict, dict]:
    """Per-column [min, max] bounds from a parquet file's FOOTER
    statistics (no data pages read), serialized to the spec's
    single-value bytes keyed by schema field id — what a conforming
    writer stamps into ``lower_bounds``/``upper_bounds``.  Columns
    without footer stats, with unsupported types, or absent from the
    file are skipped (their absence never prunes — sound)."""
    import pyarrow.parquet as pq

    by_name = {
        f["name"]: (f["id"], f["type"])
        for f in fields
        if isinstance(f["type"], str)
    }
    vals_lo: dict[int, object] = {}
    vals_hi: dict[int, object] = {}
    typ_of: dict[int, str] = {}
    md = pq.read_metadata(path)
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            info = by_name.get(col.path_in_schema)
            st = col.statistics
            if info is None or st is None or not st.has_min_max:
                continue
            fid, typ = info
            mn, mx = st.min, st.max
            if typ == "string" and isinstance(mn, bytes):
                mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
            if typ == "date":
                # footer stats surface python dates; the spec's
                # single-value form is int days from epoch
                import datetime as _dt

                if isinstance(mn, _dt.date):
                    epoch = _dt.date(1970, 1, 1)
                    mn, mx = (mn - epoch).days, (mx - epoch).days
            typ_of[fid] = typ
            vals_lo[fid] = mn if fid not in vals_lo else min(vals_lo[fid], mn)
            vals_hi[fid] = mx if fid not in vals_hi else max(vals_hi[fid], mx)
    lo: dict[int, bytes] = {}
    hi: dict[int, bytes] = {}
    for fid, v in vals_lo.items():
        try:
            lo[fid] = _le_bytes(v, typ_of[fid])
            hi[fid] = _le_bytes(vals_hi[fid], typ_of[fid])
        except NotImplementedError:
            # a column type without single-value serialization skips
            # INDIVIDUALLY — a partial map over the supported columns is
            # equally sound (absence never prunes), and discarding the
            # whole file's map was pure selectivity loss on mixed-type
            # tables (ADVICE r9)
            lo.pop(fid, None)
            continue
    return lo, hi


# ------------------------------------------------------- partition transforms
def _murmur3_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86 32-bit (public domain algorithm; the hash the
    Iceberg spec mandates for bucket transforms, Appendix B)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed
    n = len(data) & ~3
    for i in range(0, n, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[n:]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - 0x100000000 if h & 0x80000000 else h


def transform_value(transform: str, value):
    """Apply an Iceberg partition transform to a SOURCE-domain value
    (spec "Partition Transforms"): identity; ``bucket[N]`` =
    ``(murmur3(v) & Int.MAX) % N`` with int/long hashed as 8-byte
    little-endian longs and strings as UTF-8 (Appendix B — so buckets
    agree byte-for-byte with every conforming writer); ``truncate[W]``
    = ``v - (v mod W)`` for integers (mod always non-negative) and the
    W-codepoint prefix for strings.  None maps to None under every
    transform.  Temporal transforms (spec "Partition Transforms" table):
    ``year``/``month``/``day`` over dates and timestamps, ``hour`` over
    timestamps — all FLOOR-based ordinals from the 1970 epoch (so
    1969-12-31 → year −1, month −1, day −1), matching the spec's example
    column (2017-11-16 → year 47, month 574, day 17486; its 22:31:08
    timestamp → hour 17486·24+22 = 419686).  Source values must be
    ``datetime.date`` /
    ``datetime.datetime`` (naive = UTC, the Iceberg timestamp type) —
    a bare int is ambiguous between days-from-epoch and micros and
    raises rather than guessing.  ``void`` maps every value to None
    (spec: the v1 partition-evolution tombstone — dropped fields keep
    their slot with the void transform; external v1-evolved specs
    carry them and record null for every file)."""
    import datetime as _dt

    if transform == "void":
        return None
    if value is None or transform == "identity":
        return value
    if transform in ("year", "month", "day", "hour"):
        is_ts = isinstance(value, _dt.datetime)
        if not is_ts and not isinstance(value, _dt.date):
            raise NotImplementedError(
                f"{transform} transform on {type(value).__name__} "
                "(pass datetime.date/datetime.datetime)"
            )
        if transform == "hour":
            if not is_ts:
                raise NotImplementedError("hour transform on date")
            micros = (
                value - _dt.datetime(1970, 1, 1, tzinfo=value.tzinfo)
            ) // _dt.timedelta(microseconds=1)
            return micros // 3_600_000_000
        d = value.date() if is_ts else value
        if transform == "year":
            return d.year - 1970
        if transform == "month":
            return (d.year - 1970) * 12 + (d.month - 1)
        return (d - _dt.date(1970, 1, 1)).days
    if transform.startswith("bucket["):
        n = int(transform[7:-1])
        if isinstance(value, bool):
            raise NotImplementedError("bucket on boolean")
        if isinstance(value, int):
            data = (value & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
        elif isinstance(value, str):
            data = value.encode("utf-8")
        elif isinstance(value, (bytes, bytearray)):
            data = bytes(value)
        else:
            raise NotImplementedError(
                f"bucket transform on {type(value).__name__}"
            )
        return (_murmur3_32(data) & 0x7FFFFFFF) % n
    if transform.startswith("truncate["):
        w = int(transform[9:-1])
        if isinstance(value, int) and not isinstance(value, bool):
            return value - (value % w)
        if isinstance(value, str):
            return value[:w]
        raise NotImplementedError(
            f"truncate transform on {type(value).__name__}"
        )
    raise NotImplementedError(f"partition transform {transform!r}")


def _bucket_hash_i64_np(vals):
    """Vectorized MurmurHash3 x86 32-bit over int64 values hashed as
    8-byte little-endian longs (spec Appendix B) — numpy modular uint32
    arithmetic, bit-for-bit equal to :func:`_murmur3_32` on the same
    bytes (property-tested).  Returns uint32 hashes; callers apply
    ``(h & Int.MAX) % N``."""
    import numpy as np

    u = np.asarray(vals, dtype=np.int64).view(np.uint64)
    c1, c2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)
    h = np.zeros(len(u), dtype=np.uint32)
    for shift in (np.uint64(0), np.uint64(32)):
        k = ((u >> shift) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        k = k * c1
        k = (k << np.uint32(15)) | (k >> np.uint32(17))
        k = k * c2
        h = h ^ k
        h = (h << np.uint32(13)) | (h >> np.uint32(19))
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h = h ^ np.uint32(8)  # total byte length
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> np.uint32(16))
    return h


def transform_column(transform: str, src: str, src_type: str):
    """Per-ROW twin of :func:`transform_value`: a pyspark Column
    computing the PARTITION-DOMAIN value of ``transform`` over source
    column ``src`` (Iceberg type ``src_type``) — what lets the write
    faces split a frame on bucket/truncate/temporal default specs
    (round 13, VERDICT r12 item 2) instead of refusing.

    Everything but bucket stays JVM-side (whole-stage codegen):
    truncate via pmod/substring, temporal via tz-independent paths —
    ``timestamptz`` through ``unix_micros`` (absolute, never the
    session zone; chronofield extraction on TimestampType would be
    session-tz dependent), ``timestamp`` (ntz) through wall-clock
    casts (tz-free by construction), ``date`` through datediff.
    ``bucket[N]`` is the one Python seam — Iceberg's murmur3 has no
    Spark builtin — and runs as an Arrow-batched pandas UDF:
    vectorized numpy for int/long keys, per-value UTF-8 hashing for
    strings.  NULL maps to NULL under every transform, matching
    transform_value.  Unsupported (transform, type) pairs refuse with
    both names."""
    import datetime as _dt

    from pyspark.sql import functions as F

    col = F.col(src)
    if transform == "identity":
        return col
    if transform == "void":
        return F.lit(None)
    if transform.startswith("truncate["):
        w = int(transform[9:-1])
        if src_type in ("int", "long"):
            return col - F.pmod(col, F.lit(w))
        if src_type == "string":
            return F.substring(col, 1, w)
        raise NotImplementedError(
            f"truncate transform on iceberg type {src_type!r}"
        )
    if transform.startswith("bucket["):
        n = int(transform[7:-1])
        # explicit eval type: the module's future-annotations mode
        # breaks pandas_udf's type-hint inference for local aliases
        # (the "prefer type hints" UserWarning is silenced — explicit
        # is the working spelling here, not a legacy one)
        import warnings as _warnings

        from pyspark.sql.functions import pandas_udf
        from pyspark.util import PythonEvalType

        def _scalar_udf(fn):
            with _warnings.catch_warnings():
                _warnings.simplefilter("ignore", UserWarning)
                return pandas_udf(
                    fn, "int", PythonEvalType.SQL_SCALAR_PANDAS_UDF
                )

        if src_type in ("int", "long"):

            def _bucket_i(s):
                import pandas as _pd

                mask = s.isna()
                vals = s.fillna(0).astype("int64").to_numpy()
                h = _bucket_hash_i64_np(vals)
                out = _pd.Series((h & 0x7FFFFFFF) % n, dtype="Int32")
                out[mask.to_numpy()] = None
                return out

            return _scalar_udf(_bucket_i)(col)
        if src_type == "string":

            def _bucket_s(s):
                import pandas as _pd

                return _pd.Series(
                    [None if v is None
                     else (_murmur3_32(v.encode("utf-8"))
                           & 0x7FFFFFFF) % n
                     for v in s],
                    dtype="Int32",
                )

            return _scalar_udf(_bucket_s)(col)
        raise NotImplementedError(
            f"bucket transform on iceberg type {src_type!r}"
        )
    if transform in ("year", "month", "day", "hour"):
        if src_type == "date":
            d = col
        elif src_type == "timestamp":  # ntz: wall-clock, tz-free
            d = col.cast("date")
        elif src_type == "timestamptz":
            # exact int64 floor division (pmod then `div`): a plain
            # double divide loses low bits past 2^53 micros
            q = f"`{src}`"

            def _floor_div(d_us: int):
                return F.expr(
                    f"cast((unix_micros({q}) - pmod(unix_micros({q}),"
                    f" {d_us})) div {d_us} as int)"
                )

            if transform == "hour":
                return _floor_div(3_600_000_000)
            d = F.date_from_unix_date(_floor_div(86_400_000_000))
        else:
            raise NotImplementedError(
                f"{transform} transform on iceberg type {src_type!r}"
            )
        if transform == "hour":
            if src_type == "date":
                raise NotImplementedError("hour transform on date")
            # ntz wall-clock hour ordinal: epoch-day * 24 + hour-of-day
            return (
                F.datediff(d, F.lit(_dt.date(1970, 1, 1))) * F.lit(24)
                + F.hour(col)
            ).cast("int")
        if transform == "year":
            return (F.year(d) - F.lit(1970)).cast("int")
        if transform == "month":
            return (
                (F.year(d) - F.lit(1970)) * F.lit(12)
                + F.month(d) - F.lit(1)
            ).cast("int")
        return F.datediff(
            d, F.lit(_dt.date(1970, 1, 1))
        ).cast("int")
    raise NotImplementedError(f"partition transform {transform!r}")


#: driver-side join-key normalization for IcebergTable.read's
#: partition-attach map (module-level so tests can poison it to prove
#: the loud-failure guard)
def _norm_path(p: str) -> str:
    return os.path.abspath(p)


@dataclass(frozen=True)
class DataFile:
    path: str
    partition: dict
    record_count: int
    file_size: int
    #: the manifest's file_path string VERBATIM (typically a full URI for
    #: externally written tables, table-relative for ours).  Position
    #: delete files reference data files by this exact string (spec:
    #: "Position-based delete files identify deleted rows by file and
    #: position ... file_path matching the data file"), so the MoR read
    #: path must join on it raw — resolving/relativizing either side
    #: silently resurrects deleted rows on tables whose manifests store
    #: absolute URIs (ADVICE r8).  Empty only for caller-constructed
    #: DataFiles headed INTO the writer (append() stores .path as the
    #: manifest string, so raw == path there).
    raw_path: str = ""
    #: data_file.content: 0 data, 1 position deletes, 2 equality deletes
    content: int = 0
    #: data sequence number (v2 inheritance applied: an ADDED entry with
    #: null sequence_number takes its manifest's) — what decides which
    #: delete files apply to which data files
    sequence: int = 0
    #: equality-delete column field ids (content=2 only)
    equality_ids: tuple = ()
    #: per-column value bounds, {schema field id: single-value bytes}
    #: (spec lower_bounds/upper_bounds; empty = no stats, never pruned)
    lower_bounds: dict = dataclasses_field(default_factory=dict)
    upper_bounds: dict = dataclasses_field(default_factory=dict)
    #: the partition spec the file's manifest was written under (spec
    #: evolution: a snapshot's live files can span specs; carried
    #: entries must rewrite under their ORIGINAL spec's partition
    #: struct or the metadata would lie about what the writer recorded)
    spec_id: int = 0


class IcebergTable:
    """Reader/committer over ``<table_dir>/metadata``.  Data files live
    under ``<table_dir>/data`` by convention but any absolute path in a
    manifest is honored (manifests store full paths per spec)."""

    def __init__(self, table_dir: str):
        self.dir = table_dir
        self.meta_dir = os.path.join(table_dir, "metadata")

    # ------------------------------------------------------------ versions
    def _hint_path(self) -> str:
        return os.path.join(self.meta_dir, "version-hint.text")

    def current_version(self) -> int:
        try:
            with open(self._hint_path()) as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            versions = [
                int(n[1:].split(".")[0])
                for n in os.listdir(self.meta_dir)
                if n.startswith("v") and n.endswith(".metadata.json")
            ]
            if not versions:
                raise ValueError(f"no Iceberg metadata in {self.meta_dir}")
            return max(versions)

    def metadata(self, version: int | None = None) -> dict:
        """Parsed vN.metadata.json.  Deliberately UNCACHED: one read()
        touches this several times, but the documents are KB-scale and
        json.loads dominates the disk read anyway, while any cache
        would have to survive external tampering/expiry of version
        files (a round-10 attempt broke exactly there)."""
        v = self.current_version() if version is None else version
        with open(os.path.join(self.meta_dir, f"v{v}.metadata.json")) as fh:
            meta = json.load(fh)
        if meta.get("format-version") not in (1, 2):
            raise NotImplementedError(
                f"Iceberg format-version {meta.get('format-version')}"
            )
        return meta

    # ------------------------------------------------------------ snapshots
    def snapshots(self) -> list[dict]:
        return list(self.metadata().get("snapshots", []))

    def snapshot(
        self,
        snapshot_id: int | None = None,
        as_of_timestamp_ms: int | None = None,
        ref: str | None = None,
    ) -> dict:
        meta = self.metadata()
        snaps = meta.get("snapshots", [])
        if not snaps:
            raise ValueError("table has no snapshots")
        if ref is not None:
            if snapshot_id is not None or as_of_timestamp_ms is not None:
                raise ValueError(
                    "give ref OR snapshot_id/as_of_timestamp_ms"
                )
            entry = (meta.get("refs") or {}).get(ref)
            if entry is None:
                raise ValueError(f"no such ref {ref!r}")
            return self.snapshot(snapshot_id=entry["snapshot-id"])
        if snapshot_id is not None:
            for s in snaps:
                if s["snapshot-id"] == snapshot_id:
                    return s
            raise ValueError(f"snapshot {snapshot_id} not found")
        if as_of_timestamp_ms is not None:
            eligible = [
                e
                for e in meta.get("snapshot-log", [])
                if e["timestamp-ms"] <= as_of_timestamp_ms
            ]
            if not eligible:
                raise ValueError(
                    f"no snapshot at or before {as_of_timestamp_ms}"
                )
            # snapshot-log is append-ordered (spec): the LAST eligible
            # entry is the state at that time — max() would keep the
            # first of equal timestamps and resolve to an older snapshot
            return self.snapshot(snapshot_id=eligible[-1]["snapshot-id"])
        cur = meta.get("current-snapshot-id")
        if cur is None:
            # the spec makes current-snapshot-id optional (staged /
            # rolled-back tables); recursing with the same arguments
            # would never terminate
            raise ValueError("table has no current snapshot")
        return self.snapshot(snapshot_id=cur)

    # ----------------------------------------------------------------- scan
    def _spec_fields(self, meta: dict, spec_id: int) -> list[dict]:
        for spec in meta.get("partition-specs", []):
            if spec["spec-id"] == spec_id:
                for f in spec["fields"]:
                    tr = f.get("transform", "identity")
                    if tr not in (
                        "identity", "year", "month", "day", "hour",
                        "void",
                    ) and not (
                        tr.startswith("bucket[") or tr.startswith("truncate[")
                    ):
                        raise NotImplementedError(
                            f"partition transform {tr!r}"
                        )
                return spec["fields"]
        return []

    def files(
        self,
        snapshot_id: int | None = None,
        as_of_timestamp_ms: int | None = None,
        partition_filter: dict | None = None,
        column_filter: dict | None = None,
        ref: str | None = None,
    ) -> list[DataFile]:
        """Live data files of a snapshot, pruned at both metadata layers
        when ``partition_filter`` (identity-partition equality, e.g.
        ``{"p_bucket": 3}``) is given: manifest-list field summaries skip
        whole manifests, entry partition values skip files.
        ``column_filter`` ``{name: (lo, hi)}`` prunes FILES by the
        manifest's per-column value bounds (spec lower_bounds /
        upper_bounds; round 9) — the non-partition-predicate pruning
        layer; files without stats for a filtered column always survive
        (sound).  No data file is opened at any point — this is the
        metadata-only scan planning Iceberg exists for.

        ``None`` filter values refuse uniformly (ADVICE r11): the three
        pruning/filter layers disagreed on NULL semantics — the entry
        prune matched null partition values, the residue filter's
        ``==`` dropped them, and the summary prune crashed comparing
        None against non-null bounds — so one filter could return
        era-dependent results on a mixed-era identity field.  Filter
        nulls on the read frame (``isNull``) instead."""
        for k, v in (partition_filter or {}).items():
            if v is None:
                raise ValueError(
                    f"partition_filter value for {k!r} is None — "
                    "NULL-partition filtering is not expressible as "
                    "an equality prune; filter isNull on the read "
                    "frame instead"
                )
        return self._scan_manifests(
            _MANIFEST_DATA, snapshot_id, as_of_timestamp_ms,
            partition_filter, column_filter, ref=ref
        )

    def delete_files(
        self,
        snapshot_id: int | None = None,
        as_of_timestamp_ms: int | None = None,
        ref: str | None = None,
    ) -> list[DataFile]:
        """Live DELETE files (v2 merge-on-read) of a snapshot: content 1
        = position deletes (rows named by (file_path, pos)), content 2 =
        equality deletes (rows named by column equality on
        ``equality_ids``).  Applicability is sequence-based and decided
        by the reader (:meth:`read`): a position delete applies to data
        files with data sequence ≤ its own, an equality delete to data
        files STRICTLY older (spec "Scan Planning").  Delete manifests
        are never partition-pruned here — a filter must not widen the
        surviving-row set."""
        return self._scan_manifests(
            _MANIFEST_DELETES, snapshot_id, as_of_timestamp_ms, None,
            None, ref=ref
        )

    def _read_schema_id(
        self,
        snapshot_id: int | None = None,
        as_of_timestamp_ms: int | None = None,
        ref: str | None = None,
    ) -> int:
        """The schema-id a read's output frame speaks — ONE rule shared
        by read()'s both branches and the scan/filter layer (review:
        three hand-rolled copies had already drifted on missing
        current-schema-id handling).  A CURRENT read (no snapshot /
        timestamp / ref pin) uses the table's current schema, because
        DDL is metadata-only and commits no snapshot, so the latest
        snapshot's recorded schema-id predates any post-commit
        add/rename; a pinned read uses the snapshot's own schema (a
        field renamed later stays addressable by its then-current
        spelling)."""
        cur = self.metadata().get("current-schema-id", 0)
        if (snapshot_id is None and as_of_timestamp_ms is None
                and ref is None):
            return cur
        return self.snapshot(
            snapshot_id, as_of_timestamp_ms, ref=ref
        ).get("schema-id", cur)

    def _scan_manifests(
        self,
        want_content: int,
        snapshot_id: int | None,
        as_of_timestamp_ms: int | None,
        partition_filter: dict | None,
        column_filter: dict | None = None,
        ref: str | None = None,
    ) -> list[DataFile]:
        meta = self.metadata()
        snap = self.snapshot(snapshot_id, as_of_timestamp_ms, ref=ref)
        col_info: dict[str, tuple[int, str]] = {}
        if column_filter:
            # filter names resolve against the schema the read's output
            # frame will carry (the fuzzer caught a filter on a
            # just-added column refusing under the old snapshot-only
            # resolution) — the shared rule in _read_schema_id
            schema = self._schema_by_id(
                self._read_schema_id(snapshot_id, as_of_timestamp_ms,
                                     ref)
            )
            by_name = {f["name"]: f for f in schema["fields"]}
            for name in column_filter:
                f = by_name.get(name)
                if f is None:
                    raise ValueError(f"no such column {name!r}")
                if not isinstance(f["type"], str):
                    raise NotImplementedError(
                        "column_filter on nested types"
                    )
                col_info[name] = (f["id"], f["type"])
        mlist_path = self._resolve(snap["manifest-list"])
        _, manifests, _ = read_ocf(mlist_path)
        out: list[DataFile] = []
        for mf in manifests:
            if mf["content"] != want_content:
                continue
            spec_fields = self._spec_fields(meta, mf["partition_spec_id"])
            # filter values arrive in the SOURCE domain; transformed
            # specs (bucket/truncate) compare in the partition domain,
            # so transform the filter value the way the writer did
            flt = None
            if partition_filter:
                import datetime as _dt

                tr_by_name = {
                    f["name"]: f.get("transform", "identity")
                    for f in spec_fields
                }
                rt_by_name = {
                    f["name"]: f.get("result-type")
                    for f in spec_fields
                }

                def _to_part_domain(k, v):
                    v = transform_value(
                        tr_by_name.get(k, "identity"), v
                    )
                    if (rt_by_name.get(k) == "date"
                            and isinstance(v, _dt.date)
                            and not isinstance(v, _dt.datetime)):
                        # identity DATE values ride the manifests as
                        # epoch-day ints (Avro int, Appendix A)
                        v = (v - _dt.date(1970, 1, 1)).days
                    return v

                flt = {
                    k: _to_part_domain(k, v)
                    for k, v in partition_filter.items()
                }
            if flt and mf.get("partitions"):
                if self._summary_prunes(mf["partitions"], spec_fields, flt):
                    continue
            #: only filter keys THIS manifest's spec records can prune
            #: its entries — a file written under an older spec has no
            #: value for a later-added partition field, and excluding
            #: it on a missing key would drop rows the file may hold
            #: (spec evolution: partition filters are file-level
            #: pruning; read() row-filters the survivors)
            spec_names = {f["name"] for f in spec_fields}
            _, entries, _ = read_ocf(self._resolve(mf["manifest_path"]))
            for e in entries:
                if e["status"] == _STATUS_DELETED:
                    continue
                df = e["data_file"]
                part = dict(df["partition"])
                if flt and any(
                    part.get(k) != v
                    for k, v in flt.items()
                    if k in spec_names
                ):
                    continue
                if col_info and self._bounds_prune(df, column_filter,
                                                   col_info):
                    continue
                # v2 sequence inheritance: an entry with null
                # sequence_number takes its manifest's
                seq = e.get("sequence_number")
                if seq is None:
                    seq = mf["sequence_number"]
                out.append(
                    DataFile(
                        path=self._resolve(df["file_path"]),
                        partition=part,
                        record_count=df["record_count"],
                        file_size=df["file_size_in_bytes"],
                        content=df["content"],
                        sequence=seq,
                        equality_ids=tuple(df.get("equality_ids") or ()),
                        raw_path=df["file_path"],
                        spec_id=mf["partition_spec_id"],
                        lower_bounds={
                            e["key"]: e["value"]
                            for e in (df.get("lower_bounds") or ())
                        },
                        upper_bounds={
                            e["key"]: e["value"]
                            for e in (df.get("upper_bounds") or ())
                        },
                    )
                )
        return out

    @staticmethod
    def _bounds_prune(
        df: dict, column_filter: dict, col_info: dict
    ) -> bool:
        """True iff the file's per-column [lower, upper] bounds prove it
        cannot contain a row in ``{name: (lo, hi)}`` (either bound may
        be None for a half-open range).  Missing stats never prune —
        soundness over selectivity, same rule as the registry's
        stat-based shard pruning."""
        lower = {e["key"]: e["value"] for e in (df.get("lower_bounds") or ())}
        upper = {e["key"]: e["value"] for e in (df.get("upper_bounds") or ())}
        for name, (lo, hi) in column_filter.items():
            fid, typ = col_info[name]
            f_lo = lower.get(fid)
            f_hi = upper.get(fid)
            if hi is not None and f_lo is not None:
                if _from_le_bytes(f_lo, typ) > hi:
                    return True
            if lo is not None and f_hi is not None:
                if _from_le_bytes(f_hi, typ) < lo:
                    return True
        return False

    @staticmethod
    def _summary_prunes(
        summaries: list[dict], spec_fields: list[dict], flt: dict
    ) -> bool:
        """True iff a filtered field's value falls outside the manifest's
        [lower, upper] bound summary — the whole manifest is skipped."""
        by_name = {f["name"]: i for i, f in enumerate(spec_fields)}
        for name, want in flt.items():
            i = by_name.get(name)
            if i is None or i >= len(summaries):
                continue
            s = summaries[i]
            typ = spec_fields[i]["result-type"]
            lo = (
                _from_le_bytes(s["lower_bound"], typ)
                if s.get("lower_bound") is not None
                else None
            )
            hi = (
                _from_le_bytes(s["upper_bound"], typ)
                if s.get("upper_bound") is not None
                else None
            )
            if lo is not None and want < lo:
                return True
            if hi is not None and want > hi:
                return True
        return False

    def _resolve(self, path: str) -> str:
        if os.path.isabs(path):
            return path
        return os.path.join(self.dir, path)

    def read(
        self,
        spark,
        snapshot_id: int | None = None,
        as_of_timestamp_ms: int | None = None,
        partition_filter: dict | None = None,
        paths: set[str] | None = None,
        column_filter: dict | None = None,
        ref: str | None = None,
    ):
        """Snapshot → ONE distributed parquet scan of exactly the live
        files (pushdown/pruning intact).  Identity-partition values
        attach via a broadcast join of the metadata-sized
        file→partition map on ``input_file_name()`` — production
        Iceberg's own shape.  (The first cut attached them as literals
        on one DataFrame per distinct partition tuple chained with
        unions, which explodes the logical plan at thousands of
        partitions — a driver-side O(#partitions) plan is exactly the
        scaling failure the manifest tree exists to avoid.)

        Join-key discipline lives in :func:`io.attach_file_columns`
        (shared with the Delta reader): both sides key on the DECODED
        absolute path, and a residual mismatch raises instead of
        silently dropping rows (ADVICE r7).

        Merge-on-read (v2 delete files): when the snapshot carries
        position or equality deletes applicable to any selected data
        file, the scan gains per-row lineage columns (the manifest's
        raw ``file_path`` string via the same attach join — the exact
        string position-delete files use per spec, so external
        absolute-URI tables match; row ordinal via
        ``_metadata.row_index``; data sequence number) and each delete
        file subtracts rows through a broadcast LEFT ANTI join —
        position deletes match (file, pos) on data files with sequence
        ≤ the delete's, equality deletes match the ``equality_ids``
        columns null-safely on STRICTLY older data files (the spec's
        upsert semantics).  Delete files are metadata-scale next to the
        data they prune, so broadcasting them is production Iceberg's
        own plan shape; with no applicable deletes the plan is exactly
        the plain scan (zero overhead for CoW-only tables)."""
        from pyspark.sql import functions as F

        from hadoop_sync_spark.io import attach_file_columns

        files = self.files(
            snapshot_id, as_of_timestamp_ms, partition_filter,
            column_filter=column_filter, ref=ref,
        )

        def _apply_cf(df):
            # the file-level bound pruning above is an optimization; the
            # predicate itself applies here so semantics stay exact (a
            # surviving file can still hold out-of-range rows)
            for name, (lo, hi) in (column_filter or {}).items():
                if lo is not None:
                    df = df.filter(F.col(name) >= lo)
                if hi is not None:
                    df = df.filter(F.col(name) <= hi)
            return df

        if paths is not None:
            # subset scan (the compaction rewrite path) keyed on the
            # manifest file_path string; delete application is unchanged
            missing = paths - {f.raw_path for f in files}
            if missing:
                raise ValueError(
                    f"paths not live in snapshot: {sorted(missing)}"
                )
            files = [f for f in files if f.raw_path in paths]
        if not files:
            if column_filter or partition_filter:
                # a filter that prunes EVERY file is an empty result,
                # not an error (round-10 review: the bounds pruning
                # made this reachable on ordinary selective reads).
                # The schema comes from metadata, in the SAME column
                # order the non-empty path produces (ADVICE r10): data
                # columns from the pinned snapshot schema first, then
                # the spec partition fields appended — positional
                # consumers and unions-by-position see one ordering
                # whether or not anything survived.  Partition columns
                # type as the attach path's python-value inference does
                # (Avro int/long/date -> LongType, string -> StringType).
                from pyspark.sql import types as T

                m = self.metadata()
                sid0 = self._read_schema_id(
                    snapshot_id, as_of_timestamp_ms, ref
                )
                # the partition section mirrors the NON-empty path's
                # shape rule: the snapshot's live files decide which
                # spec fields attach (an evolved table whose live set
                # is all pre-evolution keeps those columns inline);
                # an empty snapshot falls back to every spec's fields
                live_unf = (
                    self.files(snapshot_id, as_of_timestamp_ms,
                               ref=ref)
                    if len(m.get("partition-specs", [])) > 1
                    else None
                )
                # a LIVE-but-keyless set means "no partition columns"
                # (consistent with the non-empty path); only a snapshot
                # with no live files at all falls back to every spec
                live_keys = (
                    {k for f in live_unf for k in f.partition}
                    if live_unf
                    else None
                )
                part_fields: dict[str, str] = {}
                for spec in m.get("partition-specs", []):
                    for pf in spec.get("fields", []):
                        if (live_keys is not None
                                and pf["name"] not in live_keys):
                            continue
                        part_fields.setdefault(
                            pf["name"], pf.get("result-type", "string")
                        )
                part_names = sorted(part_fields)
                try:
                    data_schema = self._spark_schema(
                        sid0, exclude=set(part_names)
                    )
                except NotImplementedError:
                    # a non-scalar column type _spark_schema cannot pin
                    # (struct/list/decimal in EXTERNAL metadata): the
                    # non-empty single-schema path reads it fine via
                    # footer inference, so the empty path must not turn
                    # the same call into an error (round-11 review) —
                    # infer the data schema from one live footer the
                    # way the scan would have
                    import pyarrow.parquet as _pq
                    from pyspark.sql.pandas.types import (
                        from_arrow_schema,
                    )

                    if len(m.get("schemas", [])) > 1:
                        # evolved tables pin via _spark_schema on the
                        # NON-empty path too — the refusal is symmetric
                        # there, so keep it symmetric here
                        raise
                    live = self.files(snapshot_id, as_of_timestamp_ms,
                                      ref=ref)
                    if not live:
                        raise
                    inferred_all = from_arrow_schema(
                        _pq.read_schema(live[0].path)
                    )
                    data_schema = T.StructType([
                        f for f in inferred_all.fields
                        if f.name not in set(part_names)
                    ])
                inferred = {
                    "int": T.LongType(), "long": T.LongType(),
                    "date": T.LongType(), "string": T.StringType(),
                }
                #: identity DATE fields type as DateType — the
                #: non-empty path converts epoch-day ints for them
                #: (transform fields like d_day keep ordinal longs)
                sch_types = {
                    f["name"]: f["type"]
                    for f in self._schema_by_id(sid0)["fields"]
                    if isinstance(f["type"], str)
                }
                schema = T.StructType(
                    list(data_schema.fields)
                    + [
                        T.StructField(
                            n,
                            T.DateType()
                            if (part_fields[n] == "date"
                                and sch_types.get(n) == "date")
                            else inferred.get(part_fields[n],
                                              T.StringType()),
                        )
                        for n in part_names
                    ]
                )
                return spark.createDataFrame([], schema)
            raise ValueError("snapshot selects no data files")
        part_cols = sorted({k for f in files for k in f.partition})
        reader = spark.read
        meta_doc = self.metadata()
        if (len(meta_doc.get("partition-specs", [])) > 1
                and (partition_filter or column_filter
                     or paths is not None)):
            # shape stability on evolved tables: pruning must not
            # change WHICH columns sit in the appended partition
            # section (a filter that prunes away the whole recording
            # era would otherwise move the column inline, breaking
            # union-by-position against the unfiltered read) — the
            # section derives from the snapshot's FULL live set, one
            # extra metadata-scale walk only on filtered multi-spec
            # reads.  `mixed` below still derives from the SURVIVORS:
            # that decides scan/coalesce mechanics, not output shape.
            part_cols = sorted({
                k
                for f in self.files(snapshot_id, as_of_timestamp_ms,
                                    ref=ref)
                for k in f.partition
            })
        #: the schema id the OUTPUT frame speaks — current for current
        #: reads, the snapshot's own for time travel (the shared rule
        #: in _read_schema_id; computed up front because the mixed-spec
        #: logic below needs it too)
        read_sid = meta_doc.get("current-schema-id", 0)
        if len(meta_doc.get("schemas", [])) > 1:
            read_sid = self._read_schema_id(
                snapshot_id, as_of_timestamp_ms, ref
            )
        #: spec evolution (round 11): live files may span partition
        #: specs.  A partition field some live files do NOT record is
        #: "mixed": identity fields are ALSO data columns in the
        #: pre-evolution files (the writer only strips a column from
        #: the data once the spec records it), so the scan keeps the
        #: column and the output COALESCEs the metadata value over the
        #: scanned one; transform-named fields (``k_bucket``) have no
        #: data-side twin and simply null-fill for pre-evolution files.
        #: ONE resolution of the output schema's field list — four
        #: consumers below (names, types, equality-delete map, rename
        #: projection) previously re-derived it independently
        read_fields = self._schema_by_id(read_sid)["fields"]
        schema_names = {f["name"] for f in read_fields}
        #: per-spec recording map: a file RECORDS a field only when its
        #: own spec lists it with a non-void transform — a later spec
        #:'s field is unrecorded for older files (key absent) and a
        #: void tombstone is unrecorded for ITS files (key present but
        #: always null; the source values live in data).  First-spec-
        #: wins name resolution leaked here once (review finding: an
        #: identity-then-void history let a filter skip the row-side
        #: residue), so every decision below is per-file-spec.
        _rec: dict[int, dict[str, str]] = {
            spec["spec-id"]: {
                pf["name"]: pf.get("transform", "identity")
                for pf in spec.get("fields", [])
            }
            for spec in meta_doc.get("partition-specs", [])
        }

        def _recorded(f, c):
            return _rec.get(f.spec_id, {}).get(c, "void") != "void"

        mixed = [
            c for c in part_cols
            if any(not _recorded(f, c) for f in files)
        ]
        mixed_identity = [c for c in mixed if c in schema_names]
        residue_keys: list[str] = []
        if partition_filter:
            # file-level pruning could not evaluate a filter key on
            # files whose spec does not RECORD the field (a survivor
            # without a recorded value was never tested — note the key
            # may be absent from part_cols entirely when the filter
            # pruned away the whole recording era): identity keys
            # re-apply row-side on the output column; transform keys
            # have nothing row-side to evaluate — refuse rather than
            # return untested rows
            tr_sets: dict[str, set] = {}
            for spec in meta_doc.get("partition-specs", []):
                for pf in spec.get("fields", []):
                    tr_sets.setdefault(pf["name"], set()).add(
                        pf.get("transform", "identity")
                    )
            unknown = sorted(set(partition_filter) - set(tr_sets))
            if unknown:
                raise ValueError(
                    f"partition_filter keys {unknown} are in no "
                    "partition spec"
                )
            voided = sorted(k for k in partition_filter
                            if tr_sets[k] == {"void"})
            if voided:
                # void maps every value to null — the filter would
                # silently match every file instead of meaning anything
                raise ValueError(
                    f"partition_filter on void fields {voided}: a "
                    "void transform records null for every file"
                )
            for k in partition_filter:
                if all(_recorded(f, k) for f in files):
                    continue  # every survivor was file-level tested
                if (tr_sets[k] - {"void"} == {"identity"}
                        and k in schema_names):
                    residue_keys.append(k)
                else:
                    raise NotImplementedError(
                        f"partition_filter on field {k!r} while live "
                        "files do not record it: the file-level value "
                        "does not exist for those files"
                    )
        #: rename support (round 10): when the history renamed fields,
        #: per-field coalesce exprs over the historical name variants
        #: form the LOGICAL projection applied as each return path's
        #: final select (after lineage/attach selections, which need the
        #: raw scan's metadata columns)
        logical_exprs = None
        variants: dict[int, list[str]] | None = None
        variant_expr: dict[int, "F.Column"] = {}
        #: the scan KEEPS mixed identity columns (pre-evolution files
        #: carry them in data); fully-recorded partition columns stay
        #: metadata-only as always
        scan_excl = set(part_cols) - set(mixed_identity)
        if len(meta_doc.get("schemas", [])) > 1:
            # schema evolution (round 9): pin the snapshot's schema so
            # files written before an added column null-fill it and
            # dropped columns prune.  Add/drop-only histories resolve
            # by NAME on the snapshot's names; RENAME histories (round
            # 10) pin every historical name of a field and coalesce —
            # one scan, plain parquet, no footer ids needed.  Type
            # promotions and drop+re-add-same-name still refuse.
            # Single-schema tables keep the exact inferred-schema plan.
            variants = self._rename_history()
            reader = reader.schema(
                self._spark_schema(
                    read_sid, exclude=scan_excl,
                    name_variants=variants,
                )
            )
            if variants:
                logical_exprs = []
                for f in read_fields:
                    if f["name"] in set(part_cols):
                        continue
                    names = variants.get(f["id"], [f["name"]])
                    e = (
                        F.col(names[0]) if len(names) == 1
                        else F.coalesce(*[F.col(n) for n in names])
                    )
                    variant_expr[f["id"]] = e
                    logical_exprs.append(e.alias(f["name"]))
        elif mixed_identity:
            # a mixed-spec scan cannot rely on Spark's one-footer
            # inference — pre- and post-evolution files disagree on the
            # identity column's presence — so pin the metadata schema
            # (the evolved-table rule, applied to the single-schema
            # case; exotic external types refuse like the evolved path)
            reader = reader.schema(
                self._spark_schema(read_sid, exclude=scan_excl)
            )
        deletes = self.delete_files(snapshot_id, as_of_timestamp_ms,
                                    ref=ref)
        pos_dels = [
            d for d in deletes
            if d.content == _CONTENT_POS_DELETES
            and any(f.sequence <= d.sequence for f in files)
        ]
        eq_dels = [
            d for d in deletes
            if d.content == _CONTENT_EQ_DELETES
            and any(f.sequence < d.sequence for f in files)
        ]
        scan = reader.parquet(*[f.path for f in files])
        #: mixed identity columns attach under a temp name and the
        #: output takes COALESCE(metadata value, scanned value) — the
        #: metadata wins where the spec recorded it, the data supplies
        #: it for pre-evolution files
        attach_names = [
            "__meta_" + c if c in mixed_identity else c
            for c in part_cols
        ]
        #: explicit attach types from the specs' result types — a
        #: mixed column can be None for EVERY survivor (only
        #: pre-evolution files left a filter), where inference refuses
        from pyspark.sql import types as T

        _t_of = {"int": T.LongType(), "long": T.LongType(),
                 "date": T.LongType(), "string": T.StringType()}
        attach_types: dict = {"_raw_path": T.StringType(),
                              "_seq": T.LongType()}
        for spec in meta_doc.get("partition-specs", []):
            for pf in spec.get("fields", []):
                if pf["name"] in part_cols:
                    n = ("__meta_" + pf["name"]
                         if pf["name"] in mixed_identity
                         else pf["name"])
                    attach_types.setdefault(
                        n,
                        _t_of.get(pf.get("result-type", "string"),
                                  T.StringType()),
                    )

        _ice_type = {
            f["name"]: f["type"]
            for f in read_fields
            if isinstance(f["type"], str)
        }

        def _part_exprs():
            # identity DATE values ride the manifests as epoch-day
            # ints (Avro int, Appendix A) while the data column is a
            # real DateType: convert in EVERY branch — mixed or not —
            # so the output type never flips with the pruning outcome
            # (review: a filtered read that dropped the mixed era
            # returned raw ints where the unfiltered read returned
            # dates, breaking union compatibility).  Transform-named
            # fields (``d_day``) are not schema columns and keep
            # their ordinal ints.
            out = []
            for c in part_cols:
                is_date = (_ice_type.get(c) == "date"
                           and c in schema_names)
                if c not in mixed_identity:
                    e = F.col(c)
                    if is_date:
                        e = F.date_from_unix_date(
                            e.cast("int")).alias(c)
                    out.append(e)
                    continue
                meta_e = F.col("__meta_" + c)
                if is_date:
                    meta_e = F.date_from_unix_date(
                        meta_e.cast("int")
                    )
                out.append(F.coalesce(meta_e, F.col(c)).alias(c))
            return out

        def _apply_residue(df):
            for k in residue_keys:
                df = df.filter(F.col(k) == F.lit(partition_filter[k]))
            return df

        if not (pos_dels or eq_dels):
            if not part_cols:
                return _apply_cf(_apply_residue(
                    scan if logical_exprs is None
                    else scan.select(*logical_exprs)
                ))
            # abspath, not resolve() — Hadoop qualifies paths but does
            # not chase symlinks, so neither may we
            rows = [
                (_norm_path(f.path),)
                + tuple(f.partition.get(c) for c in part_cols)
                for f in files
            ]
            out = attach_file_columns(
                scan, rows, attach_names,
                what="iceberg snapshot partition",
                types=attach_types,
            )
            out = out.select(
                *(logical_exprs if logical_exprs is not None
                  else [F.col(c) for c in scan.columns
                        if c not in set(mixed_identity)]),
                *_part_exprs(),
            )
            return _apply_cf(_apply_residue(out))
        data_cols = scan.columns
        scan = scan.select(
            "*", F.col("_metadata.row_index").alias("_row_idx")
        )
        # Lineage carries the manifest's file_path string VERBATIM
        # (raw_path): position-delete files name data files by that exact
        # string per the spec, so relativizing it here would break every
        # externally written table whose manifests store full URIs.
        rows = [
            (
                _norm_path(f.path),
                f.raw_path,
                f.sequence,
            )
            + tuple(f.partition.get(c) for c in part_cols)
            for f in files
        ]
        df = attach_file_columns(
            scan,
            rows,
            ["_raw_path", "_seq", *attach_names],
            what="iceberg snapshot partition",
            types=attach_types,
        )
        # id -> name map in the READ schema (by schema-id lookup, not
        # list position — external metadata need not keep ids as list
        # indexes, and the output frame speaks the snapshot's names)
        meta_schema = {f["id"]: f["name"] for f in read_fields}
        # the gate sums record_count across ALL applicable delete files
        # (metadata-only): per-file gating would let 50 files of 4.9M
        # rows each broadcast simultaneously — the aggregate is what
        # lives on the driver and every executor at once
        total_delete_rows = sum(
            d.record_count for d in (*pos_dels, *eq_dels)
        )

        def _sized(dels, d):
            """Broadcast a delete-file frame only while the SUMMED
            applicable delete rows sit under the size ceiling.  A
            pathological delete set (most of a 100 TB table deleted
            merge-on-read) would blow the broadcast; above the limit
            every delete anti-join runs as a plain shuffle join with a
            loud log line (VERDICT r9 item 7)."""
            if total_delete_rows <= _BROADCAST_DELETE_ROW_LIMIT:
                return F.broadcast(dels)
            import logging

            logging.getLogger(__name__).warning(
                "applicable delete files hold %d rows total (this "
                "file: %s, %d rows), over the broadcast ceiling (%d); "
                "anti-join falls back to shuffle",
                total_delete_rows,
                d.raw_path,
                d.record_count,
                _BROADCAST_DELETE_ROW_LIMIT,
            )
            return dels

        for d in pos_dels:
            dels = spark.read.parquet(d.path).select(
                F.col("file_path").alias("_d_file"),
                F.col("pos").alias("_d_pos"),
            )
            df = df.join(
                _sized(dels, d),
                (F.col("_raw_path") == F.col("_d_file"))
                & (F.col("_row_idx") == F.col("_d_pos"))
                & (F.col("_seq") <= F.lit(d.sequence)),
                "left_anti",
            )
        for d in eq_dels:
            missing = [fid for fid in d.equality_ids
                       if fid not in meta_schema]
            if missing:
                raise ValueError(
                    f"equality delete {d.raw_path!r} references field "
                    f"ids {missing} absent from the read schema"
                )
            names = [meta_schema[fid] for fid in d.equality_ids]
            clash = sorted(set(names) & set(mixed_identity))
            if clash:
                raise NotImplementedError(
                    f"equality delete {d.raw_path!r} matches on "
                    f"{clash}, identity partition columns some live "
                    "files record only in data — the anti-join cannot "
                    "compare one expression for both eras"
                )
            dels_raw = spark.read.parquet(d.path)
            # a delete file written pre-rename stores its equality
            # column under the write-time name — pick the variant the
            # file actually carries
            sel_exprs = []
            for fid, n in zip(d.equality_ids, names):
                cands = [
                    v for v in (variants or {}).get(fid, [n])
                    if v in dels_raw.columns
                ] or [n]
                sel_exprs.append(F.col(cands[0]).alias(f"_d_{n}"))
            dels = dels_raw.select(*sel_exprs)
            cond = F.col("_seq") < F.lit(d.sequence)
            for fid, n in zip(d.equality_ids, names):
                scan_val = variant_expr.get(fid, F.col(n))
                cond = cond & scan_val.eqNullSafe(F.col(f"_d_{n}"))
            df = df.join(_sized(dels, d), cond, "left_anti")
        return _apply_cf(_apply_residue(
            df.select(
                *(logical_exprs if logical_exprs is not None
                  else [F.col(c) for c in data_cols
                        if c not in set(mixed_identity)]),
                *_part_exprs(),
            )
        ))

    def metadata_table(self, spark, kind: str, ref: str | None = None):
        """Inspection DataFrames in production Iceberg's metadata-table
        shape (``SELECT * FROM t.files`` etc., round 10): ``snapshots``,
        ``history``, ``refs``, ``files``, ``delete_files``,
        ``partitions``, ``manifests``.  Rows come from the same driver-side metadata
        walk scan planning does (KB-scale manifests; nothing row-scale
        is read), surfaced as a DataFrame so inspection composes with
        the engine's own relational surface."""
        from pyspark.sql import types as T

        meta = self.metadata()
        if kind == "snapshots":
            schema = T.StructType([
                T.StructField("committed_at_ms", T.LongType()),
                T.StructField("snapshot_id", T.LongType()),
                T.StructField("sequence_number", T.LongType()),
                T.StructField("schema_id", T.LongType()),
                T.StructField("operation", T.StringType()),
                T.StructField("manifest_list", T.StringType()),
            ])
            rows = [
                (s["timestamp-ms"], s["snapshot-id"],
                 s.get("sequence-number", 0), s.get("schema-id", 0),
                 s.get("summary", {}).get("operation"),
                 s["manifest-list"])
                for s in meta.get("snapshots", [])
            ]
        elif kind == "history":
            schema = T.StructType([
                T.StructField("made_current_at_ms", T.LongType()),
                T.StructField("snapshot_id", T.LongType()),
                T.StructField("is_current_ancestor", T.BooleanType()),
            ])
            live = {s["snapshot-id"] for s in meta.get("snapshots", [])}
            rows = [
                (e["timestamp-ms"], e["snapshot-id"],
                 e["snapshot-id"] in live)
                for e in meta.get("snapshot-log", [])
            ]
        elif kind == "refs":
            schema = T.StructType([
                T.StructField("name", T.StringType()),
                T.StructField("type", T.StringType()),
                T.StructField("snapshot_id", T.LongType()),
            ])
            rows = [
                (name, r.get("type", "branch"), r["snapshot-id"])
                for name, r in sorted((meta.get("refs") or {}).items())
            ]
        elif kind in ("files", "delete_files"):
            schema = T.StructType([
                T.StructField("content", T.IntegerType()),
                T.StructField("file_path", T.StringType()),
                T.StructField("file_format", T.StringType()),
                T.StructField(
                    "partition",
                    T.MapType(T.StringType(), T.StringType()),
                ),
                T.StructField("record_count", T.LongType()),
                T.StructField("file_size_in_bytes", T.LongType()),
                T.StructField("sequence_number", T.LongType()),
            ])
            fs = (
                self.files(ref=ref) if kind == "files"
                else self.delete_files(ref=ref)
            )
            rows = [
                (f.content, f.raw_path, "PARQUET",
                 {k: None if v is None else str(v)
                  for k, v in f.partition.items()},
                 f.record_count, f.file_size, f.sequence)
                for f in fs
            ]
        elif kind == "partitions":
            schema = T.StructType([
                T.StructField(
                    "partition",
                    T.MapType(T.StringType(), T.StringType()),
                ),
                T.StructField("file_count", T.LongType()),
                T.StructField("record_count", T.LongType()),
                T.StructField("total_size_in_bytes", T.LongType()),
            ])
            agg: dict[tuple, list[int]] = {}
            for f in self.files(ref=ref):
                key = tuple(sorted(f.partition.items()))
                acc = agg.setdefault(key, [0, 0, 0])
                acc[0] += 1
                acc[1] += f.record_count
                acc[2] += f.file_size
            rows = [
                ({k: None if v is None else str(v) for k, v in key},
                 n, rec, size)
                # None-safe sort: identity partitions legally hold null
                # values, and tuple comparison would TypeError on
                # None < int
                for key, (n, rec, size) in sorted(
                    agg.items(),
                    key=lambda kv: [
                        (k, v is None, str(v)) for k, v in kv[0]
                    ],
                )
            ]
        elif kind == "manifests":
            schema = T.StructType([
                T.StructField("content", T.IntegerType()),
                T.StructField("path", T.StringType()),
                T.StructField("partition_spec_id", T.IntegerType()),
            ])
            snap = self.snapshot(ref=ref)
            _, manifests, _ = read_ocf(
                self._resolve(snap["manifest-list"])
            )
            rows = [
                (mf["content"], mf["manifest_path"],
                 mf["partition_spec_id"])
                for mf in manifests
            ]
        else:
            raise ValueError(
                f"unknown metadata table {kind!r}: snapshots, history, "
                "refs, files, delete_files, partitions, manifests"
            )
        return spark.createDataFrame(rows, schema)

    def history(self) -> list[dict]:
        """Operation log in DESCRIBE HISTORY shape, newest first."""
        meta = self.metadata()
        return [
            {
                "snapshot_id": s["snapshot-id"],
                "timestamp_ms": s["timestamp-ms"],
                "sequence_number": s.get("sequence-number", 0),
                "operation": s.get("summary", {}).get("operation"),
                "is_current": s["snapshot-id"]
                == meta.get("current-snapshot-id"),
            }
            for s in sorted(
                meta.get("snapshots", []),
                key=lambda s: -s["timestamp-ms"],
            )
        ]

    # --------------------------------------------------------------- writes
    @staticmethod
    def create(
        table_dir: str,
        fields: list[tuple[str, str]],
        partition_by: list[tuple[str, str]] | None = None,
        now_ms: int = 0,
    ) -> "IcebergTable":
        """Create an empty v2 table: ``fields`` = [(name, spark_type)];
        ``partition_by`` = [(column, result_type)] identity transforms."""
        schema = _iceberg_schema_json(fields)
        by_name = {f["name"]: f["id"] for f in schema["fields"]}
        spec_fields = []
        for i, spec in enumerate(partition_by or []):
            col, typ = spec[0], spec[1]
            transform = spec[2] if len(spec) > 2 else "identity"
            name = (
                spec[3]
                if len(spec) > 3
                else (
                    col
                    if transform == "identity"
                    else col
                    + "_"
                    + transform.split("[", 1)[0]  # Iceberg's convention
                )
            )
            if name in by_name and not (
                transform == "identity" and name == col
            ):
                # same collision rule as update_spec (ADVICE r11): a
                # transform field named like an unrelated schema column
                # would mis-classify on the read side
                raise ValueError(
                    f"partition field name {name!r} collides with a "
                    "schema column: only an identity partition on "
                    "that same column may share its name"
                )
            spec_fields.append(
                {
                    "name": name,
                    "transform": transform,
                    "source-id": by_name[col],
                    "field-id": 1000 + i,
                    "result-type": typ,
                }
            )
        import hashlib

        # content-derived uuid: built-in hash() is salted per process
        # (PYTHONHASHSEED), which would break the byte-stable-re-runs
        # rule the Avro sync markers follow
        digest = hashlib.md5(table_dir.encode()).hexdigest()
        meta = {
            "format-version": 2,
            "table-uuid": (
                f"{digest[:8]}-{digest[8:12]}-{digest[12:16]}-"
                f"{digest[16:20]}-{digest[20:32]}"
            ),
            "location": table_dir,
            "last-sequence-number": 0,
            "last-updated-ms": now_ms,
            "last-column-id": len(fields),
            "current-schema-id": 0,
            "schemas": [schema],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
            "last-partition-id": 999 + len(spec_fields),
            "properties": {},
            "current-snapshot-id": None,
            "snapshots": [],
            "snapshot-log": [],
            "metadata-log": [],
        }
        os.makedirs(os.path.join(table_dir, "metadata"), exist_ok=True)
        t = IcebergTable(table_dir)
        t._write_metadata(1, meta)
        return t

    def _write_metadata(self, version: int, meta: dict) -> None:
        path = os.path.join(self.meta_dir, f"v{version}.metadata.json")
        # put-if-absent: O_EXCL loses cleanly to a concurrent committer
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as fh:
            json.dump(meta, fh, indent=1)
        tmp = f"{self._hint_path()}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(str(version))
        os.replace(tmp, self._hint_path())

    def _commit_snapshot(
        self,
        entries: list[dict],
        operation: str,
        now_ms: int,
        counts: tuple[int, int, int, int, int, int] | None = None,
        delete_entries: list[dict] | None = None,
        summary_extra: dict | None = None,
    ) -> int:
        """Write manifest(s) + manifest list + next metadata version.
        ``entries`` fill the DATA manifest; ``delete_entries`` (v2
        merge-on-read position/equality delete files), when present,
        get their own manifest with ``content=1`` in the manifest list.
        Per-manifest file/row counts derive from entry statuses;
        ``min_sequence_number`` is the min over explicit entry sequences
        (EXISTING carry-forwards) and the new sequence (ADDED inherit).
        The snapshot id is deterministic (sequence-derived) — same
        no-ambient-randomness rule as the Avro sync marker.  ``counts``
        is accepted for backward compatibility and ignored (statuses are
        authoritative).

        Partition-spec evolution (spec "Partition Evolution"): a
        manifest holds entries of ONE spec (its partition struct and
        summary layout are spec-shaped), so entries group by their
        ``spec_id`` key — carried EXISTING/DELETED entries keep the
        spec their file was written under, entries without the key
        (every ADDED entry from the write faces) take the table's
        CURRENT default spec — and each group writes its own manifest
        stamped with that ``partition_spec_id``.  Single-spec tables
        produce exactly the one-manifest layout they always did."""
        meta = self.metadata()
        version = self.current_version()
        seq = meta["last-sequence-number"] + 1
        snap_id = 1000 + seq
        default_spec = meta.get("default-spec-id", 0)

        def stat_counts(es):
            f = {0: 0, 1: 0, 2: 0}
            r = {0: 0, 1: 0, 2: 0}
            for e in es:
                f[e["status"]] += 1
                r[e["status"]] += e["data_file"]["record_count"]
            return (
                f[_STATUS_ADDED], f[_STATUS_EXISTING], f[_STATUS_DELETED],
                r[_STATUS_ADDED], r[_STATUS_EXISTING], r[_STATUS_DELETED],
            )

        def min_seq(es):
            explicit = [
                e["sequence_number"]
                for e in es
                if e.get("sequence_number") is not None
            ]
            return min(explicit + [seq])

        mlist_rows = []
        for content, kind, all_es in (
            (_MANIFEST_DATA, "data", entries),
            (_MANIFEST_DELETES, "deletes", delete_entries or []),
        ):
            if content == _MANIFEST_DELETES and not all_es:
                continue
            by_spec: dict[int, list[dict]] = {}
            for e in all_es:
                e = dict(e)
                by_spec.setdefault(
                    e.pop("spec_id", default_spec), []
                ).append(e)
            if not by_spec:  # an EMPTY data section still needs its
                by_spec = {default_spec: []}  # (empty) manifest row
            for spec_id in sorted(by_spec):
                es = by_spec[spec_id]
                spec_fields = self._spec_fields(meta, spec_id)
                entry_schema = _manifest_entry_schema(spec_fields)
                man_rel = (
                    f"metadata/snap-{snap_id}-{kind}-manifest.avro"
                    if len(by_spec) == 1
                    else f"metadata/snap-{snap_id}-{kind}-"
                         f"spec{spec_id}-manifest.avro"
                )
                man_path = os.path.join(self.dir, man_rel)
                write_ocf(
                    man_path,
                    entry_schema,
                    es,
                    extra_meta={
                        # by schema-id lookup, never list position
                        # (external metadata need not keep ids as list
                        # indexes; meta is the unmutated current doc
                        # here, so the shared helper's clear
                        # no-such-schema error applies)
                        "schema": json.dumps(self._schema_by_id(
                            meta.get("current-schema-id", 0)
                        )).encode(),
                        "partition-spec": json.dumps(
                            spec_fields).encode(),
                        "content": kind.encode(),
                    },
                )
                (added_f, existing_f, deleted_f,
                 added_r, existing_r, deleted_r) = stat_counts(es)
                mlist_rows.append(
                    {
                        "manifest_path": man_rel,
                        "manifest_length": os.path.getsize(man_path),
                        "partition_spec_id": spec_id,
                        "content": content,
                        "sequence_number": seq,
                        "min_sequence_number": min_seq(es),
                        "added_snapshot_id": snap_id,
                        "added_files_count": added_f,
                        "existing_files_count": existing_f,
                        "deleted_files_count": deleted_f,
                        "added_rows_count": added_r,
                        "existing_rows_count": existing_r,
                        "deleted_rows_count": deleted_r,
                        "partitions": self._field_summaries(
                            es, spec_fields)
                        if spec_fields
                        else None,
                    }
                )
        mlist_rel = f"metadata/snap-{snap_id}-manifest-list.avro"
        write_ocf(
            os.path.join(self.dir, mlist_rel),
            _MANIFEST_FILE_SCHEMA,
            mlist_rows,
        )
        meta = dict(meta)
        parent = meta.get("current-snapshot-id")
        meta["last-sequence-number"] = seq
        meta["last-updated-ms"] = now_ms
        meta["current-snapshot-id"] = snap_id
        # spec "Branching and Tagging": the main branch tracks the
        # current snapshot; named refs (tags/branches) stay pinned
        refs = dict(meta.get("refs") or {})
        refs["main"] = {"snapshot-id": snap_id, "type": "branch"}
        meta["refs"] = refs
        snap_rec = {
            "snapshot-id": snap_id,
            "timestamp-ms": now_ms,
            "sequence-number": seq,
            "schema-id": meta["current-schema-id"],
            # summary_extra: engine-specific properties ride the spec's
            # free-form summary map (the streaming sinks' epoch
            # watermark lives here, exactly where Spark's and Flink's
            # Iceberg sinks put theirs)
            "summary": {"operation": operation, **(summary_extra or {})},
            "manifest-list": mlist_rel,
        }
        # spec: parent-snapshot-id records true ancestry — after a
        # rollback the next commit's parent is the RESTORED snapshot,
        # not the last listed one, which is what lets changelog_scan
        # walk the ancestor chain past abandoned branches (round 12)
        if parent is not None and parent != -1:
            snap_rec["parent-snapshot-id"] = parent
        meta["snapshots"] = list(meta["snapshots"]) + [snap_rec]
        meta["snapshot-log"] = list(meta["snapshot-log"]) + [
            {"timestamp-ms": now_ms, "snapshot-id": snap_id}
        ]
        self._write_metadata(version + 1, meta)
        return snap_id

    @staticmethod
    def _field_summaries(
        entries: list[dict], spec_fields: list[dict]
    ) -> list[dict]:
        out = []
        for f in spec_fields:
            vals = [
                e["data_file"]["partition"].get(f["name"])
                for e in entries
                if e["status"] != _STATUS_DELETED
            ]
            non_null = [v for v in vals if v is not None]
            out.append(
                {
                    "contains_null": any(v is None for v in vals),
                    "contains_nan": None,
                    "lower_bound": _le_bytes(min(non_null), f["result-type"])
                    if non_null
                    else None,
                    "upper_bound": _le_bytes(max(non_null), f["result-type"])
                    if non_null
                    else None,
                }
            )
        return out

    def append(
        self, files: list[DataFile], now_ms: int = 0
    ) -> int:
        """Fast-append snapshot: prior live entries carry forward as
        EXISTING, new files enter as ADDED (recorded under the CURRENT
        default spec — a key the default spec does not define refuses,
        the writer-side half of spec evolution; missing keys are null
        partition values, which the spec allows)."""
        meta0 = self.metadata()
        spec_names = {
            f["name"]
            for f in self._spec_fields(
                meta0, meta0.get("default-spec-id", 0)
            )
        }
        for f in files:
            unknown = set(f.partition) - spec_names
            if unknown:
                raise ValueError(
                    f"partition keys {sorted(unknown)} not in the "
                    "default partition spec"
                )
        prior = self._live_entries()
        entries = prior + [
            {
                "status": _STATUS_ADDED,
                "snapshot_id": None,
                "sequence_number": None,
                "file_sequence_number": None,
                "data_file": {
                    "content": _CONTENT_DATA,
                    "file_path": f.path,
                    "file_format": "PARQUET",
                    "partition": f.partition,
                    "record_count": f.record_count,
                    "file_size_in_bytes": f.file_size,
                    "equality_ids": None,
                    "lower_bounds": [
                        {"key": k, "value": v}
                        for k, v in sorted(f.lower_bounds.items())
                    ] or None,
                    "upper_bounds": [
                        {"key": k, "value": v}
                        for k, v in sorted(f.upper_bounds.items())
                    ] or None,
                },
            }
            for f in files
        ]
        return self._commit_snapshot(
            entries,
            "append",
            now_ms,
            delete_entries=self._live_delete_entries(),
        )

    # ---- streaming exactly-once (round 12; the Iceberg twin of
    # DeltaLog.append_stream_batch) -------------------------------------
    _EPOCH_QUERY_KEY = "spark.sql.streaming.queryId"
    _EPOCH_ID_KEY = "spark.sql.streaming.epochId"

    def committed_epoch(self, query_id: str) -> int | None:
        """Latest committed epoch for ``query_id`` on the CURRENT
        branch, or None.  Iceberg has no txn action; engines park the
        watermark in the snapshot SUMMARY (the free-form map the spec
        reserves for exactly this) and re-derive it by walking the
        ancestor chain — the same findLatestCommittedEpoch discipline
        Spark's and Flink's Iceberg sinks use.  The walk follows
        parent-snapshot-id past rollback-abandoned branches (so a
        rollback correctly FORGETS epochs committed on the abandoned
        branch), with the list-order fallback for legacy metadata.

        Durability caveat (inherent to the summary mechanism, shared
        by production Iceberg sinks): :meth:`expire_snapshots` erases
        the watermark with the snapshots that carried it — if EVERY
        snapshot recording a query's epoch expires while the stream's
        own checkpoint is also lost, a replay re-lands.  Keep snapshot
        retention longer than checkpoint-loss recovery time, or use
        the Delta twin, whose txn state rides every checkpoint
        forever."""
        snaps = self.snapshots()
        if not snaps:
            return None
        by_id = {s["snapshot-id"]: s for s in snaps}
        cur = self.metadata().get("current-snapshot-id")
        if cur in by_id and any("parent-snapshot-id" in s for s in snaps):
            chain = []
            while cur in by_id:
                chain.append(by_id[cur])
                cur = by_id[cur].get("parent-snapshot-id")
        else:
            chain = list(reversed(snaps))
        for s in chain:
            summ = s.get("summary") or {}
            if summ.get(self._EPOCH_QUERY_KEY) == query_id:
                raw = summ.get(self._EPOCH_ID_KEY)
                try:
                    return int(raw)
                except (TypeError, ValueError):
                    # an external writer recorded this query with a
                    # malformed epoch: IGNORING it would walk on to an
                    # OLDER epoch and re-admit duplicates, so refuse
                    raise ValueError(
                        f"snapshot {s['snapshot-id']} records queryId "
                        f"{query_id!r} with malformed epochId {raw!r}"
                        " — cannot determine the idempotence watermark"
                    ) from None
        return None

    def _default_spec_split(self, meta: dict, face: str):
        """Split plan for writing a source frame under the DEFAULT
        spec (round 13 — VERDICT r12 item 2 lifts the identity-only
        refusal): identity fields keep the r12 shape (source column
        EXCLUDED from data files, value stamped from the tuple into
        the manifest), non-identity fields derive their
        partition-domain value per source row via
        :func:`transform_column` — the same spec-vector-verified
        functions the pruning layers apply to filter values — and the
        source column STAYS in the data files (transforms are lossy).
        Returns ``(id_srcs, field_of, derived)``: identity source
        columns in spec order, identity source -> spec-field name, and
        ``[(helper_col, spec_field_name, Column)]`` for the transform
        fields (``void`` stamps None without touching any column)."""
        from pyspark.sql import functions as F

        schema_fields = self._schema_by_id(
            meta.get("current-schema-id", 0)
        )["fields"]
        by_id = {f["id"]: f["name"] for f in schema_fields}
        typ_of = {f["name"]: f["type"] for f in schema_fields
                  if isinstance(f["type"], str)}
        id_srcs: list = []
        field_of: dict = {}
        derived: list = []
        for i, pf in enumerate(self._spec_fields(
            meta, meta.get("default-spec-id", 0)
        )):
            tr = pf.get("transform", "identity")
            if tr == "void":
                derived.append(
                    (f"_pt_{i}_{pf['name']}", pf["name"], F.lit(None))
                )
                continue
            src = by_id.get(pf.get("source-id"))
            if src is None:
                raise ValueError(
                    f"partition field {pf['name']!r} sources unknown "
                    f"schema field id {pf.get('source-id')}"
                )
            if tr == "identity":
                if typ_of.get(src) in ("timestamp", "timestamptz"):
                    raise NotImplementedError(
                        f"{face} with identity partitioning on "
                        f"timestamp source {src!r}: the typed "
                        "micros round-trip is not implemented — "
                        "partition by the day/hour transform instead "
                        "(supported since round 13)"
                    )
                id_srcs.append(src)
                field_of[src] = pf["name"]
            else:
                derived.append((
                    f"_pt_{i}_{pf['name']}",
                    pf["name"],
                    transform_column(tr, src, typ_of.get(src)),
                ))
        #: identity DATE values stamp manifests as epoch-day ints
        #: (Avro int, spec Appendix A — raw dates crashed the Avro
        #: union encode; the read paths already convert back)
        date_ids = {s for s in id_srcs if typ_of.get(s) == "date"}

        def pv_encode(col, v):
            if v is not None and col in date_ids:
                import datetime as _dt

                return (v - _dt.date(1970, 1, 1)).days
            return v

        return id_srcs, field_of, derived, pv_encode

    @staticmethod
    def _split_tuples(frame, key_cols: list):
        """Distinct partition tuples of ``frame`` over ``key_cols``,
        deterministically ordered (None-first), plus a per-tuple
        null-safe filter builder — the shared splitting idiom of the
        partitioned write faces."""
        from pyspark.sql import functions as F

        tuples = sorted(
            frame.select(*key_cols).distinct().collect(),
            key=lambda r: tuple((v is None, v) for v in r),
        )

        def cond_for(t):
            cond = None
            for c in key_cols:
                term = F.col(c).eqNullSafe(F.lit(t[c]))
                cond = term if cond is None else cond & term
            return cond

        return tuples, cond_for

    def append_stream_batch(
        self,
        batch_df,
        query_id: str,
        epoch_id: int,
        now_ms: int = 0,
    ) -> int | None:
        """Idempotent micro-batch APPEND: land ``batch_df`` as data
        files plus ONE append snapshot whose summary records
        ``(queryId, epochId)``; a re-delivered epoch — Spark's replay
        contract, or a re-run after the stream's own checkpoint is
        lost — skips (returns None) because the table's snapshot
        history already records it or a later one.  The table must
        exist (``create`` is the explicit DDL face); a partitioned
        default spec splits per partition tuple like the partitioned
        MERGE (one data file per tuple, manifest tuple stamped so
        partition filters prune streamed files) — identity fields
        stamp source values with the source column excluded from the
        data files, and bucket/truncate/temporal fields (round 13)
        derive their transform value per source row via
        :func:`transform_column` with the source column kept in the
        data; an EMPTY batch still commits so the epoch watermark
        advances.

        Crash-safety mirrors the Delta twin: parts move from staging
        to DETERMINISTIC ``data/txn-<q8>-<epoch>-<i>`` names before
        the metadata commit, so a crash leaves orphans a retry
        overwrites byte-for-byte and :meth:`vacuum` reclaims.

        Scale: one distributed parquet write job per batch; the driver
        reads one FOOTER per part file (record count + column bounds
        for the manifest entry — metadata scale) and writes one
        manifest + metadata version."""
        import hashlib as _hashlib
        import shutil as _shutil

        import pyarrow.parquet as _pq

        last = self.committed_epoch(query_id)
        if last is not None and epoch_id <= last:
            return None
        meta = self.metadata()
        schema_fields = self._schema_by_id(
            meta["current-schema-id"]
        )["fields"]
        part_cols, field_of, derived, pv_encode = (
            self._default_spec_split(meta, "append_stream_batch")
        )
        want = [f["name"] for f in schema_fields]
        if set(batch_df.columns) != set(want):
            raise ValueError(
                f"batch columns {sorted(batch_df.columns)} != table "
                f"columns {sorted(want)}"
            )
        batch_df = batch_df.select(*want)
        tag = _hashlib.md5(query_id.encode()).hexdigest()[:8]
        os.makedirs(os.path.join(self.dir, "data"), exist_ok=True)
        bounds_fields = [f for f in schema_fields
                         if f["name"] not in part_cols]

        def _entry(rel, dest, pv):
            lb, ub = parquet_column_bounds(dest, bounds_fields)
            return {
                "status": _STATUS_ADDED,
                "snapshot_id": None,
                "sequence_number": None,
                "file_sequence_number": None,
                "data_file": {
                    "content": _CONTENT_DATA,
                    "file_path": rel,
                    "file_format": "PARQUET",
                    "partition": pv,
                    "record_count": _pq.read_metadata(dest).num_rows,
                    "file_size_in_bytes": os.path.getsize(dest),
                    "equality_ids": None,
                    "lower_bounds": [
                        {"key": k, "value": v}
                        for k, v in sorted(lb.items())
                    ] or None,
                    "upper_bounds": [
                        {"key": k, "value": v}
                        for k, v in sorted(ub.items())
                    ] or None,
                },
            }

        entries = []
        if part_cols or derived:
            # partitioned: per-tuple split, the partitioned-merge
            # shape — one data file per tuple, manifest tuple stamped
            # so partition filters prune streamed files too.
            # Transform fields (round 13) derive once per row into
            # helper columns; identity fields split on the source.
            from hadoop_sync_spark.io import write_single_parquet

            work = batch_df
            for h, _, expr in derived:
                work = work.withColumn(h, expr)
            key_cols = [*part_cols, *[h for h, _, _ in derived]]
            data_names = [c for c in want if c not in part_cols]
            tuples, cond_for = self._split_tuples(work, key_cols)
            for gi, t in enumerate(tuples):
                rel = (f"data/txn-{tag}-{epoch_id:010d}"
                       f"-p{gi:05d}.parquet")
                dest = os.path.join(self.dir, rel)
                write_single_parquet(
                    work.where(cond_for(t)).select(*data_names),
                    dest, "iceberg_txn_",
                )
                pv = {field_of[c]: pv_encode(c, t[c])
                      for c in part_cols}
                pv.update({fn: t[h] for h, fn, _ in derived})
                entries.append(_entry(rel, dest, pv))
        else:
            staging = os.path.join(
                self.dir, f"_txn_staging-{tag}-{epoch_id}"
            )
            _shutil.rmtree(staging, ignore_errors=True)
            batch_df.write.mode("overwrite").parquet(staging)
            parts = sorted(
                n for n in os.listdir(staging)
                if n.endswith(".parquet")
                and not n.startswith((".", "_"))
            )
            for i, name in enumerate(parts):
                rel = f"data/txn-{tag}-{epoch_id:010d}-{i:05d}.parquet"
                dest = os.path.join(self.dir, rel)
                os.replace(os.path.join(staging, name), dest)
                entries.append(_entry(rel, dest, {}))
            _shutil.rmtree(staging, ignore_errors=True)
        return self._commit_snapshot(
            self._live_entries() + entries,
            "append",
            now_ms,
            delete_entries=self._live_delete_entries(),
            summary_extra={
                self._EPOCH_QUERY_KEY: query_id,
                self._EPOCH_ID_KEY: str(epoch_id),
            },
        )

    def delete(self, paths: set[str], now_ms: int = 0) -> int:
        """Copy-on-write delete: surviving entries rewritten EXISTING,
        removed paths written DELETED (data files untouched on disk —
        time travel to older snapshots still resolves them)."""
        prior = self._live_entries()
        entries = []
        deleted_f = deleted_r = 0
        for e in prior:
            rel = e["data_file"]["file_path"]
            if rel in paths or self._resolve(rel) in paths:
                e = dict(e)
                e["status"] = _STATUS_DELETED
                deleted_f += 1
                deleted_r += e["data_file"]["record_count"]
            entries.append(e)
        if not deleted_f:
            raise ValueError("delete matched no live data files")
        return self._commit_snapshot(
            entries,
            "overwrite",
            now_ms,
            delete_entries=self._live_delete_entries(),
        )

    def add_position_deletes(
        self, deletes: list[tuple[str, int]], now_ms: int = 0
    ) -> int:
        """Merge-on-read POSITION delete: write a delete parquet naming
        rows as (file_path, pos) — the reserved-field-id schema of the
        spec's "Position Delete Files" — and commit a snapshot whose
        delete manifest carries it (content=1).  ``deletes`` uses
        table-relative data file paths and 0-based row ordinals within
        each file.  Applies at read time to data files with data
        sequence ≤ this commit's sequence."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not deletes:
            raise ValueError("no delete positions given")
        meta = self.metadata()
        seq = meta["last-sequence-number"] + 1
        rel = f"data/delete-pos-{seq}.parquet"
        path = os.path.join(self.dir, rel)
        ordered = sorted(deletes)
        pq.write_table(
            pa.table(
                {
                    "file_path": pa.array(
                        [p for p, _ in ordered], pa.string()
                    ),
                    "pos": pa.array([p for _, p in ordered], pa.int64()),
                }
            ),
            path,
        )
        spec_fields = self._spec_fields(meta, 0)
        entry = {
            "status": _STATUS_ADDED,
            "snapshot_id": None,
            "sequence_number": None,  # inherits this commit's sequence
            "file_sequence_number": None,
            "data_file": {
                "content": _CONTENT_POS_DELETES,
                "file_path": rel,
                "file_format": "PARQUET",
                # not partition-scoped: all-null partition tuple
                "partition": {f["name"]: None for f in spec_fields},
                "record_count": len(ordered),
                "file_size_in_bytes": os.path.getsize(path),
                "equality_ids": None,
            },
        }
        return self._commit_snapshot(
            self._live_entries(),
            "delete",
            now_ms,
            delete_entries=self._live_delete_entries() + [entry],
        )

    #: driver-tier materialization bound for the DML write faces'
    #: matched (file, position) pairs and merge key sets — the
    #: write-side analogue of the read path's delete-broadcast
    #: ceiling.  At or under it, matches collect driver-side
    #: (cheapest at fixture scale).  ABOVE it (round 12) every DML
    #: face — delete_rows, update_rows and merge_upsert — switches to
    #: the EXECUTOR tier: position/equality delete parquets write
    #: straight from the distributed frames and update's rewrite joins
    #: the fresh frame, so no predicate selectivity materializes
    #: positions on the driver.
    DELETE_ROWS_LIMIT = 1_000_000

    def _matched_per_raw(self, spark, column_filter: dict, face: str):
        """Shared DML matcher (round-11 review: delete_rows and
        update_rows duplicated this): bounds-prune candidate files,
        scan ONLY the predicate columns with per-file row lineage, and
        return ``(cand, part_cols, per_raw, frame)``:

        - ``per_raw = {raw_path: {positions}}`` (``frame`` None) when
          the matched set fits :data:`DELETE_ROWS_LIMIT` — the driver
          tier;
        - ``per_raw`` None with ``frame`` the distributed
          ``(_fp, _pos)`` DataFrame when it does NOT — the EXECUTOR
          tier (round 12), the caller writes position-delete files
          straight from the frame;
        - both None when nothing matches.

        Guards: empty / unknown / partition predicate columns; the cap
        check runs THROUGH a ``limit(cap+1)`` so the driver never
        materializes an oversized match list.  Renamed histories are
        SUPPORTED (round 12, lifting the r11 refusal): the predicate
        scan pins one physical column per historical name of each
        predicate field and coalesces across the variants — exactly
        the read path's name-variant resolution, so pre-rename files
        match instead of silently null-filling."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from hadoop_sync_spark.io import decode_file_uri

        if not column_filter:
            raise ValueError(f"{face} needs a predicate")
        variants = self._rename_history()
        meta = self.metadata()
        sid = meta.get("current-schema-id", 0)
        sch_fields = self._schema_by_id(sid)["fields"]
        names = {f["name"] for f in sch_fields}
        fid_of = {f["name"]: f["id"] for f in sch_fields}
        cand = self.files(column_filter=column_filter)
        part_cols = sorted({k for f in cand for k in f.partition})
        for c in column_filter:
            if c not in names:
                raise ValueError(f"no such column {c!r}")
            if c in part_cols:
                raise NotImplementedError(
                    f"{face} on partition column {c!r}: partition "
                    "values never reach the data files"
                )
        if not cand:
            return cand, part_cols, None, None
        full = self._spark_schema(
            sid, exclude=set(part_cols), name_variants=variants
        )

        def _var_names(c):
            return (variants.get(fid_of[c], [c]) if variants
                    else [c])

        pred_names = {n for c in column_filter for n in _var_names(c)}
        pred_schema = T.StructType(
            [f for f in full.fields if f.name in pred_names]
        )
        scan = spark.read.schema(pred_schema).parquet(
            *[f.path for f in cand]
        ).select(
            F.col("_metadata.file_path").alias("_fp"),
            F.col("_metadata.row_index").alias("_pos"),
            *[F.coalesce(*[F.col(n) for n in _var_names(c)]).alias(c)
              for c in column_filter],
        )
        for c, (lo, hi) in column_filter.items():
            if lo is not None:
                scan = scan.filter(F.col(c) >= lo)
            if hi is not None:
                scan = scan.filter(F.col(c) <= hi)
        cap = self.DELETE_ROWS_LIMIT
        pairs = scan.select("_fp", "_pos")
        matched = pairs.limit(cap + 1).collect()
        if not matched:
            return cand, part_cols, None, None
        if len(matched) > cap:
            # EXECUTOR tier (round 12): hand back the distributed frame
            # — the caller writes the position-delete parquet straight
            # from it instead of refusing (the round-11 behavior)
            return cand, part_cols, None, pairs
        raw_of = {_norm_path(f.path): f.raw_path for f in cand}
        per_raw: dict[str, set[int]] = {}
        for r in matched:
            raw = raw_of.get(_norm_path(decode_file_uri(r._fp)))
            if raw is None:
                raise ValueError(
                    f"scanned file missing from the snapshot map "
                    f"(URI normalization mismatch): {r._fp}"
                )
            per_raw.setdefault(raw, set()).add(r._pos)
        return cand, part_cols, per_raw, None

    #: target rows per position-delete parquet on the executor tier —
    #: bounds individual delete-file size (and the read side's per-file
    #: decode) without any driver materialization
    POS_DELETE_FILE_ROWS = 2_000_000

    def _add_position_deletes_distributed(
        self, spark, cand, frame, now_ms: int
    ) -> int:
        """EXECUTOR tier of :meth:`delete_rows` (round 12 — the scale
        path the round-11 cap refusal named): the matched ``(_fp,
        _pos)`` frame maps back to manifest ``file_path`` strings via a
        broadcast of the candidate-file list (metadata scale), range-
        partitions on (file_path, pos) and writes the position-delete
        parquet(s) DIRECTLY from the executors — globally sorted per
        the spec's delete-file sort order, ~\
        :data:`POS_DELETE_FILE_ROWS` rows each, committed as one
        snapshot with one delete-manifest entry per file.  The driver
        materializes nothing but file metadata; a purge matching 100M
        rows is a distributed sort-write, not a refusal."""
        import glob as _glob
        import math as _math
        import shutil as _shutil
        import tempfile as _tempfile

        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        meta = self.metadata()
        seq = meta["last-sequence-number"] + 1
        raw_map = spark.createDataFrame(
            [(_norm_path(f.path), f.raw_path) for f in cand],
            ["_np", "file_path"],
        )
        decoded = F.url_decode(
            F.regexp_replace(
                F.regexp_replace(F.col("_fp"), "^file:(//)?", ""),
                r"\+",
                "%2B",
            )
        )
        out = (
            frame.withColumn("_np", decoded)
            .join(F.broadcast(raw_map), "_np", "left")
            .select(
                "file_path", F.col("_pos").cast("long").alias("pos")
            )
            .persist()
        )
        try:
            # an inner join would silently DROP unmapped rows — the
            # driver tier raises on a normalization mismatch, so must we
            if out.where(F.col("file_path").isNull()).first():
                raise ValueError(
                    "scanned file missing from the snapshot map "
                    "(URI normalization mismatch) in the executor-tier "
                    "position-delete write"
                )
            n = out.count()
            entries = self._pos_delete_entries_from_frame(
                out, n, meta, seq
            )
            self._commit_snapshot(
                self._live_entries(),
                "delete",
                now_ms,
                delete_entries=self._live_delete_entries() + entries,
            )
            return n
        finally:
            out.unpersist()

    def _pos_delete_entries_from_frame(
        self, pairs, n: int, meta: dict, seq: int
    ) -> list[dict]:
        """Write globally-sorted position-delete parquet(s) straight
        from a distributed ``(file_path, pos)`` frame (~\
        :data:`POS_DELETE_FILE_ROWS` rows each) and return their
        manifest entries WITHOUT committing — shared by
        :meth:`_add_position_deletes_distributed` (its own snapshot)
        and the executor tier of :meth:`update_rows` (one snapshot
        carrying delete + rewritten copies)."""
        import glob as _glob
        import math as _math
        import shutil as _shutil
        import tempfile as _tempfile

        import pyarrow.parquet as pq

        nparts = max(1, _math.ceil(n / self.POS_DELETE_FILE_ROWS))
        staging = _tempfile.mkdtemp(prefix="iceberg_posdel_")
        entries: list[dict] = []
        try:
            (
                pairs.repartitionByRange(nparts, "file_path", "pos")
                .sortWithinPartitions("file_path", "pos")
                .write.mode("overwrite")
                .parquet(staging)
            )
            spec_fields = self._spec_fields(meta, 0)
            for i, pf in enumerate(
                sorted(
                    _glob.glob(
                        os.path.join(staging, "part-*.parquet")
                    )
                )
            ):
                rows = pq.read_metadata(pf).num_rows
                if rows == 0:
                    continue
                rel = f"data/delete-pos-{seq}-{i}.parquet"
                os.replace(pf, os.path.join(self.dir, rel))
                entries.append({
                    "status": _STATUS_ADDED,
                    "snapshot_id": None,
                    "sequence_number": None,
                    "file_sequence_number": None,
                    "data_file": {
                        "content": _CONTENT_POS_DELETES,
                        "file_path": rel,
                        "file_format": "PARQUET",
                        "partition": {
                            f["name"]: None for f in spec_fields
                        },
                        "record_count": rows,
                        "file_size_in_bytes": os.path.getsize(
                            os.path.join(self.dir, rel)
                        ),
                        "equality_ids": None,
                    },
                })
        finally:
            _shutil.rmtree(staging, ignore_errors=True)
        return entries

    def delete_rows(self, spark, column_filter: dict,
                    now_ms: int = 0) -> int:
        """Row-level ``DELETE FROM t WHERE ...`` the merge-on-read way
        (round 11; the Iceberg twin of :meth:`DeltaLog.delete_where`):
        prune candidate files by the manifest column bounds (the same
        two-layer metadata pruning ``read`` uses — at 100 TB a selective
        predicate scans a handful of files, not the table), scan ONLY
        the predicate columns with per-file row lineage, and commit ONE
        position-delete file covering every match
        (:meth:`add_position_deletes` — inherited sequence, applies to
        data files with sequence ≤ the commit's).  Positions already
        covered by existing position deletes de-duplicate harmlessly in
        the read-side anti-join; rows an equality delete already hides
        gain a redundant position entry, also harmless.  Returns the
        number of (file, position) pairs committed; a no-match
        predicate commits nothing and returns 0.  Renamed schema
        histories are supported (round 12): the predicate scan
        resolves by name variant like the read path, so pre-rename
        files match too.  Matches above :data:`DELETE_ROWS_LIMIT`
        switch to the EXECUTOR tier (round 12): the position-delete
        parquets write straight from the distributed matched frame
        (:meth:`_add_position_deletes_distributed`) — no driver
        materialization at any match size."""
        cand, _, per_raw, frame = self._matched_per_raw(
            spark, column_filter, "delete_rows"
        )
        if per_raw is None and frame is None:
            return 0
        if frame is not None:
            return self._add_position_deletes_distributed(
                spark, cand, frame, now_ms
            )
        pairs = sorted(
            (raw, p) for raw, poss in per_raw.items() for p in poss
        )
        self.add_position_deletes(pairs, now_ms=now_ms)
        return len(pairs)

    def update_rows(
        self,
        spark,
        column_filter: dict,
        set_values: dict,
        now_ms: int = 0,
    ) -> int:
        """Row-level ``UPDATE t SET ... WHERE ...`` the merge-on-read
        way (round 11; the Iceberg twin of
        :meth:`DeltaLog.update_where`): ONE snapshot commits a
        position-delete file covering the matched rows AND their
        updated copies as new data files (one per affected partition
        tuple, footer bounds stamped so later predicates keep
        pruning).  The new files share the commit's sequence number;
        the position delete names only the OLD paths, so the spec's
        sequence rule leaves the copies visible.  ``set_values`` maps
        column -> literal or pyspark Column over the logical row.
        Rows existing position deletes already hide are excluded
        (updating them would resurrect deleted data); tables with live
        EQUALITY deletes refuse — the scan cannot see which rows they
        hide — as do partition(-source) columns in SET and partition
        columns in the predicate.  Renamed histories are SUPPORTED
        (round 12): both the predicate scan and the rewrite-copy scan
        resolve by name variant, and the copies land under the CURRENT
        names.  Matches above :data:`DELETE_ROWS_LIMIT` switch to the
        EXECUTOR tier (round 12, the last write-face cap lifted):
        positions stay distributed end to end — existing position
        deletes subtract via a sequence-aware anti-join on the delete
        parquets read through Spark, the rewrite copies join the
        distributed fresh frame, and the position-delete parquets
        write straight from it."""
        import pyarrow.parquet as pq
        from pyspark.sql import Column
        from pyspark.sql import functions as F

        if not set_values:
            raise ValueError("update_rows needs at least one SET")
        deletes = self.delete_files()
        if any(d.content == _CONTENT_EQ_DELETES for d in deletes):
            raise NotImplementedError(
                "update_rows with live equality-delete files: the scan "
                "cannot see which rows they hide and would resurrect "
                "them — compact the table first"
            )
        meta = self.metadata()
        sid = meta.get("current-schema-id", 0)
        schema_fields = self._schema_by_id(sid)["fields"]
        names = {f["name"] for f in schema_fields}
        by_id = {f["id"]: f["name"] for f in schema_fields}
        part_sources = set()
        for spec in meta.get("partition-specs", []):
            for pf in spec.get("fields", []):
                src = by_id.get(pf.get("source-id"))
                if src:
                    part_sources.add(src)
        for c in set_values:
            if c not in names:
                raise ValueError(f"no such column {c!r}")
            if c in part_sources:
                raise NotImplementedError(
                    f"update_rows SET on partition-source column {c!r}: "
                    "a partition move is a rewrite, not an update"
                )
        live_specs = {
            f.spec_id for f in self.files()
            if f.content == _CONTENT_DATA
        }
        if live_specs - {meta.get("default-spec-id", 0)}:
            raise NotImplementedError(
                "update_rows on a table whose live files carry "
                f"partition specs {sorted(live_specs)} other than the "
                "default: the rewritten copies' partition tuples would "
                "be stamped under the default spec while sourced from "
                "another — use delete_rows + append to move those rows"
            )
        cand, part_cols, per_raw, frame = self._matched_per_raw(
            spark, column_filter, "update_rows"
        )
        if per_raw is None and frame is None:
            return 0
        cand_by_raw = {f.raw_path: f for f in cand}
        pos_dels = [d for d in deletes
                    if d.content == _CONTENT_POS_DELETES]
        fresh_frame = None
        if frame is not None:
            # EXECUTOR tier (round 12 — the last write-face cap
            # lifted): the matched frame stays distributed; existing
            # position deletes subtract via a SEQUENCE-AWARE anti-join
            # against the delete parquets read through Spark, the
            # rewrite-copy joins filter the fresh frame per partition
            # group, and the position-delete parquets write straight
            # from the frame.  The driver materializes only the
            # affected file list (metadata scale).
            raw_map = spark.createDataFrame(
                [
                    (_norm_path(f.path), f.raw_path, f.sequence)
                    for f in cand
                ],
                ["_np", "_raw", "_fseq"],
            )
            decoded = F.url_decode(
                F.regexp_replace(
                    F.regexp_replace(
                        F.col("_fp"), "^file:(//)?", ""
                    ),
                    r"\+",
                    "%2B",
                )
            )
            m = frame.withColumn("_np", decoded).join(
                F.broadcast(raw_map), "_np", "left"
            )
            if pos_dels:
                dels = None
                for d in pos_dels:
                    dfd = spark.read.parquet(d.path).select(
                        F.col("file_path").alias("_d_file"),
                        F.col("pos").cast("long").alias("_d_pos"),
                        F.lit(d.sequence).alias("_dseq"),
                    )
                    dels = (dfd if dels is None
                            else dels.unionByName(dfd))
                m = m.join(
                    dels,
                    (m["_raw"] == dels["_d_file"])
                    & (m["_pos"] == dels["_d_pos"])
                    & (F.col("_fseq") <= dels["_dseq"]),
                    "left_anti",
                )
            fresh_frame = m.persist()
            if fresh_frame.where(F.col("_raw").isNull()).first():
                fresh_frame.unpersist()
                raise ValueError(
                    "scanned file missing from the snapshot map "
                    "(URI normalization mismatch) in the executor-tier "
                    "update"
                )
            n_updated = fresh_frame.count()
            if n_updated == 0:
                fresh_frame.unpersist()
                return 0
            affected = sorted(
                r[0]
                for r in fresh_frame.select("_raw")
                .distinct().collect()
            )

            def select_pairs(raws):
                norms = [_norm_path(cand_by_raw[r].path)
                         for r in raws]
                return fresh_frame.where(
                    F.col("_np").isin(norms)
                ).select(F.col("_np").alias("_afp"), "_pos")
        else:
            #: rows existing POSITION deletes already hide, per raw
            #: path — SEQUENCE-AWARE (round-11 review): a delete
            #: applies to a data file only when data sequence ≤ delete
            #: sequence, so a file re-added after the delete ignores
            #: it on read and must ignore it here too.  Metadata-gated:
            #: the summed record_count of the applicable delete files
            #: must fit the same cap the match list obeys before any
            #: payload is read (executor-tier updates read them
            #: through Spark instead).
            total_del_rows = sum(d.record_count for d in pos_dels)
            if total_del_rows > self.DELETE_ROWS_LIMIT:
                raise ValueError(
                    f"update_rows with {total_del_rows} existing "
                    "position-delete rows, over the driver "
                    "materialization cap — compact the table first"
                )
            pos_sets: dict[str, set[int]] = {}
            for d in pos_dels:
                tb = pq.read_table(
                    d.path, columns=["file_path", "pos"]
                )
                for fp, p in zip(tb["file_path"].to_pylist(),
                                 tb["pos"].to_pylist()):
                    f = cand_by_raw.get(fp)
                    if f is not None and f.sequence <= d.sequence:
                        pos_sets.setdefault(fp, set()).add(p)
            fresh = {
                raw: poss - pos_sets.get(raw, set())
                for raw, poss in per_raw.items()
            }
            fresh = {raw: poss for raw, poss in fresh.items() if poss}
            if not fresh:
                return 0
            n_updated = sum(len(v) for v in fresh.values())
            affected = sorted(fresh)

            def select_pairs(raws):
                sel_rows = [
                    (_norm_path(cand_by_raw[r].path), p)
                    for r in raws
                    for p in sorted(fresh[r])
                ]
                return F.broadcast(
                    spark.createDataFrame(sel_rows, ["_afp", "_pos"])
                )
        groups: dict[tuple, list[str]] = {}
        for raw in affected:
            pv = cand_by_raw[raw].partition
            groups.setdefault(tuple(sorted(pv.items())), []).append(raw)
        seq = meta["last-sequence-number"] + 1
        variants = self._rename_history()
        fid_of = {
            f["name"]: f["id"]
            for f in self._schema_by_id(sid)["fields"]
        }
        scan_schema = self._spark_schema(
            sid, exclude=set(part_cols), name_variants=variants
        )
        full = self._spark_schema(sid, exclude=set(part_cols))
        spark_types = {f.name: f.dataType for f in full.fields}

        def _lcol(name):
            # logical column across rename variants (read-path rule):
            # a conforming file carries exactly one historical name
            vs = (variants.get(fid_of[name], [name]) if variants
                  else [name])
            return F.coalesce(*[F.col(n) for n in vs])

        new_entries: list[dict] = []
        spec_fields = self._spec_fields(meta, 0)
        for gi, pv_t in enumerate(sorted(groups)):
            raws = groups[pv_t]
            src = spark.read.schema(scan_schema).parquet(
                *[cand_by_raw[r].path for r in raws]
            ).select(
                F.col("_metadata.file_path").alias("_fp"),
                F.col("_metadata.row_index").alias("_pos"),
                *[_lcol(f.name).alias(f.name) for f in full.fields],
            )
            decoded = F.url_decode(
                F.regexp_replace(
                    F.regexp_replace(F.col("_fp"), "^file:(//)?", ""),
                    r"\+",
                    "%2B",
                )
            )
            upd = src.withColumn("_afp", decoded).join(
                select_pairs(raws), ["_afp", "_pos"], "inner"
            )
            # ONE select: every SET expression evaluates against the
            # ORIGINAL row (simultaneous-assignment UPDATE semantics)
            exprs = {
                c: (v if isinstance(v, Column) else F.lit(v))
                .cast(spark_types[c])
                for c, v in set_values.items()
            }
            out = upd.select(*[
                exprs.get(f.name, F.col(f.name)).alias(f.name)
                for f in full.fields
            ])
            rel_new = f"data/part-update-{seq}-{gi}.parquet"
            dest = os.path.join(self.dir, rel_new)
            from hadoop_sync_spark.io import write_single_parquet

            write_single_parquet(out, dest, "iceberg_update_")
            lb, ub = parquet_column_bounds(dest, schema_fields)
            n_rows = pq.read_metadata(dest).num_rows
            new_entries.append({
                "status": _STATUS_ADDED,
                "snapshot_id": None,
                "sequence_number": None,
                "file_sequence_number": None,
                "data_file": {
                    "content": _CONTENT_DATA,
                    "file_path": rel_new,
                    "file_format": "PARQUET",
                    "partition": dict(pv_t),
                    "record_count": n_rows,
                    "file_size_in_bytes": os.path.getsize(dest),
                    "equality_ids": None,
                    "lower_bounds": [
                        {"key": k, "value": v}
                        for k, v in sorted(lb.items())
                    ] or None,
                    "upper_bounds": [
                        {"key": k, "value": v}
                        for k, v in sorted(ub.items())
                    ] or None,
                },
            })
        # the position-delete file(s) covering the replaced rows
        if fresh_frame is not None:
            del_entries = self._pos_delete_entries_from_frame(
                fresh_frame.select(
                    F.col("_raw").alias("file_path"),
                    F.col("_pos").cast("long").alias("pos"),
                ),
                n_updated, meta, seq,
            )
            fresh_frame.unpersist()
        else:
            pairs = sorted(
                (raw, p) for raw in fresh for p in fresh[raw]
            )
            import pyarrow as pa

            del_rel = f"data/delete-pos-{seq}.parquet"
            del_path = os.path.join(self.dir, del_rel)
            pq.write_table(
                pa.table({
                    "file_path": pa.array([p for p, _ in pairs],
                                          pa.string()),
                    "pos": pa.array([p for _, p in pairs],
                                    pa.int64()),
                }),
                del_path,
            )
            del_entries = [{
                "status": _STATUS_ADDED,
                "snapshot_id": None,
                "sequence_number": None,
                "file_sequence_number": None,
                "data_file": {
                    "content": _CONTENT_POS_DELETES,
                    "file_path": del_rel,
                    "file_format": "PARQUET",
                    "partition": {
                        f["name"]: None for f in spec_fields
                    },
                    "record_count": len(pairs),
                    "file_size_in_bytes": os.path.getsize(del_path),
                    "equality_ids": None,
                },
            }]
        self._commit_snapshot(
            self._live_entries() + new_entries,
            "overwrite",
            now_ms,
            delete_entries=self._live_delete_entries() + del_entries,
        )
        return n_updated

    def add_equality_deletes(
        self, rows: list[dict], equality_ids: list[int], now_ms: int = 0
    ) -> int:
        """Merge-on-read EQUALITY delete — the documented write face
        (round 11; the Iceberg twin of the Delta DV writer
        :meth:`DeltaLog.add_deletion_vector`, spec "Equality Delete
        Files" / "Sequence Numbers").  Writes one delete parquet holding
        the equality columns (keyed by schema FIELD IDS; the file's
        column names are the current schema's names for those ids) and
        commits it in a delete manifest (content=2) whose entry leaves
        ``sequence_number`` null — the commit's own sequence number is
        INHERITED per the spec's assignment rule, which is what makes
        the semantics right: the delete applies at read time to data
        files STRICTLY OLDER (data sequence < delete sequence), so a
        row re-inserted with the same key after the delete survives —
        upsert semantics, pinned by
        tests/test_iceberg.py::test_equality_deletes_upsert_semantics.
        ``rows`` are keyed by the CURRENT schema's column names; a
        renamed table's historical delete files keep resolving by field
        id on the read side (name variants).  Refuses unknown field ids
        and column types outside the supported scalar map."""
        entry = self._equality_delete_entry(rows, equality_ids)
        return self._commit_snapshot(
            self._live_entries(),
            "delete",
            now_ms,
            delete_entries=self._live_delete_entries() + [entry],
        )

    def merge_upsert(
        self,
        spark,
        source,
        key_col: str,
        now_ms: int = 0,
    ) -> dict:
        """MERGE/upsert the Flink-CDC way (round 11): ONE snapshot
        commits the source rows as a new data file (footer bounds
        stamped) PLUS an equality-delete file on ``key_col`` covering
        the source keys.  **No target scan at any size** — the work is
        O(source), never O(table), because the spec does the matching
        at read time: the equality delete hides old rows with those
        keys in STRICTLY older files (sequence <), and the same-commit
        data file is exempt by exactly that strictness, so the new
        versions survive.  This is how production streaming writers
        land CDC upserts on 100 TB tables without reading them.
        ``source`` is a DataFrame carrying exactly the table's data
        columns (extra columns refuse; missing ones null-fill is NOT
        assumed — refuse, an upsert that silently nulls columns is a
        data bug).  Distinct source keys under
        :data:`DELETE_ROWS_LIMIT` materialize driver-side for the
        delete file; above it the EXECUTOR tier (round 12) writes the
        sorted delete parquet straight from the distributed frame.
        Partitioned tables (round 12) split the source per partition
        tuple and land one data file per tuple in the same snapshot,
        each stamped with its tuple and footer bounds; the equality
        delete stays table-wide (all-null tuple) so old rows hide
        across every partition, exactly the Flink-CDC shape.
        Bucket/truncate/temporal default specs are supported too
        (round 13): the transform value derives per source row via
        :func:`transform_column` — the spec-vector-verified functions
        the pruning layers use — with the source column kept in the
        data files.  Renamed histories are fine — equality deletes
        resolve by field id on the read side."""
        from pyspark.sql import functions as F

        meta = self.metadata()
        sid = meta.get("current-schema-id", 0)
        schema_fields = self._schema_by_id(sid)["fields"]
        names = [f["name"] for f in schema_fields]
        by_id = {f["id"]: f["name"] for f in schema_fields}
        if key_col not in names:
            raise ValueError(f"no such column {key_col!r}")
        part_cols, field_of, derived, pv_encode = (
            self._default_spec_split(meta, "merge_upsert")
        )
        if key_col in part_cols:
            raise NotImplementedError(
                f"merge_upsert key on partition(-source) column "
                f"{key_col!r}: identity partition values are attached "
                "from the manifests, not stored in the data files — "
                "key on a data column"
            )
        extra = set(source.columns) - set(names)
        missing = set(names) - set(source.columns)
        if extra or missing:
            raise ValueError(
                f"source columns must match the table's data columns "
                f"exactly (extra: {sorted(extra)}, "
                f"missing: {sorted(missing)})"
            )
        key_fid, key_typ = next(
            (f["id"], f["type"]) for f in schema_fields
            if f["name"] == key_col
        )
        if key_typ not in ("long", "int", "string", "double",
                           "boolean"):
            # fail BEFORE any file writes — _equality_delete_entry
            # would refuse this type after the data file landed,
            # leaving an orphan (r11 review)
            raise NotImplementedError(
                f"merge_upsert key on {key_typ!r} column: equality "
                "deletes support scalar long/int/string/double/boolean "
                "keys"
            )
        full = self._spark_schema(sid)
        cap = self.DELETE_ROWS_LIMIT
        # collect the CAST key values — the delete file must carry
        # exactly what the data file stores (r11 review)
        from pyspark.sql import functions as _F

        keys_df = source.select(
            _F.col(key_col).cast(full[key_col].dataType)
        ).distinct()
        keys = [r[0] for r in keys_df.limit(cap + 1).collect()]
        if not keys:
            return {"snapshot_id": None, "rows": 0, "keys": 0}
        over_cap_keys = len(keys) > cap
        if over_cap_keys:
            # EXECUTOR tier (round 12): the key set never materializes
            # — the null check becomes an aggregate and the delete
            # parquet writes from the distributed frame below
            if keys_df.where(
                _F.col(key_col).isNull()
            ).limit(1).count():
                raise ValueError(
                    "merge_upsert source contains NULL keys — upsert "
                    "keys must be non-null"
                )
        elif any(k is None for k in keys):
            # keep the format twins consistent: Delta's `=` match can
            # never hit NULL while our equality read is null-safe — a
            # null-keyed upsert is ambiguous, both faces refuse
            raise ValueError(
                "merge_upsert source contains NULL keys — upsert keys "
                "must be non-null"
            )
        cast_src = source.select(*[
            F.col(n).cast(full[n].dataType) for n in names
        ])
        seq = meta["last-sequence-number"] + 1
        from hadoop_sync_spark.io import write_single_parquet

        import pyarrow.parquet as _pq

        data_names = [n for n in names if n not in part_cols]
        data_schema_fields = [
            f for f in schema_fields if f["name"] not in part_cols
        ]

        def _data_entry(rel, pv, rows, dest):
            lb, ub = parquet_column_bounds(dest, data_schema_fields)
            return {
                "status": _STATUS_ADDED,
                "snapshot_id": None,
                "sequence_number": None,
                "file_sequence_number": None,
                "data_file": {
                    "content": _CONTENT_DATA,
                    "file_path": rel,
                    "file_format": "PARQUET",
                    "partition": pv,
                    "record_count": rows,
                    "file_size_in_bytes": os.path.getsize(dest),
                    "equality_ids": None,
                    "lower_bounds": [
                        {"key": k, "value": v}
                        for k, v in sorted(lb.items())
                    ] or None,
                    "upper_bounds": [
                        {"key": k, "value": v}
                        for k, v in sorted(ub.items())
                    ] or None,
                },
            }

        data_entries: list[dict] = []
        n_rows = 0
        if part_cols or derived:
            # per-tuple split; transform fields (round 13) derive
            # once per row into helper columns, identity fields split
            # on the source — the append_stream_batch shape
            work = cast_src
            for h, _, expr in derived:
                work = work.withColumn(h, expr)
            key_cols = [*part_cols, *[h for h, _, _ in derived]]
            tuples, cond_for = self._split_tuples(work, key_cols)
            for gi, t in enumerate(tuples):
                out = work.where(cond_for(t)).select(*data_names)
                rel_new = f"data/part-upsert-{seq}-{gi}.parquet"
                dest = os.path.join(self.dir, rel_new)
                write_single_parquet(out, dest, "iceberg_upsert_")
                rows = _pq.read_metadata(dest).num_rows
                n_rows += rows
                pv = {field_of[c]: pv_encode(c, t[c])
                      for c in part_cols}
                pv.update({fn: t[h] for h, fn, _ in derived})
                data_entries.append(_data_entry(
                    rel_new, pv, rows, dest,
                ))
        else:
            rel_new = f"data/part-upsert-{seq}.parquet"
            dest = os.path.join(self.dir, rel_new)
            write_single_parquet(cast_src, dest, "iceberg_upsert_")
            n_rows = _pq.read_metadata(dest).num_rows
            data_entries.append(_data_entry(rel_new, {}, n_rows, dest))
        if over_cap_keys:
            # the delete parquet writes straight from the distributed
            # distinct-keys frame, sorted — the driver sees only the
            # footer metadata for the manifest entry
            seq_d = meta["last-sequence-number"] + 1
            del_rel = f"data/delete-eq-{seq_d}.parquet"
            del_path = os.path.join(self.dir, del_rel)
            write_single_parquet(
                keys_df.sort(key_col), del_path, "iceberg_eqdel_"
            )
            n_keys = _pq.read_metadata(del_path).num_rows
            spec_fields = self._spec_fields(meta, 0)
            del_entry = {
                "status": _STATUS_ADDED,
                "snapshot_id": None,
                "sequence_number": None,
                "file_sequence_number": None,
                "data_file": {
                    "content": _CONTENT_EQ_DELETES,
                    "file_path": del_rel,
                    "file_format": "PARQUET",
                    "partition": {
                        f["name"]: None for f in spec_fields
                    },
                    "record_count": n_keys,
                    "file_size_in_bytes": os.path.getsize(del_path),
                    "equality_ids": [key_fid],
                },
            }
        else:
            n_keys = len(keys)
            del_entry = self._equality_delete_entry(
                [{key_col: k}
                 for k in sorted(keys)],
                [key_fid],
            )
        snap_id = self._commit_snapshot(
            self._live_entries() + data_entries,
            "overwrite",
            now_ms,
            delete_entries=self._live_delete_entries() + [del_entry],
        )
        return {"snapshot_id": snap_id, "rows": n_rows,
                "keys": n_keys}

    def incremental_scan(
        self,
        spark,
        from_snapshot_id: int,
        to_snapshot_id: int | None = None,
    ) -> "DataFrame":
        """Incremental APPEND scan (round 11; Iceberg's incremental
        read): the rows added by append snapshots AFTER
        ``from_snapshot_id`` (exclusive) up to ``to_snapshot_id``
        (inclusive, default current), each tagged with the
        ``_snapshot_id`` that added it — the CDC-consumer face for
        append-only ingestion, O(new data) regardless of table size.
        Every snapshot in the range must be an ``append``:
        overwrite/delete/replace snapshots refuse (their row-level
        story is the changelog scan, out of this face's scope), and
        the appended rows are returned AS APPENDED — later delete
        files do not subtract here, per the incremental-read contract.
        Renamed histories are SUPPORTED (round 13, lifting the r11
        refusal): the scan pins one physical column per historical
        name of each field and coalesces across the variants, emitting
        the CURRENT names — the batch read path's rule, the same one
        ``read_changes`` applies on the Delta side."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from hadoop_sync_spark.io import attach_file_columns

        variants = self._rename_history()
        snaps = self.snapshots()
        ids = [s["snapshot-id"] for s in snaps]
        if from_snapshot_id not in ids:
            raise ValueError(
                f"unknown snapshot id {from_snapshot_id}"
            )
        if to_snapshot_id is None:
            # the table's CURRENT snapshot, not the last listed one —
            # external metadata may stage snapshots past the current
            # pointer (rolled-back tables), and read() would not show
            # their rows (r11 review)
            to_snapshot_id = self.snapshot()["snapshot-id"]
        if to_snapshot_id not in ids:
            raise ValueError(f"unknown snapshot id {to_snapshot_id}")
        i0, i1 = ids.index(from_snapshot_id), ids.index(to_snapshot_id)
        if i1 < i0:
            raise ValueError(
                f"to_snapshot {to_snapshot_id} precedes "
                f"from_snapshot {from_snapshot_id}"
            )
        rng = snaps[i0 + 1: i1 + 1]
        for s in rng:
            op = (s.get("summary") or {}).get("operation")
            if op != "append":
                raise NotImplementedError(
                    f"incremental_scan over a {op!r} snapshot "
                    f"({s['snapshot-id']}): append-only ranges only — "
                    "use changelog_scan for row-level "
                    "overwrite/delete history"
                )
        # O(new files), not O(range x table): each range snapshot's
        # manifest list names the manifests IT added
        # (added_snapshot_id); only those manifests' ADDED entries are
        # this snapshot's new files (r11 review — the set-difference
        # walk re-listed every live file per snapshot)
        added: dict[str, tuple] = {}  # raw_path -> (sid, DataFile)
        range_specs: set[int] = set()
        for s in rng:
            snap_id = s["snapshot-id"]
            _, manifests, _ = read_ocf(
                self._resolve(s["manifest-list"])
            )
            for mf in manifests:
                if (mf["content"] != _MANIFEST_DATA
                        or mf.get("added_snapshot_id") != snap_id):
                    continue
                range_specs.add(mf["partition_spec_id"])
                _, entries, _ = read_ocf(
                    self._resolve(mf["manifest_path"])
                )
                for e in entries:
                    if e["status"] != _STATUS_ADDED:
                        continue
                    df = e["data_file"]
                    if df["content"] != _CONTENT_DATA:
                        continue
                    added[df["file_path"]] = (snap_id, DataFile(
                        path=self._resolve(df["file_path"]),
                        partition=dict(df["partition"]),
                        record_count=df["record_count"],
                        file_size=df["file_size_in_bytes"],
                        raw_path=df["file_path"],
                    ))
        meta = self.metadata()
        sid = meta.get("current-schema-id", 0)
        # partition columns come from the SPEC names (stable whether or
        # not anything was added — an empty interval's frame must union
        # with a non-empty one; r11 review caught the added-derived
        # names making the typing block unreachable).  Under spec
        # evolution the names come from the RANGE's own specs (each
        # added manifest records its spec id; an empty interval types
        # by the default spec) so a wholly pre-evolution range keeps
        # its identity columns in the DATA section where its files
        # carry them.
        if not range_specs:
            range_specs = {meta.get("default-spec-id", 0)}
        part_types: dict[str, str] = {}
        for spec in meta.get("partition-specs", []):
            if spec["spec-id"] not in range_specs:
                continue
            for pf in spec.get("fields", []):
                part_types.setdefault(
                    pf["name"], pf.get("result-type", "string")
                )
        part_cols = sorted(part_types)
        data_schema = self._spark_schema(sid, exclude=set(part_cols))
        inferred = {"int": T.LongType(), "long": T.LongType(),
                    "date": T.LongType(), "string": T.StringType()}
        sch_types = {
            f["name"]: f["type"]
            for f in self._schema_by_id(sid)["fields"]
            if isinstance(f["type"], str)
        }
        #: identity DATE partition columns type as DateType, matching
        #: read()'s epoch-day conversion (transform fields keep longs)
        date_parts = {
            c for c in part_cols
            if part_types.get(c) == "date"
            and sch_types.get(c) == "date"
        }
        out_schema = T.StructType(
            list(data_schema.fields)
            + [T.StructField(
                c,
                T.DateType() if c in date_parts
                else inferred.get(part_types.get(c, "string"),
                                  T.StringType()), True)
               for c in part_cols]
            + [T.StructField("_snapshot_id", T.LongType(), False)]
        )
        if not added:
            return spark.createDataFrame([], out_schema)
        infos = sorted(added.items())
        schema_names = {
            f["name"] for f in self._schema_by_id(sid)["fields"]
        }
        cross = sorted({
            c for c in part_cols
            if c in schema_names
            and any(c not in f.partition for _, (_, f) in infos)
        })
        if cross:
            # a range crossing an identity-field spec evolution mixes
            # files that carry the column in DATA with files that
            # record it in metadata; this face's one-schema scan would
            # silently drop the data-side values — read() composes the
            # two eras, the incremental face refuses (honest seam)
            raise NotImplementedError(
                "incremental_scan range crosses a spec evolution on "
                f"identity fields {cross}: scan the eras separately "
                "or use read()"
            )
        reader = spark.read
        if len(meta.get("schemas", [])) > 1 or variants:
            # pin the scan schema: one physical column per historical
            # name of each field (a conforming file carries exactly
            # one; the rest null-fill)
            reader = reader.schema(self._spark_schema(
                sid, exclude=set(part_cols), name_variants=variants
            ))
        scan = reader.parquet(*[f.path for _, (_, f) in infos])
        rows = [
            (_norm_path(f.path), snap_id)
            + tuple(f.partition.get(c) for c in part_cols)
            for _, (snap_id, f) in infos
        ]
        fid_of = {
            f["name"]: f["id"]
            for f in self._schema_by_id(sid)["fields"]
        }

        def _lcol(n):
            vs = (variants.get(fid_of[n], [n]) if variants else [n])
            if len(vs) == 1:
                return F.col(vs[0])
            return F.coalesce(*[F.col(v) for v in vs])

        return attach_file_columns(
            scan, rows, ["_snapshot_id", *part_cols],
            what="iceberg incremental scan",
        ).select(
            *[_lcol(f.name).alias(f.name)
              for f in data_schema.fields],
            *[F.date_from_unix_date(F.col(c).cast("int")).alias(c)
              if c in date_parts else F.col(c)
              for c in part_cols],
            "_snapshot_id",
        )

    def changelog_scan(
        self,
        spark,
        from_snapshot_id: int,
        to_snapshot_id: int | None = None,
    ) -> "DataFrame":
        """Row-level CHANGELOG scan (round 12 — the face
        :meth:`incremental_scan`'s delete refusal names; Iceberg's
        ``create_changelog_view`` shape): every snapshot in
        ``(from, to]`` contributes its row-level effect as tagged rows
        — ``_change_type`` ``insert``/``delete`` plus the
        ``_snapshot_id`` that caused it — so CDC consumers can replay
        DELETE/UPDATE/MERGE history, not just appends.

        Derivation is a per-snapshot VISIBILITY DIFF restricted to the
        files that could have changed, never a table diff:

        - inserts are the snapshot's ADDED data files read at that
          snapshot (so a same-commit delete file already subtracts);
        - deletes come from ``read(parent, paths=targeted) EXCEPT ALL
          read(snapshot, paths=targeted)``, where ``targeted`` is
          metadata-derived: files REMOVED by the snapshot, plus the
          files its NEW position-delete files name (sequence-checked),
          plus — for new equality-delete files — the strictly-older
          live files bounds-pruned by the delete keys' min/max (one
          Spark aggregate over the metadata-scale delete parquet; the
          pruning skips when keys carry NULLs or multiple columns,
          staying a conservative superset).  Both sides are SUBSET
          scans with the full merge-on-read machinery, so prior
          deletes, sequence rules and null-safe equality semantics are
          exactly :meth:`read`'s.

        Work is O(added + targeted files), never O(range × table).
        ``replace`` snapshots (compaction) are skipped — the spec
        defines them as logical no-ops, the same trust production
        changelog readers extend.  Renamed histories are SUPPORTED
        (round 13): every frame comes from :meth:`read`, whose
        name-variant coalesce already emits CURRENT names; the
        equality-key bounds pruning resolves the key's historical
        name against each delete parquet's own columns (skipping the
        pruning — a conservative superset — when none matches).  Note
        a range CROSSING the rename itself still refuses via the
        schema-change check below (a rename mints a new schema id).
        Refusals (honest seams): ranges crossing a schema change (the
        diff would union frames of different widths; Delta's twin
        pins the end schema — scan the eras separately here), ranges
        containing snapshot operations other than
        append/delete/overwrite/replace, and a partition-shape change
        inside the range."""
        from pyspark.sql import functions as F

        variants = self._rename_history()
        snaps = self.snapshots()
        ids = [s["snapshot-id"] for s in snaps]
        if from_snapshot_id not in ids:
            raise ValueError(f"unknown snapshot id {from_snapshot_id}")
        if to_snapshot_id is None:
            to_snapshot_id = self.snapshot()["snapshot-id"]
        if to_snapshot_id not in ids:
            raise ValueError(f"unknown snapshot id {to_snapshot_id}")
        by_id = {s["snapshot-id"]: s for s in snaps}
        # ancestry walk (parent-snapshot-id) when the metadata records
        # it — correct across rollbacks, whose ABANDONED snapshots stay
        # in the list between the restored id and later commits; the
        # list-order fallback covers legacy metadata without parent
        # links (linear history by the same assumption
        # incremental_scan documents)
        if any("parent-snapshot-id" in s for s in snaps):
            chain: list[dict] = []
            cur = to_snapshot_id
            while cur != from_snapshot_id:
                s = by_id[cur]
                chain.append(s)
                p = s.get("parent-snapshot-id")
                if p is None or p not in by_id:
                    raise ValueError(
                        f"snapshot {from_snapshot_id} is not an "
                        f"ancestor of {to_snapshot_id}"
                    )
                cur = p
            chain.reverse()
        else:
            i0 = ids.index(from_snapshot_id)
            i1 = ids.index(to_snapshot_id)
            if i1 < i0:
                raise ValueError(
                    f"to_snapshot {to_snapshot_id} precedes "
                    f"from_snapshot {from_snapshot_id}"
                )
            chain = snaps[i0 + 1: i1 + 1]
        end_schema = self._read_schema_id(to_snapshot_id)
        for s in [by_id[from_snapshot_id], *chain]:
            if self._read_schema_id(s["snapshot-id"]) != end_schema:
                raise NotImplementedError(
                    "changelog_scan range crosses a schema change "
                    f"(snapshot {s['snapshot-id']} reads schema "
                    f"{self._read_schema_id(s['snapshot-id'])}, the "
                    f"range end reads {end_schema}): scan the eras "
                    "separately"
                )
        name_of = {
            f["id"]: f["name"]
            for f in self._schema_by_id(end_schema)["fields"]
        }
        frames = []
        cols_ref: list[str] | None = None

        def _tag(df, kind, snap_id):
            nonlocal cols_ref
            if cols_ref is None:
                cols_ref = list(df.columns)
            elif list(df.columns) != cols_ref:
                raise NotImplementedError(
                    "changelog_scan range crosses a partition-shape "
                    f"change ({cols_ref} vs {list(df.columns)}): scan "
                    "the eras separately"
                )
            return df.select(
                "*",
                F.lit(kind).alias("_change_type"),
                F.lit(snap_id).cast("long").alias("_snapshot_id"),
            )

        prev_id = from_snapshot_id
        for s in chain:
            snap_id = s["snapshot-id"]
            parent_id = prev_id
            prev_id = snap_id
            op = (s.get("summary") or {}).get("operation")
            if op == "replace":
                continue  # compaction: logical no-op by spec contract
            if op not in ("append", "delete", "overwrite"):
                raise NotImplementedError(
                    f"changelog_scan over a {op!r} snapshot "
                    f"({snap_id})"
                )
            live_p = {f.raw_path: f
                      for f in self.files(snapshot_id=parent_id)}
            live_s = {f.raw_path: f
                      for f in self.files(snapshot_id=snap_id)}
            added = sorted(set(live_s) - set(live_p))
            if added:
                frames.append(_tag(
                    self.read(spark, snapshot_id=snap_id,
                              paths=set(added)),
                    "insert", snap_id,
                ))
            targeted = set(live_p) - set(live_s)  # removed files
            dels_p = {d.raw_path
                      for d in self.delete_files(
                          snapshot_id=parent_id)}
            for d in self.delete_files(snapshot_id=snap_id):
                if d.raw_path in dels_p:
                    continue
                if d.content == _CONTENT_POS_DELETES:
                    named = {
                        r[0] for r in spark.read.parquet(d.path)
                        .select("file_path").distinct().collect()
                    }
                    targeted |= {
                        raw for raw in named
                        if raw in live_p
                        and live_p[raw].sequence <= d.sequence
                    }
                elif d.content == _CONTENT_EQ_DELETES:
                    older = {
                        raw for raw, f in live_p.items()
                        if f.sequence < d.sequence
                        and f.content == _CONTENT_DATA
                    }
                    if len(d.equality_ids) == 1:
                        kc = name_of.get(d.equality_ids[0])
                        if kc is not None and older:
                            ddf = spark.read.parquet(d.path)
                            # a pre-rename delete parquet carries the
                            # key under a historical name — resolve
                            # against the file's own columns; no
                            # match skips the pruning (sound: the
                            # targeted set stays a superset)
                            vs = (variants.get(d.equality_ids[0],
                                               [kc])
                                  if variants else [kc])
                            kf = next(
                                (n for n in vs if n in ddf.columns),
                                None,
                            )
                            if kf is None:
                                targeted |= older
                                continue
                            agg = ddf.agg(
                                F.min(kf).alias("lo"),
                                F.max(kf).alias("hi"),
                                F.count(F.when(
                                    F.col(kf).isNull(), 1
                                )).alias("nulls"),
                            ).first()
                            if not agg.nulls and agg.lo is not None:
                                pruned = {
                                    f.raw_path for f in self.files(
                                        snapshot_id=parent_id,
                                        column_filter={
                                            kc: (agg.lo, agg.hi)
                                        },
                                    )
                                }
                                older &= pruned
                    targeted |= older
            if targeted:
                before = self.read(
                    spark, snapshot_id=parent_id, paths=targeted
                )
                alive = targeted & set(live_s)
                if alive:
                    after = self.read(
                        spark, snapshot_id=snap_id, paths=alive
                    )
                    if list(after.columns) != list(before.columns):
                        raise NotImplementedError(
                            "changelog_scan range crosses a "
                            "partition-shape change: scan the eras "
                            "separately"
                        )
                    diff = before.exceptAll(after)
                else:
                    diff = before
                frames.append(_tag(diff, "delete", snap_id))
        if not frames:
            base = self.read(
                spark, snapshot_id=to_snapshot_id
            ).limit(0)
            return _tag(base, "insert", to_snapshot_id).limit(0)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    def _equality_delete_entry(
        self, rows: list[dict], equality_ids: list[int]
    ) -> dict:
        """Write the equality-delete parquet and build its manifest
        entry WITHOUT committing — shared by
        :meth:`add_equality_deletes` (its own snapshot) and
        :meth:`merge_upsert` (one snapshot carrying data + delete)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not rows or not equality_ids:
            raise ValueError("equality delete needs rows and field ids")
        meta = self.metadata()
        # by schema-id lookup, never list position (external metadata
        # need not keep schema ids as list indexes — the same round-10
        # defect the READ side fixed, closed here on the write side)
        schema_fields = {
            f["id"]: f
            for f in self._schema_by_id(
                meta.get("current-schema-id", 0)
            )["fields"]
        }
        names = []
        for fid in equality_ids:
            if fid not in schema_fields:
                raise ValueError(f"unknown schema field id {fid}")
            names.append(schema_fields[fid]["name"])
        seq = meta["last-sequence-number"] + 1
        rel = f"data/delete-eq-{seq}.parquet"
        path = os.path.join(self.dir, rel)
        arrow_t = {
            "long": pa.int64(),
            "int": pa.int32(),
            "string": pa.string(),
            "double": pa.float64(),
            "boolean": pa.bool_(),
        }
        cols = {}
        for fid, name in zip(equality_ids, names):
            typ = schema_fields[fid]["type"]
            if typ not in arrow_t:
                raise NotImplementedError(
                    f"equality delete on {typ!r} column"
                )
            cols[name] = pa.array([r[name] for r in rows], arrow_t[typ])
        pq.write_table(pa.table(cols), path)
        spec_fields = self._spec_fields(meta, 0)
        return {
            "status": _STATUS_ADDED,
            "snapshot_id": None,
            "sequence_number": None,
            "file_sequence_number": None,
            "data_file": {
                "content": _CONTENT_EQ_DELETES,
                "file_path": rel,
                "file_format": "PARQUET",
                "partition": {f["name"]: None for f in spec_fields},
                "record_count": len(rows),
                "file_size_in_bytes": os.path.getsize(path),
                "equality_ids": list(equality_ids),
            },
        }

    def _schema_by_id(self, sid: int) -> dict:
        for s in self.metadata().get("schemas", []):
            if s.get("schema-id", 0) == sid:
                return s
        raise ValueError(f"no schema with schema-id {sid}")

    def _rename_history(self) -> dict[int, list[str]] | None:
        """Classify the schema history for column resolution (pure
        metadata).  Returns:

        - ``None`` — every field id kept one name and every name one
          id: plain NAME resolution is sound;
        - ``{fid: [names, latest first]}`` — some field id changed
          NAME (a spec rename) while every name still belongs to ONE
          id across the whole history: resolution goes by NAME VARIANT
          (round 10) — the scan schema pins every historical name of
          the field (a conforming file carries exactly one of them)
          and the logical column coalesces across the variants, so
          renamed tables read without footer field ids, on one scan;
        Spec-legal type PROMOTIONS (int → long, float → double; round
        10) pass the check without needing variants: the read pins the
        snapshot schema's (widest) type and Spark's parquet reader
        upcasts narrower physical columns natively.  Raises on:

        - an ILLEGAL type change (anything off the promotion lattice,
          or a narrowing) — per-file coercion stays the honest seam;
        - a name carried by two field ids (drop + re-add: an old
          file's physical column would leak into the new field under
          any name-based scheme), pending footer-field-id resolution."""
        names_of: dict[int, list[str]] = {}
        typ_of: dict[int, str] = {}
        name_ids: dict[str, int] = {}
        renamed = False
        for s in self.metadata().get("schemas", []):
            for f in s["fields"]:
                typ = json.dumps(f["type"], sort_keys=True)
                prev_t = typ_of.setdefault(f["id"], typ)
                if prev_t != typ:
                    if (prev_t, typ) in _PROMOTIONS:
                        typ_of[f["id"]] = typ  # widened; keep walking
                    else:
                        raise NotImplementedError(
                            f"type change (field id {f['id']}: "
                            f"{prev_t} -> {typ}) is off the spec's "
                            "promotion lattice; refusing to silently "
                            "mis-read"
                        )
                owner = name_ids.setdefault(f["name"], f["id"])
                if owner != f["id"]:
                    raise NotImplementedError(
                        f"schema evolution beyond add/drop/rename "
                        f"(name {f['name']!r} carried by field ids "
                        f"{owner} and {f['id']}) needs id-based "
                        "column resolution"
                    )
                seq = names_of.setdefault(f["id"], [])
                if f["name"] not in seq:
                    if seq:
                        renamed = True
                    seq.insert(0, f["name"])  # latest first
        return names_of if renamed else None

    def _spark_schema(
        self,
        sid: int,
        exclude: set | None = None,
        name_variants: dict[int, list[str]] | None = None,
    ):
        """Pinned Spark read schema for schema-id ``sid``.  With
        ``name_variants`` (a rename history from
        :meth:`_rename_history`) the schema pins a column per
        HISTORICAL name of each field — a conforming file carries
        exactly one of them (the name its write-time schema used), the
        rest null-fill, and the read's logical projection coalesces
        across the variants."""
        from pyspark.sql import types as T

        inv = {
            "long": T.LongType(), "int": T.IntegerType(),
            "double": T.DoubleType(), "float": T.FloatType(),
            "string": T.StringType(), "boolean": T.BooleanType(),
            "date": T.DateType(), "binary": T.BinaryType(),
            "timestamptz": T.TimestampType(),
            "timestamp": T.TimestampNTZType(),
        }
        fields = []
        for f in self._schema_by_id(sid)["fields"]:
            if exclude and f["name"] in exclude:
                continue
            ityp = f["type"]
            if not isinstance(ityp, str) or ityp not in inv:
                raise NotImplementedError(
                    f"iceberg type {ityp!r} in the read schema"
                )
            names = (
                name_variants.get(f["id"], [f["name"]])
                if name_variants else [f["name"]]
            )
            for n in names:
                fields.append(T.StructField(n, inv[ityp], True))
        return T.StructType(fields)

    def add_column(
        self, name: str, spark_type: str, now_ms: int = 0
    ) -> int:
        """Schema evolution, the add-column face (spec: "Schema
        Evolution" — adds are metadata-only; existing data files simply
        lack the column and reads null-fill it).  Appends a new schema
        with the next schema-id and field id (``last-column-id`` + 1),
        points ``current-schema-id`` at it, and bumps the metadata
        version — no snapshot is committed (Iceberg's own shape: DDL is
        a metadata swap).  Returns the new field id."""
        meta = json.loads(json.dumps(self.metadata()))
        cur = self._schema_by_id(meta["current-schema-id"])
        if any(f["name"] == name for f in cur["fields"]):
            raise ValueError(f"column {name!r} already exists")
        if spark_type not in _SPARK_TO_ICEBERG:
            raise NotImplementedError(
                f"no Iceberg mapping for Spark type {spark_type!r}"
            )
        fid = meta["last-column-id"] + 1
        new_sid = max(
            s.get("schema-id", 0) for s in meta["schemas"]
        ) + 1
        new_schema = json.loads(json.dumps(cur))
        new_schema["schema-id"] = new_sid
        new_schema["fields"].append(
            {
                "id": fid,
                "name": name,
                "required": False,
                "type": _SPARK_TO_ICEBERG[spark_type],
            }
        )
        meta["schemas"].append(new_schema)
        meta["current-schema-id"] = new_sid
        meta["last-column-id"] = fid
        meta["last-updated-ms"] = now_ms
        self._write_metadata(self.current_version() + 1, meta)
        return fid

    def rename_column(self, old: str, new: str, now_ms: int = 0) -> None:
        """Schema evolution, the rename face (round 10; metadata-only
        like :meth:`add_column`): the new schema carries the SAME field
        id under the new name — the spec's id-stable rename.  Reads of
        a renamed table resolve columns by NAME VARIANT
        (:meth:`_rename_history` / :meth:`_spark_schema`): the pinned
        scan schema carries one physical column per historical name of
        the field, a conforming file populates exactly the name its
        write-time schema used (the rest null-fill), and the logical
        projection coalesces across the variants — ONE scan, no
        per-file plans, no reliance on parquet footer field ids (a
        conf-driven ``parquet.field.id`` design was measured and
        rejected in round 10: the conf is read at action time and
        stamped footers poison mixed-directory inferred reads).
        Refusal cases stay honest: a name carried by two field ids
        (drop + re-add of the same name) and off-lattice type changes
        both raise in ``_rename_history`` rather than mis-read.
        Partition-source columns refuse here: identity spec field
        NAMES were fixed at create time, and a renamed source would
        silently diverge from the attach column."""
        meta = json.loads(json.dumps(self.metadata()))
        cur = self._schema_by_id(meta["current-schema-id"])
        if not any(f["name"] == old for f in cur["fields"]):
            raise ValueError(f"no such column {old!r}")
        if any(f["name"] == new for f in cur["fields"]):
            raise ValueError(f"column {new!r} already exists")
        by_id = {f["id"]: f["name"] for f in cur["fields"]}
        for spec in meta.get("partition-specs", []):
            for pf in spec["fields"]:
                if by_id.get(pf.get("source-id")) == old:
                    raise ValueError(
                        f"column {old!r} is a partition source "
                        f"(spec field {pf['name']!r}) — renaming it "
                        "would diverge from the spec field name"
                    )
        new_sid = max(s.get("schema-id", 0) for s in meta["schemas"]) + 1
        new_schema = json.loads(json.dumps(cur))
        new_schema["schema-id"] = new_sid
        for f in new_schema["fields"]:
            if f["name"] == old:
                f["name"] = new
        meta["schemas"].append(new_schema)
        meta["current-schema-id"] = new_sid
        meta["last-updated-ms"] = now_ms
        self._write_metadata(self.current_version() + 1, meta)

    def create_ref(
        self,
        name: str,
        ref_type: str = "tag",
        snapshot_id: int | None = None,
        now_ms: int = 0,
    ) -> None:
        """Named ref (spec "Branching and Tagging", round 10): a tag or
        branch pointing at ``snapshot_id`` (default: current).
        Metadata-only version bump; ``main`` is writer-maintained and
        refuses; an existing ref refuses (drop it first — a silent
        repoint is how tags stop meaning anything).  Refs PROTECT their
        snapshots from :meth:`expire_snapshots`.

        Honest seam: refs here are POINTERS — every write face commits
        to ``main`` (a branch ref never diverges; it stays pinned where
        it was created).  Commit-to-branch semantics (per-branch
        lineage, parent tracking, cherry-pick) are production Iceberg
        surface this single-writer engine does not model."""
        if ref_type not in ("tag", "branch"):
            raise ValueError(f"ref type {ref_type!r}: tag or branch")
        if name == "main":
            raise ValueError("'main' is writer-maintained")
        meta = json.loads(json.dumps(self.metadata()))
        refs = meta.setdefault("refs", {})
        if name in refs:
            raise ValueError(f"ref {name!r} already exists")
        sid = (
            snapshot_id
            if snapshot_id is not None
            else meta.get("current-snapshot-id")
        )
        if sid is None or not any(
            s["snapshot-id"] == sid for s in meta.get("snapshots", [])
        ):
            raise ValueError(f"snapshot {sid} not found")
        refs[name] = {"snapshot-id": sid, "type": ref_type}
        meta["last-updated-ms"] = now_ms
        self._write_metadata(self.current_version() + 1, meta)

    def drop_ref(self, name: str, now_ms: int = 0) -> None:
        """Remove a named ref (its snapshot becomes expirable again)."""
        if name == "main":
            raise ValueError("'main' is writer-maintained")
        meta = json.loads(json.dumps(self.metadata()))
        refs = meta.get("refs") or {}
        if name not in refs:
            raise ValueError(f"no such ref {name!r}")
        del refs[name]
        meta["last-updated-ms"] = now_ms
        self._write_metadata(self.current_version() + 1, meta)

    def rollback_to(
        self,
        snapshot_id: int | None = None,
        now_ms: int = 0,
        as_of_timestamp_ms: int | None = None,
    ) -> None:
        """Set the current snapshot back (or forward) to an existing
        snapshot — by id, or by time via ``as_of_timestamp_ms`` (the
        snapshot-log state at that instant, :meth:`snapshot`'s own
        time-travel rule) — the spec's ``set-current-snapshot`` /
        rollback metadata update and the standard "undo a bad commit" face
        (reference parity: the reference's versioned publish keeps old
        versions precisely so the pointer can swap back;
        hadoopsync/Registry.java's version-dir pointer).

        Metadata-only version bump: ``current-snapshot-id`` repoints,
        ``main`` follows (it tracks the current snapshot), and a
        ``snapshot-log`` entry records the state change at ``now_ms``
        so timestamp time travel sees the rollback as the state from
        that moment on.  No snapshot is deleted — later snapshots stay
        in the list (readable by id, expirable once unreferenced), the
        same two-step undo discipline as :meth:`expire_snapshots` +
        :meth:`vacuum`.  ``last-sequence-number`` keeps its high
        watermark: sequence numbers are never reused, so a commit made
        after a rollback still orders strictly after everything it
        superseded (merge-on-read applicability stays correct).

        In this single-writer engine the snapshot history is linear —
        every listed snapshot is an ancestor-or-descendant of the
        current one — so one face covers both the spec's ancestor-only
        ``rollback`` and its general ``set-current-snapshot``.  Rolling
        back to the current snapshot refuses (a no-op commit would
        stamp a misleading state change)."""
        if (snapshot_id is None) == (as_of_timestamp_ms is None):
            raise ValueError(
                "give snapshot_id OR as_of_timestamp_ms"
            )
        by_time = as_of_timestamp_ms is not None
        if by_time:
            snapshot_id = self.snapshot(
                as_of_timestamp_ms=as_of_timestamp_ms
            )["snapshot-id"]
        meta = json.loads(json.dumps(self.metadata()))
        snaps = meta.get("snapshots", [])
        if by_time and meta.get("current-snapshot-id") == snapshot_id:
            # a TIMESTAMP that resolves to the current snapshot is an
            # idempotent no-op (the caller cannot know which snapshot
            # an instant resolves to — Delta's restore prints a no-op
            # for the same case); an EXPLICIT id keeps the refusal
            return
        if not any(s["snapshot-id"] == snapshot_id for s in snaps):
            raise ValueError(f"snapshot {snapshot_id} not found")
        if meta.get("current-snapshot-id") == snapshot_id:
            raise ValueError(
                f"snapshot {snapshot_id} is already current"
            )
        meta["current-snapshot-id"] = snapshot_id
        refs = dict(meta.get("refs") or {})
        refs["main"] = {"snapshot-id": snapshot_id, "type": "branch"}
        meta["refs"] = refs
        meta["snapshot-log"] = list(meta.get("snapshot-log", [])) + [
            {"timestamp-ms": now_ms, "snapshot-id": snapshot_id}
        ]
        meta["last-updated-ms"] = now_ms
        self._write_metadata(self.current_version() + 1, meta)

    def update_spec(
        self,
        partition_by: list[tuple] | None,
        now_ms: int = 0,
    ) -> int:
        """Partition-spec evolution (spec "Partition Evolution"): one
        metadata-only version bump appends a NEW spec — same
        ``partition_by`` shape as :meth:`create`: [(column,
        result_type[, transform[, name]])], ``None``/[] for
        unpartitioned — and makes it the default.  No data rewrites:
        existing files keep the spec their manifests were written
        under (manifests are spec-shaped, so :meth:`_commit_snapshot`
        carries them forward grouped per spec), new appends record
        values under the new spec, and the read path composes both —
        partition filters prune only files whose spec RECORDS the
        filtered field, with surviving pre-evolution files row-filtered
        for identity fields (they carry the source column in their
        data) and refused for transform fields (the file-level value
        does not exist and this engine does not re-derive transforms
        row-side).

        Partition field ids are never reused for different fields: a
        field identical to one in ANY earlier spec (same name,
        transform, source, type) keeps its id, anything else allocates
        past ``last-partition-id``.  Renamed column histories refuse
        (partition field names must stay resolvable against one name
        per source)."""
        import datetime as _dt

        meta = json.loads(json.dumps(self.metadata()))
        if self._rename_history():
            raise NotImplementedError(
                "update_spec on a renamed column history"
            )
        schema = self._schema_by_id(meta.get("current-schema-id", 0))
        by_name = {f["name"]: f["id"] for f in schema["fields"]}
        col_type = {f["name"]: f["type"] for f in schema["fields"]}
        known = {
            (f["name"], f["transform"], f["source-id"],
             f["result-type"]): f["field-id"]
            for spec in meta.get("partition-specs", [])
            for f in spec.get("fields", [])
        }
        #: cross-spec name discipline: a NAME must mean one thing
        #: across the whole spec history — the read path's per-name
        #: maps (filter transforms, attach types) would otherwise
        #: silently pick one era's meaning for every era's files
        #: (review finding: identity-then-void under one name let a
        #: filter match rows it never tested)
        name_meaning = {
            f["name"]: (f["transform"], f["source-id"],
                        f["result-type"])
            for spec in meta.get("partition-specs", [])
            for f in spec.get("fields", [])
        }
        next_id = meta.get("last-partition-id", 999) + 1
        new_fields: list[dict] = []
        for spec in partition_by or []:
            col, typ = spec[0], spec[1]
            transform = spec[2] if len(spec) > 2 else "identity"
            if col not in by_name:
                raise ValueError(f"no such column {col!r}")
            if typ not in ("int", "long", "string", "date"):
                raise NotImplementedError(
                    f"partition result type {typ!r}"
                )
            src_t = str(col_type.get(col))
            if transform == "identity":
                # identity records the SOURCE value: the result type
                # must be the column's own type or the read-side
                # attach would mistype every recorded value.  Source
                # types OUTSIDE the want-map refuse outright (ADVICE
                # r11: skipping the check committed specs whose
                # declared int/long/string/date result type could
                # never match e.g. a timestamp or boolean source)
                want = {"bigint": "long", "long": "long",
                        "int": "int", "integer": "int",
                        "string": "string", "date": "date"}.get(src_t)
                if want is None:
                    raise NotImplementedError(
                        f"identity partition on {src_t!r} column "
                        f"{col!r}: no declarable result type matches "
                        "its recorded values"
                    )
                if typ != want:
                    raise ValueError(
                        f"identity partition on {col!r} needs result "
                        f"type {want!r}, not {typ!r}"
                    )
            else:
                # validate up front so a bad combination refuses HERE,
                # never on the first post-evolution append (review: a
                # hardcoded date probe committed specs whose transform
                # could not accept the actual column type).  The probe
                # derives from the SOURCE column's type; temporal
                # result types are the spec's own (year/month/hour →
                # int, day → date).
                if transform in ("year", "month", "hour"):
                    if typ != "int":
                        raise ValueError(
                            f"{transform} transform needs result "
                            f"type 'int', not {typ!r}"
                        )
                elif transform == "day" and typ != "date":
                    raise ValueError(
                        "day transform needs result type 'date', "
                        f"not {typ!r}"
                    )
                probes = {
                    "date": _dt.date(1970, 1, 1),
                    "timestamp": _dt.datetime(1970, 1, 1),
                    "timestamptz": _dt.datetime(1970, 1, 1),
                    "int": 0, "long": 0, "string": "x",
                }
                if src_t not in probes:
                    raise NotImplementedError(
                        f"{transform} transform on a {src_t!r} column"
                    )
                transform_value(transform, probes[src_t])
            name = (
                spec[3]
                if len(spec) > 3
                else (
                    col
                    if transform == "identity"
                    else col + "_" + transform.split("[", 1)[0]
                )
            )
            if any(f["name"] == name for f in new_fields):
                raise ValueError(
                    f"duplicate partition field name {name!r}"
                )
            if name in by_name and not (
                transform == "identity" and name == col
            ):
                # a field named like an UNRELATED schema column would
                # make read() classify it as a mixed identity column of
                # the wrong source — scan_excl would drop the real data
                # column and the era coalesce would blend values from
                # a different column (ADVICE r11)
                raise ValueError(
                    f"partition field name {name!r} collides with a "
                    "schema column: only an identity partition on "
                    "that same column may share its name"
                )
            key = (name, transform, by_name[col], typ)
            prior = name_meaning.get(name)
            if prior is not None and prior != key[1:]:
                raise ValueError(
                    f"partition field name {name!r} already means "
                    f"{prior} in an earlier spec — one name, one "
                    "meaning across the spec history"
                )
            fid = known.get(key)
            if fid is None:
                fid = next_id
                next_id += 1
            new_fields.append(
                {
                    "name": name,
                    "transform": transform,
                    "source-id": by_name[col],
                    "field-id": fid,
                    "result-type": typ,
                }
            )
        cur_default = self._spec_fields(
            meta, meta.get("default-spec-id", 0)
        )
        if new_fields == cur_default:
            raise ValueError("new spec is identical to the default")
        specs = meta.get("partition-specs")
        if not specs:
            # v1 metadata carrying only the legacy "partition-spec"
            # field: refuse cleanly instead of KeyError (ADVICE r11) —
            # every other accessor in the module tolerates its absence
            raise NotImplementedError(
                "update_spec on metadata without a 'partition-specs' "
                "list (v1 legacy 'partition-spec' layout): migrate "
                "the metadata to v2 spec lists first"
            )
        new_sid = max(s["spec-id"] for s in specs) + 1
        meta["partition-specs"] = list(specs) + [
            {"spec-id": new_sid, "fields": new_fields}
        ]
        meta["default-spec-id"] = new_sid
        meta["last-partition-id"] = max(
            meta.get("last-partition-id", 999),
            max((f["field-id"] for f in new_fields), default=999),
        )
        meta["last-updated-ms"] = now_ms
        self._write_metadata(self.current_version() + 1, meta)
        return new_sid

    def promote_column(
        self, name: str, spark_type: str, now_ms: int = 0
    ) -> None:
        """Schema evolution, the type-promotion face (round 10;
        metadata-only like :meth:`add_column`): widen a column along
        the spec's promotion lattice (int → long, float → double),
        keeping its field id.  Reads pin the snapshot schema's (widest)
        type and Spark's parquet reader upcasts narrower physical
        columns natively — no file rewrite, no per-file plan.  Anything
        off the lattice refuses."""
        meta = json.loads(json.dumps(self.metadata()))
        cur = self._schema_by_id(meta["current-schema-id"])
        field = next(
            (f for f in cur["fields"] if f["name"] == name), None
        )
        if field is None:
            raise ValueError(f"no such column {name!r}")
        if spark_type not in _SPARK_TO_ICEBERG:
            raise NotImplementedError(
                f"no Iceberg mapping for Spark type {spark_type!r}"
            )
        new_t = _SPARK_TO_ICEBERG[spark_type]
        pair = (
            json.dumps(field["type"], sort_keys=True),
            json.dumps(new_t, sort_keys=True),
        )
        if pair not in _PROMOTIONS:
            raise NotImplementedError(
                f"promotion {field['type']!r} -> {new_t!r} is off the "
                "spec's lattice (int->long, float->double)"
            )
        new_sid = max(s.get("schema-id", 0) for s in meta["schemas"]) + 1
        new_schema = json.loads(json.dumps(cur))
        new_schema["schema-id"] = new_sid
        for f in new_schema["fields"]:
            if f["name"] == name:
                f["type"] = new_t
        meta["schemas"].append(new_schema)
        meta["current-schema-id"] = new_sid
        meta["last-updated-ms"] = now_ms
        self._write_metadata(self.current_version() + 1, meta)

    def drop_column(self, name: str, now_ms: int = 0) -> None:
        """Schema evolution, the drop face (metadata-only like
        :meth:`add_column`): the new schema omits the field; reads
        pinned to newer schemas prune the column from older files, and
        time travel to pre-drop snapshots still sees it (their
        schema-id).  The field id is retired, never reused —
        ``last-column-id`` only grows, so a later add cannot alias a
        dropped column's id (the invariant the rename/promotion check
        relies on)."""
        meta = json.loads(json.dumps(self.metadata()))
        cur = self._schema_by_id(meta["current-schema-id"])
        if not any(f["name"] == name for f in cur["fields"]):
            raise ValueError(f"no such column {name!r}")
        if len(cur["fields"]) == 1:
            raise ValueError("cannot drop the last column")
        by_id = {f["id"]: f["name"] for f in cur["fields"]}
        for spec in meta.get("partition-specs", []):
            for pf in spec["fields"]:
                if by_id.get(pf.get("source-id")) == name:
                    raise ValueError(
                        f"column {name!r} is a partition source "
                        f"(spec field {pf['name']!r}) — drop the "
                        "partition field first"
                    )
        new_sid = max(s.get("schema-id", 0) for s in meta["schemas"]) + 1
        new_schema = json.loads(json.dumps(cur))
        new_schema["schema-id"] = new_sid
        new_schema["fields"] = [
            f for f in new_schema["fields"] if f["name"] != name
        ]
        meta["schemas"].append(new_schema)
        meta["current-schema-id"] = new_sid
        meta["last-updated-ms"] = now_ms
        self._write_metadata(self.current_version() + 1, meta)

    def expire_metadata(self, keep_last: int = 5) -> list[int]:
        """Metadata-log retention (the spec's
        ``write.metadata.delete-after-commit.enabled`` /
        ``previous-versions-max`` behavior): delete
        ``v<N>.metadata.json`` files older than the newest
        ``keep_last``.  Snapshots/manifests/data are untouched — only
        the metadata-version history shrinks (old table-metadata
        time travel via explicit ``metadata(version=)`` stops working
        below the floor, exactly like the registry's vacuum)."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        versions = sorted(
            int(n[1:].split(".", 1)[0])
            for n in os.listdir(self.meta_dir)
            if n.startswith("v") and n.endswith(".metadata.json")
        )
        expired = versions[:-keep_last]
        for v in expired:
            os.remove(os.path.join(self.meta_dir, f"v{v}.metadata.json"))
        return expired

    def compact(
        self,
        spark,
        now_ms: int = 0,
        target_bytes: int = 128 << 20,
        min_group: int = 2,
    ) -> dict | None:
        """``rewrite_data_files``-style bin-packing compaction (round 9;
        the open-format twin of ``Registry.compact``, which delegates
        here for iceberg tables — closing the round-8 guard that refused
        to compact format tables outside their metadata).

        Per partition tuple, live data files under ``target_bytes`` are
        greedily binned; each bin of ≥ ``min_group`` files is REWRITTEN
        into one file **with every live row-level delete applied** (the
        rewrite reads through :meth:`read`'s MoR path restricted to the
        bin's manifest paths).  The commit is a ``replace`` snapshot:
        untouched files carry forward EXISTING with their original data
        sequence numbers, rewritten files go DELETED, new files enter
        ADDED at the new sequence, and delete manifests carry forward
        UNCHANGED — position deletes naming rewritten paths become
        dangling (harmless; expire+vacuum reclaims them), equality
        deletes still apply to strictly-older untouched files but not to
        the new files (their rows already reflect the deletes), which is
        exactly the sequence-number algebra production Iceberg's rewrite
        relies on.

        Crash contract: data for new files stages under ``data/`` with
        names no manifest references until the final O_EXCL metadata
        swap in :meth:`_commit_snapshot` — a crash anywhere before that
        leaves every existing snapshot intact and only unreferenced
        debris, which :meth:`vacuum` reclaims.  Returns a summary dict,
        or None when nothing qualified (a no-op makes NO commit)."""
        live = [f for f in self.files() if f.content == _CONTENT_DATA]
        # bins never mix specs: the rewritten file re-enters under the
        # SAME spec its sources were written under (the bin's partition
        # tuple only means what its spec says it means) — compaction
        # preserves metadata truth across spec evolution rather than
        # silently migrating values it cannot derive
        by_part: dict[tuple, list[DataFile]] = {}
        for f in live:
            by_part.setdefault(
                (f.spec_id, tuple(sorted(f.partition.items()))), []
            ).append(f)
        bins: list[tuple[int, dict, list[DataFile]]] = []
        for spec_id, part_key in sorted(by_part):
            smalls = sorted(
                (f for f in by_part[(spec_id, part_key)]
                 if f.file_size < target_bytes),
                key=lambda f: -f.file_size,
            )
            cur: list[DataFile] = []
            cur_bytes = 0
            for f in smalls:
                if cur and cur_bytes + f.file_size > target_bytes:
                    if len(cur) >= min_group:
                        bins.append((spec_id, dict(part_key), cur))
                    cur, cur_bytes = [], 0
                cur.append(f)
                cur_bytes += f.file_size
            if len(cur) >= min_group:
                bins.append((spec_id, dict(part_key), cur))
        if not bins:
            return None

        import glob as _glob
        import shutil as _shutil
        import tempfile as _tempfile

        seq = self.metadata()["last-sequence-number"] + 1
        rewritten: set[str] = set()
        new_files: list[DataFile] = []
        rows_in = bytes_in = 0
        cur_schema = self._schema_by_id(
            self.metadata()["current-schema-id"]
        )
        for i, (bin_spec, part, fs) in enumerate(bins):
            raws = {f.raw_path for f in fs}
            # the rewrite column list comes from the snapshot's PINNED
            # schema, not a sampled footer: a bin mixing pre- and
            # post-add_column files could sample an old footer and
            # silently drop the new column's values (permanent loss —
            # ADVICE r9 high), and after drop_column a footer column
            # read() no longer returns would crash the select.  Partition
            # columns still live in metadata only, so the attach columns
            # read() adds must not leak into the data file.  Columns
            # write under the schema's CURRENT names, deliberately
            # WITHOUT parquet field ids: Spark's inferred-schema read of
            # a mixed directory (one stamped footer + one plain) demands
            # ids of every file and hard-fails, and the rename read path
            # resolves by name variant, never by footer id.
            data_cols = [
                f["name"] for f in cur_schema["fields"]
                if f["name"] not in part
            ]
            out = self.read(spark, paths=raws).select(*data_cols)
            rel = f"data/compact-{seq}-{i}.parquet"
            dest = os.path.join(self.dir, rel)
            staging = _tempfile.mkdtemp(prefix="iceberg_compact_")
            try:
                out.coalesce(1).write.mode("overwrite").parquet(staging)
                (part_file,) = _glob.glob(
                    os.path.join(staging, "part-*.parquet")
                )
                os.replace(part_file, dest)
            finally:
                _shutil.rmtree(staging, ignore_errors=True)
            n = spark.read.parquet(dest).count()
            lb, ub = parquet_column_bounds(
                dest,
                self._schema_by_id(
                    self.metadata()["current-schema-id"]
                )["fields"],
            )
            new_files.append(
                DataFile(
                    path=rel,
                    partition=part,
                    record_count=n,
                    file_size=os.path.getsize(dest),
                    lower_bounds=lb,
                    upper_bounds=ub,
                    spec_id=bin_spec,
                )
            )
            rewritten |= raws
            rows_in += sum(f.record_count for f in fs)
            bytes_in += sum(f.file_size for f in fs)

        entries = []
        for e in self._live_entries():
            if e["data_file"]["file_path"] in rewritten:
                e = dict(e)
                e["status"] = _STATUS_DELETED
            entries.append(e)
        entries += [
            {
                "status": _STATUS_ADDED,
                "snapshot_id": None,
                "sequence_number": None,  # inherits the new sequence
                "file_sequence_number": None,
                "spec_id": f.spec_id,
                "data_file": {
                    "content": _CONTENT_DATA,
                    "file_path": f.path,
                    "file_format": "PARQUET",
                    "partition": f.partition,
                    "record_count": f.record_count,
                    "file_size_in_bytes": f.file_size,
                    "equality_ids": None,
                    "lower_bounds": [
                        {"key": k, "value": v}
                        for k, v in sorted(f.lower_bounds.items())
                    ] or None,
                    "upper_bounds": [
                        {"key": k, "value": v}
                        for k, v in sorted(f.upper_bounds.items())
                    ] or None,
                },
            }
            for f in new_files
        ]
        snap_id = self._commit_snapshot(
            entries,
            "replace",
            now_ms,
            delete_entries=self._live_delete_entries(),
        )
        return {
            "snapshot_id": snap_id,
            "groups": len(bins),
            "files_in": len(rewritten),
            "files_out": len(new_files),
            "rows_in": rows_in,
            "rows_out": sum(f.record_count for f in new_files),
            "bytes_in": bytes_in,
        }

    def remove_dangling_deletes(self, now_ms: int = 0) -> list[str]:
        """The cleanup half of Iceberg's ``rewrite_position_delete_files``
        maintenance (round 9; pairs with :meth:`compact`, after which
        position deletes naming rewritten paths can no longer match):
        drop live delete files that cannot affect any live data file —

        - a POSITION delete is dangling when no live data file with data
          sequence ≤ the delete's has its manifest path in the delete
          parquet's ``file_path`` column (read driver-side; delete files
          are metadata-scale by design);
        - an EQUALITY delete is dangling when no live data file is
          STRICTLY older than it.

        Commits a ``delete`` snapshot whose delete manifest marks the
        dropped files DELETED (their parquet stays on disk — older
        snapshots still reference it; :meth:`expire_snapshots` +
        :meth:`vacuum` reclaim it).  Returns the dropped manifest paths;
        nothing dangling → no commit, empty list."""
        import pyarrow.parquet as _pq

        data = [f for f in self.files() if f.content == _CONTENT_DATA]
        dropped: set[str] = set()
        for d in self.delete_files():
            if d.content == _CONTENT_POS_DELETES:
                refs = set(
                    _pq.read_table(d.path, columns=["file_path"])
                    .column("file_path")
                    .to_pylist()
                )
                applicable = any(
                    f.sequence <= d.sequence and f.raw_path in refs
                    for f in data
                )
            else:
                applicable = any(f.sequence < d.sequence for f in data)
            if not applicable:
                dropped.add(d.raw_path)
        if not dropped:
            return []
        del_entries = []
        for e in self._live_delete_entries():
            if e["data_file"]["file_path"] in dropped:
                e = dict(e)
                e["status"] = _STATUS_DELETED
            del_entries.append(e)
        self._commit_snapshot(
            self._live_entries(),
            "delete",
            now_ms,
            delete_entries=del_entries,
        )
        return sorted(dropped)

    # ---------------------------------------------- maintenance (round 8)
    def expire_snapshots(
        self,
        keep_last: int | None = None,
        older_than_ms: int | None = None,
        now_ms: int = 0,
    ) -> list[int]:
        """Drop expired snapshots from the metadata (the spec's snapshot
        expiration: shrink the ``snapshots`` list + ``snapshot-log``;
        the current snapshot always survives) and delete the manifest /
        manifest-list files only THEY referenced.  Returns the expired
        snapshot ids.  Data files are untouched — :meth:`vacuum`
        removes unreferenced ones, the same two-step split the
        registry's versioned publish uses (drop versions, then
        vacuum)."""
        meta = self.metadata()
        snaps = meta.get("snapshots", [])
        cur = meta.get("current-snapshot-id")
        keep: set[int] = {cur} if cur is not None else set()
        # refs protect their snapshots (spec: expiration must not break
        # a tag/branch; drop the ref first to release the snapshot)
        keep |= {
            r["snapshot-id"] for r in (meta.get("refs") or {}).values()
        }
        ordered = sorted(snaps, key=lambda s: -s["timestamp-ms"])
        if keep_last is not None:
            keep |= {s["snapshot-id"] for s in ordered[:keep_last]}
        if older_than_ms is not None:
            keep |= {
                s["snapshot-id"]
                for s in snaps
                if s["timestamp-ms"] >= older_than_ms
            }
        if keep_last is None and older_than_ms is None:
            raise ValueError("give keep_last and/or older_than_ms")
        expired = [
            s["snapshot-id"] for s in snaps if s["snapshot-id"] not in keep
        ]
        if not expired:
            return []
        survivors = [s for s in snaps if s["snapshot-id"] in keep]
        # metadata files referenced by surviving snapshots
        live_meta: set[str] = set()
        for snap in survivors:
            mlist = self._resolve(snap["manifest-list"])
            live_meta.add(mlist)
            _, manifests, _ = read_ocf(mlist)
            live_meta.update(
                self._resolve(mf["manifest_path"]) for mf in manifests
            )
        dead_meta: set[str] = set()
        for snap in snaps:
            if snap["snapshot-id"] in keep:
                continue
            mlist = self._resolve(snap["manifest-list"])
            dead_meta.add(mlist)
            _, manifests, _ = read_ocf(mlist)
            dead_meta.update(
                self._resolve(mf["manifest_path"]) for mf in manifests
            )
        meta = dict(meta)
        meta["snapshots"] = survivors
        meta["snapshot-log"] = [
            e
            for e in meta.get("snapshot-log", [])
            if e["snapshot-id"] in keep
        ]
        meta["last-updated-ms"] = now_ms
        self._write_metadata(self.current_version() + 1, meta)
        for path in sorted(dead_meta - live_meta):
            if os.path.exists(path):
                os.remove(path)
        return sorted(expired)

    def vacuum(self) -> list[str]:
        """Delete data/delete files under ``data/`` referenced by NO
        surviving snapshot (run after :meth:`expire_snapshots`; with
        all snapshots live it deletes nothing — every snapshot's reads
        keep working, the retention guarantee).  Returns the removed
        table-relative paths."""
        meta = self.metadata()
        live: set[str] = set()
        for snap in meta.get("snapshots", []):
            _, manifests, _ = read_ocf(self._resolve(snap["manifest-list"]))
            for mf in manifests:
                _, entries, _ = read_ocf(
                    self._resolve(mf["manifest_path"])
                )
                for e in entries:
                    # DELETED entries still protect the file: the
                    # PREVIOUS snapshot that lists it live shares the
                    # path string; only files no entry mentions at all
                    # are candidates (conservative, like production's
                    # reachability walk)
                    live.add(
                        os.path.abspath(
                            self._resolve(e["data_file"]["file_path"])
                        )
                    )
        removed = []
        data_dir = os.path.join(self.dir, "data")
        for root, _dirs, names in os.walk(data_dir):
            for n in names:
                full = os.path.abspath(os.path.join(root, n))
                if full not in live:
                    os.remove(full)
                    removed.append(os.path.relpath(full, self.dir))
        return sorted(removed)

    def _carry_entries(self, files: list[DataFile]) -> list[dict]:
        """Live files re-written as EXISTING entries with their original
        data sequence numbers EXPLICIT (the spec forbids inheritance for
        EXISTING status — losing the original sequence would break
        merge-on-read applicability).  The carried ``file_path`` is the
        original manifest string VERBATIM (raw_path): position-delete
        files reference data files by that exact string, so rewriting an
        absolute manifest path as table-relative across a commit would
        silently detach every older delete file (ADVICE r8)."""
        return [
            {
                "status": _STATUS_EXISTING,
                "snapshot_id": None,
                "sequence_number": f.sequence,
                "file_sequence_number": None,
                "spec_id": f.spec_id,
                "data_file": {
                    "content": f.content,
                    "file_path": f.raw_path
                    or os.path.relpath(f.path, self.dir),
                    "file_format": "PARQUET",
                    "partition": f.partition,
                    "record_count": f.record_count,
                    "file_size_in_bytes": f.file_size,
                    "equality_ids": list(f.equality_ids) or None,
                    "lower_bounds": [
                        {"key": k, "value": v}
                        for k, v in sorted(f.lower_bounds.items())
                    ] or None,
                    "upper_bounds": [
                        {"key": k, "value": v}
                        for k, v in sorted(f.upper_bounds.items())
                    ] or None,
                },
            }
            for f in files
        ]

    def _live_entries(self) -> list[dict]:
        meta = self.metadata()
        if meta.get("current-snapshot-id") is None:
            return []
        return self._carry_entries(self.files())

    def _live_delete_entries(self) -> list[dict]:
        meta = self.metadata()
        if meta.get("current-snapshot-id") is None:
            return []
        return self._carry_entries(self.delete_files())
