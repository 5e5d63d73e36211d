"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Driver L3 mandate: treat media as `binary` columns with structured metadata
and run decode / feature-extract / resize / frame-sample as Arrow-batched
pandas UDFs over ``mapInPandas``.  Real codec libraries (PIL/ffmpeg/librosa)
are NOT in this container, so the codec boundary is explicitly stubbed:

- assets carry a tiny self-describing deterministic format (`FAKE` header +
  dims + payload) so every piece of *Spark* plumbing — schema, binary
  transport through Arrow, batch iteration, explode of sampled frames,
  partition-preserving metadata derivation — is real and tested;
- ``decode_real()`` is the marked seam: it raises ``NotImplementedError``
  unless a real codec import succeeds, at which point only that function
  changes.

Scale notes: binary payloads ride Spark's columnar binary type (Arrow
`binary`), so ``mapInPandas`` streams them in bounded batches
(`spark.sql.execution.arrow.maxRecordsPerBatch`) — executors never hold a
partition of raw media in Python at once.  Metadata-only queries (filter by
width, duration) never touch the payload column thanks to column pruning.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal table schema.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),  # typed metadata (image/video)
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),  # video
        StructField("sample_rate", IntegerType()),  # audio
        StructField("duration_s", DoubleType()),
    ]
)

_MAGIC = b"FAKE"


def _encode_fake(kind: str, asset_id: int, w: int, h: int, frames: int) -> bytes:
    """Deterministic synthetic payload: header + pseudo-pixel bytes."""
    header = _MAGIC + struct.pack(">BIIH", {"image": 1, "audio": 2, "video": 3}[kind], w, h, frames)
    n = w * h * max(frames, 1)
    # cheap deterministic byte stream keyed by asset_id
    body = bytes(((asset_id * 2654435761 + i * 40503) >> 7) & 0xFF for i in range(min(n, 4096)))
    return header + body


def synthetic_assets(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fixture generator (no media fixture tables exist):
    n assets cycling image/audio/video with varied dims."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        w, h = 16 + (i % 5) * 8, 16 + (i % 3) * 8
        frames = 1 if kind == "image" else (8 + i % 4)
        rows.append(
            (
                i,
                kind,
                _encode_fake(kind, i, w, h, frames),
                w if kind != "audio" else None,
                h if kind != "audio" else None,
                frames if kind == "video" else None,
                16000 if kind == "audio" else None,
                float(frames) / 8.0,
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def assets_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture-grounded asset table: one synthetic media asset per document
    (payload deterministically keyed by doc_id, kind cycling
    image/audio/video, dims derived from n_chars).  Built distributedly via
    ``mapInPandas`` so asset generation scales with the corpus instead of
    materializing on the driver."""
    from collections.abc import Iterator as _It

    from hadoop_sync_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")

    def fn(batches: _It) -> _It:
        import pandas as pd

        for pdf in batches:
            out = []
            for did, nch in zip(pdf["doc_id"], pdf["n_chars"]):
                i = int(did)
                kind = ("image", "audio", "video")[i % 3]
                w, h = 16 + (int(nch) % 5) * 8, 16 + (i % 3) * 8
                frames = 1 if kind == "image" else (8 + i % 4)
                out.append(
                    (
                        i,
                        kind,
                        _encode_fake(kind, i, w, h, frames),
                        w if kind != "audio" else None,
                        h if kind != "audio" else None,
                        frames if kind == "video" else None,
                        16000 if kind == "audio" else None,
                        float(frames) / 8.0,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in ASSET_SCHEMA.fields]
            )

    return docs.mapInPandas(fn, ASSET_SCHEMA)


def decode_real(content: bytes) -> object:
    """THE codec seam.  Swap in PIL/av/librosa here when available.

    STUB: real image/audio decoding is intentionally unimplemented in this
    container (no codec libs); everything downstream consumes
    :func:`decode_header` instead."""
    try:
        import PIL.Image  # noqa: F401  (absent in this container)
    except ImportError as e:
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in "
            "this environment; the deterministic FAKE-format path below "
            "exercises the full Spark plumbing"
        ) from e
    raise NotImplementedError("real codec path not wired yet")


def decode_header(content: bytes) -> tuple[int, int, int, int]:
    """Parse the deterministic FAKE header → (kind, width, height, frames)."""
    if content is None or content[:4] != _MAGIC:
        raise ValueError("not a FAKE-format payload")
    kind, w, h, frames = struct.unpack(">BIIH", content[4:15])
    return kind, w, h, frames


FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("decoded_width", IntegerType()),
        StructField("decoded_height", IntegerType()),
        StructField("payload_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("byte_entropy", DoubleType()),
    ]
)


def extract_features(assets: DataFrame) -> DataFrame:
    """Decode + featurize via ``mapInPandas`` (Arrow-batched).

    The per-batch body is vectorized numpy over the payload bytes; this is
    the shape a real embedding/feature extractor takes (decode → ndarray →
    model), minus the stubbed codec."""

    def fn(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for aid, mt, content in zip(
                pdf["asset_id"], pdf["media_type"], pdf["content"]
            ):
                _kind, w, h, _frames = decode_header(content)
                body = np.frombuffer(content[15:], dtype=np.uint8)
                counts = np.bincount(body, minlength=256)
                p = counts[counts > 0] / len(body)
                out.append(
                    (
                        aid,
                        mt,
                        w,
                        h,
                        len(content),
                        float(body.mean()),
                        float(-(p * np.log2(p)).sum()),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return assets.mapInPandas(fn, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def resize_images(assets: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """'Resize' images (payload re-encoded at target dims — stub math,
    real batch plumbing): filter to images JVM-side first so the Python
    stage sees only relevant rows (predicate stays ahead of the UDF)."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                _k, _w, _h, _f = decode_header(content)
                out.append(
                    (aid, target_w, target_h, _encode_fake("image", int(aid), target_w, target_h, 1))
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return assets.filter(F.col("media_type") == "image").mapInPandas(
        fn, RESIZE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_bytes", LongType()),
    ]
)


def sample_frames(assets: DataFrame, every_k: int = 4) -> DataFrame:
    """Frame sampling for video: one output row per kept frame (row
    explosion inside mapInPandas — the decode-then-explode pattern)."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                _k, w, h, frames = decode_header(content)
                for fno in range(0, frames, every_k):
                    out.append((aid, fno, w * h))
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return assets.filter(F.col("media_type") == "video").mapInPandas(
        fn, FRAME_SCHEMA
    )
