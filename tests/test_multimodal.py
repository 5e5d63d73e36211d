"""Multimodal plumbing tests: binary transport, Arrow batching, metadata
pruning, frame explosion, and the explicitly-stubbed codec seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_sync_spark.multimodal import (
    decode_real,
    extract_features,
    resize_images,
    sample_frames,
    synthetic_assets,
)


def test_features_deterministic_and_complete(spark):
    assets = synthetic_assets(spark, 30)
    feats = extract_features(assets)
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert len(rows) == 30
    # deterministic: re-running yields identical features
    rows2 = {r["asset_id"]: r for r in extract_features(assets).collect()}
    assert rows == rows2
    # decoded dims match the typed metadata for images
    for r in assets.filter(F.col("media_type") == "image").collect():
        assert rows[r["asset_id"]]["decoded_width"] == r["width"]
        assert rows[r["asset_id"]]["decoded_height"] == r["height"]
    assert all(0 <= r["byte_entropy"] <= 8 for r in rows.values())


def test_resize_only_touches_images(spark):
    assets = synthetic_assets(spark, 30)
    resized = resize_images(assets, 8, 8)
    n_images = assets.filter(F.col("media_type") == "image").count()
    got = resized.collect()
    assert len(got) == n_images
    assert all(r["width"] == 8 and r["height"] == 8 for r in got)
    # payload was actually re-encoded at the new dims
    from hadoop_sync_spark.multimodal import decode_header

    for r in got:
        assert decode_header(r["content"])[1:3] == (8, 8)


def test_frame_sampling_explodes_rows(spark):
    assets = synthetic_assets(spark, 30)
    frames = sample_frames(assets, every_k=4)
    videos = assets.filter(F.col("media_type") == "video").collect()
    expected = sum(-(-v["n_frames"] // 4) for v in videos)  # ceil
    assert frames.count() == expected
    one = videos[0]
    got = sorted(
        r["frame_no"]
        for r in frames.filter(F.col("asset_id") == one["asset_id"]).collect()
    )
    assert got == list(range(0, one["n_frames"], 4))


def test_metadata_query_prunes_payload(spark):
    """Filtering/projecting metadata must not read the binary column —
    check the optimized plan's ReadSchema-equivalent (project list)."""
    assets = synthetic_assets(spark, 30)
    q = assets.filter(F.col("width") > 20).select("asset_id", "width")
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    assert "content" not in plan.split("Filter")[0]  # projection excludes blob


def test_codec_seam_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_real(b"anything")


def test_bmp_roundtrip_is_bit_exact():
    import numpy as np

    from hadoop_sync_spark.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(42)
    for w, h in [(1, 1), (3, 5), (16, 16), (17, 9)]:  # odd widths hit padding
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_wav_roundtrip_is_bit_exact():
    import numpy as np

    from hadoop_sync_spark.multimodal import decode_wav, encode_wav

    samples = (np.sin(np.arange(4000) / 7.0) * 20000).astype("<i2")
    rate, back = decode_wav(encode_wav(samples, 16000))
    assert rate == 16000
    assert np.array_equal(back, samples)


def test_rvid_frames_decode_as_real_bmps():
    import numpy as np

    from hadoop_sync_spark.multimodal import (
        decode_bmp,
        decode_rvid,
        encode_rvid,
    )

    rng = np.random.default_rng(7)
    frames = [
        rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
        for _ in range(5)
    ]
    blob = encode_rvid(frames)
    spans = decode_rvid(blob)
    assert len(spans) == 5
    for (off, ln), orig in zip(spans, frames):
        assert np.array_equal(decode_bmp(blob[off : off + ln]), orig)


def test_resize_is_real_nearest_neighbor(spark):
    """Downsampling a 2x-upscaled checkerboard by 2 must recover it
    exactly under nearest-neighbor — the math, not just the plumbing."""
    import numpy as np

    from hadoop_sync_spark.multimodal import (
        ASSET_SCHEMA,
        decode_bmp,
        encode_bmp,
        resize_images,
    )

    base = np.zeros((4, 4, 3), dtype=np.uint8)
    base[::2, 1::2] = 255
    base[1::2, ::2] = 255
    up = base.repeat(2, axis=0).repeat(2, axis=1)  # 8x8
    assets = spark.createDataFrame(
        [(0, "image", encode_bmp(up), 8, 8, None, None, None)], ASSET_SCHEMA
    )
    (row,) = resize_images(assets, 4, 4).collect()
    assert np.array_equal(decode_bmp(bytes(row["content"])), base)


def test_decode_real_returns_numpy_media(spark):
    import numpy as np

    from hadoop_sync_spark.multimodal import decode_real, synthetic_assets

    rows = synthetic_assets(spark, 9).collect()
    for r in rows:
        decoded = decode_real(bytes(r["content"]))
        if r["media_type"] == "image":
            assert decoded.shape == (r["height"], r["width"], 3)
        elif r["media_type"] == "audio":
            rate, samples = decoded
            assert rate == r["sample_rate"]
            assert samples.dtype == np.dtype("<i2") and len(samples) > 0
        else:
            assert len(decoded) == r["n_frames"]
            assert decoded[0].shape == (r["height"], r["width"], 3)


# --------------------------------------------------------------------------
# PNG codec (round 7): round trip per filter type, RGB, CRC, dispatch
# --------------------------------------------------------------------------
def test_png_roundtrip_all_filters_and_shapes():
    import numpy as np

    from hadoop_sync_spark.multimodal import decode_png, encode_png

    rng = np.random.RandomState(11)
    for shape in [(5, 9), (6, 4, 3), (1, 1), (3, 17, 3), (8, 1)]:
        arr = rng.randint(0, 256, size=shape).astype(np.uint8)
        h = shape[0]
        for filters in (None, *([[f] * h] for f in range(5)),
                        [[(i * 3 + 1) % 5 for i in range(h)]]):
            fl = filters if filters is None else filters[0]
            data = encode_png(arr, filters=fl)
            back = decode_png(data)
            assert back.shape == arr.shape
            assert (back == arr).all(), (shape, fl)


def test_png_crc_and_truncation_rejected():
    import numpy as np
    import pytest

    from hadoop_sync_spark.multimodal import decode_png, encode_png

    arr = np.arange(48, dtype=np.uint8).reshape(6, 8)
    data = bytearray(encode_png(arr))
    data[20] ^= 0xFF  # flip a byte inside IHDR payload
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))
    good = encode_png(arr)
    with pytest.raises(Exception):
        decode_png(good[:-24])  # IEND + part of final IDAT gone


def test_png_unsupported_features_raise_honestly():
    import struct
    import zlib

    import pytest

    from hadoop_sync_spark.multimodal import _PNG_SIG, _png_chunk, decode_png

    # 16-bit depth header: must refuse, not silently mis-read
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    data = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(
        b"IDAT", zlib.compress(b"\x00" * 36)
    ) + _png_chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_png(data)


def test_decode_real_dispatches_png_to_rgb():
    import numpy as np

    from hadoop_sync_spark.multimodal import decode_real, encode_png

    g = np.arange(24, dtype=np.uint8).reshape(4, 6)
    out = decode_real(encode_png(g, filters=[4, 3, 2, 1]))
    assert out.shape == (4, 6, 3)
    assert (out[:, :, 0] == g).all() and (out[:, :, 2] == g).all()
    rgb = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    assert (decode_real(encode_png(rgb)) == rgb).all()


def test_decode_header_jpeg_fill_bytes_and_standalone_markers():
    """ADVICE r7: T.81 B.1.1.2 allows any number of 0xFF fill bytes
    before a marker, and RSTn/TEM markers carry no length field — a
    conforming foreign encoder's stream must still probe; a marker
    segment claiming length < 2 is a hard error."""
    import struct

    from hadoop_sync_spark.multimodal import decode_header

    def seg(marker, payload=b""):
        return (
            bytes([0xFF, marker])
            + struct.pack(">H", len(payload) + 2)
            + payload
        )

    sof = seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", 33, 47) + bytes([1, 0x11, 0x11, 0]),
    )
    stream = (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00")
        + b"\xff\xff\xff"  # fill bytes
        + b"\xff\x01"  # TEM, standalone
        + sof
        + b"\xff\xd9"
    )
    assert decode_header(stream) == (1, 47, 33, 1)
    with pytest.raises(ValueError, match="length < 2"):
        decode_header(b"\xff\xd8" + bytes([0xFF, 0xE0, 0x00, 0x01]))
