"""ISO-BMFF / MP4 container codec tests (hadoop_sync_spark/mp4_codec.py).

Strategy: the parser's sample-table math (stsc run expansion, intra-chunk
offset accumulation, stts DTS decode) is checked against a HAND-BUILT box
stream with hand-computed golden offsets — independent of the writer — and
the writer/parser pair is then checked by byte-identity (each parsed video
sample must equal the exact JPEG stream that was muxed in; the container
layer is lossless around its payloads, so no codec tolerance is needed).
PCM audio round-trips sample-exactly.  Structural-corruption and
honest-seam (non-MJPEG bitstream) rejections are pinned.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hadoop_sync_spark.jpeg_codec import encode_jpeg
from hadoop_sync_spark.mp4_codec import (
    _box,
    _esds,
    _full,
    _ipcm_sample_entry,
    _parse_esds_oti,
    _resolve_samples,
    _visual_sample_entry,
    audio_samples,
    decode_mp4,
    encode_mp4,
    parse_boxes,
    video_frames,
)


def _frames(n: int, h: int = 24, w: int = 32) -> list[np.ndarray]:
    """Per-8×8-block-constant RGB frames (the JPEG codec's exact class,
    keyed by frame number so frames differ)."""
    out = []
    for i in range(n):
        rng = np.random.default_rng(100 + i)
        vals = 128 + 2 * rng.integers(-20, 21, size=(h // 8, w // 8))
        g = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
        out.append(np.stack([g] * 3, axis=2))
    return out


def _sawtooth(n: int, k: int = 37) -> np.ndarray:
    return ((np.arange(n, dtype=np.int64) * k) % 32768 - 16384).astype(np.int16)


# ------------------------------------------------------- hand-built golden
def test_sample_table_resolution_hand_golden():
    """stsc runs [(1,3),(3,2)] over 4 chunks with per-sample sizes —
    offsets computed by hand, no writer involved.

    chunks 1,2 carry 3 samples, chunks 3,4 carry 2 → 10 samples.
    sizes 10..19; chunk offsets 1000, 2000, 3000, 4000.
    """
    sizes = list(range(10, 20))
    samples = _resolve_samples(
        stts_runs=[(4, 100), (6, 50)],
        sizes=sizes,
        uniform_size=0,
        sample_count=10,
        stsc_runs=[(1, 3, 1), (3, 2, 1)],
        chunk_offsets=[1000, 2000, 3000, 4000],
    )
    offsets = [s.offset for s in samples]
    #  chunk1: 10,11,12 → 1000, 1010, 1021
    #  chunk2: 13,14,15 → 2000, 2013, 2027
    #  chunk3: 16,17    → 3000, 3016
    #  chunk4: 18,19    → 4000, 4018
    assert offsets == [1000, 1010, 1021, 2000, 2013, 2027, 3000, 3016, 4000, 4018]
    assert [s.size for s in samples] == sizes
    dts = [s.dts for s in samples]
    assert dts == [0, 100, 200, 300, 400, 450, 500, 550, 600, 650]
    assert [s.duration for s in samples] == [100] * 4 + [50] * 6


def test_sample_table_mismatch_raises():
    with pytest.raises(ValueError, match="stsc"):
        _resolve_samples([(2, 1)], [1, 2], 0, 2, [(1, 1, 1)], [0, 10, 20])
    with pytest.raises(ValueError, match="stts"):
        _resolve_samples([(1, 1)], [1, 2], 0, 2, [(1, 2, 1)], [0])


def test_box_walker_hand_built():
    """Hand-assembled byte stream: plain box, largesize box, nested box."""
    inner = struct.pack(">I4s", 12, b"ilst") + b"abcd"
    large_payload = b"x" * 5
    stream = (
        struct.pack(">I4s", 12, b"aaaa")
        + b"1234"
        + struct.pack(">I4sQ", 1, b"bbbb", 16 + len(large_payload))
        + large_payload
        + struct.pack(">I4s", 8 + len(inner), b"cccc")
        + inner
    )
    got = [(t, s, e) for t, s, e in parse_boxes(stream)]
    assert got[0] == (b"aaaa", 8, 12)
    assert got[1] == (b"bbbb", 12 + 16, 12 + 16 + 5)
    assert got[2][0] == b"cccc"
    # descend into cccc
    (child,) = list(parse_boxes(stream, got[2][1], got[2][2]))
    assert child[0] == b"ilst"
    assert stream[child[1] : child[2]] == b"abcd"


def test_box_overrun_and_truncation_raise():
    with pytest.raises(ValueError, match="overruns"):
        list(parse_boxes(struct.pack(">I4s", 100, b"aaaa") + b"xx"))
    with pytest.raises(ValueError, match="truncated"):
        list(parse_boxes(b"\x00\x00\x00"))


def test_esds_descriptor_roundtrip():
    """The 14496-1 expandable-length descriptor walk recovers the OTI the
    writer encoded, for both registered object types."""
    for oti in (0x6C, 0x6B, 0x40):
        blob = _esds(oti)
        # blob is a full box: strip the 8-byte box header
        assert _parse_esds_oti(blob, 8, len(blob)) == oti


# ------------------------------------------------------- writer ↔ parser
def test_video_sample_byte_identity_and_tables():
    frames = _frames(7)
    jpegs = [encode_jpeg(f, quality=75) for f in frames]
    data = encode_mp4(frames, fps=25, quality=75)
    f = decode_mp4(data)
    assert f.major_brand == "isom"
    v = f.video
    assert (v.codec, v.width, v.height) == ("jpeg", 32, 24)
    assert v.timescale == 90000 and len(v.samples) == 7
    # container is lossless around its payloads: byte identity per sample
    for s, jb in zip(v.samples, jpegs):
        assert data[s.offset : s.offset + s.size] == jb
    assert [s.dts for s in v.samples] == [3600 * i for i in range(7)]
    # default chunking 4+3 → stsc two runs, verified via resolved offsets
    assert v.samples[4].offset == v.samples[3].offset + v.samples[3].size


def test_ragged_chunking_layouts_agree():
    """Different stsc layouts of the same samples must resolve to sample
    streams with identical bytes."""
    frames = _frames(6)
    flat = encode_mp4(frames, video_chunking=[6])
    ragged = encode_mp4(frames, video_chunking=[1, 3, 1, 1])
    per = encode_mp4(frames, video_chunking=[1] * 6)
    ref = None
    for blob in (flat, ragged, per):
        v = decode_mp4(blob).video
        payloads = [blob[s.offset : s.offset + s.size] for s in v.samples]
        if ref is None:
            ref = payloads
        else:
            assert payloads == ref


def test_co64_path():
    frames = _frames(3)
    data = encode_mp4(frames, force_co64=True)
    v = decode_mp4(data).video
    assert len(v.samples) == 3
    jpegs = [encode_jpeg(f, quality=75) for f in frames]
    for s, jb in zip(v.samples, jpegs):
        assert data[s.offset : s.offset + s.size] == jb


def test_video_frames_decode_and_sampling():
    frames = _frames(8, h=16, w=16)
    data = encode_mp4(frames, quality=50)
    out = video_frames(data, every_k=3)
    assert [no for no, _ in out] == [0, 3, 6]
    # per-8×8-constant blocks at quality 50 are the codec's exact class
    for no, arr in out:
        assert np.array_equal(arr, frames[no])


def test_audio_roundtrip_mono_and_stereo():
    mono = _sawtooth(4000)
    data = encode_mp4(audio=(16000, mono))
    rate, got = audio_samples(data)
    assert rate == 16000 and np.array_equal(got, mono)

    stereo = np.stack([_sawtooth(1000, 37), _sawtooth(1000, 53)], axis=1)
    data2 = encode_mp4(audio=(8000, stereo))
    f2 = decode_mp4(data2)
    assert f2.audio.channels == 2
    rate2, got2 = audio_samples(data2, mp4=f2)
    assert rate2 == 8000 and got2.shape == (1000, 2)
    assert np.array_equal(got2, stereo)


def test_av_mux_coexists():
    frames = _frames(5)
    audio = _sawtooth(2000)
    data = encode_mp4(frames, fps=10, audio=(16000, audio))
    f = decode_mp4(data)
    assert f.video is not None and f.audio is not None
    assert {t.track_id for t in f.tracks} == {1, 2}
    # movie duration = max(track durations in movie timescale): 5 frames
    # at 10 fps = 500 ms vs 2000 samples at 16 kHz = 125 ms
    assert f.movie_duration == 500
    _r, got = audio_samples(data, mp4=f)
    assert np.array_equal(got, audio)
    for no, arr in video_frames(data, mp4=f):
        assert arr.shape == (24, 32, 3)


# ------------------------------------------------------- honest seams
def test_non_mjpeg_video_refuses_with_container_parsed():
    """An H.264-style track (avc1 sample entry) must parse at the
    container level and refuse only at the bitstream."""
    frames = _frames(2)
    data = bytearray(encode_mp4(frames))
    idx = data.find(b"mp4v")
    assert idx > 0
    data[idx : idx + 4] = b"avc1"
    f = decode_mp4(bytes(data))
    v = f.video
    # container still parsed: codec fourcc visible, sample table intact
    assert v.codec == "avc1" and len(v.samples) == 2
    with pytest.raises(NotImplementedError, match="avc1"):
        video_frames(bytes(data), mp4=f)


def test_mp3_oti_identified_and_refused():
    data = bytearray(encode_mp4(audio=(8000, _sawtooth(100))))
    idx = data.find(b"ipcm")
    # swap the sample entry to mp4a + esds(OTI 0x6B); simplest honest
    # variant: relabel ipcm → mp4a, drop pcmC discovery
    data[idx : idx + 4] = b"mp4a"
    f = decode_mp4(bytes(data))
    assert f.audio.codec == "mp4a"
    with pytest.raises(NotImplementedError, match="mp4a"):
        audio_samples(bytes(data), mp4=f)


def test_not_bmff_raises():
    with pytest.raises(ValueError, match="ftyp"):
        decode_mp4(b"\x00" * 64)


# ------------------------------------------------- multimodal integration
def test_decode_header_and_decode_real_mp4():
    from hadoop_sync_spark.multimodal import decode_header, decode_real

    frames = _frames(6, h=16, w=48)
    data = encode_mp4(frames, quality=50)
    assert decode_header(data) == (3, 48, 16, 6)
    arrs = decode_real(data)
    assert len(arrs) == 6
    assert all(np.array_equal(a, f) for a, f in zip(arrs, frames))

    audio = _sawtooth(3000)
    adata = encode_mp4(audio=(16000, audio))
    kind, n, _h, _fr = decode_header(adata)
    assert (kind, n) == (2, 3000)
    rate, got = decode_real(adata)
    assert rate == 16000 and np.array_equal(got, audio)


def test_sample_frames_operator_handles_mp4(spark):
    """The mapInPandas frame-sampling operator must emit identical rows
    for the same frame content in either container (RVID spans vs MP4
    sample table), with the real per-container encoded byte lengths."""
    import pandas as pd

    from hadoop_sync_spark.multimodal import ASSET_SCHEMA, sample_frames

    frames = _frames(9, h=16, w=16)
    data = encode_mp4(frames, quality=50)
    jpeg_sizes = [len(encode_jpeg(f, quality=50)) for f in frames]
    pdf = pd.DataFrame(
        {
            "asset_id": [1],
            "media_type": ["video"],
            "content": [bytearray(data)],
            "width": [16],
            "height": [16],
            "n_frames": [9],
            "sample_rate": [None],
            "duration_s": [None],
        }
    )
    df = spark.createDataFrame(pdf, schema=ASSET_SCHEMA)
    rows = sample_frames(df, every_k=4).orderBy("frame_no").collect()
    assert [(r.frame_no, r.frame_bytes) for r in rows] == [
        (0, jpeg_sizes[0]),
        (4, jpeg_sizes[4]),
        (8, jpeg_sizes[8]),
    ]
