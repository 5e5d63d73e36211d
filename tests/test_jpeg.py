"""Baseline JPEG codec tests (hadoop_sync_spark/jpeg_codec.py).

Strategy mirrors the PNG suite: exact cases where the math is exact
(per-8×8-constant blocks are DC-only, and even grey offsets divide the
quality-50 DC quantizer), tolerance bounds on smooth content, exact
quant-domain equality between the two independent entropy implementations
(encoder bit-writer vs decoder bit-reader share no code), and honest-seam
/ malformed-stream rejection.
"""

from __future__ import annotations

import numpy as np
import pytest

from hadoop_sync_spark.jpeg_codec import (
    _AC_CHROM_BITS,
    _AC_CHROM_VALS,
    _AC_LUM_BITS,
    _AC_LUM_VALS,
    _canonical_codes,
    _decode_quantized,
    decode_jpeg,
    encode_jpeg,
)


def _tile_image(bh: int, bw: int, seed: int) -> np.ndarray:
    """Per-8×8-block constant grey values at even offsets from 128 —
    the exact-round-trip class (DC-only blocks; (v−128)·8 ≡ 0 mod 16)."""
    rng = np.random.default_rng(seed)
    vals = 128 + 2 * rng.integers(-26, 27, size=(bh, bw))
    return np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)


def test_dc_only_roundtrip_is_exact_444():
    img = _tile_image(3, 4, seed=1)
    rgb = np.stack([img] * 3, axis=2)
    out = decode_jpeg(encode_jpeg(rgb, quality=50))
    assert out.shape == rgb.shape
    assert np.array_equal(out, rgb)


def test_dc_only_roundtrip_is_exact_420_and_grey():
    img = _tile_image(4, 2, seed=2)
    rgb = np.stack([img] * 3, axis=2)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(rgb, quality=50, subsampling="4:2:0")), rgb
    )
    grey = decode_jpeg(encode_jpeg(img, quality=50))
    assert grey.ndim == 2 and np.array_equal(grey, img)


def test_restart_markers_present_and_decode_identically():
    img = np.stack([_tile_image(2, 5, seed=3)] * 3, axis=2)
    plain = encode_jpeg(img, quality=50)
    rst = encode_jpeg(img, quality=50, restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain
    assert any(bytes([0xFF, 0xD0 + i]) in rst for i in range(8))
    assert np.array_equal(decode_jpeg(rst), decode_jpeg(plain))
    # a decoder that fails to reset DC predictors at RSTn would corrupt
    # every block after the first restart — exactness above pins it, but
    # also check >8 restarts so the RSTn index wraps mod 8
    wide = np.stack([_tile_image(1, 24, seed=4)] * 3, axis=2)
    r1 = encode_jpeg(wide, quality=50, restart_interval=1)
    assert np.array_equal(decode_jpeg(r1), wide)


def test_fill_bytes_before_rst_and_eoi_decode_identically():
    """T.81 B.1.1.2 lets a conforming stream pad any marker with runs of
    0xFF fill bytes.  Inject fill before every RSTn and before EOI and
    require byte-identical decode to the unpadded stream — pins the
    _split_entropy fill-skip (ADVICE r8; _next_marker already skipped
    fill, the table-driven segment splitter did not)."""
    img = np.stack([_tile_image(2, 5, seed=3)] * 3, axis=2)
    rst = encode_jpeg(img, quality=50, restart_interval=2)
    padded = rst
    for i in range(8):
        padded = padded.replace(
            bytes([0xFF, 0xD0 + i]), bytes([0xFF, 0xFF, 0xFF, 0xD0 + i])
        )
    assert padded.endswith(b"\xff\xd9")
    padded = padded[:-2] + b"\xff\xff" + b"\xff\xd9"
    assert len(padded) > len(rst)
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(rst))


def test_smooth_content_near_transparent():
    h, w = 40, 56
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (x * 255 // (w - 1)).astype(np.uint8),
            (y * 255 // (h - 1)).astype(np.uint8),
            ((x * 2 + y) // 3 % 256).astype(np.uint8),
        ],
        axis=2,
    )
    err = np.abs(
        decode_jpeg(encode_jpeg(img, quality=90)).astype(int) - img.astype(int)
    )
    assert err.max() <= 8 and err.mean() < 2.0


def test_odd_dimensions_pad_and_crop():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(21, 35, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=75))
    assert out.shape == (21, 35, 3)
    out420 = decode_jpeg(encode_jpeg(img, quality=75, subsampling="4:2:0"))
    assert out420.shape == (21, 35, 3)


def test_quant_domain_entropy_exactness():
    """Encoder-side quantized coefficients survive Huffman encode →
    byte stuffing → Huffman decode EXACTLY: the lossy steps are DCT+quant
    only, and the two entropy codecs are independent implementations."""
    from hadoop_sync_spark.jpeg_codec import (
        ZIGZAG,
        _blockwise_dct_quant,
        _pad_edge,
        _rgb_to_ycbcr,
        scaled_quant_tables,
    )

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(24, 16, 3)).astype(np.uint8)
    qlum, qchrom = scaled_quant_tables(85)
    ycc = np.rint(_rgb_to_ycbcr(img))
    expected = [
        _blockwise_dct_quant(_pad_edge(ycc[..., i], 8, 8) - 128.0, q)
        for i, q in ((0, qlum), (1, qchrom), (2, qchrom))
    ]
    h, w, comps, coefs = _decode_quantized(encode_jpeg(img, quality=85))
    assert (h, w) == (24, 16)
    for exp, got, comp, q in zip(
        expected, coefs, comps, (qlum, qchrom, qchrom)
    ):
        assert np.array_equal(exp, got)
        assert np.array_equal(comp["q"], q)  # DQT round-trips the tables
    # and with restart markers interleaved the coefficients still match
    _, _, _, coefs_rst = _decode_quantized(
        encode_jpeg(img, quality=85, restart_interval=3)
    )
    for exp, got in zip(expected, coefs_rst):
        assert np.array_equal(exp, got)


def test_annex_k_table_shapes():
    assert sum(_AC_LUM_BITS) == len(_AC_LUM_VALS) == 162
    assert sum(_AC_CHROM_BITS) == len(_AC_CHROM_VALS) == 162
    # every (run, size) pair run 0..15 × size 1..10 plus EOB and ZRL
    for vals in (_AC_LUM_VALS, _AC_CHROM_VALS):
        assert sorted(vals) == sorted(
            [(r << 4) | s for r in range(16) for s in range(1, 11)]
            + [0x00, 0xF0]
        )
    # canonical codes are prefix-free
    codes = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    as_bits = {f"{c:0{ln}b}" for c, ln in codes.values()}
    assert len(as_bits) == 162
    for a in as_bits:
        assert not any(b != a and b.startswith(a) for b in as_bits)


def test_malformed_streams_rejected():
    img = np.stack([_tile_image(1, 2, seed=7)] * 3, axis=2)
    data = encode_jpeg(img, quality=50)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00" + data)
    # arithmetic coding (SOF9) is the honest seam now that SOF2 decodes
    arith = bytearray(data)
    arith[data.index(b"\xff\xc0") + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(arith))
    # a baseline stream mislabelled SOF2 is structurally invalid as
    # progressive (its single scan says Ss=0/Se=63 — a DC scan may not
    # carry an AC band) and must refuse, not decode garbage
    prog = bytearray(data)
    prog[data.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="DC progressive scan"):
        decode_jpeg(bytes(prog))
    # truncation inside the entropy segment
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(data[: len(data) - max(8, len(data) // 4)])


def test_quality_knob_monotone():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(32, 32, 3)).astype(np.uint8)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (25, 50, 75, 95)]
    assert sizes == sorted(sizes)
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg(img, quality=0)


def test_decode_real_dispatches_jpeg():
    from hadoop_sync_spark.multimodal import decode_real

    img = _tile_image(2, 2, seed=9)
    out = decode_real(encode_jpeg(np.stack([img] * 3, axis=2), quality=50))
    assert out.shape == (16, 16, 3)
    # greyscale replicates to (H, W, 3) like the PNG dispatch
    outg = decode_real(encode_jpeg(img, quality=50))
    assert outg.shape == (16, 16, 3)
    assert np.array_equal(outg[:, :, 0], img)


def test_decode_header_probes_jpeg_and_png():
    """The metadata-only probe resolves dimensions from headers alone —
    no Huffman/inflate work — for both compressed image formats."""
    from hadoop_sync_spark.multimodal import decode_header, encode_png

    img = _tile_image(2, 3, seed=10)
    jpg = encode_jpeg(np.stack([img] * 3, axis=2), quality=50)
    assert decode_header(jpg) == (1, 24, 16, 1)
    png = encode_png(img)
    assert decode_header(png) == (1, 24, 16, 1)
    with pytest.raises(ValueError, match="SOF"):
        decode_header(b"\xff\xd8\xff\xd9")


def test_bidirectional_interop_with_jdk_imageio(spark, tmp_path):
    """TRUE external differential for both image codecs: the Spark JVM
    ships javax.imageio with JPEG and PNG plugins, reachable over py4j.

    - our JPEG (exact tile class, restart markers on) must decode
      BIT-EXACTLY in the JDK — an external proof of marker framing,
      Annex-K tables, Huffman coding, stuffing and RST handling;
    - a JPEG the JDK writes must decode with ours close to the JDK's own
      decode of the same file (greyscale ≤2: integer-vs-float IDCT only;
      colour ≤12: the JDK's fancy chroma upsampling vs our replication —
      both implementation-defined by T.81);
    - PNG is lossless, so BOTH directions must be exact.
    """
    import os as _os

    jvm = spark._jvm

    def jvm_decode(path):
        img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
        assert img is not None, f"ImageIO could not parse {path}"
        w, h = img.getWidth(), img.getHeight()
        out = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                rgb = img.getRGB(x, y)
                out[y, x] = [(rgb >> 16) & 255, (rgb >> 8) & 255, rgb & 255]
        return out

    def jvm_encode(arr, fmt, path):
        h, w = arr.shape[:2]
        bi = jvm.java.awt.image.BufferedImage(
            w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
        )
        for y in range(h):
            for x in range(w):
                r, g, b = (int(v) for v in arr[y, x])
                bi.setRGB(x, y, (r << 16) | (g << 8) | b)
        assert jvm.javax.imageio.ImageIO.write(
            bi, fmt, jvm.java.io.File(path)
        )

    tiles = _tile_image(2, 3, seed=21)
    rgb = np.stack([tiles] * 3, axis=2)

    # our JPEG → JDK, bit-exact on the DC-only class
    p = str(tmp_path / "ours.jpg")
    open(p, "wb").write(encode_jpeg(rgb, quality=50, restart_interval=2))
    assert np.array_equal(jvm_decode(p), rgb)

    # JDK greyscale JPEG → ours vs JDK's own decode (IDCT variance only)
    grey3 = np.stack([_tile_image(2, 3, seed=22)] * 3, axis=2)
    pg = str(tmp_path / "jdk_grey.jpg")
    jvm_encode(grey3, "jpg", pg)
    ours = decode_jpeg(open(pg, "rb").read())
    theirs = jvm_decode(pg)
    assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 2

    # JDK colour JPEG → ours vs JDK (adds chroma-upsampling freedom)
    rng = np.random.default_rng(23)
    smooth = (rng.integers(0, 256, (16, 24, 3)) // 4 + 96).astype(np.uint8)
    pc = str(tmp_path / "jdk_colour.jpg")
    jvm_encode(smooth, "jpg", pc)
    ours = decode_jpeg(open(pc, "rb").read())
    theirs = jvm_decode(pc)
    assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 12

    # PNG: lossless, exact both ways
    from hadoop_sync_spark.multimodal import decode_png, encode_png

    pp = str(tmp_path / "ours.png")
    open(pp, "wb").write(
        encode_png(rgb, filters=[r % 5 for r in range(rgb.shape[0])])
    )
    assert np.array_equal(jvm_decode(pp), rgb)
    pj = str(tmp_path / "jdk.png")
    jvm_encode(smooth, "png", pj)
    assert np.array_equal(decode_png(open(pj, "rb").read()), smooth)
    _os.remove(pj)

    # BMP is uncompressed: our encoder's output decodes exactly in the
    # JDK too (covers the remaining image codec in the real set)
    from hadoop_sync_spark.multimodal import encode_bmp

    pb = str(tmp_path / "ours.bmp")
    open(pb, "wb").write(encode_bmp(smooth))
    assert np.array_equal(jvm_decode(pb), smooth)


def test_wav_interop_with_javax_sound(spark, tmp_path):
    """The audio codec gets the same external treatment: javax.sound
    parses our RIFF/WAVE header to the exact declared format, and a WAV
    the JDK re-writes from our stream decodes sample-for-sample with our
    decoder — every real codec in the repo is now differentially checked
    against an independent implementation in the container's JVM."""
    from hadoop_sync_spark.multimodal import decode_wav, encode_wav

    jvm = spark._jvm
    samples = (np.arange(1000) * 37 % 32768 - 16384).astype(np.int16)
    p = str(tmp_path / "a.wav")
    p2 = str(tmp_path / "b.wav")
    open(p, "wb").write(encode_wav(samples, rate=16000))
    ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
        jvm.java.io.File(p)
    )
    fmt = ais.getFormat()
    assert (
        fmt.getSampleRate(),
        fmt.getSampleSizeInBits(),
        fmt.getChannels(),
        fmt.isBigEndian(),
    ) == (16000.0, 16, 1, False)
    assert ais.getFrameLength() == 1000
    jvm.javax.sound.sampled.AudioSystem.write(
        ais,
        jvm.javax.sound.sampled.AudioFileFormat.Type.WAVE,
        jvm.java.io.File(p2),
    )
    rate, back = decode_wav(open(p2, "rb").read())
    assert rate == 16000 and np.array_equal(back, samples)


def test_multiscan_jpeg_refused_not_misdecoded():
    """Baseline permits per-component scans; this decoder implements
    only the interleaved form and must REFUSE a multi-scan stream
    (round-7 self-review: it used to return just the first scan's
    component as silently-wrong pixels).  Crafted by patching the SOS
    component count of a conforming stream down to 1."""
    img = np.stack([_tile_image(1, 2, seed=30)] * 3, axis=2)
    data = bytearray(encode_jpeg(img, quality=50))
    sos = data.index(b"\xff\xda")
    assert data[sos + 4] == 3  # ns
    data[sos + 4] = 1
    data[sos + 2 : sos + 4] = (6 + 2 * 1).to_bytes(2, "big")
    # drop the two extra (Cs, TdTa) pairs so the header stays coherent
    del data[sos + 7 : sos + 11]
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg(bytes(data))


def test_decode_header_truncated_sof_raises_valueerror():
    """Metadata-only probes filter mixed corpora by catching ValueError;
    a truncated SOF must not leak struct.error (round-7 self-review)."""
    from hadoop_sync_spark.multimodal import decode_header

    img = _tile_image(1, 1, seed=31)
    data = encode_jpeg(np.stack([img] * 3, axis=2), quality=50)
    sof = data.index(b"\xff\xc0")
    with pytest.raises(ValueError, match="truncated"):
        decode_header(data[: sof + 6])


def test_entropy_encoder_vec_byte_identical_to_serial():
    """Round-8 fast path: the vectorized token-pass encoder must emit a
    byte-identical stream to the serial reference walk on randomized
    images across sizes, quality, subsampling and restart settings —
    including all-constant (zero-AC) and size-dispatch-boundary cases."""
    import numpy as np

    import hadoop_sync_spark.jpeg_codec as J

    rng = np.random.RandomState(3)
    for trial in range(30):
        h, w = rng.randint(1, 70), rng.randint(1, 70)
        grey = rng.rand() < 0.3
        arr = (
            rng.rand(h, w) * 255 if grey else rng.rand(h, w, 3) * 255
        ).astype(np.uint8)
        if rng.rand() < 0.3:
            arr[:] = 128
        elif rng.rand() < 0.5:
            arr = (arr.astype(np.int64) // 16 * 16).astype(np.uint8)
        q = int(rng.choice([5, 30, 50, 85, 100]))
        sub = "4:2:0" if (not grey and rng.rand() < 0.5) else "4:4:4"
        ri = int(rng.choice([0, 1, 2, 4, 9]))
        orig = J._encode_entropy
        try:
            J._encode_entropy = J._encode_entropy_serial
            a = J.encode_jpeg(arr, quality=q, subsampling=sub,
                              restart_interval=ri)
        finally:
            J._encode_entropy = orig
        b = J.encode_jpeg(arr, quality=q, subsampling=sub,
                          restart_interval=ri)
        assert a == b, (trial, h, w, grey, q, sub, ri)


def test_decoder_tabled_matches_bit_serial():
    """Round-8 fast path: the combo-LUT monolithic scan decoder must
    recover coefficient grids identical to the one-call-per-bit
    reference reader on randomized conforming streams."""
    import numpy as np

    import hadoop_sync_spark.jpeg_codec as J

    rng = np.random.RandomState(11)
    for trial in range(30):
        h, w = rng.randint(1, 70), rng.randint(1, 70)
        grey = rng.rand() < 0.3
        arr = (
            rng.rand(h, w) * 255 if grey else rng.rand(h, w, 3) * 255
        ).astype(np.uint8)
        if rng.rand() < 0.5:
            arr = (arr.astype(np.int64) // 16 * 16).astype(np.uint8)
        q = int(rng.choice([5, 30, 50, 85, 100]))
        sub = "4:2:0" if (not grey and rng.rand() < 0.5) else "4:4:4"
        ri = int(rng.choice([0, 1, 2, 4, 9]))
        data = J.encode_jpeg(arr, quality=q, subsampling=sub,
                             restart_interval=ri)
        fast = J._decode_quantized(data)
        slow = J._decode_quantized(data, bit_serial=True)
        assert (fast[0], fast[1]) == (slow[0], slow[1])
        assert all(
            np.array_equal(x, y) for x, y in zip(fast[3], slow[3])
        ), (trial, h, w, grey, q, sub, ri)


def test_pack_entropy_matches_bitwriter():
    """_pack_entropy (vectorized) must byte-match _BitWriter (per-bit
    reference) including 1-fill padding and FF stuffing."""
    import numpy as np

    from hadoop_sync_spark.jpeg_codec import _BitWriter, _pack_entropy

    rng = np.random.RandomState(5)
    for _ in range(40):
        n = rng.randint(0, 400)
        lens = rng.randint(1, 17, size=n)
        vals = [int(rng.randint(0, 1 << l)) for l in lens]
        w = _BitWriter()
        for v, l in zip(vals, lens):
            w.write(v, int(l))
        w.pad()
        assert bytes(w.buf) == _pack_entropy(vals, lens.tolist())


def test_progressive_decode_jdk_differential(spark, tmp_path):
    """Progressive (SOF2) decode, differentially verified two ways against
    the JDK encoder writing the SAME pixels progressive and baseline:

    - **coefficient-exact**: one encoder, one quality → the quantized
      coefficients are identical whichever scan organization carries
      them, so ``_decode_quantized`` of the progressive file must equal
      that of the baseline file grid-for-grid.  This catches every
      Annex-G algebra bug (EOB-run accounting, refinement bit order,
      band bookkeeping) with zero tolerance.
    - **pixel-bounded**: our decode vs. the JDK's own decode of the
      progressive file, within the same bound the baseline control
      shows (IDCT/chroma-upsampling freedom only — T.81 leaves both
      implementation-defined).

    Covers: grey non-interleaved scans on an odd size (17×23 — partial
    MCUs, per-component A.2.2 grid ≠ MCU-padded grid) and 4:2:0 colour
    (interleaved DC scan + subsampled AC component grids)."""
    import os

    from hadoop_sync_spark.jpeg_codec import _decode_quantized

    jvm = spark._jvm
    IWP = jvm.javax.imageio.ImageWriteParam

    def jvm_encode(arr, path, progressive, grey):
        h, w = arr.shape[:2]
        BI = jvm.java.awt.image.BufferedImage
        bi = BI(w, h, BI.TYPE_BYTE_GRAY if grey else BI.TYPE_INT_RGB)
        for y in range(h):
            for x in range(w):
                if grey:
                    v = int(arr[y, x])
                    bi.setRGB(x, y, (v << 16) | (v << 8) | v)
                else:
                    r, g, b = (int(c) for c in arr[y, x])
                    bi.setRGB(x, y, (r << 16) | (g << 8) | b)
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
            "jpg"
        ).next()
        param = writer.getDefaultWriteParam()
        param.setCompressionMode(IWP.MODE_EXPLICIT)
        param.setCompressionQuality(0.7)
        param.setProgressiveMode(
            IWP.MODE_DEFAULT if progressive else IWP.MODE_DISABLED
        )
        fos = jvm.javax.imageio.stream.FileImageOutputStream(
            jvm.java.io.File(path)
        )
        writer.setOutput(fos)
        writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
        writer.dispose()
        fos.close()

    def jvm_decode(path, grey):
        img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(path))
        w, h = img.getWidth(), img.getHeight()
        if grey:  # raster samples — getRGB gamma-warps TYPE_BYTE_GRAY
            ras = img.getRaster()
            return np.array(
                [[ras.getSample(x, y, 0) for x in range(w)]
                 for y in range(h)],
                dtype=np.uint8,
            )
        out = np.zeros((h, w, 3), dtype=np.uint8)
        for y in range(h):
            for x in range(w):
                rgb = img.getRGB(x, y)
                out[y, x] = [(rgb >> 16) & 255, (rgb >> 8) & 255, rgb & 255]
        return out

    rng = np.random.default_rng(31)
    cases = [
        ((rng.integers(0, 256, (17, 23)) // 3 + 60).astype(np.uint8), True),
        ((rng.integers(0, 256, (16, 24, 3)) // 4 + 80).astype(np.uint8),
         False),
    ]
    for arr, grey in cases:
        pp = str(tmp_path / f"p{grey}.jpg")
        pb = str(tmp_path / f"b{grey}.jpg")
        jvm_encode(arr, pp, True, grey)
        jvm_encode(arr, pb, False, grey)
        prog_bytes = open(pp, "rb").read()
        assert b"\xff\xc2" in prog_bytes  # really SOF2
        _, _, _, gp = _decode_quantized(prog_bytes)
        _, _, _, gb = _decode_quantized(open(pb, "rb").read())
        assert all(np.array_equal(a, b) for a, b in zip(gp, gb))
        ours = decode_jpeg(prog_bytes)
        theirs = jvm_decode(pp, grey)
        dmax = np.abs(ours.astype(int) - theirs.astype(int)).max()
        base_ctl = np.abs(
            decode_jpeg(open(pb, "rb").read()).astype(int)
            - jvm_decode(pb, grey).astype(int)
        ).max()
        assert dmax <= max(2, base_ctl + 2), (grey, dmax, base_ctl)
