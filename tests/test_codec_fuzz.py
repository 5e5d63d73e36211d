"""Seeded property sweeps for the from-scratch codecs (house style: the
repo's deterministic 'hypothesis-style' randomness, not the hypothesis
package — driver re-runs must be byte-stable).

Two invariants that must hold for EVERY input, not just the fixture
shapes:

- **Avro**: for any schema composed from the full type algebra (bounded
  depth) and any value conforming to it, ``read_ocf(write_ocf(x)) == x``
  under both block codecs.  The schema generator exercises shapes no
  Iceberg manifest uses (enums inside arrays of unions, maps of records,
  fixed inside nested records) so a structural encode/decode bug cannot
  hide behind the manifest schemas.
- **JPEG**: for any image, shape, quality, subsampling and restart
  interval, the encoder's quantized coefficients survive the entropy
  layer EXACTLY (``_decode_quantized(encode_jpeg(x)) ==`` the encoder's
  own DCT+quant output).  This is the lossless half of the pipeline —
  any Huffman/stuffing/restart/marker bug breaks it — checked across the
  whole parameter grid rather than the single fixture operating point.
"""

from __future__ import annotations

import numpy as np
import pytest

from hadoop_sync_spark.avro_codec import read_ocf, write_ocf

# ----------------------------------------------------------- avro generator
_PRIMS = ["null", "boolean", "int", "long", "float", "double", "bytes", "string"]


def _gen_schema(rng: np.random.Generator, depth: int, counter: list[int]):
    roll = int(rng.integers(0, 10 if depth > 0 else 6))
    if roll < 4:  # primitive (skip float: == comparison after f32 narrows)
        p = _PRIMS[int(rng.integers(0, len(_PRIMS)))]
        return "double" if p == "float" else p
    if roll == 4:  # union null | X (X primitive, non-null)
        p = _PRIMS[1 + int(rng.integers(0, len(_PRIMS) - 1))]
        return ["null", "double" if p == "float" else p]
    if roll == 5:  # enum / fixed
        counter[0] += 1
        if rng.integers(0, 2):
            return {
                "type": "enum",
                "name": f"E{counter[0]}",
                "symbols": ["A", "B", "C"],
            }
        return {"type": "fixed", "name": f"X{counter[0]}", "size": 3}
    if roll in (6, 7):  # array / map
        inner = _gen_schema(rng, depth - 1, counter)
        if roll == 6:
            return {"type": "array", "items": inner}
        return {"type": "map", "values": inner}
    counter[0] += 1  # record
    return {
        "type": "record",
        "name": f"R{counter[0]}",
        "fields": [
            {
                "name": f"f{i}",
                "type": _gen_schema(rng, depth - 1, counter),
            }
            for i in range(1 + int(rng.integers(0, 3)))
        ],
    }


def _gen_value(rng: np.random.Generator, schema):
    if isinstance(schema, list):
        return _gen_value(rng, schema[int(rng.integers(0, len(schema)))])
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None
    if t == "boolean":
        return bool(rng.integers(0, 2))
    if t == "int":
        return int(rng.integers(-(2**31), 2**31))
    if t == "long":
        return int(rng.integers(-(2**62), 2**62))
    if t == "double":
        return float(np.float64(rng.integers(-(10**6), 10**6)) / 8)
    if t == "bytes":
        return bytes(rng.integers(0, 256, int(rng.integers(0, 6))).astype(np.uint8))
    if t == "string":
        return "".join(
            chr(c)
            for c in rng.integers(0x20, 0x2FA0, int(rng.integers(0, 8)))
        )
    if t == "record":
        return {f["name"]: _gen_value(rng, f["type"]) for f in schema["fields"]}
    if t == "array":
        return [
            _gen_value(rng, schema["items"])
            for _ in range(int(rng.integers(0, 4)))
        ]
    if t == "map":
        return {
            f"k{i}": _gen_value(rng, schema["values"])
            for i in range(int(rng.integers(0, 4)))
        }
    if t == "enum":
        return schema["symbols"][int(rng.integers(0, len(schema["symbols"])))]
    if t == "fixed":
        return bytes(
            rng.integers(0, 256, schema["size"]).astype(np.uint8)
        )
    raise AssertionError(t)


@pytest.mark.parametrize("seed", range(40))
def test_avro_roundtrip_random_schema_and_values(tmp_path, seed):
    rng = np.random.default_rng(1000 + seed)
    counter = [0]
    schema = {
        "type": "record",
        "name": "root",
        "fields": [
            {"name": f"g{i}", "type": _gen_schema(rng, 3, counter)}
            for i in range(1 + int(rng.integers(0, 4)))
        ],
    }
    records = [_gen_value(rng, schema) for _ in range(int(rng.integers(1, 9)))]
    codec = ("null", "deflate")[seed % 2]
    path = str(tmp_path / "f.avro")
    write_ocf(path, schema, records, codec=codec, block_rows=3)
    got_schema, got, _ = read_ocf(path)
    assert got_schema == schema
    assert got == records


# -------------------------------------------------------------- jpeg sweep
@pytest.mark.parametrize("seed", range(18))
def test_jpeg_entropy_layer_exact_across_parameter_grid(seed):
    from hadoop_sync_spark.jpeg_codec import (
        _blockwise_dct_quant,
        _decode_quantized,
        _pad_edge,
        _rgb_to_ycbcr,
        encode_jpeg,
        scaled_quant_tables,
    )

    rng = np.random.default_rng(2000 + seed)
    h = int(rng.integers(1, 40))
    w = int(rng.integers(1, 40))
    quality = int(rng.integers(1, 101))
    sub = ("4:4:4", "4:2:0")[seed % 2]
    dri = (0, 1, 3)[seed % 3]
    grey = bool(seed % 5 == 0)
    if grey:
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
    else:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    data = encode_jpeg(
        img, quality=quality, subsampling=sub, restart_interval=dri
    )
    dh, dw, comps, coefs = _decode_quantized(data)
    assert (dh, dw) == (h, w)

    qlum, qchrom = scaled_quant_tables(quality)
    mcu = 16 if (sub == "4:2:0" and not grey) else 8
    if grey:
        planes = [(_pad_edge(img.astype(np.float64), mcu, mcu), qlum)]
    else:
        ycc = np.rint(_rgb_to_ycbcr(img))
        y = _pad_edge(ycc[..., 0], mcu, mcu)
        cb = _pad_edge(ycc[..., 1], mcu, mcu)
        cr = _pad_edge(ycc[..., 2], mcu, mcu)
        if mcu == 16:
            cb = np.rint(
                cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            )
            cr = np.rint(
                cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
            )
        planes = [(y, qlum), (cb, qchrom), (cr, qchrom)]
    for (plane, q), got in zip(planes, coefs):
        exp = _blockwise_dct_quant(plane - 128.0, q)
        assert np.array_equal(exp, got), (h, w, quality, sub, dri, grey)
