"""Baseline JPEG codec tests (functions/jpeg_codec.py): the entropy layer
must be lossless (decode equals the mathematical reference reconstruction
bit-for-bit), the decoder must read tables from the stream, and the
constant-even-tile closed form behind the oracle query must be exact."""

from __future__ import annotations

import numpy as np
import pytest

from cdc_worker_spark.functions.jpeg_codec import (
    STD_LUMA_QUANT,
    decode_jpeg,
    encode_jpeg,
    jpeg_features,
    reference_recon,
)


def _random_px(w: int, h: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()


def test_decode_equals_reference_recon():
    """decode(encode(img)) == dequant(quant(DCT(img))) bit-for-bit: the
    Huffman/zigzag/byte-stuffing layer adds ZERO error on top of the
    quantization loss. Non-multiple-of-8 sizes exercise edge padding."""
    for w, h in ((8, 8), (16, 8), (24, 16), (17, 9), (64, 48), (1, 1), (100, 3)):
        px = _random_px(w, h, seed=w * 131 + h)
        out = decode_jpeg(encode_jpeg(w, h, px))
        assert (out["width"], out["height"]) == (w, h)
        assert out["pixels"] == reference_recon(w, h, px), (w, h)


def test_quantization_actually_lossy_but_bounded():
    """Sanity that this IS transform coding: random input doesn't survive
    exactly, but per-pixel error stays within the quant-table bound."""
    w = h = 32
    px = _random_px(w, h, seed=5)
    out = np.frombuffer(decode_jpeg(encode_jpeg(w, h, px))["pixels"], dtype=np.uint8)
    src = np.frombuffer(px, dtype=np.uint8)
    assert not np.array_equal(out, src)
    assert np.abs(out.astype(int) - src.astype(int)).mean() < 40


def test_constant_even_tiles_reconstruct_exactly():
    """The oracle fixture's closed form: constant 8x8 tiles with EVEN
    values hit no quantizer rounding boundary and reconstruct exactly."""
    for doc_id in (0, 7, 13, 42, 255, 499):
        w = 8 * (doc_id % 3 + 2)
        h = 8 * (doc_id % 2 + 2)
        tiles_x, tiles_y = w // 8, h // 8
        px = bytearray()
        vals = []
        for ty in range(tiles_y):
            row = []
            for tx in range(tiles_x):
                v = 2 * ((doc_id * 29 + (ty * tiles_x + tx) * 53) % 128)
                vals.append(v)
                row.append(bytes([v]) * 8)
            for _ in range(8):
                for r in row:
                    px += r
        f = jpeg_features(encode_jpeg(w, h, bytes(px)))
        assert f["min_intensity"] == min(vals)
        assert f["max_intensity"] == max(vals)
        assert abs(f["mean_intensity"] - sum(vals) / len(vals)) < 1e-12


def test_custom_quant_table_read_from_stream():
    """The decoder uses DQT from the stream, not a baked-in table: a
    coarser table changes the output, and decode still matches the
    reference recon computed with that same table."""
    w = h = 16
    px = _random_px(w, h, seed=3)
    coarse = np.clip(STD_LUMA_QUANT * 4, 1, 255)
    out = decode_jpeg(encode_jpeg(w, h, px, quant=coarse))
    assert out["pixels"] == reference_recon(w, h, px, quant=coarse)
    fine = decode_jpeg(encode_jpeg(w, h, px))
    assert out["pixels"] != fine["pixels"]


def test_byte_stuffing_roundtrip():
    """0xFF bytes in the entropy stream must be stuffed on write and
    un-stuffed on read — asserted directly at the bitstream layer (the
    all-8-bit canonical AC codes make natural 0xFF bytes rare)."""
    from cdc_worker_spark.functions.jpeg_codec import _BitReader, _BitWriter

    w = _BitWriter()
    for val in (0xFF, 0x12, 0xFF, 0xFF, 0x00):
        w.put(val, 8)
    data = w.flush()
    assert data == bytes((0xFF, 0x00, 0x12, 0xFF, 0x00, 0xFF, 0x00, 0x00))
    r = _BitReader(data, 0)
    assert [r.bits(8) for _ in range(5)] == [0xFF, 0x12, 0xFF, 0xFF, 0x00]


def test_rejects_malformed():
    good = encode_jpeg(8, 8, bytes(64))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x00" + good)
    # progressive SOF2 is out of the baseline subset
    bad = bytearray(good)
    idx = bad.find(b"\xff\xc0")
    bad[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(bad))


def test_pixels_size_mismatch_raises():
    with pytest.raises(ValueError, match="pixels length"):
        encode_jpeg(8, 8, bytes(63))
