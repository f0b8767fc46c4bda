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


#: ITU T.81 Figure A.6 zigzag scan, linearized row*8+col — hardcoded so a
#: generator bug (e.g. the transposed variant: self-consistent, but wrong
#: against every external JPEG) cannot pass silently.
_T81_ZIGZAG_LINEAR = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def test_zigzag_matches_t81_standard_table():
    """The generated scan order must equal the published T.81 table
    exactly — interoperability with externally-produced JPEGs depends on
    it (round-trip tests alone cannot catch a transposed scan)."""
    from cdc_worker_spark.functions.jpeg_codec import _ZIGZAG

    assert [r * 8 + c for (r, c) in _ZIGZAG] == _T81_ZIGZAG_LINEAR
    # and it is a permutation that starts at DC and steps to (0,1) per spec
    assert _ZIGZAG[0] == (0, 0) and _ZIGZAG[1] == (0, 1) and _ZIGZAG[2] == (1, 0)


def test_decode_externally_constructed_stream():
    """A minimal 8x8 stream hand-assembled against the SPEC (not via
    encode_jpeg): flat quant table 16, single DC coefficient +2 -> every
    pixel 128 + 2*16/8-rounded IDCT = 160. Exercises the standard zigzag
    DQT layout independently of the encoder."""
    import struct as _s

    from cdc_worker_spark.functions.jpeg_codec import decode_jpeg

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + _s.pack(">H", 67) + b"\x00" + bytes([16] * 64)
    out += b"\xff\xc0" + _s.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes((1, 0x11, 0))
    # DC table: symbol s gets an s-bit... simplest valid: 12 symbols, 4-bit
    dc_counts = [0, 0, 0, 12] + [0] * 12
    out += b"\xff\xc4" + _s.pack(">H", 2 + 17 + 12) + bytes([0x00] + dc_counts) + bytes(range(12))
    # AC table: single symbol EOB with a 1-bit code
    ac_counts = [1] + [0] * 15
    out += b"\xff\xc4" + _s.pack(">H", 2 + 17 + 1) + bytes([0x10] + ac_counts) + bytes([0x00])
    out += b"\xff\xda" + _s.pack(">HB", 8, 1) + bytes((1, 0x00, 0, 63, 0))
    # entropy: DC size=2 (code 0b0010, 4 bits), amplitude 2 (0b10), EOB (0b0)
    # bits: 0010 10 0 -> 0b00101000 = 0x28
    out += bytes([0x28])
    out += b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    assert img["width"] == 8 and img["height"] == 8
    # recon = 128 + IDCT(DC=2*16) = 128 + 32/8 = 132 everywhere
    assert set(img["pixels"]) == {132}
