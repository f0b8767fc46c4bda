"""Pure-stdlib PNG codec tests (functions/png_codec.py): round-trip under
every scanline filter, malformed-input rejection, and the real-decode path
through the multimodal mapInPandas seam."""

from __future__ import annotations

import struct
import zlib

import pytest

from cdc_worker_spark.functions.png_codec import (
    decode_png,
    encode_png,
    png_features,
)


def _pixels(w: int, h: int, ch: int, seed: int = 0) -> bytes:
    return bytes((seed + 7 * i + (i * i) % 19) % 256 for i in range(w * h * ch))


def test_roundtrip_all_filters_gray_and_rgb():
    """decode(encode(px)) == px for every PNG filter type (0-4: None, Sub,
    Up, Average, Paeth), both color types — every un-filter branch is
    exercised against its encoder-side inverse."""
    for color_type, ch in ((0, 1), (2, 3)):
        for ftype in range(5):
            w, h = 17, 9
            px = _pixels(w, h, ch, seed=ftype * 41)
            img = decode_png(encode_png(w, h, px, color_type, filter_type=ftype))
            assert (img["width"], img["height"], img["channels"]) == (w, h, ch)
            assert img["pixels"] == px, f"filter {ftype} color {color_type}"


def test_roundtrip_edge_geometries():
    for w, h in ((1, 1), (1, 8), (8, 1), (2, 2)):
        px = _pixels(w, h, 1, seed=3)
        assert decode_png(encode_png(w, h, px))["pixels"] == px


def test_filters_change_wire_not_pixels():
    """Different filters produce different bytes but identical decodes —
    i.e., the filter is genuinely being applied and genuinely undone."""
    w, h = 16, 8
    px = _pixels(w, h, 1, seed=9)
    encodings = {encode_png(w, h, px, filter_type=f) for f in range(5)}
    assert len(encodings) == 5
    assert {decode_png(e)["pixels"] for e in encodings} == {px}


def test_malformed_inputs_rejected():
    good = encode_png(8, 4, _pixels(8, 4, 1))
    # bad signature
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good[4:])
    # flip one IDAT byte -> CRC mismatch
    idat_at = good.index(b"IDAT") + 4
    bad = bytearray(good)
    bad[idat_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # truncation
    with pytest.raises(ValueError):
        decode_png(good[: len(good) - 6])


def test_unsupported_subset_rejected():
    good = encode_png(4, 4, _pixels(4, 4, 1))
    # rewrite IHDR with 16-bit depth, fix its CRC, keep the rest
    ihdr_body = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr_body))
        + b"IHDR"
        + ihdr_body
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_body) & 0xFFFFFFFF)
    )
    bad = good[:8] + chunk + good[8 + 12 + 13 :]
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bad)


def test_png_features_statistics():
    px = bytes([10, 20, 30, 40])
    f = png_features(encode_png(2, 2, px))
    assert f["mean_intensity"] == 25.0
    assert (f["min_intensity"], f["max_intensity"]) == (10, 40)
    assert (f["width"], f["height"], f["channels"]) == (2, 2, 1)


def test_decode_media_batch_real_png(spark):
    """A payload with a PNG signature flows through the mapInPandas decode
    seam and comes back with its ACTUAL geometry — including under
    strict=True, which only rejects non-PNG media now."""
    from cdc_worker_spark.operators.multimodal import decode_media_batch

    w, h = 11, 5
    data = encode_png(w, h, _pixels(w, h, 1), filter_type=4)
    df = spark.createDataFrame(
        [(1, bytearray(data), "image/png"), (2, bytearray(b"not media"), "audio/wav")],
        "doc_id: long, media: binary, media_type: string",
    )
    out = {r.doc_id: r for r in decode_media_batch(df).collect()}
    assert (out[1].width, out[1].height, out[1].n_frames) == (w, h, 1)
    assert out[2].width == len(b"not media") % 640 + 1  # fake path preserved

    strict_png = decode_media_batch(
        df.filter("doc_id = 1"), strict=True
    ).collect()
    assert strict_png[0].width == w
    with pytest.raises(Exception):  # non-PNG under strict -> NotImplementedError
        decode_media_batch(df.filter("doc_id = 2"), strict=True).collect()
