"""Pure-stdlib GIF87a codec tests (functions/gif_codec.py): LZW round-trip
across content classes (incl. the 12-bit table-full re-CLEAR path),
malformed-input rejection, and the real-decode multimodal query."""

from __future__ import annotations

import random

import pytest

from cdc_worker_spark.functions.gif_codec import (
    decode_gif,
    encode_gif,
    gif_features,
)


def _random_px(n: int, seed: int, alphabet: int = 256) -> bytes:
    rng = random.Random(seed)
    return bytes(rng.randrange(alphabet) for _ in range(n))


def test_roundtrip_content_classes():
    """decode(encode(px)) == px for random, constant and ramp content —
    exercises short/long LZW runs and every code-width growth step."""
    for w, h in ((1, 1), (4, 3), (13, 9), (64, 64), (255, 1), (1, 255)):
        n = w * h
        for px in (
            _random_px(n, seed=w * 31 + h),
            bytes([5]) * n,
            bytes(i % 256 for i in range(n)),
        ):
            img = decode_gif(encode_gif(w, h, px))
            assert (img["width"], img["height"]) == (w, h)
            assert img["indices"] == px


def test_roundtrip_table_overflow_reclear():
    """An image large/diverse enough to fill the 4096-entry LZW table
    forces the in-band re-CLEAR; the decoder must resynchronize."""
    w = h = 300
    px = bytes((i * 7 + (i // w) * 31) % 256 for i in range(w * h))
    assert decode_gif(encode_gif(w, h, px))["indices"] == px
    # low-entropy variant grows the table via long phrases instead
    px2 = _random_px(w * h, seed=9, alphabet=4)
    assert decode_gif(encode_gif(w, h, px2))["indices"] == px2


def test_features_grayscale_ramp_palette():
    px = bytes((3 * i) % 256 for i in range(10 * 7))
    f = gif_features(encode_gif(10, 7, px))
    assert f["width"] == 10 and f["height"] == 7 and f["n_pixels"] == 70
    assert f["min_intensity"] == min(px) and f["max_intensity"] == max(px)
    assert abs(f["mean_intensity"] - sum(px) / len(px)) < 1e-12


def test_rejects_malformed():
    good = encode_gif(4, 4, bytes(range(16)))
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + good[6:])
    with pytest.raises(ValueError):
        decode_gif(good[:20])  # truncated mid-palette / no descriptor
    # corrupt the sub-block terminator -> claims a 255-byte block that
    # isn't there -> truncated stream
    bad = bytearray(good)
    bad[-2] = 0xFF
    with pytest.raises((ValueError, IndexError)):
        decode_gif(bytes(bad))


def test_payload_size_mismatch_raises():
    with pytest.raises(ValueError, match="indices length"):
        encode_gif(4, 4, b"\x00" * 15)


def test_gif89a_extension_blocks_skipped():
    """Decoder tolerates 89a streams with extension blocks before the
    image descriptor (the common case for GIFs in the wild)."""
    data = bytearray(encode_gif(6, 5, bytes(range(30))))
    data[4] = ord("9")  # GIF87a -> GIF89a
    # inject a Graphic Control Extension after the global color table
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    insert_at = 13 + 768
    data[insert_at:insert_at] = gce
    img = decode_gif(bytes(data))
    assert img["indices"] == bytes(range(30))
