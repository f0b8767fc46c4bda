"""MJPEG-in-AVI codec: RIFF demux + per-frame ITU T.81 decode.

Frame pixels use constant 8x8 tiles with EVEN values, for which the JPEG
quantization round-trip is exact (see test_jpeg_codec) — so the AVI round
trips can assert bit-equality end-to-end and isolate the CONTAINER logic
under test here."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cdc_worker_spark.functions.avi_codec import (
    _chunk,
    _list,
    decode_mjpeg_avi,
    encode_mjpeg_avi,
    mjpeg_features,
)
from cdc_worker_spark.functions.jpeg_codec import encode_jpeg


def _tile_frame(w: int, h: int, seed: int) -> bytes:
    """Row-major grayscale pixels: constant 8x8 tiles of even values."""
    tiles_x = w // 8
    px = bytearray()
    for ty in range(h // 8):
        row = [
            bytes([2 * ((seed + (ty * tiles_x + tx) * 53) % 128)]) * 8
            for tx in range(tiles_x)
        ]
        for _ in range(8):
            for r in row:
                px += r
    return bytes(px)


def _clip(w: int, h: int, n: int, seed: int = 7) -> tuple[list[bytes], list[bytes]]:
    """(raw pixel frames, encoded JPEG frames)."""
    raw = [_tile_frame(w, h, seed + 17 * f) for f in range(n)]
    return raw, [encode_jpeg(w, h, p) for p in raw]


def test_mjpeg_avi_round_trip_exact():
    w, h, n = 24, 16, 3
    raw, jpegs = _clip(w, h, n)
    avi = encode_mjpeg_avi(w, h, jpegs, fps=12)
    clip = decode_mjpeg_avi(avi)
    assert (clip["width"], clip["height"], clip["n_frames"], clip["fps"]) == (
        w, h, n, 12,
    )
    for got, want in zip(clip["frames"], raw):
        assert got["pixels"] == want  # even constant tiles: exact recon


def test_features_match_numpy_recount():
    w, h, n = 16, 16, 4
    raw, jpegs = _clip(w, h, n, seed=29)
    f = mjpeg_features(encode_mjpeg_avi(w, h, jpegs))
    arr = np.concatenate([np.frombuffer(p, dtype=np.uint8) for p in raw])
    assert f["n_pixels"] == w * h * n
    assert f["mean_intensity"] == pytest.approx(float(arr.mean()))
    assert f["min_intensity"] == int(arr.min())
    assert f["max_intensity"] == int(arr.max())


def test_demux_tolerates_foreign_layouts():
    """Spec variations our muxer never writes: frames inside a 'rec '
    grouping list, '##db' (uncompressed-flagged) chunk ids, and a missing
    idx1 — the index is optional per the AVI RIFF reference."""
    w, h = 16, 8
    raw, jpegs = _clip(w, h, 2, seed=3)
    base = encode_mjpeg_avi(w, h, jpegs)
    # rebuild: hdrl from the muxer, movi with rec-grouped 00db chunks, no idx1
    clip0 = decode_mjpeg_avi(base)  # sanity on the donor
    assert clip0["n_frames"] == 2
    hdrl_start = base.index(b"LIST", 12)
    (hdrl_size,) = struct.unpack_from("<I", base, hdrl_start + 4)
    hdrl = base[hdrl_start : hdrl_start + 8 + hdrl_size]
    movi = _list(
        b"movi",
        _list(b"rec ", _chunk(b"00db", jpegs[0]))
        + _chunk(b"00db", jpegs[1]),
    )
    avi = _chunk(b"RIFF", b"AVI " + hdrl + movi)
    clip = decode_mjpeg_avi(avi)
    assert clip["n_frames"] == 2
    assert [f["pixels"] for f in clip["frames"]] == raw


def test_demux_selects_first_video_stream():
    """A leading non-video stream (stream 0 = 'auds') must shift the
    video chunk ids to '01dc' and the demuxer must follow."""
    w, h = 8, 8
    raw, jpegs = _clip(w, h, 2, seed=11)
    avih = struct.pack("<10I4I", 100000, 0, 0, 0, 2, 0, 2, 0, w, h, 0, 0, 0, 0)
    auds_strh = struct.pack(
        "<4s4sI2H8I4h", b"auds", b"\x00\x00\x00\x00",
        0, 0, 0, 0, 1, 8000, 0, 16000, 0, 0xFFFFFFFF, 2, 0, 0, 0, 0,
    )
    vids_strh = struct.pack(
        "<4s4sI2H8I4h", b"vids", b"MJPG",
        0, 0, 0, 0, 1, 10, 0, 2, 0, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack("<I2i2H4s5i", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", auds_strh) + _chunk(b"strf", b"\x00" * 16))
        + _list(b"strl", _chunk(b"strh", vids_strh) + _chunk(b"strf", strf)),
    )
    movi = _list(
        b"movi",
        _chunk(b"01dc", jpegs[0])
        + _chunk(b"00wb", b"\x00" * 32)  # interleaved audio: ignored
        + _chunk(b"01dc", jpegs[1]),
    )
    clip = decode_mjpeg_avi(_chunk(b"RIFF", b"AVI " + hdrl + movi))
    assert clip["n_frames"] == 2
    assert (clip["width"], clip["height"]) == (w, h)
    assert [f["pixels"] for f in clip["frames"]] == raw


def test_second_video_stream_geometry_ignored():
    """Two vids streams with DIFFERENT geometries: frames come from the
    first, so the second's strf must not overwrite the accepted geometry
    (ADVICE r11 — it previously did, raising a spurious mismatch)."""
    w, h = 8, 8
    raw, jpegs = _clip(w, h, 2, seed=13)
    avih = struct.pack("<10I4I", 100000, 0, 0, 0, 2, 0, 2, 0, w, h, 0, 0, 0, 0)

    def _vids_strl(sw: int, sh: int) -> bytes:
        strh = struct.pack(
            "<4s4sI2H8I4h", b"vids", b"MJPG",
            0, 0, 0, 0, 1, 10, 0, 2, 0, 0xFFFFFFFF, 0, 0, 0, sw, sh,
        )
        strf = struct.pack(
            "<I2i2H4s5i", 40, sw, sh, 1, 24, b"MJPG", sw * sh * 3, 0, 0, 0, 0
        )
        return _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))

    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _vids_strl(w, h) + _vids_strl(32, 24),
    )
    movi = _list(
        b"movi",
        _chunk(b"00dc", jpegs[0])
        + _chunk(b"01dc", b"\x00" * 16)  # second stream: not selected
        + _chunk(b"00dc", jpegs[1]),
    )
    clip = decode_mjpeg_avi(_chunk(b"RIFF", b"AVI " + hdrl + movi))
    assert clip["n_frames"] == 2
    assert (clip["width"], clip["height"]) == (w, h)
    assert [f["pixels"] for f in clip["frames"]] == raw


def test_corrupt_inputs_raise():
    w, h = 8, 8
    _, jpegs = _clip(w, h, 1)
    avi = encode_mjpeg_avi(w, h, jpegs)
    with pytest.raises(ValueError, match="RIFF"):
        decode_mjpeg_avi(b"\x00" * 64)
    # a chunk whose declared size overruns the container must be loud
    bad = bytearray(avi)
    movi_at = bytes(bad).index(b"00dc")
    struct.pack_into("<I", bad, movi_at + 4, 2**31)
    with pytest.raises(ValueError, match="overruns"):
        decode_mjpeg_avi(bytes(bad))
    # container/frame geometry mismatch must be loud, never truncated:
    # headers claim 8x8 but the muxed frame is 16x16
    other = encode_jpeg(16, 16, _tile_frame(16, 16, 5))
    with pytest.raises(ValueError, match="geometry"):
        decode_mjpeg_avi(encode_mjpeg_avi(w, h, [other]))


def test_decode_media_batch_real_mjpeg_avi(spark):
    """A RIFF/'AVI ' payload flows through the mapInPandas decode seam
    with real metadata (geometry from the stream headers, frame count
    from the movi walk), including under strict=True — compressed video
    is no longer the stub branch."""
    from cdc_worker_spark.operators.multimodal import decode_media_batch

    w, h, n = 16, 8, 3
    _, jpegs = _clip(w, h, n, seed=19)
    data = encode_mjpeg_avi(w, h, jpegs)
    df = spark.createDataFrame(
        [(9, bytearray(data), "video/avi")],
        "doc_id: long, media: binary, media_type: string",
    )
    out = decode_media_batch(df, strict=True).collect()[0]
    assert (out.width, out.height, out.n_frames) == (w, h, n)
    assert out.n_bytes == len(data)


def test_word_alignment_odd_frame_sizes():
    """JPEG payloads are frequently odd-length; the pad byte must not
    corrupt the following chunk."""
    w, h = 8, 8
    _, jpegs = _clip(w, h, 3, seed=41)
    # force odd sizes by appending a JPEG comment of odd total length
    def oddify(j: bytes) -> bytes:
        if len(j) % 2 == 1:
            return j
        # insert a COM segment (FFFE len=3 payload 1 byte) after SOI
        return j[:2] + b"\xff\xfe\x00\x03x" + j[2:]

    odd = [oddify(j) for j in jpegs]
    assert any(len(j) % 2 == 1 for j in odd)
    clip = decode_mjpeg_avi(encode_mjpeg_avi(w, h, odd))
    assert clip["n_frames"] == 3
