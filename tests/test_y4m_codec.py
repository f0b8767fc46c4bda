"""Pure-stdlib Y4M codec tests (functions/y4m_codec.py): round-trip for
mono and 4:2:0, malformed rejection, feature exactness, and the real-decode
path through the multimodal seam."""

from __future__ import annotations

import pytest

from cdc_worker_spark.functions.y4m_codec import (
    decode_y4m,
    encode_y4m,
    y4m_features,
)


def _frames(n: int, size: int, seed: int = 0) -> list[bytes]:
    return [bytes((seed + f * 7 + i * 13) % 256 for i in range(size)) for f in range(n)]


def test_roundtrip_mono():
    w, h, nf = 6, 4, 3
    frames = _frames(nf, w * h)
    clip = decode_y4m(encode_y4m(frames, w, h, fps=(30, 1), colorspace="Cmono"))
    assert (clip["width"], clip["height"], clip["n_frames"]) == (w, h, nf)
    assert (clip["fps_num"], clip["fps_den"]) == (30, 1)
    assert clip["frames"] == frames


def test_roundtrip_420():
    w, h = 4, 2
    size = w * h + 2 * ((w // 2) * (h // 2))
    frames = _frames(2, size, seed=5)
    clip = decode_y4m(encode_y4m(frames, w, h, colorspace="C420"))
    assert clip["colorspace"] == "C420" and clip["frames"] == frames


def test_zero_frames_ok():
    clip = decode_y4m(encode_y4m([], 8, 8))
    assert clip["n_frames"] == 0


def test_malformed_rejected():
    good = encode_y4m(_frames(2, 12), 4, 3, colorspace="Cmono")
    with pytest.raises(ValueError, match="magic"):
        decode_y4m(b"AVI " + good)
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(good[:-5])
    with pytest.raises(ValueError, match="FRAME"):
        # corrupt the first frame marker
        decode_y4m(good.replace(b"FRAME\n", b"FRUME\n", 1))
    with pytest.raises(ValueError):
        encode_y4m([b"x" * 11], 4, 3, colorspace="Cmono")  # wrong frame size


def test_features_exact():
    # 2x2 mono, 2 frames at 25 fps: 80 ms, known luma values
    frames = [bytes([0, 10, 20, 30]), bytes([40, 50, 60, 70])]
    f = y4m_features(encode_y4m(frames, 2, 2))
    assert f["duration_ms"] == 80
    assert f["mean_luma"] == 35.0
    assert f["peak_luma"] == 70
    assert (f["width"], f["height"], f["n_frames"]) == (2, 2, 2)


def test_decode_media_batch_real_y4m(spark):
    """A YUV4MPEG2 payload flows through the mapInPandas decode seam with
    its actual geometry and frame count, including under strict=True."""
    from cdc_worker_spark.operators.multimodal import decode_media_batch

    data = encode_y4m(_frames(4, 35), 7, 5, colorspace="Cmono")
    df = spark.createDataFrame(
        [(9, bytearray(data), "video/mp4")],
        "doc_id: long, media: binary, media_type: string",
    )
    out = decode_media_batch(df, strict=True).collect()[0]
    assert (out.width, out.height, out.n_frames) == (7, 5, 4)
