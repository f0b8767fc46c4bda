"""Pure-stdlib WAV codec tests (functions/wav_codec.py): round-trip,
malformed rejection, feature exactness, and the real-decode path through the
multimodal mapInPandas seam."""

from __future__ import annotations

import struct

import pytest

from cdc_worker_spark.functions.wav_codec import (
    decode_wav,
    encode_wav,
    wav_features,
)


def test_roundtrip_16bit_and_8bit():
    s16 = [0, 1, -1, 32767, -32768, 500, -12345]
    clip = decode_wav(encode_wav(s16, sample_rate=44100))
    assert clip["samples"] == s16
    assert (clip["sample_rate"], clip["bits"], clip["n_channels"]) == (44100, 16, 1)
    s8 = [0, 255, 128, 7]
    clip8 = decode_wav(encode_wav(s8, bits=8))
    assert clip8["samples"] == s8 and clip8["bits"] == 8


def test_roundtrip_stereo():
    inter = [10, -10, 20, -20, 30, -30]  # L/R interleaved, 3 frames
    clip = decode_wav(encode_wav(inter, n_channels=2))
    assert clip["n_channels"] == 2 and clip["n_samples"] == 3
    assert clip["samples"] == inter


def test_malformed_rejected():
    good = encode_wav([1, 2, 3])
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"JUNK" + good[4:])
    with pytest.raises(ValueError):
        decode_wav(good[:20])  # truncated before data
    # non-PCM format tag
    bad = bytearray(good)
    fmt_at = good.index(b"fmt ") + 8
    struct.pack_into("<H", bad, fmt_at, 85)  # MP3 tag
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(bad))


def test_features_exact():
    f = wav_features(encode_wav([3, -4, 0, 5], sample_rate=1000))
    assert f["n_samples"] == 4 and f["duration_ms"] == 4
    assert f["mean_sample"] == 1.0
    assert f["peak"] == 5
    assert f["energy"] == 9 + 16 + 0 + 25


def test_decode_media_batch_real_wav(spark):
    """A RIFF/WAVE payload flows through the mapInPandas decode seam with
    real metadata (channels/bits/frames), including under strict=True."""
    from cdc_worker_spark.operators.multimodal import decode_media_batch

    data = encode_wav(list(range(-50, 50)), sample_rate=8000)
    df = spark.createDataFrame(
        [(5, bytearray(data), "audio/wav")],
        "doc_id: long, media: binary, media_type: string",
    )
    out = decode_media_batch(df, strict=True).collect()[0]
    assert (out.width, out.height, out.n_frames) == (1, 16, 100)
