"""Pure-stdlib WAV (RIFF/PCM) codec — real audio decode for the multimodal
path, companion to :mod:`png_codec`.

The WAV container is public and trivial to parse with ``struct``: a RIFF
header, an ``fmt `` chunk (PCM format, channels, sample rate, bit depth),
and a ``data`` chunk of raw little-endian samples. Decoding it yields the
real audio metadata and per-clip sample statistics a training pipeline's
audio feature extractor starts from (duration, RMS energy, peak) — no
soundfile/ffmpeg needed. Compressed codecs (MP3/AAC/…) remain behind the
documented NotImplementedError seam in operators/multimodal.py.

Supported subset: PCM (format tag 1), 8-bit unsigned / 16-bit signed,
any channel count and sample rate. Anything else raises ValueError with a
precise message.
"""

from __future__ import annotations

import struct

_RIFF = b"RIFF"
_WAVE = b"WAVE"


def encode_wav(
    samples: list[int], sample_rate: int = 16000, n_channels: int = 1, bits: int = 16
) -> bytes:
    """Encode interleaved integer samples as a PCM WAV file (for fixtures
    and round-trip tests). 16-bit samples are signed (-32768..32767), 8-bit
    unsigned (0..255)."""
    if bits == 16:
        body = b"".join(struct.pack("<h", s) for s in samples)
    elif bits == 8:
        body = bytes(samples)
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    chunks = (
        _WAVE
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return _RIFF + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes) -> dict:
    """Decode a PCM WAV: RIFF/WAVE framing, fmt geometry, raw samples.
    Returns ``{n_channels, sample_rate, bits, n_samples, samples}`` where
    ``n_samples`` counts per-channel frames and ``samples`` is the flat
    interleaved integer list. Raises ValueError on malformed or non-PCM
    input."""
    if data[:4] != _RIFF or data[8:12] != _WAVE:
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos = 12
    fmt = None
    body = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            fmt = chunk
        elif tag == b"data":
            body = chunk
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or body is None:
        raise ValueError("missing fmt or data chunk")
    if len(fmt) < 16:
        raise ValueError("fmt chunk too short")
    tag, n_channels, rate, _byte_rate, _block, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag != 1:
        raise ValueError(f"unsupported WAV format tag {tag} (only PCM)")
    if bits == 16:
        if len(body) % 2:
            raise ValueError("odd data length for 16-bit samples")
        samples = list(struct.unpack(f"<{len(body) // 2}h", body))
    elif bits == 8:
        samples = list(body)
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    if n_channels == 0 or len(samples) % n_channels:
        raise ValueError("sample count does not divide by channel count")
    return {
        "n_channels": n_channels,
        "sample_rate": rate,
        "bits": bits,
        "n_samples": len(samples) // n_channels,
        "samples": samples,
    }


def wav_features(data: bytes) -> dict:
    """Decode + the cheap per-clip features an audio pipeline extracts:
    duration, mean sample, peak amplitude, and sum of squares (the exact
    integer core of RMS energy — kept as an exact int so cross-engine
    comparison needs no float tolerance)."""
    clip = decode_wav(data)
    s = clip["samples"]
    n = len(s)
    return {
        "n_channels": clip["n_channels"],
        "sample_rate": clip["sample_rate"],
        "n_samples": clip["n_samples"],
        "duration_ms": clip["n_samples"] * 1000 // clip["sample_rate"],
        "mean_sample": (sum(s) / n) if n else 0.0,
        "peak": max(abs(x) for x in s) if n else 0,
        "energy": sum(x * x for x in s),
    }
