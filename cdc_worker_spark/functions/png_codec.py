"""Pure-stdlib PNG codec — real image decode for the multimodal path.

The multimodal decode seam (operators/multimodal.py) stubs the codec step
because this container has no media libraries. PNG, however, needs only
``zlib`` and ``struct``: the format is public (RFC 2083 / the PNG spec) —
signature, length-prefixed CRC-checked chunks, IHDR geometry, zlib-deflated
IDAT scanlines, five per-row byte filters. Implementing it makes the decode
step REAL for image/png payloads: actual width/height/channels and pixel
statistics come out of actual encoded bytes. JPEG/audio/video stay behind
the documented NotImplementedError seam.

Supported subset (asserted, not assumed): 8-bit depth, grayscale (color
type 0) and RGB (color type 2), no interlace. That covers the fixture
images and the common feature-extraction path; anything else raises with a
precise message, which the corrupt-media handling maps to NULL metadata.

The encoder exists for fixtures and round-trip tests (any of the five
filter types can be forced per image, so every un-filter branch is
exercised); production ingest would read PNGs produced elsewhere.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: channels per supported color type
_CHANNELS = {0: 1, 2: 3}


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply PNG filter ``ftype`` to a raw scanline (spec 6.2-6.6) — the
    encoder-side transform whose inverse the decoder must undo."""
    n = len(row)
    out = bytearray(n)
    for i in range(n):
        a = row[i - bpp] if i >= bpp else 0  # left
        b = prev[i]  # up
        c = prev[i - bpp] if i >= bpp else 0  # upper-left
        x = row[i]
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(
    width: int, height: int, pixels: bytes, color_type: int = 0, filter_type: int = 0
) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``width*height*channels`` bytes)
    as a PNG. ``filter_type`` forces one filter on every scanline so tests
    can exercise each decoder un-filter branch."""
    ch = _CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported color type {color_type}")
    if len(pixels) != width * height * ch:
        raise ValueError("pixel buffer does not match geometry")
    stride = width * ch
    prev = bytes(stride)
    raw = bytearray()
    for r in range(height):
        row = pixels[r * stride : (r + 1) * stride]
        raw.append(filter_type)
        raw += _filter_row(filter_type, row, prev, ch)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_png(data: bytes) -> dict:
    """Decode a PNG: verify signature + per-chunk CRCs, parse IHDR, inflate
    IDAT, undo scanline filters. Returns ``{width, height, channels,
    pixels}`` with ``pixels`` the raw row-major bytes. Raises ValueError on
    anything malformed or outside the supported subset."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    ended = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            ended = True
            break
    if ihdr is None or not ended:
        raise ValueError("missing IHDR or IEND")
    width, height, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type} (only 0/2)")
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("unsupported compression/filter-method/interlace")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT size does not match geometry")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for r in range(height):
        ftype = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ftype == 0:
            pass
        elif ftype == 1:
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"bad scanline filter {ftype}")
        out[r * stride : (r + 1) * stride] = line
        prev = bytes(line)
    return {
        "width": width,
        "height": height,
        "channels": ch,
        "pixels": bytes(out),
    }


def png_features(data: bytes) -> dict:
    """Decode + the standard cheap features a training pipeline extracts:
    geometry plus per-image pixel statistics (mean/min/max intensity)."""
    img = decode_png(data)
    px = img["pixels"]
    n = len(px)
    return {
        "width": img["width"],
        "height": img["height"],
        "channels": img["channels"],
        "mean_intensity": (sum(px) / n) if n else 0.0,
        "min_intensity": min(px) if n else 0,
        "max_intensity": max(px) if n else 0,
    }
