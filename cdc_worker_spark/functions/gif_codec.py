"""Pure-stdlib GIF87a codec — real COMPRESSED image decode for the
multimodal path.

PNG (functions/png_codec.py) made the decode seam real for a
filter+deflate format; GIF adds a genuinely different compression family:
variable-width LZW with in-band CLEAR/EOI codes and a growing dictionary
(the GIF flavor of Welch 1984, as published in the GIF87a specification).
Only ``struct`` is needed — the LZW coder is implemented here.

Supported subset (asserted, not assumed): GIF87a, single image, global
color table, no interlace, 8-bit color resolution. The palette is a
256-entry grayscale ramp in the fixtures, so palette index == intensity;
the decoder returns indices plus the palette and the feature extractor
maps through the palette, so color GIFs would work unchanged.

The encoder exists for fixtures and round-trip tests; production ingest
reads GIFs produced elsewhere. Reference analogue: the per-event payload
decode seam (eventParser.js:13) — here per-media-payload.
"""

from __future__ import annotations

import struct

_MAX_CODE_WIDTH = 12


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


class _BitPacker:
    """LSB-first bit packer (GIF packs LZW codes little-endian bitwise)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def put(self, code: int, width: int) -> None:
        self.cur |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.cur & 0xFF)
            self.cur >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur & 0xFF)
            self.cur = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits CLEAR first, grows code width at dict-full,
    re-CLEARs at the 12-bit ceiling, ends with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    packer = _BitPacker()
    packer.put(clear, width)

    run = b""
    for byte in data:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        packer.put(table[run], width)
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[cand] = next_code
            next_code += 1
            # width must cover every ASSIGNED code (next_code-1); the
            # decoder's table is one entry behind at the same code index,
            # so its matching rule is len(table) >= 2^width after append
            if next_code > (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        else:  # 12-bit table full: re-CLEAR (decoder stops appending too)
            packer.put(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([byte])
    if run:
        packer.put(table[run], width)
    packer.put(eoi, width)
    return packer.flush()


def encode_gif(width: int, height: int, indices: bytes) -> bytes:
    """Single-frame GIF87a with a 256-entry grayscale global palette.

    ``indices`` are row-major palette indices (== gray intensity under the
    ramp palette), length width*height.
    """
    if len(indices) != width * height:
        raise ValueError("indices length != width*height")
    out = bytearray()
    out += b"GIF87a"
    # logical screen descriptor: global table, 8-bit color res, 256 entries
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for v in range(256):  # grayscale ramp palette
        out += bytes((v, v, v))
    # image descriptor at (0,0), no local table, no interlace
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    min_code_size = 8
    out.append(min_code_size)
    payload = _lzw_encode(indices, min_code_size)
    for i in range(0, len(payload), 255):  # 255-byte sub-blocks
        block = payload[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _lzw_decode(payload: bytes, min_code_size: int, n_expected: int) -> bytes:
    """Inverse of ``_lzw_encode`` (the standard LZW decoder with the
    cSc corner case: code == next_code means prev + prev[0])."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader, LSB-first
    acc = 0
    nbits = 0
    pos = 0

    def read(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(payload):
                raise ValueError("LZW stream truncated")
            acc |= payload[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    def fresh() -> list[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    out = bytearray()
    table = fresh()
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and len(table) < (1 << _MAX_CODE_WIDTH):
            table.append(prev + entry[:1])
            if len(table) >= (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
        if len(out) >= n_expected:
            # well-formed streams follow with EOI; tolerate its absence
            break
    if len(out) != n_expected:
        raise ValueError(f"decoded {len(out)} pixels, expected {n_expected}")
    return bytes(out)


def decode_gif(data: bytes) -> dict:
    """Parse a GIF87a/89a single-frame image -> geometry, palette, indices.

    Returns {"width", "height", "palette" (768 bytes), "indices" (bytes)}.
    """
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    if not flags & 0x80:
        raise ValueError("unsupported: no global color table")
    table_size = 2 << (flags & 0x07)
    palette = data[pos : pos + 3 * table_size]
    pos += 3 * table_size
    # skip extension blocks (0x21) until the image descriptor
    while pos < len(data) and data[pos] == 0x21:
        pos += 2
        while data[pos]:
            pos += 1 + data[pos]
        pos += 1
    if pos >= len(data) or data[pos] != 0x2C:
        raise ValueError("no image descriptor")
    _left, _top, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
    pos += 10
    if iflags & 0x40:
        raise ValueError("unsupported: interlaced")
    if iflags & 0x80:
        raise ValueError("unsupported: local color table")
    min_code_size = data[pos]
    pos += 1
    payload = bytearray()
    while data[pos]:
        n = data[pos]
        payload += data[pos + 1 : pos + 1 + n]
        pos += 1 + n
    indices = _lzw_decode(bytes(payload), min_code_size, w * h)
    return {
        "width": w,
        "height": h,
        "screen": (sw, sh),
        "palette": palette,
        "indices": indices,
    }


def gif_features(data: bytes) -> dict:
    """Decode + grayscale feature extraction (mean/min/max intensity via
    the palette's red channel — exact for the grayscale ramp; for color
    GIFs this is the standard palette-lookup luminance proxy)."""
    img = decode_gif(data)
    pal = img["palette"]
    vals = [pal[3 * i] for i in img["indices"]]
    n = len(vals)
    return {
        "width": img["width"],
        "height": img["height"],
        "n_pixels": n,
        "mean_intensity": sum(vals) / n if n else float("nan"),
        "min_intensity": min(vals) if n else -1,
        "max_intensity": max(vals) if n else -1,
    }
