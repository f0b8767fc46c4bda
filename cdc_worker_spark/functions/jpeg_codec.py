"""Baseline JPEG codec (numpy + stdlib) — real transform-coding decode for
the multimodal path.

Closes the last compression family the decode seam lacked: PNG covers
filter+deflate, GIF covers LZW, WAV covers PCM, Y4M covers planar frames —
JPEG adds lossy transform coding (8x8 DCT, quantization, zigzag, Huffman
entropy coding with byte stuffing), implemented from the public ITU T.81
baseline process. Grayscale (1-component) sequential baseline only; the
decoder is GENERAL within that subset — it builds its Huffman and
quantization tables from the DHT/DQT segments of the stream, so it reads
grayscale baseline JPEGs produced elsewhere, not just its own.

Lossiness and testing: decode(encode(img)) cannot equal img, but it MUST
bit-equal the reference reconstruction dequant(quant(DCT(img))) computed
directly in numpy — the entropy layer is lossless, and both IDCT paths run
the identical float ops. tests/test_jpeg_codec.py asserts exactly that;
the oracle query (operators/multimodal.py q_multimodal_decode_jpeg) uses
constant 8x8 tiles, whose reconstruction is an exact closed form
(DC-only: recon = clamp(128 + q00*round(8*(v-128)/q00)/8)), so DuckDB can
replay the whole lossy loop in integer SQL.

The encoder exists for fixtures and tests; production ingest decodes
JPEGs produced elsewhere. Reference analogue: per-event payload decode
(eventParser.js:13) — here per-media-payload.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU T.81 Annex K.1 luminance quantization table (row-major)
STD_LUMA_QUANT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)


def _zigzag_order() -> list[tuple[int, int]]:
    """The T.81 zigzag scan as (row, col) pairs, generated, not hardcoded."""
    order = []
    for s in range(15):
        # T.81 Figure 5: odd diagonals run top-right -> bottom-left
        # ((0,s)..(s,0), row increasing), even diagonals the reverse.
        diag = [(s - j, j) for j in range(s + 1) if 0 <= s - j < 8 and 0 <= j < 8]
        order.extend([(j, i) for (i, j) in diag] if s % 2 else diag)
    return order


_ZIGZAG = _zigzag_order()

#: orthonormal 8-point DCT-II basis matrix: dct2(B) = C @ B @ C.T
_C = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            / 2.0
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _bits_needed(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Huffman tables (embedded in the stream via DHT — any valid table works)
# ---------------------------------------------------------------------------

#: DC: 12 categories, all 4-bit codes (12 * 2^-4 < 1, canonical)
_DC_SYMBOLS = list(range(12))
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12  # counts[i] = #codes of length i+1

#: AC: EOB, ZRL and every (run 0-15, size 1-10) symbol, all 8-bit codes
_AC_SYMBOLS = sorted([0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_AC_COUNTS = [0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8


def _canonical_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical code generation."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_COUNTS, _DC_SYMBOLS)
_AC_ENC = _canonical_codes(_AC_COUNTS, _AC_SYMBOLS)


class _BitWriter:
    """MSB-first JPEG entropy bitstream with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _amplitude(v: int, size: int) -> int:
    """T.81 F.1.2.1: negative amplitudes are stored as v - 1 in size bits."""
    return v if v >= 0 else v + (1 << size) - 1


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode_jpeg(width: int, height: int, pixels: bytes, quant: np.ndarray | None = None) -> bytes:
    """Grayscale sequential baseline JPEG. ``pixels`` row-major uint8;
    edges replicate-pad up to 8x8 block multiples."""
    if len(pixels) != width * height:
        raise ValueError("pixels length != width*height")
    q = STD_LUMA_QUANT if quant is None else np.asarray(quant, dtype=np.int32)
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width).astype(np.float64)
    bw = (width + 7) // 8 * 8
    bh = (height + 7) // 8 * 8
    img = np.pad(img, ((0, bh - height), (0, bw - width)), mode="edge")

    writer = _BitWriter()
    prev_dc = 0
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            block = img[by : by + 8, bx : bx + 8] - 128.0
            coef = _C @ block @ _C.T
            zq = np.floor(coef / q + 0.5).astype(np.int64)
            zz = [int(zq[r, c]) for (r, c) in _ZIGZAG]
            # DC
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            size = _bits_needed(diff)
            code, length = _DC_ENC[size]
            writer.put(code, length)
            if size:
                writer.put(_amplitude(diff, size), size)
            # AC with run-length + ZRL + EOB
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    continue
                while run >= 16:
                    c, ln = _AC_ENC[0xF0]
                    writer.put(c, ln)
                    run -= 16
                size = _bits_needed(zz[i])
                c, ln = _AC_ENC[(run << 4) | size]
                writer.put(c, ln)
                writer.put(_amplitude(zz[i], size), size)
                run = 0
            if last_nz < 63:
                c, ln = _AC_ENC[0x00]
                writer.put(c, ln)
    entropy = writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (table 0, 8-bit, zigzag order)
    qz = bytes(int(q[r, c]) for (r, c) in _ZIGZAG)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qz
    # SOF0: 8-bit precision, 1 component, sampling 1x1, quant table 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    out += bytes((1, 0x11, 0))
    # DHT: DC class0/id0 then AC class1/id0
    dc_body = bytes([0x00] + _DC_COUNTS) + bytes(_DC_SYMBOLS)
    ac_body = bytes([0x10] + _AC_COUNTS) + bytes(_AC_SYMBOLS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dc_body)) + dc_body
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(ac_body)) + ac_body
    # SOS: 1 component, DC table 0 / AC table 0, full spectral range
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes((1, 0x00, 0, 63, 0))
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over the entropy segment; un-stuffs 0xFF 0x00."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:  # a real marker terminates entropy data
                    raise ValueError("hit marker inside entropy segment")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _decode_table(counts: list[int], symbols: list[int]):
    """DHT -> prefix map {(length, code): symbol} for bit-serial decode."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: recover signed amplitude from size bits."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> dict:
    """Parse a grayscale sequential-baseline JPEG using the tables FROM THE
    STREAM -> {"width", "height", "pixels" (bytes, row-major)}."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    width = height = 0
    scan_pos = -1
    dc_id = ac_id = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", data, pos)[0]
        body = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise ValueError("unsupported: 16-bit quant table")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for i, (r, c) in enumerate(_ZIGZAG):
                    tbl[r, c] = body[b + 1 + i]
                quant[tq] = tbl
                b += 65
        elif marker == 0xC0:  # SOF0 baseline
            _prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if ncomp != 1:
                raise ValueError("unsupported: multi-component JPEG")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("unsupported: non-baseline SOF")
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                counts = list(body[b + 1 : b + 17])
                n = sum(counts)
                symbols = list(body[b + 17 : b + 17 + n])
                huff[(tc, th)] = _decode_table(counts, symbols)
                b += 17 + n
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != 1:
                raise ValueError("unsupported: multi-component scan")
            dc_id, ac_id = body[2] >> 4, body[2] & 0x0F
            scan_pos = pos + seg_len
            break
        pos += seg_len
    if scan_pos < 0 or not width:
        raise ValueError("missing SOS/SOF0")

    q = quant[0]
    dc_table = huff[(0, dc_id)]
    ac_table = huff[(1, ac_id)]
    bw = (width + 7) // 8 * 8
    bh = (height + 7) // 8 * 8
    img = np.zeros((bh, bw), dtype=np.float64)
    reader = _BitReader(data, scan_pos)
    prev_dc = 0
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            zz = [0] * 64
            size = _read_symbol(reader, dc_table)
            diff = _extend(reader.bits(size), size) if size else 0
            prev_dc += diff
            zz[0] = prev_dc
            i = 1
            while i < 64:
                sym = _read_symbol(reader, ac_table)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    i += 16
                    continue
                run, size = sym >> 4, sym & 0x0F
                i += run
                if i > 63:
                    raise ValueError("AC index overflow")
                zz[i] = _extend(reader.bits(size), size)
                i += 1
            coef = np.zeros((8, 8), dtype=np.float64)
            for idx, (r, c) in enumerate(_ZIGZAG):
                coef[r, c] = zz[idx] * q[r, c]
            img[by : by + 8, bx : bx + 8] = _C.T @ coef @ _C + 128.0
    px = np.clip(np.floor(img + 0.5), 0, 255).astype(np.uint8)
    return {
        "width": width,
        "height": height,
        "pixels": px[:height, :width].tobytes(),
    }


def reference_recon(width: int, height: int, pixels: bytes, quant: np.ndarray | None = None) -> bytes:
    """The mathematical reconstruction dequant(quant(DCT(img))) with the
    SAME float ops as encode+decode — the exact-equality test target."""
    q = STD_LUMA_QUANT if quant is None else np.asarray(quant, dtype=np.int32)
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width).astype(np.float64)
    bw = (width + 7) // 8 * 8
    bh = (height + 7) // 8 * 8
    img = np.pad(img, ((0, bh - height), (0, bw - width)), mode="edge")
    out = np.zeros_like(img)
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            block = img[by : by + 8, bx : bx + 8] - 128.0
            zq = np.floor((_C @ block @ _C.T) / q + 0.5)
            out[by : by + 8, bx : bx + 8] = _C.T @ (zq * q) @ _C + 128.0
    px = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    return px[:height, :width].tobytes()


def jpeg_features(data: bytes) -> dict:
    """Decode + grayscale feature extraction for the multimodal query."""
    img = decode_jpeg(data)
    arr = np.frombuffer(img["pixels"], dtype=np.uint8)
    return {
        "width": img["width"],
        "height": img["height"],
        "n_pixels": arr.size,
        "mean_intensity": float(arr.mean()) if arr.size else float("nan"),
        "min_intensity": int(arr.min()) if arr.size else -1,
        "max_intensity": int(arr.max()) if arr.size else -1,
    }
