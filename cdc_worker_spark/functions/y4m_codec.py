"""Pure-stdlib Y4M (YUV4MPEG2) codec — real video decode for the multimodal
path, completing the image (png_codec) / audio (wav_codec) / video trio.

YUV4MPEG2 is the standard uncompressed video interchange format of the
mplayer/ffmpeg toolchain and is public and trivially parseable: one ASCII
stream header (``YUV4MPEG2 W<w> H<h> F<num>:<den> ... C<colorspace>``),
then per frame an ASCII ``FRAME`` marker followed by raw YUV planes. So a
real video container decode — frame count, geometry, frame rate, per-frame
luma statistics — needs no ffmpeg. Compressed video (H.264/VP9/…) remains
behind the documented NotImplementedError seam.

Supported colorspaces: ``Cmono`` (luma only) and ``C420`` (+ two half-res
chroma planes). Anything else raises ValueError.
"""

from __future__ import annotations

_MAGIC = b"YUV4MPEG2"


def _frame_bytes(width: int, height: int, colorspace: str) -> int:
    luma = width * height
    if colorspace == "Cmono":
        return luma
    if colorspace == "C420":
        return luma + 2 * ((width // 2) * (height // 2))
    raise ValueError(f"unsupported colorspace {colorspace}")


def encode_y4m(
    frames: list[bytes],
    width: int,
    height: int,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "Cmono",
) -> bytes:
    """Encode raw planar frames as a Y4M stream (fixtures + round-trip
    tests). Each frame must be exactly the plane size for the geometry."""
    size = _frame_bytes(width, height, colorspace)
    head = f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n"
    out = bytearray(head.encode("ascii"))
    for f in frames:
        if len(f) != size:
            raise ValueError(f"frame size {len(f)} != expected {size}")
        out += b"FRAME\n" + f
    return bytes(out)


def decode_y4m(data: bytes) -> dict:
    """Decode a Y4M stream: parse the stream header, then split frames.
    Returns ``{width, height, fps_num, fps_den, colorspace, n_frames,
    frames}`` (frames = raw plane bytes). Raises ValueError on malformed
    input, unknown parameters, or short frames."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(_MAGIC + b" "):
        raise ValueError("not a Y4M stream: bad magic")
    width = height = None
    fps_num, fps_den = 25, 1
    colorspace = "C420"  # spec default when no C tag
    for tok in data[len(_MAGIC) + 1 : nl].decode("ascii", "strict").split():
        if tok[0] == "W":
            width = int(tok[1:])
        elif tok[0] == "H":
            height = int(tok[1:])
        elif tok[0] == "F":
            num, den = tok[1:].split(":")
            fps_num, fps_den = int(num), int(den)
            if fps_num <= 0 or fps_den <= 0:
                raise ValueError("bad frame rate")
        elif tok[0] == "C":
            colorspace = tok
        elif tok[0] in ("I", "A", "X"):
            pass  # interlace / aspect / extension tags carry no plane layout
        else:
            raise ValueError(f"unknown header token {tok!r}")
    if not width or not height:
        raise ValueError("missing geometry in stream header")
    size = _frame_bytes(width, height, colorspace)
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("bad FRAME marker")
        body = data[fnl + 1 : fnl + 1 + size]
        if len(body) != size:
            raise ValueError("truncated frame")
        frames.append(body)
        pos = fnl + 1 + size
    return {
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": colorspace,
        "n_frames": len(frames),
        "frames": frames,
    }


def y4m_features(data: bytes) -> dict:
    """Decode + the cheap per-clip features a video pipeline extracts:
    geometry, frame count, duration, and luma statistics over all frames
    (mean as exact int-sum/n, peak as exact int)."""
    clip = decode_y4m(data)
    luma_px = clip["width"] * clip["height"]
    total = 0
    peak = 0
    for f in clip["frames"]:
        luma = f[:luma_px]  # chroma planes excluded from luma stats
        total += sum(luma)
        peak = max(peak, max(luma) if luma else 0)
    n = luma_px * clip["n_frames"]
    return {
        "width": clip["width"],
        "height": clip["height"],
        "n_frames": clip["n_frames"],
        "duration_ms": clip["n_frames"] * 1000 * clip["fps_den"] // clip["fps_num"],
        "mean_luma": (total / n) if n else 0.0,
        "peak_luma": peak,
    }
