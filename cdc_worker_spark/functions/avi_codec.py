"""MJPEG-in-AVI codec (stdlib + the repo's own JPEG decoder) — real
COMPRESSED-VIDEO decode for the multimodal path.

Y4M covered raw planar video frames; this closes the compressed-video
seam for the intra-frame family: Motion JPEG stores every frame as an
independent baseline JPEG inside an AVI RIFF container, so the decode is
container demux (RIFF chunk walk, public 'AVI RIFF File Reference' /
msdn AVIMAINHEADER-AVISTREAMHEADER-BITMAPINFOHEADER layout) + the
already-proven per-frame transform decode (functions/jpeg_codec.py,
ITU T.81 baseline). What genuinely remains out of scope after this is
INTER-frame prediction (H.264/VP9-class motion compensation), which
needs entropy/DSP machinery no stdlib provides.

Demuxer generality: the parser walks the RIFF tree from the stream — it
takes geometry from the stream headers ('strf' BITMAPINFOHEADER, falling
back to 'avih'), collects every '##dc'/'##db' chunk of the FIRST video
stream in 'movi' order (including inside 'rec ' groups), tolerates a
missing 'idx1' (index is optional per spec), and honors the word
alignment rule (chunks pad to even byte boundaries). So it reads
MJPEG-AVIs produced elsewhere, not just its own muxer's.

The muxer exists for fixtures and tests; production ingest demuxes AVIs
produced elsewhere. Reference analogue: per-event payload decode
(eventParser.js:13) — here per-media-payload, one level deeper (payload
-> container -> frames).
"""

from __future__ import annotations

import struct

from cdc_worker_spark.functions.jpeg_codec import decode_jpeg


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """One RIFF chunk: fourcc + LE u32 size + payload + even-byte pad."""
    if len(fourcc) != 4:
        raise ValueError("fourcc must be 4 bytes")
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_mjpeg_avi(
    width: int,
    height: int,
    frames: list[bytes],
    fps: int = 10,
) -> bytes:
    """Mux pre-encoded JPEG frames into a minimal spec-shaped MJPEG AVI:
    RIFF('AVI ' LIST(hdrl avih LIST(strl strh strf)) LIST(movi 00dc*)
    idx1). Every size field is real; players and the demuxer below agree
    on the layout."""
    if not frames:
        raise ValueError("an AVI needs at least one frame")
    usec_per_frame = 1_000_000 // fps
    max_bytes = max(len(f) for f in frames)
    # AVIMAINHEADER (56 bytes after the fourcc/size header)
    avih = struct.pack(
        "<10I4I",
        usec_per_frame,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags = AVIF_HASINDEX
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved[4]
    )
    # AVISTREAMHEADER for the single 'vids' stream
    strh = struct.pack(
        "<4s4sI2H8I4h",
        b"vids",
        b"MJPG",
        0,  # dwFlags
        0, 0,  # wPriority, wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate (rate/scale = fps)
        0,  # dwStart
        len(frames),  # dwLength (in frames)
        max_bytes,  # dwSuggestedBufferSize
        0xFFFFFFFF,  # dwQuality (-1 = default)
        0,  # dwSampleSize (0: vary per frame)
        0, 0, width, height,  # rcFrame
    )
    # BITMAPINFOHEADER, biCompression='MJPG'
    strf = struct.pack(
        "<I2i2H4s5i",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount (decoded depth; grayscale JPEG expands)
        b"MJPG",
        width * height * 3,  # biSizeImage (nominal)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1: one AVIOLDINDEX entry per frame; offsets are relative to the
    # start of the 'movi' list type fourcc (the common convention)
    idx_entries = []
    off = 4  # past the b"movi" list-type fourcc
    for f in frames:
        idx_entries.append(
            struct.pack("<4sII I", b"00dc", 0x10, off, len(f))
        )  # AVIIF_KEYFRAME
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return _chunk(b"RIFF", riff_payload)


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for sibling chunks in
    [pos, end), honoring the even-byte pad rule."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(
                f"chunk {fourcc!r} at {pos} overruns its parent "
                f"({body + size} > {end})"
            )
        yield fourcc, body, size
        pos = body + size + (size % 2)


def decode_mjpeg_avi(data: bytes) -> dict:
    """Demux an MJPEG AVI and DECODE every frame with the ITU T.81
    baseline decoder -> {"width", "height", "n_frames", "fps",
    "frames": [{"pixels": bytes, "width", "height"}, ...]}.

    Geometry comes from the stream ('strf' BITMAPINFOHEADER of the first
    video stream, 'avih' as fallback) and is cross-checked against every
    decoded frame — a container/frame mismatch is corrupt input, raised
    loudly, never silently truncated."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (no RIFF/'AVI ' signature)")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))

    width = height = 0
    fps = 0
    stream_no = -1  # first 'vids' stream index
    n_streams = 0
    frame_chunks: list[tuple[int, int]] = []

    def scan_hdrl(pos: int, stop: int) -> None:
        nonlocal width, height, fps, stream_no, n_streams
        for fourcc, body, size in _walk_chunks(data, pos, stop):
            if fourcc == b"avih" and size >= 40:
                vals = struct.unpack_from("<10I", data, body)
                if not width:
                    width, height = vals[8], vals[9]
                if not fps and vals[0]:
                    fps = round(1_000_000 / vals[0])
            elif fourcc == b"LIST" and data[body : body + 4] == b"strl":
                this_stream = n_streams
                n_streams += 1
                is_vids = False
                for c2, b2, s2 in _walk_chunks(data, body + 4, body + size):
                    if c2 == b"strh" and s2 >= 8:
                        if data[b2 : b2 + 4] == b"vids":
                            is_vids = True
                    elif (
                        c2 == b"strf"
                        and s2 >= 12
                        and is_vids
                        # geometry must come from the stream we will DEMUX
                        # (the first vids stream) — a later vids stream with
                        # different dimensions is simply not selected, it
                        # must not overwrite the selected stream's geometry
                        # (ADVICE r11)
                        and stream_no < 0
                    ):
                        bi_w, bi_h = struct.unpack_from("<ii", data, b2 + 4)
                        width, height = abs(bi_w), abs(bi_h)
                if is_vids and stream_no < 0:
                    stream_no = this_stream

    def scan_movi(pos: int, stop: int) -> None:
        for fourcc, body, size in _walk_chunks(data, pos, stop):
            if fourcc == b"LIST" and data[body : body + 4] == b"rec ":
                scan_movi(body + 4, body + size)
            elif (
                len(fourcc) == 4
                and fourcc[:2].isdigit()
                and fourcc[2:] in (b"dc", b"db")
                and int(fourcc[:2]) == max(stream_no, 0)
            ):
                frame_chunks.append((body, size))

    for fourcc, body, size in _walk_chunks(data, 12, end):
        if fourcc == b"LIST":
            ltype = data[body : body + 4]
            if ltype == b"hdrl":
                scan_hdrl(body + 4, body + size)
            elif ltype == b"movi":
                scan_movi(body + 4, body + size)

    if not frame_chunks:
        raise ValueError("no video frame chunks in 'movi'")
    frames = []
    for body, size in frame_chunks:
        img = decode_jpeg(data[body : body + size])
        if width and (img["width"], img["height"]) != (width, height):
            raise ValueError(
                f"frame geometry {img['width']}x{img['height']} != "
                f"container {width}x{height}"
            )
        frames.append(img)
    return {
        "width": width or frames[0]["width"],
        "height": height or frames[0]["height"],
        "n_frames": len(frames),
        "fps": fps,
        "frames": frames,
    }


def mjpeg_features(data: bytes) -> dict:
    """Demux + decode + per-clip grayscale statistics for the multimodal
    query: geometry, frame count, and intensity stats pooled over every
    pixel of every frame."""
    import numpy as np

    clip = decode_mjpeg_avi(data)
    arr = np.concatenate(
        [np.frombuffer(f["pixels"], dtype=np.uint8) for f in clip["frames"]]
    )
    return {
        "width": clip["width"],
        "height": clip["height"],
        "n_frames": clip["n_frames"],
        "n_pixels": int(arr.size),
        "mean_intensity": float(arr.mean()),
        "min_intensity": int(arr.min()),
        "max_intensity": int(arr.max()),
    }
