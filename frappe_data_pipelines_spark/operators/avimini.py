"""Minimal AVI (RIFF) container codec for MJPEG streams — stdlib-only.

Video in a data pipeline is three separable problems: the CONTAINER walk
(RIFF chunks → stream headers + frame payloads), the per-frame IMAGE codec
(here MJPEG = baseline JPEG, ``operators/jpegmini``), and frame-level
sampling/featurization (``operators/multimodal``). This module does the
container half for the most self-describing legacy format: 'RIFF..AVI '
with an 'hdrl' header list (avih + one 'vids' stream) and a 'movi' list of
'00dc' compressed-frame chunks.

Reference: no counterpart (the reference routes only image files,
text_extraction.py:13-27); part of the beyond-reference multimodal surface.
Writer and parser are twins so fixtures need no external muxer; the parser
is TOTAL — malformed bytes raise ``AviError``, never an IndexError — and
validates the header's declared geometry against itself.
"""

from __future__ import annotations

import struct


class AviError(ValueError):
    pass


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def avi_write(
    frames: list[bytes], width: int, height: int, fps: int = 10,
    codec: bytes = b"MJPG",
) -> bytes:
    """Frame payloads → minimal AVI bytes. ``codec=b"MJPG"`` (default)
    wraps JPEG payloads; ``codec=b"DIB "`` wraps uncompressed bottom-up
    24-bit BGR frames (the classic Video-for-Windows raw profile) — the
    lossless tier that lets a SQL oracle reproduce decoded pixels
    exactly (MJPEG's DCT quantization cannot round-trip closed-form)."""
    if not frames or fps <= 0:
        raise AviError("avi_write needs >= 1 frame and a positive fps")
    if codec not in (b"MJPG", b"DIB "):
        raise AviError(f"unsupported codec fourcc: {codec!r}")
    n = len(frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0, 0, 0,
        n,                 # dwTotalFrames
        0,
        1,                 # dwStreams
        0,
        width, height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + codec
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    # BITMAPINFOHEADER biCompression: the codec fourcc for MJPG, BI_RGB(0)
    # for raw DIB frames
    bi_comp = b"MJPG" if codec == b"MJPG" else b"\x00\x00\x00\x00"
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, bi_comp, width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) over a chunk range."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = pos + 8
        if payload + size > end:
            raise AviError("chunk size exceeds its container")
        yield fourcc, payload, size
        pos = payload + size + (size % 2)


def avi_parse(payload: bytes) -> dict:
    """AVI bytes → {width, height, fps, n_frames_declared, frames} with the
    '00dc' JPEG payloads in stream order."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI container")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(8 + riff_size, len(payload))
    meta: dict = {}
    frames: list[bytes] = []
    codec_holder: list[bytes] = []
    for fourcc, p, size in _walk(payload, 12, end):
        if fourcc != b"LIST" or size < 4:
            continue
        list_type = payload[p : p + 4]
        if list_type == b"hdrl":
            for cc2, p2, s2 in _walk(payload, p + 4, p + size):
                if cc2 == b"avih":
                    if s2 < 56:
                        raise AviError("truncated avih header")
                    vals = struct.unpack_from("<14I", payload, p2)
                    if vals[0] == 0:
                        raise AviError("zero frame period")
                    meta = {
                        "fps": round(1_000_000 / vals[0]),
                        "n_frames_declared": vals[4],
                        "width": vals[8],
                        "height": vals[9],
                    }
                elif cc2 == b"LIST" and payload[p2 : p2 + 4] == b"strl":
                    # strh lives one level down, inside the strl LIST
                    for cc3, p3, s3 in _walk(payload, p2 + 4, p2 + s2):
                        if cc3 == b"strh" and s3 >= 8:
                            codec_holder.append(payload[p3 + 4 : p3 + 8])
        elif list_type == b"movi":
            for cc2, p2, s2 in _walk(payload, p + 4, p + size):
                if cc2 == b"00dc":
                    frames.append(payload[p2 : p2 + s2])
    if not meta:
        raise AviError("missing avih header")
    if meta["width"] <= 0 or meta["height"] <= 0:
        raise AviError("non-positive frame geometry")
    meta["frames"] = frames
    meta["codec"] = (codec_holder[0] if codec_holder else b"MJPG").decode(
        "latin-1"
    ).strip()
    return meta


# -- raw DIB (BI_RGB 24-bit) frame payloads ----------------------------------

def _dib_stride(width: int) -> int:
    return (width * 3 + 3) // 4 * 4


def dib_encode_gray(rows: list[bytes]) -> bytes:
    """Grayscale scanlines (top-down) → one 24-bit BI_RGB frame payload:
    bottom-up row order, B=G=R=v, rows padded to 4-byte stride (the
    Video-for-Windows DIB rules)."""
    if not rows:
        raise AviError("dib_encode_gray needs >= 1 row")
    width = len(rows[0])
    pad = b"\x00" * (_dib_stride(width) - width * 3)
    out = []
    for row in reversed(rows):
        if len(row) != width:
            raise AviError("ragged scanlines")
        out.append(b"".join(bytes((v, v, v)) for v in row) + pad)
    return b"".join(out)


def dib_decode_gray(payload: bytes, width: int, height: int) -> list[bytes]:
    """One BI_RGB 24-bit frame payload → top-down grayscale scanlines
    (takes the blue channel; writer emits B=G=R)."""
    stride = _dib_stride(width)
    if len(payload) < stride * height:
        raise AviError("DIB frame shorter than geometry requires")
    rows = []
    for y in range(height - 1, -1, -1):
        base = y * stride
        rows.append(bytes(payload[base + 3 * x] for x in range(width)))
    return rows
