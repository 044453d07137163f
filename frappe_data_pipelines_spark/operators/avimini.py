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


def avi_write(frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """JPEG frame payloads → minimal MJPEG AVI bytes."""
    if not frames or fps <= 0:
        raise AviError("avi_write needs >= 1 frame and a positive fps")
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
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
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
        elif list_type == b"movi":
            for cc2, p2, s2 in _walk(payload, p + 4, p + size):
                if cc2 == b"00dc":
                    frames.append(payload[p2 : p2 + s2])
    if not meta:
        raise AviError("missing avih header")
    if meta["width"] <= 0 or meta["height"] <= 0:
        raise AviError("non-positive frame geometry")
    meta["frames"] = frames
    return meta
