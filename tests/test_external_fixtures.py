"""Golden fixtures produced OUTSIDE this repo's encoders.

Every other codec test validates decoders against encoders written in the
same modules — a shared misreading of a spec would round-trip cleanly and
still fail on externally produced streams.  These fixtures are canonical
byte strings published all over the public web (tracking-pixel data URIs),
produced by mainstream encoders years before this repo existed, so they
exercise the decoders against bytes our encoders never touched:

* a 1x1 RGBA PNG (the ubiquitous "transparent pixel"), which happens to use
  scanline filter 1 (Sub) and a 32-bit pixel — neither of which our
  ``png_encode`` ever emits (it writes filter 0 only);
* the classic 35-byte 1x1 GIF89a (2-entry palette, graphic-control
  extension, LZW-coded single index) — our ``gif_encode_gray`` emits
  256-entry palettes and no extensions, so the parse path differs too.

For the PNG the test also re-derives the pixel through an independent
in-test parse (struct + zlib only, no imaging code) and cross-checks the
module decoder against it, plus verifies every chunk CRC — integrity
evidence that the fixture bytes are the well-formed external stream, not a
typo.
"""

import base64
import binascii
import struct
import zlib

from frappe_data_pipelines_spark.operators import imaging, multimodal

# Canonical public tracking-pixel data-URI payloads (verbatim).
EXTERNAL_PNG_1PX = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAC"
    "hwGA60e6kgAAAABJRU5ErkJggg=="
)
EXTERNAL_GIF_1PX = base64.b64decode(
    "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
)


def _parse_png_independent(payload: bytes):
    """Spec-literal PNG parse using only struct/zlib — no imaging.py code."""
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        assert binascii.crc32(ctype + data) & 0xFFFFFFFF == crc, ctype
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        pos += 12 + length
    return ihdr, zlib.decompress(bytes(idat))


class TestExternalPng:
    def test_chunk_crcs_and_header(self):
        ihdr, raw = _parse_png_independent(EXTERNAL_PNG_1PX)
        # 1x1, bit depth 8, color type 6 (RGBA), non-interlaced.
        assert ihdr == (1, 1, 8, 6, 0, 0, 0)
        # One scanline: filter byte 1 (Sub) + 4 pixel bytes.  With no left
        # neighbour Sub is the identity, so the pixel is read verbatim.
        assert raw == bytes([1, 0x00, 0x00, 0xFF, 0x7F])

    def test_module_decoder_matches_independent_parse(self):
        width, height, channels, rows = imaging.png_decode(EXTERNAL_PNG_1PX)
        assert (width, height, channels) == (1, 1, 4)
        # The famous pixel: half-transparent pure blue.
        assert rows == [bytes([0, 0, 255, 127])]
        # Cross-check against the spec-literal parse above.
        _, raw = _parse_png_independent(EXTERNAL_PNG_1PX)
        assert rows[0] == raw[1:]

    def test_multimodal_meta_on_external_bytes(self):
        width, height, n_frames, caption = multimodal._real_decode(EXTERNAL_PNG_1PX)
        assert (width, height, n_frames) == (1, 1, 1)
        assert caption == "image/png 1x1 rgba"


class TestExternalGif:
    def test_header_walk(self):
        assert EXTERNAL_GIF_1PX[:6] == b"GIF89a"
        width, height, frames = imaging.gif_meta(EXTERNAL_GIF_1PX)
        assert (width, height, frames) == (1, 1, 1)

    def test_lzw_pixel(self):
        width, height, rows = imaging.gif_decode_first_frame(EXTERNAL_GIF_1PX)
        assert (width, height) == (1, 1)
        # Palette entry 0 is black; the LZW stream codes exactly one index 0.
        assert rows == [b"\x00"]

    def test_multimodal_meta_on_external_bytes(self):
        width, height, n_frames, caption = multimodal._real_decode(EXTERNAL_GIF_1PX)
        assert (width, height, n_frames) == (1, 1, 1)
        assert caption == "image/gif 1x1 1 frame(s)"
