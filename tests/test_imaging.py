"""Imaging kernels: PNG codec, GIF/JPEG metadata, bitmap-font OCR
(SURVEY §2.A A8/A9, §1.2 OCRResult; reference ocr_service.py:81-187).

Golden-fixture tests pin the checked-in bytes in resources/fixtures so a
renderer or kernel drift breaks loudly."""

from __future__ import annotations

import os
import zlib

import pytest

from frappe_data_pipelines_spark.operators.imaging import (
    FONT_5X7,
    gif_meta,
    jpeg_meta,
    ocr_bitmap,
    png_decode,
    png_encode,
    render_text_png,
)

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "frappe_data_pipelines_spark", "resources", "fixtures",
)

OCR_FIXTURE_TEXT = "INVOICE 2026-08\nTOTAL DUE: 1,234.56\nPAY BY: 2026-09-01"


def _fixture(name: str) -> bytes:
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


# ------------------------------------------------------------------ PNG codec


def test_png_roundtrip_gray_rgb_rgba():
    gray = [bytes([10, 200, 30]), bytes([0, 128, 255])]
    rgb = [bytes(range(9)), bytes(range(9, 18))]
    rgba = [bytes(range(8)), bytes(range(8, 16))]
    for rows, ctype, ch in ((gray, 0, 1), (rgb, 2, 3), (rgba, 6, 4)):
        w, h, channels, got = png_decode(png_encode(rows, color_type=ctype))
        assert (w, h, channels) == (len(rows[0]) // ch, 2, ch)
        assert got == rows


def test_png_decode_all_filter_types():
    """Hand-filter scanlines with every predictor (Sub/Up/Average/Paeth) and
    check the decoder reconstructs the original pixels."""
    import struct
    from binascii import crc32

    width, channels = 6, 1
    pixels = [bytes([5, 9, 14, 20, 27, 35]), bytes([40, 44, 50, 57, 65, 74]),
              bytes([80, 84, 90, 97, 105, 114]), bytes([3, 1, 4, 1, 5, 9]),
              bytes([200, 180, 160, 140, 120, 100])]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    filtered = bytearray()
    prev = bytes(width)
    for y, (filt, row) in enumerate(zip([0, 1, 2, 3, 4], pixels)):
        filtered.append(filt)
        for i, x in enumerate(row):
            a = row[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if filt == 0:
                filtered.append(x)
            elif filt == 1:
                filtered.append((x - a) & 0xFF)
            elif filt == 2:
                filtered.append((x - b) & 0xFF)
            elif filt == 3:
                filtered.append((x - ((a + b) >> 1)) & 0xFF)
            else:
                filtered.append((x - paeth(a, b, c)) & 0xFF)
        prev = row

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", width, 5, 8, 0, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(filtered)))
               + chunk(b"IEND", b""))
    w, h, ch, rows = png_decode(payload)
    assert (w, h, ch) == (6, 5, 1)
    assert rows == pixels


def test_png_decode_rejects_non_png_and_bad_depth():
    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"JUNKJUNKJUNK")
    # 16-bit depth is out of scope and must fail loudly, not mis-decode
    import struct
    from binascii import crc32

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF))

    bad = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)))
    with pytest.raises(ValueError, match="unsupported"):
        png_decode(bad)


def test_hostile_headers_raise_before_allocation():
    """Every raster decoder must reject absurd declared geometry (and PNG a
    zip-bombed IDAT) with a ValueError — dead-letter fuel — rather than
    allocating planes or inflating unbounded streams (the jbig2/jp2/jpeg
    _MAX_PIXELS convention, applied across the whole decoder family)."""
    import struct
    from binascii import crc32

    from frappe_data_pipelines_spark.operators.imaging import (
        bmp_decode,
        gif_decode_first_frame,
        tiff_decode_gray,
    )
    from frappe_data_pipelines_spark.operators.jpegmini import (
        JpegError,
        jpeg_decode_gray,
    )

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF))

    # PNG: 2^31-ish dims
    huge_png = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 0, 0, 0, 0)))
    with pytest.raises(ValueError, match="pixel cap"):
        png_decode(huge_png)
    # PNG: sane dims, zip-bombed IDAT (decompresses far past the geometry)
    bomb = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00" * (1 << 22)))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="length mismatch"):
        png_decode(bomb)

    # BMP: huge declared dims over a tiny payload
    bmp = bytearray(b"BM" + b"\x00" * 60)
    struct.pack_into("<I", bmp, 10, 54)
    struct.pack_into("<I", bmp, 14, 40)
    struct.pack_into("<ii", bmp, 18, 1 << 20, 1 << 20)
    struct.pack_into("<H", bmp, 28, 24)
    with pytest.raises(ValueError, match="pixel cap"):
        bmp_decode(bytes(bmp))

    # GIF: huge frame geometry
    gif = (b"GIF89a" + struct.pack("<HH", 8, 8) + bytes([0x80, 0, 0])
           + b"\x00" * 6  # 2-entry global color table
           + b"\x2c" + struct.pack("<HHHH", 0, 0, 0xFFFF, 0xFFFF) + b"\x00")
    with pytest.raises(ValueError, match="pixel cap"):
        gif_decode_first_frame(gif)

    # TIFF: huge dims in the IFD
    def tiff_with(w, h):
        out = bytearray(b"II\x2a\x00" + (8).to_bytes(4, "little"))
        entries = [(256, 3, 1, w), (257, 3, 1, h)]
        out += struct.pack("<H", len(entries))
        for tag, typ, count, val in entries:
            out += struct.pack("<HHI", tag, typ, count)
            out += struct.pack("<HH", val, 0)
        out += b"\x00\x00\x00\x00"
        return bytes(out)

    with pytest.raises(ValueError, match="pixel cap"):
        tiff_decode_gray(tiff_with(0xFFFF, 0xFFFF))

    # JPEG: 65535x65535 SOF0 — legal fields, absurd product
    jpg = (b"\xff\xd8"
           + b"\xff\xc0" + struct.pack(">H", 11)
           + bytes([8]) + struct.pack(">HH", 0xFFFF, 0xFFFF)
           + bytes([1, 1, 0x11, 0]))
    with pytest.raises(JpegError, match="pixel cap"):
        jpeg_decode_gray(jpg)

    # CCITT fax: hostile /Columns allocates the reference line up front
    from frappe_data_pipelines_spark.operators.faxmini import (
        FaxError,
        g3_1d_decode,
        g4_decode,
    )

    with pytest.raises(FaxError, match="pixel cap"):
        g4_decode(b"\x00\x01", 1 << 30, 8)
    with pytest.raises(FaxError, match="pixel cap"):
        g3_1d_decode(b"\x00\x01", 1 << 20, 1 << 20)


# ------------------------------------------------------------- GIF/JPEG meta


def test_gif_meta_frames_and_jpeg_sof():
    assert gif_meta(_fixture("sample.gif")) == (4, 3, 3)
    assert jpeg_meta(_fixture("sample.jpg")) == (240, 180)
    with pytest.raises(ValueError):
        gif_meta(b"notagif")
    with pytest.raises(ValueError):
        jpeg_meta(b"\x00\x00")


# ------------------------------------------------------------------ OCR core


def test_ocr_roundtrip_full_charset():
    """Every glyph in the font must survive render → OCR exactly, in one
    multi-line page (segmentation + matching, not just per-glyph)."""
    charset = "".join(sorted(FONT_5X7))
    text = "\n".join(charset[i:i + 14] for i in range(0, len(charset), 14))
    res = ocr_bitmap(render_text_png(text))
    assert res["text"] == text
    assert res["confidence"] == 1.0


def test_ocr_spaces_lines_and_bboxes():
    res = ocr_bitmap(render_text_png("AB CD\nX"))
    assert res["text"] == "AB CD\nX"
    assert len(res["bounding_boxes"]) == 2
    b0, b1 = res["bounding_boxes"]
    assert b0["text"] == "AB CD" and b1["text"] == "X"
    # 4-corner boxes, reading order top→bottom, second line strictly below
    assert len(b0["bbox"]) == 4
    assert b1["bbox"][0][1] > b0["bbox"][2][1] - 1
    assert res["detected_languages"] == ["en"]


def test_ocr_noise_tolerance_and_low_confidence():
    png = render_text_png("NOISY TEXT 123")
    w, h, ch, rows = png_decode(png)
    grid = [bytearray(r) for r in rows]
    # flips chosen inside multi-pixel column runs so projection segmentation
    # is unaffected (a flip that blanks a glyph's only-ink column genuinely
    # splits the glyph — real OCR degrades the same way on broken strokes)
    grid[3][2] ^= 0xFF
    grid[5][8] ^= 0xFF
    res = ocr_bitmap(png_encode([bytes(r) for r in grid]))
    assert res["text"] == "NOISY TEXT 123"  # argmax survives small noise
    assert 0.9 < res["confidence"] < 1.0
    # heavy corruption of one glyph → '?' placeholder, not invented text
    png2 = render_text_png("AB")
    w2, h2, _, rows2 = png_decode(png2)
    grid2 = [bytearray(r) for r in rows2]
    for y in range(2, 9):
        for x in range(2, 7):
            grid2[y][x] = 0 if (x * 31 + y * 17) % 3 else 255
    res2 = ocr_bitmap(png_encode([bytes(r) for r in grid2]), min_confidence=0.93)
    assert res2["text"].endswith("B")
    assert res2["text"][0] == "?"


def test_ocr_inverted_page():
    """White-on-black renders binarize the other way: the dark background
    becomes one giant unrecognizable segment. The kernel must answer with
    low-confidence placeholders ('?'), never invented text."""
    res = ocr_bitmap(render_text_png("ABC", invert=True))
    assert not any(c.isalnum() for c in res["text"])
    assert res["confidence"] < 0.55
    assert res["detected_languages"] == ["unknown"]


# ----------------------------------------------------------- golden fixtures


def test_golden_fixture_ocr_and_meta():
    res = ocr_bitmap(_fixture("sample_ocr.png"))
    assert res["text"] == OCR_FIXTURE_TEXT
    assert res["confidence"] == 1.0
    assert [b["text"] for b in res["bounding_boxes"]] == OCR_FIXTURE_TEXT.split("\n")
    # RGB variant decodes through the truecolor path to identical text
    res_rgb = ocr_bitmap(_fixture("sample_ocr_rgb.png"))
    assert res_rgb["text"] == OCR_FIXTURE_TEXT
    # renderer is deterministic: regenerating the fixture reproduces bytes
    assert render_text_png(OCR_FIXTURE_TEXT) == _fixture("sample_ocr.png")


# -------------------------------------------------------------- Spark surface


def test_ocr_images_operator_with_fallback(spark):
    """A8 struct operator over a mixed batch: a real bitmap row yields the
    full OCRResult struct; an undecodable payload yields the A9 fallback
    (stub text, conf 0.5, no boxes) instead of failing the batch."""
    from frappe_data_pipelines_spark.operators.extraction import ocr_images

    rows = [
        ("/img/good.png", bytearray(_fixture("sample_ocr.png"))),
        ("/img/junk.png", bytearray(b"\x00\x01garbage")),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    got = {r.path: r for r in ocr_images(df).collect()}
    good = got["/img/good.png"]
    assert good.text == OCR_FIXTURE_TEXT and good.confidence == 1.0
    assert good.detected_languages == ["en"]
    assert [b.text for b in good.bounding_boxes] == OCR_FIXTURE_TEXT.split("\n")
    assert all(len(b.bbox) == 4 and len(b.bbox[0]) == 2 for b in good.bounding_boxes)
    junk = got["/img/junk.png"]
    assert junk.text.startswith("[ocr:") and junk.confidence == 0.5
    assert junk.bounding_boxes == []


def test_extract_text_real_kernel_dispatch_ocr(spark):
    """A2 dispatch with real_kernels: png payloads run the bitmap OCR
    (method ocr-bitmap); the stub stays reachable only as fallback."""
    from frappe_data_pipelines_spark.operators.extraction import extract_text

    rows = [
        ("/img/page.png", bytearray(render_text_png("HELLO 42"))),
        ("/img/junk.png", bytearray(b"notapng")),
    ]
    df = spark.createDataFrame(rows, "path string, content binary")
    got = {r.path: r for r in extract_text(df, real_kernels=True).collect()}
    assert got["/img/page.png"].text == "HELLO 42"
    assert got["/img/page.png"].method == "ocr-bitmap"
    assert got["/img/page.png"].confidence == 1.0
    assert got["/img/junk.png"].method == "ocr-stub"


def test_decode_media_meta_real(spark):
    """A7/J3 real decode path: PNG/GIF/JPEG metadata from actual headers,
    graceful fake fallback for undecodable bytes."""
    from frappe_data_pipelines_spark.operators.multimodal import decode_media_meta

    rows = [
        (1, bytearray(_fixture("sample_ocr.png")), "image/png"),
        (2, bytearray(_fixture("sample.gif")), "image/gif"),
        (3, bytearray(_fixture("sample.jpg")), "image/jpeg"),
        (4, bytearray(b"opaque-blob"), "application/octet-stream"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary, mime string")
    got = {r.doc_id: r for r in decode_media_meta(df, real=True).collect()}
    assert (got[1].width, got[1].height, got[1].n_frames) == (117, 29, 1)
    assert got[1].caption == "image/png 117x29 gray"
    assert (got[2].width, got[2].height, got[2].n_frames) == (4, 3, 3)
    assert (got[3].width, got[3].height) == (240, 180)
    assert got[4].caption.startswith("media:")  # deterministic fake fallback


def test_ocr_bitmap_reads_jpeg():
    """A8 kernel accepts baseline JPEG input (scanner-style): the q90
    fixture twin of sample_ocr.png OCRs to the identical text."""
    res = ocr_bitmap(_fixture("sample_ocr.jpg"))
    assert res["text"] == OCR_FIXTURE_TEXT
    assert res["confidence"] == 1.0


def test_bmp_roundtrip_and_ocr():
    """8-bit BMP round-trips losslessly (bottom-up rows, padding) and OCRs
    identically to the PNG fixture."""
    from frappe_data_pipelines_spark.operators.imaging import (
        bmp_decode,
        bmp_encode_gray,
        png_decode,
    )

    _w, _h, _c, rows = png_decode(_fixture("sample_ocr.png"))
    bmp = bmp_encode_gray(rows)
    w2, h2, rows2 = bmp_decode(bmp)
    assert rows2 == rows and (w2, h2) == (len(rows[0]), len(rows))
    res = ocr_bitmap(bmp)
    assert res["text"] == OCR_FIXTURE_TEXT and res["confidence"] == 1.0


def test_gif_roundtrip_and_ocr():
    """GIF LZW decode (clear-code-per-pixel writer) round-trips losslessly
    and OCRs identically."""
    from frappe_data_pipelines_spark.operators.imaging import (
        gif_decode_first_frame,
        gif_encode_gray,
        png_decode,
    )

    _w, _h, _c, rows = png_decode(_fixture("sample_ocr.png"))
    gif = gif_encode_gray(rows)
    w2, h2, rows2 = gif_decode_first_frame(gif)
    assert rows2 == rows and (w2, h2) == (len(rows[0]), len(rows))
    res = ocr_bitmap(gif)
    assert res["text"] == OCR_FIXTURE_TEXT and res["confidence"] == 1.0


def test_gif_decode_rejects_tableless_fixture():
    """sample.gif is the header-only meta fixture (no color table): the
    pixel decoder must reject it cleanly, not crash — the OCR dispatch
    then falls back to the stub for such payloads."""
    import pytest as _pytest

    from frappe_data_pipelines_spark.operators.imaging import (
        gif_decode_first_frame,
        gif_meta,
    )

    payload = _fixture("sample.gif")
    assert gif_meta(payload) == (4, 3, 3)  # meta walk still works
    with _pytest.raises(ValueError):
        gif_decode_first_frame(payload)


def test_webp_and_tiff_meta():
    """Header-only dims for the remaining reference-dispatch formats."""
    import struct as _struct

    from frappe_data_pipelines_spark.operators.imaging import tiff_meta, webp_meta

    # hand-built VP8L header: signature + 14-bit (w-1), (h-1)
    w, h = 320, 240
    bits = (w - 1) | ((h - 1) << 14)
    vp8l = b"RIFF" + b"\x00" * 4 + b"WEBP" + b"VP8L" + b"\x00" * 4 + b"\x2f" + bits.to_bytes(4, "little")
    assert webp_meta(vp8l) == (w, h)
    # VP8X canvas: 24-bit (w-1), (h-1)
    vp8x = (b"RIFF" + b"\x00" * 4 + b"WEBP" + b"VP8X" + b"\x0a\x00\x00\x00"
            + b"\x00" * 4 + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))
    assert webp_meta(vp8x) == (w, h)
    # little-endian TIFF: IFD with SHORT width/LONG height
    ifd_off = 8
    entries = (
        _struct.pack("<HHIHH", 256, 3, 1, w, 0)
        + _struct.pack("<HHII", 257, 4, 1, h)
    )
    tiff = (b"II\x2a\x00" + ifd_off.to_bytes(4, "little")
            + _struct.pack("<H", 2) + entries + b"\x00" * 4)
    assert tiff_meta(tiff) == (w, h)
    # big-endian variant
    entries_be = (
        _struct.pack(">HHIHH", 256, 3, 1, w, 0)
        + _struct.pack(">HHII", 257, 4, 1, h)
    )
    tiff_be = (b"MM\x00\x2a" + ifd_off.to_bytes(4, "big")
               + _struct.pack(">H", 2) + entries_be + b"\x00" * 4)
    assert tiff_meta(tiff_be) == (w, h)


def test_real_decode_bmp_webp_tiff_captions():
    from frappe_data_pipelines_spark.operators.imaging import (
        bmp_encode_gray,
        png_decode,
    )
    from frappe_data_pipelines_spark.operators.multimodal import _real_decode

    _w, _h, _c, rows = png_decode(_fixture("sample_ocr.png"))
    w, h = len(rows[0]), len(rows)
    got = _real_decode(bmp_encode_gray(rows))
    assert got == (w, h, 1, f"image/bmp {w}x{h}")


def test_png_palette_decode_and_ocr():
    """Color type 3 (palette) PNGs expand through PLTE to RGB; a
    gray-palette render OCRs identically."""
    import struct as _struct
    from binascii import crc32

    from frappe_data_pipelines_spark.operators.imaging import png_decode

    _w, _h, _c, rows = png_decode(_fixture("sample_ocr.png"))
    w, h = len(rows[0]), len(rows)

    def chunk(ctype, data):
        return (_struct.pack(">I", len(data)) + ctype + data
                + _struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF))

    # identity gray palette: index == gray value
    plte = b"".join(bytes((i, i, i)) for i in range(256))
    raw = b"".join(b"\x00" + row for row in rows)  # filter 0 per line
    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", _struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
               + chunk(b"PLTE", plte)
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
    w2, h2, ch, rgb_rows = png_decode(payload)
    assert (w2, h2, ch) == (w, h, 3)
    assert rgb_rows[0][:3] == bytes([rows[0][0]] * 3)
    res = ocr_bitmap(payload)
    assert res["text"] == OCR_FIXTURE_TEXT and res["confidence"] == 1.0


def test_tiff_roundtrip_and_ocr():
    """Uncompressed gray TIFF round-trips losslessly and OCRs identically;
    the kernel reads strips through the first IFD."""
    from frappe_data_pipelines_spark.operators.imaging import (
        png_decode,
        tiff_decode_gray,
        tiff_encode_gray,
    )

    _w, _h, _c, rows = png_decode(_fixture("sample_ocr.png"))
    tif = tiff_encode_gray(rows)
    w2, h2, rows2 = tiff_decode_gray(tif)
    assert rows2 == rows and (w2, h2) == (len(rows[0]), len(rows))
    res = ocr_bitmap(tif)
    assert res["text"] == OCR_FIXTURE_TEXT and res["confidence"] == 1.0
    # compressed TIFF must be rejected cleanly
    import pytest as _pytest

    bad = bytearray(tif)
    # flip the Compression tag value (259) to 5 (LZW): find its entry
    idx = tif.index(b"\x03\x01\x03\x00\x01\x00\x00\x00\x01\x00")
    bad[idx + 8] = 5
    with _pytest.raises(ValueError):
        tiff_decode_gray(bytes(bad))
