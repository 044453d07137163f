"""Baseline JPEG codec tests (operators/jpegmini.py): encode/decode
round-trips, marker/grammar edge cases, and the DCTDecode scanned-PDF path."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from frappe_data_pipelines_spark.operators.jpegmini import (
    JpegError,
    _extend,
    _huff_category,
    jpeg_decode_gray,
    jpeg_encode_gray,
)


def _max_err(a: list[bytes], b: list[bytes]) -> int:
    return max(abs(x - y) for ra, rb in zip(a, b) for x, y in zip(ra, rb))


def test_roundtrip_rendered_text():
    from frappe_data_pipelines_spark.operators.imaging import (
        png_decode,
        render_text_png,
    )

    w, h, _c, rows = png_decode(render_text_png("JPEG ROUND TRIP 123"))
    jp = jpeg_encode_gray(rows, quality=90)
    w2, h2, rows2 = jpeg_decode_gray(jp)
    assert (w2, h2) == (w, h)
    assert _max_err(rows, rows2) <= 24  # q90 on hard edges


def test_roundtrip_flat_and_gradient():
    flat = [bytes([128] * 16) for _ in range(16)]
    _, _, out = jpeg_decode_gray(jpeg_encode_gray(flat, quality=75))
    assert _max_err(flat, out) <= 2  # flat blocks are DC-only, near-exact
    grad = [bytes((x * 4 + y) % 256 for x in range(24)) for y in range(24)]
    _, _, out = jpeg_decode_gray(jpeg_encode_gray(grad, quality=90))
    assert _max_err(grad, out) <= 20


def test_non_multiple_of_8_dims():
    rows = [bytes((x * 7 + y * 3) % 256 for x in range(13)) for y in range(5)]
    w, h, out = jpeg_decode_gray(jpeg_encode_gray(rows, quality=95))
    assert (w, h) == (13, 5)
    assert len(out) == 5 and all(len(r) == 13 for r in out)


@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=20, deadline=None)
def test_roundtrip_random_images(w, h, seed):
    """Any 8-bit image round-trips within the quantization error bound at
    q95 — in particular the codec never crashes, truncates, or shifts."""
    import random

    rng = random.Random(seed)
    rows = [bytes(rng.randrange(256) for _ in range(w)) for _ in range(h)]
    w2, h2, out = jpeg_decode_gray(jpeg_encode_gray(rows, quality=95))
    assert (w2, h2) == (w, h)
    assert len(out) == h and all(len(r) == w for r in out)
    # random noise is the worst case for DCT; bound is loose but finite
    assert _max_err(rows, out) <= 130


def test_huff_category_extend_inverse():
    for v in list(range(-300, 301)) + [-32767, 32767]:
        size, bits = _huff_category(v)
        assert _extend(bits, size) == v


def test_decoder_rejects_garbage():
    with pytest.raises(JpegError):
        jpeg_decode_gray(b"not a jpeg")
    with pytest.raises(JpegError):
        jpeg_decode_gray(b"\xff\xd8\xff\xd9")  # SOI then EOI, no scan
    # progressive SOF2 header with no tables/scans → JpegError, not a crash
    sof2 = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    with pytest.raises(JpegError):
        jpeg_decode_gray(sof2)


def test_dct_scanned_pdf_through_ocr():
    """The full A10 chain on a /DCTDecode scanned PDF: pdfmini finds the
    image XObject, jpegmini decodes the baseline JPEG, the OCR kernel reads
    the text exactly (binarization absorbs the quantization error)."""
    import os

    from frappe_data_pipelines_spark.operators.extraction import pdf_ocr_scanned
    from frappe_data_pipelines_spark.operators.pdfmini import pdf_page_images

    fixtures = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "frappe_data_pipelines_spark", "resources", "fixtures",
    )
    with open(os.path.join(fixtures, "sample_scanned_jpeg.pdf"), "rb") as f:
        payload = f.read()
    images = pdf_page_images(payload)
    assert len(images) == 1 and images[0][2] == 1  # one gray raster
    text, conf = pdf_ocr_scanned(payload)
    with open(os.path.join(fixtures, "sample_scanned_jpeg.pdf.txt")) as f:
        assert text == f.read()
    assert conf == 1.0


def test_decode_420_color_luma():
    """4:2:0 YCbCr (the standard camera/scanner layout): interleaved MCUs
    of four Y blocks + Cb + Cr decode to the correct luma plane; odd
    dimensions exercise MCU padding."""
    from frappe_data_pipelines_spark.operators.jpegmini import jpeg_encode_rgb420

    w, h = 37, 21
    rows_rgb = [
        bytes(
            v
            for x in range(w)
            for v in ((x * 6) % 256, (y * 11) % 256, ((x + y) * 3) % 256)
        )
        for y in range(h)
    ]
    jp = jpeg_encode_rgb420(rows_rgb, quality=90)
    w2, h2, luma = jpeg_decode_gray(jp)
    assert (w2, h2) == (w, h)
    maxerr = 0.0
    for y in range(h):
        for x in range(w):
            r, g, b = rows_rgb[y][3 * x], rows_rgb[y][3 * x + 1], rows_rgb[y][3 * x + 2]
            maxerr = max(maxerr, abs(luma[y][x] - (0.299 * r + 0.587 * g + 0.114 * b)))
    assert maxerr <= 25


def test_ocr_reads_420_color_scan():
    """A color 4:2:0 photograph of a document still OCRs: gray glyphs carry
    through the luma channel."""
    from frappe_data_pipelines_spark.operators.imaging import (
        ocr_bitmap,
        png_decode,
        render_text_png,
    )
    from frappe_data_pipelines_spark.operators.jpegmini import jpeg_encode_rgb420

    w, h, _c, rows = png_decode(render_text_png("COLOR SCAN 42"))
    rows_rgb = [bytes(v for g in row for v in (g, g, g)) for row in rows]
    jp = jpeg_encode_rgb420(rows_rgb, quality=90)
    res = ocr_bitmap(jp)
    assert res["text"] == "COLOR SCAN 42"


# -- progressive (SOF2) ------------------------------------------------------


class TestProgressive:
    """Progressive decode must be coefficient-exact with baseline at the
    same quality: successive approximation (DC Al=1 + refine, AC Al=1 +
    refine) is lossless once all four scans land."""

    @staticmethod
    def _equal(rows, quality=85):
        from frappe_data_pipelines_spark.operators.jpegmini import (
            jpeg_decode_gray,
            jpeg_encode_gray,
            jpeg_encode_gray_progressive,
        )

        base = jpeg_decode_gray(jpeg_encode_gray(rows, quality))
        prog = jpeg_decode_gray(jpeg_encode_gray_progressive(rows, quality))
        assert base[:2] == prog[:2]
        assert base[2] == prog[2]

    def test_gradient(self):
        import math

        self._equal(
            [
                bytes(
                    int(128 + 100 * math.sin(x / 5.0) * math.cos(y / 3.0)) & 0xFF
                    for x in range(40)
                )
                for y in range(24)
            ]
        )

    def test_flat_long_eob_runs(self):
        self._equal([bytes([200]) * 64 for _ in range(64)], quality=90)

    def test_noise_dense_refinement(self):
        import random

        rng = random.Random(3)
        self._equal(
            [bytes(rng.randrange(256) for _ in range(56)) for _ in range(40)],
            quality=70,
        )

    def test_non_multiple_of_8(self):
        import random

        rng = random.Random(9)
        self._equal(
            [bytes(rng.randrange(256) for _ in range(13)) for _ in range(11)]
        )

    def test_rendered_text_ocrs_from_progressive(self):
        from frappe_data_pipelines_spark.operators.imaging import (
            ocr_bitmap,
            png_decode,
            render_text_png,
        )
        from frappe_data_pipelines_spark.operators.jpegmini import (
            jpeg_encode_gray_progressive,
        )

        w, h, _c, rows = png_decode(render_text_png("PROG SCAN 7"))
        res = ocr_bitmap(jpeg_encode_gray_progressive([bytes(r) for r in rows], 95))
        assert res["text"] == "PROG SCAN 7"

    def test_truncated_raises(self):
        import pytest

        from frappe_data_pipelines_spark.operators.jpegmini import (
            JpegError,
            jpeg_decode_gray,
            jpeg_encode_gray_progressive,
        )

        data = jpeg_encode_gray_progressive([bytes([90]) * 16] * 16)
        with pytest.raises(JpegError):
            jpeg_decode_gray(data[: len(data) // 2])


class TestMalformedTotality:
    """Corrupt streams must raise JpegError — never StopIteration (which
    PEP 479 turns into RuntimeError inside generators) or AttributeError."""

    def test_sos_with_unknown_component(self):
        import pytest

        from frappe_data_pipelines_spark.operators.jpegmini import (
            JpegError,
            jpeg_decode_gray,
            jpeg_encode_gray,
            jpeg_encode_gray_progressive,
        )

        for enc in (jpeg_encode_gray, jpeg_encode_gray_progressive):
            data = bytearray(enc([bytes([120]) * 16] * 16))
            # flip the component selector in the first SOS
            i = data.find(b"\xff\xda")
            data[i + 5] = 0x77
            with pytest.raises(JpegError):
                jpeg_decode_gray(bytes(data))

    def test_byte_mutation_fuzz_total(self):
        import random

        from frappe_data_pipelines_spark.operators.jpegmini import (
            JpegError,
            jpeg_decode_gray,
            jpeg_encode_gray_progressive,
        )

        base = jpeg_encode_gray_progressive([bytes([90, 40] * 8)] * 16, 80)
        rng = random.Random(13)
        for _ in range(300):
            b = bytearray(base)
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                jpeg_decode_gray(bytes(b))
            except JpegError:
                pass  # refusing is fine; any other exception is not
