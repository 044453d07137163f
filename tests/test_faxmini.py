"""CCITT fax codec (operators/faxmini.py): T.4 table sanity, G4/1-D
roundtrips under hypothesis, decode error paths, and the scanned-PDF
fixture golden (reference behavior: pdfminer's ccitt module behind
pdfplumber, text_extraction.py:63-75)."""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from frappe_data_pipelines_spark.operators.faxmini import (
    _BLACK,
    _DEC_BLACK,
    _DEC_WHITE,
    _EXT,
    _WHITE,
    FaxError,
    g3_1d_decode,
    g3_1d_encode,
    g4_decode,
    g4_encode,
)

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "frappe_data_pipelines_spark", "resources", "fixtures",
)


def test_tables_prefix_free():
    """Each color's code set (terminating + makeup + extended) must be
    prefix-free or decoding would be ambiguous."""
    for table in ({**_WHITE, **_EXT}, {**_BLACK, **_EXT}):
        codes = sorted(table.values(), key=len)
        for i, a in enumerate(codes):
            for b in codes[i + 1 :]:
                assert not b.startswith(a), (a, b)


def test_tables_complete():
    # terminating runs 0..63 plus makeups 64..1728 step 64 in each color
    for table in (_WHITE, _BLACK):
        assert all(r in table for r in range(64))
        assert all(m in table for m in range(64, 1729, 64))
    assert all(m in _EXT for m in range(1792, 2561, 64))
    # spot-check well-known codewords from the published T.4 tables
    assert _WHITE[1664] == "011000" and _WHITE[0] == "00110101"
    assert _BLACK[2] == "11" and _BLACK[3] == "10" and _BLACK[1] == "010"
    assert len(_DEC_WHITE) == len(_WHITE) + len(_EXT)
    assert len(_DEC_BLACK) == len(_BLACK) + len(_EXT)


_row = st.integers(1, 80).flatmap(
    lambda w: st.lists(
        st.lists(st.integers(0, 1), min_size=w, max_size=w), min_size=1, max_size=8
    ).map(lambda rows: (w, rows))
)


@settings(max_examples=60, deadline=None)
@given(_row)
def test_g4_roundtrip(case):
    w, rows = case
    assert [list(r) for r in g4_decode(g4_encode(rows, w), w, len(rows))] == rows


@settings(max_examples=60, deadline=None)
@given(_row)
def test_g3_1d_roundtrip(case):
    w, rows = case
    assert [list(r) for r in g3_1d_decode(g3_1d_encode(rows, w), w, len(rows))] == rows


def test_long_runs_use_makeup_codes():
    # 1728-wide all-white and all-black lines force makeup codewords
    w = 1728
    rows = [[0] * w, [1] * w, [0] * 100 + [1] * (w - 100)]
    assert [list(r) for r in g4_decode(g4_encode(rows, w), w, 3)] == rows
    assert [list(r) for r in g3_1d_decode(g3_1d_encode(rows, w), w, 3)] == rows


def test_decode_garbage_raises():
    # 0x00 bytes are no valid mode code (and not EOFB: wrong length)
    with pytest.raises(FaxError):
        g4_decode(b"\x00\x00\x00\x00", 64, 4)
    with pytest.raises(FaxError):
        g3_1d_decode(b"", 64, 1)


def test_truncated_stream_raises():
    w = 64
    rows = [[0] * 32 + [1] * 32] * 4
    enc = g4_encode(rows, w)
    with pytest.raises(FaxError):
        g4_decode(enc[: len(enc) // 4], w, 4)


def test_scanned_g4_pdf_golden():
    """G4-compressed scanned fixture routes textless → scanned-detect →
    raster decode → real OCR, matching the pinned golden."""
    from frappe_data_pipelines_spark.operators.extraction import pdf_ocr_scanned
    from frappe_data_pipelines_spark.operators.pdfmini import pdf_page_images

    with open(os.path.join(FIXTURES, "sample_scanned_g4.pdf"), "rb") as f:
        raw = f.read()
    (w, h, channels, rows), = pdf_page_images(raw)
    assert channels == 1 and h == len(rows)
    text, conf = pdf_ocr_scanned(raw)
    with open(os.path.join(FIXTURES, "sample_scanned_g4.pdf.txt")) as f:
        assert text == f.read()
    assert conf == 1.0


def test_cmyk_raster_converts_to_rgb():
    """DeviceCMYK image XObjects convert via the uncalibrated inverse
    (PDF 8.6.4.4) to RGB rows."""
    import zlib

    from frappe_data_pipelines_spark.operators.pdfmini import pdf_page_images

    # 2x1: pure cyan (C=255) and mid-gray via K=128
    cmyk = bytes([255, 0, 0, 0, 0, 0, 0, 128])
    z = zlib.compress(cmyk)
    objs = [
        b"1 0 obj\n<</Type/Catalog/Pages 2 0 R>>\nendobj\n",
        b"2 0 obj\n<</Type/Pages/Kids[3 0 R]/Count 1>>\nendobj\n",
        b"3 0 obj\n<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
        b"/Resources<</XObject<</Im0 4 0 R>>>>/Contents 5 0 R>>\nendobj\n",
        b"4 0 obj\n<</Type/XObject/Subtype/Image/Width 2/Height 1"
        b"/ColorSpace/DeviceCMYK/BitsPerComponent 8/Filter/FlateDecode"
        b"/Length %d>>\nstream\n%s\nendstream\nendobj\n" % (len(z), z),
        b"5 0 obj\n<</Length 26>>\nstream\nq 2 0 0 1 0 0 cm /Im0 Do Q\nendstream\nendobj\n",
    ]
    body = bytearray(b"%PDF-1.4\n")
    offs = []
    for o in objs:
        offs.append(len(body))
        body += o
    xp = len(body)
    body += b"xref\n0 6\n0000000000 65535 f \n"
    for o in offs:
        body += b"%010d 00000 n \n" % o
    body += b"trailer\n<</Size 6/Root 1 0 R>>\nstartxref\n%d\n%%%%EOF\n" % xp

    (w, h, ch, rows), = pdf_page_images(bytes(body))
    assert (w, h, ch) == (2, 1, 3)
    assert list(rows[0]) == [0, 255, 255, 127, 127, 127]


@settings(max_examples=30, deadline=None)
@given(_row)
def test_g3_1d_byte_aligned_roundtrip(case):
    """/EncodedByteAlign: each coded line starts on a byte boundary."""
    w, rows = case
    enc = g3_1d_encode(rows, w, byte_align=True)
    assert [list(r) for r in g3_1d_decode(enc, w, len(rows), byte_align=True)] == rows
