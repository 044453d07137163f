"""Generate the checked-in A3/A5 real-kernel fixtures (run once; the
binary outputs live in frappe_data_pipelines_spark/resources/fixtures/).

The PDF exercises: an uncompressed content stream, a FlateDecode stream,
literal-string Tj with escaped parens, an octal escape (\\351 = é in
latin-1/WinAnsi), and a TJ array with kerning numbers. The DOCX exercises:
multiple paragraphs, runs, w:tab, w:br, and non-ASCII text.
"""

from __future__ import annotations

import io
import os
import sys
import zipfile
import zlib

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "frappe_data_pipelines_spark", "resources", "fixtures",
)

DOCX_DOCUMENT_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
 <w:body>
  <w:p><w:r><w:t>Quarterly Report</w:t></w:r></w:p>
  <w:p><w:r><w:t>Revenue:</w:t></w:r><w:r><w:tab/><w:t>42 units</w:t></w:r></w:p>
  <w:p><w:r><w:t>Café notes — 日本語 line one</w:t><w:br/><w:t>after the break</w:t></w:r></w:p>
 </w:body>
</w:document>
"""

CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
 <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
 <Default Extension="xml" ContentType="application/xml"/>
 <Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
</Types>
"""

RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
</Relationships>
"""


def make_docx() -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", CONTENT_TYPES)
        z.writestr("_rels/.rels", RELS)
        z.writestr("word/document.xml", DOCX_DOCUMENT_XML)
    return buf.getvalue()


PAGE1 = (
    b"BT /F1 12 Tf 72 720 Td (Hello PDF world) Tj T* "
    b"(Second line with \\(escaped\\) parens) Tj T* "
    b"(Caf\\351 menu) Tj ET"
)
PAGE2_RAW = b"BT /F1 12 Tf 72 720 Td [(Flate ) -250 (page two)] TJ ET"


def make_pdf() -> bytes:
    page2 = zlib.compress(PAGE2_RAW)
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 7 0 R >> >> /Contents 4 0 R >> endobj\n",
        b"4 0 obj << /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(PAGE1), PAGE1),
        b"5 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 7 0 R >> >> /Contents 6 0 R >> endobj\n",
        b"6 0 obj << /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
        % (len(page2), page2),
        b"7 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n",
    ]
    body = b"%PDF-1.4\n" + b"".join(objs)
    return body + b"trailer << /Root 1 0 R >>\n%%EOF\n"


TYPE0_CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
3 beginbfchar
<0001> <3053>
<0002> <3093>
<0003> <306B>
endbfchar
2 beginbfrange
<0010> <0012> <0041>
<0020> <0021> [<00E9> <4E16>]
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end
"""

# hex-string show ops through the Type0 font: bfchar range ("こんに"),
# a TJ array with kerning across a scalar bfrange (ABC), an array bfrange row
TYPE0_PAGE_A = (
    b"BT /F1 12 Tf <000100020003> Tj T* "
    b"[<0010> -120 <0011 0012>] TJ T* "
    b"<00200021> Tj ET"
)
TYPE0_PAGE_B = b"BT /F2 12 Tf (plain latin page) Tj ET"


def _png_up_predict(rows: list[bytes]) -> bytes:
    """Apply the PNG Up (type 2) row filter — what real writers emit for
    xref streams with /Predictor 12."""
    out = bytearray()
    prev = bytes(len(rows[0]))
    for row in rows:
        out.append(2)
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = row
    return bytes(out)


def make_type0_pdf() -> bytes:
    """A PDF-1.5-style file: compressed xref STREAM (W [1 2 1], Up
    predictor), all page-tree dicts inside an object STREAM, a Type0
    (Identity-H) font whose ToUnicode CMap exercises bfchar + both bfrange
    forms, hex-string Tj/TJ, plus a second page with a simple font."""
    objstm_members = [
        (2, b"<</Type/Catalog/Pages 3 0 R>>"),
        (3, b"<</Type/Pages/Kids[4 0 R 8 0 R]/Count 2>>"),
        (4, b"<</Type/Page/Parent 3 0 R/Resources<</Font<</F1 5 0 R>>>>"
            b"/Contents 6 0 R/MediaBox[0 0 612 792]>>"),
        (5, b"<</Type/Font/Subtype/Type0/BaseFont/FixtureCID"
            b"/Encoding/Identity-H/ToUnicode 7 0 R>>"),
        (8, b"<</Type/Page/Parent 3 0 R/Resources<</Font<</F2 9 0 R>>>>"
            b"/Contents 10 0 R/MediaBox[0 0 612 792]>>"),
        (9, b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>"),
    ]
    offsets, payloads, pos = [], [], 0
    for _num, body in objstm_members:
        offsets.append(pos)
        payloads.append(body)
        pos += len(body) + 1
    header = " ".join(
        f"{num} {off}" for (num, _), off in zip(objstm_members, offsets)
    ).encode() + b"\n"
    objstm_data = header + b"\n".join(payloads) + b"\n"
    objstm_z = zlib.compress(objstm_data)
    cmap_z = zlib.compress(TYPE0_CMAP)
    page_a_z = zlib.compress(TYPE0_PAGE_A)

    out = bytearray(b"%PDF-1.5\n")
    obj_off: dict[int, int] = {}

    def emit(num: int, body: bytes) -> None:
        obj_off[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + body + b"\nendobj\n")

    emit(1, b"<</Type/ObjStm/N %d/First %d/Length %d/Filter/FlateDecode>>\n"
            b"stream\n%s\nendstream"
            % (len(objstm_members), len(header), len(objstm_z), objstm_z))
    emit(6, b"<</Length %d/Filter/FlateDecode>>\nstream\n%s\nendstream"
            % (len(page_a_z), page_a_z))
    emit(7, b"<</Length %d/Filter/FlateDecode>>\nstream\n%s\nendstream"
            % (len(cmap_z), cmap_z))
    emit(10, b"<</Length %d>>\nstream\n%s\nendstream"
             % (len(TYPE0_PAGE_B), TYPE0_PAGE_B))

    xref_pos = len(out)
    obj_off[11] = xref_pos
    entries = {
        0: (0, 0, 65535),
        1: (1, obj_off[1], 0),
        2: (2, 1, 0), 3: (2, 1, 1), 4: (2, 1, 2), 5: (2, 1, 3),
        6: (1, obj_off[6], 0),
        7: (1, obj_off[7], 0),
        8: (2, 1, 4), 9: (2, 1, 5),
        10: (1, obj_off[10], 0),
        11: (1, xref_pos, 0),
    }
    rows = [
        bytes([t]) + f2.to_bytes(2, "big") + bytes([f3 & 0xFF])
        for t, f2, f3 in (entries[i] for i in range(12))
    ]
    xref_z = zlib.compress(_png_up_predict(rows))
    out.extend(
        b"11 0 obj\n<</Type/XRef/Size 12/W[1 2 1]/Index[0 12]"
        b"/Root 2 0 R/Filter/FlateDecode"
        b"/DecodeParms<</Predictor 12/Columns 4>>/Length %d>>\n"
        b"stream\n%s\nendstream\nendobj\n" % (len(xref_z), xref_z)
    )
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_pos)
    return bytes(out)


EXPECTED_TYPE0_TEXT = "こんに\nABC\né世\n\nplain latin page"

SCANNED_TEXT = "SCANNED ARCHIVE BOX 7\nREF NO: 2019-114"


def _scanned_pdf_from_image(
    w: int, h: int, samples: bytes, filt: bytes, bpc: int = 8, extra: bytes = b"",
    colorspace: bytes = b"DeviceGray",
) -> bytes:
    content = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)
    objs = [
        b"1 0 obj\n<</Type/Catalog/Pages 2 0 R>>\nendobj\n",
        b"2 0 obj\n<</Type/Pages/Kids[3 0 R]/Count 1>>\nendobj\n",
        b"3 0 obj\n<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
        b"/Resources<</XObject<</Im0 4 0 R>>>>/Contents 5 0 R>>\nendobj\n",
        b"4 0 obj\n<</Type/XObject/Subtype/Image/Width %d/Height %d"
        b"/ColorSpace/%s/BitsPerComponent %d/Filter/%s%s"
        b"/Length %d>>\nstream\n%s\nendstream\nendobj\n"
        % (w, h, colorspace, bpc, filt, extra, len(samples), samples),
        b"5 0 obj\n<</Length %d>>\nstream\n%s\nendstream\nendobj\n"
        % (len(content), content),
    ]
    body = bytearray(b"%PDF-1.4\n")
    offsets = []
    for o in objs:
        offsets.append(len(body))
        body += o
    xref_pos = len(body)
    body += b"xref\n0 6\n0000000000 65535 f \n"
    for off in offsets:
        body += b"%010d 00000 n \n" % off
    body += b"trailer\n<</Size 6/Root 1 0 R>>\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    return bytes(body)


def _scanned_raster() -> tuple[int, int, list[bytes]]:
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frappe_data_pipelines_spark.operators.imaging import (
        png_decode,
        render_text_png,
    )

    w, h, _channels, rows = png_decode(render_text_png(SCANNED_TEXT))
    return w, h, rows


def make_scanned_pdf() -> bytes:
    """A 'scanned' PDF (A10/A11 fixture): the only page content is an
    embedded /DeviceGray image XObject of rasterized text — no text
    operators anywhere, exactly what a scanner produces. The OCR golden is
    the rasterized text itself."""
    w, h, rows = _scanned_raster()
    return _scanned_pdf_from_image(
        w, h, zlib.compress(b"".join(rows)), b"FlateDecode"
    )


OCR_FIXTURE_TEXT = "INVOICE 2026-08\nTOTAL DUE: 1,234.56\nPAY BY: 2026-09-01"


def make_scanned_pjpeg_pdf() -> bytes:
    """Same page again, raster encoded as a PROGRESSIVE JPEG (SOF2, four
    scans: DC first/refine + AC first/refine) behind /DCTDecode — web-era
    scan pipelines emit these; exercises the multi-scan decoder through
    pdf_page_images → OCR."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frappe_data_pipelines_spark.operators.jpegmini import (
        jpeg_encode_gray_progressive,
    )

    w, h, rows = _scanned_raster()
    return _scanned_pdf_from_image(
        w, h, jpeg_encode_gray_progressive(rows, quality=90), b"DCTDecode"
    )


def make_ocr_jpeg() -> bytes:
    """JPEG twin of sample_ocr.png (same rasterized text, q90 baseline
    encode) — the A8 kernel must read scanner-style JPEG input too."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frappe_data_pipelines_spark.operators.imaging import (
        png_decode,
        render_text_png,
    )
    from frappe_data_pipelines_spark.operators.jpegmini import jpeg_encode_gray

    _w, _h, _c, rows = png_decode(render_text_png(OCR_FIXTURE_TEXT))
    return jpeg_encode_gray(rows, quality=90)


def make_scanned_jpx_pdf() -> bytes:
    """Same page, raster as a lossless JPEG 2000 codestream behind
    /JPXDecode (single-tile gray 5/3-reversible profile) — the remaining
    scanned-page encoding; exercises operators/jp2mini end-to-end through
    pdf_page_images → OCR."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frappe_data_pipelines_spark.operators.jp2mini import jp2_encode_gray

    w, h, rows = _scanned_raster()
    return _scanned_pdf_from_image(w, h, jp2_encode_gray(rows, levels=2), b"JPXDecode")


def make_scanned_jpx16_pdf() -> bytes:
    """Same page as a 16-BIT grayscale lossless JPEG 2000 (round 10:
    Ssiz=15, depth-scaled DC shift/quant budgets) — medical/archival
    scanners emit high-precision JPX; jp2_decode normalizes to 8-bit for
    the raster consumers, so OCR reads the identical golden. Per the PDF
    spec, JPX image parameters come from the codestream itself."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frappe_data_pipelines_spark.operators.jp2mini import jp2_encode

    w, h, rows = _scanned_raster()
    plane16 = [[px << 8 | px for px in r] for r in rows]  # 0->0, 255->65535
    data = jp2_encode([plane16], levels=2, depth=16)
    return _scanned_pdf_from_image(w, h, data, b"JPXDecode", bpc=16)


def make_scanned_jpx97_pdf() -> bytes:
    """Same page once more, as a LOSSY COLOR JPEG 2000: the gray raster
    sepia-tinted to RGB (a scanner's color cast), 9/7 irreversible wavelet +
    scalar-expounded quantization + ICT — the profile real color scanners
    emit behind /JPXDecode. Exercises the irreversible decode path
    (dequantize -> inverse 9/7 -> inverse ICT -> luma) through
    pdf_page_images -> OCR; the golden text must survive the quantization
    noise."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frappe_data_pipelines_spark.operators.jp2mini import jp2_encode

    w, h, rows = _scanned_raster()
    r_p = [bytes(v for v in row) for row in rows]
    g_p = [bytes(v * 9 // 10 for v in row) for row in rows]
    b_p = [bytes(v * 3 // 4 for v in row) for row in rows]
    return _scanned_pdf_from_image(
        w, h,
        jp2_encode([r_p, g_p, b_p], levels=2, irreversible=True, step=0.5),
        b"JPXDecode", colorspace=b"DeviceRGB",
    )


def make_scanned_jpeg_pdf() -> bytes:
    """Same page, but the raster is a baseline JPEG behind /DCTDecode — the
    encoding real scanners actually embed. Exercises the stdlib JPEG
    decoder end-to-end through pdf_page_images → OCR."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frappe_data_pipelines_spark.operators.jpegmini import jpeg_encode_gray

    w, h, rows = _scanned_raster()
    return _scanned_pdf_from_image(w, h, jpeg_encode_gray(rows, quality=90), b"DCTDecode")

EXPECTED_PDF_TEXT = (
    "Hello PDF world\nSecond line with (escaped) parens\nCafé menu"
    "\n\nFlate page two"
)
EXPECTED_DOCX_TEXT = (
    "Quarterly Report\nRevenue:\t42 units\n"
    "Café notes — 日本語 line one\nafter the break"
)


def _write_if_missing(name: str, data) -> None:
    """Existing committed fixtures stay byte-identical (the docx zip embeds
    timestamps; regenerating would churn bytes the goldens already pin)."""
    path = os.path.join(OUT, name)
    if os.path.exists(path):
        return
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(path, mode) as f:
        f.write(data)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    _write_if_missing("sample.docx", make_docx())
    _write_if_missing("sample.pdf", make_pdf())
    _write_if_missing("sample.pdf.txt", EXPECTED_PDF_TEXT)
    _write_if_missing("sample.docx.txt", EXPECTED_DOCX_TEXT)
    _write_if_missing("sample_type0.pdf", make_type0_pdf())
    _write_if_missing("sample_type0.pdf.txt", EXPECTED_TYPE0_TEXT)
    _write_if_missing("sample_scanned.pdf", make_scanned_pdf())
    _write_if_missing("sample_scanned.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_scanned_jpeg.pdf", make_scanned_jpeg_pdf())
    _write_if_missing("sample_scanned_jpeg.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_scanned_pjpeg.pdf", make_scanned_pjpeg_pdf())
    _write_if_missing("sample_scanned_pjpeg.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_ocr.jpg", make_ocr_jpeg())
    _write_if_missing("sample_encrypted.pdf", make_encrypted_pdf())
    _write_if_missing("sample_encrypted.pdf.txt", ENCRYPTED_TEXT)
    _write_if_missing("sample_aes128.pdf", make_aes_pdf(AES128_TEXT, "aesv2"))
    _write_if_missing("sample_aes128.pdf.txt", AES128_TEXT)
    _write_if_missing("sample_aes256.pdf", make_aes_pdf(AES256_TEXT, "aesv3"))
    _write_if_missing("sample_aes256.pdf.txt", AES256_TEXT)
    _write_if_missing("sample_cidgid.pdf", make_cidgid_pdf())
    _write_if_missing("sample_cidgid.pdf.txt", CIDGID_TEXT)
    _write_if_missing("sample_cff.pdf", make_cff_pdf())
    _write_if_missing("sample_cff.pdf.txt", CFF_TEXT)
    _write_if_missing("sample_scanned_g4.pdf", make_scanned_g4_pdf())
    _write_if_missing("sample_scanned_g4.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_scanned_jpx.pdf", make_scanned_jpx_pdf())
    _write_if_missing("sample_scanned_jpx.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_scanned_jpx97.pdf", make_scanned_jpx97_pdf())
    _write_if_missing("sample_scanned_jpx97.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_scanned_jpxtiled.pdf", make_scanned_jpxtiled_pdf())
    _write_if_missing("sample_scanned_jpxtiled.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_scanned_jpxdq.pdf", make_scanned_jpxdq_pdf())
    _write_if_missing("sample_scanned_jpxdq.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_scanned_jbig2.pdf", make_scanned_jbig2_pdf())
    _write_if_missing("sample_scanned_jbig2.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_scanned_jbig2sym.pdf", make_scanned_jbig2sym_pdf())
    _write_if_missing("sample_scanned_jbig2sym.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_scanned_jbig2huff.pdf", make_scanned_jbig2huff_pdf())
    _write_if_missing("sample_scanned_jbig2huff.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_scanned_jbig2huffref.pdf", make_scanned_jbig2huffref_pdf())
    _write_if_missing("sample_scanned_jbig2huffref.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_scanned_jbig2huffagg.pdf", make_scanned_jbig2huffagg_pdf())
    _write_if_missing("sample_scanned_jbig2huffagg.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_scanned_jbig2stdtbl.pdf", make_scanned_jbig2stdtbl_pdf())
    _write_if_missing("sample_scanned_jbig2stdtbl.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_mixed.pdf", make_mixed_text_image_pdf())
    _write_if_missing(
        "sample_mixed.pdf.txt", "Mixed doc page one\n\nMixed doc page three"
    )
    _write_if_missing("sample_scanned_jbig2ref.pdf", make_scanned_jbig2ref_pdf())
    _write_if_missing("sample_scanned_jbig2ref.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_scanned_jbig2ref0.pdf", make_scanned_jbig2ref0_pdf())
    _write_if_missing("sample_scanned_jbig2ref0.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_scanned_jbig2agg.pdf", make_scanned_jbig2agg_pdf())
    _write_if_missing("sample_scanned_jbig2agg.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_scanned_jbig2nc.pdf", make_scanned_jbig2nc_pdf())
    _write_if_missing("sample_scanned_jbig2nc.pdf.txt", SCANNED_TEXT)
    _write_if_missing("sample_scanned_jpx16.pdf", make_scanned_jpx16_pdf())
    _write_if_missing("sample_scanned_jpx16.pdf.txt", SCANNED_TEXT)
    print(f"wrote fixtures to {OUT}")


ENCRYPTED_TEXT = "RC4 secret: quarterly figures\nOwner-locked but readable"
AES128_TEXT = "AES-128 secret: ledger totals\nCrypt filter StdCF (AESV2)"
AES256_TEXT = "AES-256 secret: board minutes\nHardened R6 key wrap (AESV3)"


def make_aes_pdf(text: str, cipher: str) -> bytes:
    """AES-encrypted one-page PDFs (AESV2 = AES-128-CBC V=4 R=4; AESV3 =
    AES-256-CBC V=5 R=6 with the hardened 2.B hash), empty user password.
    Delegates to the test-side encryptor so fixture bytes and the
    property-tested path share one encrypt implementation."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from test_pdfmini import _build_encrypted_pdf

    return _build_encrypted_pdf(text, r=6 if cipher == "aesv3" else 4, cipher=cipher)


def make_encrypted_pdf() -> bytes:
    """RC4-encrypted (R=3, 128-bit, empty user password) one-page PDF —
    the 'owner-locked' case the A3 kernel must open transparently, like
    pdfplumber does. Encrypt-side Algorithms 2/3/4/5 of PDF 1.7 §7.6.3;
    the kernel's _rc4/_std_file_key serve the symmetric direction."""
    import hashlib

    from frappe_data_pipelines_spark.operators.pdfmini import (
        _PW_PAD,
        _rc4,
        _std_file_key,
    )

    r, n = 3, 16
    id0 = hashlib.md5(ENCRYPTED_TEXT.encode()).digest()
    okey = hashlib.md5(_PW_PAD).digest()
    for _ in range(50):
        okey = hashlib.md5(okey).digest()
    okey = okey[:n]
    o = _rc4(okey, _PW_PAD)
    for i in range(1, 20):
        o = _rc4(bytes(b ^ i for b in okey), o)
    p_signed = -1
    key = _std_file_key(b"", o, p_signed, id0, r, n)
    u = _rc4(key, hashlib.md5(_PW_PAD + id0).digest())
    for i in range(1, 20):
        u = _rc4(bytes(b ^ i for b in key), u)
    u += b"\x00" * 16

    def objkey(num: int) -> bytes:
        mat = key + num.to_bytes(3, "little") + b"\x00\x00"
        return hashlib.md5(mat).digest()[:16]

    ops = b" T* ".join(
        b"(%s) Tj"
        % line.encode("latin-1")
        .replace(b"\\", b"\\\\")
        .replace(b"(", b"\\(")
        .replace(b")", b"\\)")
        for line in ENCRYPTED_TEXT.split("\n")
    )
    content = zlib.compress(b"BT /F1 11 Tf 72 720 Td " + ops + b" ET")
    enc_content = _rc4(objkey(4), content)

    def hexs(b: bytes) -> bytes:
        return b"<" + b.hex().encode() + b">"

    objs = [
        b"1 0 obj\n<</Type/Catalog/Pages 2 0 R>>\nendobj\n",
        b"2 0 obj\n<</Type/Pages/Kids[3 0 R]/Count 1>>\nendobj\n",
        b"3 0 obj\n<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
        b"/Resources<</Font<</F1 5 0 R>>>>/Contents 4 0 R>>\nendobj\n",
        b"4 0 obj\n<</Length %d/Filter/FlateDecode>>\nstream\n%s\nendstream\nendobj\n"
        % (len(enc_content), enc_content),
        b"5 0 obj\n<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>\nendobj\n",
        b"6 0 obj\n<</Filter/Standard/V 2/R 3/Length 128/P -1/O %s/U %s>>\nendobj\n"
        % (hexs(o), hexs(u)),
    ]
    body = bytearray(b"%PDF-1.4\n")
    offsets = []
    for ob in objs:
        offsets.append(len(body))
        body += ob
    xref_pos = len(body)
    body += b"xref\n0 7\n0000000000 65535 f \n"
    for off in offsets:
        body += b"%010d 00000 n \n" % off
    body += (
        b"trailer\n<</Size 7/Root 1 0 R/Encrypt 6 0 R/ID[%s%s]>>\nstartxref\n%d\n%%%%EOF\n"
        % (hexs(id0), hexs(id0), xref_pos)
    )
    return bytes(body)



# -- CID font WITHOUT ToUnicode: glyph ids resolved via embedded TTF cmap ----

CIDGID_LINE1 = "Graph query engine"
CIDGID_LINE2 = "Σ ok 😀(cid:999)"
CIDGID_TEXT = CIDGID_LINE1 + "\n" + CIDGID_LINE2


def _ttf_cmap_format4(char_to_gid: dict[int, int]) -> bytes:
    """One segment per char + the required 0xFFFF terminator."""
    import struct

    codes = sorted(char_to_gid)
    segs = [(c, c, (char_to_gid[c] - c) & 0xFFFF, 0) for c in codes]
    segs.append((0xFFFF, 0xFFFF, 1, 0))
    n = len(segs)
    k = n.bit_length() - 1
    search = 2 * (2 ** k)
    body = struct.pack(">HHHH", 2 * n, search, k, 2 * n - search)
    body += b"".join(struct.pack(">H", e) for _s, e, _d, _r in segs)
    body += b"\x00\x00"  # reservedPad
    body += b"".join(struct.pack(">H", s) for s, _e, _d, _r in segs)
    body += b"".join(struct.pack(">H", d) for _s, _e, d, _r in segs)
    body += b"".join(struct.pack(">H", r) for _s, _e, _d, r in segs)
    return struct.pack(">HHH", 4, 6 + len(body), 0) + body


def _ttf_cmap_format12(char_to_gid: dict[int, int]) -> bytes:
    import struct

    groups = [(c, c, g) for c, g in sorted(char_to_gid.items())]
    return (
        struct.pack(">HHIII", 12, 0, 16 + 12 * len(groups), 0, len(groups))
        + b"".join(struct.pack(">III", s, e, g) for s, e, g in groups)
    )


def make_ttf(subtables: list[tuple[int, int, bytes]]) -> bytes:
    """Minimal sfnt wrapper holding just a cmap table (all the text
    extractor reads; checksums zeroed)."""
    import struct

    cmap = struct.pack(">HH", 0, len(subtables))
    off = 4 + 8 * len(subtables)
    recs = b""
    for plat, enc, st in subtables:
        recs += struct.pack(">HHI", plat, enc, off)
        off += len(st)
    cmap += recs + b"".join(st for _p, _e, st in subtables)
    header = struct.pack(">IHHHH", 0x00010000, 1, 16, 0, 0)
    header += b"cmap" + struct.pack(">III", 0, 28, len(cmap))
    return header + cmap


def make_cidgid_pdf() -> bytes:
    """Type0/Identity-H fonts with NO /ToUnicode: text is recoverable only
    by inverting the embedded TrueType cmap (format 4 for F1, format 12
    for F2); one deliberately unmapped gid pins the (cid:N) fallback."""
    f1_chars = sorted(set(CIDGID_LINE1))
    f1_map = {ord(ch): 5 + i for i, ch in enumerate(f1_chars)}  # non-identity
    ttf1 = make_ttf([(3, 1, _ttf_cmap_format4(f1_map))])

    f2_chars = ["Σ", " ", "o", "k", "😀"]
    f2_map = {ord(ch): 2 + i for i, ch in enumerate(f2_chars)}
    ttf2 = make_ttf([(3, 10, _ttf_cmap_format12(f2_map))])

    def gid_hex(font_map: dict[int, int], text: str) -> bytes:
        return ("".join(f"{font_map[ord(ch)]:04x}" for ch in text)).encode()

    content = (
        b"BT /F1 12 Tf <" + gid_hex(f1_map, CIDGID_LINE1) + b"> Tj T* "
        b"/F2 12 Tf <" + gid_hex(f2_map, "Σ ok 😀") + b"03e7> Tj ET"
    )
    objs = [
        b"1 0 obj\n<</Type/Catalog/Pages 2 0 R>>\nendobj\n",
        b"2 0 obj\n<</Type/Pages/Kids[3 0 R]/Count 1>>\nendobj\n",
        b"3 0 obj\n<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
        b"/Resources<</Font<</F1 5 0 R/F2 9 0 R>>>>/Contents 4 0 R>>\nendobj\n",
        b"4 0 obj\n<</Length %d>>\nstream\n%s\nendstream\nendobj\n"
        % (len(content), content),
        b"5 0 obj\n<</Type/Font/Subtype/Type0/BaseFont/FixtureGID1"
        b"/Encoding/Identity-H/DescendantFonts[6 0 R]>>\nendobj\n",
        b"6 0 obj\n<</Type/Font/Subtype/CIDFontType2/BaseFont/FixtureGID1"
        b"/FontDescriptor 7 0 R>>\nendobj\n",
        b"7 0 obj\n<</Type/FontDescriptor/FontName/FixtureGID1"
        b"/FontFile2 8 0 R>>\nendobj\n",
        b"8 0 obj\n<</Length %d/Length1 %d>>\nstream\n%s\nendstream\nendobj\n"
        % (len(ttf1), len(ttf1), ttf1),
        b"9 0 obj\n<</Type/Font/Subtype/Type0/BaseFont/FixtureGID2"
        b"/Encoding/Identity-H/DescendantFonts[10 0 R]>>\nendobj\n",
        b"10 0 obj\n<</Type/Font/Subtype/CIDFontType2/BaseFont/FixtureGID2"
        b"/FontDescriptor 11 0 R>>\nendobj\n",
        b"11 0 obj\n<</Type/FontDescriptor/FontName/FixtureGID2"
        b"/FontFile2 12 0 R>>\nendobj\n",
        b"12 0 obj\n<</Length %d/Length1 %d>>\nstream\n%s\nendstream\nendobj\n"
        % (len(ttf2), len(ttf2), ttf2),
    ]
    body = bytearray(b"%PDF-1.5\n")
    offsets = []
    for ob in objs:
        offsets.append(len(body))
        body += ob
    xref_pos = len(body)
    body += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        body += b"%010d 00000 n \n" % off
    body += (
        b"trailer\n<</Size %d/Root 1 0 R>>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_pos)
    )
    return bytes(body)

CFF_TEXT = "CFF charset recovery: Type1C names! \u0394=ok"


def _cff_index_bytes(items: list[bytes]) -> bytes:
    if not items:
        return b"\x00\x00"
    end = 1 + sum(len(i) for i in items)
    osz = 1 if end <= 0xFF else (2 if end <= 0xFFFF else 3)
    out = bytearray(len(items).to_bytes(2, "big"))
    out.append(osz)
    off = 1
    offs = [off]
    for it in items:
        off += len(it)
        offs.append(off)
    for o in offs:
        out += o.to_bytes(osz, "big")
    for it in items:
        out += it
    return bytes(out)


def make_cff(glyph_names: list[str]) -> bytes:
    """Minimal non-CID CFF (Type1C) font program: gid 0 = .notdef, gid i =
    glyph_names[i-1] via a format-0 charset. Charstrings are one-byte
    endchar dummies — the kernel only reads the charset, never renders.
    Names found in the standard strings use their SID; others go through
    the font's string INDEX (SID 391+)."""
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frappe_data_pipelines_spark.operators.pdfmini import _CFF_STD_STRINGS

    std = {n: i for i, n in enumerate(_CFF_STD_STRINGS)}
    sids, strings = [], []
    for nm in glyph_names:
        if nm in std:
            sids.append(std[nm])
        else:
            sids.append(391 + len(strings))
            strings.append(nm.encode("latin-1"))
    header = bytes([1, 0, 4, 1])
    name_idx = _cff_index_bytes([b"FixtureCFF"])
    str_idx = _cff_index_bytes(strings)
    gsubr = b"\x00\x00"
    charset = b"\x00" + b"".join(s.to_bytes(2, "big") for s in sids)
    charstrings = _cff_index_bytes([b"\x0e"] * (len(glyph_names) + 1))
    top_idx_size = 2 + 1 + 2 + 12  # count, offSize=1, offsets[2], 12-byte dict
    charset_off = len(header) + len(name_idx) + top_idx_size + len(str_idx) + len(gsubr)
    cs_off = charset_off + len(charset)
    top = (
        b"\x1d" + charset_off.to_bytes(4, "big") + b"\x0f"  # op 15 charset
        + b"\x1d" + cs_off.to_bytes(4, "big") + b"\x11"      # op 17 CharStrings
    )
    top_idx = b"\x00\x01\x01\x01" + bytes([1 + len(top)]) + top
    assert len(top_idx) == top_idx_size
    return header + name_idx + top_idx + str_idx + gsubr + charset + charstrings


def make_cff_pdf() -> bytes:
    """Type0/Identity-H font with NO /ToUnicode and a CFF (FontFile3,
    /Subtype/Type1C) descendant font program: text is recoverable only by
    reading the CFF charset's glyph names (pdfminer's Type1C move). One
    glyph uses a custom string-INDEX name (uni0394) to exercise SIDs past
    the standard table."""
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frappe_data_pipelines_spark.operators.pdfmini import _AGL

    rev = {v: k for k, v in _AGL.items()}
    chars = []
    for ch in CFF_TEXT:
        if ch not in chars:
            chars.append(ch)

    def name_of(ch: str) -> str:
        if ch.isalnum() and ord(ch) < 128 and not ch.isdigit():
            return ch
        if ch in rev:
            return rev[ch]
        return "uni%04X" % ord(ch)

    gid_of = {ch: i + 1 for i, ch in enumerate(chars)}
    cff = make_cff([name_of(ch) for ch in chars])
    cid_hex = ("".join("%04x" % gid_of[ch] for ch in CFF_TEXT)).encode()
    content = b"BT /F1 12 Tf <" + cid_hex + b"> Tj ET"
    objs = [
        b"1 0 obj\n<</Type/Catalog/Pages 2 0 R>>\nendobj\n",
        b"2 0 obj\n<</Type/Pages/Kids[3 0 R]/Count 1>>\nendobj\n",
        b"3 0 obj\n<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
        b"/Resources<</Font<</F1 5 0 R>>>>/Contents 4 0 R>>\nendobj\n",
        b"4 0 obj\n<</Length %d>>\nstream\n%s\nendstream\nendobj\n"
        % (len(content), content),
        b"5 0 obj\n<</Type/Font/Subtype/Type0/BaseFont/FixtureCFF"
        b"/Encoding/Identity-H/DescendantFonts[6 0 R]>>\nendobj\n",
        b"6 0 obj\n<</Type/Font/Subtype/CIDFontType0/BaseFont/FixtureCFF"
        b"/FontDescriptor 7 0 R>>\nendobj\n",
        b"7 0 obj\n<</Type/FontDescriptor/FontName/FixtureCFF"
        b"/FontFile3 8 0 R>>\nendobj\n",
        b"8 0 obj\n<</Length %d/Subtype/Type1C>>\nstream\n%s\nendstream\nendobj\n"
        % (len(cff), cff),
    ]
    body = bytearray(b"%PDF-1.5\n")
    offsets = []
    for ob in objs:
        offsets.append(len(body))
        body += ob
    xref_pos = len(body)
    body += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        body += b"%010d 00000 n \n" % off
    body += (
        b"trailer\n<</Size %d/Root 1 0 R>>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_pos)
    )
    return bytes(body)


def make_scanned_g4_pdf() -> bytes:
    """CCITT Group 4 (T.6) scanned page — the compression real B/W scanners
    emit; 1-bit DeviceGray with /K -1 DecodeParms."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frappe_data_pipelines_spark.operators.faxmini import g4_encode

    w, h, rows = _scanned_raster()
    bitrows = [[1 if b < 128 else 0 for b in r] for r in rows]
    data = g4_encode(bitrows, w)
    extra = b"/DecodeParms<</K -1/Columns %d/Rows %d>>" % (w, h)
    return _scanned_pdf_from_image(w, h, data, b"CCITTFaxDecode", bpc=1, extra=extra)


def make_scanned_jbig2_pdf() -> bytes:
    """JBIG2 (arithmetic generic region, template 0) scanned page — the
    encoding modern B/W scanner pipelines embed; 1-bit DeviceGray,
    PDF-embedded segment stream (page info + immediate lossless generic
    region)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frappe_data_pipelines_spark.operators.jbig2mini import (
        jbig2_encode_embedded,
    )

    w, h, rows = _scanned_raster()
    bitrows = [bytes(1 if b < 128 else 0 for b in r) for r in rows]
    data = jbig2_encode_embedded(bitrows, w, h)
    return _scanned_pdf_from_image(w, h, data, b"JBIG2Decode", bpc=1)


def make_scanned_jbig2agg_pdf() -> bytes:
    """Multi-instance-aggregate JBIG2 scanned page (round 8): every glyph
    is dictionary-coded as a REFAGGNINST=2 aggregate of its LEFT and RIGHT
    half-glyphs — the nested-text-region dictionary path of 6.5.8.2 —
    with the last instance identity-refined inline (RI=1 inside the
    aggregate). Must OCR to the identical SCANNED_TEXT golden."""
    from frappe_data_pipelines_spark.operators.jbig2mini import (
        jbig2_encode_symbol_text_aggregate,
    )

    glyphs, placements, w, h = _scanned_symbol_layout()
    bases: list = []
    base_idx: dict = {}
    composites: list = []
    for g in glyphs:
        gw = len(g[0])
        half = gw // 2
        comp = []
        for lo, hi, off in ((0, half, 0), (half, gw, half)):
            part = [bytes(row[lo:hi]) for row in g]
            key = tuple(part)
            if key not in base_idx:
                base_idx[key] = len(bases)
                bases.append(part)
            comp.append((base_idx[key], off))
        composites.append(comp)
    data = jbig2_encode_symbol_text_aggregate(
        bases, composites, placements, w, h, inline_refine_last=True
    )
    return _scanned_pdf_from_image(w, h, data, b"JBIG2Decode", bpc=1)


def _scanned_symbol_layout():
    """Shared glyph/placement layout for the symbol-mode scanned fixtures:
    mirrors render_text_png's geometry so the symbol-coded page is pixel-
    identical to the raster fixtures. Returns (glyphs, placements, w, h)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frappe_data_pipelines_spark.operators.imaging import (
        FONT_5X7,
        GLYPH_H,
        GLYPH_W,
        _LINE_PITCH,
        _MARGIN,
        _PITCH,
    )

    lines = [ln.upper() for ln in SCANNED_TEXT.split("\n")]
    w = _MARGIN * 2 + max(len(ln) * _PITCH - 1 for ln in lines)
    h = _MARGIN * 2 + len(lines) * _LINE_PITCH - 2

    def glyph_bitmap(ch: str) -> list[bytes]:
        masks = FONT_5X7.get(ch, FONT_5X7["?"])
        return [
            bytes((m >> (GLYPH_W - 1 - gx)) & 1 for gx in range(GLYPH_W))
            for m in masks
        ][:GLYPH_H]

    glyphs: list[list[bytes]] = []
    idx: dict[str, int] = {}
    placements: list[tuple[int, int, int]] = []
    for li, ln in enumerate(lines):
        y0 = _MARGIN + li * _LINE_PITCH
        for ci, ch in enumerate(ln):
            if ch == " ":
                continue
            if ch not in idx:
                idx[ch] = len(glyphs)
                glyphs.append(glyph_bitmap(ch))
            placements.append((idx[ch], _MARGIN + ci * _PITCH, y0))
    return glyphs, placements, w, h


def make_scanned_jbig2sym_pdf() -> bytes:
    """JBIG2 SYMBOL-mode scanned page (VERDICT r5 #8): the same page as the
    generic-region fixture, but coded the way real scanned PDFs are —
    arithmetic symbol dictionary (one symbol per distinct glyph) + immediate
    text region placing instances, referred across segments. The page
    bitmap is constructed ONLY through the symbol/text decode path, yet
    must OCR to the identical SCANNED_TEXT golden."""
    from frappe_data_pipelines_spark.operators.jbig2mini import (
        jbig2_encode_symbol_text,
    )

    glyphs, placements, w, h = _scanned_symbol_layout()
    data = jbig2_encode_symbol_text(glyphs, placements, w, h)
    return _scanned_pdf_from_image(w, h, data, b"JBIG2Decode", bpc=1)


def make_scanned_jpxtiled_pdf() -> bytes:
    """Tiled JPX scanned page: the sepia RGB raster again, but as a 3x2
    TILE GRID (64x16 tiles, edge tiles clipped) of lossy 9/7+ICT
    tile-parts — the layout real scanners emit for large pages (one
    SOT/SOD per tile). Seam-free decode is part of the golden: OCR reads
    across tile boundaries."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frappe_data_pipelines_spark.operators.jp2mini import jp2_encode

    w, h, rows = _scanned_raster()
    r_p = [bytes(v for v in row) for row in rows]
    g_p = [bytes(v * 9 // 10 for v in row) for row in rows]
    b_p = [bytes(v * 3 // 4 for v in row) for row in rows]
    return _scanned_pdf_from_image(
        w, h,
        jp2_encode([r_p, g_p, b_p], levels=2, irreversible=True, step=0.5,
                   tile_size=(64, 16)),
        b"JPXDecode", colorspace=b"DeviceRGB",
    )


def make_scanned_jpxdq_pdf() -> bytes:
    """Derived-quantization JPX scanned page (round 8): gray 9/7 raster
    with QCD style 1 — ONE signalled (ε₀, μ₀) expanded per T.800 E-5 —
    split across a 2-tile grid whose tiles each carry TWO tile-parts
    (TPsot 0/1, whole-packet segments per A.4.2). The two remaining
    codestream-syntax profiles real encoders emit, in one fixture."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frappe_data_pipelines_spark.operators.jp2mini import jp2_encode

    w, h, rows = _scanned_raster()
    return _scanned_pdf_from_image(
        w, h,
        jp2_encode([rows], levels=2, irreversible=True, step=0.5,
                   mct=False, tile_size=(w, (h + 1) // 2),
                   derived_quant=True, tile_parts=2),
        b"JPXDecode",
    )


def make_scanned_jbig2huff_pdf() -> bytes:
    """JBIG2 HUFFMAN-family scanned page: the same symbol layout, but coded
    with SDHUFF=1/SBHUFF=1 — huffman symbol dictionary (standard tables
    B.4/B.2/B.1, MMR collective bitmaps through the T.6 kernel), custom
    FS/DS/DT table segments (type 53), and a huffman text region with
    run-coded symbol ID lengths — JBIG2's second coding family, added in
    round 6. Must OCR to the identical SCANNED_TEXT golden."""
    from frappe_data_pipelines_spark.operators.jbig2mini import (
        jbig2_encode_symbol_text_huffman,
    )

    glyphs, placements, w, h = _scanned_symbol_layout()
    data = jbig2_encode_symbol_text_huffman(
        glyphs, placements, w, h, collective="mmr"
    )
    return _scanned_pdf_from_image(w, h, data, b"JBIG2Decode", bpc=1)


def make_scanned_jbig2huffref_pdf() -> bytes:
    """Huffman text region WITH refinement (round 8): the same huffman
    page, but the last symbol instance carries an inline RI=1 refinement
    record — RDW/RDH/RDX/RDY through CUSTOM type-53 tables (the standard
    B.14/B.15 selector path is the separate jbig2stdtbl fixture), RSIZE
    through B.1, the instance's bitmap its own byte-aligned MQ codeword
    per 6.4.11. Must OCR to the identical SCANNED_TEXT golden."""
    from frappe_data_pipelines_spark.operators.jbig2mini import (
        jbig2_encode_symbol_text_huffman,
    )

    glyphs, placements, w, h = _scanned_symbol_layout()
    data = jbig2_encode_symbol_text_huffman(
        glyphs, placements, w, h, collective="mmr", inline_refine_last=True
    )
    return _scanned_pdf_from_image(w, h, data, b"JBIG2Decode", bpc=1)


def make_scanned_jbig2huffagg_pdf() -> bytes:
    """Huffman REFAGG scanned page (round 9): the half-glyph composite
    layout of the arithmetic aggregate fixture, but SDHUFF=1/SDREFAGG=1 —
    each glyph is a REFAGGNINST=2 nested huffman TEXT REGION over the
    Table 17 hardcoded standard tables (FS=B.6, DS=B.8, DT=B.11,
    refinement via B.15, RSIZE via B.1), the last aggregate instance
    identity-refined inline (RI=1), and the page text region selects the
    standard B.6/B.8/B.11 tables. Must OCR to the identical SCANNED_TEXT
    golden."""
    from frappe_data_pipelines_spark.operators.jbig2mini import (
        jbig2_encode_symbol_text_huffman_refagg,
    )

    glyphs, placements, w, h = _scanned_symbol_layout()
    bases: list = []
    base_idx: dict = {}
    composites: list = []
    for g in glyphs:
        gw = len(g[0])
        half = gw // 2
        comp = []
        for lo, hi, off in ((0, half, 0), (half, gw, half)):
            part = [bytes(row[lo:hi]) for row in g]
            key = tuple(part)
            if key not in base_idx:
                base_idx[key] = len(bases)
                bases.append(part)
            comp.append((base_idx[key], off))
        composites.append(comp)
    data = jbig2_encode_symbol_text_huffman_refagg(
        bases, composites, placements, w, h, refine_in_aggregate=True
    )
    return _scanned_pdf_from_image(w, h, data, b"JBIG2Decode", bpc=1)


def make_scanned_jbig2stdtbl_pdf() -> bytes:
    """Standard-table huffman scanned page (round 9): the huffman symbol
    layout with the page text region selecting the STANDARD Annex B
    tables through the public selector path — FS=B.6, DS=B.8, DT=B.11
    (initial-DT=1 trick, B.11 cannot code 0), and the last instance
    refined inline through the standard B.14 (RDW/RDH) and B.15 (RDX/RDY)
    selectors, RSIZE via B.1. No type-53 segments in the stream at all.
    Must OCR to the identical SCANNED_TEXT golden."""
    from frappe_data_pipelines_spark.operators.jbig2mini import (
        jbig2_encode_symbol_text_huffman,
    )

    glyphs, placements, w, h = _scanned_symbol_layout()
    data = jbig2_encode_symbol_text_huffman(
        glyphs, placements, w, h, collective="mmr",
        inline_refine_last=True, std_tables=True,
    )
    return _scanned_pdf_from_image(w, h, data, b"JBIG2Decode", bpc=1)


def make_mixed_text_image_pdf() -> bytes:
    """MIXED document (A10/A11 routing pin): page 1 carries Flate text,
    page 2 is an image-only scanned page (JBIG2 raster, no text operators),
    page 3 carries plain text. The reference's extractor skips textless
    pages ('if page_text', text_extraction.py:70-74) and its scanned
    detector samples average chars — a mixed doc is NOT scanned, so the
    golden is the two text pages joined by the page separator, method
    pdf-mini, and the image page contributes nothing."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from frappe_data_pipelines_spark.operators.jbig2mini import jbig2_encode_embedded

    w, h, rows = _scanned_raster()
    bitrows = [bytes(1 if px < 128 else 0 for px in r) for r in rows]
    jbig2 = jbig2_encode_embedded(bitrows, w, h)
    page1 = b"BT /F1 12 Tf (Mixed doc page one) Tj ET"
    page3_raw = b"BT /F1 12 Tf (Mixed doc page three) Tj ET"
    page3 = zlib.compress(page3_raw)
    img_content = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R 8 0 R] /Count 3 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 10 0 R >> >> /Contents 4 0 R >> endobj\n",
        b"4 0 obj << /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(page1), page1),
        b"5 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /XObject << /Im0 6 0 R >> >> /Contents 7 0 R >> endobj\n",
        b"6 0 obj << /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /JBIG2Decode "
        b"/Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (w, h, len(jbig2), jbig2),
        b"7 0 obj << /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(img_content), img_content),
        b"8 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 10 0 R >> >> /Contents 9 0 R >> endobj\n",
        b"9 0 obj << /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream\nendobj\n"
        % (len(page3), page3),
        b"10 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n",
    ]
    body = b"%PDF-1.4\n" + b"".join(objs)
    return body + b"trailer << /Root 1 0 R >>\n%%EOF\n"


def make_scanned_jbig2ref_pdf() -> bytes:
    """JBIG2 REFINEMENT-profile scanned page: dictionary 1 carries ROUGH
    glyphs (one corner pixel wrong), dictionary 2 REFAGG-refines each into
    the clean font, and the text region places the clean symbols with the
    final instance refined inline (RI=1) — the full GRTEMPLATE-1 path the
    round-6 decoder added, OCRing to the same golden text."""
    from frappe_data_pipelines_spark.operators.jbig2mini import (
        jbig2_encode_symbol_text_refagg,
    )

    clean, placements, w, h = _scanned_symbol_layout()

    def roughen(gl: list[bytes]) -> list[bytes]:
        top = bytearray(gl[0])
        top[0] ^= 1  # one wrong corner pixel the refinement must correct
        return [bytes(top)] + list(gl[1:])

    rough = [roughen(g) for g in clean]
    data = jbig2_encode_symbol_text_refagg(rough, clean, placements, w, h)
    return _scanned_pdf_from_image(w, h, data, b"JBIG2Decode", bpc=1)


def make_scanned_jbig2ref0_pdf() -> bytes:
    """Same refinement pipeline but GRTEMPLATE 0 — the 13-bit movable-AT
    refinement geometry: SDRAT pairs in the dictionary header, SBRAT pairs
    in the text-region header, and the AT-extended context in every
    refined pixel. OCRs to the same golden text."""
    from frappe_data_pipelines_spark.operators.jbig2mini import (
        jbig2_encode_symbol_text_refagg,
    )

    clean, placements, w, h = _scanned_symbol_layout()

    def roughen(gl: list[bytes]) -> list[bytes]:
        top = bytearray(gl[0])
        top[0] ^= 1
        return [bytes(top)] + list(gl[1:])

    rough = [roughen(g) for g in clean]
    data = jbig2_encode_symbol_text_refagg(
        rough, clean, placements, w, h, r_template=0
    )
    return _scanned_pdf_from_image(w, h, data, b"JBIG2Decode", bpc=1)


def make_scanned_jbig2nc_pdf() -> bytes:
    """Non-causal-AT1 refinement scanned page (round 10): the GRTEMPLATE 0
    refinement pipeline of the ref0 fixture, but with SDRAT/SBRAT A1 at
    (+1, 0) — one pixel RIGHT of the pixel being coded. Both sides read
    the not-yet-coded tap as 0 (the 6.2.5.7 convention; encoder reveals
    rows progressively). Must OCR to the identical SCANNED_TEXT golden."""
    from frappe_data_pipelines_spark.operators.jbig2mini import (
        jbig2_encode_symbol_text_refagg,
    )

    clean, placements, w, h = _scanned_symbol_layout()

    def roughen(gl: list[bytes]) -> list[bytes]:
        top = bytearray(gl[0])
        top[0] ^= 1
        return [bytes(top)] + list(gl[1:])

    rough = [roughen(g) for g in clean]
    data = jbig2_encode_symbol_text_refagg(
        rough, clean, placements, w, h,
        r_template=0, rat=((1, 0), (-1, -1)),
    )
    return _scanned_pdf_from_image(w, h, data, b"JBIG2Decode", bpc=1)


if __name__ == "__main__":
    main()
