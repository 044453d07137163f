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


EXPECTED_PDF_TEXT = (
    "Hello PDF world\nSecond line with (escaped) parens\nCafé menu"
    "\n\nFlate page two"
)
EXPECTED_DOCX_TEXT = (
    "Quarterly Report\nRevenue:\t42 units\n"
    "Café notes — 日本語 line one\nafter the break"
)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "sample.docx"), "wb") as f:
        f.write(make_docx())
    with open(os.path.join(OUT, "sample.pdf"), "wb") as f:
        f.write(make_pdf())
    with open(os.path.join(OUT, "sample.pdf.txt"), "w") as f:
        f.write(EXPECTED_PDF_TEXT)
    with open(os.path.join(OUT, "sample.docx.txt"), "w") as f:
        f.write(EXPECTED_DOCX_TEXT)
    print(f"wrote fixtures to {OUT}")


if __name__ == "__main__":
    main()
