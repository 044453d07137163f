"""Text extraction operators (SURVEY §2.A A2–A11).

The reference dispatches on file extension to per-format extractors
(text_extraction.py:13-40): pdfplumber (A3), encoding-fallback TXT (A4),
python-docx (A5), markdown passthrough (A6), vision (A7), PaddleOCR (A8/A9),
PDF-page render (A10), scanned-PDF detection (A11).

Spark-first restatement: ``spark.read.format("binaryFile")`` (or any
(path, content BINARY) source) → extension dispatch as a column expression →
per-format decode inside ONE Arrow-batched ``mapInPandas`` pass. Heavy format
parsers (pdfplumber/docx/OCR/vision models) are not installed in this
container, so those branches are deterministic STUBS behind the same
dispatch; the TXT decode chain (A4) is fully real — it is the only branch
whose semantics a general engine must reproduce exactly (UTF-8 → UTF-8-SIG →
latin-1 → cp1252 → ignore-errors).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the reference's full dispatch map (text_extraction.py:13-27): text formats
# plus every image extension it routes to the vision/OCR branch
SUPPORTED_EXTENSIONS = [
    "txt", "md", "pdf", "docx",
    "png", "jpg", "jpeg", "gif", "webp", "bmp", "tiff", "tif",
]

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("method", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
    ]
)


def decode_text_with_fallback(payload: bytes) -> tuple[str, str]:
    """A4: the reference's encoding-fallback chain
    (text_extraction.py:77-92), byte-exact."""
    for enc in ("utf-8", "utf-8-sig", "latin-1", "cp1252"):
        try:
            return payload.decode(enc), enc
        except (UnicodeDecodeError, ValueError):
            continue
    return payload.decode("utf-8", errors="ignore"), "utf-8+ignore"


def _stub_pdf(payload: bytes) -> str:
    """A3 stand-in: deterministic text derived from the payload (real branch
    would run pdfplumber per page and join with blank lines)."""
    return f"[pdf:{len(payload)} bytes]"


def _stub_docx(payload: bytes) -> str:
    return f"[docx:{len(payload)} bytes]"


# ---------------------------------------------------------------------------
# Real kernels (A3/A5) — stdlib-only, no external parser wheels.
#
# The reference's A3 runs pdfplumber (text_extraction.py:63-75) and A5 runs
# python-docx (:94-101). Neither wheel exists in this container, so these
# kernels parse the formats directly:
#   * DOCX is a zip of OOXML — zipfile + xml.etree cover the full
#     paragraph/run/tab/break text model python-docx exposes.
#   * PDF: a minimal object/stream parser — FlateDecode via zlib, then the
#     text-showing operators (Tj / TJ / ' / ") from each content stream in
#     document order. Covers single-byte-encoded (WinAnsi/ASCII) text PDFs;
#     CID/Type0 font cmaps are out of scope (documented), and any parse
#     failure falls back to the deterministic stub, so the operator never
#     hard-fails on exotic input.
# ---------------------------------------------------------------------------

_DOCX_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def docx_extract_text(payload: bytes) -> str:
    """A5 real kernel: paragraphs from word/document.xml, runs concatenated,
    w:tab → TAB, w:br → newline; paragraphs joined with newline (the same
    text model ``"\\n".join(p.text ...)`` yields under python-docx)."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(io.BytesIO(payload)) as z:
        info = z.getinfo("word/document.xml")
        # zip-bomb guard: the declared size gates the read (ZipFile honors
        # it — a lying header truncates and the XML parse fails instead)
        if info.file_size > 1 << 26:
            raise ValueError("DOCX document.xml exceeds size cap")
        root = ET.fromstring(z.read("word/document.xml"))
    paras = []
    for p in root.iter(f"{_DOCX_W}p"):
        parts: list[str] = []
        for node in p.iter():
            if node.tag == f"{_DOCX_W}t":
                parts.append(node.text or "")
            elif node.tag == f"{_DOCX_W}tab":
                parts.append("\t")
            elif node.tag == f"{_DOCX_W}br":
                parts.append("\n")
        paras.append("".join(parts))
    return "\n".join(paras)


_PDF_STREAM_RE = None  # compiled lazily on executors
_PDF_TEXT_OP_RE = None
_PDF_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_unescape(raw: bytes) -> bytes:
    import re as _re

    def sub(m):
        e = m.group(1)
        if e[:1].isdigit():
            return bytes([int(e, 8) & 0xFF])
        return _PDF_ESCAPES.get(e, e)

    return _re.sub(rb"\\([0-7]{1,3}|.)", sub, raw)


def pdf_extract_text(payload: bytes) -> str:
    """A3 real kernel, two tiers (VERDICT r4 #5):

    1. ``pdfmini.pdf_document_text`` — full object-graph walk: xref tables
       AND PDF-1.5 xref/object streams, page-tree document order, Type0/CID
       fonts via ToUnicode CMaps, hex-string show ops (what pdfplumber does
       for the reference at text_extraction.py:63-75).
    2. On any structural failure, the round-4 stream-order scan below:
       decompress top-level content streams, emit Tj / ' / " / TJ strings
       in byte order — one line per showing op, streams joined with a blank
       line. Handles truncated/damaged files tier 1 refuses."""
    from frappe_data_pipelines_spark.operators.pdfmini import (
        PdfParseError,
        pdf_document_text,
    )

    try:
        return pdf_document_text(payload)
    except PdfParseError:
        return _pdf_extract_streamorder(payload)


def _pdf_extract_streamorder(payload: bytes) -> str:
    global _PDF_STREAM_RE, _PDF_TEXT_OP_RE
    import re as _re
    import zlib

    if _PDF_STREAM_RE is None:
        _PDF_STREAM_RE = _re.compile(
            rb"<<(.*?)>>\s*stream\r?\n(.*?)\r?\nendstream", _re.DOTALL
        )
        _PDF_TEXT_OP_RE = _re.compile(
            rb"(?:\(((?:\\.|[^\\()])*)\)\s*(?:Tj|'|\")"  # literal-string ops
            rb"|\[((?:\\.|[^\]])*)\]\s*TJ)",  # array op
            _re.DOTALL,
        )
    pages: list[str] = []
    for m in _PDF_STREAM_RE.finditer(payload):
        meta, data = m.group(1), m.group(2)
        if b"/FlateDecode" in meta:
            try:
                # bounded inflate (pdfmini._MAX_STREAM convention): a
                # flate-bombed stream is skipped, not expanded unbounded
                d = zlib.decompressobj()
                data = d.decompress(data, (1 << 26) + 1)
            except zlib.error:
                continue
            if len(data) > 1 << 26 or not d.eof:
                # over-cap or truncated (plain zlib.decompress raised on
                # truncation; keep skipping those streams, never emit a
                # half-decoded prefix as extracted text)
                continue
        if b"BT" not in data:
            continue  # not a text content stream (image XObject, fonts, ...)
        lines: list[str] = []
        for op in _PDF_TEXT_OP_RE.finditer(data):
            if op.group(1) is not None:
                lines.append(_pdf_unescape(op.group(1)).decode("latin-1"))
            else:
                inner = _re.findall(rb"\(((?:\\.|[^\\()])*)\)", op.group(2))
                lines.append(
                    "".join(_pdf_unescape(s).decode("latin-1") for s in inner)
                )
        if lines:
            pages.append("\n".join(lines))
    if not pages:
        raise ValueError("no text content streams found")
    return "\n\n".join(pages)


def pdf_ocr_scanned(payload: bytes) -> tuple[str, float]:
    """A10 REAL render→OCR hand-off for scanned PDFs: extract each page's
    embedded raster (image XObjects via the pdfmini graph walk — the
    equivalent of the reference's PyMuPDF 2x-zoom page render,
    ocr_service.py:228-289), then run the real bitmap OCR kernel per page.
    Pages joined with a blank line; confidence is the page average —
    mirroring the reference's per-page OCR loop. Raises when the PDF has no
    decodable embedded rasters (caller falls back to the stub)."""
    from frappe_data_pipelines_spark.operators.imaging import ocr_bitmap, png_encode
    from frappe_data_pipelines_spark.operators.pdfmini import pdf_page_images

    texts: list[str] = []
    confs: list[float] = []
    for _w, _h, channels, rows in pdf_page_images(payload):
        png = png_encode(rows, color_type=0 if channels == 1 else 2)
        result = ocr_bitmap(png)
        if result["text"]:
            texts.append(result["text"])
            confs.append(result["confidence"])
    if not texts:
        raise ValueError("no OCR-able page images")
    return "\n\n".join(texts), round(sum(confs) / len(confs), 6)


def _stub_ocr(payload: bytes) -> tuple[str, float]:
    """A8/A9 stand-in for non-decodable images: returns (text, confidence);
    the pytesseract fallback fixes confidence at 0.5
    (ocr_service.py:162-187) — mirrored here. With ``real_kernels=True``
    decodable bitmaps instead run the real OCR kernel
    (``operators/imaging.py: ocr_bitmap`` — segmentation + template match
    with per-line bboxes), and this stub is only the A9-style fallback."""
    return f"[ocr:{len(payload)} bytes]", 0.5


def extension_of(path_col) -> F.Column:
    """H8: lowercase final extension of a path column."""
    return F.lower(F.element_at(F.split(path_col, "\\."), -1))


def extract_text(
    binary_df: DataFrame,
    path_col: str = "path",
    content_col: str = "content",
    enabled_extensions: list[str] | None = None,
    real_kernels: bool = False,
) -> DataFrame:
    """A2 extension-dispatch extraction over a binary source.

    The dispatch itself happens inside the pandas batch loop (one Python pass
    regardless of format mix); the B1 enabled-type gate is a pushed-down
    column filter BEFORE the Python boundary so disabled rows never cross
    Arrow.

    ``real_kernels=True`` runs the stdlib PDF/DOCX parsers above (method
    ``pdf-mini`` / ``docx-xml``), falling back per-row to the deterministic
    stub on any parse failure — the operator's output stays total. The
    default stays ``False`` so synthetic-corpus oracles remain stable."""
    enabled = [e for e in (enabled_extensions or SUPPORTED_EXTENSIONS) if e in SUPPORTED_EXTENSIONS]
    narrow = binary_df.select(
        F.col(path_col).alias("path"),
        F.col(content_col).alias("content"),
        extension_of(F.col(path_col)).alias("ext"),
    ).filter(F.col("ext").isin(enabled))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("path", "ext", "text", "method", "confidence")}
            for path, content, ext in zip(pdf["path"], pdf["content"], pdf["ext"]):
                payload = bytes(content) if content is not None else b""
                conf = 1.0
                if ext in ("txt", "md"):
                    text, method = decode_text_with_fallback(payload)
                elif ext == "pdf":
                    text, method = _stub_pdf(payload), "pdf-stub"
                    if real_kernels:
                        try:
                            text, method = pdf_extract_text(payload), "pdf-mini"
                        except Exception:  # noqa: BLE001 — no embedded text
                            # A10/A11: textless PDF → try the scanned path
                            # (page images → OCR) before giving up
                            try:
                                text, conf = pdf_ocr_scanned(payload)
                                method = "pdf-ocr"
                            except Exception:  # noqa: BLE001 — per-row fallback
                                pass
                elif ext == "docx":
                    text, method = _stub_docx(payload), "docx-stub"
                    if real_kernels:
                        try:
                            text, method = docx_extract_text(payload), "docx-xml"
                        except Exception:  # noqa: BLE001
                            pass
                else:  # images → OCR (vision branch would append J3 output)
                    text, conf = _stub_ocr(payload)
                    method = "ocr-stub"
                    if real_kernels:
                        try:
                            from frappe_data_pipelines_spark.operators.imaging import (
                                ocr_bitmap,
                            )

                            res = ocr_bitmap(payload)
                            text, conf = res["text"], res["confidence"]
                            method = "ocr-bitmap"
                        except Exception:  # noqa: BLE001 — non-fixture image
                            pass
                out["path"].append(path)
                out["ext"].append(ext)
                out["text"].append(text)
                out["method"].append(method)
                out["confidence"].append(conf)
            yield pd.DataFrame(out)

    return narrow.mapInPandas(run, schema=EXTRACT_SCHEMA)


OCR_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("detected_languages", T.ArrayType(T.StringType())),
        T.StructField(
            "bounding_boxes",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("bbox", T.ArrayType(T.ArrayType(T.FloatType()))),
                        T.StructField("text", T.StringType()),
                        T.StructField("confidence", T.DoubleType()),
                    ]
                )
            ),
        ),
    ]
)


def ocr_images(
    binary_df: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """A8 full OCR scan: binary images → the reference's OCRResult struct
    (text, confidence, detected_languages, per-line bounding_boxes with
    4-corner bbox — ocr_service.py:14-20, 140-150, SURVEY §1.2). Arrow-
    batched ``mapInPandas``; the kernel is the stdlib bitmap OCR
    (``operators/imaging.py: ocr_bitmap``). Undecodable payloads yield the
    A9 fallback row (stub text, confidence 0.5, no boxes) instead of
    failing the batch."""
    narrow = binary_df.select(
        F.col(path_col).alias("path"), F.col(content_col).alias("content")
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from frappe_data_pipelines_spark.operators.imaging import ocr_bitmap

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                try:
                    r = ocr_bitmap(payload)
                    rows.append(
                        (path, r["text"], r["confidence"], r["detected_languages"],
                         [(b["bbox"], b["text"], b["confidence"])
                          for b in r["bounding_boxes"]])
                    )
                except Exception:  # noqa: BLE001 — A9 fallback branch
                    text, conf = _stub_ocr(payload)
                    rows.append((path, text, conf, ["unknown"], []))
            yield pd.DataFrame(
                rows,
                columns=["path", "text", "confidence", "detected_languages",
                         "bounding_boxes"],
            )

    return narrow.mapInPandas(run, schema=OCR_RESULT_SCHEMA)


def is_scanned_heuristic(text_col, threshold: int = 50) -> F.Column:
    """A11 scanned-document detector: avg embedded text below the threshold →
    route to OCR (ocr_service.py:291-321). Column form for routing."""
    return F.length(F.trim(text_col)) < threshold
