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

SUPPORTED_EXTENSIONS = ["txt", "md", "pdf", "docx", "png", "jpg", "jpeg"]

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


def _stub_ocr(payload: bytes) -> tuple[str, float]:
    """A8/A9 stand-in: returns (text, confidence); the pytesseract fallback
    fixes confidence at 0.5 (ocr_service.py:162-187) — mirrored here."""
    return f"[ocr:{len(payload)} bytes]", 0.5


def extension_of(path_col) -> F.Column:
    """H8: lowercase final extension of a path column."""
    return F.lower(F.element_at(F.split(path_col, "\\."), -1))


def extract_text(
    binary_df: DataFrame,
    path_col: str = "path",
    content_col: str = "content",
    enabled_extensions: list[str] | None = None,
) -> DataFrame:
    """A2 extension-dispatch extraction over a binary source.

    The dispatch itself happens inside the pandas batch loop (one Python pass
    regardless of format mix); the B1 enabled-type gate is a pushed-down
    column filter BEFORE the Python boundary so disabled rows never cross
    Arrow."""
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
                elif ext == "docx":
                    text, method = _stub_docx(payload), "docx-stub"
                else:  # images → OCR stub (vision branch would append J3 output)
                    text, conf = _stub_ocr(payload)
                    method = "ocr-stub"
                out["path"].append(path)
                out["ext"].append(ext)
                out["text"].append(text)
                out["method"].append(method)
                out["confidence"].append(conf)
            yield pd.DataFrame(out)

    return narrow.mapInPandas(run, schema=EXTRACT_SCHEMA)


def is_scanned_heuristic(text_col, threshold: int = 50) -> F.Column:
    """A11 scanned-document detector: avg embedded text below the threshold →
    route to OCR (ocr_service.py:291-321). Column form for routing."""
    return F.length(F.trim(text_col)) < threshold
