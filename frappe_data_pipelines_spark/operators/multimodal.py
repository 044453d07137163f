"""Multimodal column operators — image/audio/video as opaque ``binary``
columns with typed metadata (SURVEY §2.A A7/A8/J3 restated for Spark).

The container has no image/audio decoders, so the decode kernels are STUBS:
``decode_image_meta(real=True)`` raises NotImplementedError where PIL/ffmpeg
would run; the default deterministic fake derives metadata purely from the
bytes (md5-seeded), so the Spark-side plumbing — binary schema, Arrow batch
shape, ``mapInPandas`` signature, partitioning — is real and tested while the
kernel stays swappable.

Reference parity: A7 image scan via vision (text_extraction.py:108-122), J3
vision description (vision_service.py:61-177) — both are "binary column in,
struct of metadata/description out" operators, exactly this shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("caption", T.StringType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for a real decoder: dims/frames derived from a
    hash of the bytes; caption from the leading bytes."""
    h = hashlib.md5(payload).digest()
    width = 320 + h[0] % 8 * 160
    height = 240 + h[1] % 8 * 120
    n_frames = 1 + h[2] % 4
    caption = "media:" + payload[:24].decode("utf-8", errors="replace")
    return width, height, n_frames, caption


def decode_media_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    bin_col: str = "content",
    mime_col: str = "mime",
    real: bool = False,
) -> DataFrame:
    """binary column → typed metadata struct rows via Arrow-batched
    ``mapInPandas``. One pass, shuffle-free; per-executor decoder init would
    live in the generator prologue (the lazy-singleton pattern)."""
    if real:
        raise NotImplementedError(
            "real decoders (PIL/ffmpeg/torchaudio) are not installed in this "
            "environment; the deterministic fake exercises identical plumbing"
        )
    narrow = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(bin_col).alias("content"),
        F.col(mime_col).alias("mime"),
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        # real decoders would be constructed HERE, once per executor task
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "mime", "n_bytes", "width", "height", "n_frames", "caption")}
            for doc_id, content, mime in zip(pdf["doc_id"], pdf["content"], pdf["mime"]):
                payload = bytes(content) if content is not None else b""
                w, h, nf, cap = _fake_decode(payload)
                out["doc_id"].append(doc_id)
                out["mime"].append(mime)
                out["n_bytes"].append(len(payload))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["caption"].append(cap)
            yield pd.DataFrame(out)

    return narrow.mapInPandas(run, schema=MEDIA_META_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for the testdata: treat each document's text bytes as an
    opaque media payload with a mime column — stands in for
    ``spark.read.format('binaryFile')`` which would produce the same
    (path, content BINARY) shape from real media files."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
    )


def frame_sample(media_meta: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: explode n_frames into (doc_id, frame_index)
    rows, keeping every ``every_n``-th frame — the video-pipeline shape
    (decode → sample → per-frame featurize) without a real decoder."""
    return media_meta.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_index"),
    ).filter(F.col("frame_index") % every_n == 0)
