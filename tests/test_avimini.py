"""AVI container codec (operators/avimini.py): round-trip, header
validation, corruption totality, and the Spark video-audit operator."""

from __future__ import annotations

import random

import pytest

from frappe_data_pipelines_spark.operators.avimini import (
    AviError,
    avi_parse,
    avi_write,
)
from frappe_data_pipelines_spark.operators.jpegmini import (
    jpeg_decode_gray,
    jpeg_encode_gray,
)


def _frames(n: int, w: int = 16, h: int = 8) -> list[bytes]:
    return [
        jpeg_encode_gray(
            [bytes((x * 3 + y * 5 + f * 11) % 256 for x in range(w)) for y in range(h)]
        )
        for f in range(n)
    ]


def test_roundtrip_preserves_frames_and_header():
    frames = _frames(3)
    m = avi_parse(avi_write(frames, 16, 8, fps=25))
    assert (m["width"], m["height"], m["fps"], m["n_frames_declared"]) == (16, 8, 25, 3)
    assert m["frames"] == frames
    w, h, _rows = jpeg_decode_gray(m["frames"][0])
    assert (w, h) == (16, 8)


def test_writer_refuses_empty_and_bad_fps():
    with pytest.raises(AviError):
        avi_write([], 16, 8)
    with pytest.raises(AviError):
        avi_write(_frames(1), 16, 8, fps=0)


def test_parser_totality_under_mutation():
    base = avi_write(_frames(2), 16, 8)
    rng = random.Random(5)
    for _ in range(400):
        b = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            avi_parse(bytes(b))
        except AviError:
            pass
    for bad in (b"", b"RIFF", b"RIFFxxxxAVI ", base[:40]):
        with pytest.raises(AviError):
            avi_parse(bad)


def test_video_frame_audit_operator(spark):
    from frappe_data_pipelines_spark.operators.multimodal import (
        documents_as_avi,
        video_frame_audit,
    )

    docs = spark.createDataFrame([(1,), (2,), (5,)], "doc_id long")
    rows = {r.doc_id: r for r in video_frame_audit(documents_as_avi(docs)).collect()}
    for d in (1, 2, 5):
        r = rows[d]
        assert (r.width, r.height, r.fps) == (16, 8, 10)
        assert r.n_frames == 1 + d % 3
        assert r.frames_intact and r.first_frame_decodes
        assert r.n_sampled == (r.n_frames + 1) // 2
        assert r.video_error is None


def test_video_frame_audit_dead_letters_corrupt_rows(spark):
    from frappe_data_pipelines_spark.operators.multimodal import video_frame_audit

    df = spark.createDataFrame(
        [(1, b"RIFFxxxxAVI "), (2, b""), (3, None)],
        "doc_id long, content binary",
    )
    rows = {r.doc_id: r for r in video_frame_audit(df).collect()}
    assert len(rows) == 3
    for d in (1, 2, 3):
        assert rows[d].video_error is not None
        assert rows[d].width is None
