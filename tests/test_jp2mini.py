"""JPEG 2000 minimal reversible profile (operators/jp2mini.py).

Layered validation, mirroring the JBIG2 module's posture: exact wavelet
round-trip (hypothesis over dims/values), EBCOT Tier-1 block round-trip
across bands and magnitudes, full codestream round-trip, JP2 box unwrap,
honest refusals for out-of-profile streams, corruption totality, and the
scanned-PDF → OCR integration fixture reading the exact golden text.
"""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from frappe_data_pipelines_spark.operators.jp2mini import (
    Jp2Error,
    _fwd53,
    _inv53,
    dwt53_forward,
    dwt53_inverse,
    jp2_decode_gray,
    jp2_encode_gray,
    t1_decode_block,
    t1_encode_block,
)

SCANNED_TEXT = "SCANNED ARCHIVE BOX 7\nREF NO: 2019-114"


class TestDwt53:
    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=40))
    def test_1d_roundtrip(self, x):
        lo, hi = _fwd53(x)
        assert _inv53(lo, hi) == x
        assert len(lo) + len(hi) == len(x)

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(1, 20),
        st.integers(1, 20),
        st.integers(1, 3),
        st.integers(0, 2**32 - 1),
    )
    def test_2d_roundtrip(self, h, w, levels, seed):
        rng = random.Random(seed)
        m = [[rng.randint(-255, 255) for _ in range(w)] for _ in range(h)]
        assert dwt53_inverse(dwt53_forward(m, levels)) == m

    def test_lowpass_tracks_dc(self):
        # a flat image decomposes to a flat LL and zero detail bands
        m = [[77] * 16 for _ in range(16)]
        bands = dwt53_forward(m, 2)
        assert all(v == 77 for r in bands[-1]["LL"] for v in r)
        for d in bands[:-1]:
            for n in ("HL", "LH", "HH"):
                assert all(v == 0 for r in d[n] for v in r)


class TestTier1:
    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(1, 12),
        st.integers(1, 12),
        st.sampled_from(["LL", "HL", "LH", "HH"]),
        st.integers(0, 511),
        st.integers(0, 2**32 - 1),
    )
    def test_block_roundtrip(self, h, w, band, mx, seed):
        rng = random.Random(seed)
        m = [
            [rng.randint(-mx, mx) if rng.random() < 0.6 else 0 for _ in range(w)]
            for _ in range(h)
        ]
        data, planes, n_passes = t1_encode_block(m, band)
        assert t1_decode_block(data, w, h, band, planes, n_passes) == m

    def test_zero_block(self):
        m = [[0] * 5 for _ in range(7)]
        data, planes, n_passes = t1_encode_block(m, "HH")
        assert (data, planes, n_passes) == (b"", 0, 0)
        assert t1_decode_block(b"", 5, 7, "HH", 0, 0) == m

    def test_pass_count_matches_planes(self):
        m = [[5, -3], [0, 7]]  # max magnitude 7 → 3 planes → 3*3-2 passes
        _data, planes, n_passes = t1_encode_block(m, "LL")
        assert planes == 3 and n_passes == 7


class TestCodestream:
    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(4, 40),
        st.integers(4, 40),
        st.integers(1, 3),
        st.integers(0, 2**32 - 1),
    )
    def test_roundtrip_random(self, h, w, levels, seed):
        rng = random.Random(seed)
        rows = [bytes(rng.randrange(256) for _ in range(w)) for _ in range(h)]
        got_w, got_h, out = jp2_decode_gray(jp2_encode_gray(rows, levels))
        assert (got_w, got_h) == (w, h) and out == rows

    def test_wide_short_raster(self):
        # scan-shaped: wider than 64 → rectangular code-blocks (128×32)
        rng = random.Random(9)
        rows = [bytes(rng.randrange(256) for _ in range(129)) for _ in range(20)]
        assert jp2_decode_gray(jp2_encode_gray(rows, 2))[2] == rows

    def test_bilevel_text_raster(self):
        from frappe_data_pipelines_spark.operators.imaging import (
            png_decode,
            render_text_png,
        )

        _w, _h, _c, rows = png_decode(render_text_png(SCANNED_TEXT))
        assert jp2_decode_gray(jp2_encode_gray(rows, 2))[2] == rows

    def test_jp2_box_wrapper(self):
        rows = [bytes([10, 200, 30, 40])] * 4
        cs = jp2_encode_gray(rows, 1)
        sig = b"\x00\x00\x00\x0cjP  \r\n\x87\n"
        ftyp = struct.pack(">I", 20) + b"ftypjp2 " + b"\x00\x00\x00\x00jp2 "
        jp2c = struct.pack(">I", 8 + len(cs)) + b"jp2c" + cs
        assert jp2_decode_gray(sig + ftyp + jp2c)[2] == rows

    def test_refuses_out_of_profile(self):
        rows = [bytes([1, 2, 3, 4])] * 4
        cs = bytearray(jp2_encode_gray(rows, 1))
        # flip the transform byte (5/3 → 9/7 irreversible) inside COD
        cod_at = bytes(cs).find(b"\xff\x52")
        cs2 = bytearray(cs)
        cs2[cod_at + 13] = 0  # SPcod transform byte
        with pytest.raises(Jp2Error):
            jp2_decode_gray(bytes(cs2))
        with pytest.raises(Jp2Error):
            jp2_decode_gray(b"\xff\x4f\xff\xd9")  # no SIZ/COD/SOD
        with pytest.raises((Jp2Error, ValueError)):
            jp2_decode_gray(b"not a codestream")

    def test_hostile_siz_dims_raise_before_allocation(self):
        """A crawl payload declaring absurd SIZ dims must dead-letter
        (Jp2Error) instead of allocating w*h*nc pixel planes — the
        jbig2mini _MAX_PIXELS convention applied here."""
        rows = [bytes([1, 2, 3, 4])] * 4
        cs = bytearray(jp2_encode_gray(rows, 1))
        siz_at = bytes(cs).find(b"\xff\x51")
        body = siz_at + 4  # 2-byte marker + 2-byte length
        for xsiz, ysiz in ((0xFFFFFFF0, 0xFFFFFFF0), (1 << 20, 1 << 20)):
            hostile = bytearray(cs)
            hostile[body + 2 : body + 6] = struct.pack(">I", xsiz)
            hostile[body + 6 : body + 10] = struct.pack(">I", ysiz)
            with pytest.raises(Jp2Error, match="cap"):
                jp2_decode_gray(bytes(hostile))
        zero = bytearray(cs)
        zero[body + 2 : body + 6] = struct.pack(">I", 0)
        with pytest.raises(Jp2Error, match="zero image dims"):
            jp2_decode_gray(bytes(zero))

    def test_corruption_totality(self):
        rng = random.Random(13)
        rows = [bytes(rng.randrange(256) for _ in range(16)) for _ in range(16)]
        cs = jp2_encode_gray(rows, 2)
        for _ in range(200):
            b = bytearray(cs)
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
            try:
                jp2_decode_gray(bytes(b))
            except (Jp2Error, ValueError, IndexError, struct.error):
                pass  # any *declared* failure is fine; hangs/other types are not


def test_multimodal_sniffs_jp2():
    """Standalone .jp2 payloads (box wrapper AND raw codestream) decode
    through the multimodal real-decode path."""
    from frappe_data_pipelines_spark.operators import multimodal

    rows = [bytes([0, 128, 255, 64])] * 4
    cs = jp2_encode_gray(rows, 1)
    assert multimodal._real_decode(cs) == (4, 4, 1, "image/jp2 4x4 gray")
    sig = b"\x00\x00\x00\x0cjP  \r\n\x87\n"
    jp2c = struct.pack(">I", 8 + len(cs)) + b"jp2c" + cs
    assert multimodal._real_decode(sig + jp2c) == (4, 4, 1, "image/jp2 4x4 gray")


def test_jpx_fixture_pdf_ocrs_to_golden():
    """Integration: the /JPXDecode scanned-PDF fixture decodes through
    pdf_page_images and the bitmap OCR reads the exact golden text."""
    import os

    from frappe_data_pipelines_spark.operators.imaging import ocr_bitmap, png_encode
    from frappe_data_pipelines_spark.operators.pdfmini import pdf_page_images

    fixtures = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "frappe_data_pipelines_spark", "resources", "fixtures",
    )
    with open(os.path.join(fixtures, "sample_scanned_jpx.pdf"), "rb") as f:
        payload = f.read()
    images = pdf_page_images(payload)
    assert len(images) == 1
    w, h, channels, rows = images[0]
    assert channels == 1 and (w, h) == (129, 20)
    res = ocr_bitmap(png_encode(rows))
    assert res["text"] == SCANNED_TEXT
    assert res["confidence"] == 1.0


class TestIrreversibleAndColor:
    """9/7 + quantization + multi-component profiles (round 6): exact
    round-trips where the math is exact (RCT+5/3), error-bounded ones where
    it is quantized (9/7), and honest refusals for out-of-profile QCD."""

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=40))
    def test_97_1d_roundtrip_close(self, x):
        from frappe_data_pipelines_spark.operators.jp2mini import _fwd97, _inv97

        lo, hi = _fwd97(x)
        back = _inv97(lo, hi)
        assert len(lo) + len(hi) == len(x)
        assert all(abs(a - b) < 1e-6 for a, b in zip(back, x))

    def test_97_kills_dc_in_highpass(self):
        from frappe_data_pipelines_spark.operators.jp2mini import _fwd97

        lo, hi = _fwd97([77.0] * 16)
        # DC gain 1 on the low band, ~0 on the high band (CDF 9/7 with the
        # 1/K low-pass normalization)
        assert all(abs(v - 77.0) < 1e-9 for v in lo)
        assert all(abs(v) < 1e-9 for v in hi)

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(2, 24),
        st.integers(2, 24),
        st.integers(1, 3),
        st.integers(0, 2**32 - 1),
    )
    def test_gray_lossy_error_bounded(self, h, w, levels, seed):
        rng = random.Random(seed)
        rows = [bytes(rng.randrange(256) for _ in range(w)) for _ in range(h)]
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        cs = jp2_encode([rows], levels=levels, irreversible=True, step=0.5)
        dw, dh, comps = jp2_decode(cs)
        assert (dw, dh, len(comps)) == (w, h, 1)
        err = max(
            abs(a - b) for ra, rb in zip(comps[0], rows) for a, b in zip(ra, rb)
        )
        # midpoint reconstruction of a step-0.5 quantizer, through two float
        # transforms: worst case a few gray levels even on pure noise
        assert err <= 4

    @settings(max_examples=20, deadline=None)
    @given(st.integers(2, 20), st.integers(2, 20), st.integers(0, 2**32 - 1))
    def test_rgb_lossless_rct_exact(self, h, w, seed):
        rng = random.Random(seed)
        comps = [
            [bytes(rng.randrange(256) for _ in range(w)) for _ in range(h)]
            for _ in range(3)
        ]
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        cs = jp2_encode(comps, levels=2, irreversible=False)
        dw, dh, out = jp2_decode(cs)
        assert (dw, dh) == (w, h)
        assert [[bytes(r) for r in c] for c in out] == comps

    def test_rgb_lossy_ict_error_bounded(self):
        rng = random.Random(99)
        comps = [
            [bytes(rng.randrange(256) for _ in range(31)) for _ in range(17)]
            for _ in range(3)
        ]
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        cs = jp2_encode(comps, levels=2, irreversible=True, step=0.5)
        _w, _h, out = jp2_decode(cs)
        err = max(
            abs(a - b)
            for c, oc in zip(comps, out)
            for ra, rb in zip(c, oc)
            for a, b in zip(ra, rb)
        )
        assert err <= 6

    def test_quantization_actually_compresses(self):
        # a gradient with low-amplitude sensor noise: lossless must spend
        # ~2 bits/px on the noise planes, a coarse quantizer deletes them —
        # the lossy stream must be much smaller
        rng = random.Random(3)
        rows = [
            bytes(min(255, (x + y) // 2 + rng.randrange(4)) for x in range(64))
            for y in range(64)
        ]
        from frappe_data_pipelines_spark.operators.jp2mini import jp2_encode

        lossless = jp2_encode([rows], levels=3, irreversible=False)
        lossy = jp2_encode([rows], levels=3, irreversible=True, step=8.0)
        assert len(lossy) < len(lossless) / 2

    def test_coarser_step_is_smaller_and_noisier(self):
        rng = random.Random(5)
        rows = [bytes(rng.randrange(256) for _ in range(32)) for _ in range(32)]
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        sizes, errs = [], []
        for step in (0.5, 2.0, 8.0):
            cs = jp2_encode([rows], levels=2, irreversible=True, step=step)
            _w, _h, (g,) = jp2_decode(cs)
            sizes.append(len(cs))
            errs.append(
                max(abs(a - b) for ra, rb in zip(g, rows) for a, b in zip(ra, rb))
            )
        assert sizes[0] > sizes[1] > sizes[2]
        assert errs[0] < errs[1] < errs[2]

    def test_refusals(self):
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        rows = [bytes([0, 255] * 4)] * 8
        with pytest.raises(Jp2Error):
            jp2_encode([rows, rows], levels=1)  # 2 components
        with pytest.raises(Jp2Error):
            jp2_encode([rows], levels=1, irreversible=True, step=-1.0)
        # style bits flipped to 1 on an EXPOUNDED body: style 1 carries
        # exactly one SPqcd, so the oversized body refuses as malformed
        cs = bytearray(jp2_encode([rows], levels=1, irreversible=True))
        qcd_at = bytes(cs).find(b"\xff\x5c")
        cs[qcd_at + 4] = (cs[qcd_at + 4] & 0xE0) | 1
        with pytest.raises(Jp2Error, match="exactly one SPqcd"):
            jp2_decode(bytes(cs))

    def test_lossy_corruption_totality(self):
        rng = random.Random(21)
        comps = [
            [bytes(rng.randrange(256) for _ in range(12)) for _ in range(12)]
            for _ in range(3)
        ]
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        cs = jp2_encode(comps, levels=2, irreversible=True, step=1.0)
        for _ in range(200):
            b = bytearray(cs)
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
            try:
                jp2_decode(bytes(b))
            except (Jp2Error, ValueError, IndexError, struct.error):
                pass


def test_jpx97_fixture_pdf_ocrs_to_golden():
    """Integration: the LOSSY COLOR /JPXDecode fixture (9/7 + quantization +
    ICT, sepia-tinted page) decodes through pdf_page_images (luma merge) and
    the bitmap OCR reads the exact golden text through the quantization
    noise."""
    import os

    from frappe_data_pipelines_spark.operators.imaging import ocr_bitmap, png_encode
    from frappe_data_pipelines_spark.operators.pdfmini import pdf_page_images

    fixtures = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "frappe_data_pipelines_spark", "resources", "fixtures",
    )
    with open(os.path.join(fixtures, "sample_scanned_jpx97.pdf"), "rb") as f:
        payload = f.read()
    images = pdf_page_images(payload)
    assert len(images) == 1
    _w, _h, channels, rows = images[0]
    assert channels == 1
    res = ocr_bitmap(png_encode(rows))
    assert res["text"] == SCANNED_TEXT
    assert res["confidence"] == 1.0


def test_multimodal_sniffs_color_jp2():
    from frappe_data_pipelines_spark.operators import multimodal
    from frappe_data_pipelines_spark.operators.jp2mini import jp2_encode

    comps = [[bytes([10, 20, 30, 40])] * 4 for _ in range(3)]
    cs = jp2_encode(comps, levels=1, irreversible=True, step=1.0)
    # one FRAME (still image); the component count rides in the caption
    assert multimodal._real_decode(cs) == (4, 4, 1, "image/jp2 4x4 rgb")


def test_malformed_qcd_raises_jp2error_not_struct_error():
    """Review regression: a truncated/odd QCD segment must raise Jp2Error
    (the type the PDF dispatch catches for its filter fallback), never a
    bare struct.error or IndexError."""
    import struct as _struct

    from frappe_data_pipelines_spark.operators.jp2mini import (
        Jp2Error,
        jp2_decode,
        jp2_encode,
    )

    cs = bytes(jp2_encode([[bytes([0, 255] * 4)] * 8], levels=1, irreversible=True))
    q = cs.find(b"\xff\x5c")
    (ln,) = _struct.unpack(">H", cs[q + 2 : q + 4])
    # odd-length style-2 payload
    odd = cs[: q + 2] + _struct.pack(">H", ln - 1) + cs[q + 4 : q + 2 + ln - 1] + cs[q + 2 + ln :]
    with pytest.raises(Jp2Error, match="odd-length"):
        jp2_decode(odd)
    # one (eps, mu) entry short of the subband count
    short = cs[: q + 2] + _struct.pack(">H", ln - 2) + cs[q + 4 : q + 2 + ln - 2] + cs[q + 2 + ln :]
    with pytest.raises(Jp2Error, match="fewer entries"):
        jp2_decode(short)


class TestMultiTile:
    """Multi-tile codestreams (round 6): one SOT/SOD tile-part per tile,
    row-major grid, edge tiles clipped — the layout real scanners use for
    large pages."""

    @settings(max_examples=20, deadline=None)
    @given(
        st.integers(5, 40),
        st.integers(5, 40),
        st.integers(2, 16),
        st.integers(2, 16),
        st.integers(0, 2**32 - 1),
    )
    def test_gray_lossless_tiled_exact(self, h, w, xt, yt, seed):
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        rng = random.Random(seed)
        rows = [bytes(rng.randrange(256) for _ in range(w)) for _ in range(h)]
        dw, dh, (g,) = jp2_decode(
            jp2_encode([rows], levels=2, tile_size=(xt, yt))
        )
        assert (dw, dh) == (w, h) and g == rows

    def test_rgb_both_profiles_tiled(self):
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        rng = random.Random(11)
        comps = [
            [bytes(rng.randrange(256) for _ in range(29)) for _ in range(21)]
            for _ in range(3)
        ]
        # lossless RCT: exact through an uneven 2x3 grid
        _w, _h, out = jp2_decode(
            jp2_encode(comps, levels=2, tile_size=(12, 11))
        )
        assert [[bytes(r) for r in c] for c in out] == comps
        # lossy ICT: error-bounded through the same grid
        _w, _h, out = jp2_decode(
            jp2_encode(comps, levels=2, irreversible=True, step=0.5,
                       tile_size=(12, 11))
        )
        err = max(
            abs(a - b)
            for c, oc in zip(comps, out)
            for ra, rb in zip(c, oc)
            for a, b in zip(ra, rb)
        )
        assert err <= 6

    def test_tile_seams_are_exact_on_lossless(self):
        # a gradient crossing every tile boundary: any seam artifact would
        # break exactness
        rows = [bytes(min(255, x + y) for x in range(33)) for y in range(17)]
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        assert jp2_decode(jp2_encode([rows], levels=3, tile_size=(8, 8)))[2][0] == rows

    def test_tiled_refusals_and_totality(self):
        import struct as _struct

        from frappe_data_pipelines_spark.operators.jp2mini import (
            Jp2Error,
            jp2_decode,
            jp2_encode,
        )

        rows = [bytes([7, 99] * 8)] * 8
        with pytest.raises(Jp2Error):
            jp2_encode([rows], levels=1, tile_size=(0, 4))
        cs = bytearray(jp2_encode([rows], levels=1, tile_size=(8, 8)))
        # duplicate tile index: flip the second SOT's Isot to 0 — with
        # TPsot still 0 that is a tile-part order violation for tile 0
        sot1 = bytes(cs).find(b"\xff\x90")
        sot2 = bytes(cs).find(b"\xff\x90", sot1 + 2)
        cs2 = bytearray(cs)
        cs2[sot2 + 4 : sot2 + 6] = (0).to_bytes(2, "big")
        with pytest.raises(Jp2Error, match="out of order|grid needs"):
            jp2_decode(bytes(cs2))
        # missing tile: truncate before the second SOT (and keep EOC)
        cs3 = bytes(cs[:sot2]) + b"\xff\xd9"
        with pytest.raises(Jp2Error, match="grid needs"):
            jp2_decode(cs3)
        # bit-flip totality over the tiled stream
        rng = random.Random(23)
        for _ in range(200):
            b = bytearray(cs)
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
            try:
                jp2_decode(bytes(b))
            except (Jp2Error, ValueError, IndexError, _struct.error):
                pass


def test_tiled_fixture_pdf_ocrs_to_golden():
    """The committed TILED lossy-color /JPXDecode fixture (3x2 grid of
    64x16 tiles) must OCR to the exact golden in the fast unit suite, not
    only through the Spark catalog query."""
    import os

    from frappe_data_pipelines_spark.operators.extraction import pdf_ocr_scanned

    fixtures = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "frappe_data_pipelines_spark", "resources", "fixtures",
    )
    with open(os.path.join(fixtures, "sample_scanned_jpxtiled.pdf"), "rb") as f:
        data = f.read()
    text, conf = pdf_ocr_scanned(data)
    assert text == SCANNED_TEXT
    assert conf == 1.0


def test_tile_grid_beyond_u16_isot_refuses():
    """Review regression: Isot is a u16 — a grid over 65535 tiles must
    raise Jp2Error, not struct.error."""
    from frappe_data_pipelines_spark.operators.jp2mini import jp2_encode

    rows = [bytes(300) for _ in range(300)]
    with pytest.raises(Jp2Error, match="Isot"):
        jp2_encode([rows], levels=0, tile_size=(1, 1))


class TestQualityLayers:
    """Multiple quality layers (round 6): the per-block pass/byte split
    across layers must be decode-transparent — a full decode of an L-layer
    stream is bit-identical to the single-layer decode."""

    @settings(max_examples=15, deadline=None)
    @given(
        st.integers(4, 30),
        st.integers(4, 30),
        st.integers(2, 5),
        st.booleans(),
        st.integers(0, 2**32 - 1),
    )
    def test_layered_decode_equals_single_layer(self, h, w, layers, irr, seed):
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        rng = random.Random(seed)
        rows = [bytes(rng.randrange(256) for _ in range(w)) for _ in range(h)]
        ref = jp2_decode(jp2_encode([rows], levels=2, irreversible=irr))
        got = jp2_decode(
            jp2_encode([rows], levels=2, irreversible=irr, n_layers=layers)
        )
        assert got == ref
        if not irr:
            assert got[2][0] == rows  # lossless stays exact through layers

    def test_layers_compose_with_tiles_and_color(self):
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        rng = random.Random(31)
        comps = [
            [bytes(rng.randrange(256) for _ in range(33)) for _ in range(21)]
            for _ in range(3)
        ]
        ref = jp2_decode(
            jp2_encode(comps, levels=2, irreversible=True, step=0.5,
                       tile_size=(16, 8))
        )
        got = jp2_decode(
            jp2_encode(comps, levels=2, irreversible=True, step=0.5,
                       tile_size=(16, 8), n_layers=3)
        )
        assert got == ref

    def test_more_layers_than_passes(self):
        # blocks whose pass count is below the layer count contribute to a
        # subset of layers (first-inclusion may be a later layer)
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        rows = [bytes([128] * 8) for _ in range(8)]  # flat -> few passes
        out = jp2_decode(jp2_encode([rows], levels=2, n_layers=8))
        assert out[2][0] == rows

    def test_layer_count_refusals_and_totality(self):
        import struct as _struct

        from frappe_data_pipelines_spark.operators.jp2mini import (
            Jp2Error,
            jp2_decode,
            jp2_encode,
        )

        rows = [bytes([5, 200] * 4)] * 8
        with pytest.raises(Jp2Error, match="layer count"):
            jp2_encode([rows], levels=1, n_layers=0)
        with pytest.raises(Jp2Error, match="layer count"):
            jp2_encode([rows], levels=1, n_layers=1 << 16)
        cs = jp2_encode([rows], levels=2, n_layers=3)
        rng = random.Random(41)
        for _ in range(200):
            b = bytearray(cs)
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
            try:
                jp2_decode(bytes(b))
            except (Jp2Error, ValueError, IndexError, _struct.error):
                pass


class TestCodeBlockGrids:
    """Multi-code-block subbands (round 6): bands larger than one
    code-block split into a raster grid signalled through real 2-D tag
    trees (B.10.2) — the layout untiled full-page encoders emit."""

    @settings(max_examples=12, deadline=None)
    @given(
        st.integers(70, 160),
        st.integers(70, 160),
        st.integers(1, 3),
        st.booleans(),
        st.integers(0, 2**32 - 1),
    )
    def test_large_untiled_roundtrip(self, h, w, levels, irr, seed):
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        rng = random.Random(seed)
        rows = [bytes(rng.randrange(256) for _ in range(w)) for _ in range(h)]
        dw, dh, (g,) = jp2_decode(
            jp2_encode([rows], levels=levels, irreversible=irr, step=0.5)
        )
        assert (dw, dh) == (w, h)
        if irr:
            err = max(abs(a - b) for ra, rb in zip(g, rows) for a, b in zip(ra, rb))
            assert err <= 4
        else:
            assert g == rows

    def test_full_page_text_raster_lossless(self):
        # a real rendered-text page wider AND taller than one code-block
        from frappe_data_pipelines_spark.operators.imaging import (
            png_decode,
            render_text_png,
        )
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        _w, _h, _c, rows = png_decode(render_text_png(
            "FULL PAGE GRID TEST\nLINE TWO OF THE SCAN\nLINE THREE HERE"
        ))
        # triple the raster in both axes to force a multi-block LL band
        big = [row * 3 for row in rows] * 3
        got = jp2_decode(jp2_encode([big], levels=2))[2][0]
        assert got == big

    def test_grids_compose_with_tiles_layers_color(self):
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        rng = random.Random(77)
        comps = [
            [bytes(rng.randrange(256) for _ in range(140)) for _ in range(100)]
            for _ in range(3)
        ]
        ref = jp2_decode(jp2_encode(comps, levels=2))
        # an 80x64 tile still yields multi-block bands at resolution 2
        tiled = jp2_decode(
            jp2_encode(comps, levels=2, tile_size=(80, 64), n_layers=2)
        )
        assert [[bytes(r) for r in c] for c in ref[2]] == comps
        assert [[bytes(r) for r in c] for c in tiled[2]] == comps

    def test_grid_corruption_totality(self):
        import struct as _struct

        from frappe_data_pipelines_spark.operators.jp2mini import (
            Jp2Error,
            jp2_decode,
            jp2_encode,
        )

        rng = random.Random(55)
        rows = [bytes(rng.randrange(256) for _ in range(90)) for _ in range(80)]
        cs = jp2_encode([rows], levels=2)
        for _ in range(150):
            b = bytearray(cs)
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
            try:
                jp2_decode(bytes(b))
            except (Jp2Error, ValueError, IndexError, _struct.error):
                pass


class TestDerivedQuantAndTileParts:
    """Round 8: QCD style 1 (scalar derived, T.800 E-5) and multiple
    tile-parts per tile (A.4.2 whole-packet segments in TPsot order)."""

    def _maxerr(self, a, b):
        return max(
            abs(pa - pb) for ra, rb in zip(a, b) for pa, pb in zip(ra, rb)
        )

    def test_derived_quant_roundtrip_error_bounded(self):
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        rng = random.Random(31)
        noise = [
            bytes(rng.randrange(256) for _ in range(57)) for _ in range(43)
        ]
        smooth = [
            bytes((x * 3 + y * 2) % 256 for x in range(57)) for y in range(43)
        ]
        for img in (noise, smooth):
            w, h, comps = jp2_decode(
                jp2_encode(
                    [img], levels=3, irreversible=True, step=0.5,
                    mct=False, derived_quant=True,
                )
            )
            assert (w, h) == (57, 43)
            # derived steps double per level; finest-band error stays small
            assert self._maxerr(img, comps[0]) <= 8

    def test_derived_qcd_is_style_1_and_three_bytes(self):
        from frappe_data_pipelines_spark.operators.jp2mini import jp2_encode

        rows = [bytes((x + y) % 256 for x in range(40)) for y in range(32)]
        cs = jp2_encode(
            [rows], levels=2, irreversible=True, mct=False,
            derived_quant=True,
        )
        at = cs.index(b"\xff\x5c")
        ln = int.from_bytes(cs[at + 2 : at + 4], "big")
        assert ln == 2 + 3  # Sqcd byte + ONE 16-bit (eps0, mu0)
        assert cs[at + 4] & 0x1F == 1  # style 1

    def test_derived_refuses_on_5_3_and_on_eps_underflow(self):
        from frappe_data_pipelines_spark.operators.jp2mini import (
            Jp2Error,
            jp2_encode,
        )

        rows = [bytes((x + y) % 256 for x in range(64)) for y in range(64)]
        with pytest.raises(Jp2Error, match="9/7"):
            jp2_encode([rows], levels=2, irreversible=False, mct=False,
                       derived_quant=True)
        with pytest.raises(Jp2Error, match="underflow"):
            # step 128 -> eps0 = 1; 5 levels needs eps0 >= 4
            jp2_encode([rows], levels=5, irreversible=True, step=128.0,
                       mct=False, derived_quant=True)

    def test_multi_tile_parts_lossless_exact(self):
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        rng = random.Random(93)
        rows = [bytes(rng.randrange(256) for _ in range(90)) for _ in range(70)]
        ref = jp2_encode([rows], levels=2, mct=False)
        split = jp2_encode([rows], levels=2, mct=False, tile_parts=3)
        assert split.count(b"\xff\x90") >= 3  # really framed as 3 parts
        for cs in (ref, split):
            _w, _h, comps = jp2_decode(cs)
            assert [bytes(r) for r in comps[0]] == rows

    def test_tile_parts_compose_with_tiles_layers_color_derived(self):
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        rng = random.Random(17)
        comps = [
            [bytes(rng.randrange(256) for _ in range(100)) for _ in range(80)]
            for _ in range(3)
        ]
        cs = jp2_encode(
            comps, levels=2, irreversible=True, step=0.5, mct=True,
            tile_size=(64, 48), n_layers=2, tile_parts=2,
            derived_quant=True,
        )
        w, h, out = jp2_decode(cs)
        assert (w, h) == (100, 80)
        assert max(self._maxerr(a, b) for a, b in zip(comps, out)) <= 8

    def test_out_of_order_tpsot_refuses(self):
        import re as _re

        from frappe_data_pipelines_spark.operators.jp2mini import (
            Jp2Error,
            jp2_decode,
            jp2_encode,
        )

        rng = random.Random(5)
        rows = [bytes(rng.randrange(256) for _ in range(60)) for _ in range(50)]
        cs = jp2_encode([rows], levels=2, mct=False, tile_parts=2)
        sots = [m.start() for m in _re.finditer(b"\xff\x90", cs)]
        assert len(sots) == 2
        swapped = cs[: sots[0]] + cs[sots[1] : -2] + cs[sots[0] : sots[1]] + cs[-2:]
        with pytest.raises(Jp2Error, match="out of order"):
            jp2_decode(swapped)

    def test_tile_part_fuzz_totality(self):
        import struct as _struct

        from frappe_data_pipelines_spark.operators.jp2mini import (
            Jp2Error,
            jp2_decode,
            jp2_encode,
        )

        rng = random.Random(41)
        rows = [bytes(rng.randrange(256) for _ in range(64)) for _ in range(48)]
        cs = jp2_encode(
            [rows], levels=2, irreversible=True, mct=False,
            derived_quant=True, tile_parts=2,
        )
        for _ in range(150):
            b = bytearray(cs)
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
            try:
                jp2_decode(bytes(b))
            except (Jp2Error, ValueError, IndexError, _struct.error):
                pass


class TestNon8BitDepth:
    """Round 10: unsigned depths 1..16 (Ssiz) — depth-scaled DC shift and
    quantization budgets, native-precision jp2_decode_raw, 8-bit
    normalization in jp2_decode."""

    @staticmethod
    def _plane(w, h, depth, seed):
        import random

        rng = random.Random(seed)
        top = (1 << depth) - 1
        return [[rng.randint(0, top) for _ in range(w)] for _ in range(h)]

    def test_lossless_roundtrip_depths(self):
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode_raw,
            jp2_encode,
        )

        for depth in (4, 12, 16):
            plane = self._plane(19, 11, depth, depth)
            w, h, got, d = jp2_decode_raw(
                jp2_encode([plane], levels=2, depth=depth)
            )
            assert (w, h, d) == (19, 11, depth)
            assert got[0] == plane, f"depth {depth} not exact"

    def test_lossless_rgb_rct_depth12(self):
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode_raw,
            jp2_encode,
        )

        comps = [self._plane(13, 9, 12, 20 + i) for i in range(3)]
        w, h, got, d = jp2_decode_raw(
            jp2_encode(comps, levels=1, depth=12, mct=True)
        )
        assert (w, h, d) == (13, 9, 12)
        assert got == comps  # RCT exact at any depth

    def test_irreversible_depth12_error_bounded(self):
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode_raw,
            jp2_encode,
        )

        plane = self._plane(16, 16, 12, 7)
        _w, _h, got, d = jp2_decode_raw(
            jp2_encode([plane], levels=2, depth=12, irreversible=True, step=0.5)
        )
        assert d == 12
        worst = max(
            abs(a - b) for ra, rb in zip(got[0], plane) for a, b in zip(ra, rb)
        )
        # same bound family as the 8-bit 9/7 tests: a few quantization
        # steps of drift, never gross corruption
        assert worst <= 16, f"9/7 depth-12 worst error {worst}"

    def test_decode_normalizes_to_8bit(self):
        from frappe_data_pipelines_spark.operators.jp2mini import (
            jp2_decode,
            jp2_encode,
        )

        # 4-bit: 0..15 rescales onto 0..255 (15 -> 255, 0 -> 0)
        plane4 = [[0, 5, 10, 15]] * 4
        _w, _h, comps = jp2_decode(jp2_encode([plane4], levels=1, depth=4))
        assert list(comps[0][0]) == [(v * 255 + 7) // 15 for v in [0, 5, 10, 15]]
        # 12-bit: shifts down by 4
        plane12 = [[0, 256, 2048, 4095]] * 4
        _w, _h, comps = jp2_decode(jp2_encode([plane12], levels=1, depth=12))
        assert list(comps[0][0]) == [0, 16, 128, 255]

    def test_out_of_profile_depths_refuse(self):
        import pytest

        from frappe_data_pipelines_spark.operators.jp2mini import (
            Jp2Error,
            jp2_decode_raw,
            jp2_encode,
        )

        with pytest.raises(Jp2Error, match="depth"):
            jp2_encode([[[0]]], depth=17)
        ok = jp2_encode([self._plane(8, 8, 8, 1)], levels=1, depth=8)
        # flip the Ssiz byte to SIGNED (high bit) and to depth 17
        siz_at = ok.find(b"\xff\x51")
        ssiz_at = siz_at + 4 + 36
        signed = ok[:ssiz_at] + bytes([0x87]) + ok[ssiz_at + 1:]
        with pytest.raises(Jp2Error, match="signed"):
            jp2_decode_raw(signed)
        deep = ok[:ssiz_at] + bytes([16]) + ok[ssiz_at + 1:]
        with pytest.raises(Jp2Error, match="16 bits"):
            jp2_decode_raw(deep)


def test_jpx16_fixture_pdf_ocrs_to_golden():
    """The checked-in 16-bit grayscale JPX scanned PDF (Ssiz=15,
    BitsPerComponent 16 in the image dict — advisory per ISO 32000
    7.4.9) OCRs to the exact golden through the normalize-to-8-bit
    bridge."""
    import os

    from frappe_data_pipelines_spark.operators.extraction import pdf_ocr_scanned

    fixtures = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "frappe_data_pipelines_spark", "resources", "fixtures",
    )
    with open(os.path.join(fixtures, "sample_scanned_jpx16.pdf"), "rb") as f:
        data = f.read()
    text, conf = pdf_ocr_scanned(data)
    assert text == "SCANNED ARCHIVE BOX 7\nREF NO: 2019-114"
    assert conf == 1.0
