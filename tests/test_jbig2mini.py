"""JBIG2 kernel (operators/jbig2mini.py): MQ coder round-trips under fuzz,
generic-region and embedded-segment round-trips, profile/truncation
refusal, and the full PDF /JBIG2Decode → OCR chain."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

import pytest

from frappe_data_pipelines_spark.operators.jbig2mini import (
    Jbig2Error,
    MQDecoder,
    MQEncoder,
    generic_region_decode,
    generic_region_encode,
    jbig2_decode_embedded,
    jbig2_encode_embedded,
)


def _mq_roundtrip(bits, n_ctx=8):
    enc = MQEncoder()
    cxs = [[0, 0] for _ in range(n_ctx)]
    for ctx, b in bits:
        enc.encode(cxs[ctx], b)
    data = enc.flush()
    dec = MQDecoder(data)
    cxs2 = [[0, 0] for _ in range(n_ctx)]
    return all(dec.decode(cxs2[ctx]) == b for ctx, b in bits)


class TestMQCoder:
    def test_fuzz_biased_streams(self):
        rng = random.Random(1)
        for _ in range(500):
            n = rng.randrange(1, 500)
            p = rng.choice([0.0, 0.01, 0.1, 0.5, 0.9, 0.99, 1.0])
            bits = [(rng.randrange(8), 1 if rng.random() < p else 0) for _ in range(n)]
            assert _mq_roundtrip(bits)

    def test_single_bits(self):
        assert _mq_roundtrip([(0, 0)])
        assert _mq_roundtrip([(0, 1)])

    def test_stuffing_survives_long_mps_runs(self):
        # long deterministic runs drive Qe to its smallest states and
        # produce 0xFF-dense output — the stuffing path
        bits = [(0, 1)] * 5000
        assert _mq_roundtrip(bits)


class TestGenericRegion:
    def test_random_bitmaps(self):
        rng = random.Random(2)
        for _ in range(5):
            w, h = rng.randrange(3, 50), rng.randrange(2, 30)
            rows = [bytes(rng.randrange(2) for _ in range(w)) for _ in range(h)]
            assert generic_region_decode(generic_region_encode(rows, w, h), w, h) == rows

    def test_textlike_compresses(self):
        w, h = 120, 40
        rows = [
            bytes(1 if (y % 7 < 3 and (x // 6) % 3 == 0) else 0 for x in range(w))
            for y in range(h)
        ]
        data = generic_region_encode(rows, w, h)
        assert generic_region_decode(data, w, h) == rows
        assert len(data) < w * h // 8  # beats raw packing

    def test_all_white_and_all_black(self):
        for v in (0, 1):
            rows = [bytes([v]) * 33] * 9
            assert generic_region_decode(generic_region_encode(rows, 33, 9), 33, 9) == rows


class TestEmbeddedSegments:
    def test_roundtrip(self):
        w, h = 90, 30
        rows = [
            bytes(1 if (y % 5 < 2 and (x // 4) % 3 == 0) else 0 for x in range(w))
            for y in range(h)
        ]
        gw, gh, got = jbig2_decode_embedded(jbig2_encode_embedded(rows, w, h))
        assert (gw, gh, got) == (w, h, rows)

    def test_halftone_profile_refused_and_truncated_symbol_dict(self):
        # halftone region (type 22) stays unsupported and refuses loudly
        head = (0).to_bytes(4, "big") + bytes([22, 0x00, 0x01]) + (4).to_bytes(4, "big")
        with pytest.raises(Jbig2Error, match="halftone"):
            jbig2_decode_embedded(head + b"\x00\x00\x00\x00")
        # a truncated symbol dictionary (type 0, now supported) also refuses
        head = (0).to_bytes(4, "big") + bytes([0x00, 0x00, 0x01]) + (4).to_bytes(4, "big")
        with pytest.raises(Jbig2Error, match="truncated"):
            jbig2_decode_embedded(head + b"\x00\x00\x00\x00")

    def test_truncated_refused(self):
        data = jbig2_encode_embedded([bytes([1, 0, 1])] * 3, 3, 3)
        with pytest.raises(Jbig2Error):
            jbig2_decode_embedded(data[:7])

    def test_mmr_region_roundtrip_via_t6_kernel(self):
        """MMR-coded generic regions (T.88 6.2.6) decode through the CCITT
        Group-4 kernel (operators/faxmini) — the same page round-trips in
        both arithmetic and MMR form."""
        w, h = 33, 11
        rows = [
            bytes(1 if (y % 3 < 2 and (x // 4) % 2 == 0) else 0 for x in range(w))
            for y in range(h)
        ]
        for mmr in (False, True):
            gw, gh, got = jbig2_decode_embedded(
                jbig2_encode_embedded(rows, w, h, mmr=mmr)
            )
            assert (gw, gh, got) == (w, h, rows), f"mmr={mmr}"


def test_jbig2_scanned_pdf_through_ocr():
    """Full A10 chain: /JBIG2Decode page raster → bitmap OCR → exact text."""
    import os

    from frappe_data_pipelines_spark.operators.extraction import pdf_ocr_scanned

    fixtures = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "frappe_data_pipelines_spark", "resources", "fixtures",
    )
    with open(os.path.join(fixtures, "sample_scanned_jbig2.pdf"), "rb") as f:
        data = f.read()
    text, conf = pdf_ocr_scanned(data)
    assert text == "SCANNED ARCHIVE BOX 7\nREF NO: 2019-114"
    assert conf == 1.0


class TestTpgdon:
    def test_roundtrip_with_repeated_rows(self):
        w, h = 64, 24
        base = bytes(1 if (x // 5) % 2 == 0 else 0 for x in range(w))
        rows = [base if y % 6 < 4 else bytes(w) for y in range(h)]
        plain = generic_region_encode(rows, w, h, tpgdon=False)
        tp = generic_region_encode(rows, w, h, tpgdon=True)
        assert generic_region_decode(plain, w, h, tpgdon=False) == rows
        assert generic_region_decode(tp, w, h, tpgdon=True) == rows
        assert len(tp) < len(plain)  # typical rows cost one SLTP bit

    def test_embedded_flag_round_trip_both_modes(self):
        rows = [bytes([1, 0, 1, 1, 0])] * 7
        for tp in (False, True):
            gw, gh, got = jbig2_decode_embedded(
                jbig2_encode_embedded(rows, 5, 7, tpgdon=tp)
            )
            assert (gw, gh, got) == (5, 7, rows)

    def test_leading_blank_rows_typical(self):
        rows = [bytes(9)] * 4 + [bytes([1] * 9)] * 2
        data = jbig2_encode_embedded(rows, 9, 6, tpgdon=True)
        assert jbig2_decode_embedded(data)[2] == rows


class TestTemplates123:
    def test_all_templates_roundtrip_embedded(self):
        w, h = 70, 22
        rows = [
            bytes(1 if (y % 4 < 2 and (x // 3) % 2 == 0) else 0 for x in range(w))
            for y in range(h)
        ]
        for template in (0, 1, 2, 3):
            for tp in (False, True):
                data = jbig2_encode_embedded(rows, w, h, tpgdon=tp, template=template)
                gw, gh, got = jbig2_decode_embedded(data)
                assert (gw, gh, got) == (w, h, rows), (template, tp)

    def test_non_nominal_at_pixels_refuse_not_garbage(self):
        """ADVICE r5: encoders may legally emit non-nominal AT pixels; our
        context tables model only the nominal geometry, so such streams must
        raise Jbig2Error (→ PDF filter fallback) instead of decoding to a
        silently wrong bitmap."""
        from frappe_data_pipelines_spark.operators.jbig2mini import Jbig2Error

        rows = [bytes([1, 0, 1, 0]), bytes([0, 1, 0, 1])]
        for template in (0, 1, 2, 3):
            data = bytearray(jbig2_encode_embedded(rows, 4, 2, template=template))
            # generic-region segment body starts after page-info segment
            # (11-byte header + 19-byte body) + its own 11-byte header;
            # AT bytes sit at body offset 18
            at_off = 11 + 19 + 11 + 18
            assert data[at_off] == 3 if template in (0, 1) else data[at_off] == 2
            data[at_off] = 0xFC  # A1.x = -4: legal, but non-nominal
            with pytest.raises(Jbig2Error, match="non-nominal AT"):
                jbig2_decode_embedded(bytes(data))

    def test_random_bitmaps_per_template(self):
        rng = random.Random(8)
        for template in (1, 2, 3):
            w, h = rng.randrange(5, 40), rng.randrange(3, 20)
            rows = [bytes(rng.randrange(2) for _ in range(w)) for _ in range(h)]
            data = generic_region_encode(rows, w, h, template=template)
            assert generic_region_decode(data, w, h, template=template) == rows


class TestPageComposition:
    @staticmethod
    def _stream(rows, w, h, page_flags, comb_op):
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            generic_region_encode,
        )

        def seg(number, seg_type, body):
            return (number.to_bytes(4, "big") + bytes([seg_type & 0x3F, 0x00, 0x01])
                    + len(body).to_bytes(4, "big") + body)

        page_info = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                     + bytes(8) + bytes([page_flags]) + bytes(2))
        region_info = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                       + bytes(8) + bytes([comb_op]))
        at = bytes([3, 0xFF, 0xFD, 0xFF, 2, 0xFE, 0xFE, 0xFE])
        body = region_info + bytes([0x00]) + at + generic_region_encode(rows, w, h)
        return seg(0, 48, page_info) + seg(1, 39, body)

    def test_default_black_page_with_and(self):
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_decode_embedded,
        )

        w, h = 8, 4
        # region: 1s in the left half → AND with black page keeps left half
        rows = [bytes([1] * 4 + [0] * 4)] * h
        data = self._stream(rows, w, h, page_flags=0x04, comb_op=1)
        _, _, got = jbig2_decode_embedded(data)
        assert got == rows

    def test_replace_overwrites_default_black(self):
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_decode_embedded,
        )

        w, h = 6, 3
        rows = [bytes([0, 1, 0, 1, 0, 1])] * h
        data = self._stream(rows, w, h, page_flags=0x04, comb_op=4)
        assert jbig2_decode_embedded(data)[2] == rows


def test_corruption_totality(monkeypatch):
    """Byte-mutated streams either decode to something or raise Jbig2Error —
    never IndexError/ValueError leaks (same contract as the other kernels).
    The pixel budget is shrunk so mutated dimension fields hit the allocation
    guard instead of grinding through megapixel pure-Python decodes; the
    un-mutated fixture (800 px) stays well under it."""
    from frappe_data_pipelines_spark.operators import jbig2mini

    monkeypatch.setattr(jbig2mini, "_MAX_PIXELS", 1 << 12)
    base = jbig2_encode_embedded(
        [bytes(1 if (x + y) % 3 == 0 else 0 for x in range(40)) for y in range(20)],
        40, 20,
    )
    assert jbig2_decode_embedded(base)[0] == 40  # fixture under the test budget
    rng = random.Random(17)
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            jbig2_decode_embedded(bytes(b))
        except Jbig2Error:
            pass


def test_pixel_budget_guards():
    """Oversized page / region dimension fields raise Jbig2Error up front
    (allocation guard) instead of looping over gigapixels."""
    rows = [bytes([1, 0, 1, 0])] * 4
    stream = bytearray(jbig2_encode_embedded(rows, 4, 4))
    # page-info body starts after the 11-byte segment header: width at +0
    stream[11:15] = (1 << 20).to_bytes(4, "big")
    stream[15:19] = (1 << 20).to_bytes(4, "big")
    with pytest.raises(Jbig2Error, match="pixel budget"):
        jbig2_decode_embedded(bytes(stream))


class TestSymbolText:
    """Symbol-dictionary + text-region profile (VERDICT r5 #8): round-trip
    through the fixture encoder, differential against an independently
    composed page, multi-dictionary reference chains, refusal paths."""

    I = [bytes([0, 1, 0]), bytes([0, 1, 0]), bytes([0, 1, 0]),
         bytes([0, 1, 0]), bytes([0, 1, 0])]
    O = [bytes([1, 1, 1, 1]), bytes([1, 0, 0, 1]), bytes([1, 0, 0, 1]),
         bytes([1, 0, 0, 1]), bytes([1, 1, 1, 1])]
    DOT = [bytes([1, 1]), bytes([1, 1])]  # different height class

    @staticmethod
    def _compose(glyphs, placements, w, h):
        page = [bytearray(w) for _ in range(h)]
        for g, x, y in placements:
            for yy, row in enumerate(glyphs[g]):
                for xx, b in enumerate(row):
                    if 0 <= y + yy < h and 0 <= x + xx < w:
                        page[y + yy][x + xx] |= b
        return [bytes(r) for r in page]

    def test_roundtrip_differential_multi_class(self):
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_decode_embedded,
            jbig2_encode_symbol_text,
        )

        glyphs = [self.I, self.O, self.DOT]  # two height classes, 3 ids
        placements = [
            (0, 2, 1), (1, 7, 1), (0, 13, 1), (2, 18, 4),
            (1, 2, 8), (0, 8, 8), (2, 12, 11), (2, 1, 11),
        ]
        data = jbig2_encode_symbol_text(glyphs, placements, 22, 16)
        w, h, rows = jbig2_decode_embedded(data)
        assert (w, h) == (22, 16)
        assert rows == self._compose(glyphs, placements, 22, 16)

    def test_roundtrip_random_layouts(self):
        import random

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_decode_embedded,
            jbig2_encode_symbol_text,
        )

        rng = random.Random(17)
        for _ in range(10):
            n_glyphs = rng.randrange(1, 6)
            glyphs = []
            for _ in range(n_glyphs):
                gw, gh = rng.randrange(1, 7), rng.randrange(1, 8)
                glyphs.append(
                    [bytes(rng.randrange(2) for _ in range(gw)) for _ in range(gh)]
                )
            w, h = 40, 30
            placements = []
            for _ in range(rng.randrange(1, 12)):
                g = rng.randrange(n_glyphs)
                placements.append(
                    (g, rng.randrange(0, w - 8), rng.randrange(0, h - 9))
                )
            # encoder strips sort by (x) within y; duplicate (x, y) pairs
            # would place two symbols at one spot — allowed, keep them
            data = jbig2_encode_symbol_text(glyphs, placements, w, h)
            got = jbig2_decode_embedded(data)[2]
            assert got == self._compose(glyphs, placements, w, h)

    def test_multi_dictionary_reference_chain(self):
        """A text region referring to TWO symbol dictionaries: the symbol
        id space is the concatenation of both exports in referred order."""
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            MQEncoder,
            _int_ctx,
            _iaid_ctx,
            _generic_encode_into,
            _seg_with_refs,
            _NOMINAL_AT,
            _TEMPLATES,
            arith_iaid_encode,
            arith_int_encode,
            jbig2_decode_embedded,
        )

        def sym_dict_body(glyphs):
            mq = MQEncoder()
            cx = [[0, 0] for _ in range(1 << len(_TEMPLATES[0]))]
            iadh, iadw, iaex = _int_ctx(), _int_ctx(), _int_ctx()
            hc = 0
            by_h = sorted(range(len(glyphs)), key=lambda g: (len(glyphs[g]), g))
            i = 0
            while i < len(by_h):
                h = len(glyphs[by_h[i]])
                arith_int_encode(mq, iadh, h - hc); hc = h
                sw = 0
                while i < len(by_h) and len(glyphs[by_h[i]]) == h:
                    gl = glyphs[by_h[i]]
                    w = len(gl[0])
                    arith_int_encode(mq, iadw, w - sw); sw = w
                    _generic_encode_into(mq, cx, gl, w, h)
                    i += 1
                arith_int_encode(mq, iadw, None)
            arith_int_encode(mq, iaex, 0)
            arith_int_encode(mq, iaex, len(glyphs))
            at = b"".join(bytes([x & 0xFF, y & 0xFF]) for x, y in _NOMINAL_AT[0])
            return (
                (0).to_bytes(2, "big") + at
                + len(glyphs).to_bytes(4, "big") + len(glyphs).to_bytes(4, "big")
                + mq.flush()
            )

        # dict 1 exports [I]; dict 2 exports [O] → text ids: 0=I, 1=O
        glyphs = [self.I, self.O]
        placements = [(0, 1, 1), (1, 6, 1), (0, 12, 1)]
        mq = MQEncoder()
        iadt, iafs, iads = _int_ctx(), _int_ctx(), _int_ctx()
        iaid = _iaid_ctx(1)
        arith_int_encode(mq, iadt, 0)
        arith_int_encode(mq, iadt, 1)      # strip at T=1
        arith_int_encode(mq, iafs, 1)      # first S
        curs = 1
        for j, (g, x, y) in enumerate(placements):
            if j > 0:
                arith_int_encode(mq, iads, x - curs)
                curs = x
            arith_iaid_encode(mq, iaid, g, 1)
            curs += len(glyphs[g][0]) - 1
        arith_int_encode(mq, iads, None)
        region = (
            (16).to_bytes(4, "big") + (7).to_bytes(4, "big")
            + (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + bytes([0])
        )
        tr_body = region + (1 << 4).to_bytes(2, "big") + (3).to_bytes(4, "big") + mq.flush()
        page_info = (
            (16).to_bytes(4, "big") + (7).to_bytes(4, "big")
            + (0).to_bytes(8, "big") + bytes([0x01]) + (0).to_bytes(2, "big")
        )
        stream = (
            _seg_with_refs(0, 48, 1, page_info)
            + _seg_with_refs(1, 0, 1, sym_dict_body([self.I]))
            + _seg_with_refs(2, 0, 1, sym_dict_body([self.O]))
            + _seg_with_refs(3, 6, 1, tr_body, refs=(1, 2))
            + _seg_with_refs(4, 49, 1, b"")
        )
        w, h, rows = jbig2_decode_embedded(stream)
        assert rows == self._compose(glyphs, placements, 16, 7)

    def test_transposed_roundtrip_matches_normal(self):
        """TRANSPOSED=1 walks S down the page (strips are columns); the
        same placements must produce the identical page either way."""
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_decode_embedded,
            jbig2_encode_symbol_text,
        )

        glyphs = [self.I, self.O, self.DOT]
        placements = [
            (0, 2, 1), (1, 2, 8), (2, 3, 14),   # a column of symbols
            (1, 9, 2), (0, 9, 9), (2, 16, 5),
        ]
        normal = jbig2_decode_embedded(
            jbig2_encode_symbol_text(glyphs, placements, 21, 18)
        )[2]
        transp = jbig2_decode_embedded(
            jbig2_encode_symbol_text(glyphs, placements, 21, 18, transposed=True)
        )[2]
        assert transp == normal == self._compose(glyphs, placements, 21, 18)

    def test_unsupported_profiles_refuse(self):
        import pytest

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            Jbig2Error,
            decode_symbol_dict,
            decode_text_region,
        )

        at = bytes([3, 0xFF, 0xFD, 0xFF, 2, 0xFE, 0xFE, 0xFE])
        base = at + (1).to_bytes(4, "big") + (1).to_bytes(4, "big") + b"\x00" * 8
        # huffman + REFAGG is now supported (round 9) — a GARBAGE stream
        # of either huffman flavor must still raise, never misbehave
        with pytest.raises(Jbig2Error):
            decode_symbol_dict((0x0003 | (1 << 12)).to_bytes(2, "big") + base, [])
        with pytest.raises(Jbig2Error):
            decode_symbol_dict((0x0001).to_bytes(2, "big") + base, [])
        # SDREFAGG with GRTEMPLATE 0 + a NON-CAUSAL AT1 is now supported
        # (round 10) — the header parses; this garbage BODY must still
        # raise for a stream reason, never the old causality refusal
        bad_rat = bytes([1, 0, 0, 0])  # A1=(1,0): right of current pixel
        with pytest.raises(Jbig2Error) as ei:
            decode_symbol_dict(
                (0x0002).to_bytes(2, "big") + at + bad_rat
                + (1).to_bytes(4, "big") + (1).to_bytes(4, "big") + b"\x00" * 8,
                [],
            )
        assert "non-causal" not in str(ei.value)
        region = (8).to_bytes(4, "big") * 2 + (0).to_bytes(8, "big") + bytes([0])
        tail = (1).to_bytes(4, "big") + b"\x00" * 8
        # huffman text region selecting an UNTRANSCRIBED standard table:
        # FS selector 1 = B.7 (B.6 decodes since round 9; B.7/B.10 stay
        # honest refusals — their reconstructions fail the Kraft checksum)
        with pytest.raises(Jbig2Error, match="B.7"):
            decode_text_region(
                region + (0x0001).to_bytes(2, "big")
                + (0x0001).to_bytes(2, "big") + tail, [self.I]
            )
        with pytest.raises(Jbig2Error, match="no symbols"):
            decode_text_region(region + (1 << 4).to_bytes(2, "big") + tail, [])

    def test_symbol_fixture_pdf_ocrs_to_golden(self):
        """The checked-in symbol-mode scanned PDF goes through the full A10
        path (PDF raster extraction → JBIG2 symbol/text decode → bitmap
        OCR) and reads the exact golden text."""
        import os

        from frappe_data_pipelines_spark.operators.extraction import pdf_ocr_scanned

        fixtures = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "frappe_data_pipelines_spark", "resources", "fixtures",
        )
        with open(os.path.join(fixtures, "sample_scanned_jbig2sym.pdf"), "rb") as f:
            data = f.read()
        text, conf = pdf_ocr_scanned(data)
        assert text == "SCANNED ARCHIVE BOX 7\nREF NO: 2019-114"
        assert conf == 1.0


class TestReviewRegressions:
    """Round-6 review findings, pinned: corrupt streams must RAISE, never
    hang an executor or allocate past the pixel budget."""

    def test_symbol_dict_export_runs_cannot_spin(self):
        """A stream whose IAEX section repeats run=0 forever must raise the
        progress guard, not loop on free post-stream bits."""
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            MQEncoder,
            _NOMINAL_AT,
            _int_ctx,
            arith_int_encode,
            decode_symbol_dict,
            Jbig2Error,
        )

        mq = MQEncoder()
        iaex = _int_ctx()
        for _ in range(200):
            arith_int_encode(mq, iaex, 0)  # run 0: toggles exflag, no progress
        at = b"".join(bytes([x & 0xFF, y & 0xFF]) for x, y in _NOMINAL_AT[0])
        body = ((0).to_bytes(2, "big") + at
                + (1).to_bytes(4, "big") + (0).to_bytes(4, "big") + mq.flush())
        I = [bytes([1])]
        with pytest.raises(Jbig2Error, match="progress"):
            decode_symbol_dict(body, [I])

    def test_symbol_dict_empty_height_classes_cannot_spin(self):
        """dh followed by an immediate OOB repeated forever (and then free
        bits past the stream) must hit the height-class progress guard."""
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            MQEncoder,
            _NOMINAL_AT,
            _int_ctx,
            arith_int_encode,
            decode_symbol_dict,
            Jbig2Error,
        )

        mq = MQEncoder()
        iadh, iadw = _int_ctx(), _int_ctx()
        for _ in range(100):
            arith_int_encode(mq, iadh, 1)     # new height class...
            arith_int_encode(mq, iadw, None)  # ...that never adds a symbol
        at = b"".join(bytes([x & 0xFF, y & 0xFF]) for x, y in _NOMINAL_AT[0])
        body = ((0).to_bytes(2, "big") + at
                + (1).to_bytes(4, "big") + (1).to_bytes(4, "big") + mq.flush())
        with pytest.raises(Jbig2Error, match="progress"):
            decode_symbol_dict(body, [])

    def test_text_region_offset_cannot_blow_page_allocation(self):
        """rx/ry feed the page allocation when no page-info segment came
        first — a corrupt offset must hit the pixel budget, not allocate."""
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            Jbig2Error,
            decode_text_region,
        )

        region = ((8).to_bytes(4, "big") + (8).to_bytes(4, "big")
                  + (1 << 25).to_bytes(4, "big") + (0).to_bytes(4, "big")
                  + bytes([0]))
        body = region + (1 << 4).to_bytes(2, "big") + (1).to_bytes(4, "big") + b"\x00" * 8
        with pytest.raises(Jbig2Error, match="budget"):
            decode_text_region(body, [[bytes([1])]])


class TestRefinement:
    """GRTEMPLATE-1 refinement coding: direct round-trips, refined text
    instances, single-instance REFAGG symbol dictionaries, refusals."""

    I = [bytes([0, 1, 0]), bytes([0, 1, 0]), bytes([0, 1, 0]),
         bytes([0, 1, 0]), bytes([0, 1, 0])]
    O = [bytes([1, 1, 1, 1]), bytes([1, 0, 0, 1]), bytes([1, 0, 0, 1]),
         bytes([1, 0, 0, 1]), bytes([1, 1, 1, 1])]

    def test_refinement_roundtrip_random(self):
        import random

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            MQDecoder,
            MQEncoder,
            _ref_ctx_bank,
            refinement_region_decode,
            refinement_region_encode,
        )

        rng = random.Random(23)
        for _ in range(20):
            rw, rh = rng.randrange(1, 12), rng.randrange(1, 10)
            ref = [bytes(rng.randrange(2) for _ in range(rw)) for _ in range(rh)]
            w, h = rng.randrange(1, 12), rng.randrange(1, 10)
            # target correlates with the reference (the realistic case) but
            # with random flips
            rows = [
                bytes(
                    (ref[y][x] if y < rh and x < rw else 0) ^ (rng.random() < 0.15)
                    for x in range(w)
                )
                for y in range(h)
            ]
            dx, dy = rng.randrange(-2, 3), rng.randrange(-2, 3)
            enc = MQEncoder()
            refinement_region_encode(enc, _ref_ctx_bank(), rows, w, h, ref, dx, dy)
            dec = MQDecoder(enc.flush())
            got = refinement_region_decode(dec, _ref_ctx_bank(), w, h, ref, dx, dy)
            assert got == rows

    def test_refinement_close_to_reference_compresses(self):
        """The whole point of refinement: a bitmap near its reference costs
        far fewer bits than direct generic coding."""
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            MQEncoder,
            _ref_ctx_bank,
            generic_region_encode,
            refinement_region_encode,
        )

        w, h = 64, 40
        ref = [bytes(1 if (y % 7 < 3 and (x // 5) % 2 == 0) else 0
                     for x in range(w)) for y in range(h)]
        rows = [bytearray(r) for r in ref]
        rows[3][7] ^= 1  # two flipped pixels
        rows[20][33] ^= 1
        rows = [bytes(r) for r in rows]
        enc = MQEncoder()
        refinement_region_encode(enc, _ref_ctx_bank(), rows, w, h, ref)
        refined = len(enc.flush())
        direct = len(generic_region_encode(rows, w, h))
        assert refined < direct / 2, (refined, direct)

    @staticmethod
    def _sym_dict_body(glyphs, refagg_from=None):
        """Direct-coded dict body, or (with refagg_from=(pool, specs))
        a REFAGG dict whose new symbols refine pool entries."""
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            MQEncoder,
            _NOMINAL_AT,
            _TEMPLATES,
            _generic_encode_into,
            _iaid_ctx,
            _int_ctx,
            _ref_ctx_bank,
            arith_iaid_encode,
            arith_int_encode,
            refinement_region_encode,
        )

        mq = MQEncoder()
        iadh, iadw, iaex = _int_ctx(), _int_ctx(), _int_ctx()
        at = b"".join(bytes([x & 0xFF, y & 0xFF]) for x, y in _NOMINAL_AT[0])
        if refagg_from is None:
            cx = [[0, 0] for _ in range(1 << len(_TEMPLATES[0]))]
            hc = 0
            for gl in sorted(glyphs, key=len):
                h, w = len(gl), len(gl[0])
                arith_int_encode(mq, iadh, h - hc); hc = h
                arith_int_encode(mq, iadw, w)
                _generic_encode_into(mq, cx, gl, w, h)
                arith_int_encode(mq, iadw, None)
            flags = 0x0000
            n_new = len(glyphs)
        else:
            pool, specs = refagg_from  # specs: [(ref_id, rows)]
            iaai, iardx, iardy = _int_ctx(), _int_ctx(), _int_ctx()
            code_len = max(len(pool) + len(specs) - 1, 0).bit_length()
            iaid = _iaid_ctx(code_len)
            gr = _ref_ctx_bank()
            hc = 0
            for ref_id, rows in specs:
                h, w = len(rows), len(rows[0])
                arith_int_encode(mq, iadh, h - hc); hc = h
                arith_int_encode(mq, iadw, w)
                arith_int_encode(mq, iaai, 1)
                arith_iaid_encode(mq, iaid, ref_id, code_len)
                arith_int_encode(mq, iardx, 0)
                arith_int_encode(mq, iardy, 0)
                refinement_region_encode(mq, gr, rows, w, h, pool[ref_id])
                arith_int_encode(mq, iadw, None)
            flags = 0x0002 | (1 << 12)  # SDREFAGG, GRTEMPLATE 1
            n_new = len(specs)
        # export everything (input + new)
        n_in = 0 if refagg_from is None else len(refagg_from[0])
        arith_int_encode(mq, iaex, 0)
        arith_int_encode(mq, iaex, n_in + n_new)
        n_ex = n_in + n_new
        return (flags.to_bytes(2, "big") + at
                + n_ex.to_bytes(4, "big") + n_new.to_bytes(4, "big")
                + mq.flush())

    def test_refagg_symbol_dict_and_refined_text_instance(self):
        """End-to-end: dict 1 direct-codes I and O; dict 2 REFAGG-refines I
        into an 'I with serifs'; the text region places a normal instance,
        a REFAGG symbol instance, and an RI=1 instance refined inline."""
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            MQEncoder,
            _iaid_ctx,
            _int_ctx,
            _ref_ctx_bank,
            _seg_with_refs,
            arith_iaid_encode,
            arith_int_encode,
            jbig2_decode_embedded,
            refinement_region_encode,
        )

        serif_I = [bytes([1, 1, 1]), bytes([0, 1, 0]), bytes([0, 1, 0]),
                   bytes([0, 1, 0]), bytes([1, 1, 1])]
        inline = [bytes([1, 1, 1, 1]), bytes([1, 0, 0, 1]), bytes([1, 1, 1, 1]),
                  bytes([1, 0, 0, 1]), bytes([1, 1, 1, 1])]  # refined O → 8

        d1 = self._sym_dict_body([self.I, self.O])
        # dict 1 exports sorted-by-height... both height 5: order I, O
        d2 = self._sym_dict_body(None, refagg_from=([self.I, self.O],
                                                    [(0, serif_I)]))
        # text symbols = d1 exports (I, O) + d2 exports (I, O, serif_I)
        # → ids: 0=I 1=O 2=I 3=O 4=serif_I ; code_len = 3
        code_len = 3
        mq = MQEncoder()
        iadt, iafs, iads, iari = (_int_ctx() for _ in range(4))
        iardw, iardh, iardx, iardy = (_int_ctx() for _ in range(4))
        iaid = _iaid_ctx(code_len)
        gr = _ref_ctx_bank()
        arith_int_encode(mq, iadt, 0)
        arith_int_encode(mq, iadt, 1)   # strip at T=1
        arith_int_encode(mq, iafs, 1)   # S=1: plain I
        arith_iaid_encode(mq, iaid, 0, code_len)
        arith_int_encode(mq, iari, 0)
        curs = 1 + 3 - 1
        arith_int_encode(mq, iads, 6 - curs)  # S=6: serif_I (REFAGG symbol)
        curs = 6
        arith_iaid_encode(mq, iaid, 4, code_len)
        arith_int_encode(mq, iari, 0)
        curs += 3 - 1
        arith_int_encode(mq, iads, 12 - curs)  # S=12: O refined INLINE
        curs = 12
        arith_iaid_encode(mq, iaid, 1, code_len)
        arith_int_encode(mq, iari, 1)
        arith_int_encode(mq, iardw, 0)
        arith_int_encode(mq, iardh, 0)
        arith_int_encode(mq, iardx, 0)
        arith_int_encode(mq, iardy, 0)
        refinement_region_encode(mq, gr, inline, 4, 5, self.O)
        arith_int_encode(mq, iads, None)
        region = ((18).to_bytes(4, "big") + (7).to_bytes(4, "big")
                  + (0).to_bytes(8, "big") + bytes([0]))
        flags = (1 << 4) | (1 << 1) | (1 << 15)  # TOPLEFT, REFINE, GRTEMPLATE1
        tr = region + flags.to_bytes(2, "big") + (3).to_bytes(4, "big") + mq.flush()
        page_info = ((18).to_bytes(4, "big") + (7).to_bytes(4, "big")
                     + (0).to_bytes(8, "big") + bytes([0x01]) + (0).to_bytes(2, "big"))
        stream = (
            _seg_with_refs(0, 48, 1, page_info)
            + _seg_with_refs(1, 0, 1, d1)
            + _seg_with_refs(2, 0, 1, d2, refs=(1,))
            + _seg_with_refs(3, 6, 1, tr, refs=(1, 2))
            + _seg_with_refs(4, 49, 1, b"")
        )
        w, h, rows = jbig2_decode_embedded(stream)
        page = [bytearray(18) for _ in range(7)]
        for glyph, x in ((self.I, 1), (serif_I, 6), (inline, 12)):
            for yy, r in enumerate(glyph):
                for xx, b in enumerate(r):
                    page[1 + yy][x + xx] |= b
        assert rows == [bytes(r) for r in page]

    def test_refagg_multi_instance_truncated_raises(self):
        """A REFAGGNINST=2 aggregate whose nested text region is missing
        from the stream must raise (exhausted MQ decodes OOB), never spin
        or return garbage. (Until round 8 this profile refused outright;
        it now decodes — TestMultiInstanceAggregates — so this pins the
        totality of the truncated case.)"""
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            MQEncoder,
            _NOMINAL_AT,
            _int_ctx,
            arith_int_encode,
            decode_symbol_dict,
            Jbig2Error,
        )

        mq = MQEncoder()
        iadh, iadw, iaai = _int_ctx(), _int_ctx(), _int_ctx()
        arith_int_encode(mq, iadh, 1)
        arith_int_encode(mq, iadw, 1)
        arith_int_encode(mq, iaai, 2)  # nested region follows — but doesn't
        at = b"".join(bytes([x & 0xFF, y & 0xFF]) for x, y in _NOMINAL_AT[0])
        body = ((0x0002 | (1 << 12)).to_bytes(2, "big") + at
                + (1).to_bytes(4, "big") + (1).to_bytes(4, "big") + mq.flush())
        with pytest.raises(Jbig2Error):
            decode_symbol_dict(body, [[bytes([1])]])

    def test_refinement_template0_roundtrip_random(self):
        """GRTEMPLATE-0 (13-bit movable-AT) refinement: random bitmaps
        round-trip through the shared encoder/decoder pair at several
        sizes and offsets, including non-nominal causal AT pairs."""
        import random

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            MQDecoder,
            MQEncoder,
            _ref_ctx_bank,
            refinement_region_decode,
            refinement_region_encode,
        )

        rng = random.Random(77)
        for at in (None, ((-1, -2), (2, 1)), ((-3, 0), (0, -2))):
            for _ in range(4):
                w, h = rng.randrange(1, 14), rng.randrange(1, 12)
                rw, rh = rng.randrange(1, 14), rng.randrange(1, 12)
                ref = [bytes(rng.randrange(2) for _ in range(rw)) for _ in range(rh)]
                rows = [bytes(rng.randrange(2) for _ in range(w)) for _ in range(h)]
                dx, dy = rng.randrange(-2, 3), rng.randrange(-2, 3)
                enc = MQEncoder()
                refinement_region_encode(
                    enc, _ref_ctx_bank(0), rows, w, h, ref, dx, dy,
                    template=0, at=at,
                )
                dec = MQDecoder(enc.flush())
                got = refinement_region_decode(
                    dec, _ref_ctx_bank(0), w, h, ref, dx, dy, template=0, at=at
                )
                assert got == rows

    def test_refagg_template0_full_stream_roundtrip(self):
        """The whole GRTEMPLATE-0 pipeline: REFAGG dictionary (SDRAT in the
        header) + refined text instance (SBRAT in the header) decode back
        to the clean-glyph composition."""
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_decode_embedded,
            jbig2_encode_symbol_text_refagg,
        )

        clean = [self.I, self.O]
        rough = []
        for g in clean:
            top = bytearray(g[0])
            top[0] ^= 1
            rough.append([bytes(top)] + list(g[1:]))
        placements = [(0, 0, 0), (1, 4, 0), (0, 9, 0)]  # (glyph, x, y)
        w, h = 14, 6
        data = jbig2_encode_symbol_text_refagg(
            rough, clean, placements, w, h, r_template=0
        )
        _, _, rows = jbig2_decode_embedded(data)
        page = [bytearray(w) for _ in range(h)]
        for g, x0, y0 in placements:
            gl = clean[g]
            for yy, r in enumerate(gl):
                for xx, bit in enumerate(r):
                    if bit:
                        page[y0 + yy][x0 + xx] |= 1
        assert rows == [bytes(r) for r in page]


def test_symbol_stream_corruption_totality(monkeypatch):
    """Byte-mutated SYMBOL-mode streams (dictionary + text region +
    refinement paths) either decode or raise Jbig2Error — never hang, leak
    IndexError, or blow the allocation budget. Complements the generic-
    region totality fuzz with the round-6 decoder surface."""
    from frappe_data_pipelines_spark.operators import jbig2mini
    from frappe_data_pipelines_spark.operators.jbig2mini import (
        jbig2_encode_symbol_text,
    )

    monkeypatch.setattr(jbig2mini, "_MAX_PIXELS", 1 << 12)
    I = [bytes([0, 1, 0])] * 5
    O = [bytes([1, 1, 1, 1]), bytes([1, 0, 0, 1]), bytes([1, 1, 1, 1])]
    base = jbig2_encode_symbol_text(
        [I, O], [(0, 2, 1), (1, 7, 1), (0, 13, 8)], 20, 15
    )
    assert jbig2_decode_embedded(base)[0] == 20
    rng = random.Random(29)
    for _ in range(400):
        b = bytearray(base)
        for _ in range(rng.randrange(1, 5)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        try:
            jbig2_decode_embedded(bytes(b))
        except Jbig2Error:
            pass


def test_refagg_fixture_pdf_ocrs_to_golden():
    """The checked-in REFAGG/refined-instance scanned PDF: rough symbols →
    refinement-corrected clean symbols → inline-refined final instance →
    bitmap OCR reads the exact golden text."""
    import os

    from frappe_data_pipelines_spark.operators.extraction import pdf_ocr_scanned

    fixtures = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "frappe_data_pipelines_spark", "resources", "fixtures",
    )
    with open(os.path.join(fixtures, "sample_scanned_jbig2ref.pdf"), "rb") as f:
        data = f.read()
    text, conf = pdf_ocr_scanned(data)
    assert text == "SCANNED ARCHIVE BOX 7\nREF NO: 2019-114"
    assert conf == 1.0


class TestHalftone:
    """Pattern dictionaries + halftone regions (T.88 6.6/6.7): collective
    pattern decode with the A1=(-HDPW,0) template, gray-coded bitplanes,
    grid placement, refusals, and stream totality."""

    @staticmethod
    def _pats(k: int = 4, side: int = 4):
        import random

        rng = random.Random(41)
        return [
            [bytes(rng.randrange(2) for _ in range(side)) for _ in range(side)]
            for _ in range(k)
        ]

    def test_roundtrip_random_grids(self):
        import random

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_decode_embedded,
            jbig2_encode_halftone,
        )

        rng = random.Random(43)
        for _ in range(6):
            k = rng.randrange(2, 9)
            pats = self._pats(k)
            hgw, hgh = rng.randrange(2, 8), rng.randrange(2, 7)
            values = [[rng.randrange(k) for _ in range(hgw)] for _ in range(hgh)]
            w, h = hgw * 4 + 2, hgh * 4 + 2
            got = jbig2_decode_embedded(jbig2_encode_halftone(values, pats, w, h))[2]
            page = [bytearray(w) for _ in range(h)]
            for m in range(hgh):
                for n in range(hgw):
                    pat = pats[values[m][n]]
                    for yy in range(4):
                        for xx in range(4):
                            if m * 4 + yy < h and n * 4 + xx < w:
                                page[m * 4 + yy][n * 4 + xx] |= pat[yy][xx]
            assert got == [bytes(r) for r in page]

    def test_refusals_and_guards(self):
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            Jbig2Error,
            decode_halftone_region,
            decode_pattern_dict,
        )

        with pytest.raises(Jbig2Error, match="zero-size"):
            decode_pattern_dict(bytes([0, 0, 4]) + (3).to_bytes(4, "big") + b"\x00" * 4)
        region = ((8).to_bytes(4, "big") * 2 + (0).to_bytes(8, "big") + bytes([0]))
        tail = (2).to_bytes(4, "big") * 2 + (0).to_bytes(8, "big") + (1 << 8).to_bytes(2, "big") + (0).to_bytes(2, "big")
        with pytest.raises(Jbig2Error, match="no pattern"):
            decode_halftone_region(region + bytes([0]) + tail + b"\x00" * 8, [])

    def test_stream_mutation_totality(self, monkeypatch):
        import random

        from frappe_data_pipelines_spark.operators import jbig2mini
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_encode_halftone,
        )

        monkeypatch.setattr(jbig2mini, "_MAX_PIXELS", 1 << 12)
        pats = self._pats(3)
        values = [[(m + n) % 3 for n in range(4)] for m in range(3)]
        base = jbig2_encode_halftone(values, pats, 18, 14)
        assert jbig2_decode_embedded(base)[0] == 18
        rng = random.Random(47)
        for _ in range(300):
            b = bytearray(base)
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                jbig2_decode_embedded(bytes(b))
            except Jbig2Error:
                pass


class TestHuffmanProfiles:
    """JBIG2's second coding family (round 6): Annex B Huffman tables,
    SDHUFF symbol dictionaries with collective bitmaps, SBHUFF text regions
    with run-coded symbol ID lengths, custom type-53 table segments."""

    A = [bytes([1, 1, 1]), bytes([1, 0, 1]), bytes([1, 1, 1]), bytes([1, 0, 1])]
    B = [bytes([1, 1]), bytes([1, 0]), bytes([1, 1])]

    def test_standard_tables_roundtrip(self):
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            _HuffBitReader,
            _HuffBitWriter,
            standard_table,
        )

        cases = {
            1: [0, 15, 16, 271, 272, 65807, 65808, 10**7],
            2: [0, 1, 2, 3, 10, 11, 74, 75, 10**6, None],
            3: [-256, -1, 0, 11, 74, 75, -257, -(10**6), 10**6, None],
            4: [1, 2, 3, 4, 11, 12, 75, 76, 10**6],
            5: [-255, 0, 1, 12, 75, 76, -256, -(10**5), 10**5],
        }
        for n, vals in cases.items():
            t = standard_table(n)
            for v in vals:
                bw = _HuffBitWriter()
                t.encode(bw, v)
                assert t.decode(_HuffBitReader(bw.finish())) == v, (n, v)

    def test_standard_tables_b7_b10_refuse(self):
        """Round 9 transcribed B.6, B.8-B.9, B.11-B.15; only B.7 and B.10
        (failed the Kraft checksum reconstruction) stay honest refusals."""
        import pytest

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            Jbig2Error,
            standard_table,
        )

        for n in (7, 10):
            with pytest.raises(Jbig2Error, match=f"B.{n}"):
                standard_table(n)
        for n in (6, 8, 9, 11, 12, 13, 14, 15):
            standard_table(n)  # transcribed: must construct

    def test_custom_table_segment_roundtrip(self):
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            _HuffBitReader,
            _HuffBitWriter,
            build_table_segment,
            parse_table_segment,
        )

        t = parse_table_segment(build_table_segment(-100, 1000, oob=True))
        for v in (-100, 0, 999, 1000, 99999, -101, -(10**6), None):
            bw = _HuffBitWriter()
            t.encode(bw, v)
            assert t.decode(_HuffBitReader(bw.finish())) == v, v

    def _expected_page(self, glyphs, placements, w, h):
        exp = [bytearray(w) for _ in range(h)]
        for g, x, y in placements:
            for yy, r in enumerate(glyphs[g]):
                for xx, px in enumerate(r):
                    if px:
                        exp[y + yy][x + xx] |= 1
        return [bytes(r) for r in exp]

    def test_huffman_symbol_text_roundtrip_all_modes(self):
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_decode_embedded,
            jbig2_encode_symbol_text_huffman,
        )

        glyphs = [self.A, self.B]
        placements = [(0, 2, 1), (1, 7, 2), (0, 11, 1), (1, 15, 2), (1, 18, 0)]
        exp = self._expected_page(glyphs, placements, 24, 8)
        for collective in ("raw", "mmr"):
            for transposed in (False, True):
                data = jbig2_encode_symbol_text_huffman(
                    glyphs, placements, 24, 8,
                    transposed=transposed, collective=collective,
                )
                w, h, rows = jbig2_decode_embedded(data)
                assert (w, h) == (24, 8)
                assert rows == exp, (collective, transposed)

    def test_huffman_matches_arithmetic_page(self):
        """Same glyphs/placements through BOTH coding families decode to
        the identical page bitmap."""
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_decode_embedded,
            jbig2_encode_symbol_text,
            jbig2_encode_symbol_text_huffman,
        )

        glyphs = [self.A, self.B]
        placements = [(0, 1, 0), (1, 6, 1), (0, 10, 3), (1, 14, 0)]
        arith = jbig2_decode_embedded(
            jbig2_encode_symbol_text(glyphs, placements, 20, 8)
        )
        huff = jbig2_decode_embedded(
            jbig2_encode_symbol_text_huffman(glyphs, placements, 20, 8)
        )
        assert arith == huff

    def test_huffman_corruption_totality(self):
        import random
        import struct as _struct

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            Jbig2Error,
            jbig2_decode_embedded,
            jbig2_encode_symbol_text_huffman,
        )

        glyphs = [self.A, self.B]
        placements = [(0, 2, 1), (1, 7, 2)]
        data = jbig2_encode_symbol_text_huffman(glyphs, placements, 16, 8)
        rng = random.Random(17)
        for _ in range(300):
            b = bytearray(data)
            i = rng.randrange(len(b))
            b[i] ^= 1 << rng.randrange(8)
            try:
                jbig2_decode_embedded(bytes(b))
            except (Jbig2Error, ValueError, IndexError, _struct.error):
                pass  # declared failures only — no hangs, no other types

    def test_huffman_fixture_pdf_ocrs_to_golden(self):
        import os

        from frappe_data_pipelines_spark.operators.extraction import pdf_ocr_scanned

        fixtures = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "frappe_data_pipelines_spark", "resources", "fixtures",
        )
        with open(os.path.join(fixtures, "sample_scanned_jbig2huff.pdf"), "rb") as f:
            data = f.read()
        text, conf = pdf_ocr_scanned(data)
        assert text == "SCANNED ARCHIVE BOX 7\nREF NO: 2019-114"
        assert conf == 1.0

    @settings(max_examples=25, deadline=None)
    @given(st.integers(0, 2**32 - 1))
    def test_huffman_vs_arithmetic_differential(self, seed):
        """Property: ANY random glyph set + placements decodes to the same
        page bitmap through the huffman family (raw and MMR collectives) as
        through the arithmetic family — the two coders must agree on the
        composed page, not just on fixtures."""
        import random

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_decode_embedded,
            jbig2_encode_symbol_text,
            jbig2_encode_symbol_text_huffman,
        )

        rng = random.Random(seed)
        n_glyphs = rng.randint(1, 5)
        glyphs = []
        for _ in range(n_glyphs):
            gw, gh = rng.randint(1, 6), rng.randint(1, 6)
            glyphs.append(
                [bytes(rng.randint(0, 1) for _ in range(gw)) for _ in range(gh)]
            )
        pw, ph = 40, 24
        placements = []
        for _ in range(rng.randint(1, 8)):
            g = rng.randrange(n_glyphs)
            gw = len(glyphs[g][0])
            gh = len(glyphs[g])
            placements.append(
                (g, rng.randint(0, pw - gw), rng.randint(0, ph - gh))
            )
        transposed = rng.random() < 0.5
        ref = jbig2_decode_embedded(
            jbig2_encode_symbol_text(glyphs, placements, pw, ph,
                                     transposed=transposed)
        )
        for collective in ("raw", "mmr"):
            got = jbig2_decode_embedded(
                jbig2_encode_symbol_text_huffman(
                    glyphs, placements, pw, ph,
                    transposed=transposed, collective=collective,
                )
            )
            assert got == ref, (seed, collective, transposed)

    def test_encode_rejects_offsets_beyond_32_bits(self):
        """Review regression: the lower/upper tail lines carry 32-bit
        offsets — an uncodable value must raise, not silently truncate."""
        import pytest

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            Jbig2Error,
            _HuffBitWriter,
            standard_table,
        )

        t = standard_table(4)
        with pytest.raises(Jbig2Error, match="32-bit"):
            t.encode(_HuffBitWriter(), 76 + 2**32)
        t3 = standard_table(3)
        with pytest.raises(Jbig2Error, match="32-bit"):
            t3.encode(_HuffBitWriter(), -257 - 2**32)


def test_refagg_template0_fixture_pdf_ocrs_to_golden():
    """The checked-in GRTEMPLATE-0 scanned PDF (SDRAT + SBRAT headers, AT
    pixels in every refined context) OCRs to the exact golden text."""
    import os

    from frappe_data_pipelines_spark.operators.extraction import pdf_ocr_scanned

    fixtures = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "frappe_data_pipelines_spark", "resources", "fixtures",
    )
    with open(os.path.join(fixtures, "sample_scanned_jbig2ref0.pdf"), "rb") as f:
        data = f.read()
    text, conf = pdf_ocr_scanned(data)
    assert text == "SCANNED ARCHIVE BOX 7\nREF NO: 2019-114"
    assert conf == 1.0


class TestHalftoneMMRAndSkip:
    """Round 8: the halftone profile's remaining coding options — HDMMR
    pattern dictionaries, HMMR bitplanes (one unreset T.6 stream across
    all planes), and HENABLESKIP cell masking (6.6.5.1/6.2.5.7)."""

    @staticmethod
    def _pats(n, size=4):
        return [
            [
                bytes(1 if (x + y * size) < lvl * (size + 1) else 0 for x in range(size))
                for y in range(size)
            ]
            for lvl in range(n)
        ]

    def test_mmr_family_matches_arithmetic(self):
        import random

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_decode_embedded,
            jbig2_encode_halftone,
        )

        rng = random.Random(3)
        pats = self._pats(4)
        values = [[rng.randrange(4) for _ in range(12)] for _ in range(9)]
        ref = jbig2_decode_embedded(jbig2_encode_halftone(values, pats, 48, 36))
        got = jbig2_decode_embedded(
            jbig2_encode_halftone(values, pats, 48, 36, mmr=True)
        )
        assert got == ref

    def test_pattern_dict_mmr_roundtrip(self):
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            decode_pattern_dict,
            encode_pattern_dict,
        )

        pats = self._pats(5)
        back = decode_pattern_dict(encode_pattern_dict(pats, mmr=True))
        assert [[bytes(r) for r in p] for p in back] == [
            [bytes(r) for r in p] for p in pats
        ]

    def test_enable_skip_matches_and_actually_skips(self):
        import random

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            encode_halftone_region,
            jbig2_decode_embedded,
            jbig2_encode_halftone,
        )

        rng = random.Random(3)
        pats = self._pats(4)
        # grid footprint 48x36 vs region 40x28: the last two cell columns
        # and cell rows fall fully outside -> genuinely skipped cells
        values = [[rng.randrange(4) for _ in range(12)] for _ in range(9)]
        ref = jbig2_decode_embedded(jbig2_encode_halftone(values, pats, 40, 28))
        got = jbig2_decode_embedded(
            jbig2_encode_halftone(values, pats, 40, 28, enable_skip=True)
        )
        assert got == ref
        # the skip mask removes real decisions: the coded stream shrinks
        a = encode_halftone_region(values, pats, 40, 28)
        b = encode_halftone_region(values, pats, 40, 28, enable_skip=True)
        assert len(b) < len(a)

    def test_mmr_with_skip_refuses_at_encode(self):
        import pytest as _pytest

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            Jbig2Error,
            encode_halftone_region,
        )

        with _pytest.raises(Jbig2Error, match="arithmetic"):
            encode_halftone_region(
                [[0]], self._pats(2), 8, 8, mmr=True, enable_skip=True
            )

    def test_mmr_stream_mutation_totality(self, monkeypatch):
        import random

        from frappe_data_pipelines_spark.operators import jbig2mini
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            Jbig2Error,
            jbig2_decode_embedded,
            jbig2_encode_halftone,
        )

        monkeypatch.setattr(jbig2mini, "_MAX_PIXELS", 1 << 12)
        pats = self._pats(3)
        values = [[(m + n) % 3 for n in range(4)] for m in range(3)]
        base = jbig2_encode_halftone(values, pats, 18, 14, mmr=True)
        assert jbig2_decode_embedded(base)[0] == 18
        rng = random.Random(48)
        for _ in range(300):
            b = bytearray(base)
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                jbig2_decode_embedded(bytes(b))
            except Jbig2Error:
                pass


class TestMultiInstanceAggregates:
    """Round 8: REFAGGNINST > 1 — the aggregate symbol decodes as a nested
    text region inside the symbol dictionary, sharing the dictionary's MQ
    decoder and context banks (T.88 6.5.8.2, Table 17)."""

    A = [bytes([1, 1, 1]), bytes([1, 0, 1]), bytes([1, 1, 1]), bytes([1, 0, 1])]
    B = [bytes([1, 1]), bytes([1, 0]), bytes([1, 1]), bytes([0, 1])]
    C = [bytes([0, 1, 0]), bytes([1, 1, 1]), bytes([0, 1, 0]), bytes([0, 1, 0])]

    def _compose(self, bases, insts):
        cw = max(x + len(bases[b][0]) for b, x in insts)
        rows = [bytearray(cw) for _ in range(len(bases[0]))]
        for b, x in insts:
            for y in range(len(bases[b])):
                for xx, px in enumerate(bases[b][y]):
                    rows[y][x + xx] |= px
        return [bytes(r) for r in rows]

    def test_aggregate_equals_plain_composition(self):
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_decode_embedded,
            jbig2_encode_symbol_text,
            jbig2_encode_symbol_text_aggregate,
        )

        bases = [self.A, self.B, self.C]
        composites = [[(0, 0), (1, 4)], [(1, 0), (2, 3), (0, 7)]]
        placements = [(0, 2, 1), (1, 10, 1), (0, 3, 8)]
        ref = jbig2_decode_embedded(
            jbig2_encode_symbol_text(
                [self._compose(bases, c) for c in composites], placements, 24, 16
            )
        )
        for refine in (False, True):
            got = jbig2_decode_embedded(
                jbig2_encode_symbol_text_aggregate(
                    bases, composites, placements, 24, 16,
                    inline_refine_last=refine,
                )
            )
            assert got == ref, f"inline_refine_last={refine}"

    def test_aggregate_stream_mutation_totality(self):
        import random

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            Jbig2Error,
            jbig2_decode_embedded,
            jbig2_encode_symbol_text_aggregate,
        )

        bases = [self.A, self.B]
        base = jbig2_encode_symbol_text_aggregate(
            bases, [[(0, 0), (1, 4)]], [(0, 1, 1)], 12, 8
        )
        assert jbig2_decode_embedded(base)[0] == 12
        rng = random.Random(49)
        for _ in range(300):
            b = bytearray(base)
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                jbig2_decode_embedded(bytes(b))
            except Jbig2Error:
                pass

    def test_bad_instance_count_refuses(self):
        import pytest as _pytest

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            Jbig2Error,
            jbig2_encode_symbol_text_aggregate,
        )

        with _pytest.raises(Jbig2Error, match=">= 2 instances"):
            jbig2_encode_symbol_text_aggregate(
                [self.A], [[(0, 0)]], [(0, 0, 0)], 8, 8
            )


def test_text_region_paste_budget(monkeypatch):
    """Hostile placement streams raise instead of pinning a core: the
    placement loop's cumulative paste work (placed-symbol area summed over
    instances, clip or no clip) is bounded by 4x the pixel budget."""
    from frappe_data_pipelines_spark.operators import jbig2mini
    from frappe_data_pipelines_spark.operators.jbig2mini import (
        Jbig2Error,
        jbig2_decode_embedded,
        jbig2_encode_symbol_text,
    )

    monkeypatch.setattr(jbig2mini, "_MAX_PIXELS", 1 << 12)
    glyph = [bytes([1] * 32)] * 32  # 1024 px per paste
    few = [(0, 0, 0) for _ in range(4)]
    many = [(0, 0, 0) for _ in range(20)]  # 20 * 1024 > 4 * 4096
    ok = jbig2_encode_symbol_text([glyph], few, 64, 64)
    assert jbig2_decode_embedded(ok)[0] == 64
    bad = jbig2_encode_symbol_text([glyph], many, 64, 64)
    with pytest.raises(Jbig2Error, match="placement work exceeds budget"):
        jbig2_decode_embedded(bad)


class TestHuffmanRefinement:
    """Round 8: SBHUFF=1 text regions WITH refinement — RDW/RDH/RDX/RDY
    through custom type-53 tables, RSIZE through B.1, each instance's
    refinement its own byte-aligned MQ codeword (6.4.11)."""

    A = [bytes([1, 1, 1]), bytes([1, 0, 1]), bytes([1, 1, 1]), bytes([1, 0, 1])]
    B = [bytes([1, 1]), bytes([1, 0]), bytes([1, 1]), bytes([0, 1])]

    def test_refined_equals_plain(self):
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_decode_embedded,
            jbig2_encode_symbol_text_huffman,
        )

        placements = [(0, 2, 1), (1, 8, 1), (0, 3, 8)]
        ref = jbig2_decode_embedded(
            jbig2_encode_symbol_text_huffman([self.A, self.B], placements, 16, 16)
        )
        for collective in ("raw", "mmr"):
            got = jbig2_decode_embedded(
                jbig2_encode_symbol_text_huffman(
                    [self.A, self.B], placements, 16, 16,
                    collective=collective, inline_refine_last=True,
                )
            )
            assert got == ref, collective

    def test_std_table_refinement_b14_b15(self):
        """Round 9: B.14/B.15 are transcribed — a text region selecting
        the STANDARD refinement tables (RDW/RDH via B.14, RDX/RDY via
        B.15) decodes to the same page as the custom-table twin, and a
        RESERVED refinement selector still refuses."""
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            Jbig2Error,
            jbig2_decode_embedded,
            jbig2_encode_symbol_text_huffman,
        )

        placements = [(0, 2, 1), (1, 8, 1), (0, 3, 8)]
        ref = jbig2_decode_embedded(
            jbig2_encode_symbol_text_huffman([self.A, self.B], placements, 16, 16)
        )
        got = jbig2_decode_embedded(
            jbig2_encode_symbol_text_huffman(
                [self.A, self.B], placements, 16, 16,
                inline_refine_last=True, std_tables=True,
            )
        )
        assert got == ref

        # reserved selector (2) for SBHUFFRDW must refuse at parse time
        data = bytearray(
            jbig2_encode_symbol_text_huffman(
                [self.A, self.B], placements, 16, 16,
                inline_refine_last=True, std_tables=True,
            )
        )
        # the page-info body ALSO opens with the 16x16 dims; the text
        # region body is the second occurrence
        first = bytes(data).find(b"\x00\x00\x00\x10\x00\x00\x00\x10")
        body_at = bytes(data).find(b"\x00\x00\x00\x10\x00\x00\x00\x10", first + 1)
        assert body_at >= 0
        hf_at = body_at + 17 + 2
        hflags = int.from_bytes(data[hf_at : hf_at + 2], "big")
        assert (hflags >> 6) & 3 == 0  # B.14 selected by the encoder
        data[hf_at : hf_at + 2] = (hflags | (2 << 6)).to_bytes(2, "big")
        with pytest.raises(Jbig2Error, match="reserved"):
            jbig2_decode_embedded(bytes(data))

    def test_refinement_mutation_totality(self):
        import random

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            Jbig2Error,
            jbig2_decode_embedded,
            jbig2_encode_symbol_text_huffman,
        )

        base = jbig2_encode_symbol_text_huffman(
            [self.A, self.B], [(0, 1, 1), (1, 6, 1)], 12, 8,
            inline_refine_last=True,
        )
        assert jbig2_decode_embedded(base)[0] == 12
        rng = random.Random(53)
        for _ in range(300):
            b = bytearray(base)
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                jbig2_decode_embedded(bytes(b))
            except Jbig2Error:
                pass


class TestHuffmanRefagg:
    """Round 9: SDHUFF=1 SDREFAGG=1 dictionaries (6.5.8.2) — single-
    instance refinements (raw ids + B.15 offsets + B.1-sized MQ
    codewords) and multi-instance aggregates as nested huffman text
    regions over the Table 17 hardcoded standard tables, plus the
    standard-selector page path (FS=B.6, DS=B.8, DT=B.11)."""

    A = [bytes([1, 1, 1, 1]), bytes([1, 0, 0, 1]),
         bytes([1, 1, 1, 1]), bytes([1, 0, 0, 1])]
    B = [bytes([1, 1, 0, 0]), bytes([0, 1, 1, 0]),
         bytes([0, 0, 1, 1]), bytes([1, 1, 0, 1])]

    COMPOSITES = [
        [(0, 0), (1, 5)],
        [(1, 0), (0, 3), (1, 8)],
        [(0, 0)],  # single instance → 6.5.8.2.2 refinement path
    ]
    PLACEMENTS = [(0, 1, 1), (1, 12, 1), (2, 1, 8), (0, 14, 8)]

    def _expected(self, page_w, page_h):
        comp_bm = []
        for insts in self.COMPOSITES:
            cw = max(x + 4 for _, x in insts)
            rows = [bytearray(cw) for _ in range(4)]
            for b, x in insts:
                gl = (self.A, self.B)[b]
                for y in range(4):
                    for xx, px in enumerate(gl[y]):
                        rows[y][x + xx] |= px
            comp_bm.append(rows)
        page = [bytearray(page_w) for _ in range(page_h)]
        for c, x, y in self.PLACEMENTS:
            for yy in range(4):
                for xx, px in enumerate(comp_bm[c][yy]):
                    page[y + yy][x + xx] |= px
        return [bytes(r) for r in page]

    def test_refagg_roundtrip(self):
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_decode_embedded,
            jbig2_encode_symbol_text_huffman_refagg,
        )

        exp = self._expected(28, 14)
        for refine in (False, True):
            w, h, rows = jbig2_decode_embedded(
                jbig2_encode_symbol_text_huffman_refagg(
                    [self.A, self.B], self.COMPOSITES, self.PLACEMENTS,
                    28, 14, refine_in_aggregate=refine,
                )
            )
            assert (w, h) == (28, 14)
            assert rows == exp, f"refine_in_aggregate={refine}"

    def test_refagg_matches_arithmetic_aggregate(self):
        """The huffman REFAGG family and the arithmetic aggregate family
        must compose the identical page for the same layout (the
        single-instance composite is dropped: the arithmetic fixture
        encoder requires >= 2 instances per composite)."""
        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_decode_embedded,
            jbig2_encode_symbol_text_aggregate,
            jbig2_encode_symbol_text_huffman_refagg,
        )

        comps = [c for c in self.COMPOSITES if len(c) > 1]
        placements = [(c, x, y) for c, x, y in self.PLACEMENTS if c < len(comps)]
        arith = jbig2_decode_embedded(
            jbig2_encode_symbol_text_aggregate(
                [self.A, self.B], comps, placements, 28, 14
            )
        )
        huff = jbig2_decode_embedded(
            jbig2_encode_symbol_text_huffman_refagg(
                [self.A, self.B], comps, placements, 28, 14
            )
        )
        assert arith == huff

    def test_refagg_mutation_totality(self):
        import random
        import struct as _struct

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            Jbig2Error,
            jbig2_decode_embedded,
            jbig2_encode_symbol_text_huffman_refagg,
        )

        base = jbig2_encode_symbol_text_huffman_refagg(
            [self.A, self.B], self.COMPOSITES, self.PLACEMENTS, 28, 14,
            refine_in_aggregate=True,
        )
        assert jbig2_decode_embedded(base)[0] == 28
        rng = random.Random(97)
        for _ in range(300):
            b = bytearray(base)
            for _ in range(rng.randrange(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            try:
                jbig2_decode_embedded(bytes(b))
            except (Jbig2Error, ValueError, IndexError, _struct.error):
                pass  # declared failures only — no hangs, no other types

    @settings(max_examples=25, deadline=None)
    @given(st.integers(0, 2**32 - 1))
    def test_refagg_vs_arithmetic_differential(self, seed):
        """Property: ANY random base-glyph set + composite layout decodes
        to the same page through the huffman REFAGG family as through the
        arithmetic aggregate family — including random std-table page
        placement and the single-instance refinement path (the huffman
        encoder keeps singles; they're dropped for the arithmetic twin,
        which requires >= 2 instances, and composed by hand instead)."""
        import random

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            jbig2_decode_embedded,
            jbig2_encode_symbol_text_aggregate,
            jbig2_encode_symbol_text_huffman_refagg,
        )

        rng = random.Random(seed)
        bh = rng.randint(2, 5)
        n_base = rng.randint(1, 4)
        bases = []
        for _ in range(n_base):
            gw = rng.randint(1, 5)  # rectangular: one width per glyph
            bases.append(
                [bytes(rng.randint(0, 1) for _ in range(gw)) for _ in range(bh)]
            )
        comps = []
        for _ in range(rng.randint(1, 3)):
            n_inst = rng.randint(2, 3)
            insts, x = [], 0
            for _ in range(n_inst):
                b = rng.randrange(n_base)
                insts.append((b, x))
                x += len(bases[b][0]) + rng.randint(0, 2)
            comps.append(insts)
        pw, ph = 40, 20
        placements = []
        for _ in range(rng.randint(1, 5)):
            c = rng.randrange(len(comps))
            cw = max(x + len(bases[b][0]) for b, x in comps[c])
            placements.append(
                (c, rng.randint(0, pw - cw), rng.randint(0, ph - bh))
            )
        arith = jbig2_decode_embedded(
            jbig2_encode_symbol_text_aggregate(bases, comps, placements, pw, ph)
        )
        for refine in (False, True):
            huff = jbig2_decode_embedded(
                jbig2_encode_symbol_text_huffman_refagg(
                    bases, comps, placements, pw, ph,
                    refine_in_aggregate=refine,
                )
            )
            assert huff == arith, (seed, refine)

    def test_standard_tables_roundtrip_all(self):
        """Every transcribed standard table round-trips its full value
        shape (normal ranges, 32-bit lower/upper tails, OOB), and the
        untranscribed B.7/B.10 refuse."""
        import pytest

        from frappe_data_pipelines_spark.operators.jbig2mini import (
            Jbig2Error,
            _HuffBitReader,
            _HuffBitWriter,
            standard_table,
        )

        for n in (1, 2, 3, 4, 5, 6, 8, 9, 11, 12, 13, 14, 15):
            t = standard_table(n)
            vals = []
            for pl, rl, rlow, kind in t.lines:
                if kind == "n":
                    vals += [rlow, rlow + (1 << rl) - 1]
                elif kind == "l":
                    vals += [rlow, rlow - 1000]
                elif kind == "u":
                    vals += [rlow, rlow + 1000]
                else:
                    vals.append(None)
            bw = _HuffBitWriter()
            for v in vals:
                t.encode(bw, v)
            br = _HuffBitReader(bw.finish())
            assert [t.decode(br) for v in vals] == vals, f"B.{n}"
        for n in (7, 10):
            with pytest.raises(Jbig2Error, match=f"B.{n}"):
                standard_table(n)


def test_aggregate_dictionary_budget_is_shared(monkeypatch):
    """Review r8 pass 2: the paste-work budget must span ALL aggregates in
    one dictionary — per-call budgets would let a stream multiply the
    bound by the declared symbol count."""
    from frappe_data_pipelines_spark.operators import jbig2mini
    from frappe_data_pipelines_spark.operators.jbig2mini import (
        Jbig2Error,
        jbig2_decode_embedded,
        jbig2_encode_symbol_text_aggregate,
    )

    monkeypatch.setattr(jbig2mini, "_MAX_PIXELS", 1 << 12)
    base = [bytes([1] * 16)] * 16  # 256 px per paste
    # each composite pastes 2 instances = 512 px; budget = 4*4096 = 16384
    few = [[(0, 0), (0, 8)] for _ in range(8)]     # 4096 px total: fits
    many = [[(0, 0), (0, 8)] for _ in range(40)]   # 20480 px: exceeds
    ok = jbig2_encode_symbol_text_aggregate([base], few, [(0, 0, 0)], 24, 16)
    assert jbig2_decode_embedded(ok)[0] == 24
    bad = jbig2_encode_symbol_text_aggregate(
        [base], many, [(0, 0, 0)], 24, 16
    )
    with pytest.raises(Jbig2Error, match="placement work exceeds budget"):
        jbig2_decode_embedded(bad)


def test_nested_region_consumes_strip_terminating_oob():
    """ADVICE r9 (medium): 6.4.5 closes EVERY strip with an OOB from the
    DS decoder. A nested (in-dictionary) region shares the dictionary's
    stream, so the decoder must consume that OOB — and must raise when a
    conformant-looking stream carries MORE instances than REFAGGNINST
    declared. Exercised directly against the factored placement loop."""
    from frappe_data_pipelines_spark.operators.jbig2mini import (
        Jbig2Error,
        _text_region_place,
    )

    def run(ds_codes):
        ds_iter = iter(ds_codes)
        consumed = []

        def get_ds():
            v = next(ds_iter)
            consumed.append(v)
            return v

        rows = _text_region_place(
            8, 4, 2, [[bytes([1] * 4)] * 4],  # 2 instances of a 4x4 glyph
            1, 1, 0, 0, 0, 0, 0,  # strips=1 TOPLEFT OR defpx=0 dsoff=0 REFINE=0
            lambda: 0, lambda: 0,  # DT, FS
            get_ds, lambda: 0, lambda: 0,  # DS, CURT, SID
            lambda: None, lambda s: s,
            expect_strip_oob=True,
        )
        return rows, consumed

    # conformant: DS=3 between the two instances, then the strip OOB
    rows, consumed = run([3, None])
    assert consumed == [3, None]  # the trailing OOB was consumed
    assert rows[0] == bytes([1, 1, 1, 1, 0, 0, 1, 1])
    # over-declared: a real DS where the terminating OOB belongs
    with pytest.raises(Jbig2Error, match="past REFAGGNINST"):
        run([3, 5])


def test_aggregate_encoders_emit_strip_terminating_oob():
    """Both nested fixture encoders write the 6.4.5 OOB so a conformant
    decoder (pdf.js-shaped do/while that reads DS after each placement)
    stays in sync; our decoder roundtrips them through the strict path."""
    from frappe_data_pipelines_spark.operators.jbig2mini import (
        jbig2_decode_embedded,
        jbig2_encode_symbol_text_aggregate,
        jbig2_encode_symbol_text_huffman_refagg,
    )

    base_l = [bytes([1, 0, 1, 0])] * 6
    base_r = [bytes([0, 1, 0, 1])] * 6
    composites = [[(0, 0), (1, 4)], [(1, 0), (0, 4)]]
    placements = [(0, 0, 0), (1, 10, 0)]
    for enc in (
        jbig2_encode_symbol_text_aggregate,
        jbig2_encode_symbol_text_huffman_refagg,
    ):
        w, h, rows = jbig2_decode_embedded(
            enc([base_l, base_r], composites, placements, 20, 8)
        )
        assert (w, h) == (20, 8)
        assert rows[0][:8] == bytes([1, 0, 1, 0, 0, 1, 0, 1])
        assert rows[0][10:18] == bytes([0, 1, 0, 1, 1, 0, 1, 0])


def test_noncausal_refinement_at1_roundtrips():
    """Round 10 closes the non-causal template-0 refinement AT1 refusal:
    a coding tap at/after the current pixel reads 0 (zero-initialized
    output, the 6.2.5.7 not-yet-decoded convention) and the encoder
    mirrors it with a progressive row reveal. Kernel-level roundtrip over
    several geometries, then the embedded REFAGG path end-to-end."""
    import random

    from frappe_data_pipelines_spark.operators.jbig2mini import (
        MQDecoder,
        MQEncoder,
        _ref_ctx_bank,
        jbig2_decode_embedded,
        jbig2_encode_symbol_text_refagg,
        refinement_region_decode,
        refinement_region_encode,
    )

    rng = random.Random(11)
    w, h = 13, 9
    ref = [bytes(rng.randrange(2) for _ in range(w)) for _ in range(h)]
    target = [
        bytes(ref[y][x] ^ (rng.random() < 0.15) for x in range(w))
        for y in range(h)
    ]
    for a1 in ((1, 0), (0, 1), (0, 0), (3, 2), (-2, 1), (127, 0)):
        at = (a1, (-1, -1))
        mq = MQEncoder()
        refinement_region_encode(
            mq, _ref_ctx_bank(0), target, w, h, ref, template=0, at=at
        )
        got = refinement_region_decode(
            MQDecoder(mq.flush()), _ref_ctx_bank(0), w, h, ref,
            template=0, at=at,
        )
        assert [bytes(r) for r in got] == target, f"AT1={a1}"

    # embedded: rough->clean REFAGG dictionary + inline-refined text
    # region, SDRAT/SBRAT carrying a non-causal A1 through the headers
    rough = [[bytes([1, 1, 0, 0])] * 6, [bytes([0, 0, 1, 1])] * 6]
    clean = [[bytes([1, 0, 1, 0])] * 6, [bytes([0, 1, 0, 1])] * 6]
    placements = [(0, 0, 0), (1, 6, 0), (0, 12, 2)]
    data = jbig2_encode_symbol_text_refagg(
        rough, clean, placements, 20, 10,
        r_template=0, rat=((1, 0), (-1, -1)),
    )
    gw, gh, rows = jbig2_decode_embedded(data)
    assert (gw, gh) == (20, 10)
    assert rows[0][:4] == bytes([1, 0, 1, 0])
    assert rows[0][6:10] == bytes([0, 1, 0, 1])
    assert rows[2][12:16] == bytes([1, 0, 1, 0])


def test_noncausal_at1_fixture_pdf_ocrs_to_golden():
    """The checked-in non-causal-AT1 scanned PDF (SDRAT/SBRAT A1 at
    (+1, 0) — right of the pixel being coded) OCRs to the exact golden:
    round 10's closure of the last template-0 refinement refusal."""
    import os

    from frappe_data_pipelines_spark.operators.extraction import pdf_ocr_scanned

    fixtures = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "frappe_data_pipelines_spark", "resources", "fixtures",
    )
    with open(os.path.join(fixtures, "sample_scanned_jbig2nc.pdf"), "rb") as f:
        data = f.read()
    text, conf = pdf_ocr_scanned(data)
    assert text == "SCANNED ARCHIVE BOX 7\nREF NO: 2019-114"
    assert conf == 1.0
