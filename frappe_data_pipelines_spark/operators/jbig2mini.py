"""JBIG2 (ITU-T T.88 arithmetic coder + T.89/ISO 14492 generic regions).

Modern B/W scanner pipelines embed JBIG2 in PDFs (/JBIG2Decode) — the last
scanned-page encoding the A10 raster path did not speak. This module
implements the arithmetically-coded generic-region subset, stdlib-only:

* the **MQ arithmetic coder** (T.88 Annex E software conventions: Qe state
  table, BYTEIN/BYTEOUT with 0xFF stuffing, INITDEC/INITENC, FLUSH) — both
  directions, so fixtures and round-trip fuzzing need no external encoder;
* **generic region** decoding/encoding, GBTEMPLATEs 0-3, nominal AT
  pixels, TPGDON supported (typical-prediction row copies — the mode real
  encoders enable by default); MMR-coded regions decode through the T.6
  kernel in ``operators/faxmini``;
* **symbol dictionaries** (arithmetic: IADH/IADW height classes, shared
  MQ + GB contexts per 6.5.8.1, IAEX export runs; huffman: Annex B DH/DW
  tables with uncompressed or MMR collective bitmaps per 6.5.9) and
  **immediate text regions** (strip walk with IADT/IAFS/IADS/IAIT, IAID
  symbol codes — or their Annex B huffman equivalents with the run-coded
  symbol ID lengths of 7.4.4.1.7 — all four reference corners, both
  TRANSPOSED orientations) — the profile real scanned PDFs ship — plus
  the Annex A arithmetic integer coder and the Annex B huffman table
  layer (standard tables B.1-B.6, B.8-B.9, B.11-B.15 + custom type-53
  segments), all both directions;
* the **PDF-embedded segment stream** (no file header): segment headers
  (type, referred-segment bytes, page association, data length), page-info,
  generic-region, symbol-dictionary and text-region segments.

Scope honesty: standard huffman tables B.7 and B.10 are NOT implemented
(our reconstructions fail the Kraft checksum, so they stay untranscribed —
custom-table streams cover those two selector slots); a stream selecting
them raises ``Jbig2Error`` and the PDF dispatch falls back exactly like
any other unsupported filter. Non-causal template-0 refinement AT1 pixels
ARE implemented (round 10): a coding tap at/after the current pixel reads
0 through the zero-initialized output bitmap (the 6.2.5.7 not-yet-decoded
convention), and the encoder mirrors it by revealing each row
progressively. Likewise NOT implemented (ADVICE r9): huffman refinement
codewords with BMSIZE=0 — 6.4.11 allows "data not byte-counted", where
the MQ refinement's length is discovered only by decoding; both the
text-region path and the REFAGG dictionary path require a positive
B.1/RSIZE-coded byte count and raise on BMSIZE=0 rather than guess the
consumed-byte accounting without a conformant fixture to validate it. Everything else in the huffman family IS implemented: standard
tables B.1-B.6, B.8-B.9, B.11-B.15 (doubly checksummed transcriptions —
exact Kraft completeness and gap-free range tiling), huffman REFINEMENT
through standard B.14/B.15 or custom tables, and huffman REFAGG
dictionaries (6.5.8.2 with SDHUFF=1: single-instance refinements via raw
SBSYMCODELEN-bit ids + B.15 offsets + B.1-sized MQ codewords, and
multi-instance aggregates as nested huffman text regions over the
hardcoded B.6/B.8/B.11/B.15/B.1 tables of Table 17). Multi-instance
aggregates (REFAGGNINST > 1) are implemented in BOTH families: the symbol
decodes as a nested text region driven by the dictionary's shared
decoder and context banks (6.5.8.2, Table 17). Every ARITHMETIC region type IS
implemented, both directions: generic (incl. custom AT + MMR via T.6),
symbol/text, refinement in BOTH templates (GRTEMPLATE 1 fixed and
GRTEMPLATE 0 with movable SDRAT/SBRAT pixels; refined instances +
single-instance REFAGG), and halftone (pattern dictionaries with the A1=(-HDPW,0) collective template
or HDMMR T.6 coding, gray-coded bitplanes — arithmetic with optional
HENABLESKIP cell masking, or HMMR as one unreset T.6 stream across all
planes — and skewable grid placement). The template-0 context is built in the spec figure's
raster order (row y−2, row y−1, row y, with the four nominal AT pixels in
their nominal positions); encoder and decoder share one context builder
and are validated by exhaustive round-trip fuzzing plus the PDF
integration fixture.
"""

from __future__ import annotations


class Jbig2Error(ValueError):
    pass


# T.88 Table E.1: (Qe, NMPS, NLPS, SWITCH)
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0), (0x0AC1, 4, 12, 0),
    (0x0521, 5, 29, 0), (0x0221, 38, 33, 0), (0x5601, 7, 6, 1), (0x5401, 8, 14, 0),
    (0x4801, 9, 14, 0), (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1), (0x5401, 16, 14, 0),
    (0x5101, 17, 15, 0), (0x4801, 18, 16, 0), (0x3801, 19, 17, 0), (0x3401, 20, 18, 0),
    (0x3001, 21, 19, 0), (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0), (0x1401, 28, 25, 0),
    (0x1201, 29, 26, 0), (0x1101, 30, 27, 0), (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0),
    (0x08A1, 33, 30, 0), (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0), (0x0085, 40, 37, 0),
    (0x0049, 41, 38, 0), (0x0025, 42, 39, 0), (0x0015, 43, 40, 0), (0x0009, 44, 41, 0),
    (0x0005, 45, 42, 0), (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class MQDecoder:
    """T.88 Annex E decoder (software conventions)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c <<= 7
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        data, bp = self.data, self.bp
        b = data[bp] if bp < len(data) else 0xFF
        if b == 0xFF:
            b1 = data[bp + 1] if bp + 1 < len(data) else 0xFF
            if b1 > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp += 1
            b1 = data[self.bp] if self.bp < len(data) else 0xFF
            self.c += b1 << 8
            self.ct = 8

    def decode(self, cx: list) -> int:
        """cx = [index, mps] mutable context state."""
        qe, nmps, nlps, switch = _QE[cx[0]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if self.a < qe:
                d = cx[1]
                cx[0] = nmps
            else:
                d = 1 - cx[1]
                if switch:
                    cx[1] = 1 - cx[1]
                cx[0] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return cx[1]
            if self.a < qe:
                d = 1 - cx[1]
                if switch:
                    cx[1] = 1 - cx[1]
                cx[0] = nlps
            else:
                d = cx[1]
                cx[0] = nmps
        while True:  # RENORMD
            if self.ct == 0:
                self._bytein()
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 Annex E encoder (software conventions, incl. FLUSH). Uses the
    leading-dummy-byte convention for carry propagation: ``out[0]`` absorbs
    a carry that would otherwise fall off the front and is discarded at
    flush."""

    def __init__(self) -> None:
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray(b"\x00")  # dummy; dropped at flush
        self.bp = 0

    def _byteout(self) -> None:
        if self.out[self.bp] == 0xFF:
            # previous byte was a stuffed 0xFF → next carries 7 bits
            self.bp += 1
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
            return
        if self.c >= 0x8000000:
            self.out[self.bp] += 1  # carry
            if self.out[self.bp] == 0xFF:
                self.c &= 0x7FFFFFF
                self.bp += 1
                self.out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
                return
            self.c &= 0x7FFFFFF
        self.bp += 1
        self.out.append((self.c >> 19) & 0xFF)
        self.c &= 0x7FFFF
        self.ct = 8

    def encode(self, cx: list, d: int) -> None:
        qe, nmps, nlps, switch = _QE[cx[0]]
        if d == cx[1]:  # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe  # MPS owns the upper subinterval
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            cx[0] = nmps
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                cx[1] = 1 - cx[1]
            cx[0] = nlps
        while True:  # RENORME
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS, 1s-fill form: pick the value inside [C, C+A) whose low
        # 16 bits are all ones — decoders feed 1-bits past the stream end
        # (the marker convention), so the implied suffix must stay inside
        # the final interval
        top = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= top:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        return bytes(self.out[1:]) + b"\xff\xac"  # drop dummy; MQ terminator


# -- generic regions (GBTEMPLATE 0-3, nominal AT) -----------------------------

# template pixels in raster order (dy, dx), AT pixels at nominal positions
_TEMPLATES = {
    0: [
        (-2, -2), (-2, -1), (-2, 0), (-2, 1), (-2, 2),   # row y-2 incl. A4, A3
        (-1, -3), (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2), (-1, 3),  # A2, A1
        (0, -4), (0, -3), (0, -2), (0, -1),
    ],
    1: [
        (-2, -1), (-2, 0), (-2, 1), (-2, 2),
        (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2), (-1, 3),  # incl. A1
        (0, -3), (0, -2), (0, -1),
    ],
    2: [
        (-2, -1), (-2, 0), (-2, 1),
        (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2),  # incl. A1
        (0, -2), (0, -1),
    ],
    3: [
        (-1, -3), (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2),  # incl. A1
        (0, -4), (0, -3), (0, -2), (0, -1),
    ],
}
# SLTP pseudo-pixel contexts per template (T.89 6.2.5.7)
_SLTP_CTXS = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}
# AT pixel pairs carried in the segment per template
_N_AT = {0: 4, 1: 1, 2: 1, 3: 1}
# nominal AT coordinates (x, y) per template (T.88 6.2.5.3). _TEMPLATES
# hard-codes this geometry, so a stream carrying NON-nominal AT pixels
# (legal for encoders) would decode to silent garbage if we ignored the
# bytes — the decoder validates them and refuses into the standard
# fallback instead (ADVICE r5).
_NOMINAL_AT = {
    0: ((3, -1), (-3, -1), (2, -2), (-2, -2)),
    1: ((3, -1),),
    2: ((2, -1),),
    3: ((2, -1),),
}


# fixed (non-AT) pixels per template, for rebuilding the raster-order
# pixel list when a caller supplies NON-nominal AT positions (pattern
# dictionaries legally use A1 = (-HDPW, 0)). With nominal AT the rebuilt
# list equals _TEMPLATES — the nominal slots sit at their raster positions.
_FIXED_PIXELS = {
    t: tuple(p for p in pix if p not in {(dy, dx) for dx, dy in _NOMINAL_AT[t]})
    for t, pix in _TEMPLATES.items()
}


def _template_pixels(template: int, at: list | None) -> list:
    """Raster-ordered context pixels for ``template`` with AT pixels at
    ``at`` ((x, y) pairs; None → nominal)."""
    if at is None:
        return _TEMPLATES[template]
    if len(at) != _N_AT[template]:
        raise Jbig2Error(f"template {template} needs {_N_AT[template]} AT pixels")
    pix = list(_FIXED_PIXELS[template]) + [(dy, dx) for dx, dy in at]
    pix.sort()  # (dy, dx) raster order — the order the figures read in
    return pix


def _context(rows: list[bytearray], x: int, y: int, w: int, pixels) -> int:
    ctx = 0
    for dy, dx in pixels:
        yy, xx = y + dy, x + dx
        bit = rows[yy][xx] if 0 <= yy and 0 <= xx < w else 0
        ctx = (ctx << 1) | bit
    return ctx


def generic_region_decode(
    data: bytes, w: int, h: int, tpgdon: bool = False, template: int = 0,
    at: list | None = None,
) -> list[bytes]:
    """MQ data → rows of 0/1 bytes (templates 0-3, optional TPGDON,
    optional custom AT pixels)."""
    mq = MQDecoder(data)
    cxs = [[0, 0] for _ in range(1 << len(_TEMPLATES[template]))]
    return _generic_decode_into(mq, cxs, w, h, tpgdon=tpgdon, template=template, at=at)


def _generic_decode_into(
    mq: MQDecoder, cxs: list, w: int, h: int, tpgdon: bool = False, template: int = 0,
    at: list | None = None, skip: list | None = None,
) -> list[bytes]:
    """Generic-region decode driven by a SHARED MQ decoder + context array —
    the form symbol dictionaries use (T.88 6.5.8.1: every symbol bitmap in a
    dictionary continues the same arithmetic decoder and GB contexts).
    ``skip`` is the optional USESKIP bitmap (6.2.5.7): a marked pixel is
    set to 0 WITHOUT consuming a decision — halftone HENABLESKIP cells
    fully outside the region are never coded."""
    pixels = _template_pixels(template, at)
    sltp_ctx = _SLTP_CTXS[template]
    rows: list[bytearray] = []
    ltp = 0
    for y in range(h):
        if tpgdon:
            ltp ^= mq.decode(cxs[sltp_ctx])
            if ltp:  # typical row: copy the previous one, no pixel decode
                rows.append(bytearray(rows[y - 1]) if y else bytearray(w))
                continue
        row = bytearray(w)
        rows.append(row)
        srow = skip[y] if skip is not None else None
        for x in range(w):
            if srow is not None and srow[x]:
                continue  # skipped: stays 0, no decision consumed
            row[x] = mq.decode(cxs[_context(rows, x, y, w, pixels)])
    return [bytes(r) for r in rows]


def generic_region_encode(
    rows: list[bytes], w: int, h: int, tpgdon: bool = False, template: int = 0,
    at: list | None = None,
) -> bytes:
    mq = MQEncoder()
    cxs = [[0, 0] for _ in range(1 << len(_TEMPLATES[template]))]
    _generic_encode_into(mq, cxs, rows, w, h, tpgdon=tpgdon, template=template, at=at)
    return mq.flush()


def _generic_encode_into(
    mq: MQEncoder, cxs: list, rows: list[bytes], w: int, h: int,
    tpgdon: bool = False, template: int = 0, at: list | None = None,
    skip: list | None = None,
) -> None:
    """Encoder twin of _generic_decode_into: no flush, shared MQ + contexts.
    ``skip`` pixels are forced to 0 in the built context rows and emit no
    decision — mirror of the decoder's USESKIP rule."""
    pixels = _template_pixels(template, at)
    sltp_ctx = _SLTP_CTXS[template]
    built: list[bytearray] = []
    ltp = 0
    for y in range(h):
        row = bytearray(rows[y][:w])
        srow = skip[y] if skip is not None else None
        if srow is not None:
            for x in range(w):
                if srow[x]:
                    row[x] = 0  # context rows must agree with the decoder
        if tpgdon:
            typical = y > 0 and row == built[y - 1] or (y == 0 and not any(row))
            # y==0 typical only if all-zero (the implicit row above is blank)
            mq.encode(cxs[sltp_ctx], (ltp ^ typical) & 1)
            ltp = 1 if typical else 0
            built.append(row)
            if typical:
                continue
        else:
            built.append(row)
        for x in range(w):
            if srow is not None and srow[x]:
                continue
            mq.encode(cxs[_context(built, x, y, w, pixels)], row[x] & 1)


# -- arithmetic integer decoding (T.88 Annex A) ------------------------------

# Each IAx procedure owns a 512-entry context bank indexed by the PREV
# prefix register (A.2: PREV caps at 9 bits, sticky top bit past 256).


def _int_ctx() -> list:
    return [[0, 0] for _ in range(512)]


# (prefix-length, value-bits, offset) buckets of the A.2 integer code
_INT_BUCKETS = ((2, 0), (4, 4), (6, 20), (8, 84), (12, 340), (32, 4436))


def arith_int_decode(mq: MQDecoder, cx: list) -> int | None:
    """T.88 A.2 IAx integer decode; returns None for OOB."""
    prev = 1

    def bit() -> int:
        nonlocal prev
        b = mq.decode(cx[prev])
        prev = (prev << 1) | b if prev < 256 else ((((prev << 1) | b) & 511) | 256)
        return b

    s = bit()
    n = off = None
    for i, (nb, o) in enumerate(_INT_BUCKETS):
        if i == len(_INT_BUCKETS) - 1 or not bit():
            n, off = nb, o
            break
    v = 0
    for _ in range(n):
        v = (v << 1) | bit()
    v += off
    if s and v == 0:
        return None  # OOB
    return -v if s else v


def arith_int_encode(mq: MQEncoder, cx: list, value: int | None) -> None:
    """Encoder twin of arith_int_decode (None encodes OOB)."""
    prev = 1

    def bit(b: int) -> None:
        nonlocal prev
        mq.encode(cx[prev], b)
        prev = (prev << 1) | b if prev < 256 else ((((prev << 1) | b) & 511) | 256)

    if value is None:
        bit(1)           # sign
        bit(0)           # first bucket
        bit(0); bit(0)   # V = 0 → OOB
        return
    s = 1 if value < 0 else 0
    v = -value if s else value
    bit(s)
    for i, (nb, off) in enumerate(_INT_BUCKETS):
        last = i == len(_INT_BUCKETS) - 1
        top = off + (1 << nb)
        if v < top or last:
            if not last:
                bit(0)
            vv = v - off
            for j in reversed(range(nb)):
                bit((vv >> j) & 1)
            return
        bit(1)


def arith_iaid_decode(mq: MQDecoder, cx: list, code_len: int) -> int:
    """T.88 A.3 IAID: ``code_len`` bits through a prefix-tree context."""
    prev = 1
    for _ in range(code_len):
        b = mq.decode(cx[prev])
        prev = (prev << 1) | b
    return prev - (1 << code_len)


def arith_iaid_encode(mq: MQEncoder, cx: list, value: int, code_len: int) -> None:
    prev = 1
    for j in reversed(range(code_len)):
        b = (value >> j) & 1
        mq.encode(cx[prev], b)
        prev = (prev << 1) | b


def _iaid_ctx(code_len: int) -> list:
    return [[0, 0] for _ in range(1 << (code_len + 1))]


# -- generic refinement regions (T.88 6.3, GRTEMPLATE 0 + 1) -----------------

# Refinement decodes a bitmap given a REFERENCE bitmap: each pixel's
# context mixes already-decoded neighbors of the current bitmap with a
# neighborhood of the reference. Two template geometries (T.88 figure 12):
# template 1 is fixed (4 coding + 6 reference pixels); template 0 adds two
# MOVABLE AT pixels — A1 in the coding bitmap (must be causal: above the
# current row, or left of the current pixel) and A2 in the reference
# bitmap — for 13 context bits. Context bit order: coding pixels then AT1,
# reference pixels then AT2, raster order — an arbitrary-but-fixed
# bijection (adaptive contexts are just probability bins, so any
# consistent numbering of the same PIXEL SET decodes any conforming
# stream identically).
_REF_TEMPLATES = {
    0: (
        ((0, -1), (1, -1), (-1, 0)),
        ((0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (-1, 1), (0, 1), (1, 1)),
    ),
    1: (
        ((-1, -1), (0, -1), (1, -1), (-1, 0)),
        ((0, -1), (-1, 0), (0, 0), (1, 0), (0, 1), (1, 1)),
    ),
}
# nominal causal AT for the template-0 ENCODER (decoders accept any causal
# A1 a stream carries; A2 has no causality constraint — the reference
# bitmap is fully available)
_NOMINAL_RAT = ((-2, -1), (-1, -1))


def _ref_pixel_sets(template: int, at=None):
    coding, reference = _REF_TEMPLATES[template]
    if template == 0:
        a1, a2 = at if at is not None else _NOMINAL_RAT
        coding = coding + (tuple(a1),)
        reference = reference + (tuple(a2),)
    return coding, reference


def _ref_context(rows, ref, x, y, w, dx, dy, coding, reference) -> int:
    ctx = 0
    for ddx, ddy in coding:
        # a NON-CAUSAL coding tap (a movable AT1 at/after the current
        # pixel — allowed by T.88, round 10) reads 0: the output bitmap
        # is zero-initialized and pixels are revealed as they are coded,
        # the 6.2.5.7 convention for not-yet-decoded pixels, mirrored
        # exactly by the encoder's progressive row reveal
        xx, yy = x + ddx, y + ddy
        bit = rows[yy][xx] if 0 <= yy < len(rows) and 0 <= xx < w else 0
        ctx = (ctx << 1) | bit
    rh = len(ref)
    rw = len(ref[0]) if rh else 0
    for ddx, ddy in reference:
        xx, yy = x - dx + ddx, y - dy + ddy
        bit = ref[yy][xx] if 0 <= yy < rh and 0 <= xx < rw else 0
        ctx = (ctx << 1) | bit
    return ctx


def refinement_region_decode(
    mq: MQDecoder, cxs: list, w: int, h: int, ref: list, dx: int = 0, dy: int = 0,
    template: int = 1, at=None,
) -> list[bytes]:
    """Refinement decode (GRTEMPLATE 0 or 1) driven by a shared MQ decoder
    + context bank (the form refined text instances, REFAGG symbol
    dictionaries, and standalone refinement use). ``ref`` is the reference
    bitmap; (dx, dy) position it under the decoded bitmap
    (GRREFERENCEDX/DY); ``at`` carries template 0's two AT pairs."""
    coding, reference = _ref_pixel_sets(template, at)
    rows: list[bytearray] = []
    for y in range(h):
        row = bytearray(w)
        rows.append(row)
        for x in range(w):
            row[x] = mq.decode(
                cxs[_ref_context(rows, ref, x, y, w, dx, dy, coding, reference)]
            )
    return [bytes(r) for r in rows]


def refinement_region_encode(
    mq: MQEncoder, cxs: list, rows: list[bytes], w: int, h: int,
    ref: list, dx: int = 0, dy: int = 0, template: int = 1, at=None,
) -> None:
    """Encoder twin of refinement_region_decode (no flush). Rows are
    revealed PROGRESSIVELY — each pixel lands in ``built`` only after its
    context is formed — so a non-causal coding tap reads 0 exactly like
    the decoder's zero-initialized bitmap does (pre-filling the current
    row with final values would desync every non-causal AT1 stream)."""
    coding, reference = _ref_pixel_sets(template, at)
    built: list[bytearray] = []
    for y in range(h):
        row = bytearray(w)
        built.append(row)
        src = rows[y]
        for x in range(w):
            bit = src[x] & 1
            mq.encode(
                cxs[_ref_context(built, ref, x, y, w, dx, dy, coding, reference)],
                bit,
            )
            row[x] = bit


def _ref_ctx_bank(template: int = 1) -> list:
    n_bits = sum(len(t) for t in _REF_TEMPLATES[template]) + (
        2 if template == 0 else 0
    )
    return [[0, 0] for _ in range(1 << n_bits)]


def _read_rat(body: bytes, pos: int):
    """Two signed refinement-AT pairs (SDRAT/SBRAT, present only when the
    refinement template is 0). Any geometry is accepted (round 10):
    non-causal A1 taps read 0 through the decoder's zero-initialized
    output bitmap, the 6.2.5.7 not-yet-decoded convention the encoder
    mirrors with its progressive row reveal."""
    if len(body) < pos + 4:
        raise Jbig2Error("truncated refinement AT pixel coordinates")
    def sb(b):
        return b - 256 if b > 127 else b
    a1 = (sb(body[pos]), sb(body[pos + 1]))
    a2 = (sb(body[pos + 2]), sb(body[pos + 3]))
    return (a1, a2), pos + 4


# -- Huffman coding layer (T.88 Annex B + 7.4.3/7.4.4 huffman profiles) ------
#
# JBIG2's second coding family: bit-packed Huffman streams instead of the MQ
# coder. Tables are (PREFLEN, RANGELEN, RANGELOW) lines with canonical prefix
# codes assigned per B.3 (increasing length, table order inside a length);
# "lower"/"upper" lines carry 32-bit offsets off the table ends, and OOB
# terminates sequences exactly like the arithmetic coder's OOB.
#
# Scope: standard tables B.1-B.6, B.8-B.9, B.11-B.15 (every transcription is
# doubly checksummed: exact Kraft completeness — sum 2^-PREFLEN == 1.0,
# asserted at import — AND gap-free range tiling from the lowest normal line
# to the upper-range line, asserted below; a mistranscribed line fails one or
# both) plus fully general CUSTOM table segments (type 53, spec B.2 —
# self-describing, so no transcription risk). B.7 and B.10 remain refused:
# our reconstructions of those two line lists fail the Kraft checksum, so
# shipping them would be guessing — custom-table streams cover their
# selector slots.


class _HuffBitReader:
    """MSB-first bit reader with byte realignment (collective bitmaps and
    MMR payloads sit byte-aligned inside the same segment body)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.nbits = 0
        self.cur = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise Jbig2Error("huffman stream overrun")
            self.cur = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.nbits = 0


class _HuffBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, n: int, v: int) -> None:
        for i in range(n - 1, -1, -1):
            self.cur = (self.cur << 1) | ((v >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def align(self) -> None:
        if self.nbits:
            self.out.append(self.cur << (8 - self.nbits))
            self.cur = 0
            self.nbits = 0

    def write_bytes(self, b: bytes) -> None:
        if self.nbits:
            raise Jbig2Error("raw bytes need byte alignment")
        self.out += b

    def finish(self) -> bytes:
        self.align()
        return bytes(self.out)


class HuffTable:
    """One JBIG2 Huffman table. ``lines`` are (preflen, rangelen, rangelow,
    kind) with kind 'n' (normal: rangelow + RANGELEN-bit offset), 'l'
    (lower: rangelow - 32-bit offset), 'u' (upper: rangelow + 32-bit
    offset), 'o' (OOB -> None). Codes assigned canonically (B.3)."""

    def __init__(self, lines: list[tuple[int, int, int, str]]):
        self.lines = [ln for ln in lines if ln[0] > 0]
        if not self.lines:
            raise Jbig2Error("huffman table with no coded lines")
        maxlen = max(ln[0] for ln in self.lines)
        if maxlen > 32:
            raise Jbig2Error("huffman prefix length beyond 32")
        count = [0] * (maxlen + 1)
        for ln in self.lines:
            count[ln[0]] += 1
        self.by_code: dict[tuple[int, int], tuple[int, int, int, str]] = {}
        self.code_of: dict[int, tuple[int, int]] = {}  # line idx -> (len, code)
        firstcode = 0
        for ln_len in range(1, maxlen + 1):
            firstcode = (firstcode + count[ln_len - 1]) << 1
            c = firstcode
            for i, ln in enumerate(self.lines):
                if ln[0] == ln_len:
                    if c >= (1 << ln_len):
                        raise Jbig2Error("over-subscribed huffman table")
                    self.by_code[(ln_len, c)] = ln
                    self.code_of[i] = (ln_len, c)
                    c += 1
        self.maxlen = maxlen

    def decode(self, br: _HuffBitReader) -> int | None:
        code = 0
        for ln_len in range(1, self.maxlen + 1):
            code = (code << 1) | br.bit()
            ln = self.by_code.get((ln_len, code))
            if ln is not None:
                preflen, rangelen, rangelow, kind = ln
                if kind == "o":
                    return None
                if kind == "l":
                    return rangelow - br.bits(32)
                if kind == "u":
                    return rangelow + br.bits(32)
                return rangelow + br.bits(rangelen)
        raise Jbig2Error("invalid huffman code")

    def _line_for(self, value: int | None) -> int:
        if value is None:
            for i, ln in enumerate(self.lines):
                if ln[3] == "o":
                    return i
            raise Jbig2Error("table has no OOB line")
        for i, ln in enumerate(self.lines):
            if ln[3] == "n" and ln[2] <= value < ln[2] + (1 << ln[1]):
                return i
        for i, ln in enumerate(self.lines):
            if (ln[3] == "l" and value <= ln[2]) or (ln[3] == "u" and value >= ln[2]):
                return i
        raise Jbig2Error(f"value {value} not codable by this table")

    def encode(self, bw: _HuffBitWriter, value: int | None) -> None:
        i = self._line_for(value)
        preflen, rangelen, rangelow, kind = self.lines[i]
        ln_len, code = self.code_of[i]
        bw.write(ln_len, code)
        if kind == "o":
            return
        if kind == "l":
            off = rangelow - value
        elif kind == "u":
            off = value - rangelow
        else:
            bw.write(rangelen, value - rangelow)
            return
        if off >= 1 << 32:
            raise Jbig2Error(f"value {value} beyond the 32-bit tail range")
        bw.write(32, off)


# standard tables (T.88 Annex B). B.1-B.5: the symbol-dictionary family
# (DH/DW/BMSIZE/EX). B.6: SBHUFFFS; B.8-B.9: SBHUFFDS (OOB-terminated);
# B.11-B.13: SBHUFFDT; B.14: RDW/RDH (bounded -2..2, no 32-bit tails);
# B.15: RDX/RDY — B.6/B.8/B.11/B.15 are also the tables 6.5.8.2.1 hardcodes
# for huffman refinement/aggregate dictionaries. Line order follows the
# printed spec tables: normal lines by ascending RANGELOW, then the lower
# 32-bit line, then the upper, then OOB — order matters, it IS the
# canonical code-assignment order of B.3. Every transcription is doubly
# checksummed below: exact Kraft completeness (sum 2^-PREFLEN == 1.0) and
# gap-free range tiling. B.7 and B.10 are deliberately absent — our
# reconstructions of those two fail the Kraft checksum, so shipping them
# would be guessing (standard_table refuses; custom-table streams cover
# their selector slots).
_STD_TABLE_LINES = {
    1: [(1, 4, 0, "n"), (2, 8, 16, "n"), (3, 16, 272, "n"),
        (3, 32, 65808, "u")],
    2: [(1, 0, 0, "n"), (2, 0, 1, "n"), (3, 0, 2, "n"), (4, 3, 3, "n"),
        (5, 6, 11, "n"), (6, 32, 75, "u"), (6, 0, 0, "o")],
    3: [(8, 8, -256, "n"), (1, 0, 0, "n"), (2, 0, 1, "n"), (3, 0, 2, "n"),
        (4, 3, 3, "n"), (5, 6, 11, "n"), (8, 32, -257, "l"),
        (7, 32, 75, "u"), (6, 0, 0, "o")],
    4: [(1, 0, 1, "n"), (2, 0, 2, "n"), (3, 0, 3, "n"), (4, 3, 4, "n"),
        (5, 6, 12, "n"), (5, 32, 76, "u")],
    5: [(7, 8, -255, "n"), (1, 0, 1, "n"), (2, 0, 2, "n"), (3, 0, 3, "n"),
        (4, 3, 4, "n"), (5, 6, 12, "n"), (7, 32, -256, "l"),
        (6, 32, 76, "u")],
    6: [(5, 10, -2048, "n"), (4, 9, -1024, "n"), (4, 8, -512, "n"),
        (4, 7, -256, "n"), (5, 6, -128, "n"), (5, 5, -64, "n"),
        (4, 5, -32, "n"), (2, 7, 0, "n"), (3, 7, 128, "n"),
        (3, 8, 256, "n"), (4, 9, 512, "n"), (4, 10, 1024, "n"),
        (6, 32, -2049, "l"), (6, 32, 2048, "u")],
    8: [(8, 3, -15, "n"), (9, 1, -7, "n"), (8, 1, -5, "n"),
        (9, 0, -3, "n"), (7, 0, -2, "n"), (4, 0, -1, "n"),
        (2, 1, 0, "n"), (5, 0, 2, "n"), (6, 0, 3, "n"),
        (3, 4, 4, "n"), (6, 1, 20, "n"), (4, 4, 22, "n"),
        (4, 5, 38, "n"), (5, 6, 70, "n"), (5, 7, 134, "n"),
        (6, 7, 262, "n"), (7, 8, 390, "n"), (6, 10, 646, "n"),
        (9, 32, -16, "l"), (9, 32, 1670, "u"), (2, 0, 0, "o")],
    9: [(8, 4, -31, "n"), (9, 2, -15, "n"), (8, 2, -11, "n"),
        (9, 1, -7, "n"), (7, 1, -5, "n"), (4, 1, -3, "n"),
        (3, 1, -1, "n"), (3, 1, 1, "n"), (5, 1, 3, "n"),
        (6, 1, 5, "n"), (3, 5, 7, "n"), (6, 2, 39, "n"),
        (4, 5, 43, "n"), (4, 6, 75, "n"), (5, 7, 139, "n"),
        (5, 8, 267, "n"), (6, 8, 523, "n"), (7, 9, 779, "n"),
        (6, 11, 1291, "n"), (9, 32, -32, "l"), (9, 32, 3339, "u"),
        (2, 0, 0, "o")],
    11: [(1, 0, 1, "n"), (2, 1, 2, "n"), (4, 0, 4, "n"), (4, 1, 5, "n"),
         (5, 1, 7, "n"), (5, 2, 9, "n"), (6, 2, 13, "n"), (7, 2, 17, "n"),
         (7, 3, 21, "n"), (7, 4, 29, "n"), (7, 5, 45, "n"),
         (7, 6, 77, "n"), (7, 32, 141, "u")],
    12: [(1, 0, 1, "n"), (2, 0, 2, "n"), (3, 1, 3, "n"), (5, 0, 5, "n"),
         (5, 1, 6, "n"), (6, 1, 8, "n"), (7, 0, 10, "n"), (7, 1, 11, "n"),
         (7, 2, 13, "n"), (7, 3, 17, "n"), (7, 4, 25, "n"),
         (8, 5, 41, "n"), (8, 32, 73, "u")],
    13: [(1, 0, 1, "n"), (3, 0, 2, "n"), (4, 0, 3, "n"), (5, 0, 4, "n"),
         (4, 1, 5, "n"), (3, 3, 7, "n"), (6, 1, 15, "n"), (6, 2, 17, "n"),
         (6, 3, 21, "n"), (6, 4, 29, "n"), (6, 5, 45, "n"),
         (7, 6, 77, "n"), (7, 32, 141, "u")],
    14: [(3, 0, -2, "n"), (3, 0, -1, "n"), (1, 0, 0, "n"),
         (3, 0, 1, "n"), (3, 0, 2, "n")],
    15: [(7, 4, -24, "n"), (6, 2, -8, "n"), (5, 1, -4, "n"),
         (4, 0, -2, "n"), (3, 0, -1, "n"), (1, 0, 0, "n"),
         (3, 0, 1, "n"), (4, 0, 2, "n"), (5, 1, 3, "n"),
         (6, 2, 5, "n"), (7, 4, 9, "n"), (7, 32, -25, "l"),
         (7, 32, 25, "u")],
}
for _n, _lines in _STD_TABLE_LINES.items():
    assert sum(2.0 ** -ln[0] for ln in _lines) == 1.0, f"table B.{_n} not complete"
    # range tiling: normal lines cover one contiguous span, the lower line
    # (if any) starts exactly one below it, the upper exactly at its end
    _norm = [ln for ln in _lines if ln[3] == "n"]
    _lo = _norm[0][2]
    for _pl, _rl, _rlow, _k in _norm:
        assert _rlow == _lo, f"table B.{_n} has a range gap at {_rlow}"
        _lo = _rlow + (1 << _rl)
    for _pl, _rl, _rlow, _k in _lines:
        if _k == "l":
            assert _rlow == _norm[0][2] - 1, f"table B.{_n} lower line misplaced"
        if _k == "u":
            assert _rlow == _lo, f"table B.{_n} upper line misplaced"


def standard_table(n: int) -> HuffTable:
    if n not in _STD_TABLE_LINES:
        raise Jbig2Error(
            f"standard huffman table B.{n} unsupported (B.7 and B.10 are "
            "untranscribed; use custom table segments)"
        )
    return HuffTable(_STD_TABLE_LINES[n])


_MAX_TABLE_LINES = 4096


def parse_table_segment(body: bytes) -> HuffTable:
    """Custom Huffman table segment (type 53, spec B.2): fully
    self-describing — flags carry the prefix/range field widths, then
    bit-packed (PREFLEN, RANGELEN) pairs tile [HTLOW, HTHIGH), followed by
    lower/upper/optional-OOB prefix lengths."""
    if len(body) < 9:
        raise Jbig2Error("truncated table segment")
    fl = body[0]
    htoob = fl & 1
    htps = ((fl >> 1) & 7) + 1
    htrs = ((fl >> 4) & 7) + 1
    htlow = int.from_bytes(body[1:5], "big", signed=True)
    hthigh = int.from_bytes(body[5:9], "big", signed=True)
    if hthigh <= htlow:
        raise Jbig2Error("table segment with empty range")
    br = _HuffBitReader(body, 9)
    lines: list[tuple[int, int, int, str]] = []
    cur = htlow
    while cur < hthigh:
        if len(lines) > _MAX_TABLE_LINES:
            raise Jbig2Error("table segment exceeds line budget")
        pl = br.bits(htps)
        rl = br.bits(htrs)
        if rl > 32:
            raise Jbig2Error("table range length beyond 32")
        lines.append((pl, rl, cur, "n"))
        cur += 1 << rl
    lines.append((br.bits(htps), 32, htlow - 1, "l"))
    lines.append((br.bits(htps), 32, hthigh, "u"))
    if htoob:
        lines.append((br.bits(htps), 0, 0, "o"))
    return HuffTable(lines)


def build_table_segment(low: int, high: int, oob: bool = False) -> bytes:
    """Fixture-encoder custom table: ONE normal line spanning [low, low+2^r)
    with r sized to cover ``high``, plus lower/upper (and OOB) lines with
    Kraft-complete prefix lengths. Round-trips through parse_table_segment."""
    span = max(high - low, 1)
    r = max((span - 1).bit_length(), 0)
    if r > 32:
        raise Jbig2Error("custom table range too wide")
    hthigh = low + (1 << r)
    bw = _HuffBitWriter()
    htps, htrs = 4, 6
    if oob:
        # lengths: normal 1, OOB 2, lower 3, upper 3 -> complete
        plans = [(1, r)]
        tail = (3, 3, 2)
    else:
        # lengths: normal 1, lower 2, upper 2 -> complete
        plans = [(1, r)]
        tail = (2, 2, None)
    for pl, rl in plans:
        bw.write(htps, pl)
        bw.write(htrs, rl)
    bw.write(htps, tail[0])  # lower
    bw.write(htps, tail[1])  # upper
    if oob:
        bw.write(htps, tail[2])
    fl = (1 if oob else 0) | ((htps - 1) << 1) | ((htrs - 1) << 4)
    return (
        bytes([fl])
        + low.to_bytes(4, "big", signed=True)
        + hthigh.to_bytes(4, "big", signed=True)
        + bw.finish()
    )


# -- symbol dictionary (T.88 6.5, segment type 0) ----------------------------

_MAX_SYMBOLS = 1 << 16
_MAX_SYM_DIM = 1 << 12


def _read_at(body: bytes, pos: int, template: int) -> int:
    """Validate the AT bytes at ``pos`` against the nominal geometry (same
    contract as generic regions); returns the new offset."""
    n_at = _N_AT[template]
    if len(body) < pos + 2 * n_at:
        raise Jbig2Error("truncated AT pixel coordinates")
    got = tuple(
        (int.from_bytes(body[pos + 2 * i : pos + 2 * i + 1], "big", signed=True),
         int.from_bytes(body[pos + 2 * i + 1 : pos + 2 * i + 2], "big", signed=True))
        for i in range(n_at)
    )
    if got != _NOMINAL_AT[template]:
        raise Jbig2Error(
            f"non-nominal AT pixels {got} for template {template} unsupported"
        )
    return pos + 2 * n_at


def _huffman_refagg_symbol(
    br: _HuffBitReader, body: bytes, pool: list, sym_width: int,
    hc_height: int, code_len: int, t_agg: HuffTable,
    r_template: int, rat, budget: list,
) -> list[bytes]:
    """One SDHUFF=1/SDREFAGG=1 symbol (6.5.8.2). REFAGGNINST == 1: the
    symbol refines an earlier one — raw SBSYMCODELEN-bit id, RDX/RDY via
    Table B.15, BMSIZE via Table B.1, then the refinement as its own
    byte-aligned MQ codeword of exactly BMSIZE bytes. REFAGGNINST > 1:
    the symbol is a nested huffman TEXT REGION of its own dimensions over
    the Table 17 hardcoded tables — FS=B.6, DS=B.8, DT=B.11,
    RDW/RDH/RDX/RDY=B.15, RSIZE=B.1 — with SBSTRIPS=1, TOPLEFT corner, OR
    composition, REFINE=1 (RI one raw bit per instance) and raw
    SBSYMCODELEN-bit symbol ids."""
    n_inst = t_agg.decode(br)
    if n_inst is None or n_inst < 1:
        raise Jbig2Error(f"bad aggregate instance count {n_inst}")
    t_b15 = standard_table(15)
    t_b1 = standard_table(1)

    def own_mq_refinement(ref, w, h, dx, dy):
        bmsize = t_b1.decode(br)
        if bmsize is None or bmsize <= 0:
            # BMSIZE=0 (6.4.11 not-byte-counted) is a documented refusal —
            # see the module scope-honesty note
            raise Jbig2Error("bad refinement BMSIZE in huffman dictionary")
        br.align()
        start = br.pos
        if start + bmsize > len(body):
            raise Jbig2Error("huffman refinement overruns the dictionary")
        out = refinement_region_decode(
            MQDecoder(body[start : start + bmsize]),
            _ref_ctx_bank(r_template), w, h, ref,
            dx=dx, dy=dy, template=r_template, at=rat,
        )
        br.pos = start + bmsize
        br.nbits = 0
        return out

    if n_inst == 1:
        rid = br.bits(code_len)
        if not 0 <= rid < len(pool):
            raise Jbig2Error(f"refinement reference id {rid} out of range")
        rdx = t_b15.decode(br)
        rdy = t_b15.decode(br)
        if rdx is None or rdy is None:
            raise Jbig2Error("OOB refinement offset in huffman dictionary")
        return own_mq_refinement(pool[rid], sym_width, hc_height, rdx, rdy)

    if n_inst > _MAX_SYMBOLS:
        raise Jbig2Error("aggregate instance count exceeds budget")
    t_fs = standard_table(6)
    t_ds = standard_table(8)
    t_dt = standard_table(11)

    def get_sid():
        sid = br.bits(code_len)
        if not 0 <= sid < len(pool):
            raise Jbig2Error(f"aggregate symbol id {sid} out of range")
        return sid

    def decode_refinement(sym):
        rdw = t_b15.decode(br)
        rdh = t_b15.decode(br)
        rdx = t_b15.decode(br)
        rdy = t_b15.decode(br)
        if None in (rdw, rdh, rdx, rdy):
            raise Jbig2Error("OOB refinement delta in huffman aggregate")
        nw = (len(sym[0]) if sym else 0) + rdw
        nh = len(sym) + rdh
        if nw <= 0 or nh <= 0 or nw > _MAX_SYM_DIM or nh > _MAX_SYM_DIM:
            raise Jbig2Error("refined huffman aggregate instance exceeds budget")
        return own_mq_refinement(sym, nw, nh, (rdw >> 1) + rdx, (rdh >> 1) + rdy)

    return _text_region_place(
        sym_width, hc_height, n_inst, pool,
        1, 1, 0, 0, 0, 0, 1,  # strips, TOPLEFT, not transposed, OR, 0, 0, REFINE
        lambda: t_dt.decode(br), lambda: t_fs.decode(br),
        lambda: t_ds.decode(br), lambda: 0, get_sid,
        lambda: br.bit(), decode_refinement,
        budget=budget, expect_strip_oob=True,
    )


def _decode_symbol_dict_huffman(
    body: bytes, flags: int, input_syms: list, tables: list
) -> list:
    """SDHUFF=1 profile (6.5.9): the height-class walk of the arithmetic
    path, but DH/DW/BMSIZE through Annex B Huffman tables and each height
    class's symbols carried as ONE collective bitmap — uncompressed rows
    (BMSIZE=0) or an MMR (T.6) stream — split by the decoded widths.
    SDREFAGG=1 switches the per-symbol payload to 6.5.8.2: REFAGGNINST
    through the SDHUFFAGGINST table (B.1 default); one instance → a
    refinement of an earlier symbol (raw SBSYMCODELEN-bit id, RDX/RDY via
    Table B.15, a B.1-coded BMSIZE, then the refinement as its OWN
    byte-aligned MQ codeword); several → a nested huffman text region
    over the Table 17 hardcoded tables (B.6/B.8/B.11, refinement via
    B.15, RSIZE via B.1)."""
    refagg = bool(flags & 0x0002)
    sel_dh = (flags >> 2) & 3
    sel_dw = (flags >> 4) & 3
    sel_bm = (flags >> 6) & 1
    sel_agg = (flags >> 7) & 1
    r_template = (flags >> 12) & 1
    it = iter(tables)

    def pick(sel: int, std_a: int, std_b: int | None, what: str) -> HuffTable:
        if sel == 3 or (std_b is None and sel == 1):
            try:
                return next(it)
            except StopIteration:
                raise Jbig2Error(f"missing custom table for {what}") from None
        if sel == 0:
            return standard_table(std_a)
        if sel == 1 and std_b is not None:
            return standard_table(std_b)
        raise Jbig2Error(f"reserved table selector for {what}")

    t_dh = pick(sel_dh, 4, 5, "SDHUFFDH")
    t_dw = pick(sel_dw, 2, 3, "SDHUFFDW")
    t_bm = pick(sel_bm, 1, None, "SDHUFFBMSIZE")
    t_agg = pick(sel_agg, 1, None, "SDHUFFAGGINST") if refagg else None
    t_ex = standard_table(1)  # 6.5.10: EXRUNLENGTH uses Table B.1 when SDHUFF
    pos = 2
    rat = None
    if refagg and r_template == 0:
        rat, pos = _read_rat(body, pos)  # SDRAT (7.4.3.1.3)
    if len(body) < pos + 8:
        raise Jbig2Error("truncated symbol dictionary header")
    num_ex = int.from_bytes(body[pos : pos + 4], "big")
    num_new = int.from_bytes(body[pos + 4 : pos + 8], "big")
    pos += 8
    if num_new > _MAX_SYMBOLS or num_ex > _MAX_SYMBOLS + len(input_syms):
        raise Jbig2Error("symbol dictionary exceeds symbol budget")
    # 6.5.8.2.3 with SDHUFF=1: symbol ids inside refinements/aggregates are
    # plain SBSYMCODELEN-bit fields over input + new symbols (min 1 bit)
    code_len = max(1, max(len(input_syms) + num_new - 1, 0).bit_length())
    pool: list = list(input_syms)
    if refagg:
        agg_budget = [4 * _MAX_PIXELS]  # shared across every aggregate

    br = _HuffBitReader(body, pos)
    new_syms: list = []
    hc_height = 0
    guard = 0
    while len(new_syms) < num_new:
        guard += 1
        if guard > 2 * num_new + 16:
            raise Jbig2Error("symbol dictionary fails to make progress")
        dh = t_dh.decode(br)
        if dh is None:
            raise Jbig2Error("OOB delta-height in symbol dictionary")
        hc_height += dh
        if not 0 < hc_height <= _MAX_SYM_DIM:
            raise Jbig2Error(f"symbol height {hc_height} out of range")
        widths: list[int] = []
        sym_width = 0
        tot_width = 0
        while True:
            dw = t_dw.decode(br)
            if dw is None:
                break  # end of height class
            sym_width += dw
            if not 0 < sym_width <= _MAX_SYM_DIM:
                raise Jbig2Error(f"symbol width {sym_width} out of range")
            if len(new_syms) + len(widths) >= num_new:
                raise Jbig2Error("more symbols than SDNUMNEWSYMS declares")
            if sym_width * hc_height > _MAX_PIXELS:
                raise Jbig2Error("symbol exceeds pixel budget")
            if refagg:
                # per-symbol payload, decoded immediately (no collective
                # bitmap in refinement/aggregate dictionaries)
                sym = _huffman_refagg_symbol(
                    br, body, pool, sym_width, hc_height, code_len,
                    t_agg, r_template, rat, agg_budget,
                )
                new_syms.append(sym)
                pool.append(sym)
                continue
            widths.append(sym_width)
            tot_width += sym_width
        if refagg or not widths:
            continue
        if tot_width * hc_height > _MAX_PIXELS:
            raise Jbig2Error("collective bitmap exceeds pixel budget")
        bmsize = t_bm.decode(br)
        if bmsize is None or bmsize < 0:
            raise Jbig2Error("bad collective bitmap size")
        br.align()
        if bmsize == 0:
            # uncompressed: rows padded to byte boundaries (6.5.9 b)
            stride = (tot_width + 7) // 8
            need = stride * hc_height
            if br.pos + need > len(body):
                raise Jbig2Error("truncated collective bitmap")
            coll = []
            for y in range(hc_height):
                off = br.pos + y * stride
                coll.append(bytearray(
                    (body[off + (x >> 3)] >> (7 - (x & 7))) & 1
                    for x in range(tot_width)
                ))
            br.pos += need
        else:
            from frappe_data_pipelines_spark.operators.faxmini import (
                FaxError,
                g4_decode,
            )

            if br.pos + bmsize > len(body):
                raise Jbig2Error("truncated MMR collective bitmap")
            try:
                coll = g4_decode(
                    body[br.pos : br.pos + bmsize], tot_width, hc_height
                )
            except (FaxError, ValueError, IndexError) as e:
                raise Jbig2Error(f"MMR collective bitmap: {e}") from e
            if len(coll) < hc_height:
                coll += [bytearray(tot_width)] * (hc_height - len(coll))
            br.pos += bmsize
        x0 = 0
        for wdt in widths:
            new_syms.append([bytes(row[x0 : x0 + wdt]) for row in coll])
            x0 += wdt

    all_syms = list(input_syms) + new_syms
    exported: list = []
    i, exflag, ex_guard = 0, 0, 0
    while i < len(all_syms):
        ex_guard += 1
        if ex_guard > 2 * len(all_syms) + 8:
            raise Jbig2Error("export runs fail to make progress")
        run = t_ex.decode(br)
        if run is None or run < 0 or i + run > len(all_syms):
            raise Jbig2Error("bad export run in symbol dictionary")
        if exflag:
            exported.extend(all_syms[i : i + run])
        i += run
        exflag ^= 1
    if len(exported) != num_ex:
        raise Jbig2Error(
            f"symbol dictionary exported {len(exported)}, declared {num_ex}"
        )
    return exported


def decode_symbol_dict(
    body: bytes, input_syms: list, tables: list | None = None
) -> list:
    """Symbol-dictionary segment body → exported symbol bitmaps (each a
    list of 0/1-byte rows). Supported profiles: SDHUFF=0 (arithmetic) with
    SDREFAGG=0 (direct coding — what jbig2enc emits for lossless symbol
    mode) or SDREFAGG=1 single-instance refinement (each symbol refined
    from an earlier one via GRTEMPLATE 1); and SDHUFF=1 (huffman, 6.5.9:
    per-height-class DH/DW deltas through Annex B tables, collective
    bitmaps either uncompressed or MMR via the T.6 kernel, exports via
    Table B.1 run lengths). ``tables`` are custom HuffTables from referred
    type-53 segments, consumed in selector order (DH, DW, BMSIZE).
    Arithmetic path: height classes via IADH/IADW (6.5.5), per-symbol
    bitmaps through the SHARED MQ decoder + GB/GR contexts (6.5.8),
    exports via IAEX run lengths (6.5.10)."""
    if len(body) < 2:
        raise Jbig2Error("truncated symbol dictionary")
    flags = int.from_bytes(body[0:2], "big")
    if flags & 0x0001:
        return _decode_symbol_dict_huffman(body, flags, input_syms, tables or [])
    refagg = bool(flags & 0x0002)
    template = (flags >> 10) & 0x03
    r_template = (flags >> 12) & 0x01
    pos = _read_at(body, 2, template)
    rat = None
    if refagg and r_template == 0:
        rat, pos = _read_rat(body, pos)  # SDRAT (7.4.3.1.3)
    if len(body) < pos + 8:
        raise Jbig2Error("truncated symbol dictionary header")
    num_ex = int.from_bytes(body[pos : pos + 4], "big")
    num_new = int.from_bytes(body[pos + 4 : pos + 8], "big")
    pos += 8
    if num_new > _MAX_SYMBOLS or num_ex > _MAX_SYMBOLS + len(input_syms):
        raise Jbig2Error("symbol dictionary exceeds symbol budget")
    # 6.5.8.2.3: refinement-aggregate symbol ids index input + new symbols
    ref_code_len = max(len(input_syms) + num_new - 1, 0).bit_length()

    mq = MQDecoder(body[pos:])
    cx_gb = [[0, 0] for _ in range(1 << len(_TEMPLATES[template]))]
    iadh, iadw, iaex = _int_ctx(), _int_ctx(), _int_ctx()
    if refagg:
        # refinement-only banks; the common SDREFAGG=0 path must not pay
        # the iaid allocation (2^(code_len+1) entries — a stream merely
        # DECLARING 64k symbols would otherwise churn ~25 MB up front)
        iaai, iardx, iardy = _int_ctx(), _int_ctx(), _int_ctx()
        iaid = _iaid_ctx(ref_code_len)
        gr_cxs = _ref_ctx_bank(r_template)
        # 6.5.8.2: multi-instance aggregates run a text region INSIDE the
        # dictionary; its IADT/IAFS/IADS/IAIT/IARI/IARDW/IARDH contexts
        # persist across every aggregate in the dictionary (Table 17)
        iadt, iafs, iads, iait, iari = (_int_ctx() for _ in range(5))
        iardw, iardh = _int_ctx(), _int_ctx()
        # ONE paste-work budget across every aggregate in this dictionary
        # — per-call budgets would multiply by the declared symbol count
        agg_budget = [4 * _MAX_PIXELS]
    # one growing pool: input symbols + decoded-so-far (all_syms at the
    # end); avoids the O(n^2) per-symbol list rebuild for REFAGG streams
    pool: list = list(input_syms)
    new_syms: list = []
    hc_height = 0
    guard = 0
    while len(new_syms) < num_new:
        # progress guard: an exhausted MQ stream decodes free bits forever,
        # so empty height classes (dh then immediate OOB) must be bounded —
        # a corrupt stream raises instead of pinning an executor core
        guard += 1
        if guard > 2 * num_new + 16:
            raise Jbig2Error("symbol dictionary fails to make progress")
        dh = arith_int_decode(mq, iadh)
        if dh is None:
            raise Jbig2Error("OOB delta-height in symbol dictionary")
        hc_height += dh
        if not 0 < hc_height <= _MAX_SYM_DIM:
            raise Jbig2Error(f"symbol height {hc_height} out of range")
        sym_width = 0
        while True:
            dw = arith_int_decode(mq, iadw)
            if dw is None:
                break  # end of height class
            sym_width += dw
            if not 0 < sym_width <= _MAX_SYM_DIM:
                raise Jbig2Error(f"symbol width {sym_width} out of range")
            if len(new_syms) >= num_new:
                raise Jbig2Error("more symbols than SDNUMNEWSYMS declares")
            if sym_width * hc_height > _MAX_PIXELS:
                raise Jbig2Error("symbol exceeds pixel budget")
            if refagg:
                # 6.5.8.2: REFAGGNINST == 1 → the symbol is a refinement
                # of an earlier one; REFAGGNINST > 1 → the symbol is a
                # nested TEXT REGION of its own dimensions composed from
                # already-decoded symbols (Table 17 parameters: one strip,
                # TOPLEFT corner, OR composition, REFINE=1, all contexts
                # shared with the dictionary's arithmetic decoder)
                n_inst = arith_int_decode(mq, iaai)
                if n_inst is None or n_inst < 1:
                    raise Jbig2Error(f"bad aggregate instance count {n_inst}")
                if n_inst > 1:
                    if n_inst > _MAX_SYMBOLS:
                        raise Jbig2Error("aggregate instance count exceeds budget")
                    sym = _decode_aggregate_symbol(
                        mq, pool, sym_width, hc_height, n_inst, ref_code_len,
                        r_template, rat, gr_cxs,
                        iadt, iafs, iads, iait, iari,
                        iardw, iardh, iardx, iardy, iaid,
                        budget=agg_budget,
                    )
                    new_syms.append(sym)
                    pool.append(sym)
                    continue
                rid = arith_iaid_decode(mq, iaid, ref_code_len)
                if not 0 <= rid < len(pool):
                    raise Jbig2Error(f"refinement reference id {rid} out of range")
                rdx = arith_int_decode(mq, iardx)
                rdy = arith_int_decode(mq, iardy)
                if rdx is None or rdy is None:
                    raise Jbig2Error("OOB refinement offset")
                sym = refinement_region_decode(
                    mq, gr_cxs, sym_width, hc_height, pool[rid],
                    dx=rdx, dy=rdy, template=r_template, at=rat,
                )
            else:
                sym = _generic_decode_into(mq, cx_gb, sym_width, hc_height,
                                           tpgdon=False, template=template)
            new_syms.append(sym)
            pool.append(sym)
    all_syms = pool  # input symbols + all decoded symbols, in id order
    exported: list = []
    i, exflag, ex_guard = 0, 0, 0
    while i < len(all_syms):
        # run=0 toggles exflag without advancing i — legal once per flip,
        # but a corrupt stream repeating it would spin forever
        ex_guard += 1
        if ex_guard > 2 * len(all_syms) + 8:
            raise Jbig2Error("export runs fail to make progress")
        run = arith_int_decode(mq, iaex)
        if run is None or run < 0 or i + run > len(all_syms):
            raise Jbig2Error("bad export run in symbol dictionary")
        if exflag:
            exported.extend(all_syms[i : i + run])
        i += run
        exflag ^= 1
    if len(exported) != num_ex:
        raise Jbig2Error(
            f"symbol dictionary exported {len(exported)}, declared {num_ex}"
        )
    return exported


def _decode_aggregate_symbol(
    mq, pool, sym_width, hc_height, n_inst, ref_code_len,
    r_template, rat, gr_cxs,
    iadt, iafs, iads, iait, iari, iardw, iardh, iardx, iardy, iaid,
    budget: list | None = None,
) -> list[bytes]:
    """Multi-instance aggregate symbol (6.5.8.2.2): the symbol's bitmap is
    a nested text region of its own dimensions, composed of REFAGGNINST
    placements of already-decoded symbols (optionally refined), driven by
    the dictionary's OWN arithmetic decoder and persistent context banks
    (Table 17: SBSTRIPS=1, TOPLEFT corner, OR composition, REFINE=1,
    SBDSOFFSET=0, SBSYMCODELEN = the dictionary's ref code length)."""

    def get_dt():
        return arith_int_decode(mq, iadt)

    def get_fs():
        return arith_int_decode(mq, iafs)

    def get_ds():
        return arith_int_decode(mq, iads)

    def get_curt():
        return 0  # SBSTRIPS == 1: CURT is 0 without a decode (6.4.5)

    def get_sid():
        return arith_iaid_decode(mq, iaid, ref_code_len)

    def get_ri():
        return arith_int_decode(mq, iari)

    def decode_refinement(sym):
        rdw = arith_int_decode(mq, iardw)
        rdh = arith_int_decode(mq, iardh)
        rdx = arith_int_decode(mq, iardx)
        rdy = arith_int_decode(mq, iardy)
        if None in (rdw, rdh, rdx, rdy):
            raise Jbig2Error("OOB refinement delta in aggregate")
        nw = (len(sym[0]) if sym else 0) + rdw
        nh = len(sym) + rdh
        if nw <= 0 or nh <= 0 or nw > _MAX_SYM_DIM or nh > _MAX_SYM_DIM:
            raise Jbig2Error("refined aggregate instance exceeds budget")
        return refinement_region_decode(
            mq, gr_cxs, nw, nh, sym,
            dx=(rdw >> 1) + rdx, dy=(rdh >> 1) + rdy,
            template=r_template, at=rat,
        )

    return _text_region_place(
        sym_width, hc_height, n_inst, pool,
        1, 1, 0, 0, 0, 0, 1,  # strips, TOPLEFT, not transposed, OR, 0, 0, REFINE
        get_dt, get_fs, get_ds, get_curt, get_sid, get_ri, decode_refinement,
        budget=budget, expect_strip_oob=True,
    )


# -- text region (T.88 6.4, segment types 4/6/7) -----------------------------


def decode_text_region(body: bytes, syms: list, tables: list | None = None):
    """Text-region segment body + referred symbols → (rw, rh, rx, ry,
    comb_op, rows). Supported profiles: SBHUFF=0 (arithmetic; refined
    instances (RI=1) via GRTEMPLATE-1 refinement) and SBHUFF=1 (huffman:
    FS/DS/DT through Annex B tables — custom type-53 segments or the
    standard selectors (B.6, B.8-B.9, B.11-B.13; the unreconstructable
    B.7/B.10 refuse) — with the run-coded symbol ID code lengths of
    7.4.4.1.7; refinement via standard B.14/B.15 or CUSTOM RDW/RDH/RDX/
    RDY tables and B.1-or-custom RSIZE, each instance's bitmap its own
    byte-aligned MQ codeword per 6.4.11). TRANSPOSED both orientations;
    REFCORNER all four; SBSTRIPS any power of two; SBDSOFFSET honored."""
    if len(body) < 19:
        raise Jbig2Error("truncated text region")
    rw = int.from_bytes(body[0:4], "big")
    rh = int.from_bytes(body[4:8], "big")
    rx = int.from_bytes(body[8:12], "big")
    ry = int.from_bytes(body[12:16], "big")
    ext_comb = body[16] & 0x07
    flags = int.from_bytes(body[17:19], "big")
    sbhuff = flags & 0x0001
    refine = (flags >> 1) & 1
    strips = 1 << ((flags >> 2) & 3)
    refcorner = (flags >> 4) & 3
    transposed = (flags >> 6) & 1
    comb_op = (flags >> 7) & 3
    def_pixel = (flags >> 9) & 1
    ds_offset = (flags >> 10) & 0x1F
    if ds_offset > 15:
        ds_offset -= 32
    r_template = (flags >> 15) & 1
    pos = 19
    if sbhuff:
        if len(body) < pos + 2:
            raise Jbig2Error("truncated text region huffman flags")
        hflags = int.from_bytes(body[pos : pos + 2], "big")
        pos += 2
    rat = None
    if refine and r_template == 0:
        rat, pos = _read_rat(body, pos)  # SBRAT (7.4.4.1.2)
    if len(body) < pos + 4:
        raise Jbig2Error("truncated text region header")
    num_instances = int.from_bytes(body[pos : pos + 4], "big")
    pos += 4
    if not syms:
        raise Jbig2Error("text region refers to no symbols")
    # same allocation guard as generic regions: the rx/ry offsets feed the
    # page allocation when no page-info segment preceded this region, so a
    # corrupt 4-byte offset must not become a multi-GB bytearray
    if (rw * rh > _MAX_PIXELS or (rx + rw) * (ry + rh) > _MAX_PIXELS
            or num_instances > _MAX_SYMBOLS):
        raise Jbig2Error("text region exceeds budget")
    code_len = max(len(syms) - 1, 0).bit_length()

    if sbhuff:
        it = iter(tables or [])

        def pick(sel: int, stds: tuple[int, ...], what: str) -> HuffTable:
            if sel == 3:
                try:
                    return next(it)
                except StopIteration:
                    raise Jbig2Error(f"missing custom table for {what}") from None
            if sel < len(stds):
                return standard_table(stds[sel])
            raise Jbig2Error(f"reserved table selector for {what}")

        t_fs = pick(hflags & 3, (6, 7), "SBHUFFFS")
        t_ds = pick((hflags >> 2) & 3, (8, 9, 10), "SBHUFFDS")
        t_dt = pick((hflags >> 4) & 3, (11, 12, 13), "SBHUFFDT")
        if refine:
            # 7.4.4.1.2-1.6: RDW/RDH/RDX/RDY via standard B.14/B.15
            # (transcribed in round 9 — selectors 0/1 decode) or CUSTOM
            # tables, RSIZE via B.1 or custom. Consumption order
            # continues FS, DS, DT.
            t_rdw = pick((hflags >> 6) & 3, (14, 15), "SBHUFFRDW")
            t_rdh = pick((hflags >> 8) & 3, (14, 15), "SBHUFFRDH")
            t_rdx = pick((hflags >> 10) & 3, (14, 15), "SBHUFFRDX")
            t_rdy = pick((hflags >> 12) & 3, (14, 15), "SBHUFFRDY")
            t_rs = pick(3 if (hflags >> 14) & 1 else 0, (1,), "SBHUFFRSIZE")
        br = _HuffBitReader(body, pos)
        # 7.4.4.1.7: symbol ID code lengths — 35 run-codes (4-bit prefix
        # lengths), then the per-symbol lengths via the run-code table:
        # <32 literal, 32 repeat-prev 3+2bits, 33 zeros 3+3bits, 34 zeros
        # 11+7bits; byte-align afterwards
        runlines = [
            (ln, 0, r, "n")
            for r, ln in enumerate(br.bits(4) for _ in range(35))
            if ln > 0
        ]
        runtab = HuffTable(runlines)
        codelens: list[int] = []
        prev = 0
        while len(codelens) < len(syms):
            c = runtab.decode(br)
            if c is None or not 0 <= c <= 34:
                raise Jbig2Error("bad symbol ID run-code")
            if c < 32:
                codelens.append(c)
                prev = c
            elif c == 32:
                codelens.extend([prev] * (3 + br.bits(2)))
            elif c == 33:
                codelens.extend([0] * (3 + br.bits(3)))
            else:
                codelens.extend([0] * (11 + br.bits(7)))
        if len(codelens) != len(syms):
            raise Jbig2Error("symbol ID code lengths overrun the symbol count")
        symtab = HuffTable(
            [(ln, 0, i, "n") for i, ln in enumerate(codelens) if ln > 0]
        )
        br.align()
        curt_bits = (strips - 1).bit_length()

        def get_dt():
            return t_dt.decode(br)

        def get_fs():
            return t_fs.decode(br)

        def get_ds():
            return t_ds.decode(br)

        def get_curt():
            return br.bits(curt_bits) if strips > 1 else 0

        def get_sid():
            return symtab.decode(br)

        def get_ri():
            # 7.4.4.5: in huffman mode RI is a single raw bit
            return br.bit() if refine else 0

        def decode_refinement(sym):
            # 6.4.11 huffman mode: RDW/RDH/RDX/RDY huffman-coded, then
            # BMSIZE, byte-align, and the refinement itself is its OWN
            # MQ codeword of exactly BMSIZE bytes (statistics reset per
            # instance), byte-aligned again afterwards
            rdw = t_rdw.decode(br)
            rdh = t_rdh.decode(br)
            rdx = t_rdx.decode(br)
            rdy = t_rdy.decode(br)
            bmsize = t_rs.decode(br)
            if None in (rdw, rdh, rdx, rdy) or bmsize is None or bmsize <= 0:
                raise Jbig2Error("bad huffman refinement record")
            br.align()
            start = br.pos
            if start + bmsize > len(body):
                raise Jbig2Error("huffman refinement overruns the segment")
            nw = (len(sym[0]) if sym else 0) + rdw
            nh = len(sym) + rdh
            if nw <= 0 or nh <= 0 or nw > _MAX_SYM_DIM or nh > _MAX_SYM_DIM:
                raise Jbig2Error("refined instance exceeds budget")
            out = refinement_region_decode(
                MQDecoder(body[start : start + bmsize]),
                _ref_ctx_bank(r_template), nw, nh, sym,
                dx=(rdw >> 1) + rdx, dy=(rdh >> 1) + rdy,
                template=r_template, at=rat,
            )
            br.pos = start + bmsize
            br.nbits = 0
            return out
    else:
        mq = MQDecoder(body[pos:])
        iadt, iafs, iads, iait, iari = (_int_ctx() for _ in range(5))
        iardw, iardh, iardx, iardy = (_int_ctx() for _ in range(4))
        iaid = _iaid_ctx(code_len)
        # refinement contexts persist across instances
        gr_cxs = _ref_ctx_bank(r_template)

        def get_dt():
            return arith_int_decode(mq, iadt)

        def get_fs():
            return arith_int_decode(mq, iafs)

        def get_ds():
            return arith_int_decode(mq, iads)

        def get_curt():
            v = arith_int_decode(mq, iait) if strips > 1 else 0
            return v

        def get_sid():
            return arith_iaid_decode(mq, iaid, code_len)

        def get_ri():
            return arith_int_decode(mq, iari)

        def decode_refinement(sym):
            # 6.4.11: the instance bitmap is a refinement of the symbol —
            # size adjusted by RDW/RDH, reference placed at
            # (floor(RDW/2)+RDX, floor(RDH/2)+RDY)
            rdw = arith_int_decode(mq, iardw)
            rdh = arith_int_decode(mq, iardh)
            rdx = arith_int_decode(mq, iardx)
            rdy = arith_int_decode(mq, iardy)
            if None in (rdw, rdh, rdx, rdy):
                raise Jbig2Error("OOB refinement delta")
            nw = len(sym[0]) + rdw if sym else rdw
            nh = len(sym) + rdh
            # same per-dimension cap as dictionary symbols — the area check
            # alone admits 67M x 1 shapes that pin a core on pure-Python
            # refinement of free MQ bits
            if (nw <= 0 or nh <= 0 or nw > _MAX_SYM_DIM
                    or nh > _MAX_SYM_DIM):
                raise Jbig2Error("refined instance exceeds budget")
            return refinement_region_decode(
                mq, gr_cxs, nw, nh, sym,
                dx=(rdw >> 1) + rdx, dy=(rdh >> 1) + rdy,
                template=r_template, at=rat,
            )

    rows = _text_region_place(
        rw, rh, num_instances, syms, strips, refcorner, transposed,
        comb_op, def_pixel, ds_offset, refine,
        get_dt, get_fs, get_ds, get_curt, get_sid, get_ri, decode_refinement,
    )
    return rw, rh, rx, ry, ext_comb, rows


def _text_region_place(
    rw, rh, num_instances, syms, strips, refcorner, transposed,
    comb_op, def_pixel, ds_offset, refine,
    get_dt, get_fs, get_ds, get_curt, get_sid, get_ri, decode_refinement,
    budget: list | None = None,
    expect_strip_oob: bool = False,
) -> list[bytes]:
    """The text-region PLACEMENT loop (6.4.5), factored out of
    ``decode_text_region`` so multi-instance aggregate symbols (6.5.8.2)
    can run the same procedure inside a symbol dictionary with the
    dictionary's shared arithmetic decoder and context banks (Table 17).

    ``budget`` is a 1-element mutable paste-work allowance; callers that
    invoke this procedure REPEATEDLY from one stream (a REFAGG dictionary
    decoding many aggregate symbols) MUST pass one shared budget, or a
    crafted stream multiplies the per-call bound by the symbol count.

    ``expect_strip_oob``: 6.4.5 terminates EVERY strip — including the
    last — with an OOB from the DS decoder (pdf.js decodeTextRegion's
    do/while reads DS after each placement). A top-level region can skip
    the trailing OOB because nothing follows it in the segment, but a
    NESTED region inside a symbol dictionary shares the dictionary's bit
    stream/decoder: leaving the OOB unconsumed desyncs every later read.
    Nested callers set this to consume exactly one trailing DS code and
    require it to be OOB (a real value means the stream carries more
    instances than REFAGGNINST declared — raise, totality convention)."""
    rows = [bytearray([def_pixel]) * rw for _ in range(rh)]

    dt = get_dt()
    if dt is None:
        raise Jbig2Error("OOB initial STRIPT")
    stript = -dt * strips
    firsts = 0
    ninst = 0
    guard = 0
    # cumulative paste-work budget: each placement loops over the PLACED
    # symbol's full area even when clipped, so a crafted stream placing a
    # near-_MAX_PIXELS pool symbol thousands of times (num_instances is
    # only bounded by _MAX_SYMBOLS; multi-instance aggregates add the
    # same multiplier inside dictionaries — hence the SHARED budget) would
    # pin a core on pure Python — the convention is to raise instead
    if budget is None:
        budget = [4 * _MAX_PIXELS]
    while ninst < num_instances:
        guard += 1
        if guard > 2 * num_instances + 16:
            raise Jbig2Error("text region fails to make progress")
        dt = get_dt()
        if dt is None:
            raise Jbig2Error("OOB strip delta-T")
        stript += dt * strips
        dfs = get_fs()
        if dfs is None:
            raise Jbig2Error("OOB first-S")
        firsts += dfs
        curs = firsts
        first = True
        while ninst < num_instances:
            if first:
                first = False
            else:
                ids = get_ds()
                if ids is None:
                    break  # end of strip
                curs += ids + ds_offset
            curt = get_curt()
            if curt is None:
                raise Jbig2Error("OOB in-strip T")
            tt = stript + curt
            sid = get_sid()
            if sid is None or not 0 <= sid < len(syms):
                raise Jbig2Error(f"symbol id {sid} out of range")
            sym = syms[sid]
            if refine:
                ri = get_ri()
                if ri is None:
                    raise Jbig2Error("OOB refinement flag")  # totality: raise
                if ri:
                    sym = decode_refinement(sym)
            hs = len(sym)
            ws = len(sym[0]) if hs else 0
            budget[0] -= hs * ws
            if budget[0] < 0:
                raise Jbig2Error("text region placement work exceeds budget")
            if transposed:
                # S runs down the page, T across: x from T (right corners
                # back up by the width), y from CURS (6.4.5 step 3c)
                x0 = tt if refcorner in (0, 1) else tt - ws + 1
                y0 = curs
            else:
                x0 = curs
                y0 = tt if refcorner in (1, 3) else tt - hs + 1  # TOPx/BOTTOMx
            for yy in range(hs):
                py = y0 + yy
                if not 0 <= py < rh:
                    continue
                prow = rows[py]
                srow = sym[yy]
                for xx in range(ws):
                    px = x0 + xx
                    if not 0 <= px < rw:
                        continue
                    b = srow[xx]
                    p = prow[px]
                    if comb_op == 0:
                        prow[px] = p | b
                    elif comb_op == 1:
                        prow[px] = p & b
                    elif comb_op == 2:
                        prow[px] = p ^ b
                    else:
                        prow[px] = 1 - (p ^ b)
            curs += (hs if transposed else ws) - 1
            ninst += 1
    if expect_strip_oob:
        trailing = get_ds()
        if trailing is not None:
            raise Jbig2Error(
                "aggregate text region carries instances past REFAGGNINST"
            )
    return [bytes(r) for r in rows]


# -- halftone profile (T.88 6.6/6.7, segment types 16 + 20/22/23) ------------


def _mmr_rows(data: bytes, w: int, h: int) -> list:
    """One T.6 (MMR) stream → ``h`` rows of width ``w``, truncated streams
    padded with white rows (same convention as the MMR generic region)."""
    from frappe_data_pipelines_spark.operators.faxmini import FaxError, g4_decode

    try:
        rows = g4_decode(data, w, h)
    except (FaxError, ValueError, IndexError) as e:
        raise Jbig2Error(f"MMR stream: {e}") from e
    if len(rows) < h:
        rows = list(rows) + [bytearray(w)] * (h - len(rows))
    return rows


def decode_pattern_dict(body: bytes) -> list:
    """Pattern-dictionary segment body → list of pattern bitmaps. The
    patterns are decoded as ONE collective generic region of width
    (GRAYMAX+1)*HDPW with A1 = (-HDPW, 0) — each pattern predicts from its
    left neighbor — then sliced (6.7.5)."""
    if len(body) < 7:
        raise Jbig2Error("truncated pattern dictionary")
    flags = body[0]
    hdmmr = flags & 0x01
    template = (flags >> 1) & 0x03
    hdpw, hdph = body[1], body[2]
    graymax = int.from_bytes(body[3:7], "big")
    if hdpw == 0 or hdph == 0:
        raise Jbig2Error("zero-size halftone pattern")
    if (graymax + 1) * hdpw * hdph > _MAX_PIXELS:
        raise Jbig2Error("pattern dictionary exceeds pixel budget")
    if hdmmr:
        # 6.7.5: HDMMR=1 codes the collective bitmap as one T.6 stream
        collective = [
            bytes(r) for r in _mmr_rows(body[7:], (graymax + 1) * hdpw, hdph)
        ]
    else:
        at = [(-hdpw, 0)] + list(_NOMINAL_AT[template])[1:]
        collective = generic_region_decode(
            body[7:], (graymax + 1) * hdpw, hdph, template=template, at=at
        )
    return [
        [row[i * hdpw : (i + 1) * hdpw] for row in collective]
        for i in range(graymax + 1)
    ]


def _halftone_skip(
    hgw: int, hgh: int, hgx: int, hgy: int, hrx: int, hry: int,
    hdpw: int, hdph: int, rw: int, rh: int,
) -> list:
    """HSKIP bitmap (6.6.5.1): cell (m, n) is skipped when its pattern
    footprint lies entirely outside the region rectangle."""
    skip = []
    for m in range(hgh):
        row = bytearray(hgw)
        for n in range(hgw):
            x0 = hgx + ((m * hry + n * hrx) >> 8)
            y0 = hgy + ((m * hrx - n * hry) >> 8)
            if x0 + hdpw <= 0 or x0 >= rw or y0 + hdph <= 0 or y0 >= rh:
                row[n] = 1
        skip.append(row)
    return skip


def decode_halftone_region(body: bytes, patterns: list):
    """Halftone-region segment body + patterns → (rw, rh, rx, ry, comb_op,
    rows). Grayscale image decoded as gray-coded bitplanes (MSB first —
    arithmetic: one shared MQ decoder + GB context bank per C.5, with the
    optional HENABLESKIP/USESKIP cell mask; HMMR=1: one unreset T.6 stream
    across all planes), each cell's pattern placed on the skewable grid
    x = HGX + (mg*HRY + ng*HRX)>>8, y = HGY + (mg*HRX - ng*HRY)>>8
    (vector components in 1/256 px, 6.6.5.2)."""
    if len(body) < 18:
        raise Jbig2Error("truncated halftone region")
    if not patterns:
        raise Jbig2Error("halftone region refers to no pattern dictionary")
    rw = int.from_bytes(body[0:4], "big")
    rh = int.from_bytes(body[4:8], "big")
    rx = int.from_bytes(body[8:12], "big")
    ry = int.from_bytes(body[12:16], "big")
    ext_comb = body[16] & 0x07
    flags = body[17]
    hmmr = flags & 0x01
    template = (flags >> 1) & 0x03
    enable_skip = (flags >> 3) & 0x01
    comb_op = (flags >> 4) & 0x07
    def_pixel = (flags >> 7) & 0x01
    if len(body) < 38:
        raise Jbig2Error("truncated halftone region header")
    hgw = int.from_bytes(body[18:22], "big")
    hgh = int.from_bytes(body[22:26], "big")
    hgx = int.from_bytes(body[26:30], "big", signed=True)
    hgy = int.from_bytes(body[30:34], "big", signed=True)
    hrx = int.from_bytes(body[34:36], "big")
    hry = int.from_bytes(body[36:38], "big")
    if rw * rh > _MAX_PIXELS or (rx + rw) * (ry + rh) > _MAX_PIXELS:
        raise Jbig2Error("halftone region exceeds budget")
    if hgw * hgh > _MAX_PIXELS:
        raise Jbig2Error("halftone grid exceeds budget")

    bpv = max(len(patterns) - 1, 0).bit_length() or 1
    hdph_ = len(patterns[0])
    hdpw_ = len(patterns[0][0]) if hdph_ else 0
    hskip = None
    if enable_skip and not hmmr:
        # 6.6.5.1: a grid cell whose pattern footprint falls entirely
        # outside the region is marked and its pixels are never coded
        # (USESKIP in the bitplane decode). MMR mode carries no skip.
        hskip = _halftone_skip(
            hgw, hgh, hgx, hgy, hrx, hry, hdpw_, hdph_, rw, rh
        )
    gray = [[0] * hgw for _ in range(hgh)]

    def fold(plane) -> None:  # one MSB-first gray-code plane into gray
        for m in range(hgh):
            gm = gray[m]
            pm = plane[m]
            for n in range(hgw):
                bit = pm[n] ^ (gm[n] & 1)
                gm[n] = (gm[n] << 1) | bit

    if hmmr:
        # C.5 with HMMR=1: ALL bitplanes come from ONE unreset T.6 stream —
        # 2-D rows reference across plane boundaries, which is exactly a
        # single (hgw x bpv*hgh) decode sliced into consecutive planes
        # (the stacked rows are materialized once by the T.6 kernel; that
        # peak is inherent to the single-stream design)
        stacked = _mmr_rows(body[38:], hgw, bpv * hgh)
        for j in range(bpv):
            fold(stacked[j * hgh : (j + 1) * hgh])
    else:
        # decode AND fold plane-by-plane: peak memory is one plane, not
        # bpv planes (bpv can reach ~26 with hgw*hgh at the pixel cap)
        mq = MQDecoder(body[38:])
        cxs = [[0, 0] for _ in range(1 << len(_TEMPLATES[template]))]
        for _ in range(bpv):
            fold(
                _generic_decode_into(
                    mq, cxs, hgw, hgh, template=template, skip=hskip
                )
            )

    rows = [bytearray([def_pixel]) * rw for _ in range(rh)]
    hph = len(patterns[0])
    for m in range(hgh):
        for n in range(hgw):
            val = gray[m][n]
            if val >= len(patterns):
                raise Jbig2Error(f"gray value {val} outside the pattern dictionary")
            pat = patterns[val]
            x0 = hgx + ((m * hry + n * hrx) >> 8)
            y0 = hgy + ((m * hrx - n * hry) >> 8)
            for yy in range(hph):
                py = y0 + yy
                if not 0 <= py < rh:
                    continue
                prow = rows[py]
                srow = pat[yy]
                for xx in range(len(srow)):
                    px = x0 + xx
                    if not 0 <= px < rw:
                        continue
                    b = srow[xx]
                    p = prow[px]
                    if comb_op == 0:
                        prow[px] = p | b
                    elif comb_op == 1:
                        prow[px] = p & b
                    elif comb_op == 2:
                        prow[px] = p ^ b
                    elif comb_op == 3:
                        prow[px] = 1 - (p ^ b)
                    else:
                        prow[px] = b
    return rw, rh, rx, ry, ext_comb, [bytes(r) for r in rows]


def encode_pattern_dict(patterns: list, template: int = 0, mmr: bool = False) -> bytes:
    """Encoder twin of decode_pattern_dict (equal-size patterns);
    ``mmr=True`` codes the collective bitmap as one T.6 stream (HDMMR)."""
    from frappe_data_pipelines_spark.operators.faxmini import g4_encode

    hdph = len(patterns[0])
    hdpw = len(patterns[0][0])
    collective = [
        bytes(b for pat in patterns for b in pat[y]) for y in range(hdph)
    ]
    if mmr:
        data = g4_encode(collective, hdpw * len(patterns))
        flags = 0x01
    else:
        at = [(-hdpw, 0)] + list(_NOMINAL_AT[template])[1:]
        data = generic_region_encode(
            collective, hdpw * len(patterns), hdph, template=template, at=at
        )
        flags = template << 1
    return (bytes([flags, hdpw, hdph])
            + (len(patterns) - 1).to_bytes(4, "big") + data)


def encode_halftone_region(
    values: list[list[int]], patterns: list, rw: int, rh: int,
    template: int = 0, mmr: bool = False, enable_skip: bool = False,
) -> bytes:
    """Encoder twin of decode_halftone_region: axis-aligned grid at (0,0)
    with x-pitch = pattern width and y-pitch also = pattern width (HRX
    carries both per the grid equations — fixtures use square patterns).
    ``mmr=True`` emits HMMR=1 (one unreset T.6 stream over all bitplanes);
    ``enable_skip=True`` emits HENABLESKIP=1 (cells fully outside the
    region are masked out of the arithmetic coder, 6.6.5.1)."""
    from frappe_data_pipelines_spark.operators.faxmini import g4_encode

    hgh = len(values)
    hgw = len(values[0])
    hdpw = len(patterns[0][0])
    hdph = len(patterns[0])
    bpv = max(len(patterns) - 1, 0).bit_length() or 1
    if mmr and enable_skip:
        raise Jbig2Error("HENABLESKIP applies to the arithmetic coder only")
    hskip = None
    if enable_skip:
        hskip = _halftone_skip(
            hgw, hgh, 0, 0, hdpw << 8, 0, hdpw, hdph, rw, rh
        )
    planes = [
        # binary→gray MSB-first: plane_j = b_j ^ b_{j+1}
        [
            bytes(((v >> j) & 1) ^ ((v >> (j + 1)) & 1) for v in row)
            for row in values
        ]
        for j in reversed(range(bpv))
    ]
    if mmr:
        stacked = [row for plane in planes for row in plane]
        data = g4_encode(stacked, hgw)
    else:
        mq = MQEncoder()
        cxs = [[0, 0] for _ in range(1 << len(_TEMPLATES[template]))]
        for plane in planes:
            _generic_encode_into(
                mq, cxs, plane, hgw, hgh, template=template, skip=hskip
            )
        data = mq.flush()
    flags = (1 if mmr else 0) | (template << 1) | ((1 if enable_skip else 0) << 3)
    head = (
        rw.to_bytes(4, "big") + rh.to_bytes(4, "big")
        + (0).to_bytes(8, "big") + bytes([0])       # region at (0,0), OR
        + bytes([flags])
        + hgw.to_bytes(4, "big") + hgh.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")  # HGX, HGY
        + (hdpw << 8).to_bytes(2, "big") + (0).to_bytes(2, "big")  # HRX, HRY
    )
    return head + data


def jbig2_encode_halftone(
    values: list[list[int]], patterns: list, page_w: int, page_h: int,
    template: int = 0, mmr: bool = False, enable_skip: bool = False,
) -> bytes:
    """Halftone fixture producer: page info + pattern dictionary + one
    immediate lossless halftone region + end-of-page. ``mmr`` selects the
    HDMMR/HMMR T.6 family for both segments; ``enable_skip`` exercises
    HENABLESKIP in the arithmetic family."""
    return (
        _seg_with_refs(0, 48, 1, _page_info(page_w, page_h))
        + _seg_with_refs(1, 16, 1, encode_pattern_dict(patterns, template, mmr=mmr))
        + _seg_with_refs(
            2, 23, 1,
            encode_halftone_region(
                values, patterns, page_w, page_h, template,
                mmr=mmr, enable_skip=enable_skip,
            ),
            refs=(1,),
        )
        + _seg_with_refs(3, 49, 1, b"")
    )


# -- PDF-embedded segment stream (T.89 §7; no file header) -------------------

_GENERIC_TYPES = {36, 38, 39}

# Allocation guard: corrupted/adversarial dimension fields (4-byte widths) must
# not turn into multi-gigapixel decode loops or OOM an executor — cap the page
# and region area at 64 MPix (~8k×8k, far above any real scanned page) and
# raise Jbig2Error beyond it, same totality contract as every other kernel.
_MAX_PIXELS = 1 << 26


def _parse_segment_header(data: bytes, pos: int) -> tuple[dict, int]:
    if pos + 11 > len(data):
        raise Jbig2Error("truncated segment header")
    number = int.from_bytes(data[pos : pos + 4], "big")
    flags = data[pos + 4]
    seg_type = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)
    pos += 5
    rts = data[pos]
    count = rts >> 5
    if count == 7:
        count = int.from_bytes(data[pos : pos + 4], "big") & 0x1FFFFFFF
        if count > (len(data) - pos):  # each ref is ≥1 byte — corrupt count
            raise Jbig2Error("referred-segment count exceeds stream size")
        pos += 4 + (count + 8) // 8  # retain bits
    else:
        pos += 1
    ref_size = 1 if number <= 256 else (2 if number <= 65536 else 4)
    refs = []
    for _ in range(count):
        refs.append(int.from_bytes(data[pos : pos + ref_size], "big"))
        pos += ref_size
    page = int.from_bytes(data[pos : pos + (4 if page_assoc_4 else 1)], "big")
    pos += 4 if page_assoc_4 else 1
    length = int.from_bytes(data[pos : pos + 4], "big")
    pos += 4
    if length == 0xFFFFFFFF:
        raise Jbig2Error("unknown-length segments unsupported")
    return {"number": number, "type": seg_type, "refs": refs, "page": page,
            "length": length}, pos


def _compose_region(
    page: list[bytearray], page_w: int,
    rows: list[bytes], rx: int, ry: int, rw: int, rh: int, comb_op: int,
) -> None:
    """Compose a decoded region onto the page bitmap with the external
    combination operator (OR/AND/XOR/XNOR/REPLACE), clipped to the page."""
    for y in range(rh):
        if ry + y >= len(page):
            break
        prow = page[ry + y]
        row = rows[y]
        for x in range(min(rw, page_w - rx)):
            p = prow[rx + x]
            b = row[x]
            if comb_op == 0:  # OR
                prow[rx + x] = p | b
            elif comb_op == 1:  # AND
                prow[rx + x] = p & b
            elif comb_op == 2:  # XOR
                prow[rx + x] = p ^ b
            elif comb_op == 3:  # XNOR
                prow[rx + x] = 1 - (p ^ b)
            else:  # REPLACE
                prow[rx + x] = b


def jbig2_decode_embedded(data: bytes, globals_data: bytes = b"") -> tuple[int, int, list[bytes]]:
    """PDF-embedded JBIG2 → (width, height, rows of 0/1 bytes, 1 = black).

    Supported: page-info + generic regions (arithmetic templates 0-3 with
    nominal AT and TPGDON, or MMR through the T.6 kernel), symbol
    dictionaries in BOTH coding families (arithmetic SDHUFF=0: direct,
    single-instance REFAGG refinement in both GRTEMPLATEs, and
    multi-instance aggregates as nested text regions per 6.5.8.2;
    huffman SDHUFF=1 with uncompressed or MMR collective bitmaps) and
    immediate text regions in both families (arithmetic with refined
    instances in both GRTEMPLATEs; huffman with run-coded symbol ID
    lengths, Annex B tables — custom type-53 segments or the standard
    set B.1-B.6, B.8-B.9, B.11-B.15 — refinement via standard B.14/B.15
    or custom delta tables, 6.4.11, and SDHUFF=1 REFAGG dictionaries
    over the Table 17 hardcoded B.6/B.8/B.11/B.15/B.1), both
    TRANSPOSED orientations — the profiles real symbol-mode encoders
    emit — all composed onto the page bitmap, as are pattern
    dictionaries + immediate halftone regions (HDMMR/HMMR/HENABLESKIP
    included). The two unreconstructable standard tables (B.7/B.10,
    whose transcriptions fail the Kraft checksum) and non-causal
    refinement AT1 pixels raise — the PDF raster path treats that like
    any other unsupported filter (fallback, not a crash)."""
    page_w = page_h = None
    page: list[bytearray] | None = None
    sym_store: dict[int, list] = {}   # segment number → exported symbols
    pat_store: dict[int, list] = {}   # segment number → pattern bitmaps
    tab_store: dict[int, HuffTable] = {}  # segment number → custom table
    for blob in (globals_data, data):
        pos = 0
        while pos < len(blob):
            head, pos = _parse_segment_header(blob, pos)
            body = blob[pos : pos + head["length"]]
            pos += head["length"]
            t = head["type"]
            if t == 48:  # page info
                page_w = int.from_bytes(body[0:4], "big")
                page_h = int.from_bytes(body[4:8], "big")
                if page_h == 0xFFFFFFFF:
                    raise Jbig2Error("striped unknown-height pages unsupported")
                if page_w * page_h > _MAX_PIXELS:
                    raise Jbig2Error(f"page {page_w}x{page_h} exceeds pixel budget")
                default_px = (body[16] >> 2) & 1 if len(body) > 16 else 0
                page = [bytearray([default_px]) * page_w for _ in range(page_h)]
            elif t in _GENERIC_TYPES:
                if len(body) < 18:
                    raise Jbig2Error("truncated generic region")
                rw = int.from_bytes(body[0:4], "big")
                rh = int.from_bytes(body[4:8], "big")
                rx = int.from_bytes(body[8:12], "big")
                ry = int.from_bytes(body[12:16], "big")
                comb_op = body[16] & 0x07  # external combination operator
                if rw * rh > _MAX_PIXELS or (rx + rw) * (ry + rh) > _MAX_PIXELS:
                    raise Jbig2Error(f"region {rw}x{rh}@{rx},{ry} exceeds pixel budget")
                gflags = body[17]
                if gflags & 0x01:
                    # MMR-coded generic region: the body IS a T.6 (Group 4)
                    # code stream (T.88 6.2.6) — decode with the CCITT
                    # kernel; MMR segments carry no AT bytes
                    from frappe_data_pipelines_spark.operators.faxmini import (
                        FaxError,
                        g4_decode,
                    )

                    try:
                        rows = [bytes(r) for r in g4_decode(body[18:], rw, rh)]
                    except (FaxError, ValueError, IndexError) as e:
                        raise Jbig2Error(f"MMR region: {e}") from e
                    if len(rows) < rh:  # truncated stream: pad like T.6 white
                        rows += [bytes(rw)] * (rh - len(rows))
                else:
                    template = (gflags >> 1) & 0x03
                    at_end = 18 + 2 * _N_AT[template]  # signed AT pairs
                    if len(body) < at_end:
                        raise Jbig2Error("truncated AT pixel coordinates")
                    got_at = tuple(
                        (int.from_bytes(body[18 + 2 * i : 19 + 2 * i], "big", signed=True),
                         int.from_bytes(body[19 + 2 * i : 20 + 2 * i], "big", signed=True))
                        for i in range(_N_AT[template])
                    )
                    if got_at != _NOMINAL_AT[template]:
                        raise Jbig2Error(
                            f"non-nominal AT pixels {got_at} for template {template} "
                            "unsupported (context geometry is nominal-only)"
                        )
                    rows = generic_region_decode(
                        body[at_end:], rw, rh,
                        tpgdon=bool(gflags & 0x08), template=template,
                    )
                if page is None:
                    page_w, page_h = rx + rw, ry + rh
                    page = [bytearray(page_w) for _ in range(page_h)]
                _compose_region(page, page_w, rows, rx, ry, rw, rh, comb_op)
            elif t == 0:  # symbol dictionary
                input_syms: list = []
                tabs: list = []
                for r in head["refs"]:
                    input_syms.extend(sym_store.get(r, []))
                    if r in tab_store:
                        tabs.append(tab_store[r])
                sym_store[head["number"]] = decode_symbol_dict(
                    body, input_syms, tabs
                )
            elif t in (6, 7):  # immediate (lossless) text region
                syms: list = []
                tabs = []
                for r in head["refs"]:
                    syms.extend(sym_store.get(r, []))
                    if r in tab_store:
                        tabs.append(tab_store[r])
                rw, rh, rx, ry, comb_op, rows = decode_text_region(
                    body, syms, tabs
                )
                if page is None:
                    page_w, page_h = rx + rw, ry + rh
                    page = [bytearray(page_w) for _ in range(page_h)]
                _compose_region(page, page_w, rows, rx, ry, rw, rh, comb_op)
            elif t == 16:  # pattern dictionary
                pat_store[head["number"]] = decode_pattern_dict(body)
            elif t == 53:  # custom huffman table
                tab_store[head["number"]] = parse_table_segment(body)
            elif t in (22, 23):  # immediate (lossless) halftone region
                pats: list = []
                for r in head["refs"]:
                    pats.extend(pat_store.get(r, []))
                rw, rh, rx, ry, comb_op, rows = decode_halftone_region(body, pats)
                if page is None:
                    page_w, page_h = rx + rw, ry + rh
                    page = [bytearray(page_w) for _ in range(page_h)]
                _compose_region(page, page_w, rows, rx, ry, rw, rh, comb_op)
            elif t in (4, 20, 40, 42, 43):
                raise Jbig2Error(f"JBIG2 segment type {t} unsupported "
                                 "(intermediate/refinement-region profile)")
            # 49 end-of-page / 50 end-of-stripe / 51 end-of-file / 52-53
            # extensions: nothing to do
    if page is None:
        raise Jbig2Error("no page in JBIG2 stream")
    return page_w, page_h, [bytes(r) for r in page]


def jbig2_encode_embedded(
    rows: list[bytes], w: int, h: int, tpgdon: bool = True, template: int = 0,
    mmr: bool = False,
) -> bytes:
    """Fixture/round-trip producer: page info + one immediate lossless
    generic region (template 0, nominal AT, TPGDON by default — the mode
    real encoders ship; ``mmr=True`` emits a T.6-coded region instead) +
    end-of-page, as a PDF /JBIG2Decode stream (no file header)."""
    def seg(number: int, seg_type: int, page: int, body: bytes) -> bytes:
        head = number.to_bytes(4, "big") + bytes([seg_type & 0x3F, 0x00])
        head += bytes([page]) + len(body).to_bytes(4, "big")
        return head + body

    page_info = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + bytes([0x01]) + (0).to_bytes(2, "big")
    )
    region_info = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + (0).to_bytes(4, "big") + (0).to_bytes(4, "big") + bytes([0])
    )
    if mmr:
        from frappe_data_pipelines_spark.operators.faxmini import g4_encode

        body = region_info + bytes([0x01]) + g4_encode(
            [[1 if b else 0 for b in r[:w]] for r in rows], w
        )
    else:
        # emit the per-template NOMINAL AT pairs — the decoder validates
        # them against _NOMINAL_AT (templates 2/3 use A1=(2,-1), not
        # template 0's A1)
        at = b"".join(bytes([x & 0xFF, y & 0xFF]) for x, y in _NOMINAL_AT[template])
        gflags = bytes([(0x08 if tpgdon else 0x00) | (template << 1)])
        body = region_info + gflags + at + generic_region_encode(
            rows, w, h, tpgdon=tpgdon, template=template
        )
    return (
        seg(0, 48, 1, page_info)
        + seg(1, 39, 1, body)
        + seg(2, 49, 1, b"")
    )


def _seg_with_refs(number: int, seg_type: int, page: int, body: bytes,
                   refs: tuple[int, ...] = ()) -> bytes:
    """Segment header incl. referred-segment numbers: short-count form for
    <= 4 refs, the 7.2.4 long-count form (0b111 marker + 29-bit count +
    retain-flag bytes) beyond — both read by ``_parse_segment_header``."""
    head = number.to_bytes(4, "big") + bytes([seg_type & 0x3F])
    if len(refs) <= 4:
        head += bytes([len(refs) << 5])
    else:
        head += ((0b111 << 29) | len(refs)).to_bytes(4, "big")
        head += bytes((len(refs) + 8) // 8)  # retain bits: all zero
    head += bytes(refs)  # number <= 256 → 1-byte referred numbers
    head += bytes([page]) + len(body).to_bytes(4, "big")
    return head + body


def _emit_dict_classes(mq: MQEncoder, order: list[int], glyphs, emit_symbol) -> None:
    """Grouped height-class walk, encoder side of 6.5.5: IADH deltas
    between classes (ascending height), IADW deltas within, OOB closing
    each class. ``emit_symbol(g, gl, w, h)`` writes the per-symbol payload
    (direct generic bits, or a refinement record)."""
    iadh, iadw = _int_ctx(), _int_ctx()
    hc = 0
    i = 0
    while i < len(order):
        h = len(glyphs[order[i]])
        arith_int_encode(mq, iadh, h - hc)
        hc = h
        sw = 0
        while i < len(order) and len(glyphs[order[i]]) == h:
            gl = glyphs[order[i]]
            w = len(gl[0]) if gl else 0
            arith_int_encode(mq, iadw, w - sw)
            sw = w
            emit_symbol(order[i], gl, w, h)
            i += 1
        arith_int_encode(mq, iadw, None)  # OOB closes the height class


def _emit_export_runs(mq: MQEncoder, n_skip: int, n_export: int) -> None:
    """IAEX runs (6.5.10): skip ``n_skip`` symbols, export the next
    ``n_export``."""
    iaex = _int_ctx()
    arith_int_encode(mq, iaex, n_skip)
    arith_int_encode(mq, iaex, n_export)


def _group_strips(placements, transposed: bool) -> dict[int, list[tuple[int, int]]]:
    """(glyph, x, y) placements → {T: [(S, glyph), ...]}. Non-transposed:
    T = y (strip rows), S = x; transposed: T = x (strip columns), S = y —
    the decoder walks S down the page."""
    strips: dict[int, list[tuple[int, int]]] = {}
    for g, x, y in placements:
        t_coord, s_coord = (x, y) if transposed else (y, x)
        strips.setdefault(t_coord, []).append((s_coord, g))
    return strips


def _emit_strip_walk(mq: MQEncoder, strips, emit_instance) -> None:
    """Encoder side of the 6.4.5 strip walk: strips ascending by T,
    instances ascending by S, SBSTRIPS=1 (no IAIT), SBDSOFFSET=0.
    ``emit_instance(g)`` writes the symbol id plus any refinement payload
    and returns the S-extent the decoder advances by."""
    iadt, iafs, iads = _int_ctx(), _int_ctx(), _int_ctx()
    arith_int_encode(mq, iadt, 0)  # STRIPT = 0
    stript = firsts = 0
    for t_coord in sorted(strips):
        arith_int_encode(mq, iadt, t_coord - stript)
        stript = t_coord
        insts = sorted(strips[t_coord])
        arith_int_encode(mq, iafs, insts[0][0] - firsts)
        firsts = insts[0][0]
        curs = firsts
        for j, (s_coord, g) in enumerate(insts):
            if j > 0:
                arith_int_encode(mq, iads, s_coord - curs)
                curs = s_coord
            curs += emit_instance(g) - 1
        arith_int_encode(mq, iads, None)  # OOB ends the strip


def _region_info(w: int, h: int) -> bytes:
    return (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + (0).to_bytes(8, "big") + bytes([0]))  # at (0,0), external OR


def _page_info(w: int, h: int) -> bytes:
    return (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + (0).to_bytes(8, "big") + bytes([0x01]) + (0).to_bytes(2, "big"))


def jbig2_encode_symbol_text_refagg(
    rough_glyphs: list[list[bytes]],
    clean_glyphs: list[list[bytes]],
    placements: list[tuple[int, int, int]],
    page_w: int,
    page_h: int,
    inline_refine_last: bool = True,
    r_template: int = 1,
    rat: tuple | None = None,
) -> bytes:
    """Refinement-profile fixture producer: dictionary 1 direct-codes the
    ROUGH glyphs, dictionary 2 REFAGG-refines each rough glyph into its
    CLEAN form (exporting only the clean set), and the text region places
    clean symbols — optionally refining the last instance inline (RI=1).
    Decodes to exactly the clean-glyph composition, so an OCR golden pinned
    on the clean font survives the whole refinement path.

    ``r_template`` selects the refinement geometry: 1 (fixed) or 0 (the
    13-bit movable-AT template — SDRAT/SBRAT pairs are then written into
    the dictionary and text-region headers). ``rat`` overrides the two
    template-0 AT pairs (default nominal); a NON-CAUSAL A1 is legal
    (round 10) — both sides read not-yet-coded pixels as 0."""
    if r_template not in (0, 1):
        raise Jbig2Error(f"refinement template {r_template} out of range")
    if len(rough_glyphs) != len(clean_glyphs) or not placements:
        raise Jbig2Error("refagg encoder needs paired glyph lists + placements")
    for r, c in zip(rough_glyphs, clean_glyphs):
        if len(r) != len(c) or len(r[0]) != len(c[0]):
            raise Jbig2Error("rough/clean glyph dimensions must match")

    order = sorted(range(len(rough_glyphs)), key=lambda g: (len(rough_glyphs[g]), g))
    new_id = {g: i for i, g in enumerate(order)}
    n = len(order)
    at = b"".join(bytes([x & 0xFF, y & 0xFF]) for x, y in _NOMINAL_AT[0])
    rat_bytes = b""
    if r_template == 0:
        if rat is None:
            rat = _NOMINAL_RAT
        rat_bytes = b"".join(
            bytes([x & 0xFF, y & 0xFF]) for x, y in rat
        )
    else:
        rat = None

    # --- dict 1: rough glyphs, direct-coded, export all ------------------
    mq = MQEncoder()
    cx = [[0, 0] for _ in range(1 << len(_TEMPLATES[0]))]
    _emit_dict_classes(
        mq, order, rough_glyphs,
        lambda g, gl, w, h: _generic_encode_into(mq, cx, gl, w, h),
    )
    _emit_export_runs(mq, 0, n)
    d1 = ((0).to_bytes(2, "big") + at
          + n.to_bytes(4, "big") + n.to_bytes(4, "big") + mq.flush())

    # --- dict 2: REFAGG — clean[g] refined from its rough twin; export
    # only the n NEW (clean) symbols ---------------------------------------
    mq = MQEncoder()
    iaai, iardx, iardy = _int_ctx(), _int_ctx(), _int_ctx()
    code_len = max(2 * n - 1, 0).bit_length()  # ids over input + new
    iaid = _iaid_ctx(code_len)
    gr = _ref_ctx_bank(r_template)

    def refine_symbol(g, gl, w, h):
        arith_int_encode(mq, iaai, 1)
        arith_iaid_encode(mq, iaid, new_id[g], code_len)  # rough twin's id
        arith_int_encode(mq, iardx, 0)
        arith_int_encode(mq, iardy, 0)
        refinement_region_encode(
            mq, gr, gl, w, h, rough_glyphs[g], template=r_template, at=rat
        )

    _emit_dict_classes(mq, order, clean_glyphs, refine_symbol)
    _emit_export_runs(mq, n, n)  # skip the rough inputs, export the clean
    d2 = ((0x0002 | (r_template << 12)).to_bytes(2, "big") + at + rat_bytes
          + n.to_bytes(4, "big") + n.to_bytes(4, "big") + mq.flush())

    # --- text region over the clean exports (refs dict 2 only) -----------
    t_code_len = max(n - 1, 0).bit_length()
    mq = MQEncoder()
    iari = _int_ctx()
    iardw, iardh = _int_ctx(), _int_ctx()
    iardx2, iardy2 = _int_ctx(), _int_ctx()
    t_iaid = _iaid_ctx(t_code_len)
    t_gr = _ref_ctx_bank(r_template)
    n_total = len(placements)
    n_done = 0

    def emit_instance(g: int) -> int:
        nonlocal n_done
        gl = clean_glyphs[g]
        arith_iaid_encode(mq, t_iaid, new_id[g], t_code_len)
        n_done += 1
        if inline_refine_last and n_done == n_total:
            # identity refinement: RDW/RDH/RDX/RDY = 0, bitmap == symbol
            arith_int_encode(mq, iari, 1)
            arith_int_encode(mq, iardw, 0)
            arith_int_encode(mq, iardh, 0)
            arith_int_encode(mq, iardx2, 0)
            arith_int_encode(mq, iardy2, 0)
            refinement_region_encode(
                mq, t_gr, gl, len(gl[0]), len(gl), gl, template=r_template,
                at=rat,
            )
        else:
            arith_int_encode(mq, iari, 0)
        return len(gl[0])

    _emit_strip_walk(mq, _group_strips(placements, transposed=False), emit_instance)
    # TOPLEFT, REFINE, and the selected refinement template
    tr_flags = (1 << 4) | (1 << 1) | (r_template << 15)
    tr = (_region_info(page_w, page_h) + tr_flags.to_bytes(2, "big")
          + rat_bytes + n_total.to_bytes(4, "big") + mq.flush())

    return (
        _seg_with_refs(0, 48, 1, _page_info(page_w, page_h))
        + _seg_with_refs(1, 0, 1, d1)
        + _seg_with_refs(2, 0, 1, d2, refs=(1,))
        + _seg_with_refs(3, 6, 1, tr, refs=(2,))
        + _seg_with_refs(4, 49, 1, b"")
    )


def jbig2_encode_symbol_text_aggregate(
    base_glyphs: list[list[bytes]],
    composites: list[list[tuple[int, int]]],
    placements: list[tuple[int, int, int]],
    page_w: int,
    page_h: int,
    inline_refine_last: bool = False,
) -> bytes:
    """Multi-instance-aggregate fixture producer (6.5.8.2.2): dictionary 1
    direct-codes the base glyphs; dictionary 2 (REFAGG=1) builds each
    COMPOSITE symbol as a nested text region of REFAGGNINST>1 base-glyph
    placements (RI=0, one strip, TOPLEFT, OR) sharing the dictionary's MQ
    stream and context banks, the strip closed by the 6.4.5 OOB the
    nested decoder consumes to stay in sync. The page text region
    then places the composites. ``composites`` is a list of instance
    lists [(base_glyph_id, x_offset), ...] (all bases equal height)."""
    if not base_glyphs or not composites or not placements:
        raise Jbig2Error("aggregate encoder needs bases, composites, placements")
    bh = len(base_glyphs[0])
    if any(len(g) != bh for g in base_glyphs):
        raise Jbig2Error("aggregate fixture bases must share one height")
    if any(len(insts) < 2 for insts in composites):
        raise Jbig2Error("a composite needs >= 2 instances (else REFAGGNINST=1)")

    at = b"".join(bytes([x & 0xFF, y & 0xFF]) for x, y in _NOMINAL_AT[0])
    n_base = len(base_glyphs)
    n_comp = len(composites)

    # --- dict 1: base glyphs, direct-coded, export all --------------------
    order1 = sorted(range(n_base), key=lambda g: (len(base_glyphs[g]), g))
    base_id = {g: i for i, g in enumerate(order1)}
    mq = MQEncoder()
    cx = [[0, 0] for _ in range(1 << len(_TEMPLATES[0]))]
    _emit_dict_classes(
        mq, order1, base_glyphs,
        lambda g, gl, w, h: _generic_encode_into(mq, cx, gl, w, h),
    )
    _emit_export_runs(mq, 0, n_base)
    d1 = ((0).to_bytes(2, "big") + at
          + n_base.to_bytes(4, "big") + n_base.to_bytes(4, "big") + mq.flush())

    # composite bitmaps (the OR composition the nested region reproduces)
    comp_bitmaps: list[list[bytes]] = []
    for insts in composites:
        cw = max(x + len(base_glyphs[b][0]) for b, x in insts)
        rows = [bytearray(cw) for _ in range(bh)]
        for b, x in insts:
            gl = base_glyphs[b]
            for y in range(bh):
                for xx, px in enumerate(gl[y]):
                    rows[y][x + xx] |= px
        comp_bitmaps.append([bytes(r) for r in rows])

    # --- dict 2: REFAGG multi-instance composites, export only them ------
    mq = MQEncoder()
    iaai = _int_ctx()
    ref_code_len = max(n_base + n_comp - 1, 0).bit_length()
    iaid = _iaid_ctx(ref_code_len)
    # nested-text-region banks persist across all composites (Table 17)
    iadt, iafs, iads, iari = (_int_ctx() for _ in range(4))
    iardw, iardh, iardx, iardy = (_int_ctx() for _ in range(4))
    gr = _ref_ctx_bank(1)

    order2 = sorted(range(n_comp), key=lambda c: (len(comp_bitmaps[c]), c))
    last_comp = order2[-1]

    def agg_symbol(c: int, gl, w: int, h: int) -> None:
        insts = sorted(composites[c], key=lambda bx: bx[1])
        arith_int_encode(mq, iaai, len(insts))
        arith_int_encode(mq, iadt, 0)  # initial STRIPT
        arith_int_encode(mq, iadt, 0)  # the single strip at T = 0
        arith_int_encode(mq, iafs, insts[0][1])
        curs = None
        for j, (b, x) in enumerate(insts):
            if j > 0:
                arith_int_encode(mq, iads, x - curs)
            arith_iaid_encode(mq, iaid, base_id[b], ref_code_len)
            base = base_glyphs[b]
            if inline_refine_last and c == last_comp and j == len(insts) - 1:
                # identity refinement INSIDE the aggregate: RI=1 with
                # RDW/RDH/RDX/RDY = 0 and bitmap == the base symbol
                arith_int_encode(mq, iari, 1)
                arith_int_encode(mq, iardw, 0)
                arith_int_encode(mq, iardh, 0)
                arith_int_encode(mq, iardx, 0)
                arith_int_encode(mq, iardy, 0)
                refinement_region_encode(
                    mq, gr, base, len(base[0]), len(base), base, template=1
                )
            else:
                arith_int_encode(mq, iari, 0)
            curs = x + len(base[0]) - 1
        # 6.4.5 strip-terminating OOB: conformant streams close the final
        # strip too, and the nested decoder consumes it to stay in sync
        arith_int_encode(mq, iads, None)

    _emit_dict_classes(mq, order2, comp_bitmaps, agg_symbol)
    _emit_export_runs(mq, n_base, n_comp)
    # REFAGG=1 with GRTEMPLATE 1 (no SDRAT bytes) — RI=0 everywhere, so
    # the refinement template never actually fires
    d2 = ((0x0002 | (1 << 12)).to_bytes(2, "big") + at
          + n_comp.to_bytes(4, "big") + n_comp.to_bytes(4, "big") + mq.flush())

    # --- text region placing the composites (refs dict 2 only) -----------
    comp_id = {c: i for i, c in enumerate(order2)}
    t_code_len = max(n_comp - 1, 0).bit_length()
    mq = MQEncoder()
    t_iaid = _iaid_ctx(t_code_len)

    def emit_instance(c: int) -> int:
        arith_iaid_encode(mq, t_iaid, comp_id[c], t_code_len)
        return len(comp_bitmaps[c][0])

    _emit_strip_walk(mq, _group_strips(placements, transposed=False), emit_instance)
    tr_flags = 1 << 4  # TOPLEFT, no refinement
    tr = (_region_info(page_w, page_h) + tr_flags.to_bytes(2, "big")
          + len(placements).to_bytes(4, "big") + mq.flush())

    return (
        _seg_with_refs(0, 48, 1, _page_info(page_w, page_h))
        + _seg_with_refs(1, 0, 1, d1)
        + _seg_with_refs(2, 0, 1, d2, refs=(1,))
        + _seg_with_refs(3, 6, 1, tr, refs=(2,))
        + _seg_with_refs(4, 49, 1, b"")
    )


def _huffman_dict_body(
    glyphs: list[list[bytes]], order: list[int], collective: str = "raw"
) -> bytes:
    """SDHUFF=1 plain (SDREFAGG=0) dictionary body: standard tables
    B.4/B.2/B.1, per-height-class collective bitmaps ``raw`` uncompressed
    or ``mmr`` T.6, exports everything. ``order`` must be sorted by
    (height, width) so the non-negative DH/DW ranges of B.4/B.2 apply."""
    t_dh, t_dw, t_bm, t_ex = (standard_table(n) for n in (4, 2, 1, 1))
    bw = _HuffBitWriter()
    hc = 0
    i = 0
    while i < len(order):
        h = len(glyphs[order[i]])
        t_dh.encode(bw, h - hc)
        hc = h
        sw = 0
        cls: list = []
        while i < len(order) and len(glyphs[order[i]]) == h:
            gl = glyphs[order[i]]
            w = len(gl[0]) if gl else 0
            t_dw.encode(bw, w - sw)
            sw = w
            cls.append(gl)
            i += 1
        t_dw.encode(bw, None)  # OOB closes the height class
        # collective bitmap for the class (6.5.9)
        tot = sum(len(g[0]) if g else 0 for g in cls)
        coll_rows = [
            bytearray(b"").join(bytearray(g[y]) for g in cls) for y in range(h)
        ]
        if collective == "raw":
            t_bm.encode(bw, 0)
            bw.align()
            stride = (tot + 7) // 8
            packed = bytearray()
            for row in coll_rows:
                acc = bytearray(stride)
                for x, px in enumerate(row):
                    if px:
                        acc[x >> 3] |= 0x80 >> (x & 7)
                packed += acc
            bw.write_bytes(bytes(packed))
        else:
            from frappe_data_pipelines_spark.operators.faxmini import g4_encode

            mmr = g4_encode([bytes(r) for r in coll_rows], tot)
            t_bm.encode(bw, len(mmr))
            bw.align()
            bw.write_bytes(mmr)
    t_ex.encode(bw, 0)
    t_ex.encode(bw, len(order))
    sd_flags = 0x0001  # SDHUFF=1, all selectors standard (B.4/B.2/B.1)
    return (
        sd_flags.to_bytes(2, "big")
        + len(order).to_bytes(4, "big")   # SDNUMEXSYMS
        + len(order).to_bytes(4, "big")   # SDNUMNEWSYMS
        + bw.finish()
    )


def jbig2_encode_symbol_text_huffman(
    glyphs: list[list[bytes]],
    placements: list[tuple[int, int, int]],
    page_w: int,
    page_h: int,
    transposed: bool = False,
    collective: str = "raw",
    inline_refine_last: bool = False,
    std_tables: bool = False,
) -> bytes:
    """Huffman twin of ``jbig2_encode_symbol_text`` (SDHUFF=1 / SBHUFF=1):
    page info + huffman symbol dictionary (standard tables B.4/B.2/B.1,
    height-class collective bitmaps ``raw`` uncompressed or ``mmr`` T.6) +
    three custom FS/DS/DT table segments (type 53) + immediate huffman
    text region (run-coded symbol ID lengths per 7.4.4.1.7, TOPLEFT
    corner, SBSTRIPS=1) + end-of-page. Symbols are ordered by (height,
    width) so the B.4/B.2 tables' non-negative ranges always apply.

    ``std_tables=True`` drops the custom table segments and selects the
    STANDARD text-region tables instead — FS=B.6, DS=B.8, DT=B.11, and
    (with ``inline_refine_last``) RDW/RDH=B.14, RDX/RDY=B.15 — exercising
    the transcribed Annex B data through the public selector path. B.11
    cannot code a 0 delta (its range starts at 1), so the strip walk is
    emitted with the standard initial-DT=1 trick: the decoder's STRIPT
    starts at -1 and the first strip's delta is t0+1."""
    if not glyphs or not placements:
        raise Jbig2Error("symbol-mode encoder needs glyphs and placements")
    if collective not in ("raw", "mmr"):
        raise Jbig2Error("collective must be 'raw' or 'mmr'")

    # --- symbol dictionary: order by (height, width) — huffman DW >= 0 ---
    order = sorted(
        range(len(glyphs)),
        key=lambda g: (len(glyphs[g]), len(glyphs[g][0]) if glyphs[g] else 0, g),
    )
    new_id = {g: i for i, g in enumerate(order)}
    sd_body = _huffman_dict_body(glyphs, order, collective)

    # --- text region: dry-run the strip walk to size the custom tables ---
    strips = _group_strips(placements, transposed)

    def extent(g: int) -> int:
        gl = glyphs[g]
        return len(gl) if transposed else (len(gl[0]) if gl else 0)

    n_inst_total = sum(len(v) for v in strips.values())
    dt_bias = 1 if std_tables else 0  # B.11's lowest codable value is 1
    events: list[tuple[str, int | None]] = [("dt", dt_bias)]
    stript = -dt_bias
    firsts = 0
    seen = 0
    for t_coord in sorted(strips):
        events.append(("dt", t_coord - stript))
        stript = t_coord
        insts = sorted(strips[t_coord])
        events.append(("fs", insts[0][0] - firsts))
        firsts = insts[0][0]
        curs = firsts
        for j, (s_coord, g) in enumerate(insts):
            if j > 0:
                events.append(("ds", s_coord - curs))
                curs = s_coord
            events.append(("id", g))
            seen += 1
            if inline_refine_last:
                # 7.4.4.5: RI is one raw bit per instance in huffman mode;
                # the LAST instance carries an identity refinement record
                events.append(("ri", 1 if seen == n_inst_total else 0))
            curs += extent(g) - 1
        events.append(("ds", None))

    def rng(kind: str) -> tuple[int, int]:
        vals = [v for k, v in events if k == kind and v is not None]
        return (min(vals), max(vals) + 1) if vals else (0, 1)

    if std_tables:
        fs_seg = ds_seg = dt_seg = rd_seg = None
        t_fs, t_ds, t_dt = (standard_table(n) for n in (6, 8, 11))
        # identity refinement deltas are 0 — codable by B.14 (RDW/RDH)
        # and B.15 (RDX/RDY) alike
        t_rdwh, t_rdxy = standard_table(14), standard_table(15)
    else:
        fs_seg = build_table_segment(*rng("fs"))
        ds_seg = build_table_segment(*rng("ds"), oob=True)
        dt_seg = build_table_segment(*rng("dt"))
        t_fs = parse_table_segment(fs_seg)
        t_ds = parse_table_segment(ds_seg)
        t_dt = parse_table_segment(dt_seg)
        rd_seg = build_table_segment(0, 1)  # identity refinement: all deltas 0
        t_rdwh = t_rdxy = parse_table_segment(rd_seg)
    t_rs = standard_table(1)

    nsyms = len(order)
    code_len = max(max(nsyms - 1, 0).bit_length(), 1)
    bw = _HuffBitWriter()
    # 7.4.4.1.7 symbol ID code lengths: one run-code (= code_len) used
    for r in range(35):
        bw.write(4, 1 if r == code_len else 0)
    runtab = HuffTable([(1, 0, code_len, "n")])
    for _ in range(nsyms):
        runtab.encode(bw, code_len)  # every symbol: fixed-length code
    bw.align()
    symtab = HuffTable([(code_len, 0, k, "n") for k in range(nsyms)])
    last_glyph = next(
        (v for k, v in reversed(events) if k == "id"), None
    )
    for kind, v in events:
        if kind == "dt":
            t_dt.encode(bw, v)
        elif kind == "fs":
            t_fs.encode(bw, v)
        elif kind == "ds":
            t_ds.encode(bw, v)
        elif kind == "ri":
            bw.write(1, v)
            if v:
                gl = glyphs[last_glyph]
                w_g = len(gl[0]) if gl else 0
                for t in (t_rdwh, t_rdwh, t_rdxy, t_rdxy):  # RDW RDH RDX RDY = 0
                    t.encode(bw, 0)
                mq = MQEncoder()
                refinement_region_encode(
                    mq, _ref_ctx_bank(1), gl, w_g, len(gl), gl, template=1
                )
                ref_bytes = mq.flush()
                t_rs.encode(bw, len(ref_bytes))
                bw.align()
                bw.write_bytes(ref_bytes)
        else:
            symtab.encode(bw, new_id[v])
    # SBHUFF=1, TOPLEFT corner, optional TRANSPOSED; huffman flags select
    # custom tables for FS/DS/DT (consumed from the referred segments in
    # that order)
    tr_flags = (0x0001 | (1 << 4) | ((1 << 6) if transposed else 0)
                | ((1 << 1) | (1 << 15) if inline_refine_last else 0))
    if std_tables:
        # FS=0 (B.6), DS=0 (B.8), DT=0 (B.11); with refinement RDW/RDH=0
        # (B.14), RDX/RDY=1 (B.15), RSIZE=0 (B.1); SBRTEMPLATE=1
        hflags = ((1 << 10) | (1 << 12)) if inline_refine_last else 0
    else:
        # FS=3, DS=3, DT=3 custom; with refinement also RDW/RDH/RDX/RDY=3
        # custom and RSIZE=0 (standard B.1); SBRTEMPLATE=1 (no SBRAT bytes)
        hflags = 0b0011_1111 | (
            (3 << 6) | (3 << 8) | (3 << 10) | (3 << 12)
            if inline_refine_last else 0
        )
    tr_body = (
        _region_info(page_w, page_h)
        + tr_flags.to_bytes(2, "big")
        + hflags.to_bytes(2, "big")
        + len(placements).to_bytes(4, "big")
        + bw.finish()
    )

    segs = (
        _seg_with_refs(0, 48, 1, _page_info(page_w, page_h))
        + _seg_with_refs(1, 0, 1, sd_body)
    )
    if std_tables:
        return (
            segs
            + _seg_with_refs(2, 6, 1, tr_body, refs=(1,))
            + _seg_with_refs(3, 49, 1, b"")
        )
    segs += (
        _seg_with_refs(2, 53, 1, fs_seg)
        + _seg_with_refs(3, 53, 1, ds_seg)
        + _seg_with_refs(4, 53, 1, dt_seg)
    )
    if inline_refine_last:
        # four more custom-table slots, consumed as RDW/RDH/RDX/RDY
        for n in (5, 6, 7, 8):
            segs += _seg_with_refs(n, 53, 1, rd_seg)
        segs += _seg_with_refs(
            9, 6, 1, tr_body, refs=(1, 2, 3, 4, 5, 6, 7, 8)
        ) + _seg_with_refs(10, 49, 1, b"")
    else:
        segs += (
            _seg_with_refs(5, 6, 1, tr_body, refs=(1, 2, 3, 4))
            + _seg_with_refs(6, 49, 1, b"")
        )
    return segs


def jbig2_encode_symbol_text_huffman_refagg(
    base_glyphs: list[list[bytes]],
    composites: list[list[tuple[int, int]]],
    placements: list[tuple[int, int, int]],
    page_w: int,
    page_h: int,
    refine_in_aggregate: bool = False,
) -> bytes:
    """Huffman twin of ``jbig2_encode_symbol_text_aggregate`` (SDHUFF=1
    SDREFAGG=1, 6.5.8.2): dictionary 1 carries the base glyphs as a plain
    huffman dictionary (collective bitmaps); dictionary 2 (SDREFAGG=1)
    builds each composite — a single-instance entry ``[(base_id, 0)]``
    becomes an identity REFINEMENT of that base (raw SBSYMCODELEN-bit id,
    RDX/RDY via Table B.15, a B.1-coded BMSIZE and the refinement as its
    own byte-aligned MQ codeword), a multi-instance entry a nested
    huffman TEXT REGION over the Table 17 hardcoded tables
    (FS=B.6, DS=B.8, DT=B.11 with the initial-DT=1 trick, refinement via
    B.15, RSIZE via B.1, raw ids, RI one raw bit per instance, the strip
    closed by the 6.4.5 OOB). The page text region then places the composites
    through the STANDARD B.6/B.8/B.11 selector path.
    ``refine_in_aggregate`` flips the last instance of the last
    multi-instance composite to RI=1 with an identity refinement."""
    if not base_glyphs or not composites or not placements:
        raise Jbig2Error("refagg encoder needs bases, composites, placements")
    bh = len(base_glyphs[0])
    if any(len(g) != bh for g in base_glyphs):
        raise Jbig2Error("refagg fixture bases must share one height")

    n_base = len(base_glyphs)
    n_comp = len(composites)

    # --- dict 1: plain huffman dictionary of the bases ---------------------
    order1 = sorted(
        range(n_base),
        key=lambda g: (len(base_glyphs[g]), len(base_glyphs[g][0]), g),
    )
    base_id = {g: i for i, g in enumerate(order1)}
    d1 = _huffman_dict_body(base_glyphs, order1)

    # composite bitmaps (what the nested regions/refinements reproduce)
    comp_bitmaps: list[list[bytes]] = []
    for insts in composites:
        cw = max(x + len(base_glyphs[b][0]) for b, x in insts)
        rows = [bytearray(cw) for _ in range(bh)]
        for b, x in insts:
            gl = base_glyphs[b]
            for y in range(bh):
                for xx, px in enumerate(gl[y]):
                    rows[y][x + xx] |= px
        comp_bitmaps.append([bytes(r) for r in rows])

    # --- dict 2: SDHUFF=1 SDREFAGG=1 over the bases ------------------------
    code_len = max(1, max(n_base + n_comp - 1, 0).bit_length())
    t_dh, t_dw, t_ex = (standard_table(n) for n in (4, 2, 1))
    t_b1, t_b15 = standard_table(1), standard_table(15)
    t_fs, t_ds, t_dt = (standard_table(n) for n in (6, 8, 11))
    order2 = sorted(
        range(n_comp), key=lambda c: (len(comp_bitmaps[c][0]), c)
    )
    last_multi = next(
        (c for c in reversed(order2) if len(composites[c]) > 1), None
    )
    bw = _HuffBitWriter()
    t_dh.encode(bw, bh)  # one height class (all composites share bh)

    def identity_refinement_codeword(gl: list[bytes]) -> None:
        mq = MQEncoder()
        refinement_region_encode(
            mq, _ref_ctx_bank(1), gl, len(gl[0]), len(gl), gl, template=1
        )
        data = mq.flush()
        t_b1.encode(bw, len(data))
        bw.align()
        bw.write_bytes(data)

    sw = 0
    for c in order2:
        cw = len(comp_bitmaps[c][0])
        t_dw.encode(bw, cw - sw)
        sw = cw
        insts = sorted(composites[c], key=lambda bx: bx[1])
        t_b1.encode(bw, len(insts))  # REFAGGNINST via SDHUFFAGGINST (B.1)
        if len(insts) == 1:
            # single-instance refinement (6.5.8.2.2): identity of the base
            b, x = insts[0]
            if x != 0 or len(base_glyphs[b][0]) != cw:
                raise Jbig2Error(
                    "single-instance composite must be [(base, 0)]"
                )
            bw.write(code_len, base_id[b])
            t_b15.encode(bw, 0)  # RDX
            t_b15.encode(bw, 0)  # RDY
            identity_refinement_codeword(base_glyphs[b])
            continue
        # nested huffman text region: DT0=1/DT1=1 (B.11 cannot code 0)
        t_dt.encode(bw, 1)
        t_dt.encode(bw, 1)
        t_fs.encode(bw, insts[0][1])
        curs = None
        for j, (b, x) in enumerate(insts):
            if j > 0:
                t_ds.encode(bw, x - curs)
            bw.write(code_len, base_id[b])
            base = base_glyphs[b]
            if refine_in_aggregate and c == last_multi and j == len(insts) - 1:
                bw.write(1, 1)  # RI
                for _ in range(4):  # RDW RDH RDX RDY = 0 via B.15
                    t_b15.encode(bw, 0)
                identity_refinement_codeword(base)
            else:
                bw.write(1, 0)
            curs = x + len(base[0]) - 1
        # 6.4.5 strip-terminating OOB closes the final (only) strip; the
        # nested decoder consumes it to keep the shared bit reader in sync
        t_ds.encode(bw, None)
    t_dw.encode(bw, None)  # OOB closes the single height class
    t_ex.encode(bw, n_base)  # skip the input symbols
    t_ex.encode(bw, n_comp)  # export the composites
    sd_flags = 0x0003 | (1 << 12)  # SDHUFF | SDREFAGG | SDRTEMPLATE=1
    d2 = (
        sd_flags.to_bytes(2, "big")
        + n_comp.to_bytes(4, "big")
        + n_comp.to_bytes(4, "big")
        + bw.finish()
    )

    # --- page text region over the STANDARD selector path ------------------
    comp_id = {c: i for i, c in enumerate(order2)}
    strips = _group_strips(placements, transposed=False)
    t_code_len = max(max(n_comp - 1, 0).bit_length(), 1)
    bw = _HuffBitWriter()
    for r in range(35):  # 7.4.4.1.7 run-codes: one length used
        bw.write(4, 1 if r == t_code_len else 0)
    runtab = HuffTable([(1, 0, t_code_len, "n")])
    for _ in range(n_comp):
        runtab.encode(bw, t_code_len)
    bw.align()
    symtab = HuffTable([(t_code_len, 0, k, "n") for k in range(n_comp)])
    t_dt.encode(bw, 1)  # initial DT=1: STRIPT starts at -1
    stript = -1
    firsts = 0
    for t_coord in sorted(strips):
        t_dt.encode(bw, t_coord - stript)
        stript = t_coord
        insts = sorted(strips[t_coord])
        t_fs.encode(bw, insts[0][0] - firsts)
        firsts = insts[0][0]
        curs = None
        for j, (s_coord, c) in enumerate(insts):
            if j > 0:
                t_ds.encode(bw, s_coord - curs)
            symtab.encode(bw, comp_id[c])
            curs = s_coord + len(comp_bitmaps[c][0]) - 1
        t_ds.encode(bw, None)
    tr_flags = 0x0001 | (1 << 4)  # SBHUFF, TOPLEFT
    hflags = 0  # FS=B.6, DS=B.8, DT=B.11 — all standard selector 0
    tr = (
        _region_info(page_w, page_h)
        + tr_flags.to_bytes(2, "big")
        + hflags.to_bytes(2, "big")
        + len(placements).to_bytes(4, "big")
        + bw.finish()
    )

    return (
        _seg_with_refs(0, 48, 1, _page_info(page_w, page_h))
        + _seg_with_refs(1, 0, 1, d1)
        + _seg_with_refs(2, 0, 1, d2, refs=(1,))
        + _seg_with_refs(3, 6, 1, tr, refs=(2,))
        + _seg_with_refs(4, 49, 1, b"")
    )


def jbig2_encode_symbol_text(
    glyphs: list[list[bytes]],
    placements: list[tuple[int, int, int]],
    page_w: int,
    page_h: int,
    template: int = 0,
    transposed: bool = False,
) -> bytes:
    """Symbol-mode fixture producer (the profile real scanned PDFs ship):
    page info + arithmetic symbol dictionary (type 0) + immediate text
    region (type 6, TOPLEFT corner, SBSTRIPS=1) + end-of-page.

    ``glyphs``: distinct bitmaps (rows of 0/1 bytes). ``placements``:
    (glyph_index, x, y) with (x, y) the TOP-LEFT pixel of the instance on
    the page. Emits the height-class structure of 6.5.5 and the strip walk
    of 6.4.5 through the shared emitters."""
    if not glyphs or not placements:
        raise Jbig2Error("symbol-mode encoder needs glyphs and placements")

    # --- symbol dictionary: order symbols by (height, first-use) ---------
    order = sorted(range(len(glyphs)), key=lambda g: (len(glyphs[g]), g))
    new_id = {g: i for i, g in enumerate(order)}
    mq = MQEncoder()
    cx_gb = [[0, 0] for _ in range(1 << len(_TEMPLATES[template]))]
    _emit_dict_classes(
        mq, order, glyphs,
        lambda g, gl, w, h: _generic_encode_into(
            mq, cx_gb, gl, w, h, tpgdon=False, template=template
        ),
    )
    _emit_export_runs(mq, 0, len(order))
    at = b"".join(bytes([x & 0xFF, y & 0xFF]) for x, y in _NOMINAL_AT[template])
    sd_flags = (template << 10)  # SDHUFF=0, SDREFAGG=0
    sd_body = (
        sd_flags.to_bytes(2, "big") + at
        + len(order).to_bytes(4, "big")   # SDNUMEXSYMS
        + len(order).to_bytes(4, "big")   # SDNUMNEWSYMS
        + mq.flush()
    )

    # --- text region ------------------------------------------------------
    code_len = max(len(order) - 1, 0).bit_length()
    mq = MQEncoder()
    iaid = _iaid_ctx(code_len)

    def emit_instance(g: int) -> int:
        gl = glyphs[g]
        arith_iaid_encode(mq, iaid, new_id[g], code_len)
        # decode advances S by width (or height when transposed)
        return len(gl) if transposed else (len(gl[0]) if gl else 0)

    _emit_strip_walk(mq, _group_strips(placements, transposed), emit_instance)
    tr_flags = (1 << 4) | ((1 << 6) if transposed else 0)  # TOPLEFT corner
    tr_body = (
        _region_info(page_w, page_h) + tr_flags.to_bytes(2, "big")
        + len(placements).to_bytes(4, "big")
        + mq.flush()
    )

    return (
        _seg_with_refs(0, 48, 1, _page_info(page_w, page_h))
        + _seg_with_refs(1, 0, 1, sd_body)
        + _seg_with_refs(2, 6, 1, tr_body, refs=(1,))
        + _seg_with_refs(3, 49, 1, b"")
    )
