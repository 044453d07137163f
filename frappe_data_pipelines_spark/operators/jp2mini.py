"""JPEG 2000 (ISO/IEC 15444-1 / ITU-T T.800) — reversible AND lossy profiles.

The last scanned-page encoding the A10 raster path did not speak:
``/JPXDecode`` image XObjects (reference dispatch surface:
``fdp/services/text_extraction.py`` routes scanned pages through OCR; the
PDF spec allows JPX-coded rasters there). Stdlib-only, both directions, so
fixtures need no external encoder:

* **5/3 reversible integer wavelet** (lifting with symmetric extension,
  arbitrary dimensions, NL decomposition levels) — exact round-trip;
* **9/7 irreversible wavelet** (CDF 9/7 float lifting per T.800 F.4.8:
  the four α/β/γ/δ steps + K scaling) with **scalar-expounded
  quantization** (QCD style 2, per-subband (ε, μ) 16-bit values,
  Δ_b = 2^(R_b−ε_b)·(1+μ_b/2¹¹), midpoint r=½ reconstruction) — the
  lossy profile real scanners emit;
* **multi-component color**: 1 or 3 components, with the **ICT**
  (irreversible YCbCr, used with 9/7) and **RCT** (reversible
  integer transform, exact with 5/3) component transforms per T.800
  G.2/G.3, LRCP packet progression over resolution→component;
* **EBCOT Tier-1** code-block coder: bit-plane coding with the three pass
  types (significance propagation, magnitude refinement, cleanup with
  run-length mode), 19 MQ contexts over the shared T.88 arithmetic coder
  from ``operators/jbig2mini`` (JBIG2 and JPEG 2000 specify the same MQ
  coder; reusing it means the coder itself is already round-trip- and
  fixture-proven);
* **Tier-2**: full 2-D TAG TREES (B.10.2 quad-tree pyramids for
  inclusion + zero-bitplanes) over **multi-code-block subband grids**
  (the OpenJPEG-default layout for untiled full pages), packet headers
  with 0xFF bit-stuffing, LRCP progression, default precincts, and
  **multiple quality layers** (first-inclusion tag-tree + single-bit
  re-inclusion signaling, per-layer pass counts and segment lengths over
  one contiguous MQ stream);
* **multi-tile grids**: SOT/SOD tile-parts over a row-major grid with
  clipped edge tiles (Psot-framed, Isot-indexed), seam-exact on
  lossless and error-bounded on 9/7; **multiple tile-parts per tile**
  (TPsot-ordered segments concatenated per A.4.2's whole-packets rule);
* **scalar-derived quantization** (QCD style 1, one (ε₀, μ₀) expanded
  per T.800 E-5: ε_b = ε₀ + 1 − r for detail resolution r, μ_b = μ₀)
  alongside the expounded style-2 profile;
* **codestream syntax**: SOC/SIZ/COD/QCD/SOT/SOD/EOC markers, plus the
  JP2 box wrapper (``jp2c`` unwrap) PDFs may embed.

Scope honesty: no subsampling, no precinct subdivision, no ROI, no
coder options (bypass/reset/termall/causal), no >3-component, signed, or
mixed-depth images; unsigned depths 1..16 ARE supported (round 10: Ssiz
parse, depth-scaled DC level shift and quantization range budgets,
``jp2_decode`` normalizes to 8-bit while ``jp2_decode_raw`` returns
native precision). Out-of-profile streams raise ``Jp2Error`` and the PDF
dispatch falls back exactly like any other unsupported filter. The EBCOT
context-formation tables follow the spec's Table D.1-D.4 as published;
encoder and decoder share one context builder, and the whole path is
validated by exhaustive round-trip fuzzing (exact for reversible,
error-bounded for 9/7+quantization) plus the OCR integration fixtures
(same validation posture as the JBIG2 module — no external JPX encoder
exists in this environment).
"""

from __future__ import annotations

import struct

from frappe_data_pipelines_spark.operators.jbig2mini import MQDecoder, MQEncoder


class Jp2Error(ValueError):
    pass


# ---------------------------------------------------------------------------
# 5/3 reversible wavelet (lifting, symmetric extension)
# ---------------------------------------------------------------------------


def _ext(x: list, i: int) -> int:
    """Symmetric extension without boundary repetition (mirror on the
    boundary sample): E(-1) = x[1], E(n) = x[n-2]."""
    n = len(x)
    if i < 0:
        i = -i
    if i >= n:
        i = 2 * n - 2 - i
    return x[i]


def _fwd53(x: list) -> tuple[list, list]:
    """One 1-D level: returns (low, high) subband samples."""
    n = len(x)
    if n == 1:
        return list(x), []
    y = list(x)
    for i in range(1, n, 2):  # predict (high-pass at odd positions)
        y[i] = x[i] - ((_ext(x, i - 1) + _ext(x, i + 1)) >> 1)
    for i in range(0, n, 2):  # update (low-pass at even positions)
        y[i] = x[i] + ((_ext(y, i - 1) + _ext(y, i + 1) + 2) >> 2)
    return y[0::2], y[1::2]


def _inv53(low: list, high: list) -> list:
    n = len(low) + len(high)
    if n == 1:
        return list(low)
    y = [0] * n
    y[0::2] = low
    y[1::2] = high
    x = list(y)
    for i in range(0, n, 2):
        x[i] = y[i] - ((_ext(y, i - 1) + _ext(y, i + 1) + 2) >> 2)
    for i in range(1, n, 2):
        x[i] = y[i] + ((_ext(x, i - 1) + _ext(x, i + 1)) >> 1)
    return x


# 9/7 irreversible lifting constants (T.800 F.4.8.2, CDF 9/7)
_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001


def _fwd97(x: list) -> tuple[list, list]:
    """One 1-D irreversible level: four lifting steps + K scaling. In-place
    over alternating parities is safe — each step's neighbors are the other
    parity, already in their post-previous-step state, exactly the spec's
    sequential formulation."""
    n = len(x)
    if n == 1:
        return [float(x[0])], []
    y = [float(v) for v in x]
    for i in range(1, n, 2):
        y[i] += _A97 * (_ext(y, i - 1) + _ext(y, i + 1))
    for i in range(0, n, 2):
        y[i] += _B97 * (_ext(y, i - 1) + _ext(y, i + 1))
    for i in range(1, n, 2):
        y[i] += _G97 * (_ext(y, i - 1) + _ext(y, i + 1))
    for i in range(0, n, 2):
        y[i] += _D97 * (_ext(y, i - 1) + _ext(y, i + 1))
    return [v / _K97 for v in y[0::2]], [v * _K97 for v in y[1::2]]


def _inv97(low: list, high: list) -> list:
    n = len(low) + len(high)
    if n == 1:
        return [float(v) for v in low]
    y = [0.0] * n
    y[0::2] = [v * _K97 for v in low]
    y[1::2] = [v / _K97 for v in high]
    for i in range(0, n, 2):
        y[i] -= _D97 * (_ext(y, i - 1) + _ext(y, i + 1))
    for i in range(1, n, 2):
        y[i] -= _G97 * (_ext(y, i - 1) + _ext(y, i + 1))
    for i in range(0, n, 2):
        y[i] -= _B97 * (_ext(y, i - 1) + _ext(y, i + 1))
    for i in range(1, n, 2):
        y[i] -= _A97 * (_ext(y, i - 1) + _ext(y, i + 1))
    return y


def _dwt_forward(rows: list[list], levels: int, f1d) -> list[dict]:
    """Full 2-D decomposition with ``f1d`` as the 1-D split. Returns
    subbands outer-to-inner: [{lvl, 'HL': m, 'LH': m, 'HH': m}, ...,
    {'LL': m}] where each m is a row-list matrix (possibly 0-sized on
    degenerate dims)."""
    ll = [list(r) for r in rows]
    out: list[dict] = []
    for lvl in range(levels):
        h = len(ll)
        w = len(ll[0]) if h else 0
        if h <= 1 and w <= 1:
            break
        # columns first or rows first is a convention; rows then columns
        lows, highs = [], []
        for r in ll:
            lo, hi = f1d(r)
            lows.append(lo)
            highs.append(hi)
        # vertical transform on each half
        def vsplit(mat):
            if not mat or not mat[0]:
                return [m for m in ([], [])]
            cols = list(zip(*mat))
            lo_c, hi_c = [], []
            for c in cols:
                lo, hi = f1d(list(c))
                lo_c.append(lo)
                hi_c.append(hi)
            lo_m = [list(r) for r in zip(*lo_c)] if lo_c and lo_c[0] else []
            hi_m = [list(r) for r in zip(*hi_c)] if hi_c and hi_c[0] else []
            return lo_m, hi_m

        ll_m, lh_m = vsplit(lows)   # low-horizontal → LL / LH (vert high)
        hl_m, hh_m = vsplit(highs)  # high-horizontal → HL / HH
        out.append({"lvl": lvl, "HL": hl_m, "LH": lh_m, "HH": hh_m})
        ll = ll_m
    out.append({"LL": ll})
    return out


def _dwt_inverse(bands: list[dict], i1d) -> list[list]:
    ll = [list(r) for r in bands[-1]["LL"]]
    for d in reversed(bands[:-1]):
        hl_m, lh_m, hh_m = d["HL"], d["LH"], d["HH"]

        def vjoin(lo_m, hi_m):
            lo_c = list(zip(*lo_m)) if lo_m and lo_m[0] else [() for _ in range(len(hi_m[0]) if hi_m and hi_m[0] else 0)]
            hi_c = list(zip(*hi_m)) if hi_m and hi_m[0] else [() for _ in range(len(lo_m[0]) if lo_m and lo_m[0] else 0)]
            ncols = max(len(lo_c), len(hi_c))
            cols = []
            for i in range(ncols):
                lo = list(lo_c[i]) if i < len(lo_c) else []
                hi = list(hi_c[i]) if i < len(hi_c) else []
                cols.append(i1d(lo, hi))
            return [list(r) for r in zip(*cols)] if cols and cols[0] else []

        lows = vjoin(ll, lh_m)
        highs = vjoin(hl_m, hh_m)
        rows = []
        for i in range(max(len(lows), len(highs))):
            lo = lows[i] if i < len(lows) else []
            hi = highs[i] if i < len(highs) else []
            rows.append(i1d(lo, hi))
        ll = rows
    return ll


def dwt53_forward(rows: list[list[int]], levels: int) -> list[dict]:
    return _dwt_forward(rows, levels, _fwd53)


def dwt53_inverse(bands: list[dict]) -> list[list[int]]:
    return _dwt_inverse(bands, _inv53)


def dwt97_forward(rows: list[list], levels: int) -> list[dict]:
    return _dwt_forward(rows, levels, _fwd97)


def dwt97_inverse(bands: list[dict]) -> list[list[float]]:
    return _dwt_inverse(bands, _inv97)


# ---------------------------------------------------------------------------
# Component transforms (T.800 G.2 RCT / G.3 ICT) and scalar quantization
# ---------------------------------------------------------------------------


def _rct_forward(comps: list[list[list[int]]]) -> list[list[list[int]]]:
    """Reversible color transform on DC-shifted integer planes."""
    r_p, g_p, b_p = comps
    y_p, u_p, v_p = [], [], []
    for rr, gr, br in zip(r_p, g_p, b_p):
        y_p.append([(r + 2 * g + b) >> 2 for r, g, b in zip(rr, gr, br)])
        u_p.append([b - g for g, b in zip(gr, br)])
        v_p.append([r - g for r, g in zip(rr, gr)])
    return [y_p, u_p, v_p]


def _rct_inverse(comps: list[list[list[int]]]) -> list[list[list[int]]]:
    y_p, u_p, v_p = comps
    r_p, g_p, b_p = [], [], []
    for yr, ur, vr in zip(y_p, u_p, v_p):
        gr = [y - ((u + v) >> 2) for y, u, v in zip(yr, ur, vr)]
        r_p.append([v + g for v, g in zip(vr, gr)])
        g_p.append(gr)
        b_p.append([u + g for u, g in zip(ur, gr)])
    return [r_p, g_p, b_p]


def _ict_forward(comps: list[list[list[int]]]) -> list[list[list[float]]]:
    """Irreversible color transform (YCbCr) on DC-shifted planes."""
    r_p, g_p, b_p = comps
    y_p, cb_p, cr_p = [], [], []
    for rr, gr, br in zip(r_p, g_p, b_p):
        y_p.append([0.299 * r + 0.587 * g + 0.114 * b
                    for r, g, b in zip(rr, gr, br)])
        cb_p.append([-0.168736 * r - 0.331264 * g + 0.5 * b
                     for r, g, b in zip(rr, gr, br)])
        cr_p.append([0.5 * r - 0.418688 * g - 0.081312 * b
                     for r, g, b in zip(rr, gr, br)])
    return [y_p, cb_p, cr_p]


def _ict_inverse(comps: list[list[list[float]]]) -> list[list[list[float]]]:
    y_p, cb_p, cr_p = comps
    r_p, g_p, b_p = [], [], []
    for yr, cbr, crr in zip(y_p, cb_p, cr_p):
        r_p.append([y + 1.402 * cr for y, cr in zip(yr, crr)])
        g_p.append([y - 0.344136 * cb - 0.714136 * cr
                    for y, cb, cr in zip(yr, cbr, crr)])
        b_p.append([y + 1.772 * cb for y, cb in zip(yr, cbr)])
    return [r_p, g_p, b_p]


_BAND_GAIN = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}


def _step_to_eps_mu(step: float, rb: int) -> tuple[int, int]:
    """(ε_b, μ_b) whose reconstructed Δ_b = 2^(R_b−ε_b)·(1+μ_b/2¹¹) is the
    closest representable value to ``step`` (E.1.1). The encoder MUST then
    quantize with the reconstructed Δ, not with ``step``, so both sides use
    the identical step."""
    import math

    if step <= 0:
        raise Jp2Error("quantization step must be positive")
    e = math.floor(math.log2(step))
    mu = round((step / (2.0 ** e) - 1.0) * 2048)
    if mu >= 2048:
        e += 1
        mu = 0
    eps = rb - e
    if not (0 <= eps <= 31) or not (0 <= mu <= 2047):
        raise Jp2Error(f"quantization step {step} out of signalable range")
    return eps, mu


def _qdelta(eps: int, mu: int, rb: int) -> float:
    return (2.0 ** (rb - eps)) * (1.0 + mu / 2048.0)


def _quantize(mat: list[list[float]], delta: float) -> list[list[int]]:
    return [
        [int(abs(c) / delta) * (1 if c >= 0 else -1) for c in row]
        for row in mat
    ]


def _dequantize(mat: list[list[int]], delta: float) -> list[list[float]]:
    # midpoint reconstruction (r = 1/2), the canonical decoder choice
    return [
        [0.0 if q == 0 else (abs(q) + 0.5) * delta * (1 if q > 0 else -1)
         for q in row]
        for row in mat
    ]


# ---------------------------------------------------------------------------
# EBCOT Tier-1 contexts (Table D.1-D.4 shapes)
# ---------------------------------------------------------------------------

_CTX_RL = 17
_CTX_UNI = 18
_N_CTX = 19


def _fresh_contexts() -> list:
    cx = [[0, 0] for _ in range(_N_CTX)]
    cx[_CTX_UNI][0] = 46
    cx[_CTX_RL][0] = 3
    cx[0][0] = 4
    return cx


def _sig_ctx(h: int, v: int, d: int, band: str) -> int:
    """Significance-coding context (0-8) from neighbor counts."""
    if band == "HL":  # horizontally high-pass band: swap h/v roles
        h, v = v, h
    if band != "HH":
        if h == 2:
            return 8
        if h == 1:
            return 7 if v >= 1 else (6 if d >= 1 else 5)
        if v == 2:
            return 4
        if v == 1:
            return 3
        return 2 if d >= 2 else d  # d in {0,1} → ctx 0/1
    # HH: diagonal-primary
    if d >= 3:
        return 8
    hv = h + v
    if d == 2:
        return 7 if hv >= 1 else 6
    if d == 1:
        return 5 if hv >= 2 else (4 if hv == 1 else 3)
    return 2 if hv >= 2 else hv  # hv in {0,1} → ctx 0/1


_SIGN_TABLE = {
    (1, 1): (13, 0), (1, 0): (12, 0), (1, -1): (11, 0),
    (0, 1): (10, 0), (0, 0): (9, 0), (0, -1): (10, 1),
    (-1, 1): (11, 1), (-1, 0): (12, 1), (-1, -1): (13, 1),
}


class _Block:
    """Shared encoder/decoder state for one code-block."""

    def __init__(self, w: int, h: int, band: str):
        self.w, self.h, self.band = w, h, band
        n = w * h
        self.sigma = [0] * n      # significant
        self.sign = [0] * n       # 1 = negative (valid once significant)
        self.visited = [0] * n    # coded in current plane's SPP
        self.refined = [0] * n    # has had ≥1 magnitude refinement

    def _sig(self, x: int, y: int) -> int:
        if 0 <= x < self.w and 0 <= y < self.h:
            return self.sigma[y * self.w + x]
        return 0

    def _sgn(self, x: int, y: int) -> int:
        """+1 / -1 / 0 contribution of a neighbor for sign coding."""
        if 0 <= x < self.w and 0 <= y < self.h and self.sigma[y * self.w + x]:
            return -1 if self.sign[y * self.w + x] else 1
        return 0

    def counts(self, x: int, y: int) -> tuple[int, int, int]:
        h = self._sig(x - 1, y) + self._sig(x + 1, y)
        v = self._sig(x, y - 1) + self._sig(x, y + 1)
        d = (
            self._sig(x - 1, y - 1) + self._sig(x + 1, y - 1)
            + self._sig(x - 1, y + 1) + self._sig(x + 1, y + 1)
        )
        return h, v, d

    def sign_ctx(self, x: int, y: int) -> tuple[int, int]:
        hc = self._sgn(x - 1, y) + self._sgn(x + 1, y)
        vc = self._sgn(x, y - 1) + self._sgn(x, y + 1)
        hc = max(-1, min(1, hc))
        vc = max(-1, min(1, vc))
        return _SIGN_TABLE[(hc, vc)]

    def magref_ctx(self, x: int, y: int) -> int:
        if self.refined[y * self.w + x]:
            return 16
        h, v, d = self.counts(x, y)
        return 15 if (h + v + d) > 0 else 14

    def stripes(self):
        """Scan order: stripes of 4 rows, column-major inside a stripe."""
        for y0 in range(0, self.h, 4):
            for x in range(self.w):
                for y in range(y0, min(y0 + 4, self.h)):
                    yield x, y, y0


def t1_encode_block(coefs: list[list[int]], band: str) -> tuple[bytes, int, int]:
    """Encode one code-block. Returns (data, n_planes, n_passes)."""
    h = len(coefs)
    w = len(coefs[0]) if h else 0
    mag = [abs(c) for row in coefs for c in row]
    neg = [1 if c < 0 else 0 for row in coefs for c in row]
    planes = max(mag).bit_length() if mag and max(mag) else 0
    if planes == 0:
        return b"", 0, 0
    st = _Block(w, h, band)
    mq = MQEncoder()
    cx = _fresh_contexts()

    def code_sign(i, x, y):
        ctx, xor = st.sign_ctx(x, y)
        mq.encode(cx[ctx], neg[i] ^ xor)
        st.sign[i] = neg[i]

    n_passes = 0
    for p in range(planes - 1, -1, -1):
        first = p == planes - 1
        bit = lambda i: (mag[i] >> p) & 1  # noqa: E731
        if not first:
            # significance propagation
            for x, y, _y0 in st.stripes():
                i = y * w + x
                st.visited[i] = 0
                if st.sigma[i]:
                    continue
                hh, vv, dd = st.counts(x, y)
                if hh + vv + dd == 0:
                    continue
                st.visited[i] = 1
                mq.encode(cx[_sig_ctx(hh, vv, dd, band)], bit(i))
                if bit(i):
                    code_sign(i, x, y)
                    st.sigma[i] = 1
            n_passes += 1
            # magnitude refinement: refines samples significant at the START
            # of this plane — SPP arrivals of this plane carry visited=1 and
            # are skipped
            for x, y, _y0 in st.stripes():
                i = y * w + x
                if st.sigma[i] and not st.visited[i]:
                    mq.encode(cx[st.magref_ctx(x, y)], bit(i))
                    st.refined[i] = 1
            n_passes += 1
        # cleanup
        x = y = 0
        col_iter = []
        for y0 in range(0, h, 4):
            for x in range(w):
                col_iter.append((x, y0))
        for x, y0 in col_iter:
            y = y0
            span = min(4, h - y0)
            # run-length mode: full 4-high column, all insignificant,
            # all zero-context, none visited
            def rl_ok():
                if span != 4:
                    return False
                for yy in range(y0, y0 + 4):
                    i = yy * w + x
                    if st.sigma[i] or st.visited[i]:
                        return False
                    hh, vv, dd = st.counts(x, yy)
                    if hh + vv + dd:
                        return False
                return True

            if rl_ok():
                r = next(
                    (k for k in range(4) if bit((y0 + k) * w + x)), None
                )
                if r is None:
                    mq.encode(cx[_CTX_RL], 0)
                    continue
                mq.encode(cx[_CTX_RL], 1)
                mq.encode(cx[_CTX_UNI], (r >> 1) & 1)
                mq.encode(cx[_CTX_UNI], r & 1)
                i = (y0 + r) * w + x
                code_sign(i, x, y0 + r)
                st.sigma[i] = 1
                start = r + 1
            else:
                start = 0
            for k in range(start, span):
                yy = y0 + k
                i = yy * w + x
                if st.sigma[i] or st.visited[i]:
                    continue
                hh, vv, dd = st.counts(x, yy)
                mq.encode(cx[_sig_ctx(hh, vv, dd, band)], bit(i))
                if bit(i):
                    code_sign(i, x, yy)
                    st.sigma[i] = 1
        n_passes += 1
    return mq.flush(), planes, n_passes


def t1_decode_block(
    data: bytes, w: int, h: int, band: str, planes: int, n_passes: int
) -> list[list[int]]:
    """Decode one code-block back to signed coefficients."""
    if planes == 0:
        return [[0] * w for _ in range(h)]
    st = _Block(w, h, band)
    mag = [0] * (w * h)
    mq = MQDecoder(data)
    cx = _fresh_contexts()
    passes_done = 0

    def decode_sign(i, x, y):
        ctx, xor = st.sign_ctx(x, y)
        st.sign[i] = mq.decode(cx[ctx]) ^ xor

    for p in range(planes - 1, -1, -1):
        first = p == planes - 1
        if not first:
            if passes_done >= n_passes:
                break
            for x, y, _y0 in st.stripes():
                i = y * w + x
                st.visited[i] = 0
                if st.sigma[i]:
                    continue
                hh, vv, dd = st.counts(x, y)
                if hh + vv + dd == 0:
                    continue
                st.visited[i] = 1
                if mq.decode(cx[_sig_ctx(hh, vv, dd, band)]):
                    decode_sign(i, x, y)
                    st.sigma[i] = 1
                    mag[i] |= 1 << p
            passes_done += 1
            if passes_done >= n_passes:
                break
            for x, y, _y0 in st.stripes():
                i = y * w + x
                if st.sigma[i] and not st.visited[i]:
                    if mq.decode(cx[st.magref_ctx(x, y)]):
                        mag[i] |= 1 << p
                    st.refined[i] = 1
            passes_done += 1
            if passes_done >= n_passes:
                break
        for y0 in range(0, h, 4):
            for x in range(w):
                span = min(4, h - y0)

                def rl_ok():
                    if span != 4:
                        return False
                    for yy in range(y0, y0 + 4):
                        i = yy * w + x
                        if st.sigma[i] or st.visited[i]:
                            return False
                        hh, vv, dd = st.counts(x, yy)
                        if hh + vv + dd:
                            return False
                    return True

                if rl_ok():
                    if not mq.decode(cx[_CTX_RL]):
                        continue
                    r = (mq.decode(cx[_CTX_UNI]) << 1) | mq.decode(cx[_CTX_UNI])
                    i = (y0 + r) * w + x
                    decode_sign(i, x, y0 + r)
                    st.sigma[i] = 1
                    mag[i] |= 1 << p
                    start = r + 1
                else:
                    start = 0
                for k in range(start, span):
                    yy = y0 + k
                    i = yy * w + x
                    if st.sigma[i] or st.visited[i]:
                        continue
                    hh, vv, dd = st.counts(x, yy)
                    if mq.decode(cx[_sig_ctx(hh, vv, dd, band)]):
                        decode_sign(i, x, yy)
                        st.sigma[i] = 1
                        mag[i] |= 1 << p
        passes_done += 1
        if passes_done >= n_passes:
            break
    out = []
    for y in range(h):
        out.append(
            [
                -mag[y * w + x] if st.sign[y * w + x] else mag[y * w + x]
                for x in range(w)
            ]
        )
    return out


# ---------------------------------------------------------------------------
# Tag trees + header bit IO (0xFF stuffing)
# ---------------------------------------------------------------------------


class _HdrWriter:
    def __init__(self):
        self.out = bytearray()
        self.bits = 0
        self.nbits = 0

    def put(self, b: int) -> None:
        limit = 7 if self.out and self.out[-1] == 0xFF else 8
        self.bits = (self.bits << 1) | (b & 1)
        self.nbits += 1
        if self.nbits == limit:
            self.out.append(self.bits)
            self.bits = 0
            self.nbits = 0

    def put_int(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put((v >> i) & 1)

    def finish(self) -> bytes:
        if self.nbits:
            limit = 7 if self.out and self.out[-1] == 0xFF else 8
            self.out.append(self.bits << (limit - self.nbits))
            self.bits = 0
            self.nbits = 0
        if self.out and self.out[-1] == 0xFF:  # header must not end in FF
            self.out.append(0)
        return bytes(self.out)


class _HdrReader:
    def __init__(self, data: bytes, pos: int = 0, end: int | None = None):
        self.data = data
        self.pos = pos
        # hard stop: multi-tile streams must not let a corrupt tile-part's
        # packet headers silently consume the NEXT tile's bytes
        self.end = len(data) if end is None else min(end, len(data))
        self.bits = 0
        self.nbits = 0
        self.prev_ff = False

    def get(self) -> int:
        if self.nbits == 0:
            if self.pos >= self.end:
                raise Jp2Error("packet header overrun")
            b = self.data[self.pos]
            self.pos += 1
            if self.prev_ff:
                if b & 0x80:
                    raise Jp2Error("invalid stuffing after 0xFF")
                self.nbits = 7
            else:
                self.nbits = 8
            self.prev_ff = b == 0xFF
            self.bits = b
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def get_int(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get()
        return v

    def align(self) -> int:
        """Byte-align and return the next byte position (consuming the
        trailing-FF padding byte rule)."""
        self.nbits = 0
        if self.prev_ff:
            if self.pos < self.end and self.data[self.pos] == 0x00:
                self.pos += 1
            self.prev_ff = False
        return self.pos


class _TagTree:
    """2-D tag tree over an ncx x ncy code-block grid (T.800 B.10.2): a
    quad-tree pyramid whose internal values are the min of their children;
    each leaf query walks root -> leaf carrying the parent's lower bound as
    the child's floor. A 1x1 grid degenerates to the single-node 0*-then-1
    walk, bit-identical to the former single-code-block profile — streams
    from earlier encoders decode unchanged."""

    def __init__(self, ncx: int = 1, ncy: int = 1):
        self.ncx, self.ncy = ncx, ncy
        dims = [(ncx, ncy)]
        w_, h_ = ncx, ncy
        while w_ > 1 or h_ > 1:
            w_, h_ = (w_ + 1) // 2, (h_ + 1) // 2
            dims.append((w_, h_))
        self.dims = dims
        self.value = [[0] * (dw * dh) for dw, dh in dims]
        self.low = [[0] * (dw * dh) for dw, dh in dims]
        self.known = [[False] * (dw * dh) for dw, dh in dims]
        self._final = False

    def set(self, x: int, y: int, v: int) -> None:
        self.value[0][y * self.ncx + x] = v
        self._final = False

    def _finalize(self) -> None:
        for lvl in range(1, len(self.dims)):
            dw, dh = self.dims[lvl]
            cw, ch = self.dims[lvl - 1]
            for y in range(dh):
                for x in range(dw):
                    self.value[lvl][y * dw + x] = min(
                        self.value[lvl - 1][cy * cw + cx]
                        for dy in (0, 1) for dx in (0, 1)
                        if (cx := 2 * x + dx) < cw and (cy := 2 * y + dy) < ch
                    )
        self._final = True

    def leaf_known(self, x: int, y: int) -> bool:
        return self.known[0][y * self.ncx + x]

    def leaf_value(self, x: int, y: int) -> int:
        return self.value[0][y * self.ncx + x]

    def encode(self, w: _HdrWriter, x: int, y: int, threshold: int) -> None:
        if not self._final:
            self._finalize()
        floor = 0
        for lvl in range(len(self.dims) - 1, -1, -1):
            dw = self.dims[lvl][0]
            i = (y >> lvl) * dw + (x >> lvl)
            if self.low[lvl][i] < floor:
                self.low[lvl][i] = floor
            while not self.known[lvl][i] and self.low[lvl][i] < threshold:
                if self.low[lvl][i] == self.value[lvl][i]:
                    w.put(1)
                    self.known[lvl][i] = True
                else:
                    w.put(0)
                    self.low[lvl][i] += 1
            floor = self.low[lvl][i]

    def decode(self, r: _HdrReader, x: int, y: int, threshold: int) -> bool:
        floor = 0
        for lvl in range(len(self.dims) - 1, -1, -1):
            dw = self.dims[lvl][0]
            i = (y >> lvl) * dw + (x >> lvl)
            if self.low[lvl][i] < floor:
                self.low[lvl][i] = floor
            while not self.known[lvl][i] and self.low[lvl][i] < threshold:
                if r.get():
                    self.known[lvl][i] = True
                    self.value[lvl][i] = self.low[lvl][i]
                else:
                    self.low[lvl][i] += 1
            floor = self.low[lvl][i]
        i = y * self.ncx + x
        return self.known[0][i] and self.value[0][i] < threshold


def _passes_codeword(w: _HdrWriter, n: int) -> None:
    if n == 1:
        w.put(0)
    elif n == 2:
        w.put(1)
        w.put(0)
    elif 3 <= n <= 5:
        w.put(1)
        w.put(1)
        w.put_int(n - 3, 2)
    elif 6 <= n <= 36:
        w.put_int(0b1111, 4)
        w.put_int(n - 6, 5)
    elif 37 <= n <= 164:
        w.put_int(0b111111111, 9)
        w.put_int(n - 37, 7)
    else:
        raise Jp2Error(f"cannot signal {n} passes")


def _passes_read(r: _HdrReader) -> int:
    if not r.get():
        return 1
    if not r.get():
        return 2
    v = r.get_int(2)
    if v < 3:
        return 3 + v
    v = r.get_int(5)
    if v < 31:
        return 6 + v
    return 37 + r.get_int(7)


# ---------------------------------------------------------------------------
# Codestream (single tile, single gray component, one layer, LRCP)
# ---------------------------------------------------------------------------

_GUARD_BITS = 2

# Decode-size guard (mirrors jbig2mini._MAX_PIXELS): crawl payloads reach
# this decoder via multimodal._real_decode and pdfmini /JPXDecode, where
# only Jp2Error dead-letters — a hostile SIZ header must raise, not
# allocate. Caps total pixels-times-components and the tile-grid size.
_MAX_PIXELS = 1 << 26
def _cb_exponents(band_shapes: list[tuple[int, int]]) -> tuple[int, int]:
    """Pick (xcb, ycb): just large enough for the biggest band when that
    fits the spec's limits (each in [2,10], sum ≤ 12 — rectangular blocks
    like 128×32 are legal and fit wide-short scans), else shrink toward a
    64×64-style grid and let the band split into MULTIPLE code-blocks
    (tag-tree-signalled packets, the OpenJPEG-default layout)."""
    max_w = max((w for _h, w in band_shapes), default=1)
    max_h = max((h for h, _w in band_shapes), default=1)
    xcb = max(2, min(10, (max_w - 1).bit_length()))
    ycb = max(2, min(10, (max_h - 1).bit_length()))
    while xcb + ycb > 12:
        if xcb >= ycb:
            xcb -= 1
        else:
            ycb -= 1
    return xcb, ycb


def _coef_bits(band: str, base: int = 8) -> int:
    """Reversible-profile per-band exponent budget: ``base`` magnitude bits
    (8 for plain 8-bit planes, 9 for RCT chroma whose range doubles) + the
    subband's transform gain + 1 headroom bit. The encoder checks actual
    magnitudes against the budget; the decoder recovers Mb = G + eps - 1
    straight from the QCD segment, so both sides agree by construction."""
    return base + _BAND_GAIN[band] + 1


def _res_band_names(levels: int) -> list[list[str]]:
    """Band names per resolution in packet order: res 0 is LL, each further
    resolution is that level's HL/LH/HH (inner level first)."""
    return [["LL"]] + [["HL", "LH", "HH"] for _ in range(levels)]


def _tile_res_bands(
    tw: int, th: int, levels: int
) -> list[list[tuple[str, int, int]]]:
    """Per-resolution (name, bh, bw) shapes for one tile — the ONE place
    the band-ordering convention lives (encoder and decoder both call it).
    The shape walk only depends on dims (5/3 and 9/7 share the lifting
    geometry), so a single integer zero pass serves both transforms."""
    bands = dwt53_forward([[0] * tw for _ in range(th)], levels)
    ll = bands[-1]["LL"]
    res: list[list[tuple[str, int, int]]] = [
        [("LL", len(ll), len(ll[0]) if ll else 0)]
    ]
    for d in reversed(bands[:-1]):
        res.append(
            [(n, len(d[n]), len(d[n][0]) if d[n] else 0) for n in ("HL", "LH", "HH")]
        )
    return res


def jp2_encode(
    comps: list[list],
    levels: int = 2,
    irreversible: bool = False,
    step: float = 0.5,
    mct: bool = True,
    tile_size: tuple[int, int] | None = None,
    n_layers: int = 1,
    derived_quant: bool = False,
    tile_parts: int = 1,
    depth: int = 8,
) -> bytes:
    """Unsigned planes -> raw JPEG 2000 codestream.

    ``comps`` is 1 (gray) or 3 (RGB) planes of equal dims, each a list of
    rows (bytes or int lists). ``depth`` (1..16, round 10) sets the
    unsigned sample precision: Ssiz = depth-1, the DC level shift is
    2^(depth-1), and every quantization range budget scales with it. ``irreversible=False`` -> 5/3 reversible,
    exact (with the RCT when 3 components and ``mct``). ``irreversible=True``
    -> 9/7 wavelet + scalar-expounded quantization with step ``step`` (in
    units of one gray level; with the ICT when 3 components and ``mct``).
    ``tile_size=(tw, th)`` splits the image into a tile grid (one SOT/SOD
    tile-part per tile, row-major, edge tiles clipped) — the layout real
    scanners use for large pages; None = single tile. ``n_layers`` splits
    every code-block's coding passes across that many quality layers
    (inclusion tag-tree first-layer signaling, single-bit inclusion
    afterwards, per-layer pass counts and segment lengths). The split is
    even by passes and bytes — valid for any full decode; truncation-
    optimal rate allocation is an encoder quality concern outside this
    profile's scope.
    """
    if not 1 <= n_layers <= 0xFFFF:
        raise Jp2Error("layer count must fit the COD u16 field")
    if not 1 <= depth <= 16:
        raise Jp2Error("depth must be 1..16 (unsigned)")
    ncomp = len(comps)
    if ncomp not in (1, 3):
        raise Jp2Error("only 1- or 3-component images supported")
    h = len(comps[0])
    w = len(comps[0][0]) if h else 0
    if not (h and w):
        raise Jp2Error("empty image")
    for c in comps:
        if len(c) != h or any(len(r) != w for r in c):
            raise Jp2Error("component dims disagree")
    if tile_size is None:
        xt, yt = w, h
    else:
        xt, yt = tile_size
        if xt <= 0 or yt <= 0:
            raise Jp2Error("tile dims must be positive")
    half = 1 << (depth - 1)
    shifted = [[[px - half for px in row] for row in c] for c in comps]
    use_mct = mct and ncomp == 3
    if use_mct:
        # the component transforms are pointwise, so applying them globally
        # and slicing per tile equals the spec's per-tile application
        planes_in = _ict_forward(shifted) if irreversible else _rct_forward(shifted)
    else:
        planes_in = shifted
    # shared QCD budget: RCT chroma doubles the range -> one extra bit for
    # every band (the QCD applies to all components alike in this profile)
    base_bits = depth + (1 if (use_mct and not irreversible) else 0)
    fwd = dwt97_forward if irreversible else dwt53_forward

    # one zero-plane shape pass on the NOMINAL tile: _dwt_forward's
    # early-stop depends only on dims, so the 5/3 walk both clamps the
    # signalled level count AND yields the band shapes for the code-block
    # exponents (degenerate edge tiles may stop even earlier — per tile)
    nom_w, nom_h = min(xt, w), min(yt, h)
    nom_res = _tile_res_bands(nom_w, nom_h, levels)
    levels = len(nom_res) - 1
    xcb, ycb = _cb_exponents(
        [(bh, bw) for bandlist in nom_res for _n, bh, bw in bandlist]
    )

    if derived_quant and not irreversible:
        raise Jp2Error("derived quantization applies to 9/7 streams only")
    if not 1 <= tile_parts <= 255:
        raise Jp2Error("tile_parts must fit the u8 TPsot/TNsot fields")
    # per-band quantization table in packet/QCD order
    qtab: list[tuple[int, int, int]] = []  # (eps, mu, rb)
    if derived_quant:
        # style 1: signal ONE (eps0, mu0); every band's exponent derives
        # from it (E-5: eps0 for LL, eps0 + 1 - r for detail resolution r).
        # The encoder quantizes with the SAME derived table the decoder
        # will reconstruct, so both sides agree by construction.
        eps0, mu0 = _step_to_eps_mu(step, depth + _BAND_GAIN["LL"])
        if eps0 + 1 - levels < 0:
            raise Jp2Error(
                f"derived eps0 {eps0} underflows at {levels} levels — "
                "use a smaller step or fewer levels"
            )
    for r, names in enumerate(_res_band_names(levels)):
        for name in names:
            rb_bits = depth + _BAND_GAIN[name]
            if derived_quant:
                eps, mu = (eps0 if r == 0 else eps0 + 1 - r), mu0
            elif irreversible:
                eps, mu = _step_to_eps_mu(step, rb_bits)
            else:
                eps, mu = _coef_bits(name, base_bits), 0
            qtab.append((eps, mu, rb_bits))

    n_tx = (w + xt - 1) // xt
    n_ty = (h + yt - 1) // yt
    if n_tx * n_ty > 0xFFFF:
        raise Jp2Error(
            f"{n_tx * n_ty} tiles exceed the u16 Isot space — use larger tiles"
        )
    tile_parts_out = []
    for t_idx in range(n_tx * n_ty):
        ty, tx = divmod(t_idx, n_tx)
        x0, y0 = tx * xt, ty * yt
        tw, th = min(xt, w - x0), min(yt, h - y0)
        tile_planes = [
            [row[x0 : x0 + tw] for row in plane[y0 : y0 + th]]
            for plane in planes_in
        ]
        comp_res_bands: list[list[list[tuple[str, list]]]] = []
        for plane in tile_planes:
            bands = fwd(plane, levels)
            rb: list[list[tuple[str, list]]] = [[("LL", bands[-1]["LL"])]]
            for d in reversed(bands[:-1]):
                rb.append([("HL", d["HL"]), ("LH", d["LH"]), ("HH", d["HH"])])
            comp_res_bands.append(rb)
        n_res = len(comp_res_bands[0])

        # Tier-1 every code-block once (bands split into a cbw x cbh grid,
        # raster order), then plan each block's pass/byte split across the
        # quality layers (an even split — any split of the contiguous MQ
        # stream decodes identically in a full decode)
        cbw, cbh = 1 << xcb, 1 << ycb
        bands: dict[tuple[int, int, int], dict] = {}
        for r in range(n_res):
            qbase = 0 if r == 0 else 1 + 3 * (r - 1)
            for c in range(ncomp):
                for k, (name, mat) in enumerate(comp_res_bands[c][r]):
                    bh = len(mat)
                    bw = len(mat[0]) if bh else 0
                    if bh == 0 or bw == 0:
                        continue
                    eps, mu, rb_bits = qtab[qbase + k]
                    if irreversible:
                        qmat = _quantize(mat, _qdelta(eps, mu, rb_bits))
                    else:
                        qmat = mat
                    mb = _GUARD_BITS + eps - 1
                    ncx = (bw + cbw - 1) // cbw
                    ncy = (bh + cbh - 1) // cbh
                    incl = _TagTree(ncx, ncy)
                    zt = _TagTree(ncx, ncy)
                    blks = []
                    for by in range(ncy):
                        for bx in range(ncx):
                            sub = [
                                row[bx * cbw : bx * cbw + cbw]
                                for row in qmat[by * cbh : by * cbh + cbh]
                            ]
                            data, planes, n_passes = t1_encode_block(sub, name)
                            if planes > mb:
                                raise Jp2Error(
                                    "coefficient magnitude exceeds Mb budget"
                                )
                            total_p = max(n_passes, 1)
                            psplit = [
                                total_p * (i + 1) // n_layers
                                - total_p * i // n_layers
                                for i in range(n_layers)
                            ]
                            contrib = [i for i, pp in enumerate(psplit) if pp]
                            bsplit = [
                                len(data) * (i + 1) // len(contrib)
                                - len(data) * i // len(contrib)
                                for i in range(len(contrib))
                            ]
                            plan = {
                                lyr: (psplit[lyr], bsplit[i])
                                for i, lyr in enumerate(contrib)
                            }
                            incl.set(bx, by, contrib[0])
                            zt.set(bx, by, mb - planes)
                            blks.append({
                                "bx": bx, "by": by, "data": data,
                                "plan": plan, "included": False,
                                "lblock": 3, "off": 0,
                            })
                    bands[(r, c, k)] = {"incl": incl, "zt": zt, "blocks": blks}

        by_packet = {
            (r, c): [
                bands[(r, c, k)]
                for k in range(len(comp_res_bands[c][r]))
                if (r, c, k) in bands
            ]
            for r in range(n_res)
            for c in range(ncomp)
        }
        packets = []
        for lyr in range(n_layers):
            for r in range(n_res):
                for c in range(ncomp):
                    existing = by_packet[(r, c)]
                    hdr = _HdrWriter()
                    body = bytearray()
                    if not any(
                        lyr in b["plan"]
                        for band in existing for b in band["blocks"]
                    ):
                        hdr.put(0)  # empty packet this layer
                        packets.append(hdr.finish())
                        continue
                    hdr.put(1)
                    for band in existing:
                        for b in band["blocks"]:
                            here = lyr in b["plan"]
                            if b["included"]:
                                hdr.put(1 if here else 0)
                            else:
                                band["incl"].encode(hdr, b["bx"], b["by"], lyr + 1)
                            if not here:
                                continue
                            if not b["included"]:
                                b["included"] = True
                                t = 1
                                while not band["zt"].leaf_known(b["bx"], b["by"]):
                                    band["zt"].encode(hdr, b["bx"], b["by"], t)
                                    t += 1
                            p_l, n_bytes = b["plan"][lyr]
                            _passes_codeword(hdr, p_l)
                            nlen = b["lblock"] + (p_l.bit_length() - 1)
                            while n_bytes >= (1 << nlen):
                                hdr.put(1)
                                b["lblock"] += 1
                                nlen += 1
                            hdr.put(0)
                            hdr.put_int(n_bytes, nlen)
                            body += b["data"][b["off"] : b["off"] + n_bytes]
                            b["off"] += n_bytes
                    packets.append(hdr.finish() + bytes(body))
        # A.4.2: every tile-part holds WHOLE packets, so split on packet
        # boundaries — an even count split across the requested parts
        # (empty trailing parts are dropped; a tile always emits >= 1)
        n_tp = min(tile_parts, max(len(packets), 1))
        for tp in range(n_tp):
            lo = len(packets) * tp // n_tp
            hi = len(packets) * (tp + 1) // n_tp
            tp_data = b"".join(packets[lo:hi])
            # Psot spans SOT marker .. end of this part (12 + SOD + data)
            sot_body = struct.pack(
                ">HIBB", t_idx, 14 + len(tp_data), tp, n_tp
            )
            tile_parts_out.append(
                b"\xff\x90" + struct.pack(">H", 10) + sot_body
                + b"\xff\x93" + tp_data
            )

    # main header markers
    siz_body = struct.pack(
        ">HIIIIIIIIH", 0, w, h, 0, 0, xt, yt, 0, 0, ncomp
    ) + struct.pack(">BBB", depth - 1, 1, 1) * ncomp  # Ssiz, XRsiz=YRsiz=1
    siz = b"\xff\x51" + struct.pack(">H", 2 + len(siz_body)) + siz_body
    cod_body = struct.pack(
        ">BBHBBBBBB",
        0,      # Scod: no precincts/SOP/EPH
        0,      # progression LRCP
        n_layers,  # quality layers
        1 if use_mct else 0,  # MCT (ICT with 9/7, RCT with 5/3)
        levels,  # decomposition levels
        xcb - 2, ycb - 2,  # code-block exponents sized to the largest band
        0,      # code-block style
        0 if irreversible else 1,  # transform: 9/7 irreversible / 5/3
    )
    cod = b"\xff\x52" + struct.pack(">H", 2 + len(cod_body)) + cod_body
    if derived_quant:
        # QCD style 1 (scalar derived): guard bits + ONE 16-bit (eps0, mu0)
        qcd_body = bytes([(_GUARD_BITS << 5) | 1]) + struct.pack(
            ">H", (eps0 << 11) | mu0
        )
    elif irreversible:
        # QCD style 2 (scalar expounded): guard bits + 16-bit (eps, mu)
        # per subband in packet order
        qcd_body = bytes([(_GUARD_BITS << 5) | 2]) + b"".join(
            struct.pack(">H", (eps << 11) | mu) for eps, mu, _rb in qtab
        )
    else:
        # QCD style 0 (no quantization): one exponent byte per subband
        qcd_body = bytes([_GUARD_BITS << 5]) + bytes(
            [eps << 3 for eps, _mu, _rb in qtab]
        )
    qcd = b"\xff\x5c" + struct.pack(">H", 2 + len(qcd_body)) + qcd_body
    return (
        b"\xff\x4f" + siz + cod + qcd + b"".join(tile_parts_out) + b"\xff\xd9"
    )


def jp2_encode_gray(rows: list[bytes], levels: int = 2) -> bytes:
    """8-bit gray rows -> raw JPEG 2000 codestream (lossless)."""
    return jp2_encode([rows], levels=levels, irreversible=False, mct=False)


def _find_marker(data: bytes, pos: int) -> tuple[int, int, int]:
    if pos + 2 > len(data):
        raise Jp2Error("truncated codestream")
    if data[pos] != 0xFF:
        raise Jp2Error(f"expected marker at {pos}")
    m = data[pos + 1]
    if m in (0x4F, 0x93, 0xD9):  # SOC/SOD/EOC have no segment length
        return m, pos + 2, 0
    (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
    return m, pos + 4, ln - 2



def jp2_decode(payload: bytes) -> tuple[int, int, list[list[bytes]]]:
    """JPEG 2000 codestream (or JP2 box wrapper) -> (w, h, component rows)
    NORMALIZED TO 8-BIT bytes — what every raster consumer here (OCR,
    metadata, PDF page assembly) wants. Depths over 8 shift down; depths
    under 8 rescale to the full 0..255 range (exact integer rounding).
    ``jp2_decode_raw`` returns the native-precision samples + depth."""
    w, h, planes, depth = jp2_decode_raw(payload)
    out: list[list[bytes]] = []
    if depth == 8:
        out = [[bytes(r) for r in plane] for plane in planes]
    elif depth > 8:
        sh = depth - 8
        out = [[bytes(px >> sh for px in r) for r in plane] for plane in planes]
    else:
        top = (1 << depth) - 1
        out = [
            [bytes((px * 255 + top // 2) // top for px in r) for r in plane]
            for plane in planes
        ]
    return w, h, out


def jp2_decode_raw(payload: bytes) -> tuple[int, int, list[list[list[int]]], int]:
    """JPEG 2000 codestream (or JP2 box wrapper) -> (w, h, component rows
    as native-precision int lists, bit depth).

    Handles both in-profile stream families: 5/3 reversible with QCD
    style 0 (exact; with RCT when MCT is signalled) and 9/7 irreversible
    with QCD style 2 scalar-expounded quantization (midpoint
    reconstruction; with ICT when MCT is signalled), 1 or 3 components,
    unsigned depths 1..16 (Ssiz; round 10), single- or multi-tile (one
    tile-part per tile, row-major grid).
    """
    data = payload
    if data[:4] == b"\x00\x00\x00\x0c" and data[4:8] == b"jP  ":
        # JP2 file format: walk boxes to the jp2c codestream box
        pos = 0
        data = None
        while pos + 8 <= len(payload):
            (box_len,) = struct.unpack(">I", payload[pos : pos + 4])
            btype = payload[pos + 4 : pos + 8]
            if box_len == 0:
                box_len = len(payload) - pos
            if btype == b"jp2c":
                data = payload[pos + 8 : pos + box_len]
                break
            pos += max(box_len, 8)
        if data is None:
            raise Jp2Error("JP2 wrapper without jp2c box")
    if data[:2] != b"\xff\x4f":
        raise Jp2Error("not a JPEG 2000 codestream")
    pos = 2
    w = h = None
    xt = yt = None
    ncomp = 1
    n_layers = 1
    levels = None
    transform = None
    use_mct = False
    guard = _GUARD_BITS
    qstyle = 0
    qcd_eps: list[int] = []
    qcd_mu: list[int] = []
    qcd_base: tuple[int, int] | None = None  # style-1 (eps0, mu0)
    cb_w = cb_h = 64
    # isot -> ordered tile-part byte ranges; T.800 A.4.2 requires TPsot
    # strictly in order within the codestream, and every tile-part holds
    # whole packets, so concatenating the ranges restores one packet stream
    tiles: dict[int, list[tuple[int, int]]] = {}
    while pos < len(data):
        m, body_at, ln = _find_marker(data, pos)
        body = data[body_at : body_at + ln]
        if m == 0x51:  # SIZ
            (_rsiz, xsiz, ysiz, xo, yo, xts, yts, xto, yto, nc) = struct.unpack(
                ">HIIIIIIIIH", body[:36]
            )
            if nc not in (1, 3):
                raise Jp2Error("only 1- or 3-component images supported")
            if (xo, yo, xto, yto) != (0, 0, 0, 0):
                raise Jp2Error("image/tile offsets unsupported")
            if xts == 0 or yts == 0:
                raise Jp2Error("zero tile dims")
            if xsiz == 0 or ysiz == 0:
                raise Jp2Error("zero image dims")
            if xsiz * ysiz * nc > _MAX_PIXELS:
                raise Jp2Error(
                    f"image {xsiz}x{ysiz}x{nc} exceeds pixel cap {_MAX_PIXELS}"
                )
            n_t = ((xsiz + xts - 1) // xts) * ((ysiz + yts - 1) // yts)
            if n_t > _MAX_PIXELS >> 8:
                raise Jp2Error(f"tile grid of {n_t} tiles exceeds cap")
            depths = []
            for c in range(nc):
                ssiz, xr, yr = body[36 + 3 * c], body[37 + 3 * c], body[38 + 3 * c]
                if ssiz & 0x80:
                    raise Jp2Error("signed components unsupported")
                if not 0 <= ssiz <= 15:
                    raise Jp2Error("component depth over 16 bits unsupported")
                if xr != 1 or yr != 1:
                    raise Jp2Error("component subsampling unsupported")
                depths.append(ssiz + 1)
            if len(set(depths)) != 1:
                raise Jp2Error("mixed component depths unsupported")
            depth = depths[0]
            w, h, ncomp, xt, yt = xsiz, ysiz, nc, xts, yts
        elif m == 0x52:  # COD
            scod, prog, layers, mct_b, lev, xcb_s, ycb_s, style, transform = struct.unpack(
                ">BBHBBBBBB", body[:10]
            )
            if scod & 0x01:
                raise Jp2Error("user precincts unsupported")
            if prog != 0:
                raise Jp2Error("only LRCP progression supported")
            if not 1 <= layers <= 0xFFFF:
                raise Jp2Error("bad layer count")
            if mct_b not in (0, 1):
                raise Jp2Error("unknown MCT value")
            if style != 0:
                raise Jp2Error("code-block style options unsupported")
            if transform not in (0, 1):
                raise Jp2Error("unknown wavelet transform")
            use_mct = mct_b == 1
            levels = lev
            n_layers = layers
            cb_w, cb_h = 1 << (xcb_s + 2), 1 << (ycb_s + 2)
        elif m == 0x5C:  # QCD
            qstyle = body[0] & 0x1F
            guard = body[0] >> 5
            if qstyle == 0:
                qcd_eps = [b >> 3 for b in body[1:]]
                qcd_mu = [0] * len(qcd_eps)
            elif qstyle == 1:
                # scalar derived (E.1.1): ONE (eps0, mu0) pair; per-band
                # exponents are derived once the COD level count is known
                if len(body) != 3:
                    raise Jp2Error(
                        "scalar-derived QCD carries exactly one SPqcd "
                        f"(body is {len(body)} bytes, want 3)"
                    )
                v = struct.unpack(">H", body[1:3])[0]
                qcd_base = (v >> 11, v & 0x7FF)
            elif qstyle == 2:
                if (len(body) - 1) % 2:
                    raise Jp2Error("odd-length scalar-expounded QCD body")
                vals = struct.unpack(f">{(len(body) - 1) // 2}H", body[1:])
                qcd_eps = [v >> 11 for v in vals]
                qcd_mu = [v & 0x7FF for v in vals]
            else:
                raise Jp2Error(f"QCD quantization style {qstyle} unknown")
        elif m == 0x90:  # SOT
            if ln < 8:
                raise Jp2Error("truncated SOT")
            isot, psot, tpsot, _tnsot = struct.unpack(">HIBB", body[:8])
            sot_at = body_at - 4  # marker start
            data_at = body_at + ln
            nm, nbody, _nl = _find_marker(data, data_at)
            if nm != 0x93:
                raise Jp2Error("tile-part headers unsupported (expected SOD)")
            end = sot_at + psot if psot else len(data) - 2
            if end > len(data) or end < nbody:
                raise Jp2Error("SOT Psot out of range")
            parts = tiles.setdefault(isot, [])
            if tpsot != len(parts):
                raise Jp2Error(
                    f"tile {isot} tile-part TPsot {tpsot} out of order "
                    f"(expected {len(parts)}; A.4.2 requires stream order)"
                )
            parts.append((nbody, end))
            pos = end
            continue
        elif m == 0xD9:  # EOC
            break
        pos = body_at + ln
    if w is None or levels is None or not tiles:
        raise Jp2Error("missing SIZ/COD/tiles")
    irreversible = transform == 0
    if irreversible and qstyle not in (1, 2):
        raise Jp2Error("9/7 streams need scalar quantization (style 1 or 2)")
    if not irreversible and qstyle != 0:
        raise Jp2Error("5/3 streams with quantization unsupported")
    if qstyle == 1:
        # expand the derived pair into the expounded band order the walk
        # below consumes: [LL] then per resolution r=1..NL [HL, LH, HH].
        # T.800 eq. E-5: eps_b = eps0 - NL + n_b with n_b the band's
        # decomposition level (LL_NL has n_b = NL; detail bands at
        # resolution r have n_b = NL - r + 1), i.e. eps0 for LL and
        # eps0 + 1 - r for the r-th detail resolution; mu_b = mu0.
        eps0, mu0 = qcd_base  # type: ignore[misc]
        if eps0 + 1 - levels < 0:
            raise Jp2Error(
                f"derived eps0 {eps0} underflows at {levels} levels"
            )
        qcd_eps = [eps0] + [eps0 + 1 - r for r in range(1, levels + 1) for _ in range(3)]
        qcd_mu = [mu0] * len(qcd_eps)

    n_tx = (w + xt - 1) // xt
    n_ty = (h + yt - 1) // yt
    if set(tiles) != set(range(n_tx * n_ty)):
        raise Jp2Error(
            f"stream has tiles {sorted(tiles)}, grid needs {n_tx * n_ty}"
        )

    # global output planes (pre-MCT domain)
    out_planes: list[list[list]] = [
        [[0] * w for _ in range(h)] for _ in range(ncomp)
    ]
    shape_cache: dict[tuple[int, int], list] = {}  # ≤4 distinct edge shapes
    for t_idx, parts in sorted(tiles.items()):
        # tile-parts hold whole packets (A.4.2), so their concatenation is
        # the tile's single contiguous packet stream
        tdata = data[parts[0][0] : parts[0][1]] if len(parts) == 1 else b"".join(
            data[s:e] for s, e in parts
        )
        tpos, tend = 0, len(tdata)
        ty, tx = divmod(t_idx, n_tx)
        x0, y0 = tx * xt, ty * yt
        tw, th = min(xt, w - x0), min(yt, h - y0)
        if (tw, th) not in shape_cache:
            shape_cache[(tw, th)] = _tile_res_bands(tw, th, levels)
        res_bands = shape_cache[(tw, th)]

        pos = tpos
        # per-band state persists across quality layers: the inclusion and
        # zero-bitplane TAG TREES over the band's code-block grid, and per
        # code-block the growing lblock, accumulated pass counts, and the
        # coding-pass byte segments (which concatenate into one contiguous
        # MQ stream — this profile signals no terminations)
        states: dict[tuple[int, int, int], dict] = {}
        for lyr in range(n_layers):
            for r, bandlist in enumerate(res_bands):
                for c in range(ncomp):
                    rd = _HdrReader(tdata, pos, end=tend)
                    if not rd.get():
                        pos = rd.align()  # empty packet: nothing this layer
                        continue
                    contrib = []
                    for k, (name, bh, bw) in enumerate(bandlist):
                        if bh == 0 or bw == 0:
                            continue
                        st = states.get((r, c, k))
                        if st is None:
                            ncx = (bw + cb_w - 1) // cb_w
                            ncy = (bh + cb_h - 1) // cb_h
                            st = states[(r, c, k)] = {
                                "incl": _TagTree(ncx, ncy),
                                "zt": _TagTree(ncx, ncy),
                                "blocks": [
                                    {"included": False, "lblock": 3,
                                     "zb": 0, "passes": 0, "segs": []}
                                    for _ in range(ncx * ncy)
                                ],
                                "ncx": ncx, "ncy": ncy,
                            }
                        for bi, blk in enumerate(st["blocks"]):
                            bx, by = bi % st["ncx"], bi // st["ncx"]
                            if blk["included"]:
                                inc_now = rd.get() == 1
                            else:
                                inc_now = st["incl"].decode(rd, bx, by, lyr + 1)
                            if not inc_now:
                                continue
                            if not blk["included"]:
                                blk["included"] = True
                                t = 1
                                while not st["zt"].leaf_known(bx, by):
                                    st["zt"].decode(rd, bx, by, t)
                                    t += 1
                                blk["zb"] = st["zt"].leaf_value(bx, by)
                            np_l = _passes_read(rd)
                            while rd.get():
                                blk["lblock"] += 1
                            nlen = blk["lblock"] + (np_l.bit_length() - 1)
                            seg_len = rd.get_int(nlen)
                            blk["passes"] += np_l
                            contrib.append((blk, seg_len))
                    pos = rd.align()
                    for blk, seg_len in contrib:
                        if pos + seg_len > tend:
                            raise Jp2Error("code-block data overruns the tile-part")
                        blk["segs"].append(tdata[pos : pos + seg_len])
                        pos += seg_len

        decoded: list[list[list[list[int]]]] = [[] for _ in range(ncomp)]
        for r, bandlist in enumerate(res_bands):
            qbase = 0 if r == 0 else 1 + 3 * (r - 1)
            for c in range(ncomp):
                for k, (name, bh, bw) in enumerate(bandlist):
                    if bh == 0 or bw == 0:
                        decoded[c].append([])
                        continue
                    st = states.get((r, c, k))
                    mat = [[0] * bw for _ in range(bh)]
                    if st is not None:
                        qi = qbase + k
                        eps = (qcd_eps[qi] if qi < len(qcd_eps)
                               else _coef_bits(name, depth))
                        mb = guard + eps - 1  # conforming Mb from QCD
                        for bi, blk in enumerate(st["blocks"]):
                            if not blk["included"]:
                                continue
                            bx, by = bi % st["ncx"], bi // st["ncx"]
                            sbw = min(cb_w, bw - bx * cb_w)
                            sbh = min(cb_h, bh - by * cb_h)
                            sub = t1_decode_block(
                                b"".join(blk["segs"]), sbw, sbh, name,
                                mb - blk["zb"], blk["passes"],
                            )
                            for yy in range(sbh):
                                mat[by * cb_h + yy][
                                    bx * cb_w : bx * cb_w + sbw
                                ] = sub[yy]
                    decoded[c].append(mat)

        # reassemble band structure and invert per component
        for c in range(ncomp):
            mats = iter(decoded[c])
            band_idx = 0

            def next_mat(name: str) -> list[list]:
                nonlocal band_idx
                m = next(mats)
                if irreversible:
                    qi = band_idx
                    if qi >= len(qcd_eps):
                        raise Jp2Error("QCD carries fewer entries than subbands")
                    eps, mu = qcd_eps[qi], qcd_mu[qi]
                    rb_bits = depth + _BAND_GAIN[name]
                    m = _dequantize(m, _qdelta(eps, mu, rb_bits))
                band_idx += 1
                return m

            ll_mat = next_mat("LL")
            detail_dicts = []
            for bandlist in res_bands[1:]:
                dd = {}
                for name, bh, bw in bandlist:
                    m = next_mat(name)
                    dd[name] = m if (bh and bw) else []
                detail_dicts.append(dd)
            # seq was inner-to-outer; the inverse expects outer-to-inner + LL
            rebuilt = [
                {"lvl": k, "HL": dd["HL"], "LH": dd["LH"], "HH": dd["HH"]}
                for k, dd in enumerate(reversed(detail_dicts))
            ] + [{"LL": ll_mat}]
            inv = dwt97_inverse if irreversible else dwt53_inverse
            tile_plane = inv(rebuilt)
            if len(tile_plane) != th or (tile_plane and len(tile_plane[0]) != tw):
                raise Jp2Error("decoded tile dims disagree with the grid")
            dst = out_planes[c]
            for yy in range(th):
                dst[y0 + yy][x0 : x0 + tw] = tile_plane[yy]

    if use_mct:
        if ncomp != 3:
            raise Jp2Error("MCT signalled on a non-3-component stream")
        out_planes = (
            _ict_inverse(out_planes) if irreversible else _rct_inverse(out_planes)
        )
    top = (1 << depth) - 1
    half = 1 << (depth - 1)
    comps_rows: list[list[list[int]]] = []
    for plane in out_planes:
        rows = [
            [min(top, max(0, int(round(px)) + half)) for px in r]
            for r in plane
        ]
        if len(rows) != h or (rows and len(rows[0]) != w):
            raise Jp2Error("decoded dims disagree with SIZ")
        comps_rows.append(rows)
    return w, h, comps_rows, depth


def jp2_decode_gray(payload: bytes) -> tuple[int, int, list[bytes]]:
    """JPEG 2000 codestream (or JP2 wrapper) -> (w, h, gray rows). Color
    streams are luma-combined (BT.601 weights) — the shape every raster
    consumer here (OCR, metadata) wants."""
    w, h, comps = jp2_decode(payload)
    if len(comps) == 1:
        return w, h, comps[0]
    r_p, g_p, b_p = comps
    rows = [
        bytes(
            min(255, max(0, int(round(0.299 * r + 0.587 * g + 0.114 * b))))
            for r, g, b in zip(rr, gr, br)
        )
        for rr, gr, br in zip(r_p, g_p, b_p)
    ]
    return w, h, rows
