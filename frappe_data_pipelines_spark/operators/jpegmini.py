"""Baseline JPEG codec (stdlib-only) for the scanned-PDF kernel path.

Real scanner output embedded in PDFs is almost always /DCTDecode (JPEG);
round 5's image-XObject extraction handled Flate-compressed raw samples
only. This module implements the baseline sequential DCT process from
ITU-T T.81 well enough for that workload:

  * decoder: SOI/APP/DQT/SOF0/DHT/SOS/RSTn/EOI marker walk, standard or
    custom Huffman tables, byte-unstuffing, interleaved-MCU entropy decode
    with DC prediction + restart handling, sampling factors up to 2×2
    (4:4:4, 4:2:2, 4:2:0 — the formats cameras and scanners emit),
    dequantize, dezigzag, float IDCT, level shift. Grayscale returns the
    single component; YCbCr returns luma (the OCR path only needs gray),
    with chroma blocks entropy-decoded to keep the bitstream in sync.
  * encoders (fixture/round-trip side): level shift, float FDCT, Annex-K
    luminance quant table scaled by quality, zigzag, DC-diff + AC
    run-length coding with the Annex-K standard Huffman tables, byte
    stuffing. Grayscale baseline and a 4:2:0 YCbCr color variant.

Both sides are deterministic; the encoder exists so fixtures and
round-trip tests need no external imaging wheel.
"""

from __future__ import annotations

import math

__all__ = ["jpeg_encode_gray", "jpeg_decode_gray", "JpegError"]


class JpegError(ValueError):
    pass


# Decode-size guard (the jbig2mini/jp2mini convention): crawl payloads
# reach this decoder via multimodal dispatch and pdfmini /DCTDecode, where
# JpegError dead-letters — a hostile SOF header must raise before any
# per-pixel allocation. 65535x65535 is legal per the marker fields but
# 4.3e9 pixels of Python lists is an OOM, not an image.
_MAX_PIXELS = 1 << 26


def _check_dims(w: int, h: int) -> None:
    if w == 0 or h == 0:
        raise JpegError("zero JPEG dimensions")
    if w * h > _MAX_PIXELS:
        raise JpegError(f"JPEG {w}x{h} exceeds pixel cap {_MAX_PIXELS}")


# Annex K.1 — luminance quantization table, natural (row-major) order
_QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# zigzag index: _ZIGZAG[k] = natural index of the k-th zigzag coefficient
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 — standard Huffman tables: (bits[1..16], huffval)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _scaled_quant(quality: int) -> list[int]:
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (q * scale + 50) // 100)) for q in _QUANT_LUMA]


# -- DCT ---------------------------------------------------------------------

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _fdct_block(block: list[float]) -> list[float]:
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                cu = _COS[u][x]
                row = x * 8
                for y in range(8):
                    s += block[row + y] * cu * _COS[v][y]
            out[u * 8 + v] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct_block(coef: list[float]) -> list[float]:
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                cux = _COS[u][x]
                row = u * 8
                for v in range(8):
                    s += _C[u] * _C[v] * coef[row + v] * cux * _COS[v][y]
            out[x * 8 + y] = 0.25 * s
    return out


# -- bit IO ------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise JpegError("read past marker")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                self.marker = nxt
                self.pos += 1
                b = 0  # spec: treat as padding before the marker
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.nbits = 0
        self.acc = 0


def _parse_dqt(body: bytes, quant: dict[int, list[int]]) -> None:
    i = 0
    while i < len(body):
        pq, tq = body[i] >> 4, body[i] & 0x0F
        i += 1
        if pq != 0:
            raise JpegError("16-bit quant tables unsupported")
        zz = list(body[i : i + 64])
        i += 64
        if len(zz) < 64:
            raise JpegError("truncated DQT segment")
        tbl = [0] * 64
        for k in range(64):
            tbl[_ZIGZAG[k]] = zz[k]
        quant[tq] = tbl


def _parse_dht(body: bytes, huff_dc: dict, huff_ac: dict) -> None:
    i = 0
    while i < len(body):
        tc, th = body[i] >> 4, body[i] & 0x0F
        bits = list(body[i + 1 : i + 17])
        nvals = sum(bits)
        vals = list(body[i + 17 : i + 17 + nvals])
        if len(bits) < 16 or len(vals) < nvals:
            raise JpegError("truncated DHT segment")
        (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(bits, vals)
        i += 17 + nvals


def _huff_category(value: int) -> tuple[int, int]:
    """(size, amplitude-bits) for a DC diff / AC coefficient."""
    if value == 0:
        return 0, 0
    mag = abs(value)
    size = mag.bit_length()
    bits = value if value > 0 else value + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of _huff_category: sign-extend a size-bit amplitude."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) by canonical Huffman assignment."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegError("invalid Huffman code")


# -- encoder -----------------------------------------------------------------


def _encode_block(
    bw: _BitWriter,
    block: list[float],
    quant: list[int],
    prev_dc: int,
    dc_tab: dict,
    ac_tab: dict,
) -> int:
    """FDCT + quantize + entropy-code one level-shifted 8×8 block; returns
    the new DC predictor."""
    coef = _fdct_block(block)
    q = [int(round(coef[_ZIGZAG[k]] / quant[_ZIGZAG[k]])) for k in range(64)]
    size, ampl = _huff_category(q[0] - prev_dc)
    code, length = dc_tab[size]
    bw.write(code, length)
    if size:
        bw.write(ampl, size)
    run = 0
    for k in range(1, 64):
        if q[k] == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_tab[0xF0]
            bw.write(code, length)
            run -= 16
        size, ampl = _huff_category(q[k])
        code, length = ac_tab[(run << 4) | size]
        bw.write(code, length)
        bw.write(ampl, size)
        run = 0
    if run:
        code, length = ac_tab[0x00]  # EOB
        bw.write(code, length)
    return q[0]


def _plane_block(plane: list, w: int, h: int, bx: int, by: int) -> list[float]:
    """Edge-replicated level-shifted 8×8 block from a float/int plane."""
    return [
        float(plane[min(by + i, h - 1)][min(bx + j, w - 1)]) - 128.0
        for i in range(8)
        for j in range(8)
    ]


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def jpeg_encode_gray(rows: list[bytes], quality: int = 90) -> bytes:
    """Grayscale baseline JPEG from 8-bit rows (all equal length)."""
    h = len(rows)
    if h == 0:
        raise JpegError("empty image")
    w = len(rows[0])
    quant = _scaled_quant(quality)
    dc_tab = _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_tab = _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)

    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            prev_dc = _encode_block(
                bw, _plane_block(rows, w, h, bx, by), quant, prev_dc, dc_tab, ac_tab
            )
    bw.flush()

    zz_quant = bytes(quant[_ZIGZAG[k]] for k in range(64))
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, b"\x00" + zz_quant)  # DQT id 0, 8-bit
    out += _seg(
        0xC0,
        b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x01\x11\x00",
    )  # SOF0: 1 component, 1x1 sampling, quant table 0
    out += _seg(0xC4, b"\x00" + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS))
    out += _seg(0xC4, b"\x10" + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS))
    out += _seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_encode_rgb420(rows_rgb: list[bytes], quality: int = 90) -> bytes:
    """4:2:0 YCbCr baseline JPEG from interleaved RGB rows (len = 3·width).
    The standard camera/scanner layout: each MCU is four Y blocks plus one
    2×2-averaged Cb and Cr block. (All components share the luminance
    quant + Huffman tables — valid JPEG, simplest fixture encoder.)"""
    h = len(rows_rgb)
    if h == 0:
        raise JpegError("empty image")
    w = len(rows_rgb[0]) // 3
    yp = [[0.0] * w for _ in range(h)]
    cbp = [[0.0] * ((w + 1) // 2) for _ in range((h + 1) // 2)]
    crp = [[0.0] * ((w + 1) // 2) for _ in range((h + 1) // 2)]
    cbsum = [[0.0] * ((w + 1) // 2) for _ in range((h + 1) // 2)]
    crsum = [[0.0] * ((w + 1) // 2) for _ in range((h + 1) // 2)]
    cnt = [[0] * ((w + 1) // 2) for _ in range((h + 1) // 2)]
    for y in range(h):
        row = rows_rgb[y]
        for x in range(w):
            r, g, b = row[3 * x], row[3 * x + 1], row[3 * x + 2]
            yy = 0.299 * r + 0.587 * g + 0.114 * b
            yp[y][x] = yy
            cbsum[y // 2][x // 2] += -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
            crsum[y // 2][x // 2] += 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
            cnt[y // 2][x // 2] += 1
    for cy in range(len(cbp)):
        for cx in range(len(cbp[0])):
            cbp[cy][cx] = cbsum[cy][cx] / cnt[cy][cx]
            crp[cy][cx] = crsum[cy][cx] / cnt[cy][cx]
    cw, ch = len(cbp[0]), len(cbp)

    quant = _scaled_quant(quality)
    dc_tab = _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_tab = _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    bw = _BitWriter()
    dc = [0, 0, 0]
    for my in range(0, h, 16):
        for mx in range(0, w, 16):
            for byi in range(2):
                for bxi in range(2):
                    dc[0] = _encode_block(
                        bw,
                        _plane_block(yp, w, h, mx + bxi * 8, my + byi * 8),
                        quant, dc[0], dc_tab, ac_tab,
                    )
            dc[1] = _encode_block(
                bw, _plane_block(cbp, cw, ch, mx // 2, my // 2), quant, dc[1], dc_tab, ac_tab
            )
            dc[2] = _encode_block(
                bw, _plane_block(crp, cw, ch, mx // 2, my // 2), quant, dc[2], dc_tab, ac_tab
            )
    bw.flush()

    zz_quant = bytes(quant[_ZIGZAG[k]] for k in range(64))
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + zz_quant)
    out += _seg(
        0xC0,
        b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x03\x01\x22\x00\x02\x11\x00\x03\x11\x00",
    )  # SOF0: 3 components, Y 2x2 / Cb 1x1 / Cr 1x1, quant table 0
    out += _seg(0xC4, b"\x00" + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS))
    out += _seg(0xC4, b"\x10" + bytes(_AC_LUMA_BITS) + bytes(_AC_LUMA_VALS))
    out += _seg(0xDA, b"\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00")
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# -- decoder -----------------------------------------------------------------


def jpeg_decode_gray(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Decode a baseline or progressive JPEG to (width, height, gray rows).

    Totality boundary (same contract as pdfmini's public entry points): any
    structurally malformed stream raises ``JpegError`` — never a bare
    IndexError/ValueError/KeyError from a truncated segment."""
    try:
        return _jpeg_decode_gray_impl(payload)
    except JpegError:
        raise
    except (IndexError, ValueError, KeyError, ZeroDivisionError, OverflowError) as e:
        raise JpegError(f"malformed JPEG: {e}") from e


def _jpeg_decode_gray_impl(payload: bytes) -> tuple[int, int, list[bytes]]:
    if payload[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (no SOI)")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    scan_comps: list[dict] = []

    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            raise JpegError("EOI before scan data")
        length = int.from_bytes(payload[pos : pos + 2], "big")
        body = payload[pos + 2 : pos + length]
        if marker == 0xDB:  # DQT
            _parse_dqt(body, quant)
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (both baseline-decodable)
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            _check_dims(w, h)
            n = body[5]
            comps = []
            for ci in range(n):
                cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "tq": tq, "h": sampling >> 4, "v": sampling & 0x0F}
                )
        elif marker == 0xC2:  # SOF2: progressive — full multi-scan decode
            return _decode_progressive(payload)
        elif marker == 0xC3 or 0xC5 <= marker <= 0xCF and marker != 0xC8:
            raise JpegError(f"non-baseline SOF 0x{marker:02x}")
        elif marker == 0xC4:  # DHT
            _parse_dht(body, huff_dc, huff_ac)
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS
            if not body or len(body) < 4 + 2 * body[0]:
                raise JpegError("truncated SOS header")
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cid, tabs = body[1 + 2 * ci], body[2 + 2 * ci]
                comp = next((c for c in comps if c["id"] == cid), None)
                if comp is None:
                    raise JpegError(f"SOS names unknown component {cid}")
                if (tabs >> 4) not in huff_dc or (tabs & 0x0F) not in huff_ac:
                    raise JpegError("SOS references undefined Huffman table")
                scan_comps.append(
                    {**comp, "dc": huff_dc[tabs >> 4], "ac": huff_ac[tabs & 0x0F]}
                )
            pos += length
            break
        pos += length
    else:
        raise JpegError("no SOS marker")

    if not scan_comps or w == 0 or h == 0:
        raise JpegError("missing SOF before SOS")

    # interleaved MCU geometry: hmax×vmax luma blocks per MCU; chroma
    # components contribute h×v blocks each (decoded to keep the bitstream
    # in sync, pixels discarded — only luma is materialized)
    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise JpegError(f"unsupported sampling {hmax}x{vmax}")
    if scan_comps[0]["h"] != hmax or scan_comps[0]["v"] != vmax:
        raise JpegError("luma must carry the max sampling factors")
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    luma = [[0] * (mcus_x * 8 * hmax) for _ in range(mcus_y * 8 * vmax)]
    r = _BitReader(payload, pos)
    prev_dc = [0] * len(scan_comps)
    mcu_index = 0

    def decode_block(ci: int, comp: dict) -> list[int]:
        zz = [0] * 64
        size = _decode_symbol(r, comp["dc"])
        diff = _extend(r.read_bits(size), size) if size else 0
        prev_dc[ci] += diff
        zz[0] = prev_dc[ci]
        k = 1
        while k < 64:
            sym = _decode_symbol(r, comp["ac"])
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            k += sym >> 4
            if k > 63:
                raise JpegError("AC run past block end")
            size = sym & 0x0F
            zz[k] = _extend(r.read_bits(size), size)
            k += 1
        return zz

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                r.byte_align()
                if r.marker is None:
                    # consume the RSTn marker directly from the stream
                    while r.data[r.pos] == 0xFF and 0xD0 <= r.data[r.pos + 1] <= 0xD7:
                        r.pos += 2
                        break
                r.marker = None
                prev_dc = [0] * len(scan_comps)
            for ci, comp in enumerate(scan_comps):
                qtbl = quant[comp["tq"]]
                for byi in range(comp["v"]):
                    for bxi in range(comp["h"]):
                        zz = decode_block(ci, comp)
                        if ci != 0:
                            continue  # chroma: bitstream sync only
                        coef = [0.0] * 64
                        for k2 in range(64):
                            coef[_ZIGZAG[k2]] = zz[k2] * qtbl[_ZIGZAG[k2]]
                        pix = _idct_block(coef)
                        y0 = (my * vmax + byi) * 8
                        x0 = (mx * hmax + bxi) * 8
                        for i in range(8):
                            rowbuf = luma[y0 + i]
                            for j in range(8):
                                v = int(round(pix[i * 8 + j] + 128.0))
                                rowbuf[x0 + j] = 0 if v < 0 else (255 if v > 255 else v)
            mcu_index += 1

    rows = [bytes(luma[y][:w]) for y in range(h)]
    return w, h, rows


# -- progressive (SOF2) ------------------------------------------------------
#
# Progressive JPEG splits the coefficient data across scans: DC first /
# DC refine (1 raw bit per block), AC spectral bands with EOB-run coding,
# AC successive-approximation refinement (T.81 Annex G). Coefficients
# accumulate per block across scans; dequant+IDCT happens once at EOI.
# ``jpeg_decode_gray`` delegates here on SOF2, so the PDF /DCTDecode raster
# path and the imaging OCR path gain progressive support transparently.


def _prog_dc_scan(r, scan, coefs, geom, ah, al, restart_interval):
    """DC scan — interleaved MCU order over all scan components (or the
    single component's own block grid). First pass codes diffs at 1<<al;
    refinement appends one raw bit per block."""
    prev_dc = [0] * len(scan)
    mcus_x, mcus_y, hmax, vmax = geom
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                _prog_restart(r)
                prev_dc = [0] * len(scan)
            for ci, comp in enumerate(scan):
                for byi in range(comp["v"]):
                    for bxi in range(comp["h"]):
                        blk = coefs[comp["ci"]][my * comp["v"] + byi][mx * comp["h"] + bxi]
                        if ah == 0:
                            size = _decode_symbol(r, comp["dc"])
                            diff = _extend(r.read_bits(size), size) if size else 0
                            prev_dc[ci] += diff
                            blk[0] = prev_dc[ci] << al
                        elif r.read_bit():
                            blk[0] |= 1 << al
            mcu += 1


def _prog_ac_first(r, comp, coefs, ss, se, al, restart_interval):
    """AC spectral-selection first pass — non-interleaved (T.81 requires
    single-component AC scans), with EOB-run coding across blocks."""
    blocks = _comp_blocks(coefs, comp)
    eobrun = 0
    for i, blk in enumerate(blocks):
        if restart_interval and i and i % restart_interval == 0:
            _prog_restart(r)
            eobrun = 0
        if eobrun:
            eobrun -= 1
            continue
        k = ss
        while k <= se:
            sym = _decode_symbol(r, comp["ac"])
            run, size = sym >> 4, sym & 0x0F
            if size == 0:
                if run == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << run) - 1
                if run:
                    eobrun += r.read_bits(run)
                break
            k += run
            if k > se:
                raise JpegError("AC run past band end")
            blk[k] = _extend(r.read_bits(size), size) << al
            k += 1


def _prog_ac_refine(r, comp, coefs, ss, se, al, restart_interval):
    """AC refinement (T.81 G.1.2.3): newly-nonzero coefficients arrive as
    ±1<<al; history-nonzero coefficients absorb one correction bit each as
    the run/EOB coding passes over them."""
    blocks = _comp_blocks(coefs, comp)
    p1, m1 = 1 << al, -1 << al
    eobrun = 0

    def correct(blk, k):
        if r.read_bit():
            if (blk[k] >= 0 and blk[k] < p1 and blk[k] > m1):
                raise JpegError("refinement bit on zero coefficient")
            blk[k] += p1 if blk[k] > 0 else m1

    for i, blk in enumerate(blocks):
        if restart_interval and i and i % restart_interval == 0:
            _prog_restart(r)
            eobrun = 0
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = _decode_symbol(r, comp["ac"])
                run, size = sym >> 4, sym & 0x0F
                newval = 0
                if size == 0:
                    if run < 15:
                        # EOBn counts the CURRENT block too (the sweep below
                        # finishes it, then decrements) — unlike the first
                        # pass, where EOB leaves nothing to read in-block
                        eobrun = 1 << run
                        if run:
                            eobrun += r.read_bits(run)
                        break  # rest of block handled by the EOB sweep below
                    # run == 15: ZRL — skip 16 zero-history positions
                else:
                    if size != 1:
                        raise JpegError("AC refine size must be 1")
                    newval = p1 if r.read_bit() else m1
                while k <= se:
                    if blk[k] != 0:
                        correct(blk, k)
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
        if eobrun:
            while k <= se:
                if blk[k] != 0:
                    correct(blk, k)
                k += 1
            eobrun -= 1


def _prog_restart(r):
    r.byte_align()
    if r.marker is None:
        while r.data[r.pos] == 0xFF and 0xD0 <= r.data[r.pos + 1] <= 0xD7:
            r.pos += 2
            break
    r.marker = None


def _comp_blocks(coefs, comp):
    """Raster-order block list for a non-interleaved scan: the component's
    own ceil(dim/8) grid, which may be smaller than its padded MCU grid."""
    grid = coefs[comp["ci"]]
    return [grid[by][bx] for by in range(comp["nby"]) for bx in range(comp["nbx"])]


def _decode_progressive(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Multi-scan progressive decode; returns (w, h, gray rows) like the
    baseline path (luma materialized, chroma coefficients tracked for
    stream correctness)."""
    pos = 2
    quant: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    coefs: list[list[list[list[int]]]] = []
    w = h = 0
    hmax = vmax = 1
    mcus_x = mcus_y = 0
    restart_interval = 0

    while pos < len(payload) - 1:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        length = int.from_bytes(payload[pos : pos + 2], "big")
        body = payload[pos + 2 : pos + length]
        if marker == 0xDB:
            _parse_dqt(body, quant)
        elif marker == 0xC2:
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            _check_dims(w, h)
            n = body[5]
            comps = []
            for ci in range(n):
                cid, sampling, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "tq": tq, "h": sampling >> 4, "v": sampling & 0x0F, "ci": ci}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
                raise JpegError(f"unsupported sampling {hmax}x{vmax}")
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            coefs = []
            for c in comps:
                # padded to the MCU grid for interleaved DC scans; the
                # component's true block dims ride along for AC scans
                c["nbx"] = (-(-(w * c["h"]) // hmax) + 7) // 8
                c["nby"] = (-(-(h * c["v"]) // vmax) + 7) // 8
                coefs.append(
                    [
                        [[0] * 64 for _ in range(mcus_x * c["h"])]
                        for _ in range(mcus_y * c["v"])
                    ]
                )
        elif marker == 0xC4:
            _parse_dht(body, huff_dc, huff_ac)
        elif marker == 0xDD:
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            if not comps:
                raise JpegError("SOS before SOF2")
            if not body or len(body) < 4 + 2 * body[0]:
                raise JpegError("truncated SOS header")
            ns = body[0]
            scan = []
            for ci in range(ns):
                cid, tabs = body[1 + 2 * ci], body[2 + 2 * ci]
                base = next((c for c in comps if c["id"] == cid), None)
                if base is None:
                    raise JpegError(f"SOS names unknown component {cid}")
                comp = dict(base)
                comp["dc"] = huff_dc.get(tabs >> 4)
                comp["ac"] = huff_ac.get(tabs & 0x0F)
                scan.append(comp)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            r = _BitReader(payload, pos + length)
            try:
                if ss == 0:
                    if se != 0:
                        raise JpegError("DC scan must have Se=0")
                    if ns == 1:
                        geom = (scan[0]["nbx"], scan[0]["nby"], 1, 1)
                        one = dict(scan[0], h=1, v=1)
                        _prog_dc_scan(r, [one], coefs, geom, ah, al, restart_interval)
                    else:
                        _prog_dc_scan(
                            r, scan, coefs, (mcus_x, mcus_y, hmax, vmax), ah, al,
                            restart_interval,
                        )
                else:
                    if ns != 1:
                        raise JpegError("progressive AC scan must be single-component")
                    if ah == 0:
                        _prog_ac_first(r, scan[0], coefs, ss, se, al, restart_interval)
                    else:
                        _prog_ac_refine(r, scan[0], coefs, ss, se, al, restart_interval)
            except IndexError as e:  # _BitReader ran off the payload
                raise JpegError("truncated progressive scan data") from e
            except (AttributeError, TypeError) as e:  # undefined Huffman table
                raise JpegError("scan references undefined Huffman table") from e
            pos = r.pos - (2 if r.marker is not None else 0)
            continue
        pos += length

    if not comps or w == 0 or h == 0:
        raise JpegError("missing SOF2")

    # materialize luma (component 0 must carry max sampling, as baseline)
    luma_c = comps[0]
    if luma_c["h"] != hmax or luma_c["v"] != vmax:
        raise JpegError("luma must carry the max sampling factors")
    if luma_c["tq"] not in quant:
        raise JpegError("missing quantization table for luma")
    qtbl = quant[luma_c["tq"]]
    grid = coefs[0]
    luma = [[0] * (mcus_x * 8 * hmax) for _ in range(mcus_y * 8 * vmax)]
    for by in range(len(grid)):
        for bx in range(len(grid[0])):
            zz = grid[by][bx]
            coef = [0.0] * 64
            for k in range(64):
                coef[_ZIGZAG[k]] = zz[k] * qtbl[_ZIGZAG[k]]
            pix = _idct_block(coef)
            for i in range(8):
                rowbuf = luma[by * 8 + i]
                for j in range(8):
                    v = int(round(pix[i * 8 + j] + 128.0))
                    rowbuf[bx * 8 + j] = 0 if v < 0 else (255 if v > 255 else v)
    return w, h, [bytes(luma[y][:w]) for y in range(h)]


# Progressive AC scans need EOBn symbols (r<<4 for r>=1), which the Annex-K
# baseline AC table does not contain. Fixture encoder uses a flat 9-bit
# canonical table over every symbol a progressive AC scan can emit.
_AC_PROG_VALS = sorted(
    [r << 4 for r in range(15)]  # EOB0..EOB14
    + [0xF0]  # ZRL
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_AC_PROG_BITS = [0] * 16
_AC_PROG_BITS[8] = len(_AC_PROG_VALS)  # all codes 9 bits long


def jpeg_encode_gray_progressive(rows: list[bytes], quality: int = 90) -> bytes:
    """Grayscale progressive JPEG with a 4-scan script that exercises every
    progressive scan kind: DC first (Al=1), AC 1..63 first (Al=1), DC
    refine, AC 1..63 refine. Coefficient-exact with the baseline encoder at
    the same quality (successive approximation is lossless once all scans
    land), which is what the round-trip tests assert."""
    h = len(rows)
    if h == 0:
        raise JpegError("empty image")
    w = len(rows[0])
    quant = _scaled_quant(quality)
    dc_tab = _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_tab = _build_encode_table(_AC_PROG_BITS, _AC_PROG_VALS)

    blocks: list[list[int]] = []  # quantized, zigzag order
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            coef = _fdct_block(_plane_block(rows, w, h, bx, by))
            blocks.append(
                [int(round(coef[_ZIGZAG[k]] / quant[_ZIGZAG[k]])) for k in range(64)]
            )

    def trunc2(v: int) -> int:  # AC point transform: toward zero
        return -((-v) >> 1) if v < 0 else v >> 1

    # scan 1: DC first, Al=1
    s1 = _BitWriter()
    prev = 0
    for q in blocks:
        v = q[0] >> 1  # DC point transform: arithmetic shift
        size, ampl = _huff_category(v - prev)
        code, length = dc_tab[size]
        s1.write(code, length)
        if size:
            s1.write(ampl, size)
        prev = v
    s1.flush()

    # scan 2: AC 1..63 first, Al=1, EOB-run coded
    s2 = _BitWriter()
    eobrun = 0

    def flush_eob(bw: _BitWriter, pending: list[int] | None = None) -> None:
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            code, length = ac_tab[nbits << 4]
            bw.write(code, length)
            if nbits:
                bw.write(eobrun - (1 << nbits), nbits)
            eobrun = 0
            if pending:
                for b in pending:
                    bw.write(b, 1)
                pending.clear()

    for q in blocks:
        band = [trunc2(q[k]) for k in range(64)]
        last = max((k for k in range(1, 64) if band[k]), default=0)
        if last == 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob(s2)
            continue
        flush_eob(s2)
        run = 0
        for k in range(1, last + 1):
            if band[k] == 0:
                run += 1
                continue
            while run >= 16:
                code, length = ac_tab[0xF0]
                s2.write(code, length)
                run -= 16
            size, ampl = _huff_category(band[k])
            code, length = ac_tab[(run << 4) | size]
            s2.write(code, length)
            s2.write(ampl, size)
            run = 0
        if last < 63:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob(s2)
    flush_eob(s2)
    s2.flush()

    # scan 3: DC refine (one raw bit per block)
    s3 = _BitWriter()
    for q in blocks:
        s3.write(q[0] & 1, 1)
    s3.flush()

    # scan 4: AC 1..63 refine (T.81 G.1.2.3 / libjpeg structure). Two-level
    # bit buffering is load-bearing: correction bits from COMPLETED blocks
    # (`be`) ride with the next EOBn code — the decoder reads them in its
    # EOB sweep — while the CURRENT block's corrections (`br`) ride with its
    # own next ZRL/newly-nonzero symbol, which the decoder's run advance
    # consumes. Folding them into one buffer desyncs the stream.
    s4 = _BitWriter()
    eobrun = 0
    be: list[int] = []  # bits owed to the pending EOB run
    for q in blocks:
        br: list[int] = []  # bits owed to this block's next symbol
        absv = [abs(q[k]) for k in range(64)]
        eob = 0
        for k in range(1, 64):
            if absv[k] == 1:
                eob = k
        run = 0
        for k in range(1, 64):
            t = absv[k]
            if t == 0:
                run += 1
                continue
            while run > 15 and k <= eob:
                flush_eob(s4, be)
                code, length = ac_tab[0xF0]
                s4.write(code, length)
                run -= 16
                for b in br:
                    s4.write(b, 1)
                br.clear()
            if t > 1:
                br.append(t & 1)
                continue
            flush_eob(s4, be)
            code, length = ac_tab[(run << 4) | 1]
            s4.write(code, length)
            s4.write(1 if q[k] > 0 else 0, 1)
            for b in br:
                s4.write(b, 1)
            br.clear()
            run = 0
        if run > 0 or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF:
                flush_eob(s4, be)
    flush_eob(s4, be)
    s4.flush()

    zz_quant = bytes(quant[_ZIGZAG[k]] for k in range(64))
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + zz_quant)
    out += _seg(
        0xC2,
        b"\x08" + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x01\x11\x00",
    )  # SOF2: 1 component, 1x1 sampling
    out += _seg(0xC4, b"\x00" + bytes(_DC_LUMA_BITS) + bytes(_DC_LUMA_VALS))
    out += _seg(0xC4, b"\x11" + bytes(_AC_PROG_BITS) + bytes(_AC_PROG_VALS))
    # SOS header: ns=1, comp 1 → (DC table, AC table), Ss, Se, Ah<<4|Al
    out += _seg(0xDA, b"\x01\x01\x00" + bytes([0, 0, 0x01])) + s1.out
    out += _seg(0xDA, b"\x01\x01\x01" + bytes([1, 63, 0x01])) + s2.out
    out += _seg(0xDA, b"\x01\x01\x00" + bytes([0, 0, 0x10])) + s3.out
    out += _seg(0xDA, b"\x01\x01\x01" + bytes([1, 63, 0x10])) + s4.out
    out += b"\xff\xd9"
    return bytes(out)
