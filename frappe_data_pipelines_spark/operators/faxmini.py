"""Minimal stdlib-only CCITT fax codec: Group 4 (ITU-T T.6 2-D) and
Group 3 one-dimensional (T.4 MH) — the /CCITTFaxDecode filter that most
black-and-white scanned PDFs carry (reference behavior: pdfplumber via
pdfminer's ccitt module, text_extraction.py:63-75 delegation).

Both directions are implemented: decode for the production scan path,
encode for the checked-in fixtures (so the decoder is exercised against
independently-constructed bitstreams).

The run-length code tables are the published ITU-T T.4 tables (public
standard). Internal pixel convention: 1 = black, 0 = white; the PDF-level
``BlackIs1`` flag is applied by the caller when mapping to samples.
"""

from __future__ import annotations

__all__ = ["FaxError", "g4_decode", "g4_encode", "g3_1d_decode", "g3_1d_encode"]


class FaxError(ValueError):
    """Structural decode failure (caller falls back / reports)."""


# Geometry cap (the shared decoder convention): /Columns and /Rows come
# from a hostile PDF dict, and the reference-line allocation is O(columns)
# before any coded data is read — guard first, dead-letter via FaxError.
_MAX_PIXELS = 1 << 26


def _check_fax_dims(columns: int, rows: int) -> None:
    if columns <= 0 or rows < 0:
        raise FaxError(f"bad fax geometry {columns}x{rows}")
    if columns * max(rows, 1) > _MAX_PIXELS:
        raise FaxError(f"fax {columns}x{rows} exceeds pixel cap {_MAX_PIXELS}")


# ITU-T T.4 terminating + makeup codes, run length -> bitstring.
_WHITE = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011", 5: "1100",
    6: "1110", 7: "1111", 8: "10011", 9: "10100", 10: "00111", 11: "01000",
    12: "001000", 13: "000011", 14: "110100", 15: "110101", 16: "101010",
    17: "101011", 18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

_BLACK = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000", 18: "0000001000",
    19: "00001100111", 20: "00001101000", 21: "00001101100",
    22: "00000110111", 23: "00000101000", 24: "00000010111",
    25: "00000011000", 26: "000011001010", 27: "000011001011",
    28: "000011001100", 29: "000011001101", 30: "000001101000",
    31: "000001101001", 32: "000001101010", 33: "000001101011",
    34: "000011010010", 35: "000011010011", 36: "000011010100",
    37: "000011010101", 38: "000011010110", 39: "000011010111",
    40: "000001101100", 41: "000001101101", 42: "000011011010",
    43: "000011011011", 44: "000001010100", 45: "000001010101",
    46: "000001010110", 47: "000001010111", 48: "000001100100",
    49: "000001100101", 50: "000001010010", 51: "000001010011",
    52: "000000100100", 53: "000000110111", 54: "000000111000",
    55: "000000100111", 56: "000000101000", 57: "000001011000",
    58: "000001011001", 59: "000000101011", 60: "000000101100",
    61: "000001011010", 62: "000001100110", 63: "000001100111",
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# extended makeup codes (shared by both colors, T.4 table 3)
_EXT = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

_DEC_WHITE = {v: k for k, v in {**_WHITE, **_EXT}.items()}
_DEC_BLACK = {v: k for k, v in {**_BLACK, **_EXT}.items()}

_EOFB = "000000000001" * 2


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def peek(self, n: int) -> str:
        out = []
        for i in range(self.pos, min(self.pos + n, len(self.data) * 8)):
            out.append("1" if self.data[i >> 3] & (0x80 >> (i & 7)) else "0")
        return "".join(out)

    def skip(self, n: int) -> None:
        self.pos += n

    def exhausted(self) -> bool:
        return self.pos >= len(self.data) * 8


def _read_run(br: _BitReader, black: bool) -> int:
    """One complete MH run: zero or more makeup codes then a terminator."""
    table = _DEC_BLACK if black else _DEC_WHITE
    total = 0
    while True:
        for ln in range(2, 15):
            code = br.peek(ln)
            if len(code) < ln:
                break
            if code in table:
                br.skip(ln)
                val = table[code]
                total += val
                if val < 64:  # terminating code ends the run
                    return total
                break
        else:
            raise FaxError(f"bad {'black' if black else 'white'} run code at bit {br.pos}")
        if len(code) < ln:
            raise FaxError("truncated run code")


def _changes(row) -> list[int]:
    """Changing-element positions (pixel differs from the one to its left,
    with an imaginary white pixel before the line). Colors alternate:
    even-index changes are to black, odd to white."""
    out = []
    prev = 0
    for i, px in enumerate(row):
        if px != prev:
            out.append(i)
            prev = px
    return out


def _row_from_changes(changes: list[int], columns: int) -> bytearray:
    row = bytearray(columns)
    color = 0
    prev = 0
    for pos in changes + [columns]:
        if color:
            for i in range(prev, min(pos, columns)):
                row[i] = 1
        color ^= 1
        prev = pos
    return row


def _b1_b2(ref: list[int], a0: int, color: int) -> tuple[int, int]:
    """First changing element on the reference line right of a0 with color
    opposite to ``color``, and the next change after it."""
    import bisect

    i = bisect.bisect_right(ref, a0)
    # change index parity gives its color: even -> black(1), odd -> white(0)
    want = 1 - color
    if i < len(ref) and (1 if i % 2 == 0 else 0) != want:
        i += 1
    b1 = ref[i] if i < len(ref) else -1
    b2 = ref[i + 1] if i + 1 < len(ref) else -1
    return b1, b2


def g4_decode(data: bytes, columns: int, rows: int) -> list[bytearray]:
    """T.6 (Group 4) decode → ``rows`` lines of 0/1 pixels (1 = black)."""
    _check_fax_dims(columns, rows)
    br = _BitReader(data)
    ref = _changes([0] * columns)  # imaginary all-white reference line
    out: list[bytearray] = []
    while len(out) < rows:
        if br.peek(len(_EOFB)) == _EOFB:
            break
        cur: list[int] = []
        a0, color = -1, 0
        while True:
            b1, b2 = _b1_b2(ref, a0, color)
            if b1 < 0:
                b1 = columns
            if b2 < 0:
                b2 = columns
            bits = br.peek(7)
            if not bits:
                raise FaxError("unexpected end of data")
            if bits.startswith("1"):  # V0
                br.skip(1)
                cur.append(b1)
                a0, color = b1, color ^ 1
            elif bits.startswith("011"):  # VR1
                br.skip(3)
                cur.append(b1 + 1)
                a0, color = b1 + 1, color ^ 1
            elif bits.startswith("010"):  # VL1
                br.skip(3)
                cur.append(b1 - 1)
                a0, color = b1 - 1, color ^ 1
            elif bits.startswith("001"):  # horizontal
                br.skip(3)
                r1 = _read_run(br, black=bool(color))
                r2 = _read_run(br, black=not color)
                start = 0 if a0 < 0 else a0
                cur.append(start + r1)
                cur.append(start + r1 + r2)
                a0 = start + r1 + r2
            elif bits.startswith("0001"):  # pass
                br.skip(4)
                a0 = b2
            elif bits.startswith("000011"):  # VR2
                br.skip(6)
                cur.append(b1 + 2)
                a0, color = b1 + 2, color ^ 1
            elif bits.startswith("000010"):  # VL2
                br.skip(6)
                cur.append(b1 - 2)
                a0, color = b1 - 2, color ^ 1
            elif bits.startswith("0000011"):  # VR3
                br.skip(7)
                cur.append(b1 + 3)
                a0, color = b1 + 3, color ^ 1
            elif bits.startswith("0000010"):  # VL3
                br.skip(7)
                cur.append(b1 - 3)
                a0, color = b1 - 3, color ^ 1
            else:
                raise FaxError(f"bad mode code {bits!r} at bit {br.pos}")
            if a0 >= columns:
                break
        row = _row_from_changes(cur, columns)
        out.append(row)
        ref = _changes(row)
    if len(out) < rows:
        raise FaxError(f"decoded {len(out)} of {rows} rows")
    return out


def _encode_run(bits: list[str], run: int, black: bool) -> None:
    table = _BLACK if black else _WHITE
    while run >= 64:
        makeup = min(run - run % 64, 2560)
        if makeup not in table and makeup not in _EXT:
            makeup = 1728
        bits.append(_EXT.get(makeup) or table[makeup])
        run -= makeup
    bits.append(table[run])


def g4_encode(rows: list, columns: int) -> bytes:
    """T.6 (Group 4) encode of 0/1 pixel rows (1 = black), EOFB-terminated."""
    bits: list[str] = []
    ref = _changes([0] * columns)
    for row in rows:
        cur = _changes(row)
        a0, color = -1, 0
        while True:
            b1, b2 = _b1_b2(ref, a0, color)
            if b1 < 0:
                b1 = columns
            if b2 < 0:
                b2 = columns
            import bisect

            i = bisect.bisect_right(cur, a0)
            a1 = cur[i] if i < len(cur) else columns
            if b2 < a1:
                bits.append("0001")  # pass
                a0 = b2
            elif abs(a1 - b1) <= 3:
                bits.append(
                    {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010",
                     3: "0000011", -3: "0000010"}[a1 - b1]
                )
                a0, color = a1, color ^ 1
            else:  # horizontal
                a2 = cur[i + 1] if i + 1 < len(cur) else columns
                start = 0 if a0 < 0 else a0
                bits.append("001")
                _encode_run(bits, a1 - start, black=bool(color))
                _encode_run(bits, a2 - a1, black=not color)
                a0 = a2
            if a0 >= columns:
                break
        ref = cur
    bits.append(_EOFB)
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def g3_1d_decode(
    data: bytes, columns: int, rows: int, byte_align: bool = False
) -> list[bytearray]:
    """T.4 one-dimensional (MH) decode, K=0 layout without EOL markers;
    ``byte_align`` = the PDF /EncodedByteAlign flag (each coded line
    starts on a byte boundary). Each line is white-first alternating
    runs."""
    _check_fax_dims(columns, rows)
    br = _BitReader(data)
    out: list[bytearray] = []
    for _ in range(rows):
        if byte_align and br.pos % 8:
            br.skip(8 - br.pos % 8)
        row = bytearray(columns)
        pos, color = 0, 0
        while pos < columns:
            run = _read_run(br, black=bool(color))
            if color:
                for i in range(pos, min(pos + run, columns)):
                    row[i] = 1
            pos += run
            color ^= 1
        if pos != columns:
            raise FaxError(f"1-D row overrun: {pos} > {columns}")
        out.append(row)
    return out


def g3_1d_encode(rows: list, columns: int, byte_align: bool = False) -> bytes:
    bits: list[str] = []
    for row in rows:
        if byte_align:
            n = sum(len(b) for b in bits)
            if n % 8:
                bits.append("0" * (8 - n % 8))
        pos, color = 0, 0
        changes = _changes(row) + [columns]
        for nxt in changes:
            _encode_run(bits, nxt - pos, black=bool(color))
            pos, color = nxt, color ^ 1
        if pos < columns:
            _encode_run(bits, columns - pos, black=bool(color))
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))
