"""Stdlib PDF document parser for the A3 real kernel (VERDICT r4 #5).

The reference delegates PDF text to pdfplumber (text_extraction.py:63-75),
which walks the real document object graph: cross-reference tables (classic
AND PDF-1.5 compressed xref streams), object streams, the page tree in
document order, and per-font ToUnicode CMaps for CID/Type0 text. Round 4's
kernel only scanned top-level streams in byte order with single-byte
decoding; this module adds the missing graph walk so multi-byte (Type0 /
Identity-H) text, hex-string show operators, and xref-stream PDFs decode
correctly.

Scope (everything stdlib — zlib only external dep):
  * object model: dicts, arrays, names, literal + hex strings, numbers,
    booleans, null, indirect references
  * xref: classic ``xref`` tables, ``/Type /XRef`` streams (W-field decode,
    PNG predictors 0-4 via /DecodeParms), /Prev chains, hybrid files
  * object streams (``/Type /ObjStm``): header pairs + embedded objects
  * page tree walk (/Root → /Pages → /Kids, inherited /Resources), page
    /Contents as single stream or array of streams
  * fonts: /ToUnicode CMap (bfchar, scalar + array bfrange), 2-byte code
    path for /Subtype /Type0, latin-1 fallback for simple fonts
  * text operators: Tj ' " TJ with literal and hex strings, Tf font switch
  * encryption: standard security handler, RC4 (V=1/2, R=2/3) with an
    empty user password — the ubiquitous "owner-locked" case; per-object
    keys per PDF 1.7 §7.6.2, strings and streams decrypted at load, xref
    streams and the /Encrypt dict exempt per spec
  * filters: FlateDecode, ASCIIHexDecode, RunLengthDecode (+ DCTDecode
    rasters via jpegmini at the page-image layer)

Any structural failure raises ``PdfParseError`` so the caller can fall back
to the round-4 stream-order kernel (kept in extraction.py) and, past that,
the deterministic stub — the extraction operator stays total.
"""

from __future__ import annotations

import hashlib
import re
import zlib

__all__ = ["PdfParseError", "pdf_document_text"]

# Standard security handler padding string (PDF 1.7 Table 3.19 / §7.6.3.3)
_PW_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric — used for both the decrypt path and
    the test fixtures' encrypt path)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for t, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[t] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _std_file_key(
    user_pw: bytes, o: bytes, p: int, id0: bytes, r: int, n: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2 (PDF 1.7 §7.6.3.3): the file encryption key from the
    (padded) user password, /O, /P, and the first document ID."""
    h = hashlib.md5()
    h.update((user_pw + _PW_PAD)[:32])
    h.update(o[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def _std_user_check(key: bytes, u: bytes, id0: bytes, r: int) -> bool:
    """Algorithms 4/5 (compute /U from the key) compared against the stored
    /U — true iff the empty user password opens the file."""
    if not isinstance(u, bytes):
        return False
    if r == 2:
        return _rc4(key, _PW_PAD) == u[:32]
    x = _rc4(key, hashlib.md5(_PW_PAD + id0).digest())
    for i in range(1, 20):
        x = _rc4(bytes(b ^ i for b in key), x)
    return x == u[:16]


def _hash_2b(pw: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B — the hardened hash for /R 6 key
    derivation (iterated SHA-2 family keyed through AES-128-CBC)."""
    from frappe_data_pipelines_spark.operators.aesmini import aes_cbc_encrypt

    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _aes_v5_file_key(enc: dict, resolve) -> bytes:
    """Algorithm 2.A (ISO 32000-2 §7.6.4.3.3) for the empty user password:
    validate against /U's validation salt, then unwrap the file key from
    /UE with the key-salt-derived intermediate key."""
    from frappe_data_pipelines_spark.operators.aesmini import aes_cbc_decrypt

    r = int(resolve(enc.get("R", 6)) or 6)
    u = resolve(enc.get("U"))
    ue = resolve(enc.get("UE"))
    if not isinstance(u, bytes) or not isinstance(ue, bytes) or len(u) < 48:
        raise PdfParseError("missing /U or /UE for V5 encryption")
    vsalt, ksalt = u[32:40], u[40:48]
    if r == 6:
        valid = _hash_2b(b"", vsalt, b"")
        ikey = _hash_2b(b"", ksalt, b"")
    else:  # R=5 (deprecated ExtensionLevel 3): single SHA-256
        valid = hashlib.sha256(vsalt).digest()
        ikey = hashlib.sha256(ksalt).digest()
    if valid != u[:32]:
        raise PdfParseError("encrypted PDF requires a user password")
    return aes_cbc_decrypt(ikey, bytes(16), ue[:32], unpad=False)


class PdfParseError(ValueError):
    """Structural parse failure — caller falls back to simpler kernels."""


# Per-stream decompressed-size ceiling (the imaging/jbig2 _MAX_PIXELS
# convention applied to stream filters): Flate/RunLength bombs in crawled
# PDFs must dead-letter via PdfParseError, never expand unbounded on an
# executor. 64 MB decompressed is far past any stream this engine reads.
_MAX_STREAM = 1 << 26


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int) -> None:
        self.num, self.gen = num, gen

    def __repr__(self) -> str:  # pragma: no cover — debug aid
        return f"{self.num} {self.gen} R"


class Name(str):
    """PDF /Name — distinct from strings so dict keys compare cleanly."""


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos : pos + 1]
        if c in (b"\x00", b"\t", b"\n", b"\x0c", b"\r", b" "):
            pos += 1
        elif c == b"%":  # comment to end of line
            while pos < n and data[pos : pos + 1] not in (b"\r", b"\n"):
                pos += 1
        else:
            break
    return pos


def _read_token_word(data: bytes, pos: int) -> tuple[bytes, int]:
    start = pos
    n = len(data)
    while pos < n and data[pos] not in _WS and data[pos] not in _DELIM:
        pos += 1
    return data[start:pos], pos


_LITERAL_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08", b"f": b"\x0c",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _read_literal_string(data: bytes, pos: int) -> tuple[bytes, int]:
    """pos points just past the opening '('. Handles nesting, escapes,
    octal codes, and backslash-newline continuations (PDF 7.3.4.2)."""
    out = bytearray()
    depth = 1
    n = len(data)
    while pos < n:
        c = data[pos]
        if c == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = data[pos : pos + 1]
            if e.isdigit() and e < b"8":
                oct_digits = e
                pos += 1
                while len(oct_digits) < 3 and pos < n and data[pos : pos + 1].isdigit() and data[pos : pos + 1] < b"8":
                    oct_digits += data[pos : pos + 1]
                    pos += 1
                out.append(int(oct_digits, 8) & 0xFF)
                continue
            if e in (b"\r", b"\n"):  # line continuation: swallow EOL
                pos += 1
                if e == b"\r" and data[pos : pos + 1] == b"\n":
                    pos += 1
                continue
            out += _LITERAL_ESCAPES.get(e, e)
            pos += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    raise PdfParseError("unterminated literal string")


def _read_hex_string(data: bytes, pos: int) -> tuple[bytes, int]:
    """pos points just past the opening '<' (already known not '<<')."""
    end = data.find(b">", pos)
    if end < 0:
        raise PdfParseError("unterminated hex string")
    hexdigits = re.sub(rb"[^0-9A-Fa-f]", b"", data[pos:end])
    if len(hexdigits) % 2:
        hexdigits += b"0"  # odd count: final digit padded with 0 (7.3.4.3)
    return bytes.fromhex(hexdigits.decode("ascii")), end + 1


def _read_name(data: bytes, pos: int) -> tuple[Name, int]:
    """pos points just past the '/'. #xx hex escapes per 7.3.5."""
    raw, pos = _read_token_word(data, pos)
    if b"#" in raw:
        raw = re.sub(
            rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw
        )
    return Name(raw.decode("latin-1")), pos


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


def parse_object(data: bytes, pos: int):
    """Parse one PDF object at ``pos``; returns (object, next_pos)."""
    pos = _skip_ws(data, pos)
    if pos >= len(data):
        raise PdfParseError("unexpected end of data")
    c = data[pos : pos + 1]
    if data[pos : pos + 2] == b"<<":
        return _parse_dict(data, pos + 2)
    if c == b"<":
        return _read_hex_string(data, pos + 1)
    if c == b"(":
        return _read_literal_string(data, pos + 1)
    if c == b"/":
        return _read_name(data, pos + 1)
    if c == b"[":
        arr = []
        pos += 1
        while True:
            pos = _skip_ws(data, pos)
            if data[pos : pos + 1] == b"]":
                return arr, pos + 1
            if pos >= len(data):
                raise PdfParseError("unterminated array")
            item, pos = parse_object(data, pos)
            arr.append(item)
    m = _NUM_RE.match(data, pos)
    if m and m.start() == pos:
        tok = m.group(0)
        end = m.end()
        if b"." not in tok:
            # lookahead for an indirect reference: INT INT R
            m2 = re.match(rb"\s+(\d+)\s+R(?![A-Za-z0-9])", data[end : end + 32])
            if m2:
                return Ref(int(tok), int(m2.group(1))), end + m2.end()
            return int(tok), end
        return float(tok), end
    word, end = _read_token_word(data, pos)
    if word == b"true":
        return True, end
    if word == b"false":
        return False, end
    if word == b"null":
        return None, end
    raise PdfParseError(f"cannot parse object at {pos}: {data[pos:pos+16]!r}")


def _parse_dict(data: bytes, pos: int):
    d: dict[str, object] = {}
    while True:
        pos = _skip_ws(data, pos)
        if data[pos : pos + 2] == b">>":
            return d, pos + 2
        if data[pos : pos + 1] != b"/":
            raise PdfParseError(f"dict key is not a name at {pos}")
        key, pos = _read_name(data, pos + 1)
        val, pos = parse_object(data, pos)
        d[str(key)] = val
    return d, pos


# ---------------------------------------------------------------------------
# Stream filters
# ---------------------------------------------------------------------------


def _png_unpredict(data: bytes, columns: int, colors: int = 1, bpc: int = 8) -> bytes:
    """Undo PNG row predictors 0-4 (used by xref streams, /Predictor >= 10)."""
    bpp = max(1, (colors * bpc) // 8)
    row_len = columns * bpp
    if row_len <= 0:
        raise PdfParseError(f"bad predictor columns {columns}")
    if 1 + row_len > len(data):
        # zero full rows; return before allocating a hostile-width prev row
        return b""
    out = bytearray()
    prev = bytearray(row_len)
    pos = 0
    while pos + 1 + row_len <= len(data):
        ftype = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + row_len])
        pos += 1 + row_len
        if ftype == 1:  # Sub
            for i in range(bpp, row_len):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(row_len):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(row_len):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(row_len):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                row[i] = (row[i] + pr) & 0xFF
        elif ftype != 0:
            raise PdfParseError(f"unsupported PNG predictor row filter {ftype}")
        out += row
        prev = row
    return bytes(out)


def _decode_stream(sdict: dict, raw: bytes, resolve) -> bytes:
    filters = sdict.get("Filter")
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    parms = sdict.get("DecodeParms") or sdict.get("DP")
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    data = raw
    for f, p in zip(filters, parms):
        f = str(resolve(f))
        if f in ("FlateDecode", "Fl"):
            try:
                # bounded inflate: a flate bomb in a crawled PDF must
                # dead-letter (PdfParseError), not expand to gigabytes
                d = zlib.decompressobj()
                data = d.decompress(data, _MAX_STREAM + 1)
            except zlib.error as e:
                raise PdfParseError(f"FlateDecode: {e}") from e
            if len(data) > _MAX_STREAM:
                raise PdfParseError("FlateDecode output exceeds stream cap")
            if not d.eof:
                # plain zlib.decompress raised on truncation; decompressobj
                # returns the partial prefix silently — keep the old
                # contract (truncated stream = structural failure, never a
                # half-decoded xref/object stream parsed as valid)
                raise PdfParseError("FlateDecode: incomplete or truncated stream")
        elif f in ("ASCIIHexDecode", "AHx"):
            hx = re.sub(rb"[^0-9A-Fa-f>]", b"", data).rstrip(b">")
            if len(hx) % 2:
                hx += b"0"
            data = bytes.fromhex(hx.decode("ascii"))
        elif f in ("RunLengthDecode", "RL"):
            out = bytearray()
            i = 0
            while i < len(data):
                length = data[i]
                if length == 128:  # EOD
                    break
                if length < 128:
                    out += data[i + 1 : i + 2 + length]
                    i += 2 + length
                else:
                    out += data[i + 1 : i + 2] * (257 - length)
                    i += 2
                if len(out) > _MAX_STREAM:
                    raise PdfParseError("RunLengthDecode output exceeds stream cap")
            data = bytes(out)
        else:
            raise PdfParseError(f"unsupported stream filter /{f}")
        p = resolve(p)
        if isinstance(p, dict):
            pred = resolve(p.get("Predictor", 1)) or 1
            if pred >= 10:
                data = _png_unpredict(
                    data,
                    int(resolve(p.get("Columns", 1)) or 1),
                    int(resolve(p.get("Colors", 1)) or 1),
                    int(resolve(p.get("BitsPerComponent", 8)) or 8),
                )
            elif pred != 1:
                raise PdfParseError(f"unsupported predictor {pred}")
    return data


# ---------------------------------------------------------------------------
# Document: xref resolution + object loading
# ---------------------------------------------------------------------------

_OBJ_HEADER_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class PdfDocument:
    """Lazy object store over one PDF payload.

    xref entries: obj_num -> ("at", byte_offset) | ("in", objstm_num, index).
    Built from the startxref chain when present, else reconstructed by
    scanning ``N G obj`` headers (the same recovery move real viewers make
    for damaged files — sample.pdf ships without any xref).
    """

    def __init__(self, payload: bytes) -> None:
        self.data = payload
        self.xref: dict[int, tuple] = {}
        self.trailer: dict[str, object] = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, dict[int, object]] = {}
        self._enc_key: bytes | None = None
        self._cipher = "rc4"
        self._encrypt_num = -1
        try:
            self._load_xref_chain()
        except PdfParseError:
            self.xref.clear()
        if not self.xref or "Root" not in self.trailer:
            self._reconstruct()
        if "Root" not in self.trailer:
            raise PdfParseError("no /Root found in trailer")
        if self.trailer.get("Encrypt") is not None:
            self._setup_encryption(self.trailer["Encrypt"])

    # -- encryption (standard security handler, RC4) ------------------------

    def _setup_encryption(self, enc_ref) -> None:
        """Standard security handler with an empty user password (the
        owner-locked case pdfplumber also opens transparently): RC4
        (V=1/2, R=2/3), AES-128 (/AESV2, V=4 R=4) and AES-256 (/AESV3,
        V=5 R=5/6). Non-Standard handlers raise — the caller's fallback
        chain keeps extraction total."""
        if isinstance(enc_ref, Ref):
            self._encrypt_num = enc_ref.num
        enc = self.resolve(enc_ref)
        if not isinstance(enc, dict):
            raise PdfParseError("malformed /Encrypt dictionary")
        filt = str(self.resolve(enc.get("Filter")))
        v = int(self.resolve(enc.get("V", 0)) or 0)
        r = int(self.resolve(enc.get("R", 2)) or 2)
        if filt != "Standard" or (v, r) not in (
            (1, 2), (1, 3), (2, 2), (2, 3), (4, 4), (5, 5), (5, 6),
        ):
            raise PdfParseError(f"unsupported encryption /{filt} V={v} R={r}")
        if v == 5:
            self._enc_key = _aes_v5_file_key(enc, self.resolve)
            self._cipher = "aes"
            self._cache.clear()
            self._objstm_cache.clear()
            return
        if v == 4:
            # crypt-filter dictionary must name AESV2 (or V2=RC4) for StdCF
            cf = self.resolve(enc.get("CF")) or {}
            stmf = str(self.resolve(enc.get("StmF", Name("Identity"))))
            stdcf = self.resolve(cf.get(stmf)) if isinstance(cf, dict) else None
            cfm = str(self.resolve(stdcf.get("CFM"))) if isinstance(stdcf, dict) else "V2"
            if cfm == "AESV2":
                self._cipher = "aes"
            elif cfm == "V2":
                self._cipher = "rc4"
            else:
                raise PdfParseError(f"unsupported crypt filter /{cfm}")
        o = self.resolve(enc.get("O"))
        u = self.resolve(enc.get("U"))
        if not isinstance(o, bytes) or not isinstance(u, bytes):
            raise PdfParseError("missing /O or /U in /Encrypt")
        p = int(self.resolve(enc.get("P", -1)))
        n = int(self.resolve(enc.get("Length", 40)) or 40) // 8 if r >= 3 else 5
        if not 5 <= n <= 16:
            raise PdfParseError(f"bad key length {n * 8}")
        ids = self.resolve(self.trailer.get("ID"))
        id0 = ids[0] if isinstance(ids, list) and ids else b""
        id0 = self.resolve(id0)
        if not isinstance(id0, bytes):
            id0 = b""
        enc_meta = self.resolve(enc.get("EncryptMetadata")) is not False
        key = _std_file_key(b"", o, p, id0, r, n, encrypt_metadata=enc_meta)
        if not _std_user_check(key, u, id0, r):
            raise PdfParseError("encrypted PDF requires a user password")
        self._enc_key = key
        # anything cached pre-key (reconstruction probes) is ciphertext
        self._cache.clear()
        self._objstm_cache.clear()

    def _object_key(self, num: int, gen: int) -> bytes:
        if self._cipher == "aes" and len(self._enc_key) == 32:
            return self._enc_key  # /AESV3: file key used directly (§7.6.4)
        mat = self._enc_key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
        if self._cipher == "aes":
            mat += b"sAlT"  # /AESV2 salt (PDF 1.7 Algorithm 1 step b)
        return hashlib.md5(mat).digest()[: min(len(self._enc_key) + 5, 16)]

    def _decrypt_data(self, num: int, gen: int, data: bytes) -> bytes:
        key = self._object_key(num, gen)
        if self._cipher == "aes":
            from frappe_data_pipelines_spark.operators.aesmini import aes_cbc_decrypt

            if len(data) < 16:
                return b""
            return aes_cbc_decrypt(key, data[:16], data[16:])
        return _rc4(key, data)

    def _decrypt_strings(self, obj, num: int, gen: int):
        if isinstance(obj, bytes):
            return self._decrypt_data(num, gen, obj)
        if isinstance(obj, list):
            return [self._decrypt_strings(x, num, gen) for x in obj]
        if isinstance(obj, dict):
            return {k: self._decrypt_strings(x, num, gen) for k, x in obj.items()}
        return obj

    # -- xref ---------------------------------------------------------------

    def _load_xref_chain(self) -> None:
        tail = self.data[-1024:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise PdfParseError("no startxref")
        offset = int(m.group(1))
        seen: set[int] = set()
        while offset and offset not in seen:
            seen.add(offset)
            offset = self._load_xref_section(offset)

    def _load_xref_section(self, offset: int) -> int:
        """Parse one xref section (classic or stream) at ``offset``; merge
        entries (earlier sections in the chain win — they are newer) and
        return the /Prev offset or 0."""
        pos = _skip_ws(self.data, offset)
        if self.data[pos : pos + 4] == b"xref":
            return self._load_classic_xref(pos + 4)
        return self._load_xref_stream(pos)

    def _load_classic_xref(self, pos: int) -> int:
        data = self.data
        while True:
            pos = _skip_ws(data, pos)
            if data[pos : pos + 7] == b"trailer":
                tdict, _ = parse_object(data, pos + 7)
                for k, v in tdict.items():
                    self.trailer.setdefault(k, v)
                # hybrid files: /XRefStm points at a parallel xref stream
                if "XRefStm" in tdict:
                    try:
                        self._load_xref_stream(int(tdict["XRefStm"]))
                    except PdfParseError:
                        pass
                return int(tdict.get("Prev", 0))
            m = re.match(rb"(\d+)\s+(\d+)", data[pos : pos + 32])
            if not m:
                raise PdfParseError(f"bad xref subsection header at {pos}")
            start, count = int(m.group(1)), int(m.group(2))
            pos = _skip_ws(data, pos + m.end())
            for i in range(count):
                entry = data[pos : pos + 20]
                em = re.match(rb"(\d{10})\s+(\d{5})\s+([nf])", entry)
                if not em:
                    raise PdfParseError(f"bad xref entry at {pos}")
                if em.group(3) == b"n":
                    self.xref.setdefault(start + i, ("at", int(em.group(1))))
                # entries are fixed 20 bytes, but tolerate 18/19-byte writers
                pos += em.end()
                pos = _skip_ws(data, pos)

    def _load_xref_stream(self, pos: int) -> int:
        sdict, raw = self._stream_at(pos)
        if str(sdict.get("Type")) != "XRef":
            raise PdfParseError("object at startxref is not an XRef stream")
        data = _decode_stream(sdict, raw, self.resolve)
        w = [int(x) for x in sdict["W"]]
        size = int(sdict["Size"])
        index = sdict.get("Index", [0, size])
        entry_len = sum(w)
        fields_pos = 0

        def field(buf: bytes, width: int, default: int) -> int:
            return int.from_bytes(buf, "big") if width else default

        pairs = [(int(index[i]), int(index[i + 1])) for i in range(0, len(index), 2)]
        for start, count in pairs:
            for i in range(count):
                if fields_pos + entry_len > len(data):
                    raise PdfParseError("xref stream too short")
                buf = data[fields_pos : fields_pos + entry_len]
                fields_pos += entry_len
                f1 = field(buf[: w[0]], w[0], 1)
                f2 = field(buf[w[0] : w[0] + w[1]], w[1], 0)
                f3 = field(buf[w[0] + w[1] :], w[2], 0)
                num = start + i
                if f1 == 1:
                    self.xref.setdefault(num, ("at", f2))
                elif f1 == 2:
                    self.xref.setdefault(num, ("in", f2, f3))
        for k, v in sdict.items():
            if k not in ("W", "Index", "Filter", "DecodeParms", "Length", "Type"):
                self.trailer.setdefault(k, v)
        return int(sdict.get("Prev", 0))

    def _reconstruct(self) -> None:
        """Recovery path: scan all ``N G obj`` headers; last definition of a
        number wins (incremental updates append later)."""
        for m in _OBJ_HEADER_RE.finditer(self.data):
            self.xref[int(m.group(1))] = ("at", m.start())
        for m in re.finditer(rb"trailer", self.data):
            try:
                tdict, _ = parse_object(self.data, m.end())
            except PdfParseError:
                continue
            if isinstance(tdict, dict):
                self.trailer.update(tdict)
        if "Root" not in self.trailer:
            # xref-stream-only file with a broken chain: look for a Catalog
            for num, entry in self.xref.items():
                try:
                    obj = self.load(num)
                except PdfParseError:
                    continue
                if isinstance(obj, dict) and str(obj.get("Type")) == "Catalog":
                    self.trailer["Root"] = Ref(num, 0)
                    break
            # also surface any ObjStm members so reconstruction sees them
            if "Root" not in self.trailer:
                for num in list(self.xref):
                    try:
                        obj, raw = self._stream_at(self.xref[num][1])
                    except (PdfParseError, IndexError, TypeError):
                        continue
                    if isinstance(obj, dict) and str(obj.get("Type")) == "ObjStm":
                        for inner, iobj in self._load_objstm_by_offset(num).items():
                            self.xref.setdefault(inner, ("in", num, 0))
                            if (
                                isinstance(iobj, dict)
                                and str(iobj.get("Type")) == "Catalog"
                            ):
                                self.trailer["Root"] = Ref(inner, 0)

    # -- object loading -----------------------------------------------------

    def _stream_at(self, offset: int) -> tuple[dict, bytes]:
        """Parse the indirect object at ``offset``; must be a stream.
        Returns (dict, raw_stream_bytes) — raw is NOT decrypted (callers
        that read encrypted streams decrypt with their own object key)."""
        obj, raw, _gen = self._object_at(offset, want_stream=True)
        if raw is None:
            raise PdfParseError(f"object at {offset} is not a stream")
        return obj, raw

    def _object_at(self, offset: int, want_stream: bool = False):
        data = self.data
        m = _OBJ_HEADER_RE.match(data, _skip_ws(data, offset))
        if not m:
            raise PdfParseError(f"no object header at {offset}")
        gen = int(m.group(2))
        obj, pos = parse_object(data, m.end())
        pos = _skip_ws(data, pos)
        if data[pos : pos + 6] == b"stream":
            pos += 6
            if data[pos : pos + 2] == b"\r\n":
                pos += 2
            elif data[pos : pos + 1] == b"\n":
                pos += 1
            length = self.resolve(obj.get("Length")) if isinstance(obj, dict) else None
            if isinstance(length, int) and data[pos + length : pos + length + 32].lstrip().startswith(b"endstream"):
                raw = data[pos : pos + length]
            else:  # /Length missing or wrong: scan for endstream
                end = data.find(b"endstream", pos)
                if end < 0:
                    raise PdfParseError("unterminated stream")
                raw = data[pos:end].rstrip(b"\r\n")
            return obj, raw, gen
        return obj, None, gen

    def _load_objstm_by_offset(self, stm_num: int) -> dict[int, object]:
        if stm_num in self._objstm_cache:
            return self._objstm_cache[stm_num]
        entry = self.xref.get(stm_num)
        if not entry or entry[0] != "at":
            raise PdfParseError(f"object stream {stm_num} not at a byte offset")
        sdict, raw, gen = self._object_at(entry[1], want_stream=True)
        if raw is None:
            raise PdfParseError(f"ObjStm {stm_num} is not a stream")
        if self._enc_key is not None and stm_num != self._encrypt_num:
            # members inherit the container's decryption (PDF 1.7 §7.6.2)
            raw = self._decrypt_data(stm_num, gen, raw)
        data = _decode_stream(sdict, raw, self.resolve)
        n = int(self.resolve(sdict["N"]))
        first = int(self.resolve(sdict["First"]))
        header = data[:first].split()
        objs: dict[int, object] = {}
        for i in range(n):
            onum = int(header[2 * i])
            ooff = int(header[2 * i + 1])
            obj, _ = parse_object(data, first + ooff)
            objs[onum] = obj
        self._objstm_cache[stm_num] = objs
        return objs

    def load(self, num: int):
        if num in self._cache:
            return self._cache[num]
        entry = self.xref.get(num)
        if entry is None:
            raise PdfParseError(f"object {num} not in xref")
        if entry[0] == "at":
            obj, raw, gen = self._object_at(entry[1], want_stream=True)
            if self._enc_key is not None and num != self._encrypt_num:
                obj = self._decrypt_strings(obj, num, gen)
                if raw is not None:
                    raw = self._decrypt_data(num, gen, raw)
            result = (obj, raw) if raw is not None else obj
        else:
            _, stm_num, _idx = entry
            members = self._load_objstm_by_offset(stm_num)
            if num not in members:
                raise PdfParseError(f"object {num} missing from ObjStm {stm_num}")
            result = members[num]
        self._cache[num] = result
        return result

    def resolve(self, obj):
        """Follow indirect references to the concrete value."""
        depth = 0
        while isinstance(obj, Ref):
            obj = self.load(obj.num)
            depth += 1
            if depth > 32:
                raise PdfParseError("reference cycle")
        return obj

    def stream_bytes(self, obj) -> bytes:
        """Resolve ``obj`` to a stream and return its decoded data."""
        obj = self.resolve(obj)
        if not (isinstance(obj, tuple) and len(obj) == 2 and isinstance(obj[0], dict)):
            raise PdfParseError("expected a stream object")
        sdict, raw = obj
        return _decode_stream(sdict, raw, self.resolve)


# ---------------------------------------------------------------------------
# Page tree, fonts, content interpretation
# ---------------------------------------------------------------------------


def _walk_pages(doc: PdfDocument, node, inherited_resources, out: list) -> None:
    node = doc.resolve(node)
    if isinstance(node, tuple):
        node = node[0]
    if not isinstance(node, dict):
        raise PdfParseError("page tree node is not a dict")
    resources = node.get("Resources", inherited_resources)
    ntype = str(node.get("Type", ""))
    if ntype == "Pages" or (ntype != "Page" and "Kids" in node):
        for kid in doc.resolve(node.get("Kids", [])) or []:
            _walk_pages(doc, kid, resources, out)
    else:
        out.append((node, resources))


def _parse_tounicode(data: bytes) -> dict[int, str]:
    """Parse a ToUnicode CMap stream: bfchar pairs + bfrange (scalar and
    array destination forms). Destinations are UTF-16BE (9.10.3)."""

    def _clean(hexs: bytes) -> bytes:
        return re.sub(rb"\s", b"", hexs)

    def _dst_text(hexs: bytes) -> str:
        b = bytes.fromhex(_clean(hexs).decode("ascii"))
        return b.decode("utf-16-be", errors="replace")

    mapping: dict[int, str] = {}
    for block in re.findall(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for src, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f\s]+)>", block
        ):
            mapping[int(src, 16)] = _dst_text(dst)
    for block in re.findall(rb"beginbfrange(.*?)endbfrange", data, re.S):
        entry_re = re.compile(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f\s]+>)",
            re.S,
        )
        for m in entry_re.finditer(block):
            lo, hi = int(m.group(1), 16), int(m.group(2), 16)
            dst = m.group(3)
            if dst.startswith(b"["):
                dsts = re.findall(rb"<([0-9A-Fa-f\s]+)>", dst)
                for i, d in enumerate(dsts):
                    if lo + i > hi:
                        break
                    mapping[lo + i] = _dst_text(d)
            else:
                base_hex = _clean(dst.strip(b"<>"))
                base_bytes = bytes.fromhex(base_hex.decode("ascii"))
                base_int = int.from_bytes(base_bytes, "big")
                width = len(base_bytes)
                for c in range(lo, hi + 1):
                    val = base_int + (c - lo)
                    mapping[c] = val.to_bytes(width, "big").decode(
                        "utf-16-be", errors="replace"
                    )
            pos = m.end()
    return mapping


def _ttf_cmap_gid_to_unicode(data: bytes) -> dict[int, str]:
    """Glyph-id → unicode map recovered from an embedded TrueType font's
    'cmap' table (OpenType spec, public). For /Identity-H Type0 fonts the
    CID *is* the glyph id, so inverting the font's char→glyph cmap
    recovers text when the PDF carries no /ToUnicode — the same trick
    pdfminer's FontFile2 path uses. Supports the two subtable formats
    real fonts carry: 4 (BMP segmented) and 12 (full-range groups).
    Returns {} on any structural problem (caller falls back to (cid:N))."""
    try:
        if len(data) < 12:
            return {}
        num_tables = int.from_bytes(data[4:6], "big")
        cmap_off = None
        for i in range(num_tables):
            rec = 12 + 16 * i
            if data[rec : rec + 4] == b"cmap":
                cmap_off = int.from_bytes(data[rec + 8 : rec + 12], "big")
                break
        if cmap_off is None:
            return {}
        n_enc = int.from_bytes(data[cmap_off + 2 : cmap_off + 4], "big")
        subtables: dict[tuple[int, int], int] = {}
        for i in range(n_enc):
            rec = cmap_off + 4 + 8 * i
            plat = int.from_bytes(data[rec : rec + 2], "big")
            enc = int.from_bytes(data[rec + 2 : rec + 4], "big")
            off = int.from_bytes(data[rec + 4 : rec + 8], "big")
            subtables[(plat, enc)] = cmap_off + off
        # preference: full-repertoire (3,10) f12, then BMP (3,1)/(0,*) f4
        order = [(3, 10), (0, 4), (3, 1), (0, 3), (0, 0)]
        out: dict[int, str] = {}
        for key in order:
            if key not in subtables:
                continue
            st = subtables[key]
            fmt = int.from_bytes(data[st : st + 2], "big")
            if fmt == 12:
                n_groups = int.from_bytes(data[st + 12 : st + 16], "big")
                for g in range(n_groups):
                    base = st + 16 + 12 * g
                    c0 = int.from_bytes(data[base : base + 4], "big")
                    c1 = int.from_bytes(data[base + 4 : base + 8], "big")
                    g0 = int.from_bytes(data[base + 8 : base + 12], "big")
                    for c in range(c0, min(c1, c0 + 0xFFFF) + 1):
                        gid = g0 + (c - c0)
                        if gid and gid not in out:
                            out[gid] = chr(c)
            elif fmt == 4:
                seg2 = int.from_bytes(data[st + 6 : st + 8], "big")
                segs = seg2 // 2
                ends = st + 14
                starts = ends + seg2 + 2
                deltas = starts + seg2
                offsets = deltas + seg2

                def u16(p: int) -> int:
                    return int.from_bytes(data[p : p + 2], "big")

                for s in range(segs):
                    c0, c1 = u16(starts + 2 * s), u16(ends + 2 * s)
                    if c0 == 0xFFFF:
                        continue
                    delta, roff = u16(deltas + 2 * s), u16(offsets + 2 * s)
                    for c in range(c0, min(c1, 0xFFFE) + 1):
                        if roff == 0:
                            gid = (c + delta) & 0xFFFF
                        else:
                            gp = offsets + 2 * s + roff + 2 * (c - c0)
                            gid = u16(gp)
                            if gid:
                                gid = (gid + delta) & 0xFFFF
                        if gid and gid not in out:
                            out[gid] = chr(c)
            if out:
                return out
        return out
    except Exception:
        return {}


# CFF standard strings (Appendix A of the CFF spec, public): SID 0..390.
# Charsets of non-CID CFF fonts map glyph ids to these names (or to the
# font's own string INDEX past 390); the names resolve to text via AGL.
_CFF_STD_STRINGS = (
    ".notdef space exclam quotedbl numbersign dollar percent ampersand "
    "quoteright parenleft parenright asterisk plus comma hyphen period slash "
    "zero one two three four five six seven eight nine colon semicolon less "
    "equal greater question at A B C D E F G H I J K L M N O P Q R S T U V W "
    "X Y Z bracketleft backslash bracketright asciicircum underscore "
    "quoteleft a b c d e f g h i j k l m n o p q r s t u v w x y z braceleft "
    "bar braceright asciitilde exclamdown cent sterling fraction yen florin "
    "section currency quotesingle quotedblleft guillemotleft guilsinglleft "
    "guilsinglright fi fl endash dagger daggerdbl periodcentered paragraph "
    "bullet quotesinglbase quotedblbase quotedblright guillemotright "
    "ellipsis perthousand questiondown grave acute circumflex tilde macron "
    "breve dotaccent dieresis ring cedilla hungarumlaut ogonek caron emdash "
    "AE ordfeminine Lslash Oslash OE ordmasculine ae dotlessi lslash oslash "
    "oe germandbls onesuperior logicalnot mu trademark Eth onehalf plusminus "
    "Thorn onequarter divide brokenbar degree thorn threequarters "
    "twosuperior registered minus eth multiply threesuperior copyright "
    "Aacute Acircumflex Adieresis Agrave Aring Atilde Ccedilla Eacute "
    "Ecircumflex Edieresis Egrave Iacute Icircumflex Idieresis Igrave "
    "Ntilde Oacute Ocircumflex Odieresis Ograve Otilde Scaron Uacute "
    "Ucircumflex Udieresis Ugrave Yacute Ydieresis Zcaron aacute "
    "acircumflex adieresis agrave aring atilde ccedilla eacute ecircumflex "
    "edieresis egrave iacute icircumflex idieresis igrave ntilde oacute "
    "ocircumflex odieresis ograve otilde scaron uacute ucircumflex "
    "udieresis ugrave yacute ydieresis zcaron exclamsmall Hungarumlautsmall "
    "dollaroldstyle dollarsuperior ampersandsmall Acutesmall "
    "parenleftsuperior parenrightsuperior twodotenleader onedotenleader "
    "zerooldstyle oneoldstyle twooldstyle threeoldstyle fouroldstyle "
    "fiveoldstyle sixoldstyle sevenoldstyle eightoldstyle nineoldstyle "
    "commasuperior threequartersemdash periodsuperior questionsmall "
    "asuperior bsuperior centsuperior dsuperior esuperior isuperior "
    "lsuperior msuperior nsuperior osuperior rsuperior ssuperior tsuperior "
    "ff ffi ffl parenleftinferior parenrightinferior Circumflexsmall "
    "hyphensuperior Gravesmall Asmall Bsmall Csmall Dsmall Esmall Fsmall "
    "Gsmall Hsmall Ismall Jsmall Ksmall Lsmall Msmall Nsmall Osmall Psmall "
    "Qsmall Rsmall Ssmall Tsmall Usmall Vsmall Wsmall Xsmall Ysmall Zsmall "
    "colonmonetary onefitted rupiah Tildesmall exclamdownsmall centoldstyle "
    "Lslashsmall Scaronsmall Zcaronsmall Dieresissmall Brevesmall "
    "Caronsmall Dotaccentsmall Macronsmall figuredash hypheninferior "
    "Ogoneksmall Ringsmall Cedillasmall questiondownsmall oneeighth "
    "threeeighths fiveeighths seveneighths onethird twothirds zerosuperior "
    "foursuperior fivesuperior sixsuperior sevensuperior eightsuperior "
    "ninesuperior zeroinferior oneinferior twoinferior threeinferior "
    "fourinferior fiveinferior sixinferior seveninferior eightinferior "
    "nineinferior centinferior dollarinferior periodinferior commainferior "
    "Agravesmall Aacutesmall Acircumflexsmall Atildesmall Adieresissmall "
    "Aringsmall AEsmall Ccedillasmall Egravesmall Eacutesmall "
    "Ecircumflexsmall Edieresissmall Igravesmall Iacutesmall "
    "Icircumflexsmall Idieresissmall Ethsmall Ntildesmall Ogravesmall "
    "Oacutesmall Ocircumflexsmall Otildesmall Odieresissmall OEsmall "
    "Oslashsmall Ugravesmall Uacutesmall Ucircumflexsmall Udieresissmall "
    "Yacutesmall Thornsmall Ydieresissmall 001.000 001.001 001.002 001.003 "
    "Black Bold Book Light Medium Regular Roman Semibold"
).split()


def _cff_index(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """One CFF INDEX → (items, position after the INDEX)."""
    count = int.from_bytes(data[pos : pos + 2], "big")
    if count == 0:
        return [], pos + 2
    off_size = data[pos + 2]
    p = pos + 3
    offs = []
    for _ in range(count + 1):
        offs.append(int.from_bytes(data[p : p + off_size], "big"))
        p += off_size
    base = p - 1  # offsets are 1-based relative to the byte before data
    items = [data[base + offs[i] : base + offs[i + 1]] for i in range(count)]
    return items, base + offs[-1]


def _cff_dict(data: bytes) -> dict[int, list]:
    """CFF DICT → {operator (1200+x for the 12-escape page): operands}."""
    out: dict[int, list] = {}
    operands: list = []
    i = 0
    while i < len(data):
        b0 = data[i]
        if b0 <= 21:
            op = b0
            i += 1
            if b0 == 12:
                op = 1200 + data[i]
                i += 1
            out[op] = operands
            operands = []
        elif b0 == 28:
            operands.append(int.from_bytes(data[i + 1 : i + 3], "big", signed=True))
            i += 3
        elif b0 == 29:
            operands.append(int.from_bytes(data[i + 1 : i + 5], "big", signed=True))
            i += 5
        elif b0 == 30:  # real number: BCD nibbles until 0xf terminator
            i += 1
            while i < len(data):
                b = data[i]
                i += 1
                if (b & 0x0F) == 0x0F or (b >> 4) == 0x0F:
                    break
            operands.append(0.0)
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + data[i + 1] + 108)
            i += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - data[i + 1] - 108)
            i += 2
        else:
            i += 1
    return out


def _cff_gid_to_unicode(data: bytes) -> dict[int, str]:
    """Glyph id → text for a NON-CID-keyed CFF (Type1C) font program, via
    the charset's glyph names resolved through AGL — the recovery pdfminer
    applies when a Type0 font carries neither /ToUnicode nor a TrueType
    cmap. CID-keyed CFFs (Top DICT has ROS) get {} — their charset holds
    bare CIDs, not names, so there is nothing to recover. Accepts a bare
    CFF or an OpenType (OTTO) wrapper with a 'CFF ' table."""
    try:
        if data[:4] == b"OTTO":  # locate the CFF table inside an OTF
            n_tables = int.from_bytes(data[4:6], "big")
            for i in range(n_tables):
                rec = 12 + 16 * i
                if data[rec : rec + 4] == b"CFF ":
                    off = int.from_bytes(data[rec + 8 : rec + 12], "big")
                    ln = int.from_bytes(data[rec + 12 : rec + 16], "big")
                    data = data[off : off + ln]
                    break
            else:
                return {}
        pos = data[2]  # hdrSize
        _names, pos = _cff_index(data, pos)
        top_dicts, pos = _cff_index(data, pos)
        strings, pos = _cff_index(data, pos)
        if not top_dicts:
            return {}
        top = _cff_dict(top_dicts[0])
        if 1230 in top:  # ROS operator → CID-keyed
            return {}
        cs_op = top.get(17)
        if not cs_op:
            return {}
        charstrings, _ = _cff_index(data, int(cs_op[0]))
        n = len(charstrings)
        coff = int(top.get(15, [0])[0])
        if coff == 0:
            sids = list(range(n))  # predefined ISOAdobe charset: SID == gid
        elif coff in (1, 2):
            return {}  # Expert charsets: not text fonts
        else:
            fmt = data[coff]
            p = coff + 1
            sids = [0]
            if fmt == 0:
                for _ in range(n - 1):
                    sids.append(int.from_bytes(data[p : p + 2], "big"))
                    p += 2
            elif fmt in (1, 2):
                while len(sids) < n:
                    first = int.from_bytes(data[p : p + 2], "big")
                    p += 2
                    if fmt == 1:
                        nleft = data[p]
                        p += 1
                    else:
                        nleft = int.from_bytes(data[p : p + 2], "big")
                        p += 2
                    for d in range(nleft + 1):
                        if len(sids) >= n:
                            break
                        sids.append(first + d)
            else:
                return {}
        out: dict[int, str] = {}
        for gid, sid in enumerate(sids):
            if gid == 0:
                continue
            if sid < len(_CFF_STD_STRINGS):
                name = _CFF_STD_STRINGS[sid]
            elif sid - 391 < len(strings):
                name = strings[sid - 391].decode("latin-1")
            else:
                continue
            ch = _glyph_to_unicode(name)
            if ch != "�":
                out[gid] = ch
        return out
    except Exception:  # noqa: BLE001 — malformed font: no recovery
        return {}


def _cid_font_gidmap(doc: "PdfDocument", fobj: dict) -> dict[int, str] | None:
    """For a Type0 font with no /ToUnicode: dig the embedded font program
    out of DescendantFonts[0]/FontDescriptor and invert it — FontFile2
    (TrueType cmap) or FontFile3 (CFF charset glyph names, incl. the OTTO
    wrapper). None when there is no usable font program."""
    desc = doc.resolve(fobj.get("DescendantFonts"))
    if not isinstance(desc, list) or not desc:
        return None
    d0 = doc.resolve(desc[0])
    if isinstance(d0, tuple):
        d0 = d0[0]
    if not isinstance(d0, dict):
        return None
    fd = doc.resolve(d0.get("FontDescriptor"))
    if not isinstance(fd, dict):
        return None
    if "FontFile2" in fd:
        try:
            ttf = doc.stream_bytes(fd["FontFile2"])
        except PdfParseError:
            return None
        return _ttf_cmap_gid_to_unicode(ttf) or None
    if "FontFile3" in fd:
        try:
            cff = doc.stream_bytes(fd["FontFile3"])
        except PdfParseError:
            return None
        return _cff_gid_to_unicode(cff) or None
    return None


# Adobe Glyph List subset: the names that appear in real-world /Differences
# arrays (AGL is public: github.com/adobe-type-tools/agl-aglfn). 'uniXXXX'
# and 'uXXXX(XX)' forms are handled by rule in _glyph_to_unicode.
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "endash": "–", "emdash": "—", "bullet": "•",
    "dagger": "†", "daggerdbl": "‡", "ellipsis": "…",
    "fi": "ﬁ", "fl": "ﬂ",
    "Euro": "€", "sterling": "£", "yen": "¥", "cent": "¢",
    "currency": "¤", "copyright": "©", "registered": "®",
    "trademark": "™", "section": "§", "paragraph": "¶",
    "degree": "°", "plusminus": "±", "multiply": "×", "divide": "÷",
    "onehalf": "½", "onequarter": "¼", "threequarters": "¾",
    "exclamdown": "¡", "questiondown": "¿", "middot": "·",
    "periodcentered": "·", "guillemotleft": "«", "guillemotright": "»",
    "agrave": "à", "aacute": "á", "acircumflex": "â", "atilde": "ã",
    "adieresis": "ä", "aring": "å", "ae": "æ", "ccedilla": "ç",
    "egrave": "è", "eacute": "é", "ecircumflex": "ê", "edieresis": "ë",
    "igrave": "ì", "iacute": "í", "icircumflex": "î", "idieresis": "ï",
    "eth": "ð", "ntilde": "ñ", "ograve": "ò", "oacute": "ó",
    "ocircumflex": "ô", "otilde": "õ", "odieresis": "ö", "oslash": "ø",
    "ugrave": "ù", "uacute": "ú", "ucircumflex": "û", "udieresis": "ü",
    "yacute": "ý", "thorn": "þ", "ydieresis": "ÿ", "germandbls": "ß",
    "Agrave": "À", "Aacute": "Á", "Acircumflex": "Â", "Atilde": "Ã",
    "Adieresis": "Ä", "Aring": "Å", "AE": "Æ", "Ccedilla": "Ç",
    "Egrave": "È", "Eacute": "É", "Ecircumflex": "Ê", "Edieresis": "Ë",
    "Igrave": "Ì", "Iacute": "Í", "Icircumflex": "Î", "Idieresis": "Ï",
    "Eth": "Ð", "Ntilde": "Ñ", "Ograve": "Ò", "Oacute": "Ó",
    "Ocircumflex": "Ô", "Otilde": "Õ", "Odieresis": "Ö", "Oslash": "Ø",
    "Ugrave": "Ù", "Uacute": "Ú", "Ucircumflex": "Û", "Udieresis": "Ü",
    "Yacute": "Ý", "Thorn": "Þ", "OE": "Œ", "oe": "œ",
    "Scaron": "Š", "scaron": "š", "Zcaron": "Ž", "zcaron": "ž",
    "Ydieresis": "Ÿ", "florin": "ƒ", "circumflex": "ˆ", "tilde": "˜",
    "perthousand": "‰", "guilsinglleft": "‹", "guilsinglright": "›",
    "quotesinglbase": "‚", "quotedblbase": "„", "minus": "−",
    "fraction": "⁄", "dotlessi": "ı", "lslash": "ł", "Lslash": "Ł",
}


def _glyph_to_unicode(name: str) -> str:
    """Glyph name → text per the AGL specification's resolution rules:
    single letters map to themselves, uniXXXX / uXXXX[XX] by codepoint,
    the named table otherwise; unknown names become U+FFFD."""
    if len(name) == 1:
        return name
    if name in _AGL:
        return _AGL[name]
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            return "�"
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return "�"
    return "�"


def _load_fonts(doc: PdfDocument, resources) -> dict[str, dict]:
    fonts: dict[str, dict] = {}
    resources = doc.resolve(resources)
    if not isinstance(resources, dict):
        return fonts
    font_dict = doc.resolve(resources.get("Font"))
    if not isinstance(font_dict, dict):
        return fonts
    for fname, fref in font_dict.items():
        try:
            fobj = doc.resolve(fref)
            if isinstance(fobj, tuple):
                fobj = fobj[0]
            two_byte = str(fobj.get("Subtype", "")) == "Type0"
            cmap = None
            if "ToUnicode" in fobj:
                cmap = _parse_tounicode(doc.stream_bytes(fobj["ToUnicode"]))
            elif two_byte:
                # no ToUnicode: recover glyph→unicode from the embedded
                # TrueType cmap (Identity-H: CID == glyph id)
                cmap = _cid_font_gidmap(doc, fobj)
            # simple-font /Encoding: base codec + /Differences glyph names
            codec, diffs = "latin-1", {}
            enc = doc.resolve(fobj.get("Encoding"))
            base_name = ""
            if isinstance(enc, Name):
                base_name = str(enc)
            elif isinstance(enc, dict):
                base_name = str(doc.resolve(enc.get("BaseEncoding", "")))
                darr = doc.resolve(enc.get("Differences"))
                if isinstance(darr, list):
                    code = 0
                    for item in darr:
                        item = doc.resolve(item)
                        if isinstance(item, (int, float)):
                            code = int(item)
                        elif isinstance(item, Name):
                            diffs[code] = _glyph_to_unicode(str(item))
                            code += 1
            if base_name == "WinAnsiEncoding":
                codec = "cp1252"
            elif base_name == "MacRomanEncoding":
                codec = "mac_roman"
            fonts[fname] = {
                "two_byte": two_byte,
                "cmap": cmap,
                "codec": codec,
                "diffs": diffs,
                # gid-derived maps are partial by nature: unmapped CIDs
                # must degrade to (cid:N), never chr(gid)
                "cid_fallback": two_byte and "ToUnicode" not in fobj,
            }
        except PdfParseError:
            fonts[fname] = {"two_byte": False, "cmap": None, "codec": "latin-1", "diffs": {}}
    return fonts


def _decode_shown(b: bytes, font: dict | None) -> str:
    if font and font["two_byte"]:
        cmap = font["cmap"]
        parts = []
        for i in range(0, len(b) - 1, 2):
            code = (b[i] << 8) | b[i + 1]
            if cmap is not None:
                hit = cmap.get(code)
                if hit is None:
                    hit = f"(cid:{code})" if font.get("cid_fallback") else chr(code)
                parts.append(hit)
            else:
                # no ToUnicode and no usable font program: CIDs are opaque
                # glyph ids — emit the pdfminer-compatible placeholder
                parts.append(f"(cid:{code})")
        return "".join(parts)
    if font and font["cmap"]:
        return "".join(font["cmap"].get(c, chr(c)) for c in b)
    if font and (font.get("diffs") or font.get("codec", "latin-1") != "latin-1"):
        diffs, codec = font["diffs"], font["codec"]
        return "".join(
            diffs.get(c, bytes([c]).decode(codec, errors="replace")) for c in b
        )
    return b.decode("latin-1")


_OPERATOR_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")


def _interpret_content(content: bytes, fonts: dict[str, dict]) -> list[str]:
    """One pass over a page's content stream(s): track Tf, emit one output
    line per show operator (Tj ' "), one per TJ array — the same line model
    the round-4 kernel and its golden fixtures use."""
    lines: list[str] = []
    cur_font: dict | None = None
    operands: list = []
    pos, n = 0, len(content)
    while pos < n:
        pos = _skip_ws(content, pos)
        if pos >= n:
            break
        c = content[pos : pos + 1]
        if c in b"([</" or c.isdigit() or c in b"+-.":
            if content[pos : pos + 2] == b"<<":
                obj, pos = _parse_dict(content, pos + 2)
            else:
                try:
                    obj, pos = parse_object(content, pos)
                except PdfParseError:
                    pos += 1
                    continue
            operands.append(obj)
            continue
        m = _OPERATOR_RE.match(content, pos)
        if not m:
            pos += 1
            continue
        op = m.group(0)
        pos = m.end()
        if op == b"Tf":
            if len(operands) >= 2 and isinstance(operands[-2], Name):
                cur_font = fonts.get(str(operands[-2]))
        elif op in (b"Tj", b"'", b'"'):
            if operands and isinstance(operands[-1], bytes):
                lines.append(_decode_shown(operands[-1], cur_font))
        elif op == b"TJ":
            if operands and isinstance(operands[-1], list):
                text = "".join(
                    _decode_shown(item, cur_font)
                    for item in operands[-1]
                    if isinstance(item, bytes)
                )
                lines.append(text)
        elif op == b"BI":  # inline image: skip to EI
            end = content.find(b"EI", pos)
            pos = n if end < 0 else end + 2
        operands = []  # every operator consumes its operands
    return lines


def _pdf_page_images_impl(payload: bytes) -> list[tuple[int, int, int, list[bytes]]]:
    """Embedded raster pages for the A10 scanned-PDF path: walk the page
    tree and decode every /Subtype /Image XObject in each page's resources.
    Returns (width, height, channels, rows) per image in document order —
    the raw samples a render step would have produced, ready for the OCR
    kernel. Supports 8-bit /DeviceGray (1 channel) and /DeviceRGB (3) with
    FlateDecode or no filter, plus /DCTDecode (baseline JPEG — what real
    scanners embed) via the stdlib codec in operators/jpegmini (luma
    returned, channels=1); anything else raises PdfParseError."""
    doc = PdfDocument(payload)
    root = doc.resolve(doc.trailer["Root"])
    if isinstance(root, tuple):
        root = root[0]
    pages: list[tuple[dict, object]] = []
    _walk_pages(doc, root.get("Pages"), None, pages)
    images: list[tuple[int, int, int, list[bytes]]] = []
    for page, resources in pages:
        resources = doc.resolve(resources)
        if not isinstance(resources, dict):
            continue
        xobjects = doc.resolve(resources.get("XObject"))
        if not isinstance(xobjects, dict):
            continue
        for _name, xref_ in xobjects.items():
            xobj = doc.resolve(xref_)
            if not (isinstance(xobj, tuple) and len(xobj) == 2):
                continue
            xdict, _raw = xobj
            if str(xdict.get("Subtype")) != "Image":
                continue
            width = int(doc.resolve(xdict["Width"]))
            height = int(doc.resolve(xdict["Height"]))
            bpc = int(doc.resolve(xdict.get("BitsPerComponent", 8)))
            cs_obj = doc.resolve(xdict.get("ColorSpace", "DeviceGray"))
            indexed = isinstance(cs_obj, list) and str(doc.resolve(cs_obj[0])) in (
                "Indexed",
                "I",
            )
            cs = "" if indexed else str(cs_obj)
            filters = doc.resolve(xdict.get("Filter"))
            flist = filters if isinstance(filters, list) else [filters]
            is_ccitt = any(
                str(doc.resolve(f)) in ("CCITTFaxDecode", "CCF") for f in flist
            )
            is_jbig2 = any(str(doc.resolve(f)) == "JBIG2Decode" for f in flist)
            is_jpx = any(str(doc.resolve(f)) == "JPXDecode" for f in flist)
            if (
                bpc != 8
                and not (indexed and bpc in (1, 2, 4))
                and not ((is_ccitt or is_jbig2) and bpc == 1)
                and not is_jpx
            ):
                # JPX is exempt: ISO 32000 7.4.9 — width/height/colorspace/
                # bits come from the JPX codestream itself (the dictionary
                # entries are advisory); jp2mini validates the real Ssiz
                # (unsigned 1..16) and normalizes samples to 8-bit
                raise PdfParseError(f"unsupported image depth {bpc}")
            if is_jbig2:
                from frappe_data_pipelines_spark.operators.jbig2mini import (
                    Jbig2Error,
                    jbig2_decode_embedded,
                )

                parms = doc.resolve(xdict.get("DecodeParms") or xdict.get("DP"))
                if isinstance(parms, list):
                    parms = next(
                        (doc.resolve(p) for p in parms if isinstance(doc.resolve(p), dict)),
                        {},
                    )
                parms = parms if isinstance(parms, dict) else {}
                gl = b""
                if "JBIG2Globals" in parms:
                    gl = doc.stream_bytes(parms["JBIG2Globals"])
                try:
                    jw, jh, bitrows = jbig2_decode_embedded(xobj[1], gl)
                except Jbig2Error as e:
                    raise PdfParseError(f"JBIG2Decode: {e}") from e
                if (jw, jh) != (width, height):
                    raise PdfParseError("JBIG2 dims disagree with /Width /Height")
                # JBIG2 1-bits are black; /Decode [1 0] inverts once more
                dec_arr = doc.resolve(xdict.get("Decode"))
                dec_inv = (
                    isinstance(dec_arr, list)
                    and len(dec_arr) >= 2
                    and float(doc.resolve(dec_arr[0])) == 1.0
                )
                blk = 255 if dec_inv else 0
                rows = [
                    bytes(blk if px else 255 - blk for px in r) for r in bitrows
                ]
                images.append((jw, jh, 1, rows))
                continue
            if any(str(doc.resolve(f)) == "JPXDecode" for f in flist):
                from frappe_data_pipelines_spark.operators.jp2mini import (
                    Jp2Error,
                    jp2_decode_gray,
                )

                try:
                    jw, jh, rows = jp2_decode_gray(xobj[1])
                except Jp2Error as e:
                    raise PdfParseError(f"JPXDecode: {e}") from e
                if (jw, jh) != (width, height):
                    raise PdfParseError("JPX dims disagree with /Width /Height")
                images.append((jw, jh, 1, rows))
                continue
            if any(str(doc.resolve(f)) in ("DCTDecode", "DCT") for f in flist):
                from frappe_data_pipelines_spark.operators.jpegmini import (
                    JpegError,
                    jpeg_decode_gray,
                )

                try:
                    jw, jh, rows = jpeg_decode_gray(xobj[1])
                except JpegError as e:
                    raise PdfParseError(f"DCTDecode: {e}") from e
                if (jw, jh) != (width, height):
                    raise PdfParseError("DCTDecode dims disagree with /Width /Height")
                images.append((jw, jh, 1, rows))
                continue
            if is_ccitt:
                from frappe_data_pipelines_spark.operators.faxmini import (
                    FaxError,
                    g3_1d_decode,
                    g4_decode,
                )

                parms = doc.resolve(xdict.get("DecodeParms") or xdict.get("DP"))
                if isinstance(parms, list):
                    parms = next(
                        (doc.resolve(p) for p in parms if isinstance(doc.resolve(p), dict)),
                        {},
                    )
                parms = parms if isinstance(parms, dict) else {}
                k = int(doc.resolve(parms.get("K", 0)) or 0)
                cols = int(doc.resolve(parms.get("Columns", 1728)) or 1728)
                nrows = int(doc.resolve(parms.get("Rows", height)) or height)
                black_is_1 = doc.resolve(parms.get("BlackIs1")) is True
                aligned = doc.resolve(parms.get("EncodedByteAlign")) is True
                try:
                    if k < 0:
                        bitrows = g4_decode(xobj[1], cols, nrows)
                    elif k == 0:
                        bitrows = g3_1d_decode(xobj[1], cols, nrows, byte_align=aligned)
                    else:
                        raise PdfParseError("CCITT 2-D Group 3 (K>0) unsupported")
                except FaxError as e:
                    raise PdfParseError(f"CCITTFaxDecode: {e}") from e
                if (cols, nrows) != (width, height):
                    raise PdfParseError("CCITT dims disagree with /Width /Height")
                # sample mapping: fax black -> bit 0 unless BlackIs1; a
                # /Decode [1 0] inverts once more (producers often pair them)
                dec_arr = doc.resolve(xdict.get("Decode"))
                dec_inv = (
                    isinstance(dec_arr, list)
                    and len(dec_arr) >= 2
                    and float(doc.resolve(dec_arr[0])) == 1.0
                )
                blk = 255 if (black_is_1 ^ dec_inv) else 0
                rows = [
                    bytes(blk if px else 255 - blk for px in r) for r in bitrows
                ]
                images.append((cols, nrows, 1, rows))
                continue
            if indexed:
                # [/Indexed base hival lookup]: palette indices at 1/2/4/8
                # bits per sample (rows byte-padded), expanded through the
                # lookup table to the base colorspace's components
                base = doc.resolve(cs_obj[1])
                if isinstance(base, list):
                    base = doc.resolve(base[0])
                channels = {"DeviceGray": 1, "DeviceRGB": 3}.get(str(base))
                if channels is None:
                    raise PdfParseError(f"unsupported Indexed base /{base}")
                hival = int(doc.resolve(cs_obj[2]))
                lookup = doc.resolve(cs_obj[3]) if len(cs_obj) > 3 else None
                if isinstance(lookup, tuple):
                    lookup = doc.stream_bytes(lookup)
                if not isinstance(lookup, bytes) or len(lookup) < (hival + 1) * channels:
                    raise PdfParseError("Indexed lookup table missing or short")
                samples = doc.stream_bytes(xobj)
                row_bytes = (width * bpc + 7) // 8
                if len(samples) < row_bytes * height:
                    raise PdfParseError("image samples truncated")
                rows = []
                mask = (1 << bpc) - 1
                for y in range(height):
                    rb = samples[y * row_bytes : (y + 1) * row_bytes]
                    out = bytearray()
                    for x in range(width):
                        bit = x * bpc
                        idx = (rb[bit >> 3] >> (8 - bpc - (bit & 7))) & mask
                        if idx > hival:
                            idx = hival
                        out += lookup[idx * channels : (idx + 1) * channels]
                    rows.append(bytes(out))
                images.append((width, height, channels, rows))
                continue
            channels = {"DeviceGray": 1, "DeviceRGB": 3, "DeviceCMYK": 4}.get(cs)
            if channels is None:
                raise PdfParseError(f"unsupported image colorspace /{cs}")
            samples = doc.stream_bytes(xobj)
            stride = width * channels
            if len(samples) < stride * height:
                raise PdfParseError("image samples truncated")
            rows = [samples[y * stride : (y + 1) * stride] for y in range(height)]
            if channels == 4:
                # naive additive CMYK -> RGB (the uncalibrated inverse PDF
                # 8.6.4.4 specifies: component = 255 - min(255, x + k))
                rows = [
                    bytes(
                        255 - min(255, r[4 * x + ch] + r[4 * x + 3])
                        for x in range(width)
                        for ch in range(3)
                    )
                    for r in rows
                ]
                channels = 3
            images.append((width, height, channels, rows))
    return images


def _pdf_document_text_impl(payload: bytes) -> str:
    """Full-graph A3 kernel: document-order pages, CID/Type0 + ToUnicode
    decoding, xref-stream and object-stream files. Pages with text joined by
    a blank line (pdfplumber's page join); raises PdfParseError when the
    graph cannot be walked or no page shows any text."""
    if not payload.startswith(b"%PDF"):
        raise PdfParseError("missing %PDF header")
    doc = PdfDocument(payload)
    root = doc.resolve(doc.trailer["Root"])
    if isinstance(root, tuple):
        root = root[0]
    if not isinstance(root, dict) or "Pages" not in root:
        raise PdfParseError("catalog has no /Pages")
    pages: list[tuple[dict, object]] = []
    _walk_pages(doc, root["Pages"], None, pages)
    if not pages:
        raise PdfParseError("empty page tree")
    out: list[str] = []
    for page, resources in pages:
        fonts = _load_fonts(doc, resources)
        contents = doc.resolve(page.get("Contents"))
        if contents is None:
            continue
        if isinstance(contents, list):
            parts = [doc.stream_bytes(cs) for cs in contents]
            content = b"\n".join(parts)
        else:
            content = doc.stream_bytes(page.get("Contents"))
        lines = _interpret_content(content, fonts)
        if lines:
            out.append("\n".join(lines))
    if not out:
        raise PdfParseError("no text on any page")
    return "\n\n".join(out)


def _total(fn, payload):
    """Totality boundary: the extraction dispatch's fallback chain keys on
    PdfParseError, so no other exception type may escape the parser —
    corrupted files can hit any int()/index/codec path with garbage."""
    try:
        return fn(payload)
    except PdfParseError:
        raise
    except RecursionError:
        raise PdfParseError("object graph recursion limit")
    except Exception as e:  # noqa: BLE001 — boundary conversion by design
        raise PdfParseError(f"{type(e).__name__}: {e}") from e


def pdf_document_text(payload: bytes) -> str:
    return _total(_pdf_document_text_impl, payload)


def pdf_page_images(payload: bytes) -> list[tuple[int, int, int, list[bytes]]]:
    return _total(_pdf_page_images_impl, payload)
