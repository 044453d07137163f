"""Stdlib imaging kernels: PNG codec, GIF/JPEG metadata, bitmap-font text
rendering, and a real OCR kernel (SURVEY §2.A A8/A9/A10, §1.2 OCRResult).

The reference runs PaddleOCR with a pytesseract fallback
(``fdp/services/ocr_service.py:81-187``) and renders PDF pages to PNG at 2×
zoom before OCR (``:228-289``). Neither model wheel exists in this
container, so this module implements the same pipeline shape with
deterministic stdlib-only kernels that do REAL work on fixture bitmaps:

* ``png_encode`` / ``png_decode`` — a complete non-interlaced PNG codec
  (zlib + struct + crc32): grayscale / RGB / alpha, all five scanline
  filters on decode.
* ``gif_meta`` / ``jpeg_meta`` — header/block walks for dimensions and
  (GIF) frame counts, feeding the multimodal metadata operator.
* ``render_text_png`` — rasterizes text with a fixed 5×7 dot-matrix font
  (the A10 "render page to image" step, and the fixture generator).
* ``ocr_bitmap`` — the OCR kernel itself: binarize → line segmentation by
  horizontal projection → glyph segmentation by column-run analysis →
  nearest-template match against the font (Hamming distance on tight-
  cropped bitmaps) → per-line (bbox, text, confidence) in reading order,
  newline-joined text, average confidence — the exact OCRResult shape the
  reference produces (ocr_service.py:14-20, 140-150).

Everything here is driver/executor-agnostic pure Python over ``bytes``; the
Spark surface wraps it in Arrow-batched ``mapInPandas`` (see
``operators/extraction.py`` and ``operators/multimodal.py``).
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

# ---------------------------------------------------------------------------
# PNG codec
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel

# Decode-size guard shared by every raster decoder here (the jbig2mini /
# jp2mini / jpegmini convention): these kernels sit behind dead-lettering
# dispatch (multimodal._real_decode, extraction), so a hostile header must
# raise a ValueError — which dead-letters the row — instead of allocating
# planes or inflating unbounded streams on an executor.
_MAX_PIXELS = 1 << 26


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """Decode a non-interlaced 8-bit PNG → (width, height, channels, rows).

    Supports color types 0 (gray), 2 (RGB), 3 (palette — expanded to RGB
    through the PLTE chunk), 4 (gray+alpha), 6 (RGBA) and all five scanline
    filters (None/Sub/Up/Average/Paeth). Raises ``ValueError`` on anything
    else — callers treat that as "not a PNG this kernel can read" and fall
    back.
    """
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, width = 8, None
    idat = bytearray()
    palette: bytes | None = None
    color_type = 0
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8 or (color_type not in _CHANNELS and color_type != 3) or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={bit_depth} color={color_type} "
                    f"interlace={interlace})"
                )
            channels = 1 if color_type == 3 else _CHANNELS[color_type]
            if width == 0 or height == 0:
                raise ValueError("zero PNG dimensions")
            if width * height * channels > _MAX_PIXELS:
                raise ValueError(
                    f"PNG {width}x{height}x{channels} exceeds pixel cap"
                )
        elif ctype == b"PLTE":
            palette = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    stride = width * channels
    want = (stride + 1) * height
    # bounded inflate: a zip-bombed IDAT must not expand past the geometry
    # the (capped) header declares — inflate at most want+1 bytes and treat
    # any overrun exactly like the length mismatch it is
    raw = zlib.decompressobj().decompress(bytes(idat), want + 1)
    if len(raw) != want:
        raise ValueError("PNG pixel data length mismatch")
    rows: list[bytes] = []
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        filt, line = raw[off], bytearray(raw[off + 1:off + 1 + stride])
        if filt == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif filt == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif filt == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif filt != 0:
            raise ValueError(f"unknown PNG filter {filt}")
        rows.append(bytes(line))
        prev = line
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        rows = [
            bytes(
                palette[3 * idx + c]
                for idx in row
                for c in range(3)
            )
            for row in rows
        ]
        return width, height, 3, rows
    return width, height, channels, rows


def png_encode(rows: list[bytes], color_type: int = 0) -> bytes:
    """Encode 8-bit scanlines (filter 0) into a minimal valid PNG."""
    channels = _CHANNELS[color_type]
    height = len(rows)
    width = len(rows[0]) // channels if height else 0

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + r for r in rows)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# GIF / JPEG metadata (header walks — enough for width/height/frames)
# ---------------------------------------------------------------------------


def gif_meta(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) from a GIF87a/89a block walk — the frame
    count drives the video-shape ``frame_sample`` operator."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 0x07))
    frames = 0

    def skip_subblocks(p: int) -> int:
        while p < len(payload) and payload[p]:
            p += payload[p] + 1
        return p + 1

    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label byte then sub-blocks
            pos = skip_subblocks(pos + 2)
        elif b == 0x2C:  # image descriptor
            frames += 1
            lflags = payload[pos + 9]
            pos += 10
            if lflags & 0x80:
                pos += 3 * (2 << (lflags & 0x07))
            pos = skip_subblocks(pos + 1)  # LZW min-code byte, then data
        else:
            raise ValueError(f"bad GIF block 0x{b:02x}")
    return width, height, max(frames, 1)


def jpeg_meta(payload: bytes) -> tuple[int, int]:
    """(width, height) from the first SOF marker of a JPEG."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        # SOF0..SOF15 excluding DHT(C4)/JPG(C8)/DAC(CC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            height, width = struct.unpack(">HH", payload[pos + 5:pos + 9])
            return width, height
        pos += 2 + seg_len
    raise ValueError("JPEG has no SOF marker")


def webp_meta(payload: bytes) -> tuple[int, int]:
    """(width, height) from a WebP RIFF container: VP8X canvas, VP8
    keyframe, or VP8L stream header."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    fourcc = payload[12:16]
    if fourcc == b"VP8X":
        w = int.from_bytes(payload[24:27], "little") + 1
        h = int.from_bytes(payload[27:30], "little") + 1
        return w, h
    if fourcc == b"VP8 ":
        # keyframe header after the 3-byte frame tag + sync code 9D 01 2A
        if payload[23:26] != b"\x9d\x01\x2a":
            raise ValueError("VP8 sync code missing")
        w = int.from_bytes(payload[26:28], "little") & 0x3FFF
        h = int.from_bytes(payload[28:30], "little") & 0x3FFF
        return w, h
    if fourcc == b"VP8L":
        if payload[20] != 0x2F:
            raise ValueError("VP8L signature missing")
        bits = int.from_bytes(payload[21:25], "little")
        return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
    raise ValueError(f"unknown WebP chunk {fourcc!r}")


def tiff_meta(payload: bytes) -> tuple[int, int]:
    """(width, height) from the first IFD of a TIFF (II or MM byte order)."""
    if payload[:4] == b"II\x2a\x00":
        endian = "little"
    elif payload[:4] == b"MM\x00\x2a":
        endian = "big"
    else:
        raise ValueError("not a TIFF")

    def u(b: bytes) -> int:
        return int.from_bytes(b, endian)

    ifd = u(payload[4:8])
    n = u(payload[ifd : ifd + 2])
    w = h = 0
    for i in range(n):
        e = payload[ifd + 2 + 12 * i : ifd + 14 + 12 * i]
        tag, typ = u(e[0:2]), u(e[2:4])
        val = u(e[8:10]) if typ == 3 else u(e[8:12])  # SHORT vs LONG inline
        if tag == 256:
            w = val
        elif tag == 257:
            h = val
    if not w or not h:
        raise ValueError("TIFF missing dimension tags")
    return w, h


def tiff_decode_gray(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Uncompressed striped TIFF (8-bit gray or RGB) → gray rows. Reads the
    first IFD's geometry + StripOffsets/StripByteCounts; RGB luma-converts.
    Compressed TIFFs raise (callers fall back)."""
    if payload[:4] == b"II\x2a\x00":
        endian = "little"
    elif payload[:4] == b"MM\x00\x2a":
        endian = "big"
    else:
        raise ValueError("not a TIFF")

    def u(b: bytes) -> int:
        return int.from_bytes(b, endian)

    ifd = u(payload[4:8])
    n = u(payload[ifd : ifd + 2])
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n):
        e = payload[ifd + 2 + 12 * i : ifd + 14 + 12 * i]
        tags[u(e[0:2])] = (u(e[2:4]), u(e[4:8]), e[8:12])

    def values(tag: int) -> list[int]:
        typ, count, inline = tags[tag]
        size = {3: 2, 4: 4}.get(typ)
        if size is None:
            raise ValueError(f"TIFF tag {tag} type {typ} unsupported")
        if count > 1 << 20:
            raise ValueError(f"TIFF tag {tag} count {count} exceeds cap")
        if count * size <= 4:
            return [u(inline[k * size : (k + 1) * size]) for k in range(count)]
        off = u(inline)
        return [
            u(payload[off + k * size : off + (k + 1) * size]) for k in range(count)
        ]

    w, h = values(256)[0], values(257)[0]
    spp = values(277)[0] if 277 in tags else 1
    if w == 0 or h == 0:
        raise ValueError("zero TIFF dimensions")
    if w * h * spp > _MAX_PIXELS:
        raise ValueError(f"TIFF {w}x{h}x{spp} exceeds pixel cap")
    if 259 in tags and values(259)[0] != 1:
        raise ValueError("compressed TIFF unsupported")
    if 258 in tags and any(b != 8 for b in values(258)):
        raise ValueError("non-8-bit TIFF unsupported")
    if spp not in (1, 3):
        raise ValueError(f"{spp}-sample TIFF unsupported")
    offsets = values(273)
    counts = values(279) if 279 in tags else None
    rows_per_strip = values(278)[0] if 278 in tags else h
    stride = w * spp
    raw = bytearray()
    for si, off in enumerate(offsets):
        ln = counts[si] if counts else min(rows_per_strip, h - si * rows_per_strip) * stride
        raw += payload[off : off + ln]
    if len(raw) < stride * h:
        raise ValueError("TIFF strip data truncated")
    rows: list[bytes] = []
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        if spp == 1:
            rows.append(bytes(line))
        else:
            rows.append(
                bytes(
                    (line[3 * x] * 299 + line[3 * x + 1] * 587 + line[3 * x + 2] * 114)
                    // 1000
                    for x in range(w)
                )
            )
    return w, h, rows


def tiff_encode_gray(rows: list[bytes]) -> bytes:
    """Minimal little-endian uncompressed gray TIFF writer (one strip)."""
    h, w = len(rows), len(rows[0])
    pixels = b"".join(rows)
    ifd_off = 8 + len(pixels)
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1),  # BlackIsZero
        (273, 4, 1, 8),  # strip starts right after the header
        (277, 3, 1, 1), (278, 3, 1, h), (279, 4, 1, len(pixels)),
    ]
    out = bytearray(b"II\x2a\x00") + ifd_off.to_bytes(4, "little")
    out += pixels
    out += struct.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        out += struct.pack("<HHI", tag, typ, count)
        out += val.to_bytes(4, "little") if typ == 4 else struct.pack("<HH", val, 0)
    out += b"\x00\x00\x00\x00"
    return bytes(out)


def bmp_decode(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Uncompressed BMP (8-bit paletted/gray or 24-bit BGR) → gray rows.
    BMP stores rows bottom-up, 4-byte padded; 24-bit pixels are BGR."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise ValueError("BMP core header unsupported")
    w, h = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    compression = struct.unpack("<I", payload[30:34])[0]
    if compression != 0:
        raise ValueError(f"compressed BMP unsupported ({compression})")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    if w * h > _MAX_PIXELS:
        raise ValueError(f"BMP {w}x{h} exceeds pixel cap")
    palette = None
    if bpp == 8:
        n_colors = struct.unpack("<I", payload[46:50])[0] or 256
        pal_off = 14 + hdr_size
        palette = [
            (payload[pal_off + 4 * i + 2] * 299
             + payload[pal_off + 4 * i + 1] * 587
             + payload[pal_off + 4 * i] * 114) // 1000
            for i in range(n_colors)
        ]
    elif bpp != 24:
        raise ValueError(f"{bpp}-bit BMP unsupported")
    stride = ((w * bpp // 8) + 3) & ~3
    rows: list[bytes] = []
    for yi in range(h):
        src = yi if top_down else h - 1 - yi
        line = payload[data_off + src * stride : data_off + src * stride + stride]
        if bpp == 8:
            rows.append(bytes(palette[b] for b in line[:w]))
        else:
            rows.append(
                bytes(
                    (line[3 * x + 2] * 299 + line[3 * x + 1] * 587 + line[3 * x] * 114)
                    // 1000
                    for x in range(w)
                )
            )
    return w, h, rows


def bmp_encode_gray(rows: list[bytes]) -> bytes:
    """8-bit grayscale BMP writer (fixture/round-trip side): linear gray
    palette, bottom-up rows, 4-byte padding."""
    h, w = len(rows), len(rows[0])
    stride = (w + 3) & ~3
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    pixel_off = 14 + 40 + len(palette)
    body = b"".join(
        rows[h - 1 - yi] + b"\x00" * (stride - w) for yi in range(h)
    )
    header = (
        b"BM"
        + struct.pack("<IHHI", pixel_off + len(body), 0, 0, pixel_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 2835, 2835, 256, 0)
    )
    return header + palette + body


def gif_decode_first_frame(payload: bytes) -> tuple[int, int, list[bytes]]:
    """First frame of a GIF87a/89a → gray rows: LZW decompress the image
    data, map through the color table, luma-convert. Interlace supported;
    frames after the first are ignored (the OCR path reads page one)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:
            raise ValueError("GIF has no image data")
        if b == 0x21:  # extension
            pos += 2
            while payload[pos]:
                pos += payload[pos] + 1
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"bad GIF block 0x{b:02x}")
        x0, y0, iw, ih = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
        if iw == 0 or ih == 0:
            raise ValueError("zero GIF frame dimensions")
        if iw * ih > _MAX_PIXELS:
            raise ValueError(f"GIF {iw}x{ih} exceeds pixel cap")
        lflags = payload[pos + 9]
        pos += 10
        table = gct
        if lflags & 0x80:
            n = 2 << (lflags & 0x07)
            table = payload[pos : pos + 3 * n]
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image without a color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += ln + 1
        indices = _lzw_decode(bytes(data), min_code, max_out=iw * ih)
        gray = [
            (table[3 * i] * 299 + table[3 * i + 1] * 587 + table[3 * i + 2] * 114)
            // 1000
            for i in range(len(table) // 3)
        ]
        pix = [gray[i] for i in indices[: iw * ih]]
        rows = [bytes(pix[y * iw : (y + 1) * iw]) for y in range(ih)]
        if lflags & 0x40:  # interlaced: reorder passes
            order = (
                list(range(0, ih, 8))
                + list(range(4, ih, 8))
                + list(range(2, ih, 4))
                + list(range(1, ih, 2))
            )
            deinter: list[bytes] = [b""] * ih
            for src_i, dst_y in enumerate(order):
                deinter[dst_y] = rows[src_i]
            rows = deinter
        return iw, ih, rows
    raise ValueError("GIF has no image data")


def _lzw_decode(
    data: bytes, min_code_size: int, max_out: int | None = None
) -> list[int]:
    """GIF-variant LZW: variable code width, clear + end codes.

    ``max_out`` bounds the emitted pixel count: LZW expands up to ~2700x
    its input, so a small hostile stream could otherwise inflate to
    gigabytes — callers pass the (capped) frame geometry, which is all
    they ever consume."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    table: list[list[int]] = []

    def reset() -> int:
        nonlocal table
        table = [[i] for i in range(clear)] + [[], []]
        return min_code_size + 1

    width = reset()
    acc = nbits = 0
    prev: list[int] | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                width = reset()
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + [entry[0]])
            elif code == len(table):
                entry = prev + [prev[0]]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            prev = entry
            if max_out is not None and len(out) >= max_out:
                return out
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


def gif_encode_gray(rows: list[bytes]) -> bytes:
    """Single-frame grayscale GIF writer (fixture/round-trip side): 256-gray
    global table, LZW with a clear code before every pixel (the classic
    'uncompressed GIF' trick — valid stream, fixed 9-bit codes)."""
    h, w = len(rows), len(rows[0])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes((0xF7, 0, 0))  # GCT present, 256 entries
    out += b"".join(bytes((i, i, i)) for i in range(256))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(8)  # LZW min code size
    bits = bytearray()
    acc = nbits = 0

    def push(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += 9
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for row in rows:
        for px in row:
            push(256)  # clear: keep the table empty, codes stay 9-bit
            push(px)
    push(257)  # end
    if nbits:
        bits.append(acc & 0xFF)
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# 5×7 dot-matrix font (rows top→bottom, 5-bit masks, MSB = leftmost column)
# ---------------------------------------------------------------------------

FONT_5X7: dict[str, tuple[int, ...]] = {
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x1E),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x1B, 0x11),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x06, 0x08, 0x10, 0x1F),
    "3": (0x0E, 0x11, 0x01, 0x06, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    ".": (0x00, 0x00, 0x00, 0x00, 0x00, 0x0C, 0x0C),
    ",": (0x00, 0x00, 0x00, 0x00, 0x0C, 0x04, 0x08),
    ":": (0x00, 0x0C, 0x0C, 0x00, 0x0C, 0x0C, 0x00),
    "-": (0x00, 0x00, 0x00, 0x1F, 0x00, 0x00, 0x00),
    "!": (0x04, 0x04, 0x04, 0x04, 0x04, 0x00, 0x04),
    "?": (0x0E, 0x11, 0x01, 0x02, 0x04, 0x00, 0x04),
    "/": (0x01, 0x01, 0x02, 0x04, 0x08, 0x10, 0x10),
}

GLYPH_W, GLYPH_H = 5, 7
_PITCH = GLYPH_W + 1  # 1 blank column between glyphs
_LINE_PITCH = GLYPH_H + 2  # 2 blank rows between lines
_MARGIN = 2


def render_text_png(text: str, invert: bool = False) -> bytes:
    """Rasterize ``text`` (the font's charset; lowercase is upcased, unknown
    chars become ``?``) into an 8-bit grayscale PNG — dark glyphs on a white
    page, like a scanned document. This is the A10 "render to image" step
    (the reference renders PDF pages with PyMuPDF at 2× zoom,
    ocr_service.py:254) and the golden-fixture generator for the OCR tests.
    """
    lines = [ln.upper() for ln in text.split("\n")] or [""]
    width = _MARGIN * 2 + max(
        (len(ln) * _PITCH - 1 if ln else 1) for ln in lines
    )
    height = _MARGIN * 2 + len(lines) * _LINE_PITCH - 2
    fg, bg = (255, 0) if invert else (0, 255)
    grid = [bytearray([bg]) * width for _ in range(height)]
    for li, ln in enumerate(lines):
        y0 = _MARGIN + li * _LINE_PITCH
        for ci, ch in enumerate(ln):
            if ch == " ":
                continue
            glyph = FONT_5X7.get(ch, FONT_5X7["?"])
            x0 = _MARGIN + ci * _PITCH
            for gy, mask in enumerate(glyph):
                for gx in range(GLYPH_W):
                    if mask & (1 << (GLYPH_W - 1 - gx)):
                        grid[y0 + gy][x0 + gx] = fg
    return png_encode([bytes(r) for r in grid], color_type=0)


# ---------------------------------------------------------------------------
# OCR kernel
# ---------------------------------------------------------------------------


def _tight_crop(cells: list[list[int]]) -> tuple[list[list[int]], int, int]:
    """Crop a 0/1 matrix to its dark bounding box → (matrix, row0, col0)."""
    rows = [i for i, r in enumerate(cells) if any(r)]
    cols = [j for j in range(len(cells[0])) for r in cells if r[j]] if cells else []
    if not rows or not cols:
        return [[0]], 0, 0
    r0, r1, c0, c1 = min(rows), max(rows), min(cols), max(cols)
    return [r[c0:c1 + 1] for r in cells[r0:r1 + 1]], r0, c0


_TEMPLATES: list[tuple[str, list[list[int]], int]] | None = None


def _templates() -> list[tuple[str, list[list[int]], int]]:
    """Tight-cropped glyph templates with their row offset inside the 5×7
    cell (so '.' at the baseline doesn't match ''' at the cap line)."""
    global _TEMPLATES
    if _TEMPLATES is None:
        out = []
        for ch, masks in FONT_5X7.items():
            cell = [
                [(m >> (GLYPH_W - 1 - x)) & 1 for x in range(GLYPH_W)]
                for m in masks
            ]
            tight, r0, _ = _tight_crop(cell)
            out.append((ch, tight, r0))
        _TEMPLATES = out
    return _TEMPLATES


def _match_glyph(tight: list[list[int]], row_off: int) -> tuple[str, float]:
    """Nearest-template classification: overlay candidate and template
    tight-crops anchored at their top-left, score = 1 − Hamming/area over
    the union grid, with a vertical-offset penalty. Exact renders score 1.0;
    a few flipped pixels degrade confidence but keep the argmax."""
    best_ch, best_score = "?", -1.0
    h, w = len(tight), len(tight[0])
    for ch, tpl, tpl_off in _templates():
        th, tw = len(tpl), len(tpl[0])
        uh, uw = max(h, th), max(w, tw)
        diff = abs(row_off - tpl_off) * uw  # vertical misalignment penalty
        for y in range(uh):
            for x in range(uw):
                a = tight[y][x] if y < h and x < w else 0
                b = tpl[y][x] if y < th and x < tw else 0
                diff += a != b
        score = 1.0 - diff / (uh * uw + GLYPH_H)
        if score > best_score:
            best_ch, best_score = ch, score
    return best_ch, best_score


def ocr_bitmap(payload: bytes, min_confidence: float = 0.55) -> dict:
    """OCR a rendered-text image (PNG, baseline JPEG via operators/jpegmini,
    uncompressed BMP, or GIF first frame) → the reference's OCRResult shape
    (ocr_service.py:14-20): ``{"text", "confidence", "detected_languages",
    "bounding_boxes": [{"bbox": [[x,y]×4], "text", "confidence"}, ...]}``.

    Pipeline: grayscale+binarize (<128 = ink) → line bands by horizontal
    projection → glyph segments by column-run analysis (a gap ≥ the glyph
    advance splits words) → nearest-template match per glyph. Glyphs whose
    best score falls below ``min_confidence`` come out as ``?`` — mirroring
    real OCR's low-confidence placeholders rather than inventing text.
    """
    if payload[:2] == b"\xff\xd8":
        from frappe_data_pipelines_spark.operators.jpegmini import jpeg_decode_gray

        width, height, rows = jpeg_decode_gray(payload)
        channels = 1
    elif payload[:2] == b"BM":
        width, height, rows = bmp_decode(payload)
        channels = 1
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        width, height, rows = gif_decode_first_frame(payload)
        channels = 1
    elif payload[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
        width, height, rows = tiff_decode_gray(payload)
        channels = 1
    else:
        width, height, channels, rows = png_decode(payload)
    # luma binarize; any alpha channel is ignored (ink is dark)
    ink: list[list[int]] = []
    for r in rows:
        if channels == 1:
            ink.append([1 if b < 128 else 0 for b in r])
        elif channels == 2:
            ink.append([1 if r[i] < 128 else 0 for i in range(0, len(r), 2)])
        else:
            step = channels
            ink.append([
                1 if (r[i] * 299 + r[i + 1] * 587 + r[i + 2] * 114) // 1000 < 128 else 0
                for i in range(0, len(r), step)
            ])

    # line bands: contiguous runs of rows containing ink
    dark_row = [any(r) for r in ink]
    bands: list[tuple[int, int]] = []
    y = 0
    while y < height:
        if dark_row[y]:
            y1 = y
            while y1 + 1 < height and dark_row[y1 + 1]:
                y1 += 1
            bands.append((y, y1))
            y = y1 + 1
        else:
            y += 1

    lines_out = []
    for y0, y1 in bands:
        band = ink[y0:y1 + 1]
        bw = len(band[0])
        dark_col = [any(band[y][x] for y in range(len(band))) for x in range(bw)]
        # glyph segments: contiguous dark-column runs; record gaps for spaces
        segs: list[tuple[int, int]] = []
        x = 0
        while x < bw:
            if dark_col[x]:
                x1 = x
                while x1 + 1 < bw and dark_col[x1 + 1]:
                    x1 += 1
                segs.append((x, x1))
                x = x1 + 1
            else:
                x += 1
        chars: list[str] = []
        confs: list[float] = []
        prev_end = None
        for c0, c1 in segs:
            if prev_end is not None and c0 - prev_end >= _PITCH:
                chars.append(" ")
            prev_end = c1 + 1
            cell = [row[c0:c1 + 1] for row in band]
            tight, r_off, _ = _tight_crop(cell)
            ch, score = _match_glyph(tight, r_off)
            chars.append(ch if score >= min_confidence else "?")
            confs.append(max(score, 0.0))
        if not chars:
            continue
        line_text = "".join(chars)
        line_conf = round(sum(confs) / len(confs), 6)
        x0, x1 = segs[0][0], segs[-1][1] + 1
        lines_out.append(
            {
                "bbox": [
                    [float(x0), float(y0)], [float(x1), float(y0)],
                    [float(x1), float(y1 + 1)], [float(x0), float(y1 + 1)],
                ],
                "text": line_text,
                "confidence": line_conf,
            }
        )

    text = "\n".join(ln["text"] for ln in lines_out)
    conf = (
        round(sum(ln["confidence"] for ln in lines_out) / len(lines_out), 6)
        if lines_out
        else 0.0
    )
    # language heuristic mirrors the reference's ASCII-alpha branch
    # (ocr_service.py:189-226); the font is Latin-only, so 'en' or unknown
    langs = ["en"] if any(c.isalpha() for c in text) else ["unknown"]
    return {
        "text": text,
        "confidence": conf,
        "detected_languages": langs,
        "bounding_boxes": lines_out,
    }
