"""Property + unit tests for the PDF object-graph parser
(operators/pdfmini.py): object-model round-trips under hypothesis, stream
filter edge cases, xref predictor paths, and recovery behavior."""

from __future__ import annotations

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from frappe_data_pipelines_spark.operators.pdfmini import (
    Name,
    PdfParseError,
    Ref,
    _decode_stream,
    _png_unpredict,
    parse_object,
)

# -- serializer (test-only): PDF syntax for a python object tree ------------


def _ser(obj) -> bytes:
    if obj is None:
        return b"null"
    if obj is True:
        return b"true"
    if obj is False:
        return b"false"
    if isinstance(obj, Ref):
        return b"%d %d R" % (obj.num, obj.gen)
    if isinstance(obj, Name):
        return b"/" + str(obj).encode("latin-1")
    if isinstance(obj, int):
        return str(obj).encode()
    if isinstance(obj, float):
        return repr(obj).encode()
    if isinstance(obj, bytes):
        body = (
            obj.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
        )
        return b"(" + body + b")"
    if isinstance(obj, list):
        return b"[ " + b" ".join(_ser(x) for x in obj) + b" ]"
    if isinstance(obj, dict):
        return (
            b"<< "
            + b" ".join(
                b"/%s %s" % (k.encode("latin-1"), _ser(v)) for k, v in obj.items()
            )
            + b" >>"
        )
    raise TypeError(type(obj))


_name = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
    min_size=1,
    max_size=12,
)

_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.binary(max_size=40),
    _name.map(Name),
    st.builds(Ref, st.integers(1, 9999), st.integers(0, 9)),
)

_pdf_obj = st.recursive(
    _scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=5),
        st.dictionaries(_name, inner, max_size=5),
    ),
    max_leaves=25,
)


def _eq(a, b) -> bool:
    """Structural equality treating Ref by fields (no __eq__ on Ref)."""
    if isinstance(a, Ref) and isinstance(b, Ref):
        return a.num == b.num and a.gen == b.gen
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_eq(a[k], b[k]) for k in a)
    # bool-vs-int: True == 1 in Python but b"true" != b"1" in PDF syntax
    return a == b and isinstance(a, bool) == isinstance(b, bool)


@given(_pdf_obj)
@settings(max_examples=200, deadline=None)
def test_object_roundtrip(obj):
    """serialize → parse returns a structurally identical object, consuming
    exactly the serialized span."""
    data = _ser(obj)
    parsed, pos = parse_object(data, 0)
    assert _eq(parsed, obj), (parsed, obj)
    assert data[pos:].strip(b" ") == b""


def test_literal_string_escapes():
    cases = [
        (rb"(a\(b\)c)", b"a(b)c"),
        (rb"(octal \101\102)", b"octal AB"),
        (rb"(tab\there)", b"tab\there"),
        (b"(nested (parens) ok)", b"nested (parens) ok"),
        (b"(line\\\ncontinued)", b"linecontinued"),
        (rb"(\541)", b"\x61"),  # octal overflow wraps to 8 bits (0o541 & 0xFF)
    ]
    for raw, want in cases:
        got, _ = parse_object(raw, 0)
        assert got == want, (raw, got, want)


def test_hexstring_and_names_with_escapes():
    assert parse_object(b"<48656C6C6F>", 0)[0] == b"Hello"
    assert parse_object(b"/Name#20With#20Spaces", 0)[0] == "Name With Spaces"
    assert parse_object(b"% comment\n 42", 0)[0] == 42


def test_ref_vs_plain_ints():
    arr, _ = parse_object(b"[1 2 R 3 4]", 0)
    assert isinstance(arr[0], Ref) and arr[0].num == 1 and arr[0].gen == 2
    assert arr[1:] == [3, 4]
    # 'R' glued to an identifier is NOT a reference terminator: the int
    # parses alone and the following word is a separate (operator) token
    obj, pos = parse_object(b"7 8 Rogue", 0)
    assert obj == 7 and not isinstance(obj, Ref)


@given(
    st.lists(st.binary(min_size=4, max_size=4), min_size=1, max_size=20),
    st.sampled_from([0, 1, 2, 3, 4]),
)
@settings(max_examples=100, deadline=None)
def test_png_predictor_roundtrip(rows, ftype):
    """Encoding rows with any PNG filter then unpredicting restores them."""
    bpp, row_len = 1, 4

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    enc = bytearray()
    prev = bytes(row_len)
    for row in rows:
        enc.append(ftype)
        for i in range(row_len):
            left = row[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) >> 1, 4: paeth(left, up, ul)}[ftype]
            enc.append((row[i] - pred) & 0xFF)
        prev = row
    assert _png_unpredict(bytes(enc), columns=4) == b"".join(rows)


def test_decode_stream_filters():
    data = b"payload bytes here"
    flate = {"Filter": Name("FlateDecode")}
    assert _decode_stream(flate, zlib.compress(data), lambda x: x) == data
    ahx = {"Filter": Name("ASCIIHexDecode")}
    assert _decode_stream(ahx, data.hex().encode() + b">", lambda x: x) == data
    chain = {"Filter": [Name("ASCIIHexDecode"), Name("FlateDecode")]}
    assert (
        _decode_stream(chain, zlib.compress(data).hex().encode(), lambda x: x) == data
    )
    with pytest.raises(PdfParseError):
        _decode_stream({"Filter": Name("JBIG2Decode")}, data, lambda x: x)


def test_damaged_inputs_raise_not_crash():
    from frappe_data_pipelines_spark.operators.pdfmini import pdf_document_text

    for payload in (
        b"",
        b"not a pdf",
        b"%PDF-1.4\ngarbage",
        b"%PDF-1.4\n1 0 obj << /Type /Catalog >> endobj\ntrailer << /Root 1 0 R >>",
    ):
        with pytest.raises(PdfParseError):
            pdf_document_text(payload)
