"""AES kernel self-checks: FIPS-197 known-answer vectors + CBC properties.

The cipher backs pdfmini's /AESV2 and /AESV3 decryption (the reference's
pdfplumber crypt filters, text_extraction.py:63-75)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from frappe_data_pipelines_spark.operators.aesmini import (
    _decrypt_block,
    _encrypt_block,
    _expand_key,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    pkcs7_pad,
    pkcs7_unpad,
)

_PT = bytes.fromhex("00112233445566778899aabbccddeeff")


def test_fips197_aes128_vector():
    rk = _expand_key(bytes(range(16)))
    ct = _encrypt_block(rk, _PT)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert _decrypt_block(rk, ct) == _PT


def test_fips197_aes256_vector():
    rk = _expand_key(bytes(range(32)))
    ct = _encrypt_block(rk, _PT)
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert _decrypt_block(rk, ct) == _PT


def test_bad_key_length_raises():
    with pytest.raises(ValueError, match="16 or 32"):
        _expand_key(b"short")


@settings(max_examples=50, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=200),
    key=st.sampled_from([bytes(range(16)), bytes(range(32))]),
    iv=st.binary(min_size=16, max_size=16),
)
def test_cbc_roundtrip(data, key, iv):
    assert aes_cbc_decrypt(key, iv, aes_cbc_encrypt(key, iv, data)) == data


@settings(max_examples=50, deadline=None)
@given(data=st.binary(min_size=0, max_size=64))
def test_pkcs7_roundtrip(data):
    padded = pkcs7_pad(data)
    assert len(padded) % 16 == 0 and padded != data
    assert pkcs7_unpad(padded) == data


def test_unpad_lenient_on_garbage():
    # invalid padding from sloppy producers: data returned unchanged
    assert pkcs7_unpad(b"\x00" * 16) == b"\x00" * 16
    assert pkcs7_unpad(b"abc\xff") == b"abc\xff"
