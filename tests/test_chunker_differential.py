"""Differential test: operators/chunker.py vs the transcribed published
algorithm (tests/oracle_recursive_splitter.py) — byte-parity on every
chunk, over real corpus text AND adversarial fixtures (VERDICT r3 #2).
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from frappe_data_pipelines_spark.operators.chunker import (
    DEFAULT_SEPARATORS,
    recursive_character_split,
)
from tests.oracle_recursive_splitter import OracleRecursiveSplitter

SF_DIR = "/root/testdata/sf0.001"

ADVERSARIAL = [
    "",
    "   ",
    "\n\n\n\n",
    "a",
    "word " * 400,
    # separator exactly at a chunk boundary
    "x" * 99 + " " + "y" * 99 + " " + "z" * 99,
    "x" * 100 + "\n\n" + "y" * 100,
    # multi-byte: CJK, emoji (incl. ZWJ sequence), combining accents
    "日本語のテキスト。" * 120,
    "héllo wörld 🎉👩‍🔬 ançien régime\n\n" * 60,
    "é" * 250 + " " + "à" * 250,
    # windows line endings and mixed separators
    "line one\r\nline two\r\n\r\nline three " * 50,
    # sentence separator runs
    "One. Two. Three. " * 120,
    "A.. B.. C.. " * 90,
    # no separator at all (forces the "" char-split ladder rung)
    "q" * 2500,
    # separator-only tails
    ("para\n\n" * 40) + "\n\n",
    "dot. " * 200 + ". ",
]

CONFIGS = [
    (1000, 200, None),  # the reference's exact config
    (100, 20, None),
    (50, 49, None),  # overlap ~= size
    (10, 0, None),
    (30, 29, None),
    (120, 30, ["\n\n", "\n", " "]),  # no "" rung → raw-append path reachable
    (80, 10, [". "]),
    (25, 5, [""]),
]


def _corpus_texts(limit=150):
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    return [t for t in tbl.column("text").to_pylist()[:limit] if t]


@pytest.mark.parametrize("size,overlap,seps", CONFIGS)
def test_differential_adversarial(size, overlap, seps):
    oracle = OracleRecursiveSplitter(size, overlap, seps or DEFAULT_SEPARATORS)
    for text in ADVERSARIAL:
        got = recursive_character_split(text, size, overlap, seps)
        want = oracle.split_text(text)
        assert got == want, (
            f"divergence size={size} overlap={overlap} seps={seps!r} "
            f"text={text[:60]!r}: got {got[:3]!r} want {want[:3]!r}"
        )


@pytest.mark.parametrize("size,overlap", [(1000, 200), (100, 20)])
def test_differential_real_corpus(size, overlap):
    oracle = OracleRecursiveSplitter(size, overlap, DEFAULT_SEPARATORS)
    n_chunks = 0
    for text in _corpus_texts():
        got = recursive_character_split(text, size, overlap)
        want = oracle.split_text(text)
        assert got == want, f"divergence on corpus doc: {text[:80]!r}"
        n_chunks += len(got)
    assert n_chunks > 100  # the corpus actually exercised the splitter


@settings(max_examples=300, deadline=None)
@given(
    text=st.text(alphabet="ab .\n\t日🎉é", max_size=400),
    size=st.integers(min_value=2, max_value=60),
    overlap_frac=st.floats(min_value=0.0, max_value=1.0),
)
def test_differential_property(text, size, overlap_frac):
    overlap = int(size * overlap_frac)
    got = recursive_character_split(text, size, overlap)
    want = OracleRecursiveSplitter(size, overlap, DEFAULT_SEPARATORS).split_text(text)
    assert got == want
