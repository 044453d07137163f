"""Aho-Corasick blocklist kernel vs naive per-position scanning."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.operators.blocklist import (
    blocklist_filter,
    blocklist_hits,
)


def _naive(texts, terms, ci=True, wb=False):
    out = {}
    for did, txt in texts.items():
        t = (txt or "").lower() if ci else (txt or "")
        n = 0
        seen = set()
        first = None
        for tid, term in terms.items():
            q = term.lower() if ci else term
            for i in range(len(t) - len(q) + 1):
                if t[i : i + len(q)] != q:
                    continue
                if wb:
                    before = t[i - 1] if i > 0 else ""
                    after = t[i + len(q)] if i + len(q) < len(t) else ""
                    if (before and before.isalnum()) or (after and after.isalnum()):
                        continue
                n += 1
                seen.add(tid)
                if first is None or i + 1 < first:
                    first = i + 1
        out[did] = (n, len(seen), first)
    return out


def _run(spark, texts, terms, **kw):
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    tdf = spark.createDataFrame(list(terms.items()), "term_id long, term string")
    return {
        r.doc_id: (r.n_hits, r.n_terms, r.first_pos)
        for r in blocklist_hits(docs, tdf, **kw).collect()
    }


def test_blocklist_overlapping_and_nested_terms(spark):
    """'aba' in 'ababa' hits twice (overlap); 'a' nests inside 'aba'; a
    term that is a suffix of another is still reported (fail-link output
    merging)."""
    texts = {1: "ababa", 2: "xx", 3: None}
    terms = {1: "aba", 2: "a", 3: "ba"}
    assert _run(spark, texts, terms) == _naive(texts, terms)


def test_blocklist_random_differential(spark):
    rng = random.Random(11)
    texts = {
        d: "".join(rng.choice("abcAB ._") for _ in range(rng.randrange(0, 200)))
        for d in range(20)
    }
    terms = {
        i: "".join(rng.choice("abc .") for _ in range(rng.randrange(1, 6)))
        for i in range(1, 12)
    }
    assert _run(spark, texts, terms) == _naive(texts, terms)
    # case-sensitive variant diverges from the folded one on mixed-case text
    assert _run(spark, texts, terms, case_insensitive=False) == _naive(
        texts, terms, ci=False
    )


def test_blocklist_word_boundaries(spark):
    """'ass' must not hit inside 'class' or 'assignment' under the
    whole-word rule, but still hits standalone."""
    texts = {1: "class assignment", 2: "an ass here", 3: "ass", 4: "bad-ass!"}
    terms = {1: "ass"}
    wb = _run(spark, texts, terms, word_boundaries=True)
    assert wb == _naive(texts, terms, wb=True)
    assert wb[1][0] == 0 and wb[2][0] == 1 and wb[3][0] == 1 and wb[4][0] == 1


def test_blocklist_filter_drop_rule(spark):
    texts = {1: "totally clean text", 2: "contains banned word", 3: "banned banned"}
    docs = spark.createDataFrame(
        [(k, v, "en") for k, v in texts.items()], "doc_id long, text string, lang string"
    )
    terms = spark.createDataFrame([(1, "banned")], "term_id long, term string")
    kept = blocklist_filter(docs, terms).collect()
    assert {r.doc_id for r in kept} == {1}
    assert set(kept[0].asDict()) == {"doc_id", "text", "lang"}  # schema preserved
    lax = blocklist_filter(docs, terms, max_hits=1)
    assert {r.doc_id for r in lax.collect()} == {1, 2}


def test_blocklist_guards(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    empty = spark.createDataFrame([(1, "")], "term_id long, term string")
    with pytest.raises(ValueError, match="empty/null term"):
        blocklist_hits(docs, empty).collect()


def test_blocklist_unicode_terms(spark):
    """Automaton transitions are per-codepoint: CJK/accented terms match
    exactly; no byte-level aliasing."""
    texts = {1: "café culture 中文文本 here", 2: "cafe culture"}
    terms = {1: "café", 2: "文本", 3: "caf"}
    assert _run(spark, texts, terms) == _naive(texts, terms)


def test_blocklist_filter_row_level_null_and_dup_ids(spark):
    """A clean null-id doc survives; a dirty row sharing an id with a
    clean row is dropped on ITS OWN text (no semi-join key riding)."""
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=None, text="clean text with a null id"),
            Row(doc_id=7, text="clean sibling"),
            Row(doc_id=7, text="dirty sibling: banned"),
        ],
        "doc_id long, text string",
    )
    terms = spark.createDataFrame([(1, "banned")], "term_id long, term string")
    kept = [(r.doc_id, r.text) for r in blocklist_filter(docs, terms).collect()]
    assert (None, "clean text with a null id") in kept
    assert (7, "clean sibling") in kept
    assert all("banned" not in t for _, t in kept)
    assert len(kept) == 2


# ---------------------------------------------------------------------------
# Property test over the pure-Python automaton (no Spark in the loop)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_alpha = st.text(alphabet="abAB 你.é", min_size=0, max_size=60)
_term = st.text(alphabet="abAB 你é", min_size=1, max_size=5)


@settings(max_examples=300, deadline=None)
@given(text=_alpha, terms=st.lists(_term, min_size=1, max_size=8, unique=True))
def test_automaton_matches_naive_scan(text, terms):
    """Aho-Corasick occurrence set == per-position naive scan for
    arbitrary text/term combinations (overlaps, nesting, shared
    prefixes/suffixes, unicode)."""
    from frappe_data_pipelines_spark.operators.blocklist import (
        _build_automaton,
        _scan,
    )

    machine = _build_automaton(list(enumerate(terms)))
    got = sorted(_scan(text, *machine))
    exp = sorted(
        (tid, i + 1, len(q))
        for tid, q in enumerate(terms)
        for i in range(len(text) - len(q) + 1)
        if text[i : i + len(q)] == q
    )
    assert got == exp
