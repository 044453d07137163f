"""Property tests for the chunkers (SURVEY §5 item 3)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from frappe_data_pipelines_spark.operators.chunker import (
    SemanticChunker,
    detect_header,
    recursive_character_split,
)

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf"]


def make_text(n_words: int, sep: str = " ") -> str:
    return sep.join(WORDS[i % len(WORDS)] for i in range(n_words))


class TestRecursiveSplit:
    def test_empty_and_whitespace(self):
        assert recursive_character_split("") == []
        assert recursive_character_split("   \n\n  ") == []

    def test_short_text_single_chunk(self):
        assert recursive_character_split("hello world", 100, 20) == ["hello world"]

    def test_no_empty_chunks_and_size_bound(self):
        text = make_text(500)
        chunks = recursive_character_split(text, 100, 20)
        assert chunks
        for c in chunks:
            assert c.strip() == c and c != ""
            assert len(c) <= 100

    def test_coverage_all_content_present(self):
        """Concatenated chunks must cover the input (every word survives)."""
        text = make_text(300)
        chunks = recursive_character_split(text, 120, 30)
        joined = " ".join(chunks)
        for w in set(text.split()):
            assert w in joined

    def test_overlap_present_between_consecutive_chunks(self):
        text = make_text(200)
        chunks = recursive_character_split(text, 100, 40)
        assert len(chunks) >= 2
        # with 40-char overlap on space-separated text, consecutive chunks
        # share a suffix/prefix word sequence
        overlaps = 0
        for a, b in zip(chunks, chunks[1:]):
            tail = a.split()[-3:]
            if " ".join(tail) in b:
                overlaps += 1
        assert overlaps >= len(chunks) - 2

    def test_paragraph_separator_preferred(self):
        text = "para one is here.\n\npara two is here.\n\npara three."
        chunks = recursive_character_split(text, 25, 0)
        # splits should respect paragraph boundaries first
        assert any("para one" in c for c in chunks)
        assert all("\n\n" not in c for c in chunks)

    def test_exact_langchain_fixture(self):
        """Golden fixture hand-computed from the published algorithm."""
        text = "aaaa bbbb cccc dddd eeee"
        # size 10, overlap 4: the ' dddd' split (len 5 > overlap 4) is popped
        # by the overlap-carry loop, so chunk 3 starts fresh at 'eeee'
        chunks = recursive_character_split(text, 10, 4)
        assert chunks == ["aaaa bbbb", "cccc dddd", "eeee"]
        # overlap 9 keeps one 5-char split in the carry window
        chunks = recursive_character_split(text, 10, 9)
        assert chunks == ["aaaa bbbb", "bbbb cccc", "cccc dddd", "dddd eeee"]

    @given(
        st.integers(min_value=10, max_value=400),
        st.integers(min_value=20, max_value=120),
    )
    @settings(max_examples=25, deadline=None)
    def test_property_random_sizes(self, n_words, chunk_size):
        overlap = chunk_size // 4
        text = make_text(n_words)
        chunks = recursive_character_split(text, chunk_size, overlap)
        longest_word = max(len(w) for w in WORDS)
        for c in chunks:
            assert len(c) <= max(chunk_size, longest_word)
        if text and text.strip():
            assert chunks
        # dense coverage: first/last words present
        assert text.split()[0] in chunks[0]
        assert text.split()[-1] in chunks[-1]


class TestHeaderDetection:
    @pytest.mark.parametrize(
        "line,expected",
        [
            ("# Title", (1, "Title")),
            ("### Sub", (3, "Sub")),
            ("1. Introduction", (1, "Introduction")),
            ("2.3 Methods", (2, "Methods")),
            ("2.3.1 Detail", (3, "Detail")),
            ("THIS IS CAPS", (1, "This Is Caps")),
            ("Summary:", (2, "Summary")),
            ("plain text line", None),
            ("", None),
        ],
    )
    def test_detect(self, line, expected):
        assert detect_header(line) == expected


class TestSemanticChunker:
    def test_section_paths(self):
        text = "# Intro\nintro text here\n## Sub A\nsub a body\n# Outro\noutro body"
        ch = SemanticChunker(target_size=10, overlap=0)
        secs = ch.sectionize(text)
        paths = [s.path for s in secs]
        assert paths == ["Intro", "Intro > Sub A", "Outro"]

    def test_headerless_doc_gets_document_path(self):
        ch = SemanticChunker(target_size=100)
        out = ch.chunk("just some plain text with no headers at all")
        assert len(out) == 1
        assert out[0].path == "Document"

    def test_merge_small_sections(self):
        text = "# A\nshort\n# B\nalso short\n# C\ntiny"
        ch = SemanticChunker(target_size=1000, overlap=0)
        out = ch.chunk(text)
        assert len(out) == 1  # merged toward target; latest path wins
        assert out[0].path == "C"

    def test_split_big_section_at_paragraphs(self):
        paras = "\n\n".join("para %d %s" % (i, "x" * 50) for i in range(10))
        ch = SemanticChunker(target_size=120, overlap=0)
        out = ch.chunk(paras)
        assert len(out) > 1
        for s in out:
            assert s.text.strip()


class TestMergePeers:
    """Docling ``HybridChunker(merge_peers=True)`` boundary semantics
    (VERDICT r4 #8, reference chunking_service.py:23-124): same-metadata
    consecutive peers merge greedily within the budget, never across
    section paths, never past the budget."""

    def test_same_path_peers_merge_greedily(self):
        sem = SemanticChunker(target_size=30, overlap=0)
        text = "aaaa\n\nbbbb\n\ncccc\n\ndddd"
        out = sem.chunk_hybrid(text)
        # 4+1+4+1+4+1+4 = 19 <= 30: all four merge into one chunk
        assert [s.text for s in out] == ["aaaa\nbbbb\ncccc\ndddd"]
        assert out[0].path == "Document"

    def test_merge_stops_before_exceeding_budget(self):
        sem = SemanticChunker(target_size=10, overlap=0)
        out = sem.chunk_hybrid("aaaa\n\nbbbb\n\ncccc")
        # aaaa+\n+bbbb = 9 <= 10 merges; +\n+cccc = 14 > 10 starts new chunk
        assert [s.text for s in out] == ["aaaa\nbbbb", "cccc"]

    def test_never_merges_across_section_paths(self):
        sem = SemanticChunker(target_size=200, overlap=0)
        text = "# Alpha\ntiny a\n\n# Beta\ntiny b"
        out = sem.chunk_hybrid(text)
        assert [(s.path, s.text) for s in out] == [
            ("Alpha", "tiny a"),
            ("Beta", "tiny b"),
        ]

    def test_split_fragments_can_merge_with_neighbors(self):
        """Docling splits oversize items BEFORE the merge pass, so a split
        tail fragment merges with the small paragraph after it."""
        sem = SemanticChunker(target_size=20, overlap=0)
        big = "w" * 25  # splits into 20 + 5
        out = sem.chunk_hybrid(f"{big}\n\nzz")
        assert [s.text for s in out] == ["w" * 20, "w" * 5 + "\nzz"]

    @given(
        st.lists(
            st.text(alphabet="abcd efg", min_size=1, max_size=60).map(str.strip).filter(bool),
            min_size=1,
            max_size=20,
        ),
        st.integers(min_value=15, max_value=120),
    )
    @settings(max_examples=60, deadline=None)
    def test_merge_peers_invariants(self, paras, target):
        sem = SemanticChunker(target_size=target, overlap=0)
        text = "\n\n".join(paras)
        out = sem.chunk_hybrid(text)
        # 1. budget: no chunk exceeds the target
        assert all(len(s.text) <= target for s in out)
        # 2. maximality: no two consecutive same-path chunks could merge
        for a, b in zip(out, out[1:]):
            if a.path == b.path:
                assert len(a.text) + 1 + len(b.text) > target
        # 3. conservation (overlap=0): every non-whitespace character
        # survives in order. (Whitespace-insensitive because an unsplittable
        # word longer than the target is split intra-word — LangChain's
        # character-level fallback — which introduces a chunk boundary.)
        import re as _re

        def strip_ws(s: str) -> str:
            return _re.sub(r"\s+", "", s)

        joined = strip_ws("".join(s.text for s in out))
        expected = strip_ws("".join(paras))
        assert joined == expected


def test_distributed_chunker_matches_local(spark, sf_dir):
    """chunk_documents (mapInPandas) must agree with the pure-python core."""
    from frappe_data_pipelines_spark.operators.chunker import chunk_documents
    from frappe_data_pipelines_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    out = chunk_documents(docs, strategy="recursive", chunk_size=200, chunk_overlap=40)
    got = {
        (r["doc_id"], r["chunk_index"]): (r["chunk_text"], r["total_chunks"])
        for r in out.collect()
    }
    for row in docs.collect():
        expected = recursive_character_split(row["text"], 200, 40)
        for i, c in enumerate(expected):
            assert got[(row["doc_id"], i)] == (c, len(expected))


def test_hybrid_strategy_bounds_and_paths(spark, sf_dir):
    """Hybrid = semantic sections + recursive re-split of oversized ones:
    every chunk ≤ 2x target, section paths preserved, indexes dense."""
    from pyspark.sql import functions as F

    from frappe_data_pipelines_spark.operators.chunker import chunk_documents
    from frappe_data_pipelines_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    out = chunk_documents(docs, strategy="hybrid", chunk_size=150, chunk_overlap=30).collect()
    assert out
    by_doc = {}
    for r in out:
        assert r["character_count"] <= 2 * 150
        assert r["section_path"]
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_index"])
    for idxs in by_doc.values():
        assert sorted(idxs) == list(range(len(idxs)))


def test_chunk_udtf_sql_surface(spark, sf_dir):
    """The chunker is callable from pure SQL via the registered UDTF and
    agrees with the DataFrame operator."""
    from pyspark.sql import functions as F

    from frappe_data_pipelines_spark.operators.chunker import (
        chunk_documents,
        register_chunk_udtf,
    )
    from frappe_data_pipelines_spark.sources.tables import load_table

    register_chunk_udtf(spark)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("docs_udtf_test")
    via_sql = spark.sql(
        """
        SELECT d.doc_id, c.chunk_index, c.chunk_text
        FROM docs_udtf_test d, LATERAL chunk_split(d.text, 200, 40) c
        """
    ).collect()
    via_df = chunk_documents(docs, strategy="recursive", chunk_size=200, chunk_overlap=40).collect()
    a = {(r["doc_id"], r["chunk_index"], r["chunk_text"]) for r in via_sql}
    b = {(r["doc_id"], r["chunk_index"], r["chunk_text"]) for r in via_df}
    assert a == b and a


class TestBoundaryCases:
    """Pin separator-at-boundary and multi-byte behavior (ROADMAP item 5).

    Golden values were produced by the current implementation and are
    locked here so future edits can't silently shift chunk boundaries —
    chunk identity feeds embedding ids (h13) and dedup fingerprints.
    """

    def test_separator_exactly_at_chunk_boundary(self):
        text = "a" * 20 + "\n\n" + "b" * 20
        assert recursive_character_split(text, chunk_size=20, chunk_overlap=4) == [
            "a" * 20,
            "b" * 19,
            "b" * 5,
        ]

    def test_trailing_separator_emits_orphan_piece(self):
        out = recursive_character_split("alpha beta gamma. ", chunk_size=10, chunk_overlap=2)
        assert out == ["alpha beta", "gamma", "."]

    def test_consecutive_separators_collapse(self):
        assert recursive_character_split("x\n\n\n\ny\n\nz", chunk_size=3, chunk_overlap=1) == [
            "x", "y", "z",
        ]

    def test_separator_only_text(self):
        assert recursive_character_split("\n\n\n\n. . ", chunk_size=5, chunk_overlap=1) == [". ."]

    def test_multibyte_chars_counted_as_single_units(self):
        # emoji + CJK: sizes are codepoint counts (python len), so a chunk
        # never splits inside a codepoint and bounds hold in codepoints
        text = "🎉🎊" * 30 + "\n\n" + "中文字符测试" * 10
        out = recursive_character_split(text, chunk_size=40, chunk_overlap=8)
        assert all(len(c) <= 40 for c in out)
        assert out[0] == "🎉🎊" * 20
        joined = "".join(out)
        assert joined.count("🎉") >= 30 and joined.count("中") >= 10

    def test_multibyte_separator_cjk_sentences(self):
        out = recursive_character_split("第一句. 第二句. 第三句. 第四句. ", chunk_size=10, chunk_overlap=2)
        assert out == ["第一句. 第二句", ". 第三句. 第四句", "."]

    def test_chunk_size_smaller_than_separator(self):
        # degenerate: chunk_size 1 with 2-char separators still terminates.
        # Exact published semantics: a 1-char split is NOT < chunk_size, so
        # every char raw-appends unstripped — newlines included, and the
        # concatenation reproduces the input losslessly.
        out = recursive_character_split("ab\n\ncd", chunk_size=1, chunk_overlap=0)
        assert out == ["a", "b", "\n", "\n", "c", "d"]
