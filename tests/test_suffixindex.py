"""Persisted suffix-rank index (operators/suffixindex.py): the
build-once/query-many split of the pattern matcher. The load-bearing
property is DIFFERENTIAL — every indexed query must equal its
construction-per-call twin in suffix.py exactly, because the index path
swaps pseudo-doc riding for dictionary lookups and any drift there is a
silent wrong answer."""

from __future__ import annotations

import random

import pytest

from frappe_data_pipelines_spark.operators.suffix import (
    infinigram_backoff,
    substring_pattern_counts,
)
from frappe_data_pipelines_spark.operators.suffixindex import (
    SuffixIndex,
    build_suffix_index,
    indexed_pattern_counts,
    infinigram_backoff_indexed,
)


def _mk_corpus(spark, seed=11, n=30):
    rng = random.Random(seed)
    words = ["the", "quick", "brown", "fox", "dog", "data", "ünïcode",
             "zz", "model", "träin", "s", "a"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(3, 40))))
        for i in range(n)
    ]
    rows.append((n, "the quick brown fox"))       # exact phrase anchor
    rows.append((n + 1, "x"))                     # 1-char doc
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def test_indexed_pattern_counts_differential(spark, tmp_path):
    docs, rows = _mk_corpus(spark)
    idx = build_suffix_index(docs, str(tmp_path / "sidx"), max_width=8)
    # widths are powers of two up to 8
    assert idx.widths == [1, 2, 4, 8]
    pats = spark.createDataFrame(
        [
            (1, "the quick"),     # present, len 9: seed width 8 + refine 1
            (2, "fox"),           # frequent
            (3, "zz"),            # short
            (4, "q"),             # single char
            (5, "zqzqzq!!"),      # absent, len 8 (seed width == max)
            (6, "ünï"),           # multibyte
        ],
        "pattern_id long, pattern string",
    )
    base = {
        r["pattern_id"]: (r["pattern_len"], r["n_docs"], r["n_occurrences"])
        for r in substring_pattern_counts(docs, pats).collect()
    }
    got = {
        r["pattern_id"]: (r["pattern_len"], r["n_docs"], r["n_occurrences"])
        for r in indexed_pattern_counts(idx, pats).collect()
    }
    assert got == base
    # sanity against plain python: the anchor phrase occurs
    texts = [t for _, t in rows]
    assert got[2][2] == sum(t.count("fox") for t in texts)
    assert got[5] == (8, 0, 0)


def test_indexed_infinigram_differential(spark, tmp_path):
    docs, _ = _mk_corpus(spark, seed=23)
    idx = build_suffix_index(docs, str(tmp_path / "sidx"), max_width=8)
    for q in ["zzqq s", "the quick brow", "absent!", "x"]:
        base = sorted(
            map(tuple, infinigram_backoff(docs, q).collect())
        )
        got = sorted(
            map(tuple, infinigram_backoff_indexed(docs, idx, q).collect())
        )
        assert got == base, f"query {q!r}"


def test_index_lifecycle_and_guards(spark, tmp_path):
    docs, _ = _mk_corpus(spark, seed=5, n=10)
    path = str(tmp_path / "sidx")
    idx = build_suffix_index(docs, path, max_width=4)
    # read round trip
    idx2 = SuffixIndex.read(spark, path)
    assert idx2.widths == idx.widths == [1, 2, 4]
    assert (idx2.n_docs, idx2.total_chars) == (idx.n_docs, idx.total_chars)
    # summary: n_positions = total chars; distinct chars at width 1
    s = dict((w, (n, d)) for w, n, d in idx2.summary())
    assert s[1][0] == idx.total_chars
    # pattern longer than servable raises with a rebuild hint
    pats = spark.createDataFrame(
        [(1, "much too long pattern for width 4 index")],
        "pattern_id long, pattern string",
    )
    with pytest.raises(ValueError, match="max_width"):
        indexed_pattern_counts(idx2, pats).collect()
    # read_or_build: fresh load when compatible, rebuild when wider needed
    idx3 = SuffixIndex.read_or_build(spark, docs, path, max_width=4)
    assert idx3.widths == [1, 2, 4]
    idx4 = SuffixIndex.read_or_build(spark, docs, path, max_width=8)
    assert 8 in idx4.widths
    # verify=True rebuilds on a corpus mismatch
    bigger = docs.unionByName(
        spark.createDataFrame([(999, "entirely new doc text")],
                              "doc_id long, text string")
    )
    idx5 = SuffixIndex.read_or_build(spark, bigger, path, max_width=8, verify=True)
    assert idx5.n_docs == idx4.n_docs + 1


def test_empty_corpus_index(spark, tmp_path):
    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    path = str(tmp_path / "sidx")
    idx = build_suffix_index(docs, path, max_width=4)
    assert idx.widths == [] and idx.summary() == []


def test_decompose_pure():
    """Pure-python invariants of the binary decomposition the kernel and
    the uncached matcher both rely on: pieces tile [1, plen] exactly,
    the seed is 2^floor(log2 L), widths after the seed strictly decrease,
    and every width is a power of two."""
    from frappe_data_pipelines_spark.operators.suffixindex import _decompose

    for plen in range(1, 40):
        h0 = 1 << (plen.bit_length() - 1)
        pieces = _decompose(plen, h0)
        assert pieces[0] == (1, h0)
        covered = []
        for pos, w in pieces:
            assert w & (w - 1) == 0  # power of two
            covered.extend(range(pos, pos + w))
        assert covered == list(range(1, plen + 1)), f"plen={plen}"
        widths_after = [w for _, w in pieces[1:]]
        assert widths_after == sorted(widths_after, reverse=True)
        assert len(set(widths_after)) == len(widths_after)  # distinct


def test_wide_doc_len_invariant_checked(spark, tmp_path):
    """ADVICE r11 (medium): the kernel must VALIDATE that each doc's wide
    rows arrived whole in one read partition, not assume it. The wide
    table stores per-doc row counts; a mismatch (simulated here by
    tampering doc_len — the same observable as a doc fragmenting across
    read partitions) must raise loudly instead of silently dropping
    occurrences."""
    docs, _ = _mk_corpus(spark, seed=7, n=8)
    idx = build_suffix_index(docs, str(tmp_path / "sidx"), max_width=4)
    # healthy index: doc_len matches the per-doc row count everywhere
    from pyspark.sql import functions as F

    bad = (
        idx.wide()
        .groupBy("doc_key", "doc_len")
        .count()
        .filter(F.col("count") != F.col("doc_len"))
        .count()
    )
    assert bad == 0
    pats = spark.createDataFrame([(1, "fox")], "pattern_id long, pattern string")
    assert indexed_pattern_counts(idx, pats).count() == 1
    # tamper: inflate doc_len → every doc group now looks fragmented
    real_wide = idx.wide()
    idx.wide = lambda: real_wide.withColumn(
        "doc_len", F.col("doc_len") + F.lit(1)
    )
    with pytest.raises(Exception, match="fragmented"):
        indexed_pattern_counts(idx, pats).collect()


def test_char_memo_nonce_rebuild_same_stats(spark, tmp_path):
    """ADVICE r11: rebuilding at the same path over a DIFFERENT corpus
    whose (n_docs, total_chars, widths) coincide must not serve a stale
    memoized rank→char map — the build nonce keys the memo."""
    path = str(tmp_path / "sidx")
    a = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    idx_a = build_suffix_index(a, path, max_width=2)
    chars_a = set(idx_a.char_of_rank().values())
    assert chars_a == {"a", "b", ""}
    b = spark.createDataFrame([(1, "cd")], "doc_id long, text string")
    idx_b = build_suffix_index(b, path, max_width=2)
    # identical stats, same path — only the nonce distinguishes them
    assert (idx_a.n_docs, idx_a.total_chars, idx_a.widths) == (
        idx_b.n_docs, idx_b.total_chars, idx_b.widths
    )
    assert idx_a.nonce != idx_b.nonce
    assert set(idx_b.char_of_rank().values()) == {"c", "d", ""}


def test_local_pattern_variants_match_dataframe_intake(spark, tmp_path):
    """The *_local serving entrypoints (driver-local patterns, one fewer
    collect job) must return exactly what the DataFrame-intake twins do —
    including zero rows and validation errors."""
    from pyspark.sql import functions as F

    from frappe_data_pipelines_spark.operators.suffixindex import (
        build_token_suffix_index,
        indexed_next_token_distribution,
        indexed_next_token_distribution_local,
        indexed_pattern_counts_local,
        indexed_token_pattern_counts,
        indexed_token_pattern_counts_local,
    )

    docs, _ = _mk_corpus(spark, seed=31, n=15)
    idx = build_suffix_index(docs, str(tmp_path / "cidx"), max_width=8)
    char_pats = [(1, "the quick"), (2, "fox"), (3, "zz-not-here")]
    base = sorted(map(tuple, indexed_pattern_counts(
        idx, spark.createDataFrame(char_pats, "pattern_id long, pattern string")
    ).collect()))
    got = sorted(map(tuple, indexed_pattern_counts_local(idx, char_pats).collect()))
    assert got == base

    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), "[^a-z0-9ü]+"),
                 lambda x: x != "").alias("tokens"),
    )
    tidx = build_token_suffix_index(toks, str(tmp_path / "tidx"), max_width=4)
    tok_pats = [(1, ["the"]), (2, ["quick", "brown"]), (3, ["no", "gram"])]
    pats_df = spark.createDataFrame(
        tok_pats, "pattern_id long, pattern array<string>"
    )
    base_t = sorted(map(tuple,
                        indexed_token_pattern_counts(tidx, pats_df).collect()))
    got_t = sorted(map(tuple,
                       indexed_token_pattern_counts_local(tidx, tok_pats).collect()))
    assert got_t == base_t
    base_n = sorted(map(tuple,
                        indexed_next_token_distribution(tidx, pats_df).collect()))
    got_n = sorted(map(tuple,
                       indexed_next_token_distribution_local(tidx, tok_pats).collect()))
    assert got_n == base_n

    with pytest.raises(ValueError, match="duplicate"):
        indexed_pattern_counts_local(idx, [(1, "a"), (1, "b")])
    with pytest.raises(ValueError, match="empty"):
        indexed_token_pattern_counts_local(tidx, [(1, [])])
    # kind guard: char index rejected by the token entrypoints
    with pytest.raises(ValueError, match="token index"):
        indexed_token_pattern_counts_local(idx, tok_pats)
