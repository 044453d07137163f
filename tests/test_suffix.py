"""Distributed prefix-doubling suffix ranks vs brute force."""

from __future__ import annotations

import random

import pytest  # noqa: F401

from frappe_data_pipelines_spark.operators.suffix import (
    longest_duplicated_prefix_len,
    suffix_ranks,
)


def _brute_ranks(texts: dict[int, str]) -> dict[tuple[int, int], int]:
    sufs = [
        (d, p + 1, t[p:]) for d, t in texts.items() for p in range(len(t))
    ]
    uniq = sorted({s for _, _, s in sufs})
    rank_of = {s: i + 1 for i, s in enumerate(uniq)}
    return {(d, p): rank_of[s] for d, p, s in sufs}


def _check(spark, texts: dict[int, str], start_width: int = 8) -> None:
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r.doc_id, r.pos): r.rank
        for r in suffix_ranks(docs, start_width=start_width).collect()
    }
    assert got == _brute_ranks(texts)


def test_suffix_ranks_small_corpus(spark):
    _check(spark, {1: "banana", 2: "bandana", 3: "ananas"}, start_width=2)


def test_suffix_ranks_shared_tails_tie(spark):
    """Identical cross-document suffixes share a dense rank."""
    texts = {1: "xyzcommon-tail", 2: "abcommon-tail", 3: "common-tail"}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r.doc_id, r.pos): r.rank
        for r in suffix_ranks(docs, start_width=4).collect()
    }
    assert got == _brute_ranks(texts)
    # the shared "common-tail" suffix: one rank, three holders
    shared = [k for k, v in got.items() if v == got[(3, 1)]]
    assert len(shared) == 3


def test_suffix_ranks_random_differential(spark):
    rng = random.Random(7)
    texts = {
        d: "".join(rng.choice("abcab") for _ in range(rng.randrange(1, 60)))
        for d in range(1, 9)
    }
    _check(spark, texts, start_width=8)


def test_suffix_ranks_unicode(spark):
    """Multibyte text: Spark compares strings in UTF-8 byte order, Python
    in code-point order — identical orders (UTF-8 preserves code points),
    so the brute force must still agree, including astral-plane chars."""
    texts = {
        1: "héllo wörld héllo",
        2: "日本語のテキスト日本語",
        3: "mixed ascii と 日本語 and 🎉 emoji 🎉 tail",
        4: "🎉 emoji 🎉 tail",  # shares a multibyte tail with doc 3
    }
    _check(spark, texts, start_width=2)


def test_suffix_ranks_repetitive_text(spark):
    """Highly repetitive strings exercise many doubling rounds (ranks only
    separate at large h)."""
    _check(spark, {1: "a" * 70, 2: "a" * 50 + "b", 3: "aa"}, start_width=2)


def _brute_lrs(texts: dict[int, str]) -> int:
    """Length of the longest substring occurring >= 2 times (any docs,
    overlaps allowed) — O(n^2 log) brute force over all pairs of suffixes."""
    sufs = sorted(t[p:] for t in texts.values() for p in range(len(t)))
    best = 0
    for x, y in zip(sufs, sufs[1:]):
        m = 0
        for cx, cy in zip(x, y):
            if cx != cy:
                break
            m += 1
        best = max(best, m)
    return best


def test_longest_repeated_substrings_differential(spark):
    from frappe_data_pipelines_spark.operators.suffix import (
        longest_repeated_substrings,
    )

    rng = random.Random(11)
    texts = {
        d: "".join(rng.choice("abc") for _ in range(rng.randrange(5, 50)))
        for d in range(1, 7)
    }
    texts[7] = "XXmarkerXX" + texts[1][:20]  # guaranteed cross-doc repeat
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    rows = longest_repeated_substrings(docs, k=3).collect()
    assert rows, "some repeat must exist"
    top = rows[0]
    assert top.lcp == _brute_lrs(texts)
    # the reported occurrences really carry the reported substring
    assert texts[top.doc_a][top.pos_a - 1 : top.pos_a - 1 + top.lcp] == top.repeated
    assert texts[top.doc_b][top.pos_b - 1 : top.pos_b - 1 + top.lcp] == top.repeated
    assert (top.doc_a, top.pos_a) != (top.doc_b, top.pos_b)
    # rows are sorted by lcp desc with deterministic tie-break
    assert [r.lcp for r in rows] == sorted([r.lcp for r in rows], reverse=True)


def test_longest_repeated_substring_intra_doc_overlap(spark):
    """Overlapping intra-document repeats count ('aaaa' repeats 'aaa')."""
    from frappe_data_pipelines_spark.operators.suffix import (
        longest_repeated_substrings,
    )

    docs = spark.createDataFrame([(1, "aaaa"), (2, "xyz")], "doc_id long, text string")
    top = longest_repeated_substrings(docs, k=1).collect()[0]
    assert top.lcp == 3
    assert top.repeated == "aaa"


def test_distinct_substring_stats_differential(spark):
    from frappe_data_pipelines_spark.operators.suffix import (
        distinct_substring_stats,
    )

    rng = random.Random(3)
    texts = {
        d: "".join(rng.choice("abz") for _ in range(rng.randrange(1, 40)))
        for d in range(1, 7)
    }
    texts[7] = texts[1]  # an exact duplicate document
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    row = distinct_substring_stats(docs).collect()[0]
    brute = {
        t[i:j]
        for t in texts.values()
        for i in range(len(t))
        for j in range(i + 1, len(t) + 1)
    }
    assert row.n_distinct_substrings == len(brute)
    assert row.n_suffix_chars == sum(
        n * (n + 1) // 2 for n in map(len, texts.values())
    )


def test_longest_duplicated_prefix_groups(spark):
    texts = {1: "prefix-SHARED", 2: "other-SHARED", 3: "unrelated"}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    ranked = suffix_ranks(docs, start_width=4)
    groups = longest_duplicated_prefix_len(ranked, docs).collect()
    # "-SHARED" (and its proper suffixes) is duplicated across docs 1 and 2
    best = max(groups, key=lambda r: r.suffix_len)
    assert best.n_suffixes == 2
    assert best.suffix_len == len("-SHARED")
    assert {r.doc_id for r in groups if r.rank == best.rank} == {1, 2}


def _brute_pattern_counts(texts: dict[int, str], pats: dict[int, str]):
    out = {}
    for pid, p in pats.items():
        nd = no = 0
        for _, t in texts.items():
            c = sum(1 for i in range(len(t) - len(p) + 1) if t[i : i + len(p)] == p)
            if c:
                nd += 1
            no += c
        out[pid] = (nd, no)
    return out


def test_substring_pattern_counts_random_differential(spark):
    """Randomized corpus + planted/absent patterns of every decomposition
    shape (1, 2+1, 4+2, 8, 8+4+1 ...) vs direct per-position comparison.
    Overlapping occurrences count (the 'aaa' in 'aaaaa' → 3 semantics)."""
    from frappe_data_pipelines_spark.operators.suffix import (
        substring_pattern_counts,
    )

    rng = random.Random(23)
    texts = {
        d: "".join(rng.choice("abAB ") for _ in range(rng.randrange(0, 150)))
        for d in range(1, 15)
    }
    planted = [t for t in texts.values() if len(t) >= 30]
    pats = {
        1: "a",
        2: "ab",
        3: "aba",
        4: planted[0][4:17],  # length 13 = 8+4+1
        5: planted[1][:8],
        6: "zz-not-present-zz",
        7: "aaa",
    }
    texts[99] = "aaaaa" + pats[4]  # overlap stress + a second planted hit
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    pdf = spark.createDataFrame(list(pats.items()), "pattern_id long, pattern string")
    got = {
        r.pattern_id: (r.n_docs, r.n_occurrences)
        for r in substring_pattern_counts(docs, pdf).collect()
    }
    assert got == _brute_pattern_counts(texts, pats)


def test_substring_pattern_counts_guards(spark):
    from frappe_data_pipelines_spark.operators.suffix import (
        substring_pattern_counts,
    )

    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    empty = spark.createDataFrame([(1, "")], "pattern_id long, pattern string")
    with pytest.raises(ValueError, match="empty/null pattern"):
        substring_pattern_counts(docs, empty).collect()
    dup = spark.createDataFrame(
        [(1, "a"), (1, "b")], "pattern_id long, pattern string"
    )
    with pytest.raises(ValueError, match="duplicate pattern_id"):
        substring_pattern_counts(docs, dup).collect()


def test_substring_pattern_counts_longer_than_corpus(spark):
    """A pattern longer than every document counts zero (and the seed level
    for its width still exists — patterns ride in the pseudo-corpus)."""
    from frappe_data_pipelines_spark.operators.suffix import (
        substring_pattern_counts,
    )

    docs = spark.createDataFrame([(1, "short"), (2, "tiny")], "doc_id long, text string")
    pdf = spark.createDataFrame(
        [(1, "much-longer-than-any-document-here")], "pattern_id long, pattern string"
    )
    (row,) = substring_pattern_counts(docs, pdf).collect()
    assert (row.n_docs, row.n_occurrences) == (0, 0)


def test_suffix_ranks_reliable_checkpoint_identical(spark, tmp_path):
    """checkpoint_dir= (reliable checkpoints) must be result-identical to
    the localCheckpoint default."""
    texts = {1: "banana", 2: "bandana", 3: "ananas", 4: "ba"}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    local = {
        (r.doc_id, r.pos): r.rank for r in suffix_ranks(docs, start_width=2).collect()
    }
    reliable = {
        (r.doc_id, r.pos): r.rank
        for r in suffix_ranks(
            docs, start_width=2, checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert reliable == local == _brute_ranks(texts)


def test_suffix_rank_levels_max_width_prefix_semantics(spark):
    """Capped levels rank by the first max_width chars only: equal
    prefixes share a rank even when the full suffixes differ."""
    from frappe_data_pipelines_spark.operators.suffix import suffix_rank_levels

    texts = {1: "prefixAAAA", 2: "prefixBBBB"}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    levels = suffix_rank_levels(docs, start_width=1, max_width=4)
    assert [h for h, _ in levels] == [1, 2, 4]
    top = {(r.doc_id, r.pos): r.rank for r in levels[-1][1].collect()}
    # first 4 chars at pos 1 are "pref" in both docs -> shared rank
    assert top[(1, 1)] == top[(2, 1)]
    # but pos 7 ("AAAA" vs "BBBB") differ
    assert top[(1, 7)] != top[(2, 7)]


def test_pattern_continuations_differential(spark):
    """∞-gram continuation counts vs direct per-position scanning,
    including the end-of-document '' event and overlapping matches."""
    from frappe_data_pipelines_spark.operators.suffix import (
        pattern_continuations,
    )

    rng = random.Random(31)
    texts = {
        d: "".join(rng.choice("abX ") for _ in range(rng.randrange(0, 120)))
        for d in range(1, 12)
    }
    texts[99] = "abababX"  # overlap + one match ending at doc end ('X' tail)
    texts[98] = "the end ab"  # match flush at the boundary -> '' continuation
    pats = {1: "ab", 2: "X ", 3: "zz-none"}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    pdf = spark.createDataFrame(list(pats.items()), "pattern_id long, pattern string")
    got = {
        (r.pattern_id, r.next_char): r.n_continuations
        for r in pattern_continuations(docs, pdf).collect()
    }
    exp = {}
    for pid, p in pats.items():
        for t in texts.values():
            for i in range(len(t) - len(p) + 1):
                if t[i : i + len(p)] == p:
                    k = (pid, t[i + len(p) : i + len(p) + 1])
                    exp[k] = exp.get(k, 0) + 1
    assert got == exp
    assert (1, "") in got  # the end-of-text event is represented
    assert not any(pid == 3 for pid, _ in got)  # absent pattern -> no rows


def test_substring_pattern_counts_unicode(spark):
    """Codepoint-exact matching for non-ASCII corpora (the rank keys are
    substrings, so engine char semantics carry through)."""
    from frappe_data_pipelines_spark.operators.suffix import (
        substring_pattern_counts,
    )

    texts = {
        1: "中文文本中文文本",  # CJK with repetition
        2: "café au lait, café noir",
        3: "plain ascii text",
    }
    pats = {1: "中文", 2: "café", 3: "文本中", 4: "caf"}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    pdf = spark.createDataFrame(list(pats.items()), "pattern_id long, pattern string")
    got = {
        r.pattern_id: (r.n_docs, r.n_occurrences)
        for r in substring_pattern_counts(docs, pdf).collect()
    }
    exp = {}
    for pid, p in pats.items():
        nd = no = 0
        for t in texts.values():
            c = sum(1 for i in range(len(t) - len(p) + 1) if t[i : i + len(p)] == p)
            nd += 1 if c else 0
            no += c
        exp[pid] = (nd, no)
    assert got == exp


def test_infinigram_backoff_selects_longest_context(spark):
    """Backoff lands on the LONGEST query suffix present in the corpus;
    probabilities normalize to 1; a query with no matching suffix at all
    yields an empty distribution."""
    from frappe_data_pipelines_spark.operators.suffix import infinigram_backoff

    texts = {
        1: "the cat sat on the mat",
        2: "a cat and a dog",
        3: "concatenate the strings",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    # suffix "cat" occurs; "x cat" does not -> context must be "cat" (wait:
    # " cat" DOES occur in docs 1 and 2 -> longest hit among suffixes of
    # "xx cat" is " cat", len 4)
    rows = infinigram_backoff(docs, "xx cat").collect()
    assert rows and all(r.context == " cat" and r.context_len == 4 for r in rows)
    exp = {}
    for t in texts.values():
        for i in range(len(t) - 4 + 1):
            if t[i : i + 4] == " cat":
                nxt = t[i + 4 : i + 5]
                exp[nxt] = exp.get(nxt, 0) + 1
    got = {r.next_char: r.n_continuations for r in rows}
    assert got == exp
    assert abs(sum(r.p for r in rows) - 1.0) < 1e-6
    assert infinigram_backoff(docs, "qqqq").count() == 0
    with pytest.raises(ValueError, match="min_context"):
        infinigram_backoff(docs, "abc", min_context=5)


def test_pattern_token_continuations_differential(spark):
    """Next-token semantics: leading blanks skipped, maximal run of
    non-space chars, '' at a document boundary; counts vs naive scan."""
    import re

    from frappe_data_pipelines_spark.operators.suffix import (
        pattern_token_continuations,
    )

    texts = {
        1: "the cat  sat",   # double space after 'cat'
        2: "breathe deep",   # 'the' inside a word
        3: "end with the",   # boundary -> ''
    }
    pats = {1: "the", 2: "cat", 3: "zz"}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    pdf = spark.createDataFrame(list(pats.items()), "pattern_id long, pattern string")
    got = {
        (r.pattern_id, r.next_token): r.n_continuations
        for r in pattern_token_continuations(docs, pdf).collect()
    }
    exp = {}
    for pid, p in pats.items():
        for t in texts.values():
            for i in range(len(t) - len(p) + 1):
                if t[i : i + len(p)] == p:
                    nt = re.match(" *([^ ]*)", t[i + len(p) :]).group(1)
                    k = (pid, nt)
                    exp[k] = exp.get(k, 0) + 1
    assert got == exp
    assert (1, "") in got          # doc-boundary event (doc 3)
    assert (1, "deep") in got      # intra-word 'the' in 'breathe'


def test_token_suffix_ranks_random_differential(spark):
    """Token-level suffix ranks == dense rank of token-tuple suffixes
    (shared tails across docs get one rank; shorter-prefix-first array
    order matches tuple order)."""
    from frappe_data_pipelines_spark.operators.suffix import token_suffix_ranks

    rng = random.Random(19)
    vocab = ["the", "cat", "sat", "on", "a", "zz", "élan"]
    docs = {
        d: [rng.choice(vocab) for _ in range(rng.randrange(1, 30))]
        for d in range(1, 12)
    }
    docs[99] = docs[1][:]  # byte-identical doc: every suffix shares ranks
    ddf = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, tokens array<string>"
    )
    got = {
        (r.doc_id, r.pos): r.rank
        for r in token_suffix_ranks(ddf, start_width=2).collect()
    }
    sufs = [(d, p + 1, tuple(t[p:])) for d, t in docs.items() for p in range(len(t))]
    rank_of = {s: i + 1 for i, s in enumerate(sorted({s for _, _, s in sufs}))}
    assert got == {(d, p): rank_of[s] for d, p, s in sufs}


def test_token_pattern_counts_differential(spark):
    """Token-n-gram occurrence counts vs naive tuple scanning — exact,
    overlapping, zero rows kept; single-token and power-of-two lengths
    exercise every decomposition shape."""
    from frappe_data_pipelines_spark.operators.suffix import token_pattern_counts

    rng = random.Random(29)
    vocab = ["the", "cat", "sat", "on", "a"]
    docs = {
        d: [rng.choice(vocab) for _ in range(rng.randrange(0, 40))]
        for d in range(1, 12)
    }
    pats = {
        1: ["the"],
        2: ["the", "cat"],
        3: ["cat", "sat", "on"],
        4: ["no", "such", "gram"],
        5: ["a", "a", "a", "a", "a"],  # overlap stress, len 5 = 4+1
    }
    ddf = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, tokens array<string>"
    )
    pdf = spark.createDataFrame(
        [(k, v) for k, v in pats.items()], "pattern_id long, pattern array<string>"
    )
    got = {
        r.pattern_id: (r.pattern_len, r.n_docs, r.n_occurrences)
        for r in token_pattern_counts(ddf, pdf).collect()
    }
    exp = {}
    for pid, p in pats.items():
        nd = no = 0
        for t in docs.values():
            c = sum(
                1
                for i in range(len(t) - len(p) + 1)
                if t[i : i + len(p)] == p
            )
            nd += 1 if c else 0
            no += c
        exp[pid] = (len(p), nd, no)
    assert got == exp
