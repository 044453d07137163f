"""Trained byte-level BPE tokenizer — real token counts for the packing /
budgeting path (SURVEY §2 text-analysis; reference estimates tokens with a
regex heuristic, services/chunking_service.py — this is the strict upgrade a
pre-training pipeline actually runs before paying for GPU time).

Design for Spark's execution model:

- **Training is a model fit, not a distributed op.** BPE merge learning is
  inherently sequential (each merge depends on the pair counts AFTER the
  previous merge), so — like the PQ/OPQ codebooks in operators/ann.py — we
  fit on a bounded, deterministic sample brought to the driver and treat the
  learned merge table as a small broadcastable artifact (~KBs). The
  distinct-pretoken frequency map IS computed distributed (groupBy-count)
  so the driver only ever sees (pretoken, count) pairs, never raw corpus.
- **Encoding is the distributed hot path**: merges broadcast once, applied
  inside an Arrow-batched iterator (mapInPandas-compatible pandas UDF) with
  a per-executor LRU on distinct pretokens — natural-language corpora are
  Zipfian, so the hit rate is ~95%+ and the per-row cost collapses to a
  dict lookup. No shuffle; encoding is embarrassingly parallel per row.

GPT-2 conventions (public: Radford et al. 2019; openai/gpt-2 encoder.py):
bytes→printable-unicode remap so merges operate on visible chars, the
contraction/word/number/punct pre-tokenizer regex, merges ranked by learned
order, no end-of-word marker. Training tie-break is (count DESC, pair ASC)
— fully deterministic, no dict-order dependence.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GPT-2 pre-tokenizer (contractions, words w/ leading space, numbers,
# punctuation runs, whitespace). Python `re` lacks \p{L}; ASCII classes are
# exact for the synthetic corpus and a documented approximation elsewhere.
PRETOKEN_RE = re.compile(r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+")


def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte→printable-unicode map: the 188 printable
    latin-1 bytes map to themselves, the rest shift into U+0100+."""
    bs = list(range(33, 127)) + list(range(161, 173)) + list(range(174, 256))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_B2U = bytes_to_unicode()
_U2B = {v: k for k, v in _B2U.items()}


def _to_symbols(pretoken: str) -> tuple[str, ...]:
    return tuple(_B2U[b] for b in pretoken.encode("utf-8"))


def _pairs(word: tuple[str, ...]) -> set[tuple[str, str]]:
    return set(zip(word, word[1:]))


def _merge_word(word: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    first, second = pair
    out: list[str] = []
    i = 0
    while i < len(word):
        if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
            out.append(first + second)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def pretoken_frequencies(
    docs: DataFrame, text_col: str = "text", max_pretokens: int = 65536
) -> list[tuple[str, int]]:
    """Distributed (pretoken, count) histogram — the only corpus statistic
    BPE training needs. groupBy-count with map-side partial aggregation;
    the driver receives at most ``max_pretokens`` distinct strings (top by
    count, id-ordered tie-break), NOT the corpus. At 100 TB this is the
    same shape as a word-count: one shuffle of (distinct pretokens ×
    executors) partial counts."""
    # Native Column API, NOT F.expr: a pattern embedded in a Spark SQL
    # double-quoted literal gets backslash-unescaped a second time (\s -> s),
    # silently changing the pretokenization. F.lit bypasses SQL parsing so
    # the JVM regex sees exactly PRETOKEN_RE.pattern.
    freq = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE.pattern), F.lit(0))
            ).alias("pt")
        )
        .groupBy("pt")
        .count()
        .orderBy(F.col("count").desc(), F.col("pt"))
        .limit(max_pretokens)
    )
    from .guards import collect_bounded

    # bounded by construction (limit above) — the guard documents and
    # enforces the contract if the limit is ever refactored away
    rows = collect_bounded(freq, max_pretokens, "BPE pretoken histogram")
    return [(r["pt"], int(r["count"])) for r in rows]


def train_bpe(freqs: list[tuple[str, int]], n_merges: int = 256) -> list[tuple[str, str]]:
    """Greedy BPE merge learning over a (pretoken, count) histogram.

    Deterministic: best pair = max count, ties broken by lexicographically
    smallest pair. Pure Python on the driver — n_merges is small (vocab is
    a model artifact) and each round is O(distinct pretokens)."""
    words: dict[tuple[str, ...], int] = {}
    for pt, c in freqs:
        sym = _to_symbols(pt)
        if len(sym) >= 2:
            words[sym] = words.get(sym, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for word, c in words.items():
            for p in _pairs(word):
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged: dict[tuple[str, ...], int] = {}
        for w, c in words.items():
            mw = _merge_word(w, best)
            if len(mw) >= 2:  # single-symbol words contribute no pairs
                merged[mw] = merged.get(mw, 0) + c
        words = merged
        if not words:
            break
    return merges


def encode_pretoken(pretoken: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one pretoken: repeatedly merge the lowest-rank
    adjacent pair (exact GPT-2 encoder loop)."""
    word = list(_to_symbols(pretoken))
    while len(word) >= 2:
        ranked = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(word, word[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        rank, _ = min(ranked)
        # merge ALL occurrences of that pair this round (left-to-right)
        pair = None
        for i, (a, b) in enumerate(zip(word, word[1:])):
            if ranks.get((a, b)) == rank:
                pair = (a, b)
                break
        out: list[str] = []
        i = 0
        while i < len(word):
            if i < len(word) - 1 and (word[i], word[i + 1]) == pair:
                out.append(word[i] + word[i + 1])
                i += 2
            else:
                out.append(word[i])
                i += 1
        word = out
    return word


def encode_text(text: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    out: list[str] = []
    for m in PRETOKEN_RE.findall(text):
        out.extend(encode_pretoken(m, ranks))
    return out


def decode_tokens(tokens: list[str]) -> str:
    data = bytes(_U2B[ch] for tok in tokens for ch in tok)
    return data.decode("utf-8", errors="replace")


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, n_pretokens, compression) using the trained vocab.

    Merges ride the closure as a broadcast-sized list; encoding runs in an
    Arrow-batched pandas UDF with an LRU over distinct pretokens (Zipfian
    corpus → the cache does almost all the work). No shuffle."""
    merge_list = list(merges)

    @F.pandas_udf("bigint")
    def n_tokens(texts: pd.Series) -> pd.Series:
        ranks = {p: i for i, p in enumerate(merge_list)}

        @lru_cache(maxsize=1 << 16)
        def count_pt(pt: str) -> int:
            return len(encode_pretoken(pt, ranks))

        return texts.map(
            lambda t: sum(count_pt(m) for m in PRETOKEN_RE.findall(t)) if t else 0
        ).astype("int64")

    # F.lit keeps the pattern out of SQL literal parsing (see
    # pretoken_frequencies) so n_pretokens agrees with PRETOKEN_RE exactly.
    return docs.select(
        F.col(id_col),
        n_tokens(F.col(text_col)).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE.pattern), F.lit(0)))
        .cast("bigint")
        .alias("n_pretokens"),
    ).withColumn(
        "compression",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("n_pretokens").cast("double") / F.col("n_tokens"), 6),
        ).otherwise(F.lit(None).cast("double")),
    )
