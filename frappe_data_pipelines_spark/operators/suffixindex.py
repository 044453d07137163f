"""Persisted suffix-rank index: build once, query many (VERDICT r10 task 2).

``operators/suffix.py`` answers every pattern query by building prefix-
doubling rank levels over corpus + patterns-as-pseudo-docs per call — the
right shape for one-shot analytics, but the suite's #1 cost when the same
corpus is probed repeatedly (∞-gram inference pays the full O(log n)-round
construction per prompt). An infini-gram service (Liu et al. 2024) builds
its suffix array ONCE and serves queries from it; this module is that
split, mirroring the engine's other persisted indexes
(``operators/ann.py:ivf_write/ivf_read/pq_write``).

What persists (per power-of-two width h up to ``max_width``):

- ``level_<h>``  — (doc_key, pos, rank): the rank table, same content the
  in-memory construction checkpoints per round.
- ``dict_<h>``   — the DENSE-RANK DICTIONARY that created it: width 1 is
  (k: 1-char string → rank); width 2h is (r1, r2 → rank), the doubling
  step's (rank, rank-at-pos+h) re-rank mapping.

The dictionaries are what make the index QUERYABLE by unseen patterns
without rebuilding: a pattern's rank at width 2h is dict-lookup of its two
half ranks, so pattern ranks at every needed width cost O(log max_width)
broadcast joins (tiny pattern side against one dictionary scan each) —
map-only jobs, no global sort, no shuffle. Matching then reuses the exact
refinement loop of the in-memory matcher
(``suffix._refine_pattern_candidates``): rank equality at width h ⟺ the
h-char strings are equal, and that holds with corpus-only dictionaries
because equality (not order) is all the matcher uses — a pattern piece
absent from every dictionary simply has no rank and kills its candidates,
which is correct (the full pattern cannot occur either).

Scale shape: build cost equals the bounded construction (O(log max_width)
global re-rank rounds) plus one parquet write per level — paid once. Query
cost is O(log max_width) map-only dictionary/level scans with broadcast
pattern sides; at 100 TB the levels are the big tables and every scan of
them is an embarrassingly parallel filter-join, no shuffle. Staleness is
the caller's contract, exactly like ``ivf_append``'s drift guard and any
materialized view: rebuild when the corpus changes (``_index_meta.json``
records n_docs + total_chars so ``read_or_build(verify=True)`` can check
cheaply).

Patterns up to ``2 * max_width - 1`` chars are servable (the binary
decomposition seeds at 2^floor(log2 L) ≤ max_width and refines with
strictly smaller distinct widths).
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

META_NAME = "_index_meta.json"


def build_suffix_index(
    docs: DataFrame,
    path: str,
    max_width: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "SuffixIndex":
    """Construct and persist the rank levels + dense-rank dictionaries of
    ``docs`` up to ``max_width`` chars. Parquet writes double as the
    per-round lineage truncation (the reliable-checkpoint pattern —
    what's on disk IS what the next round consumed). The directory is
    committed by temp-build-then-rename, so readers never see a
    half-written index; ``path`` must be driver-reachable local/NFS
    storage (same contract as ``ivf_write``'s sidecar)."""
    from frappe_data_pipelines_spark.operators.guards import collect_bounded
    from frappe_data_pipelines_spark.operators.suffix import _global_dense_rank
    from frappe_data_pipelines_spark.sources.tables import spread_scan

    if max_width < 1:
        raise ValueError("max_width must be >= 1")
    spark = docs.sparkSession
    tmp = path.rstrip("/") + f".tmp-{os.getpid()}"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    def _commit(df: DataFrame, name: str) -> DataFrame:
        df.write.mode("overwrite").parquet(os.path.join(tmp, name))
        return spark.read.parquet(os.path.join(tmp, name))

    base = spread_scan(
        docs.select(
            F.col(id_col).cast("string").alias("doc_key"),
            F.col(text_col).alias("text"),
        )
    ).filter(F.length("text") > 0)

    (stats,) = collect_bounded(
        base.agg(
            F.max(F.length("text")).alias("m"),
            F.count("*").alias("n"),
            F.sum(F.length("text")).alias("c"),
        ),
        1,
        "build_suffix_index corpus probe",
    )
    max_len, n_docs, total_chars = stats["m"] or 0, stats["n"], stats["c"] or 0

    widths: list[int] = []
    if max_len > 0:
        suf = base.select(
            "doc_key",
            F.explode(F.sequence(F.lit(1), F.length("text"))).alias("pos"),
            F.col("text"),
        ).select(
            "doc_key",
            F.col("pos").cast("long").alias("pos"),
            F.substring(F.col("text"), F.col("pos"), F.lit(1)).alias("k"),
        )
        d1 = _commit(_global_dense_rank(suf.select("k"), ["k"], "rank"), "dict_1")
        cur = _commit(
            suf.join(F.broadcast(d1), "k").select("doc_key", "pos", "rank"),
            "level_1",
        )
        widths.append(1)
        h = 1
        target = min(max_len, max_width)
        lead_w = Window.partitionBy("doc_key").orderBy("pos")
        while h < target:
            paired = cur.select(
                "doc_key",
                "pos",
                F.col("rank").alias("r1"),
                F.coalesce(
                    F.lead("rank", h).over(lead_w), F.lit(0).cast("long")
                ).alias("r2"),
            )
            d = _commit(
                _global_dense_rank(paired.select("r1", "r2"), ["r1", "r2"], "rank"),
                f"dict_{2 * h}",
            )
            cur = _commit(
                paired.join(d, ["r1", "r2"]).select("doc_key", "pos", "rank"),
                f"level_{2 * h}",
            )
            h *= 2
            widths.append(h)

    meta = {
        "kind": "char-suffix-rank-index",
        "widths": widths,
        "max_width": max_width,
        "n_docs": n_docs,
        "total_chars": total_chars,
    }
    with open(os.path.join(tmp, META_NAME), "w") as f:
        json.dump(meta, f)
    shutil.rmtree(path, ignore_errors=True)
    os.rename(tmp, path)
    return SuffixIndex(spark, path, meta)


class SuffixIndex:
    """Handle on a persisted suffix-rank index directory. ``level(w)`` /
    ``rank_dict(w)`` are plain parquet reads — lazily planned, scanned by
    whatever query consumes them."""

    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.widths = list(meta["widths"])
        self.max_width = meta["max_width"]
        self.n_docs = meta.get("n_docs")
        self.total_chars = meta.get("total_chars")

    @staticmethod
    def read(spark: SparkSession, path: str) -> "SuffixIndex":
        with open(os.path.join(path, META_NAME)) as f:
            return SuffixIndex(spark, path, json.load(f))

    @staticmethod
    def read_or_build(
        spark: SparkSession,
        docs: DataFrame,
        path: str,
        max_width: int = 8,
        id_col: str = "doc_id",
        text_col: str = "text",
        verify: bool = False,
    ) -> "SuffixIndex":
        """Load the index at ``path`` if present (rebuilding when
        ``verify=True`` finds an (n_docs, total_chars) mismatch with
        ``docs``, or when the stored max_width is smaller than requested);
        build it otherwise."""
        if os.path.isfile(os.path.join(path, META_NAME)):
            idx = SuffixIndex.read(spark, path)
            stale = idx.max_width < max_width
            if verify and not stale:
                from frappe_data_pipelines_spark.operators.guards import (
                    collect_bounded,
                )

                (st,) = collect_bounded(
                    docs.filter(F.length(text_col) > 0).agg(
                        F.count("*").alias("n"),
                        F.sum(F.length(text_col)).alias("c"),
                    ),
                    1,
                    "SuffixIndex verify probe",
                )
                stale = (st["n"], st["c"] or 0) != (idx.n_docs, idx.total_chars)
            if not stale:
                return idx
        return build_suffix_index(docs, path, max_width, id_col, text_col)

    def level(self, w: int) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, f"level_{w}"))

    def rank_dict(self, w: int) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, f"dict_{w}"))

    def summary(self) -> list[tuple[int, int, int]]:
        """[(width, n_positions, n_distinct)] per level — n_distinct is
        max(rank), exact under dense-rank semantics. One tiny agg job per
        level."""
        out = []
        for w in self.widths:
            row = self.level(w).agg(
                F.count("*").alias("n"), F.max("rank").alias("m")
            ).collect()[0]
            out.append((w, row["n"], row["m"]))
        return out


def _indexed_pattern_ranks(
    index: SuffixIndex, pats: DataFrame, h_max: int
) -> dict[int, DataFrame]:
    """Pattern rank tables (pattern_id, pos, rank) at every power-of-two
    width ≤ ``h_max``, computed FROM the persisted dictionaries: width 1
    by char lookup, width 2h by (r1, r2) pair lookup of the two in-bounds
    halves. Each width is one broadcast join (tiny pattern side) against
    one dictionary scan; results are eagerly localCheckpoint'ed because
    they are tiny and re-referenced by the seed + refinement joins."""
    if 1 not in index.widths:
        raise ValueError(f"index at {index.path} has no levels (empty corpus?)")
    p1 = pats.select(
        "pattern_id",
        F.explode(F.sequence(F.lit(1), F.length("pattern"))).alias("p"),
        "pattern",
    ).select(
        "pattern_id",
        F.col("p").cast("long").alias("pos"),
        F.col("pattern").substr(F.col("p"), F.lit(1)).alias("k"),
    )
    ranks = {
        1: index.rank_dict(1)
        .join(F.broadcast(p1), "k")
        .select("pattern_id", "pos", "rank")
        .localCheckpoint(eager=True)
    }
    w = 1
    while 2 * w <= h_max:
        if 2 * w not in index.widths:
            raise ValueError(
                f"pattern needs width {2 * w} but index holds {index.widths} "
                f"(longest servable pattern is 2*max_built_width-1)"
            )
        prev = ranks[w]
        pairs = prev.select(
            "pattern_id", "pos", F.col("rank").alias("r1")
        ).join(
            prev.select(
                "pattern_id",
                (F.col("pos") - w).alias("pos"),
                F.col("rank").alias("r2"),
            ),
            ["pattern_id", "pos"],
        )
        ranks[2 * w] = (
            index.rank_dict(2 * w)
            .join(F.broadcast(pairs), ["r1", "r2"])
            .select("pattern_id", "pos", "rank")
            .localCheckpoint(eager=True)
        )
        w *= 2
    return ranks


def _indexed_match(index: SuffixIndex, pats: DataFrame, pat_rows) -> DataFrame:
    """(doc_key, pos, pattern_id, pattern_len) for every exact occurrence —
    the persisted-index twin of ``suffix._pattern_match_positions``: same
    refinement loop (reused verbatim), with pattern ranks coming from the
    dictionaries instead of riding a fresh construction."""
    from frappe_data_pipelines_spark.operators.suffix import (
        _refine_pattern_candidates,
    )

    plen_of = {r["pattern_id"]: len(r["pattern"]) for r in pat_rows}
    h0_of = {p: 1 << int(math.log2(n)) for p, n in plen_of.items()}
    h_max = max(h0_of.values())
    if not index.widths:
        # empty-corpus index: nothing can match anything
        return index.spark.createDataFrame(
            [], "doc_key string, pos long, pattern_id long, pattern_len long"
        )
    built = max(index.widths)
    if h_max > built:
        raise ValueError(
            f"pattern of length {max(plen_of.values())} needs seed width "
            f"{h_max}, but the index was built to width {built} — rebuild "
            f"with max_width >= {h_max}"
        )
    ranks = _indexed_pattern_ranks(index, pats, h_max)
    by_width = {
        w: index.level(w)
        .select(
            F.concat(F.lit("d:"), F.col("doc_key")).alias("doc_id"),
            "pos",
            "rank",
        )
        .unionByName(
            pr.select(
                F.concat(F.lit("p:"), F.col("pattern_id").cast("string")).alias(
                    "doc_id"
                ),
                "pos",
                "rank",
            )
        )
        for w, pr in ranks.items()
    }
    return _refine_pattern_candidates(index.spark, by_width, plen_of, h0_of)


def indexed_pattern_counts(
    index: SuffixIndex, patterns: DataFrame, max_patterns: int = 10_000
) -> DataFrame:
    """``substring_pattern_counts`` served from the persisted index:
    (pattern_id, pattern, pattern_len, n_docs, n_occurrences), zero rows
    kept. No construction — O(log max_width) dictionary/level scans."""
    from frappe_data_pipelines_spark.operators.suffix import _collect_patterns

    pats, pat_rows = _collect_patterns(patterns, "indexed_pattern_counts", max_patterns)
    zero = pats.select(
        "pattern_id", "pattern", F.length("pattern").cast("long").alias("pattern_len")
    )
    if not pat_rows:
        return zero.select(
            "pattern_id", "pattern", "pattern_len",
            F.lit(0).cast("long").alias("n_docs"),
            F.lit(0).cast("long").alias("n_occurrences"),
        ).limit(0)
    matches = _indexed_match(index, pats, pat_rows)
    per_pat = matches.groupBy("pattern_id").agg(
        F.countDistinct("doc_key").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_occurrences"),
    )
    return zero.join(per_pat, "pattern_id", "left").select(
        "pattern_id",
        "pattern",
        "pattern_len",
        F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
        F.coalesce("n_occurrences", F.lit(0)).cast("long").alias("n_occurrences"),
    )


def indexed_pattern_continuations(
    docs: DataFrame,
    index: SuffixIndex,
    patterns: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_patterns: int = 10_000,
) -> DataFrame:
    """``pattern_continuations`` served from the persisted index. ``docs``
    must be the SAME corpus the index was built from (the one extra step —
    reading the char after each match — needs the text; the index stores
    ranks, not text). Unhinted corpus join for the same broadcast-OOM
    reason as the uncached path."""
    from frappe_data_pipelines_spark.operators.suffix import _collect_patterns

    pats, pat_rows = _collect_patterns(
        patterns, "indexed_pattern_continuations", max_patterns
    )
    if not pat_rows:
        return pats.select(
            "pattern_id",
            "pattern",
            F.lit("").alias("next_char"),
            F.lit(0).cast("long").alias("n_continuations"),
        ).limit(0)
    matches = _indexed_match(index, pats, pat_rows)
    corpus = docs.select(
        F.col(id_col).cast("string").alias("doc_key"), F.col(text_col).alias("text")
    )
    nxt = corpus.join(matches, "doc_key").select(
        "pattern_id",
        F.expr("substring(text, CAST(pos + pattern_len AS INT), 1)").alias(
            "next_char"
        ),
    )
    return (
        nxt.groupBy("pattern_id", "next_char")
        .agg(F.count("*").cast("long").alias("n_continuations"))
        .join(F.broadcast(pats), "pattern_id")
        .select("pattern_id", "pattern", "next_char", "n_continuations")
    )


def infinigram_backoff_indexed(
    docs: DataFrame,
    index: SuffixIndex,
    query_text: str,
    min_context: int = 1,
    max_context: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """∞-gram inference served from the persisted index — identical
    result contract to ``suffix.infinigram_backoff`` (longest present
    query suffix wins; next-char distribution with backoff-free
    probabilities), without rebuilding rank levels: this is the
    build-once/query-many split an infini-gram service runs (VERDICT r10
    task 2)."""
    L = len(query_text)
    hi = min(max_context if max_context is not None else L, L)
    if min_context < 1 or min_context > hi:
        raise ValueError("need 1 <= min_context <= max_context <= len(query_text)")
    spark = docs.sparkSession
    pats = spark.createDataFrame(
        [(n, query_text[L - n :]) for n in range(min_context, hi + 1)],
        "pattern_id long, pattern string",
    )
    cont = indexed_pattern_continuations(
        docs, index, pats, id_col, text_col
    ).localCheckpoint(eager=True)
    best = cont.agg(F.max("pattern_id").alias("__best"))
    chosen = cont.crossJoin(F.broadcast(best)).filter(
        F.col("pattern_id") == F.col("__best")
    )
    totals = chosen.groupBy("pattern_id").agg(
        F.sum("n_continuations").alias("__total")
    )
    return chosen.join(F.broadcast(totals), "pattern_id").select(
        F.col("pattern_id").alias("context_len"),
        F.col("pattern").alias("context"),
        "next_char",
        "n_continuations",
        F.round(F.col("n_continuations") / F.col("__total"), 6).alias("p"),
    )
