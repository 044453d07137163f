"""Distributed suffix-array construction (prefix doubling).

Lee et al. 2021 build their exact-substring dedup on a SINGLE-NODE suffix
array; this engine's production dedup path is the windowed/winnowed span
machinery (``operators/dedup.py``), which is cheaper at 100 TB because it
never globally sorts. A suffix array is still the right tool when the
question needs full lexicographic suffix order with NO length threshold —
longest repeated substring, arbitrary-length substring counts, suffix-rank
fingerprints — so the construction itself must exist in distributed form.

The classic prefix-doubling algorithm (Manber & Myers 1990) is a natural
BSP/Spark fit: O(log n) rounds, each one global sort + one per-document
shift. Rank of every suffix after round h is the dense rank of its first
h characters; doubling combines (rank[i], rank[i+h]) and re-ranks. The
only non-trivial distributed piece is the GLOBAL dense rank, which we do
without a single-partition window: range-repartition the distinct keys,
row_number within partitions, and add per-partition offsets (the
zipWithIndex pattern, expressed in DataFrames — the offset table has one
row per partition, so its window is driver-tiny by construction).

Semantics: suffixes are compared as plain strings, so a proper prefix
sorts before its extensions — the '$ < every char' sentinel convention.
Identical suffixes (two documents sharing an entire tail) share a rank
(dense). Cross-engine: the DuckDB oracle is one window function,
``dense_rank() OVER (ORDER BY substr(text, pos))``.

Scale notes: each round shuffles the (doc, pos, rank) relation twice
(lead + re-rank join) and the distinct-key relation twice; rounds =
ceil(log2(max_len / start_width)). Lineage is truncated per round with
``localCheckpoint`` — the standard move for iterative algorithms (GraphX
does the same) — so the plan stays O(1) deep regardless of text length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _global_dense_rank(keys: DataFrame, cols: list[str], out: str) -> DataFrame:
    """Dense-rank DISTINCT ``keys`` rows by ``cols`` ascending, 1-based,
    without a global single-partition window.

    Range-repartition puts partition ids in key order; row_number inside
    each partition plus the cumulative size of earlier partitions is the
    global position. The offsets table has exactly one row per shuffle
    partition, so its ordering window is bounded by the partition count,
    never by the data."""
    spark = keys.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    ordered = keys.distinct().repartitionByRange(n_parts, *cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    local = ordered.withColumn(
        "__lrn", F.row_number().over(Window.partitionBy("__pid").orderBy(*cols))
    )
    offs = (
        local.groupBy("__pid")
        .agg(F.count("*").alias("__cnt"))
        .withColumn(
            "__off",
            F.coalesce(
                # constant partition key: the relation is one row per
                # shuffle partition (≤ a few hundred rows), so the single
                # window partition is bounded by cluster width, not data —
                # the lit(0) key just states that to Spark (no WARN)
                F.sum("__cnt").over(
                    Window.partitionBy(F.lit(0))
                    .orderBy("__pid")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__off")
    )
    return (
        local.join(F.broadcast(offs), "__pid")
        .withColumn(out, (F.col("__off") + F.col("__lrn")).cast("long"))
        .drop("__pid", "__lrn", "__off")
    )


def suffix_rank_levels(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    start_width: int = 8,
) -> list[tuple[int, DataFrame]]:
    """Prefix-doubling rank tables at every width: [(h, df)] ascending,
    where each df is (doc_id, pos, rank) with rank = dense rank of the
    first ``h`` characters of the suffix (corpus-global). The last table's
    width covers the longest document, so its ranks order full suffixes.

    Keeping every level is the classic O(n log n)-space trade that buys
    O(log n) LCP queries WITHOUT character access (``suffix_lcp_adjacent``
    consumes it); callers that only need final ranks use
    ``suffix_ranks`` and hold one table."""
    from frappe_data_pipelines_spark.operators.guards import collect_bounded
    from frappe_data_pipelines_spark.sources.tables import spread_scan

    if start_width < 1:
        raise ValueError("start_width must be >= 1")
    base = spread_scan(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    ).filter(F.length("text") > 0)

    (max_len_row,) = collect_bounded(
        base.agg(F.max(F.length("text")).alias("m")), 1, "suffix_ranks max-length probe"
    )
    max_len = max_len_row["m"] or 0
    if max_len == 0:
        empty = base.select(
            "doc_id", F.lit(1).cast("long").alias("pos"), F.lit(1).cast("long").alias("rank")
        ).limit(0)
        return [(start_width, empty)]

    suf = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.length("text"))).alias("pos"),
        F.col("text"),
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.substring(F.col("text"), F.col("pos"), F.lit(start_width)).alias("k"),
    )
    ranked0 = _global_dense_rank(suf.select("k"), ["k"], "rank")
    cur = (
        suf.join(ranked0, "k")
        .select("doc_id", "pos", "rank")
        .localCheckpoint(eager=True)
    )
    levels = [(start_width, cur)]

    h = start_width
    lead_w = Window.partitionBy("doc_id").orderBy("pos")
    while h < max_len:
        paired = cur.withColumn(
            "r2", F.coalesce(F.lead("rank", h).over(lead_w), F.lit(0).cast("long"))
        )
        reranked = _global_dense_rank(
            paired.select("rank", "r2"), ["rank", "r2"], "new_rank"
        )
        cur = (
            paired.join(reranked, ["rank", "r2"])
            .select("doc_id", "pos", F.col("new_rank").alias("rank"))
            .localCheckpoint(eager=True)
        )
        h *= 2
        levels.append((h, cur))
    return levels


def suffix_ranks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    start_width: int = 8,
) -> DataFrame:
    """(doc_id, pos, rank): 1-based dense rank of every suffix of every
    document under plain string order, via distributed prefix doubling.

    ``start_width`` seeds round 0 with the dense rank of the first
    ``start_width`` characters (fewer rounds than the textbook 1-char
    seed); each round doubles the compared prefix until it covers the
    longest document, at which point ranks are exact for all suffixes
    (equal suffixes keep equal ranks — dense semantics)."""
    return suffix_rank_levels(docs, id_col, text_col, start_width)[-1][1]


def suffix_lcp_adjacent(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, pos_a, doc_b, pos_b, lcp) for every ADJACENT pair of
    suffixes in corpus-wide lexicographic order — the LCP array of the
    generalized suffix array, computed character-comparison-free.

    Adjacency comes from a global row_number over (rank, doc, pos); each
    pair's LCP is decomposed over the prefix-doubling rank tables
    descending (rank_h equal → first h chars equal → consume h and
    advance both suffixes), the O(log n)-level LCP scheme. The
    end-of-string convention (a short suffix's rank key is its whole
    tail) can overcount only when both suffixes ended, so one final clamp
    to the remaining lengths makes every LCP exact."""
    levels = suffix_rank_levels(docs, id_col, text_col, start_width=1)
    final = levels[-1][1]
    idx = _global_dense_rank(
        final.select("rank", "doc_id", "pos"), ["rank", "doc_id", "pos"], "idx"
    )
    a = idx.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "idx"
    )
    b = idx.select(
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
        (F.col("idx") - 1).alias("idx"),
    )
    state = (
        a.join(b, "idx")
        .select(
            "doc_a",
            "pos_a",
            "doc_b",
            "pos_b",
            F.col("pos_a").alias("pa"),
            F.col("pos_b").alias("pb"),
            F.lit(0).cast("long").alias("lcp"),
        )
    )
    for h, tbl in reversed(levels):
        ra = tbl.select(
            F.col("doc_id").alias("doc_a"),
            F.col("pos").alias("pa"),
            F.col("rank").alias("__ra"),
        )
        rb = tbl.select(
            F.col("doc_id").alias("doc_b"),
            F.col("pos").alias("pb"),
            F.col("rank").alias("__rb"),
        )
        eq = (
            F.col("__ra").isNotNull()
            & F.col("__rb").isNotNull()
            & (F.col("__ra") == F.col("__rb"))
        )
        state = (
            state.join(ra, ["doc_a", "pa"], "left")
            .join(rb, ["doc_b", "pb"], "left")
            .select(
                "doc_a",
                "pos_a",
                "doc_b",
                "pos_b",
                F.when(eq, F.col("pa") + h).otherwise(F.col("pa")).alias("pa"),
                F.when(eq, F.col("pb") + h).otherwise(F.col("pb")).alias("pb"),
                F.when(eq, F.col("lcp") + h).otherwise(F.col("lcp")).alias("lcp"),
            )
        )
    lens = docs.select(
        F.col(id_col).alias("doc_id"), F.length(text_col).cast("long").alias("__n")
    )
    return (
        state.join(lens.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("__n", "__na"), "doc_a")
        .join(lens.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("__n", "__nb"), "doc_b")
        .select(
            "doc_a",
            "pos_a",
            "doc_b",
            "pos_b",
            F.least(
                F.col("lcp"),
                F.col("__na") - F.col("pos_a") + 1,
                F.col("__nb") - F.col("pos_b") + 1,
            ).alias("lcp"),
        )
    )


def longest_repeated_substrings(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` longest substrings occurring at least twice in the corpus
    (across or within documents) — the flagship suffix-array application.

    Classic reduction: the longest repeated substring is the maximum LCP
    between ADJACENT suffixes in lexicographic order (any two suffixes'
    LCP is bounded by some adjacent pair's between them); the LCPs come
    from ``suffix_lcp_adjacent``. Returns (lcp, doc_a, pos_a, doc_b,
    pos_b, repeated) ordered by (lcp DESC, doc_a, pos_a, doc_b, pos_b),
    limit ``k`` — a total deterministic order, so the row set is
    oracle-stable."""
    texts = docs.select(
        F.col(id_col).alias("doc_a"), F.col(text_col).alias("__text_a")
    )
    return (
        suffix_lcp_adjacent(docs, id_col, text_col)
        .filter(F.col("lcp") >= 1)
        .join(texts, "doc_a")
        .select(
            "lcp",
            "doc_a",
            "pos_a",
            "doc_b",
            "pos_b",
            F.expr("substring(__text_a, int(pos_a), int(lcp))").alias("repeated"),
        )
        .orderBy(
            F.col("lcp").desc(), "doc_a", "pos_a", "doc_b", "pos_b"
        )
        .limit(k)
    )


def distinct_substring_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row: (n_suffix_chars, sum_lcp, n_distinct_substrings) for the
    corpus — the generalized-suffix-array identity

        #distinct substrings = Σ len(suffix) − Σ LCP(adjacent pairs),

    which holds with duplicate suffixes too (an identical adjacent pair
    contributes len and cancels via lcp = len). A corpus-diversity
    statistic no sketch gives exactly: it counts every distinct substring
    of every length in one pass over the suffix machinery."""
    lcps = suffix_lcp_adjacent(docs, id_col, text_col)
    # integer arithmetic end to end: len*(len+1) is even, `/` would detour
    # through double (silent low-bit loss past 2^53 — exactly the corpus
    # sums this operator exists for), and the running total accumulates in
    # DECIMAL(38,0) so even a 10^20-substring corpus sums exactly.
    per_doc = (
        F.length(text_col).cast("long")
        * (F.length(text_col).cast("long") + F.lit(1).cast("long"))
    ).cast("decimal(38,0)")
    chars = (
        docs.filter(F.length(text_col) > 0)
        .agg(F.sum(per_doc).alias("__twice"))
        .select((F.col("__twice") / 2).cast("long").alias("n_suffix_chars"))
    )
    lsum = lcps.agg(F.coalesce(F.sum("lcp"), F.lit(0)).cast("long").alias("sum_lcp"))
    return chars.crossJoin(lsum).select(
        "n_suffix_chars",
        "sum_lcp",
        (F.col("n_suffix_chars") - F.col("sum_lcp")).alias("n_distinct_substrings"),
    )


def longest_duplicated_prefix_len(ranked: DataFrame, docs: DataFrame,
                                  id_col: str = "doc_id",
                                  text_col: str = "text") -> DataFrame:
    """From a ``suffix_ranks`` result: per duplicated-rank group (two or
    more suffixes sharing a rank are IDENTICAL strings), report the group
    size and the suffix length — the exact 'repeated tail' accounting the
    dense ranks make free. (Full LCP/Kasai is driver-side future work;
    equal-suffix groups need no character comparison at all.)"""
    dup = (
        ranked.groupBy("rank")
        .agg(F.count("*").cast("bigint").alias("n_suffixes"))
        .filter(F.col("n_suffixes") >= 2)
    )
    lens = docs.select(
        F.col(id_col).alias("doc_id"), F.length(text_col).cast("long").alias("n")
    )
    return (
        ranked.join(dup, "rank")
        .join(lens, "doc_id")
        .select(
            "rank",
            "n_suffixes",
            "doc_id",
            "pos",
            (F.col("n") - F.col("pos") + 1).alias("suffix_len"),
        )
    )
