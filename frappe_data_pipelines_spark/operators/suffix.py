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
    from frappe_data_pipelines_spark.operators.guards import bounded_window_key

    offs = (
        local.groupBy("__pid")
        .agg(F.count("*").alias("__cnt"))
        .withColumn(
            "__off",
            F.coalesce(
                # constant partition key: the relation is one row per
                # shuffle partition (≤ a few hundred rows), so the single
                # window partition is bounded by cluster width, not data —
                # bounded_window_key states that in the physical plan
                # (a bare lit(0) would be constant-folded OUT of the spec)
                F.sum("__cnt").over(
                    Window.partitionBy(bounded_window_key("__pid"))
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
    checkpoint_dir: str | None = None,
    max_width: int | None = None,
) -> list[tuple[int, DataFrame]]:
    """Prefix-doubling rank tables at every width: [(h, df)] ascending,
    where each df is (doc_id, pos, rank) with rank = dense rank of the
    first ``h`` characters of the suffix (corpus-global). The last table's
    width covers the longest document, so its ranks order full suffixes.

    Keeping every level is the classic O(n log n)-space trade that buys
    O(log n) LCP queries WITHOUT character access (``suffix_lcp_adjacent``
    consumes it); callers that only need final ranks use
    ``suffix_ranks`` and hold one table.

    ``checkpoint_dir``: per-round lineage truncation defaults to
    ``localCheckpoint`` (blocks live on executors — lost with an executor,
    fine in local mode and for short jobs). Pass a directory to use
    RELIABLE checkpoints instead (``sparkContext.setCheckpointDir`` +
    ``.checkpoint()``): blocks go to the shared filesystem, so a
    multi-hour 100 TB construction survives executor loss at the price of
    one write+read per round. Identical results either way.

    ``max_width``: stop doubling once the level width reaches this bound —
    ranks then order suffixes by their first ``max_width`` chars only.
    Callers that never compare beyond a known width (pattern counting
    bounded by the longest pattern) pay O(log max_width) rounds instead of
    O(log max_doc_len): at 100 TB that is the difference between ~5 and
    ~25 global re-rank shuffles."""
    from frappe_data_pipelines_spark.operators.guards import collect_bounded
    from frappe_data_pipelines_spark.sources.tables import spread_scan

    if start_width < 1:
        raise ValueError("start_width must be >= 1")
    if max_width is not None and max_width < start_width:
        raise ValueError("max_width must be >= start_width")
    if checkpoint_dir is not None:
        docs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

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
    cur = _truncate(suf.join(ranked0, "k").select("doc_id", "pos", "rank"))
    levels = [(start_width, cur)]

    h = start_width
    target = max_len if max_width is None else min(max_len, max_width)
    lead_w = Window.partitionBy("doc_id").orderBy("pos")
    while h < target:
        paired = cur.withColumn(
            "r2", F.coalesce(F.lead("rank", h).over(lead_w), F.lit(0).cast("long"))
        )
        reranked = _global_dense_rank(
            paired.select("rank", "r2"), ["rank", "r2"], "new_rank"
        )
        cur = _truncate(
            paired.join(reranked, ["rank", "r2"])
            .select("doc_id", "pos", F.col("new_rank").alias("rank"))
        )
        h *= 2
        levels.append((h, cur))
    return levels


def suffix_ranks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    start_width: int = 8,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id, pos, rank): 1-based dense rank of every suffix of every
    document under plain string order, via distributed prefix doubling.

    ``start_width`` seeds round 0 with the dense rank of the first
    ``start_width`` characters (fewer rounds than the textbook 1-char
    seed); each round doubles the compared prefix until it covers the
    longest document, at which point ranks are exact for all suffixes
    (equal suffixes keep equal ranks — dense semantics)."""
    return suffix_rank_levels(docs, id_col, text_col, start_width, checkpoint_dir)[-1][1]


def token_suffix_rank_levels(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    start_width: int = 4,
    checkpoint_dir: str | None = None,
    max_width: int | None = None,
) -> list[tuple[int, DataFrame]]:
    """Prefix-doubling rank tables over TOKEN sequences — the unit Lee et
    al. 2021 and infini-gram actually operate on. Identical algorithm to
    ``suffix_rank_levels`` with ``slice`` in place of ``substring``:
    Spark and DuckDB both order ``array<string>`` lexicographically
    element-wise with shorter-prefix-first, exactly the string-suffix
    convention, so the global dense rank machinery (range partition +
    per-partition row_number + offsets) is reused unchanged on the array
    keys. Returns [(h, (doc_id, pos, rank))] with pos a 1-based TOKEN
    position and rank the corpus-global dense rank of the suffix's first
    ``h`` tokens."""
    from frappe_data_pipelines_spark.operators.guards import collect_bounded
    from frappe_data_pipelines_spark.sources.tables import spread_scan

    if start_width < 1:
        raise ValueError("start_width must be >= 1")
    if max_width is not None and max_width < start_width:
        raise ValueError("max_width must be >= start_width")
    if checkpoint_dir is not None:
        docs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _truncate(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    base = spread_scan(
        docs.select(F.col(id_col).alias("doc_id"), F.col(tokens_col).alias("toks"))
    ).filter(F.size("toks") > 0)

    (max_len_row,) = collect_bounded(
        base.agg(F.max(F.size("toks")).alias("m")),
        1,
        "token_suffix_ranks max-length probe",
    )
    max_len = max_len_row["m"] or 0
    if max_len == 0:
        empty = base.select(
            "doc_id",
            F.lit(1).cast("long").alias("pos"),
            F.lit(1).cast("long").alias("rank"),
        ).limit(0)
        return [(start_width, empty)]

    suf = base.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("toks"))).alias("pos"),
        F.col("toks"),
    ).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.expr(f"slice(toks, pos, {start_width})").alias("k"),
    )
    ranked0 = _global_dense_rank(suf.select("k"), ["k"], "rank")
    cur = _truncate(suf.join(ranked0, "k").select("doc_id", "pos", "rank"))
    levels = [(start_width, cur)]

    h = start_width
    target = max_len if max_width is None else min(max_len, max_width)
    lead_w = Window.partitionBy("doc_id").orderBy("pos")
    while h < target:
        paired = cur.withColumn(
            "r2", F.coalesce(F.lead("rank", h).over(lead_w), F.lit(0).cast("long"))
        )
        reranked = _global_dense_rank(
            paired.select("rank", "r2"), ["rank", "r2"], "new_rank"
        )
        cur = _truncate(
            paired.join(reranked, ["rank", "r2"])
            .select("doc_id", "pos", F.col("new_rank").alias("rank"))
        )
        h *= 2
        levels.append((h, cur))
    return levels


def token_suffix_ranks(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    start_width: int = 4,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(doc_id, pos, rank): corpus-global dense rank of every TOKEN
    suffix of every document — the token-level twin of ``suffix_ranks``
    (see ``token_suffix_rank_levels`` for why the array ordering makes
    this a drop-in generalization)."""
    return token_suffix_rank_levels(
        docs, id_col, tokens_col, start_width, checkpoint_dir
    )[-1][1]


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
    # sums this operator exists for), and the totals accumulate AND are
    # RETURNED in DECIMAL(38,0) — a 10^20-substring corpus sums exactly
    # and never passes through a BIGINT cast that would wrap (non-ANSI)
    # or throw (ANSI) past 2^63. `div` is exact integer division on
    # decimals (the product is even by construction).
    per_doc = (
        F.length(text_col).cast("long")
        * (F.length(text_col).cast("long") + F.lit(1).cast("long"))
    ).cast("decimal(38,0)")
    chars = (
        docs.filter(F.length(text_col) > 0)
        .agg(F.sum(per_doc).alias("__twice"))
        .select(
            F.expr("CAST(__twice DIV 2 AS DECIMAL(38,0))").alias("n_suffix_chars")
        )
    )
    lsum = lcps.agg(
        F.coalesce(F.sum("lcp"), F.lit(0))
        .cast("decimal(38,0)")
        .alias("sum_lcp")
    )
    return chars.crossJoin(lsum).select(
        "n_suffix_chars",
        "sum_lcp",
        (F.col("n_suffix_chars") - F.col("sum_lcp"))
        .cast("decimal(38,0)")
        .alias("n_distinct_substrings"),
    )


def _collect_patterns(
    patterns: DataFrame,
    label: str,
    max_patterns: int,
    pattern_type: str = "string",
    pattern_col: str = "pattern",
):
    """Shared pattern-parameter intake for the whole matcher family: cast
    to (pattern_id long, pattern <type>), bound-collect (patterns are
    query parameters by contract), and validate — one place to change the
    rules for all char/token counting, continuation, and backoff
    entrypoints. Returns (pats DataFrame, collected rows)."""
    from frappe_data_pipelines_spark.operators.guards import collect_bounded

    pats = patterns.select(
        F.col("pattern_id").cast("long").alias("pattern_id"),
        F.col(pattern_col).cast(pattern_type).alias("pattern"),
    )
    rows = collect_bounded(pats, max_patterns, f"{label} patterns")
    if any(r["pattern"] is None or len(r["pattern"]) == 0 for r in rows):
        raise ValueError(f"{label}: empty/null pattern")
    if len({r["pattern_id"] for r in rows}) != len(rows):
        raise ValueError(f"{label}: duplicate pattern_id")
    return pats, rows


def substring_pattern_counts(
    docs: DataFrame,
    patterns: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_patterns: int = 10_000,
) -> DataFrame:
    """Exact occurrence counts of arbitrary-length patterns over the corpus
    via the suffix machinery — the 'substring frequency query' a suffix
    array exists to answer (count any pattern with NO length threshold and
    no corpus rescan per pattern; overlapping occurrences counted, the
    Lee-et-al./infini-gram counting semantics).

    ``patterns``: (pattern_id, pattern) — query parameters, bounded by
    contract (``max_patterns``). Returns one row per pattern:
    (pattern_id, pattern, pattern_len, n_docs, n_occurrences), zero rows
    included.

    How: patterns join the corpus as pseudo-documents before prefix
    doubling, so every rank table prices pattern substrings and corpus
    suffixes on ONE scale — rank equality at width h ⟺ the h-char strings
    are equal, making the whole match character-comparison-free. A pattern
    of length L is consumed by its binary decomposition: seed candidates
    from the level h0 = 2^floor(log2 L) (one broadcast-join against that
    level — suffixes whose first h0 chars rank-match the pattern's), then
    refine down the remaining bit-widths, each step one join of the
    (shrinking) candidate set against a checkpointed level table plus a
    broadcast of the pattern-side ranks. Ends with rem = 0: every
    surviving (doc, pos) is an exact occurrence.

    Scale shape: corpus cost is the shared level construction (already
    paid if levels are reused) + one scan of each seed level + one scan of
    each refinement level against a broadcast candidate set; per-pattern
    cost is O(log L) tiny joins. No per-pattern corpus scan, no character
    access after construction."""
    pats, pat_rows = _collect_patterns(
        patterns, "substring_pattern_counts", max_patterns
    )
    zero = pats.select(
        "pattern_id",
        "pattern",
        F.length("pattern").cast("long").alias("pattern_len"),
    )
    if not pat_rows:
        return zero.select(
            "pattern_id", "pattern", "pattern_len",
            F.lit(0).cast("long").alias("n_docs"),
            F.lit(0).cast("long").alias("n_occurrences"),
        ).limit(0)

    # patterns ride along as pseudo-docs: 'p:' keys; corpus docs 'd:'
    matches = _pattern_match_positions(docs, pats, pat_rows, id_col, text_col)
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


def _pattern_match_positions(
    docs: DataFrame,
    pats: DataFrame,
    pat_rows,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Every exact occurrence of every pattern as (doc_key, pos,
    pattern_id, pattern_len) — doc_key is the ORIGINAL id rendered as a
    string. The binary rank-decomposition engine behind
    ``substring_pattern_counts`` and ``pattern_continuations``; see the
    former's docstring for the algorithm and scale shape."""
    import math

    corp = docs.select(
        F.concat(F.lit("d:"), F.col(id_col).cast("string")).alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    pseudo = pats.select(
        F.concat(F.lit("p:"), F.col("pattern_id").cast("string")).alias("doc_id"),
        F.col("pattern").alias("text"),
    )
    plen_of = {r["pattern_id"]: len(r["pattern"]) for r in pat_rows}
    h0_of = {p: 1 << int(math.log2(n)) for p, n in plen_of.items()}
    # rank levels stop at the largest seed width — ranks never need to see
    # past the longest pattern, so construction is O(log max_pattern_len)
    # rounds, not O(log max_doc_len)
    levels = suffix_rank_levels(
        corp.unionByName(pseudo), start_width=1, max_width=max(h0_of.values())
    )
    return _refine_pattern_candidates(
        docs.sparkSession, dict(levels), plen_of, h0_of
    )


def _refine_pattern_candidates(
    spark, by_width: dict, plen_of: dict, h0_of: dict
) -> DataFrame:
    """The key-type-independent half of the pattern matcher: given rank
    levels over a combined corpus ('d:' keys) + patterns ('p:' keys) —
    char substrings or token slices, the loop never looks at the keys —
    seed candidates at each pattern's h0 level and refine down the binary
    bit-widths. Returns (doc_key, pos, pattern_id, pattern_len) for every
    exact occurrence."""
    seed_widths = sorted({h0_of[p] for p in h0_of})
    refine_widths = set()
    for p, h0 in h0_of.items():
        rem = plen_of[p] - h0
        w = h0 >> 1
        while rem > 0 and w >= 1:
            if rem >= w:
                refine_widths.add(w)
                rem -= w
            w >>= 1

    def pat_ranks(tbl: DataFrame) -> DataFrame:
        """(pattern_id, pos, rank) slice of a level table."""
        return tbl.filter(F.col("doc_id").startswith("p:")).select(
            F.expr("CAST(substring(doc_id, 3) AS BIGINT)").alias("pattern_id"),
            "pos",
            "rank",
        )

    meta = spark.createDataFrame(
        [(p, plen_of[p], h0_of[p]) for p in plen_of],
        "pattern_id long, plen long, h0 long",
    )

    seeds = None
    for w in seed_widths:
        tbl = by_width[w]
        targets = (
            pat_ranks(tbl)
            .filter(F.col("pos") == 1)
            .join(meta.filter(F.col("h0") == w), "pattern_id")
            .select("pattern_id", "plen", "rank")
        )
        s = (
            tbl.filter(F.col("doc_id").startswith("d:"))
            .join(F.broadcast(targets), "rank")
            .select(
                "doc_id",
                "pos",
                "pattern_id",
                (F.col("pos") + w).alias("pa"),
                F.lit(1 + w).cast("long").alias("pp"),
                (F.col("plen") - w).alias("rem"),
            )
        )
        seeds = s if seeds is None else seeds.unionByName(s)

    state = seeds
    for w in sorted(refine_widths, reverse=True):
        tbl = by_width[w]
        ra = tbl.select(
            "doc_id", F.col("pos").alias("pa"), F.col("rank").alias("__ra")
        )
        rp = pat_ranks(tbl).select(
            "pattern_id", F.col("pos").alias("pp"), F.col("rank").alias("__rp")
        )
        app = F.col("rem") >= w
        state = (
            state.join(ra, ["doc_id", "pa"], "left")
            .join(F.broadcast(rp), ["pattern_id", "pp"], "left")
            .filter(
                ~app
                | (
                    F.col("__ra").isNotNull()
                    & F.col("__rp").isNotNull()
                    & (F.col("__ra") == F.col("__rp"))
                )
            )
            .select(
                "doc_id",
                "pos",
                "pattern_id",
                F.when(app, F.col("pa") + w).otherwise(F.col("pa")).alias("pa"),
                F.when(app, F.col("pp") + w).otherwise(F.col("pp")).alias("pp"),
                F.when(app, F.col("rem") - w).otherwise(F.col("rem")).alias("rem"),
            )
        )

    return (
        state.filter(F.col("rem") == 0)  # invariant: binary decomposition consumed
        .join(F.broadcast(meta.select("pattern_id", "plen")), "pattern_id")
        .select(
            F.expr("substring(doc_id, 3)").alias("doc_key"),
            "pos",
            "pattern_id",
            F.col("plen").alias("pattern_len"),
        )
    )


def pattern_continuations(
    docs: DataFrame,
    patterns: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_patterns: int = 10_000,
) -> DataFrame:
    """The infini-gram continuation query (Liu et al. 2024's ∞-gram,
    restated over the distributed suffix machinery): for each context
    pattern, the distribution of the NEXT character across every exact
    corpus occurrence — (pattern_id, pattern, next_char, n_continuations),
    with next_char = '' when the match ends at a document boundary (the
    end-of-text event). Normalizing n_continuations per pattern gives the
    backoff-free ∞-gram LM probability of each continuation.

    Same engine as ``substring_pattern_counts`` (patterns ride the rank
    levels, binary decomposition, no character comparison to MATCH); the
    one extra step joins the match positions back to the corpus to read
    the single following character — unhinted, so AQE broadcasts a small
    match set and shuffle-joins a large one (a frequent context's
    occurrence count grows with the corpus; forcing a broadcast would be
    a driver OOM at scale). Patterns with zero occurrences contribute no
    rows (an empty distribution)."""
    pats, pat_rows = _collect_patterns(
        patterns, "pattern_continuations", max_patterns
    )
    if not pat_rows:
        return (
            pats.select(
                "pattern_id",
                "pattern",
                F.lit("").alias("next_char"),
                F.lit(0).cast("long").alias("n_continuations"),
            ).limit(0)
        )
    matches = _pattern_match_positions(docs, pats, pat_rows, id_col, text_col)
    corpus = docs.select(
        F.col(id_col).cast("string").alias("doc_key"), F.col(text_col).alias("text")
    )
    # no broadcast HINT here: a frequent context ("the ") has occurrences
    # proportional to corpus size, so forcing matches to the driver is a
    # broadcast OOM at scale — let AQE pick broadcast when the match set
    # measures small and fall back to a shuffle join when it doesn't
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


def token_pattern_counts(
    docs: DataFrame,
    patterns: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    pattern_col: str = "pattern",
    max_patterns: int = 10_000,
) -> DataFrame:
    """TOKEN-level substring-frequency search — exact overlapping
    occurrence counts of token n-grams of ANY length, the query unit
    infini-gram serves (``substring_pattern_counts`` is the char twin).
    ``patterns``: (pattern_id, pattern array<string>). Returns
    (pattern_id, pattern_len, n_docs, n_occurrences) with zero rows kept
    (the pattern array itself is omitted from the output: array columns
    don't hash into the oracle compare, and the id is the key).

    Same engine: patterns ride ``token_suffix_rank_levels`` as pseudo-docs
    (array slice keys), candidates seed at 2^floor(log2 L) and refine
    down the binary bit-widths — rank-table joins only, no token
    comparison after construction, no per-pattern corpus scan."""
    import math

    pats, pat_rows = _collect_patterns(
        patterns, "token_pattern_counts", max_patterns, "array<string>", pattern_col
    )
    zero = pats.select(
        "pattern_id", F.size("pattern").cast("long").alias("pattern_len")
    )
    if not pat_rows:
        return zero.select(
            "pattern_id",
            "pattern_len",
            F.lit(0).cast("long").alias("n_docs"),
            F.lit(0).cast("long").alias("n_occurrences"),
        ).limit(0)

    corp = docs.select(
        F.concat(F.lit("d:"), F.col(id_col).cast("string")).alias("doc_id"),
        F.col(tokens_col).alias("toks"),
    )
    pseudo = pats.select(
        F.concat(F.lit("p:"), F.col("pattern_id").cast("string")).alias("doc_id"),
        F.col("pattern").alias("toks"),
    )
    plen_of = {r["pattern_id"]: len(r["pattern"]) for r in pat_rows}
    h0_of = {p: 1 << int(math.log2(n)) for p, n in plen_of.items()}
    levels = token_suffix_rank_levels(
        corp.unionByName(pseudo), id_col="doc_id", tokens_col="toks",
        start_width=1, max_width=max(h0_of.values()),
    )
    matches = _refine_pattern_candidates(
        docs.sparkSession, dict(levels), plen_of, h0_of
    )
    per_pat = matches.groupBy("pattern_id").agg(
        F.countDistinct("doc_key").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_occurrences"),
    )
    return zero.join(per_pat, "pattern_id", "left").select(
        "pattern_id",
        "pattern_len",
        F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
        F.coalesce("n_occurrences", F.lit(0)).cast("long").alias("n_occurrences"),
    )


def pattern_token_continuations(
    docs: DataFrame,
    patterns: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_patterns: int = 10_000,
) -> DataFrame:
    """Next-TOKEN distribution after each context pattern — the unit an
    ∞-gram LM actually predicts (``pattern_continuations``' next-char is
    the primitive; here the continuation is the maximal space-delimited
    token starting at the match end, leading blanks skipped, '' at a
    document boundary). Same matcher, one regexp over the post-match
    substring: (pattern_id, pattern, next_token, n_continuations)."""
    pats, pat_rows = _collect_patterns(
        patterns, "pattern_token_continuations", max_patterns
    )
    if not pat_rows:
        return pats.select(
            "pattern_id",
            "pattern",
            F.lit("").alias("next_token"),
            F.lit(0).cast("long").alias("n_continuations"),
        ).limit(0)
    matches = _pattern_match_positions(docs, pats, pat_rows, id_col, text_col)
    corpus = docs.select(
        F.col(id_col).cast("string").alias("doc_key"), F.col(text_col).alias("text")
    )
    nxt = corpus.join(matches, "doc_key").select(
        "pattern_id",
        F.regexp_extract(
            F.expr("substring(text, CAST(pos + pattern_len AS INT))"),
            "^ *([^ ]*)",
            1,
        ).alias("next_token"),
    )
    return (
        nxt.groupBy("pattern_id", "next_token")
        .agg(F.count("*").cast("long").alias("n_continuations"))
        .join(F.broadcast(pats), "pattern_id")
        .select("pattern_id", "pattern", "next_token", "n_continuations")
    )


def infinigram_backoff(
    docs: DataFrame,
    query_text: str,
    min_context: int = 1,
    max_context: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The ∞-gram INFERENCE step (infini-gram, Liu et al. 2024 §3): find
    the LONGEST suffix of ``query_text`` that occurs anywhere in the
    corpus and return that context's next-character distribution with
    backoff-free probabilities — (context_len, context, next_char,
    n_continuations, p), p = round(n / Σn, 6). Empty result iff no query
    suffix of length >= ``min_context`` occurs at all.

    One pass: every candidate suffix (lengths ``min_context`` ..
    ``max_context``) rides the SAME rank levels as a pattern pseudo-doc —
    total pattern chars are O(L²) in the query length, which for prompts
    is trivia next to the corpus — then the longest context with any
    occurrence is selected with a 1-row cross join (no driver round
    trip), and its distribution normalizes via a window-free groupBy
    join."""
    L = len(query_text)
    hi = min(max_context if max_context is not None else L, L)
    if min_context < 1 or min_context > hi:
        raise ValueError("need 1 <= min_context <= max_context <= len(query_text)")
    spark = docs.sparkSession
    pats = spark.createDataFrame(
        [(n, query_text[L - n :]) for n in range(min_context, hi + 1)],
        "pattern_id long, pattern string",
    )
    # materialize once: the aggregated distribution is tiny (≤ query_len ×
    # alphabet rows) but its subtree — the whole matcher — is referenced
    # three times below (argmax, totals, final select); relying on
    # exchange reuse would make single evaluation optimizer-dependent
    cont = pattern_continuations(docs, pats, id_col, text_col).localCheckpoint(
        eager=True
    )
    best = cont.agg(F.max("pattern_id").alias("__best"))
    chosen = cont.crossJoin(F.broadcast(best)).filter(
        F.col("pattern_id") == F.col("__best")
    )
    totals = chosen.groupBy("pattern_id").agg(
        F.sum("n_continuations").alias("__total")
    )
    return (
        chosen.join(F.broadcast(totals), "pattern_id")
        .select(
            F.col("pattern_id").alias("context_len"),
            F.col("pattern").alias("context"),
            "next_char",
            "n_continuations",
            F.round(F.col("n_continuations") / F.col("__total"), 6).alias("p"),
        )
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
