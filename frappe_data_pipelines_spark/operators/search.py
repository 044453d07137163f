"""Search operators: dense KNN, filtered search, item-to-item similarity,
BM25, Reciprocal Rank Fusion, and a deterministic reranker.

Maps the reference's query surface (SURVEY §2 search API table):
  * ``knn_topk``            — C6/F1: brute-force cosine top-k (the correct
    baseline; LSH/IVF variants live in operators/ann.py for scale)
  * ``filtered_knn``        — B6: conjunctive equality filters pushed into the
    parquet scan before any scoring work
  * ``find_similar``        — C5: item-to-item self-search with self/same-doc
    exclusion (reference: services/search_service.py:162-236)
  * ``bm25_scores``         — the capability the reference *declares* but never
    implements (docstring-only "BM25 sparse vectors",
    services/search_service.py:1-6): proper Okapi BM25 from tokenize +
    doc-frequency aggregates
  * ``rrf_fuse``            — the declared-but-missing Reciprocal Rank Fusion:
    score = Σ 1/(k + rank) over the dense and sparse rankings
  * ``lexical_rerank``      — deterministic stand-in for the Cohere reranker
    (J4, services/search_service.py:239-316): token-overlap scoring with the
    same overfetch×5-then-cut shape.

Scale notes: top-k goes through ``ORDER BY … LIMIT k`` which Spark executes as
TakeOrderedAndProject (per-partition heap + driver merge — no global sort).
Scoring is a narrow map over the vectors table; the only broadcast is the
1-row query vector. Equality filters are applied BEFORE scoring so Catalyst
pushes them into the scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.functions.vectors import cosine_similarity

RRF_K = 60
BM25_K1 = 1.2
BM25_B = 0.75


def _score(vectors: DataFrame, query_vec: list[float], vec_col: str) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec]).cast("array<double>")
    return vectors.withColumn("score", F.round(cosine_similarity(F.col(vec_col), q), 6))


def knn_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k; deterministic tie-break (score DESC, id ASC)."""
    return (
        _score(vectors, query_vec, vec_col)
        .orderBy(F.desc("score"), F.col(id_col).asc())
        .limit(k)
    )


def equality_filter(df: DataFrame, filters: dict) -> DataFrame:
    """B6: AND-of-equality payload filter (the only filter shape the
    reference supports, services/qdrant_service.py:131-137)."""
    if not filters:
        return df
    cond = reduce(lambda a, b: a & b, [F.col(k) == F.lit(v) for k, v in filters.items()])
    return df.filter(cond)


def filtered_knn(
    vectors: DataFrame,
    query_vec: list[float],
    filters: dict,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Filter-then-score: the filter prunes the scan (partition/predicate
    pushdown) before any vector math runs."""
    return knn_topk(equality_filter(vectors, filters), query_vec, k, vec_col, id_col)


def find_similar(
    vectors: DataFrame,
    target_id,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_cols_equal: dict | None = None,
) -> DataFrame:
    """C5 item-to-item: look up the stored vector for ``target_id`` (1-row
    broadcast), score everything else, drop self, top-k."""
    target = vectors.filter(F.col(id_col) == F.lit(target_id)).select(
        F.col(vec_col).cast("array<double>").alias("__q")
    )
    scored = (
        vectors.crossJoin(F.broadcast(target))
        .withColumn("score", F.round(cosine_similarity(F.col(vec_col), F.col("__q")), 6))
        .drop("__q")
        .filter(F.col(id_col) != F.lit(target_id))
    )
    if exclude_cols_equal:
        for c, v in exclude_cols_equal.items():
            scored = scored.filter(F.col(c) != F.lit(v))
    return scored.orderBy(F.desc("score"), F.col(id_col).asc()).limit(k)


# ---------------------------------------------------------------------------
# BM25 + RRF (the declared-but-unimplemented hybrid search, done properly)
# ---------------------------------------------------------------------------

def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Okapi BM25 over a corpus, fully relational (SQL-oracle-able).

    Pipeline: tokenize → per-doc length via size() riding THROUGH the
    match-explode as a group key (NO doclen join — ``dl`` is functionally
    dependent on ``doc_id``, so adding it to the tf groupBy keys changes
    nothing) → per-(doc,dl,term) tf → per-term df → idf = ln((N - df +
    0.5)/(df + 0.5) + 1) → score sum per doc. Two shuffles total (tf
    groupBy, doc-level sum); the per-term df table is tiny
    (|query_terms| rows) and broadcast into the join. The naive
    explode-then-count doclen form shuffles the ENTIRE exploded token set
    (every token of every doc) just to count per-doc rows; at 100 TB that
    shuffle is bigger than the corpus. Filtering the array BEFORE explode
    likewise bounds the exploded rows by |matches|, not corpus token
    count.

    Measured and rejected (r12 interleaved A/B, sf0.1 best/median):
    ``.cache()`` on the tf relation 3.32/3.43 s and a pre-tokenize
    ``spread_scan`` 1.64/2.46 s vs 0.75/0.97 s for this shape — the
    InMemoryRelation materialization barrier and the raw-text exchange
    each cost more than the tokenize passes they deduplicate on a
    sub-MB corpus scan, and at 100 TB ``spread_scan`` is a no-op by
    construction anyway (the scan arrives partitioned).
    """
    terms = [t.lower() for t in query_terms]
    toks_arr = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != "")
    base = docs.select(
        F.col(id_col).alias("doc_id"), toks_arr.alias("toks")
    )
    stats = base.agg(
        F.count("*").alias("n_docs"), F.avg(F.size("toks")).alias("avgdl")
    )
    qtoks = base.select(
        "doc_id",
        F.size("toks").alias("dl"),
        F.explode(F.filter(F.col("toks"), lambda t: t.isin(terms))).alias("term"),
    )
    tf = qtoks.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf", F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 6).alias("bm25"))
    )
    return scored


def rrf_fuse(
    ranking_a: DataFrame,
    ranking_b: DataFrame,
    id_col: str = "doc_id",
    score_a: str = "score",
    score_b: str = "bm25",
    k: int = RRF_K,
    top_k: int = 10,
    overfetch: int | None = 5,
) -> DataFrame:
    """Reciprocal Rank Fusion: rrf = Σ_r 1/(k + rank_r). Full outer join so a
    doc ranked by only one side still scores.

    APPROXIMATION (default): each ranking is truncated to a
    ``top_k × overfetch`` candidate pool before fusion, so a doc ranked
    just outside one side's pool (e.g. #51 of a 50-pool) loses that
    side's 1/(k+rank) contribution entirely rather than receiving its
    true rank — results near the top_k boundary can differ from
    full-corpus RRF. Pass ``overfetch=None`` to recover EXACT fusion:
    every scored doc on each side gets its true global rank. Exact mode
    ranks each full side through one window partition — correct and fine
    for small/driver-side corpora, a single-task serialization at 100 TB,
    which is why bounded pools are the default (and the standard
    hybrid-search shape; the reference overfetches ×5 the same way,
    search_service.py:83).

    Scale shape: each side is first cut to a bounded candidate pool of
    ``top_k × overfetch`` via orderBy().limit() — Spark compiles that to
    TakeOrderedAndProject (a distributed per-partition heap + driver merge,
    never a global sort), and only the ≤N survivors pay the unpartitioned
    row_number() window. Ranking the full scored corpus through one
    window task was the old shape — correct at sf0.1, single-partition
    serialization at 100×. The ×5 overfetch mirrors the reference's own
    candidate pool (search_service.py:83); ranks inside the pool equal
    the global ranks (a top-N prefix preserves order), so fusion over the
    pools is the standard bounded-candidate RRF every hybrid-search
    system runs."""
    from frappe_data_pipelines_spark.operators.guards import bounded_window_key

    # the windows key on a constant partition: their input is the ≤n_cand
    # survivors of the TakeOrderedAndProject above, so the single partition
    # is bounded by construction — bounded_window_key states that in the
    # physical plan (no WindowExec warning, and the planlint global-window
    # rule stays strict). overfetch=None (exact mode) skips the cut: the
    # caller accepted the single-partition rank for a small corpus.
    def _ranked(side: DataFrame, score: str, out: str) -> DataFrame:
        pool = side.orderBy(F.desc(score), F.col(id_col).asc())
        if overfetch is not None:
            pool = pool.limit(top_k * overfetch)
        return pool.select(
            F.col(id_col).alias("doc_id"),
            F.row_number()
            .over(
                Window.partitionBy(bounded_window_key(id_col)).orderBy(
                    F.desc(score), F.col(id_col).asc()
                )
            )
            .alias(out),
        )

    ra = _ranked(ranking_a, score_a, "rank_a")
    rb = _ranked(ranking_b, score_b, "rank_b")
    fused = (
        ra.join(rb, "doc_id", "full_outer")
        .withColumn(
            "rrf",
            F.round(
                F.coalesce(1.0 / (F.lit(k) + F.col("rank_a")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(k) + F.col("rank_b")), F.lit(0.0)),
                6,
            ),
        )
        .orderBy(F.desc("rrf"), F.col("doc_id").asc())
        .limit(top_k)
        .select("doc_id", "rrf")
    )
    return fused


def lexical_rerank(
    candidates: DataFrame,
    query_terms: list[str],
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic reranker: relevance = |query ∩ doc tokens| / |query|.

    Same shape as the reference's Cohere stage (overfetch upstream, re-score,
    cut to top_k, vector score replaced by relevance)."""
    terms = F.array(*[F.lit(t.lower()) for t in query_terms])
    toks = F.array_distinct(F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""))
    rel = F.size(F.array_intersect(toks, terms)).cast("double") / F.size(terms)
    return (
        candidates.withColumn("relevance", F.round(rel, 6))
        .orderBy(F.desc("relevance"), F.col(id_col).asc())
        .limit(top_k)
    )


def rerank_with_provider(
    candidates: DataFrame,
    query_text: str,
    provider=None,
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "score",
) -> DataFrame:
    """J4 pluggable reranker with the reference's failure contract
    (search_service.py:239-316): call ``provider.rerank(query, texts) ->
    scores``; on ANY provider failure fall back to the incoming vector-score
    order cut to top_k — reranking is an enhancement, never a point of
    failure.

    The candidate set is an overfetched top-k (small — reference top_k×5),
    so the provider call happens driver-side on collected rows, exactly like
    the reference's HTTP rerank; the result is returned as a DataFrame for
    further composition."""
    from .guards import MAX_RERANK_CANDIDATES, collect_bounded

    rows = collect_bounded(
        candidates.orderBy(F.desc(score_col), F.col(id_col).asc()),
        MAX_RERANK_CANDIDATES,
        "rerank candidates",
    )
    sess = candidates.sparkSession
    try:
        scores = provider.rerank(query_text, [r[text_col] for r in rows])
        if len(scores) != len(rows):
            raise ValueError("provider returned wrong score count")
        ranked = sorted(
            zip(rows, scores), key=lambda t: (-float(t[1]), t[0][id_col])
        )[:top_k]
        out = [
            {**r.asDict(), "relevance": round(float(s), 6)} for r, s in ranked
        ]
    except Exception:  # noqa: BLE001 — graceful fallback (reference :305-316)
        out = [{**r.asDict(), "relevance": None} for r in rows[:top_k]]
    schema = candidates.schema.add("relevance", "double")
    return sess.createDataFrame(out, schema)
