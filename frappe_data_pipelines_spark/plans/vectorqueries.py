"""Vector-search queries (SURVEY §2 C5/C6/B6/F1 + ANN extensions) over the
``embeddings`` table. Oracles use DuckDB ``list_cosine_similarity`` on
DOUBLE[] — same sequential-fold double math as our ``cosine_similarity``
expression, so scores match bit-for-bit before the round(…, 6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.functions.vectors import dot_product
from frappe_data_pipelines_spark.operators import ann
from frappe_data_pipelines_spark.operators.dedup import embedding_neardup_pairs
from frappe_data_pipelines_spark.operators.search import filtered_knn, find_similar, knn_topk
from frappe_data_pipelines_spark.plans.catalog import register
from frappe_data_pipelines_spark.sources.tables import load_table

QUERY_VEC_ID = 0
SIMILAR_TARGET_ID = 42


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    emb = load_table(spark, sf_dir, "embeddings")
    return list(emb.filter(F.col("vec_id") == QUERY_VEC_ID).first()["embedding"])


@register(
    "c6_knn_topk",
    oracle=f"""
    SELECT e.vec_id, e.label,
           round(list_cosine_similarity(e.embedding::DOUBLE[],
                 (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = {QUERY_VEC_ID})), 6) AS score
    FROM embeddings e
    ORDER BY score DESC, e.vec_id ASC
    LIMIT 10
    """,
    tags=("C6", "F1", "headline"),
)
def c6_knn_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 KNN theta-join: brute-force cosine top-10 (reference:
    services/qdrant_service.py:139-145). TakeOrderedAndProject physical plan;
    only (vec_id, label, score) survive the projection."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_topk(emb, _query_vec(spark, sf_dir), k=10).select("vec_id", "label", "score")


@register(
    "b6_filtered_knn",
    oracle=f"""
    SELECT e.vec_id, e.label,
           round(list_cosine_similarity(e.embedding::DOUBLE[],
                 (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = {QUERY_VEC_ID})), 6) AS score
    FROM embeddings e
    WHERE e.label = 3
    ORDER BY score DESC, e.vec_id ASC
    LIMIT 10
    """,
    tags=("B6", "C6"),
)
def b6_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6+C6 filter-then-score: the equality filter prunes the scan BEFORE
    any vector math (reference: search_service.py:92-108). .explain shows the
    label predicate in PushedFilters."""
    emb = load_table(spark, sf_dir, "embeddings")
    return filtered_knn(emb, _query_vec(spark, sf_dir), {"label": 3}, k=10).select(
        "vec_id", "label", "score"
    )


@register(
    "c5_find_similar",
    oracle=f"""
    SELECT e.vec_id, e.label,
           round(list_cosine_similarity(e.embedding::DOUBLE[],
                 (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = {SIMILAR_TARGET_ID})), 6) AS score
    FROM embeddings e
    WHERE e.vec_id <> {SIMILAR_TARGET_ID}
    ORDER BY score DESC, e.vec_id ASC
    LIMIT 5
    """,
    tags=("C5", "B7"),
)
def c5_find_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 item-to-item similarity with B7 self-exclusion (reference:
    search_service.py:162-236): look up stored vector by id (1-row
    broadcast), score the collection, drop self, top-5."""
    emb = load_table(spark, sf_dir, "embeddings")
    return find_similar(emb, SIMILAR_TARGET_ID, k=5).select("vec_id", "label", "score")


@register(
    "embedding_neardup_pairs",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4
    """,
    tags=("dedup", "extension"),
)
def q_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.4 — the testdata's
    vectors are near-orthogonal, max pairwise cos ≈ 0.51). Brute-force
    candidates here; the LSH-bucketed scale path is ``ann_lsh_pairs``."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.4)


@register(
    "vector_norms",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS norm
    FROM embeddings
    """,
    tags=("H", "vectors"),
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms via higher-order functions — validates the write-time
    normalization invariant (SURVEY §1.3)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.round(F.sqrt(dot_product(F.col("embedding"), F.col("embedding"))), 6).alias("norm"),
    )


_IVF_SQL = """
    WITH init AS (
      SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid,
             embedding::DOUBLE[] AS c
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8)
    ), a1 AS (
      SELECT e.vec_id, e.embedding,
             (SELECT i.cid FROM init i
              ORDER BY list_distance(e.embedding::DOUBLE[], i.c), i.cid LIMIT 1) AS cluster
      FROM embeddings e
    ), c1m AS (
      SELECT cluster AS cid, pos.i AS i, avg(embedding[pos.i]) AS m
      FROM a1, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) pos
      GROUP BY 1, 2
    ), c1 AS (
      SELECT cid, list(m ORDER BY i)::DOUBLE[] AS c FROM c1m GROUP BY cid
      UNION ALL
      SELECT i.cid, i.c FROM init i WHERE i.cid NOT IN (SELECT cid FROM c1m)
    ), a2 AS (
      SELECT e.vec_id, e.embedding,
             (SELECT x.cid FROM c1 x
              ORDER BY list_distance(e.embedding::DOUBLE[], x.c), x.cid LIMIT 1) AS cluster
      FROM embeddings e
    ), c2m AS (
      SELECT cluster AS cid, pos.i AS i, avg(embedding[pos.i]) AS m
      FROM a2, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) pos
      GROUP BY 1, 2
    ), c2 AS (
      SELECT cid, list(m ORDER BY i)::DOUBLE[] AS c FROM c2m GROUP BY cid
      UNION ALL
      SELECT x.cid, x.c FROM c1 x WHERE x.cid NOT IN (SELECT cid FROM c2m)
    ), afinal AS (
      SELECT e.vec_id, e.label, e.embedding,
             (SELECT x.cid FROM c2 x
              ORDER BY list_distance(e.embedding::DOUBLE[], x.c), x.cid LIMIT 1) AS cluster
      FROM embeddings e
    ), q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0
    ), probe AS (
      SELECT x.cid FROM c2 x, q ORDER BY list_distance(q.qv, x.c), x.cid LIMIT 4
    )
    SELECT a.vec_id, a.label,
           round(list_cosine_similarity(a.embedding::DOUBLE[], q.qv), 6) AS score
    FROM afinal a, q
    WHERE a.cluster IN (SELECT cid FROM probe)
    ORDER BY score DESC, a.vec_id ASC
    LIMIT 10
"""


@register("ann_ivf_search", oracle=_IVF_SQL, tags=("O10", "extension"))
def ann_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: k-means-lite clustering + n_probe cluster pruning
    (SURVEY §4 O10c). Fully oracle-checked: the deterministic Lloyd
    iterations (hash-ordered init, tie-broken assignment, empty-cluster
    fallback) unroll into a DuckDB CTE chain that reproduces the Spark
    result bit-for-bit; recall vs brute force in tests/test_ann.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ann.ivf_build(emb, n_clusters=8, n_iter=2)
    return ann.ivf_search(assigned, centroids, _query_vec(spark, sf_dir), k=10, n_probe=4).select(
        "vec_id", "label", "score"
    )


def _lsh_oracle_sql() -> str:
    """DuckDB twin of ann.lsh_similarity_join(n_planes=6, threshold=0.3):
    the seeded hyperplanes are embedded as literal constants (same doubles
    the Spark expression uses — repr() round-trips exactly), so bucket
    assignment and the cosine cut reproduce bit-for-bit."""
    from frappe_data_pipelines_spark.operators.ann import _seeded_planes

    planes = _seeded_planes(64, 6, 42)
    plane_lists = ",\n        ".join(
        "[" + ", ".join(repr(float(x)) for x in p) + "]" for p in planes
    )
    bit_terms = " + ".join(
        f"(CASE WHEN list_inner_product(embedding::DOUBLE[], p{i}.p) >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(6)
    )
    joins = "\n      ".join(
        f"CROSS JOIN (SELECT planes[{i + 1}] AS p FROM planes_t) p{i}" for i in range(6)
    )
    return f"""
    WITH planes_t AS (
      SELECT [
        {plane_lists}
      ]::DOUBLE[][] AS planes
    ), bucketed AS (
      SELECT vec_id, embedding,
             {bit_terms} AS bucket
      FROM embeddings
      {joins}
    )
    SELECT x.vec_id AS id_a, y.vec_id AS id_b,
           round(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 6) AS cos
    FROM bucketed x JOIN bucketed y ON x.bucket = y.bucket
    WHERE x.vec_id < y.vec_id
      AND round(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]), 6) >= 0.3
    """


@register("ann_lsh_pairs", oracle=_lsh_oracle_sql(), tags=("O10", "extension"))
def ann_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH similarity join (SURVEY §4 O10b): bucket join
    instead of crossJoin — the 100 TB all-pairs path. Fully oracle-checked:
    the seeded planes are embedded as SQL literals (_lsh_oracle_sql);
    recall vs brute force additionally checked in tests/test_ann.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann.lsh_similarity_join(emb, n_planes=6, threshold=0.3)


@register("ann_pq_search", tags=("O10", "extension", "rows-only"))
def ann_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (O10 ladder rung 4): train codebooks on a
    deterministic sample, encode 64 float dims into 16 small ints, search by
    asymmetric distance (per-query lookup table, no per-candidate float
    math). Rows-only (k-means training is iterative); recall vs brute force
    asserted in tests/test_ann.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = ann.pq_train(emb, m_subvectors=16, k_centroids=64)
    codes = ann.pq_encode(emb, books)
    return ann.pq_search(codes, books, _query_vec(spark, sf_dir), k=10)


@register("ann_opq_search", tags=("O10", "extension", "rows-only"))
def ann_opq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimized PQ (O10 ladder rung 5): a learned orthonormal rotation
    (Procrustes alternation, Ge et al. CVPR'13) redistributes variance
    across subspaces before quantizing — higher recall at identical code
    bytes when embedding dims are correlated. Same ADC search with the
    query rotated once driver-side. Rows-only (iterative training);
    distortion/recall dominance over plain PQ asserted in
    tests/test_ann.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    R, books = ann.opq_train(emb, m_subvectors=16, k_centroids=64, opq_iters=4)
    codes = ann.pq_encode(emb, books, rotation=R)
    return ann.pq_search(codes, books, _query_vec(spark, sf_dir), k=10, rotation=R)


@register(
    "ann_filtered_adaptive",
    oracle="""
    SELECT e.vec_id,
           round(list_cosine_similarity(e.embedding::DOUBLE[],
                 (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS score,
           'pre-filter' AS strategy
    FROM embeddings e
    WHERE e.label = 3 AND e.vec_id % 7 = 0
    ORDER BY score DESC, e.vec_id ASC
    LIMIT 5
    """,
    tags=("B6", "O10", "extension"),
)
def ann_filtered_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search with the pre-/post-filter strategy switch
    (Qdrant's filtered-HNSW planner decision, SURVEY §2.B B6). The very
    selective predicate here routes to the exact pre-filter branch — fully
    SQL-oracled; the post-filter (HNSW overfetch) branch is recall-tested
    in tests/test_ann.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    pred = (F.col("label") == 3) & (F.col("vec_id") % 7 == 0)
    return ann.filtered_ann_search(emb, _query_vec(spark, sf_dir), pred, k=5)


@register("ann_hnsw_search", tags=("O10", "extension", "rows-only"))
def ann_hnsw_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded HNSW ANN (O10 ladder rung 6): per-partition small-world
    graphs built inside mapInPandas, broadcast query batch answered locally
    (~ef*log n distance evals per partition instead of a full scan), global
    top-k via window merge. The Qdrant-HNSW analogue from SURVEY §4 O10.
    Rows-only (graph build is iterative); recall vs brute force asserted in
    tests/test_ann.py."""
    emb = load_table(spark, sf_dir, "embeddings").repartition(4)
    qdf = emb.filter(F.col("vec_id").isin([0, 42])).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ann.hnsw_partition_search(emb, qdf, k=10, ef_search=64)


BATCH_QUERY_IDS = (0, 42, 77, 123)


@register(
    "knn_batch_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id IN {BATCH_QUERY_IDS}
    ), scored AS (
      SELECT q.query_id, e.vec_id,
             round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
      FROM embeddings e, q
    ), ranked AS (
      SELECT query_id, vec_id, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vec_id ASC) AS rn
      FROM scored
    )
    SELECT query_id, vec_id, score FROM ranked WHERE rn <= 10
    """,
    tags=("C6", "F1", "extension", "headline"),
)
def knn_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query KNN (operators/ann.py:knn_batch): the serving
    shape at 100 TB — one collection scan amortized over the whole query
    set (broadcast), per-query top-k via ranked window. Extends C6 beyond
    the reference's one-query-per-call API (search_service.py:63-137)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*BATCH_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ann.knn_batch(emb, queries, k=10)


_SEMDEDUP_SQL = """
    WITH init AS (
      SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid,
             embedding::DOUBLE[] AS c
      FROM (SELECT vec_id, embedding FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 8)
    ), a1 AS (
      SELECT e.vec_id, e.embedding,
             (SELECT i.cid FROM init i
              ORDER BY list_distance(e.embedding::DOUBLE[], i.c), i.cid LIMIT 1) AS cluster
      FROM embeddings e
    ), c1m AS (
      SELECT cluster AS cid, pos.i AS i, avg(embedding[pos.i]) AS m
      FROM a1, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) pos
      GROUP BY 1, 2
    ), c1 AS (
      SELECT cid, list(m ORDER BY i)::DOUBLE[] AS c FROM c1m GROUP BY cid
      UNION ALL
      SELECT i.cid, i.c FROM init i WHERE i.cid NOT IN (SELECT cid FROM c1m)
    ), a2 AS (
      SELECT e.vec_id, e.embedding,
             (SELECT x.cid FROM c1 x
              ORDER BY list_distance(e.embedding::DOUBLE[], x.c), x.cid LIMIT 1) AS cluster
      FROM embeddings e
    ), c2m AS (
      SELECT cluster AS cid, pos.i AS i, avg(embedding[pos.i]) AS m
      FROM a2, LATERAL (SELECT unnest(generate_series(1, 64)) AS i) pos
      GROUP BY 1, 2
    ), c2 AS (
      SELECT cid, list(m ORDER BY i)::DOUBLE[] AS c FROM c2m GROUP BY cid
      UNION ALL
      SELECT x.cid, x.c FROM c1 x WHERE x.cid NOT IN (SELECT cid FROM c2m)
    ), afinal AS (
      SELECT e.vec_id, e.embedding,
             (SELECT x.cid FROM c2 x
              ORDER BY list_distance(e.embedding::DOUBLE[], x.c), x.cid LIMIT 1) AS cluster
      FROM embeddings e
    )
    SELECT a.vec_id, a.cluster::BIGINT AS cluster,
           EXISTS (
             SELECT 1 FROM afinal b
             WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
               AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 6) >= 0.40
           ) AS is_dup
    FROM afinal a
"""


@register("semdedup_clusters", oracle=_SEMDEDUP_SQL, tags=("dedup", "O10", "extension"))
def semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) semantic near-dup pruning: k-means
    cluster the embedding space (same deterministic Lloyd unroll the IVF
    oracle pins), compare pairs only WITHIN clusters (Σ|c|² work, not n²),
    mark any vector with a lower-id clustermate above cosine 0.40. The
    DuckDB oracle replays the two Lloyd rounds as CTEs and the dup rule as
    a correlated EXISTS — bit-for-bit cluster assignments and flags."""
    from frappe_data_pipelines_spark.operators.dedup import semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup(emb, n_clusters=8, n_iter=2, threshold=0.40)


def _pq_exact_oracle_sql(
    m_sub: int = 16, dim: int = 64, k: int = 16, n_iter: int = 2,
    sample_rows: int = 256, topk: int = 10,
) -> str:
    """DuckDB twin of ann.pq_exact_search: the Lloyd training, encode and
    ADC scoring replay as a CTE chain over the dims-as-rows relation. All
    sums are per-term round(·,9) DECIMAL(20,9) — associative, so Spark's
    partitioned aggregation and DuckDB's single-threaded one reach the
    SAME decimals; assignment ties break on smaller centroid id in both."""
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m={m_sub}")
    dsub = dim // m_sub
    iters = []
    prev = "cent0"
    for t in range(1, n_iter + 1):
        iters.append(f"""
    dist{t} AS (
      SELECT s.vec_id, s.m, c.cid,
             sum(CAST(round((s.x - c.cx)*(s.x - c.cx), 9) AS DECIMAL(20,9))) AS d2
      FROM sampdims s JOIN {prev} c ON c.m = s.m AND c.j = s.j
      GROUP BY 1, 2, 3
    ), asg{t} AS (
      SELECT vec_id, m, cid FROM (
        SELECT vec_id, m, cid,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
        FROM dist{t}) t WHERE rn = 1
    ), centsum{t} AS (
      SELECT a.m, a.cid, s.j,
             CAST(sum(CAST(s.x AS DECIMAL(20,9))) AS DOUBLE) / count(*) AS cx
      FROM asg{t} a JOIN sampdims s ON s.vec_id = a.vec_id AND s.m = a.m
      GROUP BY 1, 2, 3
    ), cent{t} AS (
      SELECT m, cid, j, cx FROM centsum{t}
      UNION ALL
      SELECT c.m, c.cid, c.j, c.cx FROM {prev} c
      WHERE NOT EXISTS (SELECT 1 FROM centsum{t} x
                        WHERE x.m = c.m AND x.cid = c.cid)
    )""")
        prev = f"cent{t}"
    return f"""
    WITH n AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
               x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y)))) AS v
      FROM embeddings
    ), dims AS (
      SELECT vec_id,
             CAST((i.i - 1) // {dsub} AS INT) AS m,
             CAST((i.i - 1) % {dsub} AS INT) AS j,
             round(v[CAST(i.i AS INT)], 9) AS x
      FROM n, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) i
    ), samp AS (
      SELECT vec_id FROM embeddings
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {sample_rows}
    ), sampdims AS (
      SELECT d.* FROM dims d JOIN samp USING (vec_id)
    ), initids AS (
      SELECT vec_id,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
      FROM (SELECT vec_id FROM embeddings
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})
    ), cent0 AS (
      SELECT s.m, i.cid, s.j, s.x AS cx FROM initids i JOIN sampdims s USING (vec_id)
    ),{",".join(iters)},
    edist AS (
      SELECT d.vec_id, d.m, c.cid,
             sum(CAST(round((d.x - c.cx)*(d.x - c.cx), 9) AS DECIMAL(20,9))) AS d2
      FROM dims d JOIN {prev} c ON c.m = d.m AND c.j = d.j
      GROUP BY 1, 2, 3
    ), codes AS (
      SELECT vec_id, m, cid FROM (
        SELECT vec_id, m, cid,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY d2, cid) AS rn
        FROM edist) t WHERE rn = 1
    ), qdims AS (
      SELECT m, j, x AS qx FROM dims WHERE vec_id = {{qid}}
    ), lut AS (
      SELECT c.m, c.cid,
             sum(CAST(round(c.cx * q.qx, 9) AS DECIMAL(20,9))) AS ip
      FROM {prev} c JOIN qdims q ON q.m = c.m AND q.j = c.j
      GROUP BY 1, 2
    ), scored AS (
      SELECT k.vec_id, sum(l.ip) AS s
      FROM codes k JOIN lut l ON l.m = k.m AND l.cid = k.cid
      GROUP BY 1
    )
    SELECT vec_id AS id, round(CAST(s AS DOUBLE), 6) AS score
    FROM scored ORDER BY s DESC, vec_id ASC LIMIT {topk}
    """.replace("{qid}", str(QUERY_VEC_ID))


@register(
    "ann_pq_exact_search",
    oracle=_pq_exact_oracle_sql(),
    tags=("O10", "extension", "scale-path"),
)
def ann_pq_exact_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization, EXACT tier (O10): trained codebooks under the
    hash gate — the third oracled quantizer after BQ and SQ8, and the first
    whose TRAINING (hash-sampled init + 2 Lloyd rounds) is itself replayed
    by the DuckDB oracle rather than pinned as literals. All arithmetic is
    per-term round(·,9) DECIMAL sums over a dims-as-rows relation
    (ann.pq_exact_dims), so the result is bit-stable under any
    partitioning. The numpy ``pq_train``/``pq_search`` pair stays the
    production throughput path (ann_pq_search, rows-only); this tier
    anchors the trained-codebook math end-to-end."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann.pq_exact_search(emb, query_id=QUERY_VEC_ID)


_SQ_SQL = f"""
    WITH n AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
               x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y)))) AS v
      FROM embeddings
    ), dims AS (
      SELECT vec_id, CAST(i.i AS INT) AS d, v[CAST(i.i AS INT)] AS x
      FROM n, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) i
    ), grid AS (
      SELECT d, min(x) AS lo, max(x) AS hi FROM dims GROUP BY d
    ), g2 AS (
      SELECT d, lo, CASE WHEN hi - lo > 0 THEN hi - lo ELSE 1.0 END AS span
      FROM grid
    ), qd AS (
      SELECT CAST(i.i AS INT) AS d, q.v[CAST(i.i AS INT)] AS qx
      FROM (SELECT v FROM n WHERE vec_id = {QUERY_VEC_ID}) q,
           LATERAL (SELECT unnest(generate_series(1, len(q.v))) AS i) i
    ), codes AS (
      SELECT dm.vec_id, dm.d,
             least(255, greatest(0,
               CAST(round((dm.x - g.lo) / g.span * 255) AS INT))) AS c
      FROM dims dm JOIN g2 g USING (d)
    ), scored AS (
      SELECT c.vec_id AS id,
             round(CAST(sum(CAST(round((g.lo + c.c / 255.0 * g.span) * q.qx, 9)
                                 AS DECIMAL(20,9))) AS DOUBLE), 6) AS score
      FROM codes c JOIN g2 g USING (d) JOIN qd q USING (d)
      GROUP BY c.vec_id
    )
    SELECT id, score FROM scored ORDER BY score DESC, id ASC LIMIT 10
    """


@register("ann_sq_search", oracle=_SQ_SQL, tags=("O10", "extension", "scale-path"))
def ann_sq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar quantization SQ8 (O10 ladder rung between brute force and
    PQ): per-dimension uniform 8-bit grids — 4x smaller vectors with no
    codebook training and far lower distortion than PQ.

    Fully DuckDB-oracled (the second quantizer after BQ to move off
    rows-only): the grid comes from ``sq_grid`` — per-dim min/max of the
    sequential-fold-normalized vectors, every double bit-reproducible in
    SQL — the encode is pure Column expressions (map-only), and the
    asymmetric search uses the ``exact`` Column kernel whose per-dim
    contributions are round(·,9) DECIMALs, so the dot product is
    associative and hash-stable under any partitioning. The numpy batch
    kernels (``sq_train``/default ``sq_search``) remain the production
    throughput path; recall vs brute force is asserted in
    tests/test_ann.py."""
    import numpy as np

    from frappe_data_pipelines_spark.operators.guards import collect_bounded

    emb = load_table(spark, sf_dir, "embeddings")
    grid = collect_bounded(ann.sq_grid(emb).orderBy("d"), 4096, "SQ8 grid")
    lo = np.array([r["lo"] for r in grid])
    hi = np.array([r["hi"] for r in grid])
    codes = ann.sq_encode(emb, lo, hi)
    return ann.sq_search(codes, lo, hi, _query_vec(spark, sf_dir), k=10, exact=True)


def _sq_index_cache_dir(sf_dir: str) -> str:
    """Cache location for the persisted SQ8 index — keyed per sf_dir AND
    the source table's size+mtime (VERDICT r12 item 8) so correctness and
    bench runs never share an index and replaced testdata forces a
    rebuild (same convention as the suffix-index caches)."""
    import hashlib
    import os
    import tempfile

    from frappe_data_pipelines_spark.sources.tables import source_stat_key

    key = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}|sq8|v1"
        f"|{source_stat_key(sf_dir, 'embeddings')}".encode()
    ).hexdigest()[:16]
    return os.path.join(tempfile.gettempdir(), f"fdp_sq_index_{key}")


_SQ_GRID_SQL = """
    WITH n AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
               x -> x / sqrt(list_sum(list_transform(embedding::DOUBLE[], y -> y*y)))) AS v
      FROM embeddings
    ), dims AS (
      SELECT vec_id, CAST(i.i AS INT) AS d, v[CAST(i.i AS INT)] AS x
      FROM n, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) i
    )
    SELECT CAST(d AS BIGINT) AS d, min(x) AS lo, max(x) AS hi
    FROM dims GROUP BY d
    """


@register("sq_index_build", oracle=_SQ_GRID_SQL,
          tags=("O10", "extension", "scale-path"))
def sq_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUILD half of the SQ8 build/serve split (operators/ann.py:
    sq_write): compute the per-dim grid, encode the corpus to int8 codes,
    persist both. Always rebuilds (the cost being measured — bench's
    BUILD_TIER row). Returns the grid read back FROM THE SIDECAR, which
    the oracle re-derives from raw vectors — so what's on disk is
    value-checked bit-for-bit (sq_grid's sequential-fold normalization
    is DuckDB-reproducible and JSON float round-tripping is exact)."""
    import json
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    path = _sq_index_cache_dir(sf_dir)
    ann.sq_write(emb, path)
    with open(os.path.join(path, "_sq_meta.json")) as f:
        meta = json.load(f)
    return spark.createDataFrame(
        [(i + 1, lo, hi)
         for i, (lo, hi) in enumerate(zip(meta["lo"], meta["hi"]))],
        "d long, lo double, hi double",
    )


@register("ann_sq_search_cached", oracle=_SQ_SQL,
          tags=("O10", "extension", "scale-path"))
def ann_sq_search_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY half of the SQ8 split (operators/ann.py:sq_read_search):
    serve from the persisted codes + sidecar grid — no grid
    recomputation, no re-encode, ONE map-only scan of int8 codes. SAME
    oracle as ``ann_sq_search``, so the gate proves persisted ==
    from-scratch on the full scored top-k (the suffix-index family's
    cached==uncached pattern). Builds on a cold cache (first call after
    ``sq_index_build`` is always warm)."""
    import os

    path = _sq_index_cache_dir(sf_dir)
    if not os.path.isfile(os.path.join(path, "_sq_meta.json")):
        emb = load_table(spark, sf_dir, "embeddings")
        ann.sq_write(emb, path)
    return ann.sq_read_search(
        spark, path, _query_vec(spark, sf_dir), k=10, exact=True
    )


@register(
    "ann_bq_search",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    h AS (
      SELECT e.vec_id,
             (SELECT count(*)
              FROM (SELECT unnest(generate_series(1, len(e.embedding))) AS i) i
              WHERE (e.embedding[CAST(i.i AS INT)] > 0)
                      <> (q.qv[CAST(i.i AS INT)] > 0)) AS hamming
      FROM embeddings e CROSS JOIN q
    ), s AS (SELECT vec_id FROM h ORDER BY hamming ASC, vec_id ASC LIMIT 40)
    SELECT e.vec_id,
           round(list_cosine_similarity(e.embedding::DOUBLE[],
                 (SELECT qv::DOUBLE[] FROM q)), 6) AS score
    FROM embeddings e JOIN s USING (vec_id)
    ORDER BY score DESC, e.vec_id ASC LIMIT 10
    """,
    tags=("O10", "extension", "scale-path"),
)
def ann_bq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary quantization — the modern 1-bit ANN tier (operators/ann.py):
    sign-bit codes pack 64 dims into one BIGINT (32x smaller than
    float32), Hamming pre-rank is XOR + bit_count per word, and exact
    cosine touches only the k*overfetch shortlist via a broadcast
    semi-join. BQ has NO training state, so unlike PQ/SQ the entire
    two-stage search is deterministic and fully DuckDB-oracled — the
    oracle recomputes every sign comparison, the shortlist cut (total
    (hamming, id) order), and the re-ranked scores. Recall-vs-overfetch
    is characterized in tests/test_ann.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann.bq_search(emb, _query_vec(spark, sf_dir), k=10, overfetch=4)


# ---------------------------------------------------------------------------
# Retrieval evaluation: MRR@10 / nDCG@10 over label ground truth
# ---------------------------------------------------------------------------

# cumulative ideal DCG for k=0..10 relevant items, precomputed once in
# Python and embedded as IDENTICAL literals in the Spark plan and the SQL
# oracle (both engines then divide the same binary64 values)
_IDCG = [0.0, 1.0, 1.6309297535714575, 2.1309297535714578, 2.5616063116448506, 2.9484591188793923, 3.3046663059874146, 3.637999639320748, 3.953464516106477, 4.254494511770458, 4.543559338088346]

_EVAL_SQL = """
    WITH q AS (
      SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
      FROM embeddings WHERE vec_id % 97 = 0
    ), lc AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY label
    ), scored AS (
      SELECT q.q_id, q.q_label, e.vec_id, e.label,
             round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) AS score
      FROM q JOIN embeddings e ON e.vec_id <> q.q_id
    ), ranked AS (
      SELECT q_id, q_label, vec_id, label, score,
             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rnk
      FROM scored
    ), top AS (
      SELECT q_id, q_label, rnk,
             CASE WHEN label = q_label THEN 1 ELSE 0 END AS rel
      FROM ranked WHERE rnk <= 10
    ), per_q AS (
      SELECT q_id, q_label,
             CAST(SUM(rel) AS BIGINT) AS n_rel_at_10,
             SUM(rel * (1.0 / log2(rnk + 1))) AS dcg,
             MIN(CASE WHEN rel = 1 THEN rnk END) AS first_rel
      FROM top GROUP BY q_id, q_label
    ), idcg(k, v) AS (VALUES (0, 0.0), (1, 1.0), (2, 1.6309297535714575), (3, 2.1309297535714578), (4, 2.5616063116448506), (5, 2.9484591188793923), (6, 3.3046663059874146), (7, 3.637999639320748), (8, 3.953464516106477), (9, 4.254494511770458), (10, 4.543559338088346))
    SELECT per_q.q_id AS query_id, n_rel_at_10,
           round(COALESCE(1.0 / first_rel, 0.0), 6) AS mrr,
           round(CASE WHEN least(lc.n - 1, 10) > 0
                      THEN dcg / idcg.v ELSE 0.0 END, 6) AS ndcg
    FROM per_q
    JOIN lc ON lc.label = per_q.q_label
    JOIN idcg ON idcg.k = least(lc.n - 1, 10)
"""


@register(
    "search_eval_mrr_ndcg",
    oracle=_EVAL_SQL,
    tags=("search-eval", "E2", "extension"),
)
def search_eval_mrr_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation harness: for a deterministic query sample
    (vec_id % 97), rank the corpus by cosine similarity and score the
    ranking against label ground truth — MRR@10 and binary-gain nDCG@10
    per query (ideal DCG from a precomputed lookup shared verbatim with
    the oracle, so both engines divide identical binary64 constants). The
    measurement loop every search deployment needs and the reference
    lacks entirely. Brute-force scoring here (tens of queries; the judged
    metrics must be exact); at corpus scale the SAME metrics run over any
    ANN candidate stream (ann.knn_batch / IVF / HNSW) — rank, join, and
    window are unchanged."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    lc = emb.groupBy("label").agg(F.count("*").cast("bigint").alias("n"))
    cand = emb.select("vec_id", "label", "embedding")
    dot = dot_product(F.col("embedding"), F.col("q_emb"))
    norm = dot_product(F.col("embedding"), F.col("embedding"))
    qnorm = dot_product(F.col("q_emb"), F.col("q_emb"))
    score = F.round(dot / (F.sqrt(norm) * F.sqrt(qnorm)), 6)
    scored = (
        q.crossJoin(cand)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "q_label", "vec_id", "label", score.alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    top = (
        scored.select("*", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 10)
        .select(
            "q_id", "q_label", "rnk",
            F.when(F.col("label") == F.col("q_label"), 1).otherwise(0).alias("rel"),
        )
    )
    per_q = top.groupBy("q_id", "q_label").agg(
        F.sum("rel").cast("bigint").alias("n_rel_at_10"),
        F.sum(F.col("rel") * (F.lit(1.0) / F.log2(F.col("rnk") + 1))).alias("dcg"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("first_rel"),
    )
    idcg_arr = F.array(*[F.lit(v) for v in _IDCG])
    k = F.least(F.col("n") - 1, F.lit(10))
    return (
        per_q.join(lc, per_q.q_label == lc.label)
        .select(
            F.col("q_id").alias("query_id"),
            "n_rel_at_10",
            F.round(F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)), 6)
            .alias("mrr"),
            F.round(
                F.when(k > 0, F.col("dcg") / F.element_at(idcg_arr, (k + 1).cast("int")))
                .otherwise(0.0),
                6,
            ).alias("ndcg"),
        )
    )


@register(
    "hard_negative_mining",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS qlabel
      FROM embeddings WHERE vec_id % 50 = 0
    ), scored AS (
      SELECT q.query_id, e.vec_id AS neg_id, e.label AS neg_label,
             round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
      FROM q JOIN embeddings e ON e.label <> q.qlabel
    ), ranked AS (
      SELECT query_id, neg_id, neg_label, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neg_id ASC) AS rn
      FROM scored
    )
    SELECT query_id, neg_id, neg_label, score FROM ranked WHERE rn <= 5
    """,
    tags=("C6", "extension", "training"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive retrieval training (DPR,
    Karpukhin et al. 2020): for every training query, the top-k most
    similar vectors that are NOT in its positive set (here: a different
    label) — the negatives that actually move the loss. One broadcast of
    the query batch against the collection, the positive-exclusion
    predicate applied BEFORE the map-side bounded top-k (so positives never
    occupy heap slots), then the usual two-level reduction — the same
    single-scan shape as ``knn_batch_topk``, no per-query jobs, no n² term."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    negs = ann.knn_batch(
        emb,
        queries,
        k=5,
        pair_filter=F.col("label") != F.col("query_label"),
    )
    # re-attach the negative's label (knn_batch projects to id+score);
    # |negs| ≤ |queries|·k, so this is a broadcast-sized join
    return negs.join(
        emb.select("vec_id", F.col("label").alias("neg_label")), "vec_id"
    ).select(
        "query_id",
        F.col("vec_id").alias("neg_id"),
        "neg_label",
        "score",
    )
