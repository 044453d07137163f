"""Text-pipeline queries: chunking, text analysis, BM25/RRF hybrid search,
deduplication (SURVEY §2.H/§2.J + training-data extensions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.functions.text import (
    STOPWORDS,
    detect_language_expr,
    fingerprint_expr,
    punct_ratio_expr,
    quality_score_expr,
    token_count_expr,
    tokens_expr,
)
from frappe_data_pipelines_spark.operators.chunker import chunk_documents
from frappe_data_pipelines_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from frappe_data_pipelines_spark.operators.embed import embed_documents
from frappe_data_pipelines_spark.operators.search import (
    bm25_scores,
    knn_topk,
    lexical_rerank,
    rrf_fuse,
)
from frappe_data_pipelines_spark.plans.catalog import register
from frappe_data_pipelines_spark.sources.tables import load_table

QUERY_TERMS = ["fast", "join", "table", "scan"]

# DuckDB mirror of functions/text.py tokenization.
_SQL_TOKS = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
_SQL_SW = "['" + "', '".join(STOPWORDS) + "']"


# ---------------------------------------------------------------------------
# Chunking (rows-only: procedural semantics; property tests in tests/)
# ---------------------------------------------------------------------------

@register("chunk_recursive", tags=("H1", "E1", "rows-only"))
def chunk_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 recursive character chunker (exact LangChain semantics, reference:
    services/chunking_service.py:127-163) at size 200 / overlap 40 so the
    word-salad test docs genuinely split. Shuffle-free mapInPandas."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, strategy="recursive", chunk_size=200, chunk_overlap=40).select(
        "doc_id", "chunk_index", "chunk_text", "character_count", "total_chunks"
    )


@register("chunk_semantic", tags=("H4", "H5", "rows-only"))
def chunk_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic chunker: header sectionizing + stateful section paths
    (reference: chunking_service.py:166-481), target 300 chars."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, strategy="semantic", chunk_size=300, chunk_overlap=60).select(
        "doc_id", "chunk_index", "chunk_text", "character_count", "section_path"
    )


@register(
    "chunk_counts_per_doc",
    tags=("D4", "rows-only"),
)
def chunk_counts_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 chunk-count accounting over the chunker output."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, strategy="recursive", chunk_size=200, chunk_overlap=40)
    return chunks.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum("character_count").cast("bigint").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Text analysis (SQL-oracle)
# ---------------------------------------------------------------------------

@register(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKS}) AS BIGINT) AS token_count,
           CAST(len(list_distinct({_SQL_TOKS})) AS BIGINT) AS distinct_tokens,
           round(CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
                 / length(text), 6) AS punct_ratio
    FROM documents
    """,
    tags=("text-analysis",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + punctuation ratio — whole-stage-codegen column
    expressions, no Python."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_expr(F.col("text")).alias("token_count"),
        F.size(F.array_distinct(tokens_expr(F.col("text")))).cast("bigint").alias("distinct_tokens"),
        F.round(punct_ratio_expr(F.col("text")), 6).alias("punct_ratio"),
    )


@register(
    "text_language_id",
    # literal unicode chars (DuckDB's regex engine rejects \uXXXX escapes)
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN regexp_matches(text, '[{chr(0x0600)}-{chr(0x06FF)}]') THEN 'ar'
                WHEN regexp_matches(text, '[{chr(0x4E00)}-{chr(0x9FFF)}]') THEN 'zh'
                WHEN regexp_matches(text, '[a-zA-Z]') THEN 'en'
                ELSE 'unknown' END AS detected_lang
    FROM documents
    """,
    tags=("H6", "text-analysis"),
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6 unicode-range language heuristic (reference:
    services/ocr_service.py:189-226)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", detect_language_expr(F.col("text")).alias("detected_lang"))


@register(
    "text_quality_scores",
    # formula mirrors functions/text.py:quality_score_expr exactly (no inner
    # rounding); final 6-dp cut uses floor() which is deterministic on
    # bit-identical doubles in both engines (round() half-up differs at rare
    # representation boundaries)
    oracle=f"""
    SELECT doc_id,
           floor((least(CAST(length(text) AS DOUBLE) / 1000.0, 1.0)
                  + (1.0 - least(CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) * 5.0, 1.0))
                  + least(CAST(len(list_filter({_SQL_TOKS}, t -> list_contains({_SQL_SW}, t))) AS DOUBLE)
                          / len({_SQL_TOKS}) * 5.0, 1.0)) / 3.0 * 1000000) / 1000000 AS quality
    FROM documents
    """,
    tags=("text-analysis",),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality heuristic (length / punctuation / prose-likeness)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score_expr(F.col("text")).alias("quality"))


@register(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
    tags=("dedup", "text-analysis"),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (whitespace-normalized md5)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint_expr(F.col("text")).alias("fp"))


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM documents
    GROUP BY 1 HAVING count(*) > 1
    """,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized fingerprint. One shuffle
    on a uniform short key — no skew at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        exact_duplicates(docs)
        .select(
            "fp",
            "n_docs",
            F.array_min("doc_ids").alias("min_doc"),
            F.array_max("doc_ids").alias("max_doc"),
        )
    )


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 4, 0)),
               i -> array_to_string(t[i:i+4], ' ')))) AS shingle
      FROM toks WHERE len(t) >= 5
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(common * 1.0 / (x.n_sh + y.n_sh - common), 6) AS jaccard
    FROM common JOIN sizes x ON id_a = x.doc_id JOIN sizes y ON id_b = y.doc_id
    WHERE round(common * 1.0 / (x.n_sh + y.n_sh - common), 6) >= 0.5
    """,
    tags=("dedup", "headline"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard near-dup pairs (5-word shingles, τ=0.5) via
    inverted-index join — no n² crossJoin; cost bounded by shingle
    co-occurrence. The testdata plants ~0.99-jaccard pairs."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, n=5, threshold=0.5)


@register("dedup_minhash_lsh", tags=("dedup", "rows-only"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH candidate pairs with estimated jaccard.
    Rows-only (hash-family composition is procedural); tests/test_dedup.py
    checks precision/recall against exact jaccard."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, num_hashes=16, bands=4, shingle_n=3)


@register("dedup_simhash", tags=("dedup", "rows-only"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signatures per doc (majority-vote bits over md5 token
    hashes) — relational bit-vote formulation, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash64(docs)


# ---------------------------------------------------------------------------
# BM25 / RRF / rerank (the declared-but-missing hybrid search, done properly)
# ---------------------------------------------------------------------------

_BM25_SQL = f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
    ), doclen AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM doclen
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
      WHERE term IN ('fast', 'join', 'table', 'scan') GROUP BY doc_id, term
    ), df AS (
      SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY term
    )
    SELECT tf.doc_id,
           round(SUM(ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                 * (tf.tf * 2.2) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * doclen.dl / stats.avgdl))), 6) AS bm25
    FROM tf JOIN df USING (term) JOIN doclen USING (doc_id) CROSS JOIN stats
    GROUP BY tf.doc_id
"""


@register("bm25_keyword_search", oracle=_BM25_SQL, tags=("hybrid-search", "headline"))
def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) for query terms — implements the
    capability the reference only claims in docstrings (reference:
    services/search_service.py:1-6 declares BM25; none exists)."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_scores(docs, QUERY_TERMS)


@register(
    "rrf_hybrid_fusion",
    oracle=f"""
    WITH bm AS ({_BM25_SQL}),
    dense AS (
      SELECT e.vec_id AS doc_id,
             round(list_cosine_similarity(e.embedding::DOUBLE[],
                   (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS score
      FROM embeddings e
    ),
    ra AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank_a FROM dense),
    rb AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank_b FROM bm)
    SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
           round(COALESCE(1.0 / (60 + rank_a), 0.0) + COALESCE(1.0 / (60 + rank_b), 0.0), 6) AS rrf
    FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
    ORDER BY rrf DESC, doc_id ASC
    LIMIT 20
    """,
    tags=("hybrid-search", "headline"),
)
def rrf_hybrid_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion of the dense cosine ranking and the BM25
    ranking — the declared-but-missing fusion, rrf = Σ 1/(60 + rank)."""
    from frappe_data_pipelines_spark.operators.search import _score

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    qv = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    dense = _score(emb, qv, "embedding").select(F.col("vec_id").alias("doc_id"), "score")
    bm = bm25_scores(docs, QUERY_TERMS)
    return rrf_fuse(dense, bm, top_k=20)


@register(
    "rerank_overfetch_cut",
    oracle=f"""
    WITH bm AS ({_BM25_SQL}),
    cands AS (
      SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id ASC LIMIT 50
    )
    SELECT c.doc_id,
           round(CAST(len(list_intersect(list_distinct({_SQL_TOKS}),
                 ['fast', 'join', 'table', 'scan'])) AS DOUBLE) / 4, 6) AS relevance
    FROM cands c JOIN documents USING (doc_id)
    ORDER BY relevance DESC, c.doc_id ASC
    LIMIT 10
    """,
    tags=("E3", "J4"),
)
def rerank_overfetch_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3/J4 rerank-then-cut: overfetch candidates (50 = 10×5, the
    reference's top_k×5 heuristic, search_service.py:83), re-score with the
    deterministic lexical reranker, keep top 10."""
    docs = load_table(spark, sf_dir, "documents")
    cands = (
        bm25_scores(docs, QUERY_TERMS)
        .orderBy(F.desc("bm25"), F.col("doc_id").asc())
        .limit(50)
        .join(docs, "doc_id")
    )
    return lexical_rerank(cands, QUERY_TERMS, top_k=10).select("doc_id", "relevance")


# ---------------------------------------------------------------------------
# Flagship pipeline (rows-only — exercises chunk → embed → search end-to-end)
# ---------------------------------------------------------------------------

@register("flagship_chunk_embed_search", tags=("M0", "J1", "H1", "C6", "rows-only", "headline"))
def flagship_chunk_embed_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M0 flagship: documents → recursive chunks → deterministic embeddings
    → cosine top-10 for an embedded text query. The full ingest+search path
    of the reference in one declarative plan."""
    from frappe_data_pipelines_spark.operators.embed import HashingEmbedder

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, strategy="recursive", chunk_size=200, chunk_overlap=40)
    embedded = embed_documents(chunks, text_col="chunk_text", out_col="embedding")
    qv = HashingEmbedder().embed([" ".join(QUERY_TERMS)])[0]
    return knn_topk(
        embedded, qv, k=10, vec_col="embedding", id_col="doc_id"
    ).select("doc_id", "chunk_index", "chunk_text", "score")


@register(
    "dataset_splits",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 100 AS bucket
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'validation'
                ELSE 'test' END AS split
    FROM b
    """,
    tags=("text-analysis", "extension"),
)
def dataset_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/validation/test assignment (80/10/10) by salted
    content hash — the standard training-data split that survives
    re-partitioning, re-runs, and incremental appends (no rand(), SURVEY
    hard spot (c))."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string")).cast("binary")), 1, 8),
            16, 10,
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "validation").otherwise("test")
    )
    return docs.select("doc_id", split.alias("split"))


@register(
    "corpus_quality_filter",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE regexp_matches(text, '[a-zA-Z]')
      AND NOT regexp_matches(text, '[{chr(0x0600)}-{chr(0x06FF)}{chr(0x4E00)}-{chr(0x9FFF)}]')
      AND n_chars BETWEEN 100 AND 100000
      AND length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
            <= length(text) * 0.2
      AND len(list_filter({_SQL_TOKS}, t -> list_contains({_SQL_SW}, t)))
            * 10 >= len({_SQL_TOKS})
    """,
    tags=("text-analysis", "extension", "B11"),
)
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite pre-training corpus filter (C4/Gopher-style rules over the
    engine's text-analysis functions): latin-script language, length bounds,
    punctuation ratio ≤ 0.2, stopword ratio ≥ 0.1 — one conjunctive
    predicate, fully pushed/codegen'd; at 100 TB this is a single scan."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_expr(F.col("text"))
    n_toks = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(F.lit(STOPWORDS).cast("array<string>"), t)))
    punct_len = F.length(F.regexp_replace(F.col("text"), "[a-zA-Z0-9\\s]", ""))
    keep = (
        F.col("text").rlike("[a-zA-Z]")
        & ~F.col("text").rlike("[؀-ۿ一-鿿]")
        & F.col("n_chars").between(100, 100000)
        & (punct_len <= F.length("text") * 0.2)
        & (n_stop * 10 >= n_toks)
    )
    return docs.filter(keep).select("doc_id", "lang", "n_chars")
