"""Service-surface queries: RLS visibility, J5 routing plans, J2 enrichment,
A2 extraction dispatch — the operator layer the reference exposes as its
Python entry points."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.operators.enrich import enrich_chunks, processing_plan_expr
from frappe_data_pipelines_spark.operators.extraction import extract_text
from frappe_data_pipelines_spark.plans.catalog import register
from frappe_data_pipelines_spark.sources.tables import load_table


@register(
    "rls_document_visibility",
    oracle="""
    WITH owned AS (
      SELECT DISTINCT source FROM documents
      WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
    ), shared AS (
      SELECT doc_id FROM documents WHERE doc_id % 10 = 3
    )
    SELECT d.doc_id, d.source FROM documents d
    WHERE d.source IN (SELECT source FROM owned)
       OR d.doc_id IN (SELECT doc_id FROM shared)
    """,
    tags=("C1", "G1"),
)
def rls_document_visibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 RLS permission semi-join on the documents table: visible iff the
    doc's source is owned by the user OR the doc is explicitly shared
    (owned ∪ shared grant sources — reference: permissions.py:43-79).
    Expressed as a union of two semi-joins; AQE broadcasts both grant sets."""
    docs = load_table(spark, sf_dir, "documents")
    owned_sources = docs.filter(
        F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    ).select("source").distinct()
    shared_docs = docs.filter(F.col("doc_id") % 10 == 3).select("doc_id")
    by_source = docs.join(owned_sources, "source", "left_semi")
    by_share = docs.join(shared_docs, "doc_id", "left_semi")
    return by_source.unionByName(by_share).distinct().select("doc_id", "source")


@register(
    "j5_routing_plan",
    oracle="""
    SELECT doc_id,
           CASE WHEN n_chars < 80 THEN 'visual'
                WHEN n_chars > 450 THEN 'structured'
                ELSE 'text' END AS strategy,
           n_chars < 80 AS requires_ocr,
           lang AS detected_language,
           CAST(CASE WHEN n_chars < 80 THEN 1200
                     WHEN n_chars > 450 THEN 800
                     ELSE 1000 END AS INT) AS suggested_chunk_size
    FROM documents
    """,
    tags=("J5", "H8", "H15"),
)
def j5_routing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 decision agent (metadata part): ProcessingPlan struct flattened to
    columns (reference: decision_agent.py:92-299). The PDF page-sampling
    refinement plugs in upstream as a sniffing UDF feeding the same expr."""
    docs = load_table(spark, sf_dir, "documents")
    plan = processing_plan_expr(F.col("lang"), F.col("n_chars"))
    return docs.select(
        "doc_id",
        plan["strategy"].alias("strategy"),
        plan["requires_ocr"].alias("requires_ocr"),
        plan["detected_language"].alias("detected_language"),
        plan["suggested_chunk_size"].alias("suggested_chunk_size"),
    )


@register(
    "j2_enrich_contexts",
    oracle="""
    WITH paras AS (
      SELECT doc_id, string_split_regex(replace(text, ' table ', chr(10) || chr(10)), '\\n\\s*\\n') AS parts
      FROM documents
    ), chunks AS (
      SELECT doc_id, CAST(i.i - 1 AS INT) AS chunk_index, trim(parts[i.i]) AS chunk_text,
             CAST(len(parts) AS INT) AS total_chunks
      FROM paras, LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i) i
      WHERE trim(parts[i.i]) <> ''
    )
    SELECT doc_id, chunk_index,
           'Chunk ' || CAST(chunk_index + 1 AS VARCHAR) || ' of ' || CAST(total_chunks AS VARCHAR)
             || ' from document ' || CAST(doc_id AS VARCHAR) || '.' AS context_prefix,
           'Chunk ' || CAST(chunk_index + 1 AS VARCHAR) || ' of ' || CAST(total_chunks AS VARCHAR)
             || ' from document ' || CAST(doc_id AS VARCHAR) || '.' || chr(10) || chr(10) || chunk_text AS embedded_text
    FROM chunks
    """,
    tags=("J2", "H16"),
)
def j2_enrich_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 contextual enrichment with the deterministic template provider:
    context_prefix + embedded_text per chunk (reference:
    context_service.py:57-202; failure-tolerant LLM variant swaps into the
    same stage). Chunks come from the SQL-expressible paragraph splitter so
    the whole path is oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    parts = F.split(F.regexp_replace(F.col("text"), " table ", "\n\n"), "\\n\\s*\\n")
    exploded = (
        docs.select("doc_id", F.posexplode(parts).alias("chunk_index", "chunk_text"),
                    F.size(parts).cast("int").alias("total_chunks"))
        .withColumn("chunk_text", F.trim("chunk_text"))
        .filter(F.col("chunk_text") != "")
        .select("doc_id", F.col("chunk_index").cast("int").alias("chunk_index"),
                "chunk_text", "total_chunks")
    )
    return enrich_chunks(exploded).select("doc_id", "chunk_index", "context_prefix", "embedded_text")


@register(
    "a2_extraction_dispatch",
    oracle="""
    SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.' ||
             CASE doc_id % 4 WHEN 0 THEN 'txt' WHEN 1 THEN 'md'
                             WHEN 2 THEN 'pdf' ELSE 'png' END AS path,
           CASE doc_id % 4 WHEN 0 THEN 'txt' WHEN 1 THEN 'md'
                           WHEN 2 THEN 'pdf' ELSE 'png' END AS ext,
           CASE doc_id % 4
             WHEN 0 THEN text
             WHEN 1 THEN text
             WHEN 2 THEN '[pdf:' || CAST(octet_length(encode(text)) AS VARCHAR) || ' bytes]'
             ELSE '[ocr:' || CAST(octet_length(encode(text)) AS VARCHAR) || ' bytes]' END AS text,
           CASE doc_id % 4 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-8'
                           WHEN 2 THEN 'pdf-stub' ELSE 'ocr-stub' END AS method,
           CASE WHEN doc_id % 4 = 3 THEN 0.5 ELSE 1.0 END AS confidence
    FROM documents
    """,
    tags=("A2", "A4", "B1"),
)
def a2_extraction_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 extension-dispatch extraction over a binary source: documents
    re-materialized as (path, content BINARY) with mixed extensions, routed
    through the one-pass mapInPandas extractor (txt/md → real decode chain,
    pdf/png → stub branches). The oracle mirrors every branch."""
    docs = load_table(spark, sf_dir, "documents")
    ext = (
        F.when(F.col("doc_id") % 4 == 0, "txt")
        .when(F.col("doc_id") % 4 == 1, "md")
        .when(F.col("doc_id") % 4 == 2, "pdf")
        .otherwise("png")
    )
    binary = docs.select(
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string"), F.lit("."), ext).alias("path"),
        F.encode("text", "UTF-8").alias("content"),
    )
    return extract_text(binary)


@register(
    "a2_csv_json_source_equivalence",
    oracle="""
    SELECT fmt, lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(min(doc_id) AS BIGINT) AS min_id,
           CAST(max(doc_id) AS BIGINT) AS max_id
    FROM (SELECT 'csv' AS fmt, * FROM documents
          UNION ALL
          SELECT 'json' AS fmt, * FROM documents)
    GROUP BY fmt, lang
    """,
    tags=("A2", "source", "extension"),
)
def a2_csv_json_source_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-generic source fidelity (A2 dispatch over table formats): the
    documents table round-trips through REAL csv and json writes + reads
    (sources/tables.load_any — explicit schema, no inference pass) and the
    per-lang aggregates must hash-match the parquet-derived oracle. CSV
    quoting of free text and JSON escaping are thereby part of the checked
    contract, not just a unit test."""
    import shutil
    import tempfile

    from frappe_data_pipelines_spark.sources.tables import load_any, write_any

    schema = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="fdp_src_eq_")
    try:
        frames = []
        for fmt in ("csv", "json"):
            path = f"{tmp}/{fmt}"
            write_any(docs, path, fmt=fmt)
            back = load_any(spark, path, fmt=fmt, schema=schema)
            frames.append(back.withColumn("fmt", F.lit(fmt)))
        both = frames[0].unionByName(frames[1])
        out = both.groupBy("fmt", "lang").agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.min("doc_id").cast("bigint").alias("min_id"),
            F.max("doc_id").cast("bigint").alias("max_id"),
        )
        # materialize before the tmp dir disappears
        from frappe_data_pipelines_spark.operators.guards import collect_bounded

        return spark.createDataFrame(
            collect_bounded(out, 10_000, "source-equivalence aggregates"), out.schema
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@register(
    "a2_orc_source_equivalence",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
           CAST(min(doc_id) AS BIGINT) AS min_id,
           CAST(max(doc_id) AS BIGINT) AS max_id
    FROM documents
    GROUP BY lang
    """,
    tags=("A2", "source", "extension"),
)
def a2_orc_source_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-generic source fidelity, ORC leg (A2 dispatch over table
    formats): documents round-trip through a REAL ORC write + read via
    sources/tables.load_any — Spark's other built-in columnar format, with
    its own encoder for strings — and per-lang aggregates (including a
    UTF-8 byte-length checksum over the free text, so encoding fidelity is
    part of the hash) must match the parquet-derived oracle. Complements
    a2_csv_json_source_equivalence, which covers the row formats."""
    import shutil
    import tempfile

    from frappe_data_pipelines_spark.operators.guards import collect_bounded
    from frappe_data_pipelines_spark.sources.tables import load_any, write_any

    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="fdp_src_eq_orc_")
    try:
        write_any(docs, f"{tmp}/orc", fmt="orc")
        back = load_any(spark, f"{tmp}/orc", fmt="orc")
        out = back.groupBy("lang").agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.sum(F.octet_length(F.encode("text", "UTF-8"))).cast("bigint").alias("sum_bytes"),
            F.min("doc_id").cast("bigint").alias("min_id"),
            F.max("doc_id").cast("bigint").alias("max_id"),
        )
        return spark.createDataFrame(
            collect_bounded(out, 10_000, "source-equivalence aggregates"), out.schema
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
