"""Scalar-function + extended-join queries (SURVEY §2.H remainder, §2.C
extensions, MinHash oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.plans.catalog import register
from frappe_data_pipelines_spark.sources.tables import load_table


@register(
    "h2_paragraph_split",
    oracle="""
    WITH paras AS (
      SELECT doc_id, string_split_regex(replace(text, ' table ', chr(10) || chr(10)), '\\n\\s*\\n') AS parts
      FROM documents
    )
    SELECT doc_id, CAST(i.i - 1 AS INT) AS para_index, trim(parts[i.i]) AS para
    FROM paras, LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i) i
    WHERE trim(parts[i.i]) <> ''
    """,
    tags=("H2", "E1"),
)
def h2_paragraph_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 paragraph split + enumeration (reference:
    chunking_service.py:422-426): the testdata has no blank lines, so a
    delimiter word is rewritten to a paragraph break first — the split/
    posexplode/strip/drop-empty pipeline is the operator under test."""
    docs = load_table(spark, sf_dir, "documents")
    parts = F.split(F.regexp_replace(F.col("text"), " table ", "\n\n"), "\\n\\s*\\n")
    return (
        docs.select("doc_id", F.posexplode(parts).alias("para_index", "para"))
        .withColumn("para", F.trim("para"))
        .filter(F.col("para") != "")
        .select("doc_id", F.col("para_index").cast("int").alias("para_index"), "para")
    )


@register(
    "h3_sentence_split",
    oracle="""
    WITH sents AS (
      SELECT doc_id, string_split_regex(replace(text, ' scan ', '. '), '\\.\\s+') AS parts
      FROM documents
    )
    SELECT doc_id, CAST(len(list_filter(parts, p -> trim(p) <> '')) AS BIGINT) AS n_sentences
    FROM sents
    """,
    tags=("H3",),
)
def h3_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 sentence split (reference: chunking_service.py:428-473) — period
    markers synthesized, then split on '\\.\\s+' (no lookbehind: DuckDB's
    RE2 lacks it; dropping the period is identical on both engines)."""
    docs = load_table(spark, sf_dir, "documents")
    parts = F.split(F.regexp_replace(F.col("text"), " scan ", ". "), "\\.\\s+")
    return docs.select(
        "doc_id",
        F.size(F.filter(parts, lambda p: F.trim(p) != "")).cast("bigint").alias("n_sentences"),
    )


@register(
    "h8_h15_type_routing",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_type IN ('ECONOMY', 'STANDARD') THEN 'text'
                WHEN p_type = 'PROMO' THEN 'visual'
                WHEN p_type IN ('SMALL', 'MEDIUM') THEN 'structured'
                ELSE 'hybrid' END AS strategy,
           CASE WHEN p_type = 'PROMO' THEN 1200
                WHEN p_type IN ('SMALL', 'MEDIUM') THEN 800
                WHEN p_type = 'LARGE' THEN 500
                ELSE 1000 END AS suggested_chunk_size
    FROM part
    """,
    tags=("H8", "H15", "J5"),
)
def h8_h15_type_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H8 MIME/extension→strategy map + H15 chunk-size suggestion — the
    metadata half of the J5 decision agent (reference:
    decision_agent.py:37-83, 275-286) as a pure when/otherwise expression."""
    part = load_table(spark, sf_dir, "part")
    strategy = (
        F.when(F.col("p_type").isin("ECONOMY", "STANDARD"), "text")
        .when(F.col("p_type") == "PROMO", "visual")
        .when(F.col("p_type").isin("SMALL", "MEDIUM"), "structured")
        .otherwise("hybrid")
    )
    size = (
        F.when(F.col("p_type") == "PROMO", 1200)
        .when(F.col("p_type").isin("SMALL", "MEDIUM"), 800)
        .when(F.col("p_type") == "LARGE", 500)
        .otherwise(1000)
    )
    return part.select("p_partkey", strategy.alias("strategy"), size.alias("suggested_chunk_size"))


@register(
    "h13_deterministic_ids",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)) AS point_id
    FROM lineitem WHERE l_orderkey < 100
    """,
    tags=("H13",),
)
def h13_deterministic_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H13 point-id generation, test-deterministic form: content-hash ids
    instead of uuid4 (SURVEY hard spot: uuid() is non-reproducible;
    reference qdrant_service.py:102)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") < 100).select(
        "l_orderkey",
        "l_linenumber",
        F.md5(
            F.concat_ws(":", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")).cast("binary")
        ).alias("point_id"),
    )


@register(
    "h14_base64_data_url",
    oracle="""
    SELECT doc_id,
           'data:text/plain;base64,' || base64(encode(substring(text, 1, 48))) AS data_url
    FROM documents
    """,
    tags=("H14",),
)
def h14_base64_data_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H14 base64 + data-URL encoding (reference: vision_service.py:108-131)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("data:text/plain;base64,"),
            F.base64(F.encode(F.substring("text", 1, 48), "UTF-8")),
        ).alias("data_url"),
    )


@register(
    "h16_context_prefix_concat",
    oracle="""
    SELECT doc_id,
           CASE WHEN lang <> 'en'
                THEN 'Doc ' || CAST(doc_id AS VARCHAR) || ' [' || lang || ']' || chr(10) || chr(10) || substring(text, 1, 80)
                ELSE substring(text, 1, 80) END AS embedded_text
    FROM documents
    """,
    tags=("H16", "J2"),
)
def h16_context_prefix_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H16 conditional context-prefix concat (reference:
    context_service.py:99-103): embedded_text = context + '\\n\\n' + chunk
    when a context exists, else the chunk alone."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.concat(F.lit("Doc "), F.col("doc_id").cast("string"), F.lit(" ["), F.col("lang"), F.lit("]"))
    chunk = F.substring("text", 1, 80)
    return docs.select(
        "doc_id",
        F.when(F.col("lang") != "en", F.concat_ws("\n\n", prefix, chunk)).otherwise(chunk).alias("embedded_text"),
    )


# ---------------------------------------------------------------------------
# Join/set extensions
# ---------------------------------------------------------------------------

@register(
    "asof_join_purchase_click",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts, max(c.ts) AS last_click_ts
    FROM events p JOIN events c
      ON p.user_id = c.user_id AND c.event_type = 'click' AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id, p.ts
    """,
    tags=("C-ext", "asof", "headline"),
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (extension — reference has no as-of; SURVEY §2.C note):
    for each purchase, the latest click by the same user at or before it.
    Union + running-window formulation (operators/joins.py asof_backward):
    one shuffle on user_id, no purchase×clicks pair explosion — the oracle
    states the same semantics as the naive join+max for the hash check."""
    from frappe_data_pipelines_spark.operators.joins import asof_backward

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = asof_backward(
        p, c, key_cols=["user_id"], left_ts="purchase_ts", right_ts="ts",
        value_col="ts", out_col="last_click_ts",
    )
    return out.filter(F.col("last_click_ts").isNotNull()).select(
        "event_id", "user_id", "purchase_ts", "last_click_ts"
    )


@register(
    "set_intersect_except",
    oracle="""
    SELECT 'both' AS side, n_nationkey AS nationkey FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'customer_only' AS side, n_nationkey AS nationkey FROM (
      SELECT c_nationkey AS n_nationkey FROM customer
      EXCEPT SELECT s_nationkey FROM supplier)
    """,
    tags=("G-ext",),
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations (not present in the reference —
    SURVEY §2.G note — but part of a complete relational surface)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = cust.intersect(supp).select(F.lit("both").alias("side"), "nationkey")
    # subtract = EXCEPT DISTINCT (exceptAll would leave multiset survivors)
    only = cust.subtract(supp).select(F.lit("customer_only").alias("side"), "nationkey")
    return both.unionByName(only)


@register(
    "rollup_order_stats",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18, 2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("D-ext",),
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (grand total + per-flag subtotals) — builtin
    Spark df.rollup (SURVEY §2.D note: available natively for extensions)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


@register(
    "exact_distinct_counts",
    oracle="""
    SELECT c_mktsegment, CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
    tags=("D-ext",),
)
def exact_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countDistinct per group (expand+two-phase agg in Spark; HLL sketch
    variant is approx_count_distinct — not oracle-able bit-for-bit, so the
    exact form carries the check)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").cast("bigint").alias("n_nations"),
        F.count("*").cast("bigint").alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# MinHash signatures — full SQL oracle (the md5-based portable hash family)
# ---------------------------------------------------------------------------

@register(
    "dedup_minhash_signatures",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> array_to_string(t[i:i+2], ' ')))) AS shingle
      FROM toks WHERE len(t) >= 3
    ), hashed AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) % 2147483647 AS h
      FROM sh
    )
    SELECT doc_id, CAST(i.i AS INT) AS hash_index,
           min(((2 * i.i + 1) * h + i.i * 12582917) % 2147483647) AS min_hash
    FROM hashed, LATERAL (SELECT unnest(generate_series(0, 15)) AS i) i
    GROUP BY doc_id, i.i
    """,
    tags=("dedup", "minhash"),
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures, exploded to (doc_id, hash_index, min_hash) rows —
    the md5-based affine hash family is bit-for-bit reproducible in SQL, so
    the signature computation itself is oracle-checked (the banded-LSH
    pairing on top is dedup_minhash_lsh, rows-only)."""
    from frappe_data_pipelines_spark.operators.dedup import minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs, num_hashes=16, shingle_n=3)
    return sig.select(
        "doc_id", F.posexplode("sig").alias("hash_index", "min_hash")
    ).select("doc_id", F.col("hash_index").cast("int").alias("hash_index"), "min_hash")


@register(
    "h4_header_detection",
    oracle="""
    WITH rewritten AS (
      SELECT doc_id,
             replace(replace(replace(replace(text,
               ' join ',   chr(10) || '## '),
               ' merge ',  chr(10) || '1.2 '),
               ' vector ', chr(10) || 'BIG SECTION HEADING' || chr(10)),
               ' stream ', chr(10) || 'Overview:' || chr(10)) AS t
      FROM documents
    ), lines AS (
      SELECT doc_id, CAST(i.i - 1 AS INT) AS line_no, trim(parts[i.i]) AS line
      FROM (SELECT doc_id, string_split(t, chr(10)) AS parts FROM rewritten),
           LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i) i
    )
    SELECT doc_id, line_no, line,
           CASE WHEN regexp_matches(line, '^#{1,6} ') THEN 'markdown'
                WHEN regexp_matches(line, '^[0-9]+(\\.[0-9]+)*\\.? ') THEN 'numbered'
                WHEN regexp_matches(line, '^[A-Z][A-Z ]{4,59}$') THEN 'allcaps'
                WHEN regexp_matches(line, ':$') AND length(line) <= 60 THEN 'colon'
                END AS kind,
           CASE WHEN regexp_matches(line, '^#{1,6} ')
                  THEN length(regexp_extract(line, '^(#{1,6}) ', 1))
                WHEN regexp_matches(line, '^[0-9]+(\\.[0-9]+)*\\.? ')
                  THEN len(string_split(regexp_extract(line, '^([0-9]+(\\.[0-9]+)*)', 1), '.'))
                ELSE 1 END AS level
    FROM lines
    WHERE line <> ''
      AND (regexp_matches(line, '^#{1,6} ')
           OR regexp_matches(line, '^[0-9]+(\\.[0-9]+)*\\.? ')
           OR regexp_matches(line, '^[A-Z][A-Z ]{4,59}$')
           OR (regexp_matches(line, ':$') AND length(line) <= 60))
    """,
    tags=("H4",),
)
def h4_header_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4 header detection (reference: chunking_service.py:174-184, 335-364):
    markdown ``#{1,6}``, numbered ``1.2.3``, ALL-CAPS (5-60 chars), and
    colon-suffixed headers with their levels. The word-salad testdata has no
    newlines, so header lines are synthesized by deterministic rewrites
    (identical on both engines) before the line classifier runs."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    for pat, rep in [
        (" join ", "\n## "),
        (" merge ", "\n1.2 "),
        (" vector ", "\nBIG SECTION HEADING\n"),
        (" stream ", "\nOverview:\n"),
    ]:
        t = F.replace(t, F.lit(pat), F.lit(rep))
    lines = (
        docs.select("doc_id", F.posexplode(F.split(t, "\n")).alias("line_no", "line"))
        .withColumn("line", F.trim("line"))
        .withColumn("line_no", F.col("line_no").cast("int"))
        .filter(F.col("line") != "")
    )
    is_md = F.col("line").rlike("^#{1,6} ")
    is_num = F.col("line").rlike("^[0-9]+(\\.[0-9]+)*\\.? ")
    is_caps = F.col("line").rlike("^[A-Z][A-Z ]{4,59}$")
    is_colon = F.col("line").rlike(":$") & (F.length("line") <= 60)
    kind = (
        F.when(is_md, "markdown")
        .when(is_num, "numbered")
        .when(is_caps, "allcaps")
        .when(is_colon, "colon")
    )
    level = (
        F.when(is_md, F.length(F.regexp_extract("line", "^(#{1,6}) ", 1)))
        .when(is_num, F.size(F.split(F.regexp_extract("line", "^([0-9]+(\\.[0-9]+)*)", 1), "\\.")))
        .otherwise(F.lit(1))
    )
    return lines.filter(is_md | is_num | is_caps | is_colon).select(
        "doc_id", "line_no", "line", kind.alias("kind"), level.cast("bigint").alias("level")
    )


@register(
    "h7_element_classifier",
    oracle="""
    WITH hits AS (
      SELECT doc_id,
             list_filter(['chart', 'table', 'diagram', 'infographic', 'photo',
                          'screenshot', 'map', 'logo', 'equation'],
                         k -> contains(lower(text), k)) AS l
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(l) > 0 THEN l ELSE ['image'] END AS elements
    FROM hits
    """,
    tags=("H7",),
)
def h7_element_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H7 keyword element classifier (reference: vision_service.py:179-208):
    tag a description with visual-element keywords; default ['image'] when
    nothing matches. Pure higher-order-function expression — no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    kws = F.array(
        *[
            F.lit(k)
            for k in [
                "chart", "table", "diagram", "infographic", "photo",
                "screenshot", "map", "logo", "equation",
            ]
        ]
    )
    hits = F.filter(kws, lambda k: F.contains(F.lower(F.col("text")), k))
    elements = F.when(F.size(hits) > 0, hits).otherwise(F.array(F.lit("image")))
    return docs.select("doc_id", elements.alias("elements"))


@register(
    "d2_ocr_confidence",
    oracle="""
    WITH lines AS (
      SELECT doc_id, trim(parts[i.i]) AS line
      FROM (SELECT doc_id, string_split(text, ' table ') AS parts FROM documents),
           LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i) i
    ), scored AS (
      SELECT doc_id,
             (CAST(('0x' || substring(md5(line), 1, 15)) AS BIGINT) % 1000) / 1000.0 AS conf
      FROM lines WHERE line <> ''
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(avg(conf), 6) AS avg_confidence
    FROM scored GROUP BY doc_id
    """,
    tags=("D2",),
)
def d2_ocr_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 mean OCR confidence (reference: ocr_service.py:148-150): avg of
    per-line recognition confidences. The container has no OCR engine, so
    line confidences are a deterministic md5-derived stand-in (same formula
    both engines) over synthesized lines — the aggregate is the operator."""
    docs = load_table(spark, sf_dir, "documents")
    lines = (
        docs.select("doc_id", F.explode(F.split("text", " table ")).alias("line"))
        .withColumn("line", F.trim("line"))
        .filter(F.col("line") != "")
    )
    h = F.conv(F.substring(F.md5(F.col("line").cast("binary")), 1, 15), 16, 10).cast("bigint")
    scored = lines.withColumn("conf", (h % 1000) / F.lit(1000.0))
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.round(F.avg("conf"), 6).alias("avg_confidence"),
    )


@register(
    "e4_order_restoration",
    oracle="""
    WITH paras AS (
      SELECT doc_id, CAST(i.i - 1 AS INT) AS para_index, trim(parts[i.i]) AS para
      FROM (SELECT doc_id, string_split_regex(replace(text, ' table ', chr(10) || chr(10)), '\\n\\s*\\n') AS parts
            FROM documents),
           LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i) i
      WHERE trim(parts[i.i]) <> ''
    ), scrambled AS (
      SELECT doc_id, para_index,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY md5(para), para_index) AS INT) - 1
               AS provider_order
      FROM paras
    )
    SELECT doc_id, para_index, provider_order,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY para_index) AS INT) - 1
             = para_index AS restored_in_order
    FROM scrambled
    """,
    tags=("E4",),
)
def e4_order_restoration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 order restoration (reference: embedding_service.py:171-173,
    239-241): a provider returns batch results in arbitrary order (here:
    md5-scrambled); keeping the input index through the stage and re-sorting
    on it restores input order — verified by the restored_in_order flag."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    parts = F.split(F.regexp_replace(F.col("text"), " table ", "\n\n"), "\\n\\s*\\n")
    paras = (
        docs.select("doc_id", F.posexplode(parts).alias("para_index", "para"))
        .withColumn("para", F.trim("para"))
        .filter(F.col("para") != "")
        .withColumn("para_index", F.col("para_index").cast("int"))
    )
    scramble = Window.partitionBy("doc_id").orderBy(F.md5(F.col("para").cast("binary")), "para_index")
    restore = Window.partitionBy("doc_id").orderBy("para_index")
    return (
        paras.withColumn("provider_order", (F.row_number().over(scramble) - 1).cast("int"))
        .withColumn(
            "restored_in_order",
            (F.row_number().over(restore) - 1) == F.col("para_index"),
        )
        .select("doc_id", "para_index", "provider_order", "restored_in_order")
    )


@register(
    "b2_b8_b9_job_guards",
    oracle="""
    WITH f AS (
      SELECT doc_id, source,
             (doc_id % 10 = 0) AS is_group,
             ['Queued', 'Failed', 'Completed'][CAST(doc_id % 3 AS INT) + 1] AS status
      FROM documents
    )
    SELECT doc_id AS job_id, source, status, 'ready' AS state
    FROM f
    WHERE NOT is_group AND status IN ('Queued', 'Failed')
    """,
    tags=("B2", "B8", "B9"),
)
def b2_b8_b9_job_guards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 folder filter + B8 status guard + B9 result projection (reference:
    drive_file_handler.py:32-35, process_embedding.py:38-39,
    search_service.py:110-122) — the admission-control prefix of every job,
    as one pushed-down filter + projection."""
    docs = load_table(spark, sf_dir, "documents")
    status = F.element_at(
        F.array(F.lit("Queued"), F.lit("Failed"), F.lit("Completed")),
        (F.col("doc_id") % 3).cast("int") + 1,
    )
    return (
        docs.select(
            "doc_id", "source",
            (F.col("doc_id") % 10 == 0).alias("is_group"),
            status.alias("status"),
        )
        .filter(~F.col("is_group") & F.col("status").isin("Queued", "Failed"))
        .select(
            F.col("doc_id").alias("job_id"), "source", "status", F.lit("ready").alias("state")
        )
    )


@register(
    "c4_keyed_alignment",
    oracle="""
    WITH paras AS (
      SELECT doc_id, CAST(i.i - 1 AS INT) AS para_index, trim(parts[i.i]) AS para
      FROM (SELECT doc_id, string_split_regex(replace(text, ' table ', chr(10) || chr(10)), '\\n\\s*\\n') AS parts
            FROM documents),
           LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i) i
      WHERE trim(parts[i.i]) <> ''
    ), ctx AS (
      SELECT doc_id, para_index, 'ctx-' || substring(md5(para), 1, 8) AS context_prefix
      FROM paras
    )
    SELECT p.doc_id, p.para_index, c.context_prefix,
           c.context_prefix || chr(10) || chr(10) || p.para AS embedded_text
    FROM paras p JOIN ctx c ON p.doc_id = c.doc_id AND p.para_index = c.para_index
    """,
    tags=("C4", "H16"),
)
def c4_keyed_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 positional-zip replacement (reference zips parallel lists at
    process_embedding.py:463,493 — SURVEY hard spot (e)): two independently
    derived per-chunk tables align on the composite key (doc_id, chunk_index)
    instead of list position, so alignment survives repartitioning."""
    docs = load_table(spark, sf_dir, "documents")
    parts = F.split(F.regexp_replace(F.col("text"), " table ", "\n\n"), "\\n\\s*\\n")
    paras = (
        docs.select("doc_id", F.posexplode(parts).alias("para_index", "para"))
        .withColumn("para", F.trim("para"))
        .filter(F.col("para") != "")
        .withColumn("para_index", F.col("para_index").cast("int"))
    )
    ctx = paras.select(
        "doc_id", "para_index",
        F.concat(F.lit("ctx-"), F.substring(F.md5(F.col("para").cast("binary")), 1, 8)).alias(
            "context_prefix"
        ),
    )
    return paras.join(ctx, ["doc_id", "para_index"]).select(
        "doc_id", "para_index", "context_prefix",
        F.concat_ws("\n\n", "context_prefix", "para").alias("embedded_text"),
    )


@register(
    "d5_partial_agg_batches",
    oracle="""
    WITH partials AS (
      SELECT l_returnflag, l_orderkey // 50 AS batch_id,
             sum(CAST(l_quantity AS DECIMAL(18, 2))) AS batch_qty
      FROM lineitem GROUP BY 1, 2
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(sum(batch_qty) AS DOUBLE) AS sum_qty
    FROM partials GROUP BY l_returnflag
    """,
    tags=("D5", "D1"),
)
def d5_partial_agg_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 partial/final aggregation made explicit (reference's only partial
    execution is the batch-of-50 embed loop, process_embedding.py:356-370):
    per-batch partial sums then a final combine — the shape Spark's
    map-side partial aggregation applies automatically to every groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    partials = li.groupBy(
        "l_returnflag", F.expr("l_orderkey DIV 50").alias("batch_id")
    ).agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("batch_qty"))
    return partials.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n_batches"),
        F.sum("batch_qty").cast("double").alias("sum_qty"),
    )


@register(
    "f2_recency_topk",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderdate DESC, o_orderkey DESC
    LIMIT 100
    """,
    tags=("F2",),
)
def f2_recency_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 descending recency sort (reference doctype default
    document_chunk.json:212-213) — Spark plans this as
    TakeOrderedAndProject, never a full sort."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(100)
    )


@register(
    "h10_h11_progress_langs",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS total,
           CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS processed,
           CAST(count(CASE WHEN lang = 'en' THEN 1 END) * 80 // count(*) AS BIGINT)
             AS progress_percent,
           array_to_string(list_sort(list_distinct(list(lang))), ',') AS langs_csv
    FROM documents GROUP BY source
    """,
    tags=("H10", "H11", "D1"),
)
def h10_h11_progress_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H10 progress arithmetic (int(processed/total*80),
    process_embedding.py:366) in exact integer form + H11 CSV-join of the
    language array (process_embedding.py:446,511)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("total"),
        F.count(F.when(F.col("lang") == "en", 1)).cast("bigint").alias("processed"),
        F.expr("CAST(count(CASE WHEN lang = 'en' THEN 1 END) * 80 DIV count(*) AS BIGINT)").alias(
            "progress_percent"
        ),
        F.array_join(F.array_sort(F.collect_set("lang")), ",").alias("langs_csv"),
    )
