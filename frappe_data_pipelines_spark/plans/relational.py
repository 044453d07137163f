"""Relational operator queries (SURVEY §2.B–2.H) over the star schema.

Each query exercises one (or a few) inventory rows and carries an ANSI-SQL
DuckDB oracle. Float-sum parity: monetary aggregates accumulate in exact
DECIMAL and are cast back to DOUBLE at the end, so Spark's parallel partial
aggregation and DuckDB's serial fold produce bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.plans.catalog import register
from frappe_data_pipelines_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# B — filters / projections
# ---------------------------------------------------------------------------

@register(
    "b1_type_filter",
    oracle="SELECT doc_id, lang, n_chars FROM documents WHERE lang IN ('en', 'fr')",
    tags=("B1",),
)
def b1_type_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 supported-type filter (isin over an enabled list); predicate pushes
    into the parquet scan (reference: services/text_extraction.py:42-61)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("lang").isin("en", "fr")).select("doc_id", "lang", "n_chars")


@register(
    "b3_size_filter",
    oracle="SELECT doc_id, n_chars FROM documents WHERE n_chars <= 300",
    tags=("B3",),
)
def b3_size_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 size-limit gate (reference: handlers/drive_file_handler.py:52-61)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("n_chars") <= 300).select("doc_id", "n_chars")


@register(
    "b5_retention_cutoff",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE ts < (SELECT max(ts) - INTERVAL 7 DAY FROM events)
    GROUP BY event_type
    """,
    tags=("B5", "H9"),
)
def b5_retention_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 retention predicate: rows older than (max ts − 7 days), the batch
    analogue of 'completed_at < today − 30d' (reference:
    tasks/process_embedding.py:552-563)."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = ev.agg((F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cut"))
    return (
        ev.crossJoin(F.broadcast(cutoff))
        .filter(F.col("ts") < F.col("cut"))
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


@register(
    "b6_conjunctive_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_linestatus = 'F' AND l_quantity < 10
    """,
    tags=("B6",),
)
def b6_conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 conjunctive equality filter — the only filter shape the reference's
    vector search supports (services/qdrant_service.py:131-137). All three
    predicates reach the parquet scan as PushedFilters."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F") & (F.col("l_quantity") < 10)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@register(
    "b10_truncation_projection",
    oracle="""
    SELECT doc_id, substring(text, 1, 100) AS preview,
           CAST(length(text) AS BIGINT) AS character_count
    FROM documents
    """,
    tags=("B10", "H12"),
)
def b10_truncation_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10 payload preview truncation + H12 character count (reference:
    tasks/process_embedding.py:394-395, document_chunk.py:9-11)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.substring("text", 1, 100).alias("preview"),
        F.length("text").cast("bigint").alias("character_count"),
    )


@register(
    "b11_nonempty_guard",
    oracle="""
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents
    WHERE length(trim(text)) > 0
    GROUP BY source
    """,
    tags=("B11",),
)
def b11_nonempty_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 empty-text guard (reference: chunking_service.py:158-163)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.length(F.trim(F.col("text"))) > 0)
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# C — joins
# ---------------------------------------------------------------------------

@register(
    "c1_permission_semi_join",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
    tags=("C1",),
)
def c1_permission_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 RLS semi-join: rows visible iff key ∈ grant set (reference:
    permissions.py:43-79). left_semi keeps the probe side unduplicated and
    lets AQE broadcast the (small) grant set."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return orders.join(
        cust.select("c_custkey"), orders.o_custkey == cust.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "c2_backfill_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    tags=("C2",),
)
def c2_backfill_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 backfill dedup anti-join: entities with no existing job row
    (reference: data_pipeline_settings.py:165-180)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders.select("o_custkey"), cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "c3_broadcast_lookup_join",
    oracle="""
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18, 4))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    tags=("C3", "D4"),
)
def c3_broadcast_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 metadata lookup join, explicitly broadcast (part is the small dim —
    reference does per-row ORM lookups, tasks/process_embedding.py:379-384;
    here it is one map-side hash join, zero shuffle of the fact table)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# D — aggregations
# ---------------------------------------------------------------------------

@register(
    "d1_status_counts",
    oracle="""
    SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("D1",),
)
def d1_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 status-bucket counts (reference: data_pipeline_settings.py:223-236)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").cast("bigint").alias("n")
    )


@register(
    "d3_sampling_aggregates",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS total_value,
           MAX(value) AS max_value,
           CAST(max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS INT) AS has_error
    FROM events GROUP BY user_id
    """,
    tags=("D3", "D2"),
)
def d3_sampling_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2/D3 per-group means/max/any — the shape of the reference's PDF page
    sampling (decision_agent.py:186-230) and OCR confidence mean."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        F.max("value").alias("max_value"),
        F.max(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("int").alias("has_error"),
    )


@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18, 2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18, 2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18, 4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18, 6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18, 2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(18, 2))) AS DOUBLE) / count(*) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("D1", "D4", "headline"),
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline scan+aggregate (TPC-H Q1 shape): one pass over the fact
    table, partial aggregation map-side, 6 aggregates. DECIMAL accumulation
    for cross-engine bit parity."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(18,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(F.col("l_discount").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").cast("bigint").alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18, 4))) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
    tags=("C3", "E2", "headline"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline 3-way join + top-k (TPC-H Q3 shape). Filters push below the
    joins; customer/orders sides shrink before the fact join; AQE picks
    broadcast for the dimension side. Deterministic tie-break for the LIMIT."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.col("l_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# E — windows / ranking
# ---------------------------------------------------------------------------

@register(
    "e1_chunk_enumeration",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS INT) AS line_index,
           CAST(count(*) OVER (PARTITION BY l_orderkey) AS INT) AS total_lines
    FROM lineitem
    """,
    tags=("E1", "D4"),
)
def e1_chunk_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 per-group dense enumeration + D4 group totals — the relational form
    of the reference's enumerate(chunks)/total_chunks bookkeeping
    (tasks/process_embedding.py:387,463)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    wt = Window.partitionBy("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.row_number().over(w) - 1).cast("int").alias("line_index"),
        F.count("*").over(wt).cast("int").alias("total_lines"),
    )


@register(
    "e2_topk_by_score",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    tags=("E2", "F1"),
)
def e2_topk_by_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/F1 top-k: Spark executes as TakeOrderedAndProject (per-partition
    heap, no global sort) — the plan shape our KNN relies on."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey").asc())
        .limit(25)
    )


# ---------------------------------------------------------------------------
# G — set ops
# ---------------------------------------------------------------------------

@register(
    "g1_union_grant_sources",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("G1",),
)
def g1_union_grant_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 UNION-distinct of two grant sources (reference: permissions.py:66-77)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.union(supp).distinct()


@register(
    "g2_concat_channels",
    oracle="""
    SELECT n.n_nationkey, concat_ws(' > ', r.r_name, n.n_name) AS region_path
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    tags=("G2", "H16"),
)
def g2_concat_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2/H16 channel concatenation — the section-path / context-prefix
    concat shape (reference: context_service.py:99-103)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
        "n_nationkey", F.concat_ws(" > ", "r_name", "n_name").alias("region_path")
    )


# ---------------------------------------------------------------------------
# H — scalar functions / time
# ---------------------------------------------------------------------------

@register(
    "h9_daily_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1
    """,
    tags=("H9",),
)
def h9_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H9 date arithmetic: day-bucket rollup (batch form of a tumbling
    window; the streaming twin lives in streaming/windows.py)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


@register(
    "h_json_extraction",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("H", "extension"),
)
def h_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload extraction (get_json_object) — the props column models
    the reference's free-form Qdrant payload dict."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    )


@register(
    "sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions GROUP BY user_id, session_idx
    """,
    tags=("I", "extension", "headline"),
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min inactivity gap) — batch twin
    of Structured Streaming's session_window (streaming/windows.py). One
    shuffle on user_id shared by both windows and the final groupBy."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(
            lag_ts.isNull() | (F.unix_micros(F.col("ts")) - F.unix_micros(lag_ts) > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = flagged.select(
        "user_id",
        "event_id",
        "ts",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_idx"),
    )
    return sess.groupBy("user_id", F.col("session_idx").cast("bigint").alias("session_idx")).agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "skew_salted_agg",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
    tags=("D1", "skew", "extension"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-key aggregation via two-stage salting (operators/skew.py):
    event_type is low-cardinality (a hot key would serialize on one reducer
    at scale); the salted partial/final plan returns byte-identical results
    to the plain GROUP BY the oracle runs."""
    from frappe_data_pipelines_spark.operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events")
    return salted_aggregate(
        ev, ["event_type"], sum_cols=["value"], buckets=32, salt_on=["event_id"]
    ).withColumnRenamed("sum_value", "sum_value")


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18, 4))) AS DOUBLE)
             AS revenue
    FROM customer c
    JOIN orders o    ON o.o_custkey = c.c_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n    ON n.n_nationkey = s.s_nationkey
    JOIN region r    ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    tags=("C3", "D1", "join"),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way join (TPC-H Q5 shape) — the engine's join-breadth exercise:
    two broadcast dims (nation, region), AQE picks broadcast vs shuffle for
    the rest; revenue accumulates in DECIMAL so the oracle hash is exact."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18, 2))) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18, 2))) > 150
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(b.total_qty AS DOUBLE) AS total_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 100
    """,
    tags=("D4", "E2", "join"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders (TPC-H Q18 shape): aggregate-then-join with a
    HAVING filter — the aggregation runs BEFORE the joins so only qualifying
    orderkeys (a tiny set) reach the join, which AQE then broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "range_join_click_window",
    oracle="""
    SELECT p.event_id AS purchase_id,
           CAST(count(c.event_id) AS BIGINT) AS n_recent_clicks
    FROM events p
    LEFT JOIN events c
      ON c.user_id = p.user_id
     AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 30 MINUTE
     AND c.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
    tags=("join", "range", "extension"),
)
def range_join_click_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join (extended surface — the reference has no join
    executor at all, SURVEY §2.C): clicks in the 30 minutes before each
    purchase, per user. Equi-key (user_id) + range predicate → Spark plans a
    hash/sort-merge join on the key with the range as a join condition, not
    a cartesian product."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    joined = p.join(
        c,
        (F.col("cu") == F.col("pu"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("cts") < F.col("pts")),
        "left",
    )
    return joined.groupBy("purchase_id").agg(
        F.count("click_id").cast("bigint").alias("n_recent_clicks")
    )


@register(
    "cube_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("D1", "cube", "extension"),
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (extended surface; reference has no grouping sets —
    SURVEY §2.D): all 4 grouping combinations in one pass via Spark's
    expand-based cube, matching DuckDB's GROUP BY CUBE."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@register(
    "percentile_price_by_priority",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
           round(quantile_cont(o_totalprice, 0.95), 6) AS p95_price,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("D1", "percentile", "extension"),
)
def percentile_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (extension — no percentile
    anywhere in the reference): Spark `percentile` and DuckDB quantile_cont
    share the linear-interpolation definition. At 100 TB switch to
    approx_percentile (t-digest) — exact percentile needs a per-group sort."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 6).alias("p95_price"),
        F.count("*").cast("bigint").alias("n"),
    )


@register(
    "moments_value_by_type",
    oracle="""
    SELECT event_type,
           round(avg(value), 6) AS mean_value,
           round(stddev_samp(value), 6) AS sd_value,
           round(var_samp(value), 6) AS var_value
    FROM events GROUP BY event_type
    """,
    tags=("D1", "extension"),
)
def moments_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregates per group; 6-dp round absorbs the
    accumulation-order float noise between engines."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.round(F.var_samp("value"), 6).alias("var_value"),
    )


_SQL_API_TEXT = """
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18, 2))) AS DOUBLE) AS total_balance
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
"""


@register("sql_api_parity", oracle=_SQL_API_TEXT, tags=("SQL", "extension"))
def sql_api_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's spark.sql surface: tables registered as views
    (sources/tables.py:register_temp_views), then the IDENTICAL ANSI SQL text
    runs on Spark and on the DuckDB oracle — one query string, two engines,
    one hash."""
    from frappe_data_pipelines_spark.sources.tables import register_temp_views

    register_temp_views(spark, sf_dir, ["customer", "nation"])
    return spark.sql(_SQL_API_TEXT)


@register(
    "moving_avg_order_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(avg(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg_3
    FROM orders
    """,
    tags=("E-ext", "window-frame", "extension"),
)
def moving_avg_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window (extension — SURVEY §2.E notes the reference has no
    rows/range frames): 3-order moving average per customer. Deterministic
    frame via the (date, orderkey) tie-break."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey", "o_orderkey", F.round(F.avg("o_totalprice").over(w), 6).alias("mov_avg_3")
    )


@register(
    "trailing_week_user_value",
    oracle="""
    SELECT event_id, user_id, ts,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW), 6) AS value_7d
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("E-ext", "window-frame", "extension"),
)
def trailing_week_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window over event time: trailing-7-day purchase value per
    user — the hypertable-style rolling aggregate, one shuffle + sort."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-7 * 24 * 3600, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", "ts", F.round(F.sum("value").over(w), 6).alias("value_7d")
    )


@register(
    "tpch_q13_customer_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    tags=("D1", "join", "outer"),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER join
    with a join-side predicate (kept in the ON clause — moving it to WHERE
    would silently turn the join inner), then a two-level aggregation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.filter(F.col("o_orderpriority") != "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").cast("bigint").alias("custdist"))


@register(
    "tpch_q16_supplier_parts",
    oracle="""
    SELECT p.p_type, CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type <> 'PROMO'
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_type
    """,
    tags=("D1", "anti", "distinct-agg"),
)
def tpch_q16_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-count-per-type (TPC-H Q16 shape): NOT IN as a left_anti join
    (null-safe because s_suppkey is a key) + countDistinct — the distinct
    aggregation runs as partial distinct then final, no row explosion."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") != "PROMO")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, p.p_partkey == li.l_partkey)
        .groupBy("p_type")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l.l_partkey, l.l_suppkey,
             min(CAST(l.l_extendedprice AS DECIMAL(18, 2))) AS min_price
      FROM lineitem l GROUP BY l.l_partkey, l.l_suppkey
    ), best AS (
      SELECT l_partkey, min(min_price) AS best_price FROM costs GROUP BY l_partkey
    )
    SELECT c.l_partkey AS p_partkey, c.l_suppkey AS s_suppkey,
           CAST(c.min_price AS DOUBLE) AS price
    FROM costs c JOIN best b
      ON b.l_partkey = c.l_partkey AND c.min_price = b.best_price
    """,
    tags=("join", "correlated"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost supplier per part (TPC-H Q2's correlated-subquery shape,
    decorrelated): aggregate → per-key min → equi-join back. Ties keep every
    minimal supplier, exactly like the correlated form."""
    li = load_table(spark, sf_dir, "lineitem")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("min_price")
    )
    best = costs.groupBy("l_partkey").agg(F.min("min_price").alias("best_price")).withColumnRenamed(
        "l_partkey", "b_partkey"
    )
    return (
        costs.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey")) & (F.col("min_price") == F.col("best_price")),
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
            F.col("min_price").cast("double").alias("price"),
        )
    )


@register(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
           abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
             <= count(DISTINCT user_id) * 0.10 AS approx_within_10pct
    FROM events GROUP BY event_type
    """,
    tags=("D1", "sketch", "extension"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch distinct counting next to the exact form: at 100 TB
    approx_count_distinct replaces the exact distinct's full shuffle with a
    mergeable fixed-size sketch. Each engine runs its own sketch; the hashed
    contract is exact count + an accuracy flag (sketches differ across
    engines by design, their guarantees don't). The sketch runs at rsd=0.01
    and the flag asserts 10% — a ~10-sigma margin, so the boolean is stable
    at every scale factor (the old default-rsd/5%-band pairing flipped at
    sf0.1, where Spark's default sketch strayed past 5% on 1500 users)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact"),
        (
            F.abs(F.approx_count_distinct("user_id", 0.01) - F.countDistinct("user_id"))
            <= F.countDistinct("user_id") * 0.10
        ).alias("approx_within_10pct"),
    )


@register(
    "full_outer_nation_reconciliation",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT coalesce(c.nk, s.nk) AS nationkey,
           CAST(coalesce(c.n_cust, 0) AS BIGINT) AS n_customers,
           CAST(coalesce(s.n_supp, 0) AS BIGINT) AS n_suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    tags=("join", "outer", "extension"),
)
def full_outer_nation_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation of two aggregates — the audit-join shape
    (which side is missing rows?). Aggregates BEFORE the join, so the outer
    join touches nation-count rows, not raw tables."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, c.c_nk == s.s_nk, "full_outer").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).cast("bigint").alias("n_customers"),
        F.coalesce("n_supp", F.lit(0)).cast("bigint").alias("n_suppliers"),
    )


@register(
    "edit_distance_types",
    oracle="""
    WITH t AS (SELECT DISTINCT p_type FROM part)
    SELECT a.p_type AS type_a, b.p_type AS type_b,
           CAST(levenshtein(a.p_type, b.p_type) AS INT) AS dist
    FROM t a JOIN t b ON a.p_type < b.p_type
    """,
    tags=("H-ext", "fuzzy", "extension"),
)
def edit_distance_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Levenshtein distance over the distinct type vocabulary —
    fuzzy matching as a JVM builtin (no UDF); at corpus scale the same
    expression runs after a blocking join keeps the pair count bounded."""
    t = load_table(spark, sf_dir, "part").select("p_type").distinct()
    a, b = t.alias("a"), t.alias("b")
    return (
        a.join(b, F.col("a.p_type") < F.col("b.p_type"))
        .select(
            F.col("a.p_type").alias("type_a"),
            F.col("b.p_type").alias("type_b"),
            F.levenshtein(F.col("a.p_type"), F.col("b.p_type")).cast("int").alias("dist"),
        )
    )


@register(
    "outlier_events_p99",
    oracle="""
    WITH thresholds AS (
      SELECT event_type, quantile_cont(value, 0.99) AS p99
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value, round(t.p99, 6) AS p99
    FROM events e JOIN thresholds t ON t.event_type = e.event_type
    WHERE e.value > round(t.p99, 6)
    """,
    tags=("D1", "percentile", "extension"),
)
def outlier_events_p99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantile-threshold outlier filter (anomalous spend /
    oversized-document screening): compute p99 per type once (tiny
    broadcast), join back, keep exceeders. At 100 TB the threshold table
    stays a broadcast; only the scan is full-size."""
    ev = load_table(spark, sf_dir, "events")
    thresholds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.99)").alias("p99")
    )
    return (
        ev.join(F.broadcast(thresholds), "event_type")
        # round the threshold before comparing: interpolated quantiles can
        # differ by an ulp between engines, and a borderline row must not
        # flip the oracle hash
        .filter(F.col("value") > F.round("p99", 6))
        .select("event_id", "event_type", "value", F.round("p99", 6).alias("p99"))
    )


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    tags=("C1", "D1", "exists"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape, dates adapted to the
    generated data): correlated EXISTS as a LEFT SEMI join with a
    cross-table predicate in the join condition — Catalyst pushes the date
    filter into the orders scan before the semi join runs."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("order_count")
    )


@register(
    "topk_customers_per_nation",
    oracle="""
    WITH ranked AS (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
      FROM customer
    )
    SELECT c_nationkey, c_custkey, c_acctbal, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3
    """,
    tags=("E2", "window", "extension"),
)
def topk_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k PER GROUP (vs the global TakeOrderedAndProject): windowed
    row_number + filter. Spark pushes the rk<=3 predicate into the window
    stage (WindowGroupLimit), so each group materializes only its top rows."""
    from pyspark.sql.window import Window

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.col("c_custkey").asc())
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", F.col("rk").cast("int").alias("rk"))
    )


@register(
    "event_funnel_stages",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT user_id, t_signup, t_click, t_purchase,
           CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                     AND t_purchase > t_click THEN 'converted'
                WHEN t_signup IS NOT NULL AND t_click > t_signup THEN 'engaged'
                WHEN t_signup IS NOT NULL THEN 'signed_up'
                ELSE 'anonymous' END AS funnel_stage
    FROM per_user
    """,
    tags=("D1", "funnel", "extension"),
)
def event_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (signup → click → purchase in order): first timestamp
    per stage via conditional mins in ONE aggregation pass, then ordering
    logic — no self-joins, one shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    stage = (
        F.when(
            F.col("t_signup").isNotNull()
            & (F.col("t_click") > F.col("t_signup"))
            & (F.col("t_purchase") > F.col("t_click")),
            "converted",
        )
        .when(F.col("t_signup").isNotNull() & (F.col("t_click") > F.col("t_signup")), "engaged")
        .when(F.col("t_signup").isNotNull(), "signed_up")
        .otherwise("anonymous")
    )
    return per_user.select("user_id", "t_signup", "t_click", "t_purchase", stage.alias("funnel_stage"))


@register(
    "weekly_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(floor(date_diff('day', f.cohort_week, date_trunc('week', e.ts)) / 7) AS INT)
               AS week_offset
      FROM events e JOIN firsts f ON f.user_id = e.user_id
    )
    SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_users
    FROM activity GROUP BY cohort_week, week_offset
    """,
    tags=("D1", "cohort", "extension"),
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity week,
    counted per week-offset they return — two aggregations + one broadcast
    join on the (small) per-user cohort map; both engines truncate weeks to
    ISO Monday."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").cast("bigint").alias("n_users")
    )


_PROFILE_COLS = ("o_totalprice", "o_custkey")


@register(
    "table_profile",
    oracle="""
    SELECT 'o_totalprice' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(o_totalprice) AS BIGINT) AS n_null,
           CAST(count(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
           CAST(min(o_totalprice) AS DOUBLE) AS min_v,
           CAST(max(o_totalprice) AS DOUBLE) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(min(o_custkey) AS DOUBLE),
           CAST(max(o_custkey) AS DOUBLE)
    FROM orders
    """,
    tags=("D", "profiling", "extension"),
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling — the data-quality first step of any pipeline
    onboarding a new 100 TB source: rows/nulls/distinct/min/max per column.
    All columns' aggregates run in ONE scan (a single agg projecting every
    metric), then unpivot to long form driver-side via unionByName of
    1-row selects — no second pass, unlike per-column describe() loops."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count("*").cast("bigint").alias(f"{c}__n"),
            (F.count("*") - F.count(c)).cast("bigint").alias(f"{c}__null"),
            F.countDistinct(c).cast("bigint").alias(f"{c}__dist"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    parts = [
        wide.select(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__null").alias("n_null"),
            F.col(f"{c}__dist").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_v"),
            F.col(f"{c}__max").alias("max_v"),
        )
        for c in _PROFILE_COLS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_GROUPING_SETS_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_prio
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority), ())
"""


@register("grouping_sets_order_stats", oracle=_GROUPING_SETS_SQL, tags=("D", "SQL", "extension"))
def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond cube/rollup, which have their own
    queries): four grouping combinations in ONE aggregation pass with
    grouping() flags disambiguating the NULL placeholder rows. Same SQL
    text runs on both engines (the DataFrame API only exposes cube/rollup;
    GROUPING SETS is the SQL surface's job)."""
    from frappe_data_pipelines_spark.sources.tables import register_temp_views

    register_temp_views(spark, sf_dir, ["orders"])
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "events_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('day', min(ts)) AS d0 FROM events
    ), hours AS (
      SELECT unnest(generate_series(d0, d0 + INTERVAL 23 HOUR, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
    ), grid AS (
      SELECT t.event_type, h.hour FROM types t CROSS JOIN hours h
    ), actual AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS n
      FROM events, bounds
      WHERE ts < d0 + INTERVAL 24 HOUR
      GROUP BY 1, 2
    )
    SELECT g.event_type, g.hour, coalesce(a.n, 0) AS n
    FROM grid g LEFT JOIN actual a
      ON a.event_type = g.event_type AND a.hour = g.hour
    """,
    tags=("H9", "time-series", "extension"),
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification: a complete (event_type x hour) grid for
    the first day, zero-filled where no events landed — the gap-fill shape
    every metrics rollup needs before windowed math. The grid comes from
    sequence()+explode (no driver loop); the left join is broadcast (grid
    is tiny relative to the fact side at scale)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.date_trunc("day", F.min("ts")).alias("d0"))
    hours = bounds.select(
        F.explode(
            F.sequence(
                F.col("d0"),
                F.col("d0") + F.expr("INTERVAL 23 HOURS"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(hours))
    actual = (
        ev.join(F.broadcast(bounds))
        .filter(F.col("ts") < F.col("d0") + F.expr("INTERVAL 24 HOURS"))
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return (
        grid.join(actual.withColumnRenamed("event_type", "a_type").withColumnRenamed("hour", "a_hour"),
                  (F.col("a_type") == grid.event_type) & (F.col("a_hour") == grid.hour), "left")
        .select(grid.event_type, grid.hour, F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n"))
    )


@register(
    "events_topk_per_user",
    oracle="""
    SELECT user_id, rnk, event_id, event_type, value
    FROM (
      SELECT user_id, event_id, event_type, value,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id ASC
             ) AS INT) AS rnk
      FROM events
    )
    WHERE rnk <= 3
    """,
    tags=("E2", "event-time", "extension"),
)
def events_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key top-k (E2 generalized from global to per-group): each user's
    3 highest-value events with a full deterministic tie-break (value DESC,
    event_id ASC). One shuffle on user_id; Spark evaluates the rank with a
    running WindowGroupLimit / partial top-k per partition before the
    shuffle where the optimizer supports it, so the full per-user sort
    never materializes at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.select(
            "user_id", "event_id", "event_type", "value",
            F.row_number().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
        .select("user_id", "rnk", "event_id", "event_type", "value")
    )


@register(
    "event_funnel_view_click_purchase",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
           s3.t3 IS NOT NULL AS completed,
           CASE WHEN s3.t3 IS NOT NULL
                THEN CAST(floor(epoch(s3.t3 - s1.t1)) AS BIGINT) END AS funnel_sec
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    """,
    tags=("E", "event-time", "extension"),
)
def event_funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel over event time: per user, the earliest view, the
    earliest click strictly after it, the earliest purchase strictly after
    that — partial funnels kept via left joins, completion time in seconds.
    Three keyed min-aggregations and two user-keyed joins: every stage
    shuffles on user_id only, so the stages share one partitioning at scale
    (no re-shuffle under AQE); no window over the raw stream is needed."""
    ev = load_table(spark, sf_dir, "events")
    s1 = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t1"))
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id", "t1", "t2", "t3",
            F.col("t3").isNotNull().alias("completed"),
            F.when(
                F.col("t3").isNotNull(),
                F.floor(
                    (F.unix_micros("t3") - F.unix_micros("t1")) / 1_000_000
                ).cast("bigint"),
            ).alias("funnel_sec"),
        )
    )


@register(
    "cohort_weekly_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(datediff('day', f.cohort_week,
                           CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INT)
               AS week_offset
      FROM events e JOIN first_seen f USING (user_id)
    )
    SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_users
    FROM activity GROUP BY 1, 2
    """,
    tags=("D", "event-time", "extension"),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users cohorted by first-seen ISO week; per
    (cohort, week-offset) distinct-active-user counts — the standard
    retention triangle. Two user-keyed shuffles (first-seen min, then the
    distinct) plus one broadcastable join of the per-user cohort map; the
    triangle itself is tiny at any corpus scale."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")).cast("date"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count("*").cast("bigint").alias("n_users")
    )
