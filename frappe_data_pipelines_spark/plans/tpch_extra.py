"""TPC-H-shape battery, part 2 (Q6-Q22 shapes over the reduced star schema).

The reference has no SQL surface at all (SURVEY §2.C: every "join" is a
subquery or a Python zip), so this module is extended surface: it proves the
engine handles the full classical analytics join/agg/subquery repertoire that
a user migrating a 100 TB warehouse workload would expect. The testdata star
omits ``partsupp`` and several columns (shipmode, receiptdate, container,
phone), so Q9/Q11/Q12/Q19-Q22 are adapted shapes preserving each query's
*plan* structure (the part that matters for Catalyst): disjunctive join
predicates, scalar-subquery thresholds, nested aggregation, EXISTS/NOT-EXISTS
rewritten as aggregate flags, anti-joins.

Parity rules as in relational.py: DECIMAL accumulation cast back to DOUBLE,
ratios rounded to 6 dp on both sides, counts cast BIGINT, full tie-breaks on
every LIMIT.

Scale notes (100 TB stance):
  * nation/region/supplier/part are broadcast — lineitem/orders never
    shuffle for dimension lookups;
  * agg-before-join wherever the aggregate collapses the fact table
    (Q15, Q17, Q20, Q21) so the big shuffle happens on the reduced set;
  * correlated EXISTS/NOT EXISTS become one-pass conditional aggregates
    per group instead of per-row re-scans (Q21);
  * scalar-subquery thresholds (Q11, Q14, Q17, Q22) are single-row
    broadcast cross-joins, not driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.plans.catalog import register
from frappe_data_pipelines_spark.sources.tables import load_table


def _dec(col: F.Column, scale: int = 4) -> F.Column:
    return col.cast(f"decimal(18,{scale})")


def _revenue() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18, 4))) AS DOUBLE)
             AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    tags=("D1", "B", "tpch"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate. The whole plan is one parquet
    scan with all three predicates pushed down + a partial/final sum — the
    shape Catalyst compiles to a single WholeStageCodegen stage; at 100 TB
    this is embarrassingly parallel with zero shuffle beyond the 1-row agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec(F.col("l_extendedprice") * F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18, 4))) AS DOUBLE)
             AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS INT)
    """,
    tags=("C3", "join", "tpch"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by ship year.
    Both nation aliases broadcast; the nation-pair disjunction lands on the
    joined row AFTER two broadcast hash joins, so the two fact tables only
    shuffle once each (orderkey). At scale the nation filter could be pushed
    into supplier/customer before the fact join — Catalyst does exactly that
    via predicate inference on the broadcast sides."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(s, s.s_suppkey == F.col("l_suppkey"))
        .join(o, o.o_orderkey == F.col("l_orderkey"))
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("n1_key") == s.s_nationkey)
        .join(F.broadcast(n2), F.col("n2_key") == c.c_nationkey)
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    WITH all_nations AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18, 4)) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    """,
    tags=("C3", "join", "tpch"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share — the widest join in the battery
    (8 tables). part/supplier/nation×2/region broadcast; only
    lineitem⋈orders⋈customer shuffle. Both DECIMAL sums are exact, so the
    Spark/DuckDB ratio is the same double and round(,6) is hash-stable."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    vol = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(p), p.p_partkey == F.col("l_partkey"))
        .join(o, o.o_orderkey == F.col("l_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(c, c.c_custkey == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n1_region"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         - 0.01 * p.p_retailprice * l.l_quantity AS DECIMAL(18, 4))) AS DOUBLE)
             AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%green%'
    GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
    """,
    tags=("C3", "join", "tpch"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for parts
    matching a name substring. The testdata has no partsupp, so supply cost
    is proxied at 1% of retail price — the plan shape (LIKE-filtered part
    broadcast into lineitem, profit expression, two-key rollup) is what Q9
    exercises. The LIKE filter cannot push to parquet as a range but prunes
    via the broadcast join on partkey."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%green%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = _dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.01 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, o.o_orderkey == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18, 4))) AS DOUBLE)
             AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
    tags=("C3", "E2", "join", "tpch"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in a quarter.
    The orderdate filter prunes orders before the lineitem join; the final
    top-20 is TakeOrderedAndProject (no full sort). Tie-break on custkey
    keeps the LIMIT deterministic for the oracle hash."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(li.filter(F.col("l_returnflag") == "R"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, c.c_custkey == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "tpch_q11_important_stock",
    oracle="""
    WITH pv AS (
      SELECT l.l_partkey,
             sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18, 4))) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
    FROM pv
    WHERE val > (SELECT sum(val) * 0.001 FROM pv)
    ORDER BY part_value DESC, l_partkey ASC
    """,
    tags=("D1", "subquery", "tpch"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (no partsupp → lineitem value share): parts whose
    traded value within a nation group exceeds 0.1% of the group total.
    The scalar-subquery threshold is a 1-row DataFrame cross-joined
    (broadcast) onto the aggregate — no driver collect, no second scan of
    lineitem: pv is computed once and reused for both sides via cache().
    DECIMAL comparison on both engines is exact."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    pv = (
        li.join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_revenue()).alias("val"))
    )
    pv = pv.cache()
    threshold = pv.agg((F.sum("val") * F.lit(0.001)).alias("thr"))
    return (
        pv.join(F.broadcast(threshold))
        .filter(F.col("val") > F.col("thr"))
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), F.col("l_partkey").asc())
    )


@register(
    "tpch_q12_late_shipment_priority",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
    tags=("D1", "join", "tpch"),
)
def tpch_q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (no shipmode/receiptdate → late = shipped ≥30 days
    after order date): priority-class line counts among late shipments,
    by line status. The cross-table date predicate evaluates after the
    orderkey join; the shipdate year-range still pushes into the scan."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_effect",
    oracle="""
    SELECT round(
             100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18, 4))
                              ELSE CAST(0 AS DECIMAL(18, 4)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18, 4))) AS DOUBLE),
             6) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01' AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
    tags=("D1", "join", "tpch"),
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share for one month. part broadcasts into
    the month-pruned lineitem scan; one conditional + one plain DECIMAL sum
    share a single aggregation pass."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(F.broadcast(p), p.p_partkey == F.col("l_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                ).cast("double")
                / F.sum(_revenue()).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18, 4))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s.s_suppkey
    """,
    tags=("D1", "subquery", "tpch"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue. The revenue CTE is
    computed once (cached), its max broadcast back as a 1-row join — the
    view-reuse pattern Q15 is designed to test. DECIMAL equality avoids the
    float-max tie hazard."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue()).alias("total_revenue"))
        .cache()
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), s.s_suppkey == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q17_small_qty_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18, 2))) AS DOUBLE) / 7.0, 6)
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_thr
          FROM lineitem GROUP BY l_partkey) t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11' AND l.l_quantity < t.qty_thr
    """,
    tags=("D1", "subquery", "tpch"),
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from small-quantity orders of one brand. The
    correlated `avg per part` subquery becomes an aggregate-then-join
    (computed over ALL parts once, joined on partkey) — at 100 TB this is
    one extra shuffle on partkey versus a per-row re-scan in the naive
    plan. Quantities are integral doubles, so the avg is exact and the
    threshold comparison is deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    thr = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thr")
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(thr, F.col("t_partkey") == li.l_partkey)
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0, 6
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18, 4))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#18' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    tags=("B", "join", "tpch"),
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides — the
    classic test that the optimizer still uses the equi-join on partkey and
    evaluates the disjunction as a post-join filter (not a cartesian
    product), while extracting the common `p_brand IN (...)` implied
    predicate to prune the broadcast side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#18")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(
            F.broadcast(p.filter(F.col("p_brand").isin("Brand#12", "Brand#15", "Brand#18"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .filter(cond)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q20_excess_shippers",
    oracle="""
    WITH sq AS (
      SELECT l.l_suppkey, l.l_partkey,
             CAST(sum(CAST(l.l_quantity AS DECIMAL(18, 2))) AS DOUBLE) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'PROMO'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l.l_suppkey, l.l_partkey
    ), pa AS (
      SELECT l_partkey, avg(qty) AS avg_qty FROM sq GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN sq ON sq.l_suppkey = s.s_suppkey
    JOIN pa ON pa.l_partkey = sq.l_partkey
    WHERE sq.qty > 1.5 * pa.avg_qty
    ORDER BY s.s_suppkey
    """,
    tags=("D1", "subquery", "join", "tpch"),
)
def tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (no partsupp → shipped-quantity version): suppliers
    who shipped >1.5× the per-part average of PROMO parts in 1997. Nested
    aggregation: per-(supplier,part) sums roll up to per-part averages,
    which broadcast back onto the first aggregate — both aggregates reuse
    the same shuffle-by-partkey partitioning. Sums are integral-valued, so
    avg and the 1.5× comparison are float-exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    sq = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"))
        .cache()
    )
    pa = sq.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(F.avg("qty").alias("avg_qty"))
    return (
        sq.join(pa, F.col("pa_partkey") == sq.l_partkey)
        .filter(F.col("qty") > 1.5 * F.col("avg_qty"))
        .join(F.broadcast(s), s.s_suppkey == sq.l_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q21_waiting_orders",
    oracle="""
    WITH flagged AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ), per_supp AS (
      SELECT l_orderkey, l_suppkey, max(late) AS supp_late
      FROM flagged GROUP BY l_orderkey, l_suppkey
    ), per_order AS (
      SELECT l_orderkey,
             CAST(count(*) AS INT) AS n_supp,
             CAST(sum(supp_late) AS INT) AS n_late_supp
      FROM per_supp GROUP BY l_orderkey
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM per_supp ps
    JOIN per_order po ON po.l_orderkey = ps.l_orderkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE ps.supp_late = 1 AND po.n_supp > 1 AND po.n_late_supp = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name ASC
    LIMIT 25
    """,
    tags=("D1", "join", "subquery", "tpch"),
)
def tpch_q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (late = shipped >60 days after order date): suppliers
    who were the SOLE late supplier on a finalized multi-supplier order.
    The reference EXISTS / NOT EXISTS pair is rewritten as one aggregation
    cascade — per-(order,supplier) lateness, per-order supplier/late counts
    — so the fact table is scanned once instead of three times; all three
    aggregates share the orderkey shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    flagged = li.join(o, o.o_orderkey == li.l_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        F.when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
        )
        .otherwise(0)
        .alias("late"),
    )
    # per_supp feeds BOTH the late-rows branch and the per-order rollup;
    # without cache() Spark would recompute the lineitem⋈orders subtree
    # twice (verified via tools/plan_audit.py single_fact_scan)
    per_supp = (
        flagged.groupBy("l_orderkey", "l_suppkey").agg(F.max("late").alias("supp_late")).cache()
    )
    per_order = per_supp.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count("*").cast("int").alias("n_supp"),
        F.sum("supp_late").cast("int").alias("n_late_supp"),
    )
    return (
        per_supp.filter(F.col("supp_late") == 1)
        .join(
            per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
            F.col("po_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(s), s.s_suppkey == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.col("s_name").asc())
        .limit(25)
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH eligible AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
    ), thr AS (
      SELECT round(avg(c_acctbal), 2) AS avg_bal FROM eligible WHERE c_acctbal > 0.0
    )
    SELECT e.c_nationkey AS cntry, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(e.c_acctbal AS DECIMAL(18, 2))) AS DOUBLE) AS totacctbal
    FROM eligible e, thr
    WHERE e.c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = e.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY e.c_nationkey
    ORDER BY cntry
    """,
    tags=("C2", "subquery", "tpch"),
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (nationkey stands in for the phone country code):
    high-balance customers from seven nations with no recent orders.
    Anti-join against date-pruned orders + a broadcast scalar threshold.
    The avg threshold is rounded to 2 dp before comparing — the ulp-safe
    pattern (SURVEY §7 hard spot (d)) that keeps the boundary set identical
    across engines regardless of float summation order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    eligible = c.filter(F.col("c_nationkey").isin(0, 1, 2, 3, 4, 5, 6)).select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    thr = eligible.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("avg_bal")
    )
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")).select(
        "o_custkey"
    )
    return (
        eligible.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntry")
    )


@register(
    "tpch_q13_nonurgent_order_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) dist
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("C3", "D1", "tpch"),
)
def tpch_q13_nonurgent_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (o_orderpriority filter stands in for the missing
    o_comment NOT LIKE): how many customers placed 0, 1, 2, ... non-urgent
    orders.  The classic double aggregation over a left outer join — the
    outer join preserves order-less customers so the 0 bucket is real.  At
    scale: count(o_orderkey) per custkey partial-aggregates map-side after
    the join; the second groupBy is over ~50 distinct counts, a trivial
    shuffle.  The filter lives in the join condition (not a WHERE), which
    both engines honor as outer-join semantics."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q2_region_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l.l_partkey, l.l_suppkey,
             sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18, 4)))
               AS supply_value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY l.l_partkey, l.l_suppkey
    ), best AS (
      SELECT l_partkey, min(supply_value) AS min_value FROM cost GROUP BY l_partkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand, p.p_type,
           CAST(c.supply_value AS DOUBLE) AS supply_value
    FROM cost c
    JOIN best b ON b.l_partkey = c.l_partkey AND c.supply_value = b.min_value
    JOIN part p ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size <= 15 AND p.p_type = 'LARGE'
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    tags=("C3", "subquery", "tpch"),
)
def tpch_q2_region_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (no partsupp: the part↔supplier relation and its cost
    are derived from lineitem — supply_value = the supplier's total traded
    value for that part, an exact DECIMAL so the min-equality join is
    bit-stable on both engines): for each EUROPE-sourced part of one
    size/type class, the supplier(s) with the minimum supply value.  The
    correlated min subquery is groupBy-then-self-equi-join on
    (partkey, min) — the standard decorrelation.  Scale: cost is one
    shuffle of lineitem by (partkey, suppkey) after broadcast dim pruning;
    best reuses cost (cached) so lineitem is scanned once; part/supplier/
    nation joins broadcast.  LIMIT has a full tie-break chain (s_name and
    p_partkey make the order total)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    eu_supp = (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey")
    )
    cost = (
        li.join(F.broadcast(eu_supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_revenue()).alias("supply_value"))
        .cache()
    )
    best = cost.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("supply_value").alias("min_value")
    )
    return (
        cost.join(
            best,
            (F.col("b_partkey") == F.col("l_partkey"))
            & (F.col("supply_value") == F.col("min_value")),
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "p_type",
            F.col("supply_value").cast("double").alias("supply_value"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    tags=("C2", "D1", "tpch"),
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem is the part↔supplier relation; negative
    account balance stands in for the complaints NOT IN): how many distinct
    suppliers serve each surviving (brand, type, size) bucket.  NOT IN over
    a key with no NULLs is a broadcast anti-join; count(DISTINCT) Catalyst
    expands to a two-phase aggregate (distinct-by-key then count) so the
    shuffle carries (brand, type, size, suppkey) pairs, not row
    multiplicities — the plan that survives skewed popular parts."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )
