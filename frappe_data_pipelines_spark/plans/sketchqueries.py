"""Sketch-backed catalog queries (beyond-reference training-data extensions).

Both queries are EXACT DuckDB oracles: the sketches are deterministic
relational constructions over the portable md5 hash family, so the oracle
rebuilds the identical bitmap / counter grid in SQL and every output value
must match bit-for-bit — including the false positives and overcounts,
which is precisely what makes the one-sided error guarantees auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.operators.sketches import (
    bloom_bitmap,
    bloom_maybe_member,
    cms_cells,
    cms_estimates,
)
from frappe_data_pipelines_spark.plans.catalog import register
from frappe_data_pipelines_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Bloom-filter incremental dedup
# ---------------------------------------------------------------------------

_BLOOM_M = 1 << 14
_BLOOM_K = 4

_BLOOM_SQL = f"""
    WITH hist AS (
      SELECT DISTINCT text FROM documents WHERE doc_id % 4 <> 0
    ), inc AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id % 4 = 0 OR doc_id % 20 = 1
    ), ks AS (SELECT unnest(generate_series(0, {_BLOOM_K - 1})) AS i),
    hh AS (
      SELECT CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) % {_BLOOM_M} AS h1,
             CAST(('0x' || substring(md5(text || '#b2'), 1, 15)) AS BIGINT) % {_BLOOM_M} AS h2
      FROM hist
    ), hpos AS (
      SELECT DISTINCT (h1 + ks.i * h2) % {_BLOOM_M} AS pos FROM hh CROSS JOIN ks
    ), words AS (
      SELECT pos // 32 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
      FROM hpos GROUP BY 1
    ), ih AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) % {_BLOOM_M} AS h1,
             CAST(('0x' || substring(md5(text || '#b2'), 1, 15)) AS BIGINT) % {_BLOOM_M} AS h2
      FROM inc
    ), ipos AS (
      SELECT doc_id, (h1 + ks.i * h2) % {_BLOOM_M} AS pos FROM ih CROSS JOIN ks
    ), flags AS (
      SELECT p.doc_id,
             bool_and((coalesce(w.bits, 0) & (CAST(1 AS BIGINT) << CAST(p.pos % 32 AS INT))) <> 0)
               AS maybe_dup
      FROM ipos p LEFT JOIN words w ON p.pos // 32 = w.word
      GROUP BY p.doc_id
    ), truth AS (
      SELECT doc_id, text IN (SELECT text FROM hist) AS true_dup FROM inc
    )
    SELECT f.doc_id, f.maybe_dup, t.true_dup
    FROM flags f JOIN truth t USING (doc_id)
    ORDER BY f.doc_id
"""


@register("bloom_incremental_dedup", oracle=_BLOOM_SQL, tags=("dedup", "sketch", "extension"))
def bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup against a historical corpus WITHOUT joining
    the history: the history (docs with doc_id % 4 ≠ 0) compresses to a
    2 KiB Bloom bitmap; the incoming batch — genuinely-new docs
    (doc_id % 4 = 0) plus re-crawled history docs (doc_id % 20 = 1) —
    probes the broadcast bitmap. Output per incoming doc: the bloom verdict
    and the exact truth, so the one-sided-error contract is visible in the
    result (true_dup ⇒ maybe_dup, never the reverse implication).

    At 100 TB: the bitmap build is a linear scan with a map-side bit_or
    partial agg (shuffle carries ≤ m/32 rows/partition); the probe side
    never shuffles the history at all — only rows the filter flags proceed
    to the exact confirm join, which is the entire point of the sketch."""
    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 4 != 0).select("text").distinct()
    inc = docs.filter((F.col("doc_id") % 4 == 0) | (F.col("doc_id") % 20 == 1)).select(
        "doc_id", "text"
    )
    bitmap = bloom_bitmap(hist, "text", _BLOOM_M, _BLOOM_K)
    flags = bloom_maybe_member(
        inc, bitmap, "text", "doc_id", _BLOOM_M, _BLOOM_K, out_col="maybe_dup"
    )
    truth = inc.join(hist.withColumnRenamed("text", "t"), inc["text"] == F.col("t"), "left").select(
        "doc_id", F.col("t").isNotNull().alias("true_dup")
    )
    return (
        flags.join(truth, "doc_id")
        .select("doc_id", "maybe_dup", "true_dup")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 256

_CMS_SQL = f"""
    WITH ev AS (
      SELECT CAST(user_id AS VARCHAR) AS k FROM events WHERE user_id IS NOT NULL
    ), ks AS (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS i),
    cells AS (
      SELECT ks.i AS row_i,
             CAST(('0x' || substring(md5(k || '#r' || CAST(ks.i AS VARCHAR)), 1, 15)) AS BIGINT)
               % {_CMS_W} AS col_i,
             CAST(count(*) AS BIGINT) AS cnt
      FROM ev CROSS JOIN ks
      GROUP BY 1, 2
    ), exact AS (
      SELECT k, CAST(count(*) AS BIGINT) AS exact_cnt FROM ev GROUP BY k
    ), est AS (
      SELECT e.k, min(c.cnt) AS cms_est
      FROM (SELECT DISTINCT k FROM ev) e
      CROSS JOIN ks
      JOIN cells c
        ON c.row_i = ks.i
       AND c.col_i = CAST(('0x' || substring(md5(e.k || '#r' || CAST(ks.i AS VARCHAR)), 1, 15)) AS BIGINT)
                     % {_CMS_W}
      GROUP BY e.k
    )
    SELECT x.k AS user_key, x.exact_cnt, e.cms_est,
           e.cms_est - x.exact_cnt AS overcount
    FROM exact x JOIN est e ON x.k = e.k
    ORDER BY x.exact_cnt DESC, user_key
    LIMIT 15
"""


@register("heavy_hitters_cms", oracle=_CMS_SQL, tags=("agg", "sketch", "extension"))
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for event users, compared
    against exact counts (top 15 by exact count, deterministic tie-break).
    The ``overcount`` column is the sketch's one-sided error, ≥ 0 by
    construction on every row.

    At 100 TB: the 4×256 grid partial-aggregates map-side into ≤1024 cells
    regardless of user cardinality, merges across partitions/streams/days
    (pure counter addition), and broadcasts for the estimate join — the
    exact groupBy here exists only to audit the estimates at test scale."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    keyed = ev.select(F.col("user_id").cast("string").alias("user_key"))
    cells = cms_cells(keyed, "user_key", _CMS_D, _CMS_W)
    exact = keyed.groupBy("user_key").agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
    est = cms_estimates(keyed.distinct(), cells, "user_key", _CMS_D, _CMS_W)
    return (
        exact.join(est, "user_key")
        .select(
            "user_key",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.col("exact_cnt").desc(), "user_key")
        .limit(15)
    )
