"""Sketch-backed catalog queries (beyond-reference training-data extensions).

Every query here is an EXACT DuckDB oracle: the sketches are deterministic
relational constructions over the portable md5 hash family, so the oracle
rebuilds the identical bitmap / counter grid / register table / priority
ranking in SQL and every output value must match bit-for-bit — including
the false positives, overcounts and estimate errors, which is precisely
what makes the one-sided error guarantees auditable. Float discipline:
integer accumulation wherever a sum exists (bit_or words, counter cells,
the HLL indicator sum as int64), literal-embedded constants for multiply
chains, IEEE-exactly-rounded single divides for ordering keys — the only
transcendental anywhere is the one ln() in HLL's linear-counting branch,
rounded to 6 places on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.operators.sketches import (
    bloom_bitmap,
    bloom_maybe_member,
    cms_cells,
    cms_estimates,
    hll_estimate,
    hll_registers,
    priority_sample,
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
      SELECT DISTINCT text FROM documents WHERE doc_id % 4 <> 0 AND text IS NOT NULL
    ), inc AS (
      SELECT doc_id, text FROM documents
      WHERE (doc_id % 4 = 0 OR doc_id % 20 = 1) AND text IS NOT NULL
    ), ks AS (SELECT unnest(generate_series(0, {_BLOOM_K - 1})) AS i),
    hh AS (
      SELECT CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) % {_BLOOM_M} AS h1,
             (CAST(('0x' || substring(md5(text || '#b2'), 1, 15)) AS BIGINT) % {_BLOOM_M - 1}) + 1 AS h2
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
             (CAST(('0x' || substring(md5(text || '#b2'), 1, 15)) AS BIGINT) % {_BLOOM_M - 1}) + 1 AS h2
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
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
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


# ---------------------------------------------------------------------------
# HyperLogLog distinct count (from-scratch relational registers)
# ---------------------------------------------------------------------------

_HLL_M = 256
_HLL_RHO_MAX = 53  # 60-bit hash, 8 bucket bits → 52-bit rank field + 1
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / _HLL_M)
# the full multiply chain is precomputed in Python and literal-embedded on
# BOTH sides, so neither engine re-associates the float arithmetic
_HLL_NUMER = _HLL_ALPHA * _HLL_M * _HLL_M * float(1 << _HLL_RHO_MAX)
_HLL_SMALL = 2.5 * _HLL_M

_HLL_SQL = f"""
    WITH ev AS (
      SELECT CAST(user_id AS VARCHAR) AS k FROM events WHERE user_id IS NOT NULL
    ), hh AS (
      SELECT CAST(('0x' || substring(md5(k), 1, 15)) AS BIGINT) AS h FROM ev
    ), regs AS (
      SELECT CAST(h % {_HLL_M} AS INT) AS bucket,
             max(CASE WHEN h // {_HLL_M} = 0 THEN {_HLL_RHO_MAX}
                      ELSE {_HLL_RHO_MAX} - length(bin(h // {_HLL_M})) END) AS m_j
      FROM hh GROUP BY 1
    ), agg AS (
      SELECT CAST(coalesce(sum(CAST(1 AS BIGINT) << CAST({_HLL_RHO_MAX} - m_j AS INT)), 0)
                  AS BIGINT) AS s_present,
             CAST(count(*) AS INT) AS nonzero_registers
      FROM regs
    ), calc AS (
      SELECT nonzero_registers,
             CAST({_HLL_NUMER!r} AS DOUBLE)
               / CAST(s_present + CAST({_HLL_M} - nonzero_registers AS BIGINT)
                      * (CAST(1 AS BIGINT) << {_HLL_RHO_MAX}) AS DOUBLE) AS raw,
             CASE WHEN nonzero_registers < {_HLL_M}
                  THEN CAST({_HLL_M} AS DOUBLE)
                       * ln(CAST({_HLL_M} AS DOUBLE)
                            / CAST({_HLL_M} - nonzero_registers AS DOUBLE))
             END AS lin
      FROM agg
    ), est AS (
      SELECT nonzero_registers,
             round(raw, 6) AS raw_hll_est,
             round(lin, 6) AS linear_est,
             round(CASE WHEN raw <= CAST({_HLL_SMALL!r} AS DOUBLE) AND lin IS NOT NULL
                        THEN lin ELSE raw END, 6) AS hll_est
      FROM calc
    ), ex AS (
      SELECT CAST(count(DISTINCT k) AS BIGINT) AS exact_distinct FROM ev
    )
    SELECT ex.exact_distinct, est.nonzero_registers, est.raw_hll_est,
           est.linear_est, est.hll_est,
           round(abs(est.hll_est - ex.exact_distinct) / ex.exact_distinct, 6) AS rel_err
    FROM est CROSS JOIN ex
"""


@register("approx_distinct_hll_registers", oracle=_HLL_SQL, tags=("agg", "sketch", "extension"))
def approx_distinct_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """From-scratch relational HyperLogLog over event users, one row:
    exact count, register occupancy, raw + linear-counting + corrected
    estimates, relative error. Complements ``approx_distinct_users``
    (Spark's built-in HLL++): here the REGISTER TABLE itself is the
    operator's output surface — ≤ m rows that merge via ``max`` across
    partitions/streams/days — and every value is exactly oracle-checked
    because the indicator sum is an int64 and the float chain is
    literal-embedded identically on both sides.

    At 100 TB: one partial-aggregated shuffle of ≤ m rows per partition;
    daily register tables roll up with a 256-row ``groupBy(bucket).max``."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    keyed = ev.select(F.col("user_id").cast("string").alias("user_key"))
    regs = hll_registers(keyed, "user_key", _HLL_M)
    est = hll_estimate(regs, _HLL_M)
    exact = keyed.agg(F.count_distinct("user_key").cast("bigint").alias("exact_distinct"))
    return exact.crossJoin(est).select(
        "exact_distinct",
        "nonzero_registers",
        "raw_hll_est",
        "linear_est",
        "hll_est",
        F.round(
            F.abs(F.col("hll_est") - F.col("exact_distinct")) / F.col("exact_distinct"), 6
        ).alias("rel_err"),
    )


# ---------------------------------------------------------------------------
# Priority sampling (weighted without replacement, top-k shaped)
# ---------------------------------------------------------------------------

_PS_K = 50
_PS_GRAIN = 1 << 20

_PS_SQL = f"""
    WITH d AS (
      SELECT doc_id, n_chars,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#ps'), 1, 15)) AS BIGINT)
               % {_PS_GRAIN} AS r
      FROM documents
    )
    SELECT doc_id, n_chars,
           CAST(n_chars AS DOUBLE) * CAST({_PS_GRAIN} AS DOUBLE)
             / CAST(r + 1 AS DOUBLE) AS priority
    FROM d
    ORDER BY priority DESC, doc_id
    LIMIT {_PS_K}
"""


@register("priority_weighted_sample", oracle=_PS_SQL, tags=("sampling", "sketch", "extension"))
def priority_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling of documents with weight = n_chars: the k=50
    highest-priority docs (q = w/u, u an exact md5-derived rational), i.e.
    weighted sampling without replacement expressed as a top-k — at scale
    a ``TakeOrderedAndProject`` heap, never a global sort, and subset sums
    over the sample are unbiasedly estimable via max(w, τ).

    Engine-exact on purpose: the priority is one integer-product double
    divide (IEEE-exactly-rounded), so Spark and DuckDB rank identically —
    no transcendental in the ordering key."""
    docs = load_table(spark, sf_dir, "documents")
    return priority_sample(docs, "n_chars", "doc_id", _PS_K, _PS_GRAIN)
