"""Mergeable sketches for corpus-scale membership and frequency queries.

Four classic shapes a 100 TB ingest pipeline leans on when an exact join
or groupBy over the full history is the bottleneck:

* **Bloom filter** — "has this fingerprint been ingested before?" without
  shuffling the historical corpus: the history compresses to an ``m``-bit
  bitmap (stored as ``m/32`` bigint words via ``bit_or`` partial aggregation,
  so it builds map-side and merges associatively), the bitmap broadcasts,
  and each incoming row checks ``k`` bit positions against it. One-sided
  error by construction: a key that IS in the history always reports
  ``maybe_member = true`` (no false negatives); a ``true`` answer is
  confirmed by the downstream exact path over the *flagged subset only*.

* **Count-min sketch** — per-key frequency estimates from a ``depth×width``
  grid of counters that fits in L2 cache regardless of key cardinality.
  Each row increments one counter per sketch row; ``estimate(key) =
  min_i grid[i][h_i(key)]`` never under-counts (every occurrence of the key
  lands in all of its cells; collisions only add). The grid is a plain
  ``groupBy(row, col).sum`` — partial-aggregated, mergeable across
  partitions, streams and days, and broadcastable for estimate joins.

* **HyperLogLog** — distinct counts from an ``m``-register table
  (``groupBy(bucket).max(rho)``) that merges via ``max`` across any split
  of the data; the estimate's indicator sum accumulates as an exact int64
  so the float surface is one IEEE-exact multiply/divide chain.

* **Priority sampling** — weighted sampling without replacement as a plain
  top-k by ``w/u`` priority (Duffield–Lund–Thorup), with the uniform drawn
  as an exact md5-derived rational so both engines rank identically.

All four build on the repo's portable md5 hash (``_md5_64`` in
``operators/dedup.py`` — imported, not duplicated, so the family has one
definition) and every bit position / counter cell is reproducible in
DuckDB SQL — the catalog queries over these sketches are EXACT oracles,
not tolerance checks.

NULL keys are excluded everywhere (a NULL is not a key): the bitmap,
grids and registers never contain a NULL-derived entry, and membership
probes report ``false`` for NULL-key rows rather than NULL.

Reference scope note: the reference engine has no sketch surface; these are
the beyond-reference training-pipeline extensions the build brief asks for
(incremental dedup against a historical corpus, heavy-key monitoring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.operators.dedup import _md5_64


def _h64(col: Column, salt: str = "") -> Column:
    """The repo-wide portable 60-bit hash (``_md5_64``), optionally salted —
    DuckDB mirror: CAST(('0x' || substring(md5(x || salt), 1, 15)) AS
    BIGINT). Non-negative, so ``%`` agrees between engines."""
    if salt:
        col = F.concat(col, F.lit(salt))
    return _md5_64(col)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def _bloom_positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of ``k`` bit positions via Kirsch–Mitzenmacher double hashing:
    pos_i = (h1 + i·h2) mod m, both sub-hashes pre-reduced so the arithmetic
    stays far below int64 overflow. The step ``h2`` is forced into
    [1, m−1] (``% (m−1) + 1``): a zero step would collapse all ``k`` probes
    onto ``h1`` for ~1/m of keys and quietly degrade the (fp)^k bound to fp
    for that key class."""
    h1 = _h64(key) % m_bits
    h2 = _h64(key, "#b2") % (m_bits - 1) + 1
    return F.array(*[(h1 + F.lit(i) * h2) % m_bits for i in range(k)])


def _word_mask(pos_df: DataFrame, *carry: str) -> DataFrame:
    """(pos) → (word, mask) projection shared by the build and probe sides
    so the bit-addressing scheme has exactly one definition. 32-bit words:
    every mask is ≤ 2^31, comfortably inside int64 for the identical
    ``1 << (pos % 32)`` expression on both engines."""
    return pos_df.select(
        *carry,
        F.expr("CAST(pos DIV 32 AS INT)").alias("word"),
        F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT)) AS BIGINT)").alias(
            "mask"
        ),
    )


def bloom_bitmap(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 14,
    k: int = 4,
) -> DataFrame:
    """Build the bitmap: (word INT, bits BIGINT) rows, one per 32-bit word
    that has at least one bit set (missing word ⇒ all-zero word).

    The ``groupBy(word).bit_or`` partial-aggregates map-side, so the shuffle
    carries at most ``m/32`` rows per partition no matter how many history
    rows feed it — this is what makes the build linear-scan-shaped at
    100 TB."""
    key = F.col(key_col).cast("string")
    positions = df.where(key.isNotNull()).select(
        F.explode(_bloom_positions(key, m_bits, k)).alias("pos")
    )
    return _word_mask(positions).groupBy("word").agg(F.bit_or("mask").alias("bits"))


def bloom_maybe_member(
    df: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    id_col: str,
    m_bits: int = 1 << 14,
    k: int = 4,
    out_col: str = "maybe_member",
) -> DataFrame:
    """(id_col, out_col BOOLEAN): true iff ALL ``k`` bit positions of the
    row's key are set in ``bitmap``. Rows whose key is NULL report
    ``false`` (a NULL is never "already ingested"), not NULL.

    Precondition: ``id_col`` uniquely identifies rows of ``df`` — the
    verdict is grouped per id, so two rows sharing an id would have their
    2k probe positions ANDed together and a genuine member could report
    false. (The catalog query probes (doc_id, text) where doc_id is the
    primary key.)

    The bitmap is ≤ ``m/32`` rows — broadcast it; the membership check is
    then a map-side broadcast join + one groupBy on the row id (the only
    shuffle, and it is k-rows-per-input-row small). An absent word is an
    all-zero word (left join + coalesce 0)."""
    key = F.col(key_col).cast("string")
    probes = _word_mask(
        df.where(key.isNotNull()).select(
            F.col(id_col), F.explode(_bloom_positions(key, m_bits, k)).alias("pos")
        ),
        id_col,
    )
    flags = (
        probes.join(F.broadcast(bitmap), "word", "left")
        .select(
            id_col,
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0).alias("hit"),
        )
        .groupBy(id_col)
        .agg(F.bool_and("hit").alias(out_col))
    )
    null_rows = df.where(key.isNull()).select(F.col(id_col), F.lit(False).alias(out_col))
    return flags.unionByName(null_rows)


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def _cms_probes(key: Column, depth: int, width: int) -> Column:
    """Exploded-struct array of the key's ``depth`` cells — ONE definition
    of the cell-addressing scheme (salt '#r<row>', reduced mod width),
    shared by the build and estimate sides so they can never drift apart
    (a mismatch would silently break the never-undercounts guarantee)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row_i"),
                    (_h64(key, f"#r{i}") % width).cast("int").alias("col_i"),
                )
                for i in range(depth)
            ]
        )
    )


def cms_cells(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the grid: (row_i INT, col_i INT, cnt BIGINT) — at most
    depth×width rows total after the single partial-aggregated shuffle.
    NULL keys are excluded (they are not a frequency class)."""
    key = F.col(key_col).cast("string")
    return (
        df.where(key.isNotNull())
        .select(_cms_probes(key, depth, width).alias("c"))
        .groupBy(F.col("c.row_i").alias("row_i"), F.col("c.col_i").alias("col_i"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimates(
    keys: DataFrame,
    cells: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    out_col: str = "cms_est",
) -> DataFrame:
    """(key_col, out_col BIGINT): min over the key's ``depth`` counters.
    ``cells`` is ≤ depth×width rows — broadcast join, then one groupBy per
    key. Guarantee: out_col ≥ the key's true count (collisions only add)."""
    key = F.col(key_col).cast("string")
    probes = (
        keys.where(key.isNotNull())
        .select(key.alias(key_col), _cms_probes(key, depth, width).alias("c"))
        .select(key_col, "c.row_i", "c.col_i")
    )
    return (
        probes.join(F.broadcast(cells), ["row_i", "col_i"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias(out_col))
    )


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_registers(df: DataFrame, key_col: str, m: int = 256) -> DataFrame:
    """HyperLogLog register table: (bucket INT, m_j INT) — at most ``m``
    rows after one partial-aggregated ``groupBy(bucket).max(rho)``.

    The register table IS the sketch: registers merge across partitions,
    streams, and days via ``max`` (see
    ``test_sketches.py::TestHll::test_merge_via_max``) and the estimate
    derives from it alone. The rank ``rho`` is computed integer-exactly —
    ``length(bin(w))`` is ``floor(log2 w) + 1`` with no float in sight — so
    the whole construction reproduces bit-for-bit in DuckDB (``bin`` exists
    there with identical semantics).

    ``m`` must be a power of two; the hash is 60 bits (15 md5 hex chars):
    log2(m) bucket bits leave a ``60 − log2(m)``-bit rank field, so
    ``rho ∈ [1, 61 − log2(m)]``."""
    if m & (m - 1):
        raise ValueError("m must be a power of two")
    field_bits = 60 - (m.bit_length() - 1)
    rho_max = field_bits + 1
    key = F.col(key_col).cast("string")
    hashed = df.where(key.isNotNull()).select(_h64(key).alias("h"))
    # h DIV m must be INTEGER division — h has 60 bits, beyond double's 53-bit
    # mantissa, so a float divide would corrupt the rank field
    w = F.expr(f"h DIV {m}")
    rho = F.when(w == 0, F.lit(rho_max)).otherwise(F.lit(rho_max) - F.length(F.bin(w)))
    return (
        hashed.select((F.col("h") % m).cast("int").alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate(registers: DataFrame, m: int = 256) -> DataFrame:
    """One-row cardinality estimate from a register table.

    Float discipline (oracle-exactness): the indicator sum accumulates as
    the INTEGER ``S = Σ 2^(rho_max − M_j)`` (absent buckets contribute
    ``2^rho_max``), which fits int64 for m ≤ 256 — so the only float ops
    are one multiply chain and one divide, both IEEE-exactly-rounded and
    therefore identical across engines. The small-range correction is
    classic linear counting ``m·ln(m/V)``; columns: ``nonzero_registers``,
    ``raw_hll_est``, ``linear_est``, ``hll_est`` (the corrected choice)."""
    field_bits = 60 - (m.bit_length() - 1)
    rho_max = field_bits + 1
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    agg = registers.agg(
        F.coalesce(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({rho_max} - m_j AS INT))")),
            F.lit(0),
        )
        .cast("bigint")
        .alias("s_present"),
        F.count(F.lit(1)).cast("int").alias("nonzero_registers"),
    )
    two_pow = float(1 << rho_max)
    out = agg.select(
        "nonzero_registers",
        (
            F.col("s_present")
            + (F.lit(m) - F.col("nonzero_registers")).cast("bigint") * F.lit(1 << rho_max)
        ).alias("s_total"),
    ).select(
        "nonzero_registers",
        (F.lit(alpha * m * m * two_pow) / F.col("s_total").cast("double")).alias("raw_hll_est"),
    )
    v = (F.lit(m) - F.col("nonzero_registers")).cast("double")
    linear = F.when(v > 0, F.lit(float(m)) * F.log(F.lit(float(m)) / v))
    return out.select(
        "nonzero_registers",
        F.round("raw_hll_est", 6).alias("raw_hll_est"),
        F.round(linear, 6).alias("linear_est"),
        F.round(
            F.when(
                (F.col("raw_hll_est") <= F.lit(2.5 * m)) & linear.isNotNull(), linear
            ).otherwise(F.col("raw_hll_est")),
            6,
        ).alias("hll_est"),
    )


# ---------------------------------------------------------------------------
# Priority sampling
# ---------------------------------------------------------------------------


def priority_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
    u_grain: int = 1 << 20,
) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup, JACM 2007): weighted
    sampling WITHOUT replacement as a plain top-k — priority
    q_i = w_i / u_i with u_i uniform in (0,1]; keep the k largest.
    Subset sums are then estimable unbiasedly via max(w_i, τ) with τ the
    (k+1)-th priority.

    Engine-exactness: u_i is the deterministic rational (r+1)/u_grain with
    r = md5-derived, so the priority is one integer-product double divide —
    IEEE-exactly-rounded, NO transcendental — and the selection reproduces
    bit-for-bit in DuckDB (unlike A-Res u^(1/w) exponentials, whose last-ulp
    libm drift could flip ranks between engines).

    At 100 TB: top-k by priority is ``TakeOrderedAndProject`` — per-partition
    bounded heaps, no global sort."""
    key = F.col(id_col).cast("string")
    r = _h64(key, "#ps") % u_grain
    priority = (
        F.col(weight_col).cast("double") * F.lit(float(u_grain)) / (r + 1).cast("double")
    )
    return (
        df.select(id_col, weight_col, priority.alias("priority"))
        .orderBy(F.col("priority").desc(), F.col(id_col))
        .limit(k)
    )
