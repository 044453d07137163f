"""Mergeable sketches for corpus-scale membership and frequency queries.

Two classic shapes a 100 TB ingest pipeline leans on when an exact join or
groupBy over the full history is the bottleneck:

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

Both use the repo's portable md5-affine hash family (``_md5_64`` in
``operators/dedup.py``) so every bit position and counter cell is
reproducible in DuckDB SQL — the catalog queries over these sketches are
EXACT oracles, not tolerance checks.

Reference scope note: the reference engine has no sketch surface; these are
the beyond-reference training-pipeline extensions the build brief asks for
(incremental dedup against a historical corpus, heavy-key monitoring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h64(col: Column, salt: str = "") -> Column:
    """Portable 60-bit hash (first 15 md5 hex chars → bigint), optionally
    salted — DuckDB mirror: CAST(('0x' || substring(md5(x || salt), 1, 15))
    AS BIGINT). Non-negative, so ``%`` agrees between engines."""
    if salt:
        col = F.concat(col, F.lit(salt))
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("bigint")


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def _bloom_positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of ``k`` bit positions via Kirsch–Mitzenmacher double hashing:
    pos_i = (h1 + i·h2) mod m, both sub-hashes pre-reduced mod m so the
    arithmetic stays far below int64 overflow."""
    h1 = _h64(key) % m_bits
    h2 = _h64(key, "#b2") % m_bits
    return F.array(*[(h1 + F.lit(i) * h2) % m_bits for i in range(k)])


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
    100 TB. 32-bit words (not 64) keep every mask strictly below 2^31, so
    the identical ``1 << (pos % 32)`` expression is safe signed arithmetic
    in both Spark and DuckDB."""
    key = F.col(key_col).cast("string")
    return (
        df.select(F.explode(_bloom_positions(key, m_bits, k)).alias("pos"))
        .select(
            F.expr("CAST(pos DIV 32 AS INT)").alias("word"),
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT)) AS BIGINT)").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


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
    row's key are set in ``bitmap``.

    The bitmap is ≤ ``m/32`` rows — broadcast it; the membership check is
    then a map-side broadcast join + one groupBy on the row id (the only
    shuffle, and it is k-rows-per-input-row small). An absent word is an
    all-zero word (left join + coalesce 0)."""
    key = F.col(key_col).cast("string")
    probes = df.select(
        F.col(id_col), F.explode(_bloom_positions(key, m_bits, k)).alias("pos")
    ).select(
        id_col,
        F.expr("CAST(pos DIV 32 AS INT)").alias("word"),
        F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT)) AS BIGINT)").alias(
            "mask"
        ),
    )
    return (
        probes.join(F.broadcast(bitmap), "word", "left")
        .select(
            id_col,
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0).alias("hit"),
        )
        .groupBy(id_col)
        .agg(F.bool_and("hit").alias(out_col))
    )


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def _cms_col(key: Column, row: int, width: int) -> Column:
    """Counter column for sketch row ``row``: independent salted hash per
    row (salt '#r<row>'), reduced mod width."""
    return _h64(key, f"#r{row}") % width


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
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("row_i"),
                            _cms_col(key, i, width).cast("int").alias("col_i"),
                        )
                        for i in range(depth)
                    ]
                )
            ).alias("c")
        )
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
    probes = keys.select(
        key.alias(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        _cms_col(key, i, width).cast("int").alias("col_i"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "c.row_i", "c.col_i")
    return (
        probes.join(F.broadcast(cells), ["row_i", "col_i"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias(out_col))
    )
