"""Data-layout optimization for scan pruning — the biggest single lever
at 100 TB (reference: its vector store compacts segments; a lakehouse
equivalent is Delta's OPTIMIZE ... ZORDER BY).

Parquet readers prune ROW GROUPS and FILES whose min/max footer stats
exclude the predicate. Pruning only bites when the writer clusters rows
so each file covers a narrow key range:

* ``write_range_clustered`` — range-repartition on the cluster keys then
  sort within partitions: each output file owns a contiguous key range,
  so an equality/range predicate touches ~1 file instead of all of them.
* ``zorder_key_expr`` — Morton (Z-order) interleaving of several keys'
  quantized ranks, as a pure Column expression: clustering by the Z key
  gives multi-dimensional pruning (both ``user_id = ?`` AND time-range
  predicates prune well from ONE layout).

The effect is measured by ``tools/layout_bench.py`` (files whose footer
range matches a point predicate, clustered vs unclustered) and asserted
structurally in tests via pyarrow footer inspection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["write_range_clustered", "zorder_key_expr", "zorder_py"]


def zorder_key_expr(
    quantized: list[tuple[Column, float, float]], bits: int = 16
) -> Column:
    """Morton key of N columns: each column is quantized to ``bits``-bit
    rank inside its [lo, hi] range, then bits are interleaved. Pure
    integer Column arithmetic — whole-stage codegen, no UDF. N·bits must
    be ≤ 63 (the key is a BIGINT)."""
    n = len(quantized)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed 64-bit key")
    maxq = (1 << bits) - 1
    qs = []
    for col, lo, hi in quantized:
        span = (hi - lo) or 1.0
        q = F.floor((col.cast("double") - F.lit(float(lo))) / F.lit(float(span)) * maxq)
        qs.append(F.least(F.lit(maxq), F.greatest(F.lit(0), q)).cast("long"))
    key = F.lit(0).cast("long")
    for b in range(bits):
        for j, q in enumerate(qs):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + j))
    return key


def zorder_py(values: list[int], bits: int = 16) -> int:
    """Pure-Python mirror of the interleave (tests pin the expression
    against this)."""
    key = 0
    n = len(values)
    for b in range(bits):
        for j, v in enumerate(values):
            key |= ((v >> b) & 1) << (b * n + j)
    return key


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    zorder: list[tuple[str, float, float]] | None = None,
) -> None:
    """Write ``df`` as parquet clustered for pruning: range-repartition on
    the cluster keys (or the Z-order key when ``zorder`` is given) and
    sort within each partition, so every output file covers a narrow,
    mostly-disjoint key range and its footer min/max actually prunes.

    At 100 TB this is the compaction job you run once per table, after
    which every selective read saves its cost many times over."""
    if zorder:
        key = zorder_key_expr([(F.col(c), lo, hi) for c, lo, hi in zorder])
        out = (
            df.withColumn("__zkey", key)
            .repartitionByRange(n_files, "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
        )
    else:
        out = df.repartitionByRange(n_files, *cluster_cols).sortWithinPartitions(
            *cluster_cols
        )
    out.write.mode("overwrite").parquet(path)
