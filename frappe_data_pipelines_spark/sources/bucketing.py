"""Bucketed-table co-location: the pre-shuffled-join scale pattern.

At 100 TB the dominant cost of fact⋈fact joins (orders⋈lineitem every
query) is the shuffle of both sides on the join key. Writing both tables
bucketed by that key — ``bucketBy(n, key) + sortBy(key)`` — pins rows to
buckets by ``hash(key) % n`` at WRITE time, so every later join or
aggregation on the key reads co-located buckets and skips the Exchange
entirely (verified at plan level in tests/test_bucketing.py).

The reference has no notion of physical layout (rows live in InnoDB /
Qdrant); this module is the Spark-native answer to the same problem its
`collection_name` sharding gestures at (qdrant_service.py:61-84).

Trade-offs encoded here:
  * n_buckets is fixed at write time — choose for the TARGET scale
    (buckets ≈ total_bytes / 128MB), not the current one;
  * both join sides must agree on (key, n_buckets) to co-locate;
  * bucketed tables require saveAsTable (metastore bookkeeping) — plain
    ``.parquet(path)`` writes cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Sorting within buckets upgrades later merge joins to skip their sort
    step and makes min/max skipping effective inside each file.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the same key set: with bucketing metadata
    present Catalyst plans a shuffle-free sort-merge join (no Exchange on
    either side)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
