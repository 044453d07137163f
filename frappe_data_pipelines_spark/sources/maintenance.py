"""Table maintenance: keyed upsert and compaction on plain parquet.

The reference's sink is a Qdrant *upsert* (same-id writes overwrite —
qdrant_service.py:86-115); Delta expresses that as ``MERGE``. On plain
parquet directories (this container) the same exactly-once contract is:

  upsert = (existing ⟕anti new) ∪ new, atomically swapped in

which is what ``upsert_parquet`` implements — last-writer-wins per key,
idempotent on re-delivery (I5). The swap is write-to-staging + directory
rename, so readers never observe a half-written table. At real scale this
module is replaced wholesale by Delta/Iceberg MERGE + OPTIMIZE; the call
sites don't change.

``compact_parquet`` addresses the small-files problem every streaming sink
accumulates (one file per micro-batch per partition): rewrite to
``ceil(bytes / target)`` files. Streaming appends during compaction are the
caller's lock to take (Delta solves this transactionally).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _atomic_swap(tmp: str, path: str) -> None:
    old = path + "." + uuid.uuid4().hex[:8]
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old, ignore_errors=True)


def upsert_parquet(
    spark: SparkSession, new_rows: DataFrame, path: str, key_cols: list[str]
) -> None:
    """MERGE-on-parquet: rows in ``new_rows`` replace existing rows with the
    same key; everything else is kept. Idempotent: re-applying the same
    batch is a no-op (I5 exactly-once sink semantics)."""
    tmp = path + ".staging-" + uuid.uuid4().hex[:8]
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        keys = new_rows.select(*key_cols).distinct()
        kept = existing.join(keys, key_cols, "left_anti")
        merged = kept.unionByName(new_rows.select(*existing.columns))
        # materialize BEFORE touching the target (the plan reads from it)
        merged.write.parquet(tmp)
    else:
        new_rows.write.parquet(tmp)
    _atomic_swap(tmp, path)


def compact_parquet(spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Rewrite a parquet directory into ~target-sized files; returns the new
    file count. Fixes micro-batch small-file accumulation so downstream
    scans get full-sized splits instead of thousands of footer reads."""
    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(size / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path + ".compact-" + uuid.uuid4().hex[:8]
    df.repartition(n_files).write.parquet(tmp)
    _atomic_swap(tmp, path)
    return n_files
