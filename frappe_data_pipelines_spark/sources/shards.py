"""Training-shard export: the last mile of a training-data pipeline.

A cleaned corpus ships to trainers as a fixed set of SHARDS — stable,
hash-assigned, individually-loadable files with a manifest the training
job can trust (doc counts, byte counts, content digest per shard). The
reference repo stops at vector/chunk sinks; this sink covers the
export-for-training surface a 100 TB corpus actually needs:

* **Deterministic assignment.** shard = md5('shard:' || doc_id) % n —
  content-independent, re-run-stable, and re-derivable by ANY engine
  (the manifest is DuckDB-oracle-checked in the catalog). No rand(),
  no partition-index dependence (SURVEY hard spot (c)).
* **Balanced writes.** One shuffle (repartition on the shard key) puts
  each shard's rows in one task → one file per shard; for 100 TB runs
  set ``max_records_per_file`` so Spark splits giant shards into
  part-files without breaking the shard directory contract.
* **Manifest accounting.** Per shard: row count, utf-8 byte count,
  id range, and an ORDER-INDEPENDENT content digest (bit_xor of a
  60-bit md5 prefix per doc) — equality of manifests proves equality
  of shard contents without re-reading either side in order.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_assignment(n_shards: int, id_col: str = "doc_id"):
    """The deterministic shard key as a Column: md5-bucketed (the shared
    ``md5_bucket_expr`` convention) so any engine — the DuckDB oracle, a
    downstream loader — re-derives it from the id alone."""
    from frappe_data_pipelines_spark.functions.text import md5_bucket_expr

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    return md5_bucket_expr(F.col(id_col), "shard:", 8, n_shards).cast("int")


def _doc_digest(id_col: str, text_col: str):
    """60-bit per-doc digest (md5 prefix of id:text) — xor-aggregated into
    the order-independent shard digest."""
    from frappe_data_pipelines_spark.functions.text import md5_bucket_expr

    key = F.concat(
        F.col(id_col).cast("string"),
        F.lit(":"),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    return md5_bucket_expr(key, "", 15)


def shard_manifest(
    docs: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(shard, n_docs, n_bytes, min_doc_id, max_doc_id, content_digest)
    for the deterministic assignment — pure accounting, computable before
    OR after the write (comparing the two catches a lost/duplicated row;
    the digest is xor-of-md5-prefixes so row order never matters).

    One narrow projection + one groupBy on the shard key; output is
    ``n_shards`` rows regardless of corpus size."""
    return (
        docs.select(
            shard_assignment(n_shards, id_col).alias("shard"),
            F.col(id_col).cast("long").alias("__id"),
            F.octet_length(F.coalesce(F.col(text_col), F.lit("")))
            .cast("long")
            .alias("__bytes"),
            _doc_digest(id_col, text_col).alias("__dig"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__bytes").cast("long").alias("n_bytes"),
            F.min("__id").alias("min_doc_id"),
            F.max("__id").alias("max_doc_id"),
            F.expr("bit_xor(__dig)").alias("content_digest"),
        )
    )


_PTR_NAME = "MANIFEST"


def _manifest_dir(out_dir: str) -> str:
    """Resolve the CURRENT manifest directory via the pointer file.

    The pointer (``out_dir/MANIFEST``) holds the name of a versioned
    manifest directory (``manifest_v{N}``) and is flipped with ONE atomic
    ``os.rename`` — there is never a window where no manifest exists
    (the old two-rename swap had a crash window between ``manifest`` →
    ``manifest_old`` and ``manifest_tmp`` → ``manifest`` during which a
    reader saw nothing). Falls back to the legacy un-versioned
    ``manifest`` directory for exports written before the pointer scheme.
    """
    ptr = os.path.join(out_dir, _PTR_NAME)
    if os.path.exists(ptr):
        with open(ptr, encoding="utf-8") as f:
            return os.path.join(out_dir, f.read().strip())
    return os.path.join(out_dir, "manifest")


def _flip_manifest_pointer(out_dir: str, version: int) -> str:
    """Point ``out_dir/MANIFEST`` at ``manifest_v{version}`` atomically:
    write a temp pointer then one ``os.rename`` (atomic on POSIX). A
    reader racing the flip sees either the old or the new pointer — both
    name a fully-written manifest directory."""
    ptr = os.path.join(out_dir, _PTR_NAME)
    tmp = ptr + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(f"manifest_v{version}")
    os.rename(tmp, ptr)
    return os.path.join(out_dir, f"manifest_v{version}")


def _manifest_version(out_dir: str) -> int:
    """Version number of the current manifest (-1 for legacy/none)."""
    cur = os.path.basename(_manifest_dir(out_dir))
    if cur.startswith("manifest_v"):
        return int(cur[len("manifest_v"):])
    return -1


class ShardAppendLock:
    """O_EXCL lock file guarding concurrent ``append_training_shards``
    calls on one export: two appenders racing would each read the same
    stored manifest and the loser's merge would drop the winner's delta.
    A crashed holder leaves the lock on disk — the error message names
    the file and the recovery path (``rebuild_manifest`` recomputes the
    manifest from the written files, then remove the lock).

    The same contract holds for PYTHON-level failures, not just process
    kills: the appender calls :meth:`mark_dirty` immediately before the
    data write, and ``__exit__`` keeps the lock (stamped ``FAILED``) when
    an exception escapes after that point — the data may then be ahead of
    the stored manifest, and releasing the lock would let the next
    appender merge against a silently stale manifest. A failure *before*
    ``mark_dirty`` (nothing written yet) still releases the lock."""

    def __init__(self, out_dir: str):
        self.path = os.path.join(out_dir, ".append.lock")
        self._fd = None
        self._dirty = False

    def __enter__(self):
        try:
            self._fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                with open(self.path, encoding="utf-8") as f:
                    state = f.read()
            except OSError:
                state = ""
            why = (
                "a previous append FAILED mid-write (data may be ahead of "
                "the manifest)"
                if "FAILED" in state
                else "another append is in flight, or a previous one crashed"
            )
            raise RuntimeError(
                f"append_training_shards: lock file {self.path} exists — "
                f"{why}. Recovery: run rebuild_manifest() to restore "
                "manifest/data consistency, then delete the lock file."
            ) from None
        os.write(self._fd, str(os.getpid()).encode())
        return self

    def mark_dirty(self):
        """Call right before the first durable write: from here on, an
        escaping exception keeps the lock so the stale-manifest state is
        never silently merged against."""
        self._dirty = True

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None and self._dirty:
            # Data write may have landed without its manifest flip: keep
            # the lock (stamped) so the next appender is forced through
            # the rebuild_manifest recovery message instead of merging
            # against a stale manifest.
            os.write(self._fd, b" FAILED")
            os.close(self._fd)
            return False
        os.close(self._fd)
        os.remove(self.path)
        return False


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_records_per_file: int | None = None,
) -> DataFrame:
    """Export ``docs`` as hash-assigned parquet shards under
    ``out_dir/data/shard=K/`` plus a parquet manifest at
    ``out_dir/manifest/`` computed from the SAME plan that wrote the data.
    Returns the manifest DataFrame (read back, so callers can join/verify
    without recomputation).

    The write is one shuffle: repartition on the shard key co-locates each
    shard into one task, so ``partitionBy`` emits one file per shard (or
    several, bounded by ``max_records_per_file``, for shards bigger than
    one task should hold)."""
    spark = docs.sparkSession
    assigned = docs.withColumn("shard", shard_assignment(n_shards, id_col))
    writer = (
        assigned.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(os.path.join(out_dir, "data"))
    version = _manifest_version(out_dir) + 1
    shard_manifest(docs, n_shards, id_col, text_col).write.mode("overwrite").parquet(
        os.path.join(out_dir, f"manifest_v{version}")
    )
    return spark.read.parquet(_flip_manifest_pointer(out_dir, version))


def append_training_shards(
    new_docs: DataFrame,
    out_dir: str,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Append new documents to an existing export WITHOUT rewriting or
    re-reading it: rows land in their hash-assigned shard directories
    (parquet append), and the manifest merges arithmetically — counts and
    bytes add, id ranges extend, and the xor-of-md5-prefixes digest is a
    GROUP HOMOMORPHISM (xor of the new docs' digests folds straight into
    the stored value). Manifest maintenance is O(new docs) however large
    the standing export; ``verify_shard_export`` still validates the
    merged manifest against a full recompute.

    Contract: doc ids must be new — appending an id already exported puts
    a duplicate row in its shard (the digest stays honest and verify
    still passes, but loaders see the doc twice; run the export-side
    dedup first, which is what the rest of this engine is for).

    Crash safety: the merged manifest lands in a NEW versioned directory
    and becomes current via one atomic pointer rename — a reader racing
    the append sees either the pre-append or post-append manifest, never
    a missing one. The parquet data append itself is not transactional
    with the pointer flip: a crash between the two leaves the stored
    manifest STALE relative to the data (detected by
    ``verify_shard_export``, repaired by ``rebuild_manifest``). A lock
    file serializes concurrent appenders (two racing merges would each
    drop the other's delta). Local-filesystem semantics; an object-store
    deployment would version manifests in a commit log (see
    sources/merge.py) instead."""
    import shutil

    spark = new_docs.sparkSession
    with ShardAppendLock(out_dir) as lock:
        assigned = new_docs.withColumn("shard", shard_assignment(n_shards, id_col))
        lock.mark_dirty()
        assigned.repartition(n_shards, "shard").write.mode("append").partitionBy(
            "shard"
        ).parquet(os.path.join(out_dir, "data"))
        delta = shard_manifest(new_docs, n_shards, id_col, text_col).select(
            "shard",
            F.col("n_docs").alias("d_docs"),
            F.col("n_bytes").alias("d_bytes"),
            F.col("min_doc_id").alias("d_min"),
            F.col("max_doc_id").alias("d_max"),
            F.col("content_digest").alias("d_digest"),
        )
        prev_dir = _manifest_dir(out_dir)
        stored = spark.read.parquet(prev_dir)
        merged = (
            stored.join(delta, "shard", "full")
            .select(
                "shard",
                (F.coalesce("n_docs", F.lit(0)) + F.coalesce("d_docs", F.lit(0)))
                .cast("long")
                .alias("n_docs"),
                (F.coalesce("n_bytes", F.lit(0)) + F.coalesce("d_bytes", F.lit(0)))
                .cast("long")
                .alias("n_bytes"),
                F.least("min_doc_id", "d_min").alias("min_doc_id"),
                F.greatest("max_doc_id", "d_max").alias("max_doc_id"),
                # xor with the identity (0) on the side that is absent
                F.coalesce("content_digest", F.lit(0))
                .bitwiseXOR(F.coalesce("d_digest", F.lit(0)))
                .alias("content_digest"),
            )
        )
        version = _manifest_version(out_dir) + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"manifest_v{version}")
        )
        final = _flip_manifest_pointer(out_dir, version)
        # the superseded manifest is removed only AFTER the flip; a reader
        # that resolved the pointer pre-flip scans a fully-intact directory
        # (its lazy scan races only this rmtree — the window the versioned
        # scheme shrinks from "no manifest at all" to "stale dir vanishing
        # under an already-resolved read, retry resolves the new pointer")
        if os.path.normpath(prev_dir) != os.path.normpath(final):
            shutil.rmtree(prev_dir, ignore_errors=True)
        return spark.read.parquet(final)


def rebuild_manifest(
    spark: SparkSession,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Recovery path: recompute the manifest FROM THE WRITTEN FILES
    (grouped by the shard directory each row lives in, like
    ``verify_shard_export``) and install it as the new current version
    via the atomic pointer flip. Use after a crash between a data append
    and its manifest flip — one full data scan restores consistency
    without rewriting any shard."""
    data = read_training_shards(spark, out_dir)
    rebuilt = (
        data.select(
            F.col("shard").cast("int").alias("shard"),
            F.col(id_col).cast("long").alias("__id"),
            F.octet_length(F.coalesce(F.col(text_col), F.lit("")))
            .cast("long")
            .alias("__bytes"),
            _doc_digest(id_col, text_col).alias("__dig"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__bytes").cast("long").alias("n_bytes"),
            F.min("__id").alias("min_doc_id"),
            F.max("__id").alias("max_doc_id"),
            F.expr("bit_xor(__dig)").alias("content_digest"),
        )
    )
    version = _manifest_version(out_dir) + 1
    rebuilt.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"manifest_v{version}")
    )
    return spark.read.parquet(_flip_manifest_pointer(out_dir, version))


def read_training_shards(
    spark: SparkSession, out_dir: str, shards: list[int] | None = None
) -> DataFrame:
    """Read exported shards back; ``shards`` selects a subset via partition
    pruning (the shard column is a partition key, so Spark reads only the
    named directories — the loader-side point of sharding)."""
    df = spark.read.parquet(os.path.join(out_dir, "data"))
    if shards is not None:
        df = df.filter(F.col("shard").isin([int(s) for s in shards]))
    return df


def verify_shard_export(
    spark: SparkSession,
    out_dir: str,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Recompute the manifest FROM THE WRITTEN FILES and diff it against
    the stored manifest: one row per shard with boolean ``ok`` (count,
    bytes, digest all equal AND no misplaced rows). Grouping is by the
    shard DIRECTORY each row was read from — not a re-derivation from the
    id — so a part-file dropped into the wrong shard=K directory (which a
    partition-pruned loader would miss) surfaces as ``n_misplaced`` > 0
    on the directory actually holding it, instead of verifying clean. A
    lost, duplicated, or bit-flipped row shows up as ok = false on
    exactly the shard holding it."""
    stored = spark.read.parquet(_manifest_dir(out_dir)).select(
        "shard",
        F.col("n_docs").alias("m_docs"),
        F.col("n_bytes").alias("m_bytes"),
        F.col("content_digest").alias("m_digest"),
    )
    data = read_training_shards(spark, out_dir)
    actual = (
        data.select(
            F.col("shard").cast("int").alias("shard"),
            F.col(id_col).cast("long").alias("__id"),
            F.octet_length(F.coalesce(F.col(text_col), F.lit("")))
            .cast("long")
            .alias("__bytes"),
            _doc_digest(id_col, text_col).alias("__dig"),
            (shard_assignment(n_shards, id_col) != F.col("shard"))
            .cast("long")
            .alias("__misp"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__bytes").cast("long").alias("n_bytes"),
            F.expr("bit_xor(__dig)").alias("content_digest"),
            F.sum("__misp").cast("long").alias("n_misplaced"),
        )
    )
    return (
        actual.join(stored, "shard", "full")
        .select(
            "shard",
            "n_docs",
            "m_docs",
            "n_bytes",
            "m_bytes",
            F.coalesce("n_misplaced", F.lit(0)).alias("n_misplaced"),
            (
                F.col("n_docs").eqNullSafe(F.col("m_docs"))
                & F.col("n_bytes").eqNullSafe(F.col("m_bytes"))
                & F.col("content_digest").eqNullSafe(F.col("m_digest"))
                & (F.coalesce("n_misplaced", F.lit(0)) == 0)
            ).alias("ok"),
        )
    )
