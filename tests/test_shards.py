"""Training-shard export: deterministic assignment, manifest round trip,
partition-pruned subset reads, and corruption detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.sources.shards import (
    read_training_shards,
    shard_assignment,
    shard_manifest,
    verify_shard_export,
    write_training_shards,
)
from frappe_data_pipelines_spark.sources.tables import load_table


def test_shard_export_roundtrip(spark, sf_dir, tmp_path):
    """Every doc lands in exactly one shard; read-back equals input; the
    stored manifest matches a from-scratch recompute on the files."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = str(tmp_path / "export")
    manifest = write_training_shards(docs, out, n_shards=8)
    assert manifest.count() == 8
    back = read_training_shards(spark, out)
    assert back.select("doc_id", "text").exceptAll(docs).count() == 0
    assert docs.exceptAll(back.select("doc_id", "text")).count() == 0
    checks = verify_shard_export(spark, out, n_shards=8).collect()
    assert len(checks) == 8 and all(r.ok for r in checks)


def test_shard_assignment_deterministic_and_total(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(500)], "doc_id long, text string"
    )
    a = docs.select("doc_id", shard_assignment(8).alias("s"))
    counts = {r.s: r.c for r in a.groupBy("s").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == set(range(8))  # 500 ids cover all 8 buckets
    assert sum(counts.values()) == 500
    b = {r.doc_id: r.s for r in a.collect()}
    c = {r.doc_id: r.s for r in docs.select("doc_id", shard_assignment(8).alias("s")).collect()}
    assert b == c
    with pytest.raises(ValueError, match="n_shards"):
        shard_assignment(0)


def test_shard_subset_read_prunes_partitions(spark, tmp_path):
    """Reading a shard subset touches only those partition directories
    (PartitionFilters in the scan), and returns exactly those shards."""
    docs = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(300)], "doc_id long, text string"
    )
    out = str(tmp_path / "export")
    write_training_shards(docs, out, n_shards=8)
    sub = read_training_shards(spark, out, shards=[1, 5])
    assert {r.shard for r in sub.select("shard").distinct().collect()} == {1, 5}
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan


def test_verify_catches_tampered_shard(spark, tmp_path):
    """Dropping rows from one shard's files flips ok=false for THAT shard
    only (digest/count mismatch localized)."""
    import glob
    import os

    docs = spark.createDataFrame(
        [(i, f"payload {i}") for i in range(200)], "doc_id long, text string"
    )
    out = str(tmp_path / "export")
    write_training_shards(docs, out, n_shards=4)
    # rewrite shard=2's data with one row removed (simulated loss)
    shard2 = spark.read.parquet(os.path.join(out, "data", "shard=2"))
    victim = shard2.limit(1).collect()[0].doc_id
    kept = shard2.filter(F.col("doc_id") != victim)
    tmp = str(tmp_path / "s2tmp")
    kept.write.mode("overwrite").parquet(tmp)
    for f in glob.glob(os.path.join(out, "data", "shard=2", "*.parquet")):
        os.remove(f)
    for f in glob.glob(os.path.join(tmp, "*.parquet")):
        os.rename(f, os.path.join(out, "data", "shard=2", os.path.basename(f)))
    checks = {r.shard: r.ok for r in verify_shard_export(spark, out, n_shards=4).collect()}
    assert checks[2] is False
    assert all(ok for s, ok in checks.items() if s != 2)


def test_manifest_digest_order_independent(spark):
    """The content digest must not depend on row order or partitioning."""
    rows = [(i, f"abc {i}") for i in range(100)]
    a = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    b = spark.createDataFrame(list(reversed(rows)), "doc_id long, text string").coalesce(1)
    ma = sorted(map(tuple, shard_manifest(a, n_shards=4).collect()))
    mb = sorted(map(tuple, shard_manifest(b, n_shards=4).collect()))
    assert ma == mb


def test_append_merges_manifest_homomorphically(spark, tmp_path):
    """Appending docs updates data + manifest in O(new docs); the merged
    manifest equals a from-scratch manifest of the union (counts, bytes,
    ranges, xor digest), and verify passes on the files."""
    from frappe_data_pipelines_spark.sources.shards import append_training_shards

    first = spark.createDataFrame(
        [(i, f"early doc {i}") for i in range(120)], "doc_id long, text string"
    )
    later = spark.createDataFrame(
        [(i, f"late doc {i}") for i in range(120, 200)], "doc_id long, text string"
    )
    out = str(tmp_path / "export")
    write_training_shards(first, out, n_shards=4)
    merged = append_training_shards(later, out, n_shards=4)
    scratch = shard_manifest(first.unionByName(later), n_shards=4)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, scratch.collect()))
    checks = verify_shard_export(spark, out, n_shards=4).collect()
    assert len(checks) == 4 and all(r.ok for r in checks)
    assert read_training_shards(spark, out).count() == 200


def test_streaming_shard_export_composition(spark, tmp_path):
    """foreachBatch(append_training_shards) across micro-batches: the
    homomorphic manifest merge makes streaming export per-batch-cheap,
    and the final manifest equals a from-scratch manifest of everything
    ingested."""
    import os

    from frappe_data_pipelines_spark.sources.shards import append_training_shards

    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "export")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    a = spark.createDataFrame(
        [(i, f"batch-a doc {i}") for i in range(60)], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(i, f"batch-b doc {i}") for i in range(60, 100)], "doc_id long, text string"
    )
    a.coalesce(1).write.mode("append").parquet(in_dir)
    b.coalesce(1).write.mode("append").parquet(in_dir)
    # seed the export so every micro-batch takes the append path
    seed = spark.createDataFrame([(10_000, "seed doc")], "doc_id long, text string")
    write_training_shards(seed, out, n_shards=4)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, _id: append_training_shards(batch, out, n_shards=4) and None
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination returns False on timeout without raising — assert so
    # a slow host fails HERE, not on a confusing manifest diff against a
    # still-writing export
    assert q.awaitTermination(120)

    everything = seed.unionByName(a).unionByName(b)
    scratch = sorted(map(tuple, shard_manifest(everything, n_shards=4).collect()))
    from frappe_data_pipelines_spark.sources.shards import _manifest_dir

    stored = sorted(map(tuple, spark.read.parquet(_manifest_dir(out)).collect()))
    assert stored == scratch
    checks = verify_shard_export(spark, out, n_shards=4).collect()
    assert all(r.ok for r in checks)


def test_manifest_pointer_flip_and_versioning(spark, tmp_path):
    """The manifest is versioned with a pointer file that flips atomically:
    a manifest directory exists at EVERY instant of an append (the old
    two-rename swap had a window with none), and appends advance the
    version while retiring the superseded directory."""
    import os

    from frappe_data_pipelines_spark.sources.shards import (
        _manifest_dir,
        append_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"v {i}") for i in range(50)], "doc_id long, text string"
    )
    out = str(tmp_path / "export")
    write_training_shards(docs, out, n_shards=4)
    assert os.path.basename(_manifest_dir(out)) == "manifest_v0"
    more = spark.createDataFrame(
        [(i, f"v {i}") for i in range(50, 80)], "doc_id long, text string"
    )
    append_training_shards(more, out, n_shards=4)
    assert os.path.basename(_manifest_dir(out)) == "manifest_v1"
    assert not os.path.exists(os.path.join(out, "manifest_v0"))
    checks = verify_shard_export(spark, out, n_shards=4).collect()
    assert all(r.ok for r in checks)


def test_append_lock_blocks_concurrent_appenders(spark, tmp_path):
    """A held lock file makes a second append fail loudly (naming the
    recovery path) instead of silently dropping the other's delta."""
    import os

    from frappe_data_pipelines_spark.sources.shards import append_training_shards

    docs = spark.createDataFrame(
        [(i, f"x {i}") for i in range(20)], "doc_id long, text string"
    )
    out = str(tmp_path / "export")
    write_training_shards(docs, out, n_shards=2)
    lock = os.path.join(out, ".append.lock")
    with open(lock, "w") as f:
        f.write("9999")
    more = spark.createDataFrame([(100, "y")], "doc_id long, text string")
    with pytest.raises(RuntimeError, match="rebuild_manifest"):
        append_training_shards(more, out, n_shards=2)
    os.remove(lock)
    append_training_shards(more, out, n_shards=2)  # lock released → works
    checks = verify_shard_export(spark, out, n_shards=2).collect()
    assert all(r.ok for r in checks)


def test_rebuild_manifest_recovers_stale_manifest(spark, tmp_path):
    """Crash simulation: data appended but manifest never flipped. verify
    flags the stale manifest; rebuild_manifest restores consistency from
    the written files without touching any shard."""
    import os

    from frappe_data_pipelines_spark.sources.shards import rebuild_manifest

    docs = spark.createDataFrame(
        [(i, f"p {i}") for i in range(60)], "doc_id long, text string"
    )
    out = str(tmp_path / "export")
    write_training_shards(docs, out, n_shards=4)
    # simulate the crash window: raw data append WITHOUT a manifest merge
    orphan = spark.createDataFrame(
        [(i, f"p {i}") for i in range(60, 90)], "doc_id long, text string"
    ).withColumn("shard", shard_assignment(4))
    orphan.repartition(4, "shard").write.mode("append").partitionBy("shard").parquet(
        os.path.join(out, "data")
    )
    assert not all(r.ok for r in verify_shard_export(spark, out, n_shards=4).collect())
    rebuild_manifest(spark, out)
    checks = verify_shard_export(spark, out, n_shards=4).collect()
    assert len(checks) == 4 and all(r.ok for r in checks)


def test_python_failure_after_data_write_keeps_lock(spark, tmp_path, monkeypatch):
    """Round-9 ADVICE fix: an exception escaping append_training_shards
    AFTER the data append must keep the lock (stamped FAILED) — releasing
    it would let the next appender merge against the now-stale manifest.
    A failure BEFORE any write still releases the lock."""
    import os

    import frappe_data_pipelines_spark.sources.shards as shards_mod
    from frappe_data_pipelines_spark.sources.shards import (
        append_training_shards,
        rebuild_manifest,
    )

    docs = spark.createDataFrame(
        [(i, f"x {i}") for i in range(20)], "doc_id long, text string"
    )
    out = str(tmp_path / "export")
    write_training_shards(docs, out, n_shards=2)

    # -- failure AFTER the data write (shard_manifest runs post-append) --
    real_manifest = shards_mod.shard_manifest

    def boom(*a, **k):
        raise ValueError("simulated post-write failure")

    monkeypatch.setattr(shards_mod, "shard_manifest", boom)
    more = spark.createDataFrame([(100, "y")], "doc_id long, text string")
    with pytest.raises(ValueError, match="simulated post-write failure"):
        append_training_shards(more, out, n_shards=2)
    lock = os.path.join(out, ".append.lock")
    assert os.path.exists(lock)  # kept: data is ahead of the manifest
    with open(lock) as f:
        assert "FAILED" in f.read()
    # the next appender is forced through the recovery message
    monkeypatch.setattr(shards_mod, "shard_manifest", real_manifest)
    with pytest.raises(RuntimeError, match="FAILED mid-write"):
        append_training_shards(more, out, n_shards=2)
    # documented recovery: rebuild from files, drop the lock, append works
    rebuild_manifest(spark, out)
    os.remove(lock)
    append_training_shards(
        spark.createDataFrame([(101, "z")], "doc_id long, text string"),
        out,
        n_shards=2,
    )
    checks = verify_shard_export(spark, out, n_shards=2).collect()
    assert all(r.ok for r in checks)

    # -- failure BEFORE any write releases the lock (nothing stale) --
    def boom_assign(*a, **k):
        raise ValueError("simulated pre-write failure")

    monkeypatch.setattr(shards_mod, "shard_assignment", boom_assign)
    with pytest.raises(ValueError, match="pre-write"):
        append_training_shards(more, out, n_shards=2)
    assert not os.path.exists(lock)
