"""Real-Delta integration for ``sources/merge.py:merge_into`` (ROADMAP #2 /
VERDICT r7 missing #3): when a Delta runtime is present, the dispatch seam
must deliver the SAME contract MergeTable implements on plain parquet —
keyed upsert, (app_id, batch_id) replay no-op, and schema evolution.

The container this repo is developed in ships no delta-spark jars, so the
whole module is env-gated: it skips cleanly without the runtime and runs
for real wherever ``pip install delta-spark`` (plus its jars) is present.
A Delta session needs its own extensions/catalog confs, so these tests
build a dedicated SparkSession instead of using the shared fixture.
"""

from __future__ import annotations

import pytest

from frappe_data_pipelines_spark.sources.merge import HAS_DELTA, MergeTable, merge_into

pytestmark = pytest.mark.skipif(
    not HAS_DELTA, reason="delta-spark runtime not installed in this environment"
)


@pytest.fixture(scope="module")
def delta_spark():
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("delta-integration")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension"
        )
        .config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )
    spark = configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark
    spark.stop()


def _rows(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, chunk_index long, text string")


def test_delta_merge_upsert_roundtrip(delta_spark, tmp_path):
    """First merge creates the table; a second merge updates matched keys
    and inserts new ones — no duplicate (doc_id, chunk_index) keys ever."""
    path = str(tmp_path / "delta_tbl")
    merge_into(
        delta_spark, _rows(delta_spark, [(1, 0, "a"), (1, 1, "b")]), path,
        ["doc_id", "chunk_index"],
    )
    merge_into(
        delta_spark, _rows(delta_spark, [(1, 1, "B2"), (2, 0, "c")]), path,
        ["doc_id", "chunk_index"],
    )
    got = {
        (r.doc_id, r.chunk_index): r.text
        for r in delta_spark.read.format("delta").load(path).collect()
    }
    assert got == {(1, 0): "a", (1, 1): "B2", (2, 0): "c"}


def test_delta_txn_replay_is_noop(delta_spark, tmp_path):
    """Exactly-once across restarts: a replayed (app_id, batch_id) write —
    even with MUTATED content — must leave the table identical (Delta
    txnAppId/txnVersion semantics, the contract MergeTable mirrors)."""
    path = str(tmp_path / "delta_txn")
    merge_into(
        delta_spark, _rows(delta_spark, [(1, 0, "original")]), path,
        ["doc_id", "chunk_index"], app_id="ingest", batch_id=7,
    )
    merge_into(  # replay of batch 7 with different content
        delta_spark, _rows(delta_spark, [(1, 0, "mutated replay")]), path,
        ["doc_id", "chunk_index"], app_id="ingest", batch_id=7,
    )
    got = delta_spark.read.format("delta").load(path).collect()
    assert [(r.doc_id, r.chunk_index, r.text) for r in got] == [(1, 0, "original")]


def test_delta_schema_merge_parity_with_mergetable(delta_spark, tmp_path):
    """schema_mode='merge' on both backends: a batch carrying a NEW column
    lands with nulls backfilled on old rows, and the two backends agree
    row for row."""
    from pyspark.sql import functions as F

    dpath = str(tmp_path / "delta_evolve")
    mpath = str(tmp_path / "mt_evolve")
    first = _rows(delta_spark, [(1, 0, "a"), (2, 0, "b")])
    second = _rows(delta_spark, [(3, 0, "c")]).withColumn("lang", F.lit("en"))

    merge_into(delta_spark, first, dpath, ["doc_id", "chunk_index"])
    merge_into(
        delta_spark, second, dpath, ["doc_id", "chunk_index"], schema_mode="merge"
    )

    mt = MergeTable(mpath, ["doc_id", "chunk_index"])
    mt.merge(first)
    mt.merge(second, schema_mode="merge")

    cols = ["doc_id", "chunk_index", "text", "lang"]
    d = sorted(
        map(tuple, delta_spark.read.format("delta").load(dpath).select(cols).collect())
    )
    m = sorted(map(tuple, mt.read(delta_spark).select(cols).collect()))
    assert d == m


def test_delta_on_duplicate_any_keeps_one(delta_spark, tmp_path):
    """on_duplicate='any': two source rows with the same key inside ONE
    batch collapse before the MERGE (Delta would otherwise raise on
    multiple source matches) — last-writer-wins is the sink contract."""
    path = str(tmp_path / "delta_dups")
    merge_into(
        delta_spark, _rows(delta_spark, [(1, 0, "x"), (1, 0, "y")]), path,
        ["doc_id", "chunk_index"], on_duplicate="any",
    )
    got = delta_spark.read.format("delta").load(path).collect()
    assert len(got) == 1 and got[0].doc_id == 1
