"""MergeTable schema evolution (sources/merge.py): Delta-style mergeSchema
semantics on the log-backed tier — new columns append without rewriting
untouched buckets, missing source columns NULL-fill, type conflicts refuse,
strict mode refuses any drift, and time travel keeps each epoch's schema."""

from __future__ import annotations

import pytest

from frappe_data_pipelines_spark.sources.merge import MergeTable


def _table(spark, tmp_path, rows, n_buckets=4):
    t = MergeTable(str(tmp_path / "t"), key_cols=["k"], n_buckets=n_buckets)
    t.merge(spark.createDataFrame(rows, "k long, v string"))
    return t


def test_strict_rejects_new_and_missing_columns(spark, tmp_path):
    t = _table(spark, tmp_path, [(1, "a")])
    with pytest.raises(ValueError, match="schema_mode='merge'"):
        t.merge(spark.createDataFrame([(2, "b", 1.0)], "k long, v string, score double"))
    with pytest.raises(ValueError, match="schema_mode='merge'"):
        t.merge(spark.createDataFrame([(2,)], "k long"))


def test_evolve_adds_column_old_rows_read_null(spark, tmp_path):
    t = _table(spark, tmp_path, [(1, "a"), (2, "b")])
    t.merge(
        spark.createDataFrame([(2, "b2", 0.5)], "k long, v string, score double"),
        schema_mode="merge",
    )
    out = {r["k"]: r for r in t.read(spark).collect()}
    assert t.read(spark).columns == ["k", "v", "score"]
    assert out[1]["score"] is None and out[1]["v"] == "a"
    assert out[2]["score"] == 0.5 and out[2]["v"] == "b2"


def test_evolve_fills_missing_source_column(spark, tmp_path):
    t = _table(spark, tmp_path, [(1, "a")])
    t.merge(spark.createDataFrame([(3,)], "k long"), schema_mode="merge")
    out = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert out == {1: "a", 3: None}


def test_type_conflict_refuses_in_both_modes(spark, tmp_path):
    t = _table(spark, tmp_path, [(1, "a")])
    bad = spark.createDataFrame([(2, 7)], "k long, v long")
    with pytest.raises(ValueError, match="type conflict"):
        t.merge(bad, schema_mode="merge")
    with pytest.raises(ValueError, match="type conflict"):
        t.merge(bad)


def test_untouched_bucket_files_not_rewritten(spark, tmp_path):
    # keys 0..7 across 4 buckets; evolving merge touches ONE key → the
    # other buckets' files stay byte-identical on disk (no global rewrite)
    t = _table(spark, tmp_path, [(i, f"v{i}") for i in range(8)])
    state_before, _, _ = t._snapshot()
    t.merge(
        spark.createDataFrame([(0, "v0x", 9.0)], "k long, v string, score double"),
        schema_mode="merge",
    )
    state_after, _, _ = t._snapshot()
    probe = spark.createDataFrame([(i,) for i in range(8)], "k long")
    from frappe_data_pipelines_spark.sources.merge import _BUCKET

    touched = {
        r["b"]
        for r in probe.select(t._bucket_col().alias("b"))
        .where(probe["k"] == 0)
        .collect()
    }
    for b, dirs in state_before.items():
        if b not in touched:
            assert state_after[b] == dirs  # same physical dirs → untouched
    out = {r["k"]: r["score"] for r in t.read(spark).collect()}
    assert out[0] == 9.0 and all(out[i] is None for i in range(1, 8))


def test_time_travel_keeps_epoch_schema(spark, tmp_path):
    t = _table(spark, tmp_path, [(1, "a")])
    v0_cols = t.read(spark).columns
    t.merge(
        spark.createDataFrame([(2, "b", 1.5)], "k long, v string, score double"),
        schema_mode="merge",
    )
    assert t.read(spark, version=t._versions()[0]).columns == v0_cols
    assert t.read(spark).columns == ["k", "v", "score"]


def test_lookup_and_optimize_on_evolved_table(spark, tmp_path):
    t = _table(spark, tmp_path, [(i, f"v{i}") for i in range(8)])
    t.merge(
        spark.createDataFrame([(1, "v1x", 2.5)], "k long, v string, score double"),
        schema_mode="merge",
    )
    row = t.lookup(spark, {"k": 2}).collect()
    assert row[0]["score"] is None and row[0]["v"] == "v2"
    t.optimize(min_files_per_bucket=1)
    out = {r["k"]: r["score"] for r in t.read(spark).collect()}
    assert out[1] == 2.5 and out[2] is None
    assert t.read(spark).columns == ["k", "v", "score"]
