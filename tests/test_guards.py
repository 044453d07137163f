"""Small-by-contract collect guards (VERDICT r2 #6 / r3 #7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.operators.guards import collect_bounded


def test_collect_bounded_trips_on_oversize(spark):
    df = spark.range(100)
    with pytest.raises(ValueError, match="small-by-contract cap"):
        collect_bounded(df, 10, "test collect")


def test_collect_bounded_passes_at_cap(spark):
    df = spark.range(10)
    rows = collect_bounded(df, 10, "test collect")
    assert len(rows) == 10


def test_collect_bounded_preserves_order(spark):
    df = spark.range(50).orderBy(F.col("id").desc())
    rows = collect_bounded(df, 100, "test collect")
    assert [r["id"] for r in rows] == list(range(49, -1, -1))


def test_rerank_guard_trips(spark, sf_dir):
    """rerank handed a whole corpus (not an overfetched top-k) fails loudly."""
    from frappe_data_pipelines_spark.operators import guards
    from frappe_data_pipelines_spark.operators.search import rerank_with_provider

    class _EchoProvider:
        def rerank(self, query, texts):
            return list(range(len(texts), 0, -1))

    big = spark.range(0, guards.MAX_RERANK_CANDIDATES + 5).select(
        F.col("id").alias("doc_id"),
        F.lit("text").alias("text"),
        F.rand(seed=1).alias("score"),
    )
    # the guard trips BEFORE the provider try/except — misuse is not
    # swallowed by the rerank-is-an-enhancement fallback
    with pytest.raises(ValueError, match="small-by-contract cap"):
        rerank_with_provider(big, "query", _EchoProvider(), top_k=5)
