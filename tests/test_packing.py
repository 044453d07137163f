"""Sequence-packing property tests (operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from frappe_data_pipelines_spark.functions.text import token_count_expr
from frappe_data_pipelines_spark.operators.packing import pack_sequences
from frappe_data_pipelines_spark.sources.tables import load_table


def test_packing_partitions_corpus(spark, sf_dir):
    """Every document lands in exactly one pack."""
    docs = load_table(spark, sf_dir, "documents")
    packs = pack_sequences(docs, budget_tokens=512, n_shards=8).cache()
    packed_ids = sorted(
        packs.select(F.explode("doc_ids").alias("doc_id")).toPandas()["doc_id"]
    )
    all_ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    assert packed_ids == all_ids


def test_packing_respects_budget(spark, sf_dir):
    """No multi-doc pack exceeds the budget; singleton packs may (doc longer
    than budget is the chunker's job upstream)."""
    docs = load_table(spark, sf_dir, "documents")
    packs = pack_sequences(docs, budget_tokens=512, n_shards=8)
    over = packs.filter((F.col("total_tokens") > 512) & (F.col("n_docs") > 1)).count()
    assert over == 0


def test_packing_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, pack_sequences(docs, 512, 8).collect()))
    b = sorted(map(tuple, pack_sequences(docs, 512, 8).collect()))
    assert a == b


def test_packing_fill_efficiency(spark, sf_dir):
    """FFD should fill packs reasonably densely — mean multi-doc pack
    utilization above 80% on this corpus."""
    docs = load_table(spark, sf_dir, "documents")
    tot = docs.select(F.sum(token_count_expr(F.col("text"))).alias("t")).first()["t"]
    n_packs = pack_sequences(docs, budget_tokens=512, n_shards=8).count()
    # lower bound on packs = ceil(total/budget); within 1.25x of optimal
    assert n_packs <= (tot // 512 + 8) * 1.25
