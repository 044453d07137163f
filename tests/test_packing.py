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


class TestRebalance:
    def test_tail_merge_reduces_packs_conserves_docs(self, spark, sf_dir):
        from frappe_data_pipelines_spark.operators.packing import (
            pack_sequences,
            rebalance_tail_packs,
        )
        from frappe_data_pipelines_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        packs = pack_sequences(docs, budget_tokens=2048, n_shards=16)
        packs.cache()
        reb = rebalance_tail_packs(packs, budget_tokens=2048, fill_threshold=0.85)
        reb.cache()
        before = packs.collect()
        after = reb.collect()
        # doc conservation: same multiset of docs, same token mass
        docs_before = sorted(d for r in before for d in r.doc_ids)
        docs_after = sorted(d for r in after for d in r.doc_ids)
        assert docs_before == docs_after
        assert sum(r.total_tokens for r in before) == sum(r.total_tokens for r in after)
        # budget still respected (atoms never split)
        singleton_ok = {r.pack_id for r in after if r.n_docs == 1}
        for r in after:
            assert r.total_tokens <= 2048 or r.pack_id in singleton_ok
        # strictly fewer (or equal) packs, and fewer underfilled tails
        assert len(after) <= len(before)
        floor = int(2048 * 0.85)
        tails_before = sum(1 for r in before if r.total_tokens < floor)
        tails_after = sum(1 for r in after if r.total_tokens < floor)
        assert tails_after <= tails_before
        # first-fit invariant: among merged packs at most one can be <= B/2
        # (a second one's atoms would have fit into the first)
        half_empty = [r for r in after if r.pack_id.startswith("r-") and r.total_tokens <= 1024]
        assert len(half_empty) <= 1, half_empty

    def test_rebalance_deterministic(self, spark, sf_dir):
        from frappe_data_pipelines_spark.operators.packing import (
            pack_sequences,
            rebalance_tail_packs,
        )
        from frappe_data_pipelines_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        a = rebalance_tail_packs(pack_sequences(docs, n_shards=8)).collect()
        b = rebalance_tail_packs(pack_sequences(docs, n_shards=8)).collect()
        key = lambda r: r.pack_id  # noqa: E731
        assert sorted(a, key=key) == sorted(b, key=key)
