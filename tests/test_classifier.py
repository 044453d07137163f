"""Naive-Bayes classifier (operators/classifier.py): learning behavior on a
corpus with real signal — the corpus-level catalog queries prove distributed
parity, these prove the model actually separates classes."""

from __future__ import annotations

from pyspark.sql import functions as F

from frappe_data_pipelines_spark.operators.classifier import nb_score, nb_train

POS = [
    "tensor gradient layer attention embedding",
    "gradient descent layer norm attention",
    "embedding layer tensor attention head",
    "attention gradient tensor embedding softmax",
]
NEG = [
    "invoice shipment pallet warehouse freight",
    "pallet freight invoice customs warehouse",
    "warehouse shipment customs freight invoice",
    "freight pallet shipment invoice customs",
]


def _corpus(spark, extra=()):
    rows = [(i, t, True) for i, t in enumerate(POS)]
    rows += [(100 + i, t, False) for i, t in enumerate(NEG)]
    rows += list(extra)
    return spark.createDataFrame(rows, "doc_id long, text string, is_pos boolean")


def _fit(spark, extra=(), min_count=2):
    docs = _corpus(spark, extra)
    weights, prior = nb_train(docs, label=F.col("is_pos"), min_count=min_count)
    return docs, weights, prior


def test_weight_signs_follow_classes(spark):
    _, weights, _ = _fit(spark)
    w = {r["term"]: float(r["w"]) for r in weights.collect()}
    assert w["attention"] > 0 and w["gradient"] > 0
    assert w["invoice"] < 0 and w["freight"] < 0


def test_min_count_prunes_singletons(spark):
    extra = [(200, "attention hapaxlegomenon", True)]
    _, weights, _ = _fit(spark, extra, min_count=2)
    terms = {r["term"] for r in weights.collect()}
    assert "hapaxlegomenon" not in terms
    assert "attention" in terms


def test_held_out_docs_classified_correctly(spark):
    docs, weights, prior = _fit(spark)
    held = spark.createDataFrame(
        [(1000, "attention layer tensor"), (1001, "customs pallet invoice")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred"] for r in nb_score(held, weights, prior).collect()}
    assert got[1000] is True
    assert got[1001] is False


def test_multiplicity_raises_score(spark):
    docs, weights, prior = _fit(spark)
    held = spark.createDataFrame(
        [(1, "attention"), (2, "attention attention attention")],
        "doc_id long, text string",
    )
    s = {r["doc_id"]: r["nb_llr"] for r in nb_score(held, weights, prior).collect()}
    assert s[2] > s[1] > 0


def test_all_pruned_doc_scores_at_prior(spark):
    docs, weights, prior = _fit(spark)
    held = spark.createDataFrame([(1, "zzz qqq www")], "doc_id long, text string")
    (row,) = nb_score(held, weights, prior).collect()
    assert row["nb_llr"] == float(prior.collect()[0]["p"])
