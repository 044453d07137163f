"""Distributed Naive-Bayes text classifier — the quality-filter bootstrap.

Web-scale pipelines (CCNet §4.3, GPT-3 appendix A, LLaMA) filter crawl text
with a linear classifier trained to separate a reference class from the
rest; fastText is the usual implementation. Multinomial Naive Bayes is the
aggregation-only member of that family: training is nothing but token
counts per class, so on Spark it is two groupBys — no gradient loop, no
driver-held model, no UDF — and scoring is one join + one exact-decimal
sum. That makes it the rare trainable model whose train AND score paths
are both fully expressible in ANSI SQL, hence DuckDB-oracled end to end
(`nb_quality_classifier` / `nb_quality_confusion` in the catalog).

Numerical parity contract: per-term log-likelihood-ratio weights are
rounded to 6 decimals and cast to DECIMAL(28,6) BEFORE the per-document
sum, so Spark's parallel partial aggregation and DuckDB's serial fold add
the same exact decimals in any order — bit-identical scores (the same
move the catalog uses for monetary aggregates; see plans/catalog.py).

Scale: the model is a (term → weight) table bounded by `min_count` vocab
pruning. Training shuffles once on term; scoring shuffles tokens once on
term (AQE broadcasts the weight table when it is small) and once on doc_id
for the sum. Nothing ever collects to the driver.

Reference: no counterpart — the reference has no trainable component; this
is part of the beyond-the-reference training-data surface (SURVEY §2
extension block, like DSIR `operators/selection.py`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.functions.text import tokens_expr

ALPHA = 0.5  # Laplace/Lidstone smoothing
_DEC = "decimal(28,6)"


def nb_train(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    min_count: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Fit multinomial NB: returns (weights, prior).

    ``weights``: one row per kept vocab term — (term, w DECIMAL(28,6)) where
    w = round(ln P(term|pos) − ln P(term|neg), 6) under Lidstone smoothing
    computed over the *pruned* vocabulary (terms with total count ≥
    ``min_count``; rarer terms contribute exactly 0 at scoring time by
    dropping out of the join — the convention the oracle mirrors).

    ``prior``: single row (p DECIMAL(28,6)) = round(ln(n_pos/n_neg), 6).
    """
    from frappe_data_pipelines_spark.sources.tables import spread_scan

    # spread before the token explode: single-small-file scans plan as one
    # partition and would serialize the tokenize+explode (no-op at scale)
    toks = spread_scan(docs.select(label.alias("pos"), F.col(text_col))).select(
        "pos", F.explode(tokens_expr(F.col(text_col))).alias("term")
    )
    counts = (
        toks.groupBy("term")
        .agg(
            F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("long").alias("c1"),
            F.sum(F.when(F.col("pos"), 0).otherwise(1)).cast("long").alias("c0"),
        )
        .filter((F.col("c1") + F.col("c0")) >= min_count)
    )
    totals = counts.agg(
        F.sum("c1").cast("double").alias("n1_tok"),
        F.sum("c0").cast("double").alias("n0_tok"),
        F.count("*").cast("double").alias("vocab"),
    )
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "term",
        F.round(
            F.log((F.col("c1") + ALPHA) / (F.col("n1_tok") + ALPHA * F.col("vocab")))
            - F.log((F.col("c0") + ALPHA) / (F.col("n0_tok") + ALPHA * F.col("vocab"))),
            6,
        )
        .cast(_DEC)
        .alias("w"),
    )
    prior = docs.agg(
        F.round(
            F.log(
                F.sum(F.when(label, 1).otherwise(0)).cast("double")
                / F.sum(F.when(label, 0).otherwise(1)).cast("double")
            ),
            6,
        )
        .cast(_DEC)
        .alias("p")
    )
    return weights, prior


def nb_score(
    docs: DataFrame,
    weights: DataFrame,
    prior: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document: (id, nb_llr DOUBLE, pred BOOLEAN).

    nb_llr = prior + Σ w(term) over the document's tokens *with
    multiplicity* (multinomial NB); pred = nb_llr ≥ 0. Documents whose
    tokens were all pruned score at the bare prior (left join + coalesce),
    so the operator is total over the corpus."""
    from frappe_data_pipelines_spark.sources.tables import spread_scan

    toks = spread_scan(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(tokens_expr(F.col(text_col))).alias("term")
    )
    sums = (
        toks.join(weights, "term")
        .groupBy(id_col)
        .agg(F.sum("w").alias("sw"))
    )
    zero = F.lit(0).cast(_DEC)
    return (
        docs.select(id_col)
        .join(sums, id_col, "left")
        .crossJoin(F.broadcast(prior))
        .select(
            F.col(id_col),
            (F.col("p") + F.coalesce(F.col("sw"), zero)).cast("double").alias("nb_llr"),
            ((F.col("p") + F.coalesce(F.col("sw"), zero)) >= 0).alias("pred"),
        )
    )
