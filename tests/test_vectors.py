"""Vector math + search operator tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_normalize,
    vector_norm,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    data = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [1.0, 1.0, 0.0]),
        (4, [2.0, 0.0, 0.0]),
        (5, [0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(data, "id long, v array<double>")


def test_dot_and_norm(vec_df):
    rows = {r["id"]: r for r in vec_df.select(
        "id",
        dot_product(F.col("v"), F.col("v")).alias("dot"),
        vector_norm(F.col("v")).alias("n"),
    ).collect()}
    assert rows[1]["dot"] == 1.0 and rows[1]["n"] == 1.0
    assert rows[3]["dot"] == 2.0 and abs(rows[3]["n"] - np.sqrt(2)) < 1e-12
    assert rows[5]["dot"] == 0.0


def test_cosine_known_values(vec_df):
    a = F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0))
    rows = {r["id"]: r["c"] for r in vec_df.select(
        "id", cosine_similarity(F.col("v"), a).alias("c")
    ).collect()}
    assert rows[1] == 1.0
    assert rows[2] == 0.0
    assert abs(rows[3] - 1 / np.sqrt(2)) < 1e-12
    assert rows[4] == 1.0
    assert rows[5] is None  # zero vector → NULL (SQL division semantics)


def test_l2_normalize(vec_df):
    out = vec_df.filter(F.col("id") == 4).select(l2_normalize(F.col("v")).alias("u")).first()
    assert out["u"] == [1.0, 0.0, 0.0]


def test_knn_matches_numpy(spark, sf_dir):
    from frappe_data_pipelines_spark.operators.search import knn_topk
    from frappe_data_pipelines_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    q = mat[ids.tolist().index(0)]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(zip(-sims, ids))[:10]
    expected = [int(i) for _, i in order]

    got = [r["vec_id"] for r in knn_topk(emb, list(q), k=10).collect()]
    assert got == expected


def test_embedder_deterministic_and_normalized():
    from frappe_data_pipelines_spark.operators.embed import HashingEmbedder

    e = HashingEmbedder(dim=32)
    v1 = e.embed(["hello world foo"])[0]
    v2 = e.embed(["hello world foo"])[0]
    assert v1 == v2
    assert abs(float(np.linalg.norm(v1)) - 1.0) < 1e-5
    # different text → different vector
    assert e.embed(["completely different text"])[0] != v1
