"""A16 collection DDL / introspection + A13 validated upsert sink
(reference: qdrant_service.py:61-115, 186-238)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# `test_connection` is a library function (the reference's Qdrant
# health-check); alias it so pytest doesn't collect it as a test and warn
# about its non-None return value
from frappe_data_pipelines_spark.sources.collections import (
    ensure_collection,
    get_all_collections,
    get_collection_info,
    upsert_vectors,
)
from frappe_data_pipelines_spark.sources.collections import (
    test_connection as check_connection,
)
from frappe_data_pipelines_spark.sources.tables import load_table


def test_collection_ddl_roundtrip(spark, sf_dir, tmp_path):
    name = "test_vectors_a16"
    ensure_collection(spark, name, dim=64, location=str(tmp_path / "tbl"))
    ensure_collection(spark, name, dim=64, location=str(tmp_path / "tbl"))  # idempotent

    info = get_collection_info(spark, name)
    assert info["dim"] == 64 and info["metric"] == "cosine"
    assert info["points_count"] == 0
    assert name in get_all_collections(spark)
    assert check_connection(spark)

    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    rows = emb.select(
        F.col("vec_id").cast("string").alias("vec_id"),
        "embedding",
        F.lit(1).cast("bigint").alias("payload_doc_id"),
        F.lit(0).cast("int").alias("payload_chunk_index"),
        F.lit("t").alias("payload_text"),
    )
    upsert_vectors(spark, name, rows)
    assert get_collection_info(spark, name)["points_count"] == 20

    # dimension contract enforced at write
    bad = rows.withColumn("embedding", F.slice("embedding", 1, 8))
    with pytest.raises(ValueError, match="dim"):
        upsert_vectors(spark, name, bad)
    spark.sql(f"DROP TABLE {name}")
