"""Collection DDL / introspection (SURVEY §2.A A16).

The reference manages Qdrant collections imperatively: ``ensure_collection``
creates a cosine collection with the configured dimension if missing,
``get_collection_info`` / ``get_all_collections`` / ``test_connection``
introspect it (qdrant_service.py:61-84, 186-238). Spark-first restatement: a
vector collection is a catalog table with a declared schema and table
properties carrying the vector-space contract (dimension, metric). DDL goes
through ``spark.sql`` so it works identically on the in-memory catalog, a
Hive metastore, or Unity-style catalogs; writes validate the dimension
property the way the reference validates at upsert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_DIM = 384  # reference fallback dim, qdrant_service.py:69-72
DEFAULT_METRIC = "cosine"  # fixed at creation, qdrant_service.py:78-84


def ensure_collection(
    spark: SparkSession,
    name: str,
    dim: int = DEFAULT_DIM,
    metric: str = DEFAULT_METRIC,
    location: str | None = None,
) -> None:
    """A16 ``ensure_collection``: CREATE TABLE IF NOT EXISTS with the vector
    contract in table properties. Idempotent, like the reference's
    create-if-missing."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS {name} (
          vec_id STRING,
          embedding ARRAY<FLOAT>,
          payload_doc_id BIGINT,
          payload_chunk_index INT,
          payload_text STRING
        ) USING PARQUET{loc}
        TBLPROPERTIES ('vector.dim' = '{int(dim)}', 'vector.metric' = '{metric}')
        """
    )


def get_collection_info(spark: SparkSession, name: str) -> dict:
    """A16 ``get_collection_info``: schema + vector contract + row count."""
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {name}").collect()
    }
    return {
        "name": name,
        "dim": int(props.get("vector.dim", DEFAULT_DIM)),
        "metric": props.get("vector.metric", DEFAULT_METRIC),
        "schema": spark.table(name).schema.simpleString(),
        "points_count": spark.table(name).count(),
    }


def get_all_collections(spark: SparkSession) -> list[str]:
    """A16 ``get_all_collections``: tables carrying a vector.dim property."""
    out = []
    for row in spark.sql("SHOW TABLES").collect():
        tbl = row["tableName"]
        try:
            props = {
                r["key"]: r["value"]
                for r in spark.sql(f"SHOW TBLPROPERTIES {tbl}").collect()
            }
        except Exception:  # noqa: BLE001 — temp views have no properties
            continue
        if "vector.dim" in props:
            out.append(tbl)
    return out


def upsert_vectors(spark: SparkSession, name: str, vectors: DataFrame) -> None:
    """A13 vector upsert sink with the reference's write-time contract: the
    embedding length must equal the collection dimension (the reference
    auto-detects and validates dims, embedding_service.py:243-245). Append
    is idempotent when vec_id is a content hash (H13); on Delta this becomes
    MERGE on vec_id."""
    info = get_collection_info(spark, name)
    bad = vectors.filter(F.size("embedding") != F.lit(info["dim"])).limit(1).count()
    if bad:
        raise ValueError(f"embedding dim != collection dim {info['dim']}")
    vectors.select(
        "vec_id", "embedding", "payload_doc_id", "payload_chunk_index", "payload_text"
    ).write.insertInto(name)


def test_connection(spark: SparkSession) -> bool:
    """A16 ``test_connection``: catalog reachable and queryable."""
    try:
        spark.sql("SHOW TABLES").collect()
        return True
    except Exception:  # noqa: BLE001
        return False
