"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``frappe_data_pipelines_spark``; this file only
adapts the engine's query catalog to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from frappe_data_pipelines_spark.plans import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents → recursive chunks → deterministic embeddings →
    cosine top-10 search (the reference's full ingest+search path, SURVEY §3)."""
    fn = catalog.queries()["flagship_chunk_embed_search"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return catalog.oracle_sql()
