"""Format-generic sources/sinks (load_any/write_any) round-trips."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.sources.tables import load_any, load_table, write_any

SCHEMA = "doc_id BIGINT, lang STRING, n_chars BIGINT"


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_roundtrip(spark, sf_dir, tmp_path, fmt):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = str(tmp_path / f"docs_{fmt}")
    write_any(docs, path, fmt=fmt)
    back = load_any(spark, path, fmt=fmt, schema=None if fmt in ("parquet", "orc") else SCHEMA)
    assert back.count() == docs.count()
    a = {tuple(r) for r in docs.collect()}
    b = {tuple(r) for r in back.select("doc_id", "lang", "n_chars").collect()}
    assert a == b


def test_csv_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        load_any(spark, str(tmp_path), fmt="csv")
