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


class TestMaintenance:
    def test_upsert_idempotent_and_overwrites(self, spark, sf_dir, tmp_path):
        from frappe_data_pipelines_spark.sources.maintenance import upsert_parquet

        path = str(tmp_path / "tbl")
        base = load_table(spark, sf_dir, "documents").select("doc_id", "lang").limit(50)
        upsert_parquet(spark, base, path, ["doc_id"])
        assert spark.read.parquet(path).count() == 50

        # re-delivery of the same batch: no dupes (I5)
        upsert_parquet(spark, base, path, ["doc_id"])
        assert spark.read.parquet(path).count() == 50

        # keyed overwrite wins
        patch = base.limit(5).withColumn("lang", F.lit("xx"))
        upsert_parquet(spark, patch, path, ["doc_id"])
        out = spark.read.parquet(path)
        assert out.count() == 50
        assert out.filter(F.col("lang") == "xx").count() == 5

    def test_compaction_reduces_files(self, spark, sf_dir, tmp_path):
        import glob
        from frappe_data_pipelines_spark.sources.maintenance import compact_parquet

        path = str(tmp_path / "many")
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
        docs.repartition(20).write.parquet(path)
        before = len(glob.glob(path + "/*.parquet"))
        n = compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)
        after = len(glob.glob(path + "/*.parquet"))
        assert before >= 20 and n == 1 and after == 1
        assert spark.read.parquet(path).count() == docs.count()
