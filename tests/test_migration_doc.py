"""docs/MIGRATION.md is executable documentation (VERDICT r8 task 8): this
smoke test extracts every ```python fence from the page and runs them IN
ORDER in one shared namespace, with the page's free variables (spark,
documents_path, jobs_df, docs, binary_df, embeddings_df, docs_df, sf_dir,
input_dir/output_dir/checkpoint_dir) bound the way a migrating user would
bind them. A snippet that drifts from the API breaks this test, so the
quickstart cannot rot."""

from __future__ import annotations

import os
import re

import pytest


def _python_blocks() -> list[str]:
    doc = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "MIGRATION.md",
    )
    with open(doc) as f:
        text = f.read()
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


def test_migration_doc_snippets_execute(spark, tmp_path):
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # the page's free variables, bound as a migrating user would bind them
    documents_path = str(tmp_path / "files")
    docs.limit(10).select(
        "doc_id", "text", "lang",
        F.lit("src").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    ).write.parquet(documents_path)
    jobs_df = spark.createDataFrame(
        [(0, "Completed", 0), (1, "Failed", 1), (2, "Queued", 0)],
        "source_doc_id long, status string, retry_count int",
    )
    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    checkpoint_dir = str(tmp_path / "ckpt")
    os.makedirs(input_dir)
    docs.limit(8).write.mode("append").parquet(input_dir)

    fixtures = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "frappe_data_pipelines_spark", "resources", "fixtures",
    )
    with open(os.path.join(fixtures, "sample.pdf"), "rb") as f:
        binary_df = spark.createDataFrame(
            [("/fixtures/sample.pdf", bytearray(f.read()))],
            "path string, content binary",
        )
    embeddings_df = spark.read.parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).limit(200)
    docs_df = docs.select("doc_id", "text").limit(200)

    ns: dict = {
        "spark": spark,
        "documents_path": documents_path,
        "jobs_df": jobs_df,
        "docs": docs.limit(20),
        "binary_df": binary_df,
        "embeddings_df": embeddings_df,
        "docs_df": docs_df,
        "sf_dir": sf_dir,
        "input_dir": input_dir,
        "output_dir": output_dir,
        "checkpoint_dir": checkpoint_dir,
        "print": lambda *a, **k: None,  # lint_plan's demo print stays quiet
    }

    blocks = _python_blocks()
    assert len(blocks) >= 9, "MIGRATION.md lost its snippets"
    for i, block in enumerate(blocks):
        if "get_spark()" in block:
            continue  # session snippet: the test session already exists
        try:
            exec(compile(block, f"MIGRATION.md[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure is the signal
            pytest.fail(f"MIGRATION.md block {i} no longer executes: {e}\n{block}")

    # the ingestion snippet really ran: its stream drained the backlog
    # (exactly-once mode: the chunk sink is the MergeTable at chunks/)
    from frappe_data_pipelines_spark.sources.merge import MergeTable

    assert MergeTable(os.path.join(output_dir, "chunks")).read(spark).count() > 0
    # the batch snippet returned live plans
    assert ns["chunks"].count() >= 0
