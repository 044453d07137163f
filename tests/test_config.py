"""EngineSettings (the reference's Data Pipeline Settings singleton)."""

from __future__ import annotations

import pytest

from frappe_data_pipelines_spark.config import EngineSettings


def test_defaults_mirror_reference():
    s = EngineSettings().validate()
    assert (s.chunk_size, s.chunk_overlap) == (1000, 200)        # utils.py:31-32
    assert (s.semantic_chunk_target, s.semantic_chunk_overlap) == (2000, 400)
    assert s.max_file_size_mb == 50                               # utils.py:30
    assert s.max_retries == 3 and s.retention_days == 30
    assert s.search_top_k == 10 and s.rerank_overfetch == 5
    assert s.vector_metric == "cosine"


def test_roundtrip_and_unknown_key():
    s = EngineSettings(chunking_strategy="semantic")
    assert EngineSettings.from_dict(s.to_dict()) == s
    with pytest.raises(ValueError, match="unknown settings"):
        EngineSettings.from_dict({"qdrant_api_key": "nope"})


def test_validation():
    with pytest.raises(ValueError, match="chunk_overlap"):
        EngineSettings(chunk_overlap=1000).validate()
    with pytest.raises(ValueError, match="strategy"):
        EngineSettings(chunking_strategy="docling").validate()
    with pytest.raises(ValueError, match="cosine"):
        EngineSettings(vector_metric="dot").validate()


def test_effective_params_follow_strategy():
    assert EngineSettings().effective_chunk_params == (1000, 200)
    assert EngineSettings(chunking_strategy="hybrid").effective_chunk_params == (2000, 400)
