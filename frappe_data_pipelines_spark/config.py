"""Engine settings — the reference's ``Data Pipeline Settings`` singleton
(data_pipeline_settings.json, defaults seeded at utils.py:27-41) as a typed
config object (SURVEY §1.1: "engine config object, not a table").

Secrets (API keys) are deliberately NOT fields here — they stay in the
environment / secret manager and never travel into Spark conf or columns
(the reference stores them as Password fields; same contract)."""

from __future__ import annotations

from dataclasses import asdict, dataclass, field, fields


@dataclass
class EngineSettings:
    # processing gates (drive_file_handler.py:28-61)
    enable_auto_processing: bool = True
    enabled_file_types: list[str] = field(
        default_factory=lambda: ["txt", "md", "pdf", "docx", "png", "jpg", "jpeg"]
    )
    max_file_size_mb: int = 50                      # utils.py:30

    # chunking (utils.py:31-32; chunking_service.py:186-192, 512-517)
    chunk_size: int = 1000
    chunk_overlap: int = 200
    semantic_chunk_target: int = 2000
    semantic_chunk_overlap: int = 400
    chunking_strategy: str = "recursive"            # recursive | semantic | hybrid

    # smart pipeline toggles (process_embedding.py:52-59)
    enable_smart_pipeline: bool = False
    enable_semantic_chunking: bool = False
    enable_contextual_enrichment: bool = False
    enable_hybrid_search: bool = False

    # embedding / vector store (embedding_service.py:16-69, qdrant_service.py:61-84)
    embedding_provider: str = "hashing"             # deterministic default
    embedding_dim: int = 64
    collection_name: str = "document_chunks"
    vector_metric: str = "cosine"

    # search (search_service.py:66, 83, 143, 165)
    search_top_k: int = 10
    per_document_top_k: int = 5
    similar_chunks_top_k: int = 5
    rerank_overfetch: int = 5

    # job management (process_embedding.py:527, 554)
    max_retries: int = 3
    retention_days: int = 30

    def validate(self) -> "EngineSettings":
        if self.chunk_overlap >= self.chunk_size:
            raise ValueError("chunk_overlap must be < chunk_size")
        if self.semantic_chunk_overlap >= self.semantic_chunk_target:
            raise ValueError("semantic_chunk_overlap must be < semantic_chunk_target")
        if self.chunking_strategy not in ("recursive", "semantic", "hybrid"):
            raise ValueError(f"unknown chunking_strategy {self.chunking_strategy!r}")
        if self.vector_metric != "cosine":
            raise ValueError("only cosine is supported (reference parity)")
        for f_ in ("embedding_dim", "max_file_size_mb", "search_top_k", "max_retries",
                   "retention_days", "rerank_overfetch"):
            if getattr(self, f_) <= 0:
                raise ValueError(f"{f_} must be positive")
        return self

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "EngineSettings":
        known = {f_.name for f_ in fields(cls)}
        unknown = set(d) - known
        if unknown:
            raise ValueError(f"unknown settings: {sorted(unknown)}")
        return cls(**d).validate()

    @property
    def effective_chunk_params(self) -> tuple[int, int]:
        """(size, overlap) for the active strategy — the factory precedence
        of chunking_service.py:484-522."""
        if self.chunking_strategy in ("semantic", "hybrid"):
            return self.semantic_chunk_target, self.semantic_chunk_overlap
        return self.chunk_size, self.chunk_overlap
