"""I6 progress telemetry as a StreamingQueryListener (SURVEY §2.I maps the
reference's processed_chunks/progress_percent updates —
process_embedding.py:363-368 — to listener + metrics table).

``ProgressRecorder`` collects per-batch progress rows (rows/sec, batch
duration, input rows) in memory and optionally appends them to a parquet
metrics table; attach with ``spark.streams.addListener``. This complements
the in-band metrics the ingest ``foreachBatch`` writes: the listener sees
engine-level numbers (source offsets, processing time) the batch body
can't."""

from __future__ import annotations

import json

from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Record micro-batch progress; query with ``.progress_rows``."""

    def __init__(self, spark=None, metrics_path: str | None = None):
        self.spark = spark
        self.metrics_path = metrics_path
        self.progress_rows: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        row = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "processed_rows_per_second": float(p.processedRowsPerSecond or 0.0),
            "batch_duration_ms": int(json.loads(p.json).get("batchDuration", 0)),
        }
        self.progress_rows.append(row)
        if self.spark is not None and self.metrics_path:
            self.spark.createDataFrame(
                [tuple(row.values())],
                "query_id string, batch_id long, num_input_rows long,"
                " processed_rows_per_second double, batch_duration_ms long",
            ).write.mode("append").parquet(self.metrics_path)

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    def onQueryIdle(self, event) -> None:  # pragma: no cover — timing-dependent
        pass
