"""Event-time windowed aggregations over streams (SURVEY §2.I extension:
the reference has no watermarks/windows; these are the Spark-native
extensions the north star calls for).

Each helper has a batch twin in plans/relational.py (date_trunc rollup,
gaps-and-islands sessionization) that carries the DuckDB oracle; the
streaming forms here are covered by tests/test_streaming.py with
deterministic file-source input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, window_len: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time window: count + sum(value) per (window, type).
    Late rows beyond the watermark are dropped; state is bounded."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_rates(events: DataFrame, window_len: str = "1 hour", slide: str = "15 minutes",
                  watermark: str = "2 hours") -> DataFrame:
    """Sliding window event rates per type."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window_len, slide).alias("w"), "event_type")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows keyed by user (30-min inactivity gap) — the streaming
    twin of the batch gaps-and-islands query (plans/relational.py
    sessionization, which carries the DuckDB oracle)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def stream_stream_click_purchase(events: DataFrame, window_minutes: int = 30,
                                 watermark: str = "1 hour") -> DataFrame:
    """Stream-stream time-interval join (extension — SURVEY §2.I lists it as
    absent from the reference): purchases joined to same-user clicks from the
    preceding ``window_minutes``. Both sides carry watermarks and the join
    condition bounds event-time distance, so Spark can expire join state —
    the unbounded-state stream join is exactly what we must NOT write at
    100 TB/day. Batch twin with DuckDB oracle: plans/relational.py
    range_join_click_window."""
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    if events.isStreaming:
        p = p.withWatermark("p_ts", watermark)
        c = c.withWatermark("c_ts", watermark)
    return p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
        "inner",
    ).select("purchase_id", "click_id", "p_ts", "c_ts")
