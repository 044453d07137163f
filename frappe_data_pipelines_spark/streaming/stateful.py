"""Custom stateful streaming operators (applyInPandasWithState +
Spark 4.x transformWithStateInPandas).

SURVEY §2.I marks the reference's incremental semantics as an event-bus/job
queue; Spark's arbitrary-stateful API is the native home for the pieces that
need *memory across micro-batches*. First citizen: cross-batch exact dedup —
a training-data pipeline ingesting 100 TB of crawled documents must drop
re-crawled duplicates across arbitrarily distant micro-batches, which a
per-batch ``dropDuplicates`` cannot do (and an unbounded
``dropDuplicates`` on a stream would grow state forever without a TTL).

Design for scale:
  * state is keyed by the 32-hex md5 fingerprint, so state size is
    O(distinct docs), each entry a few dozen bytes — not the text;
  * the shuffle key is the fingerprint (uniform, skew-free);
  * optional processing-time TTL bounds state for endless streams;
  * first-seen-wins is deterministic within a batch (rows sorted by id).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from frappe_data_pipelines_spark.functions.text import fingerprint_expr

_OUT_SCHEMA = StructType(
    [
        StructField("fp", StringType()),
        StructField("doc_id", LongType()),
        StructField("n_dupes_dropped", LongType()),
        StructField("first_in_stream", BooleanType()),
    ]
)
_STATE_SCHEMA = StructType(
    [StructField("first_doc_id", LongType()), StructField("n_seen", LongType())]
)


def dedup_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ttl_minutes: int | None = None,
    fp_col: str | None = None,
) -> DataFrame:
    """Streaming exact dedup: emit one row per *newly seen* fingerprint;
    duplicates in the same or any later micro-batch are dropped (counted in
    state and reported on the emitted row of their key's next update).

    ``fp_col`` keys the state on a caller-provided fingerprint column
    instead of the text hash — e.g. the perceptual dHash from
    ``operators/imagehash.py``, which turns this into a streaming
    perceptual image dedup (re-encodes/rescales of an already-ingested
    image are dropped at the door). Default is the exact text fingerprint.

    Works on a streaming DataFrame via ``applyInPandasWithState``; on a batch
    DataFrame it degrades to the equivalent groupBy (first id + dupe count)
    so the same callable serves tests and backfills.
    """
    fp = (
        F.col(fp_col).cast("string")
        if fp_col is not None
        else fingerprint_expr(F.col(text_col))
    )
    with_fp = docs.select(fp.alias("fp"), F.col(id_col).alias("doc_id"))

    if not docs.isStreaming:
        return (
            with_fp.groupBy("fp")
            .agg(
                F.min("doc_id").alias("doc_id"),
                (F.count("*") - 1).cast("bigint").alias("n_dupes_dropped"),
                F.lit(True).alias("first_in_stream"),
            )
            .select("fp", "doc_id", "n_dupes_dropped", "first_in_stream")
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (fp,) = key
        if state.hasTimedOut:
            # TTL expiry: forget the key; a re-crawl after the TTL re-emits.
            state.remove()
            return
        first_doc, n_seen = state.get if state.exists else (None, 0)
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(x) for x in pdf["doc_id"])
        ids.sort()
        emit = None
        if first_doc is None and ids:
            first_doc = ids[0]
            emit = {
                "fp": fp,
                "doc_id": first_doc,
                "n_dupes_dropped": n_seen + len(ids) - 1,
                "first_in_stream": True,
            }
        n_seen += len(ids)
        state.update((first_doc, n_seen))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if emit is not None:
            yield pd.DataFrame([emit])

    return with_fp.groupBy("fp").applyInPandasWithState(
        dedup_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def tws_available() -> bool:
    """transformWithStateInPandas needs protobuf for its driver worker; this
    container ships Spark 4.1 with the API but without python-protobuf, so
    the operator is gated (SURVEY env rule: gate missing deps, don't crash)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_activity_stream(events: DataFrame) -> DataFrame:
    """Second-generation stateful operator (Spark 4.x
    ``transformWithStateInPandas``): running per-user counters (event count,
    total value) maintained in typed ValueState and re-emitted each time the
    user appears in a micro-batch — the continuously-updated profile table a
    training pipeline keeps per source/user.

    Versus ``applyInPandasWithState``: explicit named state variables,
    composable timers, and state schema evolution. Requires python-protobuf
    at runtime (``tws_available()``); on a batch DataFrame it degrades to the
    equivalent groupBy so the semantics stay testable everywhere."""
    if events.isStreaming and not tws_available():
        raise ImportError(
            "transformWithStateInPandas requires python-protobuf; "
            "use dedup_stream/applyInPandasWithState operators instead"
        )
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    class ActivityProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getValueState("counts", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            prior = self._counts.get() if self._counts.exists() else (0, 0.0)
            n, total = int(prior[0]), float(prior[1])
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._counts.update((n, total))
            yield pd.DataFrame(
                {"user_id": [int(key[0])], "n_events": [n], "total_value": [round(total, 6)]}
            )

        def close(self) -> None:
            pass

    src = events.select("user_id", "value")
    if not events.isStreaming:
        return (
            src.groupBy("user_id")
            .agg(
                F.count("*").cast("bigint").alias("n_events"),
                F.round(F.sum("value"), 6).alias("total_value"),
            )
        )
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ActivityProcessor(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
