"""Streaming source adapters — the ingest pipeline is source-agnostic.

The reference's trigger is a row-insert hook (hooks.py:28-33); the Spark
restatement in ``streaming/ingest.py`` defaults to a file source. This
module adds the message-bus shape: a stream carrying the Kafka wire columns
``(key BINARY, value BINARY, topic, partition, offset, timestamp)`` plus a
parser from that envelope back to the document schema.

With Kafka jars on the cluster the real source is a drop-in::

    raw = (spark.readStream.format("kafka")
           .option("kafka.bootstrap.servers", ...)
           .option("subscribe", "documents").load())
    docs = parse_document_messages(raw)
    start_ingest_stream(spark, ..., source_stream=docs)

This container has no Kafka, so ``kafka_shaped_stream`` synthesizes the
identical envelope from Spark's deterministic ``rate-micro-batch`` source —
the parse, the ingest contract, and the trigger/backpressure behavior are
the real code paths; only the transport is simulated.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.streaming.ingest import DOC_SCHEMA

KAFKA_WIRE_COLUMNS = ["key", "value", "topic", "partition", "offset", "timestamp"]


def kafka_shaped_stream(
    spark: SparkSession,
    rows_per_batch: int = 50,
    num_partitions: int = 4,
    topic: str = "documents",
) -> DataFrame:
    """A streaming DataFrame with Kafka's exact wire schema, fed by the
    deterministic ``rate-micro-batch`` source (``value`` 0,1,2,... advancing
    ``rows_per_batch`` per trigger). Message payloads are JSON documents
    derived from the offset, so every batch is reproducible."""
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", num_partitions)
        .load()
    )
    doc_json = F.to_json(
        F.struct(
            F.col("value").alias("doc_id"),
            F.concat(
                F.lit("stream document "),
                F.col("value").cast("string"),
                F.lit(" body words for chunking alpha bravo charlie delta"),
            ).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("kafka").alias("source"),
        )
    )
    return raw.select(
        F.col("value").cast("string").cast("binary").alias("key"),
        doc_json.cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.col("value"), F.lit(num_partitions)).cast("int").alias("partition"),
        F.col("value").alias("offset"),
        F.col("timestamp"),
    )


def parse_document_messages(messages: DataFrame) -> DataFrame:
    """Kafka envelope → document rows (DOC_SCHEMA): JSON-decode ``value``,
    recompute ``n_chars`` from the decoded text (the producer may omit it),
    drop undecodable messages into NULL-id rows the ingest dead-letters
    rather than failing the batch on a poison message."""
    parsed = messages.select(
        F.from_json(F.col("value").cast("string"), DOC_SCHEMA).alias("doc"),
        "offset",
    )
    return parsed.select(
        F.col("doc.doc_id").alias("doc_id"),
        F.col("doc.text").alias("text"),
        F.col("doc.lang").alias("lang"),
        F.col("doc.source").alias("source"),
        F.coalesce(
            F.col("doc.n_chars"), F.length(F.coalesce(F.col("doc.text"), F.lit("")))
        ).cast("bigint").alias("n_chars"),
    )


def encode_document_messages(docs: DataFrame, topic: str = "documents") -> DataFrame:
    """Inverse adapter (producer side): document rows → Kafka wire rows,
    key = doc_id bytes, value = JSON payload — what ``df.write.format(
    'kafka')`` expects. Used by tests to round-trip the envelope."""
    return docs.select(
        F.col("doc_id").cast("string").cast("binary").alias("key"),
        F.to_json(F.struct("doc_id", "text", "lang", "source", "n_chars"))
        .cast("binary")
        .alias("value"),
        F.lit(topic).alias("topic"),
    )


def _payload_of(row) -> dict:
    """Test helper: decode one wire row's JSON payload."""
    return json.loads(bytes(row["value"]).decode("utf-8"))


def warc_document_stream(
    spark: SparkSession, warc_dir: str, max_files_per_trigger: int = 2
) -> DataFrame:
    """Streaming WARC ingestion: watch a directory of crawl archives and
    emit DOC_SCHEMA rows — binaryFile streaming source → WARC record parse
    → HTML boilerplate removal, all inside the micro-batch plan (both
    parse stages are Arrow maps, so the streaming DAG stays shuffle-free
    up to the ingest sinks). Plugs straight into
    ``start_ingest_stream(source_stream=...)``: crawl archive drops become
    searchable chunks with the same exactly-once contract as every other
    source."""
    from frappe_data_pipelines_spark.operators.htmlmini import html_extract
    from frappe_data_pipelines_spark.sources.warc import read_warc

    raw = (
        spark.readStream.format("binaryFile")
        # streaming sources require an explicit schema; this is binaryFile's
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "*.warc.gz")
        .load(warc_dir)
    )
    recs = read_warc(raw.select("path", "content"))
    pages = html_extract(
        recs.select("uri", F.col("text").alias("html")), html_col="html", id_col="uri"
    )
    return pages.select(
        F.regexp_extract("uri", r"doc_(\d+)\.html", 1).cast("long").alias("doc_id"),
        F.col("main_text").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("warc").alias("source"),
        F.length("main_text").cast("bigint").alias("n_chars"),
    )
