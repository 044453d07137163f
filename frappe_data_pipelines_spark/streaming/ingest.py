"""Structured Streaming ingest — the reference's event-driven pipeline
(SURVEY §2.I I1–I6) restated as a file-source stream + foreachBatch.

Reference behavior preserved:
  * I1 row-level trigger: ``after_insert`` hook → here a files-source stream;
    each new parquet file under the input dir is a micro-batch
    (hooks.py:28-33, drive_file_handler.py:63-88)
  * I2 job state machine: per-batch job rows written alongside outputs —
    Queued rows appear first, then flip to Completed/Failed in the same
    micro-batch transaction (embedding_job.json:66)
  * I3 failure capture: per-row errors land in a dead-letter column instead
    of failing the batch (process_embedding.py:69-81)
  * I5 idempotence: outputs are keyed by (doc_id, chunk_index); re-delivery
    overwrites the same keys (Qdrant upsert semantics,
    qdrant_service.py:109-113)
  * I6 progress telemetry: per-batch counts appended to a metrics table

The default chunk sink is parquet-append; ``exactly_once=True`` routes it
through ``sources/merge.py`` — a log-backed MERGE keyed on
(doc_id, chunk_index) with optional (app_id, batch_id) txn replay dedup,
dispatching to a real Delta ``MERGE`` when that runtime is present.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.operators.chunker import chunk_documents
from frappe_data_pipelines_spark.operators.embed import embed_documents

DOC_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def start_ingest_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    chunk_size: int = 200,
    chunk_overlap: int = 40,
    embed_provider=None,
    max_files_per_trigger: int = 4,
    exactly_once: bool = False,
    available_now: bool = True,
    txn_app_id: str | None = None,
    optimize_every: int | None = 8,
    source_stream: DataFrame | None = None,
    scrub_against: DataFrame | None = None,
    scrub_min_len: int = 40,
    blocklist_terms: DataFrame | None = None,
    blocklist_max_hits: int = 0,
):
    """Stream parquet document files → chunk → embed → append chunks +
    job-state rows + metrics. Returns the StreamingQuery.

    ``source_stream`` swaps the file source for ANY streaming DataFrame in
    DOC_SCHEMA shape (e.g. a Kafka topic through
    ``streaming/sources.parse_document_messages``) — the micro-batch body,
    sinks, and exactly-once contract are source-agnostic.

    ``scrub_against``: a static corpus DataFrame (doc_id, text) enabling
    exact-substring dedup AT THE DOOR — every micro-batch doc has regions
    already present verbatim in the corpus (>= ``scrub_min_len`` chars)
    cut before chunking (``operators/dedup.incremental_substring_scrub``:
    the corpus pays a cached fingerprint scan per batch, never the
    stride-1 blowup, and since round 9 BOTH sides expand only the <= w
    candidate windows around matched fingerprints). Docs scrubbed to
    empty dead-letter as Failed jobs like any other empty text.

    ``blocklist_terms``: (term_id, term) enabling the C4 banned-words rule
    AT THE DOOR (``operators/blocklist.py``): docs whose post-scrub text
    contains more than ``blocklist_max_hits`` blocklist occurrences are
    dead-lettered as Failed jobs (error names the hit count) instead of
    being chunked — the drop is recorded, never silent. One Aho-Corasick
    pass per micro-batch, however long the list.

    Scale notes: maxFilesPerTrigger bounds micro-batch size; the per-batch
    plan is the same shuffle-free chunk+embed DAG as the batch engine, so
    throughput scales with executors; checkpointing makes restarts resume
    from the last committed batch (at-least-once into an idempotent sink).
    """
    if source_stream is not None:
        stream = source_stream
    else:
        stream = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir)
        )

    chunks_dir = os.path.join(output_dir, "chunks")
    jobs_dir = os.path.join(output_dir, "jobs")
    metrics_dir = os.path.join(output_dir, "metrics")

    scrub_corpus_fp = None
    if scrub_against is not None:
        from frappe_data_pipelines_spark.operators.dedup import (
            corpus_winnow_fingerprints,
        )

        # fingerprint the STATIC corpus once for the stream's lifetime —
        # without this every micro-batch re-scans (and re-shuffles) the
        # whole corpus just to rebuild identical fingerprints
        scrub_corpus_fp = corpus_winnow_fingerprints(
            scrub_against, min_len=scrub_min_len
        ).persist()

    # door prep that is FIXED across micro-batches runs once, at stream
    # start: the blocklist terms collect was one Spark action per batch of
    # pure overhead (round-9 door-latency profile: ~0.5 s/batch), and the
    # worker-side automaton memo in blocklist.py makes batch 2+ skip the
    # trie build too (python workers are reused across batches)
    bl_term_list = None
    if blocklist_terms is not None:
        from frappe_data_pipelines_spark.operators.blocklist import (
            collect_blocklist_terms,
        )

        bl_term_list = collect_blocklist_terms(blocklist_terms)

    # FDP_INGEST_PROFILE=1 prints per-action wall times to stderr — the
    # round-9 door-latency work showed per-batch cost is invisible without
    # action-level marks (component microbenchmarks summed to half the
    # observed latency)
    profile = os.environ.get("FDP_INGEST_PROFILE") == "1"

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        import sys
        import time as _time

        t_batch = _time.monotonic()
        marks: list[tuple[str, float]] = []

        def mark(tag: str) -> None:
            if profile:
                marks.append((tag, _time.monotonic() - t_batch))

        # persist the RAW batch before the doors: the door plan needs the
        # batch several times (fingerprint broadcast build, window
        # broadcast, the main pass) and each pre-persist use re-read the
        # micro-batch files — one cached 200-doc scan instead
        raw = batch_df.persist()
        if scrub_against is not None:
            from frappe_data_pipelines_spark.operators.dedup import (
                incremental_substring_scrub,
            )

            # one row per doc id into the scrub: a doc delivered twice in
            # one micro-batch must not square through the join (the MERGE
            # sink's on_duplicate='any' last-writer contract, applied at
            # the door); null-id rows can't key a scrub — pass them
            # through untouched so they dead-letter or chunk exactly as
            # the unscrubbed path would
            with_id = raw.filter(F.col("doc_id").isNotNull()).dropDuplicates(
                ["doc_id"]
            )
            no_id = raw.filter(F.col("doc_id").isNull())
            # carry_cols returns the FULL row from the stitch (no keyed
            # join back against the batch). probe_empty_spans stays OFF:
            # the probe pays the whole span plan as a second job, and the
            # round-9 door profile measured it NONEMPTY for boilerplate-
            # heavy corpora (probe-on scrub 2.0-2.7s vs 0.8s without)
            carry = [
                c for c in with_id.columns if c not in ("doc_id", "text", "n_chars")
            ]
            cleaned = incremental_substring_scrub(
                scrub_against,
                with_id,
                min_len=scrub_min_len,
                corpus_fp=scrub_corpus_fp,
                carry_cols=carry,
            )
            batch_df = cleaned.select(
                "doc_id",
                F.col("cleaned_text").alias("text"),
                *carry,
                F.length("cleaned_text").cast("long").alias("n_chars"),
            ).unionByName(
                no_id.drop("n_chars").withColumn(
                    "n_chars", F.length("text").cast("long")
                )
            )
        else:
            batch_df = raw
        if bl_term_list is not None:
            from frappe_data_pipelines_spark.operators.blocklist import (
                blocklist_annotate_prepared,
            )

            # the rule applies to the text as it will be STORED (post-scrub),
            # and it is ROW-level — the annotate kernel appends the hit count
            # to every row in place (no keyed join back), so a null-id doc
            # with banned content is judged on its own text instead of
            # sliding past a join key, and a doc delivered twice in one
            # batch is judged per row (blocklist.py's own rationale for the
            # per-row primitives). Shuffle-free: one Aho-Corasick pass over
            # the stream-start term list.
            batch_df = blocklist_annotate_prepared(
                batch_df, bl_term_list, out_col="__bl_raw"
            ).withColumn(
                "__bl_hits",
                F.when(
                    F.col("__bl_raw") > blocklist_max_hits, F.col("__bl_raw")
                ),
            ).drop("__bl_raw")
        else:
            batch_df = batch_df.withColumn("__bl_hits", F.lit(None).cast("long"))
        # I6 telemetry rides the first action as an Observation instead of
        # costing its own count job at the end of the batch
        from pyspark.sql import Observation

        obs = Observation()
        batch_df = batch_df.observe(obs, F.count(F.lit(1)).alias("n_docs"))
        # every action below re-derives from the micro-batch source.
        # Doors ON → localCheckpoint, not persist: persist keeps the whole
        # door logical plan alive, and EVERY downstream action (chunk sink,
        # job rows, metrics) re-canonicalizes it for cache matching — the
        # round-9 profile showed the door batches paying ~2x on the jobs
        # sink for that alone. The eager checkpoint materializes the door
        # output once and hands downstream actions a LogicalRDD with an
        # O(1) plan (same move as suffix.py's per-round truncation); it
        # also satisfies the Observation. Blocks are freed by Spark's
        # ContextCleaner once the batch's DataFrame goes out of scope.
        # Fault story on a real cluster: localCheckpoint blocks die with
        # their executor and have no lineage to recompute — but the
        # recovery unit HERE is the micro-batch itself: a failed
        # foreachBatch fails the batch, and the stream replays it from
        # SOURCE offsets on restart (at-least-once into the idempotent /
        # MERGE sinks, the module's documented contract), so executor
        # loss costs a batch retry, not correctness.
        # Doors OFF → plain persist: the plan is already tiny and the
        # checkpoint's extra job boundary measurably ADDS latency there
        # (doors-off p50 1.3s -> 2.2s when checkpointing unconditionally).
        has_doors = scrub_against is not None or bl_term_list is not None
        if has_doors:
            batch_df = batch_df.localCheckpoint(eager=True)
        else:
            batch_df.persist()
        mark("door (scrub+blocklist) materialized")
        # I2: job rows for this micro-batch start Queued. The Queued rows
        # are UNIONED with the terminal (Completed/Failed) rows into one
        # parquet append at the end of the batch — both states still land
        # in the job table with their own timestamps, but the sink does one
        # write action instead of two, which matters for trickle-latency
        # micro-batches where per-write fixed overhead dominates.
        queued = batch_df.select(
            F.col("doc_id").alias("source_doc_id"),
            F.lit("Queued").alias("status"),
            F.lit(batch_id).alias("batch_id"),
            F.current_timestamp().alias("created_at"),
            F.lit(None).cast("string").alias("error_message"),
        )

        # I3: guard the procedural stage per-row — unprocessable rows become
        # Failed job rows with a captured error (dead letters), never a
        # batch abort (process_embedding.py:69-81)
        blocked = F.col("__bl_hits").isNotNull()
        bad = blocked | (F.length(F.trim(F.coalesce(F.col("text"), F.lit("")))) == 0)
        failed = batch_df.filter(bad).select(
            F.col("doc_id").alias("source_doc_id"),
            F.lit("Failed").alias("status"),
            F.lit(batch_id).alias("batch_id"),
            F.current_timestamp().alias("created_at"),
            F.when(
                blocked,
                F.concat(
                    F.lit("blocklist ("),
                    F.col("__bl_hits").cast("string"),
                    F.lit(" hits)"),
                ),
            )
            .otherwise(F.lit("empty or null text"))
            .alias("error_message"),
        )
        chunks = chunk_documents(
            batch_df.filter(~bad).drop("__bl_hits"),
            strategy="recursive", chunk_size=chunk_size, chunk_overlap=chunk_overlap,
        )
        embedded = embed_documents(chunks, text_col="chunk_text", provider=embed_provider)
        embedded = embedded.withColumn("batch_id", F.lit(batch_id)).persist()
        if exactly_once:
            # I5 exactly-once: the chunk sink is a MERGE keyed on
            # (doc_id, chunk_index) — re-delivered batches overwrite their
            # own keys instead of appending duplicates, surviving even
            # checkpoint loss. With txn_app_id set, (app_id, batch_id) txn
            # dedup additionally makes a replayed micro-batch a full no-op
            # (Delta txnAppId/txnVersion semantics) — exactly-once holds
            # even for nondeterministic batch content, at the documented
            # cost that batch ids must keep ascending across restarts.
            from frappe_data_pipelines_spark.sources.merge import merge_into

            # on_duplicate="any": the same doc re-delivered twice within ONE
            # micro-batch (two input files carrying it) produces the same
            # (doc_id, chunk_index) keys; last-writer-wins is the sink
            # contract, not a merge error
            merge_into(
                batch_df.sparkSession, embedded, chunks_dir,
                ["doc_id", "chunk_index"],
                app_id=txn_app_id, batch_id=batch_id,
                on_duplicate="any",
            )
            # self-compacting sink: periodic OPTIMIZE keeps the per-bucket
            # part-file count flat instead of growing with batch count —
            # without it a week of micro-batches turns every downstream
            # scan into thousands of footer reads
            if optimize_every and batch_id % optimize_every == optimize_every - 1:
                from frappe_data_pipelines_spark.sources.merge import (
                    HAS_DELTA,
                    MergeTable,
                )

                if not HAS_DELTA:
                    t = MergeTable(chunks_dir)
                    t.optimize()
                    t.vacuum()
        else:
            embedded.write.mode("append").parquet(chunks_dir)
        mark("chunk+embed+chunk-sink")

        # I2 terminal states + I6 telemetry in the same batch
        done = (
            embedded.groupBy("doc_id")
            .agg(F.count("*").alias("n_chunks"))
            .select(
                F.col("doc_id").alias("source_doc_id"),
                F.lit("Completed").alias("status"),
                F.lit(batch_id).alias("batch_id"),
                F.current_timestamp().alias("created_at"),
                F.lit(None).cast("string").alias("error_message"),
            )
        )
        queued.unionByName(done).unionByName(failed).write.mode("append").parquet(jobs_dir)
        mark("jobs sink")
        # the Observation was satisfied by the first action through
        # batch_df (the chunk sink) — no dedicated count job
        batch_df.sparkSession.createDataFrame(
            [(batch_id, int(obs.get["n_docs"]))], "batch_id LONG, n_docs LONG"
        ).write.mode("append").parquet(metrics_dir)
        mark("metrics sink")
        embedded.unpersist()
        if not has_doors:
            batch_df.unpersist()
        raw.unpersist()
        if profile:
            print(
                f"[ingest-profile] batch {batch_id}: "
                + ", ".join(f"{tag}={t:.2f}s" for tag, t in marks),
                file=sys.stderr,
                flush=True,
            )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    # availableNow drains the backlog then stops (batch-style runs, the
    # bulk-ingest bench); available_now=False keeps the query live for
    # continuous arrival (the latency bench / production tail-ingest mode)
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if scrub_corpus_fp is not None:
        # the fingerprint cache lives as long as the stream; hand the
        # handle to the caller so an app running many streams can
        # q.scrub_corpus_fp.unpersist() after q terminates instead of
        # pinning dead blocks in executor storage for the app's lifetime
        q.scrub_corpus_fp = scrub_corpus_fp
    return q


def stop_streaming_query(
    q, idle_timeout: float | None = None, poll: float = 0.2
) -> None:
    """Stop a streaming query WITHOUT interrupting an in-flight micro-batch.

    ``StreamingQuery.stop()`` interrupts the stream execution thread; if a
    foreachBatch is mid-flight, Spark then classifies the resulting
    exception by running a regex over its MESSAGE
    (StreamExecution.isInterruptionException) — and an interrupted py4j
    foreachBatch error embeds the full Java cause chain, large enough that
    java.util.regex recursion overflows the stream thread's stack
    (StackOverflowError observed in tools/stream_bench.py, round 8). The
    query then dies messily instead of stopping cleanly.

    This helper waits for a SAFE WINDOW before stopping:

    - trigger idle (``isTriggerActive`` false) — no batch in flight; or
    - two consecutive polls with ``isDataAvailable`` false while the
      trigger loops — the no-data poll phase of an always-triggering
      source (availableNow draining an empty dir, short ProcessingTime),
      which previously burned the whole timeout without ever reading
      trigger-idle.

    It is check-then-act: a new trigger CAN start in the gap between the
    last poll and ``stop()`` — that residual race is what
    ``session.get_spark``'s ``-Xss32m`` backstop absorbs. When the RUNNING
    JVM lacks a deep stack (session pre-existed getOrCreate, so
    extraJavaOptions was silently ignored — see session.py), this warns
    and doubles the idle wait, since the backstop is absent and a mid-batch
    interrupt is the failure mode that kills the stream thread.
    ``idle_timeout=None`` → 60 s (120 s without the backstop). Falls back
    to a plain stop at the deadline — by then a wedged batch is the
    bigger problem."""
    import time as _time
    import warnings

    deep = True
    try:
        from pyspark.sql import SparkSession

        from frappe_data_pipelines_spark.session import jvm_has_deep_stack

        sess = SparkSession.getActiveSession()
        if sess is not None:
            deep = jvm_has_deep_stack(sess)
    except Exception:  # noqa: BLE001 — no live session to introspect
        pass
    if idle_timeout is None:
        idle_timeout = 60.0 if deep else 120.0
    elif not deep:
        idle_timeout *= 2
    if not deep:
        warnings.warn(
            "stop_streaming_query: driver JVM lacks the -Xss32m backstop "
            "(SparkSession pre-existed get_spark, extraJavaOptions ignored) "
            "— extending idle wait; a mid-batch interrupt here can "
            "StackOverflow the stream thread",
            RuntimeWarning,
            stacklevel=2,
        )
    deadline = _time.time() + idle_timeout
    no_data_polls = 0
    while _time.time() < deadline:
        try:
            st = q.status
            if not st.get("isTriggerActive", False):
                break
            if not st.get("isDataAvailable", True):
                no_data_polls += 1
                if no_data_polls >= 2:
                    break
            else:
                no_data_polls = 0
        except Exception:  # noqa: BLE001 — query already terminated
            break
        _time.sleep(poll)
    q.stop()
