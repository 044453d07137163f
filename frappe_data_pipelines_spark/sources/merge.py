"""Transactional MERGE tier for the idempotent sink (SURVEY I5).

The reference's vector sink is a Qdrant upsert — same-id points overwrite
(``fdp/services/qdrant_service.py:86-115``). Lakehouse engines express that
as ``MERGE INTO`` on (doc_id, chunk_index). This container ships no
delta-spark/iceberg JARs, so ``MergeTable`` implements the same contract
from scratch on plain parquet with a Delta-style commit log:

* **Hash-bucketed copy-on-write.** The table is bucketed by
  ``pmod(xxhash64(key...), n_buckets)``. A merge rewrites ONLY the buckets
  its new rows hash into — write amplification is |touched buckets| /
  n_buckets of the table, not a full rewrite. At 100 TB with 4096 buckets a
  typical micro-batch touches a few buckets; everything else is untouched
  files. (This is the same file-pruning idea Delta gets from min/max stats;
  bucketing makes it deterministic.)
* **Atomic versioned commits.** Every merge writes new data dirs, then
  publishes ``_log/<version>.json`` naming added/removed dirs. The publish
  is an O_EXCL create — two concurrent writers race on the version number
  and the loser retries (optimistic concurrency, as Delta). Readers replay
  the log, so they always see a complete version — never a half-written
  table.
* **Txn replay dedup.** ``merge(..., app_id=, batch_id=)`` records the
  latest batch id per app in the commit. A re-delivered ``foreachBatch``
  (same app, batch_id <= last committed) is skipped entirely — the
  exactly-once guarantee holds even when the batch content is
  nondeterministic (e.g. ``current_timestamp`` columns), which keyed
  overwrite alone cannot promise. Same semantics as Delta's
  ``txnAppId``/``txnVersion``.
* **Time travel + VACUUM.** ``read(version=N)`` reconstructs any committed
  snapshot; ``vacuum(retain_versions)`` deletes data dirs no recent
  snapshot references — but only past a ``retention_seconds`` age gate, so
  an in-flight writer's not-yet-committed dir is never reclaimed from
  under it (Delta's vacuum retention check).

If a Delta runtime IS on the classpath, ``merge_into`` dispatches to a real
``DeltaTable.merge`` instead — call sites don't change.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this container
    from delta.tables import DeltaTable  # noqa: F401

    HAS_DELTA = True
except Exception:  # noqa: BLE001
    HAS_DELTA = False

_BUCKET = "__bucket"


def _pad_to(df: DataFrame, fields: list[T.StructField]) -> DataFrame:
    """Project ``df`` onto ``fields`` in order, adding typed NULL columns
    for fields the frame lacks — how old rows acquire a newly evolved
    column (and how a canonical column order survives parquet's
    mergeSchema, whose union order follows file order)."""
    have = set(df.columns)
    return df.select(
        *[
            F.col(f.name) if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in fields
        ]
    )


def _evolve_fields(
    table: list[T.StructField] | None,
    source: list[T.StructField],
    schema_mode: str,
    where: str,
) -> list[T.StructField]:
    """Delta-style schema resolution: same-name fields must agree on type
    (no implicit widening); ``strict`` rejects any column-set change;
    ``merge`` appends the source's new columns after the table's and lets
    missing source columns fill with NULL."""
    if table is None:
        return list(source)
    by_name = {f.name: f for f in table}
    conflicts = [
        f.name for f in source
        if f.name in by_name and f.dataType != by_name[f.name].dataType
    ]
    if conflicts:
        raise ValueError(
            f"{where}: column type conflict on {conflicts} "
            "(schema evolution never rewrites a column's type)"
        )
    new = [f for f in source if f.name not in by_name]
    missing = [f.name for f in table if f.name not in {s.name for s in source}]
    if schema_mode == "strict" and (new or missing):
        raise ValueError(
            f"{where}: source schema differs from table "
            f"(new: {[f.name for f in new]}, missing: {missing}); "
            "pass schema_mode='merge' to evolve"
        )
    return list(table) + new


class ConcurrentCommitError(RuntimeError):
    """Another writer committed a conflicting version; retry the merge."""


class MergeTable:
    """A keyed MERGE (upsert) table on plain parquet with a commit log."""

    def __init__(self, path: str, key_cols: list[str] | None = None, n_buckets: int = 16):
        self.path = path
        self.log_dir = os.path.join(path, "_log")
        self.files_dir = os.path.join(path, "files")
        meta_path = os.path.join(self.log_dir, "_table.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self.key_cols = meta["key_cols"]
            self.n_buckets = meta["n_buckets"]
            if key_cols is not None and list(key_cols) != self.key_cols:
                raise ValueError(
                    f"table at {path} is keyed on {self.key_cols}, not {key_cols}"
                )
        else:
            if key_cols is None:
                raise ValueError("key_cols required to create a new MergeTable")
            self.key_cols = list(key_cols)
            self.n_buckets = n_buckets
            os.makedirs(self.log_dir, exist_ok=True)
            os.makedirs(self.files_dir, exist_ok=True)
            with open(meta_path, "w") as f:
                json.dump({"key_cols": self.key_cols, "n_buckets": n_buckets}, f)

    # ---------------------------------------------------------------- log

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(f[:-5]) for f in os.listdir(self.log_dir)
            if f.endswith(".json") and f[:-5].isdigit()
        )

    def _entry(self, v: int) -> dict:
        with open(os.path.join(self.log_dir, f"{v:08d}.json")) as f:
            return json.load(f)

    def _snapshot(
        self, version: int | None = None
    ) -> tuple[dict[int, list[str]], dict[str, int], int]:
        """Replay the log → (bucket -> live dirs, app_id -> last batch_id,
        base_version). ``base_version`` is the highest version actually
        replayed (-1 on an empty log); writers MUST commit at exactly
        ``base_version + 1`` so that any commit landing between this
        snapshot and the publish collides on the O_EXCL create and forces a
        retry — recomputing the next version at publish time would silently
        skip past the rival and publish a stale-snapshot rewrite on top of
        it (lost update / duplicated bucket rows)."""
        state: dict[int, list[str]] = {}
        txns: dict[str, int] = {}
        base_version = -1
        for v in self._versions():
            if version is not None and v > version:
                break
            base_version = v
            e = self._entry(v)
            removes = set(e.get("removes", []))
            for b in list(state):
                state[b] = [d for d in state[b] if d not in removes]
            for b_str, d in e.get("adds", {}).items():
                state.setdefault(int(b_str), []).append(d)
            t = e.get("txn")
            if t and t.get("app_id") is not None:
                prev = txns.get(t["app_id"])
                if prev is None or t["batch_id"] > prev:
                    txns[t["app_id"]] = t["batch_id"]
        return state, txns, base_version

    def _schema_at(self, version: int | None = None) -> list[T.StructField] | None:
        """Canonical column list: the latest commit at-or-before ``version``
        that recorded one (every evolving merge does). ``None`` on tables
        whose log predates schema tracking — those read with parquet's
        natural schema, exactly as before."""
        for v in reversed(self._versions()):
            if version is not None and v > version:
                continue
            js = self._entry(v).get("schema")
            if js is not None:
                return [T.StructField.fromJson(j) for j in js]
        return None

    def _commit(self, version: int, entry: dict) -> None:
        """O_EXCL publish — the atomicity point of the whole merge."""
        final = os.path.join(self.log_dir, f"{version:08d}.json")
        fd = os.open(final, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            os.write(fd, json.dumps(entry).encode())
        finally:
            os.close(fd)

    # -------------------------------------------------------------- bucket

    def _bucket_col(self):
        return F.pmod(F.xxhash64(*[F.col(k) for k in self.key_cols]), F.lit(self.n_buckets))

    # --------------------------------------------------------------- merge

    def merge(
        self,
        new_rows: DataFrame,
        app_id: str | None = None,
        batch_id: int | None = None,
        max_retries: int = 3,
        on_duplicate: str = "error",
        schema_mode: str = "strict",
    ) -> bool:
        """MERGE: matched keys update (last-writer-wins), unmatched insert.

        Returns False without touching the table when (app_id, batch_id)
        was already committed — the replayed-micro-batch no-op.

        ``on_duplicate`` governs two source rows sharing one key in a
        single batch: ``"error"`` raises (Delta's multiple-source-match
        error — the anti-join would otherwise insert BOTH, leaving
        duplicate-keyed rows), ``"any"`` keeps one arbitrary-but-
        deterministic row per key via ``dropDuplicates``.

        ``schema_mode``: ``"strict"`` (default) rejects a source whose
        column set differs from the table's; ``"merge"`` evolves the table
        Delta-style — new source columns append (existing rows read NULL
        for them, no data rewrite outside the touched buckets), missing
        source columns fill with NULL, and a same-name type conflict always
        raises. The canonical post-merge schema is recorded in the commit,
        so readers keep a deterministic column order across bucket files
        written in different schema epochs.
        """
        if on_duplicate not in ("error", "any"):
            raise ValueError("on_duplicate must be 'error' or 'any'")
        if schema_mode not in ("strict", "merge"):
            raise ValueError("schema_mode must be 'strict' or 'merge'")
        spark = new_rows.sparkSession
        if on_duplicate == "any":
            new_rows = new_rows.dropDuplicates(self.key_cols)
        for attempt in range(max_retries):
            state, txns, base_v = self._snapshot()
            if app_id is not None and batch_id is not None:
                last = txns.get(app_id)
                if last is not None and batch_id <= last:
                    return False  # replay of an already-committed batch

            staged = new_rows.withColumn(_BUCKET, self._bucket_col())
            # ONE job gives both the touched-bucket set (tiny: <= n_buckets
            # rows) and duplicate-key detection (map-side combinable agg —
            # no extra pass over the batch on the ingest hot path)
            stats = (
                staged.groupBy(*self.key_cols, _BUCKET)
                .agg(F.count(F.lit(1)).alias("__n"))
                .groupBy(_BUCKET)
                .agg(F.max("__n").alias("__mx"), F.sum("__n").alias("__rows"),
                     F.count(F.lit(1)).alias("__keys"))
                .collect()
            )
            if on_duplicate == "error" and any(r["__mx"] > 1 for r in stats):
                n_dup = sum(r["__rows"] - r["__keys"] for r in stats)
                raise ValueError(
                    f"merge source batch has {n_dup} duplicate row(s) on key "
                    f"{self.key_cols}; dedupe upstream or pass "
                    "on_duplicate='any'"
                )
            touched = sorted(r[_BUCKET] for r in stats)
            old_dirs = [d for b in touched for d in state.get(b, [])]
            # resolve the post-merge schema against the snapshot's canonical
            # one (falling back to a footer read for pre-tracking tables)
            src_fields = [f for f in new_rows.schema.fields if f.name != _BUCKET]
            table_fields = self._schema_at(base_v)
            if table_fields is None:
                any_dirs = [d for ds in state.values() for d in ds]
                if any_dirs:
                    table_fields = [
                        f
                        for f in spark.read.option("mergeSchema", "true")
                        .parquet(*[os.path.join(self.files_dir, d) for d in any_dirs])
                        .schema.fields
                        if f.name != _BUCKET
                    ]
            out_fields = _evolve_fields(
                table_fields, src_fields, schema_mode, f"merge into {self.path}"
            )
            if old_dirs:
                existing = spark.read.option("mergeSchema", "true").parquet(
                    *[os.path.join(self.files_dir, d) for d in old_dirs]
                )
                keys = staged.select(*self.key_cols).distinct()
                # eqNullSafe: a NULL key must match itself (plain = would
                # keep the old null-keyed row and duplicate it)
                cond = None
                for k in self.key_cols:
                    c = existing[k].eqNullSafe(keys[k])
                    cond = c if cond is None else (cond & c)
                kept = _pad_to(
                    existing.join(keys, cond, "left_anti"), out_fields
                ).withColumn(_BUCKET, self._bucket_col())
                merged = kept.unionByName(
                    _pad_to(staged, out_fields).withColumn(_BUCKET, self._bucket_col())
                )
            else:
                merged = _pad_to(staged, out_fields).withColumn(
                    _BUCKET, self._bucket_col()
                )
            vdir = f"v{uuid.uuid4().hex[:12]}"
            merged.write.partitionBy(_BUCKET).parquet(os.path.join(self.files_dir, vdir))
            adds = {
                str(b): f"{vdir}/{_BUCKET}={b}"
                for b in touched
                if os.path.isdir(os.path.join(self.files_dir, vdir, f"{_BUCKET}={b}"))
            }
            entry = {
                "adds": adds,
                "removes": old_dirs,
                "txn": {"app_id": app_id, "batch_id": batch_id},
                "schema": [f.jsonValue() for f in out_fields],
                "ts": time.time(),
            }
            try:
                # commit at EXACTLY snapshot+1: a rival that landed anywhere
                # in the snapshot→publish window owns this version number,
                # so the O_EXCL create collides and we retry on fresh state
                self._commit(base_v + 1, entry)
                return True
            except FileExistsError:
                # a concurrent writer won this version — the snapshot we
                # merged against is stale: redo the merge (next loop
                # re-reads the log); our orphaned data dir is reclaimed by
                # vacuum() once past the retention window
                continue
        raise ConcurrentCommitError(
            f"merge lost the commit race {max_retries} times at {self.path}"
        )

    # --------------------------------------------------------------- delete

    def delete(
        self,
        keys: DataFrame,
        app_id: str | None = None,
        batch_id: int | None = None,
        max_retries: int = 3,
    ) -> bool:
        """Keyed DELETE — ``MERGE ... WHEN MATCHED THEN DELETE`` (the
        reference's A15 cascade delete against the vector store,
        drive_file_handler.py:98-149). Same bounded copy-on-write as merge:
        only the buckets the keys hash into rewrite; same txn replay dedup;
        a bucket emptied entirely simply publishes no dir for itself.
        ``keys`` must carry exactly the key columns; a prefix delete (e.g.
        every chunk of one doc) is expressed upstream as the filter that
        produces the full key set."""
        if sorted(keys.columns) != sorted(self.key_cols):
            raise ValueError(f"delete needs exactly the key columns {self.key_cols}")
        spark = keys.sparkSession
        for _attempt in range(max_retries):
            state, txns, base_v = self._snapshot()
            if app_id is not None and batch_id is not None:
                last = txns.get(app_id)
                if last is not None and batch_id <= last:
                    return False
            staged = keys.withColumn(_BUCKET, self._bucket_col())
            touched = sorted(
                r[_BUCKET] for r in staged.select(_BUCKET).distinct().collect()
            )
            old_dirs = [d for b in touched for d in state.get(b, [])]
            adds: dict[str, str] = {}
            if old_dirs:
                existing = spark.read.option("mergeSchema", "true").parquet(
                    *[os.path.join(self.files_dir, d) for d in old_dirs]
                )
                cond = None
                for k in self.key_cols:
                    c = existing[k].eqNullSafe(staged[k])
                    cond = c if cond is None else (cond & c)
                kept = (
                    existing.join(staged, cond, "left_anti")
                    .withColumn(_BUCKET, self._bucket_col())
                )
                vdir = f"v{uuid.uuid4().hex[:12]}"
                kept.write.partitionBy(_BUCKET).parquet(
                    os.path.join(self.files_dir, vdir)
                )
                adds = {
                    str(b): f"{vdir}/{_BUCKET}={b}"
                    for b in touched
                    if os.path.isdir(
                        os.path.join(self.files_dir, vdir, f"{_BUCKET}={b}")
                    )
                }
            entry = {
                "adds": adds,
                "removes": old_dirs,
                "txn": {"app_id": app_id, "batch_id": batch_id},
                "delete": True,
                "ts": time.time(),
            }
            try:
                self._commit(base_v + 1, entry)  # pinned: see merge()
                return True
            except FileExistsError:
                continue
        raise ConcurrentCommitError(
            f"delete lost the commit race {max_retries} times at {self.path}"
        )

    # ---------------------------------------------------------------- read

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read (latest, or time-travel to ``version``). The
        ``__bucket`` partition column stays internal — passing each bucket
        dir as its own root means no partition discovery surfaces it."""
        state, _, base_v = self._snapshot(version)
        dirs = [os.path.join(self.files_dir, d) for ds in state.values() for d in ds]
        if not dirs:
            raise ValueError(f"MergeTable at {self.path} is empty")
        df = spark.read.option("mergeSchema", "true").parquet(*dirs)
        fields = self._schema_at(base_v)
        if fields is not None:
            # canonical order + NULL-pad columns evolved after some buckets
            # were last rewritten (or since deleted from every live file)
            df = _pad_to(df, fields)
        return df

    def history(self) -> list[dict]:
        return [dict(self._entry(v), version=v) for v in self._versions()]

    def lookup(self, spark: SparkSession, key_values: dict) -> DataFrame:
        """Bucket-pruned point read: a full equality predicate on the key
        columns hashes to exactly ONE bucket, so only that bucket's dirs are
        opened — at 4096 buckets a lookup touches ~1/4096 of the table's
        files, the difference between a point query and a table scan. The
        residual equality filter still applies (bucket collision)."""
        if sorted(key_values) != sorted(self.key_cols):
            raise ValueError(f"lookup needs all key columns {self.key_cols}")
        # evaluate the SAME bucket expression the writers use, on a 1-row frame
        probe = spark.createDataFrame([tuple(key_values[k] for k in self.key_cols)],
                                      schema=self.key_cols)
        bucket = probe.select(self._bucket_col().alias("b")).first()["b"]
        state, _, base_v = self._snapshot()
        dirs = [os.path.join(self.files_dir, d) for d in state.get(bucket, [])]
        if not dirs:
            return self.read(spark).limit(0)  # empty frame, right schema
        out = spark.read.option("mergeSchema", "true").parquet(*dirs)
        fields = self._schema_at(base_v)
        if fields is not None:
            out = _pad_to(out, fields)
        for k, v in key_values.items():
            out = out.where(F.col(k).eqNullSafe(F.lit(v)))
        return out

    # ------------------------------------------------------------ optimize

    def optimize(self, min_files_per_bucket: int = 2, max_retries: int = 3) -> int:
        """OPTIMIZE (compaction). Merges are copy-on-write per bucket, so a
        bucket always has ONE live dir — but that dir holds one parquet part
        per shuffle partition of the write that produced it. A streaming
        sink rewriting buckets every micro-batch therefore accumulates many
        small part files — the small-files problem (thousands of footer
        reads per scan). Rewrite every bucket whose live dir holds >=
        ``min_files_per_bucket`` parts into a single part, committed through
        the log like any other writer: readers never see a half-compacted
        table, and time travel to pre-OPTIMIZE versions keeps working until
        vacuum reclaims the old dirs.

        Returns the number of buckets compacted. All buckets rewrite in ONE
        Spark job — ``repartition`` on the bucket column lands each bucket
        in one task, which writes exactly one part per bucket dir."""
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()

        def n_parts(ds: list[str]) -> int:
            return sum(
                sum(
                    1
                    for f in os.listdir(os.path.join(self.files_dir, d))
                    if f.endswith(".parquet")
                )
                for d in ds
            )

        for _attempt in range(max_retries):
            state, _, base_v = self._snapshot()
            todo = {
                b: ds for b, ds in state.items()
                if ds and n_parts(ds) >= min_files_per_bucket
            }
            if not todo:
                return 0
            old_dirs = [d for ds in todo.values() for d in ds]
            df = spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(self.files_dir, d) for d in old_dirs]
            )
            fields = self._schema_at(base_v)
            if fields is not None:
                df = _pad_to(df, fields)  # compacted files land on the canonical schema
            df = df.withColumn(_BUCKET, self._bucket_col())
            vdir = f"v{uuid.uuid4().hex[:12]}"
            df.repartition(len(todo), F.col(_BUCKET)).write.partitionBy(_BUCKET).parquet(
                os.path.join(self.files_dir, vdir)
            )
            adds = {
                str(b): f"{vdir}/{_BUCKET}={b}"
                for b in todo
                if os.path.isdir(os.path.join(self.files_dir, vdir, f"{_BUCKET}={b}"))
            }
            entry = {
                "adds": adds,
                "removes": old_dirs,
                "txn": {"app_id": None, "batch_id": None},
                "optimize": True,
                "ts": time.time(),
            }
            try:
                self._commit(base_v + 1, entry)  # pinned: see merge()
                return len(todo)
            except FileExistsError:
                continue
        raise ConcurrentCommitError(
            f"optimize lost the commit race {max_retries} times at {self.path}"
        )

    # -------------------------------------------------------------- vacuum

    def vacuum(self, retain_versions: int = 2, retention_seconds: float = 3600.0) -> int:
        """Delete data dirs referenced by NO snapshot in the last
        ``retain_versions`` versions — but ONLY when the dir is older than
        ``retention_seconds`` (mtime). The age gate mirrors Delta's vacuum
        retention check: an in-flight concurrent writer's freshly written
        dir is an "uncommitted orphan" until its commit publishes, and an
        age-blind vacuum would delete it mid-write, leaving the writer's
        commit pointing at dead paths. Streaming's auto-vacuum relies on
        this default; pass ``retention_seconds=0`` only when no concurrent
        writer can exist (tests, offline maintenance). Returns the number
        of version-dirs removed."""
        versions = self._versions()
        keep = versions[-retain_versions:] if versions else []
        live: set[str] = set()
        for v in keep:
            state, _, _ = self._snapshot(v)
            for ds in state.values():
                live.update(d.split("/", 1)[0] for d in ds)
        removed = 0
        cutoff = time.time() - retention_seconds
        for d in os.listdir(self.files_dir):
            full = os.path.join(self.files_dir, d)
            if d not in live:
                try:
                    if os.path.getmtime(full) > cutoff:
                        continue  # too young — may be an in-flight writer
                except OSError:
                    continue
                shutil.rmtree(full, ignore_errors=True)
                removed += 1
        return removed


def merge_into(
    spark: SparkSession,
    new_rows: DataFrame,
    path: str,
    key_cols: list[str],
    app_id: str | None = None,
    batch_id: int | None = None,
    n_buckets: int = 16,
    on_duplicate: str = "error",
    schema_mode: str = "strict",
) -> bool:
    """Dispatch: real Delta MERGE when a Delta runtime is present, else the
    log-backed ``MergeTable``. One call site for both deployments.
    ``schema_mode='merge'`` maps to Delta's autoMerge conf on the real
    runtime and to MergeTable schema evolution here."""
    if HAS_DELTA:  # pragma: no cover - no delta runtime in this container
        from delta.tables import DeltaTable

        if on_duplicate == "any":
            # Delta MERGE raises on multiple source matches; mirror
            # MergeTable's keep-one policy before dispatching
            new_rows = new_rows.dropDuplicates(key_cols)
        # Idempotent-write options: Delta records (txnAppId, txnVersion) in
        # the commit and skips any write whose version <= the last recorded
        # one for that app — the same replay dedup MergeTable implements.
        # Without these, a replayed nondeterministic micro-batch would
        # re-merge on a real Delta deployment.
        txn_confs = {}
        if schema_mode == "merge":
            txn_confs["spark.databricks.delta.schema.autoMerge.enabled"] = "true"
        if app_id is not None and batch_id is not None:
            # update, never reassign — schema autoMerge may already be set
            txn_confs["spark.databricks.delta.write.txnAppId"] = app_id
            txn_confs["spark.databricks.delta.write.txnVersion"] = str(batch_id)
        saved = {k: spark.conf.get(k, None) for k in txn_confs}
        try:
            for k, v in txn_confs.items():
                spark.conf.set(k, v)
            if DeltaTable.isDeltaTable(spark, path):
                cond = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
                (
                    DeltaTable.forPath(spark, path).alias("t")
                    .merge(new_rows.alias("s"), cond)
                    .whenMatchedUpdateAll()
                    .whenNotMatchedInsertAll()
                    .execute()
                )
            else:
                new_rows.write.format("delta").save(path)
        finally:
            for k, old in saved.items():
                if old is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, old)
        return True
    return MergeTable(path, key_cols, n_buckets=n_buckets).merge(
        new_rows, app_id=app_id, batch_id=batch_id, on_duplicate=on_duplicate,
        schema_mode=schema_mode,
    )
