"""MergeTable: log-backed MERGE with txn replay dedup (SURVEY I5,
VERDICT r3 #3 — crash-replay must yield identical table state)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from frappe_data_pipelines_spark.sources.merge import MergeTable, merge_into


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, chunk_index long, payload string")


def test_merge_insert_then_update(spark, tmp_path):
    path = str(tmp_path / "t")
    t = MergeTable(path, ["doc_id", "chunk_index"], n_buckets=4)
    t.merge(_df(spark, [(1, 0, "a"), (1, 1, "b"), (2, 0, "c")]))
    assert t.read(spark).count() == 3
    # matched keys update, unmatched insert — one call, both behaviors
    t.merge(_df(spark, [(1, 1, "B2"), (3, 0, "d")]))
    got = {(r.doc_id, r.chunk_index): r.payload for r in t.read(spark).collect()}
    assert got == {(1, 0): "a", (1, 1): "B2", (2, 0): "c", (3, 0): "d"}


def test_merge_partial_bucket_rewrite(spark, tmp_path):
    """COW touches only the buckets the batch hashes into: dirs belonging to
    untouched buckets survive across a merge (bounded write amplification —
    the property that matters at 100 TB)."""
    path = str(tmp_path / "t")
    t = MergeTable(path, ["doc_id", "chunk_index"], n_buckets=8)
    t.merge(_df(spark, [(i, 0, f"p{i}") for i in range(40)]))
    state1, _, _ = t._snapshot()
    t.merge(_df(spark, [(1, 0, "updated")]))
    state2, _, _ = t._snapshot()
    touched = {
        b for b in state1 if state1.get(b) != state2.get(b)
    }
    assert len(touched) == 1  # a single-key batch rewrites exactly one bucket
    untouched_dirs = {d for b, ds in state1.items() for d in ds if b not in touched}
    live_dirs = {d for ds in state2.values() for d in ds}
    assert untouched_dirs <= live_dirs


def test_txn_replay_is_noop_even_with_nondeterministic_content(spark, tmp_path):
    """Crash-replay: the same (app_id, batch_id) delivered twice — with
    DIFFERENT content the second time (what a nondeterministic transform
    would produce on replay) — leaves the table byte-identical."""
    path = str(tmp_path / "t")
    t = MergeTable(path, ["doc_id", "chunk_index"], n_buckets=4)
    assert t.merge(_df(spark, [(1, 0, "v1")]), app_id="ingest", batch_id=0) is True
    before = sorted(map(tuple, t.read(spark).collect()))
    n_versions = len(t._versions())
    # replay with mutated content must be skipped outright
    assert t.merge(_df(spark, [(1, 0, "MUTATED")]), app_id="ingest", batch_id=0) is False
    assert sorted(map(tuple, t.read(spark).collect())) == before
    assert len(t._versions()) == n_versions  # no new commit either
    # an EARLIER batch id replayed late is also a no-op (Delta txnVersion)
    assert t.merge(_df(spark, [(9, 9, "x")]), app_id="ingest", batch_id=-1) is False
    # the next real batch goes through
    assert t.merge(_df(spark, [(1, 1, "v2")]), app_id="ingest", batch_id=1) is True
    assert t.read(spark).count() == 2


def test_time_travel_and_history(spark, tmp_path):
    path = str(tmp_path / "t")
    t = MergeTable(path, ["doc_id", "chunk_index"], n_buckets=2)
    t.merge(_df(spark, [(1, 0, "a")]))
    t.merge(_df(spark, [(1, 0, "b")]))
    assert t.read(spark, version=0).first().payload == "a"
    assert t.read(spark, version=1).first().payload == "b"
    hist = t.history()
    assert [h["version"] for h in hist] == [0, 1]


def test_vacuum_reclaims_dead_and_orphan_dirs(spark, tmp_path):
    path = str(tmp_path / "t")
    t = MergeTable(path, ["doc_id", "chunk_index"], n_buckets=2)
    t.merge(_df(spark, [(1, 0, "a"), (2, 0, "b")]))
    for i in range(3):
        t.merge(_df(spark, [(1, 0, f"u{i}")]))
    # plant an uncommitted orphan (a crashed writer's data dir)
    os.makedirs(os.path.join(path, "files", "vdeadbeef0000"))
    removed = t.vacuum(retain_versions=1, retention_seconds=0)
    assert removed >= 1
    assert not os.path.exists(os.path.join(path, "files", "vdeadbeef0000"))
    # table still reads correctly at head after vacuum
    got = {(r.doc_id, r.chunk_index): r.payload for r in t.read(spark).collect()}
    assert got == {(1, 0): "u2", (2, 0): "b"}
    # time travel beyond the retention horizon is gone (dirs deleted)
    with pytest.raises(Exception):
        t.read(spark, version=0).collect()


def test_optimize_compacts_buckets(spark, tmp_path):
    """OPTIMIZE rewrites multi-part bucket dirs into single-part dirs; data
    is unchanged, pre-OPTIMIZE time travel still works, and vacuum then
    reclaims the superseded dirs."""
    import os as _os

    path = str(tmp_path / "t")
    t = MergeTable(path, ["doc_id", "chunk_index"], n_buckets=2)
    # a deliberately over-partitioned batch: each bucket dir gets many parts
    wide = _df(spark, [(i, j, f"p{i}.{j}") for i in range(20) for j in range(2)])
    t.merge(wide.repartition(8))

    def parts_per_bucket():
        state, _, _ = t._snapshot()
        return {
            b: sum(
                1
                for f in _os.listdir(_os.path.join(path, "files", ds[0]))
                if f.endswith(".parquet")
            )
            for b, ds in state.items()
            if ds
        }

    before = sorted(map(tuple, t.read(spark).collect()))
    assert any(n > 1 for n in parts_per_bucket().values())
    assert t.optimize() >= 1
    assert all(n == 1 for n in parts_per_bucket().values())
    assert sorted(map(tuple, t.read(spark).collect())) == before
    # pre-OPTIMIZE snapshot still reconstructable
    v_pre = t._versions()[-2]
    assert sorted(map(tuple, t.read(spark, version=v_pre).collect())) == before
    assert t.vacuum(retain_versions=1, retention_seconds=0) >= 1
    assert sorted(map(tuple, t.read(spark).collect())) == before
    # idempotent: nothing left to compact
    assert t.optimize() == 0


def test_key_schema_pinned(spark, tmp_path):
    path = str(tmp_path / "t")
    MergeTable(path, ["doc_id", "chunk_index"]).merge(_df(spark, [(1, 0, "a")]))
    with pytest.raises(ValueError, match="keyed on"):
        MergeTable(path, ["doc_id"])


def test_merge_into_dispatch(spark, tmp_path):
    path = str(tmp_path / "t")
    assert merge_into(spark, _df(spark, [(1, 0, "a")]), path, ["doc_id", "chunk_index"]) is True
    assert MergeTable(path).read(spark).count() == 1


def test_model_based_random_op_sequences(spark, tmp_path):
    """Model-based check: a random interleaving of merge / optimize /
    vacuum / replayed-batch ops must leave the table equal to a plain dict
    applying last-writer-wins upserts (replays applied zero times)."""
    import random

    rng = random.Random(20260813)
    for trial in range(3):
        path = str(tmp_path / f"t{trial}")
        t = MergeTable(path, ["doc_id", "chunk_index"], n_buckets=4)
        model: dict[tuple, str] = {}
        applied_batches: set[int] = set()
        batch_id = 0
        for step in range(12):
            op = rng.choice(["merge", "merge", "merge", "replay", "optimize", "vacuum"])
            if op == "merge":
                rows = [
                    (rng.randrange(8), rng.randrange(3), f"s{step}.{i}")
                    for i in range(rng.randrange(1, 5))
                ]
                # last occurrence wins within a batch too — dedupe like the
                # anti-join does (new rows replace, and Spark keeps all new
                # rows; use distinct keys per batch to keep the model exact)
                rows = list({(d, c): v for d, c, v in rows}.items())
                rows = [(d, c, v) for (d, c), v in rows]
                assert t.merge(_df(spark, rows), app_id="model", batch_id=batch_id)
                for d, c, v in rows:
                    model[(d, c)] = v
                applied_batches.add(batch_id)
                batch_id += 1
            elif op == "replay" and applied_batches:
                replay_id = rng.choice(sorted(applied_batches))
                assert (
                    t.merge(
                        _df(spark, [(99, 99, "REPLAY-GARBAGE")]),
                        app_id="model",
                        batch_id=replay_id,
                    )
                    is False
                )
            elif op == "optimize":
                t.optimize()
            elif op == "vacuum":
                t.vacuum(retain_versions=2, retention_seconds=0)
        got = {
            (r.doc_id, r.chunk_index): r.payload for r in t.read(spark).collect()
        }
        assert got == model, f"trial {trial} diverged from model"


def test_null_keys_merge_as_their_own_key(spark, tmp_path):
    """xxhash64 treats NULL as a stable value, so a null-keyed row upserts
    itself like any other key instead of duplicating."""
    path = str(tmp_path / "t")
    t = MergeTable(path, ["doc_id", "chunk_index"], n_buckets=4)
    t.merge(_df(spark, [(None, 0, "a")]))
    t.merge(_df(spark, [(None, 0, "b")]))
    rows = t.read(spark).collect()
    assert len(rows) == 1 and rows[0].payload == "b"


def test_lookup_prunes_to_one_bucket(spark, tmp_path):
    """A full-key lookup opens only the matching bucket's dirs and returns
    exactly the matching row (residual filter handles collisions)."""
    path = str(tmp_path / "t")
    t = MergeTable(path, ["doc_id", "chunk_index"], n_buckets=8)
    t.merge(_df(spark, [(i, j, f"p{i}.{j}") for i in range(30) for j in range(2)]))
    got = t.lookup(spark, {"doc_id": 7, "chunk_index": 1}).collect()
    assert len(got) == 1 and got[0].payload == "p7.1"
    # pruning actually happened: the plan reads fewer dirs than the table has
    state, _, _ = t._snapshot()
    n_live_buckets = sum(1 for ds in state.values() if ds)
    assert n_live_buckets > 1  # otherwise pruning would be vacuous
    target_bucket = (
        _df(spark, [(7, 1, "x")])
        .select(t._bucket_col().alias("b")).first()["b"]
    )
    read_files = set(t.lookup(spark, {"doc_id": 7, "chunk_index": 1}).inputFiles())
    for b, ds in state.items():
        for d in ds:
            touched = any(f"/{d}/" in f for f in read_files)
            if b == target_bucket:
                assert touched  # the one bucket we must read
            else:
                assert not touched  # every other bucket is pruned
    # missing key -> empty, correct schema
    empty = t.lookup(spark, {"doc_id": 999, "chunk_index": 0})
    assert empty.count() == 0 and set(empty.columns) >= {"doc_id", "chunk_index", "payload"}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="all key columns"):
        t.lookup(spark, {"doc_id": 7})


def test_self_compacting_ingest_sink(spark, sf_dir, tmp_path):
    """optimize_every=1: after the availableNow drain the chunk table's
    buckets each hold a single part file, and the data matches a plain
    exactly-once run."""
    import os as _os

    from frappe_data_pipelines_spark.sources.tables import load_table
    from frappe_data_pipelines_spark.streaming.ingest import start_ingest_stream

    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    docs.select("doc_id", "text", "lang", "source", "n_chars").coalesce(2).write.mode(
        "append"
    ).parquet(inp)
    q = start_ingest_stream(
        spark, inp, out, ckpt, exactly_once=True, optimize_every=1,
    )
    q.awaitTermination(120)
    chunks_dir = _os.path.join(out, "chunks")
    t = MergeTable(chunks_dir)
    state, _, _ = t._snapshot()
    for b, ds in state.items():
        for d in ds:
            n = sum(
                1
                for f in _os.listdir(_os.path.join(chunks_dir, "files", d))
                if f.endswith(".parquet")
            )
            assert n == 1, f"bucket {b} dir {d} holds {n} parts after OPTIMIZE"
    assert t.read(spark).select("doc_id").distinct().count() == 10


def test_commit_race_retries_to_next_version(spark, tmp_path):
    """Optimistic concurrency: when another writer claims the next version
    number between snapshot and publish, the merge retries against the new
    log state and lands on the following version — data intact."""
    import json as _json

    path = str(tmp_path / "t")
    t = MergeTable(path, ["doc_id", "chunk_index"], n_buckets=2)
    t.merge(_df(spark, [(1, 0, "a")]))
    # a concurrent writer publishes version 1 (a no-op commit) just before us
    with open(os.path.join(path, "_log", f"{1:08d}.json"), "w") as f:
        _json.dump({"adds": {}, "removes": [], "txn": {"app_id": None, "batch_id": None}}, f)
    assert t.merge(_df(spark, [(2, 0, "b")])) is True
    assert [h["version"] for h in t.history()] == [0, 1, 2]
    got = {(r.doc_id, r.chunk_index): r.payload for r in t.read(spark).collect()}
    assert got == {(1, 0): "a", (2, 0): "b"}


def test_commit_race_exhaustion_raises(spark, tmp_path):
    """A writer that loses the race on every retry surfaces
    ConcurrentCommitError instead of spinning forever."""
    from frappe_data_pipelines_spark.sources.merge import ConcurrentCommitError

    path = str(tmp_path / "t")
    t = MergeTable(path, ["doc_id", "chunk_index"], n_buckets=2)
    t.merge(_df(spark, [(1, 0, "a")]))

    real_commit = t._commit

    def always_lose(version, entry):
        # simulate a rival landing first on EVERY attempt
        real_commit(version, {"adds": {}, "removes": [], "txn": {"app_id": None, "batch_id": None}})
        return real_commit(version, entry)  # now raises FileExistsError

    t._commit = always_lose
    with pytest.raises(ConcurrentCommitError):
        t.merge(_df(spark, [(2, 0, "b")]), max_retries=2)
    # the rival's no-op commits are in the log; our data never landed
    assert t.read(spark).count() == 1


def test_delete_removes_keys_and_spares_other_buckets(spark, tmp_path):
    """DELETE drops exactly the named keys; untouched buckets keep their
    dirs; an emptied bucket publishes no dir; replayed delete batches
    are no-ops (txn dedup covers deletes too)."""
    path = str(tmp_path / "t")
    t = MergeTable(path, ["doc_id", "chunk_index"], n_buckets=8)
    t.merge(_df(spark, [(i, 0, f"p{i}") for i in range(40)]))
    state1, _, _ = t._snapshot()

    keys = spark.createDataFrame([(7, 0), (8, 0)], "doc_id long, chunk_index long")
    assert t.delete(keys, app_id="gdpr", batch_id=0) is True
    got = {r.doc_id for r in t.read(spark).collect()}
    assert got == set(range(40)) - {7, 8}
    # untouched buckets keep their exact dirs
    touched = {
        r["b"]
        for r in keys.withColumn("b", t._bucket_col()).select("b").collect()
    }
    state2, _, _ = t._snapshot()
    for b, ds in state1.items():
        if b not in touched:
            assert state2.get(b) == ds
    # replay is a no-op even with different keys
    other = spark.createDataFrame([(1, 0)], "doc_id long, chunk_index long")
    assert t.delete(other, app_id="gdpr", batch_id=0) is False
    assert 1 in {r.doc_id for r in t.read(spark).collect()}
    # cascade shape: delete every chunk of one doc via an upstream filter
    all_of_doc3 = t.read(spark).where(F.col("doc_id") == 3).select(
        "doc_id", "chunk_index"
    )
    assert t.delete(all_of_doc3, app_id="gdpr", batch_id=1) is True
    assert 3 not in {r.doc_id for r in t.read(spark).collect()}
    # wrong key shape rejected
    with pytest.raises(ValueError, match="key columns"):
        t.delete(spark.createDataFrame([(1,)], "doc_id long"))


def test_occ_rival_landing_during_write_forces_retry(spark, tmp_path):
    """ADVICE r4 (high): a rival commit landing BETWEEN our snapshot and our
    publish must collide on the pinned version and force a retry — not be
    silently skipped past (which would publish a stale-snapshot bucket
    rewrite on top of the rival: its update lost AND shared-bucket rows
    duplicated)."""
    path = str(tmp_path / "t")
    t = MergeTable(path, ["doc_id", "chunk_index"], n_buckets=1)
    t.merge(_df(spark, [(1, 0, "a"), (2, 0, "b")]))

    real_snapshot = t._snapshot
    planted = {"done": False}

    def snapshot_then_rival(version=None):
        out = real_snapshot(version)
        if not planted["done"]:
            planted["done"] = True
            # rival writer commits AFTER our snapshot was taken, i.e. inside
            # the snapshot->publish window of the merge under test
            MergeTable(path).merge(_df(spark, [(1, 0, "rival")]))
        return out

    t._snapshot = snapshot_then_rival
    assert t.merge(_df(spark, [(2, 0, "ours"), (3, 0, "new")])) is True
    got = {(r.doc_id, r.chunk_index): r.payload for r in t.read(spark).collect()}
    # rival's update survives, our rows land once each — no lost update,
    # no duplicated bucket rows
    assert got == {(1, 0): "rival", (2, 0): "ours", (3, 0): "new"}
    assert [h["version"] for h in t.history()] == [0, 1, 2]


def test_vacuum_age_gate_spares_fresh_orphans(spark, tmp_path):
    """ADVICE r4 (medium): an in-flight concurrent writer's freshly written
    dir is an uncommitted orphan until its commit publishes; the default
    retention window must spare it. Aged past the window it is reclaimed."""
    import time as _time

    path = str(tmp_path / "t")
    t = MergeTable(path, ["doc_id", "chunk_index"], n_buckets=2)
    t.merge(_df(spark, [(1, 0, "a")]))
    t.merge(_df(spark, [(1, 0, "b")]))
    orphan = os.path.join(path, "files", "vinflightwriter")
    os.makedirs(orphan)
    # default retention: fresh orphan + fresh superseded dirs all survive
    assert t.vacuum(retain_versions=1) == 0
    assert os.path.exists(orphan)
    # age everything past the window -> reclaimed
    old = _time.time() - 7200
    os.utime(orphan, (old, old))
    assert t.vacuum(retain_versions=1) == 1
    assert not os.path.exists(orphan)


def test_merge_duplicate_source_keys(spark, tmp_path):
    """ADVICE r4 (low): two source rows sharing a key in one batch raise by
    default (Delta's multiple-source-match error) instead of silently
    inserting both; on_duplicate='any' keeps exactly one row per key."""
    path = str(tmp_path / "t")
    t = MergeTable(path, ["doc_id", "chunk_index"], n_buckets=4)
    dup = _df(spark, [(1, 0, "x"), (1, 0, "y"), (2, 0, "z")])
    with pytest.raises(ValueError, match="duplicate"):
        t.merge(dup)
    assert t._versions() == []  # nothing committed by the failed merge
    assert t.merge(dup, on_duplicate="any") is True
    assert t.read(spark).count() == 2
    assert {(r.doc_id, r.chunk_index) for r in t.read(spark).collect()} == {
        (1, 0),
        (2, 0),
    }


def test_concurrent_writers_interleaved_epochs_no_lost_updates(spark, tmp_path):
    """VERDICT r5 #7: two simultaneous writers race the O_EXCL versioned
    commit across interleaved epochs. Loser-retry semantics must guarantee:
    every merge eventually commits, the version log is gapless, no update
    is lost (each writer's final epoch survives on its exclusive keys; the
    overlap is uniformly owned by whichever writer committed last), and
    per-app txn replay dedup still holds afterwards."""
    import threading

    path = os.path.join(tmp_path, "race_tbl")
    t = MergeTable(path, ["k"], n_buckets=4)
    errors: list = []
    barrier = threading.Barrier(2)

    def writer(name: str, keys: list[int]) -> None:
        try:
            barrier.wait(timeout=30)
            for epoch in range(4):
                df = spark.createDataFrame(
                    [(k, f"{name}{epoch}") for k in keys], "k long, val string"
                )
                # generous retry budget: each attempt can lose to at most
                # one rival commit, and the rival makes progress each time
                assert t.merge(df, app_id=name, batch_id=epoch, max_retries=30)
        except Exception as e:  # noqa: BLE001 — surface in the main thread
            errors.append(e)

    ta = threading.Thread(target=writer, args=("A", list(range(0, 30))))
    tb = threading.Thread(target=writer, args=("B", list(range(20, 50))))
    ta.start(); tb.start(); ta.join(120); tb.join(120)
    assert not errors, errors

    vals = {r.k: r.val for r in t.read(spark).collect()}
    assert set(vals) == set(range(50))  # one row per key — no dup keys
    for k in range(0, 20):
        assert vals[k] == "A3"  # A-exclusive keys: A's last epoch survives
    for k in range(30, 50):
        assert vals[k] == "B3"
    overlap = {vals[k] for k in range(20, 30)}
    assert overlap in ({"A3"}, {"B3"})  # uniform winner = last committer

    # 8 merges → 8 commits, contiguous version numbers (no gaps, no reuse)
    versions = t._versions()
    assert versions == list(range(8))

    # replay dedup across the race: an old (app, batch) is still a no-op
    stale = spark.createDataFrame([(0, "stale")], "k long, val string")
    assert t.merge(stale, app_id="A", batch_id=2) is False
    assert {r.k: r.val for r in t.read(spark).collect()}[0] == "A3"
