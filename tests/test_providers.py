"""Retry / rate-limit / dead-letter provider semantics (SURVEY §2.J J1/B4)."""

from __future__ import annotations

import pytest

from frappe_data_pipelines_spark.operators.providers import (
    HTTPEmbedder,
    ProviderError,
    RetryPolicy,
    TokenBucket,
    embed_with_dead_letter,
    split_dead_letters,
)


class ScriptedTransport:
    """Fails with the scripted errors (in order), then succeeds."""

    def __init__(self, failures=(), dim=4):
        self.failures = list(failures)
        self.dim = dim
        self.calls = 0

    def __call__(self, payload):
        self.calls += 1
        if self.failures:
            raise self.failures.pop(0)
        return {"embeddings": [[float(len(t))] * self.dim for t in payload["input"]]}


def make_embedder(transport, **kw):
    kw.setdefault("retry", RetryPolicy(max_attempts=3, base_delay=0.5, multiplier=2.0))
    kw.setdefault("sleeper", lambda s: None)
    return HTTPEmbedder(dim=4, transport=transport, **kw)


def test_retry_then_succeed_with_backoff():
    slept = []
    t = ScriptedTransport(failures=[ProviderError("503", True), ProviderError("timeout", True)])
    emb = make_embedder(t, sleeper=slept.append)
    out = emb.embed(["ab", "cde"])
    assert t.calls == 3
    assert out == [[2.0] * 4, [3.0] * 4]
    assert slept == [0.5, 1.0]  # base, base*mult


def test_retries_exhausted_becomes_permanent():
    t = ScriptedTransport(failures=[ProviderError("503", True)] * 5)
    emb = make_embedder(t)
    with pytest.raises(ProviderError) as ei:
        emb.embed(["x"])
    assert not ei.value.retryable
    assert "retries exhausted after 3 attempts" in str(ei.value)
    assert t.calls == 3  # max_attempts calls, no more


def test_permanent_error_never_retries():
    t = ScriptedTransport(failures=[ProviderError("400 bad request", False)])
    with pytest.raises(ProviderError):
        make_embedder(t).embed(["x"])
    assert t.calls == 1


def test_malformed_response_is_permanent():
    class Bad:
        calls = 0

        def __call__(self, payload):
            self.calls += 1
            return {"embeddings": [[0.0]]}  # wrong count for 2 inputs

    b = Bad()
    with pytest.raises(ProviderError, match="malformed"):
        make_embedder(b).embed(["a", "b"])
    assert b.calls == 1


def test_batching_splits_requests():
    t = ScriptedTransport()
    emb = make_embedder(t, batch_size=2)
    out = emb.embed(["a", "bb", "ccc", "dddd", "e"])
    assert t.calls == 3  # 2+2+1
    assert [v[0] for v in out] == [1.0, 2.0, 3.0, 4.0, 1.0]


def test_token_bucket_throttles():
    now = [0.0]
    slept = []

    def sleeper(s):
        slept.append(s)
        now[0] += s

    b = TokenBucket(rate=2.0, capacity=2.0, clock=lambda: now[0], sleeper=sleeper)
    b.acquire()  # burst token 1
    b.acquire()  # burst token 2
    b.acquire()  # empty -> waits 1/rate = 0.5s
    assert slept == [0.5]
    now[0] += 10.0  # long idle refills to capacity, not beyond
    b.acquire()
    b.acquire()
    b.acquire()
    assert slept == [0.5, 0.5]


# -- dead-letter operator (Spark) -------------------------------------------

POISON = "<<poison>>"


def _make_poison_factory():
    """Build the factory as a *nested* function: cloudpickle serializes
    nested closures by value, so executors (which can't import tests/)
    still reconstruct it."""

    def factory():
        from frappe_data_pipelines_spark.operators.providers import ProviderError

        class PoisonProvider:
            batch_size = 2

            def embed(self, texts):
                if any("<<poison>>" in t for t in texts):
                    raise ProviderError("unembeddable content", retryable=False)
                return [[float(len(t)), 1.0] for t in texts]

        return PoisonProvider()

    return factory


def test_embed_with_dead_letter_rows(spark):
    df = spark.createDataFrame(
        [("d1", "alpha"), ("d2", POISON + " bad"), ("d3", "gamma"), ("d4", "delta")],
        "doc_id string, chunk_text string",
    ).repartition(1)
    out = embed_with_dead_letter(df, provider_factory=_make_poison_factory(), sub_batch=1)
    ok, dead = split_dead_letters(out)
    ok_rows = {r.doc_id: r.embedding for r in ok.collect()}
    dead_rows = {r.doc_id: r.embed_error for r in dead.collect()}
    assert set(ok_rows) == {"d1", "d3", "d4"}
    assert ok_rows["d1"] == [5.0, 1.0]
    assert set(dead_rows) == {"d2"}
    assert "unembeddable" in dead_rows["d2"]
    # schema: original cols + embedding + embed_error
    assert out.columns == ["doc_id", "chunk_text", "embedding", "embed_error"]


def test_dead_letter_batch_granularity(spark):
    # sub_batch=2: the poison row drags its batchmate into the dead letters —
    # batch-grained failure, matching the reference's whole-job Failed status.
    df = spark.createDataFrame(
        [("d1", "alpha"), ("d2", POISON), ("d3", "gamma")],
        "doc_id string, chunk_text string",
    ).coalesce(1)
    out = embed_with_dead_letter(df, provider_factory=_make_poison_factory(), sub_batch=2)
    _, dead = split_dead_letters(out)
    assert dead.count() == 2  # d1+d2 share the failed batch


def test_error_message_truncated(spark):
    def long_error_factory():
        from frappe_data_pipelines_spark.operators.providers import ProviderError

        class LongError:
            batch_size = 50

            def embed(self, texts):
                raise ProviderError("x" * 2000, retryable=False)

        return LongError()

    df = spark.createDataFrame([("d1", "a")], "doc_id string, chunk_text string")
    out = embed_with_dead_letter(df, provider_factory=long_error_factory)
    err = out.collect()[0].embed_error
    assert len(err) == 500  # reference truncation process_embedding.py:71


def test_reranker_duplicate_index_is_permanent():
    """A malformed response with a duplicate index must raise, even when
    every slot ends up covered (the duplicate would otherwise silently
    overwrite the earlier score) — round-9 ADVICE fix."""
    from frappe_data_pipelines_spark.operators.providers import (
        HTTPReranker,
        ProviderError,
    )

    def dup_transport(_req):
        return {
            "results": [
                {"index": 0, "relevance_score": 0.9},
                {"index": 1, "relevance_score": 0.8},
                {"index": 1, "relevance_score": 0.7},  # repeat
                {"index": 0, "relevance_score": 0.6},  # repeat covers slot 0 again
            ]
        }

    rr = HTTPReranker(transport=dup_transport)
    with pytest.raises(ProviderError, match="duplicate index") as ei:
        rr.rerank("q", ["a", "b"])
    assert not ei.value.retryable
