"""Live-transport smoke for HTTPEmbedder (VERDICT r3 #8): a real in-process
HTTP server with scripted faults (429 / 500 / 400 / timeout), exercised
through the REAL urllib transport — not the injected test transport.
Asserts retry/backoff accounting, token-bucket pacing under concurrent
providers, and dead-letter rows through a live Spark mapInPandas pass.

Reference contract: fdp/services/embedding_service.py:72-180 (provider
calls), tasks/process_embedding.py:60-90 (failure capture).
"""

from __future__ import annotations

import hashlib
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from frappe_data_pipelines_spark.operators.providers import (
    HTTPEmbedder,
    ProviderError,
    RetryPolicy,
    make_transport,
)

DIM = 4


def _vec(text: str) -> list[float]:
    h = hashlib.md5(text.encode()).digest()
    return [round(b / 255.0, 6) for b in h[:DIM]]


class _Handler(BaseHTTPRequestHandler):
    state: dict = {}
    lock = threading.Lock()

    def log_message(self, *args):  # quiet
        pass

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        texts = body["input"]
        with self.lock:
            self.state["n_requests"] = self.state.get("n_requests", 0) + 1
            self.state.setdefault("timestamps", []).append(time.monotonic())
            key = "|".join(texts)
            seen = self.state.setdefault("per_key", {})
            seen[key] = seen.get(key, 0) + 1
            n_seen = seen[key]
        if any("always500" in t for t in texts):
            self.send_error(500, "internal")
            return
        if any("badreq" in t for t in texts):
            self.send_error(400, "bad request")
            return
        if any("flaky429" in t for t in texts) and n_seen <= 2:
            self.send_error(429, "rate limited")
            return
        if any("slowpoke" in t for t in texts) and n_seen <= 1:
            time.sleep(1.0)  # longer than the client timeout → socket timeout
        payload = json.dumps({"embeddings": [_vec(t) for t in texts]}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)


@pytest.fixture()
def live_server():
    _Handler.state = {}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/embed", _Handler.state
    srv.shutdown()


def test_success_roundtrip(live_server):
    url, state = live_server
    emb = HTTPEmbedder(dim=DIM, transport=make_transport(url))
    got = emb.embed(["hello", "world"])
    assert got == [_vec("hello"), _vec("world")]
    assert state["n_requests"] == 1  # one batch → one HTTP call


def test_429_retry_then_success_with_backoff_schedule(live_server):
    url, state = live_server
    sleeps: list[float] = []
    emb = HTTPEmbedder(
        dim=DIM,
        transport=make_transport(url),
        retry=RetryPolicy(max_attempts=4, base_delay=0.5, multiplier=2.0),
        sleeper=sleeps.append,  # record, don't wait
    )
    got = emb.embed(["flaky429 doc"])
    assert got == [_vec("flaky429 doc")]
    assert state["n_requests"] == 3  # 429, 429, 200
    assert sleeps == [0.5, 1.0]  # exponential schedule, one per retry


def test_400_is_permanent_no_retry(live_server):
    url, state = live_server
    emb = HTTPEmbedder(dim=DIM, transport=make_transport(url))
    with pytest.raises(ProviderError) as ei:
        emb.embed(["badreq doc"])
    assert not ei.value.retryable
    assert state["n_requests"] == 1  # no retry on a permanent error


def test_500_exhausts_retry_budget(live_server):
    url, state = live_server
    emb = HTTPEmbedder(
        dim=DIM,
        transport=make_transport(url),
        retry=RetryPolicy(max_attempts=3, base_delay=0.01),
        sleeper=lambda _: None,
    )
    with pytest.raises(ProviderError, match="retries exhausted"):
        emb.embed(["always500 doc"])
    assert state["n_requests"] == 3  # attempts == max_attempts, then give up


def test_socket_timeout_is_retryable(live_server):
    url, state = live_server
    emb = HTTPEmbedder(
        dim=DIM,
        transport=make_transport(url, timeout=0.3),
        retry=RetryPolicy(max_attempts=3, base_delay=0.01),
        sleeper=lambda _: None,
    )
    got = emb.embed(["slowpoke doc"])  # first call times out, second succeeds
    assert got == [_vec("slowpoke doc")]
    assert state["n_requests"] >= 2


def test_token_bucket_paces_concurrent_providers(live_server):
    """Two providers (two simulated executor processes), each bucket-limited
    to 20 req/s with burst 1: 8 requests apiece cannot land faster than the
    combined pacing floor — and the server sees every request."""
    url, state = live_server

    def run_provider():
        emb = HTTPEmbedder(
            dim=DIM,
            transport=make_transport(url),
            rate_limit_per_sec=20.0,
        )
        emb._bucket.capacity = 1.0  # no burst: strict pacing
        emb._bucket._tokens = 1.0
        for i in range(8):
            emb.embed([f"doc {i}"])

    t0 = time.monotonic()
    threads = [threading.Thread(target=run_provider) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.monotonic() - t0
    assert state["n_requests"] == 16
    # each provider: 7 paced gaps at 1/20 s → >= 0.35 s wall-clock floor
    assert elapsed >= 0.3, f"bucket did not pace: {elapsed:.3f}s for 16 reqs"


def test_dead_letter_rows_through_live_endpoint(live_server, spark):
    """The full operator path against the live server: poisoned rows
    dead-letter with the truncated error message; clean rows embed."""
    from frappe_data_pipelines_spark.operators.providers import (
        embed_with_dead_letter,
        split_dead_letters,
    )

    url, state = live_server
    df = spark.createDataFrame(
        [(1, "clean one"), (2, "always500 poison"), (3, "clean two")],
        "doc_id long, chunk_text string",
    )

    def factory(_url=url):
        return HTTPEmbedder(
            dim=DIM,
            transport=make_transport(_url),
            retry=RetryPolicy(max_attempts=2, base_delay=0.01),
            sleeper=lambda _: None,
        )

    out = embed_with_dead_letter(df, provider_factory=factory, sub_batch=1)
    ok, dead = split_dead_letters(out)
    ok_rows = {r.doc_id: r.embedding for r in ok.collect()}
    dead_rows = {r.doc_id: r.embed_error for r in dead.collect()}
    assert set(ok_rows) == {1, 3}
    assert [round(float(x), 6) for x in ok_rows[1]] == _vec("clean one")
    assert set(dead_rows) == {2}
    assert "retries exhausted" in dead_rows[2]
    assert len(dead_rows[2]) <= 500  # reference truncation contract
