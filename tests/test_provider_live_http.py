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

    def _respond_json(self, obj):
        payload = json.dumps(obj).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        if "messages" in body:
            return self._do_chat(body)
        if "documents" in body:
            return self._do_rerank(body)
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


    def _do_chat(self, body):
        """Scripted OpenAI-style chat endpoint for the J2/J3 providers:
        deterministic output derived from the request; faults keyed on
        marker substrings (inside the prompt text, or inside the b64-decoded
        image bytes for vision calls)."""
        import base64

        content = body["messages"][0]["content"]
        if isinstance(content, str):
            probe, reply_src = content, content
        else:  # vision: [{image_url: {url: data:mime;base64,..}}, {text: ..}]
            data_url = next(
                p["image_url"]["url"] for p in content if p.get("type") == "image_url"
            )
            raw = base64.b64decode(data_url.split(",", 1)[1])
            probe = raw.decode("utf-8", errors="replace")
            reply_src = data_url
        with self.lock:
            self.state["n_requests"] = self.state.get("n_requests", 0) + 1
            seen = self.state.setdefault("per_key", {})
            seen[probe] = seen.get(probe, 0) + 1
            n_seen = seen[probe]
        if "always500" in probe:
            return self.send_error(500, "internal")
        if "badreq" in probe:
            return self.send_error(400, "bad request")
        if "flaky429" in probe and n_seen <= 2:
            return self.send_error(429, "rate limited")
        if "nochoices" in probe:
            return self._respond_json({"choices": []})
        prefix = "caption:" if isinstance(content, list) else "ctx:"
        reply = prefix + hashlib.md5(reply_src.encode()).hexdigest()[:8]
        return self._respond_json(
            {"choices": [{"message": {"role": "assistant", "content": " " + reply + " "}}]}
        )


    def _do_rerank(self, body):
        """Scripted Cohere-shaped rerank endpoint for the J4 provider:
        deterministic relevance derived from (query, document); faults
        keyed on marker substrings inside the documents."""
        query, docs = body["query"], body["documents"]
        with self.lock:
            self.state["n_requests"] = self.state.get("n_requests", 0) + 1
            key = query + "|" + "|".join(docs)
            seen = self.state.setdefault("per_key", {})
            seen[key] = seen.get(key, 0) + 1
            n_seen = seen[key]
        if any("always500" in d for d in docs):
            return self.send_error(500, "internal")
        if any("badreq" in d for d in docs):
            return self.send_error(400, "bad request")
        if any("flaky429" in d for d in docs) and n_seen <= 2:
            return self.send_error(429, "rate limited")
        results = [
            {"index": i, "relevance_score": _relevance(query, d)}
            for i, d in enumerate(docs)
        ]
        if any("partialscores" in d for d in docs):
            results = results[:1]  # malformed: not every document scored
        results.sort(key=lambda r: -r["relevance_score"])
        top_n = body.get("top_n", len(docs))
        return self._respond_json({"results": results[:top_n]})


def _relevance(query: str, text: str) -> float:
    h = hashlib.md5(f"{query}|{text}".encode()).digest()
    return round(int.from_bytes(h[:4], "big") / 2**32, 6)


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


# -- J2/J3 chat providers through the REAL urllib transport ------------------


def _expected_caption(payload: bytes, mime: str = "image/png") -> str:
    import base64

    data_url = f"data:{mime};base64,{base64.b64encode(payload).decode('ascii')}"
    return "caption:" + hashlib.md5(data_url.encode()).hexdigest()[:8]


def test_captioner_roundtrip_data_url_shape(live_server):
    from frappe_data_pipelines_spark.operators.providers import HTTPCaptioner

    url, state = live_server
    cap = HTTPCaptioner(transport=make_transport(url))
    payloads = [b"img-one bytes", b"img-two bytes"]
    got = cap.describe(payloads, ["image/png", "image/jpeg"])
    assert got == [
        _expected_caption(payloads[0], "image/png"),
        _expected_caption(payloads[1], "image/jpeg"),
    ]  # server derives from the data URL → proves the b64 request shape
    assert state["n_requests"] == 2  # one chat call per image


def test_captioner_retry_backoff_then_success(live_server):
    from frappe_data_pipelines_spark.operators.providers import (
        HTTPCaptioner,
        RetryPolicy,
    )

    url, state = live_server
    sleeps: list[float] = []
    cap = HTTPCaptioner(
        transport=make_transport(url),
        retry=RetryPolicy(max_attempts=4, base_delay=0.5, multiplier=2.0),
        sleeper=sleeps.append,
    )
    got = cap.describe([b"flaky429 image"])
    assert got == [_expected_caption(b"flaky429 image")]
    assert state["n_requests"] == 3  # 429, 429, 200
    assert sleeps == [0.5, 1.0]


def test_captioner_permanent_400_no_retry(live_server):
    from frappe_data_pipelines_spark.operators.providers import HTTPCaptioner

    url, state = live_server
    cap = HTTPCaptioner(transport=make_transport(url))
    with pytest.raises(ProviderError) as ei:
        cap.describe([b"badreq image"])
    assert not ei.value.retryable
    assert state["n_requests"] == 1


def test_contextualizer_roundtrip_and_exhaustion(live_server):
    from frappe_data_pipelines_spark.operators.providers import (
        HTTPContextualizer,
        RetryPolicy,
    )

    url, state = live_server
    ctx = HTTPContextualizer(
        transport=make_transport(url),
        retry=RetryPolicy(max_attempts=3, base_delay=0.01),
        sleeper=lambda _: None,
    )
    (got,) = ctx.contextualize([7], [0], [3], ["some chunk text"])
    prompt = ctx.template.format(
        document="document 7 (text unavailable)", i=1, n=3, chunk="some chunk text"
    )
    assert got == "ctx:" + hashlib.md5(prompt.encode()).hexdigest()[:8]
    # the wants_document slot carries the REAL document text when offered
    (got_doc,) = ctx.contextualize(
        [7], [0], [3], ["some chunk text"], ["the whole document body"]
    )
    prompt_doc = ctx.template.format(
        document="the whole document body", i=1, n=3, chunk="some chunk text"
    )
    assert got_doc == "ctx:" + hashlib.md5(prompt_doc.encode()).hexdigest()[:8]
    assert got_doc != got
    with pytest.raises(ProviderError, match="retries exhausted"):
        ctx.contextualize([8], [0], [1], ["always500 text"])


def test_chat_malformed_response_is_permanent(live_server):
    from frappe_data_pipelines_spark.operators.providers import HTTPContextualizer

    url, state = live_server
    ctx = HTTPContextualizer(transport=make_transport(url))
    with pytest.raises(ProviderError, match="no choices") as ei:
        ctx.contextualize([1], [0], [1], ["nochoices text"])
    assert not ei.value.retryable
    assert state["n_requests"] == 1


def test_enrich_chunks_live_contextualizer_dead_letters(live_server, spark):
    """The full J2 operator against the live endpoint: poisoned chunks get
    empty context + enrich_error (reference: failure → empty context,
    process_embedding.py:175-209); clean chunks get real contexts and the
    H16 embedded_text rule holds."""
    from pyspark.sql import functions as F

    from frappe_data_pipelines_spark.operators.enrich import enrich_chunks
    from frappe_data_pipelines_spark.operators.providers import (
        HTTPContextualizer,
        RetryPolicy,
    )

    url, state = live_server
    chunks = spark.createDataFrame(
        [
            (1, 0, 2, "clean alpha"),
            (1, 1, 2, "always500 poison"),
            (2, 0, 1, "clean beta"),
        ],
        "doc_id long, chunk_index int, total_chunks int, chunk_text string",
    )
    prov = HTTPContextualizer(
        transport=make_transport(url),
        retry=RetryPolicy(max_attempts=2, base_delay=0.01),
        sleeper=lambda _: None,
    )
    out = enrich_chunks(chunks, provider=prov).collect()
    by_key = {(r.doc_id, r.chunk_index): r for r in out}
    poisoned = by_key[(1, 1)]
    assert poisoned.context_prefix == ""
    assert "retries exhausted" in poisoned.enrich_error
    assert poisoned.embedded_text == "always500 poison"  # H16: empty prefix
    clean = by_key[(1, 0)]
    prompt = prov.template.format(
        document="document 1 (text unavailable)", i=1, n=2, chunk="clean alpha"
    )
    assert clean.context_prefix == "ctx:" + hashlib.md5(prompt.encode()).hexdigest()[:8]
    assert clean.embedded_text == clean.context_prefix + "\n\nclean alpha"
    assert clean.enrich_error is None


def test_decode_media_meta_live_captioner_dead_letters(live_server, spark):
    """J3 through the decode seam: provider captions replace the local ones;
    a poisoned image keeps the deterministic local caption and records
    caption_error — row-grained, no task abort."""
    from frappe_data_pipelines_spark.operators.multimodal import decode_media_meta
    from frappe_data_pipelines_spark.operators.providers import (
        HTTPCaptioner,
        RetryPolicy,
    )

    url, state = live_server
    media = spark.createDataFrame(
        [
            (1, bytearray(b"clean image bytes"), "image/png"),
            (2, bytearray(b"always500 poison img"), "image/png"),
        ],
        "doc_id long, content binary, mime string",
    )

    def factory(_url=url):
        return HTTPCaptioner(
            transport=make_transport(_url),
            retry=RetryPolicy(max_attempts=2, base_delay=0.01),
            sleeper=lambda _: None,
        )

    rows = {r.doc_id: r for r in
            decode_media_meta(media, caption_provider_factory=factory).collect()}
    assert rows[1].caption == _expected_caption(b"clean image bytes")
    assert rows[1].caption_error is None
    assert rows[2].caption.startswith("media:")  # local fallback caption kept
    assert "retries exhausted" in rows[2].caption_error
    # width/height/n_frames still populated for BOTH rows (decode ran)
    assert rows[2].width > 0 and rows[2].height > 0


def test_caption_with_dead_letter_operator(live_server, spark):
    from frappe_data_pipelines_spark.operators.providers import (
        HTTPCaptioner,
        RetryPolicy,
        caption_with_dead_letter,
    )

    url, state = live_server
    df = spark.createDataFrame(
        [(1, bytearray(b"ok img"), "image/gif"), (2, bytearray(b"badreq img"), None)],
        "doc_id long, content binary, mime string",
    )

    def factory(_url=url):
        return HTTPCaptioner(
            transport=make_transport(_url),
            retry=RetryPolicy(max_attempts=2, base_delay=0.01),
            sleeper=lambda _: None,
        )

    rows = {r.doc_id: r for r in
            caption_with_dead_letter(df, provider_factory=factory).collect()}
    assert rows[1].caption == _expected_caption(b"ok img", "image/gif")
    assert rows[1].caption_error is None
    assert rows[2].caption is None
    assert "HTTP 400" in rows[2].caption_error
    assert len(rows[2].caption_error) <= 500


# -- J4 rerank provider through the REAL urllib transport --------------------


def test_reranker_roundtrip_scores_by_index(live_server):
    from frappe_data_pipelines_spark.operators.providers import HTTPReranker

    url, state = live_server
    rr = HTTPReranker(transport=make_transport(url))
    texts = ["first doc", "second doc", "third doc"]
    scores = rr.rerank("the query", texts)
    # the server replies relevance-sorted; the provider must map results
    # back to INPUT order via index (reference: results[item.index])
    assert scores == [_relevance("the query", t) for t in texts]
    assert state["n_requests"] == 1
    assert rr.rerank("anything", []) == []


def test_reranker_429_retry_then_success(live_server):
    from frappe_data_pipelines_spark.operators.providers import HTTPReranker

    url, state = live_server
    sleeps: list[float] = []
    rr = HTTPReranker(
        transport=make_transport(url),
        retry=RetryPolicy(max_attempts=4, base_delay=0.5, multiplier=2.0),
        sleeper=sleeps.append,
    )
    scores = rr.rerank("q", ["flaky429 doc", "other"])
    assert scores == [_relevance("q", "flaky429 doc"), _relevance("q", "other")]
    assert state["n_requests"] == 3  # 429, 429, 200
    assert sleeps == [0.5, 1.0]


def test_reranker_400_is_permanent_no_retry(live_server):
    from frappe_data_pipelines_spark.operators.providers import HTTPReranker

    url, state = live_server
    rr = HTTPReranker(transport=make_transport(url))
    with pytest.raises(ProviderError) as ei:
        rr.rerank("q", ["badreq doc"])
    assert not ei.value.retryable
    assert state["n_requests"] == 1


def test_reranker_partial_scores_is_permanent(live_server):
    from frappe_data_pipelines_spark.operators.providers import HTTPReranker

    url, state = live_server
    rr = HTTPReranker(transport=make_transport(url))
    with pytest.raises(ProviderError, match="scored documents"):
        rr.rerank("q", ["partialscores doc", "other"])
    assert state["n_requests"] == 1  # malformed = permanent, no retry


def test_rerank_with_provider_live_roundtrip_and_fallback(live_server, spark):
    """The full J4 path against the live server: success reorders by the
    endpoint's relevance; a failing endpoint falls back to the incoming
    vector order cut to top_k (reference search_service.py:305-316) —
    reranking is an enhancement, never a point of failure."""
    from frappe_data_pipelines_spark.operators.providers import HTTPReranker
    from frappe_data_pipelines_spark.operators.search import rerank_with_provider

    url, _state = live_server
    cands = spark.createDataFrame(
        [(1, "alpha doc", 0.9), (2, "beta doc", 0.8), (3, "gamma doc", 0.7)],
        "doc_id long, text string, score double",
    )
    rr = HTTPReranker(transport=make_transport(url))
    out = rerank_with_provider(cands, "the query", provider=rr, top_k=2).collect()
    want = sorted(
        [(d, _relevance("the query", t)) for d, t in
         [(1, "alpha doc"), (2, "beta doc"), (3, "gamma doc")]],
        key=lambda p: (-p[1], p[0]),
    )[:2]
    assert [(r.doc_id, r.relevance) for r in out] == want

    poisoned = spark.createDataFrame(
        [(1, "always500 doc", 0.9), (2, "fine doc", 0.8)],
        "doc_id long, text string, score double",
    )
    rr_fast = HTTPReranker(
        transport=make_transport(url),
        retry=RetryPolicy(max_attempts=2, base_delay=0.01),
        sleeper=lambda _: None,
    )
    fb = rerank_with_provider(poisoned, "q", provider=rr_fast, top_k=2).collect()
    assert [(r.doc_id, r.relevance) for r in fb] == [(1, None), (2, None)]
