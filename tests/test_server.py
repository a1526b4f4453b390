"""HTTP serving front-end tests: OpenAI-style /v1/completions over the
continuous-batching engine (serving/server.py).

The reference exposes no network API (generation = in-process HF
`model.generate`, longbench_eval.py:131-139); these tests cover the
framework's deployable surface: completion responses, token-id prompts,
stop sequences, SSE streaming, concurrency, and error paths. All CPU,
tiny model, real HTTP over localhost.
"""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

import realtime_kv_cache_compression_tpu as rtc
from realtime_kv_cache_compression_tpu.models import llama
from realtime_kv_cache_compression_tpu.serving import (CompletionServer,
                                                       ServingEngine)
from realtime_kv_cache_compression_tpu.utils.tokenizer import ByteTokenizer


@pytest.fixture(scope="module")
def served():
    tok = ByteTokenizer()
    mcfg = rtc.tiny_test_model(vocab_size=tok.vocab_size)
    ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers)
    params = llama.init_params(jax.random.PRNGKey(0), mcfg)
    engine = ServingEngine(params, mcfg, ccfg, num_slots=2, context_len=64,
                           max_new_tokens=16, decode_chunk=4, logprobs=True)
    with CompletionServer(engine, tok, host="127.0.0.1", port=0) as srv:
        yield srv, engine, params, mcfg, ccfg


def _post(srv, path, body, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _get(srv, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}{path}", timeout=30) as r:
        return r.status, json.loads(r.read())


def test_health_models_stats(served):
    srv, *_ = served
    code, health = _get(srv, "/health")
    assert code == 200 and health["status"] == "ok"
    code, models = _get(srv, "/v1/models")
    assert code == 200 and models["data"][0]["id"] == srv.model_id
    code, stats = _get(srv, "/stats")
    assert code == 200 and stats["num_slots"] == 2


def test_completion_text_prompt(served):
    srv, *_ = served
    code, out = _post(srv, "/v1/completions",
                      {"prompt": "hello world", "max_tokens": 8})
    assert code == 200
    assert out["object"] == "text_completion"
    choice = out["choices"][0]
    assert isinstance(choice["text"], str)
    assert choice["finish_reason"] in ("stop", "length")
    assert out["usage"]["completion_tokens"] <= 8
    assert out["usage"]["prompt_tokens"] == len(
        ByteTokenizer().encode("hello world"))
    # compression telemetry rides on every response
    assert 0.0 < out["rtkv"]["memory_savings"] <= 1.0
    assert len(choice["logprobs"]["token_logprobs"]) \
        == out["usage"]["completion_tokens"]


def test_token_ids_prompt_matches_direct_engine(served):
    """Server output must be token-identical to driving an engine directly."""
    srv, engine, params, mcfg, ccfg = served
    rng = np.random.RandomState(3)
    ids = rng.randint(0, 256, size=40).tolist()
    code, out = _post(srv, "/v1/completions",
                      {"prompt": ids, "max_tokens": 12})
    assert code == 200

    ref = ServingEngine(params, mcfg, ccfg, num_slots=2, context_len=64,
                        max_new_tokens=16, decode_chunk=4)
    rid = ref.submit(ids, max_new_tokens=12)
    ref.run()
    expect = ByteTokenizer().decode(ref.completed[rid].tokens)
    assert out["choices"][0]["text"] == expect
    assert out["usage"]["completion_tokens"] == len(ref.completed[rid].tokens)


def test_echo_and_stop(served):
    srv, *_ = served
    code, out = _post(srv, "/v1/completions",
                      {"prompt": "abc", "max_tokens": 4, "echo": True})
    assert code == 200
    assert out["choices"][0]["text"].startswith("abc")


def test_streaming_sse(served):
    srv, *_ = served
    body = json.dumps({"prompt": "stream me", "max_tokens": 8,
                       "stream": True}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/v1/completions", data=body,
        headers={"Content-Type": "application/json"})
    deltas, finish = [], None
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                break
            obj = json.loads(payload)
            ch = obj["choices"][0]
            if ch["finish_reason"] is None:
                deltas.append(ch["text"])
            else:
                finish = ch["finish_reason"]
    assert finish in ("stop", "length")
    # Streamed deltas concatenate to the same text a non-streamed call gives.
    code, full = _post(srv, "/v1/completions",
                       {"prompt": "stream me", "max_tokens": 8})
    assert "".join(deltas) == full["choices"][0]["text"]


def test_concurrent_requests(served):
    """Multiple handler threads in flight at once; slots (2) < requests (4)."""
    srv, *_ = served
    results = {}

    def go(i):
        results[i] = _post(srv, "/v1/completions",
                           {"prompt": f"request number {i}",
                            "max_tokens": 6})

    threads = [threading.Thread(target=go, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 4
    for code, out in results.values():
        assert code == 200
        assert out["usage"]["completion_tokens"] <= 6
    # Determinism under concurrency: same prompt → same text, greedy engine.
    code_a, out_a = _post(srv, "/v1/completions",
                          {"prompt": "request number 0", "max_tokens": 6})
    assert out_a["choices"][0]["text"] == results[0][1]["choices"][0]["text"]


def test_streamed_and_nonstreamed_stop_text_agree(served):
    """A matched stop sequence must not leak into the SSE stream: streamed
    deltas concatenate to exactly the stop-stripped non-streamed text
    (round-2 advisor finding, server.py streaming path)."""
    srv, *_ = served
    code, full = _post(srv, "/v1/completions",
                       {"prompt": "stop test", "max_tokens": 10})
    base_text = full["choices"][0]["text"]
    if len(base_text) < 4:
        pytest.skip("generation too short to carve a stop out of")
    stop = base_text[2:4]  # likely mid-generation stop match
    code, stopped = _post(srv, "/v1/completions",
                          {"prompt": "stop test", "max_tokens": 10,
                           "stop": stop})
    assert code == 200
    # (whether the stop matches at token level depends on byte alignment;
    # the invariant under test is stream/non-stream agreement either way)
    body = json.dumps({"prompt": "stop test", "max_tokens": 10,
                       "stop": stop, "stream": True}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/v1/completions", data=body,
        headers={"Content-Type": "application/json"})
    deltas = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                break
            ch = json.loads(payload)["choices"][0]
            if ch["finish_reason"] is None:
                deltas.append(ch["text"])
    assert "".join(deltas) == stopped["choices"][0]["text"]


def test_streamer_withholds_stop_prefix_deterministic(served):
    """Unit-level: the SSE streamer must hold back any text tail that is a
    prefix of a stop sequence until disambiguated, and never emit matched
    stop text (the final delta comes from the stop-stripped resolution)."""
    from realtime_kv_cache_compression_tpu.serving.server import _Job

    srv, *_ = served
    job = _Job(input_ids=[], max_new_tokens=8, stop_sequences=[],
               stop_texts=["XY"], stream=True, echo=False)
    on_token = srv._make_streamer(job)

    class FakeReq:
        tokens = []

    req = FakeReq()
    req.tokens = [ord(c) for c in "abcX"]
    on_token(req, [req.tokens[-1]])
    assert job.sent_text == "abc"          # "X" withheld: prefix of "XY"
    req.tokens = [ord(c) for c in "abcXZ"]  # disambiguated: not a stop
    on_token(req, [req.tokens[-1]])
    assert job.sent_text == "abcXZ"
    # Now a real stop match: engine truncates tokens to include the stop.
    req.tokens = [ord(c) for c in "abcXZqXY"]
    on_token(req, [req.tokens[-1]])
    assert job.sent_text == "abcXZq"       # matched stop never streamed
    job.request = req
    assert srv._final_text(job) == "abcXZq"
    deltas = []
    while not job.stream_q.empty():
        deltas.append(job.stream_q.get())
    assert "".join(deltas) == "abcXZq"


def test_completed_requests_released_but_counted(served):
    """Served requests must not accumulate in engine.completed (round-2
    advisor finding); lifetime stats survive in the O(1) aggregates."""
    srv, engine, *_ = served
    before = engine.summary().get("completed", 0)
    code, _ = _post(srv, "/v1/completions",
                    {"prompt": "count me", "max_tokens": 4})
    assert code == 200
    assert engine.summary()["completed"] == before + 1
    assert not engine.completed  # resolved and released, not accumulated
    code, stats = _get(srv, "/stats")
    assert stats["summary"]["completed"] == before + 1
    assert stats["driver_alive"] is True


def test_malformed_scalars_return_400(served):
    """Type errors in request fields must produce a clean 400, never a
    crashed handler / dropped socket (round-2 advisor finding)."""
    srv, *_ = served
    for bad in ({"prompt": [1, [2]], "max_tokens": 4},
                {"prompt": "x", "max_tokens": "often"}):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/v1/completions", bad)
        assert e.value.code == 400, bad
    # Explicit JSON null max_tokens = OpenAI "use the default", not an error.
    code, out = _post(srv, "/v1/completions",
                      {"prompt": "x", "max_tokens": None})
    assert code == 200


def test_driver_death_fails_pending_and_returns_503():
    """If engine.step() raises, in-flight jobs resolve with an error (no
    hang on job.done.wait), /health flips, and new posts get 503."""
    tok = ByteTokenizer()
    mcfg = rtc.tiny_test_model(vocab_size=tok.vocab_size)
    ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers)
    params = llama.init_params(jax.random.PRNGKey(0), mcfg)
    engine = ServingEngine(params, mcfg, ccfg, num_slots=2, context_len=64,
                           max_new_tokens=16, decode_chunk=4)

    def boom():
        raise RuntimeError("injected engine failure")

    engine.step = boom
    with CompletionServer(engine, tok, host="127.0.0.1", port=0) as srv:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/v1/completions", {"prompt": "doomed",
                                           "max_tokens": 4}, timeout=60)
        assert e.value.code in (500, 503)
        srv._driver.join(timeout=10)
        try:
            code, health = _get(srv, "/health")
        except urllib.error.HTTPError as he:
            code, health = he.code, json.loads(he.read())
        assert code == 503 and health["status"] == "driver_dead"
        assert "injected engine failure" in (health["driver_error"] or "")
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/v1/completions", {"prompt": "after death",
                                           "max_tokens": 4}, timeout=60)
        assert e.value.code == 503


def test_prefix_registration_endpoint():
    """POST /v1/prefixes registers a shared prefix; completions extending
    it admit via a partial hit (suffix-only prefill)."""
    tok = ByteTokenizer()
    mcfg = rtc.tiny_test_model(vocab_size=tok.vocab_size)
    ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers)
    params = llama.init_params(jax.random.PRNGKey(0), mcfg)
    engine = ServingEngine(params, mcfg, ccfg, num_slots=2, context_len=64,
                           max_new_tokens=8, decode_chunk=4,
                           prefix_continue_budget=16)
    with CompletionServer(engine, tok, host="127.0.0.1", port=0) as srv:
        sys_prompt = list(range(2, 34))
        code, out = _post(srv, "/v1/prefixes", {"prompt": sys_prompt})
        assert code == 200 and out["registered"]
        code, out = _post(srv, "/v1/completions",
                          {"prompt": sys_prompt + [40, 41, 42],
                           "max_tokens": 6})
        assert code == 200
        assert engine.prefix_partial_hits == 1
        code, stats = _get(srv, "/stats")
        assert stats["summary"]["prefix_cache"]["partial_hits"] == 1
        assert stats["summary"]["prefix_cache"]["registered"] == 1
        # Without the budget, registration is a clean 400.
    engine2 = ServingEngine(params, mcfg, ccfg, num_slots=2, context_len=64,
                            max_new_tokens=8, decode_chunk=4)
    with CompletionServer(engine2, tok, host="127.0.0.1", port=0) as srv:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/v1/prefixes", {"prompt": [1, 2, 3]})
        assert e.value.code == 400


def test_error_paths(served):
    srv, *_ = served
    # Bad sampling override → 400 (sampling is compiled into the engine).
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/v1/completions", {"prompt": "x", "temperature": 0.9})
    assert e.value.code == 400
    # Unknown path → 404.
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/nope", {})
    assert e.value.code == 404
    # Invalid JSON → 400.
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/v1/completions", data=b"{oops",
        headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
