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
