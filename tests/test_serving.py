"""Continuous-batching engine tests (CPU, tiny model)."""

import jax
import numpy as np
import pytest

from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                               tiny_test_model)
from realtime_kv_cache_compression_tpu.models import llama
from realtime_kv_cache_compression_tpu.serving import ServingEngine


@pytest.fixture(scope="module")
def engine_parts():
    mcfg = tiny_test_model(num_layers=2)
    ccfg = CompressionConfig(num_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), mcfg)
    return params, mcfg, ccfg


def make_engine(engine_parts, **kw):
    params, mcfg, ccfg = engine_parts
    base = dict(num_slots=2, context_len=64, max_new_tokens=9,
                decode_chunk=4)
    base.update(kw)
    return ServingEngine(params, mcfg, ccfg, **base)


def prompt(seed, n=64):
    rng = np.random.default_rng(seed)
    return rng.integers(1, 250, size=n).tolist()


def test_single_request_completes(engine_parts):
    eng = make_engine(engine_parts)
    rid = eng.submit(prompt(0), max_new_tokens=5)
    done = eng.run()
    assert rid in done
    req = done[rid]
    assert req.finished and len(req.tokens) == 5
    assert req.ttft is not None and req.ttft > 0
    assert req.prefill_stats["avg_memory_savings"] > 0


def test_more_requests_than_slots(engine_parts):
    eng = make_engine(engine_parts, num_slots=2)
    rids = [eng.submit(prompt(i), max_new_tokens=5) for i in range(5)]
    done = eng.run()
    assert sorted(done) == sorted(rids)
    assert all(len(done[r].tokens) == 5 for r in rids)
    s = eng.summary()
    assert s["completed"] == 5
    assert s["total_tokens"] == 25


def test_batched_tokens_match_standalone_generation(engine_parts):
    """A request served in a batch must produce the same greedy tokens as
    standalone generate() on the same bucketed prompt."""
    params, mcfg, ccfg = engine_parts
    eng = make_engine(engine_parts, num_slots=2, max_new_tokens=9)
    p = prompt(42)
    rid_a = eng.submit(p, max_new_tokens=8)
    rid_b = eng.submit(prompt(7), max_new_tokens=8)
    done = eng.run()

    import jax.numpy as jnp
    ids = jnp.asarray(p, jnp.int32)[None]
    ref, _ = llama.generate(params, ids, mcfg, ccfg, max_new_tokens=8)
    assert done[rid_a].tokens == [int(t) for t in ref[0]]


def test_async_admission_matches_sync(engine_parts):
    """async_admission=True produces identical tokens to the sync engine."""
    eng_s = make_engine(engine_parts, num_slots=2)
    eng_a = make_engine(engine_parts, num_slots=2, async_admission=True)
    prompts = [prompt(i) for i in range(4)]
    rids_s = [eng_s.submit(p, max_new_tokens=5) for p in prompts]
    rids_a = [eng_a.submit(p, max_new_tokens=5) for p in prompts]
    done_s = eng_s.run()
    done_a = eng_a.run()
    for rs, ra in zip(rids_s, rids_a):
        assert done_s[rs].tokens == done_a[ra].tokens
    assert eng_a.summary()["completed"] == 4


def test_interleaved_admission(engine_parts):
    """New requests admitted while others are mid-decode."""
    eng = make_engine(engine_parts, num_slots=2, decode_chunk=2)
    r1 = eng.submit(prompt(1), max_new_tokens=7)
    eng.step()
    eng.step()
    r2 = eng.submit(prompt(2), max_new_tokens=3)
    done = eng.run()
    assert len(done[r1].tokens) == 7
    assert len(done[r2].tokens) == 3
