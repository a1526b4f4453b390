"""Prefix caching: repeated prompts re-admit from cached compressed
prefill states with zero prefill work, token-identically."""

import jax
import numpy as np

import realtime_kv_cache_compression_tpu as rtc
from realtime_kv_cache_compression_tpu.models import llama
from realtime_kv_cache_compression_tpu.serving.engine import ServingEngine


def _setup(seed=0, n_prompts=3):
    mcfg = rtc.tiny_test_model()
    ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers)
    params = llama.init_params(jax.random.PRNGKey(seed), mcfg)
    rng = np.random.RandomState(seed + 1)
    prompts = [rng.randint(0, mcfg.vocab_size, size=n).tolist()
               for n in rng.randint(40, 64, size=n_prompts)]
    return mcfg, ccfg, params, prompts


def _engine(params, mcfg, ccfg, **kw):
    kw.setdefault("num_slots", 2)
    kw.setdefault("context_len", 64)
    kw.setdefault("max_new_tokens", 10)
    kw.setdefault("decode_chunk", 4)
    return ServingEngine(params, mcfg, ccfg, **kw)


def _go(eng, prompt, **kw):
    """Submit then drive to completion (in that order)."""
    rid = eng.submit(prompt, **kw)
    return eng.run()[rid]


def _count_prefills(eng):
    """Wrap the engine's prefill with a call counter."""
    calls = []
    inner = eng._prefill
    eng._prefill = lambda *a: (calls.append(1), inner(*a))[1]
    return calls


class TestPrefixCache:
    def test_hit_is_token_identical_and_skips_prefill(self):
        mcfg, ccfg, params, prompts = _setup()
        eng = _engine(params, mcfg, ccfg, prefix_cache_size=8)
        calls = _count_prefills(eng)
        r1 = _go(eng, prompts[0])
        n_first = len(calls)
        assert n_first >= 1
        r2 = _go(eng, prompts[0])
        assert len(calls) == n_first  # no new prefill on the hit
        assert r2.tokens == r1.tokens
        assert eng.prefix_hits == 1 and eng.prefix_misses == 1
        assert r2.prefill_stats == r1.prefill_stats

    def test_matches_uncached_engine(self):
        mcfg, ccfg, params, prompts = _setup(seed=2)
        plain = _engine(params, mcfg, ccfg)
        rids = [plain.submit(p) for p in prompts for _ in range(2)]
        done = plain.run()
        want = {i: done[r].tokens for i, r in enumerate(rids)}
        cached = _engine(params, mcfg, ccfg, prefix_cache_size=8)
        rids2 = [cached.submit(p) for p in prompts for _ in range(2)]
        done2 = cached.run()
        got = {i: done2[r].tokens for i, r in enumerate(rids2)}
        assert got == want
        assert cached.prefix_hits >= 1

    def test_lru_eviction(self):
        mcfg, ccfg, params, prompts = _setup(seed=3)
        eng = _engine(params, mcfg, ccfg, prefix_cache_size=1, num_slots=1)
        a, b = prompts[0], prompts[1]
        ra = _go(eng, a).tokens          # miss, cache=[a]
        _go(eng, b)                      # miss, evicts a
        assert len(eng._prefix_cache) == 1
        ra2 = _go(eng, a).tokens         # miss again (evicted)
        assert ra2 == ra
        assert eng.prefix_hits == 0 and eng.prefix_misses == 3
        ra3 = _go(eng, a).tokens         # now a hit
        assert ra3 == ra and eng.prefix_hits == 1

    def test_mixed_hit_and_miss_in_one_admission(self):
        mcfg, ccfg, params, prompts = _setup(seed=4)
        eng = _engine(params, mcfg, ccfg, prefix_cache_size=8)
        base = _go(eng, prompts[0]).tokens
        # Second round: one hit (prompts[0]) and one miss (prompts[1])
        # admitted in the same step.
        r_hit = eng.submit(prompts[0])
        r_miss = eng.submit(prompts[1])
        done = eng.run()
        assert done[r_hit].tokens == base
        assert len(done[r_miss].tokens) == 10
        assert eng.prefix_hits == 1 and eng.prefix_misses == 2
        s = eng.summary()
        assert s["prefix_cache"]["entries"] == 2

    def test_hit_with_logprobs(self):
        mcfg, ccfg, params, prompts = _setup(seed=5)
        eng = _engine(params, mcfg, ccfg, prefix_cache_size=4, logprobs=True)
        r1 = _go(eng, prompts[0])
        r2 = _go(eng, prompts[0])
        assert r2.tokens == r1.tokens
        np.testing.assert_allclose(r2.logprobs, r1.logprobs, atol=1e-5)

    def test_cache_respects_request_controls(self):
        # Stop sequences and EOS are request-level; a cached admission must
        # still honor them.
        mcfg, ccfg, params, prompts = _setup(seed=6)
        eng = _engine(params, mcfg, ccfg, prefix_cache_size=4)
        full = _go(eng, prompts[0]).tokens
        r = _go(eng, prompts[0], eos_token_id=full[0])
        assert r.tokens == [full[0]] and r.stop_reason == "eos"
        assert eng.prefix_hits == 1
