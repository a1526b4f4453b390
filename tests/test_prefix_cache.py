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


class TestLongestPrefixContinuation:
    """register_prefix + partial hits: a prompt that EXTENDS a registered
    prefix reuses its compressed pools and prefills only the suffix
    (speculative.extend_prefill) — VERDICT r2 stretch #9."""

    def test_partial_hit_token_identity_with_direct_continuation(self):
        import jax.numpy as jnp

        from realtime_kv_cache_compression_tpu.models import speculative

        mcfg, ccfg, params, _ = _setup(seed=7)
        rng = np.random.RandomState(11)
        sys_prompt = rng.randint(1, mcfg.vocab_size, size=40).tolist()
        question = rng.randint(1, mcfg.vocab_size, size=12).tolist()
        budget, max_new = 16, 10

        eng = _engine(params, mcfg, ccfg, prefix_continue_budget=budget)
        calls = _count_prefills(eng)
        eng.register_prefix(sys_prompt)
        n_reg = len(calls)
        assert n_reg == 1
        out = _go(eng, sys_prompt + question)
        assert eng.prefix_partial_hits == 1
        assert len(calls) == n_reg  # suffix ran via extend_prefill only
        assert out.prefill_stats["prefix_partial"] is True
        assert out.prefill_stats["suffix_tokens"] == len(question)

        # Direct continuation path: prefill the prefix at the SAME bucket,
        # extend with the suffix, decode greedily — token-identical.
        ids, length = eng._bucket_ids(sys_prompt)
        logits0, state0, _ = llama.prefill_compressed(
            params, jnp.asarray([ids], jnp.int32), mcfg, ccfg,
            max_decode_len=max_new + budget,
            lengths=jnp.asarray([length], jnp.int32))
        pad = 16 - len(question)  # engine buckets the suffix to pow2
        suf = jnp.asarray([question + [0] * pad], jnp.int32)
        last, state1 = speculative.extend_prefill(
            params, state0, suf, jnp.asarray([len(question)], jnp.int32),
            mcfg, ccfg)
        tok0 = jnp.argmax(last, axis=-1)
        rest, _ = llama.decode_loop(params, tok0, state1, max_new - 1,
                                    mcfg, ccfg)
        expect = [int(tok0[0])] + [int(t) for t in rest[0]]
        assert out.tokens == expect

    def test_longest_of_multiple_registered_wins(self):
        mcfg, ccfg, params, _ = _setup(seed=8)
        rng = np.random.RandomState(12)
        p_short = rng.randint(1, mcfg.vocab_size, size=20).tolist()
        p_long = p_short + rng.randint(1, mcfg.vocab_size, size=12).tolist()
        q = rng.randint(1, mcfg.vocab_size, size=8).tolist()
        eng = _engine(params, mcfg, ccfg, prefix_continue_budget=16)
        eng.register_prefix(p_short)
        eng.register_prefix(p_long)
        out = _go(eng, p_long + q)
        assert eng.prefix_partial_hits == 1
        assert out.prefill_stats["suffix_tokens"] == len(q)  # vs p_long

    def test_exact_registered_prompt_is_exact_hit(self):
        mcfg, ccfg, params, _ = _setup(seed=9)
        rng = np.random.RandomState(13)
        p = rng.randint(1, mcfg.vocab_size, size=30).tolist()
        eng = _engine(params, mcfg, ccfg, prefix_continue_budget=16)
        eng.register_prefix(p)
        out = _go(eng, p)
        assert eng.prefix_hits == 1 and eng.prefix_partial_hits == 0
        assert len(out.tokens) == 10

    def test_over_budget_suffix_falls_back_to_full_prefill(self):
        mcfg, ccfg, params, _ = _setup(seed=10)
        rng = np.random.RandomState(14)
        p = rng.randint(1, mcfg.vocab_size, size=20).tolist()
        q = rng.randint(1, mcfg.vocab_size, size=24).tolist()  # > budget
        eng = _engine(params, mcfg, ccfg, prefix_continue_budget=16)
        calls = _count_prefills(eng)
        eng.register_prefix(p)
        out = _go(eng, p + q)
        assert eng.prefix_partial_hits == 0
        assert len(calls) == 2  # registration + the full fallback prefill
        assert len(out.tokens) == 10

    def test_register_requires_budget(self):
        import pytest

        mcfg, ccfg, params, _ = _setup(seed=11)
        eng = _engine(params, mcfg, ccfg)
        with pytest.raises(ValueError):
            eng.register_prefix([1, 2, 3])
