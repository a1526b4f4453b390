"""Sampling (temperature / top-k / top-p / min-p) unit + integration tests.

Counterpart of the HF GenerationConfig sampling surface the reference used
through `model.generate` (longbench_eval.py:131-139)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import realtime_kv_cache_compression_tpu as rtc
from realtime_kv_cache_compression_tpu.models import llama
from realtime_kv_cache_compression_tpu.ops.sampling import (
    GREEDY, SamplingParams, apply_min_p, apply_penalties, apply_top_k,
    apply_top_p, init_counts, sample_logits, update_counts)


def _logits(rows):
    return jnp.asarray(rows, jnp.float32)


class TestFilters:
    def test_top_k_masks_all_but_k(self):
        x = _logits([[1.0, 5.0, 3.0, 2.0, 4.0]])
        y = apply_top_k(x, 2)
        kept = np.where(np.asarray(y[0]) > -1e29)[0]
        assert set(kept) == {1, 4}  # the two largest

    def test_top_k_disabled(self):
        x = _logits([[1.0, 2.0, 3.0]])
        assert jnp.array_equal(apply_top_k(x, 0), x)
        assert jnp.array_equal(apply_top_k(x, 3), x)

    def test_top_p_keeps_crossing_token(self):
        # probs = [0.5, 0.3, 0.2]; top_p=0.6 keeps 0.5 and the crossing 0.3.
        p = np.array([0.5, 0.3, 0.2])
        x = _logits([np.log(p)])
        y = np.asarray(apply_top_p(x, 0.6)[0])
        kept = np.where(y > -1e29)[0]
        assert set(kept) == {0, 1}

    def test_top_p_always_keeps_argmax(self):
        x = _logits([[10.0, 0.0, -5.0]])
        y = np.asarray(apply_top_p(x, 1e-6)[0])
        kept = np.where(y > -1e29)[0]
        assert set(kept) == {0}

    def test_top_p_off(self):
        x = _logits([[1.0, 2.0, 3.0]])
        assert jnp.array_equal(apply_top_p(x, 1.0), x)

    def test_min_p_relative_threshold(self):
        # p_max = 0.5; min_p=0.3 -> threshold 0.15 keeps 0.5, 0.3, 0.2.
        p = np.array([0.5, 0.3, 0.2, 0.0001])
        x = _logits([np.log(p)])
        y = np.asarray(apply_min_p(x, 0.3)[0])
        kept = np.where(y > -1e29)[0]
        assert set(kept) == {0, 1, 2}

    def test_batch_rows_independent(self):
        x = _logits([[5.0, 1.0, 0.0], [0.0, 1.0, 5.0]])
        y = np.asarray(apply_top_k(x, 1))
        assert y[0, 0] > -1e29 and y[0, 1] < -1e29
        assert y[1, 2] > -1e29 and y[1, 0] < -1e29


class TestSampleLogits:
    def test_greedy_is_argmax(self):
        x = _logits([[0.1, 9.0, 3.0], [4.0, 1.0, 2.0]])
        out = sample_logits(x, None, GREEDY)
        assert out.tolist() == [1, 0]

    def test_sampling_requires_key(self):
        with pytest.raises(ValueError):
            sample_logits(_logits([[0.0, 1.0]]), None,
                          SamplingParams(temperature=1.0))

    def test_top_k1_equals_greedy(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 64))
        out = sample_logits(x, jax.random.PRNGKey(1),
                            SamplingParams(temperature=1.0, top_k=1))
        assert jnp.array_equal(out, jnp.argmax(x, axis=-1))

    def test_samples_stay_inside_top_k(self):
        x = _logits([[5.0, 4.0, -1.0, -1.0, -1.0]])
        params = SamplingParams(temperature=2.0, top_k=2)
        for i in range(20):
            tok = int(sample_logits(x, jax.random.PRNGKey(i), params)[0])
            assert tok in (0, 1)

    def test_samples_stay_inside_nucleus(self):
        p = np.array([0.6, 0.3, 0.05, 0.05])
        x = _logits([np.log(p)])
        params = SamplingParams(temperature=1.0, top_p=0.7)
        for i in range(20):
            tok = int(sample_logits(x, jax.random.PRNGKey(i), params)[0])
            assert tok in (0, 1)

    def test_distribution_roughly_matches(self):
        # With no filtering, frequencies should track softmax probabilities.
        x = _logits([np.log([0.7, 0.2, 0.1])])
        params = SamplingParams(temperature=1.0)
        keys = jax.random.split(jax.random.PRNGKey(42), 600)
        toks = jax.vmap(lambda k: sample_logits(x, k, params)[0])(keys)
        freq0 = float((toks == 0).mean())
        assert 0.6 < freq0 < 0.8

    def test_jit_safe(self):
        params = SamplingParams(temperature=0.8, top_k=8, top_p=0.9,
                                min_p=0.02)
        f = jax.jit(lambda x, k: sample_logits(x, k, params))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 128))
        out = f(x, jax.random.PRNGKey(1))
        assert out.shape == (2,)


class TestPenalties:
    def test_update_and_init_counts(self):
        c = init_counts(2, 4, jnp.asarray([1, 3]))
        c = update_counts(c, jnp.asarray([1, 0]))
        assert c.tolist() == [[0, 2, 0, 0], [1, 0, 0, 1]]

    def test_repetition_penalty_positive_and_negative_logits(self):
        # HF semantics: positive logits divided by r, negative multiplied.
        x = _logits([[2.0, -2.0, 1.0]])
        counts = jnp.asarray([[1, 1, 0]], jnp.int32)
        y = np.asarray(apply_penalties(
            x, counts, SamplingParams(repetition_penalty=2.0))[0])
        assert np.allclose(y, [1.0, -4.0, 1.0])

    def test_presence_and_frequency(self):
        x = _logits([[1.0, 1.0, 1.0]])
        counts = jnp.asarray([[0, 1, 3]], jnp.int32)
        y = np.asarray(apply_penalties(
            x, counts, SamplingParams(presence_penalty=0.5,
                                      frequency_penalty=0.25))[0])
        assert np.allclose(y, [1.0, 1.0 - 0.5 - 0.25, 1.0 - 0.5 - 0.75])

    def test_greedy_respects_penalties(self):
        # Token 0 barely preferred; once seen, a big penalty flips greedy
        # to token 1 (penalties run before argmax, as in HF).
        x = _logits([[1.0, 0.9]])
        counts = jnp.asarray([[1, 0]], jnp.int32)
        params = SamplingParams(presence_penalty=5.0)
        assert int(sample_logits(x, None, params, counts)[0]) == 1
        assert int(sample_logits(x, None, params)[0]) == 0  # no counts

    def test_decode_loop_presence_penalty_avoids_repeats(self):
        mcfg = rtc.tiny_test_model()
        ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers)
        params = llama.init_params(jax.random.PRNGKey(0), mcfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0,
                                 mcfg.vocab_size)
        logits, state, _ = llama.prefill_compressed(params, ids, mcfg, ccfg,
                                                    max_decode_len=12)
        tok = jnp.argmax(logits, axis=-1)
        # A huge presence penalty forces every generated token to be new
        # (greedy mode, so the only randomness is the penalty itself).
        sp = SamplingParams(presence_penalty=1e9)
        toks, _, counts = llama.decode_loop(
            params, tok, state, 11, mcfg, ccfg, use_fused=False,
            sampling=sp, return_counts=True)
        for row in range(2):
            seq = [int(tok[row])] + [int(t) for t in toks[row]]
            assert len(set(seq)) == len(seq)  # all distinct
        # Counts account for first_token + 11 generated tokens per row.
        assert counts.sum(axis=-1).tolist() == [12, 12]

    def test_serving_counts_persist_across_chunks(self):
        from realtime_kv_cache_compression_tpu.serving.engine import (
            ServingEngine)
        mcfg = rtc.tiny_test_model()
        ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers)
        params = llama.init_params(jax.random.PRNGKey(0), mcfg)
        rng = np.random.RandomState(3)
        prompts = [rng.randint(0, mcfg.vocab_size, size=n).tolist()
                   for n in (48, 64, 56)]
        eng = ServingEngine(params, mcfg, ccfg, num_slots=2, context_len=64,
                            max_new_tokens=12, decode_chunk=4,
                            sampling=SamplingParams(presence_penalty=1e9))
        for p in prompts:
            eng.submit(p)
        done = eng.run()
        assert len(done) == 3
        for r in done.values():
            # No repeats even though generation spans 3 decode chunks —
            # proves the occurrence counts persist across chunk calls.
            assert len(set(r.tokens)) == len(r.tokens)


class TestGenerateIntegration:
    def _setup(self):
        mcfg = rtc.tiny_test_model()
        ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers)
        params = llama.init_params(jax.random.PRNGKey(0), mcfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0,
                                 mcfg.vocab_size)
        return mcfg, ccfg, params, ids

    def test_generate_with_filters_runs_and_differs_by_seed(self):
        mcfg, ccfg, params, ids = self._setup()
        sp = SamplingParams(temperature=1.0, top_k=16, top_p=0.95)
        out1, _ = llama.generate(params, ids, mcfg, ccfg, max_new_tokens=8,
                                 sampling=sp, rng=jax.random.PRNGKey(1))
        out2, _ = llama.generate(params, ids, mcfg, ccfg, max_new_tokens=8,
                                 sampling=sp, rng=jax.random.PRNGKey(2))
        assert out1.shape == (2, 8)
        assert not jnp.array_equal(out1, out2)  # seeds differ

    def test_generate_default_stays_greedy(self):
        mcfg, ccfg, params, ids = self._setup()
        out1, _ = llama.generate(params, ids, mcfg, ccfg, max_new_tokens=8)
        out2, _ = llama.generate(params, ids, mcfg, ccfg, max_new_tokens=8)
        assert jnp.array_equal(out1, out2)

    def test_decode_loop_top_k1_matches_greedy(self):
        mcfg, ccfg, params, ids = self._setup()
        logits, state, _ = llama.prefill_compressed(params, ids, mcfg, ccfg,
                                                    max_decode_len=8)
        tok = jnp.argmax(logits, axis=-1)
        greedy, _ = llama.decode_loop(params, tok, state, 7, mcfg, ccfg,
                                      use_fused=False)
        topk1, _ = llama.decode_loop(
            params, tok, state, 7, mcfg, ccfg, use_fused=False,
            rng=jax.random.PRNGKey(0),
            sampling=SamplingParams(temperature=1.0, top_k=1))
        assert jnp.array_equal(greedy, topk1)
