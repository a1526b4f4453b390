"""Chunked prefill tests: model-level equivalence + serving interleaving.

vLLM-style chunked prefill (no reference counterpart — the reference
prefills whole prompts through HF generate): the prompt advances
`prefill_chunk` tokens per engine step so active slots' decode latency is
bounded by a chunk, not a full prefill. Compression is unchanged — it runs
once over the complete K/V + prompt mass at finish, so caches and tokens
must match the one-shot prefill.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                               tiny_test_model)
from realtime_kv_cache_compression_tpu.models import llama
from realtime_kv_cache_compression_tpu.serving import ServingEngine


@pytest.fixture(scope="module")
def parts():
    mcfg = tiny_test_model(num_layers=3)
    ccfg = CompressionConfig(num_layers=3)
    params = llama.init_params(jax.random.PRNGKey(0), mcfg)
    return params, mcfg, ccfg


class TestModelLevel:
    def test_matches_one_shot_prefill(self, parts):
        params, mcfg, ccfg = parts
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 96), 0,
                                 mcfg.vocab_size)
        lengths = jnp.asarray([96, 70], jnp.int32)
        lo1, st1, stats1 = llama.prefill_compressed(
            params, ids, mcfg, ccfg, max_decode_len=8, lengths=lengths)
        lo2, st2, stats2 = llama.prefill_compressed_chunked(
            params, ids, mcfg, ccfg, chunk_size=32, max_decode_len=8,
            lengths=lengths)
        np.testing.assert_allclose(np.asarray(lo2), np.asarray(lo1),
                                   atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(st1.caches),
                        jax.tree_util.tree_leaves(st2.caches)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=2e-3)
        np.testing.assert_array_equal(np.asarray(st1.position),
                                      np.asarray(st2.position))

    def test_greedy_decode_token_identical(self, parts):
        params, mcfg, ccfg = parts
        ids = jax.random.randint(jax.random.PRNGKey(2), (1, 64), 0,
                                 mcfg.vocab_size)
        lo1, st1, _ = llama.prefill_compressed(params, ids, mcfg, ccfg,
                                               max_decode_len=8)
        lo2, st2, _ = llama.prefill_compressed_chunked(
            params, ids, mcfg, ccfg, chunk_size=16, max_decode_len=8)
        o1, _ = llama.decode_loop(params, jnp.argmax(lo1, -1), st1, 7,
                                  mcfg, ccfg, use_fused=False)
        o2, _ = llama.decode_loop(params, jnp.argmax(lo2, -1), st2, 7,
                                  mcfg, ccfg, use_fused=False)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_single_chunk_degenerate(self, parts):
        params, mcfg, ccfg = parts
        ids = jax.random.randint(jax.random.PRNGKey(3), (1, 48), 0,
                                 mcfg.vocab_size)
        lo1, _, _ = llama.prefill_compressed(params, ids, mcfg, ccfg,
                                             max_decode_len=4)
        lo2, _, _ = llama.prefill_compressed_chunked(
            params, ids, mcfg, ccfg, chunk_size=48, max_decode_len=4)
        np.testing.assert_allclose(np.asarray(lo2), np.asarray(lo1),
                                   atol=1e-4)

    def test_rejects_nondivisible_chunk(self, parts):
        params, mcfg, ccfg = parts
        ids = jnp.zeros((1, 50), jnp.int32)
        with pytest.raises(ValueError):
            llama.prefill_compressed_chunked(params, ids, mcfg, ccfg,
                                             chunk_size=16)


def _prompt(seed, n=64):
    rng = np.random.default_rng(seed)
    return rng.integers(1, 250, size=n).tolist()


class TestEngine:
    def _run(self, parts, **kw):
        params, mcfg, ccfg = parts
        eng = ServingEngine(params, mcfg, ccfg, num_slots=2, context_len=64,
                            max_new_tokens=9, decode_chunk=4, **kw)
        rids = [eng.submit(_prompt(i, 40 + 8 * i), max_new_tokens=7)
                for i in range(4)]
        done = eng.run()
        assert sorted(done) == sorted(rids)
        return {r: done[r].tokens for r in rids}

    def test_token_identical_to_unchunked(self, parts):
        want = self._run(parts)
        got = self._run(parts, prefill_chunk=16)
        assert got == want

    def test_sync_admission_mode(self, parts):
        want = self._run(parts)
        got = self._run(parts, prefill_chunk=16, async_admission=False)
        assert got == want

    def test_rejects_bad_chunk(self, parts):
        params, mcfg, ccfg = parts
        with pytest.raises(ValueError):
            ServingEngine(params, mcfg, ccfg, context_len=64,
                          prefill_chunk=24)

    def test_decode_interleaves_with_chunked_admission(self, parts):
        """While a new prompt is mid-chunked-prefill, the already-active
        slot must keep producing tokens (head-of-line blocking bounded by
        one chunk, not the whole prompt)."""
        params, mcfg, ccfg = parts
        eng = ServingEngine(params, mcfg, ccfg, num_slots=2, context_len=64,
                            max_new_tokens=33, decode_chunk=2,
                            prefill_chunk=8)
        r1 = eng.submit(_prompt(0), max_new_tokens=32)
        # Admit + activate r1 (no other work yet → chunks drain eagerly).
        while not any(eng._active_mask):
            eng.step()
        tokens_before = len(eng.completed.get(r1, eng._slots[0]
                                              or eng._slots[1]).tokens)
        r2 = eng.submit(_prompt(1), max_new_tokens=4)
        eng.step()  # admits r2 (one chunk) AND decodes r1
        req1 = next(r for r in eng._slots if r is not None and r.rid == r1)
        assert len(req1.tokens) > tokens_before  # r1 progressed
        assert eng._chunked, "r2 should still be mid-prefill"
        done = eng.run()
        assert sorted(done) == [r1, r2]


class TestFlashChunkAttention:
    """Rectangular flash chunk attention (round 4): the dense chunk
    attention materializes [B,Hkv,rep,c,S] f32 scores — 68 GB at c=16K,
    S=32K, the r4-sitting OOM. The flash form must match it exactly
    (interpret mode here; the traced q_offset makes one program serve all
    chunks)."""

    def test_matches_dense_chunk_attention(self):
        from realtime_kv_cache_compression_tpu.ops.attention import (
            chunk_attention_with_prompt_mass)
        from realtime_kv_cache_compression_tpu.ops.pallas.flash_prefill import (
            flash_chunk_attention_with_prompt_mass)
        b, s, hq, hkv, d, c = 2, 64, 4, 2, 32, 16
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        k_buf = jax.random.normal(kk, (b, s, hkv, d), jnp.float32)
        v_buf = jax.random.normal(kv, (b, s, hkv, d), jnp.float32)
        plens = jnp.asarray([12, 9], jnp.int32)
        for off in (0, 16, 48):
            q = jax.random.normal(jax.random.fold_in(kq, off),
                                  (b, c, hq, d), jnp.float32)
            o1, m1 = chunk_attention_with_prompt_mass(
                q, k_buf, v_buf, jnp.int32(off), 12, prompt_lens=plens)
            o2, m2 = flash_chunk_attention_with_prompt_mass(
                q, k_buf, v_buf, jnp.int32(off), 12, prompt_lens=plens,
                interpret=True)
            np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                                       atol=2e-5, rtol=1e-4)
            np.testing.assert_allclose(np.asarray(m2), np.asarray(m1),
                                       atol=2e-5, rtol=1e-4)

    def test_one_program_serves_all_offsets(self):
        """q_offset must be traced: jit once, run at several offsets."""
        from realtime_kv_cache_compression_tpu.ops.attention import (
            chunk_attention_with_prompt_mass)
        from realtime_kv_cache_compression_tpu.ops.pallas.flash_prefill import (
            flash_chunk_attention_with_prompt_mass)
        b, s, hq, hkv, d, c = 1, 64, 2, 1, 16, 16
        key = jax.random.PRNGKey(3)
        q = jax.random.normal(key, (b, c, hq, d), jnp.float32)
        k_buf = jax.random.normal(key, (b, s, hkv, d), jnp.float32)
        v_buf = k_buf * 0.5
        fn = jax.jit(lambda q, o: flash_chunk_attention_with_prompt_mass(
            q, k_buf, v_buf, o, 8, interpret=True))
        for off in (0, 32):
            o2, m2 = fn(q, jnp.int32(off))
            o1, m1 = chunk_attention_with_prompt_mass(
                q, k_buf, v_buf, jnp.int32(off), 8)
            np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                                       atol=2e-5, rtol=1e-4)
            np.testing.assert_allclose(np.asarray(m2), np.asarray(m1),
                                       atol=2e-5, rtol=1e-4)

    def test_chunked_prefill_flash_matches_one_shot(self, parts):
        params, mcfg, ccfg = parts
        ids = jax.random.randint(jax.random.PRNGKey(7), (2, 96), 0,
                                 mcfg.vocab_size)
        lengths = jnp.asarray([96, 70], jnp.int32)
        lo1, st1, _ = llama.prefill_compressed(
            params, ids, mcfg, ccfg, max_decode_len=8, lengths=lengths)
        lo2, st2, _ = llama.prefill_compressed_chunked(
            params, ids, mcfg, ccfg, chunk_size=32, max_decode_len=8,
            lengths=lengths, use_flash=True)
        np.testing.assert_allclose(np.asarray(lo2), np.asarray(lo1),
                                   atol=1e-3)
        for a, b in zip(jax.tree_util.tree_leaves(st1.caches),
                        jax.tree_util.tree_leaves(st2.caches)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=4e-3)


class TestAutoChunk:
    """prefill_chunk="auto" (round-4): chunk ONLY where chunking wins —
    the r3 sitting measured chunking worsening HOL at 4K/TinyLlama
    (163 -> 262 ms max gap) while a 32K prefill (~2.4 s) monopolizes the
    device without it."""

    def test_short_context_resolves_unchunked(self):
        from realtime_kv_cache_compression_tpu.serving.engine import (
            resolve_prefill_chunk)
        mcfg = tiny_test_model(num_layers=2)
        params = llama.init_params(jax.random.PRNGKey(0), mcfg)
        assert resolve_prefill_chunk(params, mcfg, 4096) is None

    def test_estimator_matches_measured_order(self):
        """TinyLlama 4K measured ~0.163 s (RESULTS.md chunked_hol):
        the analytic estimate must land within 3x."""
        import dataclasses

        import realtime_kv_cache_compression_tpu as rtc
        from realtime_kv_cache_compression_tpu.serving.engine import (
            estimate_prefill_seconds)

        # Estimate from the architecture's true weight count without
        # materializing 1.1B params: use jax.eval_shape.
        mcfg = dataclasses.replace(rtc.TINYLLAMA_1_1B,
                                   max_position_embeddings=4096)
        shapes = jax.eval_shape(
            lambda: llama.init_params(jax.random.PRNGKey(0), mcfg))
        est = estimate_prefill_seconds(shapes, mcfg, 4096)
        assert 0.163 / 3 < est < 0.163 * 3, est
        est32 = estimate_prefill_seconds(shapes, mcfg, 32768)
        assert est32 > 0.5, est32  # 32K resolves to chunked

    def test_engine_accepts_auto(self, parts):
        params, mcfg, ccfg = parts
        eng = ServingEngine(params, mcfg, ccfg, num_slots=2,
                            context_len=64, max_new_tokens=4,
                            prefill_chunk="auto")
        assert eng.prefill_chunk is None  # tiny model, tiny context
        rid = eng.submit([5, 6, 7] * 8, max_new_tokens=3)
        eng.run()
        assert len(eng.completed[rid].tokens) == 3
