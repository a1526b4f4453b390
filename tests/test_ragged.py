"""Ragged (variable-length, right-padded) prefill correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                               tiny_test_model)
from realtime_kv_cache_compression_tpu.models import llama


def setup():
    cfg = tiny_test_model(num_layers=2)
    ccfg = CompressionConfig(num_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, ccfg, params


def test_ragged_prefill_matches_unpadded():
    cfg, ccfg, params = setup()
    rng = np.random.default_rng(3)
    a = rng.integers(1, 250, size=48)
    b = rng.integers(1, 250, size=32)
    bucket = 64
    padded = np.zeros((2, bucket), np.int32)
    padded[0, :48] = a
    padded[1, :32] = b
    lengths = jnp.asarray([48, 32], jnp.int32)

    logits_r, state_r, stats_r = llama.prefill_compressed(
        params, jnp.asarray(padded), cfg, ccfg, max_decode_len=4,
        lengths=lengths)

    for row, seq in ((0, a), (1, b)):
        logits_1, state_1, stats_1 = llama.prefill_compressed(
            params, jnp.asarray(seq, jnp.int32)[None], cfg, ccfg,
            max_decode_len=4)
        np.testing.assert_allclose(np.asarray(logits_r[row]),
                                   np.asarray(logits_1[0]), atol=2e-4)
        # Same surviving token positions (budget follows true length).
        kept_r = sorted(
            p for t in state_r.caches[0].tiers
            for p, v in zip(np.asarray(t.positions[row]),
                            np.asarray(t.valid[row])) if v)
        kept_1 = sorted(
            p for t in state_1.caches[0].tiers
            for p, v in zip(np.asarray(t.positions[0]),
                            np.asarray(t.valid[0])) if v)
        assert kept_r == kept_1
        # No padding position ever stored.
        assert all(p < len(seq) for p in kept_r)
        np.testing.assert_allclose(
            np.asarray(stats_r[0]["kept_tokens"][row]),
            np.asarray(stats_1[0]["kept_tokens"][0]))

    # Decode positions start at the true lengths.
    assert np.asarray(state_r.position).tolist() == [48, 32]


def test_ragged_decode_matches_unpadded():
    cfg, ccfg, params = setup()
    rng = np.random.default_rng(4)
    seq = rng.integers(1, 250, size=40)
    padded = np.zeros((1, 64), np.int32)
    padded[0, :40] = seq
    _, state_r, _ = llama.prefill_compressed(
        params, jnp.asarray(padded), cfg, ccfg, max_decode_len=4,
        lengths=jnp.asarray([40], jnp.int32))
    _, state_1, _ = llama.prefill_compressed(
        params, jnp.asarray(seq, jnp.int32)[None], cfg, ccfg,
        max_decode_len=4)
    tok = jnp.asarray([9])
    l_r, _ = llama.decode_step(params, tok, state_r, cfg, ccfg)
    l_1, _ = llama.decode_step(params, tok, state_1, cfg, ccfg)
    np.testing.assert_allclose(np.asarray(l_r), np.asarray(l_1), atol=2e-4)


def test_ragged_flash_matches_ragged_dense():
    """Ragged prefill through the Pallas kernel (per-row prompt lengths in
    kernel) == ragged dense path."""
    cfg, ccfg, params = setup()
    rng = np.random.default_rng(6)
    padded = np.zeros((2, 64), np.int32)
    padded[0, :48] = rng.integers(1, 250, size=48)
    padded[1, :32] = rng.integers(1, 250, size=32)
    lengths = jnp.asarray([48, 32], jnp.int32)
    l_d, s_d, st_d = llama.prefill_compressed(
        params, jnp.asarray(padded), cfg, ccfg, max_decode_len=4,
        lengths=lengths, use_flash=False)
    l_f, s_f, st_f = llama.prefill_compressed(
        params, jnp.asarray(padded), cfg, ccfg, max_decode_len=4,
        lengths=lengths, use_flash=True)
    np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_d), atol=5e-4)
    np.testing.assert_allclose(np.asarray(st_f[0]["kept_tokens"]),
                               np.asarray(st_d[0]["kept_tokens"]))
    for t_f, t_d in zip(s_f.caches[0].tiers, s_d.caches[0].tiers):
        np.testing.assert_array_equal(np.asarray(t_f.positions),
                                      np.asarray(t_d.positions))


def test_serving_short_prompts_exact():
    """Short prompts through the engine equal standalone generation on the
    unpadded prompt (the engine pads to its bucket internally)."""
    from realtime_kv_cache_compression_tpu.serving import ServingEngine

    cfg, ccfg, params = setup()
    rng = np.random.default_rng(5)
    p = rng.integers(1, 250, size=40).tolist()
    eng = ServingEngine(params, cfg, ccfg, num_slots=2, context_len=64,
                        max_new_tokens=7, decode_chunk=3)
    rid = eng.submit(p, max_new_tokens=6)
    done = eng.run()
    ref, _ = llama.generate(params, jnp.asarray(p, jnp.int32)[None], cfg,
                            ccfg, max_new_tokens=6)
    assert done[rid].tokens == [int(t) for t in ref[0]]
