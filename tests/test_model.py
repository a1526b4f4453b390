"""Model-level tests: tiny Llama prefill/decode on CPU, compressed vs
uncompressed golden checks (the reference's test_functionality.py smoke role,
but synthetic-weights and CI-runnable).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                               tiny_test_model)
from realtime_kv_cache_compression_tpu.models import llama


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_model()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 48), 0,
                             cfg.vocab_size)
    return cfg, params, ids


def ccfg_for(cfg, **kw):
    base = dict(num_layers=cfg.num_layers, high_precision_bits=8,
                medium_precision_bits=4, low_precision_bits=2)
    base.update(kw)
    return CompressionConfig(**base)


def test_prefill_logits_match_uncompressed(setup):
    """With recompute off, compression must not alter prefill outputs."""
    cfg, params, ids = setup
    ccfg = ccfg_for(cfg)
    logits_c, state, stats = llama.prefill_compressed(params, ids, cfg, ccfg)
    logits_u, _ = llama.prefill_uncompressed(params, ids, cfg)
    np.testing.assert_allclose(np.asarray(logits_c), np.asarray(logits_u),
                               atol=1e-5)
    assert len(stats) == cfg.num_layers
    assert len(state.caches) == cfg.num_layers


def test_decode_consistency_uncompressed(setup):
    """decode_step over the dense cache == prefill of the longer sequence."""
    cfg, params, ids = setup
    s = ids.shape[1]
    logits_full, _ = llama.prefill_uncompressed(params, ids, cfg)
    logits_pre, (ks, vs) = llama.prefill_uncompressed(params, ids[:, :-1],
                                                      cfg)
    # Pad cache to s slots.
    pad = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, 1), (0, 0), (0, 0)))
    pos = jnp.full((2,), s - 1, jnp.int32)
    logits_step, _, _ = llama.decode_step_uncompressed(
        params, ids[:, -1], (pad(ks), pad(vs)), pos, cfg, s)
    np.testing.assert_allclose(np.asarray(logits_step),
                               np.asarray(logits_full), atol=2e-4)


def test_lossless_config_decode_matches_exact(setup):
    """Budget >= full cost at 16-bit: every token kept raw → compressed
    decode equals uncompressed decode."""
    cfg, params, ids = setup
    ccfg = ccfg_for(cfg, theta_h=0.0, theta_m=0.0,
                    high_precision_bits=16, medium_precision_bits=16,
                    low_precision_bits=16, tier_mode="threshold",
                    early_layer_ratio=2.0, middle_layer_ratio=2.0,
                    later_layer_ratio=2.0, slot_align=1)
    _, state, stats = llama.prefill_compressed(params, ids, cfg, ccfg,
                                               max_decode_len=4)
    # Everything kept.
    for st in stats:
        assert np.asarray(st["kept_tokens"]).min() == ids.shape[1]
    next_tok = jnp.array([5, 7])
    logits_c, _ = llama.decode_step(params, next_tok, state, cfg, ccfg)

    _, (ks, vs) = llama.prefill_uncompressed(params, ids, cfg)
    pad = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, 4), (0, 0), (0, 0)))
    pos = jnp.full((2,), ids.shape[1], jnp.int32)
    logits_u, _, _ = llama.decode_step_uncompressed(
        params, next_tok, (pad(ks), pad(vs)), pos, cfg, ids.shape[1] + 4)
    np.testing.assert_allclose(np.asarray(logits_c), np.asarray(logits_u),
                               atol=2e-4)


def test_compressed_decode_close_at_moderate_compression(setup):
    """8/4-bit, 80% retention: decode logits stay close to exact; top-1
    agrees for most positions."""
    cfg, params, ids = setup
    ccfg = ccfg_for(cfg, early_layer_ratio=0.9, middle_layer_ratio=0.8,
                    later_layer_ratio=0.7, high_precision_bits=8,
                    medium_precision_bits=8, low_precision_bits=4)
    _, state, _ = llama.prefill_compressed(params, ids, cfg, ccfg,
                                           max_decode_len=4)
    next_tok = jnp.array([5, 7])
    logits_c, state2 = llama.decode_step(params, next_tok, state, cfg, ccfg)

    _, (ks, vs) = llama.prefill_uncompressed(params, ids, cfg)
    pad = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, 4), (0, 0), (0, 0)))
    pos = jnp.full((2,), ids.shape[1], jnp.int32)
    logits_u, _, _ = llama.decode_step_uncompressed(
        params, next_tok, (pad(ks), pad(vs)), pos, cfg, ids.shape[1] + 4)
    lc, lu = np.asarray(logits_c), np.asarray(logits_u)
    assert np.isfinite(lc).all()
    # Correlation of logits stays meaningful under compression. (Random
    # weights give near-uniform attention, the worst case for importance
    # scoring — real checkpoints correlate far higher; quality is measured
    # properly by the LongBench evaluator.)
    for b in range(2):
        r = np.corrcoef(lc[b], lu[b])[0, 1]
        assert r > 0.6, r
    # Multi-step decode keeps positions advancing.
    assert np.asarray(state2.position).tolist() == [49, 49]


def test_recompute_mode_runs(setup):
    cfg, params, ids = setup
    ccfg = ccfg_for(cfg, recompute_prefill_attention=True)
    logits, state, _ = llama.prefill_compressed(params, ids, cfg, ccfg)
    assert np.isfinite(np.asarray(logits)).all()


def test_generate_smoke(setup):
    cfg, params, ids = setup
    ccfg = ccfg_for(cfg)
    out, stats = llama.generate(params, ids, cfg, ccfg, max_new_tokens=6)
    assert out.shape == (2, 6)
    assert len(stats) == cfg.num_layers
    # Deterministic greedy: same call → same tokens.
    out2, _ = llama.generate(params, ids, cfg, ccfg, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_generate_sampling(setup):
    cfg, params, ids = setup
    ccfg = ccfg_for(cfg)
    s1, _ = llama.generate(params, ids, cfg, ccfg, max_new_tokens=6,
                           temperature=1.0, rng=jax.random.PRNGKey(1))
    s1b, _ = llama.generate(params, ids, cfg, ccfg, max_new_tokens=6,
                            temperature=1.0, rng=jax.random.PRNGKey(1))
    s2, _ = llama.generate(params, ids, cfg, ccfg, max_new_tokens=6,
                           temperature=1.0, rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s1b))
    assert not np.array_equal(np.asarray(s1), np.asarray(s2))
    assert np.asarray(s1).shape == (2, 6)
