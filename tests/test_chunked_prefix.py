"""Compressed-prefix chunked prefill (VERDICT r4 item 2).

Later chunks attend over the compressed pools of earlier chunks instead of
a full uncompressed KV buffer — the mechanism by which compression REDUCES
prefill work. Single-chunk mode must match the one-shot compressed prefill;
multi-chunk mode is an approximation whose structure (per-chunk budgets,
global positions, causal validity) is pinned here and whose quality is
measured in experiments/quality_demo.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                               tiny_test_model)
from realtime_kv_cache_compression_tpu.models import llama

MCFG = tiny_test_model(num_layers=3)


def ccfg_for(**kw):
    base = dict(num_layers=3, prompt_frac=0.25)
    base.update(kw)
    return CompressionConfig(**base)


def test_single_chunk_matches_one_shot():
    """chunk_size == S: the chunk attends only over itself (empty pools),
    mass normalization is global — equals prefill_compressed."""
    ccfg = ccfg_for()
    params = llama.init_params(jax.random.PRNGKey(0), MCFG)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0,
                             MCFG.vocab_size)
    lg1, st1, _ = llama.prefill_compressed(params, ids, MCFG, ccfg,
                                           max_decode_len=8)
    lg2, st2, _ = llama.prefill_compressed_prefix_chunked(
        params, ids, MCFG, ccfg, chunk_size=64, max_decode_len=8)
    np.testing.assert_allclose(np.asarray(lg2), np.asarray(lg1),
                               rtol=2e-4, atol=2e-4)
    for l in range(MCFG.num_layers):
        for t1, t2 in zip(st1.caches[l].tiers, st2.caches[l].tiers):
            np.testing.assert_array_equal(np.asarray(t1.valid),
                                          np.asarray(t2.valid))
            for b in range(2):
                np.testing.assert_array_equal(
                    np.sort(np.asarray(t2.positions[b])[np.asarray(t2.valid[b])]),
                    np.sort(np.asarray(t1.positions[b])[np.asarray(t1.valid[b])]))


def test_multi_chunk_structure_and_decode():
    """4 chunks: per-chunk slot ranges hold per-chunk positions, kept
    budget is uniform per chunk, and the final state decodes."""
    ccfg = ccfg_for()
    params = llama.init_params(jax.random.PRNGKey(0), MCFG)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0,
                             MCFG.vocab_size)
    c = 16
    lg, state, stats = llama.prefill_compressed_prefix_chunked(
        params, ids, MCFG, ccfg, chunk_size=c, max_decode_len=8)
    assert lg.shape == (2, MCFG.vocab_size)
    for l in range(MCFG.num_layers):
        kept_total = 0
        for t in state.caches[l].tiers:
            cap_c = t.positions.shape[1] // 4
            pos = np.asarray(t.positions)
            val = np.asarray(t.valid)
            kept_total += val.sum()
            for ci in range(4):
                sl = slice(ci * cap_c, (ci + 1) * cap_c)
                # Valid slots of chunk ci hold positions from chunk ci.
                p = pos[:, sl][val[:, sl]]
                assert ((p >= ci * c) & (p < (ci + 1) * c)).all()
        # Budgeted selection actually dropped tokens.
        assert 0 < kept_total < 2 * 64 * 1.0
        r = float(np.asarray(stats[l]["compression_ratio"]).mean())
        assert 0.2 < r < 0.95
    toks, _ = llama.decode_loop(params, jnp.argmax(lg, -1), state, 6, MCFG,
                                ccfg)
    assert toks.shape == (2, 6)
    # Fused-kernel decode path over the chunk-packed cache agrees.
    toks_f, _ = llama.decode_loop(params, jnp.argmax(lg, -1), state, 6,
                                  MCFG, ccfg, use_fused=True)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks_f))


def test_multi_chunk_quant_only_close_to_full_buffer():
    """With retention 1.0 (quantization only — no token dropping) the
    compressed-prefix approximation reduces to "later chunks see the 8/4/2
    quantized prefix": logits must track the full-buffer chunked path
    closely even on a random tiny model. (Token-dropping arms are measured
    on TRAINED models in experiments/quality_demo.py — on random weights
    dropping scrambles logits by construction.)"""
    ccfg = ccfg_for(early_layer_ratio=1.0, middle_layer_ratio=1.0,
                    later_layer_ratio=1.0, high_precision_bits=8,
                    medium_precision_bits=8, low_precision_bits=8)
    params = llama.init_params(jax.random.PRNGKey(0), MCFG)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 64), 0,
                             MCFG.vocab_size)
    lg_full, st_full, _ = llama.prefill_compressed_chunked(
        params, ids, MCFG, ccfg, chunk_size=16, max_decode_len=8)
    lg_pref, st_pref, _ = llama.prefill_compressed_prefix_chunked(
        params, ids, MCFG, ccfg, chunk_size=16, max_decode_len=8)
    a = np.asarray(lg_full[0], np.float32)
    b = np.asarray(lg_pref[0], np.float32)
    assert np.corrcoef(a, b)[0, 1] > 0.99


def test_query_guided_rejected():
    ccfg = ccfg_for(importance_source="query")
    with pytest.raises(ValueError):
        llama.prefill_chunked_compressed_init(1, 64, 16, MCFG, ccfg)


def test_flash_step_matches_dense():
    """use_flash=True (positioned flash + pair merge, interpret mode) ==
    dense positioned attention path: same logits and same caches."""
    ccfg = ccfg_for()
    params = llama.init_params(jax.random.PRNGKey(0), MCFG)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0,
                             MCFG.vocab_size)
    lg_d, st_d, _ = llama.prefill_compressed_prefix_chunked(
        params, ids, MCFG, ccfg, chunk_size=16, max_decode_len=8,
        use_flash=False)
    lg_f, st_f, _ = llama.prefill_compressed_prefix_chunked(
        params, ids, MCFG, ccfg, chunk_size=16, max_decode_len=8,
        use_flash=True)
    np.testing.assert_allclose(np.asarray(lg_f, np.float32),
                               np.asarray(lg_d, np.float32),
                               rtol=2e-2, atol=2e-2)
    for l in range(MCFG.num_layers):
        for td, tf in zip(st_d.caches[l].tiers, st_f.caches[l].tiers):
            np.testing.assert_array_equal(np.asarray(td.valid),
                                          np.asarray(tf.valid))
            for b in range(2):
                np.testing.assert_array_equal(
                    np.sort(np.asarray(tf.positions[b])[np.asarray(tf.valid[b])]),
                    np.sort(np.asarray(td.positions[b])[np.asarray(td.valid[b])]))
