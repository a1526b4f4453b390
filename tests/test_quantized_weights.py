"""Weight-only int8 quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                               tiny_test_model)
from realtime_kv_cache_compression_tpu.models import llama
from realtime_kv_cache_compression_tpu.models.quantized_params import (
    QuantizedTensor, params_bytes, quantize_params, quantize_tensor)


def test_quantize_tensor_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    qt = quantize_tensor(w, axis=1)
    assert qt.q.dtype == jnp.int8
    assert qt.scale.shape == (32,)
    err = jnp.abs(qt.dequantize(jnp.float32) - w)
    # max error <= scale/2 per column
    bound = np.asarray(qt.scale)[None, :] / 2 + 1e-6
    assert np.all(np.asarray(err) <= bound)


def test_quantized_tensor_is_pytree():
    qt = quantize_tensor(jnp.ones((8, 4)))
    leaves = jax.tree_util.tree_leaves(qt)
    assert len(leaves) == 2  # q + scale; axis is static metadata


def test_quantize_params_shrinks(rng):
    cfg = tiny_test_model(num_layers=2, dtype="float32")
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params)
    assert params_bytes(qparams) < 0.45 * params_bytes(params)
    assert isinstance(qparams["layers"][0]["wq"], QuantizedTensor)
    assert not isinstance(qparams["layers"][0]["input_norm"],
                          QuantizedTensor)


def test_quantized_forward_close_and_generates(rng):
    cfg = tiny_test_model(num_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 48), 0,
                             cfg.vocab_size)
    lf = llama.forward_logits(params, ids, cfg)
    lq = llama.forward_logits(qparams, ids, cfg)
    # int8 weights: logits correlate strongly with fp weights.
    a, b = np.asarray(lf[0, -1]), np.asarray(lq[0, -1])
    assert np.corrcoef(a, b)[0, 1] > 0.99

    ccfg = CompressionConfig(num_layers=2)
    out, stats = llama.generate(qparams, ids, cfg, ccfg, max_new_tokens=4)
    assert out.shape == (1, 4)
    assert len(stats) == 2


def test_streaming_quantize_equals_batch(rng):
    cfg = tiny_test_model(num_layers=2)
    from realtime_kv_cache_compression_tpu.models.quantized_params import (
        quantize_params_streaming)

    p1 = llama.init_params(jax.random.PRNGKey(0), cfg)
    p2 = llama.init_params(jax.random.PRNGKey(0), cfg)
    q1 = quantize_params(p1)
    q2 = quantize_params_streaming(p2)
    for a, b in zip(jax.tree_util.tree_leaves(q1),
                    jax.tree_util.tree_leaves(q2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The consumed tree's weights were freed.
    assert p2["embed"] is None and p2["layers"][0] is None


def test_quantized_decode_matches_quantized_prefill(rng):
    """Compressed prefill+decode runs end-to-end on quantized params and
    stays consistent with itself."""
    cfg = tiny_test_model(num_layers=2)
    params = quantize_params(llama.init_params(jax.random.PRNGKey(0), cfg))
    ccfg = CompressionConfig(num_layers=2, early_layer_ratio=2.0,
                             middle_layer_ratio=2.0, later_layer_ratio=2.0,
                             theta_h=0.0, theta_m=0.0,
                             high_precision_bits=16, medium_precision_bits=16,
                             low_precision_bits=16, tier_mode="threshold",
                             slot_align=1)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 32), 0,
                             cfg.vocab_size)
    full_ids = jnp.concatenate([ids, jnp.array([[7]])], axis=1)
    logits_pre, _, _ = llama.prefill_compressed(params, full_ids, cfg, ccfg)
    _, state, _ = llama.prefill_compressed(params, ids, cfg, ccfg,
                                           max_decode_len=2)
    logits_dec, _ = llama.decode_step(params, jnp.array([7]), state, cfg,
                                      ccfg)
    np.testing.assert_allclose(np.asarray(logits_dec),
                               np.asarray(logits_pre), atol=2e-4)


# ---------------------------------------------------------------------------
# Fused QKV / gate-up weights (llama.fuse_params)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("quant", ["raw", "int8", "int4"])
def test_fused_params_bitwise_identical_prefill(rng, quant):
    """fuse_params concatenates output columns only — same per-column math
    and quantization scales, so logits match to dot-reassociation
    tolerance (XLA may re-block the reduction for the wider output) and
    greedy decode tokens are identical."""
    from realtime_kv_cache_compression_tpu.models.quantized_params import (
        quantize_params as qp)

    cfg = tiny_test_model(num_layers=2)
    ccfg = CompressionConfig(num_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    if quant == "int8":
        params = qp(params)
    elif quant == "int4":
        params = qp(params, bits=4, group_size=16)
    fused = llama.fuse_params(params)
    assert "wqkv" in fused["layers"][0]
    assert "wq" not in fused["layers"][0]
    assert "w_gateup" in fused["layers"][0]

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0,
                             cfg.vocab_size)
    lg1, st1, _ = llama.prefill_compressed(params, ids, cfg, ccfg,
                                           max_decode_len=8)
    lg2, st2, _ = llama.prefill_compressed(fused, ids, cfg, ccfg,
                                           max_decode_len=8)
    np.testing.assert_allclose(np.asarray(lg1, np.float32),
                               np.asarray(lg2, np.float32),
                               rtol=1e-3, atol=1e-3)
    t1, _ = llama.decode_loop(params, jnp.argmax(lg1, -1), st1, 6, cfg, ccfg)
    t2, _ = llama.decode_loop(fused, jnp.argmax(lg2, -1), st2, 6, cfg, ccfg)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_fused_params_qkv_bias(rng):
    cfg = tiny_test_model(num_layers=2, qkv_bias=True)
    ccfg = CompressionConfig(num_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    fused = llama.fuse_params(params)
    assert "bqkv" in fused["layers"][0]
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 48), 0,
                             cfg.vocab_size)
    lg1, _, _ = llama.prefill_compressed(params, ids, cfg, ccfg)
    lg2, _, _ = llama.prefill_compressed(fused, ids, cfg, ccfg)
    np.testing.assert_allclose(np.asarray(lg1, np.float32),
                               np.asarray(lg2, np.float32),
                               rtol=1e-3, atol=1e-3)
