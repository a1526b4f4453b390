"""int8 x int8 MXU matmul kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                               tiny_test_model)
from realtime_kv_cache_compression_tpu.models import llama
from realtime_kv_cache_compression_tpu.models.quantized_params import (
    quantize_params, quantize_tensor)
from realtime_kv_cache_compression_tpu.ops.pallas.int8_matmul import (
    dynamic_int8_matmul, int8_matmul, int8_matmul_xla, quantize_activations)


def test_kernel_matches_xla_exactly(rng):
    """The Pallas kernel computes the same int32 accumulation + scaling as
    the XLA reference (bit-exact in f32)."""
    m, k, n = 24, 128, 256
    x_q = jnp.asarray(rng.integers(-127, 128, size=(m, k)).astype(np.int8))
    w_q = jnp.asarray(rng.integers(-127, 128, size=(k, n)).astype(np.int8))
    xs = jnp.asarray(rng.random(m).astype(np.float32)) + 0.01
    ws = jnp.asarray(rng.random(n).astype(np.float32)) + 0.01
    ref = int8_matmul_xla(x_q, w_q, xs, ws, out_dtype=jnp.float32)
    out = int8_matmul(x_q, w_q, xs, ws, out_dtype=jnp.float32,
                      block_m=16, block_n=128, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_dynamic_matmul_approximates_dense(rng):
    """Activation + weight int8 quantization stays close to the f32 matmul
    (relative error bounded by the two quantization steps)."""
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    qt = quantize_tensor(w, axis=1)
    ref = x @ w
    out = dynamic_int8_matmul(x, qt.q, qt.scale, interpret=True)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean()
    assert err.mean() / scale < 0.02, (err.mean(), scale)


def test_quantize_activations_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    x_q, s = quantize_activations(x)
    recon = np.asarray(x_q, np.float32) * np.asarray(s)[:, None]
    assert np.abs(recon - np.asarray(x)).max() <= float(s.max()) / 2 + 1e-6


def test_act_quant_model_logits_close(rng):
    """Full model with act_quant int8 matmuls: logits close to the
    weight-only int8 path; generation runs end-to-end."""
    mcfg = tiny_test_model(num_layers=2)
    ccfg = CompressionConfig(num_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), mcfg)
    qp_w = quantize_params(params)                  # weight-only
    qp_a = quantize_params(params, act_quant=True)  # + activation int8
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 64), 0,
                             mcfg.vocab_size)
    lw, _, _ = llama.prefill_compressed(params, ids, mcfg, ccfg,
                                        max_decode_len=4)
    la, _, _ = llama.prefill_compressed(qp_a, ids, mcfg, ccfg,
                                        max_decode_len=4)
    # Same top-k structure: compare normalized logits, loose tolerance
    # (two quantization steps over 2 layers).
    lw_n = np.asarray(lw, np.float32)
    la_n = np.asarray(la, np.float32)
    corr = np.corrcoef(lw_n.ravel(), la_n.ravel())[0, 1]
    assert corr > 0.99, corr

    out, _ = llama.generate(qp_a, ids, mcfg, ccfg, max_new_tokens=4)
    assert out.shape == (1, 4)
