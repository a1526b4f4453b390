"""Quantization unit tests: precision assignment, real bit-packing
round-trips, quantization error bounds, memory accounting.

Covers the reference's test_quantization.py surface (label counts/ratios,
finite quantized output, memory-savings bounds) and adds what it lacked
(SURVEY.md §4): numerical round-trip bounds per tier and physical pack/unpack
round-trips — possible here because storage is real, not fake-quant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_kv_cache_compression_tpu import (HIGH, LOW, MID,
                                               CompressionConfig)
from realtime_kv_cache_compression_tpu.ops import quantization as q


@pytest.fixture
def cfg():
    # Reference tests pin 8/4/2 bits (tests/test_quantization.py:14-16).
    return CompressionConfig(num_layers=4, high_precision_bits=8,
                             medium_precision_bits=4, low_precision_bits=2)


def test_assign_precision_labels_and_stats(cfg):
    scores = jnp.array([[0.1, 0.4, 0.8, 0.95, 0.29, 0.3, 0.7]])
    labels, stats = q.assign_precision(scores, cfg)
    np.testing.assert_array_equal(
        np.asarray(labels[0]), [LOW, MID, HIGH, HIGH, LOW, MID, HIGH])
    assert int(stats["high_count"]) == 3
    assert int(stats["medium_count"]) == 2
    assert int(stats["low_count"]) == 2
    total = float(stats["high_ratio"] + stats["medium_ratio"]
                  + stats["low_ratio"])
    assert total == pytest.approx(1.0, abs=1e-6)


def test_token_costs(cfg):
    labels = jnp.array([[LOW, MID, HIGH]])
    costs = np.asarray(q.token_costs(labels, cfg))
    np.testing.assert_allclose(costs[0], [2 / 8, 4 / 8, 8 / 8])


@pytest.mark.parametrize("bits", [2, 4, 8])
@pytest.mark.parametrize("n_tokens", [16, 13])  # aligned + ragged (pads)
def test_pack_unpack_roundtrip(rng, bits, n_tokens):
    codes = jnp.asarray(
        rng.integers(0, 2 ** bits,
                     size=(2, n_tokens, 3, 64)).astype(np.uint8))
    packed = q.pack_codes(codes, bits, axis=-3)
    per_byte = 8 // bits
    assert packed.shape[-3] == -(-n_tokens // per_byte)  # token-axis shrinks
    assert packed.dtype == jnp.uint8
    out = q.unpack_codes(packed, bits, n_tokens, axis=-3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))


@pytest.mark.parametrize("bits", [2, 4, 8])
@pytest.mark.parametrize("group_size", [16, 64])
def test_quant_roundtrip_error_bound(rng, bits, group_size):
    x = jnp.asarray(rng.normal(size=(2, 7, 64)).astype(np.float32)) * 3.0
    scale, zp = q.quant_params(x, bits, group_size)
    codes = q.quantize(x, scale, zp, bits)
    assert codes.dtype == jnp.uint8
    assert int(codes.max()) <= 2 ** bits - 1
    recon = q.dequantize(codes.astype(jnp.float32), scale, zp)
    err = jnp.abs(recon - x)
    # Uniform asymmetric quant: |x - deq(q(x))| <= scale/2 per group.
    g = 64 // group_size
    bound = np.asarray(scale).reshape(2, 7, g, 1) / 2 + 1e-5
    assert np.all(np.asarray(err).reshape(2, 7, g, group_size) <= bound)


def test_quant_degenerate_constant_input():
    x = jnp.full((1, 4, 8), 3.25)
    scale, zp = q.quant_params(x, 4, 8)
    np.testing.assert_allclose(np.asarray(scale), 1.0)
    np.testing.assert_allclose(np.asarray(zp), 0.0)
    codes = q.quantize(x, scale, zp, 4)
    recon = q.dequantize(codes.astype(jnp.float32), scale, zp)
    # round(3.25) = 3 exactly reconstructed with scale 1, zp 0.
    np.testing.assert_allclose(np.asarray(recon), 3.0)


@pytest.mark.parametrize("bits", [2, 4, 8, 16])
def test_quantize_tier_roundtrip(rng, bits):
    x = jnp.asarray(rng.normal(size=(2, 8, 4, 32)).astype(np.float32))
    stored, scale, zp = q.quantize_tier(x, bits, group_size=16,
                                        store_dtype=jnp.float32)
    if bits < 16:
        assert stored.dtype == jnp.uint8
        assert stored.shape[-3] == 8 * bits // 8  # token axis shrinks
    recon = q.dequantize_tier(stored, scale, zp, bits)
    err = float(jnp.abs(recon - x).max())
    max_scale = float(scale.max())
    assert err <= max_scale / 2 + 1e-5
    # Higher bits ⇒ finer scale ⇒ tighter error (sanity: 8-bit is tight).
    if bits >= 8:
        assert err < 0.05


@pytest.mark.parametrize("bits", [2, 4, 8])
@pytest.mark.parametrize("chunk", [8, 16, 64])
def test_chunked_pack_roundtrip(rng, bits, chunk):
    """Chunk-strided packing (the decode kernel's segment layout) is a
    lossless permutation: unpack(pack(x)) == x for every chunk size."""
    codes = jnp.asarray(
        rng.integers(0, 2 ** bits, size=(2, 64, 2, 8)).astype(np.uint8))
    packed = q.pack_codes(codes, bits, axis=-3, chunk=chunk)
    if bits < 8:
        assert packed.shape[-3] == 64 // (8 // bits)
    out = q.unpack_codes(packed, bits, 64, axis=-3, chunk=chunk)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(codes))


def test_chunked_tier_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(1, 64, 2, 32)).astype(np.float32))
    stored, s, z = q.quantize_tier(x, 4, 16, chunk=16)
    recon = q.dequantize_tier(stored, s, z, 4, chunk=16)
    assert float(jnp.abs(recon - x).max()) <= float(s.max()) / 2 + 1e-5


def test_memory_report_real_byte_accounting(cfg):
    labels = jnp.concatenate([
        jnp.full((1, 4), HIGH), jnp.full((1, 4), MID), jnp.full((1, 8), LOW),
    ], axis=-1)
    valid = jnp.ones((1, 16), bool)
    rep = q.memory_report(labels, valid, cfg, head_dim=64, group_size=64)
    # bytes: codes (4 tok @1B/el + 4 tok @0.5 + 8 @0.25) × 64 ch, plus the
    # per-(token, group) f32 scale+zp (8 B/token at one group) vs 16 tok @2B.
    expected_ratio = ((4 * 1 + 4 * 0.5 + 8 * 0.25) * 64 + 16 * 8) \
        / (16 * 64 * 2.0)
    assert float(rep["compression_ratio"]) == pytest.approx(expected_ratio)
    assert float(rep["memory_savings"]) == pytest.approx(1 - expected_ratio)
    assert 0.0 <= float(rep["memory_savings"]) <= 1.0


def test_storage_bytes_math():
    # 8-bit: 100 tokens × 2 heads × 64 dim = 12800 code bytes per K and V.
    b = q.storage_bytes(100, 64, 2, bits=8, group_size=64)
    assert b == 2 * 12800 + 2 * (100 * 2 * 4 * 2)


def test_jit_full_tier_pipeline(rng, cfg):
    x = jnp.asarray(rng.normal(size=(1, 8, 2, 32)).astype(np.float32))

    @jax.jit
    def pipeline(x):
        stored, s, z = q.quantize_tier(x, 4, 16)
        return q.dequantize_tier(stored, s, z, 4)

    out = pipeline(x)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))
