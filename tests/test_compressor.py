"""End-to-end compression pipeline tests on synthetic K/V (the reference's
test_compression.py surface: shapes, shrinkage, ratio in (0,1]) plus
round-trip fidelity of the packed cache and stats aggregation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                               tiny_test_model)
from realtime_kv_cache_compression_tpu.compression import (
    append_recent, compress_layer_kv, dequantize_layer_cache,
    init_recent_cache, summarize_layer_stats)
from realtime_kv_cache_compression_tpu.compression.kv_cache import (
    cache_storage_bytes, layer_cache_report, uncompressed_kv_bytes)
from realtime_kv_cache_compression_tpu.ops.attention import (
    attention_over_tokens, prefill_attention_with_prompt_mass)


@pytest.fixture
def cfg():
    return CompressionConfig(num_layers=4, high_precision_bits=8,
                             medium_precision_bits=4, low_precision_bits=2)


@pytest.fixture
def mcfg():
    return tiny_test_model()


def synth_kv(rng, b=2, s=64, h=2, d=16):
    k = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    mass = jnp.asarray(rng.random((b, s)).astype(np.float32))
    return k, v, mass


def test_compress_layer_shapes_and_ratio(rng, cfg, mcfg):
    k, v, mass = synth_kv(rng)
    cache, stats = compress_layer_kv(k, v, mass, 0, cfg, mcfg)
    total_cap = cache.capacity
    assert total_cap <= 64
    assert total_cap >= int(64 * cfg.layer_ratio(0))
    ratio = np.asarray(stats["compression_ratio"])
    assert np.all((ratio > 0) & (ratio <= 1.0))
    # Compressed sequence strictly shrank (ratio < 1 at 0.8 budget with
    # mixed costs).
    assert np.all(np.asarray(stats["kept_tokens"]) < 64)
    # Real packed storage is smaller than a bf16 cache of the full sequence.
    assert cache_storage_bytes(cache) < uncompressed_kv_bytes(2, 64, mcfg)


def test_roundtrip_fidelity_by_tier(rng, cfg, mcfg):
    """Dequantized kept tokens approximate the originals; HIGH tier tighter
    than LOW tier."""
    k, v, mass = synth_kv(rng, s=128)
    cache, _ = compress_layer_kv(k, v, mass, 0, cfg, mcfg)
    k_d, v_d, pos, valid = dequantize_layer_cache(cache, cfg)
    errs = {}
    offset = 0
    for name, tier_cache in zip(("high", "mid", "low"), cache.tiers):
        n = tier_cache.capacity
        sl = slice(offset, offset + n)
        offset += n
        tv = np.asarray(valid[:, sl])
        if not tv.any():
            continue
        orig = np.take_along_axis(np.asarray(k),
                                  np.asarray(pos[:, sl])[:, :, None, None],
                                  axis=1)
        err = np.abs(np.asarray(k_d[:, sl]) - orig)[tv]
        errs[name] = err.max()
    assert errs["high"] < 0.05          # 8-bit
    assert errs["low"] < 2.0            # 2-bit coarse but bounded
    assert errs["high"] <= errs["mid"] <= errs["low"] + 1e-6


def test_positions_and_validity_consistent(rng, cfg, mcfg):
    k, v, mass = synth_kv(rng)
    cache, stats = compress_layer_kv(k, v, mass, 1, cfg, mcfg)
    _, _, pos, valid = dequantize_layer_cache(cache, cfg)
    pos, valid = np.asarray(pos), np.asarray(valid)
    assert pos.min() >= 0 and pos.max() < 64
    for b in range(pos.shape[0]):
        live = pos[b][valid[b]]
        assert len(np.unique(live)) == len(live)  # no duplicate tokens
    assert valid.sum() == np.asarray(stats["kept_tokens"]).sum()


def test_layerwise_ratios_differ(rng, cfg, mcfg):
    k, v, mass = synth_kv(rng, s=100)
    _, s0 = compress_layer_kv(k, v, mass, 0, cfg, mcfg)   # early: 0.8
    _, s3 = compress_layer_kv(k, v, mass, 3, cfg, mcfg)   # late: 0.4
    assert (np.asarray(s3["kept_tokens"]).mean()
            < np.asarray(s0["kept_tokens"]).mean())


def test_compressed_attention_close_to_exact(rng, cfg, mcfg):
    """Decode-style attention over the compressed cache stays close to exact
    attention over the full KV — golden divergence test (SURVEY.md §4)."""
    b, s, hq, hkv, d = 1, 96, 4, 2, 16
    q_ = jnp.asarray(rng.normal(size=(b, 4, hq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    q_pos = jnp.full((b, 4), s - 1, jnp.int32)
    all_pos = jnp.arange(s)[None].repeat(b, 0)
    all_valid = jnp.ones((b, s), bool)
    exact = attention_over_tokens(q_, k, v, all_pos, all_valid, q_pos)

    # Importance from real attention mass so "important" tokens are the ones
    # attention actually uses.
    _, mass = prefill_attention_with_prompt_mass(
        jnp.broadcast_to(q_[:, :1], (b, 1, hq, d)).repeat(s, 1), k, v, 16)
    hi_cfg = CompressionConfig(num_layers=4, early_layer_ratio=0.9,
                               high_precision_bits=8,
                               medium_precision_bits=8,
                               low_precision_bits=4)
    cache, _ = compress_layer_kv(k, v, mass, 0, hi_cfg, mcfg)
    k_d, v_d, pos, valid = dequantize_layer_cache(cache, hi_cfg)
    approx = attention_over_tokens(q_, k_d.astype(q_.dtype),
                                   v_d.astype(q_.dtype), pos, valid, q_pos)
    err = float(jnp.abs(approx - exact).max())
    assert err < 0.35  # ~90% retention @ 8/8/4 bits keeps attention close


def test_recent_cache_append(mcfg):
    rc = init_recent_cache(2, 8, mcfg, dtype=jnp.float32)
    k1 = jnp.ones((2, 1, mcfg.num_kv_heads, mcfg.head_dim))
    rc = append_recent(rc, k1, k1 * 2, jnp.array([[5], [7]]))
    rc = append_recent(rc, k1 * 3, k1 * 4, jnp.array([[6], [8]]))
    assert np.asarray(rc.length).tolist() == [2, 2]
    np.testing.assert_allclose(np.asarray(rc.k[0, 0, 0, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(rc.k[0, 1, 0, 0]), 3.0)
    assert np.asarray(rc.positions)[1, :2].tolist() == [7, 8]


def test_summarize_layer_stats(rng, cfg, mcfg):
    k, v, mass = synth_kv(rng)
    all_stats = [compress_layer_kv(k, v, mass, l, cfg, mcfg)[1]
                 for l in range(4)]
    summary = summarize_layer_stats(all_stats)
    assert summary["total_layers_processed"] == 4
    assert 0 < summary["avg_compression_ratio"] <= 1
    assert 0 <= summary["avg_memory_savings"] <= 1
    pd = summary["precision_distribution"]
    assert (pd["high_ratio"] + pd["medium_ratio"]
            + pd["low_ratio"]) == pytest.approx(1.0, abs=1e-6)


def test_perf_budget_s2048(rng, cfg, mcfg):
    """Mirror of the reference's perf-budget test
    (test_importance_scoring.py:338-371: S=2048 scoring under 5 s) — here
    the FULL compression pipeline at S=2048 must run well under 5 s on CPU
    after compilation (the reference's eager loops took ~0.74 s/layer on a
    GPU; this is the defect class we must not reproduce)."""
    import time

    k, v, mass = synth_kv(rng, b=1, s=2048, h=2, d=16)
    fn = jax.jit(lambda k, v, m: compress_layer_kv(k, v, m, 0, cfg, mcfg))
    jax.block_until_ready(fn(k, v, mass)[0].tiers[0].k_stored)  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(k, v, mass)
    jax.block_until_ready(out[0].tiers[0].k_stored)
    per_call = (time.perf_counter() - t0) / 3
    assert per_call < 5.0, f"{per_call:.3f}s per layer at S=2048 (CPU)"


def test_full_pipeline_jit(rng, cfg, mcfg):
    k, v, mass = synth_kv(rng)
    fn = jax.jit(lambda k, v, m: compress_layer_kv(k, v, m, 0, cfg, mcfg))
    cache, stats = fn(k, v, mass)
    assert cache.tiers[0].k_stored.dtype == jnp.uint8
    report = layer_cache_report(cache, 2, 64, mcfg)
    assert report["compressed_bytes"] > 0
