"""Pallas flash-prefill kernel vs dense reference (interpret mode on CPU).

Golden checks: attention output and prompt-mass side-channel must match the
dense implementation (ops/attention.py) to fp32 tolerance, across GQA
configs, padding, and block-size choices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_kv_cache_compression_tpu.ops.attention import (
    prefill_attention_with_prompt_mass)
from realtime_kv_cache_compression_tpu.ops.pallas.flash_prefill import (
    flash_prefill_with_prompt_mass)


def make_qkv(rng, b, s, hq, hkv, d):
    q = jnp.asarray(rng.normal(size=(b, s, hq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("hq,hkv", [(4, 4), (4, 2), (8, 1)])
def test_flash_matches_dense(rng, hq, hkv):
    b, s, d, p = 2, 256, 32, 32
    q, k, v = make_qkv(rng, b, s, hq, hkv, d)
    o_ref, pm_ref = prefill_attention_with_prompt_mass(q, k, v, p)
    o, pm = flash_prefill_with_prompt_mass(q, k, v, p, block_q=128,
                                           block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pm_ref), atol=2e-5)


@pytest.mark.parametrize("fold,expb", [(False, False), (True, True)])
def test_flash_variant_flags(rng, fold, expb):
    """fold_gqa / exp_bf16 autotune variants stay correct (looser tol for
    the bf16-probability path)."""
    b, s, hq, hkv, d, p = 1, 256, 4, 2, 32, 32
    q, k, v = make_qkv(rng, b, s, hq, hkv, d)
    o_ref, pm_ref = prefill_attention_with_prompt_mass(q, k, v, p)
    o, pm = flash_prefill_with_prompt_mass(q, k, v, p, block_q=128,
                                           block_k=128, interpret=True,
                                           fold_gqa=fold, exp_bf16=expb)
    tol = 3e-2 if expb else 2e-5
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=tol)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pm_ref), atol=tol)


@pytest.mark.parametrize("expb", [False, True])
def test_flash_stats_via_mxu(rng, expb):
    """stats_via_mxu folds the denominator + prompt-mass reductions into
    one p @ [ones | indicator] MXU tile (round-4 d=128 candidate) — must
    be exact vs the dense reference, including ragged prompt lengths."""
    from realtime_kv_cache_compression_tpu.ops.attention import (
        prefill_attention_with_prompt_mass)
    b, s, hq, hkv, d, p = 2, 256, 4, 2, 32, 64
    q, k, v = make_qkv(rng, b, s, hq, hkv, d)
    plens = jnp.asarray([50, 17], jnp.int32)
    o_ref, pm_ref = prefill_attention_with_prompt_mass(
        q, k, v, p, prompt_lens=plens)
    o, pm = flash_prefill_with_prompt_mass(q, k, v, p, block_q=128,
                                           block_k=128, interpret=True,
                                           prompt_lens=plens,
                                           exp_bf16=expb,
                                           stats_via_mxu=True)
    tol = 3e-2 if expb else 2e-5
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=tol)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pm_ref), atol=tol)


def test_flash_unpadded_vs_padded_sequence(rng):
    """S not divisible by the block size exercises the padding path."""
    b, s, hq, hkv, d, p = 1, 192, 2, 2, 32, 24
    q, k, v = make_qkv(rng, b, s, hq, hkv, d)
    o_ref, pm_ref = prefill_attention_with_prompt_mass(q, k, v, p)
    o, pm = flash_prefill_with_prompt_mass(q, k, v, p, block_q=128,
                                           block_k=128, interpret=True)
    assert o.shape == (b, s, hq, d)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pm_ref), atol=2e-5)


def test_flash_block_size_invariance(rng):
    b, s, hq, hkv, d, p = 1, 256, 2, 1, 32, 16
    q, k, v = make_qkv(rng, b, s, hq, hkv, d)
    o1, pm1 = flash_prefill_with_prompt_mass(q, k, v, p, block_q=128,
                                             block_k=128, interpret=True)
    o2, pm2 = flash_prefill_with_prompt_mass(q, k, v, p, block_q=256,
                                             block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pm1), np.asarray(pm2), atol=2e-5)


def test_flash_bf16_inputs(rng):
    b, s, hq, hkv, d, p = 1, 256, 2, 2, 32, 16
    q, k, v = make_qkv(rng, b, s, hq, hkv, d)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    o, pm = flash_prefill_with_prompt_mass(qb, kb, vb, p, interpret=True)
    o_ref, pm_ref = prefill_attention_with_prompt_mass(qb, kb, vb, p)
    assert o.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(o.astype(jnp.float32)),
                               np.asarray(o_ref.astype(jnp.float32)),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pm_ref), atol=2e-2)


def test_flash_prompt_mass_full_prompt_sums_to_one(rng):
    """P = S ⇒ every row's prompt mass is its full softmax mass = 1."""
    b, s, hq, hkv, d = 1, 128, 2, 2, 32
    q, k, v = make_qkv(rng, b, s, hq, hkv, d)
    _, pm = flash_prefill_with_prompt_mass(q, k, v, s, interpret=True)
    np.testing.assert_allclose(np.asarray(pm), 1.0, atol=1e-5)


def test_model_prefill_with_flash_matches_dense(rng):
    """prefill_compressed(use_flash=True) == use_flash=False end to end."""
    from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                                   tiny_test_model)
    from realtime_kv_cache_compression_tpu.models import llama

    cfg = tiny_test_model(num_layers=2)
    ccfg = CompressionConfig(num_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 64), 0,
                             cfg.vocab_size)
    l_dense, _, st_d = llama.prefill_compressed(params, ids, cfg, ccfg,
                                                use_flash=False)
    l_flash, _, st_f = llama.prefill_compressed(params, ids, cfg, ccfg,
                                                use_flash=True)
    np.testing.assert_allclose(np.asarray(l_flash), np.asarray(l_dense),
                               atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(st_f[0]["importance_mean"]),
        np.asarray(st_d[0]["importance_mean"]), atol=1e-4)
