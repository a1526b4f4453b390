"""HF-checkpoint loading round-trip + benchmark-runner + outlier-clip tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_kv_cache_compression_tpu import tiny_test_model
from realtime_kv_cache_compression_tpu.models import llama, weights


def make_fake_hf_checkpoint(tmp_path, cfg):
    """Write a tiny HF-Llama-format safetensors checkpoint."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    t = {}
    h, qd, kvd, inter = (cfg.hidden_size, cfg.q_dim, cfg.kv_dim,
                         cfg.intermediate_size)
    t["model.embed_tokens.weight"] = rng.normal(
        size=(cfg.vocab_size, h)).astype(np.float32)
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        t[p + "self_attn.q_proj.weight"] = rng.normal(size=(qd, h)).astype(np.float32)
        t[p + "self_attn.k_proj.weight"] = rng.normal(size=(kvd, h)).astype(np.float32)
        t[p + "self_attn.v_proj.weight"] = rng.normal(size=(kvd, h)).astype(np.float32)
        t[p + "self_attn.o_proj.weight"] = rng.normal(size=(h, qd)).astype(np.float32)
        t[p + "mlp.gate_proj.weight"] = rng.normal(size=(inter, h)).astype(np.float32)
        t[p + "mlp.up_proj.weight"] = rng.normal(size=(inter, h)).astype(np.float32)
        t[p + "mlp.down_proj.weight"] = rng.normal(size=(h, inter)).astype(np.float32)
        t[p + "input_layernorm.weight"] = np.ones(h, np.float32)
        t[p + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
    t["model.norm.weight"] = np.ones(h, np.float32)
    t["lm_head.weight"] = rng.normal(size=(cfg.vocab_size, h)).astype(np.float32)
    save_file(t, os.path.join(tmp_path, "model.safetensors"))
    hf_cfg = {
        "vocab_size": cfg.vocab_size, "hidden_size": h,
        "intermediate_size": inter, "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads, "head_dim": cfg.head_dim,
        "max_position_embeddings": cfg.max_position_embeddings,
        "rope_theta": cfg.rope_theta, "rms_norm_eps": cfg.rms_norm_eps,
        "tie_word_embeddings": False,
    }
    with open(os.path.join(tmp_path, "config.json"), "w") as f:
        json.dump(hf_cfg, f)
    return t


def test_hf_checkpoint_roundtrip(tmp_path):
    cfg = tiny_test_model(num_layers=2)
    tensors = make_fake_hf_checkpoint(str(tmp_path), cfg)
    loaded_cfg = weights.config_from_hf(str(tmp_path))
    assert loaded_cfg.hidden_size == cfg.hidden_size
    assert loaded_cfg.num_kv_heads == cfg.num_kv_heads

    params = weights.load_hf_checkpoint(str(tmp_path), cfg, dtype="float32")
    # HF [out, in] → ours [in, out].
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["wq"]),
        tensors["model.layers.0.self_attn.q_proj.weight"].T, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["embed"]),
        tensors["model.embed_tokens.weight"], atol=1e-6)
    # Loaded params run.
    ids = jnp.arange(16, dtype=jnp.int32)[None] % cfg.vocab_size
    logits = llama.forward_logits(params, ids, cfg)
    assert np.isfinite(np.asarray(logits)).all()


def test_save_params_npz(tmp_path):
    cfg = tiny_test_model(num_layers=1)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "params.npz")
    weights.save_params_npz(path, params)
    flat = np.load(path)
    assert any("embed" in k for k in flat.files)


def test_benchmark_runner_cpu(tmp_path):
    from realtime_kv_cache_compression_tpu.eval.benchmark_runner import (
        CompressionBenchmark, named_scenarios)

    cfg = tiny_test_model(num_layers=2)
    scen = named_scenarios(2)
    assert set(scen) == {"baseline", "conservative", "balanced", "aggressive",
                         "prompt_focused", "position_focused"}
    bench = CompressionBenchmark(cfg, output_dir=str(tmp_path),
                                 seq_lens=(64,), new_tokens=4)
    res = bench.run_full_benchmark(configs=["baseline", "balanced"])
    assert "baseline" in res and "balanced" in res
    bal = res["balanced"]["per_seq_len"][0]
    assert bal["tokens_per_second"] > 0
    assert 0 < bal["memory_savings"] <= 1
    assert (tmp_path / "benchmark_results.json").exists()
    assert (tmp_path / "benchmark_report.md").exists()
    assert (tmp_path / "benchmark_plots.png").exists()


def test_outlier_clip_improves_resolution(rng):
    from realtime_kv_cache_compression_tpu.ops import quantization as q

    x = rng.normal(size=(4, 8, 64)).astype(np.float32)
    x[..., 0] += 40.0  # one massive outlier channel per group
    xj = jnp.asarray(x)
    s_plain, _ = q.quant_params(xj, 4, 64, clip_frac=0.0)
    s_clip, _ = q.quant_params(xj, 4, 64, clip_frac=0.05)
    # Clipped scale is much finer.
    assert float(s_clip.mean()) < 0.5 * float(s_plain.mean())
    # And inlier reconstruction error drops.
    for clip, scale_zp in (("plain", q.quant_params(xj, 4, 64, 0.0)),
                           ("clip", q.quant_params(xj, 4, 64, 0.05))):
        scale, zp = scale_zp
        codes = q.quantize(xj, scale, zp, 4)
        recon = q.dequantize(codes.astype(jnp.float32), scale, zp)
        err = np.abs(np.asarray(recon) - x)[..., 1:].mean()  # inliers only
        if clip == "plain":
            err_plain = err
        else:
            assert err < 0.5 * err_plain
