"""Model-family parity vs HuggingFace transformers (CPU, random weights).

The reference integrates with HF Llama only (modified_llama.py). This
framework widens the family to Qwen2 (attention-projection biases) and
Gemma v1 (GeGLU, (1+w) RMSNorm, sqrt(hidden)-scaled embeddings, tied head).
Zero-egress-safe golden test: tiny HF models are built from configs with
random init (no downloads), their state dicts converted through
`weights.params_from_tensors`, and all-position logits compared against
`forward_logits` in float32.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from realtime_kv_cache_compression_tpu import (CompressionConfig,  # noqa: E402
                                               ModelConfig)
from realtime_kv_cache_compression_tpu import RopeScaling as rtc_rope  # noqa: E402
from realtime_kv_cache_compression_tpu.models import llama  # noqa: E402
from realtime_kv_cache_compression_tpu.models.weights import (  # noqa: E402
    params_from_tensors)

DIMS = dict(hidden_size=64, intermediate_size=112, num_layers=2,
            num_heads=4, num_kv_heads=2, head_dim=16, vocab_size=128,
            max_position_embeddings=256)


def _hf_to_params(model, cfg):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    if "lm_head.weight" not in sd and not cfg.tie_word_embeddings:
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]

    def get(name):
        return sd[name]

    return params_from_tensors(get, cfg, jnp.float32)


def _compare(hf_model, cfg, seed=0, atol=2e-3):
    hf_model.eval()
    rng = np.random.RandomState(seed)
    ids = rng.randint(0, cfg.vocab_size, size=(2, 24))
    with torch.no_grad():
        want = hf_model(torch.tensor(ids)).logits.numpy()
    params = _hf_to_params(hf_model, cfg)
    got = np.asarray(llama.forward_logits(params, jnp.asarray(ids), cfg))
    err = np.abs(got - want).max()
    assert err < atol, f"max |Δlogits| = {err}"
    return err


class TestHFParity:
    def test_llama(self):
        hf_cfg = transformers.LlamaConfig(
            hidden_size=DIMS["hidden_size"],
            intermediate_size=DIMS["intermediate_size"],
            num_hidden_layers=DIMS["num_layers"],
            num_attention_heads=DIMS["num_heads"],
            num_key_value_heads=DIMS["num_kv_heads"],
            head_dim=DIMS["head_dim"], vocab_size=DIMS["vocab_size"],
            max_position_embeddings=DIMS["max_position_embeddings"],
            rms_norm_eps=1e-5, tie_word_embeddings=False,
            attention_bias=False)
        torch.manual_seed(0)
        model = transformers.LlamaForCausalLM(hf_cfg)
        cfg = ModelConfig(**DIMS, rms_norm_eps=1e-5, dtype="float32")
        _compare(model, cfg)

    def test_qwen2_bias(self):
        hf_cfg = transformers.Qwen2Config(
            hidden_size=DIMS["hidden_size"],
            intermediate_size=DIMS["intermediate_size"],
            num_hidden_layers=DIMS["num_layers"],
            num_attention_heads=DIMS["num_heads"],
            num_key_value_heads=DIMS["num_kv_heads"],
            vocab_size=DIMS["vocab_size"],
            max_position_embeddings=DIMS["max_position_embeddings"],
            rms_norm_eps=1e-6, tie_word_embeddings=False,
            rope_theta=1e6)
        torch.manual_seed(1)
        model = transformers.Qwen2ForCausalLM(hf_cfg)
        # Qwen2 has q/k/v biases; prove they are loaded AND used.
        assert model.model.layers[0].self_attn.q_proj.bias is not None
        with torch.no_grad():  # make biases decidedly non-zero
            for layer in model.model.layers:
                for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                             layer.self_attn.v_proj):
                    proj.bias.add_(torch.randn_like(proj.bias))
        cfg = ModelConfig(**DIMS, rms_norm_eps=1e-6, rope_theta=1e6,
                          qkv_bias=True, dtype="float32")
        _compare(model, cfg, seed=1)

    def test_gemma(self):
        hf_cfg = transformers.GemmaConfig(
            hidden_size=DIMS["hidden_size"],
            intermediate_size=DIMS["intermediate_size"],
            num_hidden_layers=DIMS["num_layers"],
            num_attention_heads=DIMS["num_heads"],
            num_key_value_heads=DIMS["num_kv_heads"],
            head_dim=DIMS["head_dim"], vocab_size=DIMS["vocab_size"],
            max_position_embeddings=DIMS["max_position_embeddings"],
            rms_norm_eps=1e-6, tie_word_embeddings=True,
            hidden_activation="gelu_pytorch_tanh")
        torch.manual_seed(2)
        model = transformers.GemmaForCausalLM(hf_cfg)
        with torch.no_grad():  # exercise the (1+w) path with w != 0
            for name, p in model.named_parameters():
                if "norm" in name:
                    p.add_(0.1 * torch.randn_like(p))
        cfg = ModelConfig(**DIMS, rms_norm_eps=1e-6, tie_word_embeddings=True,
                          hidden_act="gelu_tanh", rms_norm_offset=1.0,
                          scale_embeddings=True, dtype="float32")
        _compare(model, cfg, seed=2)


class TestRopeScaling:
    """Long-context RoPE scaling parity vs HF (linear and Llama-3.1)."""

    def _llama_cfg(self, rope_scaling):
        return transformers.LlamaConfig(
            hidden_size=DIMS["hidden_size"],
            intermediate_size=DIMS["intermediate_size"],
            num_hidden_layers=DIMS["num_layers"],
            num_attention_heads=DIMS["num_heads"],
            num_key_value_heads=DIMS["num_kv_heads"],
            head_dim=DIMS["head_dim"], vocab_size=DIMS["vocab_size"],
            max_position_embeddings=DIMS["max_position_embeddings"],
            rms_norm_eps=1e-5, tie_word_embeddings=False,
            rope_scaling=rope_scaling)

    def test_linear_scaling_matches_hf(self):
        torch.manual_seed(3)
        model = transformers.LlamaForCausalLM(
            self._llama_cfg({"rope_type": "linear", "factor": 2.0}))
        cfg = ModelConfig(**DIMS, dtype="float32",
                          rope_scaling=rtc_rope(kind="linear", factor=2.0))
        _compare(model, cfg, seed=3)

    def test_llama3_scaling_matches_hf(self):
        torch.manual_seed(4)
        rs = {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
              "high_freq_factor": 4.0,
              "original_max_position_embeddings": 64}
        model = transformers.LlamaForCausalLM(self._llama_cfg(rs))
        cfg = ModelConfig(**DIMS, dtype="float32",
                          rope_scaling=rtc_rope(
                              kind="llama3", factor=8.0, low_freq_factor=1.0,
                              high_freq_factor=4.0,
                              original_max_position=64))
        _compare(model, cfg, seed=4)

    def test_scaling_changes_logits(self):
        # The scaled model must actually differ from the unscaled one
        # (guards against the scaling silently not being applied).
        torch.manual_seed(5)
        model = transformers.LlamaForCausalLM(self._llama_cfg(None))
        cfg_plain = ModelConfig(**DIMS, dtype="float32")
        cfg_scaled = ModelConfig(**DIMS, dtype="float32",
                                 rope_scaling=rtc_rope(kind="linear",
                                                       factor=4.0))
        params = _hf_to_params(model, cfg_plain)
        ids = jnp.asarray(np.random.RandomState(5).randint(
            0, cfg_plain.vocab_size, size=(1, 24)))
        a = llama.forward_logits(params, ids, cfg_plain)
        b = llama.forward_logits(params, ids, cfg_scaled)
        assert float(jnp.abs(a - b).max()) > 1e-3

    def test_config_from_hf_parses_rope_scaling(self, tmp_path):
        import json

        from realtime_kv_cache_compression_tpu.models.weights import (
            config_from_hf)
        hf = dict(vocab_size=128, hidden_size=64, intermediate_size=112,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, head_dim=16,
                  max_position_embeddings=131072, rope_theta=500000.0,
                  rope_scaling={"rope_type": "llama3", "factor": 8.0,
                                "low_freq_factor": 1.0,
                                "high_freq_factor": 4.0,
                                "original_max_position_embeddings": 8192})
        (tmp_path / "config.json").write_text(json.dumps(hf))
        cfg = config_from_hf(str(tmp_path))
        assert cfg.rope_scaling == rtc_rope(
            kind="llama3", factor=8.0, low_freq_factor=1.0,
            high_freq_factor=4.0, original_max_position=8192)

    def test_compressed_generate_with_scaling(self):
        cfg = ModelConfig(**dict(DIMS, dtype="float32"),
                          rope_scaling=rtc_rope(
                              kind="llama3", factor=8.0,
                              original_max_position=64))
        ccfg = CompressionConfig(num_layers=cfg.num_layers)
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0,
                                 cfg.vocab_size)
        out1, _ = llama.generate(params, ids, cfg, ccfg, max_new_tokens=6)
        out2, _ = llama.generate(params, ids, cfg, ccfg, max_new_tokens=6)
        assert out1.shape == (2, 6) and jnp.array_equal(out1, out2)


class TestCompressedPathNewFamilies:
    """The compression pipeline must run end-to-end on the new families."""

    @pytest.mark.parametrize("variant", ["qwen2", "gemma"])
    def test_generate_runs_and_is_deterministic(self, variant):
        kw = dict(DIMS, dtype="float32")
        if variant == "qwen2":
            cfg = ModelConfig(**kw, qkv_bias=True, rope_theta=1e6)
        else:
            cfg = ModelConfig(**kw, tie_word_embeddings=True,
                              hidden_act="gelu_tanh", rms_norm_offset=1.0,
                              scale_embeddings=True)
        ccfg = CompressionConfig(num_layers=cfg.num_layers)
        params = llama.init_params(jax.random.PRNGKey(0), cfg)
        if variant == "qwen2":
            assert "bq" in params["layers"][0]
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0,
                                 cfg.vocab_size)
        out1, stats = llama.generate(params, ids, cfg, ccfg,
                                     max_new_tokens=8)
        out2, _ = llama.generate(params, ids, cfg, ccfg, max_new_tokens=8)
        assert out1.shape == (2, 8)
        assert jnp.array_equal(out1, out2)
        assert len(stats) == cfg.num_layers
