"""HF Llama checkpoint loading (safetensors → params pytree).

Counterpart of the reference's `create_compressed_llama_model` weight path
(/root/reference/src/models/modified_llama.py:349-386: `from_pretrained` +
`load_state_dict(strict=False)`). Here weights stream straight from local
safetensors shards into the functional params pytree — no torch, no module
graph, no double allocation.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, RopeScaling


def _rope_scaling_from_hf(hf: Dict[str, Any]) -> Optional[RopeScaling]:
    """Parse HF `rope_scaling` (rope_type "linear" or "llama3"/Llama-3.1)."""
    rs = hf.get("rope_scaling")
    if not rs:
        return None
    kind = rs.get("rope_type") or rs.get("type")
    if kind == "linear":
        return RopeScaling(kind="linear", factor=float(rs["factor"]))
    if kind == "llama3":
        return RopeScaling(
            kind="llama3", factor=float(rs["factor"]),
            low_freq_factor=float(rs.get("low_freq_factor", 1.0)),
            high_freq_factor=float(rs.get("high_freq_factor", 4.0)),
            original_max_position=int(
                rs.get("original_max_position_embeddings", 8192)))
    if kind == "default":
        return None
    raise ValueError(f"unsupported rope_scaling type {kind!r}")


def config_from_hf(checkpoint_dir: str) -> ModelConfig:
    """Build a ModelConfig from an HF config.json.

    Families: Llama/TinyLlama/Mistral (defaults), Qwen2 (projection biases),
    Gemma v1 (GeGLU + (1+w) norms + scaled embeddings); long-context
    checkpoints via rope_scaling (linear / llama3)."""
    with open(os.path.join(checkpoint_dir, "config.json")) as f:
        hf = json.load(f)
    num_heads = hf["num_attention_heads"]
    head_dim = hf.get("head_dim", hf["hidden_size"] // num_heads)
    arch = (hf.get("architectures") or [hf.get("model_type", "")])[0]
    is_qwen2 = "Qwen2" in arch or hf.get("model_type") == "qwen2"
    is_gemma = "Gemma" in arch or hf.get("model_type") == "gemma"
    act = hf.get("hidden_activation") or hf.get("hidden_act", "silu")
    hidden_act = ("gelu_tanh" if act in ("gelu", "gelu_pytorch_tanh")
                  else "silu")
    return ModelConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf["intermediate_size"],
        num_layers=hf["num_hidden_layers"],
        num_heads=num_heads,
        num_kv_heads=hf.get("num_key_value_heads", num_heads),
        head_dim=head_dim,
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
        tie_word_embeddings=hf.get("tie_word_embeddings", is_gemma),
        qkv_bias=hf.get("attention_bias", False) or is_qwen2,
        hidden_act=hidden_act,
        rms_norm_offset=1.0 if is_gemma else 0.0,
        scale_embeddings=is_gemma,
        rope_scaling=_rope_scaling_from_hf(hf),
        # Mixtral-style sparse MLP (model_type "mixtral")
        num_experts=hf.get("num_local_experts", 0),
        num_experts_per_tok=hf.get("num_experts_per_tok", 2),
    )


def _open_shards(checkpoint_dir: str):
    """Yield (name → np.ndarray getter) across all safetensors shards."""
    from safetensors import safe_open

    index_path = os.path.join(checkpoint_dir,
                              "model.safetensors.index.json")
    files = []
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
    else:
        files = [f for f in os.listdir(checkpoint_dir)
                 if f.endswith(".safetensors")]
    handles = {}
    for fn in files:
        h = safe_open(os.path.join(checkpoint_dir, fn), framework="np")
        for key in h.keys():
            handles[key] = h
    return handles


def params_from_tensors(get, cfg: ModelConfig, target) -> Dict[str, Any]:
    """Build the params pytree from a tensor getter `get(hf_name) -> np/jnp`.

    Shared by safetensors loading and in-memory HF state dicts (tests). HF
    stores projection weights as [out, in]; our params are [in, out], so
    every matmul weight transposes. Gemma's (1 + w) norm scaling is folded
    into the stored norm weights here (in f32, then cast), so the compute
    path has a single rmsnorm everywhere.
    """
    def w(name):
        return jnp.asarray(get(name)).T.astype(target)

    def norm(name):
        x = jnp.asarray(get(name)).astype(jnp.float32)
        return (x + cfg.rms_norm_offset).astype(target)

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        layer = {
            "wq": w(p + "self_attn.q_proj.weight"),
            "wk": w(p + "self_attn.k_proj.weight"),
            "wv": w(p + "self_attn.v_proj.weight"),
            "wo": w(p + "self_attn.o_proj.weight"),
            "input_norm": norm(p + "input_layernorm.weight"),
            "post_norm": norm(p + "post_attention_layernorm.weight"),
        }
        if cfg.num_experts:
            # Mixtral: block_sparse_moe.{gate, experts.j.{w1,w3,w2}};
            # w1=gate [I,H], w3=up [I,H], w2=down [H,I] → stacked
            # [E,H,I]/[E,I,H] after the [out,in]→[in,out] transpose.
            m = p + "block_sparse_moe."
            layer["moe"] = {
                "gate": w(m + "gate.weight"),
                "w_gate": jnp.stack([w(m + f"experts.{j}.w1.weight")
                                     for j in range(cfg.num_experts)]),
                "w_up": jnp.stack([w(m + f"experts.{j}.w3.weight")
                                   for j in range(cfg.num_experts)]),
                "w_down": jnp.stack([w(m + f"experts.{j}.w2.weight")
                                     for j in range(cfg.num_experts)]),
            }
        else:
            layer.update({
                "w_gate": w(p + "mlp.gate_proj.weight"),
                "w_up": w(p + "mlp.up_proj.weight"),
                "w_down": w(p + "mlp.down_proj.weight"),
            })
        if cfg.qkv_bias:
            layer["bq"] = jnp.asarray(
                get(p + "self_attn.q_proj.bias")).astype(target)
            layer["bk"] = jnp.asarray(
                get(p + "self_attn.k_proj.bias")).astype(target)
            layer["bv"] = jnp.asarray(
                get(p + "self_attn.v_proj.bias")).astype(target)
        layers.append(layer)
    params = {
        "embed": jnp.asarray(
            get("model.embed_tokens.weight")).astype(target),
        "layers": layers,
        "final_norm": norm("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = w("lm_head.weight")
    return params


def load_hf_checkpoint(checkpoint_dir: str, cfg: Optional[ModelConfig] = None,
                       dtype: Optional[str] = None) -> Dict[str, Any]:
    """Load a local HF checkpoint (Llama/Mistral/Qwen2/Gemma family) into
    the params pytree, streaming straight from safetensors shards."""
    cfg = cfg or config_from_hf(checkpoint_dir)
    target = jnp.dtype(dtype or cfg.dtype)
    handles = _open_shards(checkpoint_dir)

    def get(name: str) -> jnp.ndarray:
        arr = handles[name].get_tensor(name)
        if arr.dtype == np.uint16:  # raw bf16 view from safetensors-np
            return jnp.asarray(arr.view(np.uint16)).view(jnp.bfloat16)
        return jnp.asarray(arr)

    return params_from_tensors(get, cfg, target)


def save_params_npz(path: str, params: Dict[str, Any]):
    """Flat .npz export (the reference's optional save_pretrained role)."""
    import jax

    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(k.key) if hasattr(k, "key") else str(k.idx)
                        for k in keypath)
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)
