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

from ..config import ModelConfig


def config_from_hf(checkpoint_dir: str) -> ModelConfig:
    """Build a ModelConfig from an HF config.json."""
    with open(os.path.join(checkpoint_dir, "config.json")) as f:
        hf = json.load(f)
    num_heads = hf["num_attention_heads"]
    head_dim = hf.get("head_dim", hf["hidden_size"] // num_heads)
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
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
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


def load_hf_checkpoint(checkpoint_dir: str, cfg: Optional[ModelConfig] = None,
                       dtype: Optional[str] = None) -> Dict[str, Any]:
    """Load a local HF Llama checkpoint into the params pytree.

    HF stores projection weights as [out, in]; our params are [in, out], so
    every matmul weight transposes on load.
    """
    cfg = cfg or config_from_hf(checkpoint_dir)
    target = jnp.dtype(dtype or cfg.dtype)
    handles = _open_shards(checkpoint_dir)

    def get(name: str, transpose: bool = False) -> jnp.ndarray:
        arr = handles[name].get_tensor(name)
        if arr.dtype == np.uint16:  # raw bf16 view from safetensors-np
            arr = arr.view(np.uint16)
            x = jnp.asarray(arr).view(jnp.bfloat16)
        else:
            x = jnp.asarray(arr)
        if transpose:
            x = x.T
        return x.astype(target)

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        layers.append({
            "wq": get(p + "self_attn.q_proj.weight", transpose=True),
            "wk": get(p + "self_attn.k_proj.weight", transpose=True),
            "wv": get(p + "self_attn.v_proj.weight", transpose=True),
            "wo": get(p + "self_attn.o_proj.weight", transpose=True),
            "w_gate": get(p + "mlp.gate_proj.weight", transpose=True),
            "w_up": get(p + "mlp.up_proj.weight", transpose=True),
            "w_down": get(p + "mlp.down_proj.weight", transpose=True),
            "input_norm": get(p + "input_layernorm.weight"),
            "post_norm": get(p + "post_attention_layernorm.weight"),
        })
    params = {
        "embed": get("model.embed_tokens.weight"),
        "layers": layers,
        "final_norm": get("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = get("lm_head.weight", transpose=True)
    return params


def save_params_npz(path: str, params: Dict[str, Any]):
    """Flat .npz export (the reference's optional save_pretrained role)."""
    import jax

    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(str(k.key) if hasattr(k, "key") else str(k.idx)
                        for k in keypath)
        flat[name] = np.asarray(leaf)
    np.savez(path, **flat)
