"""GSPMD sharding specs for weights, activations, and the compressed KV cache.

North-star scale-out design (SURVEY.md §7.2 Phase 4, no reference
counterpart): megatron-style tensor parallelism over the `model` axis —
attention heads and MLP hidden sharded column-wise on the up-projections and
row-wise on the down-projections, vocab sharded on embed/lm_head — and batch
on the `data` axis. The compressed KV cache shards its kv-head axis on
`model`; token positions/validity are tiny and replicated across model shards
so selection is *consistent across head shards by construction* (scores are
head-reduced, hence replicated after the head-axis mean → every shard gathers
the same token set, keeping raggedness off the comms path).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from .mesh import DATA_AXIS, MODEL_AXIS

Params = Dict[str, Any]


def param_specs(cfg: ModelConfig) -> Params:
    """PartitionSpec pytree matching models.llama.init_params."""
    layer = {
        "wq": P(None, MODEL_AXIS),        # [H, Hq*D] — heads column-sharded
        "wk": P(None, MODEL_AXIS),        # [H, Hkv*D]
        "wv": P(None, MODEL_AXIS),
        "wo": P(MODEL_AXIS, None),        # [Hq*D, H] — row-sharded (psum)
        "w_gate": P(None, MODEL_AXIS),    # [H, I]
        "w_up": P(None, MODEL_AXIS),
        "w_down": P(MODEL_AXIS, None),    # [I, H]
        "input_norm": P(),
        "post_norm": P(),
    }
    specs = {
        "embed": P(MODEL_AXIS, None),     # [V, H] — vocab-sharded
        "layers": [dict(layer) for _ in range(cfg.num_layers)],
        "final_norm": P(),
    }
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = P(None, MODEL_AXIS)  # [H, V]
    return specs


def _feasible_spec(x, spec: P, mesh: Mesh) -> P:
    """Drop sharded axes whose dimension is not divisible by the mesh axis
    (e.g. a 258-entry byte-tokenizer vocab over 4 model shards) — those
    leaves replicate on that axis instead of erroring."""
    out = []
    for dim, axis in zip(x.shape, tuple(spec) + (None,) * (x.ndim - len(spec))):
        if axis is None:
            out.append(None)
        else:
            size = mesh.shape[axis]
            out.append(axis if dim % size == 0 else None)
    return P(*out)


def shard_params(params: Params, mesh: Mesh, cfg: ModelConfig) -> Params:
    """Place a params pytree onto the mesh with tensor-parallel sharding."""
    specs = param_specs(cfg)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, _feasible_spec(x, s, mesh))),
        params, specs,
        is_leaf=lambda x: isinstance(x, P))


def batch_spec() -> P:
    return P(DATA_AXIS)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs: batch over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def tier_cache_specs() -> Dict[str, P]:
    """PartitionSpecs for one TierCache: KV-head axis on `model`, batch on
    `data`; positions/validity replicated over model shards."""
    return {
        "k_stored": P(DATA_AXIS, None, MODEL_AXIS, None),
        "v_stored": P(DATA_AXIS, None, MODEL_AXIS, None),
        "k_scale": P(DATA_AXIS, None, MODEL_AXIS, None),
        "k_zp": P(DATA_AXIS, None, MODEL_AXIS, None),
        "v_scale": P(DATA_AXIS, None, MODEL_AXIS, None),
        "v_zp": P(DATA_AXIS, None, MODEL_AXIS, None),
        "positions": P(DATA_AXIS, None),
        "valid": P(DATA_AXIS, None),
    }


def constrain_tier_cache(tier, mesh: Mesh):
    """Apply sharding constraints to a TierCache inside jit."""
    import dataclasses as _dc

    specs = tier_cache_specs()
    updates = {
        name: jax.lax.with_sharding_constraint(
            getattr(tier, name), NamedSharding(mesh, spec))
        for name, spec in specs.items()
    }
    return _dc.replace(tier, **updates)
