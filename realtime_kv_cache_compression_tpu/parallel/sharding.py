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
        "input_norm": P(),
        "post_norm": P(),
    }
    if cfg.qkv_bias:
        layer.update({"bq": P(MODEL_AXIS), "bk": P(MODEL_AXIS),
                      "bv": P(MODEL_AXIS)})  # follow the column sharding
    if cfg.num_experts:
        # Expert parallelism: the expert axis shards over `model`. With
        # moe_impl="dense" each device computes only its local experts and
        # the combine contraction over `e` psums across the axis; the
        # capacity-routed shard_map path (parallel/expert_parallel.py) uses
        # the same placement.
        layer["moe"] = {
            "gate": P(),                          # [H, E] tiny, replicated
            "w_gate": P(MODEL_AXIS, None, None),  # [E, H, I]
            "w_up": P(MODEL_AXIS, None, None),
            "w_down": P(MODEL_AXIS, None, None),  # [E, I, H]
        }
    else:
        layer.update({
            "w_gate": P(None, MODEL_AXIS),    # [H, I]
            "w_up": P(None, MODEL_AXIS),
            "w_down": P(MODEL_AXIS, None),    # [I, H]
        })
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


def _constrain(x, spec: P, mesh: Mesh):
    """with_sharding_constraint, dropping axes the shape can't honor."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, _feasible_spec(x, spec, mesh)))


def constrain_tier_cache(tier, mesh: Mesh):
    """Apply sharding constraints to a TierCache inside jit."""
    import dataclasses as _dc

    specs = tier_cache_specs()
    updates = {
        name: _constrain(getattr(tier, name), spec, mesh)
        for name, spec in specs.items()
    }
    return _dc.replace(tier, **updates)


def constrain_layer_cache(cache, mesh: Mesh):
    """Constrain every tier of a CompressedLayerCache."""
    import dataclasses as _dc

    return _dc.replace(cache, tiers=tuple(
        constrain_tier_cache(t, mesh) for t in cache.tiers))


def constrain_recent_cache(recent, mesh: Mesh):
    """Recent ring: batch on `data`, kv-heads on `model`."""
    import dataclasses as _dc

    return _dc.replace(
        recent,
        k=_constrain(recent.k, P(DATA_AXIS, None, MODEL_AXIS, None), mesh),
        v=_constrain(recent.v, P(DATA_AXIS, None, MODEL_AXIS, None), mesh),
        positions=_constrain(recent.positions, P(DATA_AXIS, None), mesh),
        length=_constrain(recent.length, P(DATA_AXIS), mesh),
    )


def constrain_decode_pool(pool, mesh: Mesh):
    """Decode pool: batch on `data`, kv-heads on `model` (None passthrough)."""
    import dataclasses as _dc

    if pool is None:
        return None
    four = P(DATA_AXIS, None, MODEL_AXIS, None)
    return _dc.replace(
        pool,
        k_stored=_constrain(pool.k_stored, four, mesh),
        v_stored=_constrain(pool.v_stored, four, mesh),
        k_scale=_constrain(pool.k_scale, four, mesh),
        k_zp=_constrain(pool.k_zp, four, mesh),
        v_scale=_constrain(pool.v_scale, four, mesh),
        v_zp=_constrain(pool.v_zp, four, mesh),
        positions=_constrain(pool.positions, P(DATA_AXIS, None), mesh),
        valid=_constrain(pool.valid, P(DATA_AXIS, None), mesh),
        write_block=_constrain(pool.write_block, P(DATA_AXIS), mesh),
    )


def constrain_decode_state(state, mesh: Mesh):
    """Commit the full DecodeState layout to the mesh: tier pools / recent
    rings / decode pools at P(data, None, model, None), positions and
    validity replicated over `model`. Called by prefill when a mesh is
    passed, so the cache layout under GSPMD is *enforced*, not whatever
    propagation happens to pick."""
    import dataclasses as _dc

    return _dc.replace(
        state,
        caches=tuple(constrain_layer_cache(c, mesh) for c in state.caches),
        recents=tuple(constrain_recent_cache(r, mesh)
                      for r in state.recents),
        pools=tuple(constrain_decode_pool(p, mesh) for p in state.pools),
        position=_constrain(state.position, P(DATA_AXIS), mesh),
    )
