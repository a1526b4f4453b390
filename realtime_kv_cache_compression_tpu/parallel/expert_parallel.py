"""Capacity-routed expert parallelism (shard_map over the `model` axis).

No reference counterpart (the reference is dense-Llama, single-GPU —
SURVEY.md §2.6 marks EP "n/a"); this is the scale-out form of the MoE MLP
(ops/moe.py) for Mixtral-family checkpoints.

Design: expert weights are sharded over the mesh's `model` axis
([E, H, I] → [E/P, H, I] per device); tokens are replicated across that
axis (they already are under the framework's tensor-parallel layout, where
activations are replicated over `model` between matmuls). Each device then:

1. routes ALL tokens with the replicated router (so routing decisions are
   identical on every shard — no communication),
2. selects up to `capacity` token-slot rows destined to its LOCAL experts
   (static shape: capacity = ceil(N·k / P · capacity_factor)), via one
   argsort that ranks local rows first, grouped by expert,
3. runs the same grouped-matmul FFN as the single-device ragged path over
   those rows only — per-device FLOPs ≈ routed work / P,
4. scatter-adds its weighted outputs back to token order and `psum`s across
   the axis.

Because tokens are replicated, no all-to-all is needed — the psum IS the
combine. Rows beyond capacity are dropped (standard MoE capacity-overflow
semantics); `capacity_factor=None` sizes capacity at N·k (no drops ever,
exact parity with the single-device path — the tests' setting).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.moe import _act, router_topk
from .mesh import MODEL_AXIS

Array = jax.Array


def _local_moe(moe: Dict[str, Array], x2: Array, cfg, capacity: int,
               axis: str) -> Array:
    """Per-shard body: route all tokens, keep rows for local experts only."""
    n, h = x2.shape
    k = cfg.num_experts_per_tok
    e_local = moe["w_gate"].shape[0]
    base = jax.lax.axis_index(axis) * e_local

    w, ids = router_topk(x2, moe["gate"], k)          # replicated routing
    flat_ids = ids.reshape(-1)                        # [N*k]
    flat_w = w.reshape(-1)
    token_of = jnp.arange(n * k) // k
    local = (flat_ids >= base) & (flat_ids < base + e_local)

    # Rank: local rows first, grouped by (local) expert id; non-local rows
    # sort to the back and fall off the static `capacity` window.
    local_e = jnp.where(local, flat_ids - base, e_local)  # e_local = "none"
    order = jnp.argsort(local_e)                      # stable
    keep = order[:capacity]
    keep_e = local_e[keep]                            # [C], e_local ⇒ dropped
    keep_valid = keep_e < e_local
    xs = jnp.where(keep_valid[:, None], x2[token_of[keep]], 0)

    group_sizes = jnp.bincount(jnp.where(keep_valid, keep_e, e_local),
                               length=e_local + 1)[:e_local].astype(jnp.int32)
    h1 = jax.lax.ragged_dot(xs, moe["w_gate"], group_sizes)
    h2 = jax.lax.ragged_dot(xs, moe["w_up"], group_sizes)
    ys = jax.lax.ragged_dot(_act(h1, cfg.hidden_act) * h2, moe["w_down"],
                            group_sizes)              # [C, H]

    weight = jnp.where(keep_valid, flat_w[keep], 0.0).astype(ys.dtype)
    out = jnp.zeros((n, h), ys.dtype)
    out = out.at[token_of[keep]].add(ys * weight[:, None])
    return jax.lax.psum(out, axis)


def ep_moe_mlp(moe: Dict[str, Array], x: Array, cfg, mesh: Mesh,
               capacity_factor: Optional[float] = None,
               axis: str = MODEL_AXIS) -> Array:
    """Expert-parallel MoE MLP.

    Args:
      moe: expert weights, sharded P(model, None, None) on the expert axis
        (parallel.sharding.param_specs); `gate` replicated.
      x: [..., H] hidden states, replicated over `axis`.
      capacity_factor: per-device row budget multiplier over the balanced
        load N·k/P. None → capacity = N·k (lossless; exact parity with the
        single-device path).

    Returns [..., H] in x.dtype, fully replicated over `axis`.
    """
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    n = x2.shape[0]
    k = cfg.num_experts_per_tok
    p = mesh.shape[axis]
    if capacity_factor is None:
        capacity = n * k
    else:
        capacity = min(n * k, int(-(-n * k * capacity_factor // p)))

    fn = jax.shard_map(
        functools.partial(_local_moe, cfg=cfg, capacity=capacity, axis=axis),
        mesh=mesh,
        in_specs=({"gate": P(), "w_gate": P(axis), "w_up": P(axis),
                   "w_down": P(axis)}, P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(moe, x2).reshape(shape).astype(x.dtype)
