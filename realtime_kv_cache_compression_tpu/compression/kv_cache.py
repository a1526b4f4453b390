"""Mixed-precision compressed KV-cache containers (pytrees).

TPU-native replacement for the reference's `CompressedKVCache` dict-of-layers
container (/root/reference/src/models/compression_layers.py:7-45): statically
shaped, physically bit-packed, tier-contiguous, and carrying original token
positions so decode attention is exact w.r.t. RoPE and causality.

Layout per layer: three tier pools (HIGH, MID, LOW), each a `TierCache` with
static slot capacity. Within a pool, K/V codes are packed sub-byte along the
token axis (see ops/quantization.py) and per-(token, kv-head, group) scales
ride alongside. Decode attends over the three pools plus an uncompressed
"recent" ring of decode-time tokens.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TierCache:
    """One precision tier's packed K/V pool.

    Shapes (B = batch, N = static tier capacity, H = kv heads, D = head_dim,
    G = scale groups per head):
      k_stored / v_stored: [B, ceil(N / (8/bits)), H, D] uint8 — codes
          strided-packed sub-byte along the *token* axis (kernel-friendly:
          unpack is shift + mask + sublane concat, no lane movement) — for
          bits < 16, else [B, N, H, D] bf16 raw.
      k_scale / k_zp / v_scale / v_zp: [B, N, H, G] float32.
      positions: [B, N] int32 original token positions (for RoPE/causality).
      valid: [B, N] bool slot-occupancy mask.
    """

    k_stored: Array
    v_stored: Array
    k_scale: Array
    k_zp: Array
    v_scale: Array
    v_zp: Array
    positions: Array
    valid: Array

    @property
    def capacity(self) -> int:
        return self.positions.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CompressedLayerCache:
    """All tiers of one layer, ordered (HIGH, MID, LOW)."""

    tiers: Tuple[TierCache, TierCache, TierCache]

    @property
    def capacity(self) -> int:
        return sum(t.capacity for t in self.tiers)

    def valid_count(self) -> Array:
        """[B] number of live compressed tokens."""
        return sum(t.valid.sum(axis=-1) for t in self.tiers)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RecentCache:
    """Uncompressed ring of decode-time K/V tokens appended after prefill.

    k/v: [B, M, H, D] in model dtype; positions: [B, M]; `length`: [B] live
    count (tokens are appended in order, so slot i is valid iff i < length).
    """

    k: Array
    v: Array
    positions: Array
    length: Array

    @property
    def capacity(self) -> int:
        return self.k.shape[1]


def init_recent_cache(batch: int, max_decode_len: int, model_cfg: ModelConfig,
                      dtype=None) -> RecentCache:
    dtype = dtype or jnp.dtype(model_cfg.dtype)
    h, d = model_cfg.num_kv_heads, model_cfg.head_dim
    return RecentCache(
        k=jnp.zeros((batch, max_decode_len, h, d), dtype),
        v=jnp.zeros((batch, max_decode_len, h, d), dtype),
        positions=jnp.zeros((batch, max_decode_len), jnp.int32),
        length=jnp.zeros((batch,), jnp.int32),
    )


def append_recent(cache: RecentCache, k_new: Array, v_new: Array,
                  pos_new: Array) -> RecentCache:
    """Append one decode step's K/V ([B, 1, H, D]) into the ring.

    A full ring (length == capacity) DROPS the append and keeps length
    capped — never silently overwriting the last slot (JAX clamps
    out-of-range scatter indices) while the validity mask claims it's the
    new token. Model decode never hits this: `decode_step` flushes the ring
    into the quantized decode pool before it fills (see flush_recent).
    """
    b = jnp.arange(cache.k.shape[0])
    cap = cache.capacity
    full = cache.length >= cap  # [B]
    idx = jnp.minimum(cache.length, cap - 1)
    sel = lambda new, old: jnp.where(full[:, None, None], old, new)
    return RecentCache(
        k=cache.k.at[b, idx].set(sel(k_new[:, 0], cache.k[b, idx])),
        v=cache.v.at[b, idx].set(sel(v_new[:, 0], cache.v[b, idx])),
        positions=cache.positions.at[b, idx].set(
            jnp.where(full, cache.positions[b, idx], pos_new[:, 0])),
        length=jnp.minimum(cache.length + 1, cap),
    )


def cache_storage_bytes(cache: CompressedLayerCache) -> int:
    """Physical bytes held by the layer's compressed pools (static)."""
    total = 0
    for t in cache.tiers:
        for arr in (t.k_stored, t.v_stored, t.k_scale, t.k_zp, t.v_scale,
                    t.v_zp, t.positions, t.valid):
            total += arr.size * arr.dtype.itemsize
    return total


def uncompressed_kv_bytes(batch: int, seq_len: int, model_cfg: ModelConfig,
                          bytes_per_el: int = 2) -> int:
    """Bytes a vanilla bf16 KV cache would hold for the same tokens."""
    return 2 * batch * seq_len * model_cfg.num_kv_heads * model_cfg.head_dim * bytes_per_el


def layer_cache_report(cache: CompressedLayerCache, batch: int, seq_len: int,
                       model_cfg: ModelConfig) -> Dict[str, float]:
    """Real allocated-storage compression accounting for one layer."""
    compressed = cache_storage_bytes(cache)
    original = uncompressed_kv_bytes(batch, seq_len, model_cfg)
    return {
        "compressed_bytes": compressed,
        "original_bytes": original,
        "allocated_ratio": compressed / original,
        "allocated_savings": 1.0 - compressed / original,
    }
