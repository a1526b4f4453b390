"""Attention ops (pure-JAX / XLA path) with the prompt-mass side-channel.

This module is the XLA-fused baseline implementation; the Pallas kernels in
`ops/pallas/` implement the same contracts blockwise (flash) for the hot path.
Tests cross-check Pallas against these.

Replaces the reference's materialized-attention pipeline
(/root/reference/src/models/modified_llama.py:88-94 computes softmax(QK^T/√d)
as a full [B, H, S, S] tensor; token_importance.py:41-45 then slices prompt
columns). Here the dense path exists for correctness and small shapes only,
and additionally supports GQA (the reference is MHA-only) and exact
position-aware masking over non-contiguous compressed tokens (fixing the
reference's truncated-causal-mask approximation, modified_llama.py:132-134).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1e30


def repeat_kv(x: Array, n_rep: int) -> Array:
    """[B, S, H_kv, D] → [B, S, H_kv * n_rep, D] (GQA head expansion)."""
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(
        b, s, h * n_rep, d)


def prefill_attention_with_prompt_mass(
    q: Array,
    k: Array,
    v: Array,
    prompt_len: int,
    causal: bool = True,
    prompt_lens: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Dense causal attention + prompt attention-mass side-channel.

    Args:
      q: [B, S, H_q, D]; k, v: [B, S, H_kv, D] (H_q % H_kv == 0).
      prompt_len: static prompt prefix length P (upper bound).
      prompt_lens: optional [B] dynamic per-row prompt lengths <= P (ragged
        batches); mass columns beyond a row's prompt are excluded.

    Returns:
      out: [B, S, H_q, D] attention output.
      prompt_mass: [B, S] = mean_h sum_{j<P_b} softmax(qk)[b,h,i,j]
        (token_importance.py:41-45 semantics, GQA-aware).
    """
    b, s, hq, d = q.shape
    n_rep = hq // k.shape[2]
    k = repeat_kv(k, n_rep)
    v = repeat_kv(v, n_rep)
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if causal:
        q_pos = jnp.arange(s)[:, None]
        k_pos = jnp.arange(s)[None, :]
        logits = jnp.where((k_pos <= q_pos)[None, None], logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)
    prompt_probs = attn[:, :, :, :prompt_len]
    if prompt_lens is not None:
        col = jnp.arange(prompt_len)[None, None, None, :]
        prompt_probs = jnp.where(col < prompt_lens[:, None, None, None],
                                 prompt_probs, 0.0)
    prompt_mass = prompt_probs.mean(axis=1).sum(axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return out.astype(q.dtype), prompt_mass


def query_attention_mass(
    q: Array,
    k: Array,
    window: int,
    lengths: Optional[Array] = None,
    pool: int = 0,
) -> Array:
    """Observation-window mass: attention each key RECEIVES from the last
    `window` prefill queries (SnapKV/H2O-style; config.importance_source
    "query"/"both").

    The reference's prompt-mass term scores token i by what i *gives* the
    prompt region (token_importance.py:21-47); this is the transpose notion
    — what token i *gets* from the trailing queries — which is the signal
    that finds content planted at mid-context depth (retrieval heads at the
    question positions point at the span they need).

    Args:
      q: [B, S, H_q, D] RoPE'd queries; k: [B, S, H_kv, D] RoPE'd keys.
      window: static W — the last W (valid) query rows form the window.
      lengths: optional [B] true lengths for ragged right-padded batches;
        each row's window then ends at its true length.
      pool: optional max-pool width over key positions (dilates sharp
        retrieval hits across their span; 0/1 disables).

    Returns:
      [B, S] float32 — mean over heads, sum over window rows of
      softmax(q_w k^T / sqrt(d)) per key column. Rows sum to <= W.
    """
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    n_rep = hq // hkv
    w = min(window, s)
    if lengths is None:
        q_w = q[:, s - w:]
        q_pos = jnp.broadcast_to(jnp.arange(s - w, s)[None], (b, w))
        row_ok = jnp.ones((b, w), bool)
        key_ok = jnp.ones((b, s), bool)
    else:
        # Per-row window [len - w, len): gather (clipped) query rows; rows
        # before position 0 (len < w) are masked out of the sum.
        idx = lengths[:, None] - w + jnp.arange(w)[None, :]  # [B, w]
        row_ok = idx >= 0
        idx = jnp.clip(idx, 0, s - 1)
        q_w = jnp.take_along_axis(q, idx[:, :, None, None], axis=1)
        q_pos = idx
        key_ok = jnp.arange(s)[None, :] < lengths[:, None]
    return window_attention_mass(q_w, q_pos, row_ok, k, key_ok, pool=pool)


def window_attention_mass(
    q_w: Array,
    q_pos: Array,
    row_ok: Array,
    k: Array,
    key_ok: Array,
    pool: int = 0,
) -> Array:
    """Core of `query_attention_mass` over an already-gathered query window
    (the chunked-prefill path buffers the window's q rows across chunks and
    calls this at finish).

    Args:
      q_w: [B, W, H_q, D] window queries; q_pos: [B, W] their positions.
      row_ok: [B, W] bool — window rows that exist (lengths >= offset).
      k: [B, S, H_kv, D] full keys; key_ok: [B, S] bool validity.
      pool: optional max-pool width over key positions.
    """
    b, w, hq, d = q_w.shape
    s = k.shape[1]
    hkv = k.shape[2]
    n_rep = hq // hkv
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    q5 = q_w.reshape(b, w, hkv, n_rep, d)
    logits = jnp.einsum("bqhrd,bkhd->bhrqk", q5.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    mask = key_ok[:, None, :] & (jnp.arange(s)[None, None, :]
                                 <= q_pos[:, :, None])        # [B, w, S]
    logits = jnp.where(mask[:, None, None], logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)                    # [B,h,r,w,S]
    attn = jnp.where(row_ok[:, None, None, :, None], attn, 0.0)
    mass = attn.mean(axis=(1, 2)).sum(axis=1)                 # [B, S]
    if pool and pool > 1:
        mass = jax.lax.reduce_window(
            mass, -jnp.inf, jax.lax.max, (1, pool), (1, 1), "SAME")
        mass = jnp.where(key_ok, mass, 0.0)  # no bleed into padding
    return mass


def positioned_attention_with_prompt_mass(
    q: Array,
    k: Array,
    v: Array,
    k_positions: Array,
    k_valid: Array,
    q_positions: Array,
    prompt_len: int,
    prompt_lens: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Attention of chunk queries over an arbitrary POSITIONED token set,
    with the per-query prompt-mass side-channel.

    The compressed-prefix chunked-prefill core (dense/XLA reference; the
    flash form is ops/pallas/flash_prefill.flash_positioned_attention):
    chunk t's queries attend over {compressed pools of chunks < t} ++
    {current chunk's K/V} concatenated — keys carry explicit global
    positions, so causality (k_pos <= q_pos, invalid slots masked) and the
    prompt-column indicator (k_pos < prompt_len) work over non-contiguous
    survivors exactly. This is how compression REDUCES prefill attention
    work (BASELINE.md "TTFT improved by compression"): later chunks attend
    over kept*S_prefix tokens instead of S_prefix.

    Args:
      q: [B, c, H_q, D] chunk queries (RoPE'd at q_positions).
      k, v: [B, N, H_kv, D] token set (pool slots ++ current chunk).
      k_positions: [B, N] int32 global positions; k_valid: [B, N] bool.
      q_positions: [B, c] int32 global query positions.
      prompt_len: static prompt prefix bound; prompt_lens: optional [B]
        dynamic per-row prompt lengths.

    Returns:
      (out [B, c, H_q, D], prompt_mass [B, c] float32 — head-averaged
      row mass over prompt columns, `prompt_attention_mass` semantics).
    """
    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    n_rep = hq // hkv
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    q5 = q.reshape(b, sq, hkv, n_rep, d)
    logits = jnp.einsum("bqhrd,bkhd->bhrqk", q5, k,
                        preferred_element_type=jnp.float32) * scale
    mask = k_valid[:, None, :] & (k_positions[:, None, :]
                                  <= q_positions[:, :, None])  # [B, c, N]
    logits = jnp.where(mask[:, None, None], logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)                # [B,h,r,c,N]
    plens = (prompt_lens.astype(jnp.int32)[:, None] if prompt_lens is not None
             else jnp.full((b, 1), prompt_len, jnp.int32))
    is_prompt = (k_positions < plens) & k_valid           # [B, N]
    pmass = jnp.where(is_prompt[:, None, None, None], attn, 0.0)
    prompt_mass = pmass.sum(axis=-1).mean(axis=(1, 2))    # [B, c]
    out = jnp.einsum("bhrqk,bkhd->bqhrd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    any_valid = mask.any(axis=-1)                         # [B, c]
    out = jnp.where(any_valid[:, :, None, None, None], out, 0.0)
    return (out.reshape(b, sq, hq, d).astype(q.dtype),
            jnp.where(any_valid, prompt_mass, 0.0))


def sharded_window_attention_mass(
    q_w: Array,
    q_pos: Array,
    row_ok: Array,
    k: Array,
    key_pos: Array,
    key_ok: Array,
    axis_name: str,
    n_shards: int,
    pool: int = 0,
) -> Array:
    """`window_attention_mass` with the KEY axis sharded over `axis_name`.

    Called inside shard_map: the observation window (q_w/q_pos/row_ok,
    replicated — seq_parallel gathers it with one small psum) attends over
    this shard's local keys, with the softmax normalized GLOBALLY: the row
    max is pmax'd and the denominator psum'd over the axis, so the returned
    local [B, S_loc] mass equals the single-device call's slice to float
    tolerance (VERDICT r4 item 3 — query-guided importance under sequence
    parallelism).

    Args:
      q_w: [B, W, H_q, D] window queries (replicated).
      q_pos: [B, W] global window positions; row_ok: [B, W].
      k: [B, S_loc, H_kv, D] this shard's keys.
      key_pos: [B, S_loc] GLOBAL positions of local keys; key_ok: validity.
      axis_name, n_shards: the sequence mesh axis.
      pool: max-pool width; cross-shard dilation is exact via a ppermute
        halo exchange (requires pool <= S_loc; global-edge halos use 0,
        equivalent to the single-device -inf padding since mass >= 0).
    """
    b, w, hq, d = q_w.shape
    s_loc = k.shape[1]
    hkv = k.shape[2]
    n_rep = hq // hkv
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    q5 = q_w.reshape(b, w, hkv, n_rep, d)
    logits = jnp.einsum("bqhrd,bkhd->bhrqk", q5.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    mask = key_ok[:, None, :] & (key_pos[:, None, :]
                                 <= q_pos[:, :, None])        # [B, W, S_loc]
    logits = jnp.where(mask[:, None, None], logits, NEG_INF)
    row_max = jax.lax.pmax(logits.max(axis=-1), axis_name)    # [B,h,r,W]
    num = jnp.where(mask[:, None, None],
                    jnp.exp(logits - row_max[..., None]), 0.0)
    denom = jax.lax.psum(num.sum(axis=-1), axis_name)         # [B,h,r,W]
    attn = num / jnp.maximum(denom, 1e-30)[..., None]
    attn = jnp.where(row_ok[:, None, None, :, None], attn, 0.0)
    mass = attn.mean(axis=(1, 2)).sum(axis=1)                 # [B, S_loc]
    if pool and pool > 1:
        hl, hr = (pool - 1) // 2, pool // 2                   # SAME split
        if max(hl, hr) > s_loc:
            raise ValueError(
                f"query_mass_pool {pool} needs halo <= tokens/shard "
                f"({s_loc}); shrink the pool or use fewer shards")
        parts = []
        if hl:
            # Left halo: left neighbor's last hl columns (shard 0 gets
            # zeros — equivalent to -inf padding for non-negative mass).
            parts.append(jax.lax.ppermute(
                mass[:, -hl:], axis_name,
                [(i, i + 1) for i in range(n_shards - 1)]))
        parts.append(mass)
        if hr:
            parts.append(jax.lax.ppermute(
                mass[:, :hr], axis_name,
                [(i + 1, i) for i in range(n_shards - 1)]))
        padded = jnp.concatenate(parts, axis=1)
        mass = jax.lax.reduce_window(
            padded, -jnp.inf, jax.lax.max, (1, pool), (1, 1), "VALID")
        mass = jnp.where(key_ok, mass, 0.0)
    return mass


def attention_over_tokens(
    q: Array,
    k: Array,
    v: Array,
    k_positions: Array,
    k_valid: Array,
    q_positions: Array,
    sink: bool = False,
) -> Array:
    """Attention of queries over an arbitrary (gathered/compressed) token set.

    Masking is exact: key j participates for query i iff it is a live slot and
    k_positions[j] <= q_positions[i] — true causality over non-contiguous
    survivors, unlike the reference's truncated mask.

    Args:
      q: [B, Sq, H_q, D] queries (already RoPE'd at q_positions).
      k, v: [B, N, H_kv, D] token set (already RoPE'd at k_positions).
      k_positions: [B, N] int32; k_valid: [B, N] bool.
      q_positions: [B, Sq] int32.

    Returns:
      [B, Sq, H_q, D] attention output.
    """
    b, sq, hq, d = q.shape
    hkv = k.shape[2]
    n_rep = hq // hkv
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    # Grouped-query einsum: K/V stay at H_kv heads — never materialize the
    # n_rep-repeated copies (at 32K context that repetition alone is GBs of
    # HBM traffic per decode step). bf16 operands, f32 accumulation.
    q5 = q.reshape(b, sq, hkv, n_rep, d)
    logits = jnp.einsum("bqhrd,bkhd->bhrqk", q5, k,
                        preferred_element_type=jnp.float32) * scale
    mask = k_valid[:, None, :] & (k_positions[:, None, :]
                                  <= q_positions[:, :, None])  # [B, Sq, N]
    logits = jnp.where(mask[:, None, None], logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhrqk,bkhd->bqhrd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    # Guard fully-masked rows (no valid keys): output zeros, not NaNs.
    any_valid = mask.any(axis=-1)[:, :, None, None, None]  # [B, Sq, 1, 1, 1]
    out = jnp.where(any_valid, out, 0.0)
    return out.reshape(b, sq, hq, d).astype(q.dtype)


def chunk_attention_with_prompt_mass(
    q: Array,
    k_buf: Array,
    v_buf: Array,
    q_offset: Array,
    prompt_len: int,
    prompt_lens: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Rectangular causal attention of one prefill CHUNK over the KV buffer.

    The chunked-prefill building block (models.llama.prefill_chunked_step):
    queries are the chunk's tokens at positions q_offset..q_offset+c-1; keys
    are the position-ordered prefill buffer [B, S, ...] whose rows past the
    current fill are excluded by causality (they hold later positions).
    Per-row softmax is identical to full-sequence causal attention, so the
    emitted prompt mass matches `prefill_attention_with_prompt_mass` exactly
    (token_importance.py:41-45 semantics, GQA-aware).

    Args:
      q: [B, c, H_q, D] chunk queries (already RoPE'd).
      k_buf, v_buf: [B, S, H_kv, D] buffers with this chunk already written.
      q_offset: scalar int32 — position of the chunk's first token (traced).
      prompt_len: static prompt prefix length P.
      prompt_lens: optional [B] dynamic per-row prompt lengths <= P.

    Returns (out [B, c, H_q, D], prompt_mass [B, c]).
    """
    b, c, hq, d = q.shape
    s = k_buf.shape[1]
    hkv = k_buf.shape[2]
    n_rep = hq // hkv
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    q5 = q.reshape(b, c, hkv, n_rep, d)
    logits = jnp.einsum("bqhrd,bkhd->bhrqk", q5, k_buf,
                        preferred_element_type=jnp.float32) * scale
    q_pos = q_offset + jnp.arange(c)
    mask = jnp.arange(s)[None, :] <= q_pos[:, None]          # [c, S]
    logits = jnp.where(mask[None, None, None], logits, NEG_INF)
    attn = jax.nn.softmax(logits, axis=-1)                   # [B,h,r,c,S]
    prompt_probs = attn[..., :prompt_len]
    if prompt_lens is not None:
        col = jnp.arange(prompt_len)[None, None, None, None, :]
        prompt_probs = jnp.where(
            col < prompt_lens[:, None, None, None, None], prompt_probs, 0.0)
    prompt_mass = prompt_probs.sum(axis=-1).mean(axis=(1, 2))  # [B, c]
    out = jnp.einsum("bhrqk,bkhd->bqhrd", attn.astype(v_buf.dtype), v_buf,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, c, hq, d).astype(q.dtype), prompt_mass
