"""Fused mixed-precision dequant + attention decode kernel (Pallas TPU).

SURVEY.md §7.3 hard part #2: decode attention reads the bit-packed tier
pools (8/4/2-bit codes with per-token scales) and the uncompressed recent
ring, dequantizing *inside* the kernel — codes stream HBM→VMEM at their
packed width, so HBM traffic is cut by the same factor as storage. The
reference has no counterpart (it fake-quantized fp16 tensors and ran eager
torch attention, modified_llama.py:125-142).

Layout contract (ops/quantization.py): codes are strided token-packed —
token j*R + r lives in byte row r at bit offset j*bits — so in-kernel
unpacking is shift + mask + concat along sublanes, with no data movement
across lanes. Scales/zps are per (token, kv-head) (quant_group_size ∈
{0, head_dim}).

Masking contract: the caller folds validity into positions (invalid slot →
position 2^30), so the kernel's only mask is position <= query position.

Grid: (batch, kv_head). Per program: all pools + the recent ring fit VMEM at
decode-relevant sizes (≤ ~8K compressed slots); each tier is one
dequant → QK^T → online-softmax → PV chain on the MXU/VPU.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...compression.kv_cache import (CompressedLayerCache, DecodePool,
                                     RecentCache)
from ...config import HIGH, LOW, MID, CompressionConfig

Array = jax.Array

NEG_INF = -1e30
POS_SENTINEL = 1 << 30


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _bytes_to_i32(stored):
    """uint8 bytes → int32 in [0, 255]. Mosaic has no uint8→f32/i32 cast, so
    bitcast to int8 (free), sign-extend to int32, and mask back."""
    return pltpu.bitcast(stored, jnp.int8).astype(jnp.int32) & 0xFF


def _unpack_dequant(stored, scale, zp, bits, n_tokens):
    """[R, D] packed (or [N, D] raw) → [N, D] float32 values."""
    if bits == 16:
        return stored.astype(jnp.float32)
    p = _bytes_to_i32(stored)
    if bits == 8:
        codes = p.astype(jnp.float32)
    else:
        per_byte = 8 // bits
        mask = 2 ** bits - 1
        parts = [((p >> (j * bits)) & mask) for j in range(per_byte)]
        codes = jnp.concatenate(parts, axis=0)[:n_tokens].astype(jnp.float32)
    return (codes - zp) * scale


def _decode_kernel(qpos_ref, q_ref, *refs, sm_scale: float,
                   tier_meta: Tuple[Tuple[int, int], ...], recent_cap: int):
    """refs layout: per tier (k_stored, v_stored, k_scale, k_zp, v_scale,
    v_zp, positions) ... then recent (k, v, positions), then out_ref last."""
    o_ref = refs[-1]
    refs = refs[:-1]
    q = q_ref[0, 0].astype(jnp.float32)          # [rep, d]
    qpos = qpos_ref[0]                           # [1, 1] (broadcasts)

    rep, d = q.shape
    m = jnp.full((rep, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((rep, 1), jnp.float32)
    acc = jnp.zeros((rep, d), jnp.float32)

    idx = 0
    blocks = []
    for n_tokens, bits in tier_meta:
        k_s, v_s, k_sc, k_zp, v_sc, v_zp, pos = refs[idx:idx + 7]
        idx += 7
        k = _unpack_dequant(k_s[0, 0], k_sc[0, 0], k_zp[0, 0], bits, n_tokens)
        v = _unpack_dequant(v_s[0, 0], v_sc[0, 0], v_zp[0, 0], bits, n_tokens)
        blocks.append((k, v, pos[0]))            # pos: [1, N]
    if recent_cap:
        rk, rv, rpos = refs[idx:idx + 3]
        blocks.append((rk[0, 0].astype(jnp.float32),
                       rv[0, 0].astype(jnp.float32), rpos[0]))

    for k, v, pos in blocks:
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(pos <= qpos, s, NEG_INF)   # [rep, N] via [1, N] bcast
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l = alpha * l + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot(p, v,
                                        preferred_element_type=jnp.float32)
        m = m_next

    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (acc * l_inv).astype(o_ref.dtype)


def _segment_kernel(qpos_ref, q_ref, m_ref, l_ref, acc_ref,
                    k_ref, v_ref, k_sc, k_zp, v_sc, v_zp, pos_ref,
                    m_out, l_out, acc_out,
                    *, sm_scale: float, bits: int, n_tokens: int):
    """One pool segment's online-softmax update; state flows between calls.

    Shapes per (b, h) program: q [rep, d]; m/l [rep, 1]; acc [rep, d];
    k/v packed [R, d]; scales [n, 1]; pos [1, n].
    """
    q = q_ref[0, 0].astype(jnp.float32)
    qpos = qpos_ref[0]
    m_prev = m_ref[0, 0]
    l_prev = l_ref[0, 0]
    acc_prev = acc_ref[0, 0]

    k = _unpack_dequant(k_ref[0, 0], k_sc[0, 0], k_zp[0, 0], bits, n_tokens)
    v = _unpack_dequant(v_ref[0, 0], v_sc[0, 0], v_zp[0, 0], bits, n_tokens)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    s = jnp.where(pos_ref[0] <= qpos, s, NEG_INF)
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    m_out[0, 0] = m_next
    l_out[0, 0] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    acc_out[0, 0] = acc_prev * alpha + jax.lax.dot(
        p, v, preferred_element_type=jnp.float32)


def _run_segment(state, qpos3, q_r, k_s, v_s, k_sc, k_zp, v_sc, v_zp,
                 masked_pos, bits, n_tokens, sm_scale, interpret):
    """Apply one segment update across the (B, Hkv) grid."""
    m, l, acc = state
    b, hkv, rep, d = q_r.shape
    spec_bh = lambda blk: pl.BlockSpec(blk, lambda bi, hi: (bi, hi, 0, 0))
    kernel = functools.partial(_segment_kernel, sm_scale=sm_scale, bits=bits,
                               n_tokens=n_tokens)
    rows = k_s.shape[2]
    m, l, acc = pl.pallas_call(
        kernel,
        grid=(b, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda bi, hi: (bi, 0, 0)),
            spec_bh((1, 1, rep, d)),
            spec_bh((1, 1, rep, 1)),
            spec_bh((1, 1, rep, 1)),
            spec_bh((1, 1, rep, d)),
            spec_bh((1, 1, rows, d)),
            spec_bh((1, 1, rows, d)),
            spec_bh((1, 1, n_tokens, 1)),
            spec_bh((1, 1, n_tokens, 1)),
            spec_bh((1, 1, n_tokens, 1)),
            spec_bh((1, 1, n_tokens, 1)),
            pl.BlockSpec((1, 1, n_tokens), lambda bi, hi: (bi, 0, 0)),
        ],
        out_specs=[spec_bh((1, 1, rep, 1)), spec_bh((1, 1, rep, 1)),
                   spec_bh((1, 1, rep, d))],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, rep, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, rep, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, hkv, rep, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(qpos3, q_r, m, l, acc, k_s, v_s, k_sc, k_zp, v_sc, v_zp, masked_pos)
    return m, l, acc


def _pool_blocks(pool: Optional[DecodePool]):
    """Decode-pool blocks as tier-like packed entries:
    (bits, n_tokens, k_rows, v_rows, k_sc, k_zp, v_sc, v_zp, masked_pos)."""
    if pool is None or pool.n_blocks == 0:
        return
    if pool.k_scale.shape[-1] != 1:
        raise NotImplementedError("per-(token, head) scales only")
    r = pool.block_tokens
    rows = pool.k_stored.shape[1] // pool.n_blocks
    masked = jnp.where(pool.valid, pool.positions, POS_SENTINEL)
    for w in range(pool.n_blocks):
        rs = slice(w * rows, (w + 1) * rows)
        ts = slice(w * r, (w + 1) * r)
        yield (pool.bits, r, pool.k_stored[:, rs], pool.v_stored[:, rs],
               pool.k_scale[:, ts], pool.k_zp[:, ts],
               pool.v_scale[:, ts], pool.v_zp[:, ts], masked[:, ts])


def fused_decode_attention_segmented(
    q: Array,
    cache: CompressedLayerCache,
    recent: RecentCache,
    q_pos: Array,
    cfg: CompressionConfig,
    interpret: Optional[bool] = None,
    segment_tokens: int = 4096,
    pool: Optional[DecodePool] = None,
) -> Array:
    """VMEM-safe fused decode: pools processed in <= segment_tokens chunks,
    with the online-softmax state (m, l, acc) carried between pallas calls.
    Handles arbitrarily long compressed caches (32K+ contexts)."""
    if interpret is None:
        interpret = _interpret_default()
    b, _, hq, d = q.shape
    hkv = recent.k.shape[2]
    n_rep = hq // hkv
    rep = max(n_rep, 8)
    sm_scale = 1.0 / (d ** 0.5)

    q_r = q[:, 0].reshape(b, hkv, n_rep, d)
    if rep != n_rep:
        q_r = jnp.pad(q_r, ((0, 0), (0, 0), (0, rep - n_rep), (0, 0)))
    q_r = q_r.astype(jnp.float32)
    qpos3 = q_pos.astype(jnp.int32)[:, :, None]
    hm = lambda a: jnp.transpose(a, (0, 2, 1, 3))

    m = jnp.full((b, hkv, rep, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, hkv, rep, 1), jnp.float32)
    acc = jnp.zeros((b, hkv, rep, d), jnp.float32)
    state = (m, l, acc)

    def row_segments(n_rows, per_byte):
        """Row ranges holding <= segment_tokens tokens each."""
        seg = max(8, (segment_tokens // per_byte // 8) * 8)
        starts = list(range(0, n_rows, seg))
        return [(s, min(seg, n_rows - s)) for s in starts]

    for tier, t in zip((HIGH, MID, LOW), cache.tiers):
        n = t.capacity
        if n == 0:
            continue
        bits = cfg.tier_bits(tier)
        if t.k_scale.shape[-1] != 1:
            raise NotImplementedError("per-(token, head) scales only")
        per_byte = 1 if bits >= 8 else 8 // bits
        if n % per_byte:
            raise NotImplementedError(
                "sub-byte tier capacity must divide 8//bits (slot_align)")
        masked_pos = jnp.where(t.valid, t.positions, POS_SENTINEL)
        k_h, v_h = hm(t.k_stored), hm(t.v_stored)
        ksc, kzp = hm(t.k_scale), hm(t.k_zp)
        vsc, vzp = hm(t.v_scale), hm(t.v_zp)
        total_rows = k_h.shape[2] if bits < 16 else n

        def tok_slice(a, r0, rl, axis):
            """Tokens covered by byte rows [r0, r0+rl): strided packing puts
            token j*R + r in row r at shift j, so gather pb strided ranges
            in unpack order (j-major)."""
            if per_byte == 1:
                return jax.lax.slice_in_dim(a, r0, r0 + rl, axis=axis)
            parts = [jax.lax.slice_in_dim(a, j * total_rows + r0,
                                          j * total_rows + r0 + rl,
                                          axis=axis)
                     for j in range(per_byte)]
            return jnp.concatenate(parts, axis=axis)

        for r0, rl in row_segments(total_rows, per_byte):
            length = rl * per_byte
            state = _run_segment(
                state, qpos3, q_r,
                jax.lax.slice_in_dim(k_h, r0, r0 + rl, axis=2),
                jax.lax.slice_in_dim(v_h, r0, r0 + rl, axis=2),
                tok_slice(ksc, r0, rl, 2), tok_slice(kzp, r0, rl, 2),
                tok_slice(vsc, r0, rl, 2), tok_slice(vzp, r0, rl, 2),
                tok_slice(masked_pos, r0, rl, 1)[:, None, :],
                bits, length, sm_scale, interpret)

    for (p_bits, p_n, pk, pv, pksc, pkzp, pvsc, pvzp, p_pos) in \
            _pool_blocks(pool):
        state = _run_segment(
            state, qpos3, q_r, hm(pk), hm(pv),
            hm(pksc), hm(pkzp), hm(pvsc), hm(pvzp),
            p_pos[:, None, :], p_bits, p_n, sm_scale, interpret)

    if recent.capacity:
        r_mask = jnp.arange(recent.capacity)[None, :] < recent.length[:, None]
        r_pos = jnp.where(r_mask, recent.positions, POS_SENTINEL)
        g = recent.k.shape[-1]  # full head_dim group
        ones = jnp.ones((b, hkv, recent.capacity, 1), jnp.float32)
        zeros = jnp.zeros_like(ones)
        state = _run_segment(
            state, qpos3, q_r, hm(recent.k), hm(recent.v),
            ones, zeros, ones, zeros, r_pos[:, None, :],
            16, recent.capacity, sm_scale, interpret)

    m, l, acc = state
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    out = (acc * l_inv)[:, :, :n_rep, :].reshape(b, 1, hq, d)
    return out.astype(q.dtype)


def fused_decode_attention(
    q: Array,
    cache: CompressedLayerCache,
    recent: RecentCache,
    q_pos: Array,
    cfg: CompressionConfig,
    interpret: Optional[bool] = None,
    pool: Optional[DecodePool] = None,
) -> Array:
    """Decode attention over packed tier pools + recent ring (+ decode pool).

    Args:
      q: [B, 1, H_q, D] (RoPE'd).
      cache: layer's compressed pools.
      recent: uncompressed decode-token ring.
      q_pos: [B, 1] int32 current positions.
      cfg: compression config (tier bit widths).
      pool: optional quantized decode-token pool (flushed ring blocks).

    Returns: [B, 1, H_q, D] attention output.
    """
    if interpret is None:
        interpret = _interpret_default()
    pool_cap = pool.capacity if pool is not None else 0
    if cache.capacity + recent.capacity + pool_cap > 8192:
        # Whole pools would overflow VMEM — use the segmented variant.
        return fused_decode_attention_segmented(q, cache, recent, q_pos, cfg,
                                                interpret=interpret,
                                                pool=pool)
    b, _, hq, d = q.shape
    hkv = recent.k.shape[2]
    n_rep = hq // hkv
    rep = max(n_rep, 8)  # pad query rows to one sublane tile
    sm_scale = 1.0 / (d ** 0.5)

    q_r = q[:, 0].reshape(b, hkv, n_rep, d)
    if rep != n_rep:
        q_r = jnp.pad(q_r, ((0, 0), (0, 0), (0, rep - n_rep), (0, 0)))

    # Batch-varying scalars/vectors get a singleton middle axis so the block
    # equals the array on the last two dims (Mosaic tile rule at B > 1).
    inputs: List[Array] = [q_pos.astype(jnp.int32)[:, :, None], q_r]
    in_specs = [
        pl.BlockSpec((1, 1, 1), lambda bi, hi: (bi, 0, 0)),
        pl.BlockSpec((1, 1, rep, d), lambda bi, hi: (bi, hi, 0, 0)),
    ]
    # Mosaic requires the last two block dims to be tile-aligned or equal to
    # the array dims — so every pooled array goes in head-major [B, H, N, D]
    # (blocks (1, 1, N, D)); the transposes are tiny and fuse into the
    # surrounding program.
    hm = lambda a: jnp.transpose(a, (0, 2, 1, 3))

    tier_meta = []
    for tier, t in zip((HIGH, MID, LOW), cache.tiers):
        n = t.capacity
        if n == 0:
            continue
        bits = cfg.tier_bits(tier)
        if t.k_scale.shape[-1] != 1:
            raise NotImplementedError(
                "fused decode kernel supports per-(token, head) scales "
                "(quant_group_size in {0, head_dim})")
        masked_pos = jnp.where(t.valid, t.positions, POS_SENTINEL)
        tier_meta.append((n, bits))
        rows = t.k_stored.shape[1]
        for arr, blk in (
            (hm(t.k_stored), (1, 1, rows, d)),
            (hm(t.v_stored), (1, 1, rows, d)),
            (hm(t.k_scale), (1, 1, n, 1)),
            (hm(t.k_zp), (1, 1, n, 1)),
            (hm(t.v_scale), (1, 1, n, 1)),
            (hm(t.v_zp), (1, 1, n, 1)),
        ):
            inputs.append(arr)
            in_specs.append(pl.BlockSpec(blk, lambda bi, hi: (bi, hi, 0, 0)))
        inputs.append(masked_pos[:, None, :])
        in_specs.append(pl.BlockSpec((1, 1, masked_pos.shape[1]),
                                     lambda bi, hi: (bi, 0, 0)))

    for (p_bits, p_n, pk, pv, pksc, pkzp, pvsc, pvzp, p_pos) in \
            _pool_blocks(pool):
        tier_meta.append((p_n, p_bits))
        rows = pk.shape[1]
        for arr, blk in (
            (hm(pk), (1, 1, rows, d)),
            (hm(pv), (1, 1, rows, d)),
            (hm(pksc), (1, 1, p_n, 1)),
            (hm(pkzp), (1, 1, p_n, 1)),
            (hm(pvsc), (1, 1, p_n, 1)),
            (hm(pvzp), (1, 1, p_n, 1)),
        ):
            inputs.append(arr)
            in_specs.append(pl.BlockSpec(blk, lambda bi, hi: (bi, hi, 0, 0)))
        inputs.append(p_pos[:, None, :])
        in_specs.append(pl.BlockSpec((1, 1, p_n),
                                     lambda bi, hi: (bi, 0, 0)))

    recent_cap = recent.capacity
    if recent_cap:
        r_mask = jnp.arange(recent_cap)[None, :] < recent.length[:, None]
        r_pos = jnp.where(r_mask, recent.positions, POS_SENTINEL)
        for arr, blk in ((hm(recent.k), (1, 1, recent_cap, d)),
                         (hm(recent.v), (1, 1, recent_cap, d))):
            inputs.append(arr)
            in_specs.append(pl.BlockSpec(blk, lambda bi, hi: (bi, hi, 0, 0)))
        inputs.append(r_pos[:, None, :])
        in_specs.append(pl.BlockSpec((1, 1, recent_cap),
                                     lambda bi, hi: (bi, 0, 0)))

    kernel = functools.partial(_decode_kernel, sm_scale=sm_scale,
                               tier_meta=tuple(tier_meta),
                               recent_cap=recent_cap)
    out = pl.pallas_call(
        kernel,
        grid=(b, hkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, rep, d), lambda bi, hi: (bi, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hkv, rep, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*inputs)
    out = out[:, :, :n_rep, :].reshape(b, 1, hq, d)
    return out
