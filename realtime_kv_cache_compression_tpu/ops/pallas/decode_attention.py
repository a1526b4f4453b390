"""Fused mixed-precision dequant + attention decode kernel (Pallas TPU).

SURVEY.md §7.3 hard part #2: decode attention reads the bit-packed tier
pools (8/4/2-bit codes with per-token/group scales), the quantized decode
pool, and the uncompressed recent ring, dequantizing *inside* the kernel —
codes stream HBM→VMEM at their packed width, so HBM traffic is cut by the
same factor as storage. The reference has no counterpart (it fake-quantized
fp16 tensors and ran eager torch attention, modified_llama.py:125-142).

ONE pallas_call per layer per step (VERDICT round-1 item #4): the grid is
(batch, kv_head, segment), where segments walk every pool in order —
HIGH | MID | LOW tiers (one segment per packing chunk), decode-pool blocks,
then the recent ring. The online-softmax state (m, l, acc) lives in VMEM
scratch across the segment dimension ("arbitrary" semantics), and Pallas
pipelines each segment's HBM→VMEM block DMA against the previous segment's
compute (double buffering for free). Per-entry index maps clamp outside
their segment range, so no redundant DMA is issued (an unchanged block
index skips the fetch).

Layout contract (ops/quantization.py): codes are chunk-strided token-packed
— within each `pack_chunk_tokens` chunk, token j*R + r lives in byte row r
at bit offset j*bits — so a segment (= one chunk) unpacks with pure
shift + mask + sublane concat, and its scales/positions are CONTIGUOUS
slices (the reason for chunked packing). Scales/zps are per
(token, kv-head, group); group scales expand to channels in-kernel via a
broadcast + minor-dim reshape.

Masking contract: the caller folds validity into positions (invalid slot →
position 2^30); the kernel's only mask is position <= query position.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

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


def _expand_groups(scale, n_tokens: int, d: int):
    """[N, G] per-group params → [N, D] per-channel (G groups of D/G).

    Mosaic rejects the broadcast+minor-dim-reshape spelling, so the
    expansion is a dot with an iota-built 0/1 selection matrix
    E[g, ch] = (ch // gs == g) — a tiny [N, G] x [G, D] MXU matmul that
    always lowers.
    """
    g = scale.shape[-1]
    if g == 1:
        return jnp.broadcast_to(scale, (n_tokens, d))
    gs = d // g
    col_group = jax.lax.broadcasted_iota(jnp.int32, (g, d), 1) // gs
    row = jax.lax.broadcasted_iota(jnp.int32, (g, d), 0)
    expand = (col_group == row).astype(jnp.float32)
    return jax.lax.dot(scale.astype(jnp.float32), expand,
                       preferred_element_type=jnp.float32)


def _unpack_dequant(stored, scale, zp, bits, n_tokens, d, w=1):
    """[R, D] packed (or [N, D] raw) → [N, D] float32 values.

    `w` = packing chunks in this segment: sub-byte rows unpack per chunk
    (static slices + sublane concat — chunked-strided layout contract)."""
    if bits == 16:
        return stored.astype(jnp.float32)
    p = _bytes_to_i32(stored)
    if bits == 8:
        codes = p.astype(jnp.float32)
    else:
        per_byte = 8 // bits
        mask = 2 ** bits - 1
        if w == 1:
            parts = [((p >> (j * bits)) & mask) for j in range(per_byte)]
            codes = jnp.concatenate(parts, axis=0)[:n_tokens] \
                .astype(jnp.float32)
        else:
            rows_c = p.shape[0] // w
            chunks = []
            for c in range(w):
                pc = p[c * rows_c:(c + 1) * rows_c]
                chunks.append(jnp.concatenate(
                    [((pc >> (j * bits)) & mask) for j in range(per_byte)],
                    axis=0))
            codes = jnp.concatenate(chunks, axis=0).astype(jnp.float32)
    return ((codes - _expand_groups(zp, n_tokens, d))
            * _expand_groups(scale, n_tokens, d))


class _Entry(NamedTuple):
    """Static metadata for one pool in the segment walk."""

    bits: int
    seg_tokens: int   # tokens per segment (= w packing chunks)
    seg_rows: int     # stored rows per segment
    n_segs: int
    seg_start: int    # first segment index in the global walk
    w: int = 1        # packing chunks per segment


def _decode_kernel(qpos_ref, q_ref, *refs, sm_scale: float,
                   entries: Tuple[_Entry, ...], total_segs: int, d: int,
                   hkv: int, rep: int,
                   m_scr=None, l_scr=None, acc_scr=None):
    """Grid (batch, segment); ALL kv heads process inside one program (a
    static head loop) — v5e has a single TensorCore, so fewer, fatter grid
    steps beat head-level grid parallelism (per-step overhead ~ us)."""
    o_ref = refs[-1]
    refs = refs[:-1]
    seg = pl.program_id(1)

    @pl.when(seg == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    qpos = qpos_ref[0]                           # [1, 1] (broadcasts)

    for e_idx, e in enumerate(entries):
        k_r, v_r, ksc, kzp, vsc, vzp, pos_r = refs[e_idx * 7:e_idx * 7 + 7]

        @pl.when((seg >= e.seg_start) & (seg < e.seg_start + e.n_segs))
        def _run(e=e, k_r=k_r, v_r=v_r, ksc=ksc, kzp=kzp, vsc=vsc, vzp=vzp,
                 pos_r=pos_r):
            pos_ok = pos_r[0] <= qpos            # [1, N] (broadcasts)
            for h in range(hkv):
                rs = slice(h * rep, (h + 1) * rep)
                q = q_ref[0, h].astype(jnp.float32)          # [rep, d]
                k = _unpack_dequant(k_r[0, h], ksc[0, h], kzp[0, h], e.bits,
                                    e.seg_tokens, d, w=e.w)
                v = _unpack_dequant(v_r[0, h], vsc[0, h], vzp[0, h], e.bits,
                                    e.seg_tokens, d, w=e.w)
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * sm_scale  # [rep,N]
                s = jnp.where(pos_ok, s, NEG_INF)
                m_prev = m_scr[rs]
                l_prev = l_scr[rs]
                m_curr = jnp.max(s, axis=1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp(m_prev - m_next)
                p = jnp.exp(s - m_next)
                m_scr[rs] = m_next
                l_scr[rs] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
                acc_scr[rs] = acc_scr[rs] * alpha + jax.lax.dot(
                    p, v.astype(jnp.float32),
                    preferred_element_type=jnp.float32)

    @pl.when(seg == total_segs - 1)
    def _finalize():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o = (acc_scr[...] * l_inv).astype(o_ref.dtype)   # [hkv*rep, d]
        for h in range(hkv):
            o_ref[0, h] = o[h * rep:(h + 1) * rep]


def _tier_entry_arrays(t, bits: int, chunk: Optional[int]):
    """(bits, chunk, arrays) for one TierCache."""
    n = t.capacity
    masked_pos = jnp.where(t.valid, t.positions, POS_SENTINEL)
    return (bits, chunk or n,
            (t.k_stored, t.v_stored, t.k_scale, t.k_zp, t.v_scale, t.v_zp,
             masked_pos))


def fused_decode_attention(
    q: Array,
    cache: CompressedLayerCache,
    recent: RecentCache,
    q_pos: Array,
    cfg: CompressionConfig,
    interpret: Optional[bool] = None,
    pool: Optional[DecodePool] = None,
) -> Array:
    """Decode attention over packed tier pools + decode pool + recent ring.

    Args:
      q: [B, 1, H_q, D] (RoPE'd).
      cache: layer's compressed pools (chunk-packed, see module docstring).
      recent: uncompressed decode-token ring.
      q_pos: [B, 1] int32 current positions.
      cfg: compression config (tier bit widths, pack_chunk_tokens).
      pool: optional quantized decode-token pool (flushed ring blocks).

    Returns: [B, 1, H_q, D] attention output.
    """
    if interpret is None:
        interpret = _interpret_default()
    b, _, hq, d = q.shape
    hkv = recent.k.shape[2]
    n_rep = hq // hkv
    rep = max(n_rep, 8)  # pad query rows to one sublane tile
    sm_scale = 1.0 / (d ** 0.5)

    q_r = q[:, 0].reshape(b, hkv, n_rep, d)
    if rep != n_rep:
        q_r = jnp.pad(q_r, ((0, 0), (0, 0), (0, rep - n_rep), (0, 0)))

    # ---- collect entries: tiers, decode-pool blocks, recent ring ----------
    raw_entries: List[Tuple[int, int, tuple]] = []  # (bits, chunk, arrays)
    for tier, t in zip((HIGH, MID, LOW), cache.tiers):
        if t.capacity == 0:
            continue
        raw_entries.append(_tier_entry_arrays(
            t, cfg.tier_bits(tier), cfg.tier_chunk(t.capacity)))
    if pool is not None and pool.n_blocks:
        masked = jnp.where(pool.valid, pool.positions, POS_SENTINEL)
        raw_entries.append((pool.bits, pool.block_tokens,
                            (pool.k_stored, pool.v_stored, pool.k_scale,
                             pool.k_zp, pool.v_scale, pool.v_zp, masked)))
    if recent.capacity:
        r_mask = jnp.arange(recent.capacity)[None, :] < recent.length[:, None]
        r_pos = jnp.where(r_mask, recent.positions, POS_SENTINEL)
        g = recent.k.shape[-1] // (cfg.quant_group_size or recent.k.shape[-1])
        ones = jnp.ones((b, recent.capacity, hkv, g), jnp.float32)
        zeros = jnp.zeros_like(ones)
        raw_entries.append((16, recent.capacity,
                            (recent.k, recent.v, ones, zeros, ones, zeros,
                             r_pos)))

    # ---- build specs: grid walks segments; index maps clamp out of range --
    hm = lambda a: jnp.transpose(a, (0, 2, 1, 3))  # [B,N,H,x] → [B,H,N,x]
    inputs: List[Array] = [q_pos.astype(jnp.int32)[:, :, None], q_r]
    in_specs = [
        pl.BlockSpec((1, 1, 1), lambda bi, si: (bi, 0, 0)),
        pl.BlockSpec((1, hkv, rep, d), lambda bi, si: (bi, 0, 0, 0)),
    ]
    entries: List[_Entry] = []
    seg_cursor = 0
    for bits, chunk, arrays in raw_entries:
        k_s, v_s, ksc, kzp, vsc, vzp, masked_pos = arrays
        n = masked_pos.shape[1]
        n_chunks = n // chunk
        # Group whole chunks per segment up to decode_segment_tokens: fewer
        # grid steps (less per-step overhead, bigger matmuls) at unchanged
        # capacity granularity. Raw (8/16-bit) entries have order-free rows,
        # so any grouping works; sub-byte entries unpack per chunk in-kernel.
        target_w = max(1, cfg.decode_segment_tokens // chunk)
        w = next(x for x in range(min(target_w, n_chunks), 0, -1)
                 if n_chunks % x == 0)
        seg_tokens = w * chunk
        n_segs = n_chunks // w
        rows_total = k_s.shape[1]
        seg_rows = rows_total // n_segs
        e = _Entry(bits=bits, seg_tokens=seg_tokens, seg_rows=seg_rows,
                   n_segs=n_segs, seg_start=seg_cursor, w=w)
        entries.append(e)
        seg_cursor += n_segs

        def idx4(start=e.seg_start, ns=e.n_segs):
            return lambda bi, si: (bi, 0, jnp.clip(si - start, 0, ns - 1), 0)

        gk = ksc.shape[-1]
        for arr, blk, imap in (
            (hm(k_s), (1, hkv, seg_rows, d), idx4()),
            (hm(v_s), (1, hkv, seg_rows, d), idx4()),
            (hm(ksc), (1, hkv, seg_tokens, gk), idx4()),
            (hm(kzp), (1, hkv, seg_tokens, gk), idx4()),
            (hm(vsc), (1, hkv, seg_tokens, gk), idx4()),
            (hm(vzp), (1, hkv, seg_tokens, gk), idx4()),
        ):
            inputs.append(arr)
            in_specs.append(pl.BlockSpec(blk, imap))
        inputs.append(masked_pos[:, None, :])
        in_specs.append(pl.BlockSpec(
            (1, 1, seg_tokens),
            (lambda start, ns: lambda bi, si:
             (bi, 0, jnp.clip(si - start, 0, ns - 1)))(e.seg_start,
                                                       e.n_segs)))

    total_segs = seg_cursor
    kernel = functools.partial(
        _decode_kernel, sm_scale=sm_scale, entries=tuple(entries),
        total_segs=total_segs, d=d, hkv=hkv, rep=rep)

    def kernel_with_scratch(*args):
        *io, m_scr, l_scr, acc_scr = args
        return kernel(*io, m_scr=m_scr, l_scr=l_scr, acc_scr=acc_scr)

    out = pl.pallas_call(
        kernel_with_scratch,
        grid=(b, total_segs),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hkv, rep, d),
                               lambda bi, si: (bi, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hkv, rep, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((hkv * rep, 1), jnp.float32),
            pltpu.VMEM((hkv * rep, 1), jnp.float32),
            pltpu.VMEM((hkv * rep, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*inputs)
    out = out[:, :, :n_rep, :].reshape(b, 1, hq, d)
    return out


# Backwards-compatible alias: the single-launch kernel is segment-walking
# (VMEM-safe at any context length) by construction.
def fused_decode_attention_segmented(q, cache, recent, q_pos, cfg,
                                     interpret=None, segment_tokens=None,
                                     pool=None):
    del segment_tokens  # segments are the packing chunks now
    return fused_decode_attention(q, cache, recent, q_pos, cfg,
                                  interpret=interpret, pool=pool)
