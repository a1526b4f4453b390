"""Fused mixed-precision dequant + attention decode kernel (Pallas TPU).

SURVEY.md §7.3 hard part #2: decode attention reads the bit-packed tier
pools (8/4/2-bit codes with per-token/group scales), the quantized decode
pool, and the uncompressed recent ring, dequantizing *inside* the kernel —
codes stream HBM→VMEM at their packed width, so HBM traffic is cut by the
same factor as storage. The reference has no counterpart (it fake-quantized
fp16 tensors and ran eager torch attention, modified_llama.py:125-142).

ONE pallas_call per layer per step (VERDICT round-1 item #4): the grid is
(batch, segment), where segments walk every pool in order — HIGH | MID |
LOW tiers (grouped packing chunks), decode-pool blocks, then the recent
ring — and all kv heads process inside one program (v5e has one TensorCore;
fewer, fatter grid steps beat head-level grid parallelism). The online-
softmax state (m, l, acc) lives in VMEM scratch across the segment
dimension ("arbitrary" semantics), and Pallas pipelines each segment's
HBM→VMEM block DMA against the previous segment's compute.

VMEM discipline (why the layouts look the way they do):
  * Scale/zp tensors ride in ONE lane-major block per pool,
    [B, H_kv, 4G, N] (rows = ksc|kzp|vsc|vzp groups, lanes = tokens).
    The naive [B, H_kv, N, G] layout puts G (often 1) in the lane
    dimension and pads every row to 128 lanes — 32-128x VMEM waste that
    overflows the 16 MB scoped-vmem budget. Lane-major costs nothing:
    per-token scales are applied algebraically in [rep, N] space
    (see below), never expanded to [N, D].
  * Segments are capped at _MAX_SEG_BYTES of stored K rows, independent
    of `decode_segment_tokens`, so a 32K-context pool can never demand a
    multi-MB double-buffered block.

Per-token scales (G == 1, the default) never materialize dequantized K/V:
    s[r, n] = (q·cᵏᵀ − (Σ_d q)·zpᵏ) · scᵏ · sm_scale
    o[r, d] = (p·scᵛ)·cᵛ − Σ_n p·(scᵛ·zpᵛ)
i.e. the (code − zp)·scale affine folds into rank-1 corrections around the
raw integer-code matmuls. Group scales (G > 1) transpose the small [G, N]
block and expand per-channel as before.

Layout contract (ops/quantization.py): codes are chunk-strided token-packed
— within each `pack_chunk_tokens` chunk, token j*R + r lives in byte row r
at bit offset j*bits — so a segment (= w packing chunks) unpacks with pure
shift + mask + sublane concat, and its scales/positions are CONTIGUOUS
lane slices (the reason for chunked packing).

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

# Per-segment budget for one stored K (or V) block in VMEM, pre-padding —
# for the WHOLE block (1, hkv, seg_rows, d), head axis included. Grid-step
# overhead is ~µs per segment × layers × decode steps, so fewer, fatter
# segments win; 1 MB/block keeps the sum of all pools' double-buffered K+V
# blocks inside the 16 MB scoped-vmem limit at any context length. At
# hkv·d = 256 (TinyLlama u8 pools) this preserves the tuned default
# (seg 2048/3072) and degrades a seg-4096 request to 3840 rows — the exact
# configuration that measured 16.22 MB scoped (OOM by 0.22 MB) at 32K; at
# Llama-2-7B (hkv=32, d=128) it caps rows 16× harder — the earlier
# per-head 256 KB budget under-counted by hkv and blew scoped VMEM (36 MB).
_MAX_BLOCK_BYTES = 960 * 1024


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _bytes_to_i32(stored):
    """uint8 bytes → int32 in [0, 255]. Mosaic has no uint8→f32/i32 cast, so
    bitcast to int8 (free), sign-extend to int32, and mask back."""
    return pltpu.bitcast(stored, jnp.int8).astype(jnp.int32) & 0xFF


def _expand_groups(scale_gn, d: int):
    """Lane-major [G, N] per-group params → [N, D] per-channel.

    A dot_general contracting the G axes against an iota-built 0/1
    selection matrix E[g, ch] = (ch // gs == g) — transposes to token-major
    and expands groups to channels in one tiny MXU matmul that always
    lowers (Mosaic rejects broadcast+minor-dim-reshape spellings).
    """
    g = scale_gn.shape[0]
    gs = d // g
    col_group = jax.lax.broadcasted_iota(jnp.int32, (g, d), 1) // gs
    row = jax.lax.broadcasted_iota(jnp.int32, (g, d), 0)
    expand = (col_group == row).astype(jnp.float32)
    return jax.lax.dot_general(scale_gn.astype(jnp.float32), expand,
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _unpack_codes(stored, bits, n_tokens, d, w=1):
    """[R, D] packed (or [N, D] raw) uint8 → [N, D] float32 integer codes.

    `w` = packing chunks in this segment: sub-byte rows unpack per chunk
    (static slices + sublane concat — chunk-strided layout contract)."""
    p = _bytes_to_i32(stored)
    if bits == 8:
        return p.astype(jnp.float32)
    per_byte = 8 // bits
    mask = 2 ** bits - 1
    if w == 1:
        parts = [((p >> (j * bits)) & mask) for j in range(per_byte)]
        return jnp.concatenate(parts, axis=0)[:n_tokens].astype(jnp.float32)
    rows_c = p.shape[0] // w
    chunks = []
    for c in range(w):
        pc = p[c * rows_c:(c + 1) * rows_c]
        chunks.append(jnp.concatenate(
            [((pc >> (j * bits)) & mask) for j in range(per_byte)],
            axis=0))
    return jnp.concatenate(chunks, axis=0).astype(jnp.float32)


class _Entry(NamedTuple):
    """Static metadata for one pool in the segment walk."""

    bits: int
    seg_tokens: int   # tokens per segment (= w packing chunks)
    seg_rows: int     # stored rows per segment
    n_segs: int
    seg_start: int    # first segment index in the global walk
    w: int = 1        # packing chunks per segment
    g: int = 1        # scale groups per head


def _decode_kernel(qpos_ref, q_ref, *refs, sm_scale: float,
                   entries: Tuple[_Entry, ...], total_segs: int, d: int,
                   hkv: int, rep: int,
                   m_scr=None, l_scr=None, acc_scr=None):
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
        k_r, v_r, sc_r, pos_r = refs[e_idx * 4:e_idx * 4 + 4]

        @pl.when((seg >= e.seg_start) & (seg < e.seg_start + e.n_segs))
        def _run(e=e, k_r=k_r, v_r=v_r, sc_r=sc_r, pos_r=pos_r):
            pos_ok = pos_r[0] <= qpos            # [1, N] (broadcasts)
            n = e.seg_tokens
            g = e.g

            def head_scales(h):
                sc4 = sc_r[0, h]                 # [4G, N]
                return (sc4[0:g], sc4[g:2 * g], sc4[2 * g:3 * g],
                        sc4[3 * g:4 * g])        # ksc, kzp, vsc, vzp

            # Pass 1: per-head score dots, batched into [hkv*rep, N] — the
            # online-softmax state then updates ONCE for all heads instead
            # of hkv times per segment (at 7B MHA that is 32 -> 1 update
            # chains of [1, N] VPU ops; the r5 ablation put the decode gap
            # in exactly this per-segment op count).
            rows = []
            for h in range(hkv):
                q = q_ref[0, h].astype(jnp.float32)          # [rep, d]
                if e.bits == 16:
                    k = k_r[0, h].astype(jnp.float32)        # [N, d]
                    s = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32) * sm_scale
                else:
                    ck = _unpack_codes(k_r[0, h], e.bits, n, d, w=e.w)
                    ksc, kzp, _, _ = head_scales(h)
                    if g == 1:
                        cs = jax.lax.dot_general(
                            q, ck, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [rep, N]
                        qsum = jnp.sum(q, axis=1, keepdims=True)  # [rep, 1]
                        s = (cs - qsum * kzp) * ksc * sm_scale
                    else:
                        k = ((ck - _expand_groups(kzp, d))
                             * _expand_groups(ksc, d))
                        s = jax.lax.dot_general(
                            q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
                rows.append(s)
            s = jnp.concatenate(rows, axis=0)                # [hkv*rep, N]
            s = jnp.where(pos_ok, s, NEG_INF)
            m_prev = m_scr[...]
            l_prev = l_scr[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)                 # [hkv*rep, 1]
            p = jnp.exp(s - m_next)                          # [hkv*rep, N]
            m_scr[...] = m_next
            l_scr[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

            # Pass 2: per-head PV dots, batched acc update.
            pvs = []
            for h in range(hkv):
                rs = slice(h * rep, (h + 1) * rep)
                p_h = p[rs]                                  # [rep, N]
                if e.bits == 16:
                    v = v_r[0, h].astype(jnp.float32)
                    pv = jax.lax.dot(p_h, v,
                                     preferred_element_type=jnp.float32)
                else:
                    cv = _unpack_codes(v_r[0, h], e.bits, n, d, w=e.w)
                    _, _, vsc, vzp = head_scales(h)
                    if g == 1:
                        pv = jax.lax.dot(p_h * vsc, cv,
                                         preferred_element_type=jnp.float32)
                        pv -= jnp.sum(p_h * (vsc * vzp), axis=1,
                                      keepdims=True)
                    else:
                        v = ((cv - _expand_groups(vzp, d))
                             * _expand_groups(vsc, d))
                        pv = jax.lax.dot(p_h, v,
                                         preferred_element_type=jnp.float32)
                pvs.append(pv)
            acc_scr[...] = (acc_scr[...] * alpha
                            + jnp.concatenate(pvs, axis=0))

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
            t, cfg.tier_bits(tier),
            t.chunk if t.chunk is not None else cfg.tier_chunk(t.capacity)))
    if pool is not None and pool.n_blocks:
        masked = jnp.where(pool.valid, pool.positions, POS_SENTINEL)
        raw_entries.append((pool.bits, pool.block_tokens,
                            (pool.k_stored, pool.v_stored, pool.k_scale,
                             pool.k_zp, pool.v_scale, pool.v_zp, masked)))
    if recent.capacity:
        r_mask = jnp.arange(recent.capacity)[None, :] < recent.length[:, None]
        r_pos = jnp.where(r_mask, recent.positions, POS_SENTINEL)
        raw_entries.append((16, recent.capacity,
                            (recent.k, recent.v, None, None, None, None,
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
        rows_total = k_s.shape[1]
        rows_per_chunk = rows_total // n_chunks
        # Group whole chunks per segment: fewer grid steps (less per-step
        # overhead, bigger matmuls) at unchanged capacity granularity —
        # capped by BOTH decode_segment_tokens and the VMEM byte budget
        # (_MAX_SEG_BYTES per stored block), so 32K pools stay compilable.
        # `w` need not divide n_chunks: entries pad to a whole number of
        # segments (padded positions carry the sentinel, so they mask off;
        # the pads are loop-invariant and hoist out of the decode scan).
        itemsize = jnp.dtype(k_s.dtype).itemsize
        max_rows = max(rows_per_chunk,
                       _MAX_BLOCK_BYTES // (hkv * d * itemsize))
        target_w = max(1, min(cfg.decode_segment_tokens // chunk,
                              max_rows // rows_per_chunk))
        w = min(target_w, n_chunks)
        n_segs = -(-n_chunks // w)
        if n_chunks % w:
            pad_c = n_segs * w - n_chunks
            k_s = jnp.pad(k_s, ((0, 0), (0, pad_c * rows_per_chunk),
                                (0, 0), (0, 0)))
            v_s = jnp.pad(v_s, ((0, 0), (0, pad_c * rows_per_chunk),
                                (0, 0), (0, 0)))
            masked_pos = jnp.pad(masked_pos, ((0, 0), (0, pad_c * chunk)),
                                 constant_values=POS_SENTINEL)
            if ksc is not None:
                pad4 = ((0, 0), (0, pad_c * chunk), (0, 0), (0, 0))
                ksc, kzp = jnp.pad(ksc, pad4), jnp.pad(kzp, pad4)
                vsc, vzp = jnp.pad(vsc, pad4), jnp.pad(vzp, pad4)
            n = n_segs * w * chunk
        seg_tokens = w * chunk
        seg_rows = k_s.shape[1] // n_segs
        g = 1 if ksc is None else ksc.shape[-1]
        e = _Entry(bits=bits, seg_tokens=seg_tokens, seg_rows=seg_rows,
                   n_segs=n_segs, seg_start=seg_cursor, w=w, g=g)
        entries.append(e)
        seg_cursor += n_segs

        def idx4(start=e.seg_start, ns=e.n_segs):
            return lambda bi, si: (bi, 0, jnp.clip(si - start, 0, ns - 1), 0)

        def idx_tok(start=e.seg_start, ns=e.n_segs):
            return lambda bi, si: (bi, 0, 0, jnp.clip(si - start, 0, ns - 1))

        inputs.append(hm(k_s))
        in_specs.append(pl.BlockSpec((1, hkv, seg_rows, d), idx4()))
        inputs.append(hm(v_s))
        in_specs.append(pl.BlockSpec((1, hkv, seg_rows, d), idx4()))
        # Scales ride lane-major: [B, H, 4G, N] (rows ksc|kzp|vsc|vzp).
        # bits==16 ignores scales; a tiny zero block keeps the ref layout
        # uniform without shipping real arrays.
        if bits == 16:
            sc_pack = jnp.zeros((b, hkv, 4, n), jnp.float32)
        else:
            lm = lambda a: jnp.transpose(a, (0, 2, 3, 1))  # [B,N,H,G]→[B,H,G,N]
            sc_pack = jnp.concatenate(
                [lm(ksc), lm(kzp), lm(vsc), lm(vzp)], axis=2)
        inputs.append(sc_pack)
        in_specs.append(pl.BlockSpec((1, hkv, 4 * g, seg_tokens), idx_tok()))
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
