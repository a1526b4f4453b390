"""Fused int4-weight dequant-matmul (Pallas TPU).

Round-4 fix for the measured int4 decode regression (benchmarks/RESULTS.md
r3: 7B batch-1 decode 220.6 ms/step with int4 weights vs 13.6 int8 — XLA
materialized the unpacked bf16 weight instead of fusing the nibble unpack,
so the HBM read was 2 bytes/element instead of 0.5). Here the unpack +
group-scale dequant runs INSIDE the matmul kernel on the VMEM-resident
block: HBM traffic stays at the packed 0.5 bytes/element (+ ~0.03 for the
f32 group scales), which is the whole point of int4 weights on a
weight-streaming-bound decode.

Layout contract (models/quantized_params.Int4Tensor, r5 offset-binary
half-split packing): uint8 `q_packed[p, o]` holds offset-binary code row p
(u = q + 8) in its low nibble and row p + K/2 in its high nibble. The
kernel computes

    y = x[:, :K/2] @ W_lo + x[:, K/2:] @ W_hi

with W_lo/W_hi unpacked from the SAME packed block — zero-extend + one
mask / one logical shift, no sign-extension — the raw u4 codes fed to the
MXU as bf16, group scales applied to the dot partials, and the -8 offset
folded into a rank-1 8·Σx_g correction. The K grid dimension walks packed
rows; both x halves arrive as separate blocks of the same input array.

The reference has no counterpart (its quantization is fake-quant,
dynamic_quantization.py:120-126, and never touches weights).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(x_lo_ref, x_hi_ref, w_ref, sl_ref, sh_ref, o_ref, acc_ref, *,
            nk: int, compute_dtype):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Offset-binary nibble unpack (Int4Tensor r5 layout): uint8 zero-
    # extends to i32 (1 op), then mask / logical shift (1 op each) — no
    # sign-extension double-shift (r4's 7 ops/byte -> 5; probe_matvec_r5
    # measured -20% at the decode matvec shape). Scales still apply to the
    # dot PARTIALS; the -8 code offset folds into a rank-1 correction
    # 8·Σx_g per group, never touching the [bk2, bn] block.
    p = w_ref[...].astype(jnp.int32)              # [bk2, bn] in [0, 255]
    lo = jnp.bitwise_and(p, 0xF)                  # u4 low nibble [0, 15]
    hi = jnp.right_shift(p, 4)                    # u4 high nibble

    def half(x_ref, codes, s_ref):
        # Scale the per-group PARTIAL [bm, bn] instead of the [bk2, bn]
        # weight block: the scale multiply shrinks by bk2/bm (64x at
        # decode bm=8, block_k2=512), and the codes go to the MXU as raw
        # bf16 nibbles — one astype pass, no f32 scale pass.
        s = s_ref[...][:, 0, :]                   # [R, 1, bn] f32 -> [R, bn]
        r = s.shape[0]
        bk2 = codes.shape[0]
        gsz = bk2 // r
        w = codes.astype(compute_dtype)           # [bk2, bn] unscaled u4
        x = x_ref[...]                            # [bm, bk2]
        for g in range(r):
            xg = x[:, g * gsz:(g + 1) * gsz]
            part = jnp.dot(xg, w[g * gsz:(g + 1) * gsz],
                           preferred_element_type=jnp.float32)
            # offset correction: x @ (u - 8) = x @ u - 8·Σx_g
            xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            acc_ref[...] += (part - 8.0 * xs) * s[g][None, :]

    half(x_lo_ref, lo, sl_ref)
    half(x_hi_ref, hi, sh_ref)

    @pl.when(k_idx == nk - 1)
    def _finalize():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def int4_matmul(
    x: Array,
    q_packed: Array,
    scale: Array,
    group_size: int,
    out_dtype=None,
    block_m: int = 256,
    block_n: int = 512,
    block_k2: int = 512,
    interpret: Optional[bool] = None,
) -> Array:
    """[M, K] x (half-split packed [K/2, N] int4, [K/G, N] f32 scales) → [M, N].

    block_k2 counts PACKED rows (each carries one lo and one hi code row, so
    a grid step consumes 2*block_k2 reduction elements). All dims pad to
    their block internally: padded packed rows pair with zero x columns and
    zero scale rows, so they contribute nothing (offset-binary code 0 means
    -8, but 0·(-8)·0 = 0).

    Matches `Int4Tensor.dequantize` math exactly per group; the MXU runs
    bf16 (x's dtype), accumulation is f32.
    """
    if interpret is None:
        interpret = _interpret_default()
    m, k = x.shape
    kh, n = q_packed.shape
    assert k == 2 * kh, (x.shape, q_packed.shape)
    n_g = scale.shape[0]
    out_dtype = out_dtype or x.dtype

    # Per-half group scales: lo rows' groups are the first half of `scale`,
    # hi rows' the second (requires K/2 % G == 0), except the single-group
    # case where both halves share the one row.
    if n_g == 1:
        s_lo = s_hi = scale.astype(jnp.float32)
        gs = kh  # one scale row per (whole) half
    else:
        gs = group_size
        if kh % gs:
            raise ValueError(
                f"int4_matmul needs K/2 ({kh}) divisible by group_size "
                f"({gs}); requantize with in_dim % (2*group) == 0")
        s_lo = scale[: kh // gs].astype(jnp.float32)
        s_hi = scale[kh // gs:].astype(jnp.float32)

    block_m = min(block_m, max(8, ((m + 7) // 8) * 8))
    block_n = min(block_n, ((n + 127) // 128) * 128)
    block_k2 = min(block_k2, ((kh + 127) // 128) * 128)
    if gs < block_k2 and block_k2 % gs:
        block_k2 = (block_k2 // gs) * gs  # whole groups per block
    if n_g > 1 and gs > block_k2 and gs % block_k2:
        raise ValueError(
            f"int4_matmul needs group_size ({gs}) to divide into whole "
            f"k-blocks ({block_k2}); use a power-of-two group size")
    pad_m = (-m) % block_m
    pad_n = (-n) % block_n
    pad_k2 = (-kh) % block_k2
    x_lo = x[:, :kh]
    x_hi = x[:, kh:]
    if pad_m or pad_k2:
        x_lo = jnp.pad(x_lo, ((0, pad_m), (0, pad_k2)))
        x_hi = jnp.pad(x_hi, ((0, pad_m), (0, pad_k2)))
    if pad_n or pad_k2:
        q_packed = jnp.pad(q_packed, ((0, pad_k2), (0, pad_n)))
    # Scale rows per k-block (>= 1); pad scales to the padded group count.
    r = max(1, block_k2 // gs)
    n_groups_pad = (kh + pad_k2) // max(gs, 1) if gs <= block_k2 else 1
    if gs <= block_k2:
        pad_g = n_groups_pad - s_lo.shape[0]
        if pad_g or pad_n:
            s_lo = jnp.pad(s_lo, ((0, pad_g), (0, pad_n)))
            s_hi = jnp.pad(s_hi, ((0, pad_g), (0, pad_n)))
    elif pad_n:
        s_lo = jnp.pad(s_lo, ((0, 0), (0, pad_n)))
        s_hi = jnp.pad(s_hi, ((0, 0), (0, pad_n)))
    mm, nn_, kk2 = m + pad_m, n + pad_n, kh + pad_k2
    nm, nn, nk = mm // block_m, nn_ // block_n, kk2 // block_k2
    # Scales travel as [G, 1, N]: Mosaic constrains only the LAST TWO block
    # dims ((1, block_n) — always legal), so the per-block group count `r`
    # rides the unconstrained leading dim. A 2-D (r, block_n) block with
    # r < 8 fails TPU lowering (measured on HW, r4 sitting: "block shape
    # (4, 512) ... requires ... divisible by 8").
    s_lo = s_lo[:, None, :]
    s_hi = s_hi[:, None, :]
    if gs <= block_k2:
        s_idx = lambda i, j, s: (s, 0, j)         # noqa: E731
    else:
        # One scale row per k-block; the block's group is the group its
        # FIRST packed row falls in (whole blocks per group by padding).
        s_idx = lambda i, j, s: ((s * block_k2) // gs, 0, j)  # noqa: E731

    out = pl.pallas_call(
        functools.partial(_kernel, nk=nk, compute_dtype=x.dtype),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k2), lambda i, j, s: (i, s)),
            pl.BlockSpec((block_m, block_k2), lambda i, j, s: (i, s)),
            pl.BlockSpec((block_k2, block_n), lambda i, j, s: (s, j)),
            pl.BlockSpec((r, 1, block_n), s_idx),
            pl.BlockSpec((r, 1, block_n), s_idx),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, s: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mm, nn_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mm * nn_ * 2 * kk2,
            bytes_accessed=(mm * 2 * kk2 * 2 + kk2 * nn_
                            + mm * nn_ * jnp.dtype(out_dtype).itemsize),
            transcendentals=0),
        interpret=interpret,
    )(x_lo, x_hi, q_packed, s_lo, s_hi)
    return out[:m, :n]


def int4_matmul_tensor(x: Array, w, interpret: Optional[bool] = None
                       ) -> Array:
    """Apply `int4_matmul` to an Int4Tensor over arbitrary leading dims."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y = int4_matmul(x2, w.q_packed, w.scale, w.group_size,
                    out_dtype=x.dtype, interpret=interpret)
    return y.reshape(*lead, w.q_packed.shape[-1])
