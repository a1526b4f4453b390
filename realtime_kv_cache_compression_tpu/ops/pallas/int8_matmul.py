"""int8 x int8 MXU matmul (Pallas TPU) with dynamic activation quantization.

North-star "quantized-inference engine" path (ARCHITECTURE round-2 item 3):
weight-only int8 (models/quantized_params.py) already halves weight
streaming; this kernel additionally quantizes the *activations* per row
(symmetric, absmax/127) so the matmul itself runs int8 x int8 -> int32 on
the MXU — double the bf16 MXU rate on TPU v5e — and applies the
per-row x per-channel scales on the way out.

y[m, n] = (sum_k x_q[m, k] * w_q[k, n]) * x_scale[m] * w_scale[n]

The reference has no counterpart (its quantization never touched the
compute path — fake-quant only, dynamic_quantization.py:120-126).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def quantize_activations(x: Array) -> Tuple[Array, Array]:
    """Per-row symmetric int8: x ~ x_q * scale. x: [..., K]."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x_q, scale[..., 0]


def _mm_kernel(x_ref, w_ref, xs_ref, ws_ref, o_ref, acc_ref, *, nk: int):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k_idx == nk - 1)
    def _finalize():
        acc = acc_ref[...].astype(jnp.float32)
        o_ref[...] = (acc * xs_ref[...] * ws_ref[...]).astype(o_ref.dtype)


def int8_matmul(
    x_q: Array,
    w_q: Array,
    x_scale: Array,
    w_scale: Array,
    out_dtype=jnp.bfloat16,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> Array:
    """[M, K] int8 @ [K, N] int8 -> [M, N] out_dtype, scaled per row/channel.

    Every dimension pads to its block internally: K-padding contributes
    zero products; padded M rows / N columns are sliced off the output
    (e.g. Llama-2's intermediate 11008 is not 512-divisible).
    """
    if interpret is None:
        interpret = _interpret_default()
    m, k = x_q.shape
    k2, n = w_q.shape
    assert k == k2, (x_q.shape, w_q.shape)

    block_m = min(block_m, max(8, ((m + 7) // 8) * 8))
    block_n = min(block_n, ((n + 127) // 128) * 128)
    block_k = min(block_k, k)
    pad_m = (-m) % block_m
    pad_n = (-n) % block_n
    pad_k = (-k) % block_k
    if pad_m or pad_k:
        x_q = jnp.pad(x_q, ((0, pad_m), (0, pad_k)))
        x_scale = jnp.pad(x_scale, ((0, pad_m),))
    if pad_n or pad_k:
        w_q = jnp.pad(w_q, ((0, pad_k), (0, pad_n)))
        w_scale = jnp.pad(w_scale, ((0, pad_n),))
    mm, nn_, kk = m + pad_m, n + pad_n, k + pad_k
    nm, nn, nk = mm // block_m, nn_ // block_n, kk // block_k

    out = pl.pallas_call(
        functools.partial(_mm_kernel, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, s: (i, s)),
            pl.BlockSpec((block_k, block_n), lambda i, j, s: (s, j)),
            pl.BlockSpec((block_m, 1), lambda i, j, s: (i, 0)),
            pl.BlockSpec((1, block_n), lambda i, j, s: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, s: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mm, nn_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x_q, w_q, x_scale[:, None].astype(jnp.float32),
      w_scale[None, :].astype(jnp.float32))
    return out[:m, :n]


def int8_matmul_xla(x_q: Array, w_q: Array, x_scale: Array, w_scale: Array,
                    out_dtype=jnp.bfloat16) -> Array:
    """XLA reference/fallback for the kernel (same math, jnp.dot)."""
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    return (acc * x_scale[:, None] * w_scale[None, :]).astype(out_dtype)


def dynamic_int8_matmul(x: Array, w_q: Array, w_scale: Array,
                        use_kernel: bool = True,
                        interpret: Optional[bool] = None) -> Array:
    """bf16/f32 activations [..., K] x int8 weights [K, N] via int8 MXU.

    Quantizes activations per token on the fly (one cheap VPU pass XLA
    fuses with the producer), then runs the int8 x int8 matmul.
    """
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    x_q, x_scale = quantize_activations(x2)
    fn = int8_matmul if use_kernel else int8_matmul_xla
    if use_kernel:
        y = fn(x_q, w_q, x_scale, w_scale, out_dtype=x.dtype,
               interpret=interpret)
    else:
        y = fn(x_q, w_q, x_scale, w_scale, out_dtype=x.dtype)
    return y.reshape(*lead, w_q.shape[1])
