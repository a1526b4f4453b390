#!/usr/bin/env python
"""Round-5 probe: where does the 7B batch-1 decode matvec time actually go?

Round 4 root-caused 7B int8 decode (13.4 ms/step vs a 7.9 ms weight-
streaming floor) as convert-bound: the i8->bf16 convert over 6.7e9 weights
is one VPU pass XLA does not hide behind the HBM stream. This probe
isolates a SINGLE layer-stack of matmuls (decode shape m=8) and races the
candidate fixes against each other and against the pure-DMA ceiling:

  read      Pallas kernel that DMAs the int8 weight blocks and does almost
            no compute  -> the streaming ceiling actually achievable.
  xla_i8    jnp.dot(x, q.astype(bf16)) * scale  -> the current production
            path (XLA fuses the convert into the dot operand stream).
  dq8       NEW fused Pallas dequant-matvec: per-block astype on the
            VMEM-resident tile + dot, scale applied at finalize. Block
            shape swept.
  dq8_t     same, weights stored [N, K] (out-major) so the dot streams the
            weight as the contracting-major operand.
  i8mxu     int8 x int8 -> int32 MXU dot with PRE-quantized activations
            (isolates the W8A8 kernel cost from the act-quant cost; if the
            MXU's int8 weight load is the real bound this arm wins big).
  i4_cur    the shipped int4 fused kernel (ops/pallas/int4_matmul.py).
  i4_v2     offset-binary (u4) repack: zero-extend + mask/shift unpack
            (5 VPU ops/byte vs 7), group scales via dot partials plus a
            rank-r correction term for the -8 offset.

Each arm runs as a scan over L independent layer weights with a serial
dependency on x between steps (defeats CSE; matches decode's access
pattern where every layer's weights stream from HBM every step).

Usage: python benchmarks/probe_matvec_r5.py [arm ...]
Writes benchmarks/probe_matvec_r5.json incrementally.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from realtime_kv_cache_compression_tpu.utils.timing import measure_rtt, readback

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "probe_matvec_r5.json")

L = 16           # layers in the stack
R = 25           # scan repeats inside one jit (timing resolution >> relay RTT)
M = 8            # decode row block (batch 1 padded to sublane)
K = 4096
N = 11264        # 11008 rounded to a 1024 multiple (block-divisible probe)
GSZ = 128        # int4 group size

RESULTS = {}


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)
        f.write("\n")


def bench_scan(step_fn, ws, reps=5):
    """Time R repeats of a scan of step_fn over the L stacked weights,
    chaining x so every one of the L*R matmuls serializes (and every
    weight re-streams from HBM each repeat, matching decode).

    step_fn(x, w_leaf...) -> y [M-or-8, N']; returns (ms_per_matmul_best,
    all_ms).
    """
    rtt = measure_rtt()
    x0 = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)

    def body(x, w):
        y = step_fn(x, w)
        # Cheap serial dependency: fold y back into an [M, K] x.
        nxt = x * 0.5 + jnp.sum(y, axis=1, keepdims=True).astype(x.dtype) * 1e-6
        return nxt, None

    # NB: weights MUST be jit arguments, not closed-over (closed-over device
    # arrays embed as HLO constants -- the axon relay then serializes GBs
    # into the compile request; measured as a >7 min compile hang).
    @jax.jit
    def run(x, ws):
        def rep(_, x):
            x2, _ys = jax.lax.scan(body, x, ws)
            return x2
        return jnp.sum(jax.lax.fori_loop(0, R, rep, x))

    readback(run(x0, ws))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        readback(run(x0, ws))
        times.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    per = sorted(t / (L * R) * 1e3 for t in times)
    return per[0], per


def make_weights(key):
    w = jax.random.normal(key, (L, K, N), jnp.bfloat16) * 0.02
    return w


def quant_i8(w):  # [L, K, N] -> q [L,K,N] i8, scale [L,N]
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=1)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale[:, None, :]), -127, 127).astype(jnp.int8)
    return q, scale


# ---------------------------------------------------------------------------
# Arm: read (pure DMA ceiling)
# ---------------------------------------------------------------------------
def _read_kernel(x_ref, w_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Touch only the first 8 sublanes of the block: DMA is the whole block,
    # compute is negligible.
    acc_ref[...] += w_ref[:8, :].astype(jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = acc_ref[...]


def read_matvec(x, q, bn, bk):
    k, n = q.shape
    nn, nk = n // bn, k // bk
    return pl.pallas_call(
        functools.partial(_read_kernel, nk=nk),
        grid=(nn, nk),
        in_specs=[
            pl.BlockSpec((M, bk), lambda j, s: (0, s)),
            pl.BlockSpec((bk, bn), lambda j, s: (s, j)),
        ],
        out_specs=pl.BlockSpec((8, bn), lambda j, s: (0, j)),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, q)


# ---------------------------------------------------------------------------
# Arm: dq8 (fused dequant matvec)
# ---------------------------------------------------------------------------
def _dq8_kernel(x_ref, w_ref, ws_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(x_ref[...], w_ref[...].astype(x_ref.dtype),
                            preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] * ws_ref[...]).astype(o_ref.dtype)


def dq8_matvec(x, q, scale, bn, bk):
    k, n = q.shape
    nn, nk = n // bn, k // bk
    return pl.pallas_call(
        functools.partial(_dq8_kernel, nk=nk),
        grid=(nn, nk),
        in_specs=[
            pl.BlockSpec((M, bk), lambda j, s: (0, s)),
            pl.BlockSpec((bk, bn), lambda j, s: (s, j)),
            pl.BlockSpec((1, bn), lambda j, s: (0, j)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, s: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * n * k, bytes_accessed=k * n, transcendentals=0),
    )(x, q, scale[None, :].astype(jnp.float32))


# ---------------------------------------------------------------------------
# Arm: dq8_t (weights stored [N, K]; dot contracts on last axis of both)
# ---------------------------------------------------------------------------
def _dq8t_kernel(x_ref, w_ref, ws_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # [bn, bk] x [M, bk] -> contract k: dot_general, result [bn, M]
    acc_ref[...] += jax.lax.dot_general(
        w_ref[...].astype(x_ref.dtype), x_ref[...],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] * ws_ref[...]).astype(o_ref.dtype)


def dq8t_matvec(x, q_t, scale, bn, bk):
    n, k = q_t.shape
    nn, nk = n // bn, k // bk
    return pl.pallas_call(
        functools.partial(_dq8t_kernel, nk=nk),
        grid=(nn, nk),
        in_specs=[
            pl.BlockSpec((M, bk), lambda j, s: (0, s)),
            pl.BlockSpec((bn, bk), lambda j, s: (j, s)),
            pl.BlockSpec((bn, 1), lambda j, s: (j, 0)),
        ],
        out_specs=pl.BlockSpec((bn, M), lambda j, s: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, M), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bn, M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * n * k, bytes_accessed=k * n, transcendentals=0),
    )(x, q_t, scale[:, None].astype(jnp.float32))


# ---------------------------------------------------------------------------
# Arm: i8mxu (int8 x int8 -> int32, pre-quantized activations)
# ---------------------------------------------------------------------------
def _i8mxu_kernel(x_ref, w_ref, xs_ref, ws_ref, o_ref, acc_ref, *, nk):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _():
        acc = acc_ref[...].astype(jnp.float32)
        o_ref[...] = (acc * xs_ref[...] * ws_ref[...]).astype(o_ref.dtype)


def i8mxu_matvec(x_q, q, x_scale, w_scale, bn, bk):
    k, n = q.shape
    nn, nk = n // bn, k // bk
    return pl.pallas_call(
        functools.partial(_i8mxu_kernel, nk=nk),
        grid=(nn, nk),
        in_specs=[
            pl.BlockSpec((M, bk), lambda j, s: (0, s)),
            pl.BlockSpec((bk, bn), lambda j, s: (s, j)),
            pl.BlockSpec((M, 1), lambda j, s: (0, 0)),
            pl.BlockSpec((1, bn), lambda j, s: (0, j)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, s: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * n * k, bytes_accessed=k * n, transcendentals=0),
    )(x_q, q, x_scale[:, None].astype(jnp.float32),
      w_scale[None, :].astype(jnp.float32))


# ---------------------------------------------------------------------------
# Arm: i4_v2 (offset-binary packed nibbles, partial-scaled groups +
# rank-r offset correction)
# ---------------------------------------------------------------------------
def pack_u4(w, gsz=GSZ):
    """[K, N] -> (packed uint8 [K/2, N], scale f32 [K/G, N]).

    Codes are offset-binary: u = round(w/s) + 8 in [1, 15] (symmetric around
    8). Half-split layout: byte p holds row p (low nibble) and row p + K/2
    (high nibble)."""
    kk, n = w.shape
    wf = w.astype(jnp.float32)
    n_g = kk // gsz
    grouped = wf.reshape(n_g, gsz, n)
    absmax = jnp.max(jnp.abs(grouped), axis=1)
    scale = jnp.maximum(absmax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(grouped / scale[:, None, :]), -7, 7)
    u = (q + 8).astype(jnp.uint8).reshape(kk, n)
    half = kk // 2
    lo, hi = u[:half], u[half:]
    packed = jnp.bitwise_or(jnp.left_shift(hi, 4), lo).astype(jnp.uint8)
    return packed, scale


def _i4v2_kernel(x_lo_ref, x_hi_ref, w_ref, sl_ref, sh_ref, o_ref, acc_ref,
                 *, nk, gsz, r):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    pi = w_ref[...].astype(jnp.int32)       # zero-extends (uint8 source)
    lo = jnp.bitwise_and(pi, 0xF)
    hi = jnp.right_shift(pi, 4)

    def half(x_ref, codes, s_ref):
        s = s_ref[...][:, 0, :]             # [r, bn]
        w = codes.astype(x_ref.dtype)       # u4 codes as bf16, unscaled
        x = x_ref[...]                      # [M, bk2]
        for g in range(r):
            xg = x[:, g * gsz:(g + 1) * gsz]
            part = jnp.dot(xg, w[g * gsz:(g + 1) * gsz],
                           preferred_element_type=jnp.float32)
            # offset correction: sum_k x*(u-8)*s = (x@u)*s - 8*s*sum(x)
            xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            acc_ref[...] += (part - 8.0 * xs) * s[g][None, :]

    half(x_lo_ref, lo, sl_ref)
    half(x_hi_ref, hi, sh_ref)

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def i4v2_matvec(x, packed, scale, bn, bk2, gsz=GSZ):
    kh, n = packed.shape
    nn, nk = n // bn, kh // bk2
    r = bk2 // gsz
    n_gh = kh // gsz
    s_lo = scale[:n_gh][:, None, :]
    s_hi = scale[n_gh:][:, None, :]
    x_lo, x_hi = x[:, :kh], x[:, kh:]
    return pl.pallas_call(
        functools.partial(_i4v2_kernel, nk=nk, gsz=gsz, r=r),
        grid=(nn, nk),
        in_specs=[
            pl.BlockSpec((M, bk2), lambda j, s: (0, s)),
            pl.BlockSpec((M, bk2), lambda j, s: (0, s)),
            pl.BlockSpec((bk2, bn), lambda j, s: (s, j)),
            pl.BlockSpec((r, 1, bn), lambda j, s: (s, 0, j)),
            pl.BlockSpec((r, 1, bn), lambda j, s: (s, 0, j)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda j, s: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * n * 2 * kh,
            bytes_accessed=kh * n, transcendentals=0),
    )(x_lo, x_hi, packed, s_lo, s_hi)


# ---------------------------------------------------------------------------
BLOCKS = [(512, 1024), (1024, 512), (1024, 1024), (2048, 1024)]


def main():
    arms = sys.argv[1:] or ["read", "xla_i8", "dq8", "dq8_t", "i8mxu",
                            "xla_bf16", "i4_cur", "i4_v2"]
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    key = jax.random.PRNGKey(42)
    w = make_weights(key)                        # [L, K, N] bf16
    q, scale = jax.jit(quant_i8)(w)              # [L,K,N] i8, [L,N]
    q.block_until_ready()
    x_probe = jax.random.normal(jax.random.PRNGKey(1), (M, K), jnp.bfloat16)
    ref = (jnp.dot(x_probe, q[0].astype(jnp.float32))
           * scale[0][None, :])

    bytes_per = K * N  # int8
    floor_ms = bytes_per / 819e9 * 1e3

    def rel_err(y):
        y = y.astype(jnp.float32)
        return float(jnp.max(jnp.abs(y - ref))
                     / (jnp.max(jnp.abs(ref)) + 1e-9))

    if "xla_bf16" in arms:
        best, per = bench_scan(lambda x, wl: jnp.dot(x, wl), w)
        RESULTS["xla_bf16"] = {"ms": round(best, 3), "all": [round(t, 3) for t in per]}
        print(f"xla_bf16: {best:.3f} ms (2-byte floor {2*floor_ms:.3f})", flush=True)
        save()

    if "xla_i8" in arms:
        def step(x, wl):
            ql, sl = wl
            y = jnp.dot(x, ql.astype(x.dtype), preferred_element_type=jnp.float32)
            return (y * sl[None, :]).astype(x.dtype)
        best, per = bench_scan(step, (q, scale))
        RESULTS["xla_i8"] = {"ms": round(best, 3), "all": [round(t, 3) for t in per]}
        print(f"xla_i8: {best:.3f} ms (floor {floor_ms:.3f})", flush=True)
        save()

    if "read" in arms:
        res = {}
        for bk, bn in BLOCKS:
            if K % bk or N % bn:
                continue
            try:
                best, per = bench_scan(
                    lambda x, ql, bn=bn, bk=bk: read_matvec(x, ql, bn, bk), q)
            except Exception as e:
                res[f"{bk}x{bn}"] = {"error": str(e)[:200]}
                continue
            res[f"{bk}x{bn}"] = {"ms": round(best, 3)}
            print(f"read {bk}x{bn}: {best:.3f} ms (floor {floor_ms:.3f})",
                  flush=True)
        RESULTS["read"] = res
        save()

    if "dq8" in arms:
        res = {}
        for bk, bn in BLOCKS:
            if K % bk or N % bn:
                continue
            try:
                fn = lambda x, wl, bn=bn, bk=bk: dq8_matvec(x, wl[0], wl[1], bn, bk)
                err = rel_err(fn(x_probe, (q[0], scale[0])))
                best, per = bench_scan(fn, (q, scale))
            except Exception as e:
                res[f"{bk}x{bn}"] = {"error": str(e)[:200]}
                continue
            res[f"{bk}x{bn}"] = {"ms": round(best, 3), "rel_err": round(err, 5)}
            print(f"dq8 {bk}x{bn}: {best:.3f} ms err {err:.2e}", flush=True)
        RESULTS["dq8"] = res
        save()

    if "dq8_t" in arms:
        q_t = jnp.swapaxes(q, 1, 2).copy()  # [L, N, K] contiguous
        res = {}
        for bk, bn in BLOCKS:
            if K % bk or N % bn:
                continue
            try:
                fn = lambda x, wl, bn=bn, bk=bk: dq8t_matvec(
                    x, wl[0], wl[1], bn, bk).T
                err = rel_err(fn(x_probe, (q_t[0], scale[0])))
                best, per = bench_scan(fn, (q_t, scale))
            except Exception as e:
                res[f"{bk}x{bn}"] = {"error": str(e)[:200]}
                continue
            res[f"{bk}x{bn}"] = {"ms": round(best, 3), "rel_err": round(err, 5)}
            print(f"dq8_t {bk}x{bn}: {best:.3f} ms err {err:.2e}", flush=True)
        RESULTS["dq8_t"] = res
        save()

    if "i8mxu" in arms:
        # Pre-quantized activations: x is requantized per scan step OUTSIDE
        # the timed kernel cost? No -- keep it inside; it is [M, K], trivial.
        def quant_x(x):
            xf = x.astype(jnp.float32)
            am = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
            s = jnp.maximum(am, 1e-8) / 127.0
            return jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8), s[:, 0]
        res = {}
        for bk, bn in BLOCKS:
            if K % bk or N % bn:
                continue
            def fn(x, wl, bn=bn, bk=bk):
                xq, xs = quant_x(x)
                return i8mxu_matvec(xq, wl[0], xs, wl[1], bn, bk)
            try:
                err = rel_err(fn(x_probe, (q[0], scale[0])))
                best, per = bench_scan(fn, (q, scale))
            except Exception as e:
                res[f"{bk}x{bn}"] = {"error": str(e)[:200]}
                continue
            res[f"{bk}x{bn}"] = {"ms": round(best, 3), "rel_err": round(err, 5)}
            print(f"i8mxu {bk}x{bn}: {best:.3f} ms err {err:.2e}", flush=True)
        RESULTS["i8mxu"] = res
        save()

    if "i4_cur" in arms:
        from realtime_kv_cache_compression_tpu.models.quantized_params import (
            quantize_tensor_int4)
        from realtime_kv_cache_compression_tpu.ops.pallas.int4_matmul import (
            int4_matmul)
        packed = []
        scales4 = []
        for i in range(L):
            t = quantize_tensor_int4(w[i], group_size=GSZ)
            packed.append(t.q_packed)
            scales4.append(t.scale)
        packed = jnp.stack(packed)
        scales4 = jnp.stack(scales4)
        fn = lambda x, wl: int4_matmul(x, wl[0], wl[1], GSZ, out_dtype=x.dtype)
        best, per = bench_scan(fn, (packed, scales4))
        RESULTS["i4_cur"] = {"ms": round(best, 3),
                             "all": [round(t, 3) for t in per]}
        print(f"i4_cur: {best:.3f} ms (packed floor {floor_ms/2:.3f})", flush=True)
        save()

    if "i4_v2" in arms:
        packed, scales4 = jax.jit(jax.vmap(pack_u4))(w)
        packed.block_until_ready()
        # Reference for error: dequantized dot
        def deq(p, s):
            kk = K
            pi = p.astype(jnp.int32)
            lo = (pi & 0xF) - 8
            hi = (pi >> 4) - 8
            codes = jnp.concatenate([lo, hi], 0).astype(jnp.float32)
            n_g = kk // GSZ
            return (codes.reshape(n_g, GSZ, N) * s[:, None, :]).reshape(kk, N)
        ref4 = jnp.dot(x_probe.astype(jnp.float32), deq(packed[0], scales4[0]))
        res = {}
        for bk2, bn in [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
                        (256, 1024), (2048, 512)]:
            if (K // 2) % bk2 or N % bn or bk2 % GSZ:
                continue
            fn = lambda x, wl, bn=bn, bk2=bk2: i4v2_matvec(
                x, wl[0], wl[1], bn, bk2)
            try:
                y = fn(x_probe, (packed[0], scales4[0])).astype(jnp.float32)
                err = float(jnp.max(jnp.abs(y - ref4))
                            / (jnp.max(jnp.abs(ref4)) + 1e-9))
                best, per = bench_scan(fn, (packed, scales4))
            except Exception as e:
                res[f"{bk2}x{bn}"] = {"error": str(e)[:200]}
                continue
            res[f"{bk2}x{bn}"] = {"ms": round(best, 3), "rel_err": round(err, 5)}
            print(f"i4_v2 {bk2}x{bn}: {best:.3f} ms err {err:.2e}", flush=True)
        RESULTS["i4_v2"] = res
        save()

    RESULTS["meta"] = {"L": L, "M": M, "K": K, "N": N,
                       "int8_floor_ms": round(floor_ms, 3),
                       "int4_floor_ms": round(floor_ms / 2, 3),
                       "device": jax.devices()[0].device_kind}
    save()
    print(json.dumps({k: v for k, v in RESULTS.items()}, indent=1)[:2000])


if __name__ == "__main__":
    main()
