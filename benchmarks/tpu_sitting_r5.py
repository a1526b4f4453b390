#!/usr/bin/env python
"""TPU sitting #5: chase the 7B decode gap to the weight-streaming floor.

Probe result that reframes VERDICT r4 item 1 (probe_matvec_r5.json): an
ISOLATED int8 matvec through the plain XLA dequant path already runs at the
int8 streaming floor (0.059 vs 0.056 ms at [4096, 11264] m=8) — the
i8->bf16 convert is NOT the bottleneck at the matmul level. The 13.4 vs
7.9 ms/step gap therefore lives in the rest of the decode step. This
sitting localizes it by ablation, then fixes what it finds.

Phases (each guarded; JSON rewritten after every phase):
  decode_ablation_7b    full decode vs {fused-off, uncompressed-cache,
                        matmul-only} arms, 7B int8 batch 1 @ 4K.
  decode_opt_7b         cumulative r5 levers: head-batched kernel stats,
                        fused QKV/gate-up weights, segment sweep, int4.
  int4_offsetbinary_7b  int4 re-measure after the offset-binary repack.
  decode_blockbytes_7b  decode-kernel VMEM block cap sweep (960 KB stands;
                        bigger caps fail scoped-vmem compilation).
  ttft_compressed_prefix  TTFT table at 4K/8K/32K: uncompressed vs
                        one-shot compressed vs compressed-prefix chunked.
Usage: python benchmarks/tpu_sitting_r5.py [phase ...]
"""

import dataclasses
import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r5_tpu_results.json")
RESULTS = {}
if os.path.exists(OUT):
    with open(OUT) as f:
        RESULTS.update(json.load(f))

PHASES = {}


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2, sort_keys=True)
        f.write("\n")


def phase(name):
    def deco(fn):
        def run():
            print(f"\n=== phase {name} ===", flush=True)
            t0 = time.time()
            try:
                RESULTS[name] = fn()
                RESULTS[name]["phase_wall_s"] = round(time.time() - t0, 1)
            except Exception as e:
                traceback.print_exc()
                RESULTS[name] = {"error": f"{type(e).__name__}: {e}"}
            save()
            print(f"=== {name} done in {time.time()-t0:.0f}s ===", flush=True)
        PHASES[name] = run
        return run
    return deco


def free():
    import gc

    import jax

    gc.collect()
    jax.clear_caches()


def _stats(times_s, steps):
    ms = sorted(t / steps * 1e3 for t in times_s)
    mean = sum(ms) / len(ms)
    return {"ms_per_step_best": round(ms[0], 2),
            "ms_per_step_mean": round(mean, 2),
            "ms_per_step_spread": round(ms[-1] - ms[0], 2),
            "reps": len(ms)}


HBM_GBS = 819e9


def _params_bytes(params):
    import jax

    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
@phase("decode_ablation_7b")
def decode_ablation_7b():
    """Where do 13.4 ms/step go when the weights stream in 8.1? Arms:

      full      decode_loop, auto fused (production path; r4 = 13.4)
      fused_off decode_loop, use_fused=False (XLA dequant attention)
      uncomp    decode_loop_uncompressed (dense bf16 cache; KV adds
                ~2.2 GB/step of streaming at 4K, floor accounts for it)
      nokv      matmul-only transformer step: identical matmuls + norms +
                lm_head, attention output faked as q — isolates the
                weight-streaming part of the step. If nokv sits at its
                floor, the gap is all in attention+cache machinery; if
                not, the matmuls lose time only IN CONTEXT (scheduling),
                not in isolation (probe_matvec_r5).
    """
    import jax
    import jax.numpy as jnp

    import realtime_kv_cache_compression_tpu as rtc
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.models.quantized_params import (
        quantize_params_streaming)
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                readback)

    seq, new = 4096, 64
    mcfg = dataclasses.replace(rtc.LLAMA2_7B,
                               max_position_embeddings=seq + new + 16)
    ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers,
                                 high_precision_bits=8,
                                 medium_precision_bits=4,
                                 low_precision_bits=2)
    params = quantize_params_streaming(
        llama.init_params(jax.random.PRNGKey(0), mcfg), bits=8)
    pbytes = _params_bytes(params)
    floor_w = pbytes / HBM_GBS * 1e3
    out = {"params_gb": round(pbytes / 1e9, 2),
           "weight_floor_ms": round(floor_w, 2), "arms": {}}
    print(f"  params {pbytes/1e9:.2f} GB, weight floor {floor_w:.2f} ms",
          flush=True)

    rtt = measure_rtt()
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, seq), 0,
                             mcfg.vocab_size)

    def timeit(fn, *args, reps=5):
        readback(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            readback(fn(*args))
            ts.append(max(time.perf_counter() - t0 - rtt, 1e-9))
        return ts

    # --- full + fused_off ---------------------------------------------
    prefill = jax.jit(lambda p, i: llama.prefill_compressed(
        p, i, mcfg, ccfg, max_decode_len=new, use_flash=True))
    logits, state, _ = prefill(params, ids)
    tok = jnp.argmax(logits, -1)
    for label, fused in (("full", None), ("fused_off", False)):
        loop = jax.jit(functools.partial(
            lambda p, t, s, uf: llama.decode_loop(p, t, s, new - 1, mcfg,
                                                  ccfg, use_fused=uf)[0],
            uf=fused))
        ts = timeit(loop, params, tok, state)
        out["arms"][label] = _stats(ts, new - 1)
        print(f"  {label}: {out['arms'][label]}", flush=True)
        save()
    del state
    free()

    # --- uncomp -------------------------------------------------------
    max_len = seq + new + 8
    kshape = (mcfg.num_layers, 1, max_len, mcfg.num_kv_heads, mcfg.head_dim)
    kv_bytes = 2 * 1 * (seq + new // 2) * mcfg.num_kv_heads * mcfg.head_dim \
        * 2 * mcfg.num_layers
    uncomp_floor = (pbytes + kv_bytes) / HBM_GBS * 1e3
    kv = (jnp.zeros(kshape, jnp.bfloat16), jnp.zeros(kshape, jnp.bfloat16))
    pos = jnp.full((1,), seq, jnp.int32)

    uloop = jax.jit(lambda p, t, kv, pos: llama.decode_loop_uncompressed(
        p, t, kv, pos, new - 1, mcfg)[0])
    ts = timeit(uloop, params, tok, kv, pos)
    out["arms"]["uncomp"] = _stats(ts, new - 1)
    out["arms"]["uncomp"]["floor_ms"] = round(uncomp_floor, 2)
    print(f"  uncomp: {out['arms']['uncomp']}", flush=True)
    del kv
    free()
    save()

    # --- nokv (matmul-only step) --------------------------------------
    from realtime_kv_cache_compression_tpu.models.llama import (
        _embed_lookup, _matmul, _mlp, _qkv, logits_from_hidden, rmsnorm)

    def nokv_step(p, token):
        h = _embed_lookup(p["embed"], token, jnp.dtype(mcfg.dtype),
                          cfg=mcfg)[:, None]
        for layer in p["layers"]:
            x = rmsnorm(h, layer["input_norm"], mcfg.rms_norm_eps)
            q, k, v = _qkv(layer, x, mcfg)
            attn_out = (q.reshape(1, 1, mcfg.q_dim)
                        + jnp.sum(k) * 1e-9 + jnp.sum(v) * 1e-9)
            h = h + _matmul(attn_out, layer["wo"])
            h = h + _mlp(layer, rmsnorm(h, layer["post_norm"],
                                        mcfg.rms_norm_eps), mcfg)
        return logits_from_hidden(p, h[:, 0], mcfg)

    def nokv_loop(p, t):
        def body(tok, _):
            lg = nokv_step(p, tok)
            return jnp.argmax(lg, -1), None
        last, _ = jax.lax.scan(body, t, None, length=new - 1)
        return last

    nloop = jax.jit(nokv_loop)
    ts = timeit(nloop, params, tok)
    out["arms"]["nokv"] = _stats(ts, new - 1)
    out["arms"]["nokv"]["floor_ms"] = round(floor_w, 2)
    print(f"  nokv: {out['arms']['nokv']}", flush=True)
    save()
    return out


# ---------------------------------------------------------------------------
@phase("decode_opt_7b")
def decode_opt_7b():
    """The r5 decode optimizations, measured cumulatively at 7B int8 4K b1:

      base          decode_loop as of r4 close (12.76 measured in the
                    ablation phase, with the head-batched kernel already in)
      fused_w       + llama.fuse_params (QKV 3->1, gate/up 2->1 dots)
      seg_sweep     + decode_segment_tokens in {1024, 2048, 4096} (fatter
                    or thinner kernel segments)

    Done-bar (VERDICT r4 item 1): <= 9.5 ms/step.
    Also: int4 with the same fusions (bar: >= 1.15x int8 tok/s — expected
    to FAIL per probe_matvec_r5: the XLA int8 convert-dot is already at the
    HBM floor and int4's VPU unpack exceeds its DMA savings; record the
    measured verdict either way).
    """
    import jax
    import jax.numpy as jnp

    import realtime_kv_cache_compression_tpu as rtc
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.models.quantized_params import (
        quantize_params_streaming)
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                readback)

    seq, new = 4096, 64
    mcfg = dataclasses.replace(rtc.LLAMA2_7B,
                               max_position_embeddings=seq + new + 16)
    out = {"arms": {}}
    rtt = measure_rtt()
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, seq), 0,
                             mcfg.vocab_size)

    def run_arm(label, params, ccfg, reps=5):
        prefill = jax.jit(lambda p, i: llama.prefill_compressed(
            p, i, mcfg, ccfg, max_decode_len=new, use_flash=True))
        loop = jax.jit(lambda p, t, s: llama.decode_loop(
            p, t, s, new - 1, mcfg, ccfg)[0])
        logits, state, _ = prefill(params, ids)
        tok = jnp.argmax(logits, -1)
        readback(loop(params, tok, state))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            readback(loop(params, tok, state))
            ts.append(max(time.perf_counter() - t0 - rtt, 1e-9))
        st = _stats(ts, new - 1)
        st["tok_s"] = round((new - 1) / min(ts), 1)
        out["arms"][label] = st
        print(f"  {label}: {st}", flush=True)
        save()
        del state
        free()

    def ccfg_seg(seg):
        return rtc.CompressionConfig(
            num_layers=mcfg.num_layers, high_precision_bits=8,
            medium_precision_bits=4, low_precision_bits=2,
            decode_segment_tokens=seg)

    params = quantize_params_streaming(
        llama.init_params(jax.random.PRNGKey(0), mcfg), bits=8)
    run_arm("int8_batched_kernel", params, ccfg_seg(2048))
    fused = llama.fuse_params(params)
    del params
    run_arm("int8_fused_w", fused, ccfg_seg(2048))
    run_arm("int8_fused_seg1024", fused, ccfg_seg(1024))
    run_arm("int8_fused_seg4096", fused, ccfg_seg(4096))
    del fused
    free()

    params4 = quantize_params_streaming(
        llama.init_params(jax.random.PRNGKey(0), mcfg), bits=4)
    fused4 = llama.fuse_params(params4)
    del params4
    run_arm("int4_fused_w", fused4, ccfg_seg(2048))
    del fused4
    free()

    best_i8 = min(v["ms_per_step_best"] for k, v in out["arms"].items()
                  if k.startswith("int8"))
    out["best_int8_ms_per_step"] = best_i8
    out["done_bar_9p5"] = best_i8 <= 9.5
    out["int4_vs_int8_tok_s"] = round(
        out["arms"]["int4_fused_w"]["tok_s"]
        / max(v["tok_s"] for k, v in out["arms"].items()
              if k.startswith("int8")), 2)
    return out


# ---------------------------------------------------------------------------
@phase("decode_blockbytes_7b")
def decode_blockbytes_7b():
    """At 7B (hkv*d = 4096 B/row) the decode kernel's per-segment row count
    is bound by _MAX_BLOCK_BYTES (960 KB -> 234 rows), not by
    decode_segment_tokens — ~10 segments/layer whose fixed costs dominate
    the attention share. Sweep the byte cap upward (VMEM has headroom at
    7B: only one pool's K+V blocks double-buffer at a time)."""
    import jax
    import jax.numpy as jnp

    import realtime_kv_cache_compression_tpu as rtc
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.models.quantized_params import (
        quantize_params_streaming)
    from realtime_kv_cache_compression_tpu.ops.pallas import decode_attention
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                readback)

    seq, new = 4096, 64
    mcfg = dataclasses.replace(rtc.LLAMA2_7B,
                               max_position_embeddings=seq + new + 16)
    ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers,
                                 high_precision_bits=8,
                                 medium_precision_bits=4,
                                 low_precision_bits=2)
    params = llama.fuse_params(quantize_params_streaming(
        llama.init_params(jax.random.PRNGKey(0), mcfg), bits=8))
    rtt = measure_rtt()
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, seq), 0,
                             mcfg.vocab_size)
    prefill = jax.jit(lambda p, i: llama.prefill_compressed(
        p, i, mcfg, ccfg, max_decode_len=new, use_flash=True))
    logits, state, _ = prefill(params, ids)
    tok = jnp.argmax(logits, -1)

    out = {"arms": {}}
    orig = decode_attention._MAX_BLOCK_BYTES
    try:
        for cap_kb in (960, 1920, 3840):
            decode_attention._MAX_BLOCK_BYTES = cap_kb * 1024
            jax.clear_caches()
            loop = jax.jit(lambda p, t, s: llama.decode_loop(
                p, t, s, new - 1, mcfg, ccfg)[0])
            try:
                readback(loop(params, tok, state))
            except Exception as e:
                out["arms"][f"cap{cap_kb}k"] = {"error": str(e)[:300]}
                save()
                continue
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                readback(loop(params, tok, state))
                ts.append(max(time.perf_counter() - t0 - rtt, 1e-9))
            st = _stats(ts, new - 1)
            st["tok_s"] = round((new - 1) / min(ts), 1)
            out["arms"][f"cap{cap_kb}k"] = st
            print(f"  cap {cap_kb}KB: {st}", flush=True)
            save()
    finally:
        decode_attention._MAX_BLOCK_BYTES = orig
    return out


# ---------------------------------------------------------------------------
@phase("int4_offsetbinary_7b")
def int4_offsetbinary_7b():
    """Re-measure 7B int4 fused decode after the r5 offset-binary repack
    (5 VPU ops/byte unpack vs 7; probe_matvec_r5 predicted -20% on the
    isolated matvec). Compare against decode_opt_7b's int4_fused_w (11.5)
    and int8_fused_w (11.3)."""
    import jax
    import jax.numpy as jnp

    import realtime_kv_cache_compression_tpu as rtc
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.models.quantized_params import (
        quantize_params_streaming)
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                readback)

    seq, new = 4096, 64
    mcfg = dataclasses.replace(rtc.LLAMA2_7B,
                               max_position_embeddings=seq + new + 16)
    ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers,
                                 high_precision_bits=8,
                                 medium_precision_bits=4,
                                 low_precision_bits=2)
    params = llama.fuse_params(quantize_params_streaming(
        llama.init_params(jax.random.PRNGKey(0), mcfg), bits=4))
    rtt = measure_rtt()
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, seq), 0,
                             mcfg.vocab_size)
    prefill = jax.jit(lambda p, i: llama.prefill_compressed(
        p, i, mcfg, ccfg, max_decode_len=new, use_flash=True))
    logits, state, _ = prefill(params, ids)
    tok = jnp.argmax(logits, -1)
    loop = jax.jit(lambda p, t, s: llama.decode_loop(
        p, t, s, new - 1, mcfg, ccfg)[0])
    readback(loop(params, tok, state))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        readback(loop(params, tok, state))
        ts.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    st = _stats(ts, new - 1)
    st["tok_s"] = round((new - 1) / min(ts), 1)
    print(f"  int4 offset-binary: {st}", flush=True)
    return {"int4_fused_offsetbinary": st,
            "r5_signed_halfsplit_ms": 11.5, "int8_fused_ms": 11.3}


# ---------------------------------------------------------------------------
@phase("ttft_compressed_prefix")
def ttft_compressed_prefix():
    """TTFT improved BY compression (VERDICT r4 item 2 done-bar).

    TinyLlama-arch bf16 (the BENCH headline model), batch 1, at 4K/8K/32K:
      uncomp          one-shot uncompressed flash prefill (the arm the
                      compressed path must BEAT at >= 8K)
      comp_oneshot    one-shot compressed prefill (r4's losing arm:
                      102.9 vs 87.3 ms at 4K)
      comp_prefix     compressed-prefix chunked prefill (flash): later
                      chunks attend over the compressed pools of earlier
                      chunks — prefix attention work scales by the kept
                      ratio instead of 1.0
    """
    import jax
    import jax.numpy as jnp

    import realtime_kv_cache_compression_tpu as rtc
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                readback)

    out = {"lengths": {}}
    rtt = measure_rtt()
    new = 16

    for seq, chunk in ((4096, 1024), (8192, 2048), (32768, 4096)):
        mcfg = dataclasses.replace(rtc.TINYLLAMA_1_1B,
                                   max_position_embeddings=seq + new + 16)
        ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers,
                                     high_precision_bits=8,
                                     medium_precision_bits=4,
                                     low_precision_bits=2)
        params = llama.init_params(jax.random.PRNGKey(0), mcfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, seq), 0,
                                 mcfg.vocab_size)
        row = {}

        def best_of(fn, reps=3):
            readback(fn())
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                readback(fn())
                ts.append(max(time.perf_counter() - t0 - rtt, 1e-9))
            return min(ts) * 1e3

        un = jax.jit(lambda p, i: llama.prefill_uncompressed(
            p, i, mcfg, use_flash=True)[0])
        row["uncomp_ms"] = round(best_of(lambda: un(params, ids)), 1)
        free()

        co = jax.jit(lambda p, i: llama.prefill_compressed(
            p, i, mcfg, ccfg, max_decode_len=new, use_flash=True)[0])
        row["comp_oneshot_ms"] = round(best_of(lambda: co(params, ids)), 1)
        free()

        # Compressed-prefix chunked: time init + all chunk steps + finish
        # (jitted init — eager it issues ~530 small zeros ops, 20x TTFT
        # through the relay; one jitted step program serves every chunk).
        init = jax.jit(lambda: llama.prefill_chunked_compressed_init(
            1, seq, chunk, mcfg, ccfg))
        step = jax.jit(lambda p, i, t: llama.prefill_chunked_compressed_step(
            p, i, t, mcfg, ccfg, total_len=seq, use_flash=True))
        fin = jax.jit(lambda p, t: llama.prefill_chunked_compressed_finish(
            p, t, mcfg, ccfg, max_decode_len=new)[0])

        def run_prefix():
            st = init()
            for off in range(0, seq, chunk):
                st = step(params, ids[:, off:off + chunk], st)
            return fin(params, st)

        row["comp_prefix_ms"] = round(best_of(run_prefix), 1)
        row["chunk"] = chunk
        row["prefix_vs_uncomp"] = round(row["comp_prefix_ms"]
                                        / row["uncomp_ms"], 3)
        out["lengths"][str(seq)] = row
        print(f"  S={seq}: uncomp {row['uncomp_ms']} ms, one-shot comp "
              f"{row['comp_oneshot_ms']} ms, comp-prefix "
              f"{row['comp_prefix_ms']} ms ({row['prefix_vs_uncomp']}x "
              f"uncomp)", flush=True)
        save()
        del params
        free()
    out["oneshot_improved_at_8k_plus"] = any(
        int(s) >= 8192 and r["comp_oneshot_ms"] < r["uncomp_ms"]
        for s, r in out["lengths"].items())
    out["prefix_improved_at_8k_plus"] = any(
        int(s) >= 8192 and r["comp_prefix_ms"] < r["uncomp_ms"]
        for s, r in out["lengths"].items())
    return out


# ---------------------------------------------------------------------------
def main():
    import jax

    names = sys.argv[1:] or list(PHASES)
    RESULTS.setdefault("meta", {})
    RESULTS["meta"].update({
        "device": jax.devices()[0].device_kind,
        "date": time.strftime("%Y-%m-%d %H:%M"),
    })
    for n in names:
        PHASES[n]()
    save()


if __name__ == "__main__":
    main()
