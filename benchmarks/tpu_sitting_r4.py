#!/usr/bin/env python
"""TPU sitting #4: close the three measured perf defects from round 3.

One process, one TPU claim (axon relay discipline); each phase is guarded
and the results JSON is rewritten after every phase, so a crash loses at
most the running phase. Produces benchmarks/r4_tpu_results.json; prose
lands in benchmarks/RESULTS.md.

Phases (VERDICT round-3 tasks 2, 3, 5, 6, 7):
  http_serving_r4   the 14x HTTP gap, re-measured behind a REAL warmup
                    (ServingEngine.warmup drives every reachable padded
                    admission batch with DISTINCT prompts — the r3 warmed
                    rerun's identical prompts deduped to one prefill row,
                    so its "compile cost is NOT the bottleneck" note was
                    unsupported; advisor finding r3).
  int4_decode_fused int4 weights through the fused Pallas dequant-matmul
                    (ops/pallas/int4_matmul.py) vs int8, 7B batch 1:
                    r3 measured int4 220.6 ms/step (XLA materialized the
                    unpacked weight); done-bar is >= 1.3x int8 tok/s.
  moe_decode_r4     Mixtral-architecture batch-1 decode: gather (r3 repro)
                    vs dynslice, bf16 vs int8 experts, each against its own
                    recomputed weight-streaming floor (r3 was 4.6x off
                    floor; done-bar <= 2x).
  fused_auto_check_r4  resolve_fused_decode vs both forced arms WITH a
                    variance model: >= 5 repeats per arm, mean +/- spread;
                    auto_ok = within noise of best or within 2% (the r3
                    single-sample check flip-flopped on bf16-b1).
  chunked_hol_32k   chunked prefill measured in its claimed WIN regime
                    (32K prompt admitted against an active decode) —
                    r3 only measured the predicted-loss regime (4K).
                    Also validates the prefill_chunk="auto" resolution.
"""

import dataclasses
import json
import os
import sys
import threading
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r4_tpu_results.json")
RESULTS = {}


def save():
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)


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
        return run
    return deco


def free():
    import gc

    import jax

    gc.collect()
    jax.clear_caches()


# ---------------------------------------------------------------------------
def _tiny_engine(prefill_chunk=None, prefix_cache=0, slots=2,
                 context_len=4096, max_new=64):
    import jax

    import realtime_kv_cache_compression_tpu as rtc
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.serving import ServingEngine

    mcfg = dataclasses.replace(rtc.TINYLLAMA_1_1B,
                               max_position_embeddings=context_len + max_new
                               + 16)
    ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers,
                                 high_precision_bits=8,
                                 medium_precision_bits=4,
                                 low_precision_bits=2)
    params = llama.init_params(jax.random.PRNGKey(0), mcfg)
    eng = ServingEngine(params, mcfg, ccfg, num_slots=slots,
                        context_len=context_len, max_new_tokens=max_new,
                        use_flash=True, prefix_cache_size=prefix_cache,
                        prefill_chunk=prefill_chunk)
    return eng, mcfg


@phase("http_serving_r4")
def http_serving_r4():
    """Identical load to r3 http_serving (4 threads x 6 reqs, 512+16*i-token
    prompts, 48 new tokens) but behind engine.warmup(). If sustained tok/s
    recovers toward the engine's >200, the r3 gap was in-window compiles of
    the pow-2 admission-batch programs; if not, the bottleneck is in the
    front-end and the phase records per-stage timing to localize it."""
    import urllib.request

    import numpy as np

    from realtime_kv_cache_compression_tpu.serving import CompletionServer
    from realtime_kv_cache_compression_tpu.utils.tokenizer import (
        ByteTokenizer)

    eng, mcfg = _tiny_engine(slots=4, context_len=1024, max_new=64)
    t0 = time.time()
    warm = eng.warmup()
    print(f"  warmup: batches {warm['batch_sizes']} in "
          f"{warm['wall_s']:.1f}s", flush=True)
    srv = CompletionServer(eng, ByteTokenizer(), host="127.0.0.1",
                           port=0).start()
    rng = np.random.RandomState(2)

    def post(body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read())

    n_clients, per_client, max_tokens = 4, 6, 48
    results = []
    t1 = time.time()

    def client(i):
        for j in range(per_client):
            p = rng.randint(1, 255, size=512 + 16 * i).tolist()
            results.append(post({"prompt": p, "max_tokens": max_tokens}))

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t1
    total_tokens = sum(r["usage"]["completion_tokens"] for r in results)
    ttfts = [r["rtkv"]["ttft_s"] for r in results if r["rtkv"]["ttft_s"]]
    out = {
        "clients": n_clients, "requests": len(results),
        "prompt_tokens": [512, 560],
        "prompt_tokens_note": "per-client prompt length 512+16*i, i=0..3",
        "max_tokens": max_tokens,
        "warmup_batch_sizes": warm["batch_sizes"],
        "warmup_wall_s": round(warm["wall_s"], 1),
        "wall_s": round(wall, 2),
        "sustained_tok_s": round(total_tokens / wall, 1),
        "avg_ttft_s": round(sum(ttfts) / max(len(ttfts), 1), 3),
        "max_ttft_s": round(max(ttfts), 3) if ttfts else None,
        "avg_memory_savings": round(
            sum(r["rtkv"]["memory_savings"] for r in results)
            / len(results), 3),
        "r3_cold": {"sustained_tok_s": 14.9, "avg_ttft_s": 5.899},
    }
    print(f"  {len(results)} reqs in {wall:.1f}s -> "
          f"{out['sustained_tok_s']} tok/s sustained, "
          f"TTFT {out['avg_ttft_s']*1e3:.0f} ms (r3 cold: 14.9 tok/s)",
          flush=True)
    srv.close()
    del eng
    free()
    return out


# ---------------------------------------------------------------------------
def _decode_times(mcfg, ccfg, params, seq, new, batch=1, use_fused=None,
                  reps=3, decode_mcfg=None):
    """Warm + time a full scanned decode; returns a list of per-rep
    (seconds for `new`-1 steps). decode_mcfg overrides the model config for
    the decode loop only (e.g. to force a MoE impl in decode while prefill
    keeps auto)."""
    import jax
    import jax.numpy as jnp

    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                readback)

    rtt = measure_rtt()
    dcfg = decode_mcfg or mcfg
    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, seq), 0,
                             mcfg.vocab_size)
    prefill = jax.jit(lambda p, i: llama.prefill_compressed(
        p, i, mcfg, ccfg, max_decode_len=new, use_flash=True))
    loop = jax.jit(lambda p, t, s: llama.decode_loop(
        p, t, s, new - 1, dcfg, ccfg, use_fused=use_fused))
    logits, state, _ = prefill(params, ids)
    tok = jnp.argmax(logits, -1)
    readback(loop(params, tok, state)[0])  # compile+warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        readback(loop(params, tok, state)[0])
        times.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    return times


def _stats(times_s, steps):
    ms = sorted(t / steps * 1e3 for t in times_s)
    mean = sum(ms) / len(ms)
    return {"ms_per_step_best": round(ms[0], 2),
            "ms_per_step_mean": round(mean, 2),
            "ms_per_step_spread": round(ms[-1] - ms[0], 2),
            "reps": len(ms)}


@phase("int4_decode_fused")
def int4_decode_fused():
    """r3 task #3: int4 weights 7B batch-1 decode with the fused Pallas
    grouped dequant-matmul (half-split nibble layout). Done-bar: int4
    >= 1.3x int8 tok/s (streaming floor says ~2x is available)."""
    import jax

    import realtime_kv_cache_compression_tpu as rtc
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.models.quantized_params import (
        quantize_params_streaming)
    from realtime_kv_cache_compression_tpu.utils.memory import (
        model_footprint_mb)

    out = {"arms": {}}
    seq, new = 4096, 64
    mcfg = dataclasses.replace(rtc.LLAMA2_7B,
                               max_position_embeddings=seq + new + 16)
    ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers,
                                 high_precision_bits=8,
                                 medium_precision_bits=4,
                                 low_precision_bits=2)
    for bits in (8, 4):
        params = quantize_params_streaming(
            llama.init_params(jax.random.PRNGKey(0), mcfg), bits=bits)
        pmb = model_footprint_mb(params)
        times = _decode_times(mcfg, ccfg, params, seq, new, reps=5)
        arm = {"params_mb": round(pmb), **_stats(times, new - 1)}
        arm["tok_s"] = round((new - 1) / min(times), 1)
        out["arms"][f"int{bits}"] = arm
        print(f"  int{bits}: {arm['ms_per_step_best']} ms/step best "
              f"(mean {arm['ms_per_step_mean']}, spread "
              f"{arm['ms_per_step_spread']}), {arm['tok_s']} tok/s, "
              f"{pmb:.0f} MB", flush=True)
        del params
        free()
    i8, i4 = out["arms"]["int8"], out["arms"]["int4"]
    out["int4_vs_int8_tok_s"] = round(i4["tok_s"] / i8["tok_s"], 2)
    out["done_bar_1p3x"] = out["int4_vs_int8_tok_s"] >= 1.3
    out["r3"] = {"int4_ms_per_step": 220.6, "int8_ms_per_step": 13.6}
    print(f"  int4 = {out['int4_vs_int8_tok_s']}x int8 tok/s "
          f"(bar 1.3x; r3 was 0.06x)", flush=True)
    return out


# ---------------------------------------------------------------------------
@phase("moe_decode_r4")
def moe_decode_r4():
    """Batch-1 MoE decode vs its weight-streaming floor (r3: 19.5 ms
    measured vs 4.2 ms floor = 4.6x). Arms: gather (r3 repro) and dynslice
    decode impls, bf16 and int8 expert weights. Floor per arm = (non-expert
    bytes + k/E of expert bytes) / 819 GB/s."""
    import jax

    import realtime_kv_cache_compression_tpu as rtc
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.models.quantized_params import (
        quantize_params)

    HBM_GBS = 819e9
    seq, new = 2048, 64
    base = dict(vocab_size=32000, hidden_size=2048, intermediate_size=5632,
                num_layers=12, num_heads=16, num_kv_heads=4, head_dim=128,
                max_position_embeddings=seq + new + 16, rope_theta=1e6,
                num_experts=8, num_experts_per_tok=2)
    mcfg = rtc.ModelConfig(**base)
    ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers,
                                 high_precision_bits=8,
                                 medium_precision_bits=4,
                                 low_precision_bits=2)
    out = {"config": {"experts": 8, "top_k": 2, "layers": 12,
                      "hidden": 2048, "intermediate": 5632},
           "r3": {"gather_bf16_ms_per_step": 19.54, "floor_ms": 4.2},
           "arms": {}}

    def floor_ms(params):
        import jax.numpy as jnp
        expert = other = 0
        for layer in params["layers"]:
            for k, v in layer.items():
                if k == "moe":
                    for mk, mv in v.items():
                        nb = sum(x.size * x.dtype.itemsize
                                 for x in jax.tree_util.tree_leaves(mv))
                        if mk == "gate":
                            other += nb
                        else:
                            expert += nb
                else:
                    other += sum(x.size * x.dtype.itemsize
                                 for x in jax.tree_util.tree_leaves(v))
        for k, v in params.items():
            if k != "layers":
                other += sum(x.size * x.dtype.itemsize
                             for x in jax.tree_util.tree_leaves(v))
        streamed = other + expert * (mcfg.num_experts_per_tok
                                     / mcfg.num_experts)
        return streamed / HBM_GBS * 1e3, streamed

    params_bf16 = llama.init_params(jax.random.PRNGKey(0), mcfg)
    params_int8 = quantize_params(params_bf16)
    for wlabel, params in (("bf16", params_bf16), ("int8", params_int8)):
        fl, streamed = floor_ms(params)
        for impl in ("gather", "dynslice"):
            dcfg = dataclasses.replace(mcfg, moe_impl=impl)
            times = _decode_times(mcfg, ccfg, params, seq, new, reps=5,
                                  decode_mcfg=dcfg)
            arm = _stats(times, new - 1)
            arm["floor_ms"] = round(fl, 2)
            arm["streamed_gb_per_step"] = round(streamed / 1e9, 2)
            arm["x_floor"] = round(arm["ms_per_step_best"] / fl, 2)
            out["arms"][f"{impl}_{wlabel}"] = arm
            print(f"  {impl}_{wlabel}: {arm['ms_per_step_best']} ms/step "
                  f"(floor {fl:.2f} -> {arm['x_floor']}x)", flush=True)
        free()
    best = min(out["arms"].values(), key=lambda a: a["ms_per_step_best"])
    out["best_x_floor"] = best["x_floor"]
    out["done_bar_2x_floor"] = best["x_floor"] <= 2.0
    del params_bf16, params_int8
    free()
    return out


# ---------------------------------------------------------------------------
@phase("fused_auto_check_r4")
def fused_auto_check_r4():
    """r3 task #7: the auto heuristic check with a variance model. Each arm
    times the full decode 7 times; auto_ok = auto's BEST is within 2% of
    the best arm OR within the combined spread (noise tie)."""
    import jax

    import realtime_kv_cache_compression_tpu as rtc
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.models.quantized_params import (
        quantize_params_streaming)

    out = {"regimes": {}}
    seq, new = 4096, 64
    mcfg = dataclasses.replace(rtc.TINYLLAMA_1_1B,
                               max_position_embeddings=seq + new + 16)
    ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers,
                                 high_precision_bits=8,
                                 medium_precision_bits=4,
                                 low_precision_bits=2)
    for label, bits in (("tinyllama_int8_b1", 8), ("tinyllama_bf16_b1", 16)):
        params = llama.init_params(jax.random.PRNGKey(0), mcfg)
        if bits == 8:
            params = quantize_params_streaming(params)
        auto = llama.resolve_fused_decode(params, mcfg, batch=1)
        row = {"auto_resolves_to": "fused" if auto else "xla"}
        for arm_label, fused in (("fused", True), ("xla", False)):
            times = _decode_times(mcfg, ccfg, params, seq, new,
                                  use_fused=fused, reps=7)
            row[arm_label] = _stats(times, new - 1)
            print(f"  {label} {arm_label}: best "
                  f"{row[arm_label]['ms_per_step_best']} mean "
                  f"{row[arm_label]['ms_per_step_mean']} spread "
                  f"{row[arm_label]['ms_per_step_spread']}", flush=True)
        best_arm = min(("fused", "xla"),
                       key=lambda a: row[a]["ms_per_step_best"])
        auto_arm = "fused" if auto else "xla"
        best = row[best_arm]["ms_per_step_best"]
        auto_best = row[auto_arm]["ms_per_step_best"]
        noise = (row["fused"]["ms_per_step_spread"]
                 + row["xla"]["ms_per_step_spread"])
        row["auto_within_pct"] = round(100 * (auto_best / best - 1), 2)
        row["noise_band_ms"] = round(noise, 2)
        row["auto_ok"] = (auto_best - best) <= max(noise, 0.02 * best)
        print(f"  {label}: auto={auto_arm} within "
              f"{row['auto_within_pct']}% (noise band {noise:.2f} ms) -> "
              f"ok={row['auto_ok']}", flush=True)
        out["regimes"][label] = row
        del params
        free()
    return out


# ---------------------------------------------------------------------------
@phase("chunked_hol_32k")
def chunked_hol_32k():
    """r3 task #5: measure chunked prefill where it is claimed to WIN —
    a 32K prompt admitted against an active decode (TinyLlama, one-shot
    prefill ~2.4 s at 32K). Arms: unchunked, auto (resolve_prefill_chunk),
    and chunk_4096. Metric: max inter-token gap of the active decode."""
    import numpy as np

    ctx = 32768
    out = {"context_len": ctx, "arms": {}}
    for label, chunk in (("unchunked", None), ("auto", "auto"),
                         ("chunk_4096", 4096)):
        eng, mcfg = _tiny_engine(prefill_chunk=chunk, slots=2,
                                 context_len=ctx, max_new=96)
        if label == "auto":
            out["auto_resolved_chunk"] = eng.prefill_chunk
            print(f"  auto resolved to chunk={eng.prefill_chunk}",
                  flush=True)
        rng = np.random.RandomState(1)
        short = rng.randint(1, mcfg.vocab_size, size=128).tolist()
        long_p = rng.randint(1, mcfg.vocab_size, size=32000).tolist()
        # Warm all programs: a short decode and a long admission.
        eng.submit(short, max_new_tokens=4)
        eng.run()
        eng.submit(long_p, max_new_tokens=4)
        eng.run()
        stamps = []
        eng.submit(short, max_new_tokens=96,
                   on_token=lambda req, new: stamps.append(
                       (time.time(), len(new))))
        for _ in range(6):
            eng.step()
        eng.submit(long_p, max_new_tokens=8)
        eng.run()
        gaps = [(stamps[i + 1][0] - stamps[i][0])
                for i in range(len(stamps) - 1)]
        out["arms"][label] = {
            "prefill_chunk": eng.prefill_chunk,
            "active_tokens": len(stamps),
            "max_intertoken_gap_ms": round(max(gaps) * 1e3, 1),
            "median_gap_ms": round(sorted(gaps)[len(gaps) // 2] * 1e3, 1),
        }
        print(f"  {label}: max gap "
              f"{out['arms'][label]['max_intertoken_gap_ms']} ms, median "
              f"{out['arms'][label]['median_gap_ms']} ms", flush=True)
        del eng
        free()
    un = out["arms"].get("unchunked", {}).get("max_intertoken_gap_ms")
    au = out["arms"].get("auto", {}).get("max_intertoken_gap_ms")
    if un and au:
        out["auto_hol_reduction"] = round(un / au, 1)
    return out


# ---------------------------------------------------------------------------
@phase("w8a8_decode")
def w8a8_decode():
    """W8A8 at 7B batch-1 decode: int8 weights are convert-bound above
    their 7.8 ms streaming floor (measured 13.6 ms — the int8->bf16
    convert is ~1 VPU pass over 6.7e9 weights); act_quant routes matmuls
    through the native int8xint8 MXU kernel (ops/pallas/int8_matmul.py),
    removing the convert from the weight stream."""
    import jax

    import realtime_kv_cache_compression_tpu as rtc
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.models.quantized_params import (
        quantize_params_streaming)

    out = {"arms": {}}
    seq, new = 4096, 64
    mcfg = dataclasses.replace(rtc.LLAMA2_7B,
                               max_position_embeddings=seq + new + 16)
    ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers,
                                 high_precision_bits=8,
                                 medium_precision_bits=4,
                                 low_precision_bits=2)
    for label, act in (("w8_bf16act", False), ("w8a8", True)):
        params = quantize_params_streaming(
            llama.init_params(jax.random.PRNGKey(0), mcfg), act_quant=act)
        times = _decode_times(mcfg, ccfg, params, seq, new, reps=5)
        arm = _stats(times, new - 1)
        arm["tok_s"] = round((new - 1) / min(times), 1)
        out["arms"][label] = arm
        print(f"  {label}: {arm['ms_per_step_best']} ms/step "
              f"({arm['tok_s']} tok/s)", flush=True)
        del params
        free()
    return out


# ---------------------------------------------------------------------------
@phase("moe_decode_int4")
def moe_decode_int4():
    """Int4 expert stacks through the fused kernel on the dynslice path
    (composes the int4 + MoE round-4 levers): same Mixtral-arch config as
    moe_decode_r4, floor recomputed at 0.5 bytes/element expert traffic."""
    import jax

    import realtime_kv_cache_compression_tpu as rtc
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.models.quantized_params import (
        quantize_params)

    HBM_GBS = 819e9
    seq, new = 2048, 64
    base = dict(vocab_size=32000, hidden_size=2048, intermediate_size=5632,
                num_layers=12, num_heads=16, num_kv_heads=4, head_dim=128,
                max_position_embeddings=seq + new + 16, rope_theta=1e6,
                num_experts=8, num_experts_per_tok=2)
    mcfg = rtc.ModelConfig(**base)
    ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers,
                                 high_precision_bits=8,
                                 medium_precision_bits=4,
                                 low_precision_bits=2)
    params = quantize_params(
        llama.init_params(jax.random.PRNGKey(0), mcfg), bits=4)
    expert = other = 0
    for layer in params["layers"]:
        for k, v in layer.items():
            leaves = jax.tree_util.tree_leaves(v)
            nb = sum(x.size * x.dtype.itemsize for x in leaves)
            if k == "moe":
                gate_nb = (v["gate"].size * v["gate"].dtype.itemsize
                           if hasattr(v["gate"], "size") else 0)
                expert += nb - gate_nb
                other += gate_nb
            else:
                other += nb
    for k, v in params.items():
        if k != "layers":
            other += sum(x.size * x.dtype.itemsize
                         for x in jax.tree_util.tree_leaves(v))
    streamed = other + expert * (mcfg.num_experts_per_tok
                                 / mcfg.num_experts)
    fl = streamed / HBM_GBS * 1e3
    dcfg = dataclasses.replace(mcfg, moe_impl="dynslice")
    times = _decode_times(mcfg, ccfg, params, seq, new, reps=5,
                          decode_mcfg=dcfg)
    arm = _stats(times, new - 1)
    arm["floor_ms"] = round(fl, 2)
    arm["streamed_gb_per_step"] = round(streamed / 1e9, 2)
    arm["x_floor"] = round(arm["ms_per_step_best"] / fl, 2)
    print(f"  dynslice_int4: {arm['ms_per_step_best']} ms/step "
          f"(floor {fl:.2f} -> {arm['x_floor']}x)", flush=True)
    del params
    free()
    return {"config": base, "dynslice_int4": arm}


# ---------------------------------------------------------------------------
@phase("flash_d128_r4")
def flash_d128_r4():
    """r3 stretch #8: push flash d=128 past 34.9% of roof. Candidate:
    stats_via_mxu — fold the denominator + prompt-mass [bq,bk] VPU
    reductions into one p @ [ones | indicator] MXU tile per rep. A/B over
    {stats_via_mxu, exp_bf16} x block shapes at the 7B GQA shape."""
    import jax
    import jax.numpy as jnp

    from realtime_kv_cache_compression_tpu.ops.pallas.flash_prefill import (
        flash_prefill_with_prompt_mass)
    from realtime_kv_cache_compression_tpu.utils.timing import measure_rtt

    rtt = measure_rtt()
    s, d, b = 4096, 128, 1
    peak_tfs = 197.0  # v5e bf16
    out = {"seq": s, "head_dim": d, "rtt_ms": rtt * 1e3,
           "r3_best": {"gqa_ms": 1.997, "pct_roof": 34.9}, "shapes": {}}
    for label, hq, hkv in (("gqa_32q_8kv", 32, 8),
                           ("7b_mha_32q_32kv", 32, 32)):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, s, hq, d), jnp.bfloat16)
        k = jax.random.normal(key, (b, s, hkv, d), jnp.bfloat16)
        v = jax.random.normal(key, (b, s, hkv, d), jnp.bfloat16)
        flops = 4 * b * hq * (s * s / 2) * d
        rows = {}
        best = None
        for sv in (False, True):
            for expb in (False, True):
                for bq, bk in ((256, 512), (512, 512), (512, 1024),
                               (1024, 512)):
                    tag = (f"{bq}x{bk}" + ("_mxu" if sv else "")
                           + ("_expb" if expb else ""))
                    try:
                        CHAIN = 8

                        @jax.jit
                        def chained(q, k, v, bq=bq, bk=bk, sv=sv,
                                    expb=expb):
                            def body(qc, _):
                                o = flash_prefill_with_prompt_mass(
                                    qc, k, v, 128, block_q=bq, block_k=bk,
                                    stats_via_mxu=sv, exp_bf16=expb)[0]
                                return (qc + 1e-6 * o).astype(qc.dtype), ()
                            qf, _ = jax.lax.scan(body, q, None,
                                                 length=CHAIN)
                            return qf

                        float(jnp.asarray(chained(q, k, v)[0, 0, 0, :8],
                                          jnp.float32).sum())
                        ts = []
                        for _ in range(3):
                            t0 = time.time()
                            float(jnp.asarray(
                                chained(q, k, v)[0, 0, 0, :8],
                                jnp.float32).sum())
                            ts.append(time.time() - t0 - rtt)
                        t = min(ts)
                        ms = t / CHAIN * 1e3
                        tfs = flops / (t / CHAIN) / 1e12
                        rows[tag] = {"ms": round(ms, 3),
                                     "tf_s": round(tfs, 1),
                                     "pct_roof": round(
                                         100 * tfs / peak_tfs, 1)}
                        if best is None or ms < rows[best]["ms"]:
                            best = tag
                        print(f"  {label} {tag}: {ms:.3f} ms "
                              f"({tfs:.0f} TF/s, "
                              f"{100*tfs/peak_tfs:.1f}%)", flush=True)
                    except Exception as e:
                        rows[tag] = {"error": str(e)[:200]}
                        print(f"  {label} {tag}: ERROR {e}", flush=True)
        out["shapes"][label] = {"blocks": rows, "best": best,
                                "best_pct_roof": rows.get(best, {}).get(
                                    "pct_roof")}
        free()
    return out


# ---------------------------------------------------------------------------
ALL = ["http_serving_r4", "fused_auto_check_r4", "chunked_hol_32k",
       "moe_decode_r4", "int4_decode_fused"]

if __name__ == "__main__":
    names = sys.argv[1:] or ALL
    if os.path.exists(OUT):
        # Partial reruns (a failed phase fixed and re-measured) must not
        # clobber the phases already recorded this round.
        with open(OUT) as f:
            RESULTS.update(json.load(f))
    RESULTS["meta"] = {"date": time.strftime("%Y-%m-%d %H:%M"),
                       "phases": sorted(set(names)
                                        | set(RESULTS.get("meta", {})
                                              .get("phases", [])))}
    import jax

    RESULTS["meta"]["device"] = str(jax.devices()[0].device_kind)
    for n in names:
        globals()[n]()
    save()
    print(f"\nwrote {OUT}", flush=True)
