#!/usr/bin/env python
"""TPU sitting #3: hardware numbers for the round-2 feature wave.

One process, one TPU claim (axon relay discipline); each phase is guarded
and the results JSON is rewritten after every phase, so a crash loses at
most the running phase. Produces benchmarks/r3_tpu_results.json; prose
lands in benchmarks/RESULTS.md.

Phases (VERDICT round-2 #4, #7):
  flash_d128     per-kernel flash prefill at d=128 (7B MHA 32q/32kv and
                 GQA 32q/8kv), block autotune + %-of-roof. The d=64
                 VPU-bound argument does not transfer; measure, don't
                 extrapolate.
  verify_step    the speculative-decoding economics at 7B scale: time one
                 T-token verify forward vs T ∈ {1,2,5,9} over a 4K
                 compressed cache, int8 weights. Weight-streaming-bound
                 decode predicts near-flat cost in T.
  int4_decode    int4 vs int8 weights at 7B batch 1 (weight-bound): does
                 the fused nibble unpack realize the halved streaming
                 floor, or does XLA materialize the bf16 weight?
  fused_auto_check  resolve_fused_decode vs both forced arms in the
                 regimes it rules on (VERDICT #5 done-criterion: ≤2%).
  spec_e2e       end-to-end speculative vs greedy decode on the trained
                 recall model (REAL prompt-lookup acceptance, outputs
                 asserted token-identical) — experiments/speculative_benchmark.
  prefix_cache   serving TTFT on a prefix-cache hit vs miss (4K prompt).
  chunked_hol    head-of-line blocking: max inter-token gap of an active
                 decode while a 4K prompt is admitted, chunked vs not.
  moe_decode     Mixtral-architecture (8 experts, top-2) prefill TTFT +
                 decode tok/s on a HBM-sized config, vs its dense twin.
  http_serving   sustained throughput through the OpenAI-style HTTP
                 front-end (real sockets, threads, SSE off).
"""

import json
import os
import sys
import threading
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r3_tpu_results.json")
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
@phase("flash_d128")
def flash_d128():
    import jax
    import jax.numpy as jnp

    from realtime_kv_cache_compression_tpu.ops.pallas.flash_prefill import (
        flash_prefill_with_prompt_mass)
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                timed)

    rtt = measure_rtt()
    s, d, b = 4096, 128, 1
    out = {"seq": s, "head_dim": d, "rtt_ms": rtt * 1e3, "shapes": {}}
    peak_tfs = 197.0  # v5e bf16
    for label, hq, hkv in (("7b_mha_32q_32kv", 32, 32),
                           ("gqa_32q_8kv", 32, 8)):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, s, hq, d), jnp.bfloat16)
        k = jax.random.normal(key, (b, s, hkv, d), jnp.bfloat16)
        v = jax.random.normal(key, (b, s, hkv, d), jnp.bfloat16)
        # Causal: ~half the S^2 tiles do work.
        flops = 4 * b * hq * (s * s / 2) * d
        rows = {}
        best = None
        for bq, bk in ((256, 512), (256, 1024), (512, 512), (512, 1024),
                       (512, 2048), (1024, 512), (1024, 1024)):
            try:
                fn = jax.jit(lambda q, k, v, bq=bq, bk=bk:
                             flash_prefill_with_prompt_mass(
                                 q, k, v, 128, block_q=bq, block_k=bk)[0])
                o = fn(q, k, v)
                float(jnp.asarray(o[0, 0, 0, :8], jnp.float32).sum())
                # Chain CHAIN iterations through a data dependency so the
                # relay RTT amortizes and XLA cannot elide repeats.
                CHAIN = 8

                @jax.jit
                def chained(q, k, v, bq=bq, bk=bk):
                    def body(qc, _):
                        o = flash_prefill_with_prompt_mass(
                            qc, k, v, 128, block_q=bq, block_k=bk)[0]
                        return (qc + 1e-6 * o).astype(qc.dtype), ()
                    qf, _ = jax.lax.scan(body, q, None, length=CHAIN)
                    return qf

                float(jnp.asarray(chained(q, k, v)[0, 0, 0, :8],
                                  jnp.float32).sum())
                t, _ = timed(lambda: float(jnp.asarray(
                    chained(q, k, v)[0, 0, 0, :8], jnp.float32).sum()),
                    rtt, reps=3)
                ms = t / CHAIN * 1e3
                tfs = flops / (t / CHAIN) / 1e12
                rows[f"{bq}x{bk}"] = {"ms": round(ms, 3),
                                      "tf_s": round(tfs, 1),
                                      "pct_roof": round(100 * tfs / peak_tfs,
                                                        1)}
                if best is None or ms < rows[best]["ms"]:
                    best = f"{bq}x{bk}"
                print(f"  {label} {bq}x{bk}: {ms:.3f} ms "
                      f"({tfs:.0f} TF/s)", flush=True)
            except Exception as e:
                rows[f"{bq}x{bk}"] = {"error": str(e)[:200]}
        out["shapes"][label] = {"blocks": rows, "best": best}
    return out


# ---------------------------------------------------------------------------
@phase("verify_step")
def verify_step():
    import jax
    import jax.numpy as jnp

    import realtime_kv_cache_compression_tpu as rtc
    from realtime_kv_cache_compression_tpu.models import llama, speculative
    from realtime_kv_cache_compression_tpu.models.quantized_params import (
        quantize_params_streaming)
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                timed)

    import dataclasses

    rtt = measure_rtt()
    out = {"rtt_ms": rtt * 1e3, "models": {}}
    for label, base, wbits in (("llama2_7b_int8", rtc.LLAMA2_7B, 8),
                               ("tinyllama_bf16", rtc.TINYLLAMA_1_1B, 16)):
        mcfg = dataclasses.replace(base, max_position_embeddings=4096 + 64)
        ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers,
                                     high_precision_bits=8,
                                     medium_precision_bits=4,
                                     low_precision_bits=2)
        params = llama.init_params(jax.random.PRNGKey(0), mcfg)
        if wbits == 8:
            params = quantize_params_streaming(params)
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, 4096), 0,
                                 mcfg.vocab_size)
        prefill = jax.jit(lambda p, i: llama.prefill_compressed(
            p, i, mcfg, ccfg, max_decode_len=32, use_flash=True))
        logits, state, _ = prefill(params, ids)
        float(jnp.asarray(logits[:, :8], jnp.float32).sum())
        rows = {}
        t1 = None
        for t_tokens in (1, 2, 5, 9):
            CHAIN = 16

            @jax.jit
            def chained(p, tok0, state, t_tokens=t_tokens):
                def body(tok, _):
                    lo, _blk = speculative.verify_forward(
                        p, tok, state, mcfg, ccfg)
                    return jnp.argmax(lo, -1).astype(jnp.int32), ()
                tokf, _ = jax.lax.scan(body, tok0, None, length=CHAIN)
                return tokf

            tok0 = jnp.zeros((1, t_tokens), jnp.int32)
            float(jnp.asarray(chained(params, tok0, state),
                              jnp.float32).sum())
            t, _ = timed(lambda: float(jnp.asarray(
                chained(params, tok0, state), jnp.float32).sum()), rtt,
                reps=3)
            ms = t / CHAIN * 1e3
            rows[t_tokens] = {"forward_ms": round(ms, 3),
                              "ms_per_token": round(ms / t_tokens, 3)}
            if t_tokens == 1:
                t1 = ms
            else:
                rows[t_tokens]["vs_1tok"] = round(ms / t1, 2)
            print(f"  {label} T={t_tokens}: {ms:.2f} ms/forward "
                  f"({ms / t_tokens:.2f} ms/token)", flush=True)
        out["models"][label] = rows
        del params, state, logits
        free()
    return out


# ---------------------------------------------------------------------------
def _decode_ms(mcfg, ccfg, params, seq, new, batch=1, use_fused=None):
    """Warm + time a full scanned decode; returns (ms/step, tok/s)."""
    import jax
    import jax.numpy as jnp

    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                timed)

    rtt = measure_rtt()
    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, seq), 0,
                             mcfg.vocab_size)
    prefill = jax.jit(lambda p, i: llama.prefill_compressed(
        p, i, mcfg, ccfg, max_decode_len=new, use_flash=True))
    loop = jax.jit(lambda p, t, s: llama.decode_loop(
        p, t, s, new - 1, mcfg, ccfg, use_fused=use_fused))
    logits, state, _ = prefill(params, ids)
    tok = jnp.argmax(logits, -1)
    toks, _ = loop(params, tok, state)
    float(jnp.asarray(toks, jnp.float32).sum())
    t_dec, _ = timed(lambda: float(jnp.asarray(
        loop(params, tok, state)[0], jnp.float32).sum()), rtt, reps=3)
    steps = new - 1
    return t_dec / steps * 1e3, batch * steps / t_dec


@phase("int4_decode")
def int4_decode():
    """Weight-streaming economics of int4 vs int8 weights at 7B, batch 1.

    Decode at batch 1 is weight-bound: int8 7B reads ~6.6 GB/step, int4
    ~3.4 GB. If the nibble unpack fuses into the dot operand stream (the
    design claim in models/llama.py:_matmul), step time should drop toward
    the halved floor; if XLA materializes the bf16 weight instead, it will
    be SLOWER than int8 — this phase is the honest check."""
    import dataclasses

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
        arm = {"params_mb": round(pmb)}
        for fused_label, fused in (("fused", True), ("xla", False)):
            ms, toks = _decode_ms(mcfg, ccfg, params, seq, new,
                                  use_fused=fused)
            arm[fused_label] = {"ms_per_step": round(ms, 2),
                                "tok_s": round(toks, 1)}
            print(f"  int{bits} {fused_label}: {ms:.2f} ms/step "
                  f"({toks:.0f} tok/s), params {pmb:.0f} MB", flush=True)
        out["arms"][f"int{bits}"] = arm
        del params
        free()
    return out


@phase("fused_auto_check")
def fused_auto_check():
    """resolve_fused_decode vs both forced arms in the regime it rules on:
    int8-weight TinyLlama batch 1 (the one measured XLA-wins case) and the
    bf16 twin (fused wins). Done-criterion: auto within 2% of the better
    arm (VERDICT round-2 #5)."""
    import dataclasses

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
            ms, toks = _decode_ms(mcfg, ccfg, params, seq, new,
                                  use_fused=fused)
            row[arm_label] = {"ms_per_step": round(ms, 2),
                              "tok_s": round(toks, 1)}
            print(f"  {label} {arm_label}: {ms:.2f} ms/step", flush=True)
        best = min(row["fused"]["ms_per_step"], row["xla"]["ms_per_step"])
        auto_ms = row["fused" if auto else "xla"]["ms_per_step"]
        row["auto_within_pct"] = round(100 * (auto_ms / best - 1), 2)
        row["auto_ok"] = row["auto_within_pct"] <= 2.0
        print(f"  {label}: auto={row['auto_resolves_to']} "
              f"within {row['auto_within_pct']}% of best", flush=True)
        out["regimes"][label] = row
        del params
        free()
    return out


# ---------------------------------------------------------------------------
@phase("spec_e2e")
def spec_e2e():
    from experiments import speculative_benchmark

    argv = ["--platform", "tpu", "--fillers", "512,4096", "--payload", "48",
            "--n-draft", "4", "--steps", "1200", "--flash",
            "--output-dir", "experiments/results/speculative_r3"]
    old = sys.argv
    sys.argv = ["speculative_benchmark.py"] + argv
    try:
        speculative_benchmark.main()
    finally:
        sys.argv = old
    with open("experiments/results/speculative_r3/"
              "speculative_benchmark.json") as f:
        res = json.load(f)
    free()
    return {"artifact": "experiments/results/speculative_r3/"
                        "speculative_benchmark.json",
            "results": res["results"]}


# ---------------------------------------------------------------------------
def _tiny_engine(prefill_chunk=None, prefix_cache=0, slots=2,
                 context_len=4096, max_new=64):
    import jax

    import realtime_kv_cache_compression_tpu as rtc
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.serving import ServingEngine

    import dataclasses

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


@phase("prefix_cache")
def prefix_cache():
    import numpy as np

    eng, mcfg = _tiny_engine(prefix_cache=4, slots=2, context_len=4096,
                             max_new=32)
    rng = np.random.RandomState(0)
    prompt = rng.randint(1, mcfg.vocab_size, size=4000).tolist()
    warm = rng.randint(1, mcfg.vocab_size, size=4000).tolist()
    # Warm the compiled programs on a DIFFERENT prompt (miss), then measure.
    eng.submit(warm, max_new_tokens=8)
    eng.run()
    t0 = time.time()
    rid = eng.submit(prompt, max_new_tokens=8)
    eng.run()
    miss_wall = time.time() - t0
    miss_ttft = eng.completed[rid].ttft
    t0 = time.time()
    rid2 = eng.submit(prompt, max_new_tokens=8)   # exact-prompt hit
    eng.run()
    hit_wall = time.time() - t0
    hit_ttft = eng.completed[rid2].ttft
    hits = eng.prefix_hits
    out = {"prompt_tokens": 4000,
           "miss_ttft_s": miss_ttft, "hit_ttft_s": hit_ttft,
           "miss_wall_s": miss_wall, "hit_wall_s": hit_wall,
           "ttft_speedup": round(miss_ttft / max(hit_ttft, 1e-9), 1),
           "prefix_hits": hits}
    print(f"  miss TTFT {miss_ttft*1e3:.0f} ms vs hit {hit_ttft*1e3:.0f} ms "
          f"({out['ttft_speedup']}x)", flush=True)
    del eng
    free()
    return out


@phase("chunked_hol")
def chunked_hol():
    import numpy as np

    out = {}
    for label, chunk in (("unchunked", None), ("chunk_512", 512)):
        eng, mcfg = _tiny_engine(prefill_chunk=chunk, slots=2,
                                 context_len=4096, max_new=96)
        rng = np.random.RandomState(1)
        short = rng.randint(1, mcfg.vocab_size, size=128).tolist()
        long_p = rng.randint(1, mcfg.vocab_size, size=4000).tolist()
        # Warm all programs: a short decode and a long admission.
        eng.submit(short, max_new_tokens=4)
        eng.run()
        eng.submit(long_p, max_new_tokens=4)
        eng.run()
        stamps = []
        eng.submit(short, max_new_tokens=96,
                   on_token=lambda req, new: stamps.append(
                       (time.time(), len(new))))
        # Let A decode a few steps, then admit the 4K prompt mid-flight.
        for _ in range(6):
            eng.step()
        eng.submit(long_p, max_new_tokens=8)
        eng.run()
        gaps = [(stamps[i + 1][0] - stamps[i][0])
                for i in range(len(stamps) - 1)]
        out[label] = {
            "active_tokens": len(stamps),
            "max_intertoken_gap_ms": round(max(gaps) * 1e3, 1),
            "median_gap_ms": round(sorted(gaps)[len(gaps) // 2] * 1e3, 1),
        }
        print(f"  {label}: max gap {out[label]['max_intertoken_gap_ms']} ms"
              f" median {out[label]['median_gap_ms']} ms", flush=True)
        del eng
        free()
    if "unchunked" in out and "chunk_512" in out:
        out["hol_reduction"] = round(
            out["unchunked"]["max_intertoken_gap_ms"]
            / max(out["chunk_512"]["max_intertoken_gap_ms"], 1e-9), 1)
    return out


# ---------------------------------------------------------------------------
@phase("moe_decode")
def moe_decode():
    import jax
    import jax.numpy as jnp

    import realtime_kv_cache_compression_tpu as rtc
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                timed)

    rtt = measure_rtt()
    out = {"rtt_ms": rtt * 1e3, "arms": {}}
    seq, new = 2048, 64
    base = dict(vocab_size=32000, hidden_size=2048, intermediate_size=5632,
                num_layers=12, num_heads=16, num_kv_heads=4, head_dim=128,
                max_position_embeddings=seq + new + 16, rope_theta=1e6)
    for label, extra in (
            ("mixtral_arch_8x", dict(num_experts=8, num_experts_per_tok=2)),
            ("dense_twin", {})):
        mcfg = rtc.ModelConfig(**base, **extra)
        ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers,
                                     high_precision_bits=8,
                                     medium_precision_bits=4,
                                     low_precision_bits=2)
        params = llama.init_params(jax.random.PRNGKey(0), mcfg)
        from realtime_kv_cache_compression_tpu.utils.memory import (
            model_footprint_mb)
        pmb = model_footprint_mb(params)
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, seq), 0,
                                 mcfg.vocab_size)
        prefill = jax.jit(lambda p, i: llama.prefill_compressed(
            p, i, mcfg, ccfg, max_decode_len=new, use_flash=True))
        loop = jax.jit(lambda p, t, s: llama.decode_loop(
            p, t, s, new - 1, mcfg, ccfg))
        logits, state, _ = prefill(params, ids)
        tok = jnp.argmax(logits, -1)
        toks, _ = loop(params, tok, state)
        float(jnp.asarray(toks, jnp.float32).sum())
        t_pre, _ = timed(lambda: float(jnp.asarray(
            prefill(params, ids)[0][:, :8], jnp.float32).sum()), rtt, reps=3)
        t_dec, _ = timed(lambda: float(jnp.asarray(
            loop(params, tok, state)[0], jnp.float32).sum()), rtt, reps=3)
        out["arms"][label] = {
            "params_mb": round(pmb),
            "ttft_ms": round(t_pre * 1e3, 1),
            "decode_tok_s": round((new - 1) / t_dec, 1),
            "ms_per_step": round(t_dec / (new - 1) * 1e3, 2),
        }
        print(f"  {label}: {pmb:.0f} MB, TTFT {t_pre*1e3:.0f} ms, "
              f"{(new-1)/t_dec:.0f} tok/s", flush=True)
        del params, state, logits
        free()
    return out


# ---------------------------------------------------------------------------
@phase("http_serving")
def http_serving():
    import urllib.request

    import numpy as np

    from realtime_kv_cache_compression_tpu.serving import CompletionServer
    from realtime_kv_cache_compression_tpu.utils.tokenizer import (
        ByteTokenizer)

    eng, mcfg = _tiny_engine(slots=4, context_len=1024, max_new=64)
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

    # Warm ALL compile paths the load will hit: prompts are padded to
    # context_len (one prefill shape), but batched admission pads the
    # BATCH to a power of two — 4 concurrent clients exercise admission
    # batches 1, 2, and 4, each a distinct XLA program. Warm them
    # concurrently so the timed window measures serving, not compiles.
    warm_threads = [threading.Thread(
        target=lambda: post({"prompt": [1] * 512, "max_tokens": 4}))
        for _ in range(4)]
    for t in warm_threads:
        t.start()
    for t in warm_threads:
        t.join()
    post({"prompt": [2] * 512, "max_tokens": 4})
    n_clients, per_client, max_tokens = 4, 6, 48
    results = []
    t0 = time.time()

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
    wall = time.time() - t0
    total_tokens = sum(r["usage"]["completion_tokens"] for r in results)
    ttfts = [r["rtkv"]["ttft_s"] for r in results if r["rtkv"]["ttft_s"]]
    out = {
        "clients": n_clients, "requests": len(results),
        "prompt_tokens": 512, "max_tokens": max_tokens,
        "wall_s": round(wall, 2),
        "sustained_tok_s": round(total_tokens / wall, 1),
        "avg_ttft_s": round(sum(ttfts) / max(len(ttfts), 1), 3),
        "avg_memory_savings": round(
            sum(r["rtkv"]["memory_savings"] for r in results)
            / len(results), 3),
    }
    print(f"  {len(results)} reqs in {wall:.1f}s -> "
          f"{out['sustained_tok_s']} tok/s sustained, "
          f"TTFT {out['avg_ttft_s']*1e3:.0f} ms", flush=True)
    srv.close()
    del eng
    free()
    return out


# ---------------------------------------------------------------------------
ALL = ["flash_d128", "verify_step", "int4_decode", "fused_auto_check",
       "spec_e2e", "prefix_cache", "chunked_hol", "moe_decode",
       "http_serving"]

if __name__ == "__main__":
    names = sys.argv[1:] or ALL
    RESULTS["meta"] = {"date": time.strftime("%Y-%m-%d %H:%M"),
                       "phases": names}
    import jax

    RESULTS["meta"]["device"] = str(jax.devices()[0].device_kind)
    for n in names:
        globals()[n]()
    save()
    print(f"\nwrote {OUT}", flush=True)
