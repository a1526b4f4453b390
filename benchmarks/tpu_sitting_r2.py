#!/usr/bin/env python
"""Round-2 TPU sitting: every kernel golden-checked on hardware + all perf
measurements, in ONE process (the relay serializes TPU clients; see
.claude/skills/verify/SKILL.md gotchas).

Phases (each try/except'd; results written incrementally):
  golden    flash prefill, ring pair-merge, fused decode (incl. group
            scales + decode pool), int8 matmul — vs XLA references.
  autotune  flash (block_q, block_k) sweep at 4K.
  decode4k  TinyLlama-1.1B arch @4K: TTFT, XLA vs fused decode, batch 1/8,
            anchor operating point, decode-pool arm.
  long32k   32K single chip: TTFT + decode, fused vs XLA.
  int8_7b   Llama-2-7B int8 weights: XLA vs act-quant int8 MXU decode.
  seqpar    16K seq-parallel prefill, seq axis on 1 device (degenerate but
            exercising the ring code path on hardware).

Usage: timeout 5400 python benchmarks/tpu_sitting_r2.py [--phases a,b,...]
"""

import argparse
import dataclasses
import functools
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r2_tpu_results.json")
RESULTS = {}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def save(phase, data):
    RESULTS[phase] = data
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2, default=str)
    log(f"[saved {phase}]")


PARTIAL: dict = {}


def partial_out() -> dict:
    """Phase-local result dict that survives a mid-phase crash: the phase
    decorator saves whatever accumulated here alongside the error."""
    PARTIAL.clear()
    return PARTIAL


def phase(name):
    def deco(fn):
        def run(*a, **kw):
            log(f"=== phase {name} ===")
            t0 = time.time()
            PARTIAL.clear()
            try:
                data = fn(*a, **kw)
                data["phase_seconds"] = round(time.time() - t0, 1)
                save(name, data)
            except Exception as e:
                log(traceback.format_exc())
                save(name, {**PARTIAL,
                            "error": f"{type(e).__name__}: {e}"})
        run.phase_name = name
        return run
    return deco


# ---------------------------------------------------------------------------

@phase("golden")
def golden():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                                   tiny_test_model)
    from realtime_kv_cache_compression_tpu.compression import (
        compress_layer_kv, dequantize_layer_cache)
    from realtime_kv_cache_compression_tpu.ops.attention import (
        attention_over_tokens, prefill_attention_with_prompt_mass)
    from realtime_kv_cache_compression_tpu.ops.pallas.decode_attention import (
        fused_decode_attention)
    from realtime_kv_cache_compression_tpu.ops.pallas.flash_prefill import (
        flash_pair_attention, flash_prefill_with_prompt_mass)
    from realtime_kv_cache_compression_tpu.ops.pallas.int8_matmul import (
        int8_matmul, int8_matmul_xla)

    out = partial_out()
    rng = np.random.default_rng(0)
    b, s, hq, hkv, d = 1, 512, 8, 4, 64
    q = jnp.asarray(rng.normal(size=(b, s, hq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.bfloat16)

    # 1) flash prefill (bf16 MXU path, slim scratch) vs dense.
    o_ref, pm_ref = prefill_attention_with_prompt_mass(q, k, v, 102)
    o_f, pm_f = jax.jit(lambda q, k, v: flash_prefill_with_prompt_mass(
        q, k, v, 102, block_q=256, block_k=256))(q, k, v)
    out["flash_out_err"] = float(jnp.abs(
        o_f.astype(jnp.float32) - o_ref.astype(jnp.float32)).max())
    out["flash_pmass_err"] = float(jnp.abs(pm_f - pm_ref).max())
    log(f"flash err out={out['flash_out_err']:.4f} "
        f"pm={out['flash_pmass_err']:.5f}")
    o_fb, pm_fb = jax.jit(lambda q, k, v: flash_prefill_with_prompt_mass(
        q, k, v, 102, block_q=256, block_k=256, exp_bf16=True))(q, k, v)
    out["flash_expbf16_out_err"] = float(jnp.abs(
        o_fb.astype(jnp.float32) - o_ref.astype(jnp.float32)).max())
    out["flash_expbf16_pmass_err"] = float(jnp.abs(pm_fb - pm_ref).max())
    log(f"flash exp_bf16 err out={out['flash_expbf16_out_err']:.4f} "
        f"pm={out['flash_expbf16_pmass_err']:.5f}")

    # 2) ring building blocks: manual 2-block merge == full causal flash.
    h = s // 2
    q2, k1, k2 = q[:, h:], k[:, :h], k[:, h:]
    v1, v2 = v[:, :h], v[:, h:]
    plen = jnp.full((b,), 102, jnp.int32)
    o_a, lse_a, pm_a = jax.jit(lambda *x: flash_pair_attention(
        *x, causal=False, block_q=256, block_k=256))(q2, k1, v1, plen)
    o_b, lse_b, pm_b = jax.jit(lambda *x: flash_pair_attention(
        *x, causal=True, block_q=256, block_k=256))(
            q2, k2, v2, jnp.zeros((b,), jnp.int32))
    m = jnp.maximum(lse_a, lse_b)
    wa, wb = jnp.exp(lse_a - m), jnp.exp(lse_b - m)
    wsum = wa + wb
    o_m = (o_a.astype(jnp.float32) * jnp.moveaxis(wa, 1, 2)[..., None]
           + o_b.astype(jnp.float32) * jnp.moveaxis(wb, 1, 2)[..., None]) \
        / jnp.moveaxis(wsum, 1, 2)[..., None]
    pm_m = ((pm_a * wa + pm_b * wb) / wsum).mean(axis=1)
    out["ring_merge_out_err"] = float(jnp.abs(
        o_m - o_ref[:, h:].astype(jnp.float32)).max())
    out["ring_merge_pm_err"] = float(jnp.abs(pm_m - pm_ref[:, h:]).max())
    log(f"ring merge err out={out['ring_merge_out_err']:.4f} "
        f"pm={out['ring_merge_pm_err']:.5f}")

    # 3) fused decode (single-launch, chunked, group scales, decode pool).
    for tag, gs, pool_blocks in (("fused", 0, 0), ("fused_groups", 16, 0),
                                 ("fused_pool", 0, 2)):
        mcfg = tiny_test_model(num_kv_heads=4, num_heads=8, head_dim=64,
                               dtype="float32")
        ccfg = CompressionConfig(num_layers=mcfg.num_layers,
                                 high_precision_bits=8,
                                 medium_precision_bits=4,
                                 low_precision_bits=2, quant_group_size=gs,
                                 pack_chunk_tokens=128,
                                 decode_pool_blocks=pool_blocks)
        kk = jnp.asarray(rng.normal(size=(1, 512, 4, 64)).astype(np.float32))
        vv = jnp.asarray(rng.normal(size=(1, 512, 4, 64)).astype(np.float32))
        mass = jnp.asarray(rng.random((1, 512)).astype(np.float32))
        cache, _ = compress_layer_kv(kk, vv, mass, 0, ccfg, mcfg)
        from realtime_kv_cache_compression_tpu.compression import (
            flush_recent, init_decode_pool, init_recent_cache)
        recent = init_recent_cache(1, 8, mcfg, dtype=jnp.float32)
        pool = init_decode_pool(1, 8, ccfg, mcfg)
        if pool is not None:
            # Fill + flush once so the pool participates.
            from realtime_kv_cache_compression_tpu.compression import (
                append_recent)
            for i in range(8):
                kn = jnp.asarray(rng.normal(size=(1, 1, 4, 64)),
                                 jnp.float32)
                recent = append_recent(recent, kn, kn,
                                       jnp.full((1, 1), 512 + i, jnp.int32))
            recent, pool = flush_recent(recent, pool, ccfg, mcfg)
        qd = jnp.asarray(rng.normal(size=(1, 1, 8, 64)).astype(np.float32))
        q_pos = jnp.full((1, 1), 520, jnp.int32)
        o_fd = jax.jit(lambda q: fused_decode_attention(
            q, cache, recent, q_pos, ccfg, pool=pool))(qd)
        k_c, v_c, pos_c, val_c = dequantize_layer_cache(cache, ccfg,
                                                        jnp.float32)
        ks, vs_, ps, vd = [k_c], [v_c], [pos_c], [val_c]
        rv = jnp.arange(recent.capacity)[None] < recent.length[:, None]
        ks.append(recent.k); vs_.append(recent.v)
        ps.append(recent.positions); vd.append(rv)
        if pool is not None:
            from realtime_kv_cache_compression_tpu.compression import (
                dequantize_decode_pool)
            kp, vp, pp, vp_ = dequantize_decode_pool(pool, jnp.float32)
            ks.append(kp); vs_.append(vp); ps.append(pp); vd.append(vp_)
        ref = attention_over_tokens(
            qd, jnp.concatenate(ks, 1), jnp.concatenate(vs_, 1),
            jnp.concatenate(ps, 1), jnp.concatenate(vd, 1), q_pos)
        out[f"{tag}_err"] = float(jnp.abs(o_fd - ref).max())
        log(f"{tag} err={out[f'{tag}_err']:.6f}")

    # 4) int8 matmul kernel on the MXU.
    m_, k_, n_ = 256, 2048, 2048
    x_q = jnp.asarray(rng.integers(-127, 128, size=(m_, k_)).astype(np.int8))
    w_q = jnp.asarray(rng.integers(-127, 128, size=(k_, n_)).astype(np.int8))
    xs = jnp.asarray(rng.random(m_).astype(np.float32)) + 0.01
    ws = jnp.asarray(rng.random(n_).astype(np.float32)) + 0.01
    y_k = jax.jit(lambda *a: int8_matmul(*a, out_dtype=jnp.float32))(
        x_q, w_q, xs, ws)
    y_r = int8_matmul_xla(x_q, w_q, xs, ws, out_dtype=jnp.float32)
    out["int8_matmul_err"] = float(jnp.abs(y_k - y_r).max())
    log(f"int8 matmul err={out['int8_matmul_err']:.6f}")
    return out


@phase("autotune")
def autotune():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realtime_kv_cache_compression_tpu.ops.pallas.flash_prefill import (
        flash_prefill_with_prompt_mass)
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                readback,
                                                                timed)

    rtt = measure_rtt()
    b, s, hq, hkv, d = 1, 4096, 32, 4, 64
    n_iter = 50  # chain kernels so duration >> RTT jitter (~ms on a 30 ms RTT)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, hq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.bfloat16)
    flops = 4 * s * s / 2 * hq * d
    rows = []
    # Feasible set under the GQA-folded kernel's 16MB scoped-vmem budget
    # (chipless compile probe 2026-08-17): bq<=512, bq*bk <= 512*1024.
    # A/B axes: exp_bf16 (probabilities in bf16 — halves transcendental
    # lanes if the VPU packs bf16, kills the p-cast pass) and fold_gqa
    # (group-folded vs per-head grid; fold=False lost everywhere in the
    # first round-2 sitting, kept as one sanity row).
    configs = [(True, eb, bq, bk)
               for eb in (False, True)
               for bq in (256, 512)
               for bk in (512, 1024, 2048)]
    configs.append((False, False, 512, 1024))
    for fold, eb, bq, bk in configs:
        try:
            def many(q, k, v, bq=bq, bk=bk, fold=fold, eb=eb):
                def body(_, qq):
                    o, _pm = flash_prefill_with_prompt_mass(
                        qq, k, v, 128, block_q=bq, block_k=bk,
                        fold_gqa=fold, exp_bf16=eb)
                    # Data dependency defeats CSE; epsilon keeps values.
                    return qq + o * jnp.asarray(1e-6, o.dtype)
                return jax.lax.fori_loop(0, n_iter, body, q)

            fn = jax.jit(many)
            readback(fn(q, k, v)[:, :8])
            dt, _ = timed(lambda: readback(fn(q, k, v)[:, :8]), rtt,
                          reps=3)
            per = dt / n_iter
            rows.append({"bq": bq, "bk": bk, "fold": fold, "exp_bf16": eb,
                         "ms": per * 1e3,
                         "tflops": flops / per / 1e12})
            log(f"fold={fold} expb={eb} bq={bq} bk={bk}: {per*1e3:.3f} ms "
                f"({flops/per/1e12:.0f} TF/s)")
        except Exception as e:
            rows.append({"bq": bq, "bk": bk, "fold": fold, "exp_bf16": eb,
                         "error": f"{type(e).__name__}"})
            log(f"fold={fold} expb={eb} bq={bq} bk={bk}: FAIL "
                f"{type(e).__name__}: {e}")
    ok = [r for r in rows if "ms" in r]
    best = min(ok, key=lambda r: r["ms"]) if ok else None
    roof_ms = flops / 197e12 * 1e3  # v5e bf16 peak
    return {"rows": rows, "best": best, "roof_ms": roof_ms,
            "pct_of_roof": (roof_ms / best["ms"] * 100) if best else None}


def _decode_bench(mcfg, ccfg, seq, new_tokens, batch, rtt, tag,
                  use_fused, params=None, block_q=None, block_k=None):
    import jax
    import jax.numpy as jnp

    from realtime_kv_cache_compression_tpu.compression import (
        summarize_layer_stats)
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.utils.timing import (readback,
                                                                timed)

    if params is None:
        params = jax.device_put(llama.init_params(jax.random.PRNGKey(0),
                                                  mcfg))
    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, seq), 0,
                             mcfg.vocab_size)
    flash_kw = {}
    prefill = jax.jit(lambda p, i: llama.prefill_compressed(
        p, i, mcfg, ccfg, max_decode_len=new_tokens, use_flash=True))
    loop = jax.jit(lambda p, t, s: llama.decode_loop(
        p, t, s, new_tokens - 1, mcfg, ccfg, use_fused=use_fused))
    t0 = time.time()
    logits, state, stats = prefill(params, ids)
    readback(logits[:, :8])
    log(f"[{tag}] prefill compile+run {time.time()-t0:.0f}s")
    tok = jnp.argmax(logits, axis=-1)
    t0 = time.time()
    toks, _ = loop(params, tok, state)
    readback(toks)
    log(f"[{tag}] loop compile+run {time.time()-t0:.0f}s")

    ttft, _ = timed(lambda: readback(prefill(params, ids)[0][:, :8]), rtt,
                    reps=3)
    dt, _ = timed(lambda: readback(loop(params, tok, state)[0]), rtt, reps=3)
    n = new_tokens - 1
    summary = summarize_layer_stats(stats)
    res = {"ttft_ms": ttft * 1e3, "ms_per_step": dt / n * 1e3,
           "tok_per_s": batch * n / dt,
           "kept_ratio": summary["avg_compression_ratio"],
           "byte_savings": summary["avg_memory_savings"]}
    log(f"[{tag}] TTFT {res['ttft_ms']:.1f} ms; "
        f"{res['ms_per_step']:.2f} ms/step; {res['tok_per_s']:.0f} tok/s; "
        f"kept {res['kept_ratio']:.3f}; savings {res['byte_savings']:.3f}")
    return res, params


@phase("attn_micro")
def attn_micro():
    """Isolate decode ATTENTION cost (no weights/MLP): fused kernel vs the
    XLA path at its two honest variants —
      xla_hoisted: dense dequantized cache materialized once outside the
        loop (what XLA's loop-invariant hoisting does inside decode_loop's
        scan; costs dense-cache HBM *footprint*),
      fused: the single-launch kernel reading packed bytes (keeps the
        compressed footprint).
    A decode_segment_tokens sweep turns the fused timings into a direct
    per-grid-step overhead estimate."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from realtime_kv_cache_compression_tpu import CompressionConfig
    from realtime_kv_cache_compression_tpu.compression import (
        compress_layer_kv, dequantize_layer_cache, init_recent_cache)
    from realtime_kv_cache_compression_tpu.ops.attention import (
        attention_over_tokens)
    from realtime_kv_cache_compression_tpu.ops.pallas.decode_attention import (
        fused_decode_attention)
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                readback,
                                                                timed)

    rtt = measure_rtt()
    rng = np.random.default_rng(0)
    hq, hkv, d = 32, 4, 64
    n_iter = 1000  # ~ms totals so the ~30ms-RTT subtraction doesn't drown us
    out = partial_out()
    from realtime_kv_cache_compression_tpu import tiny_test_model
    mcfg = tiny_test_model(num_kv_heads=hkv, num_heads=hq, head_dim=d,
                           dtype="bfloat16")
    for b, s in ((1, 4096), (8, 4096), (1, 32768)):
        base = CompressionConfig(num_layers=mcfg.num_layers,
                                 high_precision_bits=8,
                                 medium_precision_bits=4,
                                 low_precision_bits=2)
        k = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.bfloat16)
        mass = jnp.asarray(rng.random((b, s)), jnp.float32)
        cache, _ = compress_layer_kv(k, v, mass, 0, base, mcfg)
        recent = init_recent_cache(b, 64, mcfg, dtype=jnp.bfloat16)
        q = jnp.asarray(rng.normal(size=(b, 1, hq, d)), jnp.bfloat16)
        q_pos = jnp.full((b, 1), s + 1, jnp.int32)

        def run_fused(q, cfg):
            def body(_, qq):
                o = fused_decode_attention(qq, cache, recent, q_pos, cfg)
                return qq + o * jnp.asarray(1e-6, qq.dtype)
            return jax.lax.fori_loop(0, n_iter, body, q)

        def run_xla_hoisted(q):
            k_c, v_c, pos_c, valid_c = dequantize_layer_cache(
                cache, base, q.dtype)
            rv = (jnp.arange(recent.capacity)[None]
                  < recent.length[:, None])
            kk = jnp.concatenate([k_c.astype(q.dtype), recent.k], 1)
            vv = jnp.concatenate([v_c.astype(q.dtype), recent.v], 1)
            pp = jnp.concatenate([pos_c, recent.positions], 1)
            va = jnp.concatenate([valid_c, rv], 1)

            def body(_, qq):
                o = attention_over_tokens(qq, kk, vv, pp, va, q_pos)
                return qq + o * jnp.asarray(1e-6, qq.dtype)
            return jax.lax.fori_loop(0, n_iter, body, q)

        tag = f"b{b}_s{s//1024}k"
        row = {}
        out[tag] = row  # saved incrementally; per-config errors isolated
        try:
            fn = jax.jit(run_xla_hoisted)
            readback(fn(q))
            dt, _ = timed(lambda: readback(fn(q)), rtt, reps=3)
            row["xla_hoisted_us"] = dt / n_iter * 1e6
        except Exception as e:
            row["xla_hoisted_us"] = f"FAIL {type(e).__name__}"
        for seg in (1024, 2048, 3072, 4096):
            try:
                cfg = dc.replace(base, decode_segment_tokens=seg)
                fnf = jax.jit(functools.partial(run_fused, cfg=cfg))
                readback(fnf(q))
                dt, _ = timed(lambda: readback(fnf(q)), rtt, reps=3)
                row[f"fused_seg{seg}_us"] = dt / n_iter * 1e6
            except Exception as e:
                row[f"fused_seg{seg}_us"] = f"FAIL {type(e).__name__}"
        log(f"[{tag}] " + " ".join(
            f"{k_}={v_:.1f}us" if isinstance(v_, float) else f"{k_}={v_}"
            for k_, v_ in row.items()))
    return out


@phase("decode4k")
def decode4k():
    import jax

    from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                                   TINYLLAMA_1_1B,
                                                   reference_anchor_config)
    from realtime_kv_cache_compression_tpu.utils.timing import measure_rtt

    rtt = measure_rtt()
    mcfg = dataclasses.replace(TINYLLAMA_1_1B,
                               max_position_embeddings=4096 + 256)
    ccfg = CompressionConfig(num_layers=22, high_precision_bits=8,
                             medium_precision_bits=4, low_precision_bits=2)
    out = partial_out()
    res, params = _decode_bench(mcfg, ccfg, 4096, 128, 1, rtt,
                                "b1_xla", use_fused=False)
    out["b1_xla"] = res
    res, _ = _decode_bench(mcfg, ccfg, 4096, 128, 1, rtt, "b1_fused",
                           use_fused=True, params=params)
    out["b1_fused"] = res
    res, _ = _decode_bench(mcfg, ccfg, 4096, 128, 8, rtt, "b8_xla",
                           use_fused=False, params=params)
    out["b8_xla"] = res
    res, _ = _decode_bench(mcfg, ccfg, 4096, 128, 8, rtt, "b8_fused",
                           use_fused=True, params=params)
    out["b8_fused"] = res
    # Reference operating point (kept ~ 0.45, bits 16/8/4, threshold mode).
    accfg = reference_anchor_config(num_layers=22)
    res, _ = _decode_bench(mcfg, accfg, 4096, 128, 1, rtt, "anchor_xla",
                           use_fused=False, params=params)
    out["anchor_xla"] = res
    res, _ = _decode_bench(mcfg, accfg, 4096, 128, 1, rtt, "anchor_fused",
                           use_fused=True, params=params)
    out["anchor_fused"] = res
    # Retention-matched arm: kept EXACTLY 0.45 = the reference's measured
    # retention (uniform 0.45 ratios; token budget binds before the byte
    # budget at 8/4/2 bits). VERDICT #5's "report wins at the reference's
    # own retention point".
    rmcfg = dataclasses.replace(ccfg, early_layer_ratio=0.45,
                                middle_layer_ratio=0.45,
                                later_layer_ratio=0.45)
    res, _ = _decode_bench(mcfg, rmcfg, 4096, 128, 1, rtt, "kept045_xla",
                           use_fused=False, params=params)
    out["kept045_xla"] = res
    res, _ = _decode_bench(mcfg, rmcfg, 4096, 128, 1, rtt, "kept045_fused",
                           use_fused=True, params=params)
    out["kept045_fused"] = res
    # Decode-pool arm: ring 64 + 4 blocks over 128 new tokens (2 flushes).
    pcfg = dataclasses.replace(ccfg, decode_pool_blocks=4)
    import jax.numpy as jnp

    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.utils.timing import (readback,
                                                                timed)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 4096), 0,
                             mcfg.vocab_size)
    prefill = jax.jit(lambda p, i: llama.prefill_compressed(
        p, i, mcfg, pcfg, max_decode_len=64, use_flash=True))
    loop = jax.jit(lambda p, t, s: llama.decode_loop(
        p, t, s, 127, mcfg, pcfg, use_fused=False))
    logits, state, _ = prefill(params, ids)
    tok = jnp.argmax(logits, axis=-1)
    toks, _ = loop(params, tok, state)
    readback(toks)
    dt, _ = timed(lambda: readback(loop(params, tok, state)[0]), rtt, reps=3)
    out["b1_pool_xla"] = {"ms_per_step": dt / 127 * 1e3,
                          "tok_per_s": 127 / dt}
    log(f"[pool] {dt/127*1e3:.2f} ms/step with ring flush (ring 64, "
        f"4 blocks, 128 tokens)")
    return out


@phase("decode4k_fill")
def decode4k_fill():
    """Rerun of the two decode4k arms lost to a relay disconnect
    (kept045_fused + decode-pool); merges into r2_tpu_results.json."""
    import jax
    import jax.numpy as jnp

    from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                                   TINYLLAMA_1_1B)
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                readback,
                                                                timed)

    rtt = measure_rtt()
    mcfg = dataclasses.replace(TINYLLAMA_1_1B,
                               max_position_embeddings=4096 + 256)
    ccfg = CompressionConfig(num_layers=22, high_precision_bits=8,
                             medium_precision_bits=4, low_precision_bits=2)
    out = partial_out()
    params = jax.device_put(llama.init_params(jax.random.PRNGKey(0), mcfg))
    rmcfg = dataclasses.replace(ccfg, early_layer_ratio=0.45,
                                middle_layer_ratio=0.45,
                                later_layer_ratio=0.45)
    res, _ = _decode_bench(mcfg, rmcfg, 4096, 128, 1, rtt, "kept045_fused",
                           use_fused=True, params=params)
    out["kept045_fused"] = res
    pcfg = dataclasses.replace(ccfg, decode_pool_blocks=4)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 4096), 0,
                             mcfg.vocab_size)
    prefill = jax.jit(lambda p, i: llama.prefill_compressed(
        p, i, mcfg, pcfg, max_decode_len=64, use_flash=True))
    loop = jax.jit(lambda p, t, s: llama.decode_loop(
        p, t, s, 127, mcfg, pcfg, use_fused=False))
    logits, state, _ = prefill(params, ids)
    tok = jnp.argmax(logits, axis=-1)
    toks, _ = loop(params, tok, state)
    readback(toks)
    dt, _ = timed(lambda: readback(loop(params, tok, state)[0]), rtt, reps=3)
    out["b1_pool_xla"] = {"ms_per_step": dt / 127 * 1e3,
                          "tok_per_s": 127 / dt}
    log(f"[pool] {dt/127*1e3:.2f} ms/step with ring flush")
    # Merge into the decode4k record.
    d4 = dict(RESULTS.get("decode4k", {}))
    d4.update({k: v for k, v in out.items()})
    d4.pop("note", None)
    save("decode4k", d4)
    return dict(out)


@phase("long32k")
def long32k():
    import dataclasses as dc

    from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                                   TINYLLAMA_1_1B)
    from realtime_kv_cache_compression_tpu.utils.timing import measure_rtt

    rtt = measure_rtt()
    mcfg = dc.replace(TINYLLAMA_1_1B, max_position_embeddings=32768 + 256)
    ccfg = CompressionConfig(num_layers=22, high_precision_bits=8,
                             medium_precision_bits=4, low_precision_bits=2)
    out = partial_out()
    res, params = _decode_bench(mcfg, ccfg, 32768, 64, 1, rtt, "32k_xla",
                                use_fused=False)
    out["32k_xla"] = res
    res, _ = _decode_bench(mcfg, ccfg, 32768, 64, 1, rtt, "32k_fused",
                           use_fused=True, params=params)
    out["32k_fused"] = res
    return out


@phase("int8_7b")
def int8_7b():
    import dataclasses as dc

    import jax

    from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                                   LLAMA2_7B)
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.models.quantized_params import (
        quantize_params_streaming)
    from realtime_kv_cache_compression_tpu.utils.timing import measure_rtt

    rtt = measure_rtt()
    mcfg = dc.replace(LLAMA2_7B, max_position_embeddings=4096 + 256)
    ccfg = CompressionConfig(num_layers=32, high_precision_bits=8,
                             medium_precision_bits=4, low_precision_bits=2)
    out = partial_out()
    params = jax.device_put(llama.init_params(jax.random.PRNGKey(0), mcfg))
    qp = quantize_params_streaming(params)
    del params
    res, _ = _decode_bench(mcfg, ccfg, 4096, 64, 1, rtt, "7b_int8w_xla",
                           use_fused=False, params=qp)
    out["7b_int8w_xla"] = res
    # act_quant: flip the static flag on the same quantized tree (no copy).
    import dataclasses as dcc
    qp_act = jax.tree_util.tree_map(
        lambda x: x, qp)
    def set_act(t):
        return dcc.replace(t, act_quant=True)
    from realtime_kv_cache_compression_tpu.models.quantized_params import (
        QuantizedTensor)
    qp_act = jax.tree_util.tree_map(
        lambda x: set_act(x) if isinstance(x, QuantizedTensor) else x,
        qp, is_leaf=lambda x: isinstance(x, QuantizedTensor))
    res, _ = _decode_bench(mcfg, ccfg, 4096, 64, 1, rtt, "7b_int8_actq",
                           use_fused=False, params=qp_act)
    out["7b_int8_actq"] = res
    return out


@phase("int8_fused")
def int8_fused():
    """int8 WEIGHTS x fused decode kernel — the fused kernel has only been
    measured against bf16 weights; with int8 weights the weight-streaming
    floor halves, so KV-read savings matter twice as much per step."""
    import dataclasses as dc

    import jax

    from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                                   LLAMA2_7B, TINYLLAMA_1_1B)
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.models.quantized_params import (
        quantize_params_streaming)
    from realtime_kv_cache_compression_tpu.utils.timing import measure_rtt

    rtt = measure_rtt()
    out = partial_out()

    mcfg = dc.replace(TINYLLAMA_1_1B, max_position_embeddings=4096 + 256)
    ccfg = CompressionConfig(num_layers=22, high_precision_bits=8,
                             medium_precision_bits=4, low_precision_bits=2)
    params = jax.device_put(llama.init_params(jax.random.PRNGKey(0), mcfg))
    qp = quantize_params_streaming(params)
    del params
    res, _ = _decode_bench(mcfg, ccfg, 4096, 128, 1, rtt, "1b_int8w_xla",
                           use_fused=False, params=qp)
    out["1b_int8w_xla"] = res
    res, _ = _decode_bench(mcfg, ccfg, 4096, 128, 1, rtt, "1b_int8w_fused",
                           use_fused=True, params=qp)
    out["1b_int8w_fused"] = res
    del qp

    mcfg7 = dc.replace(LLAMA2_7B, max_position_embeddings=4096 + 256)
    ccfg7 = CompressionConfig(num_layers=32, high_precision_bits=8,
                              medium_precision_bits=4, low_precision_bits=2)
    params7 = jax.device_put(llama.init_params(jax.random.PRNGKey(0), mcfg7))
    qp7 = quantize_params_streaming(params7)
    del params7
    res, _ = _decode_bench(mcfg7, ccfg7, 4096, 64, 1, rtt, "7b_int8w_fused",
                           use_fused=True, params=qp7)
    out["7b_int8w_fused"] = res
    return out


@phase("int8_mm_micro")
def int8_mm_micro():
    """Raw matmul micro at 7B prefill shapes: which weight-matmul execution
    wins on the MXU? Arms:
      bf16        x_bf16 @ w_bf16 (jnp.dot)                  [baseline]
      dequant     x_bf16 @ convert(w_int8) (the current default path)
      pallas_i8   Pallas int8 x int8 kernel (ours)
      xla_i8      dot_general int8 x int8 -> int32 (XLA's native int8 MXU)
    Explains the int8_7b finding that act-quant prefill did NOT beat
    weight-only (456 vs 436 ms TTFT)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realtime_kv_cache_compression_tpu.ops.pallas.int8_matmul import (
        int8_matmul, int8_matmul_xla)
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                readback,
                                                                timed)

    rtt = measure_rtt()
    rng = np.random.default_rng(0)
    out = partial_out()
    n_iter = 40
    for m, k, n in ((4096, 4096, 4096), (4096, 4096, 11008),
                    (4096, 11008, 4096)):
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
        xq = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        xs = jnp.asarray(rng.random(m) + 0.5, jnp.float32)
        ws = jnp.asarray(rng.random(n) + 0.5, jnp.float32)
        flops = 2.0 * m * k * n

        def chain(step):
            def many(a):
                def body(_, acc):
                    y = step(acc)
                    # Cheap data dependency: fold one output column back in.
                    return acc + y[:, :1].astype(acc.dtype) * 1e-6
                return jax.lax.fori_loop(0, n_iter, body, a)
            return many

        arms = {
            "bf16": (chain(lambda a: jnp.dot(
                a, w, preferred_element_type=jnp.float32)), x),
            "dequant": (chain(lambda a: jnp.dot(
                a, wq.astype(a.dtype),
                preferred_element_type=jnp.float32) * ws[None, :]), x),
            "pallas_i8": (chain(lambda a: int8_matmul(
                jnp.round(a * 127).astype(jnp.int8), wq, xs, ws)), x),
            "xla_i8": (chain(lambda a: int8_matmul_xla(
                jnp.round(a * 127).astype(jnp.int8), wq, xs, ws)), x),
        }
        tag = f"{m}x{k}x{n}"
        row = {}
        out[tag] = row
        for name, (fn, arg) in arms.items():
            try:
                jf = jax.jit(fn)
                readback(jf(arg)[:8, :8])
                dt, _ = timed(lambda: readback(jf(arg)[:8, :8]), rtt, reps=3)
                per = dt / n_iter
                row[name] = {"ms": per * 1e3, "tflops": flops / per / 1e12}
                log(f"[{tag}] {name}: {per*1e3:.3f} ms "
                    f"({flops/per/1e12:.0f} TF/s)")
            except Exception as e:
                row[name] = f"FAIL {type(e).__name__}"
                log(f"[{tag}] {name}: FAIL {type(e).__name__}: {e}")
    return dict(out)


@phase("seqpar")
def seqpar():
    import jax
    import jax.numpy as jnp

    from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                                   TINYLLAMA_1_1B)
    from realtime_kv_cache_compression_tpu.models import llama
    from realtime_kv_cache_compression_tpu.parallel.seq_parallel import (
        create_seq_mesh, seq_parallel_prefill)
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                readback,
                                                                timed)
    import dataclasses as dc

    rtt = measure_rtt()
    mcfg = dc.replace(TINYLLAMA_1_1B, max_position_embeddings=16384 + 256)
    ccfg = CompressionConfig(num_layers=22, high_precision_bits=8,
                             medium_precision_bits=4, low_precision_bits=2)
    params = jax.device_put(llama.init_params(jax.random.PRNGKey(0), mcfg))
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16384), 0,
                             mcfg.vocab_size)
    mesh = create_seq_mesh(1)
    fn = jax.jit(lambda p, i: seq_parallel_prefill(
        p, i, mcfg, ccfg, mesh, max_decode_len=16, interpret=False))
    t0 = time.time()
    logits, state, _ = fn(params, ids)
    readback(logits[:, :8])
    log(f"seqpar 16K compile+run {time.time()-t0:.0f}s")
    dt, _ = timed(lambda: readback(fn(params, ids)[0][:, :8]), rtt, reps=3)
    # Decode a few steps off the seq-parallel cache to prove end-to-end.
    tok = jnp.argmax(logits, axis=-1)
    loop = jax.jit(lambda p, t, s: llama.decode_loop(p, t, s, 8, mcfg, ccfg))
    toks, _ = loop(params, tok, state)
    readback(toks)
    return {"prefill_16k_ms": dt * 1e3,
            "decode_from_seqpar_cache": "ok"}


@phase("flash_calibration")
def flash_calibration():
    """Compare our flash(+prompt mass) against jax's library TPU flash
    kernel at the same shapes — the honest 'achievable' reference for
    VERDICT #8 (the naive causal-FLOPs roof ignores d=64 MXU
    underutilization)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    from realtime_kv_cache_compression_tpu.ops.pallas.flash_prefill import (
        flash_prefill_with_prompt_mass)
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                readback,
                                                                timed)

    rtt = measure_rtt()
    b, s, hq, hkv, d = 1, 4096, 32, 4, 64
    n_iter = 50
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, hq, s, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, hq, s, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, hq, s, d)), jnp.bfloat16)
    out = partial_out()

    def many_lib(q, k, v):
        def body(_, qq):
            o = fa.flash_attention(qq, k, v, causal=True, sm_scale=d ** -0.5)
            return qq + o * jnp.asarray(1e-6, o.dtype)
        return jax.lax.fori_loop(0, n_iter, body, q)

    fn = jax.jit(many_lib)
    readback(fn(q, k, v)[:, :, :8])
    dt, _ = timed(lambda: readback(fn(q, k, v)[:, :, :8]), rtt, reps=3)
    out["library_flash_ms"] = dt / n_iter * 1e3
    log(f"library flash (MHA {hq} heads, no side-channel): "
        f"{dt/n_iter*1e3:.3f} ms")

    q2 = jnp.asarray(rng.normal(size=(b, s, hq, d)), jnp.bfloat16)
    k2 = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.bfloat16)
    v2 = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.bfloat16)

    def many_ours(q, k, v):
        def body(_, qq):
            o, _pm = flash_prefill_with_prompt_mass(qq, k, v, 128,
                                                    block_q=512,
                                                    block_k=1024)
            return qq + o * jnp.asarray(1e-6, o.dtype)
        return jax.lax.fori_loop(0, n_iter, body, q)

    fn2 = jax.jit(many_ours)
    readback(fn2(q2, k2, v2)[:, :8])
    dt2, _ = timed(lambda: readback(fn2(q2, k2, v2)[:, :8]), rtt, reps=3)
    out["ours_ms"] = dt2 / n_iter * 1e3
    out["ratio_vs_library"] = dt2 / dt
    log(f"ours (GQA native + prompt-mass side-channel): "
        f"{dt2/n_iter*1e3:.3f} ms ({dt2/dt:.2f}x library)")
    return out


PHASES = [golden, autotune, attn_micro, decode4k, decode4k_fill, long32k,
          int8_7b, int8_fused, int8_mm_micro, seqpar, flash_calibration]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phases", default=None,
                    help="comma list; default all")
    args = ap.parse_args()
    want = set(args.phases.split(",")) if args.phases else None
    if os.path.exists(OUT):
        with open(OUT) as f:
            RESULTS.update(json.load(f))
    import jax
    log(f"devices: {jax.devices()}")
    for ph in PHASES:
        if want is None or ph.phase_name in want:
            ph()
    log("sitting done")


if __name__ == "__main__":
    main()
