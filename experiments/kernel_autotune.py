#!/usr/bin/env python
"""Autotune Pallas kernel block sizes on the real TPU.

Sweeps flash-prefill (block_q, block_k) and reports per-config runtime for
the attention kernel alone and for a full compressed prefill, using
RTT-corrected readback timing (utils/timing.py). Writes JSON + the best
config to experiments/results/autotune.
"""

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=4)
    ap.add_argument("--head-dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--blocks", nargs="+", type=int,
                    default=[128, 256, 512, 1024])
    ap.add_argument("--output-dir", default="experiments/results/autotune")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from realtime_kv_cache_compression_tpu.ops.pallas.flash_prefill import (
        flash_prefill_with_prompt_mass)
    from realtime_kv_cache_compression_tpu.utils.timing import (measure_rtt,
                                                                readback,
                                                                timed)

    rtt = measure_rtt()
    print(f"rtt {rtt*1e3:.1f} ms", file=sys.stderr, flush=True)
    b, s, hq, hkv, d = (args.batch, args.seq, args.heads, args.kv_heads,
                        args.head_dim)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, hq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.bfloat16)
    p = 128

    results = []
    for bq, bk in itertools.product(args.blocks, args.blocks):
        if bq > s or bk > s:
            continue
        try:
            fn = jax.jit(lambda q, k, v: flash_prefill_with_prompt_mass(
                q, k, v, p, block_q=bq, block_k=bk))
            readback(fn(q, k, v)[0][:, :8])  # compile
            dt, _ = timed(lambda: readback(fn(q, k, v)[0][:, :8]), rtt,
                          reps=5)
            flops = 4 * b * s * s / 2 * hq * d  # causal ≈ half the square
            results.append({"block_q": bq, "block_k": bk, "ms": dt * 1e3,
                            "tflops": flops / dt / 1e12})
            print(f"bq={bq} bk={bk}: {dt*1e3:.2f} ms "
                  f"({flops/dt/1e12:.1f} TFLOP/s)", flush=True)
        except Exception as e:
            results.append({"block_q": bq, "block_k": bk,
                            "error": repr(e)})
            print(f"bq={bq} bk={bk}: {type(e).__name__}", flush=True)

    os.makedirs(args.output_dir, exist_ok=True)
    ok = [r for r in results if "error" not in r]
    best = min(ok, key=lambda r: r["ms"]) if ok else None
    with open(os.path.join(args.output_dir, "flash_autotune.json"),
              "w") as f:
        json.dump({"results": results, "best": best,
                   "shape": dict(b=b, s=s, hq=hq, hkv=hkv, d=d)}, f,
                  indent=2)
    if best:
        print(f"BEST: block_q={best['block_q']} block_k={best['block_k']} "
              f"{best['ms']:.2f} ms")


if __name__ == "__main__":
    main()
