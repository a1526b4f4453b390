#!/usr/bin/env python
"""Round-2 TPU eval-artifact sitting: refresh the committed experiment
artifacts with the CURRENT code on real hardware.

Runs the full experiment CLI twice inside ONE process (the axon relay
serializes TPU clients; a second process would wedge on the claim):

  A. tpu_flagship_r2        TinyLlama-1.1B arch, flash prefill, default
                            8/4/2 quantile config, compressed + baseline,
                            3 tasks x 10 samples @4K, 100 new tokens.
  B. tpu_ref_anchor_r2      Same model/data, the reference's committed
                            operating point (16/8/4 bits, theta 0.6/0.2,
                            alpha/beta/gamma .6/.2/.2, threshold tiers,
                            kept ~ 0.45) — compressed arm only.

Synthetic planted-answer data (zero-egress env); weights are random-init,
so quality is the hermetic lower bound — the hardware value of this
artifact is TTFT / tokens/s / measured memory savings through the whole
eval pipeline at flagship scale.

Usage: timeout 3600 python benchmarks/tpu_eval_sitting.py
"""

import os
import sys
import time
import traceback

# Zero-egress container: skip the HF hub's 5x retry-with-backoff per task
# (minutes of dead time) and go straight to the local/synthetic fallback.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("HF_DATASETS_OFFLINE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import experiments.run_compression_experiment as exp  # noqa: E402

COMMON = [
    "--model", "tinyllama", "--flash",
    "--max-length", "4096", "--max-new-tokens", "100",
    "--tasks", "narrativeqa", "qasper", "multifieldqa_en",
    "--max-samples", "10", "--eval-batch", "5",
    "--output-dir", "experiments/results",
]

RUNS = [
    ("tpu_flagship_r2", COMMON + ["--baseline",
                                  "--experiment-name", "tpu_flagship_r2"]),
    ("tpu_ref_anchor_r2", COMMON + [
        "--alpha", "0.6", "--beta", "0.2", "--gamma", "0.2",
        "--theta-h", "0.6", "--theta-m", "0.2",
        "--high-bits", "16", "--medium-bits", "8", "--low-bits", "4",
        "--tier-mode", "threshold",
        "--experiment-name", "tpu_ref_anchor_r2"]),
]


def main():
    runs = RUNS
    if "--smoke" in sys.argv:
        # CPU smoke of the two-runs-one-process flow (tiny model).
        shrink = ["--platform", "cpu", "--model", "tiny-test",
                  "--layers", "2", "--max-length", "256",
                  "--max-new-tokens", "8", "--max-samples", "2",
                  "--eval-batch", "2", "--synthetic-context-words", "120",
                  "--output-dir", "/tmp/eval_sitting_smoke"]
        runs = [(n, [a for a in argv if a != "--flash"] + shrink)
                for n, argv in RUNS]
    for name, argv in runs:
        print(f"=== {name} ===", file=sys.stderr, flush=True)
        t0 = time.time()
        sys.argv = ["run_compression_experiment.py"] + argv
        try:
            exp.main()
        except Exception:
            traceback.print_exc()
        print(f"=== {name} done in {time.time() - t0:.1f}s ===",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
