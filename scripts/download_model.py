"""Checkpoint fetcher (reference scripts/download_model.py parity).

The reference calls huggingface_hub.snapshot_download for
Llama-2-7b-chat-hf. Here the download is optional and gated: in zero-egress
environments the script explains the offline path instead of failing — the
framework loads any local safetensors directory via
models/weights.load_hf_checkpoint (no torch needed), passed to the CLIs as
--checkpoint/--tokenizer.

Usage:
  python scripts/download_model.py [--model-id ID] [--out DIR]
"""

from __future__ import annotations

import argparse
import sys

PRESETS = {
    "llama-2-7b-chat": "meta-llama/Llama-2-7b-chat-hf",
    "llama-2-7b": "meta-llama/Llama-2-7b-hf",
    "llama-2-13b": "meta-llama/Llama-2-13b-hf",
    "llama-3-8b": "meta-llama/Meta-Llama-3-8B",
    "tinyllama": "TinyLlama/TinyLlama-1.1B-Chat-v1.0",
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model-id", default=PRESETS["llama-2-7b-chat"],
                    help="HF repo id, or a preset name: "
                         + ", ".join(PRESETS))
    ap.add_argument("--out", default="data/checkpoints",
                    help="local directory for the snapshot")
    args = ap.parse_args()
    model_id = PRESETS.get(args.model_id, args.model_id)

    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        print("huggingface_hub is not installed.", file=sys.stderr)
        print(_offline_help(args.out), file=sys.stderr)
        return 1

    try:
        path = snapshot_download(
            model_id, local_dir=f"{args.out}/{model_id.split('/')[-1]}",
            allow_patterns=["*.safetensors", "*.json", "tokenizer.model"])
    except Exception as e:  # zero-egress / auth-gated repos
        print(f"download failed ({type(e).__name__}: {e})", file=sys.stderr)
        print(_offline_help(args.out), file=sys.stderr)
        return 1

    print(f"checkpoint at: {path}")
    print("run: python experiments/run_compression_experiment.py "
          f"--checkpoint {path} --tokenizer {path}")
    return 0


def _offline_help(out: str) -> str:
    return (
        "Offline path: place a HF-format checkpoint directory (config.json +"
        " *.safetensors + tokenizer files) under\n"
        f"  {out}/<name>/\n"
        "and pass it to the CLIs:\n"
        "  python experiments/run_compression_experiment.py \\\n"
        f"      --checkpoint {out}/<name> --tokenizer {out}/<name>\n"
        "Weights load via safetensors (models/weights.py) — torch is not"
        " required. Without a checkpoint every CLI also runs hermetically on"
        " random-weight presets (--model tinyllama|llama2-7b|llama2-13b)."
    )


if __name__ == "__main__":
    sys.exit(main())
