#!/usr/bin/env bash
# End-to-end LongBench runner (reference scripts/run_longbench.sh parity).
# Env-var hyperparameter overrides + flag pass-through to the main CLI.
set -euo pipefail
cd "$(dirname "$0")/.."

ALPHA="${ALPHA:-0.4}"
BETA="${BETA:-0.3}"
GAMMA="${GAMMA:-0.3}"
THETA_H="${THETA_H:-0.7}"
THETA_M="${THETA_M:-0.3}"
EARLY_RATIO="${EARLY_RATIO:-0.8}"
MIDDLE_RATIO="${MIDDLE_RATIO:-0.6}"
LATER_RATIO="${LATER_RATIO:-0.4}"
MODEL="${MODEL:-tinyllama}"
MAX_LENGTH="${MAX_LENGTH:-4096}"
MAX_SAMPLES="${MAX_SAMPLES:-10}"

exec python experiments/run_compression_experiment.py \
  --model "$MODEL" \
  --alpha "$ALPHA" --beta "$BETA" --gamma "$GAMMA" \
  --theta-h "$THETA_H" --theta-m "$THETA_M" \
  --early-ratio "$EARLY_RATIO" --middle-ratio "$MIDDLE_RATIO" \
  --later-ratio "$LATER_RATIO" \
  --max-length "$MAX_LENGTH" --max-samples "$MAX_SAMPLES" \
  "$@"
