"""Quality + performance metrics.

Capability parity with the reference's metric stack:
  * text metrics — /root/reference/src/utils/eval_utils.py:24-118
    (normalize/F1/EM/accuracy/ROUGE/BLEU/aggregation). The F1/EM/normalize
    formulas are re-implemented identically so quality numbers are directly
    comparable to the reference's committed artifacts (BASELINE.md anchors).
  * `CompressionMetrics` accumulator — src/evaluation/metrics.py:6-99.
  * `PerformanceTimer` + throughput helpers — src/evaluation/metrics.py:101-175.
"""

from __future__ import annotations

import re
import string
import time
from collections import Counter
from typing import Dict, List


# ---------------------------------------------------------------------------
# Text metrics (eval_utils.py parity)
# ---------------------------------------------------------------------------

def normalize_text(text: str) -> str:
    """Lowercase, strip punctuation/articles, collapse whitespace
    (eval_utils.py:24-35 semantics)."""
    text = text.lower()
    text = "".join(ch for ch in text if ch not in set(string.punctuation))
    text = re.sub(r"\b(a|an|the)\b", " ", text)
    return " ".join(text.split())


def f1_score(prediction: str, ground_truth: str) -> float:
    """Token-overlap F1 (eval_utils.py:52-73)."""
    pred_tokens = normalize_text(prediction).split()
    truth_tokens = normalize_text(ground_truth).split()
    if not pred_tokens or not truth_tokens:
        return float(pred_tokens == truth_tokens)
    common = Counter(pred_tokens) & Counter(truth_tokens)
    num_same = sum(common.values())
    if num_same == 0:
        return 0.0
    precision = num_same / len(pred_tokens)
    recall = num_same / len(truth_tokens)
    return 2 * precision * recall / (precision + recall)


def exact_match(prediction: str, ground_truth: str) -> float:
    """EM on normalized text (eval_utils.py:75-80)."""
    return float(normalize_text(prediction) == normalize_text(ground_truth))


def accuracy_score(prediction: str, ground_truth: str) -> float:
    """Classification-style accuracy: the gold label appears in the
    prediction (LongBench convention for trec/lsht)."""
    return float(normalize_text(ground_truth) in normalize_text(prediction))


def rouge_scores(prediction: str, ground_truth: str) -> Dict[str, float]:
    """ROUGE-1/2/L F-measures via rouge_score, with a pure-Python LCS
    fallback (eval_utils.py:37-50 used rouge_score unconditionally)."""
    try:
        from rouge_score import rouge_scorer

        scorer = rouge_scorer.RougeScorer(["rouge1", "rouge2", "rougeL"],
                                          use_stemmer=True)
        s = scorer.score(ground_truth, prediction)
        return {"rouge1": s["rouge1"].fmeasure,
                "rouge2": s["rouge2"].fmeasure,
                "rougeL": s["rougeL"].fmeasure}
    except ImportError:
        return {"rouge1": _lcs_f(prediction, ground_truth, 1),
                "rouge2": _lcs_f(prediction, ground_truth, 2),
                "rougeL": _rouge_l(prediction, ground_truth)}


def _ngrams(tokens: List[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def _lcs_f(pred: str, truth: str, n: int) -> float:
    p = normalize_text(pred).split()
    t = normalize_text(truth).split()
    if len(p) < n or len(t) < n:
        return 0.0
    overlap = sum((_ngrams(p, n) & _ngrams(t, n)).values())
    prec = overlap / max(len(p) - n + 1, 1)
    rec = overlap / max(len(t) - n + 1, 1)
    return 2 * prec * rec / (prec + rec) if prec + rec else 0.0


def _rouge_l(pred: str, truth: str) -> float:
    p = normalize_text(pred).split()
    t = normalize_text(truth).split()
    if not p or not t:
        return 0.0
    dp = [[0] * (len(t) + 1) for _ in range(len(p) + 1)]
    for i in range(1, len(p) + 1):
        for j in range(1, len(t) + 1):
            dp[i][j] = (dp[i - 1][j - 1] + 1 if p[i - 1] == t[j - 1]
                        else max(dp[i - 1][j], dp[i][j - 1]))
    lcs = dp[-1][-1]
    prec, rec = lcs / len(p), lcs / len(t)
    return 2 * prec * rec / (prec + rec) if prec + rec else 0.0


def bleu_score(prediction: str, ground_truth: str) -> float:
    """Sentence BLEU via sacrebleu with graceful fallback
    (eval_utils.py:82-98)."""
    try:
        import sacrebleu

        return sacrebleu.sentence_bleu(prediction, [ground_truth]).score / 100
    except Exception:
        return _lcs_f(prediction, ground_truth, 1)


def best_over_ground_truths(metric_fn, prediction: str,
                            ground_truths: List[str]) -> float:
    """LongBench convention: max over the reference answers."""
    if not ground_truths:
        return 0.0
    return max(metric_fn(prediction, gt) for gt in ground_truths)


def aggregate_metrics(per_sample: List[Dict[str, float]]) -> Dict[str, float]:
    """Mean of each metric key over samples (eval_utils.py:100-118)."""
    if not per_sample:
        return {}
    keys = set().union(*(s.keys() for s in per_sample))
    return {k: sum(s.get(k, 0.0) for s in per_sample) / len(per_sample)
            for k in keys}


# ---------------------------------------------------------------------------
# Compression metric accumulator (metrics.py:6-99 parity)
# ---------------------------------------------------------------------------

class CompressionMetrics:
    """Accumulates per-layer (original, compressed) element counts; overall
    ratio = Σcompressed / Σoriginal."""

    def __init__(self):
        self.layer_records: List[Dict[str, float]] = []

    def record_layer(self, layer_idx: int, original: float, compressed: float,
                     **extra):
        self.layer_records.append(
            dict(layer_idx=layer_idx, original=original,
                 compressed=compressed, **extra))

    def overall(self) -> Dict[str, float]:
        if not self.layer_records:
            return {"overall_ratio": 1.0, "overall_savings": 0.0}
        total_o = sum(r["original"] for r in self.layer_records)
        total_c = sum(r["compressed"] for r in self.layer_records)
        ratio = total_c / total_o if total_o else 1.0
        return {"overall_ratio": ratio, "overall_savings": 1.0 - ratio,
                "layers": len(self.layer_records)}

    def reset(self):
        self.layer_records = []


class PerformanceTimer:
    """Named wall-clock timers (metrics.py:101-128 parity)."""

    def __init__(self):
        self._start: Dict[str, float] = {}
        self.elapsed: Dict[str, float] = {}

    def start(self, name: str):
        self._start[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        dt = time.perf_counter() - self._start.pop(name)
        self.elapsed[name] = self.elapsed.get(name, 0.0) + dt
        return dt

    def reset(self):
        self._start.clear()
        self.elapsed.clear()


def tokens_per_second(num_tokens: int, elapsed_s: float) -> float:
    return num_tokens / elapsed_s if elapsed_s > 0 else 0.0


def time_per_token_ms(num_tokens: int, elapsed_s: float) -> float:
    return elapsed_s * 1e3 / num_tokens if num_tokens else 0.0


def quality_adjusted_savings(memory_savings: float, quality_retention: float,
                             overhead_ratio: float = 0.0) -> float:
    """savings × quality − overhead (metrics.py:150-175 semantics)."""
    return memory_savings * quality_retention - overhead_ratio
