"""Evaluation-layer tests: text metrics (reference-formula parity), data
utilities, and a hermetic end-to-end LongBench evaluation on the tiny model
with synthetic planted-answer data.
"""

import jax
import numpy as np
import pytest

from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                               tiny_test_model)
from realtime_kv_cache_compression_tpu.eval import metrics as M
from realtime_kv_cache_compression_tpu.eval.longbench import (
    LongBenchEvaluator, ModelRunner, pick_bucket)
from realtime_kv_cache_compression_tpu.models import llama
from realtime_kv_cache_compression_tpu.utils import data as D
from realtime_kv_cache_compression_tpu.utils.tokenizer import ByteTokenizer


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

def test_normalize_text():
    assert M.normalize_text("The  Quick, Brown Fox!") == "quick brown fox"
    assert M.normalize_text("An apple A day") == "apple day"


def test_f1_score():
    assert M.f1_score("the cat sat", "cat sat") == pytest.approx(1.0)
    assert M.f1_score("dog", "cat") == 0.0
    # precision 1/2, recall 1/1 → F1 = 2/3
    assert M.f1_score("cat dog", "cat") == pytest.approx(2 / 3)
    assert M.f1_score("", "") == 1.0
    assert M.f1_score("x", "") == 0.0


def test_exact_match_and_accuracy():
    assert M.exact_match("The Answer!", "answer") == 1.0
    assert M.exact_match("answers", "answer") == 0.0
    assert M.accuracy_score("i think it is paris maybe", "Paris") == 1.0
    assert M.accuracy_score("london", "Paris") == 0.0


def test_rouge_l_overlap():
    r = M.rouge_scores("the cat sat on the mat", "the cat sat on the mat")
    assert r["rougeL"] == pytest.approx(1.0)
    r2 = M.rouge_scores("completely different words here",
                        "the cat sat on the mat")
    assert r2["rougeL"] < 0.3


def test_best_over_ground_truths():
    v = M.best_over_ground_truths(M.f1_score, "blue", ["red", "blue"])
    assert v == 1.0


def test_compression_metrics_accumulator():
    cm = M.CompressionMetrics()
    cm.record_layer(0, original=100, compressed=50)
    cm.record_layer(1, original=100, compressed=30)
    o = cm.overall()
    assert o["overall_ratio"] == pytest.approx(0.4)
    assert o["overall_savings"] == pytest.approx(0.6)


def test_performance_timer():
    t = M.PerformanceTimer()
    t.start("x")
    dt = t.stop("x")
    assert dt >= 0 and t.elapsed["x"] >= 0


# ---------------------------------------------------------------------------
# Data utilities
# ---------------------------------------------------------------------------

def test_task_registry_complete():
    assert len(D.LONGBENCH_TASKS) == 18
    assert set(D.CORE_TASKS) <= set(D.LONGBENCH_TASKS)
    assert D.LONGBENCH_TASKS["gov_report"].task_type == "summarization"
    assert "rougeL" in D.LONGBENCH_TASKS["gov_report"].metrics
    assert D.LONGBENCH_TASKS["narrativeqa"].max_length == 16384


def test_truncate_middle_keeps_head_and_tail():
    ids = list(range(100))
    out = D.truncate_middle(ids, 10)
    assert len(out) == 10
    assert out[:5] == [0, 1, 2, 3, 4]
    assert out[-5:] == [95, 96, 97, 98, 99]
    assert D.truncate_middle(ids, 200) == ids


def test_synthetic_task_data_planted_answer():
    rows = D.synthetic_task_data("narrativeqa", n_samples=3,
                                 context_words=200)
    assert len(rows) == 3
    for r in rows:
        assert r["answers"][0] in r["context"]
    # Deterministic under the same seed.
    rows2 = D.synthetic_task_data("narrativeqa", n_samples=3,
                                  context_words=200)
    assert rows == rows2


def test_jsonl_roundtrip(tmp_path):
    rows = [{"a": 1}, {"b": [1, 2]}]
    p = str(tmp_path / "x.jsonl")
    D.save_jsonl(p, rows)
    assert D.load_jsonl(p) == rows
    assert D.load_jsonl(p, max_samples=1) == rows[:1]


def test_load_task_data_local_then_synthetic(tmp_path):
    p = str(tmp_path)
    D.save_jsonl(f"{p}/qasper.jsonl", [{"context": "c", "input": "q",
                                        "answers": ["a"]}])
    rows = D.load_task_data("qasper", data_dir=p)
    assert rows[0]["context"] == "c"
    rows = D.load_task_data("hotpotqa", data_dir=p, max_samples=2)
    assert rows[0].get("_synthetic")  # offline fallback


def test_pick_bucket():
    # Round UP to the next power of two (pad-and-run-ragged, no truncation
    # below max_length).
    assert pick_bucket(300, 4096) == 512
    assert pick_bucket(1024, 4096) == 1024
    assert pick_bucket(1025, 4096) == 2048
    assert pick_bucket(99999, 4096) == 4096
    assert pick_bucket(10, 4096) == 256


# ---------------------------------------------------------------------------
# End-to-end evaluation (hermetic)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def runner():
    cfg = tiny_test_model(num_layers=2, vocab_size=258)
    ccfg = CompressionConfig(num_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return ModelRunner(params, cfg, ccfg, max_new_tokens=4)


def test_evaluator_end_to_end(runner, tmp_path):
    ev = LongBenchEvaluator(runner, ByteTokenizer(),
                            output_dir=str(tmp_path), max_length=512,
                            synthetic_kwargs={"context_words": 150})
    res = ev.evaluate_all_tasks(["narrativeqa", "gov_report"], max_samples=2)
    assert res["overall"]["tasks_evaluated"] == 2
    nq = res["per_task"]["narrativeqa"]
    assert nq["num_evaluated"] == 2
    assert "f1" in nq["metrics"]
    assert 0 <= nq["metrics"]["quality"] <= 1
    assert nq["avg_compression_ratio"] > 0
    gr = res["per_task"]["gov_report"]
    assert "rougeL" in gr["metrics"]
    assert (tmp_path / "comprehensive_evaluation_results.json").exists()
    assert (tmp_path / "narrativeqa_detailed_results.json").exists()


def test_evaluator_batched_matches_sequential(runner, tmp_path):
    """batch_size=2 evaluation produces the same responses/metrics as
    batch_size=1 (greedy decode; ragged batching is exact)."""
    ev = LongBenchEvaluator(runner, ByteTokenizer(), max_length=512,
                            synthetic_kwargs={"context_words": 120})
    r1 = ev.evaluate_task("narrativeqa", max_samples=3, batch_size=1)
    r2 = ev.evaluate_task("narrativeqa", max_samples=3, batch_size=2)
    assert r1["num_evaluated"] == r2["num_evaluated"] == 3
    for d1, d2 in zip(r1["details"], r2["details"]):
        assert d1["response"] == d2["response"]
        assert d1["metrics"] == d2["metrics"]


def test_evaluator_baseline_arm(tmp_path):
    cfg = tiny_test_model(num_layers=2, vocab_size=258)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    base = ModelRunner(params, cfg, ccfg=None, max_new_tokens=4)
    ev = LongBenchEvaluator(base, ByteTokenizer(), max_length=512,
                            synthetic_kwargs={"context_words": 100})
    res = ev.evaluate_task("qasper", max_samples=1)
    assert res["num_evaluated"] == 1
    assert "avg_compression_ratio" not in res


# ---------------------------------------------------------------------------
# reference_parity metric mode (VERDICT r4 weak #5)
# ---------------------------------------------------------------------------

def test_parity_f1_set_vs_multiset():
    # Repeated shared token: multiset counts it twice, the reference's set
    # counts it once (eval_utils.py:61) while dividing by list lengths.
    assert M.f1_score("the cat cat sat", "cat sat") == pytest.approx(0.8)
    assert M.f1_score("the cat cat sat", "cat sat",
                      reference_parity=True) == pytest.approx(2 / 3)


def test_parity_empty_semantics():
    # Default (SQuAD): empty-vs-empty is a perfect match. Reference:
    # any empty side returns 0.0 (eval_utils.py:58-59).
    assert M.f1_score("", "") == 1.0
    assert M.f1_score("", "", reference_parity=True) == 0.0
    assert M.f1_score("the a an", "", reference_parity=True) == 0.0


def test_parity_normalize_keeps_articles():
    # Reference normalize (eval_utils.py:24-35): articles kept, whitespace
    # NOT re-collapsed after punctuation removal.
    assert M.normalize_text("It's a - b!", reference_parity=True) == "its a  b"
    assert M.normalize_text("It's a - b!") == "its b"
    # Reference F1 therefore scores article-only differences < 1.
    assert M.f1_score("the answer", "answer") == 1.0
    assert M.f1_score("the answer", "answer",
                      reference_parity=True) == pytest.approx(2 / 3)


def test_parity_exact_match():
    assert M.exact_match("The Answer!", "answer") == 1.0
    assert M.exact_match("The Answer!", "answer",
                         reference_parity=True) == 0.0
    assert M.exact_match("The Answer!", "the answer",
                         reference_parity=True) == 1.0


def test_porter_stem_classic_vocab():
    # Canonical examples from the Porter algorithm paper; the fallback
    # (no-rouge_score) ROUGE path stems with this so summarization numbers
    # stay comparable to the reference's stemmed scorer (eval_utils.py:40).
    expected = {"caresses": "caress", "ponies": "poni", "motoring": "motor",
                "plastered": "plaster", "hopping": "hop", "happy": "happi",
                "relational": "relat", "vietnamization": "vietnam",
                "operator": "oper", "decisiveness": "decis",
                "triplicate": "triplic", "electriciti": "electr",
                "adjustment": "adjust", "adoption": "adopt",
                "activate": "activ", "effective": "effect", "rate": "rate",
                "cease": "ceas", "agreed": "agre", "feed": "feed"}
    for word, stem in expected.items():
        assert M.porter_stem(word) == stem, word


def test_evaluator_parity_flag_changes_f1(runner):
    ev = LongBenchEvaluator(runner, ByteTokenizer(), max_length=512,
                            synthetic_kwargs={"context_words": 100},
                            reference_parity=True)
    spec = D.LONGBENCH_TASKS["narrativeqa"]
    sm = ev._sample_metrics(spec, "the cat cat sat", ["cat sat"])
    assert sm["f1"] == pytest.approx(2 / 3)
    ev.reference_parity = False
    sm = ev._sample_metrics(spec, "the cat cat sat", ["cat sat"])
    assert sm["f1"] == pytest.approx(0.8)
