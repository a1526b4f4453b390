"""Experiment-harness units: tuning-space normalization, ablation config
generation, scenario registry — logic-level tests (the CLIs' end-to-end
paths are exercised by the driver scripts; these pin the search-space
invariants without model evaluation).
"""

import importlib.util
import os
import random
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tuning():
    return load_module("hyperparameter_tuning",
                       os.path.join(ROOT, "experiments",
                                    "hyperparameter_tuning.py"))


@pytest.fixture(scope="module")
def ablation():
    return load_module("ablation_study",
                       os.path.join(ROOT, "experiments", "ablation_study.py"))


def test_sample_point_invariants(tuning):
    rng = random.Random(0)
    for _ in range(50):
        pt = tuning.sample_point(rng)
        assert abs(pt["alpha"] + pt["beta"] + pt["gamma"] - 1.0) < 1e-6
        assert pt["theta_m"] < pt["theta_h"]
        assert (pt["early_layer_ratio"] >= pt["middle_layer_ratio"]
                >= pt["later_layer_ratio"])
        assert pt["high_precision_bits"] in (8, 16)
        assert pt["medium_precision_bits"] in (4, 8)


def test_point_to_config_valid(tuning):
    rng = random.Random(1)
    for _ in range(10):
        cfg = tuning.point_to_config(tuning.sample_point(rng), num_layers=4)
        assert cfg.theta_m <= cfg.theta_h


def test_ablation_config_generators(ablation):
    import realtime_kv_cache_compression_tpu as rtc

    base = rtc.CompressionConfig(num_layers=4, high_precision_bits=8,
                                 medium_precision_bits=4,
                                 low_precision_bits=2)
    comp = ablation.component_configs(base)
    assert set(comp) == {"full", "no_attention", "no_position",
                         "no_relevance", "uniform_precision",
                         "uniform_propagation", "no_quantization"}
    assert comp["no_attention"].alpha == 0.0
    assert abs(comp["no_attention"].alpha + comp["no_attention"].beta
               + comp["no_attention"].gamma - 1.0) < 1e-6
    assert comp["no_quantization"].high_precision_bits == 16

    weights = ablation.weight_grid(base)
    for cfg in weights.values():
        assert abs(cfg.alpha + cfg.beta + cfg.gamma - 1.0) < 1e-3

    th = ablation.threshold_grid(base)
    for cfg in th.values():
        assert cfg.theta_m < cfg.theta_h

    ratios = ablation.ratio_grid(base)
    for cfg in ratios.values():
        assert (cfg.early_layer_ratio >= cfg.middle_layer_ratio
                >= cfg.later_layer_ratio)

    bits = ablation.bits_grid(base)
    for cfg in bits.values():
        assert (cfg.high_precision_bits >= cfg.medium_precision_bits
                >= cfg.low_precision_bits)


def test_scenarios_cover_reference_set():
    from realtime_kv_cache_compression_tpu.eval.benchmark_runner import (
        named_scenarios)

    s = named_scenarios(4)
    assert s["baseline"] is None
    assert s["aggressive"].later_layer_ratio < s["conservative"].later_layer_ratio
    assert s["prompt_focused"].alpha > s["position_focused"].alpha
