"""Selective propagation unit tests: budget respect, tier bucketing, static
shapes, exact-greedy parity with a NumPy replica of the reference loop
(selective_propagation.py:107-161), fallback floor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_kv_cache_compression_tpu import (HIGH, LOW, MID,
                                               CompressionConfig)
from realtime_kv_cache_compression_tpu.ops import quantization as q
from realtime_kv_cache_compression_tpu.ops import selection as sel_mod


def make_cfg(**kw):
    base = dict(num_layers=4, high_precision_bits=8, medium_precision_bits=4,
                low_precision_bits=2, slot_align=1)
    base.update(kw)
    return CompressionConfig(**base)


def reference_greedy(scores, costs, budget):
    """NumPy replica of selective_propagation.py:107-135 (per row)."""
    order = np.argsort(-scores, kind="stable")
    selected = np.zeros_like(scores, dtype=bool)
    spent = 0.0
    for idx in order:
        if spent + costs[idx] <= budget:
            selected[idx] = True
            spent += costs[idx]
    return selected


@pytest.mark.parametrize("mode", ["topk_prefix", "exact_greedy"])
def test_budget_respected(rng, mode):
    cfg = make_cfg(selection_mode=mode, tier_mode="threshold")
    scores = jnp.asarray(rng.random((2, 40)).astype(np.float32))
    labels, _ = q.assign_precision(scores, cfg)
    sel = sel_mod.select_tokens(scores, labels, layer_idx=0, cfg=cfg)
    costs = np.asarray(q.token_costs(labels, cfg))
    kept = np.asarray(sel.kept_mask)
    budget = 40 * cfg.layer_ratio(0)
    for b in range(2):
        assert (costs[b] * kept[b]).sum() <= budget + 1e-6
    assert kept.sum() > 0


def test_exact_greedy_matches_reference_loop(rng):
    cfg = make_cfg(selection_mode="exact_greedy", tier_mode="threshold")
    scores = jnp.asarray(rng.random((3, 50)).astype(np.float32))
    labels, _ = q.assign_precision(scores, cfg)
    sel = sel_mod.select_tokens(scores, labels, layer_idx=1, cfg=cfg)
    costs = np.asarray(q.token_costs(labels, cfg))
    budget = 50 * cfg.layer_ratio(1)
    cap = cfg.slot_capacity(50, 1)
    for b in range(3):
        ref = reference_greedy(np.asarray(scores[b]), costs[b], budget)
        if ref.sum() <= cap:  # capacity cap is our (documented) deviation
            np.testing.assert_array_equal(np.asarray(sel.kept_mask[b]), ref)


def test_tier_slots_threshold_mode(rng):
    # slack >= 3 -> every pool can hold every selected token -> label-exact
    # reference semantics (tier == threshold label for every stored token).
    cfg = make_cfg(tier_mode="threshold", threshold_tier_slack=3.0)
    scores = jnp.asarray(rng.random((1, 32)).astype(np.float32))
    labels, _ = q.assign_precision(scores, cfg)
    sel = sel_mod.select_tokens(scores, labels, layer_idx=0, cfg=cfg)
    lab = np.asarray(labels[0])
    kept = np.asarray(sel.kept_mask[0])
    for slot, tier in enumerate((HIGH, MID, LOW)):
        idx = np.asarray(sel.indices[slot][0])
        valid = np.asarray(sel.valid[slot][0])
        # Every valid slot holds a kept token of the right tier.
        assert np.all(lab[idx[valid]] == tier)
        assert np.all(kept[idx[valid]])
        # Slots ordered by descending importance.
        s = np.asarray(scores[0])[idx[valid]]
        assert np.all(np.diff(s) <= 1e-7)
    n_valid = sum(np.asarray(sel.valid[t]).sum() for t in range(3))
    assert n_valid == kept.sum()


def test_threshold_clamped_placement(rng):
    """Default (tight) slack: tiers stay contiguous in importance order,
    every selected token is stored, and demotions are counted."""
    cfg = make_cfg(tier_mode="threshold")  # slack 1.15
    scores = jnp.asarray(rng.random((3, 64)).astype(np.float32))
    labels, _ = q.assign_precision(scores, cfg)
    sel = sel_mod.select_tokens(scores, labels, layer_idx=0, cfg=cfg)
    for b in range(3):
        s = np.asarray(scores[b])
        kept = np.asarray(sel.kept_mask[b])
        # All selected tokens are stored in some tier.
        n_valid = sum(int(np.asarray(sel.valid[t][b]).sum()) for t in range(3))
        assert n_valid == kept.sum()
        # Contiguity: min score of tier t >= max score of tier t+1.
        tier_scores = []
        for t in range(3):
            v = np.asarray(sel.valid[t][b])
            tier_scores.append(s[np.asarray(sel.indices[t][b])[v]])
        for hi, lo in ((0, 1), (1, 2)):
            if len(tier_scores[hi]) and len(tier_scores[lo]):
                assert tier_scores[hi].min() >= tier_scores[lo].max() - 1e-7
        # demoted_count is consistent: tokens labeled above their stored tier.
        lab = np.asarray(labels[b])
        demoted = 0
        for t, tier in enumerate((HIGH, MID, LOW)):
            v = np.asarray(sel.valid[t][b])
            stored_lab = lab[np.asarray(sel.indices[t][b])[v]]
            demoted += int((stored_lab > tier).sum())
        assert int(sel.stats["demoted_count"][b]) == demoted


def test_threshold_allocation_within_bound(rng):
    """VERDICT #9: threshold-mode allocated bytes <= 1.2x quantile mode at
    equal retention (was 3x in round 1)."""
    from realtime_kv_cache_compression_tpu.compression.compressor import \
        compress_layer_kv
    from realtime_kv_cache_compression_tpu.compression.kv_cache import \
        cache_storage_bytes
    from realtime_kv_cache_compression_tpu.config import tiny_test_model

    mcfg = tiny_test_model()
    k = jnp.asarray(rng.normal(size=(1, 128, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 128, 2, 16)).astype(np.float32))
    mass = jnp.asarray(rng.random((1, 128)).astype(np.float32))
    sizes = {}
    for mode in ("quantile", "threshold"):
        cfg = make_cfg(tier_mode=mode, slot_align=8)
        cache, stats = compress_layer_kv(k, v, mass, 0, cfg, mcfg)
        sizes[mode] = cache_storage_bytes(cache)
        # Retention identical across modes (selection is mode-independent).
        assert int(stats["kept_tokens"][0]) > 0
    assert sizes["threshold"] <= 1.2 * sizes["quantile"], sizes


def test_tier_slots_quantile_mode(rng):
    cfg = make_cfg(tier_mode="quantile", tier_fractions=(0.25, 0.5, 0.25))
    scores = jnp.asarray(rng.random((2, 64)).astype(np.float32))
    labels, _ = q.assign_precision(scores, cfg)
    sel = sel_mod.select_tokens(scores, labels, layer_idx=0, cfg=cfg)
    caps = cfg.tier_capacities(64, 0)
    for slot in range(3):
        assert sel.indices[slot].shape == (2, caps[slot])
    # Most-important selected tokens land in the HIGH tier: min HIGH-slot
    # score >= max MID-slot score per batch row.
    for b in range(2):
        s = np.asarray(scores[b])
        hi_v = np.asarray(sel.valid[0][b])
        mid_v = np.asarray(sel.valid[1][b])
        if hi_v.any() and mid_v.any():
            hi_scores = s[np.asarray(sel.indices[0][b])[hi_v]]
            mid_scores = s[np.asarray(sel.indices[1][b])[mid_v]]
            assert hi_scores.min() >= mid_scores.max() - 1e-7


def test_static_shapes_independent_of_data(rng):
    cfg = make_cfg(tier_mode="quantile")
    labels_fn = lambda s: q.assign_precision(s, cfg)[0]
    s1 = jnp.asarray(rng.random((1, 64)).astype(np.float32))
    s2 = jnp.asarray((rng.random((1, 64)) * 0.01).astype(np.float32))
    sel1 = sel_mod.select_tokens(s1, labels_fn(s1), 0, cfg)
    sel2 = sel_mod.select_tokens(s2, labels_fn(s2), 0, cfg)
    for t in range(3):
        assert sel1.indices[t].shape == sel2.indices[t].shape


def test_fallback_floor():
    """Budget ~0 via huge costs: still keeps top 10% (min 1)."""
    cfg = make_cfg(tier_mode="threshold", early_layer_ratio=0.01,
                   fallback_frac=0.1)
    scores = jnp.linspace(0.99, 0.0, 40).reshape(1, 40)
    labels = jnp.full((1, 40), HIGH)  # every token costs 1.0; budget = 0.4
    sel = sel_mod.select_tokens(scores, labels, 0, cfg)
    kept = np.asarray(sel.kept_mask[0])
    assert kept.sum() == 4  # top 10% of 40
    assert kept[:4].all()  # the highest-score (earliest) tokens


def test_layer_ratio_groups():
    cfg = make_cfg(num_layers=10)
    ratios = [cfg.layer_ratio(i) for i in range(10)]
    assert ratios[:3] == [0.8] * 3        # first 30%
    assert ratios[3:7] == [0.6] * 4       # middle 40%
    assert ratios[7:] == [0.4] * 3        # last 30%


def test_estimate_compression_ratio():
    cfg = make_cfg(num_layers=10)
    est = sel_mod.estimate_compression_ratio(4, 1000, cfg)
    assert est["layer_ratio"] == 0.6
    assert est["cumulative_ratio"] == pytest.approx(0.8 ** 3 * 0.6 ** 2)
    assert est["estimated_length"] == int(1000 * 0.8 ** 3 * 0.6 ** 2)


def test_selection_jit(rng):
    cfg = make_cfg(tier_mode="quantile")
    scores = jnp.asarray(rng.random((2, 64)).astype(np.float32))
    labels, _ = q.assign_precision(scores, cfg)
    fn = jax.jit(lambda s, l: sel_mod.select_tokens(s, l, 0, cfg))
    sel = fn(scores, labels)
    assert bool(jnp.all(sel.kept_mask.sum(axis=-1) > 0))
