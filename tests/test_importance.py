"""Importance scoring unit tests.

Covers the reference's test_importance_scoring.py surface (shape/finiteness,
min-max normalization, position-bias endpoints/monotonicity, constant context
relevance, layer-weight differentiation, seq_len edge cases, cumulative
tracker) on synthetic tensors — fixing the reference's stale z-score test
(test_importance_scoring.py:62-78 asserted z-score stats against a min-max
implementation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_kv_cache_compression_tpu import CompressionConfig
from realtime_kv_cache_compression_tpu.ops import importance as imp


@pytest.fixture
def cfg():
    return CompressionConfig(num_layers=8)


def softmax_attn(rng, b=1, h=8, s=10):
    logits = rng.normal(size=(b, h, s, s)).astype(np.float32)
    return jax.nn.softmax(jnp.asarray(logits), axis=-1)


def test_prompt_mass_shape_and_range(rng):
    attn = softmax_attn(rng, b=2, h=4, s=12)
    mass = imp.prompt_attention_mass(attn, prompt_len=3)
    assert mass.shape == (2, 12)
    assert bool(jnp.all(mass >= 0)) and bool(jnp.all(mass <= 3.0 + 1e-5))
    # Full-width prompt ⇒ mass is the whole row sum = 1 for every query.
    full = imp.prompt_attention_mass(attn, prompt_len=12)
    np.testing.assert_allclose(np.asarray(full), 1.0, atol=1e-5)


def test_minmax_normalize():
    x = jnp.array([[1.0, 3.0, 2.0], [5.0, 5.0, 5.0]])
    out = imp.minmax_normalize(x)
    np.testing.assert_allclose(np.asarray(out[0]), [0.0, 1.0, 0.5], atol=1e-6)
    # Constant rows map to zeros (safe-divide guard).
    np.testing.assert_allclose(np.asarray(out[1]), 0.0)


def test_position_bias_endpoints_and_monotone():
    s = 64
    pb = np.asarray(imp.position_bias(s))
    assert pb.shape == (s,)
    assert abs(pb[0]) < 1e-6            # log(1)/log(T) = 0
    assert abs(pb[-1] - 1.0) < 1e-6     # log(T)/log(T) = 1
    assert np.all(np.diff(pb) > 0)
    assert np.all((pb >= 0) & (pb <= 1))
    # Degenerate lengths.
    assert np.asarray(imp.position_bias(1)).shape == (1,)
    assert float(imp.position_bias(1)[0]) == 0.0


def test_context_relevance():
    assert imp.context_relevance(100, 20) == pytest.approx(0.2)
    assert imp.context_relevance(10, 20) == 1.0


def test_scores_shape_finite_and_layer_weighting(rng, cfg):
    attn = softmax_attn(rng, b=2, h=4, s=16)
    mass = imp.prompt_attention_mass(attn, 4)
    s0 = imp.importance_scores(mass, 0, 16, 4, cfg)
    s_last = imp.importance_scores(mass, cfg.num_layers - 1, 16, 4, cfg)
    assert s0.shape == (2, 16)
    assert bool(jnp.all(jnp.isfinite(s0)))
    # Later layers down-weight the attention term (w_l: 1.0 → 0.5).
    t1_0 = np.asarray(s0) - np.asarray(s_last)
    norm = np.asarray(imp.minmax_normalize(mass))
    expected = cfg.alpha * norm * (cfg.layer_weights[0]
                                   - cfg.layer_weights[-1])
    np.testing.assert_allclose(t1_0, expected, atol=1e-5)


def test_scores_three_term_decomposition(rng):
    """Both position-bias modes decompose into the documented three terms."""
    import dataclasses

    s, p = 32, 6
    attn = softmax_attn(rng, b=1, h=2, s=s)
    mass = imp.prompt_attention_mass(attn, p)
    cfg = CompressionConfig(num_layers=8, position_bias_mode="log",
                            prompt_region_floor=0.0)
    scores = imp.importance_scores(mass, 2, s, p, cfg)
    manual = (cfg.alpha * imp.minmax_normalize(mass) * cfg.layer_weights[2]
              + cfg.beta * imp.position_bias(s)[None]
              + cfg.gamma * imp.context_relevance(s, p))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(manual),
                               atol=1e-6)
    # Default mode is the recency-window ramp.
    rcfg = dataclasses.replace(cfg, position_bias_mode="recency",
                               recency_window=8)
    scores_r = imp.importance_scores(mass, 2, s, p, rcfg)
    manual_r = (manual - cfg.beta * imp.position_bias(s)[None]
                + cfg.beta * imp.recency_bias(s, 8)[None])
    np.testing.assert_allclose(np.asarray(scores_r), np.asarray(manual_r),
                               atol=1e-6)


def test_recency_bias_shape():
    """Ramp over the last W positions, zero before (the long-context fix)."""
    rb = np.asarray(imp.recency_bias(64, 16))
    assert rb.shape == (64,)
    assert abs(rb[-1] - 1.0) < 1e-6
    assert np.all(rb[: 64 - 16] == 0.0)        # untouched early context
    assert np.all(np.diff(rb[64 - 16:]) > 0)   # strictly rising in-window
    # The log shape taxes early tokens by ~beta at large T; recency doesn't.
    lb = np.asarray(imp.position_bias(4096))
    rb4k = np.asarray(imp.recency_bias(4096, 512))
    assert lb[2048] > 0.9      # mid-sequence filler nearly maxes the log bias
    assert rb4k[2048] == 0.0   # ...and gets none under recency


def test_prompt_region_floor_guarantees_selection_high_tier():
    """config.prompt_region_floor: the floored head of the identified prompt
    region outranks natural scores, selects, and lands in the HIGH tier —
    in both tier modes, under a position offset, and on ragged rows."""
    import dataclasses

    from realtime_kv_cache_compression_tpu.ops import selection as sel_mod
    from realtime_kv_cache_compression_tpu.ops.quantization import (
        assign_precision)

    rng = np.random.default_rng(1)
    mass = jnp.asarray(rng.random((2, 64)).astype(np.float32))
    p = 12
    for mode in ("quantile", "threshold"):
        cfg = CompressionConfig(
            num_layers=4, high_precision_bits=8, medium_precision_bits=4,
            low_precision_bits=2, prompt_region_floor=1.0, tier_mode=mode,
            early_layer_ratio=0.4, middle_layer_ratio=0.4,
            later_layer_ratio=0.4, slot_align=1)
        scores = importance_scores_all(mass, cfg, 64, p)
        assert bool((jnp.argsort(-scores[0])[:p] < p).all())
        labels, _ = assign_precision(scores, cfg)
        sel = sel_mod.select_tokens(scores, labels, 3, cfg)
        kept = np.asarray(sel.kept_mask)
        assert kept[:, :p].all(), f"floored prompt dropped in {mode} mode"
        hi_idx, hi_valid = np.asarray(sel.indices[0]), np.asarray(sel.valid[0])
        for b in range(2):
            in_high = set(hi_idx[b][hi_valid[b]].tolist())
            assert set(range(p)) <= in_high, (mode, in_high)
    # Partial floor: only ceil(p * 0.5) positions boosted.
    cfg = CompressionConfig(num_layers=4, prompt_region_floor=0.5)
    assert cfg.prompt_floor_length(p) == 6
    s_half = importance_scores_all(mass, cfg, 64, p)
    s_none = importance_scores_all(
        mass, dataclasses.replace(cfg, prompt_region_floor=0.0), 64, p)
    boosted = np.asarray(s_half - s_none)
    assert np.all(boosted[:, :6] > 1.0) and np.allclose(boosted[:, 6:], 0.0)
    # Position offset (shard at global 32): region [0, p) is off-shard.
    s_off = importance_scores_all(mass, cfg, 64, p, position_offset=32,
                                  total_len=96)
    s_off_none = importance_scores_all(
        mass, dataclasses.replace(cfg, prompt_region_floor=0.0), 64, p,
        position_offset=32, total_len=96)
    assert bool(jnp.allclose(s_off, s_off_none))
    # Ragged rows: per-row prompt lengths.
    cfg = CompressionConfig(num_layers=4, prompt_region_floor=1.0)
    lengths = jnp.array([64, 40])
    plens = jnp.array([8, 4])
    s_r = imp.importance_scores(mass, 0, 64, p, cfg, lengths=lengths,
                                prompt_lens=plens)
    s_r0 = imp.importance_scores(
        mass, 0, 64, p,
        dataclasses.replace(cfg, prompt_region_floor=0.0),
        lengths=lengths, prompt_lens=plens)
    diff = np.asarray(s_r - s_r0)
    assert np.all(diff[0, :8] > 1.0) and np.allclose(diff[0, 8:], 0.0)
    assert np.all(diff[1, :4] > 1.0) and np.allclose(diff[1, 4:], 0.0)


def importance_scores_all(mass, cfg, s, p, **kw):
    return imp.importance_scores(mass, 3, s, p, cfg, **kw)


def test_prompt_biased_attention_ranks_prompt_attenders_high(rng, cfg):
    """Integration check mirroring test_importance_scoring.py:287-336:
    queries that attend strongly to the prompt should score higher (term 1)."""
    b, h, s, p = 1, 4, 128, 16
    logits = rng.normal(size=(b, h, s, s)).astype(np.float32)
    hot = np.arange(60, 70)  # these queries attend hard at prompt columns
    logits[:, :, hot[:, None], np.arange(p)[None, :]] += 4.0
    attn = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    mass = imp.prompt_attention_mass(attn, p)
    norm = np.asarray(imp.minmax_normalize(mass))[0]
    assert norm[hot].mean() > np.delete(norm, hot).mean() + 0.2


def test_cumulative_scores_running_mean(rng):
    per_layer = jnp.asarray(rng.normal(size=(4, 2, 8)).astype(np.float32))
    cum = imp.cumulative_scores(per_layer)
    np.testing.assert_allclose(np.asarray(cum[0]), np.asarray(per_layer[0]),
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cum[3]), np.asarray(per_layer).mean(axis=0), atol=1e-6)


def test_jit_compiles(rng, cfg):
    mass = jnp.asarray(rng.random((2, 64)).astype(np.float32))
    fn = jax.jit(lambda m: imp.importance_scores(m, 1, 64, 12, cfg))
    out = fn(mass)
    assert out.shape == (2, 64)


def test_sink_tokens_always_selected_high_tier():
    """config.sink_tokens: anchors outrank everything, select into HIGH, in
    both tier modes and under a position offset (sequence sharding)."""
    import jax.numpy as jnp
    import numpy as np

    from realtime_kv_cache_compression_tpu import CompressionConfig
    from realtime_kv_cache_compression_tpu.config import HIGH
    from realtime_kv_cache_compression_tpu.ops import selection as sel_mod
    from realtime_kv_cache_compression_tpu.ops.importance import (
        importance_scores)
    from realtime_kv_cache_compression_tpu.ops.quantization import (
        assign_precision)

    rng = np.random.default_rng(0)
    mass = jnp.asarray(rng.random((2, 64)).astype(np.float32))
    for mode in ("quantile", "threshold"):
        cfg = CompressionConfig(
            num_layers=4, high_precision_bits=8, medium_precision_bits=4,
            low_precision_bits=2, sink_tokens=4, tier_mode=mode,
            early_layer_ratio=0.3, middle_layer_ratio=0.3,
            later_layer_ratio=0.3, slot_align=1)
        scores = importance_scores(mass, 3, 64, 12, cfg)  # most aggressive layer
        assert bool((jnp.argsort(-scores[0])[:4] < 4).all())
        labels, _ = assign_precision(scores, cfg)
        sel = sel_mod.select_tokens(scores, labels, 3, cfg)
        kept = np.asarray(sel.kept_mask)
        assert kept[:, :4].all(), f"sink tokens dropped in {mode} mode"
        hi_idx = np.asarray(sel.indices[0])   # HIGH tier slots
        hi_valid = np.asarray(sel.valid[0])
        for b in range(2):
            in_high = set(hi_idx[b][hi_valid[b]].tolist())
            assert {0, 1, 2, 3} <= in_high, (mode, in_high)

    # Position offset (sequence shard starting at 32): no local boost.
    cfg = CompressionConfig(num_layers=4, high_precision_bits=8,
                            medium_precision_bits=4, low_precision_bits=2,
                            sink_tokens=4)
    s_off = importance_scores(mass, 0, 64, 12, cfg, position_offset=32,
                              total_len=96)
    import dataclasses

    s_no = importance_scores(mass, 0, 64, 12,
                             dataclasses.replace(cfg, sink_tokens=0),
                             position_offset=32, total_len=96)
    assert bool(jnp.allclose(s_off, s_no))
