"""Budgeted selective token propagation — static shapes, pure JAX.

Capability parity with the reference `SelectiveTokenPropagator`
(/root/reference/src/compression/selective_propagation.py:6-259), redesigned
for XLA's static-shape world:

* The reference runs a per-batch Python greedy loop over a descending sort
  (selective_propagation.py:107-161) and gathers survivors into a
  data-dependent `[B, max_selected, D]` tensor via another Python loop
  (:224-232). Here selection is one vectorized sort + cumulative-sum (or an
  exact `lax.scan` replica of the greedy), and survivors land in *statically
  sized* per-tier slot arrays with validity masks — the shape XLA needs and
  the layout the decode kernel wants (tiers contiguous).
* The reference's greedy "refinement" (:127-131) is provably identical to
  plain skip-and-continue greedy (`cost <= budget - spent` ⟺
  `spent + cost <= budget`), which `selection_mode="exact_greedy"` replicates
  exactly; the default `"topk_prefix"` stops at the first non-fitting token
  (maximal affordable prefix), which differs only at the budget boundary.
* Emergency fallback: if the budget selects nothing, keep the top
  max(1, S·fallback_frac) tokens (selective_propagation.py:205-211).
* Original token positions ride along with every slot, so decode applies
  exact RoPE/causality — fixing the reference's truncated-causal-mask
  positional approximation (modified_llama.py:132-134).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import HIGH, LOW, MID, CompressionConfig
from .quantization import token_costs

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Selection:
    """Result of budgeted selection, arranged per precision tier.

    For tier t ∈ (HIGH, MID, LOW) with static capacity cap_t:
      indices[t]: [B, cap_t] int32 — original token positions, in descending
          importance order within the tier; unused slots point at position 0.
      valid[t]:   [B, cap_t] bool  — slot holds a real token.
    `kept_mask` is the [B, S] union mask over tiers (reference
    `selection_mask`), and `stats` carries device-scalar selection metrics
    (selective_propagation.py:99-159 equivalents, no host syncs).
    """

    indices: Tuple[Array, Array, Array]  # ordered (HIGH, MID, LOW)
    valid: Tuple[Array, Array, Array]
    kept_mask: Array
    stats: Dict[str, Array]


def _greedy_exact(sorted_costs: Array, budget: float) -> Array:
    """Reference-exact greedy (skip unaffordable, keep scanning)."""

    def body(spent, cost_col):
        take = spent + cost_col <= budget
        return spent + jnp.where(take, cost_col, 0.0), take

    _, takes = jax.lax.scan(body, jnp.zeros(sorted_costs.shape[0]),
                            sorted_costs.T)
    return takes.T


def select_tokens(
    scores: Array,
    labels: Array,
    layer_idx: int,
    cfg: CompressionConfig,
    token_valid: Array = None,
    total_len: int = None,
    prompt_lens: Array = None,
) -> Selection:
    """Select tokens under the layer byte-budget, bucketed into tier slots.

    Args:
      scores: [B, S] importance scores.
      labels: [B, S] threshold precision labels (0/1/2). Used for costs and,
        in `tier_mode="threshold"`, for tier bucketing. In `"quantile"` mode
        tiers follow selection rank (top slots → HIGH).
      layer_idx: static layer index (selects ratio + capacities).
      cfg: compression config.
      token_valid: optional [B, S] bool — ragged batches: invalid (padding)
        tokens are never selected, and the byte budget scales with the true
        per-row length instead of the bucket length.
      total_len: GLOBAL sequence length when scores are a local shard/chunk
        of a longer sequence. Local (sharded/chunked) selection does NOT
        grow the HIGH tier for anchors — shard capacities must stay uniform
        and every tier nonzero for the slot-axis sharding — so under
        sequence sharding anchors are guaranteed selection (boost) but only
        best-effort HIGH tier.
      prompt_lens: optional [B] per-row prompt lengths (ragged batches) —
        anchor growth of the HIGH tier then follows each row's floored
        region instead of the padding bucket's.
    """
    batch, seq_len = scores.shape
    ratio = cfg.layer_ratio(layer_idx)
    caps = cfg.tier_capacities(
        seq_len, layer_idx,
        grow_for_anchors=total_len is None)  # allocated (h,m,l)

    scores = scores.astype(jnp.float32)
    if token_valid is not None:
        # Ragged rows: budget, token limit and fallback floor all follow the
        # TRUE length, so selection is independent of the padding bucket.
        scores = jnp.where(token_valid, scores, -jnp.inf)
        lens = token_valid.sum(axis=-1, keepdims=True).astype(jnp.float32)
        budget = lens * ratio  # [B, 1]
        limit = jnp.minimum(
            jnp.maximum(jnp.ceil(lens * ratio),
                        jnp.maximum(1.0, jnp.ceil(lens * cfg.fallback_frac))),
            lens).astype(jnp.int32)  # [B, 1]
        k_fb = jnp.maximum(1, (lens * cfg.fallback_frac).astype(jnp.int32))
    else:
        budget = jnp.full((batch, 1), float(seq_len) * ratio)
        limit = jnp.full((batch, 1), cfg.token_limit(seq_len, layer_idx),
                         jnp.int32)
        k_fb = jnp.full((batch, 1), max(1, int(seq_len * cfg.fallback_frac)),
                        jnp.int32)
    costs = token_costs(labels, cfg)

    # Descending stable sort by importance (selective_propagation.py:113).
    order = jnp.argsort(-scores, axis=-1, stable=True)  # [B, S]
    sorted_costs = jnp.take_along_axis(costs, order, axis=-1)

    if cfg.selection_mode == "exact_greedy":
        sel_sorted = _greedy_exact(sorted_costs, budget[:, 0])
    else:
        csum = jnp.cumsum(sorted_costs, axis=-1)
        sel_sorted = csum <= budget

    # Emergency fallback (selective_propagation.py:205-211).
    rank = jnp.arange(seq_len)[None, :]
    none_selected = sel_sorted.sum(axis=-1, keepdims=True) == 0
    sel_sorted = jnp.where(none_selected, rank < k_fb, sel_sorted)

    if token_valid is not None:
        # Padding tokens (sorted last, -inf scores) must never be selected —
        # not by the budget prefix, not by the fallback.
        sel_sorted &= jnp.take_along_axis(token_valid, order, axis=-1)

    # Cap the selected COUNT at the exact token limit (bucket-independent).
    sel_rank = jnp.cumsum(sel_sorted.astype(jnp.int32), axis=-1) - 1  # [B, S]
    sel_sorted = sel_sorted & (sel_rank < limit)

    # Tier of each sorted position. Quantile boundaries follow the exact
    # per-row limit (cfg.tier_limits semantics), not allocated capacities.
    demoted = jnp.zeros((batch,), jnp.int32)
    if cfg.tier_mode == "quantile":
        fh, fm, _ = cfg.tier_fractions
        lim_f = limit.astype(jnp.float32)
        n_h = jnp.minimum(jnp.ceil(lim_f * fh), lim_f).astype(jnp.int32)
        # Anchored tokens (sinks + prompt floor) rank top by construction;
        # grow the HIGH boundary so every anchor gets the high tier even
        # when the fraction prior is smaller (mirrors tier_capacities).
        # Skipped under sequence sharding (total_len set): see docstring.
        if total_len is None and cfg.anchor_count(seq_len):
            if prompt_lens is not None:
                anchors = jnp.maximum(
                    cfg.sink_tokens,
                    jnp.ceil(prompt_lens.astype(jnp.float32)
                             * cfg.prompt_region_floor
                             ).astype(jnp.int32)[:, None])
            else:
                anchors = cfg.anchor_count(seq_len)
            n_h = jnp.maximum(n_h, jnp.minimum(anchors, limit))
        n_m = jnp.minimum(jnp.ceil(lim_f * fm),
                          limit - n_h).astype(jnp.int32)
        tier_sorted = jnp.where(
            sel_rank < n_h, HIGH, jnp.where(sel_rank < n_h + n_m, MID, LOW))
    else:
        # Threshold labels are monotone in score, so in sorted order the
        # tiers are contiguous segments with boundaries at the label counts.
        # Clamp those boundaries to the static pool capacities: when a
        # lower pool cannot hold its share, tokens promote into free
        # higher-tier slots (more bits — free quality, the slots exist
        # anyway); when a higher pool overflows, its least-important tokens
        # demote (counted in stats). With generous capacities
        # (threshold_tier_slack >= 3) this reduces to the label-exact
        # reference semantics.
        labels_sorted = jnp.take_along_axis(labels, order, axis=-1)
        n_h_lab = (sel_sorted & (labels_sorted == HIGH)).sum(
            axis=-1, keepdims=True)
        n_m_lab = (sel_sorted & (labels_sorted == MID)).sum(
            axis=-1, keepdims=True)
        n_sel_r = sel_sorted.sum(axis=-1, keepdims=True)
        c_h, c_m, c_l = caps
        hi_end = jnp.clip(jnp.maximum(n_h_lab, n_sel_r - c_m - c_l), 0, c_h)
        seg_m = jnp.clip(jnp.maximum(n_h_lab + n_m_lab - hi_end,
                                     n_sel_r - hi_end - c_l), 0, c_m)
        mid_end = hi_end + seg_m
        tier_sorted = jnp.where(sel_rank < hi_end, HIGH,
                                jnp.where(sel_rank < mid_end, MID, LOW))
        demoted = (jnp.maximum(n_h_lab - hi_end, 0)
                   + jnp.maximum(n_h_lab + n_m_lab
                                 - jnp.maximum(mid_end, n_h_lab), 0))[:, 0]

    batch_idx = jnp.arange(batch)[:, None]
    tier_caps = {HIGH: caps[0], MID: caps[1], LOW: caps[2]}
    indices, valids, tier_counts = {}, {}, {}
    for tier in (HIGH, MID, LOW):
        cap_t = tier_caps[tier]
        flag = sel_sorted & (tier_sorted == tier)  # [B, S] in sorted order
        t_rank = jnp.cumsum(flag.astype(jnp.int32), axis=-1) - 1
        n_t = flag.sum(axis=-1)  # [B]
        tier_counts[tier] = n_t
        if cap_t == 0:
            indices[tier] = jnp.zeros((batch, 0), jnp.int32)
            valids[tier] = jnp.zeros((batch, 0), bool)
            continue
        # Scatter original positions into tier slots; overflow (> cap_t) and
        # non-members dump into a sacrificial trailing slot.
        dest = jnp.where(flag & (t_rank < cap_t), t_rank, cap_t)
        slots = jnp.zeros((batch, cap_t + 1), jnp.int32)
        slots = slots.at[batch_idx, dest].set(order, mode="drop")
        indices[tier] = slots[:, :cap_t]
        valids[tier] = jnp.arange(cap_t)[None, :] < jnp.minimum(n_t, cap_t)[:, None]

    # Union kept-mask over original positions (only slots that fit capacity).
    kept_sorted = (
        (tier_sorted == HIGH) & sel_sorted
        & (jnp.cumsum((sel_sorted & (tier_sorted == HIGH)).astype(jnp.int32), -1) - 1 < tier_caps[HIGH]))
    for tier in (MID, LOW):
        f = sel_sorted & (tier_sorted == tier)
        kept_sorted |= f & (jnp.cumsum(f.astype(jnp.int32), -1) - 1 < tier_caps[tier])
    kept_mask = jnp.zeros((batch, seq_len), bool).at[batch_idx, order].set(kept_sorted)

    spent = jnp.where(sel_sorted, sorted_costs, 0.0).sum(axis=-1)
    n_selected = sel_sorted.sum(axis=-1)
    sorted_scores = jnp.take_along_axis(scores, order, axis=-1)
    avg_imp = (jnp.where(sel_sorted, sorted_scores, 0.0).sum(axis=-1)
               / jnp.maximum(n_selected, 1))
    stats = {
        "selected_count": n_selected,
        "budget_utilization": spent / jnp.maximum(budget[:, 0], 1e-9),
        "avg_importance": avg_imp,
        "high_count": tier_counts[HIGH],
        "medium_count": tier_counts[MID],
        "low_count": tier_counts[LOW],
        "propagation_ratio": jnp.full((batch,), ratio),
        "demoted_count": demoted,
        "compression_ratio": kept_mask.sum(axis=-1) / (
            token_valid.sum(axis=-1) if token_valid is not None else seq_len),
    }
    return Selection(
        indices=(indices[HIGH], indices[MID], indices[LOW]),
        valid=(valids[HIGH], valids[MID], valids[LOW]),
        kept_mask=kept_mask,
        stats=stats,
    )


def estimate_compression_ratio(layer_idx: int, original_length: int,
                               cfg: CompressionConfig) -> Dict[str, float]:
    """Static cumulative-ratio estimate (selective_propagation.py:246-259)."""
    cumulative = 1.0
    for l in range(layer_idx + 1):
        cumulative *= cfg.layer_ratio(l)
    return {
        "layer_ratio": cfg.layer_ratio(layer_idx),
        "cumulative_ratio": cumulative,
        "estimated_length": int(original_length * cumulative),
        "compression_factor": 1.0 / cumulative,
    }
