"""Fully-sharded sequence-parallel compression (no K/V all-gather).

The sharded path (seq_parallel_prefill(sharded_compression=True)) must equal
the single-device chunked-selection reference compress_layer_kv_chunked —
same policy by construction: global min-max scores, per-chunk selection with
the budget split evenly, global stored positions, shard-consistent packing.
Also checks decode over the slot-sharded state and the 1/n per-device cache
footprint that motivates the whole mode.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                               tiny_test_model)
from realtime_kv_cache_compression_tpu.compression import (
    compress_layer_kv, compress_layer_kv_chunked, dequantize_layer_cache)
from realtime_kv_cache_compression_tpu.models import llama
from realtime_kv_cache_compression_tpu.parallel import (create_seq_mesh,
                                                        seq_parallel_prefill)


@pytest.fixture(scope="module")
def setup():
    mcfg = tiny_test_model(num_layers=2)
    ccfg = CompressionConfig(num_layers=2, high_precision_bits=8,
                             medium_precision_bits=4, low_precision_bits=2)
    params = llama.init_params(jax.random.PRNGKey(0), mcfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0,
                             mcfg.vocab_size)
    return mcfg, ccfg, params, ids


def test_chunked_equals_global_minmax_scores(setup):
    """Chunked compression with n=1 equals the plain path exactly."""
    mcfg, ccfg, params, _ = setup
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(2, 64, mcfg.num_kv_heads,
                                     mcfg.head_dim)), jnp.float32)
    v = jnp.asarray(rng.normal(size=k.shape), jnp.float32)
    pm = jnp.asarray(rng.random((2, 64)), jnp.float32)
    c1, s1 = compress_layer_kv(k, v, pm, 0, ccfg, mcfg)
    c2, s2 = compress_layer_kv_chunked(k, v, pm, 0, ccfg, mcfg, n_chunks=1)
    for t1, t2 in zip(c1.tiers, c2.tiers):
        np.testing.assert_array_equal(np.asarray(t1.k_stored),
                                      np.asarray(t2.k_stored))
        np.testing.assert_array_equal(np.asarray(t1.positions),
                                      np.asarray(t2.positions))
    np.testing.assert_allclose(float(s1["importance_mean"].mean()),
                               float(s2["importance_mean"].mean()),
                               rtol=1e-6)


@pytest.mark.parametrize("n", [2, 4])
def test_sharded_equals_chunked_reference(setup, n):
    """n-way sharded compression == single-device chunked(n) — caches and
    stats."""
    mcfg, ccfg, params, ids = setup
    mesh = create_seq_mesh(n)

    logits_sh, state_sh, stats_sh = seq_parallel_prefill(
        params, ids, mcfg, ccfg, mesh, max_decode_len=8, interpret=True,
        sharded_compression=True)

    # Single-device reference: full prefill activations, chunked compression.
    b, s = ids.shape
    positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
    h = llama._embed_lookup(params["embed"], ids, jnp.dtype(mcfg.dtype))
    cos, sin = llama.rope_tables(positions, mcfg.head_dim, mcfg.rope_theta)
    prompt_len = ccfg.prompt_length(s)
    ref_caches, ref_stats = [], []
    for layer_idx, layer in enumerate(params["layers"]):
        x = llama.rmsnorm(h, layer["input_norm"], mcfg.rms_norm_eps)
        q, k, v = llama._qkv(layer, x, mcfg)
        q = llama.apply_rope(q, cos, sin)
        k = llama.apply_rope(k, cos, sin)
        attn_out, pmass = llama._prefill_attention(q, k, v, prompt_len,
                                                   use_flash=False)
        cache, st = compress_layer_kv_chunked(k, v, pmass, layer_idx, ccfg,
                                              mcfg, n_chunks=n)
        ref_caches.append(cache)
        ref_stats.append(st)
        h = h + llama._matmul(attn_out.reshape(b, s, mcfg.q_dim),
                              layer["wo"])
        h = h + llama._mlp(layer, llama.rmsnorm(h, layer["post_norm"],
                                                mcfg.rms_norm_eps))

    for l, (got, ref) in enumerate(zip(state_sh.caches, ref_caches)):
        for t_g, t_r in zip(got.tiers, ref.tiers):
            assert t_g.chunk == t_r.chunk
            np.testing.assert_array_equal(np.asarray(t_g.valid),
                                          np.asarray(t_r.valid))
            # Positions agree on valid slots.
            vmask = np.asarray(t_r.valid)
            np.testing.assert_array_equal(
                np.asarray(t_g.positions)[vmask],
                np.asarray(t_r.positions)[vmask])
        # Dequantized contents match to float tolerance (the quantization
        # grids are computed from the same tokens).
        k_g, v_g, p_g, va_g = dequantize_layer_cache(got, ccfg)
        k_r, v_r, p_r, va_r = dequantize_layer_cache(ref, ccfg)
        m = np.asarray(va_r)
        np.testing.assert_allclose(np.asarray(k_g)[m], np.asarray(k_r)[m],
                                   atol=2e-2, rtol=2e-2)
        np.testing.assert_allclose(np.asarray(v_g)[m], np.asarray(v_r)[m],
                                   atol=2e-2, rtol=2e-2)
        for key in ("kept_tokens", "stored_high", "stored_medium",
                    "stored_low"):
            np.testing.assert_array_equal(np.asarray(stats_sh[l][key]),
                                          np.asarray(ref_stats[l][key]))
        np.testing.assert_allclose(
            np.asarray(stats_sh[l]["importance_std"]),
            np.asarray(ref_stats[l]["importance_std"]), rtol=1e-4, atol=1e-5)


def test_sharded_cache_is_actually_sharded(setup):
    """Per-device slot-axis shards: each device holds 1/n of the pool."""
    mcfg, ccfg, params, ids = setup
    n = 4
    mesh = create_seq_mesh(n)
    _, state, _ = seq_parallel_prefill(params, ids, mcfg, ccfg, mesh,
                                       max_decode_len=8, interpret=True,
                                       sharded_compression=True)
    t = state.caches[0].tiers[0]
    if t.capacity == 0:
        pytest.skip("empty tier")
    shard_shapes = {sh.data.shape for sh in t.k_stored.addressable_shards}
    full = t.k_stored.shape
    assert shard_shapes == {(full[0], full[1] // n) + full[2:]}, shard_shapes


def test_decode_from_sharded_state(setup):
    """Greedy decode over the slot-sharded cache matches decode over the
    same cache gathered to one device."""
    mcfg, ccfg, params, ids = setup
    n = 2
    mesh = create_seq_mesh(n)
    logits, state, _ = seq_parallel_prefill(params, ids, mcfg, ccfg, mesh,
                                            max_decode_len=8, interpret=True,
                                            sharded_compression=True)
    assert np.isfinite(np.asarray(logits)).all()

    gathered = jax.device_get(state)
    gathered = jax.tree_util.tree_map(jnp.asarray, gathered)

    tok = jnp.argmax(logits, axis=-1)
    toks_sh, toks_g = [], []
    st_sh, st_g = state, gathered
    t_sh = t_g = tok
    for _ in range(4):
        lg_sh, st_sh = llama.decode_step(params, t_sh, st_sh, mcfg, ccfg)
        lg_g, st_g = llama.decode_step(params, t_g, st_g, mcfg, ccfg)
        t_sh = jnp.argmax(lg_sh, axis=-1)
        t_g = jnp.argmax(lg_g, axis=-1)
        toks_sh.append(np.asarray(t_sh))
        toks_g.append(np.asarray(t_g))
    np.testing.assert_array_equal(np.stack(toks_sh), np.stack(toks_g))


# ---------------------------------------------------------------------------
# Ragged sharded compression (VERDICT r4 weak #8)
# ---------------------------------------------------------------------------

def _cache_sets(cache):
    out = []
    for t in cache.tiers:
        pos = np.asarray(t.positions)
        val = np.asarray(t.valid)
        out.append([np.sort(pos[b][val[b]]) for b in range(pos.shape[0])])
    return out


@pytest.mark.parametrize("n", [2, 4])
def test_ragged_sharded_equals_ragged_chunked(setup, n):
    """compress_layer_kv under shard_map with a ragged token_valid slice
    equals the single-device chunked ragged reference: same kept position
    sets per row per tier, padding never stored."""
    from jax.sharding import PartitionSpec as P

    mcfg, ccfg, params, _ = setup
    rng = np.random.RandomState(0)
    b, s, hkv, d = 2, 128, mcfg.num_kv_heads, mcfg.head_dim
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)).astype(np.float32))
    mass = jnp.asarray(rng.rand(b, s).astype(np.float32))
    lengths = jnp.asarray([77, 128], jnp.int32)
    tv = jnp.arange(s)[None] < lengths[:, None]
    plens = jnp.clip((lengths * ccfg.prompt_frac).astype(jnp.int32), 1,
                     ccfg.prompt_length(s))

    ref_cache, ref_stats = compress_layer_kv_chunked(
        k, v, mass, 0, ccfg, mcfg, n_chunks=n, token_valid=tv,
        prompt_lens=plens)

    mesh = create_seq_mesh(n)
    s_loc = s // n

    def local(k_l, v_l, m_l, tv_l, plens):
        my = jax.lax.axis_index("seq")
        return compress_layer_kv(k_l, v_l, m_l, 0, ccfg, mcfg,
                                 token_valid=tv_l, prompt_lens=plens,
                                 axis_name="seq", shard_offset=my * s_loc,
                                 total_len=s)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "seq"), P(None, "seq"), P(None, "seq"),
                  P(None, "seq"), P()),
        out_specs=(P(None, "seq"), P()), check_vma=False)
    sh_cache, sh_stats = jax.jit(fn)(k, v, mass, tv, plens)

    ref_sets = _cache_sets(ref_cache)
    sh_sets = _cache_sets(sh_cache)
    for tier_ref, tier_sh in zip(ref_sets, sh_sets):
        for row_ref, row_sh in zip(tier_ref, tier_sh):
            np.testing.assert_array_equal(row_sh, row_ref)
    # Padding never stored.
    for t in sh_cache.tiers:
        pos = np.asarray(t.positions)
        val = np.asarray(t.valid)
        for b_ in range(2):
            assert (pos[b_][val[b_]] < int(lengths[b_])).all()
    # Global stats match the chunked reference.
    np.testing.assert_allclose(
        np.asarray(sh_stats["kept_tokens"]),
        np.asarray(ref_stats["kept_tokens"]))
    np.testing.assert_allclose(
        np.asarray(sh_stats["compression_ratio"]),
        np.asarray(ref_stats["compression_ratio"]), rtol=1e-5)


def test_ragged_seq_parallel_prefill_matches_single_device(setup):
    """Replicated-compression seq-parallel prefill with ragged lengths ==
    single-device ragged prefill_compressed (same global selection policy):
    logits at true last positions and per-tier kept sets match."""
    mcfg, ccfg, params, ids = setup
    lengths = jnp.asarray([100, 128], jnp.int32)

    lg1, st1, _ = llama.prefill_compressed(params, ids, mcfg, ccfg,
                                           max_decode_len=8,
                                           lengths=lengths)
    mesh = create_seq_mesh(4)
    lgn, stn, _ = seq_parallel_prefill(params, ids, mcfg, ccfg, mesh,
                                       max_decode_len=8, interpret=True,
                                       lengths=lengths)
    np.testing.assert_allclose(np.asarray(lgn, np.float32),
                               np.asarray(lg1, np.float32),
                               rtol=2e-4, atol=2e-4)
    assert np.array_equal(np.asarray(stn.position), np.asarray(lengths))
    for l in range(mcfg.num_layers):
        for t1, tn in zip(st1.caches[l].tiers, stn.caches[l].tiers):
            for b_ in range(2):
                np.testing.assert_array_equal(
                    np.sort(np.asarray(tn.positions[b_])[np.asarray(tn.valid[b_])]),
                    np.sort(np.asarray(t1.positions[b_])[np.asarray(t1.valid[b_])]))


def test_ragged_query_guided_seq_parallel(setup):
    """Ragged lengths x query-guided importance x sequence sharding (the
    full composition): per-row observation windows end at each row's true
    length; logits match the single-device ragged reference and padding
    is never stored."""
    import dataclasses

    mcfg, ccfg, params, ids = setup
    ccfg_q = dataclasses.replace(ccfg, importance_source="query")
    lengths = jnp.asarray([100, 128], jnp.int32)

    lg1, st1, _ = llama.prefill_compressed(params, ids, mcfg, ccfg_q,
                                           max_decode_len=8,
                                           lengths=lengths)
    mesh = create_seq_mesh(4)
    lgn, stn, _ = seq_parallel_prefill(params, ids, mcfg, ccfg_q, mesh,
                                       max_decode_len=8, interpret=True,
                                       lengths=lengths)
    np.testing.assert_allclose(np.asarray(lgn, np.float32),
                               np.asarray(lg1, np.float32),
                               rtol=2e-4, atol=2e-4)
    for l in range(mcfg.num_layers):
        for t1, tn in zip(st1.caches[l].tiers, stn.caches[l].tiers):
            for b_ in range(2):
                pos_n = np.asarray(tn.positions[b_])[np.asarray(tn.valid[b_])]
                assert (pos_n < int(lengths[b_])).all()
                np.testing.assert_array_equal(
                    np.sort(pos_n),
                    np.sort(np.asarray(t1.positions[b_])[np.asarray(t1.valid[b_])]))
