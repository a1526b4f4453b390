"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The JAX-idiomatic way to test "multi-node without a cluster"
(SURVEY.md §4): XLA_FORCE_HOST_PLATFORM_DEVICE_COUNT=8 (set in conftest).
Covers: tensor-parallel param placement, dp+tp compressed prefill/decode
numerics vs single-device, selection consistency across model shards, and
the sharded training step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                               tiny_test_model)
from realtime_kv_cache_compression_tpu.models import llama, train
from realtime_kv_cache_compression_tpu.parallel import (
    MODEL_AXIS, create_mesh, data_sharding, param_specs, shard_params)


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mcfg = tiny_test_model(num_layers=2, num_heads=8, num_kv_heads=4,
                           head_dim=16, hidden_size=128,
                           intermediate_size=256)
    ccfg = CompressionConfig(num_layers=2)
    params = llama.init_params(jax.random.PRNGKey(0), mcfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 64), 0,
                             mcfg.vocab_size)
    return mcfg, ccfg, params, ids


def test_param_specs_cover_tree(setup):
    mcfg, _, params, _ = setup
    specs = param_specs(mcfg)
    jax.tree_util.tree_map(lambda x, s: None, params, specs,
                           is_leaf=lambda x: isinstance(x, P))


def test_sharded_placement(setup):
    mcfg, _, params, _ = setup
    mesh = create_mesh(2, 4)
    sharded = shard_params(params, mesh, mcfg)
    wq = sharded["layers"][0]["wq"]
    # Column-sharded over 4 model shards.
    shard_shapes = {s.data.shape for s in wq.addressable_shards}
    assert shard_shapes == {(wq.shape[0], wq.shape[1] // 4)}
    np.testing.assert_allclose(np.asarray(wq),
                               np.asarray(params["layers"][0]["wq"]))


def test_sharded_prefill_matches_single_device(setup):
    mcfg, ccfg, params, ids = setup
    logits_1, _, stats_1 = llama.prefill_compressed(params, ids, mcfg, ccfg)

    mesh = create_mesh(2, 4)
    sharded = shard_params(params, mesh, mcfg)
    ids_s = jax.device_put(ids, data_sharding(mesh))
    with mesh:
        fn = jax.jit(lambda p, i: llama.prefill_compressed(p, i, mcfg, ccfg))
        logits_8, state_8, stats_8 = fn(sharded, ids_s)
    np.testing.assert_allclose(np.asarray(logits_8), np.asarray(logits_1),
                               atol=2e-4)
    # Selection is replicated across model shards by construction: the kept
    # token count must match the single-device run exactly.
    np.testing.assert_array_equal(
        np.asarray(stats_8[0]["kept_tokens"]),
        np.asarray(stats_1[0]["kept_tokens"]))
    # Cache membership identical per tier (intra-tier storage order is
    # score-descending; GSPMD layer-reduction float association can permute
    # near-tied tokens within a tier without changing membership).
    for t1, t8 in zip(
            llama.prefill_compressed(params, ids, mcfg, ccfg)[1].caches[0].tiers,
            state_8.caches[0].tiers):
        np.testing.assert_array_equal(np.asarray(t8.valid),
                                      np.asarray(t1.valid))
        for b in range(t1.positions.shape[0]):
            v = np.asarray(t1.valid[b])
            np.testing.assert_array_equal(
                np.sort(np.asarray(t8.positions[b])[np.asarray(t8.valid[b])]),
                np.sort(np.asarray(t1.positions[b])[v]))


def test_sharded_decode_matches_single_device(setup):
    mcfg, ccfg, params, ids = setup
    _, state_1, _ = llama.prefill_compressed(params, ids, mcfg, ccfg,
                                             max_decode_len=4)
    tok = jnp.full((ids.shape[0],), 7, jnp.int32)
    l1, _ = llama.decode_step(params, tok, state_1, mcfg, ccfg)

    mesh = create_mesh(2, 4)
    sharded = shard_params(params, mesh, mcfg)
    ids_s = jax.device_put(ids, data_sharding(mesh))
    with mesh:
        prefill = jax.jit(lambda p, i: llama.prefill_compressed(
            p, i, mcfg, ccfg, max_decode_len=4))
        _, state_8, _ = prefill(sharded, ids_s)
        step = jax.jit(lambda p, t, s: llama.decode_step(p, t, s, mcfg,
                                                         ccfg))
        l8, _ = step(sharded, tok, state_8)
    np.testing.assert_allclose(np.asarray(l8), np.asarray(l1), atol=2e-4)


def test_cache_sharding_committed(setup):
    """VERDICT #3: the KV tier pools' committed layout on a 2x4 mesh is
    P(data, None, model, None) — enforced by prefill(mesh=...), asserted on
    the actual arrays, not just output numerics."""
    from jax.sharding import NamedSharding

    mcfg, _, params, ids = setup
    # Pool-enabled config so decode pools get constrained too.
    ccfg = CompressionConfig(num_layers=2, decode_pool_blocks=2,
                             decode_pool_bits=8)
    mesh = create_mesh(2, 4)
    sharded = shard_params(params, mesh, mcfg)
    ids_s = jax.device_put(ids, data_sharding(mesh))
    with mesh:
        fn = jax.jit(lambda p, i: llama.prefill_compressed(
            p, i, mcfg, ccfg, max_decode_len=8, mesh=mesh))
        logits, state, _ = fn(sharded, ids_s)

    def expect(arr, *spec):
        want = NamedSharding(mesh, P(*spec))
        assert arr.sharding.is_equivalent_to(want, arr.ndim), (
            arr.shape, arr.sharding, want)

    for layer_cache in state.caches:
        for t in layer_cache.tiers:
            if t.capacity == 0:
                continue
            expect(t.k_stored, "data", None, "model", None)
            expect(t.v_stored, "data", None, "model", None)
            expect(t.k_scale, "data", None, "model", None)
            expect(t.positions, "data", None)
            expect(t.valid, "data", None)
    for r in state.recents:
        expect(r.k, "data", None, "model", None)
        expect(r.length, "data")
    for p in state.pools:
        expect(p.k_stored, "data", None, "model", None)
        expect(p.positions, "data", None)

    # Numerics still match single-device under the enforced layout.
    logits_1, _, _ = llama.prefill_compressed(params, ids, mcfg, ccfg,
                                              max_decode_len=8)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_1),
                               atol=2e-4)

    # Decode over the committed layout keeps it (one step).
    tok = jnp.full((ids.shape[0],), 7, jnp.int32)
    with mesh:
        step = jax.jit(lambda pr, t, s: llama.decode_step(pr, t, s, mcfg,
                                                          ccfg))
        _, state2 = step(sharded, tok, state)
    expect(state2.recents[0].k, "data", None, "model", None)


def test_sharded_train_step_runs_and_is_finite(setup):
    mcfg, _, params, ids = setup
    mesh = create_mesh(2, 4)
    sharded = shard_params(params, mesh, mcfg)
    ids_s = jax.device_put(ids, data_sharding(mesh))
    optimizer = train.make_optimizer()
    with mesh:
        opt_state = optimizer.init(sharded)
        step = jax.jit(lambda p, o, i: train.train_step(p, o, i, mcfg,
                                                        optimizer))
        new_params, _, loss = step(sharded, opt_state, ids_s)
    assert np.isfinite(float(loss))
    # Params actually changed.
    delta = float(jnp.abs(new_params["layers"][0]["wq"]
                          - sharded["layers"][0]["wq"]).max())
    assert delta > 0


def test_model_axis_sizes():
    mcfg = tiny_test_model(num_kv_heads=4, head_dim=16)
    # kv_dim divisible by the model axis is the sharding contract.
    for model in (1, 2, 4):
        assert mcfg.kv_dim % model == 0
