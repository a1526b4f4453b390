"""Pipeline parallelism tests (virtual multi-device CPU mesh).

Covers the SPMD GPipe training schedule (loss parity vs models.train.lm_loss,
a full train step) and the per-stage compressed-inference pipeline (prefill
logits + greedy tokens identical to the single-device path). SURVEY.md §2.6
marks pipeline parallelism optional — no reference counterpart exists; parity
targets are this framework's own single-device functions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realtime_kv_cache_compression_tpu import (CompressionConfig,
                                               tiny_test_model)
from realtime_kv_cache_compression_tpu.models import llama, train
from realtime_kv_cache_compression_tpu.parallel import pipeline


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8
    mcfg = tiny_test_model()  # 4 layers
    params = llama.init_params(jax.random.PRNGKey(0), mcfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 64), 0,
                             mcfg.vocab_size)
    return mcfg, params, ids


def test_stack_unstack_roundtrip(setup):
    mcfg, params, _ = setup
    mesh = pipeline.create_pipe_mesh(4)
    stacked = pipeline.stack_pipeline_params(params, mesh)
    back = pipeline.unstack_pipeline_params(stacked)
    assert len(back["layers"]) == mcfg.num_layers
    for orig, got in zip(params["layers"], back["layers"]):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                    np.asarray(b)),
            orig, got)


@pytest.mark.parametrize("n_stages,n_mb", [(2, 2), (4, 4)])
def test_pipeline_lm_loss_matches_train(setup, n_stages, n_mb):
    mcfg, params, ids = setup
    ref = float(train.lm_loss(params, ids, mcfg))
    mesh = pipeline.create_pipe_mesh(n_stages)
    stacked = pipeline.stack_pipeline_params(params, mesh)
    got = float(pipeline.pipeline_lm_loss(stacked, ids, mcfg, mesh,
                                          n_microbatches=n_mb))
    # Microbatched mean-of-means == full mean (equal microbatch sizes).
    assert got == pytest.approx(ref, rel=2e-5)


def test_pipeline_train_step(setup):
    mcfg, params, ids = setup
    mesh = pipeline.create_pipe_mesh(4)
    stacked = pipeline.stack_pipeline_params(params, mesh)
    opt = train.make_optimizer(lr=1e-3)
    opt_state = opt.init(stacked)
    new_params, opt_state, loss = pipeline.pipeline_train_step(
        stacked, opt_state, ids, mcfg, opt, mesh, n_microbatches=2)
    assert np.isfinite(float(loss))
    before = np.asarray(stacked["layers"]["wq"]).ravel()
    after = np.asarray(new_params["layers"]["wq"]).ravel()
    assert not np.allclose(before, after)


def test_pipeline_inference_parity(setup):
    mcfg, params, ids = setup
    ccfg = CompressionConfig(num_layers=mcfg.num_layers)
    n_steps = 6

    logits_ref, state, _ = llama.prefill_compressed(params, ids, mcfg, ccfg,
                                                    max_decode_len=16)
    tok = jnp.argmax(logits_ref, axis=-1)
    ref_toks = [tok]
    for _ in range(n_steps - 1):
        logits, state = llama.decode_step(params, tok, state, mcfg, ccfg)
        tok = jnp.argmax(logits, axis=-1)
        ref_toks.append(tok)
    ref = np.stack([np.asarray(t) for t in ref_toks], axis=1)

    pipe = pipeline.PipelineInference(params, mcfg, ccfg, n_stages=2,
                                      max_decode_len=16)
    logits_p, stats = pipe.prefill(ids)
    assert len(stats) == mcfg.num_layers
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_ref),
                               rtol=2e-4, atol=2e-4)
    first = jnp.argmax(logits_p, axis=-1)
    toks = pipe.decode(first, n_steps - 1)
    got = np.concatenate([np.asarray(first)[:, None], np.asarray(toks)],
                         axis=1)
    np.testing.assert_array_equal(got, ref)
