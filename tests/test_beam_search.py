"""Beam search over the compressed cache.

Parity surface: HF `model.generate(num_beams=...)`, which the reference had
available through GenerationConfig (longbench_eval.py:131-139) but never
exercised. Correctness here is checked exactly: the returned beam score must
equal the teacher-forced log-probability of the returned sequence computed
step-by-step through the same compressed decode path.
"""

import jax
import jax.numpy as jnp
import numpy as np

import realtime_kv_cache_compression_tpu as rtc
from realtime_kv_cache_compression_tpu.models import llama
from realtime_kv_cache_compression_tpu.models.beam_search import beam_search


def _setup(batch=2, seq=64, seed=0):
    mcfg = rtc.tiny_test_model()
    ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers)
    params = llama.init_params(jax.random.PRNGKey(seed), mcfg)
    ids = jax.random.randint(jax.random.PRNGKey(seed + 1), (batch, seq), 0,
                             mcfg.vocab_size)
    return mcfg, ccfg, params, ids


def _teacher_forced_logprob(params, ids, seq_toks, mcfg, ccfg):
    """Sum of log p(token_t | prefix) along the generated sequence, computed
    through the same compressed prefill + decode_step path beam search uses."""
    logits, state, _ = llama.prefill_compressed(
        params, ids, mcfg, ccfg, max_decode_len=len(seq_toks))
    total = 0.0
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    total += float(lp[0, seq_toks[0]])
    for t in range(len(seq_toks) - 1):
        tok = jnp.asarray([seq_toks[t]], jnp.int32)
        logits, state = llama.decode_step(params, tok, state, mcfg, ccfg,
                                          use_fused=False)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        total += float(lp[0, seq_toks[t + 1]])
    return total


class TestBeamSearch:
    def test_beam1_equals_greedy(self):
        mcfg, ccfg, params, ids = _setup()
        greedy, _ = llama.generate(params, ids, mcfg, ccfg, max_new_tokens=8)
        beams, scores, _ = beam_search(params, ids, mcfg, ccfg, num_beams=1,
                                       max_new_tokens=8,
                                       use_fused_decode=False)
        assert jnp.array_equal(greedy, beams)
        assert scores.shape == (2,)

    def test_score_matches_teacher_forced_logprob(self):
        mcfg, ccfg, params, ids = _setup(batch=1)
        t = 6
        beams, scores, _ = beam_search(params, ids, mcfg, ccfg, num_beams=3,
                                       max_new_tokens=t, length_penalty=1.0,
                                       use_fused_decode=False)
        seq = [int(x) for x in np.asarray(beams[0])]
        want = _teacher_forced_logprob(params, ids, seq, mcfg, ccfg)
        got = float(scores[0]) * t  # undo the /len**1.0 normalization
        assert abs(got - want) < 5e-3, (got, want)

    def test_beam_score_at_least_greedy(self):
        # The greedy sequence is in the search space; with enough beams the
        # best beam's raw score must be >= the greedy path's score.
        mcfg, ccfg, params, ids = _setup(batch=1, seed=3)
        t = 5
        greedy, _ = llama.generate(params, ids, mcfg, ccfg, max_new_tokens=t)
        g_lp = _teacher_forced_logprob(
            params, ids, [int(x) for x in np.asarray(greedy[0])], mcfg, ccfg)
        _, scores, _ = beam_search(params, ids, mcfg, ccfg, num_beams=4,
                                   max_new_tokens=t, length_penalty=0.0,
                                   use_fused_decode=False)
        assert float(scores[0]) >= g_lp - 5e-3

    def test_all_beams_sorted_and_distinct(self):
        mcfg, ccfg, params, ids = _setup(batch=2, seed=5)
        beams, scores, _ = beam_search(params, ids, mcfg, ccfg, num_beams=4,
                                       max_new_tokens=6,
                                       use_fused_decode=False,
                                       return_all_beams=True)
        assert beams.shape == (2, 4, 6) and scores.shape == (2, 4)
        s = np.asarray(scores)
        assert (np.diff(s, axis=1) <= 1e-6).all()  # best-first
        for row in np.asarray(beams):
            seqs = {tuple(x) for x in row}
            assert len(seqs) == 4  # beams are distinct hypotheses

    def test_eos_freezes_and_pads(self):
        mcfg, ccfg, params, ids = _setup(batch=1, seed=7)
        free, _, _ = beam_search(params, ids, mcfg, ccfg, num_beams=3,
                                 max_new_tokens=8, use_fused_decode=False)
        # EOS = the best first token: that beam finishes at step 0 and —
        # with its score frozen while live beams keep accumulating negative
        # log-probs — is guaranteed to survive the whole search.
        eos = int(free[0, 0])
        out, scores, _ = beam_search(params, ids, mcfg, ccfg, num_beams=3,
                                     max_new_tokens=8, eos_token_id=eos,
                                     use_fused_decode=False,
                                     return_all_beams=True)
        rows = [[int(x) for x in r] for r in np.asarray(out[0])]
        assert any(eos in row for row in rows)
        for row in rows:  # every finished beam is EOS-padded to the end
            if eos in row:
                first = row.index(eos)
                assert all(x == eos for x in row[first:])
        assert np.isfinite(np.asarray(scores)).all()
