"""Request-level serving controls: stop sequences, per-request EOS,
streaming callbacks, and per-token logprobs.

Serving-API parity surface (the reference had no serving layer; HF
`generate` exposes eos/stopping-criteria/score outputs — here they are
first-class per-request controls on the continuous-batching engine)."""

import jax
import jax.numpy as jnp
import numpy as np

import realtime_kv_cache_compression_tpu as rtc
from realtime_kv_cache_compression_tpu.models import llama
from realtime_kv_cache_compression_tpu.serving.engine import ServingEngine


def _setup(seed=0):
    mcfg = rtc.tiny_test_model()
    ccfg = rtc.CompressionConfig(num_layers=mcfg.num_layers)
    params = llama.init_params(jax.random.PRNGKey(seed), mcfg)
    rng = np.random.RandomState(seed + 1)
    prompt = rng.randint(0, mcfg.vocab_size, size=56).tolist()
    return mcfg, ccfg, params, prompt


def _run_one(params, mcfg, ccfg, prompt, n=13, **submit_kw):
    eng = ServingEngine(params, mcfg, ccfg, num_slots=2, context_len=64,
                        max_new_tokens=n, decode_chunk=4,
                        **submit_kw.pop("engine_kw", {}))
    rid = eng.submit(prompt, **submit_kw)
    done = eng.run()
    return done[rid]


def _find_sublist_end(seq, sub):
    for end in range(len(sub), len(seq) + 1):
        if seq[end - len(sub):end] == sub:
            return end
    return None


class TestStopSequences:
    def test_stop_spanning_chunk_boundary(self):
        mcfg, ccfg, params, prompt = _setup()
        full = _run_one(params, mcfg, ccfg, prompt).tokens
        assert len(full) == 13
        # Tokens land as [prefill tok0] + chunks of 4; a stop covering
        # indices 3..5 starts in chunk 1 (idx 1-4) and ends in chunk 2.
        stop = full[3:6]
        req = _run_one(params, mcfg, ccfg, prompt, stop_sequences=[stop])
        want_end = _find_sublist_end(full, stop)
        assert req.tokens == full[:want_end]
        assert req.stop_reason == "stop"

    def test_multiple_stops_earliest_wins(self):
        mcfg, ccfg, params, prompt = _setup(seed=2)
        full = _run_one(params, mcfg, ccfg, prompt).tokens
        s_late, s_early = full[8:10], full[2:4]
        req = _run_one(params, mcfg, ccfg, prompt,
                       stop_sequences=[s_late, s_early])
        ends = [e for e in (_find_sublist_end(full, s_late),
                            _find_sublist_end(full, s_early)) if e]
        assert req.tokens == full[:min(ends)]
        assert req.stop_reason == "stop"

    def test_no_match_runs_to_length(self):
        mcfg, ccfg, params, prompt = _setup(seed=3)
        full = _run_one(params, mcfg, ccfg, prompt).tokens
        absent = [mcfg.vocab_size - 1 - t for t in full[:2]]
        req = _run_one(params, mcfg, ccfg, prompt, stop_sequences=[absent])
        assert req.tokens == full
        assert req.stop_reason == "length"


class TestPerRequestEOS:
    def test_eos_override_and_default(self):
        mcfg, ccfg, params, prompt = _setup(seed=4)
        full = _run_one(params, mcfg, ccfg, prompt).tokens
        eos = full[5]
        first = full.index(eos)
        req = _run_one(params, mcfg, ccfg, prompt, eos_token_id=eos)
        assert req.tokens == full[:first + 1]
        assert req.stop_reason == "eos"
        # Same engine default (None): other requests run to length.
        eng = ServingEngine(params, mcfg, ccfg, num_slots=2, context_len=64,
                            max_new_tokens=13, decode_chunk=4)
        r1 = eng.submit(prompt, eos_token_id=eos)
        r2 = eng.submit(prompt)
        done = eng.run()
        assert done[r1].tokens == full[:first + 1]
        assert done[r2].tokens == full
        assert done[r2].stop_reason == "length"

    def test_eos_on_first_token(self):
        mcfg, ccfg, params, prompt = _setup(seed=5)
        full = _run_one(params, mcfg, ccfg, prompt).tokens
        req = _run_one(params, mcfg, ccfg, prompt, eos_token_id=full[0])
        assert req.tokens == [full[0]]
        assert req.stop_reason == "eos"


class TestStreaming:
    def test_on_token_streams_exactly_the_kept_tokens(self):
        mcfg, ccfg, params, prompt = _setup(seed=6)
        streamed = []
        calls = []

        def cb(req, new):
            calls.append(list(new))
            streamed.extend(new)

        req = _run_one(params, mcfg, ccfg, prompt, on_token=cb)
        assert streamed == req.tokens
        assert len(calls) >= 3  # prefill token + >=2 decode chunks

    def test_streaming_respects_stop_truncation(self):
        mcfg, ccfg, params, prompt = _setup(seed=7)
        full = _run_one(params, mcfg, ccfg, prompt).tokens
        stop = full[4:6]
        streamed = []
        req = _run_one(params, mcfg, ccfg, prompt, stop_sequences=[stop],
                       on_token=lambda r, new: streamed.extend(new))
        assert streamed == req.tokens


class TestLogprobs:
    def test_engine_logprobs_match_direct_decode(self):
        mcfg, ccfg, params, prompt = _setup(seed=8)
        n = 9
        req = _run_one(params, mcfg, ccfg, prompt, n=n,
                       engine_kw=dict(logprobs=True))
        assert len(req.logprobs) == len(req.tokens) == n
        # Recompute through the raw model path: prefill logits give the
        # first token's logprob; decode_loop(return_logprobs) the rest.
        ids = jnp.asarray([prompt], jnp.int32)
        logits, state, _ = llama.prefill_compressed(params, ids, mcfg, ccfg,
                                                    max_decode_len=n)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok0 = jnp.argmax(logits, axis=-1)
        want = [float(lp[0, tok0[0]])]
        toks, _, lps = llama.decode_loop(params, tok0, state, n - 1, mcfg,
                                         ccfg, use_fused=False,
                                         return_logprobs=True)
        want += [float(x) for x in lps[0]]
        assert [int(t) for t in jnp.concatenate([tok0, toks[0]])] == req.tokens
        np.testing.assert_allclose(req.logprobs, want, atol=1e-4)
        assert all(v <= 0.0 for v in req.logprobs)

    def test_decode_loop_logprobs_teacher_forced(self):
        mcfg, ccfg, params, prompt = _setup(seed=9)
        ids = jnp.asarray([prompt], jnp.int32)
        logits, state, _ = llama.prefill_compressed(params, ids, mcfg, ccfg,
                                                    max_decode_len=6)
        tok = jnp.argmax(logits, axis=-1)
        toks, _, lps = llama.decode_loop(params, tok, state, 5, mcfg, ccfg,
                                         use_fused=False,
                                         return_logprobs=True)
        # Replay step by step; the emitted logprob must equal the
        # log-softmax of that step's logits at the emitted (greedy) token.
        _, state2, _ = llama.prefill_compressed(params, ids, mcfg, ccfg,
                                                max_decode_len=6)
        cur = tok
        for t in range(5):
            step_logits, state2 = llama.decode_step(params, cur, state2,
                                                    mcfg, ccfg,
                                                    use_fused=False)
            lp = jax.nn.log_softmax(step_logits.astype(jnp.float32), axis=-1)
            nxt = int(jnp.argmax(step_logits, axis=-1)[0])
            assert nxt == int(toks[0, t])
            np.testing.assert_allclose(float(lps[0, t]), float(lp[0, nxt]),
                                       atol=1e-4)
            cur = jnp.asarray([nxt], jnp.int32)

    def test_logprobs_truncated_with_stop(self):
        mcfg, ccfg, params, prompt = _setup(seed=10)
        full = _run_one(params, mcfg, ccfg, prompt).tokens
        stop = full[3:5]
        req = _run_one(params, mcfg, ccfg, prompt, stop_sequences=[stop],
                       engine_kw=dict(logprobs=True))
        assert len(req.logprobs) == len(req.tokens)
