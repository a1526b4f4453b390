"""Continuous-batching serving engine over compressed KV caches.

North-star component (BASELINE.json config 5; the reference has no serving
layer at all — generation is bare HF `model.generate`, longbench_eval.py:131).

Design (single host, round 1):
  * B fixed decode slots. Each slot holds one sequence's compressed tier
    pools + recent ring + position (all batched pytrees indexed by slot).
  * Admission: a pending request is prefilled at batch=1 (bucketed to the
    serving context length), then its cache is scattered into a free slot —
    a pure `tree_map` dynamic-update, O(cache bytes), no recompile.
  * Decode: one scanned multi-step program advances ALL active slots;
    finished slots (EOS or token budget) are freed and refilled.
  * Static shapes throughout: slot count, context bucket, recent-ring
    capacity are fixed at engine build; per-sequence raggedness lives in
    positions/validity values.

Multi-host plan (round 2+): slots shard over the `data` mesh axis, weights
and tier pools over `model`; admission runs on the host owning the slot's
data shard; the decode program is one pjit over the full mesh.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..compression.compressor import summarize_layer_stats
from ..config import CompressionConfig, ModelConfig
from ..models import llama

Array = jax.Array


@dataclasses.dataclass
class Request:
    rid: int
    input_ids: List[int]
    max_new_tokens: int
    submitted_at: float = dataclasses.field(default_factory=time.time)
    prefill_stats: Optional[Dict] = None
    tokens: List[int] = dataclasses.field(default_factory=list)
    finished: bool = False
    ttft: Optional[float] = None
    finished_at: Optional[float] = None


def _tree_insert(batched, single, slot: int):
    """Scatter a batch=1 pytree into slot `slot` of a batched pytree."""
    return jax.tree_util.tree_map(
        lambda b, s: jax.lax.dynamic_update_index_in_dim(b, s[0], slot,
                                                         axis=0),
        batched, single)


class ServingEngine:
    """Greedy-decoding continuous-batching engine (single host)."""

    def __init__(self, params, mcfg: ModelConfig, ccfg: CompressionConfig,
                 num_slots: int = 4, context_len: int = 2048,
                 max_new_tokens: int = 128, decode_chunk: int = 8,
                 use_flash: bool = False, use_fused_decode: bool = False,
                 eos_token_id: Optional[int] = None,
                 async_admission: bool = False,
                 temperature: float = 0.0,
                 seed: int = 0):
        self.params = params
        self.mcfg = mcfg
        self.ccfg = ccfg
        self.num_slots = num_slots
        self.context_len = context_len
        self.max_new_tokens = max_new_tokens
        self.decode_chunk = decode_chunk
        self.eos_token_id = eos_token_id

        self.async_admission = async_admission
        self._pending: deque[Request] = deque()
        self._inflight: List = []  # (req, slot, logits, state1, stats)
        self._slots: List[Optional[Request]] = [None] * num_slots
        self._slot_budget = [0] * num_slots
        self._next_rid = 0
        self.completed: Dict[int, Request] = {}

        self._prefill = jax.jit(lambda p, i, n: llama.prefill_compressed(
            p, i, mcfg, ccfg, max_decode_len=max_new_tokens,
            use_flash=use_flash, lengths=n))
        self._insert = jax.jit(_tree_insert)  # one dispatch, not hundreds
        # Multi-step batched decode; returns per-step tokens for all slots.
        self.temperature = temperature
        self._rng = jax.random.PRNGKey(seed)
        self._decode = jax.jit(lambda p, t, s, k: llama.decode_loop(
            p, t, s, decode_chunk, mcfg, ccfg,
            use_fused=use_fused_decode, temperature=temperature, rng=k))

        # Batched state, created lazily at first admission.
        self._state: Optional[llama.DecodeState] = None
        self._last_tokens: Optional[Array] = None  # [num_slots]
        self._active_mask = [False] * num_slots

    # -- public API ---------------------------------------------------------

    def submit(self, input_ids: List[int], max_new_tokens: Optional[int] = None
               ) -> int:
        rid = self._next_rid
        self._next_rid += 1
        self._pending.append(Request(
            rid=rid, input_ids=list(input_ids),
            max_new_tokens=min(max_new_tokens or self.max_new_tokens,
                               self.max_new_tokens)))
        return rid

    def has_work(self) -> bool:
        return (bool(self._pending) or bool(self._inflight)
                or any(self._active_mask))

    def run(self, max_steps: int = 10_000) -> Dict[int, Request]:
        """Drive until all submitted requests complete."""
        steps = 0
        while self.has_work() and steps < max_steps:
            self.step()
            steps += 1
        return self.completed

    # -- internals ----------------------------------------------------------

    def _bucket_ids(self, ids: List[int]) -> Tuple[Array, Array]:
        """Right-pad to the serving bucket; true length rides along (ragged
        prefill never stores or attends padding)."""
        from ..utils.data import truncate_middle

        ids = truncate_middle(ids, self.context_len)
        length = len(ids)
        ids = ids + [0] * (self.context_len - length)
        return (jnp.asarray(ids, jnp.int32)[None],
                jnp.asarray([length], jnp.int32))

    def _admit(self, req: Request, slot: int):
        t0 = time.time()
        ids, lengths = self._bucket_ids(req.input_ids)
        logits, state1, stats = self._prefill(self.params, ids, lengths)
        first_tok = jnp.argmax(logits, axis=-1)  # [1]
        tok0 = int(first_tok[0])  # forces prefill completion
        req.ttft = time.time() - t0
        # Keep stats on device; summarize lazily at completion (a ~30 ms-RTT
        # relay makes eager per-layer syncing cost seconds per request).
        req.prefill_stats = stats
        req.tokens.append(tok0)

        if self._state is None:
            # Materialize the batched state by broadcasting the first
            # sequence's shapes across slots.
            self._state = jax.tree_util.tree_map(
                lambda x: jnp.concatenate([x] * self.num_slots, axis=0),
                state1)
            self._last_tokens = jnp.zeros((self.num_slots,), jnp.int32)
        self._state = self._insert(self._state, state1, slot)
        self._last_tokens = self._last_tokens.at[slot].set(first_tok[0])
        self._slots[slot] = req
        self._slot_budget[slot] = req.max_new_tokens - 1
        self._active_mask[slot] = True
        if self._slot_budget[slot] <= 0:
            self._finish(slot)

    def _finish(self, slot: int):
        req = self._slots[slot]
        if req is not None:
            req.finished = True
            req.finished_at = time.time()
            if isinstance(req.prefill_stats, list):  # device stats → floats
                req.prefill_stats = summarize_layer_stats(req.prefill_stats)
            self.completed[req.rid] = req
        self._slots[slot] = None
        self._active_mask[slot] = False

    # -- overlapped admission -----------------------------------------------

    def _start_admission(self, req: Request, slot: int):
        """Dispatch the prefill WITHOUT a host sync; completion is polled via
        Array.is_ready() between decode chunks, so admissions pipeline with
        decode instead of stalling the loop on a host round-trip."""
        ids, lengths = self._bucket_ids(req.input_ids)
        logits, state1, stats = self._prefill(self.params, ids, lengths)
        self._slots[slot] = req  # reserve; not active until ready
        self._inflight.append((req, slot, logits, state1, stats))

    def _complete_admission(self, req: Request, slot: int, logits, state1,
                            stats):
        first_tok = jnp.argmax(logits, axis=-1)
        tok0 = int(first_tok[0])
        req.ttft = time.time() - req.submitted_at
        req.prefill_stats = stats
        req.tokens.append(tok0)
        if self._state is None:
            self._state = jax.tree_util.tree_map(
                lambda x: jnp.concatenate([x] * self.num_slots, axis=0),
                state1)
            self._last_tokens = jnp.zeros((self.num_slots,), jnp.int32)
        self._state = self._insert(self._state, state1, slot)
        self._last_tokens = self._last_tokens.at[slot].set(tok0)
        self._slot_budget[slot] = req.max_new_tokens - 1
        self._active_mask[slot] = True
        if self._slot_budget[slot] <= 0:
            self._finish(slot)

    def _poll_inflight(self, force: bool = False):
        still = []
        for item in self._inflight:
            req, slot, logits, state1, stats = item
            if force or logits.is_ready():
                self._complete_admission(req, slot, logits, state1, stats)
            else:
                still.append(item)
        self._inflight = still

    def step(self):
        # 1) Admit pending requests into free slots.
        for slot in range(self.num_slots):
            if self._slots[slot] is None and self._pending:
                if self.async_admission:
                    self._start_admission(self._pending.popleft(), slot)
                else:
                    self._admit(self._pending.popleft(), slot)
        if self.async_admission:
            # Nothing to decode yet → block on the oldest admission.
            self._poll_inflight(force=not any(self._active_mask))
        if not any(self._active_mask):
            return

        # 2) One decode chunk for the whole batch.
        self._rng, sub = jax.random.split(self._rng)
        toks, self._state = self._decode(self.params, self._last_tokens,
                                         self._state, sub)
        toks_host = jax.device_get(toks)  # [num_slots, decode_chunk]
        self._last_tokens = toks[:, -1]

        # 3) Distribute tokens, finish slots.
        for slot in range(self.num_slots):
            if not self._active_mask[slot]:
                continue
            req = self._slots[slot]
            take = min(self.decode_chunk, self._slot_budget[slot])
            new = [int(t) for t in toks_host[slot][:take]]
            if self.eos_token_id is not None and self.eos_token_id in new:
                new = new[:new.index(self.eos_token_id) + 1]
                req.tokens.extend(new)
                self._finish(slot)
                continue
            req.tokens.extend(new)
            self._slot_budget[slot] -= take
            if self._slot_budget[slot] <= 0:
                self._finish(slot)

    # -- stats --------------------------------------------------------------

    def summary(self) -> Dict[str, Any]:
        done = list(self.completed.values())
        if not done:
            return {"completed": 0}
        walls = [r.finished_at - r.submitted_at for r in done]
        return {
            "completed": len(done),
            "avg_ttft_s": sum(r.ttft for r in done) / len(done),
            "avg_wall_s": sum(walls) / len(walls),
            "total_tokens": sum(len(r.tokens) for r in done),
            "avg_memory_savings": (
                sum(r.prefill_stats["avg_memory_savings"] for r in done)
                / len(done)),
        }
