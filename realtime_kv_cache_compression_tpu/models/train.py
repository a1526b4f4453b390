"""Minimal LM training step (next-token cross-entropy + AdamW).

The reference does no training (SURVEY.md §5, "Checkpoint/resume: no
training, so none"); this exists so the framework's sharded forward path is
exercised under grad — fine-tuning support and the multi-chip dryrun's
"full training step over the mesh" both ride on it.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig
from .llama import forward_logits

Params = Dict[str, Any]


def lm_loss(params: Params, input_ids: jax.Array, cfg: ModelConfig,
            use_flash: bool = False,
            loss_mask: Optional[jax.Array] = None) -> jax.Array:
    """Next-token cross-entropy.

    loss_mask: optional [B, S-1] per-TARGET-position weights (aligned to
    input_ids[:, 1:]). SFT-style masking — at long contexts an unmasked
    mean is dominated by unpredictable filler and the supervised span's
    gradient share collapses with 1/S. None → plain mean over all
    positions.
    """
    logits = forward_logits(params, input_ids, cfg,
                            use_flash=use_flash).astype(jnp.float32)
    targets = input_ids[:, 1:]
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if loss_mask is not None:
        w = loss_mask.astype(nll.dtype)
        return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)
    return nll.mean()


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01,
                   total_steps: Optional[int] = None,
                   warmup_frac: float = 0.05, clip_norm: float = 1.0):
    """AdamW with global-norm clipping; pass `total_steps` for a linear
    warmup + cosine decay schedule.

    The constant-lr form destabilizes the quality-demo recall trainings
    (loss bounced 0.03 -> 1.5 across steps at lr 3e-3, round-4 needle
    runs); warmup+cosine with clip 1.0 is the boring fix.
    """
    if total_steps:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr,
            warmup_steps=max(int(total_steps * warmup_frac), 1),
            decay_steps=total_steps, end_value=lr * 0.01)
    return optax.chain(optax.clip_by_global_norm(clip_norm),
                       optax.adamw(lr, weight_decay=weight_decay))


def train_step(params: Params, opt_state, input_ids: jax.Array,
               cfg: ModelConfig, optimizer, use_flash: bool = False,
               loss_mask: Optional[jax.Array] = None
               ) -> Tuple[Params, Any, jax.Array]:
    """One SPMD training step; grads/updates follow the params sharding."""
    loss, grads = jax.value_and_grad(lm_loss)(params, input_ids, cfg,
                                              use_flash, loss_mask)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
