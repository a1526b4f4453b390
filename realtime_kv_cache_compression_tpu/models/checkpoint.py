"""Framework-native checkpointing (orbax) for params and optimizer state.

The reference's only persistence is HF `save_pretrained`
(run_compression_experiment.py:297-301); here params/opt-state pytrees save
and restore with orbax — sharding-aware on restore (pass the target mesh via
`shardings`), covering fine-tuning resume and serving warm-start.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save_checkpoint(path: str, tree: Any):
    """Save a pytree (params, opt state, ...) to `path` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template: Any = None,
                    shardings: Any = None) -> Any:
    """Restore a pytree. `template` supplies structure/dtypes (abstract
    values are fine); `shardings` optionally places leaves on a mesh."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is None:
        return ckptr.restore(path)
    abstract = jax.tree_util.tree_map(
        lambda x, s=None: jax.ShapeDtypeStruct(x.shape, x.dtype), template)
    if shardings is not None:
        abstract = jax.tree_util.tree_map(
            lambda a, sh: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh),
            abstract, shardings)
    return ckptr.restore(path, abstract)
