"""Reliable device timing through the axon relay.

`jax.block_until_ready` does not synchronize through this environment's TPU
relay, and each host readback costs a ~30 ms round trip. Timed regions must
therefore force completion with a scalar readback and subtract the measured
round trip. (On a directly attached TPU the RTT is ~0 and this degrades to
normal walls.)
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def readback(x) -> float:
    """Force completion of everything `x` depends on; returns a host scalar."""
    return float(jnp.asarray(x, jnp.float32).sum())


def measure_rtt(reps: int = 7) -> float:
    """Median readback round-trip for a trivial computation."""
    f = jax.jit(lambda a: a + 1.0)
    x = jnp.zeros((8, 128))
    readback(f(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        readback(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def timed(fn: Callable[[], object], rtt: float, reps: int = 3
          ) -> Tuple[float, object]:
    """Best-of-reps wall time of fn() (which must end in a readback),
    RTT-corrected. Returns (seconds, last_result)."""
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0 - rtt
        best = min(best, dt)
    return max(best, 1e-9), out
