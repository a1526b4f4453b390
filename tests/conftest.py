"""Test harness: force an 8-device virtual CPU mesh before JAX imports.

This is how JAX codebases test multi-device sharding without hardware
(SURVEY.md §4): XLA_FLAGS=--xla_force_host_platform_device_count=8 with the
CPU backend. All unit tests run CPU-only on synthetic tensors, mirroring the
reference's test strategy (/root/reference/tests/, SURVEY.md §4) — no model
downloads, sub-second suites.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Force CPU: the session environment pins JAX_PLATFORMS=axon (a real-TPU
# tunnel with remote compilation) and a sitecustomize pre-imports jax, so the
# env var alone is too late — override the live jax config as well.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
