"""Test configuration.

Forces the CPU backend with 8 virtual devices (the standard JAX trick for
exercising mesh/shard_map paths without a TPU pod — SURVEY.md §4) and x64 for
scipy-tolerance contract checks. Must run before any jax backend init.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """XLA:CPU's JIT segfaults inside backend_compile once enough compiled
    programs accumulate in one process (reproduced: full suite crashes in
    whichever pm.sample compile lands ~1400 jits in; the same test passes
    in a short run). Dropping compiled-executable caches at module
    boundaries keeps the live LLVM state bounded."""
    jax.clear_caches()
    yield
