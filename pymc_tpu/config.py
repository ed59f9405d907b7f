"""Global configuration for pymc_tpu.

The reference delegates global numeric config to ``pytensor.config`` (floatX,
mode), tuned at import (reference: pymc/__init__.py:28-47). Here the analogue
is a tiny typed config governing default dtypes and jit behavior, designed for
TPU: float32 compute by default (MXU/VPU native), float64 opt-in through
JAX's x64 mode for CPU verification runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["floatX", "intX", "as_floatx", "Config", "config"]


def floatX() -> jnp.dtype:
    """Default float dtype: float64 iff JAX x64 mode is enabled, else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def intX() -> jnp.dtype:
    return jnp.int64 if jax.config.jax_enable_x64 else jnp.int32


def as_floatx(x):
    """Convert array-like to the default float dtype (leaves weak typing alone
    for Python scalars so XLA constants stay fusible)."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.floating):
        return x.astype(floatX()) if x.dtype != floatX() else x
    return x.astype(floatX())


class Config:
    """Mutable global knobs.

    Attributes
    ----------
    check_bounds : bool
        If True (default), distribution logps guard parameter validity and
        return -inf outside the support (reference behavior:
        pymc/distributions/dist_math.py:50 check_parameters). Setting False
        removes the guards for maximum kernel fusion.
    """

    def __init__(self):
        self.check_bounds: bool = True

    def __repr__(self):
        return f"Config(check_bounds={self.check_bounds})"


config = Config()
