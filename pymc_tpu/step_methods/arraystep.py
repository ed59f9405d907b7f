"""Array-step compatibility shims.

Parity: reference pymc/step_methods/arraystep.py (ArrayStep:66,
ArrayStepShared:115, metrop_select:158). In pymc_tpu custom steppers
subclass `compound.BlockedStep` (pure-functional, vmapped over chains);
these shims keep ported code importable and provide the functional
metrop_select.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .compound import BlockedStep

__all__ = ["ArrayStep", "ArrayStepShared", "metrop_select"]


class ArrayStep(BlockedStep):
    """Alias of BlockedStep: implement `init_state` and `step` (operating on
    batched point dicts) instead of the reference's astep(q0)."""


class ArrayStepShared(ArrayStep):
    """Alias (shared-variable machinery is n/a: data lives in the graph)."""


def metrop_select(key, mr, q, q0):
    """Functional Metropolis accept/reject (reference arraystep.py:158):
    accept log-ratio `mr` -> (selected value, accepted?). `key` is an
    explicit JAX PRNG key (the reference draws from a global rng)."""
    mr = jnp.asarray(mr)
    accept = jnp.log(jax.random.uniform(key, mr.shape)) < mr
    sel = jax.tree.map(
        lambda a, b: jnp.where(
            jnp.reshape(accept, accept.shape + (1,) * (jnp.ndim(a) - accept.ndim)),
            a, b,
        ),
        q, q0,
    )
    return sel, accept
