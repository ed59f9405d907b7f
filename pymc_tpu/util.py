"""Utilities (reference pymc/util.py).

treedict/treelist (:63,111) are replaced by root-shared registries in
model/core.py (nested sub-models write through to the root); the RNG helpers
map numpy Generators onto JAX PRNG keys.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "get_transformed_name",
    "is_transformed_name",
    "get_untransformed_name",
    "get_default_varnames",
    "get_random_generator",
    "RandomGeneratorState",
    "random_generator_to_key",
    "hashable",
]


def get_transformed_name(name, transform):
    """Reference util.py:138: '<name>_<transform>__'."""
    return f"{name}_{transform.name}__"


def is_transformed_name(name):
    return name.endswith("__") and "_" in name[:-2]


def get_untransformed_name(name):
    if not is_transformed_name(name):
        raise ValueError(f"{name} does not appear to be a transformed name")
    return "_".join(name[:-2].split("_")[:-1])


def get_default_varnames(var_iterator, include_transformed):
    if include_transformed:
        return list(var_iterator)
    return [v for v in var_iterator if not is_transformed_name(str(v))]


class RandomGeneratorState:
    """Serializable RNG state (reference util.py:522-560): captures either a
    numpy bit-generator state or a JAX key for cross-process transfer."""

    def __init__(self, state):
        self.state = state

    @classmethod
    def from_generator(cls, rng):
        if isinstance(rng, np.random.Generator):
            return cls(("numpy", rng.bit_generator.state))
        arr = np.asarray(jax.device_get(rng))
        return cls(("jax", arr.tolist()))

    def restore(self):
        kind, payload = self.state
        if kind == "numpy":
            rng = np.random.default_rng()
            rng.bit_generator.state = payload
            return rng
        return jnp.asarray(payload, dtype=jnp.uint32)


def get_random_generator(seed=None):
    """numpy Generator resolution (reference util.py:522)."""
    if isinstance(seed, np.random.Generator):
        return seed
    return np.random.default_rng(seed)


def random_generator_to_key(rng):
    """Map a numpy Generator / seed / key to a JAX PRNG key."""
    if isinstance(rng, jax.Array) and rng.dtype == jnp.uint32:
        return rng
    if isinstance(rng, np.random.Generator):
        return jax.random.PRNGKey(int(rng.integers(2**31)))
    return jax.random.PRNGKey(0 if rng is None else int(rng))


def hashable(a):
    try:
        hash(a)
        return a
    except TypeError:
        return str(a)
