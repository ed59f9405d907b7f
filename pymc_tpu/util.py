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


def makeiter(a):
    """Wrap non-list values in a list (reference util.py:makeiter)."""
    return a if isinstance(a, (list, tuple)) else [a]


def get_var_name(var):
    """Name of a model variable or a string (reference util.py)."""
    return getattr(var, "name", str(var))


def chains_and_samples(data):
    """(n_chains, n_samples) from an InferenceData posterior
    (reference util.py:chains_and_samples)."""
    post = data.posterior if hasattr(data, "posterior") else data
    for v in post.values():
        return int(v.values.shape[0]), int(v.values.shape[1])
    raise ValueError("posterior group has no variables")


def drop_warning_stat(idata):
    """Remove the sampler 'warning' stat (reference util.py:
    drop_warning_stat; kept for keep_warning_stat=False parity — our
    sample_stats store no object-dtype warnings, so this only filters the
    key if present)."""
    ss = getattr(idata, "sample_stats", None)
    if ss is not None and "warning" in ss:
        ss._vars.pop("warning", None)
    return idata


def check_dist_not_registered(dist, model=None):
    """Raise if an unnamed .dist() object was already registered in a model
    (reference util.py:check_dist_not_registered)."""
    from .graph import FreeRV, ObservedRV
    from .model.core import Model

    if isinstance(dist, (FreeRV, ObservedRV)):
        raise ValueError(
            f"The distribution {dist} belongs to a model. Pass an unnamed "
            "distribution created with `.dist()` instead."
        )


def get_transformed(rv):
    """The transformed (value-space) name for a free RV (reference
    util.py:get_transformed)."""
    return getattr(rv, "value_name", getattr(rv, "name", rv))


__all__ += [
    "makeiter", "get_var_name", "chains_and_samples", "drop_warning_stat",
    "check_dist_not_registered", "get_transformed",
]
