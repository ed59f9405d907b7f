"""Graph-utility compatibility layer.

Parity: reference pymc/pytensorf.py — the PyTensor-facing helpers mapped to
their JAX/Node equivalents. Symbolic-derivative helpers wrap jax transforms;
graph introspection walks the Node DAG; shared-variable machinery is n/a
(data lives in DataNodes; RNG is explicit-key functional).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .config import floatX as _floatX_fn, intX as _intX_fn
from .graph import DataNode, FreeRV, Node, ancestors

__all__ = [
    "gradient", "jacobian", "hessian", "hessian_diag", "inputvars",
    "cont_inputs", "convert_data", "convert_observed_data",
    "join_nonshared_inputs", "intX", "floatX", "CallableTensor",
    "make_shared_replacements", "compile",
]


def floatX(x):
    """Cast to the configured float dtype (reference pytensorf.floatX)."""
    return jnp.asarray(x, dtype=_floatX_fn())


def intX(x):
    return jnp.asarray(x, dtype=_intX_fn())


def gradient(f, wrt=None):
    """grad of a scalar function (reference pytensorf.py:318). Accepts a
    callable; reference accepted symbolic scalars — build those with
    pm.compile instead."""
    return jax.grad(f)


def jacobian(f, wrt=None):
    return jax.jacobian(f)


def hessian(f, wrt=None, negate_output=False):
    h = jax.hessian(f)
    if not negate_output:
        return h
    return lambda *a, **k: -h(*a, **k)


def hessian_diag(f, wrt=None):
    def diag(x):
        return jnp.diagonal(jax.hessian(f)(x))

    return diag


def inputvars(a):
    """Free RVs and data containers a node (or list) depends on
    (reference pytensorf.py inputvars)."""
    nodes = a if isinstance(a, (list, tuple)) else [a]
    return [
        n for n in ancestors(nodes) if isinstance(n, (FreeRV, DataNode))
    ]


def cont_inputs(a):
    return [
        v for v in inputvars(a)
        if isinstance(v, FreeRV) and not v.dist.is_discrete
    ]


def convert_data(data):
    """Canonicalize user data to an array (reference convert_data /
    convert_observed_data: pandas -> values, masked -> nan)."""
    if hasattr(data, "to_numpy"):  # pandas
        data = data.to_numpy()
    if isinstance(data, np.ma.MaskedArray):
        out = np.asarray(data, dtype=float).copy()
        out[data.mask] = np.nan
        return out
    return np.asarray(data)


convert_observed_data = convert_data


def join_nonshared_inputs(point, outputs=None, inputs=None, model=None,
                          **kwargs):
    """The flat-vector parameter space (reference pytensorf.py:444): returns
    (flat_logp_fn, unravel_fn) over the model's unconstrained space — the
    basis every sampler here already uses (blocking.RaveledInfo)."""
    from .blocking import ravel_point, unravel_vector
    from .model.core import modelcontext

    model = modelcontext(model)
    info = model.raveled_info()
    logp_dict = model.logp_fn()

    def flat_logp(q):
        return logp_dict(unravel_vector(q, info))

    def unravel(q):
        return unravel_vector(q, info)

    return flat_logp, unravel


class CallableTensor:
    """Reference pytensorf.CallableTensor: make a graph node callable on a
    replacement input (here: evaluate under an env binding)."""

    def __init__(self, tensor):
        self.tensor = tensor

    def __call__(self, input):
        from .graph import evaluate

        name = getattr(self.tensor, "name", None)
        env = {name: input} if name else {}
        return evaluate(self.tensor, env)


def make_shared_replacements(point, vars, model=None):
    """n/a: there are no shared variables to swap (data is DataNodes, RNG is
    explicit keys). Returns {} so ported call sites no-op."""
    return {}


def compile(*args, **kwargs):
    from .model.core import compile as _compile

    return _compile(*args, **kwargs)
