"""Data containers: pm.Data and pm.Minibatch.

Parity: reference pymc/data.py (Data:222, Minibatch:121 random-slice op) +
pymc/variational/minibatch_rv.py (total_size logp scaling — handled by the
ObservedRV.scale factor in model/core.py).

Minibatch is a functional random slice: the subsample key is threaded through
the evaluation env by the VI step function (key ("__minibatch_key__",)); with
no key present the leading `batch_size` rows are used (deterministic eval).
Several Minibatch views created together share the same slice, as in the
reference.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .config import floatX
from .graph import DeterministicNode, Node
from .model.core import Data, modelcontext, set_data

__all__ = ["Data", "Minibatch", "set_data", "MINIBATCH_KEY"]

MINIBATCH_KEY = ("__minibatch_key__",)


class MinibatchIndexNode(Node):
    """Random subsample indices shared by all views of one Minibatch call."""

    is_minibatch = True

    def __init__(self, n_total, batch_size):
        self.n_total = int(n_total)
        self.batch_size = int(batch_size)
        self.shape = (self.batch_size,)
        self.dtype = jnp.int32
        self.name = None

    def _compute(self, env, memo):
        key = env.get(MINIBATCH_KEY)
        if key is None:
            return jnp.arange(self.batch_size, dtype=jnp.int32)
        return jax.random.randint(
            key, (self.batch_size,), 0, self.n_total, dtype=jnp.int32
        )


def Minibatch(*variables, batch_size):
    """Random-slice views over the leading axis (reference data.py:121).

    Returns one node per input (a tuple if several), all sharing the slice.
    Use with `total_size=` on the observed RV for unbiased logp scaling.
    """
    if not variables:
        raise ValueError("Minibatch requires at least one variable")
    arrays = []
    n_total = None
    for v in variables:
        if isinstance(v, Node):
            arrays.append(v)
            n = v.shape[0]
        else:
            arr = jnp.asarray(v)
            if jnp.issubdtype(arr.dtype, jnp.floating):
                arr = arr.astype(floatX())
            arrays.append(arr)
            n = arr.shape[0]
        if n_total is None:
            n_total = n
        elif n != n_total:
            raise ValueError(
                f"All Minibatch variables need equal leading dim; {n} != {n_total}"
            )
    if batch_size > n_total:
        raise ValueError(f"batch_size {batch_size} exceeds data size {n_total}")
    idx = MinibatchIndexNode(n_total, batch_size)

    model = modelcontext(None) if _in_model() else None
    if model is not None:
        model.data_vars.append(idx)

    outs = []
    for a in arrays:
        node = DeterministicNode(lambda x, i: jnp.take(x, i, axis=0), (a, idx))
        node.is_minibatch = True
        outs.append(node)
    return tuple(outs) if len(outs) > 1 else outs[0]


def _in_model():
    from .model.core import Model

    return Model.get_context(error_if_none=False) is not None


def get_data(filename):
    """Load one of the reference's packaged example datasets
    (reference data.py:get_data reads from pymc/data/*). This framework
    ships no bundled datasets; raises with guidance."""
    raise FileNotFoundError(
        f"pymc_tpu ships no packaged datasets ({filename!r} requested); "
        "load your data with numpy/pandas and pass it to pm.Data/observed"
    )


__all__ += ["get_data"]
