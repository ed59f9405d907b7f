"""Drop-in aliases for the reference's JAX bridge API.

Parity: reference pymc/sampling/jax.py (get_jaxified_graph:102,
get_jaxified_logp:116, sample_numpyro_nuts / sample_blackjax_nuts :495).
In pymc_tpu the whole framework IS JAX — "jaxify" is the identity, and the
external-NUTS entry points route to the native on-device sampler.
"""

from __future__ import annotations

import jax

from ..blocking import unravel_vector
from ..model.core import modelcontext
from .mcmc import sample

__all__ = [
    "get_jaxified_logp",
    "get_jaxified_graph",
    "sample_jax_nuts",
    "sample_numpyro_nuts",
    "sample_blackjax_nuts",
]


def get_jaxified_logp(model=None, negative_logp=True):
    """fn(flat_q) -> (+/-) logp, jit-ready (reference jax.py:116)."""
    model = modelcontext(model)
    info = model.raveled_info()
    logp_dict = model.logp_fn()
    sign = -1.0 if negative_logp else 1.0

    def logp(q):
        return sign * logp_dict(unravel_vector(q, info))

    return logp


def get_jaxified_graph(model=None, outputs=None):
    """fn(point_dict) evaluating `outputs` — the framework is already JAX
    (reference jax.py:102 translates PyTensor; here it's the identity)."""
    model = modelcontext(model)
    if outputs is None:
        return model.logp_fn()
    return model.compile_fn(outputs)


def sample_jax_nuts(draws=1000, *, tune=1000, chains=4, model=None, **kwargs):
    """Reference sample_jax_nuts: chains are always 'vectorized' on-device."""
    kwargs.pop("nuts_sampler", None)
    kwargs.pop("chain_method", None)
    kwargs.pop("postprocessing_backend", None)
    return sample(draws=draws, tune=tune, chains=chains, model=model, **kwargs)


sample_numpyro_nuts = sample_jax_nuts
sample_blackjax_nuts = sample_jax_nuts
