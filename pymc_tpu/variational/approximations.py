"""Variational approximation families.

Parity: reference pymc/variational/approximations.py (MeanFieldGroup:41
(mu, rho -> softplus sigma), FullRankGroup:118 (packed L),
EmpiricalGroup:191 particle histogram; wrappers MeanField:354, FullRank:361,
Empirical:368) and opvi.py:1237 (Approximation sampling machinery).

TPU-native: every family is a pytree of parameters over the model's flat
unconstrained space; sampling/logq/entropy are pure JAX. `sample()` returns
InferenceData through the same postprocess path as MCMC.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..blocking import unravel_vector
from ..config import floatX

__all__ = ["Approximation", "MeanField", "FullRank", "Empirical"]

_LOG_2PI = 1.8378770664093453


class Approximation:
    """Base: fitted posterior approximation over the flat space."""

    def __init__(self, model, info, params):
        self.model = model
        self.info = info
        self.params = params
        self.hist = np.asarray([])

    # subclass API ---------------------------------------------------------
    @classmethod
    def init_params(cls, D, start=None, start_sigma=None):
        raise NotImplementedError

    @staticmethod
    def sample_q(params, key, n):
        """(n, D) draws from q."""
        raise NotImplementedError

    @staticmethod
    def entropy(params):
        raise NotImplementedError

    @staticmethod
    def logq(params, z):
        raise NotImplementedError

    # common ----------------------------------------------------------------
    @property
    def ndim(self):
        return self.info.total_size

    def mean_dict(self):
        mu = self._mean_flat()
        return unravel_vector(mu, self.info)

    def sample(self, draws=1000, random_seed=None, return_inferencedata=True,
               **kwargs):
        """Draw from the approximation -> InferenceData (reference
        Approximation.sample)."""
        from ..sampling.mcmc import _make_postprocess_fn, _resolve_seed
        from ..backends.arviz import to_inference_data

        key = _resolve_seed(random_seed)
        z = self.sample_q(self.params, key, draws)  # (draws, D)
        post_fn = jax.jit(jax.vmap(_make_postprocess_fn(self.model, self.info)))
        out = post_fn(z)
        posterior = {
            k: np.asarray(jax.device_get(v))[None]
            for k, v in out.items()
        }
        if not return_inferencedata:
            return posterior
        return to_inference_data(self.model, posterior=posterior)

    def sample_dict_fn(self, draws=1):
        def fn(key):
            z = self.sample_q(self.params, key, draws)
            return jax.vmap(lambda q: unravel_vector(q, self.info))(z)

        return fn


class MeanField(Approximation):
    """Diagonal Gaussian over the unconstrained space
    (reference MeanFieldGroup:41)."""

    name = "mean_field"

    @classmethod
    def init_params(cls, D, start=None, start_sigma=None):
        mu = jnp.zeros((D,), floatX()) if start is None else jnp.asarray(start, floatX())
        sigma0 = 0.1 if start_sigma is None else start_sigma
        rho = jnp.full((D,), _softplus_inv(sigma0), floatX())
        if start_sigma is not None and not np.isscalar(start_sigma):
            rho = _softplus_inv(jnp.asarray(start_sigma, floatX()))
        return {"mu": mu, "rho": rho}

    @staticmethod
    def sample_q(params, key, n):
        D = params["mu"].shape[0]
        eps = jax.random.normal(key, (n, D), dtype=floatX())
        sigma = jax.nn.softplus(params["rho"])
        return params["mu"] + sigma * eps

    @staticmethod
    def entropy(params):
        sigma = jax.nn.softplus(params["rho"])
        D = sigma.shape[0]
        return jnp.sum(jnp.log(sigma)) + 0.5 * D * (1.0 + _LOG_2PI)

    @staticmethod
    def logq(params, z):
        sigma = jax.nn.softplus(params["rho"])
        return jnp.sum(
            -0.5 * ((z - params["mu"]) / sigma) ** 2
            - jnp.log(sigma) - 0.5 * _LOG_2PI,
            axis=-1,
        )

    def _mean_flat(self):
        return self.params["mu"]

    @property
    def mean(self):
        return unravel_vector(self.params["mu"], self.info)

    @property
    def std(self):
        return unravel_vector(jax.nn.softplus(self.params["rho"]), self.info)


class FullRank(Approximation):
    """Full-covariance Gaussian: L packed lower-triangular with softplus diag
    (reference FullRankGroup:118)."""

    name = "full_rank"

    @classmethod
    def init_params(cls, D, start=None, start_sigma=None):
        mu = jnp.zeros((D,), floatX()) if start is None else jnp.asarray(start, floatX())
        rows, cols = np.tril_indices(D)
        packed = jnp.zeros((D * (D + 1) // 2,), floatX())
        diag_idx = np.cumsum(np.arange(1, D + 1)) - 1
        packed = packed.at[diag_idx].set(_softplus_inv(0.1))
        return {"mu": mu, "L_packed": packed}

    @staticmethod
    def _chol(params):
        D = params["mu"].shape[0]
        rows, cols = np.tril_indices(D)
        L = jnp.zeros((D, D), floatX()).at[rows, cols].set(params["L_packed"])
        diag = jax.nn.softplus(jnp.diagonal(L))
        return L - jnp.diagonal(L) * jnp.eye(D, dtype=floatX()) + jnp.eye(
            D, dtype=floatX()
        ) * diag

    @staticmethod
    def sample_q(params, key, n):
        D = params["mu"].shape[0]
        L = FullRank._chol(params)
        eps = jax.random.normal(key, (n, D), dtype=floatX())
        return params["mu"] + eps @ L.T

    @staticmethod
    def entropy(params):
        L = FullRank._chol(params)
        D = L.shape[0]
        return jnp.sum(jnp.log(jnp.diagonal(L))) + 0.5 * D * (1.0 + _LOG_2PI)

    @staticmethod
    def logq(params, z):
        from jax.scipy.linalg import solve_triangular

        L = FullRank._chol(params)
        D = L.shape[0]
        diff = z - params["mu"]
        w = solve_triangular(L, diff.T, lower=True).T
        return (
            -0.5 * jnp.sum(w**2, axis=-1)
            - jnp.sum(jnp.log(jnp.diagonal(L)))
            - 0.5 * D * _LOG_2PI
        )

    def _mean_flat(self):
        return self.params["mu"]

    @property
    def mean(self):
        return unravel_vector(self.params["mu"], self.info)

    @property
    def cov(self):
        L = self._chol(self.params)
        return L @ L.T


class Empirical(Approximation):
    """Particle histogram (reference EmpiricalGroup:191; the SVGD family)."""

    name = "empirical"

    @classmethod
    def init_params(cls, D, start=None, start_sigma=None, n_particles=100,
                    key=None, jitter=1.0):
        if start is None:
            start = jnp.zeros((D,), floatX())
        key = key if key is not None else jax.random.PRNGKey(0)
        noise = jitter * jax.random.normal(key, (n_particles, D), dtype=floatX())
        return {"particles": jnp.asarray(start, floatX()) + noise}

    @staticmethod
    def sample_q(params, key, n):
        P = params["particles"].shape[0]
        idx = jax.random.randint(key, (n,), 0, P)
        return params["particles"][idx]

    @staticmethod
    def entropy(params):
        return jnp.zeros((), floatX())

    @staticmethod
    def logq(params, z):
        raise NotImplementedError("Empirical approximation has no density")

    def _mean_flat(self):
        return jnp.mean(self.params["particles"], axis=0)

    @property
    def mean(self):
        return unravel_vector(self._mean_flat(), self.info)


def _softplus_inv(x):
    return float(np.log(np.expm1(x))) if np.isscalar(x) else jnp.log(
        jnp.expm1(x)
    )
