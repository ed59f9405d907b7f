"""Simulator distribution for likelihood-free (ABC) inference.

Parity: reference pymc/distributions/simulator.py:63 (Simulator with distance
functions incl. KullbackLeibler:301 and gaussian/laplace kernels), consumed by
SMC (smc/kernels.py).

The pseudo-likelihood is  -epsilon^-2 * d(sum_stat(sim), sum_stat(obs))^2 / 2
(gaussian kernel) evaluated on a FRESH simulation per logp call; the
simulation key is threaded through the evaluation env (key
("__simulator_key__",)) by pm.sample_smc.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import floatX
from .distribution import Distribution, as_param

__all__ = ["Simulator"]

SIMULATOR_KEY = ("__simulator_key__",)


def _gaussian_kernel(eps, d2):
    return -0.5 * d2 / eps**2 - jnp.log(eps) - 0.5 * jnp.log(2.0 * jnp.pi)


def _laplace_kernel(eps, d):
    return -jnp.abs(d) / eps - jnp.log(2.0 * eps)


def _identity(x):
    return jnp.ravel(jnp.asarray(x, floatX()))


_SUM_STATS = {
    "identity": _identity,
    "mean": lambda x: jnp.mean(jnp.asarray(x, floatX()), keepdims=True),
    "median": lambda x: jnp.median(jnp.asarray(x, floatX())).reshape(1),
    "sort": lambda x: jnp.sort(jnp.ravel(jnp.asarray(x, floatX()))),
}


class Simulator(Distribution):
    """pm.Simulator(name, fn, *params, distance=, sum_stat=, epsilon=,
    observed=data)."""

    param_names = ()

    def __dist_init__(self, fn, *params, distance="gaussian", sum_stat="identity",
                      epsilon=1.0, ndim_supp=None, ndims_params=None):
        self.fn = fn
        self.sim_params = tuple(as_param(p) for p in params)
        self.param_names = tuple(f"_p{i}" for i in range(len(self.sim_params)))
        self.distance = distance if callable(distance) else distance
        self.sum_stat = (
            sum_stat if callable(sum_stat) else _SUM_STATS[sum_stat]
        )
        self.epsilon = float(epsilon)

    def param_values(self):
        return list(self.sim_params)

    def logp(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        params = self.resolve_params(env, memo)
        key = (env or {}).get(SIMULATOR_KEY)
        if key is None:
            key = jax.random.PRNGKey(0)
        sim = jnp.asarray(self.fn(key, *params), floatX())
        s_obs = self.sum_stat(value)
        s_sim = self.sum_stat(sim)
        if callable(self.distance) and not isinstance(self.distance, str):
            return self.distance(self.epsilon, s_obs, s_sim)
        if self.distance == "gaussian":
            d2 = jnp.sum((s_obs - s_sim) ** 2)
            return _gaussian_kernel(self.epsilon, d2)
        if self.distance == "laplace":
            d = jnp.sum(jnp.abs(s_obs - s_sim))
            return _laplace_kernel(self.epsilon, d)
        if self.distance == "kullback_leibler":
            # 1-NN KL estimate (reference KullbackLeibler:301)
            obs = jnp.ravel(s_obs)
            simv = jnp.ravel(s_sim)
            d_mat = jnp.abs(obs[:, None] - simv[None, :])
            nu_d = jnp.min(d_mat, axis=1)
            obs_d = jnp.sort(jnp.abs(obs[:, None] - obs[None, :]), axis=1)[:, 1]
            n, m = obs.shape[0], simv.shape[0]
            kl = jnp.mean(jnp.log(jnp.clip(nu_d / jnp.clip(obs_d, 1e-12, None),
                                           1e-12, None))) + jnp.log(
                m / (n - 1.0)
            )
            return -kl / self.epsilon
        raise ValueError(f"Unknown distance {self.distance}")

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        if memo is None:
            memo = {}
        params = self.resolve_params(env, memo)
        if sample_shape:
            keys = jax.random.split(key, int(np.prod(sample_shape)))
            draws = jax.vmap(lambda k: jnp.asarray(self.fn(k, *params),
                                                   floatX()))(keys)
            return draws.reshape(tuple(sample_shape) + draws.shape[1:])
        return jnp.asarray(self.fn(key, *params), floatX())

    def _resolve_shapes(self):
        # shape from observed (set at registration) or a test simulation
        if self._shape_arg is not None:
            self.batch_shape = tuple(self._shape_arg)
        else:
            out = jax.eval_shape(
                lambda: jnp.asarray(
                    self.fn(jax.random.PRNGKey(0), *[
                        jnp.zeros(getattr(p, "shape", ()) or ())
                        for p in self.sim_params
                    ]),
                    floatX(),
                )
            )
            self.batch_shape = tuple(out.shape)
        self.event_shape = ()

    def support_point(self, env=None, memo=None):
        # mean of 10 simulations at the current params (reference
        # simulator.py:258 simulator_support_point) — a data-scale initial
        # value, deterministic under the fixed key
        draws = self.sample(
            jax.random.PRNGKey(42), (10,), env, memo
        )
        return jnp.mean(draws, axis=0)
