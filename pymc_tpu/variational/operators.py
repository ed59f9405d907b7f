"""Variational operators.

Parity: reference pymc/variational/operators.py (KL:33, KSD:104) and
opvi.py (Operator:455, ObjectiveFunction:188, TestFunction:558). The TPU
drivers bake the operator into the jitted step (KLqp computes the ELBO,
SVGD the kernelized Stein update); these classes expose the same objects
for code that composes operators explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["Operator", "ObjectiveFunction", "TestFunction", "KL", "KSD",
           "rbf", "Stein"]


class Operator:
    """Base operator over an approximation (reference opvi.py:455)."""

    def __init__(self, approx):
        self.approx = approx

    def apply(self, f=None):
        raise NotImplementedError

    def __call__(self, f=None):
        return ObjectiveFunction(self, f)


class ObjectiveFunction:
    """(operator, test function) pair; __call__(params, key, n_mc) returns
    the stochastic objective value (reference opvi.py:188)."""

    def __init__(self, op, tf=None):
        self.op = op
        self.tf = tf

    def __call__(self, params, key, n_mc=1):
        return self.op.apply_value(params, key, n_mc)


class TestFunction:
    """Kernel/test function for operator VI (reference opvi.py:558)."""

    def __call__(self, X):
        raise NotImplementedError


class rbf(TestFunction):
    """RBF kernel with the median heuristic (reference
    test_functions.py:rbf): returns (K, grad_sum)."""

    def __call__(self, X):
        sq = jnp.sum((X[:, None, :] - X[None, :, :]) ** 2, axis=-1)
        med = jnp.median(sq)
        h = jnp.sqrt(0.5 * med / jnp.log(X.shape[0] + 1.0)) + 1e-6
        K = jnp.exp(-sq / (2.0 * h**2))
        dK = -(X[:, None, :] - X[None, :, :]) / h**2 * K[..., None]
        return K, jnp.sum(dK, axis=0)


class Stein:
    """Stein gradient machinery (reference stein.py:27): phi(particles)
    combines the kernel-weighted score with the repulsion term."""

    def __init__(self, approx_logp_grad, kernel=None):
        self.logp_grad = approx_logp_grad
        self.kernel = kernel or rbf()

    def phi(self, X):
        K, repulse = self.kernel(X)
        grads = jax.vmap(self.logp_grad)(X)
        return (K @ grads + repulse) / X.shape[0]


class KL(Operator):
    """ELBO operator: E_q[logQ - logP] (reference operators.py:33)."""

    def apply_value(self, params, key, n_mc=1):
        approx_cls = type(self.approx)
        z = approx_cls.sample_q(params, key, n_mc)
        from ..blocking import unravel_vector

        info = self.approx.info
        logp_dict = self.approx.model.logp_fn()
        logp = jax.vmap(lambda q: logp_dict(unravel_vector(q, info)))(z)
        return jnp.mean(approx_cls.logq(params, z) - logp)


class KSD(Operator):
    """Kernelized Stein discrepancy operator (reference operators.py:104);
    powers SVGD. apply_value returns the squared phi norm (a diagnostic —
    the SVGD driver consumes phi directly)."""

    def apply_value(self, params, key, n_mc=None):
        from ..blocking import unravel_vector

        X = params["particles"] if isinstance(params, dict) else params
        info = self.approx.info
        logp_dict = self.approx.model.logp_fn()

        def lg(q):
            return logp_dict(unravel_vector(q, info))

        stein = Stein(jax.grad(lg))
        return jnp.mean(stein.phi(X) ** 2)
