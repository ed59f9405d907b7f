"""GP mean functions (reference pymc/gp/mean.py: Zero, Constant, Linear)."""

from __future__ import annotations

import jax.numpy as jnp

from ..config import floatX
from ..graph import apply

__all__ = ["Mean", "Zero", "Constant", "Linear", "Add", "Prod"]


class Mean:
    def __call__(self, X):
        raise NotImplementedError

    def __add__(self, other):
        return _MeanAdd(self, other)

    def __mul__(self, other):
        return _MeanProd(self, other)


class _MeanAdd(Mean):
    def __init__(self, a, b):
        self.a, self.b = a, b

    def __call__(self, X):
        return apply(jnp.add, self.a(X), self.b(X))


class _MeanProd(Mean):
    def __init__(self, a, b):
        self.a, self.b = a, b

    def __call__(self, X):
        return apply(jnp.multiply, self.a(X), self.b(X))


class Zero(Mean):
    def __call__(self, X):
        return apply(
            lambda x: jnp.zeros((jnp.atleast_2d(x).shape[0],), dtype=floatX()), X
        )


class Constant(Mean):
    def __init__(self, c=0.0):
        self.c = c

    def __call__(self, X):
        return apply(
            lambda x, c: jnp.broadcast_to(
                jnp.asarray(c, floatX()), (jnp.atleast_2d(x).shape[0],)
            ),
            X, self.c,
        )


class Linear(Mean):
    def __init__(self, coeffs, intercept=0.0):
        self.coeffs = coeffs
        self.intercept = intercept

    def __call__(self, X):
        return apply(
            lambda x, b, a: jnp.atleast_2d(x) @ jnp.atleast_1d(b) + a,
            X, self.coeffs, self.intercept,
        )


# public aliases matching reference gp/mean.py class names
Add = _MeanAdd
Prod = _MeanProd
