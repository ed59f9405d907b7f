"""Dims-first model API.

Parity: reference pymc/dims/ (experimental xarray-backed API: pm.dims.Normal
with mandatory dims, DimDistribution core:189, Data/Deterministic wrappers,
dims/model.py:31-90).

In pymc_tpu every variable already carries named dims through coords; this
namespace enforces the dims-first contract (dims= required, shapes derived
from coords) and re-exports the wrapped constructors.
"""

from __future__ import annotations

import functools

import pymc_tpu as _pm
from . import math
from ..model.core import Data as _Data
from ..model.core import Deterministic as _Deterministic
from ..model.core import Potential as _Potential
from ..model.core import modelcontext

__all__ = [
    "math",
    "Data", "Deterministic", "Potential",
    # populated dynamically below with dims-first distribution wrappers
]


def _dims_first(dist_cls):
    @functools.wraps(dist_cls.__new__, assigned=("__doc__",))
    def ctor(name, *args, dims=None, **kwargs):
        if dims is None and kwargs.get("observed") is None:
            raise TypeError(
                f"pm.dims.{dist_cls.__name__} requires dims= (dims-first API; "
                "use pm."
                f"{dist_cls.__name__} for shape-based construction)"
            )
        return dist_cls(name, *args, dims=dims, **kwargs)

    ctor.__name__ = dist_cls.__name__
    ctor.dist = dist_cls.dist
    return ctor


_DIST_NAMES = [
    "Normal", "HalfNormal", "LogNormal", "StudentT", "HalfStudentT",
    "Cauchy", "HalfCauchy", "Beta", "Gamma", "InverseGamma", "Exponential",
    "Laplace", "Uniform", "Logistic", "Gumbel", "Weibull", "Flat", "HalfFlat",
    "Bernoulli", "Binomial", "Poisson", "NegativeBinomial", "Categorical",
    "Geometric", "DiscreteUniform", "Dirichlet", "Multinomial", "MvNormal",
    "ZeroSumNormal", "Mixture", "Censored", "Truncated",
]

for _n in _DIST_NAMES:
    if hasattr(_pm, _n):
        globals()[_n] = _dims_first(getattr(_pm, _n))
        __all__.append(_n)


def Data(name, value, *, dims=None, **kwargs):
    if dims is None:
        raise TypeError("pm.dims.Data requires dims=")
    return _Data(name, value, dims=dims, **kwargs)


def Deterministic(name, var, *, dims=None, **kwargs):
    if dims is None:
        raise TypeError("pm.dims.Deterministic requires dims=")
    return _Deterministic(name, var, dims=dims, **kwargs)


def Potential(name, var, **kwargs):
    return _Potential(name, var, **kwargs)
