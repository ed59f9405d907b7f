"""Dims-aware math namespace.

Parity: reference pymc/dims/math.py (re-export of pytensor.xtensor.math +
linalg). In pymc_tpu, named dims live on the MODEL side (coords/dims
metadata on RVs and Deterministics) while compute is plain JAX, so the
dims-first math surface is the same Node-aware `pymc_tpu.math` — dims
propagate through `Deterministic(..., dims=...)` rather than through a
separate labeled-tensor type. This module aliases it so `pm.dims.math.*`
code ports directly.
"""

from ..math import *  # noqa: F401,F403
from ..math import __all__ as _math_all  # noqa: F401
from .. import math as _math


class linalg:
    """pm.dims.math.linalg.* (reference: pytensor.xtensor.linalg)."""

    cholesky = staticmethod(_math.cholesky)
    solve = staticmethod(_math.solve)
    solve_triangular = staticmethod(_math.solve_triangular)
    det = staticmethod(_math.det)
    slogdet = staticmethod(_math.slogdet)
    eigh = staticmethod(_math.eigh)


__all__ = list(_math_all) + ["linalg"]
