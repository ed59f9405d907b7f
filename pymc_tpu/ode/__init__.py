"""ODE integration inside models.

Parity: reference pymc/ode/ode.py (DifferentialEquation: wraps
scipy.odeint/LSODA with hand-built forward sensitivities, ode.py:128-142).

TPU-native: `jax.experimental.ode.odeint` (adaptive Dopri5) with the
continuous adjoint for gradients — the whole solve differentiates and jits
on-device; no Fortran callout, no manual sensitivity system.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.ode import odeint

from ..config import floatX
from ..graph import apply

__all__ = ["DifferentialEquation"]


class DifferentialEquation:
    """ODE solution operator usable as a distribution parameter.

    Parameters mirror the reference: func(y, t, p) -> dy/dt; times; n_states;
    n_theta; t0. Calling with (y0, theta) returns a (len(times), n_states)
    node, differentiable w.r.t. both.
    """

    def __init__(self, func, times, *, n_states, n_theta, t0=0.0,
                 rtol=1e-6, atol=1e-6, mxstep=10_000):
        self.func = func
        self.times = np.asarray(times, dtype=np.float64)
        self.n_states = int(n_states)
        self.n_theta = int(n_theta)
        self.t0 = float(t0)
        self.rtol = rtol
        self.atol = atol
        self.mxstep = mxstep
        if self.times.ndim != 1:
            raise ValueError("times must be 1-D")

    def _solve(self, y0, theta):
        y0 = jnp.atleast_1d(jnp.asarray(y0, floatX()))
        theta = jnp.atleast_1d(jnp.asarray(theta, floatX()))
        ts = jnp.asarray(
            np.concatenate([[self.t0], self.times]), dtype=floatX()
        )

        def rhs(y, t, p):
            return jnp.atleast_1d(jnp.asarray(self.func(y, t, p), floatX()))

        sol = odeint(rhs, y0, ts, theta, rtol=self.rtol, atol=self.atol,
                     mxstep=self.mxstep)
        return sol[1:]

    def __call__(self, y0, theta):
        return apply(self._solve, y0, theta)
