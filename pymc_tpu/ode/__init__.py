"""ODE integration inside models.

Parity: reference pymc/ode/ode.py (DifferentialEquation: wraps
scipy.odeint/LSODA with a hand-built augmented forward-sensitivity system,
ode.py:128-142, and validates y0/theta lengths with ShapeError,
ode.py:155-163).

TPU-native: `jax.experimental.ode.odeint` (adaptive Dopri5) with the
continuous adjoint for gradients — the whole solve differentiates and jits
on-device; no Fortran callout and no manual sensitivity ODEs. The
``return_sens=True`` surface (reference make_node second output) is served
by forward-mode autodiff THROUGH the solver (jacfwd of the solve w.r.t.
(y0, theta)), which integrates the same augmented system the reference
writes by hand (utils.augment_system).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.ode import odeint

from ..config import floatX
from ..exceptions import ShapeError
from ..graph import apply, is_node

__all__ = ["DifferentialEquation"]


class DifferentialEquation:
    """ODE solution operator usable as a distribution parameter.

    Parameters mirror the reference (ode.py:84-104): func(y, t, p) -> dy/dt;
    times; n_states; n_theta; t0. Calling with (y0, theta) returns a
    (len(times), n_states) node, differentiable w.r.t. both;
    ``return_sens=True`` additionally returns the forward sensitivities
    with shape (len(times), n_states, n_states + n_theta).
    """

    def __init__(self, func, times, *, n_states, n_theta, t0=0.0,
                 rtol=1e-6, atol=1e-6, mxstep=10_000):
        if not callable(func):
            raise ValueError("Argument func must be callable.")
        if int(n_states) < 1:
            raise ValueError("Argument n_states must be at least 1.")
        if int(n_theta) <= 0:
            raise ValueError("Argument n_theta must be positive.")
        self.func = func
        self.times = np.asarray(times, dtype=np.float64)
        self.n_states = int(n_states)
        self.n_theta = int(n_theta)
        self.n_p = self.n_states + self.n_theta
        self.t0 = float(t0)
        self.rtol = rtol
        self.atol = atol
        self.mxstep = mxstep
        if self.times.ndim != 1:
            raise ValueError("times must be 1-D")
        if np.any(np.diff(self.times) <= 0):
            raise ValueError("times must be strictly increasing")
        if self.times[0] < self.t0:
            raise ValueError("times must not precede t0")
        # jax's odeint NaNs on a zero-length first interval, so only prepend
        # t0 when the first observation is strictly after it (times[0] == t0
        # is the common case: the first row of the solution IS y0)
        self._prepend_t0 = bool(self.times[0] > self.t0)
        self._ts = np.concatenate(
            [[self.t0], self.times]
        ) if self._prepend_t0 else self.times

    def _solve(self, y0, theta):
        y0 = jnp.atleast_1d(jnp.asarray(y0, floatX()))
        theta = jnp.atleast_1d(jnp.asarray(theta, floatX()))
        ts = jnp.asarray(self._ts, dtype=floatX())

        def rhs(y, t, p):
            return jnp.atleast_1d(jnp.asarray(self.func(y, t, p), floatX()))

        sol = odeint(rhs, y0, ts, theta, rtol=self.rtol, atol=self.atol,
                     mxstep=self.mxstep)
        return sol[1:] if self._prepend_t0 else sol

    def _sens(self, y0, theta):
        """Forward sensitivities d y(t) / d (y0, theta): (T, S, n_p).

        Reference parity: the second output of DifferentialEquation's Apply
        node (ode.py:144-152). Like the reference's utils.augment_system we
        integrate the augmented system  dS/dt = (df/dy) S + [0 | df/dp]
        with S(0) = [I | 0] — but the per-state Jacobians come from jacfwd
        of the user's rhs instead of hand-derived expressions. (odeint's
        gradient path is a custom_vjp adjoint, so differentiating THROUGH
        the solver in forward mode is not possible; this is the solver-level
        equivalent.)"""
        y0 = jnp.atleast_1d(jnp.asarray(y0, floatX()))
        theta = jnp.atleast_1d(jnp.asarray(theta, floatX()))
        S, P = self.n_states, self.n_theta
        ts = jnp.asarray(self._ts, dtype=floatX())

        def rhs(y, t, p):
            return jnp.atleast_1d(jnp.asarray(self.func(y, t, p), floatX()))

        def aug(state, t, p):
            y, sens = state  # sens: (S, S + P)
            jy = jax.jacfwd(rhs, argnums=0)(y, t, p)  # (S, S)
            jp = jax.jacfwd(rhs, argnums=2)(y, t, p)  # (S, P)
            dsens = jy @ sens + jnp.concatenate(
                [jnp.zeros((S, S), dtype=sens.dtype), jp.reshape(S, P)],
                axis=-1,
            )
            return (rhs(y, t, p), dsens)

        sens0 = jnp.concatenate(
            [jnp.eye(S, dtype=floatX()), jnp.zeros((S, P), dtype=floatX())],
            axis=-1,
        )
        _, sens = odeint(aug, (y0, sens0), ts, theta, rtol=self.rtol,
                         atol=self.atol, mxstep=self.mxstep)
        return sens[1:] if self._prepend_t0 else sens

    def _as_input(self, v, n, what):
        """Validate/pack one of (y0, theta): reference ode.py:155-163 raises
        ShapeError on wrong list lengths. Lists mixing graph nodes and
        constants (the reference's `theta=[gamma, 9.8]` idiom) are packed
        into one stacked node so the model graph sees the dependency."""
        if isinstance(v, (list, tuple)):
            if len(v) != n:
                raise ShapeError(
                    f"Length of {what} is wrong.", actual=(len(v),),
                    expected=(n,),
                )
            if any(is_node(a) for a in v):
                from ..math import stack

                return stack(list(v))
            return np.asarray(v, dtype=np.float64)
        shape = getattr(v, "shape", None)
        if shape is not None and len(shape) >= 1 and int(shape[0]) != n:
            raise ShapeError(
                f"Length of {what} is wrong.", actual=(int(shape[0]),),
                expected=(n,),
            )
        return v

    def __call__(self, y0, theta, return_sens=False):
        y0 = self._as_input(y0, self.n_states, "y0")
        theta = self._as_input(theta, self.n_theta, "theta")
        states = apply(self._solve, y0, theta)
        if return_sens:
            return states, apply(self._sens, y0, theta)
        return states
