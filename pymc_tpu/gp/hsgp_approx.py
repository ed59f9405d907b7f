"""Hilbert-space GP approximation.

Parity: reference pymc/gp/hsgp_approx.py (HSGP, HSGPPeriodic,
prior_linearized). Solin & Särkkä (2020) basis: on the box [-L, L]^d the
Laplacian eigenfunctions are products of sines; the GP is f ≈ phi(x) @ (beta *
sqrt(S(sqrt(lambda)))), turning the O(n^3) GP into one (n, m) matmul — pure
MXU work, the TPU-native form of config #4.
"""

from __future__ import annotations

import itertools

import numpy as np
import jax
import jax.numpy as jnp

from ..config import floatX
from ..graph import apply, is_node
from . import mean as gp_mean
from .gp import Base

__all__ = ["HSGP", "HSGPPeriodic", "set_boundary", "approx_hsgp_hyperparams"]


def set_boundary(X, c):
    """Half-widths L = c * max|X - center| per dim (reference
    hsgp_approx.py set_boundary)."""
    X = np.asarray(X)
    if X.ndim == 1:
        X = X[:, None]
    center = (X.max(0) + X.min(0)) / 2
    return np.asarray(c) * np.max(np.abs(X - center), axis=0), center


def approx_hsgp_hyperparams(x_range, lengthscale_range, cov_func="expquad"):
    """Heuristic (m, c) recommendation (reference
    hsgp_approx.py approx_hsgp_hyperparams)."""
    S = (x_range[1] - x_range[0]) / 2
    ell = np.asarray(lengthscale_range) / S
    if cov_func.lower() in ("expquad", "se"):
        c = max(3.2 * ell[0] ** -0.5 * 0 + 1.75 * ell[1], 1.2)
        m = int(np.ceil(1.75 * c / ell[0]))
    elif "52" in cov_func:
        c = max(4.1 * ell[1], 1.2)
        m = int(np.ceil(2.65 * c / ell[0]))
    else:
        c = max(4.5 * ell[1], 1.2)
        m = int(np.ceil(3.42 * c / ell[0]))
    return m, c


def _eigendata(L, m_list):
    """Eigenvalue square roots (M, D) and index grid for the product basis."""
    D = len(m_list)
    grids = list(itertools.product(*[range(1, m + 1) for m in m_list]))
    J = np.asarray(grids, dtype=np.float64)  # (M, D)
    sqrt_eig = J * np.pi / (2.0 * np.asarray(L))  # (M, D)
    return jnp.asarray(sqrt_eig, dtype=floatX())


def _phi(Xc, L, sqrt_eig):
    """(n, M) basis matrix: prod_d L_d^{-1/2} sin(sqrt_eig_d (x_d + L_d))."""
    L = jnp.asarray(L, floatX())
    Xs = jnp.atleast_2d(Xc) + L  # shift to [0, 2L]
    args = Xs[:, None, :] * sqrt_eig[None, :, :]  # (n, M, D)
    return jnp.prod(
        jnp.sin(args) / jnp.sqrt(L), axis=-1
    )


class HSGP(Base):
    """Reference hsgp_approx.py HSGP."""

    def __init__(self, m, c=None, L=None, drop_first=False,
                 parametrization="noncentered", mean_func=None, cov_func=None):
        if isinstance(m, int):
            m = [m]
        self.m = list(m)
        if L is None and c is None:
            raise ValueError("Provide L or c")
        self.c = c
        self.L = L
        self.drop_first = drop_first
        self.parametrization = parametrization
        super().__init__(mean_func, cov_func)
        self._beta = None

    def prior_linearized(self, X):
        """(phi, sqrt_psd): f = mean + phi @ (beta * sqrt_psd)
        (reference HSGP.prior_linearized)."""
        Xarr = np.asarray(jax.device_get(X)) if not is_node(X) else None
        if self.L is None:
            L, center = set_boundary(Xarr, self.c)
            self._L, self._center = L, center
        else:
            self._L = np.atleast_1d(np.asarray(self.L))
            self._center = np.zeros(len(self._L))
        sqrt_eig = _eigendata(self._L, self.m)  # (M, D)
        center = jnp.asarray(self._center, floatX())
        phi = apply(
            lambda x: _phi(jnp.atleast_2d(jnp.asarray(x, floatX())) - center,
                           self._L, sqrt_eig),
            X,
        )
        psd = self.cov_func.power_spectral_density(sqrt_eig)
        sqrt_psd = apply(lambda s: jnp.sqrt(jnp.clip(s, 1e-30, None)), psd)
        if self.drop_first:
            phi = apply(lambda p: p[:, 1:], phi)
            sqrt_psd = apply(lambda s: s[1:], sqrt_psd)
        self._sqrt_eig = sqrt_eig
        return phi, sqrt_psd

    @property
    def n_basis(self):
        M = int(np.prod(self.m))
        return M - 1 if self.drop_first else M

    def prior(self, name, X, dims=None, **kwargs):
        import pymc_tpu as pm
        from ..model.core import Deterministic

        phi, sqrt_psd = self.prior_linearized(X)
        M = self.n_basis
        if self.parametrization == "noncentered":
            beta = pm.Normal(f"{name}_hsgp_coeffs_", 0.0, 1.0, shape=(M,))
            f = apply(
                lambda p, s, b: p @ (s * b), phi, sqrt_psd, beta
            )
        else:
            beta = pm.Normal(f"{name}_hsgp_coeffs_", 0.0, sqrt_psd, shape=(M,))
            f = apply(lambda p, b: p @ b, phi, beta)
        mean = self.mean_func(X)
        f = Deterministic(name, apply(jnp.add, mean, f), dims=dims)
        self._beta = beta
        self.X = X
        self.f = f
        return f

    def conditional(self, name, Xnew, dims=None):
        import pymc_tpu as pm
        from ..model.core import Deterministic

        center = jnp.asarray(self._center, floatX())
        phi_new = apply(
            lambda x: _phi(
                jnp.atleast_2d(jnp.asarray(x, floatX())) - center,
                self._L, self._sqrt_eig,
            ),
            Xnew,
        )
        psd = self.cov_func.power_spectral_density(self._sqrt_eig)
        sqrt_psd = apply(lambda s: jnp.sqrt(jnp.clip(s, 1e-30, None)), psd)
        if self.drop_first:
            phi_new = apply(lambda p: p[:, 1:], phi_new)
            sqrt_psd = apply(lambda s: s[1:], sqrt_psd)
        if self.parametrization == "noncentered":
            f = apply(
                lambda p, s, b: p @ (s * b), phi_new, sqrt_psd, self._beta
            )
        else:
            f = apply(lambda p, b: p @ b, phi_new, self._beta)
        mean = self.mean_func(Xnew)
        return Deterministic(name, apply(jnp.add, mean, f), dims=dims)


class HSGPPeriodic(Base):
    """Periodic-kernel HSGP via the cosine/sine expansion (reference
    hsgp_approx.py HSGPPeriodic)."""

    def __init__(self, m, scale=1.0, mean_func=None, cov_func=None):
        from .cov import Periodic

        if not isinstance(cov_func, Periodic):
            raise ValueError("HSGPPeriodic requires a Periodic covariance")
        self.m = int(m)
        self.scale = scale
        super().__init__(mean_func, cov_func)

    def prior_linearized(self, X):
        J = self.m
        coeffs = self.cov_func.power_spectral_density_approx(J)  # (J,)
        w0 = apply(
            lambda p: 2.0 * jnp.pi / jnp.asarray(p, floatX()),
            self.cov_func.period,
        )
        js = jnp.arange(J, dtype=floatX())

        def basis(x, w0v):
            x1 = jnp.ravel(jnp.asarray(x, floatX()))
            ang = x1[:, None] * w0v * js[None, :]
            return jnp.cos(ang), jnp.sin(ang)

        phi_cos = apply(lambda x, w: basis(x, w)[0], X, w0)
        phi_sin = apply(lambda x, w: basis(x, w)[1], X, w0)
        sqrt_psd = apply(
            lambda c, s: jnp.asarray(s, floatX()) * jnp.sqrt(
                jnp.clip(c, 1e-30, None)
            ),
            coeffs, self.scale,
        )
        return (phi_cos, phi_sin), sqrt_psd

    def prior(self, name, X, dims=None):
        import pymc_tpu as pm
        from ..model.core import Deterministic

        (phi_cos, phi_sin), sqrt_psd = self.prior_linearized(X)
        J = self.m
        beta_cos = pm.Normal(f"{name}_hsgp_cos_", 0.0, 1.0, shape=(J,))
        beta_sin = pm.Normal(f"{name}_hsgp_sin_", 0.0, 1.0, shape=(J,))
        f = apply(
            lambda pc, ps, s, bc, bs: pc @ (s * bc) + ps @ (s * bs),
            phi_cos, phi_sin, sqrt_psd, beta_cos, beta_sin,
        )
        self._beta = (beta_cos, beta_sin)
        mean = self.mean_func(X)
        return Deterministic(name, apply(jnp.add, mean, f), dims=dims)

    def conditional(self, name, Xnew, dims=None):
        from ..model.core import Deterministic

        (phi_cos, phi_sin), sqrt_psd = self.prior_linearized(Xnew)
        beta_cos, beta_sin = self._beta
        f = apply(
            lambda pc, ps, s, bc, bs: pc @ (s * bc) + ps @ (s * bs),
            phi_cos, phi_sin, sqrt_psd, beta_cos, beta_sin,
        )
        mean = self.mean_func(Xnew)
        return Deterministic(name, apply(jnp.add, mean, f), dims=dims)
