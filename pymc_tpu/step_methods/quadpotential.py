"""Mass-matrix (quadpotential) compatibility API.

Parity: reference pymc/step_methods/hmc/quadpotential.py (QuadPotentialDiag
:486, QuadPotentialDiagAdapt:335, QuadPotentialFull:672,
QuadPotentialFullInv:611, QuadPotentialFullAdapt:722, quad_potential:40,
isquadpotential:76). pymc_tpu's samplers carry the inverse mass as a plain
array ((D,) diag variances or (D, D) covariance) inside the jitted kernel;
these classes wrap that representation with the reference's object API
(velocity / energy / random) for code that manipulates potentials directly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "QuadPotential", "QuadPotentialDiag", "QuadPotentialDiagAdapt",
    "QuadPotentialFull", "QuadPotentialFullInv", "QuadPotentialFullAdapt",
    "QuadPotentialSparse", "quad_potential", "isquadpotential",
]


class QuadPotential:
    """Base: q-space kinetic energy with inverse mass `inv_mass`."""

    def __init__(self, inv_mass):
        self.inv_mass = jnp.asarray(inv_mass)

    def velocity(self, p):
        if self.inv_mass.ndim == 1:
            return self.inv_mass * p
        return self.inv_mass @ p

    def energy(self, p):
        return 0.5 * jnp.sum(p * self.velocity(p))

    def random(self, key):
        """Draw momentum ~ N(0, M) (M = inv(inv_mass))."""
        D = self.inv_mass.shape[-1]
        z = jax.random.normal(key, (D,), dtype=self.inv_mass.dtype)
        if self.inv_mass.ndim == 1:
            return z / jnp.sqrt(self.inv_mass)
        # inv_mass = Sigma = L L^T; momentum covariance is Sigma^-1 = L^-T L^-1
        L = jnp.linalg.cholesky(self.inv_mass)
        from jax.scipy.linalg import solve_triangular

        return solve_triangular(L.T, z, lower=False)


class QuadPotentialDiag(QuadPotential):
    """Fixed diagonal potential: `v` are the diagonal VARIANCES of the
    posterior (i.e. the inverse mass), reference quadpotential.py:486."""

    def __init__(self, v):
        super().__init__(jnp.asarray(v))


class QuadPotentialDiagAdapt(QuadPotentialDiag):
    """Initial state of the adaptive diagonal potential. Adaptation itself
    runs inside the jitted warmup (sampling/adaptation.py Welford windows);
    this records the (mean, var, weight) seed for API compatibility."""

    def __init__(self, n, initial_mean, initial_diag=None, initial_weight=0,
                 **kwargs):
        v = (
            jnp.ones((n,)) if initial_diag is None
            else jnp.asarray(initial_diag)
        )
        super().__init__(v)
        self.initial_mean = jnp.asarray(initial_mean)
        self.initial_weight = initial_weight


class QuadPotentialFull(QuadPotential):
    """Fixed dense potential: `cov` is the posterior covariance estimate
    (inverse mass), reference quadpotential.py:672."""

    def __init__(self, cov):
        super().__init__(jnp.asarray(cov))


class QuadPotentialFullInv(QuadPotential):
    """Dense potential given the MASS matrix itself (reference :611)."""

    def __init__(self, A):
        super().__init__(jnp.linalg.inv(jnp.asarray(A)))


class QuadPotentialFullAdapt(QuadPotentialFull):
    """Initial state of the adaptive dense potential (adaptation runs inside
    the jitted warmup; see pm.sample(mass_matrix='full'))."""

    def __init__(self, n, initial_mean, initial_cov=None, initial_weight=0,
                 **kwargs):
        cov = (
            jnp.eye(n) if initial_cov is None else jnp.asarray(initial_cov)
        )
        super().__init__(cov)
        self.initial_mean = jnp.asarray(initial_mean)
        self.initial_weight = initial_weight


class QuadPotentialSparse(QuadPotential):
    """Sparse mass matrix (reference quadpotential.py:925, gated there on
    sparse support). XLA has no general sparse linear algebra on TPU — the
    matrix is densified at construction; the class exists so code written
    against the reference's sparse API keeps working unchanged."""

    def __init__(self, A):
        try:  # scipy.sparse matrix
            A = A.toarray()
        except AttributeError:
            pass
        super().__init__(jnp.linalg.inv(jnp.asarray(A)))


def quad_potential(C, is_cov):
    """Reference quadpotential.py:40 factory: C 1-D or 2-D; is_cov selects
    whether C is the covariance (inverse mass) or the mass."""
    C = jnp.asarray(C)
    if C.ndim == 1:
        return QuadPotentialDiag(C if is_cov else 1.0 / C)
    return QuadPotentialFull(C) if is_cov else QuadPotentialFullInv(C)


def isquadpotential(obj):
    return isinstance(obj, QuadPotential)
