"""GP model classes.

Parity: reference pymc/gp/gp.py (Latent, Marginal, MarginalApprox
(FITC/VFE/DTC), LatentKron, MarginalKron, TP). Dense linear algebra
(Cholesky, triangular solves) is the MXU path — BASELINE config #4.

The reference builds conditionals through stored `givens`; here each GP
object stores (X, f/y, sigma) at prior/marginal_likelihood time and
`conditional` registers the closed-form predictive MvNormal.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import floatX
from ..ops.linalg import cholesky_batched
from ..graph import apply, is_node
from . import cov as gp_cov
from . import mean as gp_mean

__all__ = ["Latent", "Marginal", "MarginalApprox", "TP", "LatentKron",
           "MarginalKron"]

_JITTER = 1e-6


def _stabilize(K, jitter=None):
    """Diagonal jitter for Cholesky safety (reference gp/util.py:77).

    Default is dtype-aware: the reference's 1e-6 assumes float64; in
    float32 (the TPU default) kernel matrices with near-duplicate inputs
    are indefinite at that level. The f32 default further scales with the
    kernel amplitude — an absolute 1e-4 is lost on K with diag = eta^2 >> 1
    (f32 Cholesky needs condition <~1e6, and the condition is
    ~n*mean(diag)/jitter), which made jittered-init latent GPs NaN for
    moderate (ls, eta) draws."""

    def _f(k):
        j = _resolve_jitter(jitter, k.dtype)
        if jitter is None and k.dtype != jnp.float64:
            diag_mean = jnp.mean(jnp.diagonal(k, axis1=-2, axis2=-1))
            j = jnp.maximum(j, 3e-4 * diag_mean)
        return k + j * jnp.eye(k.shape[-1], dtype=k.dtype)

    return apply(_f, K)


def _resolve_jitter(jitter, dtype):
    if jitter is not None:
        return jitter
    return _JITTER if dtype == jnp.float64 else 1e-4


class Base:
    def __init__(self, mean_func=None, cov_func=None):
        self.mean_func = mean_func if mean_func is not None else gp_mean.Zero()
        if cov_func is None:
            raise ValueError("A covariance function is required")
        self.cov_func = cov_func

    def __add__(self, other):
        if type(self) is not type(other):
            raise TypeError("Cannot add different GP types")
        return type(self)(
            mean_func=self.mean_func + other.mean_func,
            cov_func=self.cov_func + other.cov_func,
        )


class Latent(Base):
    """Latent (noise-free) GP prior (reference gp.py Latent)."""

    def __init__(self, mean_func=None, cov_func=None):
        super().__init__(mean_func, cov_func)
        self.X = None
        self.f = None

    def prior(self, name, X, reparameterize=True, jitter=None, **kwargs):
        import pymc_tpu as pm

        X = jnp.asarray(X) if not is_node(X) else X
        n = X.shape[0]
        mu = self.mean_func(X)
        K = _stabilize(self.cov_func(X), jitter)
        chol = apply(cholesky_batched, K)
        if reparameterize:
            v = pm.Normal(f"{name}_rotated_", 0.0, 1.0, shape=(n,), **kwargs)
            from ..model.core import Deterministic

            f = Deterministic(
                name, apply(lambda m, L, vv: m + L @ vv, mu, chol, v)
            )
        else:
            f = pm.MvNormal(name, mu=mu, chol=chol, **kwargs)
        self.X, self.f, self._jitter = X, f, jitter
        return f

    def _get_given_vals(self, given):
        """Resolve the conditioning set (reference gp.py:201-214): `given`
        may name the ADDITIVE total gp plus its (X, f) so a component gp can
        be conditioned on the sum's data."""
        if given is None:
            given = {}
        if "gp" in given:
            cov_total = given["gp"].cov_func
            mean_total = given["gp"].mean_func
        else:
            cov_total = self.cov_func
            mean_total = self.mean_func
        if all(val in given for val in ("X", "f")):
            X, f = given["X"], given["f"]
        else:
            X, f = self.X, self.f
        return X, f, cov_total, mean_total

    def _build_conditional(self, Xnew, jitter, X, f, cov_total, mean_total):
        # Kxx/residual use the TOTAL process; the cross/new covariances use
        # THIS component's kernel (reference gp.py:216-229)
        Kxx = _stabilize(cov_total(X), jitter)
        Kxs = self.cov_func(X, Xnew)
        Kss = self.cov_func(Xnew)
        mu_x = mean_total(X)
        mu_s = self.mean_func(Xnew)

        def cond(kxx, kxs, kss, mx, ms, fv):
            L = cholesky_batched(kxx)
            from jax.scipy.linalg import solve_triangular

            A = solve_triangular(L, kxs, lower=True)          # (n, m)
            v = solve_triangular(L, fv - mx, lower=True)      # (n,)
            mu = ms + A.T @ v
            cov = kss - A.T @ A
            return mu, cov + _JITTER * jnp.eye(cov.shape[0], dtype=cov.dtype)

        mu = apply(lambda *a: cond(*a)[0], Kxx, Kxs, Kss, mu_x, mu_s, f)
        cov = apply(lambda *a: cond(*a)[1], Kxx, Kxs, Kss, mu_x, mu_s, f)
        return mu, cov

    def conditional(self, name, Xnew, given=None, jitter=None, **kwargs):
        import pymc_tpu as pm

        Xnew = jnp.asarray(Xnew) if not is_node(Xnew) else Xnew
        givens = self._get_given_vals(given)
        mu, cov = self._build_conditional(Xnew, jitter, *givens)
        return pm.MvNormal(name, mu=mu, cov=cov, **kwargs)


class TP(Latent):
    """Student-t process (reference gp.py TP)."""

    def __init__(self, mean_func=None, scale_func=None, cov_func=None, nu=None):
        if nu is None:
            raise ValueError(
                "Student's T process requires a degrees of freedom parameter, 'nu'"
            )
        super().__init__(mean_func, scale_func if scale_func is not None else cov_func)
        self.nu = nu

    def __add__(self, other):
        # reference gp.py:316-318
        raise TypeError("Student's T processes aren't additive")

    def conditional(self, name, Xnew, jitter=None, **kwargs):
        """TP conditional: dof grows by n and the covariance carries the
        Mahalanobis-beta correction (reference gp.py:360-380)."""
        import pymc_tpu as pm

        Xnew = jnp.asarray(Xnew) if not is_node(Xnew) else Xnew
        X, f = self.X, self.f
        Kxx = _stabilize(self.cov_func(X), jitter)
        Kxs = self.cov_func(X, Xnew)
        Kss = self.cov_func(Xnew)
        mu_x = self.mean_func(X)
        mu_s = self.mean_func(Xnew)

        def cond(kxx, kxs, kss, mx, ms, fv, nu):
            from jax.scipy.linalg import solve_triangular

            L = cholesky_batched(kxx)
            A = solve_triangular(L, kxs, lower=True)
            v = solve_triangular(L, fv - mx, lower=True)
            mu = ms + A.T @ v
            beta = jnp.sum(v**2)
            n = kxx.shape[0]
            nu_new = nu + n
            cov = kss - A.T @ A
            cov = ((nu + beta - 2.0) / (nu_new - 2.0)) * cov
            return mu, cov + _JITTER * jnp.eye(cov.shape[0], dtype=cov.dtype), nu_new

        args = (Kxx, Kxs, Kss, mu_x, mu_s, f, self.nu)
        mu = apply(lambda *a: cond(*a)[0], *args)
        cov = apply(lambda *a: cond(*a)[1], *args)
        nu_new = apply(lambda *a: cond(*a)[2], *args)
        return pm.MvStudentT(name, nu=nu_new, mu=mu, cov=cov, **kwargs)

    def prior(self, name, X, reparameterize=True, jitter=None, **kwargs):
        import pymc_tpu as pm

        X = jnp.asarray(X) if not is_node(X) else X
        n = X.shape[0]
        mu = self.mean_func(X)
        K = _stabilize(self.cov_func(X), jitter)
        chol = apply(cholesky_batched, K)
        if reparameterize:
            chi2 = pm.ChiSquared(f"{name}_chi2_", self.nu)
            v = pm.Normal(f"{name}_rotated_", 0.0, 1.0, shape=(n,), **kwargs)
            from ..model.core import Deterministic

            f = Deterministic(
                name,
                apply(
                    lambda m, L, vv, c2, nu: m + jnp.sqrt(nu / c2) * (L @ vv),
                    mu, chol, v, chi2, self.nu,
                ),
            )
        else:
            f = pm.MvStudentT(name, nu=self.nu, mu=mu, chol=chol, **kwargs)
        self.X, self.f, self._jitter = X, f, jitter
        return f


class Marginal(Base):
    """GP with Gaussian observation noise marginalized analytically
    (reference gp.py Marginal)."""

    def __init__(self, mean_func=None, cov_func=None):
        super().__init__(mean_func, cov_func)
        self.X = None
        self.y = None
        self.sigma = None

    @staticmethod
    def _as_noise_func(sigma):
        """A scalar sigma becomes WhiteNoise(sigma); a Covariance is used
        directly as the noise kernel (reference gp.py:522-527)."""
        from . import cov as gp_cov

        if isinstance(sigma, gp_cov.Covariance):
            return sigma
        return gp_cov.WhiteNoise(sigma)

    def marginal_likelihood(self, name, X, y, sigma=None, noise=None,
                            jitter=None, is_observed=True, **kwargs):
        import pymc_tpu as pm

        if sigma is None:
            sigma = noise
        if sigma is None:
            raise ValueError("Marginal requires sigma (noise level)")
        X = jnp.asarray(X) if not is_node(X) else X
        noise_func = self._as_noise_func(sigma)
        mu = self.mean_func(X)
        K = self.cov_func(X)
        Knx = noise_func(X)
        cov = apply(
            lambda k, kn: k + kn + _JITTER * jnp.eye(k.shape[-1], dtype=k.dtype),
            K, Knx,
        )
        self.X, self.y, self.sigma, self._jitter = X, y, noise_func, jitter
        return pm.MvNormal(name, mu=mu, cov=cov, observed=y, **kwargs)

    def _get_given_vals(self, given):
        """Reference gp.py:512-528: `given` may carry the additive total gp
        and its (X, y, sigma)."""
        if given is None:
            given = {}
        if "gp" in given:
            cov_total = given["gp"].cov_func
            mean_total = given["gp"].mean_func
        else:
            cov_total = self.cov_func
            mean_total = self.mean_func
        if all(val in given for val in ("X", "y", "sigma")):
            X, y = given["X"], given["y"]
            noise_func = self._as_noise_func(given["sigma"])
        else:
            X, y, noise_func = self.X, self.y, self.sigma
        return X, y, noise_func, cov_total, mean_total

    def _build_conditional(self, Xnew, pred_noise, diag, jitter,
                           X, y, noise_func, cov_total, mean_total):
        Kxx = cov_total(X)
        Knx = noise_func(X)
        Kxs = self.cov_func(X, Xnew)
        mu_x = mean_total(X)
        mu_s = self.mean_func(Xnew)
        Kss = self.cov_func(Xnew, diag=diag) if diag else self.cov_func(Xnew)
        Kns = (
            noise_func(Xnew, diag=diag) if diag else noise_func(Xnew)
        ) if pred_noise else None

        def cond(kxx, knx, kxs, kss, mx, ms, yv, kns=None):
            n = kxx.shape[0]
            jit_val = _resolve_jitter(jitter, kxx.dtype)
            Ky = kxx + knx + jit_val * jnp.eye(n, dtype=kxx.dtype)
            L = cholesky_batched(Ky)
            from jax.scipy.linalg import solve_triangular

            A = solve_triangular(L, kxs, lower=True)
            v = solve_triangular(L, yv - mx, lower=True)
            mu = ms + A.T @ v
            if diag:
                var = kss - jnp.sum(A**2, axis=0)
                if pred_noise:
                    var = var + kns
                return mu, var
            cov = kss - A.T @ A
            if pred_noise:
                cov = cov + kns
            return mu, cov + _resolve_jitter(jitter, cov.dtype) * jnp.eye(
                cov.shape[0], dtype=cov.dtype)

        args = (Kxx, Knx, Kxs, Kss, mu_x, mu_s, y)
        if pred_noise:
            args = args + (Kns,)
        mu = apply(lambda *a: cond(*a)[0], *args)
        cov = apply(lambda *a: cond(*a)[1], *args)
        return mu, cov

    def conditional(self, name, Xnew, pred_noise=False, given=None,
                    jitter=None, **kwargs):
        import pymc_tpu as pm

        Xnew = jnp.asarray(Xnew) if not is_node(Xnew) else Xnew
        givens = self._get_given_vals(given)
        mu, cov = self._build_conditional(Xnew, pred_noise, False, jitter,
                                          *givens)
        return pm.MvNormal(name, mu=mu, cov=cov, **kwargs)

    def predict(self, Xnew, point=None, diag=False, pred_noise=False,
                given=None, jitter=None, model=None):
        """Closed-form predictive moments at a point (reference
        Marginal.predict)."""
        from ..graph import evaluate

        Xnew = jnp.asarray(Xnew)
        givens = self._get_given_vals(given)
        mu, cov = self._build_conditional(Xnew, pred_noise, diag, jitter,
                                          *givens)
        env = dict(point or {})
        return (
            np.asarray(jax.device_get(evaluate(mu, env))),
            np.asarray(jax.device_get(evaluate(cov, env))),
        )


class MarginalApprox(Marginal):
    """Sparse approximations FITC / VFE / DTC with inducing points Xu
    (reference gp.py MarginalApprox). The approximate marginal likelihood is
    added as a Potential (matrix-free Woodbury algebra, O(n m^2))."""

    _available_approx = ("FITC", "VFE", "DTC")

    def __init__(self, approx="VFE", mean_func=None, cov_func=None):
        if approx not in self._available_approx:
            raise NotImplementedError(f"approx must be one of {self._available_approx}")
        self.approx = approx
        super().__init__(mean_func, cov_func)

    def __add__(self, other):
        # reference gp.py MarginalApprox.__add__: only same approximations add
        new_gp = super().__add__(other)
        if not self.approx == other.approx:
            raise TypeError("Cannot add GPs with different approximations")
        new_gp.approx = self.approx
        return new_gp

    def marginal_likelihood(self, name, X, Xu, y, sigma=None, noise=None,
                            jitter=None, is_observed=True, **kwargs):
        import pymc_tpu as pm
        from ..model.core import Potential

        if sigma is None:
            sigma = noise
        if sigma is None:
            raise ValueError("MarginalApprox requires sigma")
        X = jnp.asarray(X) if not is_node(X) else X
        Xu = jnp.asarray(Xu) if not is_node(Xu) else Xu
        self.X, self.Xu, self.y, self.sigma = X, Xu, y, sigma
        self._jitter = jitter

        Kuu = self.cov_func(Xu)
        Kuf = self.cov_func(Xu, X)
        Kffd = self.cov_func(X, diag=True)
        mu_x = self.mean_func(X)
        approx = self.approx

        def logp(kuu, kuf, kffd, mx, yv, s):
            from jax.scipy.linalg import solve_triangular

            n = kuf.shape[1]
            m = kuf.shape[0]
            Luu = cholesky_batched(
                kuu + _resolve_jitter(jitter, kuu.dtype)
                * jnp.eye(m, dtype=kuu.dtype)
            )
            A = solve_triangular(Luu, kuf, lower=True)       # (m, n)
            Qffd = jnp.sum(A**2, axis=0)
            if approx == "FITC":
                Lamd = jnp.clip(kffd - Qffd, 0.0, None) + s**2
                trace = 0.0
            else:  # VFE / DTC
                Lamd = jnp.full((n,), s**2, dtype=kuu.dtype)
                trace = (
                    -0.5 * jnp.sum(jnp.clip(kffd - Qffd, 0.0, None)) / s**2
                    if approx == "VFE" else 0.0
                )
            A_l = A / Lamd
            L_B = cholesky_batched(
                jnp.eye(m, dtype=kuu.dtype) + A_l @ A.T
            )
            r = yv - mx
            r_l = r / Lamd
            c = solve_triangular(L_B, A @ r_l, lower=True)
            constant = 0.5 * n * jnp.log(2.0 * jnp.pi)
            logdet = jnp.sum(jnp.log(jnp.diagonal(L_B))) + 0.5 * jnp.sum(
                jnp.log(Lamd)
            )
            quad = 0.5 * (jnp.dot(r, r_l) - jnp.dot(c, c))
            return -constant - logdet - quad + trace

        pot = apply(logp, Kuu, Kuf, Kffd, mu_x, jnp.asarray(y), sigma)
        return Potential(name, pot)

    def _get_given_vals(self, given):
        """Reference MarginalApprox._get_given_vals (X, Xu, y, sigma)."""
        if given is None:
            given = {}
        if "gp" in given:
            cov_total = given["gp"].cov_func
            mean_total = given["gp"].mean_func
        else:
            cov_total = self.cov_func
            mean_total = self.mean_func
        if all(val in given for val in ("X", "Xu", "y", "sigma")):
            X, Xu, y, sigma = given["X"], given["Xu"], given["y"], given["sigma"]
        else:
            X, Xu, y, sigma = self.X, self.Xu, self.y, self.sigma
        return X, Xu, y, sigma, cov_total, mean_total

    def _build_conditional(self, Xnew, pred_noise, diag, jitter,
                           X, Xu, y, sigma, cov_total, mean_total):
        # Quu/Qff pieces come from the TOTAL kernel; the cross/new terms
        # from THIS component (reference MarginalApprox._build_conditional)
        Kuu = cov_total(Xu)
        Kuf = cov_total(Xu, X)
        Kffd = cov_total(X, diag=True)
        Kus = self.cov_func(Xu, Xnew)
        Kss = self.cov_func(Xnew, diag=diag) if diag else self.cov_func(Xnew)
        mu_x = mean_total(X)
        mu_s = self.mean_func(Xnew)
        approx = self.approx

        def cond(kuu, kuf, kffd, kus, kss, mx, ms, yv, s):
            from jax.scipy.linalg import solve_triangular

            m = kuf.shape[0]
            Luu = cholesky_batched(
                kuu + _resolve_jitter(jitter, kuu.dtype)
                * jnp.eye(m, dtype=kuu.dtype)
            )
            A = solve_triangular(Luu, kuf, lower=True)
            Qffd = jnp.sum(A**2, axis=0)
            if approx == "FITC":
                Lamd = jnp.clip(kffd - Qffd, 0.0, None) + s**2
            else:
                Lamd = jnp.full((kuf.shape[1],), s**2, dtype=kuu.dtype)
            A_l = A / Lamd
            L_B = cholesky_batched(jnp.eye(m, dtype=kuu.dtype) + A_l @ A.T)
            r = yv - mx
            r_l = r / Lamd
            c = solve_triangular(L_B, A @ r_l, lower=True)
            As = solve_triangular(Luu, kus, lower=True)
            mu = ms + As.T @ solve_triangular(
                L_B.T, c, lower=False
            )
            C = solve_triangular(L_B, As, lower=True)
            if diag:
                var = kss - jnp.sum(As**2, axis=0) + jnp.sum(C**2, axis=0)
                if pred_noise:
                    var = var + s**2
                return mu, var
            cov = kss - As.T @ As + C.T @ C
            if pred_noise:
                cov = cov + s**2 * jnp.eye(cov.shape[0], dtype=cov.dtype)
            return mu, cov + _resolve_jitter(jitter, cov.dtype) * jnp.eye(
                cov.shape[0], dtype=cov.dtype)

        args = (Kuu, Kuf, Kffd, Kus, Kss, mu_x, mu_s, jnp.asarray(y), sigma)
        mu = apply(lambda *a: cond(*a)[0], *args)
        cov = apply(lambda *a: cond(*a)[1], *args)
        return mu, cov


class LatentKron(Base):
    """Latent GP over a Kronecker-structured input grid (reference gp.py
    LatentKron): chol(K1 (x) K2) = chol(K1) (x) chol(K2) — applied as
    sequential per-factor matmuls, never materializing the full kernel."""

    def __init__(self, mean_func=None, cov_funcs=None):
        self.cov_funcs = list(cov_funcs)
        super().__init__(mean_func, self.cov_funcs[0])

    def prior(self, name, Xs, jitter=None, **kwargs):
        import pymc_tpu as pm
        from ..model.core import Deterministic

        self.Xs = [jnp.asarray(X) for X in Xs]
        ns = [X.shape[0] for X in self.Xs]
        N = int(np.prod(ns))
        chols = [
            apply(
                lambda k: cholesky_batched(
                    k + _resolve_jitter(jitter, k.dtype)
                    * jnp.eye(k.shape[-1], dtype=k.dtype)
                ),
                cf(X),
            )
            for cf, X in zip(self.cov_funcs, self.Xs)
        ]
        v = pm.Normal(f"{name}_rotated_", 0.0, 1.0, shape=(N,), **kwargs)

        def kron_matvec(vv, *Ls):
            x = vv
            for n_i, L in zip(ns, Ls):
                x = x.reshape(n_i, -1)
                x = L @ x
                x = x.T.reshape(-1)
            return x

        f = Deterministic(name, apply(kron_matvec, v, *chols))
        self.f = f
        return f


class MarginalKron(Base):
    """Marginal GP on a Kronecker grid with iid noise via the KroneckerNormal
    distribution (reference gp.py MarginalKron)."""

    def __init__(self, mean_func=None, cov_funcs=None):
        self.cov_funcs = list(cov_funcs)
        super().__init__(mean_func, self.cov_funcs[0])

    def marginal_likelihood(self, name, Xs, y, sigma, **kwargs):
        import pymc_tpu as pm

        self.Xs = [jnp.asarray(X) for X in Xs]
        covs = [cf(X) for cf, X in zip(self.cov_funcs, self.Xs)]
        N = int(np.prod([X.shape[0] for X in self.Xs]))
        mu = jnp.zeros((N,), dtype=floatX())
        return pm.KroneckerNormal(
            name, mu=mu, covs=covs, sigma=sigma, observed=y, **kwargs
        )


class MarginalSparse(MarginalApprox):
    """Deprecated alias of MarginalApprox (reference gp/gp.py MarginalSparse)."""

    def __init__(self, *args, **kwargs):
        import warnings

        warnings.warn(
            "gp.MarginalSparse has been renamed to gp.MarginalApprox.",
            FutureWarning,
        )
        super().__init__(*args, **kwargs)


__all__.append("MarginalSparse")
