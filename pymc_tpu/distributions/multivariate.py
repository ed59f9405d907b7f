"""Multivariate distributions.

Parity: reference pymc/distributions/multivariate.py (MvNormal:188,
MvStudentT:417, Dirichlet:515, Multinomial:587, DirichletMultinomial:716,
OrderedMultinomial:820, Wishart:983, LKJCholeskyCov:1313, LKJCorr:1578,
MatrixNormal:1703, KroneckerNormal:1919, CAR:2160, ICAR:2315,
StickBreakingWeights:2501, ZeroSumNormal:2654).

All dense linear algebra (Cholesky, triangular solves) maps onto the MXU.
The LKJ normalizing constants are derived in closed form (docstrings) and
verified numerically in tests.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.linalg import cholesky_batched
from jax.scipy import special as jsp
from jax.scipy.linalg import solve_triangular

from ..config import floatX, intX
from ..graph import apply, is_node
from ..math import kron_diag
from .dist_math import betaln, check_parameters, factln, logpow
from .distribution import Continuous, Discrete, as_param
from . import transforms as tr

__all__ = [
    "MvNormal", "MvStudentT", "Dirichlet", "Multinomial",
    "DirichletMultinomial", "OrderedMultinomial", "Wishart", "WishartBartlett",
    "LKJCholeskyCov", "LKJCorr", "MatrixNormal", "KroneckerNormal",
    "CAR", "ICAR", "StickBreakingWeights", "ZeroSumNormal",
]

_LOG_2PI = 1.8378770664093453


def _solve_chol_params(mu=None, cov=None, tau=None, chol=None, lower=True):
    """Canonicalize MvNormal-style parametrization to (mu, chol)."""
    n_given = sum(p is not None for p in (cov, tau, chol))
    if n_given != 1:
        raise ValueError("Provide exactly one of cov, tau, chol")
    if chol is not None:
        chol = as_param(chol)
        if not lower:
            chol = apply(lambda c: jnp.swapaxes(c, -1, -2), chol)
        return chol
    if cov is not None:
        return apply(cholesky_batched, as_param(cov))
    # tau: Sigma = inv(tau); chol(Sigma) via cholesky of inverse
    return apply(
        lambda t: cholesky_batched(jnp.linalg.inv(t)), as_param(tau)
    )


def _tri_solve(chol, vec):
    """Batched lower-triangular solve with full broadcasting of the operands."""
    batch = jnp.broadcast_shapes(vec.shape[:-1], chol.shape[:-2])
    chol_b = jnp.broadcast_to(chol, batch + chol.shape[-2:])
    vec_b = jnp.broadcast_to(vec, batch + vec.shape[-1:])
    return solve_triangular(chol_b, vec_b[..., None], lower=True)[..., 0]


def _mvn_logp(value, mu, chol):
    """log N(value | mu, L L^T) — batched, solves ride the MXU."""
    d = value.shape[-1]
    diff = value - mu
    z = _tri_solve(chol, diff)
    quad = jnp.sum(z**2, axis=-1)
    logdet = jnp.sum(jnp.log(jnp.abs(_diag(chol))), axis=-1)
    res = -0.5 * (d * _LOG_2PI + quad) - logdet
    ok = jnp.all(jnp.isfinite(_diag(chol)), axis=-1) & jnp.all(
        _diag(chol) > 0, axis=-1
    )
    return jnp.where(ok, res, -jnp.inf)


def _diag(m):
    return jnp.diagonal(m, axis1=-2, axis2=-1)


class MvNormal(Continuous):
    """Reference multivariate.py:188 (covers PrecisionMvNormal:310 via tau)."""

    param_names = ("mu", "chol")
    param_event_ndims = (1, 2)
    event_ndim = 1

    def __dist_init__(self, mu=0.0, cov=None, tau=None, chol=None, lower=True):
        self.chol = _solve_chol_params(mu, cov, tau, chol, lower)
        mu = as_param(mu)
        self.mu = mu

    def _event_shape(self, mu_shape, chol_shape):
        return (chol_shape[-1],)

    def _logp(self, value, mu, chol):
        return _mvn_logp(value, mu, chol)

    def _sample(self, key, shape, mu, chol):
        z = jax.random.normal(key, shape, dtype=floatX())
        return mu + jnp.einsum("...ij,...j->...i", chol, z)

    def _support_point(self, mu, chol):
        return jnp.broadcast_to(
            mu, jnp.broadcast_shapes(jnp.shape(mu), jnp.shape(chol)[:-1])
        )


class MvStudentT(Continuous):
    """Reference multivariate.py:417."""

    param_names = ("nu", "mu", "chol")
    param_event_ndims = (0, 1, 2)
    event_ndim = 1

    def __dist_init__(self, nu, mu=0.0, scale=None, tau=None, chol=None,
                      cov=None, lower=True):
        scale = scale if scale is not None else cov
        self.chol = _solve_chol_params(mu, scale, tau, chol, lower)
        self.nu = as_param(nu)
        self.mu = as_param(mu)

    def _event_shape(self, nu_shape, mu_shape, chol_shape):
        return (chol_shape[-1],)

    def _logp(self, value, nu, mu, chol):
        d = value.shape[-1]
        diff = value - mu
        z = _tri_solve(chol, diff)
        quad = jnp.sum(z**2, axis=-1)
        logdet = jnp.sum(jnp.log(jnp.abs(_diag(chol))), axis=-1)
        res = (
            jsp.gammaln((nu + d) / 2.0)
            - jsp.gammaln(nu / 2.0)
            - 0.5 * d * jnp.log(nu * jnp.pi)
            - logdet
            - 0.5 * (nu + d) * jnp.log1p(quad / nu)
        )
        return check_parameters(res, nu > 0)

    def _sample(self, key, shape, nu, mu, chol):
        k1, k2 = jax.random.split(key)
        z = jax.random.normal(k1, shape, dtype=floatX())
        g = jax.random.gamma(k2, nu / 2.0, shape=shape[:-1], dtype=floatX())
        w = jnp.sqrt(nu / (2.0 * g))[..., None]
        return mu + w * jnp.einsum("...ij,...j->...i", chol, z)

    def _support_point(self, nu, mu, chol):
        return jnp.broadcast_to(
            mu, jnp.broadcast_shapes(jnp.shape(mu), jnp.shape(chol)[:-1])
        )


class Dirichlet(Continuous):
    """Reference multivariate.py:515."""

    param_names = ("a",)
    param_event_ndims = (1,)
    event_ndim = 1
    support = "simplex"

    def __dist_init__(self, a):
        self.a = as_param(a)

    def _event_shape(self, a_shape):
        return (a_shape[-1],)

    def _logp(self, value, a):
        safe = jnp.clip(value, 1e-30, 1.0)
        res = (
            jnp.sum(logpow(value, a - 1.0), axis=-1)
            + jsp.gammaln(jnp.sum(a, axis=-1))
            - jnp.sum(jsp.gammaln(a), axis=-1)
        )
        in_simplex = jnp.all(value >= 0, axis=-1) & (
            jnp.abs(jnp.sum(value, axis=-1) - 1.0) < 1e-6
        )
        res = jnp.where(in_simplex, res, -jnp.inf)
        return check_parameters(res, jnp.all(a > 0, axis=-1))

    def _sample(self, key, shape, a):
        a = jnp.broadcast_to(a, shape)
        g = jax.random.gamma(key, a, dtype=floatX())
        return g / jnp.sum(g, axis=-1, keepdims=True)

    def _support_point(self, a):
        return a / jnp.sum(a, axis=-1, keepdims=True)


class Multinomial(Discrete):
    """Reference multivariate.py:587."""

    param_names = ("n", "p")
    param_event_ndims = (0, 1)
    event_ndim = 1

    def __dist_init__(self, n, p):
        self.n = as_param(n, float_ok=False)
        if not is_node(p):
            # constant p: reject negatives, warn + rescale non-normalized
            # (reference multivariate.py:626-636)
            p_ = np.asarray(p, dtype=float)
            if np.any(p_ < 0):
                raise ValueError("Negative `p` parameters are not valid")
            p_sum = np.sum(p_, axis=-1)
            if not np.all(np.isclose(p_sum, 1.0)):
                import warnings

                warnings.warn(
                    f"`p` parameters sum to {p_sum}, instead of 1.0. "
                    "They will be automatically rescaled.",
                    UserWarning,
                )
                p = p_ / np.sum(p_, axis=-1, keepdims=True)
        self.p = as_param(p)

    def _event_shape(self, n_shape, p_shape):
        return (p_shape[-1],)

    def _logp(self, value, n, p):
        vf = jnp.asarray(value, floatX())
        p_norm = p / jnp.sum(p, axis=-1, keepdims=True)
        res = factln(n) + jnp.sum(
            logpow(p_norm, vf) - factln(vf), axis=-1
        )
        ok = (jnp.sum(value, axis=-1) == n) & jnp.all(value >= 0, axis=-1)
        res = jnp.where(ok, res, -jnp.inf)
        # reference multivariate.py:96-103: 0<=p<=1, sum(p)~1, n>=0 are
        # density preconditions (symbolic non-normalized p is -inf, not
        # silently rescaled; constant p was rescaled at init)
        return check_parameters(
            res,
            jnp.all(p >= 0, axis=-1),
            jnp.all(p <= 1, axis=-1),
            jnp.isclose(jnp.sum(p, axis=-1), 1.0),
            n >= 0,
        )

    def _sample(self, key, shape, n, p):
        # iterative binomial decomposition (statically unrolled over K)
        k_cats = p.shape[-1]
        p = jnp.broadcast_to(p, shape[:-1] + (k_cats,))
        n_rem = jnp.broadcast_to(jnp.asarray(n, floatX()), shape[:-1])
        p_rem = jnp.ones_like(n_rem)
        outs = []
        for i in range(k_cats - 1):
            ki = jax.random.fold_in(key, i)
            frac = jnp.clip(p[..., i] / jnp.maximum(p_rem, 1e-30), 0.0, 1.0)
            draw = jax.random.binomial(ki, n_rem, frac)
            outs.append(draw)
            n_rem = n_rem - draw
            p_rem = p_rem - p[..., i]
        outs.append(n_rem)
        return jnp.stack(outs, axis=-1).astype(intX())

    def _support_point(self, n, p):
        nf = jnp.asarray(n, floatX())
        mode = jnp.floor(nf[..., None] * p)
        rem = nf - jnp.sum(mode, axis=-1)
        mode = mode.at[..., 0].add(rem)
        return mode.astype(intX())


class DirichletMultinomial(Discrete):
    """Reference multivariate.py:716."""

    param_names = ("n", "a")
    param_event_ndims = (0, 1)
    event_ndim = 1

    def __dist_init__(self, n, a):
        self.n = as_param(n, float_ok=False)
        self.a = as_param(a)

    def _event_shape(self, n_shape, a_shape):
        return (a_shape[-1],)

    def _logp(self, value, n, a):
        vf = jnp.asarray(value, floatX())
        nf = jnp.asarray(n, floatX())
        sum_a = jnp.sum(a, axis=-1)
        res = (
            factln(nf)
            + jsp.gammaln(sum_a)
            - jsp.gammaln(nf + sum_a)
            + jnp.sum(
                jsp.gammaln(vf + a) - factln(vf) - jsp.gammaln(a), axis=-1
            )
        )
        ok = (jnp.sum(value, axis=-1) == n) & jnp.all(value >= 0, axis=-1)
        res = jnp.where(ok, res, -jnp.inf)
        return check_parameters(res, jnp.all(a > 0, axis=-1))

    def _sample(self, key, shape, n, a):
        k1, k2 = jax.random.split(key)
        a = jnp.broadcast_to(a, shape)
        g = jax.random.gamma(k1, a, dtype=floatX())
        p = g / jnp.sum(g, axis=-1, keepdims=True)
        return Multinomial._sample(self, k2, shape, n, p)

    def _support_point(self, n, a):
        p = a / jnp.sum(a, axis=-1, keepdims=True)
        return Multinomial._support_point(self, n, p)


class OrderedMultinomial(Discrete):
    """Reference multivariate.py:820 — multinomial over ordinal category
    probabilities induced by cutpoints and a latent eta."""

    param_names = ("eta", "cutpoints", "n")
    param_event_ndims = (0, 1, 0)
    event_ndim = 1

    def __dist_init__(self, eta, cutpoints, n):
        self.eta = as_param(eta)
        self.cutpoints = as_param(cutpoints)
        self.n = as_param(n, float_ok=False)

    def _event_shape(self, eta_shape, cut_shape, n_shape):
        return (cut_shape[-1] + 1,)

    @staticmethod
    def _probs(eta, cutpoints):
        cdf = jax.nn.sigmoid(cutpoints - eta[..., None])
        lo = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
        hi = jnp.concatenate([cdf, jnp.ones_like(cdf[..., :1])], axis=-1)
        return hi - lo

    def _logp(self, value, eta, cutpoints, n):
        p = self._probs(eta, cutpoints)
        return Multinomial._logp(self, value, n, p)

    def _sample(self, key, shape, eta, cutpoints, n):
        p = self._probs(eta, cutpoints)
        return Multinomial._sample(self, key, shape, n, p)

    def _support_point(self, eta, cutpoints, n):
        p = self._probs(eta, cutpoints)
        return Multinomial._support_point(self, n, p)


def _lkj_chol_row_lognorm(n, eta, k):
    """log Z_k of the k-th row (k = 2..n) of the LKJ cholesky density:
    Z_k = pi^{(k-1)/2} * Gamma((n-k)/2 + eta) / Gamma((n-1)/2 + eta)
    (derived by integrating the row over the unit ball; verified vs the
    n=2 closed form 2^{2eta-1}B(eta,eta))."""
    return (
        0.5 * (k - 1) * jnp.log(jnp.pi)
        + jsp.gammaln((n - k) / 2.0 + eta)
        - jsp.gammaln((n - 1) / 2.0 + eta)
    )


def _lkj_cholesky_corr_logp(W, eta, n):
    """log density of a correlation-matrix Cholesky factor under LKJ(eta),
    normalized: sum_k (n-k+2eta-2) log W_kk - sum_k log Z_k."""
    diag = _diag(W)
    k_arr = jnp.arange(2, n + 1, dtype=floatX())
    expo = n - k_arr + 2.0 * eta - 2.0
    log_diag = jnp.log(jnp.clip(diag[..., 1:], 1e-30, None))
    res = jnp.sum(expo * log_diag, axis=-1)
    lognorm = jnp.sum(_lkj_chol_row_lognorm(float(n), eta, k_arr))
    return res - lognorm


def _packed_to_chol_corr(packed, n):
    """Packed strictly-lower entries -> full corr cholesky (unit row norms)."""
    rows, cols = np.tril_indices(n, k=-1)
    W = jnp.zeros(packed.shape[:-1] + (n, n), dtype=packed.dtype)
    W = W.at[..., rows, cols].set(packed)
    sq = jnp.sum(W**2, axis=-1)
    diag = jnp.sqrt(jnp.clip(1.0 - sq, 1e-30, None))
    return W + diag[..., None] * jnp.eye(n, dtype=packed.dtype)


def _sample_lkj_chol(key, shape_batch, n, eta, dtype):
    """Onion-method sampler for LKJ cholesky factors.

    Row k (k=2..n): W_kk^2 ~ Beta((n-k)/2 + eta, (k-1)/2), direction uniform
    on the (k-1)-sphere.
    """
    W = jnp.zeros(shape_batch + (n, n), dtype=dtype)
    W = W.at[..., 0, 0].set(1.0)
    for k in range(2, n + 1):
        kk, kd = jax.random.split(jax.random.fold_in(key, k))
        b = jax.random.beta(
            kk, (n - k) / 2.0 + eta, (k - 1) / 2.0, shape=shape_batch,
            dtype=dtype,
        )
        diag = jnp.sqrt(b)
        z = jax.random.normal(kd, shape_batch + (k - 1,), dtype=dtype)
        z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
        r = jnp.sqrt(jnp.clip(1.0 - b, 0.0, 1.0))[..., None]
        W = W.at[..., k - 1, : k - 1].set(r * z)
        W = W.at[..., k - 1, k - 1].set(diag)
    return W


class _LKJCholeskyCov(Continuous):
    """Packed Cholesky factor of a covariance matrix with LKJ correlation
    prior and an arbitrary sd prior (reference multivariate.py:1223).

    value = packed lower-triangular L (row-major, n(n+1)/2 entries) with
    cov = L @ L.T. logp derived via the (sds, corr-chol) factorization with
    Jacobian |dL/d(sd, W)| = prod_i sd_i^{i-1} / W_ii (docstring derivation).
    """

    param_names = ("eta",)
    event_ndim = 1

    def __dist_init__(self, eta, n, sd_dist):
        self.eta = as_param(eta)
        self.n = int(n)
        self.sd_dist = sd_dist

    def _event_shape(self, eta_shape):
        return (self.n * (self.n + 1) // 2,)

    def default_transform(self):
        return tr.CholeskyCovPackedTransform(self.n)

    def _unpack(self, value):
        n = self.n
        rows, cols = np.tril_indices(n)
        L = jnp.zeros(value.shape[:-1] + (n, n), dtype=value.dtype)
        return L.at[..., rows, cols].set(value)

    def _logp(self, value, eta):
        n = self.n
        L = self._unpack(value)
        sd = jnp.sqrt(jnp.clip(jnp.sum(L**2, axis=-1), 1e-30, None))
        W = L / sd[..., None]
        lkj = _lkj_cholesky_corr_logp(W, eta, n)
        sd_logp = jnp.sum(self.sd_dist._logp(sd, *self.sd_dist.resolve_params()),
                          axis=-1)
        idx = jnp.arange(1, n + 1, dtype=value.dtype)
        log_jac = jnp.sum((idx - 1.0) * jnp.log(sd), axis=-1) - jnp.sum(
            jnp.log(jnp.clip(_diag(W), 1e-30, None)), axis=-1
        )
        res = lkj + sd_logp - log_jac
        ok = jnp.all(_diag(L) > 0, axis=-1)
        res = jnp.where(ok, res, -jnp.inf)
        return check_parameters(res, eta > 0)

    def _sample(self, key, shape, eta):
        n = self.n
        batch = shape[:-1]
        k1, k2 = jax.random.split(key)
        W = _sample_lkj_chol(k1, batch, n, eta, floatX())
        sd = self.sd_dist._sample(k2, batch + (n,),
                                  *self.sd_dist.resolve_params())
        L = W * sd[..., None]
        rows, cols = np.tril_indices(n)
        return L[..., rows, cols]

    def _support_point(self, eta):
        n = self.n
        sd_pt = jnp.broadcast_to(
            self.sd_dist._support_point(*self.sd_dist.resolve_params()), (n,)
        )
        rows, cols = np.tril_indices(n)
        L = jnp.eye(n, dtype=floatX()) * sd_pt[..., None]
        return L[..., rows, cols]


def LKJCholeskyCov(name, eta, n, sd_dist, *, compute_corr=True,
                   store_in_trace=True, **kwargs):
    """Reference multivariate.py:1313 — registers the packed RV and (by
    default) returns (chol, corr, stds) deterministics."""
    from ..model.core import Deterministic, modelcontext

    packed = _LKJCholeskyCov(name if not compute_corr else f"{name}",
                             eta, n, sd_dist, **kwargs)
    if not compute_corr:
        return packed
    n = int(n)
    rows, cols = np.tril_indices(n)

    def unpack(v):
        L = jnp.zeros(v.shape[:-1] + (n, n), dtype=v.dtype)
        return L.at[..., rows, cols].set(v)

    chol = apply(unpack, packed)
    stds = apply(lambda L: jnp.sqrt(jnp.sum(L**2, axis=-1)), chol)
    corr = apply(
        lambda L, s: (L @ jnp.swapaxes(L, -1, -2)) / (s[..., None] * s[..., None, :]),
        chol, stds,
    )
    if store_in_trace:
        chol = Deterministic(f"{name}_chol", chol)
        corr = Deterministic(f"{name}_corr", corr)
        stds = Deterministic(f"{name}_stds", stds)
    return chol, corr, stds


class LKJCorr(Continuous):
    """LKJ distribution over correlation matrices (reference
    multivariate.py:1578). value = packed strictly-lower entries of C
    (n(n-1)/2) unless return_matrix=True draws return the full matrix."""

    param_names = ("eta",)
    event_ndim = 1

    def __dist_init__(self, n, eta, return_matrix=False):
        self.n = int(n)
        self.eta = as_param(eta)
        self.return_matrix = bool(return_matrix)

    def _event_shape(self, eta_shape):
        if self.return_matrix:
            return (self.n, self.n)
        return (self.n * (self.n - 1) // 2,)

    @property
    def event_ndim(self):
        return 2 if self.return_matrix else 1

    @event_ndim.setter
    def event_ndim(self, v):
        pass

    def default_transform(self):
        if self.return_matrix:
            return None
        return CorrPackedTransform(self.n)

    def _to_matrix(self, value):
        n = self.n
        if self.return_matrix:
            return value
        rows, cols = np.tril_indices(n, k=-1)
        C = jnp.zeros(value.shape[:-1] + (n, n), dtype=value.dtype)
        C = C.at[..., rows, cols].set(value)
        C = C + jnp.swapaxes(C, -1, -2) + jnp.eye(n, dtype=value.dtype)
        return C

    def _logp(self, value, eta):
        """p(C) via the cholesky parametrization: logp_W(chol(C)) minus
        log|d(packedC)/d(freeW)| = sum_j (n-j) log W_jj."""
        n = self.n
        C = self._to_matrix(value)
        W = cholesky_batched(C)
        diag = jnp.clip(_diag(W), 1e-30, None)
        lkj = _lkj_cholesky_corr_logp(W, eta, n)
        js = jnp.arange(1, n + 1, dtype=floatX())
        log_jac = jnp.sum((n - js) * jnp.log(diag), axis=-1)
        res = lkj - log_jac
        ok = jnp.all(jnp.isfinite(W).reshape(W.shape[:-2] + (-1,)), axis=-1)
        res = jnp.where(ok, res, -jnp.inf)
        return check_parameters(res, eta > 0)

    def _sample(self, key, shape, eta):
        n = self.n
        batch = shape[: len(shape) - (2 if self.return_matrix else 1)]
        W = _sample_lkj_chol(key, batch, n, eta, floatX())
        C = W @ jnp.swapaxes(W, -1, -2)
        if self.return_matrix:
            return C
        rows, cols = np.tril_indices(n, k=-1)
        return C[..., rows, cols]

    def _support_point(self, eta):
        if self.return_matrix:
            return jnp.eye(self.n, dtype=floatX())
        return jnp.zeros((self.n * (self.n - 1) // 2,), dtype=floatX())


class CorrPackedTransform(tr.Transform):
    """Unconstrained R^{n(n-1)/2} <-> packed strictly-lower entries of a
    correlation MATRIX (for LKJCorr values): composes the canonical
    partial-correlation map with C = W W^T; log-jacobian adds
    sum_j (n-j) log W_jj for the W -> packed(C) stage."""

    name = "corr-packed"
    event_ndim = 1

    def __init__(self, n):
        self.n = int(n)
        self._chol_t = tr.CholeskyCorrTransform(n)
        self.rows, self.cols = np.tril_indices(self.n, k=-1)

    def backward(self, v, env=None):
        packed_W = self._chol_t.backward(v, env)
        W = _packed_to_chol_corr(packed_W, self.n)
        C = W @ jnp.swapaxes(W, -1, -2)
        return C[..., self.rows, self.cols]

    def forward(self, x, env=None):
        C = jnp.zeros(x.shape[:-1] + (self.n, self.n), dtype=x.dtype)
        C = C.at[..., self.rows, self.cols].set(x)
        C = C + jnp.swapaxes(C, -1, -2) + jnp.eye(self.n, dtype=x.dtype)
        W = cholesky_batched(C)
        return self._chol_t.forward(W[..., self.rows, self.cols], env)

    def log_jac_det(self, v, env=None):
        base = self._chol_t.log_jac_det(v, env)
        packed_W = self._chol_t.backward(v, env)
        W = _packed_to_chol_corr(packed_W, self.n)
        js = jnp.arange(1, self.n + 1, dtype=v.dtype)
        extra = jnp.sum(
            (self.n - js) * jnp.log(jnp.clip(_diag(W), 1e-30, None)), axis=-1
        )
        return base + extra


class Wishart(Continuous):
    """Reference multivariate.py:983. value = (n, n) positive-definite."""

    param_names = ("nu", "V")
    param_event_ndims = (0, 2)
    event_ndim = 2

    def __dist_init__(self, nu, V=None, scale_chol=None):
        self.nu = as_param(nu)
        if V is None:
            if scale_chol is None:
                raise ValueError("Wishart requires V or scale_chol")
            from ..graph import Node, apply

            if isinstance(scale_chol, Node):
                V = apply(
                    lambda L: jnp.einsum("...ij,...kj->...ik", L, L),
                    scale_chol,
                )
            else:
                L = jnp.asarray(scale_chol, dtype=floatX())
                V = jnp.einsum("...ij,...kj->...ik", L, L)
        self.V = as_param(V)

    def default_transform(self):
        # SPD cone -> unconstrained packed Cholesky (reference's new Wishart
        # default CholeskyCovTransform) so NUTS/HMC can sample it directly
        p = int(self.V.shape[-1])
        return tr.CholeskyCovTransform(p)

    def _event_shape(self, nu_shape, V_shape):
        return tuple(V_shape[-2:])

    def _logp(self, value, nu, V):
        p = value.shape[-1]
        L_V = cholesky_batched(V)
        sign, logdet_x = jnp.linalg.slogdet(value)
        _, logdet_v = jnp.linalg.slogdet(V)
        # tr(V^-1 X) = || L^-1 X L^-T ||-trace via two broadcast tri-solves
        batch = jnp.broadcast_shapes(value.shape[:-2], L_V.shape[:-2])
        Lb = jnp.broadcast_to(L_V, batch + L_V.shape[-2:])
        Xb = jnp.broadcast_to(value, batch + value.shape[-2:])
        A = solve_triangular(Lb, Xb, lower=True)  # L^-1 X
        B = solve_triangular(Lb, jnp.swapaxes(A, -1, -2), lower=True)
        trace = jnp.trace(B, axis1=-2, axis2=-1)
        js = jnp.arange(1, p + 1, dtype=floatX())
        multigammaln = 0.25 * p * (p - 1) * jnp.log(jnp.pi) + jnp.sum(
            jsp.gammaln((nu[..., None] + 1.0 - js) / 2.0), axis=-1
        )
        res = (
            0.5 * (nu - p - 1.0) * logdet_x
            - 0.5 * trace
            - 0.5 * nu * p * jnp.log(2.0)
            - 0.5 * nu * logdet_v
            - multigammaln
        )
        res = jnp.where(sign > 0, res, -jnp.inf)
        return check_parameters(res, nu > p - 1)

    def _sample(self, key, shape, nu, V):
        # Bartlett decomposition
        p = V.shape[-1]
        batch = shape[:-2]
        L_V = cholesky_batched(V)
        kn, kc = jax.random.split(key)
        A = jnp.zeros(batch + (p, p), dtype=floatX())
        rows, cols = np.tril_indices(p, k=-1)
        normals = jax.random.normal(kn, batch + (len(rows),), dtype=floatX())
        A = A.at[..., rows, cols].set(normals)
        js = jnp.arange(p, dtype=floatX())
        chi = jax.random.gamma(
            kc, (jnp.asarray(nu, floatX())[..., None] - js) / 2.0,
            shape=batch + (p,), dtype=floatX(),
        )
        A = A + jnp.sqrt(2.0 * chi)[..., None] * jnp.eye(p, dtype=floatX())
        LA = jnp.einsum("...ij,...jk->...ik", L_V, A)
        return jnp.einsum("...ij,...kj->...ik", LA, LA)

    def _support_point(self, nu, V):
        return jnp.asarray(nu, floatX())[..., None, None] * V


def WishartBartlett(name, S, nu, is_cholesky=False, return_cholesky=False,
                    initval=None):
    """Bartlett-decomposed Wishart prior — backward-compatibility shim.

    Parity: reference pymc/distributions/multivariate.py:1091. The modern
    Wishart here is MCMC-usable directly (default CholeskyCovTransform), so
    this delegates to it; `is_cholesky=True` maps S to `scale_chol`,
    `return_cholesky=True` wraps the draw's Cholesky in a Deterministic.
    """
    import warnings

    warnings.warn(
        "WishartBartlett is deprecated; use pm.Wishart directly "
        "(scale_chol= for a Cholesky-parameterized scale).",
        FutureWarning,
        stacklevel=2,
    )
    if initval is not None:
        raise NotImplementedError(
            "initval is not supported by the WishartBartlett shim; pass an "
            "SPD initval to pm.Wishart directly."
        )
    kw = {"scale_chol": S} if is_cholesky else {"V": S}
    if return_cholesky:
        from ..graph import apply
        from ..model.core import Deterministic

        w = Wishart(f"_{name}_wishart", nu=nu, **kw)
        return Deterministic(name, apply(cholesky_batched, w))
    return Wishart(name, nu=nu, **kw)


class MatrixNormal(Continuous):
    """Reference multivariate.py:1703. value (n, p) with row covariance
    rowcov (n, n) and column covariance colcov (p, p)."""

    param_names = ("mu", "rowchol", "colchol")
    param_event_ndims = (2, 2, 2)
    event_ndim = 2

    def __dist_init__(self, mu=0.0, rowcov=None, rowchol=None, colcov=None,
                      colchol=None):
        self.rowchol = _solve_chol_params(None, rowcov, None, rowchol)
        self.colchol = _solve_chol_params(None, colcov, None, colchol)
        self.mu = as_param(mu)

    def _event_shape(self, mu_shape, rowchol_shape, colchol_shape):
        return (rowchol_shape[-1], colchol_shape[-1])

    def _logp(self, value, mu, rowchol, colchol):
        n, p = value.shape[-2], value.shape[-1]
        diff = value - mu
        # solve L_r Z = diff, then Z (L_c^T)^{-1}: two triangular solves
        batch = jnp.broadcast_shapes(diff.shape[:-2], rowchol.shape[:-2],
                                     colchol.shape[:-2])
        diff = jnp.broadcast_to(diff, batch + diff.shape[-2:])
        rc = jnp.broadcast_to(rowchol, batch + rowchol.shape[-2:])
        cc = jnp.broadcast_to(colchol, batch + colchol.shape[-2:])
        z = solve_triangular(rc, diff, lower=True)
        z = solve_triangular(cc, jnp.swapaxes(z, -1, -2), lower=True)
        quad = jnp.sum(z**2, axis=(-1, -2))
        logdet_r = jnp.sum(jnp.log(jnp.abs(_diag(rowchol))), axis=-1)
        logdet_c = jnp.sum(jnp.log(jnp.abs(_diag(colchol))), axis=-1)
        return (
            -0.5 * (n * p * _LOG_2PI + quad) - p * logdet_r - n * logdet_c
        )

    def _sample(self, key, shape, mu, rowchol, colchol):
        z = jax.random.normal(key, shape, dtype=floatX())
        return mu + jnp.einsum(
            "...ij,...jk,...lk->...il", rowchol, z, colchol
        )

    def _support_point(self, mu, rowchol, colchol):
        return jnp.broadcast_to(
            mu,
            jnp.broadcast_shapes(
                jnp.shape(mu), rowchol.shape[:-2] + (rowchol.shape[-1], colchol.shape[-1])
            ),
        )


class KroneckerNormal(Continuous):
    """Reference multivariate.py:1919: N(mu, K1 ⊗ K2 ⊗ ... + sigma^2 I).
    Eigendecomposition per factor keeps everything O(sum n_i^3)."""

    param_names = ("mu",)
    event_ndim = 1

    def __dist_init__(self, mu=0.0, covs=None, sigma=None):
        if covs is None:
            raise ValueError("KroneckerNormal requires covs=[K1, K2, ...]")
        self.covs = [as_param(c) for c in covs]
        self.sigma = as_param(sigma if sigma is not None else 0.0)
        self.mu = as_param(mu)
        self.param_event_ndims = (1, 0) + (2,) * len(self.covs)
        self.param_names = ("mu", "sigma") + tuple(
            f"_cov{i}" for i in range(len(self.covs))
        )
        self._ns = [
            (c.shape if is_node(c) else np.shape(c))[-1] for c in self.covs
        ]
        self._N = int(np.prod(self._ns))

    def _event_shape(self, *shapes):
        return (self._N,)

    def param_values(self):
        return [self.mu, self.sigma, *self.covs]

    def resolve_params(self, env=None, memo=None):
        from ..graph import evaluate

        if memo is None:
            memo = {}
        return tuple(evaluate(p, env, memo) for p in self.param_values())

    def _eigh_all(self, covs):
        eigs, vecs = [], []
        for K in covs:
            w, v = jnp.linalg.eigh(K)
            eigs.append(w)
            vecs.append(v)
        return eigs, vecs

    def _logp(self, value, mu, sigma, *covs):
        eigs, vecs = self._eigh_all(covs)
        lam = kron_diag(*eigs)  # (N,) eigenvalues of the kron product
        lam = lam + sigma**2
        diff = value - mu
        # project diff onto kron eigenbasis: sequential per-factor matmuls
        x = diff
        batch = diff.shape[:-1]
        for n_i, V in zip(self._ns, vecs):
            x = x.reshape(batch + (n_i, -1))
            x = jnp.einsum("ji,...jk->...ik", V, x)
            x = jnp.swapaxes(x, -1, -2).reshape(batch + (-1,))
        quad = jnp.sum(x**2 / lam, axis=-1)
        logdet = jnp.sum(jnp.log(lam))
        return -0.5 * (self._N * _LOG_2PI + logdet + quad)

    def _sample(self, key, shape, mu, sigma, *covs):
        eigs, vecs = self._eigh_all(covs)
        lam = kron_diag(*eigs) + sigma**2
        z = jax.random.normal(key, shape, dtype=floatX()) * jnp.sqrt(lam)
        x = z
        batch = shape[:-1]
        for n_i, V in zip(self._ns, vecs):
            x = x.reshape(batch + (n_i, -1))
            x = jnp.einsum("ij,...jk->...ik", V, x)
            x = jnp.swapaxes(x, -1, -2).reshape(batch + (-1,))
        return mu + x

    def _support_point(self, mu, sigma, *covs):
        return jnp.broadcast_to(mu, jnp.broadcast_shapes(jnp.shape(mu), (self._N,)))


class CAR(Continuous):
    """Conditional autoregressive prior (reference multivariate.py:2160).
    mu, W (adjacency), alpha, tau."""

    param_names = ("mu", "W", "alpha", "tau")
    param_event_ndims = (1, 2, 0, 0)
    event_ndim = 1

    def __dist_init__(self, mu, W, alpha, tau):
        self.mu = as_param(mu)
        if not is_node(W) and np.asarray(W).ndim != 2:
            # reference CARRV.make_node (multivariate.py:2095-2096)
            raise TypeError("W must be a matrix")
        self.W = as_param(W)
        self.alpha = as_param(alpha)
        self.tau = as_param(tau)

    def _event_shape(self, mu_shape, W_shape, a_shape, t_shape):
        return (W_shape[-1],)

    def _logp(self, value, mu, W, alpha, tau):
        # logp = 0.5*(logdet(tau(D - alpha W)) - (x-mu)' tau (D-alpha W) (x-mu)) - n/2 log(2pi)
        n = value.shape[-1]
        d = jnp.sum(W, axis=-1)
        diff = value - mu
        D_inv_sqrt = 1.0 / jnp.sqrt(d)
        # eigenvalues of D^{-1/2} W D^{-1/2} give the logdet cheaply
        Wn = W * D_inv_sqrt[..., :, None] * D_inv_sqrt[..., None, :]
        lam = jnp.linalg.eigvalsh(Wn)
        logdet = jnp.sum(jnp.log1p(-alpha[..., None] * lam), axis=-1) + jnp.sum(
            jnp.log(d), axis=-1
        )
        Wx = jnp.einsum("...ij,...j->...i", W, diff)
        quad = tau * (
            jnp.sum(d * diff**2, axis=-1)
            - alpha * jnp.sum(diff * Wx, axis=-1)
        )
        res = 0.5 * (
            n * jnp.log(tau) + logdet - quad - n * _LOG_2PI
        )
        # W symmetry is a density precondition (the eigvalsh logdet assumes
        # it): -inf like the reference's "W is a symmetric adjacency matrix"
        # ParameterValueError (multivariate.py:2213-2219 W_is_valid)
        w_sym = jnp.all(
            jnp.isclose(W, jnp.swapaxes(W, -1, -2)), axis=(-1, -2)
        )
        return check_parameters(res, tau > 0, jnp.abs(alpha) < 1, w_sym)

    def _sample(self, key, shape, mu, W, alpha, tau):
        d = jnp.sum(W, axis=-1)
        prec = tau[..., None, None] * (
            jnp.eye(W.shape[-1], dtype=floatX()) * d[..., None] - alpha[..., None, None] * W
        )
        cov = jnp.linalg.inv(prec)
        L = cholesky_batched(cov)
        z = jax.random.normal(key, shape, dtype=floatX())
        return mu + jnp.einsum("...ij,...j->...i", L, z)

    def _support_point(self, mu, W, alpha, tau):
        return jnp.broadcast_to(
            mu, jnp.broadcast_shapes(jnp.shape(mu), jnp.shape(W)[:-1])
        )


class ICAR(Continuous):
    """Intrinsic CAR (reference multivariate.py:2315) — improper prior;
    pairwise-difference density with sum-to-zero soft constraint."""

    param_names = ("W", "sigma")
    param_event_ndims = (2, 0)
    event_ndim = 1

    def __dist_init__(self, W, sigma=1.0, zero_sum_stdev=0.001):
        # W is adjacency structure, not a sampled parameter: validate it
        # eagerly when concrete (reference multivariate.py:2408-2421 does the
        # same checks in ICAR.dist with identical messages)
        if not is_node(W):
            W_ = np.asarray(W)
            if W_.ndim != 2:
                raise ValueError("W must be matrix with ndim=2")
            if W_.shape[0] != W_.shape[1]:
                raise ValueError("W must be a square matrix")
            if not np.allclose(W_.T, W_):
                raise ValueError("W must be a symmetric matrix")
            if np.any((W_ != 0) & (W_ != 1)):
                raise ValueError("W must be composed of only 1s and 0s")
        self.W = as_param(W, float_ok=True)
        self.sigma = as_param(sigma)
        self.zero_sum_stdev = float(zero_sum_stdev)

    def _event_shape(self, W_shape, s_shape):
        return (W_shape[-1],)

    def _logp(self, value, W, sigma):
        # Reference icar logp (multivariate.py:2434-2447): an IMPROPER prior —
        # pairwise difference energy at scale sigma plus a soft zero-sum
        # Normal on the RAW value; no (n-1)-dim normalizer, no n*log(sigma).
        # -0.5 phi' L phi == -1/(2 sigma^2) sum_{i<j} W_ij (v_i - v_j)^2,
        # the tril-edgelist sum the reference computes.
        n = value.shape[-1]
        phi = value / sigma
        pairwise = -0.5 * jnp.einsum(
            "...i,...ij,...j->...", phi, _laplacian(W), phi
        )
        zero_sum_sd = self.zero_sum_stdev * n
        soft = (
            -0.5 * (jnp.sum(value, axis=-1) / zero_sum_sd) ** 2
            - jnp.log(zero_sum_sd)
            - 0.5 * _LOG_2PI
        )
        res = pairwise + soft
        return check_parameters(res, sigma > 0)

    def _sample(self, key, shape, W, sigma):
        raise NotImplementedError("Cannot sample from ICAR prior")

    def _support_point(self, W, sigma):
        return jnp.zeros(jnp.shape(W)[:-1], dtype=floatX())


def _laplacian(W):
    d = jnp.sum(W, axis=-1)
    return jnp.eye(W.shape[-1], dtype=W.dtype) * d[..., None] - W


class StickBreakingWeights(Continuous):
    """Reference multivariate.py:2501: K+1 simplex weights from Beta(1, alpha)
    stick-breaking."""

    param_names = ("alpha",)
    event_ndim = 1
    support = "simplex"

    def __dist_init__(self, alpha, K):
        self.alpha = as_param(alpha)
        self.K = int(K)

    def _event_shape(self, alpha_shape):
        return (self.K + 1,)

    def _logp(self, value, alpha):
        K = self.K
        safe = jnp.clip(value, 1e-30, 1.0)
        # logp = K log(alpha) + (alpha-1) log(w_{K+1}) + sum log of remainders
        # density of stick-breaking with Beta(1, alpha) sticks:
        # p(w) = alpha^K w_{K+1}^{alpha-1} / prod_{k=1}^{K-1} R_k, where
        # R_k = 1 - sum_{j<=k} w_j = cumsum_rev[k] (remainder after k sticks);
        # derived via the triangular Jacobian |dv/dw| = prod 1/R_{k-1}.
        cumsum_rev = jnp.cumsum(value[..., ::-1], axis=-1)[..., ::-1]
        res = (
            K * jnp.log(alpha)
            + (alpha - 1.0) * jnp.log(safe[..., -1])
            - jnp.sum(jnp.log(jnp.clip(cumsum_rev[..., 1:-1], 1e-30, None)), axis=-1)
        )
        in_simplex = jnp.all(value >= 0, axis=-1) & (
            jnp.abs(jnp.sum(value, axis=-1) - 1.0) < 1e-6
        )
        res = jnp.where(in_simplex, res, -jnp.inf)
        return check_parameters(res, alpha > 0)

    def _sample(self, key, shape, alpha):
        K = self.K
        # alpha is batch-shaped; the K sticks axis is new on the right
        alpha_b = jnp.broadcast_to(
            jnp.asarray(alpha, floatX())[..., None], shape[:-1] + (K,)
        )
        betas = jax.random.beta(
            key, 1.0, alpha_b, shape=shape[:-1] + (K,), dtype=floatX()
        )
        sticks = jnp.concatenate(
            [jnp.ones_like(betas[..., :1]),
             jnp.cumprod(1.0 - betas, axis=-1)],
            axis=-1,
        )
        w = jnp.concatenate(
            [betas, jnp.ones_like(betas[..., :1])], axis=-1
        ) * sticks
        return w

    def _support_point(self, alpha):
        # expected weights: E[w_k] = (1/(1+a)) (a/(1+a))^{k-1}, tail exact
        K = self.K
        ks = jnp.arange(K + 1, dtype=floatX())
        a = jnp.asarray(alpha, floatX())
        w = (1.0 / (1.0 + a)) * (a / (1.0 + a)) ** ks
        w = w.at[..., -1].set((a / (1.0 + a)) ** K)
        return w


class ZeroSumNormal(Continuous):
    """Normal constrained to sum to zero over trailing axes (reference
    multivariate.py:2654). sigma scales the unconstrained fluctuation."""

    param_names = ("sigma",)
    event_ndim = 1
    support = "zerosum"

    def __dist_init__(self, sigma=1.0, n_zerosum_axes=1, support_shape=None):
        self.sigma = as_param(sigma)
        self.n_zerosum_axes = int(n_zerosum_axes)
        self._support_shape = support_shape
        self.event_ndim = self.n_zerosum_axes
        # shape= arrives via Distribution.dist's _shape_arg
        self._explicit_shape = self._shape_arg

    def _event_shape(self, sigma_shape):
        if self._explicit_shape is not None:
            return tuple(self._explicit_shape[-self.n_zerosum_axes:])
        if self._support_shape is not None:
            ss = self._support_shape
            return tuple(ss) if np.ndim(ss) else (int(ss),)
        raise ValueError("ZeroSumNormal requires shape= or support_shape=")

    def default_transform(self):
        return tr.ZeroSumTransform(self.n_zerosum_axes)

    def _logp(self, value, sigma):
        # density of the unconstrained (n-1 per axis) isometric representation
        nza = self.n_zerosum_axes
        axes = tuple(range(-nza, 0))
        n_full = 1.0
        n_free = 1.0
        for ax in axes:
            n_full *= value.shape[ax]
        shape_free = [
            s - 1 for s in value.shape[len(value.shape) - nza:]
        ]
        n_free = float(np.prod(shape_free))
        quad = jnp.sum((value / sigma) ** 2, axis=axes)
        # the constraint is per-axis: EVERY slice along each zerosum axis
        # sums to zero (a value with only the grand total zero is off the
        # support; reference zerosumnormal_logp checks each axis)
        ok = True
        for ax in axes:
            ax_sums = jnp.sum(value, axis=ax)
            ok = ok & jnp.all(
                jnp.abs(ax_sums) < 1e-6 * jnp.sqrt(n_full),
                axis=tuple(range(-(nza - 1), 0)) if nza > 1 else (),
            )
        res = -0.5 * quad - n_free * (jnp.log(sigma) + 0.5 * _LOG_2PI)
        res = jnp.where(ok, res, -jnp.inf)
        return check_parameters(res, sigma > 0)

    def _sample(self, key, shape, sigma):
        z = sigma * jax.random.normal(key, shape, dtype=floatX())
        for i in range(self.n_zerosum_axes):
            z = z - jnp.mean(z, axis=-(i + 1), keepdims=True)
        return z

    def _support_point(self, sigma):
        return jnp.zeros(self.event_shape, dtype=floatX())
