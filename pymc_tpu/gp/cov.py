"""GP covariance functions.

Parity: reference pymc/gp/cov.py (Covariance algebra with +, *, **, Kron;
Constant, WhiteNoise, ExpQuad, RatQuad, Matern52, Matern32, Matern12,
Exponential, Cosine, Periodic, Linear, Polynomial, WarpedInput, Gibbs,
ScaledCov, Coregion; power_spectral_density for the HSGP-able kernels).

TPU-native: K(X, Xs) builds one fused expression — squared distances ride the
MXU as X @ Xs.T. Hyperparameters may be symbolic Nodes (RV outputs); the
returned kernel matrix is then a graph Node evaluated inside the model logp.
"""

from __future__ import annotations

import numbers

import numpy as np
import jax
import jax.numpy as jnp

from ..config import floatX
from ..graph import Node, apply, is_node

__all__ = [
    "Covariance", "Constant", "WhiteNoise", "ExpQuad", "RatQuad", "Matern52",
    "Matern32", "Matern12", "Exponential", "Cosine", "Periodic", "Linear",
    "Polynomial", "WarpedInput", "Gibbs", "ScaledCov", "Coregion", "Kron",
    "Exponentiated", "Circular", "WrappedPeriodic", "Stationary",
    "Combination", "Add", "Prod", "handle_args",
]


class Covariance:
    """Base covariance. Subclasses implement _full(X, Xs, *params) pure-jnp
    and list `params` (possibly symbolic)."""

    # make `ndarray + cov` / `ndarray * cov` defer to __radd__/__rmul__
    # instead of numpy broadcasting the Covariance into an object array
    __array_ufunc__ = None

    def __init__(self, input_dim, active_dims=None):
        self.input_dim = int(input_dim)
        if active_dims is None:
            self.active_dims = np.arange(input_dim)
        else:
            self.active_dims = np.asarray(active_dims, dtype=int)
            if self.active_dims.size and self.active_dims.max() > self.input_dim:
                raise ValueError(
                    "Values in `active_dims` can't be larger than `input_dim`."
                )

    # -- public API --------------------------------------------------------
    def __call__(self, X, Xs=None, diag=False):
        if diag:
            return self.diag(X)
        return self.full(X, Xs)

    def full(self, X, Xs=None):
        params = self._param_list()
        return apply(
            lambda Xc, Xsc, *ps: self._full(
                self._slice(Xc), self._slice(Xsc) if Xsc is not None else None,
                *ps,
            ),
            X, Xs, *params,
        ) if Xs is not None else apply(
            lambda Xc, *ps: self._full(self._slice(Xc), None, *ps), X, *params
        )

    def diag(self, X):
        params = self._param_list()
        return apply(
            lambda Xc, *ps: self._diag(self._slice(Xc), *ps), X, *params
        )

    def _param_list(self):
        return []

    def _slice(self, X):
        # always index by active_dims (reference cov.py:195) — repeated
        # indices like active_dims=[0, 0, 1] are meaningful, so an
        # equal-length active_dims is NOT the identity
        X = jnp.asarray(X) if not is_node(X) else X
        if X.ndim == 1:
            X = X[:, None]
        return X[..., self.active_dims]

    def _diag(self, X, *params):
        return jnp.diagonal(self._full(X, None, *params))

    # -- algebra -----------------------------------------------------------
    def __add__(self, other):
        return _Add(self, _as_cov(other, self.input_dim))

    def __radd__(self, other):
        return _Add(_as_cov(other, self.input_dim), self)

    def __mul__(self, other):
        return _Prod(self, _as_cov(other, self.input_dim))

    def __rmul__(self, other):
        return _Prod(_as_cov(other, self.input_dim), self)

    def __pow__(self, other):
        if isinstance(other, Covariance) or (
            not is_node(other) and np.ndim(other) > 0
        ):
            raise ValueError(
                "A covariance function can only be exponentiated by a "
                "scalar value"
            )
        return _Pow(self, other)

    def power_spectral_density(self, omega):
        raise ValueError(
            "Power spectral densities can only be calculated for "
            "`Stationary` covariance functions."
        )


class _Scalar(Covariance):
    """A scalar or fixed (n, n) matrix treated as a covariance term in
    cov algebra (reference Combination 'other factors': scalars add/scale
    elementwise, matrices add/multiply elementwise, diag takes the matrix
    diagonal)."""

    def __init__(self, c, input_dim=1):
        super().__init__(input_dim)
        self.c = c

    def __pow__(self, other):
        # reference parity: only proper covariance functions support **
        raise TypeError(
            "Can only exponentiate covariance functions which inherit "
            "from `Covariance`"
        )

    def _param_list(self):
        return [self.c]

    def _full(self, X, Xs, c):
        n = X.shape[0]
        m = n if Xs is None else Xs.shape[0]
        c = jnp.asarray(c, floatX())
        if c.ndim == 2:
            return c
        return jnp.broadcast_to(c, (n, m))

    def _diag(self, X, c):
        c = jnp.asarray(c, floatX())
        if c.ndim == 2:
            return jnp.diagonal(c)
        return jnp.broadcast_to(c, (X.shape[0],))


def handle_args(func):
    """Adapt a warping/scaling/lengthscale function to the canonical
    ``f(x, args=...)`` calling convention (reference gp/cov.py handle_args):
    ``args=None`` -> ``func(x)``, a tuple -> unpacked, anything else ->
    passed as one extra argument."""

    def f(x, args=None):
        if args is None:
            return func(x)
        if isinstance(args, tuple):
            return func(x, *args)
        return func(x, args)

    return f


def _as_cov(x, input_dim):
    if isinstance(x, Covariance):
        return x
    if not is_node(x) and np.ndim(x) > 2:
        raise ValueError(
            f"cannot combine a {np.ndim(x)}-d array with a covariance "
            "function; only scalars and (n, n) matrices are valid factors"
        )
    return _Scalar(x, input_dim)


class _Binary(Covariance):
    def __init__(self, a, b):
        super().__init__(max(a.input_dim, b.input_dim))
        self.a, self.b = a, b

    def diag(self, X):
        return apply(self._op, self.a.diag(X), self.b.diag(X))

    def full(self, X, Xs=None):
        return apply(self._op, self.a.full(X, Xs), self.b.full(X, Xs))


class _Add(_Binary):
    @staticmethod
    def _op(x, y):
        return x + y

    def power_spectral_density(self, omega):
        return apply(
            jnp.add,
            self.a.power_spectral_density(omega),
            self.b.power_spectral_density(omega),
        )


class _Prod(_Binary):
    @staticmethod
    def _op(x, y):
        return x * y

    def power_spectral_density(self, omega):
        # scalar-amplitude times a stationary kernel: S = c * S_base
        if isinstance(self.a, _Scalar):
            return apply(
                jnp.multiply, self.a.c, self.b.power_spectral_density(omega)
            )
        if isinstance(self.b, _Scalar):
            return apply(
                jnp.multiply, self.b.c, self.a.power_spectral_density(omega)
            )
        raise NotImplementedError(
            "The power spectral density of products of covariance "
            "functions is not implemented (only scalar * stationary)"
        )


class _Pow(Covariance):
    def __init__(self, base, exponent):
        super().__init__(base.input_dim)
        self.base = base
        self.exponent = exponent

    def full(self, X, Xs=None):
        return apply(lambda k, e: k**e, self.base.full(X, Xs), self.exponent)

    def diag(self, X):
        return apply(lambda k, e: k**e, self.base.diag(X), self.exponent)


class Constant(_Scalar):
    """Reference gp/cov.py Constant."""


class WhiteNoise(Covariance):
    def __init__(self, sigma):
        super().__init__(1)
        self.sigma = sigma

    def _param_list(self):
        return [self.sigma]

    def _full(self, X, Xs, sigma):
        if Xs is None:
            return jnp.asarray(sigma, floatX()) ** 2 * jnp.eye(
                X.shape[0], dtype=floatX()
            )
        return jnp.zeros((X.shape[0], Xs.shape[0]), dtype=floatX())

    def _diag(self, X, sigma):
        return jnp.broadcast_to(
            jnp.asarray(sigma, floatX()) ** 2, (X.shape[0],)
        )


def _sqdist_raw(X, Xs):
    # ||x||^2 + ||y||^2 - 2 x.y — the cross term is one MXU matmul
    x2 = jnp.sum(X**2, axis=-1)
    y2 = x2 if Xs is X else jnp.sum(Xs**2, axis=-1)
    sq = x2[:, None] + y2[None, :] - 2.0 * (X @ Xs.T)
    return jnp.maximum(sq, 0.0)


def _sqdist(X, Xs, ls):
    # Isotropic hoist: sqdist(X/ls) == sqdist(X)/ls**2 for scalar ls. X is
    # (almost always) concrete data, so the unscaled pairwise matrix becomes
    # a compile-time constant and the per-chain BATCHED matmul that the
    # naive form pays on every leapfrog (ls is a sampled hyperparameter,
    # traced per chain under vmap) collapses to one elementwise scale.
    # GP profile (64 chains, n=150, f32): kernel build 971 µs -> ~0.
    if jnp.ndim(ls) == 0 or (jnp.ndim(ls) == 1 and ls.shape[0] == 1):
        inv2 = 1.0 / jnp.square(jnp.reshape(jnp.asarray(ls), ()))
        return _sqdist_raw(X, X if Xs is None else Xs) * inv2
    Xl = X / ls
    Xsl = Xl if Xs is None else Xs / ls
    return _sqdist_raw(Xl, Xsl)


class _Stationary(Covariance):
    """ls: scalar or (input_dim,) lengthscales (possibly symbolic)."""

    def __init__(self, input_dim, ls=None, ls_inv=None, active_dims=None):
        super().__init__(input_dim, active_dims)
        if ls is None and ls_inv is None:
            ls = 1.0
        if ls is None:
            ls = apply(lambda li: 1.0 / li, ls_inv) if is_node(ls_inv) else (
                1.0 / np.asarray(ls_inv)
            )
        if not is_node(ls) and not np.isscalar(ls):
            ls = np.asarray(ls)
        self.ls = ls

    def _param_list(self):
        return [self.ls]

    def _diag(self, X, ls):
        return jnp.ones((X.shape[0],), dtype=floatX())

    # spectral densities for HSGP (angular frequency; D-dim product form)
    def power_spectral_density(self, omega):
        raise NotImplementedError(
            "No power spectral density method has been implemented "
            f"for {type(self).__name__}"
        )


class ExpQuad(_Stationary):
    def _full(self, X, Xs, ls):
        return jnp.exp(-0.5 * _sqdist(X, Xs, ls))

    def power_spectral_density(self, omega):
        """S(w) = prod_d sqrt(2 pi) l_d * exp(-0.5 sum (l_d w_d)^2)."""
        def psd(om, ls):
            om = jnp.atleast_2d(om)
            D = om.shape[-1]
            ls_v = jnp.broadcast_to(jnp.asarray(ls, floatX()), (D,))
            u2 = jnp.sum((ls_v * om) ** 2, axis=-1)
            return jnp.prod(jnp.sqrt(2.0 * jnp.pi) * ls_v) * jnp.exp(-0.5 * u2)

        return apply(psd, omega, self.ls)


class _Matern(_Stationary):
    nu = None

    def _matern_psd(self, omega, ls):
        from jax.scipy.special import gammaln

        om = jnp.atleast_2d(omega)
        D = om.shape[-1]
        ls_v = jnp.broadcast_to(jnp.asarray(ls, floatX()), (D,))
        u2 = jnp.sum((ls_v * om) ** 2, axis=-1)
        nu = self.nu
        log_c = (
            D * jnp.log(2.0)
            + (D / 2.0) * jnp.log(jnp.pi)
            + gammaln(nu + D / 2.0)
            + nu * jnp.log(2.0 * nu)
            - gammaln(nu)
        )
        return jnp.prod(ls_v) * jnp.exp(
            log_c - (nu + D / 2.0) * jnp.log(2.0 * nu + u2)
        )

    def power_spectral_density(self, omega):
        return apply(lambda om, ls: self._matern_psd(om, ls), omega, self.ls)


class Matern52(_Matern):
    nu = 2.5

    def _full(self, X, Xs, ls):
        r = jnp.sqrt(_sqdist(X, Xs, ls) + 1e-12)
        s5r = jnp.sqrt(5.0) * r
        return (1.0 + s5r + 5.0 / 3.0 * r**2) * jnp.exp(-s5r)


class Matern32(_Matern):
    nu = 1.5

    def _full(self, X, Xs, ls):
        r = jnp.sqrt(_sqdist(X, Xs, ls) + 1e-12)
        s3r = jnp.sqrt(3.0) * r
        return (1.0 + s3r) * jnp.exp(-s3r)


class Matern12(_Matern):
    nu = 0.5

    def _full(self, X, Xs, ls):
        r = jnp.sqrt(_sqdist(X, Xs, ls) + 1e-12)
        return jnp.exp(-r)


class Exponential(_Stationary):
    """exp(-r / 2) on the ls-scaled distance (reference cov.py Exponential —
    NOT the Matern12 exp(-r); oracle tests/gp/test_cov.py:572 K[0,1]=0.57375)."""

    def _full(self, X, Xs, ls):
        r = jnp.sqrt(_sqdist(X, Xs, ls) + 1e-12)
        return jnp.exp(-0.5 * r)


class RatQuad(_Stationary):
    def __init__(self, input_dim, alpha, ls=None, ls_inv=None, active_dims=None):
        super().__init__(input_dim, ls, ls_inv, active_dims)
        self.alpha = alpha

    def _param_list(self):
        return [self.ls, self.alpha]

    def _full(self, X, Xs, ls, alpha):
        return (1.0 + _sqdist(X, Xs, ls) / (2.0 * alpha)) ** (-alpha)

    def _diag(self, X, ls, alpha):
        return jnp.ones((X.shape[0],), dtype=floatX())


class Cosine(_Stationary):
    def _full(self, X, Xs, ls):
        r = jnp.sqrt(_sqdist(X, Xs, ls) + 1e-12)
        return jnp.cos(2.0 * jnp.pi * r)


class Periodic(_Stationary):
    def __init__(self, input_dim, period, ls=None, ls_inv=None,
                 active_dims=None):
        super().__init__(input_dim, ls, ls_inv, active_dims)
        self.period = period

    def _param_list(self):
        return [self.ls, self.period]

    def _full(self, X, Xs, ls, period):
        # exp(-0.5 * sum (sin(pi d / p) / ls)^2): the reference's convention
        # (cov.py Periodic.full_from_distance drops the GPML 4x factor so ls
        # means the same thing as in the underlying ExpQuad; oracle
        # tests/gp/test_cov.py:665 K[0,1]=0.00288) — matches
        # WrappedPeriodic(ExpQuad(ls), period).
        Xs_ = X if Xs is None else Xs
        diff = X[:, None, :] - Xs_[None, :, :]
        sin2 = jnp.sin(jnp.pi * diff / period) ** 2
        return jnp.exp(-0.5 * jnp.sum(sin2 / jnp.asarray(ls, floatX()) ** 2,
                                      axis=-1))

    def _diag(self, X, ls, period):
        return jnp.ones((X.shape[0],), dtype=floatX())

    def power_spectral_density_approx(self, J):
        """Coefficients of the HSGPPeriodic expansion (reference
        cov.py Periodic.power_spectral_density_approx): 2*I_j(1/l^2)/exp(1/l^2)
        with the j=0 term halved."""
        from jax.scipy.special import i0e, i1e

        def coeffs(ls):
            a = 1.0 / jnp.asarray(ls, floatX()) ** 2
            js = jnp.arange(J)
            # modified Bessel I_j(a) via recurrence from i0/i1 (stable scaled)
            i0 = i0e(a)
            i1 = i1e(a)
            vals = [i0, i1]
            for j in range(2, J):
                vals.append(jnp.maximum(vals[j - 2] - 2 * (j - 1) / a * vals[j - 1],
                                        1e-30))
            iv = jnp.stack(vals[:J])
            c = 2.0 * iv  # scaled by exp(-a) already via i*e
            return c.at[0].set(c[0] / 2.0)

        return apply(coeffs, self.ls)


class Linear(Covariance):
    def __init__(self, input_dim, c, active_dims=None):
        super().__init__(input_dim, active_dims)
        self.c = c

    def _param_list(self):
        return [self.c]

    def _full(self, X, Xs, c):
        Xc = X - c
        Xsc = Xc if Xs is None else Xs - c
        return Xc @ Xsc.T

    def _diag(self, X, c):
        return jnp.sum((X - c) ** 2, axis=-1)


class Polynomial(Linear):
    def __init__(self, input_dim, c, d, offset, active_dims=None):
        super().__init__(input_dim, c, active_dims)
        self.d = d
        self.offset = offset

    def _param_list(self):
        return [self.c, self.d, self.offset]

    def _full(self, X, Xs, c, d, offset):
        lin = super()._full(X, Xs, c)
        return (lin + offset) ** d

    def _diag(self, X, c, d, offset):
        return (jnp.sum((X - c) ** 2, axis=-1) + offset) ** d


class WarpedInput(Covariance):
    """k(w(x), w(x')) (reference cov.py WarpedInput)."""

    def __init__(self, input_dim, cov_func, warp_func, args=None,
                 active_dims=None):
        super().__init__(input_dim, active_dims)
        self.cov_func = cov_func
        self.warp_func = warp_func
        self.args = args if args is not None else ()

    def full(self, X, Xs=None):
        Xw = apply(lambda x, *a: self.warp_func(x, *a), X, *self.args)
        Xsw = (
            apply(lambda x, *a: self.warp_func(x, *a), Xs, *self.args)
            if Xs is not None else None
        )
        return self.cov_func.full(Xw, Xsw)

    def diag(self, X):
        Xw = apply(lambda x, *a: self.warp_func(x, *a), X, *self.args)
        return self.cov_func.diag(Xw)


class Gibbs(Covariance):
    """Non-stationary varying-lengthscale kernel (reference cov.py Gibbs)."""

    def __init__(self, input_dim, lengthscale_func, args=None,
                 active_dims=None):
        super().__init__(input_dim, active_dims)
        self.lfunc = lengthscale_func
        self.args = args if args is not None else ()

    def full(self, X, Xs=None):
        def _k(Xc, *a):
            x = self._slice(Xc)
            rx = jnp.ravel(self.lfunc(jnp.ravel(x), *a))
            return x, rx

        def k_full(Xc, Xsc, *a):
            x = self._slice(Xc)
            rx = jnp.ravel(self.lfunc(jnp.ravel(x), *a))
            if Xsc is None:
                xs, rz = x, rx
            else:
                xs = self._slice(Xsc)
                rz = jnp.ravel(self.lfunc(jnp.ravel(xs), *a))
            rx2 = rx[:, None] ** 2
            rz2 = rz[None, :] ** 2
            sq = (x[:, None, 0] - xs[None, :, 0]) ** 2
            coef = jnp.sqrt(2.0 * rx[:, None] * rz[None, :] / (rx2 + rz2))
            return coef * jnp.exp(-sq / (rx2 + rz2))

        if Xs is None:
            return apply(lambda Xc, *a: k_full(Xc, None, *a), X, *self.args)
        return apply(k_full, X, Xs, *self.args)

    def diag(self, X):
        return apply(lambda Xc: jnp.ones((jnp.asarray(Xc).shape[0],),
                                         dtype=floatX()), X)


class ScaledCov(Covariance):
    """phi(x) k(x,x') phi(x') (reference cov.py ScaledCov)."""

    def __init__(self, input_dim, cov_func, scaling_func, args=None,
                 active_dims=None):
        super().__init__(input_dim, active_dims)
        self.cov_func = cov_func
        self.sfunc = scaling_func
        self.args = args if args is not None else ()

    def full(self, X, Xs=None):
        K = self.cov_func.full(X, Xs)

        def scale(k, Xc, Xsc, *a):
            sx = jnp.ravel(self.sfunc(self._slice(Xc), *a))
            sz = sx if Xsc is None else jnp.ravel(self.sfunc(self._slice(Xsc), *a))
            return sx[:, None] * k * sz[None, :]

        if Xs is None:
            return apply(lambda k, Xc, *a: scale(k, Xc, None, *a), K, X, *self.args)
        return apply(scale, K, X, Xs, *self.args)

    def diag(self, X):
        d = self.cov_func.diag(X)
        return apply(
            lambda dd, Xc, *a: jnp.ravel(self.sfunc(self._slice(Xc), *a)) ** 2 * dd,
            d, X, *self.args,
        )


class Coregion(Covariance):
    """B[i, j] lookup kernel for multi-output GPs (reference cov.py Coregion)."""

    def __init__(self, input_dim, W=None, kappa=None, B=None, active_dims=None):
        super().__init__(input_dim, active_dims)
        if len(self.active_dims) != 1:
            raise ValueError(
                "Coregion requires exactly one active dimension (the "
                "integer output-index column); pass active_dims=[i]"
            )
        if B is None:
            if W is None or kappa is None:
                raise ValueError("Coregion requires B or (W, kappa)")
            self.W, self.kappa, self.B = W, kappa, None
        else:
            if W is not None or kappa is not None:
                raise ValueError("Coregion takes either B or (W, kappa), not both")
            self.B = B
            self.W = self.kappa = None

    def _param_list(self):
        if self.B is not None:
            return [self.B]
        return [self.W, self.kappa]

    def _full(self, X, Xs, *params):
        if self.B is not None:
            B = params[0]
        else:
            W, kappa = params
            B = W @ W.T + jnp.diag(kappa)
        i = jnp.asarray(X[:, 0], jnp.int32)
        j = i if Xs is None else jnp.asarray(Xs[:, 0], jnp.int32)
        return B[jnp.ix_(i, j)]

    def _diag(self, X, *params):
        if self.B is not None:
            B = params[0]
        else:
            W, kappa = params
            B = W @ W.T + jnp.diag(kappa)
        i = jnp.asarray(X[:, 0], jnp.int32)
        return jnp.diagonal(B)[i]


class Kron(Covariance):
    """Kronecker product over input blocks (reference cov.py Kron)."""

    def __init__(self, factor_list):
        self.factors = list(factor_list)
        super().__init__(sum(f.input_dim for f in self.factors))

    def _apply(self, X, Xs=None, diag=False):
        # split X's columns into each factor's input block and take the
        # ELEMENTWISE product of the factor kernels (reference cov.py Kron
        # __call__: reduce(mul, covs)) — on a cartesian-product grid this
        # equals the Kronecker-product Gram matrix
        out = None
        off = 0
        for f in self.factors:
            cols = slice(off, off + f.input_dim)
            Xf = apply(lambda x, c=cols: jnp.asarray(x)[:, c], X)
            Xsf = (
                apply(lambda x, c=cols: jnp.asarray(x)[:, c], Xs)
                if Xs is not None else None
            )
            Kf = f.diag(Xf) if diag else f.full(Xf, Xsf)
            out = Kf if out is None else apply(lambda a, b: a * b, out, Kf)
            off += f.input_dim
        return out

    def full(self, X, Xs=None):
        return self._apply(X, Xs, diag=False)

    def diag(self, X):
        return self._apply(X, diag=True)


class Exponentiated(Covariance):
    """kernel ** power (reference cov.py:337)."""

    def __init__(self, kernel, power):
        super().__init__(kernel.input_dim, kernel.active_dims)
        self.kernel = kernel
        self.power = power

    def full(self, X, Xs=None):
        return apply(lambda k, p: k**p, self.kernel.full(X, Xs), self.power)

    def diag(self, X):
        return apply(lambda k, p: k**p, self.kernel.diag(X), self.power)


class Circular(Covariance):
    """Weinland-function kernel on a circular domain [0, period)
    (reference cov.py:432; Padonou & Roustant 2015). 1-D."""

    def __init__(self, input_dim, period, tau=4, active_dims=None):
        super().__init__(input_dim, active_dims)
        self.period = period
        self.tau = tau

    def _param_list(self):
        return [self.period, self.tau]

    def _full(self, X, Xs, period, tau):
        Xs_ = X if Xs is None else Xs
        c = jnp.asarray(period, floatX()) / 2.0
        d = X[:, None, 0] - Xs_[None, :, 0]
        t = jnp.abs((d + c) % (2.0 * c) - c)
        return (1.0 + tau * t / c) * jnp.clip(1.0 - t / c, 0.0, jnp.inf) ** tau

    def _diag(self, X, period, tau):
        return jnp.ones((X.shape[0],), dtype=floatX())


class WrappedPeriodic(Covariance):
    """Periodic version of any stationary kernel: inputs warped by
    sin(pi (x-x') / period) (reference cov.py:976; MacKay 1998)."""

    def __init__(self, cov_func, period):
        if not isinstance(cov_func, _Stationary):
            raise TypeError("cov_func must be a Stationary covariance")
        super().__init__(cov_func.input_dim, cov_func.active_dims)
        self.cov_func = cov_func
        self.period = period

    def _param_list(self):
        return [self.cov_func.ls, self.period]

    def _full(self, X, Xs, ls, period):
        Xs_ = X if Xs is None else Xs
        diff = X[:, None, :] - Xs_[None, :, :]
        r = jnp.pi * diff / jnp.asarray(period, floatX())
        r2 = jnp.sum(
            (jnp.sin(r) / jnp.asarray(ls, floatX())) ** 2, axis=-1
        )
        k = self.cov_func
        if isinstance(k, ExpQuad):
            return jnp.exp(-0.5 * r2)
        if isinstance(k, RatQuad):
            alpha = k.alpha
            return (1.0 + r2 / (2.0 * alpha)) ** (-alpha)
        if isinstance(k, _Matern):
            rr = jnp.sqrt(r2 + 1e-12)
            if k.nu == 2.5:
                s = jnp.sqrt(5.0) * rr
                return (1.0 + s + 5.0 / 3.0 * r2) * jnp.exp(-s)
            if k.nu == 1.5:
                s = jnp.sqrt(3.0) * rr
                return (1.0 + s) * jnp.exp(-s)
            return jnp.exp(-rr)
        raise NotImplementedError(
            f"WrappedPeriodic does not support {type(k).__name__}"
        )

    def _diag(self, X, ls, period):
        return jnp.ones((X.shape[0],), dtype=floatX())


# public aliases matching the reference's class names (the algebra normally
# comes from +, *, ** operators; reference cov.py exposes the classes)
Stationary = _Stationary
Combination = _Binary
Add = _Add
Prod = _Prod
