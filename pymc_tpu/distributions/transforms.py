"""Value-space transforms (bijectors).

Parity: reference pymc/logprob/transforms.py:142 (Transform ABC: forward,
backward, log_jac_det) + pymc/distributions/transforms.py (LogExpM1, Ordered,
SumTo1, Interval, ZeroSumTransform, CholeskyCov, Circular, Simplex, LogOdds).

Convention (same as the reference): the *value variable* a sampler sees lives
in UNCONSTRAINED space. `forward` maps constrained -> unconstrained,
`backward` maps unconstrained -> constrained, and `log_jac_det(v)` is
log|det d backward(v) / dv| evaluated at the unconstrained value `v`. The
model logp is  logp(dist, backward(v)) + log_jac_det(v).

Transforms are pure JAX; parameterized transforms (Interval bounds) may hold
symbolic Nodes, resolved through the evaluation env.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..graph import evaluate

__all__ = [
    "Transform",
    "LogTransform",
    "LogOddsTransform",
    "IntervalTransform",
    "SimplexTransform",
    "OrderedTransform",
    "SumTo1Transform",
    "LogExpM1Transform",
    "CircularTransform",
    "ZeroSumTransform",
    "CholeskyCovPackedTransform",
    "CholeskyCovTransform",
    "CholeskyCorrTransform",
    "ChainedTransform",
    "log",
    "logodds",
    "simplex",
    "ordered",
    "sum_to_1",
    "log_exp_m1",
    "circular",
]


class Transform:
    name: str = "transform"
    #: number of trailing constrained-space dims the transform treats as one
    #: core/event block (0 = elementwise). Model.register_rv rejects a
    #: transform whose event_ndim is smaller than the distribution's
    #: event_ndim (reference logprob/transform_value.py raises
    #: "Univariate transform ... cannot be applied to multivariate").
    event_ndim: int = 0

    def forward(self, x, env=None):
        raise NotImplementedError

    def backward(self, v, env=None):
        raise NotImplementedError

    def log_jac_det(self, v, env=None):
        """log|det ∂backward/∂v|. Default: autodiff (works for elementwise)."""
        return jnp.log(jnp.abs(jax.vmap(jax.grad(lambda u: self.backward(u, env)))(
            jnp.ravel(v)
        ))).reshape(jnp.shape(v))

    def value_shape(self, shape):
        """Shape of the unconstrained value for a constrained var of `shape`."""
        return tuple(shape)

    def constrained_shape(self, value_shape):
        return tuple(value_shape)

    def __repr__(self):
        return f"{type(self).__name__}()"


class LogTransform(Transform):
    name = "log"

    def forward(self, x, env=None):
        return jnp.log(x)

    def backward(self, v, env=None):
        return jnp.exp(v)

    def log_jac_det(self, v, env=None):
        return v


class LogOddsTransform(Transform):
    name = "logodds"

    def forward(self, x, env=None):
        return jnp.log(x) - jnp.log1p(-x)

    def backward(self, v, env=None):
        return jax.nn.sigmoid(v)

    def log_jac_det(self, v, env=None):
        return -jax.nn.softplus(-v) - jax.nn.softplus(v)


class IntervalTransform(Transform):
    """Interval (lower, upper); either bound may be None (half-open).

    Parity: pymc/distributions/transforms.py:559 Interval.
    """

    name = "interval"

    def __init__(self, lower=None, upper=None):
        if lower is None and upper is None:
            raise ValueError(
                "Lower and upper interval bounds cannot both be None"
            )
        self.lower = lower
        self.upper = upper

    def _bounds(self, env):
        lo = evaluate(self.lower, env) if self.lower is not None else None
        hi = evaluate(self.upper, env) if self.upper is not None else None
        return lo, hi

    def forward(self, x, env=None):
        lo, hi = self._bounds(env)
        if lo is not None and hi is not None:
            return jnp.log(x - lo) - jnp.log(hi - x)
        if lo is not None:
            return jnp.log(x - lo)
        if hi is not None:
            return jnp.log(hi - x)
        return x

    def backward(self, v, env=None):
        lo, hi = self._bounds(env)
        if lo is not None and hi is not None:
            # convex combination (NOT lo + (hi-lo)*s): its rounding error
            # scales with the bound magnitudes, not the interval width, so a
            # saturated sigmoid lands exactly ON the bound instead of
            # overshooting by (hi-lo)*ulp — an initval one ulp inside a tiny
            # bound must keep a finite logp (reference Interval.backward).
            s = jax.nn.sigmoid(v)
            return s * hi + (1.0 - s) * lo
        if lo is not None:
            return lo + jnp.exp(v)
        if hi is not None:
            return hi - jnp.exp(v)
        return v

    def log_jac_det(self, v, env=None):
        lo, hi = self._bounds(env)
        if lo is not None and hi is not None:
            return (
                jnp.log(hi - lo) - jax.nn.softplus(-v) - jax.nn.softplus(v)
            )
        if lo is None and hi is None:
            return jnp.zeros_like(v)
        return v


class SimplexTransform(Transform):
    """Stick-breaking: simplex of K -> R^{K-1}.

    Parity: pymc/distributions/transforms.py (SimplexTransform via logprob
    transforms) / Stan reference manual stick-breaking.
    """
    event_ndim = 1

    name = "simplex"

    def forward(self, x, env=None):
        K = x.shape[-1]
        x0 = x[..., :-1]
        rem = 1.0 - jnp.cumsum(x0, axis=-1)
        rem = jnp.concatenate(
            [jnp.ones_like(x[..., :1]), rem[..., :-1]], axis=-1
        )
        z = x0 / rem
        ks = jnp.arange(K - 1, dtype=x.dtype)
        return jnp.log(z) - jnp.log1p(-z) + jnp.log(K - 1.0 - ks)

    def backward(self, v, env=None):
        K = v.shape[-1] + 1
        ks = jnp.arange(K - 1, dtype=v.dtype)
        z = jax.nn.sigmoid(v - jnp.log(K - 1.0 - ks))
        # stick breaking
        zl = jnp.concatenate([z, jnp.ones_like(v[..., :1])], axis=-1)
        one_minus = jnp.cumprod(1.0 - z, axis=-1)
        lower = jnp.concatenate(
            [jnp.ones_like(v[..., :1]), one_minus], axis=-1
        )
        return zl * lower

    def log_jac_det(self, v, env=None):
        K = v.shape[-1] + 1
        ks = jnp.arange(K - 1, dtype=v.dtype)
        adj = v - jnp.log(K - 1.0 - ks)
        z = jax.nn.sigmoid(adj)
        one_minus = jnp.cumprod(1.0 - z, axis=-1)
        lower = jnp.concatenate(
            [jnp.ones_like(v[..., :1]), one_minus[..., :-1]], axis=-1
        )
        # d x_k / d v_k = lower_k * z_k * (1 - z_k)
        return jnp.sum(
            jnp.log(lower) - jax.nn.softplus(-adj) - jax.nn.softplus(adj),
            axis=-1,
        )

    def value_shape(self, shape):
        return tuple(shape[:-1]) + (shape[-1] - 1,)

    def constrained_shape(self, value_shape):
        return tuple(value_shape[:-1]) + (value_shape[-1] + 1,)


class OrderedTransform(Transform):
    """Monotone-increasing vector (reference transforms.py:79 Ordered).

    backward: x_0 = v_0, x_k = x_{k-1} + exp(v_k).
    """
    event_ndim = 1

    name = "ordered"

    def __init__(self, positive=False, ascending=True):
        self.positive = positive
        self.ascending = ascending

    def forward(self, x, env=None):
        if not self.ascending:
            x = x[..., ::-1]
        y0 = jnp.log(x[..., :1]) if self.positive else x[..., :1]
        yk = jnp.log(jnp.diff(x, axis=-1))
        return jnp.concatenate([y0, yk], axis=-1)

    def backward(self, v, env=None):
        x0 = jnp.exp(v[..., :1]) if self.positive else v[..., :1]
        xk = jnp.exp(v[..., 1:])
        x = jnp.cumsum(jnp.concatenate([x0, xk], axis=-1), axis=-1)
        if not self.ascending:
            x = x[..., ::-1]
        return x

    def log_jac_det(self, v, env=None):
        if self.positive:
            return jnp.sum(v, axis=-1)
        return jnp.sum(v[..., 1:], axis=-1)


class SumTo1Transform(Transform):
    """Vector summing to 1 (not necessarily positive); drops last component.

    Parity: pymc/distributions/transforms.py:123 SumTo1.
    """
    event_ndim = 1

    name = "sumto1"

    def forward(self, x, env=None):
        return x[..., :-1]

    def backward(self, v, env=None):
        rem = 1.0 - jnp.sum(v, axis=-1, keepdims=True)
        return jnp.concatenate([v, rem], axis=-1)

    def log_jac_det(self, v, env=None):
        return jnp.zeros(v.shape[:-1], dtype=v.dtype)

    def value_shape(self, shape):
        return tuple(shape[:-1]) + (shape[-1] - 1,)

    def constrained_shape(self, value_shape):
        return tuple(value_shape[:-1]) + (value_shape[-1] + 1,)


class LogExpM1Transform(Transform):
    """Softplus transform (reference transforms.py:60 LogExpM1)."""

    name = "log_exp_m1"

    def forward(self, x, env=None):
        # log(exp(x) - 1)
        return x + jnp.log1p(-jnp.exp(-x))

    def backward(self, v, env=None):
        return jax.nn.softplus(v)

    def log_jac_det(self, v, env=None):
        return -jax.nn.softplus(-v)


class CircularTransform(Transform):
    """Angle in (-pi, pi] — identity map with zero Jacobian; samplers wrap.

    Parity: pymc/distributions/transforms.py (CircularTransform).
    """

    name = "circular"

    def forward(self, x, env=None):
        return jnp.arctan2(jnp.sin(x), jnp.cos(x))

    def backward(self, v, env=None):
        return jnp.arctan2(jnp.sin(v), jnp.cos(v))

    def log_jac_det(self, v, env=None):
        return jnp.zeros_like(v)


class ZeroSumTransform(Transform):
    """Isometric map between R^{n-1} values and zero-sum R^n vectors along the
    trailing `n_zerosum_axes` axes (reference transforms.py:644 ZeroSumTransform).
    Uses the Householder reflection trick; |det| = 1 on the subspace.
    """

    name = "zerosum"

    def __init__(self, n_zerosum_axes=1):
        self.n_zerosum_axes = int(n_zerosum_axes)
        self.event_ndim = int(n_zerosum_axes)

    @staticmethod
    def _extend_axis_rev(x, axis):
        # zero-sum R^n -> R^{n-1} (reference transforms.py extend_axis_rev)
        n = x.shape[axis]
        nf = float(n)
        slc_last = [slice(None)] * x.ndim
        slc_last[axis] = slice(-1, None)
        last = x[tuple(slc_last)]
        sum_vals = -last * jnp.sqrt(nf)
        norm = sum_vals / (jnp.sqrt(nf) + nf)
        slc = [slice(None)] * x.ndim
        slc[axis] = slice(None, -1)
        return x[tuple(slc)] + norm

    @staticmethod
    def _extend_axis(v, axis):
        # R^{n-1} -> zero-sum R^n (reference transforms.py extend_axis)
        n = v.shape[axis] + 1
        nf = float(n)
        sum_v = jnp.sum(v, axis=axis, keepdims=True)
        norm = sum_v / (jnp.sqrt(nf) + nf)
        fill = norm - sum_v / jnp.sqrt(nf)
        out = jnp.concatenate([v, fill], axis=axis)
        return out - norm

    def forward(self, x, env=None):
        v = x
        for i in range(self.n_zerosum_axes):
            v = self._extend_axis_rev(v, axis=-(i + 1))
        return v

    def backward(self, v, env=None):
        x = v
        for i in reversed(range(self.n_zerosum_axes)):
            x = self._extend_axis(x, axis=-(i + 1))
        return x

    def log_jac_det(self, v, env=None):
        shape = v.shape[: v.ndim - self.n_zerosum_axes]
        return jnp.zeros(shape, dtype=v.dtype)

    def value_shape(self, shape):
        shape = list(shape)
        for i in range(self.n_zerosum_axes):
            shape[-(i + 1)] -= 1
        return tuple(shape)

    def constrained_shape(self, value_shape):
        shape = list(value_shape)
        for i in range(self.n_zerosum_axes):
            shape[-(i + 1)] += 1
        return tuple(shape)


class CholeskyCovPackedTransform(Transform):
    """Packed lower-triangular Cholesky factor: log-transform the diagonal
    entries of the packed vector (reference transforms.py:456 CholeskyCovPacked).
    """
    event_ndim = 1

    name = "cholesky-cov-packed"

    def __init__(self, n):
        self.n = int(n)
        self.diag_idxs = np.cumsum(np.arange(1, self.n + 1)) - 1

    def forward(self, x, env=None):
        return x.at[..., self.diag_idxs].set(jnp.log(x[..., self.diag_idxs]))

    def backward(self, v, env=None):
        return v.at[..., self.diag_idxs].set(jnp.exp(v[..., self.diag_idxs]))

    def log_jac_det(self, v, env=None):
        return jnp.sum(v[..., self.diag_idxs], axis=-1)


class CholeskyCovTransform(Transform):
    """SPD matrix (..., n, n) <-> unconstrained packed vector (..., n(n+1)/2)
    via the Cholesky factor with log-transformed diagonal (reference
    pymc/distributions/transforms.py CholeskyCovTransform, used as the
    default Wishart transform).

    log|det d backward/dv| combines the X = L L^T Jacobian
    (n log 2 + sum_i (n-i) log L_ii, 0-indexed rows contributing n-i ... )
    with the exp on the diagonal: total coefficient (n - i + 1) per
    0-indexed diagonal entry, plus n log 2.
    """
    event_ndim = 2

    name = "cholesky-cov"

    def __init__(self, n):
        self.n = int(n)
        self.tril_rows, self.tril_cols = np.tril_indices(self.n)
        self.diag_idxs = np.cumsum(np.arange(1, self.n + 1)) - 1

    def value_shape(self, shape):
        return tuple(shape[:-2]) + (self.n * (self.n + 1) // 2,)

    def constrained_shape(self, value_shape):
        return tuple(value_shape[:-1]) + (self.n, self.n)

    def forward(self, x, env=None):
        L = jnp.linalg.cholesky(x)
        packed = L[..., self.tril_rows, self.tril_cols]
        return packed.at[..., self.diag_idxs].set(
            jnp.log(packed[..., self.diag_idxs])
        )

    def _unpack(self, v):
        v = jnp.asarray(v)
        packed = v.at[..., self.diag_idxs].set(jnp.exp(v[..., self.diag_idxs]))
        L = jnp.zeros(v.shape[:-1] + (self.n, self.n), dtype=v.dtype)
        return L.at[..., self.tril_rows, self.tril_cols].set(packed)

    def backward(self, v, env=None):
        L = self._unpack(v)
        return jnp.einsum("...ij,...kj->...ik", L, L)

    def log_jac_det(self, v, env=None):
        n = self.n
        coeff = jnp.asarray(n - np.arange(n) + 1, dtype=v.dtype)
        return n * jnp.log(2.0) + jnp.sum(
            coeff * v[..., self.diag_idxs], axis=-1
        )


class CholeskyCorrTransform(Transform):
    """Unconstrained R^{n(n-1)/2} <-> lower Cholesky factor of a correlation
    matrix, via the canonical tanh/stereographic construction (Stan manual;
    reference pymc/distributions/transforms.py:145 CholeskyCorrTransform).

    Operates on the PACKED strictly-lower-triangular entries (row-major) of L.
    """
    event_ndim = 1

    name = "cholesky-corr"

    def __init__(self, n):
        self.n = int(n)
        self.tril_rows, self.tril_cols = np.tril_indices(self.n, k=-1)

    def _z_to_chol(self, z):
        # z: (..., m) canonical partial correlations in (-1, 1)
        n = self.n
        L = jnp.zeros(z.shape[:-1] + (n, n), dtype=z.dtype)
        L = L.at[..., 0, 0].set(1.0)
        idx = 0
        # iterative construction by row
        zs = {}
        for r, c in zip(self.tril_rows, self.tril_cols):
            zs[(r, c)] = z[..., idx]
            idx += 1
        for i in range(1, n):
            rem = jnp.ones(z.shape[:-1], dtype=z.dtype)
            for j in range(i):
                Lij = zs[(i, j)] * jnp.sqrt(rem)
                L = L.at[..., i, j].set(Lij)
                rem = rem - Lij**2
            L = L.at[..., i, i].set(jnp.sqrt(jnp.maximum(rem, 1e-30)))
        return L

    def backward(self, v, env=None):
        z = jnp.tanh(v)
        L = self._z_to_chol(z)
        return L[..., self.tril_rows, self.tril_cols]

    def forward(self, x, env=None):
        # x: packed strictly-lower entries of L; rebuild L, invert construction
        n = self.n
        L = jnp.zeros(x.shape[:-1] + (n, n), dtype=x.dtype)
        L = L.at[..., self.tril_rows, self.tril_cols].set(x)
        # diagonal from unit-row-norm property
        sq = jnp.sum(L**2, axis=-1)
        diag = jnp.sqrt(jnp.maximum(1.0 - sq, 1e-30))
        L = L + diag[..., None] * jnp.eye(n, dtype=x.dtype)
        zs = []
        for r, c in zip(self.tril_rows, self.tril_cols):
            rem = 1.0 - jnp.sum(L[..., r, :c] ** 2, axis=-1)
            zs.append(L[..., r, c] / jnp.sqrt(jnp.maximum(rem, 1e-30)))
        z = jnp.stack(zs, axis=-1)
        return jnp.arctanh(jnp.clip(z, -1 + 1e-12, 1 - 1e-12))

    def log_jac_det(self, v, env=None):
        # |dL/dz| * |dz/dv|; dz/dv = 1 - tanh^2
        z = jnp.tanh(v)
        ld = jnp.sum(jnp.log1p(-z**2), axis=-1)
        # dL_{ij}/dz_{ij} = sqrt(rem_{ij}); accumulate via construction
        idx = 0
        total = ld
        zs = {}
        for r, c in zip(self.tril_rows, self.tril_cols):
            zs[(r, c)] = z[..., idx]
            idx += 1
        for i in range(1, self.n):
            rem = jnp.ones(z.shape[:-1], dtype=z.dtype)
            for j in range(i):
                total = total + 0.5 * jnp.log(jnp.maximum(rem, 1e-30))
                Lij = zs[(i, j)] * jnp.sqrt(jnp.maximum(rem, 1e-30))
                rem = rem - Lij**2
        return total


class ChainedTransform(Transform):
    """Composition: applies transforms in order for forward (constrained ->
    unconstrained), reversed for backward."""

    name = "chain"

    def __init__(self, transforms):
        self.transforms = list(transforms)
        self.name = "chain_" + "_".join(t.name for t in self.transforms)
        self.event_ndim = max(
            (getattr(t, "event_ndim", 0) for t in self.transforms), default=0
        )

    def forward(self, x, env=None):
        for t in self.transforms:
            x = t.forward(x, env)
        return x

    def backward(self, v, env=None):
        for t in reversed(self.transforms):
            v = t.backward(v, env)
        return v

    def log_jac_det(self, v, env=None):
        # reference Chain.log_jac_det: reduce every component's correction to
        # the smallest ndim among them (vector components collapse the core
        # axis), preserving batch dims so elementwise per-variable logps and
        # batched RVs keep their shape.
        dets = []
        for t in reversed(self.transforms):
            dets.append(t.log_jac_det(v, env))
            v = t.backward(v, env)
        ndim0 = min(jnp.ndim(d) for d in dets)
        total = 0.0
        for d in dets:
            while jnp.ndim(d) > ndim0:
                d = jnp.sum(d, axis=-1)
            total = total + d
        return total

    def value_shape(self, shape):
        for t in self.transforms:
            shape = t.value_shape(shape)
        return tuple(shape)

    def constrained_shape(self, value_shape):
        for t in reversed(self.transforms):
            value_shape = t.constrained_shape(value_shape)
        return tuple(value_shape)


# canonical instances (reference exports similar singletons)
log = LogTransform()
logodds = LogOddsTransform()
simplex = SimplexTransform()
ordered = OrderedTransform()
sum_to_1 = SumTo1Transform()
log_exp_m1 = LogExpM1Transform()
circular = CircularTransform()


# reference public alias names (pymc/distributions/transforms.py __all__)
Chain = ChainedTransform
CholeskyCovPacked = CholeskyCovPackedTransform
Interval = IntervalTransform

__all__ += ["Chain", "CholeskyCovPacked", "Interval"]
