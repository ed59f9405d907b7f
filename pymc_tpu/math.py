"""Node-aware math API.

Parity with reference pymc/math.py (logit/invlogit, probit/invprobit,
logsumexp, logaddexp, logdiffexp, log1mexp, kronecker, cartesian,
expand_packed_triangular, batched_diag, logdet, ...) — every function accepts
symbolic Nodes or concrete arrays and stays a pure-JAX trace.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy import special as jsp_special
from jax.scipy.special import logsumexp as _logsumexp

from .graph import apply, as_node, is_node

__all__ = [
    # elementwise
    "abs", "exp", "log", "log1p", "log2", "log10", "sqrt", "cbrt", "square",
    "sgn", "sign", "ceil", "floor", "round", "trunc",
    "sin", "cos", "tan", "arcsin", "arccos", "arctan", "arctan2",
    "sinh", "cosh", "tanh", "arcsinh", "arccosh", "arctanh",
    "erf", "erfc", "erfinv", "erfcinv",
    "sigmoid", "invlogit", "logit", "probit", "invprobit", "softmax",
    "log_softmax", "logsumexp", "logaddexp", "logdiffexp", "log1mexp",
    "expm1", "exprel", "softplus", "log1pexp",
    # reductions / linalg
    "sum", "prod", "mean", "maximum", "minimum", "max", "min", "dot",
    "matmul", "outer", "tensordot", "norm",
    "kronecker", "kron_dot", "kron_diag", "cartesian", "flat_outer",
    "expand_packed_triangular", "batched_diag", "block_diagonal", "logdet",
    "matrix_inverse", "extract_diag",
    # structural
    "where", "switch", "clip", "concatenate", "stack", "full", "full_like",
    "ones_like", "zeros_like", "eq", "neq", "lt", "gt", "le", "ge",
    "and_", "or_", "cumsum", "cumprod", "diff", "constant", "floatX",
]


def _wrap(fn):
    @functools.wraps(fn)
    def inner(*args, **kwargs):
        node_args = [a for a in args]
        if not kwargs:
            # kwarg-free call: pass fn itself so derived-density pattern
            # matching (distributions/transformed.py) can recognize the op
            return apply(fn, *node_args)
        return apply(lambda *xs: fn(*xs, **kwargs), *node_args)

    return inner


# elementwise
abs = _wrap(jnp.abs)
exp = _wrap(jnp.exp)
log = _wrap(jnp.log)
log1p = _wrap(jnp.log1p)
log2 = _wrap(jnp.log2)
log10 = _wrap(jnp.log10)
sqrt = _wrap(jnp.sqrt)
cbrt = _wrap(jnp.cbrt)
square = _wrap(jnp.square)
sgn = _wrap(jnp.sign)
sign = _wrap(jnp.sign)
ceil = _wrap(jnp.ceil)
floor = _wrap(jnp.floor)
round = _wrap(jnp.round)
trunc = _wrap(jnp.trunc)
sin = _wrap(jnp.sin)
cos = _wrap(jnp.cos)
tan = _wrap(jnp.tan)
arcsin = _wrap(jnp.arcsin)
arccos = _wrap(jnp.arccos)
arctan = _wrap(jnp.arctan)
arctan2 = _wrap(jnp.arctan2)
sinh = _wrap(jnp.sinh)
cosh = _wrap(jnp.cosh)
tanh = _wrap(jnp.tanh)
arcsinh = _wrap(jnp.arcsinh)
arccosh = _wrap(jnp.arccosh)
arctanh = _wrap(jnp.arctanh)
erf = _wrap(jsp_special.erf)
erfc = _wrap(jsp_special.erfc)
erfinv = _wrap(jsp_special.erfinv)
expm1 = _wrap(jnp.expm1)


def _erfcinv_jax(v):
    # module-level named impl so derived-density matching can key on it
    return jsp_special.erfinv(1.0 - v)


def erfcinv(x):
    return apply(_erfcinv_jax, x)


sigmoid = _wrap(jax.nn.sigmoid)
invlogit = sigmoid
logit = _wrap(jsp_special.logit)


def probit(x):
    """Inverse of standard normal CDF."""
    return apply(jsp_special.ndtri, x)


def invprobit(x):
    """Standard normal CDF."""
    return apply(jsp_special.ndtr, x)


softmax = _wrap(jax.nn.softmax)
log_softmax = _wrap(jax.nn.log_softmax)
softplus = _wrap(jax.nn.softplus)
log1pexp = softplus


def logsumexp(x, axis=None, keepdims=False):
    return apply(lambda v: _logsumexp(v, axis=axis, keepdims=keepdims), x)


logaddexp = _wrap(jnp.logaddexp)


def logdiffexp(a, b):
    """log(e^a - e^b). b > a gives NaN (log of a negative number — the
    reference contract, tests/test_math.py logdiffexp); a == b == -inf
    gives -inf."""
    def _ldx(x, y):
        res = x + _log1mexp_jax(y - x)
        res = jnp.where(jnp.isneginf(x) & jnp.isneginf(y), -jnp.inf, res)
        return jnp.where(y > x, jnp.nan, res)

    return apply(_ldx, a, b)


def _log1mexp_jax(x):
    # log(1 - exp(x)) for x <= 0, numerically stable (Maechler 2012)
    x = jnp.minimum(x, 0.0)
    return jnp.where(
        x > -0.6931471805599453,  # -log(2)
        jnp.log(-jnp.expm1(x)),
        jnp.log1p(-jnp.exp(x)),
    )


def log1mexp(x):
    """log(1 - exp(x)) for x <= 0 (reference pymc/math.py:412 convention)."""
    return apply(_log1mexp_jax, x)


def exprel(x):
    """(exp(x)-1)/x with the x→0 limit handled."""
    def _f(v):
        small = jnp.abs(v) < 1e-8
        safe = jnp.where(small, 1.0, v)
        return jnp.where(small, 1.0 + v / 2.0, jnp.expm1(safe) / safe)

    return apply(_f, x)


# reductions / linalg
def sum(x, axis=None, keepdims=False):  # noqa: A001
    fn = lambda v: jnp.sum(v, axis=axis, keepdims=keepdims)  # noqa: E731
    # sum-of-normals measurability marker (distributions/transformed.py):
    # pm.logp(pm.math.sum(normal_rv, axis), v) derives the closed-form
    # Normal(sum mu, sqrt(sum sigma^2)) density (reference
    # logprob/arithmetic.py sum_of_normals)
    fn._measurable_reduction = ("sum", axis, keepdims)
    return apply(fn, x)


def prod(x, axis=None, keepdims=False):
    return apply(lambda v: jnp.prod(v, axis=axis, keepdims=keepdims), x)


def mean(x, axis=None, keepdims=False):
    return apply(lambda v: jnp.mean(v, axis=axis, keepdims=keepdims), x)


def max(x, axis=None, keepdims=False):  # noqa: A001
    fn = lambda v: jnp.max(v, axis=axis, keepdims=keepdims)  # noqa: E731
    # order-statistic measurability marker (distributions/transformed.py):
    # pm.logp(pm.math.max(rv), v) derives the iid-max density
    fn._measurable_reduction = ("max", axis, keepdims)
    return apply(fn, x)


def min(x, axis=None, keepdims=False):  # noqa: A001
    fn = lambda v: jnp.min(v, axis=axis, keepdims=keepdims)  # noqa: E731
    fn._measurable_reduction = ("min", axis, keepdims)
    return apply(fn, x)


maximum = _wrap(jnp.maximum)
minimum = _wrap(jnp.minimum)
dot = _wrap(jnp.dot)
matmul = _wrap(jnp.matmul)
outer = _wrap(jnp.outer)


def tensordot(a, b, axes=2):
    return apply(lambda x, y: jnp.tensordot(x, y, axes=axes), a, b)


def norm(x, ord=None, axis=None):
    return apply(lambda v: jnp.linalg.norm(v, ord=ord, axis=axis), x)


def kronecker(*Ks):
    """Kronecker product of a sequence of matrices (reference math.py:294)."""
    def _kron(*ms):
        out = ms[0]
        for m in ms[1:]:
            out = jnp.kron(out, m)
        return out

    return apply(_kron, *Ks)


def kron_dot(krons, m):
    """Efficient (K1 ⊗ K2 ⊗ ...) @ m without materializing the product
    (reference math.py:333 kron_matrix_op): reshape-multiply per factor."""
    def _kron_vec(mat, *ks):
        sizes = [k.shape[0] for k in ks]
        x = mat
        vec_in = x.ndim == 1
        if vec_in:
            x = x[:, None]
        ncols = x.shape[1]
        for i, k in enumerate(ks):
            # x has shape (prod(sizes), ncols); apply k along its block axis
            x = x.reshape(sizes[i], -1, ncols)
            x = jnp.einsum("ab,bcd->acd", k, x.reshape(sizes[i], -1, ncols))
            # rotate axes so next factor is leading
            x = jnp.moveaxis(x, 0, 1).reshape(-1, ncols)
        out = x
        return out[:, 0] if vec_in else out

    return apply(_kron_vec, m, *krons)


def kron_diag(*diags):
    """Diagonal of a kronecker product from component diagonals."""
    def _kdg(*ds):
        out = ds[0]
        for d in ds[1:]:
            out = (out[:, None] * d[None, :]).ravel()
        return out

    return apply(_kdg, *diags)


def cartesian(*arrays):
    """Cartesian product rows (reference math.py:315)."""
    def _cart(*arrs):
        # 2-D inputs contribute whole ROWS as units (reference semantics:
        # cartesian([[1,2],[3,4]], [5,6]) -> [[1,2,5],[1,2,6],...])
        arrs = [jnp.atleast_1d(a) for a in arrs]
        arrs = [a[:, None] if a.ndim == 1 else a for a in arrs]
        idx = jnp.meshgrid(
            *[jnp.arange(a.shape[0]) for a in arrs], indexing="ij"
        )
        return jnp.concatenate(
            [a[g.ravel()] for a, g in zip(arrs, idx)], axis=-1
        )

    return apply(_cart, *arrays)


def flat_outer(a, b):
    return apply(lambda x, y: jnp.outer(x, y).ravel(), a, b)


def expand_packed_triangular(n, packed, lower=True, diagonal_only=False):
    """Unpack a flat array of n*(n+1)/2 values into an (n, n) triangular matrix
    (reference math.py:444)."""
    def _expand(p):
        if diagonal_only:
            if lower:
                diag_idx = np.cumsum(np.arange(1, n + 1)) - 1
            else:
                diag_idx = np.concatenate([[0], np.cumsum(np.arange(n, 1, -1))])
            return p[..., diag_idx]
        out = jnp.zeros(p.shape[:-1] + (n, n), dtype=p.dtype)
        if lower:
            rows, cols = np.tril_indices(n)
        else:
            rows, cols = np.triu_indices(n)
        return out.at[..., rows, cols].set(p)

    return apply(_expand, packed)


def batched_diag(x):
    """Vector(s) -> diagonal matrices, or matrices -> diagonals
    (reference math.py:540 BatchedDiag)."""
    def _bd(v):
        if v.ndim >= 2 and v.shape[-1] == v.shape[-2]:
            return jnp.diagonal(v, axis1=-2, axis2=-1)
        eye = jnp.eye(v.shape[-1], dtype=v.dtype)
        return v[..., None] * eye

    return apply(_bd, x)


def block_diagonal(matrices):
    def _blk(*ms):
        return jax.scipy.linalg.block_diag(*ms)

    return apply(_blk, *matrices)


def logdet(m):
    """log|det M| for symmetric positive definite M (reference math.py:490 LogDet)."""
    return apply(lambda x: jnp.linalg.slogdet(x)[1], m)


def matrix_inverse(m):
    return apply(jnp.linalg.inv, m)


def extract_diag(m):
    return apply(lambda x: jnp.diagonal(x, axis1=-2, axis2=-1), m)


# structural
where = _wrap(jnp.where)
switch = _wrap(jnp.where)


def clip(x, lo, hi):
    return apply(jnp.clip, x, lo, hi)


def concatenate(xs, axis=0):
    fn = lambda *vs: jnp.concatenate(vs, axis=axis)
    # tag so derived-density pattern matching (distributions/transformed.py)
    # can recognize a measurable join of RVs
    fn._measurable_join = ("concatenate", axis)
    return apply(fn, *xs)


def stack(xs, axis=0):
    fn = lambda *vs: jnp.stack(vs, axis=axis)
    fn._measurable_join = ("stack", axis)
    return apply(fn, *xs)


def full(shape, fill_value, dtype=None):
    return apply(lambda v: jnp.full(shape, v, dtype=dtype), fill_value)


def full_like(x, fill_value):
    return apply(lambda v, f: jnp.full_like(v, f), x, fill_value)


def ones_like(x):
    return apply(jnp.ones_like, x)


def zeros_like(x):
    return apply(jnp.zeros_like, x)


eq = _wrap(jnp.equal)
neq = _wrap(jnp.not_equal)
lt = _wrap(jnp.less)
gt = _wrap(jnp.greater)
le = _wrap(jnp.less_equal)
ge = _wrap(jnp.greater_equal)
and_ = _wrap(jnp.logical_and)
or_ = _wrap(jnp.logical_or)


def cumsum(x, axis=None):
    fn = lambda v: jnp.cumsum(v, axis=axis)  # noqa: E731
    # measurability marker: pm.logp(cumsum(rv), v) derives the diff-transform
    # density (unit-triangular Jacobian; reference logprob/cumsum.py) via
    # distributions/transformed.py
    fn._measurable_cumsum = (axis,)
    return apply(fn, x)


def cumprod(x, axis=None):
    return apply(lambda v: jnp.cumprod(v, axis=axis), x)


def diff(x, n=1, axis=-1):
    return apply(lambda v: jnp.diff(v, n=n, axis=axis), x)


def constant(x, name=None):
    return as_node(jnp.asarray(x))


def floatX(x):
    from .config import as_floatx

    if is_node(x):
        return apply(as_floatx, x)
    return as_floatx(x)


# ---------------------------------------------------------------------------
# numpy-style passthroughs the reference re-exports from pytensor.tensor
# (pymc/math.py __all__). Node-aware via _wrap; pure-array inputs pass
# straight through to jnp/jax.scipy.

all = _wrap(jnp.all)
any = _wrap(jnp.any)
def argmax(x, axis=None):
    fn = lambda v: jnp.argmax(v, axis=axis)  # noqa: E731
    # competing-risks measurability marker: pm.logp(argmax(gumbel_rv), v)
    # derives the closed-form Categorical (distributions/transformed.py)
    fn._measurable_argext = ("max", axis)
    return apply(fn, x)


def argmin(x, axis=None):
    fn = lambda v: jnp.argmin(v, axis=axis)  # noqa: E731
    fn._measurable_argext = ("min", axis)
    return apply(fn, x)
argsort = _wrap(jnp.argsort)
broadcast_to = _wrap(jnp.broadcast_to)
diag = _wrap(jnp.diag)
expand_dims = _wrap(jnp.expand_dims)
flatten = _wrap(jnp.ravel)
moveaxis = _wrap(jnp.moveaxis)
repeat = _wrap(jnp.repeat)
reshape = _wrap(jnp.reshape)
sort = _wrap(jnp.sort)
sqr = _wrap(jnp.square)
squeeze = _wrap(jnp.squeeze)
std = _wrap(jnp.std)
swapaxes = _wrap(jnp.swapaxes)
take = _wrap(jnp.take)
tile = _wrap(jnp.tile)
trace = _wrap(jnp.trace)
transpose = _wrap(jnp.transpose)
tril = _wrap(jnp.tril)
triu = _wrap(jnp.triu)
unique = _wrap(jnp.unique)
var = _wrap(jnp.var)

# linalg
from .ops.linalg import cholesky_batched as _cholesky_batched
cholesky = _wrap(_cholesky_batched)
det = _wrap(jnp.linalg.det)
slogdet = _wrap(jnp.linalg.slogdet)
eigh = _wrap(jnp.linalg.eigh)
solve = _wrap(jnp.linalg.solve)
kron = _wrap(jnp.kron)


def solve_triangular(a, b, lower=False, **kw):
    from jax.scipy.linalg import solve_triangular as _st

    return apply(lambda A, B: _st(A, B, lower=lower), a, b)


def cho_solve(c_and_lower, b, **kw):
    from jax.scipy.linalg import cho_solve as _cs

    c, lower = c_and_lower
    return apply(lambda C, B: _cs((C, lower), B), c, b)


def block_diag(*mats):
    from jax.scipy.linalg import block_diag as _bd

    return apply(_bd, *mats)


def kron_solve_lower(chols, b):
    """Solve (kron of lower-tri cholesky factors) x = b (reference
    math.py kron_solve_lower via kron_matrix_op)."""
    return _kron_matrix_op(
        chols, b, lambda L, x: solve_triangular(L, x, lower=True)
    )


def kron_solve_upper(chols, b):
    return _kron_matrix_op(
        chols, b,
        lambda L, x: solve_triangular(swapaxes(L, -1, -2), x, lower=False),
    )


def _kron_matrix_op(mats, b, op):
    """Apply op(m, .) for each Kronecker factor without forming the full
    Kronecker product (standard vec-trick recursion)."""
    def _run(ms, x):
        total = 1
        for m_ in ms:
            total *= m_.shape[-1]
        x = jnp.reshape(x, (total, -1))
        for m_ in ms:
            n = m_.shape[-1]
            x = jnp.reshape(x, (n, -1))
            x = op(m_, x)
            x = jnp.reshape(jnp.swapaxes(jnp.reshape(x, (n, -1)), 0, 1),
                            (-1,))
            x = jnp.reshape(x, (total, -1))
        return x

    return apply(lambda *xs: _run(list(xs[:-1]), xs[-1]), *mats, b)


# scipy special
gammaln = _wrap(jsp_special.gammaln)
digamma = _wrap(jsp_special.digamma)
polygamma = _wrap(jsp_special.polygamma)
betainc = _wrap(jsp_special.betainc)
gammainc = _wrap(jsp_special.gammainc)
gammaincc = _wrap(jsp_special.gammaincc)
i0 = _wrap(jsp_special.i0)
i1 = _wrap(jsp_special.i1)


def iv(v, x):
    """Modified Bessel of the first kind (integer/half orders via i0/i1 or
    the series; reference re-exports scipy's)."""
    from .ops.special import bessel_iv

    return apply(bessel_iv, v, x)


def kv(v, x):
    from .ops.special import bessel_kv

    return apply(bessel_kv, v, x)


def gamma(x):
    return apply(lambda v: jnp.exp(jsp_special.gammaln(v)) * _gamma_sign(v),
                 x)


def _gamma_sign(v):
    # gamma(x) sign for real x: negative on intervals (-2k-1, -2k)
    neg = (v < 0) & (jnp.floor(v) % 2 == 1)
    return jnp.where(neg, -1.0, 1.0)


def logbern(log_p, rng_key):
    """Bernoulli(exp(log_p)) draw in log space (reference math.py logbern
    semantics; here explicit-key functional RNG)."""
    u = jax.random.uniform(rng_key)
    return jnp.log(u) < log_p


# constructors (eager arrays — shapes are static under XLA)
zeros = jnp.zeros
ones = jnp.ones
eye = jnp.eye
arange = jnp.arange
linspace = jnp.linspace
broadcast_arrays = jnp.broadcast_arrays


def as_tensor(x, *args, **kwargs):
    """Reference `pt.as_tensor` — here: pass Nodes through, lift everything
    else to a jnp array."""
    return x if is_node(x) else jnp.asarray(x)


as_tensor_variable = as_tensor


def flatten_list(tensors):
    return concatenate([flatten(t) for t in tensors])


__all__ += [
    "all", "any", "argmax", "argmin", "argsort", "arange", "as_tensor",
    "as_tensor_variable", "betainc", "block_diag", "broadcast_arrays",
    "broadcast_to", "cho_solve", "cholesky", "det", "diag", "digamma",
    "eigh", "expand_dims", "eye", "flatten", "flatten_list", "gamma",
    "gammainc", "gammaincc", "gammaln", "i0", "i1", "iv", "kron",
    "kron_solve_lower", "kron_solve_upper", "kv", "linspace", "logbern",
    "moveaxis", "ones", "polygamma", "repeat", "reshape", "slogdet",
    "solve", "solve_triangular", "sort", "sqr", "squeeze", "std",
    "swapaxes", "take", "tile", "trace", "transpose", "tril", "triu",
    "unique", "var", "zeros",
]
