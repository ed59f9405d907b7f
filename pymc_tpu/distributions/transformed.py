"""Derived densities for invertible elementwise transforms of one RV.

Parity: reference pymc/logprob/transforms.py (MeasurableTransform rewrites
for exp/log/add/mul/div/pow/sqrt/cbrt/reciprocal/sinh/cosh-family/
sigmoid/logit/erf, transforms.py:387-900) and the user entrypoint
``pm.logp(pt.exp(rv), value)`` (logprob/basic.py:105).

The reference discovers measurable transforms by rewriting its graph IR.
Here the graph is a static Node DAG, so the same capability is a direct
pattern walk: ``dist_from_expression`` recognizes a chain of invertible
elementwise ops (``DeterministicNode(fn, args)`` with known ``fn``) whose
single random leaf is a FreeRV/ObservedRV and whose other operands are
RV-free, and builds a :class:`TransformedDistribution` implementing the
change-of-variables density

    logp_Y(y) = logp_X(g^{-1}(y)) + log|d g^{-1}/ dy|        (continuous)
    logp_Y(y) = logp_X(g^{-1}(y))                            (discrete)

logcdf/logccdf/icdf follow when every link has a determinate monotone
direction; sampling is the forward map of a base draw. Open-ended
expression measurability (multiple RV leaves, reductions, non-invertible
maps) stays out of scope by design (SURVEY §7 hard-part #2).
"""

from __future__ import annotations

import math as _pymath

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy import special as jsp

from ..graph import (
    DeterministicNode,
    FreeRV,
    Node,
    ObservedRV,
    evaluate,
    rv_ancestors,
)
from .distribution import Distribution

__all__ = ["TransformedDistribution", "dist_from_expression"]


class _Op:
    """One invertible elementwise link y = forward(x).

    ``const`` may be a Node (e.g. pm.Data) — it is resolved with the
    evaluation env at call time. ``monotone`` is +1 / -1 / None (unknown:
    logp works, cdf-family raises).
    """

    def __init__(self, name, forward, inverse, ljd_inv, monotone, const=None,
                 valid=None, safe=1.0):
        self.name = name
        self._forward = forward
        self._inverse = inverse
        self._ljd_inv = ljd_inv
        self._monotone = monotone
        self.const = const
        # image guard: values outside the op's image get logp -inf (the
        # reference transform rewrites propagate nan->-inf via
        # CheckParameterValue; we guard explicitly). ``safe`` is an in-image
        # point the clamped branch evaluates at so the -inf side contributes
        # zero gradient (the where-VJP trap).
        self._valid = valid
        self._safe = safe

    def _c(self, env, memo):
        c = self.const
        if isinstance(c, tuple):
            m = memo if memo is not None else {}
            return tuple(
                x._eval(env, m) if isinstance(x, Node) else x for x in c
            )
        if isinstance(c, Node):
            return c._eval(env, memo if memo is not None else {})
        return c

    def forward(self, x, env=None, memo=None):
        return self._forward(x, self._c(env, memo))

    def valid_mask(self, y, env=None, memo=None):
        """Elementwise in-image mask, or None when the image is all of R."""
        if self._valid is None:
            return None
        return self._valid(y, self._c(env, memo))

    def inverse(self, y, env=None, memo=None):
        c = self._c(env, memo)
        if self._valid is not None:
            y = jnp.where(self._valid(y, c), y, self._safe)
        return self._inverse(y, c)

    def ljd_inv(self, y, env=None, memo=None):
        """log |d inverse(y) / dy| (elementwise); -inf outside the image."""
        c = self._c(env, memo)
        if self._valid is None:
            return self._ljd_inv(y, c)
        m = self._valid(y, c)
        ys = jnp.where(m, y, self._safe)
        return jnp.where(m, self._ljd_inv(ys, c), -jnp.inf)

    def monotone(self, env=None, memo=None):
        m = self._monotone
        return m(self._c(env, memo)) if callable(m) else m


def _sign_of_const(c):
    """+1/-1 if every element of a CONCRETE constant shares that sign."""
    if isinstance(c, Node):
        return None
    arr = np.asarray(c)
    if np.all(arr > 0):
        return 1
    if np.all(arr < 0):
        return -1
    return None


# --------------------------------------------------------------- unary ops
def _u(name, forward, inverse, ljd_inv, monotone, valid=None, safe=1.0):
    return lambda: _Op(
        name,
        lambda x, c: forward(x),
        lambda y, c: inverse(y),
        lambda y, c: ljd_inv(y),
        monotone,
        valid=None if valid is None else (lambda y, c: valid(y)),
        safe=safe,
    )


_LOG_2 = _pymath.log(2.0)
_LOG_3 = _pymath.log(3.0)
_LOG_10 = _pymath.log(10.0)
_HALF_LOG_PI = 0.5 * _pymath.log(_pymath.pi)
_HALF_PI = 0.5 * _pymath.pi

_UNARY = {
    jnp.exp: _u(
        "exp", jnp.exp, jnp.log, lambda y: -jnp.log(y), 1,
        valid=lambda y: y > 0,
    ),
    jnp.log: _u("log", jnp.log, jnp.exp, lambda y: y, 1),
    jnp.log1p: _u("log1p", jnp.log1p, jnp.expm1, lambda y: y, 1),
    jnp.expm1: _u(
        "expm1", jnp.expm1, jnp.log1p, lambda y: -jnp.log1p(y), 1,
        valid=lambda y: y > -1.0, safe=0.0,
    ),
    jnp.log2: _u(
        "log2", jnp.log2, jnp.exp2,
        lambda y: y * _LOG_2 + _pymath.log(_LOG_2), 1,
    ),
    jnp.log10: _u(
        "log10", jnp.log10, lambda y: jnp.power(10.0, y),
        lambda y: y * _LOG_10 + _pymath.log(_LOG_10), 1,
    ),
    jnp.exp2: _u(
        "exp2", jnp.exp2, jnp.log2,
        lambda y: -jnp.log(y) - _pymath.log(_LOG_2), 1,
        valid=lambda y: y > 0,
    ),
    jnp.sqrt: _u(
        "sqrt", jnp.sqrt, jnp.square, lambda y: _LOG_2 + jnp.log(y), 1,
        valid=lambda y: y >= 0,
    ),
    jnp.cbrt: _u(
        "cbrt",
        jnp.cbrt,
        lambda y: y * y * y,
        lambda y: _LOG_3 + 2.0 * jnp.log(jnp.abs(y)),
        1,
    ),
    jnp.negative: _u(
        "negative", jnp.negative, jnp.negative, lambda y: jnp.zeros_like(y), -1
    ),
    jnp.reciprocal: _u(
        # sign flips across 0, so the global monotone direction is unknown
        # unless the support is one-sided — cdf-family raises (logp is exact)
        "reciprocal",
        jnp.reciprocal,
        jnp.reciprocal,
        lambda y: -2.0 * jnp.log(jnp.abs(y)),
        None,
    ),
    jax.nn.sigmoid: _u(
        "sigmoid",
        jax.nn.sigmoid,
        jsp.logit,
        lambda y: -jnp.log(y) - jnp.log1p(-y),
        1,
        valid=lambda y: (y > 0) & (y < 1), safe=0.5,
    ),
    jsp.expit: _u(
        "sigmoid",
        jsp.expit,
        jsp.logit,
        lambda y: -jnp.log(y) - jnp.log1p(-y),
        1,
        valid=lambda y: (y > 0) & (y < 1), safe=0.5,
    ),
    jsp.logit: _u(
        "logit",
        jsp.logit,
        jsp.expit,
        lambda y: jnp.log(jsp.expit(y)) + jnp.log(jsp.expit(-y)),
        1,
    ),
    jsp.ndtr: _u(
        # invprobit: x -> Phi(x)
        "invprobit",
        jsp.ndtr,
        jsp.ndtri,
        lambda y: _HALF_LOG_PI + _LOG_2 / 2.0 + 0.5 * jsp.ndtri(y) ** 2,
        1,
        valid=lambda y: (y > 0) & (y < 1), safe=0.5,
    ),
    jsp.ndtri: _u(
        # probit: x -> Phi^{-1}(x)
        "probit",
        jsp.ndtri,
        jsp.ndtr,
        lambda y: -_HALF_LOG_PI - _LOG_2 / 2.0 - 0.5 * y**2,
        1,
    ),
    jnp.sinh: _u(
        "sinh",
        jnp.sinh,
        jnp.arcsinh,
        lambda y: -0.5 * jnp.log1p(y * y),
        1,
    ),
    jnp.arcsinh: _u(
        "arcsinh", jnp.arcsinh, jnp.sinh, lambda y: jnp.log(jnp.cosh(y)), 1
    ),
    jnp.tanh: _u(
        "tanh",
        jnp.tanh,
        jnp.arctanh,
        lambda y: -jnp.log1p(-y * y),
        1,
        valid=lambda y: (y > -1.0) & (y < 1.0), safe=0.0,
    ),
    jnp.arctanh: _u(
        "arctanh",
        jnp.arctanh,
        jnp.tanh,
        lambda y: jnp.log1p(-jnp.tanh(y) ** 2),
        1,
    ),
    jsp.erf: _u(
        "erf",
        jsp.erf,
        jsp.erfinv,
        lambda y: _HALF_LOG_PI - _LOG_2 + jsp.erfinv(y) ** 2,
        1,
        valid=lambda y: (y > -1.0) & (y < 1.0), safe=0.0,
    ),
    jsp.erfinv: _u(
        "erfinv",
        jsp.erfinv,
        jsp.erf,
        lambda y: _LOG_2 - _HALF_LOG_PI - y**2,
        1,
    ),
    jsp.erfc: _u(
        # decreasing: logcdf(y) = base logccdf(erfcinv(y))
        "erfc",
        jsp.erfc,
        lambda y: jsp.erfinv(1.0 - y),
        lambda y: _HALF_LOG_PI - _LOG_2 + jsp.erfinv(1.0 - y) ** 2,
        -1,
        valid=lambda y: (y > 0) & (y < 2.0), safe=1.0,
    ),
    jnp.arcsin: _u(
        # image is the principal branch [-pi/2, pi/2]
        "arcsin", jnp.arcsin, jnp.sin, lambda y: jnp.log(jnp.cos(y)), 1,
        valid=lambda y: jnp.abs(y) <= _HALF_PI, safe=0.0,
    ),
    jnp.arccos: _u(
        "arccos", jnp.arccos, jnp.cos, lambda y: jnp.log(jnp.sin(y)), -1,
        valid=lambda y: (y >= 0) & (y <= _pymath.pi), safe=_HALF_PI,
    ),
    jnp.arctan: _u(
        "arctan", jnp.arctan, jnp.tan,
        lambda y: -2.0 * jnp.log(jnp.abs(jnp.cos(y))), 1,
        valid=lambda y: jnp.abs(y) < _HALF_PI, safe=0.0,
    ),
    jnp.arccosh: _u(
        # image is the non-negative branch
        "arccosh", jnp.arccosh, jnp.cosh, lambda y: jnp.log(jnp.sinh(y)), 1,
        valid=lambda y: y >= 0, safe=1.0,
    ),
    jax.nn.softplus: _u(
        "softplus",
        jax.nn.softplus,
        lambda y: y + jnp.log(-jnp.expm1(-y)),
        lambda y: -jnp.log(-jnp.expm1(-y)),
        1,
        valid=lambda y: y > 0,
    ),
}

def _register_math_unaries():
    """pm.math exposes a few ops through module-level helper fns rather than
    jnp callables — register those impls by identity."""
    from .. import math as _pmm

    _UNARY[_pmm._erfcinv_jax] = _u(
        "erfcinv",
        _pmm._erfcinv_jax,
        jsp.erfc,
        lambda y: _LOG_2 - _HALF_LOG_PI - y**2,
        -1,
    )
    _UNARY[_pmm._log1mexp_jax] = _u(
        # self-inverse decreasing bijection of (-inf, 0)
        "log1mexp",
        _pmm._log1mexp_jax,
        _pmm._log1mexp_jax,
        lambda y: y - _pmm._log1mexp_jax(y),
        -1,
        valid=lambda y: y < 0, safe=-1.0,
    )


_register_math_unaries()

# non-injective folds: two monotone branches, logp = logaddexp of the
# branch densities (reference logprob/transforms.py AbsTransform:908-921,
# CoshTransform:674-690, PowerTransform even powers:923-965)
_FOLD_FNS = {jnp.abs: "abs", jnp.square: "square", jnp.cosh: "cosh"}

_NON_INVERTIBLE = {
    jnp.sign: "sign",
    jnp.cos: "cos", jnp.sin: "sin", jnp.tan: "tan",
}

# mass-pooling maps (reference logprob/censoring.py MeasurableClip:86,
# MeasurableMaximum/Minimum via find_measurable_max_min, and
# MeasurableRound:343) — handled by dedicated matchers below, not _Op links
_CENSORING_FNS = (jnp.clip, jnp.maximum, jnp.minimum)
_ROUNDING_FNS = {
    jnp.round: "round", jnp.floor: "floor", jnp.ceil: "ceil",
    jnp.trunc: "trunc",
}


# -------------------------------------------------------------- binary ops
def _add_op(c, const_first):
    return _Op(
        "add",
        lambda x, c: c + x,
        lambda y, c: y - c,
        lambda y, c: jnp.zeros(jnp.broadcast_shapes(jnp.shape(y), jnp.shape(c))),
        1,
        const=c,
    )


def _sub_op(c, const_first):
    if const_first:  # c - x
        return _Op(
            "rsub",
            lambda x, c: c - x,
            lambda y, c: c - y,
            lambda y, c: jnp.zeros(
                jnp.broadcast_shapes(jnp.shape(y), jnp.shape(c))
            ),
            -1,
            const=c,
        )
    return _Op(
        "sub",
        lambda x, c: x - c,
        lambda y, c: y + c,
        lambda y, c: jnp.zeros(jnp.broadcast_shapes(jnp.shape(y), jnp.shape(c))),
        1,
        const=c,
    )


def _mul_op(c, const_first):
    return _Op(
        "mul",
        lambda x, c: c * x,
        lambda y, c: y / c,
        lambda y, c: jnp.broadcast_to(
            -jnp.log(jnp.abs(c)), jnp.broadcast_shapes(jnp.shape(y), jnp.shape(c))
        ),
        _sign_of_const(c),
        const=c,
    )


def _div_op(c, const_first):
    if const_first:  # c / x — sign flips across 0: cdf undetermined
        return _Op(
            "rdiv",
            lambda x, c: c / x,
            lambda y, c: c / y,
            lambda y, c: jnp.log(jnp.abs(c)) - 2.0 * jnp.log(jnp.abs(y)),
            None,
            const=c,
        )
    return _Op(
        "div",
        lambda x, c: x / c,
        lambda y, c: y * c,
        lambda y, c: jnp.broadcast_to(
            jnp.log(jnp.abs(c)), jnp.broadcast_shapes(jnp.shape(y), jnp.shape(c))
        ),
        _sign_of_const(c),
        const=c,
    )


def _pow_op(c, const_first):
    if const_first:  # c ** x
        if isinstance(c, Node):
            # symbolic base (e.g. a conditioned RV or pm.Data): measurable
            # per reference find_measurable_transforms power-with-rv-base —
            # the base must be positive at runtime; our convention is
            # logp -inf on invalid params, not ParameterValueError. The base
            # is sanitized inside the lambdas so an invalid c cannot poison
            # the -inf with nan.
            def _safe_c(cv):
                cv = jnp.asarray(cv)
                return jnp.where((cv > 0) & (cv != 1.0), cv, 2.0)

            return _Op(
                "rpow",
                lambda x, c: jnp.asarray(c) ** x,
                lambda y, c: jnp.log(y) / jnp.log(_safe_c(c)),
                lambda y, c: -jnp.log(y)
                - jnp.log(jnp.abs(jnp.log(_safe_c(c)))),
                None,
                const=c,
                valid=lambda y, c: (y > 0)
                & (jnp.asarray(c) > 0)
                & (jnp.asarray(c) != 1.0),
                safe=1.0,
            )
        base = float(np.asarray(c))
        if base <= 0 or base == 1.0:
            raise TypeError(
                f"c**x is only measurable for constant c > 0, c != 1 (got {base})"
            )
        return _Op(
            "rpow",
            lambda x, c: jnp.asarray(c) ** x,
            lambda y, c: jnp.log(y) / _pymath.log(base),
            lambda y, c: -jnp.log(y) - _pymath.log(abs(_pymath.log(base))),
            1 if base > 1 else -1,
            const=c,
            valid=lambda y, c: y > 0,
        )
    if isinstance(c, Node):
        raise TypeError("exponent of a measurable x**p must be concrete")
    p = np.asarray(c)
    if p.ndim != 0:
        raise TypeError("exponent of a measurable x**p must be scalar")
    p = float(p)
    if p == 0:
        raise TypeError("x**0 is not an invertible transform")
    is_int = float(p).is_integer()
    if is_int and int(p) % 2 == 0:
        # handled by the folded-density path in dist_from_expression
        raise TypeError(
            f"x**{int(p)} (even power) is not invertible on the real line"
        )
    if is_int:
        # odd integer power: bijective on R, sign-preserving inverse
        def inv(y, c):
            return jnp.sign(y) * jnp.abs(y) ** (1.0 / p)

        valid = None
    else:
        # fractional power: image is the non-negative half-line
        def inv(y, c):
            return y ** (1.0 / p)

        valid = (
            (lambda y, c: y > 0) if p < 0 else (lambda y, c: y >= 0)
        )

    return _Op(
        "pow",
        lambda x, c: x**p,
        inv,
        lambda y, c: (
            -_pymath.log(abs(p)) + (1.0 / p - 1.0) * jnp.log(jnp.abs(y))
        ),
        (1 if p > 0 else None),
        const=c,
        valid=valid,
    )


def _match_odds_ratio(node, fn, num, den):
    """``t / (1 + t)`` where numerator and denominator share the SAME node
    ``t`` — returns ``t`` when matched, else None."""
    if fn not in (jnp.divide, jnp.true_divide):
        return None
    if not isinstance(den, DeterministicNode) or len(den.args) != 2:
        return None
    dfn = getattr(den.fn, "_base_fn", den.fn)
    if dfn is not jnp.add:
        return None
    da, db = den.args
    for t, one in ((da, db), (db, da)):
        if t is num and not isinstance(one, Node) and np.ndim(one) == 0 \
                and float(one) == 1.0:
            return t
    return None


_BINARY = {
    jnp.add: _add_op,
    jnp.subtract: _sub_op,
    jnp.multiply: _mul_op,
    jnp.divide: _div_op,
    jnp.true_divide: _div_op,
    jnp.power: _pow_op,
}


# ------------------------------------------------ non-overlapping switch
_SIGN_CONDS = {
    jnp.greater: 1, jnp.greater_equal: 1, jnp.less: -1, jnp.less_equal: -1,
}


def _branch_scale(branch, leaf):
    """Return the RV-free scale s for branch == s * leaf (1.0 when the
    branch IS the leaf); None when the branch doesn't match."""
    if branch is leaf:
        return 1.0
    if isinstance(branch, DeterministicNode) and len(branch.args) == 2:
        bfn = getattr(branch.fn, "_base_fn", branch.fn)
        a, b = branch.args
        if bfn is jnp.multiply:
            if a is leaf and _is_rv_free(b):
                return b
            if b is leaf and _is_rv_free(a):
                return a
        if bfn in (jnp.divide, jnp.true_divide):
            # leaf / c  ==  (1/c) * leaf
            if a is leaf and _is_rv_free(b) and not isinstance(b, Node):
                return 1.0 / np.asarray(b)
    return None


def _match_switch_scale(node):
    """Reference logprob/transforms.py MeasurableSwitchNonOverlapping
    (tests/logprob/test_switch.py): ``switch(x > 0, s_pos * x, s_neg * x)``
    with positive RV-free scales is a piecewise-linear increasing bijection
    (the two half-lines map to disjoint half-lines). Returns (op, leaf)."""
    if len(node.args) != 3:
        return None
    cond, a, b = node.args
    if not isinstance(cond, DeterministicNode):
        return None
    cfn = getattr(cond.fn, "_base_fn", cond.fn)
    if cfn not in _SIGN_CONDS or len(cond.args) != 2:
        return None
    lhs, rhs = cond.args
    # condition must be the RV leaf against a literal zero
    if not isinstance(lhs, (FreeRV, ObservedRV)):
        return None
    if isinstance(rhs, Node) or np.ndim(rhs) != 0 or float(rhs) != 0.0:
        return None
    leaf = lhs
    if _SIGN_CONDS[cfn] < 0:  # x < 0 selects branch a: swap to sign order
        a, b = b, a
    s_pos = _branch_scale(a, leaf)  # applied where x > 0
    s_neg = _branch_scale(b, leaf)  # applied where x <= 0
    if s_pos is None or s_neg is None:
        return None
    # reference restriction: the condition must not broadcast x, and the
    # scales must not expand x's shape (injectivity per element)
    if tuple(node.shape) != tuple(leaf.shape):
        raise TypeError(
            "measurable switch must not broadcast the base RV "
            "(condition/scale shapes expand it)"
        )
    for s in (s_pos, s_neg):
        if not isinstance(s, Node) and np.any(np.asarray(s) <= 0):
            raise TypeError(
                "switch non-overlapping scale > 0 is required for a "
                "measurable piecewise transform"
            )

    def fwd(x, c):
        return jnp.where(x > 0, c[0] * x, c[1] * x)

    def inv(y, c):
        return jnp.where(y > 0, y / c[0], y / c[1])

    def ljd(y, c):
        def safe(s):
            s = jnp.asarray(s)
            return jnp.where(s > 0, -jnp.log(jnp.where(s > 0, s, 1.0)), -jnp.inf)

        return jnp.where(y > 0, safe(c[0]), safe(c[1]))

    op = _Op("switch_scale", fwd, inv, ljd, 1, const=(s_pos, s_neg))
    op.continuous_only = True
    return op, leaf


def _match_matmul(node):
    """``A @ x`` / ``x @ A`` with a square RV-free matrix ``A`` → linear
    change-of-variables density (reference logprob/linalg.py:24
    MeasurableMatMul + :59 find_measurable_matmul).

    NOTE on the Jacobian: the reference subtracts ``slogdet(A)`` ONCE
    (logprob/linalg.py:55) regardless of how many independent columns
    (rows) of a matrix-valued ``x`` transform; the correct factor is
    ``|det A|^k`` with k the count of transformed columns (rows) — verified
    numerically against the transformed MatrixNormal closed form (the
    reference's own test masks the difference behind rtol=1e-5 on
    |logp| ~ 1e7, tests/logprob/test_linalg.py:54-77). We implement the
    correct Jacobian."""
    if len(node.args) != 2:
        raise TypeError("measurable matmul needs two operands")
    lhs, rhs = node.args
    l_rand = isinstance(lhs, Node) and bool(rv_ancestors([lhs]))
    r_rand = isinstance(rhs, Node) and bool(rv_ancestors([rhs]))
    if l_rand == r_rand:
        raise TypeError(
            "measurable matmul needs exactly one random operand "
            "(products of two RVs have no derived density)"
        )
    right_measurable = r_rand
    rv_op, A = (rhs, lhs) if right_measurable else (lhs, rhs)
    a_shape = tuple(
        int(s) for s in (A.shape if isinstance(A, Node) else np.shape(A))
    )
    if len(a_shape) < 2 or a_shape[-1] != a_shape[-2]:
        raise TypeError(
            "measurable matmul requires a square matrix operand — a "
            "non-square map loses or adds dimensions (no density)"
        )
    rv_shape = tuple(int(s) for s in rv_op.shape)
    if len(rv_shape) < 1:
        raise TypeError("measurable matmul needs a vector or matrix RV")
    core = 1 if len(rv_shape) == 1 else 2
    out_shape = tuple(int(s) for s in node.shape)
    # the RV must carry the full output batch itself: a broadcast RV would
    # reuse the same draw across batch members (dependent rows) — reference
    # find_measurable_matmul rejects broadcast measurable inputs
    if rv_shape[:-core] != out_shape[: len(out_shape) - core]:
        raise TypeError(
            "measurable matmul must not broadcast the random operand "
            "across batch dimensions (broadcast draws are dependent)"
        )
    base = _inner_dist(rv_op)
    if base.is_discrete:
        raise TypeError(
            "matmul of a discrete RV has no derived density (the linear "
            "map does not preserve the lattice)"
        )
    return MatMulDistribution._make(
        base, A, right_measurable, core, out_shape
    )


def _match_switch_mixture(node):
    """``switch(cond, comp_true, comp_false)`` with at least one measurable
    branch → elementwise component-selection mixture (reference
    logprob/mixture.py:383 MeasurableSwitchMixture + :434
    logprob_switch_mixture; :459 MeasurableIfElse + :535
    find_measurable_ifelse_mixture for random conditions, whose density is
    conditional on the condition's value). Deterministic branches behave as
    point masses; random components must not be broadcast by the condition
    (broadcast draws are identical, hence dependent — reference
    find_measurable_switch_mixture rejects component broadcast). Returns
    None when the pattern does not apply (caller raises)."""
    from .distribution import DiracDelta

    if len(node.args) != 3:
        return None
    cond, t, f = node.args
    cond_rvs = (
        rv_ancestors([cond]) if isinstance(cond, Node) else []
    )
    if cond_rvs:
        # a RANDOM condition selects like a random index: the density is
        # CONDITIONAL on the condition's (env-resolved) value — reference
        # logprob/mixture.py:459 MeasurableIfElse / split_valued_ifelse.
        # Valid only when the condition shares no randomness with the
        # branches' DENSITY-BEARING leaves (otherwise it replicates the
        # branch RV piecewise — the non-overlapping bijection form's
        # territory, which already had its chance). RVs appearing only in
        # the branches' own selector slots (nested ifelse sharing the index,
        # reference test_nested_ifelse) resolve from the env and do not
        # couple.
        branch_leaf_ids = {
            id(r)
            for br in (t, f)
            if isinstance(br, Node)
            for r in _density_rv_ancestors(br)
        }
        if any(id(r) in branch_leaf_ids for r in cond_rvs):
            return None
    out_shape = tuple(int(s) for s in node.shape)
    comps, n_meas, has_atoms = [], 0, False
    for br in (t, f):
        if isinstance(br, Node) and _density_rv_ancestors(br):
            d = _inner_dist(br)
            if d.event_ndim != 0:
                raise TypeError(
                    "switch mixtures select elementwise; multivariate "
                    "components are not measurable here"
                )
            if tuple(d.shape) != out_shape:
                raise TypeError(
                    "switch mixture must not broadcast a random component — "
                    "broadcast draws are identical (dependent), so the "
                    "product density does not apply (reference rejects "
                    "component broadcast)"
                )
            n_meas += 1
            comps.append(d)
        else:
            has_atoms = True
            comps.append(DiracDelta.dist(br))
    if n_meas == 0:
        return None
    return SwitchMixtureDistribution._make(cond, comps[0], comps[1],
                                           out_shape, has_atoms)


# ----------------------------------------------------- censoring / rounding
def _inner_dist(x):
    """Distribution of the sub-expression below a mass-pooling op: a bare
    RV's dist, or a recursively derived measurable-expression density."""
    if isinstance(x, (FreeRV, ObservedRV)):
        return x.dist
    if isinstance(x, Node):
        return dist_from_expression(x)
    raise TypeError("mass-pooling op needs a random operand")


def _resolve_censor_bound(b, rv_operand, side):
    """Normalize one clip/max/min bound: None for the unbounded idioms
    (bound is the RV itself — ``clip(x, x, hi)`` — or an infinite constant),
    the bound otherwise. Bounds may be other random expressions (evaluated
    from the env at logp time) but must not depend on the censored leaf."""
    if b is rv_operand:
        return None
    if isinstance(b, Node):
        leaf_ids = {id(r) for r in rv_ancestors([rv_operand])}
        if any(id(r) in leaf_ids for r in rv_ancestors([b])):
            raise TypeError(
                "censoring bound depends on the censored variable itself — "
                "no derived density"
            )
        return b
    arr = np.asarray(b)
    if arr.ndim == 0 and np.isinf(arr):
        if (side == "lower") == (arr < 0):
            return None
    return b


def _acc_bound(old, new, combine):
    """Nested bounds combine with maximum (lower) / minimum (upper) —
    reference find_measurable_clips nested-clip fusion."""
    if new is None:
        return old
    if old is None:
        return new
    from ..graph import apply as _gapply

    return _gapply(combine, old, new)


def _match_censoring(node):
    """Unwrap a chain of clip / maximum / minimum ops over one random
    sub-expression into a Censored distribution (reference
    logprob/censoring.py:86 MeasurableClip + max/min censoring)."""
    from .censored import Censored

    lower = upper = None
    current = node
    while isinstance(current, DeterministicNode):
        fn = getattr(current.fn, "_base_fn", current.fn)
        if fn is jnp.clip:
            if len(current.args) != 3:
                raise TypeError("measurable clip must be clip(x, lower, upper)")
            x, lo, hi = current.args
            if _is_rv_free(x):
                raise TypeError("clip(x, ...) needs a random first operand")
            lower = _acc_bound(
                lower, _resolve_censor_bound(lo, x, "lower"), jnp.maximum
            )
            upper = _acc_bound(
                upper, _resolve_censor_bound(hi, x, "upper"), jnp.minimum
            )
            current = x
        elif fn is jnp.maximum or fn is jnp.minimum:
            if len(current.args) != 2:
                raise TypeError("measurable maximum/minimum must be binary")
            a, b = current.args
            a_free, b_free = _is_rv_free(a), _is_rv_free(b)
            if a_free == b_free:
                raise TypeError(
                    "maximum/minimum of two random expressions is not "
                    "censoring — no derived density (use OrderStatistic "
                    "for iid order statistics)"
                )
            const, rv_side = (a, b) if a_free else (b, a)
            bound = _resolve_censor_bound(
                const, rv_side, "lower" if fn is jnp.maximum else "upper"
            )
            if fn is jnp.maximum:
                lower = _acc_bound(lower, bound, jnp.maximum)
            else:
                upper = _acc_bound(upper, bound, jnp.minimum)
            current = rv_side
        else:
            break
    base = _inner_dist(current)
    if lower is None and upper is None:
        # clip(x, x, x) — the useless clip; plain base density (reference
        # test_useless_clip)
        return base
    return Censored.dist(base, lower=lower, upper=upper)


def _match_rounding(node, method):
    """round/floor/ceil/trunc of a continuous measurable expression →
    Discretized (reference logprob/censoring.py:343 round_logprob)."""
    from .censored import Censored
    from .derived import Discretized

    args = [a for a in node.args if isinstance(a, Node)]
    if len(node.args) != 1 or len(args) != 1:
        raise TypeError(f"measurable {method} must be unary")
    base = _inner_dist(args[0])
    if isinstance(base, Censored):
        # A censored base pools mass at its bounds: treating it as continuous
        # would drop the bound cells' atoms (reference
        # test_rounding_censored_base_not_measurable)
        raise TypeError(
            f"{method}(...) of a censored expression is not measurable: the "
            "point masses at the censoring bounds are not a density"
        )
    if base.is_discrete:
        # rounding an integer-supported RV is the identity (reference
        # find_measurable_roundings reduces it to a cast)
        return base
    return Discretized.dist(base, method=method)


_CAST_KIND_ORDER = {"b": 0, "u": 1, "i": 1, "f": 2}


def _match_cast(node, out_dtype, has_outer_ops):
    """``x.astype(dtype)`` of a measurable expression (reference
    logprob/tensor.py MeasurableCast find_measurable_casts:468-530).

    Returns None when the cast is measure-preserving and transparent to the
    chain (same-or-widening kind mid-chain), a Distribution when it resolves
    to one (directly-valued relabel; float->int truncation), and raises when
    the cast is not measurable.
    """
    from .censored import Censored
    from .derived import Discretized

    args = [a for a in node.args if isinstance(a, Node)]
    if len(node.args) != 1 or len(args) != 1:
        raise TypeError("measurable cast must be unary")
    inner = args[0]
    in_dt = np.dtype(getattr(inner, "dtype", np.float64))
    out_dt = np.dtype(out_dtype)
    ik = _CAST_KIND_ORDER.get(in_dt.kind)
    ok = _CAST_KIND_ORDER.get(out_dt.kind)
    if ik is None or ok is None:
        raise TypeError(
            f"no derived density for a cast between dtype kinds "
            f"{in_dt.kind!r} -> {out_dt.kind!r}"
        )
    if ok < ik:
        if in_dt.kind == "f" and out_dt.kind == "i":
            # float -> signed int rounds toward zero: a trunc composed with
            # a dtype relabel (reference find_measurable_casts introduces
            # the explicit trunc and lets the rounding rewrite claim it)
            base_inner = _inner_dist(inner)
            if isinstance(base_inner, Censored):
                raise TypeError(
                    "int-cast (truncation) of a censored expression is not "
                    "measurable: the point masses at the censoring bounds "
                    "are not a density"
                )
            if base_inner.is_discrete:
                return base_inner
            return Discretized.dist(base_inner, method="trunc")
        raise TypeError(
            "cast discretizes the base variable without truncating it "
            "(unsigned ints wrap negative values; bool collapses the "
            "support onto two points) — no derived density (reference "
            "find_measurable_casts)"
        )
    if ik < _CAST_KIND_ORDER["f"] and ok == _CAST_KIND_ORDER["f"]:
        # Casting a discrete variable to float hides its discreteness from
        # the transform chain (a continuous Jacobian would be wrongly
        # applied to scalings of the cast variable) — directly valued only.
        if has_outer_ops:
            raise TypeError(
                "float cast of a discrete variable hides its discreteness "
                "from the transform chain — only a directly-valued cast is "
                "measurable (reference find_measurable_casts)"
            )
        return _DtypeView._make(_inner_dist(inner), out_dt)
    if not has_outer_ops:
        # outermost measure-preserving relabel of the whole expression
        return _DtypeView._make(_inner_dist(inner), out_dt)
    return None


def _match_broadcast(node):
    """``broadcast_to(x, shape)`` of a measurable expression, directly
    valued (reference logprob/tensor.py MeasurableBroadcast:363-466)."""
    rand = [a for a in node.args if isinstance(a, Node) and rv_ancestors([a])]
    if len(rand) != 1:
        raise TypeError(
            "measurable broadcast_to needs exactly one random operand (the "
            "target shape must be RV-free)"
        )
    x = rand[0]
    base = _inner_dist(x)
    return BroadcastDistribution._make(
        base, tuple(int(s) for s in x.shape), tuple(int(s) for s in node.shape)
    )


def _match_layout(node):
    """transpose / reshape / ravel / squeeze / expand_dims of a measurable
    expression → LayoutDistribution (reference logprob/tensor.py
    MeasurableDimShuffle:255): the op is a bijection on the index set, so
    the elementwise density rides the same re-indexing, Jacobian-free."""
    fn = node.fn
    raw = getattr(fn, "_base_fn", fn)
    marker = getattr(fn, "_measurable_layout", None)
    args = [a for a in node.args if isinstance(a, Node)]
    if len(args) != 1:
        raise TypeError("measurable layout op must have one random operand")
    x = args[0]
    in_shape = tuple(int(s) for s in x.shape)
    out_shape = tuple(int(s) for s in node.shape)
    if marker is not None:
        kind, ax = marker
    elif raw in (jnp.reshape, jnp.ravel, jnp.squeeze, jnp.expand_dims):
        kind, ax = "reshape", None
    elif raw is jnp.transpose:
        extra = [a for a in node.args if not isinstance(a, Node)]
        kind, ax = "transpose", (tuple(extra[0]) if extra and extra[0]
                                 is not None else None)
    elif raw is jnp.swapaxes:
        extra = [a for a in node.args if not isinstance(a, Node)]
        a, b = int(extra[0]), int(extra[1])
        perm = list(range(len(in_shape)))
        perm[a], perm[b] = perm[b], perm[a]
        kind, ax = "transpose", tuple(perm)
    elif raw is jnp.moveaxis:
        extra = [a for a in node.args if not isinstance(a, Node)]
        src, dst = extra[0], extra[1]
        src = (src,) if np.isscalar(src) else tuple(src)
        dst = (dst,) if np.isscalar(dst) else tuple(dst)
        perm = [a for a in range(len(in_shape))
                if a not in {s % len(in_shape) for s in src}]
        for d, s in sorted(zip((d % len(in_shape) for d in dst),
                               (s % len(in_shape) for s in src))):
            perm.insert(d, s)
        kind, ax = "transpose", tuple(perm)
    else:  # pragma: no cover - guarded by caller
        raise TypeError("unrecognized layout op")

    base = _inner_dist(x)
    ev = int(getattr(base, "event_ndim", 0) or 0)
    n = len(in_shape)
    requires_direct = False
    if kind == "transpose":
        axes = tuple(a % n for a in ax) if ax is not None else \
            tuple(reversed(range(n)))
        inv_axes = tuple(int(i) for i in np.argsort(axes))

        def fwd(arr):
            lead = arr.ndim - n
            return jnp.transpose(
                arr, tuple(range(lead)) + tuple(lead + a for a in axes)
            )

        def inv(arr):
            lead = arr.ndim - n
            return jnp.transpose(
                arr, tuple(range(lead)) + tuple(lead + a for a in inv_axes)
            )

        if ev:
            # The value is fully un-transposed before the base logp, so any
            # permutation derives; the density re-applies only the BATCH
            # part of the order (reference logprob_dimshuffle redo_ds drops
            # the support axes). A permutation that moves the event block
            # off the trailing axes is no longer a well-formed distribution
            # (its event structure is interleaved), so it is directly
            # valued only — mirroring the reference restriction that
            # transposing dimshuffles of multivariates must be directly
            # valued (find_measurable_dimshuffles).
            batch_axes = tuple(a for a in axes if a < n - ev)

            def dfwd(arr, _b=batch_axes, _m=n - ev):
                lead = arr.ndim - _m
                return jnp.transpose(
                    arr, tuple(range(lead)) + tuple(lead + a for a in _b)
                )

            requires_direct = set(axes[n - ev:]) != set(range(n - ev, n))
        else:
            dfwd = fwd
    else:  # C-order-preserving reshape family
        if int(np.prod(in_shape) if in_shape else 1) != int(
            np.prod(out_shape) if out_shape else 1
        ):
            raise TypeError("layout reshape must preserve the element count")

        def fwd(arr):
            lead = arr.shape[: arr.ndim - n]
            return jnp.reshape(arr, lead + out_shape)

        def inv(arr):
            lead = arr.shape[: arr.ndim - len(out_shape)]
            return jnp.reshape(arr, lead + in_shape)

        if ev:
            if (
                n < ev
                or len(out_shape) < ev
                or in_shape[n - ev:] != out_shape[len(out_shape) - ev:]
            ):
                raise TypeError(
                    "reshape across the event block of a multivariate "
                    "distribution has no derived density (the event layout "
                    "is consumed by the base logp) — reshape batch "
                    "dimensions only"
                )

            def dfwd(arr, _m=n - ev,
                     _out=out_shape[: len(out_shape) - ev]):
                lead = arr.shape[: arr.ndim - _m]
                return jnp.reshape(arr, lead + _out)

        else:
            dfwd = fwd

    return LayoutDistribution._make(
        base, fwd, inv, out_shape,
        dfwd=dfwd, event_k=ev, requires_direct=requires_direct,
    )


def _match_cumsum(node, axis):
    """cumsum of a measurable expression → CumSum derived density (reference
    logprob/cumsum.py:53-106 MeasurableCumsum): the map is unit-lower-
    triangular, so |det J| = 1 and logp(v) = base.logp(diff_with_first(v)).
    axis=None is only measurable for 1-D operands — flattening a multi-dim
    expression before summing mixes dimensions (reference
    find_measurable_cumsums rejects base_rv.ndim > 1 with axis=None)."""
    args = [a for a in node.args if isinstance(a, Node)]
    if len(args) != 1:
        raise TypeError("measurable cumsum must have one random operand")
    x = args[0]
    in_shape = tuple(int(s) for s in x.shape)
    if axis is None:
        if len(in_shape) != 1:
            raise TypeError(
                "cumsum over a flattened multi-dimensional expression mixes "
                "dimensions — no derived density (reference logprob/cumsum.py "
                "find_measurable_cumsums)"
            )
        axis = 0
    base = _inner_dist(x)
    if base.event_ndim != 0:
        raise TypeError(
            "cumsum over a multivariate distribution would mix event "
            "dimensions — no derived density"
        )
    from .derived import CumSum

    return CumSum.dist(base, axis=int(axis))


def _match_index(node, marker):
    """Basic (int/slice) indexing of an independent-components expression →
    marginal density of the selected components (reference logprob joint-
    subtensor support; valid because batch components are independent, so
    dropping components marginalizes them)."""
    if marker is None:
        return _match_index_mixture(node)
    (idx,) = marker
    idx_t = idx if isinstance(idx, tuple) else (idx,)
    for i in idx_t:
        if not (isinstance(i, (int, np.integer)) or isinstance(i, slice)):
            raise TypeError(
                "measurable indexing supports ints and slices only — "
                "advanced indices can replicate components, whose joint "
                "density is degenerate"
            )
    args = [a for a in node.args if isinstance(a, Node)]
    if len(args) != 1:
        raise TypeError("measurable indexing needs one random operand")
    base = _inner_dist(args[0])
    if base.event_ndim != 0:
        raise TypeError(
            "indexing into a multivariate event has no independent marginal "
            "here (use the distribution's own marginalization)"
        )
    if isinstance(base, StackedDistribution):
        raise TypeError(
            "indexing a join of interdependent components has no product "
            "marginal; index the components before joining"
        )
    return SelectionDistribution._make(
        base, idx_t, tuple(int(s) for s in node.shape)
    )


def _match_index_mixture(node):
    """``stack(comps)[I]`` / ``rv[I]`` with a RANDOM scalar discrete index
    ``I`` → component-selection mixture: the density CONDITIONAL on I's
    value, which resolves from the evaluation env exactly like model logps
    condition on value variables (reference logprob/mixture.py:262
    find_measurable_index_mixture + :309 logprob_MixtureRV — the reference
    likewise rejects non-scalar integer random indices, which can pick
    repeated — hence dependent — components)."""
    from .distribution import DiracDelta

    args = list(node.args)
    base_arg, idx_args = args[0], args[1:]
    if len(idx_args) != 1:
        raise TypeError(
            "random-index selection supports a single scalar index only "
            "(reference mixture logprob rejects multi-axis random indexing)"
        )
    idx = idx_args[0]
    if not (isinstance(idx, Node) and rv_ancestors([idx])):
        raise TypeError("random-index selection needs a random index")
    if tuple(idx.shape) != ():
        raise TypeError(
            "a non-scalar random index can select the same component more "
            "than once — repeated selections are perfectly dependent, so "
            "the product density does not apply (reference "
            "find_measurable_index_mixture rejects integer-array indices); "
            "use pm.Mixture for marginal mixture semantics"
        )
    if not jnp.issubdtype(jnp.dtype(idx.dtype), jnp.integer):
        raise TypeError("mixture index must be an integer-valued (discrete) RV")
    comp_leaf_ids = {
        id(r) for r in _density_rv_ancestors(base_arg)
    }
    if any(id(r) in comp_leaf_ids for r in rv_ancestors([idx])):
        raise TypeError(
            "the mixture index must not share randomness with the "
            "components' density-bearing leaves — conditioning on the index "
            "value would fix part of the measured variable itself"
        )

    out_shape = tuple(int(s) for s in node.shape)
    join = getattr(getattr(base_arg, "fn", None), "_measurable_join", None)
    if join is not None:
        kind, axis = join
        if kind != "stack" or (axis % (len(out_shape) + 1)) != 0:
            raise TypeError(
                "random-index mixtures select whole components along the "
                "leading stack axis; concatenations interleave components "
                "within the axis (use pm.Mixture)"
            )
        comps = []
        for c in base_arg.args:
            if isinstance(c, Node) and _density_rv_ancestors(c):
                comps.append(_inner_dist(c))
            else:
                # RV-free slot behaves as a point mass (reference
                # test_mixture_with_DiracDelta)
                comps.append(DiracDelta.dist(c))
    else:
        base = _inner_dist(base_arg)
        if base.event_ndim != 0:
            raise TypeError(
                "random-index selection into a multivariate event has no "
                "independent component density"
            )
        if isinstance(base, StackedDistribution):
            raise TypeError(
                "random-index selection from a join of interdependent "
                "components is not measurable; stack independent components "
                "instead"
            )
        K = int(base_arg.shape[0])
        comps = [
            SelectionDistribution._make(base, (k,), out_shape)
            for k in range(K)
        ]
    return MixtureSelectionDistribution._make(comps, idx, out_shape)


def _match_argext(node, kind, axis):
    """argmax/argmin with a closed-form winner distribution → Categorical
    (reference logprob/order.py:256 categorical_from_argmax):

        argmax(Gumbel(mu, beta))      -> Cat(softmax(mu / beta))
        argmin(Exponential(lam))      -> Cat(lam / sum lam)
        argmin(Weibull(alpha, beta))  -> Cat(beta^-alpha / sum beta^-alpha)

    Loc/scale lifts (`a + b * rv`, RV-free a/b) fold into the base params
    (reference lift_loc_scale); Gumbel's race is scale-invariant so only
    its per-index location matters. The Gumbel scale / Weibull shape must
    be constant across the race axes.
    """
    from ..graph import apply as gapply
    from .continuous import Exponential, Gumbel, Weibull
    from .discrete import Categorical
    from .distribution import _shape_of

    args = [a for a in node.args if isinstance(a, Node)]
    if len(node.args) != 1 or len(args) != 1:
        raise TypeError(f"measurable arg{kind} must be unary")
    current = args[0]

    # unwrap a + b * rv (one affine layer, RV-free coefficients)
    shift, scale = 0.0, 1.0
    while isinstance(current, DeterministicNode):
        fn = getattr(current.fn, "_base_fn", current.fn)
        if fn in (jnp.add, jnp.multiply) and len(current.args) == 2:
            a, b = current.args
            a_free, b_free = _is_rv_free(a), _is_rv_free(b)
            if a_free == b_free:
                raise TypeError(
                    f"arg{kind} has a closed form only for one random "
                    "operand races"
                )
            const, rv_side = (a, b) if a_free else (b, a)
            # walking outer->inner through y = shift + scale * (...):
            # an inner add A folds as shift += scale*A; an inner mul A as
            # scale *= A
            if fn is jnp.add:
                shift = gapply(
                    jnp.add, shift, gapply(jnp.multiply, scale, const)
                )
            else:
                if not isinstance(const, Node):
                    arr = np.asarray(const)
                    if not np.all(arr > 0):
                        raise TypeError(
                            f"arg{kind} scale lift needs positive scales"
                        )
                scale = gapply(jnp.multiply, scale, const)
            current = rv_side
            continue
        break
    if not isinstance(current, (FreeRV, ObservedRV)):
        raise TypeError(
            f"arg{kind}(...) requires a Gumbel (argmax) or "
            "Exponential/Weibull (argmin) random operand"
        )
    dist = current.dist
    shape = tuple(int(s) for s in dist.shape)
    ndim = len(shape)
    if axis is None:
        reduced = tuple(range(ndim))
    else:
        reduced = (axis % ndim,)
    if not shape or any(shape[a] == 0 for a in reduced):
        raise TypeError(f"arg{kind} of an empty race has no density")

    def _const_across(p):
        ps = _shape_of(p)
        padded = (1,) * (ndim - len(ps)) + tuple(ps)
        return all(padded[a] == 1 for a in reduced)

    if kind == "max" and isinstance(dist, Gumbel):
        if not _const_across(dist.beta) or not _const_across(scale):
            raise TypeError(
                "argmax(gumbel): the scale must be constant across the "
                "race axes (reference order.py:286)"
            )
        # exp((a + b*mu) / (b*beta)) — b cancels only in the ratio mu/beta
        # when a == 0; keep the general affine form
        logits = gapply(
            lambda sh, sc, mu, beta: (sh + sc * mu) / (sc * beta),
            shift, scale, dist.mu, dist.beta,
        )
        weights = gapply(jnp.exp, logits)
    elif kind == "min" and isinstance(dist, Exponential):
        if not (np.isscalar(shift) and shift == 0.0):
            raise TypeError(
                "argmin(exponential): location shifts break the closed "
                "form (a shifted exponential is not exponential)"
            )
        weights = gapply(lambda lam, sc: lam / sc, dist.lam, scale)
    elif kind == "min" and isinstance(dist, Weibull):
        if not (np.isscalar(shift) and shift == 0.0):
            raise TypeError(
                "argmin(weibull): location shifts break the closed form"
            )
        if not _const_across(dist.alpha):
            raise TypeError(
                "argmin(weibull): the shape must be constant across the "
                "race axes (reference order.py:313)"
            )
        weights = gapply(
            lambda a, b, sc: (b * sc) ** (-a), dist.alpha, dist.beta, scale
        )
    else:
        raise TypeError(
            f"arg{kind} has a closed-form density only for "
            "argmax(Gumbel) and argmin(Exponential/Weibull) races "
            "(reference logprob/order.py categorical_from_argmax)"
        )

    n_red = 1
    for a in reduced:
        n_red *= shape[a]
    rest = tuple(a for a in range(ndim) if a not in reduced)
    out_shape = tuple(shape[a] for a in rest)

    def to_probs(w):
        w = jnp.broadcast_to(jnp.asarray(w), shape)
        w = jnp.moveaxis(w, reduced, tuple(range(-len(reduced), 0)))
        w = jnp.reshape(w, out_shape + (n_red,))
        return w / jnp.sum(w, axis=-1, keepdims=True)

    return Categorical.dist(p=gapply(to_probs, weights))


def _match_sum_reduction(node, axis, keepdims):
    """sum(Normal(mu, sigma), axis) → Normal(sum mu, sqrt(sum sigma^2)) —
    reference logprob/arithmetic.py:51 sum_of_normals. Partial-axis sums are
    fine (unlike order statistics): the un-summed components remain
    independent normals."""
    from ..graph import apply as _gapply
    from .continuous import Normal

    args = [a for a in node.args if isinstance(a, Node)]
    if len(node.args) != 1 or len(args) != 1:
        raise TypeError("measurable sum must be unary")
    x = args[0]
    if not isinstance(x, (FreeRV, ObservedRV)) or not isinstance(x.dist, Normal):
        raise TypeError(
            "sum(...) of a random expression has a closed-form derived "
            "density only for a Normal base (sum of independent normals is "
            "normal — reference logprob/arithmetic.py sum_of_normals); "
            "other bases have no derived density"
        )
    if len(x.dist.event_shape):
        raise TypeError("sum of a multivariate base has no derived density")
    shape = tuple(int(s) for s in x.shape)
    mu, sigma = x.dist.mu, x.dist.sigma
    mu_s = _gapply(
        lambda m: jnp.sum(
            jnp.broadcast_to(m, shape), axis=axis, keepdims=keepdims
        ),
        mu,
    )
    sd_s = _gapply(
        lambda s: jnp.sqrt(
            jnp.sum(
                jnp.broadcast_to(jnp.square(s), shape),
                axis=axis,
                keepdims=keepdims,
            )
        ),
        sigma,
    )
    return Normal.dist(mu=mu_s, sigma=sd_s)


def _match_order_reduction(node, kind, axis, keepdims):
    """max/min over ALL axes of an iid scalar RV → Max/Min order-statistic
    density (reference logprob/order.py find_measurable_max; partial-axis
    reductions are rejected there too, tests/logprob/test_order.py:118).
    kind == "sum" routes to the sum-of-normals closed form."""
    if kind == "sum":
        return _match_sum_reduction(node, axis, keepdims)
    from .derived import Max, Min
    from .distribution import _shape_of
    from .shape_utils import change_dist_size

    args = [a for a in node.args if isinstance(a, Node)]
    if len(node.args) != 1 or len(args) != 1:
        raise TypeError(f"measurable {kind} must be unary")
    x = args[0]
    if not isinstance(x, (FreeRV, ObservedRV)):
        raise TypeError(
            f"{kind}(...) order statistic requires a bare iid random "
            "variable operand (use OrderStatistic/Max/Min explicitly for "
            "derived bases)"
        )
    dist = x.dist
    if dist.event_ndim != 0:
        raise TypeError(
            f"{kind} of a multivariate distribution has no derived density"
        )
    shape = tuple(int(s) for s in dist.shape)
    ndim = len(shape)
    if axis is None:
        reduced = tuple(range(ndim))
    else:
        ax = (axis,) if isinstance(axis, int) else tuple(axis)
        reduced = tuple(sorted(a % ndim for a in ax))
    if reduced != tuple(range(ndim)):
        raise TypeError(
            f"{kind} over a partial axis subset is not measurable — the "
            "un-reduced components remain random; reduce over all axes "
            "(reference logprob/order.py)"
        )
    for pname in dist.param_names:
        p = getattr(dist, pname, None)
        if p is None:
            continue
        if tuple(_shape_of(p)) != ():
            raise TypeError(
                f"{kind} order statistic requires iid components; parameter "
                f"{pname!r} varies across them"
            )
    n = 1
    for s in shape:
        n *= s
    if n < 1:
        raise TypeError(f"{kind} of an empty variable has no density")
    base = change_dist_size(dist, ())
    return (Max if kind == "max" else Min).dist(base, n)


# ---------------------------------------------------------------- the walk
# Conditioning context: named RVs listed here are treated as RESOLVED
# (their values come from the evaluation env at density time), mirroring the
# reference's conditional_logp semantics where every value-mapped RV is a
# constant in every OTHER density term (reference logprob/basic.py:206
# conditional_logp). Set via `conditioned_on` around dist_from_expression —
# pm.logp(expr, v, env={...}) conditions on env's keys automatically.
_CONDITIONED = [frozenset()]


class conditioned_on:
    """Context manager: treat the named RVs as env-resolved constants
    during expression pattern matching."""

    def __init__(self, names):
        self.names = frozenset(names or ())

    def __enter__(self):
        self._prev = _CONDITIONED[0]
        _CONDITIONED[0] = self._prev | self.names
        return self

    def __exit__(self, *exc):
        _CONDITIONED[0] = self._prev
        return False


def _is_rv_free(x):
    """True when operand contributes no randomness (usable as a constant):
    no RV ancestors, or every RV ancestor is conditioned on (its value
    resolves from the env, so it is a constant in this density)."""
    if not isinstance(x, Node):
        return True
    rvs = rv_ancestors([x])
    if not rvs:
        return True
    cond = _CONDITIONED[0]
    return bool(cond) and all(getattr(r, "name", None) in cond for r in rvs)


def _density_rv_ancestors(x):
    """RV leaves reachable through DENSITY-BEARING positions only: selector
    slots (switch conditions, random-mixture indices) resolve from the env,
    so RVs appearing only there do not couple into the branch density.
    Conditioned-on RVs are likewise excluded."""
    out, seen, stack = [], set(), [x]
    cond = _CONDITIONED[0]
    while stack:
        n = stack.pop()
        if not isinstance(n, Node) or id(n) in seen:
            continue
        seen.add(id(n))
        if isinstance(n, (FreeRV, ObservedRV)):
            if getattr(n, "name", None) not in cond:
                out.append(n)
            continue
        args = list(getattr(n, "args", ()))
        fn = getattr(n, "fn", None)
        base_fn = getattr(fn, "_base_fn", fn)
        if base_fn is jnp.where and len(args) == 3:
            args = args[1:]  # the condition is a selector slot
        elif getattr(fn, "_measurable_index", 1) is None:
            args = args[:1]  # random index args are selector slots
        stack.extend(a for a in args if isinstance(a, Node))
    return out


def dist_from_expression(node):
    """Pattern-match an invertible elementwise-op chain over one RV leaf
    OR a measurable join (stack/concatenate) of component expressions.

    Returns a :class:`TransformedDistribution` / :class:`StackedDistribution`;
    raises TypeError when the expression is not a recognized measurable
    transform.
    """
    ops = []  # outer-to-inner
    current = node
    base = None
    while isinstance(current, DeterministicNode):
        join = getattr(current.fn, "_measurable_join", None)
        if join is not None:
            base = StackedDistribution._make(join[0], join[1], current)
            break
        red = getattr(current.fn, "_measurable_reduction", None)
        if red is not None:
            base = _match_order_reduction(current, *red)
            break
        argext = getattr(current.fn, "_measurable_argext", None)
        if argext is not None:
            base = _match_argext(current, *argext)
            break
        if hasattr(current.fn, "_measurable_index"):
            base = _match_index(current, current.fn._measurable_index)
            break
        cs = getattr(current.fn, "_measurable_cumsum", None)
        if cs is not None:
            base = _match_cumsum(current, cs[0])
            break
        castdt = getattr(current.fn, "_measurable_cast", None)
        if castdt is not None:
            matched = _match_cast(current, castdt, bool(ops))
            if matched is None:
                # measure-preserving relabel: transparent in the chain
                current = [a for a in current.args if isinstance(a, Node)][0]
                continue
            base = matched
            break
        fn = current.fn
        fn = getattr(fn, "_base_fn", fn)
        if fn is jnp.broadcast_to:
            if ops:
                raise TypeError(
                    "broadcast_to(...) is only measurable when directly "
                    "valued: the broadcast copies are degenerate, so a "
                    "transform's Jacobian over them would be counted once "
                    "per copy (reference find_measurable_broadcast claims "
                    "only directly-valued broadcasts)"
                )
            base = _match_broadcast(current)
            break
        if fn is jnp.where:
            matched = _match_switch_scale(current)
            if matched is not None:
                op, leaf = matched
                ops.append(op)
                current = leaf
                continue
            mix = _match_switch_mixture(current)
            if mix is None:
                raise TypeError(
                    "switch(...) is only measurable as the non-overlapping "
                    "form switch(x > 0, s_pos * x, s_neg * x) with positive "
                    "RV-free scales, or as a component-selection mixture "
                    "switch(cond, comp_true, comp_false) with an RV-free "
                    "condition (reference logprob switch/mixture rewrites)"
                )
            base = mix
            break
        if fn in (jnp.matmul, jnp.dot):
            if ops:
                raise TypeError(
                    "elementwise transforms OVER a matmul-coupled density "
                    "are not supported; apply the linear map outermost"
                )
            base = _match_matmul(current)
            break
        if fn in _CENSORING_FNS:
            if ops:
                raise TypeError(
                    "censoring (clip/maximum/minimum) pools probability mass "
                    "at the bounds; an elementwise transform OVER a censored "
                    "expression has no derived density (the Jacobian does "
                    "not apply at the atoms) — censor outermost, or use "
                    "pm.Censored explicitly"
                )
            return _match_censoring(current)
        if fn in _ROUNDING_FNS:
            base = _match_rounding(current, _ROUNDING_FNS[fn])
            break
        if (
            getattr(current.fn, "_measurable_layout", None) is not None
            or fn in (jnp.reshape, jnp.ravel, jnp.squeeze, jnp.expand_dims,
                      jnp.transpose, jnp.swapaxes, jnp.moveaxis)
        ):
            base = _match_layout(current)
            break
        if fn in _FOLD_FNS:
            args = [a for a in current.args if isinstance(a, Node)]
            if len(current.args) != 1 or len(args) != 1:
                raise TypeError(
                    f"measurable {_FOLD_FNS[fn]} must be unary"
                )
            kind = _FOLD_FNS[fn]
            base = FoldedDistribution._make(
                _inner_dist(args[0]),
                "pow" if kind == "square" else kind,
                power=2.0 if kind == "square" else None,
            )
            break
        if fn in _NON_INVERTIBLE:
            raise TypeError(
                f"{_NON_INVERTIBLE[fn]}(...) is not invertible — no derived "
                "density. Use explicit combinators (Censored, Discretized, "
                "OrderStatistic, CustomDist) for non-bijective maps."
            )
        if fn in _UNARY:
            args = [a for a in current.args if isinstance(a, Node)]
            if len(current.args) != 1 or len(args) != 1:
                raise TypeError(
                    f"measurable {getattr(fn, '__name__', fn)} must be unary"
                )
            ops.append(_UNARY[fn]())
            current = args[0]
            continue
        if fn in _BINARY:
            if len(current.args) != 2:
                raise TypeError("measurable binary op must have 2 operands")
            a, b = current.args
            a_free, b_free = _is_rv_free(a), _is_rv_free(b)
            if a_free == b_free:
                # t / (1 + t) with a SHARED t: the odds-to-probability map
                # (reference canonicalizes exp(x)/(1+exp(x)) to sigmoid(x)
                # via graph rewrites; we match the shared-node ratio)
                shared = _match_odds_ratio(current, fn, a, b)
                if shared is not None:
                    ops.append(
                        _Op(
                            "odds",
                            lambda x, c: x / (1.0 + x),
                            lambda y, c: y / (1.0 - y),
                            lambda y, c: -2.0 * jnp.log(jnp.abs(1.0 - y)),
                            None,  # pole at t = -1: direction undetermined
                        )
                    )
                    current = shared
                    continue
                raise TypeError(
                    "measurable binary op needs exactly one random operand "
                    "(expressions mixing two RVs have no derived density here)"
                )
            const, rv_side, const_first = (
                (a, b, True) if a_free else (b, a, False)
            )
            if fn is jnp.power and not const_first and not isinstance(
                const, Node
            ):
                p = np.asarray(const)
                if p.ndim == 0 and float(p) != 0 and float(p).is_integer() \
                        and int(p) % 2 == 0:
                    # even power: two-branch folded density
                    base = FoldedDistribution._make(
                        _inner_dist(rv_side), "pow", power=float(p)
                    )
                    break
            ops.append(_BINARY[fn](const, const_first))
            current = rv_side
            continue
        raise TypeError(
            f"no derived density for op {getattr(fn, '__name__', fn)!r}"
        )
    if base is None:
        if not isinstance(current, (FreeRV, ObservedRV)):
            raise TypeError(
                f"measurable-transform chain must terminate at a random "
                f"variable, found {type(current).__name__}"
            )
        if not ops:
            raise TypeError("expression is the bare RV; use its distribution")
        base = current.dist
    elif not ops:
        return base
    if getattr(base, "_requires_direct_value", False):
        raise TypeError(
            "this layout moves the event block of a multivariate "
            "distribution off the trailing axes — it is only measurable "
            "when directly valued (reference find_measurable_dimshuffles "
            "claims transposing multivariate dimshuffles only when "
            "directly valued)"
        )
    if getattr(base, "_mixed_discrete", False):
        raise TypeError(
            "elementwise transforms over a join mixing discrete and "
            "continuous components are not measurable (the Jacobian applies "
            "only to the continuous part)"
        )
    if getattr(base, "_has_atoms", False):
        raise TypeError(
            "elementwise transforms over a mixture with point-mass "
            "(deterministic) components are not measurable — the Jacobian "
            "does not apply at the atoms"
        )
    return TransformedDistribution._make(base, ops)


# ----------------------------------------------------------- distribution
class FoldedDistribution(Distribution):
    """Non-injective elementwise map with two monotone branches ±b(y):
    ``abs(x)``, even powers ``x**p``, and ``cosh(x)``.

    Parity: reference pymc/logprob/transforms.py AbsTransform:908-921,
    PowerTransform (even powers):923-965, CoshTransform:674-690 and
    tests/logprob/test_transforms.py test_absolute_rv_transform /
    test_negative_value_even_power_transform_logp / test_cosh_rv_transform.
    The density is the sum over the two pre-images; the cdf family is
    undefined (the reference raises NotImplementedError likewise).
    """

    param_names = ()
    event_ndim = 0

    @classmethod
    def _make(cls, base, kind, power=None):
        if base.is_discrete:
            raise TypeError(
                f"measurable {kind} of a discrete variable is not supported "
                "(the branch densities double-count the fold point)"
            )
        if len(getattr(base, "event_shape", ())):
            raise TypeError(
                f"measurable {kind} of a multivariate distribution folds "
                "2**d sign combinations per event — no derived density"
            )
        obj = object.__new__(cls)
        obj._shape_arg = None
        obj._shape_node = None
        obj._size_arg = None
        obj.base = base
        obj.kind = kind
        obj._power = None if power is None else float(power)
        obj.is_discrete = False
        obj.batch_shape = tuple(base.shape)
        obj.event_shape = ()
        return obj

    @property
    def dtype(self):
        from ..config import floatX

        return floatX()

    def _forward(self, x):
        if self.kind == "abs":
            return jnp.abs(x)
        if self.kind == "cosh":
            return jnp.cosh(x)
        return x ** self._power

    def _fold(self, y):
        """(valid mask, positive pre-image at the clamped value, ljd)."""
        if self.kind == "abs":
            m = y >= 0
            ys = jnp.where(m, y, 1.0)
            return m, ys, jnp.zeros_like(ys)
        if self.kind == "cosh":
            m = y >= 1.0
            ys = jnp.where(m, y, 2.0)
            return m, jnp.arccosh(ys), -0.5 * jnp.log(ys * ys - 1.0)
        p = self._power
        m = (y > 0) if p < 0 else (y >= 0)
        ys = jnp.where(m, y, 1.0)
        ljd = -_pymath.log(abs(p)) + (1.0 / p - 1.0) * jnp.log(ys)
        return m, ys ** (1.0 / p), ljd

    def logp(self, value, env=None, memo=None):
        m, xp, ljd = self._fold(jnp.asarray(value))
        lp = (
            jnp.logaddexp(
                self.base.logp(-xp, env, memo), self.base.logp(xp, env, memo)
            )
            + ljd
        )
        lp = jnp.where(m, lp, -jnp.inf)
        return jnp.broadcast_to(
            lp, jnp.broadcast_shapes(jnp.shape(lp), tuple(self.batch_shape))
        )

    def logcdf(self, value, env=None, memo=None):
        raise NotImplementedError(
            f"logcdf of a folded ({self.kind}) transform is not implemented"
        )

    logccdf = logcdf

    def icdf(self, q, env=None, memo=None):
        raise NotImplementedError(
            f"icdf of a folded ({self.kind}) transform is not implemented"
        )

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        x = self.base.sample(key, sample_shape, env, memo)
        return jnp.broadcast_to(
            self._forward(x), tuple(sample_shape) + self.shape
        )

    def support_point(self, env=None, memo=None):
        return jnp.broadcast_to(
            self._forward(self.base.support_point(env, memo)), self.shape
        )


class TransformedDistribution(Distribution):
    """Invertible elementwise transform chain applied to a base dist.

    ``ops`` are stored outer-to-inner: value-space -> base-space walks the
    list forward through ``inverse``; sampling walks it backward through
    ``forward``.
    """

    param_names = ()
    event_ndim = 0

    @classmethod
    def _make(cls, base, ops):
        obj = object.__new__(cls)
        obj._shape_arg = None
        obj._shape_node = None
        obj._size_arg = None
        obj.base = base
        obj.ops = list(ops)
        obj.is_discrete = bool(base.is_discrete)
        if obj.is_discrete and any(
            getattr(op, "continuous_only", False) for op in ops
        ):
            raise TypeError(
                "measurable switch applies to continuous RVs only "
                "(reference logprob switch rewrite rejects discrete bases)"
            )
        shapes = [base.shape]
        for op in ops:
            c = op.const
            if c is None:
                continue
            consts = c if isinstance(c, tuple) else (c,)
            for ci in consts:
                shapes.append(tuple(getattr(ci, "shape", np.shape(ci))))
        full = tuple(np.broadcast_shapes(*shapes))
        # the transform is elementwise, so the event structure is the base's
        obj.event_shape = tuple(base.event_shape)
        ev = len(obj.event_shape)
        obj.batch_shape = full[: len(full) - ev] if ev else full
        return obj

    @property
    def _event_axes(self):
        ev = len(self.event_shape)
        return tuple(range(-ev, 0)) if ev else ()

    @property
    def dtype(self):
        from ..config import floatX

        # even discrete bases map to floats under these transforms
        return floatX()

    # -- helpers ---------------------------------------------------------
    def _to_base(self, value, env, memo):
        """value-space -> base-space, accumulating log|d inv / dy|."""
        x = jnp.asarray(value)
        acc = 0.0
        for op in self.ops:
            acc = acc + op.ljd_inv(x, env, memo)
            x = op.inverse(x, env, memo)
        return x, acc

    def _direction(self, env, memo):
        s = 1
        for op in self.ops:
            m = op.monotone(env, memo)
            if m is None:
                raise NotImplementedError(
                    f"cdf-family of a transformed RV needs a determinate "
                    f"monotone direction; op {op.name!r} is sign-ambiguous"
                )
            s *= m
        return s

    def _bcast(self, out):
        """Broadcast with the dist shape without squeezing the value shape."""
        return jnp.broadcast_to(
            out, jnp.broadcast_shapes(jnp.shape(out), self.shape)
        )

    def _bcast_density(self, out):
        """Densities are event-reduced: broadcast with batch shape only."""
        return jnp.broadcast_to(
            out, jnp.broadcast_shapes(jnp.shape(out), tuple(self.batch_shape))
        )

    # -- densities -------------------------------------------------------
    def logp(self, value, env=None, memo=None):
        x, ljd = self._to_base(value, env, memo)
        ax = self._event_axes
        if self.is_discrete:
            # counting measure: inverse must land on the integer lattice
            xr = jnp.round(x)
            on_lattice = jnp.isclose(x, xr, rtol=0, atol=1e-6)
            if ax:
                on_lattice = jnp.all(on_lattice, axis=ax)
            lp = jnp.where(on_lattice, self.base.logp(xr, env, memo), -jnp.inf)
            return self._bcast_density(lp)
        lp = self.base.logp(x, env, memo)
        if ax:
            # base logp is event-reduced; reduce the elementwise Jacobian too
            ljd = jnp.sum(jnp.broadcast_to(ljd, jnp.shape(x)), axis=ax)
        return self._bcast_density(lp + ljd)

    def logcdf(self, value, env=None, memo=None):
        s = self._direction(env, memo)
        x, _ = self._to_base(value, env, memo)
        if s > 0:
            return self._bcast_density(self.base.logcdf(x, env, memo))
        if self.is_discrete:
            raise NotImplementedError(
                "logcdf of a decreasing transform of a discrete RV"
            )
        return self._bcast_density(self.base.logccdf(x, env, memo))

    def logccdf(self, value, env=None, memo=None):
        s = self._direction(env, memo)
        x, _ = self._to_base(value, env, memo)
        if s > 0:
            return self._bcast_density(self.base.logccdf(x, env, memo))
        if self.is_discrete:
            raise NotImplementedError(
                "logccdf of a decreasing transform of a discrete RV"
            )
        return self._bcast_density(self.base.logcdf(x, env, memo))

    def icdf(self, q, env=None, memo=None):
        s = self._direction(env, memo)
        q = jnp.asarray(q)
        base_q = q if s > 0 else 1.0 - q
        x = self.base.icdf(base_q, env, memo)
        for op in reversed(self.ops):
            x = op.forward(x, env, memo)
        return self._bcast(x)

    # -- sampling --------------------------------------------------------
    def sample(self, key, sample_shape=(), env=None, memo=None):
        x = self.base.sample(key, sample_shape, env, memo)
        for op in reversed(self.ops):
            x = op.forward(x, env, memo)
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        return jnp.broadcast_to(
            x, tuple(sample_shape) + self.shape
        )

    def support_point(self, env=None, memo=None):
        x = self.base.support_point(env, memo)
        for op in reversed(self.ops):
            x = op.forward(x, env, memo)
        return jnp.broadcast_to(x, self.shape)


# ----------------------------------------------------- measurable joins
class _Part:
    """One component of a measurable stack/concatenate.

    kind: "rv" (a named FreeRV/ObservedRV — its value is injected into the
    env so later components' parameters may depend on it, the chain-rule
    factorization of reference logprob/tensor.py's interdependent joins),
    "expr" (a derived-density expression), or "const" (RV-free: point mass).
    """

    def __init__(self, kind, node, dist, shape, size):
        self.kind = kind
        self.node = node
        self.dist = dist
        self.shape = shape  # component shape (static)
        self.size = size  # length along the join axis (concatenate only)


def _chain_leaves(node):
    """The random LEAF nodes of a measurable expression (not conditioning
    parents): the RV(s) a transform chain / join terminates at."""
    current = node
    while isinstance(current, DeterministicNode):
        if getattr(current.fn, "_measurable_join", None) is not None:
            leaves = []
            for a in current.args:
                if isinstance(a, Node) and rv_ancestors([a]):
                    leaves.extend(_chain_leaves(a))
            return leaves
        rand = [
            a for a in current.args if isinstance(a, Node) and rv_ancestors([a])
        ]
        if len(rand) != 1:
            return []
        current = rand[0]
    return [current] if isinstance(current, (FreeRV, ObservedRV)) else []


class StackedDistribution(Distribution):
    """Joint density of ``stack([...])`` / ``concatenate([...])`` over
    independent-or-sequentially-dependent component expressions.

    Parity: reference pymc/logprob/tensor.py (MeasurableMakeVector:44-85,
    MeasurableJoin:88-157) and tests/logprob/test_tensor.py. The logp is
    ELEMENTWISE: each component's (conditional) log-density occupies its
    slice of the value's layout, so summation yields the joint. Components
    must share one support ndim (mixing univariate and multivariate raises,
    reference logprob_join); multivariate joins collapse each component's
    event block before re-joining the batch logps. Interdependent
    components factorize by the chain rule — each named RV's value slice is
    injected into the evaluation env before later components' parameters
    resolve.
    """

    param_names = ()
    event_ndim = 0

    @classmethod
    def _make(cls, kind, axis, node):
        parts = []
        for arg in node.args:
            if isinstance(arg, (FreeRV, ObservedRV)):
                parts.append(
                    _Part("rv", arg, arg.dist, tuple(arg.shape), None)
                )
            elif isinstance(arg, Node) and rv_ancestors([arg]):
                d = dist_from_expression(arg)
                parts.append(_Part("expr", arg, d, tuple(d.shape), None))
            else:
                shape = tuple(getattr(arg, "shape", np.shape(arg)))
                parts.append(_Part("const", arg, None, shape, None))

        # components must share one support ndim (reference logprob_join
        # raises when mixing univariate and multivariate logps; constants
        # are point masses with support ndim 0)
        supp_ndims = {
            len(getattr(p.dist, "event_shape", ()))
            for p in parts
            if p.dist is not None
        }
        if any(p.dist is None for p in parts):
            supp_ndims.add(0)
        if len(supp_ndims) > 1:
            raise ValueError(
                "Joined logps have different number of dimensions, this can "
                "happen when joining univariate and multivariate "
                "distributions"
            )
        k = supp_ndims.pop() if supp_ndims else 0

        seen = set()
        for leaf in _chain_leaves(node):
            if id(leaf) in seen:
                raise TypeError(
                    f"random variable {getattr(leaf, 'name', leaf)!r} is the "
                    "random leaf of more than one join component — the joint "
                    "density of a replicated RV is not measurable (it may "
                    "still CONDITION later components through its parameters)"
                )
            seen.add(id(leaf))

        obj = object.__new__(cls)
        obj._shape_arg = None
        obj._shape_node = None
        obj._size_arg = None
        obj.kind = kind
        obj.parts = parts
        full = tuple(node.shape)
        # store the join axis from the right so values with extra leading
        # batch dims split correctly
        ax = axis if axis < 0 else axis - len(full)
        obj.axis = ax
        obj._event_k = k
        obj._support_concat = False
        if k:
            if kind == "stack":
                if -ax <= k:
                    raise TypeError(
                        "measurable stack of multivariate components must "
                        "stack along a batch axis (the inserted axis lands "
                        "inside the event block)"
                    )
            else:
                # concatenating along an event axis fuses the components
                # into ONE joint event: per-component logps are batch-shaped
                # and SUM (reference logprob_join clips the concat axis into
                # the reduced logp and concatenates — the total is the same)
                obj._support_concat = -ax <= k
        if kind == "concatenate":
            for p in parts:
                p.size = p.shape[ax] if len(p.shape) >= -ax else 1
        discretes = [
            (p.dist.is_discrete if p.dist is not None else True) for p in parts
        ]
        obj.is_discrete = all(discretes)
        obj._mixed_discrete = len(set(discretes)) > 1
        obj.event_ndim = k
        obj.event_shape = full[len(full) - k:] if k else ()
        obj.batch_shape = full[: len(full) - k] if k else full
        return obj

    @property
    def dtype(self):
        from ..config import floatX

        return floatX()

    # -- split / join ----------------------------------------------------
    def _split(self, value):
        value = jnp.asarray(value)
        if self.kind == "stack":
            return [jnp.take(value, i, axis=self.axis) for i in range(len(self.parts))]
        out, start = [], 0
        for p in self.parts:
            out.append(
                jnp.take(value, jnp.arange(start, start + p.size), axis=self.axis)
            )
            start += p.size
        return out

    def _join(self, pieces, extra_shape=()):
        if self.kind == "stack":
            target = tuple(extra_shape) + tuple(
                np.broadcast_shapes(*(p.shape for p in self.parts))
            )
            pieces = [jnp.broadcast_to(x, target) for x in pieces]
            return jnp.stack(pieces, axis=self.axis)
        pieces2 = []
        for p, x in zip(self.parts, pieces):
            pieces2.append(jnp.broadcast_to(x, tuple(extra_shape) + p.shape))
        return jnp.concatenate(pieces2, axis=self.axis)

    def _resolve_const(self, c, env, memo):
        if isinstance(c, Node):
            return c._eval(env, memo if memo is not None else {})
        return jnp.asarray(c)

    # -- densities -------------------------------------------------------
    def _conditional_terms(self, value, env, memo, method):
        slices = self._split(value)
        env2 = dict(env or {})
        for p, sl in zip(self.parts, slices):
            if p.kind == "rv":
                env2[p.node.name] = sl
        out = []
        for p, sl in zip(self.parts, slices):
            if p.kind == "const":
                c = self._resolve_const(p.node, env2, memo)
                match = jnp.isclose(
                    jnp.asarray(sl, dtype=self.dtype),
                    jnp.asarray(c, dtype=self.dtype),
                )
                if method == "logp":
                    term = jnp.where(match, 0.0, -jnp.inf)
                else:
                    raise NotImplementedError(
                        "cdf-family is undefined for a constant join component"
                    )
            else:
                # fresh memo: env2 differs from the caller's env
                term = getattr(p.dist, method)(sl, env2, None)
            out.append(jnp.broadcast_to(term, jnp.shape(sl)))
        return out

    def logp(self, value, env=None, memo=None):
        if self._event_k:
            return self._multivariate_logp(value, env, memo)
        return self._join_like_value(
            value, self._conditional_terms(value, env, memo, "logp")
        )

    def _multivariate_logp(self, value, env, memo):
        """Join of event_ndim>0 components (reference logprob_join
        multivariate path, tests/logprob/test_tensor.py
        test_measurable_join_multivariate): each component's logp collapses
        its own event block; batch-axis joins re-join the batch logps at the
        axis shifted past the event dims, event-axis concats sum (the value
        split hands every component its complete event)."""
        k = self._event_k
        slices = self._split(value)
        env2 = dict(env or {})
        for p, sl in zip(self.parts, slices):
            if p.kind == "rv":
                env2[p.node.name] = sl
        terms = []
        for p, sl in zip(self.parts, slices):
            t = p.dist.logp(sl, env2, None)
            batch = jnp.shape(jnp.asarray(sl))[: jnp.asarray(sl).ndim - k]
            terms.append(jnp.broadcast_to(t, batch))
        if self.kind == "stack":
            return jnp.stack(terms, axis=self.axis + k)
        if self._support_concat:
            out = terms[0]
            for t in terms[1:]:
                out = out + t
            return out
        return jnp.concatenate(terms, axis=self.axis + k)

    def logcdf(self, value, env=None, memo=None):
        """Elementwise (conditional) marginal logcdf per component slice."""
        if self._event_k:
            raise NotImplementedError(
                "cdf-family of a multivariate join is not defined "
                "componentwise"
            )
        return self._join_like_value(
            value, self._conditional_terms(value, env, memo, "logcdf")
        )

    def logccdf(self, value, env=None, memo=None):
        if self._event_k:
            raise NotImplementedError(
                "cdf-family of a multivariate join is not defined "
                "componentwise"
            )
        return self._join_like_value(
            value, self._conditional_terms(value, env, memo, "logccdf")
        )

    def _join_like_value(self, value, pieces):
        extra = jnp.shape(jnp.asarray(value))[: jnp.asarray(value).ndim - len(self.shape)]
        return self._join(pieces, extra_shape=extra)

    def icdf(self, q, env=None, memo=None):
        raise NotImplementedError(
            "icdf of a joint stacked density is not defined componentwise"
        )

    # -- sampling --------------------------------------------------------
    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        sample_shape = tuple(sample_shape)
        keys = jax.random.split(key, len(self.parts))
        env2 = dict(env or {})
        draws = []
        for p, k in zip(self.parts, keys):
            if p.kind == "const":
                x = jnp.broadcast_to(
                    self._resolve_const(p.node, env2, memo), sample_shape + p.shape
                )
            else:
                x = p.dist.sample(k, sample_shape, env2, None)
            if p.kind == "rv":
                env2[p.node.name] = x
            draws.append(x)
        return self._join(draws, extra_shape=sample_shape)

    def support_point(self, env=None, memo=None):
        env2 = dict(env or {})
        out = []
        for p in self.parts:
            if p.kind == "const":
                x = jnp.broadcast_to(self._resolve_const(p.node, env2, memo), p.shape)
            else:
                x = p.dist.support_point(env2, None)
            if p.kind == "rv":
                env2[p.node.name] = x
            out.append(x)
        return self._join(out)


class LayoutDistribution(Distribution):
    """Index-bijective layout op (transpose / C-order reshape) over a
    scalar-event base distribution: every element keeps its own density, so
    logp/logcdf/icdf ride the same re-indexing with no Jacobian.

    Parity: reference pymc/logprob/tensor.py:255 (MeasurableDimShuffle).
    """

    param_names = ()
    event_ndim = 0

    @classmethod
    def _make(cls, base, fwd, inv, out_shape, dfwd=None, event_k=0,
              requires_direct=False):
        obj = object.__new__(cls)
        obj._shape_arg = None
        obj._shape_node = None
        obj._size_arg = None
        obj.base = base
        obj._fwd = fwd   # plain instance attrs: no binding
        obj._inv = inv
        obj._dfwd = dfwd if dfwd is not None else fwd
        obj._event_k = int(event_k)
        obj._requires_direct_value = bool(requires_direct)
        obj.is_discrete = bool(base.is_discrete)
        obj._mixed_discrete = bool(getattr(base, "_mixed_discrete", False))
        out_shape = tuple(out_shape)
        if event_k and not requires_direct:
            obj.event_ndim = int(event_k)
            obj.event_shape = out_shape[len(out_shape) - event_k:]
            obj.batch_shape = out_shape[: len(out_shape) - event_k]
        else:
            obj.batch_shape = out_shape
            obj.event_shape = ()
        return obj

    @property
    def dtype(self):
        return self.base.dtype

    def logp(self, value, env=None, memo=None):
        return self._dfwd(
            self.base.logp(self._inv(jnp.asarray(value)), env, memo)
        )

    def _cdf_guard(self):
        if self._event_k:
            raise NotImplementedError(
                "cdf-family of a layout over a multivariate distribution is "
                "not defined elementwise"
            )

    def logcdf(self, value, env=None, memo=None):
        self._cdf_guard()
        return self._fwd(self.base.logcdf(self._inv(jnp.asarray(value)), env, memo))

    def logccdf(self, value, env=None, memo=None):
        self._cdf_guard()
        return self._fwd(self.base.logccdf(self._inv(jnp.asarray(value)), env, memo))

    def icdf(self, q, env=None, memo=None):
        self._cdf_guard()
        return self._fwd(self.base.icdf(self._inv(jnp.asarray(q)), env, memo))

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        return self._fwd(self.base.sample(key, sample_shape, env, memo))

    def support_point(self, env=None, memo=None):
        return self._fwd(self.base.support_point(env, memo))


class _DtypeView(Distribution):
    """Measure-preserving dtype relabel of a base distribution.

    Parity: reference pymc/logprob/tensor.py MeasurableCast
    (cast_logprob:533-540, cast_logcdf:543-548, cast_icdf:551-553). The
    logp value is passed through AS IS — casting it back could silently map
    impossible values onto possible ones (1.5 -> 1 for an integer base);
    the cdf floors float values against a discrete base
    (P(cast(X) <= 1.5) = P(X <= 1)); the icdf carries the relabeled dtype.
    """

    param_names = ()

    @classmethod
    def _make(cls, base, dtype):
        obj = object.__new__(cls)
        obj._shape_arg = None
        obj._shape_node = None
        obj._size_arg = None
        obj.base = base
        obj._out_dtype = np.dtype(dtype)
        obj.is_discrete = bool(base.is_discrete)
        obj._mixed_discrete = bool(getattr(base, "_mixed_discrete", False))
        obj._has_atoms = bool(getattr(base, "_has_atoms", False))
        obj.event_ndim = len(getattr(base, "event_shape", ()))
        obj.event_shape = tuple(getattr(base, "event_shape", ()))
        obj.batch_shape = tuple(base.batch_shape)
        return obj

    @property
    def dtype(self):
        return self._out_dtype

    def logp(self, value, env=None, memo=None):
        return self.base.logp(value, env, memo)

    def _floor_if_discrete(self, value):
        v = jnp.asarray(value)
        if self.base.is_discrete and jnp.issubdtype(v.dtype, jnp.floating):
            return jnp.floor(v)
        return v

    def logcdf(self, value, env=None, memo=None):
        return self.base.logcdf(self._floor_if_discrete(value), env, memo)

    def logccdf(self, value, env=None, memo=None):
        return self.base.logccdf(self._floor_if_discrete(value), env, memo)

    def icdf(self, q, env=None, memo=None):
        return jnp.asarray(self.base.icdf(q, env, memo)).astype(
            self._out_dtype
        )

    def sample(self, key, sample_shape=(), env=None, memo=None):
        return jnp.asarray(
            self.base.sample(key, sample_shape, env, memo)
        ).astype(self._out_dtype)

    def support_point(self, env=None, memo=None):
        return jnp.asarray(self.base.support_point(env, memo)).astype(
            self._out_dtype
        )


class BroadcastDistribution(Distribution):
    """Directly-valued ``broadcast_to(rv, shape)``.

    Parity: reference pymc/logprob/tensor.py broadcast_logprob:367-436. The
    broadcast copies are degenerate duplicates of the base entries, so they
    are consumed like support dimensions: the logp is the base logp of the
    de-duplicated value, and -inf wherever the value could not have
    originated by broadcasting (copies disagree). The consistency check is
    elementwise over the surviving batch dimensions.
    """

    param_names = ()

    @classmethod
    def _make(cls, base, in_shape, out_shape):
        obj = object.__new__(cls)
        obj._shape_arg = None
        obj._shape_node = None
        obj._size_arg = None
        obj.base = base
        obj._in_shape = tuple(in_shape)
        obj._out_shape = tuple(out_shape)
        obj.is_discrete = bool(base.is_discrete)
        obj._mixed_discrete = bool(getattr(base, "_mixed_discrete", False))
        ev = len(getattr(base, "event_shape", ()))
        n_new = len(out_shape) - len(in_shape)
        obj._n_new = n_new
        obj._ev = ev
        # base batch axes (in base coords) that the broadcast fans out
        obj._bcast_dims = tuple(
            i
            for i in range(len(in_shape))
            if in_shape[i] == 1 and out_shape[i + n_new] != 1
        )
        # the density output drops the expanded/broadcast axes: its shape is
        # the base batch shape with the broadcast axes squeezed
        batch = [
            s
            for i, s in enumerate(in_shape[: len(in_shape) - ev])
            if i not in obj._bcast_dims
        ]
        obj.batch_shape = tuple(batch)
        obj.event_shape = ()
        obj._requires_direct_value = True
        return obj

    @property
    def dtype(self):
        return self.base.dtype

    def logp(self, value, env=None, memo=None):
        value = jnp.asarray(value)
        out = self._out_shape
        n_new = self._n_new
        lead = value.ndim - len(out)
        bdims = tuple(d + n_new for d in self._bcast_dims)
        expanded = tuple(range(n_new))
        idx = (slice(None),) * lead + tuple(
            0 if (i in expanded or i in bdims) else slice(None)
            for i in range(len(out))
        )
        unb = value[idx]
        if self._bcast_dims:
            unb = jnp.expand_dims(
                unb, tuple(lead + d for d in self._bcast_dims)
            )
        lp = self.base.logp(unb, env, memo)
        # broadcast batch axes are consumed like support dims
        squeeze = tuple(
            lead + d
            for d in self._bcast_dims
            if lead + d < lp.ndim and lp.shape[lead + d] == 1
        )
        if squeeze:
            lp = jnp.squeeze(lp, axis=squeeze)
        # copies must agree, elementwise over the surviving batch axes
        valid = jnp.broadcast_to(
            unb, value.shape[:lead] + out
        )
        core = tuple(range(len(out) - self._ev, len(out)))
        reduced = tuple(
            lead + a for a in sorted({*expanded, *bdims, *core})
        )
        check = jnp.all(value == valid, axis=reduced) if reduced else (
            value == valid
        )
        return jnp.where(check, lp, -jnp.inf)

    def logcdf(self, value, env=None, memo=None):
        raise NotImplementedError(
            "cdf-family of a broadcast RV is not defined (the copies are "
            "degenerate, not independent)"
        )

    logccdf = logcdf

    def icdf(self, q, env=None, memo=None):
        raise NotImplementedError(
            "icdf of a broadcast RV is not defined"
        )

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        x = self.base.sample(key, sample_shape, env, memo)
        x = jnp.reshape(
            x,
            tuple(sample_shape) + (1,) * self._n_new + self._in_shape,
        )
        return jnp.broadcast_to(x, tuple(sample_shape) + self._out_shape)

    def support_point(self, env=None, memo=None):
        return jnp.broadcast_to(
            self.base.support_point(env, memo), self._out_shape
        )


class SelectionDistribution(Distribution):
    """Marginal of basic-indexed independent components: for an elementwise
    base (batch components independent by construction), ``x[idx]`` keeps
    the selected components' product density and marginalizes the rest.

    Densities evaluate by scattering the value into a full-shape buffer
    (support_point filler keeps the discarded positions in-support) and
    selecting the same positions of the elementwise result.
    """

    param_names = ()
    event_ndim = 0

    @classmethod
    def _make(cls, base, idx_t, out_shape):
        obj = object.__new__(cls)
        obj._shape_arg = None
        obj._shape_node = None
        obj._size_arg = None
        obj.base = base
        obj.idx = tuple(idx_t)
        obj.is_discrete = bool(base.is_discrete)
        obj.batch_shape = tuple(out_shape)
        obj.event_shape = ()
        return obj

    @property
    def dtype(self):
        return self.base.dtype

    def _sel(self, lead_ndim):
        # the index applies to the FIRST base axes, after any leading
        # sample/batch dims
        return (slice(None),) * lead_ndim + self.idx

    def _through(self, method, value, env, memo):
        v = jnp.asarray(value)
        filler = self.base.support_point(env, memo)
        lead = v.shape[: v.ndim - len(self.shape)]
        full = jnp.broadcast_to(filler, lead + tuple(self.base.shape))
        full = full.astype(jnp.result_type(full.dtype, v.dtype))
        sel = self._sel(len(lead))
        full = full.at[sel].set(v)
        return getattr(self.base, method)(full, env, memo)[sel]

    def logp(self, value, env=None, memo=None):
        return self._through("logp", value, env, memo)

    def logcdf(self, value, env=None, memo=None):
        return self._through("logcdf", value, env, memo)

    def logccdf(self, value, env=None, memo=None):
        return self._through("logccdf", value, env, memo)

    def icdf(self, q, env=None, memo=None):
        # quantiles need an in-[0,1] filler, not the support point
        q = jnp.asarray(q)
        lead = q.shape[: q.ndim - len(self.shape)]
        sel = self._sel(len(lead))
        full = jnp.full(lead + tuple(self.base.shape), 0.5, dtype=q.dtype)
        full = full.at[sel].set(q)
        return self.base.icdf(full, env, memo)[sel]

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        draw = self.base.sample(key, sample_shape, env, memo)
        return draw[self._sel(len(tuple(sample_shape)))]

    def support_point(self, env=None, memo=None):
        pt = self.base.support_point(env, memo)
        return jnp.broadcast_to(pt, tuple(self.base.shape))[self._sel(0)]


class MixtureSelectionDistribution(Distribution):
    """Density of ``stack(comps)[I]`` CONDITIONAL on the random scalar index
    ``I``: the selected component's density, with out-of-range index values
    yielding -inf mass.

    The index value resolves from the evaluation env at density time — the
    same mechanism by which model logps condition on value variables
    (reference logprob/mixture.py:309 logprob_MixtureRV selects the
    component logp by ``eq(index_value, i)``). Forward sampling draws the
    index from its own distribution when the env carries no value for it.
    """

    param_names = ()
    event_ndim = 0

    @classmethod
    def _make(cls, comps, idx_node, out_shape):
        comps = list(comps)
        ev = {int(d.event_ndim) for d in comps}
        if len(ev) != 1:
            raise TypeError(
                "mixture components must share event structure"
            )
        obj = object.__new__(cls)
        obj._shape_arg = None
        obj._shape_node = None
        obj._size_arg = None
        obj.comps = comps
        obj.idx_node = idx_node
        obj.event_ndim = ev.pop()
        split = len(out_shape) - obj.event_ndim
        obj.batch_shape = tuple(out_shape[:split])
        obj.event_shape = tuple(out_shape[split:])
        from .distribution import DiracDelta

        obj.is_discrete = all(bool(d.is_discrete) for d in comps)
        obj._has_atoms = any(
            isinstance(d, DiracDelta) or getattr(d, "_has_atoms", False)
            for d in comps
        )
        return obj

    @property
    def dtype(self):
        return jnp.result_type(*[d.dtype for d in self.comps])

    def _index(self, env, memo):
        from ..graph import evaluate

        return jnp.asarray(evaluate(self.idx_node, env, memo))

    def _select(self, i, vals, oob):
        out = jnp.zeros(
            jnp.broadcast_shapes(*[jnp.shape(v) for v in vals]),
            dtype=jnp.result_type(*[jnp.asarray(v).dtype for v in vals]),
        )
        for k, v in enumerate(vals):
            out = out + jnp.where(jnp.equal(i, k), v, jnp.zeros_like(v))
        valid = jnp.logical_and(
            jnp.greater_equal(i, 0), jnp.less(i, len(self.comps))
        )
        return jnp.where(valid, out, oob)

    def _through(self, method, value, env, memo, oob):
        i = self._index(env, memo)
        vals = [getattr(d, method)(value, env, memo) for d in self.comps]
        return self._select(i, vals, oob)

    def logp(self, value, env=None, memo=None):
        return self._through("logp", value, env, memo, -jnp.inf)

    def logcdf(self, value, env=None, memo=None):
        return self._through("logcdf", value, env, memo, -jnp.inf)

    def logccdf(self, value, env=None, memo=None):
        return self._through("logccdf", value, env, memo, -jnp.inf)

    def icdf(self, q, env=None, memo=None):
        return self._through("icdf", q, env, memo, jnp.nan)

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        sample_shape = tuple(sample_shape)
        k_idx, k_comp = jax.random.split(key)
        try:
            i = self._index(env, memo)
        except KeyError:
            if not isinstance(self.idx_node, (FreeRV, ObservedRV)):
                raise
            i = self.idx_node.dist.sample(k_idx, sample_shape, env, memo)
        draws = [
            d.sample(jax.random.fold_in(k_comp, k), sample_shape, env, memo)
            for k, d in enumerate(self.comps)
        ]
        i = jnp.asarray(i)
        i_b = jnp.reshape(i, i.shape + (1,) * len(self.shape))
        out = jnp.zeros(
            jnp.broadcast_shapes(*[jnp.shape(v) for v in draws]),
            dtype=self.dtype,
        )
        for k, v in enumerate(draws):
            out = out + jnp.where(
                jnp.equal(i_b, k), v, jnp.zeros_like(v)
            ).astype(self.dtype)
        return out

    def support_point(self, env=None, memo=None):
        pts = [
            jnp.broadcast_to(d.support_point(env, memo), tuple(self.shape))
            for d in self.comps
        ]
        try:
            i = self._index(env, memo)
        except KeyError:
            return pts[0]
        return self._select(i, pts, jnp.nan)


class SwitchMixtureDistribution(Distribution):
    """Elementwise component-selection mixture ``switch(cond, d_true,
    d_false)`` (reference logprob/mixture.py:434 logprob_switch_mixture;
    :459 MeasurableIfElse for random conditions): every density/cdf query
    evaluates both components and selects per element. The condition may
    be RV-free (data-dependent fine) or a random expression DISJOINT from
    the branch RVs — in the latter case the density is conditional on the
    condition's env-resolved value, and forward sampling draws it.
    """

    param_names = ()
    event_ndim = 0

    @classmethod
    def _make(cls, cond, d_true, d_false, out_shape, has_atoms):
        obj = object.__new__(cls)
        obj._shape_arg = None
        obj._shape_node = None
        obj._size_arg = None
        obj.cond = cond
        obj.d_true = d_true
        obj.d_false = d_false
        obj.batch_shape = tuple(out_shape)
        obj.event_shape = ()
        obj.is_discrete = bool(d_true.is_discrete) and bool(
            d_false.is_discrete
        )
        obj._has_atoms = bool(has_atoms)
        return obj

    @property
    def dtype(self):
        return jnp.result_type(self.d_true.dtype, self.d_false.dtype)

    def _cond(self, env, memo):
        from ..graph import evaluate

        return jnp.asarray(evaluate(self.cond, env, memo))

    def _through(self, method, value, env, memo):
        c = self._cond(env, memo)
        t = getattr(self.d_true, method)(value, env, memo)
        f = getattr(self.d_false, method)(value, env, memo)
        return jnp.where(c, t, f)

    def logp(self, value, env=None, memo=None):
        return self._through("logp", value, env, memo)

    def logcdf(self, value, env=None, memo=None):
        return self._through("logcdf", value, env, memo)

    def logccdf(self, value, env=None, memo=None):
        return self._through("logccdf", value, env, memo)

    def icdf(self, q, env=None, memo=None):
        return self._through("icdf", q, env, memo)

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        sample_shape = tuple(sample_shape)
        kc, kt, kf = jax.random.split(key, 3)
        try:
            c = self._cond(env, memo)
        except KeyError:
            # random condition with no env value: draw it forward
            # (per-sample, like the reference's generative ifelse graph)
            from ..functions import _draw_expression

            if sample_shape:
                n = int(np.prod(sample_shape))
                c = _draw_expression(self.cond, kc, n)
                c = jnp.reshape(c, sample_shape + c.shape[1:])
            else:
                c = _draw_expression(self.cond, kc, 1)
        t = self.d_true.sample(kt, sample_shape, env, memo)
        f = self.d_false.sample(kf, sample_shape, env, memo)
        return jnp.where(c, t, f).astype(self.dtype)

    def support_point(self, env=None, memo=None):
        t = jnp.broadcast_to(
            self.d_true.support_point(env, memo), tuple(self.shape)
        )
        try:
            c = self._cond(env, memo)
        except KeyError:
            return t
        f = jnp.broadcast_to(
            self.d_false.support_point(env, memo), tuple(self.shape)
        )
        return jnp.where(c, t, f)


class MatMulDistribution(Distribution):
    """Linear change of variables ``y = A @ x`` (or ``x @ A``) for a square
    RV-free matrix A: ``logp_y(y) = logp_x(A^{-1} y) - k log|det A|`` with
    k the number of independently transformed columns (rows) of x.

    Reference parity: logprob/linalg.py MeasurableMatMul — with the
    Jacobian multiplicity corrected (see _match_matmul). The matmul couples
    the core axes, so the result is a JOINT density over them
    (event_ndim = x's core ndim); logcdf/icdf do not exist for the coupled
    block. A singular A yields -inf (XLA cannot raise).
    """

    param_names = ()
    event_ndim = 0

    @classmethod
    def _make(cls, base, A, right_measurable, core, out_shape):
        obj = object.__new__(cls)
        obj._shape_arg = None
        obj._shape_node = None
        obj._size_arg = None
        obj.base = base
        obj.A_op = A
        obj.right_measurable = bool(right_measurable)
        obj.core = int(core)
        obj.event_ndim = int(core)
        split = len(out_shape) - core
        obj.batch_shape = tuple(out_shape[:split])
        obj.event_shape = tuple(out_shape[split:])
        obj.is_discrete = False
        return obj

    @property
    def dtype(self):
        a_dtype = (
            self.A_op.dtype
            if isinstance(self.A_op, Node)
            else jnp.asarray(self.A_op).dtype
        )
        return jnp.result_type(self.base.dtype, a_dtype)

    def _A(self, env, memo):
        return jnp.asarray(evaluate(self.A_op, env, memo))

    def _x_from_y(self, A, y):
        if self.right_measurable:  # y = A @ x
            if self.core == 1:
                return jnp.linalg.solve(A, y[..., None])[..., 0]
            return jnp.linalg.solve(A, y)
        # y = x @ A
        if self.core == 1:
            return jnp.linalg.solve(jnp.swapaxes(A, -1, -2), y[..., None])[
                ..., 0
            ]
        return jnp.swapaxes(
            jnp.linalg.solve(
                jnp.swapaxes(A, -1, -2), jnp.swapaxes(y, -1, -2)
            ),
            -1,
            -2,
        )

    def _jac_count(self, y):
        if self.core == 1:
            return 1
        # columns transform under A @ x; rows under x @ A
        return y.shape[-1] if self.right_measurable else y.shape[-2]

    def logp(self, value, env=None, memo=None):
        y = jnp.asarray(value)
        A = self._A(env, memo)
        x_val = self._x_from_y(A, y)
        lp = self.base.logp(x_val, env, memo)
        target = y.ndim - self.core
        while jnp.ndim(lp) > target:
            lp = jnp.sum(lp, axis=-1)
        sign, sld = jnp.linalg.slogdet(A)
        lp = lp - self._jac_count(y) * sld
        return jnp.where(sign == 0, -jnp.inf, lp)

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        x = self.base.sample(key, tuple(sample_shape), env, memo)
        A = self._A(env, memo)
        if self.right_measurable:
            if self.core == 1:
                return jnp.matmul(A, x[..., None])[..., 0]
            return jnp.matmul(A, x)
        if self.core == 1:
            return jnp.matmul(x[..., None, :], A)[..., 0, :]
        return jnp.matmul(x, A)

    def support_point(self, env=None, memo=None):
        pt = jnp.broadcast_to(
            self.base.support_point(env, memo),
            tuple(self.base.shape),
        )
        A = self._A(env, memo)
        if self.right_measurable:
            if self.core == 1:
                return jnp.matmul(A, pt[..., None])[..., 0]
            return jnp.matmul(A, pt)
        if self.core == 1:
            return jnp.matmul(pt[..., None, :], A)[..., 0, :]
        return jnp.matmul(pt, A)
