"""Mixture distributions.

Parity: reference pymc/distributions/mixture.py (Mixture:356,
NormalMixture:497, ZeroInflatedPoisson:577, ZeroInflatedBinomial:641,
ZeroInflatedNegativeBinomial:705, HurdlePoisson:873,
HurdleNegativeBinomial:925, HurdleGamma:981, HurdleLogNormal:1037).

TPU-native design: instead of the reference's MixtureRV graph rewrites
(logprob/mixture.py:212), mixtures are explicit combinators — logp is a
logsumexp over component logps, sampling is a categorical gather. This is the
"derived density as combinator" strategy of SURVEY.md §7.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ..config import floatX, intX
from ..graph import apply, evaluate, is_node
from ..math import _log1mexp_jax
from .continuous import Gamma, LogNormal, Normal
from .dist_math import check_parameters
from .discrete import Binomial, NegativeBinomial, Poisson
from .distribution import Continuous, Discrete, Distribution, as_param

__all__ = [
    "Mixture",
    "NormalMixture",
    "ZeroInflatedPoisson",
    "ZeroInflatedBinomial",
    "ZeroInflatedNegativeBinomial",
    "HurdlePoisson",
    "HurdleNegativeBinomial",
    "HurdleGamma",
    "HurdleLogNormal",
]


class MixtureTransformWarning(UserWarning):
    """Reference mixture.py:288."""


def _same_expr(a, b):
    """Structural graph equality of two bound expressions (the role of the
    reference's equal_computations check in mixture_default_transform)."""
    from ..graph import ConstantNode, DeterministicNode, Node

    if a is b:
        return True
    if isinstance(a, Node) or isinstance(b, Node):
        if isinstance(a, DeterministicNode) and isinstance(b, DeterministicNode):
            return (
                a.fn is b.fn
                and a.kwargs == b.kwargs
                and len(a.args) == len(b.args)
                and all(_same_expr(x, y) for x, y in zip(a.args, b.args))
            )
        if isinstance(a, ConstantNode) and isinstance(b, ConstantNode):
            return bool(np.array_equal(a.value, b.value))
        # FreeRV/Data leaves compare by identity (handled by `a is b`)
        return False
    try:
        return bool(np.array_equal(np.asarray(a), np.asarray(b)))
    except Exception:
        return False


class Mixture(Distribution):
    """Finite mixture: w along its LAST axis indexes the components.

    comp_dists: a list of Distribution instances (one per component), or a
    single Distribution whose RIGHTMOST batch axis is the component axis
    (reference Mixture semantics, mixture.py:356).
    """

    param_names = ("w",)

    def __dist_init__(self, w, comp_dists):
        self.w = as_param(w)
        if isinstance(comp_dists, (tuple, list)) and len(comp_dists) == 1:
            # reference mixture.py:165-173: a singleton list means "mixture
            # across the last size dimension" of that one component
            import warnings

            warnings.warn(
                "Single component will be treated as a mixture across the "
                "last size dimension.\nTo disable this warning do not wrap "
                "the single component inside a list or tuple",
                UserWarning,
            )
            comp_dists = comp_dists[0]
        if (
            isinstance(comp_dists, (tuple, list))
            and len({d.is_discrete for d in comp_dists}) > 1
        ):
            # reference mixture.py:175-184
            raise ValueError(
                "All distributions in comp_dists must be either discrete "
                "or continuous.\nSee the following issue for more "
                "information: https://github.com/pymc-devs/pymc/issues/4511."
            )
        if isinstance(comp_dists, Distribution):
            self.comp_single = comp_dists
            self.comp_list = None
            ev_n = comp_dists.event_ndim
            cb = comp_dists.shape
            if ev_n:
                cb = cb[: len(cb) - ev_n]
            self._n_comp = cb[-1] if cb else None
            self.is_discrete = comp_dists.is_discrete
            self.event_ndim = ev_n
            if ev_n and self._n_comp is None:
                raise ValueError(
                    "single-dist Mixture over multivariate components needs "
                    "an explicit component (last batch) axis"
                )
        else:
            self.comp_single = None
            self.comp_list = list(comp_dists)
            self._n_comp = len(self.comp_list)
            self.is_discrete = all(d.is_discrete for d in self.comp_list)
            ev_ns = {d.event_ndim for d in self.comp_list}
            if len(ev_ns) > 1:
                # reference mixture.py:198-201
                raise ValueError(
                    "Mixture components must all have the same support "
                    f"dimensionality, got {sorted(ev_ns)}"
                )
            self.event_ndim = ev_ns.pop()
        from .distribution import _shape_of

        w_shape = _shape_of(self.w)
        if w_shape and self._n_comp is not None and w_shape[-1] != self._n_comp:
            raise ValueError(
                f"Mixture weights last axis {w_shape[-1]} != number of "
                f"components {self._n_comp}"
            )

    @property
    def support(self):
        # transform of the first component (reference picks shared transform
        # only when all components agree)
        comps = self.comp_list or [self.comp_single]
        sups = {c.support for c in comps}
        if len(sups) == 1:
            return sups.pop()
        return "real"

    @support.setter
    def support(self, v):
        pass

    def _interval_bounds(self):
        comps = self.comp_list or [self.comp_single]
        return comps[0]._interval_bounds()

    def _transform_warning(self):
        import warnings

        warnings.warn(
            "No safe default transform found for Mixture distribution. This "
            "can happen when components have different supports or default "
            "transforms.\nIf appropriate, you can specify a custom transform "
            "for more efficient sampling.",
            MixtureTransformWarning,
            stacklevel=2,
        )

    def default_transform(self):
        """Shared component transform, or None + MixtureTransformWarning when
        components disagree (reference mixture.py:292-345
        mixture_default_transform): all components must have the same
        transform TYPE, and Interval bounds must be structurally identical
        ([Uniform(0,1), Uniform(0,2)] gets NO transform)."""
        comps = self.comp_list if self.comp_list is not None else [self.comp_single]
        sups = {c.support for c in comps}
        if len(sups) != 1:
            self._transform_warning()
            return None
        if sups.pop() == "interval" and len(comps) > 1:
            b0 = comps[0]._interval_bounds()
            for c in comps[1:]:
                b = c._interval_bounds()
                if not (
                    _same_expr(b0[0], b[0]) and _same_expr(b0[1], b[1])
                ):
                    self._transform_warning()
                    return None
        return comps[0].default_transform()

    def _resolve_shapes(self):
        from .distribution import _shape_of

        ev_n = self.event_ndim
        w_batch = _shape_of(self.w)[:-1]
        if self.comp_list is not None:
            ev = (
                tuple(np.broadcast_shapes(
                    *[d.event_shape for d in self.comp_list]
                ))
                if ev_n else ()
            )
            comp_batch = [d.batch_shape for d in self.comp_list]
        else:
            ev = tuple(self.comp_single.event_shape)
            comp_batch = [self.comp_single.batch_shape[:-1]]
        nat = tuple(np.broadcast_shapes(w_batch, *comp_batch))
        if self._shape_arg is not None:
            full = tuple(self._shape_arg)
            batch = full[: len(full) - len(ev)] if ev else full
        elif self._size_arg is not None:
            batch = tuple(self._size_arg)
        else:
            batch = nat
        self.batch_shape = batch
        self.event_shape = ev

    def _comp_logps(self, value, env, memo):
        # per-component logps collapse the event dims (reference
        # mixture.py:476-484: components_logp stacked on a NEW last axis)
        if self.comp_list is not None:
            lps = jnp.broadcast_arrays(
                *[d.logp(value, env, memo) for d in self.comp_list]
            )
            return jnp.stack(lps, axis=-1)
        # single dist with component axis at -event_ndim-1: broadcast the
        # value against it (reference mix_axis semantics, mixture.py:108)
        value = jnp.expand_dims(value, axis=-(self.event_ndim + 1))
        return self.comp_single.logp(value, env, memo)

    def logp(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        w = evaluate(self.w, env, memo)
        value = self._cast_value(value)
        comp_logps = self._comp_logps(value, env, memo)
        log_w = jnp.log(jnp.clip(w, 1e-30, None)) - jnp.log(
            jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1e-30, None)
        )
        res = logsumexp(log_w + comp_logps, axis=-1)
        return check_parameters(
            res,
            jnp.all(w >= 0, axis=-1),
            jnp.abs(jnp.sum(w, axis=-1) - 1.0) < 1e-6,
        )

    def _logp(self, value, w):  # pragma: no cover - routed through logp
        raise NotImplementedError

    def logcdf(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        if self.event_ndim:
            raise NotImplementedError(
                "logcdf of a multivariate mixture is not defined"
            )
        w = evaluate(self.w, env, memo)
        value = self._cast_value(value)
        if self.comp_list is not None:
            comp = jnp.stack(jnp.broadcast_arrays(
                *[d.logcdf(value, env, memo) for d in self.comp_list]
            ), axis=-1)
        else:
            comp = self.comp_single.logcdf(value[..., None], env, memo)
        log_w = jnp.log(jnp.clip(w, 1e-30, None))
        return logsumexp(log_w + comp, axis=-1)

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        if memo is None:
            memo = {}
        w = evaluate(self.w, env, memo)
        ev_n = self.event_ndim
        ev = tuple(self.event_shape)
        batch_full = tuple(sample_shape) + tuple(self.batch_shape)
        # component-stacked draw shape (reference mixture.py:115-129:
        # stack at mix_axis = -event_ndim-1, select, squeeze)
        stacked = batch_full + (self._n_comp,) + ev
        mix_axis = -(ev_n + 1)
        k_idx, k_comp = jax.random.split(key)
        log_w = jnp.log(jnp.clip(w, 1e-30, None))
        idx = jax.random.categorical(
            k_idx, jnp.broadcast_to(log_w, batch_full + log_w.shape[-1:]),
            axis=-1,
        )
        if self.comp_list is not None:
            comp_draws = []
            tgt = batch_full + ev
            for i, d in enumerate(self.comp_list):
                # composite-dist idiom: draw at the EXTRA dims only, then
                # broadcast — sampling at sample_shape alone would share one
                # draw across the batch (CLAUDE.md)
                extra = tgt[: len(tgt) - d.ndim] if d.ndim else tgt
                draw = d.sample(jax.random.fold_in(k_comp, i), extra, env, memo)
                comp_draws.append(jnp.broadcast_to(draw, tgt))
            draws = jnp.stack(comp_draws, axis=mix_axis)
        else:
            d = self.comp_single
            extra = stacked[: len(stacked) - d.ndim]
            draws = jnp.broadcast_to(
                d.sample(k_comp, extra, env, memo), stacked
            )
        idx_padded = jnp.reshape(idx, idx.shape + (1,) * (ev_n + 1))
        taken = jnp.take_along_axis(draws, idx_padded, axis=mix_axis)
        taken = jnp.squeeze(taken, axis=mix_axis)
        dtype = intX() if self.is_discrete else floatX()
        return taken.astype(dtype)

    def support_point(self, env=None, memo=None):
        # w-weighted mean of the component support points (reference
        # mixture.py:227-240: weights right-padded over the event dims,
        # components stacked at mix_axis)
        if memo is None:
            memo = {}
        w = evaluate(self.w, env, memo)
        ev_n = self.event_ndim
        mix_axis = -(ev_n + 1)
        stacked = (
            tuple(self.batch_shape) + (self._n_comp,)
            + tuple(self.event_shape)
        )
        if self.comp_list is not None:
            pts = jnp.stack(
                [
                    jnp.broadcast_to(
                        d.support_point(env, memo).astype(floatX()), self.shape
                    )
                    for d in self.comp_list
                ],
                axis=mix_axis,
            )
        else:
            pts = jnp.broadcast_to(
                self.comp_single.support_point(env, memo).astype(floatX()),
                stacked,
            )
        wp = jnp.broadcast_to(w, tuple(self.batch_shape) + (self._n_comp,))
        wp = jnp.reshape(wp, wp.shape + (1,) * ev_n)
        mean = jnp.sum(wp * pts, axis=mix_axis)
        if self.is_discrete:
            return jnp.round(mean).astype(intX())
        return mean.astype(floatX())


def NormalMixture(name, w, mu, sigma=None, tau=None, **kwargs):
    """Reference mixture.py:497."""
    comp = Normal.dist(mu=mu, sigma=sigma, tau=tau)
    return Mixture(name, w, comp, **kwargs)


NormalMixture.dist = lambda w, mu, sigma=None, tau=None, **kw: Mixture.dist(
    w, Normal.dist(mu=mu, sigma=sigma, tau=tau), **kw
)


class _ZeroInflated(Discrete):
    """psi = probability of the NON-zero (base) process (reference
    convention: mixture of DiracDelta(0) with weight 1-psi and base with psi).
    """

    base_cls = None
    base_param_names = ()

    def __dist_init__(self, psi, **base_params):
        self.psi = as_param(psi)
        self.base = self.base_cls.dist(**base_params)

    param_names = ("psi",)

    def _resolve_shapes(self):
        from .distribution import _shape_of

        nat = tuple(
            np.broadcast_shapes(_shape_of(self.psi), self.base.shape)
        )
        if self._shape_arg is not None:
            batch = tuple(self._shape_arg)
        elif self._size_arg is not None:
            batch = self._size_arg
        else:
            batch = nat
        self.batch_shape = batch
        self.event_shape = ()

    def logp(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        psi = evaluate(self.psi, env, memo)
        base_lp = self.base.logp(value, env, memo)
        log_psi = jnp.log(jnp.clip(psi, 1e-30, 1.0))
        res = jnp.where(
            value == 0,
            jnp.logaddexp(jnp.log1p(-psi), log_psi + base_lp),
            log_psi + base_lp,
        )
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, psi >= 0, psi <= 1)

    def logcdf(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        psi = evaluate(self.psi, env, memo)
        base = self.base.logcdf(value, env, memo)
        res = jnp.logaddexp(
            jnp.log1p(-psi), jnp.log(jnp.clip(psi, 1e-30, 1.0)) + base
        )
        res = jnp.where(value < 0, -jnp.inf, jnp.minimum(res, 0.0))
        return check_parameters(res, psi >= 0, psi <= 1)

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        if memo is None:
            memo = {}
        psi = evaluate(self.psi, env, memo)
        full = tuple(sample_shape) + self.shape
        k1, k2 = jax.random.split(key)
        nonzero = jax.random.bernoulli(
            k1, jnp.broadcast_to(jnp.asarray(psi, floatX()), full)
        )
        base_draw = self.base.sample(
            k2, tuple(sample_shape) + self.shape[: len(self.shape) - self.base.ndim]
            if self.base.ndim <= len(self.shape) else sample_shape,
            env, memo,
        )
        base_draw = jnp.broadcast_to(base_draw, full)
        return jnp.where(nonzero, base_draw, 0).astype(intX())

    def support_point(self, env=None, memo=None):
        if memo is None:
            memo = {}
        psi = evaluate(self.psi, env, memo)
        base_pt = self.base.support_point(env, memo)
        pt = jnp.round(psi * base_pt).astype(intX())
        return jnp.broadcast_to(pt, self.shape)


class ZeroInflatedPoisson(_ZeroInflated):
    """Reference mixture.py:577."""

    base_cls = Poisson

    def __dist_init__(self, psi, mu):
        super().__dist_init__(psi, mu=mu)


class ZeroInflatedBinomial(_ZeroInflated):
    """Reference mixture.py:641."""

    base_cls = Binomial

    def __dist_init__(self, psi, n, p):
        super().__dist_init__(psi, n=n, p=p)


class ZeroInflatedNegativeBinomial(_ZeroInflated):
    """Reference mixture.py:705."""

    base_cls = NegativeBinomial

    def __dist_init__(self, psi, mu=None, alpha=None, p=None, n=None):
        super().__dist_init__(psi, mu=mu, alpha=alpha, p=p, n=n)


class _HurdleDiscrete(Discrete):
    """P(0) = 1-psi; positive values follow the zero-truncated base
    (reference hurdle construction, mixture.py:790-871)."""

    base_cls = None

    def __dist_init__(self, psi, **base_params):
        self.psi = as_param(psi)
        self.base = self.base_cls.dist(**base_params)

    param_names = ("psi",)
    _resolve_shapes = _ZeroInflated._resolve_shapes

    def logp(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        psi = evaluate(self.psi, env, memo)
        base_lp = self.base.logp(value, env, memo)
        log_trunc = _log1mexp_jax(
            jnp.minimum(self.base.logp(jnp.zeros_like(value), env, memo), -1e-15)
        )
        res = jnp.where(
            value == 0,
            jnp.log1p(-psi),
            jnp.log(jnp.clip(psi, 1e-30, 1.0)) + base_lp - log_trunc,
        )
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, psi >= 0, psi <= 1)

    def sample(self, key, sample_shape=(), env=None, memo=None):
        # zero-truncated base sampling via masked retry rounds
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        if memo is None:
            memo = {}
        psi = evaluate(self.psi, env, memo)
        full = tuple(sample_shape) + self.shape
        k1, k2 = jax.random.split(key)
        nonzero = jax.random.bernoulli(
            k1, jnp.broadcast_to(jnp.asarray(psi, floatX()), full)
        )
        draw = jnp.zeros(full, dtype=intX())
        got = jnp.zeros(full, dtype=bool)
        # base must be drawn at the FULL batch shape — sampling it at
        # sample_shape only and broadcasting makes every element share one
        # candidate (perfectly correlated nonzero draws)
        extra = (
            full[: len(full) - self.base.ndim]
            if self.base.ndim <= len(full) else ()
        )
        for i in range(32):
            cand = jnp.broadcast_to(
                self.base.sample(jax.random.fold_in(k2, i), extra, env, memo),
                full,
            )
            take = (~got) & (cand > 0)
            draw = jnp.where(take, cand, draw)
            got = got | (cand > 0)
        draw = jnp.where(got, draw, 1)  # astronomically rare fallback
        return jnp.where(nonzero, draw, 0).astype(intX())

    def support_point(self, env=None, memo=None):
        if memo is None:
            memo = {}
        psi = evaluate(self.psi, env, memo)
        base_pt = self.base.support_point(env, memo)
        pt = jnp.round(psi * jnp.maximum(base_pt, 1)).astype(intX())
        return jnp.broadcast_to(pt, self.shape)


class _HurdleContinuous(Continuous):
    """Positive-continuous hurdle: point mass at 0 with prob 1-psi
    (reference HurdleGamma:981 / HurdleLogNormal:1037)."""

    base_cls = None
    support = "positive"

    def __dist_init__(self, psi, **base_params):
        self.psi = as_param(psi)
        self.base = self.base_cls.dist(**base_params)

    param_names = ("psi",)
    _resolve_shapes = _ZeroInflated._resolve_shapes

    def default_transform(self):
        return None  # mixed discrete-continuous; sampled only as observed

    def logp(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        psi = evaluate(self.psi, env, memo)
        base_lp = self.base.logp(value, env, memo)
        res = jnp.where(
            value == 0,
            jnp.log1p(-psi),
            jnp.log(jnp.clip(psi, 1e-30, 1.0)) + base_lp,
        )
        res = jnp.where(value >= 0, res, -jnp.inf)
        return check_parameters(res, psi >= 0, psi <= 1)

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        if memo is None:
            memo = {}
        psi = evaluate(self.psi, env, memo)
        full = tuple(sample_shape) + self.shape
        k1, k2 = jax.random.split(key)
        nonzero = jax.random.bernoulli(
            k1, jnp.broadcast_to(jnp.asarray(psi, floatX()), full)
        )
        # draw the base at the FULL batch shape (see _HurdleDiscrete.sample)
        extra = (
            full[: len(full) - self.base.ndim]
            if self.base.ndim <= len(full) else ()
        )
        draw = jnp.broadcast_to(
            self.base.sample(k2, extra, env, memo), full
        )
        return jnp.where(nonzero, draw, 0.0).astype(floatX())

    def support_point(self, env=None, memo=None):
        if memo is None:
            memo = {}
        psi = evaluate(self.psi, env, memo)
        pt = psi * self.base.support_point(env, memo)
        return jnp.broadcast_to(pt.astype(floatX()), self.shape)


class HurdlePoisson(_HurdleDiscrete):
    """Reference mixture.py:873."""

    base_cls = Poisson

    def __dist_init__(self, psi, mu):
        super().__dist_init__(psi, mu=mu)


class HurdleNegativeBinomial(_HurdleDiscrete):
    """Reference mixture.py:925."""

    base_cls = NegativeBinomial

    def __dist_init__(self, psi, mu=None, alpha=None, p=None, n=None):
        super().__dist_init__(psi, mu=mu, alpha=alpha, p=p, n=n)


class HurdleGamma(_HurdleContinuous):
    """Reference mixture.py:981."""

    base_cls = Gamma

    def __dist_init__(self, psi, alpha=None, beta=None, mu=None, sigma=None):
        super().__dist_init__(psi, alpha=alpha, beta=beta, mu=mu, sigma=sigma)


class HurdleLogNormal(_HurdleContinuous):
    """Reference mixture.py:1037."""

    base_cls = LogNormal

    def __dist_init__(self, psi, mu=0.0, sigma=None, tau=None):
        super().__dist_init__(psi, mu=mu, sigma=sigma, tau=tau)
