"""Time-series distributions.

Parity: reference pymc/distributions/timeseries.py (RandomWalk:122,
GaussianRandomWalk:264, MvGaussianRandomWalk:301, MvStudentTRandomWalk:345,
AR:475, GARCH11:746, EulerMaruyama:898).

TPU-native design: the reference builds these as Scan graphs and derives logp
through logprob/scan.py. Here the logps are closed-form over shifted slices
wherever the recursion is linear (RandomWalk/AR/EulerMaruyama — pure
vectorized ops, no sequential scan in the density!), and `lax.scan` only
where state truly recurses (GARCH11 volatility, sampling paths).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import floatX
from ..graph import evaluate, is_node
from .continuous import Normal
from .dist_math import check_parameters, log_normal
from .distribution import Continuous, Distribution, as_param
from .multivariate import MvNormal, MvStudentT

__all__ = [
    "RandomWalk",
    "GaussianRandomWalk",
    "MvGaussianRandomWalk",
    "MvStudentTRandomWalk",
    "AR",
    "GARCH11",
    "EulerMaruyama",
]


def _steps_from_shape(shape_arg, size_arg, steps, extra_event=0, offset=1):
    """Infer steps from an explicit shape.

    Reference get_support_shape_1d (shape_utils.py): the support length is
    ``steps + offset`` where offset is 1 for random walks / GARCH / SDEs and
    ``ar_order`` for AR. When both steps and shape are given they must agree.
    """
    if shape_arg is not None:
        inferred = int(shape_arg[-1 - extra_event]) - offset
        if steps is not None and int(steps) != inferred:
            raise ValueError(
                f"Inconsistent steps={steps} and shape={tuple(shape_arg)}: "
                f"the support length implies steps={inferred}"
            )
        return inferred
    if steps is not None:
        return int(steps)
    raise ValueError("Provide steps= or shape= for timeseries distributions")


class RandomWalk(Continuous):
    """Cumulative sum of iid innovations (reference timeseries.py:122)."""

    param_names = ()
    event_ndim = 1

    def __dist_init__(self, innovation_dist=None, init_dist=None, steps=None):
        if innovation_dist is None or not isinstance(innovation_dist, Distribution):
            raise ValueError("RandomWalk requires innovation_dist=Distribution")
        self.innovation_dist = innovation_dist
        if init_dist is None:
            # reference RandomWalk.dist (timeseries.py:143-149) requires an
            # explicit init distribution
            raise TypeError("init_dist must be a distribution (use .dist())")
        if not isinstance(init_dist, Distribution):
            raise TypeError("init_dist must be a distribution (use .dist())")
        if init_dist.event_ndim != innovation_dist.event_ndim:
            raise TypeError(
                "init_dist and innovation_dist must have the same support "
                "dimensionality"
            )
        self.init_dist = init_dist
        self.steps = _steps_from_shape(
            self._shape_arg, self._size_arg, steps,
            extra_event=innovation_dist.event_ndim,
        )
        self.event_ndim = 1 + innovation_dist.event_ndim

    def _resolve_shapes(self):
        inner_ev = self.innovation_dist.event_shape
        nat_batch = tuple(
            np.broadcast_shapes(
                self.innovation_dist.batch_shape, self.init_dist.batch_shape
            )
        )
        ev = (self.steps + 1,) + tuple(inner_ev)
        if self._shape_arg is not None:
            batch = tuple(self._shape_arg[: len(self._shape_arg) - len(ev)])
        elif self._size_arg is not None:
            batch = self._size_arg
        else:
            batch = nat_batch
        self.batch_shape = batch
        self.event_shape = ev

    def _time_axis(self, value):
        return value.ndim - 1 - self.innovation_dist.event_ndim

    def logp(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        ax = self._time_axis(value)
        first = jnp.take(value, jnp.array([0]), axis=ax)
        diffs = jnp.diff(value, axis=ax)
        init_lp = self.init_dist.logp(jnp.squeeze(first, axis=ax), env, memo)
        # time axis leads so batched innovation params (trailing-aligned)
        # broadcast per walk, not per step (reference dimswap,
        # timeseries.py:236-247)
        diffs_t = jnp.moveaxis(diffs, ax, 0)
        innov_lp = self.innovation_dist.logp(diffs_t, env, memo)
        return init_lp + jnp.sum(innov_lp, axis=0)

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        if memo is None:
            memo = {}
        k1, k2 = jax.random.split(key)
        batch = tuple(sample_shape) + self.batch_shape
        # draw the init at the FULL batch+event target: extra dims are the
        # target minus the init dist's own ndim (subtracting from `batch`
        # dropped the batch axes for event-carrying inits, leaving every
        # batch element sharing ONE init draw)
        init_target = batch + self.innovation_dist.event_shape
        init_extra = (
            init_target[: len(init_target) - self.init_dist.ndim]
            if self.init_dist.ndim <= len(init_target) else ()
        )
        init = self.init_dist.sample(k1, init_extra, env, memo)
        init = jnp.broadcast_to(init, init_target)
        # draw innovations with the time axis LEADING so batched innovation
        # params stay trailing-aligned with `batch`, then move time into place
        innov_target = (
            (self.steps,) + batch + self.innovation_dist.event_shape
        )
        extra = innov_target[: len(innov_target) - self.innovation_dist.ndim]
        innov = jnp.broadcast_to(
            self.innovation_dist.sample(k2, extra, env, memo), innov_target
        )
        ax = len(batch)
        innov = jnp.moveaxis(innov, 0, ax)
        path = jnp.concatenate(
            [init[..., None, :] if self.innovation_dist.event_ndim else
             jnp.expand_dims(init, ax), innov], axis=ax
        )
        return jnp.cumsum(path, axis=ax).astype(floatX())

    def support_point(self, env=None, memo=None):
        # reference random_walk_support_point (timeseries.py:220-231):
        # concatenate init/innovation points with time LEADING, cumsum, then
        # move time next to the inner event — batched params supported
        if memo is None:
            memo = {}
        init = jnp.asarray(self.init_dist.support_point(env, memo), floatX())
        innov = jnp.asarray(
            self.innovation_dist.support_point(env, memo), floatX()
        )
        ev = tuple(self.innovation_dist.event_shape)
        target = tuple(self.batch_shape) + ev
        path = jnp.concatenate(
            [
                jnp.broadcast_to(init, (1,) + target),
                jnp.broadcast_to(innov, (self.steps,) + target),
            ],
            axis=0,
        )
        pt = jnp.moveaxis(
            jnp.cumsum(path, axis=0), 0, len(self.batch_shape)
        )
        return jnp.broadcast_to(pt, self.shape)


class GaussianRandomWalk(RandomWalk):
    """Reference timeseries.py:264."""

    def __dist_init__(self, mu=0.0, sigma=1.0, *, init_dist=None, steps=None):
        innovation = Normal.dist(mu=mu, sigma=sigma)
        if init_dist is None:
            # reference timeseries.py:286-292 warns and uses Normal(0, 100)
            import warnings

            warnings.warn(
                "Initial distribution not specified, defaulting to "
                "`Normal.dist(0, 100)`. You can specify an init_dist "
                "manually to suppress this warning.",
                UserWarning,
            )
            init_dist = Normal.dist(0.0, 100.0)
        super().__dist_init__(
            innovation_dist=innovation, init_dist=init_dist, steps=steps
        )


class MvGaussianRandomWalk(RandomWalk):
    """Reference timeseries.py:301."""

    def __dist_init__(self, mu=0.0, cov=None, tau=None, chol=None,
                      init_dist=None, steps=None):
        innovation = MvNormal.dist(mu=mu, cov=cov, tau=tau, chol=chol)
        if init_dist is None:
            # reference timeseries.py:333-339 warns and uses MvNormal(0, 100 I)
            import warnings

            warnings.warn(
                "Initial distribution not specified, defaulting to "
                "`MvNormal.dist(0, I*100)`. You can specify an init_dist "
                "manually to suppress this warning.",
                UserWarning,
            )
            init_dist = MvNormal.dist(
                mu=jnp.zeros(innovation.shape[-1]),
                cov=100.0 * jnp.eye(innovation.shape[-1]),
            )
        super().__dist_init__(
            innovation_dist=innovation, init_dist=init_dist, steps=steps
        )


class MvStudentTRandomWalk(RandomWalk):
    """Reference timeseries.py:345."""

    def __dist_init__(self, nu, mu=0.0, scale=None, tau=None, chol=None,
                      init_dist=None, steps=None):
        innovation = MvStudentT.dist(nu, mu=mu, scale=scale, tau=tau, chol=chol)
        if init_dist is None:
            # reference timeseries.py:381-387 warns and uses MvNormal(0, 100 I)
            import warnings

            warnings.warn(
                "Initial distribution not specified, defaulting to "
                "`MvNormal.dist(0, I*100)`. You can specify an init_dist "
                "manually to suppress this warning.",
                UserWarning,
            )
            init_dist = MvNormal.dist(
                mu=jnp.zeros(innovation.shape[-1]),
                cov=100.0 * jnp.eye(innovation.shape[-1]),
            )
        super().__dist_init__(
            innovation_dist=innovation, init_dist=init_dist, steps=steps
        )


class AR(Continuous):
    """Autoregressive process of order p (reference timeseries.py:475).

    logp is fully vectorized: the conditional mean is a dot of lagged slices
    with rho — no sequential scan in the density.
    """

    param_names = ("rho", "sigma")
    param_event_ndims = (1, 0)
    event_ndim = 1

    def __dist_init__(self, rho, sigma=1.0, *, init_dist=None, steps=None,
                      constant=False, ar_order=None):
        self.rho = as_param(rho)
        self.sigma = as_param(sigma)
        self.constant = bool(constant)
        from .distribution import _shape_of

        rho_len = _shape_of(self.rho)[-1]
        self.ar_order = int(
            ar_order if ar_order is not None else rho_len - (1 if constant else 0)
        )
        if init_dist is None:
            # reference timeseries.py:590-597 warns and uses Normal(0, 100)
            import warnings

            warnings.warn(
                "Initial distribution not specified, defaulting to "
                "`Normal.dist(0, 100, shape=...)`. You can specify an "
                "init_dist manually to suppress this warning.",
                UserWarning,
            )
            init_dist = Normal.dist(0.0, 100.0, shape=(self.ar_order,))
        self.init_dist = init_dist
        # reference AR.dist: steps = shape[-1] - ar_order (support_shape_offset)
        self.steps = _steps_from_shape(
            self._shape_arg, self._size_arg, steps, offset=self.ar_order
        )

    def _resolve_shapes(self):
        from .distribution import _shape_of

        nat_batch = tuple(
            np.broadcast_shapes(
                _shape_of(self.rho)[:-1], _shape_of(self.sigma)
            )
        )
        ev = (self.steps + self.ar_order,)
        if self._shape_arg is not None:
            batch = tuple(self._shape_arg[:-1])
            ev = (self._shape_arg[-1],)
        elif self._size_arg is not None:
            batch = self._size_arg
        else:
            batch = nat_batch
        self.batch_shape = batch
        self.event_shape = ev

    def _split_rho(self, rho):
        if self.constant:
            return rho[..., 0], rho[..., 1:]
        return jnp.zeros(rho.shape[:-1], rho.dtype), rho

    def logp(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        rho = evaluate(self.rho, env, memo)
        sigma = evaluate(self.sigma, env, memo)
        const, coefs = self._split_rho(rho)
        p = self.ar_order
        T = value.shape[-1]
        # reference ar_logp only sums the init term when the init dist is
        # univariate (ndim_supp == 0); a multivariate init (e.g. MvNormal over
        # the ar_order inits, event_ndim == 1) already collapsed its event axis
        # and summing again would eat a batch axis.
        init_lp = self.init_dist.logp(value[..., :p], env, memo)
        if self.init_dist.event_ndim == 0:
            init_lp = jnp.sum(jnp.atleast_1d(init_lp), axis=-1)
        # lagged design: mean_t = const + sum_k coefs_k * x_{t-1-k}
        lags = jnp.stack(
            [value[..., p - 1 - k : T - 1 - k] for k in range(p)], axis=-1
        )
        mean = const[..., None] + jnp.einsum(
            "...tk,...k->...t", lags, coefs
        )
        innov_lp = jnp.sum(
            log_normal(value[..., p:], mean, sigma[..., None]), axis=-1
        )
        return check_parameters(init_lp + innov_lp, sigma > 0)

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        if memo is None:
            memo = {}
        rho = evaluate(self.rho, env, memo)
        sigma = evaluate(self.sigma, env, memo)
        const, coefs = self._split_rho(rho)
        p = self.ar_order
        batch = tuple(sample_shape) + self.batch_shape
        k1, k2 = jax.random.split(key)
        # init target is batch + (p,): scalar init dists need the (p,) axis
        # in `extra` too, or the (batch,) draw cannot broadcast to (batch, p)
        init_target = batch + (p,)
        init_extra = (
            init_target[: len(init_target) - self.init_dist.ndim]
            if self.init_dist.ndim <= len(init_target) else ()
        )
        init = jnp.broadcast_to(
            self.init_dist.sample(k1, init_extra, env, memo), init_target
        )
        noise = sigma[..., None] * jax.random.normal(
            k2, batch + (self.steps,), dtype=floatX()
        )
        coefs_b = jnp.broadcast_to(coefs, batch + (p,))
        const_b = jnp.broadcast_to(const, batch)

        def step(carry, eps):
            # carry: last p values, newest last
            mean = const_b + jnp.einsum("...k,...k->...", carry[..., ::-1], coefs_b)
            new = mean + eps
            carry = jnp.concatenate([carry[..., 1:], new[..., None]], axis=-1)
            return carry, new

        _, path = lax.scan(step, init, jnp.moveaxis(noise, -1, 0))
        path = jnp.moveaxis(path, 0, -1)
        return jnp.concatenate([init, path], axis=-1).astype(floatX())

    def support_point(self, env=None, memo=None):
        # reference ar_support_point (timeseries.py:679-682): the last entry
        # of the init dist's support point, broadcast over the whole series
        if memo is None:
            memo = {}
        init_sp = jnp.atleast_1d(
            jnp.asarray(self.init_dist.support_point(env, memo), floatX())
        )
        return jnp.broadcast_to(init_sp[..., -1:], self.shape)


class GARCH11(Continuous):
    """GARCH(1,1) (reference timeseries.py:746): the volatility recursion is
    the one true sequential dependency — computed with lax.scan."""

    param_names = ("omega", "alpha_1", "beta_1", "initial_vol")
    event_ndim = 1

    def __dist_init__(self, omega, alpha_1, beta_1, initial_vol, *, steps=None):
        self.omega = as_param(omega)
        self.alpha_1 = as_param(alpha_1)
        self.beta_1 = as_param(beta_1)
        self.initial_vol = as_param(initial_vol)
        self.steps = _steps_from_shape(self._shape_arg, self._size_arg, steps)

    def _resolve_shapes(self):
        from .distribution import _shape_of

        nat_batch = tuple(
            np.broadcast_shapes(
                *[_shape_of(p) for p in self.param_values()]
            )
        )
        if self._shape_arg is not None:
            batch = tuple(self._shape_arg[:-1])
            ev = (self._shape_arg[-1],)
        else:
            batch = self._size_arg if self._size_arg is not None else nat_batch
            ev = (self.steps + 1,)
        self.batch_shape = batch
        self.event_shape = ev

    def _vols(self, value, omega, alpha_1, beta_1, initial_vol):
        def step(sigma2_prev_and_x, x_t):
            sigma2_prev, x_prev = sigma2_prev_and_x
            sigma2 = omega + alpha_1 * x_prev**2 + beta_1 * sigma2_prev
            return (sigma2, x_t), jnp.sqrt(jnp.clip(sigma2, 1e-30, None))

        x_moved = jnp.moveaxis(value, -1, 0)
        init_v = jnp.broadcast_to(
            jnp.asarray(initial_vol, value.dtype) ** 2, x_moved[0].shape
        )
        (_, _), vols = lax.scan(step, (init_v, x_moved[0]), x_moved[1:])
        vols = jnp.moveaxis(vols, 0, -1)
        init_vol_b = jnp.broadcast_to(
            jnp.asarray(initial_vol, value.dtype), value.shape[:-1]
        )
        return jnp.concatenate([init_vol_b[..., None], vols], axis=-1)

    def logp(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        omega, alpha_1, beta_1, initial_vol = (
            evaluate(p, env, memo) for p in self.param_values()
        )
        vols = self._vols(value, omega, alpha_1, beta_1, initial_vol)
        res = jnp.sum(log_normal(value, 0.0, vols), axis=-1)
        # NO stationarity check: reference garch11_logp (timeseries.py:807-829)
        # only enforces sigma_t > 0 through the Normal logp — a nonstationary
        # GARCH (alpha_1 + beta_1 >= 1) has a well-defined finite density and
        # posterior mass near the IGARCH boundary must stay reachable.
        return check_parameters(
            res, omega > 0, alpha_1 >= 0, beta_1 >= 0, initial_vol > 0,
        )

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        if memo is None:
            memo = {}
        omega, alpha_1, beta_1, initial_vol = (
            evaluate(p, env, memo) for p in self.param_values()
        )
        batch = tuple(sample_shape) + self.batch_shape
        noise = jax.random.normal(key, batch + (self.steps + 1,), dtype=floatX())
        iv = jnp.broadcast_to(jnp.asarray(initial_vol, floatX()), batch)

        def step(carry, eps):
            sigma2_prev, x_prev = carry
            sigma2 = omega + alpha_1 * x_prev**2 + beta_1 * sigma2_prev
            x = eps * jnp.sqrt(jnp.clip(sigma2, 1e-30, None))
            return (sigma2, x), x

        x0 = noise[..., 0] * iv
        (_, _), xs = lax.scan(
            step, (iv**2, x0), jnp.moveaxis(noise[..., 1:], -1, 0)
        )
        xs = jnp.moveaxis(xs, 0, -1)
        return jnp.concatenate([x0[..., None], xs], axis=-1).astype(floatX())

    def support_point(self, env=None, memo=None):
        return jnp.zeros(self.shape, dtype=floatX())


class EulerMaruyama(Continuous):
    """SDE discretization (reference timeseries.py:898): x_{t+1} ~ N(x_t +
    f(x_t)*dt, g(x_t)^2*dt). Densities vectorize over shifted slices."""

    param_names = ()
    event_ndim = 1

    def __dist_init__(self, dt, sde_fn, sde_pars, *, init_dist=None, steps=None):
        self.dt = float(dt)
        self.sde_fn = sde_fn
        self.sde_pars = tuple(as_param(p) for p in sde_pars)
        if init_dist is None:
            # reference timeseries.py:955-964 warns and uses Normal(0, 100)
            import warnings

            warnings.warn(
                "Initial distribution not specified, defaulting to "
                "`Normal.dist(0, 100, shape=...)`. You can specify an "
                "init_dist manually to suppress this warning.",
                UserWarning,
            )
            # reference timeseries.py:964 shapes the default init like the
            # first sde parameter: Normal.dist(0, 100, shape=sde_pars[0].shape)
            from .distribution import _shape_of

            par0_shape = (
                tuple(_shape_of(self.sde_pars[0])) if self.sde_pars else ()
            )
            init_dist = (
                Normal.dist(0.0, 100.0, shape=par0_shape)
                if par0_shape else Normal.dist(0.0, 100.0)
            )
        self.init_dist = init_dist
        self.steps = _steps_from_shape(self._shape_arg, self._size_arg, steps)

    def param_values(self):
        return list(self.sde_pars)

    def _resolve_shapes(self):
        from .distribution import _shape_of

        if self._shape_arg is not None:
            batch = tuple(self._shape_arg[:-1])
            ev = (self._shape_arg[-1],)
        else:
            if self._size_arg is not None:
                batch = self._size_arg
            else:
                # natural batch: broadcast of sde param and init batch dims
                batch = tuple(
                    np.broadcast_shapes(
                        *[_shape_of(p) for p in self.sde_pars],
                        self.init_dist.batch_shape,
                    )
                )
            ev = (self.steps + 1,)
        self.batch_shape = batch
        self.event_shape = ev

    def logp(self, value, env=None, memo=None):
        if memo is None:
            memo = {}
        # batched params get a trailing time axis so user sde_fns broadcast
        # against value[..., t] (reference eulermaruyama_logp timeseries.py:994)
        pars = [
            jnp.asarray(evaluate(p, env, memo))[..., None]
            for p in self.sde_pars
        ]
        xt = value[..., :-1]
        f, g = self.sde_fn(xt, *pars)
        mu = xt + f * self.dt
        sigma = jnp.sqrt(jnp.clip(g**2 * self.dt, 1e-30, None))
        innov = jnp.sum(log_normal(value[..., 1:], mu, sigma), axis=-1)
        init_lp = self.init_dist.logp(value[..., 0], env, memo)
        return init_lp + innov

    def sample(self, key, sample_shape=(), env=None, memo=None):
        if isinstance(sample_shape, int):
            sample_shape = (sample_shape,)
        if memo is None:
            memo = {}
        pars = [evaluate(p, env, memo) for p in self.sde_pars]
        batch = tuple(sample_shape) + self.batch_shape
        k1, k2 = jax.random.split(key)
        # composite-dist sample idiom (CLAUDE.md): the init dist's own batch
        # dims are already folded into `batch` by _resolve_shapes, so draw at
        # the EXTRA dims only, then broadcast — sampling at the full `batch`
        # returns batch + init.batch_shape and the broadcast_to raises.
        init_extra = (
            batch[: len(batch) - self.init_dist.ndim]
            if self.init_dist.ndim <= len(batch) else ()
        )
        init = jnp.broadcast_to(
            self.init_dist.sample(k1, init_extra, env, memo), batch
        )
        noise = jax.random.normal(k2, batch + (self.steps,), dtype=floatX())

        def step(x, eps):
            f, g = self.sde_fn(x, *pars)
            x_new = x + f * self.dt + eps * jnp.sqrt(
                jnp.clip(g**2 * self.dt, 1e-30, None)
            )
            return x_new, x_new

        _, path = lax.scan(step, init, jnp.moveaxis(noise, -1, 0))
        path = jnp.moveaxis(path, 0, -1)
        return jnp.concatenate([init[..., None], path], axis=-1).astype(floatX())

    def support_point(self, env=None, memo=None):
        if memo is None:
            memo = {}
        init = self.init_dist.support_point(env, memo)
        return jnp.broadcast_to(
            jnp.asarray(init, floatX())[..., None], self.shape
        )
