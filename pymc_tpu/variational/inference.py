"""Variational inference drivers.

Parity: reference pymc/variational/inference.py (Inference.fit:106 loop with
NaN diagnostics, ADVI:353, FullRankADVI:497, SVGD:542, ASVGD:610, functional
fit registry:695) + operators.py (KL:33 ELBO, KSD:104) + stein.py.

TPU-native: one jitted optax update per step; the fit loop runs chunked
lax.scans (default 100 steps per host iteration) so 10k ADVI iterations are
~100 device calls. Minibatching reseeds the data subsample key every step.
"""

from __future__ import annotations

import logging
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax import lax

from ..blocking import unravel_vector
from ..config import floatX
from ..model.core import modelcontext
from .approximations import Empirical, FullRank, MeanField
from .callbacks import CheckParametersConvergence
from .updates import get_optimizer

__all__ = ["ADVI", "FullRankADVI", "SVGD", "ASVGD", "KLqp", "fit", "Inference"]

_log = logging.getLogger("pymc_tpu")


class Inference:
    """Base fit loop (reference inference.py:48)."""

    approx_cls = MeanField

    def __init__(self, approx=None, model=None, random_seed=None, start=None,
                 start_sigma=None, obj_n_mc=1, **kwargs):
        from ..sampling.mcmc import _resolve_seed
        from .approximations import Approximation as _ApproxBase

        if approx is not None and not isinstance(approx, _ApproxBase):
            raise TypeError(
                f"approx must be an Approximation, got {type(approx).__name__}"
            )
        if approx is not None:
            # adopt an existing (e.g. Group-built) approximation:
            # reference KLqp(approx) (inference.py:324)
            self.model = approx.model
            self.key = _resolve_seed(random_seed)
            self.info = approx.info
            self.approx_cls = type(approx)
            self.params = approx.params
            self.obj_n_mc = obj_n_mc
            self._logp_fn = self._build_logp()
            return
        self.model = modelcontext(model)
        self.key = _resolve_seed(random_seed)
        self.info = self.model.raveled_info()
        D = self.info.total_size
        start_flat = None
        if start is not None:
            from ..blocking import ravel_point

            start_flat = ravel_point(self.model.unconstrain(start), self.info)
        self.params = self.approx_cls.init_params(
            D, start=start_flat, start_sigma=start_sigma
        )
        self.obj_n_mc = obj_n_mc
        self._logp_fn = self._build_logp()

    def _build_logp(self):
        logp_dict = self.model.logp_fn()
        info = self.info

        def flat_logp(q, mb_key):
            env = {("__minibatch_key__",): mb_key} if mb_key is not None else {}
            vals = unravel_vector(q, info)
            if mb_key is not None:
                vals = dict(vals)
                vals[("__minibatch_key__",)] = mb_key
            return logp_dict(vals)

        return flat_logp

    def _has_minibatch(self):
        from ..graph import Node, ancestors

        roots = []
        for orv in self.model.observed_RVs:
            if isinstance(orv.observed, Node):
                roots.append(orv.observed)
            roots.extend(p for p in orv.dist.param_values() if isinstance(p, Node))
        for rv in self.model.free_RVs:
            roots.extend(p for p in rv.dist.param_values() if isinstance(p, Node))
        roots.extend(self.model.potentials)
        return any(
            getattr(n, "is_minibatch", False) for n in ancestors(roots)
        ) or any(
            getattr(d, "is_minibatch", False) for d in self.model.data_vars
        )

    def objective(self, params, key):
        """Negative ELBO (KL operator, reference operators.py:33)."""
        k_q, k_mb = jax.random.split(key)
        z = self.approx_cls.sample_q(params, k_q, self.obj_n_mc)
        mb = k_mb if self._has_minibatch() else None
        logps = jax.vmap(lambda q: self._logp_fn(q, mb))(z)
        elbo = jnp.mean(logps) + self.approx_cls.entropy(params)
        return -elbo

    def fit(self, n=10000, obj_optimizer=None, callbacks=None,
            progressbar=True, chunk=100, **kwargs):
        opt = get_optimizer(obj_optimizer)
        opt_state = opt.init(self.params)
        key = self.key

        grad_fn = jax.value_and_grad(self.objective)

        def step(carry, k):
            params, opt_state = carry
            loss, g = grad_fn(params, k)
            updates, opt_state = opt.update(g, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # NaN guard (reference inference.py:228 NaN diagnostics): skip
            # the update when non-finite
            ok = jnp.isfinite(loss)
            params = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_params, params
            )
            return (params, opt_state), loss

        scan_fn = jax.jit(lambda c, ks: lax.scan(step, c, ks))
        losses = []
        carry = (self.params, opt_state)
        callbacks = callbacks or []
        t0 = time.perf_counter()
        done = 0
        while done < n:
            m = min(chunk, n - done)
            ks = jax.random.split(jax.random.fold_in(key, done), m)
            carry, chunk_losses = scan_fn(carry, ks)
            losses.append(np.asarray(jax.device_get(chunk_losses)))
            done += m
            hist = np.concatenate(losses)
            stop = False
            for cb in callbacks:
                try:
                    cb(self._wrap(carry[0], hist), hist, done)
                except StopIteration:
                    stop = True
            if stop:
                _log.info(f"Convergence achieved at {done}")
                break
        self.params = carry[0]
        hist = np.concatenate(losses) if losses else np.asarray([])
        if hist.size and not np.isfinite(hist[-1]):
            _log.warning("VI loss is non-finite at the last iteration")
        _log.info(
            f"Finished [100%]: Average Loss = {hist[-min(1000, hist.size):].mean():,.4g} "
            f"({time.perf_counter() - t0:.1f}s)"
        )
        return self._wrap(carry[0], hist)

    def _wrap(self, params, hist):
        approx = self.approx_cls(self.model, self.info, params)
        approx.hist = np.asarray(hist)
        return approx


class KLqp(Inference):
    """Reference inference.py:324."""


class ADVI(KLqp):
    """Mean-field ADVI (reference inference.py:353)."""

    approx_cls = MeanField


class FullRankADVI(KLqp):
    """Reference inference.py:497."""

    approx_cls = FullRank


class ImplicitGradient(Inference):
    """Base for implicit-gradient (particle) methods
    (reference inference.py:526); SVGD subclasses it."""


class SVGD(ImplicitGradient):
    """Stein variational gradient descent (reference inference.py:542,
    stein.py:27, KSD operator operators.py:104). RBF kernel with the median
    heuristic; the particle update is one fused batched kernel."""

    approx_cls = Empirical

    def __init__(self, n_particles=100, jitter=1.0, model=None,
                 random_seed=None, start=None, **kwargs):
        from ..sampling.mcmc import _resolve_seed

        self.model = modelcontext(model)
        self.key = _resolve_seed(random_seed)
        self.info = self.model.raveled_info()
        D = self.info.total_size
        start_flat = None
        if start is not None:
            from ..blocking import ravel_point

            start_flat = ravel_point(self.model.unconstrain(start), self.info)
        else:
            from ..initial_point import make_initial_point
            from ..blocking import ravel_point

            pt = make_initial_point(self.model, self.key)
            start_flat = ravel_point(pt, self.info)
        self.params = Empirical.init_params(
            D, start=start_flat, n_particles=n_particles,
            key=jax.random.fold_in(self.key, 1), jitter=jitter,
        )
        self.obj_n_mc = 1
        self._logp_fn = self._build_logp()

    def _phi(self, particles):
        """SVGD direction phi(x) = mean_j [k(xj,x) grad logp(xj) + grad_xj k]
        via the shared Stein machinery (operators.Stein + rbf median-
        heuristic kernel — one implementation for SVGD/ASVGD/KSD)."""
        from .operators import Stein

        stein = Stein(jax.grad(lambda q: self._logp_fn(q, None)))
        return stein.phi(particles)

    def fit(self, n=10000, obj_optimizer=None, callbacks=None,
            progressbar=True, chunk=100, **kwargs):
        opt = get_optimizer(obj_optimizer, default="adagrad", default_lr=1e-1)
        opt_state = opt.init(self.params)

        def step(carry, _):
            params, opt_state = carry
            phi = self._phi(params["particles"])
            updates, opt_state = opt.update(
                {"particles": -phi}, opt_state, params
            )
            params = optax.apply_updates(params, updates)
            return (params, opt_state), jnp.mean(jnp.abs(phi))

        scan_fn = jax.jit(lambda c, xs: lax.scan(step, c, xs, length=chunk))
        losses = []
        carry = (self.params, opt_state)
        done = 0
        while done < n:
            carry, chunk_l = scan_fn(carry, None)
            losses.append(np.asarray(jax.device_get(chunk_l)))
            done += chunk
        self.params = carry[0]
        return self._wrap(carry[0], np.concatenate(losses))


class ASVGD(SVGD):
    """Amortized SVGD (reference inference.py:610) — same particle dynamics
    here (non-amortized fallback)."""


def fit(n=10000, method="advi", model=None, random_seed=None, start=None,
        start_sigma=None, inf_kwargs=None, obj_optimizer=None, callbacks=None,
        progressbar=True, obj_n_mc=None, **kwargs):
    """Functional entry point (reference inference.py:695)."""
    inf_kwargs = dict(inf_kwargs or {})
    if obj_n_mc is not None:
        inf_kwargs["obj_n_mc"] = obj_n_mc
    if isinstance(method, str):
        method = method.lower()
        registry = {
            "advi": ADVI,
            "fullrank_advi": FullRankADVI,
            "svgd": SVGD,
            "asvgd": ASVGD,
        }
        if method not in registry:
            raise KeyError(
                f"method should be one of {list(registry)} or an Inference "
                f"instance, got {method}"
            )
        inference = registry[method](
            model=model, random_seed=random_seed, start=start,
            start_sigma=start_sigma, **inf_kwargs,
        )
    elif isinstance(method, Inference):
        inference = method
    else:
        raise TypeError(f"Bad VI method: {method}")
    # reference fit() attaches no callbacks by default (inference.py:695);
    # pass CheckParametersConvergence explicitly for early stopping
    return inference.fit(
        n, obj_optimizer=obj_optimizer, callbacks=callbacks,
        progressbar=progressbar, **kwargs,
    )
