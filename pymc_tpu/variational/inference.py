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


def _start_flat(model, info, start, key):
    """Resolve a (possibly PARTIAL, rv-name-keyed, constrained-space) start
    dict to a flat value-space vector (reference Inference start handling:
    missing entries come from the model initial point)."""
    if start is None:
        return None
    from ..blocking import ravel_point
    from ..initial_point import make_initial_point

    names = {rv.name for rv in model.free_RVs}
    unknown = set(start) - names
    if unknown:
        raise KeyError(
            f"start contains unknown variable(s) {sorted(unknown)}; "
            f"free variables are {sorted(names)}"
        )
    base = model.constrain(make_initial_point(model, key))
    merged = {**base, **{k: jnp.asarray(v, floatX()) for k, v in start.items()}}
    merged = {
        k: jnp.broadcast_to(v, base[k].shape if hasattr(base[k], "shape") else np.shape(base[k]))
        for k, v in merged.items()
    }
    return ravel_point(model.unconstrain(merged), info)


def _sigma_flat(model, info, start_sigma):
    """Resolve start_sigma (scalar | value-space dict keyed by rv or value
    name) to a flat (D,) vector; unnamed entries keep the 0.1 default."""
    if start_sigma is None or np.isscalar(start_sigma):
        return start_sigma
    if not isinstance(start_sigma, dict):
        return start_sigma  # already a flat array
    flat = np.full((info.total_size,), 0.1, dtype=np.float64)
    slices = info.slices()
    # accept both the rv name and the transformed value name as keys
    alias = {rv.value_name: rv.value_name for rv in model.free_RVs}
    alias.update({rv.name: rv.value_name for rv in model.free_RVs})
    for k, v in start_sigma.items():
        name = alias.get(k)
        if name is None:
            raise KeyError(f"start_sigma contains unknown variable {k!r}")
        flat[slices[name]] = np.broadcast_to(
            np.asarray(v, dtype=np.float64).reshape(-1)
            if np.ndim(v) else np.asarray(v), flat[slices[name]].shape
        )
    return jnp.asarray(flat, floatX())


class Inference:
    """Base fit loop (reference inference.py:48)."""

    approx_cls = MeanField

    def __init__(self, approx=None, model=None, random_seed=None, start=None,
                 start_sigma=None, obj_n_mc=1,
                 total_grad_norm_constraint=None, **kwargs):
        from ..sampling.mcmc import _resolve_seed
        from .approximations import Approximation as _ApproxBase

        self.total_grad_norm_constraint = total_grad_norm_constraint
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
        start_flat = _start_flat(self.model, self.info, start, self.key)
        start_sigma = _sigma_flat(self.model, self.info, start_sigma)
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

    def _make_opt(self, obj_optimizer, default=None, default_lr=None):
        kw = {}
        if default is not None:
            kw = {"default": default, "default_lr": default_lr}
        opt = get_optimizer(obj_optimizer, **kw)
        c = getattr(self, "total_grad_norm_constraint", None)
        if c is not None:
            # reference Inference total_grad_norm_constraint: clip the
            # global gradient norm before the optimizer update
            opt = optax.chain(optax.clip_by_global_norm(float(c)), opt)
        return opt

    def fit(self, n=10000, obj_optimizer=None, callbacks=None,
            progressbar=True, chunk=100, score=None, **kwargs):
        opt = self._make_opt(obj_optimizer)
        opt_state = opt.init(self.params)
        key = self.key

        grad_fn = jax.value_and_grad(self.objective)

        def step(carry, k):
            params, opt_state = carry
            loss, g = grad_fn(params, k)
            updates, opt_state = opt.update(g, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # NaN guard (reference inference.py:228 NaN diagnostics): skip
            # the update when the loss or ANY updated parameter is
            # non-finite (a NaN learning rate must not poison the params)
            finite_params = jnp.all(
                jnp.stack([
                    jnp.all(jnp.isfinite(leaf))
                    for leaf in jax.tree.leaves(new_params)
                ])
            )
            ok = jnp.isfinite(loss) & finite_params
            params = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_params, params
            )
            return (params, opt_state), (loss, ok)

        scan_fn = jax.jit(lambda c, ks: lax.scan(step, c, ks))
        losses = []
        carry = (self.params, opt_state)
        callbacks = callbacks or []
        t0 = time.perf_counter()
        done = 0
        while done < n:
            m = min(chunk, n - done)
            ks = jax.random.split(jax.random.fold_in(key, done), m)
            carry, (chunk_losses, chunk_ok) = scan_fn(carry, ks)
            chunk_losses = np.asarray(jax.device_get(chunk_losses))
            chunk_ok = np.asarray(jax.device_get(chunk_ok))
            if m > 0 and not chunk_ok.any():
                # every step of the chunk produced non-finite loss or
                # updates: optimization cannot progress (reference
                # inference.py:228 raises FloatingPointError with NaN
                # diagnostics)
                raise FloatingPointError(
                    "NaN occurred in optimization: all "
                    f"{m} update(s) of the last window were non-finite "
                    "(check the learning rate and the model's initial "
                    "energy)"
                )
            losses.append(chunk_losses)
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

    def run_profiling(self, n=1000, chunk=100, obj_optimizer=None, **kwargs):
        """Timed fit dry-run (reference Inference.run_profiling): runs the
        SAME jitted update program on a copy of the params and returns a
        profile whose ``summary()`` prints compile/step timing. The
        inference state is NOT mutated."""
        saved = self.params
        t_compile0 = time.perf_counter()
        prof = _VIProfile()
        try:
            opt = self._make_opt(obj_optimizer)
            opt_state = opt.init(self.params)
            grad_fn = jax.value_and_grad(self.objective)

            def step(carry, k):
                params, opt_state = carry
                loss, g = grad_fn(params, k)
                updates, opt_state = opt.update(g, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), loss

            scan_fn = jax.jit(lambda c, ks: lax.scan(step, c, ks))
            carry = (self.params, opt_state)
            ks = jax.random.split(self.key, min(chunk, n))
            carry, l0 = scan_fn(carry, ks)
            jax.block_until_ready(l0)
            prof.compile_and_first_chunk_s = time.perf_counter() - t_compile0
            done = min(chunk, n)
            # time at least one compiled chunk so per-iteration cost is
            # always measured post-compile
            steady_steps = max(n - done, min(chunk, n))
            t1 = time.perf_counter()
            run = 0
            while run < steady_steps:
                m = min(chunk, steady_steps - run)
                ks = jax.random.split(jax.random.fold_in(self.key, done + run), m)
                carry, l = scan_fn(carry, ks)
                jax.block_until_ready(l)
                run += m
            prof.steady_s = time.perf_counter() - t1
            prof.n = n
            prof.chunk = chunk
            prof.per_step_us = (
                prof.steady_s / steady_steps * 1e6 if steady_steps else None
            )
        finally:
            self.params = saved
        return prof

    def _wrap(self, params, hist):
        approx = self.approx_cls(self.model, self.info, params)
        approx.hist = np.asarray(hist)
        return approx


class _VIProfile:
    """run_profiling result: `.summary()` prints the timing table."""

    compile_and_first_chunk_s = None
    steady_s = None
    per_step_us = None
    n = 0
    chunk = 0

    def summary(self, stream=None):
        import sys

        stream = stream or sys.stdout
        lines = [
            "VI fit profile (one jitted lax.scan chunk per host iteration)",
            f"  iterations          : {self.n} (chunk={self.chunk})",
            f"  compile+first chunk : {self.compile_and_first_chunk_s:.3f} s",
            f"  steady-state wall   : {self.steady_s:.3f} s",
        ]
        if self.per_step_us is not None:
            lines.append(f"  per-iteration       : {self.per_step_us:.1f} µs")
        print("\n".join(lines), file=stream)
        return self


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
                 random_seed=None, start=None,
                 total_grad_norm_constraint=None, **kwargs):
        from ..sampling.mcmc import _resolve_seed

        self.total_grad_norm_constraint = total_grad_norm_constraint
        self.model = modelcontext(model)
        self.key = _resolve_seed(random_seed)
        self.info = self.model.raveled_info()
        D = self.info.total_size
        start_flat = _start_flat(self.model, self.info, start, self.key)
        if start_flat is None:
            from ..blocking import ravel_point
            from ..initial_point import make_initial_point

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
            progressbar=True, chunk=100, score=None, **kwargs):
        opt = self._make_opt(obj_optimizer, default="adagrad", default_lr=1e-1)
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
        hist = np.concatenate(losses) if losses else np.asarray([])
        return self._wrap(carry[0], hist)


class ASVGD(SVGD):
    """Amortized SVGD (reference inference.py:610) — same particle dynamics
    here (non-amortized fallback). Like the reference, ASVGD does not take
    a ``start`` argument (TypeError), and constructing it warns that the
    operator is experimental."""

    def __init__(self, *args, start=None, **kwargs):
        import warnings

        warnings.warn(
            "ASVGD is an experimental inference Operator; results may be "
            "unstable (reference opvi.py ObjectiveFunction warning)",
            UserWarning,
            stacklevel=2,
        )
        if start is not None:
            raise TypeError(
                "ASVGD does not support the start argument (reference "
                "inference.py:610)"
            )
        super().__init__(*args, **kwargs)


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
