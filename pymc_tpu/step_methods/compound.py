"""Compound stepping and competence-based assignment.

Parity: reference pymc/step_methods/compound.py (BlockedStep:108,
CompoundStep:280, Competence enum:47) and pymc/sampling/mcmc.py:256
(assign_step_methods).

TPU-native: each step method is a pure batched kernel
step(key, point, state, flags) -> (point, state, stats) over
(chains, ...)-shaped value dicts; a CompoundStep applies its sub-steps
sequentially inside ONE jitted lax.scan over draws.
"""

from __future__ import annotations

import enum
import logging
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import floatX
from ..model.core import modelcontext

__all__ = ["Competence", "BlockedStep", "CompoundStep", "assign_step_methods",
           "sample_with_steps"]

_log = logging.getLogger("pymc_tpu")


class Competence(enum.IntEnum):
    """Reference compound.py:47."""

    INCOMPATIBLE = 0
    COMPATIBLE = 1
    PREFERRED = 2
    IDEAL = 3


class BlockedStep:
    """Base class for batched step kernels.

    Subclasses set `self.rvs` (FreeRV nodes they update) and implement
    init_state / step. `flags` carries (step_i, is_tune, tune_now) traced
    scalars.
    """

    stats_names: tuple = ()
    name = "step"

    def __init__(self, vars=None, model=None, **kwargs):
        model = modelcontext(model)
        self.model = model
        if vars is None:
            rvs = list(model.free_RVs)
        else:
            rvs = []
            for v in vars:
                if isinstance(v, str):
                    rvs.append(model.named_vars[v])
                else:
                    rvs.append(v)
        self.rvs = rvs
        self.value_names = [rv.value_name for rv in rvs]

    @classmethod
    def competence(cls, var, has_grad):
        return Competence.INCOMPATIBLE

    def init_state(self, point, chains, key):  # pragma: no cover - abstract
        raise NotImplementedError

    def step(self, key, point, state, flags):  # pragma: no cover - abstract
        raise NotImplementedError

    def _logp_fn(self):
        """Single-chain value-dict logp over ALL model value vars."""
        return self.model.logp_fn()

    def __repr__(self):
        return f"{type(self).__name__}({[rv.name for rv in self.rvs]})"


class CompoundStep:
    """Sequential application of several step kernels (reference
    compound.py:280)."""

    def __init__(self, methods):
        self.methods = list(methods)

    @property
    def value_names(self):
        out = []
        for m in self.methods:
            out.extend(m.value_names)
        return out

    def init_state(self, point, chains, key):
        return tuple(
            m.init_state(point, chains, jax.random.fold_in(key, i))
            for i, m in enumerate(self.methods)
        )

    def step(self, key, point, states, flags):
        new_states = []
        all_stats = {}
        for i, (m, st) in enumerate(zip(self.methods, states)):
            point, st, stats = m.step(jax.random.fold_in(key, i), point, st, flags)
            new_states.append(st)
            for k, v in stats.items():
                all_stats[f"{m.name}{i}_{k}" if len(self.methods) > 1 else k] = v
        return point, tuple(new_states), all_stats

    def __repr__(self):
        return f"CompoundStep({self.methods})"


def assign_step_methods(model, step=None, methods=None):
    """Competence-based automatic assignment (reference mcmc.py:256-347):
    continuous differentiable blocks -> NUTS; binary -> BinaryGibbs;
    bounded-categorical -> CategoricalGibbs; other discrete -> Metropolis."""
    from .hmc import NUTS
    from .metropolis import (
        BinaryGibbsMetropolis,
        CategoricalGibbsMetropolis,
        Metropolis,
    )
    from ..distributions.discrete import Bernoulli, Categorical, DiscreteUniform

    assigned = set()
    methods_out = []
    if step is not None:
        steps = step if isinstance(step, (list, tuple)) else [step]
        for s in steps:
            if isinstance(s, CompoundStep):
                methods_out.extend(s.methods)
                for m in s.methods:
                    assigned.update(rv.name for rv in m.rvs)
            else:
                methods_out.append(s)
                assigned.update(rv.name for rv in s.rvs)

    rest = [rv for rv in model.free_RVs if rv.name not in assigned]
    cont = [rv for rv in rest if not rv.dist.is_discrete]
    disc = [rv for rv in rest if rv.dist.is_discrete]
    if cont:
        methods_out.append(NUTS(vars=cont, model=model))
    for rv in disc:
        if isinstance(rv.dist, Bernoulli):
            methods_out.append(BinaryGibbsMetropolis(vars=[rv], model=model))
        elif isinstance(rv.dist, (Categorical,)):
            methods_out.append(CategoricalGibbsMetropolis(vars=[rv], model=model))
        else:
            methods_out.append(Metropolis(vars=[rv], model=model))
    if len(methods_out) == 1:
        return methods_out[0]
    return CompoundStep(methods_out)


def sample_with_steps(
    draws=1000, tune=1000, chains=4, model=None, step=None, random_seed=None,
    discard_tuned_samples=True, compute_convergence_checks=True,
    idata_kwargs=None, progressbar=True, initvals=None,
    return_inferencedata=True,
):
    """MCMC driver for compound / non-NUTS step methods: one jitted scan,
    chains batched (replaces the reference's per-chain process loop for
    these samplers too)."""
    from ..backends.arviz import to_inference_data
    from ..initial_point import make_initial_points_per_chain
    from ..sampling.mcmc import _resolve_seed
    from ..stats.convergence import log_warnings, run_convergence_checks

    model = modelcontext(model)
    key = _resolve_seed(random_seed)
    k_init, k_state, k_run = jax.random.split(key, 3)

    stepper = assign_step_methods(model, step)
    if not isinstance(stepper, CompoundStep):
        stepper = CompoundStep([stepper])
    _log.info(f"Compound sampling with {stepper.methods}")

    point0 = make_initial_points_per_chain(
        model, k_init, chains, jitter=1.0, overrides=initvals
    )
    state0 = stepper.init_state(point0, chains, k_state)

    tune_interval_flags = np.zeros(tune + draws, dtype=bool)
    tune_interval_flags[99::100] = True  # reference tune_interval=100
    is_tune = np.concatenate(
        [np.ones(tune, dtype=bool), np.zeros(draws, dtype=bool)]
    )
    tune_now = tune_interval_flags & is_tune

    def scan_step(carry, xs):
        step_i, is_t, t_now = xs
        point, states = carry
        flags = {"step_i": step_i, "is_tune": is_t, "tune_now": t_now}
        point, states, stats = stepper.step(
            jax.random.fold_in(k_run, step_i), point, states, flags
        )
        return (point, states), (point, stats)

    scan_fn = jax.jit(lambda c, xs: lax.scan(scan_step, c, xs))
    xs_all = (
        jnp.arange(tune + draws, dtype=jnp.int32),
        jnp.asarray(is_tune),
        jnp.asarray(tune_now),
    )
    t0 = time.perf_counter()
    (point, states), (trace_points, stats) = scan_fn((point0, state0), xs_all)
    trace_points = jax.block_until_ready(trace_points)
    t1 = time.perf_counter()
    _log.info(f"Compound sampling took {t1 - t0:.2f}s")

    # keep only post-warmup draws
    def cut(x):
        return x[tune:]

    trace_points = jax.tree.map(cut, trace_points)
    stats = jax.tree.map(cut, stats)

    posterior = _postprocess_points(model, trace_points)
    stat_arrays = {
        k: np.asarray(jax.device_get(v)).swapaxes(0, 1)
        for k, v in stats.items()
        if np.asarray(jax.device_get(v)).ndim == 2
    }
    idata = to_inference_data(
        model,
        posterior=posterior,
        sample_stats=stat_arrays or None,
        attrs={"sampling_time": t1 - t0, "inference_library": "pymc_tpu"},
    )
    if compute_convergence_checks:
        log_warnings(run_convergence_checks(idata, model))
    if not return_inferencedata:
        from ..backends.base import multitrace_from_idata

        return multitrace_from_idata(idata)
    return idata


def _postprocess_points(model, trace_points):
    """{value_name: (draws, chains, ...)} -> constrained posterior dict with
    deterministics, (chain, draw, ...)-ordered numpy arrays."""
    from ..graph import evaluate

    S = None

    def post_one(vals):
        env = {}
        out = {}
        for rv in model.free_RVs:
            v = vals[rv.value_name]
            x = rv.transform.backward(v, env) if rv.transform is not None else v
            env[rv.name] = x
            out[rv.name] = x
        memo = {}
        for det in model.deterministics:
            out[det.name] = evaluate(det, env, memo)
        return out

    flat = {}
    for k, v in trace_points.items():
        S, C = v.shape[:2]
        flat[k] = v.reshape((S * C,) + v.shape[2:])
    out = jax.jit(jax.vmap(post_one))(flat)
    return {
        k: np.asarray(jax.device_get(v)).reshape((S, C) + v.shape[1:]).swapaxes(0, 1)
        for k, v in out.items()
    }
