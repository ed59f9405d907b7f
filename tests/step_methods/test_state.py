"""Per-stepper sampling-state save/load equivalence.

Mirrors reference tests/step_methods/test_state.py: a sampler interrupted at
draw N, its state serialized to disk, restored, and continued must produce
bit-identical draws to an uninterrupted run. Here every step method is a
pure kernel step(key, point, state, flags) -> (point, state, stats) whose
state is a JAX pytree, so the checkpoint is a save_pytree/load_pytree disk
round-trip of (point, state).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pymc_tpu as pm
from pymc_tpu.backends.checkpoint import load_pytree, save_pytree
from pymc_tpu.initial_point import make_initial_points_per_chain
from pymc_tpu.step_methods.compound import CompoundStep
from pymc_tpu.step_methods.hmc import NUTS, HamiltonianMC
from pymc_tpu.step_methods.metropolis import (
    BinaryGibbsMetropolis,
    DEMetropolisZ,
    Metropolis,
)
from pymc_tpu.step_methods.slicer import Slice


CHAINS = 2
TUNE = 12
TOTAL = 24


def _cont_model():
    rng = np.random.default_rng(0)
    y = rng.normal(0.5, 1.2, 25)
    with pm.Model() as m:
        mu = pm.Normal("mu", 0, 2)
        sigma = pm.HalfNormal("sigma", 1)
        pm.Normal("y", mu, sigma, observed=y)
    return m


def _binary_model():
    with pm.Model() as m:
        z = pm.Bernoulli("z", 0.4, shape=(3,))
        pm.Potential("pull", pm.math.sum(z) * 0.3)
    return m


def _flags(i, tune=TUNE):
    return {
        "step_i": jnp.asarray(i, jnp.int32),
        "is_tune": jnp.asarray(i < tune),
        "tune_now": jnp.asarray(bool(i < tune and i % 100 == 99)),
    }


def _run(stepper, point, state, k_run, start, stop):
    for i in range(start, stop):
        point, state, _ = stepper.step(
            jax.random.fold_in(k_run, i), point, state, _flags(i)
        )
    return point, state


def _assert_trees_equal(a, b):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


STEPPERS = [
    ("nuts", lambda m: NUTS(model=m, max_treedepth=6)),
    ("hmc", lambda m: HamiltonianMC(model=m)),
    ("metropolis", lambda m: Metropolis(model=m)),
    ("slice", lambda m: Slice(model=m)),
    ("demz", lambda m: DEMetropolisZ(model=m, max_history=64)),
]


@pytest.mark.parametrize("name,make", STEPPERS, ids=[n for n, _ in STEPPERS])
def test_resume_equivalence_continuous(name, make, tmp_path):
    """draws after (save -> disk round-trip -> load -> resume) must be
    bit-identical to the uninterrupted run, per step method."""
    m = _cont_model()
    with m:
        stepper = make(m)
    key = jax.random.PRNGKey(7)
    k_init, k_state, k_run = jax.random.split(key, 3)
    point0 = make_initial_points_per_chain(m, k_init, CHAINS, jitter=0.5)
    state0 = stepper.init_state(point0, CHAINS, k_state)

    # uninterrupted reference run
    point_full, state_full = _run(stepper, point0, state0, k_run, 0, TOTAL)

    # interrupted run: stop at the midpoint, serialize to disk, restore
    mid = TOTAL // 2
    point_a, state_a = _run(stepper, point0, state0, k_run, 0, mid)
    ckpt = os.path.join(str(tmp_path), f"ckpt_{name}")
    save_pytree(ckpt, (point_a, state_a))
    point_b, state_b = load_pytree(ckpt, (point_a, state_a))
    _assert_trees_equal((point_a, state_a), (point_b, state_b))
    point_res, state_res = _run(stepper, point_b, state_b, k_run, mid, TOTAL)

    _assert_trees_equal(point_full, point_res)
    _assert_trees_equal(state_full, state_res)


def test_resume_equivalence_binary_gibbs(tmp_path):
    m = _binary_model()
    with m:
        stepper = BinaryGibbsMetropolis(model=m)
    key = jax.random.PRNGKey(3)
    k_init, k_state, k_run = jax.random.split(key, 3)
    point0 = make_initial_points_per_chain(m, k_init, CHAINS, jitter=0.0)
    state0 = stepper.init_state(point0, CHAINS, k_state)

    point_full, state_full = _run(stepper, point0, state0, k_run, 0, TOTAL)
    mid = TOTAL // 2
    point_a, state_a = _run(stepper, point0, state0, k_run, 0, mid)
    ckpt = os.path.join(str(tmp_path), "ckpt_bg")
    save_pytree(ckpt, (point_a, state_a))
    point_b, state_b = load_pytree(ckpt, (point_a, state_a))
    point_res, state_res = _run(stepper, point_b, state_b, k_run, mid, TOTAL)

    _assert_trees_equal(point_full, point_res)
    _assert_trees_equal(state_full, state_res)


def test_resume_equivalence_compound(tmp_path):
    """Compound NUTS+Metropolis state (tuple of sub-states) round-trips."""
    rng = np.random.default_rng(1)
    y = rng.normal(1.0, 1.0, 20)
    with pm.Model() as m:
        mu = pm.Normal("mu", 0, 2)
        n = pm.Poisson("n", 4)
        pm.Normal("y", mu, 1, observed=y)
    with m:
        stepper = CompoundStep([
            NUTS(vars=[m.named_vars["mu"]], model=m, max_treedepth=5),
            Metropolis(vars=[m.named_vars["n"]], model=m),
        ])
    key = jax.random.PRNGKey(11)
    k_init, k_state, k_run = jax.random.split(key, 3)
    point0 = make_initial_points_per_chain(m, k_init, CHAINS, jitter=0.5)
    state0 = stepper.init_state(point0, CHAINS, k_state)

    point_full, state_full = _run(stepper, point0, state0, k_run, 0, TOTAL)
    mid = TOTAL // 2
    point_a, state_a = _run(stepper, point0, state0, k_run, 0, mid)
    ckpt = os.path.join(str(tmp_path), "ckpt_comp")
    save_pytree(ckpt, (point_a, state_a))
    point_b, state_b = load_pytree(ckpt, (point_a, state_a))
    point_res, state_res = _run(stepper, point_b, state_b, k_run, mid, TOTAL)

    _assert_trees_equal(point_full, point_res)
    _assert_trees_equal(state_full, state_res)


def test_demz_history_in_state(tmp_path):
    """DEMetropolisZ's proposal history is part of the serialized state:
    dropping it would NOT reproduce the uninterrupted run (it proposes from
    its own past). Guard that the history actually influences draws."""
    m = _cont_model()
    with m:
        stepper = DEMetropolisZ(model=m, max_history=64)
    key = jax.random.PRNGKey(5)
    k_init, k_state, k_run = jax.random.split(key, 3)
    point0 = make_initial_points_per_chain(m, k_init, CHAINS, jitter=0.5)
    state0 = stepper.init_state(point0, CHAINS, k_state)
    point_full, state_full = _run(stepper, point0, state0, k_run, 0, TOTAL)

    mid = TOTAL // 2
    point_a, state_a = _run(stepper, point0, state0, k_run, 0, mid)
    assert int(state_a["hist_len"][0]) == mid
    # wipe the history (simulating a state dict that forgot to persist it)
    state_wiped = dict(state_a)
    state_wiped["history"] = jnp.zeros_like(state_a["history"])
    state_wiped["hist_len"] = jnp.zeros_like(state_a["hist_len"])
    point_w, _ = _run(stepper, point_a, state_wiped, k_run, mid, TOTAL)
    full_mu = np.asarray(point_full["mu"])
    wiped_mu = np.asarray(point_w["mu"])
    assert not np.array_equal(full_mu, wiped_mu)
