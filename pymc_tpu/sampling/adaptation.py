"""Warmup adaptation: dual-averaging step size + Welford mass matrix, with the
Stan-style expanding-window schedule.

Parity: reference pymc/step_methods/step_sizes.py:41-105 (DualAverageAdaptation,
Hoffman-Gelman constants mu=log(10*eps0), gamma=.05, k=.75, t0=10) and
pymc/step_methods/hmc/quadpotential.py:211-394 (QuadPotentialDiagAdapt,
Welford _WeightedVariance, windowed updates) / :748 (QuadPotentialFullAdapt).

Everything is per-chain vectorized pure-JAX state threaded through lax.scan —
the reference's per-chain Python objects become a batched pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "DualAveragingState",
    "da_init",
    "da_update",
    "da_restart",
    "WelfordState",
    "welford_init",
    "welford_update",
    "welford_variance",
    "welford_covariance",
    "ExpWeightedState",
    "expw_init",
    "expw_seed",
    "expw_update",
    "expw_inv_mass",
    "build_schedule",
    "find_reasonable_step_size",
]


class DualAveragingState(NamedTuple):
    mu: jax.Array
    log_step: jax.Array
    log_step_avg: jax.Array
    h_bar: jax.Array
    count: jax.Array


_GAMMA = 0.05
_K = 0.75
_T0 = 10.0


def da_init(step_size):
    log_step = jnp.log(step_size)
    return DualAveragingState(
        mu=jnp.log(10.0 * step_size),
        log_step=log_step,
        log_step_avg=log_step,
        h_bar=jnp.zeros_like(log_step),
        count=jnp.ones_like(log_step),
    )


def da_update(state: DualAveragingState, accept_prob, target):
    """One Hoffman-Gelman (2014) dual-averaging update (reference
    step_sizes.py:66)."""
    count = state.count
    w = 1.0 / (count + _T0)
    h_bar = (1.0 - w) * state.h_bar + w * (target - accept_prob)
    log_step = state.mu - h_bar * jnp.sqrt(count) / _GAMMA
    mk = count ** -_K
    log_step_avg = mk * log_step + (1.0 - mk) * state.log_step_avg
    return DualAveragingState(
        mu=state.mu,
        log_step=log_step,
        log_step_avg=log_step_avg,
        h_bar=h_bar,
        count=count + 1.0,
    )


def da_restart(state: DualAveragingState):
    """Re-anchor after a mass-matrix window switch (Stan behavior): keep the
    current averaged step size, restart the averaging statistics."""
    log_step = state.log_step_avg
    return DualAveragingState(
        mu=jnp.log(10.0) + log_step,
        log_step=log_step,
        log_step_avg=log_step,
        h_bar=jnp.zeros_like(log_step),
        count=jnp.ones_like(state.count),
    )


class WelfordState(NamedTuple):
    count: jax.Array
    mean: jax.Array
    m2: jax.Array  # (D,) for diag, (D, D) for full


def welford_init(dim, full=False, dtype=jnp.float32):
    shape = (dim, dim) if full else (dim,)
    return WelfordState(
        count=jnp.zeros((), dtype=dtype),
        mean=jnp.zeros((dim,), dtype=dtype),
        m2=jnp.zeros(shape, dtype=dtype),
    )


def welford_update(state: WelfordState, x):
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    delta2 = x - mean
    if state.m2.ndim == 2:
        m2 = state.m2 + jnp.outer(delta, delta2)
    else:
        m2 = state.m2 + delta * delta2
    return WelfordState(count=count, mean=mean, m2=m2)


def welford_variance(state: WelfordState, regularize=True):
    """Regularized diagonal variance estimate (reference
    quadpotential.py:211-394 / Stan: shrink towards 1e-3)."""
    n = jnp.maximum(state.count, 2.0)
    var = state.m2 / (n - 1.0)
    if regularize:
        w = n / (n + 5.0)
        var = w * var + 1e-3 * (1.0 - w)
    return jnp.maximum(var, 1e-12)


def welford_covariance(state: WelfordState, regularize=True):
    n = jnp.maximum(state.count, 2.0)
    cov = state.m2 / (n - 1.0)
    if regularize:
        w = n / (n + 5.0)
        dim = cov.shape[-1]
        cov = w * cov + 1e-3 * (1.0 - w) * jnp.eye(dim, dtype=cov.dtype)
    return cov


class ExpWeightedState(NamedTuple):
    """Exponentially-weighted mean/variance of draws AND gradients — the
    grad-based diag mass estimator behind init="jitter+adapt_diag_grad"
    (reference quadpotential.py:458-580, QuadPotentialDiagAdaptExp with
    use_grads=True). Arrays carry any leading batch (chain) axes."""

    mean_q: jax.Array
    var_q: jax.Array
    mean_g: jax.Array
    var_g: jax.Array


def expw_init(shape, dtype=jnp.float32):
    z = jnp.zeros(shape, dtype=dtype)
    return ExpWeightedState(z, z, z, z)


def expw_seed(q, g):
    """Anchor the estimator at the first post-discard-window draw
    (reference quadpotential.py:545-558: init_mean=sample, init_var=0)."""
    return ExpWeightedState(q, jnp.zeros_like(q), g, jnp.zeros_like(g))


def expw_update(state: ExpWeightedState, q, g, alpha=0.02):
    """One _ExpWeightedVariance.add_sample step for draws and grads
    (reference quadpotential.py:466-470)."""
    dq = q - state.mean_q
    mean_q = state.mean_q + alpha * dq
    var_q = (1.0 - alpha) * (state.var_q + alpha * dq * dq)
    dg = g - state.mean_g
    mean_g = state.mean_g + alpha * dg
    var_g = (1.0 - alpha) * (state.var_g + alpha * dg * dg)
    return ExpWeightedState(mean_q, var_q, mean_g, var_g)


def expw_inv_mass(state: ExpWeightedState):
    """Diagonal inverse-mass estimate sqrt(var_q / var_grad)
    (reference quadpotential.py:575-580 _update_from_variances)."""
    var = jnp.sqrt(
        jnp.maximum(state.var_q, 1e-20) / jnp.maximum(state.var_g, 1e-20)
    )
    return jnp.clip(var, 1e-12, 1e12)


def build_schedule(tune, init_buffer=75, term_buffer=50, base_window=25):
    """Stan warmup schedule as static numpy arrays consumed by lax.scan.

    Returns dict of (tune,)-shaped arrays:
      update_mass[i]  — accumulate this draw into the Welford estimator
      switch_mass[i]  — end of a mass window: swap in new estimate, reset
    (reference quadpotential.py:335-356 window logic / Stan adaptation).
    """
    tune = int(tune)
    update_mass = np.zeros(tune, dtype=bool)
    switch_mass = np.zeros(tune, dtype=bool)
    if tune == 0:
        return {"update_mass": update_mass, "switch_mass": switch_mass}
    if tune < init_buffer + term_buffer + base_window:
        init_buffer = max(int(0.15 * tune), 1)
        term_buffer = max(int(0.1 * tune), 1)
        base_window = max(tune - init_buffer - term_buffer, 1)
    start = init_buffer
    end_adapt = tune - term_buffer
    window = base_window
    while start < end_adapt:
        stop = min(start + window, end_adapt)
        # if the remaining tail is too short for another doubling, absorb it
        if stop + 2 * window > end_adapt:
            stop = end_adapt
        update_mass[start:stop] = True
        switch_mass[stop - 1] = True
        start = stop
        window *= 2
    return {"update_mass": update_mass, "switch_mass": switch_mass}


def find_reasonable_step_size(
    logp_grad_fn, q, logp, grad, key, inv_mass_diag, initial=1.0, max_iters=60
):
    """Hoffman-Gelman heuristic: double/halve eps until the one-step leapfrog
    acceptance probability crosses 0.5. Jittable; vmap over chains.
    (reference: nutpie / Stan init; pymc uses a fixed formula + jitter)."""
    dtype = q.dtype
    full = inv_mass_diag.ndim == 2

    def vel(p):
        return inv_mass_diag @ p if full else inv_mass_diag * p

    xi = jax.random.normal(key, q.shape, dtype=dtype)
    if full:
        from jax.scipy.linalg import solve_triangular

        L = jnp.linalg.cholesky(inv_mass_diag)
        p = solve_triangular(L.T, xi, lower=False)
    else:
        p = xi / jnp.sqrt(inv_mass_diag)
    h0 = -logp + 0.5 * jnp.dot(p, vel(p))

    def energy_at(eps):
        p_half = p + 0.5 * eps * grad
        q_new = q + eps * vel(p_half)
        logp_new, grad_new = logp_grad_fn(q_new)
        p_new = p_half + 0.5 * eps * grad_new
        return -logp_new + 0.5 * jnp.dot(p_new, vel(p_new))

    eps0 = jnp.asarray(initial, dtype=dtype)
    h1 = energy_at(eps0)
    log_ratio0 = h0 - h1  # log accept prob (unclipped)
    log_ratio0 = jnp.where(jnp.isfinite(log_ratio0), log_ratio0, -jnp.inf)
    direction = jnp.where(log_ratio0 > jnp.log(0.5), 1.0, -1.0)

    def cond(state):
        eps, log_ratio, it = state
        crossed = jnp.where(
            direction > 0, log_ratio <= jnp.log(0.5), log_ratio > jnp.log(0.5)
        )
        return jnp.logical_and(~crossed, it < max_iters)

    def body(state):
        eps, _, it = state
        eps_new = eps * jnp.where(direction > 0, 2.0, 0.5)
        h1 = energy_at(eps_new)
        lr = h0 - h1
        lr = jnp.where(jnp.isfinite(lr), lr, -jnp.inf)
        return eps_new, lr, it + 1

    eps, _, _ = jax.lax.while_loop(cond, body, (eps0, log_ratio0, jnp.zeros((), jnp.int32)))
    return jnp.clip(eps, 1e-10, 1e3)


def welford_update_batch(state: WelfordState, X):
    """Chan parallel combine of a (C, D) batch into a FULL-covariance Welford
    state — the batched cross-product is one MXU matmul (reference
    QuadPotentialFullAdapt quadpotential.py:748, pooled across chains)."""
    C = X.shape[0]
    mean_b = jnp.mean(X, axis=0)
    Xc = X - mean_b
    m2_b = Xc.T @ Xc
    n = state.count
    tot = n + C
    delta = mean_b - state.mean
    mean = state.mean + delta * (C / tot)
    m2 = state.m2 + m2_b + jnp.outer(delta, delta) * (n * C / tot)
    return WelfordState(count=tot, mean=mean, m2=m2)
