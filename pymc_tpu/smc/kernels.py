"""SMC kernels.

Parity: reference pymc/smc/kernels.py (SMC_KERNEL lifecycle:51-444 —
initialize_population from prior, update_beta_and_weights with bisection on
the inverse temperature targeting ESS = threshold*draws:309-344, systematic
resampling:346-354,668, tune, mutate; IMH:446 independent MH from fitted MVN;
MH:556 random-walk with particle covariance).

TPU-native (SURVEY.md §2.11 mapping): particles are an array axis —
everything vmaps; the beta bisection is a fixed-iteration on-device loop;
resampling is a sorted-uniform gather; independent SMC chains vmap on top.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.special import logsumexp

from ..config import floatX

__all__ = ["SMCState", "smc_init", "smc_stage", "IMH", "MH"]


class SMCState(NamedTuple):
    particles: jax.Array        # (N, D) unconstrained
    prior_logp: jax.Array       # (N,)
    like_logp: jax.Array        # (N,)
    beta: jax.Array             # ()
    log_marginal: jax.Array     # () incremental log marginal likelihood
    stage: jax.Array            # ()
    acc_rate: jax.Array         # () last mutation acceptance rate
    proposal_scale: jax.Array   # () MH proposal scaling


def smc_init(particles, prior_like_fn):
    prior_lp, like_lp = prior_like_fn(particles)
    return SMCState(
        particles=particles,
        prior_logp=prior_lp,
        like_logp=like_lp,
        beta=jnp.zeros((), floatX()),
        log_marginal=jnp.zeros((), floatX()),
        stage=jnp.zeros((), jnp.int32),
        acc_rate=jnp.ones((), floatX()),
        proposal_scale=jnp.ones((), floatX()),
    )


def _find_beta(beta_old, like_logp, threshold, iters=40):
    """Bisection on d = beta_new - beta_old so that the incremental-weight ESS
    hits threshold*N (reference kernels.py:309-344)."""
    N = like_logp.shape[0]
    target = threshold * N

    def ess_at(d):
        lw = d * like_logp
        lw = lw - logsumexp(lw)
        return jnp.exp(-logsumexp(2.0 * lw))

    lo = jnp.zeros((), floatX())
    hi = jnp.ones((), floatX()) - beta_old

    full_ok = ess_at(hi) >= target

    def body(_, st):
        lo, hi = st
        mid = 0.5 * (lo + hi)
        grow = ess_at(mid) >= target
        return jnp.where(grow, mid, lo), jnp.where(grow, hi, mid)

    lo_f, hi_f = lax.fori_loop(0, iters, body, (lo, hi))
    d = jnp.where(full_ok, 1.0 - beta_old, 0.5 * (lo_f + hi_f))
    d = jnp.maximum(d, 1e-6)
    return jnp.minimum(beta_old + d, 1.0)


def _systematic_resample(key, log_weights, particles_and_stats):
    """Sorted-uniform gather (reference kernels.py:668)."""
    N = log_weights.shape[0]
    w = jnp.exp(log_weights - logsumexp(log_weights))
    cum = jnp.cumsum(w)
    u = jax.random.uniform(key, (), dtype=floatX())
    positions = (jnp.arange(N, dtype=floatX()) + u) / N
    idx = jnp.searchsorted(cum, positions)
    idx = jnp.clip(idx, 0, N - 1)
    return jax.tree.map(lambda x: x[idx], particles_and_stats)


class IMH:
    """Independent Metropolis-Hastings from a fitted Gaussian
    (reference kernels.py:446)."""

    name = "IMH"

    def __init__(self, n_steps=25, correlation_threshold=0.01):
        self.n_steps = n_steps
        self.correlation_threshold = correlation_threshold

    def mutate(self, key, state: SMCState, prior_like_fn, beta):
        particles = state.particles
        N, D = particles.shape
        mean = jnp.mean(particles, axis=0)
        cov = jnp.cov(particles.T).reshape(D, D) + 1e-6 * jnp.eye(D, dtype=floatX())
        chol = jnp.linalg.cholesky(cov)

        def logq(x):
            from jax.scipy.linalg import solve_triangular

            diff = x - mean  # (N, D)
            z = solve_triangular(chol, diff.T, lower=True).T
            return -0.5 * jnp.sum(z**2, axis=-1) - jnp.sum(
                jnp.log(jnp.diagonal(chol))
            )

        def tempered(prior_lp, like_lp):
            return prior_lp + beta * like_lp

        def step(carry, k):
            particles, prior_lp, like_lp, acc_sum = carry
            k1, k2 = jax.random.split(k)
            eps = jax.random.normal(k1, (N, D), dtype=floatX())
            prop = mean + eps @ chol.T
            p_prior, p_like = prior_like_fn(prop)
            log_ratio = (
                tempered(p_prior, p_like)
                - tempered(prior_lp, like_lp)
                + logq(particles)
                - logq(prop)
            )
            accept = (
                jnp.log(jax.random.uniform(k2, (N,), dtype=floatX())) < log_ratio
            )
            particles = jnp.where(accept[:, None], prop, particles)
            prior_lp = jnp.where(accept, p_prior, prior_lp)
            like_lp = jnp.where(accept, p_like, like_lp)
            return (particles, prior_lp, like_lp, acc_sum + jnp.mean(accept)), None

        keys = jax.random.split(key, self.n_steps)
        (particles, prior_lp, like_lp, acc_sum), _ = lax.scan(
            step, (particles, state.prior_logp, state.like_logp,
                   jnp.zeros((), floatX())),
            keys,
        )
        acc_rate = acc_sum / self.n_steps
        return particles, prior_lp, like_lp, acc_rate, state.proposal_scale


class MH:
    """Random-walk Metropolis with particle-covariance proposals
    (reference kernels.py:556)."""

    name = "MH"

    def __init__(self, n_steps=25):
        self.n_steps = n_steps

    def mutate(self, key, state: SMCState, prior_like_fn, beta):
        particles = state.particles
        N, D = particles.shape
        cov = jnp.cov(particles.T).reshape(D, D) + 1e-6 * jnp.eye(D, dtype=floatX())
        chol = jnp.linalg.cholesky(cov)
        scale = state.proposal_scale

        def tempered(prior_lp, like_lp):
            return prior_lp + beta * like_lp

        def step(carry, k):
            particles, prior_lp, like_lp, acc_sum = carry
            k1, k2 = jax.random.split(k)
            eps = jax.random.normal(k1, (N, D), dtype=floatX())
            prop = particles + scale * (eps @ chol.T)
            p_prior, p_like = prior_like_fn(prop)
            log_ratio = tempered(p_prior, p_like) - tempered(prior_lp, like_lp)
            accept = (
                jnp.log(jax.random.uniform(k2, (N,), dtype=floatX())) < log_ratio
            )
            particles = jnp.where(accept[:, None], prop, particles)
            prior_lp = jnp.where(accept, p_prior, prior_lp)
            like_lp = jnp.where(accept, p_like, like_lp)
            return (particles, prior_lp, like_lp, acc_sum + jnp.mean(accept)), None

        keys = jax.random.split(key, self.n_steps)
        (particles, prior_lp, like_lp, acc_sum), _ = lax.scan(
            step, (particles, state.prior_logp, state.like_logp,
                   jnp.zeros((), floatX())),
            keys,
        )
        acc_rate = acc_sum / self.n_steps
        # tune the proposal scale toward 0.234 acceptance (reference MH.tune)
        new_scale = scale * jnp.exp(2.0 * (acc_rate - 0.234))
        new_scale = jnp.clip(new_scale, 1e-3, 10.0)
        return particles, prior_lp, like_lp, acc_rate, new_scale


def smc_stage(kernel, prior_like_fn, threshold=0.5):
    """Build one jittable SMC stage: reweight -> resample -> mutate."""

    def stage(key, state: SMCState):
        done = state.beta >= 1.0
        k_res, k_mut = jax.random.split(key)
        beta_new = _find_beta(state.beta, state.like_logp, threshold)
        lw = (beta_new - state.beta) * state.like_logp
        N = lw.shape[0]
        log_marginal = state.log_marginal + logsumexp(lw) - jnp.log(float(N))
        particles, prior_lp, like_lp = _systematic_resample(
            k_res, lw, (state.particles, state.prior_logp, state.like_logp)
        )
        resampled = SMCState(
            particles=particles, prior_logp=prior_lp, like_logp=like_lp,
            beta=beta_new, log_marginal=log_marginal, stage=state.stage + 1,
            acc_rate=state.acc_rate, proposal_scale=state.proposal_scale,
        )
        p, plp, llp, acc, new_scale = kernel.mutate(
            k_mut, resampled, prior_like_fn, beta_new
        )
        new_state = SMCState(
            particles=p, prior_logp=plp, like_logp=llp, beta=beta_new,
            log_marginal=log_marginal, stage=state.stage + 1, acc_rate=acc,
            proposal_scale=new_scale,
        )
        # chains already at beta=1 pass through unchanged
        return jax.tree.map(
            lambda new, old: jnp.where(done, old, new), new_state, state
        )

    return stage
