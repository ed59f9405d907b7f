"""SMC kernels.

Parity: reference pymc/smc/kernels.py (SMC_KERNEL lifecycle:51-444 —
initialize_population from prior, update_beta_and_weights with bisection on
the inverse temperature targeting ESS = threshold*draws:309-344, systematic
resampling:346-354,668, tune, mutate; IMH:446 independent MH from fitted MVN
with correlation-tuned step count:486-525; Pearson:543; MH:556 random-walk
with particle covariance, per-particle proposal scales:587-649).

The number of mutation steps per stage is tuned exactly as the reference
does (kernels.py:486-525): after each MH sweep, the per-dimension absolute
Pearson correlation between the current particles and the stage-entry
particles is compared to the previous sweep's; mutation continues while
more than 90% of dimensions still decorrelate by more than
``correlation_threshold`` per sweep.

TPU-native (SURVEY.md §2.11 mapping): particles are an array axis —
everything vmaps; the beta bisection is a fixed-iteration on-device loop;
resampling is a sorted-uniform gather; the correlation-tuned mutation loop
is a lax.while_loop whose stopping reductions are collectives when the
particle axis is sharded over a mesh; independent SMC chains vmap on top.
"""

from __future__ import annotations

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
    acc_rate: jax.Array         # () last mutation acceptance rate (mean)
    proposal_scales: jax.Array  # (N,) per-particle MH proposal scaling
    chain_acc_rate: jax.Array   # (N,) per-particle acceptance (MH tuning)
    n_steps: jax.Array          # () mutation sweeps run in the last stage


def smc_init(particles, prior_like_fn, key=None):
    prior_lp, like_lp = prior_like_fn(particles, key)
    N, D = particles.shape
    # reference MH.setup_kernel (kernels.py:587-593): optimal RW scaling
    init_scale = min(1.0, 2.38**2 / D)
    return SMCState(
        particles=particles,
        prior_logp=prior_lp,
        like_logp=like_lp,
        beta=jnp.zeros((), floatX()),
        log_marginal=jnp.zeros((), floatX()),
        stage=jnp.zeros((), jnp.int32),
        acc_rate=jnp.ones((), floatX()),
        proposal_scales=jnp.full((N,), init_scale, floatX()),
        chain_acc_rate=jnp.full((N,), 0.234, floatX()),
        n_steps=jnp.zeros((), jnp.int32),
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


def _pearson_ref(a):
    """Precompute the stage-entry centering for the Pearson tracker
    (reference kernels.py:543-547): am = a - mean, aa = ||am||."""
    am = a - jnp.mean(a, axis=0, keepdims=True)
    aa = jnp.sqrt(jnp.sum(am**2, axis=0))
    return am, aa


def _pearson_get(am, aa, b):
    """Per-dimension |corr| of current particles vs the stage-entry set
    (reference kernels.py:549-553). Degenerate dimensions (zero variance)
    report correlation 1 — no decorrelation progress — matching the
    reference's nan-compares-False behavior in the stopping rule."""
    bm = b - jnp.mean(b, axis=0, keepdims=True)
    bb = jnp.sqrt(jnp.sum(bm**2, axis=0))
    ab = jnp.sum(am * bm, axis=0)
    denom = aa * bb
    return jnp.where(denom > 0, jnp.abs(ab / jnp.where(denom > 0, denom, 1.0)), 1.0)


def _particle_cov_chol(particles):
    """Cholesky of the particle covariance + 1e-6 jitter (reference
    kernels.py:478-480,610-612). ddof=0 to match np.cov(..., ddof=0)."""
    N, D = particles.shape
    mean = jnp.mean(particles, axis=0)
    diff = particles - mean
    cov = (diff.T @ diff) / N + 1e-6 * jnp.eye(D, dtype=particles.dtype)
    return mean, jnp.linalg.cholesky(cov)


def _correlation_tuned_loop(key, state, one_sweep, max_steps):
    """Run mutation sweeps until the Pearson decorrelation rule says stop
    (reference kernels.py:486-525): continue while >90% of dimensions still
    drop their |corr| vs the stage-entry particles by more than the
    threshold per sweep. Always runs at least one sweep.

    one_sweep(key, particles, prior_lp, like_lp) ->
        (particles, prior_lp, like_lp, accepted (N,) bool)
    Returns (particles, prior_lp, like_lp, acc_rate_mean (),
             per_particle_acc (N,), n_steps ()).
    """
    particles0 = state.particles
    am, aa = _pearson_ref(particles0)
    D = particles0.shape[1]
    N = particles0.shape[0]

    def cond(carry):
        (_, _, _, _, _, _, n, keep) = carry
        return jnp.logical_and(keep, n < max_steps)

    def body(carry):
        (key, particles, prior_lp, like_lp, old_corr, acc_sum, n, _) = carry
        key, k = jax.random.split(key)
        particles, prior_lp, like_lp, accepted = one_sweep(
            k, particles, prior_lp, like_lp
        )
        r = _pearson_get(am, aa, particles)
        keep = (
            jnp.mean(((old_corr - r) > state.corr_threshold).astype(floatX()))
            > 0.9
        )
        return (
            key, particles, prior_lp, like_lp, r,
            acc_sum + accepted.astype(floatX()), n + 1, keep,
        )

    old_corr0 = jnp.full((D,), 2.0, floatX())
    carry = (
        key, particles0, state.prior_logp, state.like_logp, old_corr0,
        jnp.zeros((N,), floatX()), jnp.zeros((), jnp.int32),
        jnp.ones((), bool),
    )
    (key, particles, prior_lp, like_lp, _, acc_sum, n, _) = lax.while_loop(
        cond, body, carry
    )
    nf = jnp.maximum(n, 1).astype(floatX())
    per_particle = acc_sum / nf
    return particles, prior_lp, like_lp, jnp.mean(per_particle), per_particle, n


class _MutationState(NamedTuple):
    """Internal carrier handed to _correlation_tuned_loop."""

    particles: jax.Array
    prior_logp: jax.Array
    like_logp: jax.Array
    corr_threshold: float


class MutationResult(NamedTuple):
    particles: jax.Array
    prior_logp: jax.Array
    like_logp: jax.Array
    acc_rate: jax.Array        # () mean acceptance
    chain_acc_rate: jax.Array  # (N,) per-particle acceptance
    n_steps: jax.Array         # () sweeps run
    proposal_scales: jax.Array  # (N,)


class IMH:
    """Independent Metropolis-Hastings from a fitted Gaussian
    (reference kernels.py:446). The number of IMH sweeps per stage is tuned
    by the Pearson decorrelation rule (kernels.py:486-525); pass
    ``n_steps=<int>`` to force a fixed sweep count instead."""

    name = "IMH"

    def __init__(self, n_steps=None, correlation_threshold=0.01,
                 max_steps=100):
        if not (0.0 <= correlation_threshold <= 1.0):
            raise ValueError("correlation_threshold must be in [0, 1]")
        self.n_steps = n_steps
        self.correlation_threshold = correlation_threshold
        self.max_steps = max_steps if n_steps is None else n_steps

    def mutate(self, key, state: SMCState, prior_like_fn, beta):
        particles = state.particles
        N, D = particles.shape
        mean, chol = _particle_cov_chol(particles)

        def logq(x):
            from jax.scipy.linalg import solve_triangular

            diff = x - mean  # (N, D)
            z = solve_triangular(chol, diff.T, lower=True).T
            return -0.5 * jnp.sum(z**2, axis=-1) - jnp.sum(
                jnp.log(jnp.diagonal(chol))
            )

        def tempered(prior_lp, like_lp):
            return prior_lp + beta * like_lp

        def one_sweep(k, particles, prior_lp, like_lp):
            k1, k2, k3 = jax.random.split(k, 3)
            eps = jax.random.normal(k1, (N, D), dtype=floatX())
            prop = mean + eps @ chol.T
            p_prior, p_like = prior_like_fn(prop, k3)
            # forward/backward proposal correction (kernels.py:500-509)
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
            return particles, prior_lp, like_lp, accept

        if self.n_steps is not None:
            # fixed sweep count: plain scan (no correlation stopping)
            def step(carry, k):
                particles, prior_lp, like_lp, acc_sum = carry
                particles, prior_lp, like_lp, accept = one_sweep(
                    k, particles, prior_lp, like_lp
                )
                return (
                    particles, prior_lp, like_lp,
                    acc_sum + accept.astype(floatX()),
                ), None

            keys = jax.random.split(key, self.n_steps)
            (particles, prior_lp, like_lp, acc_sum), _ = lax.scan(
                step,
                (particles, state.prior_logp, state.like_logp,
                 jnp.zeros((N,), floatX())),
                keys,
            )
            per_particle = acc_sum / self.n_steps
            return MutationResult(
                particles, prior_lp, like_lp, jnp.mean(per_particle),
                per_particle, jnp.asarray(self.n_steps, jnp.int32),
                state.proposal_scales,
            )

        loop_state = _MutationState(
            particles, state.prior_logp, state.like_logp,
            self.correlation_threshold,
        )
        p, plp, llp, acc, per_particle, n = _correlation_tuned_loop(
            key, loop_state, one_sweep, self.max_steps
        )
        return MutationResult(
            p, plp, llp, acc, per_particle, n, state.proposal_scales
        )


class MH:
    """Random-walk Metropolis with particle-covariance proposals and
    per-particle proposal scales (reference kernels.py:556). Scales start
    at min(1, 2.38^2/D) (:593), are resampled with the particles (:595-599),
    and each stage are rescaled toward 0.234 acceptance then interpolated
    with the population mean (:601-607). Sweep count is correlation-tuned
    (:617-647); pass ``n_steps=<int>`` for a fixed count."""

    name = "MH"

    def __init__(self, n_steps=None, correlation_threshold=0.01,
                 max_steps=100):
        if not (0.0 <= correlation_threshold <= 1.0):
            raise ValueError("correlation_threshold must be in [0, 1]")
        self.n_steps = n_steps
        self.correlation_threshold = correlation_threshold
        self.max_steps = max_steps if n_steps is None else n_steps

    def tune_scales(self, state: SMCState):
        """Reference MH.tune (kernels.py:601-607): rescale toward 0.234
        acceptance, interpolate individual and population scales. Only from
        the second stage on (iteration > 1)."""
        chain_scales = jnp.exp(
            jnp.log(state.proposal_scales) + (state.chain_acc_rate - 0.234)
        )
        tuned = 0.5 * (chain_scales + jnp.mean(chain_scales))
        return jnp.where(state.stage > 0, tuned, state.proposal_scales)

    def mutate(self, key, state: SMCState, prior_like_fn, beta):
        particles = state.particles
        N, D = particles.shape
        _, chol = _particle_cov_chol(particles)
        scales = state.proposal_scales

        def tempered(prior_lp, like_lp):
            return prior_lp + beta * like_lp

        def one_sweep(k, particles, prior_lp, like_lp):
            k1, k2, k3 = jax.random.split(k, 3)
            eps = jax.random.normal(k1, (N, D), dtype=floatX())
            prop = particles + scales[:, None] * (eps @ chol.T)
            p_prior, p_like = prior_like_fn(prop, k3)
            log_ratio = tempered(p_prior, p_like) - tempered(prior_lp, like_lp)
            accept = (
                jnp.log(jax.random.uniform(k2, (N,), dtype=floatX())) < log_ratio
            )
            particles = jnp.where(accept[:, None], prop, particles)
            prior_lp = jnp.where(accept, p_prior, prior_lp)
            like_lp = jnp.where(accept, p_like, like_lp)
            return particles, prior_lp, like_lp, accept

        if self.n_steps is not None:
            def step(carry, k):
                particles, prior_lp, like_lp, acc_sum = carry
                particles, prior_lp, like_lp, accept = one_sweep(
                    k, particles, prior_lp, like_lp
                )
                return (
                    particles, prior_lp, like_lp,
                    acc_sum + accept.astype(floatX()),
                ), None

            keys = jax.random.split(key, self.n_steps)
            (particles, prior_lp, like_lp, acc_sum), _ = lax.scan(
                step,
                (particles, state.prior_logp, state.like_logp,
                 jnp.zeros((N,), floatX())),
                keys,
            )
            per_particle = acc_sum / self.n_steps
            return MutationResult(
                particles, prior_lp, like_lp, jnp.mean(per_particle),
                per_particle, jnp.asarray(self.n_steps, jnp.int32), scales,
            )

        loop_state = _MutationState(
            particles, state.prior_logp, state.like_logp,
            self.correlation_threshold,
        )
        p, plp, llp, acc, per_particle, n = _correlation_tuned_loop(
            key, loop_state, one_sweep, self.max_steps
        )
        return MutationResult(p, plp, llp, acc, per_particle, n, scales)


def smc_stage(kernel, prior_like_fn, threshold=0.5):
    """Build one jittable SMC stage: reweight -> resample -> tune -> mutate
    (reference SMC_KERNEL.step, kernels.py:373-379)."""

    def stage(key, state: SMCState):
        done = state.beta >= 1.0
        k_res, k_mut = jax.random.split(key)
        beta_new = _find_beta(state.beta, state.like_logp, threshold)
        lw = (beta_new - state.beta) * state.like_logp
        N = lw.shape[0]
        log_marginal = state.log_marginal + logsumexp(lw) - jnp.log(float(N))
        # per-particle tuning state travels with the particles on resampling
        # (reference MH.resample, kernels.py:595-599)
        particles, prior_lp, like_lp, scales, chain_acc = _systematic_resample(
            k_res, lw,
            (state.particles, state.prior_logp, state.like_logp,
             state.proposal_scales, state.chain_acc_rate),
        )
        resampled = SMCState(
            particles=particles, prior_logp=prior_lp, like_logp=like_lp,
            beta=beta_new, log_marginal=log_marginal, stage=state.stage,
            acc_rate=state.acc_rate, proposal_scales=scales,
            chain_acc_rate=chain_acc, n_steps=state.n_steps,
        )
        if hasattr(kernel, "tune_scales"):
            resampled = resampled._replace(
                proposal_scales=kernel.tune_scales(resampled)
            )
        res = kernel.mutate(k_mut, resampled, prior_like_fn, beta_new)
        new_state = SMCState(
            particles=res.particles, prior_logp=res.prior_logp,
            like_logp=res.like_logp, beta=beta_new,
            log_marginal=log_marginal, stage=state.stage + 1,
            acc_rate=res.acc_rate, proposal_scales=res.proposal_scales,
            chain_acc_rate=res.chain_acc_rate, n_steps=res.n_steps,
        )
        # chains already at beta=1 pass through unchanged
        return jax.tree.map(
            lambda new, old: jnp.where(done, old, new), new_state, state
        )

    return stage
