"""ChEES-HMC: the TPU-native many-chain sampler.

Hoffman, Radul & Sountsov (2021), "An Adaptive MCMC Scheme for Setting
Trajectory Lengths in Hamiltonian Monte Carlo" (the ChEES criterion; see also
PAPERS.md ChEES-SMC). Vectorized NUTS pays a straggler tax: a vmapped
while_loop runs every chain until the DEEPEST tree finishes, so wall-clock
per draw is max-over-chains tree size (measured ~16x the raw grad-eval cost
on the radon GLM at 1024 chains). ChEES-HMC removes the tax:

- every chain runs the SAME number of leapfrog steps per draw (one shared
  halton-jittered trajectory length) -> perfectly uniform device work, a
  plain lax.scan, no tree bookkeeping or checkpoint stacks;
- the trajectory length T adapts by Adam on the ChEES criterion gradient,
  which is estimated ACROSS chains — more chains = better adaptation (the
  cross-chain pooling of SURVEY §7.4);
- step size adapts by dual averaging on the mean acceptance, mass matrix by
  pooled Welford — identical machinery to the NUTS path.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import floatX

__all__ = ["CheesState", "chees_init", "chees_step", "halton_sequence"]


def halton_sequence(n, base=2):
    """First n halton numbers (numpy, precomputed host-side)."""
    out = np.zeros(n)
    for i in range(n):
        f, r = 1.0, 0.0
        idx = i + 1
        while idx > 0:
            f /= base
            r += f * (idx % base)
            idx //= base
        out[i] = r
    return out


class CheesState(NamedTuple):
    q: jax.Array          # (C, D)
    logp: jax.Array       # (C,)
    grad: jax.Array       # (C, D)
    log_T: jax.Array      # () trajectory length (time units), Adam-adapted
    adam_m: jax.Array     # () Adam first moment
    adam_v: jax.Array     # () Adam second moment
    adam_t: jax.Array     # () Adam step counter


def chees_init(q, logp, grad, initial_T=1.0):
    dt = q.dtype
    return CheesState(
        q=q, logp=logp, grad=grad,
        log_T=jnp.asarray(np.log(initial_T), dt),
        adam_m=jnp.zeros((), dt),
        adam_v=jnp.zeros((), dt),
        adam_t=jnp.zeros((), dt),
    )


def chees_step(
    logp_grad_fn, key, state: CheesState, step_size, inv_mass_diag, halton_u,
    *, adapt_T, max_leapfrogs=1024, adam_lr=0.025, full_mass=None,
):
    """One jittered-HMC draw for ALL chains + ChEES trajectory adaptation.

    step_size: (C,) per-chain; inv_mass_diag: (C, D) per-chain diag or
    (D, D) shared full Sigma (the NUTS convention, nuts.py:575-612; set
    full_mass explicitly if C == D); halton_u: scalar in (0,1] shared by all
    chains this draw (the jitter). With full mass the leapfrog velocity is
    one (C, D) @ (D, D) MXU matmul per step.
    """
    C, D = state.q.shape
    dt = state.q.dtype
    k_mom, k_acc = jax.random.split(key)
    if full_mass is None:
        full_mass = inv_mass_diag.shape != state.q.shape
    full = bool(full_mass)

    eps = step_size  # (C,)
    T_jit = jnp.exp(state.log_T) * halton_u
    # uniform number of leapfrog steps across chains (mean step size governs)
    mean_eps = jnp.mean(eps)
    L = jnp.clip(
        jnp.asarray(jnp.ceil(T_jit / jnp.maximum(mean_eps, 1e-10)), jnp.int32),
        1, max_leapfrogs,
    )

    xi = jax.random.normal(k_mom, (C, D), dtype=dt)
    if full:
        # p ~ N(0, Sigma^{-1}) via p = L^{-T} xi with Lc = chol(Sigma)
        from jax.scipy.linalg import solve_triangular

        Lc = jnp.linalg.cholesky(inv_mass_diag)
        p0 = solve_triangular(Lc.T, xi.T, lower=False).T

        def kinetic(p):
            return 0.5 * jnp.sum(p * (p @ inv_mass_diag), axis=-1)
    else:
        p0 = xi / jnp.sqrt(inv_mass_diag)

        def kinetic(p):
            return 0.5 * jnp.sum(p * inv_mass_diag * p, axis=-1)

    h0 = -state.logp + kinetic(p0)

    # while_loop with a SHARED traced trip count L: every chain does exactly
    # L leapfrogs — uniform device work, no straggler, no masking
    from ..ops.pallas_kernels import leapfrog_final_kick, leapfrog_kick_drift

    def cond(carry):
        return carry[-1] < L

    def leap(carry):
        q, p, grad, logp, i = carry
        if full:
            p_half = p + 0.5 * eps[:, None] * grad
            q_new = q + eps[:, None] * (p_half @ inv_mass_diag)
        else:
            q_new, p_half = leapfrog_kick_drift(q, p, grad, inv_mass_diag, eps)
        logp_new, grad_new = jax.vmap(logp_grad_fn)(q_new)
        p_new = p_half + 0.5 * eps[:, None] * grad_new
        # freeze non-finite lanes (diverged) where they are
        ok = jnp.isfinite(logp_new)
        q = jnp.where(ok[:, None], q_new, q)
        p = jnp.where(ok[:, None], p_new, p)
        grad = jnp.where(ok[:, None], grad_new, grad)
        logp = jnp.where(ok, logp_new, -jnp.inf)
        return (q, p, grad, logp, i + 1)

    q1, p1, grad1, logp1, _ = lax.while_loop(
        cond, leap,
        (state.q, p0, state.grad, state.logp, jnp.zeros((), jnp.int32)),
    )
    h1 = -logp1 + kinetic(p1)
    log_accept = jnp.minimum(0.0, h0 - h1)
    log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
    accept_prob = jnp.exp(log_accept)
    u = jax.random.uniform(k_acc, (C,), dtype=dt)
    accept = jnp.log(u) < log_accept

    q_out = jnp.where(accept[:, None], q1, state.q)
    logp_out = jnp.where(accept, logp1, state.logp)
    grad_out = jnp.where(accept[:, None], grad1, state.grad)

    # ---- ChEES gradient (Hoffman et al. 2021 eq. 8, cross-chain estimate):
    # criterion = E[ (||q' - mean(q')||^2 - ||q - mean(q)||^2)^2 ] / 4
    # d/dT  ~ E[ w * delta * ((q' - mean(q')) . p') ]
    qc0 = state.q - jnp.mean(state.q, axis=0, keepdims=True)
    qc1 = q1 - jnp.mean(q1, axis=0, keepdims=True)
    delta = jnp.sum(qc1**2, axis=-1) - jnp.sum(qc0**2, axis=-1)
    proj = jnp.sum(qc1 * p1, axis=-1)
    w = accept_prob / jnp.maximum(jnp.sum(accept_prob), 1e-10)
    chees_grad = jnp.sum(w * delta * proj) * halton_u
    chees_grad = jnp.clip(
        jnp.where(jnp.isfinite(chees_grad), chees_grad, 0.0), -1e6, 1e6
    )

    t = state.adam_t + 1.0
    m = 0.9 * state.adam_m + 0.1 * chees_grad
    v = 0.999 * state.adam_v + 0.001 * chees_grad**2
    mhat = m / (1.0 - 0.9**t)
    vhat = v / (1.0 - 0.999**t)
    log_T_new = state.log_T + adam_lr * mhat / (jnp.sqrt(vhat) + 1e-8)
    # keep T within sane bounds relative to step size
    log_T_new = jnp.clip(
        log_T_new,
        jnp.log(mean_eps), jnp.log(mean_eps * max_leapfrogs),
    )
    log_T = jnp.where(adapt_T, log_T_new, state.log_T)

    new_state = CheesState(
        q=q_out, logp=logp_out, grad=grad_out,
        log_T=log_T, adam_m=jnp.where(adapt_T, m, state.adam_m),
        adam_v=jnp.where(adapt_T, v, state.adam_v),
        adam_t=jnp.where(adapt_T, t, state.adam_t),
    )
    stats = {
        "acceptance_rate": accept_prob,
        "accepted": accept,
        "lp": logp_out,
        "energy": jnp.where(accept, h1, h0),
        "n_steps": jnp.broadcast_to(L, (C,)),
        "trajectory_length": jnp.broadcast_to(jnp.exp(log_T), (C,)),
        "diverging": ~jnp.isfinite(h1),
    }
    return new_state, stats
