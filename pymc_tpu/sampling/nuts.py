"""On-device iterative NUTS kernel.

Parity: reference pymc/step_methods/hmc/nuts.py (tree doubling to
max_treedepth:204-225, multinomial sampling via logaddexp log_size:270-476,
generalized U-turn criterion, divergence at dH > Emax=1000:419-440) and
hmc/integration.py:41-145 (leapfrog).

TPU-native redesign (SURVEY.md §7 "hard parts" #1): the reference's recursive
`_Tree._build_subtree` + per-step compiled-fn calls become ONE fused XLA
program — an iterative tree doubling in `lax.while_loop` with an
O(max_treedepth) checkpoint stack for within-subtree U-turn checks (the
popcount trick), vmapped over chains. One leapfrog = one fused logp+grad
evaluation; the whole draw never leaves the device.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["NutsStats", "nuts_transition", "nuts_transition_batched"]


class NutsStats(NamedTuple):
    depth: jax.Array
    n_steps: jax.Array
    diverging: jax.Array
    energy: jax.Array
    energy_error: jax.Array
    max_energy_error: jax.Array
    acceptance_rate: jax.Array
    lp: jax.Array


class _SubtreeState(NamedTuple):
    n: jax.Array                # leaves built so far
    q: jax.Array                # current (last) leaf
    p: jax.Array
    grad: jax.Array
    logp: jax.Array
    prop_q: jax.Array           # progressive multinomial proposal
    prop_p: jax.Array
    prop_grad: jax.Array
    prop_logp: jax.Array
    prop_energy: jax.Array
    log_size: jax.Array
    sum_accept: jax.Array
    max_eerr: jax.Array         # signed max |energy error|
    p_sum: jax.Array            # momentum sum over subtree leaves
    p_ckpt: jax.Array           # (max_depth+1, D) checkpointed momenta
    psum_ckpt: jax.Array        # (max_depth+1, D) exclusive prefix sums
    turning: jax.Array
    diverging: jax.Array


class _TrajState(NamedTuple):
    depth: jax.Array
    q_left: jax.Array
    p_left: jax.Array
    grad_left: jax.Array
    logp_left: jax.Array
    q_right: jax.Array
    p_right: jax.Array
    grad_right: jax.Array
    logp_right: jax.Array
    p_sum: jax.Array
    prop_q: jax.Array
    prop_p: jax.Array
    prop_grad: jax.Array
    prop_logp: jax.Array
    prop_energy: jax.Array
    log_size: jax.Array
    sum_accept: jax.Array
    n_leaves: jax.Array
    max_eerr: jax.Array
    turning: jax.Array
    diverging: jax.Array


def _vel(inv_mass, p):
    """Velocity M^{-1} p — elementwise for a diagonal mass (inv_mass (D,)),
    one MXU matvec for a full mass (inv_mass = Sigma, (D, D))."""
    if inv_mass.ndim == 2:
        return inv_mass @ p
    return inv_mass * p


def _kinetic(p, inv_mass):
    return 0.5 * jnp.dot(p, _vel(inv_mass, p))


def _leapfrog(logp_grad_fn, q, p, grad, eps, inv_mass):
    p_half = p + 0.5 * eps * grad
    q_new = q + eps * _vel(inv_mass, p_half)
    logp_new, grad_new = logp_grad_fn(q_new)
    p_new = p_half + 0.5 * eps * grad_new
    return q_new, p_new, grad_new, logp_new


def _is_turning(v_first, v_last, rho):
    return jnp.logical_or(
        jnp.dot(v_first, rho) <= 0.0, jnp.dot(v_last, rho) <= 0.0
    )


def _popcount(x):
    return lax.population_count(x.astype(jnp.uint32)).astype(jnp.int32)


def _build_subtree(
    logp_grad_fn, key, depth, q0, p0, grad0, logp0, eps_signed,
    inv_mass_diag, h0, max_treedepth, max_energy_error,
):
    """Build 2**depth leapfrog leaves starting one step after (q0, p0).

    Iterative within-subtree U-turn checks use the classic checkpoint scheme:
    leaf i (0-based) is stored at stack slot popcount(i) when i is even; when
    i is odd, the completed subtrees ending at i (sizes 2^j for
    j <= trailing_ones(i)) are checked against slots
    popcount(i)-trailing_ones(i) .. popcount(i)-1.
    """
    D = q0.shape[0]
    dtype = q0.dtype
    n_target = jnp.left_shift(jnp.asarray(1, jnp.int32), depth)
    neg_inf = jnp.asarray(-jnp.inf, dtype)

    init = _SubtreeState(
        n=jnp.zeros((), jnp.int32),
        q=q0, p=p0, grad=grad0, logp=logp0,
        prop_q=q0, prop_p=p0, prop_grad=grad0, prop_logp=logp0,
        prop_energy=h0,
        log_size=neg_inf,
        sum_accept=jnp.zeros((), dtype),
        max_eerr=jnp.zeros((), dtype),
        p_sum=jnp.zeros((D,), dtype),
        p_ckpt=jnp.zeros((max_treedepth + 1, D), dtype),
        psum_ckpt=jnp.zeros((max_treedepth + 1, D), dtype),
        turning=jnp.zeros((), jnp.bool_),
        diverging=jnp.zeros((), jnp.bool_),
    )

    def cond(s: _SubtreeState):
        return jnp.logical_and(
            s.n < n_target, jnp.logical_not(jnp.logical_or(s.turning, s.diverging))
        )

    def body(s: _SubtreeState):
        q, p, grad, logp = _leapfrog(
            logp_grad_fn, s.q, s.p, s.grad, eps_signed, inv_mass_diag
        )
        energy = -logp + _kinetic(p, inv_mass_diag)
        eerr = energy - h0  # positive = worse
        eerr_ok = jnp.isfinite(eerr)
        diverging = jnp.logical_or(~eerr_ok, eerr > max_energy_error)
        eerr_safe = jnp.where(eerr_ok, eerr, jnp.asarray(jnp.inf, dtype))

        log_w = -eerr_safe
        log_size_new = jnp.logaddexp(s.log_size, log_w)
        accept_prob = jnp.exp(jnp.minimum(log_w, 0.0))
        u = jax.random.uniform(jax.random.fold_in(key, s.n), dtype=dtype)
        take = jnp.logical_and(~diverging, jnp.log(u) < log_w - log_size_new)

        prop_q = jnp.where(take, q, s.prop_q)
        prop_p = jnp.where(take, p, s.prop_p)
        prop_grad = jnp.where(take, grad, s.prop_grad)
        prop_logp = jnp.where(take, logp, s.prop_logp)
        prop_energy = jnp.where(take, energy, s.prop_energy)

        n = s.n
        is_even = (n & 1) == 0
        slot = _popcount(n)
        # store checkpoints for even leaves (exclusive prefix + leaf momentum)
        p_ckpt = jnp.where(
            is_even, s.p_ckpt.at[slot].set(p), s.p_ckpt
        )
        psum_ckpt = jnp.where(
            is_even, s.psum_ckpt.at[slot].set(s.p_sum), s.psum_ckpt
        )
        p_sum = s.p_sum + p

        # U-turn checks for completed subtrees ending at odd leaf n —
        # vectorized over all checkpoint slots in one batched reduction
        # (avoids a sequential fori_loop of tiny latency-bound dots)
        t_ones = _popcount(n ^ (n + 1)) - 1  # trailing ones of n
        c_hi = _popcount(n) - 1
        c_lo = _popcount(n) - t_ones
        v_leaf = _vel(inv_mass_diag, p)
        slots = jnp.arange(max_treedepth + 1, dtype=jnp.int32)
        active = (slots >= c_lo) & (slots <= c_hi)
        rho_all = p_sum[None, :] - psum_ckpt  # (S, D)
        v_starts = (
            p_ckpt @ inv_mass_diag.T if inv_mass_diag.ndim == 2
            else inv_mass_diag[None, :] * p_ckpt
        )
        dot_start = jnp.sum(v_starts * rho_all, axis=-1)
        dot_leaf = rho_all @ v_leaf
        any_turn = jnp.any(
            active & ((dot_start <= 0.0) | (dot_leaf <= 0.0))
        )
        turning = jnp.where(
            jnp.logical_and(~is_even, ~diverging),
            jnp.logical_or(s.turning, any_turn),
            s.turning,
        )

        abs_bigger = jnp.abs(eerr_safe) > jnp.abs(s.max_eerr)
        max_eerr = jnp.where(abs_bigger, eerr_safe, s.max_eerr)

        return _SubtreeState(
            n=n + 1,
            q=q, p=p, grad=grad, logp=logp,
            prop_q=prop_q, prop_p=prop_p, prop_grad=prop_grad,
            prop_logp=prop_logp, prop_energy=prop_energy,
            log_size=jnp.where(diverging, s.log_size, log_size_new),
            sum_accept=s.sum_accept + accept_prob,
            max_eerr=max_eerr,
            p_sum=jnp.where(diverging, s.p_sum, p_sum),
            p_ckpt=p_ckpt,
            psum_ckpt=psum_ckpt,
            turning=turning,
            diverging=diverging,
        )

    out = lax.while_loop(cond, body, init)
    # first-leaf momentum lives at checkpoint slot 0 (leaf 0 is even)
    return out, out.p_ckpt[0]


def nuts_transition(
    logp_grad_fn,
    key,
    q,
    logp,
    grad,
    step_size,
    inv_mass_diag,
    *,
    max_treedepth=10,
    max_energy_error=1000.0,
):
    """One NUTS draw for a single chain: (q, logp, grad) -> new state + stats.

    Pure function; vmap over chains, jit once. Reference semantics:
    nuts.py:204-225 doubling loop + biased progressive sampling of the new
    subtree (Betancourt 2016), divergence at dH > 1000.
    """
    dtype = q.dtype
    D = q.shape[0]
    k_mom, k_dir, k_tree, k_acc = jax.random.split(key, 4)

    xi = jax.random.normal(k_mom, (D,), dtype=dtype)
    if inv_mass_diag.ndim == 2:
        # full mass: p ~ N(0, Sigma^{-1}) via p = L^{-T} xi with L = chol(Sigma)
        from jax.scipy.linalg import solve_triangular

        L = jnp.linalg.cholesky(inv_mass_diag)
        p0 = solve_triangular(L.T, xi, lower=False)
    else:
        p0 = xi / jnp.sqrt(inv_mass_diag)
    h0 = -logp + _kinetic(p0, inv_mass_diag)

    init = _TrajState(
        depth=jnp.zeros((), jnp.int32),
        q_left=q, p_left=p0, grad_left=grad, logp_left=logp,
        q_right=q, p_right=p0, grad_right=grad, logp_right=logp,
        p_sum=p0,
        prop_q=q, prop_p=p0, prop_grad=grad, prop_logp=logp,
        prop_energy=h0,
        log_size=jnp.zeros((), dtype),
        sum_accept=jnp.zeros((), dtype),
        n_leaves=jnp.zeros((), jnp.int32),
        max_eerr=jnp.zeros((), dtype),
        turning=jnp.zeros((), jnp.bool_),
        diverging=jnp.zeros((), jnp.bool_),
    )

    def cond(s: _TrajState):
        return jnp.logical_and(
            s.depth < max_treedepth,
            jnp.logical_not(jnp.logical_or(s.turning, s.diverging)),
        )

    def body(s: _TrajState):
        go_right = jax.random.bernoulli(jax.random.fold_in(k_dir, s.depth))
        eps_signed = jnp.where(go_right, step_size, -step_size)
        q_start = jnp.where(go_right, s.q_right, s.q_left)
        p_start = jnp.where(go_right, s.p_right, s.p_left)
        grad_start = jnp.where(go_right, s.grad_right, s.grad_left)
        logp_start = jnp.where(go_right, s.logp_right, s.logp_left)

        sub, p_first = _build_subtree(
            logp_grad_fn,
            jax.random.fold_in(k_tree, s.depth),
            s.depth,
            q_start, p_start, grad_start, logp_start,
            eps_signed, inv_mass_diag, h0, max_treedepth, max_energy_error,
        )

        incomplete = jnp.logical_or(sub.turning, sub.diverging)

        # biased progressive sampling: accept the new subtree's proposal with
        # prob min(1, size_new/size_old)  (reference nuts.py multinomial accept)
        u = jax.random.uniform(jax.random.fold_in(k_acc, s.depth), dtype=dtype)
        take_new = jnp.logical_and(
            ~incomplete, jnp.log(u) < sub.log_size - s.log_size
        )
        prop_q = jnp.where(take_new, sub.prop_q, s.prop_q)
        prop_p = jnp.where(take_new, sub.prop_p, s.prop_p)
        prop_grad = jnp.where(take_new, sub.prop_grad, s.prop_grad)
        prop_logp = jnp.where(take_new, sub.prop_logp, s.prop_logp)
        prop_energy = jnp.where(take_new, sub.prop_energy, s.prop_energy)

        # merge trajectory ends (only when subtree completed)
        def upd(new, old):
            return jnp.where(jnp.logical_and(~incomplete, go_right), new, old)

        def upd_l(new, old):
            return jnp.where(jnp.logical_and(~incomplete, ~go_right), new, old)

        q_right = upd(sub.q, s.q_right)
        p_right = upd(sub.p, s.p_right)
        grad_right = upd(sub.grad, s.grad_right)
        logp_right = upd(sub.logp, s.logp_right)
        q_left = upd_l(sub.q, s.q_left)
        p_left = upd_l(sub.p, s.p_left)
        grad_left = upd_l(sub.grad, s.grad_left)
        logp_left = upd_l(sub.logp, s.logp_left)

        p_sum = jnp.where(incomplete, s.p_sum, s.p_sum + sub.p_sum)

        # full-trajectory U-turn check (generalized criterion) + the
        # cross-subtree checks with boundary momenta (reference
        # nuts.py:454-463 additional checks)
        v_left = _vel(inv_mass_diag, p_left)
        v_right = _vel(inv_mass_diag, p_right)
        turn_main = _is_turning(v_left, v_right, p_sum)
        # boundary-crossing checks: old trajectory + first leaf of subtree /
        # subtree + adjacent old boundary
        v_first = _vel(inv_mass_diag, p_first)
        v_last = _vel(inv_mass_diag, sub.p)
        turn_x1 = _is_turning(
            jnp.where(go_right, v_left, v_last),
            jnp.where(go_right, v_first, v_right),
            jnp.where(go_right, s.p_sum + p_first, sub.p_sum + s.p_sum),
        )
        turning = jnp.logical_and(
            ~incomplete, jnp.logical_or(turn_main, turn_x1)
        )

        return _TrajState(
            depth=s.depth + 1,
            q_left=q_left, p_left=p_left, grad_left=grad_left, logp_left=logp_left,
            q_right=q_right, p_right=p_right, grad_right=grad_right,
            logp_right=logp_right,
            p_sum=p_sum,
            prop_q=prop_q, prop_p=prop_p, prop_grad=prop_grad,
            prop_logp=prop_logp, prop_energy=prop_energy,
            log_size=jnp.where(incomplete, s.log_size,
                               jnp.logaddexp(s.log_size, sub.log_size)),
            sum_accept=s.sum_accept + sub.sum_accept,
            n_leaves=s.n_leaves + sub.n,
            max_eerr=jnp.where(
                jnp.abs(sub.max_eerr) > jnp.abs(s.max_eerr),
                sub.max_eerr, s.max_eerr,
            ),
            turning=jnp.logical_or(turning, sub.turning),
            diverging=sub.diverging,
        )

    out = lax.while_loop(cond, body, init)

    n = jnp.maximum(out.n_leaves, 1)
    stats = NutsStats(
        depth=out.depth,
        n_steps=out.n_leaves,
        diverging=out.diverging,
        energy=out.prop_energy,
        energy_error=out.prop_energy - h0,
        max_energy_error=out.max_eerr,
        acceptance_rate=out.sum_accept / n.astype(dtype),
        lp=out.prop_logp,
    )
    return (out.prop_q, out.prop_logp, out.prop_grad), stats


# =====================================================================
# Batched NUTS: the chain axis is explicit (C, D) instead of vmapped.
#
# Same tree semantics as nuts_transition (finished chains are masked, the
# whole batch advances in lock-step — exactly what vmap-of-while lowers to),
# but with the chain axis visible the leapfrog bandwidth chain runs through
# the fused Pallas TPU kernels (ops/pallas_kernels.py), the full-mass
# velocity is one (C, D) @ (D, D) MXU matmul, and chain-axis sharding needs
# no vmap-of-collective tricks. This is the role the reference delegates to
# nutpie/nuts-rs (pymc/sampling/mcmc.py:945-971): the native hot path.
# =====================================================================


def _w(mask, new, old):
    """Masked update: where(mask, new, old) with mask (C,) broadcast over
    the trailing dims of new/old."""
    return jnp.where(
        jnp.reshape(mask, mask.shape + (1,) * (jnp.ndim(new) - 1)), new, old
    )


def _vel_b(inv_mass, p, full):
    """Batched velocity: p (C, D); diag inv_mass (C, D) or full Sigma (D, D)
    (symmetric, shared across chains) -> one MXU matmul."""
    if full:
        return p @ inv_mass
    return inv_mass * p


def _kinetic_b(p, inv_mass, full):
    return 0.5 * jnp.sum(p * _vel_b(inv_mass, p, full), axis=-1)


def _leapfrog_b(logp_grad_b, q, p, grad, eps, inv_mass, full, use_pallas):
    """One batched leapfrog over (C, D); returns (q, p, grad, logp, kinetic).

    Diag path: fused Pallas half-kick+drift and final-kick+kinetic kernels
    (ops/pallas_kernels.py; jnp fallback off-TPU/unaligned)."""
    if full or not use_pallas:
        p_half = p + 0.5 * eps[:, None] * grad
        q_new = q + eps[:, None] * _vel_b(inv_mass, p_half, full)
        logp_new, grad_new = logp_grad_b(q_new)
        p_new = p_half + 0.5 * eps[:, None] * grad_new
        ke = _kinetic_b(p_new, inv_mass, full)
        return q_new, p_new, grad_new, logp_new, ke
    from ..ops.pallas_kernels import leapfrog_final_kick, leapfrog_kick_drift

    q_new, p_half = leapfrog_kick_drift(q, p, grad, inv_mass, eps)
    logp_new, grad_new = logp_grad_b(q_new)
    p_new, ke = leapfrog_final_kick(p_half, grad_new, inv_mass, eps)
    return q_new, p_new, grad_new, logp_new, ke


def _uniform_b(keys, counters, dtype):
    """Per-chain uniforms at per-chain fold counters (matches the scalar
    kernel's fold_in(key, n) stream chain by chain)."""
    return jax.vmap(
        lambda k, c: jax.random.uniform(jax.random.fold_in(k, c), dtype=dtype)
    )(keys, counters)


def _build_subtree_b(
    logp_grad_b, keys, depth, active0, q0, p0, grad0, logp0, eps_signed,
    inv_mass, h0, max_treedepth, max_energy_error, full, use_pallas,
):
    """Batched subtree builder: 2**depth leaves per active chain, chains that
    turn/diverge (or were inactive) are masked. All leaves carry a leading
    chain axis; the checkpoint stacks are (C, S, D)."""
    C, D = q0.shape
    dtype = q0.dtype
    S = max_treedepth + 1
    n_target = jnp.left_shift(jnp.ones((), jnp.int32), depth)  # (C,)
    neg_inf = jnp.full((C,), -jnp.inf, dtype)

    init = _SubtreeState(
        n=jnp.zeros((C,), jnp.int32),
        q=q0, p=p0, grad=grad0, logp=logp0,
        prop_q=q0, prop_p=p0, prop_grad=grad0, prop_logp=logp0,
        prop_energy=h0,
        log_size=neg_inf,
        sum_accept=jnp.zeros((C,), dtype),
        max_eerr=jnp.zeros((C,), dtype),
        p_sum=jnp.zeros((C, D), dtype),
        p_ckpt=jnp.zeros((C, S, D), dtype),
        psum_ckpt=jnp.zeros((C, S, D), dtype),
        turning=jnp.zeros((C,), jnp.bool_),
        diverging=jnp.zeros((C,), jnp.bool_),
    )

    def stepping(s: _SubtreeState):
        return active0 & (s.n < n_target) & ~s.turning & ~s.diverging

    def cond(s: _SubtreeState):
        return jnp.any(stepping(s))

    def body(s: _SubtreeState):
        act = stepping(s)
        q, p, grad, logp, ke = _leapfrog_b(
            logp_grad_b, s.q, s.p, s.grad, eps_signed, inv_mass, full,
            use_pallas,
        )
        energy = -logp + ke
        eerr = energy - h0
        eerr_ok = jnp.isfinite(eerr)
        diverging = act & (~eerr_ok | (eerr > max_energy_error))
        eerr_safe = jnp.where(eerr_ok, eerr, jnp.asarray(jnp.inf, dtype))

        log_w = -eerr_safe
        log_size_new = jnp.logaddexp(s.log_size, log_w)
        accept_prob = jnp.exp(jnp.minimum(log_w, 0.0))
        u = _uniform_b(keys, s.n, dtype)
        take = act & ~diverging & (jnp.log(u) < log_w - log_size_new)

        prop_q = _w(take, q, s.prop_q)
        prop_p = _w(take, p, s.prop_p)
        prop_grad = _w(take, grad, s.prop_grad)
        prop_logp = _w(take, logp, s.prop_logp)
        prop_energy = _w(take, energy, s.prop_energy)

        n = s.n
        is_even = (n & 1) == 0
        slot = _popcount(n)  # (C,)
        slots = jnp.arange(S, dtype=jnp.int32)
        sel = (slots[None, :] == slot[:, None]) & (is_even & act)[:, None]
        p_ckpt = jnp.where(sel[..., None], p[:, None, :], s.p_ckpt)
        psum_ckpt = jnp.where(sel[..., None], s.p_sum[:, None, :], s.psum_ckpt)
        p_sum = _w(act & ~diverging, s.p_sum + p, s.p_sum)

        # U-turn checks for completed subtrees ending at odd leaves,
        # vectorized over chains AND checkpoint slots
        t_ones = _popcount(n ^ (n + 1)) - 1
        c_hi = _popcount(n) - 1
        c_lo = _popcount(n) - t_ones
        v_leaf = _vel_b(inv_mass, p, full)  # (C, D)
        slot_active = (slots[None, :] >= c_lo[:, None]) & (
            slots[None, :] <= c_hi[:, None]
        )
        rho_all = p_sum[:, None, :] - psum_ckpt  # (C, S, D)
        if full:
            v_starts = p_ckpt @ inv_mass  # (C, S, D) x (D, D)
        else:
            v_starts = inv_mass[:, None, :] * p_ckpt
        dot_start = jnp.sum(v_starts * rho_all, axis=-1)  # (C, S)
        dot_leaf = jnp.sum(rho_all * v_leaf[:, None, :], axis=-1)
        any_turn = jnp.any(
            slot_active & ((dot_start <= 0.0) | (dot_leaf <= 0.0)), axis=-1
        )
        turning = jnp.where(
            act & ~is_even & ~diverging, s.turning | any_turn, s.turning
        )

        abs_bigger = jnp.abs(eerr_safe) > jnp.abs(s.max_eerr)
        max_eerr = jnp.where(act & abs_bigger, eerr_safe, s.max_eerr)

        return _SubtreeState(
            n=jnp.where(act, n + 1, n),
            q=_w(act, q, s.q), p=_w(act, p, s.p),
            grad=_w(act, grad, s.grad), logp=jnp.where(act, logp, s.logp),
            prop_q=prop_q, prop_p=prop_p, prop_grad=prop_grad,
            prop_logp=prop_logp, prop_energy=prop_energy,
            log_size=jnp.where(act & ~diverging, log_size_new, s.log_size),
            sum_accept=jnp.where(act, s.sum_accept + accept_prob, s.sum_accept),
            max_eerr=max_eerr,
            p_sum=p_sum,
            p_ckpt=p_ckpt,
            psum_ckpt=psum_ckpt,
            turning=turning,
            diverging=jnp.where(act, diverging, s.diverging),
        )

    out = lax.while_loop(cond, body, init)
    return out, out.p_ckpt[:, 0]


def nuts_transition_batched(
    logp_grad_fn,
    keys,
    q,
    logp,
    grad,
    step_size,
    inv_mass,
    *,
    max_treedepth=10,
    max_energy_error=1000.0,
    full_mass=None,
    use_pallas=False,
):
    """One NUTS draw for ALL chains: (q (C,D), logp (C,), grad (C,D)) -> new
    batched state + batched NutsStats.

    keys: (C,) per-chain PRNG keys. inv_mass: (C, D) per-chain diagonal, or
    (D, D) shared full Sigma (set full_mass explicitly if C == D). The
    semantics match jax.vmap(nuts_transition) — lock-step doubling with
    finished chains masked — but the explicit chain axis makes full-mass
    velocities one MXU matmul and chain sharding/collectives direct.

    use_pallas routes the leapfrog through the fused Pallas kernels
    (ops/pallas_kernels.py). Default OFF: the measured A/B on TPU v5e
    (benchmarks/pallas_ab.py, BENCHMARKS.md) shows XLA's own fusion of this
    bandwidth chain is FASTER (pallas 0.53x at D=256, 0.92x at D=4096) —
    the pallas_call boundary breaks fusion with the adjacent tree ops.
    """
    C, D = q.shape
    dtype = q.dtype
    if full_mass is None:
        full_mass = inv_mass.shape != q.shape
    full = bool(full_mass)

    logp_grad_b = jax.vmap(logp_grad_fn)

    ks = jax.vmap(lambda k: jax.random.split(k, 4))(keys)  # (C, 4, 2)
    k_mom, k_dir, k_tree, k_acc = (ks[:, i] for i in range(4))

    xi = jax.vmap(lambda k: jax.random.normal(k, (D,), dtype=dtype))(k_mom)
    if full:
        from jax.scipy.linalg import solve_triangular

        L = jnp.linalg.cholesky(inv_mass)
        p0 = solve_triangular(L.T, xi.T, lower=False).T
    else:
        p0 = xi / jnp.sqrt(inv_mass)
    h0 = -logp + _kinetic_b(p0, inv_mass, full)

    init = _TrajState(
        depth=jnp.zeros((C,), jnp.int32),
        q_left=q, p_left=p0, grad_left=grad, logp_left=logp,
        q_right=q, p_right=p0, grad_right=grad, logp_right=logp,
        p_sum=p0,
        prop_q=q, prop_p=p0, prop_grad=grad, prop_logp=logp,
        prop_energy=h0,
        log_size=jnp.zeros((C,), dtype),
        sum_accept=jnp.zeros((C,), dtype),
        n_leaves=jnp.zeros((C,), jnp.int32),
        max_eerr=jnp.zeros((C,), dtype),
        turning=jnp.zeros((C,), jnp.bool_),
        diverging=jnp.zeros((C,), jnp.bool_),
    )

    def chain_active(s: _TrajState):
        return (s.depth < max_treedepth) & ~s.turning & ~s.diverging

    def cond(s: _TrajState):
        return jnp.any(chain_active(s))

    def body(s: _TrajState):
        act = chain_active(s)
        go_right = jax.vmap(
            lambda k, d: jax.random.bernoulli(jax.random.fold_in(k, d))
        )(k_dir, s.depth)
        eps_signed = jnp.where(go_right, step_size, -step_size)
        q_start = _w(go_right, s.q_right, s.q_left)
        p_start = _w(go_right, s.p_right, s.p_left)
        grad_start = _w(go_right, s.grad_right, s.grad_left)
        logp_start = jnp.where(go_right, s.logp_right, s.logp_left)

        tree_keys = jax.vmap(jax.random.fold_in)(k_tree, s.depth)
        sub, p_first = _build_subtree_b(
            logp_grad_b, tree_keys, s.depth, act,
            q_start, p_start, grad_start, logp_start,
            eps_signed, inv_mass, h0, max_treedepth, max_energy_error,
            full, use_pallas,
        )

        incomplete = sub.turning | sub.diverging

        u = jax.vmap(
            lambda k, d: jax.random.uniform(jax.random.fold_in(k, d), dtype=dtype)
        )(k_acc, s.depth)
        take_new = act & ~incomplete & (jnp.log(u) < sub.log_size - s.log_size)
        prop_q = _w(take_new, sub.prop_q, s.prop_q)
        prop_p = _w(take_new, sub.prop_p, s.prop_p)
        prop_grad = _w(take_new, sub.prop_grad, s.prop_grad)
        prop_logp = jnp.where(take_new, sub.prop_logp, s.prop_logp)
        prop_energy = jnp.where(take_new, sub.prop_energy, s.prop_energy)

        ok = act & ~incomplete
        q_right = _w(ok & go_right, sub.q, s.q_right)
        p_right = _w(ok & go_right, sub.p, s.p_right)
        grad_right = _w(ok & go_right, sub.grad, s.grad_right)
        logp_right = jnp.where(ok & go_right, sub.logp, s.logp_right)
        q_left = _w(ok & ~go_right, sub.q, s.q_left)
        p_left = _w(ok & ~go_right, sub.p, s.p_left)
        grad_left = _w(ok & ~go_right, sub.grad, s.grad_left)
        logp_left = jnp.where(ok & ~go_right, sub.logp, s.logp_left)

        p_sum = _w(ok, s.p_sum + sub.p_sum, s.p_sum)

        v_left = _vel_b(inv_mass, p_left, full)
        v_right = _vel_b(inv_mass, p_right, full)
        turn_main = (
            jnp.sum(v_left * p_sum, -1) <= 0.0
        ) | (jnp.sum(v_right * p_sum, -1) <= 0.0)
        v_first = _vel_b(inv_mass, p_first, full)
        v_last = _vel_b(inv_mass, sub.p, full)
        x_lo = _w(go_right, v_left, v_last)
        x_hi = _w(go_right, v_first, v_right)
        x_rho = _w(go_right, s.p_sum + p_first, sub.p_sum + s.p_sum)
        turn_x1 = (
            jnp.sum(x_lo * x_rho, -1) <= 0.0
        ) | (jnp.sum(x_hi * x_rho, -1) <= 0.0)
        turning_new = ok & (turn_main | turn_x1)

        return _TrajState(
            depth=jnp.where(act, s.depth + 1, s.depth),
            q_left=q_left, p_left=p_left, grad_left=grad_left,
            logp_left=logp_left,
            q_right=q_right, p_right=p_right, grad_right=grad_right,
            logp_right=logp_right,
            p_sum=p_sum,
            prop_q=prop_q, prop_p=prop_p, prop_grad=prop_grad,
            prop_logp=prop_logp, prop_energy=prop_energy,
            log_size=jnp.where(
                ok, jnp.logaddexp(s.log_size, sub.log_size), s.log_size
            ),
            sum_accept=jnp.where(act, s.sum_accept + sub.sum_accept,
                                 s.sum_accept),
            n_leaves=jnp.where(act, s.n_leaves + sub.n, s.n_leaves),
            max_eerr=jnp.where(
                act & (jnp.abs(sub.max_eerr) > jnp.abs(s.max_eerr)),
                sub.max_eerr, s.max_eerr,
            ),
            turning=jnp.where(act, turning_new | sub.turning, s.turning),
            diverging=jnp.where(act, sub.diverging, s.diverging),
        )

    out = lax.while_loop(cond, body, init)

    n = jnp.maximum(out.n_leaves, 1)
    stats = NutsStats(
        depth=out.depth,
        n_steps=out.n_leaves,
        diverging=out.diverging,
        energy=out.prop_energy,
        energy_error=out.prop_energy - h0,
        max_energy_error=out.max_eerr,
        acceptance_rate=out.sum_accept / n.astype(dtype),
        lp=out.prop_logp,
    )
    return (out.prop_q, out.prop_logp, out.prop_grad), stats
