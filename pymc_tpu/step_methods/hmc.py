"""NUTS / HMC step-method wrappers for compound sampling.

Parity: reference pymc/step_methods/hmc/nuts.py:132 (NUTS BlockedStep) and
hmc/hmc.py:45 (HamiltonianMC). The standalone fast path in sampling/mcmc.py
uses the raw kernel directly; these wrappers let NUTS participate in
CompoundStep sweeps beside discrete samplers, carrying their own
dual-averaging + Welford adaptation state.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..blocking import RaveledInfo, unravel_vector
from ..config import floatX
from ..sampling.adaptation import (
    da_init,
    da_update,
    welford_init,
    welford_update,
    welford_variance,
)
from ..sampling.nuts import nuts_transition
from .compound import BlockedStep, Competence
from .metropolis import _block_info, _ravel_block, _unravel_block

__all__ = ["NUTS", "HamiltonianMC"]


class NUTS(BlockedStep):
    name = "nuts"
    stats_names = (
        "tree_depth", "n_steps", "diverging", "energy", "acceptance_rate", "lp",
    )

    def __init__(self, vars=None, max_treedepth=10, target_accept=0.8,
                 step_scale=0.25, model=None, **kwargs):
        super().__init__(vars, model)
        self.names, self.shapes, self.sizes, disc = _block_info(self.rvs)
        if any(disc):
            raise ValueError("NUTS requires continuous variables")
        self.D = sum(self.sizes)
        self.max_treedepth = max_treedepth
        self.target_accept = target_accept

    @classmethod
    def competence(cls, var, has_grad):
        if var.dist.is_discrete:
            return Competence.INCOMPATIBLE
        return Competence.IDEAL

    def _block_logp_fn(self, pt_rest):
        """logp as a function of this block's flat vector, with the other
        variables frozen at their current values."""
        logp_fn = self._logp_fn()
        names, shapes, sizes, disc = (
            self.names, self.shapes, self.sizes, [False] * len(self.names)
        )

        def f(q):
            pt = _unravel_block(q, pt_rest, names, shapes, sizes, disc)
            return logp_fn(pt)

        return f

    def init_state(self, point, chains, key):
        return {
            "da": jax.vmap(da_init)(jnp.full((chains,), 0.1, floatX())),
            "wf": jax.vmap(lambda _: welford_init(self.D, dtype=floatX()))(
                jnp.arange(chains)
            ),
            "inv_mass": jnp.ones((chains, self.D), floatX()),
        }

    def step(self, key, point, state, flags):
        names, shapes, sizes = self.names, self.shapes, self.sizes
        chains = state["inv_mass"].shape[0]
        is_tune = flags["is_tune"]
        # mass window: update welford every tune step, adopt every tune_now
        do_update = is_tune
        do_switch = jnp.logical_and(is_tune, flags["tune_now"])

        def one(key, pt, da, inv_mass):
            q = _ravel_block(pt, names, shapes, sizes)
            f = self._block_logp_fn(pt)
            lp, grad = jax.value_and_grad(f)(q)
            step_size = jnp.where(
                is_tune, jnp.exp(da.log_step), jnp.exp(da.log_step_avg)
            )
            (q_new, lp_new, _), stats = nuts_transition(
                jax.value_and_grad(f), key, q, lp, grad, step_size, inv_mass,
                max_treedepth=self.max_treedepth,
            )
            pt_out = _unravel_block(q_new, pt, names, shapes, sizes,
                                    [False] * len(names))
            return pt_out, q_new, stats

        keys = jax.random.split(key, chains)
        pt_out, q_new, stats = jax.vmap(one)(
            keys, point, state["da"], state["inv_mass"]
        )
        accept = jnp.clip(stats.acceptance_rate, 0.0, 1.0)
        da_new = jax.vmap(lambda d, a: da_update(d, a, self.target_accept))(
            state["da"], accept
        )
        da = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(is_tune, (1,) * new.ndim), new, old
            ),
            da_new, state["da"],
        )
        wf_new = jax.vmap(welford_update)(state["wf"], q_new)
        wf = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(do_update, (1,) * new.ndim), new, old
            ),
            wf_new, state["wf"],
        )
        new_inv = jax.vmap(welford_variance)(wf)
        inv_mass = jnp.where(
            jnp.reshape(do_switch, (1, 1)), new_inv, state["inv_mass"]
        )
        wf0 = jax.vmap(lambda _: welford_init(self.D, dtype=floatX()))(
            jnp.arange(chains)
        )
        wf = jax.tree.map(
            lambda res, old: jnp.where(
                jnp.reshape(do_switch, (1,) * res.ndim), res, old
            ),
            wf0, wf,
        )
        out_stats = {
            "tree_depth": stats.depth,
            "n_steps": stats.n_steps,
            "diverging": stats.diverging,
            "energy": stats.energy,
            "acceptance_rate": stats.acceptance_rate,
            "lp": stats.lp,
        }
        return pt_out, {"da": da, "wf": wf, "inv_mass": inv_mass}, out_stats


class HamiltonianMC(BlockedStep):
    """Fixed-path-length HMC (reference hmc/hmc.py:45, step at :143)."""

    name = "hmc"
    stats_names = ("accepted", "energy", "lp", "acceptance_rate")

    def __init__(self, vars=None, path_length=2.0, max_steps=1024,
                 target_accept=0.65, model=None, **kwargs):
        super().__init__(vars, model)
        self.names, self.shapes, self.sizes, disc = _block_info(self.rvs)
        if any(disc):
            raise ValueError("HamiltonianMC requires continuous variables")
        self.D = sum(self.sizes)
        self.path_length = float(path_length)
        self.max_steps = int(max_steps)
        self.target_accept = target_accept

    @classmethod
    def competence(cls, var, has_grad):
        if var.dist.is_discrete:
            return Competence.INCOMPATIBLE
        return Competence.COMPATIBLE

    def init_state(self, point, chains, key):
        return {
            "da": jax.vmap(da_init)(jnp.full((chains,), 0.1, floatX())),
            "wf": jax.vmap(lambda _: welford_init(self.D, dtype=floatX()))(
                jnp.arange(chains)
            ),
            "inv_mass": jnp.ones((chains, self.D), floatX()),
        }

    def step(self, key, point, state, flags):
        names, shapes, sizes = self.names, self.shapes, self.sizes
        chains = state["inv_mass"].shape[0]
        is_tune = flags["is_tune"]

        def one(key, pt, da, inv_mass):
            q = _ravel_block(pt, names, shapes, sizes)
            f = jax.value_and_grad(self._make_f(pt))
            lp, grad = f(q)
            step_size = jnp.where(
                is_tune, jnp.exp(da.log_step), jnp.exp(da.log_step_avg)
            )
            k1, k2 = jax.random.split(key)
            p0 = jax.random.normal(k1, (self.D,), floatX()) / jnp.sqrt(inv_mass)
            h0 = -lp + 0.5 * jnp.sum(p0 * inv_mass * p0)
            n_steps = jnp.clip(
                jnp.asarray(self.path_length / jnp.maximum(step_size, 1e-10),
                            jnp.int32),
                1, self.max_steps,
            )

            def leap(carry, _):
                q, p, grad, lp, i = carry
                active = i < n_steps
                p_half = p + 0.5 * step_size * grad
                q_n = q + step_size * inv_mass * p_half
                lp_n, grad_n = f(q_n)
                p_n = p_half + 0.5 * step_size * grad_n
                out = (
                    jnp.where(active, q_n, q),
                    jnp.where(active, p_n, p),
                    jnp.where(active, grad_n, grad),
                    jnp.where(active, lp_n, lp),
                    i + 1,
                )
                return out, None

            (q_new, p_new, grad_new, lp_new, _), _ = lax.scan(
                leap, (q, p0, grad, lp, 0), None, length=self.max_steps
            )
            h_new = -lp_new + 0.5 * jnp.sum(p_new * inv_mass * p_new)
            log_acc = jnp.minimum(0.0, h0 - h_new)
            log_acc = jnp.where(jnp.isfinite(log_acc), log_acc, -jnp.inf)
            accept = jnp.log(jax.random.uniform(k2, dtype=floatX())) < log_acc
            q_out = jnp.where(accept, q_new, q)
            pt_out = _unravel_block(q_out, pt, names, shapes, sizes,
                                    [False] * len(names))
            return pt_out, q_out, accept, jnp.exp(log_acc), jnp.where(
                accept, lp_new, lp
            ), jnp.where(accept, h_new, h0)

        keys = jax.random.split(key, chains)
        pt_out, q_out, accepted, acc_prob, lp, energy = jax.vmap(one)(
            keys, point, state["da"], state["inv_mass"]
        )
        da_new = jax.vmap(lambda d, a: da_update(d, a, self.target_accept))(
            state["da"], acc_prob
        )
        da = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(is_tune, (1,) * new.ndim), new, old
            ),
            da_new, state["da"],
        )
        do_update = is_tune
        do_switch = jnp.logical_and(is_tune, flags["tune_now"])
        wf_new = jax.vmap(welford_update)(state["wf"], q_out)
        wf = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(do_update, (1,) * new.ndim), new, old
            ),
            wf_new, state["wf"],
        )
        new_inv = jax.vmap(welford_variance)(wf)
        inv_mass = jnp.where(
            jnp.reshape(do_switch, (1, 1)), new_inv, state["inv_mass"]
        )
        wf0 = jax.vmap(lambda _: welford_init(self.D, dtype=floatX()))(
            jnp.arange(chains)
        )
        wf = jax.tree.map(
            lambda res, old: jnp.where(
                jnp.reshape(do_switch, (1,) * res.ndim), res, old
            ),
            wf0, wf,
        )
        stats = {
            "accepted": accepted,
            "acceptance_rate": acc_prob,
            "lp": lp,
            "energy": energy,
        }
        return pt_out, {"da": da, "wf": wf, "inv_mass": inv_mass}, stats

    def _make_f(self, pt_rest):
        logp_fn = self._logp_fn()
        names, shapes, sizes = self.names, self.shapes, self.sizes

        def f(q):
            pt = _unravel_block(q, pt_rest, names, shapes, sizes,
                                [False] * len(names))
            return logp_fn(pt)

        return f
