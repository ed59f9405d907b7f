"""Slice sampler.

Parity: reference pymc/step_methods/slicer.py:49 (univariate slice with
stepping-out and shrinkage, width tuning). Coordinates update sequentially in
a fori_loop (the algorithm's inherent structure); chains are vmapped.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import floatX
from .compound import BlockedStep, Competence
from .metropolis import _block_info, _ravel_block, _unravel_block

__all__ = ["Slice"]

_MAX_STEPS_OUT = 16
_MAX_SHRINK = 64


class Slice(BlockedStep):
    name = "slice"
    stats_names = ("nstep_out", "nstep_in")

    def __init__(self, vars=None, w=1.0, tune=True, iter_limit=np.inf,
                 model=None, **kwargs):
        super().__init__(vars, model)
        self.names, self.shapes, self.sizes, self.discrete = _block_info(self.rvs)
        if any(self.discrete):
            raise ValueError("Slice sampler requires continuous variables")
        self.D = sum(self.sizes)
        self.initial_w = float(w)
        self.tune = tune

    @classmethod
    def competence(cls, var, has_grad):
        if var.dist.is_discrete:
            return Competence.INCOMPATIBLE
        return Competence.COMPATIBLE

    def init_state(self, point, chains, key):
        return {
            "w": jnp.full((chains, self.D), self.initial_w, floatX()),
            "n_tunes": jnp.zeros((chains,), floatX()),
        }

    def step(self, key, point, state, flags):
        logp_fn = self._logp_fn()
        names, shapes, sizes, discrete = (
            self.names, self.shapes, self.sizes, self.discrete
        )
        chains = state["w"].shape[0]
        is_tune = flags["is_tune"]

        def one(key, pt, w, n_tunes):
            q = _ravel_block(pt, names, shapes, sizes)

            def logp_at(qv):
                return logp_fn(
                    _unravel_block(qv, pt, names, shapes, sizes, discrete)
                )

            def coord_body(i, carry):
                q, w, k, out_ct, in_ct = carry
                k, k1, k2, k3, k4 = jax.random.split(k, 5)
                y = logp_at(q) - jax.random.exponential(k1, dtype=floatX())
                wi = w[i]
                u = jax.random.uniform(k2, dtype=floatX())
                l0 = q[i] - wi * u
                r0 = l0 + wi

                def out_cond_l(st):
                    l, n = st
                    return jnp.logical_and(
                        logp_at(q.at[i].set(l)) > y, n < _MAX_STEPS_OUT
                    )

                l, n_l = lax.while_loop(
                    out_cond_l, lambda st: (st[0] - wi, st[1] + 1), (l0, 0)
                )

                def out_cond_r(st):
                    r, n = st
                    return jnp.logical_and(
                        logp_at(q.at[i].set(r)) > y, n < _MAX_STEPS_OUT
                    )

                r, n_r = lax.while_loop(
                    out_cond_r, lambda st: (st[0] + wi, st[1] + 1), (r0, 0)
                )

                def shrink_cond(st):
                    l, r, x, accepted, n, k = st
                    return jnp.logical_and(~accepted, n < _MAX_SHRINK)

                def shrink_body(st):
                    l, r, x, accepted, n, k = st
                    k, sub = jax.random.split(k)
                    x_new = l + (r - l) * jax.random.uniform(sub, dtype=floatX())
                    ok = logp_at(q.at[i].set(x_new)) > y
                    l = jnp.where(jnp.logical_or(ok, x_new >= q[i]), l, x_new)
                    r = jnp.where(jnp.logical_or(ok, x_new < q[i]), r, x_new)
                    return l, r, jnp.where(ok, x_new, x), jnp.logical_or(
                        accepted, ok
                    ), n + 1, k

                l, r, x_new, accepted, n_in, _ = lax.while_loop(
                    shrink_cond, shrink_body,
                    (l, r, q[i], jnp.asarray(False), 0, k3),
                )
                q = q.at[i].set(jnp.where(accepted, x_new, q[i]))
                # width tuning (reference slicer.py: running average of 2*|dx|)
                delta = jnp.abs(x_new - q[i]) * 0.0 + jnp.abs(r - l)
                w_new = jnp.where(
                    is_tune,
                    (w[i] * n_tunes + delta) / (n_tunes + 1.0),
                    w[i],
                )
                w = w.at[i].set(w_new)
                return q, w, k, out_ct + n_l + n_r, in_ct + n_in

            q, w, _, out_ct, in_ct = lax.fori_loop(
                0, self.D, coord_body, (q, w, key, 0, 0)
            )
            n_tunes = jnp.where(is_tune, n_tunes + 1.0, n_tunes)
            pt_out = _unravel_block(q, pt, names, shapes, sizes, discrete)
            return pt_out, w, n_tunes, out_ct, in_ct

        keys = jax.random.split(key, chains)
        pt_out, w, n_tunes, out_ct, in_ct = jax.vmap(one)(
            keys, point, state["w"], state["n_tunes"]
        )
        return pt_out, {"w": w, "n_tunes": n_tunes}, {
            "nstep_out": out_ct, "nstep_in": in_ct,
        }
