"""Metropolis-family step methods.

Parity: reference pymc/step_methods/metropolis.py (Metropolis:143 with the
scaling-tune ladder, BinaryMetropolis:418, BinaryGibbsMetropolis:543,
CategoricalGibbsMetropolis:675, DEMetropolis:864, DEMetropolisZ:1030) and the
proposal distributions (:74-123).

All kernels are batched over chains; DEMetropolis reads the whole chain batch
(the population axis), replacing the reference's daemon-process population
stepper (pymc/sampling/population.py:151).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import floatX, intX
from .compound import BlockedStep, Competence

__all__ = [
    "Metropolis",
    "BinaryMetropolis",
    "BinaryGibbsMetropolis",
    "CategoricalGibbsMetropolis",
    "DEMetropolis",
    "DEMetropolisZ",
    "NormalProposal",
    "UniformProposal",
    "CauchyProposal",
    "LaplaceProposal",
    "PoissonProposal",
    "MultivariateNormalProposal",
]


class Proposal:
    """Base proposal distribution (reference metropolis.py:74): holds the
    scale `s` (stddev vector, rate, or covariance) and draws perturbations
    with an explicit JAX key."""

    def __init__(self, s=1.0):
        self.s = jnp.asarray(s, floatX())

    def __call__(self, key, shape):
        raise NotImplementedError


class NormalProposal(Proposal):
    def __call__(self, key, shape):
        return self.s * jax.random.normal(key, shape, dtype=floatX())


class UniformProposal(Proposal):
    def __call__(self, key, shape):
        return jax.random.uniform(
            key, shape, minval=-self.s, maxval=self.s, dtype=floatX()
        )


class CauchyProposal(Proposal):
    def __call__(self, key, shape):
        return self.s * jax.random.cauchy(key, shape, dtype=floatX())


class LaplaceProposal(Proposal):
    def __call__(self, key, shape):
        return self.s * jax.random.laplace(key, shape, dtype=floatX())


class PoissonProposal(Proposal):
    """poisson(lam=s) - s: integer-valued, approximately symmetric
    (reference metropolis.py:110)."""

    def __call__(self, key, shape):
        lam = jnp.broadcast_to(self.s, shape)
        return (
            jax.random.poisson(key, lam, shape).astype(floatX()) - self.s
        )


class MultivariateNormalProposal(Proposal):
    """s is a full covariance matrix (reference metropolis.py:115)."""

    def __init__(self, s):
        super().__init__(s)
        self._chol = jnp.linalg.cholesky(self.s)

    def __call__(self, key, shape):
        n = self._chol.shape[-1]
        z = jax.random.normal(key, shape[:-1] + (n,), dtype=floatX())
        return jnp.einsum("ij,...j->...i", self._chol, z)


def _block_info(rvs):
    names, shapes, sizes, discrete = [], [], [], []
    for rv in rvs:
        names.append(rv.value_name)
        shapes.append(tuple(rv.value_shape))
        sizes.append(int(np.prod(rv.value_shape)) if rv.value_shape else 1)
        discrete.append(rv.dist.is_discrete)
    return names, shapes, sizes, discrete


def _ravel_block(point, names, shapes, sizes):
    parts = []
    for n, s in zip(names, shapes):
        parts.append(jnp.reshape(point[n].astype(floatX()), (-1,)))
    return jnp.concatenate(parts) if parts else jnp.zeros((0,), floatX())


def _unravel_block(q, point, names, shapes, sizes, discrete):
    out = dict(point)
    off = 0
    for n, s, size, disc in zip(names, shapes, sizes, discrete):
        v = jnp.reshape(q[off : off + size], s)
        out[n] = jnp.round(v).astype(intX()) if disc else v
        off += size
    return out


def _tune_scaling(scaling, acc_rate):
    """Reference Metropolis.tune ladder (metropolis.py:212-240)."""
    scaling = jnp.where(acc_rate < 0.001, scaling * 0.1, scaling)
    scaling = jnp.where((acc_rate >= 0.001) & (acc_rate < 0.05), scaling * 0.5, scaling)
    scaling = jnp.where((acc_rate >= 0.05) & (acc_rate < 0.2), scaling * 0.9, scaling)
    scaling = jnp.where((acc_rate > 0.5) & (acc_rate <= 0.75), scaling * 1.1, scaling)
    scaling = jnp.where((acc_rate > 0.75) & (acc_rate <= 0.95), scaling * 2.0, scaling)
    scaling = jnp.where(acc_rate > 0.95, scaling * 10.0, scaling)
    return scaling


class Metropolis(BlockedStep):
    """Gaussian random-walk Metropolis with adaptive scaling
    (reference metropolis.py:143). Discrete vars get rounded proposals
    (reference DiscreteMetropolis behavior)."""

    name = "metropolis"
    stats_names = ("accept_rate", "scaling", "accepted")

    def __init__(self, vars=None, S=None, proposal_dist=None, scaling=1.0,
                 tune=True, tune_interval=100, model=None, **kwargs):
        super().__init__(vars, model)
        self.initial_scaling = float(scaling)
        self.tune = tune
        self.names, self.shapes, self.sizes, self.discrete = _block_info(self.rvs)
        self.D = sum(self.sizes)
        if proposal_dist is not None:
            self.proposal = (
                proposal_dist if isinstance(proposal_dist, Proposal)
                else proposal_dist(S if S is not None else 1.0)
            )
        elif S is not None:
            self.proposal = NormalProposal(S)
        else:
            self.proposal = NormalProposal(1.0)
        self._disc_mask = jnp.concatenate(
            [jnp.full((sz,), d) for sz, d in zip(self.sizes, self.discrete)]
        ) if self.sizes else jnp.zeros((0,), bool)

    @classmethod
    def competence(cls, var, has_grad):
        return Competence.COMPATIBLE

    def init_state(self, point, chains, key):
        logp_fn = self._logp_fn()
        lp0 = jax.vmap(logp_fn)(point)
        return {
            "scaling": jnp.full((chains,), self.initial_scaling, floatX()),
            "accept_sum": jnp.zeros((chains,), floatX()),
            "steps": jnp.zeros((chains,), floatX()),
            "logp": lp0,
        }

    def step(self, key, point, state, flags):
        logp_fn = self._logp_fn()
        chains = state["scaling"].shape[0]
        names, shapes, sizes, discrete = (
            self.names, self.shapes, self.sizes, self.discrete
        )
        disc_mask = self._disc_mask

        def one(key, pt, scaling, lp):
            q = _ravel_block(pt, names, shapes, sizes)
            k1, k2 = jax.random.split(key)
            eps = scaling * self.proposal(k1, (self.D,))
            eps = jnp.where(disc_mask, jnp.round(eps), eps)
            q_new = q + eps
            pt_new = _unravel_block(q_new, pt, names, shapes, sizes, discrete)
            lp_new = logp_fn(pt_new)
            log_ratio = lp_new - lp
            accept = jnp.log(jax.random.uniform(k2, dtype=floatX())) < log_ratio
            pt_out = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), pt_new, pt
            )
            lp_out = jnp.where(accept, lp_new, lp)
            return pt_out, lp_out, accept

        keys = jax.random.split(key, chains)
        pt_out, lp_out, accepted = jax.vmap(one)(
            keys, point, state["scaling"], state["logp"]
        )
        accept_sum = state["accept_sum"] + accepted
        steps = state["steps"] + 1.0
        acc_rate = accept_sum / jnp.maximum(steps, 1.0)
        do_tune = jnp.logical_and(flags["tune_now"], self.tune)
        scaling = jnp.where(
            do_tune, _tune_scaling(state["scaling"], acc_rate), state["scaling"]
        )
        accept_sum = jnp.where(do_tune, 0.0, accept_sum)
        steps = jnp.where(do_tune, 0.0, steps)
        new_state = {
            "scaling": scaling,
            "accept_sum": accept_sum,
            "steps": steps,
            "logp": lp_out,
        }
        stats = {
            "accept_rate": acc_rate,
            "scaling": scaling,
            "accepted": accepted,
        }
        return pt_out, new_state, stats


class BinaryMetropolis(BlockedStep):
    """Flip-proposal Metropolis for binary vars (reference metropolis.py:418)."""

    name = "binary_metropolis"
    stats_names = ("accepted",)

    def __init__(self, vars=None, scaling=1.0, tune=True, tune_interval=100,
                 model=None, **kwargs):
        super().__init__(vars, model)
        self.names, self.shapes, self.sizes, _ = _block_info(self.rvs)
        self.D = sum(self.sizes)
        self.scaling = float(scaling)

    @classmethod
    def competence(cls, var, has_grad):
        from ..distributions.discrete import Bernoulli

        if isinstance(var.dist, Bernoulli):
            return Competence.COMPATIBLE
        return Competence.INCOMPATIBLE

    def init_state(self, point, chains, key):
        logp_fn = self._logp_fn()
        return {"logp": jax.vmap(logp_fn)(point)}

    def step(self, key, point, state, flags):
        logp_fn = self._logp_fn()
        chains = state["logp"].shape[0]
        names, shapes, sizes = self.names, self.shapes, self.sizes

        def one(key, pt, lp):
            k1, k2 = jax.random.split(key)
            # flip each bit with prob 1/(2D) scaled (reference: p = scaling)
            p_flip = jnp.minimum(0.5, self.scaling / max(self.D, 1))
            q = _ravel_block(pt, names, shapes, sizes)
            flips = jax.random.bernoulli(k1, p_flip, (self.D,))
            q_new = jnp.where(flips, 1.0 - q, q)
            pt_new = _unravel_block(q_new, pt, names, shapes, sizes,
                                    [True] * len(names))
            lp_new = logp_fn(pt_new)
            accept = jnp.log(jax.random.uniform(k2, dtype=floatX())) < lp_new - lp
            pt_out = jax.tree.map(lambda a, b: jnp.where(accept, a, b), pt_new, pt)
            return pt_out, jnp.where(accept, lp_new, lp), accept

        keys = jax.random.split(key, chains)
        pt_out, lp_out, accepted = jax.vmap(one)(keys, point, state["logp"])
        return pt_out, {"logp": lp_out}, {"accepted": accepted}


class BinaryGibbsMetropolis(BlockedStep):
    """Per-element Gibbs over binary vars (reference metropolis.py:543)."""

    name = "binary_gibbs"
    stats_names = ()

    def __init__(self, vars=None, order="random", transit_p=0.8, model=None,
                 **kwargs):
        super().__init__(vars, model)
        self.names, self.shapes, self.sizes, _ = _block_info(self.rvs)
        self.D = sum(self.sizes)

    @classmethod
    def competence(cls, var, has_grad):
        from ..distributions.discrete import Bernoulli

        if isinstance(var.dist, Bernoulli):
            return Competence.IDEAL
        return Competence.INCOMPATIBLE

    def init_state(self, point, chains, key):
        return {}

    def step(self, key, point, state, flags):
        logp_fn = self._logp_fn()
        names, shapes, sizes = self.names, self.shapes, self.sizes
        chains = point[names[0]].shape[0]

        def one(key, pt):
            q = _ravel_block(pt, names, shapes, sizes)

            def body(i, carry):
                q, k = carry
                k, sub = jax.random.split(k)
                q0 = q.at[i].set(0.0)
                q1 = q.at[i].set(1.0)
                pt0 = _unravel_block(q0, pt, names, shapes, sizes,
                                     [True] * len(names))
                pt1 = _unravel_block(q1, pt, names, shapes, sizes,
                                     [True] * len(names))
                lp0 = logp_fn(pt0)
                lp1 = logp_fn(pt1)
                p1 = jax.nn.sigmoid(lp1 - lp0)
                new_bit = jax.random.bernoulli(sub, p1).astype(floatX())
                return q.at[i].set(new_bit), k

            q, _ = lax.fori_loop(0, self.D, body, (q, key))
            return _unravel_block(q, pt, names, shapes, sizes,
                                  [True] * len(names))

        keys = jax.random.split(key, chains)
        pt_out = jax.vmap(one)(keys, point)
        return pt_out, state, {}


class CategoricalGibbsMetropolis(BlockedStep):
    """Per-element Gibbs over categorical vars with full conditional
    (the reference's `proportional` proposal, metropolis.py:675)."""

    name = "categorical_gibbs"
    stats_names = ()

    def __init__(self, vars=None, proposal="proportional", order="random",
                 model=None, **kwargs):
        super().__init__(vars, model)
        self.names, self.shapes, self.sizes, _ = _block_info(self.rvs)
        self.D = sum(self.sizes)
        ks = []
        for rv in self.rvs:
            from ..distributions.discrete import Categorical, DiscreteUniform

            if isinstance(rv.dist, Categorical):
                k = int(rv.dist.n_categories)
                lo = 0
            elif isinstance(rv.dist, DiscreteUniform):
                from ..graph import evaluate

                lo = int(np.asarray(jax.device_get(evaluate(rv.dist.lower))))
                hi = int(np.asarray(jax.device_get(evaluate(rv.dist.upper))))
                k = hi - lo + 1
            else:
                raise ValueError(
                    "CategoricalGibbsMetropolis requires Categorical or "
                    "DiscreteUniform variables"
                )
            ks.extend([(k, lo)] * int(np.prod(rv.value_shape) or 1))
        self.K = max(k for k, _ in ks)
        self.offsets = jnp.asarray([lo for _, lo in ks])
        self.n_cats = jnp.asarray([k for k, _ in ks])

    @classmethod
    def competence(cls, var, has_grad):
        from ..distributions.discrete import Categorical, DiscreteUniform

        if isinstance(var.dist, (Categorical, DiscreteUniform)):
            return Competence.IDEAL
        return Competence.INCOMPATIBLE

    def init_state(self, point, chains, key):
        return {}

    def step(self, key, point, state, flags):
        logp_fn = self._logp_fn()
        names, shapes, sizes = self.names, self.shapes, self.sizes
        chains = point[names[0]].shape[0]
        K = self.K
        offsets, n_cats = self.offsets, self.n_cats

        def one(key, pt):
            q = _ravel_block(pt, names, shapes, sizes)

            def body(i, carry):
                q, k = carry
                k, sub = jax.random.split(k)

                def logp_at(c):
                    qq = q.at[i].set(jnp.asarray(c, floatX()) + offsets[i])
                    return logp_fn(
                        _unravel_block(qq, pt, names, shapes, sizes,
                                       [True] * len(names))
                    )

                lps = jax.vmap(logp_at)(jnp.arange(K))
                lps = jnp.where(jnp.arange(K) < n_cats[i], lps, -jnp.inf)
                new_c = jax.random.categorical(sub, lps)
                return q.at[i].set(jnp.asarray(new_c, floatX()) + offsets[i]), k

            q, _ = lax.fori_loop(0, self.D, body, (q, key))
            return _unravel_block(q, pt, names, shapes, sizes,
                                  [True] * len(names))

        keys = jax.random.split(key, chains)
        pt_out = jax.vmap(one)(keys, point)
        return pt_out, state, {}


class DEMetropolis(BlockedStep):
    """Differential-evolution Metropolis: proposals from the difference of two
    OTHER chains' states (reference metropolis.py:864). The population is the
    chain batch itself — the cross-chain gather replaces the reference's
    population pipes (sampling/population.py)."""

    name = "DEMetropolis"
    stats_names = ("accepted", "accept_rate", "scaling")

    def __init__(self, vars=None, S=None, proposal_dist=None, lamb=None,
                 scaling=0.001, tune="scaling", tune_interval=100, model=None,
                 **kwargs):
        super().__init__(vars, model)
        self.names, self.shapes, self.sizes, self.discrete = _block_info(self.rvs)
        self.D = sum(self.sizes)
        self.lamb = float(lamb) if lamb is not None else 2.38 / np.sqrt(2 * self.D)
        self.initial_scaling = float(scaling)
        self.tune_target = tune

    @classmethod
    def competence(cls, var, has_grad):
        return Competence.COMPATIBLE

    def init_state(self, point, chains, key):
        logp_fn = self._logp_fn()
        if chains < 3:
            raise ValueError("DEMetropolis requires at least 3 chains")
        return {
            "scaling": jnp.full((chains,), self.initial_scaling, floatX()),
            "lamb": jnp.full((chains,), self.lamb, floatX()),
            "accept_sum": jnp.zeros((chains,), floatX()),
            "steps": jnp.zeros((chains,), floatX()),
            "logp": jax.vmap(logp_fn)(point),
        }

    def step(self, key, point, state, flags):
        logp_fn = self._logp_fn()
        chains = state["logp"].shape[0]
        names, shapes, sizes, discrete = (
            self.names, self.shapes, self.sizes, self.discrete
        )

        Q = jax.vmap(lambda pt: _ravel_block(pt, names, shapes, sizes))(point)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        # choose two distinct other chains per chain
        r1 = jax.random.randint(k1, (chains,), 0, chains - 1)
        r1 = jnp.where(r1 >= jnp.arange(chains), r1 + 1, r1)
        r2 = jax.random.randint(k2, (chains,), 0, chains - 2)
        lo = jnp.minimum(jnp.arange(chains), r1)
        hi = jnp.maximum(jnp.arange(chains), r1)
        r2 = jnp.where(r2 >= lo, r2 + 1, r2)
        r2 = jnp.where(r2 >= hi, r2 + 1, r2)
        diff = Q[r1] - Q[r2]
        eps = state["scaling"][:, None] * jax.random.normal(
            k3, Q.shape, dtype=floatX()
        )
        Q_new = Q + state["lamb"][:, None] * diff + eps

        def eval_one(q_new, pt):
            pt_new = _unravel_block(q_new, pt, names, shapes, sizes, discrete)
            return pt_new, logp_fn(pt_new)

        pt_news, lp_new = jax.vmap(eval_one)(Q_new, point)
        accept = jnp.log(
            jax.random.uniform(k4, (chains,), dtype=floatX())
        ) < lp_new - state["logp"]
        pt_out = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(accept, (chains,) + (1,) * (a.ndim - 1)), a, b
            ),
            pt_news, point,
        )
        lp_out = jnp.where(accept, lp_new, state["logp"])
        accept_sum = state["accept_sum"] + accept
        steps = state["steps"] + 1.0
        acc_rate = accept_sum / jnp.maximum(steps, 1.0)
        do_tune = flags["tune_now"]
        if self.tune_target == "lambda":
            lamb = jnp.where(do_tune, _tune_scaling(state["lamb"], acc_rate),
                             state["lamb"])
            scaling = state["scaling"]
        else:
            scaling = jnp.where(
                do_tune, _tune_scaling(state["scaling"], acc_rate),
                state["scaling"],
            )
            lamb = state["lamb"]
        new_state = {
            "scaling": scaling,
            "lamb": lamb,
            "accept_sum": jnp.where(do_tune, 0.0, accept_sum),
            "steps": jnp.where(do_tune, 0.0, steps),
            "logp": lp_out,
        }
        return pt_out, new_state, {
            "accepted": accept, "accept_rate": acc_rate, "scaling": scaling,
        }


class DEMetropolisZ(BlockedStep):
    """DE-MCMC-Z: proposals from the chain's OWN history
    (reference metropolis.py:1030). History lives in a preallocated on-device
    ring buffer per chain."""

    name = "DEMetropolisZ"
    stats_names = ("accepted", "accept_rate", "scaling")

    def __init__(self, vars=None, S=None, proposal_dist=None, lamb=None,
                 scaling=0.001, tune="lambda", tune_interval=100,
                 tune_drop_fraction=0.9, model=None, max_history=5000, **kwargs):
        super().__init__(vars, model)
        self.names, self.shapes, self.sizes, self.discrete = _block_info(self.rvs)
        self.D = sum(self.sizes)
        self.lamb = float(lamb) if lamb is not None else 2.38 / np.sqrt(2 * self.D)
        self.initial_scaling = float(scaling)
        self.tune_target = tune
        self.max_history = int(max_history)

    @classmethod
    def competence(cls, var, has_grad):
        return Competence.COMPATIBLE

    def init_state(self, point, chains, key):
        logp_fn = self._logp_fn()
        return {
            "scaling": jnp.full((chains,), self.initial_scaling, floatX()),
            "lamb": jnp.full((chains,), self.lamb, floatX()),
            "accept_sum": jnp.zeros((chains,), floatX()),
            "steps": jnp.zeros((chains,), floatX()),
            "logp": jax.vmap(logp_fn)(point),
            "history": jnp.zeros((chains, self.max_history, self.D), floatX()),
            "hist_len": jnp.zeros((chains,), jnp.int32),
        }

    def step(self, key, point, state, flags):
        logp_fn = self._logp_fn()
        chains = state["logp"].shape[0]
        names, shapes, sizes, discrete = (
            self.names, self.shapes, self.sizes, self.discrete
        )

        def one(key, pt, lp, scaling, lamb, history, hist_len):
            q = _ravel_block(pt, names, shapes, sizes)
            k1, k2, k3, k4 = jax.random.split(key, 4)
            eps = scaling * jax.random.normal(k1, (self.D,), dtype=floatX())
            have_hist = hist_len >= 2
            hist_cap = jnp.maximum(jnp.minimum(hist_len, self.max_history), 1)
            i1 = jax.random.randint(k2, (), 0, hist_cap)
            i2 = jax.random.randint(k3, (), 0, hist_cap)
            diff = history[i1] - history[i2]
            prop = jnp.where(have_hist, lamb * diff + eps, eps)
            q_new = q + prop
            pt_new = _unravel_block(q_new, pt, names, shapes, sizes, discrete)
            lp_new = logp_fn(pt_new)
            accept = jnp.log(jax.random.uniform(k4, dtype=floatX())) < lp_new - lp
            q_out = jnp.where(accept, q_new, q)
            pt_out = jax.tree.map(lambda a, b: jnp.where(accept, a, b), pt_new, pt)
            lp_out = jnp.where(accept, lp_new, lp)
            slot = jnp.mod(hist_len, self.max_history)
            history = lax.dynamic_update_slice(
                history, q_out[None], (slot, jnp.zeros((), slot.dtype))
            )
            return pt_out, lp_out, accept, history, hist_len + 1

        keys = jax.random.split(key, chains)
        pt_out, lp_out, accepted, history, hist_len = jax.vmap(one)(
            keys, point, state["logp"], state["scaling"], state["lamb"],
            state["history"], state["hist_len"],
        )
        accept_sum = state["accept_sum"] + accepted
        steps = state["steps"] + 1.0
        acc_rate = accept_sum / jnp.maximum(steps, 1.0)
        do_tune = flags["tune_now"]
        if self.tune_target == "lambda":
            lamb = jnp.where(do_tune, _tune_scaling(state["lamb"], acc_rate),
                             state["lamb"])
            scaling = state["scaling"]
        else:
            scaling = jnp.where(
                do_tune, _tune_scaling(state["scaling"], acc_rate),
                state["scaling"],
            )
            lamb = state["lamb"]
        new_state = {
            "scaling": scaling,
            "lamb": lamb,
            "accept_sum": jnp.where(do_tune, 0.0, accept_sum),
            "steps": jnp.where(do_tune, 0.0, steps),
            "logp": lp_out,
            "history": history,
            "hist_len": hist_len,
        }
        return pt_out, new_state, {
            "accepted": accepted, "accept_rate": acc_rate, "scaling": scaling,
        }
