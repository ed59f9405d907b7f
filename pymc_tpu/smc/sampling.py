"""SMC driver.

Parity: reference pymc/smc/sampling.py:42 (sample_smc): independent SMC
chains (default max(2, cores)), results as InferenceData with per-stage
sample_stats including log_marginal_likelihood.

TPU-native: chains vmap over the staged kernel; the host loop only advances
stages until every chain's temperature reaches 1 (replacing the
process-per-chain executor of pymc/smc/parallel.py).
"""

from __future__ import annotations

import logging
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..backends.arviz import to_inference_data
from ..blocking import ravel_point, unravel_vector
from ..config import floatX
from ..model.core import modelcontext
from .kernels import IMH, MH, smc_init, smc_stage

__all__ = ["sample_smc"]

_log = logging.getLogger("pymc_tpu")


def sample_smc(
    draws=2000,
    *,
    kernel="imh",
    chains=4,
    cores=None,
    model=None,
    random_seed=None,
    threshold=0.5,
    correlation_threshold=0.01,
    compute_convergence_checks=True,
    return_inferencedata=True,
    progressbar=True,
    idata_kwargs=None,
    max_stages=100,
    **kernel_kwargs,
):
    """Sequential Monte Carlo sampling (reference smc/sampling.py:42)."""
    from ..sampling.mcmc import _make_postprocess_fn, _resolve_seed

    model = modelcontext(model)
    if model.discrete_value_vars:
        raise NotImplementedError(
            "SMC over discrete free variables: marginalize or use pm.sample"
        )
    key = _resolve_seed(random_seed)
    k_init, k_stages = jax.random.split(key)

    info = model.raveled_info()
    D = info.total_size
    split_logp = model.logp_fn(split=True)

    has_simulator = any(
        type(orv.dist).__name__ == "Simulator" for orv in model.observed_RVs
    )
    sim_key_holder = {"key": jax.random.PRNGKey(0)}

    def prior_like_one(q, sim_key):
        vals = unravel_vector(q, info)
        if has_simulator:
            vals[("__simulator_key__",)] = sim_key
        varlogp, datalogp = split_logp(vals)
        return varlogp, datalogp

    def prior_like_fn(particles):
        n = particles.shape[0]
        sim_keys = jax.random.split(sim_key_holder["key"], n)
        vl, dl = jax.vmap(prior_like_one)(particles, sim_keys)
        # guard: non-finite likelihoods act as -inf (outside support)
        return vl, jnp.where(jnp.isfinite(dl), dl, -jnp.inf)

    if isinstance(kernel, str):
        kernel = {"imh": IMH, "mh": MH}[kernel.lower()](**kernel_kwargs)
    elif isinstance(kernel, type):
        kernel = kernel(**kernel_kwargs)

    # initialize particles from the prior, in unconstrained space
    from ..sampling.forward import _generative_fn

    gen = _generative_fn(model)

    def init_particle(k):
        sample = gen(k, {})
        point = {rv.name: sample[rv.name] for rv in model.free_RVs}
        return ravel_point(model.unconstrain(point), info)

    keys = jax.random.split(k_init, chains * draws)
    particles = jax.jit(jax.vmap(init_particle))(keys).reshape(chains, draws, D)

    state = jax.jit(jax.vmap(lambda p: smc_init(p, prior_like_fn)))(particles)

    stage_fn = jax.jit(
        jax.vmap(smc_stage(kernel, prior_like_fn, threshold), in_axes=(0, 0))
    )

    t0 = time.perf_counter()
    betas_hist = []
    stage_i = 0
    while stage_i < max_stages:
        sim_key_holder["key"] = jax.random.fold_in(k_stages, 7919 + stage_i)
        ks = jax.random.split(jax.random.fold_in(k_stages, stage_i), chains)
        state = stage_fn(ks, state)
        betas = np.asarray(jax.device_get(state.beta))
        betas_hist.append(betas.copy())
        stage_i += 1
        if progressbar:
            _log.info(
                f"SMC stage {stage_i}: beta={np.round(betas, 4).tolist()} "
                f"acc={np.round(np.asarray(jax.device_get(state.acc_rate)), 3).tolist()}"
            )
        if np.all(betas >= 1.0):
            break
    t1 = time.perf_counter()
    _log.info(f"SMC finished in {stage_i} stages, {t1 - t0:.2f}s")

    flat = np.asarray(jax.device_get(state.particles)).reshape(chains * draws, D)
    post_fn = jax.jit(jax.vmap(_make_postprocess_fn(model, info)))
    out = post_fn(jnp.asarray(flat))
    posterior = {
        k: np.asarray(jax.device_get(v)).reshape((chains, draws) + v.shape[1:])
        for k, v in out.items()
    }

    lml = np.asarray(jax.device_get(state.log_marginal))
    stats = {
        "log_marginal_likelihood": np.broadcast_to(
            lml[:, None], (chains, draws)
        ).copy(),
        "beta": np.broadcast_to(
            np.asarray(jax.device_get(state.beta))[:, None], (chains, draws)
        ).copy(),
        "accept_rate": np.broadcast_to(
            np.asarray(jax.device_get(state.acc_rate))[:, None], (chains, draws)
        ).copy(),
    }

    idata = to_inference_data(
        model,
        posterior=posterior,
        sample_stats=stats,
        attrs={
            "sampling_time": t1 - t0,
            "n_stages": stage_i,
            "inference_library": "pymc_tpu.smc",
            "log_marginal_likelihood": lml.tolist(),
        },
    )
    if compute_convergence_checks:
        from ..stats.convergence import log_warnings, run_convergence_checks

        log_warnings(run_convergence_checks(idata, model))
    if not return_inferencedata:
        return posterior
    return idata
