"""SMC driver.

Parity: reference pymc/smc/sampling.py:42 (sample_smc): independent SMC
chains (default max(2, cores)), results as InferenceData with per-stage
sample_stats including log_marginal_likelihood.

TPU-native: chains vmap over the staged kernel; the host loop only advances
stages until every chain's temperature reaches 1 (replacing the
process-per-chain executor of pymc/smc/parallel.py). ``mesh=`` shards the
particle axis over devices (SURVEY §2.11 mapping): tempered-logp evaluation
runs on each device's particle shard and the reweighting logsumexp / ESS
bisection / Pearson-stopping reductions become XLA all-reduces over ICI;
systematic resampling is a sharded sorted-uniform gather.
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


def _smc_state_sharding(mesh):
    """NamedShardings for a vmapped SMCState whose arrays are (chains, N, ...).

    The mesh axis named "particles" (or the sole axis of a 1-D mesh not named
    "chains") shards the particle axis; a "chains" axis shards chains.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    names = mesh.axis_names
    chain_ax = "chains" if "chains" in names else None
    if "particles" in names:
        part_ax = "particles"
    elif len(names) == 1 and names[0] != "chains":
        part_ax = names[0]
    else:
        part_ax = None

    def put(x):
        if x.ndim == 0:
            spec = P()
        elif x.ndim == 1:
            spec = P(chain_ax)
        else:
            spec = P(chain_ax, part_ax, *([None] * (x.ndim - 2)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return put


def sample_smc(
    draws=2000,
    *,
    kernel="imh",
    chains=4,
    cores=None,
    model=None,
    random_seed=None,
    start=None,
    threshold=0.5,
    correlation_threshold=0.01,
    compute_convergence_checks=True,
    return_inferencedata=True,
    progressbar=True,
    idata_kwargs=None,
    max_stages=100,
    mesh=None,
    **kernel_kwargs,
):
    """Sequential Monte Carlo sampling (reference smc/sampling.py:42).

    mesh : jax.sharding.Mesh, optional — shard the particle axis across
        devices (axis named "particles"; a 2-D ("chains", "particles") mesh
        also shards chains). Draws match the unsharded run up to collective
        reduction order.
    """
    from ..sampling.mcmc import _make_postprocess_fn, _resolve_seed

    model = modelcontext(model)
    key = _resolve_seed(random_seed)
    k_init, k_stages = jax.random.split(key)

    # Discrete free variables ride as continuous particle coordinates that
    # are ROUNDED to the lattice before every density evaluation (reference
    # smc/kernels.py _logp_forw floor-casting, tests/smc/test_smc.py
    # test_discrete_rounding_proposal: -0.49 -> 0, 0.51 -> 1, -0.51 -> -inf).
    # Proposals/mutations stay continuous; only the logp sees the lattice.
    info = model.raveled_info(vars=model.free_RVs)
    D = info.total_size
    disc_names = {rv.value_name for rv in model.discrete_value_vars}
    if disc_names:
        mask = np.zeros(D, dtype=bool)
        for name, sl in info.slices().items():
            if name in disc_names:
                mask[sl] = True
        disc_mask = jnp.asarray(mask)

        def snap(q):
            return jnp.where(disc_mask, jnp.round(q), q)
    else:
        def snap(q):
            return q

    split_logp = model.logp_fn(split=True)

    has_simulator = any(
        type(orv.dist).__name__ == "Simulator" for orv in model.observed_RVs
    )

    def prior_like_one(q, sim_key):
        vals = unravel_vector(snap(q), info)
        if has_simulator:
            vals[("__simulator_key__",)] = sim_key
        varlogp, datalogp = split_logp(vals)
        return varlogp, datalogp

    def prior_like_fn(particles, key=None):
        # `key` drives the ABC Simulator draws (pseudo-marginal ABC-MCMC:
        # fresh synthetic data per proposal sweep). It is a traced argument,
        # NOT a closure constant — closure values would be baked into the
        # jitted stage at first trace and never advance.
        n = particles.shape[0]
        if key is None:
            key = jax.random.PRNGKey(0)
        sim_keys = jax.random.split(key, n)
        vl, dl = jax.vmap(prior_like_one)(particles, sim_keys)
        # guard: non-finite likelihoods act as -inf (outside support)
        return vl, jnp.where(jnp.isfinite(dl), dl, -jnp.inf)

    if isinstance(kernel, str):
        kernel = {"imh": IMH, "mh": MH}[kernel.lower()](
            correlation_threshold=correlation_threshold, **kernel_kwargs
        )
    elif isinstance(kernel, type):
        kernel_kwargs.setdefault("correlation_threshold", correlation_threshold)
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

    if start is not None:
        # reference smc/kernels.py:286: `start` seeds the initial population
        # as {name: (draws,)+shape} arrays in VALUE space (transformed names
        # like "b_log__", or rv names for untransformed vars); unlisted vars
        # keep their prior-sampled particles. A list gives one dict per chain.
        starts = list(start) if isinstance(start, (list, tuple)) else \
            [start] * chains
        if len(starts) != chains:
            raise ValueError(
                f"start must be one dict or a list of {chains} dicts"
            )
        buf = np.asarray(particles).copy()
        sl = info.slices()
        for c, sdict in enumerate(starts):
            for rv in model.free_RVs:
                arr = sdict.get(rv.value_name)
                if arr is None and rv.value_name != rv.name:
                    arr = sdict.get(rv.name)
                    if arr is not None:
                        arr = np.asarray(
                            jax.vmap(
                                lambda x: rv.transform.forward(x, {})
                            )(jnp.asarray(arr, dtype=floatX()))
                        )
                if arr is None:
                    continue
                arr = np.asarray(arr, dtype=np.float64).reshape(draws, -1)
                buf[c, :, sl[rv.value_name]] = arr
        particles = jnp.asarray(buf, dtype=particles.dtype)

    init_keys = jax.random.split(jax.random.fold_in(k_stages, 999983), chains)
    state = jax.jit(
        jax.vmap(lambda p, k: smc_init(p, prior_like_fn, k))
    )(particles, init_keys)

    if mesh is not None:
        put = _smc_state_sharding(mesh)
        state = jax.tree.map(put, state)

    stage_fn = jax.jit(
        jax.vmap(smc_stage(kernel, prior_like_fn, threshold), in_axes=(0, 0))
    )

    t0 = time.perf_counter()
    betas_hist = []
    steps_hist = []
    acc_hist = []
    stage_i = 0
    while stage_i < max_stages:
        ks = jax.random.split(jax.random.fold_in(k_stages, stage_i), chains)
        state = stage_fn(ks, state)
        betas = np.asarray(jax.device_get(state.beta))
        betas_hist.append(betas.copy())
        steps_hist.append(np.asarray(jax.device_get(state.n_steps)).copy())
        acc_hist.append(np.asarray(jax.device_get(state.acc_rate)).copy())
        stage_i += 1
        if progressbar:
            _log.info(
                f"SMC stage {stage_i}: beta={np.round(betas, 4).tolist()} "
                f"acc={np.round(acc_hist[-1], 3).tolist()} "
                f"n_steps={steps_hist[-1].tolist()}"
            )
        if np.all(betas >= 1.0):
            break
    t1 = time.perf_counter()
    _log.info(f"SMC finished in {stage_i} stages, {t1 - t0:.2f}s")

    flat = np.asarray(jax.device_get(state.particles)).reshape(chains * draws, D)
    post_fn = jax.jit(jax.vmap(_make_postprocess_fn(model, info)))
    out = post_fn(snap(jnp.asarray(flat)))
    posterior = {
        k: np.asarray(jax.device_get(v)).reshape((chains, draws) + v.shape[1:])
        for k, v in out.items()
    }
    for rv in model.discrete_value_vars:
        if rv.name in posterior:
            posterior[rv.name] = posterior[rv.name].astype(rv.dtype)

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
        "n_steps": np.broadcast_to(
            np.asarray(jax.device_get(state.n_steps))[:, None], (chains, draws)
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
            "beta_history": np.array(betas_hist).tolist(),
            "n_steps_history": np.array(steps_hist).tolist(),
            "accept_rate_history": np.array(acc_hist).tolist(),
            "correlation_threshold": getattr(
                kernel, "correlation_threshold", correlation_threshold
            ),
            "threshold": threshold,
            "n_draws": draws,
        },
    )
    if compute_convergence_checks:
        from ..stats.convergence import log_warnings, run_convergence_checks

        log_warnings(run_convergence_checks(idata, model))
    if not return_inferencedata:
        return posterior
    return idata
