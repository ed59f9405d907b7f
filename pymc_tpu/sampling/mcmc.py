"""pm.sample — the MCMC driver.

Parity: reference pymc/sampling/mcmc.py:620 (sample), :1759 (init_nuts
strategies), :1232 (_sample_return packaging + convergence checks).

TPU-native architecture (replaces §2.7's process-per-chain executor): chains
are a vmapped leading axis of ONE on-device program; warmup adaptation
(dual-averaging + windowed Welford mass matrix) is per-chain vectorized state
inside lax.scan; draws stream back to host in chunks. Multi-chip scaling
shards the chain axis over a jax.sharding.Mesh (see pymc_tpu/parallel).
"""

from __future__ import annotations

import logging
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..backends.arviz import to_inference_data
from ..blocking import ravel_point, unravel_vector
from ..config import floatX
from ..initial_point import make_initial_points_per_chain
from ..model.core import modelcontext
from ..stats.convergence import log_warnings, run_convergence_checks
from .adaptation import (
    build_schedule,
    da_init,
    da_restart,
    da_update,
    find_reasonable_step_size,
    welford_init,
    welford_update,
    welford_variance,
)
from .nuts import NutsStats, nuts_transition, nuts_transition_batched

__all__ = ["sample", "init_nuts"]

_log = logging.getLogger("pymc_tpu")

# The reference's full init-strategy family (pymc/sampling/mcmc.py:1759-2020);
# every string either works or sample()/init_nuts() raises loudly.
SUPPORTED_INITS = frozenset({
    "adapt_diag",
    "jitter+adapt_diag",
    "jitter+adapt_diag_grad",
    "advi+adapt_diag",
    "advi",
    "advi_map",
    "map",
    "adapt_full",
    "jitter+adapt_full",
})


def _resolve_seed(random_seed):
    if random_seed is None:
        random_seed = np.random.default_rng().integers(2**30)
    if isinstance(random_seed, jax.Array) and random_seed.dtype == jnp.uint32:
        return random_seed
    return jax.random.PRNGKey(int(random_seed))


def sample(
    draws=1000,
    *,
    tune=1000,
    chains=4,
    model=None,
    random_seed=None,
    target_accept=0.8,
    max_treedepth=10,
    init="jitter+adapt_diag",
    jitter_max_retries=10,
    initvals=None,
    step=None,
    discard_tuned_samples=True,
    progressbar=True,
    compute_convergence_checks=True,
    return_inferencedata=True,
    idata_kwargs=None,
    chain_method="vectorized",
    nuts=None,
    postprocessing_chunks=None,
    var_names=None,
    mass_adapt="per_chain",
    step_adapt="per_chain",
    callback=None,
    cores=None,
    keep_warning_stat=False,
    trace=None,
    resume=False,
    chunk_size=None,
    mesh=None,
    sampler="nuts",
    mass_matrix=None,
    **kwargs,
):
    """Draw posterior samples with on-device vectorized samplers.

    Mirrors the reference `pm.sample` signature (sampling/mcmc.py:620) where
    meaningful on TPU; process-pool arguments (`cores`, `mp_ctx`) are accepted
    and ignored — chains are a device axis, not processes.

    TPU-native extensions
    ---------------------
    sampler : "nuts" (default) or "chees" — ChEES-HMC runs every chain for
        the same jittered trajectory length (no max-over-chains tree
        straggler; ~2x ESS/sec at high chain counts).
    mass_adapt : "per_chain" (reference behavior) or "pooled" — pool the
        Welford mass statistics across chains each window (faster adaptation
        with many chains; SURVEY §7.4).
    step_adapt : "per_chain" (reference behavior) or "pooled" — one shared
        dual-averaging step size adapted against the cross-chain mean
        acceptance. At high chain counts the per-draw wall cost is the MAX
        tree size over chains; heterogeneous per-chain step sizes fatten
        that tail, a shared step size thins it.
    mass_matrix : "diag" (default) or "full" — pooled dense covariance
        (also selected by init="jitter+adapt_full"/"adapt_full").
    callback : callable, called after every SAMPLING CHUNK (not per draw —
        draws are produced by on-device scans) with keyword arguments
        draws_done, draws, chains, stats (the chunk's NutsStats arrays).
        Raising KeyboardInterrupt inside the callback stops sampling and
        returns the completed draws (reference mcmc.py:757 callback
        contract at chunk granularity).
    mesh : jax.sharding.Mesh — shard the chain axis across devices
        (pm.parallel.chain_mesh); draws are identical to the unsharded run.
    trace / resume / chunk_size : durable chunked trace streaming with
        crash-safe checkpoint/resume (backends.checkpoint.FileTrace).
    """
    model = modelcontext(model)
    if step_adapt not in ("per_chain", "pooled"):
        raise ValueError(
            f"step_adapt must be 'per_chain' or 'pooled', got {step_adapt!r}"
        )
    if step is not None:
        from .compound import sample_with_steps

        return sample_with_steps(
            draws=draws, tune=tune, chains=chains, model=model, step=step,
            random_seed=random_seed, discard_tuned_samples=discard_tuned_samples,
            compute_convergence_checks=compute_convergence_checks,
            idata_kwargs=idata_kwargs, progressbar=progressbar,
            initvals=initvals, return_inferencedata=return_inferencedata,
        )
    if model.discrete_value_vars:
        from .compound import sample_with_steps

        return sample_with_steps(
            draws=draws, tune=tune, chains=chains, model=model, step=None,
            random_seed=random_seed, discard_tuned_samples=discard_tuned_samples,
            compute_convergence_checks=compute_convergence_checks,
            idata_kwargs=idata_kwargs, progressbar=progressbar,
            initvals=initvals, return_inferencedata=return_inferencedata,
        )

    init = str(init)
    if init == "auto":
        init = "jitter+adapt_diag"
    if init not in SUPPORTED_INITS:
        raise ValueError(
            f"Unknown initializer: {init!r}. Valid: {sorted(SUPPORTED_INITS)}"
        )
    nuts_sampler = kwargs.pop("nuts_sampler", None)
    if nuts_sampler and str(nuts_sampler) not in ("pymc", "pymc_tpu"):
        # reference external-sampler delegation (mcmc.py:372-550): every
        # backend maps onto the native on-device sampler here
        _log.info(
            f"nuts_sampler={nuts_sampler!r} requested; using the native "
            "on-device sampler (numpyro/blackjax/nutpie are not needed on TPU)"
        )
    # Pallas leapfrog kernels are opt-in (nuts={"use_pallas": True}): the
    # measured TPU A/B (benchmarks/pallas_ab.py) shows plain XLA fusion of
    # the leapfrog chain is faster — see nuts_transition_batched docstring
    use_pallas = False
    if nuts:
        target_accept = nuts.get("target_accept", target_accept)
        max_treedepth = nuts.get("max_treedepth", max_treedepth)
        use_pallas = bool(nuts.get("use_pallas", False))
    if mass_matrix is None:
        mass_matrix = "full" if ("adapt_full" in init or init == "map") else "diag"
    full_mass = mass_matrix == "full"
    # static-potential inits: the reference builds a non-adapting
    # QuadPotentialDiag/Full for these (mcmc.py:1959-1989), so windowed mass
    # adaptation is disabled; grad_mass uses the continuous exp-weighted
    # grad-based estimator instead of windows (quadpotential.py:493).
    static_mass = init in ("advi", "advi_map", "map")
    grad_mass = init == "jitter+adapt_diag_grad"

    key = _resolve_seed(random_seed)
    k_init, k_eps, k_warm = jax.random.split(key, 3)

    info = model.raveled_info()
    D = info.total_size
    logp_dict_fn = model.logp_fn()

    def flat_logp(q):
        return logp_dict_fn(unravel_vector(q, info))

    logp_grad_fn = jax.value_and_grad(flat_logp)

    # ---- initial points (reference init_nuts :1759; jitter+adapt_diag default)
    t0 = time.perf_counter()
    advi_var = None
    map_cov = None
    if "advi" in init:
        # reference init="advi"/"advi+adapt_diag"/"advi_map" (mcmc.py:1913-1989):
        # fit mean-field ADVI (advi_map: started at the MAP point), draw the
        # chain starts from q, seed the diagonal mass with q's variances
        # (windowed adaptation then refines them for advi+adapt_diag; for
        # advi/advi_map the potential stays static as in QuadPotentialDiag)
        from ..variational import fit as vi_fit

        n_init = int(kwargs.pop("n_init", 10_000))
        seed_int = int(jax.random.randint(k_init, (), 0, 2**30))
        vi_start = None
        if init == "advi_map":
            from ..tuning.starting import find_MAP

            _log.info("Initializing NUTS with MAP-started ADVI...")
            map_pt = find_MAP(
                model=model, include_transformed=False, seed=seed_int,
                progressbar=False,
            )
            vi_start = {
                rv.name: map_pt[rv.name]
                for rv in model.free_RVs
                if rv.name in map_pt
            }
        _log.info(f"Initializing NUTS with ADVI ({n_init} iterations)...")
        approx = vi_fit(
            n=n_init, method="advi", model=model, start=vi_start,
            random_seed=seed_int,
            progressbar=progressbar,
        )
        q0 = approx.sample_q(approx.params, k_init, chains)  # (C, D) flat
        advi_var = jax.nn.softplus(approx.params["rho"]) ** 2  # (D,)
    elif init == "map":
        # reference init="map" (mcmc.py:1985-1989): all chains start at the
        # MAP point with a STATIC full potential from the Hessian there
        from ..tuning.starting import find_MAP, find_hessian

        _log.info("Initializing NUTS at the MAP point...")
        seed_int = int(jax.random.randint(k_init, (), 0, 2**30))
        map_pt = find_MAP(
            model=model, include_transformed=True, seed=seed_int,
            progressbar=False,
        )
        q_map = ravel_point(
            {n: jnp.asarray(map_pt[n]) for n in info.names}, info
        )
        q0 = jnp.tile(q_map[None, :], (chains, 1)).astype(floatX())
        prec = np.asarray(find_hessian(point=map_pt, model=model))  # -H(logp)
        # Sigma = inv(precision), regularized for non-PD Hessians away from
        # an interior optimum
        prec = 0.5 * (prec + prec.T)
        eigmin = float(np.linalg.eigvalsh(prec).min())
        if eigmin <= 1e-10:
            prec = prec + (1e-6 - min(eigmin, 0.0)) * np.eye(prec.shape[0])
        map_cov = jnp.asarray(np.linalg.inv(prec), dtype=floatX())
    else:
        jitter = 1.0 if init.startswith("jitter") else 0.0
        start_points = make_initial_points_per_chain(
            model, k_init, chains, jitter=jitter, overrides=initvals,
            logp_fn=logp_dict_fn, jitter_max_retries=jitter_max_retries,
        )
        q0 = jax.vmap(lambda pt: ravel_point(pt, info))(start_points)  # (C, D)
    logp0, grad0 = jax.jit(jax.vmap(logp_grad_fn))(q0)
    if not bool(np.all(np.isfinite(jax.device_get(logp0)))):
        bad = np.where(~np.isfinite(jax.device_get(logp0)))[0]
        from ..exceptions import SamplingError

        raise SamplingError(
            f"Initial evaluation of model at starting point failed for "
            f"chains {bad.tolist()}! Check model.debug() / point_logps()."
        )

    if full_mass:
        # Sigma estimate, pooled/shared (init="map": static Hessian inverse)
        inv_mass = map_cov if map_cov is not None else jnp.eye(D, dtype=floatX())
        eps_keys = jax.random.split(k_eps, chains)
        eps0 = jax.jit(
            jax.vmap(
                lambda q, lp, g, k: find_reasonable_step_size(
                    logp_grad_fn, q, lp, g, k, inv_mass
                )
            )
        )(q0, logp0, grad0, eps_keys)
        wf = welford_init(D, full=True, dtype=floatX())
    else:
        if advi_var is not None:
            inv_mass = jnp.broadcast_to(
                jnp.asarray(advi_var, floatX()), (chains, D)
            )
        else:
            inv_mass = jnp.ones((chains, D), dtype=floatX())
        eps_keys = jax.random.split(k_eps, chains)
        eps0 = jax.jit(
            jax.vmap(
                lambda q, lp, g, k, im: find_reasonable_step_size(
                    logp_grad_fn, q, lp, g, k, im
                )
            )
        )(q0, logp0, grad0, eps_keys, inv_mass)
        wf = jax.vmap(lambda _: welford_init(D, dtype=floatX()))(
            jnp.arange(chains)
        )

    if step_adapt == "pooled":
        # one shared step size: identical DA state per chain, updated with
        # the cross-chain mean acceptance below
        eps0 = jnp.broadcast_to(jnp.mean(eps0, keepdims=True), eps0.shape)
    da = jax.vmap(da_init)(eps0)

    if static_mass or grad_mass:
        # no windowed Welford adaptation: static potentials keep their seed;
        # grad_mass updates continuously via the exp-weighted estimator below
        upd_mass = jnp.zeros((tune,), dtype=bool)
        swi_mass = jnp.zeros((tune,), dtype=bool)
    else:
        schedule = build_schedule(tune)
        upd_mass = jnp.asarray(schedule["update_mass"])
        swi_mass = jnp.asarray(schedule["switch_mass"])

    # Batched NUTS: the chain axis is explicit (C, D), so the leapfrog
    # bandwidth chain runs through the fused Pallas TPU kernels and full-mass
    # velocities are one MXU matmul; draws are bit-identical to the vmapped
    # scalar kernel (tests/sampling/test_nuts_batched.py).
    batched_transition = partial(
        nuts_transition_batched,
        logp_grad_fn,
        max_treedepth=max_treedepth,
        max_energy_error=1000.0,
        full_mass=full_mass,
        use_pallas=use_pallas,
    )
    chain_idx = jnp.arange(chains)

    if str(sampler).lower() not in ("nuts", "chees"):
        raise ValueError(
            f"Unknown sampler {sampler!r}: expected 'nuts' or 'chees'"
        )
    use_chees = str(sampler).lower() == "chees"
    if use_chees:
        from .chees import CheesState, chees_step, halton_sequence

        halton = jnp.asarray(
            halton_sequence(tune + draws) * 0.9 + 0.1, dtype=floatX()
        )
        # start T at ~16 leapfrog steps of the found step size; adaptation
        # grows it (a fixed T=1.0 with a tiny eps would mean max_leapfrogs
        # leapfrogs per draw during early warmup)
        chees_extra0 = (
            jnp.log(16.0 * jnp.mean(eps0)).astype(floatX()),
            jnp.zeros((), floatX()),
            jnp.zeros((), floatX()),
            jnp.zeros((), floatX()),
        )
    else:
        chees_extra0 = (
            jnp.zeros((), floatX()),
        ) * 4

    def chain_keys(step_key):
        return jax.vmap(lambda i: jax.random.fold_in(step_key, i))(chain_idx)

    def step(carry, xs):
        """One draw for warmup AND sampling (adaptation gated by traced flags
        so the sampler program compiles exactly once)."""
        step_i, do_update, do_switch, is_warmup = xs
        q, logp, grad, da, wf, inv_mass, chees_extra, ew = carry
        step_size = jnp.where(
            is_warmup, jnp.exp(da.log_step), jnp.exp(da.log_step_avg)
        )
        if use_chees:
            st = CheesState(q, logp, grad, *chees_extra)
            st, ch = chees_step(
                logp_grad_fn, jax.random.fold_in(k_warm, step_i), st,
                step_size, inv_mass, halton[step_i], adapt_T=is_warmup,
                # tighter cap than NUTS max tree size: the ChEES criterion
                # gradient is weakly positive far past the optimum on some
                # targets (resonance aliasing) and Adam's normalized steps
                # would otherwise drift T to the bound
                max_leapfrogs=2 ** max(max_treedepth - 2, 4),
                full_mass=full_mass,
            )
            q, logp, grad = st.q, st.logp, st.grad
            chees_extra = (st.log_T, st.adam_m, st.adam_v, st.adam_t)
            eerr = jnp.where(ch["accepted"], 0.0, -jnp.log(
                jnp.clip(ch["acceptance_rate"], 1e-30, 1.0)
            ))
            stats = NutsStats(
                depth=jnp.ceil(jnp.log2(ch["n_steps"].astype(floatX()) + 1.0)
                               ).astype(jnp.int32),
                n_steps=ch["n_steps"].astype(jnp.int32),
                diverging=ch["diverging"],
                energy=ch["energy"],
                energy_error=eerr,
                max_energy_error=eerr,
                acceptance_rate=ch["acceptance_rate"],
                lp=ch["lp"],
            )
        else:
            keys = chain_keys(jax.random.fold_in(k_warm, step_i))
            (q, logp, grad), stats = batched_transition(
                keys, q, logp, grad, step_size, inv_mass
            )
        # NaN acceptance (fully diverged trajectory) counts as a rejection —
        # clip propagates NaN, which would permanently poison the DA state
        # (one chain's state in per-chain mode; EVERY chain's under pooling)
        accept = jnp.clip(stats.acceptance_rate, 0.0, 1.0)
        accept = jnp.where(jnp.isfinite(accept), accept, 0.0)
        if step_adapt == "pooled":
            accept = jnp.broadcast_to(
                jnp.mean(accept, keepdims=True), accept.shape
            )
        da_new = jax.vmap(lambda d, a: da_update(d, a, target_accept))(da, accept)
        da = jax.tree.map(
            lambda new, old: jnp.where(_bcast(is_warmup, new), new, old),
            da_new, da,
        )
        if grad_mass:
            # init="jitter+adapt_diag_grad": continuous exp-weighted variance
            # of draws AND grads, inv_mass = sqrt(var_q/var_grad), applied
            # every warmup step after a 2x50-draw discard window (reference
            # QuadPotentialDiagAdaptExp, quadpotential.py:493-580)
            from .adaptation import expw_inv_mass, expw_seed, expw_update

            disc = 50
            stop_adapt = (tune - 50) if tune > 250 else tune + 1
            at_seed = jnp.logical_and(step_i == disc, is_warmup)
            seeded = expw_seed(q, grad)
            ew = jax.tree.map(
                lambda s, o: jnp.where(_bcast(at_seed, s), s, o), seeded, ew
            )
            in_win = (step_i > disc) & (step_i < stop_adapt) & is_warmup
            ew_new = expw_update(ew, q, grad)
            ew = jax.tree.map(
                lambda n, o: jnp.where(_bcast(in_win, n), n, o), ew_new, ew
            )
            apply_mass = jnp.logical_and(step_i > 2 * disc, is_warmup)
            inv_mass = jnp.where(
                _bcast(apply_mass, inv_mass), expw_inv_mass(ew), inv_mass
            )
        elif static_mass:
            pass  # potential fixed by the init (advi/advi_map/map)
        elif full_mass:
            from .adaptation import welford_covariance, welford_update_batch

            wf_new = welford_update_batch(wf, q)
            wf = jax.tree.map(
                lambda new, old: jnp.where(_bcast(do_update, new), new, old),
                wf_new, wf,
            )
            new_inv = welford_covariance(wf)
            inv_mass = jnp.where(_bcast(do_switch, inv_mass), new_inv, inv_mass)
            wf_reset = welford_init(D, full=True, dtype=floatX())
            wf = jax.tree.map(
                lambda res, old: jnp.where(_bcast(do_switch, res), res, old),
                wf_reset, wf,
            )
        else:
            wf_new = jax.vmap(welford_update)(wf, q)
            wf = jax.tree.map(
                lambda new, old: jnp.where(_bcast(do_update, new), new, old),
                wf_new, wf,
            )
            # window switch: adopt variance estimate, reset welford + step size
            new_inv = jax.vmap(welford_variance)(wf)
            if mass_adapt == "pooled":
                new_inv = jnp.broadcast_to(
                    jnp.mean(new_inv, axis=0, keepdims=True), new_inv.shape
                )
            inv_mass = jnp.where(_bcast(do_switch, inv_mass), new_inv, inv_mass)
            wf_reset = jax.vmap(lambda _: welford_init(D, dtype=floatX()))(chain_idx)
            wf = jax.tree.map(
                lambda res, old: jnp.where(_bcast(do_switch, res), res, old),
                wf_reset, wf,
            )
        da_res = jax.vmap(da_restart)(da)
        da = jax.tree.map(
            lambda res, old: jnp.where(_bcast(do_switch, res), res, old),
            da_res, da,
        )
        carry = (q, logp, grad, da, wf, inv_mass, chees_extra, ew)
        return carry, (q, stats, step_size)

    scan_fn = jax.jit(lambda c, xs: lax.scan(step, c, xs))

    # Compile-memoizing chunk runner. The xs leading dim (chunk length) is
    # baked into each compiled scan, so every distinct length is a separate
    # XLA program; chunk lengths below are quantized to powers of two so the
    # set stays small and repeatable run-to-run, which makes the persistent
    # compilation cache effective: a repeat process run hits disk for every
    # shape instead of the (20-400 s, wildly variable) remote TPU compile
    # service. AOT lower+compile also lets sampling-length programs be built
    # BEFORE the timed sampling region (they used to compile inside it).
    compiled_chunks = {}
    compile_s = [0.0]

    def scan_chunk(c, xs, precompile_only=False):
        L = int(xs[0].shape[0])
        ex = compiled_chunks.get(L)
        if ex is None:
            tc = time.perf_counter()
            ex = scan_fn.lower(c, xs).compile()
            compile_s[0] += time.perf_counter() - tc
            compiled_chunks[L] = ex
        if precompile_only:
            return None
        return ex(c, xs)

    _log.info(
        f"NUTS warmup: {tune} steps, {chains} chains, {D} parameters "
        f"(init={init}, target_accept={target_accept})"
    )
    if grad_mass:
        from .adaptation import expw_init

        ew0 = expw_init((chains, D), dtype=floatX())
    else:
        ew0 = ()
    carry = (q0, logp0, grad0, da, wf, inv_mass, chees_extra0, ew0)

    # ---- multi-chip: shard the chain axis over a device mesh (replaces the
    # reference's process-per-chain executor; SURVEY §2.7 TPU mapping). The
    # jitted scan propagates the sharding; pooled-mass means become ICI
    # collectives automatically.
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        chain_axis = mesh.axis_names[0]
        if chains % mesh.devices.size != 0:
            raise ValueError(
                f"chains ({chains}) must be divisible by the mesh size "
                f"({mesh.devices.size})"
            )

        def shard_leaf(x):
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == chains:
                spec = P(chain_axis, *([None] * (x.ndim - 1)))
                return jax.device_put(x, NamedSharding(mesh, spec))
            return x

        carry = jax.tree.map(shard_leaf, carry)

    # ---- multi-controller trace sharding: every process streams its own
    # chain block into one shared store (replaces the reference's per-chain
    # draw pipes + main-process trace.record, parallel.py:295-328)
    if (
        trace is not None
        and mesh is not None
        and jax.process_count() > 1
        and hasattr(trace, "set_chain_layout")
        and not getattr(carry[0], "is_fully_addressable", True)
    ):
        starts = sorted({
            s.index[0].start or 0 for s in carry[0].addressable_shards
        })
        local = chains // jax.process_count()
        trace.set_chain_layout(starts[0], chains, local)

    # ---- resume from a durable trace (reference ZarrTrace semantics, §5.4)
    draws_done = 0
    if trace is not None and resume:
        saved = trace.load_state(carry)
        meta = trace.read_meta()
        if saved is not None and meta is not None:
            carry = saved
            draws_done = int(meta.get("draws_done", 0))
            _log.info(f"Resuming from {draws_done} stored draws")
    warmup_needed = draws_done == 0

    # memory-aware chunk size: a chunk's stacked draws (chunk, C, D) must
    # not exhaust HBM at large D (the 10k-param x 1024-chain regime).
    # Traceless runs prefer FEW LARGE chunks (each chunk boundary costs a
    # tunnel round-trip); streaming-trace runs keep chunks small so draws
    # reach disk steadily.
    budget_bytes = 1_500_000_000
    auto_cap = 200 if trace is not None else 1024
    auto_chunk = max(1, min(auto_cap, budget_bytes // max(chains * D * 4, 1)))
    chunk = int(chunk_size) if chunk_size else max(1, min(draws, auto_chunk))

    # duration-aware WARMUP chunk: early warmup explores large step sizes,
    # so trees hit max depth and one draw can cost 2^max_treedepth gradient
    # evaluations; a single scan call must stay well under the device/tunnel
    # per-call limit (observed: multi-minute kernels get killed UNAVAILABLE
    # on expensive models like 150-point GP logps). Calibrate with one
    # (already-compiled) blocked gradient evaluation.
    if chunk_size:
        warm_chunk = chunk
    else:
        # amortize the host<->device round-trip over 10 queued executions
        # (a single blocked call would over-estimate cheap gradients by the
        # transport RTT and shrink warmup chunks absurdly)
        _vg = jax.jit(jax.vmap(logp_grad_fn))
        jax.block_until_ready(_vg(q0))  # compiled above; warm anyway
        _tg0 = time.perf_counter()
        _out = None
        for _ in range(10):
            _out = _vg(q0)
        jax.block_until_ready(_out)
        t_grad = max((time.perf_counter() - _tg0) / 10.0, 1e-5)
        worst_leapfrogs = 2 ** min(max_treedepth, 10)
        warm_chunk = _pow2_floor(
            np.clip(30.0 / (t_grad * worst_leapfrogs), 1, chunk)
        )

    from .progress import ProgressManager
    pm_bar = ProgressManager(
        draws - draws_done, chains,
        tune=(tune if warmup_needed and discard_tuned_samples else 0),
        enabled=progressbar,
    )

    # ---- warmup: chunked so the stacked (chunk, C, D) buffers are freed
    # between chunks (a single tune-length scan OOMs at large D)
    warm_out = None
    if warmup_needed and tune > 0:
        if discard_tuned_samples:
            w = 0
            t_perdraw = None
            while w < tune:
                mw = min(warm_chunk, tune - w)
                warm_xs = (
                    jnp.arange(w, w + mw, dtype=jnp.int32),
                    upd_mass[w : w + mw], swi_mass[w : w + mw],
                    jnp.ones((mw,), dtype=bool),
                )
                _tc = time.perf_counter()
                _cs0 = compile_s[0]
                carry, (_, wstats_c, wss_c) = scan_chunk(carry, warm_xs)
                # tiny on-device chunk summary -> ONE host transfer: live
                # warmup feedback (reference progress stat columns)
                # per-chain columns packed into ONE (4, C) device array so
                # the live rows cost a single host transfer per chunk
                summ = jnp.stack([
                    wstats_c.diverging.sum(axis=0).astype(floatX()),
                    wstats_c.depth.astype(floatX()).mean(axis=0),
                    jnp.clip(wstats_c.acceptance_rate, 0.0, 1.0).mean(axis=0),
                    wss_c.mean(axis=0).astype(floatX()),
                ])
                del wstats_c, wss_c
                # block per chunk: warmup is serial anyway (carry feeds the
                # next call) and the timing of the LAST chunk calibrates the
                # sampling chunk size below
                jax.block_until_ready(carry)
                # exclude synchronous compile (a fresh chunk length compiles
                # here) — a compile-inflated t_perdraw used to shrink the
                # sampling chunk to a sliver and multiply tunnel round-trips
                # in the measured sampling region
                t_perdraw = (
                    time.perf_counter() - _tc - (compile_s[0] - _cs0)
                ) / mw
                s_np = _fetch_host(summ, 1)  # (4, C) — C local if multihost
                pm_bar.update_warmup(
                    mw, divergences=int(s_np[0].sum()),
                    depth=float(s_np[1].mean()),
                    accept=float(s_np[2].mean()),
                    step_size=float(s_np[3].mean()),
                    chain_stats={
                        "div": s_np[0], "depth": s_np[1],
                        "accept": s_np[2], "step": s_np[3],
                    },
                )
                w += mw
        else:
            tru = jnp.ones((tune,), dtype=bool)
            warm_xs = (jnp.arange(tune, dtype=jnp.int32), upd_mass, swi_mass, tru)
            carry, warm_out = scan_chunk(carry, warm_xs)

    # duration-aware SAMPLING chunk: one scan call must finish inside the
    # device/tunnel per-call limit; the last (step-size-adapted) warmup
    # chunk's per-draw wall time predicts sampling cost. The first chunk of
    # a run includes compile, so warmup timing (already compiled) is the
    # right probe.
    if not chunk_size and warmup_needed and tune > 0 and discard_tuned_samples:
        if t_perdraw is not None and t_perdraw > 0 and 45.0 / t_perdraw < chunk:
            chunk = _pow2_floor(max(45.0 / t_perdraw, 1.0))

    # precompile every sampling chunk length BEFORE the timed region: the
    # first call of each length used to compile synchronously inside the
    # measured sampling wall (20-400 s remote compile variance landed
    # straight in the ESS/sec denominator)
    _lens, _j = [], draws_done
    while _j < draws:
        _m = min(chunk, draws - _j)
        if _m not in _lens:
            _lens.append(_m)
        _j += _m
    for _L in _lens:
        _fls = jnp.zeros((_L,), dtype=bool)
        scan_chunk(
            carry,
            (jnp.arange(_L, dtype=jnp.int32), _fls, _fls, _fls),
            precompile_only=True,
        )

    # ---- sampling: chunked scans (progress + durable trace streaming)
    q_chunks, stat_chunks, ss_chunks = [], [], []
    t1 = time.perf_counter()
    i = draws_done
    def _materialize(pend):
        """Device chunk -> host stats (+ optional durable write). The raw q
        draws only cross the tunnel when a durable trace needs the bytes —
        otherwise they stay on device for the fused postprocess."""
        q_c, packed_c, i0, m0, carry_c = pend
        # keep draws device-resident only when the TOTAL stays small; large
        # runs stream each chunk to the host here, overlapped with the next
        # chunk's device compute (one big end-of-run transfer would stall).
        # Multi-controller meshes always materialize (each process gets its
        # local chain shard; the device arrays are not fully addressable).
        keep_on_device = (
            trace is None
            and getattr(q_c, "is_fully_addressable", True)
            and (draws * chains * D * 4 <= 400_000_000
                 or var_names is not None)
        )
        q_np = q_c if keep_on_device else _fetch_host(q_c, 1)
        packed_np = _fetch_host(packed_c, 1)
        stats_np = NutsStats(
            *[packed_np[..., j] for j in range(len(NutsStats._fields))]
        )
        stats_np = stats_np._replace(
            depth=stats_np.depth.astype(np.int32),
            n_steps=stats_np.n_steps.astype(np.int32),
            diverging=stats_np.diverging.astype(bool),
        )
        q_chunks.append(q_np)
        stat_chunks.append(stats_np)
        ss_chunks.append(packed_np[..., -1])
        if trace is not None:
            trace.write_chunk(q_np, stats_np._asdict())
            trace.save_state(carry_c)
            trace.write_meta({
                "draws_done": i0 + m0, "tune": tune, "chains": chains, "D": D,
            })
        pm_bar.update(
            m0,
            divergences=int(stats_np.diverging.sum()),
            depth=float(stats_np.depth.mean()),
            accept=float(np.clip(stats_np.acceptance_rate, 0, 1).mean()),
            step_size=float(packed_np[..., -1].mean()),
            chain_stats={
                "div": stats_np.diverging.sum(axis=0),
                "depth": stats_np.depth.mean(axis=0),
                "accept": np.clip(stats_np.acceptance_rate, 0, 1).mean(axis=0),
                "step": packed_np[..., -1].mean(axis=0),
            },
        )
        if callback is not None:
            # KeyboardInterrupt raised here lands in the partial-trace
            # handler below — the user-facing stop mechanism
            callback(draws_done=i0 + m0, draws=draws, chains=chains,
                     stats=stats_np)

    pending = None
    interrupted = False
    try:
        while i < draws:
            m = min(chunk, draws - i)
            fls = jnp.zeros((m,), dtype=bool)
            xs = (
                jnp.arange(tune + i, tune + i + m, dtype=jnp.int32),
                fls, fls, fls,
            )
            carry, (q_c, stats_c, ss_c) = scan_chunk(carry, xs)  # async dispatch
            # pack stats + step size into ONE device array per chunk (each
            # device_get is a host round-trip over the TPU tunnel)
            packed = jnp.concatenate(
                [jnp.asarray(v, floatX())[..., None] for v in stats_c]
                + [jnp.asarray(ss_c, floatX())[..., None]],
                axis=-1,
            )
            # materialize the PREVIOUS chunk while this one computes on-device
            if pending is not None:
                prev, pending = pending, None
                _materialize(prev)
            pending = (q_c, packed, i, m, carry)
            i += m
        if pending is not None:
            prev, pending = pending, None
            _materialize(prev)
    except KeyboardInterrupt:
        # reference behavior (sampling/mcmc.py:1688): return the draws
        # completed so far instead of discarding the run
        interrupted = True
        if pending is not None:
            prev, pending = pending, None
            try:
                _materialize(prev)
            except KeyboardInterrupt:
                pass
        if not q_chunks:
            raise
        _log.warning(
            f"Sampling interrupted; returning "
            f"{sum(c.shape[0] for c in q_chunks)} completed draws"
        )
    pm_bar.close()
    t2 = time.perf_counter()

    if trace is not None and resume and draws_done > 0:
        # include previously persisted draws in the returned idata
        q_all, stats_all = trace.read_draws()
        q_draws = q_all
        stats = NutsStats(**{
            k: stats_all[k] for k in NutsStats._fields
        })
    else:
        if isinstance(q_chunks[0], np.ndarray):
            q_draws = np.concatenate(q_chunks, axis=0)
        else:
            # device-resident chunks: leave UNSTACKED — at 10k params the
            # stacked copy doubles HBM use and OOMs; _package streams the
            # list chunk by chunk
            q_draws = q_chunks
        stats = NutsStats(*[
            np.concatenate([getattr(c, f) for c in stat_chunks], axis=0)
            for f in NutsStats._fields
        ])
    da = carry[3]
    step_size_final = jnp.exp(da.log_step_avg)
    _log.info(
        f"Sampling {draws} draws x {chains} chains took {t2 - t1:.2f}s "
        f"(+{t1 - t0:.2f}s warmup+compile)"
    )

    idata = _package(
        model,
        info,
        q_draws,
        stats,
        step_size_final,
        var_names=var_names,
        warmup=(None if discard_tuned_samples else warm_out),
        idata_kwargs=idata_kwargs,
        max_treedepth=max_treedepth,
        sampling_time=t2 - t1,
        tuning_time=t1 - t0,
        compile_time=compile_s[0],
    )

    if compute_convergence_checks and not interrupted:
        warns = run_convergence_checks(idata, model)
        log_warnings(warns)

    if trace is not None and hasattr(trace, "write_inference_data"):
        # ZarrTrace finalization: persist the named constrained groups so
        # the store is externally readable (reference ZarrTrace layout)
        trace.write_inference_data(idata)

    if not return_inferencedata:
        # reference parity (mcmc.py return_inferencedata=False -> MultiTrace)
        from ..backends.base import multitrace_from_idata

        return multitrace_from_idata(idata)
    return idata


def _bcast(flag, arr):
    """Broadcast a scalar bool against an array's leading axes."""
    return jnp.reshape(flag, (1,) * arr.ndim)


def _fetch_host(x, chain_axis):
    """Device -> host numpy. Under a MULTI-CONTROLLER mesh (jax.distributed,
    one global mesh spanning processes) only this process's chain shards are
    addressable, so each process materializes its own chains, concatenated in
    global chain order — the multi-host replacement for the reference's
    process-per-chain draw pipes (pymc/sampling/parallel.py:295-328; SURVEY
    §2.14.8). Fully-addressable arrays take the ordinary transfer path."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(jax.device_get(x))
    if x.ndim == 0 or getattr(x, "is_fully_replicated", False):
        return np.asarray(jax.device_get(x.addressable_shards[0].data))
    by_start = {}
    for s in x.addressable_shards:
        idx = s.index[chain_axis]
        by_start.setdefault(idx.start or 0, s)
    parts = [
        np.asarray(jax.device_get(by_start[k].data))
        for k in sorted(by_start)
    ]
    return np.concatenate(parts, axis=chain_axis)


def _pow2_floor(n):
    """Largest power of two <= n (>= 1). Timing-derived chunk sizes are
    quantized through this so the set of compiled scan lengths is small and
    stable across runs (each length is a distinct XLA program)."""
    n = int(n)
    return 1 << (n.bit_length() - 1) if n >= 1 else 1


def init_nuts(init="jitter+adapt_diag", chains=1, random_seed=None, model=None,
              initvals=None, **kwargs):
    """Reference-compatible helper (mcmc.py:1759): resolves the init strategy
    to actual per-chain starting points (batched {value_name: (chains, ...)})
    plus the resolved strategy string. Unknown strategies raise ValueError;
    advi*/map strategies really run ADVI / MAP optimization."""
    init = str(init)
    if init == "auto":
        init = "jitter+adapt_diag"
    if init not in SUPPORTED_INITS:
        raise ValueError(
            f"Unknown initializer: {init!r}. Valid: {sorted(SUPPORTED_INITS)}"
        )
    model = modelcontext(model)
    key = _resolve_seed(random_seed)
    info = model.raveled_info()
    if "advi" in init:
        from ..variational import fit as vi_fit

        n_init = int(kwargs.get("n_init", 10_000))
        seed_int = int(jax.random.randint(key, (), 0, 2**30))
        start = None
        if init == "advi_map":
            from ..tuning.starting import find_MAP

            mp = find_MAP(model=model, include_transformed=False,
                          seed=seed_int, progressbar=False)
            start = {
                rv.name: mp[rv.name]
                for rv in model.free_RVs if rv.name in mp
            }
        approx = vi_fit(n=n_init, method="advi", model=model, start=start,
                        random_seed=seed_int, progressbar=False)
        q0 = approx.sample_q(approx.params, key, chains)
        pts = jax.vmap(lambda q: unravel_vector(q, info))(q0)
    elif init == "map":
        from ..tuning.starting import find_MAP

        seed_int = int(jax.random.randint(key, (), 0, 2**30))
        mp = find_MAP(model=model, include_transformed=True, seed=seed_int,
                      progressbar=False)
        pts = {
            n: jnp.tile(
                jnp.asarray(mp[n], floatX())[None, ...], (chains,) + (1,) * np.ndim(mp[n])
            )
            for n in info.names
        }
    else:
        jitter = 1.0 if init.startswith("jitter") else 0.0
        pts = make_initial_points_per_chain(
            model, key, chains, jitter=jitter, overrides=initvals,
        )
    return pts, init


def _package(
    model, info, q_draws, stats, step_size, var_names=None, warmup=None,
    idata_kwargs=None, max_treedepth=10, sampling_time=None, tuning_time=None,
    compile_time=None,
):
    """(draws, chains, D) unconstrained draws -> InferenceData with posterior
    (constrained + deterministics), sample_stats, observed/constant data."""
    idata_kwargs = dict(idata_kwargs or {})
    # q_draws: (S, C, D) array, OR a list of (m_i, C, D) device chunks (the
    # huge-model path — stacking them on device would double HBM use)
    q_parts = q_draws if isinstance(q_draws, list) else [q_draws]
    S = sum(int(p.shape[0]) for p in q_parts)
    C, D = int(q_parts[0].shape[1]), int(q_parts[0].shape[2])

    post_fn = _make_postprocess_fn(model, info)

    # pack ALL postprocessed variables into one flat array so each chunk
    # costs ONE host transfer (tunnel round-trips dominate otherwise)
    in_dtype = jnp.result_type(q_parts[0].dtype)
    out_shapes = jax.eval_shape(post_fn, jax.ShapeDtypeStruct((D,), in_dtype))
    layout = [(n, tuple(v.shape)) for n, v in out_shapes.items()]
    if var_names is not None:
        wanted = set(var_names)
        known = {n for n, _ in layout}
        unknown = wanted - known
        if unknown:
            _log.warning(
                f"var_names {sorted(unknown)} not found in the model "
                f"(available: {sorted(known)}); they will be omitted"
            )
        layout = [(n, sh) for n, sh in layout if n in wanted]

    def post_packed(q):
        out = post_fn(q)
        parts = [jnp.ravel(jnp.asarray(out[n], floatX())) for n, _ in layout]
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), floatX())

    pfn = jax.jit(jax.vmap(post_packed))
    chunk = 65536
    packed_rows = []
    on_device = not isinstance(q_parts[0], np.ndarray)
    if on_device and var_names is not None:
        # subset requested and draws still on the sampling device: pack and
        # select THERE, chunk by chunk, so only the selected variables cross
        # the (slow) host link — the huge-model path
        for part in q_parts:
            rows = int(part.shape[0]) * C
            flat_p = part.reshape(rows, D)
            for i in range(0, rows, chunk):
                packed_rows.append(
                    np.asarray(jax.device_get(pfn(flat_p[i : i + chunk])))
                )
    else:
        # postprocess on the HOST cpu backend: transforms/deterministics are
        # cheap elementwise work, the full posterior must reach the host
        # anyway, and this avoids one more (remote, slow) TPU compile.
        # Under a multi-controller mesh jax.devices() spans processes — the
        # postprocess must run on a device THIS process owns.
        try:
            cpu_dev = jax.local_devices(backend="cpu")[0]
        except Exception:
            cpu_dev = jax.devices("cpu")[0]
        with jax.default_device(cpu_dev):
            for part in q_parts:
                part_np = (
                    part if isinstance(part, np.ndarray)
                    else np.asarray(jax.device_get(part))
                )
                rows = part_np.shape[0] * C
                flat_p = part_np.reshape(rows, D)
                for i in range(0, rows, chunk):
                    packed_rows.append(
                        np.asarray(jax.device_get(pfn(flat_p[i : i + chunk])))
                    )
    packed_all = np.concatenate(packed_rows, axis=0)  # (S*C, total)
    posterior = {}
    off = 0
    for n, shape in layout:
        size = int(np.prod(shape)) if shape else 1
        vals = packed_all[:, off : off + size].reshape((S, C) + shape)
        posterior[n] = vals.swapaxes(0, 1)
        off += size

    stat_arrays = {
        "tree_depth": np.asarray(jax.device_get(stats.depth)).swapaxes(0, 1),
        "n_steps": np.asarray(jax.device_get(stats.n_steps)).swapaxes(0, 1),
        "diverging": np.asarray(jax.device_get(stats.diverging)).swapaxes(0, 1),
        "energy": np.asarray(jax.device_get(stats.energy)).swapaxes(0, 1),
        "energy_error": np.asarray(jax.device_get(stats.energy_error)).swapaxes(0, 1),
        "max_energy_error": np.asarray(
            jax.device_get(stats.max_energy_error)
        ).swapaxes(0, 1),
        "acceptance_rate": np.asarray(
            jax.device_get(stats.acceptance_rate)
        ).swapaxes(0, 1),
        "lp": np.asarray(jax.device_get(stats.lp)).swapaxes(0, 1),
    }
    ss = _fetch_host(step_size, 0)
    stat_arrays["step_size"] = np.broadcast_to(ss[:, None], (C, S)).copy()

    warmup_groups = {}
    if warmup is not None:
        wq, wstats, wss = warmup
        Wn = wq.shape[0]
        wflat = np.asarray(jax.device_get(wq)).reshape(Wn * C, D)
        wpacked = []
        cpu_dev = jax.devices("cpu")[0]
        with jax.default_device(cpu_dev):
            for i in range(0, Wn * C, chunk):
                wpacked.append(
                    np.asarray(jax.device_get(pfn(wflat[i : i + chunk])))
                )
        wpacked = np.concatenate(wpacked, axis=0)
        wp = {}
        off = 0
        for n, shape in layout:
            size = int(np.prod(shape)) if shape else 1
            wp[n] = (
                wpacked[:, off : off + size].reshape((Wn, C) + shape)
                .swapaxes(0, 1)
            )
            off += size
        warmup_groups["warmup_posterior"] = wp
        warmup_groups["warmup_sample_stats"] = {
            "tree_depth": np.asarray(jax.device_get(wstats.depth)).swapaxes(0, 1),
            "diverging": np.asarray(jax.device_get(wstats.diverging)).swapaxes(0, 1),
            "acceptance_rate": np.asarray(
                jax.device_get(wstats.acceptance_rate)
            ).swapaxes(0, 1),
            "lp": np.asarray(jax.device_get(wstats.lp)).swapaxes(0, 1),
            "step_size": np.asarray(jax.device_get(wss)).swapaxes(0, 1),
        }

    idata = to_inference_data(
        model,
        posterior=posterior,
        sample_stats=stat_arrays,
        warmup_groups=warmup_groups,
        attrs={
            "max_treedepth": max_treedepth,
            "sampling_time": sampling_time,
            "tuning_time": tuning_time,
            "compile_time": compile_time,
            "inference_library": "pymc_tpu",
        },
        include_log_likelihood=idata_kwargs.get("log_likelihood", False),
    )
    return idata


def _make_postprocess_fn(model, info):
    """Build fn(q_flat) -> {name: constrained value} incl. deterministics —
    the reference's _postprocess_samples (sampling/jax.py:151-183)."""
    free_RVs = list(model.free_RVs)
    deterministics = list(model.deterministics)

    def post(q):
        vals = unravel_vector(q, info)
        env = {}
        out = {}
        for rv in free_RVs:
            v = vals[rv.value_name]
            x = rv.transform.backward(v, env) if rv.transform is not None else v
            env[rv.name] = x
            out[rv.name] = x
        memo = {}
        from ..graph import evaluate

        for det in deterministics:
            out[det.name] = evaluate(det, env, memo)
        return out

    return post
