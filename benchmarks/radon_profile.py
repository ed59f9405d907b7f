"""Decompose the radon-bench draw cost: gradient eval vs full NUTS step.

    python benchmarks/radon_profile.py [chains]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main(chains=1024):
    import pymc_tpu as pm
    from pymc_tpu.blocking import ravel_point, unravel_vector
    from pymc_tpu.initial_point import make_initial_points_per_chain
    from pymc_tpu.sampling.nuts import nuts_transition_batched
    sys.path.insert(0, ".")
    from bench import build_model

    model = build_model(pm)
    info = model.raveled_info()
    logp_dict = model.logp_fn()

    def flat_logp(q):
        return logp_dict(unravel_vector(q, info))

    logp_grad = jax.value_and_grad(flat_logp)
    key = jax.random.PRNGKey(0)
    pts = make_initial_points_per_chain(model, key, chains, jitter=1.0,
                                        logp_fn=logp_dict)
    q0 = jax.vmap(lambda p: ravel_point(p, info))(pts)
    D = q0.shape[1]
    logp0, grad0 = jax.jit(jax.vmap(logp_grad))(q0)
    jax.block_until_ready((logp0, grad0))

    out = {"chains": chains, "D": D, "backend": jax.default_backend()}

    # (a) raw batched gradient eval
    vg = jax.jit(jax.vmap(logp_grad))
    jax.block_until_ready(vg(q0))
    t0 = time.perf_counter()
    r = None
    for _ in range(30):
        r = vg(q0)
    jax.block_until_ready(r)
    out["grad_eval_us"] = round((time.perf_counter() - t0) / 30 * 1e6, 1)

    # (b) a scan of full NUTS transitions at a realistic adapted step size
    keys = jax.random.split(jax.random.PRNGKey(1), chains)
    ss = jnp.full((chains,), 0.25, q0.dtype)
    im = jnp.ones((chains, D), q0.dtype)

    def run(n):
        def step(carry, i):
            q, l, g = carry
            ks = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
            (q, l, g), st = nuts_transition_batched(
                logp_grad, ks, q, l, g, ss, im, max_treedepth=10
            )
            return (q, l, g), (st.n_steps, st.depth)

        return jax.lax.scan(step, (q0, logp0, grad0), jnp.arange(n))

    runj = jax.jit(lambda: run(20))
    (carry, (nsteps, depth)) = runj()
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    (carry, (nsteps, depth)) = runj()
    jax.block_until_ready(carry)
    dt = time.perf_counter() - t0
    ns = np.asarray(nsteps)
    out["nuts_20draws_s"] = round(dt, 3)
    out["mean_tree_leaves"] = round(float(ns.mean()), 1)
    out["max_tree_leaves"] = int(ns.max())
    # per-draw cost = dt/20; leapfrogs the device actually executes per draw
    # is the MAX over chains (lock-step masking)
    max_per_draw = ns.max(axis=1) if ns.ndim == 2 else ns
    out["device_leapfrogs_per_draw_max"] = round(float(np.mean(ns.max(axis=-1))), 1)
    out["us_per_device_leapfrog"] = round(
        dt / 20 / max(float(np.mean(ns.max(axis=-1))), 1) * 1e6, 1
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
