"""A/B benchmark: Pallas leapfrog kernels ON vs OFF in the batched NUTS.

Leapfrog-bound config (cheap iid-normal logp, aligned shapes C%8==0,
D%128==0 so the kernels actually fire). Run on TPU:

    python benchmarks/pallas_ab.py [C] [D] [steps]

Prints one JSON line with both times and the speedup.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pymc_tpu.sampling.nuts import nuts_transition_batched


def main(C=1024, D=256, steps=200):
    dtype = jnp.float32

    def logp_fn(q):
        return -0.5 * jnp.sum(q * q)

    logp_grad = jax.value_and_grad(logp_fn)

    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(C, D)), dtype)
    logp0, grad0 = jax.vmap(logp_grad)(q0)
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    ss = jnp.full((C,), 0.5, dtype)
    im = jnp.ones((C, D), dtype)

    def make_run(use_pallas):
        def step(carry, i):
            q, l, g = carry
            ks = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
            (q, l, g), st = nuts_transition_batched(
                logp_grad, ks, q, l, g, ss, im, max_treedepth=6,
                use_pallas=use_pallas,
            )
            return (q, l, g), st.n_steps

        return jax.jit(
            lambda: jax.lax.scan(step, (q0, logp0, grad0), jnp.arange(steps))
        )

    out = {"C": C, "D": D, "steps": steps,
           "backend": jax.default_backend()}
    for name, flag in (("pallas_on", True), ("pallas_off", False)):
        run = make_run(flag)
        (carry, nsteps) = run()  # compile + run once
        jax.block_until_ready(carry)
        t0 = time.perf_counter()
        (carry, nsteps) = run()
        jax.block_until_ready(carry)
        dt = time.perf_counter() - t0
        total_leapfrogs = int(np.asarray(nsteps).sum())
        out[name] = {
            "wall_s": round(dt, 4),
            "leapfrogs": total_leapfrogs,
            "ns_per_leapfrog_chain": round(dt / max(total_leapfrogs, 1) * 1e9, 2),
        }
    out["speedup"] = round(
        out["pallas_off"]["wall_s"] / out["pallas_on"]["wall_s"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
