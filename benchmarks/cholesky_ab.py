"""A/B: batch-in-lanes Pallas Cholesky vs XLA's batched cholesky.

    python benchmarks/cholesky_ab.py [C] [n]

Times both inside one scan program (dispatch-free), checks values agree,
and reports achieved useful GFLOP/s (C*n^3/3).
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

REPS = 30


def timed_scan(fn, init):
    def step(carry, _):
        return fn(carry), ()

    runj = jax.jit(lambda c: jax.lax.scan(step, c, jnp.arange(REPS)))
    out = runj(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = runj(init)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS


def main(C=64, n=150):
    from pymc_tpu.ops.linalg import cholesky_batched, pallas_cholesky_eligible

    rng = np.random.default_rng(0)
    B = rng.normal(size=(C, n, n)).astype(np.float32)
    A = jnp.asarray(B @ np.swapaxes(B, -1, -2) + n * np.eye(n, dtype=np.float32))

    out = {"C": C, "n": n, "backend": jax.default_backend(),
           "eligible": pallas_cholesky_eligible(A.shape, A.dtype)}

    # value agreement on the real device
    L_p = np.asarray(cholesky_batched(A))
    L_x = np.asarray(jnp.linalg.cholesky(A))
    out["max_abs_diff"] = float(np.abs(L_p - L_x).max())

    def resym(L, A0):
        # keep the scan carry a valid SPD stack without letting the compiler
        # elide the factorization
        return A0 + 0.0 * (L @ jnp.swapaxes(L, -1, -2) - A0)

    t_x = timed_scan(lambda a: resym(jnp.linalg.cholesky(a), a), A)
    t_p = timed_scan(lambda a: resym(cholesky_batched(a), a), A)
    flops = C * n**3 / 3.0
    out["xla_us"] = round(t_x * 1e6, 1)
    out["pallas_us"] = round(t_p * 1e6, 1)
    out["xla_gflops"] = round(flops / t_x / 1e9, 1)
    out["pallas_gflops"] = round(flops / t_p / 1e9, 1)
    out["speedup"] = round(t_x / t_p, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
