"""Decompose the Marginal-GP draw cost (BASELINE config #4, VERDICT r2 #6).

Per leapfrog the GP hyperparameter logp+grad does: kernel-matrix build
(elementwise, O(n^2)) -> Cholesky (O(n^3/3), the dense-linalg hot spot) ->
triangular solve + logdet. This script times each piece batched over the
chain axis INSIDE one scan program (host-loop timing measures tunnel
dispatch, not compute — CLAUDE.md round-2 lesson) and reports achieved
GFLOP/s for the batched Cholesky so BENCHMARKS.md can state whether the
path is MXU-bound or layout-bound.

    python benchmarks/gp_profile.py [chains] [n] [--trace DIR]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


REPS = 30


def _timed_scan(fn, init, reps=REPS):
    """Wall time of `reps` dependent applications of fn inside ONE jitted
    scan (defeats dispatch overhead and dead-code elimination)."""

    def step(carry, _):
        out = fn(carry)
        return out, ()

    runj = jax.jit(lambda c: jax.lax.scan(step, c, jnp.arange(reps)))
    out = runj(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = runj(init)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main(chains=64, n=150, trace_dir=None):
    import pymc_tpu as pm
    from pymc_tpu.blocking import ravel_point, unravel_vector
    from pymc_tpu.initial_point import make_initial_points_per_chain

    rng = np.random.default_rng(5)
    X = np.sort(rng.uniform(0, 10, n))[:, None]
    y = np.sin(X[:, 0]) * 2 + rng.normal(0, 0.3, n)
    with pm.Model() as model:
        ls = pm.Gamma("ls", 2, 1)
        eta = pm.HalfNormal("eta", 2)
        cov = eta**2 * pm.gp.cov.ExpQuad(1, ls=ls)
        gp = pm.gp.Marginal(cov_func=cov)
        sigma = pm.HalfNormal("sigma", 1)
        gp.marginal_likelihood("y", X=X, y=y, sigma=sigma)

    info = model.raveled_info()
    logp_dict = model.logp_fn()

    def flat_logp(q):
        return logp_dict(unravel_vector(q, info))

    logp_grad = jax.value_and_grad(flat_logp)
    key = jax.random.PRNGKey(0)
    pts = make_initial_points_per_chain(model, key, chains, jitter=0.5,
                                        logp_fn=logp_dict)
    q0 = jax.vmap(lambda p: ravel_point(p, info))(pts)
    D = q0.shape[1]
    dt = q0.dtype
    out = {"chains": chains, "n": n, "D": D, "dtype": str(dt),
           "backend": jax.default_backend()}

    if trace_dir:
        jax.profiler.start_trace(trace_dir)

    # (a) full batched logp+grad (the per-leapfrog cost)
    def grad_step(q):
        _, g = jax.vmap(logp_grad)(q)
        return q + 0.0 * g  # dependency so the scan can't elide the work

    t_grad = _timed_scan(grad_step, q0)
    out["logp_grad_us"] = round(t_grad * 1e6, 1)

    # (b) isolated batched Cholesky of the (C, n, n) kernel stack
    diffs = (X[:, 0][:, None] - X[:, 0][None, :]) ** 2
    diffs = jnp.asarray(diffs, dt)

    def build_K(q):
        vals = jax.vmap(lambda qq: unravel_vector(qq, info))(q)
        ls_v = jnp.exp(vals["ls_log__"])
        eta_v = jnp.exp(vals["eta_log__"])
        K = (eta_v[:, None, None] ** 2) * jnp.exp(
            -0.5 * diffs[None] / (ls_v[:, None, None] ** 2)
        )
        return K + 1e-4 * jnp.eye(n, dtype=dt)[None]

    K0 = jax.jit(build_K)(q0)
    jax.block_until_ready(K0)

    def chol_step(K):
        L = jnp.linalg.cholesky(K)
        # re-symmetrize so the next iteration's input stays a valid SPD stack
        return K + 0.0 * (L @ jnp.swapaxes(L, -1, -2) - K)

    t_chol = _timed_scan(chol_step, K0)
    out["batched_cholesky_us"] = round(t_chol * 1e6, 1)

    # (c) kernel-matrix build alone
    def K_step(q):
        K = build_K(q)
        return q + 0.0 * K[:, 0, :D]

    t_K = _timed_scan(K_step, q0)
    out["kernel_build_us"] = round(t_K * 1e6, 1)

    # achieved FLOP rate of the Cholesky stack: C * n^3/3 useful flops
    # (+ the C*n^3 re-symmetrization matmul, reported separately)
    chol_flops = chains * (n**3) / 3.0
    gemm_flops = chains * 2.0 * n**3
    out["cholesky_gflops_incl_resym"] = round(
        (chol_flops + gemm_flops) / t_chol / 1e9, 1
    )
    out["cholesky_only_gflops_lower_bound"] = round(
        chol_flops / t_chol / 1e9, 1
    )
    # share of the leapfrog spent in dense linalg (chol fwd; grad roughly
    # doubles it via the adjoint triangular solves)
    out["chol_share_of_grad"] = round(t_chol / t_grad, 3)

    if trace_dir:
        jax.profiler.stop_trace()
        out["trace_dir"] = trace_dir

    print(json.dumps(out))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    trace_dir = None
    if "--trace" in args:
        i = args.index("--trace")
        trace_dir = args[i + 1]
        del args[i:i + 2]
    main(*[int(a) for a in args], trace_dir=trace_dir)
