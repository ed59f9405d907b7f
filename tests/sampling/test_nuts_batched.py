"""Batched NUTS (explicit chain axis) vs the vmapped scalar kernel.

The sampler driver and the sharded step both run nuts_transition_batched;
these tests pin its contract: bit-identical draws to jax.vmap(nuts_transition)
for the same per-chain keys, correct posteriors, and full-mass support.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pymc_tpu.sampling.nuts import nuts_transition, nuts_transition_batched


@pytest.fixture(scope="module")
def target():
    D = 5
    rng = np.random.default_rng(0)
    A = rng.normal(size=(D, D))
    Sigma = A @ A.T + D * np.eye(D)
    P = jnp.asarray(np.linalg.inv(Sigma))

    def logp_fn(q):
        return -0.5 * q @ P @ q

    return D, Sigma, jax.value_and_grad(logp_fn)


def _setup(D, logp_grad, C=16, seed=0):
    rng = np.random.default_rng(seed)
    q0 = jnp.asarray(rng.normal(size=(C, D)))
    logp0, grad0 = jax.vmap(logp_grad)(q0)
    keys = jax.random.split(jax.random.PRNGKey(42), C)
    ss = jnp.full((C,), 0.25, q0.dtype)
    im = jnp.ones((C, D), q0.dtype)
    return q0, logp0, grad0, keys, ss, im


class TestBatchedMatchesVmapped:
    def test_bit_identical_single_draw(self, target):
        D, _, logp_grad = target
        q0, logp0, grad0, keys, ss, im = _setup(D, logp_grad)
        (vq, vl, vg), vs = jax.jit(jax.vmap(
            lambda k, q, l, g, s, i: nuts_transition(
                logp_grad, k, q, l, g, s, i, max_treedepth=6
            )
        ))(keys, q0, logp0, grad0, ss, im)
        (bq, bl, bg), bs = jax.jit(
            lambda k, q, l, g, s, i: nuts_transition_batched(
                logp_grad, k, q, l, g, s, i, max_treedepth=6
            )
        )(keys, q0, logp0, grad0, ss, im)
        np.testing.assert_array_equal(np.asarray(vq), np.asarray(bq))
        np.testing.assert_array_equal(np.asarray(vs.depth), np.asarray(bs.depth))
        np.testing.assert_array_equal(
            np.asarray(vs.n_steps), np.asarray(bs.n_steps)
        )
        np.testing.assert_allclose(
            np.asarray(vs.acceptance_rate), np.asarray(bs.acceptance_rate)
        )

    def test_bit_identical_chained_draws(self, target):
        D, _, logp_grad = target
        q0, logp0, grad0, keys, ss, im = _setup(D, logp_grad, seed=3)

        def run(transition):
            def step(carry, i):
                q, l, g = carry
                ks = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
                (q, l, g), _ = transition(ks, q, l, g, ss, im)
                return (q, l, g), q

            _, draws = jax.lax.scan(step, (q0, logp0, grad0), jnp.arange(25))
            return draws

        v = jax.jit(lambda: run(jax.vmap(
            lambda k, q, l, g, s, i: nuts_transition(
                logp_grad, k, q, l, g, s, i, max_treedepth=6
            )
        )))()
        b = jax.jit(lambda: run(
            lambda k, q, l, g, s, i: nuts_transition_batched(
                logp_grad, k, q, l, g, s, i, max_treedepth=6
            )
        ))()
        np.testing.assert_array_equal(np.asarray(v), np.asarray(b))


class TestBatchedStatistics:
    def test_posterior_covariance(self, target):
        D, Sigma, logp_grad = target
        q0, logp0, grad0, keys, ss, im = _setup(D, logp_grad, seed=1)

        def run(n):
            def step(carry, i):
                q, l, g = carry
                ks = jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
                (q, l, g), _ = nuts_transition_batched(
                    logp_grad, ks, q, l, g, ss, im, max_treedepth=6
                )
                return (q, l, g), q

            _, draws = jax.lax.scan(step, (q0, logp0, grad0), jnp.arange(n))
            return draws

        draws = jax.jit(lambda: run(3000))()
        d = np.asarray(draws[500:]).reshape(-1, D)
        err = np.abs(np.cov(d.T) - Sigma).max() / np.abs(Sigma).max()
        assert err < 0.06

    def test_full_mass(self, target):
        D, Sigma, logp_grad = target
        q0, logp0, grad0, keys, ss, _ = _setup(D, logp_grad, seed=2)
        imf = jnp.asarray(Sigma)
        (q, l, g), st = jax.jit(lambda: nuts_transition_batched(
            logp_grad, keys, q0, logp0, grad0, ss, imf,
            max_treedepth=6, full_mass=True,
        ))()
        assert bool(jnp.all(jnp.isfinite(q)))
        # with the exact covariance as mass matrix the target is isotropic:
        # trees stay shallow
        assert float(st.depth.mean()) <= 5.0

    def test_pallas_flag_identical_on_cpu(self, target):
        # off-TPU the kernels fall back to the same jnp expressions; the
        # use_pallas flag must not change anything
        D, _, logp_grad = target
        q0, logp0, grad0, keys, ss, im = _setup(D, logp_grad, seed=4)
        out_on = jax.jit(lambda: nuts_transition_batched(
            logp_grad, keys, q0, logp0, grad0, ss, im, max_treedepth=5,
            use_pallas=True,
        ))()
        out_off = jax.jit(lambda: nuts_transition_batched(
            logp_grad, keys, q0, logp0, grad0, ss, im, max_treedepth=5,
            use_pallas=False,
        ))()
        np.testing.assert_array_equal(
            np.asarray(out_on[0][0]), np.asarray(out_off[0][0])
        )
