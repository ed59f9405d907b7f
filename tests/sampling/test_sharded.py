"""Multi-device chain sharding tests (8 virtual CPU devices via conftest
XLA_FLAGS — the standard shard_map-without-a-pod trick, SURVEY §4)."""

import numpy as np
import jax
import pytest

import pymc_tpu as pm


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    from pymc_tpu.parallel import chain_mesh

    return chain_mesh(devices=devs[:8])


class TestShardedSampling:
    def test_sample_with_mesh(self, mesh8):
        y = np.random.default_rng(0).normal(1.0, 1.0, 30)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 5)
            pm.Normal("y", mu, 1.0, observed=y)
        idata = pm.sample(draws=200, tune=200, chains=16, model=m,
                          random_seed=1, progressbar=False,
                          compute_convergence_checks=False, mesh=mesh8,
                          mass_adapt="pooled")
        assert idata.posterior["mu"].shape == (16, 200)
        exact = 30 * y.mean() / (30 + 1 / 25)
        assert abs(idata.posterior["mu"].values.mean() - exact) < 0.1

    def test_mesh_matches_unsharded(self, mesh8):
        """Sharding must not change the math (same seeds -> same draws)."""
        y = np.random.default_rng(2).normal(0.0, 1.0, 20)

        def build():
            with pm.Model() as m:
                mu = pm.Normal("mu", 0, 5)
                pm.Normal("y", mu, 1.0, observed=y)
            return m

        a = pm.sample(draws=50, tune=50, chains=8, model=build(),
                      random_seed=7, progressbar=False,
                      compute_convergence_checks=False)
        b = pm.sample(draws=50, tune=50, chains=8, model=build(),
                      random_seed=7, progressbar=False,
                      compute_convergence_checks=False, mesh=mesh8)
        np.testing.assert_allclose(
            a.posterior["mu"].values, b.posterior["mu"].values, rtol=1e-5
        )

    def test_indivisible_chains_raises(self, mesh8):
        with pm.Model() as m:
            pm.Normal("x", 0, 1)
        with pytest.raises(ValueError, match="divisible"):
            pm.sample(draws=10, tune=10, chains=9, model=m, mesh=mesh8,
                      progressbar=False)

    def test_sharded_step_collective(self, mesh8):
        """The pooled-mass mean over a sharded chain axis (an all-reduce)."""
        import jax.numpy as jnp

        from pymc_tpu.blocking import ravel_point, unravel_vector
        from pymc_tpu.initial_point import make_initial_points_per_chain
        from pymc_tpu.parallel import sharded_sample_step
        from pymc_tpu.sampling.adaptation import da_init, welford_init

        y = np.random.default_rng(3).normal(size=10)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 1)
            pm.Normal("y", mu, 1.0, observed=y)
        info = m.raveled_info()
        logp_dict = m.logp_fn()

        def flat_logp(q):
            return logp_dict(unravel_vector(q, info))

        lg = jax.value_and_grad(flat_logp)
        chains = 16
        pts = make_initial_points_per_chain(m, jax.random.PRNGKey(0), chains,
                                            jitter=0.5, logp_fn=logp_dict)
        q0 = jax.vmap(lambda p: ravel_point(p, info))(pts)
        lp0, g0 = jax.vmap(lg)(q0)
        step, spec_for = sharded_sample_step(lg, mesh8, pooled_mass=True)

        def shard(x):
            return jax.device_put(x, spec_for(x))

        D = info.total_size
        out = step(
            shard(jax.random.split(jax.random.PRNGKey(1), chains)),
            shard(q0), shard(lp0), shard(g0),
            jax.tree.map(shard, jax.vmap(da_init)(jnp.full((chains,), 0.1))),
            jax.tree.map(shard, jax.vmap(
                lambda _: welford_init(D, dtype=q0.dtype)
            )(jnp.arange(chains))),
            shard(jnp.ones((chains, D), q0.dtype)),
            jnp.asarray(True), jnp.asarray(True),
        )
        q_new = out[0]
        assert q_new.shape == (chains, D)
        assert np.isfinite(np.asarray(q_new)).all()
        # pooled inv_mass identical across (sharded) chains
        inv = np.asarray(out[5])
        np.testing.assert_allclose(inv, inv[0][None].repeat(chains, 0))


class TestDataSharding:
    def test_data_sharded_logp_matches_replicated(self):
        import jax.numpy as jnp
        from pymc_tpu.blocking import ravel_point, unravel_vector
        from pymc_tpu.parallel import data_mesh, data_sharded

        rng = np.random.default_rng(0)
        N = 800
        x = rng.normal(size=N)
        y = 2.0 * x + 1.0 + rng.normal(0, 0.5, N)
        with pm.Model() as m:
            xd = pm.ConstantData("x", x)
            a = pm.Normal("a", 0, 5)
            b = pm.Normal("b", 0, 5)
            sd = pm.HalfNormal("sd", 1)
            pm.Normal("y", a + b * xd, sd, observed=y)
        info = m.raveled_info()
        logp_dict = m.logp_fn()

        def flat_logp(q):
            return logp_dict(unravel_vector(q, info))

        q = jnp.asarray(ravel_point(m.initial_point(), info))
        mesh = data_mesh(2, 4)
        with mesh, data_sharded(mesh):
            fl = jax.jit(jax.value_and_grad(flat_logp))
            v_sh, g_sh = fl(q)
            txt = fl.lower(q).compile().as_text()
        v_pl, g_pl = jax.jit(jax.value_and_grad(flat_logp))(q)
        np.testing.assert_allclose(float(v_sh), float(v_pl), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_sh), np.asarray(g_pl), rtol=1e-4
        )
        assert "all-reduce" in txt or "all_reduce" in txt

    def test_indivisible_data_stays_replicated(self):
        from pymc_tpu.parallel import data_mesh, data_sharded

        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 1)
            pm.Normal("y", mu, 1, observed=np.ones(7))  # 7 % 4 != 0
        mesh = data_mesh(2, 4)
        with mesh, data_sharded(mesh):
            lp = float(jax.jit(m.logp_fn())({"mu": 0.5}))
        assert np.isfinite(lp)


class TestShardedPooledStep:
    def test_mesh_pooled_step_matches_unsharded(self, mesh8):
        """step_adapt='pooled' involves a cross-chain mean — under a sharded
        chain axis that is a collective; draws must still be bit-identical
        to the unsharded run."""
        y = np.random.default_rng(5).normal(0.5, 1.2, 25)

        def run(mesh):
            with pm.Model() as m:
                mu = pm.Normal("mu", 0, 5)
                sigma = pm.HalfNormal("sigma", 2)
                pm.Normal("y", mu, sigma, observed=y)
            return pm.sample(draws=150, tune=150, chains=16, model=m,
                             random_seed=7, progressbar=False,
                             compute_convergence_checks=False, mesh=mesh,
                             mass_adapt="pooled", step_adapt="pooled",
                             target_accept=0.9)

        a = run(None)
        b = run(mesh8)
        # NOT bit-identical: the pooled-step cross-chain mean becomes a
        # sharded reduction whose summation order XLA reassociates (~1e-15
        # per step). Unlike the default path's per-chain math (exactly
        # equal, test above), only near-equality can hold here.
        np.testing.assert_allclose(a.posterior["mu"].values,
                                   b.posterior["mu"].values, atol=1e-9)
        np.testing.assert_allclose(a.posterior["sigma"].values,
                                   b.posterior["sigma"].values, atol=1e-9)
        # shared step: every chain ends with the same adapted step size
        ss = np.asarray(b.sample_stats["step_size"])
        assert np.allclose(ss, ss[0, 0])
