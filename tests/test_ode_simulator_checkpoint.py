"""ODE, Simulator (ABC), checkpoint/resume, and VI integration tests."""

import os
import tempfile

import numpy as np
import jax
import pytest
import scipy.stats as st

import pymc_tpu as pm


class TestODE:
    def test_solution_matches_scipy(self):
        from scipy.integrate import odeint as sp_odeint

        from pymc_tpu.ode import DifferentialEquation

        times = np.linspace(0.1, 5, 20)
        ode = DifferentialEquation(
            lambda y, t, p: p[0] * y[0], times, n_states=1, n_theta=1
        )
        sol = np.asarray(jax.device_get(
            pm.evaluate(ode(np.array([1.0]), np.array([0.5])))
        ))
        expected = np.exp(0.5 * times)
        np.testing.assert_allclose(sol[:, 0], expected, rtol=1e-4)

    def test_gradient_through_solver(self):
        import jax.numpy as jnp
        from jax.experimental.ode import odeint

        from pymc_tpu.ode import DifferentialEquation

        times = np.linspace(0.5, 2, 5)
        ode = DifferentialEquation(
            lambda y, t, p: p[0] * y[0], times, n_states=1, n_theta=1
        )

        def loss(r):
            sol = ode._solve(jnp.array([1.0]), jnp.array([r]))
            return jnp.sum(sol)

        g = float(jax.grad(loss)(0.3))
        # d/dr sum exp(r t) = sum t exp(r t)
        expected = float(np.sum(times * np.exp(0.3 * times)))
        np.testing.assert_allclose(g, expected, rtol=1e-4)


class TestSimulatorABC:
    def test_abc_recovers_location(self):
        data = np.random.default_rng(1).normal(1.5, 1.0, 150)

        def sim(key, mu):
            return mu + jax.random.normal(key, (150,))

        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 3)
            pm.Simulator("s", sim, mu, sum_stat="sort", epsilon=0.5,
                         observed=data)
        idata = pm.sample_smc(draws=400, chains=2, model=m, random_seed=2,
                              progressbar=False,
                              compute_convergence_checks=False)
        assert abs(idata.posterior["mu"].values.mean() - 1.5) < 0.3


class TestCheckpointResume:
    def test_stream_and_resume(self):
        y = np.random.default_rng(3).normal(1.0, 1.0, 30)

        def build():
            with pm.Model() as m:
                mu = pm.Normal("mu", 0, 5)
                pm.Normal("y", mu, 1.0, observed=y)
            return m

        from pymc_tpu.backends.checkpoint import FileTrace

        tmp = tempfile.mkdtemp()
        tr = FileTrace(tmp, overwrite=True)
        pm.sample(draws=200, tune=200, chains=2, model=build(), random_seed=4,
                  progressbar=False, compute_convergence_checks=False,
                  trace=tr, chunk_size=50)
        assert tr.n_chunks == 4
        assert tr.read_meta()["draws_done"] == 200
        # resume to 400 draws; warmup must be skipped
        idata = pm.sample(draws=400, tune=200, chains=2, model=build(),
                          random_seed=4, progressbar=False,
                          compute_convergence_checks=False, trace=tr,
                          resume=True, chunk_size=100)
        assert idata.posterior["mu"].shape == (2, 400)
        assert tr.read_meta()["draws_done"] == 400
        exact = 30 * y.mean() / (30 + 1 / 25)
        assert abs(idata.posterior["mu"].values.mean() - exact) < 0.15

    def test_trace_roundtrip_arrays(self):
        from pymc_tpu.backends.checkpoint import FileTrace

        tmp = tempfile.mkdtemp()
        tr = FileTrace(tmp, overwrite=True)
        q = np.random.normal(size=(10, 2, 3))
        stats = {"diverging": np.zeros((10, 2), dtype=bool)}
        tr.write_chunk(q, stats)
        tr.write_chunk(q + 1, stats)
        q_all, stats_all = tr.read_draws()
        assert q_all.shape == (20, 2, 3)
        np.testing.assert_allclose(q_all[10:], q + 1)


class TestVIIntegration:
    def test_advi_matches_conjugate(self):
        rng = np.random.default_rng(6)
        y = rng.normal(2.0, 1.0, 100)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 10)
            pm.Normal("y", mu, 1.0, observed=y)
        approx = pm.fit(12000, model=m, random_seed=7, progressbar=False)
        idata = approx.sample(2000, random_seed=8)
        post = idata.posterior["mu"].values
        exact_mean = y.sum() / (100 + 0.01)
        exact_sd = 1.0 / np.sqrt(100.01)
        assert abs(post.mean() - exact_mean) < 0.05
        assert abs(post.std() - exact_sd) < 0.03

    def test_svgd_runs(self):
        with pm.Model() as m:
            pm.Normal("x", 2.0, 0.5)
        ap = pm.fit(300, method="svgd", model=m, random_seed=9,
                    progressbar=False, inf_kwargs={"n_particles": 50})
        idata = ap.sample(500, random_seed=10)
        assert abs(idata.posterior["x"].values.mean() - 2.0) < 0.3

    def test_minibatch_advi(self):
        import optax

        rng = np.random.default_rng(11)
        y = rng.normal(1.0, 1.0, 400)
        mb = pm.Minibatch(y, batch_size=50)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 10)
            pm.Normal("y", mu, 1.0, observed=mb, total_size=len(y))
        ap = pm.fit(3000, model=m, random_seed=12, progressbar=False,
                    obj_optimizer=optax.adam(0.05), callbacks=[])
        assert abs(float(np.asarray(ap.mean["mu"])) - y.mean()) < 0.2

    def test_tracker_callback(self):
        from pymc_tpu.variational import Tracker

        with pm.Model() as m:
            pm.Normal("x", 0, 1)
        # reference contract: zero-arg callables, else (approx, hist, i)
        tracker = Tracker(mean=lambda ap, hist, i: ap.params["mu"].copy())
        pm.fit(500, model=m, random_seed=13, progressbar=False,
               callbacks=[tracker])
        assert len(tracker["mean"]) >= 4
