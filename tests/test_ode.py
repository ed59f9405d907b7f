"""DifferentialEquation battery.

Mirrors the case inventory of reference tests/ode/test_ode.py (simulate
shapes, logp vs manual oracle, validation errors, scalar/vector ODEs with
1-2 params, sensitivities) — oracles are analytic solutions and finite
differences, not reference code. Reference: pymc/ode/ode.py:84-163.
"""

import numpy as np
import pytest
import scipy.stats as st

import jax
import jax.numpy as jnp

import pymc_tpu as pm
from pymc_tpu.exceptions import ShapeError
from pymc_tpu.ode import DifferentialEquation


def freefall(y, t, p):
    # dy/dt = 2*p1 - p0*y ; analytic: y(t) = (2 p1 / p0)(1 - exp(-p0 t))
    return 2.0 * p[1] - p[0] * y[0]


def logistic(y, t, p):
    return p[0] * y[0] * (1 - y[0])


def decay_forced(y, t, p):
    # reference test system_1: exp(-t) - p0 * y
    return jnp.exp(-t) - p[0] * y[0]


def oscillator(y, t, p):
    # 2-state damped oscillator: x' = v, v' = -p0*x - p1*v
    return jnp.stack([y[1], -p[0] * y[0] - p[1] * y[1]])


class TestSolve:
    def test_freefall_matches_analytic(self):
        times = np.arange(0.5, 8, 0.5)
        ode = DifferentialEquation(func=freefall, times=times, n_states=1,
                                   n_theta=2, t0=0)
        p = np.array([0.4, 9.8])
        sol = np.asarray(ode._solve(np.array([0.0]), p))
        analytic = (2 * p[1] / p[0]) * (1 - np.exp(-p[0] * times))
        assert sol.shape == (len(times), 1)
        np.testing.assert_allclose(sol[:, 0], analytic, rtol=1e-4)

    def test_two_state_shapes_and_energy(self):
        times = np.linspace(0.25, 5, 20)
        ode = DifferentialEquation(func=oscillator, times=times, n_states=2,
                                   n_theta=2, t0=0)
        sol = np.asarray(ode._solve(np.array([1.0, 0.0]),
                                    np.array([4.0, 0.0])))
        assert sol.shape == (20, 2)
        # undamped oscillator: x(t) = cos(2t), v(t) = -2 sin(2t)
        np.testing.assert_allclose(sol[:, 0], np.cos(2 * times), atol=2e-4)
        np.testing.assert_allclose(sol[:, 1], -2 * np.sin(2 * times),
                                   atol=5e-4)

    def test_nonzero_t0(self):
        times = np.linspace(2.5, 6, 8)
        ode = DifferentialEquation(func=freefall, times=times, n_states=1,
                                   n_theta=2, t0=2.0)
        p = np.array([0.7, 1.0])
        sol = np.asarray(ode._solve(np.array([0.0]), p))
        yinf = 2 * p[1] / p[0]
        analytic = yinf * (1 - np.exp(-p[0] * (times - 2.0)))
        np.testing.assert_allclose(sol[:, 0], analytic, rtol=1e-4)


class TestSensitivities:
    def test_forward_sens_vs_finite_differences(self):
        times = np.arange(0.5, 4, 0.5)
        ode = DifferentialEquation(func=oscillator, times=times, n_states=2,
                                   n_theta=2, t0=0, rtol=1e-8, atol=1e-8)
        y0 = np.array([1.0, 0.5])
        th = np.array([3.0, 0.4])
        _, sens = ode(y0, th, return_sens=True)
        sens = np.asarray(sens)
        assert sens.shape == (len(times), 2, 4)
        eps = 1e-5
        packed = np.concatenate([y0, th])
        for j in range(4):
            dp = packed.copy()
            dm = packed.copy()
            dp[j] += eps
            dm[j] -= eps
            fp = np.asarray(ode._solve(dp[:2], dp[2:]))
            fm = np.asarray(ode._solve(dm[:2], dm[2:]))
            fd = (fp - fm) / (2 * eps)
            np.testing.assert_allclose(sens[:, :, j], fd, rtol=2e-3,
                                       atol=2e-5)

    def test_adjoint_dlogp_vs_finite_differences(self):
        """The whole-model gradient (adjoint through the solver) is the
        quantity NUTS consumes — oracle it against central differences."""
        times = np.arange(0.5, 4, 0.5)
        ode = DifferentialEquation(func=oscillator, times=times, n_states=2,
                                   n_theta=2, t0=0, rtol=1e-8, atol=1e-8)
        rng = np.random.default_rng(0)
        yobs = np.asarray(ode._solve(np.array([1.0, 0.0]),
                                     np.array([3.0, 0.4])))
        yobs = yobs + rng.normal(0, 0.05, yobs.shape)

        def nll(q):
            sol = ode._solve(q[:2], q[2:])
            return jnp.sum(st_norm_logpdf(yobs, sol, 0.05))

        def st_norm_logpdf(x, mu, sd):
            return -0.5 * ((jnp.asarray(x) - mu) / sd) ** 2

        q0 = jnp.array([0.9, 0.1, 2.8, 0.5])
        g = np.asarray(jax.grad(nll)(q0))
        eps = 1e-5
        for j in range(4):
            qp = np.array(q0)
            qm = np.array(q0)
            qp[j] += eps
            qm[j] -= eps
            fd = (float(nll(jnp.asarray(qp))) - float(nll(jnp.asarray(qm))))
            fd /= 2 * eps
            np.testing.assert_allclose(g[j], fd, rtol=5e-4, atol=1e-5)


class TestModelIntegration:
    def test_logp_scalar_ode(self):
        """Reference test_logp_scalar_ode: model logp == manual normal logp
        at the integrated solution."""
        alpha = 0.4
        times = np.arange(0.5, 8, 0.5)
        yobs = np.array([0.30, 0.56, 0.51, 0.55, 0.47, 0.42, 0.38, 0.30,
                         0.26, 0.21, 0.22, 0.13, 0.13, 0.09, 0.09])[:, None]
        ode = DifferentialEquation(func=decay_forced, t0=0, times=times,
                                   n_theta=1, n_states=1)
        integrated = np.asarray(ode._solve(np.array([0.0]),
                                           np.array([alpha])))
        assert integrated.shape == yobs.shape
        manual = st.norm.logpdf(yobs.ravel(), integrated.ravel(), 1).sum()
        with pm.Model() as m:
            forward = ode(y0=[0.0], theta=[alpha])
            pm.Normal("y", mu=forward, sigma=1, observed=yobs)
        got = float(m.compile_logp()({}))
        np.testing.assert_allclose(got, manual, rtol=1e-5)

    def test_list_theta_with_rv_builds_dependency(self):
        """The reference `theta=[gamma, 9.8]` idiom: a list mixing an RV and
        a constant must register the graph dependency."""
        times = np.arange(0.5, 5, 0.5)
        ode = DifferentialEquation(func=freefall, times=times, n_states=1,
                                   n_theta=2, t0=0)
        with pm.Model() as m:
            gamma = pm.LogNormal("gamma", 0, 1)
            sol = ode(y0=[0.0], theta=[gamma, 9.8])
            pm.Normal("y", mu=sol, sigma=1.0,
                      observed=np.ones((len(times), 1)))
        lp1 = float(m.compile_logp()({"gamma_log__": np.log(0.4)}))
        lp2 = float(m.compile_logp()({"gamma_log__": np.log(0.9)}))
        assert np.isfinite(lp1) and np.isfinite(lp2)
        assert lp1 != lp2  # gamma actually flows into the solve

    def test_nuts_recovers_logistic_ode(self):
        """Posterior recovery on the reference's 1-state logistic ODE
        (benchmarks.py:257 family, scaled down)."""
        rng = np.random.default_rng(42)
        times = np.arange(0.5, 6, 0.5)
        r_true, y0_true, sd_true = 1.1, 0.1, 0.02
        ode = DifferentialEquation(func=logistic, times=times, n_states=1,
                                   n_theta=1, t0=0)
        truth = np.asarray(ode._solve(np.array([y0_true]),
                                      np.array([r_true])))
        yobs = truth + rng.normal(0, sd_true, truth.shape)
        with pm.Model() as m:
            r = pm.LogNormal("r", 0, 0.5)
            sd = pm.HalfNormal("sd", 0.1)
            sol = ode(y0=[y0_true], theta=[r])
            pm.Normal("y", mu=sol, sigma=sd, observed=yobs)
            idata = pm.sample(draws=300, tune=300, chains=2, random_seed=0,
                              progressbar=False,
                              compute_convergence_checks=False)
        post_r = idata.posterior["r"].values
        assert abs(post_r.mean() - r_true) < 4 * post_r.std() + 0.05
        assert float(np.nanmin(pm.ess(post_r))) > 100


class TestErrors:
    def setup_method(self, method):
        self.times = np.arange(0, 9).astype(float)
        self.ode = DifferentialEquation(func=decay_forced, t0=0,
                                        times=self.times, n_states=1,
                                        n_theta=1)

    def test_too_many_params(self):
        with pytest.raises(ShapeError, match="Length of theta is wrong"):
            self.ode(y0=[0.0], theta=[1.0, 1.0])

    def test_too_few_params(self):
        ode2 = DifferentialEquation(func=freefall, t0=0, times=self.times,
                                    n_states=1, n_theta=2)
        with pytest.raises(ShapeError, match="Length of theta is wrong"):
            ode2(y0=[0.0], theta=[1.0])

    def test_too_many_y0(self):
        with pytest.raises(ShapeError, match="Length of y0 is wrong"):
            self.ode(y0=[0.0, 0.0], theta=[1.0])

    def test_array_length_checked(self):
        with pytest.raises(ShapeError, match="Length of y0 is wrong"):
            self.ode(y0=np.zeros(3), theta=[1.0])

    def test_func_must_be_callable(self):
        with pytest.raises(ValueError, match="callable"):
            DifferentialEquation(func=1, t0=0, times=self.times, n_states=1,
                                 n_theta=1)

    def test_number_of_states(self):
        with pytest.raises(ValueError, match="n_states"):
            DifferentialEquation(func=decay_forced, t0=0, times=self.times,
                                 n_states=0, n_theta=1)

    def test_number_of_params(self):
        with pytest.raises(ValueError, match="n_theta"):
            DifferentialEquation(func=decay_forced, t0=0, times=self.times,
                                 n_states=1, n_theta=0)
