"""Reference-API compatibility shims: moments.mean, quadpotential classes,
arraystep helpers, predictions_to_inference_data,
compile_forward_sampling_function, transform alias names."""
import numpy as np
import pytest

import jax
import pymc_tpu as pm


class TestMoments:
    def test_means_match_scipy(self):
        from scipy import stats as st
        from pymc_tpu.distributions.moments import mean

        cases = [
            (pm.Gamma.dist(3.0, 2.0), st.gamma(3, scale=0.5).mean()),
            (pm.Weibull.dist(2.0, 3.0), st.weibull_min(2, scale=3).mean()),
            (pm.LogNormal.dist(0.5, 0.8),
             st.lognorm(0.8, scale=np.exp(0.5)).mean()),
            (pm.SkewNormal.dist(mu=1.0, sigma=2.0, alpha=3.0),
             st.skewnorm(3, 1, 2).mean()),
            (pm.BetaBinomial.dist(alpha=2.0, beta=3.0, n=10),
             st.betabinom(10, 2, 3).mean()),
            (pm.HalfNormal.dist(2.0), st.halfnorm(scale=2).mean()),
            (pm.Poisson.dist(4.5), 4.5),
        ]
        for d, want in cases:
            np.testing.assert_allclose(
                float(np.asarray(mean(d))), float(want), rtol=1e-5
            )

    def test_no_mean_raises(self):
        from pymc_tpu.distributions.moments import mean

        with pytest.raises(NotImplementedError):
            mean(pm.Cauchy.dist(0, 1))


class TestQuadPotential:
    def test_diag_velocity_energy_random(self):
        from pymc_tpu.step_methods.quadpotential import (
            isquadpotential, quad_potential,
        )

        qp = quad_potential(np.array([4.0, 1.0]), is_cov=True)
        assert isquadpotential(qp)
        np.testing.assert_allclose(
            np.asarray(qp.velocity(np.array([1.0, 1.0]))), [4.0, 1.0]
        )
        assert float(qp.energy(np.array([1.0, 1.0]))) == 2.5
        mom = np.asarray(jax.vmap(qp.random)(
            jax.random.split(jax.random.PRNGKey(0), 4000)
        ))
        np.testing.assert_allclose(mom.var(0), [0.25, 1.0], rtol=0.15)

    def test_full_roundtrip(self):
        from pymc_tpu.step_methods.quadpotential import (
            QuadPotentialFull, QuadPotentialFullInv,
        )

        S = np.array([[2.0, 0.5], [0.5, 1.0]])
        a = QuadPotentialFull(S)
        b = QuadPotentialFullInv(np.linalg.inv(S))
        p = np.array([0.3, -0.7])
        np.testing.assert_allclose(
            np.asarray(a.velocity(p)), np.asarray(b.velocity(p)), rtol=1e-5
        )


class TestForwardShims:
    def test_compile_forward_sampling_function(self):
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 5)
            pm.Normal("y", mu, 1, observed=np.ones(4))
        fn, volatile = pm.compile_forward_sampling_function(
            vars_in_trace=[mu], model=m
        )
        out = fn(jax.random.PRNGKey(0), {"mu": 2.0})
        assert volatile == ["y"]
        assert abs(float(np.asarray(out["y"]).mean()) - 2.0) < 1.5

    def test_predictions_to_inference_data(self):
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 5)
            pm.Normal("y", mu, 1, observed=np.ones(4))
        idata = pm.predictions_to_inference_data(
            {"y": np.ones((2, 5, 4))}, model=m
        )
        assert "predictions" in idata.groups()
        assert idata.predictions["y"].values.shape == (2, 5, 4)


def test_metrop_select():
    from pymc_tpu.step_methods.arraystep import metrop_select

    q, q0 = np.ones(3), np.zeros(3)
    sel, acc = metrop_select(jax.random.PRNGKey(0), np.asarray(50.0), q, q0)
    assert bool(acc) and np.allclose(np.asarray(sel), 1.0)
    sel, acc = metrop_select(jax.random.PRNGKey(0), np.asarray(-50.0), q, q0)
    assert not bool(acc) and np.allclose(np.asarray(sel), 0.0)


def test_transform_aliases():
    from pymc_tpu.distributions.transforms import (
        Chain, CholeskyCovPacked, Interval,
    )

    assert float(Interval(0, 1).backward(0.0)) == 0.5
    assert CholeskyCovPacked is not None and Chain is not None
