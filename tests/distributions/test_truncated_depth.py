"""Truncated-distribution depth battery porting the reference case inventory
(reference tests/distributions/test_truncated.py: continuous/discrete
random+logp+logcdf renormalization over one- and two-sided bounds,
vectorized bounds, boundary membership, default-transform assignment,
posterior recovery, gamma truncation, size changes, exception matrix).
Oracles: scipy truncated closed forms and explicit renormalized pmfs.
"""

import numpy as np
import numpy.testing as npt
import pytest
import scipy.stats as st
import jax
import jax.numpy as jnp

import pymc_tpu as pm

rng = np.random.default_rng(123)


def _logp(dist, v):
    return np.asarray(dist.logp(jnp.asarray(v, jnp.float64)))


def _logcdf(dist, v):
    return np.asarray(dist.logcdf(jnp.asarray(v, jnp.float64)))


class TestContinuousRenormalization:
    @pytest.mark.parametrize("lower,upper", [
        (-1.0, None), (None, 1.5), (-1.0, 1.5), (0.3, 0.4),
    ], ids=["lower", "upper", "both", "narrow"])
    def test_normal_logp_logcdf_icdf(self, lower, upper):
        mu, sigma = 0.5, 1.3
        d = pm.Truncated.dist(pm.Normal.dist(mu, sigma),
                              lower=lower, upper=upper)
        a = -np.inf if lower is None else (lower - mu) / sigma
        b = np.inf if upper is None else (upper - mu) / sigma
        sp = st.truncnorm(a, b, loc=mu, scale=sigma)
        lo = -0.9 if lower is None else lower
        hi = 1.4 if upper is None else upper
        xs = np.linspace(lo + 1e-9, hi - 1e-9, 7)
        npt.assert_allclose(_logp(d, xs), sp.logpdf(xs), rtol=1e-8)
        npt.assert_allclose(_logcdf(d, xs), sp.logcdf(xs), rtol=1e-6)
        qs = np.array([0.05, 0.3, 0.5, 0.9])
        npt.assert_allclose(
            np.asarray(d.icdf(jnp.asarray(qs))), sp.ppf(qs), rtol=1e-6)

    def test_outside_bounds_is_minus_inf(self):
        d = pm.Truncated.dist(pm.Normal.dist(0, 1), lower=-1, upper=1)
        assert _logp(d, -1.0001) == -np.inf
        assert _logp(d, 1.0001) == -np.inf
        assert np.isfinite(_logp(d, -1.0))
        assert np.isfinite(_logp(d, 1.0))
        assert _logcdf(d, -1.0001) == -np.inf
        npt.assert_allclose(_logcdf(d, 1.0), 0.0, atol=1e-12)

    def test_gamma_truncation(self):
        # reference test_truncated_gamma: renormalized gamma density
        alpha, beta = 3.0, 2.0  # rate parameterization
        lower, upper = 0.5, 2.5
        d = pm.Truncated.dist(pm.Gamma.dist(alpha, beta),
                              lower=lower, upper=upper)
        g = st.gamma(alpha, scale=1 / beta)
        Z = g.cdf(upper) - g.cdf(lower)
        xs = np.linspace(lower + 1e-9, upper - 1e-9, 9)
        npt.assert_allclose(_logp(d, xs), g.logpdf(xs) - np.log(Z),
                            rtol=1e-8)

    def test_sampling_matches_truncnorm(self):
        d = pm.Truncated.dist(pm.Normal.dist(0.5, 1.3), lower=-1, upper=1.5)
        draws = np.asarray(d.sample(jax.random.PRNGKey(0), (4000,)))
        assert (draws >= -1).all() and (draws <= 1.5).all()
        a, b = (-1 - 0.5) / 1.3, (1.5 - 0.5) / 1.3
        p = st.kstest(draws, st.truncnorm(a, b, loc=0.5, scale=1.3).cdf
                      ).pvalue
        assert p > 0.001, p


class TestDiscreteRenormalization:
    @pytest.mark.parametrize("lower,upper", [
        (2, None), (None, 6), (2, 6),
    ], ids=["lower", "upper", "both"])
    def test_poisson_logp_renormalized(self, lower, upper):
        mu = 3.5
        d = pm.Truncated.dist(pm.Poisson.dist(mu), lower=lower, upper=upper)
        po = st.poisson(mu)
        lo = 0 if lower is None else lower
        hi = 30 if upper is None else upper
        ks = np.arange(lo, hi + 1)
        Z = po.cdf(hi) - (po.cdf(lo - 1) if lo > 0 else 0.0)
        npt.assert_allclose(_logp(d, ks), po.logpmf(ks) - np.log(Z),
                            rtol=1e-8)
        # total mass is exactly one over the truncated support
        npt.assert_allclose(np.exp(_logp(d, ks)).sum(), 1.0, rtol=1e-8)
        # out-of-support values
        if lower is not None:
            assert _logp(d, lower - 1) == -np.inf
        if upper is not None:
            assert _logp(d, upper + 1) == -np.inf

    def test_poisson_logcdf_boundaries(self):
        d = pm.Truncated.dist(pm.Poisson.dist(3.5), lower=2, upper=6)
        po = st.poisson(3.5)
        Z = po.cdf(6) - po.cdf(1)
        for k in range(2, 7):
            npt.assert_allclose(
                float(_logcdf(d, k)), np.log((po.cdf(k) - po.cdf(1)) / Z),
                rtol=1e-8)
        assert _logcdf(d, 1) == -np.inf
        npt.assert_allclose(float(_logcdf(d, 6)), 0.0, atol=1e-12)

    def test_discrete_sampling_within_bounds_and_pmf(self):
        d = pm.Truncated.dist(pm.Poisson.dist(3.5), lower=2, upper=6)
        draws = np.asarray(d.sample(jax.random.PRNGKey(1), (8000,)))
        assert draws.dtype.kind in "iu"
        assert (draws >= 2).all() and (draws <= 6).all()
        po = st.poisson(3.5)
        Z = po.cdf(6) - po.cdf(1)
        ks = np.arange(2, 7)
        expected = po.pmf(ks) / Z
        freq = np.array([(draws == k).mean() for k in ks])
        chi2 = 8000 * ((freq - expected) ** 2 / expected).sum()
        assert chi2 < st.chi2(len(ks) - 1).ppf(0.999), (freq, expected)

    def test_geometric_lower_truncation(self):
        d = pm.Truncated.dist(pm.Geometric.dist(0.3), lower=3, upper=None)
        ge = st.geom(0.3)
        ks = np.arange(3, 20)
        Z = 1.0 - ge.cdf(2)
        npt.assert_allclose(_logp(d, ks), ge.logpmf(ks) - np.log(Z),
                            rtol=1e-7)


class TestVectorizedBounds:
    def test_vector_bounds_logp_elementwise(self):
        lower = np.array([-1.0, 0.0, 1.0])
        upper = np.array([1.0, 2.0, 3.0])
        d = pm.Truncated.dist(pm.Normal.dist(0, 1), lower=lower, upper=upper)
        assert d.shape == (3,)
        xs = np.array([0.5, 1.5, 2.5])
        got = _logp(d, xs)
        for i in range(3):
            a, b = lower[i], upper[i]
            sp = st.truncnorm(a, b)
            npt.assert_allclose(got[i], sp.logpdf(xs[i]), rtol=1e-8)
        # element outside ITS OWN bounds only
        got = _logp(d, np.array([0.5, 2.5, 2.5]))
        assert got[1] == -np.inf and np.isfinite(got[2])

    def test_vector_bounds_sampling(self):
        lower = np.array([-1.0, 0.0, 1.0])
        upper = np.array([1.0, 2.0, 3.0])
        d = pm.Truncated.dist(pm.Normal.dist(0, 1), lower=lower, upper=upper)
        draws = np.asarray(d.sample(jax.random.PRNGKey(2), (500,)))
        assert draws.shape == (500, 3)
        assert (draws >= lower).all() and (draws <= upper).all()
        # distinct marginals, not one broadcast draw
        assert len(np.unique(draws[:, 0])) > 400

    def test_broadcast_batched_base_against_scalar_bound(self):
        mu = np.array([-1.0, 0.0, 1.0])
        d = pm.Truncated.dist(pm.Normal.dist(mu, 1.0), lower=0.0, upper=None)
        xs = np.array([0.5, 0.5, 0.5])
        got = _logp(d, xs)
        for i in range(3):
            sp = st.truncnorm(-mu[i], np.inf, loc=mu[i])
            npt.assert_allclose(got[i], sp.logpdf(0.5), rtol=1e-8)


class TestShapeAndTransform:
    def test_explicit_shape_draws(self):
        d = pm.Truncated.dist(pm.Normal.dist(0, 1), lower=-1, upper=1,
                              shape=(3, 2))
        assert d.shape == (3, 2)
        draws = np.asarray(d.sample(jax.random.PRNGKey(3), (5,)))
        assert draws.shape == (5, 3, 2)
        assert (np.abs(draws) <= 1).all()

    def test_default_transform_two_sided(self):
        with pm.Model() as m:
            pm.Truncated("x", pm.Normal.dist(0, 1), lower=-1, upper=1)
        t = m.free_RVs[0].transform
        assert t is not None
        # backward image must live inside the bounds
        vals = np.asarray(t.backward(jnp.asarray(np.linspace(-20, 20, 41))))
        assert (vals >= -1).all() and (vals <= 1).all()

    def test_default_transform_one_sided(self):
        with pm.Model() as m:
            pm.Truncated("x", pm.Normal.dist(0, 1), lower=0.5, upper=None)
        t = m.free_RVs[0].transform
        vals = np.asarray(t.backward(jnp.asarray(np.linspace(-10, 10, 21))))
        assert (vals > 0.5).all()

    def test_transformed_logp_matches_manual(self):
        # reference test_truncated_transform_logp: model joint logp at a
        # transformed value equals renormalized logp + jacobian
        with pm.Model() as m:
            pm.Truncated("x", pm.Normal.dist(0, 1), lower=-1, upper=2)
        rv = m.free_RVs[0]
        t = rv.transform
        v = 0.37
        x = float(t.backward(jnp.float64(v)))
        lp = float(m.logp_fn()({rv.value_name: jnp.float64(v)}))
        sp = st.truncnorm(-1, 2)
        npt.assert_allclose(
            lp, sp.logpdf(x) + float(t.log_jac_det(jnp.float64(v))),
            rtol=1e-8)

    def test_support_point_inside_bounds(self):
        for lo, hi in [(1.0, None), (None, -1.0), (5.0, 10.0)]:
            d = pm.Truncated.dist(pm.Normal.dist(0, 1), lower=lo, upper=hi)
            pt = float(d.support_point())
            if lo is not None:
                assert pt >= lo
            if hi is not None:
                assert pt <= hi
            assert np.isfinite(float(d.logp(jnp.float64(pt))))


class TestInference:
    def test_truncated_normal_posterior_recovery(self):
        # reference test_truncated_inference: data from a truncated normal,
        # mu/sigma recovered
        true_mu, true_sigma, lower = -0.5, 1.0, 0.0
        a = (lower - true_mu) / true_sigma
        data = st.truncnorm(a, np.inf, loc=true_mu, scale=true_sigma).rvs(
            2000, random_state=7)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 1)
            sigma = pm.HalfNormal("sigma", 1)
            pm.Truncated("y", pm.Normal.dist(mu, sigma), lower=lower,
                         observed=data)
            idata = pm.sample(draws=400, tune=400, chains=2, random_seed=0,
                              progressbar=False,
                              compute_convergence_checks=False)
        npt.assert_allclose(
            float(idata.posterior["mu"].mean()), true_mu, atol=0.2)
        npt.assert_allclose(
            float(idata.posterior["sigma"].mean()), true_sigma, atol=0.15)


class TestExceptions:
    def test_no_bounds_raises(self):
        with pytest.raises(ValueError, match="lower and/or upper"):
            pm.Truncated.dist(pm.Normal.dist(0, 1))

    def test_multivariate_base_raises(self):
        with pytest.raises(NotImplementedError, match="univariate"):
            pm.Truncated.dist(
                pm.MvNormal.dist(np.zeros(2), np.eye(2)), lower=0)

    def test_non_dist_raises(self):
        with pytest.raises(ValueError, match="dist"):
            pm.Truncated.dist(1.5, lower=0)
