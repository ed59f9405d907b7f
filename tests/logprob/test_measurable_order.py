"""Order-statistic expression measurability: pm.logp(pm.math.max(rv), v).

Mirrors reference tests/logprob/test_order.py (find_measurable_max —
full-axis reductions of iid scalar RVs; partial-axis, non-iid, and
multivariate bases rejected; discrete max/min via CDF-power differences;
analytic extreme-value checks).
"""

import numpy as np
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu import math as pmm


class TestMaxMinLogprob:
    @pytest.mark.parametrize(
        "shape, value, axis",
        [
            (3, 0.85, -1),
            (3, 0.01, 0),
            (2, 0.2, None),
            (4, 0.5, 0),
            ((3, 4), 0.9, None),
            ((3, 4), 0.75, (1, 0)),
        ],
    )
    def test_max_logprob(self, shape, value, axis):
        # reference test_max_logprob parametrization
        with pm.Model():
            x = pm.Normal("x", 0, 1, size=shape)
        n = int(np.prod(shape))
        sc = st.norm(0, 1)
        expected = (
            np.log(n) + (n - 1) * sc.logcdf(value) + sc.logpdf(value)
        )
        got = float(pm.logp(pmm.max(x, axis=axis), value))
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    @pytest.mark.parametrize(
        "shape, value, axis",
        [(3, 0.85, -1), (2, 0.2, None), ((3, 4), 0.9, None)],
    )
    def test_min_logprob(self, shape, value, axis):
        with pm.Model():
            x = pm.Normal("x", 0, 1, size=shape)
        n = int(np.prod(shape))
        sc = st.norm(0, 1)
        expected = (
            np.log(n) + (n - 1) * sc.logsf(value) + sc.logpdf(value)
        )
        got = float(pm.logp(pmm.min(x, axis=axis), value))
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_max_logcdf(self):
        with pm.Model():
            x = pm.Normal("x", 0, 1, size=5)
        sc = st.norm(0, 1)
        np.testing.assert_allclose(
            float(pm.logcdf(pmm.max(x), 0.5)), 5 * sc.logcdf(0.5), rtol=1e-6
        )

    def test_exponential_max_analytic(self):
        # max of n iid Exponential(1): F(x)^n = (1 - e^-x)^n
        with pm.Model():
            x = pm.Exponential("x", 1.0, size=6)
        v = 1.3
        expected = np.log(6) + 5 * st.expon.logcdf(v) + st.expon.logpdf(v)
        np.testing.assert_allclose(
            float(pm.logp(pmm.max(x), v)), expected, rtol=1e-6
        )

    def test_gumbel_frechet_via_exp_transform(self):
        # exp(max(gumbel)) is Frechet: the monotone transform composes over
        # the order statistic (reference test_derived_frechet, for max)
        with pm.Model():
            g = pm.Gumbel("g", mu=0.0, beta=1.0, size=4)
        y = pmm.exp(pmm.max(g))
        v = 2.0
        np.testing.assert_allclose(
            float(pm.logcdf(y, v)), 4 * st.gumbel_r.logcdf(np.log(v)),
            rtol=1e-6,
        )


class TestDiscreteMaxMin:
    @pytest.mark.parametrize("lam, size, value", [(2.0, 3, 2), (5.0, 4, 7)])
    def test_max_discrete(self, lam, size, value):
        # reference test_max_discrete: P(max = k) = F(k)^n - F(k-1)^n
        with pm.Model():
            p = pm.Poisson("p", lam, size=size)
        pc = st.poisson(lam)
        expected = np.log(pc.cdf(value) ** size - pc.cdf(value - 1) ** size)
        np.testing.assert_allclose(
            float(pm.logp(pmm.max(p), value)), expected, rtol=1e-6
        )

    def test_min_discrete(self):
        # P(min = k) = S(k-1)^n - S(k)^n
        with pm.Model():
            p = pm.Poisson("p", 3.0, size=3)
        pc = st.poisson(3.0)
        value = 2
        expected = np.log(pc.sf(value - 1) ** 3 - pc.sf(value) ** 3)
        np.testing.assert_allclose(
            float(pm.logp(pmm.min(p), value)), expected, rtol=1e-6
        )

    def test_min_max_bernoulli(self):
        # reference test_min_max_bernoulli: closed binary forms
        pp = 0.7
        with pm.Model():
            b = pm.Bernoulli("b", p=pp, size=3)
        np.testing.assert_allclose(
            float(pm.logp(pmm.max(b), 0)), 3 * np.log(1 - pp), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(pm.logp(pmm.max(b), 1)), np.log(1 - (1 - pp) ** 3),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(pm.logp(pmm.min(b), 1)), 3 * np.log(pp), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(pm.logp(pmm.min(b), 0)), np.log(1 - pp**3), rtol=1e-6
        )


class TestRejections:
    def test_partial_axis_rejected(self):
        # reference test_non_supp_axis
        with pm.Model():
            x = pm.Normal("x", 0, 1, size=(3, 3))
        with pytest.raises(TypeError, match="partial axis"):
            pm.logp(pmm.max(x, axis=-1), np.zeros(3))

    def test_non_iid_rejected(self):
        # reference test_non_iid_fails
        with pm.Model():
            x = pm.Normal("x", mu=np.arange(3.0), sigma=1.0)
        with pytest.raises(TypeError, match="iid"):
            pm.logp(pmm.max(x), 1.0)

    def test_multivariate_rejected(self):
        # reference test_multivariate_rv_fails
        with pm.Model():
            x = pm.MvNormal("x", mu=np.zeros(2), cov=np.eye(2))
        with pytest.raises(TypeError, match="multivariate"):
            pm.logp(pmm.max(x), 1.0)

    def test_elemwise_chain_base_rejected(self):
        # scope: bare RVs only (the explicit Max/Min combinators accept any
        # scalar base dist)
        with pm.Model():
            x = pm.Normal("x", 0, 1, size=3)
        with pytest.raises(TypeError, match="bare iid"):
            pm.logp(pmm.max(pmm.exp(x)), 1.0)


class TestSamplingConsistency:
    def test_max_expression_sampling_matches_density(self):
        # forward draws of the expression vs the derived Max density's cdf
        with pm.Model():
            x = pm.Normal("x", 0, 1, size=8)
        y = pmm.max(x)
        draws = np.asarray(pm.draw(y, draws=3000, random_seed=11))
        # KS test against F(x)^8
        from scipy.stats import kstest

        stat, pval = kstest(draws, lambda v: st.norm.cdf(v) ** 8)
        assert pval > 0.01
