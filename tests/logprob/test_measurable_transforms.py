"""Derived change-of-variables densities for expressions over one RV.

Mirrors reference tests/logprob/test_transforms.py (exp/log/affine/power/
reciprocal/sinh-family measurable transforms) — the user-facing contract is
``pm.logp(pm.math.exp(rv), value)`` and friends on a graph expression whose
single random leaf is a model RV.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu import math as pmm
from pymc_tpu.distributions.transformed import dist_from_expression


def _normal_rv(mu=0.0, sigma=1.0, name="x", **kw):
    with pm.Model():
        return pm.Normal(name, mu=mu, sigma=sigma, **kw)


class TestExpLog:
    def test_exp_normal_is_lognormal(self):
        x = _normal_rv(mu=0.3, sigma=1.4)
        y = pmm.exp(x)
        v = np.array([0.2, 1.0, 3.7])
        expected = st.lognorm.logpdf(v, s=1.4, scale=np.exp(0.3))
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(pm.logcdf(y, v)),
            st.lognorm.logcdf(v, s=1.4, scale=np.exp(0.3)),
            rtol=1e-6,
        )
        q = np.array([0.05, 0.5, 0.93])
        np.testing.assert_allclose(
            np.asarray(pm.icdf(y, q)),
            st.lognorm.ppf(q, s=1.4, scale=np.exp(0.3)),
            rtol=1e-6,
        )

    def test_log_lognormal_is_normal(self):
        with pm.Model():
            x = pm.LogNormal("x", mu=-0.2, sigma=0.8)
        y = pmm.log(x)
        v = np.array([-1.5, 0.0, 0.9])
        np.testing.assert_allclose(
            np.asarray(pm.logp(y, v)),
            st.norm.logpdf(v, loc=-0.2, scale=0.8),
            rtol=1e-6,
        )

    def test_log_gamma_vs_scipy(self):
        with pm.Model():
            x = pm.Gamma("x", alpha=2.5, beta=1.7)
        y = pmm.log(x)
        v = np.array([-0.8, 0.1, 1.2])
        # pdf_Y(y) = pdf_X(e^y) * e^y
        expected = st.gamma.logpdf(np.exp(v), a=2.5, scale=1 / 1.7) + v
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)


class TestAffine:
    @pytest.mark.parametrize("a,b", [(2.0, 3.0), (-1.5, 0.7), (0.25, -4.0)])
    def test_scale_shift_normal(self, a, b):
        x = _normal_rv()
        y = a * x + b
        v = np.array([-2.0, 0.3, 5.0])
        np.testing.assert_allclose(
            np.asarray(pm.logp(y, v)),
            st.norm.logpdf(v, loc=b, scale=abs(a)),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(pm.logcdf(y, v)),
            st.norm.logcdf(v, loc=b, scale=abs(a)),
            rtol=1e-6,
            atol=1e-12,
        )
        q = np.array([0.1, 0.5, 0.98])
        np.testing.assert_allclose(
            np.asarray(pm.icdf(y, q)),
            st.norm.ppf(q, loc=b, scale=abs(a)),
            rtol=1e-6,
        )

    def test_rsub_decreasing(self):
        x = _normal_rv(mu=1.0, sigma=2.0)
        y = 5.0 - x  # ~ Normal(4, 2)
        v = np.array([0.0, 4.0, 7.5])
        np.testing.assert_allclose(
            np.asarray(pm.logp(y, v)), st.norm.logpdf(v, 4.0, 2.0), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pm.logcdf(y, v)), st.norm.logcdf(v, 4.0, 2.0), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pm.logccdf(y, v)), st.norm.logsf(v, 4.0, 2.0), rtol=1e-6
        )

    def test_neg_icdf(self):
        x = _normal_rv(mu=1.0, sigma=1.0)
        y = -x
        q = np.array([0.2, 0.5, 0.9])
        np.testing.assert_allclose(
            np.asarray(pm.icdf(y, q)), st.norm.ppf(q, loc=-1.0), rtol=1e-6
        )

    def test_div_by_const(self):
        with pm.Model():
            x = pm.Exponential("x", lam=2.0)
        y = x / 3.0  # Exponential(lam=6)
        v = np.array([0.1, 0.5, 2.0])
        np.testing.assert_allclose(
            np.asarray(pm.logp(y, v)), st.expon.logpdf(v, scale=1 / 6), rtol=1e-6
        )

    def test_vector_constant_broadcast(self):
        x = _normal_rv()
        c = np.array([1.0, 2.0, 4.0])
        y = c * x
        v = np.array([0.5, 0.5, 0.5])
        np.testing.assert_allclose(
            np.asarray(pm.logp(y, v)), st.norm.logpdf(v, scale=c), rtol=1e-6
        )
        assert pm.logp(y, 0.5).shape == (3,)


class TestChains:
    def test_exp_affine_chain(self):
        x = _normal_rv(mu=0.1, sigma=0.9)
        y = 2.0 * pmm.exp(x) + 1.0  # shifted, scaled lognormal
        v = np.array([1.3, 2.0, 6.0])
        expected = st.lognorm.logpdf(v, s=0.9, loc=1.0, scale=2 * np.exp(0.1))
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)
        q = np.array([0.15, 0.5, 0.85])
        np.testing.assert_allclose(
            np.asarray(pm.icdf(y, q)),
            st.lognorm.ppf(q, s=0.9, loc=1.0, scale=2 * np.exp(0.1)),
            rtol=1e-6,
        )

    def test_cdf_density_consistency_cube(self):
        """d/dy CDF(y) == pdf(y) for y = x**3 (autodiff oracle)."""
        x = _normal_rv(mu=0.2, sigma=1.1)
        y = x ** 3.0
        for v in [-3.0, -0.5, 0.4, 8.0]:
            cdf_grad = jax.grad(lambda t: jnp.exp(pm.logcdf(y, t)))(v)
            np.testing.assert_allclose(
                float(cdf_grad), float(jnp.exp(pm.logp(y, v))), rtol=1e-5
            )

    def test_sigmoid_normal_is_logitnormal(self):
        x = _normal_rv(mu=0.3, sigma=1.2)
        y = pmm.invlogit(x)
        v = np.array([0.1, 0.5, 0.92])
        expected = st.norm.logpdf(st.norm.ppf(v) * 0 + np.log(v / (1 - v)), 0.3, 1.2) - np.log(
            v * (1 - v)
        )
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)

    def test_const_base_power(self):
        x = _normal_rv()
        y = 2.0 ** x  # log2(Y) ~ N(0,1) -> lognormal with s = ln 2
        v = np.array([0.3, 1.0, 4.2])
        np.testing.assert_allclose(
            np.asarray(pm.logp(y, v)),
            st.lognorm.logpdf(v, s=np.log(2.0)),
            rtol=1e-6,
        )


class TestReciprocalPower:
    def test_reciprocal_gamma_is_invgamma(self):
        with pm.Model():
            x = pm.Gamma("x", alpha=3.0, beta=2.0)
        y = 1.0 / x
        v = np.array([0.2, 0.7, 1.5])
        np.testing.assert_allclose(
            np.asarray(pm.logp(y, v)),
            st.invgamma.logpdf(v, a=3.0, scale=2.0),
            rtol=1e-6,
        )
        # sign-ambiguous direction: cdf-family must raise, not silently lie
        with pytest.raises(NotImplementedError):
            pm.logcdf(y, v)

    def test_even_power_now_folds(self):
        """x**2 derives as a two-branch folded density (was rejected before
        the FoldedDistribution support; reference PowerTransform even
        powers) — x**2 of a standard normal is chi-squared(1)."""
        x = _normal_rv()
        np.testing.assert_allclose(
            float(pm.logp(x ** 2.0, 1.4)),
            st.chi2.logpdf(1.4, df=1),
            rtol=1e-9,
        )
        assert np.isneginf(float(pm.logp(x ** 2.0, -1.0)))

    def test_sqrt_exponential(self):
        with pm.Model():
            x = pm.Exponential("x", lam=1.3)
        y = pmm.sqrt(x)  # Weibull(k=2)-style
        v = np.array([0.3, 0.8, 1.9])
        expected = st.expon.logpdf(v**2, scale=1 / 1.3) + np.log(2 * v)
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)


class TestDiscrete:
    def test_scaled_poisson_lattice(self):
        with pm.Model():
            x = pm.Poisson("x", mu=3.0)
        y = 2.0 * x
        assert np.isclose(float(pm.logp(y, 6.0)), st.poisson.logpmf(3, 3.0), rtol=1e-6)
        assert float(pm.logp(y, 5.0)) == -np.inf  # off-lattice
        assert np.isclose(float(pm.logp(y, 0.0)), st.poisson.logpmf(0, 3.0), rtol=1e-6)

    def test_shifted_poisson(self):
        with pm.Model():
            x = pm.Poisson("x", mu=2.0)
        y = x + 10.0
        assert np.isclose(
            float(pm.logp(y, 12.0)), st.poisson.logpmf(2, 2.0), rtol=1e-6
        )
        assert np.isclose(
            float(jnp.exp(pm.logcdf(y, 12.0))), st.poisson.cdf(2, 2.0), rtol=1e-6
        )


class TestMultivariateBase:
    def test_exp_mvnormal_is_mv_lognormal(self):
        mu = np.array([0.2, -0.4, 0.1])
        cov = np.array([[1.0, 0.3, 0.0], [0.3, 0.8, 0.2], [0.0, 0.2, 1.4]])
        with pm.Model():
            x = pm.MvNormal("x", mu=mu, cov=cov)
        y = pmm.exp(x)
        v = np.array([0.7, 1.3, 2.1])
        expected = st.multivariate_normal.logpdf(np.log(v), mu, cov) - np.sum(
            np.log(v)
        )
        np.testing.assert_allclose(float(pm.logp(y, v)), expected, rtol=1e-6)
        # batch of values reduces only the event axis
        vb = np.stack([v, 2 * v])
        assert pm.logp(y, vb).shape == (2,)

    def test_affine_dirichlet(self):
        a = np.array([2.0, 3.0, 4.0])
        with pm.Model():
            x = pm.Dirichlet("x", a=a)
        y = 2.0 * x + 1.0
        v = np.array([0.2, 0.3, 0.5])
        expected = st.dirichlet.logpdf(v, a) - 3 * np.log(2.0)
        np.testing.assert_allclose(
            float(pm.logp(y, 2 * v + 1)), expected, rtol=1e-6
        )

    def test_scaled_multinomial_lattice(self):
        with pm.Model():
            x = pm.Multinomial("x", n=5, p=np.array([0.2, 0.3, 0.5]))
        y = 2.0 * x
        counts = np.array([1, 2, 2])
        np.testing.assert_allclose(
            float(pm.logp(y, 2.0 * counts)),
            st.multinomial.logpmf(counts, 5, [0.2, 0.3, 0.5]),
            rtol=1e-6,
        )
        # one off-lattice element kills the whole event
        assert float(pm.logp(y, np.array([2.0, 4.0, 3.0]))) == -np.inf


class TestErrors:
    def test_abs_now_folds(self):
        """abs derives as a folded density (was rejected before the
        FoldedDistribution support; reference AbsTransform) — abs of a
        standard normal is half-normal."""
        x = _normal_rv()
        np.testing.assert_allclose(
            float(pm.logp(abs(x), 1.0)),
            st.halfnorm.logpdf(1.0),
            rtol=1e-9,
        )

    def test_sign_still_rejected(self):
        x = _normal_rv()
        with pytest.raises(TypeError, match="not invertible"):
            pm.logp(pmm.sign(x), 1.0)

    def test_two_rv_sum_rejected(self):
        with pm.Model():
            a = pm.Normal("a")
            b = pm.Normal("b")
        with pytest.raises(TypeError, match="exactly one random operand"):
            pm.logp(a + b, 1.0)

    def test_unknown_op_rejected(self):
        x = _normal_rv()
        with pytest.raises(TypeError):
            pm.logp(pmm.cos(x), 0.3)


def _expr_cases():
    """(expression builder, scipy sampling oracle) pairs spanning the full
    unary-op inventory. Each case is checked with the generic autodiff
    oracle d/dy exp(logcdf(y)) == exp(logp(y)) plus an icdf round-trip."""

    def normal(name="x", mu=0.0, sigma=1.0):
        with pm.Model():
            return pm.Normal(name, mu=mu, sigma=sigma)

    def uniform01(name="x"):
        with pm.Model():
            return pm.Uniform(name, 0.02, 0.98)

    def halfnormal(name="x"):
        with pm.Model():
            return pm.HalfNormal(name, sigma=1.0)

    return [
        ("sinh", lambda: pmm.sinh(normal()), [-2.0, 0.3, 4.0]),
        ("arcsinh", lambda: pmm.arcsinh(normal()), [-1.2, 0.0, 0.8]),
        ("tanh", lambda: pmm.tanh(normal()), [-0.8, 0.1, 0.95]),
        ("arctanh", lambda: pmm.arctanh(2.0 * uniform01() - 1.0), [-1.5, 0.2, 2.0]),
        ("erf", lambda: pmm.erf(normal()), [-0.9, 0.0, 0.7]),
        ("erfinv", lambda: pmm.erfinv(2.0 * uniform01() - 1.0), [-1.3, 0.1, 1.4]),
        ("softplus", lambda: pmm.softplus(normal()), [0.2, 0.9, 2.5]),
        ("probit", lambda: pmm.probit(uniform01()), [-1.8, 0.0, 1.8]),
        ("invprobit", lambda: pmm.invprobit(normal()), [0.1, 0.5, 0.9]),
        ("expm1", lambda: pmm.expm1(normal()), [-0.6, 0.3, 2.0]),
        ("log1p", lambda: pmm.log1p(halfnormal()), [0.1, 0.5, 1.2]),
        ("cbrt", lambda: pmm.cbrt(normal()), [-1.2, 0.3, 1.1]),
        ("chain-mix", lambda: pmm.tanh(0.5 * normal() + 0.2), [-0.7, 0.0, 0.8]),
    ]


class TestUnaryInventory:
    @pytest.mark.parametrize(
        "name,build,vals", _expr_cases(), ids=[c[0] for c in _expr_cases()]
    )
    def test_cdf_density_consistency(self, name, build, vals):
        y = build()
        for v in vals:
            cdf_grad = jax.grad(lambda t: jnp.exp(pm.logcdf(y, t)))(v)
            pdf = jnp.exp(pm.logp(y, v))
            np.testing.assert_allclose(float(cdf_grad), float(pdf), rtol=2e-5)

    @pytest.mark.parametrize(
        "name,build,vals", _expr_cases(), ids=[c[0] for c in _expr_cases()]
    )
    def test_icdf_roundtrip(self, name, build, vals):
        y = build()
        for q in [0.12, 0.5, 0.88]:
            v = pm.icdf(y, q)
            np.testing.assert_allclose(float(jnp.exp(pm.logcdf(y, v))), q, rtol=1e-5)

    @pytest.mark.parametrize(
        "name,build,vals", _expr_cases(), ids=[c[0] for c in _expr_cases()]
    )
    def test_sampling_matches_density(self, name, build, vals):
        """KS test of forward draws against the derived CDF."""
        d = dist_from_expression(build())
        draws = np.asarray(d.sample(jax.random.PRNGKey(42), (2000,)))
        cdf = lambda t: np.exp(np.asarray(pm.logcdf(d, t)))
        assert st.kstest(draws, cdf).pvalue > 0.005


class TestSampling:
    def test_forward_sampling_matches_transform(self):
        x = _normal_rv(mu=0.5, sigma=0.7)
        d = dist_from_expression(2.0 * pmm.exp(x) + 1.0)
        draws = np.asarray(d.sample(jax.random.PRNGKey(0), (4000,)))
        ref = st.lognorm(s=0.7, loc=1.0, scale=2 * np.exp(0.5))
        assert st.kstest(draws, ref.cdf).pvalue > 0.01

    def test_support_point_is_forward_of_base(self):
        x = _normal_rv(mu=1.5)
        d = dist_from_expression(pmm.exp(x))
        np.testing.assert_allclose(float(d.support_point()), np.exp(1.5), rtol=1e-6)
