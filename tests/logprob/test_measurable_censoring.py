"""Censoring and rounding expression measurability.

Mirrors reference tests/logprob/test_censoring.py (MeasurableClip:54-486 —
clip/maximum/minimum censoring, nested fusion, one-sided and infinite
bounds, discrete bases, clip logcdf/icdf, rounding ops) on the functional
``pm.logp(pm.math.clip(rv, lo, hi), value)`` API: the expression matcher
(distributions/transformed.py::_match_censoring/_match_rounding) routes
these to the Censored / Discretized combinators.
"""

import numpy as np
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu import math as pmm


def _normal_rv(mu=0.5, sigma=1.0, name="x", **kw):
    with pm.Model():
        return pm.Normal(name, mu=mu, sigma=sigma, **kw)


def _poisson_rv(mu=2.0, name="p", **kw):
    with pm.Model():
        return pm.Poisson(name, mu=mu, **kw)


class TestContinuousClip:
    """Reference test_continuous_rv_clip / test_one_sided_clip."""

    def test_two_sided(self):
        x = _normal_rv()
        y = pmm.clip(x, -2, 2)
        sc = st.norm(0.5, 1)
        assert float(pm.logp(y, -3)) == -np.inf
        assert float(pm.logp(y, 3)) == -np.inf
        np.testing.assert_allclose(float(pm.logp(y, -2)), sc.logcdf(-2))
        np.testing.assert_allclose(float(pm.logp(y, 2)), sc.logsf(2))
        np.testing.assert_allclose(float(pm.logp(y, 0)), sc.logpdf(0))

    def test_one_sided_self_bound_idiom(self):
        # clip(x, lo, x) / clip(x, x, hi): the self-referential side is
        # unbounded (reference test_one_sided_clip)
        x = _normal_rv(mu=0.0)
        sc = st.norm(0, 1)
        lb = pmm.clip(x, -1, x)
        ub = pmm.clip(x, x, 1)
        assert float(pm.logp(lb, -2)) == -np.inf
        assert float(pm.logp(ub, 2)) == -np.inf
        assert float(pm.logp(lb, 2)) != -np.inf
        assert float(pm.logp(ub, -2)) != -np.inf
        np.testing.assert_allclose(float(pm.logp(lb, -1)), sc.logcdf(-1))
        np.testing.assert_allclose(float(pm.logp(ub, -1)), sc.logpdf(-1))

    def test_useless_clip(self):
        # clip(x, x, x) is the identity (reference test_useless_clip)
        x = _normal_rv(size=3)
        y = pmm.clip(x, x, x)
        v = np.array([-2.0, 0.0, 2.0])
        np.testing.assert_allclose(
            np.asarray(pm.logp(y, v)), st.norm(0.5, 1).logpdf(v)
        )

    def test_vector_bounds_broadcast(self):
        x = _normal_rv(size=3)
        y = pmm.clip(x, np.array([-2.0, -1.0, 0.0]), 2.0)
        sc = st.norm(0.5, 1)
        got = np.asarray(pm.logp(y, np.array([-2.0, -1.0, 0.0])))
        np.testing.assert_allclose(
            got, [sc.logcdf(-2), sc.logcdf(-1), sc.logcdf(0)]
        )


class TestDiscreteClip:
    """Reference test_discrete_rv_clip / one-sided infinite bounds."""

    def test_two_sided_poisson(self):
        p = _poisson_rv()
        y = pmm.clip(p, 1, 4)
        pc = st.poisson(2)
        assert float(pm.logp(y, 0)) == -np.inf
        assert float(pm.logp(y, 5)) == -np.inf
        np.testing.assert_allclose(float(pm.logp(y, 1)), pc.logcdf(1))
        np.testing.assert_allclose(
            float(pm.logp(y, 4)), np.logaddexp(pc.logsf(4), pc.logpmf(4))
        )
        np.testing.assert_allclose(float(pm.logp(y, 2)), pc.logpmf(2))

    @pytest.mark.parametrize("side", ("lower", "upper"))
    def test_one_sided_infinite(self, side):
        # infinite bounds mean "unbounded on that side" (reference
        # test_one_sided_infinite_clip_discrete_base)
        p = _poisson_rv()
        pc = st.poisson(2)
        if side == "upper":
            y = pmm.clip(p, -np.inf, 4)
            assert float(pm.logp(y, 5)) == -np.inf
            np.testing.assert_allclose(float(pm.logp(y, 0)), pc.logpmf(0))
            np.testing.assert_allclose(
                float(pm.logp(y, 4)), np.logaddexp(pc.logsf(4), pc.logpmf(4))
            )
        else:
            y = pmm.clip(p, 1, np.inf)
            assert float(pm.logp(y, 0)) == -np.inf
            np.testing.assert_allclose(float(pm.logp(y, 1)), pc.logcdf(1))
            np.testing.assert_allclose(float(pm.logp(y, 5)), pc.logpmf(5))


class TestMaximumMinimum:
    """Reference test_maximum_minimum_censoring and friends."""

    @pytest.mark.parametrize("swap_args", (False, True))
    def test_one_sided(self, swap_args):
        x = _normal_rv()
        if swap_args:
            lb = pmm.maximum(-1.0, x)
            ub = pmm.minimum(1.0, x)
        else:
            lb = pmm.maximum(x, -1.0)
            ub = pmm.minimum(x, 1.0)
        sc = st.norm(0.5, 1)
        np.testing.assert_allclose(float(pm.logp(lb, -1)), sc.logcdf(-1))
        np.testing.assert_allclose(float(pm.logp(ub, 1)), sc.logsf(1))
        np.testing.assert_allclose(float(pm.logp(lb, 0)), sc.logpdf(0))
        np.testing.assert_allclose(float(pm.logp(ub, 0)), sc.logpdf(0))
        assert float(pm.logp(lb, -2)) == -np.inf
        assert float(pm.logp(ub, 2)) == -np.inf

    @pytest.mark.parametrize("max_of_min", (False, True))
    def test_two_sided(self, max_of_min):
        x = _normal_rv()
        if max_of_min:
            y = pmm.maximum(pmm.minimum(x, 1.5), 0.3)
        else:
            y = pmm.minimum(pmm.maximum(x, 0.3), 1.5)
        sc = st.norm(0.5, 1)
        assert float(pm.logp(y, 0.0)) == -np.inf
        assert float(pm.logp(y, 2.0)) == -np.inf
        np.testing.assert_allclose(float(pm.logp(y, 0.3)), sc.logcdf(0.3))
        np.testing.assert_allclose(float(pm.logp(y, 1.5)), sc.logsf(1.5))
        np.testing.assert_allclose(float(pm.logp(y, 1.0)), sc.logpdf(1.0))

    def test_discrete(self):
        # reference test_discrete_maximum_minimum_censoring incl. the
        # two-sided equivalence with clip
        p = _poisson_rv()
        pc = st.poisson(2)
        lb = pmm.maximum(p, 1)
        ub = pmm.minimum(p, 4)
        np.testing.assert_allclose(float(pm.logp(lb, 1)), pc.logcdf(1))
        np.testing.assert_allclose(
            float(pm.logp(ub, 4)), np.logaddexp(pc.logsf(4), pc.logpmf(4))
        )
        np.testing.assert_allclose(float(pm.logp(lb, 2)), pc.logpmf(2))
        assert float(pm.logp(lb, 0)) == -np.inf
        assert float(pm.logp(ub, 5)) == -np.inf
        two = pmm.maximum(pmm.minimum(p, 4), 1)
        np.testing.assert_allclose(float(pm.logp(two, 1)), pc.logcdf(1))
        np.testing.assert_allclose(
            float(pm.logp(two, 4)), np.logaddexp(pc.logsf(4), pc.logpmf(4))
        )
        np.testing.assert_allclose(float(pm.logp(two, 2)), pc.logpmf(2))

    def test_two_rvs_rejected(self):
        # reference test_maximum_of_two_rvs_not_claimed_as_censoring
        with pm.Model():
            x = pm.Normal("x")
            y = pm.Normal("y")
        with pytest.raises(TypeError, match="two random"):
            pm.logp(pmm.maximum(x, y), 1.0)


class TestNestedFusion:
    """Reference test_nested_clip_fusion: bounds combine with max/min."""

    def test_nested_clip(self):
        x = _normal_rv()
        y = pmm.clip(pmm.clip(x, -1.0, 1.0), 0.0, 2.0)  # == clip(x, 0, 1)
        sc = st.norm(0.5, 1)
        np.testing.assert_allclose(float(pm.logp(y, 0.0)), sc.logcdf(0.0))
        np.testing.assert_allclose(float(pm.logp(y, 1.0)), sc.logsf(1.0))
        np.testing.assert_allclose(float(pm.logp(y, 0.5)), sc.logpdf(0.5))
        assert float(pm.logp(y, 1.5)) == -np.inf


class TestClipCdfQuantiles:
    """Reference test_clip_logcdf_icdf."""

    def test_logcdf(self):
        x = _normal_rv()
        y = pmm.clip(x, 0.3, 1.5)
        sc = st.norm(0.5, 1)
        assert float(pm.logcdf(y, 0.1)) == -np.inf
        np.testing.assert_allclose(float(pm.logcdf(y, 0.3)), sc.logcdf(0.3))
        np.testing.assert_allclose(float(pm.logcdf(y, 1.0)), sc.logcdf(1.0))
        assert float(pm.logcdf(y, 1.5)) == 0.0
        assert float(pm.logcdf(y, 2.0)) == 0.0

    def test_icdf_absorbs_tails(self):
        x = _normal_rv()
        y = pmm.clip(x, 0.3, 1.5)
        sc = st.norm(0.5, 1)
        np.testing.assert_allclose(float(pm.icdf(y, 0.05)), 0.3)
        np.testing.assert_allclose(float(pm.icdf(y, 0.5)), sc.ppf(0.5))
        np.testing.assert_allclose(float(pm.icdf(y, 0.99)), 1.5)

    def test_icdf_invalid_q_is_nan(self):
        x = _normal_rv()
        y = pmm.clip(x, 0.3, 1.5)
        assert np.isnan(float(pm.icdf(y, -0.1)))
        assert np.isnan(float(pm.icdf(y, 1.1)))


class TestCensoredChains:
    """Censoring composes below/above measurable transform chains."""

    def test_clip_of_exp_chain(self):
        # clip(exp(x), 1, 3): censored lognormal
        x = _normal_rv()
        y = pmm.clip(pmm.exp(x), 1.0, 3.0)
        ln = st.lognorm(s=1, scale=np.exp(0.5))
        np.testing.assert_allclose(float(pm.logp(y, 1.0)), ln.logcdf(1))
        np.testing.assert_allclose(float(pm.logp(y, 2.0)), ln.logpdf(2))
        np.testing.assert_allclose(float(pm.logp(y, 3.0)), ln.logsf(3))

    def test_transform_over_censored_rejected(self):
        # the Jacobian does not apply at the atoms — reject loudly rather
        # than pool mass into the wrong cells (reference pools this class of
        # error under NotImplementedError for rounding; we reject the
        # transform itself)
        x = _normal_rv()
        with pytest.raises(TypeError, match="censor"):
            pm.logp(pmm.exp(pmm.clip(x, 0.0, 1.0)), 1.0)

    def test_censored_forward_sampling(self):
        x = _normal_rv(mu=0.0)
        y = pmm.clip(x, -0.5, 0.5)
        draws = np.asarray(pm.draw(y, draws=4000, random_seed=7))
        assert draws.min() >= -0.5 and draws.max() <= 0.5
        # atoms at the bounds carry the tail mass ~ Phi(-0.5) = 0.309
        frac_lo = np.mean(draws == -0.5)
        assert abs(frac_lo - st.norm.cdf(-0.5)) < 0.03


class TestRounding:
    """Reference test_rounding / test_rounding_discrete_base /
    test_rounding_censored_base_not_measurable."""

    @pytest.mark.parametrize("method", ("round", "floor", "ceil", "trunc"))
    def test_rounding_ops(self, method):
        x = _normal_rv(mu=1.0, sigma=2.0)
        op = getattr(pmm, method)
        y = op(x)
        sc = st.norm(1, 2)
        cells = {
            "round": (0.5, 1.5),
            "floor": (1.0, 2.0),
            "ceil": (0.0, 1.0),
            "trunc": (1.0, 2.0),
        }
        lo, hi = cells[method]
        np.testing.assert_allclose(
            float(pm.logp(y, 1.0)), np.log(sc.cdf(hi) - sc.cdf(lo)), rtol=1e-6
        )

    def test_trunc_pooled_zero_cell(self):
        x = _normal_rv(mu=0.0)
        y = pmm.trunc(x)
        sc = st.norm(0, 1)
        np.testing.assert_allclose(
            float(pm.logp(y, 0.0)), np.log(sc.cdf(1) - sc.cdf(-1)), rtol=1e-6
        )

    def test_rounding_of_chain(self):
        # round(exp(x)): discretized lognormal
        x = _normal_rv()
        y = pmm.round(pmm.exp(x))
        ln = st.lognorm(s=1, scale=np.exp(0.5))
        np.testing.assert_allclose(
            float(pm.logp(y, 2.0)), np.log(ln.cdf(2.5) - ln.cdf(1.5)),
            rtol=1e-6,
        )

    def test_transform_over_rounding(self):
        # 2 * round(x): lattice-mapped discrete density
        x = _normal_rv()
        y = 2.0 * pmm.round(x)
        sc = st.norm(0.5, 1)
        np.testing.assert_allclose(
            float(pm.logp(y, 2.0)), np.log(sc.cdf(1.5) - sc.cdf(0.5)),
            rtol=1e-6,
        )

    def test_rounding_discrete_base_is_identity(self):
        # reference find_measurable_roundings reduces round(int rv) to a cast
        p = _poisson_rv()
        np.testing.assert_allclose(
            float(pm.logp(pmm.round(p), 2)), st.poisson(2).logpmf(2)
        )

    def test_rounding_censored_rejected(self):
        # reference test_rounding_censored_base_not_measurable
        x = _normal_rv(mu=1.0, sigma=2.0, size=7)
        with pytest.raises(TypeError, match="censored"):
            pm.logp(pmm.round(pmm.clip(x, 0, 3)), np.zeros(7))


class TestModelIntegration:
    """Censored expression densities with symbolic parents."""

    def test_clip_expression_matches_censored_dist(self):
        # the clip-expression density over an RV with a symbolic parent
        # evaluates identically to the explicit Censored combinator
        data = np.clip(
            np.random.default_rng(3).normal(0.5, 1.0, size=50), -1.0, 1.0
        )
        with pm.Model():
            mu = pm.Normal("mu", 0, 1)
            x = pm.Normal("x", mu, 1.0)
        env = {"mu": np.array(0.3)}
        lp_expr = np.asarray(pm.logp(pmm.clip(x, -1.0, 1.0), data, env=env))
        lp_dist = np.asarray(
            pm.Censored.dist(
                pm.Normal.dist(0.3, 1.0), lower=-1.0, upper=1.0
            ).logp(data)
        )
        np.testing.assert_allclose(lp_expr, lp_dist, rtol=1e-6)
        sc = st.norm(0.3, 1)
        expected = np.where(
            data <= -1.0, sc.logcdf(-1),
            np.where(data >= 1.0, sc.logsf(1), sc.logpdf(data)),
        )
        np.testing.assert_allclose(lp_expr, expected, rtol=1e-6)
