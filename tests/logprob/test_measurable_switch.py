"""Non-overlapping measurable switch: piecewise-linear scale transforms.

Mirrors reference tests/logprob/test_switch.py — ``switch(x > 0, x,
scale * x)`` with positive RV-free scale is an increasing bijection whose
derived density follows the change of variables; broadcasting conditions,
non-positive scales, discrete bases, and two-RV switches are rejected.
"""

import numpy as np
import jax
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu import math as pmm
from pymc_tpu.distributions.transformed import dist_from_expression


def _x(shape=3):
    with pm.Model():
        return pm.Normal("x", 0.0, 1.0, shape=shape)


class TestChangeOfVariables:
    def test_matches_reference_formula(self):
        """reference test_switch_non_overlapping_logp_matches_change_of_variables"""
        x = _x()
        scale = 0.5
        y = pmm.switch(x > 0, x, scale * x)
        v = np.array([-2.0, 0.0, 1.5])
        inv = np.where(v > 0, v, v / scale)
        expected = st.norm.logpdf(inv) + np.where(v > 0, 0.0, -np.log(scale))
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)

    def test_mirrored_condition_and_two_scales(self):
        x = _x()
        y = pmm.switch(x < 0, 2.0 * x, 3.0 * x)
        v = np.array([-2.0, 0.1, 1.5])
        inv = np.where(v > 0, v / 3.0, v / 2.0)
        expected = st.norm.logpdf(inv) + np.where(
            v > 0, -np.log(3.0), -np.log(2.0)
        )
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)

    def test_cdf_family_and_icdf(self):
        x = _x()
        y = pmm.switch(x >= 0, x, 0.25 * x)
        v = np.array([-0.4, 0.2, 1.1])
        inv = np.where(v > 0, v, v / 0.25)
        np.testing.assert_allclose(
            np.asarray(pm.logcdf(y, v)), st.norm.logcdf(inv), rtol=1e-6
        )
        q = np.array([0.1, 0.5, 0.9])
        xq = st.norm.ppf(q)
        np.testing.assert_allclose(
            np.asarray(pm.icdf(y, q)),
            np.where(xq > 0, xq, 0.25 * xq),
            rtol=1e-6,
        )

    def test_chain_on_top(self):
        x = _x()
        y = 2.0 * pmm.switch(x > 0, x, 0.5 * x) + 1.0
        v = np.array([0.0, 1.0, 3.0])
        u = (v - 1.0) / 2.0
        inv = np.where(u > 0, u, u / 0.5)
        expected = (
            st.norm.logpdf(inv)
            + np.where(u > 0, 0.0, -np.log(0.5))
            - np.log(2.0)
        )
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)

    def test_asymmetric_laplace_construction(self):
        """Piecewise scaling of a Laplace (the asymmetric-scale use case
        motivating the reference rewrite): closed-form oracle
        pdf_Y(y) = pdf_Z(g^{-1}(y)) |dg^{-1}/dy|."""
        with pm.Model():
            z = pm.Laplace("z", mu=0.0, b=1.0)
        kappa = 2.0
        y = pmm.switch(z > 0, z / kappa, kappa * z)
        v = np.array([-1.5, 0.3, 2.0])
        inv = np.where(v > 0, kappa * v, v / kappa)
        expected = st.laplace.logpdf(inv) + np.where(
            v > 0, np.log(kappa), -np.log(kappa)
        )
        np.testing.assert_allclose(
            np.asarray(pm.logp(y, v)), expected, rtol=1e-6
        )
        d = dist_from_expression(y)
        draws = np.asarray(d.sample(jax.random.PRNGKey(3), (4000,)))
        cdf = lambda t: np.exp(np.asarray(pm.logcdf(d, t)))
        assert st.kstest(draws, cdf).pvalue > 0.005

    def test_sampling_matches_density(self):
        with pm.Model():
            s = pm.Normal("s", 0.0, 1.0)
        d = dist_from_expression(pmm.switch(s > 0, s, 0.5 * s))
        draws = np.asarray(d.sample(jax.random.PRNGKey(0), (4000,)))
        cdf = lambda t: np.exp(np.asarray(pm.logcdf(d, t)))
        assert st.kstest(draws, cdf).pvalue > 0.005


class TestRejections:
    def test_negative_scale(self):
        x = _x()
        with pytest.raises(TypeError, match="scale > 0"):
            pm.logp(pmm.switch(x > 0, x, -0.5 * x), np.zeros(3))

    def test_zero_scale(self):
        x = _x()
        with pytest.raises(TypeError, match="scale > 0"):
            pm.logp(pmm.switch(x > 0, x, 0.0 * x), np.zeros(3))

    def test_discrete_base(self):
        """reference test_switch_non_overlapping_does_not_apply_to_discrete_rv"""
        with pm.Model():
            p_ = pm.Poisson("p_", mu=3.0)
        with pytest.raises(TypeError, match="continuous"):
            pm.logp(pmm.switch(p_ > 0, p_, 0.5 * p_), 1.0)

    def test_two_rv_branches(self):
        with pm.Model():
            a = pm.Normal("a")
            b = pm.Normal("b")
        with pytest.raises(TypeError, match="non-overlapping"):
            pm.logp(pmm.switch(a > 0, a, b), 1.0)

    def test_nonzero_threshold(self):
        x = _x()
        with pytest.raises(TypeError, match="non-overlapping"):
            pm.logp(pmm.switch(x > 1.0, x, 0.5 * x), np.zeros(3))

    def test_scale_broadcasts_x(self):
        """reference test_switch_non_overlapping_does_not_rewrite_if_scale_broadcasts_x"""
        with pm.Model():
            s = pm.Normal("s")  # scalar RV
        scale = np.array([0.5, 2.0, 3.0])
        with pytest.raises(TypeError, match="broadcast"):
            pm.logp(pmm.switch(s > 0, s, scale * s), np.zeros(3))
