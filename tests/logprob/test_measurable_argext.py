"""Competing-risks argmax/argmin measurability.

Mirrors reference tests/logprob/test_order.py:289-451 (categorical_from_argmax,
logprob/order.py:256): argmin of independent Exponential/Weibull races and
argmax of Gumbel races have closed-form Categorical winner densities; loc/
scale lifts fold into the base parameters.
"""

import numpy as np
import pytest
import scipy.stats  # noqa: F401  (parity with reference imports)

import pymc_tpu as pm
from pymc_tpu import math as pmm

PROBS = np.array([0.1, 0.3, 0.6])
VV = np.array([[0, 1, 2, 0], [1, 2, 2, 2]])


class TestExponentialRace:
    def test_scaled_exponential_argmin(self):
        # reference test_exponential: scale lifted via s * scale
        scale = 1 / (PROBS * np.e)[None, :, None]
        with pm.Model():
            s = pm.Exponential("s", 1.0, size=(2, 3, 4))
        x = pmm.argmin(s * scale, axis=1)
        got = np.exp(np.asarray(pm.logp(x, VV)))
        np.testing.assert_allclose(got, PROBS[VV], rtol=1e-6)

    def test_direct_rate_parametrization(self):
        # equivalent direct form: argmin(Exponential(lam)) -> Cat(lam/sum)
        with pm.Model():
            s = pm.Exponential(
                "s", lam=(PROBS * np.e)[None, :, None], size=(2, 3, 4)
            )
        x = pmm.argmin(s, axis=1)
        got = np.exp(np.asarray(pm.logp(x, VV)))
        np.testing.assert_allclose(got, PROBS[VV], rtol=1e-6)

    def test_axis_none_full_race(self):
        with pm.Model():
            e = pm.Exponential("e", lam=np.array([[1.0, 2.0], [3.0, 4.0]]))
        x = pmm.argmin(e)
        got = np.exp(np.asarray([float(pm.logp(x, k)) for k in range(4)]))
        np.testing.assert_allclose(got, np.array([1, 2, 3, 4]) / 10.0,
                                   rtol=1e-6)

    def test_sampling_matches_density(self):
        with pm.Model():
            e = pm.Exponential("e", lam=np.array([[1.0, 2.0], [3.0, 4.0]]))
        d = np.asarray(pm.draw(pmm.argmin(e), draws=4000, random_seed=3))
        freq = np.bincount(d.ravel(), minlength=4) / d.size
        np.testing.assert_allclose(freq, np.array([1, 2, 3, 4]) / 10.0,
                                   atol=0.03)

    def test_argmax_rejected(self):
        # reference: argmax of exponential race has no closed form
        with pm.Model():
            e = pm.Exponential("e", 1.0, size=3)
        with pytest.raises(TypeError, match="argmax"):
            pm.logp(pmm.argmax(e), 1)

    def test_shifted_race_rejected(self):
        with pm.Model():
            e = pm.Exponential("e", 1.0, size=3)
        with pytest.raises(TypeError, match="shift"):
            pm.logp(pmm.argmin(e + 1.0), 1)


class TestWeibullRace:
    def test_weibull_argmin(self):
        # reference test_weibull: shape iid on the race axis, lifted scale
        iid_shape = np.array([np.pi, np.e])[:, None, None]
        wscale = PROBS[None, :, None] ** (-1 / iid_shape)
        with pm.Model():
            w = pm.Weibull("w", alpha=iid_shape, beta=1.0, size=(2, 3, 4))
        x = pmm.argmin(w * wscale, axis=1)
        got = np.exp(np.asarray(pm.logp(x, VV)))
        np.testing.assert_allclose(got, PROBS[VV], rtol=1e-6)

    def test_varying_shape_rejected(self):
        # the Weibull shape must be constant across the race axes
        with pm.Model():
            w = pm.Weibull("w", alpha=np.array([1.0, 2.0, 3.0]), beta=1.0)
        with pytest.raises(TypeError, match="constant across"):
            pm.logp(pmm.argmin(w), 1)


class TestGumbelRace:
    def test_gumbel_argmax(self):
        # argmax(Gumbel(log p, 1)) -> Categorical(p)
        with pm.Model():
            g = pm.Gumbel("g", mu=np.log(PROBS), beta=1.0)
        x = pmm.argmax(g)
        got = np.exp(np.asarray([float(pm.logp(x, k)) for k in range(3)]))
        np.testing.assert_allclose(got, PROBS, rtol=1e-6)

    def test_location_shift_lift(self):
        # (c + gumbel): shifts fold into the location
        with pm.Model():
            g = pm.Gumbel("g", mu=np.log(PROBS), beta=1.0)
        c = np.log(np.array([2.0, 1.0, 1.0]))
        x = pmm.argmax(g + c)
        expected = PROBS * np.array([2.0, 1.0, 1.0])
        expected /= expected.sum()
        got = np.exp(np.asarray([float(pm.logp(x, k)) for k in range(3)]))
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_scale_invariance(self):
        # b * gumbel scales loc AND scale: the race is unchanged
        with pm.Model():
            g = pm.Gumbel("g", mu=np.log(PROBS), beta=1.0)
        x = pmm.argmax(3.7 * g)
        got = np.exp(np.asarray([float(pm.logp(x, k)) for k in range(3)]))
        np.testing.assert_allclose(got, PROBS, rtol=1e-6)

    def test_varying_scale_rejected(self):
        with pm.Model():
            g = pm.Gumbel("g", mu=0.0, beta=np.array([1.0, 2.0, 3.0]))
        with pytest.raises(TypeError, match="constant across"):
            pm.logp(pmm.argmax(g), 1)

    def test_frechet_not_supported(self):
        # exp(gumbel) argmax — reference xfails this too (needs the exp
        # lift); must reject rather than silently mis-derive
        with pm.Model():
            g = pm.Gumbel("g", mu=np.log(PROBS), beta=1.0)
        with pytest.raises(TypeError):
            pm.logp(pmm.argmax(pmm.exp(g)), 1)
