"""Cumsum expression measurability: pm.logp(pm.math.cumsum(rv), v).

Mirrors the case inventory of reference tests/logprob/test_cumsum.py
(MeasurableCumsum, logprob/cumsum.py:53-106): the map is unit-lower-
triangular so |det J| = 1 and logp(v) = base.logp(diff_with_first(v)).
Oracles are scipy closed forms, not reference code.
"""

import numpy as np
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu import math as pmm


def _diff_first(v, axis):
    v = np.asarray(v)
    first = np.take(v, [0], axis=axis)
    return np.concatenate([first, np.diff(v, axis=axis)], axis=axis)


@pytest.mark.parametrize(
    "size, axis",
    [
        ((10,), None),
        ((10,), 0),
        ((2, 10), 0),
        ((2, 10), 1),
        ((3, 2, 10), 0),
        ((3, 2, 10), 1),
        ((3, 2, 10), 2),
    ],
)
def test_normal_cumsum(size, axis):
    with pm.Model():
        x = pm.Normal("x", 0.0, 1.0, shape=size)
    rng = np.random.default_rng(0)
    base_draws = rng.normal(size=size)
    v = np.cumsum(base_draws, axis=axis).reshape(size)
    got = np.asarray(pm.logp(pmm.cumsum(x, axis=axis), v))
    ax = 0 if axis is None else axis
    expected = st.norm(0, 1).logpdf(_diff_first(v, ax))
    assert got.shape == tuple(size)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


@pytest.mark.parametrize("size, axis", [((10,), None), ((2, 10), 1)])
def test_bernoulli_cumsum(size, axis):
    with pm.Model():
        b = pm.Bernoulli("b", p=0.9, shape=size)
    rng = np.random.default_rng(1)
    base = rng.integers(0, 2, size=size)
    v = np.cumsum(base, axis=axis).reshape(size)
    got = np.asarray(pm.logp(pmm.cumsum(b, axis=axis), v))
    ax = 0 if axis is None else axis
    expected = st.bernoulli(0.9).logpmf(_diff_first(v, ax))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_destructive_cumsum_fails():
    """axis=None over a multi-dim RV flattens before summing — mixes
    dimensions, no derived density (reference test_destructive_cumsum_fails).
    """
    with pm.Model():
        x = pm.Normal("x", 0.0, 1.0, shape=(2, 2, 2))
    with pytest.raises(TypeError, match="mixes\\s+dimensions"):
        pm.logp(pmm.cumsum(x), np.ones((8,)))


def test_multivariate_cumsum_fails():
    with pm.Model():
        x = pm.MvNormal("x", mu=np.zeros(3), cov=np.eye(3))
    with pytest.raises(TypeError, match="multivariate"):
        pm.logp(pmm.cumsum(x, axis=0), np.ones(3))


def test_elemwise_over_cumsum():
    """exp(cumsum(x)): outer bijection Jacobian stacks on the unit-Jacobian
    cumsum — logp(v) = N(diff(log v)) - log v."""
    with pm.Model():
        x = pm.Normal("x", 0.0, 1.0, shape=(6,))
    rng = np.random.default_rng(2)
    v = np.exp(np.cumsum(rng.normal(size=6)))
    got = np.asarray(pm.logp(pmm.exp(pmm.cumsum(x, axis=0)), v))
    expected = st.norm(0, 1).logpdf(_diff_first(np.log(v), 0)) - np.log(v)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_cumsum_of_transformed():
    """cumsum(exp(x)): the base density is itself derived (lognormal)."""
    with pm.Model():
        x = pm.Normal("x", 0.5, 1.2, shape=(5,))
    rng = np.random.default_rng(3)
    incr = np.exp(rng.normal(0.5, 1.2, size=5))
    v = np.cumsum(incr)
    got = np.asarray(pm.logp(pmm.cumsum(pmm.exp(x), axis=0), v))
    expected = st.lognorm(s=1.2, scale=np.exp(0.5)).logpdf(_diff_first(v, 0))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_cumsum_matches_gaussian_random_walk():
    """cumsum of iid Normal increments IS a zero-init random walk density."""
    with pm.Model():
        x = pm.Normal("x", 0.2, 1.5, shape=(8,))
    rng = np.random.default_rng(4)
    v = np.cumsum(rng.normal(0.2, 1.5, size=8))
    got = float(np.asarray(pm.logp(pmm.cumsum(x, axis=0), v)).sum())
    expected = float(st.norm(0.2, 1.5).logpdf(_diff_first(v, 0)).sum())
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_deterministic_cumsum_unaffected():
    """cumsum used as a downstream parameter stays generative (reference
    test_deterministic_cumsum): the model logp factorizes as
    logp(x) + logp(y | cumsum(x))."""
    with pm.Model() as m:
        x = pm.Normal("x", 1.0, 1.0, shape=(5,))
        pm.Normal("y", mu=pmm.cumsum(x, axis=0), sigma=1.0,
                  observed=np.arange(5) + 1.0)
    lp = float(m.compile_logp()({"x": np.ones(5)}))
    expected = st.norm(1, 1).logpdf(1.0) * 10
    np.testing.assert_allclose(lp, expected, rtol=1e-6)
