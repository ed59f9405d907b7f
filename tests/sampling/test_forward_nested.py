"""Nested-random forward sweep.

Ports the reference TestNestedRandom matrix (tests/sampling/test_forward.py:
1838-2124): distributions whose parameters are themselves RVs at assorted
shapes must produce prior-predictive draws of exactly `(chain, draws, *shape)`
— the class of bug this catches is a nested param draw broadcasting ONE value
across the target batch (CLAUDE.md composite-dist idiom). Plus
test_distinct_rvs (model RVs get distinct randomness; seeding is
reproducible across models).
"""

import numpy as np
import pytest

import pymc_tpu as pm


def _sample_prior(dist_cls, shape, nested_info, draws=10):
    with pm.Model() as model:
        kwargs = {}
        for name, info in nested_info.items():
            value, nested_shape = info[0], info[1]
            loc = info[2] if len(info) > 2 else 0.0
            if value is None:
                kwargs[name] = pm.Uniform(name, 0.0 + loc, 1.0 + loc,
                                          shape=nested_shape)
            else:
                kwargs[name] = value * np.ones(nested_shape)
        dist_cls("target", shape=shape, **kwargs)
        idata = pm.sample_prior_predictive(draws=draws, random_seed=42)
    return idata


def _check(dist_cls, shape, nested_info, draws=10):
    idata = _sample_prior(dist_cls, shape, nested_info, draws)
    vals = idata.prior["target"].values
    assert vals.shape == (1, draws, *shape), (vals.shape, shape)
    assert np.all(np.isfinite(vals.astype(float)))
    # nested RV params must vary across prior draws -> so must the target
    flat = vals.reshape(draws, -1)
    assert len(np.unique(flat[:, 0])) > 1
    return vals


class TestNestedRandom:
    @pytest.mark.parametrize(
        "shape, mu, alpha",
        [
            ((3,), (None, ()), (None, (3,))),
            ((3,), (None, (3,)), (None, ())),
            ((4, 3), (None, (3,)), (None, (3,))),
            ((4, 3), (None, (3,)), (None, (4, 3))),
        ],
        ids=str,
    )
    def test_NegativeBinomial(self, shape, mu, alpha):
        _check(pm.NegativeBinomial, shape,
               {"mu": (*mu, 1.0), "alpha": (*alpha, 2.0)})

    @pytest.mark.parametrize(
        "shape, psi, mu, alpha",
        [
            ((3,), (0.5, ()), (None, (3,), 1.0), (None, (3,))),
            ((3,), (None, ()), (None, (3,), 1.0), (None, ())),
            ((4, 3), (None, (3,)), (None, (3,), 1.0), (None, (3,))),
            ((4, 3), (None, (3,)), (None, (3,), 1.0), (None, (4, 3))),
        ],
        ids=str,
    )
    def test_ZeroInflatedNegativeBinomial(self, shape, psi, mu, alpha):
        _check(pm.ZeroInflatedNegativeBinomial, shape,
               {"psi": psi, "mu": mu, "alpha": (*alpha, 2.0)})

    @pytest.mark.parametrize(
        "shape, nu, sigma",
        [
            ((3,), (None, (3,)), (1.0, ())),
            ((3,), (None, ()), (None, (3,))),
            ((4, 3), (None, (3,)), (None, (3,))),
            ((4, 3), (None, (4, 3)), (None, ())),
        ],
        ids=str,
    )
    def test_Rice(self, shape, nu, sigma):
        _check(pm.Rice, shape, {"nu": (*nu, 1.0), "sigma": (*sigma, 1.0)})

    @pytest.mark.parametrize(
        "shape, lower, upper",
        [
            ((3,), (-1.0, (3,)), (None, (3,), 2.0)),
            ((3,), (None, (), -1.0), (None, (3,), 2.0)),
            ((4, 3), (None, (3,), -1.0), (None, (3,), 2.0)),
            ((4, 3), (None, (4, 3), -1.0), (None, (), 2.0)),
        ],
        ids=str,
    )
    def test_TruncatedNormal(self, shape, lower, upper):
        vals = _check(pm.TruncatedNormal, shape,
                      {"lower": lower, "upper": upper})
        assert np.all(vals > -1.0) and np.all(vals < 3.0)

    @pytest.mark.parametrize(
        "shape, lower, c, upper",
        [
            ((3,), (0.0, ()), (None, (3,)), (3.0, ())),
            ((3,), (None, (), -1.0), (None, (3,)), (3.0, ())),
            ((4, 3), (None, (3,), -1.0), (None, (3,)), (3.0, ())),
        ],
        ids=str,
    )
    def test_Triangular(self, shape, lower, c, upper):
        vals = _check(pm.Triangular, shape,
                      {"lower": lower, "c": c, "upper": upper})
        assert np.all(vals > -1.0) and np.all(vals < 3.0)


def test_distinct_rvs():
    """Two RVs in one model draw DISTINCT randomness; the same seed
    reproduces across separately-built models (reference test_distinct_rvs)."""
    with pm.Model():
        pm.Normal("x")
        pm.Normal("y")
        s1 = pm.sample_prior_predictive(draws=5, random_seed=2023532)
    assert not np.allclose(s1.prior["x"].values, s1.prior["y"].values)

    with pm.Model():
        pm.Normal("x")
        pm.Normal("y")
        s2 = pm.sample_prior_predictive(draws=5, random_seed=2023532)
    np.testing.assert_array_equal(s1.prior["y"].values, s2.prior["y"].values)


def test_draw_different_samples():
    d = pm.Normal.dist()
    a = pm.draw(d, draws=10, random_seed=1)
    b = pm.draw(d, draws=10, random_seed=2)
    assert not np.any(a == b)
    c = pm.draw(d, draws=10, random_seed=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
