"""Black-box CustomDist depth battery.

Ports the reference tests/distributions/test_custom.py TestCustomDist
inventory: random= forward draws at sizes, multivariate via
signature="(n)->(n)" (random, logp batch shape, support points),
custom/default support points univariate and multivariate, logp-only dists
sample in MCMC but reject posterior predictive, and signature validation.
"""

import numpy as np
import pytest
import scipy.stats as st

import jax
import jax.numpy as jnp
import pymc_tpu as pm
from pymc_tpu.graph import evaluate


def _eval(x, env=None):
    return np.asarray(evaluate(x, env or {}))


class TestCustomDistBlackBox:
    @pytest.mark.parametrize("size", [(), (3,), (3, 2)], ids=str)
    def test_with_random_draw_shapes(self, size):
        def random(mu, rng=None, size=None):
            return mu + jax.random.normal(rng, size)

        obs = np.random.default_rng(0).normal(size=(10, *size))
        with pm.Model() as model:
            mu = pm.Normal("mu", 0, 1)
            pm.CustomDist(
                "custom_dist", mu,
                logp=lambda value, mu: pm.logp(pm.Normal.dist(mu, 1), value),
                random=random, observed=obs,
            )
        idata = pm.sample_prior_predictive(draws=7, model=model, random_seed=1)
        assert idata.prior_predictive["custom_dist"].values.shape == (
            1, 7, 10, *size
        )

    @pytest.mark.parametrize("size", [(), (3,)], ids=str)
    def test_multivariate_random_signature(self, size):
        supp = 5

        def random(mu, rng=None, size=None):
            return mu + jax.random.normal(rng, tuple(size) + (supp,))

        with pm.Model() as model:
            mu = pm.Normal("mu", 0, 1, size=supp)
            d = pm.CustomDist.dist(
                mu,
                logp=lambda value, mu: pm.MvNormal.dist(
                    mu, cov=np.eye(supp)
                ).logp(value),
                random=random,
                signature="(n)->(n)",
                size=size,
            )
        assert d.event_ndim == 1
        assert d.shape == (*size, supp)

    @pytest.mark.parametrize("size", [(), (3,), (3, 2)], ids=str)
    def test_multivariate_logp_batch_shape(self, size):
        """logp of a signature='(n)->(n)' dist collapses the event axis
        (reference test_custom_dist_multivariate_logp)."""
        supp = 5

        def logp(value, mu):
            return pm.MvNormal.dist(mu, cov=np.eye(supp)).logp(value)

        with pm.Model() as model:
            mu = pm.Normal("mu", size=supp)
            pm.CustomDist("a", mu, logp=logp, signature="(n)->(n)", size=size)
        mu_val = np.random.default_rng(1).normal(size=supp)
        a_val = np.random.default_rng(2).normal(size=(*size, supp))
        terms = model.compile_logp(sum=False)({"mu": mu_val, "a": a_val})
        assert np.asarray(terms["a"]).shape == size
        expected = st.multivariate_normal.logpdf(
            a_val.reshape(-1, supp), mu_val, np.eye(supp)
        ).reshape(size)
        np.testing.assert_allclose(np.asarray(terms["a"]), expected, rtol=1e-8)

    @pytest.mark.parametrize(
        "support_point, size, expected",
        [
            (None, None, 0.0),
            (None, (5,), np.zeros(5)),
            ("custom", (), 5.0),
            ("custom", (2, 5), np.full((2, 5), 5.0)),
        ],
    )
    def test_default_support_point_univariate(self, support_point, size, expected):
        if support_point == "custom":
            support_point = lambda *params: 5.0  # noqa: E731
        kwargs = {"size": size} if size is not None else {}
        d = pm.CustomDist.dist(
            logp=lambda value: -(value**2), support_point=support_point,
            **kwargs,
        )
        np.testing.assert_allclose(np.asarray(d.support_point()), expected)

    @pytest.mark.parametrize("size", [(), (2,)], ids=str)
    def test_custom_support_point_uses_params(self, size):
        def density_support_point(mu):
            return mu

        mu_val = 2.37
        d = pm.CustomDist.dist(
            mu_val, logp=lambda v, mu: -((v - mu) ** 2),
            support_point=density_support_point, size=size,
        )
        sp = np.asarray(d.support_point())
        assert sp.shape == size
        assert np.all(sp == mu_val)

    def test_multivariate_default_support_point(self):
        def random(mu, rng=None, size=None):
            return mu + jax.random.normal(rng, tuple(size) + (5,))

        d = pm.CustomDist.dist(
            np.zeros(5),
            logp=lambda v, mu: pm.MvNormal.dist(mu, cov=np.eye(5)).logp(v),
            random=random, signature="(n)->(n)", size=(2,),
        )
        sp = np.asarray(d.support_point())
        assert sp.shape == (2, 5)
        assert np.all(sp == 0)

    def test_logp_only_samples_but_rejects_ppc(self):
        obs = np.random.default_rng(3).normal(size=20)
        with pm.Model() as model:
            mu = pm.Normal("mu", 0, 1)
            pm.CustomDist(
                "y", mu,
                logp=lambda value, mu: pm.logp(pm.Normal.dist(mu, 1), value),
                observed=obs,
            )
            idata = pm.sample(draws=20, tune=20, chains=1, progressbar=False,
                              compute_convergence_checks=False, random_seed=4)
        with pytest.raises(NotImplementedError):
            pm.sample_posterior_predictive(idata, model=model,
                                           progressbar=False)

    def test_signature_validation(self):
        with pytest.raises(ValueError, match="declares 2 inputs"):
            pm.CustomDist.dist(
                1.0, logp=lambda v, mu: -(v**2), signature="(n),(m)->(n)"
            )
        with pytest.raises(ValueError, match="missing '->'"):
            pm.CustomDist.dist(1.0, logp=lambda v, mu: -(v**2), signature="(n)")

    def test_density_dist_alias(self):
        assert pm.DensityDist is pm.CustomDist
