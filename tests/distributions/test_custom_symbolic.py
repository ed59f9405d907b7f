"""CustomDist symbolic dist= variant and expression-building over unnamed
``.dist()`` objects.

Mirrors reference tests/distributions/test_custom.py TestCustomSymbolicDist
(test_basic, test_logcdf_inference, test_custom_methods, support_point
inference) — the reference derives the density by rewriting the returned
RandomVariable graph (custom.py:214 CustomSymbolicDistRV); here unnamed
Distribution operands lift to anonymous FreeRV leaves
(Distribution.to_node) and dist_from_expression derives the density.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu import math as pmm


def _lognormal_dist(mu, sigma, size):
    return pmm.exp(pm.Normal.dist(mu, sigma, size=size))


class TestDistExpressionLogp:
    """pm.logp over expressions of unnamed .dist() objects — the
    reference's primary logprob idiom (tests/logprob/test_transforms.py
    uses pt.random.* vars directly)."""

    def test_exp_of_dist(self):
        np.testing.assert_allclose(
            float(pm.logp(pmm.exp(pm.Normal.dist(1.0, 2.0)), 2.5)),
            st.lognorm.logpdf(2.5, 2.0, scale=np.exp(1.0)),
            rtol=1e-12,
        )

    def test_operator_built_expression(self):
        np.testing.assert_allclose(
            float(pm.logp(2.0 * pm.Normal.dist(0.0, 1.0) + 3.0, 4.0)),
            st.norm.logpdf(4.0, 3.0, 2.0),
            rtol=1e-12,
        )

    def test_numpy_left_operand_defers(self):
        # np scalar + dist must route to our reflected operator
        expr = np.float64(3.0) + pm.Normal.dist(0.0, 1.0)
        np.testing.assert_allclose(
            float(pm.logp(expr, 3.5)), st.norm.logpdf(3.5, 3.0), rtol=1e-12
        )

    def test_same_dist_object_is_same_leaf(self):
        # x = Normal.dist(); stack([x, x]) reuses ONE random leaf, which a
        # measurable join must reject as replicated (reference
        # PromisedValuedRV interdependency handling rejects replication too)
        x = pm.Normal.dist(0.0, 1.0)
        with pytest.raises(TypeError, match="replicat|more than one"):
            pm.logp(pmm.stack([x, x]), np.zeros(2))

    def test_distinct_dists_are_independent_leaves(self):
        y = pmm.stack([pm.Normal.dist(0.0, 1.0), pm.Normal.dist(5.0, 2.0)])
        v = np.array([0.3, 4.0])
        np.testing.assert_allclose(
            np.asarray(pm.logp(y, v)),
            [st.norm.logpdf(0.3), st.norm.logpdf(4.0, 5.0, 2.0)],
            rtol=1e-12,
        )

    def test_draw_expression_of_dists(self):
        d = np.asarray(
            pm.draw(pmm.exp(pm.Normal.dist(0.0, 1.0)), draws=1500, random_seed=4)
        )
        assert np.all(d > 0)
        np.testing.assert_allclose(np.log(d).std(), 1.0, atol=0.08)


class TestCustomSymbolicDist:
    def test_basic(self):
        """Reference test_basic: the derived lognormal matches LogNormal."""
        c = pm.CustomDist.dist(1.0, 1.25, dist=_lognormal_dist)
        ref = pm.LogNormal.dist(1.0, 1.25)
        for v in (0.1, 0.9, 3.0):
            np.testing.assert_allclose(
                float(pm.logp(c, v)), float(pm.logp(ref, v)), rtol=1e-10
            )

    def test_logcdf_inference(self):
        """Reference test_logcdf_inference."""
        c = pm.CustomDist.dist(1.0, 1.25, dist=_lognormal_dist)
        np.testing.assert_allclose(
            float(pm.logcdf(c, 0.9)),
            st.lognorm.logcdf(0.9, 1.25, scale=np.exp(1.0)),
            rtol=1e-10,
        )

    def test_size_and_shape(self):
        c = pm.CustomDist.dist(0.0, 1.0, dist=_lognormal_dist, size=(10,))
        assert c.shape == (10,)
        d = np.asarray(pm.draw(c, random_seed=0))
        assert d.shape == (10,)
        assert np.unique(d).size == 10  # independent components

    def test_in_model_posterior_recovery(self):
        y = st.lognorm.rvs(1.0, scale=np.exp(2.0), size=300, random_state=5)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0.0, 5.0)
            pm.CustomDist("y", mu, 1.0, dist=_lognormal_dist, observed=y)
        idata = pm.sample(
            draws=200, tune=200, chains=2, random_seed=2, progressbar=False,
            compute_convergence_checks=False, model=m,
        )
        assert abs(float(idata.posterior["mu"].values.mean()) - 2.0) < 0.2

    def test_latent_gets_derived_transform(self):
        """A positive derived density gives the free RV a log transform."""
        def cpos(lam, size):
            return pm.Exponential.dist(lam=lam, size=size)

        with pm.Model() as m:
            x = pm.CustomDist("x", 2.0, dist=cpos)
        assert "x_log__" in m.initial_point()

    def test_custom_methods_override(self):
        """Reference test_custom_methods: explicit callables win over the
        derived ones; draw still uses the generative expression."""
        def dd(mu, size):
            return pm.DiracDelta.dist(mu, size=size)

        cd = pm.CustomDist.dist(
            np.array([np.e, np.e]),
            dist=dd,
            support_point=lambda mu: np.asarray(mu) + 1,
            logp=lambda v, mu: jnp.full_like(
                jnp.asarray(v, dtype=jnp.result_type(float)), np.e + 2
            ),
            logcdf=lambda v, mu: jnp.full_like(
                jnp.asarray(v, dtype=jnp.result_type(float)), np.e + 3
            ),
        )
        np.testing.assert_allclose(np.asarray(pm.draw(cd)), [np.e, np.e])
        np.testing.assert_allclose(
            np.asarray(cd.support_point()), [np.e + 1, np.e + 1]
        )
        np.testing.assert_allclose(
            np.asarray(pm.logp(cd, np.zeros(2))), [np.e + 2, np.e + 2]
        )
        np.testing.assert_allclose(
            np.asarray(pm.logcdf(cd, np.zeros(2))), [np.e + 3, np.e + 3]
        )

    def test_mixture_expression(self):
        """Reference test_random_multiple_rngs-style: component selection
        inside the generative fn (conditional on the index env value)."""
        def cmix(p, sigma, size):
            idx = pm.Bernoulli.dist(p=p).to_node(name="mix_idx")
            comps = pmm.stack(
                [pm.Normal.dist(-sigma, 1e-1, size=size),
                 pm.Normal.dist(sigma, 1e-1, size=size)]
            )
            return comps[idx]

        c = pm.CustomDist.dist(0.5, 10.0, dist=cmix)
        np.testing.assert_allclose(
            float(pm.logp(c, -9.9, env={"mix_idx": 0})),
            st.norm.logpdf(-9.9, -10.0, 1e-1),
            rtol=1e-9,
        )
        d = np.asarray(pm.draw(c, draws=400, random_seed=1))
        frac = float(np.mean(d > 0))
        assert 0.35 < frac < 0.65

    def test_non_measurable_dist_fn_raises(self):
        def bad(mu, size):
            return pmm.sin(pm.Normal.dist(mu, size=size))  # non-invertible

        with pytest.raises(TypeError):
            pm.CustomDist.dist(0.0, dist=bad)

    def test_requires_logp_or_dist(self):
        with pytest.raises(TypeError, match="logp"):
            pm.CustomDist.dist(1.0, random=lambda mu, rng, size: mu)


class TestCombinatorComposition:
    """Derived symbolic dists compose under the explicit combinators
    (reference: Truncated/Censored/Mixture accept CustomSymbolicDistRV)."""

    def test_truncated_over_symbolic(self):
        c = pm.CustomDist.dist(0.0, 1.0, dist=_lognormal_dist)
        t = pm.Truncated.dist(c, lower=0.5, upper=3.0)
        Z = st.lognorm.cdf(3.0, 1.0) - st.lognorm.cdf(0.5, 1.0)
        np.testing.assert_allclose(
            float(pm.logp(t, 1.0)),
            st.lognorm.logpdf(1.0, 1.0) - np.log(Z),
            rtol=1e-10,
        )

    def test_censored_over_symbolic(self):
        cen = pm.Censored.dist(
            pm.CustomDist.dist(0.0, 1.0, dist=_lognormal_dist),
            lower=None, upper=2.0,
        )
        np.testing.assert_allclose(
            float(pm.logp(cen, 2.0)), st.lognorm.logsf(2.0, 1.0), rtol=1e-10
        )

    def test_mixture_with_symbolic_component(self):
        mix = pm.Mixture.dist(
            w=[0.3, 0.7],
            comp_dists=[
                pm.CustomDist.dist(0.0, 1.0, dist=_lognormal_dist),
                pm.Exponential.dist(lam=1.0),
            ],
        )
        np.testing.assert_allclose(
            float(pm.logp(mix, 1.5)),
            np.log(0.3 * st.lognorm.pdf(1.5, 1.0) + 0.7 * st.expon.pdf(1.5)),
            rtol=1e-10,
        )
