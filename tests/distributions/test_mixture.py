"""Mixture distribution matrix: multivariate components, nested mixtures,
batched weights, validation edges.

Case inventory ported (cases, not code) from reference
tests/distributions/test_mixture.py (TestMixture::test_list_mvnormals_*,
test_single_multivariate_component, test_mixture_of_mixture,
test_components_expanded_by_weights, component-ndim validation) — oracles
are scipy closed forms / explicit logsumexp sums, built independently.
Implementation under test: pymc_tpu/distributions/mixture.py (reference
pymc/distributions/mixture.py:67-490 mix_axis = -ndim_supp-1 semantics).
"""

import numpy as np
import pytest
import scipy.stats as st
from scipy.special import logsumexp

import jax
import jax.numpy as jnp

import pymc_tpu as pm


MU1 = np.array([0.0, 1.0, 2.0])
MU2 = np.array([-3.0, 0.0, 3.0])
COV1 = np.array([[1.0, 0.3, 0.0], [0.3, 1.0, 0.2], [0.0, 0.2, 1.0]])
COV2 = 2.0 * np.eye(3)
W = np.array([0.3, 0.7])


def _mvn_mix_logp(v, w=W, mus=(MU1, MU2), covs=(COV1, COV2)):
    return logsumexp([
        np.log(wi) + st.multivariate_normal(m, c).logpdf(v)
        for wi, m, c in zip(w, mus, covs)
    ])


def _list_mix():
    return pm.Mixture.dist(W, [
        pm.MvNormal.dist(mu=MU1, cov=COV1),
        pm.MvNormal.dist(mu=MU2, cov=COV2),
    ])


class TestMultivariateMixture:
    def test_shapes(self):
        d = _list_mix()
        assert d.batch_shape == ()
        assert tuple(d.event_shape) == (3,)
        assert d.event_ndim == 1
        assert d.shape == (3,)

    def test_logp_oracle_list_components(self):
        d = _list_mix()
        for v in [np.array([0.5, 0.2, 1.5]), MU1, MU2,
                  np.array([10.0, -10.0, 0.0])]:
            np.testing.assert_allclose(
                float(d.logp(v)), _mvn_mix_logp(v), rtol=1e-10
            )

    def test_single_dist_component_axis_matches_list(self):
        """A single MvNormal whose LAST BATCH axis enumerates the components
        (reference mix_axis = -ndim_supp-1) gives the same density."""
        ds = pm.Mixture.dist(W, pm.MvNormal.dist(
            mu=np.stack([MU1, MU2]), cov=np.stack([COV1, COV2])
        ))
        dl = _list_mix()
        assert ds.shape == dl.shape
        for v in [np.array([0.5, 0.2, 1.5]), MU2]:
            np.testing.assert_allclose(
                float(ds.logp(v)), float(dl.logp(v)), rtol=1e-12
            )

    def test_batched_weights_logp(self):
        wB = np.array([[0.2, 0.8], [0.9, 0.1], [0.5, 0.5], [1.0, 0.0]])
        d = pm.Mixture.dist(wB, [
            pm.MvNormal.dist(mu=np.broadcast_to(MU1, (4, 3)), cov=COV1),
            pm.MvNormal.dist(mu=np.broadcast_to(MU2, (4, 3)), cov=COV2),
        ])
        assert d.batch_shape == (4,)
        v = np.array([0.5, 0.2, 1.5])
        vB = np.broadcast_to(v, (4, 3))
        got = np.asarray(d.logp(vB))
        want = [_mvn_mix_logp(v, w=wB[i]) for i in range(4)]
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_sample_moments(self):
        d = _list_mix()
        s = np.asarray(d.sample(jax.random.PRNGKey(0), (20000,)))
        assert s.shape == (20000, 3)
        mean_want = W[0] * MU1 + W[1] * MU2
        np.testing.assert_allclose(s.mean(0), mean_want, atol=0.05)
        # mixture covariance: sum w_i (C_i + mu_i mu_i') - m m'
        cov_want = (
            W[0] * (COV1 + np.outer(MU1, MU1))
            + W[1] * (COV2 + np.outer(MU2, MU2))
            - np.outer(mean_want, mean_want)
        )
        emp = np.cov(s.T)
        np.testing.assert_allclose(emp, cov_want, atol=0.15)

    def test_sample_batch_independence(self):
        """Batched draws must not share one component pick or one
        component draw across the batch (composite-dist sample idiom)."""
        wB = np.broadcast_to(W, (50, 2))
        d = pm.Mixture.dist(wB, [
            pm.MvNormal.dist(mu=np.broadcast_to(MU1, (50, 3)), cov=COV1),
            pm.MvNormal.dist(mu=np.broadcast_to(MU2, (50, 3)), cov=COV2),
        ])
        s = np.asarray(d.sample(jax.random.PRNGKey(3), (40,)))
        assert s.shape == (40, 50, 3)
        # distinct values along the batch axis in every draw
        assert all(len(np.unique(s[i, :, 0])) > 45 for i in range(40))
        # both components appear across the batch (first coord separates
        # the modes by > 1.5)
        frac_near_mu2 = (s[..., 0] < -1.5).mean()
        assert 0.5 < frac_near_mu2 < 0.9  # w2 = 0.7

    def test_support_point_weighted_mean(self):
        d = _list_mix()
        np.testing.assert_allclose(
            np.asarray(d.support_point()), W[0] * MU1 + W[1] * MU2,
            rtol=1e-6,
        )

    def test_logcdf_raises(self):
        with pytest.raises(NotImplementedError, match="multivariate"):
            _list_mix().logcdf(np.zeros(3))

    def test_mismatched_support_ndim_raises(self):
        with pytest.raises(ValueError, match="support dimensionality"):
            pm.Mixture.dist(W, [
                pm.Normal.dist(0, 1), pm.MvNormal.dist(mu=MU1, cov=COV1)
            ])

    def test_weight_axis_mismatch_raises(self):
        with pytest.raises(ValueError, match="weights last axis"):
            pm.Mixture.dist(np.array([0.2, 0.3, 0.5]), [
                pm.MvNormal.dist(mu=MU1, cov=COV1),
                pm.MvNormal.dist(mu=MU2, cov=COV2),
            ])

    def test_unnormalized_weights_neg_inf(self):
        d = pm.Mixture.dist(np.array([0.3, 0.3]), [
            pm.MvNormal.dist(mu=MU1, cov=COV1),
            pm.MvNormal.dist(mu=MU2, cov=COV2),
        ])
        assert float(d.logp(MU1)) == -np.inf

    def test_dirichlet_components(self):
        a1 = np.array([2.0, 3.0, 4.0])
        a2 = np.array([10.0, 1.0, 1.0])
        d = pm.Mixture.dist(W, [
            pm.Dirichlet.dist(a=a1), pm.Dirichlet.dist(a=a2)
        ])
        v = np.array([0.2, 0.3, 0.5])
        want = logsumexp([
            np.log(W[0]) + st.dirichlet(a1).logpdf(v),
            np.log(W[1]) + st.dirichlet(a2).logpdf(v),
        ])
        np.testing.assert_allclose(float(d.logp(v)), want, rtol=1e-10)
        s = np.asarray(d.sample(jax.random.PRNGKey(1), (2000,)))
        np.testing.assert_allclose(s.sum(-1), 1.0, rtol=1e-6)
        mean_want = W[0] * a1 / a1.sum() + W[1] * a2 / a2.sum()
        np.testing.assert_allclose(s.mean(0), mean_want, atol=0.03)

    def test_multinomial_components_discrete(self):
        p1 = np.array([0.2, 0.3, 0.5])
        p2 = np.array([0.8, 0.1, 0.1])
        d = pm.Mixture.dist(W, [
            pm.Multinomial.dist(n=10, p=p1),
            pm.Multinomial.dist(n=10, p=p2),
        ])
        assert d.is_discrete
        v = np.array([2, 3, 5])
        want = logsumexp([
            np.log(W[0]) + st.multinomial(10, p1).logpmf(v),
            np.log(W[1]) + st.multinomial(10, p2).logpmf(v),
        ])
        np.testing.assert_allclose(float(d.logp(v)), want, rtol=1e-10)
        s = np.asarray(d.sample(jax.random.PRNGKey(2), (500,)))
        assert np.issubdtype(s.dtype, np.integer)
        np.testing.assert_array_equal(s.sum(-1), 10)

    def test_explicit_shape_batch(self):
        d = pm.Mixture.dist(W, [
            pm.MvNormal.dist(mu=MU1, cov=COV1),
            pm.MvNormal.dist(mu=MU2, cov=COV2),
        ], shape=(5, 3))
        assert d.batch_shape == (5,)
        assert tuple(d.event_shape) == (3,)
        s = np.asarray(d.sample(jax.random.PRNGKey(4)))
        assert s.shape == (5, 3)
        # independent picks across the expanded batch
        s2 = np.asarray(d.sample(jax.random.PRNGKey(5), (200,)))
        assert len(np.unique(s2[..., 0])) > 500

    def test_model_observed_logp(self):
        rng = np.random.default_rng(0)
        obs = rng.normal(size=(20, 3)) + MU2
        with pm.Model() as m:
            w = pm.Dirichlet("w", a=np.ones(2))
            pm.Mixture("y", w, [
                pm.MvNormal.dist(mu=MU1, cov=COV1),
                pm.MvNormal.dist(mu=MU2, cov=COV2),
            ], observed=obs)
        ip = m.initial_point()
        lp = float(m.logp_fn()(ip))
        assert np.isfinite(lp)
        # oracle at the initial point's w
        from pymc_tpu.distributions.transforms import SimplexTransform

        w_val = np.asarray(
            SimplexTransform().backward(jnp.asarray(ip["w_simplex__"]))
        )
        want = sum(_mvn_mix_logp(v, w=w_val) for v in obs)
        # + dirichlet(1,1) prior logp at w (uniform: logp = log Gamma(2) = 0
        # on the simplex) + transform jacobian — compare the observed term
        # only via delta against a second w-only model
        with pm.Model() as m0:
            pm.Dirichlet("w", a=np.ones(2))
        base = float(m0.logp_fn()({"w_simplex__": ip["w_simplex__"]}))
        np.testing.assert_allclose(lp - base, want, rtol=1e-8)


class TestNestedMixture:
    def test_nested_scalar_logp_oracle(self):
        inner = pm.Mixture.dist(
            np.array([0.5, 0.5]),
            [pm.Normal.dist(-5.0, 1.0), pm.Normal.dist(5.0, 1.0)],
        )
        outer = pm.Mixture.dist(
            np.array([0.4, 0.6]), [inner, pm.Normal.dist(0.0, 1.0)]
        )
        for v in [-5.0, 0.0, 5.0, 2.5]:
            want = logsumexp([
                np.log(0.4) + logsumexp([
                    np.log(0.5) + st.norm(-5, 1).logpdf(v),
                    np.log(0.5) + st.norm(5, 1).logpdf(v),
                ]),
                np.log(0.6) + st.norm(0, 1).logpdf(v),
            ])
            np.testing.assert_allclose(float(outer.logp(v)), want, rtol=1e-10)

    def test_nested_scalar_sampling_mode_fractions(self):
        inner = pm.Mixture.dist(
            np.array([0.5, 0.5]),
            [pm.Normal.dist(-8.0, 0.5), pm.Normal.dist(8.0, 0.5)],
        )
        outer = pm.Mixture.dist(
            np.array([0.4, 0.6]), [inner, pm.Normal.dist(0.0, 0.5)]
        )
        s = np.asarray(outer.sample(jax.random.PRNGKey(0), (20000,)))
        f_neg = (s < -4).mean()
        f_mid = (np.abs(s) < 4).mean()
        f_pos = (s > 4).mean()
        np.testing.assert_allclose(f_neg, 0.4 * 0.5, atol=0.02)
        np.testing.assert_allclose(f_mid, 0.6, atol=0.02)
        np.testing.assert_allclose(f_pos, 0.4 * 0.5, atol=0.02)

    def test_nested_multivariate_logp_oracle(self):
        inner = pm.Mixture.dist(W, [
            pm.MvNormal.dist(mu=MU1, cov=COV1),
            pm.MvNormal.dist(mu=MU2, cov=COV2),
        ])
        mu3 = np.array([5.0, 5.0, 5.0])
        outer = pm.Mixture.dist(
            np.array([0.25, 0.75]), [inner, pm.MvNormal.dist(mu=mu3, cov=COV2)]
        )
        assert outer.event_ndim == 1
        v = np.array([1.0, 0.0, 2.0])
        want = logsumexp([
            np.log(0.25) + _mvn_mix_logp(v),
            np.log(0.75) + st.multivariate_normal(mu3, COV2).logpdf(v),
        ])
        np.testing.assert_allclose(float(outer.logp(v)), want, rtol=1e-10)

    def test_nested_multivariate_sample_mean(self):
        inner = pm.Mixture.dist(W, [
            pm.MvNormal.dist(mu=MU1, cov=COV1),
            pm.MvNormal.dist(mu=MU2, cov=COV2),
        ])
        mu3 = np.array([5.0, 5.0, 5.0])
        outer = pm.Mixture.dist(
            np.array([0.25, 0.75]), [inner, pm.MvNormal.dist(mu=mu3, cov=COV2)]
        )
        s = np.asarray(outer.sample(jax.random.PRNGKey(7), (20000,)))
        want = 0.25 * (W[0] * MU1 + W[1] * MU2) + 0.75 * mu3
        np.testing.assert_allclose(s.mean(0), want, atol=0.08)
