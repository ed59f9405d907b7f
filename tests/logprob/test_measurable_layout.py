"""Layout-op expression measurability: transpose / reshape / ravel /
squeeze of RV expressions.

Mirrors reference tests/logprob/test_tensor.py (MeasurableDimShuffle:255 —
the density rides the index bijection with no Jacobian).
"""

import jax
import numpy as np
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu import math as pmm

MU = np.arange(6.0).reshape(2, 3)


def _grid_rv(name="x"):
    with pm.Model():
        return pm.Normal(name, mu=MU, sigma=1.0)


class TestTranspose:
    def test_T_property(self):
        x = _grid_rv()
        v = np.random.default_rng(0).normal(size=(3, 2))
        got = np.asarray(pm.logp(x.T, v))
        expected = st.norm(MU, 1).logpdf(v.T).T
        assert got.shape == (3, 2)
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_transpose_axes(self):
        x = _grid_rv()
        v = np.random.default_rng(1).normal(size=(3, 2))
        got = np.asarray(pm.logp(x.transpose(1, 0), v))
        np.testing.assert_allclose(
            got, st.norm(MU, 1).logpdf(v.T).T, rtol=1e-6
        )

    def test_swapaxes_3d(self):
        mu = np.arange(24.0).reshape(2, 3, 4)
        with pm.Model():
            x = pm.Normal("x", mu=mu, sigma=1.0)
        v = np.random.default_rng(2).normal(size=(2, 4, 3))
        got = np.asarray(pm.logp(pmm.swapaxes(x, 1, 2), v))
        expected = st.norm(mu, 1).logpdf(np.swapaxes(v, 1, 2)).swapaxes(1, 2)
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_discrete_transpose(self):
        lam = np.arange(1.0, 7.0).reshape(2, 3)
        with pm.Model():
            p = pm.Poisson("p", mu=lam)
        v = np.array([[1, 2], [3, 4], [0, 2]])
        got = np.asarray(pm.logp(p.T, v))
        np.testing.assert_allclose(
            got, st.poisson(lam).logpmf(v.T).T, rtol=1e-6
        )


class TestReshape:
    def test_reshape(self):
        x = _grid_rv()
        v = np.random.default_rng(3).normal(size=6)
        got = np.asarray(pm.logp(x.reshape(6), v))
        np.testing.assert_allclose(
            got, st.norm(MU, 1).logpdf(v.reshape(2, 3)).reshape(6), rtol=1e-6
        )

    def test_ravel_flatten(self):
        x = _grid_rv()
        v = np.random.default_rng(4).normal(size=6)
        expected = st.norm(MU, 1).logpdf(v.reshape(2, 3)).reshape(6)
        np.testing.assert_allclose(
            np.asarray(pm.logp(pmm.flatten(x), v)), expected, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pm.logp(x.ravel(), v)), expected, rtol=1e-6
        )

    def test_squeeze(self):
        with pm.Model():
            x = pm.Normal("x", mu=MU[None], sigma=1.0)  # (1, 2, 3)
        v = np.random.default_rng(5).normal(size=(2, 3))
        got = np.asarray(pm.logp(x.squeeze(0), v))
        np.testing.assert_allclose(got, st.norm(MU, 1).logpdf(v), rtol=1e-6)


class TestComposition:
    def test_elementwise_over_layout(self):
        # exp(x.T): outer transform over the permuted density
        x = _grid_rv()
        v = np.abs(np.random.default_rng(6).normal(size=(3, 2))) + 0.1
        got = np.asarray(pm.logp(pmm.exp(x.T), v))
        expected = st.norm(MU, 1).logpdf(np.log(v).T).T - np.log(v)
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_layout_over_elementwise(self):
        # (exp(x)).T: layout over the transformed density
        x = _grid_rv()
        v = np.abs(np.random.default_rng(7).normal(size=(3, 2))) + 0.1
        got = np.asarray(pm.logp(pmm.exp(x).transpose(1, 0), v))
        expected = st.norm(MU, 1).logpdf(np.log(v).T).T - np.log(v)
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_nested_layouts(self):
        # ravel of transpose: F-order flatten
        x = _grid_rv()
        v = np.random.default_rng(8).normal(size=6)
        got = np.asarray(pm.logp(x.T.ravel(), v))
        expected = st.norm(MU, 1).logpdf(v.reshape(3, 2).T).T.reshape(6)
        np.testing.assert_allclose(got, expected, rtol=1e-6)

    def test_icdf_and_cdf_through_layout(self):
        x = _grid_rv()
        q = np.full((3, 2), 0.7)
        np.testing.assert_allclose(
            np.asarray(pm.icdf(x.T, q)), st.norm(MU, 1).ppf(0.7).T, rtol=1e-6
        )
        v = np.random.default_rng(9).normal(size=(3, 2))
        np.testing.assert_allclose(
            np.asarray(pm.logcdf(x.T, v)),
            st.norm(MU, 1).logcdf(v.T).T,
            rtol=1e-6,
        )

    def test_forward_sampling_shape_and_stats(self):
        x = _grid_rv()
        draws = np.asarray(pm.draw(x.T, draws=2000, random_seed=10))
        assert draws.shape == (2000, 3, 2)
        np.testing.assert_allclose(draws.mean(axis=0), MU.T, atol=0.15)


class TestRejections:
    def test_multivariate_transpose_now_derives(self):
        """A support-moving transpose of a multivariate DERIVES when
        directly valued (was rejected before the multivariate-layout
        support; reference find_measurable_dimshuffles)."""
        with pm.Model():
            x = pm.MvNormal("x", mu=np.zeros(3), cov=np.eye(3), size=2)
        v = np.random.default_rng(9).normal(size=(2, 3))
        lp = np.asarray(pm.logp(x.T, v.T))
        np.testing.assert_allclose(
            lp,
            st.multivariate_normal.logpdf(v, np.zeros(3), np.eye(3)),
            rtol=1e-6,
        )

    def test_repeat_not_measurable(self):
        # repeat duplicates elements — not an index bijection
        x = _grid_rv()
        with pytest.raises(TypeError):
            pm.logp(pmm.repeat(x, 2), np.zeros((4, 3)))


class TestMultivariateLayout:
    """Reference test_measurable_dimshuffle(multivariate=True): the value is
    un-shuffled before the base logp, and the density re-applies only the
    batch part of the order (redo_ds drops the support axes). Orders that
    move the event block off the trailing axes derive only when directly
    valued."""

    def _dirichlet(self, shape):
        with pm.Model():
            d = pm.Dirichlet("d", np.array([1.0, 2.0, 3.0]), shape=shape)
        return d

    @staticmethod
    def _lp(v):
        # scipy dirichlet only takes 1-D batches: loop over flattened rows
        v = np.asarray(v)
        flat = v.reshape(-1, v.shape[-1])
        out = np.array(
            [st.dirichlet.logpdf(row, [1.0, 2.0, 3.0]) for row in flat]
        )
        return out.reshape(v.shape[:-1])

    def test_batch_transpose_keeps_event_trailing(self):
        d = self._dirichlet((4, 2, 3))
        e = d.transpose(1, 0, 2)
        v = np.random.default_rng(0).dirichlet(
            [1.0, 2.0, 3.0], size=(4, 2)
        ).transpose(1, 0, 2)
        lp = np.asarray(pm.logp(e, v))
        assert lp.shape == (2, 4)
        np.testing.assert_allclose(
            lp, self._lp(v.transpose(1, 0, 2)).T, rtol=1e-6
        )

    def test_support_moving_transpose_directly_valued(self):
        """T of a batched Dirichlet moves the simplex axis first: the logp
        is the base batch logp re-indexed by the batch part of the order
        (reference redo_ds)."""
        d = self._dirichlet((2, 3))
        e = d.T  # (3, 2): support axis leading
        base_v = np.random.default_rng(1).dirichlet([1.0, 2.0, 3.0], size=2)
        lp = np.asarray(pm.logp(e, base_v.T))
        assert lp.shape == (2,)
        np.testing.assert_allclose(lp, self._lp(base_v), rtol=1e-6)

    def test_support_moving_transpose_rejects_transform_chain(self):
        d = self._dirichlet((2, 3))
        with pytest.raises(TypeError, match="directly valued"):
            pm.logp(pmm.exp(d.T), np.ones((3, 2)))

    def test_transform_over_batch_transpose(self):
        """Elementwise transform OVER a clean (event-trailing) transpose:
        the Jacobian reduces over the event block."""
        with pm.Model():
            m = pm.MvNormal(
                "m", mu=np.zeros(2), cov=np.eye(2), shape=(4, 3, 2)
            )
        e = pmm.exp(m.transpose(1, 0, 2))
        rng = np.random.default_rng(2)
        base_v = rng.normal(size=(4, 3, 2))
        v = np.exp(base_v.transpose(1, 0, 2))
        lp = np.asarray(pm.logp(e, v))
        expected = (
            st.multivariate_normal.logpdf(base_v, np.zeros(2), np.eye(2)).T
            - np.log(v).sum(-1)
        )
        assert lp.shape == (3, 4)
        np.testing.assert_allclose(lp, expected, rtol=1e-6)

    def test_batch_reshape(self):
        with pm.Model():
            m = pm.MvNormal(
                "m", mu=np.zeros(2), cov=np.eye(2), shape=(2, 3, 2)
            )
        e = m.reshape(6, 2)
        rng = np.random.default_rng(3)
        v = rng.normal(size=(6, 2))
        lp = np.asarray(pm.logp(e, v))
        assert lp.shape == (6,)
        np.testing.assert_allclose(
            lp,
            st.multivariate_normal.logpdf(v, np.zeros(2), np.eye(2)),
            rtol=1e-6,
        )

    def test_reshape_across_event_rejected(self):
        with pm.Model():
            m = pm.MvNormal("m", mu=np.zeros(2), cov=np.eye(2), shape=(3, 2))
        with pytest.raises(TypeError, match="event block"):
            pm.logp(m.reshape(6), np.zeros(6))

    def test_squeeze_batch_axis(self):
        d = self._dirichlet((1, 4, 3))
        e = d.squeeze(0)
        v = np.random.default_rng(4).dirichlet([1.0, 2.0, 3.0], size=4)
        lp = np.asarray(pm.logp(e, v))
        assert lp.shape == (4,)
        np.testing.assert_allclose(lp, self._lp(v), rtol=1e-6)

    def test_cdf_family_raises(self):
        d = self._dirichlet((2, 3))
        with pytest.raises(NotImplementedError, match="layout over a multi"):
            pm.logcdf(d.T, np.ones((3, 2)) / 3.0)

    def test_forward_sampling_through_transpose(self):
        d = self._dirichlet((2, 3))
        from pymc_tpu.distributions.transformed import dist_from_expression

        dist = dist_from_expression(d.T)
        draws = np.asarray(dist.sample(jax.random.PRNGKey(0), (500,)))
        assert draws.shape == (500, 3, 2)
        np.testing.assert_allclose(draws.sum(axis=1), 1.0, rtol=1e-5)
        np.testing.assert_allclose(
            draws.mean(axis=(0, 2)), np.array([1, 2, 3]) / 6.0, atol=0.03
        )
