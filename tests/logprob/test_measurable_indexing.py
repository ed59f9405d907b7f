"""Basic-index expression measurability: pm.logp(rv[i], v).

Reference joint-subtensor capability (tests/logprob/test_mixture.py:1102
test_joint_logprob_subtensor context): selecting components of an
independent-components expression keeps the product of the selected
marginals (dropping components marginalizes them, valid by independence).
Random indices are component selection (Mixture territory) and are
rejected; advanced indices can replicate components and are rejected.
"""

import numpy as np
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu import math as pmm

MU = np.arange(6.0).reshape(2, 3)


def _grid_rv(name="x"):
    with pm.Model():
        return pm.Normal(name, mu=MU, sigma=1.0)


class TestBasicIndexing:
    def test_scalar_element(self):
        x = _grid_rv()
        np.testing.assert_allclose(
            float(pm.logp(x[0, 1], 0.5)), st.norm(1, 1).logpdf(0.5),
            rtol=1e-6,
        )

    def test_row_and_negative(self):
        x = _grid_rv()
        v = np.array([0.1, -0.2, 0.3])
        np.testing.assert_allclose(
            np.asarray(pm.logp(x[1], v)), st.norm(MU[1], 1).logpdf(v),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(pm.logp(x[-1], v)), st.norm(MU[1], 1).logpdf(v),
            rtol=1e-6,
        )

    def test_slice(self):
        x = _grid_rv()
        v = np.array([[0.4], [0.5]])
        np.testing.assert_allclose(
            np.asarray(pm.logp(x[:, 2:], v)),
            st.norm(MU[:, 2:], 1).logpdf(v),
            rtol=1e-6,
        )

    def test_discrete(self):
        lam = np.arange(1.0, 7.0).reshape(2, 3)
        with pm.Model():
            p = pm.Poisson("p", mu=lam)
        v = np.array([1, 2, 3])
        np.testing.assert_allclose(
            np.asarray(pm.logp(p[0], v)), st.poisson(lam[0]).logpmf(v),
            rtol=1e-6,
        )

    def test_iteration_yields_measurable_elements(self):
        x = _grid_rv()
        parts = list(x[0])
        np.testing.assert_allclose(
            float(pm.logp(parts[2], 1.0)), st.norm(2, 1).logpdf(1.0),
            rtol=1e-6,
        )


class TestComposition:
    def test_index_of_transform_and_transform_of_index(self):
        x = _grid_rv()
        v = np.array([0.3, 0.4, 0.5])
        expected = st.norm(MU[1], 1).logpdf(np.log(v)) - np.log(v)
        np.testing.assert_allclose(
            np.asarray(pm.logp(pmm.exp(x)[1], v)), expected, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pm.logp(pmm.exp(x[1]), v)), expected, rtol=1e-6
        )

    def test_cdf_and_icdf(self):
        x = _grid_rv()
        v = np.array([0.1, -0.2, 0.3])
        np.testing.assert_allclose(
            np.asarray(pm.logcdf(x[1], v)), st.norm(MU[1], 1).logcdf(v),
            rtol=1e-6,
        )
        q = np.array([0.3, 0.5, 0.9])
        np.testing.assert_allclose(
            np.asarray(pm.icdf(x[1], q)), st.norm(MU[1], 1).ppf(q),
            rtol=1e-6,
        )

    def test_forward_sampling(self):
        x = _grid_rv()
        d = np.asarray(pm.draw(x[1], draws=3000, random_seed=5))
        assert d.shape == (3000, 3)
        np.testing.assert_allclose(d.mean(axis=0), MU[1], atol=0.15)


class TestRejections:
    def test_random_index_is_conditional_mixture(self):
        # a scalar random index is the component-selection mixture:
        # logp conditions on the index value from the env
        # (tests/logprob/test_measurable_mixture.py covers it in depth)
        x = _grid_rv()
        with pm.Model():
            i = pm.Categorical("i", p=[0.5, 0.5])
        v = np.ones(3)
        np.testing.assert_allclose(
            np.asarray(pm.logp(x[i], v, env={"i": 1})),
            st.norm(MU[1], 1).logpdf(v),
            rtol=1e-6,
        )

    def test_advanced_index_rejected(self):
        # replication makes the joint density degenerate
        x = _grid_rv()
        with pytest.raises(TypeError, match="advanced|ints and slices"):
            pm.logp(x[np.array([0, 0])], np.zeros((2, 3)))

    def test_multivariate_event_rejected(self):
        with pm.Model():
            m = pm.MvNormal("m", mu=np.zeros(3), cov=np.eye(3))
        with pytest.raises(TypeError, match="multivariate"):
            pm.logp(m[0], 0.0)
