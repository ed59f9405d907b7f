"""Measurable broadcast_to of RV expressions.

Mirrors reference tests/logprob/test_tensor.py (test_measurable_broadcast,
test_measurable_broadcast_multivariate,
test_broadcast_not_measurable_behind_other_ops) and
pymc/logprob/tensor.py broadcast_logprob:367-436: the broadcast copies are
degenerate duplicates consumed like support dimensions — the logp is the
base logp of the de-duplicated value, and -inf wherever the copies
disagree (the value could not have originated by broadcasting).
"""

import numpy as np
import jax
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu import math as pmm


class TestBroadcastLogp:
    def test_scalar_to_vector(self):
        with pm.Model():
            x = pm.Normal("x", 1.0, 2.0)
        e = pmm.broadcast_to(x, (3,))
        lp = float(pm.logp(e, np.full(3, 0.4)))
        np.testing.assert_allclose(lp, st.norm.logpdf(0.4, 1.0, 2.0), rtol=1e-6)
        assert float(pm.logp(e, np.array([0.4, 0.4, 0.5]))) == -np.inf

    def test_expand_only(self):
        """New leading dims without fanning out existing axes."""
        with pm.Model():
            x = pm.Normal("x", 0.0, 1.0, shape=3)
        e = pmm.broadcast_to(x, (2, 3))
        v = np.array([0.1, -0.2, 0.3])
        lp = np.asarray(pm.logp(e, np.broadcast_to(v, (2, 3))))
        assert lp.shape == (3,)
        np.testing.assert_allclose(lp, st.norm.logpdf(v), rtol=1e-6)

    def test_reference_shape_case(self):
        """logp(broadcast_to(normal(size=(3,1)), (2,3,4)), zeros) ==
        logp(normal(size=(3,)), zeros((3,))) — the reference docstring
        example."""
        with pm.Model():
            x = pm.Normal("x", np.arange(3.0)[:, None], 1.0, shape=(3, 1))
        e = pmm.broadcast_to(x, (2, 3, 4))
        lp = np.asarray(pm.logp(e, np.zeros((2, 3, 4))))
        assert lp.shape == (3,)
        np.testing.assert_allclose(
            lp, st.norm.logpdf(np.zeros(3), np.arange(3.0)), rtol=1e-6
        )

    def test_elementwise_consistency_check(self):
        """Entries that were NOT broadcast from each other keep their own
        logp: disagreement in one fan-out row poisons only that row."""
        with pm.Model():
            x = pm.Normal("x", 0.0, 1.0, shape=(3, 1))
        e = pmm.broadcast_to(x, (3, 2))
        v = np.array([[0.5, 0.5], [1.0, 1.1], [-0.3, -0.3]])
        lp = np.asarray(pm.logp(e, v))
        assert lp.shape == (3,)
        assert np.isfinite(lp[0]) and np.isfinite(lp[2])
        assert lp[1] == -np.inf
        np.testing.assert_allclose(lp[0], st.norm.logpdf(0.5), rtol=1e-6)

    def test_multivariate(self):
        """Reference test_measurable_broadcast_multivariate: the event
        block is consumed by the base logp, the copies by the check."""
        with pm.Model():
            m = pm.MvNormal("m", mu=np.zeros(2), cov=np.eye(2))
        e = pmm.broadcast_to(m, (3, 2))
        v0 = np.array([0.3, -0.4])
        lp = np.asarray(pm.logp(e, np.broadcast_to(v0, (3, 2))))
        np.testing.assert_allclose(
            lp,
            st.multivariate_normal.logpdf(v0, np.zeros(2), np.eye(2)),
            rtol=1e-6,
        )
        bad = np.broadcast_to(v0, (3, 2)).copy()
        bad[1] = [9.0, 9.0]
        assert float(pm.logp(e, bad)) == -np.inf

    def test_not_measurable_behind_other_ops(self):
        """Reference test_broadcast_not_measurable_behind_other_ops: a
        transform over the broadcast would count its Jacobian once per
        copy."""
        with pm.Model():
            x = pm.Normal("x")
        with pytest.raises(TypeError, match="directly valued"):
            pm.logp(pmm.exp(pmm.broadcast_to(x, (3,))), np.ones(3))

    def test_cdf_family_raises(self):
        with pm.Model():
            x = pm.Normal("x")
        with pytest.raises(NotImplementedError, match="broadcast"):
            pm.logcdf(pmm.broadcast_to(x, (3,)), np.zeros(3))


class TestBroadcastForward:
    def test_sampling_copies_agree(self):
        with pm.Model():
            x = pm.Normal("x", 2.0, 1.0)
        from pymc_tpu.distributions.transformed import dist_from_expression

        d = dist_from_expression(pmm.broadcast_to(x, (4,)))
        draws = np.asarray(d.sample(jax.random.PRNGKey(0), (1000,)))
        assert draws.shape == (1000, 4)
        assert np.all(draws == draws[:, :1])
        assert abs(draws[:, 0].mean() - 2.0) < 0.12

    def test_support_point(self):
        with pm.Model():
            x = pm.Normal("x", 2.0, 1.0, shape=(3, 1))
        from pymc_tpu.distributions.transformed import dist_from_expression

        d = dist_from_expression(pmm.broadcast_to(x, (3, 5)))
        sp = np.asarray(d.support_point())
        assert sp.shape == (3, 5)
        np.testing.assert_allclose(sp, 2.0)
