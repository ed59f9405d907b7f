"""Measurable stack/concatenate of RV expressions.

Mirrors reference tests/logprob/test_tensor.py (MeasurableMakeVector:
test_measurable_make_vector, interdependent variants, constant inputs;
MeasurableJoin: test_measurable_join_univariate) — the contract is
``pm.logp(pm.math.stack([rv1, rv2]), v)`` yielding the elementwise joint
density with chain-rule factorization for interdependent components.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu import math as pmm
from pymc_tpu.distributions.transformed import dist_from_expression


class TestMakeVector:
    def test_independent_scalars(self):
        with pm.Model():
            a = pm.Normal("a", 1.0, 2.0)
            b = pm.Exponential("b", lam=0.5)
            c = pm.Beta("c", 2.0, 3.0)
        y = pmm.stack([a, b, c])
        v = np.array([0.3, 1.7, 0.4])
        expected = np.array(
            [
                st.norm.logpdf(0.3, 1.0, 2.0),
                st.expon.logpdf(1.7, scale=2.0),
                st.beta.logpdf(0.4, 2.0, 3.0),
            ]
        )
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)

    def test_interdependent_chain_rule(self):
        """Reference test_measurable_make_vector_interdependent: y's params
        depend on x — the joint factorizes p(x) p(y|x)."""
        with pm.Model():
            x = pm.Normal("x", 0.0, 1.0)
            z = pm.Normal("z", mu=x, sigma=1.0)
        y = pmm.stack([x, z])
        v = np.array([0.5, 1.2])
        expected = np.array(
            [st.norm.logpdf(0.5), st.norm.logpdf(1.2, loc=0.5)]
        )
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)

    def test_constant_input_point_mass(self):
        """Reference test_measurable_make_vector_with_constant_input: the
        RV-free slot behaves as a point mass."""
        with pm.Model():
            a = pm.Normal("a")
        y = pmm.stack([a, 3.0])
        assert float(pm.logp(y, np.array([0.0, 3.0]))[1]) == 0.0
        assert float(pm.logp(y, np.array([0.0, 2.9]))[1]) == -np.inf
        np.testing.assert_allclose(
            float(pm.logp(y, np.array([0.0, 3.0]))[0]), st.norm.logpdf(0.0)
        )

    def test_three_level_dependency(self):
        with pm.Model():
            x = pm.HalfNormal("x", sigma=1.0)
            z = pm.Normal("z", mu=0.0, sigma=x)
            w = pm.Normal("w", mu=z, sigma=0.5)
        y = pmm.stack([x, z, w])
        v = np.array([0.8, -0.3, 0.1])
        expected = np.array(
            [
                st.halfnorm.logpdf(0.8),
                st.norm.logpdf(-0.3, scale=0.8),
                st.norm.logpdf(0.1, loc=-0.3, scale=0.5),
            ]
        )
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)


class TestJoin:
    @pytest.mark.parametrize("size1,size2", [(2, 3), (5, 1)])
    def test_univariate_concat(self, size1, size2):
        with pm.Model():
            u = pm.Normal("u", 0.0, 1.0, shape=size1)
            w = pm.Exponential("w", lam=1.0, shape=size2)
        y = pmm.concatenate([u, w])
        v = np.linspace(0.2, 1.8, size1 + size2)
        expected = np.concatenate(
            [st.norm.logpdf(v[:size1]), st.expon.logpdf(v[size1:])]
        )
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)

    def test_concat_axis1_batched(self):
        with pm.Model():
            u = pm.Normal("u", 0.0, 1.0, shape=(2, 2))
            w = pm.Normal("w", 1.0, 2.0, shape=(2, 3))
        y = pmm.concatenate([u, w], axis=1)
        v = np.arange(10.0).reshape(2, 5) / 5.0
        expected = np.concatenate(
            [st.norm.logpdf(v[:, :2]), st.norm.logpdf(v[:, 2:], 1.0, 2.0)],
            axis=1,
        )
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)

    def test_stack_axis1(self):
        with pm.Model():
            u = pm.Normal("u", 0.0, 1.0, shape=3)
            w = pm.Normal("w", 2.0, 0.5, shape=3)
        y = pmm.stack([u, w], axis=1)  # shape (3, 2)
        v = np.array([[0.0, 2.0], [0.5, 1.5], [-1.0, 2.5]])
        expected = np.stack(
            [st.norm.logpdf(v[:, 0]), st.norm.logpdf(v[:, 1], 2.0, 0.5)], axis=1
        )
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)

    def test_logp_sums_to_joint(self):
        """compile-style check: summing the elementwise output is the joint."""
        with pm.Model():
            a = pm.Normal("a")
            b = pm.Normal("b", mu=a)
        y = pmm.stack([a, b])
        v = np.array([0.2, -0.3])
        total = float(jnp.sum(pm.logp(y, v)))
        expected = st.norm.logpdf(0.2) + st.norm.logpdf(-0.3, loc=0.2)
        np.testing.assert_allclose(total, expected, rtol=1e-6)


class TestTransformChainsOverJoins:
    def test_exp_of_stack(self):
        with pm.Model():
            a = pm.Normal("a", 1.0, 2.0)
            b = pm.Exponential("b", lam=0.5)
        y = pmm.exp(pmm.stack([a, b]))
        v = np.array([1.3, 2.0])
        expected = np.array(
            [
                st.lognorm.logpdf(1.3, s=2.0, scale=np.exp(1.0)),
                st.expon.logpdf(np.log(2.0), scale=2.0) - np.log(2.0),
            ]
        )
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)

    def test_affine_of_concat_cdf(self):
        with pm.Model():
            u = pm.Normal("u", 0.0, 1.0, shape=2)
            w = pm.Normal("w", 1.0, 1.0, shape=2)
        y = 2.0 * pmm.concatenate([u, w]) + 1.0
        v = np.array([0.0, 1.0, 2.0, 3.0])
        locs = np.array([1.0, 1.0, 3.0, 3.0])
        np.testing.assert_allclose(
            np.asarray(pm.logp(y, v)), st.norm.logpdf(v, locs, 2.0), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pm.logcdf(y, v)), st.norm.logcdf(v, locs, 2.0), rtol=1e-6
        )

    def test_expressions_as_components(self):
        with pm.Model():
            a = pm.Normal("a")
            b = pm.Normal("b")
        y = pmm.stack([pmm.exp(a), 3.0 * b])
        v = np.array([0.7, 1.2])
        expected = np.array(
            [st.lognorm.logpdf(0.7, s=1.0), st.norm.logpdf(1.2, scale=3.0)]
        )
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)

    def test_nested_joins(self):
        with pm.Model():
            a = pm.Normal("a")
            b = pm.Normal("b", 1.0)
            c = pm.Normal("c", 2.0)
        y = pmm.concatenate([pmm.stack([a, b]), pmm.stack([c])])
        v = np.array([0.1, 0.9, 2.2])
        expected = st.norm.logpdf(v, np.array([0.0, 1.0, 2.0]))
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)


class TestDiscreteJoins:
    def test_stack_of_poissons(self):
        with pm.Model():
            a = pm.Poisson("a", mu=2.0)
            b = pm.Poisson("b", mu=5.0)
        y = pmm.stack([a, b])
        v = np.array([1.0, 4.0])
        expected = np.array(
            [st.poisson.logpmf(1, 2.0), st.poisson.logpmf(4, 5.0)]
        )
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)

    def test_shifted_discrete_join(self):
        with pm.Model():
            a = pm.Poisson("a", mu=2.0)
            b = pm.Poisson("b", mu=3.0)
        y = pmm.stack([a, b]) + 10.0
        np.testing.assert_allclose(
            np.asarray(pm.logp(y, np.array([11.0, 13.0]))),
            [st.poisson.logpmf(1, 2.0), st.poisson.logpmf(3, 3.0)],
            rtol=1e-6,
        )
        # off-lattice
        assert float(pm.logp(y, np.array([11.5, 13.0]))[0]) == -np.inf

    def test_mixed_discrete_continuous_transform_rejected(self):
        with pm.Model():
            a = pm.Poisson("a", mu=2.0)
            b = pm.Normal("b")
        with pytest.raises(TypeError, match="mixing discrete and continuous"):
            pm.logp(pmm.exp(pmm.stack([a, b])), np.array([1.0, 1.0]))

    def test_mixed_join_logp_ok(self):
        with pm.Model():
            a = pm.Poisson("a", mu=2.0)
            b = pm.Normal("b")
        y = pmm.stack([a, b])
        v = np.array([1.0, 0.3])
        expected = np.array([st.poisson.logpmf(1, 2.0), st.norm.logpdf(0.3)])
        np.testing.assert_allclose(np.asarray(pm.logp(y, v)), expected, rtol=1e-6)


class TestSampling:
    def test_independent_marginals(self):
        with pm.Model():
            a = pm.Normal("a", 1.0, 2.0)
            b = pm.Exponential("b", lam=0.5)
        d = dist_from_expression(pmm.stack([a, b]))
        draws = np.asarray(d.sample(jax.random.PRNGKey(1), (3000,)))
        assert draws.shape == (3000, 2)
        assert st.kstest(draws[:, 0], st.norm(1.0, 2.0).cdf).pvalue > 0.005
        assert st.kstest(draws[:, 1], st.expon(scale=2.0).cdf).pvalue > 0.005

    def test_interdependent_sampling(self):
        with pm.Model():
            x = pm.Normal("x", 0.0, 1.0)
            z = pm.Normal("z", mu=x, sigma=1.0)
        d = dist_from_expression(pmm.stack([x, z]))
        draws = np.asarray(d.sample(jax.random.PRNGKey(2), (4000,)))
        # z = x + noise: corr 1/sqrt(2), marginal sd sqrt(2)
        corr = np.corrcoef(draws[:, 0], draws[:, 1])[0, 1]
        assert abs(corr - 1 / np.sqrt(2)) < 0.05
        assert abs(draws[:, 1].std() - np.sqrt(2)) < 0.08

    def test_support_point(self):
        with pm.Model():
            a = pm.Normal("a", 1.5)
            b = pm.Exponential("b", lam=2.0)
        d = dist_from_expression(pmm.stack([a, b, 7.0]))
        sp = np.asarray(d.support_point())
        np.testing.assert_allclose(sp[0], 1.5)
        np.testing.assert_allclose(sp[2], 7.0)

    def test_draw_of_join_expression(self):
        with pm.Model():
            a = pm.Normal("a", 1.0, 0.1)
            b = pm.Normal("b", -1.0, 0.1)
        y = pmm.stack([a, b])
        out = np.asarray(pm.draw(y, draws=100, random_seed=3))
        assert out.shape == (100, 2)
        assert abs(out[:, 0].mean() - 1.0) < 0.05
        assert abs(out[:, 1].mean() + 1.0) < 0.05


class TestErrors:
    def test_icdf_raises(self):
        with pm.Model():
            a = pm.Normal("a")
            b = pm.Normal("b")
        with pytest.raises(NotImplementedError, match="icdf"):
            pm.icdf(pmm.stack([a, b]), np.array([0.5, 0.5]))

    def test_mixed_support_ndim_rejected(self):
        """Reference test_join_mixed_ndim_supp: a univariate batch and a
        multivariate component produce logps of different ndims."""
        with pm.Model():
            m = pm.MvNormal("m", mu=np.zeros(2), cov=np.eye(2))
            a = pm.Normal("a", shape=2)
        with pytest.raises(
            ValueError, match="different number of dimensions"
        ):
            pm.logp(pmm.stack([m, a]), np.zeros((2, 2)))

    def test_multivariate_with_constant_rejected(self):
        """A constant slot is a point mass with support ndim 0 — mixing it
        with multivariate components raises like the reference."""
        with pm.Model():
            m = pm.MvNormal("m", mu=np.zeros(2), cov=np.eye(2))
        with pytest.raises(
            ValueError, match="different number of dimensions"
        ):
            pm.logp(pmm.stack([m, np.zeros(2)]), np.zeros((2, 2)))

    def test_replicated_rv_rejected(self):
        """stack([x, x]) has no joint density wrt the product measure —
        reject instead of silently double-counting."""
        with pm.Model():
            x = pm.Normal("x")
        with pytest.raises(TypeError, match="more than one join component"):
            pm.logp(pmm.stack([x, x]), np.array([0.5, 0.5]))

    def test_replicated_leaf_through_expression_rejected(self):
        with pm.Model():
            x = pm.Normal("x")
        with pytest.raises(TypeError, match="more than one join component"):
            pm.logp(pmm.stack([x, pmm.exp(x)]), np.array([0.5, 1.6]))


class TestMultivariateJoins:
    """Reference test_measurable_join_multivariate: joins of event_ndim>0
    components. Batch-axis joins re-join the per-component (event-reduced)
    logps at the axis shifted past the event block; event-axis concats sum
    the component logps (each component's value slice is its complete
    event, so the product density is the joint)."""

    def _mvns(self, shape1, shape2):
        with pm.Model():
            x = pm.MvNormal(
                "x", mu=np.zeros(2), cov=np.eye(2), shape=shape1 + (2,)
            )
            y = pm.MvNormal(
                "y", mu=np.ones(2), cov=2.0 * np.eye(2), shape=shape2 + (2,)
            )
        return x, y

    @staticmethod
    def _lp1(v):
        return st.multivariate_normal.logpdf(v, np.zeros(2), np.eye(2))

    @staticmethod
    def _lp2(v):
        return st.multivariate_normal.logpdf(v, np.ones(2), 2.0 * np.eye(2))

    def test_concat_leading_batch_axis(self):
        x, y = self._mvns((5,), (3,))
        v = np.random.default_rng(1).normal(size=(8, 2))
        lp = np.asarray(pm.logp(pmm.concatenate([x, y], axis=0), v))
        expected = np.concatenate([self._lp1(v[:5]), self._lp2(v[5:])])
        assert lp.shape == (8,)
        np.testing.assert_allclose(lp, expected, rtol=1e-6)

    def test_concat_negative_batch_axis(self):
        x, y = self._mvns((5,), (3,))
        v = np.random.default_rng(2).normal(size=(8, 2))
        lp = np.asarray(pm.logp(pmm.concatenate([x, y], axis=-2), v))
        expected = np.concatenate([self._lp1(v[:5]), self._lp2(v[5:])])
        np.testing.assert_allclose(lp, expected, rtol=1e-6)

    def test_concat_middle_batch_axis(self):
        x, y = self._mvns((5, 6), (5, 1))
        v = np.random.default_rng(3).normal(size=(5, 7, 2))
        lp = np.asarray(pm.logp(pmm.concatenate([x, y], axis=1), v))
        assert lp.shape == (5, 7)
        # scipy squeezes the size-1 batch axis of _lp2 — restore it
        expected = np.concatenate(
            [self._lp1(v[:, :6]), self._lp2(v[:, 6:]).reshape(5, 1)],
            axis=1,
        )
        np.testing.assert_allclose(lp, expected, rtol=1e-6)

    def test_concat_support_axis_sums(self):
        """Joining along the event axis fuses the components into one
        event: the logp is the per-batch-row SUM of the component logps
        (the reference concatenates the reduced logps — the total is
        identical)."""
        x, y = self._mvns((), ())
        v = np.array([0.3, -0.2, 1.4, 0.8])
        lp = np.asarray(pm.logp(pmm.concatenate([x, y], axis=0), v))
        assert lp.shape == ()
        np.testing.assert_allclose(
            lp, self._lp1(v[:2]) + self._lp2(v[2:]), rtol=1e-6
        )

    def test_concat_support_axis_batched(self):
        x, y = self._mvns((4,), (4,))
        v = np.random.default_rng(4).normal(size=(4, 4))
        lp = np.asarray(pm.logp(pmm.concatenate([x, y], axis=1), v))
        assert lp.shape == (4,)
        np.testing.assert_allclose(
            lp, self._lp1(v[:, :2]) + self._lp2(v[:, 2:]), rtol=1e-6
        )

    @pytest.mark.parametrize("axis, lp_axis", [(0, 0), (1, 1)])
    def test_stack_batch_axes(self, axis, lp_axis):
        x, y = self._mvns((4,), (4,))
        v = np.random.default_rng(5).normal(
            size=(2, 4, 2) if axis == 0 else (4, 2, 2)
        )
        lp = np.asarray(pm.logp(pmm.stack([x, y], axis=axis), v))
        parts = [
            self._lp1(np.take(v, 0, axis=axis)),
            self._lp2(np.take(v, 1, axis=axis)),
        ]
        expected = np.stack(parts, axis=lp_axis)
        assert lp.shape == expected.shape
        np.testing.assert_allclose(lp, expected, rtol=1e-6)

    def test_stack_inside_event_rejected(self):
        x, y = self._mvns((), ())
        with pytest.raises(TypeError, match="batch axis"):
            pm.logp(pmm.stack([x, y], axis=1), np.zeros((2, 2)))

    def test_heterogeneous_families(self):
        """MvNormal + Dirichlet along a batch axis (the reference pairs
        multivariate_normal with dirichlet)."""
        with pm.Model():
            m = pm.MvNormal("m", mu=np.zeros(3), cov=np.eye(3), shape=(2, 3))
            d = pm.Dirichlet("d", np.ones(3), shape=(2, 3))
        vm = np.random.default_rng(6).normal(size=(2, 3))
        vd = np.random.default_rng(7).dirichlet(np.ones(3), size=2)
        v = np.concatenate([vm, vd], axis=0)
        lp = np.asarray(pm.logp(pmm.concatenate([m, d], axis=0), v))
        expected = np.concatenate(
            [
                st.multivariate_normal.logpdf(vm, np.zeros(3), np.eye(3)),
                [st.dirichlet.logpdf(row, np.ones(3)) for row in vd],
            ]
        )
        np.testing.assert_allclose(lp, expected, rtol=1e-6)

    def test_interdependent_multivariate(self):
        """Chain rule through a multivariate join: y | x."""
        with pm.Model():
            x = pm.MvNormal("x", mu=np.zeros(2), cov=np.eye(2))
            y = pm.MvNormal("y", mu=x, cov=np.eye(2))
        v = np.array([[0.5, -0.3], [0.7, 0.1]])
        lp = np.asarray(pm.logp(pmm.stack([x, y], axis=0), v))
        expected = np.array(
            [
                st.multivariate_normal.logpdf(v[0], np.zeros(2), np.eye(2)),
                st.multivariate_normal.logpdf(v[1], v[0], np.eye(2)),
            ]
        )
        np.testing.assert_allclose(lp, expected, rtol=1e-6)

    def test_elementwise_transform_over_multivariate_join(self):
        """exp of a stack of MvNormals: the Jacobian reduces over the event
        block before joining (TransformedDistribution event reduction)."""
        x, y = self._mvns((), ())
        v = np.exp(np.array([[0.3, -0.2], [1.4, 0.8]]))
        lp = np.asarray(pm.logp(pmm.exp(pmm.stack([x, y], axis=0)), v))
        expected = np.array(
            [self._lp1(np.log(v[0])), self._lp2(np.log(v[1]))]
        ) - np.log(v).sum(axis=-1)
        np.testing.assert_allclose(lp, expected, rtol=1e-6)

    def test_forward_sampling_matches_components(self):
        x, y = self._mvns((5,), (3,))
        e = pmm.concatenate([x, y], axis=0)
        from pymc_tpu.distributions.transformed import dist_from_expression

        d = dist_from_expression(e)
        draws = np.asarray(
            d.sample(jax.random.PRNGKey(0), sample_shape=(4000,))
        )
        assert draws.shape == (4000, 8, 2)
        np.testing.assert_allclose(
            draws[:, :5].mean(axis=(0, 1)), np.zeros(2), atol=0.06
        )
        np.testing.assert_allclose(
            draws[:, 5:].mean(axis=(0, 1)), np.ones(2), atol=0.08
        )

    def test_cdf_family_raises(self):
        x, y = self._mvns((), ())
        with pytest.raises(NotImplementedError, match="multivariate join"):
            pm.logcdf(pmm.stack([x, y], axis=0), np.zeros((2, 2)))
