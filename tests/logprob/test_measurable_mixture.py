"""Component-selection mixtures and sum-of-normals measurability.

Mirrors reference tests/logprob/test_mixture.py (test_mixture_basics,
test_scalar_switch_mixture, test_switch_mixture_vector,
test_switch_mixture_measurable_cond_fails, test_switch_mixture_invalid_bcast,
test_switch_mixture_constant_branch_broadcast_ok,
test_mixture_with_DiracDelta, test_hetero_mixture_binomial's
unsupported-size rejections) and tests/logprob/test_arithmetic.py
(test_sum_of_normals_logprob). The pymc_tpu contract: ``pm.logp`` of the
expression, CONDITIONAL on the index/condition — the index RV's value
resolves from the evaluation env exactly like model value variables.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu import math as pmm


class TestIndexMixture:
    def test_mixture_basics_conditional_select(self):
        """Reference test_mixture_basics: stack([X, Y])[I] — the logp given
        I selects the component density."""
        with pm.Model():
            X = pm.Normal("X", 0.0, 1.0)
            Y = pm.Gamma("Y", alpha=0.5, beta=0.5)
            I = pm.Bernoulli("I", p=0.5)  # noqa: E741
        M = pmm.stack([X, Y])[I]
        np.testing.assert_allclose(
            float(pm.logp(M, 1.3, env={"I": 0})),
            st.norm.logpdf(1.3),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            float(pm.logp(M, 1.3, env={"I": 1})),
            st.gamma.logpdf(1.3, 0.5, scale=2.0),
            rtol=1e-12,
        )

    def test_out_of_range_index_is_neg_inf(self):
        with pm.Model():
            X = pm.Normal("X")
            Y = pm.Normal("Y", 5.0, 1.0)
            I = pm.Categorical("I", p=[0.5, 0.5])  # noqa: E741
        M = pmm.stack([X, Y])[I]
        assert np.isneginf(float(pm.logp(M, 0.0, env={"I": 2})))
        assert np.isneginf(float(pm.logp(M, 0.0, env={"I": -1})))

    def test_vector_components(self):
        with pm.Model():
            X = pm.Normal("X", 0.0, 1.0, shape=(3,))
            Y = pm.Exponential("Y", lam=2.0, shape=(3,))
            I = pm.Bernoulli("I", p=0.5)  # noqa: E741
        M = pmm.stack([X, Y])[I]
        v = np.array([0.2, 0.9, 1.4])
        np.testing.assert_allclose(
            np.asarray(pm.logp(M, v, env={"I": 1})),
            st.expon.logpdf(v, scale=0.5),
            rtol=1e-12,
        )

    def test_elementwise_base_batch_selection(self):
        """rv[I] over a batched elementwise base: each index picks one
        component's marginal (reference logprob_MixtureRV scalar-index
        path)."""
        with pm.Model():
            Z = pm.Normal("Z", mu=np.array([-1.0, 0.0, 1.0]), sigma=2.0)
            J = pm.Categorical("J", p=np.ones(3) / 3)
        M = Z[J]
        for j, mu in enumerate([-1.0, 0.0, 1.0]):
            np.testing.assert_allclose(
                float(pm.logp(M, 0.4, env={"J": j})),
                st.norm.logpdf(0.4, mu, 2.0),
                rtol=1e-12,
            )

    def test_dirac_delta_constant_slot(self):
        """Reference test_mixture_with_DiracDelta: RV-free slots behave as
        point masses."""
        with pm.Model():
            X = pm.Normal("X")
            I = pm.Bernoulli("I", p=0.5)  # noqa: E741
        M = pmm.stack([X, 3.0])[I]
        assert float(pm.logp(M, 3.0, env={"I": 1})) == 0.0
        assert np.isneginf(float(pm.logp(M, 2.9, env={"I": 1})))
        np.testing.assert_allclose(
            float(pm.logp(M, 0.7, env={"I": 0})), st.norm.logpdf(0.7)
        )

    def test_transformed_component_expressions(self):
        """Components may themselves be measurable expressions."""
        with pm.Model():
            X = pm.Normal("X")
            Y = pm.Normal("Y")
            I = pm.Bernoulli("I", p=0.5)  # noqa: E741
        M = pmm.stack([pmm.exp(X), 2.0 * Y + 1.0])[I]
        np.testing.assert_allclose(
            float(pm.logp(M, 1.7, env={"I": 0})),
            st.lognorm.logpdf(1.7, 1.0),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            float(pm.logp(M, 1.7, env={"I": 1})),
            st.norm.logpdf(1.7, 1.0, 2.0),
            rtol=1e-12,
        )

    def test_logcdf_icdf_conditional(self):
        with pm.Model():
            X = pm.Normal("X")
            Y = pm.Exponential("Y", lam=1.0)
            I = pm.Bernoulli("I", p=0.5)  # noqa: E741
        M = pmm.stack([X, Y])[I]
        np.testing.assert_allclose(
            float(pm.logcdf(M, 0.8, env={"I": 1})),
            st.expon.logcdf(0.8),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            float(pm.icdf(M, 0.3, env={"I": 0})),
            st.norm.ppf(0.3),
            rtol=1e-12,
        )

    def test_nonscalar_random_index_rejected(self):
        """Reference test_hetero_mixture_binomial unsupported sizes: an
        integer-array random index can pick repeated (dependent)
        components."""
        with pm.Model():
            X = pm.Normal("X", shape=(3,))
            I = pm.Bernoulli("I", p=0.5, shape=(2,))  # noqa: E741
        with pytest.raises(TypeError, match="non-scalar random index"):
            pm.logp(X[I], np.zeros(2))

    def test_concatenate_base_rejected(self):
        with pm.Model():
            X = pm.Normal("X", shape=(2,))
            Y = pm.Normal("Y", shape=(2,))
            I = pm.Categorical("I", p=np.ones(4) / 4)  # noqa: E741
        with pytest.raises(TypeError, match="leading stack axis"):
            pm.logp(pmm.concatenate([X, Y])[I], 0.0)

    def test_multivariate_event_base_rejected(self):
        with pm.Model():
            X = pm.MvNormal("X", mu=np.zeros(3), cov=np.eye(3))
            I = pm.Categorical("I", p=np.ones(3) / 3)  # noqa: E741
        with pytest.raises(TypeError, match="multivariate"):
            pm.logp(X[I], 0.0)

    def test_forward_sampling_statistics(self):
        """Unconditional draws marginalize the index: a 50/50 mix of two
        well-separated normals."""
        with pm.Model():
            X = pm.Normal("X", -10.0, 0.5)
            Y = pm.Normal("Y", 10.0, 0.5)
            I = pm.Bernoulli("I", p=0.5)  # noqa: E741
        M = pmm.stack([X, Y])[I]
        draws = np.asarray(pm.draw(M, draws=800, random_seed=3))
        frac_hi = float(np.mean(draws > 0))
        assert 0.4 < frac_hi < 0.6
        assert np.all((np.abs(draws + 10) < 4) | (np.abs(draws - 10) < 4))


class TestSwitchMixture:
    def test_scalar_switch_mixture(self):
        """Reference test_scalar_switch_mixture."""
        with pm.Model():
            X = pm.Normal("X", -3.0, 1.0)
            Y = pm.Normal("Y", 3.0, 1.0)
        for cond, mu in ((True, -3.0), (False, 3.0)):
            np.testing.assert_allclose(
                float(pm.logp(pmm.where(cond, X, Y), 0.5)),
                st.norm.logpdf(0.5, mu),
                rtol=1e-12,
            )

    def test_vector_condition_elementwise_select(self):
        """Reference test_switch_mixture_vector."""
        cond = np.array([True, False, False, True])
        with pm.Model():
            A = pm.Normal("A", 0.0, 1.0, shape=(4,))
            B = pm.Exponential("B", lam=1.5, shape=(4,))
        v = np.array([0.3, 0.7, 1.1, -0.2])
        got = np.asarray(pm.logp(pmm.where(cond, A, B), v))
        exp = np.where(cond, st.norm.logpdf(v), st.expon.logpdf(v, scale=1 / 1.5))
        np.testing.assert_allclose(got, exp, rtol=1e-12)

    def test_constant_branch_point_mass(self):
        """Reference test_switch_mixture_constant_branch_broadcast_ok: the
        deterministic branch is a (broadcastable) point mass."""
        cond = np.array([True, False])
        with pm.Model():
            A = pm.Normal("A", 0.0, 1.0, shape=(2,))
        y = pmm.where(cond, A, 5.0)
        got = np.asarray(pm.logp(y, np.array([0.2, 5.0])))
        np.testing.assert_allclose(got[0], st.norm.logpdf(0.2), rtol=1e-12)
        assert got[1] == 0.0
        assert np.isneginf(np.asarray(pm.logp(y, np.array([0.2, 4.9])))[1])

    def test_random_condition_is_conditional_mixture(self):
        """Reference logprob/mixture.py MeasurableIfElse (test_ifelse_mixture):
        a random condition DISJOINT from the branches selects conditionally
        on its env-resolved value."""
        with pm.Model():
            X = pm.Normal("X", 2.0, 1.0)
            A = pm.Normal("A", -3.0, 1.0)
            B = pm.Normal("B", 3.0, 2.0)
        y = pmm.where(X > 0, A, B)
        np.testing.assert_allclose(
            float(pm.logp(y, 0.5, env={"X": 1.0})),
            st.norm.logpdf(0.5, -3.0),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            float(pm.logp(y, 0.5, env={"X": -1.0})),
            st.norm.logpdf(0.5, 3.0, 2.0),
            rtol=1e-12,
        )
        # forward draws with no env marginalize the condition
        d = np.asarray(pm.draw(y, draws=600, random_seed=11))
        frac_low = float(np.mean(d < 0))
        # P(X > 0) for N(2,1) is ~0.977 -> mostly the A=-3 component
        assert 0.9 < frac_low < 1.0

    def test_condition_sharing_branch_rv_not_a_mixture(self):
        """A condition on the SAME RV as a branch replicates it piecewise —
        that is the non-overlapping-bijection form's territory, and with
        plain branches it is not measurable at all (reference
        find_measurable_ifelse_mixture rejects shared randomness)."""
        with pm.Model():
            X = pm.Normal("X")
            B = pm.Normal("B")
        with pytest.raises(TypeError, match="switch"):
            pm.logp(pmm.where(X > 0, X + 1.0, B), 0.0)

    def test_component_broadcast_rejected(self):
        """Reference test_switch_mixture_invalid_bcast: a broadcast random
        component yields dependent (identical) draws."""
        cond = np.array([True, False, True])
        with pm.Model():
            A = pm.Normal("A")  # scalar, broadcast to (3,) by cond
            B = pm.Normal("B", shape=(3,))
        with pytest.raises(TypeError, match="broadcast"):
            pm.logp(pmm.where(cond, A, B), np.zeros(3))

    def test_transform_over_switch_mixture(self):
        """exp of a switch mixture composes: mixture of lognormals."""
        cond = np.array([True, False])
        with pm.Model():
            A = pm.Normal("A", 0.0, 1.0, shape=(2,))
            B = pm.Normal("B", 1.0, 2.0, shape=(2,))
        v = np.array([0.8, 2.5])
        got = np.asarray(pm.logp(pmm.exp(pmm.where(cond, A, B)), v))
        exp = np.where(
            cond,
            st.lognorm.logpdf(v, 1.0),
            st.lognorm.logpdf(v, 2.0, scale=np.exp(1.0)),
        )
        np.testing.assert_allclose(got, exp, rtol=1e-12)

    def test_transform_over_atom_mixture_rejected(self):
        """The Jacobian does not apply at point-mass atoms."""
        cond = np.array([True, False])
        with pm.Model():
            A = pm.Normal("A", shape=(2,))
        with pytest.raises(TypeError, match="atom"):
            pm.logp(pmm.exp(pmm.where(cond, A, 3.0)), np.ones(2))

    def test_sampling_statistics(self):
        cond = np.array([True, False])
        with pm.Model():
            A = pm.Normal("A", -5.0, 0.3, shape=(2,))
            B = pm.Normal("B", 5.0, 0.3, shape=(2,))
        d = np.asarray(pm.draw(pmm.where(cond, A, B), draws=200, random_seed=0))
        assert d.shape == (200, 2)
        assert np.all(d[:, 0] < 0) and np.all(d[:, 1] > 0)

    def test_discrete_components(self):
        """Mixtures of discretes need no Jacobian — selection still applies."""
        cond = np.array([True, False])
        with pm.Model():
            A = pm.Poisson("A", mu=2.0, shape=(2,))
            B = pm.Poisson("B", mu=7.0, shape=(2,))
        got = np.asarray(pm.logp(pmm.where(cond, A, B), np.array([3, 5])))
        exp = np.array([st.poisson.logpmf(3, 2.0), st.poisson.logpmf(5, 7.0)])
        np.testing.assert_allclose(got, exp, rtol=1e-10)


class TestMixtureCompositions:
    def test_transform_over_index_mixture(self):
        with pm.Model():
            X = pm.Normal("X", 0.0, 1.0)
            Y = pm.Normal("Y", 1.0, 2.0)
            I = pm.Bernoulli("I", p=0.5)  # noqa: E741
        got = float(pm.logp(pmm.exp(pmm.stack([X, Y])[I]), 1.7, env={"I": 1}))
        np.testing.assert_allclose(
            got, st.lognorm.logpdf(1.7, 2.0, scale=np.exp(1.0)), rtol=1e-12
        )

    def test_index_mixture_of_transformed_components_logcdf(self):
        with pm.Model():
            X = pm.Normal("X", 0.0, 1.0)
            Y = pm.Normal("Y", 1.0, 2.0)
            I = pm.Bernoulli("I", p=0.5)  # noqa: E741
        got = float(
            pm.logcdf(pmm.stack([pmm.exp(X), Y])[I], 0.9, env={"I": 0})
        )
        np.testing.assert_allclose(
            got, st.lognorm.logcdf(0.9, 1.0), rtol=1e-12
        )


class TestSumOfNormals:
    @pytest.mark.parametrize("axis", [None, 0, 1, (0, 1)])
    def test_sum_of_normals_logprob(self, axis):
        """Reference test_arithmetic.py test_sum_of_normals_logprob."""
        mu = np.arange(6.0).reshape(2, 3)
        sigma = np.linspace(0.5, 2.0, 6).reshape(2, 3)
        with pm.Model():
            W = pm.Normal("W", mu=mu, sigma=sigma)
        s = pmm.sum(W, axis=axis)
        mu_s = mu.sum(axis=axis)
        sd_s = np.sqrt((sigma**2).sum(axis=axis))
        v = np.asarray(mu_s) + 0.7
        np.testing.assert_allclose(
            np.asarray(pm.logp(s, v)),
            st.norm.logpdf(v, mu_s, sd_s),
            rtol=1e-12,
        )

    def test_keepdims(self):
        mu = np.array([1.0, 2.0])
        with pm.Model():
            W = pm.Normal("W", mu=mu, sigma=1.0)
        s = pmm.sum(W, axis=0, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(pm.logp(s, np.array([3.5]))),
            st.norm.logpdf(3.5, 3.0, np.sqrt(2.0)),
            rtol=1e-12,
        )

    def test_node_method_sum(self):
        with pm.Model():
            W = pm.Normal("W", mu=np.zeros(4), sigma=2.0)
        np.testing.assert_allclose(
            float(pm.logp(W.sum(), 1.0)),
            st.norm.logpdf(1.0, 0.0, 4.0),
            rtol=1e-12,
        )

    def test_scaled_sum_composes(self):
        """An affine transform over the derived normal still derives."""
        with pm.Model():
            W = pm.Normal("W", mu=np.ones(3), sigma=1.0)
        np.testing.assert_allclose(
            float(pm.logp(2.0 * pmm.sum(W) + 1.0, 8.0)),
            st.norm.logpdf(8.0, 7.0, 2.0 * np.sqrt(3.0)),
            rtol=1e-12,
        )

    def test_non_normal_base_rejected(self):
        with pm.Model():
            E = pm.Exponential("E", lam=1.0, shape=(3,))
        with pytest.raises(TypeError, match="Normal base"):
            pm.logp(pmm.sum(E), 1.0)

    def test_sampling_matches_derived_density(self):
        with pm.Model():
            W = pm.Normal("W", mu=np.array([1.0, -1.0]), sigma=np.array([1.0, 2.0]))
        d = np.asarray(pm.draw(pmm.sum(W), draws=4000, random_seed=7))
        assert abs(d.mean()) < 0.15
        assert abs(d.std() - np.sqrt(5.0)) < 0.15
