"""Expression-mixture depth matrix: nested mixtures, conditional densities,
shared-RV components, multivariate components, selector disjointness.

Case inventory ported (cases, not code) from reference
tests/logprob/test_mixture.py: test_nested_ifelse (:1161 — the SAME index RV
drives both levels), test_ifelse_mixture_shared_component (:1055 —
components conditioned on another value-mapped RV), hetero mixtures of
multivariate components, and conditional_logp's treat-other-valued-RVs-as-
constants semantics (reference logprob/basic.py:206). pymc_tpu contract:
``pm.logp(expr, v, env=...)`` conditions on every env-named RV.
"""

import numpy as np
import pytest
import scipy.stats as st

import jax
import pymc_tpu as pm
from pymc_tpu import math as pmm


class TestNestedMixtures:
    def test_nested_ifelse_shared_index(self):
        """Reference test_nested_ifelse: idx selects at BOTH levels —
        ifelse(eq(idx,0), d0, ifelse(eq(idx,1), d1, d2))."""
        with pm.Model():
            D0 = pm.Normal("D0", -5, 1)
            D1 = pm.Normal("D1", 0, 1)
            D2 = pm.Normal("D2", 5, 1)
            idx = pm.Categorical("idx", p=np.ones(3) / 3)
        M = pmm.where(pmm.eq(idx, 0), D0, pmm.where(pmm.eq(idx, 1), D1, D2))
        for k, mu in enumerate([-5.0, 0.0, 5.0]):
            np.testing.assert_allclose(
                float(pm.logp(M, 0.25, env={"idx": k})),
                st.norm(mu, 1).logpdf(0.25),
                rtol=1e-12,
            )

    def test_nested_stack_index(self):
        with pm.Model():
            A = pm.Normal("A", -5, 1)
            B = pm.Gamma("B", alpha=2.0, beta=2.0)
            C = pm.Normal("C", 0, 1)
            I1 = pm.Bernoulli("I1", 0.3)
            I2 = pm.Bernoulli("I2", 0.6)
        M = pmm.stack([pmm.stack([A, B])[I2], C])[I1]
        np.testing.assert_allclose(
            float(pm.logp(M, 0.5, env={"I1": 0, "I2": 1})),
            st.gamma(2.0, scale=0.5).logpdf(0.5),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            float(pm.logp(M, 0.5, env={"I1": 0, "I2": 0})),
            st.norm(-5, 1).logpdf(0.5),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            float(pm.logp(M, 0.5, env={"I1": 1, "I2": 0})),
            st.norm(0, 1).logpdf(0.5),
            rtol=1e-12,
        )

    def test_nested_mixed_forms(self):
        """stack-index inner, switch outer — forms compose."""
        with pm.Model():
            A = pm.Normal("A", -3, 1)
            B = pm.Normal("B", 3, 1)
            C = pm.Exponential("C", lam=1.0)
            J = pm.Categorical("J", p=[0.5, 0.5])
            I = pm.Bernoulli("I", 0.5)  # noqa: E741
        M = pmm.where(pmm.eq(I, 1), pmm.stack([A, B])[J], C)
        np.testing.assert_allclose(
            float(pm.logp(M, 0.9, env={"I": 1, "J": 1})),
            st.norm(3, 1).logpdf(0.9),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            float(pm.logp(M, 0.9, env={"I": 0, "J": 0})),
            st.expon.logpdf(0.9),
            rtol=1e-12,
        )

    def test_nested_logcdf(self):
        with pm.Model():
            A = pm.Normal("A", -5, 1)
            B = pm.Normal("B", 5, 1)
            C = pm.Normal("C", 0, 1)
            I1 = pm.Bernoulli("I1", 0.3)
            I2 = pm.Bernoulli("I2", 0.6)
        M = pmm.where(pmm.eq(I1, 1), pmm.where(pmm.eq(I2, 1), A, B), C)
        np.testing.assert_allclose(
            float(pm.logcdf(M, 0.7, env={"I1": 1, "I2": 0})),
            st.norm(5, 1).logcdf(0.7),
            rtol=1e-10,
        )

    def test_nested_transform_composes(self):
        """exp of a nested mixture: lognormal conditional density."""
        with pm.Model():
            A = pm.Normal("A", 0, 1)
            B = pm.Normal("B", 1, 2)
            C = pm.Normal("C", -1, 1)
            I1 = pm.Bernoulli("I1", 0.5)
            I2 = pm.Bernoulli("I2", 0.5)
        M = pmm.exp(
            pmm.where(pmm.eq(I1, 1), pmm.where(pmm.eq(I2, 1), A, B), C)
        )
        np.testing.assert_allclose(
            float(pm.logp(M, 1.4, env={"I1": 1, "I2": 0})),
            st.lognorm(2.0, scale=np.exp(1.0)).logpdf(1.4),
            rtol=1e-10,
        )

    def test_nested_sampling_statistics(self):
        with pm.Model():
            A = pm.Normal("A", -8, 0.5)
            B = pm.Normal("B", 8, 0.5)
            C = pm.Normal("C", 0, 0.5)
            I1 = pm.Bernoulli("I1", 0.4)
            I2 = pm.Bernoulli("I2", 0.5)
        M = pmm.where(pmm.eq(I1, 1), pmm.where(pmm.eq(I2, 1), A, B), C)
        s = np.asarray(pm.draw(M, draws=20000, random_seed=0))
        np.testing.assert_allclose((s < -4).mean(), 0.4 * 0.5, atol=0.02)
        np.testing.assert_allclose((np.abs(s) < 4).mean(), 0.6, atol=0.02)
        np.testing.assert_allclose((s > 4).mean(), 0.4 * 0.5, atol=0.02)


class TestConditionalDensities:
    """env-named RVs are constants of the density (reference
    conditional_logp: every other value-mapped RV is treated as fixed)."""

    def test_sum_given_one_operand(self):
        with pm.Model():
            X = pm.Normal("X", 1.0, 2.0)
            Y = pm.Normal("Y", 0.0, 1.0)
        np.testing.assert_allclose(
            float(pm.logp(X + Y, 3.0, env={"Y": 0.5})),
            st.norm(1.0, 2.0).logpdf(2.5),
            rtol=1e-12,
        )
        # conditioning on the OTHER operand flips the density carrier
        np.testing.assert_allclose(
            float(pm.logp(X + Y, 3.0, env={"X": 0.5})),
            st.norm(0.0, 1.0).logpdf(2.5),
            rtol=1e-12,
        )

    def test_scale_given_scale_rv(self):
        with pm.Model():
            X = pm.Normal("X", 0, 1)
            S = pm.HalfNormal("S", 1.0)
        np.testing.assert_allclose(
            float(pm.logp(S * X, 1.2, env={"S": 2.0})),
            st.norm(0, 2.0).logpdf(1.2),
            rtol=1e-12,
        )

    def test_branch_shifted_by_conditioned_rv(self):
        """Reference test_ifelse_mixture_shared_component: a branch may
        depend on another valued RV — its density is conditional on it."""
        with pm.Model():
            Z = pm.Normal("Z", 0, 1)
            A = pm.Normal("A", 2.0, 1.0)
            B = pm.Normal("B", -2.0, 1.0)
            I = pm.Bernoulli("I", 0.5)  # noqa: E741
        M = pmm.where(pmm.eq(I, 1), Z + A, B)
        np.testing.assert_allclose(
            float(pm.logp(M, 0.7, env={"I": 1, "Z": 1.5})),
            st.norm(3.5, 1).logpdf(0.7),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            float(pm.logp(M, 0.7, env={"I": 0, "Z": 1.5})),
            st.norm(-2.0, 1).logpdf(0.7),
            rtol=1e-12,
        )

    def test_fully_conditioned_branch_is_point_mass(self):
        with pm.Model():
            Z = pm.Normal("Z", 0, 1)
            B = pm.Normal("B", -2.0, 1.0)
            I = pm.Bernoulli("I", 0.5)  # noqa: E741
        M = pmm.where(pmm.eq(I, 1), 2.0 * Z, B)
        # true branch given Z: point mass at 2*Z
        assert float(pm.logp(M, 3.0, env={"I": 1, "Z": 1.5})) == 0.0
        assert np.isneginf(float(pm.logp(M, 2.9, env={"I": 1, "Z": 1.5})))
        np.testing.assert_allclose(
            float(pm.logp(M, 0.7, env={"I": 0, "Z": 1.5})),
            st.norm(-2.0, 1).logpdf(0.7),
            rtol=1e-12,
        )

    def test_two_unvalued_rvs_still_rejected(self):
        with pm.Model():
            X = pm.Normal("X", 0, 1)
            Y = pm.Normal("Y", 0, 1)
        with pytest.raises(TypeError, match="exactly one random operand"):
            pm.logp(X + Y, 1.0)


class TestSharedComponents:
    def test_same_rv_in_both_slots(self):
        """stack([X, X])[I]: each conditional is the SAME density — valid
        conditional semantics (the reference's joint machinery likewise
        derives per-branch densities)."""
        with pm.Model():
            X = pm.Normal("X", 0, 1)
            I = pm.Bernoulli("I", 0.5)  # noqa: E741
        M = pmm.stack([X, X])[I]
        for i in (0, 1):
            np.testing.assert_allclose(
                float(pm.logp(M, 0.5, env={"I": i})),
                st.norm.logpdf(0.5),
                rtol=1e-12,
            )

    def test_rv_and_its_transform_as_slots(self):
        with pm.Model():
            X = pm.Normal("X", 0, 1)
            I = pm.Bernoulli("I", 0.5)  # noqa: E741
        M = pmm.stack([X, pmm.exp(X)])[I]
        np.testing.assert_allclose(
            float(pm.logp(M, 0.5, env={"I": 0})), st.norm.logpdf(0.5)
        )
        np.testing.assert_allclose(
            float(pm.logp(M, 0.5, env={"I": 1})),
            st.lognorm(1.0).logpdf(0.5),
            rtol=1e-12,
        )


class TestMultivariateComponents:
    MU1 = np.zeros(3)
    MU2 = np.ones(3)
    C1 = np.eye(3)
    C2 = 2.0 * np.eye(3)

    def _mix(self):
        with pm.Model():
            X = pm.MvNormal("X", mu=self.MU1, cov=self.C1)
            Y = pm.MvNormal("Y", mu=self.MU2, cov=self.C2)
            I = pm.Bernoulli("I", 0.5)  # noqa: E741
        return pmm.stack([X, Y])[I]

    def test_stack_index_mvnormal(self):
        M = self._mix()
        v = np.array([0.3, -0.2, 0.8])
        np.testing.assert_allclose(
            float(pm.logp(M, v, env={"I": 0})),
            st.multivariate_normal(self.MU1, self.C1).logpdf(v),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            float(pm.logp(M, v, env={"I": 1})),
            st.multivariate_normal(self.MU2, self.C2).logpdf(v),
            rtol=1e-12,
        )

    def test_out_of_range_mv_index_neg_inf(self):
        M = self._mix()
        lp = pm.logp(M, np.zeros(3), env={"I": 2})
        assert np.all(np.isneginf(np.asarray(lp)))

    def test_dirichlet_components(self):
        a1 = np.array([2.0, 3.0, 4.0])
        a2 = np.array([10.0, 1.0, 1.0])
        with pm.Model():
            X = pm.Dirichlet("X", a=a1)
            Y = pm.Dirichlet("Y", a=a2)
            I = pm.Bernoulli("I", 0.5)  # noqa: E741
        M = pmm.stack([X, Y])[I]
        v = np.array([0.2, 0.3, 0.5])
        np.testing.assert_allclose(
            float(pm.logp(M, v, env={"I": 1})),
            st.dirichlet(a2).logpdf(v),
            rtol=1e-10,
        )

    def test_switch_over_multivariate_rejected(self):
        """Elementwise switch cannot carve a joint event; the stack-index
        form above is the measurable spelling."""
        with pm.Model():
            X = pm.MvNormal("X", mu=self.MU1, cov=self.C1)
            Y = pm.MvNormal("Y", mu=self.MU2, cov=self.C2)
            I = pm.Bernoulli("I", 0.5)  # noqa: E741
        with pytest.raises(TypeError, match="multivariate"):
            pm.logp(pmm.where(pmm.eq(I, 1), X, Y), np.zeros(3), env={"I": 1})

    def test_forward_sampling_mean(self):
        M = self._mix()
        s = np.asarray(pm.draw(M, draws=8000, random_seed=1))
        assert s.shape == (8000, 3)
        np.testing.assert_allclose(
            s.mean(0), 0.5 * self.MU1 + 0.5 * self.MU2, atol=0.06
        )
