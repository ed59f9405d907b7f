"""Discrete distribution contract tests vs the scipy oracle (mirrors
reference tests/distributions/test_discrete.py)."""

import numpy as np
import pytest
import scipy.stats as st

import pymc_tpu as pm
from pymc_tpu.testing import (
    Bool,
    Domain,
    Nat,
    Unit,
    check_logcdf,
    check_logp,
    check_selfconsistency_discrete_logcdf,
    discrete_random_tester,
)

NatBig = Domain([0, 1, 2, 3, 5000, np.inf], dtype="int64")
UnitOpen = Domain([0, 0.1, 0.5, 0.9, 1])  # interior excludes invalid edges
NSmall = Domain([5], dtype="int64", edges=(None, None))
PosN = Domain([1, 2, 3, 10, np.inf], dtype="int64")


class TestBinomial:
    def test_logp(self):
        check_logp(
            pm.Binomial,
            Nat,
            {"n": NSmall, "p": UnitOpen},
            lambda value, n, p: st.binom.logpmf(value, n, p),
            skip_paramdomain_outside_edge_test=True,
        )

    def test_logcdf(self):
        check_logcdf(
            pm.Binomial,
            Nat,
            {"n": NSmall, "p": UnitOpen},
            lambda value, n, p: st.binom.logcdf(value, n, p),
            skip_paramdomain_outside_edge_test=True,
        )

    def test_logit_p(self):
        d = pm.Binomial.dist(n=10, logit_p=0.5)
        p = 1 / (1 + np.exp(-0.5))
        np.testing.assert_allclose(
            float(pm.logp(d, 4)), st.binom.logpmf(4, 10, p), rtol=1e-8
        )

    def test_random(self):
        discrete_random_tester(
            pm.Binomial,
            {"n": Domain([10], dtype="int64", edges=(None, None)),
             "p": Domain([0.4], edges=(None, None))},
            lambda k, n, p: st.binom.logpmf(k, n, p),
            lambda n, p: np.arange(n + 1),
        )


class TestBetaBinomial:
    def test_logp(self):
        check_logp(
            pm.BetaBinomial,
            Nat,
            {"alpha": Domain([0.5, 2.0], edges=(None, None)),
             "beta": Domain([0.5, 2.0], edges=(None, None)),
             "n": NSmall},
            lambda value, alpha, beta, n: st.betabinom.logpmf(value, n, alpha, beta),
            skip_paramdomain_outside_edge_test=True,
        )


class TestBernoulli:
    def test_logp(self):
        check_logp(
            pm.Bernoulli,
            Bool,
            {"p": UnitOpen},
            lambda value, p: st.bernoulli.logpmf(value, p),
            skip_paramdomain_outside_edge_test=True,
        )

    def test_logcdf(self):
        check_logcdf(
            pm.Bernoulli,
            Bool,
            {"p": UnitOpen},
            lambda value, p: st.bernoulli.logcdf(value, p),
            skip_paramdomain_outside_edge_test=True,
        )


class TestPoisson:
    def test_logp(self):
        check_logp(
            pm.Poisson,
            Nat,
            {"mu": Domain([0.5, 1.0, 2.0, 10.0], edges=(0, np.inf))},
            lambda value, mu: st.poisson.logpmf(value, mu),
            skip_paramdomain_outside_edge_test=True,
        )

    def test_logcdf(self):
        check_logcdf(
            pm.Poisson,
            Nat,
            {"mu": Domain([0.5, 1.0, 2.0, 10.0], edges=(0, np.inf))},
            lambda value, mu: st.poisson.logcdf(value, mu),
            skip_paramdomain_outside_edge_test=True,
        )

    def test_selfconsistency(self):
        check_selfconsistency_discrete_logcdf(
            pm.Poisson,
            Domain([1, 5, 10], dtype="int64", edges=(None, None)),
            {"mu": Domain([2.0, 7.5], edges=(None, None))},
        )

    def test_random(self):
        discrete_random_tester(
            pm.Poisson,
            {"mu": Domain([4.0], edges=(None, None))},
            lambda k, mu: st.poisson.logpmf(k, mu),
            lambda mu: np.arange(20),
        )


class TestNegativeBinomial:
    def test_logp_n_p(self):
        check_logp(
            pm.NegativeBinomial,
            Nat,
            {"n": Domain([1.0, 2.0, 5.0], edges=(None, None)), "p": UnitOpen},
            lambda value, n, p: st.nbinom.logpmf(value, n, p),
            skip_paramdomain_outside_edge_test=True,
        )

    def test_mu_alpha(self):
        d = pm.NegativeBinomial.dist(mu=5.0, alpha=2.0)
        p = 2.0 / (5.0 + 2.0)
        np.testing.assert_allclose(
            float(pm.logp(d, 3)), st.nbinom.logpmf(3, 2.0, p), rtol=1e-8
        )

    def test_logcdf(self):
        check_logcdf(
            pm.NegativeBinomial,
            Nat,
            {"n": Domain([1.0, 2.0, 5.0], edges=(None, None)), "p": UnitOpen},
            lambda value, n, p: st.nbinom.logcdf(value, n, p),
            skip_paramdomain_outside_edge_test=True,
        )


class TestGeometric:
    def test_logp(self):
        check_logp(
            pm.Geometric,
            PosN,
            {"p": UnitOpen},
            lambda value, p: st.geom.logpmf(value, p),
            skip_paramdomain_outside_edge_test=True,
        )

    def test_logcdf(self):
        check_logcdf(
            pm.Geometric,
            PosN,
            {"p": UnitOpen},
            lambda value, p: st.geom.logcdf(value, p),
            skip_paramdomain_outside_edge_test=True,
        )


class TestHyperGeometric:
    def test_logp(self):
        check_logp(
            pm.HyperGeometric,
            Domain([0, 1, 2, 3, np.inf], dtype="int64"),
            {"N": Domain([20], dtype="int64", edges=(None, None)),
             "k": Domain([8], dtype="int64", edges=(None, None)),
             "n": Domain([5], dtype="int64", edges=(None, None))},
            lambda value, N, k, n: st.hypergeom.logpmf(value, N, k, n),
            skip_paramdomain_outside_edge_test=True,
        )


class TestDiscreteUniform:
    def test_logp(self):
        check_logp(
            pm.DiscreteUniform,
            Domain([0, 1, 2, 3, np.inf], dtype="int64"),
            {"lower": Domain([0], dtype="int64", edges=(None, None)),
             "upper": Domain([3, 6], dtype="int64", edges=(None, None))},
            lambda value, lower, upper: st.randint.logpmf(value, lower, upper + 1),
            skip_paramdomain_outside_edge_test=True,
        )

    def test_logcdf(self):
        check_logcdf(
            pm.DiscreteUniform,
            Domain([0, 1, 2, 3, np.inf], dtype="int64"),
            {"lower": Domain([0], dtype="int64", edges=(None, None)),
             "upper": Domain([3, 6], dtype="int64", edges=(None, None))},
            lambda value, lower, upper: st.randint.logcdf(value, lower, upper + 1),
            skip_paramdomain_outside_edge_test=True,
        )


class TestDiscreteWeibull:
    def test_logp(self):
        def ref(value, q, beta):
            return np.log(q ** (value**beta) - q ** ((value + 1) ** beta))

        check_logp(
            pm.DiscreteWeibull,
            Nat,
            {"q": UnitOpen, "beta": Domain([0.5, 1.0, 2.0], edges=(None, None))},
            ref,
            skip_paramdomain_outside_edge_test=True,
        )


class TestCategorical:
    def test_logp(self):
        p = np.array([0.2, 0.3, 0.5])
        d = pm.Categorical.dist(p=p)
        for k in range(3):
            np.testing.assert_allclose(
                float(pm.logp(d, k)), np.log(p[k]), rtol=1e-8
            )
        assert float(pm.logp(d, 3)) == -np.inf
        assert float(pm.logp(d, -1)) == -np.inf

    def test_batch(self):
        p = np.array([[0.2, 0.8], [0.6, 0.4]])
        d = pm.Categorical.dist(p=p)
        vals = np.array([1, 0])
        expected = np.log(np.array([0.8, 0.6]))
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, vals)), expected, rtol=1e-8
        )

    def test_random(self):
        import jax

        d = pm.Categorical.dist(p=np.array([0.1, 0.2, 0.7]), size=(5000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(0)))
        freqs = np.bincount(draws, minlength=3) / 5000
        np.testing.assert_allclose(freqs, [0.1, 0.2, 0.7], atol=0.03)


class TestOrderedLogistic:
    def test_logp(self):
        eta = 0.5
        cutpoints = np.array([-1.0, 0.5, 2.0])

        def sigmoid(x):
            return 1 / (1 + np.exp(-x))

        cdf = sigmoid(cutpoints - eta)
        probs = np.diff(np.concatenate([[0.0], cdf, [1.0]]))
        d = pm.OrderedLogistic.dist(eta=eta, cutpoints=cutpoints)
        for k in range(4):
            np.testing.assert_allclose(
                float(pm.logp(d, k)), np.log(probs[k]), rtol=1e-6
            )


class TestOrderedProbit:
    def test_logp(self):
        eta = -0.3
        cutpoints = np.array([-1.0, 0.5, 2.0])
        cdf = st.norm.cdf(cutpoints - eta)
        probs = np.diff(np.concatenate([[0.0], cdf, [1.0]]))
        d = pm.OrderedProbit.dist(eta=eta, cutpoints=cutpoints)
        for k in range(4):
            np.testing.assert_allclose(
                float(pm.logp(d, k)), np.log(probs[k]), rtol=1e-6
            )


class TestDiscreteIcdf:
    """icdf vs scipy ppf + cdf/icdf self-consistency (reference
    tests/distributions/test_discrete.py icdf coverage for the three
    discrete dists that implement it: Bernoulli, Geometric,
    DiscreteUniform)."""

    qs = np.array([1e-6, 0.05, 0.3, 0.5, 0.7, 0.95, 1 - 1e-6])

    def test_bernoulli_ppf(self):
        import jax.numpy as jnp

        for p in (0.1, 0.5, 0.9):
            d = pm.Bernoulli.dist(p=p)
            got = np.asarray(d.icdf(jnp.asarray(self.qs)))
            expected = st.bernoulli(p).ppf(self.qs)
            np.testing.assert_array_equal(got, expected)

    def test_geometric_ppf(self):
        import jax.numpy as jnp

        for p in (0.05, 0.4, 0.8):
            d = pm.Geometric.dist(p=p)
            got = np.asarray(d.icdf(jnp.asarray(self.qs)))
            expected = st.geom(p).ppf(self.qs)
            np.testing.assert_array_equal(got, expected)

    def test_discrete_uniform_ppf(self):
        import jax.numpy as jnp

        d = pm.DiscreteUniform.dist(lower=-3, upper=6)
        got = np.asarray(d.icdf(jnp.asarray(self.qs)))
        expected = st.randint(-3, 7).ppf(self.qs)
        np.testing.assert_array_equal(got, expected)

    def test_icdf_of_cdf_is_identity(self):
        import jax.numpy as jnp

        # exact round trip on integer support points (float boundary cases
        # covered by the one-step back-off in _icdf)
        g = pm.Geometric.dist(p=0.3)
        x = jnp.arange(1, 30)
        q = jnp.exp(g.logcdf(x))
        np.testing.assert_array_equal(np.asarray(g.icdf(q)), np.asarray(x))

        du = pm.DiscreteUniform.dist(lower=0, upper=19)
        x = jnp.arange(0, 20)
        q = jnp.exp(du.logcdf(x))
        np.testing.assert_array_equal(np.asarray(du.icdf(q)), np.asarray(x))

    def test_icdf_outside_unit_is_nan(self):
        import jax.numpy as jnp

        d = pm.Geometric.dist(p=0.3)
        got = np.asarray(d.icdf(jnp.asarray([-0.1, 1.1])))
        assert np.all(np.isnan(got))


class TestPRescaling:
    """Constant p not summing to 1 is rescaled with a UserWarning
    (reference discrete.py:1158, multivariate.py:632)."""

    def test_categorical(self):
        import warnings

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            d = pm.Categorical.dist(p=[2.0, 2.0, 4.0])
            assert any("rescaled" in str(x.message) for x in w)
        np.testing.assert_allclose(
            float(np.asarray(d.logp(2))), np.log(0.5), rtol=1e-6
        )

    def test_multinomial(self):
        import warnings

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            d = pm.Multinomial.dist(n=10, p=[2.0, 2.0, 4.0])
            assert any("rescaled" in str(x.message) for x in w)
        lp = float(np.asarray(d.logp(np.array([2, 3, 5]))))
        import scipy.stats as st

        np.testing.assert_allclose(
            lp, st.multinomial(10, [0.25, 0.25, 0.5]).logpmf([2, 3, 5]),
            rtol=1e-6,
        )
