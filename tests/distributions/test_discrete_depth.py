"""Discrete depth battery.

Ports the remaining reference tests/distributions/test_discrete.py case
inventory (oracles rebuilt, not copied): parametrization-validation
matrices (NegativeBinomial get_n_p, p/logit_p exclusivity), logp-stability
pins (sigmoid-underflow p, large-n Poisson limit), Categorical validation
and batch-dims semantics incl. logcdf, Ordered* factories (compute_p
Deterministic, OrderedProbit sigma, shape matrices, imputation interplay),
and the discrete support-point expected-value table.
"""

import re
import warnings

import numpy as np
import pytest
import scipy.special as sp
import scipy.stats as st

import jax
import pymc_tpu as pm
from pymc_tpu.exceptions import ImputationWarning
from pymc_tpu.graph import as_node, evaluate


def _eval(x, env=None):
    return np.asarray(evaluate(x, env or {}))


class TestNegativeBinomialParametrization:
    """Reference test_discrete.py::test_negative_binomial_init_fail."""

    @pytest.mark.parametrize(
        "mu, p, alpha, n, expected",
        [
            (5, None, None, None, "Must specify either alpha or n."),
            (None, 0.5, None, None, "Must specify either alpha or n."),
            (None, None, None, None, "Must specify either alpha or n."),
            (5, None, 2, 2, "Can't specify both alpha and n."),
            (None, 0.5, 2, 2, "Can't specify both alpha and n."),
            (None, None, 2, 2, "Can't specify both alpha and n."),
            (None, None, 2, None, "Must specify either mu or p."),
            (None, None, None, 2, "Must specify either mu or p."),
            (5, 0.5, 2, None, "Can't specify both mu and p."),
            (5, 0.5, None, 2, "Can't specify both mu and p."),
        ],
    )
    def test_init_fail(self, mu, p, alpha, n, expected):
        with pm.Model():
            with pytest.raises(
                ValueError,
                match=re.escape(f"Incompatible parametrization. {expected}"),
            ):
                pm.NegativeBinomial("x", mu=mu, p=p, alpha=alpha, n=n)

    def test_mixed_parametrizations_agree(self):
        # (mu, n) and (p, alpha) mixed pairs are valid (reference get_n_p)
        d_mu_n = pm.NegativeBinomial.dist(mu=5.0, n=2.0)
        d_p_n = pm.NegativeBinomial.dist(p=2.0 / 7.0, n=2.0)
        d_p_alpha = pm.NegativeBinomial.dist(p=2.0 / 7.0, alpha=2.0)
        for v in [0, 3, 11]:
            ref = st.nbinom.logpmf(v, 2.0, 2.0 / 7.0)
            for d in (d_mu_n, d_p_n, d_p_alpha):
                np.testing.assert_allclose(float(pm.logp(d, v)), ref, rtol=1e-10)

    def test_get_n_p(self):
        n, p = pm.NegativeBinomial.get_n_p(mu=5.0, alpha=8.0)
        assert n == 8.0
        np.testing.assert_allclose(_eval(p), 8.0 / 13.0)


class TestNegativeBinomialStability:
    def test_logp_stable_when_p_underflows(self):
        """p = sigmoid(a): log(p)/log1p(-p) must come from the logit, not the
        rounded probability (reference
        test_negative_binomial_logp_stable_when_p_underflows)."""
        for a, expected in [
            (-800.0, -1598.6137056388802),
            (37.0, -109.6137056388801),
            (5000.0, -14998.61370563888),
        ]:
            d = pm.NegativeBinomial.dist(
                n=2.0, p=pm.math.sigmoid(as_node(np.float64(a)))
            )
            np.testing.assert_allclose(_eval(pm.logp(d, 3)), expected, rtol=1e-12)

    def test_logp_grad_finite_at_sigmoid_tail(self):
        def f(a):
            d = pm.NegativeBinomial.dist(n=2.0, p=pm.math.sigmoid(as_node(a)))
            return pm.logp(d, 3)

        g = jax.grad(lambda a: f(a))(np.float64(-800.0))
        assert np.isfinite(g)

    def test_logp_large_n(self):
        """gammaln(v+n) - gammaln(n) cancels at large n: the density must fall
        back on the Poisson(mu) limit (reference test_negative_binomial_logp_large_n)."""
        for n in [1e12, 1e18, 1e20]:
            d = pm.NegativeBinomial.dist(mu=5.0, alpha=n)
            np.testing.assert_allclose(
                float(pm.logp(d, 3)), -1.9634457319257537, rtol=1e-10
            )

    def test_degenerate_p_zero_is_inf_not_invalid(self):
        # raw p == 0.0 (not sigmoid-headed) gives the limiting -inf, not a
        # parameter error (reference discrete.py logp comment)
        assert float(pm.logp(pm.NegativeBinomial.dist(n=2.0, p=0.0), 3)) == -np.inf


class TestPLogitPExclusivity:
    """Reference test_bernoulli_wrong_arguments + Binomial/Categorical init."""

    @pytest.mark.parametrize("cls_kwargs", [
        (pm.Bernoulli, {}),
        (pm.Binomial, {"n": 5}),
        (pm.Categorical, {}),
    ])
    def test_both_and_neither(self, cls_kwargs):
        cls, extra = cls_kwargs
        p = [0.3, 0.7] if cls is pm.Categorical else 0.5
        logit_p = [0.0, 0.0] if cls is pm.Categorical else 0.0
        with pytest.raises(
            ValueError,
            match=re.escape(
                "Incompatible parametrization. Can't specify both p and logit_p."
            ),
        ):
            cls.dist(p=p, logit_p=logit_p, **extra)
        with pytest.raises(
            ValueError,
            match=re.escape(
                "Incompatible parametrization. Must specify either p or logit_p."
            ),
        ):
            cls.dist(**extra)

    def test_bernoulli_logit_p_stable(self):
        d = pm.Bernoulli.dist(logit_p=-800.0)
        np.testing.assert_allclose(float(pm.logp(d, 1)), -800.0)
        np.testing.assert_allclose(float(pm.logp(d, 0)), 0.0, atol=1e-300)
        d = pm.Bernoulli.dist(logit_p=800.0)
        np.testing.assert_allclose(float(pm.logp(d, 0)), -800.0)
        # logcdf rides the same stable path
        np.testing.assert_allclose(float(pm.logcdf(d, 0)), -800.0)

    def test_binomial_sigmoid_p_stable(self):
        d = pm.Binomial.dist(n=4, p=pm.math.sigmoid(as_node(np.float64(-600.0))))
        # C(4,2) + 2*log p + 2*log(1-p) = log 6 - 1200
        np.testing.assert_allclose(
            _eval(pm.logp(d, 2)), np.log(6.0) - 1200.0, rtol=1e-12
        )

    def test_geometric_sigmoid_p_stable(self):
        d = pm.Geometric.dist(p=pm.math.sigmoid(as_node(np.float64(-700.0))))
        # log p + (v-1) log(1-p) = -700 + ~0
        np.testing.assert_allclose(_eval(pm.logp(d, 1)), -700.0, rtol=1e-12)
        np.testing.assert_allclose(_eval(pm.logp(d, 5)), -700.0, rtol=1e-10)


class TestCategoricalDepth:
    @pytest.mark.parametrize("method", ["logp", "logcdf"])
    def test_batch_dims(self, method):
        """Reference test_categorical_logp_batch_dims (expected values)."""
        fn = pm.logp if method == "logp" else pm.logcdf
        p = np.array([0.2, 0.3, 0.5])

        # core case
        expr = fn(pm.Categorical.dist(p=p, shape=()), np.array(2.0))
        expected = 0.5 if method == "logp" else 1.0
        np.testing.assert_allclose(np.exp(_eval(expr)), expected)

        batch_value = np.array([0, 1])
        # explicit batched value broadcasts p
        expr = fn(pm.Categorical.dist(p=p[None], shape=(2,)), batch_value)
        expected = [0.2, 0.3] if method == "logp" else [0.2, 0.5]
        np.testing.assert_allclose(np.exp(_eval(expr)), expected)

        # implicit batch value broadcasts p
        expr = fn(pm.Categorical.dist(p=p, shape=()), batch_value)
        np.testing.assert_allclose(np.exp(_eval(expr)), expected)

        # explicit batched value and batched p
        batch_p = np.array([p[::-1], p])
        expr = fn(pm.Categorical.dist(p=batch_p, shape=(2,)), batch_value)
        expected = [0.5, 0.3] if method == "logp" else [0.5, 0.5]
        np.testing.assert_allclose(np.exp(_eval(expr)), expected)

        # implicit batch p broadcasts value
        expr = fn(pm.Categorical.dist(p=batch_p), np.array(2.0))
        expected = [0.2, 0.5] if method == "logp" else [1.0, 1.0]
        np.testing.assert_allclose(np.exp(_eval(expr)), expected)

    def test_bounds(self):
        d = pm.Categorical.dist(p=np.array([0.2, 0.3, 0.5]))
        assert float(pm.logp(d, -1)) == -np.inf
        assert float(pm.logp(d, 3)) == -np.inf

    @pytest.mark.parametrize(
        "p",
        [
            np.array([-0.2, 0.3, 0.5]),
            # sums to 1 but contains negative values
            np.array([-0.2, 0.7, 0.5]),
            # rescaling would hide the negatives (reference issue #2082 case)
            np.array([-1.0, -1.0, 0.0, 0.0]),
        ],
    )
    def test_negative_p_constant(self, p):
        with pytest.raises(ValueError, match="Negative `p` parameters are not valid"):
            pm.Categorical.dist(p=p)

    def test_p_not_normalized_constant(self):
        with pytest.warns(UserWarning, match="They will be automatically rescaled"):
            d = pm.Categorical.dist(p=[1, 1, 1, 1, 1])
        np.testing.assert_allclose(_eval(d.p).sum(), 1.0)

    def test_negative_p_symbolic(self):
        # invalid params -> -inf (the XLA analogue of ParameterValueError)
        p = as_node(np.array([-1.0 / 3, -1.0 / 3, -1.0 / 3]))
        d = pm.Categorical.dist(p=p)
        assert _eval(pm.logp(d, 1)) == -np.inf

    def test_p_not_normalized_symbolic(self):
        # symbolic p is NOT silently rescaled: sum(p) ~ 1 is a density
        # precondition (reference test_categorical_p_not_normalized_symbolic)
        p = as_node(np.array([0.5, 0.5, 0.5]))
        d = pm.Categorical.dist(p=p)
        assert _eval(pm.logp(d, 1)) == -np.inf
        assert _eval(pm.logcdf(d, 1)) == -np.inf

    def test_logcdf_matches_cumsum(self):
        p = np.array([0.1, 0.2, 0.3, 0.4])
        d = pm.Categorical.dist(p=p)
        for v in range(4):
            np.testing.assert_allclose(
                np.exp(float(pm.logcdf(d, v))), p[: v + 1].sum(), rtol=1e-12
            )
        assert float(pm.logcdf(d, -1)) == -np.inf


class TestOrderedLogisticDepth:
    def test_expected_categorical(self):
        p = _eval(pm.OrderedLogistic.compute_p(0.0, np.array([-2.0, 0.0, 2.0])))
        np.testing.assert_allclose(
            p, [0.11920292, 0.38079708, 0.38079708, 0.11920292], rtol=1e-6
        )

    @pytest.mark.parametrize(
        "eta, cutpoints, expected",
        [
            (0, [-2.0, 0, 2.0], (4,)),
            ([-1], [-2.0, 0, 2.0], (1, 4)),
            ([1.0, -2.0], [-1.0, 0, 1.0], (2, 4)),
            (np.zeros((3, 2)), [-2.0, 0, 1.0], (3, 2, 4)),
            (np.ones((5, 2)), [[-2.0, 0, 1.0], [-1.0, 0, 1.0]], (5, 2, 4)),
            (np.ones((3, 5, 2)), [[-2.0, 0, 1.0], [-1.0, 0, 1.0]], (3, 5, 2, 4)),
        ],
    )
    def test_shape_inputs(self, eta, cutpoints, expected):
        p = _eval(pm.OrderedLogistic.compute_p(np.asarray(eta, float),
                                               np.asarray(cutpoints, float)))
        assert p.shape == expected
        np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-6)

    def test_compute_p_deterministic(self):
        with pm.Model(coords={"test_dim": [0]}) as m:
            pm.OrderedLogistic("ol_p", cutpoints=np.array([-2.0, 0, 2.0]), eta=0,
                               dims="test_dim")
            pm.OrderedLogistic("ol_no_p", cutpoints=np.array([-2.0, 0, 2.0]), eta=0,
                               compute_p=False, dims="test_dim")
        assert len(m.deterministics) == 1
        assert m.deterministics[0].name == "ol_p_probs"
        np.testing.assert_allclose(
            _eval(m.deterministics[0], {"ol_p": np.array([0])}),
            [0.11920292, 0.38079708, 0.38079708, 0.11920292],
            rtol=1e-6,
        )

    def test_compute_p_with_imputation(self):
        with pm.Model(coords={"test_dim": [0, 1, 2]}) as m:
            with pytest.warns(ImputationWarning):
                pm.OrderedLogistic(
                    "ol",
                    cutpoints=np.array([[-2.0, 0, 2.0]]),
                    eta=0,
                    observed=[0, np.nan, 1],
                    dims=["test_dim"],
                )
        # one deterministic from imputation, one from compute_p
        assert len(m.deterministics) == 2

    @pytest.mark.parametrize("shape", [(), (1,), (3, 1), (3, 2)], ids=str)
    def test_dimensions(self, shape):
        """Reference test_orderedlogistic_dimensions: equal-probability
        cutpoints give logp = log(1/10) per element for any eta batch shape."""
        loge = np.log10(np.exp(1))
        size = 7
        cutpoints = np.tile(sp.logit(np.linspace(0, 1, 11)[1:-1]), (*shape, 1))
        obs = np.random.default_rng(0).integers(0, 2, size=(size, *shape))
        with pm.Model():
            ol = pm.OrderedLogistic(
                "ol", eta=np.zeros(shape), cutpoints=cutpoints, observed=obs
            )
            c = pm.Categorical("c", p=np.ones((*shape, 10)) / 10, observed=obs)
        expected = -np.prod((size, *shape))
        np.testing.assert_allclose(
            float(_eval(pm.logp(ol, np.ones_like(obs)).sum())) * loge, expected,
            rtol=1e-8,
        )
        np.testing.assert_allclose(
            float(_eval(pm.logp(c, np.ones_like(obs)).sum())) * loge, expected,
            rtol=1e-8,
        )


class TestOrderedProbitDepth:
    def test_expected_categorical(self):
        p = _eval(pm.OrderedProbit.compute_p(0.0, np.array([-2.0, 0.0, 2.0]), 1.0))
        np.testing.assert_allclose(
            p, [0.02275013, 0.47724987, 0.47724987, 0.02275013], rtol=1e-6
        )

    @pytest.mark.parametrize(
        "eta, cutpoints, sigma, expected",
        [
            (0, [-2.0, 0, 2.0], 1.0, (4,)),
            ([-1], [-1.0, 0, 2.0], [2.0], (1, 4)),
            ([1.0, -2.0], [-1.0, 0, 1.0], 1.0, (2, 4)),
            ([1.0, -2.0, 3.0], [-1.0, 0, 2.0], np.ones((1, 3)), (1, 3, 4)),
            (np.zeros((2, 3)), [-2.0, 0, 1.0], [1.0, 2.0, 5.0], (2, 3, 4)),
            (np.ones((2, 3)), [-1.0, 0, 1.0], np.ones((2, 3)), (2, 3, 4)),
            (np.zeros((5, 2)), [[-2.0, 0, 1.0], [-1.0, 0, 1.0]],
             np.ones((2, 5, 2)), (2, 5, 2, 4)),
        ],
    )
    def test_shape_inputs(self, eta, cutpoints, sigma, expected):
        p = _eval(pm.OrderedProbit.compute_p(
            np.asarray(eta, float), np.asarray(cutpoints, float),
            np.asarray(sigma, float)))
        assert p.shape == expected
        np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-6)

    def test_sigma_scales_the_link(self):
        # P(y <= k) = Phi((c_k - eta)/sigma): doubling sigma halves the probit
        cut = np.array([-1.0, 0.0, 1.0])
        p2 = _eval(pm.OrderedProbit.compute_p(0.0, cut, 2.0))
        expected_cdf = st.norm.cdf(cut / 2.0)
        np.testing.assert_allclose(np.cumsum(p2)[:-1], expected_cdf, rtol=1e-8)

    def test_sigma_logp_oracle(self):
        d = pm.OrderedProbit.dist(eta=0.3, cutpoints=np.array([-1.0, 0.5]), sigma=1.7)
        cdf = st.norm.cdf((np.array([-np.inf, -1.0, 0.5, np.inf]) - 0.3) / 1.7)
        probs = np.diff(cdf)
        for v in range(3):
            np.testing.assert_allclose(
                float(pm.logp(d, v)), np.log(probs[v]), rtol=1e-8
            )

    def test_compute_p_deterministic(self):
        with pm.Model() as m:
            pm.OrderedProbit("op_p", cutpoints=np.array([-2.0, 0, 2.0]), eta=0,
                             sigma=1)
            pm.OrderedProbit("op_no_p", cutpoints=np.array([-2.0, 0, 2.0]), eta=0,
                             sigma=1, compute_p=False)
        assert len(m.deterministics) == 1

    def test_compute_p_with_imputation(self):
        with pm.Model() as m:
            with pytest.warns(ImputationWarning):
                pm.OrderedProbit(
                    "op", cutpoints=np.array([-2.0, 0, 2.0]), eta=0, sigma=1,
                    observed=[0, np.nan, 1],
                )
        assert len(m.deterministics) == 2


class TestImpliedDegenerateShape:
    def test_discrete_uniform(self):
        assert pm.draw(pm.DiscreteUniform.dist(0, [1])).shape == (1,)


class TestDiscreteSupportPoints:
    """Reference test_discrete.py TestMoments expected-value table."""

    @pytest.mark.parametrize(
        "dist_kwargs, size, expected",
        [
            ((pm.Bernoulli, {"p": 0.3}), None, 0),
            ((pm.Bernoulli, {"p": 0.9}), 5, np.ones(5)),
            ((pm.Bernoulli, {"p": np.array([0.1, 0.6])}), None, np.array([0, 1])),
            ((pm.BetaBinomial, {"alpha": 1.0, "beta": 1.0, "n": 10}), None, 5),
            ((pm.BetaBinomial, {"alpha": np.array([1.0, 2.0]), "beta": 1.0,
                                "n": 10}), None, np.array([5, 7])),
            ((pm.Binomial, {"n": 7, "p": 0.7}), None, 5),
            ((pm.Binomial, {"n": 7, "p": 0.3}), 5, np.full(5, 2)),
            ((pm.Poisson, {"mu": 2.7}), None, 2),
            ((pm.Poisson, {"mu": np.array([1.2, 4.6])}), None, np.array([1, 4])),
            ((pm.NegativeBinomial, {"n": 10, "p": 0.7}), None, 4),
            ((pm.NegativeBinomial, {"n": np.full(3, 10),
                                    "p": np.arange(1, 4) / 10}), None,
             np.array([90, 40, 23])),
            ((pm.Geometric, {"p": 0.5}), None, 2),
            ((pm.Geometric, {"p": np.array([0.2, 0.8])}), None, np.array([5, 1])),
            ((pm.HyperGeometric, {"N": 50, "k": 10, "n": 20}), None, 4),
            ((pm.DiscreteUniform, {"lower": 1, "upper": 5}), None, 3),
            ((pm.DiscreteWeibull, {"q": 0.5, "beta": 0.5}), None, 0),
            ((pm.DiscreteWeibull, {"q": 0.6, "beta": 0.1}), 5, np.full(5, 20)),
            ((pm.Categorical, {"p": np.array([0.2, 0.3, 0.5])}), None, 2),
        ],
    )
    def test_expected(self, dist_kwargs, size, expected):
        cls, kwargs = dist_kwargs
        d = cls.dist(size=size, **kwargs) if size is not None else cls.dist(**kwargs)
        spt = np.asarray(d.support_point())
        np.testing.assert_allclose(spt, expected)
        assert np.all(np.isfinite(_eval(d.logp(spt))))
