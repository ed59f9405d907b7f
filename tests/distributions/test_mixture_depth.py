"""Mixture distribution depth battery.

Ports the remaining reference tests/distributions/test_mixture.py case
inventory at DIST level (the logprob-level mixtures live in
tests/logprob/test_measurable_mixture.py): component-list validation
(singleton warning, discrete/continuous mixing), the default-transform
matrix incl. structural Interval-bounds comparison and
MixtureTransformWarning, transform/logp consistency, MixtureSameFamily
batch semantics, ZeroInflated/Hurdle closed-form logps and support points,
and hurdle dlogp finiteness.
"""

import warnings

import numpy as np
import pytest
import scipy.stats as st

import jax
import jax.numpy as jnp
import pymc_tpu as pm
from pymc_tpu.distributions import transforms as tr
from pymc_tpu.distributions.mixture import MixtureTransformWarning
from pymc_tpu.graph import evaluate


def _eval(x, env=None):
    return np.asarray(evaluate(x, env or {}))


class TestComponentValidation:
    def test_iterable_single_component_warning(self):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            pm.Mixture.dist(w=[0.5, 0.5], comp_dists=pm.Normal.dist(size=2))
            pm.Mixture.dist(
                w=[0.5, 0.5],
                comp_dists=[pm.Normal.dist(size=2), pm.Normal.dist(size=2)],
            )
        with pytest.warns(UserWarning, match="Single component will be treated"):
            d = pm.Mixture.dist(w=[0.5, 0.5], comp_dists=[pm.Normal.dist(size=2)])
        # treated as a mixture across the last size dimension
        assert d.shape == ()

    def test_preventing_mixing_cont_and_discrete(self):
        with pytest.raises(
            ValueError,
            match="All distributions in comp_dists must be either discrete or continuous",
        ):
            pm.Mixture.dist(
                w=[0.5, 0.5],
                comp_dists=[pm.Normal.dist(), pm.Poisson.dist(1.0)],
            )

    def test_mixture_dtype(self):
        assert pm.Mixture.dist(
            w=[0.5, 0.5],
            comp_dists=[pm.Poisson.dist(1.0), pm.Poisson.dist(2.0)],
        ).is_discrete
        assert not pm.Mixture.dist(
            w=[0.5, 0.5],
            comp_dists=[pm.Normal.dist(), pm.Normal.dist()],
        ).is_discrete


class TestMixtureDefaultTransforms:
    """Reference TestMixtureDefaultTransforms matrix."""

    def _dt(self, comp_dists, weights=None):
        if isinstance(comp_dists, list):
            w = np.ones(len(comp_dists)) / len(comp_dists)
        else:
            w = np.ones(2) / 2
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", MixtureTransformWarning)
            return pm.Mixture.dist(w if weights is None else weights,
                                   comp_dists).default_transform()

    def test_expected(self):
        assert self._dt(pm.Poisson.dist(1, size=2)) is None
        assert self._dt(pm.Normal.dist(size=2)) is None
        assert isinstance(self._dt(pm.Uniform.dist(size=2)), tr.IntervalTransform)
        assert isinstance(self._dt(pm.HalfNormal.dist(size=2)), tr.LogTransform)
        assert self._dt([pm.HalfNormal.dist(), pm.Normal.dist()]) is None
        assert isinstance(
            self._dt([pm.HalfNormal.dist(1), pm.Exponential.dist(1),
                      pm.HalfStudentT.dist(nu=4, sigma=1)]),
            tr.LogTransform,
        )
        assert isinstance(
            self._dt([pm.Uniform.dist(0, 1), pm.Uniform.dist(0, 1),
                      pm.Triangular.dist(lower=0, upper=1)]),
            tr.IntervalTransform,
        )
        # same support TYPE but different bounds: no safe transform
        assert self._dt([pm.Uniform.dist(0, 1), pm.Uniform.dist(0, 2)]) is None

    def test_warning_matrix(self):
        """Reference TestMixtureDefaultTransforms::test_warning."""
        with pm.Model():
            with warnings.catch_warnings():
                warnings.simplefilter("error")
                pm.Mixture("mix1", w=[0.5, 0.5],
                           comp_dists=[pm.HalfNormal.dist(), pm.Exponential.dist(1)])
            with pytest.warns(MixtureTransformWarning):
                pm.Mixture("mix2", w=[0.5, 0.5],
                           comp_dists=[pm.Uniform.dist(0, 1), pm.Uniform.dist(0, 2)])
            with pytest.warns(MixtureTransformWarning):
                pm.Mixture("mix3", w=[0.5, 0.5],
                           comp_dists=[pm.Normal.dist(), pm.HalfNormal.dist()])
            with warnings.catch_warnings():
                warnings.simplefilter("error")
                pm.Mixture("mix4", w=[0.5, 0.5],
                           comp_dists=[pm.Normal.dist(), pm.HalfNormal.dist()],
                           default_transform=None)
            with warnings.catch_warnings():
                warnings.simplefilter("error")
                pm.Mixture("mix6", w=[0.5, 0.5],
                           comp_dists=[pm.Normal.dist(), pm.HalfNormal.dist()],
                           observed=1.0)
            with warnings.catch_warnings():
                warnings.simplefilter("error")
                pm.Mixture("mix7", w=[0.5, 0.5],
                           comp_dists=[pm.Normal.dist(), pm.Normal.dist()])

    def test_hierarchical_interval_transform(self):
        """Structurally identical symbolic bounds share the transform; the
        mixture initial point is the transformed weighted support point
        (reference test_hierarchical_interval_transform)."""
        with pm.Model() as model:
            lower = pm.Normal("lower", 0.5)
            upper = pm.Uniform("upper", 0, 1)
            nlo1, nup1 = -abs(lower), abs(upper)
            nlo2, nup2 = -abs(lower), abs(upper)  # separate but equal graphs
            u = pm.Uniform("uniform", nlo1, nup1, default_transform=None)
            t = pm.Triangular("triangular", nlo1, nup1, c=0.25,
                              default_transform=None)
            comp1 = [pm.Uniform.dist(nlo1, nup1),
                     pm.Triangular.dist(nlo1, nup1, c=0.25)]
            comp2 = [pm.Uniform.dist(nlo2, nup2),
                     pm.Triangular.dist(nlo2, nup2, c=0.25)]
            with warnings.catch_warnings():
                warnings.simplefilter("error", MixtureTransformWarning)
                pm.Mixture("mix1", [0.3, 0.7], comp1)
                pm.Mixture("mix2", [0.3, 0.7][::-1], comp2[::-1])

        ip = model.initial_point()
        assert "mix1_interval__" in ip and "mix2_interval__" in ip
        assert ip["mix1_interval__"] != 0
        # bounds at the initial point: lower=0.5 -> (-0.5, +?); upper's
        # support point is 0.5 -> (-0.5, 0.5)
        x = 0.3 * ip["uniform"] + 0.7 * ip["triangular"]
        expected = np.log((x - (-0.5)) / (0.5 - x))
        np.testing.assert_allclose(ip["mix1_interval__"], expected, rtol=1e-6)
        np.testing.assert_allclose(ip["mix1_interval__"], ip["mix2_interval__"],
                                   rtol=1e-12)

    def test_transformed_logp_consistency(self):
        """Reference TestMixtureDefaultTransforms::test_logp: a mixture of
        HalfNormals under its log transform matches a HalfNormal's
        transformed logp; without the transform it differs by the jacobian."""
        with pm.Model() as m:
            pm.HalfNormal("halfnorm")
            comp = lambda: [pm.HalfNormal.dist(), pm.HalfNormal.dist()]
            pm.Mixture("mix_transf", w=[0.5, 0.5], comp_dists=comp())
            pm.Mixture("mix", w=[0.5, 0.5], comp_dists=comp(),
                       default_transform=None)
        logp_fn = m.compile_logp(sum=False)
        terms = logp_fn({"halfnorm_log__": 1.0, "mix_transf_log__": 1.0,
                         "mix": np.exp(1.0)})
        lp_half = float(np.asarray(terms["halfnorm"]))
        lp_mix_tr = float(np.asarray(terms["mix_transf"]))
        lp_mix = float(np.asarray(terms["mix"]))
        np.testing.assert_allclose(lp_half, lp_mix_tr, rtol=1e-10)
        np.testing.assert_allclose(lp_half, lp_mix + 1.0, rtol=1e-10)


class TestMixtureSameFamily:
    """Single batched dist as components (reference TestMixtureSameFamily)."""

    @pytest.mark.parametrize("batch_shape", [(3, 4), (10,)], ids=str)
    def test_with_multinomial(self, batch_shape):
        p = np.random.default_rng(1).dirichlet(np.ones(5), size=(*batch_shape, 3))
        n = 100 * np.ones((*batch_shape, 1))
        w = np.ones(3) / 3
        comp = pm.Multinomial.dist(n=n, p=p)  # batch (*batch_shape, 3), event (5,)
        mix = pm.Mixture.dist(w=w, comp_dists=comp)
        assert mix.shape == (*batch_shape, 5)

        value = np.random.default_rng(2).multinomial(100, np.ones(5) / 5,
                                                     size=batch_shape)
        mix_lp = _eval(mix.logp(value))
        assert mix_lp.shape == batch_shape
        # manual marginalization over the component axis
        comp_lp = np.stack(
            [_eval(pm.Multinomial.dist(n=100, p=p[..., i, :]).logp(value))
             for i in range(3)], axis=-1)
        expected = np.log(np.exp(comp_lp - comp_lp.max(-1, keepdims=True)).mean(-1)) \
            + comp_lp.max(-1)
        np.testing.assert_allclose(mix_lp, expected, rtol=1e-8)

    def test_with_mvnormal(self):
        rng = np.random.default_rng(3)
        mu = rng.normal(size=(3, 4))
        L = np.eye(4) * np.array([1.0, 2.0, 0.5, 1.5])
        cov = L @ L.T
        w = np.array([0.2, 0.3, 0.5])
        comp = pm.MvNormal.dist(mu=mu, cov=cov)
        mix = pm.Mixture.dist(w=w, comp_dists=comp)
        assert mix.shape == (4,)
        value = rng.normal(size=4)
        expected = np.log(sum(
            wi * np.exp(st.multivariate_normal.logpdf(value, mu[i], cov))
            for i, wi in enumerate(w)))
        np.testing.assert_allclose(float(_eval(mix.logp(value))), expected,
                                   rtol=1e-8)

    def test_broadcasting_in_shape(self):
        w = np.ones(2) / 2
        comp = pm.Normal.dist(mu=np.zeros((5, 2)))
        mix = pm.Mixture.dist(w=w, comp_dists=comp, shape=(5,))
        assert mix.shape == (5,)
        assert pm.draw(mix).shape == (5,)


class TestBroadcastComponents:
    """Reference test_broadcast_components / components_expanded_by_weights."""

    @pytest.mark.parametrize(
        "w_shape, comp_batch, expected",
        [
            ((3,), (), ()),
            ((4, 3), (), (4,)),
            ((3,), (4,), (4,)),
            ((4, 3), (4,), (4,)),
        ],
    )
    def test_list_components(self, w_shape, comp_batch, expected):
        w = np.full(w_shape, 1 / 3)
        comps = [pm.Normal.dist(mu=np.zeros(comp_batch), sigma=s)
                 for s in (1.0, 2.0, 3.0)]
        mix = pm.Mixture.dist(w=w, comp_dists=comps)
        assert mix.shape == expected
        assert pm.draw(mix).shape == expected
        lp = _eval(mix.logp(np.zeros(expected)))
        assert lp.shape == expected


class TestZeroInflatedDepth:
    def test_zinb_logp_oracle(self):
        """Reference test_zeroinflatednegativebinomial_logp closed form."""
        psi, mu, alpha = 0.7, 3.0, 2.0
        p_nb = alpha / (mu + alpha)
        d = pm.ZeroInflatedNegativeBinomial.dist(psi=psi, mu=mu, alpha=alpha)
        nb = st.nbinom(alpha, p_nb)
        np.testing.assert_allclose(
            float(pm.logp(d, 0)), np.log((1 - psi) + psi * nb.pmf(0)), rtol=1e-8
        )
        for v in [1, 2, 7]:
            np.testing.assert_allclose(
                float(pm.logp(d, v)), np.log(psi * nb.pmf(v)), rtol=1e-8
            )
        assert float(pm.logp(d, -1)) == -np.inf

    @pytest.mark.parametrize(
        "psi, mu, size, expected",
        [
            (0.9, 3.0, None, 3),
            (0.8, 2.9, 5, np.full(5, 2)),
            (0.2, np.arange(1, 5) * 5, None, np.arange(1, 5)),
        ],
    )
    def test_zip_support_point(self, psi, mu, size, expected):
        d = (pm.ZeroInflatedPoisson.dist(psi=psi, mu=mu, size=size)
             if size is not None else
             pm.ZeroInflatedPoisson.dist(psi=psi, mu=mu))
        np.testing.assert_allclose(np.asarray(d.support_point()), expected)

    @pytest.mark.parametrize(
        "psi, n, p, size, expected",
        [
            (0.8, 7, 0.7, None, 4),
            (0.8, 7, 0.3, 5, np.full(5, 2)),
        ],
    )
    def test_zib_support_point(self, psi, n, p, size, expected):
        d = (pm.ZeroInflatedBinomial.dist(psi=psi, n=n, p=p, size=size)
             if size is not None else
             pm.ZeroInflatedBinomial.dist(psi=psi, n=n, p=p))
        np.testing.assert_allclose(np.asarray(d.support_point()), expected)

    def test_dtype_and_broadcast(self):
        for d in [
            pm.ZeroInflatedPoisson.dist(psi=np.full((2, 3), 0.5), mu=2.0),
            pm.ZeroInflatedBinomial.dist(psi=np.full((2, 3), 0.5), n=10, p=0.3),
            pm.ZeroInflatedNegativeBinomial.dist(psi=np.full((2, 3), 0.5),
                                                 mu=2.0, alpha=1.0),
        ]:
            assert d.is_discrete
            assert d.shape == (2, 3)
            draw = pm.draw(d)
            assert draw.shape == (2, 3)
            assert np.issubdtype(draw.dtype, np.integer)


class TestHurdleDepth:
    def test_hurdle_poisson_logp_oracle(self):
        psi, mu = 0.6, 2.5
        d = pm.HurdlePoisson.dist(psi=psi, mu=mu)
        np.testing.assert_allclose(float(pm.logp(d, 0)), np.log(1 - psi), rtol=1e-8)
        trunc_norm = 1 - st.poisson(mu).pmf(0)
        for v in [1, 3, 8]:
            np.testing.assert_allclose(
                float(pm.logp(d, v)),
                np.log(psi) + st.poisson(mu).logpmf(v) - np.log(trunc_norm),
                rtol=1e-8,
            )

    def test_hurdle_negativebinomial_logp_oracle(self):
        psi, mu, alpha = 0.55, 4.0, 1.5
        p_nb = alpha / (mu + alpha)
        d = pm.HurdleNegativeBinomial.dist(psi=psi, mu=mu, alpha=alpha)
        nb = st.nbinom(alpha, p_nb)
        np.testing.assert_allclose(float(pm.logp(d, 0)), np.log(1 - psi), rtol=1e-8)
        for v in [1, 2, 9]:
            np.testing.assert_allclose(
                float(pm.logp(d, v)),
                np.log(psi) + nb.logpmf(v) - np.log(1 - nb.pmf(0)),
                rtol=1e-8,
            )

    def test_hurdle_lognormal_logp_oracle(self):
        psi, mu, sigma = 0.65, 0.3, 0.8
        d = pm.HurdleLogNormal.dist(psi=psi, mu=mu, sigma=sigma)
        # continuous hurdle: P(0) = 1-psi as a point mass, positive branch
        # scaled by psi (no truncation needed — P(X=0)=0 for LogNormal)
        for v in [0.5, 1.0, 3.3]:
            np.testing.assert_allclose(
                float(pm.logp(d, v)),
                np.log(psi) + st.lognorm(sigma, scale=np.exp(mu)).logpdf(v),
                rtol=1e-8,
            )

    @pytest.mark.parametrize(
        "cls, kwargs",
        [
            (pm.HurdlePoisson, {"mu": 1.5}),
            (pm.HurdleNegativeBinomial, {"mu": 2.0, "alpha": 1.0}),
            (pm.HurdleGamma, {"alpha": 2.0, "beta": 1.0}),
            (pm.HurdleLogNormal, {"mu": 0.0, "sigma": 1.0}),
        ],
    )
    def test_hurdle_zero_draws_fraction(self, cls, kwargs):
        psi = 0.3
        d = cls.dist(psi=psi, **kwargs)
        draws = np.asarray(pm.draw(d, draws=4000, random_seed=10))
        frac_zero = np.mean(draws == 0)
        assert abs(frac_zero - (1 - psi)) < 0.04

    @pytest.mark.parametrize(
        "cls, kwargs, v",
        [
            (pm.HurdlePoisson, {"mu": 1.5}, 2.0),
            (pm.HurdleNegativeBinomial, {"mu": 2.0, "alpha": 1.0}, 2.0),
            (pm.HurdleGamma, {"alpha": 2.0, "beta": 1.0}, 1.3),
            (pm.HurdleLogNormal, {"mu": 0.0, "sigma": 1.0}, 0.7),
        ],
    )
    def test_hurdle_dlogp_no_nan(self, cls, kwargs, v):
        """Reference test_hurdle_dlogp_no_nan: gradients w.r.t. params stay
        finite at zero AND nonzero values."""
        names = list(kwargs)

        def lp(args, value):
            d = cls.dist(psi=args[0], **{n: a for n, a in zip(names, args[1:])})
            return jnp.sum(d.logp(value))

        args = jnp.array([0.4] + [float(kwargs[n]) for n in names])
        for value in [np.array(0.0 if cls is not pm.HurdleGamma else 0.0), v]:
            g = jax.grad(lp)(args, jnp.asarray(value))
            assert np.all(np.isfinite(np.asarray(g))), (cls.__name__, value)
