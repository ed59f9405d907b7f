"""Forward-sampling behavioral contract.

Mirrors the user-facing semantics of the reference's forward tests
(/root/reference/tests/sampling/test_forward.py): prior predictive ignores
observed:1176, layered dependencies:1241, transformed support:1250,
deterministic-of-observed recomputation:711, shared-data predictions:678,
derived sums:636, exceptions:624, CustomDist random:1293,
ZeroInflatedPoisson:1319, reproducibility across seeds:1433,
var-names-not-in-trace resampled:1660.
"""

import numpy as np
import pytest

import pymc_tpu as pm


@pytest.fixture
def linear_trace():
    rng = np.random.default_rng(7)
    x = rng.normal(size=50)
    y = 2.0 * x + rng.normal(scale=0.5, size=50)
    with pm.Model() as m:
        xd = pm.Data("x", x)
        b = pm.Normal("b", 0, 5)
        sd = pm.HalfNormal("sd", 1.0)
        mu = pm.Deterministic("mu", b * xd)
        pm.Normal("y", mu, sd, observed=y, shape=xd.shape)
        idata = pm.sample(draws=150, tune=200, chains=2, random_seed=0,
                          progressbar=False,
                          compute_convergence_checks=False)
    return m, idata, x, y


class TestPriorPredictiveContract:
    def test_ignores_observed(self):
        # reference test_ignores_observed: prior draws must not shrink
        # toward the data
        y = np.full(40, 100.0)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 1)
            pm.Normal("y", mu, 1.0, observed=y)
            pp = pm.sample_prior_predictive(draws=400, random_seed=1)
        mu_draws = pp.prior["mu"].values
        assert abs(mu_draws.mean()) < 0.2  # prior, not posterior
        assert abs(pp.prior_predictive["y"].values.mean()) < 0.5

    def test_layers(self):
        # reference test_layers: chained uniform * bernoulli-like structure
        with pm.Model():
            a = pm.Uniform("a", lower=0, upper=1, size=10)
            b = pm.Binomial("b", n=1, p=a, size=10)
            pp = pm.sample_prior_predictive(draws=1000, random_seed=2)
        bm = pp.prior["b"].values.mean()
        assert abs(bm - 0.5) < 0.05  # E[p]=0.5

    def test_transformed_support(self):
        # bounded variables are returned on the CONSTRAINED space
        with pm.Model():
            p = pm.Beta("p", 2.0, 2.0)
            u = pm.Uniform("u", lower=-2.0, upper=-1.0)
            pp = pm.sample_prior_predictive(draws=300, random_seed=3)
        assert ((pp.prior["p"].values > 0) & (pp.prior["p"].values < 1)).all()
        uv = pp.prior["u"].values
        assert ((uv > -2) & (uv < -1)).all()

    def test_respects_shape(self):
        with pm.Model():
            pm.GaussianRandomWalk("grw", sigma=1.0, steps=9, shape=(2, 10))
            pp = pm.sample_prior_predictive(draws=5, random_seed=4)
        assert pp.prior["grw"].values.shape == (1, 5, 2, 10)

    def test_custom_dist_random(self):
        # reference test_density_dist: CustomDist with a random fn
        def rand(mu, rng, size):
            import jax
            return mu + jax.random.normal(rng, size)

        with pm.Model():
            mu = pm.Normal("mu", 5.0, 0.01)
            pm.CustomDist("y", mu, logp=lambda v, mu: -0.5 * (v - mu) ** 2,
                          random=rand, shape=(3,))
            pp = pm.sample_prior_predictive(draws=500, random_seed=5)
        # unobserved CustomDist lands in the prior group (reference
        # test_zeroinflatedpoisson asserts gen_data.prior["suppliers"])
        grp = pp.prior if "y" in pp.prior else pp.prior_predictive
        assert grp["y"].values.shape == (1, 500, 3)
        assert abs(grp["y"].values.mean() - 5.0) < 0.1

    def test_zero_inflated_poisson(self):
        # reference test_zeroinflatedpoisson
        with pm.Model():
            theta = pm.Beta("theta", 1, 1)
            psi = pm.HalfNormal("psi", 0.5)
            pm.ZeroInflatedPoisson("suppliers", psi=psi, mu=theta * 10,
                                   size=20)
            pp = pm.sample_prior_predictive(draws=50, random_seed=6)
        # reference forward.py:1327: unobserved RV in the prior group
        assert pp.prior["suppliers"].values.shape == (1, 50, 20)

    def test_var_names_subset(self):
        with pm.Model():
            mu = pm.Normal("mu", 0, 1)
            pm.Normal("y", mu, 1, observed=np.zeros(3))
            pp = pm.sample_prior_predictive(draws=10, var_names=["mu"],
                                            random_seed=7)
        assert "mu" in pp.prior
        assert not hasattr(pp, "prior_predictive") or \
            "y" not in getattr(pp, "prior_predictive", {})


class TestPosteriorPredictiveContract:
    def test_deterministic_of_observed(self, linear_trace):
        # reference test_deterministic_of_observed: a det downstream of the
        # (resampled) observed RV must be recomputed from the NEW draws
        m, idata, x, y = linear_trace
        with pm.Model() as m2:
            xd = pm.Data("x", x)
            b = pm.Normal("b", 0, 5)
            sd = pm.HalfNormal("sd", 1.0)
            yy = pm.Normal("y", b * xd, sd, observed=y, shape=xd.shape)
            pm.Deterministic("resid", yy - b * xd)
            ppc = pm.sample_posterior_predictive(
                idata, var_names=["y", "resid"], random_seed=1,
                progressbar=False)
        yv = ppc.posterior_predictive["y"].values
        rv = ppc.posterior_predictive["resid"].values
        bv = idata.posterior["b"].values[..., None]
        np.testing.assert_allclose(rv, yv - bv * x, rtol=1e-5)
        # residuals of FRESH draws: sd-scaled noise, uncorrelated with x
        assert abs(np.corrcoef(rv.reshape(-1, 50).mean(0), x)[0, 1]) < 0.5

    def test_shared_variable_predictions(self, linear_trace):
        # reference test_model_shared_variable: swap data, predict out of
        # sample; mu must use the new x with the traced b
        m, idata, x, y = linear_trace
        x_new = np.array([10.0, -10.0, 0.0])
        with m:
            pm.set_data({"x": x_new})
            ppc = pm.sample_posterior_predictive(
                idata, var_names=["y", "mu"], random_seed=2,
                progressbar=False)
        mu = ppc.posterior_predictive["mu"].values
        b = idata.posterior["b"].values
        np.testing.assert_allclose(mu, b[..., None] * x_new, rtol=1e-5)
        yv = ppc.posterior_predictive["y"].values
        assert yv.shape == b.shape + (3,)
        # predictions at x=10 center near 2*10
        assert abs(yv[..., 0].mean() - 20.0) < 1.0

    def test_sum_normal(self):
        # reference test_sum_normal: ppc of the observed node given traced
        # parents has the implied conditional distribution
        with pm.Model() as m:
            a = pm.Normal("a", sigma=0.2)
            pm.Normal("b", mu=a, observed=np.zeros(100))
            idata = pm.sample(draws=300, tune=200, chains=2, random_seed=0,
                              progressbar=False,
                              compute_convergence_checks=False)
            ppc = pm.sample_posterior_predictive(
                idata, var_names=["b"], random_seed=3, progressbar=False)
        # b resampled given traced a ~= 0: unit-sd fresh noise
        bv = ppc.posterior_predictive["b"].values
        assert abs(bv.std() - 1.0) < 0.1
        assert abs(bv.mean()) < 0.1

    def test_unknown_var_name_raises(self, linear_trace):
        m, idata, *_ = linear_trace
        with m:
            with pytest.raises(KeyError, match="nope"):
                pm.sample_posterior_predictive(idata, var_names=["nope"],
                                               progressbar=False)

    def test_reproducible_across_calls(self, linear_trace):
        m, idata, *_ = linear_trace
        with m:
            p1 = pm.sample_posterior_predictive(idata, random_seed=42,
                                                progressbar=False)
            p2 = pm.sample_posterior_predictive(idata, random_seed=42,
                                                progressbar=False)
        np.testing.assert_array_equal(
            p1.posterior_predictive["y"].values,
            p2.posterior_predictive["y"].values)

    def test_free_rv_not_in_trace_resampled(self, linear_trace):
        # reference test_var_names_not_in_trace_is_sampled: an RV added to
        # the model after sampling is drawn fresh per posterior sample
        m, idata, x, y = linear_trace
        with pm.Model() as m2:
            xd = pm.Data("x", x)
            b = pm.Normal("b", 0, 5)
            sd = pm.HalfNormal("sd", 1.0)
            extra = pm.Normal("extra", 0, 1)  # not in trace
            pm.Normal("y", b * xd + 0.0 * extra, sd, observed=y,
                      shape=xd.shape)
            ppc = pm.sample_posterior_predictive(
                idata, var_names=["y", "extra"], random_seed=4,
                progressbar=False)
        ev = ppc.posterior_predictive["extra"].values
        assert ev.std() > 0.8  # fresh standard-normal draws
        assert len(np.unique(np.round(ev, 6))) > ev.size * 0.9

    def test_predictions_group(self, linear_trace):
        m, idata, x, y = linear_trace
        with m:
            pm.set_data({"x": np.array([1.0, 2.0])})
            pred = pm.sample_posterior_predictive(
                idata, predictions=True, random_seed=5, progressbar=False)
        assert hasattr(pred, "predictions")
        assert pred.predictions["y"].values.shape[-1] == 2

    def test_extend_inferencedata(self, linear_trace):
        m, idata, *_ = linear_trace
        with m:
            out = pm.sample_posterior_predictive(
                idata, extend_inferencedata=True, random_seed=6,
                progressbar=False)
        assert hasattr(idata, "posterior_predictive")


class TestMultivariateForward:
    def test_lkj_cholesky_cov_ppc(self):
        # reference test_lkj_cholesky_cov: forward draws through an LKJ
        # covariance factor reproduce the traced correlation structure
        rng = np.random.default_rng(1)
        data = rng.multivariate_normal([0, 0], [[1.0, 0.8], [0.8, 1.0]],
                                       size=300)
        with pm.Model() as m:
            chol, corr, stds = pm.LKJCholeskyCov(
                "c", n=2, eta=2.0, sd_dist=pm.Exponential.dist(1.0),
                compute_corr=True)
            pm.MvNormal("y", mu=np.zeros(2), chol=chol, observed=data)
            idata = pm.sample(draws=200, tune=200, chains=2, random_seed=0,
                              progressbar=False,
                              compute_convergence_checks=False)
            ppc = pm.sample_posterior_predictive(idata, random_seed=1,
                                                 progressbar=False)
        yv = ppc.posterior_predictive["y"].values.reshape(-1, 2)
        r = np.corrcoef(yv.T)[0, 1]
        assert abs(r - 0.8) < 0.1

    def test_mixture_ppc_statistics(self):
        rng = np.random.default_rng(2)
        comp = rng.choice(2, size=400)
        data = np.where(comp, rng.normal(4, 0.5, 400),
                        rng.normal(-4, 0.5, 400))
        with pm.Model() as m:
            w = pm.Dirichlet("w", np.ones(2))
            mu = pm.Normal("mu", [-4, 4], 2.0, shape=2,
                           transform=pm.distributions.transforms.ordered)
            pm.NormalMixture("y", w, mu, sigma=0.5, observed=data)
            idata = pm.sample(draws=150, tune=300, chains=2, random_seed=0,
                              progressbar=False,
                              compute_convergence_checks=False)
            ppc = pm.sample_posterior_predictive(idata, random_seed=2,
                                                 progressbar=False)
        yv = ppc.posterior_predictive["y"].values
        # bimodal: both modes populated in predictive draws
        assert (yv > 2).mean() > 0.25
        assert (yv < -2).mean() > 0.25
