"""SMC tests.

Mirrors the scope of reference tests/smc/test_smc.py (328 LoC): posterior
accuracy on the bimodal two-Gaussians benchmark, marginal-likelihood
correctness (conjugate evidence + Beta-Bernoulli Bayes factor), MH-kernel
posterior recovery, correlation-threshold mutation tuning behavior,
systematic-resampling unit semantics, high-dimensional targets, and the
particle-sharded mesh path.
"""

import numpy as np
import pytest
import scipy.stats as st

import jax
import jax.numpy as jnp

import pymc_tpu as pm


@pytest.fixture(scope="module")
def conjugate_result():
    rng = np.random.default_rng(0)
    y = rng.normal(1.0, 1.0, 30)
    with pm.Model() as m:
        mu = pm.Normal("mu", 0, 1)
        pm.Normal("y", mu, 1, observed=y)
    idata = pm.sample_smc(draws=1500, chains=2, model=m, random_seed=1,
                          progressbar=False, compute_convergence_checks=False)
    return y, idata


class TestSMC:
    def test_posterior_accuracy(self, conjugate_result):
        y, idata = conjugate_result
        n = len(y)
        post = idata.posterior["mu"].values
        np.testing.assert_allclose(post.mean(), n * y.mean() / (n + 1), atol=0.05)
        np.testing.assert_allclose(post.std(), np.sqrt(1 / (n + 1)), atol=0.03)

    def test_marginal_likelihood(self, conjugate_result):
        y, idata = conjugate_result
        n = len(y)
        cov = np.eye(n) + np.ones((n, n))
        exact = st.multivariate_normal.logpdf(y, np.zeros(n), cov)
        lml = np.asarray(idata.posterior.attrs["log_marginal_likelihood"])
        np.testing.assert_allclose(lml, exact, atol=0.5)

    def test_beta_reaches_one(self, conjugate_result):
        _, idata = conjugate_result
        assert np.all(idata.sample_stats["beta"].values >= 1.0)

    def test_two_gaussians_bimodal(self):
        # reference tests/smc/test_smc.py:37-89 — the headline SMC benchmark:
        # a 4-D mixture of two narrow Gaussians at ±0.5 under a Uniform prior
        n = 4
        mu1 = np.full(n, 0.5)
        stdev = 0.1
        w1, w2 = stdev, 1 - stdev

        def two_gaussians(x):
            log1 = (
                -0.5 * n * np.log(2 * np.pi)
                - n * np.log(stdev)
                - 0.5 * pm.math.sum(((x - mu1) / stdev) ** 2)
            )
            log2 = (
                -0.5 * n * np.log(2 * np.pi)
                - n * np.log(stdev)
                - 0.5 * pm.math.sum(((x + mu1) / stdev) ** 2)
            )
            return pm.math.logsumexp(
                pm.math.stack([np.log(w1) + log1, np.log(w2) + log2])
            )

        with pm.Model() as m:
            X = pm.Uniform("X", lower=-2.0, upper=2.0, shape=(n,))
            pm.Potential("muh", two_gaussians(X))
        idata = pm.sample_smc(draws=1000, chains=2, model=m, random_seed=11,
                              progressbar=False,
                              compute_convergence_checks=False)
        x = idata.posterior["X"].values.reshape(-1, n)
        mu1d = np.abs(x).mean(axis=0)
        np.testing.assert_allclose(mu1d, mu1, rtol=0.0, atol=0.03)
        # the dominant mode (weight 0.9) is at -0.5
        assert (x[:, 0] < 0).mean() > 0.6

    def test_marginal_likelihood_bayes_factor(self):
        # reference tests/smc/test_smc.py:151-171 — Beta-Bernoulli evidence
        # ratio between a flat and a concentrated prior is analytically 4
        data = np.repeat([1, 0], [50, 50])
        marginals = []
        for alpha, beta in ((1.0, 1.0), (20.0, 20.0)):
            with pm.Model() as model:
                a = pm.Beta("a", alpha, beta)
                pm.Bernoulli("y", a, observed=data)
            idata = pm.sample_smc(draws=2000, chains=2, model=model,
                                  random_seed=13, progressbar=False,
                                  compute_convergence_checks=False)
            lml = np.mean(idata.posterior.attrs["log_marginal_likelihood"])
            marginals.append(lml)
        assert abs(np.exp(marginals[1] - marginals[0]) - 4.0) <= 1

    def test_return_posterior_dict(self):
        with pm.Model() as m:
            x = pm.Normal("x", 0, 1)
            pm.Normal("y", x, 1, observed=0.0)
        post = pm.sample_smc(draws=50, chains=2, model=m, random_seed=5,
                             progressbar=False,
                             compute_convergence_checks=False,
                             return_inferencedata=False)
        assert isinstance(post, dict)
        assert post["x"].shape == (2, 50)

    def test_multimodal_mixture(self):
        # SMC's signature capability: multimodal targets via tempering
        with pm.Model() as m:
            x = pm.Normal("x", 0, 1, shape=(2,))
            pm.Potential(
                "bimodal",
                pm.math.logsumexp(
                    -0.5 * ((x[0:1] - np.array([-3.0, 3.0])) / 0.5) ** 2
                ),
            )
        idata = pm.sample_smc(draws=2000, chains=2, model=m, random_seed=4,
                              progressbar=False,
                              compute_convergence_checks=False)
        draws = idata.posterior["x"].values[..., 0].ravel()
        # both modes populated
        assert (draws < -1).mean() > 0.15
        assert (draws > 1).mean() > 0.15


class TestTuning:
    """Correlation-threshold mutation tuning (reference kernels.py:486-525)."""

    def _fit(self, **kwargs):
        rng = np.random.default_rng(7)
        y = rng.normal(0.3, 1.0, 40)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 1)
            sigma = pm.HalfNormal("sigma", 1)
            pm.Normal("y", mu, sigma, observed=y)
        return pm.sample_smc(draws=400, chains=1, model=m, random_seed=8,
                             progressbar=False,
                             compute_convergence_checks=False, **kwargs)

    def test_auto_steps_recorded_and_adaptive(self):
        idata = self._fit()
        hist = np.asarray(idata.posterior.attrs["n_steps_history"])
        assert hist.shape[0] >= 2          # several stages ran
        assert np.all(hist >= 1)
        # the decorrelation rule always runs at least 2 sweeps (old_corr
        # starts at 2, so the first comparison always continues)
        assert np.all(hist[hist > 0] >= 2)
        assert idata.sample_stats["n_steps"].values.min() >= 1

    def test_correlation_threshold_controls_steps(self):
        loose = self._fit(correlation_threshold=0.5)
        tight = self._fit(correlation_threshold=0.001)
        n_loose = np.asarray(loose.posterior.attrs["n_steps_history"]).sum()
        n_tight = np.asarray(tight.posterior.attrs["n_steps_history"]).sum()
        assert n_tight >= n_loose
        assert tight.posterior.attrs["correlation_threshold"] == 0.001

    def test_fixed_n_steps_respected(self):
        idata = self._fit(n_steps=7)
        hist = np.asarray(idata.posterior.attrs["n_steps_history"])
        assert np.all(hist[hist > 0] == 7)

    def test_invalid_correlation_threshold(self):
        with pytest.raises(ValueError, match="correlation_threshold"):
            pm.smc.IMH(correlation_threshold=1.5)
        with pytest.raises(ValueError, match="correlation_threshold"):
            pm.smc.MH(correlation_threshold=-0.1)

    def test_mh_kernel_tunes(self):
        idata = self._fit(kernel="mh")
        acc = np.asarray(idata.posterior.attrs["accept_rate_history"])
        # acceptance stays in a sane band once scales adapt
        assert 0.05 < acc[-1] < 0.95
        hist = np.asarray(idata.posterior.attrs["n_steps_history"])
        assert np.all(hist[hist > 0] >= 2)


class TestMHKernel:
    def test_normal_model(self):
        # reference tests/smc/test_smc.py:275-288
        data = st.norm(10, 0.5).rvs(
            1000, random_state=np.random.RandomState(20160911)
        )
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 3)
            sigma = pm.HalfNormal("sigma", 1)
            pm.Normal("y", mu, sigma, observed=data)
        idata = pm.sample_smc(draws=1000, chains=2, kernel="mh", model=m,
                              random_seed=17, progressbar=False,
                              compute_convergence_checks=False)
        post = idata.posterior
        assert np.abs(post["mu"].values.mean() - 10) < 0.1
        assert np.abs(post["sigma"].values.mean() - 0.5) < 0.05

    def test_imh_and_mh_agree(self):
        rng = np.random.default_rng(23)
        y = rng.normal(-0.7, 1.0, 60)
        n = len(y)
        exact_mean = n * y.mean() / (n + 1)
        for kern in ("imh", "mh"):
            with pm.Model() as m:
                mu = pm.Normal("mu", 0, 1)
                pm.Normal("y", mu, 1, observed=y)
            idata = pm.sample_smc(draws=1000, chains=2, kernel=kern, model=m,
                                  random_seed=19, progressbar=False,
                                  compute_convergence_checks=False)
            np.testing.assert_allclose(
                idata.posterior["mu"].values.mean(), exact_mean, atol=0.06
            )


class TestHighDim:
    def test_conjugate_d20(self):
        # 20 independent conjugate normals: per-dimension posterior known
        D = 20
        rng = np.random.default_rng(31)
        y = rng.normal(0.5, 1.0, (8, D))
        n = y.shape[0]
        with pm.Model() as m:
            theta = pm.Normal("theta", 0, 1, shape=(D,))
            pm.Normal("y", theta, 1, observed=y)
        idata = pm.sample_smc(draws=1500, chains=2, model=m, random_seed=37,
                              progressbar=False,
                              compute_convergence_checks=False)
        post = idata.posterior["theta"].values.reshape(-1, D)
        exact_mean = n * y.mean(axis=0) / (n + 1)
        exact_sd = np.sqrt(1.0 / (n + 1))
        np.testing.assert_allclose(post.mean(axis=0), exact_mean, atol=0.12)
        np.testing.assert_allclose(post.std(axis=0), exact_sd, atol=0.08)


class TestShardedSMC:
    """Particle-axis mesh sharding (SURVEY §2.11 TPU mapping)."""

    def _model(self):
        rng = np.random.default_rng(41)
        y = rng.normal(1.0, 1.0, 30)
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 1)
            pm.Normal("y", mu, 1, observed=y)
        return y, m

    def test_sharded_runs_and_matches_moments(self):
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from jax.sharding import Mesh

        y, m = self._model()
        n = len(y)
        mesh = Mesh(np.array(jax.devices()[:8]), ("particles",))
        idata = pm.sample_smc(draws=1024, chains=2, model=m, random_seed=43,
                              progressbar=False, mesh=mesh,
                              compute_convergence_checks=False)
        assert np.all(idata.sample_stats["beta"].values >= 1.0)
        post = idata.posterior["mu"].values
        np.testing.assert_allclose(post.mean(), n * y.mean() / (n + 1),
                                   atol=0.05)
        np.testing.assert_allclose(post.std(), np.sqrt(1 / (n + 1)),
                                   atol=0.03)
        # evidence still correct under the sharded reductions
        cov = np.eye(n) + np.ones((n, n))
        exact = st.multivariate_normal.logpdf(y, np.zeros(n), cov)
        lml = np.asarray(idata.posterior.attrs["log_marginal_likelihood"])
        np.testing.assert_allclose(lml, exact, atol=0.5)

    def test_chains_by_particles_mesh(self):
        if jax.device_count() < 8:
            pytest.skip("needs 8 virtual devices")
        from jax.sharding import Mesh

        y, m = self._model()
        mesh = Mesh(
            np.array(jax.devices()[:8]).reshape(2, 4), ("chains", "particles")
        )
        idata = pm.sample_smc(draws=512, chains=2, model=m, random_seed=47,
                              progressbar=False, mesh=mesh,
                              compute_convergence_checks=False)
        assert np.all(idata.sample_stats["beta"].values >= 1.0)
        post = idata.posterior["mu"].values
        n = len(y)
        np.testing.assert_allclose(post.mean(), n * y.mean() / (n + 1),
                                   atol=0.06)


def test_systematic_resampling_unit():
    # reference tests/smc/test_smc.py:304-309 semantics: equal weights keep
    # all indices; a dominant weight duplicates it
    from pymc_tpu.smc.kernels import _systematic_resample

    key = jax.random.PRNGKey(0)
    lw = jnp.log(jnp.array([1 / 3, 1 / 3, 1 / 3]))
    idx_src = jnp.arange(3)
    out = _systematic_resample(key, lw, idx_src)
    np.testing.assert_array_equal(np.asarray(out), [0, 1, 2])

    lw = jnp.log(jnp.array([0.99, 0.01]))
    out = _systematic_resample(jax.random.PRNGKey(1), lw, jnp.arange(2))
    np.testing.assert_array_equal(np.asarray(out), [0, 0])


class TestDiscreteLatents:
    """SMC over discrete free variables via rounded lattice proposals
    (reference smc/kernels.py value rounding; tests/smc/test_smc.py:91-135)."""

    def test_rounding_semantics(self):
        # particles are continuous; the density sees round(q): -0.49 -> 0,
        # 0.51 -> 1, -0.51 -> -1 (outside support => -inf)
        import scipy.stats as st
        with pm.Model() as m:
            pm.Bernoulli("z", p=0.7)
        info = m.raveled_info(vars=m.free_RVs)
        from pymc_tpu.blocking import unravel_vector
        logp = m.logp_fn()

        def rounded_logp(qv):
            q = jnp.where(jnp.array([True]), jnp.round(jnp.array([qv])),
                          jnp.array([qv]))
            return float(logp(unravel_vector(q, info)))

        assert rounded_logp(-0.51) == -np.inf
        np.testing.assert_allclose(rounded_logp(-0.49), np.log(0.3))
        np.testing.assert_allclose(rounded_logp(0.49), np.log(0.3))
        np.testing.assert_allclose(rounded_logp(0.51), np.log(0.7))
        assert rounded_logp(1.51) == -np.inf

    def test_unobserved_bernoulli(self):
        # reference test_unobserved_bernoulli: mixture-assignment recovery
        import scipy.stats as st
        n = 10
        rng = np.random.RandomState(20160911)
        z_true = np.zeros(n, dtype=int)
        z_true[n // 2:] = 1
        y = st.norm(np.array([-1, 1])[z_true], 0.25).rvs(random_state=rng)
        with pm.Model() as m:
            z = pm.Bernoulli("z", p=0.5, size=n)
            mu = pm.math.switch(z, 1.0, -1.0)
            pm.Normal("like", mu=mu, sigma=0.25, observed=y)
            post = pm.sample_smc(chains=1, draws=800, progressbar=False,
                                 return_inferencedata=False, random_seed=1)
        zmed = np.median(post["z"].reshape(-1, n), axis=0)
        np.testing.assert_array_equal(zmed, z_true)
        assert post["z"].dtype.kind == "i"

    def test_unobserved_categorical(self):
        # reference test_unobserved_categorical
        with pm.Model() as m:
            mu = pm.Categorical("mu", p=[0.1, 0.3, 0.6], size=2)
            pm.Normal("like", mu=mu, sigma=0.1, observed=[1, 2])
            post = pm.sample_smc(chains=1, draws=800, progressbar=False,
                                 return_inferencedata=False, random_seed=2)
        mmed = np.median(post["mu"].reshape(-1, 2), axis=0)
        np.testing.assert_array_equal(mmed, [1, 2])

    def test_mixed_discrete_continuous(self):
        # joint discrete + continuous free vars: both recovered
        import scipy.stats as st
        rng = np.random.default_rng(5)
        z_true = np.array([0, 0, 1, 1, 1, 0, 1, 0])
        shift = 2.0
        y = rng.normal(z_true * shift, 0.3)
        with pm.Model() as m:
            z = pm.Bernoulli("z", p=0.5, size=8)
            delta = pm.Normal("delta", 0, 5)
            pm.Normal("like", mu=z * delta, sigma=0.3, observed=y)
            idata = pm.sample_smc(chains=2, draws=600, progressbar=False,
                                  random_seed=3)
        zmed = np.median(
            idata.posterior["z"].values.reshape(-1, 8), axis=0)
        np.testing.assert_array_equal(zmed, z_true)
        assert abs(idata.posterior["delta"].values.mean() - shift) < 0.3


class TestStartAndReport:
    """Reference tests/smc/test_smc.py:173-218 (start= population seeding and
    kernel-kwargs report fields)."""

    def test_start_population(self):
        with pm.Model():
            a = pm.Poisson("a", 5)
            b = pm.HalfNormal("b", 10)
            pm.Normal("y", a, b, observed=[1, 2, 3, 4])
            start = {
                "a": np.random.default_rng(0).poisson(5, size=300),
                "b_log__": np.abs(
                    np.random.default_rng(1).normal(0, 10, size=300)
                ),
            }
            idata = pm.sample_smc(
                300, chains=1, start=start, progressbar=False,
                compute_convergence_checks=False, random_seed=1,
            )
        assert idata.posterior["a"].shape == (1, 300)

    def test_start_rv_name_applies_transform(self):
        # rv-name keys are constrained-space: the forward transform maps
        # them into the particle (value) space
        with pm.Model():
            b = pm.HalfNormal("b", 10)
            pm.Normal("y", 0, b, observed=[1.0, 2.0, 3.0])
            idata = pm.sample_smc(
                200, chains=2, progressbar=False, random_seed=2,
                compute_convergence_checks=False,
                start={"b": np.abs(np.random.default_rng(2).normal(1, 2, 200))},
            )
        assert np.isfinite(idata.posterior["b"].values).all()
        assert (idata.posterior["b"].values > 0).all()

    def test_start_wrong_length_rejected(self):
        with pm.Model():
            pm.Normal("x", 0, 1)
            pm.Normal("y", 0, 1, observed=[0.5])
            with pytest.raises(ValueError, match="list of"):
                pm.sample_smc(100, chains=3, start=[{}, {}],
                              progressbar=False, random_seed=0)

    def test_report_fields(self):
        # reference test_kernel_kwargs: threshold / n_draws /
        # correlation_threshold land in the result metadata
        with pm.Model():
            pm.Normal("x", 0, 1)
            pm.Normal("y", 0, 1, observed=[0.1, -0.2])
            idata = pm.sample_smc(
                100, chains=1, threshold=0.7, correlation_threshold=0.02,
                progressbar=False, compute_convergence_checks=False,
                random_seed=3,
            )
        attrs = idata.posterior.attrs
        assert attrs["threshold"] == 0.7
        assert attrs["n_draws"] == 100
        assert attrs["correlation_threshold"] == 0.02
