"""Timeseries distribution battery.

Mirrors reference tests/distributions/test_timeseries.py: logp oracles
built from explicit conditional-normal sums, steps/shape inference contracts,
forward-sampling moment checks, batched-parameter consistency, and a GRW
posterior-recovery inference test.
"""

import numpy as np
import jax
import pytest
import scipy.stats as st

import pymc_tpu as pm

KEY = jax.random.PRNGKey


def np_logp(d, value):
    return np.asarray(d.logp(np.asarray(value)))


# ---------------------------------------------------------------- RandomWalk


class TestRandomWalk:
    def test_requires_distribution_innovation(self):
        with pytest.raises(ValueError, match="innovation_dist"):
            pm.RandomWalk.dist(innovation_dist=1.0, steps=5)

    def test_requires_init_dist(self):
        # reference RandomWalk.dist raises TypeError without an init dist
        with pytest.raises(TypeError, match="init_dist"):
            pm.RandomWalk.dist(innovation_dist=pm.Normal.dist(), steps=5)
        with pytest.raises(TypeError, match="init_dist"):
            pm.RandomWalk.dist(
                innovation_dist=pm.Normal.dist(), init_dist=3.0, steps=5
            )

    def test_mismatched_support_ndim_raises(self):
        # reference: init/innovation must share support dimensionality
        with pytest.raises(TypeError, match="support"):
            pm.RandomWalk.dist(
                innovation_dist=pm.MvNormal.dist(mu=np.zeros(2), cov=np.eye(2)),
                init_dist=pm.Normal.dist(),
                steps=5,
            )

    def test_logp_univariate_oracle(self):
        d = pm.RandomWalk.dist(
            innovation_dist=pm.Normal.dist(0.5, 2.0),
            init_dist=pm.Normal.dist(-1.0, 3.0),
            steps=4,
        )
        x = np.array([0.3, 1.1, -0.2, 2.0, 2.5])
        expected = st.norm.logpdf(x[0], -1.0, 3.0) + st.norm.logpdf(
            np.diff(x), 0.5, 2.0
        ).sum()
        np.testing.assert_allclose(np_logp(d, x), expected, rtol=1e-10)

    def test_logp_nonnormal_innovations(self):
        d = pm.RandomWalk.dist(
            innovation_dist=pm.StudentT.dist(nu=4, mu=0.0, sigma=1.5),
            init_dist=pm.Normal.dist(0.0, 1.0),
            steps=3,
        )
        x = np.array([0.1, 0.6, 0.2, -0.5])
        expected = st.norm.logpdf(x[0]) + st.t.logpdf(
            np.diff(x), 4, 0.0, 1.5
        ).sum()
        np.testing.assert_allclose(np_logp(d, x), expected, rtol=1e-9)

    def test_logp_multivariate_oracle(self):
        cov = np.array([[1.0, 0.3], [0.3, 2.0]])
        icov = np.array([[0.5, 0.0], [0.0, 0.5]])
        d = pm.RandomWalk.dist(
            innovation_dist=pm.MvNormal.dist(mu=np.zeros(2), cov=cov),
            init_dist=pm.MvNormal.dist(mu=np.ones(2), cov=icov),
            steps=3,
        )
        rng = np.random.default_rng(1)
        x = rng.normal(size=(4, 2))
        expected = st.multivariate_normal.logpdf(x[0], np.ones(2), icov)
        expected += st.multivariate_normal.logpdf(
            np.diff(x, axis=0), np.zeros(2), cov
        ).sum()
        np.testing.assert_allclose(np_logp(d, x), expected, rtol=1e-9)

    def test_logp_batched_matches_loop(self):
        d = pm.RandomWalk.dist(
            innovation_dist=pm.Normal.dist(0.0, 1.0),
            init_dist=pm.Normal.dist(0.0, 1.0),
            steps=4,
            shape=(3, 5),
        )
        rng = np.random.default_rng(2)
        x = rng.normal(size=(3, 5))
        single = pm.RandomWalk.dist(
            innovation_dist=pm.Normal.dist(0.0, 1.0),
            init_dist=pm.Normal.dist(0.0, 1.0),
            steps=4,
        )
        got = np_logp(d, x)
        assert got.shape == (3,)
        np.testing.assert_allclose(
            got, [np_logp(single, row) for row in x], rtol=1e-10
        )

    def test_steps_inferred_from_shape(self):
        d = pm.RandomWalk.dist(
            innovation_dist=pm.Normal.dist(),
            init_dist=pm.Normal.dist(),
            shape=(7,),
        )
        assert d.steps == 6
        assert d.sample(KEY(0)).shape == (7,)

    def test_steps_inferred_multivariate(self):
        d = pm.RandomWalk.dist(
            innovation_dist=pm.MvNormal.dist(mu=np.zeros(3), cov=np.eye(3)),
            init_dist=pm.MvNormal.dist(mu=np.zeros(3), cov=np.eye(3)),
            shape=(5, 3),
        )
        assert d.steps == 4
        assert d.sample(KEY(0)).shape == (5, 3)

    def test_inconsistent_steps_and_shape_raises(self):
        with pytest.raises(ValueError, match="Inconsistent steps"):
            pm.RandomWalk.dist(
                innovation_dist=pm.Normal.dist(),
                init_dist=pm.Normal.dist(),
                steps=3,
                shape=(7,),
            )

    def test_missing_steps_and_shape_raises(self):
        with pytest.raises(ValueError, match="steps"):
            pm.RandomWalk.dist(
                innovation_dist=pm.Normal.dist(), init_dist=pm.Normal.dist()
            )

    def test_sample_moments(self):
        # x_t = x_0 + sum of t innovations: mean mu0 + t*mu, var s0^2 + t*s^2
        d = pm.RandomWalk.dist(
            innovation_dist=pm.Normal.dist(0.7, 0.5),
            init_dist=pm.Normal.dist(2.0, 1.0),
            steps=6,
            size=(40_000,),
        )
        draws = np.asarray(d.sample(KEY(3)))
        t = np.arange(7)
        np.testing.assert_allclose(draws.mean(0), 2.0 + 0.7 * t, atol=0.03)
        np.testing.assert_allclose(
            draws.var(0), 1.0 + 0.25 * t, rtol=0.05
        )

    def test_batched_innovation_params(self):
        # vector mu = one walk per drift: sample/logp/support_point must all
        # lift the innovation batch left of the time axis
        mus = np.array([0.0, 1.0, 2.0])
        d = pm.RandomWalk.dist(
            innovation_dist=pm.Normal.dist(mus, 1.0),
            init_dist=pm.Normal.dist(0.0, 1.0),
            steps=4,
        )
        assert d.shape == (3, 5)
        draws = np.asarray(d.sample(KEY(21), (4_000,)))
        np.testing.assert_allclose(
            draws[:, :, -1].mean(0), 4 * mus, atol=0.15
        )
        x = np.random.default_rng(22).normal(size=(3, 5))
        got = np_logp(d, x)
        expected = [
            st.norm.logpdf(x[i, 0], 0, 1)
            + st.norm.logpdf(np.diff(x[i]), mus[i], 1).sum()
            for i in range(3)
        ]
        np.testing.assert_allclose(got, expected, rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(d.support_point()),
            np.arange(5)[None, :] * mus[:, None],
        )

    def test_batched_multivariate_innovation(self):
        cov = np.array([[1.0, 0.2], [0.2, 1.0]])
        mus = np.array([[0.0, 0.0], [1.0, -1.0]])
        d = pm.MvGaussianRandomWalk.dist(
            mu=mus, cov=cov, steps=3,
            init_dist=pm.MvNormal.dist(mu=np.zeros(2), cov=np.eye(2)),
        )
        assert d.shape == (2, 4, 2)
        assert d.sample(KEY(23)).shape == (2, 4, 2)
        x = np.random.default_rng(24).normal(size=(2, 4, 2))
        got = np_logp(d, x)
        for i in range(2):
            expected = st.multivariate_normal.logpdf(
                x[i, 0], np.zeros(2), np.eye(2)
            ) + st.multivariate_normal.logpdf(
                np.diff(x[i], axis=0), mus[i], cov
            ).sum()
            np.testing.assert_allclose(got[i], expected, rtol=1e-9)

    def test_support_point_is_cumsum(self):
        d = pm.RandomWalk.dist(
            innovation_dist=pm.Normal.dist(2.0, 1.0),
            init_dist=pm.Normal.dist(-3.0, 1.0),
            steps=3,
        )
        np.testing.assert_allclose(
            np.asarray(d.support_point()), [-3.0, -1.0, 1.0, 3.0]
        )


class TestPredefinedRandomWalk:
    def test_gaussian_warns_default_init(self):
        with pytest.warns(UserWarning, match="Initial distribution"):
            pm.GaussianRandomWalk.dist(mu=0.0, sigma=1.0, steps=3)

    @pytest.mark.parametrize(
        "make",
        [
            lambda: pm.MvGaussianRandomWalk.dist(
                mu=np.zeros(2), cov=np.eye(2), steps=3
            ),
            lambda: pm.MvStudentTRandomWalk.dist(
                nu=5, mu=np.zeros(2), scale=np.eye(2), steps=3
            ),
            lambda: pm.AR.dist(rho=[0.5], sigma=1.0, steps=3),
            lambda: pm.EulerMaruyama.dist(
                dt=0.1, sde_fn=_ou_sde, sde_pars=(1.0, 1.0), steps=3
            ),
        ],
        ids=["MvGRW", "MvStudentTRW", "AR", "EulerMaruyama"],
    )
    def test_default_init_warns(self, make):
        # every timeseries family warns on an unspecified init distribution
        with pytest.warns(UserWarning, match="Initial distribution"):
            make()

    def test_gaussian_logp(self):
        d = pm.GaussianRandomWalk.dist(
            mu=1.0, sigma=0.7, steps=4, init_dist=pm.Normal.dist(0.0, 2.0)
        )
        x = np.array([0.5, 1.2, 2.8, 3.1, 4.4])
        expected = st.norm.logpdf(x[0], 0.0, 2.0) + st.norm.logpdf(
            np.diff(x), 1.0, 0.7
        ).sum()
        np.testing.assert_allclose(np_logp(d, x), expected, rtol=1e-10)

    def test_mvgaussian_logp_and_cov_growth(self):
        cov = np.array([[2.0, 0.5, 0.0], [0.5, 1.0, 0.2], [0.0, 0.2, 1.5]])
        d = pm.MvGaussianRandomWalk.dist(
            mu=np.zeros(3),
            cov=cov,
            steps=3,
            init_dist=pm.MvNormal.dist(mu=np.zeros(3), cov=np.eye(3)),
        )
        rng = np.random.default_rng(4)
        x = rng.normal(size=(4, 3))
        expected = st.multivariate_normal.logpdf(x[0], np.zeros(3), np.eye(3))
        expected += st.multivariate_normal.logpdf(
            np.diff(x, axis=0), np.zeros(3), cov
        ).sum()
        np.testing.assert_allclose(np_logp(d, x), expected, rtol=1e-9)
        # forward: cov(x_t) = I + t*cov
        db = pm.MvGaussianRandomWalk.dist(
            mu=np.zeros(3),
            cov=cov,
            steps=3,
            init_dist=pm.MvNormal.dist(mu=np.zeros(3), cov=np.eye(3)),
            size=(30_000,),
        )
        draws = np.asarray(db.sample(KEY(5)))
        got = np.cov(draws[:, -1, :].T)
        np.testing.assert_allclose(got, np.eye(3) + 3 * cov, rtol=0.1, atol=0.1)

    @pytest.mark.parametrize("param", ["chol", "tau"])
    def test_mvgaussian_param_forms(self, param):
        cov = np.array([[2.0, 0.5], [0.5, 1.0]])
        kw = (
            {"chol": np.linalg.cholesky(cov)}
            if param == "chol"
            else {"tau": np.linalg.inv(cov)}
        )
        init = pm.MvNormal.dist(mu=np.zeros(2), cov=np.eye(2))
        d = pm.MvGaussianRandomWalk.dist(
            mu=np.zeros(2), steps=2, init_dist=init, **kw
        )
        ref = pm.MvGaussianRandomWalk.dist(
            mu=np.zeros(2), cov=cov, steps=2, init_dist=init
        )
        x = np.array([[0.1, -0.4], [1.0, 0.2], [0.5, 0.5]])
        np.testing.assert_allclose(np_logp(d, x), np_logp(ref, x), rtol=1e-9)

    def test_mvstudentt_logp(self):
        scale = np.array([[1.5, 0.4], [0.4, 1.0]])
        d = pm.MvStudentTRandomWalk.dist(
            nu=5,
            mu=np.zeros(2),
            scale=scale,
            steps=3,
            init_dist=pm.MvNormal.dist(mu=np.zeros(2), cov=np.eye(2)),
        )
        rng = np.random.default_rng(6)
        x = rng.normal(size=(4, 2))
        expected = st.multivariate_normal.logpdf(x[0], np.zeros(2), np.eye(2))
        expected += st.multivariate_t.logpdf(
            np.diff(x, axis=0), np.zeros(2), scale, df=5
        ).sum()
        np.testing.assert_allclose(np_logp(d, x), expected, rtol=1e-9)

    def test_gaussian_inference(self):
        # reference test_timeseries.py:403 — recover mu/sigma of a GRW
        mu_t, sigma_t = 0.025, 0.02
        rng = np.random.default_rng(7)
        y = np.concatenate(
            [[0.0], np.cumsum(rng.normal(mu_t, sigma_t, size=299))]
        )
        with pm.Model() as m:
            mu = pm.Normal("mu", 0, 0.1)
            sigma = pm.HalfNormal("sigma", 0.1)
            pm.GaussianRandomWalk(
                "y",
                mu=mu,
                sigma=sigma,
                init_dist=pm.Normal.dist(0.0, 0.1),
                observed=y,
            )
            idata = pm.sample(
                draws=300, tune=300, chains=2, random_seed=11,
                progressbar=False, compute_convergence_checks=False,
            )
        post = idata.posterior
        assert abs(float(post["mu"].mean()) - mu_t) < 0.005
        assert abs(float(post["sigma"].mean()) - sigma_t) < 0.005


# ------------------------------------------------------------------------ AR


class TestAR:
    def test_order1_logp_oracle(self):
        rho, sigma = 0.6, 0.8
        d = pm.AR.dist(
            rho=[rho], sigma=sigma, init_dist=pm.Normal.dist(0.0, 1.0), steps=4
        )
        x = np.array([0.2, 0.5, -0.1, 0.3, 0.9])
        expected = st.norm.logpdf(x[0], 0.0, 1.0) + st.norm.logpdf(
            x[1:], rho * x[:-1], sigma
        ).sum()
        np.testing.assert_allclose(np_logp(d, x), expected, rtol=1e-10)

    def test_order2_logp_oracle(self):
        rho = np.array([0.5, 0.3])
        d = pm.AR.dist(
            rho=rho,
            sigma=0.5,
            init_dist=pm.Normal.dist(0.0, 1.0, shape=(2,)),
            steps=4,
        )
        x = np.array([0.1, -0.2, 0.4, 0.0, 0.6, 0.2])
        mean = rho[0] * x[1:-1] + rho[1] * x[:-2]
        expected = st.norm.logpdf(x[:2], 0.0, 1.0).sum() + st.norm.logpdf(
            x[2:], mean, 0.5
        ).sum()
        np.testing.assert_allclose(np_logp(d, x), expected, rtol=1e-10)

    def test_constant_logp_oracle(self):
        # constant=True: rho[0] is the constant term (reference AR docstring)
        rho = np.array([1.5, 0.7])
        d = pm.AR.dist(
            rho=rho,
            sigma=0.4,
            constant=True,
            init_dist=pm.Normal.dist(0.0, 1.0),
            steps=4,
        )
        x = np.array([0.3, 1.8, 2.6, 3.5, 4.2])
        expected = st.norm.logpdf(x[0], 0.0, 1.0) + st.norm.logpdf(
            x[1:], 1.5 + 0.7 * x[:-1], 0.4
        ).sum()
        np.testing.assert_allclose(np_logp(d, x), expected, rtol=1e-10)

    def test_multivariate_init_logp_oracle(self):
        # ADVICE r3: a multivariate init dist (MvNormal over the ar_order
        # inits, event_ndim=1) already collapsed its event axis in logp —
        # reference ar_logp only sums the init term when ndim_supp == 0.
        rho = np.array([0.5, 0.3])
        cov = np.array([[1.0, 0.4], [0.4, 2.0]])
        d = pm.AR.dist(
            rho=rho, sigma=0.5,
            init_dist=pm.MvNormal.dist(mu=np.zeros(2), cov=cov), steps=4,
        )
        x = np.array([0.1, -0.2, 0.4, 0.0, 0.6, 0.2])
        mean = rho[0] * x[1:-1] + rho[1] * x[:-2]
        expected = st.multivariate_normal.logpdf(
            x[:2], np.zeros(2), cov
        ) + st.norm.logpdf(x[2:], mean, 0.5).sum()
        np.testing.assert_allclose(np_logp(d, x), expected, rtol=1e-10)

    def test_multivariate_init_batched_logp(self):
        # the batch axis must survive: summing the collapsed init logp over
        # axis=-1 used to eat it
        rho = np.array([0.5, 0.3])
        cov = np.array([[1.0, 0.4], [0.4, 2.0]])
        d = pm.AR.dist(
            rho=rho, sigma=0.5,
            init_dist=pm.MvNormal.dist(mu=np.zeros(2), cov=cov), steps=4,
            shape=(3, 6),
        )
        x = np.random.default_rng(11).normal(size=(3, 6))
        got = np_logp(d, x)
        assert got.shape == (3,)
        for i in range(3):
            mean = rho[0] * x[i, 1:-1] + rho[1] * x[i, :-2]
            expected = st.multivariate_normal.logpdf(
                x[i, :2], np.zeros(2), cov
            ) + st.norm.logpdf(x[i, 2:], mean, 0.5).sum()
            np.testing.assert_allclose(got[i], expected, rtol=1e-10)

    def test_shape_gives_steps_minus_order(self):
        d = pm.AR.dist(
            rho=[0.5, 0.3],
            sigma=1.0,
            init_dist=pm.Normal.dist(0.0, 1.0, shape=(2,)),
            shape=(10,),
        )
        assert d.steps == 8
        assert d.sample(KEY(0)).shape == (10,)

    def test_batched_rhos(self):
        rhos = np.array([[0.2], [0.5], [0.9]])
        d = pm.AR.dist(
            rho=rhos, sigma=1.0, init_dist=pm.Normal.dist(0.0, 1.0), steps=5,
            shape=(3, 6),
        )
        rng = np.random.default_rng(8)
        x = rng.normal(size=(3, 6))
        got = np_logp(d, x)
        assert got.shape == (3,)
        for i in range(3):
            single = pm.AR.dist(
                rho=rhos[i], sigma=1.0, init_dist=pm.Normal.dist(0.0, 1.0),
                steps=5,
            )
            np.testing.assert_allclose(got[i], np_logp(single, x[i]), rtol=1e-10)

    def test_batched_sigma(self):
        sigmas = np.array([0.3, 1.0, 2.5])
        d = pm.AR.dist(
            rho=[0.5], sigma=sigmas, init_dist=pm.Normal.dist(0.0, 1.0),
            steps=5, shape=(3, 6),
        )
        rng = np.random.default_rng(9)
        x = rng.normal(size=(3, 6))
        got = np_logp(d, x)
        for i in range(3):
            single = pm.AR.dist(
                rho=[0.5], sigma=sigmas[i],
                init_dist=pm.Normal.dist(0.0, 1.0), steps=5,
            )
            np.testing.assert_allclose(got[i], np_logp(single, x[i]), rtol=1e-10)

    def test_invalid_sigma(self):
        d = pm.AR.dist(
            rho=[0.5], sigma=-1.0, init_dist=pm.Normal.dist(0.0, 1.0), steps=3
        )
        assert np_logp(d, np.zeros(4)) == -np.inf

    def test_stationary_sample_moments(self):
        # AR(1) started at the stationary dist stays there:
        # var = sigma^2/(1-rho^2)
        rho, sigma = 0.8, 1.0
        svar = sigma**2 / (1 - rho**2)
        d = pm.AR.dist(
            rho=[rho],
            sigma=sigma,
            init_dist=pm.Normal.dist(0.0, np.sqrt(svar)),
            steps=20,
            size=(20_000,),
        )
        draws = np.asarray(d.sample(KEY(10)))
        assert draws.shape == (20_000, 21)
        np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.05)
        np.testing.assert_allclose(draws.var(0), svar, rtol=0.06)
        # lag-1 autocorrelation = rho
        lag1 = np.mean(draws[:, 1:] * draws[:, :-1]) / svar
        np.testing.assert_allclose(lag1, rho, atol=0.02)

    def test_constant_random_mean(self):
        # constant AR(1): long-run mean = c/(1-rho)
        d = pm.AR.dist(
            rho=[2.0, 0.5],
            sigma=0.1,
            constant=True,
            init_dist=pm.Normal.dist(4.0, 0.1),
            steps=30,
            size=(4_000,),
        )
        draws = np.asarray(d.sample(KEY(11)))
        np.testing.assert_allclose(draws[:, -1].mean(), 4.0, atol=0.05)

    def test_support_point_zero(self):
        d = pm.AR.dist(
            rho=[0.5], sigma=1.0, init_dist=pm.Normal.dist(0.0, 1.0), steps=3
        )
        np.testing.assert_allclose(np.asarray(d.support_point()), np.zeros(4))

    def test_support_point_from_init(self):
        # reference ar_support_point: last init support-point entry, filled
        d = pm.AR.dist(
            rho=[0.5, 0.2], sigma=1.0,
            init_dist=pm.Normal.dist(np.array([2.0, 5.0]), 1.0), steps=3,
        )
        np.testing.assert_allclose(
            np.asarray(d.support_point()), np.full(5, 5.0)
        )


# ------------------------------------------------------------------- GARCH11


class TestGARCH11:
    @staticmethod
    def _manual_logp(x, omega, alpha_1, beta_1, initial_vol):
        vol2 = initial_vol**2
        lp = st.norm.logpdf(x[0], 0.0, initial_vol)
        for t in range(1, len(x)):
            vol2 = omega + alpha_1 * x[t - 1] ** 2 + beta_1 * vol2
            lp += st.norm.logpdf(x[t], 0.0, np.sqrt(vol2))
        return lp

    def test_logp_oracle(self):
        omega, a1, b1, iv = 1.25, 0.5, 0.45, 2.5
        d = pm.GARCH11.dist(
            omega=omega, alpha_1=a1, beta_1=b1, initial_vol=iv, steps=7
        )
        rng = np.random.default_rng(12)
        x = rng.normal(size=8) * 2
        np.testing.assert_allclose(
            np_logp(d, x), self._manual_logp(x, omega, a1, b1, iv), rtol=1e-9
        )

    @pytest.mark.parametrize(
        "bad",
        [
            {"omega": -1.0, "alpha_1": 0.2, "beta_1": 0.3},
            {"omega": 1.0, "alpha_1": -0.1, "beta_1": 0.3},
        ],
    )
    def test_invalid_params(self, bad):
        d = pm.GARCH11.dist(initial_vol=1.0, steps=3, **bad)
        assert np_logp(d, np.zeros(4)) == -np.inf

    def test_nonstationary_density_is_finite(self):
        # reference garch11_logp enforces NO stationarity constraint:
        # alpha_1 + beta_1 >= 1 (IGARCH and beyond) is a valid finite density
        d = pm.GARCH11.dist(
            omega=0.5, alpha_1=0.7, beta_1=0.6, initial_vol=1.0, steps=5
        )
        x = np.array([0.1, -0.5, 0.8, 0.2, -1.0, 0.4])
        got = np_logp(d, x)
        assert np.isfinite(got)
        np.testing.assert_allclose(
            got, self._manual_logp(x, 0.5, 0.7, 0.6, 1.0), rtol=1e-9
        )

    def test_batched_logp(self):
        omegas = np.array([0.5, 1.0, 2.0])
        d = pm.GARCH11.dist(
            omega=omegas, alpha_1=0.2, beta_1=0.3, initial_vol=1.0, steps=5,
            shape=(3, 6),
        )
        rng = np.random.default_rng(13)
        x = rng.normal(size=(3, 6))
        got = np_logp(d, x)
        for i in range(3):
            np.testing.assert_allclose(
                got[i],
                self._manual_logp(x[i], omegas[i], 0.2, 0.3, 1.0),
                rtol=1e-9,
            )

    def test_sample_unconditional_variance(self):
        # stationary unconditional variance = omega / (1 - alpha - beta)
        omega, a1, b1 = 0.2, 0.1, 0.5
        uvar = omega / (1 - a1 - b1)
        d = pm.GARCH11.dist(
            omega=omega, alpha_1=a1, beta_1=b1,
            initial_vol=np.sqrt(uvar), steps=60, size=(8_000,),
        )
        draws = np.asarray(d.sample(KEY(14)))
        np.testing.assert_allclose(draws[:, -1].var(), uvar, rtol=0.1)
        np.testing.assert_allclose(draws.mean(), 0.0, atol=0.02)

    def test_steps_from_shape(self):
        d = pm.GARCH11.dist(
            omega=1.0, alpha_1=0.2, beta_1=0.3, initial_vol=1.0, shape=(9,)
        )
        assert d.steps == 8
        assert d.sample(KEY(0)).shape == (9,)


# -------------------------------------------------------------- EulerMaruyama


def _ou_sde(x, lam, s):
    return -lam * x, s


class TestEulerMaruyama:
    def test_logp_oracle(self):
        lam, s, dt = 0.7, 0.5, 0.1
        d = pm.EulerMaruyama.dist(
            dt=dt, sde_fn=_ou_sde, sde_pars=(lam, s),
            init_dist=pm.Normal.dist(0.0, 1.0), steps=5,
        )
        rng = np.random.default_rng(15)
        x = rng.normal(size=6)
        mu = x[:-1] - lam * x[:-1] * dt
        sd = np.sqrt(s**2 * dt)
        expected = st.norm.logpdf(x[0], 0.0, 1.0) + st.norm.logpdf(
            x[1:], mu, sd
        ).sum()
        np.testing.assert_allclose(np_logp(d, x), expected, rtol=1e-9)

    def test_state_dependent_diffusion(self):
        # geometric-Brownian-like: f = mu*x, g = s*|x|
        def sde(x, mu, s):
            import jax.numpy as jnp

            return mu * x, s * jnp.abs(x)

        mu_p, s, dt = 0.05, 0.2, 0.01
        d = pm.EulerMaruyama.dist(
            dt=dt, sde_fn=sde, sde_pars=(mu_p, s),
            init_dist=pm.Normal.dist(1.0, 0.01), steps=4,
        )
        x = np.array([1.0, 1.01, 0.99, 1.02, 1.05])
        mean = x[:-1] + mu_p * x[:-1] * dt
        sd = np.sqrt((s * np.abs(x[:-1])) ** 2 * dt)
        expected = st.norm.logpdf(x[0], 1.0, 0.01) + st.norm.logpdf(
            x[1:], mean, sd
        ).sum()
        np.testing.assert_allclose(np_logp(d, x), expected, rtol=1e-9)

    def test_batched_params_logp(self):
        # batched sde params broadcast against the time axis in logp
        # (reference eulermaruyama_logp appends a trailing axis per param)
        lams = np.array([0.3, 0.7, 1.2])
        d = pm.EulerMaruyama.dist(
            dt=0.1, sde_fn=_ou_sde, sde_pars=(lams, 0.5),
            init_dist=pm.Normal.dist(0.0, 1.0), steps=4, shape=(3, 5),
        )
        rng = np.random.default_rng(20)
        x = rng.normal(size=(3, 5))
        got = np_logp(d, x)
        assert got.shape == (3,)
        for i in range(3):
            single = pm.EulerMaruyama.dist(
                dt=0.1, sde_fn=_ou_sde, sde_pars=(lams[i], 0.5),
                init_dist=pm.Normal.dist(0.0, 1.0), steps=4,
            )
            np.testing.assert_allclose(got[i], np_logp(single, x[i]), rtol=1e-9)

    def test_natural_batch_from_params(self):
        # batched sde params imply the batch shape without explicit shape=
        lams = np.array([0.5, 1.0])
        d = pm.EulerMaruyama.dist(
            dt=0.1, sde_fn=_ou_sde, sde_pars=(lams, 0.3),
            init_dist=pm.Normal.dist(0.0, 1.0), steps=4,
        )
        assert d.shape == (2, 5)
        assert d.sample(KEY(25)).shape == (2, 5)
        x = np.random.default_rng(26).normal(size=(2, 5))
        got = np_logp(d, x)
        sd = 0.3 * np.sqrt(0.1)
        for i in range(2):
            mu = x[i, :-1] - lams[i] * x[i, :-1] * 0.1
            expected = st.norm.logpdf(x[i, 0], 0, 1) + st.norm.logpdf(
                x[i, 1:], mu, sd
            ).sum()
            np.testing.assert_allclose(got[i], expected, rtol=1e-9)

    def test_ou_sample_moments(self):
        # OU with small dt: stationary var ≈ s^2/(2 lam)
        lam, s, dt = 1.0, 1.0, 0.02
        svar = s**2 / (2 * lam)
        d = pm.EulerMaruyama.dist(
            dt=dt, sde_fn=_ou_sde, sde_pars=(lam, s),
            init_dist=pm.Normal.dist(0.0, np.sqrt(svar)), steps=100,
            size=(8_000,),
        )
        draws = np.asarray(d.sample(KEY(16)))
        np.testing.assert_allclose(draws[:, -1].var(), svar, rtol=0.1)

    def test_linear_model_inference(self):
        # reference test_timeseries.py:928 — recover the drift parameter
        lam_t, s_t, dt = 0.78, 0.2, 0.1
        rng = np.random.default_rng(17)
        x = [0.0]
        for _ in range(199):
            x.append(
                x[-1] - lam_t * x[-1] * dt
                + s_t * np.sqrt(dt) * rng.normal()
            )
        x = np.array(x)
        obs = x + rng.normal(0, 0.02, size=x.shape)
        with pm.Model():
            lam = pm.HalfNormal("lam", 1.0)
            path = pm.EulerMaruyama(
                "path", dt=dt, sde_fn=_ou_sde, sde_pars=(lam, s_t),
                init_dist=pm.Normal.dist(0.0, 0.1), steps=199,
            )
            pm.Normal("obs", mu=path, sigma=0.02, observed=obs)
            idata = pm.sample(
                draws=300, tune=400, chains=2, random_seed=18,
                progressbar=False, compute_convergence_checks=False,
            )
        lam_post = float(idata.posterior["lam"].mean())
        assert abs(lam_post - lam_t) < 0.25

    def test_batched_init_dist_sample(self):
        # ADVICE r3: a batched init_dist folds into the natural batch shape;
        # sample() must draw the init at the EXTRA dims only (composite-dist
        # idiom) — drawing at the full batch crashed the broadcast_to.
        mus = np.array([-5.0, 0.0, 5.0])
        d = pm.EulerMaruyama.dist(
            dt=0.1, sde_fn=_ou_sde, sde_pars=(0.5, 0.3),
            init_dist=pm.Normal.dist(mus, 0.01), steps=4,
        )
        assert d.shape == (3, 5)
        draws = np.asarray(d.sample(KEY(31)))
        assert draws.shape == (3, 5)
        # each batch row starts near its own init mean (not one shared draw)
        np.testing.assert_allclose(draws[:, 0], mus, atol=0.1)
        assert len(np.unique(draws[:, 0])) == 3
        # with an extra sample_shape on top the init draws stay independent
        many = np.asarray(d.sample(KEY(32), (200,)))
        assert many.shape == (200, 3, 5)
        assert len(np.unique(many[:, 0, 0])) == 200

    def test_default_init_matches_param_shape(self):
        # reference timeseries.py:964: default init is
        # Normal.dist(0, 100, shape=sde_pars[0].shape)
        lams = np.array([0.5, 1.0])
        with pytest.warns(UserWarning, match="Initial distribution"):
            d = pm.EulerMaruyama.dist(
                dt=0.1, sde_fn=_ou_sde, sde_pars=(lams, 0.3), steps=4,
            )
        assert d.init_dist.batch_shape == (2,)
        assert d.shape == (2, 5)
        assert d.sample(KEY(33)).shape == (2, 5)


# --------------------------------------------------------------- model usage


class TestTimeseriesInModel:
    def test_observed_shape_infers_steps(self):
        y = np.random.default_rng(19).normal(size=12).cumsum()
        with pm.Model() as m:
            sigma = pm.HalfNormal("sigma", 1.0)
            pm.GaussianRandomWalk(
                "y", mu=0.0, sigma=sigma,
                init_dist=pm.Normal.dist(0.0, 1.0), observed=y,
            )
            lp = m.compile_logp()(m.initial_point())
        assert np.isfinite(lp)

    def test_model_logp_matches_dist_logp(self):
        y = np.array([0.0, 0.5, 0.3, 1.1])
        with pm.Model() as m:
            pm.AR(
                "ar", rho=[0.6], sigma=0.5,
                init_dist=pm.Normal.dist(0.0, 1.0), observed=y,
            )
            model_lp = m.compile_logp()(m.initial_point())
        d = pm.AR.dist(
            rho=[0.6], sigma=0.5, init_dist=pm.Normal.dist(0.0, 1.0), steps=3
        )
        np.testing.assert_allclose(model_lp, np_logp(d, y), rtol=1e-10)
