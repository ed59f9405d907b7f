"""Multivariate distribution tests vs scipy oracles + analytic
self-consistency (mirrors reference tests/distributions/test_multivariate.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats as st

import pymc_tpu as pm


def _rand_cov(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n))
    return A @ A.T + n * np.eye(n)


class TestMvNormal:
    def test_logp_cov(self):
        n = 4
        cov = _rand_cov(n)
        mu = np.arange(n, dtype=float)
        d = pm.MvNormal.dist(mu=mu, cov=cov)
        x = np.random.default_rng(1).normal(size=(7, n))
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, x)),
            st.multivariate_normal.logpdf(x, mu, cov),
            rtol=1e-8,
        )

    def test_logp_chol_tau(self):
        n = 3
        cov = _rand_cov(n, 1)
        mu = np.zeros(n)
        chol = np.linalg.cholesky(cov)
        tau = np.linalg.inv(cov)
        x = np.random.default_rng(2).normal(size=(5, n))
        expected = st.multivariate_normal.logpdf(x, mu, cov)
        for kwargs in ({"chol": chol}, {"tau": tau}):
            d = pm.MvNormal.dist(mu=mu, **kwargs)
            np.testing.assert_allclose(
                np.asarray(pm.logp(d, x)), expected, rtol=1e-7
            )

    def test_random_moments(self):
        n = 3
        cov = _rand_cov(n, 3)
        mu = np.array([1.0, -2.0, 0.5])
        d = pm.MvNormal.dist(mu=mu, cov=cov, size=(20000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(0)))
        np.testing.assert_allclose(draws.mean(0), mu, atol=0.1)
        np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.25)

    def test_batched(self):
        cov = np.stack([_rand_cov(2, 5), _rand_cov(2, 6)])
        mu = np.zeros((2, 2))
        d = pm.MvNormal.dist(mu=mu, cov=cov)
        assert d.shape == (2, 2)
        x = np.random.default_rng(3).normal(size=(2, 2))
        ours = np.asarray(pm.logp(d, x))
        expected = [
            st.multivariate_normal.logpdf(x[i], mu[i], cov[i]) for i in range(2)
        ]
        np.testing.assert_allclose(ours, expected, rtol=1e-8)


class TestMvStudentT:
    def test_logp(self):
        n = 3
        cov = _rand_cov(n, 7)
        mu = np.array([0.5, -1.0, 2.0])
        nu = 5.0
        d = pm.MvStudentT.dist(nu=nu, mu=mu, scale=cov)
        x = np.random.default_rng(4).normal(size=(6, n))
        expected = st.multivariate_t.logpdf(x, mu, cov, df=nu)
        np.testing.assert_allclose(np.asarray(pm.logp(d, x)), expected, rtol=1e-7)


class TestDirichlet:
    def test_logp(self):
        a = np.array([1.5, 2.0, 3.0])
        d = pm.Dirichlet.dist(a=a)
        x = np.random.default_rng(5).dirichlet(a, size=6)
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, x)),
            st.dirichlet.logpdf(x.T, a),
            rtol=1e-8,
        )

    def test_random(self):
        a = np.array([2.0, 3.0, 5.0])
        d = pm.Dirichlet.dist(a=a, size=(20000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(1)))
        np.testing.assert_allclose(draws.mean(0), a / a.sum(), atol=0.01)
        np.testing.assert_allclose(draws.sum(-1), 1.0, atol=1e-6)

    def test_transform_roundtrip(self):
        d = pm.Dirichlet.dist(a=np.ones(4))
        t = d.default_transform()
        x = np.random.default_rng(6).dirichlet(np.ones(4))
        v = t.forward(jnp.asarray(x))
        assert v.shape == (3,)
        back = np.asarray(t.backward(v))
        np.testing.assert_allclose(back, x, rtol=1e-6)


class TestMultinomial:
    def test_logp(self):
        n, p = 10, np.array([0.2, 0.3, 0.5])
        d = pm.Multinomial.dist(n=n, p=p)
        x = np.random.default_rng(7).multinomial(n, p, size=5)
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, x)),
            st.multinomial.logpmf(x, n, p),
            rtol=1e-8,
        )
        bad = np.array([5, 5, 5])
        assert np.asarray(pm.logp(d, bad)) == -np.inf

    def test_random(self):
        n, p = 20, np.array([0.1, 0.4, 0.5])
        d = pm.Multinomial.dist(n=n, p=p, size=(5000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(2)))
        assert np.all(draws.sum(-1) == n)
        np.testing.assert_allclose(draws.mean(0), n * p, atol=0.2)


class TestDirichletMultinomial:
    def test_logp(self):
        n, a = 8, np.array([1.0, 2.0, 3.0])
        d = pm.DirichletMultinomial.dist(n=n, a=a)
        x = np.random.default_rng(8).multinomial(n, [0.3, 0.3, 0.4], size=5)
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, x)),
            st.dirichlet_multinomial.logpmf(x, a, n),
            rtol=1e-7,
        )


class TestOrderedMultinomial:
    def test_logp_sums_to_multinomial(self):
        eta, cut, n = 0.3, np.array([-1.0, 1.0]), 12
        d = pm.OrderedMultinomial.dist(eta=eta, cutpoints=cut, n=n)
        sig = lambda z: 1 / (1 + np.exp(-z))  # noqa: E731
        cdf = sig(cut - eta)
        p = np.diff(np.concatenate([[0.0], cdf, [1.0]]))
        x = np.random.default_rng(9).multinomial(n, p, size=4)
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, x)), st.multinomial.logpmf(x, n, p), rtol=1e-6
        )


class TestWishart:
    def test_logp(self):
        p = 3
        V = _rand_cov(p, 10)
        nu = 6.0
        d = pm.Wishart.dist(nu=nu, V=V)
        X = st.wishart.rvs(int(nu), V, size=5, random_state=11)
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, X)),
            st.wishart.logpdf(np.moveaxis(X, 0, -1), nu, V),
            rtol=1e-7,
        )

    def test_random_mean(self):
        p = 2
        V = _rand_cov(p, 12)
        nu = 7.0
        d = pm.Wishart.dist(nu=nu, V=V, size=(4000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(3)))
        np.testing.assert_allclose(draws.mean(0), nu * V, rtol=0.1)

    def test_cholesky_cov_transform_jacobian(self):
        # analytic log|det d backward/dv| vs autodiff on the tril coords
        from pymc_tpu.distributions.transforms import CholeskyCovTransform

        n = 3
        t = CholeskyCovTransform(n)
        X = _rand_cov(n, 5)
        v = t.forward(jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(t.backward(v)), X, rtol=1e-5)
        rows, cols = np.tril_indices(n)
        J = jax.jacobian(lambda u: t.backward(u)[rows, cols])(v)
        _, ld = np.linalg.slogdet(np.asarray(J))
        np.testing.assert_allclose(float(t.log_jac_det(v)), ld, rtol=1e-5)

    def test_nuts_samples_wishart_prior(self):
        # default CholeskyCovTransform makes Wishart directly MCMC-usable
        V = np.array([[1.0, 0.3], [0.3, 1.0]])
        with pm.Model() as m:
            pm.Wishart("W", nu=5, V=V)
        idata = pm.sample(
            draws=400, tune=400, chains=4, model=m, random_seed=2,
            progressbar=False, compute_convergence_checks=False,
        )
        W = idata.posterior["W"].values.reshape(-1, 2, 2)
        np.testing.assert_allclose(W.mean(0), 5 * V, rtol=0.15)
        # every draw stays on the SPD cone
        assert (np.linalg.eigvalsh(W) > 0).all()

    def test_wishart_bartlett_shim(self):
        import warnings

        V = np.array([[2.0, 0.5], [0.5, 1.0]])
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", FutureWarning)
            with pm.Model() as m:
                pm.WishartBartlett("S", V, 5, return_cholesky=True)
        assert np.isfinite(m.compile_logp()(m.initial_point()))


class TestLKJ:
    def test_lkjcorr_n2_matches_closed_form(self):
        # n=2: p(r) = (1-r^2)^{eta-1} / (2^{2eta-1} B(eta, eta))
        from scipy.special import betaln as sp_betaln

        eta = 2.5
        d = pm.LKJCorr.dist(n=2, eta=eta)
        rs = np.array([-0.7, -0.2, 0.0, 0.4, 0.9])
        expected = (eta - 1) * np.log1p(-(rs**2)) - (
            (2 * eta - 1) * np.log(2) + sp_betaln(eta, eta)
        )
        ours = np.asarray(pm.logp(d, rs[:, None]))
        np.testing.assert_allclose(ours, expected, rtol=1e-6)

    def test_lkjcorr_n3_normalizes(self):
        # numerically integrate p(C) over the 3-d space of (r12, r13, r23)
        eta = 1.5
        d = pm.LKJCorr.dist(n=3, eta=eta)
        grid = np.linspace(-0.999, 0.999, 60)
        dr = grid[1] - grid[0]
        R12, R13, R23 = np.meshgrid(grid, grid, grid, indexing="ij")
        packed = np.stack([R12.ravel(), R13.ravel(), R23.ravel()], axis=-1)
        logps = np.asarray(jax.jit(lambda v: pm.logp(d, v))(packed))
        mass = np.exp(logps[np.isfinite(logps)]).sum() * dr**3
        assert abs(mass - 1.0) < 0.02, f"LKJCorr n=3 mass {mass}"

    def test_lkjcorr_sampling_moments(self):
        # E[r] = 0; var known for n=2: Var(r) = 1/(2eta+1)
        eta = 3.0
        d = pm.LKJCorr.dist(n=2, eta=eta, size=(20000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(4)))[:, 0]
        assert abs(draws.mean()) < 0.02
        np.testing.assert_allclose(draws.var(), 1 / (2 * eta + 1), rtol=0.05)

    def test_lkjcholeskycov_in_model(self):
        with pm.Model() as m:
            chol, corr, stds = pm.LKJCholeskyCov(
                "packed", eta=2.0, n=3, sd_dist=pm.Exponential.dist(1.0)
            )
            pm.MvNormal("y", mu=np.zeros(3), chol=chol,
                        observed=np.random.default_rng(13).normal(size=(20, 3)))
        pt = m.initial_point()
        lp = m.compile_logp()(pt)
        assert np.isfinite(float(lp))
        # transform round trip
        rv = m.free_RVs[0]
        t = rv.transform
        v = pt[rv.value_name]
        x = t.backward(v)
        np.testing.assert_allclose(np.asarray(t.forward(x)), v, rtol=1e-6)

    def test_corr_packed_transform_roundtrip(self):
        from pymc_tpu.distributions.multivariate import CorrPackedTransform

        t = CorrPackedTransform(4)
        rng = np.random.default_rng(14)
        v = rng.normal(size=6) * 0.5
        x = t.backward(jnp.asarray(v))
        v2 = np.asarray(t.forward(x))
        np.testing.assert_allclose(v2, v, rtol=1e-5, atol=1e-7)


class TestZeroSumNormal:
    def test_draws_sum_to_zero(self):
        d = pm.ZeroSumNormal.dist(sigma=2.0, shape=(5000, 4))
        draws = np.asarray(d.sample(jax.random.PRNGKey(5)))
        np.testing.assert_allclose(draws.sum(-1), 0.0, atol=1e-5)

    def test_model_roundtrip(self):
        with pm.Model() as m:
            x = pm.ZeroSumNormal("x", sigma=1.0, shape=(4,))
        pt = m.initial_point()
        assert pt["x_zerosum__"].shape == (3,)
        lp = m.compile_logp()(pt)
        assert np.isfinite(float(lp))

    def test_sample_posterior(self):
        # posterior of zero-sum effects with strong data
        rng = np.random.default_rng(15)
        true = np.array([1.0, -0.5, -0.5])
        y = true + rng.normal(0, 0.1, size=(200, 3))
        with pm.Model() as m:
            x = pm.ZeroSumNormal("x", sigma=1.0, shape=(3,))
            pm.Normal("y", x, 0.1, observed=y)
        idata = pm.sample(draws=300, tune=300, chains=2, model=m,
                          random_seed=1, progressbar=False,
                          compute_convergence_checks=False)
        post = idata.posterior["x"].values
        np.testing.assert_allclose(post.sum(-1), 0.0, atol=1e-5)
        est = post.mean(axis=(0, 1))
        np.testing.assert_allclose(est, true - true.mean(), atol=0.05)


class TestCAR:
    def test_logp_vs_dense_mvnormal(self):
        W = np.array(
            [[0, 1, 0, 1], [1, 0, 1, 0], [0, 1, 0, 1], [1, 0, 1, 0]],
            dtype=float,
        )
        alpha, tau = 0.7, 2.0
        D = np.diag(W.sum(1))
        prec = tau * (D - alpha * W)
        cov = np.linalg.inv(prec)
        mu = np.zeros(4)
        d = pm.CAR.dist(mu=mu, W=W, alpha=alpha, tau=tau)
        x = np.random.default_rng(16).normal(size=(5, 4))
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, x)),
            st.multivariate_normal.logpdf(x, mu, cov),
            rtol=1e-7,
        )


class TestStickBreakingWeights:
    def test_logp_normalization_k1(self):
        # K=1: w = (v, 1-v) with v ~ Beta(1, alpha)
        alpha = 2.0
        d = pm.StickBreakingWeights.dist(alpha=alpha, K=1)
        vs = np.array([0.1, 0.5, 0.9])
        x = np.stack([vs, 1 - vs], axis=-1)
        expected = st.beta.logpdf(vs, 1, alpha)
        np.testing.assert_allclose(np.asarray(pm.logp(d, x)), expected, rtol=1e-7)

    def test_random(self):
        d = pm.StickBreakingWeights.dist(alpha=3.0, K=5, size=(8000,))
        draws = np.asarray(d.sample(jax.random.PRNGKey(6)))
        np.testing.assert_allclose(draws.sum(-1), 1.0, atol=1e-6)
        assert np.all(draws >= 0)


class TestMatrixNormal:
    def test_logp_vs_kron_mvnormal(self):
        n, p = 3, 2
        U = _rand_cov(n, 20)
        V = _rand_cov(p, 21)
        mu = np.zeros((n, p))
        d = pm.MatrixNormal.dist(mu=mu, rowcov=U, colcov=V)
        X = np.random.default_rng(22).normal(size=(4, n, p))
        cov = np.kron(U, V)
        expected = st.multivariate_normal.logpdf(
            X.reshape(4, -1), np.zeros(n * p), cov
        )
        np.testing.assert_allclose(np.asarray(pm.logp(d, X)), expected, rtol=1e-7)


class TestKroneckerNormal:
    def test_logp_vs_dense(self):
        K1 = _rand_cov(3, 30)
        K2 = _rand_cov(2, 31)
        sigma = 0.5
        N = 6
        mu = np.zeros(N)
        d = pm.KroneckerNormal.dist(mu=mu, covs=[K1, K2], sigma=sigma)
        cov = np.kron(K1, K2) + sigma**2 * np.eye(N)
        x = np.random.default_rng(32).normal(size=(5, N))
        np.testing.assert_allclose(
            np.asarray(pm.logp(d, x)),
            st.multivariate_normal.logpdf(x, mu, cov),
            rtol=1e-6,
        )
