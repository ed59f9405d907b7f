"""Multivariate depth battery — ports the case INVENTORY (not the code) of
reference tests/distributions/test_multivariate.py rows that the base
oracle/contract suites did not reach: ICAR (logp oracle + matrix checks +
rng refusal), CAR validity edges, batched-dims combinatorics for
MvNormal/MvStudentT, vectorized (extra-size) logp sweeps for the simplex
family, Multinomial p/value semantics (reference :632-718), the
DirichletMultinomial<->BetaBinomial identity (:741), indefinite covariance,
and ZeroSumNormal per-axis constraint gates.

Oracles are scipy closed forms and hand-built numpy formulas, never
reference code.
"""

import warnings

import numpy as np
import jax
import pytest
import scipy.stats as st

import pymc_tpu as pm


W_LATTICE = np.array(
    [[0, 1, 0, 1], [1, 0, 1, 0], [0, 1, 0, 1], [1, 0, 1, 0]]
)


def _icar_logp_np(value, W, sigma=1.0, zero_sum_stdev=0.001):
    """Reference icar logp (multivariate.py:2434-2447) built independently:
    tril-edgelist pairwise energy + soft zero-sum Normal on the raw value."""
    N = W.shape[-1]
    ii, jj = np.nonzero(np.tril(W) == 1)
    pairwise = (-1.0 / (2.0 * sigma**2)) * np.sum(
        (value[ii] - value[jj]) ** 2
    )
    zss = zero_sum_stdev * N
    zero_sum = (
        -0.5 * (np.sum(value) / zss) ** 2
        - np.log(np.sqrt(2.0 * np.pi))
        - np.log(zss)
    )
    return pairwise + zero_sum


class TestICAR:
    def test_logp_reference_value(self):
        # reference test_icar_logp pins 4.60022238 for this lattice/value
        d = pm.ICAR.dist(W=W_LATTICE)
        v = np.array([0.01, -0.03, 0.02, 0.00])
        np.testing.assert_allclose(
            float(pm.logp(d, v)), 4.60022238, rtol=1e-6
        )
        np.testing.assert_allclose(
            float(pm.logp(d, v)), _icar_logp_np(v, W_LATTICE), rtol=1e-10
        )

    @pytest.mark.parametrize("sigma", [0.5, 1.0, 3.0])
    def test_logp_sigma_scaling_vs_numpy(self, sigma):
        rng = np.random.default_rng(3)
        v = rng.normal(0, 0.1, size=4)
        d = pm.ICAR.dist(W=W_LATTICE, sigma=sigma)
        np.testing.assert_allclose(
            float(pm.logp(d, v)),
            _icar_logp_np(v, W_LATTICE, sigma=sigma),
            rtol=1e-9,
        )

    def test_logp_zero_sum_stdev(self):
        v = np.array([0.05, 0.01, -0.02, 0.02])
        d = pm.ICAR.dist(W=W_LATTICE, zero_sum_stdev=0.1)
        np.testing.assert_allclose(
            float(pm.logp(d, v)),
            _icar_logp_np(v, W_LATTICE, zero_sum_stdev=0.1),
            rtol=1e-9,
        )

    def test_invalid_sigma_neg_inf(self):
        d = pm.ICAR.dist(W=W_LATTICE, sigma=-1.0)
        assert float(pm.logp(d, np.zeros(4))) == -np.inf

    @pytest.mark.parametrize(
        "W,msg",
        [
            (np.array([0, 1, 0, 0]), "W must be matrix with ndim=2"),
            (
                np.array([[0, 1, 0, 0], [1, 0, 0, 1], [1, 0, 0, 1]]),
                "W must be a square matrix",
            ),
            (
                np.array(
                    [[0, 1, 0, 0], [1, 0, 0, 1], [1, 0, 0, 1], [0, 1, 1, 0]]
                ),
                "W must be a symmetric matrix",
            ),
            (
                np.array(
                    [
                        [0, 1, 1, 0],
                        [1, 0, 0, 0.5],
                        [1, 0, 0, 1],
                        [0, 0.5, 1, 0],
                    ]
                ),
                "W must be composed of only 1s and 0s",
            ),
        ],
    )
    def test_matrix_checks(self, W, msg):
        with pytest.raises(ValueError, match=msg):
            pm.ICAR.dist(W=W)

    def test_rng_refused(self):
        d = pm.ICAR.dist(W=W_LATTICE)
        with pytest.raises(
            NotImplementedError, match="Cannot sample from ICAR prior"
        ):
            d.sample(jax.random.PRNGKey(0))

    def test_support_point_zeros_and_model_grad(self):
        with pm.Model() as m:
            phi = pm.ICAR("phi", W=W_LATTICE)
            pm.Normal("y", mu=phi, sigma=1.0, observed=np.zeros(4))
        ip = m.initial_point()
        np.testing.assert_array_equal(ip["phi"], np.zeros(4))
        val = m.compile_logp()(ip)
        grad = m.compile_dlogp()(ip)
        assert np.isfinite(val)
        assert all(np.all(np.isfinite(g)) for g in grad.values())


class TestCARValidity:
    def test_nonsymmetric_W_neg_inf(self):
        # reference test_car_matrix_check: symmetry is a density precondition
        W_bad = np.array(
            [
                [0.0, 1.0, 2.0, 0.0],
                [1.0, 0.0, 0.0, 1.0],
                [1.0, 0.0, 0.0, 1.0],
                [0.0, 1.0, 1.0, 0.0],
            ]
        )
        d = pm.CAR.dist(mu=np.zeros(4), W=W_bad, alpha=0.5, tau=2.0)
        x = np.random.default_rng(1).normal(size=4)
        assert float(pm.logp(d, x)) == -np.inf

    def test_W_ndim_check(self):
        with pytest.raises(TypeError, match="W must be a matrix"):
            pm.CAR.dist(
                mu=np.zeros(4),
                W=np.array([0.0, 1.0, 2.0, 0.0]),
                alpha=0.5,
                tau=2.0,
            )

    @pytest.mark.parametrize("alpha", [1.0, -1.0])
    def test_alpha_bounds_neg_inf(self, alpha):
        # reference test_car_alpha_bounds: -1 < alpha < 1 strictly
        W = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], dtype=float)
        d = pm.CAR.dist(mu=np.zeros(3), W=W, alpha=alpha, tau=1.0)
        assert float(pm.logp(d, np.array([-0.5, 0.0, 0.5]))) == -np.inf

    def test_valid_alpha_still_matches_dense_mvn(self):
        W = np.array(
            [[0, 1, 0, 1], [1, 0, 1, 0], [0, 1, 0, 1], [1, 0, 1, 0]],
            dtype=float,
        )
        alpha, tau = 0.7, 1.3
        D = np.diag(W.sum(-1))
        prec = tau * (D - alpha * W)
        cov = np.linalg.inv(prec)
        mu = np.array([0.1, -0.2, 0.3, 0.0])
        d = pm.CAR.dist(mu=mu, W=W, alpha=alpha, tau=tau)
        x = np.random.default_rng(2).normal(size=4)
        np.testing.assert_allclose(
            float(pm.logp(d, x)),
            st.multivariate_normal.logpdf(x, mu, cov),
            rtol=1e-8,
        )


class TestMvNormalBatchedDims:
    """Reference test_mvnormal_batched_dims: every (batch_mu, batch_cov,
    form) combination agrees with a scipy loop."""

    @pytest.mark.parametrize("batch_mu", [False, True])
    @pytest.mark.parametrize("batch_cov", [False, True])
    @pytest.mark.parametrize("form", ["cov", "chol", "tau"])
    def test_combinations(self, batch_mu, batch_cov, form):
        n, B = 3, 4
        rng = np.random.default_rng(7)
        covs = []
        for i in range(B if batch_cov else 1):
            A = rng.normal(size=(n, n))
            covs.append(A @ A.T + n * np.eye(n))
        cov_arr = np.stack(covs) if batch_cov else covs[0]
        mu = rng.normal(size=(B, n)) if batch_mu else rng.normal(size=n)
        kwargs = {}
        if form == "cov":
            kwargs["cov"] = cov_arr
        elif form == "chol":
            kwargs["chol"] = np.linalg.cholesky(cov_arr)
        else:
            kwargs["tau"] = np.linalg.inv(cov_arr)
        d = pm.MvNormal.dist(mu=mu, **kwargs)
        x = rng.normal(size=(B, n))
        ours = np.atleast_1d(np.asarray(pm.logp(d, x)))
        expected = [
            st.multivariate_normal.logpdf(
                x[i],
                mu[i] if batch_mu else mu,
                covs[i] if batch_cov else covs[0],
            )
            for i in range(B)
        ]
        np.testing.assert_allclose(ours, expected, rtol=1e-7)

    def test_indefinite_cov_neg_inf(self):
        # reference test_mvnormal_indef (errors at logp); XLA cannot raise,
        # so the invariant here is -inf (invalid params), never NaN
        cov = np.array([[1.0, 2.0], [2.0, 1.0]])  # eigenvalues 3, -1
        d = pm.MvNormal.dist(mu=np.zeros(2), cov=cov)
        lp = float(pm.logp(d, np.array([0.5, -0.5])))
        assert lp == -np.inf

    def test_scalar_mu_broadcast(self):
        # reference test_mvnormal_mu_convenience: scalar mu broadcasts over
        # the event dim
        cov = np.eye(3) * 2.0
        d = pm.MvNormal.dist(mu=1.5, cov=cov)
        x = np.array([1.0, 2.0, 0.5])
        np.testing.assert_allclose(
            float(pm.logp(d, x)),
            st.multivariate_normal.logpdf(x, 1.5 * np.ones(3), cov),
            rtol=1e-8,
        )


class TestMvStudentTBatchedDims:
    """Reference test_mvt_batched_dims across (batch_nu, batch_mu,
    batch_cov)."""

    @pytest.mark.parametrize("batch_nu", [False, True])
    @pytest.mark.parametrize("batch_mu", [False, True])
    @pytest.mark.parametrize("batch_cov", [False, True])
    def test_combinations(self, batch_nu, batch_mu, batch_cov):
        n, B = 3, 4
        rng = np.random.default_rng(11)
        covs = []
        for i in range(B if batch_cov else 1):
            A = rng.normal(size=(n, n))
            covs.append(A @ A.T + n * np.eye(n))
        cov_arr = np.stack(covs) if batch_cov else covs[0]
        mu = rng.normal(size=(B, n)) if batch_mu else rng.normal(size=n)
        nu = (
            np.array([3.0, 5.0, 7.0, 11.0]) if batch_nu else 4.0
        )
        d = pm.MvStudentT.dist(nu=nu, mu=mu, scale=cov_arr)
        x = rng.normal(size=(B, n))
        ours = np.atleast_1d(np.asarray(pm.logp(d, x)))
        expected = [
            st.multivariate_t.logpdf(
                x[i],
                mu[i] if batch_mu else mu,
                covs[i] if batch_cov else covs[0],
                df=nu[i] if batch_nu else nu,
            )
            for i in range(B)
        ]
        np.testing.assert_allclose(ours, expected, rtol=1e-7)


class TestVectorizedSimplexFamily:
    """Reference *_vectorized cases: extra sample-size dims on top of
    parameter batches, logp still matches a scipy loop elementwise."""

    @pytest.mark.parametrize(
        "a",
        [
            np.array([0.6, 1.3, 2.1]),
            np.array([[0.5, 1.0, 2.0], [3.0, 4.0, 0.7]]),
        ],
    )
    @pytest.mark.parametrize("extra_size", [(2,), (2, 3)])
    def test_dirichlet(self, a, extra_size):
        size = extra_size + a.shape[:-1]
        d = pm.Dirichlet.dist(a=a, size=size)
        vals = np.asarray(d.sample(jax.random.PRNGKey(0)))
        assert vals.shape == size + a.shape[-1:]
        ours = np.asarray(pm.logp(d, vals))
        flat_v = vals.reshape(-1, a.shape[-1])
        flat_a = np.broadcast_to(a, vals.shape).reshape(-1, a.shape[-1])
        expected = [
            st.dirichlet.logpdf(v / v.sum(), al)
            for v, al in zip(flat_v, flat_a)
        ]
        np.testing.assert_allclose(
            ours.ravel(), expected, rtol=2e-5
        )

    @pytest.mark.parametrize(
        "n,p",
        [
            (10, np.array([0.2, 0.3, 0.5])),
            (
                np.array([10, 11]),
                np.array([[0.2, 0.3, 0.5], [0.9, 0.09, 0.01]]),
            ),
            (
                np.array([[5, 6], [10, 11]]),
                _p3 := (lambda q: q / q.sum(-1, keepdims=True))(
                    np.abs(np.random.default_rng(0).normal(size=(2, 2, 4)))
                ),
            ),
        ],
    )
    @pytest.mark.parametrize("extra_size", [(2,), (2, 3)])
    def test_multinomial(self, n, p, extra_size):
        batch = np.broadcast_shapes(np.shape(n), p.shape[:-1])
        size = extra_size + batch
        d = pm.Multinomial.dist(n=n, p=p, size=size)
        vals = np.asarray(d.sample(jax.random.PRNGKey(1)))
        assert vals.shape == size + p.shape[-1:]
        ours = np.asarray(pm.logp(d, vals))
        nb = np.broadcast_to(n, vals.shape[:-1])
        pb = np.broadcast_to(p, vals.shape)
        flat = [
            st.multinomial.logpmf(v, int(ni), pi)
            for v, ni, pi in zip(
                vals.reshape(-1, p.shape[-1]),
                nb.ravel(),
                pb.reshape(-1, p.shape[-1]),
            )
        ]
        np.testing.assert_allclose(ours.ravel(), flat, rtol=1e-6)

    @pytest.mark.parametrize(
        "n,a",
        [
            (5, np.array([0.7, 1.4, 2.1])),
            (
                np.array([5, 9]),
                np.array([[0.5, 1.0, 2.0], [3.0, 4.0, 0.7]]),
            ),
        ],
    )
    @pytest.mark.parametrize("extra_size", [(2,), (3, 2)])
    def test_dirichlet_multinomial(self, n, a, extra_size):
        batch = np.broadcast_shapes(np.shape(n), a.shape[:-1])
        size = extra_size + batch
        d = pm.DirichletMultinomial.dist(n=n, a=a, size=size)
        vals = np.asarray(d.sample(jax.random.PRNGKey(2)))
        assert vals.shape == size + a.shape[-1:]
        ours = np.asarray(pm.logp(d, vals))
        nb = np.broadcast_to(n, vals.shape[:-1])
        ab = np.broadcast_to(a, vals.shape)
        flat = [
            st.dirichlet_multinomial.logpmf(v, al, int(ni))
            for v, ni, al in zip(
                vals.reshape(-1, a.shape[-1]),
                nb.ravel(),
                ab.reshape(-1, a.shape[-1]),
            )
        ]
        np.testing.assert_allclose(ours.ravel(), flat, rtol=1e-6)

    def test_stickbreaking_batched_alpha_matches_rows(self):
        alphas = np.array([0.5, 1.0, 2.0])
        K = 5
        d = pm.StickBreakingWeights.dist(alpha=alphas, K=K)
        vals = np.asarray(d.sample(jax.random.PRNGKey(3)))
        assert vals.shape == (3, K + 1)
        batched = np.asarray(pm.logp(d, vals))
        rows = [
            float(
                pm.logp(
                    pm.StickBreakingWeights.dist(alpha=float(a), K=K),
                    vals[i],
                )
            )
            for i, a in enumerate(alphas)
        ]
        np.testing.assert_allclose(batched, rows, rtol=1e-7)


class TestMultinomialSemantics:
    """Reference test_multinomial_* value/p edge semantics (:632-718)."""

    def test_invalid_value_rows(self):
        value = np.array([[1, 2, 2], [3, -1, 0]])
        d = pm.Multinomial.dist(n=5, p=np.ones(3) / 3)
        lp = np.asarray(pm.logp(d, value))
        assert np.isfinite(lp[0])
        assert lp[1] == -np.inf

    def test_wrong_total_neg_inf(self):
        d = pm.Multinomial.dist(n=5, p=np.ones(3) / 3)
        assert float(pm.logp(d, np.array([1, 1, 1]))) == -np.inf

    def test_negative_constant_p_raises(self):
        with pytest.raises(
            ValueError, match="Negative `p` parameters are not valid"
        ):
            pm.Multinomial.dist(n=5, p=[-1, 1, 1])

    def test_p_not_normalized_warns_and_rescales(self):
        with pytest.warns(UserWarning, match="automatically rescaled"):
            d = pm.Multinomial.dist(n=5, p=[1, 1, 1, 1, 1])
        lp = float(pm.logp(d, np.array([1, 1, 1, 1, 1])))
        expected = st.multinomial.logpmf(
            np.ones(5, dtype=int), 5, np.ones(5) / 5
        )
        np.testing.assert_allclose(lp, expected, rtol=1e-7)

    def test_symbolic_negative_p_neg_inf(self):
        # reference: symbolic invalid p is a ParameterValueError at logp
        # eval; the XLA-safe analogue is -inf
        with pm.Model() as m:
            x = pm.Flat("x")
            y = pm.Multinomial("y", n=1, p=pm.math.stack([x, x, x]))
        lp = m.compile_logp()(
            {"x": -1.0 / 3.0, "y": np.array([1, 0, 0])}
        )
        assert float(lp) == -np.inf

    def test_symbolic_p_not_normalized_neg_inf(self):
        with pm.Model() as m:
            x = pm.Flat("x")
            y = pm.Multinomial("y", n=1, p=pm.math.stack([x, x, x]))
        lp = m.compile_logp()({"x": 0.5, "y": np.array([1, 0, 0])})
        assert float(lp) == -np.inf

    def test_zero_probs(self):
        d = pm.Multinomial.dist(n=100, p=[0.0, 0.0, 1.0])
        assert float(pm.logp(d, np.array([0, 0, 100]))) >= 0.0
        assert float(pm.logp(d, np.array([50, 50, 0]))) == -np.inf


class TestDirichletMultinomialSemantics:
    def test_matches_beta_binomial(self):
        # reference test_dirichlet_multinomial_matches_beta_binomial: at
        # K=2, DM(n, [a, b]) marginal of the first count is BetaBin(n, a, b)
        n, a, b = 8, 1.7, 2.4
        dm = pm.DirichletMultinomial.dist(n=n, a=np.array([a, b]))
        bb = pm.BetaBinomial.dist(n=n, alpha=a, beta=b)
        for x in range(n + 1):
            np.testing.assert_allclose(
                float(pm.logp(dm, np.array([x, n - x]))),
                float(pm.logp(bb, x)),
                rtol=1e-7,
            )

    def test_invalid(self):
        d = pm.DirichletMultinomial.dist(n=5, a=np.array([1.0, 2.0, 3.0]))
        assert float(pm.logp(d, np.array([1, 1, 1]))) == -np.inf  # sum != n
        assert float(pm.logp(d, np.array([-1, 3, 3]))) == -np.inf
        d_bad = pm.DirichletMultinomial.dist(
            n=5, a=np.array([-1.0, 2.0, 3.0])
        )
        assert float(pm.logp(d_bad, np.array([1, 2, 2]))) == -np.inf


class TestDirichletSemantics:
    def test_invalid_alpha_neg_inf(self):
        d = pm.Dirichlet.dist(a=np.array([-1.0, 1.0, 2.0]))
        v = np.array([0.2, 0.3, 0.5])
        assert float(pm.logp(d, v)) == -np.inf


class TestZeroSumNormalDepth:
    def test_marginal_variance(self):
        # reference test_zsn_variance: marginal var = sigma^2 (n-1)/n
        sigma, n = 2.0, 5
        d = pm.ZeroSumNormal.dist(sigma=sigma, shape=(n,))
        draws = np.asarray(
            d.sample(jax.random.PRNGKey(0), sample_shape=(40000,))
        )
        np.testing.assert_allclose(
            draws.var(axis=0),
            sigma**2 * (n - 1) / n,
            rtol=0.05,
        )

    def test_two_axis_draws_sum_to_zero_each_axis(self):
        d = pm.ZeroSumNormal.dist(n_zerosum_axes=2, shape=(4, 6))
        draws = np.asarray(
            d.sample(jax.random.PRNGKey(1), sample_shape=(32,))
        )
        np.testing.assert_allclose(draws.sum(axis=-1), 0.0, atol=1e-5)
        np.testing.assert_allclose(draws.sum(axis=-2), 0.0, atol=1e-5)

    def test_per_axis_constraint_gate(self):
        # zero grand total but nonzero row sums must be OFF support
        d = pm.ZeroSumNormal.dist(n_zerosum_axes=2, shape=(2, 2))
        bad = np.array([[1.0, 1.0], [-1.0, -1.0]])  # cols sum 0, rows don't
        assert float(pm.logp(d, bad)) == -np.inf
        good = np.array([[1.0, -1.0], [-1.0, 1.0]])
        assert np.isfinite(float(pm.logp(d, good)))

    def test_logp_matches_subspace_mvn_two_axes(self):
        # density wrt the isometric representation: for a value on the
        # constraint surface, logp = -||v||^2/(2 s^2) - f*(log s + log(2pi)/2)
        # with f = (n1-1)(n2-1) free dims
        sigma = 1.7
        d = pm.ZeroSumNormal.dist(sigma=sigma, n_zerosum_axes=2, shape=(3, 4))
        v = np.asarray(d.sample(jax.random.PRNGKey(2)))
        f = (3 - 1) * (4 - 1)
        expected = (
            -0.5 * np.sum((v / sigma) ** 2)
            - f * (np.log(sigma) + 0.5 * np.log(2 * np.pi))
        )
        np.testing.assert_allclose(float(pm.logp(d, v)), expected, rtol=1e-6)
