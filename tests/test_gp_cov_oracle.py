"""GP covariance kernel oracle tests.

Every etalon value here is copied from the REFERENCE's own test suite
(/root/reference/tests/gp/test_cov.py) so the kernels are checked against the
reference's semantics, not our own implementation: K[0,1] spot values on
X = linspace grids, diag consistency, active_dims slicing (including repeated
indices), kernel algebra, and PSD closed forms.
"""

import numpy as np
import jax.numpy as jnp
import numpy.testing as npt
import pytest

import pymc_tpu as pm
from pymc_tpu.gp import cov as gpc

X10 = np.linspace(0, 1, 10)[:, None]


def _k(cov, X, Xs=None, diag=False):
    return np.asarray(cov(X, Xs, diag=diag))


class TestStationaryOracles:
    """Reference tests/gp/test_cov.py:583-671 1-d spot values."""

    @pytest.mark.parametrize(
        "make,expected",
        [
            (lambda: gpc.ExpQuad(1, 0.1), 0.53940),
            (lambda: gpc.ExpQuad(1, ls_inv=10), 0.53940),
            (lambda: gpc.RatQuad(1, ls=0.1, alpha=0.5), 0.66896),
            (lambda: gpc.Exponential(1, 0.1), 0.57375),
            (lambda: gpc.Matern52(1, 0.1), 0.46202),
            (lambda: gpc.Matern32(1, 0.1), 0.42682),
            (lambda: gpc.Matern12(1, 0.1), 0.32919),
            (lambda: gpc.Cosine(1, 0.1), 0.766),
            (lambda: gpc.Periodic(1, 0.1, 0.1), 0.00288),
            (lambda: gpc.Linear(1, 0.5), 0.19444),
            (lambda: gpc.Polynomial(1, 0.5, 2, 0), 0.03780),
        ],
    )
    def test_k01(self, make, expected):
        cov = make()
        K = _k(cov, X10)
        npt.assert_allclose(K[0, 1], expected, atol=1e-3)
        npt.assert_allclose(_k(cov, X10, X10)[0, 1], expected, atol=1e-3)
        npt.assert_allclose(np.diag(K), _k(cov, X10, diag=True), atol=1e-5)

    def test_expquad_2d(self):
        X = np.linspace(0, 1, 10).reshape(5, 2)
        npt.assert_allclose(_k(gpc.ExpQuad(2, 0.5), X)[0, 1], 0.820754,
                            atol=1e-3)

    def test_expquad_2d_ard(self):
        X = np.linspace(0, 1, 10).reshape(5, 2)
        npt.assert_allclose(
            _k(gpc.ExpQuad(2, np.array([1, 2])), X)[0, 1], 0.969607, atol=1e-3
        )

    def test_psd_matern(self):
        omega = np.linspace(0, 2, 50)
        ell = 2.0
        lam = np.sqrt(5) / ell
        true_psd = (16.0 / 3.0) * lam**5 * (lam**2 + omega**2) ** -3
        got = np.asarray(
            gpc.Matern52(1, ls=ell).power_spectral_density(omega[:, None])
        ).flatten()
        npt.assert_allclose(true_psd, got, atol=1e-5)
        lam = np.sqrt(3) / ell
        true_psd = 4 * lam**3 * (lam**2 + omega**2) ** -2
        got = np.asarray(
            gpc.Matern32(1, ls=ell).power_spectral_density(omega[:, None])
        ).flatten()
        npt.assert_allclose(true_psd, got, atol=1e-5)

    def test_psd_periodic_coeffs(self):
        from scipy.special import iv

        ell, m = 2.0, 5
        a = 1 / ell**2
        J = np.arange(m)
        true_coeffs = np.where(J > 0, 2, 1) * iv(J, a) / np.exp(a)
        got = np.asarray(
            gpc.Periodic(1, period=0.1, ls=ell).power_spectral_density_approx(m)
        ).flatten()
        npt.assert_allclose(true_coeffs, got, atol=1e-5)


class TestSliceDims:
    """Reference TestCovSliceDim — active_dims indexing, incl. repeats."""

    def test_repeated_active_dims(self):
        X = np.linspace(0, 1, 30).reshape(10, 3)
        K = _k(gpc.ExpQuad(3, 0.1, active_dims=[0, 0, 1]), X)
        npt.assert_allclose(K[0, 1], 0.20084298, atol=1e-3)

    def test_subset_active_dims(self):
        X = np.linspace(0, 1, 30).reshape(10, 3)
        cov = gpc.ExpQuad(3, ls=[0.1, 0.1], active_dims=[1, 2])
        K = _k(cov, X)
        npt.assert_allclose(K[0, 1], 0.34295549, atol=1e-3)
        npt.assert_allclose(np.diag(K), _k(cov, X, diag=True), atol=1e-5)

    def test_different_slices_combined(self):
        X = np.linspace(0, 1, 30).reshape(10, 3)
        cov = gpc.ExpQuad(3, ls=0.1, active_dims=[1, 0, 0]) + gpc.ExpQuad(
            3, ls=[0.1, 0.2, 0.3]
        )
        npt.assert_allclose(_k(cov, X)[0, 1], 0.683572, atol=1e-3)

    def test_active_dims_out_of_range_raises(self):
        with pytest.raises(ValueError):
            gpc.ExpQuad(2, 1.0, active_dims=[0, 3])


class TestAlgebraOracles:
    """Reference TestCovAdd/TestCovProd/TestCovExponentiation values."""

    def test_add_scalar(self):
        npt.assert_allclose(
            _k(gpc.ExpQuad(1, 0.1) + 1.0, X10)[0, 1], 1.53940, atol=1e-3
        )
        npt.assert_allclose(
            _k(1.0 + gpc.ExpQuad(1, 0.1), X10)[0, 1], 1.53940, atol=1e-3
        )

    def test_add_covs(self):
        npt.assert_allclose(
            _k(gpc.ExpQuad(1, 0.1) + gpc.ExpQuad(1, 0.1), X10)[0, 1],
            2 * 0.53940,
            atol=1e-3,
        )

    def test_prod(self):
        npt.assert_allclose(
            _k(gpc.ExpQuad(1, 0.1) * gpc.ExpQuad(1, 0.1), X10)[0, 1],
            0.53940**2,
            atol=1e-3,
        )
        npt.assert_allclose(
            _k(2.0 * gpc.ExpQuad(1, 0.1), X10)[0, 1], 2 * 0.53940, atol=1e-3
        )

    def test_pow(self):
        npt.assert_allclose(
            _k(gpc.ExpQuad(1, 0.1) ** 2, X10)[0, 1], 0.53940**2, atol=1e-3
        )
        npt.assert_allclose(
            _k(gpc.Exponentiated(gpc.ExpQuad(1, 0.1), 2), X10)[0, 1],
            0.53940**2,
            atol=1e-3,
        )

    def test_whitenoise_cross_is_zero(self):
        cov = gpc.WhiteNoise(0.5)
        K = _k(cov, X10)
        npt.assert_allclose(K, 0.25 * np.eye(10), atol=1e-8)
        npt.assert_allclose(_k(cov, X10, X10 + 2.0), np.zeros((10, 10)),
                            atol=1e-8)

    def test_constant(self):
        K = _k(gpc.Constant(2.5), X10)
        npt.assert_allclose(K, np.full((10, 10), 2.5), atol=1e-8)


class TestWrappedKernels:
    def test_warped_input(self):
        # reference TestWarpedInput: x + tanh-step warp into Matern52
        def warp_func(x, a, b, c):
            return x + a * jnp.tanh(b * (x - c))

        cov = gpc.WarpedInput(
            1, cov_func=gpc.Matern52(1, 0.2), warp_func=warp_func,
            args=(1, 10, 1),
        )
        K = _k(cov, X10)
        npt.assert_allclose(K[0, 1], 0.79593, atol=1e-3)
        npt.assert_allclose(_k(cov, X10, X10)[0, 1], 0.79593, atol=1e-3)
        npt.assert_allclose(np.diag(K), _k(cov, X10, diag=True), atol=1e-5)

    def test_gibbs(self):
        X = np.linspace(0, 2, 10)[:, None]

        def tanh_func(x, x1, x2, w, x0):
            return (x1 + x2) / 2.0 - (x1 - x2) / 2.0 * jnp.tanh((x - x0) / w)

        cov = gpc.Gibbs(1, tanh_func, args=(0.05, 0.6, 0.4, 1.0))
        K = _k(cov, X)
        npt.assert_allclose(K[2, 3], 0.136683, atol=1e-4)
        npt.assert_allclose(_k(cov, X, X)[2, 3], 0.136683, atol=1e-4)

    def test_scaled_cov(self):
        def scaling_func(x, a, b):
            return a + b * x

        cov = gpc.ScaledCov(
            1, cov_func=gpc.Matern52(1, 0.2), scaling_func=scaling_func,
            args=(2, -1),
        )
        K = _k(cov, X10)
        npt.assert_allclose(K[0, 1], 3.00686, atol=1e-3)
        npt.assert_allclose(np.diag(K), _k(cov, X10, diag=True), atol=1e-5)

    def test_circular(self):
        npt.assert_allclose(_k(gpc.Circular(1, 1, tau=5), X10)[0, 1],
                            0.600881, atol=1e-3)
        npt.assert_allclose(_k(gpc.Circular(1, 1, tau=4), X10)[0, 1],
                            0.691239, atol=1e-3)

    def test_wrapped_periodic_equals_periodic(self):
        # reference TestWrappedPeriodic: WrappedPeriodic(ExpQuad(ls), p) ==
        # Periodic(ls, p) exactly
        cov1 = gpc.Periodic(1, ls=0.2, period=1)
        cov2 = gpc.WrappedPeriodic(gpc.ExpQuad(1, ls=0.2), period=1)
        npt.assert_allclose(_k(cov1, X10), _k(cov2, X10), atol=1e-3)
        npt.assert_allclose(_k(cov1, X10, diag=True),
                            _k(cov2, X10, diag=True), atol=1e-3)

    def test_wrapped_periodic_requires_stationary(self):
        with pytest.raises(TypeError):
            gpc.WrappedPeriodic(gpc.Linear(1, c=1), period=1)


class TestCoregionOracle:
    def setup_method(self):
        rng = np.random.default_rng(42)
        self.W = rng.random((6, 3))
        self.kappa = rng.random(6)
        self.B = self.W @ self.W.T + np.diag(self.kappa)
        self.rows = rng.integers(0, 6, size=(20, 1))
        self.cols = rng.integers(0, 3, size=(10, 1))
        self.X = np.concatenate([self.rows, rng.random((20, 1))], axis=1)
        self.Xs = np.concatenate([self.cols, rng.random((10, 1))], axis=1)

    def test_full_wk(self):
        cov = gpc.Coregion(2, W=self.W, kappa=self.kappa, active_dims=[0])
        npt.assert_allclose(
            _k(cov, np.array([[2, 1.5], [3, -42]])), self.B[2:4, 2:4],
            rtol=1e-6,
        )
        npt.assert_allclose(_k(cov, self.X),
                            self.B[self.rows, self.rows.T], rtol=1e-6)

    def test_full_b(self):
        cov = gpc.Coregion(1, B=self.B)
        npt.assert_allclose(_k(cov, np.array([[2], [3]])), self.B[2:4, 2:4],
                            rtol=1e-6)

    def test_cross(self):
        cov = gpc.Coregion(2, W=self.W, kappa=self.kappa, active_dims=[0])
        npt.assert_allclose(_k(cov, self.X, self.Xs),
                            self.B[self.rows, self.cols.T], rtol=1e-6)


class TestKronOracle:
    def test_kron_factorizes(self):
        # K((x1,x2),(y1,y2)) = K1(x1,y1) * K2(x2,y2)
        rng = np.random.default_rng(0)
        X1 = rng.random((4, 1))
        X2 = rng.random((3, 2))
        k1 = gpc.ExpQuad(1, 0.5)
        k2 = gpc.Matern32(2, 0.8)
        kron = gpc.Kron([k1, k2])
        # build the product grid (row-major: x1 varies slowest)
        Xg = np.array([np.concatenate([a, b]) for a in X1 for b in X2])
        K = _k(kron, Xg)
        expected = np.kron(np.asarray(k1.full(X1)), np.asarray(k2.full(X2)))
        npt.assert_allclose(K, expected, rtol=1e-6)


class TestPsdMatrices:
    """Every kernel must produce a PSD Gram matrix on random inputs."""

    @pytest.mark.parametrize(
        "make",
        [
            lambda: gpc.ExpQuad(2, [0.3, 0.9]),
            lambda: gpc.RatQuad(2, ls=0.5, alpha=2.0),
            lambda: gpc.Matern52(2, 0.4),
            lambda: gpc.Matern32(2, 0.4),
            lambda: gpc.Matern12(2, 0.4),
            lambda: gpc.Periodic(2, period=1.3, ls=0.6),
            lambda: gpc.Linear(2, c=0.2),
            lambda: gpc.Polynomial(2, c=0.2, d=3, offset=0.5),
            lambda: gpc.Circular(1, period=2.0, tau=4),
            lambda: gpc.ExpQuad(2, 0.5) * gpc.Matern32(2, 1.0)
            + gpc.WhiteNoise(0.1),
        ],
    )
    def test_psd(self, make):
        rng = np.random.default_rng(7)
        cov = make()
        X = rng.random((25, cov.input_dim))
        K = _k(cov, X)
        npt.assert_allclose(K, K.T, atol=1e-10)
        w = np.linalg.eigvalsh(K)
        assert w.min() > -1e-8, w.min()
