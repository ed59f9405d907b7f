"""GP covariance depth battery porting the remaining reference case
inventory (reference tests/gp/test_cov.py: matrix operands in cov algebra,
PSD-of-combination contracts, exponentiation validation, Kron multiops,
numerical stability at large inputs, handle_args, Coregion contracts, and
the full-shape sweep). Oracles are computed with numpy, not pinned."""

import numpy as np
import numpy.testing as npt
import pytest
import jax.numpy as jnp

import pymc_tpu as pm
from pymc_tpu.gp import cov as gpc

X10 = np.linspace(0, 1, 10)[:, None]


def _k(cov, X, Xs=None, diag=False):
    return np.asarray(cov(X, Xs, diag=diag))


def _expquad_np(X, ls, Xs=None):
    Xs = X if Xs is None else Xs
    d2 = ((X[:, None, :] - Xs[None, :, :]) ** 2).sum(-1)
    return np.exp(-0.5 * d2 / ls**2)


class TestCovAlgebraOperands:
    def test_rightadd_matrix(self):
        M = 2 * np.ones((10, 10))
        cov = gpc.ExpQuad(1, 0.1) + M
        K = _k(cov, X10)
        npt.assert_allclose(K, _expquad_np(X10, 0.1) + M, atol=1e-6)
        npt.assert_allclose(np.diag(K), _k(cov, X10, diag=True), atol=1e-6)

    def test_leftadd_matrix_commutes(self):
        M = np.array([[1.0, 2, 3], [2, 1, 2], [3, 2, 1]])
        X = np.linspace(0, 1, 3)[:, None]
        K1 = _k(M + gpc.ExpQuad(1, 0.1), X)
        K2 = _k(gpc.ExpQuad(1, 0.1) + M, X)
        npt.assert_allclose(K1, K2, atol=1e-12)

    def test_rightprod_matrix(self):
        M = np.full((10, 10), 2.0)
        K1 = _k(gpc.ExpQuad(1, 0.1) * M, X10)
        K2 = _k(2.0 * gpc.ExpQuad(1, 0.1), X10)
        npt.assert_allclose(K1, K2, atol=1e-12)
        npt.assert_allclose(
            np.diag(K1), _k(gpc.ExpQuad(1, 0.1) * M, X10, diag=True),
            atol=1e-12)

    def test_symbolic_matrix_operand(self):
        # a model-graph node as the matrix operand (reference pt.ones case)
        with pm.Model():
            c = pm.Deterministic("M", pm.math.ones((10, 10)) * 2.0)
            cov = c + gpc.ExpQuad(1, 0.1)
            K = np.asarray(pm.draw(cov(X10)))
        npt.assert_allclose(K, _expquad_np(X10, 0.1) + 2.0, atol=1e-6)

    def test_invalid_3d_operand_raises(self):
        M = np.random.randn(2, 2, 2)
        with pytest.raises(ValueError, match="cannot combine"):
            M + gpc.ExpQuad(1, 1.0)
        with pytest.raises(ValueError, match="cannot combine"):
            gpc.ExpQuad(1, 1.0) * M

    def test_multiops_nested(self):
        # reference TestCovProd.test_multiops
        X = np.linspace(0, 1, 3)[:, None]
        M = np.array([[1.0, 2, 3], [2, 1, 2], [3, 2, 1]])
        cov1 = 3 + gpc.ExpQuad(1, 0.1) + M * gpc.ExpQuad(1, 0.1) * M * \
            gpc.ExpQuad(1, 0.1)
        base = _expquad_np(X, 0.1)
        expected = 3 + base + M * base * M * base
        npt.assert_allclose(_k(cov1, X), expected, atol=1e-6)
        npt.assert_allclose(
            np.diag(expected), _k(cov1, X, diag=True), atol=1e-6)

    def test_rightadd_whitenoise(self):
        cov = gpc.ExpQuad(1, 0.1) + gpc.WhiteNoise(sigma=1.0)
        K = _k(cov, X10)
        base = _expquad_np(X10, 0.1)
        npt.assert_allclose(K[0, 1], base[0, 1], atol=1e-6)
        npt.assert_allclose(K[0, 0], 2.0, atol=1e-6)
        npt.assert_allclose(np.diag(K), _k(cov, X10, diag=True), atol=1e-6)


class TestCovPSDContracts:
    omega = (np.pi * np.arange(1, 101) / 20.0)[:, None]

    def test_psd_of_sum_is_sum(self):
        cov1 = 2 * gpc.ExpQuad(1, 0.1)
        cov2 = 5 * gpc.ExpQuad(1, 1.0)
        s1 = np.asarray(cov1.power_spectral_density(self.omega))
        s2 = np.asarray(cov2.power_spectral_density(self.omega))
        s = np.asarray((cov1 + cov2).power_spectral_density(self.omega))
        npt.assert_allclose(s, s1 + s2, rtol=1e-12)

    def test_psd_of_product_raises(self):
        cov = (2 * gpc.ExpQuad(1, 1.0)) * gpc.ExpQuad(1, 1.0)
        with pytest.raises(NotImplementedError,
                           match="power spectral density of products"):
            cov.power_spectral_density(self.omega)

    def test_psd_nonstationary_raises(self):
        cov = 2 * gpc.Linear(1, c=5)
        with pytest.raises(ValueError,
                           match="`Stationary` covariance functions"):
            cov.power_spectral_density(self.omega)

    def test_psd_sum_with_constant_raises(self):
        # reference raises here too (with an input_dim message caused by a
        # Constant quirk); the honest reason is that a constant offset has
        # no density, so we raise the Stationary ValueError instead
        cov = 2 * gpc.ExpQuad(1, ls=1) + 10.0
        with pytest.raises(ValueError):
            cov.power_spectral_density(self.omega)

    def test_psd_unimplemented_stationary_raises(self):
        class NewStationaryCov(gpc.Stationary):
            def _full(self, X, Xs, ls):
                raise AssertionError("unused")

        cov = 2 * NewStationaryCov(1, ls=1)
        with pytest.raises(NotImplementedError,
                           match="No power spectral density method"):
            cov.power_spectral_density(self.omega)


class TestCovExponentiation:
    def test_symexp_matches_numpy(self):
        base = _expquad_np(X10, 0.1)
        for exponent in (2, 2.0, np.float64(2.0)):
            K = _k(gpc.ExpQuad(1, 0.1) ** exponent, X10)
            npt.assert_allclose(K, base**2.0, atol=1e-6)
        cov = gpc.ExpQuad(1, 0.1) ** 2
        npt.assert_allclose(
            np.diag(_k(cov, X10)), _k(cov, X10, diag=True), atol=1e-6)

    def test_symbolic_exponent(self):
        with pm.Model():
            e = pm.Deterministic("e", pm.math.ones(()) * 2.0)
            K = np.asarray(pm.draw((gpc.ExpQuad(1, 0.1) ** e)(X10)))
        npt.assert_allclose(K, _expquad_np(X10, 0.1) ** 2.0, atol=1e-6)

    def test_invalid_array_exponent_raises(self):
        with pytest.raises(ValueError, match="scalar value"):
            gpc.ExpQuad(1, 0.1) ** np.array([[1.0, 2.0]])

    def test_constant_exponentiation_raises(self):
        with pytest.raises(TypeError, match="inherit from `Covariance`"):
            gpc.Constant(2) ** 2


def _cartesian(*arrays):
    grids = np.meshgrid(*[a.ravel() for a in arrays], indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=-1)


class TestCovKronDepth:
    def test_kron_multiops(self):
        X1 = np.linspace(0, 1, 3)[:, None]
        X21 = np.linspace(0, 1, 5)[:, None]
        X22 = np.linspace(0, 1, 4)[:, None]
        X2 = _cartesian(X21, X22)
        X = _cartesian(X1, X21, X22)
        cov1 = (
            3
            + gpc.ExpQuad(1, 0.1)
            + gpc.ExpQuad(1, 0.1) * gpc.ExpQuad(1, 0.1)
        )
        cov2 = gpc.ExpQuad(2, 0.1) * gpc.ExpQuad(2, 0.1)
        cov = gpc.Kron([cov1, cov2])
        K_true = np.kron(_k(cov1, X1), _k(cov2, X2))
        npt.assert_allclose(_k(cov, X), K_true, atol=1e-6)
        npt.assert_allclose(
            np.diag(K_true), _k(cov, X, diag=True), atol=1e-6)


class TestStability:
    def test_stable_large_inputs(self):
        rng = np.random.default_rng(0)
        X = rng.uniform(low=320.0, high=400.0, size=(500, 2))
        K = _k(gpc.ExpQuad(2, 0.1), X)
        assert np.isfinite(K).all()
        d = _k(gpc.ExpQuad(2, 0.1), X, diag=True)
        assert np.isfinite(d).all()


class TestHandleArgs:
    def test_handleargs(self):
        def func_noargs(x):
            return x

        def func_onearg(x, a):
            return x + a

        def func_twoarg(x, a, b):
            return x + a + b

        x, a, b = 100, 2, 3
        assert gpc.handle_args(func_noargs)(x, args=None) == func_noargs(x)
        assert gpc.handle_args(func_onearg)(x, args=a) == func_onearg(x, a)
        assert gpc.handle_args(func_twoarg)(x, args=(a, b)) == \
            func_twoarg(x, a, b)


class TestCoregionDepth:
    nrows, ncols = 6, 3
    rng = np.random.default_rng(7)
    W = rng.random((nrows, ncols))
    kappa = rng.random(nrows)
    B = W @ W.T + np.diag(kappa)
    rand_rows = rng.integers(0, nrows, size=(20, 1))
    rand_cols = rng.integers(0, ncols, size=(10, 1))
    X = np.concatenate([rand_rows, rng.random((20, 1))], axis=1)
    Xs = np.concatenate([rand_cols, rng.random((10, 1))], axis=1)

    def test_full_wk(self):
        cov = gpc.Coregion(2, W=self.W, kappa=self.kappa, active_dims=[0])
        npt.assert_allclose(
            _k(cov, np.array([[2, 1.5], [3, -42]])), self.B[2:4, 2:4],
            atol=1e-12)
        npt.assert_allclose(
            _k(cov, self.X), self.B[self.rand_rows, self.rand_rows.T],
            atol=1e-12)

    def test_full_b(self):
        cov = gpc.Coregion(1, B=self.B)
        npt.assert_allclose(
            _k(cov, np.array([[2], [3]])), self.B[2:4, 2:4], atol=1e-12)

    def test_cross(self):
        cov = gpc.Coregion(2, W=self.W, kappa=self.kappa, active_dims=[0])
        npt.assert_allclose(
            _k(cov, self.X, self.Xs),
            self.B[self.rand_rows, self.rand_cols.T], atol=1e-12)

    def test_diag(self):
        cov = gpc.Coregion(2, W=self.W, kappa=self.kappa, active_dims=[0])
        npt.assert_allclose(
            _k(cov, self.X, diag=True),
            np.diag(self.B)[self.rand_rows.ravel()], atol=1e-12)

    def test_raises_two_active_dims(self):
        with pytest.raises(ValueError, match="one active dimension"):
            gpc.Coregion(2, W=self.W, kappa=self.kappa)

    def test_raises_both_parameterizations(self):
        with pytest.raises(ValueError, match="not both"):
            gpc.Coregion(1, W=self.W, kappa=self.kappa, B=self.B)

    def test_raises_neither(self):
        with pytest.raises(ValueError, match="B or"):
            gpc.Coregion(1)


@pytest.mark.parametrize(
    "kernel,args",
    [
        ("Constant", (1.0,)),
        ("WhiteNoise", (1.0,)),
        ("ExpQuad", (1, 1.0)),
        ("RatQuad", (1, 1.0, 1.0)),
        ("Exponential", (1, 1.0)),
        ("Matern12", (1, 1.0)),
        ("Matern32", (1, 1.0)),
        ("Matern52", (1, 1.0)),
        ("Periodic", (1, 1.0, 1.0)),
        ("Circular", (1, 1.0)),
        ("Linear", (1, 1.0)),
        ("Cosine", (1, 1.0)),
        ("Polynomial", (1, 1.0, 1.0, 1.0)),
    ],
)
def test_full_shape_and_symmetry(kernel, args):
    cov = getattr(gpc, kernel)(*args)
    K = _k(cov, X10)
    assert K.shape == (10, 10)
    npt.assert_allclose(K, K.T, atol=1e-10)
    npt.assert_allclose(np.diag(K), _k(cov, X10, diag=True), atol=1e-6)
    Kc = _k(cov, X10, X10[:5])
    assert Kc.shape == (10, 5)


def test_full_shape_wrapped_and_gibbs():
    cov = gpc.WrappedPeriodic(gpc.ExpQuad(1, 1.0), period=1.0)
    assert _k(cov, X10).shape == (10, 10)
    cov = gpc.Gibbs(1, lambda x: jnp.ones(x.shape))
    assert _k(cov, X10).shape == (10, 10)
