"""pm.math API: Node-aware numpy-style passthroughs + special functions.

Oracle: scipy/numpy (reference pymc/math.py re-exports pytensor.tensor and
scipy equivalents; here everything lowers to one jnp expression).
"""
import numpy as np
import pytest

import jax
import pymc_tpu as pm

M = pm.math


class TestPassthroughs:
    def test_linalg(self):
        A = np.array([[4.0, 1.0], [1.0, 3.0]])
        L = np.linalg.cholesky(A)
        np.testing.assert_allclose(np.asarray(M.cholesky(A)), L, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(M.solve_triangular(L, np.ones(2), lower=True)),
            np.linalg.solve(L, np.ones(2)), rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(M.cho_solve((L, True), np.ones(2))),
            np.linalg.solve(A, np.ones(2)), rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(M.slogdet(A)[1]), np.linalg.slogdet(A)[1], rtol=1e-6
        )

    def test_kron_solve_matches_dense(self):
        rng = np.random.default_rng(0)
        A = np.array([[4.0, 1.0], [1.0, 3.0]])
        B = np.array([[2.0, 0.5], [0.5, 1.0]])
        L1, L2 = np.linalg.cholesky(A), np.linalg.cholesky(B)
        b = rng.normal(size=4)
        got = np.asarray(M.kron_solve_lower([L1, L2], b)).ravel()
        np.testing.assert_allclose(
            got, np.linalg.solve(np.kron(L1, L2), b), rtol=1e-6
        )

    def test_node_aware(self):
        with pm.Model():
            x = pm.Normal("x", 0, 1, shape=(4,))
            d = pm.Deterministic("d", M.sort(M.sqr(x)))
        from pymc_tpu.graph import evaluate

        v = np.array([3.0, -1.0, 2.0, 0.0])
        np.testing.assert_allclose(
            np.asarray(evaluate(d, {"x": v})), np.sort(v**2), rtol=1e-6
        )

    def test_as_tensor(self):
        with pm.Model():
            x = pm.Normal("x", 0, 1)
        assert M.as_tensor(x) is x
        assert M.as_tensor([1.0, 2.0]).shape == (2,)


class TestBessel:
    @pytest.mark.parametrize("v", [0.0, 0.5, 1.5, 2.0, 3.7, -0.5, -2.3])
    def test_iv_kv_match_scipy(self, v):
        from scipy import special as sp

        xs = np.array([0.1, 0.5, 1.0, 3.0, 8.0, 15.0, 24.0, 26.0, 40.0])
        np.testing.assert_allclose(
            np.asarray(M.iv(v, xs)), sp.iv(v, xs), rtol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(M.kv(v, xs)), sp.kv(v, xs), rtol=1e-10
        )

    def test_edge_cases(self):
        from scipy import special as sp

        assert float(np.asarray(M.iv(0.0, 0.0))) == 1.0
        assert float(np.asarray(M.iv(1.5, 0.0))) == 0.0
        assert np.isinf(float(np.asarray(M.kv(1.5, 0.0))))
        # large-x: quadrature step scales with 1/sqrt(x)
        got = float(np.asarray(M.kv(1.5, 600.0)))
        np.testing.assert_allclose(got, sp.kv(1.5, 600.0), rtol=1e-10)

    def test_kv_gradient(self):
        from scipy import special as sp
        from pymc_tpu.ops.special import bessel_kv

        g = jax.grad(lambda x: bessel_kv(1.5, x))(2.0)
        exact = -(sp.kv(0.5, 2.0) + sp.kv(2.5, 2.0)) / 2.0
        np.testing.assert_allclose(float(g), exact, rtol=1e-8)

    def test_gamma_negative(self):
        from scipy import special as sp

        for z in (4.7, -1.5, -2.5, 0.3):
            np.testing.assert_allclose(
                float(np.asarray(M.gamma(z))), sp.gamma(z), rtol=1e-6
            )


class TestReferenceMathOracles:
    """Mirrors reference tests/test_math.py contracts: cartesian,
    probit/invprobit, logdiffexp edge cases, logdet, expand_packed_triangular."""

    def test_cartesian(self):
        manual = np.array(
            [[1, 0, 5], [1, 0, 6], [1, 2, 5], [1, 2, 6],
             [2, 0, 5], [2, 0, 6], [2, 2, 5], [2, 2, 6],
             [3, 0, 5], [3, 0, 6], [3, 2, 5], [3, 2, 6]]
        )
        np.testing.assert_array_equal(
            np.asarray(pm.math.cartesian([1, 2, 3], [0, 2], [5, 6])), manual
        )

    def test_cartesian_2d(self):
        manual = np.array(
            [[1, 2, 5, 0], [1, 2, 6, 0], [3, 4, 5, 0], [3, 4, 6, 0]]
        )
        np.testing.assert_array_equal(
            np.asarray(pm.math.cartesian([[1, 2], [3, 4]], [5, 6], [0])),
            manual,
        )

    def test_probit_roundtrip(self):
        p = np.array([0.01, 0.25, 0.5, 0.75, 0.99])
        got = np.asarray(pm.math.invprobit(pm.math.probit(p)))
        np.testing.assert_allclose(got, p, atol=1e-5)

    def test_logdiffexp_edges(self):
        a = np.log([1.0, 2, 3, 4])
        with np.errstate(divide="ignore"):
            b = np.log([0.0, 1, 2, 3])
        np.testing.assert_allclose(
            np.asarray(pm.math.logdiffexp(a, b)), np.log([1.0, 1, 1, 1]),
            atol=1e-12,
        )
        got = np.asarray(
            pm.math.logdiffexp(
                np.array([-np.inf, -np.inf, -1.0]),
                np.array([-1.0, -np.inf, -np.inf]),
            )
        )
        assert np.isnan(got[0])          # log of a negative difference
        assert got[1] == -np.inf
        np.testing.assert_allclose(got[2], -1.0)

    def test_logdet(self):
        rng = np.random.default_rng(899853)
        for n in (3, 10):
            A = rng.standard_normal((n, n)) / np.sqrt(n)
            expected = np.sum(np.log(np.abs(
                np.linalg.svd(A, compute_uv=False)
            )))
            np.testing.assert_allclose(
                float(np.asarray(pm.math.logdet(A))), expected, rtol=1e-8
            )

    def test_expand_packed_triangular(self):
        n = 5
        rng = np.random.default_rng(42)
        vals = rng.standard_normal((n, n))
        lower = np.tril(vals)
        lower_packed = vals[lower != 0]
        upper = np.triu(vals)
        upper_packed = vals[upper != 0]
        np.testing.assert_allclose(
            np.asarray(pm.math.expand_packed_triangular(n, lower_packed,
                                                        lower=True)),
            lower,
        )
        np.testing.assert_allclose(
            np.asarray(pm.math.expand_packed_triangular(n, upper_packed,
                                                        lower=False)),
            upper,
        )
        np.testing.assert_allclose(
            np.asarray(pm.math.expand_packed_triangular(
                n, lower_packed, lower=True, diagonal_only=True
            )),
            np.diag(lower),
        )
