"""Batch-in-lanes Pallas Cholesky: correctness in interpret mode (CPU CI)
against jnp.linalg.cholesky, across shapes, paddings, and every autodiff
composition the samplers use (vmap, vmap-of-value_and_grad, hessian, jvp).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pymc_tpu.ops.pallas_kernels as pk
from pymc_tpu.ops.linalg import (
    _chol_rev,
    cholesky_batched,
    pallas_cholesky_eligible,
)


@pytest.fixture(autouse=True)
def interpret_mode():
    prev = pk._INTERPRET
    pk._INTERPRET = True
    yield
    pk._INTERPRET = prev


def _spd(C, n, seed=0):
    rng = np.random.default_rng(seed)
    B = rng.normal(size=(C, n, n)).astype(np.float32)
    return jnp.asarray(B @ np.swapaxes(B, -1, -2) + n * np.eye(n, dtype=np.float32))


class TestForward:
    @pytest.mark.parametrize("C,n", [(8, 13), (8, 16), (16, 150), (130, 20),
                                     (300, 20), (8, 1)])
    def test_matches_xla(self, C, n):
        A = _spd(C, n)
        assert pallas_cholesky_eligible(A.shape, A.dtype)
        L = np.asarray(cholesky_batched(A))
        Lref = np.asarray(jnp.linalg.cholesky(A))
        np.testing.assert_allclose(L, Lref, atol=2e-5 * n)
        # strictly lower triangular output (zeros above the diagonal)
        assert np.allclose(np.triu(L, 1), 0.0)

    def test_ineligible_shapes_fall_back(self):
        # too-small batch, too-large n, f64, non-square, unbatched
        assert not pallas_cholesky_eligible((4, 10, 10), jnp.float32)
        assert not pallas_cholesky_eligible((8, 200, 200), jnp.float32)
        assert not pallas_cholesky_eligible((8, 10, 10), jnp.float64)
        assert not pallas_cholesky_eligible((8, 10, 11), jnp.float32)
        assert not pallas_cholesky_eligible((10, 10), jnp.float32)
        A64 = np.asarray(_spd(8, 10), dtype=np.float64)
        np.testing.assert_allclose(
            np.asarray(cholesky_batched(A64)),
            np.asarray(jnp.linalg.cholesky(A64)),
        )

    def test_vmap_routes_to_batched(self):
        # the sampler pattern: per-chain (n, n) call under vmap
        A = _spd(16, 24)
        out = jax.vmap(cholesky_batched)(A)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jnp.linalg.cholesky(A)), atol=1e-4
        )


class TestAutodiff:
    def _logdet(self, chol_fn):
        def f(a):
            return 2 * jnp.sum(jnp.log(jnp.diagonal(chol_fn(a))))

        return f

    def test_vmap_value_and_grad(self):
        A = _spd(16, 24)
        f = self._logdet(cholesky_batched)
        fref = self._logdet(jnp.linalg.cholesky)
        v, g = jax.vmap(jax.value_and_grad(f))(A)
        vr, gr = jax.vmap(jax.value_and_grad(fref))(A)
        np.testing.assert_allclose(np.asarray(v), np.asarray(vr), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                   rtol=1e-4, atol=1e-5)

    def test_jvp(self):
        A = _spd(16, 24)
        rng = np.random.default_rng(1)
        dA = rng.normal(size=A.shape).astype(np.float32)
        dA = jnp.asarray(dA + np.swapaxes(dA, -1, -2))
        f = self._logdet(cholesky_batched)
        fref = self._logdet(jnp.linalg.cholesky)
        _, t = jax.jvp(f, (A,), (dA,))
        _, tr = jax.jvp(fref, (A,), (dA,))
        np.testing.assert_allclose(float(t), float(tr), rtol=1e-4)

    def test_hessian(self):
        # fwd-over-rev: the init="map" find_hessian pattern
        A = _spd(16, 12)[0]
        f = self._logdet(cholesky_batched)
        fref = self._logdet(jnp.linalg.cholesky)
        H = np.asarray(jax.hessian(f)(A))
        Hr = np.asarray(jax.hessian(fref)(A))
        np.testing.assert_allclose(H, Hr, rtol=1e-3, atol=1e-4)

    def test_chol_rev_matches_autodiff(self):
        # the level-3 reverse formula used in docs/tests
        A = _spd(8, 9)
        rng = np.random.default_rng(2)
        Lbar = jnp.asarray(
            rng.normal(size=A.shape).astype(np.float32)
            * np.tril(np.ones((9, 9), np.float32))
        )
        L = jnp.linalg.cholesky(A)
        _, vjp = jax.vjp(jnp.linalg.cholesky, A)
        np.testing.assert_allclose(
            np.asarray(_chol_rev(L, Lbar)), np.asarray(vjp(Lbar)[0]),
            rtol=1e-4, atol=1e-5,
        )


class TestInModel:
    def test_mvnormal_logp_unchanged(self):
        import pymc_tpu as pm

        cov = np.array([[1.0, 0.4], [0.4, 2.0]], dtype=np.float32)
        import scipy.stats as st

        d = pm.MvNormal.dist(mu=np.zeros(2, np.float32), cov=cov)
        val = np.array([0.3, -0.7], np.float32)
        np.testing.assert_allclose(
            float(pm.logp(d, val)),
            st.multivariate_normal.logpdf(val, np.zeros(2), cov),
            rtol=1e-5,
        )
