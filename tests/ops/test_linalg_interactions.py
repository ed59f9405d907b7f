"""Pallas batch-in-lanes Cholesky x sampler interaction matrix.

The kernel (`ops/linalg.py cholesky_batched`) is ON by default whenever a
model's per-chain (n, n) f32 Cholesky is vmapped into an eligible
(C >= 8, n <= 160) stack. That eligibility is decided at TRACE time, so it
can silently toggle between runs whose chain counts differ — these tests pin
the contracts that make the toggle safe:

  * trace vs no-trace sampling with the kernel in the hot path stays
    bit-identical (the repo-wide invariant, CLAUDE.md);
  * `mesh=`-sharded vs unsharded runs stay bit-identical (pjit traces the
    GLOBAL (C, n, n) shape, so BOTH paths pick the same kernel);
  * a FileTrace resume at the midpoint reproduces the uninterrupted run
    bit-identically with the kernel active;
  * kernel-eligible vs forced-ineligible runs of the SAME model agree to
    f32 statistical tolerance (different factorization algorithms are NOT
    bit-equal — that is the documented cost of the toggle);
  * n > _MAX_N and C < _MIN_BATCH fall back to `jnp.linalg.cholesky`
    exactly (bitwise), including under vmap and grad.

All runs force f32 (the production dtype — eligibility requires it) and
Pallas interpret mode (CPU CI). Reference role: pymc uses plain
`pt.linalg.cholesky`; this matrix guards the TPU-only fast path the
reference doesn't have.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pymc_tpu as pm
from pymc_tpu.backends.checkpoint import FileTrace
import pymc_tpu.ops.linalg as plin
import pymc_tpu.ops.pallas_kernels as pk
from pymc_tpu.ops.linalg import cholesky_batched, pallas_cholesky_eligible


@pytest.fixture(autouse=True)
def f32_interpret_mode():
    """f32 (eligibility requires it) + Pallas interpret mode (CPU CI)."""
    jax.config.update("jax_enable_x64", False)
    prev = pk._INTERPRET
    pk._INTERPRET = True
    yield
    pk._INTERPRET = prev
    jax.config.update("jax_enable_x64", True)


N_PTS = 12  # kernel input size: pads to _ROW_PANEL=16 inside the kernel


def _gp_model(seed=0, n=N_PTS):
    """Latent-style GP regression whose logp runs one (n, n) Cholesky per
    chain per leapfrog: MvNormal with an RV-scaled kernel matrix."""
    rng = np.random.default_rng(seed)
    X = np.linspace(0.0, 1.0, n)[:, None].astype(np.float32)
    K = np.exp(-0.5 * ((X - X.T) / 0.3) ** 2).astype(np.float32)
    y = rng.multivariate_normal(np.zeros(n), 1.2 * K + 0.05 * np.eye(n))
    with pm.Model() as m:
        eta = pm.HalfNormal("eta", 2.0)
        cov = eta**2 * K + (0.05 + 1e-4) * np.eye(n, dtype=np.float32)
        pm.MvNormal("y", mu=np.zeros(n, np.float32), cov=cov,
                    observed=y.astype(np.float32))
    return m


def _sample(model, *, chains, mesh=None, trace=None, resume=False,
            draws=60, tune=60, seed=3):
    return pm.sample(
        draws=draws, tune=tune, chains=chains, model=model,
        random_seed=seed, progressbar=False,
        compute_convergence_checks=False, mesh=mesh, trace=trace,
        resume=resume, max_treedepth=6,
    )


def _assert_kernel_in_traced_path(chains):
    """The model's vmapped (n, n) cholesky must route through the Pallas
    batched path at this chain count — guards the test premise itself."""
    assert pallas_cholesky_eligible((chains, N_PTS, N_PTS), jnp.float32)


class TestSamplerInteractions:
    def test_trace_vs_no_trace_bit_identical(self, tmp_path):
        _assert_kernel_in_traced_path(8)
        a = _sample(_gp_model(), chains=8)
        tr = FileTrace(tmp_path / "t")
        b = _sample(_gp_model(), chains=8, trace=tr)
        np.testing.assert_array_equal(
            a.posterior["eta"].values, b.posterior["eta"].values
        )

    def test_mesh_sharded_vs_unsharded_bit_identical(self):
        """pjit traces the GLOBAL (16, n, n) stack, so the sharded and
        unsharded programs pick the SAME kernel and per-chain math is
        untouched by the chain-axis sharding."""
        devs = jax.devices("cpu")
        if len(devs) < 8:
            pytest.skip("needs 8 virtual devices")
        from pymc_tpu.parallel import chain_mesh

        _assert_kernel_in_traced_path(16)
        a = _sample(_gp_model(), chains=16)
        b = _sample(_gp_model(), chains=16, mesh=chain_mesh(devices=devs[:8]))
        np.testing.assert_array_equal(
            a.posterior["eta"].values, b.posterior["eta"].values
        )

    def test_resume_bit_identical(self, tmp_path):
        """FileTrace resume at the midpoint with the kernel active: the
        second half continues from saved sampler state bit-identically."""
        _assert_kernel_in_traced_path(8)
        full = _sample(_gp_model(), chains=8, draws=60)

        tr = FileTrace(tmp_path / "r")
        _sample(_gp_model(), chains=8, draws=30, trace=tr)
        tr2 = FileTrace(tmp_path / "r")
        resumed = _sample(_gp_model(), chains=8, draws=60, trace=tr2,
                          resume=True)
        np.testing.assert_array_equal(
            full.posterior["eta"].values, resumed.posterior["eta"].values
        )

    def test_eligible_vs_forced_off_statistical(self, monkeypatch):
        """Forcing the XLA fallback changes factorization ROUNDING, not the
        math: posteriors agree to f32 statistical tolerance. (Bit-identity
        across the toggle is impossible — different algorithms — which is
        why the eligibility rule depends only on trace-time shape/dtype,
        never on runtime state.)"""
        a = _sample(_gp_model(), chains=8, draws=150, tune=150)
        monkeypatch.setattr(plin, "pallas_cholesky_eligible",
                            lambda shape, dtype: False)
        jax.clear_caches()
        b = _sample(_gp_model(), chains=8, draws=150, tune=150)
        ea, eb = a.posterior["eta"].values, b.posterior["eta"].values
        assert abs(ea.mean() - eb.mean()) < 0.2
        assert abs(ea.std() - eb.std()) < 0.2


class TestFallbackBoundaries:
    def test_n_above_max_is_bitwise_xla(self):
        n = plin._MAX_N + 8
        rng = np.random.default_rng(0)
        B = rng.normal(size=(8, n, n)).astype(np.float32)
        A = B @ np.swapaxes(B, -1, -2) + n * np.eye(n, dtype=np.float32)
        assert not pallas_cholesky_eligible(A.shape, A.dtype)
        np.testing.assert_array_equal(
            np.asarray(cholesky_batched(A)),
            np.asarray(jnp.linalg.cholesky(A)),
        )

    def test_small_batch_is_bitwise_xla(self):
        rng = np.random.default_rng(1)
        B = rng.normal(size=(plin._MIN_BATCH - 1, 24, 24)).astype(np.float32)
        A = B @ np.swapaxes(B, -1, -2) + 24 * np.eye(24, dtype=np.float32)
        assert not pallas_cholesky_eligible(A.shape, A.dtype)
        np.testing.assert_array_equal(
            np.asarray(cholesky_batched(A)),
            np.asarray(jnp.linalg.cholesky(A)),
        )

    def test_fallback_vmap_and_grad_bitwise(self):
        """vmap of the (n, n) call at an INELIGIBLE batch count and its
        gradient both ride XLA exactly."""
        n = plin._MAX_N + 8
        rng = np.random.default_rng(2)
        B = rng.normal(size=(4, n, n)).astype(np.float32)
        A = B @ np.swapaxes(B, -1, -2) + n * np.eye(n, dtype=np.float32)

        got = jax.vmap(cholesky_batched)(A)
        want = jax.vmap(jnp.linalg.cholesky)(A)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

        def f(a):
            return jnp.sum(jnp.log(jnp.diagonal(
                cholesky_batched(a), axis1=-2, axis2=-1)))

        def f_ref(a):
            return jnp.sum(jnp.log(jnp.diagonal(
                jnp.linalg.cholesky(a), axis1=-2, axis2=-1)))

        ga = jax.grad(f)(jnp.asarray(A))
        gr = jax.grad(f_ref)(jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gr),
                                   rtol=2e-4, atol=1e-5)

    def test_eligibility_boundary_values(self):
        f32 = jnp.float32
        assert pallas_cholesky_eligible((8, plin._MAX_N, plin._MAX_N), f32)
        assert not pallas_cholesky_eligible(
            (8, plin._MAX_N + 1, plin._MAX_N + 1), f32)
        assert pallas_cholesky_eligible((plin._MIN_BATCH, 16, 16), f32)
        assert not pallas_cholesky_eligible(
            (plin._MIN_BATCH - 1, 16, 16), f32)
        assert not pallas_cholesky_eligible((8, 16, 16), jnp.float64)
        assert not pallas_cholesky_eligible((8, 16, 15), f32)
