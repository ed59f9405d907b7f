"""Batched dense-linalg kernels for the GP/MvNormal hot path.

Profiling the Marginal-GP leapfrog (benchmarks/gp_profile.py, TPU v5e,
f32) showed XLA's batched `cholesky` on (C, 150, 150) stacks achieving only
~26-36 GFLOP/s — its generic blocked right-looking algorithm serializes on
small, non-tile-aligned n and re-reads HBM per panel. For the many-chains
PPL regime (C >= 64 small matrices) the right TPU mapping is BATCH-IN-LANES:
store the stack as (n, n, C) with chains on the 128-lane axis, keep the
whole working set resident in VMEM, and run the textbook right-looking
factorization as n rank-1 updates — every step is a full-lane VPU
multiply-subtract, no MXU, no HBM traffic between steps.

`cholesky_batched` dispatches to the Pallas kernel when profitable and
falls back to `jnp.linalg.cholesky` elsewhere; its custom VJP uses the
standard level-3 reverse-mode formula (Murray 2016) so gradients ride
batched triangular solves + matmuls.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .pallas_kernels import _HAS_PALLAS, _round_up

if _HAS_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

__all__ = ["cholesky_batched", "pallas_cholesky_eligible"]

# VMEM budget: the (n, n, 128) f32 block must stay well under ~16 MB/core
_MAX_N = 160
_MIN_BATCH = 8


def pallas_cholesky_eligible(shape, dtype):
    """(C, n, n) stacks the kernel path accepts."""
    from .pallas_kernels import pallas_available

    if not pallas_available():
        return False
    if len(shape) != 3 or shape[-1] != shape[-2]:
        return False
    C, n, _ = shape
    if n > _MAX_N or C < _MIN_BATCH:
        return False
    return jnp.dtype(dtype) == jnp.float32


_ROW_PANEL = 16


def _chol_kernel(a_hbm, out_hbm):
    """Right-looking Cholesky over an (n, n, C) stack, batch in lanes.

    The operands live in HBM (memory_space=ANY); the kernel DMAs the whole
    stack into ONE VMEM scratch, factorizes in place, and DMAs back — a
    blocked in/out pair would hold two (n, n, 128) buffers and blow the
    ~16 MB scoped VMEM at n=150 (measured OOM at 25 MB).

    Each step k: d = sqrt(A[k,k]); column k below the diagonal becomes
    L[:,k] = A[:,k]/d; the trailing block gets the rank-1 update. Rows and
    columns <= k are masked to zero in the update operands, so no
    dynamic-SHAPE slicing is needed; the update runs in _ROW_PANEL-row
    panels so the largest temporary is (panel, n, C). n must be a multiple
    of _ROW_PANEL (the wrapper identity-pads).
    """

    n = a_hbm.shape[0]
    Cp = a_hbm.shape[2]

    def inner(scratch, sem_in, sem_out):
        def chunk(c, _):
            sl = pl.ds(c * 128, 128)
            dma_in = pltpu.make_async_copy(
                a_hbm.at[:, :, sl], scratch, sem_in
            )
            dma_in.start()
            dma_in.wait()
            _chol_inplace(scratch)
            dma_out = pltpu.make_async_copy(
                scratch, out_hbm.at[:, :, sl], sem_out
            )
            dma_out.start()
            dma_out.wait()
            return 0

        lax.fori_loop(0, Cp // 128, chunk, 0)

    pl.run_scoped(
        inner,
        scratch=pltpu.VMEM((n, n, 128), a_hbm.dtype),
        sem_in=pltpu.SemaphoreType.DMA(()),
        sem_out=pltpu.SemaphoreType.DMA(()),
    )


def _chol_inplace(out_ref):
    n = out_ref.shape[0]
    R = _ROW_PANEL

    def body(k, _):
        diag = out_ref[pl.ds(k, 1), pl.ds(k, 1), :]       # (1, 1, C)
        d = jnp.sqrt(diag)
        # the trailing block stays symmetric, so row k carries the same
        # values as column k — reading it avoids a sublane<->lead transpose
        row = out_ref[pl.ds(k, 1), :, :]                  # (1, n, C)
        col_ids = lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
        lrow = jnp.where(col_ids > k, row / d, 0.0)

        def panel(j, _):
            sl = pl.ds(j * R, R)
            colj = out_ref[sl, pl.ds(k, 1), :]            # (R, 1, C)
            rid = lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0) + j * R
            lcol_j = jnp.where(rid > k, colj / d, 0.0)
            # lrow is zero at column k, so column k survives the panel
            # updates and later panels still read the pristine values
            out_ref[sl, :, :] = out_ref[sl, :, :] - lcol_j * lrow
            return 0

        # panels fully above the pivot have an all-zero lcol_j: skip them
        lax.fori_loop(k // R, n // R, panel, 0)
        col = out_ref[:, pl.ds(k, 1), :]                  # (n, 1, C)
        row_ids = lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
        lcol = jnp.where(row_ids > k, col / d, 0.0)
        out_ref[:, pl.ds(k, 1), :] = jnp.where(row_ids == k, d, lcol)
        return 0

    lax.fori_loop(0, n, body, 0)


def _pallas_chol(A):
    """A: (C, n, n) f32 -> L lower. Batch-in-lanes layout + aliased block.

    n is identity-padded up to a _ROW_PANEL multiple (block-diagonal pad
    keeps the factor block-diagonal, sliced off afterward); C pads to the
    128-lane width (padded lanes factor garbage independently — lanes
    never mix — and are sliced off).
    """
    from .pallas_kernels import _INTERPRET

    C, n, _ = A.shape
    Cp = _round_up(C, 128)
    npad = _round_up(n, _ROW_PANEL)
    At = jnp.moveaxis(A, 0, -1)  # (n, n, C)
    if npad != n:
        eye_tail = jnp.eye(npad, dtype=A.dtype)[n:, n:]
        At = jnp.pad(At, ((0, npad - n), (0, npad - n), (0, 0)))
        At = At.at[n:, n:, :].add(eye_tail[:, :, None])
    if Cp != C:
        At = jnp.pad(At, ((0, 0), (0, 0), (0, Cp - C)), constant_values=1.0)
    Lt = pl.pallas_call(
        _chol_kernel,
        out_shape=jax.ShapeDtypeStruct((npad, npad, Cp), At.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        interpret=_INTERPRET,
    )(At)
    return jnp.moveaxis(Lt[:n, :n, :C], -1, 0)


def _phi(M):
    """tril with halved diagonal (the Phi operator of the Cholesky
    reverse-mode formula)."""
    return jnp.tril(M) - 0.5 * jnp.tril(jnp.triu(M))


def _chol_rev(L, Lbar):
    """Reverse-mode Cholesky (Murray 2016, level-3 blocked form, batched):
    Abar = 0.5 * L^{-T} (Phi(L^T Lbar) + Phi(L^T Lbar)^T) L^{-1}."""
    from jax.scipy.linalg import solve_triangular

    P = _phi(jnp.swapaxes(L, -1, -2) @ Lbar)
    S = P + jnp.swapaxes(P, -1, -2)
    # X = L^{-T} S: solve L^T X = S
    X = solve_triangular(jnp.swapaxes(L, -1, -2), S, lower=False)
    # Abar' = X L^{-1}: solve Abar' L = X -> (L^T Abar'^T = X^T)
    Abar = jnp.swapaxes(
        solve_triangular(jnp.swapaxes(L, -1, -2), jnp.swapaxes(X, -1, -2),
                         lower=False),
        -1, -2,
    )
    return 0.5 * Abar


def _chol_impl(A):
    if pallas_cholesky_eligible(A.shape, A.dtype):
        from .pallas_kernels import _INTERPRET

        if _INTERPRET:
            return _pallas_chol(A)
        # platform_dependent picks the branch at LOWERING time, not trace
        # time: the same jitted graph may be lowered for the host CPU
        # backend (e.g. pm.sample's post-sampling deterministic recompute
        # runs on CPU to stay off the tunnel), where a compiled pallas_call
        # cannot lower ("Only interpret mode is supported on CPU backend").
        return jax.lax.platform_dependent(
            A, tpu=_pallas_chol, default=jnp.linalg.cholesky
        )
    return jnp.linalg.cholesky(A)


from jax.custom_batching import custom_vmap as _custom_vmap


@_custom_vmap
def _chol_inner(A):
    return _chol_impl(A)


@_chol_inner.def_vmap
def _chol_inner_vmap(axis_size, in_batched, A):
    # THE routing that makes the kernel reachable from model logps: the
    # model traces per chain ((n, n) cholesky) and the sampler vmaps over
    # chains — this rule replaces vmap-of-cholesky with the explicitly
    # batched (C, n, n) implementation, where the batch-in-lanes kernel
    # applies. Nested/odd batching falls through to jnp inside _chol_impl.
    # An UNBATCHED operand (e.g. the constant primal under jacfwd's basis
    # vmap) must keep its unbatched label or axis 0 gets eaten as batch.
    (a_batched,) = in_batched
    return _chol_impl(A), bool(a_batched)


@jax.custom_jvp
def cholesky_batched(A):
    """Lower-triangular Cholesky with a TPU batch-in-lanes fast path.

    (C, n, n) f32 stacks with C >= 8 and n <= 160 on TPU — supplied
    directly OR produced by `vmap` of an (n, n) call — take the Pallas
    kernel (measured 2.1x over XLA's batched `cholesky` at C=64, n=150 —
    see BENCHMARKS.md); everything else falls back to
    ``jnp.linalg.cholesky``.

    Differentiation: a custom JVP (dL = L Phi(L^{-1} dA L^{-T}), linear in
    dA via batched triangular solves + matmuls) gives forward mode
    directly and reverse mode by transposition — the slow XLA cholesky
    never appears in either derivative, and hessians (init="map") work.
    """
    return _chol_inner(jnp.asarray(A))


@cholesky_batched.defjvp
def _chol_jvp(primals, tangents):
    from jax.scipy.linalg import solve_triangular

    (A,) = primals
    (dA,) = tangents
    L = _chol_inner(jnp.asarray(A))
    Li_dA = solve_triangular(L, dA, lower=True)
    W = jnp.swapaxes(
        solve_triangular(L, jnp.swapaxes(Li_dA, -1, -2), lower=True), -1, -2
    )
    dL = L @ _phi(W)
    return L, dL
