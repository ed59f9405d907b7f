"""Pallas TPU kernels for the sampler hot path.

SURVEY.md §7.11: after the XLA baseline, fuse the leapfrog bandwidth chain.
One leapfrog touches q, p, grad, inv_mass (4 reads) and writes p_half, q_new
(2 writes) before the logp+grad call, then p_new (1 read + 1 write) after —
XLA emits several elementwise kernels here; the Pallas versions do each phase
in a single VMEM pass over (chains, D) tiles.

Also: `segment_sum_mxu`, the one-hot matmul segment reduction — hierarchical
models gather/scatter group effects (a[county]); TPU scatter is slow, a
one-hot matmul rides the MXU instead.

All kernels carry jnp reference fallbacks (`interpret`-safe, used on CPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = [
    "leapfrog_kick_drift",
    "leapfrog_final_kick",
    "segment_sum_mxu",
    "pallas_available",
]

# Test hook: force interpret-mode pallas_call on CPU so the ACTUAL kernel
# bodies (not the jnp fallbacks) are exercised in CI (tests/ops/test_pallas.py)
_INTERPRET = False


def pallas_available():
    if not _HAS_PALLAS:
        return False
    return _INTERPRET or jax.default_backend() == "tpu"


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------- leapfrog
def _kick_drift_kernel(q_ref, p_ref, grad_ref, inv_mass_ref, eps_ref,
                       q_out_ref, p_half_ref):
    eps = eps_ref[:]  # (TILE_C, 1) per-chain signed step sizes
    p_half = p_ref[:] + 0.5 * eps * grad_ref[:]
    p_half_ref[:] = p_half
    q_out_ref[:] = q_ref[:] + eps * (inv_mass_ref[:] * p_half)


def _final_kick_kernel(p_half_ref, grad_ref, inv_mass_ref, eps_ref,
                       p_out_ref, ke_out_ref):
    eps = eps_ref[:]
    p_new = p_half_ref[:] + 0.5 * eps * grad_ref[:]
    p_out_ref[:] = p_new
    ke_out_ref[:] = jnp.sum(
        0.5 * p_new * inv_mass_ref[:] * p_new, axis=1, keepdims=True
    )


_TILE_C = 8
# (TILE_C + epsilon) full-D rows x ~8 arrays must fit VMEM (~16 MB/core);
# above this D the jnp fallback (XLA-fused) is used
_MAX_D = 32768


def _aligned(C, D):
    return C % _TILE_C == 0 and D <= _MAX_D


def _row_specs(C, D, dtype, n_tensors):
    """Grid over chain tiles only; each block is TILE_C full-D rows (the
    Mosaic block constraint allows any last dim equal to the full array dim,
    so arbitrary D — e.g. the 175-param radon GLM — hits the kernel path)."""
    grid = (C // _TILE_C,)
    tens = pl.BlockSpec((_TILE_C, D), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    eps_spec = pl.BlockSpec((_TILE_C, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    ke_spec = pl.BlockSpec((_TILE_C, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    return grid, [tens] * n_tensors + [eps_spec], tens, ke_spec


def leapfrog_kick_drift(q, p, grad, inv_mass, eps):
    """(q, p) -> (q_new, p_half): fused half-kick + drift over (C, D).

    eps: (C,) per-chain step sizes (sign encodes direction). Falls back to
    the (XLA-fused) jnp expression off-TPU or at unsupported shapes.
    """
    if not pallas_available() or q.ndim != 2 or not _aligned(*q.shape):
        p_half = p + 0.5 * eps[:, None] * grad
        return q + eps[:, None] * (inv_mass * p_half), p_half
    C, D = q.shape
    eps2 = eps[:, None].astype(q.dtype)
    grid, in_specs, tens, _ = _row_specs(C, D, q.dtype, 4)
    out = pl.pallas_call(
        _kick_drift_kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((C, D), q.dtype),
            jax.ShapeDtypeStruct((C, D), q.dtype),
        ),
        in_specs=in_specs,
        out_specs=(tens, tens),
        interpret=_INTERPRET,
    )(q, p, grad, inv_mass, eps2)
    return out


def leapfrog_final_kick(p_half, grad, inv_mass, eps):
    """p_half -> (p_new, kinetic): fused final half-kick + kinetic energy."""
    if (
        not pallas_available()
        or p_half.ndim != 2
        or not _aligned(*p_half.shape)
    ):
        p_new = p_half + 0.5 * eps[:, None] * grad
        ke = 0.5 * jnp.sum(p_new * inv_mass * p_new, axis=-1)
        return p_new, ke
    C, D = p_half.shape
    eps2 = eps[:, None].astype(p_half.dtype)
    grid, in_specs, tens, ke_spec = _row_specs(C, D, p_half.dtype, 3)
    p_new, ke = pl.pallas_call(
        _final_kick_kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((C, D), p_half.dtype),
            jax.ShapeDtypeStruct((C, 1), p_half.dtype),
        ),
        in_specs=in_specs,
        out_specs=(tens, ke_spec),
        interpret=_INTERPRET,
    )(p_half, grad, inv_mass, eps2)
    return p_new, ke[:, 0]


# ------------------------------------------------------------- segment sum
@functools.partial(jax.jit, static_argnums=(2,))
def segment_sum_mxu(values, segment_ids, num_segments):
    """Segment sum as a one-hot matmul — rides the MXU instead of TPU's slow
    scatter path. values: (..., N); segment_ids: (N,) int; -> (..., S)."""
    one_hot = jax.nn.one_hot(
        segment_ids, num_segments, dtype=values.dtype
    )  # (N, S)
    return values @ one_hot


def gather_effects(effects, index):
    """effects[index] expressed as a matmul when beneficial; plain take by
    default (XLA gathers are fine — scatter in the GRADIENT is the slow part,
    and the matmul formulation makes the gradient a matmul too)."""
    one_hot = jax.nn.one_hot(index, effects.shape[-1], dtype=effects.dtype)
    return one_hot @ effects
