"""Dim-aware value transforms for the dims-first API.

Parity: reference pymc/dims/distributions/transforms.py (DimTransform base,
LogTransform/log_transform, LogOddsTransform/log_odds_transform,
IntervalTransform, SimplexTransform(dim), ZeroSumTransform(dims)) — transform
objects parameterized by dim NAMES instead of axis positions.

TPU-native redesign: the reference implements these over the labeled
XTensorVariable type; here named dims exist only at graph-build time
(dims/__init__.py DimVar), so a DimTransform RESOLVES against the RV's
declared dims into an ordinary positional transform — named axes are moved
to the trailing positions, the core positional transform applies there, and
the layout moves back. The compiled XLA program sees plain transposes that
fuse away.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..distributions import transforms as _pt

__all__ = [
    "DimTransform",
    "LogTransform", "log_transform",
    "LogOddsTransform", "log_odds_transform",
    "IntervalTransform",
    "SimplexTransform",
    "ZeroSumTransform",
]


class DimTransform:
    """Marker base for dim-aware transforms (reference
    dims/distributions/transforms.py:24). ``resolve(out_dims)`` returns the
    positional :class:`~pymc_tpu.distributions.transforms.Transform` for an
    RV declared with the named layout ``out_dims``."""

    def resolve(self, out_dims):
        return self


def _resolve_axes(names, out_dims, what):
    out_dims = tuple(out_dims)
    axes = []
    for n in names:
        if n not in out_dims:
            raise KeyError(
                f"{what} names dim {n!r} which is not among the "
                f"distribution's dims {out_dims}"
            )
        axes.append(out_dims.index(n))
    return tuple(axes)


class _AxesToTrailing(_pt.Transform):
    """Positional adapter: move ``axes`` to the trailing positions, apply the
    core transform there, and restore the layout. Both the constrained and
    unconstrained layouts keep the axes at the same positions (the core
    transform may change their SIZES, e.g. simplex K -> K-1)."""

    def __init__(self, base, axes, ndim):
        self.base = base
        self.axes = tuple(int(a) % int(ndim) for a in axes)
        self.ndim = int(ndim)
        self.name = base.name
        k = len(self.axes)
        self._dst = tuple(range(self.ndim - k, self.ndim))
        # the wrapper sees the full array; never fails the model's
        # univariate-transform-on-multivariate guard
        self.event_ndim = self.ndim

    def _to_trailing(self, arr):
        return jnp.moveaxis(arr, self.axes, self._dst)

    def _from_trailing(self, arr):
        return jnp.moveaxis(arr, self._dst, self.axes)

    def forward(self, x, env=None):
        return self._from_trailing(self.base.forward(self._to_trailing(x), env))

    def backward(self, v, env=None):
        return self._from_trailing(self.base.backward(self._to_trailing(v), env))

    def log_jac_det(self, v, env=None):
        # the wrapper declares the FULL array as one transform block
        # (event_ndim = ndim), so its correction must be the block total:
        # the core jacobian collapses only the trailing (permuted core)
        # axes — sum the remaining batch axes into the block scalar, or the
        # model's jacobian-shape guard rightly rejects the mismatch
        return jnp.sum(self.base.log_jac_det(self._to_trailing(v), env))

    def _map_shape(self, shape, base_map):
        shape = list(shape)
        moved = [shape[a] for a in self.axes]
        rest = [s for i, s in enumerate(shape) if i not in self.axes]
        new_trailing = list(base_map(tuple(rest + moved)))[len(rest):]
        out = list(rest)
        for a, s in sorted(zip(self.axes, new_trailing)):
            out.insert(a, s)
        return tuple(out)

    def value_shape(self, shape):
        return self._map_shape(shape, self.base.value_shape)

    def constrained_shape(self, value_shape):
        return self._map_shape(value_shape, self.base.constrained_shape)

    def __repr__(self):
        return f"{type(self).__name__}({self.base!r}, axes={self.axes})"


class LogTransform(_pt.LogTransform, DimTransform):
    """Elementwise — dim names are irrelevant (reference LogTransform)."""


class LogOddsTransform(_pt.LogOddsTransform, DimTransform):
    """Elementwise (reference LogOddsTransform)."""


class IntervalTransform(_pt.IntervalTransform, DimTransform):
    """Elementwise with constant bounds (reference dims IntervalTransform)."""


log_transform = LogTransform()
log_odds_transform = LogOddsTransform()


class SimplexTransform(DimTransform):
    """Stick-breaking over the named dim (reference SimplexTransform(dim)):
    the unconstrained value drops one entry along ``dim``."""

    name = "simplex"

    def __init__(self, dim):
        if not isinstance(dim, str):
            raise TypeError("SimplexTransform(dim=...) takes one dim NAME")
        self.core_dim = dim

    def resolve(self, out_dims):
        (axis,) = _resolve_axes((self.core_dim,), out_dims, "SimplexTransform")
        if axis == len(tuple(out_dims)) - 1:
            return _pt.SimplexTransform()
        return _AxesToTrailing(
            _pt.SimplexTransform(), (axis,), len(tuple(out_dims))
        )

    def __repr__(self):
        return f"SimplexTransform(dim={self.core_dim!r})"


class ZeroSumTransform(DimTransform):
    """Isometric zero-sum constraint over the named dims (reference
    ZeroSumTransform(dims) — same extend_axis algebra as the positional
    :class:`~pymc_tpu.distributions.transforms.ZeroSumTransform`)."""

    name = "zerosum"

    def __init__(self, dims):
        dims = (dims,) if isinstance(dims, str) else tuple(dims)
        if not dims or not all(isinstance(d, str) for d in dims):
            raise TypeError("ZeroSumTransform(dims=...) takes dim NAMES")
        if len(set(dims)) != len(dims):
            raise ValueError(f"duplicate dims {dims}")
        self.dims = dims

    def resolve(self, out_dims):
        out_dims = tuple(out_dims)
        axes = _resolve_axes(self.dims, out_dims, "ZeroSumTransform")
        n = len(axes)
        core = _pt.ZeroSumTransform(n_zerosum_axes=n)
        if tuple(sorted(axes)) == tuple(range(len(out_dims) - n,
                                              len(out_dims))) and \
                list(axes) == sorted(axes):
            return core
        return _AxesToTrailing(core, axes, len(out_dims))

    def __repr__(self):
        return f"ZeroSumTransform(dims={self.dims!r})"
