"""Raveling between named value dicts and flat parameter vectors.

Parity: reference pymc/blocking.py:44-121 (DictToArrayBijection, RaveledVars,
point_map_info). Samplers operate on ONE flat vector per chain; this module
defines the static layout. All jittable (shapes/slices are Python constants).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from .config import floatX

__all__ = ["RaveledInfo", "ravel_point", "unravel_vector", "DictToArrayBijection"]


@dataclass(frozen=True)
class RaveledInfo:
    """Static layout of the flat vector: (name, shape, size, dtype) per var
    in registration order (the reference's point_map_info)."""

    names: tuple
    shapes: tuple
    sizes: tuple
    dtypes: tuple

    @classmethod
    def from_rvs(cls, rvs):
        names, shapes, sizes, dtypes = [], [], [], []
        for rv in rvs:
            shape = tuple(rv.value_shape)
            names.append(rv.value_name)
            shapes.append(shape)
            sizes.append(int(np.prod(shape)) if shape else 1)
            dtypes.append(rv.dtype)
        return cls(tuple(names), tuple(shapes), tuple(sizes), tuple(dtypes))

    @property
    def total_size(self):
        return sum(self.sizes)

    def slices(self):
        out = {}
        off = 0
        for n, s in zip(self.names, self.sizes):
            out[n] = slice(off, off + s)
            off += s
        return out


def ravel_point(point, info: RaveledInfo):
    """{value_name: array} -> flat (D,) floatX vector."""
    parts = []
    for n, shape in zip(info.names, info.shapes):
        v = jnp.asarray(point[n], dtype=floatX())
        parts.append(jnp.reshape(v, (-1,)))
    if not parts:
        return jnp.zeros((0,), dtype=floatX())
    return jnp.concatenate(parts)


def unravel_vector(q, info: RaveledInfo):
    """flat (..., D) vector -> {value_name: (..., *shape) array}. Supports
    leading batch axes (chains/draws) transparently."""
    out = {}
    off = 0
    lead = q.shape[:-1]
    for n, shape, size in zip(info.names, info.shapes, info.sizes):
        out[n] = jnp.reshape(q[..., off : off + size], lead + shape)
        off += size
    return out


class DictToArrayBijection:
    """Reference-compatible facade (blocking.py:60)."""

    def __init__(self, info: RaveledInfo):
        self.info = info

    def map(self, point):
        return ravel_point(point, self.info)

    def rmap(self, q):
        return unravel_vector(q, self.info)
