"""Shape utilities.

Parity: reference pymc/distributions/shape_utils.py public names
(`to_tuple`, `rv_size_is_none`, `change_dist_size`). Shape resolution itself
lives in Distribution._resolve_shapes (eager, static under XLA).
"""

from __future__ import annotations

import numpy as np

__all__ = ["to_tuple", "rv_size_is_none", "change_dist_size"]


def to_tuple(shape):
    """Canonicalize a shape spec: None -> (), int -> (int,)
    (reference shape_utils.py:to_tuple)."""
    if shape is None:
        return ()
    if isinstance(shape, (int, np.integer)):
        return (int(shape),)
    try:
        return tuple(shape)
    except TypeError:
        return (shape,)


def rv_size_is_none(size):
    return size is None


def change_dist_size(dist, new_size, expand=False):
    """Rebuild an unnamed distribution with a different batch size
    (reference shape_utils.py:change_dist_size)."""
    new_size = to_tuple(new_size)
    if expand:
        new_size = new_size + tuple(dist.batch_shape)
    params = {n: p for n, p in zip(dist.param_names, dist.param_values())
              if p is not None}
    # re-enter through .dist with the stored constructor params where
    # available (subclasses keep them as attributes by name)
    kw = {}
    for name in dist.param_names:
        if hasattr(dist, name):
            kw[name] = getattr(dist, name)
    kw = kw or params
    return type(dist).dist(size=new_size or None, **kw)
